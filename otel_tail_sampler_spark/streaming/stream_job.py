"""Structured Streaming variant of the tail-sampling pipeline.

The reference is a streaming system: traces become 'ready' when inactive for
``inactivity_window`` seconds (/root/reference/src/storage/memory.rs:185-228,
SURVEY.md §2.10). The Spark-native analog is a SESSION WINDOW on event time
with a watermark:

    readStream(tokenized) -> parse -> withWatermark(gap)
      -> groupBy(session_window(event_time, gap), trace_key).agg(summary)
      -> decide -> route (foreachBatch)

A session window closes exactly when the watermark (max event time - delay)
passes its end — the same 'no new span for N seconds' semantics as the
reference's inactivity timeout. Bounded runs use Trigger.AvailableNow; note
the inherent streaming tail: sessions newer than (max_ts - gap - delay) stay
open at stream end (the reference has the same behavior — its buffer holds
unexpired traces until shutdown).

The parse stage reuses the SAME vectorized Arrow parser as batch
(mapInArrow is supported in streaming queries).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from otel_tail_sampler_spark.operators.parser import parse_spans
from otel_tail_sampler_spark.operators.policies import KEEP, SamplerConfig, decide


def read_tokenized_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the tokenized table directory (S1 streaming
    analog; a Kafka deployment swaps this for readStream.format('kafka'))."""
    reader = (
        spark.readStream.schema(
            "doc_id string, tokens array<int>, n_tok int, source string"
        )
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def assemble_sessions(
    spans: DataFrame, gap_seconds: int = 30, watermark_delay: str = "10 seconds"
) -> DataFrame:
    """Streaming trace assembly: session_window(gap) == inactivity timeout.

    Event time = timestamp_ms as timestamp. One trace can in principle span
    multiple sessions if its spans pause longer than the gap — matching the
    reference, which force-exports a trace after inactivity and treats late
    spans as a fresh trace (evaluator re-export is prevented by the Redis
    dedup key, here by the exported-manifest anti-join).
    """
    with_ts = spans.withColumn(
        "event_time", F.timestamp_millis(F.col("timestamp_ms"))
    ).withWatermark("event_time", watermark_delay)
    return (
        with_ts.groupBy(
            F.session_window("event_time", f"{gap_seconds} seconds"),
            F.col("trace_k1"),
            F.col("trace_k2"),
        )
        .agg(
            F.min(
                F.struct(
                    F.col("timestamp_ms").alias("ts"),
                    F.col("span_id").alias("sid"),
                    F.col("service_name").alias("svc"),
                )
            ).alias("_first"),
            F.count(F.lit(1)).alias("span_count"),
            F.max((F.col("status_code") == 2).cast("int"))
            .cast("boolean")
            .alias("has_error"),
            F.sum((F.col("status_code") == 2).cast("int")).alias("error_count"),
            F.max("duration_ms").alias("max_duration_ms"),
            F.min("timestamp_ms").alias("min_timestamp_ms"),
            F.max("timestamp_ms").alias("max_timestamp_ms"),
            F.array_sort(F.collect_set("operation_name")).alias("operations"),
            F.min(
                F.when(
                    F.col("parent_span_id").isNull(),
                    F.struct(
                        F.col("timestamp_ms").alias("ts"),
                        F.col("span_id").alias("sid"),
                    ),
                )
            ).alias("_root"),
        )
        .select(
            F.col("trace_k1"),
            F.col("trace_k2"),
            F.format_string("%016X%016X", F.col("trace_k1"), F.col("trace_k2")).alias(
                "trace_id"
            ),
            F.col("_first.svc").alias("service_name"),
            "span_count",
            "has_error",
            "error_count",
            "max_duration_ms",
            "min_timestamp_ms",
            "max_timestamp_ms",
            "operations",
            F.col("_root.sid").alias("root_span_id"),
        )
    )


def run_streaming_pipeline(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    cfg: SamplerConfig | None = None,
    gap_seconds: int = 30,
    watermark_delay: str = "10 seconds",
    available_now: bool = True,
    max_files_per_trigger: int | None = 8,
):
    """Bounded streaming run (Trigger.AvailableNow): emits decided trace
    summaries for every session the watermark closed, written per micro-batch
    via foreachBatch into decided/ (append-only, idempotent by batch id).

    Returns the StreamingQuery after awaiting termination.
    """
    cfg = cfg or SamplerConfig(rate_limit_per_key=None)
    stream = read_tokenized_stream(spark, input_path, max_files_per_trigger)
    spans = parse_spans(stream, keep_tokens=False).filter(F.col("parse_ok"))
    sessions = assemble_sessions(spans, gap_seconds, watermark_delay)

    decided_dir = os.path.join(out_dir, "decided")
    ckpt = os.path.join(out_dir, "_stream_checkpoint")

    def sink_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = decide(batch_df, cfg)
        (
            out.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(decided_dir)
        )

    writer = (
        sessions.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(sink_batch)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
    else:
        q = writer.start()
    q.awaitTermination()
    return q

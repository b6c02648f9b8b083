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

from otel_tail_sampler_spark.operators.parser import parse_spans_jvm
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


def decode_kafka_value(raw: DataFrame) -> DataFrame:
    """Map a Kafka-shaped frame (binary ``value`` column, the JSON-encoded
    tokenized row — consumer.rs:136-193's payload) onto the same schema the
    file source yields, so everything downstream is source-agnostic. Split
    out from ``read_kafka_stream`` so the decode logic is unit-testable on
    a batch DataFrame with the Kafka wire columns even where the
    spark-sql-kafka package is absent (tests/test_streaming.py); malformed
    JSON decodes to all-NULL fields, which the parser's malformed sink
    then routes, mirroring the reference's skip-on-decode-error."""
    return raw.select(
        F.from_json(
            F.col("value").cast("string"),
            "doc_id string, tokens array<int>, n_tok int, source string",
        ).alias("r")
    ).select("r.*")


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka source branch (S1 proper; /root/reference/src/kafka/consumer.rs
    :136-193). Requires the spark-sql-kafka package on the classpath
    (absent in this sandbox — the file source is the tested stand-in and
    ``decode_kafka_value`` carries the tested mapping; this branch is
    exercised on real deployments via
    --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return decode_kafka_value(raw)


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


STATE_SCHEMA = (
    "span_count long, error_count long, max_duration_ms long, "
    "min_ts long, max_ts long, first_ts long, first_sid string, "
    "first_svc string, root_ts long, root_sid string, ops array<string>"
)

SUMMARY_SCHEMA = (
    "trace_k1 long, trace_k2 long, trace_id string, service_name string, "
    "span_count long, has_error boolean, error_count long, "
    "max_duration_ms long, min_timestamp_ms long, max_timestamp_ms long, "
    "operations array<string>, root_span_id string"
)


def assemble_with_state(
    spans: DataFrame, gap_seconds: int = 30, watermark_delay: str = "10 seconds"
) -> DataFrame:
    """Per-trace CUSTOM state with event-time timeout — the second streaming
    strategy, mirroring the reference's TraceState inactivity expiry
    (/root/reference/src/state.rs:293-325) directly instead of via
    session_window: each trace key holds one state row of running aggregates;
    a span batch folds into it and re-arms the timeout at
    last_span_ts + gap; when the watermark passes that, the summary is
    emitted exactly once and the state removed.

    Equivalent to assemble_sessions when no trace pauses longer than the gap
    (one session per trace); differs by design when a trace pauses — the
    session variant emits one summary per burst, this one folds everything
    seen until the trace finally goes quiet (closer to the reference, which
    keeps ONE buffer entry per trace id, memory.rs:185-228).
    """
    import pandas as pd

    gap_ms = gap_seconds * 1000

    with_ts = spans.withColumn(
        "event_time", F.timestamp_millis(F.col("timestamp_ms"))
    ).withWatermark("event_time", watermark_delay)

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            (sc, ec, mx, mn, mxts, fts, fsid, fsvc, rts, rsid, ops) = state.get
            state.remove()
            k1, k2 = int(key[0]), int(key[1])
            yield pd.DataFrame(
                [
                    {
                        "trace_k1": k1,
                        "trace_k2": k2,
                        "trace_id": f"{k1 & (2**64 - 1):016X}{k2 & (2**64 - 1):016X}",
                        "service_name": fsvc,
                        "span_count": sc,
                        "has_error": ec > 0,
                        "error_count": ec,
                        "max_duration_ms": mx,
                        "min_timestamp_ms": mn,
                        "max_timestamp_ms": mxts,
                        "operations": sorted(ops),
                        "root_span_id": rsid,
                    }
                ]
            )
            return

        sc, ec, mx, mn, mxts = 0, 0, None, None, None
        fts, fsid, fsvc, rts, rsid = None, None, None, None, None
        ops: set = set()
        if state.exists:
            (sc, ec, mx, mn, mxts, fts, fsid, fsvc, rts, rsid, prev_ops) = state.get
            ops = set(prev_ops)

        for pdf in pdfs:
            sc += len(pdf)
            ec += int((pdf["status_code"] == 2).sum())
            mx = max(int(pdf["duration_ms"].max()), mx if mx is not None else -1)
            mn = min(int(pdf["timestamp_ms"].min()), mn if mn is not None else 2**62)
            mxts = max(int(pdf["timestamp_ms"].max()), mxts if mxts is not None else -1)
            ops.update(pdf["operation_name"])
            # first span by (ts, span_id) — batch assembly's min-struct order
            i = pdf.sort_values(["timestamp_ms", "span_id"]).iloc[0]
            cand = (int(i["timestamp_ms"]), str(i["span_id"]), str(i["service_name"]))
            if fts is None or cand[:2] < (fts, fsid):
                fts, fsid, fsvc = cand
            roots = pdf[pdf["parent_span_id"].isnull()]
            if len(roots):
                j = roots.sort_values(["timestamp_ms", "span_id"]).iloc[0]
                rc = (int(j["timestamp_ms"]), str(j["span_id"]))
                if rts is None or rc < (rts, rsid):
                    rts, rsid = rc

        state.update((sc, ec, mx, mn, mxts, fts, fsid, fsvc, rts, rsid, sorted(ops)))
        # re-arm: fire when the watermark passes last-span-ts + gap; never arm
        # in the past (Spark requires timeout > current watermark)
        state.setTimeoutTimestamp(
            max(mxts + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        return
        yield  # pragma: no cover — make fn a generator in the update branch

    return with_ts.groupBy("trace_k1", "trace_k2").applyInPandasWithState(
        fn,
        outputStructType=SUMMARY_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
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
    strategy: str = "session_window",
    route_spans_from: str | None = None,
):
    """Bounded streaming run (Trigger.AvailableNow): emits decided trace
    summaries for every session the watermark closed, written per micro-batch
    via foreachBatch into decided/ (append-only, idempotent by batch id).

    ``strategy``: 'session_window' (watermarked session aggregation) or
    'state' (applyInPandasWithState per-trace timeout, state.rs:293-325).

    ``route_spans_from``: path of the bronze tokenized table. When set, each
    micro-batch also exports the KEPT traces' raw span rows (token arrays
    verbatim) into routed_keep/ — the reference's "export buffered spans on
    decision" move (evaluator.rs:244, spans buffered in Redis/memory) with
    the lake as the span buffer: a stream-static semi-join per batch instead
    of a stateful span buffer, which is the piece that cannot scale to
    10^12 spans of state. At scale the bronze table should be
    day-partitioned (operators.routing.write_routed day_partition) so the
    decided batch's time bounds prune the static side's scan.

    Returns the StreamingQuery after awaiting termination.
    """
    cfg = cfg or SamplerConfig(rate_limit_per_key=None)
    stream = read_tokenized_stream(spark, input_path, max_files_per_trigger)
    spans = parse_spans_jvm(stream, keep_tokens=False).filter(F.col("parse_ok"))
    if strategy == "state":
        sessions = assemble_with_state(spans, gap_seconds, watermark_delay)
    elif strategy == "session_window":
        sessions = assemble_sessions(spans, gap_seconds, watermark_delay)
    else:
        raise ValueError(f"unknown streaming strategy: {strategy}")

    decided_dir = os.path.join(out_dir, "decided")
    routed_dir = os.path.join(out_dir, "routed_keep")
    ckpt = os.path.join(out_dir, "_stream_checkpoint")

    def sink_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = decide(batch_df, cfg)
        (
            out.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(decided_dir)
        )
        if route_spans_from is not None:
            from otel_tail_sampler_spark.operators.parser import with_routing_key

            kept = out.filter(F.col("decision") == "keep")
            if kept.isEmpty():
                return
            bronze = with_routing_key(spark.read.parquet(route_spans_from))
            (
                # semi-join on the int key pair (no per-span hex); the kept
                # batch is small -> broadcast build side, bronze never shuffles
                bronze.filter("parse_ok")
                .join(kept.select("trace_k1", "trace_k2"), ["trace_k1", "trace_k2"], "semi")
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(routed_dir)
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

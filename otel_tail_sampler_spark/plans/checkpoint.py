"""Per-partition checkpoints: resumable bounded runs + per-stage lineage.

North-rule requirement (BASELINE.json): "resumable from per-partition
checkpoints with lineage and row-count metrics emitted per stage". The
reference's analog is Redis exported-keys dedup across restarts
(/root/reference/src/sampling/evaluator.rs:358-401); Spark batch has no
native per-partition resume (SURVEY.md §7.4.5), so we build it from
idempotent primitives:

* the unit of work is a deterministic LOGICAL bucket
  ``pmod(xxhash64(trace_id), n_buckets)`` — trace-aligned, so a bucket is
  decidable in isolation (all spans of a trace share its bucket; never bucket
  by input split, which would tear traces apart);
* sinks are written ``partitionBy(bucket, decision)`` with dynamic partition
  overwrite -> re-writing a bucket is idempotent;
* the manifest (parquet under ``_checkpoint/``) gains one row per completed
  bucket AFTER its sink data is committed; a resumed run reads the manifest
  and filters completed buckets out right after the parse stage, so their
  assembly/join cost is never paid again.

Crash window: between sink commit and manifest append a bucket may be
rewritten on resume — harmless by idempotence (exactly the Iceberg
write.target 'append-once discipline' called out in SURVEY.md §7.4.5).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from otel_tail_sampler_spark.operators.assembly import assemble_traces
from otel_tail_sampler_spark.operators.parser import parse_spans
from otel_tail_sampler_spark.operators.policies import SamplerConfig, decide
from otel_tail_sampler_spark.operators.routing import route_spans
from otel_tail_sampler_spark.plans.pipeline import read_tokenized

MANIFEST_SCHEMA = "bucket int, status string, rows long, committed_at_ms long"


def bucket_col(n_buckets: int):
    # trace-aligned bucket from the int64 key pair when present; malformed
    # rows (null key) fall back to doc_id so they land in a deterministic
    # bucket instead of all colliding in one
    return F.pmod(
        F.xxhash64(
            F.coalesce(F.col("trace_k1").cast("string"), F.col("doc_id")),
            F.coalesce(F.col("trace_k2").cast("string"), F.lit("")),
        ),
        F.lit(n_buckets),
    ).cast("int")


def read_manifest(spark: SparkSession, ckpt_dir: str) -> set[int]:
    try:
        rows = spark.read.schema(MANIFEST_SCHEMA).parquet(ckpt_dir).collect()
    except Exception:
        return set()
    return {r["bucket"] for r in rows if r["status"] == "done"}


@dataclass
class ResumableResult:
    processed_buckets: list[int]
    skipped_buckets: list[int]
    stage_metrics: dict[str, int]


def run_resumable(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    cfg: SamplerConfig | None = None,
    n_buckets: int = 16,
    force_rules: list[dict] | None = None,
) -> ResumableResult:
    """One resumable pass: process all not-yet-committed buckets, commit
    sinks, then append the checkpoint manifest. Re-running after any failure
    completes exactly the remaining buckets."""
    cfg = cfg or SamplerConfig()
    ckpt_dir = os.path.join(out_dir, "_checkpoint")
    routed_dir = os.path.join(out_dir, "routed")
    done = read_manifest(spark, ckpt_dir)
    remaining = [b for b in range(n_buckets) if b not in done]
    if not remaining:
        return ResumableResult([], sorted(done), {})

    spans = parse_spans(read_tokenized(spark, input_path)).withColumn(
        "bucket", bucket_col(n_buckets)
    )
    if done:  # prune completed buckets BEFORE any shuffle
        spans = spans.filter(~F.col("bucket").isin([int(b) for b in done]))

    good = spans.filter(F.col("parse_ok")).drop("tokens", "n_tok")
    traces = assemble_traces(good.drop("bucket"))
    if force_rules:
        from otel_tail_sampler_spark.operators.force_rules import apply_force_rules

        traces = apply_force_rules(traces, good, force_rules)
    decided = decide(traces, cfg)
    # persist ONLY the slim decision projection (mirrors pipeline.py): the
    # route join build side and the trace count reuse it without recomputing
    # parse + assembly
    slim_cols = ["trace_id", "decision", "decision_policy"]
    if "trace_k1" in decided.columns:
        slim_cols = ["trace_k1", "trace_k2"] + slim_cols
    decisions = decided.select(*slim_cols).persist()
    routed = route_spans(spans, decisions)

    # idempotent sink commit FIRST — the single full pass over the data.
    # Dynamic partition overwrite is the correctness contract here: with
    # Spark's default static mode, mode('overwrite') would delete previously
    # committed bucket partitions on resume while the manifest still marks
    # them done. Pin it for this write regardless of the caller's session.
    ow_key = "spark.sql.sources.partitionOverwriteMode"
    try:
        prev_ow = spark.conf.get(ow_key)
    except Exception:
        prev_ow = None
    spark.conf.set(ow_key, "dynamic")
    try:
        (
            routed.write.mode("overwrite")
            .partitionBy("bucket", "decision")
            .parquet(routed_dir)
        )
    finally:
        if prev_ow is not None:
            spark.conf.set(ow_key, prev_ow)
        else:
            # conf was unset before: restore that, don't leak 'dynamic'
            # into unrelated later writes in the caller's session
            spark.conf.unset(ow_key)

    # lineage counts from the WRITTEN data (partition-pruned read-back of
    # this run's buckets) — no second pass over the input
    counts = (
        spark.read.parquet(routed_dir)
        .filter(F.col("bucket").isin([int(b) for b in remaining]))
        .groupBy("bucket", "decision")
        .agg(F.count(F.lit(1)).alias("rows"))
        .collect()
    )
    stage_metrics: dict[str, int] = {}
    per_bucket: dict[int, int] = {}
    for r in counts:
        stage_metrics[f"routed_{r['decision']}"] = (
            stage_metrics.get(f"routed_{r['decision']}", 0) + r["rows"]
        )
        per_bucket[r["bucket"]] = per_bucket.get(r["bucket"], 0) + r["rows"]
    stage_metrics["input_rows"] = sum(per_bucket.values())
    stage_metrics["traces"] = decisions.count()
    decisions.unpersist()

    # manifest append AFTER data commit
    now_ms = int(time.time() * 1000)
    manifest_rows = [
        (int(b), "done", int(per_bucket.get(b, 0)), now_ms) for b in remaining
    ]
    spark.createDataFrame(manifest_rows, MANIFEST_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(ckpt_dir)

    return ResumableResult(sorted(remaining), sorted(done), stage_metrics)

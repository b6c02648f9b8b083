"""Trace assembly: spans -> one TraceSummary row per trace_id.

Re-expresses the reference's incremental TraceMetadata update
(/root/reference/src/storage/memory.rs:139-164, summary emit 230-269; same
logic in src/state.rs:237-258,494-519) as a hash aggregation. The reference's
running min/max/or/count/set update IS a partial aggregate — Spark's
two-phase (partial -> final) hash agg gives it for free.

Heavy-hitter skew (1% of traces with 20k spans, scripts/load_simulation.rs:52-55)
is handled two ways, selectable:

* default: rely on map-side partial aggregation — each input split emits at
  most one partial row per trace_id, so a 20k-span trace costs its reducer
  O(#splits), not O(#spans);
* ``salt_buckets=N``: explicit two-phase salted aggregation
  (groupBy(trace_id, salt) -> groupBy(trace_id)) for the collect_set-bearing
  plan, where partial state is not reduced map-side for high-cardinality sets.

Root-span election is deterministic: the root (parent IS NULL) with the
smallest (timestamp_ms, span_id) wins — the reference is order-dependent here
(memory.rs:158-160 last-wins vs state.rs:499-504 first-wins); we pick one rule
and encode it via min(struct(ts, span_id)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACE_SUMMARY_COLS = [
    "trace_id",
    "service_name",
    "span_count",
    "has_error",
    "error_count",
    "max_duration_ms",
    "min_timestamp_ms",
    "max_timestamp_ms",
    "operations",
    "root_span_id",
]


def _err() -> Column:
    return (F.col("status_code") == 2).cast("int")


def _root_key() -> Column:
    # struct min => deterministic (min ts, then min span_id) root election
    return F.when(
        F.col("parent_span_id").isNull(),
        F.struct(
            F.col("timestamp_ms").alias("ts"), F.col("span_id").alias("sid")
        ),
    )


def _first_span_key() -> Column:
    # service_name comes from the trace's first span (memory.rs:250-254)
    return F.struct(
        F.col("timestamp_ms").alias("ts"),
        F.col("span_id").alias("sid"),
        F.col("service_name").alias("svc"),
    )


def _group_keys(spans: DataFrame) -> list[str]:
    """Prefer the two-int64 trace key (16 fixed bytes, no string hashing in
    the shuffle) when the parser provided it; fall back to the hex string."""
    if "trace_k1" in spans.columns:
        return ["trace_k1", "trace_k2"]
    return ["trace_id"]


def _with_trace_id(df: DataFrame, keys: list[str]) -> DataFrame:
    """Derive the canonical hex trace_id per TRACE (post-agg, O(traces) not
    O(spans)) when grouping ran on the int64 key pair."""
    if keys == ["trace_id"]:
        return df
    from otel_tail_sampler_spark.operators.parser import hex_from_keys

    return df.withColumn(
        "trace_id", hex_from_keys(F.col("trace_k1"), F.col("trace_k2"))
    )


def detect_salt_buckets(
    spans: DataFrame,
    sample_fraction: float = 0.01,
    hot_threshold: int = 5_000,
    max_buckets: int = 64,
    seed: int = 42,
) -> int | None:
    """Cheap key-skew probe: spans-per-trace on a seeded sample; if the
    hottest sampled trace implies more than ``hot_threshold`` spans, return a
    bucket count sized so each reducer sees ~hot_threshold of them (capped).

    Cost: ONE narrow aggregation over ``sample_fraction`` of the input
    (key columns only — Parquet reads nothing else). The estimate is noisy
    but only the order of magnitude matters for picking a bucket count; a
    sampled hot key is by definition the kind that shows up in any sample.
    """
    import math

    keys = _group_keys(spans)
    top = (
        spans.sample(fraction=sample_fraction, seed=seed)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c"))
        .collect()[0][0]
    )
    if top is None:
        return None
    implied = top / sample_fraction
    if implied <= hot_threshold:
        return None
    return min(max_buckets, max(2, math.ceil(implied / hot_threshold)))


def assemble_traces(
    spans: DataFrame, salt_buckets: int | str | None = None
) -> DataFrame:
    """spans -> TraceSummary (one row per trace_id). A1 of SURVEY.md §2.4.

    ``salt_buckets``: None = single two-phase hash agg (map-side combine),
    an int = explicit salted two-phase plan, 'auto' = probe the key skew
    (detect_salt_buckets) and salt only when a heavy hitter is found.
    """
    keys = _group_keys(spans)
    if salt_buckets == "auto":
        salt_buckets = detect_salt_buckets(spans)
    if salt_buckets and salt_buckets > 1:
        return _assemble_salted(spans, salt_buckets, keys)
    agg = (
        spans.groupBy(*keys)
        .agg(
            F.min(_first_span_key()).alias("_first"),
            F.count(F.lit(1)).alias("span_count"),
            F.max(_err()).cast("boolean").alias("has_error"),
            F.sum(_err()).alias("error_count"),
            F.max("duration_ms").alias("max_duration_ms"),
            F.min("timestamp_ms").alias("min_timestamp_ms"),
            F.max("timestamp_ms").alias("max_timestamp_ms"),
            F.array_sort(F.collect_set("operation_name")).alias("operations"),
            F.min(_root_key()).alias("_root"),
        )
    )
    return _with_trace_id(agg, keys).select(
        *keys if keys != ["trace_id"] else [],
        "trace_id",
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


def _assemble_salted(spans: DataFrame, salt_buckets: int, keys: list[str] | None = None) -> DataFrame:
    """Explicit two-phase salted aggregation for heavy-hitter trace_ids.

    Phase 1 groups by (trace_id, salt) — a 20k-span trace is split across
    ``salt_buckets`` reducers; phase 2 merges the <=salt_buckets partial rows
    per trace. Algebra: min/max/sum merge trivially; sets merge via
    flatten+array_distinct; root/first elections merge via min of the partial
    struct minima.
    """
    keys = keys or _group_keys(spans)
    salted = spans.withColumn(
        "_salt", F.pmod(F.xxhash64("span_id"), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        F.min(_first_span_key()).alias("_first"),
        F.count(F.lit(1)).alias("_cnt"),
        F.sum(_err()).alias("_errs"),
        F.max("duration_ms").alias("_maxd"),
        F.min("timestamp_ms").alias("_mints"),
        F.max("timestamp_ms").alias("_maxts"),
        F.collect_set("operation_name").alias("_ops"),
        F.min(_root_key()).alias("_root"),
    )
    final = partial.groupBy(*keys).agg(
        F.min("_first").alias("_first"),
        F.sum("_cnt").alias("span_count"),
        F.sum("_errs").alias("error_count"),
        F.max("_maxd").alias("max_duration_ms"),
        F.min("_mints").alias("min_timestamp_ms"),
        F.max("_maxts").alias("max_timestamp_ms"),
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("_ops")))
        ).alias("operations"),
        F.min("_root").alias("_root"),
    )
    return _with_trace_id(final, keys).select(
        *keys if keys != ["trace_id"] else [],
        "trace_id",
        F.col("_first.svc").alias("service_name"),
        "span_count",
        (F.col("error_count") > 0).alias("has_error"),
        "error_count",
        "max_duration_ms",
        "min_timestamp_ms",
        "max_timestamp_ms",
        "operations",
        F.col("_root.sid").alias("root_span_id"),
    )

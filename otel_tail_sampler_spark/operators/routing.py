"""Route decided traces' spans to keep/drop/overflow sinks + stage metrics.

Re-expresses the evaluator's export flow (/root/reference/src/sampling/
evaluator.rs:241-336 — fetch kept traces' spans, export, account) as one
shuffle join + a single-pass partitioned write:

    routed = spans JOIN decided(trace_id, decision, decision_policy)
    write routed partitioned by decision  (keep / drop / overflow in ONE pass)

The join is the 'metadata-first' pattern (docs/ARCHITECTURE_V2_ICEBERG.md:27-33):
the decision table carries ~50 bytes/trace; the wide token payload stays in the
span table and is only moved once. At scale the join shuffles both sides by
trace_id — the SAME key the assembly aggregation shuffled on, so with AQE the
exchange is reused; heavy-hitter traces are split by AQE skew-join.

Metrics (A9, src/observability/metrics.rs:20-58): per-(policy, decision) trace
counts and per-sink routed-row counts, emitted as DataFrames — the per-sink
aggregate-count parity artifact of the north rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECISION_COLS = ["trace_id", "decision", "decision_policy"]
SINKS = ("keep", "drop", "overflow")
DROP_SINK = "drop"
DROP_POLICY = "no_policy_matched"


def route_spans(spans: DataFrame, decided: DataFrame) -> DataFrame:
    """Attach (decision, decision_policy) to every span row of the input.

    ``spans`` must carry trace_id (parser output, tokens preserved). A left
    join keeps malformed rows (parse_ok=false, null trace_id) in the stream:
    they route to the ``malformed`` sink instead of aborting or vanishing —
    one scan, one join, no separate quarantine pass.
    """
    # Broadcast only the NON-DEFAULT decisions: 'drop'/'no_policy_matched' is
    # the overwhelming majority at real sampling rates, so the join build side
    # shrinks from |traces| to |kept + overflow + force-dropped| (~a few
    # percent) — the metadata-first move that keeps the broadcast O(kept), not
    # O(traces), at any scale. Unmatched spans default to drop.
    #
    # Escape hatch at extreme scale: there is deliberately NO F.broadcast()
    # hint here. Spark sizes the build side itself, so when the kept set
    # exceeds spark.sql.autoBroadcastJoinThreshold (e.g. 10^12 traces at a
    # high keep rate) the plan degrades gracefully to a shuffle join on the
    # SAME trace-key the assembly aggregation shuffled on (exchange reuse,
    # AQE skew splitting) instead of OOMing the driver on a forced broadcast.
    # Operators can pin either behavior via that threshold; tests/test_plans.py
    # asserts the broadcast shape at sampled-keep sizes.
    #
    # Join on the int64 trace-key pair when both sides carry it (16-byte
    # fixed keys, no per-span string hashing); the hex trace_id then comes
    # from the build side for matched (non-drop) rows only.
    int_keys = "trace_k1" in spans.columns and "trace_k1" in decided.columns
    join_keys = ["trace_k1", "trace_k2"] if int_keys else ["trace_id"]
    cols = join_keys + [
        c
        for c in DECISION_COLS
        if c not in join_keys and not (c in spans.columns and c != "trace_id")
    ]
    if "trace_id" in spans.columns and "trace_id" not in join_keys:
        cols = [c for c in cols if c != "trace_id"]
    interesting = decided.select(*cols).filter(
        (F.col("decision") != DROP_SINK)
        | (F.col("decision_policy") != DROP_POLICY)
    )
    out = spans.join(interesting, join_keys, "left")
    bad = (
        ~F.col("parse_ok")
        if "parse_ok" in spans.columns
        else F.col("decision").isNull()
    )
    override = {
        "decision": F.when(bad, F.lit("malformed")).otherwise(
            F.coalesce(F.col("decision"), F.lit(DROP_SINK))
        ),
        "decision_policy": F.when(bad, F.lit("parse_error")).otherwise(
            F.coalesce(F.col("decision_policy"), F.lit(DROP_POLICY))
        ),
    }
    if "trace_id" in out.columns and "trace_id" not in join_keys:
        # spans carry UNgated int keys (with_routing_key): a malformed row
        # whose junk key slots collide with a real trace would otherwise
        # surface that trace's hex id from the build side
        override["trace_id"] = F.when(bad, F.lit(None).cast("string")).otherwise(
            F.col("trace_id")
        )
    return out.withColumns(override)


def route_spans_semi(spans: DataFrame, decided: DataFrame, sink: str) -> DataFrame:
    """Left-semi variant (J1): only the rows for one sink, no added columns —
    what you use when only the keep stream is exported (evaluator.rs:244)."""
    ids = decided.filter(F.col("decision") == sink).select("trace_id")
    return spans.join(ids, "trace_id", "semi")


def decision_metrics(decided: DataFrame) -> DataFrame:
    """Per-(policy, decision) trace counts — tail_sampling_traces_* parity."""
    return (
        decided.groupBy("decision_policy", "decision")
        .agg(F.count(F.lit(1)).alias("trace_count"))
        .withColumnRenamed("decision", "sink")
    )


def sink_row_metrics(routed: DataFrame) -> DataFrame:
    """Per-sink routed span-row counts (the routed-row count parity metric)."""
    return routed.groupBy("decision").agg(
        F.count(F.lit(1)).alias("row_count")
    ).withColumnRenamed("decision", "sink")


def write_routed(
    routed: DataFrame,
    out_dir: str,
    fmt: str = "parquet",
    day_partition: bool = False,
) -> None:
    """Single-pass fan-out: one partitioned write, three sinks.

    Writing ``partitionBy('decision')`` produces keep/ drop/ overflow/
    directories in one job instead of three filtered writes (one scan, not
    three). Iceberg deployments replace this with three ``writeTo(...)``
    appends or a partitioned table on the decision column.

    ``day_partition=True`` adds the reference's time dimension
    (``day(timestamp_ms)``, iceberg.rs:317-334): the day is derived
    JVM-side from the token header slots (parser.day_expr — the routing
    path stays Arrow-free), so every time-ranged sink read gets partition
    pruning instead of a full scan. Rows without a decodable timestamp
    (malformed) land in the null default partition of their sink.
    """
    df, cols = routed, ["decision"]
    if day_partition and "tokens" in routed.columns:
        from otel_tail_sampler_spark.operators.parser import day_expr

        df = routed.withColumn("day", day_expr(F.col("tokens")))
        cols = ["decision", "day"]
    df.write.mode("overwrite").partitionBy(*cols).format(fmt).save(out_dir)

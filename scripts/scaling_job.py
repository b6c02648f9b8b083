"""One scaling-protocol measurement: run the full decision pipeline R times
in this JVM at the given parallelism, print one JSON line with the warm time.

Invoked by scripts/bench_scaling.py via spark-submit at local[8] / local[32].
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    dataset = sys.argv[2] if len(sys.argv) > 2 else "bench0.1"
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from otel_tail_sampler_spark.operators.routing import decision_metrics
    from otel_tail_sampler_spark.plans.pipeline import run_pipeline
    from otel_tail_sampler_spark.session import build_session
    from otel_tail_sampler_spark.sources.generator import ensure_dataset

    paths = ensure_dataset(dataset)
    spark = build_session(
        app_name=f"scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores * 2,
    )

    times = []
    n_spans = n_traces = 0
    # list/read the input once — a production job pays file listing once, so
    # per-repeat re-listing would be a measurement artifact
    tokenized = spark.read.parquet(paths["tokenized"])
    for _ in range(repeats):
        spark.catalog.clearCache()
        t0 = time.time()
        res = run_pipeline(spark, tokenized, E.ENTRY_CFG)
        # ONE action: union the two tiny metric tables so sink-row counts and
        # per-policy trace counts materialize in a single job (one driver
        # round-trip instead of two serial ones)
        both = (
            res.routed.groupBy("decision")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("kind", F.lit("rows"))
            .unionByName(
                decision_metrics(res.decisions)
                .select(F.col("sink").alias("decision"), F.col("trace_count").alias("n"))
                .withColumn("kind", F.lit("traces"))
            )
            .collect()
        )
        times.append(time.time() - t0)
        n_spans = sum(r["n"] for r in both if r["kind"] == "rows")
        n_traces = sum(r["n"] for r in both if r["kind"] == "traces")
    spark.stop()

    print(
        json.dumps(
            {
                "cores": cores,
                "dataset": dataset,
                "times": [round(t, 3) for t in times],
                "warm_sec": round(min(times), 3),
                "n_spans": n_spans,
                "n_traces": n_traces,
                "traces_per_sec": round(n_traces / min(times), 1),
                "spans_per_sec": round(n_spans / min(times), 1),
            }
        )
    )


if __name__ == "__main__":
    main()

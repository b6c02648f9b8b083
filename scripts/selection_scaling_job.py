"""One SELECTION-TIER scaling measurement: DSIR score + top-k select
over the full corpus R times in this JVM at the given parallelism,
print one JSON line with the warm time.

Invoked by scripts/selection_scaling.py via spark-submit — the
selection-tier counterpart of prep_scaling_job.py. The timed leg is the
per-batch production shape: the bucket model is a STANDING artifact
(built + collected once, untimed — exactly how the streaming gate and
any recurring scoring job amortize it); each repeat scores every
document through the broadcast Arrow kernel and takes the global top-k.
The corpus crosses the JVM<->Python socket once per pass and never
shuffles, so this measures how the Arrow worker pool scales with cores
— the known risk axis for mapInPandas stages (cf. the pack rewrite
history in BENCH/PREP_SCALING.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    dataset = sys.argv[2] if len(sys.argv) > 2 else "0.1"
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    replicate = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    from pyspark.sql import functions as F

    from otel_tail_sampler_spark.operators.selection import (
        build_dsir_model_partitioned,
        dsir_select,
    )
    from otel_tail_sampler_spark.session import build_session
    from otel_tail_sampler_spark.sources.generator import ensure_dataset

    paths = ensure_dataset(dataset)
    spark = build_session(
        app_name=f"selection-scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores * 2,
    )

    base = spark.read.parquet(paths["tokenized"])
    # deterministic xN replication: the sf0.1 corpus finishes in ~3s on
    # ONE core, so fixed job overhead (driver, Arrow batch setup,
    # TakeOrdered merge) would dominate any efficiency ratio; the
    # replicated corpus makes the kernel the measured quantity. Distinct
    # ids keep the top-k and every per-doc computation well-defined.
    tokenized = base.crossJoin(
        F.broadcast(
            spark.range(replicate).select(
                F.col("id").cast("int").alias("_rep")
            )
        )
    ).select(
        F.concat_ws("#", "doc_id", F.col("_rep").cast("string")).alias(
            "doc_id"
        ),
        "tokens",
        "source",
    )
    n_docs = tokenized.count()

    # standing model: built once, pinned as local rows (untimed) — the
    # deployment shape; the timed loop must not re-run its lineage
    model = build_dsir_model_partitioned(
        tokenized, F.col("source") == "svc-00", n_buckets=1 << 16
    )
    model = spark.createDataFrame(model.collect(), model.schema)

    times = []
    for _ in range(repeats):
        spark.catalog.clearCache()
        t0 = time.time()
        dsir_select(tokenized, model, k=1000, n_buckets=1 << 16).collect()
        times.append(time.time() - t0)
    spark.stop()

    warm = min(times)
    print(
        json.dumps(
            {
                "cores": cores,
                "dataset": dataset,
                "n_docs": n_docs,
                "warm_sec": round(warm, 3),
                "docs_per_sec": int(n_docs / warm),
                "draws": [round(t, 3) for t in times],
            }
        )
    )


if __name__ == "__main__":
    main()

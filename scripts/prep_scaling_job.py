"""One TOKENS-TIER scaling measurement: run the training-prep core
(sequence packing -> shard assignment, the corpus permutation) R times in
this JVM at the given parallelism, print one JSON line with the warm time.

Invoked by scripts/prep_scaling.py via spark-submit — the tokens-tier
counterpart of scaling_job.py (which measures the span decision pipeline).
The job is the shuffle-bound heart of plans/corpus_prep.py: every token
moves exactly once through the example assembly exchange, then the shard
window's exchange doubles as the write partitioning — so its scaling is
the scaling of the prep DAG's data movement.
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

    from otel_tail_sampler_spark.operators.packing import (
        assign_shards,
        pack_sequences,
    )
    from otel_tail_sampler_spark.session import build_session
    from otel_tail_sampler_spark.sources.generator import ensure_dataset

    paths = ensure_dataset(dataset)
    spark = build_session(
        app_name=f"prep-scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores * 2,
    )

    tokenized = spark.read.parquet(paths["tokenized"])
    n_rows = tokenized.count()  # known row count: pack skips its sizing scan

    times = []
    n_tokens = n_examples = 0
    for _ in range(repeats):
        spark.catalog.clearCache()
        t0 = time.time()
        packed = pack_sequences(tokenized, max_len=512, n_rows=n_rows)
        sharded = assign_shards(packed, n_shards=max(cores, 8))
        row = sharded.agg(
            F.sum("n_tok").alias("tokens"),
            F.count(F.lit(1)).alias("examples"),
        ).collect()[0]
        times.append(time.time() - t0)
        n_tokens, n_examples = int(row["tokens"]), int(row["examples"])
    spark.stop()

    print(
        json.dumps(
            {
                "cores": cores,
                "dataset": dataset,
                "times": [round(t, 3) for t in times],
                "warm_sec": round(min(times), 3),
                "n_rows": n_rows,
                "n_tokens": n_tokens,
                "n_examples": n_examples,
                "tokens_per_sec": round(n_tokens / min(times), 1),
            }
        )
    )


if __name__ == "__main__":
    main()

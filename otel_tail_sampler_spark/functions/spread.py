"""Small-input spread for CPU-dense map stages.

Spark sizes scan parallelism by input SPLITS (`maxPartitionBytes`, row-group
bounded). A small file — one row group, a few hundred KiB — therefore runs
as ONE task, which starves compute-dense per-row stages (per-shingle md5
minhashing, Arrow winnowing kernels): measured 3.4s single-task vs <1s
spread for minhash signatures over 5 000 docs on 32 cores.

``spread_small_input`` repartitions ONLY when the input's planned partition
count is below the session default parallelism. The shuffle it introduces
moves the raw input — by construction tiny (it fit in fewer splits than
there are cores) — and buys a cores-wide compute stage. At lake scale the
condition never fires: a 100 TB table plans thousands of splits, so the
operators keep their shuffle-free / minimal-shuffle plan shapes (PLANS.md
captures those shapes with pre-spread inputs for exactly this reason).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` to the session default parallelism iff its planned
    partition count is smaller. No-op (and no shuffle) otherwise."""
    if df.isStreaming:  # no static partition plan to inspect; leave as-is
        return df
    sc = df.sparkSession.sparkContext
    target = min_parts if min_parts is not None else sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

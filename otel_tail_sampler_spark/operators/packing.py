"""Sequence packing: variable-length token sequences -> fixed-length
training examples (the canonical pre-training batch-prep operator over
exactly this repo's input table shape, (doc_id, tokens:array<int>, n_tok)).

Semantics (deterministic, partition-count-independent): concatenate every
sequence in doc_id order into one logical token stream, then cut the stream
into consecutive examples of ``max_len`` tokens (the last example may be
short). Documents therefore may straddle example boundaries — the standard
"packed causal LM" layout; add separator tokens upstream if boundaries must
be visible.

Scale shape — the naive formulations both fail at 10^12 sequences:
* a global ``sum(n_tok) OVER (ORDER BY doc_id)`` window funnels the whole
  table through ONE task (no partition spec);
* per-token posexplode multiplies the row count by the sequence length.
Here the global prefix offsets come from the classic two-phase scan:
range-partition by doc_id, per-partition token totals (ONE tiny row per
partition) are prefix-summed on the driver and broadcast back as base
offsets, then an Arrow-batched stage computes each document's global start
offset locally and emits one row PER (document x example) intersection
(<= n_tok/max_len + 1 rows per doc, not per token). Final assembly is one
groupBy(example_id) whose shuffle moves each token exactly once — packing
is a data permutation, so that is the lower bound.

Output determinism does not depend on the partitioning: range boundaries
are sampled, but offsets are globally exact and rows are sorted by doc_id
within partitions, so the packed stream is identical for any partition
count — which is what makes the operator oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    max_len: int = 512,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
) -> DataFrame:
    """-> (example_id long, tokens array<int>, n_tok int): consecutive
    ``max_len``-token examples of the doc_id-ordered concatenated stream."""
    from typing import Iterator

    import pandas as pd

    spark = df.sparkSession
    base = (
        df.select(F.col(id_col).alias("_id"), F.col(tok_col).alias("_t"))
        .repartitionByRange(F.col("_id"))
        .sortWithinPartitions("_id")
        .withColumn("_pid", F.spark_partition_id())
        # PINNED: repartitionByRange samples its boundaries per job, so the
        # totals pass and the emit pass would otherwise see different
        # partitionings and the broadcast base offsets would be wrong. The
        # totals collect() below materializes this cache. At lake scale,
        # replace the persist with explicit bucket ids derived from the id
        # scheme (or a bucketed silver table) so no second copy is held.
        .persist()
    )
    # one tiny row per partition -> driver prefix sum -> broadcast dict
    totals = {
        r["_pid"]: r["_n"]
        for r in base.groupBy("_pid").agg(F.sum(F.size("_t")).alias("_n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += int(totals[pid] or 0)
    base_off = spark.sparkContext.broadcast(offsets)

    def emit(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        off = None
        for pdf in batches:
            ex_ids, starts, slices = [], [], []
            for pid, toks in zip(pdf["_pid"], pdf["_t"]):
                if off is None:
                    off = base_off.value[int(pid)]
                toks = list(toks)
                pos, n = 0, len(toks)
                while pos < n:
                    ex = (off + pos) // max_len
                    take = min(n - pos, (ex + 1) * max_len - (off + pos))
                    ex_ids.append(ex)
                    starts.append(off + pos)
                    slices.append(toks[pos : pos + take])
                    pos += take
                off += n
            if ex_ids:  # an all-empty batch would yield float64 columns
                # that Arrow cannot cast to (long, long, list<int32>)
                yield pd.DataFrame(
                    {"example_id": ex_ids, "_start": starts, "_slice": slices}
                )

    pieces = base.mapInPandas(
        emit, "example_id long, _start long, _slice array<int>"
    )
    return (
        pieces.groupBy("example_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_start", "_slice"))),
                    lambda s: s.getField("_slice"),
                )
            ).alias("tokens")
        )
        .select(
            "example_id", "tokens", F.size("tokens").cast("int").alias("n_tok")
        )
    )


def assign_shards(
    examples: DataFrame,
    n_shards: int,
    id_col: str = "example_id",
    seed: str = "shards",
) -> DataFrame:
    """Deterministic shard assignment + shuffled within-shard order for
    training examples: adds ``shard`` (md5(id)%n_shards) and ``shard_pos``
    (0-based rank of the md5 hex within the shard).

    A reader streaming each shard in ``shard_pos`` order sees examples
    decorrelated from the packed document order — the standard "global
    shuffle" a training run needs — while both columns are pure functions
    of the example id: stable across re-runs, partition counts, and
    engines (md5 hex ranks identically in Spark and DuckDB).

    Scale shape: the ``row_number`` window partitions on ``shard``, so the
    exchange + in-partition sort is EXACTLY the movement needed to write
    the shard files afterwards (`repartition(n_shards, shard)
    .sortWithinPartitions(shard_pos)` reuses the same partitioning). One
    task holds ~|examples|/n_shards rows; md5 spreads ids uniformly, so
    skew cannot concentrate a shard. Pick n_shards by target shard file
    size exactly as any shard writer must.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat_ws("|", F.col(id_col).cast("string"), F.lit(seed)))
    out = examples.withColumn("_h", h).withColumn(
        "shard",
        F.pmod(
            F.conv(F.substring(F.col("_h"), 1, 15), 16, 10).cast("long"),
            F.lit(n_shards),
        ).cast("int"),
    )
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return out.withColumn(
        "shard_pos", (F.row_number().over(w) - 1).cast("int")
    ).drop("_h")


def add_special_tokens(
    df: DataFrame,
    bos_id: int | None = None,
    eos_id: int = -100,
    tok_col: str = "tokens",
) -> DataFrame:
    """Wrap each sequence with BOS/EOS sentinel ids (``bos_id`` optional)
    so document boundaries survive `pack_sequences`' concatenation —
    the docstring there points boundary-aware training here.

    Scan-time array concat, no shuffle; empty sequences are wrapped too
    (an empty doc still marks a boundary in the packed stream).
    """
    parts = []
    if bos_id is not None:
        parts.append(F.array(F.lit(int(bos_id))))
    parts.append(F.col(tok_col))
    parts.append(F.array(F.lit(int(eos_id))))
    return df.withColumn(tok_col, F.concat(*parts).cast("array<int>"))

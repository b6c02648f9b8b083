"""Corpus-level training-mix operators over the documents / tokenized
tables: vocabulary statistics and deterministic domain-mixture sampling —
the two knobs every pre-training data pipeline turns before packing.

Not present in the reference (a telemetry sampler); these are first-class
components of the task brief's training-data tier, sharing the engine's
md5 hash-fraction family (functions.hashing) so they stay deterministic
and DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from otel_tail_sampler_spark.functions.hashing import hash_frac


def vocab_histogram(
    df: DataFrame, tok_col: str = "tokens", top_k: int | None = None
) -> DataFrame:
    """(token, freq) unigram histogram of the token-array column.

    explode -> two-phase count: the partial aggregation combines map-side,
    so the shuffle carries one (token, partial-count) row per distinct
    token per input split — vocabulary-sized, not corpus-sized. This is
    the op behind vocab pruning / OOV-rate checks before training.
    """
    out = (
        df.select(F.explode(F.col(tok_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if top_k is not None:
        out = out.orderBy(F.desc("freq"), F.asc("token")).limit(top_k)
    return out


def mixture_sample(
    docs: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mixture",
) -> DataFrame:
    """Deterministic domain-mixing sample: keep a doc iff
    md5-fraction(doc_id | seed) < rates[source] (unlisted sources drop).

    Same consistent-sampling family as the policy engine's hash sampling:
    raising a source's rate only ADDS documents (nested keep sets), reruns
    are identical, and no shuffle happens at all — it is a scan-time
    filter that Catalyst pushes alongside the rest of the predicate.
    """
    pairs: list[Column] = []
    for s, r in rates.items():
        pairs += [F.lit(s), F.lit(float(r))]
    rate = F.coalesce(F.create_map(*pairs)[F.col(source_col)], F.lit(0.0))
    return docs.filter(hash_frac(F.col(id_col).cast("string"), seed) < rate)


def remap_rare_tokens(
    df: DataFrame,
    min_freq: int = 2,
    unk_id: int = -1,
    tok_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Replace tokens whose CORPUS-WIDE frequency is below ``min_freq``
    with ``unk_id`` (OOV/UNK collapse before vocabulary finalization).
    -> (id, tokens remapped in place, n_unk replaced per row).

    Scale shape: global frequencies come from the vocabulary-sized
    two-phase count above (shuffle carries distinct types, not the
    corpus). The rare-type set is then LEFT-joined against the
    posexploded stream and arrays reassemble by position — per Zipf the
    rare dictionary is far smaller than the stream, so Catalyst/AQE
    broadcasts it and the only corpus-sized exchange is the reassembly
    groupBy; each token moves exactly once. A `transform` +
    literal-array `array_contains` variant would avoid that exchange but
    scans the rare set per token (O(|rare|) interpreted, unbounded
    driver literal) — rejected for the general case.

    Docs with empty token arrays pass through with n_unk = 0.
    """
    rare = (
        vocab_histogram(df, tok_col=tok_col)
        .filter(F.col("freq") < min_freq)
        .select(F.col("token").alias("_rare"))
    )
    ex = df.select(
        F.col(id_col), F.posexplode(F.col(tok_col)).alias("_pos", "_tok")
    )
    marked = ex.join(rare, ex["_tok"] == rare["_rare"], "left").select(
        id_col,
        "_pos",
        F.when(F.col("_rare").isNotNull(), F.lit(unk_id))
        .otherwise(F.col("_tok"))
        .alias("_out"),
        F.col("_rare").isNotNull().cast("int").alias("_is_unk"),
    )
    rebuilt = marked.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_pos", "_out"))),
            lambda s: s.getField("_out"),
        ).alias("_toks"),
        F.sum("_is_unk").cast("int").alias("n_unk"),
    )
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("_toks"), F.array().cast("array<int>")).alias(
                tok_col
            ),
            F.coalesce(F.col("n_unk"), F.lit(0)).alias("n_unk"),
        )
    )


def prepare_corpus(
    docs: DataFrame,
    rates: dict[str, float],
    min_words: int = 5,
    max_words: int = 5000,
    max_dup_word_frac: float = 0.6,
    seed: str = "mixture",
) -> DataFrame:
    """The standard corpus-prep filter chain in one call:
    exact dedup -> length gate -> repetition gate -> deterministic
    domain-mixture sampling. -> (doc_id, source, n_words,
    dup_word_frac) for the surviving documents.

    Composition of already-proven operators, in the cheap-to-expensive
    order a 100 TB run wants: the md5 dedup and the hash-fraction mixture
    gate are scan-side (no text moves), and the repetition aggregates run
    only over dedup survivors. Every signal this chain gates on is
    oracle-checked standalone (dedup_exact / repetition_signals /
    mixture_sample), so the composition stays hash-checkable end-to-end.

    Gates use the ROUNDED dup_word_frac the repetition operator reports,
    keeping the keep-set identical across engines at the boundary.
    """
    from otel_tail_sampler_spark.operators.dedup import exact_dedup
    from otel_tail_sampler_spark.operators.text import repetition_signals

    kept = exact_dedup(docs)
    rep = repetition_signals(kept).select(
        "doc_id", "n_words", "dup_word_frac"
    )
    gated = (
        kept.select("doc_id", "source")
        .join(rep, "doc_id")
        .filter(
            (F.col("n_words") >= min_words)
            & (F.col("n_words") <= max_words)
            & (F.col("dup_word_frac") <= max_dup_word_frac)
        )
    )
    return mixture_sample(gated, rates, seed=seed)


def split_corpus(
    docs: DataFrame,
    train: float = 0.8,
    val: float = 0.1,
    id_col: str = "doc_id",
    seed: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: split by the md5 fraction
    of the doc id (train < ``train`` <= val < ``train+val`` <= test).

    Same consistent-hash family as mixture/policy sampling: assignment is
    a pure scan-time projection (no shuffle), stable across re-runs and
    engines, and growing ``train`` only MOVES docs val->train (never
    reshuffles the rest) — the property that keeps eval sets frozen while
    the train fraction is tuned.
    """
    f = hash_frac(F.col(id_col).cast("string"), seed)
    return docs.withColumn(
        "split",
        F.when(f < train, "train")
        .when(f < train + val, "val")
        .otherwise("test"),
    )

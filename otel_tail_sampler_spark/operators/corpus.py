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

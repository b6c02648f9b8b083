"""Training-example augmentation: deterministic fill-in-the-middle (FIM).

FIM (Bavarian et al. 2022, "Efficient Training of Language Models to Fill
in the Middle") rewrites a causal LM training sequence so the model learns
infilling: split tokens into (prefix, middle, suffix), then emit the PSM
layout  [PRE] prefix [SUF] suffix [MID] middle  — the middle moves to the
end so a left-to-right model predicts it conditioned on both sides. The
standard recipe applies the transform to a sampled fraction of documents
(``rate``) and leaves the rest untouched.

Engine-portable determinism: whether a document is transformed AND where
the two split points fall are pure md5-hash functions of the document id
(functions/hashing.py — bit-identical in Spark and DuckDB), so the output
is reproducible across runs, partitionings, and engines; the oracle
replays the exact splits in SQL.

Scale shape: one scan-time projection — slice/concat expressions, fully
whole-stage-codegen, no shuffle, no Python stage. Apply BEFORE
pack_sequences (the reference order in corpus-prep pipelines) so packed
examples carry the reordered layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from otel_tail_sampler_spark.functions.hashing import fast_frac, hash_frac


def fim_transform(
    df: DataFrame,
    pre_id: int,
    mid_id: int,
    suf_id: int,
    rate: float = 0.5,
    min_len: int = 4,
    seed: str = "fim",
    id_col: str = "doc_id",
    tok_col: str = "tokens",
) -> DataFrame:
    """Apply PSM fill-in-the-middle to a deterministic ``rate`` fraction
    of documents (hash-selected by id; documents shorter than ``min_len``
    tokens always pass through). Adds ``fim_applied`` and rewrites
    ``tok_col``/its size.

    Split points: with n = len(tokens), p1 = floor(f1 * (n+1)) and
    p2 = p1 + floor(f2 * (n-p1+1)) where f1, f2 are md5 hash fractions of
    the id — so 0 <= p1 <= p2 <= n, and prefix = tokens[:p1],
    middle = tokens[p1:p2], suffix = tokens[p2:]. Empty sections are
    legal (the sentinels still mark them, as in the paper's tokenizer).

    The three sentinel ids are the caller's vocabulary business (reserve
    them outside the token id space, e.g. negative or >= vocab_size).
    """
    t = F.col(tok_col)
    n = F.size(tok_col)
    key = F.col(id_col).cast("string")
    sel = (hash_frac(key, f"{seed}|apply") < float(rate)) & (
        n >= int(min_len)
    )
    f1 = hash_frac(key, f"{seed}|p1")
    f2 = hash_frac(key, f"{seed}|p2")
    p1 = F.floor(f1 * (n + F.lit(1))).cast("int")
    p2 = (p1 + F.floor(f2 * (n - p1 + F.lit(1)))).cast("int")
    psm = F.concat(
        F.array(F.lit(int(pre_id))),
        F.slice(t, 1, p1),
        F.array(F.lit(int(suf_id))),
        F.slice(t, p2 + 1, n - p2),
        F.array(F.lit(int(mid_id))),
        F.slice(t, p1 + 1, p2 - p1),
    ).cast("array<int>")
    return df.withColumn("fim_applied", sel).withColumn(
        tok_col, F.when(sel, psm).otherwise(t)
    )


def mask_tokens(
    df: DataFrame,
    mask_id: int,
    rate: float = 0.15,
    seed: str = "mlm",
    id_col: str = "doc_id",
    tok_col: str = "tokens",
    fast: bool = False,
) -> DataFrame:
    """Deterministic MLM-style corruption: position i of a document is
    replaced with ``mask_id`` iff md5-frac(doc_id:i|seed) < ``rate`` —
    the masked-language-model counterpart of fim_transform's causal
    infilling. -> input columns with ``tok_col`` rewritten + ``n_masked``.

    Per-POSITION hash (not per-document): masking density concentrates
    like independent coin flips, reruns and engines agree exactly, and a
    different ``seed`` gives a fresh mask epoch over the same corpus.

    Scale shape: scan-time projection, no shuffle. The mask-bool array is
    computed ONCE per row into its own projection and reused by both the
    rewrite and the count (CollapseProject keeps multiply-referenced
    non-cheap expressions un-inlined, so the per-position hash runs once).

    ``fast=True`` swaps the per-position md5 for xxhash64 — the repo's
    standard two-tier hashing (functions/hashing.py): md5 is the
    DuckDB-replayable oracle family (~11M positions/s measured — string
    build + md5 per position), xxhash64 is pure codegen over native
    values for the 100 TB hot path, pytest-verified instead of
    oracle-compared. Same determinism and per-seed epochs either way.
    """
    def frac(i):
        if fast:  # multi-key fast_frac: xxhash64 over native values
            return fast_frac(F.col(id_col), seed, i)
        # hash_frac(doc_id:i, seed) = md5(doc_id:i|seed)-fraction
        key = F.concat(
            F.col(id_col).cast("string"), F.lit(":"), i.cast("string")
        )
        return hash_frac(key, seed)

    mb = F.transform(F.col(tok_col), lambda x, i: frac(i) < float(rate))
    step = df.withColumn("_mb", mb)
    masked = F.zip_with(
        F.col(tok_col),
        F.col("_mb"),
        lambda x, m: F.when(m, F.lit(int(mask_id))).otherwise(x),
    ).cast("array<int>")
    return (
        step.withColumn(tok_col, masked)
        .withColumn(
            "n_masked",
            F.size(F.filter(F.col("_mb"), lambda b: b)).cast("int"),
        )
        .drop("_mb")
    )

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

    Scale shape — the corpus itself NEVER shuffles. Global frequencies
    come from the vocabulary-sized two-phase count above (the shuffle
    carries distinct types, not the corpus); the rare-type set is
    collected and broadcast — it is bounded by the VOCABULARY, not the
    corpus (int64 ids: even 10M rare types is ~80 MB, and per Zipf the
    rare tail is far smaller than the token stream). The remap itself is
    then one shuffle-free Arrow-batched mapInPandas stage: sorted
    ``np.isin`` against the broadcast set, arrays rewritten in place.
    An earlier posexplode + join + groupBy(doc_id) reassembly formulation
    moved one row PER TOKEN through two corpus-sized exchanges — the
    exact fail mode packing.py names — and was replaced by this kernel
    (same oracle, plan asserted Exchange-free in tests/test_plans.py).

    Docs with empty token arrays pass through with n_unk = 0.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    rare_pdf = (
        vocab_histogram(df, tok_col=tok_col)
        .filter(F.col("freq") < min_freq)
        .select("token")
        .toPandas()
    )
    rare = np.sort(rare_pdf["token"].to_numpy(np.int64))
    rare_b = df.sparkSession.sparkContext.broadcast(rare)
    unk = int(unk_id)

    def fn(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        # batch-vectorized (the bigram scorer's flat-stream shape): ONE
        # concatenate + sorted membership probe per Arrow batch, n_unk by
        # segment reduceat — no per-document Python loop in the hot path
        rset = rare_b.value
        for pdf in batches:
            n = len(pdf)
            if not n:  # empty batch would yield untyped columns
                continue
            arrs = [np.asarray(t, np.int64) for t in pdf[tok_col]]
            lens = np.fromiter((a.size for a in arrs), np.int64, n)
            total = int(lens.sum())
            if total and rset.size:
                flat = np.concatenate([a for a in arrs if a.size])
                idx = np.searchsorted(rset, flat)
                idx[idx == rset.size] = 0
                mask = rset[idx] == flat
                out_flat = np.where(mask, unk, flat).astype(np.int32)
            else:
                mask = np.zeros(total, bool)
                out_flat = (
                    np.concatenate(arrs) if total else np.empty(0, np.int64)
                ).astype(np.int32)
            cum = np.cumsum(lens)
            starts = np.concatenate(([0], cum[:-1]))
            # zero sentinel keeps every reduceat start in bounds; empty
            # docs (start == next start) read garbage there and are forced
            n_unk = np.add.reduceat(np.append(mask.astype(np.int64), 0), starts)
            n_unk[lens == 0] = 0
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    tok_col: np.split(out_flat, cum[:-1]),
                    "n_unk": n_unk.astype(np.int32),
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(F.col(id_col), F.col(tok_col)).mapInPandas(
        fn, f"{id_col} {id_type}, {tok_col} array<int>, n_unk int"
    )


def build_vocab(
    df: DataFrame,
    vocab_size: int,
    tok_col: str = "tokens",
) -> DataFrame:
    """Learned-vocabulary build: the ``vocab_size`` most frequent tokens,
    assigned DENSE ranked ids 0..vocab_size-1 by (freq DESC, token ASC) —
    the deterministic tie-break makes the table identical across engines,
    partitionings, and reruns. -> (token, freq, rank_id).

    This is the counted-vocabulary counterpart to text.hash_tokenize's
    hashing trick: hash ids need no artifact but collide; ranked ids give
    the dense [0, V) space a trained embedding table wants. Feed the
    result to ``encode_with_vocab`` to remap a corpus onto it.

    Scale shape: the heavy lifting is vocab_histogram's two-phase count
    (shuffle carries distinct types, not the corpus). The rank window runs
    over the VOCABULARY — top-k truncated, driver-bounded by construction
    — with a single-partition window being acceptable exactly because its
    input is capped at vocab_size rows (a window over the corpus would
    not be).
    """
    from pyspark.sql import Window

    hist = vocab_histogram(df, tok_col=tok_col)
    top = hist.orderBy(F.desc("freq"), F.asc("token")).limit(int(vocab_size))
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    return top.withColumn(
        "rank_id", (F.row_number().over(w) - 1).cast("int")
    )


def encode_with_vocab(
    df: DataFrame,
    vocab: DataFrame,
    unk_id: int = -1,
    tok_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remap token arrays onto a built vocabulary's dense rank ids
    (tokens absent from the vocab -> ``unk_id``).
    -> (id, tokens remapped, n_unk).

    Scale shape: identical to remap_rare_tokens — the vocab table
    (token -> rank_id) is vocabulary-bounded, collected once, broadcast as
    two sorted numpy arrays, and the remap is one shuffle-free
    Arrow-batched mapInPandas with a clamped searchsorted probe. The
    corpus never shuffles. Same determinism precondition as doc_rarity:
    the vocab is collected eagerly, the remap runs in a later job.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    vpdf = vocab.select("token", "rank_id").toPandas()
    toks = vpdf["token"].to_numpy(np.int64)
    order = np.argsort(toks)
    vtok = toks[order]
    vid = vpdf["rank_id"].to_numpy(np.int32)[order]
    b = df.sparkSession.sparkContext.broadcast((vtok, vid))
    unk = int(unk_id)

    def fn(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        # batch-vectorized flat-stream probe (see remap_rare_tokens): one
        # searchsorted per Arrow batch, per-doc n_unk via segment reduceat
        vt, vi = b.value
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            arrs = [np.asarray(t, np.int64) for t in pdf[tok_col]]
            lens = np.fromiter((a.size for a in arrs), np.int64, n)
            total = int(lens.sum())
            if total and vt.size:
                flat = np.concatenate([a for a in arrs if a.size])
                idx = np.searchsorted(vt, flat)
                idx[idx == vt.size] = 0
                hit = vt[idx] == flat
                out_flat = np.where(hit, vi[idx], unk).astype(np.int32)
            else:
                hit = np.zeros(total, bool)
                out_flat = np.full(total, unk, np.int32)
            cum = np.cumsum(lens)
            starts = np.concatenate(([0], cum[:-1]))
            n_unk = np.add.reduceat(
                np.append((~hit).astype(np.int64), 0), starts
            )
            n_unk[lens == 0] = 0
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    tok_col: np.split(out_flat, cum[:-1]),
                    "n_unk": n_unk.astype(np.int32),
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(F.col(id_col), F.col(tok_col)).mapInPandas(
        fn, f"{id_col} {id_type}, {tok_col} array<int>, n_unk int"
    )


def mixture_upsample(
    docs: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mixture",
) -> DataFrame:
    """Deterministic domain mixing with weights ABOVE 1: emit
    floor(w) copies of every doc plus one more iff
    md5-fraction(doc_id | seed) < frac(w) — the standard "epochs per
    source" upsampling a pre-training mixture needs (a 2.5-weighted
    source contributes each doc 2 times plus a consistent extra half).
    Weights < 1 degrade to exactly mixture_sample's keep rule; unlisted
    sources drop. -> input columns + ``copy`` (0-based copy index).

    Scale shape: scan-time explode of a sequence literal — no shuffle,
    no Python; the md5 fraction is the same consistent-sampling family as
    every other gate, so raising a weight only ADDS copies and reruns are
    identical. The copy index keeps downstream shuffles (packing, shard
    assignment) deterministic — two copies of a doc are distinct rows
    with distinct (id, copy) identity.
    """
    pairs: list[Column] = []
    for s, w in weights.items():
        pairs += [F.lit(s), F.lit(float(w))]
    w = F.coalesce(F.create_map(*pairs)[F.col(source_col)], F.lit(0.0))
    frac_keep = hash_frac(F.col(id_col).cast("string"), seed) < (
        w - F.floor(w)
    )
    n_copies = (F.floor(w) + frac_keep.cast("long")).cast("int")
    return docs.withColumn("_n_copies", n_copies).filter(
        F.col("_n_copies") > 0
    ).withColumn(
        "copy", F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1))
    ).drop("_n_copies")


def doc_rarity(
    df: DataFrame,
    rare_threshold: int = 2,
    tok_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token-rarity quality signals from CORPUS-WIDE unigram
    frequencies: -> (id, n_tok, mean_freq, rare_frac, min_freq).

    * ``mean_freq``  — average corpus frequency of the doc's tokens (low =>
      unusual vocabulary: often noise, OCR damage, or genuinely rare text);
    * ``rare_frac``  — fraction of tokens with corpus freq < threshold
      (the OOV-rate gate every vocab finalization checks);
    * ``min_freq``   — rarest token's frequency (0 for empty docs).

    All outputs are ratios of integers — no transcendentals — so they
    round identically in every engine and the operator hash-checks exactly
    (a log-perplexity variant would differ in last-ulp libm bits).

    Scale shape: same as remap_rare_tokens — the frequency table is
    vocabulary-bounded, collected once and broadcast as two sorted numpy
    arrays; the scoring pass is shuffle-free Arrow-batched mapInPandas.
    The corpus shuffles only inside the vocabulary-sized histogram count.

    Determinism precondition: the histogram is collected in one eager job
    and scoring runs in a LATER job over the same ``df`` — the input must
    be bit-stable across recomputations (a source table updated mid-run,
    or nondeterministic lineage, can surface tokens absent from the
    collected vocab). Such tokens are scored as frequency 0 (rare, and
    min_freq 0 flags the doc) rather than crashing the stage — the same
    clamped searchsorted probe remap_rare_tokens uses.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    freq_pdf = vocab_histogram(df, tok_col=tok_col).toPandas()
    toks = freq_pdf["token"].to_numpy(np.int64)
    order = np.argsort(toks)
    vocab = toks[order]
    freqs = freq_pdf["freq"].to_numpy(np.int64)[order]
    b = df.sparkSession.sparkContext.broadcast((vocab, freqs))
    thr = int(rare_threshold)

    def fn(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        # batch-vectorized flat-stream probe (see remap_rare_tokens): one
        # clamped searchsorted per Arrow batch — a token outside the
        # collected vocab (input changed between jobs) scores frequency 0
        # instead of indexing past the array. Per-doc sums/counts via
        # segment reduceat; per-doc min via minimum.reduceat with an
        # int64-max sentinel (a zero sentinel would clamp the LAST doc's
        # min; empty docs are forced to 0 afterwards either way).
        v, fr = b.value
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            arrs = [np.asarray(t, np.int64) for t in pdf[tok_col]]
            lens = np.fromiter((a.size for a in arrs), np.int64, n)
            total = int(lens.sum())
            if total and v.size:
                flat = np.concatenate([a for a in arrs if a.size])
                idx = np.searchsorted(v, flat)
                idx[idx == v.size] = 0
                f = np.where(v[idx] == flat, fr[idx], 0)
            else:
                f = np.zeros(total, np.int64)
            cum = np.cumsum(lens)
            starts = np.concatenate(([0], cum[:-1]))
            empty = lens == 0
            sums = np.add.reduceat(np.append(f, np.int64(0)), starts)
            sums[empty] = 0
            rare = np.add.reduceat(
                np.append((f < thr).astype(np.int64), 0), starts
            )
            rare[empty] = 0
            mins = np.minimum.reduceat(
                np.append(f, np.iinfo(np.int64).max), starts
            )
            mins[empty] = 0
            # full precision here; callers round with F.round (HALF_UP,
            # matches DuckDB) — Python round() is banker's and would
            # drift on exact .5 boundaries
            safe = np.maximum(lens, 1).astype(np.float64)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_tok": lens.astype(np.int32),
                    "mean_freq": sums.astype(np.float64) / safe,
                    "rare_frac": rare.astype(np.float64) / safe,
                    "min_freq": mins,
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(F.col(id_col), F.col(tok_col)).mapInPandas(
        fn,
        f"{id_col} {id_type}, n_tok int, mean_freq double, "
        "rare_frac double, min_freq long",
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


def _batch_bigram_pairs(arrs, lens):
    """numpy twin of ``_adjacent_bigrams`` over a whole Arrow batch of
    ragged token arrays: ONE flat packed-pair stream for the batch ->
    (pairs int64, cross bool mask, starts, nz). ``cross`` marks pairs
    that span two documents (masked out of every per-doc reduction);
    ``starts``/``nz`` drive ``_segment_sums``. Shared by the bigram
    scorer and the DSIR scorer so the pack formula and the boundary
    bookkeeping have ONE numpy implementation (the Spark-side twin has
    its own planted INT32_MIN test)."""
    import numpy as np

    nz = lens > 0
    flat = np.concatenate([a for a in arrs if a.size])
    pairs = flat[:-1] * np.int64(4294967296) + (
        flat[1:] & np.int64(4294967295)
    )
    cum = np.cumsum(lens[nz])
    cross = np.zeros(pairs.size, bool)
    cross[cum[:-1] - 1] = True
    starts = np.concatenate(([0], cum[:-1]))
    return pairs, cross, starts, nz


def _segment_sums(per_pair, cross, starts, nbi, nz):
    """Per-document sums of a per-pair value stream: zero out the
    boundary-crossing pairs, append a zero sentinel so every reduceat
    start stays in bounds, and force empty segments to 0 afterwards
    (reduceat returns a[i], not 0, for an empty segment — the
    single-token-doc quirk). -> int64 array sized like ``nbi``."""
    import numpy as np

    vals = np.append(np.where(cross, np.int64(0), per_pair), 0)
    out = np.zeros(nbi.size, np.int64)
    out[nz] = np.add.reduceat(vals, starts)
    out[nbi == 0] = 0
    return out


def _adjacent_bigrams(tok_col: str):
    """Packed adjacent-bigram array expression, shared by
    :func:`build_bigram_model` and :func:`score_bigram_novelty` so the
    packing formula is single-sourced (a formula divergence between
    build and score would silently zero every hit).

    Retained as the array-expression form of the pack formula (the
    explode call sites now ride ``_exploded_bigrams``' codegen
    zip-explode-pack — HOF lambdas run interpreted per element).

    Packing: t1 * 2^32 + (t2 & 0xFFFFFFFF) — signed high word, UNSIGNED
    low word. The unshifted t1*2^32 + t2 overflows at t1 = INT32_MIN
    with t2 < 0 (ANSI Spark raises where numpy wraps: engines diverge),
    and a "+ 2^31" low-word shift is unsafe too — Catalyst REASSOCIATES
    the constant add into (t1*2^32 + t2) + 2^31, overflowing the same
    way. bitwiseAND gives Catalyst nothing to reassociate and bounds
    the packed value at exactly [-2^63, 2^63 - 1] for all int32 pairs.
    """
    t = F.col(tok_col)
    n = F.size(tok_col)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(t, 1, n - 1),
            F.slice(t, 2, n - 1),
            lambda a, b: a.cast("bigint") * F.lit(4294967296)
            + b.cast("bigint").bitwiseAND(F.lit(4294967295)),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def _exploded_bigrams(
    df: DataFrame, tok_col: str, extras=(), pair_name: str = "bigram"
) -> DataFrame:
    """One row per adjacent bigram, WHOLE-STAGE CODEGEN: zip the two
    shifted slices with ``arrays_zip`` (a plain expression), explode the
    struct stream, and apply the pack arithmetic POST-explode — the
    same ``t1 * 2^32 + (t2 & 0xFFFFFFFF)`` formula as
    ``_adjacent_bigrams`` (whose zip_with lambda runs INTERPRETED per
    element — measured 2x slower on the ngram/DSIR shapes at sf0.1),
    with the same bitwiseAND reassociation guard. ``extras`` is a
    sequence of (Column, alias) carried through the explode (e.g. the
    doc id, a target flag). Single-token/empty docs drop (no pairs), as
    explode of the empty array would."""
    m = F.size(tok_col) - 1
    z = F.arrays_zip(
        F.slice(F.col(tok_col), 1, m), F.slice(F.col(tok_col), 2, m)
    )
    names = [a for _, a in extras]
    ex = (
        df.where(F.size(tok_col) >= 2)
        .select(*[c.alias(a) for c, a in extras], F.explode(z).alias("_zz"))
    )
    pk = F.col("_zz")["0"].cast("bigint") * F.lit(4294967296) + F.col(
        "_zz"
    )["1"].cast("bigint").bitwiseAND(F.lit(4294967295))
    return ex.select(*[F.col(a) for a in names], pk.alias(pair_name))


def build_bigram_model(
    df: DataFrame,
    model_size: int = 1 << 20,
    tok_col: str = "tokens",
) -> DataFrame:
    """Capped adjacent-bigram language model over the corpus:
    -> (bigram bigint, freq bigint), the ``model_size`` most frequent
    adjacent token pairs, packed as t1 * 2^32 + (t2 & 0xFFFFFFFF) —
    signed high word, unsigned low word: injective AND overflow-free
    over the FULL int32 token range including negatives (packed spans
    exactly [-2^63, 2^63 - 1]; identical arithmetic in Spark SQL, numpy
    int64, and DuckDB BIGINT — see the in-body note on why a plain or
    shifted add is NOT safe), with pmi_collocations carrying the decode.
    Deterministic cap tie-break (freq DESC, bigram ASC) keeps the model
    identical across engines and reruns.

    This is the integer-count backbone of LM-style fluency/novelty
    filtering WITHOUT transcendentals: log-prob perplexity is not
    bit-reproducible across engines (ln diverges in the last ulp), so
    ``score_bigram_novelty`` reports exact ratio signals (unseen-bigram
    fraction, mean bigram frequency) computed from these counts — the
    quantities a perplexity filter actually thresholds on, oracle-exact.

    Scale shape: mirrors vocab_histogram — the explode is transient
    (partial aggregation combines map-side, so the shuffle carries one
    (bigram, partial-count) row per distinct pair per split, bounded by
    distinct-bigram cardinality, not corpus size); the cap's global
    sort-limit runs over the aggregated model candidates (TakeOrdered, no
    full sort at scale).
    """
    return (
        _exploded_bigrams(df, tok_col)
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("bigram"))
        .limit(int(model_size))
    )


def score_bigram_novelty(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
    kernel: str = "arrow",
) -> DataFrame:
    """Score each document against a built bigram model:
    -> (id, n_bigrams int, n_unseen int, hit_freq_sum bigint).

    ``n_unseen`` counts the document's adjacent bigrams absent from the
    (capped) model; ``hit_freq_sum`` sums the model frequency of the
    present ones. Downstream ratio signals (unseen_frac = n_unseen /
    n_bigrams, mean_freq = hit_freq_sum / n_bigrams) are exact integer
    divisions — compute them query-side so float handling stays at the
    comparison boundary. High unseen_frac ≈ high perplexity (novel or
    noisy text); near-zero ≈ boilerplate (see the transcendental-free
    rationale on build_bigram_model).

    Two value-identical kernels (equality-tested incl. edge docs and an
    empty model); the default is the MEASURED winner, not the assumed
    one. ``kernel="arrow"`` (default): shuffle-free mapInPandas — model
    collected once and broadcast as two sorted numpy arrays, one
    batch-vectorized searchsorted probe per Arrow batch; the corpus
    crosses the JVM<->Python socket but never shuffles.
    ``kernel="jvm"``: explode the packed bigram stream (the SAME
    ``_exploded_bigrams`` pack formula the build uses),
    broadcast-hash-join the cap-bounded model, aggregate per document —
    zero Python, but the explode materializes one row per adjacent pair
    through the join. A/B at sf0.1 (600k docs, min-of-5 full query):
    arrow 7.1s vs jvm 9.5s — the flagship parser's "socket crossing
    dominates" lesson does NOT transfer here because the JVM
    alternative pays an 8x row explosion the parser's slot-math never
    did; kept as the zero-Python variant and independent-formulation
    equality witness (the two kernels share only the packing
    expression, which has its own planted INT32_MIN test). Same
    determinism precondition either way: the model is materialized once
    (broadcast or collect), scoring runs in a later job over the same
    input.
    """
    if kernel == "jvm":
        ex = _exploded_bigrams(
            df, tok_col, extras=((F.col(id_col), id_col),)
        )
        agg = (
            ex.join(F.broadcast(model.select("bigram", "freq")), "bigram", "left")
            .groupBy(id_col)
            .agg(
                F.sum(
                    F.when(F.col("freq").isNull(), 1).otherwise(0)
                ).cast("int").alias("_nu"),
                F.sum(F.coalesce(F.col("freq"), F.lit(0))).alias("_hs"),
            )
        )
        base = df.select(
            F.col(id_col),
            F.greatest(F.size(tok_col) - 1, F.lit(0)).cast("int").alias(
                "n_bigrams"
            ),
        )
        return base.join(agg, id_col, "left").select(
            id_col,
            "n_bigrams",
            F.coalesce(F.col("_nu"), F.lit(0)).cast("int").alias("n_unseen"),
            F.coalesce(F.col("_hs"), F.lit(0)).cast("long").alias(
                "hit_freq_sum"
            ),
        )
    if kernel != "arrow":
        raise ValueError(f"unknown kernel: {kernel!r} (want 'jvm' or 'arrow')")

    from typing import Iterator

    import numpy as np
    import pandas as pd

    mpdf = model.select("bigram", "freq").toPandas()
    bg = mpdf["bigram"].to_numpy(np.int64)
    order = np.argsort(bg)
    mb = bg[order]
    mf = mpdf["freq"].to_numpy(np.int64)[order]
    b = df.sparkSession.sparkContext.broadcast((mb, mf))

    def fn(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        # batch-vectorized: ONE concatenate + searchsorted + reduceat per
        # Arrow batch instead of a per-document Python loop (the loop was
        # ~4us/doc of pure interpreter overhead — the whole secondary's
        # cost at 600k docs). Flat-stream segmentation shared with the
        # DSIR scorer via _batch_bigram_pairs/_segment_sums.
        vb, vf = b.value
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            arrs = [np.asarray(t, np.int64) for t in pdf[tok_col]]
            lens = np.fromiter((a.size for a in arrs), np.int64, n)
            nbi = np.maximum(lens - 1, 0)
            nu = np.zeros(n, np.int64)
            hs = np.zeros(n, np.int64)
            total = int(lens.sum())
            if total >= 2 and vb.size:
                pairs, cross, starts, nz = _batch_bigram_pairs(arrs, lens)
                idx = np.searchsorted(vb, pairs)
                idx[idx == vb.size] = 0
                hit = vb[idx] == pairs
                nu = _segment_sums(
                    (~hit).astype(np.int64), cross, starts, nbi, nz
                )
                hs = _segment_sums(
                    np.where(~hit, np.int64(0), vf[idx]),
                    cross,
                    starts,
                    nbi,
                    nz,
                )
            elif not vb.size:
                nu = nbi.copy()  # empty model: every bigram is unseen
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bigrams": nbi.astype(np.int32),
                    "n_unseen": nu.astype(np.int32),
                    "hit_freq_sum": hs,
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(F.col(id_col), F.col(tok_col)).mapInPandas(
        fn,
        f"{id_col} {id_type}, n_bigrams int, n_unseen int, hit_freq_sum long",
    )


def ngram_counts(
    df: DataFrame,
    n: int = 3,
    top: int = 1 << 20,
    tok_col: str = "tokens",
) -> DataFrame:
    """Capped corpus n-gram counts: -> (gram string, freq bigint), the
    ``top`` most frequent length-``n`` token windows, ranked
    (freq DESC, gram ASC). The general-``n`` sibling of
    :func:`build_bigram_model` — the count table external LM tooling
    (KenLM-style) trains from, and the raw material for n-gram overlap
    audits beyond the fixed bigram/8-gram tiers.

    The gram key is the comma-joined token ids: for n > 2 a gram no
    longer fits the bigram family's int64 word packing, and binary
    string ordering is identical in Spark and DuckDB so the cap
    tie-break stays engine-exact (same argument as the md5-hex ranking
    family, functions/hashing.py).

    Scale shape: mirrors vocab_histogram/build_bigram_model, and the
    whole pre-aggregation pipeline is WHOLE-STAGE CODEGEN: the n
    shifted slices zip through ``arrays_zip`` (a plain expression, not
    a HOF), the struct stream explodes, and the comma-join happens
    POST-explode with ``concat_ws`` over struct fields — no
    higher-order-function lambda ever runs interpreted per element (an
    earlier n-1x ``zip_with``-concat formulation was measured 2x
    slower at sf0.1 purely on HOF interpretation). The explode is
    transient: partial aggregation combines map-side, so the shuffle
    carries one (gram, partial count) row per distinct gram per split
    — bounded by distinct-gram cardinality, not corpus size — and the
    cap is a TakeOrdered over aggregated candidates, never a full
    sort.
    """
    if n < 1:
        raise ValueError("ngram_counts: n must be >= 1")
    base = df.select(
        F.col(tok_col).alias("_t"), F.size(tok_col).alias("_n")
    ).where(F.col("_n") >= n)  # short docs have no length-n window
    m = F.col("_n") - (n - 1)
    z = F.arrays_zip(*[F.slice(F.col("_t"), j + 1, m) for j in range(n)])
    # aggregate on the INT STRUCT key (r7): building the comma-joined
    # string per exploded window stringified the pre-aggregation stream
    # (one string alloc per corpus window); grouping on the struct of n
    # ints defers the string build to the aggregated rows — bounded by
    # distinct-gram cardinality, ~10x fewer at sf0.1. The cap still
    # tie-breaks on the STRING (binary order is the engine-exact
    # contract), derived post-agg, so results are unchanged.
    gram = F.concat_ws(
        ",", *[F.col("_g")[str(j)].cast("string") for j in range(n)]
    )
    return (
        base.select(F.explode(z).alias("_g"))
        .groupBy("_g")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(gram.alias("gram"), "freq")
        .orderBy(F.desc("freq"), F.asc("gram"))
        .limit(int(top))
    )


def chunk_documents(
    df: DataFrame,
    max_len: int = 512,
    stride: int = 448,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
) -> DataFrame:
    """Sliding-window context chunking: each document becomes overlapping
    chunks, chunk k covering tokens [k*stride, k*stride + max_len), for
    k = 0 .. ceil(max(n - max_len, 0) / stride) — the standard long-doc
    treatment when examples must not straddle documents (the alternative
    to pack_sequences' concatenate-and-cut). stride < max_len gives
    max_len - stride tokens of overlap; the final chunk may be short;
    empty documents emit nothing. -> (id, chunk_id int, tokens, n_tok).

    Scale shape: scan-time sequence/explode/slice, the same zero-shuffle
    piece-cutting pattern as pack_sequences — output is ~n/stride rows
    per doc, all whole-stage codegen.
    """
    if stride < 1 or max_len < 1:
        raise ValueError("stride and max_len must be >= 1")
    t, n = F.col(tok_col), F.size(tok_col)
    last = F.floor(
        (F.greatest(n - max_len, F.lit(0)) + F.lit(stride - 1)) / stride
    )
    ks = F.when(n > 0, F.sequence(F.lit(0).cast("long"), last)).otherwise(
        F.array().cast("array<bigint>")
    )
    ex = df.select(
        F.col(id_col), t.alias("_t"), F.explode(ks).alias("_k")
    )
    chunk = F.slice(
        F.col("_t"), (F.col("_k") * stride + 1).cast("int"), max_len
    )
    return ex.select(
        F.col(id_col),
        F.col("_k").cast("int").alias("chunk_id"),
        chunk.alias(tok_col),
        F.size(chunk).cast("int").alias("n_tok"),
    )


def stratified_sample(
    df: DataFrame,
    quota: int,
    by: str = "source",
    id_col: str = "doc_id",
    seed: str = "strat",
    salt_buckets: int = 64,
) -> DataFrame:
    """Exactly min(``quota``, group size) rows per ``by`` group: the
    ``quota`` smallest md5(id||seed) survive — deterministic uniform
    selection, identical across engines/partitionings (md5-hex ranking).
    The per-group counterpart of mixture_sample's per-group RATES, for
    eval-set carving and per-domain caps where the quota is absolute.

    Scale shape: two-level selection, same scheme as the rate-limit
    policy (policies.apply_rate_limit D8): rank within (group, salt)
    first — a row ranked > quota inside any salt bucket is provably
    outside the group's global top-quota — then exact-rank the
    <= quota * salt_buckets survivors. No single task ever holds a whole
    hot group: the salted exchange spreads it, and the second exchange
    (on the bare group key, as the captured plan in PLANS.md shows)
    moves only the quota-bounded survivors.
    """
    from pyspark.sql import Window

    ordv = F.md5(
        F.concat_ws("|", F.col(id_col).cast("string"), F.lit(seed))
    )
    w1 = Window.partitionBy(by, "_salt").orderBy(ordv, F.col(id_col))
    lvl1 = df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(salt_buckets)),
    ).withColumn("_r1", F.row_number().over(w1))
    w2 = Window.partitionBy(by).orderBy(ordv, F.col(id_col))
    return (
        lvl1.filter(F.col("_r1") <= quota)
        .withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= quota)
        .drop("_salt", "_r1", "_r2")
    )


def pmi_collocations(
    df: DataFrame,
    top_k: int = 10,
    min_count: int = 5,
    model_size: int = 1 << 20,
    tok_col: str = "tokens",
) -> DataFrame:
    """Top-``top_k`` right-hand collocates per token, ranked by the exact
    PMI-proportional ratio score = c(a,b) * N / (c(a) * c(b)) with N the
    corpus bigram total (pointwise mutual information, Church & Hanks
    1990) — log is monotonic, so ranking by the ratio IS ranking by PMI,
    computed without transcendentals (engine-exact; see
    build_bigram_model). Pairs rarer than ``min_count`` are dropped first
    (PMI's classic low-count blowup). ->
    (token, neighbor, pair_freq, freq_a, freq_b, score, rank).

    Scale shape: pair counts come from the capped bigram model and the
    unigram table from vocab_histogram — both vocabulary-bounded, so the
    two equi-joins and the per-token top-k window all run on model-sized
    inputs (the window's partition is a token's collocate list, capped by
    the model, never the corpus). Products stay < 2^63 for any corpus
    below ~3e9 bigrams per pair count; score division is one double op.
    """
    from pyspark.sql import Window

    bm = build_bigram_model(df, model_size=model_size, tok_col=tok_col)
    uni = vocab_histogram(df, tok_col=tok_col).select(
        F.col("token").alias("_t"), F.col("freq").alias("_uf")
    )
    n_total = df.select(
        F.sum(F.greatest(F.size(tok_col) - 1, F.lit(0))).alias("n")
    ).collect()[0]["n"] or 0
    # decode of the t1*2^32 + (t2 & 0xFFFFFFFF) packing (see
    # build_bigram_model for why that form): pmod yields the unsigned low
    # word in [0, 2^32) in both engines — >= 2^31 means t2 was negative —
    # and the high word divides out exactly, no borrow. The planted
    # negative-id unit test pins this: a symmetric decode bug matches the
    # DuckDB oracle symmetrically.
    r = F.pmod(F.col("bigram"), F.lit(4294967296))
    neighbor = F.when(r < F.lit(2147483648), r).otherwise(
        r - F.lit(4294967296)
    )
    token = ((F.col("bigram") - r) / F.lit(4294967296)).cast("long")
    pairs = (
        bm.filter(F.col("freq") >= int(min_count))
        .select(
            token.alias("token"),
            neighbor.cast("long").alias("neighbor"),
            F.col("freq").alias("pair_freq"),
        )
    )
    scored = (
        pairs.join(uni.withColumnRenamed("_uf", "freq_a"), pairs["token"] == uni["_t"])
        .drop("_t")
        .join(
            uni.select(F.col("_t"), F.col("_uf").alias("freq_b")),
            F.col("neighbor") == F.col("_t"),
        )
        .drop("_t")
        .withColumn(
            "score",
            (F.col("pair_freq") * F.lit(int(n_total))).cast("double")
            / (F.col("freq_a") * F.col("freq_b")).cast("double"),
        )
    )
    w = Window.partitionBy("token").orderBy(
        F.desc("score"), F.asc("neighbor")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(top_k))
        .select(
            "token", "neighbor", "pair_freq", "freq_a", "freq_b",
            "score", "rank",
        )
    )


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source corpus health rollup — the one-page answer to "what is
    in this crawl": -> (source, n_docs, n_dup_docs, total_words,
    mean_words, p50_words, max_words). ``n_dup_docs`` counts documents
    whose exact content digest already appeared within the source.

    Scale shape: one aggregation keyed on the low-cardinality source —
    safe even for a hot source because aggregation (unlike a window)
    combines map-side; the distinct-digest count is Spark's standard
    two-phase expansion shuffling one row per distinct (source, digest).
    The exact p50 uses percentile(), bit-identical to DuckDB's
    quantile_cont on integer inputs after round(.,4) — at larger
    cardinalities swap in percentile_approx exactly as the
    service-latency pair documents.
    """
    from otel_tail_sampler_spark.operators.text import token_count_ws

    per = docs.select(
        F.col(source_col).alias("source"),
        F.md5(F.col(text_col)).alias("_d"),
        token_count_ws(F.col(text_col)).cast("int").alias("_w"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.count(F.lit(1)) - F.countDistinct("_d")).alias("n_dup_docs"),
            F.sum("_w").alias("total_words"),
            F.round(F.avg("_w"), 6).alias("mean_words"),
            F.round(F.percentile("_w", F.lit(0.5)), 4).alias("p50_words"),
            F.max("_w").alias("max_words"),
        )
        .orderBy("source")
    )


def temperature_weights(
    counts: dict[str, int], alpha: float = 0.3
) -> dict[str, float]:
    """Alpha/temperature source balancing (the standard multilingual
    mixing recipe, cf. XLM-R, Conneau et al. 2020): target mixture
    probability q_s ∝ (c_s / total)^alpha — alpha 1.0 keeps natural
    proportions, alpha -> 0 flattens toward uniform, upweighting small
    sources. Returns the q_s dict (sums to 1), which plugs straight into
    :func:`rates_for_budget`'s ``weights`` so the water-filling solver
    turns the target mixture + a token budget into per-source keep rates
    for mixture_sample. Pure driver arithmetic; deterministic (9-dp
    rounding like the solver).
    """
    if alpha < 0:
        raise ValueError("temperature_weights: alpha must be >= 0")
    total = sum(int(c) for c in counts.values())
    if total <= 0:
        raise ValueError("temperature_weights: empty corpus counts")
    raw = {s: (int(c) / total) ** float(alpha) for s, c in counts.items()}
    z = sum(raw.values())
    return {s: round(v / z, 9) for s, v in raw.items()}


def rates_for_budget(
    report: DataFrame,
    budget_tokens: int,
    weights: dict[str, float] | None = None,
    source_col: str = "source",
    tokens_col: str = "total_words",
) -> dict[str, float]:
    """Driver-side mixture solver: per-source keep RATES (for
    mixture_sample) whose expected kept tokens hit ``budget_tokens``,
    splitting the budget by relative ``weights`` (None = every source
    weight 1) with deterministic WATER-FILLING — when a small source
    saturates at rate 1.0, its unused share re-flows to the unsaturated
    sources, iterating until stable. The natural input is
    corpus_report's (source, total_words) output.

    Pure driver arithmetic over the per-source totals (one tiny dict in,
    one tiny dict out — never a Spark job), so the expensive part stays
    the single corpus_report aggregation. If the budget exceeds the
    weighted corpus, saturated sources cap at 1.0 and the result
    undershoots — by exactly the mass that does not exist.
    """
    totals = {
        r[source_col]: int(r[tokens_col])
        for r in report.select(source_col, tokens_col).collect()
    }
    if weights is None:
        weights = {s: 1.0 for s in totals}
    active = {s for s in totals if weights.get(s, 0.0) > 0 and totals[s] > 0}
    rates = {s: 0.0 for s in totals}
    remaining = float(budget_tokens)
    # each pass either saturates >=1 source or allocates everything
    for _ in range(len(totals) + 1):
        if remaining <= 0 or not active:
            break
        wsum = sum(weights[s] for s in active)
        saturated = []
        for s in sorted(active):
            share = remaining * weights[s] / wsum
            if share >= totals[s] * (1.0 - rates[s]):
                saturated.append(s)
        if not saturated:
            for s in active:
                rates[s] += (remaining * weights[s] / wsum) / totals[s]
            remaining = 0.0
            break
        for s in saturated:
            remaining -= totals[s] * (1.0 - rates[s])
            rates[s] = 1.0
            active.remove(s)
    return {s: min(1.0, round(r, 9)) for s, r in rates.items()}



def vocab_coverage(
    df: DataFrame,
    cutoffs: tuple = (256, 512, 1024, 2048, 4096, 8192, 16384, 32768),
    tok_col: str = "tokens",
) -> DataFrame:
    """Vocabulary coverage curve: for each candidate vocabulary size in
    ``cutoffs``, the exact fraction of all corpus token OCCURRENCES
    covered by the that-many most frequent token types ->
    (cutoff int, n_types bigint, covered bigint, total bigint,
    coverage double). The curve is the vocab-sizing tool: pick the knee
    where coverage stops improving; ``remap_rare_tokens`` /
    ``build_vocab`` then implement the chosen cut.

    Ranking ties break (freq DESC, token ASC) so the curve is
    deterministic and engine-exact; ``coverage`` is an exact integer
    ratio rounded query-side (round-before-compare contract).

    Scale shape: the type-frequency table is VOCABULARY-bounded (one row
    per distinct token id — ~1e5..1e6 for real tokenizers), never
    corpus-bounded: the explode feeds a map-side-combinable count, the
    sort-limit to max(cutoffs) is a TakeOrdered (no full sort), and the
    single-partition rank window that follows runs over <= max(cutoffs)
    rows by construction — bounded driver-side work, exactly like the
    model caps in ``build_bigram_model``. The curve and the totals are
    TWO map-only corpus passes (Spark cannot reuse the un-persisted
    frequency exchange across the limit and the global agg — the same
    documented trade as bm25_topk's one-shot); a caller batching many
    curves should persist ``freqs``' slim (token, freq) projection.
    """
    cuts = sorted({int(c) for c in cutoffs})  # dedup: repeated cutoffs
    # would alias two identical _c{c} agg columns -> AMBIGUOUS_REFERENCE
    if not cuts or cuts[0] <= 0:
        raise ValueError("cutoffs must be positive")
    from pyspark.sql import Window

    freqs = (
        df.select(F.explode(tok_col).alias("_t"))
        .groupBy("_t")
        .agg(F.count(F.lit(1)).alias("_f"))
    )
    totals = freqs.agg(
        F.count(F.lit(1)).alias("_v"), F.sum("_f").alias("_n")
    )
    top = freqs.orderBy(F.desc("_f"), F.asc("_t")).limit(cuts[-1])
    w = Window.orderBy(F.desc("_f"), F.asc("_t"))
    ranked = top.withColumn("_r", F.row_number().over(w))
    sums = ranked.agg(
        *[
            F.sum(F.when(F.col("_r") <= c, F.col("_f")))
            .cast("long")
            .alias(f"_c{c}")
            for c in cuts
        ]
    )
    stack_args = ", ".join(f"{c}, _c{c}" for c in cuts)
    curve = sums.selectExpr(
        f"stack({len(cuts)}, {stack_args}) AS (cutoff, covered)"
    )
    return (
        curve.crossJoin(F.broadcast(totals))
        .select(
            F.col("cutoff").cast("int"),
            F.col("_v").cast("long").alias("n_types"),
            F.coalesce("covered", F.lit(0)).cast("long").alias("covered"),
            F.col("_n").cast("long").alias("total"),
            F.round(
                F.coalesce("covered", F.lit(0)).cast("double")
                / F.col("_n"),
                6,
            ).alias("coverage"),
        )
        # empty corpus: the frequency table has no rows, so _n aggregates
        # to NULL — emit ZERO rows (matching a SQL CROSS JOIN over the
        # empty freq table) instead of one all-NULL row per cutoff
        # (ADVICE r5: the degenerate case diverged cross-engine)
        .where(F.col("total").isNotNull())
        .orderBy("cutoff")
    )


def vocab_drift(
    a: DataFrame,
    b: DataFrame,
    top: int = 1000,
    scale_bits: int = 20,
    tok_col: str = "tokens",
) -> DataFrame:
    """Token-distribution drift between two corpus versions (crawl N vs
    crawl N+1 — the monitoring question behind every mixture re-tune):
    -> (token, freq_a, freq_b, rate_a_fp, rate_b_fp, drift_fp), the
    ``top`` tokens by |drift|, where ``rate_*_fp`` is the token's
    occurrence rate in fixed point (``freq * 2^scale_bits div total``)
    and ``drift_fp = rate_a_fp - rate_b_fp``. Exact integers end to end
    (the repo's no-transcendentals contract: a KL term needs a log; the
    per-token rate deltas are the quantities a drift alert actually
    thresholds on, and they are engine-exact). Tokens absent from one
    side count 0 there — a vocabulary APPEARANCE is drift too.

    Scale shape: both inputs reduce through vocab_histogram's two-phase
    map-combinable count (shuffle carries distinct types, not corpora);
    the full-outer join and everything after run on the vocabulary-
    bounded tables; the cut is a TakeOrdered by
    (|drift| DESC, token ASC). Totals ride DECIMAL(38,0), exact past
    int64 at trillion-token corpora."""
    s = 1 << scale_bits
    ha = vocab_histogram(a, tok_col=tok_col)
    hb = vocab_histogram(b, tok_col=tok_col)
    ta = ha.agg(F.sum("freq")).first()[0] or 0
    tb = hb.agg(F.sum("freq")).first()[0] or 0
    if ta == 0 or tb == 0:
        raise ValueError("vocab_drift: a corpus side has no tokens")
    j = (
        ha.withColumnRenamed("freq", "freq_a")
        .join(hb.withColumnRenamed("freq", "freq_b"), "token", "full_outer")
        .select(
            "token",
            F.coalesce("freq_a", F.lit(0)).cast("long").alias("freq_a"),
            F.coalesce("freq_b", F.lit(0)).cast("long").alias("freq_b"),
        )
    )
    rate_a = F.expr(
        f"CAST(freq_a AS DECIMAL(38,0)) * {s} div {ta}"
    ).cast("long")
    rate_b = F.expr(
        f"CAST(freq_b AS DECIMAL(38,0)) * {s} div {tb}"
    ).cast("long")
    out = j.select(
        "token",
        "freq_a",
        "freq_b",
        rate_a.alias("rate_a_fp"),
        rate_b.alias("rate_b_fp"),
        (rate_a - rate_b).alias("drift_fp"),
    )
    return out.orderBy(
        F.abs(F.col("drift_fp")).desc(), F.asc("token")
    ).limit(int(top))

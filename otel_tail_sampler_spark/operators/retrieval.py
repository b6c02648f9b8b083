"""Sparse (term-based) retrieval over token arrays: fixed-point BM25.

``bm25_topk`` ranks corpus documents against a small set of query
documents with a BM25-family score computed entirely in integer
arithmetic, so the result — unlike float BM25, whose log-idf and sum
order drift across engines — is bit-reproducible and carries a full
value-hash DuckDB oracle. This is the exact-retrieval counterpart of
``similarity.quantized_topk`` (dense) for the sparse tier: the tool a
training pipeline needs for benchmark decontamination by retrieval and
duplicate-question mining.

Scoring (k1 = 6/5, b = 3/4 — the standard BM25 defaults as exact
rationals; S = 2^scale_bits fixed-point scale; N docs, T total tokens,
dl = |doc|, tf = term count in doc, df = docs containing term):

    idf_fp(t)    = (S * (2N - 2df + 1)) div (2df + 1)
    w(d, t)      = (idf_fp * 44*T * tf) div (20*T*tf + 6*T + 18*dl*N)
    score(q, d)  = sum over shared terms of w(d, t)

The two ``div`` floors replace BM25's real-valued idf log and tf
saturation with monotone rational equivalents: 44*T*tf / (20*T*tf + 6*T
+ 18*dl*N) IS tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) with avgdl = T/N
multiplied through by 20*T, and (2N-2df+1)/(2df+1) is the argument of
the classic idf log (a strictly decreasing function of df, so rare terms
still dominate; the log is omitted because no cross-engine-exact log
exists). Intermediates ride DECIMAL(38,0) — exact to N ~ 1e9 docs /
T ~ 1e12 tokens at the default scale; shrink scale_bits beyond that.

Two tiers (mirroring ivf_build/ivf_search):

* ``bm25_topk`` — one-shot, stateless. Query terms broadcast and
  semi-filter the exploded postings BEFORE any aggregation, so nothing
  corpus-sized shuffles; the price of statelessness is that the matched
  tf lineage is evaluated twice (once for scoring, once for df — Spark
  cannot reuse the exchange because column pruning specializes the two
  subtrees), i.e. TWO map-only corpus passes. Fine for a query batch;
  wrong shape for a standing index.
* ``bm25_index`` + ``bm25_search`` — the scale path: ONE corpus pass
  builds the inverted index (postings + per-term df + corpus stats),
  materialized once (pass ``out_dir``) and amortized across every query
  batch; search touches only broadcast-filtered index rows and proves
  equal to the one-shot (tests).

Reference parity: the reference engine has no retrieval tier; this is
part of the training-data extension (BM25: Robertson & Zaragoza 2009).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _corpus_stats(corpus: DataFrame, tokens_col: str) -> tuple[int, int]:
    stats = corpus.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(F.col(tokens_col))).alias("t"),
    ).first()
    n_docs, n_tokens = int(stats["n"]), int(stats["t"] or 0)
    if n_docs == 0 or n_tokens == 0:
        raise ValueError("bm25: empty corpus")
    return n_docs, n_tokens


def _postings(corpus: DataFrame, id_col: str, tokens_col: str) -> DataFrame:
    """(term, doc_id, tf, dl) — one row per distinct (doc, term)."""
    return (
        corpus.select(
            F.col(id_col).alias("doc_id"),
            F.size(F.col(tokens_col)).alias("dl"),
            F.explode(F.col(tokens_col)).alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _query_terms(queries: DataFrame, query_id: str, query_tokens: str) -> DataFrame:
    return queries.select(
        F.col(query_id).alias("query_id"),
        F.explode(F.col(query_tokens)).alias("term"),
    ).distinct()


def _with_idf(dfreq: DataFrame, n_docs: int, s: int) -> DataFrame:
    return dfreq.withColumn(
        "idf_fp",
        F.expr(
            f"CAST({s} AS DECIMAL(38,0)) * ({2 * n_docs} - 2*_df + 1)"
            f" div (CAST(2*_df AS DECIMAL(38,0)) + 1)"
        ),
    ).select("term", "idf_fp")


def _rank(
    matched_tf: DataFrame,
    dfreq_idf: DataFrame,
    qterms: DataFrame,
    n_docs: int,
    n_tokens: int,
    k: int,
) -> DataFrame:
    scored = (
        matched_tf.join(F.broadcast(dfreq_idf), "term")
        .join(F.broadcast(qterms), "term")
        .withColumn(
            "_w",
            F.expr(
                f"CAST(idf_fp AS DECIMAL(38,0)) * {44 * n_tokens} * tf"
                f" div (CAST({20 * n_tokens} AS DECIMAL(38,0)) * tf"
                f"      + {6 * n_tokens} + CAST({18 * n_docs} AS DECIMAL(38,0)) * dl)"
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_w").cast("bigint").alias("score_fp"))
    )
    # Hot-query safety: a query whose terms match millions of corpus docs
    # does NOT funnel its whole candidate set through one window task —
    # the row_number + rank<=k filter triggers Catalyst's
    # InferWindowGroupLimit, which plants a PARTIAL WindowGroupLimit below
    # the exchange (each map partition forwards only its local top-k per
    # query), so the single per-query task ranks <= k * input-partitions
    # rows. Guarded by tests/test_retrieval.py (plan assert + planted
    # hot-query equality); a manual salted two-level election was measured
    # against this and only adds a second exchange the optimizer's partial
    # limit makes redundant.
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_fp"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score_fp", "rank")
    )


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    scale_bits: int = 20,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    query_id: str = "query_id",
    query_tokens: str = "tokens",
) -> DataFrame:
    """One-shot top-k corpus docs per query doc by fixed-point BM25.

    -> (query_id, doc_id, score_fp bigint, rank int), rank by
    (score_fp DESC, doc_id ASC). Docs sharing no term with a query are
    absent (score 0 by definition). The query side must be small enough
    to broadcast — the standard sparse-retrieval regime. Two map-only
    corpus passes (see module docstring); use bm25_index/bm25_search for
    a standing index.
    """
    n_docs, n_tokens = _corpus_stats(corpus, tokens_col)
    s = 1 << scale_bits
    qterms = _query_terms(queries, query_id, query_tokens)
    terms_only = qterms.select("term").distinct()

    post = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.col(tokens_col)).alias("dl"),
        F.explode(F.col(tokens_col)).alias("term"),
    )
    # broadcast semi filter FIRST: everything downstream sees only terms
    # some query contains — the corpus-sized explode never shuffles
    matched = post.join(F.broadcast(terms_only), "term", "left_semi")
    tf = matched.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = _with_idf(
        tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df")), n_docs, s
    )
    return _rank(tf, dfreq, qterms, n_docs, n_tokens, k)


def bm25_index(
    corpus: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    out_dir: str | None = None,
    index_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame, tuple[int, int]]:
    """Build the inverted index: -> (postings, term_stats, (N, T)).

    postings = (term, doc_id, tf, dl); term_stats = (term, df). With
    ``out_dir`` the postings are written to parquet (hash-distributed and
    sorted by term so row-group min/max stats prune term probes) and read
    back, so term_stats and every later search reuse the materialization
    — ONE corpus pass total. Without it the returned frames are lazy and
    each action re-derives them (fine for tests, not for a standing
    index).
    """
    n_docs, n_tokens = _corpus_stats(corpus, tokens_col)
    post = _postings(corpus, id_col, tokens_col)
    if out_dir is not None:
        path = out_dir.rstrip("/") + "/postings"
        shaped = (
            post.repartition(index_partitions, "term")
            if index_partitions
            else post
        )
        shaped.sortWithinPartitions("term").write.mode("overwrite").parquet(
            path
        )
        post = corpus.sparkSession.read.parquet(path)
    term_stats = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return post, term_stats, (n_docs, n_tokens)


def bm25_search(
    postings: DataFrame,
    term_stats: DataFrame,
    stats: tuple[int, int],
    queries: DataFrame,
    k: int = 10,
    scale_bits: int = 20,
    query_id: str = "query_id",
    query_tokens: str = "tokens",
) -> DataFrame:
    """Rank against a prebuilt bm25_index — equal to bm25_topk on the
    same corpus (asserted in tests), but the corpus is never rescanned:
    both index sides are broadcast-semi-filtered to query terms before
    anything else touches them."""
    n_docs, n_tokens = int(stats[0]), int(stats[1])
    s = 1 << scale_bits
    qterms = _query_terms(queries, query_id, query_tokens)
    terms_only = qterms.select("term").distinct()
    matched = postings.join(F.broadcast(terms_only), "term", "left_semi")
    dfreq = _with_idf(
        term_stats.join(F.broadcast(terms_only), "term", "left_semi")
        .withColumnRenamed("df", "_df"),
        n_docs,
        s,
    )
    return _rank(matched, dfreq, qterms, n_docs, n_tokens, k)

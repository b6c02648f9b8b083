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

Scale shape: the ONLY corpus-wide work is the scan + explode + broadcast
hash probe (map-only — query terms are broadcast and filter postings
BEFORE any aggregation, so tf/df are computed over matched rows only,
never the full posting list). No corpus-sized shuffle anywhere; the
final top-k window partitions on query_id.

Reference parity: the reference engine has no retrieval tier; this is
part of the training-data extension (BM25: Robertson & Zaragoza 2009).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
    """Top-k corpus docs per query doc by fixed-point BM25.

    -> (query_id, doc_id, score_fp bigint, rank int), rank by
    (score_fp DESC, doc_id ASC). Docs sharing no term with a query are
    absent (score 0 by definition). The query side must be small enough
    to broadcast — the standard sparse-retrieval regime.
    """
    stats = corpus.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(F.col(tokens_col))).alias("t"),
    ).first()
    n_docs, n_tokens = int(stats["n"]), int(stats["t"] or 0)
    if n_docs == 0 or n_tokens == 0:
        raise ValueError("bm25_topk: empty corpus")
    s = 1 << scale_bits

    qterms = queries.select(
        F.col(query_id).alias("query_id"),
        F.explode(F.col(query_tokens)).alias("term"),
    ).distinct()
    terms_only = qterms.select("term").distinct()

    post = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.col(tokens_col)).alias("_dl"),
        F.explode(F.col(tokens_col)).alias("term"),
    )
    # broadcast semi filter FIRST: everything downstream sees only terms
    # some query contains — the corpus-sized explode never shuffles
    matched = post.join(F.broadcast(terms_only), "term", "left_semi")
    tf = matched.groupBy("doc_id", "_dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("_df"))
        .withColumn(
            "idf_fp",
            F.expr(
                f"CAST({s} AS DECIMAL(38,0)) * ({2 * n_docs} - 2*_df + 1)"
                f" div (CAST(2*_df AS DECIMAL(38,0)) + 1)"
            ),
        )
        .select("term", "idf_fp")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qterms), "term")
        .withColumn(
            "_w",
            F.expr(
                f"CAST(idf_fp AS DECIMAL(38,0)) * {44 * n_tokens} * tf"
                f" div (CAST({20 * n_tokens} AS DECIMAL(38,0)) * tf"
                f"      + {6 * n_tokens} + CAST({18 * n_docs} AS DECIMAL(38,0)) * _dl)"
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_w").cast("bigint").alias("score_fp"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_fp"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score_fp", "rank")
    )

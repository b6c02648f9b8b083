"""Embedding clustering + semantic dedup for training-data pipelines.

Two public operators:

* ``kmeans_fit`` / ``kmeans_assign`` (and the ``kmeans_quantized``
  convenience) — Lloyd's k-means over int8-quantized vectors
  (``quantize_embeddings`` output) in EXACT integer arithmetic: squared-L2
  distances are int64, centroid updates are truncated integer division.
  Every step is bit-reproducible across engines, so unlike float k-means
  (MLlib's included) the full assignment is DuckDB-oracle-checkable —
  the same property that made ``quantized_topk`` the first ANN query with
  a value-hash oracle.
* ``semantic_dedup`` — SemDeDup (Abbas et al. 2023, public): cluster the
  corpus, then inside each cluster drop every vector whose cosine
  similarity to a smaller-id cluster-mate reaches ``tau``. The cosine
  test is cross-multiplied to integers (``den^2*dot^2 >= num^2*|a|^2*|b|^2``
  with ``dot > 0``), so the keep/drop set is exact.

Scale shape: the k-means fit moves only (cluster, pos, partial-sum) rows
through one map-combinable groupBy per iteration — k*dim rows reach the
driver, never vectors. Assignment is a pure projection (centroids ship as
literals; no join, no shuffle). semantic_dedup's pairwise stage joins on
the cluster id only — the published SemDeDup recipe sizes k ~ N/target
cluster size precisely so per-cluster candidate sets stay bounded; pick k
accordingly (and see ``dedup.embedding_dup_pairs_lsh`` for the
no-training alternative when clusters can't be bounded).

Reference parity: the reference engine has no clustering tier (its dedup
is digest/manifest-based, src/dedup/manifest.rs); this module is part of
the training-data extension the graft adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from otel_tail_sampler_spark.operators.similarity import _int_dot


def _tdiv(s: int, n: int) -> int:
    """Truncate-toward-zero integer division — the shared semantics of
    Spark's ``div`` and DuckDB's ``//`` (both C-style; Python's ``//``
    floors and would diverge on negative sums)."""
    q = abs(s) // n
    return q if s >= 0 else -q


def _dist2(vec: Column, centroid: list[int]) -> Column:
    """Exact int64 squared L2 distance to a literal centroid. One
    self-contained aggregate per centroid — no shared outer subexpression
    for CollapseProject to re-inline k times."""
    carr = F.array(*[F.lit(int(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, carr, lambda x, y: ((x - y) * (x - y)).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _assign_cols(vec: Column, centroids: list[list[int]]) -> Column:
    """(dist2, cluster) struct of the nearest centroid; ties break to the
    smallest cluster index via struct ordering."""
    return F.array_min(
        F.array(
            *[
                F.struct(
                    _dist2(vec, c).alias("dist2"),
                    F.lit(int(j)).cast("int").alias("cluster"),
                )
                for j, c in enumerate(centroids)
            ]
        )
    )


def kmeans_fit(
    df_q: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    qvec_col: str = "qvec",
) -> list[list[int]]:
    """Fit k-means centroids over int8-quantized vectors.

    Deterministic init: the quantized vectors of the ``k`` smallest ids,
    in id order (cluster j = j-th smallest). Each Lloyd iteration assigns
    every vector to its nearest centroid (exact int64 squared L2, ties to
    the lowest cluster) and recomputes each centroid coordinate as the
    truncated integer mean of its members; a cluster that loses all
    members keeps its previous centroid. Returns the centroid list after
    ``iters`` updates.

    Determinism precondition (same as ``packing.pack_sequences``): the
    init collect and each iteration are independent Spark jobs over
    ``df_q``, so the input must be bit-stable across recomputations (a
    materialized table, not a nondeterministic lineage) — an input that
    changes between jobs silently shifts centroids mid-fit.

    Only (cluster, pos) partial sums cross the wire: the per-iteration
    shuffle carries k*dim groups (map-side combined), and the driver
    collects k*dim ints — independent of corpus size.
    """
    from otel_tail_sampler_spark.functions.spread import spread_small_input

    # the k*dim interpreted argmin per row is CPU-dense: widen a
    # single-split input so iterations run cores-wide (no-op at scale)
    df_q = spread_small_input(df_q)
    init_rows = (
        df_q.select(F.col(id_col).alias("_id"), F.col(qvec_col).alias("_q"))
        .orderBy("_id")
        .limit(k)
        .collect()
    )
    if not init_rows:
        raise ValueError("kmeans_fit: empty input")
    centroids = [[int(x) for x in r["_q"]] for r in init_rows]

    for _ in range(iters):
        assigned = df_q.select(
            _assign_cols(F.col(qvec_col), centroids)["cluster"].alias("cluster"),
            F.col(qvec_col).alias("_q"),
        )
        stats = (
            assigned.select("cluster", F.posexplode("_q").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        nxt = [list(c) for c in centroids]
        for r in stats:
            nxt[r["cluster"]][r["pos"]] = _tdiv(int(r["s"]), int(r["n"]))
        centroids = nxt
    return centroids


def kmeans_assign(
    df_q: DataFrame,
    centroids: list[list[int]],
    id_col: str = "vec_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """-> (vec_id, cluster int, dist2 bigint) under the given centroids.

    Pure projection — centroids are literals, so the plan has no join and
    no exchange; assignment cost is O(k*dim) integer ops per row inside
    the scan stage.
    """
    from otel_tail_sampler_spark.functions.spread import spread_small_input

    df_q = spread_small_input(df_q)
    # Chained select: the struct lands in its own projection so the two
    # field reads below can't make CollapseProject re-inline the k-way
    # argmin twice (non-cheap multi-referenced aliases stay put).
    tmp = df_q.select(
        F.col(id_col), _assign_cols(F.col(qvec_col), centroids).alias("_best")
    )
    return tmp.select(
        F.col(id_col),
        F.col("_best")["cluster"].alias("cluster"),
        F.col("_best")["dist2"].alias("dist2"),
    )


def kmeans_quantized(
    df_q: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """fit + assign in one call (the oracle-checked query shape)."""
    return kmeans_assign(
        df_q, kmeans_fit(df_q, k, iters, id_col, qvec_col), id_col, qvec_col
    )


def semantic_dedup(
    df_q: DataFrame,
    centroids: list[list[int]] | None = None,
    k: int = 8,
    iters: int = 2,
    tau: tuple[int, int] = (19, 20),
    id_col: str = "vec_id",
    qvec_col: str = "qvec",
) -> DataFrame:
    """SemDeDup: survivors after within-cluster cosine near-dup removal.

    A vector is DROPPED iff some smaller-id vector in the same cluster has
    cosine similarity >= tau (= tau[0]/tau[1], default 0.95). The test is
    exact: ``dot > 0 AND den^2*dot^2 >= num^2*|a|^2*|b|^2`` in int64
    (int8 vectors at dim<=64 keep every term under 2^60 for tau_num<=127).
    Zero vectors have no direction and are never near anything.
    -> (vec_id, cluster) survivors.

    The pair stage is an equi-join on the cluster id with an id-order
    predicate — no cartesian, no all-pairs; its fan-out is bounded by the
    cluster-size distribution the caller controls through k (SemDeDup
    sizes k ~ N / desired cluster size).
    """
    from otel_tail_sampler_spark.functions.spread import spread_small_input

    # widen once here: assignment AND the per-pair integer dots below are
    # interpreted-HOF CPU work; a single-split input would run them on one
    # core (no-op at scale, and idempotent under the nested spreads)
    df_q = spread_small_input(df_q)
    if centroids is None:
        centroids = kmeans_fit(df_q, k, iters, id_col, qvec_col)
    a = kmeans_assign(df_q, centroids, id_col, qvec_col).select(id_col, "cluster")
    v = df_q.select(
        F.col(id_col),
        F.col(qvec_col).alias("_q"),
        _int_dot(F.col(qvec_col), F.col(qvec_col)).alias("_n2"),
    )
    m = a.join(v, id_col)
    left = m.select(
        F.col("cluster"),
        F.col(id_col).alias("_ida"),
        F.col("_q").alias("_qa"),
        F.col("_n2").alias("_na"),
    )
    right = m.select(
        F.col("cluster"),
        F.col(id_col).alias("_idb"),
        F.col("_q").alias("_qb"),
        F.col("_n2").alias("_nb"),
    )
    num, den = int(tau[0]), int(tau[1])
    dot = _int_dot(F.col("_qa"), F.col("_qb"))
    dropped = (
        left.join(right, "cluster")
        .filter(F.col("_ida") < F.col("_idb"))
        .filter((F.col("_na") > 0) & (F.col("_nb") > 0))
        .withColumn("_dot", dot)
        .filter(
            (F.col("_dot") > 0)
            & (
                F.lit(den * den) * F.col("_dot") * F.col("_dot")
                >= F.lit(num * num) * F.col("_na") * F.col("_nb")
            )
        )
        .select(F.col("_idb").alias(id_col))
        .distinct()
    )
    return a.join(dropped, id_col, "left_anti").select(id_col, "cluster")

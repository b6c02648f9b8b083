"""DSIR importance selection (operators/selection.py).

The Spark kernels and the DuckDB oracle share the pack/bucket/smoothing
formulas, so (symmetric-bug rule) correctness rests on an independent
pure-Python scalar reference plus arrow-vs-jvm kernel equality over
edge shapes — the two kernels share only the packing expression.
"""

import pytest

from otel_tail_sampler_spark.operators.selection import (
    build_dsir_model,
    dsir_score,
    dsir_select,
)

VECS = [
    ("d0", [1, 2, 3, 1, 2]),        # target-ish
    ("d1", [1, 2, 1, 2]),           # pure target bigrams
    ("d2", [7, 8, 9]),              # raw-only bigrams
    ("d3", [5]),                    # single token: no features
    ("d4", []),                     # empty doc
    ("d5", [-2147483648, -1, 3]),   # INT32_MIN pack edge + negative mod
]
TARGET_IDS = {"d0", "d1"}


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>"
    )


def _pack(a, b):
    return a * 4294967296 + (b & 0xFFFFFFFF)


def _ref(rows, target_ids, n_buckets, scale_bits=20):
    """Independent scalar reference of the documented formulas."""
    tf: dict = {}
    rf: dict = {}
    for did, toks in rows:
        for a, b in zip(toks, toks[1:]):
            f = _pack(a, b) % n_buckets  # python %: sign of divisor
            rf[f] = rf.get(f, 0) + 1
            if did in target_ids:
                tf[f] = tf.get(f, 0) + 1
    t_total, r_total = sum(tf.values()), sum(rf.values())
    s = 1 << scale_bits
    out = {}
    for did, toks in rows:
        feats = [
            _pack(a, b) % n_buckets for a, b in zip(toks, toks[1:])
        ]
        tm = sum(tf.get(f, 0) + 1 for f in feats)
        rm = sum(rf.get(f, 0) + 1 for f in feats)
        if feats:
            ratio = (s * tm * (r_total + n_buckets)) // (
                rm * (t_total + n_buckets)
            )
        else:
            ratio = s
        out[did] = (len(feats), tm, rm, ratio)
    return out


@pytest.mark.parametrize("kernel", ["arrow", "jvm"])
def test_score_matches_scalar_reference(spark, kernel):
    n_buckets = 64  # tiny: forces real bucket collisions
    rows = [(d, t) for d, t in VECS]
    df = _df(spark, rows)
    target = df.filter(df.doc_id.isin(*TARGET_IDS))
    model = build_dsir_model(target, df, n_buckets=n_buckets)
    got = {
        r["doc_id"]: (
            r["n_feat"],
            r["target_mass"],
            r["raw_mass"],
            r["ratio_fp"],
        )
        for r in dsir_score(
            df, model, n_buckets=n_buckets, kernel=kernel
        ).collect()
    }
    assert got == _ref(rows, TARGET_IDS, n_buckets)


def test_model_counts_planted(spark):
    df = _df(spark, [("a", [1, 2, 1, 2]), ("b", [1, 2])])
    target = df.filter("doc_id = 'b'")
    model = {
        r["bucket"]: (r["t_freq"], r["r_freq"])
        for r in build_dsir_model(target, df, n_buckets=16).collect()
    }
    b12 = _pack(1, 2) % 16
    b21 = _pack(2, 1) % 16
    assert model[b12] == (1, 3)  # (1,2) twice in a, once in b
    assert model[b21] == (0, 1)  # (2,1) raw-only


def test_kernels_equal_on_edge_shapes(spark):
    df = _df(spark, VECS)
    target = df.filter(df.doc_id.isin(*TARGET_IDS))
    model = build_dsir_model(target, df, n_buckets=32)
    a = sorted(
        dsir_score(df, model, n_buckets=32, kernel="arrow").collect()
    )
    j = sorted(
        dsir_score(df, model, n_buckets=32, kernel="jvm").collect()
    )
    assert a == j


def test_select_topk_rank_and_ties(spark):
    # d3/d4 both have no features -> identical neutral ratio; the tie
    # must break to the smaller doc_id deterministically.
    df = _df(spark, VECS)
    target = df.filter(df.doc_id.isin(*TARGET_IDS))
    model = build_dsir_model(target, df, n_buckets=64)
    rows = dsir_select(df, model, k=6, n_buckets=64).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5, 6]
    ratios = [r["ratio_fp"] for r in rows]
    assert ratios == sorted(ratios, reverse=True)
    tied = [r["doc_id"] for r in rows if r["ratio_fp"] == 1 << 20]
    assert tied == sorted(tied)
    # target-bigram docs outrank the raw-only doc
    ranked = {r["doc_id"]: r["rank"] for r in rows}
    assert ranked["d1"] < ranked["d2"]


def test_empty_target_is_uniform_prior(spark):
    # no target data: t_freq 0 everywhere, so target_mass == n_feat and
    # ranking degenerates to (corpus-rarity)^-1 ordering — still defined.
    df = _df(spark, [("a", [1, 2, 3]), ("b", [9, 9, 9])])
    model = build_dsir_model(df.filter("doc_id = 'zz'"), df, n_buckets=16)
    got = dsir_score(df, model, n_buckets=16).collect()
    for r in got:
        assert r["target_mass"] == r["n_feat"]

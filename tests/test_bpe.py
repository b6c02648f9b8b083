"""BPE learn/apply (operators/bpe.py).

The learner is shared pure Python between the Spark query and the oracle
replica, so (per the symmetric-bug rule) its correctness rests on the
hand-computed planted cases here; the apply has an independent
replace-chain formulation (mirrored by the DuckDB oracle) that the
equivalence test exercises.
"""

from __future__ import annotations

import pytest

from otel_tail_sampler_spark.operators.bpe import (
    END,
    apply_bpe,
    encode_word,
    learn_bpe_from_texts,
    learn_bpe_merges,
)

TEXTS = ["low low low", "lower", "newest newest"]


def test_learn_hand_computed_merges():
    # wordfreq: low:3 lower:1 newest:2
    # round 1: (l,o)=4 ties (o,w)=4 -> lexicographic min ('l','o')
    # round 2: ('lo','w')=4
    # round 3: ('low', END)=3
    assert learn_bpe_from_texts(TEXTS, num_merges=3) == [
        ("l", "o"),
        ("lo", "w"),
        ("low", END),
    ]


def test_learn_is_deterministic_and_bounded():
    m1 = learn_bpe_from_texts(TEXTS, num_merges=50)
    m2 = learn_bpe_from_texts(TEXTS, num_merges=50)
    assert m1 == m2
    # a tiny corpus runs out of pairs before 50 merges: learner stops
    assert len(m1) < 50


def test_encode_word_hand_computed():
    merges = learn_bpe_from_texts(TEXTS, num_merges=3)
    assert encode_word("low", merges) == ("low" + END,)
    assert encode_word("lowest", merges) == ("low", "e", "s", "t", END)
    # unseen chars pass through as singles
    assert encode_word("loz", merges) == ("lo", "z", END)


def test_merge_pass_is_left_to_right_nonoverlapping():
    # 'a a a' -> 'aa a' (replace-all semantics, scan resumes after merge)
    assert encode_word("aaa", [("a", "a")]) == ("aa", "a", END)
    assert encode_word("aaaa", [("a", "a")]) == ("aa", "aa", END)


def _replace_chain_encode(word: str, merges) -> list[str]:
    """The INDEPENDENT formulation the DuckDB oracle uses: nested
    replace on the NEWLINE-FRAMED representation (every token owns both
    its delimiters, so framed matches never overlap and replace-all ==
    greedy). A single-space form is NOT equivalent — adjacent
    occurrences of a pair share the separator and merge only once."""
    s = "".join(f"\n{c}\n" for c in list(word) + [END])
    for a, b in merges:
        s = s.replace(f"\n{a}\n\n{b}\n", f"\n{a + b}\n")
    return [x for x in s.split("\n") if x]


def test_encode_equals_replace_chain():
    # 'papa'/'abab'/'aaaa' are the adversarial class: adjacent
    # occurrences of one merge pair, where the naive single-space chain
    # diverges from greedy (found by review; the framed chain must not)
    merges = learn_bpe_from_texts(TEXTS, num_merges=10)
    words = ["low", "lower", "newest", "lowest", "wen", "aaa", "x",
             "low</w>x", "papa", "abab", "aaaa", "aaaaa"]
    for w in words:
        assert list(encode_word(w, merges)) == _replace_chain_encode(w, merges), w
    # and with pair-repeat merges planted directly
    for merges2 in ([("a", "a")], [("p", "a"), ("pa", "pa")],
                    [("a", "b"), ("ab", "ab")]):
        for w in words:
            assert (
                list(encode_word(w, merges2))
                == _replace_chain_encode(w, merges2)
            ), (w, merges2)


def test_encode_equals_replace_chain_property():
    """Hypothesis: greedy encode == framed replace chain on ARBITRARY
    words and merge lists (pure Python, no Spark session needed) — the
    hand-listed adversarial words above are necessary but not
    sufficient; this drives the repeat/overlap space broadly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alpha = st.text(alphabet="abp", min_size=1, max_size=2)

    @given(
        st.text(alphabet="abp", min_size=0, max_size=12),
        st.lists(st.tuples(alpha, alpha), min_size=0, max_size=6),
    )
    @settings(max_examples=300, deadline=None)
    def prop(word, merges):
        assert list(encode_word(word, merges)) == _replace_chain_encode(
            word, merges
        )

    prop()


def test_apply_bpe_spark_matches_reference(spark):
    df = spark.createDataFrame(
        [
            ("a", "low lower"),
            ("b", "newest  low\tnewest"),  # whitespace-run contract
            ("c", ""),
            ("d", None),
        ],
        "doc_id string, text string",
    )
    merges = learn_bpe_from_texts(TEXTS, num_merges=3)
    got = {
        r["doc_id"]: (list(r["pieces"]), r["n_pieces"])
        for r in apply_bpe(df, merges).collect()
    }
    low = ["low" + END]
    lower = ["low", "e", "r", END]
    newest = ["n", "e", "w", "e", "s", "t", END]
    assert got["a"] == (low + lower, 5)
    assert got["b"] == (newest + low + newest, 15)
    assert got["c"] == ([], 0)
    assert got["d"] == ([], 0)


def test_learn_bpe_merges_sample_is_deterministic(spark):
    df = spark.createDataFrame(
        [(f"d{i}", "low lower newest" if i % 2 else "low low")
         for i in range(40)],
        "doc_id string, text string",
    )
    m1 = learn_bpe_merges(df, num_merges=5, sample_docs=16)
    m2 = learn_bpe_merges(df, num_merges=5, sample_docs=16)
    assert m1 == m2 and len(m1) == 5


def test_bpe_vocab_and_ids_hand_computed(spark):
    from otel_tail_sampler_spark.operators.bpe import (
        apply_bpe_ids,
        bpe_vocab,
        sample_alphabet,
    )

    merges = learn_bpe_from_texts(TEXTS, num_merges=3)
    alpha = sample_alphabet(TEXTS)
    assert alpha == ["e", "l", "n", "o", "r", "s", "t", "w"]
    vocab = bpe_vocab(merges, alpha)
    # pieces sorted asc: </w>, e, l, lo, low, low</w>, n, o, r, s, t, w
    assert vocab[END] == 1 and vocab["low" + END] == 6
    assert 0 not in vocab.values()  # 0 reserved for UNK

    df = spark.createDataFrame(
        [("a", "low lowz"), ("b", None)], "doc_id string, text string"
    )
    got = {
        r["doc_id"]: (list(r["tokens"]), r["n_tok"])
        for r in apply_bpe_ids(df, merges, vocab).collect()
    }
    # low -> [low</w>]; lowz -> [low, z(UNK=0), </w>]
    assert got["a"] == (
        [vocab["low" + END], vocab["low"], 0, vocab[END]],
        4,
    )
    assert got["b"] == ([], 0)


def test_bpe_ids_match_pieces_through_vocab(spark):
    from otel_tail_sampler_spark.operators.bpe import (
        apply_bpe_ids,
        bpe_vocab,
        sample_alphabet,
    )

    merges = learn_bpe_from_texts(TEXTS, num_merges=5)
    vocab = bpe_vocab(merges, sample_alphabet(TEXTS))
    df = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(TEXTS + ["unseen chars xyz?!"])],
        "doc_id string, text string",
    )
    pieces = {
        r["doc_id"]: list(r["pieces"]) for r in apply_bpe(df, merges).collect()
    }
    ids = {
        r["doc_id"]: list(r["tokens"])
        for r in apply_bpe_ids(df, merges, vocab).collect()
    }
    assert ids == {
        k: [vocab.get(p, 0) for p in v] for k, v in pieces.items()
    }


def test_bpe_ids_compose_with_packing(spark):
    """The ids output IS the input_hint tokenized shape: pack_sequences
    consumes it directly (raw text -> learned subword ids -> training
    examples, end to end)."""
    from otel_tail_sampler_spark.operators.bpe import (
        apply_bpe_ids,
        learn_bpe,
    )
    from otel_tail_sampler_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(f"d{i:02d}", "low lower newest low " * 4) for i in range(12)],
        "doc_id string, text string",
    )
    merges, vocab = learn_bpe(df, num_merges=6, sample_docs=8)
    toks = apply_bpe_ids(df, merges, vocab)
    packed = pack_sequences(toks, max_len=16).collect()
    total = sum(
        r["n_tok"] for r in toks.select("n_tok").collect()
    )
    assert len(packed) == total // 16
    assert all(len(r["tokens"]) == 16 for r in packed)


def test_apply_bpe_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([("a", "low")], "doc_id string, text string")
    plan = (
        apply_bpe(df, [("l", "o")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan

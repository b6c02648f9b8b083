"""Smoke test executing docs/loader_handoff.md's example VERBATIM (the
doc's code block is extracted and run, so the handoff page cannot rot)."""

import os
import re


def _doc_example():
    doc = open(
        os.path.join(os.path.dirname(__file__), "..", "docs",
                     "loader_handoff.md")
    ).read()
    (block,) = re.findall(r"```python\n(.*?)```", doc, re.S)
    ns: dict = {}
    exec(compile(block, "loader_handoff.md", "exec"), ns)
    return ns["handoff_example"]


def test_doc_example_runs_end_to_end(spark, tmp_path):
    rows = [
        (f"d{i:03d}", "web" if i % 3 else "code",
         list(range(i % 7, i % 7 + 10 + i % 23)))
        for i in range(120)
    ]
    corpus = spark.createDataFrame(
        [(d, s, t, len(t)) for d, s, t in rows],
        "doc_id string, source string, tokens array<int>, n_tok int",
    )
    out = _doc_example()(spark, corpus, str(tmp_path))
    assert out, "shard 0 produced no micro-batches"
    toks, mask = out[0]
    assert toks.shape[1] == 64 and mask.shape[1:] == (64, 64)
    # block-diagonality: attention never crosses a doc-span boundary
    import numpy as np

    for b in range(mask.shape[0]):
        m = mask[b]
        assert (m == m.T).all()
        # padded tail attends nowhere
        used = np.where(toks[b] != 0)[0]
        if used.size < 64:
            assert not m[63].any() or toks[b, 63] != 0

"""Streaming pipeline: session-window assembly == inactivity-timeout semantics.

Verifies that the bounded streaming run (Trigger.AvailableNow) emits exactly
the traces whose sessions the final watermark closed, with summaries equal to
the batch assembly for those traces, and keep/drop decisions matching the
batch decide().
"""

import os

import pandas as pd
import pytest

from otel_tail_sampler_spark.operators.policies import (
    CardinalityPolicy,
    ErrorPolicy,
    LatencyPolicy,
    SamplerConfig,
)
from otel_tail_sampler_spark.sources.generator import GenSpec, generate_dataset
from otel_tail_sampler_spark.streaming.stream_job import run_streaming_pipeline

from tests import oracle_pandas as O

CFG = SamplerConfig(
    error=ErrorPolicy(sample_rate=0.8),
    latency=LatencyPolicy(threshold_ms=4000, sample_rate=1.0),
    cardinality=CardinalityPolicy(max_span_count=100),
)

GAP_S = 30
DELAY_S = 10


@pytest.fixture(scope="module")
def stream_result(spark, tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("stream_in")
    out_dir = str(tmp_path_factory.mktemp("stream_out"))
    paths = generate_dataset(
        GenSpec(n_traces=300, spans_per_trace=5, error_rate=0.2, seed=11),
        str(data_dir),
    )
    run_streaming_pipeline(
        spark,
        paths["tokenized"],
        out_dir,
        CFG,
        gap_seconds=GAP_S,
        watermark_delay=f"{DELAY_S} seconds",
        max_files_per_trigger=3,
    )
    emitted = pd.read_parquet(os.path.join(out_dir, "decided"))
    oracle_spans = pd.read_parquet(paths["oracle"])
    return emitted, oracle_spans


def test_emitted_set_is_watermark_closed_sessions(stream_result):
    emitted, spans = stream_result
    # expected: sessions whose (last span ts + gap) <= final watermark
    per_trace = spans.groupby("trace_id")["timestamp_ms"].agg(["min", "max"])
    final_wm = spans["timestamp_ms"].max() - DELAY_S * 1000
    closed = set(per_trace[per_trace["max"] + GAP_S * 1000 <= final_wm].index)
    got = set(emitted["trace_id"])
    assert got == closed
    assert len(got) > 0


def test_emitted_summaries_match_batch_assembly(stream_result):
    emitted, spans = stream_result
    want = O.assemble(spans).set_index("trace_id")
    for _, row in emitted.sample(min(50, len(emitted)), random_state=0).iterrows():
        w = want.loc[row["trace_id"]]
        assert row["span_count"] == w["span_count"]
        assert row["has_error"] == w["has_error"]
        assert row["max_duration_ms"] == w["max_duration_ms"]
        assert row["min_timestamp_ms"] == w["min_timestamp_ms"]
        assert sorted(row["operations"]) == w["operations"]
        assert row["root_span_id"] == w["root_span_id"]


def test_stream_decisions_match_batch_decide(stream_result):
    emitted, spans = stream_result
    decided_o = O.decide(
        O.assemble(spans),
        error_rate=0.8,
        latency_threshold_ms=4000,
        latency_rate=1.0,
        max_span_count=100,
    ).set_index("trace_id")
    for _, row in emitted.iterrows():
        assert row["decision"] == decided_o.loc[row["trace_id"], "decision"]


def test_no_duplicate_emissions(stream_result):
    emitted, _ = stream_result
    assert emitted["trace_id"].is_unique


@pytest.fixture(scope="module")
def state_stream_result(spark, tmp_path_factory):
    """Same bounded run driven by the applyInPandasWithState strategy."""
    data_dir = tmp_path_factory.mktemp("state_stream_in")
    out_dir = str(tmp_path_factory.mktemp("state_stream_out"))
    paths = generate_dataset(
        GenSpec(n_traces=300, spans_per_trace=5, error_rate=0.2, seed=11),
        str(data_dir),
    )
    run_streaming_pipeline(
        spark,
        paths["tokenized"],
        out_dir,
        CFG,
        gap_seconds=GAP_S,
        watermark_delay=f"{DELAY_S} seconds",
        max_files_per_trigger=3,
        strategy="state",
    )
    emitted = pd.read_parquet(os.path.join(out_dir, "decided"))
    oracle_spans = pd.read_parquet(paths["oracle"])
    return emitted, oracle_spans


def test_state_emitted_set_bounded_by_watermark(state_stream_result):
    """Custom-state timeouts fire when the watermark passes last_ts + gap
    STRICTLY; the emitted set is bracketed by the strict and lenient closure
    sets (they differ only on exact-boundary ties)."""
    emitted, spans = state_stream_result
    per_trace = spans.groupby("trace_id")["timestamp_ms"].agg(["min", "max"])
    final_wm = spans["timestamp_ms"].max() - DELAY_S * 1000
    strict = set(per_trace[per_trace["max"] + GAP_S * 1000 < final_wm].index)
    lenient = set(per_trace[per_trace["max"] + GAP_S * 1000 <= final_wm].index)
    got = set(emitted["trace_id"])
    assert strict <= got <= lenient
    assert len(got) > 0
    assert emitted["trace_id"].is_unique


def test_state_summaries_match_batch_assembly(state_stream_result):
    emitted, spans = state_stream_result
    want = O.assemble(spans).set_index("trace_id")
    for _, row in emitted.sample(min(50, len(emitted)), random_state=0).iterrows():
        w = want.loc[row["trace_id"]]
        assert row["span_count"] == w["span_count"]
        assert row["has_error"] == w["has_error"]
        assert row["error_count"] == w["error_count"]
        assert row["max_duration_ms"] == w["max_duration_ms"]
        assert row["min_timestamp_ms"] == w["min_timestamp_ms"]
        assert row["max_timestamp_ms"] == w["max_timestamp_ms"]
        assert sorted(row["operations"]) == w["operations"]
        assert row["root_span_id"] == w["root_span_id"]
        assert row["service_name"] == w["service_name"]


def test_state_decisions_match_batch_decide(state_stream_result):
    emitted, spans = state_stream_result
    decided_o = O.decide(
        O.assemble(spans),
        error_rate=0.8,
        latency_threshold_ms=4000,
        latency_rate=1.0,
        max_span_count=100,
    ).set_index("trace_id")
    for _, row in emitted.iterrows():
        assert row["decision"] == decided_o.loc[row["trace_id"], "decision"]


def test_streaming_routed_keep_export(spark, tmp_path_factory):
    """route_spans_from: every kept trace's spans land in routed_keep/ with
    token arrays verbatim (lake-as-span-buffer export), exactly once, and
    only for traces the stream decided keep."""
    data_dir = tmp_path_factory.mktemp("route_in")
    out_dir = str(tmp_path_factory.mktemp("route_out"))
    paths = generate_dataset(
        GenSpec(n_traces=200, spans_per_trace=5, error_rate=0.3, seed=13),
        str(data_dir),
    )
    run_streaming_pipeline(
        spark,
        paths["tokenized"],
        out_dir,
        CFG,
        gap_seconds=GAP_S,
        watermark_delay=f"{DELAY_S} seconds",
        max_files_per_trigger=3,
        route_spans_from=paths["tokenized"],
    )
    decided = pd.read_parquet(os.path.join(out_dir, "decided"))
    kept_traces = set(decided.loc[decided["decision"] == "keep", "trace_id"])
    routed = pd.read_parquet(os.path.join(out_dir, "routed_keep"))
    assert len(routed), "expected exported keep spans"
    assert not routed["doc_id"].duplicated().any(), "exactly-once per span row"

    src = pd.read_parquet(paths["tokenized"]).set_index("doc_id")
    oracle_spans = pd.read_parquet(paths["oracle"])
    want_docs = set(
        oracle_spans[oracle_spans["trace_id"].isin(kept_traces)]["doc_id"]
    )
    assert set(routed["doc_id"]) == want_docs
    merged = routed.set_index("doc_id").join(src, rsuffix="_src")
    assert all(
        list(a) == list(b) for a, b in zip(merged["tokens"], merged["tokens_src"])
    )


def test_dedup_stream_first_wins_across_batches(spark, tmp_path_factory):
    """Streaming exact-dedup: first arrival of a digest passes, later
    arrivals (across micro-batches) drop; same-batch ties elect min id."""
    import glob

    from otel_tail_sampler_spark.streaming.dedup_stream import dedup_stream

    in_dir = tmp_path_factory.mktemp("dd_in")
    out_dir = str(tmp_path_factory.mktemp("dd_out"))
    # batch 1: A(ids 2 and 10 — the pair a stringified min would order
    # wrong: "10" < "2" lexicographically), B(id 3)
    spark.createDataFrame(
        [(10, "alpha text"), (3, "beta text"), (2, "alpha text")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("overwrite").parquet(str(in_dir / "b1"))
    stream_in = str(tmp_path_factory.mktemp("dd_stream"))
    import shutil

    shutil.copy(glob.glob(f"{in_dir}/b1/*.parquet")[0], f"{stream_in}/f1.parquet")
    # batch 2: dup of A again (id 5) + new C (id 7)
    spark.createDataFrame(
        [(5, "alpha text"), (7, "gamma text")], "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(str(in_dir / "b2"))
    shutil.copy(glob.glob(f"{in_dir}/b2/*.parquet")[0], f"{stream_in}/f2.parquet")

    src = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_in)
    )
    q = (
        dedup_stream(src)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", out_dir + "_ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = pd.read_parquet(out_dir).sort_values("doc_id")
    # exactly one row per distinct text; A elected NUMERIC min id (2, not
    # "10") with its same-batch dup counted; cross-batch dups never re-emit
    assert sorted(out["doc_id"]) == [2, 3, 7]
    a = out[out["doc_id"] == 2].iloc[0]
    assert a["dup_count"] == 1


def test_kafka_value_decode_matches_file_source_schema(spark, small_dataset):
    """The Kafka branch's value decode (classpath-gated at the source level)
    is exercised on a batch frame shaped like Kafka's wire schema: JSON
    values map onto the file-source schema field-for-field, flow through
    the SAME parser, and a malformed payload decodes to NULLs that the
    parser routes to the malformed sink — consumer.rs:136-193's
    skip-on-decode-error."""
    import json

    from otel_tail_sampler_spark.operators.parser import parse_spans
    from otel_tail_sampler_spark.streaming.stream_job import decode_kafka_value

    rows = spark.read.parquet(small_dataset["tokenized"]).limit(5).collect()
    payloads = [
        json.dumps(
            {
                "doc_id": r["doc_id"],
                "tokens": list(r["tokens"]),
                "n_tok": r["n_tok"],
                "source": r["source"],
            }
        ).encode()
        for r in rows
    ] + [b"{not json"]
    wire = spark.createDataFrame(
        [
            (b"k", v, "spans", 0, i, None)
            for i, v in enumerate(payloads)
        ],
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp",
    )
    decoded = decode_kafka_value(wire)
    assert decoded.columns == ["doc_id", "tokens", "n_tok", "source"]
    good = {r["doc_id"]: r for r in decoded.filter("doc_id IS NOT NULL").collect()}
    assert len(good) == 5
    for r in rows:
        assert list(good[r["doc_id"]]["tokens"]) == list(r["tokens"])
    # the malformed payload survives as an all-NULL row...
    assert decoded.filter("doc_id IS NULL").count() == 1
    # ...and the shared parser routes it to the malformed sink
    parsed = parse_spans(decoded, keep_tokens=False)
    assert parsed.filter("NOT parse_ok").count() == 1
    assert parsed.filter("parse_ok").count() == 5


def test_prep_stream_end_to_end_with_restart(spark, tmp_path_factory):
    """Streaming prep leg: gate -> tokenize -> cross-batch dedup ->
    checkpointed parquet sink. A restart over the same checkpoint
    processes only NEW files and re-emits nothing; tokens match the
    batch tokenizer exactly for every emitted doc."""
    import shutil
    import time

    from otel_tail_sampler_spark.operators.text import hash_tokenize
    from otel_tail_sampler_spark.streaming.prep_stream import run_prep_stream

    root = tmp_path_factory.mktemp("prep_stream")
    src = root / "docs_in"
    out = root / "out"
    src.mkdir()

    def write_wave(name, rows):
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        ).coalesce(1).write.mode("overwrite").parquet(str(root / name))
        for f in (root / name).glob("*.parquet"):
            shutil.copyfile(f, src / f"{name}.parquet")

    base = "the quick brown fox jumps over the lazy dog number"
    wave1 = [(i, f"{base} {i}", "en", "src0") for i in range(10)]
    wave1.append((100, "tiny", "en", "src0"))  # gated: < min_words
    write_wave("w1", wave1)

    q = run_prep_stream(
        spark, str(src), str(out), vocab_size=512, min_words=5
    )
    q.awaitTermination(120)
    got1 = spark.read.parquet(f"{out}/tokenized").toPandas()
    assert sorted(got1["doc_id"]) == list(range(10))  # tiny doc gated

    # wave 2: 5 duplicates of wave-1 texts (new ids) + 3 genuinely new
    wave2 = [(200 + i, f"{base} {i}", "en", "src1") for i in range(5)]
    wave2 += [(300 + i, f"{base} new {i}", "en", "src1") for i in range(3)]
    write_wave("w2", wave2)

    q2 = run_prep_stream(
        spark, str(src), str(out), vocab_size=512, min_words=5
    )
    q2.awaitTermination(120)
    time.sleep(1)
    got2 = spark.read.parquet(f"{out}/tokenized").toPandas()
    # duplicates dropped by cross-batch state; only the 3 new docs added
    assert sorted(got2["doc_id"]) == list(range(10)) + [300, 301, 302]

    # token parity vs the batch tokenizer for every emitted doc
    all_docs = spark.createDataFrame(
        wave1 + wave2, "doc_id long, text string, lang string, source string"
    )
    want = {
        r["doc_id"]: list(r["tokens"])
        for r in hash_tokenize(all_docs, vocab_size=512).collect()
    }
    for _, r in got2.iterrows():
        assert list(r["tokens"]) == want[r["doc_id"]], r["doc_id"]


def test_prep_stream_empty_source_with_explicit_schema(spark, tmp_path):
    """ADVICE r4: a streaming deployment can start BEFORE producers write
    the first file. With an explicit schema the empty source dir must
    start and drain cleanly (zero output, no throw); without one, the
    eager probe read is the documented failure."""
    import pytest

    from otel_tail_sampler_spark.streaming.prep_stream import run_prep_stream

    src = tmp_path / "empty_src"
    out = tmp_path / "out"
    src.mkdir()
    ddl = "doc_id long, text string, lang string, source string"
    q = run_prep_stream(
        spark, str(src), str(out), vocab_size=512, schema=ddl
    )
    q.awaitTermination(120)
    # file sink writes its manifest even for zero batches; tolerate a
    # missing dir, but any readable output must be empty
    try:
        n = spark.read.parquet(f"{out}/tokenized").count()
    except Exception:
        n = 0
    assert n == 0
    # the probe fallback on an empty dir throws (documented contract)
    with pytest.raises(Exception):
        run_prep_stream(spark, str(src), str(tmp_path / "out2"))


def test_prep_stream_dsir_gate_matches_batch_sample(spark, tmp_path_factory):
    """The streaming DSIR gate (offline model, online apply) keeps
    EXACTLY the batch dsir_sample keep set over the same gated input,
    and the kept rows carry ratio_fp through the dedup stage."""
    import shutil

    from otel_tail_sampler_spark.operators.selection import (
        build_dsir_model_partitioned,
        dsir_sample,
    )
    from otel_tail_sampler_spark.operators.text import hash_tokenize
    from otel_tail_sampler_spark.streaming.prep_stream import run_prep_stream
    from pyspark.sql import functions as F

    root = tmp_path_factory.mktemp("prep_dsir")
    src = root / "docs_in"
    out = root / "out"
    src.mkdir()
    words = ["alpha", "beta", "gamma", "delta", "epsi", "zeta"]
    rows = [
        (
            i,
            " ".join(words[(i + j) % len(words)] for j in range(8))
            + f" uniq{i}",
            "en",
            "tgt" if i % 4 == 0 else "raw",
        )
        for i in range(40)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(str(root / "w"))
    for f in (root / "w").glob("*.parquet"):
        shutil.copyfile(f, src / "w.parquet")

    # offline: model trained on the batch-tokenized view of the same data
    batch_toks = hash_tokenize(
        spark.read.parquet(str(src)), vocab_size=256,
        keep_cols=("source",),
    )
    model = build_dsir_model_partitioned(
        batch_toks, F.col("source") == "tgt", n_buckets=128
    )
    model = spark.createDataFrame(model.collect(), model.schema)  # pin

    q = run_prep_stream(
        spark, str(src), str(out), vocab_size=256, min_words=2,
        dsir_model=model, dsir_rate=0.7, dsir_n_buckets=128,
    )
    q.awaitTermination(120)
    got = spark.read.parquet(f"{out}/tokenized").toPandas()

    # batch reference: same gate chain = tokenize -> dsir -> first-wins
    # dedup (all texts distinct here, so dedup is identity)
    want = {
        r["doc_id"]: r["ratio_fp"]
        for r in dsir_sample(
            batch_toks, model, rate=0.7, n_buckets=128
        ).collect()
    }
    assert {int(d): int(r) for d, r in zip(got["doc_id"], got["ratio_fp"])} \
        == want
    assert 0 < len(got) < 40  # the gate actually bites both ways


def test_dedup_stream_against_standing_corpus(spark, tmp_path_factory):
    """ref_digests: texts the standing corpus already holds never emit
    (not even on first arrival) and never cost a state row; novel texts
    still dedup first-wins within the stream."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from otel_tail_sampler_spark.streaming.dedup_stream import dedup_stream

    ref = spark.createDataFrame(
        [(1, "known alpha"), (2, "known beta")], "doc_id long, text string"
    )
    ref_digests = ref.select(F.md5("text").alias("digest"))
    in_dir = tmp_path_factory.mktemp("rd_in")
    stream_in = str(tmp_path_factory.mktemp("rd_stream"))
    out_dir = str(tmp_path_factory.mktemp("rd_out"))
    b1 = [(10, "known alpha"), (11, "novel gamma")]
    b2 = [(12, "novel gamma"), (13, "known beta"), (14, "novel delta")]
    for i, rows in enumerate((b1, b2), 1):
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(1).write.mode("overwrite").parquet(str(in_dir / f"b{i}"))
        shutil.copy(
            glob.glob(f"{in_dir}/b{i}/*.parquet")[0],
            f"{stream_in}/f{i}.parquet",
        )
    src = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_in)
    )
    q = (
        dedup_stream(src, ref_digests=ref_digests)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", out_dir + "_ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = pd.read_parquet(out_dir)
    # known texts (10, 13) dropped by the static anti join; gamma emits
    # once (first arrival, id 11), delta emits
    assert sorted(out["doc_id"]) == [11, 14]


def test_prep_stream_against_standing_corpus(spark, tmp_path_factory):
    """run_prep_stream(ref_digests=...): re-crawled documents the
    standing corpus already holds never reach the output; the rest of
    the leg (gates, tokenize, within-stream dedup) is unchanged."""
    from pyspark.sql import functions as F

    from otel_tail_sampler_spark.streaming.prep_stream import (
        run_prep_stream,
    )

    docs_dir = str(tmp_path_factory.mktemp("ps_docs"))
    out_dir = str(tmp_path_factory.mktemp("ps_out"))
    rows = [
        (1, "the quick brown fox jumps over dogs", "s1"),
        (2, "an entirely different document body here", "s1"),
        (3, "the quick brown fox jumps over dogs", "s2"),  # in-stream dup
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(docs_dir)
    ref = spark.createDataFrame(
        [("the quick brown fox jumps over dogs",)], "text string"
    ).select(F.md5("text").alias("digest"))
    q = run_prep_stream(
        spark, docs_dir, out_dir, vocab_size=256, ref_digests=ref
    )
    q.awaitTermination(120)
    out = spark.read.parquet(f"{out_dir}/tokenized")
    assert [r["doc_id"] for r in out.collect()] == [2]

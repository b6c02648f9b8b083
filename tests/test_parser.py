"""Parser correctness: Spark-parsed spans must equal the field-level oracle.

The oracle parquet is written straight from generated fields (generator.py),
so this exercises the full token encode -> Arrow-vectorized decode roundtrip.
Mirrors the reference decoder tests (/root/reference/src/decoder.rs:212-227)
plus full-field equality, which the reference never asserts.
"""

import pandas as pd
import pytest

from otel_tail_sampler_spark.operators.parser import parse_spans


@pytest.fixture(scope="module")
def parsed_and_oracle(spark, small_dataset):
    parsed = (
        parse_spans(spark.read.parquet(small_dataset["tokenized"]))
        .drop("tokens")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    oracle = (
        pd.read_parquet(small_dataset["oracle"])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return parsed, oracle


FIELDS = [
    "trace_id",
    "span_id",
    "parent_span_id",
    "timestamp_ms",
    "duration_ms",
    "status_code",
    "span_kind",
    "service_name",
    "operation_name",
]


def test_row_count(parsed_and_oracle):
    parsed, oracle = parsed_and_oracle
    assert len(parsed) == len(oracle) > 0


@pytest.mark.parametrize("field", FIELDS)
def test_field_equality(parsed_and_oracle, field):
    parsed, oracle = parsed_and_oracle
    p, o = parsed[field], oracle[field]
    if field == "parent_span_id":
        assert (p.isna() == o.isna()).all()
        mask = ~o.isna()
        assert (p[mask] == o[mask]).all()
    else:
        assert (p == o).all(), f"{field}: first diff at\n{parsed[p != o].head(3)}"


def test_roots_are_null_parent(parsed_and_oracle):
    parsed, _ = parsed_and_oracle
    roots = parsed[parsed["parent_span_id"].isna()]
    assert roots["trace_id"].nunique() == parsed["trace_id"].nunique()


def test_n_tok_matches_token_length(spark, small_dataset):
    from pyspark.sql import functions as F

    df = spark.read.parquet(small_dataset["tokenized"])
    assert df.filter(F.size("tokens") != F.col("n_tok")).count() == 0


def test_hex_ids_shape(parsed_and_oracle):
    parsed, _ = parsed_and_oracle
    assert parsed["trace_id"].str.fullmatch(r"[0-9A-F]{32}").all()
    assert parsed["span_id"].str.fullmatch(r"[0-9A-F]{16}").all()


def test_malformed_rows_quarantined(spark, tmp_path):
    """Truncated/garbage token arrays must not abort the job (parse_ok=false,
    routed to the malformed sink) while valid rows still parse."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from otel_tail_sampler_spark.plans.pipeline import run_pipeline
    from otel_tail_sampler_spark.sources.generator import GenSpec, generate_fields, build_token_arrays

    f = generate_fields(GenSpec(n_traces=4, spans_per_trace=2, seed=3))
    good = build_token_arrays(f)
    bad = pa.array(
        [[1, 2, 3], [], [0] * 14 + [99, 65], [0] * 14 + [1, 65, -5, 66]],
        pa.list_(pa.int32()),
    )
    tokens = pa.concat_arrays([good.cast(pa.list_(pa.int32())), bad])
    n = len(tokens)
    tbl = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(n)]),
            "tokens": tokens,
            "n_tok": pa.array([len(tokens[i]) for i in range(n)], pa.int32()),
            "source": pa.array(["s"] * n),
        }
    )
    path = str(tmp_path / "mixed.parquet")
    pq.write_table(tbl, path)

    res = run_pipeline(spark, path)
    routed = res.routed.toPandas()
    assert len(routed) == n
    mal = routed[routed["decision"] == "malformed"]
    assert set(mal["doc_id"]) == {"d8", "d9", "d10", "d11"}
    assert (routed[routed["decision"] != "malformed"]["parse_ok"]).all()
    # malformed rows keep their original tokens for replay
    assert sorted(len(t) for t in mal["tokens"]) == [0, 3, 16, 18]


def test_jvm_routing_key_equals_python_parse(spark, small_dataset):
    """with_routing_key (pure JVM) must agree with the Arrow parser on both
    trace_id and parse_ok, including malformed rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from otel_tail_sampler_spark.operators.parser import parse_spans, with_routing_key

    from otel_tail_sampler_spark.operators.parser import hex_from_keys

    df = spark.read.parquet(small_dataset["tokenized"])
    a = with_routing_key(df).select(
        "doc_id",
        F.when(
            F.col("parse_ok"),
            hex_from_keys(F.col("trace_k1"), F.col("trace_k2")),
        ).alias("tid"),
        "parse_ok",
    )
    b = parse_spans(df, False, ["trace_id"]).select(
        "doc_id", F.col("trace_id").alias("t2"), F.col("parse_ok").alias("p2")
    )
    assert (
        a.join(b, "doc_id")
        .filter("tid IS DISTINCT FROM t2 OR parse_ok <> p2")
        .count()
        == 0
    )


def test_jvm_routing_key_malformed(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from otel_tail_sampler_spark.operators.parser import with_routing_key

    bad = pa.array(
        [[1, 2, 3], [], [0] * 14 + [99, 65], [0] * 14 + [1, 65, -5, 66],
         [0] * 14 + [0, 0]],
        pa.list_(pa.int32()),
    )
    tbl = pa.table(
        {"doc_id": [f"d{i}" for i in range(5)], "tokens": bad,
         "n_tok": pa.array([3, 0, 16, 18, 16], pa.int32()),
         "source": ["s"] * 5}
    )
    p = str(tmp_path / "bad2.parquet")
    pq.write_table(tbl, p)
    from otel_tail_sampler_spark.operators.parser import hex_from_keys

    rows = (
        with_routing_key(spark.read.parquet(p))
        .select(
            "doc_id",
            "parse_ok",
            F.when(
                F.col("parse_ok"),
                hex_from_keys(F.col("trace_k1"), F.col("trace_k2")),
            ).alias("trace_id"),
        )
        .collect()
    )
    by = {r["doc_id"]: (r["parse_ok"], r["trace_id"]) for r in rows}
    assert by["d0"][0] is False and by["d0"][1] is None
    assert by["d1"][0] is False
    assert by["d2"][0] is False  # svc_len 99 out of bounds
    assert by["d3"][0] is False  # negative op len
    assert by["d4"] == (True, "00000000000000000000000000000000")

"""Trace assembly vs pandas oracle; salted == unsalted equivalence."""

import pandas as pd
import pytest

from otel_tail_sampler_spark.operators.assembly import TRACE_SUMMARY_COLS, assemble_traces
from otel_tail_sampler_spark.operators.parser import parse_spans

from tests.oracle_pandas import assemble as oracle_assemble


@pytest.fixture(scope="module")
def spans_df(spark, small_dataset):
    return parse_spans(spark.read.parquet(small_dataset["tokenized"])).drop(
        "tokens", "n_tok"
    )


@pytest.fixture(scope="module")
def oracle_traces(small_dataset):
    return (
        oracle_assemble(pd.read_parquet(small_dataset["oracle"]))
        .sort_values("trace_id")
        .reset_index(drop=True)
    )


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("trace_id").reset_index(drop=True)
    pdf["operations"] = pdf["operations"].apply(list)
    return pdf[TRACE_SUMMARY_COLS].astype(
        {"span_count": "int64", "error_count": "int64"}
    )


def test_assembly_matches_oracle(spans_df, oracle_traces):
    got = _normalize(assemble_traces(spans_df).toPandas())
    want = _normalize(oracle_traces)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_salted_equals_unsalted(spans_df):
    plain = _normalize(assemble_traces(spans_df).toPandas())
    salted = _normalize(assemble_traces(spans_df, salt_buckets=8).toPandas())
    pd.testing.assert_frame_equal(salted, plain, check_dtype=False)


def test_summary_invariants(spans_df):
    t = assemble_traces(spans_df).toPandas()
    assert (t["span_count"] >= 1).all()
    assert (t["min_timestamp_ms"] <= t["max_timestamp_ms"]).all()
    assert (t["has_error"] == (t["error_count"] > 0)).all()
    assert t["root_span_id"].notna().all()


def test_auto_salt_detection(spark, spans_df):
    """'auto' probes key skew: a planted heavy hitter triggers salting with a
    sensibly-sized bucket count; uniform input stays unsalted (None)."""
    from pyspark.sql import functions as F

    from otel_tail_sampler_spark.operators.assembly import detect_salt_buckets

    # uniform fixture: no heavy hitter -> no salting
    assert detect_salt_buckets(spans_df) is None

    # plant one 200k-span trace next to small ones
    heavy = spark.range(200_000).select(
        F.lit("HEAVY").alias("trace_id"),
        F.format_string("h%06d", F.col("id")).alias("span_id"),
        F.lit(None).cast("string").alias("parent_span_id"),
        F.lit("svc").alias("service_name"),
        F.lit("op").alias("operation_name"),
        F.col("id").alias("timestamp_ms"),
        F.lit(10).alias("duration_ms"),
        F.lit(0).alias("status_code"),
    )
    small = spark.range(1000).select(
        F.format_string("T%04d", F.col("id")).alias("trace_id"),
        F.format_string("s%06d", F.col("id")).alias("span_id"),
        F.lit(None).cast("string").alias("parent_span_id"),
        F.lit("svc").alias("service_name"),
        F.lit("op").alias("operation_name"),
        F.col("id").alias("timestamp_ms"),
        F.lit(10).alias("duration_ms"),
        F.lit(0).alias("status_code"),
    )
    skewed = heavy.unionByName(small)
    buckets = detect_salt_buckets(skewed)
    assert buckets is not None and 2 <= buckets <= 64

    # 'auto' end-to-end equals the unsalted result
    from otel_tail_sampler_spark.operators.assembly import assemble_traces

    a = assemble_traces(skewed, salt_buckets="auto").orderBy("trace_id").toPandas()
    b = assemble_traces(skewed).orderBy("trace_id").toPandas()
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True), check_dtype=False
    )

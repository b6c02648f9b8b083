"""Span-compression golden cases from /root/reference/src/sampling/
span_compression.rs:399-513 and src/tests/mod.rs:165-326 (FIXTURES.md §5)."""

import pytest
from pyspark.sql.types import (
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from otel_tail_sampler_spark.operators.compression import (
    CompressionConfig,
    compress_spans,
    normalize_statement,
)

SCHEMA = StructType(
    [
        StructField("trace_id", StringType()),
        StructField("span_id", StringType()),
        StructField("parent_span_id", StringType()),
        StructField("service_name", StringType()),
        StructField("operation_name", StringType()),
        StructField("timestamp_ms", LongType()),
        StructField("duration_ms", LongType()),
        StructField("status_code", LongType()),
        StructField("attributes", MapType(StringType(), StringType())),
    ]
)


def _sql_span(sid, stmt, dur, ts=1000, trace="T", status=0):
    return (
        trace, sid, "R", "db-service", "postgresql.query", ts, dur, status,
        {"db.statement": stmt, "db.system": "postgresql"},
    )


@pytest.fixture(scope="module")
def fixture_spans(spark):
    rows = [
        _sql_span("s1", "SELECT * FROM users WHERE id = 1", 10),
        _sql_span("s2", "SELECT * FROM users WHERE id = 2", 15),
        _sql_span("s3", "SELECT * FROM users WHERE id = 3", 20),
        _sql_span("s4", "INSERT INTO logs VALUES ('a')", 5),
        _sql_span("s5", "INSERT INTO logs VALUES ('b')", 8),
        ("T", "s6", "R", "web", "http.request", 1000, 30, 0, {}),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_normalize_statement(spark):
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        normalize_statement(
            F.lit("select * from users  where id = 42 and name = 'bob'")
        ).alias("n")
    )
    assert df.collect()[0]["n"] == "SELECT * FROM USERS WHERE ID = ? AND NAME = ?"


def test_grouping_and_exact_stats(fixture_spans):
    """counts 3 and 2, totals 45 and 13 (span_compression.rs:469-490)."""
    out = compress_spans(fixture_spans, CompressionConfig(min_compression_count=2))
    groups = {r["op_type"]: r for r in out["compressed"].collect()}
    sel = groups["db.query.select"]
    assert sel["span_count"] == 3
    assert sel["total_duration_ms"] == 45
    assert sel["mean_duration_ms"] == 15.0
    assert sel["min_duration_ms"] == 10 and sel["max_duration_ms"] == 20
    assert sorted(sel["original_span_ids"]) == ["s1", "s2", "s3"]
    ins = groups["db.query.insert"]
    assert ins["span_count"] == 2 and ins["total_duration_ms"] == 13
    # http.request passes through
    pt = [r["span_id"] for r in out["passthrough"].collect()]
    assert pt == ["s6"]


def test_min_count_threshold(fixture_spans):
    """min_count 5 with <=3 similar spans => nothing compresses."""
    out = compress_spans(fixture_spans, CompressionConfig(min_compression_count=5))
    assert out["compressed"].count() == 0
    assert out["passthrough"].count() == 6


def test_long_span_never_compressed(spark):
    rows = [
        _sql_span("s1", "SELECT * FROM t WHERE id = 1", 70_000),
        _sql_span("s2", "SELECT * FROM t WHERE id = 2", 70_000),
        _sql_span("s3", "SELECT * FROM t WHERE id = 3", 70_000),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = compress_spans(df, CompressionConfig(min_compression_count=3))
    assert out["compressed"].count() == 0
    assert out["passthrough"].count() == 3


def test_window_filter(spark):
    """spans spread wider than window_seconds don't compress (A4)."""
    rows = [
        _sql_span("s1", "SELECT * FROM t WHERE id = 1", 10, ts=0),
        _sql_span("s2", "SELECT * FROM t WHERE id = 2", 10, ts=30_000),
        _sql_span("s3", "SELECT * FROM t WHERE id = 3", 10, ts=120_000),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = compress_spans(df, CompressionConfig(min_compression_count=3, window_seconds=60))
    assert out["compressed"].count() == 0


def test_deterministic_compressed_id(fixture_spans):
    cfg = CompressionConfig(min_compression_count=2)
    a = {r["op_type"]: r["compressed_span_id"] for r in compress_spans(fixture_spans, cfg)["compressed"].collect()}
    b = {r["op_type"]: r["compressed_span_id"] for r in compress_spans(fixture_spans, cfg)["compressed"].collect()}
    assert a == b and all(len(v) == 16 for v in a.values())


def test_pattern_table_rewrite(fixture_spans):
    cfg = CompressionConfig(
        min_compression_count=2, sql_patterns=(("FROM USERS", "user-queries"),)
    )
    out = compress_spans(fixture_spans, cfg)
    ops = {r["op_type"] for r in out["compressed"].collect()}
    assert "user-queries" in ops


def test_span_conservation_long_span_in_surviving_group(spark):
    """3 fast + 1 long span sharing one normalized statement: the fast ones
    compress, the long one must still pass through (span_compression.rs:371-397
    computes the remainder from compressed span_ids, so long spans are never
    swallowed by a surviving group that shares their key)."""
    rows = [
        _sql_span("s1", "SELECT * FROM t WHERE id = 1", 10),
        _sql_span("s2", "SELECT * FROM t WHERE id = 2", 15),
        _sql_span("s3", "SELECT * FROM t WHERE id = 3", 20),
        _sql_span("s4", "SELECT * FROM t WHERE id = 4", 70_000),  # long
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = compress_spans(df, CompressionConfig(min_compression_count=3))
    comp = out["compressed"].collect()
    assert len(comp) == 1 and comp[0]["span_count"] == 3
    assert sorted(comp[0]["original_span_ids"]) == ["s1", "s2", "s3"]
    passthrough_ids = {r["span_id"] for r in out["passthrough"].collect()}
    assert passthrough_ids == {"s4"}  # conservation: s4 in exactly one output

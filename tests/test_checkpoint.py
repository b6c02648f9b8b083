"""Resumable per-partition checkpoint semantics."""

import duckdb
import pytest

from otel_tail_sampler_spark.plans.checkpoint import (
    MANIFEST_SCHEMA,
    read_manifest,
    run_resumable,
)

N_BUCKETS = 8


def _routed_counts(out_dir):
    return duckdb.sql(
        f"select decision, count(*) n from parquet_scan('{out_dir}/routed/*/*/*.parquet', hive_partitioning=1) group by 1 order by 1"
    ).fetchall()


def test_full_run_then_noop_resume(spark, small_dataset, tmp_path):
    out = str(tmp_path / "out")
    r1 = run_resumable(spark, small_dataset["tokenized"], out, n_buckets=N_BUCKETS)
    assert r1.processed_buckets == list(range(N_BUCKETS))
    assert r1.stage_metrics["input_rows"] > 0
    full = _routed_counts(out)

    r2 = run_resumable(spark, small_dataset["tokenized"], out, n_buckets=N_BUCKETS)
    assert r2.processed_buckets == [] and r2.skipped_buckets == list(range(N_BUCKETS))
    assert _routed_counts(out) == full


def test_partial_resume_completes_remaining(spark, small_dataset, tmp_path):
    """Simulate a crash after half the buckets committed: pre-mark 0-3 done,
    resume must process exactly 4-7; a later full rewrite (manifest wiped)
    must converge to the same totals as an uninterrupted run."""
    ref_out = str(tmp_path / "ref")
    run_resumable(spark, small_dataset["tokenized"], ref_out, n_buckets=N_BUCKETS)
    want = _routed_counts(ref_out)

    out = str(tmp_path / "resumed")
    fake_done = [(b, "done", 0, 0) for b in range(4)]
    spark.createDataFrame(fake_done, MANIFEST_SCHEMA).write.mode("append").parquet(
        f"{out}/_checkpoint"
    )
    r = run_resumable(spark, small_dataset["tokenized"], out, n_buckets=N_BUCKETS)
    assert r.processed_buckets == [4, 5, 6, 7]
    assert r.skipped_buckets == [0, 1, 2, 3]
    assert read_manifest(spark, f"{out}/_checkpoint") == set(range(N_BUCKETS))

    # buckets 0-3 were never really written: only 4-7 exist on disk
    got_buckets = set(
        r[0]
        for r in duckdb.sql(
            f"select distinct bucket from parquet_scan('{out}/routed/*/*/*.parquet', hive_partitioning=1)"
        ).fetchall()
    )
    assert got_buckets == {4, 5, 6, 7}

    # wipe manifest -> next run rewrites everything idempotently
    import shutil

    shutil.rmtree(f"{out}/_checkpoint")
    r3 = run_resumable(spark, small_dataset["tokenized"], out, n_buckets=N_BUCKETS)
    assert r3.processed_buckets == list(range(N_BUCKETS))
    assert _routed_counts(out) == want


def test_bucket_is_trace_aligned(spark, small_dataset):
    """All spans of a trace must share a bucket (decisions are per-trace)."""
    from pyspark.sql import functions as F

    from otel_tail_sampler_spark.operators.parser import parse_spans
    from otel_tail_sampler_spark.plans.checkpoint import bucket_col

    spans = parse_spans(spark.read.parquet(small_dataset["tokenized"])).withColumn(
        "bucket", bucket_col(N_BUCKETS)
    )
    multi = (
        spans.groupBy("trace_id")
        .agg(F.countDistinct("bucket").alias("nb"))
        .filter(F.col("nb") > 1)
        .count()
    )
    assert multi == 0


def test_resume_preserves_prior_buckets_under_static_overwrite(
    spark, small_dataset, tmp_path
):
    """Resume with earlier buckets' parquet data already on disk, on a session
    whose partitionOverwriteMode is the Spark default (static): the resumed
    write must NOT delete previously committed bucket partitions —
    run_resumable pins dynamic mode itself rather than trusting the caller."""
    import shutil

    out = str(tmp_path / "out")
    run_resumable(spark, small_dataset["tokenized"], out, n_buckets=N_BUCKETS)
    want = _routed_counts(out)

    # forge a crash: manifest says only 0-3 done, but ALL bucket data exists
    shutil.rmtree(f"{out}/_checkpoint")
    fake_done = [(b, "done", 0, 0) for b in range(4)]
    spark.createDataFrame(fake_done, MANIFEST_SCHEMA).write.mode("append").parquet(
        f"{out}/_checkpoint"
    )

    ow_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(ow_key)
    spark.conf.set(ow_key, "static")
    try:
        r = run_resumable(spark, small_dataset["tokenized"], out, n_buckets=N_BUCKETS)
        assert spark.conf.get(ow_key) == "static"  # caller's setting restored
    finally:
        spark.conf.set(ow_key, prev)
    assert r.processed_buckets == [4, 5, 6, 7]
    # ALL buckets still on disk, totals identical to the uninterrupted run
    got_buckets = set(
        row[0]
        for row in duckdb.sql(
            f"select distinct bucket from parquet_scan('{out}/routed/*/*/*.parquet', hive_partitioning=1)"
        ).fetchall()
    )
    assert got_buckets == set(range(N_BUCKETS))
    assert _routed_counts(out) == want

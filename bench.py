"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric: spans/sec of the full decision pipeline (parse -> assemble ->
decide -> route -> per-sink counts) on the generated tokenized table at the
matching scale, including the heavy-hitter skew variant (1% of traces with
2000 spans, scripts/load_simulation.rs:52-55 shape). Secondary queries cover
the shuffle-heavy relational and training-data operators.

The N-vs-4N scaling protocol (BASELINE.md) lives in scripts/bench_scaling.py
(separate JVMs per parallelism level); this file is the per-round quick bench.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def _pipeline_spans_per_sec(spark, tokenized_path: str, salt_buckets=None) -> tuple[float, int]:
    import __spark_entry__ as E
    from otel_tail_sampler_spark.plans.pipeline import run_pipeline
    from otel_tail_sampler_spark.operators.routing import decision_metrics

    spark.catalog.clearCache()  # a prior run's persisted `decided` would
    # otherwise be plan-matched and reused, hiding parse+assembly cost
    t0 = time.time()
    res = run_pipeline(spark, tokenized_path, E.ENTRY_CFG, salt_buckets=salt_buckets)
    # ONE action: union the two tiny metric tables so sink-row counts and
    # per-policy trace counts materialize in a single job (one driver
    # round-trip instead of two serial ones — same shape as scaling_job.py)
    rows = (
        res.routed.groupBy("decision")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("kind", F.lit("rows"))
        .unionByName(
            decision_metrics(res.decisions)
            .select(
                F.col("sink").alias("decision"), F.col("trace_count").alias("n")
            )
            .withColumn("kind", F.lit("traces"))
        )
        .collect()
    )
    elapsed = time.time() - t0
    n_spans = sum(r["n"] for r in rows if r["kind"] == "rows")
    return elapsed, n_spans


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_CPUS", cpus)

    from otel_tail_sampler_spark.session import build_session
    from otel_tail_sampler_spark.sources.generator import ensure_dataset, sf_from_dir

    sf = sf_from_dir(sf_dir)
    spark = build_session(app_name="bench", master=f"local[{cpus}]",
                          shuffle_partitions=int(cpus) * 2 if cpus.isdigit() else 64)

    import __spark_entry__ as E

    queries: dict[str, float] = {}

    # warm-up: spawn every Python worker (a worker's first task pays numpy/
    # pyarrow import + page-fault cost) and JIT the codegen paths once
    warm = ensure_dataset("0.001")
    wdf = spark.read.parquet(warm["tokenized"]).repartition(
        int(cpus) if cpus.isdigit() else 32
    )
    from otel_tail_sampler_spark.operators.parser import parse_spans
    parse_spans(wdf, keep_tokens=False).count()
    _pipeline_spans_per_sec(spark, warm["tokenized"])

    # headline: uniform pipeline at matching sf — two runs, report the warm
    # one (the first big action pays one-time JVM heap-growth/page-fault cost
    # in this sandbox; steady-state throughput is the metric)
    paths = ensure_dataset(sf)
    # min of 7: the uniform headline is a ~2s job on a +/-50%-variance host
    # (whole multi-minute windows run 2x slow — observed min-of-5 at 4.3s
    # vs 1.95s an hour apart on identical code), so spread more draws.
    # ALL draws land in the artifact (detail.uniform_draws) so host variance
    # is visible in the record, not asserted in prose (VERDICT r3 #3).
    uniform_draws: list[float] = []
    n_spans = 0
    for _ in range(7):
        d, n_spans = _pipeline_spans_per_sec(spark, paths["tokenized"])
        uniform_draws.append(round(d, 3))
    t = min(uniform_draws)
    queries["pipeline_uniform"] = round(t, 3)
    uniform_rate = n_spans / t

    # headline: skewed pipeline (heavy-hitter traces) at bench scale
    skew_paths = ensure_dataset("bench0.1")
    # min of 4: observed first-draw 12.1s vs steady-state 4.0s on identical
    # code in a slow host window — 3 draws under-sampled the fast state
    skewed_draws: list[float] = []
    n_skew = 0
    for _ in range(4):
        d, n_skew = _pipeline_spans_per_sec(spark, skew_paths["tokenized"])
        skewed_draws.append(round(d, 3))
    t_skew = min(skewed_draws)
    queries["pipeline_skewed"] = round(t_skew, 3)
    skew_rate = n_skew / t_skew

    # silver re-decide fast path: materialization (one Arrow parse, bucketed
    # write) is SETUP, untimed — the measured number is what a rule update
    # costs once the silver table exists: bucketed scan -> agg (no exchange)
    # -> decide. Compare with pipeline_uniform (same data, full path).
    from otel_tail_sampler_spark.plans import silver as SV

    spark.sql("DROP TABLE IF EXISTS bench_silver")
    SV.materialize_parsed(
        spark, paths["tokenized"], "bench_silver", buckets=int(cpus) if cpus.isdigit() else 32
    )
    t0 = time.time()
    SV.redecide_from_silver(spark, "bench_silver", E.ENTRY_CFG).groupBy(
        "decision"
    ).agg(F.count(F.lit(1))).collect()
    t_silver = time.time() - t0
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        SV.redecide_from_silver(spark, "bench_silver", E.ENTRY_CFG).groupBy(
            "decision"
        ).agg(F.count(F.lit(1))).collect()
        t_silver = min(t_silver, time.time() - t0)
    queries["silver_redecide"] = round(t_silver, 3)
    spark.sql("DROP TABLE IF EXISTS bench_silver")

    # secondary operator benchmarks on the driver's testdata at sf_dir
    secondary = [
        "tpch_q1_pricing",
        "events_session_agg",
        "orders_enrich_join",
        "lineitem_semi_join",
        "span_service_stats",
        "minhash_lsh_pairs",
        "simhash",
        "embedding_topk",
        "embedding_neardup_lsh",
        "winnow_poly",
        "pack_sequences",
        "doc_quality",
        "repetition_signals",
        "contamination",
        "dup_token_spans",
        "corpus_to_shards",
        "bigram_novelty",
        "bm25_topk",
        "kmeans_clusters",
        "semantic_dedup",
        "ngram_counts",
        "bpe_encode",
        "dsir_select",
        "length_batches",
        "token_budget",
        "interleave_key",
    ]
    # min-of-3 per secondary: single-shot timings on this +/-50%-variance
    # host made round-over-round deltas meaningless (VERDICT r2 #5).
    # ALL raw draws land in detail.secondary_draws (VERDICT r4 #1 applied
    # the embed-the-draws rule to headlines only; a secondary that moves
    # round-over-round must be adjudicable from the artifact alone).
    # The five that regressed unadjudicated in r4 get min-of-5.
    extra_draws = {
        "corpus_to_shards", "embedding_neardup_lsh", "contamination",
        "simhash", "embedding_topk",
    }
    secondary_draws: dict[str, list[float]] = {}
    qs = E.queries()
    for name in secondary:
        draws: list[float] = []
        for _ in range(5 if name in extra_draws else 3):
            spark.catalog.clearCache()
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            draws.append(round(time.time() - t0, 3))
        secondary_draws[name] = draws
        queries[name] = round(min(draws), 3)

    # streaming paths (VERDICT r3 #8): bounded Trigger.AvailableNow runs —
    # wall time includes stream startup + checkpoint io, so these are not
    # comparable to the batch numbers; they exist so the two stateful
    # streaming operators carry perf evidence at all. min-of-2 (each run
    # needs a fresh checkpoint dir, so runs are slower to repeat).
    import shutil
    import tempfile

    from otel_tail_sampler_spark.streaming.dedup_stream import dedup_stream
    from otel_tail_sampler_spark.streaming.stream_job import (
        run_streaming_pipeline,
    )

    docs_path = f"{sf_dir}/documents.parquet"
    dschema = spark.read.parquet(docs_path).schema
    n_docs = spark.read.parquet(docs_path).count()
    # the file stream source wants a DIRECTORY; stage the single test file
    src_dir = tempfile.mkdtemp(prefix="bench_dedup_src_")
    shutil.copy(docs_path, os.path.join(src_dir, "documents.parquet"))
    best = float("inf")
    for _ in range(2):
        ckpt = tempfile.mkdtemp(prefix="bench_dedup_stream_")
        src = spark.readStream.schema(dschema).parquet(src_dir)
        t0 = time.time()
        q = (
            dedup_stream(src)
            .writeStream.outputMode("append")
            .format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        best = min(best, time.time() - t0)
        shutil.rmtree(ckpt, ignore_errors=True)
    queries["streaming_dedup"] = round(best, 3)
    n_stream_docs = n_docs

    # streaming prep leg (added r4): gate -> tokenize -> stateful dedup ->
    # parquet sink, same bounded AvailableNow protocol; reuses src_dir
    from otel_tail_sampler_spark.streaming.prep_stream import run_prep_stream

    best = float("inf")
    for _ in range(2):
        out_dir = tempfile.mkdtemp(prefix="bench_prep_stream_")
        t0 = time.time()
        q = run_prep_stream(spark, src_dir, out_dir, vocab_size=4096)
        q.awaitTermination()
        best = min(best, time.time() - t0)
        shutil.rmtree(out_dir, ignore_errors=True)
    queries["streaming_prep"] = round(best, 3)

    # streaming prep + DSIR importance gate (added r5): the offline-model
    # online-apply shape — model built once outside the timed window (a
    # standing artifact in deployment), each micro-batch scored + resampled
    # before dedup; the delta vs streaming_prep is the gate's cost
    from otel_tail_sampler_spark.operators.selection import (
        build_dsir_model_partitioned,
    )
    from otel_tail_sampler_spark.operators.text import hash_tokenize

    toks = hash_tokenize(
        spark.read.parquet(src_dir), vocab_size=4096, keep_cols=("source",)
    )
    # target = svc-00, a real generator source (ADVICE r5: 'src0' matched
    # nothing, so the gate trained on a degenerate uniform-prior model and
    # the measured delta wasn't a real target-domain gate cost)
    model = build_dsir_model_partitioned(
        toks, F.col("source") == "svc-00", n_buckets=1 << 16
    )
    model = spark.createDataFrame(model.collect(), model.schema)
    best = float("inf")
    for _ in range(2):
        out_dir = tempfile.mkdtemp(prefix="bench_prep_dsir_")
        t0 = time.time()
        q = run_prep_stream(
            spark, src_dir, out_dir, vocab_size=4096,
            dsir_model=model, dsir_rate=0.7,
        )
        q.awaitTermination()
        best = min(best, time.time() - t0)
        shutil.rmtree(out_dir, ignore_errors=True)
    shutil.rmtree(src_dir, ignore_errors=True)
    queries["streaming_prep_dsir"] = round(best, 3)

    # both assembly strategies, same bounded input: 'session_window' is the
    # Spark-native scale path (JVM incremental session agg); 'state' mirrors
    # the reference's per-trace TraceState in Python and is expected ~4x
    # slower — the contrast IS the result being recorded
    # session_window gets min-of-2 (a ~5-17s job on a noisy host); the
    # state leg is a ~65s bounded run where one draw already averages out
    # host noise — a second would add a minute of bench wall for nothing
    for strat, draws in (("session_window", 2), ("state", 1)):
        best = float("inf")
        for _ in range(draws):
            out_dir = tempfile.mkdtemp(prefix=f"bench_stream_{strat}_")
            t0 = time.time()
            run_streaming_pipeline(
                spark,
                paths["tokenized"],
                out_dir,
                E.ENTRY_CFG,
                strategy=strat,
                max_files_per_trigger=8,
            )
            best = min(best, time.time() - t0)
            shutil.rmtree(out_dir, ignore_errors=True)
        queries[f"streaming_assembly_{strat}"] = round(best, 3)

    # ARTIFACT CONTRACT (VERDICT r5 #1): the driver tail-captures stdout, so
    # the LAST line must be a compact, self-contained headline JSON — the
    # r5 artifact failed to parse because embedding every secondary draw
    # vector grew the line past the capture window and truncated its head.
    # The full detail (all draw vectors) goes to the BENCH/DRAWS.json
    # sidecar, committed alongside the round's artifact.
    detail = {
        "uniform_spans": n_spans,
        "uniform_sec": round(t, 3),
        "uniform_draws": uniform_draws,
        "skewed_spans": n_skew,
        "skewed_sec": round(t_skew, 3),
        "skewed_draws": skewed_draws,
        "skewed_spans_per_sec": round(skew_rate, 1),
        "streaming_dedup_docs": n_stream_docs,
        "secondary_draws": secondary_draws,
        "cpus": cpus,
        "sf": sf,
        "headline_spans_per_sec": round(uniform_rate, 1),
        "queries": queries,
    }
    draws_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "DRAWS.json"
    )
    try:
        with open(draws_path, "w") as fh:
            json.dump(detail, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError as exc:  # never let the sidecar break the headline
        print(f"sidecar write failed: {exc}", file=sys.stderr)
    out = {
        "metric": "spans/sec decision+route throughput (uniform sf, single JVM)",
        "value": round(uniform_rate, 1),
        "unit": "spans/sec",
        "queries": queries,
        "sf": sf,
        "detail": {
            "uniform_spans": n_spans,
            "uniform_sec": round(t, 3),
            "skewed_spans": n_skew,
            "skewed_sec": round(t_skew, 3),
            "skewed_spans_per_sec": round(skew_rate, 1),
            "cpus": cpus,
            "draws": "BENCH/DRAWS.json",
        },
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

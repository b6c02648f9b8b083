"""Pure-pandas single-threaded oracle for the decision pipeline.

Independent reimplementation of trace assembly + policy decisions used to
verify the Spark pipeline (SURVEY.md §5 'our strategy'). Reads the generator's
``spans_oracle.parquet`` (written from fields, never from tokens), so parser,
assembly, and policies are all checked against code that shares nothing with
the implementation under test except the hash function contract.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

TWO_32 = 4294967296.0


def hfrac(key: str, seed: str) -> float:
    return int(hashlib.md5(f"{key}|{seed}".encode()).hexdigest()[:8], 16) / TWO_32


def assemble(spans: pd.DataFrame) -> pd.DataFrame:
    """TraceSummary per trace_id (mirror of operators.assembly semantics)."""
    df = spans.sort_values(["timestamp_ms", "span_id"], kind="mergesort")
    g = df.groupby("trace_id", sort=False)
    roots = df[df["parent_span_id"].isna()].groupby("trace_id", sort=False)
    out = pd.DataFrame(
        {
            "service_name": g["service_name"].first(),  # first (ts, span_id)
            "span_count": g.size(),
            "error_count": g["status_code"].apply(lambda s: int((s == 2).sum())),
            "max_duration_ms": g["duration_ms"].max(),
            "min_timestamp_ms": g["timestamp_ms"].min(),
            "max_timestamp_ms": g["timestamp_ms"].max(),
            "operations": g["operation_name"].apply(
                lambda s: sorted(set(s))
            ),
            "root_span_id": roots["span_id"].first(),
        }
    )
    out["has_error"] = out["error_count"] > 0
    return out.reset_index()


def decide(
    traces: pd.DataFrame,
    error_rate: float = 1.0,
    latency_threshold_ms: int = 30_000,
    latency_rate: float = 1.0,
    max_span_count: int = 100,
    always_sample_errors: bool = False,
) -> pd.DataFrame:
    t = traces.copy()
    err_frac = t["trace_id"].map(lambda x: hfrac(x, "error_sampling"))
    lat_frac = t["trace_id"].map(lambda x: hfrac(x, "latency_sampling"))
    t["p_error_sampling"] = t["has_error"] & (err_frac < error_rate)
    t["p_latency_sampling"] = (t["max_duration_ms"] > latency_threshold_ms) & (
        lat_frac < latency_rate
    )
    t["p_cardinality_sampling"] = t["span_count"] > max_span_count

    keep = (
        t["p_error_sampling"] | t["p_latency_sampling"] | t["p_cardinality_sampling"]
    )
    if always_sample_errors:
        keep = keep | t["has_error"]
    t["decision"] = np.where(keep, "keep", "drop")

    policy = np.full(len(t), "no_policy_matched", dtype=object)
    for name in (
        "p_cardinality_sampling",
        "p_latency_sampling",
        "p_error_sampling",
    ):  # reverse priority so earlier policies overwrite
        policy[t[name].to_numpy()] = name[2:]
    if always_sample_errors:
        sc = t["has_error"].to_numpy() & ~(
            t["p_error_sampling"]
            | t["p_latency_sampling"]
            | t["p_cardinality_sampling"]
        ).to_numpy()
        policy[sc] = "error_short_circuit"
    policy[~keep.to_numpy()] = "no_policy_matched"
    t["decision_policy"] = policy
    return t


def sink_counts(spans: pd.DataFrame, decided: pd.DataFrame) -> dict[str, int]:
    merged = spans.merge(decided[["trace_id", "decision"]], on="trace_id")
    return merged.groupby("decision").size().to_dict()

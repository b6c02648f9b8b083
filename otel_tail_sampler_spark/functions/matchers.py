"""Attribute/string matcher library -> Column compiler (P5/P6).

Re-expresses the reference's matcher ops
(/root/reference/src/sampling/force_sampling.rs:16-30,147-228):
``eq neq contains starts_with ends_with regex in exists gt gte lt lte``
over ``attributes[key]`` (numeric ops parse the string value), and the
policy-side MatchType Exact/Prefix/Suffix/Regex
(/root/reference/src/sampling/policies.rs:77-101).

All matchers compile to pure Catalyst expressions — whole-stage codegen, no
UDFs. A matcher dict:
    {"key": "http.status_code", "op": "gte", "value": "500"}
    {"key": "rpc.method", "op": "in", "values": ["Get", "List"]}
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def attr(key: str) -> Column:
    """attributes[key] (null when absent) — MapType(String,String) column."""
    return F.col("attributes").getItem(key)


def compile_matcher(m: dict, value_col: Column | None = None) -> Column:
    """One matcher -> boolean Column. ``value_col`` overrides the default
    attributes[key] lookup (used for resource-level pseudo-attributes).

    Null semantics follow the reference: a missing attribute matches nothing
    except ``exists`` (which is then false) — we coalesce the final result to
    false so absent keys never produce null decisions.
    """
    v = attr(m["key"]) if value_col is None else value_col
    op = m["op"]
    if op == "eq":
        out = v == F.lit(m["value"])
    elif op == "neq":
        # reference: neq on a present attribute; absent key -> no match
        out = v.isNotNull() & (v != F.lit(m["value"]))
    elif op == "contains":
        out = v.contains(m["value"])
    elif op == "starts_with":
        out = v.startswith(m["value"])
    elif op == "ends_with":
        out = v.endswith(m["value"])
    elif op == "regex":
        out = v.rlike(m["value"])
    elif op == "in":
        out = v.isin(list(m["values"]))
    elif op == "exists":
        out = v.isNotNull()
    elif op in ("gt", "gte", "lt", "lte"):
        num = v.cast("double")
        thr = F.lit(float(m["value"]))
        out = {
            "gt": num > thr,
            "gte": num >= thr,
            "lt": num < thr,
            "lte": num <= thr,
        }[op]
    else:
        raise ValueError(f"unknown matcher op: {op}")
    return F.coalesce(out, F.lit(False))


def compile_all(matchers: list[dict], value_cols: dict[str, Column] | None = None) -> Column:
    """ALL matchers must match (rule semantics, force_sampling.rs:271-287)."""
    out = F.lit(True)
    for m in matchers:
        vc = value_cols.get(m["key"]) if value_cols else None
        out = out & compile_matcher(m, vc)
    return out


# resource-attribute prefixes projected from the first span
# (force_sampling.rs:301-323)
RESOURCE_PREFIXES = (
    "service.",
    "deployment.",
    "tenant",
    "customer",
    "host.",
    "cloud.",
    "k8s.",
)


def resource_attributes(attributes: Column, service_name: Column) -> Column:
    """Pseudo-resource attrs: service.name + prefix-filtered attribute keys."""
    def _is_resource_key(k: Column, _v: Column) -> Column:
        out = F.lit(False)
        for p in RESOURCE_PREFIXES:  # static list -> unrolled OR chain
            out = out | k.startswith(p)
        return out

    filtered = F.map_filter(attributes, _is_resource_key)
    return F.map_concat(
        F.create_map(F.lit("service.name"), service_name), filtered
    )

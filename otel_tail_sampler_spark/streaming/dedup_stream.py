"""Streaming exact-dedup for the training-data (tokens) tier.

Batch exact_dedup (operators/dedup.py) picks the min-id representative of
each identical text in one bounded job. A continuously-ingesting corpus
needs the STREAMING form: the first arrival of each content digest passes
through, every later arrival is dropped — the same first-wins contract as
the reference's Redis exported-manifest (SETNX semantics,
/root/reference/src/sampling/evaluator.rs:358-401), expressed as
``applyInPandasWithState`` keyed by the md5 digest.

State shape: ONE tiny row (first_id) per DISTINCT digest — the
streaming analog of the Redis key set, partitioned by digest hash
across executors, and the natural skew-free key (digests are uniform by
construction). Content never enters the state store; the wide text/token
columns ride the emitted row only. Cross-batch duplicate counts are NOT
maintained: append mode only emits on first arrival, so an accumulated
counter would be write-only dead state updated on every duplicate
forever — the emitted ``dup_count`` covers same-batch duplicates only.
``ttl_minutes`` arms a processing-time timeout that expires idle
digests — the SETEX analog — bounding state exactly as the reference
bounds Redis memory (an expired digest re-admits the next duplicate,
the documented TTL trade-off).

Within one micro-batch, ties break to the MIN id (same representative
the batch operator elects); across batches, arrival order decides — that
is the defining semantic difference of the streaming form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F



def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ttl_minutes: int | None = None,
) -> DataFrame:
    """First-wins streaming dedup -> (digest, doc_id, dup_count): one row
    per NEW digest, emitted in the micro-batch where it first appears.
    dup_count counts same-batch duplicates folded into that emission.

    The id keeps its ORIGINAL type end-to-end (schemas are derived from
    the input), so the same-batch min-id election orders exactly like the
    batch operator's F.min — stringifying ids first would elect "10"
    before "2" and silently diverge from exact_dedup's representative."""
    import pandas as pd

    id_type = docs.schema[id_col].dataType.simpleString()
    out_schema = f"digest string, doc_id {id_type}, dup_count int"
    state_schema = f"first_id {id_type}"

    keyed = docs.select(
        F.md5(F.col(text_col)).alias("_digest"),
        F.col(id_col).alias("_id"),
    )

    def fn(key, pdfs, state):
        if state.hasTimedOut:  # TTL: forget the digest (SETEX expiry analog)
            state.remove()
            return

        ids: list[str] = []
        for pdf in pdfs:
            ids.extend(pdf["_id"])
        emit = None
        if state.exists:
            pass  # duplicate of a known digest: drop; no state churn
        elif ids:
            # same-batch ties -> min id in the column's NATIVE ordering
            # (numeric ids compare numerically, exactly like batch F.min)
            first = min(ids)
            if hasattr(first, "item"):  # numpy scalar -> python for state
                first = first.item()
            state.update((first,))
            emit = pd.DataFrame(
                [{"digest": str(key[0]), "doc_id": first,
                  "dup_count": len(ids) - 1}]
            )
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        if emit is not None:
            yield emit

    return keyed.groupBy("_digest").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            "ProcessingTimeTimeout" if ttl_minutes is not None else "NoTimeout"
        ),
    )

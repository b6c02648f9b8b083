"""Vectorized token-array -> span-columns parser (the decode stage).

Re-expresses the reference's OTLP decode (/root/reference/src/decoder.rs:23-115:
hex-encoded ids, nanos->ms arithmetic, default service name) for the tokenized
input of FIXTURES.md §1. This is the ONE sanctioned Python stage in the hot
path (SURVEY.md §2.11) and it is Arrow-vectorized end-to-end via
``DataFrame.mapInArrow``: every field is extracted with numpy gather/slice
math on the flattened list buffer — no per-row Python, no pandas object
columns for the hot fields.

The stage is narrow (no shuffle): Spark pipelines scan -> parse inside one
task, so it scales linearly with input splits at any table size.
"""

from __future__ import annotations

import binascii
from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from otel_tail_sampler_spark.sources.generator import HDR

# Parsed span schema appended to the (passed-through) input columns.
SPAN_FIELDS = [
    ("trace_id", pa.string()),
    ("span_id", pa.string()),
    ("parent_span_id", pa.string()),
    ("timestamp_ms", pa.int64()),
    ("duration_ms", pa.int64()),
    ("status_code", pa.int32()),
    ("span_kind", pa.int32()),
    ("service_name", pa.string()),
    ("operation_name", pa.string()),
    ("parse_ok", pa.bool_()),
]

PARSED_DDL = (
    "trace_id string, span_id string, parent_span_id string, "
    "timestamp_ms long, duration_ms long, status_code int, span_kind int, "
    "service_name string, operation_name string, parse_ok boolean"
)


def _hex_fixed(words: np.ndarray, width: int) -> pa.Array:
    """(n, k) int32 words -> uppercase hex strings of ``width`` chars."""
    raw = words.astype(">u4").tobytes()
    hexed = binascii.hexlify(raw).upper()
    n = words.shape[0]
    offsets = np.arange(0, (n + 1) * width, width, dtype=np.int32)
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(offsets.tobytes()), pa.py_buffer(hexed)
    )


def _gather_strings(vals: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> pa.Array:
    """Variable-length code-point runs -> Arrow string array, fully vectorized."""
    n = len(starts)
    cum = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=cum[1:])
    total = int(cum[-1])
    flat = np.repeat(starts, lens) + (np.arange(total) - np.repeat(cum[:-1], lens))
    data = vals[flat].astype(np.uint8).tobytes()
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(cum.astype(np.int32).tobytes()), pa.py_buffer(data)
    )


def _i64(vals: np.ndarray, off: np.ndarray, slot: int) -> np.ndarray:
    hi = vals[off + slot].astype(np.uint32).astype(np.uint64)
    lo = vals[off + slot + 1].astype(np.uint32).astype(np.uint64)
    return ((hi << np.uint64(32)) | lo).view(np.int64)


# a structurally-valid empty record: zero ids, zero times, empty strings —
# malformed input rows are redirected here, parsed, then nulled out
_DUMMY = np.zeros(HDR + 2, np.int32)


def _parse_batch(tokens: pa.ListArray) -> dict[str, pa.Array]:
    import pyarrow.compute as pc

    offs = tokens.offsets.to_numpy().astype(np.int64)
    vals = tokens.values.to_numpy(zero_copy_only=False).astype(np.int32, copy=False)
    off = offs[:-1]
    row_len = offs[1:] - off

    # --- malformed-row tolerance: never abort the job on one bad record ----
    # Redirect structurally-invalid rows to an appended dummy record, parse
    # everything branch-free, then null their fields out (parse_ok=false).
    vals = np.concatenate([vals, _DUMMY])
    dummy_off = len(vals) - len(_DUMMY)

    ok = row_len >= HDR + 2
    off = np.where(ok, off, dummy_off)
    row_len = np.where(ok, row_len, len(_DUMMY))
    svc_len_c = vals[off + HDR].astype(np.int64)
    ok &= (svc_len_c >= 0) & (HDR + 1 + svc_len_c + 1 <= row_len)
    off = np.where(ok, off, dummy_off)
    svc_len_c = np.where(ok, svc_len_c, 0)
    op_len_c = vals[off + HDR + 1 + svc_len_c].astype(np.int64)
    ok &= (op_len_c >= 0) & (HDR + 1 + svc_len_c + 1 + op_len_c <= row_len)
    off = np.where(ok, off, dummy_off)

    trace_id = _hex_fixed(vals[off[:, None] + np.arange(4)], 32)
    span_id = _hex_fixed(vals[off[:, None] + np.arange(4, 6)], 16)

    pwords = vals[off[:, None] + np.arange(6, 8)]
    is_root = (pwords[:, 0] == 0) & (pwords[:, 1] == 0)  # (0,0) <=> NULL (decoder.rs:72-77)
    parent_hex = _hex_fixed(pwords, 16)
    if is_root.any():
        mask = np.packbits(~is_root, bitorder="little")
        parent_hex = pa.StringArray.from_buffers(
            len(off),
            parent_hex.buffers()[1],
            parent_hex.buffers()[2],
            pa.py_buffer(mask.tobytes()),
            int(is_root.sum()),
        )

    svc_len = vals[off + HDR].astype(np.int64)
    svc_start = off + HDR + 1
    op_len_pos = svc_start + svc_len
    op_len = vals[op_len_pos].astype(np.int64)

    out = {
        "trace_id": trace_id,
        "span_id": span_id,
        "parent_span_id": parent_hex,
        "timestamp_ms": pa.array(_i64(vals, off, 8), pa.int64()),
        "duration_ms": pa.array(_i64(vals, off, 10), pa.int64()),
        "status_code": pa.array(vals[off + 12], pa.int32()),
        "span_kind": pa.array(vals[off + 13], pa.int32()),
        "service_name": _gather_strings(vals, svc_start, svc_len),
        "operation_name": _gather_strings(vals, op_len_pos + 1, op_len),
    }
    if not ok.all():
        ok_arr = pa.array(ok)
        out = {
            name: pc.if_else(ok_arr, arr, pa.scalar(None, arr.type))
            for name, arr in out.items()
        }
    out["parse_ok"] = pa.array(ok)
    return out


def parse_spans(df: DataFrame, keep_tokens: bool = True) -> DataFrame:
    """tokenized (doc_id, tokens, n_tok, source) -> + parsed span columns.

    ``keep_tokens=False`` drops the wide array column early so downstream
    aggregation shuffles only narrow columns (the metadata-first pattern of
    docs/ARCHITECTURE_V2_ICEBERG.md:27-33 — decide on summaries, fetch
    payloads only for kept traces).
    """
    in_fields = [(f.name, df.schema[f.name].dataType) for f in df.schema.fields]
    out_schema_ddl = (
        ", ".join(f"{n} {t.simpleString()}" for n, t in in_fields) + ", " + PARSED_DDL
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            tokens = batch.column("tokens")
            if isinstance(tokens, pa.ChunkedArray):  # defensive; batches are flat
                tokens = tokens.combine_chunks()
            parsed = _parse_batch(tokens)
            arrays = list(batch.columns) + [parsed[name] for name, _ in SPAN_FIELDS]
            names = batch.schema.names + [name for name, _ in SPAN_FIELDS]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    out = df.mapInArrow(fn, out_schema_ddl)
    if not keep_tokens:
        out = out.drop("tokens")
    return out


def spans_with_flags(parsed: DataFrame) -> DataFrame:
    """Cheap derived predicates used throughout (P2/P3 of SURVEY.md §2.2)."""
    return parsed.withColumns(
        {
            "is_error": F.col("status_code") == F.lit(2),
            "is_root": F.col("parent_span_id").isNull(),
        }
    )

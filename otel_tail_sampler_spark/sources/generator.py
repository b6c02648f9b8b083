"""Deterministic tokenized-span table generator (the pipeline's test source).

Mirrors the distribution knobs of the reference's synthetic producer
(/root/reference/src/bin/simple_producer.rs:10-32,149-268 — 8 services x 10
operations, error-rate on root spans, slow-rate, spans/trace with root+children)
and the load-simulation skew shape (scripts/load_simulation.rs:52-55 — a small
fraction of traces carry thousands of spans).

Two artifacts are produced from ONE field generation pass:

* ``tokenized.parquet`` — the pipeline input per BASELINE.json input_hint:
  ``(doc_id string, tokens array<int32>, n_tok int32, source string)`` with the
  fixed-layout token encoding from FIXTURES.md §1.
* ``spans_oracle.parquet`` — the decoded truth (what a correct parser must
  yield), written straight from the generated fields WITHOUT going through the
  token encoding, so parser tests and the DuckDB oracle are independent of the
  code under test.

Everything is seeded numpy; no Spark needed to generate.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from otel_tail_sampler_spark import SPAN_OPERATIONS, SPAN_SERVICES

BASE_EPOCH_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z

# Token layout (FIXTURES.md §1): header slot indices.
HDR = 14  # fixed int32 header slots before the string payloads


@dataclass(frozen=True)
class GenSpec:
    """Knobs for one deterministic dataset."""

    n_traces: int
    spans_per_trace: int = 5
    error_rate: float = 0.10  # root span status_code=2 (simple_producer.rs:163-168)
    slow_rate: float = 0.05  # root duration 5000-14000ms vs 10-500ms
    heavy_frac: float = 0.0  # load_simulation skew: frac of traces that are heavy
    heavy_spans: int = 2000
    seed: int = 42
    # Parquet layout (guide §6): row-group granularity bounds scan-task
    # assignment — Spark's byte-range splits hand a task only the row
    # groups whose midpoint lands in its range, so 65536-row groups in
    # 4 MB files capped the tokenized scan at 2 uneven tasks per file
    # (one 65k-row straggler each). 8192-row groups let the split
    # calculator's totalBytes/minPartitionNum sizing actually spread
    # the scan. Part of the spec marker: changing it regenerates.
    row_group_rows: int = 8192

    def tag(self) -> str:
        return (
            f"t{self.n_traces}_s{self.spans_per_trace}_e{int(self.error_rate * 100)}"
            f"_sl{int(self.slow_rate * 100)}_h{int(self.heavy_frac * 10000)}"
            f"x{self.heavy_spans}_seed{self.seed}"
        )


def _encode_strings(names: list[str]) -> list[np.ndarray]:
    """Each name -> int32 array [len, codepoint...] (length-prefixed payload)."""
    return [
        np.concatenate([[len(n)], np.frombuffer(n.encode("ascii"), np.uint8)]).astype(
            np.int32
        )
        for n in names
    ]


def generate_fields(spec: GenSpec) -> dict[str, np.ndarray]:
    """Generate all span fields as flat numpy arrays (one element per span)."""
    rng = np.random.Generator(np.random.PCG64(spec.seed))
    t = spec.n_traces

    # --- per-trace draws ---------------------------------------------------
    spans_per = np.full(t, spec.spans_per_trace, np.int64)
    if spec.heavy_frac > 0:
        heavy = rng.random(t) < spec.heavy_frac
        spans_per[heavy] = spec.heavy_spans
    is_error = rng.random(t) < spec.error_rate
    is_slow = rng.random(t) < spec.slow_rate
    service_idx_t = np.arange(t, dtype=np.int64) % len(SPAN_SERVICES)
    trace_words = rng.integers(0, 2**32, size=(t, 4), dtype=np.uint32).astype(np.int32)

    n = int(spans_per.sum())
    trace_row = np.repeat(np.arange(t), spans_per)  # trace index per span row
    starts = np.concatenate([[0], np.cumsum(spans_per)[:-1]])
    span_in_trace = np.arange(n) - np.repeat(starts, spans_per)
    is_root = span_in_trace == 0

    # --- per-span fields ----------------------------------------------------
    span_words = rng.integers(0, 2**32, size=(n, 2), dtype=np.uint32).astype(np.int32)
    root_rows = starts  # row index of each trace's root span
    root_words = span_words[root_rows]  # (t, 2)
    parent_words = root_words[trace_row].copy()
    parent_words[is_root] = 0  # (0,0) <=> NULL parent <=> root

    ts = BASE_EPOCH_MS + trace_row * 1_000 + span_in_trace * 7
    base_dur = rng.integers(10, 501, size=n).astype(np.int64)
    slow_root = is_root & is_slow[trace_row]
    base_dur[slow_root] = rng.integers(5_000, 14_001, size=int(slow_root.sum()))
    status = np.zeros(n, np.int64)
    status[is_root & is_error[trace_row]] = 2
    span_kind = (trace_row + span_in_trace) % 5
    operation_idx = (trace_row + span_in_trace) % len(SPAN_OPERATIONS)
    service_idx = service_idx_t[trace_row]

    return {
        "trace_words": trace_words[trace_row],
        "span_words": span_words,
        "parent_words": parent_words,
        "is_root": is_root,
        "timestamp_ms": ts.astype(np.int64),
        "duration_ms": base_dur,
        "status_code": status.astype(np.int32),
        "span_kind": span_kind.astype(np.int32),
        "service_idx": service_idx,
        "operation_idx": operation_idx,
    }


def _hex_upper(words: np.ndarray) -> np.ndarray:
    """(n, k) int32 words -> n uppercase-hex strings of 8k chars, vectorized."""
    import binascii

    raw = words.astype(">u4").tobytes()
    hexed = binascii.hexlify(raw).upper()
    width = words.shape[1] * 8
    return np.frombuffer(hexed, dtype=f"S{width}").astype(f"U{width}")


def build_token_arrays(f: dict[str, np.ndarray]) -> pa.ListArray:
    """Encode fields into the fixed-layout token arrays (FIXTURES.md §1)."""
    svc_payloads = _encode_strings(SPAN_SERVICES)
    op_payloads = _encode_strings(SPAN_OPERATIONS)
    svc_len = np.array([len(p) for p in svc_payloads], np.int64)
    op_len = np.array([len(p) for p in op_payloads], np.int64)

    n = len(f["timestamp_ms"])
    row_len = HDR + svc_len[f["service_idx"]] + op_len[f["operation_idx"]]
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(row_len, out=offsets[1:])
    values = np.empty(int(offsets[-1]), np.int32)

    off = offsets[:-1]
    # header: ids
    hdr_pos = off[:, None] + np.arange(4)
    values[hdr_pos] = f["trace_words"]
    values[off[:, None] + np.arange(4, 6)] = f["span_words"]
    values[off[:, None] + np.arange(6, 8)] = f["parent_words"]
    # i64 -> hi/lo int32 (two's-complement via uint64 view)
    for base, col in ((8, "timestamp_ms"), (10, "duration_ms")):
        v = f[col].astype(np.uint64)
        values[off + base] = (v >> 32).astype(np.uint32).astype(np.int32)
        values[off + base + 1] = (v & 0xFFFFFFFF).astype(np.uint32).astype(np.int32)
    values[off + 12] = f["status_code"]
    values[off + 13] = f["span_kind"]

    # string payloads: small fixed vocab -> one vectorized fill per name
    for idx_col, payloads, extra in (
        ("service_idx", svc_payloads, np.zeros(n, np.int64)),
        ("operation_idx", op_payloads, svc_len[f["service_idx"]]),
    ):
        for i, payload in enumerate(payloads):
            rows = np.nonzero(f[idx_col] == i)[0]
            if len(rows) == 0:
                continue
            pos = (off[rows] + HDR + extra[rows])[:, None] + np.arange(len(payload))
            values[pos] = payload

    return pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(values, pa.int32())
    )


def fields_to_oracle_table(f: dict[str, np.ndarray], doc_id: np.ndarray,
                           source: np.ndarray) -> pa.Table:
    """Decoded-span truth table, derived from fields (never from tokens)."""
    import binascii

    raw = f["parent_words"].astype(">u4").tobytes()
    hexed = binascii.hexlify(raw).upper()
    n_rows = len(f["is_root"])
    offsets = np.arange(0, (n_rows + 1) * 16, 16, dtype=np.int32)
    mask = np.packbits(~f["is_root"], bitorder="little")
    parent = pa.Array.from_buffers(
        pa.string(),
        n_rows,
        [pa.py_buffer(mask.tobytes()), pa.py_buffer(offsets.tobytes()),
         pa.py_buffer(hexed)],
        null_count=int(f["is_root"].sum()),
    )
    services = np.array(SPAN_SERVICES)
    operations = np.array(SPAN_OPERATIONS)
    return pa.table(
        {
            "doc_id": pa.array(doc_id, pa.string()),
            "trace_id": pa.array(_hex_upper(f["trace_words"]), pa.string()),
            "span_id": pa.array(_hex_upper(f["span_words"]), pa.string()),
            "parent_span_id": parent,
            "timestamp_ms": pa.array(f["timestamp_ms"], pa.int64()),
            "duration_ms": pa.array(f["duration_ms"], pa.int64()),
            "status_code": pa.array(f["status_code"], pa.int32()),
            "span_kind": pa.array(f["span_kind"], pa.int32()),
            "service_name": pa.array(services[f["service_idx"]], pa.string()),
            "operation_name": pa.array(operations[f["operation_idx"]], pa.string()),
            "source": pa.array(source, pa.string()),
        }
    )


def generate_dataset(spec: GenSpec, out_dir: str) -> dict[str, str]:
    """Write tokenized/ (sharded parquet dir) + spans_oracle.parquet.

    Idempotent: skips work if the marker file for this spec already exists.
    Generation is chunked by SPAN count so arbitrarily large specs neither
    overflow int32 list offsets (~2^31 token values per ListArray) nor
    allocate giant buffers (first-touch page faults are pathologically slow
    in this sandbox). Field values are identical to a single-pass generation:
    the whole per-trace/per-span plan is drawn up front (cheap scalars), only
    the token/row materialization is chunked.
    """
    paths = {
        "tokenized": os.path.join(out_dir, "tokenized"),  # sharded directory
        "oracle": os.path.join(out_dir, "spans_oracle.parquet"),
    }
    marker = os.path.join(out_dir, "_SPEC.json")
    if os.path.exists(marker):
        with open(marker) as fh:
            if json.load(fh) == asdict(spec):
                return paths
    os.makedirs(out_dir, exist_ok=True)

    f_all = generate_fields(spec)
    n = len(f_all["timestamp_ms"])
    doc_id_all = np.char.add(
        "span-", np.char.zfill(np.arange(n).astype("U12"), 12)
    )
    source_all = np.char.add(
        "svc-", np.char.zfill(f_all["service_idx"].astype("U2"), 2)
    )

    tok_dir = paths["tokenized"]
    if os.path.isdir(tok_dir):  # stale shards from a different spec
        import shutil

        shutil.rmtree(tok_dir)
    os.makedirs(tok_dir, exist_ok=True)
    n_files = max(8, min(256, n // 150_000))
    rows_per = (n + n_files - 1) // n_files

    oracle_writer = None
    for i in range(n_files):
        lo = i * rows_per
        if lo >= n:
            break
        hi = min(lo + rows_per, n)
        sl = slice(lo, hi)
        f = {k: v[sl] for k, v in f_all.items()}
        tokens = build_token_arrays(f)
        offs = tokens.offsets.to_numpy()
        tokenized = pa.table(
            {
                "doc_id": pa.array(doc_id_all[sl], pa.string()),
                "tokens": tokens,
                "n_tok": pa.array((offs[1:] - offs[:-1]).astype(np.int32)),
                "source": pa.array(source_all[sl], pa.string()),
            }
        )
        pq.write_table(
            tokenized,
            os.path.join(tok_dir, f"part-{i:04d}.parquet"),
            row_group_size=spec.row_group_rows,
        )
        oracle_tbl = fields_to_oracle_table(f, doc_id_all[sl], source_all[sl])
        if oracle_writer is None:
            oracle_writer = pq.ParquetWriter(paths["oracle"], oracle_tbl.schema)
        oracle_writer.write_table(oracle_tbl, row_group_size=131072)
    if oracle_writer is not None:
        oracle_writer.close()

    with open(marker, "w") as fh:
        json.dump(asdict(spec), fh)
    return paths


# --- sf-keyed cache used by __spark_entry__ / bench -------------------------

def _default_data_root() -> str:
    """Writable dataset cache. ``__file__``-relative breaks when the package
    ships as a --py-files zip, so: env override > repo checkout > cwd."""
    env = os.environ.get("OTEL_TSS_DATA_ROOT")
    if env:
        return env
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if os.path.isdir(pkg_root) and not pkg_root.endswith(".zip"):
        return os.path.join(pkg_root, ".data")
    return os.path.join(os.getcwd(), ".data")


DATA_ROOT = _default_data_root()

SF_SPECS = {
    # ~6k / 60k / 600k spans, mirroring lineitem row counts per TESTDATA.md
    "0.001": GenSpec(n_traces=1_200),
    "0.01": GenSpec(n_traces=12_000),
    "0.1": GenSpec(n_traces=120_000),
    # bench variants with the load_simulation heavy-hitter shape
    "bench0.1": GenSpec(n_traces=118_000, heavy_frac=0.01, heavy_spans=2000),
    "bench0.4": GenSpec(n_traces=472_000, heavy_frac=0.01, heavy_spans=2000),
    "bench1.6": GenSpec(n_traces=1_888_000, heavy_frac=0.01, heavy_spans=2000),
}


def sf_from_dir(sf_dir: str) -> str:
    """'/root/testdata/sf0.01' -> '0.01' (defaults to 0.01 when unparseable)."""
    base = os.path.basename(sf_dir.rstrip("/"))
    return base[2:] if base.startswith("sf") else "0.01"


def ensure_dataset(sf: str) -> dict[str, str]:
    if sf not in SF_SPECS:
        # a silent default once corrupted a dataset by overwriting part files
        # with a smaller spec — unknown scales are an error
        raise KeyError(f"unknown sf {sf!r}; known: {sorted(SF_SPECS)}")
    out_dir = os.path.join(DATA_ROOT, f"sf{sf}")
    return generate_dataset(SF_SPECS[sf], out_dir)

"""Local replica of the driver's DuckDB-oracle comparison.

Runs every __spark_entry__.queries() entry at sf0.01 next to its
oracle_sql() DuckDB query (testdata tables pre-registered as views, same as
the driver), and compares row count, column names, and an order-insensitive
value hash (floats canonicalized to 9 significant digits).

Usage: python scripts/check_oracles.py [name ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.01"


def canon(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


_SPARK_TO_CANON = {
    "tinyint": "int8", "smallint": "int16", "int": "int32",
    "bigint": "int64", "float": "float32", "double": "float64",
    "string": "string", "boolean": "bool", "date": "date",
    "timestamp": "timestamp", "binary": "binary",
}


def spark_canon_types(sdf) -> dict[str, str]:
    out = {}
    for f in sdf.schema.fields:
        s = f.dataType.simpleString()
        if s.startswith("decimal"):
            out[f.name] = "decimal"
        elif s.startswith(("array", "map", "struct")):
            out[f.name] = s.split("<")[0]
        else:
            out[f.name] = _SPARK_TO_CANON.get(s, s)
    return out


def arrow_canon_types(tbl) -> dict[str, str]:
    import pyarrow as pa

    out = {}
    for field in tbl.schema:
        t = field.type
        if pa.types.is_decimal(t):
            out[field.name] = "decimal"
        elif pa.types.is_timestamp(t):
            out[field.name] = "timestamp"
        elif pa.types.is_date(t):
            out[field.name] = "date"
        elif pa.types.is_large_string(t) or pa.types.is_string(t):
            out[field.name] = "string"
        elif pa.types.is_list(t) or pa.types.is_large_list(t):
            out[field.name] = "array"
        elif pa.types.is_boolean(t):
            out[field.name] = "bool"
        elif pa.types.is_float64(t):
            out[field.name] = "float64"
        elif pa.types.is_float32(t):
            out[field.name] = "float32"
        else:
            out[field.name] = str(t)
    return out


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def driver_canon_probe(cols: list[str], rows: list[tuple]) -> str | None:
    """Replicate the DRIVER's canonicalization (pandas.sort_values over all
    columns) so a query that would ERR in CORRECTNESS_r{N}.json fails HERE
    first. The driver factorizes each column to sort it; list/dict values
    raise ``unhashable type`` there — exactly the r3 failure mode this
    script used to paper over by stringifying values before sorting.
    Returns an error string if the driver would fail, else None."""
    import pandas as pd

    try:
        pdf = pd.DataFrame(rows, columns=cols)
        pdf.sort_values(by=sorted(cols))
    except Exception as ex:  # the driver records this as err, no comparison
        return f"driver canonicalization would fail: {type(ex).__name__}: {ex}"
    return None


def main() -> int:
    import __spark_entry__ as E
    from otel_tail_sampler_spark.session import build_session

    only = set(sys.argv[1:])
    spark = build_session(app_name="oracle-check", master="local[8]",
                          shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs, os_ = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            stypes = spark_canon_types(sdf)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures.append(name)
            continue
        if name not in os_:
            probe = driver_canon_probe(scols, srows)
            if probe:
                print(f"WARN {name}: rows-only, but {probe}")
            print(f"SKIP {name}: rows-only ({len(srows)} rows) "
                  f"[{time.time() - t0:.1f}s]")
            continue
        try:
            res = con.execute(os_[name])
            atbl = res.fetch_arrow_table()
            ocols = atbl.schema.names
            otypes = arrow_canon_types(atbl)
            orows = [tuple(r.values()) for r in atbl.to_pylist()]
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {str(ex)[:300]}")
            failures.append(name)
            continue
        problems = []
        probe = driver_canon_probe(scols, srows)
        if probe:
            problems.append(probe)
        tmis = {c: (stypes[c], otypes[c]) for c in stypes
                if c in otypes and stypes[c] != otypes[c]}
        if tmis:
            problems.append(f"type mismatch {tmis}")
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        elif value_hash(scols, srows) != value_hash(ocols, orows):
            problems.append("value hash mismatch")
            # show a sample diff
            so = {("\x01".join(canon(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i]))) for r in srows}
            oo = {("\x01".join(canon(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i]))) for r in orows}
            only_s = list(so - oo)[:2]
            only_o = list(oo - so)[:2]
            problems.append(f"spark-only={only_s} oracle-only={only_o}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} [{time.time() - t0:.1f}s]")
            failures.append(name)
        else:
            print(f"OK   {name}: {len(srows)} rows [{time.time() - t0:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

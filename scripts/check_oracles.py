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


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


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
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures.append(name)
            continue
        if name not in os_:
            print(f"SKIP {name}: rows-only ({len(srows)} rows) "
                  f"[{time.time() - t0:.1f}s]")
            continue
        try:
            res = con.execute(os_[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {str(ex)[:300]}")
            failures.append(name)
            continue
        problems = []
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

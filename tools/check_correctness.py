"""Dev harness mimicking the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() twin on
DuckDB at the given sf, compare row count, column names, and
order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # Integral floats keep their ".0" so a DuckDB HUGEINT materialized
        # as float64 can NOT silently equal a Spark bigint (the round-1
        # dev-gate/driver-gate divergence: 3.0 vs 3 hashed differently in
        # the driver but printed identically here under %.6g).
        if v == int(v) and abs(v) < 1e15:
            return repr(v)
        return f"{v:.6g}"
    return str(v)


def frame_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(norm_cell(r[i]) for i in order) for r in rows
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from ocr_spark.session import get_spark

    spark = get_spark(8, app_name="check-correctness")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(exc).__name__}: {str(exc)[:300]}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows, cols={scols} ({time.time()-t0:.1f}s) [rows-only]")
            if len(srows) == 0:
                failures.append(name)
                print(f"FAIL  {name}: 0 rows")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {str(exc)[:300]}")
            continue
        ok_count = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        ok_vals = ok_count and ok_cols and frame_key(srows, scols) == frame_key(drows, dcols)
        status = "OK  " if (ok_count and ok_cols and ok_vals) else "FAIL"
        print(
            f"{status}  {name}: spark={len(srows)} duck={len(drows)} "
            f"cols={'=' if ok_cols else f'{sorted(scols)} vs {sorted(dcols)}'} "
            f"vals={'=' if ok_vals else 'MISMATCH'} ({time.time()-t0:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if ok_count and ok_cols:
                a = frame_key(srows, scols)
                b = frame_key(drows, dcols)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diffs:
                    print(f"      spark {x}\n      duck  {y}")
    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

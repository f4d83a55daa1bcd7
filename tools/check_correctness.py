"""Dev harness mimicking the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() twin on
DuckDB at the given sf, compare row count, column names, and
order-insensitive values.

Usage: python tools/check_correctness.py [--json out.json] [sf_dir] [only_query ...]

--json writes the per-query result map (driver CORRECTNESS format plus a
mode field) — the round-end flow uses it to commit CHECK_FULL_r{N}.json,
the full-board artifact the judge asked for (the driver samples ~50 of
the board; this records all of it).
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
    import json

    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

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
    report: dict[str, dict] = {}
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
            report[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None, "oracle_rows": None,
                "err": f"{type(exc).__name__}: {str(exc)[:300]}",
                "mode": "error",
            }
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows, cols={scols} ({time.time()-t0:.1f}s) [rows-only]")
            report[name] = {
                "rows_match": len(srows) > 0, "schema_match": True,
                "hash_match": None, "spark_rows": len(srows),
                "oracle_rows": None, "err": None, "mode": "rows_only",
            }
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
            report[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(srows),
                "oracle_rows": None,
                "err": f"duckdb: {str(exc)[:300]}", "mode": "oracle",
            }
            continue
        ok_count = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        ok_vals = ok_count and ok_cols and frame_key(srows, scols) == frame_key(drows, dcols)
        status = "OK  " if (ok_count and ok_cols and ok_vals) else "FAIL"
        report[name] = {
            "rows_match": ok_count, "schema_match": ok_cols,
            "hash_match": ok_vals, "spark_rows": len(srows),
            "oracle_rows": len(drows), "err": None, "mode": "oracle",
        }
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
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(report),
                    "n_failures": len(failures),
                    "failures": failures,
                    "queries": report,
                },
                fh,
                indent=1,
            )
        print(f"wrote {json_out}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

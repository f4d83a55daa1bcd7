#!/usr/bin/env python
"""Synthesize a deterministic sf1-scale table set (10x sf0.1) under /tmp.

The driver ships testdata up to sf0.1; the data-size scaling evidence
(BASELINE.md) needs one more order of magnitude.  No external data is
allowed, so sf1 is tiled from the driver's own sf0.1 parquet with
key-offset copies (foreign keys stay consistent: every key column of
copy k gets k * <table constant> added, the same constant on both sides
of each FK).  Documents get a per-copy word-marker rewrite ("a b" ->
"a c3b" in copy 3) so copies are NOT cross-copy near-duplicates: pair
cardinalities scale linearly with corpus size, like real web corpora,
instead of quadratically via 10 identical clones.  Embeddings keep
their vectors (vec_id-offset copies; the ANN probe set and codebook
training slice vec_id < 2*PQ_K stay the originals).

Deterministic: pure SQL over the input parquet, no randomness.

Usage: python tools/make_sf1.py [src_sf_dir] [out_dir] [copies]
       (defaults: /root/testdata/sf0.1 /tmp/sf1 10)
"""

from __future__ import annotations

import os
import sys

import duckdb

C, S, P, O, E, U, D, V = (
    10_000_000,  # custkey
    1_000_000,  # suppkey
    10_000_000,  # partkey
    100_000_000,  # orderkey
    100_000_000,  # event_id
    10_000_000,  # user_id
    1_000_000,  # doc_id
    1_000_000,  # vec_id
)


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE ks AS SELECT unnest(range({copies})) AS k")

    def emit(table: str, select_sql: str) -> None:
        con.execute(
            f"COPY ({select_sql}) TO '{out}/{table}.parquet'"
            " (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n}")

    def rp(t: str) -> str:
        return f"read_parquet('{src}/{t}.parquet')"

    # dims: single copy
    emit("region", f"SELECT * FROM {rp('region')}")
    emit("nation", f"SELECT * FROM {rp('nation')}")
    emit(
        "customer",
        f"SELECT * EXCLUDE (k) REPLACE (c_custkey + k * {C} AS c_custkey)"
        f" FROM {rp('customer')}, ks",
    )
    emit(
        "supplier",
        f"SELECT * EXCLUDE (k) REPLACE (s_suppkey + k * {S} AS s_suppkey)"
        f" FROM {rp('supplier')}, ks",
    )
    emit(
        "part",
        f"SELECT * EXCLUDE (k) REPLACE (p_partkey + k * {P} AS p_partkey)"
        f" FROM {rp('part')}, ks",
    )
    emit(
        "orders",
        f"SELECT * EXCLUDE (k) REPLACE (o_orderkey + k * {O} AS o_orderkey,"
        f" o_custkey + k * {C} AS o_custkey)"
        f" FROM {rp('orders')}, ks",
    )
    emit(
        "lineitem",
        f"SELECT * EXCLUDE (k) REPLACE (l_orderkey + k * {O} AS l_orderkey,"
        f" l_partkey + k * {P} AS l_partkey,"
        f" l_suppkey + k * {S} AS l_suppkey)"
        f" FROM {rp('lineitem')}, ks",
    )
    emit(
        "events",
        f"SELECT * EXCLUDE (k) REPLACE (event_id + k * {E} AS event_id,"
        f" user_id + k * {U} AS user_id)"
        f" FROM {rp('events')}, ks",
    )
    emit(
        "documents",
        f"""SELECT * EXCLUDE (k) REPLACE (doc_id + k * {D} AS doc_id,
                   CASE WHEN k = 0 THEN text
                        ELSE replace(text, ' ', ' c' || k) END AS text,
                   CAST(length(CASE WHEN k = 0 THEN text
                        ELSE replace(text, ' ', ' c' || k) END) AS BIGINT)
                     AS n_chars)
            FROM {rp('documents')}, ks""",
    )
    emit(
        "embeddings",
        f"SELECT * EXCLUDE (k) REPLACE (vec_id + k * {V} AS vec_id)"
        f" FROM {rp('embeddings')}, ks",
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Mini-driver: run every queries() entry against its oracle_sql() in
DuckDB at sf0.01 and compare row count, schema arity, and an
order-insensitive value hash — a local stand-in for the real driver's
CORRECTNESS_r{N}.json gate.

Usage: python selfcheck.py [--sf DIR] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
import time

import duckdb

import __spark_entry__ as entry_mod

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(x) -> str:
    if x is None:
        return "NULL"
    if isinstance(x, float):
        if math.isnan(x):
            return "NaN"
        if x == int(x) and abs(x) < 1e15:
            return str(int(x))
        return repr(x)
    if isinstance(x, bool):
        return str(int(x))
    return str(x)


def table_hash(rows, colnames) -> tuple[str, int]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return h, len(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from tsdb_spark.session import get_spark

    spark = get_spark("selfcheck")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.names or list(qs)
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, args.sf)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            s_hash, s_n = table_hash(rows, cols)
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({s_n} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
            o_hash, o_n = table_hash(o_rows, o_cols)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        status = []
        if sorted(cols) != sorted(o_cols):
            status.append(f"schema spark={sorted(cols)} oracle={sorted(o_cols)}")
        if s_n != o_n:
            status.append(f"rows spark={s_n} oracle={o_n}")
        if s_hash != o_hash:
            status.append(f"hash spark={s_hash} oracle={o_hash}")
        if status:
            print(f"FAIL {name}: " + "; ".join(status))
            failures += 1
            # print a small diff sample to debug
            sset = {tuple(map(norm_cell, r)) for r in rows}
            oset = {tuple(map(norm_cell, r)) for r in o_rows}
            for label, diff in (("spark-only", sset - oset), ("oracle-only", oset - sset)):
                for r in list(diff)[:3]:
                    print(f"    {label}: {r}")
        else:
            print(f"ok   {name}: {s_n} rows match ({time.time()-t0:.1f}s)")
    print(f"{len(names) - failures}/{len(names)} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

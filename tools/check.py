#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the corresponding oracle SQL in DuckDB
over the same sf directory and compare (row count, column names, values).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Dev tool only — the shipped Scala library does not depend on this.
"""
import json
import math
import sys
from pathlib import Path

import duckdb


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # match driver-style value hashing tolerance: repr of float
        return repr(v)
    return repr(v)


def table_key(cols, rows):
    # sort columns by name, then rows lexicographically
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = Path(sf_dir, f"{t}.parquet")
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir, name)
        if not res_dir.exists():
            print(f"FAIL {name}: no spark result dir")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            want = con.execute(sql)
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        gc, gr = table_key(got_cols, got_rows)
        wc, wr = table_key(want_cols, want_rows)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            n_fail += 1
        elif len(gr) != len(wr):
            print(f"FAIL {name}: rows {len(gr)} != {len(wr)}")
            n_fail += 1
        elif gr != wr:
            bad = next(i for i in range(len(gr)) if gr[i] != wr[i])
            print(f"FAIL {name}: first diff row {bad}:\n  spark={gr[bad]}\n  duck ={wr[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

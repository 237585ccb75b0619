#!/usr/bin/env python3
"""Local replica of the driver's correctness gate — STRICT variant.

Usage: python3 tools/check.py <verify_out_dir> [sf_dir]

Reads each <name>/ parquet result written by graft.Verify (via pyarrow,
like the driver — preserving Decimal/date objects), runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same sf_dir tables,
sorts columns by name + rows by stringified cells, and compares cell
strings EXACTLY (the driver hashes canonicalized values, so a repr-level
difference like 123.40 vs 123.4 or 5 vs 5.0 is a real failure).
Array/struct cells are JSON-serialized before sorting so they participate
in the compare. Exit 0 iff everything matches.
"""
import json, math, sys
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def cell_str(v):
    """Canonical string for a cell: stable across int widths, JSON for
    containers; everything else via str()."""
    if v is None:
        return "<null>"
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple, dict)):
        try:
            return json.dumps(v, sort_keys=True, default=str)
        except Exception:
            return str(v)
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (np.floating,)):
        f = float(v)
        return "NaN" if math.isnan(f) else repr(f)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, (int, np.bool_, bool)):
        return str(v)
    try:
        if v != v:  # NaT / NaN-ish
            return "<null>"
    except Exception:
        pass
    return str(v)

def canon(df):
    df = df[sorted(df.columns)]
    sdf = df.map(cell_str) if hasattr(df, "map") else df.applymap(cell_str)
    order = sdf.sort_values(by=list(sdf.columns)).index
    return sdf.loc[order].reset_index(drop=True)

def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = n_noracle = 0
    fails = []
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({str(e)[:80]})")
            n_fail += 1; fails.append(name); continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1; fails.append(name); continue
        try:
            g, e = canon(got), canon(exp)
        except Exception as ex:
            print(f"FAIL {name}: canon error: {str(ex)[:200]}")
            n_fail += 1; fails.append(name); continue
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            n_fail += 1; fails.append(name); continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_fail += 1; fails.append(name); continue
        bad = None
        for col in g.columns:
            gv, ev = list(g[col]), list(e[col])
            for i, (a, b) in enumerate(zip(gv, ev)):
                if a != b:
                    bad = (col, i, a, b); break
            if bad: break
        if bad:
            col, i, a, b = bad
            print(f"FAIL {name}: strict mismatch col={col} row={i}: spark={a!r} oracle={b!r}")
            n_fail += 1; fails.append(name)
        else:
            n_pass += 1
    # queries with no oracle → rows-only info
    import os
    for d in sorted(os.listdir(out_dir)):
        if os.path.isdir(f"{out_dir}/{d}") and d not in oracle and (not only or d in only):
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{out_dir}/{d}/*.parquet')").fetchone()[0]
            print(f"INFO {d}: no oracle, rows={n}")
            n_noracle += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    if fails:
        print("failed:", " ".join(fails))
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

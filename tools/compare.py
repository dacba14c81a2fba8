#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read the Spark parquet result,
run the oracle SQL from oracle_sql.json in DuckDB against the sfDir
tables, sort columns by name, sort rows, and compare values.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df):
    # sort columns by name (row order handled later via sorted reprs)
    return df[sorted(df.columns)]

def canon(v):
    import math
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    try:
        import numpy as np
        if isinstance(v, np.ndarray):
            return tuple(canon(x) for x in v.tolist())
        if isinstance(v, (np.integer,)): return int(v)
        if isinstance(v, (np.floating,)): return canon(float(v))
    except ImportError:
        pass
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    only = sys.argv[3:] or None
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir): continue
        if only and name not in only: continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); failures += 1; continue
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").df()
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(got)} rows)"); continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); failures += 1; continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: cols {list(g.columns)} vs {list(e.columns)}"); failures += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); failures += 1; continue
        gv = [tuple(canon(x) for x in r) for r in g.itertuples(index=False)]
        ev = [tuple(canon(x) for x in r) for r in e.itertuples(index=False)]
        # compare as sorted multisets (canon may change sort order)
        if sorted(map(repr, gv)) != sorted(map(repr, ev)):
            bad = [(a, b) for a, b in zip(sorted(map(repr,gv)), sorted(map(repr,ev))) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}"); failures += 1; continue
        # schema dtype check (loose): pandas dtypes equal
        dt_g, dt_e = list(map(str, g.dtypes)), list(map(str, e.dtypes))
        flag = "" if dt_g == dt_e else f"  [dtype diff {dt_g} vs {dt_e}]"
        print(f"OK   {name} ({len(g)} rows){flag}")
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()

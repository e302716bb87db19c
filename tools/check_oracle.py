#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: run each oracle SQL in
DuckDB against the same parquet tables and compare to the Spark result dumped
by graft.Verify (rows, schema, values — rows/columns sorted first).

Usage: check_oracle.py [sf_dir] [verify_out_dir]
"""
import sys, json, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    failures = 0
    import glob
    names = sorted(set(list(oracle.keys()) + [p.split("/")[-1] for p in glob.glob(f"{out}/*") if not p.endswith(".json")]))
    for name in names:
        try:
            sdf = pd.read_parquet(f"{out}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); failures += 1; continue
        if name not in oracle:
            print(f"ROWS-ONLY {name}: rows={len(sdf)}" + (" (EMPTY!)" if len(sdf) == 0 else ""))
            if len(sdf) == 0: failures += 1
            continue
        try:
            ddf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e)[:200]}"); failures += 1; continue
        s, d = canon(sdf), canon(ddf)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}"); failures += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}"); failures += 1; continue
        bad = []
        for c in s.columns:
            a, b = s[c], d[c]
            try:
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    an, bn = a.astype(float), b.astype(float)
                    neq = ~((an == bn) | (an.isna() & bn.isna()))
                    if neq.any():
                        i = neq.idxmax()
                        bad.append(f"{c}: {neq.sum()} diffs, e.g. [{i}] {an[i]!r} vs {bn[i]!r}, maxabs={abs(an[neq]-bn[neq]).abs().max():.3e}")
                else:
                    av = a.astype(object).where(pd.notna(a), None).tolist()
                    bv = b.astype(object).where(pd.notna(b), None).tolist()
                    diffs = [i for i, (x, y) in enumerate(zip(av, bv)) if x != y]
                    if diffs:
                        i = diffs[0]
                        bad.append(f"{c}: {len(diffs)} diffs, e.g. [{i}] {av[i]!r} vs {bv[i]!r}")
            except Exception as e:
                bad.append(f"{c}: compare error {e}")
        if bad:
            print(f"FAIL {name}: rows={len(s)} " + " | ".join(bad)); failures += 1
        else:
            print(f"PASS {name}: rows={len(s)}")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()

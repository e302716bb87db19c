#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: run each oracle SQL in
DuckDB against the same parquet tables and compare to the Spark result dumped
by graft.Verify (rows, schema, values — rows/columns sorted first).

Strictness notes: float columns carry explicit null masks extracted from the
arrow representation, so a Spark NaN is NOT considered equal to an oracle
NULL (pandas alone cannot tell them apart); two genuine NaNs are equal.

Usage: check_oracle.py [sf_dir] [verify_out_dir]
"""
import sys, json, glob
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as paq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def to_frame(tbl: pa.Table) -> pd.DataFrame:
    """pandas frame + explicit __null_<col> masks for float columns."""
    df = tbl.to_pandas()
    for name in tbl.column_names:
        col = tbl.column(name)
        if pa.types.is_floating(col.type):
            df[f"__null_{name}"] = pc.is_null(col).to_pandas().to_numpy()
    return df

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(by=list(df.columns), ignore_index=True, na_position="last")

def compare(name, s, d):
    bad = []
    if list(s.columns) != list(d.columns):
        return [f"columns {list(s.columns)} vs {list(d.columns)}"]
    if len(s) != len(d):
        return [f"rows {len(s)} vs {len(d)}"]
    for c in s.columns:
        a, b = s[c], d[c]
        if c.startswith("__null_"):
            continue  # masks are checked with their float column
        # A kind mismatch (e.g. Spark BIGINT vs an uncast DuckDB HUGEINT
        # arriving as float64) hash-mismatches in the driver's gate even
        # when coerced values agree — flag it instead of coercing past it.
        if a.dtype.kind != b.dtype.kind and {a.dtype.kind, b.dtype.kind} & {'f'}:
            bad.append(f"{c}: dtype kind {a.dtype} (spark) vs {b.dtype} (oracle) — "
                       f"cast the oracle column (sum() returns HUGEINT)")
            continue
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            an = a.astype(float).to_numpy()
            bn = b.astype(float).to_numpy()
            mask_c = f"__null_{c}"
            na = s[mask_c].to_numpy() if mask_c in s.columns else np.isnan(an)
            nb = d[mask_c].to_numpy() if mask_c in d.columns else np.isnan(bn)
            both_nan = np.isnan(an) & np.isnan(bn) & ~na & ~nb
            eq = (na == nb) & (na | both_nan | (an == bn))
            if not eq.all():
                i = int(np.argmin(eq))
                diffs = int((~eq).sum())
                av = "NULL" if na[i] else repr(an[i])
                bv = "NULL" if nb[i] else repr(bn[i])
                bad.append(f"{c}: {diffs} diffs, e.g. [{i}] {av} vs {bv}")
        else:
            av = a.astype(object).where(pd.notna(a), None).tolist()
            bv = b.astype(object).where(pd.notna(b), None).tolist()
            diffs = [i for i, (x, y) in enumerate(zip(av, bv)) if x != y]
            if diffs:
                i = diffs[0]
                bad.append(f"{c}: {len(diffs)} diffs, e.g. [{i}] {av[i]!r} vs {bv[i]!r}")
    return bad

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    failures = 0
    names = sorted(set(list(oracle.keys()) +
                       [p.split("/")[-1] for p in glob.glob(f"{out}/*") if not p.endswith(".json")]))
    for name in names:
        try:
            stbl = paq.read_table(f"{out}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); failures += 1; continue
        if name not in oracle:
            n = stbl.num_rows
            print(f"ROWS-ONLY {name}: rows={n}" + (" (EMPTY!)" if n == 0 else ""))
            if n == 0: failures += 1
            continue
        try:
            dtbl = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e)[:200]}"); failures += 1; continue
        try:
            bad = compare(name, canon(to_frame(stbl)), canon(to_frame(dtbl)))
        except Exception as e:
            bad = [f"compare error: {e}"]
        if bad:
            print(f"FAIL {name}: rows={stbl.num_rows} " + " | ".join(bad)); failures += 1
        else:
            print(f"PASS {name}: rows={stbl.num_rows}")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()

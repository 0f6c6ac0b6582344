#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev loop only; the
library itself has no Python). Usage:
    python3 tools/check_oracle.py <outDir> <sfDir>
Reads each <outDir>/<name>/ parquet written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the sfDir
parquet tables, and compares as multisets (columns sorted by name, rows
sorted, values stringified with float rounding)."""
import sys, json, glob, os
import duckdb, pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame, float_cols) -> pd.DataFrame:
    """Stringify values column-wise. Float rounding (%.6g) applies ONLY to
    columns that are float on the SPARK side (float_cols): when the oracle
    widens an integer column (DuckDB HUGEINT -> pandas float64) the raw
    str() keeps the trailing '.0' so the mismatch is FLAGGED, matching the
    driver's behavior, instead of masked (the r8 q66 lesson)."""
    df = df.reindex(sorted(df.columns), axis=1)
    def norm_for(col):
        def f(v):
            if isinstance(v, float) and col in float_cols:
                return f"{v:.6g}"
            return str(v)
        return f
    out = pd.DataFrame({c: df[c].map(norm_for(c)) for c in df.columns})
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else None
        if name not in oracle:
            status = f"rows-only ({len(got)} rows)" if got is not None else "MISSING OUTPUT"
            print(f"  {name:28s} {status}")
            continue
        if got is None:
            print(f"  {name:28s} MISSING OUTPUT (oracle present, no parquet)")
            n_fail += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"  {name:28s} ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        float_cols = {c for c in got.columns
                      if pd.api.types.is_float_dtype(got[c])}
        g, e_ = canon(got, float_cols), canon(exp, float_cols)
        if list(g.columns) != list(e_.columns):
            print(f"  {name:28s} SCHEMA MISMATCH spark={list(g.columns)} oracle={list(e_.columns)}")
            n_fail += 1
        elif len(g) != len(e_):
            print(f"  {name:28s} ROWCOUNT {len(g)} vs {len(e_)}")
            n_fail += 1
        elif not g.equals(e_):
            diff = (g != e_).any(axis=1)
            i = diff.idxmax()
            print(f"  {name:28s} VALUE MISMATCH first at row {i}:\n    spark : {g.loc[i].to_dict()}\n    oracle: {e_.loc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"  {name:28s} OK ({len(g)} rows)")
            n_pass += 1
    print(f"PASS {n_pass} FAIL {n_fail}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

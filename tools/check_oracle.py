#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run graft.Verify output
against the DuckDB oracle SQL and compare per-query (rows, schema, values).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: tz-aware -> naive UTC, float rounding for display
    import datetime
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_convert('UTC').dt.tz_localize(None)
            except Exception:
                pass
        elif df[c].dtype == object and df[c].map(lambda v: isinstance(v, datetime.date)).all() and len(df):
            # pyarrow date32 -> datetime.date objects; normalize to datetime64
            df[c] = pd.to_datetime(df[c])
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def compare(name, spark_df, oracle_df):
    issues = []
    if len(spark_df) != len(oracle_df):
        issues.append(f"rows: spark={len(spark_df)} oracle={len(oracle_df)}")
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        issues.append(f"cols: spark={sc} oracle={oc}")
        return issues
    s, o = canon(spark_df), canon(oracle_df)
    if len(s) == len(o):
        for c in s.columns:
            a, b = s[c], o[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                bad = ~(np.isclose(a.astype(float), b.astype(float), rtol=0, atol=1e-12, equal_nan=True))
            else:
                bad = ~((a == b) | (a.isna() & b.isna()))
            if bad.any():
                i = bad.idxmax()
                issues.append(f"col {c}: {int(bad.sum())} diffs, first@{i}: spark={a[i]!r} oracle={b[i]!r}")
    # dtype check (schema-match proxy); datetime64 precision and date-object
    # representations vary by pandas conversion path, not by parquet schema
    def dt_like(x):
        return pd.api.types.is_datetime64_any_dtype(x) or x.dtype == object
    for c in s.columns:
        if str(s[c].dtype) != str(o[c].dtype) and not (dt_like(s[c]) and dt_like(o[c])):
            issues.append(f"dtype {c}: spark={s[c].dtype} oracle={o[c].dtype}")
    return issues

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        pdir = f"{out_dir}/{name}"
        if not glob.glob(f"{pdir}/*.parquet"):
            print(f"FAIL {name}: no spark output"); fail += 1; continue
        try:
            spark_df = pq.read_table(pdir).to_pandas()
        except Exception as e:
            print(f"FAIL {name}: read spark output: {e}"); fail += 1; continue
        try:
            oracle_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}"); fail += 1; continue
        issues = compare(name, spark_df, oracle_df)
        if issues:
            print(f"FAIL {name}: " + " | ".join(issues[:4])); fail += 1
        else:
            print(f"OK   {name} ({len(spark_df)} rows)"); ok += 1
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()

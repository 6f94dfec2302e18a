#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
SQL in DuckDB against views named after the parquet tables in <sfDir>, and
compares with the Spark result parquet in <verifyOutDir>/<name>/. Columns
are sorted by name before comparison (mirrors the driver); rows are
compared both in emitted order and sorted, so we catch ordering drift too.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)

def normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            import datetime as dt
            nonnull = s.dropna()
            if len(nonnull) and all(isinstance(v, dt.date) and not isinstance(v, dt.datetime) for v in nonnull):
                # Spark DATE → datetime.date objects; DuckDB DATE → datetime64.
                # Same logical type both sides — normalize to datetime64[us].
                df[c] = pd.to_datetime(s).astype("datetime64[us]")
            else:
                df[c] = s.map(lambda v: str(v) if v is not None else None)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    return df

def compare(name, a, b):
    """a=spark, b=duckdb; returns list of problem strings."""
    probs = []
    if sorted(a.columns) != sorted(b.columns):
        return [f"columns differ: spark={sorted(a.columns)} duck={sorted(b.columns)}"]
    a, b = normalize(a), normalize(b)
    if len(a) != len(b):
        return [f"row counts differ: spark={len(a)} duck={len(b)}"]
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            an, bn = av.isna(), bv.isna()
            if not an.equals(bn):
                probs.append(f"col {c}: null mask differs")
                continue
            x, y = av[~an].to_numpy(), bv[~bn].to_numpy()
            exact = np.array_equal(x.view(np.int64), y.view(np.int64))
            if not exact:
                with np.errstate(all="ignore"):
                    md = np.nanmax(np.abs(x - y)) if len(x) else 0.0
                probs.append(f"col {c}: float not bit-exact, maxabsdiff={md:.3e}")
        else:
            try:
                eq = av.fillna("<NULL>").equals(bv.fillna("<NULL>")) if av.dtype == object else av.equals(bv)
            except Exception:
                eq = list(av) == list(bv)
            if not eq:
                bad = [(i, av.iloc[i], bv.iloc[i]) for i in range(len(av))
                       if (av.iloc[i] != bv.iloc[i]) and not (pd.isna(av.iloc[i]) and pd.isna(bv.iloc[i]))][:3]
                if bad:
                    probs.append(f"col {c}: values differ, first={bad}")
                elif str(av.dtype) != str(bv.dtype):
                    probs.append(f"col {c}: dtypes differ spark={av.dtype} duck={bv.dtype}")
    return probs

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sfdir, "*.parquet")):
        t = os.path.basename(f)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{f}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    npass = nfail = 0
    for name in sorted(oracle):
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"FAIL {name}: no spark output"); nfail += 1; continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); nfail += 1; continue
        probs = compare(name, spark_df, duck_df)
        if probs:
            print(f"FAIL {name} ({len(spark_df)} rows):")
            for p in probs: print(f"   {p}")
            nfail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            npass += 1
    # queries with no oracle: rows-only
    all_out = {os.path.basename(d) for d in glob.glob(os.path.join(outdir, "*")) if os.path.isdir(d)}
    for name in sorted(all_out - set(oracle)):
        df = load_spark(outdir, name)
        print(f"ROWS-ONLY {name}: {0 if df is None else len(df)} rows")
    print(f"\n{npass} pass, {nfail} fail")
    sys.exit(1 if nfail else 0)

if __name__ == "__main__":
    main()

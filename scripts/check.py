#!/usr/bin/env python3
"""Local oracle-check harness (mimics the driver's DuckDB compare).

Usage: python3 scripts/check.py <sfDir> <outDir> [query ...]

Reads <outDir>/<name>/ parquet (Spark results written by graft.Verify) and
<outDir>/oracle_sql.json, runs each oracle in DuckDB with views over the
same sfDir tables, sorts columns by name and rows by all columns, and
compares. Exact match for non-floats; floats compared exactly first, then
with 1e-9 tolerance reported separately.
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            vals = df[c].dropna()
            if len(vals) and all(hasattr(v, "year") for v in vals.head(5)):
                df[c] = pd.to_datetime(df[c])
            else:
                df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:300]}")
            n_fail += 1
            continue
        # dtype strictness BEFORE normalization: int32 vs int64 etc. would
        # hash-mismatch under a type-strict driver compare
        sd_t = {c: str(spark_df[c].dtype) for c in spark_df.columns}
        dd_t = {c: str(duck_df[c].dtype) for c in duck_df.columns}
        tmism = [f"{c}: spark={sd_t[c]} duck={dd_t[c]}"
                 for c in sorted(set(sd_t) & set(dd_t))
                 if sd_t[c] != dd_t[c] and not (
                     sd_t[c] == "object" or dd_t[c] == "object")]
        s, d = normalize(spark_df), normalize(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1
            continue
        if tmism:
            print(f"FAIL {name}: dtype mismatch — " + "; ".join(tmism))
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            n_fail += 1
            continue
        bad = []
        for c in s.columns:
            sv, dv = s[c].values, d[c].values
            if np.issubdtype(s[c].dtype, np.floating) or np.issubdtype(d[c].dtype, np.floating):
                svf = pd.to_numeric(s[c], errors="coerce").values.astype(float)
                dvf = pd.to_numeric(d[c], errors="coerce").values.astype(float)
                both_nan = np.isnan(svf) & np.isnan(dvf)
                exact = (svf == dvf) | both_nan
                if not exact.all():
                    close = np.isclose(svf, dvf, rtol=0, atol=1e-9) | both_nan
                    tag = "float-close" if close.all() else "float-DIFF"
                    i = int(np.argmin(exact))
                    bad.append(f"{c}[{tag}] row{i}: {svf[i]!r} vs {dvf[i]!r} (n={int((~exact).sum())})")
            else:
                eq = (sv == dv) | (pd.isna(s[c]).values & pd.isna(d[c]).values)
                if not eq.all():
                    i = int(np.argmin(eq))
                    bad.append(f"{c} row{i}: {sv[i]!r} vs {dv[i]!r} (n={int((~eq).sum())})")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    # queries with no oracle: just check rows exist
    for path in sorted(glob.glob(f"{out_dir}/*/")):
        name = path.rstrip("/").split("/")[-1]
        if name in oracle or (only and name not in only):
            continue
        files = glob.glob(f"{path}/*.parquet")
        if files:
            n = sum(len(pd.read_parquet(f)) for f in files)
            print(f"ROWS {name}: {n} rows (no oracle)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

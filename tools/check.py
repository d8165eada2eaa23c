#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (dev tool only, not library
code): run each oracle SQL from outDir/oracle_sql.json in DuckDB over the
sfDir parquet tables, load the Spark parquet results, sort columns by name,
sort rows, and compare cell-by-cell (exact for non-floats, tolerance-reported
for floats so float-lowbit drift is visible before the driver hashes it).

Usage: python3 tools/check.py SFDIR OUTDIR
"""
import json
import math
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: json.dumps(v, sort_keys=True, default=str)
                              if isinstance(v, (list, dict, np.ndarray)) else v)
    if len(df) == 0:
        return df.reset_index(drop=True)
    key = df.astype(str).apply(lambda r: "|".join(r.values), axis=1)
    return df.iloc[key.to_numpy().argsort(kind="stable")].reset_index(drop=True)


def compare(name, spark_df, oracle_df):
    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA-MISMATCH cols spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT spark={len(a)} oracle={len(b)}"
    problems = []
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype(float).to_numpy()
            bv = bv.astype(float).to_numpy()
            both_nan = np.isnan(av) & np.isnan(bv)
            diff = np.where(both_nan, 0.0, np.abs(av - bv))
            nan_mismatch = np.isnan(av) != np.isnan(bv)
            if nan_mismatch.any():
                problems.append(f"{c}: NaN mismatch x{int(nan_mismatch.sum())}")
            elif np.nanmax(diff) if len(diff) else 0:
                mx = float(np.nanmax(diff))
                tag = "FLOAT-DRIFT" if mx < 1e-6 else "VALUE"
                problems.append(f"{c}: {tag} maxdiff={mx:.3e} x{int((diff > 0).sum())}")
        else:
            eq = (av.astype(str) == bv.astype(str)) | (av.isna() & bv.isna())
            if not eq.all():
                i = int(np.argmax(~eq.to_numpy()))
                problems.append(
                    f"{c}: VALUE x{int((~eq).sum())} first@{i} spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}")
    return "; ".join(problems) if problems else None


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    import glob
    produced = {p.split("/")[-1] for p in glob.glob(f"{outdir}/*") if not p.endswith(".json")}
    for name in sorted(produced):
        if name not in oracle:
            print(f"  ?? {name}: rows-only (no oracle)")
            continue
        try:
            odf = con.sql(oracle[name]).df()
            sdf = pd.read_parquet(f"{outdir}/{name}")
            problem = compare(name, sdf, odf)
        except Exception as e:  # noqa: BLE001
            problem = f"EXCEPTION {e}"
        if problem:
            print(f"  FAIL {name}: {problem}")
            n_bad += 1
        else:
            print(f"  ok   {name} ({len(sdf)} rows)")
            n_ok += 1
    missing = set(oracle) - produced
    for name in sorted(missing):
        print(f"  MISS {name}: oracle present but no spark output")
        n_bad += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

"""Local mirror of the driver's correctness gate.

Runs every __spark_entry__.queries() entry and its oracle_sql() counterpart
(DuckDB) on the same sf dir, compares row count, column names, and
order-insensitive values. Usage:

    python tools/verify_local.py [--sf /root/testdata/sf0.001] [--only name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realtime_twitter_trends_analytics_spark.session import get_spark  # noqa: E402
from realtime_twitter_trends_analytics_spark.sources.loaders import TABLES  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        elif df[c].dtype == object:
            sample = df[c].dropna()
            if len(sample) and hasattr(sample.iloc[0], "toordinal"):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]").astype("int64")
            else:
                df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    if problems:
        return problems
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]):
            ok = np.allclose(av, bv, rtol=0, atol=1e-6, equal_nan=True)
        else:
            ok = (pd.Series(av).fillna("\0NULL") == pd.Series(bv).fillna("\0NULL")).all()
        if not ok:
            mism = (pd.Series(av).fillna("\0N") != pd.Series(bv).fillna("\0N")).to_numpy().nonzero()[0][:5]
            examples = [(c, i, av[i], bv[i]) for i in mism]
            problems.append(f"values differ in col {c}: {examples}")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    spark = get_spark("verify-local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.only or sorted(queries)
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        # run contract (ADVICE r3): intra-query caches (shingle relations,
        # LSH buckets) are owned by the query that built them; the harness
        # drops them so 140+ queries don't accumulate executor storage
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            sdf = queries[name](spark, args.sf)
            spark_pdf = sdf.toPandas()
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows {name}: {len(spark_pdf)} rows (rows-only, {time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL {name}: duckdb error\n{traceback.format_exc()}")
            n_fail += 1
            continue
        problems = compare(spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL {name} ({time.time()-t0:.1f}s):")
            for p in problems:
                print(f"   {p}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

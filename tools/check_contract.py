"""Local replica of the driver's correctness gate: run every queries()
entry at a given sf_dir and diff against its oracle_sql() via DuckDB.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from sparksearch.session import get_spark

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if sorted(a.columns) != sorted(b.columns):
        return f"schema mismatch: {sorted(a.columns)} vs {sorted(b.columns)}"
    if len(a) != len(b):
        return f"row count {len(a)} vs {len(b)}"
    a, b = norm(a), norm(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            bad = [(x, y) for x, y in zip(av, bv)
                   if not (x == y or (isinstance(x, float) and isinstance(y, float)
                                      and (math.isnan(x) and math.isnan(y)
                                           or abs(x - y) <= 1e-9)))]
        else:
            bad = [(x, y) for x, y in zip(av.astype(str), bv.astype(str)) if x != y]
        if bad:
            return f"col {c}: {len(bad)} diffs, first {bad[:3]}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="contract-check", cores=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    if os.path.abspath(sf_dir) != "/root/testdata/sf0.01":
        # the one data-dependent oracle: its k-means centroid literals are
        # pinned to the sf the driver checks (sf0.01); re-derive them for
        # the sf under test so the sweep stays value-exact at any scale
        from sparksearch.contract import (_ivf_oracle_sql, _pq_oracle_sql,
                                          _semantic_oracle_sql,
                                          _temperature_oracle_sql)
        os_["ivf_ann_topk"] = _ivf_oracle_sql(sf_dir=sf_dir)
        os_["pq_adc_topk"] = _pq_oracle_sql(sf_dir=sf_dir)
        os_["semantic_dedup_keep"] = _semantic_oracle_sql(sf_dir=sf_dir)
        os_["temperature_resample"] = _temperature_oracle_sql(sf_dir=sf_dir)
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:160]}")
            n_fail += 1
            continue
        sql = os_.get(name)
        if sql is None:
            print(f"PASS {name}: rows-only ({len(got)} rows, "
                  f"{time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {str(e)[:160]}")
            n_fail += 1
            continue
        err = compare(got, want)
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

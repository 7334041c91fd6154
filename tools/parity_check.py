#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify's
Spark parquet dumps against DuckDB running SparkEntry.oracleSql.

Usage: python3 tools/parity_check.py <sfDir> <verifyOutDir>
(dev tool only — the Scala library has no python dependency)
"""
import sys, os, json, math
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            got = canon(pd.read_parquet(spark_path))
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} duck={list(exp.columns)}")
            n_bad += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(exp)}")
            n_bad += 1; continue
        mism = 0
        for c in got.columns:
            gv, ev = got[c].tolist(), exp[c].tolist()
            for i, (x, y) in enumerate(zip(gv, ev)):
                if not values_equal(x, y):
                    if mism < 3:
                        print(f"  {name}.{c}[{i}]: spark={x!r} duck={y!r}")
                    mism += 1
        if mism:
            print(f"FAIL {name}: {mism} value mismatches"); n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

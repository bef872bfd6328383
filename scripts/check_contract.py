"""Local mirror of the driver's correctness gate: run every queries() entry
at sf0.01 and diff it against oracle_sql() via DuckDB (row count, column
names, order-insensitive values).  Usage: python scripts/check_contract.py
[sf_dir] [only_query_substring]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from geetiles_spark import cache  # noqa: E402
from geetiles_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    issues = []
    if sorted(got.columns) != sorted(exp.columns):
        issues.append(f"columns differ: {sorted(got.columns)} vs {sorted(exp.columns)}")
        return issues
    if len(got) != len(exp):
        issues.append(f"row count differs: {len(got)} vs {len(exp)}")
    g = normalize(got)
    e = normalize(exp)
    if len(g) == len(e):
        for c in g.columns:
            a, b = g[c], e[c]
            # the driver hashes stringified values: int64 1 vs float64 1.0
            # is a hash mismatch even though numerically equal — flag it
            if (a.dtype.kind in "iu") != (b.dtype.kind in "iu"):
                issues.append(
                    f"dtype-kind mismatch col={c}: {a.dtype} vs {b.dtype} "
                    "(driver string-hash would differ)"
                )
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                bad = (a.astype(float) - b.astype(float)).abs() > 1e-9
            else:
                bad = a.astype(str) != b.astype(str)
            if bad.any():
                i = bad.idxmax()
                issues.append(
                    f"value mismatch col={c} rows={int(bad.sum())} "
                    f"first@{i}: {a[i]!r} vs {b[i]!r}"
                )
    return issues


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else ""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    spark = get_spark(app_name="contract-check")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and only not in name:
            continue
        t0 = time.time()
        try:
            with cache.persist_scope():
                got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(got)} rows ({time.time()-t0:.1f}s)")
            if len(got) == 0:
                print(f"  WARN {name}: zero rows")
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        issues = compare(name, got, exp)
        if issues:
            failures += 1
            print(f"FAIL {name} ({time.time()-t0:.1f}s)")
            for i in issues:
                print(f"  - {i}")
        else:
            print(f"OK   {name}: {len(got)} rows ({time.time()-t0:.1f}s)")
    spark.stop()
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

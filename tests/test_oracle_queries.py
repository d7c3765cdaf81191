"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet tables, then
compare row count, column names, and values EXACTLY (sorted columns, sorted
rows) — the driver hashes values, so approximate agreement is not enough.

Runs at sf0.001 for speed (the driver uses sf0.01; both are deterministic
scale-downs of the same generator)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "__float__") and type(v).__name__ == "Decimal":
        return float(v)
    return v


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(row[i]) for i in order) for row in data
    ), [cols[i] for i in order]


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_query_matches_oracle(spark, duck, name):
    sdf = entrymod.queries()[name](spark, SF_DIR)
    spark_rows, spark_cols = _rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    res = duck.sql(entrymod.oracle_sql()[name])
    duck_rows, duck_cols = _rows([c for c in res.columns], res.fetchall())
    assert spark_cols == duck_cols, f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count"
    for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
        assert a == b, f"{name}: first differing row {i}: spark={a} duck={b}"


def test_rows_only_queries_run(spark):
    for name, fn in entrymod.queries().items():
        if name not in entrymod.oracle_sql():
            assert fn(spark, SF_DIR).count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) >= 5

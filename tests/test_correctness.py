"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row count, column names, and order-insensitive values."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from tests.conftest import SF_SMALL

import __spark_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon(val):
    if val is None:
        return None
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return round(val, 9)
    if isinstance(val, (list, tuple)):
        return tuple(canon(v) for v in val)
    return val


def rows_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return out


# all_queries = registered (driver-checked) + driver-retired redundant
# twins — locally EVERY query keeps its full DuckDB comparison
QUERY_NAMES = sorted(entrymod.all_queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    q = entrymod.all_queries()[name]
    sdf = q(spark, SF_SMALL)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    sql = entrymod.all_oracles().get(name)
    if sql is None:
        assert len(spark_rows) >= 0  # rows-only check (non-SQL-expressible op)
        return
    con = duck_con(SF_SMALL)
    res = con.sql(sql)
    duck_cols = res.columns
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: columns differ: {sorted(spark_cols)} vs {sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s = rows_canon(spark_cols, [tuple(r) for r in spark_rows])
    d = rows_canon(duck_cols, duck_rows)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_tokens_passthrough_byte_equal(spark):
    """north-rule invariant: the raw tokens array<int32> is byte-equal
    between the Spark tokenizer and the DuckDB oracle (the driver gate
    checks the space-joined rendering; this guards the array itself)."""
    from metarank_spark.functions import text as tx

    sdf = tx.tokenized_sequences(spark, SF_SMALL)
    srows = {r["doc_id"]: list(r["tokens"]) for r in sdf.collect()}
    con = duck_con(SF_SMALL)
    drows = {
        r[0]: list(r[1])
        for r in con.sql(f"{entrymod.SEQ} SELECT doc_id, tokens FROM seq").fetchall()
    }
    assert srows.keys() == drows.keys()
    assert srows == drows

"""Mirror of the driver correctness gate: every queries() entry with an
oracle_sql() must match DuckDB at sf0.01 on row count, column names, and an
order-insensitive value hash (columns sorted by name, floats normalized)."""

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)].copy()
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append(f"{v:.6f}")
            else:
                vals.append(str(v))
        rows.append("|".join(vals))
    return sorted(rows)


ORACLE_NAMES = sorted(entrymod.oracle_sql().keys())
ALL_NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_duckdb(spark, ddb, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(sql).df()
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: rows {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    s, d = _normalize(spark_pdf), _normalize(duck_pdf)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b][:5]
    assert s == d, f"{name}: first mismatches {mismatches}"


@pytest.mark.parametrize("name", [n for n in ALL_NAMES if n not in ORACLE_NAMES])
def test_rows_only_queries_run(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0

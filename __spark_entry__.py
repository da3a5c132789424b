"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship KG extraction at sf0.001;
``queries()``/``oracle_sql()`` expose the operator-level queries from
named_entity_algorithm_project_spark.queries (SURVEY.md §2 coverage plus the
training-data ops: dedup, similarity search, text analysis). KG-pipeline
queries (q19-q21) are UDF/iterative; their oracle is the independent pandas
reference pipeline (oracle.py), whose expected outputs oracle_sql()
materializes to parquet (oracle_expected.ensure_expected) for DuckDB to
read_parquet and hash-compare like every other query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from named_entity_algorithm_project_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: deterministic KG mention extraction + per-type rollup over
    the sf0.001 documents table."""
    return QUERIES["q19_kg_mentions"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    # regenerate the pandas-oracle expected tables (q19-q21) from current
    # code before the driver runs the DuckDB side
    from named_entity_algorithm_project_spark.oracle_expected import (
        ensure_expected,
    )

    ensure_expected()
    return dict(ORACLES)

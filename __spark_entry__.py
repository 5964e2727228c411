"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``py_image_toolkit_spark.contract`` (paired
Spark-DataFrame / DuckDB-SQL registry); the extraction engine itself is
``py_image_toolkit_spark`` (see SURVEY.md §2 for the operator inventory).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from py_image_toolkit_spark import contract  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the E1→E3 extraction pipeline over pages derived from the
    sf0.001 documents table (plus the engine's own operators downstream)."""
    return contract.QUERIES["q27_extract_pipeline"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    return dict(contract.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable SQL equivalents for every queries() entry.

    q27 (the full extraction pipeline) is not SQL-expressible, so its oracle
    is a golden parquet: the pure-Python reference extractor (the
    byte-parity truth, tests/test_engine_parity.py) is run over the same
    deterministic pages input and materialized; DuckDB reads it via
    read_parquet. The golden is fingerprinted against documents.parquet and
    rebuilt automatically when the test data changes."""
    from py_image_toolkit_spark.golden import q27_oracle_sql

    out = dict(contract.ORACLE_SQL)
    out["q27_extract_pipeline"] = q27_oracle_sql("/root/testdata/sf0.01")
    return out

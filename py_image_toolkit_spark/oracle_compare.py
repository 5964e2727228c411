"""Local replica of the driver's DuckDB-oracle comparison: row count +
schema (column names) + order-insensitive value comparison with columns
sorted by name."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from pyspark.sql import SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_cell(v):
    """Canonicalize a cell to a (type-tag, value) pair.

    Dtype-strict on purpose: the driver hashes a canonical serialization of
    each value, so an int64 ``52037`` and a float64 ``52037.0`` MUST compare
    unequal here even though Python's ``==`` says they are equal (DuckDB
    promotes ``SUM(INTEGER)`` to HUGEINT which lands in pandas as float64 —
    the exact round-4 q38/q41/q44 failure mode this replica used to mask)."""
    if v is None:
        return None
    if hasattr(v, "item"):  # numpy scalar -> python scalar first
        return _norm_cell(v.item())
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return ("f", round(v, 9))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return ("l", tuple(_norm_cell(x) for x in v))
    return (type(v).__name__[:1], v)


def _canon(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    rows.sort(key=repr)
    return cols, rows


def compare_query(
    spark: SparkSession,
    con: duckdb.DuckDBPyConnection,
    spark_fn,
    sql: str,
    sf_dir: str,
) -> list[str]:
    """Returns list of problems (empty == match)."""
    eng = spark_fn(spark, sf_dir).toPandas()
    ora = con.execute(sql).fetchdf()
    problems = []
    ec, er = _canon(eng)
    oc, orows = _canon(ora)
    if ec != oc:
        problems.append(f"schema: engine={ec} oracle={oc}")
        return problems
    if len(er) != len(orows):
        problems.append(f"rows: engine={len(er)} oracle={len(orows)}")
        return problems
    for i, (a, b) in enumerate(zip(er, orows)):
        if a != b:
            problems.append(f"value row {i}: engine={a!r} oracle={b!r}")
            if len(problems) >= 5:
                break
    return problems

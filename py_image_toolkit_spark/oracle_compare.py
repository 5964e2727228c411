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
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 9)
    if hasattr(v, "item"):  # numpy scalar
        return _norm_cell(v.item())
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


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

"""Regression tests for the dtype-strict oracle comparator.

Round-4 postmortem: the three driver hash failures (q38/q41/q44) were all
oracle SQLs with an uncast ``SUM(INTEGER)`` — DuckDB promotes that to
HUGEINT, ``fetchdf()`` renders it float64, and the driver's value hash
distinguishes ``52037.0`` from Spark's int64 ``52037``.  The old local
comparator used Python ``==`` (where ``52037.0 == 52037``) and printed
ALL-OK against a red driver row.  These tests pin the strict behavior so
the local sweep can never mask that failure class again.
"""

from pyspark.sql import functions as F

from py_image_toolkit_spark.oracle_compare import _norm_cell, compare_query, duck_connection


def test_int_vs_float_cells_differ():
    assert _norm_cell(52037) != _norm_cell(52037.0)


def test_bool_vs_int_cells_differ():
    assert _norm_cell(True) != _norm_cell(1)


def test_numpy_scalars_normalize_to_python_tags():
    import numpy as np

    assert _norm_cell(np.int64(7)) == _norm_cell(7)
    assert _norm_cell(np.float64(7.0)) == _norm_cell(7.0)
    assert _norm_cell(np.int64(7)) != _norm_cell(np.float64(7.0))


def test_float_rounding_still_tolerant():
    assert _norm_cell(0.1 + 0.2) == _norm_cell(0.3)


def test_uncast_sum_oracle_fails(spark, sf_dir):
    """A DuckDB oracle with an uncast SUM() MUST fail the local sweep, even
    though the values are numerically equal — exactly the pre-fix q38 shape."""
    con = duck_connection(sf_dir)
    try:
        def q(s, d):
            return (
                s.read.parquet(f"{d}/documents.parquet")
                .agg(F.sum(F.length("text")).cast("long").alias("total_chars"))
            )

        bad_sql = "SELECT SUM(LENGTH(text)) AS total_chars FROM documents"
        good_sql = "SELECT CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars FROM documents"
        assert compare_query(spark, con, q, bad_sql, sf_dir), (
            "uncast SUM must be reported as a mismatch (float64 vs int64)"
        )
        assert not compare_query(spark, con, q, good_sql, sf_dir)
    finally:
        con.close()

"""Driver-contract gate: every queries() entry vs its DuckDB oracle at the
test scale factor (mirrors the driver's row-count/schema/value comparison)."""

import pytest

from py_image_toolkit_spark import contract
from py_image_toolkit_spark.oracle_compare import compare_query, duck_connection

_GOLDEN_ORACLES = {"q27_extract_pipeline"}  # oracle = materialized golden parquet
_WITH_ORACLE = sorted(
    n for n in contract.QUERIES if n in contract.ORACLE_SQL or n in _GOLDEN_ORACLES
)
_ROWS_ONLY = sorted(n for n in contract.QUERIES if n not in _WITH_ORACLE)


def _oracle_sql(name: str, sf_dir: str) -> str:
    if name in _GOLDEN_ORACLES:
        from py_image_toolkit_spark.golden import q27_oracle_sql

        return q27_oracle_sql(sf_dir)
    return contract.ORACLE_SQL[name]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    try:
        problems = compare_query(
            spark, duck, contract.QUERIES[name], _oracle_sql(name, sf_dir), sf_dir
        )
    finally:
        contract.release_persists()
    assert not problems, f"{name}:\n" + "\n".join(problems)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    df = contract.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0
    assert {"url", "rule", "success", "extracted_text"} <= set(df.columns)
    # every queries() key referenced by oracle_sql() exists
    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(o) <= set(q)

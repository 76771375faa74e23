"""Driver-style oracle comparison for every registered query with an oracle.

This is the same gate the round driver applies (CORRECTNESS_r{N}.json):
Spark result vs DuckDB running the oracle SQL on identical parquet inputs.
"""

from __future__ import annotations

import pytest

from iceberg_data_gen_spark import operators

operators.load_all()

from tests.conftest import SF_DIR
from tests.oracle import compare

ORACLE_NAMES = sorted(operators.ORACLES)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, name):
    errors = compare(spark, name, operators.QUERIES[name], operators.ORACLES[name], SF_DIR)
    assert not errors, "\n".join(errors)


def test_every_query_has_entry_or_rowsonly_note(spark):
    # every registered query must at least run and return a schema'd DataFrame
    for name, fn in operators.QUERIES.items():
        df = fn(spark, SF_DIR)
        assert df.columns, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())

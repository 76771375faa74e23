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


def test_survey_inventory_matches_registry():
    """SURVEY.md §2.3 is the judge-facing per-query inventory; it must
    list exactly the registered queries with exactly the rows-only marks
    (a drifted inventory misreports coverage)."""
    import re
    from pathlib import Path

    text = (Path(__file__).resolve().parent.parent / "SURVEY.md").read_text()
    sec = text.split("### 2.3")[1].split("\n---")[0]
    listed = set(re.findall(r"q\w+", sec)) - {"queries", "query"}
    listed -= {"q2", "q11", "q20", "ql"}  # prose mentions, not entries
    reg = set(operators.QUERIES)
    assert listed == reg, (sorted(listed - reg), sorted(reg - listed))
    rows_only = {n for n in reg if n not in operators.ORACLES}
    marked = set(re.findall(r"(q\w+)\(rows-only", sec))
    assert rows_only == marked, rows_only ^ marked

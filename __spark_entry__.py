"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``iceberg_data_gen_spark/``; this module only
re-exports the operator registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from iceberg_data_gen_spark import operators  # noqa: E402

operators.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1 pricing summary."""
    return operators.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def _driver_verified() -> set[str]:
    """Names with a green (or rows-only) row in any prior CORRECTNESS_r*.json.

    The driver checks only the first ~50 ``queries()`` entries per round, so
    we surface not-yet-verified queries first and re-surface any past
    failures; already-proven queries go last.  Cumulative coverage converges
    to the full registry over rounds.
    """
    import json

    verified: set[str] = set()
    for path in sorted(Path(_REPO).glob("CORRECTNESS_r*.json")):
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True or row.get("err") == "no_oracle":
                verified.add(name)
    return verified


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so the driver's capped correctness pass hits unverified queries
    first: (1) unverified with a SQL oracle, (2) unverified rows-only,
    (3) previously driver-verified.  WITHIN the unverified groups,
    longest-starved modules come first (similarity/text/streaming have
    waited since round 1 while newer registrations crowded them out), and
    any round's NEW registrations (new modules, imported last) sort after
    them — so cumulative coverage converges oldest-first.
    """
    verified = _driver_verified()
    names = list(operators.QUERIES)
    # modules that have never had a driver row, oldest registrations first
    starved = ("similarity", "text", "streaming")
    reg_order = {n: i for i, n in enumerate(names)}

    def starve_key(n: str) -> tuple[int, int]:
        mod = operators.QUERIES[n].__module__.rsplit(".", 1)[-1]
        for i, m in enumerate(starved):
            if mod.startswith(m) or (m == "streaming" and "streaming" in
                                     operators.QUERIES[n].__module__):
                return (i, reg_order[n])
        return (len(starved), reg_order[n])

    unverified_oracle = sorted(
        (n for n in names if n not in verified and n in operators.ORACLES),
        key=starve_key,
    )
    unverified_rowsonly = sorted(
        (n for n in names if n not in verified and n not in operators.ORACLES),
        key=starve_key,
    )
    ordered = (
        unverified_oracle
        + unverified_rowsonly
        + [n for n in names if n in verified]
    )
    return {n: operators.QUERIES[n] for n in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return dict(operators.ORACLES)

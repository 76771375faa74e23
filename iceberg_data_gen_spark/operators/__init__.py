"""Operator registry.

Every query/operator registers itself into ``QUERIES`` (name -> callable
``(spark, sf_dir) -> DataFrame``) and, when SQL-expressible, ``ORACLES``
(name -> ANSI SQL string DuckDB runs on the same parquet views).  This is
the single source of truth consumed by ``__spark_entry__.py``, the tests,
and ``bench.py``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, "Callable[[SparkSession, str], DataFrame]"] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a query under ``name`` with an optional DuckDB
    oracle.  Queries without an oracle get the driver's weaker rows-only
    check (reserved for genuinely non-SQL-expressible operators)."""

    def deco(fn):
        # loud collision (review r12): a silent overwrite made the first
        # registration vanish from driver coverage, and a re-registration
        # WITHOUT an oracle would have left the previous oracle attached
        # to the new query — the driver would compare the new query
        # against the old query's SQL
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registration side-effects run."""
    from iceberg_data_gen_spark.operators import (  # noqa: F401
        analytics,
        asof,
        dedup,
        extensibility,
        multimodal,
        pipeline,
        relational,
        relational2,
        relational3,
        similarity,
        text,
    )
    from iceberg_data_gen_spark.streaming import events  # noqa: F401

    # round-4+ additions import LAST so __spark_entry__'s unverified-first
    # ordering keeps them BEHIND the longer-waiting tail (convergence of
    # driver correctness coverage stays oldest-first)
    from iceberg_data_gen_spark.operators import curation  # noqa: F401

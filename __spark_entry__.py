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


def _driver_history() -> tuple[set[str], dict[str, int]]:
    """Driver-proof history parsed from the CORRECTNESS_r*.json files.

    Returns ``(verified, last_round)`` where *last_round* maps each name to
    the LATEST round in which the driver recorded any row for it (pass or
    fail), and *verified* holds only the names whose LATEST recorded row was
    green (or rows-only-by-design).  A name that passed once but failed in a
    later round is therefore NOT verified — it sorts back into the
    unverified head so the driver re-surfaces the regression immediately
    instead of treating the failure row as a fresh check.  The driver checks
    only the first ~50 ``queries()`` entries per round, so the ordering
    built from this history decides which slice of the registry gets
    re-proven.
    """
    import json
    import re

    history = []
    for path in sorted(Path(_REPO).glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)", path.name)
        rnd = int(m.group(1)) if m else 0
        try:
            history.append((rnd, json.loads(path.read_text())))
        except (OSError, ValueError):
            continue
    return _fold_history(history, oracle_names=set(operators.ORACLES))


def _fold_history(
    history: list[tuple[int, dict]],
    oracle_names: set[str] | None = None,
) -> tuple[set[str], dict[str, int]]:
    """Fold (round, rows) correctness records into (verified, last_round).

    verified = names whose latest recorded row is green/rows-only; a later
    failure row evicts an earlier green so regressions re-surface first.

    A ``no_oracle`` row only verifies a query that is STILL rows-only
    (r8): when a previously rows-only query gains an oracle (the set of
    current oracle-bearing names is ``oracle_names``), its old rows-only
    green rows no longer witness anything — the query sorts back into
    the unverified head so the driver hash-checks the new oracle in the
    very next round instead of waiting out a full staleness rotation.
    """
    last_green: dict[str, int] = {}
    last_round: dict[str, int] = {}
    for rnd, rows in history:
        if not isinstance(rows, dict):
            # a history file holding valid-but-non-object JSON (e.g. an
            # empty round written as []) must be SKIPPED like a parse
            # error, not crash queries() for the whole round (review r9)
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            last_round[name] = max(last_round.get(name, 0), rnd)
            rows_only_ok = row.get("err") == "no_oracle" and (
                oracle_names is None or name not in oracle_names
            )
            if row.get("hash_match") is True or rows_only_ok:
                last_green[name] = max(last_green.get(name, 0), rnd)
    verified = {
        n for n, rnd in last_round.items() if last_green.get(n, -1) >= rnd
    }
    return verified, last_round


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so the driver's capped correctness pass (first ~50 entries)
    spends its slots where they prove the most:

    1. never-driver-checked queries (new registrations) first — SQL-oracle
       entries before rows-only ones, registration order within each;
    2. then the already-verified tail rotated by STALENESS: ascending
       last-driver-checked round (ties broken by registration order), so
       the ~50 slots cycle through the full registry every ~4 rounds and
       every query keeps getting a periodic driver regression re-proof
       instead of the same oldest registrations being re-checked forever.

    Any query whose latest recorded driver row is a failure (no green row
    in that round or later) sorts into group (1) so the driver re-surfaces
    the regression immediately — ``_driver_history`` drops such names from
    *verified* rather than letting the failure row count as freshness.
    """
    verified, last_round = _driver_history()
    names = list(operators.QUERIES)
    reg_order = {n: i for i, n in enumerate(names)}

    unverified_oracle = [
        n for n in names if n not in verified and n in operators.ORACLES
    ]
    unverified_rowsonly = [
        n for n in names if n not in verified and n not in operators.ORACLES
    ]
    verified_by_staleness = sorted(
        (n for n in names if n in verified),
        key=lambda n: (last_round.get(n, 0), reg_order[n]),
    )
    ordered = unverified_oracle + unverified_rowsonly + verified_by_staleness
    return {n: operators.QUERIES[n] for n in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return dict(operators.ORACLES)

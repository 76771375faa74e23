"""Driver simulation: run the per-round correctness gate the way the
DRIVER runs it, not the way the repo's tests run it.

Differences from ``driver_twin.py`` (which this reuses for the compare):

* a VANILLA SparkSession — ``local[32]`` with stock confs (200 shuffle
  partitions, no repo session tuning) — because the driver builds its
  own session, and queries that silently depend on
  ``iceberg_data_gen_spark.session.get_spark`` settings only fail there;
* ``__spark_entry__`` is imported exactly as the driver does, and the
  ordered ``queries()`` dict (unverified-first) is what's iterated, so
  the first ``--slots`` entries here are the rows CORRECTNESS_r{N} will
  contain;
* ``entry(spark)`` is smoke-checked first (schema + ≥0 rows), like the
  driver's smoke gate.

Run: python scripts/driver_sim.py [--slots N] [--sf-dir DIR]
Default: 50 slots at /root/testdata/sf0.01.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from scripts.driver_twin import compare  # noqa: E402
from tests.oracle import duckdb_conn  # noqa: E402


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--slots", type=int, default=50)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    slots, sf_dir = args.slots, args.sf_dir

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("driver-sim")
        .getOrCreate()
    )

    import __spark_entry__ as entry_mod

    t0 = time.monotonic()
    head = entry_mod.entry(spark)
    n_head = len(head.collect())
    print(f"entry(): {n_head} rows, schema={head.columns} "
          f"({time.monotonic() - t0:.1f}s)")
    # the smoke step must GATE, not just narrate (review r12): a
    # degenerate entry() — zero rows or a drifted schema — previously
    # printed and proceeded to exit 0, passing a sim the real driver's
    # smoke check could fail
    expected_cols = ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
                     "sum_disc_price", "sum_charge", "avg_qty", "avg_price",
                     "avg_disc", "count_order"]
    if n_head <= 0 or head.columns != expected_cols:
        print(f"entry() SMOKE FAIL: rows={n_head} schema={head.columns}")
        return 1

    ordered = list(entry_mod.queries())
    picked = ordered[:slots]

    con = duckdb_conn(sf_dir)
    bad = 0
    for n in picked:
        t0 = time.monotonic()
        try:
            verdict = compare(n, spark, con, sf_dir)
            if verdict == "NO_ORACLE":
                # the driver's weaker rows-only check: it still RUNS the query
                from iceberg_data_gen_spark import operators

                rows = operators.QUERIES[n](spark, sf_dir).collect()
                verdict = f"OK (rows-only, {len(rows)} rows)"
        except Exception as e:  # noqa: BLE001
            verdict = f"ERR {type(e).__name__}: {e}"
        dt = time.monotonic() - t0
        if not verdict.startswith("OK"):
            bad += 1
        print(f"[{dt:5.1f}s] {n}: {verdict}")
    print(f"\n{len(picked) - bad}/{len(picked)} OK (first {slots} driver slots)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

"""Exhaustive one-time sweep of the composed-surface fuzz family's
DISCRETE spec space (tests/test_differential.py::render_composed_sql):
3 inners × 3 outers × 3 group cols × 4 value cols × 3 fracs = 324
engine-common SQL strings, each hash-compared Spark vs DuckDB.

The committed hypothesis test samples this space; per the fuzz-program
discipline every discrete space is swept exhaustively ONCE before the
sampled runs are trusted (a sampled run of a fully-swept-green space
cannot flake).

Run: python scripts/sweep_composed.py
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    from iceberg_data_gen_spark.session import get_spark, load_tables
    from tests.conftest import SF_SMALL
    from tests.oracle import compare
    from tests.test_differential import (
        COMPOSED_INNERS,
        COMPOSED_OUTERS,
        GRP_COLS,
        NUM_COLS,
        render_composed_sql,
    )

    spark = get_spark("sweep-composed")
    spark.sparkContext.setLogLevel("ERROR")
    n = bad = 0
    for inner in COMPOSED_INNERS:
        for outer in COMPOSED_OUTERS:
            for grp in GRP_COLS:
                for val in sorted(NUM_COLS):
                    for frac in (0.25, 0.5, 0.75):
                        sql = render_composed_sql(inner, outer, grp, val, frac)

                        def fn(spark, sf_dir, sql=sql):
                            load_tables(spark, sf_dir, ("lineitem", "orders"))
                            return spark.sql(sql)

                        tag = f"{inner}->{outer},{grp},{val},{frac}"
                        errors = compare(spark, f"sweep[{tag}]", fn, sql, SF_SMALL)
                        n += 1
                        if errors:
                            bad += 1
                            print("DIVERGE", tag, errors, flush=True)
                        elif n % 27 == 0:
                            print(f"{n} swept, {bad} divergences", flush=True)
    print(f"TOTAL {n} cases, {bad} divergences")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

"""Exhaustive one-time sweep of the composed-surface fuzz family's
DISCRETE spec space (tests/test_differential.py::render_composed_sql):
3 inners × 3 outers × 3 group cols × 4 value cols × 3 fracs = 324
engine-common SQL strings, each hash-compared Spark vs DuckDB.

With ``--three``, sweeps the THREE-stage family instead
(render_composed3_sql): all 27 inner×mid×outer shapes exhaustively,
crossed with 3 group cols × 2 value cols × 2 fracs = 324 cases (the
shape grid is the new discrete surface; the column/threshold dims were
already swept at full width by the two-stage sweep).

The committed hypothesis tests sample these spaces; per the fuzz-program
discipline every discrete space is swept exhaustively ONCE before the
sampled runs are trusted (a sampled run of a fully-swept-green space
cannot flake).

Run: python scripts/sweep_composed.py [--three]
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
        COMPOSED_MIDS,
        COMPOSED_OUTERS,
        GRP_COLS,
        NUM_COLS,
        render_composed3_sql,
        render_composed_sql,
    )

    three = "--three" in sys.argv
    if three:
        vals = sorted(NUM_COLS)[:2]
        cases = [
            ((i, m, o, g, v, f), render_composed3_sql(i, m, o, g, v, f))
            for i in COMPOSED_INNERS
            for m in COMPOSED_MIDS
            for o in COMPOSED_OUTERS
            for g in GRP_COLS
            for v in vals
            for f in (0.25, 0.75)
        ]
    else:
        cases = [
            ((i, o, g, v, f), render_composed_sql(i, o, g, v, f))
            for i in COMPOSED_INNERS
            for o in COMPOSED_OUTERS
            for g in GRP_COLS
            for v in sorted(NUM_COLS)
            for f in (0.25, 0.5, 0.75)
        ]

    spark = get_spark("sweep-composed")
    spark.sparkContext.setLogLevel("ERROR")
    n = bad = 0
    for spec, sql in cases:
        def fn(spark, sf_dir, sql=sql):
            load_tables(spark, sf_dir, ("lineitem", "orders"))
            return spark.sql(sql)

        tag = "->".join(spec[:-3]) + f",{spec[-3]},{spec[-2]},{spec[-1]}"
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

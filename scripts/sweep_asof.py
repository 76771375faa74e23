"""Exhaustive one-time sweep of the as-of join fuzz family's DISCRETE
spec space (tests/test_differential.py::run_asof_spec): every NULL
injection residue for key_mod ∈ {4, 7} × ts_mod ∈ {3, 5}, crossed with
the r8 tie dimension (equal-instant left/right timestamps + duplicate
(k, t) right rows) and the composite-key dimension —
(4+7) × (3+5) × 2 × 2 = 352 cases, each comparing OUR asof_join
operator against DuckDB's native ASOF JOIN (normalized to predicate
NULL semantics; see render_asof_parts for the DuckDB NULL-sorts-last
artifact this normalization works around).

Per the fuzz-program discipline every discrete space is swept
exhaustively ONCE before the sampled hypothesis runs are trusted.

Run: python scripts/sweep_asof.py
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    from iceberg_data_gen_spark.session import get_spark
    from tests.test_differential import run_asof_spec

    spark = get_spark()
    cases = [
        (km, kr, tm, tr, ties, k2)
        for km in (4, 7)
        for kr in range(km)
        for tm in (3, 5)
        for tr in range(tm)
        for ties in (False, True)
        for k2 in (False, True)
    ]
    bad = 0
    for i, (km, kr, tm, tr, ties, k2) in enumerate(cases, 1):
        errors = run_asof_spec(spark, km, kr, tm, tr, ties=ties, second_key=k2)
        if errors:
            bad += 1
            print(f"FAIL [{km},{kr},{tm},{tr},ties={ties},k2={k2}] {errors[:2]}")
        if i % 40 == 0 or i == len(cases):
            print(f"... {i}/{len(cases)} swept, {bad} divergent", flush=True)
    print(f"\n{len(cases) - bad}/{len(cases)} OK")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

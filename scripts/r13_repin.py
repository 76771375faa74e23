"""Round-13 budget re-pin helper (measurement infrastructure).

The warm/cold ratio budgets divide each entry's time by the same-run
query-only headline median; round 13's optimizations roughly HALVED the
median, so untouched entries' ratios mechanically rose and the r12-era
pins need re-deriving from post-change same-code runs.

Reads one or more bench detail JSON files (run aside via
``cp BENCH_DETAIL_r13.json plans/r13/bench_run_N.json``), prints per-entry
pool median / max warm and cold ratios next to the current pins, and the
suggested new pin (pool max + 30%, rounded up to 0.1) for every entry that
is either already budgeted or whose pool warm-ratio median exceeds 1.3
(the converse-coverage line in tests/test_bench_contract.py).
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import bench


def main() -> None:
    files = sys.argv[1:]
    if not files:
        raise SystemExit("usage: r13_repin.py detail.json [detail.json ...]")
    warm_ratios: dict[str, list[float]] = {}
    cold_ratios: dict[str, list[float]] = {}
    for path in files:
        with open(path) as f:
            p = json.load(f)["passes"]
        wmed = p["warm_median_sec"]
        cold_all = {**p["cold"], **p["extra_cold"]}
        cmed = max(
            statistics.median(
                [t for n, t in p["cold"].items() if n != "datagen_2m_rows_mor"]
            ),
            0.001,
        )
        for n, t in {**p["warm"], **p["extra_warm"]}.items():
            warm_ratios.setdefault(n, []).append(t / wmed)
            cold_ratios.setdefault(n, []).append(cold_all[n] / cmed)

    def pin(x: float) -> float:
        return math.ceil(x * 1.3 * 10) / 10

    rows = []
    for n, ws in warm_ratios.items():
        wmed, wmax = statistics.median(ws), max(ws)
        cs = cold_ratios[n]
        cmax = max(cs)
        cur_w = bench.WARM_RATIO_BUDGETS.get(n)
        needs = cur_w is not None or wmed > 1.3
        rows.append((wmed, wmax, cmax, n, cur_w, needs))
    rows.sort(reverse=True)
    print(f"{'entry':32s} {'w_med':>6s} {'w_max':>6s} {'cur':>5s} {'new_w':>6s} {'c_max':>6s} {'new_c':>6s}")
    for wmed, wmax, cmax, n, cur_w, needs in rows:
        if not needs:
            continue
        print(
            f"{n:32s} {wmed:6.2f} {wmax:6.2f} "
            f"{cur_w if cur_w is not None else float('nan'):5.1f} "
            f"{pin(wmax):6.1f} {cmax:6.2f} {pin(cmax):6.1f}"
        )
    print("\nbelow the 1.3 line and unbudgeted (no pin needed):")
    for wmed, wmax, cmax, n, cur_w, needs in rows:
        if not needs and wmed > 1.0:
            print(f"  {n}: med {wmed:.2f} max {wmax:.2f}")


if __name__ == "__main__":
    main()

"""Round-14 ratio-budget re-pin derivation.

The r14 optimizations moved the query-only warm median again (clean
32-core window: ~0.53-0.63 s vs the r13 pool's 0.64-0.93 s), so every
unchanged entry's ratio inflated and the r13 pins were stale a second
time.  This script derives the third-generation pins from the
committed r14 bench runs and prints (a) the python dict literals for
bench.py and (b) the README table rows — the same one-source pattern
as scripts/r13_repin.py.

Rules (r13 rules, regime keying added per ADVICE r13):

* POOL = plans/r14/bench_run_*_32core.json (the ≥16-core regime ONLY —
  pins are now calibrated tight at high parallelism; low-core runs get
  bench.LOW_CORE_RATIO_MULT instead of widening every pin).
* STALL EXCLUSION (cross-run): per entry, a warm-ratio sample more
  than 1.75× the same entry's MINIMUM sample across the pool runs is a
  host-burst artifact — same-code runs cannot genuinely differ that
  much on one entry (clean-pool spread measured ≤1.35×) — and is
  dropped (printed).  Same-run warm-vs-cold
  comparisons turned out unusable for this: ratios have different
  denominators across passes (cold median ≈ 2× warm median) and
  absolute warm-vs-cold misses bursts that also brushed the cold
  pass.
* warm pin: plan CHANGED this round → pool max × 1.4 (the new plan's
  only measured truth, cushion), floored at 1.6 (±0.15 s scheduler
  noise is ±0.3 of ratio on the now-sub-second entries); unchanged →
  max(pool max × 1.3, r13 pin × 0.7) — the floor keeps a single lucky
  pool from over-tightening an unchanged entry by more than ~30%.
* sub-0.5 s entries keep their r13 pins where those are looser —
  CAPPED at 2.0 (r14: q_dedup_survivors fell from ratio ~3 to ~0.3;
  inheriting its 5.6 pin verbatim would recreate exactly the
  silent-regression headroom VERDICT r13 #3 complained about).
* cold pin: max(r13 pin, pool max × 1.3) — cold pins adjudicate
  "confirmed regression" vs "re-run"; the safer error is
  under-confirmation, so they are never tightened past prior evidence.
* LOW_CORE_RATIO_MULT: the script prints the measured max over
  budgeted entries of (8-core warm ratio ÷ new warm pin) from
  plans/r14/bench_run_*_8core.json as the this-pool evidence; the
  SHIPPED value is 1.4 — the r13 cross-regime widening factor (its
  8-core probe raised q_ngram 3.1→3.65-needed, q_stream_tumbling
  2.9→3.26-needed against 32-core pins, and the r13 pins were widened
  ~1.3-1.5× to cover it) — because one clean 8-core r14 run showing
  no divergence is thinner evidence than r13's two-run regime study.

Run: python scripts/r14_repin.py
"""

from __future__ import annotations

import glob
import json
import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import bench  # noqa: E402

# The r13-generation pins, FROZEN here as the derivation baseline
# (bench.py's live tables are this script's OUTPUT, so reading them
# back would be circular once applied).
R13_WARM = {
    "q3_shipping_priority": 2.1, "q5_local_supplier_volume": 2.1,
    "q_ann_bruteforce": 1.4, "q_ann_lsh": 1.1, "q_ann_recall": 1.3,
    "q_knn_classify": 2.0, "q_ngram_jaccard_pairs": 4.8,
    "q_referential_integrity": 2.1, "q_stream_tumbling": 4.3,
    "q_bm25": 3.9, "q_value_outliers_mad": 1.8,
    "q_curriculum_order": 2.2, "q_dedup_incremental": 1.1,
    "q_mor_merge": 4.0, "q_column_profile": 2.9,
    "q_dedup_survivors": 5.6, "q_asof_join": 1.9,
    "q1_pricing_summary": 2.6, "q_bucketed_join": 3.9,
    "q_simhash": 2.5, "q_jaccard_pairs": 2.7, "q_event_pagerank": 3.3,
    "q10_returned_items": 1.8, "q_bpe_train": 3.2,
    "q_mor_compaction_plan": 2.6, "q_minhash_lsh": 3.3,
    "q_tfidf_top_terms": 2.4, "q_repetition_score": 2.6,
}
R13_COLD = {
    "q3_shipping_priority": 2.5, "q5_local_supplier_volume": 1.8,
    "q_ann_bruteforce": 3.2, "q_ann_lsh": 3.8, "q_ann_recall": 2.1,
    "q_knn_classify": 1.1, "q_ngram_jaccard_pairs": 1.9,
    "q_referential_integrity": 1.6, "q_stream_tumbling": 2.3,
    "q_bm25": 2.4, "q_value_outliers_mad": 1.9,
    "q_curriculum_order": 1.5, "q_dedup_incremental": 2.4,
    "q_mor_merge": 3.8, "q_column_profile": 4.7,
    "q_dedup_survivors": 6.5, "q_asof_join": 1.9,
    "q1_pricing_summary": 3.4, "q_bucketed_join": 4.3,
    "q_simhash": 4.2, "q_jaccard_pairs": 3.9, "q_event_pagerank": 4.1,
    "q10_returned_items": 1.0, "q_bpe_train": 4.4,
    "q_mor_compaction_plan": 2.4, "q_minhash_lsh": 4.8,
    "q_tfidf_top_terms": 1.4, "q_repetition_score": 1.0,
}

# plans changed this round (OPTIMIZATION_r14.md per-query record)
CHANGED = {
    "q_dedup_survivors",
    "q_minhash_lsh",
    "q_ngram_jaccard_pairs",
    "q_tfidf_top_terms",
    "q_bucketed_join",
}
SUB_HALF_SECOND = 0.5


def _ratios(run: dict) -> tuple[dict, dict, dict, dict]:
    p = run["passes"]
    warm_med = p["warm_median_sec"]
    cold_t = {**p["cold"], **p["extra_cold"]}
    cold_med = bench._median(
        [t for n, t in p["cold"].items() if n != "datagen_2m_rows_mor"]
    )
    warm_t = {**p["warm"], **p["extra_warm"]}
    wr = {n: t / warm_med for n, t in warm_t.items()}
    cr = {n: cold_t[n] / cold_med for n in cold_t}
    return wr, cr, warm_t, cold_t


def main() -> None:
    pool32 = sorted(glob.glob(os.path.join(_REPO, "plans/r14/bench_run_*_32core.json")))
    pool8 = sorted(glob.glob(os.path.join(_REPO, "plans/r14/bench_run_*_8core.json")))
    runs32 = [json.load(open(f)) for f in pool32]
    runs8 = [json.load(open(f)) for f in pool8]
    print(f"pool: {len(runs32)} x 32-core, {len(runs8)} x 8-core runs")

    r13_warm = dict(R13_WARM)
    r13_cold = dict(R13_COLD)

    warm_samples: dict[str, list[float]] = {}
    warm_abs: dict[str, list[float]] = {}
    cold_samples: dict[str, list[float]] = {}
    for f, run in zip(pool32, runs32):
        wr, cr, warm_t, cold_t = _ratios(run)
        for n in r13_warm:
            if n not in wr:
                continue
            if n in cr:
                cold_samples.setdefault(n, []).append(cr[n])
            warm_samples.setdefault(n, []).append(wr[n])
            warm_abs.setdefault(n, []).append(warm_t[n])
    # cross-run stall exclusion: same-code runs cannot genuinely differ
    # 1.75x on one entry — drop warm samples > 1.75x the pool minimum
    for n, ws in warm_samples.items():
        lo = min(ws)
        kept = [w for w in ws if w <= 1.75 * lo]
        for w in ws:
            if w > 1.75 * lo:
                print(f"  excluded stall sample: {n} warm_ratio={w:.2f} "
                      f"(pool min {lo:.2f})")
        warm_samples[n] = kept

    new_warm, new_cold, med_col = {}, {}, {}
    for n in sorted(r13_warm):
        ws = warm_samples.get(n) or [r13_warm[n] / 1.3]
        cs = cold_samples.get(n) or [r13_cold[n] / 1.3]
        med_col[n] = round(sorted(ws)[len(ws) // 2], 2)
        cushion = 1.4 if n in CHANGED else 1.3
        pin = max(ws) * cushion
        if n in CHANGED:
            pin = max(pin, 1.6)  # scheduler-noise floor on small entries
        else:
            pin = max(pin, r13_warm[n] * 0.7)
        if max(warm_abs.get(n, [1.0])) < SUB_HALF_SECOND:
            pin = max(pin, min(r13_warm[n], 2.0))
        new_warm[n] = round(pin, 1)
        new_cold[n] = round(max(r13_cold[n], max(cs) * 1.3), 1)

    # low-core multiplier from the 8-core runs against the NEW pins
    mult = 1.0
    worst = None
    for run in runs8:
        wr, cr, _, _ = _ratios(run)
        for n, pin in new_warm.items():
            if n in wr and wr[n] / pin > mult:
                mult = wr[n] / pin
                worst = (n, round(wr[n], 2), pin)
    mult = max(1.0, round(mult * 1.15, 1))
    print(f"LOW_CORE_RATIO_MULT = {mult}  (binding entry: {worst})")

    print("\nWARM_RATIO_BUDGETS = {")
    for n, v in sorted(new_warm.items(), key=lambda kv: -kv[1]):
        print(f'    "{n}": {v},')
    print("}")
    print("\nCOLD_RATIO_BUDGETS = {")
    for n, v in sorted(new_cold.items()):
        print(f'    "{n}": {v},')
    print("}")
    print("\nREADME warm rows:")
    for n, v in sorted(new_warm.items(), key=lambda kv: -med_col[kv[0]]):
        print(f"| `{n}` | {med_col[n]} | ≤{v} |")
    print("\nREADME cold rows:")
    for n, v in sorted(new_cold.items()):
        cmed = cold_samples.get(n) and round(
            sorted(cold_samples[n])[len(cold_samples[n]) // 2], 2
        ) or 0.0
        print(f"| `{n}` | {cmed} | ≤c{v} |")


if __name__ == "__main__":
    main()

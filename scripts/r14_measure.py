"""Round-14 measurement harness (guide §1: measure first).

Times the named queries through the noop sink with the SAME session/
warmup protocol as bench.py, and writes each query's
``explain("formatted")`` to ``plans/r14/<name>_<tag>.txt``.

Usage::

    python scripts/r14_measure.py <tag> [query ...]

``tag`` is ``before`` / ``after`` (the file suffix).  With no query
names, measures the full headline set plus the heavy extras.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

DEFAULT = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q_window_topk_per_group",
    "q_rollup",
    "q_asof_join",
    "q_word_freq",
    "q_dedup_exact",
    "q_jaccard_pairs",
    "q_minhash_lsh",
    "q_simhash",
    "q_ann_bruteforce",
    "q_ann_ivf",
    "q_embedding_neardup",
    "q_tfidf_top_terms",
    "q_stream_tumbling",
    # heavy extras
    "q_column_profile",
    "q_dedup_survivors",
    "q_mor_merge",
    "q_bucketed_join",
    "q_ngram_jaccard_pairs",
    "q_event_pagerank",
    "q_bpe_train",
    "q_mor_compaction_plan",
    "q_bm25",
    "q_referential_integrity",
    "q_minhash_lsh",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    passes = int(os.environ.get("R14_PASSES", "2"))

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import tempfile

    if os.path.isdir("/dev/shm"):
        shm = "/dev/shm/spark-bench-tmp"
        os.makedirs(shm, exist_ok=True)
        os.environ["TMPDIR"] = shm
        tempfile.tempdir = None

    from iceberg_data_gen_spark import operators
    from iceberg_data_gen_spark.session import get_spark

    operators.load_all()
    spark = get_spark(
        "r14-measure",
        extra_conf={"spark.local.dir": os.environ.get("TMPDIR", "/tmp")},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # bench.py's warmup protocol
    operators.QUERIES["q6_forecast_revenue"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    def _noop_batches(batches):
        yield from batches

    spark.range(32).mapInPandas(_noop_batches, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    operators.QUERIES["q_stream_tumbling"](spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache()

    plans_dir = os.path.join(REPO, "plans", "r14")
    os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, list[float]] = {}
    seen = set()
    names = [n for n in names if not (n in seen or seen.add(n))]
    for i in range(passes):
        for name in names:
            spark.sparkContext.setJobDescription(f"{name} pass {i}")
            t0 = time.perf_counter()
            df = operators.QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            results.setdefault(name, []).append(round(dt, 3))
            if i == 0:
                with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                    f.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                    ))
            spark.sparkContext.setJobDescription(None)
    print(f"== {tag} ==")
    for name, ts in sorted(results.items(), key=lambda kv: -min(kv[1])):
        print(f"{min(ts):7.3f}  {' '.join(f'{t:.3f}' for t in ts)}  {name}")
    import json

    # merge into any existing tag file: incremental runs over a subset of
    # queries must not clobber the full-set timings already captured
    path = os.path.join(plans_dir, f"timings_{tag}.json")
    merged: dict[str, list[float]] = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    merged.update(results)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()

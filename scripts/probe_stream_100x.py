"""100x streaming-state probe (VERDICT r7 #4): drive the two state-heavy
streaming operators (STREAM_OPERATOR_PROBES — foreachBatch->noop, so the
timing is operator + state store, not sink) at 1x and at 100x events in
TWO 100x variants that separate the scaling dimensions:

* ``keys x100``: 100 key-shifted copies (user_id + event_id shifted) —
  events x100 AND distinct keys x100.  State volume should grow ~100x.
* ``keys x1``: 100 copies shifting ONLY event_id — events x100, distinct
  keys UNCHANGED.  State volume should stay ~flat; a wall-clock ratio
  tracking the keys-x100 one instead would mean state grows with EVENT
  COUNT (eviction broken / per-event state retained).

Each probed run is replayed as ~4 micro-batches (maxFilesPerTrigger) so
watermark eviction actually has batch boundaries to fire on, and the
final progress's ``stateOperators[].numRowsTotal`` is reported — for the
session-window probe that number must sit far below the total session
count (evicted state), and for applyInPandasWithState it must equal the
distinct-key count exactly (its contract: one state row per user,
forever — NoTimeout keeps per-key state, which is why its wall ratio
tracks keys, not events).

Run: python scripts/probe_stream_100x.py          (factor 100, sf0.1)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_SCALE_FACTOR, SPARK_GRAFT_CPUS
Output: one JSON line per probe + a summary JSON line.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "100"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "16")
DEST_KEYS = f"/tmp/spark_graft_stream_x{FACTOR}_keys"
DEST_SAMEKEYS = f"/tmp/spark_graft_stream_x{FACTOR}_samekeys"
KEY_SHIFT = 100_000_000


def build_events(spark, dest: str, shift_keys: bool) -> None:
    from pyspark.sql import functions as F

    from iceberg_data_gen_spark.session import load_table

    marker = os.path.join(dest, "_SUCCESS")
    stamp = f"{SRC}|{FACTOR}|{shift_keys}"
    if os.path.isfile(marker) and Path(marker).read_text() == stamp:
        return
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest)
    base = load_table(spark, SRC, "events")
    copies = []
    for i in range(FACTOR):
        df = base.withColumn("event_id", F.col("event_id") + F.lit(i * KEY_SHIFT))
        if shift_keys:
            df = df.withColumn("user_id", F.col("user_id") + F.lit(i * KEY_SHIFT))
        copies.append(df)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    # ~32 part files -> with maxFilesPerTrigger = ceil(n/4) the stream
    # replays as ~4 micro-batches, giving watermark eviction real batch
    # boundaries to fire on
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(dest, "events.parquet")
    )
    Path(marker).write_text(stamp)


def state_rows(progress: dict | None) -> int | None:
    if not progress:
        return None
    ops = progress.get("stateOperators") or []
    return sum(op.get("numRowsTotal", 0) for op in ops) if ops else None


def main() -> None:
    from iceberg_data_gen_spark.session import get_spark, load_table

    spark = get_spark(
        "stream-probe-100x",
        master=f"local[{CPUS}]",
        shuffle_partitions=32,
        extra_conf={
            "spark.driver.memory": "16g",
            "spark.driver.maxResultSize": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from iceberg_data_gen_spark import operators  # noqa: F401
    from iceberg_data_gen_spark.streaming import events as ev_mod

    operators.load_all()
    build_events(spark, DEST_KEYS, shift_keys=True)
    build_events(spark, DEST_SAMEKEYS, shift_keys=False)

    n_keys_1x = load_table(spark, SRC, "events").select("user_id").distinct().count()
    n_events_1x = load_table(spark, SRC, "events").count()
    print(
        f"1x: {n_events_1x} events / {n_keys_1x} keys; "
        f"{FACTOR}x keys-variant: {n_keys_1x * FACTOR} keys; "
        f"samekeys-variant: {n_keys_1x} keys",
        file=sys.stderr,
        flush=True,
    )

    def run_probe(name: str, sf_dir: str, files_per_trigger: int | None):
        old = ev_mod.STREAM_MAX_FILES_PER_TRIGGER
        ev_mod.STREAM_MAX_FILES_PER_TRIGGER = files_per_trigger
        try:
            t0 = time.time()
            progress = ev_mod.STREAM_OPERATOR_PROBES[name](spark, sf_dir)
            dt = time.time() - t0
        finally:
            ev_mod.STREAM_MAX_FILES_PER_TRIGGER = old
        return dt, state_rows(progress)

    def n_files(sf_dir: str) -> int:
        d = os.path.join(sf_dir, "events.parquet")
        if os.path.isdir(d):
            return len([f for f in os.listdir(d) if f.endswith(".parquet")])
        return 1

    report: dict[str, dict] = {}
    for name in ("q_stream_session", "q_stream_stateful"):
        entry: dict = {}
        # 1x: single-file driver layout -> one batch (matches the
        # registered-query behavior the README 10x column measured)
        run_probe(name, SRC, None)  # warm
        t1 = min(run_probe(name, SRC, None)[0], run_probe(name, SRC, None)[0])
        entry["t1"] = round(t1, 2)
        for label, dest in (("keys", DEST_KEYS), ("samekeys", DEST_SAMEKEYS)):
            fpt = max(1, math.ceil(n_files(dest) / 4))
            tN, srows = run_probe(name, dest, fpt)
            tN2, srows2 = run_probe(name, dest, fpt)
            tN = min(tN, tN2)
            entry[f"t{FACTOR}_{label}"] = round(tN, 2)
            entry[f"ratio_{label}"] = round(tN / t1, 2)
            # `srows or srows2` would treat a legitimate 0 (all state
            # evicted past the watermark — the eviction witness itself)
            # as missing (review r8)
            entry[f"state_rows_{label}"] = srows if srows is not None else srows2
        report[name] = entry
        print(name, entry, file=sys.stderr, flush=True)

    print(
        json.dumps(
            {
                "factor": FACTOR,
                "src": SRC,
                "events_1x": n_events_1x,
                "keys_1x": n_keys_1x,
                "probe": report,
            }
        )
    )


if __name__ == "__main__":
    main()

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

Round 9 adds the BOUNDED-STATE probe (VERDICT r8 #6): the TTL variant
(``q_stream_stateful_ttl``, EventTimeTimeout) driven over a keys-x100
dataset whose copies are ALSO time-shifted (disjoint event-time ranges,
written as mtime-ordered chunks so micro-batches replay in event-time
order — no late-data resurrection).  The NoTimeout operator on that
dataset must hold ~100x keys of state; the TTL operator must end with
state bounded by the users active inside the trailing ttl+watermark
window — sub-linear in total distinct users, the unbounded-cardinality
production posture.

Run: python scripts/probe_stream_100x.py          (factor 100, sf0.1)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_SCALE_FACTOR, SPARK_GRAFT_CPUS,
     SPARK_GRAFT_TTL_ONLY=1 (skip the r8 probes, run only the TTL one)
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
DEST_KEYS_TIMED = f"/tmp/spark_graft_stream_x{FACTOR}_keystimed"
KEY_SHIFT = 100_000_000
TTL_ONLY = os.environ.get("SPARK_GRAFT_TTL_ONLY") == "1"
TIMED_CHUNKS = 8  # chunk = one micro-batch of the time-ordered replay


def build_events(spark, dest: str, shift_keys: bool) -> None:
    from pyspark.sql import functions as F

    from iceberg_data_gen_spark.session import load_table

    marker = os.path.join(dest, "_SUCCESS")
    # include the source mtime: the driver regenerates same-path testdata
    # between rounds, and a path-only stamp would reuse a stale corpus
    src_mt = int(os.path.getmtime(os.path.join(SRC, "events.parquet")))
    stamp = f"{SRC}|{FACTOR}|{shift_keys}|{src_mt}"
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


def build_events_timed(spark, dest: str) -> int:
    """Keys-x{FACTOR} copies with DISJOINT, increasing event-time ranges
    (copy i shifted by i * (span + 1h)), written as {TIMED_CHUNKS}
    mtime-ordered chunks so the file stream replays them as event-time-
    ordered micro-batches.  A user's events live entirely inside one
    chunk, so an evicted user never receives later events (no late-data
    state resurrection) — the clean geometry for measuring TTL eviction.
    Returns the number of part files per chunk."""
    import time as _time

    from pyspark.sql import functions as F

    from iceberg_data_gen_spark.session import load_table

    files_per_chunk = 4
    marker = os.path.join(dest, "_SUCCESS")
    src_mt = int(os.path.getmtime(os.path.join(SRC, "events.parquet")))
    stamp = f"{SRC}|{FACTOR}|timed|{TIMED_CHUNKS}|{files_per_chunk}|{src_mt}"
    if os.path.isfile(marker) and Path(marker).read_text() == stamp:
        return files_per_chunk
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest)
    base = load_table(spark, SRC, "events")
    lo, hi = base.agg(F.min("ts"), F.max("ts")).collect()[0]
    step_s = int((hi - lo).total_seconds()) + 3600
    out_dir = os.path.join(dest, "events.parquet")
    per_chunk = math.ceil(FACTOR / TIMED_CHUNKS)
    seen: set[str] = set()
    chunk_idx = 0
    for c0 in range(0, FACTOR, per_chunk):
        copies = []
        for i in range(c0, min(c0 + per_chunk, FACTOR)):
            copies.append(
                base.withColumn("event_id", F.col("event_id") + F.lit(i * KEY_SHIFT))
                .withColumn("user_id", F.col("user_id") + F.lit(i * KEY_SHIFT))
                .withColumn(
                    "ts", F.col("ts") + F.expr(f"INTERVAL {i * step_s} SECONDS")
                )
            )
        chunk = copies[0]
        for c in copies[1:]:
            chunk = chunk.unionByName(c)
        chunk.coalesce(files_per_chunk).write.mode("append").parquet(out_dir)
        # bump THIS chunk's new part files one second per chunk so the
        # file source (oldest-mtime-first) replays chunks in time order
        parts = {
            os.path.join(out_dir, f)
            for f in os.listdir(out_dir)
            if f.endswith(".parquet")
        }
        now = _time.time()
        for p in parts - seen:
            os.utime(p, (now + chunk_idx, now + chunk_idx))
        seen = parts
        chunk_idx += 1
    Path(marker).write_text(stamp)
    return files_per_chunk


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
    if not TTL_ONLY:
        # only the r8 probes read these two datasets; TTL_ONLY must not
        # pay their FACTOR-way union writes (review r9)
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
    probed = () if TTL_ONLY else ("q_stream_session", "q_stream_stateful")
    for name in probed:
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

    # bounded-state probe (r9): NoTimeout vs TTL on the SAME time-shifted
    # keys-x100 dataset — NoTimeout must hold ~keys_total state rows; the
    # TTL variant must end with state bounded by the trailing activity
    # window (sub-linear in total distinct users)
    fpt = build_events_timed(spark, DEST_KEYS_TIMED)
    ttl_entry: dict = {"keys_total": n_keys_1x * FACTOR}
    for name in ("q_stream_stateful", "q_stream_stateful_ttl"):
        t, srows = run_probe(name, DEST_KEYS_TIMED, fpt)
        ttl_entry[f"{name}_t"] = round(t, 2)
        ttl_entry[f"{name}_state_rows"] = srows
    ttl_entry["state_reduction"] = (
        round(
            ttl_entry["q_stream_stateful_state_rows"]
            / max(ttl_entry["q_stream_stateful_ttl_state_rows"], 1),
            1,
        )
        if ttl_entry.get("q_stream_stateful_state_rows")
        and ttl_entry.get("q_stream_stateful_ttl_state_rows") is not None
        else None
    )
    report["stateful_ttl_bounded_state"] = ttl_entry
    print("stateful_ttl_bounded_state", ttl_entry, file=sys.stderr, flush=True)

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

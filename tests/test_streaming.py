"""Streaming behavior tests: stateful operator, multi-batch incremental
processing, and watermark-based late-data dropping (the semantics a
single-batch run can't show)."""

from __future__ import annotations

import os
import shutil
from pathlib import Path

from pyspark.sql import functions as F

from iceberg_data_gen_spark import operators

operators.load_all()

from tests.conftest import SF_DIR, SF_SMALL


def test_stateful_totals_match_batch(spark):
    """applyInPandasWithState end-state equals the batch groupBy —
    EXACTLY, not to a rounding tolerance: the state function accumulates
    integer cents (r8), so its total is bit-identical to the exact
    DECIMAL(18,2) batch sum cast to double."""
    from iceberg_data_gen_spark.session import load_table

    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in operators.QUERIES["q_stream_stateful"](spark, SF_SMALL).collect()
    }
    want = {
        r.user_id: (r.n, r.tv)
        for r in load_table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("tv"),
        )
        .collect()
    }
    assert got == want


def test_stateful_multibatch_oracle_columns(spark):
    """The oracle's n_events/total_value columns are micro-batch-count
    INDEPENDENT: replaying the same events as multiple micro-batches
    changes only n_batches (the oracle pins n_batches=1 because the
    driver's single-file layout is single-batch — this test is the pin
    for the other half of that contract).  Uses a directory of 3 part
    files + maxFilesPerTrigger=1 so the stream genuinely accumulates
    state across triggers."""
    import os
    import time

    from iceberg_data_gen_spark.session import load_table
    from iceberg_data_gen_spark.streaming import events as ev_mod
    from iceberg_data_gen_spark.operators.common import scratch_dir

    base = scratch_dir("stateful-mb-")
    ev = load_table(spark, SF_SMALL, "events")
    # 3 part files with strictly increasing mtimes -> deterministic
    # oldest-first micro-batch order under maxFilesPerTrigger=1
    d = os.path.join(base, "events.parquet")
    seen: set[str] = set()
    for i in range(3):
        ev.where(F.pmod("event_id", F.lit(3)) == i).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        # identify THIS write's part file by set difference, not by
        # max-mtime (review r8: the previous iteration's bump pushed its
        # file into the future, so max-mtime could re-touch the OLD file
        # and leave the order interleaved)
        parts = {
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        }
        (newest,) = parts - seen
        seen = parts
        os.utime(newest, (time.time() + i, time.time() + i))

    want = {
        r.user_id: (r.n, r.tv)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("tv"),
        )
        .collect()
    }
    old_trigger = ev_mod.STREAM_MAX_FILES_PER_TRIGGER
    ev_mod.STREAM_MAX_FILES_PER_TRIGGER = 1
    try:
        rows = operators.QUERIES["q_stream_stateful"](spark, base).collect()
    finally:
        ev_mod.STREAM_MAX_FILES_PER_TRIGGER = old_trigger
    got = {r.user_id: (r.n_events, r.total_value) for r in rows}
    assert got == want
    # at least one user must have genuinely crossed micro-batches
    assert max(r.n_batches for r in rows) > 1


def test_watermark_drops_late_rows(spark, tmp_path):
    """Two micro-batches: batch 2 contains an event older than
    (max event time − watermark) → the late row must NOT appear in
    append-mode output, while an in-watermark row must."""
    from iceberg_data_gen_spark.session import load_table

    src = tmp_path / "stream_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    ev = load_table(spark, SF_SMALL, "events").select("event_id", "ts", "event_type", "value")
    # batch 1: everything except the final hour of event time
    mx = ev.agg(F.max("ts")).collect()[0][0]
    cutoff = F.lit(mx) - F.expr("INTERVAL 1 HOUR")
    ev.where(F.col("ts") < cutoff).coalesce(1).write.mode("overwrite").parquet(
        str(src / "b1")
    )

    stream = (
        spark.readStream.schema(ev.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(str(src) + "/*")
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_test")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: the final-hour rows (advance watermark) + one VERY late row
        late = ev.limit(0).sparkSession.createDataFrame(
            [(999999, mx.replace(year=2023), "late", 1.0)], schema=ev.schema
        )
        recent = ev.where(F.col("ts") >= cutoff)
        recent.unionByName(late).coalesce(1).write.mode("overwrite").parquet(
            str(src / "b2")
        )
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.table("wm_test")
    # the 2023 late row's window must be absent from append output
    n_2023 = out.where(F.year(F.col("window.start")) == 2023).count()
    assert n_2023 == 0
    # windows from batch 1 (now past the watermark) must have been emitted
    assert out.count() > 0


def test_asof_join_nulls_for_unmatched(spark):
    """Events of users with no prior orders get null as-of matches."""
    df = operators.QUERIES["q_asof_join"](spark, SF_SMALL)
    rows = df.collect()
    assert len(rows) > 0
    matched = [r for r in rows if r.last_orderkey is not None]
    assert matched, "expected at least some as-of matches"
    for r in matched[:50]:
        assert r.last_orderdate <= r.ts


def test_foreachbatch_sink_into_mor_table(spark, tmp_path):
    """Streaming → table-format sink: a foreachBatch writer appends each
    micro-batch to the MoR table as one committed snapshot (the
    Iceberg-style streaming ingestion path — reference's table layer fed
    by a stream instead of the datagen loop).  End state: the table scan
    equals the batch source, and the snapshot log shows exactly one
    append per non-empty micro-batch."""
    from iceberg_data_gen_spark.datagen.config import FileConfig
    from iceberg_data_gen_spark.datagen.generator import FixSchemaGenerator
    from iceberg_data_gen_spark.streaming.events import read_events_stream
    from iceberg_data_gen_spark.table.table import MoRTable

    fc = FileConfig(rows_per_file=1, file_count=1)
    schema = FixSchemaGenerator(fc, fc, fc).schema()
    table = MoRTable.create(spark, str(tmp_path / "stream_sink"), schema)

    def write_batch(batch_df, batch_id):
        projected = batch_df.select(
            F.col("event_id").cast("string").alias("foo"),
            F.col("event_id").cast("int").alias("bar"),
            F.lit(True).alias("baz"),
        )
        table.append_batches([projected])

    ev = read_events_stream(spark, SF_SMALL)
    q = ev.writeStream.foreachBatch(write_batch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    n_events = spark.read.parquet(f"{SF_SMALL}/events.parquet").count()
    assert table.scan().count() == n_events
    snaps = table.snapshots()
    assert len(snaps) >= 1
    assert all(s["operation"] == "append" for s in snaps)


def test_tws_running_totals_gated(spark):
    """transformWithStateInPandas seam: runs for real where protobuf
    exists; raises the documented ImportError here (container lacks it)."""
    import pytest

    from iceberg_data_gen_spark.streaming.events import tws_running_totals

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="protobuf"):
            tws_running_totals(spark, SF_DIR)
        return
    out = tws_running_totals(spark, SF_DIR)
    assert {"user_id", "n_events", "total_value"} <= set(out.columns)
    assert out.count() > 0


def test_mor_stream_checkpoint_restart(spark, tmp_path):
    """The MoR CDC source must resume from its checkpointed snapshot
    offset: after a stop/restart with the same checkpointLocation, only
    snapshots committed while the stream was down are processed — no
    replay of consumed data, none skipped (exactly-once consumption)."""
    from pyspark.sql import functions as F

    from iceberg_data_gen_spark.datagen.config import FileConfig
    from iceberg_data_gen_spark.datagen.generator import FixSchemaGenerator
    from iceberg_data_gen_spark.sources.mor_stream import register_mor_stream
    from iceberg_data_gen_spark.table.table import MoRTable

    fc = FileConfig(rows_per_file=100, file_count=1)
    path = str(tmp_path / "cdc")
    ckpt = str(tmp_path / "ckpt")
    out_dir = tmp_path / "sink"
    out_dir.mkdir()
    t = MoRTable.create(spark, path, FixSchemaGenerator(fc, fc, fc).schema())

    def rows(a, b):
        return spark.range(a, b).select(
            F.col("id").cast("string").alias("foo"),
            F.col("id").cast("int").alias("bar"),
            F.lit(True).alias("baz"),
        )

    register_mor_stream(spark)

    batches: list[list[int]] = []

    def sink(batch_df, batch_id):
        got = sorted(r.bar for r in batch_df.collect())
        if got:
            batches.append(got)

    def run_stream():
        q = (
            spark.readStream.format("mor-stream")
            .option("path", path)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    t.append(rows(0, 100), single_file=True)
    t.append(rows(100, 200), single_file=True)
    run_stream()
    first = [b for bs in batches for b in bs]
    assert sorted(first) == list(range(200))

    batches.clear()
    t.append(rows(200, 300), single_file=True)  # committed while down
    run_stream()
    second = [b for bs in batches for b in bs]
    assert sorted(second) == list(range(200, 300)), "replayed or skipped rows"


def test_mor_stream_branch_visibility_and_schema_evolution(spark, tmp_path):
    """Review r7, two mor-stream reader bugs: (a) a branch-only append
    leaked to stream consumers before fast_forward (incremental_scan
    hides it via the main-visibility rule; the reader only filtered
    WAP-staged commits) — worse, the offset advanced past it, so the
    rows were ALSO never redelivered after publication; (b) replaying
    files written before add_column crashed pyarrow by requesting the
    added column from footers that don't have it — MoRTable.scan
    projects NULLs, the stream must too."""
    from pyspark.sql import functions as F

    from iceberg_data_gen_spark.datagen.config import FileConfig
    from iceberg_data_gen_spark.datagen.generator import FixSchemaGenerator
    from iceberg_data_gen_spark.sources.mor_stream import register_mor_stream
    from iceberg_data_gen_spark.table.table import MoRTable

    fc = FileConfig(rows_per_file=100, file_count=1)
    path = str(tmp_path / "cdc")
    ckpt = str(tmp_path / "ckpt")
    t = MoRTable.create(spark, path, FixSchemaGenerator(fc, fc, fc).schema())

    def rows(a, b):
        return spark.range(a, b).select(
            F.col("id").cast("string").alias("foo"),
            F.col("id").cast("int").alias("bar"),
            F.lit(True).alias("baz"),
        )

    register_mor_stream(spark)
    batches: list[list[int]] = []

    def sink(batch_df, batch_id):
        got = sorted(r.bar for r in batch_df.collect())
        if got:
            batches.append(got)

    def run_stream(cp=ckpt):
        q = (
            spark.readStream.format("mor-stream")
            .option("path", path)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", cp)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    t.append(rows(0, 100), single_file=True)
    t.create_branch("audit")
    t.append(rows(100, 200), single_file=True, branch="audit")
    run_stream()
    got = [b for bs in batches for b in bs]
    assert sorted(got) == list(range(100)), "branch-only commit leaked to main stream"

    batches.clear()
    t.fast_forward("audit")  # branch commits become main-visible
    run_stream()
    got = [b for bs in batches for b in bs]
    assert sorted(got) == list(range(100, 200)), "published branch rows lost or duplicated"

    # schema evolution: old files lack the new column; a fresh replay
    # from offset 0 must project NULLs for them, not crash
    t.add_column("score", "double")
    t.append(
        rows(200, 250).withColumn("score", F.col("bar").cast("double")),
        single_file=True,
    )
    seen: list[tuple] = []

    def sink2(batch_df, batch_id):
        seen.extend((r.bar, r.score) for r in batch_df.collect())

    q = (
        spark.readStream.format("mor-stream")
        .option("path", path)
        .load()
        .writeStream.foreachBatch(sink2)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(b for b, _ in seen) == list(range(250))
    assert all(s is None for b, s in seen if b < 200)
    assert all(s == float(b) for b, s in seen if b >= 200)


def test_mor_stream_schema_passes_all_table_types(spark, tmp_path):
    """Review r7: the source's schema() used a 5-entry identity type map
    and KeyError'd on any other table-supported type (float, bigint);
    it now passes the stored DDL names straight through."""
    from iceberg_data_gen_spark.sources.mor_stream import register_mor_stream
    from iceberg_data_gen_spark.table.table import Field, MoRTable, TableSchema

    schema = TableSchema(
        fields=[
            Field(1, "a", "string"),
            Field(2, "b", "float"),
            Field(3, "c", "bigint"),
        ]
    )
    MoRTable.create(spark, str(tmp_path / "t"), schema)
    register_mor_stream(spark)
    df = (
        spark.readStream.format("mor-stream")
        .option("path", str(tmp_path / "t"))
        .load()
    )
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string",
        "float",
        "bigint",
    ]


def test_stream_partitions_pin_and_restore(spark):
    """run_to_completion pins the state-store partition count for the
    bounded run and restores the session conf afterwards — including
    when the streaming query raises."""
    import pytest

    from iceberg_data_gen_spark.streaming.events import (
        run_to_completion,
        stream_partitions,
    )

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)

    seen = {}
    with stream_partitions(spark, 8):
        seen["inside"] = spark.conf.get(key)
    assert seen["inside"] == "8"
    assert spark.conf.get(key) == before

    # failure path: the conf is restored even when the body raises
    with pytest.raises(RuntimeError, match="boom"):
        with stream_partitions(spark, 8):
            raise RuntimeError("boom")
    assert spark.conf.get(key) == before

    # end-to-end through a real bounded stream
    stream = spark.readStream.format("rate").option("rowsPerSecond", "10").load()
    from pyspark.sql import functions as F

    agg = stream.groupBy().agg(F.count(F.lit(1)).alias("n"))
    out = run_to_completion(agg)
    assert spark.conf.get(key) == before
    assert "n" in out.columns


def test_events_stream_reads_all_physical_layouts(spark, tmp_path):
    """The events stream source must read every physical layout the
    column has shipped in: the driver's flat single file, a Spark-written
    directory with INT96 timestamps (Spark's default writer output), and
    a directory with (tz-annotated) TIMESTAMP_MICROS — all three must
    produce identical windowed aggregates."""
    import os

    from iceberg_data_gen_spark.operators import QUERIES
    from iceberg_data_gen_spark.session import load_table

    sf = SF_SMALL
    ref = QUERIES["q_stream_tumbling"](spark, sf).count()
    ev = load_table(spark, sf, "events")
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    for label, out_type in (("int96", "INT96"), ("micros", "TIMESTAMP_MICROS")):
        d = tmp_path / label
        os.makedirs(d)
        spark.conf.set("spark.sql.parquet.outputTimestampType", out_type)
        try:
            ev.write.mode("overwrite").parquet(str(d / "events.parquet"))
        finally:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
        assert QUERIES["q_stream_tumbling"](spark, str(d)).count() == ref, label


def test_stateful_final_state_with_negative_values(spark, tmp_path):
    """Regression: the stateful query's final-state extraction took an
    independent max() over each column, which returns an intermediate
    (or never-existed) state whenever total_value is not monotonic —
    i.e. any negative event value.  The row with the highest batch
    count is the final state."""
    import datetime as dt

    from iceberg_data_gen_spark.streaming import events as ev_mod

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    # TWO files -> (with maxFilesPerTrigger=1) two micro-batches, so the
    # memory sink holds two update rows per user.  User 1's total goes
    # DOWN in batch 2; max(total_value) would report the intermediate 3.0.
    batches = [
        [(1, base, 3.0), (2, base, 1.0)],
        [(1, base + dt.timedelta(minutes=1), -2.5),
         (2, base + dt.timedelta(minutes=1), 2.0)],
    ]
    for rows in batches:
        spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double"
        ).coalesce(1).write.mode("append").parquet(str(tmp_path / "events.parquet"))

    old_trigger = ev_mod.STREAM_MAX_FILES_PER_TRIGGER
    ev_mod.STREAM_MAX_FILES_PER_TRIGGER = 1
    try:
        got = {
            r.user_id: (r.n_events, r.total_value)
            for r in operators.QUERIES["q_stream_stateful"](
                spark, str(tmp_path)
            ).collect()
        }
    finally:
        ev_mod.STREAM_MAX_FILES_PER_TRIGGER = old_trigger
    assert got[1] == (2, 0.5), got
    assert got[2] == (2, 3.0), got


def test_stateful_n_batches_counts_triggers_not_arrow_chunks(spark, tmp_path):
    """Review r8: ``make_stateful_count`` incremented its batch counter
    once per pandas frame from ``pdf_iter`` — but that iterator yields
    one frame per ARROW CHUNK, so a key whose rows in a single trigger
    exceed ``spark.sql.execution.arrow.maxRecordsPerBatch`` reported
    n_batches = 2+ against the oracle's pinned 1.  The counter must
    count invocations (one per key per trigger).  Forces the condition
    by shrinking the Arrow batch size below one key's row count."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base + dt.timedelta(seconds=i), 1.0) for i in range(500)
    ] + [(2, base, 2.0)]
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        got = {
            r.user_id: (r.n_events, r.total_value, r.n_batches)
            for r in operators.QUERIES["q_stream_stateful"](
                spark, str(tmp_path)
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    # single file, no maxFilesPerTrigger -> ONE trigger: n_batches must
    # be 1 even though user 1's 500 rows arrived as 5 Arrow chunks
    assert got[1] == (500, 500.0, 1), got
    assert got[2] == (1, 2.0, 1), got


def test_stream_dedup_recounts_after_watermark_eviction(spark, tmp_path):
    """Pins dropDuplicatesWithinWatermark's REAL contract (review r7):
    one event per key within the watermark delay; a key recurring after
    its state was evicted is counted AGAIN — the documented price of
    bounded state.  The DISTINCT oracle matches only under the driver's
    single-file (single micro-batch) layout; this test replays four
    micro-batches (part files written with strictly increasing mtimes —
    the file source processes oldest-first, so batch order is
    deterministic) to assert both halves of the contract:

    * a duplicate arriving while the key's state is alive is dropped;
    * a recurrence after eviction re-counts.
    """
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_data_gen_spark import operators
    from iceberg_data_gen_spark.streaming import events as ev_mod

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    d = tmp_path / "events.parquet"
    d.mkdir()

    def mk(i, rows):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        p = d / f"part-{i:03d}.parquet"
        pq.write_table(tbl, p)
        os.utime(p, (1_700_000_000 + 60 * i, 1_700_000_000 + 60 * i))

    # batch 1: two click users + an advancer keeping watermark at t0-5m
    mk(0, [(1, t0, 1, "click"), (2, t0, 2, "click"), (3, t0 + 5 * m, 9, "view")])
    # batch 2: u2 duplicate at t0+2m (state alive: wm t0-5m < expiry
    # t0+10m -> DROPPED) + an advancer pushing the watermark to t0+35m,
    # which expires both click keys (event ts + 10m < wm)
    mk(1, [(4, t0 + 2 * m, 2, "click"), (5, t0 + 45 * m, 8, "view")])
    # batch 3: filler — state CLEANUP runs at a batch commit AFTER the
    # watermark advanced (measured: eviction lags the advancing batch by
    # one), so the eviction of both click keys lands here
    mk(2, [(6, t0 + 46 * m, 7, "view")])
    # batch 4: u1 recurs at t0+40m, AFTER eviction -> counted again
    mk(3, [(7, t0 + 40 * m, 1, "click")])

    old = ev_mod.STREAM_MAX_FILES_PER_TRIGGER
    ev_mod.STREAM_MAX_FILES_PER_TRIGGER = 1
    try:
        got = {
            r.event_type: r.n_users
            for r in operators.QUERIES["q_stream_dedup"](
                spark, str(tmp_path)
            ).collect()
        }
    finally:
        ev_mod.STREAM_MAX_FILES_PER_TRIGGER = old
    # click: u1 + u2 (batch 1) + u1-again (batch 4) = 3; the batch-2
    # duplicate was dropped (4 would mean no dedup at all); DISTINCT
    # semantics would say 2 — the recount is the operator's contract
    assert got["click"] == 3, got
    assert got["view"] == 3, got  # three distinct advancer users


def test_mor_stream_bounds_each_batch_to_one_append(spark, tmp_path):
    """A catch-up over a multi-commit backlog must arrive as one
    micro-batch PER visible append snapshot, never one driver-side list
    of the entire backlog (review r7: read() drained last-offset→head in
    one call, so driver memory scaled with downtime instead of with one
    commit).  Iceberg's streaming read bounds micro-batches the same way."""
    from pyspark.sql import functions as F

    from iceberg_data_gen_spark.datagen.config import FileConfig
    from iceberg_data_gen_spark.datagen.generator import FixSchemaGenerator
    from iceberg_data_gen_spark.sources.mor_stream import register_mor_stream
    from iceberg_data_gen_spark.table.table import MoRTable

    fc = FileConfig(rows_per_file=50, file_count=1)
    path = str(tmp_path / "backlog")
    t = MoRTable.create(spark, path, FixSchemaGenerator(fc, fc, fc).schema())

    def rows(a, b):
        return spark.range(a, b).select(
            F.col("id").cast("string").alias("foo"),
            F.col("id").cast("int").alias("bar"),
            F.lit(True).alias("baz"),
        )

    # three appends committed BEFORE the stream starts = the backlog
    for a in range(0, 150, 50):
        t.append(rows(a, a + 50), single_file=True)

    register_mor_stream(spark)
    batches: list[list[int]] = []

    def sink(batch_df, batch_id):
        got = sorted(r.bar for r in batch_df.collect())
        if got:
            batches.append(got)

    q = (
        spark.readStream.format("mor-stream")
        .option("path", path)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # one batch per append commit, each exactly that commit's rows
    assert batches == [list(range(a, a + 50)) for a in range(0, 150, 50)]


def test_fixseq_stream_honors_start_at(spark, tmp_path):
    """Review r7: the fixseq STREAM reader silently ignored start_at (the
    batch reader honors it), so the same option changed meaning between
    read and readStream — wrong data with no error.  The stream now
    emits total_rows rows FROM start_at."""
    from pyspark.sql import functions as F

    from iceberg_data_gen_spark.sources.fixseq import register_fixseq

    register_fixseq(spark)
    got: list[int] = []

    def sink(batch_df, _id):
        got.extend(r.bar for r in batch_df.collect())

    q = (
        spark.readStream.format("fixseq")
        .option("start_at", 100)
        .option("total_rows", 50)
        .option("rows_per_batch", 20)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(got) == list(range(100, 150)), (len(got), sorted(got)[:5])
    # batch flavor agrees on the same options
    batch = (
        spark.read.format("fixseq")
        .option("start_at", 100)
        .option("rows_per_file", 50)
        .option("file_count", 1)
        .load()
    )
    assert sorted(r.bar for r in batch.collect()) == list(range(100, 150))


def test_fixseq_stream_offset_never_regresses():
    """Review r8: restarting a checkpointed fixseq stream with a SMALLER
    total_rows/start_at made ``read`` return an offset below the
    incoming one (end = min(g+batch, start+total) < g) — a
    non-monotonic offset log.  The cursor must hold instead: empty
    batch, offset unchanged."""
    from iceberg_data_gen_spark.sources.fixseq import make_fixseq_datasource

    ds = make_fixseq_datasource()(
        options={"rows_per_batch": 20, "total_rows": 1000, "start_at": 0}
    )
    reader = ds.simpleStreamReader(None)
    # checkpointed cursor from a previous, larger configuration
    rows, off = reader.read({"g": 5000})
    assert off == {"g": 5000}
    assert list(rows) == []
    # and a normal mid-stream read still advances
    rows, off = reader.read({"g": 980})
    assert off == {"g": 1000}
    assert len(list(rows)) == 20


def test_stateful_ttl_evicts_idle_users_and_emits_final_rows(spark):
    """VERDICT r8 #6: the bounded-state variant must EVICT a user idle
    past the TTL (state removed, final row emitted with final=True) and
    keep accumulating for active users — state at end is bounded by the
    trailing activity window, not by all users ever seen.

    Layout: 3 mtime-ordered files / 1-file triggers.  User 1 appears
    only in batch 1; user 2 appears in all three, two event-time hours
    apart.  With a 30-min TTL and 10-min watermark, user 1's timeout
    (t0+30m) is passed by the batch-3 watermark (t0+2h-10m), so batch 3
    must emit user 1's final row and the last progress must report only
    user 2's state row."""
    import os
    import time

    from iceberg_data_gen_spark.operators.common import scratch_dir
    from iceberg_data_gen_spark.streaming import events as ev_mod

    base = scratch_dir("stateful-ttl-")
    d = os.path.join(base, "events.parquet")
    t0 = "2026-01-01 00:00:00"

    def mk(rows):
        return spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, "
            "event_type string, value double, props string"
        ).select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )

    batches = [
        [(1, t0, 1, "a", 1.0, "{}"), (2, t0, 2, "a", 2.0, "{}")],
        [(3, "2026-01-01 02:00:00", 2, "a", 3.0, "{}")],
        [(4, "2026-01-01 04:00:00", 2, "a", 4.0, "{}")],
    ]
    seen: set[str] = set()
    for i, rows in enumerate(batches):
        mk(rows).coalesce(1).write.mode("append").parquet(d)
        parts = {
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        }
        (newest,) = parts - seen
        seen = parts
        os.utime(newest, (time.time() + i, time.time() + i))

    out_rows = []
    old_trigger = ev_mod.STREAM_MAX_FILES_PER_TRIGGER
    ev_mod.STREAM_MAX_FILES_PER_TRIGGER = 1
    try:
        progress = ev_mod.run_operator_only(
            ev_mod._stateful_agg_ttl(spark, base),
            output_mode="update",
            batch_fn=lambda df, _id: out_rows.extend(df.collect()),
        )
    finally:
        ev_mod.STREAM_MAX_FILES_PER_TRIGGER = old_trigger

    finals = [r for r in out_rows if r.final]
    assert [(r.user_id, r.n_events, r.total_value) for r in finals] == [
        (1, 1, 1.0)
    ], out_rows
    # user 2 kept accumulating across all three triggers
    last_u2 = [r for r in out_rows if r.user_id == 2][-1]
    assert (last_u2.n_events, last_u2.total_value, last_u2.final) == (3, 9.0, False)
    # the state store holds ONLY the active user at the end
    srows = sum(
        op.get("numRowsTotal", 0) for op in (progress or {}).get("stateOperators", [])
    )
    assert srows == 1, progress


def test_stateful_ttl_out_of_order_event_does_not_shrink_deadline(spark):
    """Review r9: the TTL kernel computed the eviction deadline from
    only the CURRENT batch's max event time, so an out-of-order (but
    within-watermark) event moved a user's timeout BACKWARD — premature
    eviction, a split aggregate, and two final rows.  last_ms persists
    in state now: the deadline is max over the user's whole history.

    u1: 01:00 then out-of-order 00:55 — deadline must stay 01:30.
    Batch 3 (u2 @ 01:38) pushes the watermark to 01:28: the buggy
    deadline (01:25) would evict u1; the correct one (01:30) must not."""
    import os
    import time

    from iceberg_data_gen_spark.operators.common import scratch_dir
    from iceberg_data_gen_spark.streaming import events as ev_mod

    base = scratch_dir("stateful-ttl-ooo-")
    d = os.path.join(base, "events.parquet")

    def mk(rows):
        return spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, "
            "event_type string, value double, props string"
        ).select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "user_id", "event_type", "value", "props",
        )

    batches = [
        [(1, "2026-01-01 01:00:00", 1, "a", 1.0, "{}")],
        # out-of-order for u1 (watermark after batch 1 = 00:50)
        [(2, "2026-01-01 00:55:00", 1, "a", 2.0, "{}")],
        [(3, "2026-01-01 01:38:00", 2, "a", 3.0, "{}")],
    ]
    seen: set[str] = set()
    for i, rows in enumerate(batches):
        mk(rows).coalesce(1).write.mode("append").parquet(d)
        parts = {
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        }
        (newest,) = parts - seen
        seen = parts
        os.utime(newest, (time.time() + i, time.time() + i))

    out_rows = []
    old_trigger = ev_mod.STREAM_MAX_FILES_PER_TRIGGER
    ev_mod.STREAM_MAX_FILES_PER_TRIGGER = 1
    try:
        progress = ev_mod.run_operator_only(
            ev_mod._stateful_agg_ttl(spark, base),
            output_mode="update",
            batch_fn=lambda df, _id: out_rows.extend(df.collect()),
        )
    finally:
        ev_mod.STREAM_MAX_FILES_PER_TRIGGER = old_trigger

    u1_finals = [r for r in out_rows if r.user_id == 1 and r.final]
    assert u1_finals == [], u1_finals  # deadline 01:30 > watermark 01:28
    last_u1 = [r for r in out_rows if r.user_id == 1][-1]
    assert (last_u1.n_events, last_u1.total_value) == (2, 3.0)
    srows = sum(
        op.get("numRowsTotal", 0) for op in (progress or {}).get("stateOperators", [])
    )
    assert srows == 2, progress  # u1 AND u2 still live


def test_stream_static_join_broadcasts_by_size_estimate(spark):
    """q_stream_static_join lost its customer hard-hint (VERDICT r9 #1:
    customer SCALES with SF — a hint is honored unconditionally and
    OOMs the driver at 100 TB, the same scaling-table rule the batch
    joins follow).  The micro-batch planner must therefore pick
    BroadcastHashJoin from the static side's OWN size estimate at test
    SF; a silent flip to a shuffled join on the dimension side fails
    here by name instead of costing wall-clock per micro-batch.  The
    AST census (test_oracle_queries) separately pins streaming/events.py
    at zero F.broadcast calls."""
    from iceberg_data_gen_spark.streaming.events import (
        _static_join_agg,
        stream_partitions,
    )

    agg = _static_join_agg(spark, SF_DIR)
    name = "static_join_plan_probe"
    with stream_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
            plan = q._jsq.explainInternal(False)
        finally:
            q.stop()
    n_rows = spark.table(name).count()
    spark.catalog.dropTempView(name)
    assert n_rows > 0
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_nanos_layout_stream_reads_and_restores_conf(spark, tmp_path):
    """The INT64-nanos events layout (round-3 testdata shipped it; the
    driver regenerates testdata every round so it can return) must (a)
    stream with timestamps normalized exactly like the micros layout,
    and (b) restore ``nanosAsLong`` to its pre-stream value once the
    bounded run completes (review r10: the conf used to stay set for
    the session's lifetime, changing how later unrelated batch reads
    of nanos parquet behave)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_data_gen_spark.streaming import events as ev_mod

    key = "spark.sql.legacy.parquet.nanosAsLong"
    prior = spark.conf.get(key)

    base = str(tmp_path / "sf-nanos")
    os.makedirs(base)
    t0 = 1_700_000_000_000_000_000  # ns since epoch
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                [t0, t0 + 60_000_000_000, t0 + 3_900_000_000_000],
                pa.timestamp("ns"),
            ),
            "user_id": pa.array([7, 7, 8], pa.int64()),
            "event_type": pa.array(["click"] * 3),
            "value": pa.array([1.5, 2.25, 3.0], pa.float64()),
            "props": pa.array(["{}"] * 3),
        }
    )
    # version 2.6 + no coercion => physical INT64 TIMESTAMP(NANOS)
    pq.write_table(
        table, os.path.join(base, "events.parquet"),
        coerce_timestamps=None, version="2.6",
    )
    meta = pq.read_metadata(os.path.join(base, "events.parquet")).schema
    assert "INT64" in meta.column(1).physical_type  # really nanos layout

    schema, ts_is_long = ev_mod._events_raw_schema(base)
    assert ts_is_long is True

    agg = (
        ev_mod.read_events_stream(spark, base)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(*ev_mod._count_value_aggs())
    )
    assert spark.conf.get(key) == "true"  # set while the stream runs
    out = ev_mod.run_to_completion(agg)
    rows = sorted(
        (r["window"]["start"], r.n_events, r.sum_value) for r in out.collect()
    )
    assert [(r[1], r[2]) for r in rows] == [(2, 3.75), (1, 3.0)]
    # restored to the pre-stream value after the bounded run
    assert spark.conf.get(key) == prior
    assert ev_mod._NANOS_CONF_PRIOR == {}


def test_nanos_conf_restore_waits_for_last_active_stream(spark, tmp_path):
    """ADVICE r10: _restore_nanos_conf fired after EVERY bounded run, so
    finishing one nanos run flipped the conf back while a second,
    separately-driven nanos stream was still executing on the same
    session.  The registry now refcounts nanos-stream constructions per
    session (weakly keyed — id(spark) reuse after GC could replay a dead
    session's prior value): the first run's completion leaves the conf
    set, the last run's completion restores it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_data_gen_spark.streaming import events as ev_mod

    key = "spark.sql.legacy.parquet.nanosAsLong"
    prior = spark.conf.get(key)

    base = str(tmp_path / "sf-nanos-two")
    os.makedirs(base)
    t0 = 1_700_000_000_000_000_000
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([t0, t0 + 60_000_000_000], pa.timestamp("ns")),
            "user_id": pa.array([7, 8], pa.int64()),
            "event_type": pa.array(["click"] * 2),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(["{}"] * 2),
        }
    )
    pq.write_table(
        table, os.path.join(base, "events.parquet"),
        coerce_timestamps=None, version="2.6",
    )

    def make_agg():
        return (
            ev_mod.read_events_stream(spark, base)
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour"))
            .agg(*ev_mod._count_value_aggs())
        )

    # two constructions BEFORE either run completes (the plan-probe shape)
    agg1, agg2 = make_agg(), make_agg()
    assert ev_mod._NANOS_CONF_PRIOR[spark][1] == 2
    ev_mod.run_to_completion(agg1).collect()
    # first completion must NOT restore: agg2 is still registered
    assert spark.conf.get(key) == "true"
    assert ev_mod._NANOS_CONF_PRIOR[spark][1] == 1
    ev_mod.run_to_completion(agg2).collect()
    assert spark.conf.get(key) == prior
    assert ev_mod._NANOS_CONF_PRIOR == {}


def test_stream_foreach_batch_restores_nanos_conf(spark, tmp_path):
    """R11 review wave 3: q_stream_foreach_batch drives its stream via
    Trigger.AvailableNow + awaitTermination OUTSIDE the shared bounded
    runners, so the nanos-conf registration its read_events_stream made
    was never balanced — the conf leaked set for the session's lifetime
    (the same class the stream-stream join fix closed).  The query now
    stops + restores in a finally block."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_data_gen_spark import operators
    from iceberg_data_gen_spark.streaming import events as ev_mod

    key = "spark.sql.legacy.parquet.nanosAsLong"
    prior = spark.conf.get(key)

    base = str(tmp_path / "sf-nanos-fb")
    os.makedirs(base)
    t0 = 1_700_000_000_000_000_000
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([t0, t0 + 60_000_000_000], pa.timestamp("ns")),
            "user_id": pa.array([7, 8], pa.int64()),
            "event_type": pa.array(["click", "view"]),
            "value": pa.array([15.0, 5.0], pa.float64()),
            "props": pa.array(["{}"] * 2),
        }
    )
    pq.write_table(
        table, os.path.join(base, "events.parquet"),
        coerce_timestamps=None, version="2.6",
    )

    out = operators.QUERIES["q_stream_foreach_batch"](spark, base)
    rows = {(r.event_type, r.n_events) for r in out.collect()}
    assert rows == {("click", 1)}  # only value >= 10 survives the sink
    assert ev_mod._NANOS_CONF_PRIOR == {}
    assert spark.conf.get(key) == prior


def test_stateful_all_null_values_emit_null_total(spark, tmp_path):
    """R11 review wave 3: the integer-cents state accumulator cannot
    represent 'no non-NULL value seen', so a user whose every event
    value is NULL emitted total_value 0.0 where the pinned SQL oracle's
    sum() is NULL.  The state now carries an nvals counter and emits a
    true SQL NULL for such users — engine-pair-compared on a planted
    corpus."""
    import duckdb

    from iceberg_data_gen_spark import operators
    from iceberg_data_gen_spark.operators import ORACLES

    sf_dir = str(tmp_path / "sf-stateful-nullval")
    spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 7, "click", None, "{}"),
            (2, "2024-01-01 00:01:00", 7, "click", None, "{}"),  # all-NULL user
            (3, "2024-01-01 00:02:00", 8, "view", 2.5, "{}"),
            (4, "2024-01-01 00:03:00", 8, "view", None, "{}"),   # mixed user
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props",
    ).write.parquet(f"{sf_dir}/events.parquet")

    got = sorted(
        (r.user_id, r.n_events, r.total_value, r.n_batches)
        for r in operators.QUERIES["q_stream_stateful"](spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    oracle = sorted(map(tuple, con.execute(ORACLES["q_stream_stateful"]).fetchall()))
    assert got == oracle, (got, oracle)
    assert got == [(7, 2, None, 1), (8, 2, 2.5, 1)]


def test_stream_stream_join_restores_nanos_conf(spark, tmp_path):
    """R11 review: q_stream_stream_join constructs TWO nanos sources but
    drives them through ONE bounded run, so the construction-paired
    refcount sat at 1 forever and nanosAsLong leaked set for the
    session's lifetime — the exact r10 regression class the restore
    exists for.  The query now folds the surplus registration
    (_release_nanos_refs) before its single run."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_data_gen_spark import operators
    from iceberg_data_gen_spark.streaming import events as ev_mod

    key = "spark.sql.legacy.parquet.nanosAsLong"
    prior = spark.conf.get(key)

    base = str(tmp_path / "sf-nanos-ssj")
    os.makedirs(base)
    t0 = 1_700_000_000_000_000_000
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                [t0, t0 + 120_000_000_000, t0 + 240_000_000_000],
                pa.timestamp("ns"),
            ),
            "user_id": pa.array([7, 7, 7], pa.int64()),
            "event_type": pa.array(["view", "click", "view"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}"] * 3),
        }
    )
    pq.write_table(
        table, os.path.join(base, "events.parquet"),
        coerce_timestamps=None, version="2.6",
    )

    out = operators.QUERIES["q_stream_stream_join"](spark, base)
    rows = {(r.click_id, r.view_id) for r in out.collect()}
    assert rows == {(2, 1)}  # the view 2 min before the click matches
    # the leak: pre-fix this held count 1 and the conf stayed 'true'
    assert ev_mod._NANOS_CONF_PRIOR == {}
    assert spark.conf.get(key) == prior

"""The reference's sequence generator as a first-class Spark V2 source.

``FixSchemaGenerator`` semantics (reference parity:
``/root/reference/src/fix_schema_generator.rs:60-117`` — global cursor
``g`` over files of ``rows_per_file`` rows, each row
``(foo=str(g), bar=g, baz=true)``) exposed through the Spark 4 Python
DataSource API instead of a driver-side loop: one ``InputPartition`` per
generated file, so the rows of a 10^9-row generation job materialize ON
THE EXECUTORS in parallel and flow straight into whatever the plan does
next (write, join, aggregate) with no driver involvement and no
collect/parallelize round trip.

The classes are built inside a factory (not at module top level) so
cloudpickle ships them BY VALUE to executor Python workers — a module-
level class would be pickled by reference and fail to import on workers
that don't have this repo on their path (e.g. the round driver's
vanilla session).

Usage::

    spark.dataSource.register(make_fixseq_datasource())
    df = (spark.read.format("fixseq")
          .option("rows_per_file", 1000)
          .option("file_count", 8)
          .load())
"""

from __future__ import annotations


def make_fixseq_datasource():
    """Build (by value, picklable) the ``fixseq`` DataSource class."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    class FilePartition(InputPartition):
        def __init__(self, start: int, end: int) -> None:
            self.start = start
            self.end = end

    def _positive(options: dict, key: str, default: int) -> int:
        # fail fast at reader construction (review r9): a zero/negative
        # size option produced a source that yields nothing — or a
        # stream whose offset never advances, idling forever with no
        # diagnostic
        v = int(options.get(key, default))
        if v <= 0:
            raise ValueError(f"fixseq option {key} must be > 0, got {v}")
        return v

    def _non_negative(options: dict, key: str, default: int) -> int:
        v = int(options.get(key, default))
        if v < 0:
            raise ValueError(f"fixseq option {key} must be >= 0, got {v}")
        return v

    class FixSeqReader(DataSourceReader):
        def __init__(self, options: dict) -> None:
            self.rows_per_file = _positive(options, "rows_per_file", 1000)
            self.file_count = _positive(options, "file_count", 1)
            self.start_at = _non_negative(options, "start_at", 0)

        def partitions(self) -> list:
            # one partition per reference "file": the unit the reference
            # writes sequentially is the unit Spark generates in parallel
            return [
                FilePartition(
                    self.start_at + i * self.rows_per_file,
                    self.start_at + (i + 1) * self.rows_per_file,
                )
                for i in range(self.file_count)
            ]

        def read(self, partition: FilePartition):
            for g in range(partition.start, partition.end):
                yield (str(g), g, True)

    class FixSeqStreamReader(SimpleDataSourceStreamReader):
        """Micro-batch flavor: the global cursor ``g`` IS the stream
        offset, so each batch is one reference "file" of rows and
        replay-between-offsets (exactly-once on failure) falls out of
        the arithmetic — regenerating [start, end) is deterministic."""

        def __init__(self, options: dict) -> None:
            self.rows_per_batch = _positive(options, "rows_per_batch", 1000)
            self.total_rows = _non_negative(options, "total_rows", 5000)
            # honor start_at like the batch reader (review r7: the stream
            # silently ignored it, so the same option changed meaning
            # between read and readStream) — emit total_rows rows FROM it
            self.start_at = _non_negative(options, "start_at", 0)

        def initialOffset(self) -> dict:
            return {"g": self.start_at}

        def read(self, start: dict):
            g = start["g"]
            # max(g, ...): the offset must never REGRESS.  A checkpoint
            # restart with a smaller total_rows/start_at would otherwise
            # compute end < g and hand Spark a non-monotonic offset log
            # (review r8) — emit nothing and hold the cursor instead.
            end = max(g, min(g + self.rows_per_batch, self.start_at + self.total_rows))
            return iter([(str(i), i, True) for i in range(g, end)]), {"g": end}

        def readBetweenOffsets(self, start: dict, end: dict):
            return iter([(str(i), i, True) for i in range(start["g"], end["g"])])

    class FixSeqDataSource(DataSource):
        """``format("fixseq")`` — the reference's fixed-schema generator."""

        @classmethod
        def name(cls) -> str:
            return "fixseq"

        def schema(self) -> str:
            return "foo string, bar int, baz boolean"

        def reader(self, schema) -> DataSourceReader:
            return FixSeqReader(self.options)

        def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
            return FixSeqStreamReader(self.options)

    return FixSeqDataSource


def register_fixseq(spark) -> None:
    """Idempotently register the source on a session (driver sessions are
    vanilla — registration must happen inside the query)."""
    spark.dataSource.register(make_fixseq_datasource())

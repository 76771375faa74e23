"""DataGenerator ABC + the fixed-schema generator.

Reference: ``trait DataGenerator`` (main.rs:86-94) and its single
implementation ``FixSchemaGenerator`` (fix_schema_generator.rs).  The
Spark re-expression returns DataFrames instead of Arrow RecordBatches:
row content is a pure function of the global row id (§1.4 of SURVEY.md),
so generation is ``spark.range`` — a distributed sequence source with no
driver-side materialization.

Delete-cursor semantics (SURVEY.md §1.5, fix_schema_generator.rs:56-73):
one cursor shared between the position-delete and equality-delete phases
walks the registered data files in commit order.  Because row position
within file ``n`` is ``global_row − n*rows_per_file``, the cursor is
plain arithmetic here — no state walk, no driver loop over rows.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_data_gen_spark.datagen.config import FileConfig
from iceberg_data_gen_spark.table.table import Field, TableSchema


@dataclass
class RegisteredDataFile:
    """What the app feeds back after writing (main.rs:159 → O9)."""

    file_path: str
    record_count: int


class DataGenerator(ABC):
    """Python port of the trait at main.rs:86-94 — the one extensibility
    seam of the reference (SURVEY.md §1.3)."""

    @abstractmethod
    def schema(self) -> TableSchema: ...

    @abstractmethod
    def equality_delete_ids(self) -> list[int]: ...

    @abstractmethod
    def generate_data_per_file(self, spark: SparkSession, file_nth: int) -> DataFrame | None: ...

    @abstractmethod
    def register_data_file(self, files: list[RegisteredDataFile]) -> None: ...

    @abstractmethod
    def generate_pos_delete_per_file(self, spark: SparkSession, file_nth: int) -> DataFrame | None: ...

    @abstractmethod
    def generate_equality_delete_per_file(
        self, spark: SparkSession, file_nth: int
    ) -> DataFrame | None: ...

    def reset(self) -> None:
        """Discard carried-over generation state so a reused app instance
        produces the same output as a fresh one.  ``prepare()`` calls
        this unconditionally, so it is part of the trait's contract —
        concrete no-op here (review r7: a custom generator implementing
        only the abstract methods crashed with AttributeError before
        generating anything); stateful generators override it."""


class FixSchemaGenerator(DataGenerator):
    """Fixed 3-column schema + deterministic generation.

    Schema (fix_schema_generator.rs:34-43): ``foo string``, ``bar int``
    (identifier field), ``baz boolean``, all required.  Row ``g``:
    ``(str(g), g, true)`` (fix_schema_generator.rs:85-98).
    """

    def __init__(
        self,
        data_cfg: FileConfig,
        pos_cfg: FileConfig,
        eq_cfg: FileConfig,
    ) -> None:
        self.data_cfg = data_cfg
        self.pos_cfg = pos_cfg
        self.eq_cfg = eq_cfg
        self._data_files: list[RegisteredDataFile] = []
        # shared delete cursor as a global-row offset (SURVEY.md §1.5)
        self._cursor: int = 0

    # -- schema -------------------------------------------------------------

    def schema(self) -> TableSchema:
        return TableSchema(
            fields=[
                Field(1, "foo", "string", required=True),
                Field(2, "bar", "int", required=True),
                Field(3, "baz", "boolean", required=True),
            ],
            identifier_field_ids=[2],
        )

    def equality_delete_ids(self) -> list[int]:
        # field ids [1, 2] = (foo, bar) — fix_schema_generator.rs:134-136
        return [1, 2]

    # -- data ---------------------------------------------------------------

    def _row_df(self, spark: SparkSession, start: int, end: int) -> DataFrame:
        """Rows for global ids [start, end): (str(g), g, true)."""
        return spark.range(start, end).select(
            F.col("id").cast("string").alias("foo"),
            F.col("id").cast("int").alias("bar"),
            F.lit(True).alias("baz"),
        )

    def generate_data_per_file(self, spark: SparkSession, file_nth: int) -> DataFrame | None:
        if file_nth >= self.data_cfg.file_count:
            return None
        bias = file_nth * self.data_cfg.rows_per_file  # fix_schema_generator.rs:83
        return self._row_df(spark, bias, bias + self.data_cfg.rows_per_file)

    def register_data_file(self, files: list[RegisteredDataFile]) -> None:
        self._data_files.extend(files)

    def reset(self) -> None:
        """Fresh cursor + file registry: prepare() calls this so a reused
        app instance generates the same deletes as a fresh one instead of
        compounding carried-over state."""
        self._data_files = []
        self._cursor = 0

    # -- deletes (shared cursor over registered files in commit order) ------

    @property
    def _total_rows(self) -> int:
        return sum(f.record_count for f in self._data_files)

    def _file_of_global_row(self, g: int) -> tuple["RegisteredDataFile", int]:
        """(owning file, position-within-file) for global row ``g``."""
        off = 0
        for f in self._data_files:
            if g < off + f.record_count:
                return f, g - off
            off += f.record_count
        raise IndexError(g)

    def generate_pos_delete_per_file(self, spark: SparkSession, file_nth: int) -> DataFrame | None:
        """Next ``rows_per_file`` (file_path, pos) pairs from the cursor.

        Matches the reference: ``file_nth`` is ignored, the cursor is
        global state (fix_schema_generator.rs:114-117 — a quirk we keep
        for observable parity), and generation stops early at end-of-data
        (fix_schema_generator.rs:121).
        """
        if self._cursor >= self._total_rows or not self._data_files:
            return None
        n = min(self.pos_cfg.rows_per_file, self._total_rows - self._cursor)
        if n <= 0:
            # rows_per_file == 0: the phase generates nothing — stop
            # instead of indexing an empty span list (review r7)
            return None
        # expand cursor range into per-file (path, pos) spans — file-count
        # sized driver work, row expansion happens in Spark
        spans: list[tuple[str, int, int]] = []  # (path, pos_start, pos_end)
        g = self._cursor
        remaining = n
        while remaining > 0:
            f, pos = self._file_of_global_row(g)
            take = min(remaining, f.record_count - pos)
            spans.append((f.file_path, pos, pos + take))
            g += take
            remaining -= take
        self._cursor += n
        dfs = [
            spark.range(s, e).select(
                F.lit(path).alias("file_path"), F.col("id").alias("pos")
            )
            for path, s, e in spans
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionAll(d)
        return out

    def generate_equality_delete_per_file(
        self, spark: SparkSession, file_nth: int
    ) -> DataFrame | None:
        """Next ``rows_per_file`` equality-delete rows ``(str(g), g)`` —
        continues from wherever the position-delete phase left the cursor
        (fix_schema_generator.rs:158-160; SURVEY.md §1.5)."""
        if self._cursor >= self._total_rows:
            return None
        n = min(self.eq_cfg.rows_per_file, self._total_rows - self._cursor)
        if n <= 0:
            # rows_per_file == 0: nothing to delete — no empty files
            return None
        start = self._cursor
        self._cursor += n
        return spark.range(start, start + n).select(
            F.col("id").cast("string").alias("foo"),
            F.col("id").cast("int").alias("bar"),
        )

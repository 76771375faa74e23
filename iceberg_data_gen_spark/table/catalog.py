"""Filesystem catalog: namespaces and merge-on-read tables.

Mirrors the reference's catalog surface (REST catalog at
``/root/reference/src/main.rs:278-299``; namespace create at
``main.rs:353-355``; table create/drop at ``main.rs:356-367,393-395``)
with the guards the reference lacks (SURVEY.md §7 H4: unguarded
``create_namespace`` / ``drop_*``).

Layout::

    <warehouse>/<namespace>/<table>/
        metadata.json          # schema + snapshot log
        data/*.parquet         # data files
        deletes/pos-*.parquet  # position-delete files
        deletes/eq-*.parquet   # equality-delete files
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import SparkSession

from iceberg_data_gen_spark.table.table import MoRTable, TableSchema


class CatalogError(RuntimeError):
    pass


def _seg(identifier: str) -> str:
    """Validate one namespace/table identifier as a single warehouse path
    segment.  Without this, ``drop_table("ns", "..")`` resolves to the
    warehouse root and rmtree deletes EVERY table (review r7 — the same
    escape RestCatalog's ``_fs_seg`` defuses by encoding; here the layout
    is identifier==dirname, so reject instead of encode to keep existing
    warehouse layouts stable)."""
    if (
        not identifier
        or identifier in (".", "..")
        or "/" in identifier
        or "\\" in identifier
        or "\x00" in identifier
    ):
        raise CatalogError(f"invalid identifier: {identifier!r}")
    return identifier


class LocalCatalog:
    def __init__(self, spark: SparkSession, warehouse: str) -> None:
        self.spark = spark
        self.warehouse = Path(warehouse)
        self.warehouse.mkdir(parents=True, exist_ok=True)

    # -- namespaces ---------------------------------------------------------

    def create_namespace(self, namespace: str, exists_ok: bool = True) -> None:
        p = self.warehouse / _seg(namespace)
        if p.exists() and not exists_ok:
            raise CatalogError(f"namespace exists: {namespace}")
        p.mkdir(parents=True, exist_ok=True)

    def namespace_exists(self, namespace: str) -> bool:
        return (self.warehouse / _seg(namespace)).is_dir()

    def drop_namespace(self, namespace: str, missing_ok: bool = True) -> None:
        p = self.warehouse / _seg(namespace)
        if not p.exists():
            if missing_ok:
                return
            raise CatalogError(f"no such namespace: {namespace}")
        if any(child.is_dir() for child in p.iterdir()):
            raise CatalogError(f"namespace not empty: {namespace}")
        shutil.rmtree(p)

    # -- tables -------------------------------------------------------------

    def _table_path(self, namespace: str, name: str) -> Path:
        return self.warehouse / _seg(namespace) / _seg(name)

    def table_exists(self, namespace: str, name: str) -> bool:
        return (self._table_path(namespace, name) / "metadata.json").exists()

    def create_table(
        self,
        namespace: str,
        name: str,
        schema: TableSchema,
        exists_ok: bool = False,
    ) -> MoRTable:
        if not self.namespace_exists(namespace):
            raise CatalogError(f"no such namespace: {namespace}")
        if self.table_exists(namespace, name):
            if exists_ok:
                return self.load_table(namespace, name)
            raise CatalogError(f"table exists: {namespace}.{name}")
        return MoRTable.create(self.spark, str(self._table_path(namespace, name)), schema)

    def load_table(self, namespace: str, name: str) -> MoRTable:
        if not self.table_exists(namespace, name):
            raise CatalogError(f"no such table: {namespace}.{name}")
        return MoRTable(self.spark, str(self._table_path(namespace, name)))

    def drop_table(self, namespace: str, name: str, missing_ok: bool = True) -> None:
        p = self._table_path(namespace, name)
        if not p.exists():
            if missing_ok:
                return
            raise CatalogError(f"no such table: {namespace}.{name}")
        shutil.rmtree(p)

"""Prepare / cleanup pipelines — the reference's application layer.

Traces E1/E2 of SURVEY.md §3 (main.rs:347-398): prepare = create
namespace + table, then three write phases each committing one snapshot
(data append → position deletes → equality deletes), then a row-count
summary; cleanup = drop table + namespace.  Guards the reference lacks
(unguarded creates/drops, negative totals — SURVEY.md §7 H4) are added.
"""

from __future__ import annotations

import logging

from pyspark.sql import SparkSession

from iceberg_data_gen_spark.datagen.config import Config, load_config, redacted
from iceberg_data_gen_spark.datagen.generator import (
    DataGenerator,
    FixSchemaGenerator,
    RegisteredDataFile,
)
from iceberg_data_gen_spark.table.catalog import LocalCatalog

log = logging.getLogger(__name__)


def rest_spark_confs(cat, name: str = "rest") -> dict[str, str]:
    """The complete TOML ``[catalog]`` -> Spark-conf mapping for an
    Iceberg REST catalog over S3 (reference wiring: main.rs:278-299;
    same keys, Spark spelling).  Pure function of the config — returned
    as a dict so callers apply it with one
    ``for k, v in rest_spark_confs(cfg.catalog).items():
    builder.config(k, v)`` loop.  Requires
    ``org.apache.iceberg:iceberg-spark-runtime-<spark-major>_<scala>``
    on the classpath (add via ``spark.jars.packages``, matching the
    Spark major version); S3 credentials never pass through logging
    (O16 — ``redacted`` covers them).
    """
    confs = {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{name}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{name}.type": "rest",
        f"spark.sql.catalog.{name}.uri": cat.uri,
        f"spark.sql.catalog.{name}.warehouse": cat.warehouse,
    }
    if (
        cat.s3_endpoint
        or cat.s3_access_key_id
        or cat.s3_secret_access_key
        or cat.s3_region
    ):
        # ANY of the four S3 fields (including region ALONE — IAM-role
        # AWS configs set nothing else, or secret ALONE — key id via
        # env/instance profile, review r8) selects S3FileIO; unset
        # fields stay omitted below
        confs[f"spark.sql.catalog.{name}.io-impl"] = (
            "org.apache.iceberg.aws.s3.S3FileIO"
        )
        # unset fields are OMITTED, not emitted as "" — an empty-string
        # endpoint/region would misconfigure S3FileIO (real AWS configs
        # leave endpoint blank; MinIO configs may leave region blank)
        s3 = {
            f"spark.sql.catalog.{name}.s3.endpoint": cat.s3_endpoint,
            f"spark.sql.catalog.{name}.s3.access-key-id": cat.s3_access_key_id,
            f"spark.sql.catalog.{name}.s3.secret-access-key": (
                cat.s3_secret_access_key
            ),
            f"spark.sql.catalog.{name}.client.region": cat.s3_region,
        }
        confs.update({k: v for k, v in s3.items() if v})
    return confs


class IcebergDataGeneratorApp:
    """main.rs:96-115 — app wired to a DataGenerator behind the trait."""

    def __init__(
        self,
        spark: SparkSession,
        config: Config | str,
        generator: DataGenerator | None = None,
    ) -> None:
        self.spark = spark
        self.config = load_config(config) if isinstance(config, str) else config
        self.generator = generator or FixSchemaGenerator(
            self.config.data_files,
            self.config.pos_delete_files,
            self.config.equality_delete_files,
        )
        if self.config.catalog.catalog_type not in ("local", "rest"):
            raise ValueError(f"unknown catalog type: {self.config.catalog.catalog_type}")
        if self.config.catalog.catalog_type == "rest":
            # REST parity (main.rs:278-299) via the pure-Python client:
            # namespace/table DDL and every snapshot commit flow through
            # the Iceberg REST wire contract (table/rest_catalog.py),
            # with the server performing the commit compare-and-swap.
            # Data files land under catalog.warehouse (local path here;
            # an S3FileIO location on a cluster — the S3 fields configure
            # that tier).  For SQL engines with iceberg-spark-runtime on
            # the classpath, rest_spark_confs (below, unit-tested) is the
            # equivalent SparkSession wiring of the same TOML section.
            from iceberg_data_gen_spark.table.rest_catalog import RestCatalog

            self.catalog = RestCatalog(
                spark, self.config.catalog.uri, self.config.catalog.warehouse
            )
        else:
            self.catalog = LocalCatalog(spark, self.config.catalog.warehouse)

    # -- prepare (E1) -------------------------------------------------------

    def prepare(self) -> dict:
        log.info("config: %s", redacted(self.config))
        ns, name = self.config.table.namespace, self.config.table.table_name
        self.catalog.create_namespace(ns, exists_ok=True)
        table = self.catalog.create_table(ns, name, self.generator.schema(), exists_ok=True)
        if table.snapshots():
            # re-running prepare into a populated table would silently
            # append duplicate data and aim the delete phases at the
            # wrong global rows — fail loudly instead
            raise ValueError(
                f"table {ns}.{name} already contains data; run cleanup "
                "before re-running prepare"
            )
        self.generator.reset()

        # phase 1: data files — one snapshot for all (main.rs:125-158)
        batches = []
        i = 0
        while (df := self.generator.generate_data_per_file(self.spark, i)) is not None:
            batches.append(df)
            i += 1
        if batches:
            snap = table.append_batches(batches)
            self.generator.register_data_file(
                [
                    RegisteredDataFile(f["path"], f["record_count"])
                    for f in snap["files"]
                ]
            )

        # phase 2: position deletes — one file per batch, ONE snapshot
        # (main.rs:163-216; early-stop at end-of-data)
        pos_parts = self._delete_parts(
            self.generator.generate_pos_delete_per_file,
            self.config.pos_delete_files.file_count,
        )
        if pos_parts:
            table.add_position_deletes(pos_parts)

        # phase 3: equality deletes — one file per batch, ONE snapshot
        # (main.rs:218-276)
        eq_parts = self._delete_parts(
            self.generator.generate_equality_delete_per_file,
            self.config.equality_delete_files.file_count,
        )
        if eq_parts:
            table.add_equality_deletes(eq_parts, self.generator.equality_delete_ids())

        return self.print_summary(table)

    def _delete_parts(self, generate_fn, file_count: int) -> list:
        """The shared per-file delete loop of phases 2 and 3: up to
        ``file_count`` batches, early-stop when the generator signals
        end-of-data with None (one definition so the two phases cannot
        diverge on the loop contract)."""
        parts = []
        for n in range(file_count):
            df = generate_fn(self.spark, n)
            if df is None:
                break
            parts.append(df)
        return parts

    # -- summary (O14) ------------------------------------------------------

    def print_summary(self, table) -> dict:
        s = table.summary()
        log.info("summary: %s", s)
        return s

    # -- cleanup (E2) -------------------------------------------------------

    def cleanup(self) -> None:
        ns, name = self.config.table.namespace, self.config.table.table_name
        self.catalog.drop_table(ns, name, missing_ok=True)
        self.catalog.drop_namespace(ns, missing_ok=True)

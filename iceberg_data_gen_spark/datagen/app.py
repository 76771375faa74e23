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
            # REST+S3 parity (main.rs:278-299) needs the iceberg-spark
            # runtime jar, absent from this container (and no network to
            # fetch it); the config schema keeps the fields so prod wiring
            # is a jar away (SURVEY §7 M0).  The exact mapping, so a user
            # with the jar can wire it in one builder block — each TOML
            # `[catalog]` field (config.py) maps onto a Spark conf key for
            # a catalog named `rest` (reference env-var wiring is
            # main.rs:278-299; same keys, Spark spelling):
            #
            #   spark.jars.packages = org.apache.iceberg:iceberg-spark-
            #       runtime-4.0_2.13:<ver>   (match the Spark major)
            #   spark.sql.extensions =
            #       org.apache.iceberg.spark.extensions
            #       .IcebergSparkSessionExtensions
            #   spark.sql.catalog.rest = org.apache.iceberg.spark.SparkCatalog
            #   spark.sql.catalog.rest.type     = rest
            #   spark.sql.catalog.rest.uri      = catalog.uri
            #   spark.sql.catalog.rest.warehouse = catalog.warehouse
            #   spark.sql.catalog.rest.io-impl  =
            #       org.apache.iceberg.aws.s3.S3FileIO
            #   spark.sql.catalog.rest.s3.endpoint   = catalog.s3_endpoint
            #   spark.sql.catalog.rest.s3.access-key-id =
            #       catalog.s3_access_key     (redacted from logs — O16)
            #   spark.sql.catalog.rest.s3.secret-access-key =
            #       catalog.s3_secret_key     (redacted from logs — O16)
            #   spark.sql.catalog.rest.client.region = catalog.s3_region
            #
            # With that session, every LocalCatalog call in this app maps
            # 1:1 onto `spark.sql("CREATE NAMESPACE/TABLE ...")` +
            # `df.writeTo("rest.ns.tbl").append()`, and the MoR delete
            # writers map onto Iceberg's DELETE FROM / MERGE INTO paths.
            raise NotImplementedError(
                "REST catalog requires iceberg-spark-runtime on the classpath "
                "(unavailable in this container); use catalog.type='local'. "
                "The config->Spark-conf mapping is documented above."
            )
        self.catalog = LocalCatalog(spark, self.config.catalog.warehouse)

    # -- prepare (E1) -------------------------------------------------------

    def prepare(self) -> dict:
        log.info("config: %s", redacted(self.config))
        ns, name = self.config.table.namespace, self.config.table.table_name
        self.catalog.create_namespace(ns, exists_ok=True)
        table = self.catalog.create_table(ns, name, self.generator.schema(), exists_ok=True)

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
        pos_parts = []
        for n in range(self.config.pos_delete_files.file_count):
            df = self.generator.generate_pos_delete_per_file(self.spark, n)
            if df is None:
                break
            pos_parts.append(df)
        if pos_parts:
            table.add_position_deletes(pos_parts)

        # phase 3: equality deletes — one file per batch, ONE snapshot
        # (main.rs:218-276)
        eq_parts = []
        for n in range(self.config.equality_delete_files.file_count):
            df = self.generator.generate_equality_delete_per_file(self.spark, n)
            if df is None:
                break
            eq_parts.append(df)
        if eq_parts:
            table.add_equality_deletes(eq_parts, self.generator.equality_delete_ids())

        return self.print_summary(table)

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

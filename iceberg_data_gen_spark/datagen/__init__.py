"""Data-generation pipelines: the reference's capability surface.

``config``    — TOML config (main.rs:54-84 structs / config.toml layout)
``generator`` — DataGenerator ABC (main.rs:86-94) + FixSchemaGenerator
                (fix_schema_generator.rs) re-expressed over spark.range
``app``       — prepare / cleanup pipelines (main.rs:347-398)
"""

from iceberg_data_gen_spark.datagen.app import IcebergDataGeneratorApp
from iceberg_data_gen_spark.datagen.config import Config, load_config
from iceberg_data_gen_spark.datagen.generator import DataGenerator, FixSchemaGenerator

__all__ = [
    "Config",
    "DataGenerator",
    "FixSchemaGenerator",
    "IcebergDataGeneratorApp",
    "load_config",
]

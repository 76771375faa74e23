"""CLI parity with the reference (main.rs:35-51,401-425): subcommands
``prepare`` (default) / ``cleanup``, ``-c/--config`` flag defaulting to
``config.toml``, missing-config check (main.rs:405-411).

Usage::

    python -m iceberg_data_gen_spark.cli [-c config.toml] [prepare|cleanup]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="iceberg-data-gen-spark")
    parser.add_argument("-c", "--config", default="config.toml")
    parser.add_argument(
        "command", nargs="?", default="prepare", choices=["prepare", "cleanup"]
    )
    args = parser.parse_args(argv)

    if not os.path.exists(args.config):
        print(f"config file not found: {args.config}", file=sys.stderr)
        return 2

    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")

    from iceberg_data_gen_spark.datagen.app import IcebergDataGeneratorApp
    from iceberg_data_gen_spark.session import get_spark

    spark = get_spark("iceberg-data-gen")
    spark.sparkContext.setLogLevel("ERROR")
    app = IcebergDataGeneratorApp(spark, args.config)
    if args.command == "prepare":
        summary = app.prepare()
        print(json.dumps(summary))
    else:
        app.cleanup()
        print(json.dumps({"cleanup": "ok"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

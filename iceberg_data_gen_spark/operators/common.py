"""Helpers shared across operator modules.

Registration-free on purpose: operator modules import from here without
executing any other module's ``@register`` calls, so the registry order
(which the driver's unverified-first listing keys off) is untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_data_gen_spark.session import load_tables


def docs_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents corpus — the one loader every text/curation/pipeline
    operator shares, so a change to how documents load (normalization,
    column coercion) lands everywhere at once."""
    return load_tables(spark, sf_dir, ("documents",))["documents"]


def tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Load + view-register the named testdata tables, positionally —
    the ``lineitem, part = _t(spark, sf_dir, "lineitem", "part")``
    idiom every relational operator module shares (was four copies)."""
    dfs = load_tables(spark, sf_dir, names)
    return [dfs[n] for n in names]


def doc_order_key() -> F.Column:
    """The md5-of-doc_id ordering/sampling key (``md5(CAST(doc_id AS
    VARCHAR))`` on the DuckDB side): engine-portable, uniform,
    deterministic.  ONE definition — shuffling, sharding, stratified and
    temperature sampling all order by this key, and the per-query
    oracles assume the identical bytes."""
    return F.md5(F.col("doc_id").cast("string").cast("binary"))


def scratch_dir(prefix: str) -> str:
    """mkdtemp + atexit cleanup: operators that build throwaway table /
    parquet fixtures return LAZY scans over them, so the dirs cannot be
    removed inside the query — registering them for process-exit removal
    bounds the leak across repeated bench/driver invocations."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, True)
    return d

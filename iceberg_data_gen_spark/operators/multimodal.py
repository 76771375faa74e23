"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, and Pandas-UDF decode / feature-extract / frame-sample stages.

The container has no image/audio libraries, so the *decode* step is
stubbed (deterministic fake behind a clearly-marked seam; real decode
raises NotImplementedError until PIL/librosa are on the image).  The
Spark-side plumbing — schema, partitioning, ``mapInPandas`` batch shape,
Arrow transfer — is real and tested: swapping the stub for a real codec
changes one function body.

The driver testdata has no binary tables, so payloads are synthesized
deterministically from ``documents`` (utf-8 bytes of ``text`` standing
in for encoded media) — the same trick both engines can replay, which
keeps even the metadata query oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_data_gen_spark.operators import register
from iceberg_data_gen_spark.session import load_tables

try:  # real decoders, absent from this container by design
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``documents`` → multimodal convention: (doc_id, payload binary,
    meta struct<format,width,height,n_bytes>).

    This is the column layout a 100 TB media pipeline carries: payload
    stays opaque bytes (parquet binary, no decode on scan), metadata is
    columnar and prunable so filters like ``meta.format = 'png'`` never
    touch payload bytes.
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    payload = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.element_at(
                F.array(F.lit("png"), F.lit("jpeg"), F.lit("wav")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("format"),
            (F.col("n_chars") % 640).cast("int").alias("width"),
            ((F.col("doc_id") * 7) % 480).cast("int").alias("height"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


@register(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format,
           CAST(n_chars % 640 AS INT) AS width,
           CAST((doc_id * 7) % 480 AS INT) AS height,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan of the multimodal table: answerable entirely
    from the meta struct + a payload hash — no decode, no Python."""
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        F.col("meta.format").alias("format"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


# ---------------------------------------------------------------------------
# decode / feature extraction (mapInPandas — Arrow-batched)
# ---------------------------------------------------------------------------

DECODE_SCHEMA = (
    "doc_id long, format string, n_bytes long, mean_byte double, frames_sampled int"
)


def make_decode_batch(have_pil: bool):
    """Build the per-partition Arrow batch decode function.

    Returned as a closure (NOT a module-level function) so cloudpickle
    serializes it by value — Spark's Python workers don't have this repo
    on their sys.path when the driver imports us from elsewhere.

    Real path (``have_pil``) would decode pixels; the stub computes a
    deterministic byte-level feature so the plumbing (batch shape,
    schema, partition parallelism) is exercised end-to-end.
    """

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            if have_pil:
                # real decode would go here (PIL.Image.open over payload bytes)
                raise NotImplementedError("real decode path not wired in this container")
            payloads = pdf["payload"]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": pdf["format"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    # deterministic stand-in for a pixel statistic
                    "mean_byte": payloads.map(lambda b: sum(b) / len(b) if len(b) else 0.0),
                    "frames_sampled": payloads.map(
                        lambda b: min(8, max(1, len(b) // 64))
                    ).astype("int32"),
                }
            )

    return decode_batch


@register("q_multimodal_decode")  # mapInPandas stage: rows-only driver check
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract stage over the multimodal table.

    ``mapInPandas`` streams Arrow batches through Python once —
    the only Python hop in the media pipeline — and runs one task per
    input partition, so throughput scales with executors.  Output is
    deterministic (stub features), so row-level checks are stable.
    """
    m = media_table(spark, sf_dir).select(
        "doc_id", F.col("meta.format").alias("format"), "payload"
    )
    return m.mapInPandas(make_decode_batch(HAVE_PIL), DECODE_SCHEMA)


@register(
    "q_multimodal_frame_stats",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    )
    SELECT format,
           count(*) AS n_docs,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           round(avg(n_bytes), 4) AS avg_bytes,
           CAST(sum(least(8, greatest(1, n_bytes // 64))) AS BIGINT) AS total_frames
    FROM d GROUP BY format
    """,
)
def q_multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-format media statistics incl. the frame-sampling budget —
    metadata-only aggregation (what a scheduler would run before
    launching the decode stage)."""
    m = media_table(spark, sf_dir)
    frames = F.least(
        F.lit(8), F.greatest(F.lit(1), F.floor(F.col("meta.n_bytes") / 64))
    )
    return m.groupBy(F.col("meta.format").alias("format")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.round(F.avg("meta.n_bytes"), 4).alias("avg_bytes"),
        F.sum(frames).alias("total_frames"),
    )


SHARD_BYTE_BUDGET = 16 * 1024  # bytes of payload per training shard


@register(
    "q_multimodal_shard_manifest",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END
                   AS format,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    ),
    placed AS (
        SELECT doc_id, format, n_bytes,
               CAST(floor(
                   (sum(n_bytes) OVER (PARTITION BY format ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING) - n_bytes)
                   / {SHARD_BYTE_BUDGET}.0) AS BIGINT) AS shard_id
        FROM sized
    )
    SELECT format, shard_id,
           count(*) AS n_items,
           CAST(sum(n_bytes) AS BIGINT) AS shard_bytes,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM placed
    GROUP BY format, shard_id
    """,
)
def q_multimodal_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard manifest for media blobs: pack payloads into
    byte-budgeted shards per format (the WebDataset-style layout step a
    multimodal pipeline runs before writing tar shards).

    Next-fit packing by running byte sum — the same cumsum-window shape
    as q_pack_sequences, here over ``meta.n_bytes`` so the PAYLOAD is
    never read: the manifest costs one metadata-column window per
    format, not a byte of media I/O.  One hash exchange on ``format``;
    at 100 TB the window key becomes (format, coarse_shard) exactly as
    documented for sequence packing.
    """
    from pyspark.sql.window import Window

    media = media_table(spark, sf_dir)
    sized = media.select(
        "doc_id",
        F.col("meta.format").alias("format"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )
    w = (
        Window.partitionBy("format")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_bytes").over(w) - F.col("n_bytes")
    placed = sized.withColumn(
        "shard_id", F.floor(start / F.lit(float(SHARD_BYTE_BUDGET))).cast("long")
    )
    return placed.groupBy("format", "shard_id").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").cast("long").alias("shard_bytes"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )

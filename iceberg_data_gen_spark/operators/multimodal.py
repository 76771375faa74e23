"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, and Pandas-UDF decode / feature-extract / frame-sample stages.

The decode stage is REAL for the two public uncompressed formats a
container without media libraries can still speak: RIFF/WAVE 16-bit PCM
audio and PPM ``P6`` images.  ``q_multimodal_decode`` synthesizes
genuine encoded bytes (a 44-byte RIFF header + PCM samples; a ``P6``
ASCII header + RGB triples), then parses them back header-first with
numpy alone inside an Arrow-batched ``mapInPandas`` kernel — byte
payload in, decoded ndarray out, per-item features computed on the
decoded samples/pixels.  Compressed image formats (PNG/JPEG/BMP/GIF)
decode for REAL through the ``HAVE_PIL`` branch when PIL is installed
(same ndarray/feature contract as the PPM path; lossless formats
round-trip bit-identically — property-tested in tests/test_llm_ops.py,
auto-skipped where PIL is absent, as in this container).

The driver testdata has no binary tables, so ``media_table`` synthesizes
payloads deterministically from ``documents`` (utf-8 bytes of ``text``
standing in for encoded media) — the same trick both engines can
replay, which keeps the metadata queries oracle-checkable; the decode
query builds real WAV/PPM bytes instead, also deterministically.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_data_gen_spark.operators import register
from iceberg_data_gen_spark.operators.common import (
    docs_table,
    round_half_up,
    round_half_up_sql,
)

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
    # docs_table, not a hand-rolled load (r11 review): common.py's
    # loader is the declared single choke point for documents loading.
    # NULL doc_id rows drop (r11 keys-pass review): the format routing,
    # synthetic dimensions, and shard windows are all functions of
    # doc_id — Spark's element_at(array, NULL) yields NULL format where
    # the oracles' CASE ... ELSE 'wav' yields 'wav', and an id-less blob
    # is unaddressable by any media pipeline.  Every consumer oracle
    # carries the matching WHERE doc_id IS NOT NULL.
    docs = docs_table(spark, sf_dir).where(F.col("doc_id").isNotNull())
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
    FROM documents WHERE doc_id IS NOT NULL
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
    """Build the per-partition Arrow batch byte-feature function.

    Returned as a closure (NOT a module-level function) so cloudpickle
    serializes it by value — Spark's Python workers don't have this repo
    on their sys.path when the driver imports us from elsewhere.

    This stage computes deterministic BYTE-level features regardless of
    installed codecs (it feeds QA dashboards that must not depend on
    decodability); actual decoding — including the PIL seam for
    compressed formats — lives in ``make_media_decode_batch``.
    ``have_pil`` is accepted for signature stability but unused here.
    """
    del have_pil  # byte-feature stage: codec availability is irrelevant

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            # NULL payloads (encode(NULL text) is NULL — FIXTURES.md permits
            # NULL text and the testdata regenerates every round) flow
            # through as NULL features, not a TypeError from len(None)
            # (ADVICE r10 medium).  Nullable extension dtypes, NOT numpy
            # NaN floats: the Arrow serializer turns pd.NA into a true
            # SQL NULL, while a NaN would survive as NaN and diverge from
            # the oracle's NULL (the q_ewma NaN-vs-NULL class, r10).
            payloads = [None if b is None else bytes(b) for b in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": pdf["format"],
                    "n_bytes": _pd.array(
                        [None if b is None else len(b) for b in payloads],
                        dtype="Int64",
                    ),
                    # deterministic stand-in for a pixel statistic
                    "mean_byte": _pd.array(
                        [
                            None
                            if b is None
                            else (sum(b) / len(b) if len(b) else 0.0)
                            for b in payloads
                        ],
                        dtype="Float64",
                    ),
                    "frames_sampled": _pd.array(
                        [
                            None if b is None else min(8, max(1, len(b) // 64))
                            for b in payloads
                        ],
                        dtype="Int32",
                    ),
                }
            )

    return decode_batch


@register(
    "q_multimodal_decode",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format,
             hex(encode(text)) AS h,
             octet_length(encode(text)) AS n
      FROM documents WHERE doc_id IS NOT NULL
    )
    SELECT doc_id, format, CAST(n AS BIGINT) AS n_bytes,
           CASE WHEN n = 0 THEN 0.0 ELSE
             CAST(list_sum([(strpos('0123456789ABCDEF', h[2*i-1:2*i-1])-1)*16
                            + (strpos('0123456789ABCDEF', h[2*i:2*i])-1)
                            for i in generate_series(1, CAST(n AS INT))]) AS DOUBLE) / n
           END AS mean_byte,
           -- explicit NULL guard: DuckDB's greatest() SKIPS NULL operands
           -- (greatest(1, NULL) = 1), so without it a NULL-text row would
           -- get frames_sampled = 1 while the kernel emits NULL (ADVICE r10)
           CASE WHEN n IS NULL THEN NULL
                ELSE CAST(least(8, greatest(1, n // 64)) AS INT) END AS frames_sampled
    FROM b
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract stage over the multimodal table (legacy
    byte-feature path; see ``q_multimodal_codec_roundtrip`` for the
    real-format decode).

    ``mapInPandas`` streams Arrow batches through Python once —
    the only Python hop in the media pipeline — and runs one task per
    input partition, so throughput scales with executors.  Output is
    deterministic (stub features), so row-level checks are stable.

    Oracle (r10, closing VERDICT r9 #6): every emitted feature is a pure
    function of the payload BYTES, and the payload is ``encode(text)``,
    so DuckDB recomputes the whole frame by hex-expanding the blob and
    folding nibble pairs — ``mean_byte``'s integer byte-sum is exact,
    and the final single IEEE division matches numpy's ``sum(b)/len(b)``
    bit-for-bit.  The one rows-only query with no oracle-bearing witness
    is thereby retired by giving it a full oracle instead."""
    m = media_table(spark, sf_dir).select(
        "doc_id", F.col("meta.format").alias("format"), "payload"
    )
    return m.mapInPandas(make_decode_batch(HAVE_PIL), DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL codecs: RIFF/WAVE 16-bit PCM and PPM P6 — encode AND decode, numpy-only
# ---------------------------------------------------------------------------

MEDIA_DECODE_SCHEMA = (
    "doc_id long, format string, n_bytes long, width int, height int, "
    "n_samples long, sample_rate int, duration_ms double, "
    "mean_value double, rms double"
)


def make_media_encode_batch():
    """Arrow-batched fixture-encode kernel: doc_id → genuine encoded
    media bytes.  Even docs become WAV (RIFF header + int16 PCM of a
    deterministic integer waveform), odd docs become PPM P6 (ASCII
    header + RGB bytes of a deterministic gradient).  Self-contained
    closure (numpy/stdlib only) so executor workers need no repo import.

    At 100 TB real media arrives already encoded; this stage exists so
    the DECODE below runs against true on-the-wire bytes, not a fake.
    """

    def encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as _np
        import pandas as _pd

        def wav_bytes(doc_id: int) -> bytes:
            rate = 8000
            n = 64 + (doc_id % 192)
            t = _np.arange(n, dtype=_np.int64)
            # integer "triangle-ish" waveform — deterministic, exact
            samples = (((t * (7 + doc_id % 13)) % 2048) - 1024).astype("<i2")
            data = samples.tobytes()
            hdr = (
                b"RIFF"
                + struct.pack("<I", 36 + len(data))
                + b"WAVEfmt "
                + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
                + b"data"
                + struct.pack("<I", len(data))
            )
            return hdr + data

        def ppm_bytes(doc_id: int) -> bytes:
            w = 8 + (doc_id % 24)
            h = 6 + ((doc_id * 3) % 18)
            yy, xx = _np.mgrid[0:h, 0:w]
            rgb = _np.stack(
                [
                    (xx * 255 // max(w - 1, 1)),
                    (yy * 255 // max(h - 1, 1)),
                    ((xx + yy + doc_id) % 256),
                ],
                axis=-1,
            ).astype(_np.uint8)
            return f"P6\n{w} {h}\n255\n".encode() + rgb.tobytes()

        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = [
                wav_bytes(i) if i % 2 == 0 else ppm_bytes(i) for i in ids
            ]
            yield _pd.DataFrame(
                {
                    "doc_id": ids,
                    "format": ["wav" if i % 2 == 0 else "ppm" for i in ids],
                    "payload": payloads,
                }
            )

    return encode_batch


def make_media_decode_batch(have_pil: bool):
    """Arrow-batched REAL decode kernel: parse the container header,
    reconstruct the sample/pixel ndarray with ``np.frombuffer``, and
    compute features ON THE DECODED DATA (duration and RMS from PCM
    samples; dimensions and channel means from pixels).  Raises
    ``ValueError`` on malformed bytes — this is a decoder, not a
    length-counter — for the PIL branch too (PIL's own decode errors
    are re-raised under the same contract).  Compressed image formats
    dispatch to PIL when ``have_pil``; without it they fail loudly.
    Self-contained closure: numpy/stdlib (+ optional PIL) only."""

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as _np
        import pandas as _pd

        def decode_wav(b: bytes) -> dict:
            if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                raise ValueError("not a RIFF/WAVE payload")
            # walk chunks: fmt_ then data (public container layout);
            # every declared size is validated against the payload —
            # a truncated or over-declared chunk raises instead of
            # silently decoding a prefix
            pos, rate, bits, channels, data = 12, None, None, None, None
            while pos + 8 <= len(b):
                cid = b[pos : pos + 4]
                size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
                if pos + 8 + size > len(b):
                    raise ValueError(
                        f"truncated {cid!r} chunk: declares {size} bytes"
                    )
                body = b[pos + 8 : pos + 8 + size]
                if cid == b"fmt ":
                    if size < 16:
                        raise ValueError("fmt chunk shorter than 16 bytes")
                    _, channels, rate, _, _, bits = struct.unpack(
                        "<HHIIHH", body[:16]
                    )
                elif cid == b"data":
                    data = body
                pos += 8 + size + (size % 2)
            if rate is None or data is None or bits != 16 or channels != 1:
                raise ValueError("unsupported WAV layout")
            if rate == 0:
                # keep the documented ValueError contract — a declared
                # rate of 0 otherwise surfaces as ZeroDivisionError in
                # the duration computation (review r7)
                raise ValueError("fmt chunk declares sample_rate = 0")
            if len(data) == 0 or len(data) % 2:
                raise ValueError("data chunk empty or odd-sized for 16-bit PCM")
            samples = _np.frombuffer(data, dtype="<i2").astype(_np.float64)
            return {
                "width": None,
                "height": None,
                "n_samples": len(samples),
                "sample_rate": rate,
                "duration_ms": round(1000.0 * len(samples) / rate, 6),
                "mean_value": round(float(samples.mean()), 6),
                "rms": round(float(_np.sqrt((samples**2).mean())), 6),
            }

        def decode_ppm(b: bytes) -> dict:
            # the magic must be the complete first token: "P6" followed
            # by whitespace or a comment (review r9: accepting any
            # prefix let e.g. a "P61 ..." payload misparse as a 1-wide
            # image and return confidently wrong stats)
            if b[:2] != b"P6" or not (
                len(b) > 2 and (b[2:3].isspace() or b[2:3] == b"#")
            ):
                raise ValueError("not a PPM P6 payload")
            # header = 4 whitespace-separated tokens: P6 w h maxval;
            # '#' starts a comment running to end-of-line (netpbm spec) —
            # a spec-valid file from another tool must not be rejected
            tokens, pos = [], 2
            while len(tokens) < 3:
                while pos < len(b) and (
                    b[pos : pos + 1].isspace() or b[pos : pos + 1] == b"#"
                ):
                    if b[pos : pos + 1] == b"#":
                        while pos < len(b) and b[pos : pos + 1] != b"\n":
                            pos += 1
                    else:
                        pos += 1
                start = pos
                while pos < len(b) and not b[pos : pos + 1].isspace():
                    pos += 1
                tokens.append(int(b[start:pos]))
            pos += 1  # single whitespace after maxval, then raster
            w, h, maxval = tokens
            if w <= 0 or h <= 0:
                # zero/negative dims otherwise reshape to an empty array
                # whose mean()/rms are NaN — a quietly poisoned stat
                # instead of the documented ValueError (review r7)
                raise ValueError(f"non-positive raster dimensions {w}x{h}")
            if not (1 <= maxval <= 255):
                # any maxval in [1, 255] is one byte per sample per the
                # netpbm spec (real tools emit e.g. 200); stats are over
                # the RAW sample bytes, unnormalized.  maxval >= 256
                # means 2-byte samples — genuinely unsupported.
                raise ValueError("only 1-byte-per-sample PPM supported (maxval 1-255)")
            px = _np.frombuffer(b, dtype=_np.uint8, count=w * h * 3, offset=pos)
            rgb = px.reshape(h, w, 3).astype(_np.float64)
            return {
                "width": w,
                "height": h,
                "n_samples": None,
                "sample_rate": None,
                "duration_ms": None,
                "mean_value": round(float(rgb.mean()), 6),
                "rms": round(float(_np.sqrt((rgb**2).mean())), 6),
            }

        for pdf in batches:
            rows = []
            for doc_id, fmt, payload in zip(
                pdf["doc_id"], pdf["format"], pdf["payload"]
            ):
                b = bytes(payload)
                if fmt == "wav":
                    feats = decode_wav(b)
                elif fmt == "ppm":
                    feats = decode_ppm(b)
                elif have_pil and fmt in ("png", "jpeg", "jpg", "bmp", "gif"):
                    # compressed-format path: PIL does the container/
                    # entropy decode, features come off the same ndarray
                    # contract as decode_ppm (lossless formats therefore
                    # produce bit-identical stats to their source raster)
                    import io as _io

                    import PIL.Image as _Image

                    try:
                        img = _Image.open(_io.BytesIO(b)).convert("RGB")
                    except Exception as exc:  # PIL raises OSError et al.
                        # one malformed-bytes contract for every format:
                        # ValueError, like the wav/ppm paths
                        raise ValueError(f"undecodable {fmt} payload: {exc}") from exc
                    rgb = _np.asarray(img, dtype=_np.float64)
                    feats = {
                        "width": int(rgb.shape[1]),
                        "height": int(rgb.shape[0]),
                        "n_samples": None,
                        "sample_rate": None,
                        "duration_ms": None,
                        "mean_value": round(float(rgb.mean()), 6),
                        "rms": round(float(_np.sqrt((rgb**2).mean())), 6),
                    }
                else:
                    raise ValueError(f"no decoder for format {fmt!r}")
                rows.append(
                    {"doc_id": doc_id, "format": fmt, "n_bytes": len(b), **feats}
                )
            # explicit columns: a 0-row batch must still carry the full
            # schema or the Arrow serializer rejects the frame
            yield _pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "format", "n_bytes", "width", "height",
                    "n_samples", "sample_rate", "duration_ms",
                    "mean_value", "rms",
                ],
            )

    return decode_batch


@register("q_multimodal_codec_roundtrip")  # real codec: rows-only check
def q_multimodal_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode end-to-end: encode genuine WAV-PCM / PPM-P6
    bytes (one format per parity of ``doc_id``), ship them through a
    binary column, and decode them back — header parse, ndarray
    reconstruction, features on the decoded samples/pixels.

    Two chained ``mapInPandas`` stages (encode fixture → decode), each
    one task per partition, payload bytes never leaving the executor —
    the exact topology of a production decode stage reading
    already-encoded blobs from parquet/tar shards.  Deterministic
    output; the encode↔decode agreement is asserted row-exactly in
    ``tests/test_llm_ops.py``."""
    # NULL doc_id rows drop (r11 keys-pass review): the encode kernel's
    # ids.astype("int64") raises on the NaN a nulled long column arrives
    # as, and the audit's analytic twin derives every feature from
    # doc_id — an id-less row has no defined fixture bytes
    docs = docs_table(spark, sf_dir).where(F.col("doc_id").isNotNull())
    src = docs.select("doc_id").repartition(8, "doc_id")
    encoded = src.mapInPandas(
        make_media_encode_batch(), "doc_id long, format string, payload binary"
    )
    return encoded.mapInPandas(
        make_media_decode_batch(HAVE_PIL), MEDIA_DECODE_SCHEMA
    )


@register(
    "q_multimodal_frame_stats",
    oracle=f"""
    WITH d AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format,
               octet_length(encode(text)) AS n_bytes
        FROM documents WHERE doc_id IS NOT NULL
    )
    SELECT format,
           count(*) AS n_docs,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           -- round_half_up, not native round (r11 review: the
           -- representation-dependent tie class review r10 closed)
           {round_half_up_sql('avg(n_bytes)', 4)} AS avg_bytes,
           -- NULL payloads contribute NO frame budget (r11 review:
           -- greatest() SKIPS NULLs on both engines, so a NULL-byte
           -- doc counted 1 frame here while the decode stage emits
           -- frames_sampled NULL for it — the scheduler view and the
           -- decode view now agree)
           CAST(sum(CASE WHEN n_bytes IS NULL THEN NULL
                         ELSE least(8, greatest(1, n_bytes // 64)) END)
                AS BIGINT) AS total_frames
    FROM d GROUP BY format
    """,
)
def q_multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-format media statistics incl. the frame-sampling budget —
    metadata-only aggregation (what a scheduler would run before
    launching the decode stage)."""
    m = media_table(spark, sf_dir)
    # NULL guard: Spark's greatest() also SKIPS NULLs, so without it a
    # NULL-payload doc budgeted 1 frame the decode stage will never
    # sample (r11 review — see the oracle comment)
    frames = F.when(
        F.col("meta.n_bytes").isNull(), F.lit(None).cast("long")
    ).otherwise(
        F.least(F.lit(8), F.greatest(F.lit(1), F.floor(F.col("meta.n_bytes") / 64)))
    )
    return m.groupBy(F.col("meta.format").alias("format")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        round_half_up(F.avg("meta.n_bytes"), 4).alias("avg_bytes"),
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
        FROM documents WHERE doc_id IS NOT NULL
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


# ---------------------------------------------------------------------------
# codec audit: driver-checkable witness for the rows-only decode pair
# ---------------------------------------------------------------------------

CODEC_STAT_SLACK = 5.1e-7  # half-quantum of the decoder's round(x, 6)


def _expected_codec_features(docs: DataFrame) -> DataFrame:
    """Analytic twin of the encode/decode kernels: every feature the
    decoder extracts is recomputed HERE from ``doc_id`` alone with JVM
    higher-order functions — no Python, no shared code with the kernels —
    because the fixture waveform/gradient is pure integer arithmetic.

    Exactness: the PCM samples are integers in [-1024, 1023] and the
    pixel bytes in [0, 255], so every partial sum (≤ 2^28) is exactly
    representable; any summation order — numpy's pairwise mean on the
    decode side, the sequential SQL ``aggregate`` fold here — produces
    the identical integer, and the final mean/rms divisions see the same
    exact operands in both paths.  The only divergence left is the
    decoder's ``round(x, 6)``, bounded by ``CODEC_STAT_SLACK``.
    """
    wav = (
        docs.where(F.col("doc_id") % 2 == 0)
        .selectExpr(
            "doc_id",
            "CAST(64 + doc_id % 192 AS BIGINT) AS n",
            "CAST(7 + doc_id % 13 AS BIGINT) AS k",
        )
        .selectExpr(
            "doc_id",
            "'wav' AS format_exp",
            "CAST(44 + 2 * n AS BIGINT) AS n_bytes_exp",
            "CAST(NULL AS INT) AS width_exp",
            "CAST(NULL AS INT) AS height_exp",
            "n AS n_samples_exp",
            "CAST(8000 AS INT) AS rate_exp",
            "1000.0D * n / 8000 AS dur_exp",
            # samples[t] = ((t*k) % 2048) - 1024, t in [0, n)
            """aggregate(
                 sequence(CAST(0 AS BIGINT), n - 1),
                 named_struct('s', CAST(0 AS BIGINT), 'q', CAST(0 AS BIGINT)),
                 (acc, t) -> named_struct(
                   's', acc.s + ((t * k) % 2048 - 1024),
                   'q', acc.q + ((t * k) % 2048 - 1024) * ((t * k) % 2048 - 1024)),
                 acc -> named_struct('m', acc.s / n, 'r', sqrt(acc.q / n))
               ) AS st""",
        )
    )
    # pixel (x, y): r = x*255 div (w-1), g = y*255 div (h-1),
    # b = (x + y + doc_id) % 256; flattened as x = i % w, y = i div w
    r = "(((i % w) * 255) div (w - 1))"
    g = "(((i div w) * 255) div (h - 1))"
    b = "((i % w + i div w + doc_id) % 256)"
    ppm = (
        docs.where(F.col("doc_id") % 2 == 1)
        .selectExpr(
            "doc_id",
            "CAST(8 + doc_id % 24 AS BIGINT) AS w",
            "CAST(6 + (doc_id * 3) % 18 AS BIGINT) AS h",
        )
        .selectExpr(
            "doc_id",
            "'ppm' AS format_exp",
            # header 'P6\\n{w} {h}\\n255\\n' = 9 + len(w) + len(h) bytes
            "CAST(9 + length(CAST(w AS STRING)) + length(CAST(h AS STRING))"
            " + 3 * w * h AS BIGINT) AS n_bytes_exp",
            "CAST(w AS INT) AS width_exp",
            "CAST(h AS INT) AS height_exp",
            "CAST(NULL AS BIGINT) AS n_samples_exp",
            "CAST(NULL AS INT) AS rate_exp",
            "CAST(NULL AS DOUBLE) AS dur_exp",
            f"""aggregate(
                 sequence(CAST(0 AS BIGINT), w * h - 1),
                 named_struct('s', CAST(0 AS BIGINT), 'q', CAST(0 AS BIGINT)),
                 (acc, i) -> named_struct(
                   's', acc.s + {r} + {g} + {b},
                   'q', acc.q + {r} * {r} + {g} * {g} + {b} * {b}),
                 acc -> named_struct('m', acc.s / (3 * w * h),
                                     'r', sqrt(acc.q / (3 * w * h)))
               ) AS st""",
        )
    )
    return wav.unionByName(ppm).select(
        "doc_id",
        "format_exp",
        "n_bytes_exp",
        "width_exp",
        "height_exp",
        "n_samples_exp",
        "rate_exp",
        "dur_exp",
        F.col("st.m").alias("mean_exp"),
        F.col("st.r").alias("rms_exp"),
    )


def _codec_audit_frame(spark: SparkSession, sf_dir: str, decoded: DataFrame) -> DataFrame:
    """Audit core, parameterized on the decoded frame so the negative
    controls in tests/test_llm_ops.py can feed perturbed variants and
    assert each boolean flips (the q_minhash_lsh_audit convention)."""
    # same NULL-id drop as the pipeline under audit (r11 keys pass):
    # the analytic twin cannot derive fixture bytes for an id-less row
    docs = (
        docs_table(spark, sf_dir)
        .where(F.col("doc_id").isNotNull())
        .select("doc_id")
    )
    exp = _expected_codec_features(docs)
    # FULL outer (ADVICE r9): a left join hid decoded rows whose doc_id
    # matches no document — id-corruption emitted a spurious row the audit
    # booleans never saw.  With the outer join such rows survive with a
    # NULL expected side and are counted as `foreign` below.
    j = exp.join(decoded, "doc_id", "full")

    exp_present = F.col("format_exp").isNotNull()
    dec_present = F.col("format").isNotNull()
    wav_row = F.col("format_exp") == "wav"
    slack = F.lit(CODEC_STAT_SLACK)
    wav_ok = (
        (F.col("n_bytes") == F.col("n_bytes_exp"))
        & (F.col("n_samples") == F.col("n_samples_exp"))
        & (F.col("sample_rate") == F.col("rate_exp"))
        & (F.abs(F.col("duration_ms") - F.col("dur_exp")) <= slack)
        & F.col("width").isNull()
        & F.col("height").isNull()
    )
    ppm_ok = (
        (F.col("n_bytes") == F.col("n_bytes_exp"))
        & (F.col("width") == F.col("width_exp"))
        & (F.col("height") == F.col("height_exp"))
        & F.col("n_samples").isNull()
        & F.col("sample_rate").isNull()
        & F.col("duration_ms").isNull()
    )
    stats_ok = (F.abs(F.col("mean_value") - F.col("mean_exp")) <= slack) & (
        F.abs(F.col("rms") - F.col("rms_exp")) <= slack
    )

    def bad(cond) -> F.Column:
        # NULL-hostile counter: a NULL comparison (field unexpectedly
        # missing) counts as BAD, never silently passes.  Guarded on
        # BOTH sides being present — a decoded row with no expected twin
        # is counted once, as `foreign`, not re-flagged per boolean.
        return F.coalesce(
            F.sum(
                (exp_present & dec_present & ~F.coalesce(cond, F.lit(False))).cast(
                    "long"
                )
            ),
            F.lit(0),
        )

    agg = j.agg(
        F.coalesce(F.sum(exp_present.cast("long")), F.lit(0)).alias("n_rows"),
        F.count_distinct(F.when(exp_present, F.col("doc_id"))).alias("n_docs"),
        F.count_distinct(F.when(wav_row, F.col("doc_id"))).alias("n_wav"),
        F.count_distinct(F.when(~wav_row, F.col("doc_id"))).alias("n_ppm"),
        F.coalesce(F.sum((exp_present & ~dec_present).cast("long")), F.lit(0)).alias(
            "missing"
        ),
        # decoded rows whose doc_id matches no document (ADVICE r9):
        # visible only because the join above is FULL outer
        F.coalesce(F.sum((~exp_present).cast("long")), F.lit(0)).alias("foreign"),
        bad(F.col("format") == F.col("format_exp")).alias("fmt_bad"),
        bad(~wav_row | wav_ok).alias("wav_bad"),
        bad(wav_row | ppm_ok).alias("ppm_bad"),
        bad(stats_ok).alias("stat_bad"),
    )
    return agg.select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_wav").cast("long").alias("n_wav"),
        F.col("n_ppm").cast("long").alias("n_ppm"),
        (
            (F.col("missing") == 0)
            & (F.col("foreign") == 0)
            & (F.col("n_rows") == F.col("n_docs"))
        ).alias("roundtrip_complete"),
        (F.col("fmt_bad") == 0).alias("format_match"),
        (F.col("wav_bad") == 0).alias("wav_exact"),
        (F.col("ppm_bad") == 0).alias("ppm_exact"),
        (F.col("stat_bad") == 0).alias("stats_match"),
    )


@register(
    "q_multimodal_codec_audit",
    oracle="""
    SELECT count(*) AS n_docs,
           count(CASE WHEN doc_id % 2 = 0 THEN 1 END) AS n_wav,
           count(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS n_ppm,
           TRUE AS roundtrip_complete,
           TRUE AS format_match,
           TRUE AS wav_exact,
           TRUE AS ppm_exact,
           TRUE AS stats_match
    FROM documents WHERE doc_id IS NOT NULL
    """,
)
def q_multimodal_codec_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable witness for the REAL codec pair (the VERDICT r8
    ε-witness pattern, extended to the last witness-less rows-only
    queries): the encode fixture is pure integer arithmetic on
    ``doc_id``, so every feature the decoder extracts — byte length,
    dimensions, sample count/rate/duration, and the mean/RMS of the
    decoded samples/pixels — is recomputed ANALYTICALLY in JVM
    higher-order functions by ``_expected_codec_features`` and compared
    row-by-row against the actual encode→decode pipeline.  Two fully
    independent implementations (numpy byte-parse vs SQL integer folds)
    must agree on every row for the booleans to hold:

    * ``roundtrip_complete`` — exactly one decoded row per document
      (none missing, none duplicated, none spurious — a decoded row
      whose doc_id matches no document is counted via the full outer
      join's unmatched side, ADVICE r9).
    * ``format_match`` — parity routing (even→wav, odd→ppm) survived
      the pipeline.
    * ``wav_exact`` / ``ppm_exact`` — container-level features equal the
      analytic values EXACTLY (integer equality), and the fields foreign
      to the format are NULL.
    * ``stats_match`` — decoded-data mean/RMS within the decoder's
      round(x, 6) half-quantum of the analytic integer-exact values.

    The oracle pins the booleans TRUE and recomputes the parity counts,
    so a regression anywhere in the binary plumbing — header emit,
    chunk-walk parse, ndarray reshape, stat computation — fails the
    driver hash gate even though the decode output itself stays
    rows-only.  SCALE: one ``mapInPandas`` pass (the pipeline under
    audit) plus one HOF projection over |docs| rows and a co-keyed
    left join; no payload byte ever leaves the executors."""
    from iceberg_data_gen_spark.operators import QUERIES

    decoded = QUERIES["q_multimodal_codec_roundtrip"](spark, sf_dir)
    return _codec_audit_frame(spark, sf_dir, decoded)

"""Multimodal catalog queries: binary-payload plumbing over documents.

The fixture text is pure ASCII, so UTF-8 payload bytes coincide with
character codes — letting DuckDB oracle-check the real binary-column
pipeline (encode -> mapInPandas numpy byte histogram) via ascii().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_spark import tables
from vector_search_spark.operators import multimodal
from vector_search_spark.queries import register, rnd

# --- seeded real-image fixture (r14) ---------------------------------------
# documents.text is prose, not pixels — so the image-decode entry SEEDS
# deterministic images per doc: logical pixel value at flattened
# row-major RGB index j is v(doc_id, j) = (doc_id*7 + j*13) % 256, with
# w = 4 + doc_id % 5, h = 3 + doc_id % 4 (varying dims exercise header
# parsing, not just raster math). Even ids serialize as binary netpbm
# P6 (with a comment line — the header grammar's tricky part); odd ids
# as 24-bit bottom-up BMP (BGR rows, 4-byte padding). BOTH encoders
# invert to the SAME logical pixels, so one closed-form oracle checks
# both decoders byte-exactly — the decode is REAL (pure-numpy parsers
# in operators/multimodal.py, no Pillow), and DuckDB replays v(j)
# without ever parsing an image.

IMG_DOCS = 200


def _bmp_header(w: int, h: int, stride: int) -> bytes:
    """14-byte file header + 40-byte BITMAPINFOHEADER for an
    uncompressed 24-bit bottom-up BMP."""

    def u16(x: int) -> bytes:
        return int(x).to_bytes(2, "little")

    def u32(x: int) -> bytes:
        return int(x).to_bytes(4, "little")

    return (
        b"BM"
        + u32(54 + stride * h)  # file size
        + u32(0)  # reserved
        + u32(54)  # pixel data offset
        + u32(40)  # BITMAPINFOHEADER size
        + u32(w)
        + u32(h)  # positive height = bottom-up rows
        + u16(1)  # planes
        + u16(24)  # bpp
        + u32(0)  # BI_RGB (uncompressed)
        + u32(stride * h)  # image size
        + u32(2835)  # x pixels/meter (72 dpi)
        + u32(2835)
        + u32(0)  # palette colors
        + u32(0)  # important colors
    )


def _seeded_payloads(docs: DataFrame) -> DataFrame:
    """(doc_id, payload binary) — the deterministic image corpus
    described above; mapInPandas so bytes are built Arrow-batched,
    the same execution contract as the decode stage that reads them."""
    import numpy as np
    import pandas as pd

    src = docs.select("doc_id").filter(F.col("doc_id") < IMG_DOCS)

    def fn(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = 4 + d % 5
                h = 3 + d % 4
                j = np.arange(3 * h * w, dtype=np.int64)
                rgb = ((d * 7 + j * 13) % 256).astype(np.uint8).reshape(
                    h, w, 3
                )
                if d % 2 == 0:
                    payload = (
                        b"P6\n# seeded rgb\n"
                        + f"{w} {h}\n255\n".encode()
                        + rgb.tobytes()
                    )
                else:
                    stride = (w * 3 + 3) & ~3
                    rows = np.zeros((h, stride), dtype=np.uint8)
                    # bottom-up row order, BGR channel order — the
                    # on-disk BMP layout the decoder must normalize
                    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)
                    payload = _bmp_header(w, h, stride) + rows.tobytes()
                ids.append(d)
                payloads.append(payload)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return src.mapInPandas(fn, "doc_id long, payload binary")


@register(
    "multimodal_image_decode",
    f"""
WITH d AS (
  SELECT doc_id,
         4 + doc_id % 5 AS width,
         3 + doc_id % 4 AS height,
         CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'bmp' END AS fmt
  FROM documents WHERE doc_id < {IMG_DOCS}
)
SELECT doc_id, fmt,
       CAST(height AS INT) AS height,
       CAST(width AS INT) AS width,
       CAST(3 AS INT) AS channels,
       CAST(3 * height * width AS BIGINT) AS n_vals,
       CAST(list_sum(list_transform(range(0, 3 * height * width),
            j -> (doc_id * 7 + j * 13) % 256)) AS BIGINT) AS px_sum,
       (ROUND(list_sum(list_transform(range(0, 3 * height * width),
            j -> (doc_id * 7 + j * 13) % 256))
            * 1.0 / (3 * height * width), 6) + 0.0) AS px_mean
FROM d
""",
    "multimodal",
)
def q_multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, no codec library (multimodal.decode_pixels):
    seeded P6 netpbm (even ids) and 24-bit bottom-up BMP (odd ids)
    payloads carry the same closed-form pixels; the pure-numpy parsers
    must invert both serializations — header grammar, bottom-up row
    flip, BGR->RGB — byte-exactly, proven by per-image dimension +
    pixel-sum aggregates against the formula DuckDB replays without
    parsing any image. Plan: one documents scan -> two chained
    mapInPandas stages (seed, decode) -> row-local aggregates; no
    shuffle anywhere."""
    docs = tables.load(spark, sf_dir, "documents")
    dec = multimodal.decode_pixels(_seeded_payloads(docs))
    return dec.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit("ppm"))
        .otherwise(F.lit("bmp"))
        .alias("fmt"),
        "height",
        "width",
        "channels",
        F.size("pixels").cast("bigint").alias("n_vals"),
        F.aggregate(
            "pixels", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("px_sum"),
    ).withColumn(
        "px_mean", rnd(F.col("px_sum") / F.col("n_vals"))
    )


@register(
    "multimodal_byte_histogram",
    """
WITH idx AS (
  SELECT unnest(range(1, (SELECT max(length(text)) + 1 FROM documents))) AS i
),
ch AS (
  SELECT d.doc_id, length(d.text) AS n,
         ascii(substr(d.text, CAST(idx.i AS INT), 1)) AS code
  FROM documents d CROSS JOIN idx
  WHERE idx.i <= length(d.text)
)
SELECT doc_id, CAST(code // 16 AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS count,
       (ROUND(COUNT(*) * 1.0 / any_value(n), 6) + 0.0) AS frac
FROM ch GROUP BY doc_id, code // 16
""",
    "multimodal",
)
def q_multimodal_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary feature extraction: UTF-8 payload -> Arrow-batched numpy
    byte histogram (16 buckets). The execution shape of an image
    featurizer, with a value-exact oracle."""
    docs = tables.load(spark, sf_dir, "documents")
    payload = multimodal.with_payload(docs)
    out = multimodal.byte_histogram(payload)
    return out.select(
        "doc_id", "bucket", "count", rnd("frac").alias("frac")
    )


@register(
    "multimodal_metadata",
    """
SELECT doc_id,
       CAST(length(text) AS INT) AS n_bytes,
       md5(text) AS checksum,
       CAST(length(text) % 640 + 1 AS INT) AS pseudo_width,
       CAST(length(text) % 480 + 1 AS INT) AS pseudo_height
FROM documents
""",
    "multimodal",
)
def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed payload metadata struct (flattened for the compare)."""
    docs = tables.load(spark, sf_dir, "documents")
    out = multimodal.payload_metadata(multimodal.with_payload(docs))
    return out.select(
        "doc_id",
        F.col("meta.n_bytes").cast("int").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
        F.col("meta.pseudo_width").alias("pseudo_width"),
        F.col("meta.pseudo_height").alias("pseudo_height"),
    )


# --- seeded raw-PCM fixture (r14, late) -------------------------------------
# audio_features has been a REAL decode since r11 (int16 little-endian
# PCM needs no codec) but carried no oracle-paired entry. Same recipe
# as the image entry: seed deterministic samples per doc,
# s(doc_id, j) = ((doc_id*31 + j*17) % 65536) - 32768, serialized as
# int16 LE bytes; DuckDB replays the closed form — never parsing bytes
# — so the driver hash adjudicates the PCM decode + windowed RMS/ZCR
# math end-to-end. n_samples = 192 + (doc_id % 3) * 64 covers the
# operator's window-edge cases in one entry: 192 (single short
# window), 256 (exactly one full window), 320 (floor(n/256) = 1 ->
# the trailing 64 samples are ignored BY CONTRACT, and the oracle
# replays that truncation).

AUDIO_DOCS = 120
AUDIO_WINDOW = 256


def _seeded_pcm(docs: DataFrame) -> DataFrame:
    """(doc_id, payload binary) — int16 LE PCM from the closed form."""
    import numpy as np
    import pandas as pd

    src = docs.select("doc_id").filter(F.col("doc_id") < AUDIO_DOCS)

    def fn(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 192 + (d % 3) * 64
                j = np.arange(n, dtype=np.int64)
                s = ((d * 31 + j * 17) % 65536) - 32768
                ids.append(d)
                payloads.append(s.astype("<i2").tobytes())
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return src.mapInPandas(fn, "doc_id long, payload binary")


@register(
    "multimodal_audio_features",
    f"""
WITH d AS (
  SELECT doc_id, 192 + (doc_id % 3) * 64 AS n
  FROM documents WHERE doc_id < {AUDIO_DOCS}
),
wins AS (
  SELECT doc_id, n, unnest(range(0, greatest(n // {AUDIO_WINDOW}, 1))) AS wi
  FROM d
),
segs AS (
  SELECT doc_id, wi,
         list_transform(
           range(wi * {AUDIO_WINDOW}, least((wi + 1) * {AUDIO_WINDOW}, n)),
           j -> (((doc_id * 31 + j * 17) % 65536) - 32768) / 32768.0
         ) AS seg
  FROM wins
)
SELECT doc_id, CAST(wi AS INT) AS win_idx,
       (ROUND(sqrt(list_sum(list_transform(seg, x -> x * x)) / len(seg)), 6) + 0.0) AS rms,
       (ROUND(CASE WHEN len(seg) > 1 THEN
          list_sum(list_transform(range(2, len(seg) + 1),
            i -> CASE WHEN (seg[i] < 0) != (seg[i-1] < 0) THEN 1 ELSE 0 END))
          * 1.0 / (len(seg) - 1)
        ELSE 0.0 END, 6) + 0.0) AS zcr
FROM segs
""",
    "multimodal",
)
def q_multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL raw-PCM audio decode (multimodal.audio_features): seeded
    int16 LE samples -> per-window RMS energy + zero-crossing rate,
    value-adjudicated against the closed-form oracle (DuckDB replays
    the sample formula, the window slicing INCLUDING the trailing-
    partial-window truncation contract, and the RMS/ZCR math — it
    never parses bytes, so a hash match proves the byte decode
    inverted the seeding). Completes the multimodal symmetry: image
    and audio decodes are now BOTH driver-adjudicated. Plan: one
    documents scan -> two chained mapInPandas stages, no shuffle."""
    docs = tables.load(spark, sf_dir, "documents")
    out = multimodal.audio_features(
        _seeded_pcm(docs), window=AUDIO_WINDOW
    )
    return out.select(
        "doc_id",
        "win_idx",
        rnd("rms").alias("rms"),
        rnd("zcr").alias("zcr"),
    )

"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract / frame-sample as Arrow-batched stages.

Design (the 100 TB shape): media lives as a ``binary`` column (or an
object-store URI for very large assets) next to a typed metadata struct;
every processing stage is ``mapInPandas`` over Arrow batches, so bytes
cross the JVM↔Python boundary columnar, never row-at-a-time. Stages are
pure per-row maps — no shuffle — so they scale with input partitions.

Codec reality: this container has no image/audio codecs, so
``decode_image`` degrades to a clearly-marked deterministic fake unless
Pillow is importable (``strict=True`` raises NotImplementedError
instead). Everything around the decode — schemas, batch iteration,
feature shapes, sampling — is real and tested; swapping in a real codec
changes one function body.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "with_payload",
    "payload_metadata",
    "byte_histogram",
    "decode_image",
    "audio_features",
    "frame_sample",
]

N_BUCKETS = 16


def with_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize a binary payload column (UTF-8 bytes of the text
    fixture — a stand-in for real image/audio bytes with the same
    column type and batch behavior)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def payload_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata struct for an opaque payload: size + md5 +
    deterministic pseudo-dimensions (stand-ins for decoded width/height
    until a real codec fills them)."""
    size = F.octet_length(F.col(payload_col))
    return df.withColumn(
        "meta",
        F.struct(
            size.alias("n_bytes"),
            F.md5(F.col(payload_col)).alias("checksum"),
            (size % 640 + 1).cast("int").alias("pseudo_width"),
            (size % 480 + 1).cast("int").alias("pseudo_height"),
        ),
    )


def byte_histogram(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Feature extraction over raw bytes: 256/n_buckets-wide byte-value
    histogram per payload — a real, deterministic, dependency-free
    featurizer with the exact execution shape of an image embedder
    (mapInPandas, numpy over Arrow batches, fixed-width output).
    Returns (id, bucket, count, frac). Rows whose payload is NULL are
    EXCLUDED up front with an explicit plan filter (decoding nothing is
    not a zero histogram); n_buckets must divide 256 exactly or bytes
    at the top of the range would be silently truncated away."""
    if not (1 <= n_buckets <= 256) or 256 % n_buckets:
        raise ValueError(
            f"n_buckets must divide 256 (1..256), got {n_buckets}"
        )
    src = df.filter(F.col(payload_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(payload_col).alias("_p")
    )
    width = 256 // n_buckets

    def fn(batches):
        for pdf in batches:
            ids, buckets, counts, fracs = [], [], [], []
            for _id, payload in zip(pdf["_id"], pdf["_p"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(b // width, minlength=n_buckets)[:n_buckets]
                nz = np.nonzero(hist)[0]
                ids.append(np.full(len(nz), _id, dtype=np.int64))
                buckets.append(nz.astype(np.int32))
                counts.append(hist[nz].astype(np.int64))
                fracs.append(hist[nz] / max(len(b), 1))
            yield pd.DataFrame(
                {
                    # keyed by the PARAMETERIZED id name: Spark 4
                    # assigns mapInPandas output columns by schema
                    # NAME, so hardcoding 'doc_id' broke any
                    # non-default id_col (advice-prevention, r7)
                    id_col: np.concatenate(ids) if ids else [],
                    "bucket": np.concatenate(buckets) if buckets else [],
                    "count": np.concatenate(counts) if counts else [],
                    "frac": np.concatenate(fracs) if fracs else [],
                }
            )

    return src.mapInPandas(
        fn, f"{id_col} long, bucket int, count long, frac double"
    )


def decode_image(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    size: int = 8,
    strict: bool = False,
) -> DataFrame:
    """Decode + resize to a (size x size) grayscale float array per
    payload. With Pillow present: a real decode. Without: ``strict=True``
    raises NotImplementedError (no codec in this environment);
    ``strict=False`` produces a DETERMINISTIC FAKE — bytes tiled/
    truncated into the target shape and scaled to [0,1] — preserving
    schema, determinism, and batch shape for downstream testing.
    NULL payloads are excluded up front (plan filter), same policy as
    byte_histogram."""
    src = df.filter(F.col(payload_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(payload_col).alias("_p")
    )
    px = size * size

    def fn(batches):
        try:
            from PIL import Image  # noqa: F401

            have_pil = True
        except Exception:
            have_pil = False
        if strict and not have_pil:
            raise NotImplementedError(
                "decode_image requires an image codec (Pillow); not "
                "available in this environment — use strict=False for "
                "the deterministic fake decode"
            )
        import io

        for pdf in batches:
            ids, pixels = [], []
            for _id, payload in zip(pdf["_id"], pdf["_p"]):
                raw = bytes(payload)
                if have_pil:
                    from PIL import Image

                    img = Image.open(io.BytesIO(raw)).convert("L").resize(
                        (size, size)
                    )
                    arr = np.asarray(img, dtype=np.float64).reshape(-1) / 255.0
                else:
                    b = np.frombuffer(raw, dtype=np.uint8)
                    arr = np.resize(b, px).astype(np.float64) / 255.0
                ids.append(_id)
                pixels.append(arr)
            yield pd.DataFrame({id_col: ids, "pixels": pixels})

    return src.mapInPandas(fn, f"{id_col} long, pixels array<double>")


def audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    window: int = 256,
) -> DataFrame:
    """Audio featurization over raw PCM: interpret the payload as
    little-endian int16 samples (raw PCM needs NO codec — this is a
    real decode, not a stub), slide a fixed sample window, emit per-
    window RMS energy and zero-crossing rate — the classic cheap
    features for silence trimming / language-activity filtering in a
    training-data pipeline. Returns (id, win_idx, rms, zcr).

    Same execution contract as the other stages: mapInPandas, numpy
    over Arrow batches, per-row map, no shuffle.
    """
    src = df.filter(F.col(payload_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(payload_col).alias("_p")
    )  # NULL payloads excluded, same policy as byte_histogram

    def fn(batches):
        for pdf in batches:
            ids, idxs, rmss, zcrs = [], [], [], []
            for _id, payload in zip(pdf["_id"], pdf["_p"]):
                raw = bytes(payload)
                usable = len(raw) - (len(raw) % 2)
                if usable == 0:
                    continue
                pcm = np.frombuffer(raw[:usable], dtype="<i2").astype(
                    np.float64
                ) / 32768.0
                n_win = max(len(pcm) // window, 1)
                for wi in range(n_win):
                    seg = pcm[wi * window : (wi + 1) * window]
                    if not len(seg):
                        continue
                    ids.append(_id)
                    idxs.append(wi)
                    rmss.append(float(np.sqrt((seg * seg).mean())))
                    zcrs.append(
                        float((np.signbit(seg[1:]) != np.signbit(seg[:-1])).mean())
                        if len(seg) > 1
                        else 0.0
                    )
            yield pd.DataFrame(
                {id_col: ids, "win_idx": idxs, "rms": rmss, "zcr": zcrs}
            )

    return src.mapInPandas(
        fn, f"{id_col} long, win_idx int, rms double, zcr double"
    )


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_bytes: int = 32,
    every: int = 4,
) -> DataFrame:
    """'Video' frame sampling over an opaque byte stream: split the
    payload into fixed-size frames, keep every ``every``-th. The
    chunk/stride plumbing is the real thing; only the frame decode is
    a byte slice. Returns (id, frame_idx, frame binary)."""
    src = df.filter(F.col(payload_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(payload_col).alias("_p")
    )  # NULL payloads excluded, same policy as byte_histogram

    def fn(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for _id, payload in zip(pdf["_id"], pdf["_p"]):
                raw = bytes(payload)
                n_frames = max(len(raw) // frame_bytes, 1)
                for fi in range(0, n_frames, every):
                    ids.append(_id)
                    idxs.append(fi)
                    frames.append(raw[fi * frame_bytes : (fi + 1) * frame_bytes])
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame": frames}
            )

    return src.mapInPandas(fn, f"{id_col} long, frame_idx int, frame binary")

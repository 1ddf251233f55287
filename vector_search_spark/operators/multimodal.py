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
    "decode_pixels",
    "audio_features",
    "frame_sample",
]

N_BUCKETS = 16


# --------------------------------------------------------------------------
# Pure-numpy pixel decoders (r14): uncompressed formats need NO codec —
# the audio_features raw-PCM precedent applied to images. These make the
# image -> vector -> ANN path REAL in a container without Pillow; the
# Pillow path remains for compressed formats (JPEG/PNG) behind the
# existing import guard in decode_image.
# --------------------------------------------------------------------------


def _parse_pnm(raw: bytes) -> np.ndarray:
    """Decode binary netpbm (P5 grayscale / P6 RGB, maxval <= 255) to a
    (h, w, channels) uint8 array. Pure numpy + header scan — no codec
    library. Header grammar per the netpbm spec: magic, then width,
    height, maxval as ASCII decimals separated by whitespace, with
    ``#``-comments allowed between tokens; a single whitespace byte
    ends the header, then exactly h*w*channels raster bytes follow.
    Raises ValueError on other magics, maxval > 255 (2-byte samples —
    out of scope), or a truncated raster."""
    magic = raw[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PGM/PPM payload (magic {magic!r})")
    channels = 1 if magic == b"P5" else 3
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and comment lines between header tokens
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if pos < len(raw) and raw[pos : pos + 1] == b"#":
            nl = raw.find(b"\n", pos)
            if nl < 0:
                raise ValueError("unterminated comment in netpbm header")
            pos = nl + 1
            continue
        start = pos
        while pos < len(raw) and raw[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("malformed netpbm header")
        fields.append(int(raw[start:pos]))
    w, h, maxval = fields
    if w <= 0 or h <= 0:
        # mirror _parse_bmp's guard (r15 advice fix): a crafted
        # "P6 0 5 255" payload would otherwise yield an empty raster
        # that fails downstream with an opaque IndexError
        raise ValueError(f"degenerate netpbm dimensions {w}x{h}")
    if not (0 < maxval <= 255):
        raise ValueError(
            f"netpbm maxval {maxval} unsupported (need 1..255 — 2-byte "
            "samples are out of scope for the numpy decoder)"
        )
    pos += 1  # the single whitespace byte that terminates the header
    n = h * w * channels
    data = raw[pos : pos + n]
    if len(data) != n:
        raise ValueError(
            f"truncated netpbm raster: need {n} bytes, have {len(data)}"
        )
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, channels)


def _parse_bmp(raw: bytes) -> np.ndarray:
    """Decode an uncompressed (BI_RGB) BMP to (h, w, 3) uint8 RGB.
    Pure numpy + struct-free little-endian header reads. Supports the
    common on-disk variants: 24-bit BGR and 32-bit BGRA (alpha
    dropped), bottom-up (positive height — rows stored last-first) and
    top-down (negative height), with rows padded to 4-byte multiples.
    Raises ValueError on compressed payloads or other bit depths —
    those are Pillow's job."""
    if raw[:2] != b"BM":
        raise ValueError(f"not a BMP payload (magic {raw[:2]!r})")
    if len(raw) < 54:
        raise ValueError("truncated BMP header")

    def u32(off: int) -> int:
        return int.from_bytes(raw[off : off + 4], "little")

    def i32(off: int) -> int:
        return int.from_bytes(raw[off : off + 4], "little", signed=True)

    data_off = u32(10)
    w = i32(18)
    h_signed = i32(22)
    bpp = int.from_bytes(raw[28:30], "little")
    compression = u32(30)
    if compression != 0:
        raise ValueError(
            f"compressed BMP (method {compression}) unsupported by the "
            "numpy decoder — needs Pillow"
        )
    if bpp not in (24, 32):
        raise ValueError(f"BMP bit depth {bpp} unsupported (24/32 only)")
    if w <= 0 or h_signed == 0:
        raise ValueError(f"degenerate BMP dimensions {w}x{h_signed}")
    top_down = h_signed < 0
    h = abs(h_signed)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3  # rows padded to 4-byte multiples
    need = data_off + stride * h
    if len(raw) < need:
        raise ValueError(
            f"truncated BMP raster: need {need} bytes, have {len(raw)}"
        )
    rows = np.frombuffer(
        raw, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if not top_down:
        rows = rows[::-1]  # bottom-up storage: flip to top-down
    # BGR(A) -> RGB; alpha dropped
    return np.ascontiguousarray(rows[:, :, 2::-1])


class UnsupportedImageFormat(ValueError):
    """Raised by :func:`_decode_any` ONLY when the payload's magic is
    not one the numpy decoders recognize at all — the signal that a
    compressed-format fallback (Pillow / strict gate / deterministic
    fake) may take over. A recognized-but-corrupt payload raises plain
    ValueError instead, which callers must NOT swallow (r15 advice fix:
    previously this split was a substring match on the error message,
    one rewording away from re-routing corrupt payloads to the fake
    decoder — the exact poisoning bug commit c0194a9 fixed)."""


def _decode_any(raw: bytes) -> np.ndarray:
    """Dispatch on magic bytes to the numpy decoders; returns
    (h, w, channels) uint8. Formats without a pure-numpy parser raise
    UnsupportedImageFormat — the caller decides whether Pillow may
    take over. Recognized formats that fail to parse raise plain
    ValueError (must propagate)."""
    if raw[:2] in (b"P5", b"P6"):
        return _parse_pnm(raw)
    if raw[:2] == b"BM":
        return _parse_bmp(raw)
    raise UnsupportedImageFormat(
        f"no numpy decoder for magic {raw[:2]!r} (have: P5/P6 netpbm, "
        "uncompressed 24/32-bit BMP)"
    )


def decode_pixels(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL image decode with zero codec dependencies: parse each
    payload as binary netpbm (P5/P6) or uncompressed BMP via the pure
    numpy parsers above and emit the raster as data —
    ``(id, height, width, channels, pixels array<int>)`` with pixels
    flattened row-major, channel-interleaved, values 0..255. Top-down
    RGB regardless of on-disk layout (BMP's bottom-up BGR rows are
    normalized), so the SAME logical pixel comes back from either
    format — the catalog entry proves this against a closed-form
    oracle per format.

    Unknown magics raise inside the task (strict by design — this op
    IS the no-stub path; ``decode_image`` keeps the Pillow fallback
    and the clearly-marked fake for compressed formats). NULL payloads
    are excluded up front with a plan filter, the byte_histogram
    policy. Same execution contract as every stage in this module:
    mapInPandas, numpy over Arrow batches, per-row map, no shuffle —
    at 100 TB this scales with input partitions and nothing else.
    """
    src = df.filter(F.col(payload_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(payload_col).alias("_p")
    )

    def fn(batches):
        for pdf in batches:
            ids, hs, ws, chs, pxs = [], [], [], [], []
            for _id, payload in zip(pdf["_id"], pdf["_p"]):
                arr = _decode_any(bytes(payload))
                h, w, c = arr.shape
                ids.append(_id)
                hs.append(h)
                ws.append(w)
                chs.append(c)
                pxs.append(arr.reshape(-1).astype(np.int32))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "height": hs,
                    "width": ws,
                    "channels": chs,
                    "pixels": pxs,
                }
            )

    return src.mapInPandas(
        fn,
        f"{id_col} long, height int, width int, channels int, "
        "pixels array<int>",
    )


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
    payload, ``pixels`` in [0,1].

    Decode ladder (r14 — the stub shrank): payloads in an
    UNCOMPRESSED format (binary netpbm P5/P6, BI_RGB BMP) are decoded
    by the pure-numpy parsers — a REAL decode with no codec
    dependency, the ``audio_features`` raw-PCM precedent. Grayscale is
    Rec.601 luma (0.299 R + 0.587 G + 0.114 B); resize is
    deterministic nearest-neighbor index sampling. Compressed formats
    fall through to Pillow when importable; with neither,
    ``strict=True`` raises NotImplementedError and ``strict=False``
    produces the DETERMINISTIC FAKE (bytes tiled/truncated into the
    target shape, scaled to [0,1]) — clearly a stand-in, kept only
    for schema/batch-shape testing of codec-less compressed inputs.
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
        import io

        def gray_resize(arr: np.ndarray) -> np.ndarray:
            # (h, w, c) uint8 -> (size*size,) float64 in [0, 1]
            a = arr.astype(np.float64)
            if a.shape[2] == 1:
                g = a[:, :, 0]
            else:
                g = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
            h, w = g.shape
            ri = (np.arange(size) * h) // size
            ci = (np.arange(size) * w) // size
            return g[np.ix_(ri, ci)].reshape(-1) / 255.0

        for pdf in batches:
            ids, pixels = [], []
            for _id, payload in zip(pdf["_id"], pdf["_p"]):
                raw = bytes(payload)
                try:
                    arr = gray_resize(_decode_any(raw))
                except UnsupportedImageFormat:
                    # Only an UNRECOGNIZED magic falls through the
                    # ladder (typed exception, not a message match —
                    # r15 advice fix). A recognized-but-corrupt
                    # uncompressed payload (truncated raster, bad
                    # maxval, compressed BMP) raises plain ValueError
                    # and must PROPAGATE: silently fake-decoding
                    # garbage that claimed to be a real image would
                    # poison every vector downstream.
                    # not an uncompressed format — Pillow's job
                    if have_pil:
                        from PIL import Image

                        img = (
                            Image.open(io.BytesIO(raw))
                            .convert("L")
                            .resize((size, size))
                        )
                        arr = (
                            np.asarray(img, dtype=np.float64).reshape(-1)
                            / 255.0
                        )
                    elif strict:
                        raise NotImplementedError(
                            "decode_image: payload is not an uncompressed "
                            "format (netpbm/BMP decode natively) and no "
                            "codec (Pillow) is available — use "
                            "strict=False for the deterministic fake"
                        )
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

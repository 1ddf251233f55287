"""Distributed .fvecs / .ivecs readers (the SIFT benchmark formats).

The reference parses fvecs with a single-threaded struct-unpack loop in
its notebook (py/hnsw.ipynb cell-1: 4-byte little-endian dim header per
row, then dim float32s). Here the same format is read distributed:
``binaryFile`` source → one Arrow batch per file → numpy frombuffer
reshape, emitted as (vec_id, embedding) rows. Row ids are assigned
densely per file from the byte layout (record i at offset i·(4+4d)),
so ids are deterministic regardless of task scheduling.

For multi-file datasets each file parses independently in its own task
(scale = #files); a single giant file is still one task — at 100 TB you
would pre-split or convert to parquet once (the recommended landing
format; see TESTDATA.md — our fixtures are already parquet).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "read_fvecs",
    "read_ivecs",
    "read_bvecs",
    "write_fvecs_local",
    "write_bvecs_local",
]


def _parse(content: bytes, dtype) -> np.ndarray:
    """fvecs/ivecs: 4-byte LE dim header + dim 4-byte payloads per row;
    bvecs (dtype uint8): 4-byte header + dim 1-byte payloads."""
    if len(content) < 4:
        return np.empty((0, 0), dtype=dtype)
    dim = struct.unpack("<i", content[:4])[0]
    if dim <= 0:
        raise ValueError(f"bad fvecs dim header: {dim}")
    width = np.dtype(dtype).itemsize
    rec = 4 + width * dim
    if len(content) % rec:
        raise ValueError(
            f"fvecs payload {len(content)}B not a multiple of record {rec}B"
        )
    n = len(content) // rec
    raw = np.frombuffer(content, dtype=np.uint8).reshape(n, rec)
    body = np.ascontiguousarray(raw[:, 4:]).view(dtype).reshape(n, dim)
    dims = np.ascontiguousarray(raw[:, :4]).view(np.int32).reshape(n)
    if not (dims == dim).all():
        raise ValueError("ragged fvecs file: varying dim headers")
    return body


def _reader(dtype, out_type: str):
    def fn(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                body = _parse(bytes(row["content"]), dtype)
                n = len(body)
                yield pd.DataFrame(
                    {
                        "path": [row["path"]] * n,
                        "row_in_file": np.arange(n, dtype=np.int64),
                        "embedding": list(body),
                    }
                )

    return fn, f"path string, row_in_file long, embedding array<{out_type}>"


def read_fvecs(spark: SparkSession, path: str) -> DataFrame:
    """(path, row_in_file, embedding float[]) for every vector in every
    .fvecs file under ``path``."""
    src = spark.read.format("binaryFile").load(path).select("path", "content")
    fn, schema = _reader(np.float32, "float")
    return src.mapInPandas(fn, schema)


def read_ivecs(spark: SparkSession, path: str) -> DataFrame:
    """Same layout with int32 payloads (ground-truth files)."""
    src = spark.read.format("binaryFile").load(path).select("path", "content")
    fn, schema = _reader(np.int32, "int")
    return src.mapInPandas(fn, schema)


def read_bvecs(spark: SparkSession, path: str) -> DataFrame:
    """bvecs: uint8 payloads — the SIFT1B billion-scale distribution
    format (4-byte dim header + dim bytes per row). Emitted as
    array<smallint> (0..255 doesn't fit a signed byte)."""
    src = spark.read.format("binaryFile").load(path).select("path", "content")
    fn, schema = _reader(np.uint8, "smallint")
    return src.mapInPandas(fn, schema)


def write_fvecs_local(vectors: np.ndarray, path: str) -> None:
    """Driver-side fvecs writer (tests / interop export)."""
    v = np.asarray(vectors, dtype=np.float32)
    n, d = v.shape
    with open(path, "wb") as f:
        for i in range(n):
            f.write(struct.pack("<i", d))
            f.write(v[i].tobytes())


def write_bvecs_local(vectors: np.ndarray, path: str) -> None:
    """Driver-side bvecs writer (tests / interop export)."""
    v = np.asarray(vectors, dtype=np.uint8)
    n, d = v.shape
    with open(path, "wb") as f:
        for i in range(n):
            f.write(struct.pack("<i", d))
            f.write(v[i].tobytes())

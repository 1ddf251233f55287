"""`spark.read.format("fvecs")` — the fvecs reader as a registered
Spark 4 Python Data Source (pyspark.sql.datasource).

Two upgrades over the binaryFile + mapInPandas path in
:mod:`vector_search_spark.sources.fvecs`:

- **Record-aligned byte-range splitting.** fvecs records are fixed
  width (4-byte dim header + dim float32s), so a single giant file
  splits cleanly into many input partitions at record boundaries — the
  binaryFile source can only hand a whole file to one task. Planning
  reads exactly 4 bytes per file (the dim header) on the driver.
- **First-class source semantics.** The reader integrates with Spark's
  scan planning (it IS the scan, not a transformation over a blob
  scan), so `spark.read.format("fvecs").load(path)` composes like any
  other source and the row-id contract (dense per file, derived from
  byte offsets — deterministic regardless of scheduling) is part of
  the emitted schema.

File listing is local-FS glob (this container's storage); on a real
cluster the same planner logic runs over the Hadoop FileSystem listing,
as with ivf.compact_index. Registration:

    from vector_search_spark.sources.fvecs_datasource import FvecsDataSource
    spark.dataSource.register(FvecsDataSource)
    df = spark.read.format("fvecs").load("/data/sift/*.fvecs")

Options: ``target_bytes`` (split granularity, default 32 MiB).
Reference parity: the reference parses fvecs single-threaded in its
notebook (py/hnsw.ipynb cell-1); this is the distributed on-ramp.
"""

from __future__ import annotations

import glob
import os
import struct
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

__all__ = ["FvecsDataSource"]

_HEADER = 4
_F32 = 4


@dataclass
class _Split(InputPartition):
    path: str
    dim: int
    start_record: int
    n_records: int


class FvecsDataSource(DataSource):
    """fvecs as a native Spark source with splittable files."""

    @classmethod
    def name(cls) -> str:
        return "fvecs"

    def schema(self) -> str:
        return "path string, row_in_file long, embedding array<float>"

    def reader(self, schema) -> "FvecsReader":
        return FvecsReader(self.options)


class FvecsReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fvecs source requires a path")
        self.target_bytes = int(options.get("target_bytes", 32 * 1024 * 1024))

    def partitions(self):
        # Directory FIRST (advice r6: glob.glob on an existing directory
        # returns [the directory], so an `or`-chained fallback never ran
        # and .load('/some/dir') died later with IsADirectoryError):
        # a directory path reads its *.fvecs members; anything else is
        # a glob pattern (or literal file), with matched directories
        # expanded to their members and non-files dropped.
        def members(d: str) -> list[str]:
            return [
                os.path.join(d, f)
                for f in os.listdir(d)
                if f.endswith(".fvecs")
            ]

        if os.path.isdir(self.path):
            paths = sorted(members(self.path))
        else:
            paths = sorted(
                p
                for m in glob.glob(self.path)
                for p in (members(m) if os.path.isdir(m) else [m])
                if os.path.isfile(p)
            )
        if not paths:
            raise FileNotFoundError(f"no fvecs files at {self.path}")
        splits: list[_Split] = []
        for p in paths:
            size = os.path.getsize(p)
            if size < _HEADER:
                continue
            with open(p, "rb") as f:
                dim = struct.unpack("<i", f.read(_HEADER))[0]
            if dim <= 0:
                raise ValueError(f"{p}: bad fvecs dim header {dim}")
            rec = _HEADER + _F32 * dim
            if size % rec:
                raise ValueError(
                    f"{p}: {size}B is not a multiple of the {rec}B record"
                )
            n = size // rec
            per_split = max(1, self.target_bytes // rec)
            start = 0
            while start < n:
                take = min(per_split, n - start)
                splits.append(_Split(p, dim, start, take))
                start += take
        return splits

    def read(self, split: _Split):
        import numpy as np
        import pyarrow as pa

        rec = _HEADER + _F32 * split.dim
        with open(split.path, "rb") as f:
            f.seek(split.start_record * rec)
            buf = f.read(split.n_records * rec)
        raw = np.frombuffer(buf, dtype=np.uint8).reshape(split.n_records, rec)
        dims = np.ascontiguousarray(raw[:, :_HEADER]).view(np.int32).reshape(-1)
        if not (dims == split.dim).all():
            raise ValueError(f"{split.path}: ragged dim headers in split")
        body = (
            np.ascontiguousarray(raw[:, _HEADER:])
            .view(np.float32)
            .reshape(split.n_records, split.dim)
        )
        ids = np.arange(
            split.start_record,
            split.start_record + split.n_records,
            dtype=np.int64,
        )
        # one Arrow batch per split: columnar hand-off, no per-row python
        yield pa.record_batch(
            {
                "path": pa.array([split.path] * split.n_records),
                "row_in_file": pa.array(ids, type=pa.int64()),
                "embedding": pa.array(
                    list(body), type=pa.list_(pa.float32())
                ),
            }
        )

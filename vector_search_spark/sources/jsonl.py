"""JSONL document-corpus reader: the de-facto LLM training-data
interchange format (one JSON object per line; The Pile / RedPajama /
Dolma all ship this way).

Spark's native json source does the heavy lifting (splittable,
predicate/column pruned, schema-enforced); this wrapper adds the
corpus contract on top:

- explicit schema (never inferSchema — a schema-inference pass over
  100 TB is a full extra scan, and drifting inferred types break
  downstream oracles);
- corrupt lines quarantined, not dropped: PERMISSIVE mode routes
  unparseable lines to a `_corrupt` column and :func:`read_jsonl_corpus`
  splits them into a separate DataFrame for audit (silently losing
  input rows is how corpora rot);
- required-field validation (a row with null doc_id/text is corrupt in
  spirit even when it parses);
- one-call conversion to the parquet landing format
  (:func:`jsonl_to_parquet`) — JSONL is the interchange format, parquet
  is the processing format (columnar pruning, stats, partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["CORPUS_SCHEMA", "read_jsonl_corpus", "jsonl_to_parquet"]

# Mirrors the documents testdata table (TESTDATA.md) + a free-form map
# for source-specific metadata.
CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

_CORRUPT = "_corrupt"


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType = CORPUS_SCHEMA,
    required: tuple[str, ...] = ("doc_id", "text"),
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus; returns ``(good, quarantine)``.

    ``good`` has exactly ``schema``'s columns, every ``required`` field
    non-null. ``quarantine`` is ``(raw_line string)`` — unparseable
    lines plus parseable rows missing a required field (their original
    text is reconstructed via to_json for audit).
    """
    full = T.StructType(
        [*schema.fields, T.StructField(_CORRUPT, T.StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
        # Spark disallows querying ONLY the corrupt-record column off a
        # raw file source (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
        # RECORD_COLUMN) — the quarantine projection below is exactly
        # that, so materialize the parse once. localCheckpoint, NOT
        # cache(): cache is keyed on the logical plan, so a rerun over
        # the same path after the file changed would silently serve the
        # STALE first read. For corpora beyond memory, land to parquet
        # first (jsonl_to_parquet) — one pass, same effect, durable.
        .localCheckpoint()
    )
    fields_ok = F.lit(True)
    for r in required:
        fields_ok = fields_ok & F.col(r).isNotNull()
    parsed = F.col(_CORRUPT).isNull()
    good = df.filter(parsed & fields_ok).select(
        *[f.name for f in schema.fields]
    )
    bad_parse = df.filter(~parsed).select(F.col(_CORRUPT).alias("raw_line"))
    bad_fields = df.filter(parsed & ~fields_ok).select(
        F.to_json(F.struct(*[f.name for f in schema.fields])).alias(
            "raw_line"
        )
    )
    return good, bad_parse.unionAll(bad_fields)


def jsonl_to_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    schema: T.StructType = CORPUS_SCHEMA,
) -> int:
    """Convert a JSONL corpus to the parquet landing format; returns the
    number of good rows written. Quarantined lines are written beside
    the output as ``<dst>_quarantine`` (never silently dropped)."""
    good, bad = read_jsonl_corpus(spark, src, schema)
    # Written UNCONDITIONALLY (an empty overwrite when the input is
    # clean): a rerun over corrected input must not leave a stale
    # quarantine from a previous run misleading the audit trail.
    bad.write.mode("overwrite").parquet(dst + "_quarantine")
    good.write.mode("overwrite").parquet(dst)
    return spark.read.parquet(dst).count()

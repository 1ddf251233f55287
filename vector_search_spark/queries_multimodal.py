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

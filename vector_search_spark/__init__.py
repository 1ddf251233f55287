"""vector_search_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of renanGit/Vector-Search, re-expressed
Spark-first for 100 TB scale.

The reference (/root/reference, read-only) is a small pure-Python vector
search library: exact brute-force kNN (py/bruteforce.py), HNSW
(py/hnsw.py), and Product Quantization (py/pq.py).  This engine maps every
one of its operators onto Spark DataFrame primitives (SURVEY.md §2) and
adds the LLM-data-pipeline surface (dedup, similarity search, text
analysis, streaming ingest) a large training-data pipeline needs.

Layout
------
- ``session``    SparkSession builder tuned for the workload (AQE, Arrow).
- ``tables``     loaders for the driver-generated parquet test tables.
- ``functions``  pure-Catalyst column expression builders (distances,
                 portable hashing, text metrics) — no Python UDFs.
- ``operators``  relational/vector operators: brute-force kNN, k-means,
                 PQ train/encode/ADC/SDC, IVF search, kNN-graph + HNSW,
                 dedup family, text analysis, sessionization.
- ``sources``    extra sources/sinks (fvecs binary reader, JSONL corpus
                 reader with quarantine, multimodal binary assets,
                 bucketed tables).
- ``streaming``  Structured Streaming ingest (watermarks, tumbling /
                 sliding / session windows, stateful dedup, stream-stream
                 interval join, live index refresh/upsert).
- ``compat``     drop-in reference API (BruteForce / ProductQuantizer /
                 HNSWIndex / Graph / Item) backed by the operators.
- ``plans``      plan-inspection helpers used by tests to assert
                 pushdown / broadcast / codegen properties.
- ``queries``    the query catalog consumed by ``__spark_entry__.py``
                 (each entry paired with a DuckDB oracle SQL string).
"""

__version__ = "0.6.0"

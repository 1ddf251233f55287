"""Loaders for the driver-generated parquet test tables (TESTDATA.md).

All engine operators take DataFrames; these helpers only centralize paths
and names. At 100 TB the same call shape holds — ``spark.read.parquet``
over a partitioned directory — with Catalyst handling partition pruning
and column projection from whatever the operator selects.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet has shipped with two physical layouts for ``ts``;
        # both are normalized here to session-tz TimestampType so every
        # consumer (windows, unix_micros, watermarks, the DuckDB oracle —
        # session tz is UTC) sees exactly one type:
        #  - TIMESTAMP(NANOS): the vectorized reader rejects it outright.
        #    Read the raw int64 nanos via the legacy flag and truncate to
        #    micros exactly as DuckDB does (integer div — float division
        #    would lose precision at 1.7e18). The flag is scoped to this
        #    read (schema resolves eagerly at spark.read time) and
        #    restored afterwards.
        #  - timestamp[us] with no timezone: Spark reads TIMESTAMP_NTZ;
        #    cast to TimestampType (under the UTC session tz the micros
        #    are bit-identical to DuckDB's naive read).
        key = "spark.sql.legacy.parquet.nanosAsLong"
        try:
            prev = spark.conf.get(key)
        except Exception:
            prev = None
        spark.conf.set(key, "true")
        try:
            df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql usage)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)

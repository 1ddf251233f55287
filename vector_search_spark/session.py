"""SparkSession construction tuned for this engine.

Defaults target the test harness (``local[32]``, 128 GiB single JVM) but
every knob is the one you would set on a real 1000-executor cluster:

- AQE on (runtime re-plan: skew-join splitting, partition coalescing,
  join-strategy demotion to broadcast when a side turns out small).
- ``spark.sql.shuffle.partitions`` sized to the parallelism at hand; on a
  real cluster this should be ~2-3x total cores (AQE coalesces down).
- Arrow enabled so the few Pandas-UDF operators (HNSW neighbor selection,
  multimodal decode) exchange columnar batches, never per-row pickles.
- Session timezone pinned to UTC so epoch arithmetic is portable across
  engines (the DuckDB correctness oracle treats timestamps as UTC).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 64m: codebooks / centroid / LUT dimension tables are always far below
    # this, so Catalyst picks broadcast joins for them without hints.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # Local-mode niceties; harmless on a cluster.
    "spark.ui.enabled": "false",
    "spark.sql.parquet.compression.codec": "zstd",
}


def default_master() -> str:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return os.environ.get("SPARK_MASTER", f"local[{cpus}]")


def get_spark(
    app_name: str = "vector-search-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``shuffle_partitions`` defaults to the local core count — at our test
    scale one shuffle partition per core; a cluster deployment passes its
    own value (or relies on AQE coalescing from a high initial count).
    """
    builder = SparkSession.builder.appName(app_name).master(master or default_master())
    conf = dict(DEFAULT_CONF)
    shuffle_defaulted = shuffle_partitions is None
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    # DEFAULTS must not stomp a session someone else sized: when a live
    # session exists, getOrCreate() APPLIES the builder's runtime SQL
    # configs to it (Spark 4 "only runtime SQL configurations will take
    # effect"), so the environment-derived shuffle default has to leave
    # the conf dict entirely — the compat shim's lazy get_spark() used
    # to reset the shared 8-partition test session to 32 mid-suite,
    # silently changing the conf every later test ran under (r16:
    # surfaced by the plan-digest gate's conf check). A caller-EXPLICIT
    # shuffle_partitions still wins; engine invariants (timezone, AQE,
    # Arrow) still apply — those are not sized to an environment.
    # getActiveSession() is THREAD-LOCAL while getOrCreate() attaches to
    # the process-global session, so a call from a thread that never
    # touched Spark (listener threads, threaded test runners) would miss
    # a live session and resize it anyway — also check the process-wide
    # handle (r16 advisor). The handle must be checked for LIVENESS the
    # way getOrCreate itself does (_jsc is None after a stop): a
    # sparkContext.stop() leaves _instantiatedSession pointing at a
    # dead session, and treating that as live would silently drop the
    # sized shuffle default from the genuinely fresh session
    # getOrCreate is about to build.
    _inst = getattr(SparkSession, "_instantiatedSession", None)
    _live = SparkSession.getActiveSession() is not None or (
        _inst is not None
        and getattr(_inst, "_sc", None) is not None
        and _inst._sc._jsc is not None
    )
    if shuffle_defaulted and _live:
        del conf["spark.sql.shuffle.partitions"]
    conf.setdefault("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # If we attached to a pre-existing session, builder configs were
    # ignored — re-apply every RUNTIME-SETTABLE knob from the resolved
    # conf (not just the timezone: shuffle partitions, AQE, Arrow, and
    # the broadcast threshold are all session-settable, and an explicit
    # extra_conf value must win over the engine default — the old
    # unconditional UTC reset clobbered a caller's timeZone).
    _RUNTIME_SETTABLE = (
        "spark.sql.session.timeZone",
        "spark.sql.shuffle.partitions",
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.execution.arrow.pyspark.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
    )
    for k in _RUNTIME_SETTABLE:
        if k in conf:
            spark.conf.set(k, conf[k])
    return spark

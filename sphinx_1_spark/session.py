"""SparkSession factory tuned for the inverted-index workload.

Local testing runs on local[N]; the same config block is what we'd
ship to a real cluster via spark-submit --py-files (AQE on, Arrow on,
shuffle partitions sized for the data volume).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sphinx_1_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores: parallelism for local mode (None -> $SPARK_GRAFT_CPUS or *).
    shuffle_partitions: defaults to max(32, 2*cores) — at cluster scale
    this would be set from input size (bytes / 128MB target partitions).
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        ncores = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        ncores = cores
    if shuffle_partitions is None:
        shuffle_partitions = max(32, 2 * ncores)

    builder = SparkSession.builder.appName(app_name).master(master)
    builder = apply_engine_conf(builder, shuffle_partitions)
    # Shuffle scratch on tmpfs when available: the sandbox's virtual
    # disk serializes shuffle IO and caps multi-core scaling; real
    # clusters put spark.local.dir on local NVMe, which tmpfs stands
    # in for here.
    if os.path.isdir("/dev/shm") and "SPARK_LOCAL_DIRS" not in os.environ:
        builder = builder.config("spark.local.dir", "/dev/shm/spark-local")
    spark = builder.getOrCreate()
    # runtime-settable confs, applied even when an earlier caller
    # already created the session
    spark.conf.set("spark.sql.ansi.enabled", "false")
    return spark


def apply_engine_conf(builder, shuffle_partitions: int | None = None):
    """The engine's session config, master-agnostic — the same block
    the spark-submit job applies (the cluster manager then sets
    master/executors/local dirs via spark-submit --conf)."""
    if shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )
    return (
        builder.config("spark.sql.adaptive.enabled", "true")
        # C-engine arithmetic semantics: int32/int64 overflow wraps
        # silently (the reference's expression engine is plain C
        # arithmetic, sphinxexpr.cpp Expr_Add_c etc.), instead of
        # Spark 4's ANSI exception
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )

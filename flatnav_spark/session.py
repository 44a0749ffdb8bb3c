"""SparkSession factory with the engine's required configuration.

Local mode is the sandbox stand-in for a multi-executor cluster; the
configuration below is what we'd ship in spark-defaults on a real
cluster (AQE on, Arrow on, sane shuffle partitioning)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "flatnav_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 8
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cores), 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "32768")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("FLATNAV_SPARK_DRIVER_MEM", "48g"))
        # pre-size the heap: the first heavy stage otherwise pays dozens of
        # young GCs while G1 grows the heap from its small initial size
        # (observed via -Xlog:gc during the zipf:200k merge); the cost
        # lands inside the first timed build. 16g covers the measured
        # ~13g peak at bench scale and is committed at session start,
        # outside any timed region.
        .config("spark.driver.extraJavaOptions",
                os.environ.get("FLATNAV_SPARK_DRIVER_JAVA_OPTS", "-Xms16g"))
        .config("spark.ui.enabled", "false")
    )
    # shuffle/spill scratch on tmpfs when available: the sandbox's virtual
    # disk shows multi-second stalls and writer contention; on a real
    # cluster this is the usual fast local SSD setting
    local_dir = os.environ.get("FLATNAV_SPARK_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/flatnav_spark_local"
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

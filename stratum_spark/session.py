"""SparkSession factory tuned for the sandbox (local[N]) and for scale.

On a real cluster the same builder config applies minus the local master:
AQE on (runtime re-plan, skew-join splitting, partition coalescing),
Arrow on (vectorized pandas-UDF transfer), shuffle partitions sized to
cores at sandbox scale (a cluster deployment would size to 2-3x total
cores / target ~128MB shuffle blocks).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "stratum_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores: local parallelism (defaults to $SPARK_GRAFT_CPUS or '*').
    Scaling-efficiency benchmarks pass explicit cores (8 vs 32) to
    evidence the N -> 4N criterion at two parallelism levels.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        ncores = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        ncores = cores
    if shuffle_partitions is None:
        env_sp = os.environ.get("STRATUM_SHUFFLE_PARTITIONS")
        shuffle_partitions = int(env_sp) if env_sp else max(8, ncores)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("STRATUM_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    local_dir = os.environ.get("STRATUM_SPARK_LOCAL_DIR")
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    if os.environ.get("STRATUM_GC_LOG"):
        b = b.config("spark.driver.extraJavaOptions", "-Xlog:gc")
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()

"""SparkSession factory with engine defaults (local-mode testing; the same
settings ship unchanged to a real cluster via spark-submit --py-files)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "copybook_rs_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or max(cores, 8)
    # single-box stand-in for per-node shuffle disks: tmpfs keeps the
    # exchange memory-bound like a real cluster's node-local NVMe
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/cbsp-spark")
    os.makedirs(local_dir, exist_ok=True)
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.local.dir", local_dir)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Arrow batching is the engine's unit of kernel work
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

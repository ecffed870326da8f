"""SparkSession builder with scale-appropriate defaults.

Defaults chosen for the 100 TB design point (AQE on, skew-join handling,
arrow batches sized to the block size) but runnable on local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_ROWS_PER_BATCH = 1 << 16  # arrow batch == encode block candidate size


def get_spark(
    master: str | None = None,
    app_name: str = "zebra-spark",
    shuffle_partitions: int | None = None,
    rows_per_batch: int = DEFAULT_ROWS_PER_BATCH,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(rows_per_batch))
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.driver.memory", os.environ.get("ZS_DRIVER_MEM", "8g"))
        .config("spark.sql.files.maxPartitionBytes", "256m")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()

"""SparkSession factory tuned for the extraction workload.

Arrow batch size is tuned DOWN (HTML rows average ~316 KB in the reference
benchmark corpus, README.md:258) to bound Python-worker memory
(SURVEY.md §4.2); shuffle partitions match cores, AQE on, UTC session TZ
so timestamps compare cleanly against the DuckDB oracle.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import SparkSession

ARROW_MAX_RECORDS = 2048  # per-batch row cap; pair with maxPartitionBytes
MAX_PARTITION_BYTES = str(32 * 1024 * 1024)  # byte-bounded scan tasks


def get_spark(
    app: str = "rs_trafilatura_spark",
    parallelism: Optional[int] = None,
    shuffle_partitions: Optional[int] = None,
    driver_memory: str = "48g",
    ui: bool = False,
) -> SparkSession:
    if parallelism is None:
        parallelism = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(parallelism, 8)
    builder = (
        SparkSession.builder.master(f"local[{parallelism}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(parallelism))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_MAX_RECORDS))
        .config("spark.sql.files.maxPartitionBytes", MAX_PARTITION_BYTES)
        .config("spark.ui.enabled", str(ui).lower())
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

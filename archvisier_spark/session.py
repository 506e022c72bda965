"""SparkSession builder tuned for the extraction workload.

Local-mode settings mirror what a 1000-executor cluster job would set via
``spark-submit --conf`` (SURVEY.md §4): AQE on (runtime coalesce + skew-join
split), Arrow transfer on with bounded batch size (MB-scale binary payloads
→ keep batches small, SURVEY.md §7 "MB-scale binary rows").
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Documents can be megabytes; 64 rows/batch keeps Arrow buffers ~100 MB max
# even on skewed partitions (SURVEY.md §4 "maxRecordsPerBatch tuned 64-256").
ARROW_BATCH_ROWS = 128


def get_spark(
    master: str | None = None,
    app_name: str = "archvisier_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

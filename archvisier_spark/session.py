"""SparkSession builder tuned for the extraction workload.

Local-mode settings mirror what a 1000-executor cluster job would set via
``spark-submit --conf`` (SURVEY.md §4): AQE on (runtime coalesce + skew-join
split), Arrow transfer on with bounded batch size (MB-scale binary payloads
→ keep batches small, SURVEY.md §7 "MB-scale binary rows").
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow transfer batch: 512 rows ≈ 1-4 MB for median web docs; a batch
# containing one megabyte-scale PDF stays bounded because such rows are
# ~1-per-hundred (SURVEY.md §4 "maxRecordsPerBatch tuned").  Overridable
# for scaling experiments (larger batches amortise per-batch pipe+GIL
# overhead at high worker counts; round-3 verdict #2).
ARROW_BATCH_ROWS = int(os.environ.get("SPARK_GRAFT_ARROW_BATCH_ROWS", "512"))

# Input split size: the map-only extraction stage inherits its task
# granularity from scan splits, so splits must be small enough that every
# core gets MULTIPLE WAVES of tasks (finish-time balancing against
# per-document cost variance).  1 MB → 128 tasks ≈ 4 waves on 32 cores for
# the bench corpus; measured +9% at local[32] AND +8% at local[8] over 2 MB
# (the 2 MB setting left only ~2.6 waves at 32 cores, so the last wave's
# stragglers idled the stage).  The default 128 MB would give local[32]
# ONE wave and let the slowest clump of heavy PDFs set the makespan.  (On
# a 1000-executor cluster the same rule holds relative to table size —
# pick splits ≈ table_bytes / (cores × 4).)
MAX_PARTITION_BYTES = "1m"
FILES_OPEN_COST = "512k"


def get_spark(
    master: str | None = None,
    app_name: str = "archvisier_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r07 (optimization guide §3.1/§9): allow shuffled-hash joins when
        # their size conditions hold instead of always preferring
        # sort-merge, and let AQE rewrite SMJ -> SHJ at runtime when every
        # post-shuffle partition's build side is small.  The AQE threshold
        # gates on MEASURED partition sizes, so the rewrite self-disables
        # at scales where a per-partition hash build would not fit.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        # 64-bit Arrow offsets: one contiguous buffer for megabyte binary
        # payloads instead of 2 GiB-bounded chunked arrays
        .config("spark.sql.execution.arrow.useLargeVarTypes", "true")
        .config("spark.sql.files.maxPartitionBytes", MAX_PARTITION_BYTES)
        .config("spark.sql.files.openCostInBytes", FILES_OPEN_COST)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    # GC / JVM experiments (scaling A/Bs): local mode puts scan + Arrow
    # serialisation for all N workers in ONE JVM, so collector choice can
    # gate N-thread scaling in a way a per-executor JVM never sees
    java_opts = os.environ.get("SPARK_GRAFT_JAVA_OPTS")
    if java_opts:
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    # Executor-JVM options (local-cluster scaling experiments): an
    # UNcontainerized local-cluster executor sees all of the box's cores,
    # so each of N executor JVMs sizes its GC/JIT thread pools for the
    # whole machine — N × oversized service pools contending on one
    # cpuset, an artifact a real cluster never has (cgroup limits make
    # JVM ergonomics see the container's cores).  Passing
    # -XX:ActiveProcessorCount=<executor cores> here renders the
    # per-executor resource envelope a Kubernetes/YARN container would
    # impose.  Experiments MUST use a distinct SPARK_GRAFT_SCALING_LABEL.
    exec_java_opts = os.environ.get("SPARK_GRAFT_EXEC_JAVA_OPTS")
    if exec_java_opts:
        builder = builder.config("spark.executor.extraJavaOptions", exec_java_opts)
    # Master resolution: an explicit argument wins; otherwise inherit
    # spark.master from spark-submit / existing conf (cluster usage per
    # job.py --master help text); local[N] is only the last-resort default
    # when nothing has configured a master at all.
    if master:
        builder = builder.master(master)
    else:
        try:
            from pyspark import SparkConf

            has_master = SparkConf().contains("spark.master")
        except Exception:
            has_master = False
        if not has_master:
            builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

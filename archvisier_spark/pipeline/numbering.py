"""Scalable dense sequence numbering — the counter semantics (A2).

The reference bumps an in-memory counter per work-mode over a sorted file
list (gui/processing_worker.py:320-322); with sorted input that is exactly
``row_number() OVER (PARTITION BY mode ORDER BY url)``.  A naive global
window collapses everything onto one task, which dies at 100 TB, so this
module implements the classic two-phase dense-rank:

  1. range-repartition a NARROW slice (keys only) by the order column —
     partition *i* holds a contiguous key range below partition *i+1*;
  2. ``row_number`` within each partition (parallel, no global shuffle);
  3. collect per-partition counts (one tiny row per partition), prefix-sum
     them on the driver, broadcast the offsets back, add.

The full-width payload never moves through the numbering shuffle; numbers
re-attach with an equi-join on the unique key.  That re-attach join is
the one place the payload crosses a shuffle (hash by key on both sides) —
at 10^12 rows it is a single well-partitioned co-shuffle, the standard
price of attaching a global rank; an Iceberg table with a url sort order
would eliminate it (ranks become a metadata-only merge on sorted scans).
AQE partition coalescing is safe here: merged range partitions stay
contiguous, so offsets remain correct.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def with_sequence(
    df: DataFrame,
    order_col: str = "url",
    partition_cols: Sequence[str] = (),
    out_col: str = "lp",
    num_range_partitions: int | None = None,
    keys_df: DataFrame | None = None,
) -> DataFrame:
    """Append a dense 1-based sequence in ``order_col`` order, restarting
    per ``partition_cols`` group, without a single-task global sort.

    ``keys_df``: optional cheap source of the SAME key set (must be 1:1
    with ``df`` on ``key_cols``).  When ``df`` is the output of an
    expensive transform (e.g. the extraction mapInPandas), deriving the
    counting slice from ``df`` would recompute that transform twice — pass
    the raw input keys instead (a column-pruned parquet scan of ``url``
    costs almost nothing)."""
    spark = df.sparkSession
    n = num_range_partitions or spark.sparkContext.defaultParallelism
    key_cols = [order_col, *partition_cols]

    source = keys_df if keys_df is not None else df
    slim = source.select(*key_cols).repartitionByRange(n, F.col(order_col))
    # CRITICAL: RangePartitioning samples split points PER EXECUTION — two
    # jobs over the same lazy plan can land rows in different partitions.
    # The offsets (collected below) and the __pid/__rn the join reads must
    # come from ONE materialisation, so pin the slim slice here.  Cost is
    # bounded: this is the pruned key slice, never the payload.
    # Cluster note: localCheckpoint stores blocks on executors — an
    # executor loss makes them unrecoverable (lineage is truncated).  On a
    # real cluster the same pin is a written table (the Iceberg index-
    # table analog, exactly like q_minhash_lsh_dedup's shingle table);
    # local mode has no executor loss, so the in-memory form is safe here.
    slim = slim.localCheckpoint(eager=True)
    slim = slim.withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid", *partition_cols).orderBy(order_col)
    slim = slim.withColumn("__rn", F.row_number().over(w))

    # one row per (physical partition, group): tiny — collect + prefix-sum
    counts = (
        slim.groupBy("__pid", *partition_cols)
        .agg(F.count("*").alias("__cnt"))
        .collect()
    )
    if not counts:
        # empty input: createDataFrame([]) can't infer a schema — return the
        # (empty) frame with a typed null sequence column instead of crashing
        return df.withColumn(out_col, F.lit(None).cast("long"))
    by_group: dict[tuple, list[tuple[int, int]]] = {}
    for row in counts:
        group = tuple(row[c] for c in partition_cols)
        by_group.setdefault(group, []).append((row["__pid"], row["__cnt"]))
    offset_rows = []
    for group, pid_counts in by_group.items():
        running = 0
        for pid, cnt in sorted(pid_counts):
            offset_rows.append((*group, pid, running))
            running += cnt
    offsets = spark.createDataFrame(
        offset_rows, [*partition_cols, "__pid", "__offset"]
    )

    numbered = (
        slim.join(F.broadcast(offsets), [*partition_cols, "__pid"])
        .withColumn(out_col, (F.col("__offset") + F.col("__rn")).cast("long"))
        .select(*key_cols, out_col)
    )
    return df.join(numbered, key_cols)

"""Per-partition lineage + idempotent checkpoint/resume (north rule).

The reference resumes work by cancelling between documents and restoring
encrypted session state (app_session_manager.py:84-158, SURVEY.md §2.1
S10); at 10^12 documents the equivalent is range-level bookkeeping:

* the url space is split into ``n_chunks`` deterministic hash ranges
  (``chunk_id = pmod(xxhash64(url), n_chunks)``);
* each run extracts only chunks without an ``ok`` lineage row, writing
  output partitioned by ``chunk_id`` with dynamic partition overwrite —
  re-running a failed/duplicate chunk REPLACES its partition, so retries
  are exactly-once at chunk granularity.  On an Iceberg deployment this
  maps 1:1 to ``MERGE INTO``/``REPLACE WHERE`` on the checkpoint and
  output tables; the parquet implementation here has the same idempotence
  contract and is what the sandbox can execute;
* every completed chunk appends one lineage row
  ``(chunk_id, n_docs, n_bytes, n_errors, checksum, status)`` where
  ``checksum`` is an order-independent content digest
  (bit_xor of xxhash64(url, extracted_text)) — enough to audit that a resumed
  run reproduced exactly the bytes a single-shot run would have.

Numbering (``lp``/``new_name``) is global across chunks, so it is applied
by :func:`finalize_names` once all chunks are complete — it is a pure
function of the completed output (url order), so it never blocks resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from archvisier_spark.pipeline.extract import (
    extract_documents,
    with_display_numbers,
    with_new_names,
)

DEFAULT_CHUNKS = 64
STATUS_OK = "ok"


def chunk_id_col(url_col, n_chunks: int):
    return F.pmod(F.xxhash64(url_col), F.lit(n_chunks)).cast("int")


def _read_checkpoint(spark: SparkSession, checkpoint_path: str) -> DataFrame:
    """Checkpoint reader tolerant of pre-``run_id`` history: mergeSchema
    unions old and new parquet footers (a plain read may sample only an
    old footer and drop the column), and rows appended before the
    ``run_id`` column existed surface as ``run_id = -1`` — older than any
    real run, so recency ordering stays correct."""
    lin = spark.read.option("mergeSchema", "true").parquet(checkpoint_path)
    if "run_id" not in lin.columns:
        return lin.withColumn("run_id", F.lit(-1))
    return lin.withColumn("run_id", F.coalesce(F.col("run_id"), F.lit(-1)))


def _next_run_id(spark: SparkSession, checkpoint_path: str) -> int:
    """Monotonic run counter derived from the checkpoint itself — the
    lineage analog of an Iceberg snapshot id, so "latest row per chunk"
    means recency, not max-docs."""
    try:
        prev = _read_checkpoint(spark, checkpoint_path).agg(F.max("run_id")).collect()[0][0]
    except Exception:
        return 0
    return (prev if prev is not None else -1) + 1


def completed_chunks(spark: SparkSession, checkpoint_path: str) -> set[int]:
    """Chunk ids with an ``ok`` lineage row (empty checkpoint → none)."""
    try:
        rows = (
            _read_checkpoint(spark, checkpoint_path)
            .filter(F.col("status") == STATUS_OK)
            .select("chunk_id")
            .distinct()
            .collect()
        )
    except Exception:
        return set()
    return {r["chunk_id"] for r in rows}


def run_resumable(
    spark: SparkSession,
    docs: DataFrame,
    output_path: str,
    checkpoint_path: str,
    n_chunks: int = DEFAULT_CHUNKS,
    max_chunks_per_run: int | None = None,
    language: str = "auto",
    work_mode: str = "KP",
    ocr_mode: str = "text",
) -> list[int]:
    """Extract every not-yet-done chunk; returns the chunk ids processed.

    ``max_chunks_per_run`` bounds one invocation (used by tests to simulate
    a job dying partway; operationally it bounds blast radius per retry).
    Safe to re-run after any failure: finished chunks are skipped via the
    lineage table, half-written chunks are overwritten whole.
    """
    done = completed_chunks(spark, checkpoint_path)
    run_id = _next_run_id(spark, checkpoint_path)
    todo = sorted(set(range(n_chunks)) - done)
    if max_chunks_per_run is not None:
        todo = todo[:max_chunks_per_run]
    if not todo:
        return []

    subset = docs.withColumn("chunk_id", chunk_id_col(F.col("url"), n_chunks)).filter(
        F.col("chunk_id").isin([int(c) for c in todo])
    )
    result = extract_documents(
        subset.drop("chunk_id"), language=language, work_mode=work_mode,
        ocr_mode=ocr_mode,
    ).withColumn("chunk_id", chunk_id_col(F.col("url"), n_chunks))

    # Idempotent chunk replacement (parquet stand-in for Iceberg MERGE):
    # only the partitions present in `result` are overwritten.  The conf is
    # scoped to this write — session-wide "dynamic" would silently change
    # the semantics of every later overwrite in the same session.
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        result.write.mode("overwrite").partitionBy("chunk_id").parquet(output_path)
    finally:
        if prev_mode is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    # Lineage rows are derived from what was actually WRITTEN, not from the
    # input — the audit trail reflects durable output.
    written = spark.read.parquet(output_path).filter(
        F.col("chunk_id").isin([int(c) for c in todo])
    )
    lineage = written.groupBy("chunk_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bytes").alias("n_bytes"),
        F.sum((F.col("status") != "Sukces").cast("long")).alias("n_errors"),
        # bit_xor: order-independent, overflow-free under ANSI mode
        F.expr("bit_xor(xxhash64(url, extracted_text))").alias("checksum"),
    ).withColumn("status", F.lit(STATUS_OK)).withColumn("run_id", F.lit(run_id))
    lineage.write.mode("append").parquet(checkpoint_path)
    return todo


def finalize_names(
    spark: SparkSession, output_path: str, work_mode: str = "KP",
    assume_sorted: bool = False,
) -> DataFrame:
    """Global numbering + naming over the completed chunk output, plus the
    year-scoped display number: the flagship output ships ``lp`` /
    ``new_name`` (X13/X14) AND ``lp_year`` / ``display_number`` — the
    reference's ``{mode}/{year}`` session counters rendered with the
    TYPE_PATTERNS literals (gui/constants.py:9-13) — not just the oracle
    query's view of them.

    ``assume_sorted``: the chunk output is stored url-sorted (an Iceberg
    url sort order) — numbering then takes the zero-payload-shuffle path
    (pipeline/numbering.with_sequence_sorted); raises ``ValueError`` if
    the claimed order doesn't hold."""
    named = with_new_names(
        spark.read.parquet(output_path).drop("chunk_id"), work_mode=work_mode,
        assume_sorted=assume_sorted,
    )
    return with_display_numbers(named, work_mode=work_mode)


def lineage_report(spark: SparkSession, checkpoint_path: str) -> DataFrame:
    """The checkpoint table, latest row per chunk."""
    from pyspark.sql import Window

    lin = _read_checkpoint(spark, checkpoint_path)
    # parquet append keeps history; the MOST RECENT row per chunk wins
    # (run_id is the snapshot counter) — a reprocess that legitimately
    # shrinks a chunk's doc count still surfaces as the current state.
    w = Window.partitionBy("chunk_id").orderBy(F.desc("run_id"), F.desc("n_docs"))
    return lin.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")

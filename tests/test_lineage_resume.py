"""Checkpoint/resume semantics: interrupted runs converge to the exact
single-shot output; retries are idempotent; lineage audits the bytes."""

import pytest
from pyspark.sql import functions as F

from archvisier_spark.corpus import corpus_df
from archvisier_spark.pipeline.extract import extract_documents
from archvisier_spark.pipeline.lineage import (
    chunk_id_col,
    completed_chunks,
    finalize_names,
    lineage_report,
    run_resumable,
)

N_DOCS = 50
N_CHUNKS = 8


@pytest.fixture()
def docs(spark):
    return corpus_df(spark, N_DOCS, seed=9, partitions=4)


def _single_shot(spark, docs):
    return {
        r["url"]: (r["extracted_text"], r["status"])
        for r in extract_documents(docs).collect()
    }


def test_interrupted_runs_converge(spark, docs, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # simulate a job dying after 3 chunks, twice, then finishing
    runs = []
    while True:
        processed = run_resumable(spark, docs, out, ckpt, n_chunks=N_CHUNKS, max_chunks_per_run=3)
        if not processed:
            break
        runs.append(processed)
    assert len(runs) == 3  # 3+3+2 chunks
    assert sorted(c for r in runs for c in r) == list(range(N_CHUNKS))

    got = {
        r["url"]: (r["extracted_text"], r["status"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == _single_shot(spark, docs)


def test_rerun_is_noop_and_idempotent(spark, docs, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    first = run_resumable(spark, docs, out, ckpt, n_chunks=N_CHUNKS)
    assert sorted(first) == list(range(N_CHUNKS))
    again = run_resumable(spark, docs, out, ckpt, n_chunks=N_CHUNKS)
    assert again == []
    assert spark.read.parquet(out).count() == N_DOCS


def test_lineage_accounts_for_every_doc(spark, docs, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_resumable(spark, docs, out, ckpt, n_chunks=N_CHUNKS)
    report = lineage_report(spark, ckpt)
    rows = report.collect()
    assert {r["chunk_id"] for r in rows} == set(range(N_CHUNKS)) & {
        r["chunk_id"] for r in rows
    }
    assert sum(r["n_docs"] for r in rows) == N_DOCS
    assert all(r["status"] == "ok" for r in rows)
    assert all(r["n_errors"] == 0 for r in rows)


def test_checksums_match_single_shot(spark, docs, tmp_path):
    """Resumed-run lineage checksums equal checksums computed over a
    single-shot extraction — byte-level audit of resume correctness."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    while run_resumable(spark, docs, out, ckpt, n_chunks=N_CHUNKS, max_chunks_per_run=2):
        pass
    resumed = {
        r["chunk_id"]: r["checksum"] for r in lineage_report(spark, ckpt).collect()
    }
    single = {
        r["chunk_id"]: r["checksum"]
        for r in extract_documents(docs)
        .withColumn("chunk_id", chunk_id_col(F.col("url"), N_CHUNKS))
        .groupBy("chunk_id")
        .agg(F.expr("bit_xor(xxhash64(url, extracted_text))").alias("checksum"))
        .collect()
    }
    assert resumed == single


def test_finalize_names_dense_sequence(spark, docs, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_resumable(spark, docs, out, ckpt, n_chunks=N_CHUNKS)
    named = finalize_names(spark, out).collect()
    by_url = sorted(named, key=lambda r: r["url"])
    assert [r["lp"] for r in by_url] == list(range(1, N_DOCS + 1))
    # the year-scoped display number ships in the flagship output schema
    for r in by_url:
        year = r["warc_ts"].year
        assert r["display_number"] == f"KP/{r['lp_year']}/{year}"
    # lp_year is a dense 1..k sequence within each year
    years = {}
    for r in by_url:  # by_url is url-ordered, the numbering order
        seq = years.setdefault(r["warc_ts"].year, [])
        seq.append(r["lp_year"])
    for year, seq in years.items():
        assert seq == list(range(1, len(seq) + 1)), year


def test_completed_chunks_empty_checkpoint(spark, tmp_path):
    assert completed_chunks(spark, str(tmp_path / "missing")) == set()


def test_legacy_checkpoint_without_run_id(spark, docs, tmp_path):
    """Checkpoints written before the run_id column existed must keep
    working: lineage_report orders by run_id, and a mixed-schema parquet
    dir read without mergeSchema may drop the column depending on which
    footer Spark samples (round-2 ADVICE)."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # hand-write a legacy lineage row (no run_id column) for chunk 0
    spark.createDataFrame(
        [(0, 5, 1000, 0, 12345, "ok")],
        "chunk_id int, n_docs long, n_bytes long, n_errors long, checksum long, status string",
    ).write.mode("append").parquet(ckpt)

    # resume: chunk 0 must be seen as done; new rows get run_id >= 0
    processed = run_resumable(spark, docs, out, ckpt, n_chunks=N_CHUNKS)
    assert 0 not in processed
    assert sorted(processed) == [c for c in range(N_CHUNKS) if c != 0]

    # the mixed-schema checkpoint still reports — legacy row wins for
    # chunk 0 (its only row), new rows win elsewhere
    report = {r["chunk_id"]: r for r in lineage_report(spark, ckpt).collect()}
    assert set(report) == set(range(N_CHUNKS))
    assert report[0]["run_id"] == -1 and report[0]["n_docs"] == 5
    assert all(report[c]["run_id"] == 0 for c in range(1, N_CHUNKS))

    # a second pass over the mixed dir is still a no-op
    assert run_resumable(spark, docs, out, ckpt, n_chunks=N_CHUNKS) == []

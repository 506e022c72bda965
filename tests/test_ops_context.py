"""Spark context joins ≡ single-node kernel loops (J2/J3), and the
extraction roundtrip gauge must report 100% byte-identity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from archvisier_spark.kernel.context import (
    find_relevant_correction,
    find_similar_documents,
)
from archvisier_spark.ops.context_ops import (
    q_context_corrections,
    q_context_similar_docs,
    q_extraction_roundtrip,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def doc_texts():
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    return {doc_id: text for doc_id, text in rows}


def test_similar_docs_matches_kernel(spark, doc_texts):
    got = {}
    for r in q_context_similar_docs(spark, SF_DIR).collect():
        got.setdefault(r["query_id"], []).append((r["mem_id"], r["cosine"]))
    memory = [doc_texts[i] for i in range(100)]
    for qid in range(100, 150):
        # query output rounds to 4 dp (cross-engine oracle granularity);
        # ORDERING is still decided at full double precision
        expected = [
            (idx, round(sim, 4))
            for idx, sim in find_similar_documents(memory, doc_texts[qid])
        ]
        mine = sorted(got.get(qid, []), key=lambda t: (-t[1], t[0]))
        assert sorted(mine) == sorted(expected), qid


def test_corrections_matches_kernel(spark, doc_texts):
    got = {r["query_id"]: (r["best_corr"], r["best_sim"])
           for r in q_context_corrections(spark, SF_DIR).collect()}
    corrections = [
        {"text_fragment": doc_texts[i][:200],
         "changed_fields": {"f": {"original": "", "corrected": str(i)}}}
        for i in range(120)
    ]
    # every 5th query: the quadratic kernel loop is the cost; full per-row
    # parity is covered by the DuckDB oracle (context_corrections)
    for qid in range(200, 330, 5):
        suggestion = find_relevant_correction(corrections, doc_texts[qid][:200], "f")
        if suggestion is None:
            assert qid not in got, qid
        else:
            assert qid in got, qid
            assert str(got[qid][0]) == suggestion, qid
            assert got[qid][1] >= 0.7


def test_extraction_roundtrip_all_byte_identical(spark):
    rows = q_extraction_roundtrip(spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in rows) == 200
    for r in rows:
        assert r["n_byte_identical"] == r["n_docs"], r
        assert r["n_ok"] == r["n_docs"], r

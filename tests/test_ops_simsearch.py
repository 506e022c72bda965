"""ANN-vs-brute-force recall for the LSH similarity search."""

import pytest

from archvisier_spark.ops.simsearch import q_ann_lsh_topk, q_cosine_topk

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def brute(spark):
    return {
        (r["query_id"], r["cand_id"])
        for r in q_cosine_topk(spark, SF_DIR).collect()
    }


def test_ann_lsh_recall(spark, brute):
    ann = {
        (r["query_id"], r["cand_id"])
        for r in q_ann_lsh_topk(spark, SF_DIR).collect()
    }
    # ANN is approximate; random 64-dim embeddings are a worst case, but
    # banded signatures must still recover a meaningful share of the true
    # top-k and must never return a non-candidate ranked above rank K with
    # wrong scores (scores are exact cosine on the candidate set).
    assert len(ann) > 0
    recall = len(ann & brute) / len(brute)
    assert recall >= 0.2, f"ANN recall collapsed: {recall}"


def test_ann_scores_are_exact_cosine(spark):
    """For every (query, cand) the ANN path reports, the score must equal
    the brute-force cosine for the same pair."""
    ann = {(r["query_id"], r["cand_id"]): r["cosine"] for r in q_ann_lsh_topk(spark, SF_DIR).collect()}
    brute = {(r["query_id"], r["cand_id"]): r["cosine"] for r in q_cosine_topk(spark, SF_DIR).collect()}
    for pair, score in ann.items():
        if pair in brute:
            assert abs(score - brute[pair]) < 1e-9

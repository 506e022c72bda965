"""A6 progress metrics: observation totals must match the data."""

from archvisier_spark.corpus import corpus_df
from archvisier_spark.pipeline.extract import observed_extraction


def test_observed_extraction_metrics(spark):
    docs = corpus_df(spark, 30, seed=6, partitions=3)
    extracted, obs = observed_extraction(docs)
    rows = extracted.collect()
    metrics = obs.get
    assert metrics["n_docs"] == 30
    assert metrics["n_errors"] == 0
    assert metrics["total_chars"] == sum(len(r["extracted_text"]) for r in rows)
    assert metrics["total_bytes"] == sum(r["n_bytes"] for r in rows) > 0

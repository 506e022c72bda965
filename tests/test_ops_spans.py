"""X18 all-occurrences span query vs the Python kernel ground truth:
the built-in split/prefix-scan reconstruction must reproduce
find_all_occurrences (advance-by-len non-overlapping search) exactly."""

import json

from archvisier_spark.kernel.spans import find_all_occurrences
from archvisier_spark.ops.cascade_ops import q_all_occurrence_spans

SF_DIR = "/root/testdata/sf0.001"


def test_all_occurrence_spans_match_kernel(spark):
    import pyarrow.parquet as pq

    got = {
        r["doc_id"]: r
        for r in q_all_occurrence_spans(spark, SF_DIR).collect()
    }
    docs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    docs = docs[docs.doc_id < 300]
    assert len(got) == len(docs)
    checked_nonempty = 0
    for row in docs.itertuples(index=False):
        want_data = list(find_all_occurrences(row.text, "data"))
        want_spark = list(find_all_occurrences(row.text, "spark"))
        r = got[row.doc_id]
        assert json.loads(r["spans_data"]) == [
            {"start": s, "end": s + 4} for s in want_data
        ], row.doc_id
        assert json.loads(r["starts_spark"]) == want_spark, row.doc_id
        assert r["n_data"] == len(want_data)
        assert r["n_spark"] == len(want_spark)
        if want_data:
            checked_nonempty += 1
    assert checked_nonempty > 5  # the corpus must actually exercise hits


def test_all_occurrence_overlapping_needle(spark):
    """Non-overlapping semantics: 'aaaa' in 'aaaaaa' hits once at 0 (the
    kernel advances by len(sub)), not at 0 and 1."""
    import pandas as pd

    from archvisier_spark.ops.cascade_ops import _all_starts_col
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        pd.DataFrame({"text": ["aaaaaa", "abcabcabc", "", "xyz"]})
    )
    out = [
        list(r["st"])
        for r in df.select(_all_starts_col(F.col("text"), "abc").alias("st")).collect()
    ]
    assert out == [[], [0, 3, 6], [], []]
    out2 = [
        list(r["st"])
        for r in df.select(_all_starts_col(F.col("text"), "aaaa").alias("st")).collect()
    ]
    assert out2 == [[0], [], [], []]
    # kernel agreement on the same strings
    for text in ["aaaaaa", "abcabcabc", "", "xyz"]:
        assert list(find_all_occurrences(text, "aaaa")) == (
            [0] if text == "aaaaaa" else []
        )

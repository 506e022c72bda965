"""E3 training pipeline: J1 join semantics, span parity with the kernel,
seeded split determinism, JSONL roundtrip."""

import json
import glob

import pandas as pd
import pytest

from archvisier_spark.kernel.spans import label_spans
from archvisier_spark.pipeline.training import (
    build_training_records,
    export_results_table,
    split_and_write_jsonl,
    write_text_files,
)


@pytest.fixture(scope="module")
def corpus(spark):
    docs = pd.DataFrame(
        {
            "url": [f"d{i}" for i in range(6)],
            "text": [
                "Umowa nr 7/2025 z dnia 2024-03-05. Numer 7/2025 powtórzony.",
                "Protokół odbioru robót z dnia 2024-01-15.",
                "zwykły tekst bez znaczników",
                "Porozumienie stron: ABC sp. z o.o.",
                "Sygn. akt II C 44/19 w aktach sprawy",
                "odbiór przedmiotu umowy nastąpił",
            ],
        }
    )
    truth = pd.DataFrame(
        {
            "url": ["d0", "d1", "d4", "d9"],  # d9 has no document (J1 inner drop)
            "Data": ["2024-03-05", "2024-01-15", None, "x"],
            "Nadawca": [None, None, None, None],
            "Odbiorca": [None, None, None, None],
            "W sprawie": [None, None, None, None],
            "Numer Dokumentu": ["7/2025", None, None, None],
            "Sygnatura Sprawy": [None, None, "II C 44/19", None],
        }
    )
    return spark.createDataFrame(docs), spark.createDataFrame(truth), docs, truth


def test_join_is_inner(spark, corpus):
    docs_df, truth_df, docs, _ = corpus
    records = {r["url"]: r for r in build_training_records(docs_df, truth_df).collect()}
    assert set(records) == {"d0", "d1", "d4"}  # d9 dropped, unlabelled docs dropped


def test_spans_match_kernel(spark, corpus):
    docs_df, truth_df, docs, truth = corpus
    records = {r["url"]: r for r in build_training_records(docs_df, truth_df).collect()}
    truth_rows = truth.set_index("url").to_dict("index")
    for url, rec in records.items():
        text = docs.set_index("url")["text"][url]
        expected = [
            {"start": s, "end": e, "label": lab}
            for s, e, lab in label_spans(text, truth_rows[url])
        ]
        got = [s.asDict() for s in rec["label"]]
        assert got == expected, url
    # d0 has two occurrences of "7/2025" → two NR_DOKUMENTU spans (X18)
    d0 = [s for s in records["d0"]["label"] if s["label"] == "NR_DOKUMENTU"]
    assert len(d0) == 2


def test_split_and_jsonl_roundtrip(spark, corpus, tmp_path):
    docs_df, truth_df, *_ = corpus
    records = build_training_records(docs_df, truth_df)
    n_train, n_dev = split_and_write_jsonl(records, str(tmp_path / "out"), seed=7)
    assert n_train + n_dev == 3
    # JSONL lines parse and carry raw UTF-8 (ensure_ascii=False analog)
    lines = []
    for f in glob.glob(str(tmp_path / "out" / "*" / "part-*")):
        with open(f, encoding="utf-8") as fh:
            lines += [json.loads(l) for l in fh if l.strip()]
    assert len(lines) == 3
    assert any("Protokół" in l["text"] for l in lines)  # unescaped diacritics
    raw = open(glob.glob(str(tmp_path / "out" / "*" / "part-*"))[0], "rb").read()
    assert b"\\u" not in raw.split(b'"label"')[0]  # text not ascii-escaped


def test_split_deterministic(spark, corpus, tmp_path):
    docs_df, truth_df, *_ = corpus
    records = build_training_records(docs_df, truth_df)
    a = split_and_write_jsonl(records, str(tmp_path / "a"), seed=7)
    b = split_and_write_jsonl(records, str(tmp_path / "b"), seed=7)
    assert a == b


def test_text_and_csv_sinks(spark, tmp_path):
    from archvisier_spark.corpus import corpus_df
    from archvisier_spark.pipeline.extract import extract_documents, with_new_names

    docs = corpus_df(spark, 12, seed=8, partitions=2)
    named = with_new_names(extract_documents(docs), keys_df=docs)
    write_text_files(named, str(tmp_path / "txt"))
    export_results_table(named, str(tmp_path / "csv"))
    txt_lines = []
    for f in glob.glob(str(tmp_path / "txt" / "part-*")):
        txt_lines += open(f, encoding="utf-8").read().splitlines()
    assert len(txt_lines) == 12
    csv_files = glob.glob(str(tmp_path / "csv" / "part-*"))
    assert len(csv_files) == 1  # single driver-scale artifact
    header = open(csv_files[0], encoding="utf-8").readline()
    assert header.startswith("url,lp,new_name")


def test_status_fill_map_golden(spark):
    """pdf_processor_app.py:1103-1107 literals carried as data; unknown
    statuses get no fill (the reference's dict.get no-color path)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from archvisier_spark.pipeline.training import STATUS_FILLS, status_fill_col

    assert STATUS_FILLS == {
        "OK": "C6EFCE",
        "BŁĄD": "F8CBAD",
        "DO UZUPEŁNIENIA": "FFF3CD",
    }
    df = spark.createDataFrame(
        pd.DataFrame({"doc_status": ["OK", "BŁĄD", "DO UZUPEŁNIENIA", "INNE"]})
    )
    got = {
        r["doc_status"]: r["fill"]
        for r in df.select("doc_status", status_fill_col(F.col("doc_status")).alias("fill")).collect()
    }
    assert got == {
        "OK": "C6EFCE",
        "BŁĄD": "F8CBAD",
        "DO UZUPEŁNIENIA": "FFF3CD",
        "INNE": "",
    }


def test_export_carries_status_fill(spark, tmp_path):
    import glob as _glob

    from archvisier_spark.corpus import corpus_df
    from archvisier_spark.pipeline.extract import extract_documents, with_new_names

    docs = corpus_df(spark, 6, seed=9, partitions=2)
    named = with_new_names(extract_documents(docs), keys_df=docs)
    export_results_table(named, str(tmp_path / "csv2"))
    csv_file = _glob.glob(str(tmp_path / "csv2" / "part-*"))[0]
    lines = open(csv_file, encoding="utf-8").read().splitlines()
    header = lines[0].split(",")
    assert "status_fill" in header
    idx_fill = header.index("status_fill")
    idx_status = header.index("doc_status")
    fills = {"C6EFCE", "F8CBAD", "FFF3CD", ""}
    import csv as _csv

    for row in _csv.reader(lines[1:]):
        assert (row[idx_fill] or "") in fills
        if row[idx_status] == "OK":
            assert row[idx_fill] == "C6EFCE"

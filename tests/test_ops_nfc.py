"""NFC normalization op: the UDF must match unicodedata AND DuckDB's
nfc_normalize on text that actually differs under NFC (the synthetic
corpus is already canonical, so this is where the interesting branch is
exercised)."""

import unicodedata

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from archvisier_spark.ops.textops import ORACLES, nfc_normalize_udf, q_nfc_normalize

# NFD sequences built explicitly from combining marks (dot-above, acute,
# ogonek) -- visually identical to the NFC forms but different codepoints
NFD_CASES = [
    "Zaz\u0307o\u0301l\u0301c\u0301 ge\u0328s\u0301la\u0328",  # decomposed Polish-ish
    "e\u0301le\u0300ve",                                            # decomposed French
    "already canonical ascii",
    "",
]


def test_nfc_udf_matches_unicodedata_and_duckdb(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": NFD_CASES}))
    got = [r["n"] for r in df.select(nfc_normalize_udf("text").alias("n")).collect()]
    want = [unicodedata.normalize("NFC", t) for t in NFD_CASES]
    assert got == want
    # at least one case must actually change under NFC
    assert any(g != t for g, t in zip(got, NFD_CASES))
    con = duckdb.connect()
    for t, g in zip(NFD_CASES, got):
        assert con.execute("SELECT nfc_normalize(?)", [t]).fetchone()[0] == g


def test_nfc_query_matches_oracle(spark):
    sf = "/root/testdata/sf0.001"
    s = (
        q_nfc_normalize(spark, sf)
        .orderBy("doc_id")
        .toPandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    d = (
        con.sql(ORACLES["text_nfc_normalize"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(s) == len(d)
    assert s["nfc_digest"].tolist() == d["nfc_digest"].tolist()
    assert s["changed_by_nfc"].tolist() == d["changed_by_nfc"].tolist()

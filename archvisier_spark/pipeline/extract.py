"""The flagship extraction job — E1 lifted onto Spark (SURVEY.md §3).

Reference dataflow (gui/processing_worker.py:435-524): sorted scan →
parallel per-document OCR → metadata cascade → sequential numbering →
rename.  Spark shape::

    documents(url, warc_ts, html, text, lang)
      → size-aware repartition (skew defusal, SURVEY.md §4)
      → mapInPandas(extract_batch)          # Arrow batches, kernel per doc
      → with_sequence(lp)                    # scalable counter semantics
      → new_name via filename_for            # X14

All per-document logic is the pure kernel, executed inside Arrow-batched
``mapInPandas`` so Python is entered once per batch, never per row on the
driver (north rule).  Errors stay data: a malformed payload produces a row
with the reference's error literals, never a task failure.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from archvisier_spark.kernel.cascade import extract_info_from_text
from archvisier_spark.kernel.document import extract_document_text
from archvisier_spark.kernel.naming import filename_for
from archvisier_spark.kernel.spans import detect_document_type_span, find_all_occurrences
from archvisier_spark.pipeline.numbering import with_sequence

# Rows with payloads above this go through a dedicated high-parallelism pass
# — megabyte-scale PDFs are the documented skew source (SURVEY.md §4
# "Skew from megabyte-scale PDFs"; AQE splits join skew, not UDF-stage skew).
SKEW_BYTES_THRESHOLD = 1 << 20

SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("start", T.IntegerType(), False),
            T.StructField("end", T.IntegerType(), False),
            T.StructField("label", T.StringType(), False),
        ]
    )
)

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("format", T.StringType(), False),
        T.StructField("extracted_text", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("data", T.StringType(), False),
        T.StructField("nadawca_odbiorca", T.StringType(), False),
        T.StructField("w_sprawie", T.StringType(), False),
        T.StructField("numer_dokumentu", T.StringType(), False),
        T.StructField("sygnatura_sprawy", T.StringType(), False),
        T.StructField("typ_dokumentu", T.StringType(), False),
        T.StructField("doc_status", T.StringType(), False),
        T.StructField("colors", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("spans", SPAN_TYPE, False),
        T.StructField("n_chars", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

# Extracted-field -> span label, mirroring the training-side column map
# (training_engine.py:37-42 via spans.COLUMN_LABELS).
_FIELD_LABELS = (
    ("data", "DATA"),
    ("nadawca_odbiorca", "ORGANIZACJA"),
    ("w_sprawie", "TYTUL_PISMA"),
    ("numer_dokumentu", "NR_DOKUMENTU"),
    ("sygnatura_sprawy", "SYGNATURA_SPRAWY"),
)


def info_spans(text: str, info: dict) -> list[dict]:
    """Char-span offsets of every extracted value (X18 contract) plus the
    keyword document-type span (X19)."""
    spans: list[dict] = []
    for field, label in _FIELD_LABELS:
        value = info.get(field, "")
        if not value:
            continue
        for start in find_all_occurrences(text, value):
            spans.append({"start": start, "end": start + len(value), "label": label})
    doc_type, start, end = detect_document_type_span(text)
    if doc_type is not None:
        spans.append({"start": start, "end": end, "label": "TYP_DOKUMENTU"})
    return spans


def make_extract_batch(language: str, work_mode: str, case_signature: str):
    """Build the mapInPandas function (closure keeps config serialisable)."""

    def extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: list[dict] = []
            for row in batch.itertuples(index=False):
                payload = bytes(row.html) if row.html is not None else None
                text, status, fmt = extract_document_text(payload, language)
                info = extract_info_from_text(text, row.url, work_mode, case_signature)
                out.append(
                    {
                        "url": row.url,
                        "warc_ts": row.warc_ts,
                        "lang": row.lang,
                        "format": fmt,
                        "extracted_text": text,
                        "status": status,
                        "data": info["data"],
                        "nadawca_odbiorca": info["nadawca_odbiorca"],
                        "w_sprawie": info["w_sprawie"],
                        "numer_dokumentu": info["numer_dokumentu"],
                        "sygnatura_sprawy": info["sygnatura_sprawy"],
                        "typ_dokumentu": info["typ_dokumentu"],
                        "doc_status": info["status"],
                        "colors": info["colors"],
                        "spans": info_spans(text, info),
                        "n_chars": len(text),
                        "n_bytes": len(payload) if payload else 0,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in EXTRACT_SCHEMA.fields])

    return extract_batch


def extract_documents(
    df: DataFrame,
    language: str = "auto",
    work_mode: str = "KP",
    case_signature: str = "",
    partitions: int | None = None,
    skew_threshold: int = SKEW_BYTES_THRESHOLD,
) -> DataFrame:
    """Distributed sniff→extract→cascade over the north-rule table.

    Skew defusal is explicit and size-aware: payloads are split at
    ``skew_threshold`` bytes; each side is hash-repartitioned on ``url``
    (unique key ⇒ uniform row counts), so a handful of megabyte PDFs
    can't serialise one task while 31 idle.  Returns EXTRACT_SCHEMA.
    """
    spark = df.sparkSession
    n_parts = partitions or spark.sparkContext.defaultParallelism
    fn = make_extract_batch(language, work_mode, case_signature)

    sized = df.select("url", "warc_ts", "html", "lang", F.length("html").alias("__nb"))
    small = sized.filter(F.col("__nb") < skew_threshold).drop("__nb")
    big = sized.filter(F.col("__nb") >= skew_threshold).drop("__nb")

    extracted = small.repartition(n_parts, "url").mapInPandas(fn, EXTRACT_SCHEMA).unionByName(
        big.repartition(n_parts, "url").mapInPandas(fn, EXTRACT_SCHEMA)
    )
    return extracted


def with_new_names(extracted: DataFrame, work_mode: str = "KP") -> DataFrame:
    """Append ``lp`` (counter semantics, A2) and ``new_name`` (X14).

    ``lp`` = dense 1-based sequence in ``url`` order per work-mode — equal
    to the reference's sequential ``counters[mode]`` bumps over
    ``sorted(glob)`` (gui/processing_worker.py:320-322,373).  Naming runs
    in an Arrow-batched pandas UDF over the kernel's pure ``filename_for``.
    """
    numbered = with_sequence(
        extracted.withColumn("work_mode", F.lit(work_mode)),
        order_col="url",
        partition_cols=("work_mode",),
        out_col="lp",
    )

    @F.pandas_udf(T.StringType())
    def name_udf(
        lp: pd.Series,
        sygnatura: pd.Series,
        numer: pd.Series,
        nadawca: pd.Series,
        typ: pd.Series,
        w_sprawie: pd.Series,
    ) -> pd.Series:
        return pd.Series(
            [
                filename_for(
                    {
                        "sygnatura_sprawy": s,
                        "numer_dokumentu": n,
                        "nadawca_odbiorca": na,
                        "typ_dokumentu": t,
                        "w_sprawie": w,
                    },
                    int(i),
                )
                for i, s, n, na, t, w in zip(lp, sygnatura, numer, nadawca, typ, w_sprawie)
            ]
        )

    return numbered.withColumn(
        "new_name",
        name_udf("lp", "sygnatura_sprawy", "numer_dokumentu", "nadawca_odbiorca", "typ_dokumentu", "w_sprawie"),
    )

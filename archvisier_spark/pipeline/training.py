"""Training-data pipeline (E3, SURVEY.md §3): truth ⋈ docs → span labels →
seeded split → JSONL sink.

Reference dataflow (training_engine.py:89-191): walk folders, read one
ground-truth Excel per folder, join rows to OCR'd PDFs on filename (J1,
inner — missing files warn+skip), find every literal occurrence of each
cell value as a char span (X18) plus one keyword doc-type span (X19),
shuffle, 80/20 split (T6), emit ``{"text":…, "label":[[start,end,LABEL]…]}``
JSONL (S6, ``ensure_ascii=False`` ⇒ raw UTF-8 — Spark's JSON writer is
UTF-8-native, matching).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from archvisier_spark.kernel.spans import label_spans
from archvisier_spark.pipeline.extract import SPAN_TYPE

TRAINING_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("label", T.ArrayType(
            T.StructType(
                [
                    T.StructField("start", T.IntegerType(), False),
                    T.StructField("end", T.IntegerType(), False),
                    T.StructField("label", T.StringType(), False),
                ]
            )
        ), False),
    ]
)

# Ground-truth columns, as in the reference Excel sheets
# (training_engine.py:37-42 via kernel.spans.COLUMN_LABELS).
TRUTH_COLUMNS = ("Data", "Nadawca", "Odbiorca", "W sprawie",
                 "Numer Dokumentu", "Sygnatura Sprawy")


def build_training_records(docs: DataFrame, truth: DataFrame) -> DataFrame:
    """J1 inner join on the document key + X18/X19 span labelling.

    ``docs``: (url, text); ``truth``: (url, <TRUTH_COLUMNS…>) — the Excel
    ground-truth analog.  Truth sheets are per-folder small → broadcast.
    """
    joined = docs.select("url", "text").join(F.broadcast(truth), "url", "inner")
    truth_cols = [c for c in truth.columns if c != "url"]

    def label_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {"url": [], "text": [], "label": []}
            for row in batch.to_dict("records"):
                text = row["text"] or ""
                truth_map = {c: row.get(c) for c in truth_cols}
                spans = [
                    {"start": s, "end": e, "label": lab}
                    for s, e, lab in label_spans(text, truth_map)
                ]
                out["url"].append(row["url"])
                out["text"].append(text)
                out["label"].append(spans)
            yield pd.DataFrame(out, columns=["url", "text", "label"])

    return joined.mapInPandas(label_batch, TRAINING_SCHEMA)


def split_and_write_jsonl(
    records: DataFrame, out_dir: str, seed: int = 42, train_fraction: float = 0.8
) -> tuple[int, int]:
    """T6 seeded 80/20 split + S6 JSONL sinks; returns (n_train, n_dev).

    ``randomSplit`` is the distributed analog of the reference's
    ``random.shuffle`` + slice (training_engine.py:170-172) — same
    fraction contract, seeded determinism, no driver-side materialise.
    """
    train, dev = records.randomSplit([train_fraction, 1 - train_fraction], seed=seed)
    train.select("text", "label").write.mode("overwrite").json(f"{out_dir}/train")
    dev.select("text", "label").write.mode("overwrite").json(f"{out_dir}/dev")
    spark = records.sparkSession
    return (
        spark.read.schema(TRAINING_SCHEMA).json(f"{out_dir}/train").count(),
        spark.read.schema(TRAINING_SCHEMA).json(f"{out_dir}/dev").count(),
    )


def write_text_files(extracted: DataFrame, out_dir: str) -> None:
    """S7 per-document text dump: (url, extracted_text) as UTF-8 text rows
    (the distributed analog of one ``.txt`` per PDF,
    konwertuj_pdf_do_txt.py:38-53)."""
    extracted.select(
        F.concat_ws("\t", F.col("url"), F.regexp_replace("extracted_text", r"\n", r"\\n"))
        .alias("value")
    ).write.mode("overwrite").text(out_dir)


# Status → cell-fill hex literals, verbatim from the reference's XLSX
# styler (pdf_processor_app.py:1103-1107) — carried as DATA so a styling
# layer (openpyxl, a BI tool) can reproduce the exact fills.
STATUS_FILLS = {
    "OK": "C6EFCE",
    "BŁĄD": "F8CBAD",
    "DO UZUPEŁNIENIA": "FFF3CD",
}


def status_fill_col(status_col) -> F.Column:
    """The status→fill map as an expression (unknown statuses → empty,
    matching the reference's ``status_fills.get(status)`` no-fill path)."""
    expr = F.lit("")
    for status, fill in STATUS_FILLS.items():
        expr = F.when(status_col == status, F.lit(fill)).otherwise(expr)
    return expr


def export_results_table(named: DataFrame, out_path: str) -> None:
    """S8 results export.  The reference styles an XLSX driver-side
    (pdf_processor_app.py:1023-1122 — presentation, not engine); the
    engine-parity export is the full results table, with the status colour
    map carried as data (``status_fill`` holds the reference's exact hex
    literals).  Written as a single CSV part (driver-scale artifact, like
    the reference's one workbook); swap ``.csv`` for
    ``df.toPandas().to_excel`` where openpyxl exists."""
    (
        named.select(
            "url", "lp", "new_name", "data", "nadawca_odbiorca", "w_sprawie",
            "numer_dokumentu", "sygnatura_sprawy", "typ_dokumentu", "doc_status",
            status_fill_col(F.col("doc_status")).alias("status_fill"),
            F.to_json("colors").alias("colors_json"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .csv(out_path)
    )


# The reference's export headers: ["Lp.", "Nowa nazwa", *INFO_FIELDS
# labels] (pdf_processor_app.py:89-97,1036).
XLSX_HEADERS = [
    "Lp.", "Nowa nazwa", "Data", "Nadawca/Odbiorca", "W sprawie",
    "Numer dokumentu", "Sygnatura sprawy", "Typ dokumentu", "Status",
]
_XLSX_COLS = [
    "lp", "new_name", "data", "nadawca_odbiorca", "w_sprawie",
    "numer_dokumentu", "sygnatura_sprawy", "typ_dokumentu", "doc_status",
]


def export_results_xlsx(named: DataFrame, path: str,
                        max_rows: int = 100_000) -> None:
    """S8 styled XLSX export, full parity with the reference artifact
    (pdf_processor_app.py:1023-1122) via the from-scratch stdlib OOXML
    writer (pipeline/xlsx.py): same headers, bold D9D9D9 header row with
    thin borders, frozen pane A2 + auto-filter, max(len)+2 column
    widths, FFFFFF/F0F0F0 row banding, and the status->fill literals on
    the Status column.  Per-cell GUI highlight colors are deliberately
    NOT exported — the reference filters its own yellow empty-field
    highlight (FFFFC8) and white out of the export
    (pdf_processor_app.py:1050-1052), so banding + status fills are the
    complete fill set.  Driver-side single artifact by design: the
    reference exports one bounded session table to one workbook;
    ``max_rows`` + the lp ordering keep it deterministic."""
    from archvisier_spark.pipeline.xlsx import write_styled_xlsx

    collected = (
        named.select(*_XLSX_COLS).orderBy("lp").limit(max_rows).collect()
    )
    rows = [["" if v is None else str(v) for v in r] for r in collected]
    status_idx = XLSX_HEADERS.index("Status")
    fills = [
        [
            STATUS_FILLS.get(row[status_idx], "") if c == status_idx else ""
            for c in range(len(XLSX_HEADERS))
        ]
        for row in rows
    ]
    write_styled_xlsx(path, XLSX_HEADERS, rows, fills)

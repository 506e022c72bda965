"""extract_raster_ocr — the raster-OCR pipeline as a driver query.

Round-5 verdict #5: the raster orchestration (per-page rasterise → OCR in
page order, two-pass auto-language, empty/error row contracts) must be
driver-visible with a full value oracle, not only pytest-reachable.  The
deterministic fake engine (kernel/fake_raster.py) stands in for the
binaries; the distributed round-trip below proves the engine closure
ships into executor workers and the mapInArrow plumbing preserves the
kernel's byte-exact output.  Reference contract: processing/ocr.py:169-237.
"""

import duckdb

from archvisier_spark.kernel.document import extract_document_text
from archvisier_spark.kernel.fake_raster import (
    FAKE_RASTER_ENGINE,
    fake_ocr,
    fake_rasterize,
)
from archvisier_spark.ops.raster_ops import (
    _raster_cases,
    _raster_oracle_sql,
    q_extract_raster_ocr,
)


def test_fake_engine_is_pure():
    """Same inputs → byte-identical raster, char-identical OCR text
    (purity is what lets the driver-side oracle pin executor output)."""
    payload = b"%PDF-1.7 fixture"
    r1, r2 = fake_rasterize(payload, page=3), fake_rasterize(payload, page=3)
    assert r1 == r2
    assert fake_rasterize(payload, page=4) != r1  # page-sensitive
    assert fake_ocr(r1, "pol") == fake_ocr(r2, "pol")
    assert "/p3/pol]" in fake_ocr(r1, "pol")


def test_two_pass_language_resolution_per_page():
    """Odd pages carry Polish diacritics → the auto decision re-OCRs with
    'pol'; even pages English → 'eng'.  The resolved language is baked
    into each page's final text, in page order, '\\n' per page."""
    url, payload = _raster_cases()[0]  # the three-page PDF
    text, status, fmt = extract_document_text(
        payload, "auto", None, "raster", FAKE_RASTER_ENGINE
    )
    assert (status, fmt) == ("Sukces", "pdf")
    pages = text.split("\n")
    assert pages[-1] == ""  # trailing newline per page (ocr.py:227-231)
    assert len(pages) == 4
    assert "/p1/pol]" in pages[0]
    assert "/p2/eng]" in pages[1]
    assert "/p3/pol]" in pages[2]


def test_empty_and_error_rows_are_data():
    """0-page PDF → the reference's empty literal with empty status; an
    engine failure mid-document → BŁĄD TECHNICZNY OCR data row."""
    cases = dict(_raster_cases())
    text, status, _ = extract_document_text(
        cases["warc://raster/empty-pdf"], "auto", None, "raster",
        FAKE_RASTER_ENGINE,
    )
    assert text == "BŁĄD: Plik PDF jest pusty lub uszkodzony."
    assert status == ""
    text, status, _ = extract_document_text(
        cases["warc://raster/over-limit"], "auto", None, "raster",
        FAKE_RASTER_ENGINE,
    )
    assert text.startswith("BŁĄD TECHNICZNY OCR: fake rasteriser: page 9")
    assert "Traceback" in status  # errors stay data, never task failures


def test_distributed_query_matches_oracle(spark):
    """The driver-contract round-trip at test scale: the Spark query
    (engine closure pickled into executor workers, mapInArrow batches)
    must value-match the pinned-literal DuckDB oracle row for row."""
    sdf = q_extract_raster_ocr(spark, "/root/testdata/sf0.001")
    spark_rows = {r["url"]: (r["extracted_text"], r["status_class"],
                             r["format"], r["n_chars"])
                  for r in sdf.collect()}
    res = duckdb.sql(_raster_oracle_sql())
    cols = res.columns
    duck_rows = {row[cols.index("url")]: (row[cols.index("extracted_text")],
                                          row[cols.index("status_class")],
                                          row[cols.index("format")],
                                          row[cols.index("n_chars")])
                 for row in res.fetchall()}
    assert spark_rows == duck_rows
    assert len(spark_rows) == 5

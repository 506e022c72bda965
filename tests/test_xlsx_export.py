"""S8 styled XLSX export — golden checks on the real OOXML artifact.

The writer (pipeline/xlsx.py) is from-scratch stdlib; these tests unzip
the workbook and assert the reference's styling contract
(gui/pdf_processor_app.py:1023-1122) on the XML itself: bold D9D9D9
header + thin borders, frozen pane A2, auto-filter over the range,
max(len)+2 column widths, FFFFFF/F0F0F0 banding, per-cell fill override,
and the status→fill literals on the Status column.
"""

import xml.etree.ElementTree as ET
import zipfile

from pyspark.sql import Row

from archvisier_spark.pipeline.training import (
    STATUS_FILLS,
    XLSX_HEADERS,
    export_results_xlsx,
)
from archvisier_spark.pipeline.xlsx import write_styled_xlsx

NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}


def _load(path):
    with zipfile.ZipFile(path) as z:
        sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
        styles = ET.fromstring(z.read("xl/styles.xml"))
        names = set(z.namelist())
    return sheet, styles, names


def _cell_fill_argb(sheet, styles, ref: str) -> str:
    """Resolve a cell reference's solid-fill ARGB via its xf."""
    cell = next(
        c for c in sheet.iter(f"{{{NS['m']}}}c") if c.get("r") == ref
    )
    xf = int(cell.get("s", "0"))
    xfs = styles.find("m:cellXfs", NS).findall("m:xf", NS)
    fill_id = int(xfs[xf].get("fillId"))
    fills = styles.find("m:fills", NS).findall("m:fill", NS)
    fg = fills[fill_id].find("m:patternFill/m:fgColor", NS)
    return fg.get("rgb") if fg is not None else ""


def _cell_text(sheet, ref: str) -> str:
    cell = next(
        c for c in sheet.iter(f"{{{NS['m']}}}c") if c.get("r") == ref
    )
    t = cell.find("m:is/m:t", NS)
    return t.text or "" if t is not None else ""


def test_writer_layout_contract(tmp_path):
    path = str(tmp_path / "wb.xlsx")
    headers = ["Id", "Tekst"]
    rows = [["1", "zażółć & <gęślą>"], ["2", "ok"], ["3", "x"]]
    fills = [["", ""], ["", "C6EFCE"], ["", ""]]
    write_styled_xlsx(path, headers, rows, fills)
    sheet, styles, names = _load(path)
    assert {"[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
            "xl/styles.xml", "xl/worksheets/sheet1.xml"} <= names

    pane = sheet.find("m:sheetViews/m:sheetView/m:pane", NS)
    assert (pane.get("ySplit"), pane.get("topLeftCell"),
            pane.get("state")) == ("1", "A2", "frozen")
    assert sheet.find("m:autoFilter", NS).get("ref") == "A1:B4"

    # header: bold font on D9D9D9 with thin borders
    assert _cell_fill_argb(sheet, styles, "A1") == "FFD9D9D9"
    xfs = styles.find("m:cellXfs", NS).findall("m:xf", NS)
    hdr_font = int(xfs[1].get("fontId"))
    fonts = styles.find("m:fonts", NS).findall("m:font", NS)
    assert fonts[hdr_font].find("m:b", NS) is not None
    assert int(xfs[1].get("borderId")) == 1
    borders = styles.find("m:borders", NS).findall("m:border", NS)
    assert borders[1].find("m:left", NS).get("style") == "thin"

    # banding alternates FFFFFF / F0F0F0; explicit fill wins
    assert _cell_fill_argb(sheet, styles, "A2") == "FFFFFFFF"
    assert _cell_fill_argb(sheet, styles, "A3") == "FFF0F0F0"
    assert _cell_fill_argb(sheet, styles, "A4") == "FFFFFFFF"
    assert _cell_fill_argb(sheet, styles, "B3") == "FFC6EFCE"

    # XML-escaped text round-trips, widths = max(len) + 2
    assert _cell_text(sheet, "B2") == "zażółć & <gęślą>"
    cols = sheet.find("m:cols", NS).findall("m:col", NS)
    assert cols[1].get("width") == str(len("zażółć & <gęślą>") + 2)

    # data cells wrap + top-align (the reference's Alignment contract)
    data_xf = xfs[int(
        next(c for c in sheet.iter(f"{{{NS['m']}}}c")
             if c.get("r") == "A2").get("s")
    )]
    al = data_xf.find("m:alignment", NS)
    assert (al.get("wrapText"), al.get("vertical")) == ("1", "top")


def test_export_results_xlsx_status_fills(spark, tmp_path):
    """End-to-end over a named-results frame: reference headers and the
    status→fill literals (OK→C6EFCE, BŁĄD→F8CBAD,
    DO UZUPEŁNIENIA→FFF3CD; unknown → banding only)."""
    base = dict(
        new_name="n", data="d", nadawca_odbiorca="x", w_sprawie="w",
        numer_dokumentu="1", sygnatura_sprawy="s", typ_dokumentu="t",
    )
    named = spark.createDataFrame([
        Row(lp=1, doc_status="OK", **base),
        Row(lp=2, doc_status="BŁĄD", **base),
        Row(lp=3, doc_status="DO UZUPEŁNIENIA", **base),
        Row(lp=4, doc_status="COŚ INNEGO", **base),
    ])
    path = str(tmp_path / "results.xlsx")
    export_results_xlsx(named, path)
    sheet, styles, _ = _load(path)

    headers = [_cell_text(sheet, f"{chr(ord('A') + i)}1")
               for i in range(len(XLSX_HEADERS))]
    assert headers == XLSX_HEADERS

    status_col = chr(ord("A") + XLSX_HEADERS.index("Status"))
    assert _cell_fill_argb(sheet, styles, f"{status_col}2") == "FF" + STATUS_FILLS["OK"]
    assert _cell_fill_argb(sheet, styles, f"{status_col}3") == "FF" + STATUS_FILLS["BŁĄD"]
    assert _cell_fill_argb(sheet, styles, f"{status_col}4") == "FF" + STATUS_FILLS["DO UZUPEŁNIENIA"]
    # unknown status: no override — row 5 banding is F0F0F0 ((5-2)%2=1)
    assert _cell_fill_argb(sheet, styles, f"{status_col}5") == "FFF0F0F0"
    # rows ordered by lp; Lp. and Status round-trip as text
    assert _cell_text(sheet, "A2") == "1"
    assert _cell_text(sheet, f"{status_col}4") == "DO UZUPEŁNIENIA"


def test_header_gray_as_data_fill_and_partial_fill_rows(tmp_path):
    """Round-6 review regressions: a per-cell fill equal to the header
    gray must render as a normal data cell (not KeyError), and a fills
    list shorter than rows falls back to banding like short columns do."""
    path = str(tmp_path / "edge.xlsx")
    write_styled_xlsx(
        path, ["A"], [["x"], ["y"], ["z"]], [["D9D9D9"]]
    )
    sheet, styles, _ = _load(path)
    assert _cell_fill_argb(sheet, styles, "A2") == "FFD9D9D9"
    # ...but with the DATA xf (wrap/top), not the bold header xf
    cell = next(c for c in sheet.iter(f"{{{NS['m']}}}c") if c.get("r") == "A2")
    xfs = styles.find("m:cellXfs", NS).findall("m:xf", NS)
    xf = xfs[int(cell.get("s"))]
    assert xf.find("m:alignment", NS) is not None
    assert int(xf.get("fontId")) == 0
    # rows 3-4 had no fills entry → banding
    assert _cell_fill_argb(sheet, styles, "A3") == "FFF0F0F0"
    assert _cell_fill_argb(sheet, styles, "A4") == "FFFFFFFF"


def test_xml_illegal_control_chars_filtered(tmp_path):
    """XML-1.0-illegal characters (C0 controls, surrogates, U+FFFE/FFFF)
    in cell text are FILTERED, not emitted — a workbook carrying raw
    PDF/OCR junk must stay openable (r07 ADVICE fix; openpyxl raises
    IllegalCharacterError, this writer's errors-as-data contract drops
    the characters instead)."""
    path = str(tmp_path / "junk.xlsx")
    junk = "ok\x00\x0b\x0c\x1f￾value\ttab\nnewline"
    write_styled_xlsx(path, ["H"], [[junk]])
    with zipfile.ZipFile(path) as z:
        sheet = z.read("xl/worksheets/sheet1.xml").decode("utf-8")
    # parseable XML, no illegal chars on disk, legal whitespace kept
    ET.fromstring(sheet)
    assert "okvalue\ttab\nnewline" in sheet
    for ch in "\x00\x0b\x0c\x1f￾":
        assert ch not in sheet

"""Minimal from-scratch XLSX (OOXML SpreadsheetML) writer — stdlib only.

The reference styles its results export with openpyxl
(gui/pdf_processor_app.py:1023-1122): bold D9D9D9 header with thin black
borders, frozen header row (``freeze_panes = "A2"``) plus an auto-filter
over the data range, per-column widths ``max(len) + 2``, wrap-text
top-aligned data cells with alternating FFFFFF/F0F0F0 row banding
overridden by per-cell colors, and the status→fill hex literals.
openpyxl does not exist in this sandbox — but an ``.xlsx`` is a ZIP of
XML parts, so the styled artifact is rebuilt here from scratch over
``zipfile`` + string templates, closing SURVEY §2.1 S8's presentation
gap with a real workbook instead of a CSV stand-in.

Scope is exactly the feature set the reference export uses: one sheet,
inline strings, solid pattern fills, thin borders, frozen pane,
auto-filter, custom column widths.  Anything beyond (shared strings,
number formats, formulas) is out of scope on purpose.
"""

from __future__ import annotations

import re
import zipfile
from xml.sax.saxutils import escape as _sax_escape

# XML 1.0 forbids most C0 controls, surrogates and U+FFFE/U+FFFF even
# escaped; extracted_text/status routinely carries arbitrary PDF/OCR
# bytes and tracebacks, and openpyxl (the reference's writer) raises
# IllegalCharacterError on them.  This engine's contract is errors-as-
# data, so illegal characters are FILTERED (never crash the workbook
# write, never produce a file Excel refuses to open) — r07 ADVICE fix.
_XML_ILLEGAL = re.compile(
    "[\x00-\x08\x0b\x0c\x0e-\x1f\ud800-\udfff￾￿]"
)


def escape(s: str) -> str:
    return _sax_escape(_XML_ILLEGAL.sub("", s))

_XML_DECL = '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'

_CONTENT_TYPES = _XML_DECL + (
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    '<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
    "</Types>"
)

_ROOT_RELS = _XML_DECL + (
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)

_WORKBOOK = _XML_DECL + (
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>'
    "</workbook>"
)

_WORKBOOK_RELS = _XML_DECL + (
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>'
    "</Relationships>"
)

# the reference's styling constants (gui/pdf_processor_app.py:1077-1107)
HEADER_FILL = "D9D9D9"
BAND_FILLS = ("FFFFFF", "F0F0F0")


def col_letter(idx: int) -> str:
    """1-based column index → spreadsheet letters (1→A, 27→AA)."""
    out = ""
    while idx > 0:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _argb(hex_color: str) -> str:
    h = hex_color.lstrip("#").upper()
    return h if len(h) == 8 else "FF" + h


def _styles_xml(fill_hexes: list[str]) -> str:
    """styles.xml with: fonts 0=default/1=bold; fills 0=none, 1=gray125
    (both required by the spec's fixed indices), then one solid fill per
    unique color; borders 0=none, 1=thin black; cellXfs 0=default,
    1=header (bold + header fill + border), 2+=data xf per fill (border +
    wrap/top alignment, the reference's data-cell contract)."""
    fills = [
        '<fill><patternFill patternType="none"/></fill>',
        '<fill><patternFill patternType="gray125"/></fill>',
    ]
    for h in fill_hexes:
        fills.append(
            f'<fill><patternFill patternType="solid">'
            f'<fgColor rgb="{_argb(h)}"/><bgColor indexed="64"/>'
            f"</patternFill></fill>"
        )
    # fill id of color i = 2 (none, gray125) + i.  xf 0 = default, xf 1 =
    # header (bold on fill_hexes[0]); then one DATA xf per color —
    # including the header gray, which is a legal per-cell data fill too
    # (a caller passing D9D9D9 must get a wrap/top data cell, not a
    # KeyError).
    xfs = [
        '<xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0"/>',
        '<xf numFmtId="0" fontId="1" fillId="2" borderId="1" xfId="0" '
        'applyFont="1" applyFill="1" applyBorder="1"/>',
    ]
    for i in range(len(fill_hexes)):
        xfs.append(
            f'<xf numFmtId="0" fontId="0" fillId="{2 + i}" borderId="1" '
            'xfId="0" applyFill="1" applyBorder="1" applyAlignment="1">'
            '<alignment wrapText="1" vertical="top"/></xf>'
        )
    return _XML_DECL + (
        '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<fonts count=\"2\">"
        '<font><sz val="11"/><name val="Calibri"/></font>'
        '<font><b/><sz val="11"/><name val="Calibri"/></font>'
        "</fonts>"
        f'<fills count="{len(fills)}">{"".join(fills)}</fills>'
        '<borders count="2">'
        "<border><left/><right/><top/><bottom/><diagonal/></border>"
        "<border>"
        '<left style="thin"><color rgb="FF000000"/></left>'
        '<right style="thin"><color rgb="FF000000"/></right>'
        '<top style="thin"><color rgb="FF000000"/></top>'
        '<bottom style="thin"><color rgb="FF000000"/></bottom>'
        "<diagonal/></border>"
        "</borders>"
        f'<cellXfs count="{len(xfs)}">{"".join(xfs)}</cellXfs>'
        "</styleSheet>"
    )


def write_styled_xlsx(
    path: str,
    headers: list[str],
    rows: list[list[str]],
    cell_fills: list[list[str]] | None = None,
) -> None:
    """Write one styled worksheet mirroring the reference export contract.

    ``cell_fills``: optional per-row list of hex colors aligned with
    ``rows``; an empty string falls back to the alternating
    FFFFFF/F0F0F0 row banding (exactly ``alt_colors[(r - 2) % 2]`` in
    the reference).  Header row is bold on D9D9D9 with thin borders;
    pane frozen at A2; auto-filter spans the full range; column width =
    ``max(len) + 2`` over header + data (the reference's width rule).
    """
    n_cols = len(headers)
    str_rows = [[("" if v is None else str(v)) for v in row] for row in rows]
    widths = [len(h) for h in headers]
    for row in str_rows:
        for i, v in enumerate(row[:n_cols]):
            widths[i] = max(widths[i], len(v))

    # unique fill palette in first-use order: header, banding, per-cell
    fill_order: list[str] = [HEADER_FILL, *BAND_FILLS]
    if cell_fills:
        for frow in cell_fills:
            for h in frow:
                if h and h.lstrip("#").upper() not in (
                    c.upper() for c in fill_order
                ):
                    fill_order.append(h.lstrip("#").upper())
    data_xf = {  # color → DATA cellXfs index (xf 0 default, xf 1 header,
        #           then one data xf per palette color incl. the header gray)
        h.upper(): 2 + i for i, h in enumerate(fill_order)
    }

    last = f"{col_letter(n_cols)}{len(str_rows) + 1}"
    cols = "".join(
        f'<col min="{i + 1}" max="{i + 1}" width="{w + 2}" customWidth="1"/>'
        for i, w in enumerate(widths)
    )
    body = [
        "<row r=\"1\">"
        + "".join(
            f'<c r="{col_letter(c + 1)}1" s="1" t="inlineStr">'
            f"<is><t xml:space=\"preserve\">{escape(h)}</t></is></c>"
            for c, h in enumerate(headers)
        )
        + "</row>"
    ]
    for r, row in enumerate(str_rows, start=2):
        band = BAND_FILLS[(r - 2) % 2]
        # missing fill ROWS fall back to banding exactly like missing
        # fill COLUMNS do — a partial fills list must not crash mid-write
        frow = (
            cell_fills[r - 2]
            if cell_fills and r - 2 < len(cell_fills)
            else []
        )
        cells = []
        for c in range(n_cols):
            v = row[c] if c < len(row) else ""
            fill = frow[c].lstrip("#").upper() if c < len(frow) else ""
            xf = data_xf[fill or band]
            cells.append(
                f'<c r="{col_letter(c + 1)}{r}" s="{xf}" t="inlineStr">'
                f"<is><t xml:space=\"preserve\">{escape(v)}</t></is></c>"
            )
        body.append(f'<row r="{r}">{"".join(cells)}</row>')

    sheet = _XML_DECL + (
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f'<dimension ref="A1:{last}"/>'
        "<sheetViews><sheetView workbookViewId=\"0\">"
        '<pane ySplit="1" topLeftCell="A2" activePane="bottomLeft" state="frozen"/>'
        "</sheetView></sheetViews>"
        f"<cols>{cols}</cols>"
        f'<sheetData>{"".join(body)}</sheetData>'
        f'<autoFilter ref="A1:{last}"/>'
        "</worksheet>"
    )

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/styles.xml", _styles_xml(fill_order))
        z.writestr("xl/worksheets/sheet1.xml", sheet)

"""Minimal PDF writer + text extractor (the "Poppler tier").

The reference shells out to Poppler ``pdftoppm`` to rasterise pages
(processing/ocr.py:177-190) and Tesseract to recover text; neither binary
exists in this sandbox and neither is reproducible across builds (SURVEY.md
§7 "OCR binary nondeterminism").  What IS deterministic — and what the
pipeline contract needs — is the page decomposition and per-page text
recovery.  This module implements both over real PDF structure:

* :func:`build_pdf` emits a syntactically valid single-xref PDF 1.7 with
  one uncompressed content stream per page, text drawn via ``Tj``
  operators.  Used by the corpus generator.
* :func:`pdf_page_texts` is a from-scratch content-stream text extractor:
  it walks the ``Pages`` tree order (by object appearance), tokenises each
  content stream, and reassembles the drawn strings — ``Tj``/``TJ``/``'``
  with PDF string escapes (backslash escapes + octal) — inserting newlines
  on text-line advances (``Td``/``TD``/``T*``).

Rasterised/image-only pages would need a real OCR engine; that hook is
:func:`ocr_page_image`, stubbed with ``NotImplementedError`` and clearly
marked (container has no tesseract).
"""

from __future__ import annotations

import re


def _escape_pdf_string(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_pdf(pages: list[list[str]]) -> bytes:
    """Build a valid minimal PDF; ``pages`` is a list of line-lists.

    Each page renders its lines as successive ``Tj`` text runs separated
    by ``Td`` line advances.  Text is Latin-1-escaped into the stream as
    UTF-8 bytes (a private convention the extractor mirrors; real PDFs
    would use font encodings — out of scope for a text-layer corpus).
    """
    objects: list[bytes] = []
    n_pages = len(pages)
    # obj 1: catalog, obj 2: pages root; page i -> obj 3+2i, content -> 4+2i
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    for i, lines in enumerate(pages):
        page_obj = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {4 + 2 * i} 0 R /Resources << /Font << /F1 5 0 R >> >> >>"
        )
        ops = ["BT", "/F1 12 Tf", "72 720 Td"]
        for j, line in enumerate(lines):
            if j > 0:
                ops.append("0 -14 Td")
            ops.append(f"({_escape_pdf_string(line)}) Tj")
        ops.append("ET")
        stream = "\n".join(ops).encode("utf-8")
        content_obj = (
            f"<< /Length {len(stream)} >>\nstream\n".encode() + stream + b"\nendstream"
        )
        objects.append(page_obj.encode())
        objects.append(content_obj)
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.7\n")
    offsets = [0]
    for num, body in enumerate(objects, 1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)

# Content-stream tokens we care about: PDF strings and operators.
_STRING_OR_OP = re.compile(
    rb"\((?P<str>(?:\\.|[^\\()])*)\)\s*(?P<strop>Tj|')"  # (..) Tj  /  (..) '
    rb"|\[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ"                 # [ .. ] TJ
    rb"|(?P<lineop>T\*|Td|TD)",                             # line advances
    re.DOTALL,
)
_ARRAY_STRING = re.compile(rb"\((?:\\.|[^\\()])*\)", re.DOTALL)
_OCTAL = re.compile(rb"\\([0-7]{1,3})")


def _decode_pdf_string(raw: bytes) -> bytes:
    if b"\\" not in raw:  # fast path: nothing to unescape
        return raw
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i]
        if c != 0x5C:  # backslash
            out.append(c)
            i += 1
            continue
        if i + 1 >= len(raw):
            break
        nxt = raw[i + 1]
        simple = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08, 0x66: 0x0C,
                  0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}
        if nxt in simple:
            out.append(simple[nxt])
            i += 2
            continue
        m = _OCTAL.match(raw, i)
        if m:
            out.append(int(m.group(1), 8) & 0xFF)
            i = m.end()
            continue
        # line-continuation backslash or unknown escape: drop the backslash
        out.append(nxt)
        i += 2
    return bytes(out)


# Per-stream parse memo: scanned/OCR corpora repeat page content streams
# (blank pages, stamped headers, and the corpus's ×500 repeated-page skew
# documents tile ONE stream hundreds of times inside a payload).  Pure
# function of the stream bytes → byte-identity unaffected.  Bounded by
# RETAINED BYTES, not entry count: an entry-count cap with 16 KB keys
# admits ~256 MB of keys per Python worker, and local[32] runs one worker
# per core — several GB per host (round-3 ADVICE).  32 MB × 32 workers
# = 1 GB/host worst case, inside the executor Python memory share.
_STREAM_MEMO: dict[bytes, str | None] = {}
_STREAM_MEMO_MAX_BYTES = 1 << 14   # per-stream admission cap
_STREAM_MEMO_BUDGET = 32 << 20     # total retained key+value bytes/worker
_stream_memo_bytes = 0             # running retained-size accumulator


def _parse_stream(stream: bytes) -> str | None:
    """One content stream → page text (None when it emits no lines).

    Within a page, consecutive ``Tj`` runs on the same text line
    concatenate; ``Td`` / ``TD`` / ``T*`` after at least one run starts a
    new line."""
    lines: list[bytes] = []
    current = bytearray()
    emitted_on_line = False
    for tok in _STRING_OR_OP.finditer(stream):
        grp = tok.lastgroup
        if grp is None:
            # lastgroup skips groups that matched EMPTY (e.g. '[]TJ' /
            # '()Tj') — probe explicitly so empty runs still mark the line
            # as emitted, exactly like the group-by-group original
            if tok.group("arr") is not None:
                grp = "arr"
            elif tok.group("strop") is not None:
                grp = "strop"
            elif tok.group("lineop") is not None:
                grp = "lineop"
        if grp == "lineop":
            if emitted_on_line:
                lines.append(bytes(current))
                current = bytearray()
                emitted_on_line = False
            continue
        if grp == "strop":
            current += _decode_pdf_string(tok.group("str"))
            emitted_on_line = True
        elif grp == "arr":
            for s in _ARRAY_STRING.finditer(tok.group("arr")):
                current += _decode_pdf_string(s.group(0)[1:-1])
            emitted_on_line = True
    if emitted_on_line or current:
        lines.append(bytes(current))
    if not lines:
        return None
    return b"\n".join(lines).decode("utf-8", errors="ignore")


def pdf_page_texts(payload: bytes) -> list[str]:
    """Extract per-page text from a PDF byte payload.

    Pages are content streams in order of appearance.  Malformed payloads
    raise ``ValueError`` (callers convert errors to data rows).
    """
    if not payload.lstrip().startswith(b"%PDF-"):
        raise ValueError("not a PDF payload (missing %PDF- magic)")
    pages: list[str] = []
    for m in _STREAM_RE.finditer(payload):
        stream = m.group(1)
        if len(stream) <= _STREAM_MEMO_MAX_BYTES:
            try:
                text = _STREAM_MEMO[stream]
            except KeyError:
                global _stream_memo_bytes
                text = _parse_stream(stream)
                size = len(stream) + 2 * len(text or "")  # key + ~UTF-16 str
                if _stream_memo_bytes + size > _STREAM_MEMO_BUDGET:
                    _STREAM_MEMO.clear()
                    _stream_memo_bytes = 0
                _STREAM_MEMO[stream] = text
                _stream_memo_bytes += size
        else:
            text = _parse_stream(stream)
        if text is not None:
            pages.append(text)
    return pages


_COUNT_RE = re.compile(rb"/Type\s*/Pages\b[^>]*?/Count\s+(\d+)")
_PAGE_OBJ_RE = re.compile(rb"/Type\s*/Page\b")


def pdf_page_count(payload: bytes) -> int:
    """Page-count probe (S3 — the ``pdfinfo`` "Pages" analog,
    processing/ocr.py:264-288): prefer the Pages-tree ``/Count``, fall
    back to counting page objects; 0 for unparseable payloads (the
    reference returns 0 on any probe error)."""
    try:
        m = _COUNT_RE.search(payload)
        if m:
            return int(m.group(1))
        return sum(1 for _ in _PAGE_OBJ_RE.finditer(payload))
    except Exception:
        return 0


def rasterize_pdf_page(payload: bytes, page: int = 1, dpi: int = 200) -> bytes:
    """Rasterise one PDF page to PNG via Poppler ``pdftoppm`` — the
    reference's rasterisation step (processing/ocr.py:177-190) as a
    subprocess over stdin/stdout.  Requires the cluster image
    (docker/Dockerfile.cluster); raises ``NotImplementedError`` where the
    binary is absent so callers keep the text-layer path."""
    import shutil
    import subprocess

    if shutil.which("pdftoppm") is None:
        raise NotImplementedError(
            "pdftoppm (poppler-utils) not present in this sandbox — "
            "use the text-layer path or the cluster image"
        )
    proc = subprocess.run(
        ["pdftoppm", "-png", "-r", str(dpi), "-f", str(page), "-l", str(page), "-"],
        input=payload,
        capture_output=True,
        check=True,
    )
    return proc.stdout


def ocr_page_image(image_bytes: bytes, lang: str = "pol", config: str = "") -> str:
    """OCR for rasterised/image-only pages via Tesseract
    (processing/ocr.py:91-104's engine call as a stdin/stdout subprocess;
    one process per page, which on a cluster runs inside the extraction
    task's already-parallel partition).

    Where the binary is absent (this sandbox) raises
    ``NotImplementedError`` — the deterministic corpus carries its text
    layer in content streams instead, and the integration contract runs
    only on the cluster image (tests/test_cluster_image.py,
    docker/Dockerfile.cluster)."""
    import shutil
    import subprocess

    if shutil.which("tesseract") is None:
        raise NotImplementedError(
            "image OCR requires tesseract binaries not present in this sandbox"
        )
    cmd = ["tesseract", "stdin", "stdout", "-l", lang]
    if config:
        cmd += config.split()
    proc = subprocess.run(cmd, input=image_bytes, capture_output=True, check=True)
    return proc.stdout.decode("utf-8", errors="ignore").strip()

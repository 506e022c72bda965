"""Byte-stream format sniffer (north-rule: batched PDF-vs-HTML dispatch).

The reference dispatches on file extension (``*.pdf`` glob,
gui/processing_worker.py:373); a Common-Crawl payload column has no
extension, so dispatch is on magic bytes — ``%PDF-`` per the PDF spec,
markup detection otherwise.
"""

from __future__ import annotations

PDF_MAGIC = b"%PDF-"

FORMAT_PDF = "pdf"
FORMAT_HTML = "html"
FORMAT_TEXT = "text"
FORMAT_EMPTY = "empty"


def sniff_format(payload: bytes | None) -> str:
    """Classify a raw payload as pdf / html / text / empty."""
    if not payload:
        return FORMAT_EMPTY
    if payload[:1024].lstrip()[:5] == PDF_MAGIC or payload[:5] == PDF_MAGIC:
        return FORMAT_PDF
    head = payload[:4096].lstrip().lower()
    if head[:1] == b"<" or b"<html" in head or b"<!doctype" in head:
        return FORMAT_HTML
    # BOM'd payloads hide their markup behind multi-byte encodings
    # (UTF-16 '<' is 3C 00) — decode the head and re-check
    from archvisier_spark.kernel.charset import detect_bom

    codec, bom_len = detect_bom(payload)
    if codec is not None:
        decoded_head = payload[bom_len:4096].decode(codec, errors="ignore")
        stripped = decoded_head.lstrip().lower()
        if stripped[:1] == "<" or "<html" in stripped or "<!doctype" in stripped:
            return FORMAT_HTML
    return FORMAT_TEXT

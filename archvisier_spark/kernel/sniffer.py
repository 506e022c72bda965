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
    return FORMAT_TEXT

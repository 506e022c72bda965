"""Single-document extraction orchestrator — sniff → per-format extract.

Composes the kernel tiers into the reference's per-document contract
``(text, status)`` (processing/ocr.py:146-237, SURVEY.md §1 item 3):

* PDF payloads: page decomposition → per-page text recovery → per-page
  language resolution → dictionary repair → pages concatenated with a
  trailing newline each (processing/ocr.py:227-231: ``full_text +=
  text_page + "\\n"``).
* HTML payloads: node-tree boilerplate strip (north-rule tier).
* Plain text: UTF-8 decode with ``errors="ignore"`` (the naive-read
  fallback, gui/processing_worker.py:383).
* Errors are DATA, never failures: empty PDFs yield the literal
  ``"BŁĄD: Plik PDF jest pusty lub uszkodzony."`` with empty status;
  exceptions yield ``"BŁĄD TECHNICZNY OCR: {e}"`` (processing/ocr.py:192,
  232-237).
"""

from __future__ import annotations

import traceback

from archvisier_spark.kernel.html_extract import extract_main_text
from archvisier_spark.kernel.pdf import pdf_page_texts
from archvisier_spark.kernel.sniffer import (
    FORMAT_EMPTY,
    FORMAT_HTML,
    FORMAT_PDF,
    sniff_format,
)
from archvisier_spark.kernel.textfix import correct_text, detect_lang

STATUS_OK = "Sukces"
EMPTY_PDF_TEXT = "BŁĄD: Plik PDF jest pusty lub uszkodzony."
OCR_ERROR_PREFIX = "BŁĄD TECHNICZNY OCR: "


def extract_pdf_text(payload: bytes, language: str = "auto") -> tuple[str, str]:
    """PDF path: pages → language → repair → concat (+"\\n" per page)."""
    try:
        pages = pdf_page_texts(payload)
        if not pages:
            return EMPTY_PDF_TEXT, ""
        full_text = ""
        for page_text in pages:
            if language == "auto":
                lang = "pol" if detect_lang(page_text) == "pl" else "eng"
            else:
                lang = language
            full_text += correct_text(page_text, lang) + "\n"
        return full_text, STATUS_OK
    except Exception as e:
        return f"{OCR_ERROR_PREFIX}{e}", traceback.format_exc()


def extract_document_text(payload: bytes | None, language: str = "auto") -> tuple[str, str, str]:
    """Dispatch on sniffed format; returns ``(text, status, format)``."""
    fmt = sniff_format(payload)
    if fmt == FORMAT_EMPTY:
        return "", STATUS_OK, fmt
    if fmt == FORMAT_PDF:
        text, status = extract_pdf_text(payload, language)
        return text, status, fmt
    raw = payload.decode("utf-8", errors="ignore")
    if fmt == FORMAT_HTML:
        try:
            return extract_main_text(raw), STATUS_OK, fmt
        except Exception as e:
            return f"{OCR_ERROR_PREFIX}{e}", traceback.format_exc(), fmt
    return raw, STATUS_OK, fmt

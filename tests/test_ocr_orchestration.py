"""Auto-language re-OCR decision contract (processing/ocr.py:208-226).

Ports the reference's orchestration tests (tests/test_ocr.py:96-149) onto
the pluggable per-page OCR hook: the contracts pinned are call SEQUENCE
and arguments (pol+eng probe → detect → single-language re-OCR), not OCR
quality — exactly how the reference tests it with a fake
``image_to_string``.
"""

from archvisier_spark.kernel.document import (
    extract_pdf_text,
    ocr_page_auto,
)
from archvisier_spark.kernel.pdf import build_pdf
from archvisier_spark.kernel.textfix import build_ocr_config


def test_auto_language_two_pass_reference_golden():
    """Port of test_extract_text_with_ocr_auto_language: auto probes with
    pol+eng, detect says 'en', re-OCR runs with 'eng' — same config both
    times (the reference asserts calls[0]/calls[1] literally)."""
    calls = []

    def fake_ocr(page, lang, config):
        calls.append((lang, config))
        return "test"

    cfg = build_ocr_config("", psm=3, oem=3)
    text, lang = ocr_page_auto("PAGE", "auto", fake_ocr,
                               detect_fn=lambda t: "en", config=cfg)
    assert calls[0] == ("pol+eng", "--psm 3 --oem 3")
    assert calls[1] == ("eng", "--psm 3 --oem 3")
    assert text == "test"
    assert lang == "eng"


def test_auto_language_detects_polish():
    calls = []

    def fake_ocr(page, lang, config):
        calls.append(lang)
        return "zażółć"

    _, lang = ocr_page_auto("PAGE", "auto", fake_ocr, detect_fn=lambda t: "pl")
    assert calls == ["pol+eng", "pol"]
    assert lang == "pol"


def test_detect_failure_falls_back_to_polish():
    """processing/ocr.py:216-218: detector exception → 'pol'."""

    def boom(_text):
        raise RuntimeError("langdetect unavailable")

    calls = []
    _, lang = ocr_page_auto(
        "PAGE", "auto",
        lambda p, l, c: calls.append(l) or "x",
        detect_fn=boom,
    )
    assert calls == ["pol+eng", "pol"]
    assert lang == "pol"


def test_fixed_language_single_pass():
    """Explicit language: exactly ONE OCR call, no probe."""
    calls = []
    text, lang = ocr_page_auto(
        "PAGE", "pol", lambda p, l, c: calls.append((l, c)) or "ok", config="--psm 4"
    )
    assert calls == [("pol", "--psm 4")]
    assert (text, lang) == ("ok", "pol")


def test_extract_pdf_auto_reocrs_every_page():
    """End-to-end through a real (text-layer) PDF payload: each page gets
    the probe + re-OCR pair, in page order, and the per-page '\\n' concat
    contract holds."""
    pdf = build_pdf([["strona pierwsza zażółć"], ["second page content"]])
    calls = []

    def fake_ocr(page, lang, config):
        calls.append(lang)
        return page  # text-layer identity, like the sandbox default

    text, status = extract_pdf_text(pdf, language="auto", ocr_fn=fake_ocr)
    assert status == "Sukces"
    # page 1 polish (diacritics), page 2 english
    assert calls == ["pol+eng", "pol", "pol+eng", "eng"]
    assert text.count("\n") == 2


def test_pluggable_ocr_defaults_preserve_text_layer_roundtrip():
    """Default hook (no binaries) must keep the existing byte-identity:
    extract_pdf_text with and without an identity ocr_fn agree."""
    pdf = build_pdf([["Umowa nr 7/2025", "z dnia 2024-03-05"]])
    default_out = extract_pdf_text(pdf, language="auto")
    identity_out = extract_pdf_text(pdf, language="auto", ocr_fn=lambda p, l, c: p)
    assert default_out == identity_out

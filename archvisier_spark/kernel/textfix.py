"""OCR text repair and language detection (X9/X10).

Reimplements the dictionary-repair pass of processing/ocr.py:108-130 and
the diacritics language heuristic of processing/ocr.py:66-70.
"""

from __future__ import annotations

import re

from archvisier_spark.kernel.similarity import levenshtein

# Reference fallback dictionaries (processing/ocr.py:108-109).  Stored as
# sorted tuples so nearest-word ties resolve deterministically — the
# reference iterates a Python set, whose order is hash-seed dependent; a
# fixed order is the only reproducible choice (documented divergence,
# unreachable in the reference's own tests).
POLISH_DICTIONARY: tuple[str, ...] = ("przyklad", "test")
ENGLISH_DICTIONARY: tuple[str, ...] = ("example", "test")

_TOKEN_SPLIT = re.compile(r"(\W+)")
_POLISH_CHARS = frozenset("ąćęłńóśżź")


def _repair_token(token: str, dictionary: tuple[str, ...]) -> str:
    if not token.isalpha():
        return token
    lower = token.lower()
    if lower in dictionary:
        return token
    best = min(dictionary, key=lambda w: levenshtein(lower, w))
    if levenshtein(lower, best) <= 2:
        return best
    return token


def correct_text(text: str, lang: str) -> str:
    """Per-token dictionary repair preserving separators exactly.

    Tokenises with ``re.split(r"(\\W+)")`` (separators kept), replaces any
    alphabetic token within edit distance ≤ 2 of a dictionary word by that
    word (processing/ocr.py:112-130).  ``lang == "pol"`` selects the Polish
    dictionary, anything else English.
    """
    dictionary = POLISH_DICTIONARY if lang == "pol" else ENGLISH_DICTIONARY
    return "".join(_repair_token(t, dictionary) for t in _TOKEN_SPLIT.split(text))


def detect_lang(text: str) -> str:
    """Diacritics heuristic: any of ``ąćęłńóśżź`` → ``pl``, else ``en``
    (processing/ocr.py:66-70)."""
    lowered = text.lower()
    return "pl" if any(ch in _POLISH_CHARS for ch in lowered) else "en"


def tesseract_lang(text: str) -> str:
    """Map detected language to the OCR language code
    (processing/ocr.py:210-218): ``pl → pol``, otherwise ``eng``."""
    return "pol" if detect_lang(text) == "pl" else "eng"


def build_ocr_config(config: str, psm: int, oem: int) -> str:
    """Merge a user OCR config string with psm/oem defaults (X11,
    processing/ocr.py:133-143): append ``--psm``/``--oem`` unless present."""
    parts = []
    config = config.strip()
    if config:
        parts.append(config)
    if "--psm" not in config:
        parts.append(f"--psm {psm}")
    if "--oem" not in config:
        parts.append(f"--oem {oem}")
    return " ".join(parts)

"""Character-span labelling (X18/X19) — the training-data span contract.

Output contract: ``[(start, end, LABEL), ...]`` with character offsets
found by literal substring search, per training_engine.py:48-56,133-148
and 1_Narzedzia_Treningowe/przygotuj_dane_z_rozpisek.py:43-59.
"""

from __future__ import annotations

import re
from typing import Iterator, Mapping, Optional, Tuple

# Training-variant keyword table (training_engine.py:43-46).
TRAINING_DOC_TYPES: dict[str, tuple[str, ...]] = {
    "UMOWA": ("umowa", "umowy"),
    "POROZUMIENIE": ("porozumienie",),
    "PROTOKÓŁ": ("protokół", "protokołu"),
    "ODBIÓR": ("odbiór", "odbioru"),
}

# Excel ground-truth column -> span label (training_engine.py:37-42).
COLUMN_LABELS: dict[str, str] = {
    "Data": "DATA",
    "Nadawca": "ORGANIZACJA",
    "Odbiorca": "ORGANIZACJA",
    "W sprawie": "TYTUL_PISMA",
    "Numer Dokumentu": "NR_DOKUMENTU",
    "Sygnatura Sprawy": "SYGNATURA_SPRAWY",
    "Typ Dokumentu": "TYP_DOKUMENTU",
}


def find_all_occurrences(text: str, sub: str) -> Iterator[int]:
    """Yield start offsets of every non-overlapping literal occurrence,
    advancing by ``len(sub)`` after each hit (training_engine.py:48-56).
    Empty needles yield nothing (the reference never passes one; guarding
    avoids an infinite loop)."""
    if not sub:
        return
    start = 0
    while True:
        start = text.find(sub, start)
        if start == -1:
            return
        yield start
        start += len(sub)


# Precompiled per-keyword patterns (table order IS the semantics), each
# carrying its literal keyword as a C-speed substring gate: a \b-bounded
# regex hit REQUIRES the literal substring, so gating can never change
# the result (same design as smart.py's literal gates; the patterns are
# case-sensitive over the lowered text, so no IGNORECASE fold warts
# apply).  The prefilter is the set of common keyword prefixes — one
# `in` scan per prefix (C memchr) replaces the old alternation regex
# scan, which profiled as the single hottest search in the cascade
# (optimization round r07).
_KEYWORD_PATTERNS: list[tuple[str, str, "re.Pattern[str]"]] = [
    (doc_type, keyword, re.compile(r"\b" + re.escape(keyword) + r"\b"))
    for doc_type, keywords in TRAINING_DOC_TYPES.items()
    for keyword in keywords
]
# shared prefixes: umowa/umowy, porozumienie, protokół/protokołu (diverge
# at the ó/o), odbiór/odbioru (diverge at ó/o)
_KEYWORD_GATE_PREFIXES = ("umow", "porozumienie", "protok", "odbi")


def detect_document_type_span(text: str) -> Tuple[Optional[str], Optional[int], Optional[int]]:
    """First keyword hit over the lowered text with word boundaries,
    returning ``(type, start, end)`` (training_engine.py:58-66)."""
    lowered = text.lower()
    if not any(g in lowered for g in _KEYWORD_GATE_PREFIXES):
        return None, None, None
    for doc_type, keyword, pattern in _KEYWORD_PATTERNS:
        if keyword in lowered:
            m = pattern.search(lowered)
            if m:
                return doc_type, m.start(), m.end()
    return None, None, None


def label_spans(text: str, truth: Mapping[str, str]) -> list[tuple[int, int, str]]:
    """All literal-occurrence spans of each ground-truth cell value, plus
    one document-type span from the keyword table — the complete span set
    of one training record (training_engine.py:133-146)."""
    spans: list[tuple[int, int, str]] = []
    for column, label in COLUMN_LABELS.items():
        value = truth.get(column)
        if not value or not isinstance(value, str):
            continue
        value = value.strip()
        if not value:
            continue
        for start in find_all_occurrences(text, value):
            spans.append((start, start + len(value), label))
    doc_type, start, end = detect_document_type_span(text)
    if doc_type is not None and start is not None and end is not None:
        spans.append((start, end, "TYP_DOKUMENTU"))
    return spans

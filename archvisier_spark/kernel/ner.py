"""Deterministic EntityRuler-equivalent NER tier (X7/X8 step 1).

The reference backfills empty metadata fields from spaCy entities in two
places: inside SmartExtractor (smart_extractor.py:261-276) and as cascade
step 1 (gui/processing_worker.py:186-202).  Its own test builds a
``spacy.blank`` pipeline with an ``EntityRuler`` of literal phrase
patterns (tests/test_smart_extractor.py:22-41) — i.e. the semantics the
reference actually pins are *rule-pattern* NER, not a statistical model.

This module is the from-scratch equivalent of exactly that surface:

* literal phrase patterns ``{"label": L, "pattern": P}``;
* matches respect token boundaries (a phrase never matches inside a word);
* overlapping candidates resolve longest-span-first, ties by earlier
  start (spaCy ``util.filter_spans``), and the winners never overlap;
* entities come back in document order, the order the reference's
  per-label ``" ".join`` depends on.

A ``RuleNer`` instance is a valid ``entity_provider`` for
:func:`archvisier_spark.kernel.cascade.extract_info_from_text` and for
:func:`archvisier_spark.kernel.smart.smart_extract_info`.
"""

from __future__ import annotations

import re
from typing import Iterable, Mapping, Sequence


class RuleNer:
    """Literal-phrase entity matcher with spaCy-EntityRuler semantics."""

    def __init__(self, patterns: Iterable[Mapping[str, str] | tuple[str, str]]):
        self.rules: list[tuple[str, str, re.Pattern]] = []
        for p in patterns:
            if isinstance(p, Mapping):
                label, phrase = p["label"], p["pattern"]
            else:
                label, phrase = p
            # token boundaries: a phrase match may not extend a word on
            # either side (spaCy matches whole tokens); punctuation/space
            # adjacency is fine ("June 15, 2024" next to "\n" matches).
            rx = re.compile(rf"(?<!\w){re.escape(phrase)}(?!\w)")
            self.rules.append((label.upper(), phrase, rx))

    def ents(self, text: str) -> list[tuple[int, int, str, str]]:
        """Non-overlapping entities as (start, end, LABEL, surface),
        sorted by start — the shape of ``doc.ents``."""
        candidates: list[tuple[int, int, str, str]] = []
        for label, _phrase, rx in self.rules:
            for m in rx.finditer(text):
                candidates.append((m.start(), m.end(), label, m.group(0)))
        # spaCy util.filter_spans: longest span first, ties earlier start;
        # greedily keep spans that do not overlap an accepted one.
        candidates.sort(key=lambda c: (-(c[1] - c[0]), c[0]))
        taken: list[tuple[int, int, str, str]] = []
        for cand in candidates:
            if all(cand[1] <= t[0] or cand[0] >= t[1] for t in taken):
                taken.append(cand)
        taken.sort(key=lambda c: c[0])
        return taken

    def __call__(self, text: str) -> dict[str, list[str]]:
        """Entity-provider contract: {LABEL: [surface, ...]} in document
        order (processing_worker.py:190-193 builds exactly this dict)."""
        grouped: dict[str, list[str]] = {}
        for _start, _end, label, surface in self.ents(text):
            grouped.setdefault(label, []).append(surface)
        return grouped


# The label set the reference's cascade consumes
# (processing_worker.py:195-202).
CASCADE_LABELS: tuple[str, ...] = (
    "DATA",
    "ORGANIZACJA",
    "TYTUL_PISMA",
    "NR_DOKUMENTU",
    "TYP_DOKUMENTU",
    "SYGNATURA_SPRAWY",
)


def backfill_from_entities(
    info: dict,
    entities: Mapping[str, Sequence[str]],
    fields_to_labels: Sequence[tuple[str, str]] = (
        ("data", "DATA"),
        ("nadawca_odbiorca", "ORGANIZACJA"),
        ("w_sprawie", "TYTUL_PISMA"),
        ("numer_dokumentu", "NR_DOKUMENTU"),
        ("typ_dokumentu", "TYP_DOKUMENTU"),
    ),
) -> dict:
    """Fill only still-empty fields from label groups, joining surfaces
    with a single space after ``\\n → " "`` flattening — the backfill the
    reference applies inside SmartExtractor (smart_extractor.py:261-276).
    Mutates and returns ``info``."""
    flat = {
        label.upper(): [e.replace("\n", " ").strip() for e in vals]
        for label, vals in entities.items()
    }
    for field, label in fields_to_labels:
        if not info.get(field):
            info[field] = " ".join(flat.get(label, []))
    return info

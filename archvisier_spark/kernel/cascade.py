"""Full metadata-extraction cascade (X8).

From-scratch reimplementation of the reference's layered extractor
(`2_Aplikacja_Glowna/gui/processing_worker.py:173-308`, SURVEY.md §2.3 X8):

  step 1  NER entity groups            (kernel.ner.RuleNer provides an
                                        EntityRuler-equivalent provider;
                                        default = no entities, matching
                                        the reference's blank-model tests)
  step 2  SmartExtractor fills empties
  step 3  raw regexes fill remaining
  step 4  optional LLM fill            (generation out of scope — optional,
                                        non-deterministic; the MERGE
                                        semantics are implemented with a
                                        pluggable llm_tier, incl. the
                                        temat→w_sprawie rename and
                                        extra-key passthrough)
  step 5  empty-field colouring + status

Field order and the ``colors``/``status`` contract are part of the output
schema (SURVEY.md §1 item 4).
"""

from __future__ import annotations

import re
from typing import Callable, Mapping, Sequence

from archvisier_spark.kernel import smart as _smart
from archvisier_spark.kernel.smart import smart_extract_info

# Gate plumbing shared with smart.py (single source of truth): the
# enable flag is read from the module AT CALL TIME so a harness toggling
# smart.GATES_ENABLED flips both tiers together, and the digit probe and
# gate-probe fold (_gate_probe) are the same objects smart.py gates with.
_HAS_DIGIT = _smart._HAS_DIGIT

INFO_FIELDS: tuple[str, ...] = (
    "data",
    "nadawca_odbiorca",
    "w_sprawie",
    "numer_dokumentu",
    "sygnatura_sprawy",
    "typ_dokumentu",
)

# Step-3 raw regexes — processing_worker.py:222-270.
_RAW_DATE_NUMERIC = re.compile(r"\d{1,2}[./-]\d{1,2}[./-]\d{2,4}")
_RAW_DATE_WORDS = re.compile(
    r"\b\d{1,2}\s+(stycznia|lutego|marca|kwietnia|maja|czerwca|lipca|sierpnia|wrze[sś]nia|października|listopada|grudnia)\s+\d{4}\b",
    re.IGNORECASE,
)
_RAW_SENDERS = re.compile(r"^(?:Od|Nadawca)\s*:\s*(.+)$", re.MULTILINE | re.IGNORECASE)
_RAW_RECIPIENTS = re.compile(r"^(?:Do|Adresat)\s*:\s*(.+)$", re.MULTILINE | re.IGNORECASE)
_RAW_NUMBER_PUNCT = re.compile(r"(?:nr|numer)(?:\s+dokumentu)?\s*[:\s-]+([A-Z0-9./\-]+)", re.IGNORECASE)
_RAW_NUMBER_SPACE = re.compile(r"(?:nr|numer)(?:\s+dokumentu)?\s+([A-Z0-9./\-]+)", re.IGNORECASE)
_RAW_SIGNATURE = re.compile(r"(?:sygn\.?\s*akt|sygnatura)\s*[:\s-]*([A-Z0-9./\- ]+)", re.IGNORECASE)

# C-speed literal pre-gates for the step-3 raw regexes (same design as
# smart.py's: every IGNORECASE match contains one of the gate literals,
# so its lowercase form appears in the lowered text — gating skips regex
# scans without ever changing a result).  _RAW_DATE_NUMERIC needs a
# digit; _RAW_SENDERS/_RAW_RECIPIENTS need a ':'.
_RAW_DATE_WORDS_GATES = (
    "stycznia", "lutego", "marca", "kwietnia", "maja", "czerwca", "lipca",
    "sierpnia", "wrzesnia", "września", "października", "listopada",
    "grudnia",
)
_RAW_NUMBER_GATES = ("nr", "numer")
_RAW_SIGNATURE_GATES = ("sygn",)  # covers both 'sygn. akt' and 'sygnatura'

# An entity provider maps text -> {LABEL: [surface, ...]}.  The default
# provider returns no entities, matching the reference test harness
# (tests/test_processing_worker_regex.py:25 uses spacy.blank("pl")).
EntityProvider = Callable[[str], Mapping[str, Sequence[str]]]
# A smart tier maps text -> the 5-field rule-extraction record; pass None
# to disable step 2 (the reference tests stub it to all-empty the same way,
# tests/test_processing_worker_regex.py:11-26).
SmartTier = Callable[[str], Mapping[str, str]]
# An LLM tier maps (text, filename) -> metadata dict (step 4,
# processing_worker.py:271-296).  The generation itself is out of scope
# (optional, non-deterministic); the MERGE semantics are in scope and
# pluggable: known fields fill only when empty ("temat" feeds w_sprawie,
# the X16 key-rename), unknown keys pass through as dynamic fields — the
# producer side of the reference's dynamic-column mechanism
# (pdf_processor_app.py:714-731).
LlmTier = Callable[[str, str], Mapping[str, str]]


def dynamic_label(key: str) -> str:
    """Display label for a dynamic extra key when it is not one of the
    pinned INFO_FIELDS labels (pdf_processor_app.py:726-728)."""
    return key.replace("_", " ").title()


def _no_entities(_text: str) -> Mapping[str, Sequence[str]]:
    return {}


def extract_info_from_text(
    text: str,
    original_filename: str = "",
    mode: str = "KP",
    case_signature_override: str = "",
    entity_provider: EntityProvider | None = None,
    smart_tier: SmartTier | None = smart_extract_info,
    llm_tier: LlmTier | None = None,
) -> dict:
    """Run the full cascade; returns the 7-field info record + colors map.

    Output keys: the six INFO_FIELDS, ``status`` ("OK" or
    "DO UZUPEŁNIENIA"), and ``colors`` mapping each still-empty field to
    "yellow" (processing_worker.py:298-306).
    """
    provider = entity_provider or _no_entities

    info: dict = {
        "data": "",
        "nadawca_odbiorca": "",
        "w_sprawie": "",
        "numer_dokumentu": "",
        "sygnatura_sprawy": case_signature_override,
        "typ_dokumentu": "",
        "status": "OK",
    }

    # Step 1 — NER entity groups, joined with a single space after newline
    # flattening (processing_worker.py:186-202).
    entities = {label.upper(): [e.replace("\n", " ").strip() for e in vals]
                for label, vals in provider(text).items()}
    info["data"] = " ".join(entities.get("DATA", []))
    info["nadawca_odbiorca"] = " ".join(entities.get("ORGANIZACJA", []))
    info["w_sprawie"] = " ".join(entities.get("TYTUL_PISMA", []))
    info["numer_dokumentu"] = " ".join(entities.get("NR_DOKUMENTU", []))
    info["typ_dokumentu"] = " ".join(entities.get("TYP_DOKUMENTU", []))
    if not info["sygnatura_sprawy"]:
        info["sygnatura_sprawy"] = " ".join(entities.get("SYGNATURA_SPRAWY", []))

    # Step 2 — rule tier fills fields that are still empty
    # (processing_worker.py:207-219).
    if smart_tier is not None:
        smart = smart_tier(text)
        for field in ("data", "nadawca_odbiorca", "w_sprawie", "numer_dokumentu", "typ_dokumentu"):
            if not info[field]:
                info[field] = smart.get(field, "")

    # Step 3 — raw regexes for the remaining gaps
    # (processing_worker.py:221-270), each behind its literal pre-gate;
    # the gate-probe string (lowered text + IGNORECASE's residual folds,
    # smart._gate_probe) is computed at most once, and only when a gated
    # field that probes it is still empty.
    gates_on = _smart.GATES_ENABLED
    low: str | None = None
    if gates_on and not (info["data"] and info["numer_dokumentu"]
                         and info["sygnatura_sprawy"]):
        low = _smart._gate_probe(text.lower())

    if not info["data"]:
        m = None
        if not gates_on or _HAS_DIGIT.search(text):
            m = _RAW_DATE_NUMERIC.search(text)
        if not m and (not gates_on
                      or any(g in low for g in _RAW_DATE_WORDS_GATES)):
            m = _RAW_DATE_WORDS.search(text)
        if m:
            info["data"] = m.group(0)

    if not info["nadawca_odbiorca"] and (not gates_on or ":" in text):
        parties = [s.strip() for s in _RAW_SENDERS.findall(text) + _RAW_RECIPIENTS.findall(text)]
        if parties:
            info["nadawca_odbiorca"] = " ".join(parties)

    if not info["numer_dokumentu"] and (
            not gates_on or any(g in low for g in _RAW_NUMBER_GATES)):
        m = _RAW_NUMBER_PUNCT.search(text) or _RAW_NUMBER_SPACE.search(text)
        if m:
            info["numer_dokumentu"] = m.group(1).strip()

    if not info["sygnatura_sprawy"] and (
            not gates_on or any(g in low for g in _RAW_SIGNATURE_GATES)):
        m = _RAW_SIGNATURE.search(text)
        if m:
            info["sygnatura_sprawy"] = m.group(1).strip()

    # Step 4 — optional LLM fill (processing_worker.py:271-296): each known
    # field fills only when still empty; the LLM's "temat" key feeds
    # w_sprawie (the X16 rename, ml_helper.py:377-380); tier errors skip
    # the step (logged-and-continue in the reference).  Keys outside the
    # core record pass through as dynamic fields — the reference's
    # dynamic-column discovery (pdf_processor_app.py:714-731) reads
    # arbitrary info keys, and this is the pluggable producer for them.
    if llm_tier is not None:
        try:
            llm = llm_tier(text, original_filename) or {}
        except Exception:
            llm = {}
        if not info["typ_dokumentu"] and llm.get("typ_dokumentu"):
            info["typ_dokumentu"] = llm["typ_dokumentu"]
        if not info["data"] and llm.get("data"):
            info["data"] = llm["data"]
        if not info["w_sprawie"] and llm.get("temat"):
            info["w_sprawie"] = llm["temat"]
        if not info["nadawca_odbiorca"] and llm.get("nadawca_odbiorca"):
            info["nadawca_odbiorca"] = llm["nadawca_odbiorca"]
        if not info["numer_dokumentu"] and llm.get("numer_dokumentu"):
            info["numer_dokumentu"] = llm["numer_dokumentu"]
        for key, value in llm.items():
            if key not in info and key != "temat":
                info[key] = value

    # Step 5 — empty-field colouring + status.  The loop runs over ALL
    # info keys (processing_worker.py:299-301), so empty dynamic extras
    # are flagged exactly like core fields.
    colors: dict[str, str] = {}
    for key, value in info.items():
        if key != "status" and not value:
            colors[key] = "yellow"
    if colors:
        info["status"] = "DO UZUPEŁNIENIA"
    info["colors"] = colors
    return info

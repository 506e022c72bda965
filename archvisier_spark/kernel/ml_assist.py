"""LLM-assist plumbing tier (X16/X17/A4) — the deterministic parts.

The reference's LLM step itself is out of engine scope (optional heavy
dependency, non-deterministic generation — SURVEY.md §7); what IS part of
the data plane is everything around it, reimplemented here from observed
behaviour of ``2_Aplikacja_Glowna/ml_helper.py``:

* :func:`repair_and_parse_json` — X16: locate the first ``{...}`` blob
  (DOTALL), strip invalid backslash escapes, parse, rename ``temat`` →
  ``w_sprawie`` (ml_helper.py:276-287).
* :func:`validate_metadata` — X17: five fields must be strings; a
  non-empty ``data`` must match ``^\\d{4}-\\d{2}-\\d{2}$``
  (ml_helper.py:311-323).
* :func:`quality_score` — A4: fraction of the five fields non-empty
  (ml_helper.py:325-329).
"""

from __future__ import annotations

import json
import re
from typing import Mapping, Optional

METADATA_KEYS = ("typ_dokumentu", "data", "nadawca_odbiorca", "w_sprawie", "numer_dokumentu")

_JSON_BLOB = re.compile(r"(\{.*\})", re.DOTALL)
_BAD_ESCAPE = re.compile(r'\\(?!["\\/bfnrt]|u[0-9a-fA-F]{4})')
_ISO_DATE = re.compile(r"^\d{4}-\d{2}-\d{2}$")


def repair_and_parse_json(response: str) -> Optional[dict]:
    """Extract + repair + parse a JSON object from free-form model output.

    Returns None when no parseable dict is found (the reference logs and
    returns None on JSONDecodeError / non-dict results)."""
    try:
        m = _JSON_BLOB.search(response)
        if m:
            json_text = _BAD_ESCAPE.sub("", m.group(1))
            metadata = json.loads(json_text)
        else:
            metadata = json.loads(response)
    except json.JSONDecodeError:
        return None
    if not isinstance(metadata, dict):
        return None
    if "temat" in metadata and "w_sprawie" not in metadata:
        metadata["w_sprawie"] = metadata.pop("temat")
    return metadata


def validate_metadata(metadata: Mapping) -> bool:
    """All five fields strings; non-empty date must be ISO YYYY-MM-DD."""
    for key in METADATA_KEYS:
        value = metadata.get(key, "")
        if not isinstance(value, str):
            return False
        if key == "data" and value and not _ISO_DATE.match(value):
            return False
    return True


def quality_score(metadata: Mapping) -> float:
    """Fraction of the five metadata fields that are non-empty."""
    filled = sum(1 for k in METADATA_KEYS if metadata.get(k))
    return filled / len(METADATA_KEYS)


def llm_tier_from_raw(generate_fn):
    """Compose a cascade step-4 ``llm_tier`` from a raw text generator:
    generation → X16 repair/parse → X17 validation gate; unparseable or
    invalid output → ``{}`` (the step is skipped), mirroring ml_helper's
    None-on-failure contract (ml_helper.py:276-309).

    Reference quirk, preserved deliberately: X16's repair renames
    ``temat`` → ``w_sprawie`` (ml_helper.py:286-287) while the worker
    merge reads the RAW ``temat`` key (processing_worker.py:284) — so a
    subject arriving through this repaired path never fills ``w_sprawie``
    (and is not duplicated as an extra, since ``w_sprawie`` is a core
    key).  Pinned by tests/test_llm_tier.py."""

    def tier(text: str, filename: str) -> dict:
        meta = repair_and_parse_json(generate_fn(text, filename) or "")
        if meta is None or not validate_metadata(meta):
            return {}
        return meta

    return tier

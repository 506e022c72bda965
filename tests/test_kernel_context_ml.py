"""Golden tests for the context-memory and LLM-assist kernel tiers
(values verified byte-identical against the reference implementations)."""

import pytest

from archvisier_spark.kernel.context import (
    apply_contextual_corrections,
    encode_text_stub,
    find_relevant_correction,
    find_similar_documents,
    retain_memory,
)
from archvisier_spark.kernel.ml_assist import (
    quality_score,
    repair_and_parse_json,
    validate_metadata,
)


# --- K5 embedding stub (context_analyzer.py:51-59) ---

def test_encode_stub_deterministic_and_seeded_by_ord_sum():
    a = encode_text_stub("abc")
    assert a == encode_text_stub("abc")
    assert len(a) == 3
    # seed is sum(ord) → anagrams collide (a documented stub property)
    assert encode_text_stub("abc") == encode_text_stub("cba")
    assert encode_text_stub("abd") != a


# --- J2 similar-docs recall (context_analyzer.py:230-262) ---

FRAGS = [
    "dokument o jabłkach i gruszkach",
    "umowa na dostawę gazu ziemnego",
    "protokół odbioru robót",
    "faktura za usługi",
]


def test_find_similar_documents_golden():
    got = find_similar_documents(FRAGS, "dokument o jablkach i gruszkach")
    assert [i for i, _ in got] == [0, 2, 3]  # verified against reference
    assert all(s > 0.2 for _, s in got)
    assert got[0][1] == pytest.approx(0.932559046644, abs=1e-10)


def test_find_similar_documents_needs_two_docs():
    assert find_similar_documents(["only one"], "x") == []


# --- J3 correction argmax (context_analyzer.py:267-293) ---

CORRECTIONS = [
    {"text_fragment": "dokument o jabłkach i gruszkach",
     "changed_fields": {"typ_dokumentu": {"original": "", "corrected": "UMOWA"}}},
    {"text_fragment": "zupełnie inny tekst o rybach",
     "changed_fields": {"typ_dokumentu": {"original": "", "corrected": "FAKTURA"}}},
]


def test_find_relevant_correction_accepts_at_07():
    assert find_relevant_correction(CORRECTIONS, "dokument o jablkach i gruszkach", "typ_dokumentu") == "UMOWA"


def test_find_relevant_correction_rejects_dissimilar():
    assert find_relevant_correction(CORRECTIONS, "xyz", "typ_dokumentu") is None
    assert find_relevant_correction(CORRECTIONS, "x", "inne_pole") is None


def test_apply_contextual_corrections_fills_short_fields():
    out = apply_contextual_corrections(
        {"typ_dokumentu": "", "data": "2024-01-01"},
        "dokument o jablkach i gruszkach",
        CORRECTIONS,
    )
    assert out["typ_dokumentu"] == "UMOWA"
    assert out["data"] == "2024-01-01"  # non-empty long field untouched


def test_retain_memory_caps():
    docs, corr = retain_memory(list(range(150)), list(range(250)))
    assert len(docs) == 100 and docs[0] == 50
    assert len(corr) == 200 and corr[0] == 50


# --- X16 JSON repair (ml_helper.py:276-287) ---

def test_repair_json_extracts_blob_and_renames_temat():
    md = repair_and_parse_json('Sure! {"typ_dokumentu": "UMOWA", "temat": "dostawa"} done')
    assert md == {"typ_dokumentu": "UMOWA", "w_sprawie": "dostawa"}


def test_repair_json_drops_invalid_escapes():
    md = repair_and_parse_json('{"data": "2024-01-02", "k": "x\\y"}')
    assert md == {"data": "2024-01-02", "k": "xy"}


def test_repair_json_keeps_valid_unicode_escape():
    assert repair_and_parse_json('{"u": "\\u0105"}') == {"u": "ą"}


def test_repair_json_failures_return_none():
    assert repair_and_parse_json("no json here") is None
    assert repair_and_parse_json("[1,2,3]") is None
    assert repair_and_parse_json("{broken") is None


def test_repair_json_temat_not_renamed_when_w_sprawie_present():
    assert repair_and_parse_json('{"temat": "a", "w_sprawie": "b"}') == {"temat": "a", "w_sprawie": "b"}


# --- X17 validation + A4 quality (ml_helper.py:311-329) ---

def test_validate_metadata_iso_date_rule():
    base = {k: "" for k in ("typ_dokumentu", "data", "nadawca_odbiorca", "w_sprawie", "numer_dokumentu")}
    assert validate_metadata(base)
    assert validate_metadata({**base, "data": "2024-03-05"})
    assert not validate_metadata({**base, "data": "05-03-2024"})
    assert not validate_metadata({**base, "data": "2024-3-05"})
    assert not validate_metadata({**base, "typ_dokumentu": 123})


def test_quality_score_fraction():
    base = {k: "" for k in ("typ_dokumentu", "data", "nadawca_odbiorca", "w_sprawie", "numer_dokumentu")}
    assert quality_score(base) == 0.0
    assert quality_score({**base, "data": "x", "typ_dokumentu": "y"}) == pytest.approx(0.4)

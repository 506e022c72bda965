"""Step-4 LLM merge semantics + dynamic extra-key columns.

The LLM generation is out of scope (optional dependency,
non-deterministic); what IS reference semantics — and pinned here — is
the MERGE (processing_worker.py:271-296: fill-only-empty per field, the
"temat"→w_sprawie rename, errors skip the step) and the dynamic-column
mechanism (pdf_processor_app.py:714-731: info keys beyond the core set
surface as columns; our schema-stable form is the ``extra`` MAP).
"""

from archvisier_spark.kernel.cascade import dynamic_label, extract_info_from_text


def _llm(meta):
    return lambda text, fname: meta


def test_llm_fills_only_empty_fields():
    # rules extract the number; LLM must not override it, but fills the
    # empty date
    text = "Numer dokumentu: ABC-1/2024"
    info = extract_info_from_text(
        text, "a.pdf", "KP", smart_tier=None,
        llm_tier=_llm({"numer_dokumentu": "XXX", "data": "2024-01-02"}),
    )
    assert info["numer_dokumentu"] == "ABC-1/2024"   # rule wins
    assert info["data"] == "2024-01-02"              # LLM fills the gap


def test_llm_temat_renames_to_w_sprawie():
    info = extract_info_from_text(
        "puste", "a.pdf", "KP", smart_tier=None,
        llm_tier=_llm({"temat": "dostawa sprzętu"}),
    )
    assert info["w_sprawie"] == "dostawa sprzętu"
    assert "temat" not in info                      # renamed, not duplicated


def test_llm_extra_keys_pass_through_and_get_colored():
    info = extract_info_from_text(
        "puste", "a.pdf", "KP", smart_tier=None,
        llm_tier=_llm({"osoba_kontaktowa": "Jan Nowak", "priorytet": ""}),
    )
    assert info["osoba_kontaktowa"] == "Jan Nowak"
    # step 5 iterates ALL info keys: the empty extra is flagged like a
    # core field (processing_worker.py:299-301)
    assert info["colors"]["priorytet"] == "yellow"
    assert info["status"] == "DO UZUPEŁNIENIA"


def test_llm_errors_skip_the_step():
    def boom(text, fname):
        raise RuntimeError("model offline")

    info = extract_info_from_text("Numer dokumentu: B-2", "a.pdf", "KP",
                                  smart_tier=None, llm_tier=boom)
    assert info["numer_dokumentu"] == "B-2"


def test_dynamic_label_golden():
    # pdf_processor_app.py:726-728: key.replace("_", " ").title()
    assert dynamic_label("osoba_kontaktowa") == "Osoba Kontaktowa"
    assert dynamic_label("priorytet") == "Priorytet"


def test_pipeline_extra_map_column(spark):
    from archvisier_spark.corpus import corpus_df
    from archvisier_spark.pipeline.extract import extract_documents

    docs = corpus_df(spark, 8, seed=21, partitions=2)
    out = extract_documents(
        docs, llm_tier=_llm({"zrodlo": "llm", "temat": "nadpisany temat"})
    )
    rows = out.collect()
    assert "extra" in out.columns
    for r in rows:
        assert dict(r["extra"]).get("zrodlo") == "llm"
        assert "temat" not in dict(r["extra"])

    # default path: schema present, map empty
    plain = extract_documents(docs).limit(3).collect()
    for r in plain:
        assert dict(r["extra"]) == {}


# --- X16/X17 → step-4 composition (llm_tier_from_raw) ---

def test_llm_tier_from_raw_repairs_and_merges():
    from archvisier_spark.kernel.ml_assist import llm_tier_from_raw

    raw = (
        'Here is the result:\n```json\n'
        '{"data": "2024-03-05", "numer_dokumentu": "FV\\q 9/24"}\n```'
    )  # \q is an invalid escape the X16 repair must strip
    tier = llm_tier_from_raw(lambda text, fname: raw)
    info = extract_info_from_text("puste", "a.pdf", "KP",
                                  smart_tier=None, llm_tier=tier)
    assert info["data"] == "2024-03-05"
    assert info["numer_dokumentu"] == "FVq 9/24"


def test_llm_tier_from_raw_invalid_date_gates_whole_payload():
    from archvisier_spark.kernel.ml_assist import llm_tier_from_raw

    tier = llm_tier_from_raw(lambda t, f: '{"data": "05.03.2024"}')  # not ISO
    info = extract_info_from_text("puste", "a.pdf", "KP",
                                  smart_tier=None, llm_tier=tier)
    assert info["data"] == ""  # X17 rejects → step skipped


def test_temat_repair_quirk_preserved():
    """X16 renames temat→w_sprawie; the worker merge reads raw 'temat'
    (processing_worker.py:284) — so the repaired path never fills
    w_sprawie.  Reference behaviour, pinned."""
    from archvisier_spark.kernel.ml_assist import llm_tier_from_raw

    tier = llm_tier_from_raw(lambda t, f: '{"temat": "dostawa sprzętu"}')
    info = extract_info_from_text("puste", "a.pdf", "KP",
                                  smart_tier=None, llm_tier=tier)
    assert info["w_sprawie"] == ""          # not filled through repair
    assert "temat" not in info
    # the RAW-dict path (no repair) does fill it — the worker contract
    info2 = extract_info_from_text("puste", "a.pdf", "KP", smart_tier=None,
                                   llm_tier=lambda t, f: {"temat": "dostawa"})
    assert info2["w_sprawie"] == "dostawa"


def test_llm_tier_from_raw_garbage_is_skipped():
    from archvisier_spark.kernel.ml_assist import llm_tier_from_raw

    tier = llm_tier_from_raw(lambda t, f: "no json here at all")
    info = extract_info_from_text("Numer dokumentu: B-7", "a.pdf", "KP",
                                  smart_tier=None, llm_tier=tier)
    assert info["numer_dokumentu"] == "B-7"

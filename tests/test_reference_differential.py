"""Differential fuzz against the ACTUAL reference implementations.

These tests import the reference's pure modules (and compile its C
kernel) straight from /root/reference when present, and assert
byte-identity of our kernel on thousands of randomized inputs — the
strongest form of the parity contract.  They skip cleanly outside the
sandbox (no reference tree / no compiler).
"""

import ctypes
import random
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference tree absent")


def _stub_dir() -> str:
    """The reference's tests/stubs also fakes numpy/pandas — prepending it
    wholesale would shadow the REAL libraries for every later test in the
    process.  Expose only the stubs the reference's optional heavy imports
    need (spacy, pdf2image, pytesseract, cv2, custom_pil) via symlinks in
    a temp dir."""
    d = tempfile.mkdtemp(prefix="refstubs_")
    for name in ("spacy", "pdf2image", "pytesseract", "cv2", "custom_pil"):
        src = REF / "tests" / "stubs" / name
        if src.exists():
            (Path(d) / name).symlink_to(src)
    return d

WORDS = [
    "umowa", "nr", "faktura", "dnia", "2024-03-05", "12.05.2024",
    "3 stycznia 2022", "Od:", "Do:", "dotyczy:", "sygn. akt: VII K 123/20",
    "MINISTERSTWO FINANSÓW SP. Z O.O.", "ul. Polna 1, Warszawa 00-123",
    "invoice", "no. 77/A", "subject: delivery of goods", "zażółć", "gęślą",
    "\n", "  ", ".", ",", "protokół", "zaświadczenie", "temat: spotkanie",
    "number 123", "June 15, 2024", "Minutes",
]


def _texts(seed: int, n: int):
    rng = random.Random(seed)
    for _ in range(n):
        yield " ".join(rng.choice(WORDS) for _ in range(rng.randint(0, 14)))


@pytest.fixture(scope="module")
def ref_smart():
    sys.path.insert(0, str(REF / "2_Aplikacja_Glowna" / "SmartExtractor"))
    from smart_extractor import SmartExtractor

    return SmartExtractor


def test_smart_tier_byte_identical(ref_smart):
    from archvisier_spark.kernel.smart import smart_extract_info

    ref = ref_smart(nlp_model=None)
    for text in _texts(99, 2000):
        assert dict(ref.extract_info(text)) == dict(smart_extract_info(text)), repr(text)


def test_smart_ner_backfill_byte_identical(ref_smart):
    """Our RuleNer entities fed into the reference's own ``if self.nlp``
    branch must yield exactly what our entity_provider path yields."""
    from archvisier_spark.kernel.ner import RuleNer
    from archvisier_spark.kernel.smart import smart_extract_info

    class FakeEnt:
        def __init__(self, label, text):
            self.label_ = label
            self.text = text

    class FakeDoc:
        def __init__(self, ents):
            self.ents = ents

    class FakeNlp:
        def __init__(self, ruler):
            self.ruler = ruler

        def __call__(self, text):
            return FakeDoc([FakeEnt(l, s) for (_a, _b, l, s) in self.ruler.ents(text)])

    ruler = RuleNer([
        ("DATA", "June 15, 2024"), ("ORGANIZACJA", "MINISTERSTWO"),
        ("TYTUL_PISMA", "delivery of goods"), ("NR_DOKUMENTU", "123"),
        ("TYP_DOKUMENTU", "Minutes"),
    ])
    ref = ref_smart(nlp_model=FakeNlp(ruler))
    for text in _texts(77, 2000):
        assert dict(ref.extract_info(text)) == dict(
            smart_extract_info(text, entity_provider=ruler)
        ), repr(text)


@pytest.mark.skipif(shutil.which("gcc") is None, reason="no C compiler")
def test_token_similarity_byte_identical_to_compiled_c(tmp_path):
    """Includes \\x0b/\\x0c separators — the strtok-vs-str.split divergence
    the round-2 tokenizer fix closed."""
    so = tmp_path / "tokensim.so"
    subprocess.run(
        ["gcc", "-O2", "-shared", "-fPIC", "-o", str(so),
         str(REF / "native_c" / "token_similarity.c"), "-I", str(REF / "native_c")],
        check=True,
    )
    lib = ctypes.CDLL(str(so))
    lib.token_similarity.restype = ctypes.c_double
    lib.token_similarity.argtypes = [ctypes.c_char_p, ctypes.c_char_p]

    from archvisier_spark.kernel.similarity import token_similarity

    rng = random.Random(5)
    vocab = ["one", "two", "three", "ala", "ma", "kota", "zażółć", "x", ""]
    seps = [" ", "\t", "\n", "\r", "\x0b", "\x0c", " ", "  "]

    def mk():
        parts = []
        for _ in range(rng.randint(0, 12)):
            parts.append(rng.choice(vocab))
            parts.append(rng.choice(seps))
        return "".join(parts)

    for _ in range(3000):
        a, b = mk(), mk()
        want = round(lib.token_similarity(a.encode(), b.encode()), 6)
        assert abs(want - token_similarity(a, b)) <= 1e-9, (repr(a), repr(b))


def test_full_cascade_byte_identical_with_live_ner():
    """X8 against the ACTUAL reference worker (processing_worker.
    extract_info_from_text) — blank model, RuleNer-equipped model, and
    the sygnatura-override interaction, all byte-identical.  Uses the
    reference's own test stubs for its optional heavy imports."""
    sys.path.insert(0, _stub_dir())
    sys.path.insert(0, str(REF / "2_Aplikacja_Glowna"))
    sys.path.insert(0, str(REF / "2_Aplikacja_Glowna" / "gui"))
    sys.path.insert(0, str(REF / "2_Aplikacja_Glowna" / "SmartExtractor"))
    import importlib

    pw = importlib.import_module("processing_worker")
    from smart_extractor import SmartExtractor

    from archvisier_spark.kernel.cascade import extract_info_from_text
    from archvisier_spark.kernel.ner import RuleNer
    from archvisier_spark.kernel.smart import smart_extract_info

    class FakeEnt:
        def __init__(self, label, text):
            self.label_ = label
            self.text = text

    class FakeDoc:
        def __init__(self, ents):
            self.ents = ents

    class FakeNlp:
        def __init__(self, ruler):
            self.ruler = ruler

        def __call__(self, text):
            ents = self.ruler.ents(text) if self.ruler else []
            return FakeDoc([FakeEnt(l, s) for (_a, _b, l, s) in ents])

    ruler = RuleNer([
        ("DATA", "June 15, 2024"), ("ORGANIZACJA", "MINISTERSTWO"),
        ("NR_DOKUMENTU", "123"), ("TYP_DOKUMENTU", "Minutes"),
        ("SYGNATURA_SPRAWY", "VII K 123/20"),
    ])
    orig_nlp, orig_smart = pw.get_nlp_model, pw.get_smart_extractor
    try:
        for use_ruler, override, seed in [(None, "", 11), (ruler, "", 12),
                                          (ruler, "II C 1/20", 13)]:
            fake = FakeNlp(use_ruler)
            pw.get_nlp_model = lambda f=fake: f
            pw.get_smart_extractor = lambda f=fake: SmartExtractor(nlp_model=f)
            provider = use_ruler
            smart_tier = (
                (lambda t, p=provider: smart_extract_info(t, entity_provider=p))
                if provider else smart_extract_info
            )
            rng = random.Random(seed)
            for _ in range(1200):
                text = " ".join(rng.choice(WORDS) for _ in range(rng.randint(0, 12)))
                a = pw.extract_info_from_text(text, "f.pdf", "KP", override)
                b = extract_info_from_text(
                    text, "f.pdf", "KP", override,
                    entity_provider=provider, smart_tier=smart_tier,
                )
                assert dict(a) == dict(b), repr(text)
    finally:
        pw.get_nlp_model, pw.get_smart_extractor = orig_nlp, orig_smart


def test_naming_and_repair_byte_identical():
    """X13/X14 naming (incl. counter state) and X9 word repair vs the
    actual reference functions."""
    sys.path.insert(0, _stub_dir())
    sys.path.insert(0, str(REF / "2_Aplikacja_Glowna"))
    sys.path.insert(0, str(REF / "2_Aplikacja_Glowna" / "gui"))
    import importlib

    pw = importlib.import_module("processing_worker")
    ocr = importlib.import_module("processing.ocr")

    from archvisier_spark.kernel.naming import generate_new_filename
    from archvisier_spark.kernel.textfix import correct_text

    rng = random.Random(3)
    fields = ["sygnatura_sprawy", "numer_dokumentu", "nadawca_odbiorca",
              "typ_dokumentu", "w_sprawie"]
    vals = ["", "VII K 123/20", "ABC 1/24?", 'x*y:"z"',
            "Ministerstwo Finansów i Spraw", "umowa o dzieło", "a" * 60,
            "sp. z o.o.", "<tag>|pipe"]
    c_ref: dict = {}
    c_mine: dict = {}
    for _ in range(1500):
        info = {f: rng.choice(vals) for f in fields}
        mode = rng.choice(["KP", "KW", "SA", ""])
        assert pw.generate_new_filename(dict(info), mode, c_ref) == \
            generate_new_filename(dict(info), mode, c_mine), info
    assert c_ref == c_mine

    words = ["umowa", "umowy", "dokument", "faktura", "the", "and", "xyzzy",
             "umowaa", "dokumect", "annd", "q", ""]
    for _ in range(1000):
        text = "".join(
            rng.choice(words) + rng.choice([" ", ", ", ".", "\n", "-"])
            for _ in range(rng.randint(0, 10))
        )
        lang = rng.choice(["pol", "eng"])
        assert ocr.correct_text(text, lang) == correct_text(text, lang), repr(text)

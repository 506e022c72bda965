"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Generates the north-rule input table
``documents_web(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING,
lang STRING)`` (BASELINE.json:input_hint) at any scale, fully seeded — no
external data, no wall-clock reads.  The ``text`` column is the ground
truth the Spark pipeline must recover **byte-identically**:

* PDF rows: a valid minimal PDF built by :func:`kernel.pdf.build_pdf`;
  expected text = per-page dictionary-repaired text + ``"\\n"`` per page
  (the reference page contract, processing/ocr.py:227-231).  The payload
  is written independently of the extractor, so the roundtrip is a real
  parse test.
* HTML rows: a boilerplate-wrapped page (high-link-density nav/footer,
  script/style noise) around content paragraphs; expected text =
  paragraphs joined with ``"\\n"``.

Skew knob: every ``skew_every``-th PDF row repeats its pages ×``skew_factor``
(megabyte-scale docs) to exercise salting/repartitioning (SURVEY.md §4).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from archvisier_spark.kernel.pdf import build_pdf
from archvisier_spark.kernel.textfix import correct_text, detect_lang

LANGS = ("pl", "en", "de", "fr", "es")

# Sentence pools per language.  Polish rows carry diacritics so the lang
# heuristic (processing/ocr.py:68-70) fires; several lines embed the golden
# fragments from the reference tests so the metadata cascade extracts real
# fields downstream.
_SENTENCES: dict[str, tuple[str, ...]] = {
    "pl": (
        "Umowa nr 7/2025 zawarta w Warszawie pomiędzy stronami.",
        "Dnia 12-05-2024 roku strony ustaliły warunki współpracy.",
        "Warszawa, 3 stycznia 2022",
        "Od: Jan Kowalski",
        "Do: Urząd Miasta",
        "Numer dokumentu: ABC-123/2024",
        "Sygn. akt: VII K 123/20",
        "dotyczy: dostawy gazu ziemnego do siedziby zamawiającego",
        "Zażółć gęślą jaźń — kontrola znaków diakrytycznych.",
        "Faktura VAT wystawiona zgodnie z obowiązującymi przepisami.",
        "Protokół odbioru robót budowlanych przy ulicy Polnej.",
        "Zaświadczenie wydaje się na wniosek strony postępowania.",
        "W odpowiedzi na pismo z dnia 2024-03-05 informujemy jak niżej.",
    ),
    "en": (
        "Invoice No. 12345",
        "This agreement is entered into by the parties on 2023-11-20.",
        "Subject: quarterly maintenance report for the facility",
        "Number 456/2022 was assigned to this case file.",
        "The contract covers delivery of industrial equipment.",
        "Payment is due within thirty days of the invoice date.",
        "Minutes of the meeting held at the headquarters.",
        "A certificate of completion was issued to the contractor.",
    ),
    "de": (
        "Rechnung Nr. 789/2021 wurde ordnungsgemaess erstellt.",
        "Der Vertrag tritt am 15.06.2023 in Kraft.",
        "Protokoll der ordentlichen Versammlung der Gesellschaft.",
        "Die Lieferung erfolgt innerhalb von vierzehn Tagen.",
    ),
    "fr": (
        "La facture no 321/2020 est jointe au present courrier.",
        "Le contrat est conclu pour une duree de deux ans.",
        "Objet: rapport annuel du comite de direction.",
        "Le paiement intervient sous trente jours calendaires.",
    ),
    "es": (
        "La factura no 654/2019 se adjunta a la presente carta.",
        "El contrato entra en vigor el 10.02.2024 sin excepciones.",
        "Asunto: informe trimestral del departamento tecnico.",
        "El pago se realizara dentro de los treinta dias siguientes.",
    ),
}

_NAV_LINKS = (
    "Home page", "About the company", "Contact and support", "Privacy policy",
    "Terms of service", "Site map overview", "Latest news archive", "Careers portal",
)

_BASE_TS = datetime(2025, 1, 1, 0, 0, 0)


def _expected_pdf_text(pages: list[list[str]], language: str = "auto") -> str:
    """The text the pipeline must recover: per-page repair + trailing \\n."""
    out = ""
    for lines in pages:
        page_text = "\n".join(lines)
        if language == "auto":
            lang = "pol" if detect_lang(page_text) == "pl" else "eng"
        else:
            lang = language
        out += correct_text(page_text, lang) + "\n"
    return out


def _html_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _build_html(paragraphs: list[str], rng: random.Random) -> bytes:
    """Boilerplate-wrapped page; expected extraction = '\\n'.join(paragraphs)."""
    nav_items = "".join(
        f'<li><a href="/p{i}">{_NAV_LINKS[(i + rng.randrange(8)) % len(_NAV_LINKS)]}</a></li>'
        for i in range(rng.randint(3, 6))
    )
    body = "".join(f"<p>{_html_escape(p)}</p>" for p in paragraphs)
    footer_links = '<a href="/tos">Terms of service</a> <a href="/priv">Privacy policy</a>'
    page = (
        "<!DOCTYPE html><html><head><title>doc</title>"
        "<script>var trap='<p>decoy paragraph that must never appear</p>';</script>"
        "<style>.m{color:#222}</style></head>"
        f"<body><nav><ul>{nav_items}</ul></nav>"
        f'<div id="main"><article>{body}</article></div>'
        f"<footer><p>{footer_links}</p></footer></body></html>"
    )
    return page.encode("utf-8")


def generate_rows(
    n_docs: int,
    seed: int = 42,
    skew_every: int = 0,
    skew_factor: int = 100,
) -> list[dict]:
    """Generate ``n_docs`` corpus rows as plain dicts (driver-side, small;
    the Spark path parallelises the same per-id function via
    :func:`corpus_df`, so both paths emit identical rows)."""
    return [_row_for_id(i, seed, skew_every, skew_factor) for i in range(n_docs)]


def corpus_df(spark, n_docs: int, seed: int = 42, skew_every: int = 0,
              skew_factor: int = 100, partitions: int | None = None):
    """Distributed corpus as a Spark DataFrame with the north-rule schema.

    Generation is itself distributed: each task synthesises its own id
    range with ``mapInPandas`` (seeded per doc id, so the output is
    independent of partitioning) — at bench scale the driver never holds
    the corpus.
    """
    from pyspark.sql import types as T
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )
    n_parts = partitions or spark.sparkContext.defaultParallelism
    ids = spark.range(0, n_docs, 1, n_parts)

    def gen(batches):
        for id_batch in batches:
            out = [
                _row_for_id(int(i), seed, skew_every, skew_factor)
                for i in id_batch["id"]
            ]
            yield pd.DataFrame(out, columns=["url", "warc_ts", "html", "text", "lang"])

    return ids.mapInPandas(gen, schema=schema)


def _row_for_id(i: int, seed: int, skew_every: int, skew_factor: int) -> dict:
    """One deterministic corpus row keyed purely by document id."""
    rng = random.Random((seed << 20) ^ i)
    lang = LANGS[i % len(LANGS)]
    pool = _SENTENCES[lang]
    is_pdf = i % 2 == 1
    url = f"https://site{i % 50}.example/{lang}/doc{i:08d}"
    warc_ts = _BASE_TS + timedelta(minutes=i)
    if is_pdf:
        n_pages = rng.randint(1, 3)
        pages = [[rng.choice(pool) for _ in range(rng.randint(2, 5))] for _ in range(n_pages)]
        if skew_every and (i // 2) % skew_every == skew_every - 1:
            pages = pages * skew_factor
        payload = build_pdf(pages)
        expected = _expected_pdf_text(pages)
    else:
        paragraphs = [(rng.choice(pool) + " " + rng.choice(pool)) for _ in range(rng.randint(1, 4))]
        payload = _build_html(paragraphs, rng)
        expected = "\n".join(paragraphs)
    return {"url": url, "warc_ts": warc_ts, "html": payload, "text": expected, "lang": lang}

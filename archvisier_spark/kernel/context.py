"""Context-memory semantics (K5, J2, J3, A5, F3, F5/F6).

Reimplements the observable behaviour of
``2_Aplikacja_Glowna/context_analyzer.py``: a bounded memory of analysed
documents and user corrections, a deterministic embedding stub, cosine
top-k recall and fuzzy-argmax correction lookup.  The Spark forms of these
joins live in ``archvisier_spark.ops`` (J2 → broadcast cross join +
rank ≤ 3 + sim > 0.2; J3 → ``max_by`` + threshold); this module is their
single-node oracle.
"""

from __future__ import annotations

import random
from typing import Any, Mapping, Optional

from archvisier_spark.kernel.similarity import cosine_similarity, fuzzy_similarity

EMBED_DIM = 3                      # stub dim (context_analyzer.py:49)
SIMILARITY_THRESHOLD = 0.7         # correction acceptance (context_analyzer.py:80)
RECALL_THRESHOLD = 0.2             # similar-doc floor (context_analyzer.py:256)
DOC_MEMORY_CAP = 100               # retention (context_analyzer.py:162)
CORRECTION_MEMORY_CAP = 200        # retention (context_analyzer.py:163)
DOC_FRAGMENT_CAP = 2000            # F3 truncation (context_analyzer.py:185)
CORRECTION_FRAGMENT_CAP = 1000     # F3 truncation (context_analyzer.py:222)


def encode_text_stub(text: str, dim: int = EMBED_DIM) -> list[float]:
    """Deterministic embedding stub (K5 fixture parity): a PRNG seeded by
    the sum of character ordinals (context_analyzer.py:51-59).  Real
    deployments swap in a SentenceTransformer batch encode inside the same
    pandas UDF; every downstream operator is dim-agnostic."""
    rng = random.Random(sum(ord(ch) for ch in text))
    return [rng.random() for _ in range(dim)]


def find_similar_documents(
    memory_fragments: list[str], text: str, top_n: int = 3
) -> list[tuple[int, float]]:
    """J2: (index, cosine) of the top-``top_n`` memory docs above 0.2.

    Mirrors context_analyzer.py:230-262 including the <2-docs early
    return and the 2000-char query truncation."""
    if len(memory_fragments) < 2:
        return []
    embeddings = [encode_text_stub(f) for f in memory_fragments]
    query = encode_text_stub(text[:DOC_FRAGMENT_CAP])
    sims = [cosine_similarity(query, e) for e in embeddings]
    order = sorted(range(len(sims)), key=lambda i: sims[i], reverse=True)[:top_n]
    return [(i, sims[i]) for i in order if sims[i] > RECALL_THRESHOLD]


def find_relevant_correction(
    corrections: list[Mapping[str, Any]], text: str, metadata_key: str
) -> Optional[str]:
    """J3: fuzzy-argmax over corrections touching ``metadata_key``; accept
    only at similarity ≥ 0.7 (context_analyzer.py:267-293)."""
    relevant = [c for c in corrections if metadata_key in c["changed_fields"]]
    if not relevant:
        return None
    best, best_sim = None, -1.0
    for correction in relevant:
        sim = fuzzy_similarity(correction["text_fragment"], text)
        if sim > best_sim:
            best, best_sim = correction, sim
    if best_sim >= SIMILARITY_THRESHOLD:
        return best["changed_fields"][metadata_key]["corrected"]
    return None


def apply_contextual_corrections(
    extracted: dict, text: str, corrections: list[Mapping[str, Any]]
) -> dict:
    """F6 + J3: fill fields that are empty or shorter than 3 chars from
    correction history (context_analyzer.py:318-329)."""
    for key in extracted:
        if not extracted[key] or len(extracted[key]) < 3:
            suggestion = find_relevant_correction(corrections, text, key)
            if suggestion:
                extracted[key] = suggestion
    return extracted


def retain_memory(documents: list, corrections: list) -> tuple[list, list]:
    """A5 retention: keep the last 100 documents / 200 corrections
    (context_analyzer.py:160-163)."""
    return documents[-DOC_MEMORY_CAP:], corrections[-CORRECTION_MEMORY_CAP:]

"""Similarity kernels (SURVEY.md §2.4 K1–K4).

The reference accelerates these in C/Zig via ctypes; at Spark scale the
idiomatic equivalents are built-ins (``F.levenshtein``, array functions)
or NumPy inside Arrow batches.  These pure-Python forms are the oracle and
the parity path.
"""

from __future__ import annotations

import math
import re
from typing import Sequence

# The C kernel tokenises with strtok(buf, " \t\n\r")
# (native_c/token_similarity.c:41-54) — ONLY those four delimiters.
# Python str.split() splits on all Unicode whitespace (\x0b, \x0c, NBSP…),
# which diverges from the reference on exotic-whitespace inputs.
_C_DELIMS = re.compile(r"[ \t\n\r]+")


def _strtok_tokens(s: str, cap: int = 256) -> list[str]:
    return [t for t in _C_DELIMS.split(s) if t][:cap]


def token_similarity(a: str, b: str) -> float:
    """Whitespace-token Jaccard, C multiset semantics, rounded to 6 dp.

    Canonical semantics = the reference's C kernel
    (native_c/token_similarity.c:37-77) as wrapped with ``round(·, 6)`` by
    python/token_similarity.py:47-51; pinned by
    tests/test_token_similarity.py:15-16 (``("one two","one three") →
    0.333333``).  Duplicates in either input each count once toward
    intersection/union (the Zig variant dedups — deliberately not chosen:
    the C kernel is the tested default).  Token streams cap at 256 tokens,
    matching the C fixed buffers (token_similarity.c:40-54).  Empty union
    → 0.0.
    """
    tokens_a = _strtok_tokens(a) if a else []
    tokens_b = _strtok_tokens(b) if b else []
    set_b = set(tokens_b)
    set_a = set(tokens_a)
    intersection = sum(1 for t in tokens_a if t in set_b)
    union = len(tokens_a) + sum(1 for t in tokens_b if t not in set_a)
    if union == 0:
        return 0.0
    return round(intersection / union, 6)


def cosine_similarity(a: Sequence[float], b: Sequence[float]) -> float:
    """dot/(‖a‖·‖b‖); 0.0 when either norm is zero.

    Semantics per native/fast_similarity.c:10-46 and the pure fallback at
    context_analyzer.py:68-72; accuracy vs NumPy pinned ≤1e-6 by
    tests/test_fast_similarity.py:149-157.
    """
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
        na += x * x
        nb += y * y
    if na == 0.0 or nb == 0.0:
        return 0.0
    return dot / (math.sqrt(na) * math.sqrt(nb))


def levenshtein(a: str, b: str) -> int:
    """Classic edit distance, two-row DP (native/levenshtein.c:6-40).

    Spark-side equivalent is the built-in ``F.levenshtein`` (exact match);
    golden pairs in tests/test_levenshtein_c.py:64-74.
    """
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    cur = [0] * (len(b) + 1)
    for i, ca in enumerate(a, 1):
        cur[0] = i
        for j, cb in enumerate(b, 1):
            cost = 0 if ca == cb else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev, cur = cur, prev
    return prev[len(b)]


def levenshtein_numpy(a: str, b: str) -> int:
    """Exact edit distance with a NumPy-vectorised inner row (~3× the pure
    loop on 200-char fragments).  Insertions propagate left-to-right, which
    defeats naive vectorisation; the running-min identity
    ``cur[j] = min(m[j], min_{k<j}(m[k] - k) + j)`` (m = min of the
    substitution/deletion candidates) restores it as a prefix-min scan.
    Value-equal to :func:`levenshtein` (fuzz-pinned in tests)."""
    import numpy as np

    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    n = len(bb)
    idx = np.arange(1, n + 1, dtype=np.int64)
    prev = np.arange(n + 1, dtype=np.int64)
    cur = np.empty_like(prev)
    for i, ca in enumerate(a, 1):
        cur[0] = i
        m = np.minimum(prev[:-1] + (bb != ord(ca)), prev[1:] + 1)
        run = np.minimum.accumulate(np.concatenate(([cur[0]], m - idx)))
        cur[1:] = np.minimum(m, run[1:] + idx)
        prev, cur = cur, prev
    return int(prev[-1])


def fuzzy_similarity_fast(a: str, b: str) -> float:
    """:func:`fuzzy_similarity` with the NumPy distance — same values,
    used inside Arrow-batched UDFs where fragment length makes the pure
    DP the bottleneck."""
    if a == b:
        return 1.0
    if not a or not b:
        return 0.0
    return 1.0 - levenshtein_numpy(a, b) / max(len(a), len(b))


def fuzzy_similarity(a: str, b: str) -> float:
    """Normalised string similarity in [0, 1].

    The reference prefers rapidfuzz Jaro-Winkler, then Levenshtein.ratio,
    then ``1 - dist/max(len)`` (context_analyzer.py:10-42).  We pin the
    final fallback as canonical: it is dependency-free, deterministic, and
    the one the reference tests exercise in the stubbed environment.
    Acceptance threshold downstream is 0.7 (context_analyzer.py:80).
    The two preferred tiers are implemented from scratch below
    (:func:`jaro_winkler`, :func:`levenshtein_ratio`) so a deployment that
    wants the reference's rapidfuzz-installed behaviour gets identical
    values via :func:`fuzzy_similarity_chain`.
    """
    if a == b:
        return 1.0
    if not a or not b:
        return 0.0
    return 1.0 - levenshtein(a, b) / max(len(a), len(b))


def jaro_similarity(a: str, b: str) -> float:
    """Standard Jaro similarity (public algorithm; the base of the
    reference's preferred rapidfuzz tier).  Both-empty → 1.0, one-empty →
    0.0 — rapidfuzz's normalized_similarity conventions."""
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    match_a = [False] * la
    match_b = [False] * lb
    matches = 0
    for i, ca in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and b[j] == ca:
                match_a[i] = True
                match_b[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(la):
        if match_a[i]:
            while not match_b[j]:
                j += 1
            if a[i] != b[j]:
                transpositions += 1
            j += 1
    t = transpositions // 2
    return (matches / la + matches / lb + (matches - t) / matches) / 3.0


def jaro_winkler(a: str, b: str, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler with the standard ≤4-char common-prefix boost —
    value-compatible with ``rapidfuzz.distance.JaroWinkler.
    normalized_similarity`` at its default prefix weight 0.1 (the
    reference's first-choice tier, context_analyzer.py:12-16).  The
    Winkler prefix boost applies only when Jaro > 0.7 (the standard
    boost threshold, matched by rapidfuzz) — without the gate,
    low-similarity pairs with a common prefix would be inflated into the
    downstream 0.7 acceptance region."""
    sim = jaro_similarity(a, b)
    if sim <= 0.7:
        return sim
    prefix = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca != cb:
            break
        prefix += 1
    return sim + prefix * prefix_weight * (1.0 - sim)


def levenshtein_ratio(a: str, b: str) -> float:
    """``Levenshtein.ratio`` semantics (the chain's second tier,
    context_analyzer.py:18-22): indel distance (substitution cost 2)
    normalised by the length sum — equivalently ``2·LCS/(|a|+|b|)``.
    Both-empty → 1.0."""
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    prev = [0] * (lb + 1)
    cur = [0] * (lb + 1)
    for ca in a:
        for j, cb in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if ca == cb else max(prev[j], cur[j - 1])
        prev, cur = cur, prev
    lcs = prev[lb]
    return 2.0 * lcs / (la + lb)


def fuzzy_similarity_chain(a: str, b: str, tier: str = "jaro_winkler") -> float:
    """The reference's full preference chain, tier-selectable: a cluster
    with rapidfuzz installed computes Jaro-Winkler; one with only
    python-Levenshtein computes ratio; the bare environment computes the
    normalised-levenshtein fallback (the engine's pinned canonical)."""
    if tier == "jaro_winkler":
        return jaro_winkler(a, b)
    if tier == "ratio":
        return levenshtein_ratio(a, b)
    return fuzzy_similarity(a, b)

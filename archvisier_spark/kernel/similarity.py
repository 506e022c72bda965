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
    """
    if a == b:
        return 1.0
    if not a or not b:
        return 0.0
    return 1.0 - levenshtein(a, b) / max(len(a), len(b))

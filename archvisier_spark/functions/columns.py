"""Column-level forms of the reference kernels (SURVEY.md §2.3-2.4).

Each builder returns a ``pyspark.sql.Column`` composed of built-ins only —
whole-stage-codegen territory.  Where Python-``re``/byte-parity semantics
matter (the cascade, X2 date normalisation), the pandas-UDF kernels in
``archvisier_spark.kernel`` remain the canonical path; these columns are
the scale-path equivalents whose parity is proven per-operator by the
DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def cosine_similarity_col(a, b) -> Column:
    """K2 cosine as pure expressions; 0.0 on zero norm
    (native/fast_similarity.c:10-24 semantics)."""

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    na = F.sqrt(dot(a, a))
    nb = F.sqrt(dot(b, b))
    return F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(dot(a, b) / (na * nb))


def token_jaccard_set_col(a, b) -> Column:
    """K1 with set semantics (the reference's Zig variant,
    zig_modules/token_similarity/src/main.zig:5-35): dedup both sides."""
    ta = F.array_distinct(F.split(F.trim(a), r"\s+"))
    tb = F.array_distinct(F.split(F.trim(b), r"\s+"))
    union = F.size(F.array_union(ta, tb))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        F.size(F.array_intersect(ta, tb)) / union
    )


def token_jaccard_multiset_col(a, b) -> Column:
    """K1 with C multiset semantics + round 6 (the canonical, tested
    variant — native_c/token_similarity.c:56-77)."""
    ta = F.split(F.trim(a), r"\s+")
    tb = F.split(F.trim(b), r"\s+")
    inter = F.size(F.filter(ta, lambda t: F.array_contains(tb, t)))
    union = F.size(ta) + F.size(F.filter(tb, lambda t: ~F.array_contains(ta, t)))
    return F.when(union == 0, F.lit(0.0)).otherwise(F.round(inter / union, 6))


def levenshtein_col(a, b) -> Column:
    """K3 — Spark's built-in matches the classic DP exactly."""
    return F.levenshtein(a, b)


def lang_heuristic_col(text) -> Column:
    """X10 diacritics heuristic (processing/ocr.py:68-70)."""
    return F.when(F.lower(text).rlike("[ąćęłńóśżź]"), F.lit("pl")).otherwise(F.lit("en"))


def needs_value_col(value) -> Column:
    """F6 needs-value predicate: empty or shorter than 3
    (context_analyzer.py:321-326)."""
    return value.isNull() | (F.length(value) < 3)


def header_col(text, n: int = 500) -> Column:
    """F2 header slice (smart_extractor.py:127-128)."""
    return F.substring(text, 1, n)

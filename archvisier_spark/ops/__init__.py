"""Driver-contract operator inventory (SURVEY.md §2 → queries()/oracle_sql()).

Each module exposes ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, sql]`` (ANSI SQL for DuckDB over the same parquet
views).  Names and column aliases MUST match pairwise — the driver's
compare sorts columns by name and value-hashes.

Float discipline: every double aggregate is ``round(…, N)`` on BOTH sides
so summation-order LSB noise can't flip the hash.
"""

from archvisier_spark.ops import (
    tpch, textops, dedup, simsearch, events, cascade_ops, multimodal, context_ops,
)

_MODULES = (tpch, textops, dedup, simsearch, events, cascade_ops, multimodal, context_ops)


def all_queries():
    out = {}
    for mod in _MODULES:
        overlap = set(out) & set(mod.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out


def all_oracles():
    out = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out

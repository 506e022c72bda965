"""Explicit salting for skewed keys (SURVEY.md §4 "skew from megabyte-scale
PDFs"; the prompt's 100 TB checklist).

AQE's skew-join splitting handles sort-merge join partitions; two shapes
it does NOT cover still need explicit salting at scale:

* **hot-key aggregation without a partial form** — ``collect_list`` /
  ``collect_set`` ship every row of a hot key to ONE reducer.  The salted
  two-phase form bounds any single task at ``rows(key)/n_salts``.
* **hot-key broadcast-ineligible join** — when the build side is too big
  to broadcast and one probe key dominates, replicating the build rows
  per salt spreads the hot key across ``n_salts`` tasks.

Both are pure DataFrame compositions (no RDDs, no UDFs) and are
differential-tested against their unsalted forms on skewed data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def _salt_col(df: DataFrame, n_salts: int, deterministic_from: Sequence[str]):
    """Row salt from the given columns plus the input partition id (no
    rand(): a retried task recomputes the same partition, so salts stay
    stable within a job).  The partition-id mix matters because hot keys
    often carry identical / low-cardinality values — hashing the value
    alone would send the whole hot key back to ONE salt.  With the mix,
    a hot key spanning P input partitions spreads over ~min(P, n_salts)
    salts even when every value is identical.  Both salted shapes below
    are salt-invariant in their OUTPUT (sorted collect / row-level join),
    so the layout-dependence of partition ids never reaches the result."""
    cols = [F.col(c) for c in deterministic_from]
    cols.append(F.spark_partition_id())
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts))


def salted_collect_sorted(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 16,
    out_col: str = "values",
) -> DataFrame:
    """``groupBy(key).collect_list(value)`` (sorted) without a hot-key
    reducer: phase 1 collects per (key, salt) — each task sees at most
    ~1/n_salts of a hot key — phase 2 flattens the (few) per-salt arrays
    and sorts once.  Output equals the direct sorted collect_list."""
    salted = df.withColumn("__salt", _salt_col(df, n_salts, [value]))
    partial = salted.groupBy(key, "__salt").agg(
        F.collect_list(value).alias("__part")
    )
    return partial.groupBy(key).agg(
        F.array_sort(F.flatten(F.collect_list("__part"))).alias(out_col)
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    salt_from: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join where one fact key dominates and ``dim`` is too big to
    broadcast: facts get a deterministic per-row salt, dim rows replicate
    once per salt, and the join key becomes (key, salt) — the hot key's
    rows spread over ``n_salts`` shuffle partitions instead of one.

    ``salt_from``: fact columns the salt derives from (default: all fact
    columns except the key — any per-row-varying subset works).  Result
    equals ``facts.join(dim, key)`` row-for-row."""
    fact_cols = list(salt_from) if salt_from else [c for c in facts.columns if c != key]
    if not fact_cols:
        # key-only facts: salt from the key — the partition-id mix in
        # _salt_col still spreads a hot key's rows across salts
        fact_cols = [key]
    salted_facts = facts.withColumn("__salt", _salt_col(facts, n_salts, fact_cols))
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    )
    return salted_facts.join(replicated_dim, [key, "__salt"]).drop("__salt")

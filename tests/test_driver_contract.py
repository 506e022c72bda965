"""Replicates the driver's correctness gate locally: every queries() entry
runs on Spark and, when an oracle exists, must match DuckDB on row count,
column names, and order-insensitive values (at sf0.001 for speed; the
driver runs sf0.01)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def normalise(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in sorted(cols):
            v = row[c]
            if isinstance(v, float):
                v = round(v, 6)
                if math.isnan(v):
                    v = "NaN"
            vals.append((c, str(v)))
        out.append(tuple(vals))
    return sorted(out)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

# these oracles ship with literals generated from the DRIVER's sf0.01
# corpus (its correctness scale): stub vectors (context_similar_docs) and
# XXH64 token hashes (simhash/fingerprints); this test runs at sf0.001,
# so regenerate the literals for the corpus under test
from archvisier_spark.ops.cascade_ops import _cascade_metadata_oracle_sql
from archvisier_spark.ops.context_ops import _similar_docs_oracle_sql
from archvisier_spark.ops.dedup import fingerprint_oracle_sql, simhash_oracle_sql

for _name, _gen in [
    ("context_similar_docs", _similar_docs_oracle_sql),
    ("dedup_simhash_buckets", simhash_oracle_sql),
    ("cascade_fingerprints", fingerprint_oracle_sql),
    ("cascade_metadata", _cascade_metadata_oracle_sql),
]:
    _sql = _gen(SF_DIR)
    if _sql is not None:
        ORACLES[_name] = _sql


def test_oracle_names_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_rows = [r.asDict() for r in sdf.collect()]
    spark_cols = sdf.columns
    if name not in ORACLES:
        # rows-only contract: must run and produce a stable schema
        assert isinstance(spark_rows, list)
        return
    res = ddb.sql(ORACLES[name])
    duck_cols = res.columns
    duck_rows = [dict(zip(duck_cols, row)) for row in res.fetchall()]
    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row counts differ"
    assert normalise(spark_rows, spark_cols) == normalise(duck_rows, duck_cols), (
        f"{name}: values differ"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 500  # sf0.001 documents
    # lp is a dense 1-based permutation in doc_id order
    by_id = sorted(rows, key=lambda r: r["doc_id"])
    assert [r["lp"] for r in by_id] == list(range(1, 501))
    assert all(r["new_name"].endswith(".pdf") for r in rows)


def test_entry_plan_has_zero_payload_exchange(spark):
    """Round-4 verdict #6: the flagship must exhibit the sorted-numbering
    fast path — no hash/range Exchange anywhere (the only join is the
    broadcast of the tiny offset table)."""
    plan = entry_mod.entry(spark)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "BroadcastHashJoin" in plan

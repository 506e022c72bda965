"""Context-memory joins at scale (J2/J3) + the extraction roundtrip gauge.

J2 (similar-document recall) and J3 (correction argmax) are the
reference's in-memory loops re-expressed as DataFrame joins; the kernel in
``archvisier_spark.kernel.context`` is their single-node oracle (pinned by
tests/test_ops_context.py differentials).  Driver checks are rows-only —
the embedding stub and fuzzy kernel are deliberately Python-exact.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window, functions as F, types as T

from archvisier_spark.kernel.context import encode_text_stub
from archvisier_spark.kernel.similarity import fuzzy_similarity_fast
from archvisier_spark.ops.simsearch import cosine_col


@F.pandas_udf(T.ArrayType(T.DoubleType()))
def encode_stub_udf(texts: pd.Series) -> pd.Series:
    """K5 batch encode (deterministic stub; swap body for a real
    SentenceTransformer on a GPU cluster — same signature/batching)."""
    return pd.Series([encode_text_stub(t or "") for t in texts])


@F.pandas_udf(T.DoubleType())
def fuzzy_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([fuzzy_similarity_fast(x or "", y or "") for x, y in zip(a, b)])


def q_context_similar_docs(spark, sf_dir):
    """J2 at scale: new docs (queries) vs memory docs, stub-encoded, cosine
    ranked, top-3 above 0.2 (context_analyzer.py:230-262).  Memory side is
    broadcast — it is capped at 100 rows by A5 retention, the textbook
    broadcast-join dimension."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    memory = docs.filter(F.col("doc_id") < 100).select(
        F.col("doc_id").alias("mem_id"),
        encode_stub_udf(F.substring("text", 1, 2000)).alias("mem_vec"),
    )
    # r07: fan the stub-encode + cosine work off the single scan task
    queries = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 150)).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).select(
        F.col("doc_id").alias("query_id"),
        encode_stub_udf(F.substring("text", 1, 2000)).alias("q_vec"),
    )
    scored = queries.crossJoin(F.broadcast(memory)).select(
        "query_id", "mem_id", cosine_col("q_vec", "mem_vec").alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("mem_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter((F.col("rk") <= 3) & (F.col("cos") > 0.2))
        .select("query_id", "mem_id", F.round("cos", 4).alias("cosine"))
    )


def q_context_corrections(spark, sf_dir):
    """J3 at scale: per query doc, fuzzy-argmax correction fragment,
    accepted at ≥ 0.7 (context_analyzer.py:267-293) via ``max_by`` over a
    broadcast corrections table (capped at 200 by A5).  Fragments are
    capped at 200 chars here — the quadratic edit-distance kernel makes
    fragment length the cost knob (the reference caps prompt-side
    fragments at 200 too, context_analyzer.py:305)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corrections = docs.filter(F.col("doc_id") < 120).select(
        F.col("doc_id").alias("corr_id"),
        F.substring("text", 1, 200).alias("fragment"),
    )
    # query range [200, 330) vs corrections [0, 120): sized so the corpus
    # contains BOTH accepted rows (sim = 1.0 exact-fragment dupes) and
    # rejected ones — the threshold is exercised in both directions while
    # the quadratic fuzzy kernel stays test-budget friendly
    # r07: repartition the query side off its single-row-group scan task —
    # the quadratic fuzzy kernel otherwise runs every pair on one core
    # (measured 28 s -> ~1 s at sf0.01)
    queries = docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 330)).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).select(
        F.col("doc_id").alias("query_id"), F.substring("text", 1, 200).alias("qtext")
    )
    scored = queries.crossJoin(F.broadcast(corrections)).select(
        "query_id",
        "corr_id",
        fuzzy_udf("fragment", "qtext").alias("sim"),
    )
    best = scored.groupBy("query_id").agg(
        F.expr("max_by(corr_id, struct(sim, -corr_id))").alias("best_corr"),
        F.round(F.max("sim"), 6).alias("best_sim"),
    )
    return best.filter(F.col("best_sim") >= 0.7)


def q_extraction_roundtrip(spark, sf_dir):
    """The flagship gauge as a driver-visible query: run the full binary
    pipeline on a deterministic in-query corpus and report byte-identity
    counts per format (rows-only; per-url assertions live in
    tests/test_pipeline_differential.py)."""
    from archvisier_spark.corpus import corpus_df
    from archvisier_spark.pipeline.extract import extract_documents

    docs = corpus_df(spark, 200, seed=1234, skew_every=10, skew_factor=20)
    extracted = extract_documents(docs)
    joined = extracted.join(docs.select("url", F.col("text").alias("expected")), "url")
    return joined.groupBy("format").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("extracted_text") == F.col("expected")).cast("long")).alias("n_byte_identical"),
        F.sum((F.col("status") == "Sukces").cast("long")).alias("n_ok"),
    )


# The J3 fuzzy kernel's canonical form (1 - lev/max(len), kernel.similarity
# fuzzy_similarity) is exactly expressible in DuckDB — so the argmax join
# gets a full value oracle (the NumPy-vectorised kernel must agree with
# plain SQL levenshtein to 6 dp).
_CORRECTIONS_SQL = """
WITH corrections AS (
  SELECT doc_id AS corr_id, substr(text, 1, 200) AS fragment
  FROM documents WHERE doc_id < 120
),
queries AS (
  SELECT doc_id AS query_id, substr(text, 1, 200) AS qtext
  FROM documents WHERE doc_id >= 200 AND doc_id < 330
),
scored AS (
  SELECT query_id, corr_id,
         CASE WHEN fragment = qtext THEN 1.0
              ELSE 1 - levenshtein(fragment, qtext)::DOUBLE
                       / greatest(length(fragment), length(qtext))
         END AS sim
  FROM queries CROSS JOIN corrections
)
SELECT query_id, best_corr, best_sim
FROM (
  SELECT query_id,
         min(CASE WHEN rn = 1 THEN corr_id END) AS best_corr,
         round(max(sim), 6) AS best_sim
  FROM (
    SELECT query_id, corr_id, sim,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, corr_id ASC) AS rn
    FROM scored
  )
  GROUP BY query_id
) WHERE best_sim >= 0.7
"""

def _similar_docs_oracle_sql(sf_dir: str | None = None) -> str | None:
    """Value oracle for q_context_similar_docs, generated by stub-encoding
    the driver corpus OUTSIDE Spark (pyarrow read + the plain-Python K5
    stub) and embedding the vectors as literal DOUBLE arrays — the same
    literal-embedding trick as the ANN-LSH plane oracle.  The SQL then
    independently reproduces the broadcast cross join, cosine, top-3 and
    0.2 threshold.  Returns None (→ rows-only driver check) when the
    driver corpus is not on disk.  Lazy (round-3 ADVICE): resolved by
    ``all_oracles()`` on the driver, never at import time — this module's
    pandas_udfs are cloudpickled by reference, so executors re-import it."""
    import os

    from archvisier_spark.ops.oracle_env import driver_sf_dir

    path = f"{sf_dir or driver_sf_dir()}/documents.parquet"
    if not os.path.exists(path):
        return None
    import pyarrow.parquet as pq

    tbl = pq.read_table(path, columns=["doc_id", "text"]).to_pandas()
    tbl = tbl[tbl.doc_id < 150].sort_values("doc_id")
    vecs = {
        int(r.doc_id): encode_text_stub((r.text or "")[:2000])
        for r in tbl.itertuples(index=False)
    }

    def values(ids):
        return ",\n  ".join(
            f"({i}, [{', '.join(repr(v) for v in vecs[i])}]::DOUBLE[])" for i in ids
        )

    mem_ids = [i for i in sorted(vecs) if i < 100]
    q_ids = [i for i in sorted(vecs) if 100 <= i < 150]
    return f"""
WITH mem(mem_id, mv) AS (VALUES
  {values(mem_ids)}
),
q(query_id, qv) AS (VALUES
  {values(q_ids)}
),
scored AS (
  SELECT query_id, mem_id, list_cosine_similarity(qv, mv) AS cos
  FROM q CROSS JOIN mem
)
SELECT query_id::BIGINT AS query_id, mem_id::BIGINT AS mem_id,
       round(cos, 4) AS cosine
FROM (
  SELECT query_id, mem_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, mem_id ASC) AS rk
  FROM scored
) WHERE rk <= 3 AND cos > 0.2
"""


# The roundtrip gauge's expected counts are NOT derived by running the
# pipeline: the corpus contract (corpus.py:_row_for_id — odd doc ids are
# PDFs, even are HTML, 200 docs seed 1234) fixes n_docs per format, and
# the north rule fixes the invariant n_byte_identical = n_ok = n_docs
# (byte-identical extraction, zero failures).  The oracle pins that
# invariant as literals — if any document stops roundtripping
# byte-identically, the Spark side diverges and the driver's hash check
# fails.  Same literal-embedding family as the ANN planes / IVF centroids.
_ROUNDTRIP_SQL = """
SELECT format, n_docs::BIGINT AS n_docs,
       n_byte_identical::BIGINT AS n_byte_identical, n_ok::BIGINT AS n_ok
FROM (VALUES ('html', 100, 100, 100), ('pdf', 100, 100, 100))
     AS t(format, n_docs, n_byte_identical, n_ok)
"""

QUERIES = {
    "context_similar_docs": q_context_similar_docs,
    "context_corrections": q_context_corrections,
    "extraction_roundtrip": q_extraction_roundtrip,
}
ORACLES = {
    "context_corrections": _CORRECTIONS_SQL,
    # K5 stub vectors embedded as literals → full value oracle; callable →
    # resolved lazily on the driver by all_oracles()
    "context_similar_docs": _similar_docs_oracle_sql,
    "extraction_roundtrip": _ROUNDTRIP_SQL,
}

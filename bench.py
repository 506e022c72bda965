#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with per-query seconds.

Default mode (what the driver runs):
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py

Headline: the flagship extraction pipeline (synthetic north-rule corpus,
binary payloads → sniff → extract → cascade → number → name) measured as
documents/sec, plus representative operator queries at the SF dir.

Scaling mode (evidence for the N-vs-4N efficiency rule):
    python bench.py --scaling
runs the SAME extraction job at local[8] and local[32] in separate JVMs
and writes BENCH/BASELINE.md with throughputs + efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "12000"))
CORPUS_SEED = 42
CORPUS_PATH = f"/tmp/archvisier_bench_corpus_n{N_DOCS}_s{CORPUS_SEED}.parquet"

# Representative operator subset for per-round tracking (full inventory is
# covered by the driver's correctness run; bench tracks the heavy shapes).
BENCH_OPS = (
    "tpch_pricing_summary",
    "tpch_nation_revenue",
    "tpch_top3_orders_per_customer",
    "text_quality_scores",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "events_hourly_counts",
    "cascade_metadata",
)


def ensure_corpus(spark) -> str:
    """Materialise the deterministic corpus once; timing then measures the
    read→extract pipeline, not synthesis (mirrors reading an Iceberg table)."""
    if not os.path.exists(CORPUS_PATH):
        from archvisier_spark.corpus import corpus_df

        corpus_df(spark, N_DOCS, seed=CORPUS_SEED, skew_every=50, skew_factor=100).write.mode(
            "overwrite"
        ).parquet(CORPUS_PATH)
    return CORPUS_PATH


def run_extraction(spark) -> tuple[float, int]:
    from archvisier_spark.pipeline.extract import extract_documents, with_new_names

    path = ensure_corpus(spark)
    docs = spark.read.parquet(path)
    t0 = time.time()
    n = with_new_names(extract_documents(docs), work_mode="KP").count()
    return time.time() - t0, n


def throughput_once(master: str) -> dict:
    from archvisier_spark.session import get_spark

    spark = get_spark(master=master, app_name=f"bench_{master}")
    # warm the Python workers + parquet footer cache with a tiny job
    spark.read.parquet(ensure_corpus(spark)).limit(64).count()
    sec, n = run_extraction(spark)
    spark.stop()
    return {"master": master, "sec": sec, "docs": n, "docs_per_sec": n / sec}


def main_bench() -> None:
    from archvisier_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", app_name="bench")
    queries: dict[str, float] = {}

    ex_sec, n_docs = run_extraction(spark)
    queries["extract_corpus"] = round(ex_sec, 3)

    from archvisier_spark.ops import all_queries

    qmap = all_queries()
    for name in BENCH_OPS:
        t0 = time.time()
        qmap[name](spark, SF_DIR).count()
        queries[name] = round(time.time() - t0, 3)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "extract_docs": n_docs,
                "extract_docs_per_sec": round(n_docs / ex_sec, 1),
            }
        )
    )
    spark.stop()


def main_scaling() -> None:
    """N-vs-4N scaling evidence (BASELINE.md protocol): identical job +
    input at local[8] and local[32], fresh JVM each, efficiency =
    (rate_32 / rate_8) / 4."""
    results = []
    for n in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--throughput-only", f"local[{n}]"],
            capture_output=True,
            text=True,
            check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
    r8, r32 = results
    eff = (r32["docs_per_sec"] / r8["docs_per_sec"]) / 4
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH — scaling evidence (N vs 4N parallelism)\n\n"
            "Protocol (BASELINE.md): identical extraction job + identical input\n"
            f"({r8['docs']} synthetic north-rule docs incl. 100× skew rows), run at\n"
            "local[8] and local[32] in separate JVMs; sandbox proxy for the\n"
            "N-vs-4N-executor rule.\n\n"
            "| master | docs | sec | docs/sec |\n|---|---|---|---|\n"
            f"| local[8] | {r8['docs']} | {r8['sec']:.2f} | {r8['docs_per_sec']:.1f} |\n"
            f"| local[32] | {r32['docs']} | {r32['sec']:.2f} | {r32['docs_per_sec']:.1f} |\n\n"
            f"**Scaling efficiency = ({r32['docs_per_sec']:.1f} / {r8['docs_per_sec']:.1f}) / 4 "
            f"= {eff:.3f}** (target ≥ 0.8)\n"
        )
    print(json.dumps({"local8": r8, "local32": r32, "efficiency": round(eff, 4)}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    elif "--throughput-only" in sys.argv:
        master = sys.argv[-1]
        print(json.dumps(throughput_once(master)))
    else:
        main_bench()

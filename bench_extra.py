#!/usr/bin/env python
"""Extra benchmarks for the optimization rounds (guide §1) — bench.py is
FROZEN for measurement, so per-query isolation lives here.

* ``--queries a,b,c`` (default: the bench.py BENCH_OPS subset) — each
  query is timed twice per trial: ``.count()`` (the frozen driver
  methodology) and a ``noop``-sink write (computes every column of every
  row, guide §1.4), interleaved across trials, medians reported.
* ``--explain plans/r07 --suffix before`` — saves
  ``plans/<dir>/<query>_<suffix>.txt`` with ``explain("formatted")``.
* ``--all`` — run the full declared inventory instead of BENCH_OPS.

Output: one JSON line with medians, per-mode.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_OPS = (
    "tpch_pricing_summary",
    "tpch_nation_revenue",
    "tpch_top3_orders_per_customer",
    "text_quality_scores",
    "dedup_minhash_lsh",
    "dedup_simhash_buckets",
    "sim_cosine_topk",
    "events_hourly_counts",
    "cascade_metadata",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--explain", default=None, help="dir for plan dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--skip-noop", action="store_true")
    args = ap.parse_args()

    from archvisier_spark.ops import all_queries
    from archvisier_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", app_name="bench_extra")
    qmap = all_queries()
    if args.queries:
        names = [n.strip() for n in args.queries.split(",") if n.strip()]
    elif args.all:
        names = list(qmap)
    else:
        names = list(BENCH_OPS)
    for n in names:
        if n not in qmap:
            raise SystemExit(f"unknown query: {n}")

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        for n in names:
            df = qmap[n](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain, f"{n}_{args.suffix}.txt"), "w") as f:
                f.write(plan)

    count_s: dict[str, list[float]] = {n: [] for n in names}
    noop_s: dict[str, list[float]] = {n: [] for n in names}
    # warm-up pass so trial 1 doesn't pay worker fork/JIT
    for n in names:
        qmap[n](spark, SF_DIR).count()
    for _ in range(args.trials):
        for n in names:
            spark.sparkContext.setJobDescription(f"{n}: count")
            t0 = time.time()
            qmap[n](spark, SF_DIR).count()
            count_s[n].append(time.time() - t0)
            if not args.skip_noop:
                spark.sparkContext.setJobDescription(f"{n}: noop")
                t0 = time.time()
                qmap[n](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                noop_s[n].append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
    out = {
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "trials": args.trials,
        "count_sec": {n: round(statistics.median(s), 3) for n, s in count_s.items()},
        "count_total": round(sum(statistics.median(s) for s in count_s.values()), 3),
    }
    if not args.skip_noop:
        out["noop_sec"] = {
            n: round(statistics.median(s), 3) for n, s in noop_s.items()
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

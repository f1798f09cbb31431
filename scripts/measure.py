"""Measurement harness for the optimization rounds (guide §1).

Times a named subset of registry queries (min-of-N through the noop
sink, jobs labelled) and optionally captures ``explain("formatted")``
to ``plans/<tag>/<name>_<suffix>.txt``.

Usage:
    python scripts/measure.py q1_pricing_summary supplier_hits ...
    python scripts/measure.py --plans before --tag r13 <names...>
    python scripts/measure.py --all-headline            # whole headline
    python scripts/measure.py --runs 5 <names...>

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inception_spark.session import build_session  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", choices=["before", "after", "none"],
                    default="none",
                    help="capture explain('formatted') with this suffix")
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--all-headline", action="store_true")
    ap.add_argument("--out", default=None,
                    help="also write the JSON result to this path")
    args = ap.parse_args()

    spark = build_session("inception_spark_measure")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    if args.all_headline:
        import bench
        names = list(bench.HEADLINE)
    else:
        names = args.names
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # Warm the same paths bench.py warms.
    warm_sf = "/root/testdata/sf0.001"
    for wq in ("q1_pricing_summary", "doc_fingerprint", "chunk_documents",
               "pq_topk", "ivf_pq_topk"):
        queries[wq](spark, warm_sf).write.format("noop").mode(
            "overwrite").save()

    plan_dir = os.path.join(REPO, "plans", args.tag)
    if args.plans != "none":
        os.makedirs(plan_dir, exist_ok=True)

    timings: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"measure:{name}")
        if args.plans != "none":
            plan_txt = fn(spark, SF_DIR)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"))
            with open(os.path.join(
                    plan_dir, f"{name}_{args.plans}.txt"), "w") as fh:
                fh.write(plan_txt)
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"{timings[name]:8.3f}  {name}", flush=True)
        gc.collect()
    spark.sparkContext.setJobDescription(None)

    doc = {"sf_dir": SF_DIR, "runs": args.runs, "queries": timings,
           "total": round(sum(timings.values()), 3)}
    print(json.dumps(doc))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(doc, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()

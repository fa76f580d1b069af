#!/usr/bin/env python
"""Round-15 measurement harness (guide §1): time individual queries in
isolation with the noop sink and capture .explain("formatted") plans.

Usage:
  python plans/r16/measure.py q1 q2 ...            # time + plan each query
  python plans/r16/measure.py --reps 3 q1 ...      # median-of-N timing
  python plans/r16/measure.py --plan-only q1 ...   # capture plans only
  python plans/r16/measure.py --tag after q1 ...   # plans/r16/<q>_after.txt

Timings print to stdout; plans land in plans/r16/<query>_<tag>.txt.
Uses the same session shape as bench.py (local[$SPARK_GRAFT_CPUS],
shuffle partitions = cpus) so numbers are comparable to the bench.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from statistics import median

REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--plan-only", action="store_true")
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from ibis_flink_example_spark.session import apply_session_conf, get_spark

    spark = get_spark(
        app_name="r16-measure",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    apply_session_conf(spark)

    from ibis_flink_example_spark.queries import QUERIES

    out_dir = os.path.join(REPO_ROOT, "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)

    # warmup (same as bench)
    t0 = time.perf_counter()
    QUERIES["over_range_sum_10s"](spark, args.sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    print(f"warmup {time.perf_counter() - t0:.2f}s", flush=True)

    for name in args.queries:
        fn = QUERIES[name]
        if not args.no_plan:
            df = fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(out_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        if args.plan_only:
            print(f"{name}: plan captured", flush=True)
            continue
        times = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"r16-measure: {name}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: median {median(times):.3f}s  "
            f"runs {[round(t, 3) for t in times]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

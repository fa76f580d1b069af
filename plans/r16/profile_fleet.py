#!/usr/bin/env python
"""Round-16 fleet profiler (VERDICT r15 #3): split every query's wall time
into (construction + internal driver actions) / Catalyst planning of the
final frame / execution, to localize the ~1 s/query fixed driver constant
the 8-vs-32-core bench exposed.

Usage:
  python plans/r16/profile_fleet.py                 # whole fleet, 1 rep
  python plans/r16/profile_fleet.py --queries a b   # subset
  python plans/r16/profile_fleet.py --cprofile N    # also cProfile the
                                                    # construction of the N
                                                    # cheapest-exec queries
Writes plans/r16/fleet_profile.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--cprofile", type=int, default=0)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from ibis_flink_example_spark.session import apply_session_conf, get_spark

    spark = get_spark(
        app_name="r16-fleet-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    apply_session_conf(spark)

    from ibis_flink_example_spark.queries import QUERIES

    names = args.queries or list(QUERIES)

    # warmup (same as bench)
    t0 = time.perf_counter()
    QUERIES["over_range_sum_10s"](spark, args.sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    print(f"warmup {time.perf_counter() - t0:.2f}s", flush=True)

    rows = {}
    for name in names:
        fn = QUERIES[name]
        best = None
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"r16-profile: {name}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            # force Catalyst end-to-end planning of the final frame
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            spark.sparkContext.setJobDescription(None)
            cur = {
                "build": round(t1 - t0, 4),
                "plan": round(t2 - t1, 4),
                "exec": round(t3 - t2, 4),
                "total": round(t3 - t0, 4),
            }
            if best is None or cur["total"] < best["total"]:
                best = cur
        rows[name] = best
        print(
            f"{name}: build {best['build']:.2f} plan {best['plan']:.2f} "
            f"exec {best['exec']:.2f}",
            flush=True,
        )

    summary = {
        "n": len(rows),
        "build_sum": round(sum(r["build"] for r in rows.values()), 2),
        "plan_sum": round(sum(r["plan"] for r in rows.values()), 2),
        "exec_sum": round(sum(r["exec"] for r in rows.values()), 2),
        "total_sum": round(sum(r["total"] for r in rows.values()), 2),
    }
    print(json.dumps(summary), flush=True)

    out = args.out or os.path.join(REPO_ROOT, "plans", "r16", "fleet_profile.json")
    with open(out, "w") as f:
        json.dump({"summary": summary, "queries": rows}, f, indent=1)

    if args.cprofile:
        # cProfile the CONSTRUCTION phase of the N queries with the largest
        # build share, aggregated, to find shared Python-side hotspots.
        import cProfile
        import pstats

        worst = sorted(rows, key=lambda n: rows[n]["build"], reverse=True)[
            : args.cprofile
        ]
        pr = cProfile.Profile()
        for name in worst:
            fn = QUERIES[name]
            pr.enable()
            df = fn(spark, args.sf_dir)
            pr.disable()
            df.write.format("noop").mode("overwrite").save()
        st = pstats.Stats(pr)
        st.sort_stats("cumulative")
        st.dump_stats(os.path.join(REPO_ROOT, "plans", "r16", "build.prof"))
        st.print_stats(40)

    spark.stop()


if __name__ == "__main__":
    main()

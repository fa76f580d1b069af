#!/usr/bin/env python
"""Deterministic structure evidence (r16): count Spark JOBS and STAGES a
query submits, via the DAGScheduler's monotonically increasing id counters.
Job/stage counts are load-independent — the right A/B metric on a host with
random CPU-steal spikes where wall timings swing 5-10x.

Usage: python plans/r16/count_jobs.py q1 [q2 ...]
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from ibis_flink_example_spark.session import apply_session_conf, get_spark

    spark = get_spark(
        app_name="r16-count-jobs",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    apply_session_conf(spark)

    from ibis_flink_example_spark.queries import QUERIES

    sched = spark.sparkContext._jsc.sc().dagScheduler()

    def counters():
        # py4j auto-unwraps the AtomicInteger via its int value on some
        # versions; handle both shapes
        j, s = sched.nextJobId(), sched.nextStageId()
        return (
            j if isinstance(j, int) else j.get(),
            s if isinstance(s, int) else s.get(),
        )

    # warmup
    QUERIES["over_range_sum_10s"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        j0, s0 = counters()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        j1, s1 = counters()
        print(f"{name}: jobs {j1 - j0}  stages {s1 - s0}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Quality-gating and audit pass on this engine — runnable as-is.

Companion to curation_pipeline_demo.py (which chains the filter ->
dedup -> weight -> shard spine): this demo chains the AUDIT surface
added in round 11 — the stages that decide thresholds and catch the
failure modes the spine would otherwise propagate. Each stage is a
registered operator with its own DuckDB-verified query twin:

  raw documents
    -> Gopher rule flags          (operators/text.py:gopher_flags)
    -> duplicate provenance       (queries_llm: dup inflation shape)
    -> KS drift check A/B         (operators/evaluation.py:ks_two_sample)
    -> priority-sampled review    (operators/sampling.py:priority_sample)
    -> 5-fold plan balance        (stratified k-fold occupancy)

Run:  python examples/quality_gate_demo.py
Env:  SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ibis_flink_example_spark.catalog import load_table  # noqa: E402
from ibis_flink_example_spark.operators.evaluation import (  # noqa: E402
    ks_two_sample,
)
from ibis_flink_example_spark.operators.sampling import (  # noqa: E402
    hex_prefix_int_sql,
    priority_sample,
)
from ibis_flink_example_spark.operators.text import gopher_flags  # noqa: E402
from ibis_flink_example_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name="quality-gate-demo", master="local[8]")
    spark.sparkContext.setLogLevel("WARN")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. Gopher hard rules — the first gate a raw corpus hits. The
    # synthetic fixture vocabulary contains only one of the paper's
    # required words, so pass_req_words correctly fails corpus-wide;
    # the demo gates on the structural rules and reports both.
    flagged = gopher_flags(docs, "text", "doc_id")
    structural_pass = (
        F.col("pass_word_count")
        & F.col("pass_mean_word_len")
        & F.col("pass_symbol_ratio")
        & F.col("pass_alpha_frac")
        & F.col("pass_lines")
    )
    kept = docs.join(
        flagged.filter(structural_pass).select("doc_id"), "doc_id", "left_semi"
    )
    n1 = kept.count()
    n_full = flagged.filter(F.col("pass_gopher")).count()
    print(f"[1] gopher rules: {n0} docs -> {n1} pass structural rules "
          f"({n_full} would survive the full stack incl. required-words)")

    # 2. duplicate provenance — WHERE duplication comes from, per source
    fp = docs.select("source", F.md5("text").alias("h"))
    inflation = (
        fp.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("h").alias("n_distinct"),
        )
        .withColumn(
            "inflation_x1e6",
            F.expr("CAST(n_docs * 1000000 DIV n_distinct AS BIGINT)"),
        )
        .orderBy(F.desc("inflation_x1e6"))
    )
    worst = inflation.first()
    print(f"[2] dup provenance: worst source {worst['source']} at "
          f"{worst['inflation_x1e6'] / 1e6:.3f}x inflation")

    # 3. KS drift between two deterministic halves of the kept set —
    # the release gate a daily snapshot must pass before shipping
    halves = kept.select(
        F.length("text").cast("long").alias("v"),
        (F.col("doc_id") % 2 == 0).alias("is_a"),
    )
    ks = ks_two_sample(halves, value_col="v", group_col="is_a").first()
    verdict = "DRIFT" if ks["reject_05"] else "ok"
    print(f"[3] KS drift (length dist, half vs half): D={ks['d_x1e6'] / 1e6:.4f} "
          f"crit={ks['d_crit_05_x1e6'] / 1e6:.4f} -> {verdict}")

    # 4. priority-sampled human-review panel with weight estimates
    panel = priority_sample(
        kept.select("doc_id", F.length("text").alias("w")),
        id_col="doc_id",
        weight_col="w",
        k=10,
    )
    est_total = panel.agg(F.sum("est_weight")).first()[0]
    true_total = kept.agg(F.sum(F.length("text"))).first()[0]
    print(f"[4] review panel: 10 docs, DLT estimator covers "
          f"{est_total}/{true_total} chars "
          f"({100 * est_total / max(true_total, 1):.0f}% of true mass)")

    # 5. fold balance audit before any fold-wise metric is trusted
    fold_sql = (
        hex_prefix_int_sql(
            "substr(md5(CAST(doc_id AS STRING) || ':fold'), 1, 4)", 4
        )
        + " % 5"
    )
    occ = (
        kept.select("lang", F.expr(fold_sql).alias("fold"))
        .groupBy("fold")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("fold")
    )
    counts = [r["n"] for r in occ.collect()]
    print(f"[5] 5-fold plan: per-fold sizes {counts} "
          f"(spread {max(counts) - min(counts)} docs)")

    spark.stop()
    print("quality gate demo: done")


if __name__ == "__main__":
    main()

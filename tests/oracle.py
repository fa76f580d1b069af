"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a registered Spark query and its oracle SQL side-by-side on the same
parquet fixtures, then compares row count, column names, and values after
sorting columns by name and rows by all columns — an order-insensitive,
EXACT comparison (floats must match bit-for-bit, which our decimal-exact
aggregation strategy guarantees; see functions/exact.py).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from ibis_flink_example_spark.catalog import FIXTURE_TABLES, table_path


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for name in FIXTURE_TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con.execute(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows by all columns."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    if sorted(a.columns) != sorted(b.columns):
        problems.append(f"columns differ: spark={sorted(a.columns)} oracle={sorted(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} oracle={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        # Post-normalization dtype divergence (e.g. DuckDB window SUM →
        # HUGEINT → object) fails the external comparator on types even when
        # values match — surface it here, not at the gate.
        if str(av.dtype) != str(bv.dtype):
            problems.append(
                f"col {c}: dtype differs after normalize: "
                f"spark={av.dtype} oracle={bv.dtype}"
            )
            continue
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            neq = ~((av == bv) | (av.isna() & bv.isna()))
            if neq.any():
                i = int(neq.idxmax())
                diff = float(
                    max(
                        abs(x - y)
                        for x, y in zip(av[neq], bv[neq])
                        if not (math.isnan(x) or math.isnan(y))
                    )
                    if not (av[neq].isna().any() or bv[neq].isna().any())
                    else float("nan")
                )
                problems.append(
                    f"col {c}: {int(neq.sum())} float mismatches, first at row {i}: "
                    f"spark={av[i]!r} oracle={bv[i]!r} (max abs diff {diff})"
                )
        else:
            try:
                eq = (av == bv) | (av.isna() & bv.isna())
            except Exception:
                eq = av.astype(str) == bv.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches, first at row {i}: "
                    f"spark={av[i]!r} oracle={bv[i]!r}"
                )
    return problems


# Queries whose plans legitimately contain BroadcastNestedLoopJoin: every
# entry is either THE cross-join query or a documented one-row
# scalar-broadcast crossJoin (a broadcast of a single aggregate row is
# O(n) work — the idiom this repo uses to attach scalars without a
# shuffle). Any OTHER query growing a BNLJ is a plan regression: at
# 100 TB an accidental nested-loop join against a non-tiny side is the
# classic silent killer. Keep this list in sync ON PURPOSE — adding a
# name is a design decision, not a test fix.
BNLJ_ALLOWED = {
    "join_cross",
    # one-row scalar-broadcast crossJoins:
    "cms_term_counts", "streaming_cms_user_counts", "hll_daily_users_merge",
    "kll_daily_value_quantiles", "stats_mad_value", "ann_recall_ivf",
    "minhash_vs_exact_pairs", "tpch_q11_important_stock",
    "tpch_q22_global_sales_opportunity", "cosine_topk",
    # cosine_topk's shape: the 5-row anchor frame broadcast over the scan
    "hard_negative_mining",
    "simhash_exact_dup_coverage", "text_tfidf_top_terms",
    "doc_unigram_surprisal", "sample_lang_balanced",
    "split_group_aware_events", "gap_fill_locf", "conversion_latency_stats",
    "lang_distribution_drift", "snapshot_diff_orders",
    "domain_mixture_weights",
    # one-row (mu, slack) reference frame broadcast onto the daily rollup
    "cusum_revenue_shift",
    # one-row total-count frame broadcast onto the group ranks (keeps the
    # event_type windows hash-partitioned instead of a COUNT(*) OVER ()
    # SinglePartition)
    "quantile_normalize_value",
    # one-row (exact, est, tot_a, tot_b) scalar frames cross-joined to
    # assemble each estimate-vs-bound row
    "cms_join_size_estimate",
    # one-row (truth, candidate, verified, common) scalar frames
    # cross-joined to assemble the recall row
    "semdedup_lsh_recall",
    "semdedup_kmeans_recall",
    # one-row query-vector broadcast in the dense leg (the cosine_topk
    # shape, fused downstream with the BM25 leg)
    "rrf_hybrid_retrieval",
    # one-row HLL sketch frames cross-joined for inclusion-exclusion
    "hll_intersection_users",
    # one-row corpus-totals frames (T, N / T_raw, T_tgt, V) broadcast onto
    # the term-stat tables
    "bm25_topk_docs",
    "dsir_target_weights",
    # bm25's one-row corpus-totals frames + the one-row COUNT(gold)
    # recall-denominator frame broadcast onto the ≤25-row metric row
    "retrieval_ndcg_mrr",
    # one-row tau-threshold frame broadcast onto the k-row sample
    "priority_sample_topk",
    # the same one-row tau broadcast, over dup-cluster representatives
    "cluster_representative_sampling",
    # one-row (n_nodes, n_wedges, n_triangles) count frames cross-joined
    # to assemble the single summary row
    "triangle_count_copurchase",
    # the one-row bloom bitmap + one-row n_keys broadcast onto the probe
    # scan — the literal runtime-filter shape
    "bloom_semijoin_fpr",
    # one-row class-margin frame broadcast onto the per-term 2x2 counts
    "chi2_terms_by_lang",
    # one-row conformal-threshold frame broadcast onto the held-out half
    "conformal_score_threshold",
    # one-row corpus-count frame broadcast into the idf weights
    "sparse_cosine_neardup_pairs",
    # one-row total-bigram frame broadcast into the PMI bits
    "pmi_top_collocations",
    # cosine_topk's 5-row anchor broadcast, in both ranking legs
    "matryoshka_truncation_recall",
    # the same dual-leg 5-row anchor broadcast (float vs dequantized-int8)
    "int8_retrieval_agreement",
    # one-row CI frame broadcast onto the one-row point-estimate frame
    "poisson_bootstrap_mean_ci",
    # one-row max-norm / sign frames broadcast onto the 64-row vector in
    # each power-iteration step
    "embedding_top_pc",
    # one-row (xmax, ymax) frame broadcast for order-preserving range
    # quantization of the Morton key inputs
    "zorder_layout_plan",
    # the <= 2-row eval-set frame crossJoined with the domain-sized
    # source rollup to make zero-contamination cells explicit
    "contamination_leaderboard",
}

# Queries allowed to plan row-at-a-time Python evaluation
# (BatchEvalPython): only the Python UDTF — everything else must stay
# JVM-side or Arrow-batched.
PYTHON_ROW_ALLOWED = {"udtf_props_kv"}


# Audit coverage bookkeeping: every query name lands in exactly one set, and
# test_plan_hygiene_audited_everything asserts SKIPPED stays EMPTY — a broad
# silent except here would otherwise let an environmental break of the py4j
# explain path disable the whole fleet audit while every test stays green.
PLAN_AUDITED: set[str] = set()
PLAN_AUDIT_SKIPPED: set[str] = set()


def audit_plan_hygiene(name: str, sdf) -> list[str]:
    """Fleet-wide 100 TB plan hygiene, asserted on EVERY registered query
    as part of the oracle gate (zero extra executions — the gate already
    builds each DataFrame): no cartesian products anywhere, nested-loop
    joins only at documented one-row scalar broadcasts, row-at-a-time
    Python only in the UDTF."""
    from ibis_flink_example_spark.plans import formatted_plan, plan_ops_from_string

    problems: list[str] = []
    try:
        plan = formatted_plan(sdf)  # ONE explainString round-trip per query
    except Exception:
        PLAN_AUDIT_SKIPPED.add(name)
        return problems
    PLAN_AUDITED.add(name)
    ops = plan_ops_from_string(plan)
    if ops.get("CartesianProduct", 0):
        problems.append("plan contains CartesianProduct")
    if ops.get("BroadcastNestedLoopJoin", 0) and name not in BNLJ_ALLOWED:
        problems.append(
            "plan contains BroadcastNestedLoopJoin outside the documented "
            "scalar-broadcast whitelist (tests/oracle.py BNLJ_ALLOWED)"
        )
    if "BatchEvalPython" in plan and name not in PYTHON_ROW_ALLOWED:
        problems.append("plan contains row-at-a-time Python (BatchEvalPython)")
    return problems


def check_query(spark, name: str, sf_dir: str) -> list[str]:
    from ibis_flink_example_spark.queries import ORACLES, QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    problems = audit_plan_hygiene(name, sdf)
    spark_pdf = sdf.toPandas()
    if name not in ORACLES:
        return problems  # rows-only check (a failed query raises above)
    oracle_pdf = run_oracle(ORACLES[name], sf_dir)
    return problems + compare_frames(spark_pdf, oracle_pdf)

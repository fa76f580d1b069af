"""Classifier-evaluation operators for the LLM data pipeline.

The reference (claypotai/ibis-flink-example) has no model-eval surface;
this extends the north-star pipeline with the QA pass that sits between a
quality/language classifier and the sampling stage that consumes its
scores: CALIBRATION. A 100 TB curation stack thresholds billions of
documents on classifier scores — before trusting a threshold, you check
that a score of 0.8 actually means ~80% positives (the reliability
diagram / ECE decomposition).

Exactness design: scores enter as x1e6 fixed-point integers, bin
assignment is one integer multiply + floor-division, and every per-bin
statistic is derived from integer SUMs with a final positive-operand
floor division — Spark ``DIV`` and DuckDB ``//`` truncate identically on
non-negative operands, so the driver's value hash can never diverge.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def calibration_bins(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Reliability-diagram bins for a classifier score against a binary
    label: rows are bucketed by predicted score into ``n_bins`` equal-width
    bins, and each bin reports how often the label was actually positive —
    the table behind a calibration curve and the per-bin |confidence −
    accuracy| gaps that an expected-calibration-error (ECE) rollup weights.

    ``score_col`` must be an integer x1e6 fixed-point score in [0, 1e6]
    (the engine's standard exactness carrier); ``label_col`` a boolean.
    Bin k covers scores in [k/n_bins, (k+1)/n_bins) with the top edge
    closed (a perfect 1e6 lands in the last bin, via LEAST).

    Scale shape: one aggregation with map-side partial combine whose
    output cardinality is |groups| x n_bins — row-level data never crosses
    the exchange (the counts-of-counts discipline: the shuffle carries a
    few integer sums per bin, bounded regardless of corpus size). Bin
    assignment and the label cast are scan-stage expressions.

    Returns (group_cols..., bin, n_docs, n_pos, mean_score_x1e6,
    pos_rate_x1e6, gap_x1e6) — gap is the bin's |mean predicted − observed
    positive rate|, the quantity ECE averages n_docs-weighted.
    """
    if n_bins < 1:
        raise ValueError("calibration_bins: n_bins must be >= 1")
    bin_expr = F.least(
        F.lit(n_bins - 1).cast("long"),
        F.expr(f"CAST({score_col} AS BIGINT) * {n_bins} DIV 1000000"),
    )
    pos = F.col(label_col).cast("long")
    agged = (
        df.select(
            *group_cols,
            bin_expr.alias("bin"),
            pos.alias("__pos"),
            F.col(score_col).cast("long").alias("__score"),
        )
        .groupBy(*group_cols, "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__pos").cast("long").alias("n_pos"),
            F.sum("__score").cast("long").alias("__sum_score"),
        )
    )
    mean_score = F.expr("__sum_score DIV n_docs")
    pos_rate = F.expr("n_pos * 1000000 DIV n_docs")
    return agged.select(
        *group_cols,
        "bin",
        "n_docs",
        "n_pos",
        mean_score.alias("mean_score_x1e6"),
        pos_rate.alias("pos_rate_x1e6"),
        F.abs(mean_score - pos_rate).alias("gap_x1e6"),
    )


def stopword_lang_score_x1e6(text_col: str, markers: Sequence[str]) -> Column:
    """The cheap lexical language-confidence score this engine's lang-id
    heuristic implies, as an exact x1e6 integer: the fraction of
    whitespace words that are in the marker lexicon (lowercased). The
    classic use of :func:`calibration_bins` is checking THIS kind of
    heuristic score against gold labels before thresholding on it.
    Pure scan-stage column math (no shuffle)."""
    from ibis_flink_example_spark.operators.dedup import words
    from ibis_flink_example_spark.operators.text import bind_col

    low = sorted({m.lower() for m in markers})

    def body(ws: Column) -> Column:
        # words bound once (bind_col): num/den references otherwise
        # re-ran the regexp split per reference — 4 splits per row (r15)
        num = F.size(
            F.filter(ws, lambda w: F.lower(w).isin(low))
        ).cast("long") * F.lit(1_000_000).cast("long")
        den = F.greatest(F.size(ws), F.lit(1)).cast("long")
        # Exact integer division as Column math (Column `/` is float): strip
        # the remainder first, so the double division's true result is the
        # integer quotient itself (representable => correctly-rounded ==
        # exact; num <= 1e6 * n_words stays far under 2^53).
        return ((num - num % den) / den).cast("long")

    return bind_col(words(text_col), body)


def _score_class_counts(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Counts-of-counts collapse shared by the ROC operators: one
    aggregation with map-side combine from corpus rows to one row per
    DISTINCT (group..., score) — (group_cols..., score, n_pos, n_neg).
    For an x1e6 fixed-point score the output is bounded by
    |groups| x the score DOMAIN (<= 1e6 + 1 rows per group) no matter
    the corpus size, so everything downstream runs on a small frame.

    Rows with a NULL score or NULL label are EXCLUDED (an unscored or
    unlabeled row carries no ranking evidence) — made explicit because
    Spark windows order NULLs FIRST while DuckDB orders them LAST, so a
    NULL leaking into the cumulative windows would diverge engine vs
    oracle instead of failing loudly. Oracles must mirror the exclusion."""
    pos = F.col(label_col).cast("long")
    return (
        df.filter(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())
        .select(
            *group_cols,
            F.col(score_col).cast("long").alias("score"),
            pos.alias("__p"),
        )
        .groupBy(*group_cols, "score")
        .agg(
            F.sum("__p").cast("long").alias("n_pos"),
            (F.count(F.lit(1)) - F.sum("__p")).cast("long").alias("n_neg"),
        )
    )


# the tie-aware Mann-Whitney x2 numerator term — shared by the global and
# grouped AUC arms so a scale/NULL fix can never silently miss one of them
_AUC_CONTRIB = (
    "CAST(n_pos AS DECIMAL(38,0)) * "
    "(2 * CAST(__neg_below AS DECIMAL(38,0)) + n_neg)"
)


def roc_threshold_sweep(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Threshold sweep for a binary classifier score — the decision table
    behind picking an operating point: for every observed score t (the
    rule "predict positive iff score >= t"), the confusion counts and the
    derived rates, all integer-exact. The ROC curve is (fpr, tpr) over
    these rows; precision/recall and F1 give the PR view of the same
    sweep.

    ``score_col`` must be an integer x1e6 score (standard exactness
    carrier); ``label_col`` boolean. Requires both classes present
    (rates divide by the class totals).

    Scale shape: the corpus collapses to the distinct-score frame first
    (:func:`_score_class_counts` — bounded by the score domain, not the
    corpus); the cumulative windows and totals then run over that small
    frame. Its single-partition window is the PPS bucket-rollup posture:
    <= 1e6 + 1 rows regardless of corpus size. Rates are positive-operand
    floor divisions in DECIMAL(38,0) (Spark DIV == DuckDB // there).

    Returns (threshold, tp, fp, fn, tn, tpr_x1e6, fpr_x1e6,
    precision_x1e6, f1_x1e6), one row per distinct score, descending.
    """
    g = _score_class_counts(df, score_col=score_col, label_col=label_col)
    w_cum = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = g.select(
        F.col("score").alias("threshold"),
        F.sum("n_pos").over(w_cum).cast("long").alias("tp"),
        F.sum("n_neg").over(w_cum).cast("long").alias("fp"),
        F.sum("n_pos").over(w_all).cast("long").alias("__np"),
        F.sum("n_neg").over(w_all).cast("long").alias("__nn"),
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    tp, fp = dec.format("tp"), dec.format("fp")
    return c.select(
        "threshold",
        "tp",
        "fp",
        (F.col("__np") - F.col("tp")).alias("fn"),
        (F.col("__nn") - F.col("fp")).alias("tn"),
        F.expr(f"({tp} * 1000000) DIV __np").cast("long").alias("tpr_x1e6"),
        F.expr(f"({fp} * 1000000) DIV __nn").cast("long").alias("fpr_x1e6"),
        F.expr(f"({tp} * 1000000) DIV (tp + fp)")
        .cast("long")
        .alias("precision_x1e6"),
        F.expr(f"({tp} * 2000000) DIV (tp + __np + fp)")
        .cast("long")
        .alias("f1_x1e6"),
    )


def roc_auc(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """ROC-AUC as the exact rank statistic (the Mann-Whitney U view): AUC
    = P(score_pos > score_neg) + ½·P(tie). Computed tie-aware from the
    distinct-score frame — each score s with (n_pos, n_neg) contributes
    ``n_pos * (2·neg_below(s) + n_neg(s))`` to the x2 numerator, so ties
    contribute exactly half. No trapezoid approximation, no floats: the
    numerator and the 2·N⁺·N⁻ denominator are exact integers in
    DECIMAL(38,0) (products reach n² — far past int64 at corpus scale),
    with ONE final positive-operand floor division to x1e6.

    Same scale shape as :func:`roc_threshold_sweep`: corpus → distinct-
    score counts (score-domain-bounded), one cumulative window over that
    small frame, one global rollup. Requires both classes present.

    Returns ONE row: (n_pos, n_neg, auc_x1e6).
    """
    g = _score_class_counts(df, score_col=score_col, label_col=label_col)
    w_below = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, -1
    )
    c = g.select(
        "n_pos",
        "n_neg",
        F.coalesce(F.sum("n_neg").over(w_below), F.lit(0))
        .cast("long")
        .alias("__neg_below"),
    )
    agg = c.agg(
        F.sum("n_pos").cast("long").alias("n_pos"),
        F.sum("n_neg").cast("long").alias("n_neg"),
        F.sum(F.expr(_AUC_CONTRIB)).alias("__num_x2"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.expr(
            "(__num_x2 * 1000000) DIV "
            "(2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg)"
        )
        .cast("long")
        .alias("auc_x1e6"),
    )


def average_precision(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Average precision (the area under the precision-recall curve in
    its standard step form): AP = Σ_g ΔR_g · P_g over distinct-score
    groups descending — each group of ``n_pos_g`` positives contributes
    its recall increment times the precision at its threshold. The PR
    twin of :func:`roc_auc`: AUC ranks the classifier against the
    negative class; AP weights performance by the positive class, which
    is what a rare-positive curation filter actually cares about.

    Exactness: AP_x1e6 = (Σ_g n_pos_g · (tp_g·1e6 DIV (tp_g+fp_g)))
    DIV n_pos — two nested positive-operand floor divisions mirrored
    verbatim in the oracle (both engines truncate identically), products
    in DECIMAL(38,0). Same scale shape as roc_auc: one counts-of-counts
    collapse, cumulative windows over the score-domain-bounded frame.
    NULL scores/labels are excluded (see _score_class_counts).

    Returns ONE row: (n_pos, n_neg, ap_x1e6).
    """
    g = _score_class_counts(df, score_col=score_col, label_col=label_col)
    w_cum = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = g.select(
        "n_pos",
        "n_neg",
        F.sum("n_pos").over(w_cum).cast("long").alias("__tp"),
        F.sum("n_neg").over(w_cum).cast("long").alias("__fp"),
    )
    prec = "(CAST(__tp AS DECIMAL(38,0)) * 1000000) DIV (__tp + __fp)"
    agg = c.agg(
        F.sum("n_pos").cast("long").alias("n_pos"),
        F.sum("n_neg").cast("long").alias("n_neg"),
        F.sum(F.expr(f"CAST(n_pos AS DECIMAL(38,0)) * ({prec})")).alias(
            "__num"
        ),
    )
    # NULL (not an ANSI divide-by-zero) when there are no positives —
    # AP over an all-negative input does not exist; mirrors DuckDB's
    # `x // 0 -> NULL` so the oracle agrees by construction
    return agg.select(
        "n_pos",
        "n_neg",
        F.expr(
            "CASE WHEN n_pos = 0 THEN NULL "
            "ELSE CAST(__num DIV n_pos AS BIGINT) END"
        ).alias("ap_x1e6"),
    )


def roc_auc_by_group(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
    group_cols: Sequence[str],
) -> DataFrame:
    """Per-group exact ROC-AUC — the grouped arm of :func:`roc_auc`, the
    same shape calibration_by_source gives the reliability diagram: a
    classifier can rank well in aggregate yet be inverted inside one
    domain. Groups missing a class get a NULL auc (there is no ranking
    to measure) instead of a divide-by-zero.

    Scale shape: the collapse keys on (group, score) — output bounded by
    |groups| x score domain; the cumulative window partitions BY GROUP
    (parallel across groups, never single-partition).

    Returns one row per group: (group_cols..., n_pos, n_neg, auc_x1e6).
    """
    if not group_cols:
        raise ValueError("roc_auc_by_group: need group_cols (else roc_auc)")
    g = _score_class_counts(
        df, score_col=score_col, label_col=label_col, group_cols=group_cols
    )
    w_below = (
        Window.partitionBy(*group_cols)
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = g.select(
        *group_cols,
        "n_pos",
        "n_neg",
        F.coalesce(F.sum("n_neg").over(w_below), F.lit(0))
        .cast("long")
        .alias("__neg_below"),
    )
    agg = c.groupBy(*group_cols).agg(
        F.sum("n_pos").cast("long").alias("n_pos"),
        F.sum("n_neg").cast("long").alias("n_neg"),
        F.sum(F.expr(_AUC_CONTRIB)).alias("__num_x2"),
    )
    auc = (
        "CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL "
        "ELSE CAST((__num_x2 * 1000000) DIV "
        "(2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT) END"
    )
    return agg.select(
        *group_cols, "n_pos", "n_neg", F.expr(auc).alias("auc_x1e6")
    )


# Rank discounts for nDCG, precomputed in Python as integer literals:
# DCG_DISCOUNT_X1E6[r-1] = round(1e6 / log2(r + 1)). Embedding LITERALS
# (not engine-evaluated log2) removes the transcendental from both sides
# of the oracle comparison entirely — the one place the whole-bit floor
# argument (operators/retrieval.py) does not apply, because 1/log2(r+1)
# lands arbitrarily close to quantization boundaries for some r.
def _dcg_discounts_x1e6(k: int) -> list[int]:
    import math

    return [round(1_000_000 / math.log2(r + 1)) for r in range(1, k + 1)]


def ranking_metrics(
    ranked: DataFrame,
    gold: DataFrame,
    *,
    id_col: str,
    order_cols: Sequence[str] = ("score_x1e6",),
    k: int = 10,
) -> DataFrame:
    """Retrieval-ranking QA: nDCG@k, MRR, precision/recall@k of a ranked
    candidate list against a gold relevant-document set — the metric pass
    that closes the retrieval loop (BM25/dense rankers are judged by
    ranking quality, not by their own scores).

    ``ranked`` is the top-N candidate frame (N small, e.g. 25 — already
    the output of a TakeOrderedAndProject top-k); ``gold`` is the
    corpus-scale relevant set (only its ids are consumed). Ranks are
    recomputed here as ``row_number() over (order_cols DESC, id ASC)`` so
    the metric never trusts incoming row order; that window runs over the
    ≤N-row candidate frame — bounded, never corpus-scale.

    Scale shape: gold is reduced by a BROADCAST semi-join against the ≤N
    candidate ids (the corpus-sized side never shuffles); the only
    corpus-scale aggregation is COUNT(gold) for the recall denominator,
    riding a one-row broadcast. All metrics are integers: DCG uses the
    precomputed x1e6 discount literals (same literals in any oracle), and
    every ratio is one final positive-operand floor division.

    Returns ONE row: (k, n_rel_total, hits_at_k, first_rel_rank,
    mrr_x1e6, dcg_at_k, idcg_at_k, ndcg_at_k_x1e6, precision_at_k_x1e6,
    recall_at_k_x1e6). ``first_rel_rank``/``mrr_x1e6`` are 0 when no
    relevant doc appears in the candidate list; nDCG/recall are NULL when
    the gold set is empty.
    """
    disc = _dcg_discounts_x1e6(k)
    cum = [sum(disc[: j + 1]) for j in range(k)]
    w = Window.orderBy(
        *[F.col(c).desc() for c in order_cols], F.col(id_col).asc()
    )
    cand = ranked.select(
        F.col(id_col).alias("__id"), F.row_number().over(w).alias("rank")
    )
    gold_ids = gold.select(F.col(id_col).alias("__id")).distinct()
    n_rel = gold_ids.agg(F.count(F.lit(1)).cast("long").alias("n_rel_total"))
    hits = gold_ids.join(F.broadcast(cand), "__id").select("rank")
    disc_arr = F.array(*[F.lit(d).cast("long") for d in disc])
    cum_arr = F.array(*[F.lit(c).cast("long") for c in cum])
    agg = hits.agg(
        F.count(F.when(F.col("rank") <= k, 1)).cast("long").alias("hits_at_k"),
        F.coalesce(F.min("rank"), F.lit(0)).cast("long").alias("first_rel_rank"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("rank") <= k, F.element_at(disc_arr, F.col("rank"))
                ).otherwise(F.lit(0))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("dcg_at_k"),
    )
    out = agg.crossJoin(F.broadcast(n_rel)).select(
        F.lit(k).cast("long").alias("k"),
        "n_rel_total",
        "hits_at_k",
        "first_rel_rank",
        F.when(F.col("first_rel_rank") > 0, F.expr("1000000 DIV first_rel_rank"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("mrr_x1e6"),
        "dcg_at_k",
        F.when(
            F.col("n_rel_total") > 0,
            F.element_at(cum_arr, F.least(F.col("n_rel_total"), F.lit(k)).cast("int")),
        ).alias("idcg_at_k"),
        F.when(
            F.col("n_rel_total") > 0,
            F.expr(
                "CAST(dcg_at_k AS DECIMAL(38,0)) * 1000000 DIV "
                f"element_at(array({', '.join(str(c) + 'L' for c in cum)}), "
                f"CAST(least(n_rel_total, {k}) AS INT))"
            ),
        )
        .cast("long")
        .alias("ndcg_at_k_x1e6"),
        F.expr(f"hits_at_k * 1000000 DIV {k}").cast("long").alias("precision_at_k_x1e6"),
        F.when(
            F.col("n_rel_total") > 0,
            F.expr("hits_at_k * 1000000 DIV n_rel_total"),
        )
        .cast("long")
        .alias("recall_at_k_x1e6"),
    )
    return out


# Two-sided KS critical-value coefficient c(alpha=0.05) = sqrt(-ln(0.025)/2)
# as a fixed literal (x1e6) — embedding the CONSTANT keeps ln out of both
# engines (the ranking_metrics discount-literal argument).
KS_CRIT_05_X1E6 = 1_358_102


def ks_two_sample(
    df: DataFrame,
    *,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between the rows
    where boolean ``group_col`` is true (sample A) and false (sample B):
    D = sup_x |F_A(x) − F_B(x)| — the distribution-level drift test that
    complements the moment-level Welch t (a shifted tail with equal means
    is invisible to t, loud in D).

    Exactness: ``value_col`` must be integer-valued (quantize upstream —
    cents, x1e6 scores). The ECDF difference at each distinct value is
    the INTEGER |cum_a·n_b − cum_b·n_a| (DECIMAL(38,0) products), so the
    sup and its argmax are engine-exact; D itself is one final floor
    division to x1e6. The α=0.05 decision compares integers after an
    identical double chain (sqrt is IEEE-correctly-rounded; the c(α)
    coefficient is a fixed literal — no transcendental is ever evaluated).

    Scale shape (the ROC-collapse idiom): the corpus collapses to
    per-distinct-value class counts FIRST — the only corpus-scale pass is
    that aggregation; the cumulative windows run over the value-DOMAIN
    frame (score-domain-bounded, cf. roc_threshold_sweep).

    Returns ONE row: (n_a, n_b, d_x1e6, d_at_value, d_crit_05_x1e6,
    reject_05). ``d_at_value`` is the smallest value attaining the sup.
    Requires both samples nonempty (integer division by n_a·n_b).
    """
    g = (
        df.select(
            F.col(value_col).cast("long").alias("value"),
            F.col(group_col).cast("boolean").alias("__is_a"),
        )
        .groupBy("value")
        .agg(
            F.count(F.when(F.col("__is_a"), 1)).cast("long").alias("ca"),
            F.count(F.when(~F.col("__is_a"), 1)).cast("long").alias("cb"),
        )
    )
    w_cum = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = g.select(
        "value",
        F.sum("ca").over(w_cum).cast("long").alias("cum_a"),
        F.sum("cb").over(w_cum).cast("long").alias("cum_b"),
        F.sum("ca").over(w_all).cast("long").alias("n_a"),
        F.sum("cb").over(w_all).cast("long").alias("n_b"),
    ).withColumn(
        "__diff",
        F.expr(
            "abs(CAST(cum_a AS DECIMAL(38,0)) * n_b "
            "- CAST(cum_b AS DECIMAL(38,0)) * n_a)"
        ),
    )
    dmax = c.withColumn("__dmax", F.max("__diff").over(w_all))
    agg = dmax.agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.max("__diff").alias("__d"),
        F.min(F.when(F.col("__diff") == F.col("__dmax"), F.col("value")))
        .cast("long")
        .alias("d_at_value"),
    )
    return agg.select(
        "n_a",
        "n_b",
        F.expr("CAST(__d * 1000000 DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)")
        .alias("d_x1e6"),
        "d_at_value",
        F.expr(
            f"CAST(floor({KS_CRIT_05_X1E6} * sqrt("
            "(CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))"
            " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))) AS BIGINT)"
        ).alias("d_crit_05_x1e6"),
    ).withColumn(
        "reject_05", F.col("d_x1e6") > F.col("d_crit_05_x1e6")
    )


def ks_vs_pooled(
    counts: DataFrame,
    *,
    group_cols: Sequence[str],
    value_col: str,
    count_col: str,
) -> DataFrame:
    """Per-group exact KS distance against the POOLED distribution — the
    drift monitor form: given pre-aggregated (group, value, count) rows
    (e.g. closed streaming windows), compute for every group
    D_g = sup_x |F_g(x) − F_pool(x)| where the pool is all groups
    together (the group under test included, the standard control-chart
    convention: the reference is the long-run mixture).

    Exactness — the sup over a CONTINUOUS x is reduced to per-row integer
    arithmetic: |F_g − F_pool| can only attain its sup at a jump of
    either ECDF. At each of the group's own values v the candidate gaps
    are the right-limit gap |cum_g(v)·n_pool − cum_pool(v)·n_g| and the
    LEFT-limit gap |(cum_g(v)−c_g(v))·n_pool − (cum_pool(v)−c_pool(v))·n_g|
    — the latter also dominates every pool-only jump in the open interval
    below v (F_g is constant there while F_pool rises monotonically to
    its left limit at v), including the interval below the group's first
    value. So max over the group's rows of max(gap, gap_pre) IS the sup,
    with only equi-joins and group-partitioned windows — no group×domain
    grid, no cartesian.

    Scale shape: the pooled cumulative runs over the value-DOMAIN frame
    (the ROC-collapse bound); per-group cumulatives partition by group
    (parallel); n_pool rides the pooled frame's own unbounded window into
    the equi-join — no one-row crossJoin anywhere.

    Returns one row per group: (*group_cols, n_group, n_pool, d_x1e6).
    """
    gcols = list(group_cols)
    g = counts.select(
        *gcols,
        F.col(value_col).cast("long").alias("__v"),
        F.col(count_col).cast("long").alias("__c"),
    )
    w_ref_cum = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    w_ref_all = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ref = (
        g.groupBy("__v")
        .agg(F.sum("__c").cast("long").alias("__cref"))
        .select(
            "__v",
            "__cref",
            F.sum("__cref").over(w_ref_cum).cast("long").alias("__cum_ref"),
            F.sum("__cref").over(w_ref_all).cast("long").alias("__n_pool"),
        )
    )
    w_g_cum = (
        Window.partitionBy(*gcols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_g_all = (
        Window.partitionBy(*gcols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    j = (
        g.select(
            *gcols,
            "__v",
            "__c",
            F.sum("__c").over(w_g_cum).cast("long").alias("__cum_g"),
            F.sum("__c").over(w_g_all).cast("long").alias("__n_g"),
        )
        .join(ref, "__v")
        .withColumn(
            "__gap",
            F.expr(
                "abs(CAST(__cum_g AS DECIMAL(38,0)) * __n_pool "
                "- CAST(__cum_ref AS DECIMAL(38,0)) * __n_g)"
            ),
        )
        .withColumn(
            "__gap_pre",
            F.expr(
                "abs(CAST(__cum_g - __c AS DECIMAL(38,0)) * __n_pool "
                "- CAST(__cum_ref - __cref AS DECIMAL(38,0)) * __n_g)"
            ),
        )
    )
    return (
        j.groupBy(*gcols)
        .agg(
            F.max("__n_g").alias("n_group"),
            F.max("__n_pool").alias("n_pool"),
            F.max(F.greatest(F.col("__gap"), F.col("__gap_pre"))).alias("__d"),
        )
        .select(
            *gcols,
            "n_group",
            "n_pool",
            F.expr(
                "CAST(__d * 1000000 "
                "DIV (CAST(n_group AS DECIMAL(38,0)) * n_pool) AS BIGINT)"
            ).alias("d_x1e6"),
        )
    )


def cohen_kappa_by_group(
    df: DataFrame,
    *,
    rater_a_col: str,
    rater_b_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Chance-corrected inter-rater agreement (Cohen's kappa) between two
    BOOLEAN rater columns, per group — the QA readout for any pair of
    labeling passes (two quality classifiers, a heuristic vs a model
    judge, annotator A vs B): raw agreement is inflated whenever one
    label dominates; kappa subtracts the agreement two independent
    raters with these marginals would reach by luck.

    Exactness: kappa = (n·(n11+n00) − (a1·b1 + a0·b0)) /
    (n² − (a1·b1 + a0·b0)) entirely in int64/decimal products; the
    x1e6 fixed-point result uses SIGN-FACTORED truncating division
    (kappa is negative when raters agree less than chance, and Spark's
    DIV truncates toward zero while other engines floor — factoring the
    sign makes both divide non-negative integers). A degenerate group
    where chance agreement is total (pe = 1, all four marginal products
    collapse) reports NULL instead of 0/0.

    NULL votes (abstentions) are EXCLUDED before counting: a row either
    rater skipped belongs to neither marginal, and counting it in
    ``n_docs`` while the four agreement cells drop it would silently
    deflate both po and pe against an inflated n — a plausible-looking
    but wrong kappa. Only fully-rated rows enter every statistic.

    Scale shape: ONE grouped aggregation with map-side partials over the
    scan-stage rater columns; everything after is per-group scalar math.
    Returns (*group_cols, n_docs, n_both_pos, n_both_neg, n_only_a,
    n_only_b, kappa_x1e6).
    """
    gcols = list(group_cols)
    a = F.col(rater_a_col)
    b = F.col(rater_b_col)
    df = df.filter(a.isNotNull() & b.isNotNull())
    agg = df.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count(F.when(a & b, 1)).cast("long").alias("n_both_pos"),
        F.count(F.when(~a & ~b, 1)).cast("long").alias("n_both_neg"),
        F.count(F.when(a & ~b, 1)).cast("long").alias("n_only_a"),
        F.count(F.when(~a & b, 1)).cast("long").alias("n_only_b"),
    )
    return agg.select(
        *gcols,
        "n_docs",
        "n_both_pos",
        "n_both_neg",
        "n_only_a",
        "n_only_b",
        F.expr(
            """CAST(CASE
  WHEN CAST(n_docs AS DECIMAL(38,0)) * n_docs
       - ((n_both_pos + n_only_a) * CAST(n_both_pos + n_only_b AS DECIMAL(38,0))
          + (n_both_neg + n_only_b) * CAST(n_both_neg + n_only_a AS DECIMAL(38,0))) = 0
  THEN NULL
  ELSE (CASE WHEN n_docs * CAST(n_both_pos + n_both_neg AS DECIMAL(38,0))
             - ((n_both_pos + n_only_a) * CAST(n_both_pos + n_only_b AS DECIMAL(38,0))
                + (n_both_neg + n_only_b) * CAST(n_both_neg + n_only_a AS DECIMAL(38,0))) >= 0
        THEN 1 ELSE -1 END)
     * (abs(n_docs * CAST(n_both_pos + n_both_neg AS DECIMAL(38,0))
            - ((n_both_pos + n_only_a) * CAST(n_both_pos + n_only_b AS DECIMAL(38,0))
               + (n_both_neg + n_only_b) * CAST(n_both_neg + n_only_a AS DECIMAL(38,0)))) * 1000000
        DIV (CAST(n_docs AS DECIMAL(38,0)) * n_docs
             - ((n_both_pos + n_only_a) * CAST(n_both_pos + n_only_b AS DECIMAL(38,0))
                + (n_both_neg + n_only_b) * CAST(n_both_neg + n_only_a AS DECIMAL(38,0)))))
END AS BIGINT)"""
        ).alias("kappa_x1e6"),
    )

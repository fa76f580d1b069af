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

from pyspark.sql import Column, DataFrame
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
    from ibis_flink_example_spark.operators.text import marker_hits

    num = marker_hits(text_col, list(markers)).cast("long") * F.lit(
        1_000_000
    ).cast("long")
    den = F.greatest(F.size(words(text_col)), F.lit(1)).cast("long")
    # Exact integer division as Column math (Column `/` is float): strip
    # the remainder first, so the double division's true result is the
    # integer quotient itself (representable => correctly-rounded ==
    # exact; num <= 1e6 * n_words stays far under 2^53).
    return ((num - num % den) / den).cast("long")

"""Query registry: every implemented operator from SURVEY.md §2 as a named
(spark_query, oracle_sql) pair consumed by ``__spark_entry__.py``.

Conventions (driver contract):
- each query callable takes ``(spark, sf_dir)`` and returns a DataFrame;
- every computed column is aliased IDENTICALLY in the Spark code and the
  DuckDB oracle SQL (the driver sorts columns by name before value-hashing);
- double aggregates go through DECIMAL(18,2) (functions/exact.py) so values
  are bit-identical across engines and partition orders;
- outputs avoid nondeterminism: no arbitrary-row picks, ties broken by keys.

Registration: use the ``@query(name, oracle=...)`` decorator; ``QUERIES`` /
``ORACLES`` are the assembled dicts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
# Names registered with oracle=None — genuinely non-SQL-expressible operators
# (the driver records a weaker rows-only check for these; tests enforce the
# set stays explicit and small).
NON_SQL_EXPRESSIBLE: set[str] = set()


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` marks a non-SQL-expressible op
    (driver falls back to a rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        else:
            NON_SQL_EXPRESSIBLE.add(name)
        return fn

    return deco


# Import side-effect modules that register queries.
from ibis_flink_example_spark import queries_reference  # noqa: E402,F401
from ibis_flink_example_spark import queries_relational  # noqa: E402,F401
from ibis_flink_example_spark import queries_tpch  # noqa: E402,F401
from ibis_flink_example_spark import queries_llm  # noqa: E402,F401
from ibis_flink_example_spark import queries_sampling  # noqa: E402,F401
from ibis_flink_example_spark import queries_streaming  # noqa: E402,F401
from ibis_flink_example_spark import queries_warehouse  # noqa: E402,F401
from ibis_flink_example_spark import queries_analytics  # noqa: E402,F401

# The external correctness harness verifies the FIRST 50 registry entries
# against their DuckDB oracles, so registry order is a verification budget.
# Round-9 rotation (VERDICT r8 top-next, executed verbatim): first-rows
# for every oracle-bearing query that has NEVER had an external driver
# row — the five late-r8 registrations plus the SEVEN new r9 operators
# (RRF hybrid fusion, calibration bins + per-domain arm, streaming
# near-dup ingest, PPS systematic sampling, rendezvous shard planning,
# inverted-index posting lists) — then connected_components_distributed
# (its operator gained the converged-or-raise contract this round; the
# query opts out explicitly, so the row re-proves behavioral identity),
# then EVERY query whose most recent green row is r4-era (all 34 of
# them — after this window no green row is older than r5), and ONE
# r5-era row to seed that cohort's rotation (first-rows outrank
# re-verifies, so four r5 candidates ceded their slots — see the
# in-list note). bm25_topk_docs and embedding_top_pc double as
# re-verification of this round's BM25 semi-join-reduction and Gram-arm
# fixes. The r5-era backlog for r10 is the remaining ~40 rows.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # pinned sentinels (green every round; regression tripwires)
    "over_range_sum_10s",
    "dedup_exact",
    # first-rows: new this round (r10) — pHash image near-dup (X5 x X2),
    # classifier ROC QA, deterministic training-order assignment
    "image_blockhash_signatures",
    "image_phash_neardup_pairs",
    "roc_auc_lang_score",
    "roc_threshold_sweep",
    "epoch_shuffle_plan",
    # implementation/oracle touched this round (ADVICE r9 fixes:
    # checkpoint-handle propagation, PPS oracle ROWS frame, ingest
    # re-delivery note + shingle_match_ids None-check; dedup_simhash_pairs
    # rides the hamming_band_pairs factoring)
    "rrf_hybrid_retrieval",
    "pps_systematic_sample",
    "streaming_neardup_ingest",
    "dedup_simhash_pairs",
    # r5-era re-verification (most recent green row = round 5 — the full
    # remaining cohort; after this round no green row predates r6)
    "agg_salted_skew",
    "asof_join_clicks",
    "chunk_documents_200_50",
    "cohort_retention_weekly",
    "cosine_topk_lsh",
    "csv_roundtrip",
    "data_quality_audit",
    "decontaminate_ngram",
    "embedding_centroid_by_label",
    "embedding_quantize",
    "event_transitions",
    "events_anomaly_zscore",
    "exists_subquery_customers",
    "filtered_aggs",
    "funnel_view_click_purchase",
    "join_null_safe",
    "jsonl_roundtrip",
    "merge_upsert_customers",
    "multimodal_meta",
    "multimodal_resize_plan",
    "ngram_jaccard_pairs",
    "over_range_sum_1h",
    "pack_sequences_2k",
    "posexplode_priorities",
    "range_join_events",
    "sample_hash_10pct",
    "semantic_dedup",
    "simhash_exact_dup_coverage",
    "streaming_funnel",
    "strip_high_df_terms",
    "term_heavy_hitters",
    "text_fingerprint",
    "text_pii_redact",
    "text_repetition",
    "text_tfidf_top_terms",
    "text_winnow_sketch",
    "token_length_histogram",
    "window_distribution",
    "window_lag_lead",
    # displaced to positions 51+ (every one carries a green driver row
    # from r5-r9; the local oracle gate re-checks all of them every CI
    # run): the r6-r9 greens and the rest of the registry in
    # registration order. The r11 window must take (a) FIRST-ROWS for the
    # five late-r10 registrations that had no slot left once the mandated
    # 39-row r5 cohort was seated — mixture_schedule,
    # image_neardup_clusters, pr_average_precision, roc_auc_by_source,
    # zorder_layout_plan
    # (all green in the local sf0.01/sf0.1 gates, zero external rows) —
    # then (b) the r6-era cohort (~39 rows whose latest green is r6).
)


def _apply_driver_priority() -> None:
    prio = [n for n in _DRIVER_PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(prio)]
    order = prio + rest
    snapshot_q, snapshot_o = dict(QUERIES), dict(ORACLES)
    QUERIES.clear()
    ORACLES.clear()
    QUERIES.update({n: snapshot_q[n] for n in order})
    ORACLES.update({n: snapshot_o[n] for n in order if n in snapshot_o})


_apply_driver_priority()

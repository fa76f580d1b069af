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
    # first-rows: late-r8 registrations (full oracles green in CI since
    # r8; zero external signal until now)
    "bm25_topk_docs",
    "feature_hash_buckets",
    "dsir_target_weights",
    "embedding_top_pc",
    "twap_user_value",
    # first-rows: new this round
    "rrf_hybrid_retrieval",
    "lang_score_calibration",
    "streaming_neardup_ingest",
    "pps_systematic_sample",
    "calibration_by_source",
    "rendezvous_shard_plan",
    "posting_lists_top_terms",
    # implementation touched this round (convergence contract)
    "connected_components_distributed",
    # r4-era re-verification (most recent green row = round 4)
    "cosine_topk",
    "curation_pipeline",
    "dedup_minhash",
    "dedup_simhash_pairs",
    "embedding_neardup_pairs",
    "sample_stratified_cap",
    "session_30m",
    "slide_5m_1m",
    "split_train_val_test",
    "streaming_static_join",
    "text_lang_id",
    "text_quality",
    "text_token_count",
    "try_functions",
    "variant_props",
    "warehouse_roundtrip",
    "tpch_q2_min_cost_supplier",
    "tpch_q4_order_priority",
    "tpch_q6_revenue_forecast",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_shipmode_priority",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_parts_supplier_relationship",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume",
    "tpch_q19_discounted_revenue",
    "tpch_q20_potential_promotion",
    "tpch_q22_global_sales_opportunity",
    # oldest r5-era row (earliest-first-verified; the rest of the r5
    # cohort — including asof_join_clicks / over_range_sum_1h /
    # range_join_events / window_lag_lead, which ceded their slots to
    # round-9 first-rows — rotates in r10; first-rows outrank re-verifies
    # of standing greens)
    "approx_quantiles_value",
    # displaced to positions 51+ (every one carries a green driver row
    # from r5-r8; the local oracle gate re-checks all of them every CI
    # run): the r5-r8 greens and the rest of the registry in
    # registration order
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

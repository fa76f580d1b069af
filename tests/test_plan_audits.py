"""Plan-shape regression tests: the 100 TB checklist (pushdown, pruning,
broadcast, shuffle count) asserted on representative queries so a future
edit that silently degrades a plan fails here, not on a cluster."""

from __future__ import annotations

import pytest

from ibis_flink_example_spark.plans import (
    broadcast_join_count,
    exchange_count,
    plan_ops,
    pushed_filter_scan_count,
    scan_columns,
)
from ibis_flink_example_spark.queries import QUERIES


def test_q6_is_pure_scan_aggregate(spark, sf_dir):
    """Q6: zero joins, zero keyed shuffles — only the single-row final agg
    exchange; the whole WHERE reaches the scan; 4 columns read."""
    df = QUERIES["tpch_q6_revenue_forecast"](spark, sf_dir)
    ops = plan_ops(df)
    assert ops["BroadcastHashJoin"] + ops["SortMergeJoin"] + ops["ShuffledHashJoin"] == 0
    assert exchange_count(df) == 1  # the single-row reduce only
    assert pushed_filter_scan_count(df) == 1
    (cols,) = scan_columns(df)
    assert set(cols) == {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}


def test_flagship_scan_prunes_to_window_inputs(spark, sf_dir):
    """The flagship over-window reads only the 4 columns it uses — the
    reference's projection-pushdown reliance (SURVEY §4 row 1) holds."""
    df = QUERIES["over_range_sum_10s"](spark, sf_dir)
    (cols,) = scan_columns(df)
    assert set(cols) <= {"event_id", "user_id", "ts", "value"}
    assert exchange_count(df) == 1  # one hash exchange on the window key


def test_star_joins_broadcast_dims(spark, sf_dir):
    """Q5-shaped star join: every dim side broadcasts; the fact table is
    never the build side of a shuffle join."""
    df = QUERIES["tpch_q5_local_supplier_volume"](spark, sf_dir)
    assert broadcast_join_count(df) >= 3
    assert plan_ops(df)["SortMergeJoin"] <= 1  # at most the fact-fact join


def test_filter_reaches_parquet_scan(spark, sf_dir):
    df = QUERIES["filter_shipped"](spark, sf_dir)
    assert pushed_filter_scan_count(df) == 1
    assert exchange_count(df) == 0  # pure scan-filter-project: no shuffle


@pytest.mark.parametrize(
    "name", ["tpch_q2_min_cost_supplier", "tpch_q17_small_quantity_revenue"]
)
def test_derived_partsupp_queries_broadcast_small_sides(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert broadcast_join_count(df) >= 2

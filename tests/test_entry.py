"""Smoke test of the driver contract surface in __spark_entry__.py."""

from __future__ import annotations


def test_entry_returns_rows(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"event_id", "user_id", "ts", "value_sum_10s"}


def test_queries_and_oracles_align(spark):
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(os_) <= set(qs), "every oracle key must have a query"

"""The main correctness gate, run locally: every registered query is executed
on Spark AND (where an oracle exists) on DuckDB at sf0.001, and compared
exactly — a faithful local replica of the driver's CORRECTNESS check."""

from __future__ import annotations

import pytest

from tests.oracle import check_query


def _all_query_names():
    from ibis_flink_example_spark.queries import QUERIES

    return sorted(QUERIES)


@pytest.mark.parametrize("name", _all_query_names())
def test_query_matches_oracle(spark, sf_dir, name):
    problems = check_query(spark, name, sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_every_query_has_oracle_or_reason():
    """Queries without an oracle must be explicitly whitelisted as
    non-SQL-expressible (the driver records only a rows-only check)."""
    from ibis_flink_example_spark.queries import ORACLES, QUERIES
    from ibis_flink_example_spark.queries import NON_SQL_EXPRESSIBLE

    missing = set(QUERIES) - set(ORACLES) - set(NON_SQL_EXPRESSIBLE)
    assert not missing, f"queries lacking oracle without justification: {sorted(missing)}"


def test_driver_priority_is_sound():
    """The external harness verifies only the FIRST 50 registry entries, so
    _DRIVER_PRIORITY is a verification budget: every name must resolve (a
    typo would silently eject a query from the checked window), contain no
    duplicates, and fully determine the first 50 slots."""
    from ibis_flink_example_spark.queries import _DRIVER_PRIORITY, QUERIES

    missing = [n for n in _DRIVER_PRIORITY if n not in QUERIES]
    assert not missing, f"priority names not in registry: {missing}"
    assert len(_DRIVER_PRIORITY) == len(set(_DRIVER_PRIORITY))
    assert len(_DRIVER_PRIORITY) >= 50
    assert list(QUERIES)[:50] == list(_DRIVER_PRIORITY)[:50]


def test_deferred_first_rows_are_real_and_actually_deferred():
    """_NEXT_ROUND_FIRST_ROWS is the machine-readable queue of queries the
    NEXT rotation must seat first (they have no external driver row):
    every entry must be registered, oracle-bearing, and genuinely outside
    the current 50-slot window — an entry that is missing, rows-only, or
    already seated means the queue has rotted and the next rotation would
    be planned from stale state."""
    from ibis_flink_example_spark.queries import (
        _DRIVER_PRIORITY,
        _NEXT_ROUND_FIRST_ROWS,
        ORACLES,
        QUERIES,
    )

    window = set(list(_DRIVER_PRIORITY)[:50])
    for name in _NEXT_ROUND_FIRST_ROWS:
        assert name in QUERIES, f"deferred query not registered: {name}"
        assert name in ORACLES, f"deferred query has no oracle: {name}"
        assert name not in window, f"deferred query already in window: {name}"


def test_plan_hygiene_audited_everything():
    """The fleet plan-hygiene audit must have actually RUN for every query
    the gate executed (this file's parametrized tests run first): an
    environmental break of the explain path would otherwise silently
    disable the audit while every oracle test stays green. Today every
    registered query's plan is explainable — if that ever changes, the
    skip must become an explicit decision here, not a silent pass."""
    import pytest as _pytest

    from tests.oracle import PLAN_AUDITED, PLAN_AUDIT_SKIPPED

    assert not PLAN_AUDIT_SKIPPED, (
        f"plan audit silently skipped: {sorted(PLAN_AUDIT_SKIPPED)}"
    )
    if not PLAN_AUDITED:
        # partial run (-k / single test / xdist shard): the gate didn't
        # execute in this process, so there is nothing to assert — the
        # full-suite run is where the coverage guarantee applies
        _pytest.skip("oracle gate did not run in this process")
    # the full gate ran before this test (file order): near-registry coverage
    assert len(PLAN_AUDITED) >= 150, len(PLAN_AUDITED)

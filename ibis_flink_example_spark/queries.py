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


# Import side-effect modules that register queries. Order defines registry
# order (reference-parity first, then breadth, then north-star extensions).
from ibis_flink_example_spark import queries_reference  # noqa: E402,F401
from ibis_flink_example_spark import queries_relational  # noqa: E402,F401
from ibis_flink_example_spark import queries_tpch  # noqa: E402,F401
from ibis_flink_example_spark import queries_llm  # noqa: E402,F401
from ibis_flink_example_spark import queries_sampling  # noqa: E402,F401
from ibis_flink_example_spark import queries_streaming  # noqa: E402,F401

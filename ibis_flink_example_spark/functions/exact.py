"""Order-independent (bit-exact) floating aggregate helpers.

Why: double-typed SUMs are not associative — Spark's partial/final aggregation
order differs run-to-run and engine-to-engine, so ``SUM(double)`` can differ
from a DuckDB oracle in final ulps (SURVEY.md §7.3 item 3). The fixture
measure columns (events.value, l_extendedprice, ...) are 2-decimal quantized,
so summing through ``DECIMAL(18,2)`` is (a) exact, (b) order-independent,
(c) castable back to double without loss for any realistic magnitude
(|sum|*100 < 2^53). The result is bit-identical across engines AND across
partitionings — which also makes results stable at 1000-executor scale.

This mirrors what real engines do for money types; it is not a test hack.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 18,2 holds |x| < 10^16 — far above any fixture sum; arbitrary-precision
# decimal aggregation in Spark/DuckDB is exact at any partition count.
MONEY = "decimal(18,2)"


def money(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def cents(col: Column | str) -> Column:
    """2-decimal money → integer cents with HALF-UP rounding — the one
    definition of the package's quantization idiom (Spark's round() is
    half-even on doubles and DuckDB's is half-away; floor(x*100+0.5)
    agrees with the SQL oracles' CAST(round(x*100) AS BIGINT) for the
    non-negative-tie inputs the 2-decimal contract guarantees)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 100 + F.lit(0.5)).cast("long")


def dec_sum(col: Column | str, alias: str | None = None) -> Column:
    """Exact SUM of a 2-decimal-quantized double, returned as double."""
    out = F.sum(money(col)).cast("double")
    return out.alias(alias) if alias else out


def dec_avg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent AVG: exact decimal sum, one IEEE division at the end.

    ``cast(sum as double) / count`` performs a single deterministic double
    division — identical in any engine — unlike avg(double), whose running
    accumulation is order-dependent.
    """
    out = F.sum(money(col)).cast("double") / F.count(F.col(col) if isinstance(col, str) else col)
    return out.alias(alias) if alias else out

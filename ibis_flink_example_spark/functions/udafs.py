"""Grouped-aggregate pandas UDAF (SURVEY.md §2.10) — the Arrow-batched
custom-aggregate surface: Spark ships each group's column as a pandas
Series to the UDF and fuses the result into the normal aggregation plan
(one keyed exchange, same as a built-in agg; no collect, no RDDs).

The demonstrator is the Gini concentration coefficient — a genuine UDAF
case: it needs the group's full sorted distribution, so no composition of
built-in aggregates expresses it, but it still reduces to one scalar per
group.

Engine-exactness: inputs are 2-decimal money, so the UDAF computes in
integer cents with arbitrary-precision Python ints:

    G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx),  x_(1) ≤ … ≤ x_(n)

Within a block of tied x the inner sum is x·Σi regardless of permutation,
so sorting by value alone is deterministic; the single final division of
two exactly-representable integers is the only float op — bit-identical
to the DuckDB window formulation of the same algebra.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def gini_cents(v: pd.Series) -> float:
    """Gini coefficient of a 2-decimal money column (grouped-agg UDAF).
    NULLs arrive as NaN and are skipped, matching built-in aggregate
    semantics (astype would otherwise raise on non-finite values)."""
    cents = sorted(int(c) for c in (v.dropna() * 100).round().astype("int64"))
    n = len(cents)
    s0 = sum(cents)
    if n == 0 or s0 == 0:
        return 0.0
    s1 = sum(i * x for i, x in enumerate(cents, start=1))
    return float(2 * s1 - (n + 1) * s0) / (float(n) * float(s0))

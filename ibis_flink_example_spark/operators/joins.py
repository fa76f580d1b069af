"""Join operators beyond plain equi-joins (SURVEY.md §2.3 J4/J5).

The reference contains no joins (single-table pipeline); these are the
extension surface a credible engine needs, each designed Spark-first:

- ``asof_join``: the classic time-series "most recent right row at or before
  the left row's time, per key". NOT implemented as a range join (which
  explodes to |L|x|window| pairs) but as the union + ordered last_value
  technique: one shuffle on the key, one per-key sort, zero row blow-up —
  the same merge-sort shape kdb/QuestDB use, expressed declaratively so
  Catalyst/Tungsten run it with codegen. Scales to 100 TB: cost is
  sort-within-partition, state is one row of carried values.

- ``range_join``: time-bounded pair join (stream-stream join shape, J5) —
  equi-key + bounded time predicate. Spark executes as a hash join on the
  key with the range as residual; at cluster scale the bounded window keeps
  the pair count linear in rows x (window density).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str,
    on: str,
    right_cols: list[str],
    suffix: str = "_right",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row: values of ``right_cols`` from the most recent right
    row with ``right.on <= left.on`` and equal ``by`` key (backward as-of).

    Implementation: tag both sides, unionByName, and per ``by`` key take
    ``last_value(col, ignoreNulls=True)`` over rows ordered by
    ``(on, is_left)`` — right rows sort before left rows at equal times, so
    a right row at exactly left.on matches (ASOF <= semantics). Then keep
    only left rows. One Exchange + one Sort; no pair explosion.

    ``tolerance_seconds`` additionally nulls matches older than the window
    (kdb ``wj``-style tolerance).
    """
    lt = left.withColumn("__is_left", F.lit(1))
    # Right side carries only (by, on, right_cols); left columns become NULL
    # in the union and vice versa.
    rt = right.select(
        F.col(by), F.col(on), F.lit(0).alias("__is_left"), *[F.col(c) for c in right_cols]
    )
    carried = [F.col(c).alias(c + suffix) for c in right_cols]
    rt = rt.select(by, on, "__is_left", *carried)
    for c in right_cols:
        lt = lt.withColumn(c + suffix, F.lit(None).cast(rt.schema[c + suffix].dataType))
    unioned = lt.unionByName(rt, allowMissingColumns=True)

    w = (
        Window.partitionBy(by)
        .orderBy(F.unix_micros(F.col(on)), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[c for c in unioned.columns if not c.endswith(suffix)],
        *[
            F.last(F.col(c + suffix), ignorenulls=True).over(w).alias(c + suffix)
            for c in right_cols
        ],
        F.last(
            F.when(F.col("__is_left") == 0, F.unix_micros(F.col(on))), ignorenulls=True
        )
        .over(w)
        .alias("__right_us"),
    )
    out = filled.filter(F.col("__is_left") == 1).drop("__is_left")
    if tolerance_seconds is not None:
        tol_us = int(tolerance_seconds * 1_000_000)
        within = F.col("__right_us") >= F.unix_micros(F.col(on)) - F.lit(tol_us)
        for c in right_cols:
            out = out.withColumn(c + suffix, F.when(within, F.col(c + suffix)))
    return out.drop("__right_us")


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str,
    left_time: str,
    right_time: str,
    lower_seconds: float,
    upper_seconds: float,
    extra_cond: Column | None = None,
) -> DataFrame:
    """Pairs (l, r) with equal ``by`` key and ``r.time`` in
    ``[l.time - lower, l.time + upper]`` — the batch form of a watermarked
    stream-stream interval join (SURVEY.md §2.3 J5).

    Column name collisions must be resolved by the caller (alias the inputs).
    """
    l, r = left.alias("l"), right.alias("r")
    lower_us = int(lower_seconds * 1_000_000)
    upper_us = int(upper_seconds * 1_000_000)
    cond = (
        (F.col(f"l.{by}") == F.col(f"r.{by}"))
        & (
            F.unix_micros(F.col(f"r.{right_time}"))
            >= F.unix_micros(F.col(f"l.{left_time}")) - F.lit(lower_us)
        )
        & (
            F.unix_micros(F.col(f"r.{right_time}"))
            <= F.unix_micros(F.col(f"l.{left_time}")) + F.lit(upper_us)
        )
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return l.join(r, on=cond, how="inner")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    how: str = "inner",
    salt: int = 8,
    salt_by: str | None = None,
) -> DataFrame:
    """Skew-mitigated equi-join: manual salting for when AQE's skew-join
    split isn't available (stream-side joins, forced shuffled-hash, or a
    single pathological key that still overflows one split).

    Left rows get a deterministic salt in [0, salt) derived from
    ``salt_by`` (a high-cardinality column, e.g. the row id — NOT the join
    key, which is constant within the hot key's group); right rows are
    replicated once per salt value. The join key becomes (on, __salt), so
    the hot key's rows spread over ``salt`` reducers instead of one.
    Results are IDENTICAL to the plain join (each left row still meets every
    matching right row exactly once — via its single salt replica).

    Cost model: right side is duplicated salt-fold — use for dim-sized or
    pre-filtered right sides; for fact-fact skew prefer splitting only the
    hot keys (filter + union) or AQE. Semantics: inner and left joins only
    (right/full would need the right-replica dedup inverted).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    sb = F.col(salt_by) if salt_by else F.spark_partition_id()
    l = left.withColumn("__salt", F.pmod(F.xxhash64(sb), F.lit(salt)).cast("int"))
    # generator must stay top-level (no cast wrapper); sequence of int
    # literals already yields int elements matching the left side's cast
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l.join(r, on=[on, "__salt"], how=how).drop("__salt")

"""Reference-parity queries: the exact operator surface the reference
exercises (SURVEY.md §2, status=P rows), expressed on the ``events`` fixture
(the driver's streaming analog of ``payment_msg``, FIXTURES.md B2).

Column mapping (FIXTURES.md): provinceId→user_id, payAmount→value,
createTime→ts, orderId→event_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ibis_flink_example_spark.catalog import load_table
from ibis_flink_example_spark.operators.over_window import range_over_sum
from ibis_flink_example_spark.queries import query

# --- W1 + P1 + P2 + A1 + O1 + S8: the flagship ------------------------------
# Reference: window_aggregation.py:73-80 — SUM(payAmount) OVER (PARTITION BY
# provinceId ORDER BY createTime RANGE BETWEEN INTERVAL '10' SECOND PRECEDING
# AND CURRENT ROW), one output row per input row.

_FLAGSHIP_ORACLE = """
SELECT
  event_id,
  user_id,
  ts,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
    PARTITION BY user_id ORDER BY ts
    RANGE BETWEEN INTERVAL 10 SECONDS PRECEDING AND CURRENT ROW
  ) AS DOUBLE) AS value_sum_10s
FROM events
"""


@query("over_range_sum_10s", oracle=_FLAGSHIP_ORACLE)
def over_range_sum_10s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship W1: per-row trailing-10 s SUM(value) per user_id."""
    events = load_table(spark, sf_dir, "events")
    return range_over_sum(
        events,
        key="user_id",
        time_col="ts",
        measure="value",
        lookback_seconds=10,
        out_col="value_sum_10s",
        keep=["event_id", "user_id", "ts"],
    )


# Same operator with a 1-hour lookback: at fixture density the 10 s frame is
# almost always a single row; the 1 h frame aggregates many rows per frame and
# so actually exercises frame accumulation + peer-row semantics.
_FLAGSHIP_1H_ORACLE = """
SELECT
  event_id,
  user_id,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
    PARTITION BY user_id ORDER BY ts
    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
  ) AS DOUBLE) AS value_sum_1h,
  COUNT(*) OVER (
    PARTITION BY user_id ORDER BY ts
    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
  ) AS n_events_1h
FROM events
"""


@query("over_range_sum_1h", oracle=_FLAGSHIP_1H_ORACLE)
def over_range_sum_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ibis_flink_example_spark.functions.exact import money
    from ibis_flink_example_spark.operators.over_window import MICROS

    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3600 * MICROS, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.sum(money("value")).over(w).cast("double").alias("value_sum_1h"),
        F.count(F.lit(1)).over(w).alias("n_events_1h"),
    )


# --- P1/P2: projection with rename (reference: window_aggregation.py:73-80
# renames provinceId→province_id, payAmount→pay_amount at query level) -------

_PROJECT_ORACLE = """
SELECT event_id AS order_id, user_id AS province_id, value AS pay_amount
FROM events
"""


@query("project_rename", oracle=_PROJECT_ORACLE)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        F.col("event_id").alias("order_id"),
        F.col("user_id").alias("province_id"),
        F.col("value").alias("pay_amount"),
    )


# --- S2 analog: JSON decode of the props payload against a declared schema.
# The reference's format layer deserializes JSON messages onto an explicit
# schema (window_aggregation.py:41 + :25-33); here the JSON lives in a column.

_JSON_ORACLE = """
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k
FROM events
"""


@query("json_decode", oracle=_JSON_ORACLE)
def json_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k BIGINT")
    return events.select("event_id", parsed.getField("k").alias("prop_k"))


# --- S7/O2 analog: bounded result tap (reference: islice(consumer, 10),
# window_aggregation.py:85-90). Deterministic: ordered before limiting. ------

_LIMIT_ORACLE = """
SELECT event_id, user_id, value
FROM events
ORDER BY ts, event_id
LIMIT 10
"""


@query("ordered_limit", oracle=_LIMIT_ORACLE)
def ordered_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.orderBy("ts", "event_id").select("event_id", "user_id", "value").limit(10)


@query(
    "python_datasource_payments",
    # The custom Python source derives every field from the global row
    # index with integer arithmetic, so DuckDB reproduces the ENTIRE
    # dataset with range() — a full value oracle for a generated source
    # (no pinned literals). payAmount sums go through integer cents.
    oracle="""
WITH g AS (
  SELECT (i * 31) % 7 AS provinceId,
         (i * 9973) % 1000000000 AS pay_cents,
         CASE WHEN i % 10 = 0 THEN 1 ELSE 0 END AS payPlatform
  FROM (SELECT UNNEST(range(0, 10000)) AS i)
)
SELECT CAST(provinceId AS INTEGER) AS provinceId,
  CAST(COUNT(*) AS BIGINT) AS n_payments,
  CAST(SUM(pay_cents) AS DOUBLE) / 100.0 AS total_amount,
  CAST(SUM(payPlatform) AS BIGINT) AS n_platform1
FROM g GROUP BY 1
""",
)
def python_datasource_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python Data Source API, driven end-to-end: the reference's
    payment generator (generate_source_data.py:12-33) as a first-class
    deterministic splittable source (sources/python_datasource.py),
    aggregated per province. The oracle regenerates the identical dataset
    in SQL from the index arithmetic — proving the custom-source rows,
    partition-range split, and type mapping are exactly right. Money sums
    run in integer cents end-to-end (pay_cents is derived integer, summed
    as BIGINT, one final /100 division on both sides)."""
    from ibis_flink_example_spark.sources.python_datasource import register

    from ibis_flink_example_spark.functions.exact import cents

    register(spark)
    df = (
        spark.read.format("payments_gen")
        .option("n_rows", 10_000)
        .option("n_partitions", 8)
        .load()
    )
    return df.groupBy("provinceId").agg(
        F.count(F.lit(1)).alias("n_payments"),
        (F.sum(cents(F.col("payAmount"))).cast("double") / 100.0).alias(
            "total_amount"
        ),
        F.sum("payPlatform").cast("bigint").alias("n_platform1"),
    )


@query(
    "streaming_python_datasource_payments",
    # identical oracle shape to the batch twin: the streaming drain over
    # the custom source must be value-invisible vs the regenerated dataset
    oracle="""
WITH g AS (
  SELECT (i * 31) % 7 AS provinceId,
         (i * 9973) % 1000000000 AS pay_cents
  FROM (SELECT UNNEST(range(0, 10000)) AS i)
)
SELECT CAST(provinceId AS INTEGER) AS provinceId,
  CAST(COUNT(*) AS BIGINT) AS n_payments,
  CAST(SUM(pay_cents) AS DOUBLE) / 100.0 AS total_amount
FROM g GROUP BY 1
""",
)
def streaming_python_datasource_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom Python data source's STREAMING arm (Spark 4
    SimpleDataSourceStreamReader — replayable index offsets,
    checkpointable): the reference's forever-looping generator
    (generate_source_data.py:36-45) as a genuine streaming source,
    aggregated per province and drained via availableNow on a RocksDB
    state-scoped session. Complete mode is bounded here (7 province
    keys); the drain equals the batch twin exactly (full SQL oracle —
    DuckDB regenerates the dataset from the index arithmetic)."""
    from ibis_flink_example_spark.functions.exact import cents
    from ibis_flink_example_spark.sources.python_datasource import register_stream
    from ibis_flink_example_spark.streaming.runtime import (
        run_available_now,
        state_scoped_session,
    )

    s = state_scoped_session(spark, 4)
    register_stream(s)
    stream = (
        s.readStream.format("payments_stream_gen")
        .option("n_rows", 10_000)
        .option("batch", 10_000)
        .load()
    )
    agged = stream.groupBy("provinceId").agg(
        F.count(F.lit(1)).alias("n_payments"),
        (F.sum(cents(F.col("payAmount"))).cast("double") / 100.0).alias(
            "total_amount"
        ),
    )
    return run_available_now(agged, output_mode="complete")

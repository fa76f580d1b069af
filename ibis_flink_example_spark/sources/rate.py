"""Rate/test source (SURVEY.md §2.1 S9): a deterministic, broker-less stand-in
for the reference's Kafka data generator (generate_source_data.py:12-34).

The generator produces one JSON record per 0.5 s with:
  createTime = wall clock, orderId = epoch-seconds + n (sequential),
  payAmount ~ Uniform(0, 100000), payPlatform ∈ {0,1} (90/10),
  provinceId ∈ [0,6] uniform.

Spark's built-in ``rate`` source gives (timestamp, value: long) at
``rowsPerSecond``; we derive the payment columns from ``value`` with pure
column expressions — deterministic in ``value``, so replays are stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def payment_rate_source(spark: SparkSession, rows_per_second: int = 2) -> DataFrame:
    """Streaming DataFrame with the payment_msg schema at a fixed rate.

    Distributions mirror the generator: hash-based pseudo-randomness from the
    sequence number (xxhash64 — JVM-side, stable across runs).
    """
    rate = spark.readStream.format("rate").option("rowsPerSecond", str(rows_per_second)).load()
    h1 = F.abs(F.xxhash64(F.col("value"), F.lit(1)))
    h2 = F.abs(F.xxhash64(F.col("value"), F.lit(2)))
    h3 = F.abs(F.xxhash64(F.col("value"), F.lit(3)))
    return rate.select(
        F.col("timestamp").alias("createTime"),
        (F.unix_timestamp(F.col("timestamp")) + F.col("value")).alias("orderId"),
        ((h1 % 10_000_000) / 100.0).alias("payAmount"),
        F.when(h2 % 10 < 9, F.lit(0)).otherwise(F.lit(1)).cast("int").alias("payPlatform"),
        (h3 % 7).cast("int").alias("provinceId"),
    )

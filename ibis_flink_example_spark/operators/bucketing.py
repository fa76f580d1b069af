"""Bucketed (pre-partitioned) tables for shuffle-free co-located joins.

The 100 TB lever the one-shot queries can't show: when two fact tables are
repeatedly joined on the same key (orders ⋈ lineitem on orderkey in half the
TPC-H suite), writing both bucketed by that key into the same bucket count
makes every subsequent join/aggregation on the key shuffle-FREE — Spark
reads bucket i of both sides into the same task. One write-time shuffle
amortized across every downstream query.

Spark specifics encoded here:
- bucketBy is only available via ``saveAsTable`` (bucket metadata lives in
  the catalog, not the parquet footers);
- ``sortBy`` within buckets additionally removes the per-task Sort under
  sort-merge join;
- the join is only exchange-free if BOTH sides have the same bucket count
  and the join key equals the bucket key, and ``spark.sql.sources.
  bucketing.enabled`` is on (default).

Reference basis: the reference has no storage layer at all (Kafka in/out,
SURVEY.md §2.1); this is the A-status scale-path extension of S8 file
sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table bucketed (and optionally sorted)
    by ``bucket_col``. Format parquet; location = spark.sql.warehouse.dir."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on the bucket key — plans with
    zero Exchange (verify with .explain: SortMergeJoin directly over two
    bucketed scans)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)

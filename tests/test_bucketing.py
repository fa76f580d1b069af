"""Bucketed co-located joins: the write-once-shuffle-never pattern must
actually produce exchange-free plans AND the same rows as the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from ibis_flink_example_spark.catalog import load_table
from ibis_flink_example_spark.operators.bucketing import bucketed_join, write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_bucketed_join_is_shuffle_free_and_exact(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed(o, "b_orders", bucket_col="o_orderkey", n_buckets=8)
    write_bucketed(li, "b_lineitem", bucket_col="o_orderkey", n_buckets=8)
    try:
        j = bucketed_join(spark, "b_orders", "b_lineitem", on="o_orderkey")
        # large enough sides that a shuffle join would be chosen: suppress
        # broadcast to force the sort-merge path the bucket layout optimizes
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = _plan(j)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan
        # identical rows to the plain join
        plain = o.join(li, on="o_orderkey")
        assert j.count() == plain.count()
        assert j.exceptAll(plain).isEmpty() and plain.exceptAll(j).isEmpty()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_groupby_reuses_layout(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(li, "b_li_agg", bucket_col="l_orderkey", n_buckets=8)
    try:
        agg = (
            spark.table("b_li_agg")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        assert "Exchange" not in _plan(agg)  # agg on bucket key: no shuffle
    finally:
        spark.sql("DROP TABLE IF EXISTS b_li_agg")


def test_morton_key_matches_python_reference(spark):
    from ibis_flink_example_spark.operators.bucketing import morton_key

    from pyspark.sql import functions as F

    df = spark.range(500).select(
        (F.col("id") * 37 % 65536).alias("x"),
        (F.col("id") * 101 % 65536).alias("y"),
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", morton_key("x", "y").alias("z")).collect()
    }

    def pz(x, y):
        z = 0
        for b in range(16):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    assert all(got[(x, y)] == pz(x, y) for (x, y) in got)


def test_zorder_files_bound_both_dimensions(spark):
    # the property Z-ORDER exists for: every contiguous key-range "file"
    # covers a small BOX in (x, y) — both dimensions' per-file ranges are
    # ~sqrt(keyspace/n_files), never the full domain (which is what a
    # one-column sort leaves the other dimension with)
    from pyspark.sql import functions as F

    from ibis_flink_example_spark.operators.bucketing import zorder_layout_plan

    df = spark.range(20000).select(
        (F.col("id") * 37 % 65536).alias("x"),
        (F.col("id") * 101 % 65536).alias("y"),
    )
    plan = zorder_layout_plan(df, x_col="x", y_col="y", bits=16, n_files=64).collect()
    assert sum(r["n_rows"] for r in plan) == 20000
    for r in plan:
        # a 2^26-key contiguous range spans x/y boxes of ~2^13 (allow 2x
        # for ranges straddling a box boundary)
        assert r["x_max"] - r["x_min"] <= 1 << 14, r
        assert r["y_max"] - r["y_min"] <= 1 << 14, r


def test_shard_file_manifest_string_ids_deterministic(spark):
    """The manifest must be a pure function of the data for ANY orderable
    id type: string ids order lexicographically (review r11 — a silent
    cast('long') NULLed them and made the file cut partition-order-
    dependent, destroying the reproducibility contract). Same rows under
    a different physical partitioning => byte-identical manifest."""
    from ibis_flink_example_spark.operators.bucketing import shard_file_manifest

    df = spark.createDataFrame(
        [(f"doc-{i:03d}", f"text {i}", 10 + i) for i in range(40)],
        "sid string, body string, nb long",
    )
    kw = dict(
        id_col="sid", text_col="body", bytes_col="nb", n_shards=4, docs_per_file=5
    )
    a = sorted(map(tuple, shard_file_manifest(df, **kw).collect()))
    b = sorted(map(tuple, shard_file_manifest(df.repartition(7), **kw).collect()))
    assert a == b
    assert all(r[4] is not None and r[5] is not None for r in a)  # id range

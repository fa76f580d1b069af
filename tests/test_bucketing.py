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


def test_compaction_preserves_content_and_collapses_files(spark, sf_dir):
    """compact_bucketed_state_table: after 4 aligned appends the table
    holds n_buckets x 4 files; compaction collapses each bucket to its
    planned bin count (1 here) while the full read-back is row-for-row
    identical — the rewrite changes file grouping only. Re-running is a
    cheap no-op (already compact -> compacted=False)."""
    from ibis_flink_example_spark.catalog import drop_table_and_location
    from ibis_flink_example_spark.operators.maintenance import (
        bucket_file_manifest,
        compact_bucketed_state_table,
    )

    t = "t_compact_roundtrip"
    drop_table_and_location(spark, t)
    drop_table_and_location(spark, t + "__compact_stage")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", F.col("doc_id").bitwiseAND(F.lit(3)).alias("arr")
    )
    for k in range(4):
        docs.filter(F.col("arr") == k).repartition(
            8, F.col("doc_id")
        ).write.mode("append").bucketBy(8, "doc_id").sortBy(
            "doc_id"
        ).saveAsTable(t)
    before_rows = sorted(
        (r["doc_id"], r["n_chars"], r["arr"]) for r in spark.table(t).collect()
    )
    files_before = len(bucket_file_manifest(spark, t))
    assert files_before == 32

    stats = compact_bucketed_state_table(
        spark, t, bucket_col="doc_id", n_buckets=8
    )
    assert stats["compacted"] and stats["files_before"] == 32
    assert stats["files_after"] == 8
    after_rows = sorted(
        (r["doc_id"], r["n_chars"], r["arr"]) for r in spark.table(t).collect()
    )
    assert after_rows == before_rows

    again = compact_bucketed_state_table(
        spark, t, bucket_col="doc_id", n_buckets=8
    )
    assert not again["compacted"] and again["files_after"] == 8
    drop_table_and_location(spark, t)


def test_compaction_multibin_target_and_alignment(spark, sf_dir):
    """The binning arm (m > 1): a target far below bucket bytes makes
    every bucket rewrite into multiple bucket-aligned files (each file
    still holds ONE bucket's rows — Spark parses bucket id from the
    file name, so misalignment would break every bucketed-join
    consumer), and content still round-trips exactly."""
    from ibis_flink_example_spark.catalog import drop_table_and_location
    from ibis_flink_example_spark.operators.maintenance import (
        bucket_file_manifest,
        compact_bucketed_state_table,
    )

    t = "t_compact_multibin"
    drop_table_and_location(spark, t)
    drop_table_and_location(spark, t + "__compact_stage")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.col("doc_id").bitwiseAND(F.lit(3)).alias("arr")
    )
    for k in range(4):
        docs.filter(F.col("arr") == k).repartition(
            4, F.col("doc_id")
        ).write.mode("append").bucketBy(4, "doc_id").sortBy(
            "doc_id"
        ).saveAsTable(t)
    before = {r["doc_id"]: r["text"] for r in spark.table(t).collect()}
    stats = compact_bucketed_state_table(
        spark, t, bucket_col="doc_id", n_buckets=4, target_bytes=20_000
    )
    assert stats["compacted"] and stats["max_bins_per_bucket"] > 1
    manifest = bucket_file_manifest(spark, t)
    per_bucket = {}
    for bkt, _, _ in manifest:
        per_bucket[bkt] = per_bucket.get(bkt, 0) + 1
    # every bucket got multiple files, bounded by the plan
    assert all(1 <= n <= stats["max_bins_per_bucket"] for n in per_bucket.values())
    assert max(per_bucket.values()) > 1
    after = {r["doc_id"]: r["text"] for r in spark.table(t).collect()}
    assert after == before
    # the compacted table still serves bucket-joins: self-join on the
    # bucket key must read both sides bucketed (no exchange on the scan)
    j = spark.table(t).join(spark.table(t).select("doc_id"), "doc_id")
    assert j.count() == len(before)
    drop_table_and_location(spark, t)


def test_compaction_bucket_occupancy_premise():
    """state_table_compaction's oracle hardcodes files_before = 8 x
    n_batches and files_after = 8, which requires every (bucket, batch)
    slice non-empty at every verification SF. Pin the premise the same
    way the band-cap headroom test pins its cap: a fixture refresh that
    shrinks documents below comfortable occupancy must fail HERE."""
    import os

    import pyarrow.parquet as pq

    checked = 0
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        p = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(p):
            continue
        n = pq.read_metadata(p).num_rows
        # 4 batches x 8 buckets = 32 slices; ~uniform ids make the
        # emptiest slice n/32 +- sqrt; require generous headroom
        assert n >= 256, f"{sf}: {n} docs — (bucket, batch) occupancy at risk"
        checked += 1
    assert checked >= 2


def test_compaction_keep_predicate_expires_rows(spark, sf_dir):
    """The retention arm of compact_bucketed_state_table: keep='arr >= 2'
    rewrites the table to exactly the surviving horizon (same rows as a
    filter of the pre-rewrite content), stays bucket-aligned, and a
    keep-nothing predicate leaves a valid empty table rather than
    failing — the honest degenerate case of an expired-out state."""
    from ibis_flink_example_spark.catalog import drop_table_and_location
    from ibis_flink_example_spark.operators.maintenance import (
        bucket_file_manifest,
        compact_bucketed_state_table,
    )

    t = "t_retention_keep"
    drop_table_and_location(spark, t)
    drop_table_and_location(spark, t + "__compact_stage")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", F.col("doc_id").bitwiseAND(F.lit(3)).alias("arr")
    )
    for k in range(4):
        docs.filter(F.col("arr") == k).repartition(
            8, F.col("doc_id")
        ).write.mode("append").bucketBy(8, "doc_id").sortBy(
            "doc_id"
        ).saveAsTable(t)
    want = sorted(
        (r["doc_id"], r["n_chars"], r["arr"])
        for r in spark.table(t).filter("arr >= 2").collect()
    )
    stats = compact_bucketed_state_table(
        spark, t, bucket_col="doc_id", n_buckets=8, keep="arr >= 2"
    )
    assert stats["compacted"] and stats["files_after"] == 8
    got = sorted(
        (r["doc_id"], r["n_chars"], r["arr"]) for r in spark.table(t).collect()
    )
    assert got == want
    per_bucket = {}
    for bkt, _, _ in bucket_file_manifest(spark, t):
        per_bucket[bkt] = per_bucket.get(bkt, 0) + 1
    assert all(n == 1 for n in per_bucket.values())

    # expired-out degenerate: a keep-nothing rewrite leaves a readable
    # empty table (min_files_per_bucket=1 forces the rewrite on the
    # already-compact layout)
    stats2 = compact_bucketed_state_table(
        spark, t, bucket_col="doc_id", n_buckets=8, keep="n_chars < 0",
        min_files_per_bucket=1,
    )
    assert stats2["compacted"] and stats2["files_after"] == 0
    assert spark.table(t).count() == 0
    drop_table_and_location(spark, t)

"""Runtime-semantics tests: checkpoint recovery (SURVEY §2.9 T5) and batch
SQL DDL table registration (§2.1 S4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ibis_flink_example_spark.catalog import load_table, table_path


def test_streaming_checkpoint_no_reprocessing(spark, tmp_path):
    """T5: restarting a streaming query from its checkpoint must not
    re-emit already-processed input — the file source's offset log is the
    at-least-once/exactly-once backbone (the reference leaves delivery to
    Flink's checkpointing defaults; Spark's equivalent is the
    checkpointLocation, exercised here through a stop-add-restart cycle)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    spark.range(0, 100).select(F.col("id")).write.mode("append").parquet(src)

    def drain():
        # file sink: the one built-in sink with full checkpoint recovery
        # (memory sink refuses to recover — it's a test tap, not a sink)
        q = (
            spark.readStream.schema("id long")
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink)

    assert drain().count() == 100

    # new data lands between runs; restart from the SAME checkpoint
    spark.range(100, 200).select(F.col("id")).write.mode("append").parquet(src)
    out2 = drain()
    # cumulative sink holds each input row exactly once — nothing reprocessed
    assert out2.count() == 200
    assert out2.select("id").distinct().count() == 200


def test_sql_ddl_table_registration(spark, sf_dir):
    """S4 batch form: CREATE TABLE ... USING parquet OPTIONS(path ...) —
    the catalog-DDL analog of the reference's con.create_table
    (window_aggregation.py:44-51); the registered table must behave exactly
    like the reader-based DataFrame."""
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS ddl_lineitem
        USING parquet OPTIONS (path '{table_path(sf_dir, "lineitem")}')
        """
    )
    try:
        via_ddl = spark.table("ddl_lineitem")
        via_reader = load_table(spark, sf_dir, "lineitem")
        assert via_ddl.count() == via_reader.count()
        a = via_ddl.agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))).first()[0]
        b = via_reader.agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))).first()[0]
        assert a == b
    finally:
        spark.sql("DROP TABLE IF EXISTS ddl_lineitem")


def test_local_checkpoint_release(spark):
    """_release_local_checkpoint must actually free the persisted blocks
    (the naive toRdd().unpersist() is a silent no-op — the checkpointed
    DataFrame's toRdd is a fresh adapter RDD, not the persisted one)."""
    from ibis_flink_example_spark.operators.dedup import _release_local_checkpoint

    def cached_block_rdd_ids() -> set[int]:
        sc = spark.sparkContext
        return {
            i.id()
            for i in sc._jsc.sc().getRDDStorageInfo()
            if i.numCachedPartitions() > 0
        }

    before = cached_block_rdd_ids()
    ck = spark.range(10_000).select(
        F.col("id"), (F.col("id") * 3).alias("x")
    ).localCheckpoint(eager=True)
    held = cached_block_rdd_ids() - before
    assert held, "localCheckpoint should have persisted blocks"
    # the checkpointed plan stays usable before release
    assert ck.count() == 10_000
    _release_local_checkpoint(ck)
    after = cached_block_rdd_ids()
    assert not (held & after), f"blocks not released: {held & after}"


def test_conversion_latency_zero_conversions_yields_one_row(spark):
    """Driver-robustness edge: with no view->purchase conversions the
    query must return the oracle's single row of NULL stats (its scalar
    subqueries always produce one row), not zero rows — LEFT rank joins,
    not inner."""
    import ibis_flink_example_spark.queries  # noqa: F401 - registry first (import order)
    from ibis_flink_example_spark.queries_analytics import conversion_latency_impl

    events = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1, "view", 1.0, "{}"),
            (2, "2024-01-01 00:01:00", 1, "click", 1.0, "{}"),
            # purchase BEFORE the first view: not a conversion
            (3, "2024-01-01 00:00:00", 2, "purchase", 1.0, "{}"),
            (4, "2024-01-01 00:05:00", 2, "view", 1.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = conversion_latency_impl(events).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_converted"] == 0
    assert r["p50_s"] is None and r["p90_s"] is None
    assert r["min_s"] is None and r["max_s"] is None and r["avg_s"] is None


def _write_mini(spark, tmp_path, tables: dict, sub: str = "mini") -> str:
    """Write hand-crafted single-file parquet tables into one mini sf_dir
    so registered queries AND their DuckDB oracles run against the same
    adversarial fixture (the pattern the attribution boundary test
    established)."""
    import glob
    import os
    import shutil

    d = str(tmp_path / sub)
    os.makedirs(d, exist_ok=True)
    for name, df in tables.items():
        stage = str(tmp_path / f"{sub}_stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        shutil.copy(
            glob.glob(os.path.join(stage, "*.parquet"))[0],
            os.path.join(d, f"{name}.parquet"),
        )
    return d


def _check_mini(spark, d: str, name: str):
    from ibis_flink_example_spark.queries import ORACLES, QUERIES
    from tests.oracle import compare_frames, run_oracle

    got = QUERIES[name](spark, d).toPandas()
    want = run_oracle(ORACLES[name], d)
    assert not compare_frames(got, want), name
    return got


def _write_mini_events(spark, tmp_path, rows, sub="mini"):
    """Write a hand-crafted events.parquet fixture dir for the registered
    query + oracle to run against (rows: (event_id, ts_us, user_id, type,
    value, props))."""
    df = spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.timestamp_micros(F.col("ts")))
    return _write_mini(spark, tmp_path, {"events": df}, sub=sub)


def _peak_by_day(spark, d):
    from ibis_flink_example_spark.queries import ORACLES, QUERIES
    from tests.oracle import compare_frames, run_oracle

    got = QUERIES["concurrent_sessions_peak"](spark, d).toPandas()
    want = run_oracle(ORACLES["concurrent_sessions_peak"], d)
    assert not compare_frames(got, want)
    return {
        r["day"].strftime("%Y-%m-%d"): int(r["peak_concurrent"])
        for _, r in got.iterrows()
    }


def test_concurrent_sessions_half_open_tie(spark, tmp_path):
    """Adversarial mini-fixtures for the sweep-line half-open rule.

    Fixture A (users 1+2 ONLY): user 2's session starts EXACTLY where user
    1's interval ends (end+gap == start) — peak MUST be 1; a broken tie
    order (+1 before -1) would report 2, so this pins the rule. Fixture B
    adds user 3 overlapping user 2 — genuine concurrency 2."""
    base = 1_700_000_000_000_000  # µs; everything inside one day
    gap_us = 30 * 60 * 1_000_000
    u1 = [
        (1, base, 1, "view", 1.0, "{}"),
        (2, base + 60_000_000, 1, "view", 1.0, "{}"),
    ]
    u2 = [(3, base + 60_000_000 + gap_us, 2, "view", 1.0, "{}")]
    u3 = [(4, base + 60_000_000 + gap_us + 10_000_000, 3, "view", 1.0, "{}")]

    d_tie = _write_mini_events(spark, tmp_path, u1 + u2, sub="tie")
    by_day = _peak_by_day(spark, d_tie)
    assert list(by_day.values()) == [1], (
        "back-to-back sessions double-counted: the -1-before-+1 tie rule "
        f"is broken (got {by_day})"
    )

    d_overlap = _write_mini_events(spark, tmp_path, u1 + u2 + u3, sub="overlap")
    assert max(_peak_by_day(spark, d_overlap).values()) == 2  # real overlap


def test_concurrent_sessions_end_exactly_at_midnight(spark, tmp_path):
    """A session whose half-open interval ends EXACTLY at midnight is
    closed at the next day's first instant: the next day must not report
    it (no phantom peak from the carry-in floor)."""
    day0 = 1_699_920_000_000_000  # 2023-11-14 00:00:00 UTC in µs
    h = 3600 * 1_000_000
    rows = [
        # session 22:30 -> 23:30; interval ends 23:30 + 30min = 00:00 sharp
        (1, day0 + 22 * h + 30 * 60_000_000, 1, "view", 1.0, "{}"),
        (2, day0 + 23 * h + 30 * 60_000_000, 1, "view", 1.0, "{}"),
    ]
    by_day = _peak_by_day(spark, _write_mini_events(spark, tmp_path, rows))
    assert by_day["2023-11-14"] == 1
    # day 2 exists (it holds the end boundary) but its peak is 0 — the
    # session is closed at the 00:00 instant (half-open)
    assert by_day.get("2023-11-15", 0) == 0


def test_concurrent_sessions_midnight_carry(spark, tmp_path):
    """A session open across midnight must count toward the next day's
    peak (carry-in), and a day containing only carried-over end boundaries
    must report the carry-in, never a negative 'peak'."""
    from ibis_flink_example_spark.queries import ORACLES, QUERIES
    from tests.oracle import compare_frames, run_oracle

    day0 = 1_699_920_000_000_000  # 2023-11-14 00:00:00 UTC in µs
    h = 3600 * 1_000_000
    rows = [
        # user 1: session 23:40 -> 23:50 day 1; interval ends 00:20 day 2
        (1, day0 + 23 * h + 40 * 60_000_000, 1, "view", 1.0, "{}"),
        (2, day0 + 23 * h + 50 * 60_000_000, 1, "view", 1.0, "{}"),
        # user 2: session at 00:05 day 2 — true concurrency 2 with user 1
        (3, day0 + 24 * h + 5 * 60_000_000, 2, "view", 1.0, "{}"),
    ]
    d = _write_mini_events(spark, tmp_path, rows)
    by_day = _peak_by_day(spark, d)
    assert by_day["2023-11-14"] == 1  # only user 1's session on day 1
    # day 2: user 1 carried over + user 2 overlapping -> peak 2 (the old
    # per-day-only sweep reported 1 and could go negative)
    assert by_day["2023-11-15"] == 2
    assert all(v >= 0 for v in by_day.values())


def test_scd2_null_state_segments(spark, tmp_path):
    """Adversarial NULL-state mini-fixture for SCD2 (gaps-and-islands):
    a NULL state must open its OWN segment (either direction of a
    NULL<->non-NULL transition is a change), while consecutive NULLs merge
    into one segment. Runs the REGISTERED query against its REGISTERED
    oracle so any implementation/oracle divergence on NULL semantics flips
    this test before it flips a driver hash (ADVICE r6 #1)."""
    from ibis_flink_example_spark.queries import ORACLES, QUERIES
    from tests.oracle import compare_frames, run_oracle

    rows = [
        # cust 1: NULL-first (opens seg 1; next NULL merges into it), then
        # NULL->A (change), A->A (merge), A->NULL (change), NULL->NULL
        # (merge), NULL->B (change)
        (1, None, "1994-01-01", 10),
        (1, None, "1994-01-02", 11),
        (1, "A", "1994-01-03", 12),
        (1, "A", "1994-01-04", 13),
        (1, None, "1994-01-05", 14),
        (1, None, "1994-01-06", 15),
        (1, "B", "1994-01-07", 16),
        # cust 2: all NULL — exactly one segment, is_current true
        (2, None, "1994-01-01", 20),
        (2, None, "1994-01-02", 21),
        # cust 3: same-timestamp flip resolved by tiebreak o_orderkey
        (3, "X", "1994-01-01", 30),
        (3, "Y", "1994-01-01", 31),
    ]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderpriority string, o_orderdate string, o_orderkey long"
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    d = _write_mini(spark, tmp_path, {"orders": df})
    got = _check_mini(spark, d, "scd2_customer_priority")
    # cust 1: segments NULL(2), A(2), NULL(2), B(1) = 4 intervals
    c1 = got[got["custkey"] == 1].sort_values("valid_from")
    assert list(c1["priority"]) == [None, "A", None, "B"]
    assert list(c1["n_observations"]) == [2, 2, 2, 1]
    # cust 2: ONE all-NULL segment, current
    c2 = got[got["custkey"] == 2]
    assert len(c2) == 1 and c2.iloc[0]["priority"] is None
    assert bool(c2.iloc[0]["is_current"])
    # cust 3: tiebreak makes X the first segment, Y current
    c3 = got[got["custkey"] == 3].sort_values("n_observations")
    assert len(c3) == 2


def test_stats_mad_null_values_fixture(spark, tmp_path):
    """Adversarial NULL-value mini-fixture for the exact-MAD query: Spark
    ranks NULLS FIRST, DuckDB NULLS LAST, so an unfiltered NULL would
    shift every rank and diverge the median silently (r7 review finding).
    Runs the REGISTERED query against the REGISTERED oracle on a fixture
    WITH NULLs, plus a hand-computed expectation."""
    from ibis_flink_example_spark.queries import ORACLES, QUERIES
    from tests.oracle import compare_frames, run_oracle

    rows = [
        (1, 1_700_000_000_000_000, 1, "view", None, "{}"),
        (2, 1_700_000_001_000_000, 1, "view", 1.0, "{}"),
        (3, 1_700_000_002_000_000, 1, "view", 2.0, "{}"),
        (4, 1_700_000_003_000_000, 1, "view", 3.0, "{}"),
        (5, 1_700_000_004_000_000, 1, "view", None, "{}"),
    ]
    d = _write_mini_events(spark, tmp_path, rows)
    got = _check_mini(spark, d, "stats_mad_value")
    # non-NULL values [100, 200, 300] cents: n=3, median = rank ceil(1.5)=2
    # -> 200; |d| = [100, 0, 100] -> sorted [0, 100, 100], rank 2 -> 100
    r = got.iloc[0]
    assert (r["n_values"], r["median_cents"], r["mad_cents"]) == (3, 200, 100)


def test_attribution_time_decay_seven_day_boundary(spark, tmp_path):
    """Adversarial boundary mini-fixture for time-decay attribution: a
    touch at EXACTLY purchase_ts - 7 days is admitted by the inclusive
    join bound with days_back = 7, where the unclamped weight 2^(6-7) is
    no longer an integer and the engines' bigint casts diverge (truncate
    vs half-even) — the LEAST(6, ...) clamp pins it to weight 1 on both
    sides (r7 review finding). Also covers the same-instant-minus-7d
    touch being a purchase's ONLY touch (unclamped: den=0 on one side)."""
    from ibis_flink_example_spark.queries import ORACLES, QUERIES
    from tests.oracle import compare_frames, run_oracle

    base = 1_700_000_000_000_000  # µs
    day = 86_400_000_000
    rows = [
        # user 1: ONLY touch exactly 7 days before the purchase
        (1, base, 1, "view", 1.0, "{}"),
        (2, base + 7 * day, 1, "purchase", 1.0, "{}"),
        # user 2: boundary touch + a recent touch (mixed-weight shares)
        (3, base, 2, "click", 1.0, "{}"),
        (4, base + 6 * day + day // 2, 2, "view", 1.0, "{}"),
        (5, base + 7 * day, 2, "purchase", 1.0, "{}"),
    ]
    d = _write_mini_events(spark, tmp_path, rows)
    got = _check_mini(spark, d, "attribution_time_decay")
    by_ch = {r["channel"]: r for _, r in got.iterrows()}
    # user 1: single clamped-weight touch gets full credit (1.0)
    # user 2: clamped boundary click w=1 vs day-0 view w=64 -> shares
    # floor(1e6*1/65 + .5)=15385 and floor(1e6*64/65 + .5)=984615
    assert by_ch["view"]["total_credit_x1e6"] == 1_000_000 + 984_615
    assert by_ch["click"]["total_credit_x1e6"] == 15_385


def test_pagerank_fixed_point_hand_graph(spark):
    """operators/graph.py pagerank vs a hand-evaluated 3-node fixture
    (edges 1->2, 2->1, 2->3, 3->1; 3 iterations): every intermediate is
    pure integer arithmetic, so the expected ranks are computed exactly
    by the recurrence rank' = 0.15*SCALE + 85%*sum(rank DIV deg) with
    floor division — including the no-in-edge survival path (node 1 has
    out-degree 1 but in round 1 receives from 2 and 3; all nodes keep
    rows). Also pins that a node with out-edges but NO in-edges keeps
    its base-rank row (left-join anchoring) on a 2-node chain."""
    from ibis_flink_example_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1)], "src long, dst long"
    )
    got = {
        r["node"]: (r["rank"], r["deg"])
        for r in pagerank(edges, iters=3).collect()
    }
    assert got == {
        1: (1_217_281_250, 1),
        2: (1_054_187_500, 2),
        3: (728_531_250, 1),
    }

    # chain a->b only: a never receives mass, must keep base rank rows
    chain = spark.createDataFrame([(10, 11)], "src long, dst long")
    got2 = {r["node"]: r["rank"] for r in pagerank(chain, iters=2).collect()}
    # node 10 is the only src: deg table = {10}; 11 is dangling-dst and
    # carries no rank row by construction, 10 holds base-only rank
    assert got2 == {10: 150_000_000}




def test_file_compaction_zero_byte_and_oversize(spark, tmp_path):
    """Compaction-plan boundary semantics: a file LARGER than the target
    lands whole in the bin of its end offset (next-fit never splits
    files), a zero-byte file inherits the current bin, and an all-zero
    source exercises the GREATEST(cum,1) guard that keeps the engines'
    divergent negative-DIV semantics unreachable (cum=0 would otherwise
    hit DuckDB floor vs Spark truncate)."""
    docs = spark.createDataFrame(
        [
            (1, "", "en", "s", 0),        # zero-byte, sorts last
            (2, "x", "en", "s", 250000),  # 2.5x target, one bin
            (3, "x", "en", "s", 60000),
            (4, "x", "en", "s", 50000),
            (9, "", "en", "t", 0),        # all-zero source: cum=0 path
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = _write_mini(spark, tmp_path, {"documents": docs})
    got = _check_mini(spark, d, "file_compaction_plan")
    r = {row["source"]: row for _, row in got.iterrows()}
    # source s: ends 250000->bin 2, 310000->bin 3, 360000->bin 3, 0-byte
    # file ends at 360000->bin 3; two non-empty bins
    assert (
        r["s"]["n_files"], r["s"]["total_bytes"], r["s"]["n_bins"],
        r["s"]["max_files_per_bin"], r["s"]["max_bin_bytes"], r["s"]["fill_x1e6"],
    ) == (4, 360000, 2, 3, 250000, 1800000)
    # source t: GREATEST(0,1)-1 = 0 -> bin 0 in BOTH engines
    assert (r["t"]["n_bins"], r["t"]["fill_x1e6"]) == (1, 0)


def test_token_budget_boundary(spark, tmp_path):
    """Token-budget admission rule at the edges: a document whose
    cumulative total lands EXACTLY on the 20k budget closes the
    selection (next doc sees cum-n == budget, excluded); a document that
    CROSSES the budget is still admitted; a single oversize document is
    admitted alone (cum-n = 0 < budget)."""
    def doc(doc_id, lang, n_tokens, n_chars):
        return (doc_id, " ".join(["w"] * n_tokens), lang, "src", n_chars)

    docs = spark.createDataFrame(
        [
            # lang xx: exact-boundary close
            doc(1, "xx", 20000, 100), doc(2, "xx", 5, 50),
            # lang yy: budget crossed by doc 4, doc 5 excluded
            doc(3, "yy", 19999, 100), doc(4, "yy", 5, 50), doc(5, "yy", 7, 10),
            # lang zz: single oversize doc admitted
            doc(6, "zz", 30000, 100),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = _write_mini(spark, tmp_path, {"documents": docs})
    got = _check_mini(spark, d, "token_budget_selection")
    r = {row["lang"]: row for _, row in got.iterrows()}
    assert (r["xx"]["n_docs_selected"], r["xx"]["tokens_selected"]) == (1, 20000)
    assert (r["yy"]["n_docs_selected"], r["yy"]["tokens_selected"]) == (2, 20004)
    assert r["yy"]["smallest_doc_tokens"] == 5
    assert (r["zz"]["n_docs_selected"], r["zz"]["tokens_selected"]) == (1, 30000)


def test_scd2_point_in_time_boundaries(spark, tmp_path):
    """PIT interval-join boundary semantics: a shipment exactly at a
    segment's valid_from joins THAT segment (half-open [from, to)), a
    shipment exactly at the change date joins the NEW segment, and a
    shipment before the customer's first segment drops."""
    import datetime as dt

    d0 = dt.datetime(1995, 1, 1)
    d10 = dt.datetime(1995, 1, 11)
    before = dt.datetime(1994, 12, 31)
    mid = dt.datetime(1995, 1, 6)
    orders = spark.createDataFrame(
        [(1, 1, "A", d0), (2, 1, "B", d10)],
        "o_orderkey long, o_custkey long, o_orderpriority string, o_orderdate timestamp",
    )
    lineitem = spark.createDataFrame(
        [
            (1, mid, 100.0, 0.0),     # inside A
            (1, d10, 100.0, 0.0),     # exactly at change -> B (half-open)
            (1, d0, 100.0, 0.0),      # exactly at first valid_from -> A
            (2, before, 100.0, 0.0),  # before first segment -> dropped
        ],
        "l_orderkey long, l_shipdate timestamp, l_extendedprice double, l_discount double",
    )
    d = _write_mini(spark, tmp_path, {"orders": orders, "lineitem": lineitem})
    got = _check_mini(spark, d, "scd2_point_in_time")
    r = {row["priority_at_ship"]: row for _, row in got.iterrows()}
    assert (r["A"]["n_items"], r["A"]["revenue"]) == (2, 200.0)
    assert (r["B"]["n_items"], r["B"]["revenue"]) == (1, 100.0)


def test_key_skew_profile_literals(spark, tmp_path):
    """Skew-profile integer rank arithmetic on a hand-computed fixture:
    per-user counts [1,1,1,97] -> nk=4, p50 rank (4+1)//2=2 -> 1,
    p99 rank (99*4+99)//100=4 -> 97, skew = 97*4*1e6//100."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for user, cnt in [(1, 1), (2, 1), (3, 1), (4, 97)]:
        for _ in range(cnt):
            eid += 1
            rows.append((eid, base, user, "view", 1.0, "{}"))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    d = _write_mini(spark, tmp_path, {"events": events})
    got = _check_mini(spark, d, "key_skew_profile")
    r = got.iloc[0]
    assert (
        r["n_keys"], r["total_rows"], r["max_rows"],
        r["p50_rows"], r["p99_rows"], r["skew_x1e6"],
    ) == (4, 100, 97, 1, 97, 3_880_000)


def test_bfs_distances_chain_and_termination(spark):
    """bfs_distances on a hand graph: chain 1->2->3->4 plus a detached
    node pair — distances are hop-minimal, unreached nodes are absent,
    and the traversal TERMINATES early when the frontier drains before
    max_hops (empty-frontier break, not an error)."""
    from ibis_flink_example_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (8, 9)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, seeds, max_hops=10).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}

    # diamond: two equal-length paths -> one distance row, min by
    # construction (node enters exactly one frontier)
    edges2 = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4)], "src long, dst long"
    )
    got2 = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges2, seeds, max_hops=4).collect()
    }
    assert got2 == {1: 0, 2: 1, 3: 1, 4: 2}


def test_cusum_clamp_and_alarm(spark, tmp_path):
    """CUSUM hand fixture: 4 low days then 4 high days. The clamp keeps
    s at exactly 0 through the low regime (prefix == running min), the
    shift accumulates +4250/day afterward, and the alarm trips where
    s > 5*slack (slack = mean DIV 20 = 750). Pins the prefix-minus-
    running-min identity against the sequential recursion it replaces."""
    import datetime as dt

    rows = [
        (i + 1, 1, "P", dt.datetime(1995, 1, i + 1),
         100.0 if i < 4 else 200.0)
        for i in range(8)
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderpriority string, "
        "o_orderdate timestamp, o_totalprice double",
    )
    d = _write_mini(spark, tmp_path, {"orders": orders})
    got = _check_mini(spark, d, "cusum_revenue_shift").sort_values("day")
    assert list(got["cusum_cents"]) == [0, 0, 0, 0, 4250, 8500, 12750, 17000]
    assert list(got["alarm"]) == [False] * 4 + [True] * 4


def test_cms_inner_product_disjoint_and_empty(spark):
    """cms_inner_product edge cases (r7 review finding): disjoint item
    sets must estimate from the MIN over ALL depth rows — a depth whose
    sketches share no buckets contributes a true dot of ZERO, so the
    estimate is 0 whenever any depth is collision-free, and an empty
    arm yields 0, never NULL."""
    from ibis_flink_example_spark.operators.sketches import (
        cms_build,
        cms_inner_product,
    )

    a = spark.createDataFrame([("x1",), ("x2",)], "item string")
    b = spark.createDataFrame([("y1",)], "item string")
    sk_a = cms_build(a, "item", width=1024, depth=4)
    sk_b = cms_build(b, "item", width=1024, depth=4)
    # wide sketches + tiny sets: at least one depth is collision-free
    est = cms_inner_product(sk_a, sk_b, depth=4).collect()[0]["est"]
    assert est == 0

    empty = spark.createDataFrame([], "item string")
    sk_e = cms_build(empty, "item", width=1024, depth=4)
    est2 = cms_inner_product(sk_a, sk_e, depth=4).collect()[0]["est"]
    assert est2 == 0

    # identical singletons: every depth's dot is exactly 1
    c = spark.createDataFrame([("z",)], "item string")
    sk_c = cms_build(c, "item", width=1024, depth=4)
    est3 = cms_inner_product(sk_c, sk_c, depth=4).collect()[0]["est"]
    assert est3 == 1


# ---------------------------------------------------------------------------
# Round-8 additions: TWAP boundary/tie semantics, BM25 clamp path, DSIR
# empty-target smoothing — all as oracle-parity minis (the driver fixtures
# never exercise these edges).
# ---------------------------------------------------------------------------


def test_twap_boundaries_ties_and_negative(spark, tmp_path):
    """TWAP edges: (a) two events at the SAME microsecond — the
    event_id-ordered first gets weight 0; (b) a lone event at
    23:59:59.999999 — weight exactly 1 us; (c) an event exactly at
    midnight belongs to the NEXT day; (d) a negative-value day exercises
    the sign-factored floor division identically in both engines."""
    day0 = 1_755_000_000_000_000  # some µs instant
    # normalize to an exact UTC midnight so boundary rows are exact
    day0 -= day0 % 86_400_000_000
    rows = [
        # (a) same-µs tie at 10:00:00, then a follower 100s later
        (1, day0 + 36_000_000_000, 1, "view", 10.00, "{}"),
        (2, day0 + 36_000_000_000, 1, "view", 30.00, "{}"),
        (3, day0 + 36_100_000_000, 1, "view", 50.00, "{}"),
        # (b) lone event 1 µs before midnight, separate user
        (4, day0 + 86_399_999_999, 2, "view", 7.77, "{}"),
        # (c) event exactly AT midnight -> next day, same user
        (5, day0 + 86_400_000_000, 2, "view", 9.99, "{}"),
        # (d) negative-value lone event, third user
        (6, day0 + 1_000_000, 3, "view", -3.33, "{}"),
    ]
    d = _write_mini_events(spark, tmp_path, rows, sub="twap")
    got = _check_mini(spark, d, "twap_user_value")  # oracle parity first
    by = {
        (int(r["user_id"]), r["day"].strftime("%Y-%m-%d %H:%M:%S")): r
        for _, r in got.iterrows()
    }
    import datetime as _dt

    d0 = _dt.datetime.fromtimestamp(day0 / 1e6, _dt.timezone.utc)
    k0 = d0.strftime("%Y-%m-%d %H:%M:%S")
    k1 = (d0 + _dt.timedelta(days=1)).strftime("%Y-%m-%d %H:%M:%S")
    # (a): event 1 has dt=0; event 2 holds 100 s at 30.00; event 3 holds
    # to midnight. weight = full span from 10:00 to midnight.
    r = by[(1, k0)]
    span = 86_400_000_000 - 36_000_000_000
    assert int(r["weight_us"]) == span
    num = 3000 * 100_000_000 + 5000 * (span - 100_000_000)
    assert int(r["twap_cents"]) == num // span
    # (b): weight exactly 1 µs, twap = the event's own cents
    r = by[(2, k0)]
    assert int(r["weight_us"]) == 1 and int(r["twap_cents"]) == 777
    # (c): midnight event opened the NEXT day, holding the whole day
    r = by[(2, k1)]
    assert int(r["weight_us"]) == 86_400_000_000
    assert int(r["twap_cents"]) == 999
    # (d): negative twap, floor toward zero on the magnitude
    r = by[(3, k0)]
    assert int(r["twap_cents"]) == -333


def _write_mini_docs(spark, tmp_path, rows, sub="docs"):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    return _write_mini(spark, tmp_path, {"documents": df}, sub=sub)


def test_bm25_idf_clamp_and_saturation_mini(spark, tmp_path):
    """Every doc contains 'spark' (df == N -> raw whole-bit idf 0 -> the
    Lucene clamp keeps it at 1); one doc stacks 'dup' occurrences to pin
    tf saturation; oracle parity on the mini proves both engines agree on
    the clamp + fixed-point division at the degenerate df."""
    rows = [
        (1, "spark table table table", "en", "s0", 23),
        (2, "spark spark table table", "en", "s0", 23),
        (3, "spark dup dup dup table", "en", "s0", 23),
    ]
    d = _write_mini_docs(spark, tmp_path, rows, sub="bm25")
    got = _check_mini(spark, d, "bm25_topk_docs")
    by = {int(r["doc_id"]): r for _, r in got.iterrows()}
    assert set(by) == {1, 2, 3}
    # doc 3 carries the only rare term -> top score; doc 2 beats doc 1 on
    # 'spark' tf with identical length
    assert (
        by[3]["score_x1e6"] > by[2]["score_x1e6"] > by[1]["score_x1e6"] > 0
    )
    assert int(by[3]["n_terms_matched"]) == 2


def test_dsir_empty_target_domain_mini(spark, tmp_path):
    """No document carries the target source at all: t_tgt = 0 and every
    cnt_t = 0, so bits_tgt collapses to floor(log2(V)) for every term —
    the add-one smoothing keeps the weights finite and the oracle must
    agree exactly on the degenerate corpus."""
    rows = [
        (1, "alpha beta beta gamma", "en", "s1", 21),
        (2, "alpha alpha delta", "en", "s2", 17),
    ]
    d = _write_mini_docs(spark, tmp_path, rows, sub="dsir")
    got = _check_mini(spark, d, "dsir_target_weights")
    assert len(got) == 2 and got["weight_bits"].notna().all()


def test_neardup_ingest_boundary_and_short_docs_mini(spark, tmp_path):
    """streaming_neardup_ingest on a hand-crafted corpus pinning the two
    semantics the driver fixtures never exercise: (a) the EXACT 0.5
    Jaccard boundary (>= threshold -> reject; integer cross-multiply must
    agree with the oracle's), and (b) sub-3-word docs, whose identity is
    the degenerate whole-text shingle on the engine side and the mirrored
    CASE arm in the oracle. Batch = doc_id % 4, so the boundary pair
    crosses batches and the short-doc pair crosses batches too."""
    rows = [
        # A (batch 0) vs B (batch 1): shingles {abc,bcd,cde} vs
        # {abc,bcd,cdf} -> nc=2, na=nb=3, jacc = 2/4 = 0.5 EXACTLY -> B rejected
        (0, "a b c d e", "en", "s", 9),
        (1, "a b c d f", "en", "s", 9),
        # C (batch 2): shares only 'abc' with A -> jacc 1/5 < 0.5 -> accepted
        (2, "a b c x y", "en", "s", 9),
        # short docs: identical 2-word text, different batches -> whole-text
        # shingle equal -> jacc 1 -> later arrival rejected
        (4, "hi yo", "en", "s", 5),
        (5, "hi yo", "en", "s", 5),
        # short doc with different text -> accepted
        (6, "bye yo", "en", "s", 6),
    ]
    d = _write_mini_docs(spark, tmp_path, rows, sub="neardup_mini")
    got = _check_mini(spark, d, "streaming_neardup_ingest")
    acc = dict(zip(got["doc_id"], got["accepted"]))
    assert acc == {0: True, 1: False, 2: True, 4: True, 5: False, 6: True}


def test_pps_zero_weight_head_mini(spark, tmp_path):
    """pps_systematic_sample engine-vs-oracle parity on the corpus shape
    the r9 review found broken: a ZERO-weight doc at the minimum doc_id
    (cum == 0 -> negative DIV operand without the w > 0 pre-filter).
    Exactly n rows, the zero-weight doc never selected, both engines
    agree value-exactly."""
    rows = [
        (0, "pad", "en", "s", 0),    # zero weight at the HEAD
        (1, "pad", "en", "s", 10),
        (2, "pad", "en", "s", 30),
        (3, "pad", "en", "s", 60),   # W = 100
    ]
    d = _write_mini_docs(spark, tmp_path, rows, sub="pps_mini")
    got = _check_mini(spark, d, "pps_systematic_sample")
    assert len(got) == 50
    assert 0 not in set(got["doc_id"])
    assert sorted(got["sample_idx"]) == list(range(50))


def test_calibration_perfect_and_empty_score_mini(spark, tmp_path):
    """Calibration bin edges at the extremes: an all-marker doc scores
    exactly 1e6 (must land in bin 9 via the LEAST clamp, not a
    nonexistent bin 10) and an empty text scores 0 into bin 0; per-domain
    arm agrees on the same fixture."""
    rows = [
        (0, "the of and", "en", "sA", 10),   # 3/3 markers -> score 1e6
        (1, "", "fr", "sA", 0),              # empty -> score 0
        (2, "the banana", "en", "sB", 10),   # 1/2 -> 500000 -> bin 5
    ]
    d = _write_mini_docs(spark, tmp_path, rows, sub="calib_mini")
    got = _check_mini(spark, d, "lang_score_calibration")
    bins = dict(zip(got["bin"], got["n_docs"]))
    assert bins == {9: 1, 0: 1, 5: 1}
    got2 = _check_mini(spark, d, "calibration_by_source")
    key = {(r.source, r.bin) for r in got2.itertuples()}
    assert key == {("sA", 9), ("sA", 0), ("sB", 5)}


def test_posting_lists_tie_breaks_mini(spark, tmp_path):
    """posting_lists_top_terms on a corpus engineered for BOTH tie axes:
    equal-occurrence terms at the top-k boundary (term-asc tiebreak) and
    equal-tf postings at the per-term cut (doc-asc tiebreak) — engine and
    oracle must cut identically."""
    rows = [
        # 'alpha' and 'beta' both occur 4x (term tiebreak); 'gamma' 2x.
        # Within 'alpha': docs 1,2 tf=2 each; docs 3,4 tf=... craft below.
        (1, "alpha alpha beta gamma", "en", "s", 10),
        (2, "alpha alpha beta gamma", "en", "s", 10),
        (3, "beta beta", "en", "s", 10),
    ]
    d = _write_mini_docs(spark, tmp_path, rows, sub="postings_mini")
    got = _check_mini(spark, d, "posting_lists_top_terms")
    by_term = {r.term: r for r in got.itertuples()}
    # alpha: docs 1,2 tf 2 each -> equal tf, doc-asc order "1:2,2:2"
    assert by_term["alpha"].postings_csv == "1:2,2:2"
    # beta: doc 3 tf 2 beats docs 1,2 tf 1; then doc-asc among ties
    assert by_term["beta"].postings_csv == "3:2,1:1,2:1"
    assert by_term["alpha"].occurrences == by_term["beta"].occurrences == 4


def test_rendezvous_shard_plan_mini(spark, tmp_path):
    """Engine-vs-oracle parity of the full rendezvous assignment on a tiny
    corpus (every shard decision checked value-exactly), plus the
    conservation law: loads sum to the corpus."""
    rows = [(i, "x", "en", "s", (i % 7) + 1) for i in range(40)]
    d = _write_mini_docs(spark, tmp_path, rows, sub="rendezvous_mini")
    got = _check_mini(spark, d, "rendezvous_shard_plan")
    assert got["n_docs"].sum() == 40
    assert got["total_bytes"].sum() == sum((i % 7) + 1 for i in range(40))
    assert got["n_moving_add_one"].sum() <= 40


def _mini_docs(spark, rows):
    """documents mini-frame from (doc_id, text, lang, source) tuples."""
    return spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_blockhash_boundary_payloads_mini(spark, tmp_path):
    """Engine-vs-oracle blockhash on the payloads the driver fixtures never
    exercise: empty text (sig 0 contract), shorter-than-64 (most blocks
    empty), uniform bytes (every non-empty block ties => bit set), a
    NON-ASCII payload (Spark ascii() and DuckDB ascii() must agree on
    code points, not bytes — the list-based oracle splits per CHARACTER),
    and an exact duplicate pair."""
    rows = [
        (0, "", "en", "s0"),
        (1, "z", "en", "s0"),
        (2, "aaaaaaaa", "en", "s0"),
        (3, "héllo wörld ünïcode 中文 über café " * 4, "en", "s0"),
        (4, "the quick brown fox " * 10, "en", "s0"),
        (5, "the quick brown fox " * 10, "en", "s0"),
    ]
    d = _write_mini(spark, tmp_path, {"documents": _mini_docs(spark, rows)})
    got = _check_mini(spark, d, "image_blockhash_signatures")
    sig = dict(zip(got["media_id"], got["phash64"]))
    assert sig[0] == 0  # empty payload contract
    assert sig[4] == sig[5] != 0  # identical payloads
    _check_mini(spark, d, "image_phash_neardup_pairs")
    clusters = _check_mini(spark, d, "image_neardup_clusters")
    comp = dict(zip(clusters["media_id"], clusters["component"]))
    assert comp[4] == comp[5] == 4  # exact dups cluster under min id


def test_roc_family_single_class_source_mini(spark, tmp_path):
    """A source whose docs are ALL one class must yield NULL auc in both
    engines (the divide-by-zero guard), while mixed sources compute; the
    global AUC/AP/sweep still run over the union."""
    en = "the of and to in is a"  # every word a marker => score 1e6
    zz = "zzz yyy xxx www"  # zero markers => score 0
    rows = [
        (0, en, "en", "pure"),   # 'pure': all positives
        (1, en, "en", "pure"),
        (2, en, "en", "mixed"),
        (3, zz, "de", "mixed"),
        (4, zz, "en", "mixed"),  # positive with score 0 (ranking error)
        (5, en, "de", "mixed"),  # negative with score 1e6
    ]
    d = _write_mini(spark, tmp_path, {"documents": _mini_docs(spark, rows)})
    by_src = _check_mini(spark, d, "roc_auc_by_source")
    row = {r["source"]: r for _, r in by_src.iterrows()}
    import pandas as pd

    assert pd.isna(row["pure"]["auc_x1e6"])  # single-class => NULL
    assert row["mixed"]["n_pos"] == 2 and row["mixed"]["n_neg"] == 2
    _check_mini(spark, d, "roc_auc_lang_score")
    _check_mini(spark, d, "roc_threshold_sweep")
    _check_mini(spark, d, "pr_average_precision")
    _check_mini(spark, d, "lang_score_calibration")
    _check_mini(spark, d, "calibration_by_source")


def test_mixture_schedule_singleton_sources_mini(spark, tmp_path):
    """Singleton sources land exactly at the midpoint vt = scale/2; a
    dominant source interleaves around them — tie semantics (several
    sources hitting the same vt) must hash identically across engines."""
    rows = (
        [(0, "solo one", "en", "only_a"), (1, "solo two", "en", "only_b")]
        + [(10 + k, f"doc number x{k}", "en", "big") for k in range(7)]
    )
    d = _write_mini(spark, tmp_path, {"documents": _mini_docs(spark, rows)})
    got = _check_mini(spark, d, "mixture_schedule")
    solo = got[got["source"].isin(["only_a", "only_b"])]
    assert set(solo["vt_scaled"]) == {500_000_000_000}  # (2*1-1)*S // 2
    assert set(solo["seq_in_source"]) == {1}


def test_epoch_shuffle_plan_mini(spark, tmp_path):
    """Tiny corpus end-to-end vs oracle (3 epochs x 8 shards over 5 docs)
    — seq contiguity and the md5 order must match DuckDB exactly."""
    rows = [(i, f"doc x{i}", "en", "s0") for i in range(5)]
    d = _write_mini(spark, tmp_path, {"documents": _mini_docs(spark, rows)})
    got = _check_mini(spark, d, "epoch_shuffle_plan")
    assert len(got) == 15  # 5 docs x 3 epochs


def test_dedup_substring_runs_mini(spark, tmp_path):
    """Gaps-and-islands semantics the driver fixtures never pin: a
    cross-doc shared span (run extension), two duplicated windows at gap
    3 (separate RUNS, one COVERAGE island — interval-union arithmetic,
    no double count), the same pair at gap 11 > k (two coverage
    islands), a within-doc all-same-word repeat, sub-k docs absent, and
    the planted-dup twin of doc 0."""
    b = [f"b{i}" for i in range(30)]
    rows = [
        # doc 0 (doc_id % 50 == 0): planted twin at 1000000 -> full-doc run
        (0, " ".join(f"a{i}" for i in range(15)), "en", "s0"),
        # docs 1/2 share the 20-word span b5..b24
        (1, " ".join(b), "en", "s0"),
        (2, " ".join(["c0", "c1"] + b[5:25] + ["c2", "c3"]), "en", "s0"),
        # doc 3 = f0..f12; doc 4 duplicates windows f0..f9 and f3..f12
        # NON-contiguously -> doc 3 dup anchors {0, 3}: 2 runs, 1 island
        (3, " ".join(f"f{i}" for i in range(13)), "en", "s0"),
        (4, " ".join([f"f{i}" for i in range(10)] + ["qq"]
                     + [f"f{i}" for i in range(3, 13)]), "en", "s0"),
        # shorter than k -> no anchors, absent from output
        (5, "tiny doc here", "en", "s0"),
        # within-doc repetition: 12 identical words -> 3 identical windows
        (6, " ".join(["s"] * 12), "en", "s0"),
    ]
    d = _write_mini(spark, tmp_path, {"documents": _mini_docs(spark, rows)})
    got = _check_mini(spark, d, "dedup_substring_runs")
    by = {int(r.doc_id): r for r in got.itertuples()}
    assert 5 not in by
    exp = {
        0: (1, 6, 15, 15), 1000000: (1, 6, 15, 15),
        1: (1, 11, 20, 20), 2: (1, 11, 20, 20),
        3: (2, 2, 10, 13),   # gap 3: two runs, ONE island spanning 13
        4: (2, 2, 10, 20),   # gap 11 > k: two islands, 10 + 10
        6: (1, 3, 12, 12),
    }
    assert set(by) == set(exp)
    for doc, (n_runs, anchors, max_run, cov) in exp.items():
        r = by[doc]
        assert (r.n_runs, r.dup_anchors, r.max_run_tokens,
                r.dup_token_coverage) == (n_runs, anchors, max_run, cov), doc


def test_mixture_quality_occupancy_mini(spark, tmp_path):
    """Decile semantics the fixtures never pin: bigram-free docs (0 or 1
    word) audit as score 0; ties share one decile (a dominant score mass
    lands every tied doc in the decile of its cumulative LOWER bound);
    shares are floor divisions of the tiny cell rollup. 10 docs: 6 share
    a repeated phrase (score 0 — every bigram has corpus count >= 5),
    2 are unique gibberish (score 1e6 — all-rare bigrams), 2 have no
    bigrams at all (score 0 by definition)."""
    common = "the cat sat on the mat"  # repeated 6x -> bigrams common
    rows = (
        [(i, common, "en", "web") for i in range(6)]
        + [(10, "zq1 zq2 zq3 zq4", "en", "crawl"),
           (11, "zq5 zq6 zq7 zq8", "en", "crawl")]
        + [(20, "solo", "en", "web"), (21, "", "en", "crawl")]
    )
    d = _write_mini(spark, tmp_path, {"documents": _mini_docs(spark, rows)})
    got = _check_mini(spark, d, "mixture_quality_occupancy")
    cells = {(r.source, int(r.decile)): r for r in got.itertuples()}
    # score 0 covers 8 of 10 docs -> decile (0*10)//10 = 0; the two
    # all-rare docs sit at cum_before 8 -> decile (8*10)//10 = 8
    assert set(cells) == {("web", 0), ("crawl", 0), ("crawl", 8)}
    assert cells[("web", 0)].n_docs == 7        # 6 common + 1 one-word
    assert cells[("crawl", 0)].n_docs == 1      # the empty doc
    assert cells[("crawl", 8)].n_docs == 2
    # token accounting: empty doc counts 0 words; 'solo' counts 1
    assert cells[("web", 0)].n_tokens == 6 * 6 + 1
    assert cells[("crawl", 0)].n_tokens == 0
    assert cells[("crawl", 8)].n_tokens == 8
    total = 6 * 6 + 1 + 8
    assert cells[("web", 0)].token_share_x1e6 == (37 * 10**6) // total
    # within-source: crawl's token mass is entirely in decile 8
    assert cells[("crawl", 8)].source_share_x1e6 == 10**6
    assert cells[("crawl", 0)].source_share_x1e6 == 0


def test_mixture_reweight_vertical_tab_mini(spark, tmp_path):
    """U+000B payloads: the explicit whitespace class must split
    identically in Spark (Java regex) and DuckDB (RE2) — with the \\s+
    shorthand this text makes different bigram sets per engine and five
    compounded iterations of diverged weights."""
    rows = [
        (0, "alpha\x0bbeta gamma alpha\x0bbeta gamma", "en", "s_vt"),
        (1, "alpha beta gamma delta epsilon", "en", "s_plain"),
        (2, "alpha beta gamma delta epsilon", "en", "s_plain"),
    ]
    d = _write_mini(spark, tmp_path, {"documents": _mini_docs(spark, rows)})
    _check_mini(spark, d, "mixture_reweight_iterative")
    _check_mini(spark, d, "mixture_quality_occupancy")
    _check_mini(spark, d, "tokenizer_fertility_by_lang")

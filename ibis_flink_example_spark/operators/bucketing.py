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


def _hrw_best(id_col: str, n_shards: int):
    """The rendezvous (HRW) argmax as a column: per row, the struct-max
    of (md5(id || ':' || s), s) over all candidate shards — one
    scan-stage expression, no explode. ONE definition shared by every
    HRW consumer in this module: the hash recipe and the tie-break
    (higher hash, then higher shard — mirror any oracle's ORDER BY h
    DESC, s DESC if this ever changes) must never drift apart between
    the shard plan and the manifest (review r11)."""
    from pyspark.sql import functions as F

    ids = F.col(id_col).cast("string")
    return F.array_max(
        F.array(
            *[
                F.struct(
                    F.md5(F.concat(ids, F.lit(f":{s}"))).alias("h"),
                    F.lit(s).alias("s"),
                )
                for s in range(n_shards)
            ]
        )
    )


def rendezvous_shard_plan(
    df: DataFrame,
    *,
    id_col: str,
    bytes_col: str,
    n_shards: int = 16,
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment + the load/
    stability QA a 100 TB layout decision runs on it: every row hashes
    once per candidate shard (``md5(id || ':' || shard)``) and lands on
    the lexicographic-max hash. Unlike ``id % n``, adding a shard moves
    ONLY the rows whose new-shard hash beats their current winner — an
    expected 1/(n+1) of the corpus, each moving TO the new shard — so a
    reshard is an incremental copy, not a full reshuffle. That property
    is REPORTED, not assumed: ``n_moving_add_one`` counts this shard's
    rows whose ``md5(id || ':' || n_shards)`` exceeds their current max.

    md5 hex is byte-identical in Spark and DuckDB, so the full assignment
    (not just the counts) is oracle-checkable. Ties would need an md5
    collision between distinct strings; the struct max still defines
    them deterministically (higher shard wins — mirror the oracle's
    ORDER BY h DESC, s DESC if you change it).

    Scale shape: the argmax over n_shards hashes is a per-row expression
    in the scan stage (an array of structs + array_max — no explode, no
    shuffle of per-(row, shard) pairs); the only exchange is the final
    n_shards-group rollup with map-side combine.

    Returns (shard, n_docs, total_bytes, n_moving_add_one), one row per
    non-empty shard.
    """
    from pyspark.sql import functions as F

    if n_shards < 1:
        raise ValueError("rendezvous_shard_plan: n_shards must be >= 1")
    ids = F.col(id_col).cast("string")
    best = _hrw_best(id_col, n_shards)
    assigned = df.select(
        best.getField("s").cast("long").alias("shard"),
        best.getField("h").alias("__hmax"),
        F.col(bytes_col).cast("long").alias("__bytes"),
        F.md5(F.concat(ids, F.lit(f":{n_shards}"))).alias("__hnew"),
    )
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__bytes").cast("long").alias("total_bytes"),
            F.sum((F.col("__hnew") > F.col("__hmax")).cast("long")).alias(
                "n_moving_add_one"
            ),
        )
    )


def shard_file_manifest(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    bytes_col: str,
    n_shards: int = 16,
    docs_per_file: int = 100,
) -> DataFrame:
    """The dataset MANIFEST a reproducible training run ships next to its
    shards: rendezvous-assign every document to a shard, cut each shard
    into files of ``docs_per_file`` documents in id order, and emit one
    row per file with (n_docs, total_bytes, id range, content_md5) —
    content_md5 being the md5 of the '|'-joined SORTED per-document text
    digests, so any retry/re-partition/re-download of a shard can be
    verified byte-for-byte against the card, and two manifests diff at
    file granularity (which file changed, not just "something did").

    Scale shape: the HRW argmax and the per-doc digest are scan-stage row
    expressions; the one exchange is the shard-keyed numbering window
    (n_shards independent partitions — no global sort), and the file
    rollup reuses that partitioning (grouping keys extend the shard
    key). The checksum concat is bounded by ``docs_per_file`` (~33 bytes
    per digest), NEVER corpus- or shard-sized — the reason the manifest
    is per FILE: a whole-shard sorted concat would be a gigabyte-scale
    string at 100 TB. md5 + array_sort/array_join mirror exactly in
    DuckDB (string_agg ORDER BY), the repo's deterministic
    sequence-encoding idiom.

    Returns (shard, file_seq, n_docs, total_bytes, min_id, max_id,
    content_md5).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    if n_shards < 1 or docs_per_file < 1:
        raise ValueError("shard_file_manifest: n_shards and docs_per_file >= 1")
    best = _hrw_best(id_col, n_shards)
    # the in-shard order (and min_id/max_id) use the ORIGINAL id column —
    # a cast("long") here would NULL string ids and make the file cut
    # nondeterministic, destroying the manifest's reproducibility
    # contract (review r11); any orderable id type works, lexicographic
    # for strings
    assigned = df.select(
        F.col(id_col).alias("__id"),
        best.getField("s").cast("long").alias("shard"),
        F.md5(F.col(text_col)).alias("__digest"),
        F.col(bytes_col).cast("long").alias("__bytes"),
    )
    seq = F.row_number().over(Window.partitionBy("shard").orderBy("__id"))
    filed = assigned.withColumn("__seq", seq).withColumn(
        "file_seq",
        F.expr(f"CAST((__seq - 1) DIV {int(docs_per_file)} AS BIGINT)"),
    )
    return filed.groupBy("shard", "file_seq").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__bytes").cast("long").alias("total_bytes"),
        F.min("__id").alias("min_id"),
        F.max("__id").alias("max_id"),
        F.md5(
            F.array_join(F.array_sort(F.collect_list("__digest")), "|")
        ).alias("content_md5"),
    )


def morton_key(x, y, bits: int = 16):
    """Z-order (Morton) interleave of two non-negative ints bounded by
    2^bits — the multi-dimensional clustering key: sorting/range-
    partitioning files by this key keeps BOTH dimensions' value ranges
    tight within every file, so min/max footer stats prune scans for
    predicates on EITHER column (the layout trick behind Delta/Iceberg
    Z-ORDER, expressed as a plain column so vanilla parquet gets it too).
    Pure scan-stage bit math (2*bits shift/and/or terms, whole-stage
    codegen), engine-portable: Spark shiftright/bitwiseAND == DuckDB
    >>/& on BIGINT. Inputs outside [0, 2^bits) fold via pmod — the
    standard hash-style domain clamp; callers wanting true range order
    quantize first.
    """
    from pyspark.sql import functions as F

    if not 1 <= bits <= 31:
        raise ValueError("morton_key: bits must be in [1, 31]")
    xc = F.pmod((F.col(x) if isinstance(x, str) else x).cast("long"), F.lit(1 << bits))
    yc = F.pmod((F.col(y) if isinstance(y, str) else y).cast("long"), F.lit(1 << bits))
    key = F.lit(0).cast("long")
    for b in range(bits):
        key = key.bitwiseOR(
            F.shiftright(xc, b).bitwiseAND(F.lit(1).cast("long")) * F.lit(1 << (2 * b)).cast("long")
        ).bitwiseOR(
            F.shiftright(yc, b).bitwiseAND(F.lit(1).cast("long")) * F.lit(1 << (2 * b + 1)).cast("long")
        )
    return key


def zorder_layout_plan(
    df,
    *,
    x_col: str,
    y_col: str,
    bits: int = 16,
    n_files: int = 64,
    quantize: str = "range",
) -> DataFrame:
    """The write-layout QA for Z-order clustering: assign every row its
    Morton key, cut the key space into ``n_files`` equal key ranges (the
    files a clustered write would emit), and report each range's row
    count plus the min/max of BOTH source dimensions — the table that
    proves (or disproves) that a z-ordered layout keeps per-file
    min/max stats tight on every dimension, which is exactly what makes
    footer-stats pruning work for 2-D predicates at 100 TB.

    ``quantize`` maps natural-domain inputs into the 2^bits key domain:

    - ``"range"`` (default): affine range quantization
      ``(v * 2^bits) DIV (max + 1)`` against the observed per-column max
      (attached via a one-row aggregate broadcast crossJoin — the repo's
      scalar idiom, no shuffle of the fact side). Order-PRESERVING, so
      locality survives any key domain up to ``(2^63-1) >> bits`` —
      ``o_custkey`` past 2^bits keeps clustering instead of wrapping.
      Inputs must be non-negative and leave the multiply's int64
      headroom (a lazy ``raise_error`` guard makes violations loud, not
      wrapped or ANSI-crashed).
      The reported per-file min/max are the RAW column values — exactly
      the footer stats a clustered parquet write would persist.
    - ``"pmod"``: hash-style fold ``pmod(v, 2^bits)``. Cheapest (no
      second scan for the max row) but order-DESTROYING past 2^bits:
      v and v + 2^bits collide, so locality silently degrades once the
      natural key outgrows the bit budget. Reported min/max are the
      folded values. Keep only for inputs proven to fit the domain.

    Scale shape: key assignment is scan-stage bit math; the exchanges
    are the n_files-group rollup with map-side combine (six integer
    aggregates per group) plus, under ``"range"``, the one-row max
    aggregate. The plan never sorts — range membership is
    key DIV (keyspace/n_files), not a global ORDER BY (the actual
    clustered WRITE would repartitionByRange on the key, whose
    sampling-based sort is Spark's standard distributed sort).

    Returns (file_idx, n_rows, x_min, x_max, y_min, y_max).
    """
    from pyspark.sql import functions as F

    if n_files < 1 or (1 << (2 * bits)) % n_files != 0:
        raise ValueError(
            "zorder_layout_plan: n_files must divide the 4^bits key space "
            f"(got n_files={n_files}, bits={bits}) — a non-divisor emits an "
            "unequal overflow range and n_files > 4^bits divides by zero"
        )
    if quantize not in ("range", "pmod"):
        raise ValueError("zorder_layout_plan: quantize must be 'range' or 'pmod'")
    span = (1 << (2 * bits)) // n_files
    x_raw = F.col(x_col).cast("long")
    y_raw = F.col(y_col).cast("long")
    if quantize == "range":
        # the quantizer multiplies by 2^bits before the DIV, so inputs
        # must also leave that headroom in int64 — out-of-range values
        # raise loudly (ANSI would throw an opaque overflow anyway, and
        # with ANSI off they would silently wrap into garbage keys,
        # review r11): supported domain is [0, (2^63-1) >> bits]
        limit = ((1 << 63) - 1) >> bits

        def _in_domain(v, name):
            return F.when(
                (v < 0) | (v > F.lit(limit).cast("long")),
                F.raise_error(
                    F.lit(
                        f"zorder_layout_plan: {name} outside "
                        f"[0, {limit}] under range quantization "
                        f"(bits={bits}) — pre-scale the column (e.g. "
                        "epoch-micros -> days) or lower bits"
                    )
                ).cast("long"),
            ).otherwise(v)

        maxes = df.agg(
            F.max(x_raw).alias("__xmax"), F.max(y_raw).alias("__ymax")
        )
        xq = F.expr(f"(__x * {1 << bits}) DIV (__xmax + 1)")
        yq = F.expr(f"(__y * {1 << bits}) DIV (__ymax + 1)")
        keyed = (
            df.select(
                _in_domain(x_raw, x_col).alias("__x"),
                _in_domain(y_raw, y_col).alias("__y"),
            )
            .crossJoin(F.broadcast(maxes))
            .select(
                morton_key(xq, yq, bits).alias("__z"), "__x", "__y"
            )
        )
    else:
        keyed = df.select(
            morton_key(x_col, y_col, bits).alias("__z"),
            F.pmod(x_raw, F.lit(1 << bits)).alias("__x"),
            F.pmod(y_raw, F.lit(1 << bits)).alias("__y"),
        )
    return (
        keyed.groupBy(F.expr(f"__z DIV {span}").cast("long").alias("file_idx"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("__x").alias("x_min"),
            F.max("__x").alias("x_max"),
            F.min("__y").alias("y_min"),
            F.max("__y").alias("y_max"),
        )
    )

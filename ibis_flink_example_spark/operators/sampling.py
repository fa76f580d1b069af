"""Deterministic sampling operators for training-data pipelines: hash-based
train/val/test splits, fractional hash sampling, and stratified per-group
caps. (North-star extension surface — no counterpart in the reference, which
has no sampling of any kind; cf. its fixed 20k-record generator,
generate_source_data.py:13.)

Why hash-based instead of ``df.sample()``: at 100 TB a split must be
  1. deterministic — re-running the pipeline (or a failed-stage retry on a
     recomputed partition) must assign every row to the SAME split;
  2. stable under repartitioning — ``df.sample`` draws per-partition from a
     seeded RNG, so the sample CHANGES if the file layout or partition count
     changes;
  3. portable — the md5 of the row key gives the same assignment in Spark,
     DuckDB, or any downstream system auditing the split.

All three operators are pure JVM column expressions. ``hash_split`` and
``hash_sample`` are map-only — zero shuffles, fully pipelined into the scan.
``stratified_cap`` shuffles once on the stratum key (the unavoidable minimum
for a per-group rank).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(col: Column | str, hex_digits: int = 4) -> Column:
    """Lowercase-hex md5 prefix of the (stringified) key — a uniform label
    in a 16^hex_digits-bucket space, identical across engines. Lexicographic
    comparison of the fixed-width hex prefix is order-isomorphic to the
    bucket number, so thresholds are plain string comparisons."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.md5(c.cast("string")), 1, hex_digits)


def split_thresholds(weights: dict[str, float], hex_digits: int = 4) -> list[tuple[str, int]]:
    """[(label, exclusive upper INTEGER bound), ...] covering [0, 16^d) in
    declaration order; the last label absorbs rounding remainder. Bounds are
    integers, not hex strings: a cumulative weight that rounds to the full
    space would format as a (d+1)-char hex string that compares
    lexicographically BELOW most d-char buckets — callers must treat
    ``bound >= 16^d`` as "matches everything" instead of formatting it."""
    total = sum(weights.values())
    space = 16**hex_digits
    acc = 0.0
    out: list[tuple[str, int]] = []
    for label, w in weights.items():
        acc += w / total
        out.append((label, min(space, round(acc * space))))
    return out


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    *,
    split_col: str = "split",
    hex_digits: int = 4,
) -> DataFrame:
    """Assign every row to a named split by md5(key) — deterministic,
    repartition-stable, engine-portable (see module docstring). Map-only."""
    bucket = hash_bucket(key_col, hex_digits)
    space = 16**hex_digits
    thresholds = split_thresholds(weights, hex_digits)
    expr: Column = F.lit(thresholds[-1][0])  # last label = else-branch
    cond = None
    for label, bound in thresholds[:-1]:
        # bound >= space (cumulative weight rounded to the full space):
        # this label absorbs every remaining bucket — a hex-formatted
        # bound would be d+1 chars and compare lexicographically BELOW
        # most buckets, silently routing ~15/16 of rows past the label.
        c = (
            F.lit(True)
            if bound >= space
            else bucket < F.lit(format(bound, f"0{hex_digits}x"))
        )
        cond = F.when(c, label) if cond is None else cond.when(c, label)
    if cond is not None:
        expr = cond.otherwise(thresholds[-1][0])
    return df.withColumn(split_col, expr)


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, *, hex_digits: int = 4
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows by md5(key) threshold.
    Unlike ``df.sample`` the kept set is a pure function of the key.
    Map-only: the predicate pipelines into the scan."""
    bound_int = round(fraction * 16**hex_digits)
    if bound_int >= 16**hex_digits:
        # fraction ~ 1: the exclusive bound would format as a (d+1)-char
        # hex string that sorts BELOW most d-char buckets and keeps ~1/16
        # of rows — the whole frame is the correct sample.
        return df
    bound = format(bound_int, f"0{hex_digits}x")
    return df.filter(hash_bucket(key_col, hex_digits) < F.lit(bound))


def stratified_cap(
    df: DataFrame,
    *,
    stratum_col: str,
    key_col: str,
    cap: int,
    rank_col: str = "stratum_rank",
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum, chosen by md5(key) order — a
    deterministic per-group downsample (e.g. "at most N documents per
    language/domain"), the standard rebalancing step before training-set
    assembly.

    Ordering by the hash (with the key as tie-break) makes the kept subset a
    uniform-at-random-but-frozen choice per stratum. One shuffle on the
    stratum key; skewed strata are bounded by the cap itself on output, and
    AQE skew-split handles the rank input side at scale.
    """
    w = Window.partitionBy(stratum_col).orderBy(
        hash_bucket(key_col, 8), F.col(key_col)
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= cap)
    )


def pack_sequences(
    df: DataFrame,
    *,
    key_col: str,
    token_col: str,
    context_tokens: int,
    n_buckets: int = 256,
    pack_col: str = "pack_id",
    offset_col: str = "pack_offset",
) -> DataFrame:
    """Deterministic sequence packing: assign each document to a training
    context window ("pack") of ``context_tokens`` by cumulative token count.

    Scale design: a single global ORDER BY would serialize the whole corpus
    through one partition, so documents are first scattered into
    ``n_buckets`` md5 buckets and packed WITHIN each bucket — one shuffle
    on the bucket key, ``n_buckets``-way parallel window scan, and packs
    never span buckets (each pack is ``bucket-seq``). Order within a bucket
    is frozen by (md5(key), key), so the assignment is a pure function of
    the keys — re-runs, retries, and repartitioning cannot move a document
    between packs.

    Contract: ``pack_offset`` = tokens before this doc within its pack;
    a doc straddling the boundary closes the pack (the downstream loader
    truncates or pads — the classic greedy packing trade, kept out of the
    assignment so it stays engine-portable).
    """
    bucket = hash_bucket(key_col, 2) if n_buckets == 256 else (
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("string")
    )
    b = df.withColumn("__bucket", bucket)
    # Explicit ROWS frame: the default frame under orderBy is RANGE, which
    # makes peer rows (ties on the sort key) share one cumulative sum — the
    # DuckDB oracle uses ROWS, and the packing contract must not depend on
    # key uniqueness.
    w = (
        Window.partitionBy("__bucket")
        .orderBy(hash_bucket(key_col, 8), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = (F.sum(F.col(token_col)).over(w) - F.col(token_col)).cast("long")
    seq = F.floor(cum_before / F.lit(context_tokens)).cast("long")
    return (
        b.withColumn(pack_col, F.concat_ws("-", F.col("__bucket"), seq))
        .withColumn(offset_col, cum_before % F.lit(context_tokens))
        .drop("__bucket")
    )


def temperature_balanced_sample(
    df: DataFrame,
    *,
    stratum_col: str,
    key_col: str,
    target_frac: float = 0.5,
    rate_col: str | None = None,
) -> DataFrame:
    """Temperature-flattened stratum resampling (the multilingual-corpus
    rebalancing rule: sample language l with probability ∝ n_l^alpha,
    alpha = 0.5): keep ~``target_frac`` of the corpus with per-stratum
    keep-rates rate_l = min(1, target_frac · N · sqrt(n_l) / Σ_m sqrt(n_m)
    / n_l), so small strata are over-represented relative to their share
    and large strata are dampened.

    Scale shape: the stratum-count table is tiny (|strata| rows) and
    broadcast; membership is then a map-only hash-threshold predicate over
    the corpus — NO per-stratum sort or window, unlike rank-based capping.
    That is the 100 TB path: one small aggregation plus one streaming pass.

    Determinism across engines: the keep decision compares the md5(key)
    8-hex prefix against a threshold derived via floor(rate · 16^8) —
    sqrt/·//÷ are IEEE-correctly-rounded, the expression tree is mirrored
    in the SQL oracle, and the hex comparison is exact, so every engine
    keeps the identical row set.
    """
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n_l"))
    # sqrt weights quantized to integer micro-units BEFORE the cross-row
    # sum: SUM(double) is partition-order dependent, and a 1-ulp sum_w
    # difference could flip a stratum's floor()ed threshold. Integer sums
    # are exact at any partition order; the remaining float chain is a
    # fixed sequence of correctly-rounded IEEE ops on identical operands,
    # mirrored in the SQL oracle. (floor(x+0.5), not round(): engines
    # disagree on round()'s half-tie direction.)
    w_l = F.floor(F.sqrt(F.col("n_l")) * F.lit(1_000_000.0) + F.lit(0.5)).cast(
        "long"
    )
    counts = counts.withColumn("w_l", w_l)
    tot = counts.agg(
        F.sum("w_l").alias("sum_w"),
        F.sum("n_l").alias("n_docs"),
    )
    rate = F.least(
        F.lit(1.0),
        F.lit(target_frac)
        * F.col("n_docs")
        * F.col("w_l")
        / F.col("sum_w")
        / F.col("n_l"),
    )
    thr = F.lower(
        F.lpad(
            F.hex(F.floor(rate * F.lit(4294967296.0)).cast("long")), 8, "0"
        )
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        stratum_col, rate.alias("__rate"), thr.alias("__thr")
    )
    kept = df.join(F.broadcast(rates), on=stratum_col).filter(
        (F.col("__rate") >= 1.0) | (hash_bucket(key_col, 8) < F.col("__thr"))
    )
    if rate_col is not None:
        return kept.withColumn(rate_col, F.round(F.col("__rate"), 6)).drop(
            "__rate", "__thr"
        )
    return kept.drop("__rate", "__thr")


def pps_systematic_sample(
    df: DataFrame,
    *,
    id_col: str,
    weight_col: str,
    n: int,
    bucket_size: int = 4096,
) -> DataFrame:
    """Systematic probability-proportional-to-size sampling: lay the
    corpus's integer weights end to end on [0, W), drop ``n`` evenly
    spaced stride points ``t_k = floor(k*W/n)``, and select the document
    whose weight interval contains each point — the classic PPS design
    (heavy docs can legitimately carry several strides). Deterministic
    given the id order; every quantity is integer arithmetic, so the
    sample is engine-exact.

    Scale shape — the interesting part is the PREFIX SUM, which naive
    formulations compute with a global ORDER BY window (a single-partition
    trap at any real size). Here it is the standard two-level distributed
    scan:

    1. ids bucket by ``id DIV bucket_size``; per-bucket weight sums are a
       corpus/bucket_size-row frame (one map-side-combined aggregation);
    2. bucket offsets + the grand total W come from windows over THAT tiny
       frame (its single partition holds corpus/bucket_size rows — at
       10^11 docs and bucket_size 10^6, a hundred-thousand-row frame; add
       a third level before this ever matters);
    3. each doc's global cumulative = bucket offset + an in-bucket
       running sum (windows partitioned by bucket — parallel).

    Stride assignment then needs NO join against the stride list: doc i
    with interval [cum-w, cum) covers exactly the strides
    ``k in [ceil((cum-w)*n/W), floor((cum*n - 1)/W)]`` (integer-derived
    bounds), generated in-row with sequence+explode. Zero-weight docs are
    FILTERED before the bound math — their empty interval covers nothing,
    and a zero-weight doc at the HEAD of the id order would otherwise
    evaluate ``(0*n - 1) DIV W``, whose truncate-toward-zero result (0,
    identically in Spark and DuckDB) fakes a covering stride (the repo's
    negative-operand DIV rule: the derivation is floor-only on
    NON-NEGATIVE operands). Products run in DECIMAL(38,0) — cum*n stays
    exact far past int64 corpora.

    Contract: ``id_col`` values must be UNIQUE — the design is "lay the
    weights end to end in id order", and duplicate ids make the in-bucket
    ROWS-frame running sum order nondeterministic among peers (a SQL
    mirror with a RANGE frame would also group peers, diverging further).
    Exactly ``n`` rows (sample_idx 0..n-1, id_col, weight) when
    total weight > 0; negative weights raise at evaluation time
    (``raise_error`` guard — cumulative sums silently corrupt the bounds
    otherwise); an empty / all-zero-weight input returns an EMPTY frame
    (the weight line has no intervals — a PPS design over it does not
    exist; the zero-weight pre-filter removes every row before any
    divisor is touched, so this is a defined result, not a crash).
    """
    if n < 1:
        raise ValueError("pps_systematic_sample: n must be >= 1")
    w_guard = F.when(
        F.col(weight_col).cast("long") < 0,
        F.raise_error(
            F.lit("pps_systematic_sample: negative weight encountered")
        ).cast("long"),
    ).otherwise(F.col(weight_col).cast("long"))
    b = df.select(
        F.col(id_col),
        w_guard.alias("__w"),
        F.expr(f"{id_col} DIV {bucket_size}").alias("__bkt"),
    )
    bs = b.groupBy("__bkt").agg(F.sum("__w").alias("__bw"))
    w_off = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    w_tot = Window.orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = bs.select(
        "__bkt",
        F.coalesce(F.sum("__bw").over(w_off), F.lit(0)).cast("long").alias("__off"),
        F.sum("__bw").over(w_tot).cast("long").alias("__tot"),
    )
    w_in = (
        Window.partitionBy("__bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        b.withColumn("__cum_in", F.sum("__w").over(w_in))
        .join(offs, "__bkt")
        .withColumn("__cum", (F.col("__off") + F.col("__cum_in")).cast("long"))
    )
    dec = "CAST(__cum AS DECIMAL(38,0))"
    decw = "CAST(__w AS DECIMAL(38,0))"
    dect = "CAST(__tot AS DECIMAL(38,0))"
    klo = f"(({dec} - {decw}) * {n} + {dect} - 1) DIV {dect}"
    khi = f"({dec} * {n} - 1) DIV {dect}"
    spans = (
        cum.filter(F.col("__w") > 0)  # BEFORE the bound math; see docstring
        .select(
            F.col(id_col),
            F.col("__w").alias("weight"),
            F.expr(klo).cast("long").alias("__klo"),
            F.expr(khi).cast("long").alias("__khi"),
        )
        .filter(F.col("__khi") >= F.col("__klo"))
    )
    return spans.select(
        F.explode(F.expr("sequence(__klo, __khi)")).alias("sample_idx"),
        F.col(id_col),
        "weight",
    )


def epoch_shuffle_plan(
    df: DataFrame,
    *,
    id_col: str,
    n_epochs: int,
    n_shards: int = 8,
) -> DataFrame:
    """Deterministic training-order assignment — the step between a curated
    corpus and a training run: for every epoch, each document is (1)
    placed on a data-parallel shard by rendezvous hashing and (2) given a
    position within that shard by an epoch-salted hash order. Every epoch
    is an independent pseudo-random permutation, yet the whole plan is a
    pure function of (id, epoch) — re-runs, retries, and repartitioning
    reproduce byte-identical training order, which is what makes a 100 TB
    run resumable and debuggable. md5 hex is byte-identical in Spark and
    DuckDB, so the FULL assignment (not a sample) is oracle-checkable.

    Scale shape: the epoch fan-out is an in-row explode of a literal
    sequence (scan stage, x n_epochs); the shard argmax over ``n_shards``
    md5 hashes is a per-row array_max expression (rendezvous_shard_plan's
    idiom — no per-(row, shard) shuffle); the ONLY exchange is the
    (epoch, shard)-keyed window that numbers documents within each shard
    — n_epochs * n_shards independent partitions, each corpus/n_shards
    rows, scanned in parallel. No global sort anywhere. A worker streams
    its (epoch, shard) slice in seq order; packs follow via
    pack_sequences on the same keys.

    Ties: distinct ids virtually never collide on md5, but the window
    order is (sort_key, id) so the plan is total even under a collision.

    Returns (epoch, shard, seq_in_shard, id_col) — seq_in_shard is
    1-based within (epoch, shard).
    """
    if n_epochs < 1 or n_shards < 1:
        raise ValueError("epoch_shuffle_plan: n_epochs and n_shards >= 1")
    ids = F.col(id_col).cast("string")
    e = F.col("epoch").cast("string")

    def h(s: int) -> Column:
        return F.md5(F.concat(ids, F.lit(":"), e, F.lit(f":{s}")))

    best = F.array_max(
        F.array(
            *[
                F.struct(h(s).alias("h"), F.lit(s).alias("s"))
                for s in range(n_shards)
            ]
        )
    )
    fanned = df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(n_epochs - 1))).alias("epoch"),
    ).select(
        F.col(id_col),
        F.col("epoch").cast("long").alias("epoch"),
        best.getField("s").cast("long").alias("shard"),
        F.md5(F.concat(ids, F.lit(":"), e, F.lit(":order"))).alias("__sort"),
    )
    w = Window.partitionBy("epoch", "shard").orderBy("__sort", id_col)
    return fanned.select(
        "epoch",
        "shard",
        F.row_number().over(w).cast("long").alias("seq_in_shard"),
        id_col,
    )


def mixture_schedule(
    df: DataFrame,
    *,
    id_col: str,
    source_col: str,
    scale: int = 10**12,
) -> DataFrame:
    """Deterministic stride-interleave of sources into ONE feed order —
    the schedule that turns per-domain mixture decisions into an actual
    training stream: doc k of n_s within source s gets virtual time
    ``vt = (2k-1) * scale / (2*n_s)`` (the k-th of n_s evenly spaced
    midpoints of [0, scale)), so reading docs in vt order interleaves
    every source proportionally at every prefix — no source ever floods
    or starves the consumer, which is what epoch-level reweighting alone
    cannot guarantee. Order within a source is frozen by md5(id), and vt
    is a pure function of (id, source sizes): re-runs and repartitioning
    reproduce the identical schedule.

    Exactness: vt is one positive-operand floor division of a
    DECIMAL(38,0) product ((2k-1)*scale reaches ~2e23 at 1e11-doc
    sources — far past int64), engine-exact vs a HUGEINT oracle.

    Scale shape — per-source rank is the interesting part: a plain
    per-source ROW_NUMBER window serializes each source through ONE
    partition (a dominant source = the whole corpus single-partition
    trap). So ranks come from the two-level scan (the PPS prefix-sum
    idiom applied to counts): docs scatter into 256 md5-prefix buckets
    per source; per-(source, bucket) counts are a tiny frame whose
    windows yield bucket offsets and source totals; in-bucket
    ROW_NUMBER + offset = the global per-source rank. Because the
    bucket IS the okey's hex prefix, (bucket, okey, id) order equals
    plain (okey, id) order — the split is order-compatible, so the
    oracle can use the naive single window. One keyed exchange on
    (source, bucket); 256-way parallel per source.

    Returns (id_col, source_col, seq_in_source, vt_scaled) —
    seq_in_source 1-based within its source, vt_scaled in [0, scale).
    """
    okey = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":mix")))
    b = df.select(
        F.col(id_col),
        F.col(source_col),
        okey.alias("__okey"),
        F.substring(okey, 1, 2).alias("__bkt"),
    )
    counts = b.groupBy(source_col, "__bkt").agg(
        F.count(F.lit(1)).cast("long").alias("__cnt")
    )
    w_off = (
        Window.partitionBy(source_col)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy(source_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = counts.select(
        source_col,
        "__bkt",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
        .cast("long")
        .alias("__off"),
        F.sum("__cnt").over(w_tot).cast("long").alias("__ns"),
    )
    w_in = Window.partitionBy(source_col, "__bkt").orderBy("__okey", id_col)
    ranked = (
        b.withColumn("__r", F.row_number().over(w_in).cast("long"))
        .join(F.broadcast(offs), [source_col, "__bkt"])
        .withColumn("seq_in_source", F.col("__off") + F.col("__r"))
    )
    vt = (
        f"((2 * CAST(seq_in_source AS DECIMAL(38,0)) - 1) * {scale}) "
        "DIV (2 * __ns)"
    )
    return ranked.select(
        F.col(id_col),
        F.col(source_col),
        "seq_in_source",
        F.expr(vt).cast("long").alias("vt_scaled"),
    )


def mixture_reweight_iterative(
    scores: DataFrame,
    *,
    domain_col: str,
    score_col: str,
    n_iters: int = 5,
    scale: int = 1_000_000,
) -> DataFrame:
    """DoReMi-flavored multiplicative-weights mixture reweighting
    (Xie et al., 'DoReMi: Optimizing Data Mixtures Speeds Up Language
    Model Pretraining' — the Group-DRO update, with the repo's
    integer-exact discipline standing in for the proxy-model loss):
    start every domain at weight ``scale`` and repeat ``n_iters`` times

        mean_t  = SUM(w * s) DIV SUM(w)            (mixture-weighted mean)
        w_{t+1} = w_t * GREATEST(scale + (s - mean_t), 1) DIV scale

    so domains scoring ABOVE the current weighted mean (e.g. higher
    excess loss / rarer-content signal) gain weight multiplicatively and
    domains below lose it, converging toward the mixture that equalizes
    the scores — the actual DoReMi fixpoint shape. NOT closed-form: the
    weighted mean moves every step, so each iteration genuinely depends
    on the previous one (the pagerank posture; the oracle unrolls the
    recursion as generated CTEs).

    Exactness: everything integer. ``mean`` is one floor division of two
    POSITIVE sums; ``s - mean`` may be negative but is never divided
    (the Spark-DIV-vs-DuckDB-// negative-operand trap); the multiplier
    is clamped to >= 1 so weights stay positive; with scores in
    [0, scale] the multiplier is <= 2*scale and weights are bounded by
    scale * 2^n_iters — far inside int64 for any sane n_iters.

    Scale shape: the caller pays the corpus pass ONCE building
    ``scores`` (one row per domain); the loop here runs on that tiny
    frame — coalesce(1) + eager localCheckpoint per iteration (the r8
    iterative-loop discipline: lineage cut, no 32-task stages on a
    KB-sized frame), scalar mean attached via one-row broadcast
    crossJoin (BNLJ_ALLOWED shape).

    Returns (domain_col, score_col, weight_x{scale}) with the FINAL
    weights; callers release the last checkpoint via
    checkpoints.release_eager_checkpoints.
    """
    from ibis_flink_example_spark.operators.checkpoints import (
        attach_eager_checkpoints,
    )
    from ibis_flink_example_spark.operators.dedup import (
        _release_local_checkpoint,
    )

    # n_iters is capped because weights are bounded by scale * 2^n_iters:
    # past ~20 the int64 headroom (with scale 1e6) is gone and ANSI-off
    # sessions would wrap silently against the HUGEINT oracle.
    if not 0 <= n_iters <= 20 or not 2 <= scale <= 10**9:
        raise ValueError("mixture_reweight_iterative: bad n_iters/scale")
    s_raw = F.col(score_col).cast("long")
    # scores outside [0, scale] void the exactness proof: a negative
    # score makes SUM(w*s) negative and `DIV` (truncate) diverges from
    # the oracle's `//` (floor) on the mean — the repo's recorded
    # negative-operand trap; > scale breaks the weight bound. Lazy
    # per-row raise (the pps_systematic_sample idiom), review r11.
    s_guarded = F.when(
        (s_raw < 0) | (s_raw > scale),
        F.raise_error(
            F.lit(
                f"mixture_reweight_iterative: {score_col} outside "
                f"[0, {scale}] — center/clip scores upstream"
            )
        ).cast("long"),
    ).otherwise(s_raw)
    w = (
        scores.select(
            F.col(domain_col),
            s_guarded.alias("__s"),
            F.lit(scale).cast("long").alias("__w"),
        )
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    for _ in range(n_iters):
        tot = w.agg(
            F.sum(F.expr("__w * __s")).alias("__ws"),
            F.sum("__w").alias("__wsum"),
        )
        nxt = (
            w.crossJoin(F.broadcast(tot))
            .select(
                domain_col,
                "__s",
                F.expr(
                    f"CAST(__w * GREATEST({scale} + (__s - __ws DIV __wsum), 1) "
                    f"DIV {scale} AS BIGINT)"
                ).alias("__w"),
            )
            .coalesce(1)
            .localCheckpoint(eager=True)
        )
        _release_local_checkpoint(w)
        w = nxt
    out = w.select(
        domain_col,
        F.col("__s").alias(score_col),
        F.col("__w").alias(f"weight_x{scale}"),
    )
    return attach_eager_checkpoints(out, handles=(w,))


# Priority sampling (Duffield–Lund–Thorup, JACM 2007): draw u_i uniform,
# q_i = w_i / u_i, keep the k largest priorities; with tau = the (k+1)-th
# priority, est_i = max(w_i, tau) is an (essentially) unbiased estimator
# of w_i — the weighted-sampling-without-replacement design whose top-k
# form distributes as ONE TakeOrderedAndProject pass. u_i comes from an
# md5 prefix, so the whole draw is a pure function of the id: portable,
# repartition-stable, engine-exact.
PRIORITY_HEX_DIGITS = 12
PRIORITY_HASH_SCALE = 16**PRIORITY_HEX_DIGITS  # 2^48
# weights above this bound could overflow the int64 priority (w * 2^48);
# guard loudly instead of silently wrapping
PRIORITY_MAX_WEIGHT = (2**63 - 1) // PRIORITY_HASH_SCALE


def hex_prefix_int_sql(hex_col: str, n_hex: int = PRIORITY_HEX_DIGITS) -> str:
    """One SQL expression turning a lowercase-hex column prefix into its
    integer value via per-nibble instr lookups — the SAME text is a valid
    Spark SQL and DuckDB expression (instr/substr are 1-based in both), so
    engine and oracle share one source of truth for the u-draw."""
    # each term CAST to BIGINT: Spark types small integral literals as
    # INT, and (nibble * 16^7) already overflows int32 under ANSI mode
    terms = " + ".join(
        f"CAST(instr('0123456789abcdef', substr({hex_col}, {i + 1}, 1)) - 1"
        f" AS BIGINT) * {16 ** (n_hex - 1 - i)}"
        for i in range(n_hex)
    )
    return f"({terms})"


def priority_sample(
    df: DataFrame,
    *,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "prio",
) -> DataFrame:
    """Deterministic priority sample of size ``k`` with the
    Duffield–Lund–Thorup weight estimator.

    The draw: ``u_i = (h_i + 1) / 2^48`` with ``h_i`` the first 12 md5-hex
    digits of ``id:salt``; ``priority_i = floor(w_i * 2^48 / (h_i + 1))``
    — an exact integer rational, never a transcendental. The sample is
    the top-k frame by (priority DESC, id ASC); ``tau`` is the (k+1)-th
    priority (0 when the corpus has <= k rows, making every estimate
    exact); ``est_weight = greatest(w, tau)`` is the per-item
    Horvitz–Thompson-style estimate whose sum approximates total corpus
    weight using only the k kept rows.

    Scale shape: the draw and the priority are map-only scan-stage
    columns; selection is ONE TakeOrderedAndProject (top k+1 per
    partition, merged — never a global sort); the rank/tau bookkeeping
    runs over the <= k+1-row result (bounded single-partition window);
    tau rides a one-row broadcast. Weights must be in
    [0, PRIORITY_MAX_WEIGHT] — negative or overflow-scale weights raise
    at evaluation time rather than silently corrupting the order.

    Returns (id_col, weight, priority, est_weight), k rows (fewer iff the
    corpus is smaller), deterministic under any partitioning.
    """
    if k < 1:
        raise ValueError("priority_sample: k must be >= 1")
    w_guard = F.when(
        (F.col(weight_col).cast("long") < 0)
        | (F.col(weight_col).cast("long") > PRIORITY_MAX_WEIGHT),
        F.raise_error(
            F.lit(
                f"priority_sample: weight outside [0, {PRIORITY_MAX_WEIGHT}]"
            )
        ).cast("long"),
    ).otherwise(F.col(weight_col).cast("long"))
    hexed = df.select(
        F.col(id_col),
        w_guard.alias("__w"),
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}"))),
            1,
            PRIORITY_HEX_DIGITS,
        ).alias("__hex"),
    )
    drawn = hexed.select(
        id_col,
        "__w",
        F.expr(
            f"CAST(CAST(__w AS DECIMAL(38,0)) * {PRIORITY_HASH_SCALE} "
            f"DIV ({hex_prefix_int_sql('__hex')} + 1) AS BIGINT)"
        ).alias("priority"),
    )
    cand = drawn.orderBy(F.desc("priority"), F.col(id_col).asc()).limit(k + 1)
    w_rank = Window.orderBy(F.desc("priority"), F.col(id_col).asc())
    ranked = cand.select(
        id_col,
        "__w",
        "priority",
        F.row_number().over(w_rank).alias("__rn"),
    )
    tau = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("__rn") == k + 1, F.col("priority"))), F.lit(0)
        )
        .cast("long")
        .alias("__tau")
    )
    return (
        ranked.filter(F.col("__rn") <= k)
        .crossJoin(F.broadcast(tau))
        .select(
            id_col,
            F.col("__w").alias("weight"),
            "priority",
            F.greatest(F.col("__w"), F.col("__tau")).cast("long").alias("est_weight"),
        )
    )


# Cumulative Poisson(1) CDF thresholds scaled to 16^8, k = 0..7, computed
# once and frozen as integer literals — the inverse-CDF table for the
# deterministic Poisson draw below (tail mass beyond 7 is ~1e-5 and maps
# to weight 8; any engine gets the identical draw from the same md5 u).
POISSON1_THRESHOLDS_X2_32: tuple[int, ...] = (
    1580030168, 3160060337, 3950075421, 4213413783,
    4279248373, 4292415291, 4294609777, 4294923276,
)


def poisson_bootstrap_mean_ci(
    df: DataFrame,
    *,
    id_col: str,
    value_col: str,
    n_replicates: int = 40,
    trim: int = 2,
    salt: str = "boot",
) -> DataFrame:
    """Distributed bootstrap confidence interval for the mean, by the
    POISSON bootstrap (the with-replacement resample each row simulates
    locally with an independent Poisson(1) weight — the standard
    distributed formulation, since true multinomial resampling needs
    global coordination). Everything is deterministic and integer-exact:

    - the per-(row, replicate) weight is the inverse-CDF Poisson(1) draw
      from u = md5(id:salt:b) (first 8 hex), via the frozen integer
      threshold table above — a pure function of (id, b), identical in
      any engine, resumable and repartition-stable;
    - replicate means are one integer floor division of exact integer
      sums Σw·v and Σw (``value_col`` must be integer — quantize
      upstream: cents, x1e6 scores);
    - the CI is RANK-BASED: with B replicates, the interval is the
      (1+trim)-th smallest to the (B−trim)-th smallest replicate mean
      (trim=2 of B=40 ≈ a central 90% interval; exact order statistics,
      no quantile interpolation).

    Scale shape: the replicate fan-out is an in-row explode (x B) over a
    ``fan_out``-widened scan (a single-split file must not run the whole
    B-times-heavier fan-out as ONE task; at real split counts the widen
    is a no-op); the u-draw is ONE codegen'd md5 per fanned row
    (``conv(substr(md5 ..))`` — never rebuilt inside a higher-order
    lambda, where project-collapse would inline the full expression per
    threshold term and fall out of whole-stage codegen); the weight is a
    plain 8-branch integer comparison ladder that stays in codegen; the
    only exchange is the B-group aggregation with map-side partial sums
    (each partition collapses to B rows before the shuffle); the rank
    selection runs over the B-row frame (bounded). A replicate whose
    Poisson weights sum to 0 (probability e^-n — realized only on tiny
    inputs) is defined as ABSENT rather than dividing by zero, on both
    engine and oracle sides. Returns ONE row:
    (n_rows, b, point_mean_x1e6, ci_lo_mean_x1e6, ci_hi_mean_x1e6).
    """
    from ibis_flink_example_spark.catalog import fan_out

    if n_replicates < 2 * trim + 1:
        raise ValueError("poisson_bootstrap_mean_ci: B too small for trim")
    fanned = (
        fan_out(df.select(F.col(id_col).alias("__id"), F.col(value_col).cast("long").alias("__v")))
        .select(
            "__id",
            "__v",
            F.explode(
                F.sequence(F.lit(0), F.lit(n_replicates - 1))
            ).alias("__b"),
        )
        .select(
            "__b",
            "__v",
            F.expr(
                "CAST(conv(substr(md5(CAST(__id AS STRING) || "
                f"':{salt}:' || CAST(__b AS STRING)), 1, 8), 16, 10) "
                "AS BIGINT)"
            ).alias("__u"),
        )
    )
    # Plain comparison ladder (NOT F.filter over an array literal): each
    # term reads the materialized __u column, codegen CSE keeps the md5
    # single, and the Project stays inside WholeStageCodegen.
    w = sum(
        ((F.col("__u") >= F.lit(t)).cast("long") for t in POISSON1_THRESHOLDS_X2_32),
        F.lit(0).cast("long"),
    )
    reps = (
        fanned.select("__b", "__v", w.alias("__w"))
        .groupBy("__b")
        .agg(
            F.sum(F.expr("__w * __v")).cast("long").alias("__s"),
            F.sum("__w").cast("long").alias("__n"),
        )
        .filter(F.col("__n") > 0)
        .select(
            "__b",
            F.expr(
                "CAST(CAST(__s AS DECIMAL(38,0)) * 1000000 DIV __n AS BIGINT)"
            ).alias("__mean_x1e6"),
        )
    )
    w_rank = Window.orderBy("__mean_x1e6", "__b")
    ranked = reps.select(
        "__mean_x1e6", F.row_number().over(w_rank).alias("__rn")
    )
    ci = ranked.agg(
        F.max(
            F.when(F.col("__rn") == 1 + trim, F.col("__mean_x1e6"))
        ).alias("ci_lo_mean_x1e6"),
        F.max(
            F.when(F.col("__rn") == n_replicates - trim, F.col("__mean_x1e6"))
        ).alias("ci_hi_mean_x1e6"),
    )
    point = df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr(
            f"CAST(CAST(SUM(CAST({value_col} AS DECIMAL(38,0))) AS DECIMAL(38,0))"
            f" * 1000000 DIV COUNT(1) AS BIGINT)"
        ).alias("point_mean_x1e6"),
    )
    return point.crossJoin(F.broadcast(ci)).select(
        "n_rows",
        F.lit(n_replicates).cast("long").alias("b"),
        "point_mean_x1e6",
        "ci_lo_mean_x1e6",
        "ci_hi_mean_x1e6",
    )

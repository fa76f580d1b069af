"""Deterministic-sampling queries (north-star training-pipeline surface):
hash-based train/val/test split, fractional hash sampling, stratified
per-stratum caps. All fully SQL-expressible — md5 hex is identical in Spark
and DuckDB, so the oracle checks the exact assignment, not just counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ibis_flink_example_spark.catalog import load_table
from ibis_flink_example_spark.operators import sampling as SA
from ibis_flink_example_spark.operators import text as X
from ibis_flink_example_spark.queries import query


@query(
    "split_train_val_test",
    oracle=r"""
WITH b AS (
  SELECT doc_id, lang,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS bucket
  FROM documents
)
SELECT doc_id, lang,
  CASE WHEN bucket < 'cccd' THEN 'train'
       WHEN bucket < 'e666' THEN 'val'
       ELSE 'test' END AS split
FROM b
""",
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 deterministic split by md5(doc_id) — map-only (zero
    shuffles), repartition-stable, identical assignment in any engine."""
    docs = load_table(spark, sf_dir, "documents")
    return SA.hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "lang", "split")


@query(
    "sample_hash_10pct",
    oracle=r"""
SELECT doc_id, n_chars
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '199a'
""",
)
def sample_hash_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by md5(doc_id) threshold; the predicate is
    a pure column expression that pipelines into the parquet scan."""
    docs = load_table(spark, sf_dir, "documents")
    return SA.hash_sample(docs, "doc_id", 0.1).select("doc_id", "n_chars")


@query(
    "sample_stratified_cap",
    oracle=r"""
WITH r AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
         ) AS stratum_rank
  FROM documents
)
SELECT doc_id, lang, stratum_rank FROM r WHERE stratum_rank <= 40
""",
)
def sample_stratified_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At most 40 docs per language, chosen by frozen md5 order — the
    per-stratum rebalancing downsample before training-set assembly. One
    shuffle (stratum key); output bounded to cap x |strata| rows."""
    docs = load_table(spark, sf_dir, "documents")
    return SA.stratified_cap(
        docs, stratum_col="lang", key_col="doc_id", cap=40
    ).select("doc_id", "lang", "stratum_rank")


@query(
    "pack_sequences_2k",
    oracle=r"""
WITH t AS (
  SELECT doc_id,
    len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) AS n_tokens,
    substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
    substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS ord8
  FROM documents
), c AS (
  SELECT doc_id, n_tokens, bucket,
    SUM(n_tokens) OVER (
      PARTITION BY bucket ORDER BY ord8, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) - n_tokens AS cum_before
  FROM t
)
SELECT doc_id, n_tokens,
  bucket || '-' || CAST(cum_before // 2048 AS VARCHAR) AS pack_id,
  CAST(cum_before % 2048 AS BIGINT) AS pack_offset
FROM c
""",
)
def pack_sequences_2k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-set assembly: deterministic packing of documents into
    2048-token context windows (whitespace token counts). Bucketed so the
    window scan parallelizes (a global ORDER BY would bottleneck on one
    partition at 100 TB); pack membership is a pure function of doc ids —
    stable under re-runs, retries, and repartitioning."""
    from ibis_flink_example_spark.operators.text import token_count_whitespace

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count_whitespace("text").alias("n_tokens")
    )
    packed = SA.pack_sequences(
        docs, key_col="doc_id", token_col="n_tokens", context_tokens=2048
    )
    return packed.select("doc_id", "n_tokens", "pack_id", "pack_offset")


@query(
    "sample_lang_balanced",
    # sqrt weights are integer-quantized before the cross-row sum (order-
    # exact); the remaining float chain (· → ÷ → ÷ → floor·16^8) is
    # mirrored exactly op-for-op, so the per-lang hex thresholds — and
    # therefore the kept row SET — are engine-identical.
    oracle=r"""
WITH c AS (
  SELECT lang, COUNT(*) AS n_l,
    CAST(floor(sqrt(n_l) * 1000000.0 + 0.5) AS BIGINT) AS w_l
  FROM documents GROUP BY 1
), t AS (
  SELECT CAST(SUM(w_l) AS BIGINT) AS sum_w, CAST(SUM(n_l) AS BIGINT) AS n_docs
  FROM c
), r AS (
  -- every binary op forced to DOUBLE so the chain matches Spark's IEEE
  -- rounding at ANY scale (DuckDB would otherwise keep 0.5*n_docs*w_l in
  -- exact DECIMAL until the division, diverging once it exceeds 2^53)
  SELECT lang, LEAST(1.0, 0.5 * CAST(n_docs AS DOUBLE) * CAST(w_l AS DOUBLE)
                          / CAST(sum_w AS DOUBLE) / CAST(n_l AS DOUBLE)) AS rate
  FROM c CROSS JOIN t
), h AS (
  SELECT lang, rate,
    lower(lpad(to_hex(CAST(floor(rate * 4294967296.0) AS BIGINT)), 8, '0')) AS thr
  FROM r
)
SELECT d.doc_id, d.lang
FROM documents d JOIN h ON d.lang = h.lang
WHERE h.rate >= 1.0 OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < h.thr
""",
)
def sample_lang_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened language rebalancing (keep-rate ∝ sqrt share,
    ~50% of the corpus kept): the multilingual-pretraining sampling rule.
    Unlike the rank-based stratified cap, membership is a map-only hash
    threshold against a broadcast per-language rate table — no per-stratum
    sort, so the pass streams at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    return SA.temperature_balanced_sample(
        docs, stratum_col="lang", key_col="doc_id", target_frac=0.5
    ).select("doc_id", "lang")


@query(
    "split_group_aware_events",
    # Group-aware split + leakage audit: the hash is taken on the GROUP
    # key (user), so every event of a user lands in ONE split — the
    # leakage guard row-level hashing cannot give (a user's events
    # straddling train and test leaks behavior into evaluation). The
    # leakage_groups column is COMPUTED from the row-level assignment
    # (users with >1 distinct split), not assumed zero — the audit a
    # pipeline runs on any delivered split.
    oracle=r"""
WITH a AS (
  SELECT user_id, event_id,
    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 4) < 'cccd' THEN 'train'
         WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
         ELSE 'test' END AS split
  FROM events
), lk AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS leakage_groups FROM (
    SELECT user_id FROM a GROUP BY 1 HAVING COUNT(DISTINCT split) > 1
  )
)
SELECT a.split, CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users,
  CAST(COUNT(*) AS BIGINT) AS n_rows, lk.leakage_groups
FROM a CROSS JOIN lk GROUP BY a.split, lk.leakage_groups
""",
)
def split_group_aware_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-aware train/val/test split (80/10/10 by md5 of user_id) with
    a computed leakage audit — the assignment shape that prevents a
    user's history from straddling train and eval. Same map-only
    hash-threshold idiom as split_train_val_test, keyed on the group; the
    audit distinct-counts splits per user (one user-keyed exchange) and
    must report zero leaking groups."""
    events = load_table(spark, sf_dir, "events")
    assigned = SA.hash_split(
        events.select("user_id", "event_id"),
        "user_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )
    leak = (
        assigned.groupBy("user_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .agg(F.count(F.lit(1)).alias("leakage_groups"))
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .crossJoin(F.broadcast(leak))
        .select("split", "n_users", "n_rows", "leakage_groups")
    )


@query(
    "pps_systematic_sample",
    # PPS design verified value-exactly: the oracle's global cumsum window
    # (fine at oracle scale) must agree with the engine's two-level
    # distributed prefix sum, and the stride-coverage bounds are the same
    # integer derivation on both sides (floor(kW/n) in [cum-w, cum-1]
    # <=> k in [ceil((cum-w)n/W), (cum*n - 1) // W] — valid only on
    # NON-NEGATIVE operands, hence the mirrored w > 0 pre-filter: both
    # engines truncate (cum*n - 1) at cum = 0 toward zero, faking a
    # covering stride for a zero-weight head doc).
    oracle=r"""
WITH c AS (
  SELECT doc_id, CAST(n_chars AS HUGEINT) AS w,
         SUM(CAST(n_chars AS HUGEINT)) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(CAST(n_chars AS HUGEINT)) OVER () AS tot
  FROM documents
), s AS (
  SELECT doc_id, w, cum, tot,
         CAST(((cum - w) * 50 + tot - 1) // tot AS BIGINT) AS klo,
         CAST((cum * 50 - 1) // tot AS BIGINT) AS khi
  FROM c
)
SELECT CAST(UNNEST(range(klo, khi + 1)) AS BIGINT) AS sample_idx,
       doc_id,
       CAST(w AS BIGINT) AS weight
FROM s WHERE w > 0 AND khi >= klo
""",
)
def pps_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic PPS sampling of 50 documents weighted by n_chars
    (operators/sampling.py:pps_systematic_sample) — the
    probability-proportional-to-size design a curation stack uses to
    draw review/eval panels where big documents deserve proportionally
    more scrutiny. The engine side computes the corpus prefix sum with
    the two-level bucketed scan (no global-ORDER-BY window, no stride
    join — coverage explodes in-row); deterministic and integer-exact,
    so the full assignment value-hashes against the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    return SA.pps_systematic_sample(
        docs, id_col="doc_id", weight_col="n_chars", n=50
    )


@query(
    "epoch_shuffle_plan",
    # Full-assignment oracle: the rendezvous argmax re-derived as a
    # ROW_NUMBER over exploded (doc, epoch, shard) hashes (fine at oracle
    # scale; the engine does it join-free in-row), then the same
    # epoch-salted md5 order numbers documents within each shard.
    oracle="""
WITH ee AS (
  SELECT doc_id, UNNEST(range(0, 3)) AS e FROM documents
), pairs AS (
  SELECT doc_id, e, UNNEST(range(0, 8)) AS s FROM ee
), hashed AS (
  SELECT doc_id, e, CAST(s AS BIGINT) AS s,
         md5(doc_id || ':' || e || ':' || s) AS h
  FROM pairs
), best AS (
  SELECT doc_id, e, s FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY doc_id, e ORDER BY h DESC, s DESC
    ) AS rn FROM hashed
  ) WHERE rn = 1
)
SELECT CAST(e AS BIGINT) AS epoch, s AS shard,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY e, s
    ORDER BY md5(doc_id || ':' || e || ':order'), doc_id
  ) AS BIGINT) AS seq_in_shard,
  doc_id
FROM best
""",
)
def epoch_shuffle_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order assignment
    (operators/sampling.py:epoch_shuffle_plan): every document placed on
    one of 8 data-parallel shards by rendezvous hashing and ordered
    within its shard by an epoch-salted md5, for 3 epochs — the last
    step between a curated corpus and a resumable training run. Each
    epoch is an independent frozen permutation; the whole plan is a pure
    function of (doc_id, epoch), so retries and repartitioning reproduce
    byte-identical training order. Scale shape: epoch fan-out and the
    shard argmax are scan-stage row expressions; the only exchange is the
    (epoch, shard)-keyed numbering window — 24 independent partitions
    scanned in parallel, no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    return SA.epoch_shuffle_plan(docs, id_col="doc_id", n_epochs=3, n_shards=8)


@query(
    "mixture_schedule",
    # The engine's two-level rank construction is order-compatible with
    # the naive per-source window (the bucket is the order key's hex
    # prefix), so the oracle uses the plain ROW_NUMBER; vt is the same
    # HUGEINT product + floor division.
    oracle="""
WITH r AS (
  SELECT doc_id, source,
    ROW_NUMBER() OVER (
      PARTITION BY source ORDER BY md5(doc_id || ':mix'), doc_id
    ) AS k,
    COUNT(*) OVER (PARTITION BY source) AS n_s
  FROM documents
)
SELECT doc_id, source, CAST(k AS BIGINT) AS seq_in_source,
  CAST((2 * CAST(k AS HUGEINT) - 1) * 1000000000000 // (2 * n_s)
       AS BIGINT) AS vt_scaled
FROM r
""",
)
def mixture_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stride-interleave feed order across sources
    (operators/sampling.py:mixture_schedule): each document gets a
    virtual time placing its source's docs at evenly spaced midpoints of
    [0, 1e12), so streaming the corpus in vt order keeps every prefix
    proportionally mixed across domains — the schedule that turns
    mixture weights into an actual training stream. Pure function of
    (doc_id, source sizes); the per-source rank is the two-level bucketed
    scan (no single-partition window even for a dominant source)."""
    docs = load_table(spark, sf_dir, "documents")
    return SA.mixture_schedule(docs, id_col="doc_id", source_col="source")


def _reweight_oracle(n_iters: int = 5, scale: int = 1_000_000) -> str:
    """Generated unrolled-recursion oracle (the pagerank idiom): w0..wN
    CTEs, each step's weighted mean a scalar subquery over the previous
    frame. HUGEINT throughout (w*s products pass int64 at corpus scale);
    the engine's DECIMAL(38,0) mirrors it."""
    ctes = [
        f"w0 AS (SELECT source, s, CAST({scale} AS HUGEINT) AS w FROM sc)"
    ]
    for t in range(1, n_iters + 1):
        prev = f"w{t - 1}"
        ctes.append(
            f"w{t} AS (SELECT source, s, "
            f"w * GREATEST({scale} + (s - (SELECT SUM(w * s) // SUM(w) "
            f"FROM {prev})), 1) // {scale} AS w FROM {prev})"
        )
    steps = ",\n".join(ctes)
    return rf"""
WITH wd AS (
  SELECT doc_id, source, regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS ws
  FROM documents
), bg AS (
  SELECT wd.source, concat_ws(' ', ws[i], ws[i+1]) AS bigram
  FROM wd, UNNEST(range(1, len(ws))) AS t(i)
  WHERE len(ws) >= 2
), cf AS (
  SELECT bigram, COUNT(*) AS corpus_count FROM bg GROUP BY 1
), persrc AS (
  SELECT bg.source,
    SUM(CASE WHEN cf.corpus_count < 5 THEN 1 ELSE 0 END) AS n_rare,
    COUNT(*) AS n_bg
  FROM bg JOIN cf USING (bigram) GROUP BY 1
), sc AS (
  SELECT d.source,
    CAST(COALESCE(p.n_rare * {scale} // p.n_bg, 0) AS BIGINT) AS s
  FROM (SELECT DISTINCT source FROM documents) d
  LEFT JOIN persrc p USING (source)
),
{steps}
SELECT source, CAST(s AS BIGINT) AS score_x1e6,
       CAST(w AS BIGINT) AS weight_x{scale}
FROM w{n_iters}
"""


@query("mixture_reweight_iterative", oracle=_reweight_oracle(5))
def mixture_reweight_iterative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-flavored mixture solve
    (operators/sampling.py:mixture_reweight_iterative): 5 rounds of
    multiplicative weights over per-source rare-bigram quality scores —
    sources scoring above the CURRENT mixture-weighted mean gain weight,
    below lose it, converging toward the score-equalizing mixture (the
    Group-DRO update DoReMi runs with proxy-model losses; the rare-rate
    stands in as the integer-exact signal). Genuinely iterative — the
    weighted mean moves every round — so the oracle unrolls the
    recursion as generated CTEs (the pagerank idiom). The corpus is
    scanned ONCE (bigram rates per source); the loop runs on the
    source-count-sized frame with coalesce(1) + eager localCheckpoint
    per step and one-row scalar broadcasts (BNLJ whitelist). Closes the
    audit -> solve -> schedule chain: mixture_quality_occupancy shows
    the problem, this solves the weights, mixture_schedule streams
    them."""
    docs = load_table(spark, sf_dir, "documents")
    # explicit whitespace class (operators/text.py:WS_SPLIT) — the \s+
    # shorthand diverges engine-vs-oracle on U+000B
    ws = F.split(F.trim(F.col("text")), X.WS_SPLIT)
    bigrams = docs.select(
        "source",
        F.explode(
            F.when(
                F.size(ws) >= 2,
                F.zip_with(
                    F.slice(ws, 1, F.size(ws) - 1),
                    F.slice(ws, 2, F.size(ws) - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram"),
    )
    cf = bigrams.groupBy("bigram").agg(F.count(F.lit(1)).alias("corpus_count"))
    rare = F.when(F.col("corpus_count") < 5, 1).otherwise(0)
    persrc = (
        bigrams.join(cf, "bigram")
        .groupBy("source")
        .agg(
            F.sum(rare).alias("n_rare"),
            F.count(F.lit(1)).alias("n_bg"),
        )
    )
    scores = (
        docs.select("source")
        .distinct()
        .join(persrc, "source", "left")
        .select(
            "source",
            F.coalesce(
                F.expr(
                    "CAST(n_rare AS DECIMAL(38,0)) * 1000000 DIV n_bg"
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("score_x1e6"),
        )
    )
    return SA.mixture_reweight_iterative(
        scores, domain_col="source", score_col="score_x1e6", n_iters=5
    )


def _priority_sample_oracle(k: int) -> str:
    from ibis_flink_example_spark.operators.sampling import (
        PRIORITY_HASH_SCALE,
        hex_prefix_int_sql,
    )

    h = hex_prefix_int_sql("__hex")
    return rf"""
WITH b AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
         substr(md5(CAST(doc_id AS STRING) || ':prio'), 1, 12) AS __hex
  FROM documents
), p AS (
  SELECT doc_id, weight,
    CAST(CAST(weight AS HUGEINT) * {PRIORITY_HASH_SCALE} // ({h} + 1)
         AS BIGINT) AS priority
  FROM b
), r AS (
  SELECT doc_id, weight, priority,
         ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id ASC) AS rn
  FROM p QUALIFY rn <= {k + 1}
), t AS (
  SELECT COALESCE(MAX(CASE WHEN rn = {k + 1} THEN priority END), 0) AS tau
  FROM r
)
SELECT doc_id, weight, priority,
       CAST(GREATEST(weight, tau) AS BIGINT) AS est_weight
FROM r CROSS JOIN t WHERE rn <= {k}
"""


def _cluster_rep_sample_oracle(k: int) -> str:
    from ibis_flink_example_spark.operators.sampling import (
        PRIORITY_HASH_SCALE,
        hex_prefix_int_sql,
    )

    h = hex_prefix_int_sql("__hex")
    return rf"""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0
), cl AS (
  SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS weight
  FROM aug
  GROUP BY md5(lower(regexp_replace(trim(text), '[ \t\n\x0B\f\r]+', ' ', 'g')))
), b AS (
  SELECT doc_id, weight,
         substr(md5(CAST(doc_id AS STRING) || ':cluster'), 1, 12) AS __hex
  FROM cl
), p AS (
  SELECT doc_id, weight,
    CAST(CAST(weight AS HUGEINT) * {PRIORITY_HASH_SCALE} // ({h} + 1)
         AS BIGINT) AS priority
  FROM b
), r AS (
  SELECT doc_id, weight, priority,
         ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id ASC) AS rn
  FROM p QUALIFY rn <= {k + 1}
), t AS (
  SELECT COALESCE(MAX(CASE WHEN rn = {k + 1} THEN priority END), 0) AS tau
  FROM r
)
SELECT doc_id, weight, priority,
       CAST(GREATEST(weight, tau) AS BIGINT) AS est_weight
FROM r CROSS JOIN t WHERE rn <= {k}
"""


@query("cluster_representative_sampling", oracle=_cluster_rep_sample_oracle(40))
def cluster_representative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware weighted subsetting — the composition a corpus-audit
    sample actually needs: exact-dup clusters over the planted-dup
    corpus collapse to their min-id representative carrying the cluster
    SIZE as weight, then a Duffield-Lund-Thorup priority sample of 40
    representatives (operators/sampling.py:priority_sample) draws a
    one-pass weighted sample whose est_weight column still estimates
    total corpus mass — duplicates influence the sample through their
    count exactly once, instead of flooding it (naive uniform sampling
    over raw docs oversamples every crawler trap). Digest clusters are
    one narrow shuffle (digests, never text); selection is one
    TakeOrderedAndProject; tau rides a one-row broadcast."""
    from ibis_flink_example_spark.operators.dedup import content_digest
    from ibis_flink_example_spark.queries_llm import _with_planted_dups

    aug = _with_planted_dups(load_table(spark, sf_dir, "documents"))
    clusters = (
        aug.withColumn("__digest", content_digest("text"))
        .groupBy("__digest")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).cast("long").alias("cluster_size"),
        )
    )
    return SA.priority_sample(
        clusters, id_col="doc_id", weight_col="cluster_size", k=40,
        salt="cluster",
    )


@query("priority_sample_topk", oracle=_priority_sample_oracle(60))
def priority_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup) of 60 docs weighted by
    n_chars, with the tau-threshold weight estimator
    (operators/sampling.py:priority_sample) — the classic one-pass
    weighted-sample-without-replacement design: u from an md5 prefix
    (pure function of doc_id — resumable, repartition-stable), priorities
    as exact integer rationals w*2^48/(h+1), selection as ONE
    TakeOrderedAndProject, tau on a one-row broadcast. Complements
    pps_systematic_sample (fixed-rate systematic) with the top-k
    estimator form subsetting-with-error-bars pipelines use."""
    docs = load_table(spark, sf_dir, "documents")
    return SA.priority_sample(
        docs, id_col="doc_id", weight_col="n_chars", k=60
    )


def _kfold_oracle(k: int = 5) -> str:
    from ibis_flink_example_spark.operators.sampling import hex_prefix_int_sql

    h = hex_prefix_int_sql("substr(md5(CAST(doc_id AS STRING) || ':fold'), 1, 4)", 4)
    return f"""
WITH assigned AS (
  SELECT lang, {h} % {k} AS fold FROM documents
), occ AS (
  SELECT lang, CAST(fold AS BIGINT) AS fold,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM assigned GROUP BY 1, 2
)
SELECT lang, fold, n_docs,
  CAST(n_docs * 1000000 // SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT)
    AS share_x1e6
FROM occ
"""


@query("stratified_kfold_plan", oracle=_kfold_oracle(5))
def stratified_kfold_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-validation infrastructure: deterministic 5-fold assignment
    by md5(doc_id) — pure function of the id (repartition-stable,
    resumable, engine-portable), reported as the (lang, fold) occupancy
    table with within-language shares, the balance audit run before
    trusting fold-wise metrics. Map-only assignment; one grouped
    aggregation; the share window partitions by language (parallel).
    Complements split_train_val_test (fixed split) and
    split_group_aware_events (leakage-safe grouping) with the k-fold
    rotation form."""
    from ibis_flink_example_spark.operators.sampling import hex_prefix_int_sql

    docs = load_table(spark, sf_dir, "documents")
    fold_sql = (
        hex_prefix_int_sql(
            "substr(md5(CAST(doc_id AS STRING) || ':fold'), 1, 4)", 4
        )
        + " % 5"
    )
    occ = (
        docs.select("lang", F.expr(fold_sql).cast("long").alias("fold"))
        .groupBy("lang", "fold")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    return occ.select(
        "lang",
        "fold",
        "n_docs",
        F.expr(
            "CAST(n_docs * 1000000 DIV SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT)"
        ).alias("share_x1e6"),
    )


_PACK_CONTEXT = 512
_PACK_SHARDS = 8


@query(
    "sequence_packing_bins",
    oracle=rf"""
WITH t AS (
  SELECT doc_id,
    len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) AS n_tokens
  FROM documents
), d AS (
  SELECT doc_id,
    LEAST(n_tokens, {_PACK_CONTEXT}) AS tok_c,
    (n_tokens > {_PACK_CONTEXT}) AS truncated,
    CASE WHEN LEAST(n_tokens, {_PACK_CONTEXT}) <= 64 THEN 64
         WHEN LEAST(n_tokens, {_PACK_CONTEXT}) <= 128 THEN 128
         WHEN LEAST(n_tokens, {_PACK_CONTEXT}) <= 256 THEN 256
         ELSE {_PACK_CONTEXT} END AS len_bucket,
    doc_id % {_PACK_SHARDS} AS shard
  FROM t
), r AS (
  SELECT len_bucket, shard, tok_c, truncated,
    ROW_NUMBER() OVER (
      PARTITION BY len_bucket, shard ORDER BY tok_c DESC, doc_id
    ) AS rn
  FROM d
)
SELECT CAST(len_bucket AS INTEGER) AS len_bucket,
  CAST(shard AS INTEGER) AS shard,
  CAST((rn - 1) // ({_PACK_CONTEXT} // len_bucket) AS BIGINT) AS bin_id,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(tok_c) AS BIGINT) AS bin_tokens,
  CAST(SUM(tok_c) * 1000000 // {_PACK_CONTEXT} AS BIGINT) AS occupancy_x1e6,
  CAST(SUM(CASE WHEN truncated THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated
FROM r
GROUP BY len_bucket, shard, bin_id
""",
)
def sequence_packing_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence BIN packing with per-bin occupancy stats
    (VERDICT r12 #3b — the last mile between corpus and dataloader).
    Unlike pack_sequences_2k (concat-then-chop: documents straddle
    context boundaries), this is the no-straddle discipline real LLM
    dataloaders use at scale: LENGTH-BUCKETED packing. Token counts are
    capped at the 512-token context, docs fall into power-of-two length
    buckets (an exact integer CASE ladder; ``floor(log2(int))`` would
    also be engine-exact by the whole-bit gap argument of
    operators/retrieval.py — the ladder is simply the cheaper form for
    4 fixed buckets, not a portability necessity), and within each
    (bucket, shard) docs
    are placed greedily in DECREASING length order (the deterministic
    greedy arm of first-fit-decreasing that stays engine-exact: inside
    a bucket every doc fits the bucket's guaranteed per-bin capacity
    512 DIV bucket, so the greedy assignment is a pure row_number
    formula and never needs the sequential bin-remainder recursion that
    SQL cannot express). Output: one row per bin with doc count, token
    occupancy (x1e6 of the 512 capacity) and truncation count — the
    table that tells you how much padding the packing wastes per length
    class.

    Scale shape: token counting and bucketing fuse into the scan; the
    ONLY exchange is the (bucket, shard) window hash — sharding by
    doc_id % 8 mirrors dataloader workers and keeps the window
    32-way parallel instead of 4 bucket-wide partitions (the 100 TB
    fix: a mega-bucket never serializes onto one task); the per-bin
    rollup rides the same partitioning (groupBy keys are a superset of
    the window keys — zero additional exchange)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = X.token_count_whitespace("text")
    d = docs.select(
        "doc_id",
        F.least(tok, F.lit(_PACK_CONTEXT)).alias("tok_c"),
        (tok > _PACK_CONTEXT).alias("truncated"),
    ).withColumn(
        "len_bucket",
        F.when(F.col("tok_c") <= 64, 64)
        .when(F.col("tok_c") <= 128, 128)
        .when(F.col("tok_c") <= 256, 256)
        .otherwise(_PACK_CONTEXT)
        .cast("int"),
    ).withColumn("shard", (F.col("doc_id") % _PACK_SHARDS).cast("int"))
    from pyspark.sql import Window

    w = Window.partitionBy("len_bucket", "shard").orderBy(
        F.col("tok_c").desc(), F.col("doc_id")
    )
    r = d.withColumn("rn", F.row_number().over(w)).withColumn(
        "bin_id",
        F.expr(
            f"CAST((rn - 1) DIV ({_PACK_CONTEXT} DIV len_bucket) AS BIGINT)"
        ),
    )
    return r.groupBy("len_bucket", "shard", "bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("tok_c").cast("long").alias("bin_tokens"),
        F.expr(f"CAST(SUM(tok_c) * 1000000 DIV {_PACK_CONTEXT} AS BIGINT)")
        .alias("occupancy_x1e6"),
        F.sum(F.when(F.col("truncated"), 1).otherwise(0))
        .cast("long")
        .alias("n_truncated"),
    )


@query(
    "mixture_waterfill_allocation",
    # Exact integer water-filling: capped set determined by the
    # cross-multiplied inequality on the (cap/w)-sorted prefix sums —
    # never a float tau — so both engines pick the identical set.
    oracle=r"""
WITH s AS (
  SELECT source,
    CAST(SUM(len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+'))) AS BIGINT) AS a,
    CAST(GREATEST(1, SUM(CASE WHEN n_chars > 300 THEN 1 ELSE 0 END)) AS BIGINT) AS w
  FROM documents GROUP BY 1
), med AS (
  SELECT a AS med_a FROM (
    SELECT a, ROW_NUMBER() OVER (ORDER BY a, source) AS arn, COUNT(*) OVER () AS n FROM s
  ) WHERE arn = (n + 1) // 2
), c AS (
  SELECT source, a, w, LEAST(a, (SELECT med_a FROM med)) AS cap FROM s
), o AS (
  SELECT source, a, w, cap,
    ROW_NUMBER() OVER (ORDER BY cap * 1000000 // w, source) AS rn,
    SUM(cap) OVER (ORDER BY cap * 1000000 // w, source ROWS UNBOUNDED PRECEDING) AS c_incl,
    SUM(w) OVER (ORDER BY cap * 1000000 // w, source ROWS UNBOUNDED PRECEDING) AS w_incl,
    CAST(SUM(cap) OVER () * 9 // 10 AS BIGINT) AS b,
    CAST(SUM(w) OVER () AS BIGINT) AS sw
  FROM c
), o2 AS (
  SELECT *, sw - w_incl AS w_rest,
    (cap * (sw - w_incl) <= w * (b - c_incl)) AS cond
  FROM o
), o3 AS (
  SELECT *, COALESCE(MAX(CASE WHEN cond THEN rn END) OVER (), 0) AS k FROM o2
), o4 AS (
  SELECT *,
    COALESCE(MAX(CASE WHEN rn = k THEN b - c_incl END) OVER (), MAX(b) OVER ()) AS num,
    COALESCE(MAX(CASE WHEN rn = k THEN w_rest END) OVER (), MAX(sw) OVER ()) AS den
  FROM o3
)
SELECT source,
  a AS available_tokens,
  w AS weight,
  cap AS cap_tokens,
  (rn <= k) AS is_capped,
  CAST(CASE WHEN rn <= k THEN cap ELSE w * num // den END AS BIGINT) AS allocated_tokens,
  CAST(CASE WHEN rn <= k THEN 1000000
       ELSE (w * num // den) * 1000000 // cap END AS BIGINT) AS fill_x1e6
FROM o4
""",
)
def mixture_waterfill_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture allocation by EXACT integer water-filling —
    the feasibility planner between domain_mixture_weights (what mixture
    do we WANT) and the sampling rules (how do we draw it): given
    per-source available tokens, quality-derived weights (docs with
    n_chars > 300, floored at 1 so a zero-quality source still
    terminates), a per-source repetition cap (min(available, median
    available) — the anti-domination rule, scale-free across fixtures)
    and a global budget of 90% of total cap, allocate
    min(cap_i, w_i * tau) with sum = budget. The threshold tau is never
    materialized as a float: sources sort by cap*1e6 DIV w, the capped
    set is the maximal prefix satisfying the CROSS-MULTIPLIED inequality
    cap_k * W_rest <= w_k * (B - C_incl) over prefix sums (pure int64
    compares, identical in both engines; budget < total cap guarantees
    the uncapped remainder is non-empty, so the divisor never hits
    zero), and uncapped sources get w_i * num DIV den. Output one row
    per source with the allocation and fill fraction.

    Scale shape: ONE exchange (the per-source rollup); everything after
    runs as windows over the |sources|-row frame — domain-sized
    (single-partition by design, like the seasonal/daily frames; a
    million-domain corpus would partition the sort by a domain shard and
    merge, but the frame is never data-sized). At real corpus sizes the
    int64 cross-products need the same 1e6-unit downscaling the fixed-
    point idioms use fleet-wide (tokens ~1e13 x weights would overflow
    raw)."""
    from ibis_flink_example_spark.operators.text import token_count_whitespace

    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.sum(token_count_whitespace("text")).cast("long").alias("a"),
        F.greatest(
            F.lit(1).cast("long"),
            F.sum(F.when(F.col("n_chars") > 300, 1).otherwise(0)).cast("long"),
        ).alias("w"),
    )
    m = s.select(
        "*",
        F.expr("ROW_NUMBER() OVER (ORDER BY a, source)").alias("arn"),
        F.expr("COUNT(*) OVER ()").alias("n"),
    )
    c = m.select(
        "*",
        F.expr("MAX(CASE WHEN arn = (n + 1) DIV 2 THEN a END) OVER ()").alias(
            "med_a"
        ),
    ).select("source", "a", "w", F.least("a", "med_a").alias("cap"))
    o = c.select(
        "*",
        F.expr("ROW_NUMBER() OVER (ORDER BY cap * 1000000 DIV w, source)").alias("rn"),
        F.expr(
            "SUM(cap) OVER (ORDER BY cap * 1000000 DIV w, source"
            " ROWS UNBOUNDED PRECEDING)"
        ).alias("c_incl"),
        F.expr(
            "SUM(w) OVER (ORDER BY cap * 1000000 DIV w, source"
            " ROWS UNBOUNDED PRECEDING)"
        ).alias("w_incl"),
        F.expr("CAST(SUM(cap) OVER () * 9 DIV 10 AS BIGINT)").alias("b"),
        F.expr("CAST(SUM(w) OVER () AS BIGINT)").alias("sw"),
    )
    o2 = o.select(
        "*",
        (F.col("sw") - F.col("w_incl")).alias("w_rest"),
        (
            F.col("cap") * (F.col("sw") - F.col("w_incl"))
            <= F.col("w") * (F.col("b") - F.col("c_incl"))
        ).alias("cond"),
    )
    o3 = o2.select(
        "*",
        F.expr("COALESCE(MAX(CASE WHEN cond THEN rn END) OVER (), 0)").alias("k"),
    )
    o4 = o3.select(
        "*",
        F.expr(
            "COALESCE(MAX(CASE WHEN rn = k THEN b - c_incl END) OVER (),"
            " MAX(b) OVER ())"
        ).alias("num"),
        F.expr(
            "COALESCE(MAX(CASE WHEN rn = k THEN w_rest END) OVER (),"
            " MAX(sw) OVER ())"
        ).alias("den"),
    )
    return o4.select(
        "source",
        F.col("a").alias("available_tokens"),
        F.col("w").alias("weight"),
        F.col("cap").alias("cap_tokens"),
        (F.col("rn") <= F.col("k")).alias("is_capped"),
        F.expr(
            "CAST(CASE WHEN rn <= k THEN cap ELSE w * num DIV den END AS BIGINT)"
        ).alias("allocated_tokens"),
        F.expr(
            "CAST(CASE WHEN rn <= k THEN 1000000"
            " ELSE (w * num DIV den) * 1000000 DIV cap END AS BIGINT)"
        ).alias("fill_x1e6"),
    )


# Waterfill tail shared by the two epoch-budget arms (whitespace-token
# and BPE-token bases): everything downstream of the per-source
# (source, a, w) rollup is identical integer machinery, so the SQL
# mirror is one string with the ``s`` CTE swapped per arm.
_EPOCH_BUDGET_TAIL_SQL = r""", c AS (
  SELECT source, a, w, a * 6 AS cap FROM s
), o AS (
  SELECT source, a, w, cap,
    ROW_NUMBER() OVER (ORDER BY cap * 1000000 // w, source) AS rn,
    SUM(cap) OVER (ORDER BY cap * 1000000 // w, source ROWS UNBOUNDED PRECEDING) AS c_incl,
    SUM(w) OVER (ORDER BY cap * 1000000 // w, source ROWS UNBOUNDED PRECEDING) AS w_incl,
    CAST(SUM(a) OVER () * 4 AS BIGINT) AS b,
    CAST(SUM(w) OVER () AS BIGINT) AS sw
  FROM c
), o2 AS (
  SELECT *, sw - w_incl AS w_rest,
    (cap * (sw - w_incl) <= w * (b - c_incl)) AS cond
  FROM o
), o3 AS (
  SELECT *, COALESCE(MAX(CASE WHEN cond THEN rn END) OVER (), 0) AS k FROM o2
), o4 AS (
  SELECT *,
    COALESCE(MAX(CASE WHEN rn = k THEN b - c_incl END) OVER (), MAX(b) OVER ()) AS num,
    COALESCE(MAX(CASE WHEN rn = k THEN w_rest END) OVER (), MAX(sw) OVER ()) AS den
  FROM o3
), alloc AS (
  SELECT source, a, w,
    CAST(CASE WHEN rn <= k THEN cap ELSE w * num // den END AS BIGINT) AS allocated
  FROM o4
)
SELECT source,
  a AS available_tokens,
  w AS weight,
  allocated AS allocated_tokens,
  CAST(CASE WHEN a = 0 THEN NULL ELSE allocated * 1000000 // a END AS BIGINT) AS epochs_x1e6,
  (CASE WHEN a = 0 THEN NULL ELSE allocated * 1000000 // a > 4000000 END) AS over_4_epochs
FROM alloc
"""


@query(
    "mixture_epoch_budget",
    # The waterfill chain of mixture_waterfill_allocation with the
    # data-constrained constants: per-source cap = 6 epochs of its
    # unique tokens, global budget = 4x total unique tokens (so the
    # uncapped remainder is provably non-empty and mean epochs = 4).
    oracle=r"""
WITH s AS (
  SELECT source,
    CAST(SUM(len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+'))) AS BIGINT) AS a,
    CAST(GREATEST(1, SUM(CASE WHEN n_chars > 300 THEN 1 ELSE 0 END)) AS BIGINT) AS w
  FROM documents GROUP BY 1
)"""
    + _EPOCH_BUDGET_TAIL_SQL,
)
def mixture_epoch_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-budget readout for DATA-CONSTRAINED mixtures (VERDICT
    r13 #6, the Muennighoff et al. data-constrained-scaling rule of
    thumb): when the training budget EXCEEDS the unique-token supply,
    how many epochs does each source repeat, and which sources cross
    the ~4-epoch line past which repeated tokens stop paying? Same
    exact integer water-filling machinery as
    mixture_waterfill_allocation (cross-multiplied prefix-sum capped
    set, never a float tau) with the data-constrained constants:
    per-source cap = 6 epochs of its unique tokens, global budget = 4x
    total unique tokens — so mean epochs is 4 by construction and the
    spread of quality weights pushes high-weight-per-token sources
    provably over the 4-epoch flag at every SF (the witness-premise
    policy; the companion test pins that both flag values occur).
    Output one row per source: allocation, epochs (x1e6) and the
    over-4-epochs flag.

    Scale shape: identical to the sibling — ONE exchange (per-source
    rollup), then windows over the |sources|-row domain frame."""
    from ibis_flink_example_spark.operators.text import token_count_whitespace

    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.sum(token_count_whitespace("text")).cast("long").alias("a"),
        F.greatest(
            F.lit(1).cast("long"),
            F.sum(F.when(F.col("n_chars") > 300, 1).otherwise(0)).cast("long"),
        ).alias("w"),
    )
    return _epoch_budget_readout(s)


def _epoch_budget_readout(s: DataFrame) -> DataFrame:
    """Engine half of _EPOCH_BUDGET_TAIL_SQL: the data-constrained
    waterfill readout over a per-source ``(source, a, w)`` frame —
    cap = 6 epochs of ``a``, budget = 4x total ``a``, exact integer
    window machinery; a = 0 (a source whose every text is empty) must
    read NULL in BOTH engines — Spark's DIV returns NULL but DuckDB's
    ``//`` raises, so the guard is spelled out on each side (ADVICE
    r14). Shared by the whitespace-token and BPE-token arms."""
    c = s.select("source", "a", "w", (F.col("a") * 6).alias("cap"))
    o = c.select(
        "*",
        F.expr("ROW_NUMBER() OVER (ORDER BY cap * 1000000 DIV w, source)").alias("rn"),
        F.expr(
            "SUM(cap) OVER (ORDER BY cap * 1000000 DIV w, source"
            " ROWS UNBOUNDED PRECEDING)"
        ).alias("c_incl"),
        F.expr(
            "SUM(w) OVER (ORDER BY cap * 1000000 DIV w, source"
            " ROWS UNBOUNDED PRECEDING)"
        ).alias("w_incl"),
        F.expr("CAST(SUM(a) OVER () * 4 AS BIGINT)").alias("b"),
        F.expr("CAST(SUM(w) OVER () AS BIGINT)").alias("sw"),
    )
    o2 = o.select(
        "*",
        (F.col("sw") - F.col("w_incl")).alias("w_rest"),
        (
            F.col("cap") * (F.col("sw") - F.col("w_incl"))
            <= F.col("w") * (F.col("b") - F.col("c_incl"))
        ).alias("cond"),
    )
    o3 = o2.select(
        "*",
        F.expr("COALESCE(MAX(CASE WHEN cond THEN rn END) OVER (), 0)").alias("k"),
    )
    o4 = o3.select(
        "*",
        F.expr(
            "COALESCE(MAX(CASE WHEN rn = k THEN b - c_incl END) OVER (),"
            " MAX(b) OVER ())"
        ).alias("num"),
        F.expr(
            "COALESCE(MAX(CASE WHEN rn = k THEN w_rest END) OVER (),"
            " MAX(sw) OVER ())"
        ).alias("den"),
    )
    alloc = o4.select(
        "source",
        "a",
        "w",
        F.expr(
            "CAST(CASE WHEN rn <= k THEN cap ELSE w * num DIV den END AS BIGINT)"
        ).alias("allocated"),
    )
    return alloc.select(
        "source",
        F.col("a").alias("available_tokens"),
        F.col("w").alias("weight"),
        F.col("allocated").alias("allocated_tokens"),
        F.expr(
            "CAST(CASE WHEN a = 0 THEN NULL"
            " ELSE allocated * 1000000 DIV a END AS BIGINT)"
        ).alias("epochs_x1e6"),
        F.expr(
            "CASE WHEN a = 0 THEN NULL"
            " ELSE allocated * 1000000 DIV a > 4000000 END"
        ).alias("over_4_epochs"),
    )


from ibis_flink_example_spark.operators.bpe import (  # noqa: E402
    fixed_merge_token_count_sql as _bpe_count_sql,
)

_BPE_COUNT_SQL = _bpe_count_sql("text")


@query(
    "sequence_packing_bpe",
    # Same packing recurrence as sequence_packing_bins with the
    # TOKENIZER-TRUE length: the pinned fixed-merge BPE count
    # (operators/bpe.py fixed_merge_token_count / _sql — the
    # seeded-literal idiom, so the oracle replays the exact replace
    # chain instead of going rows-only like the learned-merge arm).
    oracle=rf"""
WITH t AS (
  SELECT doc_id,
    {_BPE_COUNT_SQL} AS n_tokens
  FROM documents
), d AS (
  SELECT doc_id,
    LEAST(n_tokens, {_PACK_CONTEXT}) AS tok_c,
    (n_tokens > {_PACK_CONTEXT}) AS truncated,
    CASE WHEN LEAST(n_tokens, {_PACK_CONTEXT}) <= 64 THEN 64
         WHEN LEAST(n_tokens, {_PACK_CONTEXT}) <= 128 THEN 128
         WHEN LEAST(n_tokens, {_PACK_CONTEXT}) <= 256 THEN 256
         ELSE {_PACK_CONTEXT} END AS len_bucket,
    doc_id % {_PACK_SHARDS} AS shard
  FROM t
), r AS (
  SELECT len_bucket, shard, tok_c, truncated,
    ROW_NUMBER() OVER (
      PARTITION BY len_bucket, shard ORDER BY tok_c DESC, doc_id
    ) AS rn
  FROM d
)
SELECT CAST(len_bucket AS INTEGER) AS len_bucket,
  CAST(shard AS INTEGER) AS shard,
  CAST((rn - 1) // ({_PACK_CONTEXT} // len_bucket) AS BIGINT) AS bin_id,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(tok_c) AS BIGINT) AS bin_tokens,
  CAST(SUM(tok_c) * 1000000 // {_PACK_CONTEXT} AS BIGINT) AS occupancy_x1e6,
  CAST(SUM(CASE WHEN truncated THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated
FROM r
GROUP BY len_bucket, shard, bin_id
""",
)
def sequence_packing_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZER-TRUE sequence bin packing (VERDICT r13 #4):
    sequence_packing_bins packs on whitespace token counts, but the bin
    occupancy a real dataloader sees is measured in TOKENIZER tokens —
    this variant feeds the same no-straddle length-bucketed packing the
    fixed-merge BPE count (operators/bpe.py: the rank-ordered replace
    chain proven equivalent to the symbol-rewriting encoder, with the
    merge table pinned as literals so the DuckDB oracle replays it
    bit-for-bit — the learned-merge arm bpe_token_counts stays rows-only
    by design; any pinned merge table IS a valid tokenizer, which is
    what makes the full oracle reachable here). At the fixture corpus
    the BPE counts run 35-412 against the 512 context, so all four
    length buckets populate and occupancy is non-trivial at every SF.

    Scale shape: identical to the sibling — the replace-chain token
    count fuses into the scan (pure JVM string ops), ONE exchange (the
    (bucket, shard) window), per-bin rollup rides the window
    partitioning."""
    from ibis_flink_example_spark.operators.bpe import fixed_merge_token_count

    docs = load_table(spark, sf_dir, "documents")
    tok = fixed_merge_token_count("text")
    d = docs.select(
        "doc_id",
        F.least(tok, F.lit(_PACK_CONTEXT)).alias("tok_c"),
        (tok > _PACK_CONTEXT).alias("truncated"),
    ).withColumn(
        "len_bucket",
        F.when(F.col("tok_c") <= 64, 64)
        .when(F.col("tok_c") <= 128, 128)
        .when(F.col("tok_c") <= 256, 256)
        .otherwise(_PACK_CONTEXT)
        .cast("int"),
    ).withColumn("shard", (F.col("doc_id") % _PACK_SHARDS).cast("int"))
    from pyspark.sql import Window

    w = Window.partitionBy("len_bucket", "shard").orderBy(
        F.col("tok_c").desc(), F.col("doc_id")
    )
    r = d.withColumn("rn", F.row_number().over(w)).withColumn(
        "bin_id",
        F.expr(
            f"CAST((rn - 1) DIV ({_PACK_CONTEXT} DIV len_bucket) AS BIGINT)"
        ),
    )
    return r.groupBy("len_bucket", "shard", "bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("tok_c").cast("long").alias("bin_tokens"),
        F.expr(f"CAST(SUM(tok_c) * 1000000 DIV {_PACK_CONTEXT} AS BIGINT)")
        .alias("occupancy_x1e6"),
        F.sum(F.when(F.col("truncated"), 1).otherwise(0))
        .cast("long")
        .alias("n_truncated"),
    )


@query(
    "mixture_epoch_budget_bpe",
    # mixture_epoch_budget with the TOKENIZER-TRUE supply basis (VERDICT
    # r14 #6): per-source available tokens are the pinned fixed-merge
    # BPE counts sequence_packing_bpe packs with, not whitespace words —
    # so the epoch/budget readout is measured in the same tokens the
    # dataloader consumes. Same shared waterfill tail; only the s CTE
    # changes.
    oracle=rf"""
WITH s AS (
  SELECT source,
    CAST(SUM({_BPE_COUNT_SQL}) AS BIGINT) AS a,
    CAST(GREATEST(1, SUM(CASE WHEN n_chars > 300 THEN 1 ELSE 0 END)) AS BIGINT) AS w
  FROM documents GROUP BY 1
)"""
    + _EPOCH_BUDGET_TAIL_SQL,
)
def mixture_epoch_budget_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-constrained epoch readout in TOKENIZER tokens (VERDICT
    r14 top-next #6): mixture_epoch_budget computes supply `a` from
    whitespace word counts, but the budget a training run actually
    spends is measured in the tokens the dataloader packs —
    sequence_packing_bpe's pinned fixed-merge BPE count
    (operators/bpe.py). Tokenizer fertility (tokens per word) varies by
    source/language, so the two bases provably diverge per source at
    every SF (companion witness test) and sources shift between
    over-4-epochs categories depending on the basis. One changed input
    column; the waterfill machinery, its scale shape (ONE per-source
    exchange + |sources|-row window frame) and the shared SQL tail are
    identical to the whitespace arm. The replace-chain token count
    fuses into the scan exactly as in sequence_packing_bpe."""
    from ibis_flink_example_spark.operators.bpe import fixed_merge_token_count

    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.sum(fixed_merge_token_count("text")).cast("long").alias("a"),
        F.greatest(
            F.lit(1).cast("long"),
            F.sum(F.when(F.col("n_chars") > 300, 1).otherwise(0)).cast("long"),
        ).alias("w"),
    )
    return _epoch_budget_readout(s)

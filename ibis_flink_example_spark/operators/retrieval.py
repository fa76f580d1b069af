"""Sparse retrieval and hashed-feature operators for the LLM data pipeline.

The reference (claypotai/ibis-flink-example) has no retrieval surface; these
extend the north-star pipeline as the SPARSE complement of the dense vector
family in operators/similarity.py (cosine top-k / LSH / IVF): BM25 keyword
scoring, the feature-hashing trick, and DSIR-style importance weighting —
the three classic term-statistics passes a 100 TB curation stack runs next
to its embedding passes.

Exactness design (driver value-hashes results, so every cross-engine float
hazard is removed up front):

- All idf / log-likelihood quantities are WHOLE-BIT integers:
  ``floor(log2(...))`` of an integer or of a single correctly-rounded
  division of two integers. The doc_unigram_surprisal gap argument
  (queries_llm.py) applies verbatim: for integers p, q < 2^40 the true
  log2(p/q) is either exactly an integer (both engines compute it exactly:
  the division is one correctly-rounded op and log2 of an exact power of
  two is exact) or at least ~2^-41 away from one — orders beyond the <=
  2-ulp evaluation error — so the floor can never disagree between Spark
  and DuckDB.
- BM25's tf saturation term is evaluated as ONE integer floor-division of
  exact DECIMAL(38,0)/HUGEINT products (both engines truncate identically
  on positive operands), scaled by 1e6 — no float ever crosses rows.
- Per-document scores are integer SUMs — order-independent under any
  partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ibis_flink_example_spark.operators.checkpoints import (
    attach_eager_checkpoints,
    release_eager_checkpoints,
)
from ibis_flink_example_spark.operators.text import doc_terms, term_frequencies

# release_eager_checkpoints / attach_eager_checkpoints are re-exported
# from operators/checkpoints.py (the centralized handle-bookkeeping
# module) for existing callers.

# BM25 parameters as exact rationals: k1 = K1_NUM/K1_DEN = 1.2,
# b = B_NUM/B_DEN = 0.75 (the textbook defaults). Clearing denominators in
#   score_t = (k1+1)*tf / (tf + k1*(1-b) + k1*b*dl*N/T)
# by kd*bd*T gives integer coefficients:
#   NUM = (kn+kd)*bd * T * tf                     = 44 * T * tf
#   DEN = kd*bd * T * tf + kn*(bd-bn) * T + kn*bn * dl * N
#       = 20*T*tf + 6*T + 18*dl*N
_BM25_NUM_C = 44
_BM25_DEN_TF = 20
_BM25_DEN_T = 6
_BM25_DEN_DL = 18


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 25,
    max_broadcast_probe_rows: int = 2_000_000,
) -> DataFrame:
    """Whole-bit BM25 top-k document retrieval for a fixed keyword query.

    Standard BM25 (k1=1.2, b=0.75) with the idf quantized to whole bits:
    ``idf_bits = greatest(1, floor(log2(2*(N+1)/(2*df+1))))`` — the
    integer part of the classic ``log((N-df+0.5)/(df+0.5)+1)`` idf
    rebased to log2, clamped below at 1 the way Lucene clamps
    small/negative idf: a term matching most of the corpus still ranks by
    tf saturation instead of zeroing out (whole-bit floors send any
    df > ~N/2 to 0, which would degenerate exactly the common-word
    queries users type). The tf saturation ratio is exact-rational (see
    module constants), scaled to x1e6 fixed point by one integer
    floor-division per (doc, term).

    Scale shape: the query-term filter lands directly on the exploded
    token stream IN the scan stage (no shuffle carries non-query terms),
    so the expensive branch — tf over matching docs — shuffles only
    matches. Document length (dl) is one doc-keyed aggregation over the
    same scan; corpus totals ride a one-row broadcast. The corpus-sized
    dl table is SEMI-JOIN-REDUCED to matched doc ids BEFORE the tf⋈dl
    join, so non-matching docs never cross that exchange; the matched-id
    probe is a MEASURED-cardinality guarded broadcast (the
    decontaminate_ngram_overlap idiom — a query of only stop-word-common
    terms can match most of a 100 TB corpus, so above
    ``max_broadcast_probe_rows`` the probe falls back to a shuffle
    semi-join instead of OOMing every executor). The guarded quantity is
    the ROW count of the materialized (doc, term) frame — the actual
    payload of the larger forced broadcast (matched_docs x query_terms;
    bounding distinct ids alone would let a many-term query slip a
    terms-times-bigger frame past the cap). tf is tiny after the
    term filter and is localCheckpoint-materialized once: the matched-id
    derivation, the per-term df, and the final join all reuse the
    materialization instead of re-running the text scan (checkpointed
    frames carry no stats, hence the explicit broadcast hints). The
    checkpoint handle is attached to the returned DataFrame as
    ``_eager_checkpoints`` — callers that loop in one long session
    should call ``release_eager_checkpoints(df)`` after consuming the
    result to keep block-manager storage flat (single-shot callers can
    leave it to the ContextCleaner). Final
    ranking is TakeOrderedAndProject (top_k per partition, then merged)
    — never a global sort. Two passes over the text (dl needs all
    tokens, tf only query terms); a production corpus would persist
    dl/df as term-stat tables, which is exactly the artifact split this
    plan produces.

    Returns (id_col, score_x1e6, n_terms_matched), score-descending,
    id-ascending, LIMIT top_k.
    """
    terms = list(query_terms)
    toks = doc_terms(docs, id_col=id_col, text_col=text_col)
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).cast("long").alias("dl"))
    scal = (
        dl.agg(F.sum("dl").cast("long").alias("t_tokens"))
        .crossJoin(
            F.broadcast(docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs")))
        )
    )
    tq = toks.filter(F.col("term").isin(terms))
    # Materialize the (matched-doc x query-term) frame once — the
    # cardinality guard, the matched-id probe, the df aggregation and
    # the scoring join below otherwise EACH re-run scan+explode+filter.
    # Handle attached to the result; see release_eager_checkpoints.
    tf = (
        tq.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint(eager=True)
    )
    # the count is free (tf is materialized) and bounds BOTH forced
    # broadcasts below: matched ids (<= tf rows) and the tfj frame
    # (== tf rows, the larger payload)
    n_probe_rows = tf.count()
    small = n_probe_rows <= max_broadcast_probe_rows
    matched = tf.select(id_col).distinct()
    probe = F.broadcast(matched) if small else matched.hint("merge")
    dl_m = dl.join(probe, id_col, "left_semi")
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    tfj = tf.join(F.broadcast(dfq), "term")
    j = (
        (F.broadcast(tfj) if small else tfj.hint("merge"))
        .join(dl_m, id_col)
        .crossJoin(F.broadcast(scal))
    )
    idf_bits = F.greatest(
        F.lit(1).cast("long"),
        F.floor(
            F.log2(
                (F.lit(2) * (F.col("n_docs") + F.lit(1))).cast("double")
                / (F.lit(2) * F.col("df") + F.lit(1)).cast("double")
            )
        ).cast("long"),
    )
    j = j.withColumn("idf_bits", idf_bits)
    num = (
        "CAST(idf_bits AS DECIMAL(38,0)) * 1000000 * "
        f"{_BM25_NUM_C} * CAST(t_tokens AS DECIMAL(38,0)) * tf"
    )
    den = (
        f"{_BM25_DEN_TF} * CAST(t_tokens AS DECIMAL(38,0)) * tf"
        f" + {_BM25_DEN_T} * CAST(t_tokens AS DECIMAL(38,0))"
        f" + {_BM25_DEN_DL} * CAST(dl AS DECIMAL(38,0)) * n_docs"
    )
    scored = j.withColumn("term_score_x1e6", F.expr(f"({num}) DIV ({den})"))
    out = (
        scored.groupBy(id_col)
        .agg(
            F.sum("term_score_x1e6").cast("long").alias("score_x1e6"),
            F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
        )
        .orderBy(F.desc("score_x1e6"), F.col(id_col).asc())
        .limit(top_k)
    )
    return attach_eager_checkpoints(out, handles=(tf,))


def feature_hash_profile(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """Hashing-trick collision profile: every vocabulary term is mapped to
    one of ``n_buckets`` feature slots by md5 (engine-portable: the bucket
    is decoded from hex NIBBLES via ``instr('0123456789abcdef', ...)``,
    identical in Spark and DuckDB), and the per-bucket load is reported —
    the QA table that sizes a hashed feature space before training.

    n_buckets must be a power of 4 <= 256 (whole hex nibbles). Plan:
    occurrence stream collapses to the vocabulary map-side (one term-keyed
    shuffle bounded by |vocab|), bucket assignment is a scan-stage
    expression on the vocab frame, and the final rollup shuffles <=
    |vocab| rows to <= n_buckets groups. Text is scanned once; nothing
    doc-keyed ever shuffles.

    Returns (bucket, n_terms, n_occurrences).
    """
    if n_buckets not in (4, 16, 64, 256):
        raise ValueError("n_buckets must be one of 4, 16, 64, 256")
    # 64 = 16 * 4: high nibble full, low nibble mod 4 (still uniform).
    toks = doc_terms(docs, id_col=id_col, text_col=text_col)
    vocab = toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("occ")
    )
    nib1 = "(instr('0123456789abcdef', substr(md5(term), 1, 1)) - 1)"
    nib2 = "(instr('0123456789abcdef', substr(md5(term), 2, 1)) - 1)"
    if n_buckets == 4:
        bucket = f"{nib1} % 4"
    elif n_buckets == 16:
        bucket = nib1
    elif n_buckets == 64:
        bucket = f"{nib1} * 4 + {nib2} % 4"
    else:
        bucket = f"{nib1} * 16 + {nib2}"
    vb = vocab.withColumn("bucket", F.expr(bucket).cast("long"))
    return vb.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("occ").cast("long").alias("n_occurrences"),
    )


def dsir_weight_bits(
    docs: DataFrame,
    *,
    target_source: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """DSIR-style importance weights in whole bits: per document, the
    log-likelihood ratio of its unigrams under the TARGET domain's
    add-one-smoothed unigram LM vs the RAW corpus LM —
    ``sum_t c_t * (bits_raw(t) - bits_tgt(t))`` where
    ``bits_X(t) = floor(log2(T_X + V)) - floor(log2(cnt_X(t) + 1))`` is
    the whole-bit smoothed surprisal in corpus X. Documents that look
    like the target domain score high; the classic importance-resampling
    signal for domain-targeted data selection, quantized so every
    cross-row aggregate is an integer sum.

    Scale shape: term stats are two term-keyed aggregations bounded by
    |vocab|; the (term -> bits) table joins the per-doc term counts on
    the term key (term-stat bytes ride the exchange, text never
    reshuffles); corpus totals are a one-row broadcast. Smoothing keeps
    target-absent terms finite (cnt_t = 0 -> bits from log2(1) = 0).

    Returns (id_col, source, n_tokens, weight_bits) — one row per
    document with >= 1 retained token.
    """
    tf_all = term_frequencies(docs, id_col=id_col, text_col=text_col)
    tf_src = tf_all.join(docs.select(id_col, source_col), id_col)
    cnt_r = tf_all.groupBy("term").agg(
        F.sum("tf").cast("long").alias("cnt_r")
    )
    cnt_t = (
        tf_src.filter(F.col(source_col) == target_source)
        .groupBy("term")
        .agg(F.sum("tf").cast("long").alias("cnt_t"))
    )
    stats = cnt_r.join(cnt_t, "term", "left").fillna({"cnt_t": 0})
    scal = stats.agg(
        F.sum("cnt_r").cast("long").alias("t_raw"),
        F.sum("cnt_t").cast("long").alias("t_tgt"),
        F.count(F.lit(1)).cast("long").alias("v_terms"),
    )

    def _bits(total_col: str, cnt_col: str):
        return (
            F.floor(
                F.log2((F.col(total_col) + F.col("v_terms")).cast("double"))
            ).cast("long")
            - F.floor(F.log2((F.col(cnt_col) + 1).cast("double"))).cast("long")
        )

    bits = stats.crossJoin(F.broadcast(scal)).select(
        "term",
        _bits("t_raw", "cnt_r").alias("bits_raw"),
        _bits("t_tgt", "cnt_t").alias("bits_tgt"),
    )
    return (
        tf_src.join(bits, "term")
        .groupBy(id_col, source_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(
                F.col("tf") * (F.col("bits_raw") - F.col("bits_tgt"))
            )
            .cast("long")
            .alias("weight_bits"),
        )
    )


def rrf_fuse(
    rankings: Sequence[DataFrame],
    *,
    id_col: str,
    rank_col: str = "rank",
    k0: int = 60,
    scale: int = 1_000_000,
    top_k: int = 25,
) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval systems — the standard
    score-free way to combine sparse (BM25) and dense (embedding) result
    lists: each system contributes ``scale // (k0 + rank)`` for every item
    it ranked, and items are ordered by the summed contribution
    (Cormack et al.'s RRF with the classic k0=60). Rank-based fusion
    side-steps the score-normalization problem entirely, which is also
    what makes it EXACT here: one integer floor division per (system,
    item), integer sums across systems — no cross-engine float hazard.

    Each input must carry (id_col, rank_col) with 1-based ranks; items
    missing from a system simply contribute nothing (the RRF convention).

    Scale shape: candidate lists are top-k artifacts (thousands of rows at
    most, regardless of corpus size — the upstream retrievers own the
    corpus-sized work), so fusion is a union + one tiny aggregation; the
    final cut is TakeOrderedAndProject. Returns
    (id_col, rrf_x1e6, n_systems), fused-score-descending, id-ascending,
    LIMIT top_k.
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    contribs = [
        r.select(
            F.col(id_col),
            F.expr(
                f"CAST({scale} AS BIGINT) DIV (CAST({k0} AS BIGINT) + {rank_col})"
            ).alias("__c"),
        )
        for r in rankings
    ]
    u = contribs[0]
    for c in contribs[1:]:
        u = u.unionByName(c)
    out = (
        u.groupBy(id_col)
        .agg(
            F.sum("__c").cast("long").alias("rrf_x1e6"),
            F.count(F.lit(1)).cast("long").alias("n_systems"),
        )
        .orderBy(F.desc("rrf_x1e6"), F.col(id_col).asc())
        .limit(top_k)
    )
    # Checkpoint handles attached to input rankings (bm25_topk's tf) must
    # survive the fusion, or loop callers can never release them.
    return attach_eager_checkpoints(out, *rankings)


def posting_lists(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_terms: int = 20,
    postings_per_term: int = 10,
) -> DataFrame:
    """Capped inverted-index build — the artifact BM25 serving reads: for
    the ``top_terms`` most frequent terms, the ``postings_per_term``
    highest-tf postings serialized as a deterministic ``doc:tf,...``
    string (impact-ordered posting prefix, the static index-pruning
    layout; at serving time the tf-descending prefix is what early-
    termination scoring consumes).

    Scale shape: term selection is TakeOrderedAndProject over the
    |vocab|-bounded term-stat rollup (never a global sort); the selected
    terms BROADCAST back onto the (doc, term, tf) frame, so the corpus-
    sized posting stream is filtered in its own scan stage; the per-term
    cut is a rank window that plans as WindowGroupLimit (per-partition
    top-k retention BEFORE the full window materializes); serialization
    sorts only the <= postings_per_term survivors in-row. Deterministic
    order (tf desc, id asc) makes the whole artifact value-hashable.

    Returns (term, occurrences, doc_freq, postings_csv).
    """
    from pyspark.sql.window import Window

    from ibis_flink_example_spark.operators.text import term_heavy_hitters

    tf = term_frequencies(docs, id_col=id_col, text_col=text_col)
    # ONE definition of "top-k corpus terms" (review r9): reuse
    # term_heavy_hitters rather than re-derive it — its internal tf
    # subtree is built by the same term_frequencies call as ours, so the
    # (doc, term) aggregate exchange resolves to a runtime ReusedExchange
    # (pinned in tests/test_plan_audits.py) instead of a second
    # tokenize+shuffle pass.
    stats = term_heavy_hitters(
        docs, id_col=id_col, text_col=text_col, k=top_terms
    ).select(
        "term",
        F.col("total_tf").cast("long").alias("occurrences"),
        F.col("df_term").cast("long").alias("doc_freq"),
    )
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.col(id_col).asc())
    ranked = (
        tf.join(F.broadcast(stats), "term")
        .withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= postings_per_term)
    )
    entry = F.struct(
        (-F.col("tf")).cast("long").alias("a"),
        F.col(id_col).alias("d"),
        F.col("tf").cast("long").alias("t"),
    )
    return (
        ranked.groupBy("term", "occurrences", "doc_freq")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(entry)),
                    lambda x: F.concat_ws(":", x["d"], x["t"]),
                ),
                ",",
            ).alias("postings_csv")
        )
    )


def sparse_cosine_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_share_den: int = 20,
    min_df: int = 2,
    cos2_threshold_x1e12: int = 250_000_000_000,
    max_broadcast_vocab_terms: int = 2_000_000,
) -> DataFrame:
    """Sparse tf-idf cosine near-dup pairs with rare-term candidate
    generation — the prefix-filtering similarity join (PPJoin-family):
    two documents become a CANDIDATE pair only if they share at least one
    discriminative term (document frequency df in [min_df, N/df_share_den]),
    then the exact weighted cosine is computed over ALL shared terms and
    thresholded. The weighted sparse complement of MinHash (set overlap)
    and dense embedding pairs (semantic): catches near-dups whose
    evidence is a handful of rare tokens.

    Exactness: weights are integers w = tf * idf_bits (the whole-bit idf
    of operators/retrieval.py bm25 — floor-stable across engines), norms
    and dots are integer sums, and the threshold test is the SQUARED
    integer inequality dot²·1e12 >= thr·‖a‖²·‖b‖² — no sqrt, no float.
    Reported ``cos2_x1e12`` = dot²·1e12 // (‖a‖²‖b‖²) (DECIMAL(38,0)
    products; exact for ‖·‖² up to ~1e13 — repartition weights first at
    corpora beyond that).

    Scale shape: candidate generation is an equi self-join on the RARE
    posting lists only — the df ceiling (df <= N/df_share_den) is the
    hot-key cap: no stop-word posting list ever self-joins, so pair count
    is Σ_rare df² with every df bounded. The dot-join restricts the
    doc-term table to candidate members (semi-join reduction) before
    joining on term. The per-term document-frequency table is corpus
    VOCABULARY-sized (unbounded at 100 TB — multi-GB driver OOM if
    broadcast blindly), so its join is a MEASURED-cardinality guarded
    broadcast: above ``max_broadcast_vocab_terms`` distinct terms it
    falls back to a shuffle join on ``term`` — the same key the tf table
    is already about to shuffle on. Returns
    (id_a, id_b, n_shared_terms, cos2_x1e12), id_a < id_b.
    """
    from ibis_flink_example_spark.operators.text import doc_terms

    tf = (
        doc_terms(docs, id_col=id_col, text_col=text_col)
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    # materialize the vocab table ONCE: the cardinality guard's count()
    # and the weight join below otherwise each re-run the corpus-wide
    # doc_terms explode + groupBy (the heaviest scan stage, twice per
    # execution) — the contamination_hits/decontaminate idiom
    dfq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .localCheckpoint(eager=True)
    )
    n_vocab = dfq.count()
    dfq_side = (
        F.broadcast(dfq) if n_vocab <= max_broadcast_vocab_terms else dfq
    )
    w = (
        tf.join(dfq_side, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "df",
            "n_docs",
            (
                F.col("tf")
                * F.greatest(
                    F.lit(1).cast("long"),
                    F.floor(
                        F.log2(
                            (F.lit(2) * (F.col("n_docs") + 1)).cast("double")
                            / (F.lit(2) * F.col("df") + 1).cast("double")
                        )
                    ).cast("long"),
                )
            ).alias("w"),
        )
    )
    norms = w.groupBy(id_col).agg(F.sum(F.expr("w * w")).cast("long").alias("n2"))
    rare = w.filter(
        (F.col("df") >= min_df) & (F.col("df") * df_share_den <= F.col("n_docs"))
    ).select(id_col, "term")
    ra = rare.select(F.col(id_col).alias("id_a"), "term")
    rb = rare.select(F.col(id_col).alias("id_b"), "term")
    cand = (
        ra.join(rb, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    wa = w.select(F.col(id_col).alias("id_a"), "term", F.col("w").alias("wa")).join(
        cand.select("id_a").distinct(), "id_a", "left_semi"
    )
    wb = w.select(F.col(id_col).alias("id_b"), "term", F.col("w").alias("wb")).join(
        cand.select("id_b").distinct(), "id_b", "left_semi"
    )
    dots = (
        wa.join(wb, "term")
        .join(cand, ["id_a", "id_b"], "left_semi")
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(F.expr("wa * wb")).cast("long").alias("dot"),
            F.count(F.lit(1)).cast("long").alias("n_shared_terms"),
        )
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("n2").alias("nb2"))
    scored = dots.join(na, "id_a").join(nb, "id_b")
    return (
        scored.filter(
            F.expr(
                "CAST(dot AS DECIMAL(38,0)) * dot * 1000000000000 >= "
                f"CAST({cos2_threshold_x1e12} AS DECIMAL(38,0)) * na2 * nb2"
            )
        )
        .select(
            "id_a",
            "id_b",
            "n_shared_terms",
            F.expr(
                "CAST(CAST(dot AS DECIMAL(38,0)) * dot * 1000000000000 "
                "DIV (CAST(na2 AS DECIMAL(38,0)) * nb2) AS BIGINT)"
            ).alias("cos2_x1e12"),
        )
    )

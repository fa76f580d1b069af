"""Similarity search over embedding columns (SURVEY.md §2.11 X3):
brute-force cosine top-k (exact baseline) and random-hyperplane LSH
(the scale path), plus embedding near-dup pairs.

Scale design:
- Dot products are JVM-side; with the vector width known (``dim``) they are
  unrolled into plain expressions that run inside whole-stage codegen (the
  ``zip_with``+``aggregate`` fold is the interpreted fallback for unknown
  widths). Queries are broadcast so the corpus scan is embarrassingly
  parallel and never shuffles.
- Brute force is O(corpus x queries) — right up to ~10⁴ queries; beyond
  that, ``lsh_topk`` buckets by hyperplane signature so each query probes
  only its bucket(s). Signatures are deterministic (seeded hyperplanes
  generated driver-side once and shipped as literals).
- Exact top-k per query = window row_number over (sim desc, id) — ties
  broken on id for determinism.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ibis_flink_example_spark.operators.checkpoints import (
    attach_eager_checkpoints,
)


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Σ aᵢ·bᵢ in double, summed left-to-right (deterministic order).

    With ``dim`` given the sum is UNROLLED into element_at products — plain
    expressions that stay inside whole-stage codegen, versus the
    ``zip_with``+``aggregate`` fold which drops to interpreted lambda
    evaluation (the fallback when the width isn't statically known). Both
    forms are bit-identical: IEEE 0.0+x == x, so the fold's explicit zero
    seed changes nothing, and both associate strictly left-to-right.

    Measured trade (sf0.1, 64-dim, ~200k pairs): the unrolled form adds
    ~9 s of DRIVER-side cost per query (Catalyst fixed-point rules +
    Janino over ~770-node trees) while the fold's interpreted runtime
    penalty is <2 s — so the default wrappers use the fold, and ``dim``
    is the opt-in for long-running jobs where a constant plan cost
    amortizes over a 100 TB scan."""
    if dim is not None:
        terms = [
            F.element_at(a, i + 1).cast("double") * F.element_at(b, i + 1).cast("double")
            for i in range(dim)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _lit_doubles(v: list[float]) -> Column:
    """array<double> literal via ONE parsed SQL expression. Building it as
    ``F.array(*[F.lit(x) ...])`` costs a py4j round trip per element —
    ~2 s of pure driver time for 16x64 centroid literals; one expr string
    is a single round trip and ``repr`` round-trips doubles exactly."""
    return F.expr("array(" + ",".join(f"{x!r}D" for x in v) + ")")


def _lit_vectors(vs: list[list[float]]) -> Column:
    """array<array<double>> literal via ONE parsed SQL expression."""
    inner = ",".join("array(" + ",".join(f"{x!r}D" for x in v) + ")" for v in vs)
    return F.expr(f"array({inner})")


def dot_lit(a: Column, v: list[float]) -> Column:
    """Σ aᵢ·vᵢ against a driver-side literal vector — the compact fold
    against a literal array (one array node + one lambda, not an unrolled
    element_at chain: n_planes/n_lists of those blew driver planning time
    and codegen heap — see ``dot``)."""
    return dot(a, _lit_doubles(v))


def l2_norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (l2_norm(a, dim) * l2_norm(b, dim))


def normalize(a: Column) -> Column:
    """Unit-normalize a vector column (fold-based; per-row use only).

    NOT used on the pairwise hot paths: an unrolled variant that embeds the
    norm subtree in each of ``dim`` array slots explodes the expression tree
    ~dim× (codegen OOM at dim=64 in practice). The join operators below
    instead carry the norm as a SCALAR column (``l2_norm(vec, dim)`` — one
    flat tree, one value per row) and divide at pair time:
    cosine = dot(a,b)/(n_a·n_b). The captured norm is lambda-BOUND
    (bind_col, r15) so interpreted HOF evaluation computes it once per
    row, not once per element."""
    from ibis_flink_example_spark.operators.text import bind_col

    return bind_col(
        l2_norm(a), lambda n: F.transform(a, lambda x: x.cast("double") / n)
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    k: int = 5,
    exclude_self: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """Exact brute-force top-k: broadcast the (small) query set against the
    corpus scan; one window per query for the top-k cut.

    Output: (query_id, id_col, cosine, rank), rank 1..k.
    """
    from ibis_flink_example_spark.catalog import fan_out

    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
        )
    )
    scored = fan_out(corpus.select(id_col, vec_col), min_partitions=8).crossJoin(q).select(
        F.col("__qid").alias("query_id"),
        F.col(id_col),
        cosine(F.col(vec_col), F.col("__qvec"), dim).alias("cosine"),
    )
    if exclude_self:
        scored = scored.filter(F.col(id_col) != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit hyperplanes (driver-side, shipped as literals —
    a few KB even for hundreds of planes)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign bits of projections onto the planes, packed into a long."""
    bits = [
        F.when(
            dot_lit(vec, p) >= 0,
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def multitable_signature_structs(
    vec: Column, tables: list[list[list[float]]]
) -> Column:
    """array<struct<t:int, b:bigint>> of per-table hyperplane signatures —
    bit-identical to ``[struct(t, hyperplane_signature(vec, tables[t]))]``
    but built as ONE nested-lambda fold over a single plane-matrix
    literal instead of L x p independent ``dot_lit`` fold trees.

    Motivation is DRIVER cost, not executor cost (r15, guide §1.3): the
    unrolled form's plan carries ~L·p separate 64-literal arrays + fold
    lambdas that Catalyst re-analyzes and re-optimizes on every plan
    build — ~0.45 s per build at L=p=6, dim=64, paid once per micro-batch
    by the streaming ingests and once per query by the LSH batch family.
    This form plans in ~0.28 s and runs marginally faster (one codegen'd
    projection either way; the folds are interpreted in both). Verified
    bit-equal on the sf0.1 corpus (exceptAll both ways = 0).

    Bit packing: plane i of table t is row t*p+i of the matrix; the fold
    runs planes MSB-first so ``acc*2 + bit`` reproduces the OR-of-
    ``shiftleft(1, i)`` packing exactly. The sign bit is
    ``dot(vec, plane) >= 0`` with the same per-element double casts and
    left-to-right summation as ``dot_lit`` — IEEE-identical."""
    n_tables = len(tables)
    n_planes = len(tables[0])
    # Ragged input would silently read a NEIGHBORING table's plane rows
    # from the flattened matrix (element_at does not error on most ragged
    # shapes) — the unrolled form this replaced handled ragged tables
    # correctly, so guard the flattening assumption (ADVICE r15).
    if any(len(planes) != n_planes for planes in tables):
        raise ValueError(
            "multitable_signature_structs requires every table to have "
            f"the same plane count; got {[len(p) for p in tables]}"
        )
    mat = _lit_vectors([p for planes in tables for p in planes])

    def one_table(t: Column) -> Column:
        def acc_fn(acc: Column, i: Column) -> Column:
            p = F.element_at(mat, t * n_planes + i + 1)
            d = F.aggregate(
                F.zip_with(
                    vec, p, lambda x, y: x.cast("double") * y.cast("double")
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            return acc * F.lit(2).cast("long") + (
                F.when(d >= 0, F.lit(1).cast("long"))
                .otherwise(F.lit(0).cast("long"))
            )

        return F.aggregate(
            F.sequence(F.lit(n_planes - 1), F.lit(0), F.lit(-1)),
            F.lit(0).cast("long"),
            acc_fn,
        )

    return F.transform(
        F.sequence(F.lit(0), F.lit(n_tables - 1)),
        lambda t: F.struct(
            t.cast("int").alias("t"), one_table(t).alias("b")
        ),
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    exclude_self: bool = True,
    unroll: bool = False,
    probe_hamming: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows sharing the query's
    hyperplane signature bucket; exact cosine + top-k within the bucket.

    Recall/cost dials:
    - more planes → smaller buckets → cheaper, lower recall (2^n_planes
      expected buckets);
    - ``probe_hamming=1`` multi-probes every bucket within Hamming
      distance 1 of the query's signature (1 + n_planes probes/query) —
      the standard recall boost that needs no re-index. Query-side only:
      each corpus row still lives in exactly its own bucket, so probes
      never duplicate a (query, doc) candidate pair, and the probe
      explosion rides the broadcast (corpus scan unchanged).
    """
    if probe_hamming not in (0, 1):
        raise ValueError("probe_hamming must be 0 or 1")
    from ibis_flink_example_spark.catalog import fan_out

    planes = random_hyperplanes(dim, n_planes, seed)
    c = fan_out(corpus.select(id_col, vec_col), min_partitions=8).select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_signature(F.col(vec_col), planes).alias("__bucket"),
    )
    # Signature computed ONCE into a column; probes reference the attribute
    # (9 copies of the signature subtree in one projection would re-inflate
    # driver planning cost — see dot's docstring).
    q0 = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        hyperplane_signature(F.col(vec_col), planes).alias("__qsig"),
    )
    if probe_hamming == 1:
        probe = F.explode(
            F.array(
                F.col("__qsig"),
                *[
                    F.col("__qsig").bitwiseXOR(F.lit(1 << i).cast("long"))
                    for i in range(n_planes)
                ],
            )
        )
    else:
        probe = F.col("__qsig")
    q = F.broadcast(
        q0.select("query_id", "__qvec", probe.alias("__qbucket"))
    )
    scored = c.join(q, F.col("__bucket") == F.col("__qbucket")).select(
        "query_id",
        id_col,
        cosine(F.col(vec_col), F.col("__qvec"), dim if unroll else None).alias(
            "cosine"
        ),
    )
    if exclude_self:
        scored = scored.filter(F.col(id_col) != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_neardup_pairs(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    block_col: str | None = None,
    threshold: float = 0.95,
    dim: int | None = None,
    max_rows_per_block: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine >= threshold).

    ``block_col`` bounds the pair space (same-label / same-shard blocking);
    at scale substitute the LSH bucket as the block. Join is equi on the
    block key with the id inequality as residual — a hash join, not a
    cartesian product.

    ``max_rows_per_block`` is the population cap every LSH band bucket
    already gets (``dedup.drop_hot_keys``): a block whose population
    exceeds it contributes NO pairs — without it, one degenerate block
    (a k-means cluster that swallowed the boilerplate mode of the
    corpus, a label shared by half the rows) is O(|block|^2) pairs and
    the 100x scale-up dies in that one key (VERDICT r14 #2). Capped
    rows simply survive dedup — the standard LSH-cap semantics (an
    over-populated block carries no discriminative signal). The
    returned frame carries the cap's checkpoint handle
    (``checkpoints.release_eager_checkpoints`` after consumption).

    The per-row L2 norm travels through the join as a scalar column
    (8 bytes/row) computed once before the join; pair-time cosine is then a
    single unrolled dot + one divide — flat codegen-friendly expressions,
    no normalized-array materialization.
    """
    from ibis_flink_example_spark.catalog import fan_out

    cols = [
        F.col(id_col),
        F.col(vec_col).alias("__vec"),
        l2_norm(F.col(vec_col), dim).alias("__n"),
    ] + ([F.col(block_col)] if block_col else [])
    base = fan_out(df.select(id_col, vec_col, *([block_col] if block_col else []))).select(
        *cols
    )
    if block_col and max_rows_per_block is not None:
        from ibis_flink_example_spark.operators.dedup import drop_hot_keys

        base = drop_hot_keys(
            base,
            [block_col],
            max_rows_per_key=max_rows_per_block,
            what="embedding pair block",
            lazy=True,  # AQE-guarded anti-join; zero driver actions (r15)
        )
    a, b = base.alias("a"), base.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = (F.col(f"a.{block_col}") == F.col(f"b.{block_col}")) & cond
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            (
                dot(F.col("a.__vec"), F.col("b.__vec"), dim)
                / (F.col("a.__n") * F.col("b.__n"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantization scale path
# ---------------------------------------------------------------------------


def kmeans_centroids(
    corpus: DataFrame,
    *,
    vec_col: str,
    n_lists: int,
    seed: int = 42,
    max_iter: int = 10,
    fit_fraction: float | None = None,
    max_train: int = 200_000,
) -> list[list[float]]:
    """Coarse-quantizer centroids: Lloyd's k-means in numpy on a bounded,
    seeded sample of the corpus.

    Why driver-side: centroid quality saturates on a modest sample (the
    IVF-Flat standard is to TRAIN on ~100x n_lists vectors and ASSIGN the
    full corpus), and a k x dim x ~1e5 training problem is milliseconds in
    numpy versus multiple cluster-wide job rounds per Lloyd iteration in
    Spark ML. This is index BUILD on a size-capped sample (max_train rows
    collected — ~50 MB at 1e5 x 64 doubles), not a data-plane collect; the
    corpus-sized work (assignment, probing) stays distributed. Deterministic:
    seeded sample, collected rows sorted bytewise before seeded init, fixed
    iteration count, ties to the lowest centroid index.

    Sampling is ALWAYS a seeded uniform sample over the whole corpus: a bare
    ``limit(max_train)`` would take whatever partitions report first, which
    at 100 TB trains the quantizer on one shard of key space. When
    ``fit_fraction`` is not given, it is derived from one distributed
    count() so the sample lands near ``max_train`` rows; the trailing
    ``limit`` only enforces the hard memory bound."""
    import numpy as np

    train_df = corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
    if fit_fraction is None:
        n = train_df.count()
        # 1.2x oversample: Bernoulli sampling undershoots ~sqrt(n) of the
        # time; the limit() below trims the overshoot deterministically.
        fit_fraction = min(1.0, (max_train * 1.2) / max(n, 1))
    if fit_fraction < 1.0:
        train_df = train_df.sample(fraction=fit_fraction, seed=seed)
    rows = train_df.limit(max_train).collect()
    X = np.asarray([r["v"] for r in rows], dtype=np.float64)
    X = X[np.lexsort(X.T[::-1])]  # order-independence of the collect
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=n_lists, replace=False)]
    for _ in range(max_iter):
        # argmin over ||x||^2 - 2x.c + ||c||^2 (row term constant -> dropped)
        d = -2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
        assign = np.argmin(d, axis=1)
        newC = C.copy()
        for j in range(n_lists):
            members = X[assign == j]
            if len(members):
                newC[j] = members.mean(axis=0)
        if np.array_equal(newC, C):
            break
        C = newC
    return [[float(x) for x in c] for c in C]


def _centroid_dist2(vec: Column, centroids: list[list[float]]) -> Column:
    """Array of per-centroid distance scores ||c||^2 - 2 x.c (the row's own
    ||x||^2 is constant across centroids, so argmin is unchanged — half the
    flops of the full squared distance).

    Deliberately fold-based dots: with n_lists=16 and dim=64 an unrolled
    form is ~16x64x4 expression nodes, which pushed generated-code size
    past a 1 GB driver heap in practice. The whole score array is ONE
    zip_with over a 2D centroid literal — two parsed literals + two
    lambdas total, so driver plan-build time is flat in n_lists (the
    per-element F.lit form spent ~2 s in py4j round trips); the per-row
    interpreted cost (n_lists·dim multiply-adds) is dwarfed by the scan
    either way."""
    norms2 = _lit_doubles([sum(x * x for x in c) for c in centroids])
    C = _lit_vectors([[float(x) for x in c] for c in centroids])
    return F.zip_with(norms2, C, lambda n2, c: n2 - F.lit(2.0) * dot(vec, c))


def ivf_assign(vec: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid list id (0-based; ties -> lowest id, deterministic).

    Single reference to the (large) scores subtree: min over
    zip(scores, index) — struct ordering is lexicographic, so the min is
    (lowest score, lowest id among ties). The array_position(array_min)
    alternative embeds — and evaluates — the scores tree twice."""
    scores = _centroid_dist2(vec, centroids)
    idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
    return F.array_min(F.arrays_zip(scores.alias("s"), idx.alias("i")))["i"].cast(
        "int"
    )


def ivf_probe_lists(vec: Column, centroids: list[list[float]], n_probe: int) -> Column:
    """The n_probe nearest list ids for a query vector (sorted by distance,
    ties -> lowest id): zip scores with indices, sort, slice, project."""
    scores = _centroid_dist2(vec, centroids)
    idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
    ranked = F.sort_array(F.arrays_zip(scores.alias("s"), idx.alias("i")))
    return F.transform(F.slice(ranked, 1, n_probe), lambda p: p["i"].cast("int"))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    fit_fraction: float | None = None,
    max_iter: int = 10,
    exclude_self: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: kmeans-partition the corpus into n_lists
    inverted lists; each query probes its n_probe nearest lists with exact
    cosine + windowed top-k inside them.

    vs lsh_topk: data-adaptive buckets (kmeans follows the embedding
    distribution) and a recall dial (n_probe) that needs no re-indexing —
    the standard IVF-Flat trade. Corpus scan assigns lists with a pure-JVM
    expression (no Python, no shuffle); the probe join is an equi hash join
    on the list id; only bucket members get the exact cosine."""
    centroids = kmeans_centroids(
        corpus,
        vec_col=vec_col,
        n_lists=n_lists,
        seed=seed,
        fit_fraction=fit_fraction,
        max_iter=max_iter,
    )
    from ibis_flink_example_spark.catalog import fan_out

    c = fan_out(corpus.select(id_col, vec_col), min_partitions=8).select(
        F.col(id_col),
        F.col(vec_col).alias("__cvec"),
        l2_norm(F.col(vec_col), dim).alias("__cn"),
        ivf_assign(F.col(vec_col), centroids).alias("__list"),
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("__qvec"),
            l2_norm(F.col(vec_col), dim).alias("__qn"),
            F.explode(
                ivf_probe_lists(F.col(vec_col), centroids, n_probe)
            ).alias("__list"),
        )
    )
    scored = c.join(q, "__list").select(
        "query_id",
        id_col,
        (
            dot(F.col("__cvec"), F.col("__qvec"), dim)
            / (F.col("__cn") * F.col("__qn"))
        ).alias("cosine"),
    )
    if exclude_self:
        scored = scored.filter(F.col(id_col) != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def semantic_dedup(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float = 0.95,
    dim: int | None = None,
    max_rows_per_block: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: drop documents whose
    EMBEDDINGS are near-duplicates, keeping one representative (min id) per
    similarity cluster — the step that removes paraphrases and boilerplate
    that exact/MinHash dedup (lexical) cannot see.

    Pipeline: blocked cosine pairs (>= threshold) → connected components →
    keep component representative. ``block_col`` plays the role SemDeDup's
    k-means cluster assignment plays at scale (pairs are only formed inside
    a block, never across the corpus); swap in ``ivf_assign`` cluster ids
    for the 100 TB path. Components run on the post-threshold residue — a
    tiny graph — via the bounded union-find / distributed-propagation hybrid
    in ``operators.dedup.connected_components``.

    Returns the surviving rows of ``df`` (all original columns).
    """
    from ibis_flink_example_spark.operators.dedup import connected_components

    from ibis_flink_example_spark.operators.checkpoints import (
        attach_eager_checkpoints,
    )

    pairs = embedding_neardup_pairs(
        df,
        id_col=id_col,
        vec_col=vec_col,
        block_col=block_col,
        threshold=threshold,
        dim=dim,
        max_rows_per_block=max_rows_per_block,
    )
    comp = connected_components(
        pairs.select("id_a", "id_b"), df.select(id_col), id_col=id_col
    )
    out = (
        df.join(comp, on=id_col)
        .filter(F.col(id_col) == F.col("component"))
        .drop("component")
    )
    return attach_eager_checkpoints(out, pairs)


def arrow_quantized_norms(em, id_col: str = "vec_id", vec_col: str = "embedding"):
    """§2.10 mapInArrow operator (the Arrow-native sibling of the
    mapInPandas multimodal stages — no pandas materialization at all):
    per-vector quantized squared L2 norm, computed zero-copy on the Arrow
    batch buffers with numpy.

    Exactness contract: each element is quantized round-half-up to 1e6
    fixed point in float64 (identical IEEE op sequence to the SQL
    ``floor(x*1e6 + 0.5)``), then squared and summed in int64 — so the
    result is bit-identical to a SQL engine computing the same integer
    algebra, regardless of summation order (integer addition commutes;
    the float pre-quantization is per-element, never accumulated).
    Output: (id_col, n_dims, norm2_x1e12).
    """
    import pyarrow as pa

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_dims", T.IntegerType()),
            T.StructField("norm2_x1e12", T.LongType()),
        ]
    )

    def run(batches):
        import numpy as np

        for batch in batches:
            ids = batch.column(id_col)
            vecs = batch.column(vec_col)
            # flatten the list array once: values buffer + offsets —
            # zero-copy into numpy, vectorized over the whole batch
            flat = np.asarray(vecs.values, dtype=np.float64)
            q = np.floor(flat * 1_000_000 + 0.5).astype(np.int64)
            offsets = np.asarray(vecs.offsets)
            sq = q * q
            csum = np.concatenate(([0], np.cumsum(sq)))
            norms = csum[offsets[1:]] - csum[offsets[:-1]]
            n_dims = (offsets[1:] - offsets[:-1]).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.asarray(ids, dtype=np.int64), type=pa.int64()),
                    pa.array(n_dims, type=pa.int32()),
                    pa.array(norms, type=pa.int64()),
                ],
                names=[id_col, "n_dims", "norm2_x1e12"],
            )

    return em.select(id_col, vec_col).mapInArrow(run, schema=out_schema)


# Flush ceiling for the arrow Gram accumulator (module-level so tests can
# shrink it to force the multi-flush path).
_GRAM_FLUSH_BUDGET = 1 << 62


def _gram_cells_arrow(em: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Partial Gram matrices per Arrow batch stream: quantize to integer
    micros (same IEEE op sequence as the SQL formulation), accumulate
    Q^T.Q in an int64 numpy matmul, and FLUSH the accumulator before the
    worst-case cell magnitude (rows_accumulated * max|q|^2, tracked per
    batch) could reach 2^62 — so every emitted partial is provably
    int64-exact and the final DECIMAL(38,0) SUM over partials is the
    exact Gram regardless of batch/partition boundaries (integer
    addition is associative). Emits dim*dim (j, k, p) rows per flush;
    a partition emits O(1) flushes at any batch size."""
    import pyarrow as pa

    out_schema = T.StructType(
        [
            T.StructField("j", T.IntegerType()),
            T.StructField("k", T.IntegerType()),
            T.StructField("p", T.LongType()),
        ]
    )
    jj, kk = [], []
    for j in range(dim):
        for k in range(dim):
            jj.append(j)
            kk.append(k)

    budget = _GRAM_FLUSH_BUDGET

    def run(batches):
        import numpy as np

        acc = np.zeros((dim, dim), dtype=np.int64)
        bound = 0

        def flush():
            nonlocal acc, bound
            out = pa.RecordBatch.from_arrays(
                [
                    pa.array(jj, type=pa.int32()),
                    pa.array(kk, type=pa.int32()),
                    pa.array(acc.ravel(), type=pa.int64()),
                ],
                names=["j", "k", "p"],
            )
            acc = np.zeros((dim, dim), dtype=np.int64)
            bound = 0
            return out

        for batch in batches:
            vecs = batch.column(vec_col)
            offsets = np.asarray(vecs.offsets)
            widths = offsets[1:] - offsets[:-1]
            if len(widths) == 0:
                continue
            if not np.all(widths == dim):
                raise ValueError(
                    f"top_pc_power_iteration: expected uniform {dim}-dim "
                    f"vectors, saw lengths {np.unique(widths)!r}"
                )
            # flatten() (NOT .values) respects a sliced/offset batch: it
            # returns exactly this batch's logical elements, so the
            # reshape below cannot misalign row boundaries
            flat = np.asarray(vecs.flatten(), dtype=np.float64)
            if flat.size != int(widths.sum()):
                raise ValueError(
                    "top_pc_power_iteration: list buffer size "
                    f"{flat.size} != sum of row widths {int(widths.sum())}"
                )
            if not np.isfinite(flat).all():
                raise ValueError(
                    "top_pc_power_iteration: non-finite embedding value"
                )
            # Bound-check BEFORE the int64 cast: np.floor(x*1e6+0.5)
            # .astype(int64) wraps (modular) past ~9.2e18, so the
            # mq2 > budget guard below would see a silently-wrapped
            # value instead of the out-of-contract magnitude. 2^62/1e6
            # keeps every quantized |q| (and the cast itself) exact.
            max_abs = float(np.max(np.abs(flat))) if flat.size else 0.0
            if max_abs * 1_000_000 >= float(1 << 62):
                raise ValueError(
                    "top_pc_power_iteration: embedding magnitude "
                    f"{max_abs!r} quantizes beyond int64; inputs are far "
                    "outside the unit-ish contract"
                )
            q = np.floor(flat * 1_000_000 + 0.5).astype(np.int64)
            Q = q.reshape(-1, dim)
            mq2 = int(np.max(np.abs(q))) ** 2 or 1
            if mq2 > budget:
                # a single ROW would exceed the accumulator bound —
                # fail fast instead of looping on zero-row chunks
                raise ValueError(
                    "top_pc_power_iteration: |q|^2 "
                    f"{mq2} exceeds the flush budget {budget}; "
                    "inputs are far outside the unit-ish contract"
                )
            # chunk so (rows-so-far + chunk) * max|q|^2 stays under 2^62
            i = 0
            while i < Q.shape[0]:
                room = (budget - bound) // mq2
                if room < 1:
                    yield flush()
                    continue
                chunk = Q[i : i + room]
                acc += chunk.T @ chunk
                bound += chunk.shape[0] * mq2
                i += chunk.shape[0]
        # bound > 0 iff rows were absorbed since the last flush; an empty
        # partition emits NOTHING (zero-row output keeps the arrow arm
        # exactly equal to the sql arm and the oracle on empty inputs)
        if bound > 0:
            yield flush()

    # NULL vectors contribute nothing in the sql arm and the oracle
    # (explode/UNNEST of NULL emits no rows) — drop them here too, or a
    # null list slot (width 0 in the offsets) would trip the
    # uniform-width check and make the two arms diverge on legal input.
    return (
        em.filter(F.col(vec_col).isNotNull())
        .select(vec_col)
        .mapInArrow(run, schema=out_schema)
    )


def top_pc_power_iteration(
    em: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int = 64,
    iters: int = 6,
    scale: int = 100_000,
    gram: str = "arrow",
) -> DataFrame:
    """Dominant principal direction of the (uncentered) embedding cloud by
    fixed-point POWER ITERATION — the PageRank discipline applied to
    embedding-space analytics (whitening/PCA sits next to quantization in
    a curation stack's embedding QA).

    Exactness: embeddings quantize to integer micros
    (``floor(x*1e6 + 0.5)`` — float->double is exact, one correctly-
    rounded multiply, engine-identical); the Gram matrix G[j,k] =
    sum_rows q_j*q_k accumulates in DECIMAL(38,0); each iteration is
    v <- (G.v) renormalized to max-norm ``scale`` with integer floor
    division on ABSOLUTE values (Spark DIV truncates toward zero, DuckDB
    // floors — identical on non-negatives only, so the sign is factored
    out first). The result after a FIXED ``iters`` steps is exactly
    defined integer arithmetic — no convergence tolerance, no float
    drift; the DuckDB oracle unrolls the same recurrence CTE-per-step.

    CONTRACT: the k-STEP TRANSFORM, not a converged eigenvector (the
    PageRank posture — its 5 iterations are the spec, too). Convergence
    to the dominant eigenvector needs a spectral gap: on a spiked
    spectrum 6 steps align > 0.999 (test-pinned); on a near-flat one
    (the synthetic fixture measures lambda2/lambda1 ~ 0.98) power
    iteration is the wrong tool at ANY practical step count and the
    output is simply the deterministic 6-step iterate (test-pinned
    against an arbitrary-precision Python simulation).

    Scale: the ONLY corpus-sized pass is the Gram build (arrow: numpy
    int64 matmul per batch under a provable flush bound; sql: in-row
    Generate, no self-join — either way text/vectors never reshuffle);
    every iteration then runs on the dim^2-cell frame (16 KB for
    dim=64) regardless of corpus size. Magnitudes: |q| <= ~5e6
    (unit-ish inputs), G <= q^2 * n_rows ~ 2.5e25 at 1e12 rows,
    wv = (G.v)_j <= dim * G * scale ~ 1.6e32 with the 1e5 norm scale,
    and the renormalization's widest intermediate ABS(wv)*scale stays
    <= ~1.6e37 — inside DECIMAL(38,0) and the oracle's HUGEINT in BOTH
    engines. (Input quantization stays at 1e6; only the ITERATE's norm
    uses 1e5 — the two scales are independent.)

    Sign convention: the returned vector is flipped so its largest-
    magnitude coordinate (smallest index on ties) is positive.
    Returns (dim_idx BIGINT 0-based, pc_x1e5 BIGINT).
    """
    from ibis_flink_example_spark.operators.dedup import (
        _release_local_checkpoint,
    )

    spark = em.sparkSession
    if gram == "arrow":
        # Production Gram path: numpy int64 matmul over Arrow batches
        # (a dense rank-dim update is a vectorized-kernel job — the
        # explode formulation below plans ~dim^2/2 struct rows per input
        # row and measures ~10x slower at sf0.1). Partials are
        # int64-exact by the flush bound; ONE dim^2-group aggregation
        # widens to DECIMAL(38,0).
        cells = (
            _gram_cells_arrow(em, vec_col, dim)
            .groupBy("j", "k")
            .agg(F.sum(F.col("p").cast("decimal(38,0)")).alias("g"))
            # dim^2 rows: shrink to ONE partition before checkpointing so
            # the 6 iteration joins don't pay 32 tasks per stage on a
            # 16 KB frame (the BPE loop discipline)
            .coalesce(1)
            .localCheckpoint()  # corpus-sized pass runs exactly once
        )
    elif gram == "sql":
        # Declarative bracket (kept test-cross-checked against the arrow
        # path): upper triangle only — dim*(dim+1)/2 BIGINT products per
        # row (|q| <= ~5e6 -> p <= ~2.5e13, int64-safe per ROW
        # unconditionally), DECIMAL widening once inside the
        # aggregation, mirror on the materialized triangle.
        qa = (
            f"transform({vec_col}, x -> "
            "CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))"
        )
        pairs = (
            "flatten(transform(qa, (xj, j) -> "
            f"transform(slice(qa, j + 1, {dim}), (xk, i) -> "
            "struct(j AS j, j + i AS k, xj * xk AS p))))"
        )
        tri = (
            em.select(F.expr(qa).alias("qa"))
            .select(F.explode(F.expr(pairs)).alias("s"))
            .groupBy(
                F.col("s.j").cast("int").alias("j"),
                F.col("s.k").cast("int").alias("k"),
            )
            .agg(F.sum(F.col("s.p").cast("decimal(38,0)")).alias("g"))
            .localCheckpoint()  # corpus-sized pass runs exactly once —
            # the mirror reuses the MATERIALIZED triangle, never the scan
        )
        cells = tri.unionByName(
            tri.filter(F.col("j") < F.col("k")).select(
                F.col("k").alias("j"), F.col("j").alias("k"), "g"
            )
        )
    else:
        raise ValueError(f"gram must be 'arrow' or 'sql', got {gram!r}")
    v = spark.range(dim).select(
        F.col("id").cast("int").alias("d"),
        F.lit(scale).cast("decimal(38,0)").alias("val"),
    )
    prev = None
    for _ in range(iters):
        w = (
            cells.join(v, cells["k"] == v["d"])
            .groupBy(cells["j"].alias("wd"))
            .agg(F.sum(F.col("g") * F.col("val")).alias("wv"))
        )
        # Renormalization headroom: ABS(wv) * scale is the widest
        # intermediate, and DIV cannot be applied earlier (Spark's
        # decimal DIV returns BIGINT, so any "divide first" formulation
        # overflows long the moment wv > 2^63 — observed r8). With the
        # norm scale at 1e5, wv <= dim * G * scale ~ 1.6e32 at the
        # 1e12-row regime and ABS(wv)*scale <= 1.6e37 — inside both
        # DECIMAL(38,0) and the oracle's HUGEINT (~1.7e38).
        m = w.agg(
            F.greatest(
                F.max(F.abs(F.col("wv"))), F.lit(1).cast("decimal(38,0)")
            ).alias("m")
        )
        nxt = (
            w.crossJoin(F.broadcast(m))
            .select(
                F.col("wd").alias("d"),
                F.expr(
                    "CASE WHEN wv < 0 THEN "
                    f"-((ABS(wv) * {scale}) DIV m) "
                    f"ELSE (wv * {scale}) DIV m END"
                )
                .cast("decimal(38,0)")
                .alias("val"),
            )
            .coalesce(1)
            .localCheckpoint()
        )
        if prev is not None:
            _release_local_checkpoint(prev)
        prev, v = nxt, nxt
    anchor = (
        v.orderBy(F.abs(F.col("val")).desc(), F.col("d").asc())
        .limit(1)
        .select(F.col("val").alias("vmax"))
    )
    sgn = anchor.select(
        F.when(F.col("vmax") < 0, F.lit(-1)).otherwise(F.lit(1)).alias("s")
    )
    return v.crossJoin(F.broadcast(sgn)).select(
        F.col("d").cast("long").alias("dim_idx"),
        (F.col("val") * F.col("s")).cast("long").alias("pc_x1e5"),
    )


def hard_negative_mining(
    corpus: DataFrame,
    anchors: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 5,
    dim: int | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor,
    the top-k most-similar corpus items carrying a DIFFERENT label — the
    near-misses that make the strongest negatives (a random negative is
    trivially separable; the ones next to the decision boundary carry
    the gradient).

    Same scale shape as :func:`cosine_topk`: the anchor set broadcasts
    (contrastive batches mine against tens-to-thousands of anchors, never
    the whole corpus at once), the corpus scan is embarrassingly parallel,
    the label-mismatch filter lands in the scan stage BEFORE any score is
    kept, and the top-k cut is a per-anchor window. Swap the brute-force
    scorer for lsh_topk's bucketed probe at corpus scales where the full
    scan stops paying.

    Output: (anchor_id, anchor_label, id_col, neg_label, cosine, rank),
    rank 1..k per anchor, ties broken on id.
    """
    from ibis_flink_example_spark.catalog import fan_out

    a = F.broadcast(
        anchors.select(
            F.col(id_col).alias("anchor_id"),
            F.col(label_col).alias("anchor_label"),
            F.col(vec_col).alias("__avec"),
        )
    )
    scored = (
        fan_out(corpus.select(id_col, label_col, vec_col), min_partitions=8)
        .crossJoin(a)
        .filter(F.col(label_col) != F.col("anchor_label"))
        .select(
            "anchor_id",
            "anchor_label",
            F.col(id_col),
            F.col(label_col).alias("neg_label"),
            cosine(F.col(vec_col), F.col("__avec"), dim).alias("cosine"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def lsh_label_agreement(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
    max_bucket_size: int | None = 50_000,
) -> DataFrame:
    """Per-label kNN label-agreement — the classic embedding-space
    label-noise detector, in its LSH-bucketed scale form: every vector's
    k nearest neighbors are found among its hyperplane-bucket
    co-occupants (query side multi-probes the Hamming-1 buckets), and a
    vector whose neighborhood mostly wears OTHER labels is a suspected
    mislabel. Rolled up per label so the readout is the audit table:
    which classes are noisy, how noisy, how many suspects.

    Unlike ``lsh_topk`` (anchor-batch shape: the handful of queries
    broadcasts), every vector is a query here, so the candidate stage is
    a bucket-keyed EQUI SELF-JOIN — both sides shuffle once on the
    bucket id, the probe explosion (1 + n_planes rows) rides the query
    side, and ``max_bucket_size`` caps degenerate buckets via
    ``drop_hot_keys`` (a bucket holding a constant-vector pile would
    otherwise self-join quadratically). Exact cosine + per-query top-k
    inside buckets; per-query and per-label rollups ride the query-key
    partitioning.

    Returns one row per label: (label_col, n_vectors, n_with_neighbors,
    n_suspect, agreement_x1e6) where suspect = strictly-minority own
    label among the neighbors (2*same < nbrs) and agreement is the
    label's pooled neighbor-agreement rate (NULL when no vector of the
    label found any candidate).
    """
    from ibis_flink_example_spark.catalog import fan_out
    from ibis_flink_example_spark.operators.checkpoints import (
        attach_eager_checkpoints,
    )
    from ibis_flink_example_spark.operators.dedup import drop_hot_keys

    if probe_hamming not in (0, 1):
        raise ValueError("probe_hamming must be 0 or 1")
    planes = random_hyperplanes(dim, n_planes, seed)
    # base is consumed three ways (candidate side, query side, and
    # drop_hot_keys' occupancy count), so the corpus scan + n_planes
    # dot-product signatures are materialized ONCE; release obligation
    # rides the returned plan per the checkpoints.py contract (ADVICE r12).
    base = (
        fan_out(df.select(id_col, vec_col, label_col), min_partitions=8)
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.col(label_col),
            hyperplane_signature(F.col(vec_col), planes).alias("__bucket"),
        )
        .localCheckpoint(eager=True)
    )
    c = drop_hot_keys(
        base,
        ["__bucket"],
        max_rows_per_key=max_bucket_size,
        what="hyperplane bucket",
        lazy=True,  # AQE-guarded anti-join; zero driver actions (r15)
    )
    if probe_hamming == 1:
        probe = F.explode(
            F.array(
                F.col("__bucket"),
                *[
                    F.col("__bucket").bitwiseXOR(F.lit(1 << i).cast("long"))
                    for i in range(n_planes)
                ],
            )
        )
    else:
        probe = F.col("__bucket")
    q = base.select(
        F.col(id_col).alias("__qid"),
        F.col(vec_col).alias("__qvec"),
        F.col(label_col).alias("__qlabel"),
        probe.alias("__qbucket"),
    )
    scored = (
        c.join(q, F.col("__bucket") == F.col("__qbucket"))
        .filter(F.col(id_col) != F.col("__qid"))
        .select(
            "__qid",
            "__qlabel",
            F.col(label_col).alias("__nlabel"),
            F.col(id_col).alias("__nid"),
            cosine(F.col(vec_col), F.col("__qvec")).alias("__cos"),
        )
    )
    w = Window.partitionBy("__qid").orderBy(
        F.col("__cos").desc(), F.col("__nid")
    )
    top = scored.withColumn("__rank", F.row_number().over(w)).filter(
        F.col("__rank") <= k
    )
    per_q = top.groupBy("__qid", "__qlabel").agg(
        F.count(F.lit(1)).cast("long").alias("__nbrs"),
        F.count(F.when(F.col("__nlabel") == F.col("__qlabel"), 1))
        .cast("long")
        .alias("__same"),
    )
    joined = df.select(F.col(id_col), F.col(label_col)).join(
        per_q, F.col(id_col) == F.col("__qid"), "left"
    )
    out = joined.groupBy(label_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.count("__qid").cast("long").alias("n_with_neighbors"),
        F.count(F.when(F.col("__same") * 2 < F.col("__nbrs"), 1))
        .cast("long")
        .alias("n_suspect"),
        F.expr(
            "CAST(CASE WHEN SUM(__nbrs) IS NULL OR SUM(__nbrs) = 0 THEN NULL "
            "ELSE SUM(__same) * 1000000 DIV SUM(__nbrs) END AS BIGINT)"
        ).alias("agreement_x1e6"),
    )
    return attach_eager_checkpoints(out, handles=(base,))


def lsh_multitable_candidate_pairs(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    dim: int,
    n_tables: int = 6,
    n_planes: int = 6,
    seed: int = 42,
    max_bucket_size: int | None = 50_000,
) -> DataFrame:
    """Candidate pairs from L independent hyperplane hash tables with
    Hamming-1 multiprobe — the classical LSH AMPLIFICATION form (OR over
    tables of AND over planes) that single-table signatures can't reach:
    at a low cosine threshold one p-plane table collides true pairs with
    probability ~(1-θ/π)^p, while L tables push recall to
    1-(1-s)^L (measured 0.85 at the 0.35 corpus threshold with
    L=6, p=6 vs 0.12 for one 8-plane table).

    Plan shape (the lsh_label_agreement bucket-equi-join machinery, per
    table): ONE scan computes all L signatures (driver-side literal
    planes), an in-row explode fans each vector to L (table, bucket)
    rows, the candidate side is capped per (table, bucket) via
    ``drop_hot_keys``, the probe side explodes the 1 + p Hamming-1
    buckets, and the single equi-join on (table, bucket) shuffles once
    on the composite key — never an all-pairs product. Output: distinct
    (id_a < id_b) candidate pairs, deduped ACROSS tables (the OR).

    Scale dial: candidate volume at a FIXED (n_tables, n_planes) is
    Θ(n² · (1+p)/2^p) for weakly-structured corpora — the defaults are a
    recall-oriented small-corpus setting. At corpus scale, raise
    ``n_planes`` ~ log2(n) to hold expected bucket occupancy (and thus
    candidates per vector) constant, raising ``n_tables`` alongside to
    hold recall — the constant-occupancy regime SCALING.md measures at
    exponent 0.448 — or swap the block generator for ``ivf_assign``
    clusters.
    """
    from ibis_flink_example_spark.catalog import fan_out
    from ibis_flink_example_spark.operators.checkpoints import (
        attach_eager_checkpoints,
    )
    from ibis_flink_example_spark.operators.dedup import drop_hot_keys

    tables = [
        random_hyperplanes(dim, n_planes, seed + 1000 * t)
        for t in range(n_tables)
    ]
    # base is consumed three ways (candidate side, probe side, and
    # drop_hot_keys' occupancy count), so the corpus scan and the
    # L x p signature projections materialize ONCE (the
    # lsh_label_agreement idiom, ADVICE r12); release rides the
    # returned plan per the checkpoints.py contract.
    base = (
        fan_out(df.select(id_col, vec_col), min_partitions=8)
        .select(
            F.col(id_col),
            # One plane-matrix literal + nested fold, not L x p unrolled
            # fold trees — bit-identical, ~0.2 s less driver planning per
            # build (see multitable_signature_structs).
            F.explode(
                multitable_signature_structs(F.col(vec_col), tables)
            ).alias("__tb"),
        )
        .select(
            F.col(id_col),
            F.col("__tb.t").alias("__t"),
            F.col("__tb.b").alias("__b"),
        )
        .localCheckpoint(eager=True)
    )
    c = drop_hot_keys(
        base,
        ["__t", "__b"],
        max_rows_per_key=max_bucket_size,
        what="LSH table bucket",
        lazy=True,  # AQE-guarded anti-join; zero driver actions (r15)
    ).select(F.col(id_col).alias("__cid"), "__t", "__b")
    probe = base.select(
        F.col(id_col).alias("__qid"),
        "__t",
        F.explode(
            F.array(
                F.col("__b"),
                *[
                    F.col("__b").bitwiseXOR(F.lit(1 << i).cast("long"))
                    for i in range(n_planes)
                ],
            )
        ).alias("__b"),
    )
    out = (
        c.join(probe, ["__t", "__b"])
        .filter(F.col("__cid") != F.col("__qid"))
        .select(
            F.least("__cid", "__qid").alias("id_a"),
            F.greatest("__cid", "__qid").alias("id_b"),
        )
        .distinct()
    )
    return attach_eager_checkpoints(out, handles=(base,))


def lsh_semantic_pairs(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold_x1e6: int = 350_000,
    prefilter: float | None = None,
    n_tables: int = 6,
    n_planes: int = 6,
    seed: int = 42,
    max_bucket_size: int | None = 50_000,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """LSH-candidates-then-exact-verify semantic near-dup pairs: the
    multitable candidates above, verified at exact cosine on the
    quantized cos6 >= threshold_x1e6 gate (the threshold-sweep boundary
    contract: a float pre-filter strictly BELOW the gate, membership
    decided only by the rounded fixed-point compare both engines mirror
    bit-for-bit). Verification joins the (id-keyed) vector+norm frame
    onto the candidate pairs — cost is candidate-proportional, never
    corpus-quadratic. Output: (id_a < id_b) verified pairs.

    ``candidates``: pass a precomputed (id_a, id_b) frame (e.g. an
    eagerly-checkpointed ``lsh_multitable_candidate_pairs`` a QA query
    also counts) to skip recomputing the candidate stage.

    The pair-time dot/norm use the FOLD form deliberately (``dot``'s
    documented trade, measured here: the unrolled verify costs ~9 s of
    driver planning per invocation vs ~1.6 s fold runtime even at 1M
    candidate pairs — and the two are bit-identical).

    ``prefilter`` defaults to ``(threshold_x1e6 - 100) / 1e6`` so the
    float pre-filter tracks the gate when callers override
    ``threshold_x1e6`` (a fixed 0.3499 under a 300_000 gate would
    silently drop pairs with cosine in [0.30, 0.3499)); an explicit
    value must still sit strictly below the gate — asserted."""
    if prefilter is None:
        prefilter = (threshold_x1e6 - 100) / 1_000_000
    if not prefilter * 1_000_000 < threshold_x1e6 - 0.5:
        # A real raise, not an assert: the guard must survive `python -O`
        # (an over-gate prefilter silently drops qualifying pairs).
        raise ValueError(
            "prefilter must sit strictly below the cos6 gate: "
            f"{prefilter} vs {threshold_x1e6}"
        )
    cand = candidates
    if cand is None:
        cand = lsh_multitable_candidate_pairs(
            df,
            id_col=id_col,
            vec_col=vec_col,
            dim=dim,
            n_tables=n_tables,
            n_planes=n_planes,
            seed=seed,
            max_bucket_size=max_bucket_size,
        )
    base = df.select(
        F.col(id_col),
        F.col(vec_col).alias("__vec"),
        l2_norm(F.col(vec_col)).alias("__n"),
    )
    a = base.select(
        F.col(id_col).alias("id_a"),
        F.col("__vec").alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = base.select(
        F.col(id_col).alias("id_b"),
        F.col("__vec").alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    out = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "__cos",
            dot(F.col("__va"), F.col("__vb"))
            / (F.col("__na") * F.col("__nb")),
        )
        .filter(F.col("__cos") >= prefilter)
        .withColumn(
            "__cos6", F.round(F.col("__cos") * 1_000_000, 0).cast("long")
        )
        .filter(F.col("__cos6") >= F.lit(threshold_x1e6).cast("long"))
        .select("id_a", "id_b")
    )
    # Propagate the candidate stage's eager-checkpoint release handle
    # onto the returned plan (checkpoints.py combinator rule) — dropping
    # it here made release_eager_checkpoints a no-op for loop callers.
    return attach_eager_checkpoints(out, cand)


def semdedup_lsh(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold_x1e6: int = 350_000,
    n_tables: int = 6,
    n_planes: int = 6,
    seed: int = 42,
    max_bucket_size: int | None = 50_000,
) -> DataFrame:
    """ANN-backed SemDeDup: ``semantic_dedup``'s connected-components
    representative selection over ``lsh_semantic_pairs`` — the 100 TB
    form where the pair space is bounded by LSH banding instead of a
    blocking column (SemDeDup's k-means assignment stand-ins both; the
    LSH tables need no trained centroids — the TRAINED arm is
    ``operators/clustering.kmeans_assign`` + the ``semdedup_kmeans``
    query). Keeps the min-id
    representative per similarity component; returns the surviving rows
    of ``df`` (all original columns). Recall vs the blocked-exact arm is
    measured by the companion ``semdedup_lsh_recall`` query, not assumed.
    """
    from ibis_flink_example_spark.operators.dedup import connected_components

    pairs = lsh_semantic_pairs(
        df,
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
        threshold_x1e6=threshold_x1e6,
        n_tables=n_tables,
        n_planes=n_planes,
        seed=seed,
        max_bucket_size=max_bucket_size,
    )
    comp = connected_components(pairs, df.select(id_col), id_col=id_col)
    out = (
        df.join(comp, on=id_col)
        .filter(F.col(id_col) == F.col("component"))
        .drop("component")
    )
    # Survivors inherit the pairs frame's (and transitively the LSH
    # candidate stage's) eager-checkpoint handles — checkpoints.py rule.
    return attach_eager_checkpoints(out, pairs, comp)


def margin_mined_pairs(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    dim: int,
    is_a_col: str,
    n_tables: int = 6,
    n_planes: int = 6,
    topk: int = 4,
    margin_threshold_x1e6: int = 1_200_000,
    seed: int = 42,
    max_bucket_size: int | None = 50_000,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Margin-criterion cross-corpus pair mining (Artetxe-Schwenk): the
    multitable-LSH candidates restricted to CROSS-group pairs
    (``is_a_col`` boolean splits the corpus), scored at exact cos6 and
    rated by the margin against both endpoints' top-``topk`` candidate
    neighborhoods — margin = 2e6 * cos(x,y) DIV (avgk(x) + avgk(y)),
    all-integer with truncating division. Emits each A-side vector's
    best-margin match at or above the threshold:
    ``(vec_id_a, vec_id_b, cos6, margin_x1e6)``.

    Plan shape: after the LSH candidate equi-joins, ONE linear window
    chain — x-rank + x-avg ride one exchange, y-rank + y-avg a second,
    the best-match window re-uses the x key for a third; no join after
    scoring and no checkpoint (every stage is consumed once). The
    neighborhood averages are over the CANDIDATE frame — the
    approximation real miners make at corpus scale, where exact kNN
    margins would need the brute-force pass the candidates exist to
    avoid; ``n_planes ~ log2(n)`` is the same constant-occupancy dial
    as ``lsh_semantic_pairs`` (SCALING.md measures this stage).

    ``candidates``: pass a precomputed canonical (id_a < id_b) pair
    frame to skip the LSH stage — the ``lsh_semantic_pairs`` idiom;
    used by the deterministic margin-semantics tests and by callers
    that already hold a candidate set."""
    from pyspark.sql import Window

    cand = candidates
    if cand is None:
        cand = lsh_multitable_candidate_pairs(
            df,
            id_col=id_col,
            vec_col=vec_col,
            dim=dim,
            n_tables=n_tables,
            n_planes=n_planes,
            seed=seed,
            max_bucket_size=max_bucket_size,
        )
    grp = df.select(F.col(id_col), F.col(is_a_col).alias("__isa"))
    ga = grp.select(F.col(id_col).alias("id_a"), F.col("__isa").alias("__ga"))
    gb = grp.select(F.col(id_col).alias("id_b"), F.col("__isa").alias("__gb"))
    cross = (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .filter(F.col("__ga") != F.col("__gb"))
        .select(
            F.when(F.col("__ga"), F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("x"),
            F.when(F.col("__ga"), F.col("id_b"))
            .otherwise(F.col("id_a"))
            .alias("y"),
        )
    )
    v = df.select(
        F.col(id_col),
        F.col(vec_col).alias("__vec"),
        l2_norm(F.col(vec_col)).alias("__n"),
    )
    va = v.select(
        F.col(id_col).alias("x"),
        F.col("__vec").alias("__va"),
        F.col("__n").alias("__na"),
    )
    vb = v.select(
        F.col(id_col).alias("y"),
        F.col("__vec").alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    scored = (
        cross.join(va, "x")
        .join(vb, "y")
        .select(
            "x",
            "y",
            F.round(
                dot(F.col("__va"), F.col("__vb"))
                / (F.col("__na") * F.col("__nb"))
                * 1_000_000,
                0,
            )
            .cast("long")
            .alias("cos6"),
        )
    )
    wx = Window.partitionBy("x").orderBy(F.col("cos6").desc(), F.col("y"))
    wy = Window.partitionBy("y").orderBy(F.col("cos6").desc(), F.col("x"))
    axw = scored.withColumn("rnx", F.row_number().over(wx)).withColumn(
        "avgx",
        F.expr(
            f"CAST(SUM(CASE WHEN rnx <= {topk} THEN cos6 ELSE 0 END)"
            " OVER (PARTITION BY x)"
            f" DIV SUM(CASE WHEN rnx <= {topk} THEN 1 ELSE 0 END)"
            " OVER (PARTITION BY x) AS BIGINT)"
        ),
    )
    ayw = axw.withColumn("rny", F.row_number().over(wy)).withColumn(
        "avgy",
        F.expr(
            f"CAST(SUM(CASE WHEN rny <= {topk} THEN cos6 ELSE 0 END)"
            " OVER (PARTITION BY y)"
            f" DIV SUM(CASE WHEN rny <= {topk} THEN 1 ELSE 0 END)"
            " OVER (PARTITION BY y) AS BIGINT)"
        ),
    )
    m = ayw.filter(F.col("avgx") + F.col("avgy") > 0).withColumn(
        "margin_x1e6",
        F.expr("CAST(cos6 * 2000000 DIV (avgx + avgy) AS BIGINT)"),
    )
    wb = Window.partitionBy("x").orderBy(
        F.col("margin_x1e6").desc(), F.col("y")
    )
    out = (
        m.withColumn("rb", F.row_number().over(wb))
        .filter(
            (F.col("rb") == 1)
            & (F.col("margin_x1e6") >= F.lit(margin_threshold_x1e6))
        )
        .select(
            F.col("x").alias("vec_id_a"),
            F.col("y").alias("vec_id_b"),
            "cos6",
            "margin_x1e6",
        )
    )
    return attach_eager_checkpoints(out, cand)

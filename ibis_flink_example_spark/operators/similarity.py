"""Similarity search over embedding columns (SURVEY.md §2.11 X3):
brute-force cosine top-k (exact baseline) and random-hyperplane LSH
(the scale path), plus embedding near-dup pairs.

Scale design:
- Dot products are JVM-side (``zip_with`` + ``aggregate`` folding doubles) —
  no Python, vectorized by codegen; queries are broadcast so the scan of the
  corpus is embarrassingly parallel and never shuffles.
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


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double, folded left-to-right (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def normalize(a: Column) -> Column:
    """Unit-normalize once at the scan so pairwise cosine becomes a single
    dot-product fold — computing cosine(a, b) raw costs 3 folds per PAIR,
    normalizing costs 1 fold per ROW + 1 per pair. Always the right trade
    beyond a handful of pairs per row."""
    n = l2_norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact brute-force top-k: broadcast the (small) query set against the
    corpus scan; one window per query for the top-k cut.

    Output: (query_id, id_col, cosine, rank), rank 1..k.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
        )
    )
    scored = corpus.crossJoin(q).select(
        F.col("__qid").alias("query_id"),
        F.col(id_col),
        cosine(F.col(vec_col), F.col("__qvec")).alias("cosine"),
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
            dot(vec, F.array(*[F.lit(x) for x in p])) >= 0,
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


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
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows sharing the query's
    hyperplane signature bucket; exact cosine + top-k within the bucket.

    Recall/cost dial: more planes → smaller buckets → cheaper, lower recall
    (2^n_planes expected buckets). Multi-probe (flip one bit) would raise
    recall; omitted here for clarity.
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_signature(F.col(vec_col), planes).alias("__bucket"),
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("__qvec"),
            hyperplane_signature(F.col(vec_col), planes).alias("__qbucket"),
        )
    )
    scored = c.join(q, F.col("__bucket") == F.col("__qbucket")).select(
        "query_id",
        id_col,
        cosine(F.col(vec_col), F.col("__qvec")).alias("cosine"),
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
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine >= threshold).

    ``block_col`` bounds the pair space (same-label / same-shard blocking);
    at scale substitute the LSH bucket as the block. Join is equi on the
    block key with the id inequality as residual — a hash join, not a
    cartesian product.
    """
    cols = [F.col(id_col), normalize(F.col(vec_col)).alias("__nvec")] + (
        [F.col(block_col)] if block_col else []
    )
    base = df.select(*cols)
    a, b = base.alias("a"), base.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = (F.col(f"a.{block_col}") == F.col(f"b.{block_col}")) & cond
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            dot(F.col("a.__nvec"), F.col("b.__nvec")).alias("cosine"),
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
    iteration count, ties to the lowest centroid index."""
    import numpy as np

    train_df = corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
    if fit_fraction is not None:
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
    flops of the full squared distance)."""
    return F.array(
        *[
            F.lit(sum(x * x for x in c))
            - F.lit(2.0) * dot(vec, F.array(*[F.lit(x) for x in c]))
            for c in centroids
        ]
    )


def ivf_assign(vec: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid list id (0-based; ties -> lowest id, deterministic)."""
    scores = _centroid_dist2(vec, centroids)
    return (F.array_position(scores, F.array_min(scores)) - 1).cast("int")


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
    c = corpus.select(
        F.col(id_col),
        normalize(F.col(vec_col)).alias("__nvec"),
        ivf_assign(F.col(vec_col), centroids).alias("__list"),
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            normalize(F.col(vec_col)).alias("__qnvec"),
            F.explode(
                ivf_probe_lists(F.col(vec_col), centroids, n_probe)
            ).alias("__list"),
        )
    )
    scored = c.join(q, "__list").select(
        "query_id",
        id_col,
        dot(F.col("__nvec"), F.col("__qnvec")).alias("cosine"),
    )
    if exclude_self:
        scored = scored.filter(F.col(id_col) != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)

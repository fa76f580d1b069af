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

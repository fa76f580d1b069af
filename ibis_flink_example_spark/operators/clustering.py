"""Fixed-point Lloyd k-means over embedding columns.

The trained-blocking arm SemDeDup actually uses (Abbas et al. 2023 cluster
with k-means, then form pairs only within a cluster): the LSH-banded arm
(``similarity.lsh_semantic_pairs``) bounds the pair space with random
hyperplanes and needs no training pass; this module supplies the trained
alternative so ``semdedup_kmeans`` can block on real centroids. Reference
parity: the reference engine has no iterative clustering at all — this
extends its dedup surface the way ``operators/graph.py`` (PageRank) and
``operators/bpe.py`` extend its aggregation surface, and it reuses their
iterative discipline wholesale. Relation to
``similarity.kmeans_centroids``: that one trains float centroids in numpy
on a bounded seeded SAMPLE (index build for IVF — assignment stays
distributed); this one runs the full corpus through every Lloyd iteration
in integer arithmetic so a DuckDB oracle can replay it bit-for-bit.

Exactness contract (the PageRank/BPE playbook):
- Embedding components are quantized ONCE to integer micro-units with the
  engine-stable ``floor(x * 1e6 + 0.5)`` idiom (``embedding_centroid_by_
  label`` proved it); every subsequent op — squared L2 distances, argmin,
  centroid sums — is pure BIGINT arithmetic, bit-identical at any
  partition order.
- The per-vector argmin is ENCODED: ``enc = dist * k + cid`` minimized as
  one BIGINT (k tiny, dist bounded by dim * (2 * 1e6)^2 << 2^63 / k), so
  equal-distance ties deterministically break toward the smaller cluster
  id in both engines with a plain MIN.
- Centroid update divides the exact per-dimension BIGINT sum by the
  cluster size with TRUNCATION toward zero — Spark ``DIV``, DuckDB ``//``
  and this module's ``_trunc_div`` (Python ``//`` floors, so the helper
  re-derives truncation) all agree on negative sums.
- Empty clusters keep their previous centroid (COALESCE in the oracle,
  dict-carryover here).

Scale posture (100 TB): classic broadcast-Lloyd. Centroids are a k x dim
integer matrix held on the driver (k*dim*8 bytes — kilobytes) and baked
into the assignment expression as ONE matrix LITERAL, so each iteration is
ONE scan of the quantized, eagerly-checkpointed base frame (map-only
assignment, whole-stage codegen, no join) plus ONE aggregation whose
map-side partials reduce every partition to k x dim (cid, dim) rows
before the exchange.
The two driver collects per iteration (k centroid rows; the initial k
seed vectors) are bounded by k, never by the corpus — the documented
bounded-collect pattern (see ``dedup.connected_components``' driver arm).
Iteration count is a fixed small constant: total cost O(iters x scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT = 1_000_000


def _trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero — matches Spark ``DIV`` and
    DuckDB ``//`` on negative operands where Python ``//`` floors."""
    q = abs(a) // b
    return q if a >= 0 else -q


def quantize_micro(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, __mv) with ``__mv`` the embedding quantized to an array of
    BIGINT micro-units via ``floor(CAST(x AS DOUBLE) * 1e6 + 0.5)`` —
    the one float op in the k-means pipeline, engine-exact because both
    engines evaluate the identical two-op double expression.
    ``carry_cols`` project extra columns through unchanged (streaming
    callers carry the arrival tag as DATA instead of re-stamping a
    per-batch literal that would defeat the codegen cache)."""
    return df.select(
        F.col(id_col),
        *[F.col(x) for x in carry_cols],
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * QUANT + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("__mv"),
    )


def encoded_argmin(mv: Column, centroids: list[list[int]], k: int) -> Column:
    """The broadcast-Lloyd encoded argmin ``min(dist * k + cid)`` over a
    quantized BIGINT vector column: ONE k x dim matrix literal + a nested
    fold over a sequence(0, k-1) index, not k unrolled per-centroid fold
    trees. Constant folding collapses the parsed array(array(...)) into a
    single Literal in codegen's references array (compiled class reused
    across iterations/batches even as centroid values change — the r13
    array-literal lesson), and Catalyst analyzes ONE tree per build
    instead of k. array_min over (dist * k + cid) == least of the same k
    values, bit-identical (verified exceptAll both ways at sf0.1, r15);
    this + the exploded centroid agg took kmeans_assign's 4-iteration
    driver chain from ~5.4 s to ~1.5 s warm."""
    inner = ",".join(
        "array(" + ",".join(f"{int(x)}L" for x in c) + ")" for c in centroids
    )
    mat = F.expr(f"array({inner})")
    return F.array_min(
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: F.aggregate(
                F.zip_with(
                    mv,
                    F.element_at(mat, i + 1),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            * k
            + i.cast("long"),
        )
    )


def kmeans_assign(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 8,
    iters: int = 4,
    with_prev: bool = False,
) -> DataFrame:
    """Lloyd k-means, ``iters`` assignment passes with ``iters - 1``
    centroid updates in between; returns one row per input row:
    ``(id_col, cluster_id BIGINT, dist_micro2 BIGINT)`` — the assignment
    under the FINAL centroids and its squared L2 distance in micro^2
    units. Seeding is deterministic: initial centroids are the vectors of
    the ``k`` smallest ids (no RNG — the driver contract bans
    ``Math.random``-style seeds and the oracle must replay the exact
    start state).

    ``with_prev=True`` adds ``prev_cluster_id`` — the assignment the
    PENULTIMATE pass made (centroids after ``iters - 2`` updates),
    computed in the SAME scan as the final one (both encoded argmins are
    plain column expressions) — the input the convergence-churn monitor
    needs without a second k-means run.

    The DuckDB oracle unrolls the same recurrence CTE-per-iteration
    (``kmeans_oracle`` in queries_llm.py) — a hash match proves
    iteration-for-iteration equality, the PageRank discipline.
    """
    from ibis_flink_example_spark.operators.dedup import (
        _release_local_checkpoint,
    )

    base = quantize_micro(df, id_col=id_col, vec_col=vec_col)
    # Scanned once per iteration (+ the seed collect): materialize once,
    # cut lineage; released before returning — the final plan re-derives
    # the quantization from the source scan so the returned frame carries
    # no checkpoint dependency (callers can re-plan it freely).
    base_cp = base.localCheckpoint(eager=True)

    seed_rows = base_cp.orderBy(F.col(id_col)).limit(k).collect()
    cents: list[list[int]] = [list(r["__mv"]) for r in seed_rows]
    if len(cents) < k:
        raise ValueError(f"kmeans_assign: need >= {k} rows, got {len(cents)}")

    def enc_expr(centroids: list[list[int]]):
        # see encoded_argmin: one matrix literal + one analyzed tree per
        # iteration, bit-identical to the unrolled least() form
        return encoded_argmin(F.col("__mv"), centroids, k)

    # iters - 1 update rounds; the iters-th (final) assignment is the
    # returned expression below.
    cents_prev: list[list[int]] = [list(c) for c in cents]
    for _ in range(iters - 1):
        cents_prev = [list(c) for c in cents]
        assigned = base_cp.select(
            (enc_expr(cents) % k).alias("__cid"), "__mv"
        )
        # Element-wise centroid sums via posexplode + ONE analyzed agg
        # expression, not dim separate sum columns (dim+1 agg exprs cost
        # ~0.5 s of Catalyst analysis PER ITERATION at dim=64). Same
        # exactness (BIGINT sums) and the same map-side partial
        # aggregation: each partition reduces to k x dim (cid, d) rows
        # before the exchange; the collect stays bounded at k x dim rows.
        sums = (
            assigned.select(
                "__cid", F.posexplode("__mv").alias("__d", "__v")
            )
            .groupBy("__cid", "__d")
            .agg(
                F.count(F.lit(1)).cast("long").alias("__n"),
                F.sum("__v").alias("__s"),
            )
            .collect()
        )
        new_cents = [list(c) for c in cents]  # empty cluster keeps old
        counts: dict[int, int] = {}
        acc: dict[tuple[int, int], int] = {}
        for r in sums:
            counts[int(r["__cid"])] = int(r["__n"])
            acc[(int(r["__cid"]), int(r["__d"]))] = int(r["__s"])
        for cid, n in counts.items():
            new_cents[cid] = [
                _trunc_div(acc[(cid, d)], n) for d in range(dim)
            ]
        cents = new_cents

    _release_local_checkpoint(base_cp)
    # Final assignment re-derives from the source plan (not the released
    # checkpoint) so the returned DataFrame is self-contained.
    cols = [
        F.col(id_col),
        (F.col("__enc") % k).cast("long").alias("cluster_id"),
        F.expr(f"__enc DIV {k}").cast("long").alias("dist_micro2"),
    ]
    if with_prev:
        cols.append(
            (enc_expr(cents_prev) % k).cast("long").alias("prev_cluster_id")
        )
    return base.withColumn("__enc", enc_expr(cents)).select(*cols)

"""Shared DuckDB-oracle SQL fragments, import-side-effect-free.

Extracted from queries_llm so that BOTH query modules (queries_llm,
queries_streaming) can build oracles from the multitable-LSH replay
without a registration-order-sensitive circular import: queries.py
imports the query modules for their @query side effects, so a fragment
living inside one query module cannot be imported by another at
decoration time (importing queries_llm directly, before queries, used to
raise ImportError through the partially-initialized module).
"""

from __future__ import annotations

def _semdedup_lsh_cte(
    n_tables: int = 6,
    n_planes: int = 6,
    dim: int = 64,
    cap: int = 50_000,
    thr_x1e6: int = 350_000,
) -> str:
    """Shared WITH-clause body replaying the multitable hyperplane LSH
    (operators/similarity.py:lsh_multitable_candidate_pairs /
    lsh_semantic_pairs) in DuckDB: seeded planes as literals (seed
    42 + 1000*t per table — the knn_label_agreement idiom, L times),
    zipped UNNEST for the (table, bucket) fan-out, windowed occupancy
    filter mirroring the engine's candidate-side max_bucket_size cap,
    Hamming-1 probes, LEAST/GREATEST pair canonicalization, and the
    exact cos6 verify on the threshold-sweep float chain. Defines CTEs
    v, lsh_b, lsh_c, lsh_p, cand, ver. The expensive CTEs are
    AS MATERIALIZED: DuckDB otherwise re-inlines the whole 36-projection
    pipeline into every consumer — catastrophic under the recursive
    connected-components closure, which joins the edge CTE per
    iteration (measured: the un-materialized semdedup_lsh oracle ran
    minutes; materialized, seconds)."""
    from ibis_flink_example_spark.operators.similarity import (
        random_hyperplanes,
    )

    def proj(p: list[float]) -> str:
        lit = "[" + ",".join(repr(x) for x in p) + "]"
        return (
            f"list_sum(list_transform(range(1, {dim}+1), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({lit})[i]))"
        )

    proj_cols = []
    bucket_exprs = []
    for t in range(n_tables):
        planes = random_hyperplanes(dim, n_planes, seed=42 + 1000 * t)
        for i, p in enumerate(planes):
            proj_cols.append(f"{proj(p)} AS pj_{t}_{i}")
        bits = " + ".join(
            f"(CASE WHEN pj_{t}_{i} >= 0 THEN {1 << i} ELSE 0 END)"
            for i in range(n_planes)
        )
        bucket_exprs.append(f"{bits} AS bk{t}")
    sep = ",\n    "
    proj_sql = sep.join(proj_cols)
    bucket_sql = sep.join(bucket_exprs)
    t_list = ", ".join(str(t) for t in range(n_tables))
    bk_list = ", ".join(f"bk{t}" for t in range(n_tables))
    probes = ", ".join(
        ["bkt"] + [f"xor(bkt, {1 << i})" for i in range(n_planes)]
    )
    cos6 = (
        "CAST(round(list_sum(list_transform(range(1, {d}+1),"
        " i -> {a}.vec[i] * {b}.vec[i])) / ({a}.nrm * {b}.nrm) * 1000000)"
        " AS BIGINT)"
    )
    ver_cos6 = cos6.format(d=dim, a="a", b="b")
    return f"""
v0 AS MATERIALIZED (
  SELECT vec_id, label,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec,
    sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))) AS nrm,
    {proj_sql}
  FROM embeddings
), v AS MATERIALIZED (
  SELECT vec_id, label, vec, nrm,
    {bucket_sql}
  FROM v0
), lsh_b AS (
  SELECT vec_id, UNNEST([{t_list}]) AS t, UNNEST([{bk_list}]) AS bkt FROM v
), lsh_c AS (
  -- candidate side mirrors the engine's max_bucket_size={cap} cap
  -- (drop_hot_keys per (table, bucket)); the probe side stays uncapped,
  -- as in the engine
  SELECT vec_id, t, bkt FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY t, bkt) AS bn FROM lsh_b
  ) WHERE bn <= {cap}
), lsh_p AS (
  SELECT vec_id AS qid, t, UNNEST([{probes}]) AS pb FROM lsh_b
), cand AS MATERIALIZED (
  SELECT DISTINCT LEAST(c.vec_id, p.qid) AS id_a,
                  GREATEST(c.vec_id, p.qid) AS id_b
  FROM lsh_c c JOIN lsh_p p
    ON c.t = p.t AND c.bkt = p.pb AND c.vec_id <> p.qid
), ver AS MATERIALIZED (
  SELECT s.id_a, s.id_b
  FROM cand s JOIN v a ON a.vec_id = s.id_a JOIN v b ON b.vec_id = s.id_b
  WHERE {ver_cos6} >= {thr_x1e6}
)"""


_SEMDEDUP_COS6_AB = (
    "CAST(round(list_sum(list_transform(range(1, 64+1),"
    " i -> a.vec[i] * b.vec[i])) / (a.nrm * b.nrm) * 1000000) AS BIGINT)"
)

"""North-star LLM-pipeline queries (SURVEY.md §2.11): dedup (exact, MinHash,
SimHash, n-gram Jaccard, embedding-cosine), similarity search (brute-force +
LSH), text analysis (lang-id, quality, tokens, fingerprints), multimodal
columns. Oracles where SQL-expressible; the approximate/stateful ones are
rows-only by design (NON_SQL_EXPRESSIBLE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ibis_flink_example_spark.catalog import load_table
from ibis_flink_example_spark.operators import chunking as CH
from ibis_flink_example_spark.operators import dedup as D
from ibis_flink_example_spark.operators import similarity as S
from ibis_flink_example_spark.operators import text as X
from ibis_flink_example_spark.operators import multimodal as M
from ibis_flink_example_spark.queries import query

# ---------------------------------------------------------------------------
# X1: exact dedup
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    oracle=r"""
SELECT doc_id, lang, source, n_chars
FROM (
  SELECT doc_id, lang, source, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY md5(lower(regexp_replace(trim(text), '[ \t\n\x0B\f\r]+', ' ', 'g')))
           ORDER BY doc_id
         ) AS rn
  FROM documents
)
WHERE rn = 1
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: normalized-content exact dedup, deterministic min-id survivor."""
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_dedup(docs, text_col="text", id_col="doc_id").select(
        "doc_id", "lang", "source", "n_chars"
    )


@query("dedup_minhash", oracle=None)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 MinHash+LSH near-dup dedup: shingle→minhash→band→bucket-join→
    connected components. Approximate by construction (no SQL oracle);
    deterministic output: (doc_id, component, is_representative)."""
    docs = load_table(spark, sf_dir, "documents")
    out = D.minhash_dedup(
        docs, id_col="doc_id", text_col="text", threshold=0.8, shingle_n=3
    )
    return out.select("doc_id", "component", "is_representative")


@query("dedup_simhash_pairs", oracle=None)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 SimHash near-dup candidates: 64-bit fingerprint, 16-bit chunk
    banding, hamming<=3 verification via bit_count(xor)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_neardup_pairs(docs, id_col="doc_id", text_col="text", max_hamming=3)


_NGRAM_JACCARD_ORACLE = r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS ws FROM documents
), sh0 AS (
  SELECT DISTINCT doc_id,
    UNNEST(list_transform(range(1, len(ws) - 1),
                          i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS shingle
  FROM w
), keepable AS (
  -- mirror the operator's document-frequency cap (max_doc_freq=50000):
  -- the Jaccard is DEFINED over the capped shingle space at every scale,
  -- so the oracle must cap identically (inert at oracle SFs)
  SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) <= 50000
), sh AS (
  SELECT sh0.* FROM sh0 JOIN keepable USING (shingle)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       n_common / (sa.n_shingles + sb.n_shingles - n_common) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE n_common / (sa.n_shingles + sb.n_shingles - n_common) >= 0.5
"""


@query("ngram_jaccard_pairs", oracle=_NGRAM_JACCARD_ORACLE)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 exact 3-gram Jaccard pairs (>=0.5) via shingle co-occurrence join
    — the exact counterpart the MinHash estimate approximates."""
    docs = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(
        docs, id_col="doc_id", text_col="text", n=3, threshold=0.5
    )


@query(
    "embedding_quantize",
    # floor(x/scale + 0.5) instead of round(): Spark and DuckDB disagree on
    # round()'s half-tie direction for negatives; floor(+0.5) is the same
    # exact IEEE operation in both engines.
    oracle=r"""
WITH b AS (
  SELECT vec_id, label,
    list_transform(embedding, v -> CAST(v AS DOUBLE)) AS xd
  FROM embeddings
), m AS (
  SELECT vec_id, label, xd,
    list_max(list_transform(xd, v -> abs(v))) AS max_abs
  FROM b
)
SELECT vec_id, label,
  sqrt(list_sum(list_transform(xd, v -> v * v))) AS l2_norm,
  max_abs / 127.0 AS scale,
  CASE WHEN max_abs = 0
    THEN array_to_string(list_transform(xd, v -> 0), ',')
    ELSE array_to_string(
      list_transform(xd, v -> CAST(floor(v / (max_abs / 127.0) + 0.5) AS INTEGER)), ',')
  END AS q_csv
FROM m
""",
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3-adjacent training-pipeline staple: symmetric per-vector int8
    quantization (scale = max|x|/127) + L2 norm, all map-only column math —
    the 4x storage/bandwidth cut applied before shipping embeddings to an
    ANN index or a training shard. Quantized values serialized with
    array_join (the external compare is scalar-typed); dequantization is
    q * scale."""
    from ibis_flink_example_spark.operators.similarity import l2_norm
    from ibis_flink_example_spark.operators.text import bind_col

    em = load_table(spark, sf_dir, "embeddings")
    # xd and max_abs are lambda-BOUND (bind_col): referenced directly
    # inside the quantize lambda, the interpreted HOF re-evaluated
    # scale — and through it the array_max pass — once PER ELEMENT
    # (O(dim^2) per row; r15, the repetition_features lesson). Two
    # outputs -> one struct, expanded in a second projection.
    xd0 = F.transform(F.col("embedding"), lambda v: v.cast("double"))

    def body(xdb: Column) -> Column:
        def inner(mab: Column) -> Column:
            scale = mab / F.lit(127.0)
            q = F.when(
                mab == 0, F.transform(xdb, lambda v: F.lit(0))
            ).otherwise(
                F.transform(
                    xdb,
                    lambda v: F.floor(v / scale + F.lit(0.5)).cast("int"),
                )
            )
            return F.struct(
                scale.alias("s"), F.array_join(q, ",").alias("qc")
            )

        return bind_col(F.array_max(F.transform(xdb, F.abs)), inner)

    return em.select(
        "vec_id",
        "label",
        l2_norm(F.col("embedding")).alias("l2_norm"),
        bind_col(xd0, body).alias("__m"),
    ).select(
        "vec_id",
        "label",
        "l2_norm",
        F.col("__m.s").alias("scale"),
        F.col("__m.qc").alias("q_csv"),
    )


# ---------------------------------------------------------------------------
# X3: similarity search
# ---------------------------------------------------------------------------

_QUERY_VEC_IDS = [0, 1, 2, 3, 4]

_TOPK_ORACLE = r"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id IN (0,1,2,3,4)
), scored AS (
  SELECT q.query_id, e.vec_id,
    list_sum(list_transform(range(1, len(e.embedding) + 1),
      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE)))
    / ( sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
      * sqrt(list_sum(list_transform(range(1, len(q.qvec) + 1),
          i -> CAST(q.qvec[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE)))) ) AS cos
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, ROUND(cos, 6) AS cosine, rank
FROM ranked WHERE rank <= 5
"""


@query("cosine_topk", oracle=_TOPK_ORACLE)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 exact brute-force cosine top-5 for 5 query vectors (broadcast
    queries x corpus scan; JVM-side dot products)."""
    em = load_table(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id").isin(_QUERY_VEC_IDS))
    out = S.cosine_topk(
        em, queries, id_col="vec_id", vec_col="embedding", query_id_col="vec_id", k=5
    )
    return out.select(
        "query_id", "vec_id", F.round(F.col("cosine"), 6).alias("cosine"), "rank"
    )


@query(
    "hard_negative_mining",
    # cosine_topk's oracle shape + the label-mismatch predicate; the dot
    # chain is the same strict left-to-right fold, ROUND(.,6) on output.
    oracle=r"""
WITH a AS (
  SELECT vec_id AS anchor_id, label AS anchor_label, embedding AS avec
  FROM embeddings WHERE vec_id IN (0,1,2,3,4)
), scored AS (
  SELECT a.anchor_id, a.anchor_label, e.vec_id, e.label AS neg_label,
    list_sum(list_transform(range(1, len(e.embedding) + 1),
      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(a.avec[i] AS DOUBLE)))
    / ( sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
      * sqrt(list_sum(list_transform(range(1, len(a.avec) + 1),
          i -> CAST(a.avec[i] AS DOUBLE) * CAST(a.avec[i] AS DOUBLE)))) ) AS cos
  FROM embeddings e CROSS JOIN a
  WHERE e.label <> a.anchor_label
), ranked AS (
  SELECT anchor_id, anchor_label, vec_id, neg_label, cos,
         ROW_NUMBER() OVER (PARTITION BY anchor_id
                            ORDER BY cos DESC, vec_id) AS rank
  FROM scored
)
SELECT anchor_id, anchor_label, vec_id, neg_label,
       ROUND(cos, 6) AS cosine, rank
FROM ranked WHERE rank <= 5
""",
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 training-feed staple: per-anchor hard negatives — the top-5
    most-cosine-similar embeddings with a DIFFERENT label
    (operators/similarity.py:hard_negative_mining), for the same 5 anchor
    vectors as cosine_topk. The contrastive-batch construction step: a
    random negative is trivially separable, the near-miss next to the
    boundary carries the gradient. Label filter lands in the scan stage;
    anchors broadcast; per-anchor window top-k."""
    em = load_table(spark, sf_dir, "embeddings")
    anchors = em.filter(F.col("vec_id").isin(_QUERY_VEC_IDS))
    out = S.hard_negative_mining(
        em, anchors, id_col="vec_id", vec_col="embedding", label_col="label", k=5
    )
    return out.select(
        "anchor_id",
        "anchor_label",
        "vec_id",
        "neg_label",
        F.round(F.col("cosine"), 6).alias("cosine"),
        "rank",
    )


def _lsh_topk_oracle(n_planes: int = 8, dim: int = 64, k: int = 5) -> str:
    """FULL value oracle for hyperplane LSH: the hyperplanes are seeded
    driver-side literals (random_hyperplanes, seed 42), so the whole
    algorithm — signature bits, bucket ids, Hamming-1 probes, in-bucket
    exact cosine + top-k — is reproducible in DuckDB with the planes
    embedded as list literals. Sign decisions are float-robust: a
    projection would need |dot| < ~1e-12 against O(1) magnitudes to flip a
    bucket between engines (verified exact at sf0.001/0.01/0.1)."""
    from ibis_flink_example_spark.operators.similarity import random_hyperplanes

    planes = random_hyperplanes(dim, n_planes, seed=42)

    def proj(vec: str, p: list[float]) -> str:
        lit = "[" + ",".join(repr(x) for x in p) + "]"
        return (
            f"list_sum(list_transform(range(1, {dim}+1), "
            f"i -> CAST({vec}[i] AS DOUBLE) * ({lit})[i]))"
        )

    proj_cols = ",\n    ".join(
        f"{proj('embedding', p)} AS pj{i}" for i, p in enumerate(planes)
    )
    bucket = " + ".join(
        f"(CASE WHEN pj{i} >= 0 THEN {1 << i} ELSE 0 END)" for i in range(n_planes)
    )
    probes = ", ".join(
        ["qbucket"] + [f"xor(qbucket, {1 << i})" for i in range(n_planes)]
    )
    cos = (
        "list_sum(list_transform(range(1, {d}+1),"
        " i -> CAST(e.embedding[i] AS DOUBLE) * CAST(p.qvec[i] AS DOUBLE)))"
        " / ( sqrt(list_sum(list_transform(range(1, {d}+1),"
        " i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))"
        " * sqrt(list_sum(list_transform(range(1, {d}+1),"
        " i -> CAST(p.qvec[i] AS DOUBLE) * CAST(p.qvec[i] AS DOUBLE)))) )"
    ).format(d=dim)
    return f"""
WITH c AS (
  SELECT vec_id, embedding,
    {proj_cols}
  FROM embeddings
), cb AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM c
), q AS (
  SELECT vec_id AS query_id, embedding AS qvec, bucket AS qbucket
  FROM cb WHERE vec_id IN (0,1,2,3,4)
), probes AS (
  SELECT query_id, qvec, UNNEST([{probes}]) AS pbucket FROM q
), scored AS (
  SELECT p.query_id, e.vec_id, {cos} AS cos
  FROM cb e JOIN probes p ON e.bucket = p.pbucket AND e.vec_id <> p.query_id
), ranked AS (
  SELECT query_id, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, ROUND(cos, 6) AS cosine, rank FROM ranked WHERE rank <= {k}
"""


def _knn_label_agreement_oracle(
    n_planes: int = 8, dim: int = 64, k: int = 5, cap: int = 50_000
) -> str:
    """Full replay of the LSH-bucketed kNN label-agreement: seeded
    hyperplanes as literals (the cosine_topk_lsh idiom), EVERY vector a
    query with Hamming-1 probes, exact in-bucket cosine top-k, then the
    per-label noise rollup. The engine's ``max_bucket_size`` hot-bucket
    cap (candidate side only — queries are never dropped) is MIRRORED
    via the windowed occupancy filter in ``cbc`` (ADVICE r12: a fixture
    that piles >cap vectors into one bucket must diverge in NEITHER or
    BOTH engines), keeping the repo's deterministic-caps-are-mirrored
    convention."""
    from ibis_flink_example_spark.operators.similarity import (
        random_hyperplanes,
    )

    planes = random_hyperplanes(dim, n_planes, seed=42)

    def proj(vec: str, p: list[float]) -> str:
        lit = "[" + ",".join(repr(x) for x in p) + "]"
        return (
            f"list_sum(list_transform(range(1, {dim}+1), "
            f"i -> CAST({vec}[i] AS DOUBLE) * ({lit})[i]))"
        )

    proj_cols = ",\n    ".join(
        f"{proj('embedding', p)} AS pj{i}" for i, p in enumerate(planes)
    )
    bucket = " + ".join(
        f"(CASE WHEN pj{i} >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(n_planes)
    )
    probes = ", ".join(
        ["qbucket"] + [f"xor(qbucket, {1 << i})" for i in range(n_planes)]
    )
    cos = (
        "list_sum(list_transform(range(1, {d}+1),"
        " i -> CAST(e.embedding[i] AS DOUBLE) * CAST(p.qvec[i] AS DOUBLE)))"
        " / ( sqrt(list_sum(list_transform(range(1, {d}+1),"
        " i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))"
        " * sqrt(list_sum(list_transform(range(1, {d}+1),"
        " i -> CAST(p.qvec[i] AS DOUBLE) * CAST(p.qvec[i] AS DOUBLE)))) )"
    ).format(d=dim)
    return f"""
WITH c AS (
  SELECT vec_id, label, embedding,
    {proj_cols}
  FROM embeddings
), cb AS (
  SELECT vec_id, label, embedding, {bucket} AS bucket FROM c
), cbc AS (
  -- candidate side mirrors the engine's max_bucket_size={cap} hot-bucket
  -- drop (drop_hot_keys); the query/probe side stays uncapped, as in the
  -- engine
  SELECT vec_id, label, embedding, bucket FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY bucket) AS bn FROM cb
  ) WHERE bn <= {cap}
), probes AS (
  SELECT vec_id AS query_id, label AS qlabel, embedding AS qvec,
         UNNEST([{probes}]) AS pbucket
  FROM (SELECT vec_id, label, embedding, bucket AS qbucket FROM cb)
), ranked AS (
  SELECT query_id, qlabel, nlabel, rnk FROM (
    SELECT p.query_id, p.qlabel, e.label AS nlabel,
      ROW_NUMBER() OVER (PARTITION BY p.query_id
                         ORDER BY {cos} DESC, e.vec_id) AS rnk
    FROM cbc e JOIN probes p
      ON e.bucket = p.pbucket AND e.vec_id <> p.query_id
  ) WHERE rnk <= {k}
), per_q AS (
  SELECT query_id, qlabel,
    CAST(COUNT(*) AS BIGINT) AS nbrs,
    CAST(SUM(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END) AS BIGINT) AS same
  FROM ranked GROUP BY 1, 2
)
SELECT l.label,
  CAST(COUNT(*) AS BIGINT) AS n_vectors,
  CAST(COUNT(p.query_id) AS BIGINT) AS n_with_neighbors,
  CAST(SUM(CASE WHEN p.query_id IS NOT NULL AND 2 * p.same < p.nbrs
            THEN 1 ELSE 0 END) AS BIGINT) AS n_suspect,
  CAST(CASE WHEN SUM(p.nbrs) IS NULL OR SUM(p.nbrs) = 0 THEN NULL
       ELSE SUM(p.same) * 1000000 // SUM(p.nbrs) END AS BIGINT)
    AS agreement_x1e6
FROM embeddings l LEFT JOIN per_q p ON p.query_id = l.vec_id
GROUP BY 1
"""


@query("knn_label_agreement", oracle=_knn_label_agreement_oracle())
def knn_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 label-noise audit at the corpus axis
    (operators/similarity.py:lsh_label_agreement): every vector's 5
    nearest LSH-bucket neighbors vote on its label; per label, how many
    vectors found neighbors, how many are strictly outvoted (suspected
    mislabels), and the pooled agreement rate. The per-vector
    complement of embedding_outliers_by_centroid (distance to own
    centroid misses a point sitting inside ANOTHER cluster; neighbor
    voting catches exactly that). Candidates come from a bucket-keyed
    equi SELF-join — every vector is a query, so nothing broadcasts;
    the seeded hyperplanes make the whole pipeline replayable in SQL
    (the cosine_topk_lsh idiom) and the hot-bucket cap guards
    degenerate piles."""
    em = load_table(spark, sf_dir, "embeddings")
    return S.lsh_label_agreement(
        em,
        id_col="vec_id",
        vec_col="embedding",
        label_col="label",
        k=5,
        dim=64,
        n_planes=8,
        probe_hamming=1,
    )


@query("cosine_topk_lsh", oracle=_lsh_topk_oracle())
def cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 approximate top-k via random-hyperplane LSH buckets (the scale
    path: each query probes its bucket plus the n_planes Hamming-1
    neighbors instead of the full corpus). Carries a FULL value oracle —
    the seeded hyperplanes make the bucketing reproducible engine-side
    (see _lsh_topk_oracle); was rows-only before round 5."""
    em = load_table(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id").isin(_QUERY_VEC_IDS))
    out = S.lsh_topk(
        em,
        queries,
        id_col="vec_id",
        vec_col="embedding",
        query_id_col="vec_id",
        k=5,
        dim=64,
        n_planes=8,
        probe_hamming=1,
    )
    return out.select(
        "query_id", "vec_id", F.round(F.col("cosine"), 6).alias("cosine"), "rank"
    )


# Pinned IVF top-k results per fixture, keyed by a CONTENT fingerprint of
# the embeddings table (vec_id + first component, fixed-point — the
# vec_id-only fingerprint collides between sf0.001 and sf0.01, which share
# ids but not vectors). The IVF path is fully deterministic: seeded kmeans
# init, seeded fit sample, ties broken by vec_id — measured identical
# across repeated runs (r8), so the exact output is pinnable per fixture,
# the same idiom as hll_daily_users_merge's merged estimate. Any change to
# centroid training, list assignment, or probing flips the driver hash.
_IVF_TOPK_PINS: dict[str, tuple[tuple[int, int, str, int], ...]] = {
    "b4c9bdf2": (  # sf0.001
        (0, 17, "0.334456", 1), (0, 225, "0.315127", 2),
        (0, 483, "0.300451", 3), (0, 260, "0.298669", 4),
        (0, 212, "0.281399", 5), (1, 257, "0.391762", 1),
        (1, 209, "0.381544", 2), (1, 129, "0.351480", 3),
        (1, 440, "0.299303", 4), (1, 479, "0.268921", 5),
        (2, 183, "0.250606", 1), (2, 132, "0.246669", 2),
        (2, 24, "0.230190", 3), (2, 378, "0.222895", 4),
        (2, 94, "0.219036", 5), (3, 223, "0.340915", 1),
        (3, 205, "0.336595", 2), (3, 84, "0.319664", 3),
        (3, 426, "0.315098", 4), (3, 72, "0.308943", 5),
        (4, 345, "0.374941", 1), (4, 98, "0.339767", 2),
        (4, 343, "0.312433", 3), (4, 57, "0.298747", 4),
        (4, 229, "0.267757", 5),
    ),
    "69955520": (  # sf0.01
        (0, 334, "0.362722", 1), (0, 387, "0.331139", 2),
        (0, 423, "0.296934", 3), (0, 73, "0.295434", 4),
        (0, 7, "0.292842", 5), (1, 386, "0.371485", 1),
        (1, 407, "0.327010", 2), (1, 195, "0.322744", 3),
        (1, 64, "0.316374", 4), (1, 402, "0.292322", 5),
        (2, 450, "0.266344", 1), (2, 145, "0.263494", 2),
        (2, 188, "0.263272", 3), (2, 320, "0.255043", 4),
        (2, 350, "0.240069", 5), (3, 343, "0.308472", 1),
        (3, 174, "0.303548", 2), (3, 207, "0.291702", 3),
        (3, 192, "0.290803", 4), (3, 474, "0.276738", 5),
        (4, 114, "0.398513", 1), (4, 408, "0.322753", 2),
        (4, 482, "0.313897", 3), (4, 280, "0.279826", 4),
        (4, 249, "0.279631", 5),
    ),
    "fdcf0720": (  # sf0.1
        (0, 1204, "0.406472", 1), (0, 291, "0.391932", 2),
        (0, 510, "0.344458", 3), (0, 1511, "0.328782", 4),
        (0, 144, "0.324319", 5), (1, 1950, "0.386131", 1),
        (1, 1175, "0.370337", 2), (1, 260, "0.346660", 3),
        (1, 1843, "0.339907", 4), (1, 665, "0.306598", 5),
        (2, 953, "0.369105", 1), (2, 1053, "0.356047", 2),
        (2, 1912, "0.351913", 3), (2, 990, "0.333658", 4),
        (2, 1196, "0.316817", 5), (3, 1701, "0.388037", 1),
        (3, 859, "0.362761", 2), (3, 1542, "0.324235", 3),
        (3, 650, "0.315743", 4), (3, 1617, "0.302820", 5),
        (4, 524, "0.419052", 1), (4, 76, "0.359507", 2),
        (4, 995, "0.358859", 3), (4, 1653, "0.337268", 4),
        (4, 825, "0.336715", 5),
    ),
}


def _ivf_topk_oracle() -> str:
    """Pinned-result oracle for the IVF top-k: VALUES rows keyed by the
    embeddings content fingerprint (an unknown fixture matches no pin →
    zero rows → row-count mismatch → detected, never silently green)."""
    rows = ",\n  ".join(
        f"('{f}', {q}, {v}, CAST({c} AS DOUBLE), {r})"
        for f, pins in sorted(_IVF_TOPK_PINS.items())
        for q, v, c, r in pins
    )
    return f"""
WITH fp AS (
  SELECT substr(md5(string_agg(CAST(vec_id AS VARCHAR) || ':' ||
    CAST(CAST(floor(embedding[1]*1000000) AS BIGINT) AS VARCHAR),
    ',' ORDER BY vec_id)), 1, 8) AS f
  FROM embeddings
),
v(f, query_id, vec_id, cosine, rank) AS (VALUES
  {rows})
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(vec_id AS BIGINT) AS vec_id,
       CAST(cosine AS DOUBLE) AS cosine,
       CAST(rank AS INTEGER) AS rank
FROM v JOIN fp ON v.f = fp.f
"""


@query("cosine_topk_ivf", oracle=_ivf_topk_oracle())
def cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 approximate top-k via IVF coarse quantization (kmeans inverted
    lists, n_probe nearest lists per query) — the data-adaptive scale path
    next to the hyperplane LSH variant. Kmeans is seeded and ties are
    vec_id-broken, so the output is deterministic per fixture and the
    oracle pins the measured result rows keyed by a content fingerprint
    (was rows-only through r7)."""
    em = load_table(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id").isin(_QUERY_VEC_IDS))
    out = S.ivf_topk(
        em,
        queries,
        id_col="vec_id",
        vec_col="embedding",
        query_id_col="vec_id",
        k=5,
        n_lists=16,
        n_probe=4,
        # centroid quality saturates fast on random-ish embeddings: train on
        # a 30% sample, 5 Lloyd iterations — the assign/probe path (the part
        # that scales with corpus size) is unchanged
        fit_fraction=0.3,
        max_iter=5,
    )
    return out.select(
        "query_id", "vec_id", F.round(F.col("cosine"), 6).alias("cosine"), "rank"
    )


def _qa_sample(df: DataFrame, id_col: str, sample_fraction: float | None, seed: int) -> DataFrame:
    """Seeded deterministic subsample for estimator-QA queries: keep rows
    whose xxhash64(id, seed) falls under the fraction threshold — a
    map-only filter, reproducible across runs/partitionings (unlike
    ``DataFrame.sample``, whose output depends on partition layout). At
    100 TB the exact legs of the QA companions run on this bounded sample
    instead of the full corpus; ``None`` keeps the full input."""
    if sample_fraction is None or sample_fraction >= 1.0:
        return df
    # 1e12 modulus + round-half-up + floor-at-1: an int(frac * 1e6)
    # threshold truncates to 0 for fractions under 1e-6 — exactly the
    # >1e11-row regime the row-count guard produces — which would silently
    # EMPTY the exact leg (and 0/0 the recall ratio). With 1e12 the
    # threshold resolves fractions down to 1e-12 (~1e17 input rows) and
    # never goes below one part-per-modulus.
    modulus = 1_000_000_000_000
    thr = max(1, int(sample_fraction * modulus + 0.5))
    return df.filter(
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(modulus)) < thr
    )


# Registered QA companions bound their exact legs above this input size:
# below it the corpus runs unsampled (fixtures stay deterministic and the
# per-fixture oracle pins stay valid), above it the exact leg runs on a
# seeded hash-sample of ~this many rows. parquet count() is metadata-only,
# so the guard costs no data scan.
QA_EXACT_LEG_MAX_ROWS = 100_000


def _qa_guard_fraction(df: DataFrame, max_rows: int = QA_EXACT_LEG_MAX_ROWS) -> float | None:
    """Row-count-triggered bounding for estimator-QA exact legs: returns
    ``None`` (unsampled) when the input is at-or-under ``max_rows``, else
    the fraction that targets ~``max_rows`` sampled rows. Deterministic for
    a given input (fraction is a pure function of the count; the sampling
    itself is a seeded hash threshold), so registered driver queries stay
    hash-stable per fixture while never running an unbounded exact
    all-pairs/brute-force leg at scale (VERDICT r6 'What's wrong' #1)."""
    n = df.count()
    if n <= max_rows:
        return None
    return max_rows / n


def ann_recall_ivf_impl(
    em: DataFrame, sample_fraction: float | None = None, seed: int = 7
) -> DataFrame:
    """Recall@5 of the IVF path vs exact brute-force top-5 over the (maybe
    sampled) corpus; both legs see the SAME sample so the ratio stays an
    unbiased estimate of retrieval quality on that subcorpus. Query vectors
    are never sampled out (they are the probe set, not the corpus)."""
    corpus = _qa_sample(em, "vec_id", sample_fraction, seed)
    queries = em.filter(F.col("vec_id").isin(_QUERY_VEC_IDS))
    kw = dict(id_col="vec_id", vec_col="embedding", query_id_col="vec_id", k=5)
    exact = S.cosine_topk(corpus, queries, **kw).select("query_id", "vec_id")
    approx = S.ivf_topk(
        corpus, queries, n_lists=16, n_probe=4, fit_fraction=0.3, max_iter=5, **kw
    ).select("query_id", "vec_id")
    hits = approx.join(exact, ["query_id", "vec_id"], "inner").agg(
        F.count(F.lit(1)).alias("__n_hits")
    )
    base = exact.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("__n_exact"),
    )
    return base.crossJoin(hits).select(
        "n_queries",
        F.lit(5).alias("k"),
        (F.col("__n_hits") / F.col("__n_exact") >= 0.5).alias("recall_ge_half"),
        F.floor(F.col("__n_hits") / F.col("__n_exact") * 1_000_000 + 0.5)
        .cast("bigint")
        .alias("recall_x1e6"),
    )


@query(
    "ann_recall_ivf",
    # The IVF index is built from a seeded, deterministic k-means on the
    # corpus — not reproducible in SQL (the centroids depend on the data),
    # so the oracle verifies STATEMENTS about the approximate path:
    # recall@5 against the exact brute-force baseline clears a fixed floor
    # (boolean), AND equals the measured per-fixture value (recall_x1e6 —
    # the Spark side computes it from data; the oracle pins the known
    # value per fixture, keyed by an order-independent md5 fingerprint of
    # the label sequence, so ANY recall drift flips the driver hash).
    oracle="""
WITH fp AS (
  SELECT substr(md5(string_agg(CAST(label AS VARCHAR), ',' ORDER BY vec_id)), 1, 8) AS f
  FROM embeddings
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, 5 AS k, TRUE AS recall_ge_half,
       (SELECT CASE f WHEN '7dbac953' THEN CAST(640000 AS BIGINT)  -- sf0.001
                      WHEN 'e56ef39f' THEN CAST(720000 AS BIGINT)  -- sf0.01
                      WHEN 'efe059b5' THEN CAST(680000 AS BIGINT)  -- sf0.1
        END FROM fp) AS recall_x1e6
FROM embeddings WHERE vec_id IN (0,1,2,3,4)
""",
)
def ann_recall_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 companion: deterministic recall@5 of the IVF path vs the exact
    brute-force top-5, emitted as hash-matchable scalars (boolean floor +
    measured fixed-point recall) — the driver-visible quality bound for an
    estimator that cannot carry a per-row SQL oracle. The registered entry
    is scale-safe as-is: above QA_EXACT_LEG_MAX_ROWS the exact brute-force
    leg runs on a seeded hash-sample (row-count guard, metadata-only
    count); at the fixtures it stays unsampled so the pinned oracle values
    hold."""
    em = load_table(spark, sf_dir, "embeddings")
    return ann_recall_ivf_impl(em, sample_fraction=_qa_guard_fraction(em))


def minhash_vs_exact_pairs_impl(
    docs: DataFrame, sample_fraction: float | None = None, seed: int = 11
) -> DataFrame:
    """Retrieval quality (recall/precision at est_jaccard >= 0.5) of the
    MinHash+LSH candidate pairs against exact n-gram Jaccard over the same
    (maybe sampled) corpus — both legs see the identical sample, so the
    ratios estimate the full-corpus quality. At 100 TB the exact all-pairs
    leg MUST be bounded: pass ``sample_fraction`` to run the probe on a
    seeded subcorpus (a quality probe, not a pipeline stage)."""
    docs = _qa_sample(docs, "doc_id", sample_fraction, seed)
    est = D.minhash_lsh_candidates(
        docs, id_col="doc_id", text_col="text", shingle_n=3
    ).filter(F.col("est_jaccard") >= 0.5).select("id_a", "id_b")
    exact = D.ngram_jaccard_pairs(
        docs, id_col="doc_id", text_col="text", n=3, threshold=0.5
    ).select("id_a", "id_b")
    inter = est.join(exact, ["id_a", "id_b"], "inner").agg(
        F.count(F.lit(1)).alias("__n_inter")
    )
    n_ex = exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    n_est = est.agg(F.count(F.lit(1)).alias("__n_est"))
    fixed = lambda num, den: (  # noqa: E731 - local fixed-point idiom
        F.floor(num / den * 1_000_000 + 0.5).cast("bigint")
    )
    return (
        n_ex.crossJoin(n_est)
        .crossJoin(inter)
        .select(
            "n_exact_pairs",
            (F.col("__n_inter") / F.col("n_exact_pairs") >= 0.9).alias(
                "recall_ge_90pct"
            ),
            (F.col("__n_inter") / F.col("__n_est") >= 0.9).alias(
                "precision_ge_90pct"
            ),
            fixed(F.col("__n_inter"), F.col("n_exact_pairs")).alias("recall_x1e6"),
            fixed(F.col("__n_inter"), F.col("__n_est")).alias("precision_x1e6"),
        )
    )


@query(
    "minhash_vs_exact_pairs",
    # Ground truth = the exact n-gram Jaccard pairs (same shingle universe
    # as the MinHash signatures), whose pair count IS SQL-computable; the
    # estimator's retrieval quality against it is pinned BOTH as floors
    # and as measured fixed-point values (recall = precision = 1.0 at
    # sf0.001/0.01/0.1 — the banded LSH + 64-hash estimate loses nothing
    # at a 0.5 threshold on these fixtures — so the literals are
    # 1000000; any quality drift flips the driver hash).
    oracle=f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
       TRUE AS recall_ge_90pct, TRUE AS precision_ge_90pct,
       CAST(1000000 AS BIGINT) AS recall_x1e6,
       CAST(1000000 AS BIGINT) AS precision_x1e6
FROM ({_NGRAM_JACCARD_ORACLE})
""",
)
def minhash_vs_exact_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 companion: retrieval quality of the MinHash+LSH candidate pairs
    (est_jaccard >= 0.5) against the EXACT n-gram Jaccard pairs at the same
    threshold, as driver-hashable scalars (floors + measured fixed-point
    values) — closes the 'estimators are rows-only forever' gap without
    pretending the estimate is exact. Scale-safe as registered: the exact
    all-pairs leg is bounded by the QA_EXACT_LEG_MAX_ROWS row-count guard
    (seeded hash-sample above it, unsampled at the fixtures so the pinned
    1.0 recall/precision oracle values hold)."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_vs_exact_pairs_impl(docs, sample_fraction=_qa_guard_fraction(docs))


def _with_planted_dups(docs: DataFrame) -> DataFrame:
    """The planted-duplicate corpus shared by the dedup QA queries: every
    doc with doc_id % 50 == 0 re-added verbatim under doc_id + 1000000
    (mirrored exactly in the SQL oracles). One definition so the estimator
    floor and its reporting companion can never drift apart."""
    docs = docs.select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    return docs.unionByName(planted)


@query(
    "simhash_exact_dup_coverage",
    # SimHash itself hashes with xxhash64 (no DuckDB equivalent), so its
    # pair list can't carry a per-row SQL oracle — but its COVERAGE
    # INVARIANT can: any two docs with identical raw text have identical
    # fingerprints, share all four 16-bit chunks, and MUST surface as a
    # candidate pair with hamming = 0. Duplicates are PLANTED (every doc
    # with doc_id % 50 == 0 is re-added under doc_id + 1000000, mirrored
    # exactly in SQL), so the invariant is exercised on a known non-empty
    # pair set and the count comes from the data.
    oracle="""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_dup_pairs,
       TRUE AS all_exact_dups_found
FROM aug a JOIN aug b ON a.text = b.text AND a.doc_id < b.doc_id
""",
)
def simhash_exact_dup_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 companion: SimHash candidate generation must find EVERY exact
    duplicate at hamming 0 (pigeonhole guarantee), checked against the
    SQL-computable identical-text pair set over a planted-duplicate
    corpus — the driver-hashable floor under the rows-only estimator."""
    aug = _with_planted_dups(load_table(spark, sf_dir, "documents"))
    zero = (
        # UNCAPPED probe: the pigeonhole coverage guarantee holds for the
        # uncapped operator; the production bucket cap deliberately
        # sacrifices mega-clusters (> cap identical docs), so asserting
        # TRUE against a capped run would be wrong at scale. The cap's
        # bounding behavior is verified separately
        # (test_hot_bucket_caps_bound_pair_generation).
        D.simhash_neardup_pairs(
            aug,
            id_col="doc_id",
            text_col="text",
            max_hamming=3,
            max_bucket_size=None,
        )
        .filter(F.col("hamming") == 0)
        .select("id_a", "id_b")
    )
    a, b = aug.alias("a"), aug.alias("b")
    exact = a.join(
        b,
        (F.col("a.text") == F.col("b.text"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    missing = exact.join(zero, ["id_a", "id_b"], "left_anti").agg(
        F.count(F.lit(1)).alias("__n_missing")
    )
    n_ex = exact.agg(F.count(F.lit(1)).alias("n_exact_dup_pairs"))
    return n_ex.crossJoin(missing).select(
        "n_exact_dup_pairs",
        (F.col("__n_missing") == 0).alias("all_exact_dups_found"),
    )


# Mirrors the Spark implementation's normalize-then-dot structure (one fold
# per pair) so the float op sequence — and thus every bit — matches.
_NEARDUP_ORACLE = r"""
WITH n AS (
  SELECT vec_id, label,
    list_transform(embedding, x -> CAST(x AS DOUBLE) /
      sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))
    ) AS nvec
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  ROUND(list_sum(list_transform(range(1, len(a.nvec) + 1), i -> a.nvec[i] * b.nvec[i])), 6) AS cosine
FROM n a
JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_sum(list_transform(range(1, len(a.nvec) + 1), i -> a.nvec[i] * b.nvec[i])) >= 0.35
"""


@query("embedding_neardup_pairs", oracle=_NEARDUP_ORACLE)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X3 embedding-cosine near-dup pairs with same-label blocking (at
    scale the block key becomes the LSH bucket)."""
    em = load_table(spark, sf_dir, "embeddings")
    out = S.embedding_neardup_pairs(
        em, id_col="vec_id", vec_col="embedding", block_col="label", threshold=0.35
    )
    return out.select("id_a", "id_b", F.round(F.col("cosine"), 6).alias("cosine"))


# ---------------------------------------------------------------------------
# X4: text analysis
# ---------------------------------------------------------------------------


@query(
    "text_token_count",
    oracle=r"""
SELECT doc_id,
  len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) AS n_ws_tokens,
  len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]')) AS n_regex_tokens
FROM documents
""",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        X.token_count_whitespace("text").alias("n_ws_tokens"),
        X.token_count_regex("text").alias("n_regex_tokens"),
    )


@query(
    "text_quality",
    oracle=r"""
WITH f AS (
  SELECT doc_id,
    length(text) AS n_chars_measured,
    len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) AS n_words,
    len(regexp_extract_all(text, '[^\w \t\n\x0B\f\r]')) AS n_punct,
    len(list_filter(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+'),
        w -> list_contains(['a','and','das','de','der','die','el','en','est','et','ein','in','is','ist','la','le','les','los','nicht','of','que','the','to','und','une','y'], lower(w)))) AS n_stopwords
  FROM documents
)
SELECT doc_id, n_chars_measured, n_words, n_punct, n_stopwords,
  ROUND(n_punct / GREATEST(n_chars_measured, 1), 6) AS punct_ratio,
  ROUND(n_stopwords / GREATEST(n_words, 1), 6) AS stopword_ratio,
  ROUND((n_chars_measured - (n_words - 1)) / n_words, 6) AS mean_word_len,
  ROUND(
    CASE WHEN n_chars_measured BETWEEN 50 AND 20000 THEN 0.4 ELSE 0 END
    + CASE WHEN (n_chars_measured - (n_words - 1)) / n_words BETWEEN 2.0 AND 12.0 THEN 0.2 ELSE 0 END
    + CASE WHEN n_punct / GREATEST(n_chars_measured, 1) <= 0.2 THEN 0.2 ELSE 0 END
    + CASE WHEN n_stopwords / GREATEST(n_words, 1) >= 0.01 THEN 0.2 ELSE 0 END
  , 6) AS quality_score
FROM f
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 heuristic quality features + composite score (Gopher/C4-style
    filter stack as pure columns)."""
    docs = load_table(spark, sf_dir, "documents")
    return X.quality_features(docs, "text", "doc_id")


@query(
    "gopher_quality_flags",
    oracle=r"""
WITH f AS (
  SELECT doc_id,
    regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS ws,
    string_split(text, chr(10)) AS lines,
    CAST(len(regexp_extract_all(text, '#|\.\.\.|…')) AS BIGINT) AS symbol_hits
  FROM documents
), g AS (
  SELECT doc_id, symbol_hits,
    CAST(len(ws) AS BIGINT) AS n_words,
    CAST(coalesce(list_sum(list_transform(ws, w -> length(w))), 0) AS BIGINT)
      AS word_chars,
    CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT)
      AS n_alpha_words,
    CAST(len(list_intersect(
      list_distinct(list_transform(ws, w -> lower(w))),
      ['the','be','to','of','and','that','have','with'])) AS BIGINT)
      AS req_word_kinds,
    CAST(len(lines) AS BIGINT) AS n_lines,
    CAST(len(list_filter(lines,
      l -> substr(ltrim(l), 1, 1) IN ('•','-','*'))) AS BIGINT) AS bullet_lines,
    CAST(len(list_filter(lines,
      l -> ends_with(rtrim(l), '...') OR ends_with(rtrim(l), '…'))) AS BIGINT)
      AS ellipsis_lines
  FROM f
)
SELECT doc_id, n_words, word_chars, n_alpha_words, req_word_kinds, symbol_hits,
  n_lines, bullet_lines, ellipsis_lines,
  (n_words BETWEEN 50 AND 100000) AS pass_word_count,
  (word_chars BETWEEN 3 * n_words AND 10 * n_words) AS pass_mean_word_len,
  (10 * symbol_hits <= n_words) AS pass_symbol_ratio,
  (5 * n_alpha_words >= 4 * n_words) AS pass_alpha_frac,
  (req_word_kinds >= 2) AS pass_req_words,
  (10 * bullet_lines < 9 * n_lines AND 10 * ellipsis_lines < 3 * n_lines)
    AS pass_lines,
  ((n_words BETWEEN 50 AND 100000)
   AND (word_chars BETWEEN 3 * n_words AND 10 * n_words)
   AND (10 * symbol_hits <= n_words)
   AND (5 * n_alpha_words >= 4 * n_words)
   AND (req_word_kinds >= 2)
   AND (10 * bullet_lines < 9 * n_lines AND 10 * ellipsis_lines < 3 * n_lines))
    AS pass_gopher
FROM g
""",
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: the published Gopher quality-rule stack (Rae et al. 2021 A1.1)
    as per-document keep/drop flags — word-count band, mean-word-length
    band, symbol ratio, alphabetic-word fraction, required-word presence,
    bullet/ellipsis line ratios (operators/text.py:gopher_flags). Every
    threshold is an integer cross-multiplication, so the FLAGS themselves
    (not just the counts) are engine-exact; map-only, zero shuffles —
    the pure scan-stage filter pass a 100 TB curation run starts with.
    Complements text_quality (the soft composite score) with the paper's
    hard rules."""
    docs = load_table(spark, sf_dir, "documents")
    return X.gopher_flags(docs, "text", "doc_id")


@query(
    "text_lang_id",
    oracle=r"""
WITH w AS (
  SELECT doc_id, lang AS labeled_lang,
         list_transform(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+'), w -> lower(w)) AS ws
  FROM documents
), scores AS (
  SELECT doc_id, labeled_lang,
    len(list_filter(ws, w -> list_contains(['the','of','and','to','in','is','a'], w))) AS s_en,
    len(list_filter(ws, w -> list_contains(['el','la','de','que','y','en','los'], w))) AS s_es,
    len(list_filter(ws, w -> list_contains(['der','die','und','das','ist','nicht','ein'], w))) AS s_de,
    len(list_filter(ws, w -> list_contains(['le','la','les','de','et','est','une'], w))) AS s_fr
  FROM w
)
SELECT doc_id, labeled_lang,
  CASE
    WHEN GREATEST(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
    WHEN s_en = GREATEST(s_en, s_es, s_de, s_fr) THEN 'en'
    WHEN s_es = GREATEST(s_en, s_es, s_de, s_fr) THEN 'es'
    WHEN s_de = GREATEST(s_en, s_es, s_de, s_fr) THEN 'de'
    ELSE 'fr'
  END AS predicted_lang
FROM scores
""",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 marker-lexicon language ID (deterministic argmax, declaration-order
    tie-break) alongside the labeled lang for accuracy eyeballing."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        X.lang_id("text").alias("predicted_lang"),
    )


@query(
    "text_fingerprint",
    oracle=r"""
SELECT doc_id,
  md5(lower(regexp_replace(trim(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS fingerprint
FROM documents
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 deterministic md5 fingerprint of normalized text — identical hex
    in Spark and DuckDB, so the oracle checks the bytes themselves."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", X.fingerprint("text").alias("fingerprint"))


@query(
    "text_repetition",
    oracle=r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS ws FROM documents
), base AS (
  SELECT doc_id, ws, len(ws) AS n_words, len(list_distinct(ws)) AS n_distinct
  FROM w
), grams AS (
  SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS g
  FROM base, UNNEST(range(1, n_words)) AS t(i)
  WHERE n_words >= 2
), gc AS (
  SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY 1, 2
), top AS (
  SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_2gram_frac
  FROM gc GROUP BY 1
)
SELECT b.doc_id, b.n_words,
  1.0 - CAST(n_distinct AS DOUBLE) / n_words AS dup_word_frac,
  top.top_2gram_frac
FROM base b LEFT JOIN top USING (doc_id)
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 repetition filters (the Gopher stack's boilerplate detectors):
    duplicate-word fraction + most-frequent-bigram fraction, computed
    shuffle-FREE via in-row sort + one aggregate() pass over each doc's
    bigram array (operators/text.py:repetition_features). The oracle takes
    the classic explode+GROUP BY route — two roads, same numbers."""
    from ibis_flink_example_spark.catalog import fan_out

    # fan_out: the in-row bigram sort+scan is CPU-bound HOF work; widen the
    # single-split fixture scan (no-op at scale).
    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return X.repetition_features(docs, "text", "doc_id")


@query(
    "text_winnow_sketch",
    oracle=r"""
WITH s AS (
  SELECT doc_id,
    regexp_split_to_array(lower(regexp_replace(trim(text), '[ \t\n\x0B\f\r]+', ' ', 'g')), ' ') AS ws
  FROM documents
), g AS (
  SELECT doc_id,
    CASE WHEN len(ws) >= 4 THEN
      list_transform(range(1, len(ws) - 4 + 2),
        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])
    ELSE [array_to_string(ws, ' ')] END AS shingles
  FROM s
), h AS (
  SELECT doc_id,
    list_sort(list_transform(shingles, sh -> md5(sh))) AS hs
  FROM g
)
SELECT doc_id, array_to_string(hs[1:4], ',') AS sketch FROM h
""",
)
def text_winnow_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 robust document fingerprint (winnowing-style min-k sketch): the 4
    smallest shingle hashes over overlapping word 4-grams — stable under
    small edits, unlike the exact md5 fingerprint. Word-unit shingles put
    the per-doc hash count at ~|words| instead of ~|chars| (a 40x scan-cost
    difference measured at sf0.1) while keeping the content-defined
    insertion robustness. Uses the engine-portable md5 variant so the
    sketch BYTES are oracle-checked; char-unit + xxhash64 is the same
    operator's finest-granularity path
    (operators/text.py:rolling_shingle_fingerprints). Serialized with
    array_join (the external compare is scalar-typed)."""
    from ibis_flink_example_spark.catalog import fan_out

    # fan_out: per-row shingling+hashing is CPU-bound higher-order-function
    # work; a single-row-group fixture file would otherwise run it on one
    # core (no-op at scale where the scan already has many splits).
    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return docs.select(
        "doc_id",
        F.array_join(
            X.rolling_shingle_fingerprints(
                "text", n=4, keep=4, hash_fn="md5", unit="word"
            ),
            ",",
        ).alias("sketch"),
    )


@query(
    "text_pii_redact",
    # PII is PLANTED deterministically (docs with doc_id % 3 == 0 get an
    # email + phone + IPv4 appended) so redaction is exercised on a known
    # mix of clean and dirty rows; patterns live in a Java-regex/RE2-common
    # dialect so both engines redact byte-identically (md5-checked).
    oracle=r"""
WITH aug AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0 THEN
      text || ' reach user' || CAST(doc_id AS VARCHAR)
           || '@example.com or +1-555-'
           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
    ELSE text END AS t
  FROM documents
)
SELECT doc_id,
  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
  len(regexp_extract_all(t, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS n_phone,
  len(regexp_extract_all(t, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS n_ipv4,
  md5(regexp_replace(regexp_replace(regexp_replace(t,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
    '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g')) AS redacted_fp
FROM aug
""",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 curation stage: PII redaction (email/phone/IPv4 → typed tokens)
    as a pure regexp_replace chain fused into the scan — map-only, no
    Python, no shuffle; per-kind match counts ride along. The redacted
    text is md5-fingerprinted so the oracle checks the exact bytes."""
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" reach user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or +1-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                F.lit(" from 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".7"),
            ),
        ).otherwise(F.col("text")).alias("t"),
    )
    counts = X.pii_counts("t")
    return aug.select(
        "doc_id",
        *[c.alias(name) for name, c in counts.items()],
        F.md5(X.redact_pii("t").cast("binary")).alias("redacted_fp"),
    )


@query(
    "decontaminate_ngram",
    # Fixture split: doc_id % 97 == 0 plays the held-out eval set.
    oracle=r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS ws FROM documents
), g AS (
  SELECT doc_id,
    CASE WHEN len(ws) >= 13 THEN
      list_transform(range(1, len(ws) - 13 + 2),
                     i -> array_to_string(ws[i:i+12], ' '))
    ELSE [array_to_string(ws, ' ')] END AS gs
  FROM w
), ev AS (
  SELECT DISTINCT UNNEST(gs) AS gram FROM g WHERE doc_id % 97 = 0
), tr AS (
  SELECT doc_id, UNNEST(gs) AS gram FROM g WHERE doc_id % 97 <> 0
), hit AS (
  SELECT DISTINCT tr.doc_id FROM tr JOIN ev USING (gram)
)
SELECT w.doc_id, (hit.doc_id IS NOT NULL) AS contaminated
FROM w LEFT JOIN hit ON w.doc_id = hit.doc_id
WHERE w.doc_id % 97 <> 0
""",
)
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination via operators/text.py:
    decontaminate_ngram_overlap — broadcast semi-join probe with a guarded
    fallback to a shuffle semi-join when the eval gram set outgrows the
    broadcast budget (the 100 TB safety valve; see the operator docstring).
    Short docs degrade to whole-text grams (mirrored in the oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 97 == 0
    return X.decontaminate_ngram_overlap(
        docs.filter(~is_eval),
        docs.filter(is_eval),
        id_col="doc_id",
        text_col="text",
        n=13,
    )


@query(
    "curation_pipeline",
    oracle=r"""
WITH f AS (
  SELECT doc_id, lang, text,
    length(text) AS n_chars_measured,
    len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) AS n_words,
    len(regexp_extract_all(text, '[^\w \t\n\x0B\f\r]')) AS n_punct,
    len(list_filter(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+'),
        w -> list_contains(['a','and','das','de','der','die','el','en','est','et','ein','in','is','ist','la','le','les','los','nicht','of','que','the','to','und','une','y'], lower(w)))) AS n_stopwords
  FROM documents
), scored AS (
  SELECT doc_id, lang, text,
    ROUND(
      CASE WHEN n_chars_measured BETWEEN 50 AND 20000 THEN 0.4 ELSE 0 END
      + CASE WHEN (n_chars_measured - (n_words - 1)) / n_words BETWEEN 2.0 AND 12.0 THEN 0.2 ELSE 0 END
      + CASE WHEN n_punct / GREATEST(n_chars_measured, 1) <= 0.2 THEN 0.2 ELSE 0 END
      + CASE WHEN n_stopwords / GREATEST(n_words, 1) >= 0.01 THEN 0.2 ELSE 0 END
    , 6) AS quality_score
  FROM f
), kept AS (
  SELECT * FROM scored WHERE quality_score >= 0.5
), deduped AS (
  SELECT doc_id, lang, quality_score,
         ROW_NUMBER() OVER (
           PARTITION BY md5(lower(regexp_replace(trim(text), '[ \t\n\x0B\f\r]+', ' ', 'g')))
           ORDER BY doc_id
         ) AS rn
  FROM kept
)
SELECT doc_id, lang, quality_score,
  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd' THEN 'train'
       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
       ELSE 'test' END AS split
FROM deduped WHERE rn = 1
""",
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The X-operators composed end-to-end the way a training-data curation
    job actually runs them: heuristic quality scoring (X4) → threshold
    filter → exact content dedup with deterministic min-id survivors (X1) →
    deterministic train/val/test assignment (hash split). Single pipeline,
    fully declarative: the score and filter fuse into the scan projection,
    dedup shuffles once on the content digest, the split is a map-only
    expression on the survivors — three conceptual stages, one shuffle
    total. At 100 TB this ordering is the cheap one: scoring prunes rows
    BEFORE the dedup exchange moves them."""
    from ibis_flink_example_spark.operators import sampling as SA

    docs = load_table(spark, sf_dir, "documents")
    scored = X.quality_features(docs, "text", "doc_id", "lang", "text")
    kept = scored.filter(F.col("quality_score") >= 0.5)
    survivors = D.exact_dedup(kept, text_col="text", id_col="doc_id")
    return SA.hash_split(
        survivors, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "lang", "quality_score", "split")


# ---------------------------------------------------------------------------
# X5: multimodal columns
# ---------------------------------------------------------------------------


@query(
    "multimodal_meta",
    oracle=r"""
SELECT doc_id AS media_id,
  octet_length(encode(text)) AS n_bytes,
  sha256(text) AS payload_sha256,
  CAST((n_chars % 64) + 1 AS INTEGER) AS width,
  CAST((n_chars % 48) + 1 AS INTEGER) AS height
FROM documents
""",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 metadata-only scan over the media table: binary payload length +
    digest + typed metadata struct fields (payload bytes pruned from any
    metadata-only projection by columnar parquet)."""
    media = M.documents_as_media(load_table(spark, sf_dir, "documents"))
    return media.select(
        "media_id",
        F.octet_length("payload").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("payload_sha256"),
        F.col("metadata.width").alias("width"),
        F.col("metadata.height").alias("height"),
    )


@query(
    "multimodal_resize_plan",
    oracle=r"""
WITH m AS (
  SELECT doc_id AS media_id,
    CAST((n_chars % 64) + 1 AS INTEGER) AS width,
    CAST((n_chars % 48) + 1 AS INTEGER) AS height
  FROM documents
)
SELECT media_id, width, height,
  CAST(ceil(width * LEAST(32.0 / width, 32.0 / height, 1.0)) AS INTEGER) AS resized_width,
  CAST(ceil(height * LEAST(32.0 / width, 32.0 / height, 1.0)) AS INTEGER) AS resized_height
FROM m
""",
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 resize stage: aspect-preserving target dimensions as pure column
    math (the pixel resample itself would run in the stubbed decode path;
    the metadata contract here is what downstream batching consumes)."""
    media = M.documents_as_media(load_table(spark, sf_dir, "documents"))
    resized = M.resize_metadata(media, max_side=32)
    return resized.select(
        "media_id",
        F.col("metadata.width").alias("width"),
        F.col("metadata.height").alias("height"),
        F.col("resized.width").alias("resized_width"),
        F.col("resized.height").alias("resized_height"),
    )


@query(
    "multimodal_frame_sample",
    oracle=r"""
SELECT doc_id AS media_id, CAST(UNNEST(range(0, (n_chars % 100) + 1, 10)) AS BIGINT) AS frame_idx
FROM documents
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 frame-sampling stage for video payloads: one row per sampled frame
    index via explode(sequence(...)) — the shuffle-free 1:N expansion shape;
    frame decode itself is the stubbed step. n_frames derived
    deterministically from the fixture so the expansion is oracle-checkable."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (((F.col("n_chars") % 100) + 1)).cast("int").alias("n_frames"),
    )
    media = docs.select(
        "media_id",
        F.lit(None).cast("binary").alias("payload"),
        F.struct(
            F.lit("video").alias("modality"),
            F.lit("video/fake").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.col("n_frames").alias("n_frames"),
        ).alias("metadata"),
    )
    return M.frame_sample_plan(media, every_n=10)


@query(
    "multimodal_features",
    # The deterministic fake decode computes byte stats of the payload; the
    # fixture text is pure ASCII (verified), so UTF-8 bytes == codepoints
    # and DuckDB can recompute the identical stats from the string — giving
    # the mapInPandas path a real value-level oracle instead of rows-only.
    oracle=r"""
WITH cp AS (
  SELECT doc_id, n_chars, octet_length(encode(text)) AS n_bytes,
    list_transform(range(1, length(text) + 1), i -> ord(substr(text, i, 1))) AS cps
  FROM documents
)
SELECT doc_id AS media_id,
  CAST(n_bytes AS INTEGER) AS n_bytes,
  CASE WHEN n_bytes = 0 THEN 0.0 ELSE CAST(list_aggregate(cps, 'avg') AS DOUBLE) END AS mean_byte,
  CAST(CASE WHEN n_bytes = 0 THEN 0 ELSE list_aggregate(cps, 'min') END AS INTEGER) AS min_byte,
  CAST(CASE WHEN n_bytes = 0 THEN 0 ELSE list_aggregate(cps, 'max') END AS INTEGER) AS max_byte,
  CAST((n_chars % 64) + 1 AS INTEGER) AS width,
  CAST((n_chars % 48) + 1 AS INTEGER) AS height,
  FALSE AS decoded_real
FROM cp
""",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 Arrow-batched mapInPandas feature extraction over payload bytes
    (decode stage stubbed with a deterministic fake — see
    operators/multimodal.py; the Spark plumbing is real). The fake is
    deterministic in the payload bytes, so it carries a full value oracle
    (byte stats recomputed engine-side from the ASCII fixture)."""
    media = M.documents_as_media(load_table(spark, sf_dir, "documents"))
    return M.extract_features(media)


# ---------------------------------------------------------------------------
# X4 corpus term statistics: TF-IDF keyword extraction, heavy hitters,
# sequence-length distribution. X2/X3: semantic (embedding-space) dedup.
# ---------------------------------------------------------------------------

# The marker-lexicon union, as a SQL literal (must equal
# text.corpus_stopwords() — tests assert the lists match).
_STOPWORDS_SQL = (
    "('a','and','das','de','der','die','el','ein','en','est','et','in','is',"
    "'ist','la','le','les','los','nicht','of','que','the','to','und','une','y')"
)

_TF_CTE = rf"""
toks AS (
  SELECT doc_id, t.term
  FROM documents, UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(term)
  WHERE length(t.term) >= 3 AND t.term NOT IN {_STOPWORDS_SQL}
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
)"""


@query(
    "text_tfidf_top_terms",
    oracle=rf"""
WITH {_TF_CTE}, dfq AS (
  SELECT term, COUNT(*) AS df_term FROM tf GROUP BY 1
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), s AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfq.df_term,
    ROUND(tf.tf * (ln((n.n_docs + 1.0) / (dfq.df_term + 1.0)) + 1.0), 6) AS tfidf,
    ROW_NUMBER() OVER (
      PARTITION BY tf.doc_id ORDER BY tf.tf DESC, dfq.df_term ASC, tf.term ASC
    ) AS term_rank
  FROM tf JOIN dfq USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df_term, tfidf, term_rank FROM s WHERE term_rank <= 3
""",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 per-document top-3 characteristic terms by smoothed TF-IDF.
    The top-k cut is decided by the integer triple (tf, df, term) — engine
    exact; the float score is emitted for consumers, never compared.
    Plan: two partial-agg groupBys + a term-keyed shuffle join + a per-doc
    window — no global sort, no driver data."""
    docs = load_table(spark, sf_dir, "documents")
    return X.tfidf_top_terms(docs, id_col="doc_id", text_col="text", k=3)


@query(
    "term_heavy_hitters",
    oracle=rf"""
WITH {_TF_CTE}, tot AS (
  SELECT term, CAST(SUM(tf) AS BIGINT) AS total_tf, COUNT(*) AS df_term
  FROM tf GROUP BY 1
)
SELECT term, total_tf, df_term FROM tot
ORDER BY total_tf DESC, term ASC LIMIT 20
""",
)
def term_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 exact corpus-wide top-20 terms (vocabulary heavy hitters — the
    boilerplate/stopword-discovery pass of corpus curation). ORDER BY +
    LIMIT plans as TakeOrderedAndProject: per-partition top-k, driver-side
    merge of k·p rows — never a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    return X.term_heavy_hitters(docs, id_col="doc_id", text_col="text", k=20)


@query(
    "token_length_histogram",
    oracle=r"""
WITH t AS (
  SELECT len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) AS n_tokens FROM documents
)
SELECT CAST(floor(log2(n_tokens + 1)) AS INTEGER) AS len_bucket,
  COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  MIN(n_tokens) AS min_tokens,
  MAX(n_tokens) AS max_tokens
FROM t GROUP BY 1
""",
)
def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 sequence-length distribution in log2 buckets — the feed for
    choosing a packing context size (pack_sequences_2k) and for spotting
    truncation loss. Bucket edges land on exact powers of two, so
    floor(log2(n+1)) is engine-exact; all outputs are integers. Single
    partial-agg groupBy over a map-side-computed token count."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = X.token_count_whitespace("text")
    return (
        docs.select(n_tokens.alias("n_tokens"))
        .groupBy(
            F.floor(F.log2(F.col("n_tokens") + 1)).cast("int").alias("len_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


@query(
    "semantic_dedup",
    # Components via recursive transitive closure over the post-threshold
    # pair residue — tiny by construction, so the recursion is cheap; the
    # Spark side runs the bounded union-find / distributed-propagation
    # hybrid over the same edges.
    oracle=r"""
WITH RECURSIVE n AS (
  SELECT vec_id, label,
    list_transform(embedding, x -> CAST(x AS DOUBLE) /
      sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))
    ) AS nvec
  FROM embeddings
), p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM n a
  JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE list_sum(list_transform(range(1, len(a.nvec) + 1), i -> a.nvec[i] * b.nvec[i])) >= 0.35
), e AS (
  SELECT id_a AS src, id_b AS dst FROM p
  UNION ALL
  SELECT id_b, id_a FROM p
), reach AS (
  SELECT src AS id, dst AS r FROM e
  UNION
  SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id
), comp AS (
  SELECT id, MIN(r) AS minr FROM reach GROUP BY id
)
SELECT v.vec_id, v.label
FROM embeddings v
LEFT JOIN comp c ON v.vec_id = c.id
WHERE c.id IS NULL OR v.vec_id <= c.minr
""",
)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X3 SemDeDup-style semantic dedup: embedding-cosine near-dup pairs
    (same-label blocking — the cluster-assignment stand-in; threshold 0.35
    matches embedding_neardup_pairs) → connected components → keep the
    min-id representative per cluster. Removes paraphrase-level duplicates
    lexical dedup cannot see."""
    em = load_table(spark, sf_dir, "embeddings")
    return S.semantic_dedup(
        em, id_col="vec_id", vec_col="embedding", block_col="label", threshold=0.35
    ).select("vec_id", "label")


@query(
    "embedding_centroid_by_label",
    # Cross-row float sums are order-dependent, so each component is first
    # quantized to integer micro-units with the engine-stable
    # floor(x*1e6 + 0.5) idiom (see embedding_quantize), summed exactly,
    # and divided ONCE at the end — bit-identical at any partition order.
    oracle=r"""
WITH ex AS (
  SELECT label,
    CAST(unnest(range(len(embedding))) AS INTEGER) AS dim_idx,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
      AS micro
  FROM embeddings
)
SELECT label, dim_idx,
  CAST(COUNT(*) AS BIGINT) AS n_vecs,
  CAST(CAST(SUM(micro) AS BIGINT) AS DOUBLE)
    / (CAST(COUNT(*) AS DOUBLE) * 1000000.0) AS centroid
FROM ex GROUP BY 1, 2
""",
)
def embedding_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 per-cluster centroid build (the reduce step of IVF training /
    SemDeDup cluster assignment) emitted as scalar (label, dim_idx) rows.
    posexplode → fixed-point micro-units → one (label, dim) shuffle with
    map-side partial sums; the only float op is a single final division.
    At 100 TB: aggregation cardinality is |labels|·dim — tiny — and the
    partial aggs reduce each partition to that size before the exchange."""
    em = load_table(spark, sf_dir, "embeddings")
    ex = em.select(
        "label",
        F.posexplode(F.col("embedding")).alias("dim_idx", "v"),
    ).select(
        "label",
        "dim_idx",
        F.floor(F.col("v").cast("double") * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("micro"),
    )
    return ex.groupBy("label", "dim_idx").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        (
            F.sum("micro").cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(1000000.0))
        ).alias("centroid"),
    )


# ---------------------------------------------------------------------------
# X4 extension: context-window chunking + df-based term pruning
# ---------------------------------------------------------------------------


@query(
    "chunk_documents_200_50",
    # stride = 200 - 50 = 150; k = max(1, ceil((len - 50) / 150)) via the
    # same integer ceil-div as the Spark side.
    oracle=r"""
WITH base AS (
  SELECT doc_id, text,
    greatest(1, (length(text) - 50 + 149) // 150) AS k
  FROM documents
), ex AS (
  SELECT doc_id, text,
    CAST(unnest(generate_series(0, k - 1)) AS INTEGER) AS chunk_idx
  FROM base
)
SELECT doc_id, chunk_idx,
  CAST(chunk_idx AS BIGINT) * 150 AS chunk_start,
  substr(text, chunk_idx * 150 + 1, 200) AS chunk_text,
  CAST(length(substr(text, chunk_idx * 150 + 1, 200)) AS INTEGER) AS chunk_len
FROM ex
""",
)
def chunk_documents_200_50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 context-window chunking: 200-char pieces overlapping by 50 —
    the 1:N reshaping that turns documents into training-context inputs.
    Plan: Project → Generate(posexplode) → Project, zero exchanges;
    parallelism equals scan parallelism at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    return CH.chunk_documents(docs, chunk_size=200, overlap=50)


@query(
    "strip_high_df_terms",
    oracle=r"""
WITH d AS (
  SELECT doc_id, lang, string_split(text, ' ') AS sl FROM documents
), ex AS (
  SELECT doc_id, unnest(sl) AS line,
    CAST(unnest(range(len(sl))) AS INTEGER) AS line_idx
  FROM d
), dfq AS (
  SELECT line, COUNT(DISTINCT doc_id) AS df FROM ex
  WHERE length(trim(line)) >= 1 GROUP BY 1
), kept AS (
  SELECT ex.doc_id, ex.line_idx, ex.line
  FROM ex LEFT JOIN dfq USING (line)
  WHERE coalesce(dfq.df, 0) <= 150
), re AS (
  SELECT doc_id,
    string_agg(line, ' ' ORDER BY line_idx) AS clean_text,
    COUNT(*) AS n_kept
  FROM kept GROUP BY 1
)
SELECT d.doc_id, d.lang,
  coalesce(re.clean_text, '') AS clean_text,
  CAST(coalesce(re.n_kept, 0) AS INTEGER) AS n_kept_lines
FROM d LEFT JOIN re USING (doc_id)
""",
)
def strip_high_df_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 document-frequency pruning (sklearn ``max_df`` flavor of the
    CCNet boilerplate-removal shape): drop terms present in >150 documents,
    reassemble each document in original token order. Two wide stages
    (term-df aggregation, doc reassembly); the hot-term set itself rides a
    guarded BROADCAST back onto the corpus — no second corpus-wide shuffle,
    no skew hotspot, no driver data. With delimiter='\\n' the same operator
    strips boilerplate lines."""
    docs = load_table(spark, sf_dir, "documents")
    return CH.strip_boilerplate_lines(
        docs, max_df=150, extra_cols=("lang",), delimiter=" "
    )


@query("bpe_learn_merges", oracle=None)
def bpe_learn_merges_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 tokenizer training: the first 8 BPE merge rules learned from the
    corpus — the repo's representative ITERATIVE algorithm (driver-bounded
    loop; per-iteration distributed pair counts; one-row argmax collects;
    eager localCheckpoint lineage truncation). Rows-only by design (SQL
    cannot express iteration); tests pin exact equality against a pure-
    Python reference BPE on the same corpus (operators/bpe.py)."""
    from ibis_flink_example_spark.operators.bpe import bpe_merges_df

    docs = load_table(spark, sf_dir, "documents")
    return bpe_merges_df(docs, n_merges=8)


@query(
    "doc_rare_bigram_score",
    # Log-free corpus-LM quality signal: transcendental log() differs in
    # final ulps across libm implementations, so the score is the RARE
    # fraction — pure integer counts plus one final division, engine-exact.
    oracle=r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS ws FROM documents
), bg AS (
  SELECT doc_id, concat_ws(' ', ws[i], ws[i+1]) AS bigram
  FROM w, UNNEST(range(1, len(ws))) AS t(i)
  WHERE len(ws) >= 2
), cf AS (
  SELECT bigram, COUNT(*) AS corpus_count FROM bg GROUP BY 1
)
SELECT bg.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
  CAST(SUM(CASE WHEN cf.corpus_count < 5 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_rare,
  CAST(CAST(SUM(CASE WHEN cf.corpus_count < 5 THEN 1 ELSE 0 END) AS BIGINT)
       AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS rare_frac
FROM bg JOIN cf USING (bigram)
GROUP BY bg.doc_id
""",
)
def doc_rare_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 corpus-LM quality scoring (the log-free face of CCNet-style
    perplexity filtering): each document scored by the fraction of its
    word bigrams that are RARE in the whole corpus (count < 5) — high
    rare_frac flags gibberish/OCR noise, near-zero flags boilerplate.
    Plan: in-row bigram arrays (no per-word explode of positions), one
    bigram-keyed count shuffle, a bigram join back (same key — exchange
    reused), one doc rollup. All counts integer; the only float op is
    the final division."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.col("text")), X.WS_SPLIT)
    bigrams = docs.select(
        "doc_id",
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
    return (
        bigrams.join(cf, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(rare).alias("n_rare"),
            (
                F.sum(rare).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("rare_frac"),
        )
    )


def _fertility_oracle() -> str:
    from ibis_flink_example_spark.operators.bpe import (
        fixed_merge_token_count_sql,
    )

    return rf"""
WITH t AS (
  SELECT lang,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(regexp_split_to_array(trim(text),
                  '[ \t\n\x0B\f\r]+')) END AS n_words,
    strlen(text) AS n_bytes,
    {fixed_merge_token_count_sql('text')} AS n_tokens
  FROM documents
)
SELECT lang,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_words) AS BIGINT) AS n_words,
  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
  CAST(SUM(n_bytes) AS BIGINT) AS n_bytes,
  CAST(CASE WHEN SUM(n_words) = 0 THEN NULL
       ELSE SUM(n_tokens) * 1000000 // SUM(n_words) END AS BIGINT)
    AS tokens_per_word_x1e6,
  CAST(CASE WHEN SUM(n_tokens) = 0 THEN NULL
       ELSE SUM(n_bytes) * 1000000 // SUM(n_tokens) END AS BIGINT)
    AS bytes_per_token_x1e6
FROM t GROUP BY 1
"""


@query(
    "mixture_quality_occupancy",
    # 2-D curation->schedule audit: per (source, quality-decile) doc and
    # token occupancy. Quality = the rare-bigram score as an exact x1e6
    # integer; deciles assigned PER DISTINCT SCORE from the cumulative
    # count (ties share a decile), mirroring the engine's score-domain
    # collapse. Shares are HUGEINT/DECIMAL(38,0) floor divisions.
    oracle=r"""
WITH w AS (
  SELECT doc_id, source,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(regexp_split_to_array(trim(text),
                  '[ \t\n\x0B\f\r]+')) END AS n_words,
    regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS ws
  FROM documents
), bg AS (
  SELECT doc_id, concat_ws(' ', ws[i], ws[i+1]) AS bigram
  FROM w, UNNEST(range(1, len(ws))) AS t(i)
  WHERE len(ws) >= 2
), cf AS (
  SELECT bigram, COUNT(*) AS corpus_count FROM bg GROUP BY 1
), pd AS (
  SELECT bg.doc_id, COUNT(*) AS n_bg,
         SUM(CASE WHEN cf.corpus_count < 5 THEN 1 ELSE 0 END) AS n_rare
  FROM bg JOIN cf USING (bigram) GROUP BY 1
), scored AS (
  SELECT w.doc_id, w.source, w.n_words,
    CAST(COALESCE(CAST(pd.n_rare AS BIGINT) * 1000000 // pd.n_bg, 0)
         AS BIGINT) AS score
  FROM w LEFT JOIN pd USING (doc_id)
), counts AS (
  SELECT score, COUNT(*) AS c FROM scored GROUP BY 1
), dec AS (
  SELECT score,
    CAST((CAST(SUM(c) OVER (ORDER BY score
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          - c) * 10
         // CAST(SUM(c) OVER () AS BIGINT) AS BIGINT) AS decile
  FROM counts
), cell AS (
  SELECT s.source, d.decile, COUNT(*) AS n_docs,
         CAST(SUM(s.n_words) AS BIGINT) AS n_tokens
  FROM scored s JOIN dec d USING (score) GROUP BY 1, 2
)
SELECT source, decile,
  CAST(n_docs AS BIGINT) AS n_docs,
  n_tokens,
  CAST(CASE WHEN CAST(SUM(n_tokens) OVER () AS BIGINT) = 0 THEN NULL
       ELSE CAST(n_tokens AS HUGEINT) * 1000000
            // CAST(SUM(n_tokens) OVER () AS HUGEINT) END AS BIGINT)
    AS token_share_x1e6,
  CAST(CASE WHEN CAST(SUM(n_tokens) OVER (PARTITION BY source) AS BIGINT) = 0
       THEN NULL
       ELSE CAST(n_tokens AS HUGEINT) * 1000000
            // CAST(SUM(n_tokens) OVER (PARTITION BY source) AS HUGEINT) END
    AS BIGINT) AS source_share_x1e6
FROM cell
""",
)
def mixture_quality_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 2-D (source, quality-decile) occupancy/weight audit (VERDICT
    r10 #3c — closing the curation->schedule loop): how each domain's
    documents and tokens distribute across corpus-wide quality deciles —
    the table read before setting mixture weights (a source whose token
    mass sits in the bottom deciles gets down-weighted or re-filtered,
    feeding domain_mixture_weights / mixture_schedule). Quality is the
    rare-bigram score (doc_rare_bigram_score's signal) as an exact x1e6
    integer; bigram-free docs audit as score 0 (no evidence). Deciles
    come from the counts-of-counts collapse (the ROC idiom): per-score
    counts first, windows only over the DISTINCT-SCORE frame (bounded by
    the 1e6+1 score domain regardless of corpus size), decile =
    docs-below x 10 DIV N per score value — ties share a decile, no
    row-level rank window anywhere. The (score -> decile) map (<= 1e6+1
    rows) broadcasts back onto the doc frame; final shares are
    DECIMAL(38,0)/HUGEINT floor divisions over the tiny (source, decile)
    rollup, NULL-guarded against zero token mass. Exchanges: bigram
    count (+reused join), doc rollup, score collapse, the (source,
    decile) rollup — all keyed; the only single-partition windows run on
    provably bounded frames (score domain / cell rollup)."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    trimmed = F.trim(F.col("text"))
    # explicit whitespace class (operators/text.py:WS_SPLIT) — the \s+
    # shorthand diverges engine-vs-oracle on U+000B
    ws = F.split(trimmed, X.WS_SPLIT)
    base = docs.select(
        "doc_id",
        "source",
        F.when(F.length(trimmed) == 0, F.lit(0))
        .otherwise(F.size(ws))
        .cast("long")
        .alias("n_words"),
    )
    bigrams = docs.select(
        "doc_id",
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
    perdoc = (
        bigrams.join(cf, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bg"),
            F.sum(rare).alias("n_rare"),
        )
    )
    scored = base.join(perdoc, "doc_id", "left").select(
        "source",
        "n_words",
        F.coalesce(
            F.expr("n_rare * 1000000 DIV n_bg"), F.lit(0)
        )
        .cast("long")
        .alias("score"),
    )
    # Collapse the CORPUS to (source, score) cells before anything else
    # touches it twice: the cells frame is bounded (sources x score
    # domain), so both consumers below — the decile map and the final
    # rollup — branch off the SAME aggregation subtree and AQE reuses its
    # exchange at runtime (one corpus pass, not two). Joining the decile
    # map onto the cells (not onto per-doc rows) also shrinks that join's
    # probe side from corpus-sized to domain-sized.
    cells0 = scored.groupBy("source", "score").agg(
        F.count(F.lit(1)).alias("n_docs_c"),
        F.sum("n_words").alias("n_tokens_c"),
    )
    counts = cells0.groupBy("score").agg(F.sum("n_docs_c").alias("c"))
    w_cum = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    dec = counts.select(
        "score",
        "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n_total"),
    ).select(
        "score",
        F.expr("(cum - c) * 10 DIV n_total").cast("long").alias("decile"),
    )
    cell = (
        cells0.join(F.broadcast(dec), "score")
        .groupBy("source", "decile")
        .agg(
            F.sum("n_docs_c").cast("long").alias("n_docs"),
            F.sum("n_tokens_c").cast("long").alias("n_tokens"),
        )
    )
    w_src = Window.partitionBy("source")
    tot = F.sum("n_tokens").over(w_all)
    src_tot = F.sum("n_tokens").over(w_src)
    share = "CAST(n_tokens AS DECIMAL(38,0)) * 1000000 DIV {d}"
    return cell.select(
        "source",
        "decile",
        "n_docs",
        "n_tokens",
        tot.alias("__tot"),
        src_tot.alias("__src_tot"),
    ).select(
        "source",
        "decile",
        "n_docs",
        "n_tokens",
        F.when(F.col("__tot") == 0, F.lit(None).cast("long"))
        .otherwise(F.expr(share.format(d="__tot")))
        .alias("token_share_x1e6"),
        F.when(F.col("__src_tot") == 0, F.lit(None).cast("long"))
        .otherwise(F.expr(share.format(d="__src_tot")))
        .alias("source_share_x1e6"),
    )


@query("tokenizer_fertility_by_lang", oracle=_fertility_oracle())
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility QA per language (VERDICT r10 #3b — the table
    that decides whether a tokenizer is acceptable for a mixture):
    tokens/word and bytes/token under the FROZEN demo merge table
    (operators/bpe.py:FIXED_DEMO_MERGES — English-centric on purpose: a
    real run would show non-English languages paying more tokens per
    word, exactly what this table exists to surface). Unlike
    bpe_token_counts (whose learn step is iterative, hence rows-only),
    a fixed merge table applies in CLOSED FORM — the rank-ordered
    replace chain (fixed_merge_token_count), proven equivalent to the
    symbol-rewriting encoder and mirrored verbatim in the oracle — so
    the whole QA is fully value-hash-checked. Ratios are exact x1e6
    integer floor divisions of corpus sums (NULL-guarded: DuckDB // 0
    is NULL, Spark ANSI would throw). Scale shape: map-only per-doc
    columns, ONE language rollup with map-side partials — a single
    exchange, no joins, no UDF."""
    from ibis_flink_example_spark.operators.bpe import fixed_merge_token_count

    docs = load_table(spark, sf_dir, "documents")
    trimmed = F.trim(F.col("text"))
    per = docs.select(
        "lang",
        F.when(F.length(trimmed) == 0, F.lit(0))
        .otherwise(F.size(F.split(trimmed, X.WS_SPLIT)))
        .cast("long")
        .alias("n_words"),
        F.octet_length("text").cast("long").alias("n_bytes"),
        fixed_merge_token_count("text").alias("n_tokens"),
    )
    agg = per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("n_bytes").cast("long").alias("n_bytes"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_words",
        "n_tokens",
        "n_bytes",
        # DECIMAL(38,0) products: corpus sums pass 9.2e12 well inside the
        # 100 TB envelope, and BIGINT * 1e6 would overflow there (the
        # repo's recorded overflow-audit trap); the oracle side is
        # already HUGEINT (DuckDB SUM of BIGINT). The DIVISION results
        # are small ratios, so Spark's decimal DIV -> BIGINT is safe.
        F.when(
            F.col("n_words") == 0, F.lit(None).cast("long")
        )
        .otherwise(
            F.expr("CAST(n_tokens AS DECIMAL(38,0)) * 1000000 DIV n_words")
        )
        .alias("tokens_per_word_x1e6"),
        F.when(
            F.col("n_tokens") == 0, F.lit(None).cast("long")
        )
        .otherwise(
            F.expr("CAST(n_bytes AS DECIMAL(38,0)) * 1000000 DIV n_tokens")
        )
        .alias("bytes_per_token_x1e6"),
    )


@query("bpe_token_counts", oracle=None)
def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 tokenizer encode: per-document BPE token counts under the 8
    merge rules learned by bpe_learn_merges — the learn→apply pair that
    feeds pack_sequences_2k's real token budget. Merge table ships by
    value into the Arrow-batched encoder; per-word memoization bounds
    work by distinct words per batch. Rows-only (depends on the
    iterative learn step); tests pin exact equality against a
    pure-Python encode."""
    from ibis_flink_example_spark.operators.bpe import (
        bpe_encode_token_counts,
        bpe_learn_merges,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_learn_merges(docs, n_merges=8)
    return bpe_encode_token_counts(docs, merges)


@query(
    "dedup_incremental",
    # incoming = odd doc_ids, existing corpus = even doc_ids; keep odd
    # docs whose normalized digest is new AND min-id within incoming.
    oracle=r"""
WITH dg AS (
  SELECT doc_id, lang, source, n_chars,
    md5(lower(regexp_replace(trim(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS digest
  FROM documents
), inc AS (SELECT * FROM dg WHERE doc_id % 2 = 1),
ex AS (SELECT DISTINCT digest FROM dg WHERE doc_id % 2 = 0),
fresh AS (
  SELECT inc.* FROM inc LEFT JOIN ex USING (digest) WHERE ex.digest IS NULL
), w AS (
  SELECT digest, MIN(doc_id) AS doc_id FROM fresh GROUP BY 1
)
SELECT f.doc_id, f.lang, f.source, f.n_chars
FROM fresh f JOIN w ON f.digest = w.digest AND f.doc_id = w.doc_id
""",
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 ingest-time dedup: an incoming batch (odd doc_ids) checked
    against the accepted corpus (even doc_ids) — digest-only anti-join
    against the corpus plus min-id dedup within the batch
    (operators/dedup.py:incremental_dedup). The daily-ingest complement
    of exact_dedup: accepted text is never re-read, only its digests."""
    docs = load_table(spark, sf_dir, "documents")
    incoming = docs.where(F.col("doc_id") % 2 == 1)
    existing = docs.where(F.col("doc_id") % 2 == 0)
    return D.incremental_dedup(
        incoming, existing, text_col="text", id_col="doc_id"
    ).select("doc_id", "lang", "source", "n_chars")


@query(
    "langid_confusion",
    # Reuses text_lang_id's exact SQL twin of the marker-lexicon argmax
    # (same lexicons, same declaration-order tie-break, 'und' fallback).
    oracle=r"""
WITH w AS (
  SELECT lang,
         list_transform(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+'), w -> lower(w)) AS ws
  FROM documents
), scores AS (
  SELECT lang,
    len(list_filter(ws, w -> list_contains(['the','of','and','to','in','is','a'], w))) AS s_en,
    len(list_filter(ws, w -> list_contains(['el','la','de','que','y','en','los'], w))) AS s_es,
    len(list_filter(ws, w -> list_contains(['der','die','und','das','ist','nicht','ein'], w))) AS s_de,
    len(list_filter(ws, w -> list_contains(['le','la','les','de','et','est','une'], w))) AS s_fr
  FROM w
), pred AS (
  SELECT lang,
    CASE
      WHEN GREATEST(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
      WHEN s_en = GREATEST(s_en, s_es, s_de, s_fr) THEN 'en'
      WHEN s_es = GREATEST(s_en, s_es, s_de, s_fr) THEN 'es'
      WHEN s_de = GREATEST(s_en, s_es, s_de, s_fr) THEN 'de'
      ELSE 'fr'
    END AS lang_pred
  FROM scores
)
SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred GROUP BY 1, 2
""",
)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 evaluation-style rollup: confusion matrix of the heuristic
    lang-id (operators/text.py:lang_id) against the fixture's ground-truth
    lang labels — the QA report every classifier-driven curation step
    needs. One aggregation over a map-side predicted column; the oracle
    re-derives the identical marker heuristic in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", X.lang_id("text").alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "doc_unigram_surprisal",
    # Corpus-LM quality score with INTEGER-EXACT surprisal: per token
    # occurrence, whole-bit surprisal = floor(log2(total)) - floor(log2(cnt)).
    # floor(log2(k)) is engine-safe for integer k < 2^40: log2 of a power
    # of two is exact in any correctly-rounded libm, and a non-power's
    # irrational log2 sits >= 1/(k·ln2) ≈ 2^-41 away from every integer —
    # orders of magnitude beyond double ulp — so the floor can never flip
    # between engines. Per-doc sums are then BIGINT (order-independent);
    # one final double division yields bits/token.
    oracle=rf"""
WITH {_TF_CTE}, vocab AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY 1
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS total,
         CAST(floor(log2(COUNT(*))) AS BIGINT) AS total_bits
  FROM toks
)
SELECT t.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(tot.total_bits - CAST(floor(log2(v.cnt)) AS BIGINT)) AS BIGINT)
    AS surprisal_bits,
  CAST(SUM(tot.total_bits - CAST(floor(log2(v.cnt)) AS BIGINT)) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS bits_per_token
FROM toks t JOIN vocab v USING (term) CROSS JOIN tot
GROUP BY 1
""",
)
def doc_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 corpus-unigram LM scoring — the distributed form of perplexity-
    based quality filtering (docs whose tokens are uniformly corpus-common
    score low; rare-token-heavy docs score high, the complement of
    doc_rare_bigram_score's bigram lens). Token occurrences (zero-exchange
    explode, same tokenizer as the TF-IDF family) join the vocabulary
    counts on the term key — shuffle volume is occurrences x 8-byte count,
    text never reshuffles — then ONE doc-keyed rollup. Whole-bit integer
    surprisal keeps every cross-row sum exact; a true float -log2(p) chain
    would be order-dependent."""
    from ibis_flink_example_spark.operators.text import doc_terms

    docs = load_table(spark, sf_dir, "documents")
    toks = doc_terms(docs, id_col="doc_id", text_col="text")
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    tot = toks.agg(
        F.count(F.lit(1)).alias("total"),
        F.floor(F.log2(F.count(F.lit(1)))).cast("long").alias("total_bits"),
    )
    bits = F.col("total_bits") - F.floor(F.log2(F.col("cnt"))).cast("long")
    return (
        toks.join(vocab, "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(bits).alias("surprisal_bits"),
            (
                F.sum(bits).cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("bits_per_token"),
        )
    )


@query(
    "dup_cluster_size_histogram",
    # Dedup REPORTING: distribution of exact-duplicate cluster sizes over
    # the planted-duplicate corpus (every doc_id % 50 == 0 re-added under
    # doc_id + 1000000, mirroring the SimHash coverage fixture) — the
    # dashboard rollup every dedup pipeline ships next to the dedup
    # itself.
    oracle="""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0
), grp AS (
  SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM aug GROUP BY 1
)
SELECT cluster_size,
  CAST(COUNT(*) AS BIGINT) AS n_clusters,
  CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
FROM grp GROUP BY 1
""",
)
def dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 companion: the duplicate-cluster size histogram (how many
    clusters of size 1, 2, ... and how many docs they hold) over a corpus
    with planted exact duplicates. Two digest-keyed rollups; document text
    never shuffles (the md5 digest rides the exchange) — the exact-dedup
    plan shape reused for reporting instead of pruning."""
    aug = _with_planted_dups(load_table(spark, sf_dir, "documents"))
    grp = aug.select(F.md5("text").alias("h")).groupBy("h").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return grp.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1))).cast("long").alias("n_docs"),
    )


# Shared augmentation for the dup-PROVENANCE QA pair: in-source replays
# (doc_id % 50, same source — ingestion retries) and cross-source copies
# (doc_id % 70, source 'syndicated' — mirror sites). One definition, both
# oracles inline the same arithmetic.
_DUP_PROVENANCE_AUG_SQL = """
aug AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text, source FROM documents WHERE doc_id % 50 = 0
  UNION ALL
  SELECT doc_id + 2000000, text, 'syndicated' FROM documents
  WHERE doc_id % 70 = 0
)"""


def _dup_provenance_aug(docs: DataFrame) -> DataFrame:
    base = docs.select("doc_id", "text", "source")
    replay = docs.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "source"
    )
    syndicated = docs.filter(F.col("doc_id") % 70 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        "text",
        F.lit("syndicated").alias("source"),
    )
    return base.unionAll(replay).unionAll(syndicated)


@query(
    "dup_inflation_by_source",
    oracle="WITH" + _DUP_PROVENANCE_AUG_SQL + """
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
  CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS dup_docs,
  CAST(COUNT(*) * 1000000 // COUNT(DISTINCT md5(text)) AS BIGINT)
    AS inflation_x1e6
FROM aug GROUP BY 1
""",
)
def dup_inflation_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 provenance QA: per-source duplicate inflation — docs over
    distinct content fingerprints, the first number a curation run reads
    per domain (a source at 3x inflation is a crawler trap or a replayed
    feed; weighting it by raw doc count triples its real mixture share).
    Runs on the planted-provenance corpus (in-source replays + a
    syndicated mirror). One digest-keyed aggregation; text never
    shuffles, the md5 digest rides the exchange."""
    aug = _dup_provenance_aug(load_table(spark, sf_dir, "documents"))
    return aug.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct(F.md5("text")).cast("long").alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5("text")))
        .cast("long")
        .alias("dup_docs"),
        F.expr(
            "CAST(COUNT(1) * 1000000 DIV COUNT(DISTINCT md5(text)) AS BIGINT)"
        ).alias("inflation_x1e6"),
    )


@query(
    "cross_source_dup_overlap",
    oracle="WITH" + _DUP_PROVENANCE_AUG_SQL + """,
hs AS (SELECT DISTINCT md5(text) AS h, source FROM aug)
SELECT a.source AS source_a, b.source AS source_b,
  CAST(COUNT(*) AS BIGINT) AS shared_fingerprints
FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
GROUP BY 1, 2
""",
)
def cross_source_dup_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 provenance QA, the pairwise arm: which source PAIRS share
    content — the mirror-site / syndication detector that tells dedup
    WHERE its duplicates come from (and which source to drop wholesale
    instead of deduping doc-by-doc). Distinct (digest, source) pairs
    self-join on the digest: per-fingerprint fanout is bounded by the
    source count (<= |sources| per digest by construction after the
    distinct), so the join is cluster-size-safe even on a corpus where
    one document is mirrored everywhere."""
    aug = _dup_provenance_aug(load_table(spark, sf_dir, "documents"))
    hs = aug.select(F.md5("text").alias("h"), "source").distinct()
    a = hs.select("h", F.col("source").alias("source_a"))
    b = hs.select("h", F.col("source").alias("source_b"))
    return (
        a.join(b, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fingerprints"))
    )


@query(
    "cms_term_counts",
    # Count-Min sketch QA: the probe set is the EXACT top-20 terms (the
    # SQL-computable heavy hitters), each carrying its exact count from
    # SQL plus two claims the Spark side computes from the sketch: the
    # one-sided guarantee est >= exact (structural — never false for any
    # hashing), and the eps-bound est - exact <= ceil(e/width * N) with
    # N = total occurrences (holds deterministically for these fixtures
    # and seeds; per-item failure prob is e^-depth in general).
    oracle=rf"""
WITH {_TF_CTE}, tot AS (
  SELECT term, CAST(SUM(tf) AS BIGINT) AS exact_tf FROM tf GROUP BY 1
)
SELECT term, exact_tf, TRUE AS est_ge_exact, TRUE AS overest_within_eps
FROM tot ORDER BY exact_tf DESC, term ASC LIMIT 20
""",
)
def cms_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over corpus term occurrences (width 1024 x depth
    4 — a ~32 KB mergeable frequency counter replacing a vocabulary-sized
    exact table at 100 TB), probed at the exact top-20 heavy hitters. The
    sketch build is ONE bounded aggregation (shuffle <= depth*width cells
    regardless of corpus size); estimates join the broadcast cell table.
    Emitted claims: one-sided est >= exact, and the standard eps*N
    overestimate bound — both computed from data, so any hashing or merge
    regression flips the driver hash."""
    import math

    from ibis_flink_example_spark.operators.sketches import cms_build, cms_estimate
    from ibis_flink_example_spark.operators.text import doc_terms

    width, depth = 1024, 4
    docs = load_table(spark, sf_dir, "documents")
    toks = doc_terms(docs, id_col="doc_id", text_col="text").localCheckpoint(
        eager=True
    )  # feeds sketch build, exact counts, and N — three consumers
    sketch = cms_build(toks, "term", width=width, depth=depth)
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("exact_tf"))
    top = exact.orderBy(F.col("exact_tf").desc(), F.col("term").asc()).limit(20)
    est = cms_estimate(sketch, top.select("term"), "term", width=width, depth=depth)
    n_total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    eps_bound = F.ceil(F.lit(math.e / width) * F.col("n_total")).cast("long")
    return (
        top.join(est, "term")
        .crossJoin(F.broadcast(n_total))
        .select(
            "term",
            "exact_tf",
            (F.col("est") >= F.col("exact_tf")).alias("est_ge_exact"),
            ((F.col("est") - F.col("exact_tf")) <= eps_bound).alias(
                "overest_within_eps"
            ),
        )
    )


@query(
    "dedup_chunk_exact",
    # Chunk-granular exact dedup (the Lee et al. 'Deduplicating Training
    # Data' insight at bounded granularity: duplicated SPANS matter, not
    # just whole documents): both engines split on single spaces, group
    # words into 10-word position chunks (ragged tail included), and count
    # duplicated chunk instances over the shared planted-dup corpus.
    oracle="""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0
), w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM aug
), chunks AS (
  SELECT doc_id, t.i AS chunk_idx,
    array_to_string(list_slice(words, t.i*10 + 1, t.i*10 + 10), ' ') AS chunk
  FROM w, UNNEST(range(0, CAST(ceil(len(words)/10.0) AS BIGINT))) AS t(i)
), freq AS (
  SELECT chunk, CAST(COUNT(*) AS BIGINT) AS n FROM chunks GROUP BY 1
)
SELECT CAST(SUM(n) AS BIGINT) AS total_chunks,
       CAST(COUNT(*) AS BIGINT) AS distinct_chunks,
       CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
         AS dup_chunk_instances,
       CAST(MAX(n) AS BIGINT) AS max_dup_count
FROM freq
""",
)
def dedup_chunk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 at SPAN granularity: exact duplicate 10-word chunks across the
    corpus — whole-document dedup misses copied passages inside otherwise
    distinct documents, and at 100 TB duplicated spans are the main
    memorization driver. Plan: chunks are SLICED out of the split-word
    array in-row (explode of chunk indices + array slice — a Generate,
    zero exchanges; no word-level shuffle-and-reassemble), so the ONLY
    shuffle is the chunk-frequency aggregation with map-side partials.
    Counts are over the shared planted-dup corpus so the duplicated set
    is non-empty by construction."""
    aug = _with_planted_dups(load_table(spark, sf_dir, "documents"))
    w = aug.select("doc_id", F.split("text", " ").alias("words"))
    chunks = w.select(
        F.explode(
            F.sequence(
                F.lit(0),
                F.ceil(F.size("words") / 10.0).cast("bigint") - 1,
            )
        ).alias("i"),
        "words",
    ).select(
        F.concat_ws(" ", F.expr("slice(words, i*10 + 1, 10)")).alias("chunk")
    )
    freq = chunks.groupBy("chunk").agg(F.count(F.lit(1)).alias("n"))
    return freq.agg(
        F.sum("n").alias("total_chunks"),
        F.count(F.lit(1)).alias("distinct_chunks"),
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0)).alias(
            "dup_chunk_instances"
        ),
        F.max("n").alias("max_dup_count"),
    )


@query(
    "dedup_substring_runs",
    # Anchored k-word windows at stride 1 over the planted-dup corpus,
    # duplicated-window anchors coalesced into maximal runs (gap == 1)
    # and coverage islands (gap <= k) per doc — the same two-level
    # gaps-and-islands construction as the engine, windows per doc.
    oracle="""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0
), w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM aug
), grams AS (
  SELECT doc_id, t.i AS pos,
    md5(array_to_string(list_slice(ws, t.i + 1, t.i + 10), ' ')) AS h
  FROM w, UNNEST(range(0, GREATEST(len(ws) - 9, 0))) AS t(i)
), d AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY h) AS cnt FROM grams
  ) WHERE cnt >= 2
), l AS (
  SELECT doc_id, pos,
    CASE WHEN pos - LAG(pos) OVER wd = 1 THEN 0 ELSE 1 END AS run_brk,
    CASE WHEN pos - LAG(pos) OVER wd <= 10 THEN 0 ELSE 1 END AS cov_brk
  FROM d WINDOW wd AS (PARTITION BY doc_id ORDER BY pos)
), ids AS (
  SELECT doc_id, pos,
    SUM(run_brk) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id,
    SUM(cov_brk) OVER (PARTITION BY doc_id ORDER BY pos) AS cov_id
  FROM l
), runs AS (
  SELECT doc_id, cov_id, run_id, COUNT(*) AS anchors,
         MIN(pos) AS p0, MAX(pos) AS p1
  FROM ids GROUP BY 1, 2, 3
), islands AS (
  SELECT doc_id, cov_id, COUNT(*) AS n_runs, SUM(anchors) AS anchors,
         MAX(anchors) AS max_run_anchors, MAX(p1) - MIN(p0) + 10 AS span
  FROM runs GROUP BY 1, 2
)
SELECT doc_id,
  CAST(SUM(n_runs) AS BIGINT) AS n_runs,
  CAST(SUM(anchors) AS BIGINT) AS dup_anchors,
  CAST(MAX(max_run_anchors) + 9 AS BIGINT) AS max_run_tokens,
  CAST(SUM(span) AS BIGINT) AS dup_token_coverage
FROM islands GROUP BY 1
""",
)
def dedup_substring_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 at EXACT-SUBSTRING granularity (VERDICT r10 #3a — the Lee et
    al. ExactSubstr step, operators/dedup.py:substring_dup_runs):
    10-word windows anchored at every position of the planted-dup
    corpus, anchors duplicated anywhere in the corpus coalesced into
    maximal extension runs and exact duplicated-token coverage per
    document. Generalizes dedup_chunk_exact's disjoint chunks — a copied
    passage straddling a chunk boundary is invisible there but is a run
    here, and max_run_tokens/dup_token_coverage are the per-doc numbers
    a remove-duplicated-spans pass acts on. One word per shuffled row
    (bounded ROWS window builds the grams — never an O(len²) explode of
    positions against word arrays); dup test is one md5-partitioned
    COUNT window; rollups reuse the doc partitioning."""
    from ibis_flink_example_spark.operators.dedup import substring_dup_runs

    aug = _with_planted_dups(load_table(spark, sf_dir, "documents"))
    return substring_dup_runs(aug, id_col="doc_id", text_col="text", k=10)


@query(
    "dedup_substring_attribution",
    # Same stride-1 anchor table as dedup_substring_runs, then occurrence
    # PAIRS along constant diagonals (pos_a - pos_b) coalesced into
    # maximal shared runs per (doc_a, doc_b) — the provenance step. The
    # hot-gram cap (occurrences <= 50) is mirrored exactly: it is a
    # deterministic function of the corpus, not an engine heuristic.
    oracle="""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0
), w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM aug
), grams AS (
  SELECT doc_id, t.i AS pos,
    md5(array_to_string(list_slice(ws, t.i + 1, t.i + 10), ' ')) AS h
  FROM w, UNNEST(range(0, GREATEST(len(ws) - 9, 0))) AS t(i)
), occ AS (
  SELECT doc_id, pos, h FROM (
    SELECT doc_id, pos, h, COUNT(*) OVER (PARTITION BY h) AS cnt FROM grams
  ) WHERE cnt >= 2 AND cnt <= 50
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa,
         a.pos - b.pos AS diag
  FROM occ a JOIN occ b ON a.h = b.h AND a.doc_id < b.doc_id
), l AS (
  SELECT id_a, id_b, diag, pa,
    CASE WHEN pa - LAG(pa) OVER wd = 1 THEN 0 ELSE 1 END AS brk
  FROM pairs WINDOW wd AS (PARTITION BY id_a, id_b, diag ORDER BY pa)
), runs AS (
  SELECT id_a, id_b, diag,
         SUM(brk) OVER (PARTITION BY id_a, id_b, diag ORDER BY pa) AS run_id,
         pa
  FROM l
), agg AS (
  SELECT id_a, id_b, diag, run_id, COUNT(*) AS anchors
  FROM runs GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b,
  CAST(COUNT(*) AS BIGINT) AS n_shared_runs,
  CAST(SUM(anchors) AS BIGINT) AS shared_anchors,
  CAST(MAX(anchors) + 9 AS BIGINT) AS max_shared_run_tokens
FROM agg GROUP BY 1, 2
""",
)
def dedup_substring_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document substring-run ATTRIBUTION (VERDICT r11 #7a —
    operators/dedup.py:substring_dup_attribution): which (doc_a, doc_b)
    pairs share maximal duplicated runs, over the same planted-dup
    corpus as dedup_substring_runs. The removal-policy provenance table
    Lee et al.'s ExactSubstr pass acts on: per pair, how many maximal
    shared runs, how many shared anchors, and the longest shared span in
    words. Pair generation is the hash-keyed occurrence self-join with
    the >= 2 duplication filter and the <= 50 hot-gram cap (both
    deterministic, both mirrored in the oracle); shared runs coalesce by
    gaps-and-islands along constant (pos_a - pos_b) diagonals — the
    suffix-array extend step as window arithmetic."""
    from ibis_flink_example_spark.operators.dedup import (
        substring_dup_attribution,
    )

    aug = _with_planted_dups(load_table(spark, sf_dir, "documents"))
    return substring_dup_attribution(
        aug, id_col="doc_id", text_col="text", k=10,
        max_occurrences_per_gram=50,
    )


_CONTAM_GRAMS_SQL = """CASE WHEN len(ws) >= 13
      THEN list_transform(range(1, len(ws) - 11),
                          i -> array_to_string(list_slice(ws, i, i + 12), ' '))
      ELSE [array_to_string(ws, ' ')] END"""


@query(
    "contamination_leaderboard",
    # 13-gram eval-overlap hits attributed per (eval_set, train source),
    # ranked within each eval set — the decontaminate_ngram membership
    # test composed with dup_inflation_by_source's provenance rollup.
    oracle=rf"""
WITH ev AS (
  SELECT CASE WHEN doc_id % 2 = 0 THEN 'dev' ELSE 'test' END AS eval_set,
         regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS ws
  FROM documents WHERE doc_id % 97 = 0
), evg AS (
  SELECT DISTINCT eval_set, UNNEST({_CONTAM_GRAMS_SQL}) AS gram FROM ev
), tr AS (
  SELECT doc_id, source,
         regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS ws
  FROM documents WHERE doc_id % 97 <> 0
), trg AS (
  SELECT DISTINCT doc_id, UNNEST({_CONTAM_GRAMS_SQL}) AS gram FROM tr
), hits AS (
  SELECT DISTINCT evg.eval_set, trg.doc_id
  FROM trg JOIN evg USING (gram)
), src AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_train_docs FROM tr GROUP BY 1
), sets AS (
  SELECT DISTINCT eval_set FROM ev
), cont AS (
  SELECT h.eval_set, t.source,
         CAST(COUNT(DISTINCT h.doc_id) AS BIGINT) AS n_contaminated
  FROM hits h JOIN tr t ON t.doc_id = h.doc_id
  GROUP BY 1, 2
)
SELECT s.eval_set, d.source, d.n_train_docs,
  COALESCE(c.n_contaminated, 0) AS n_contaminated,
  CAST(COALESCE(c.n_contaminated, 0) * 1000000 // d.n_train_docs AS BIGINT)
    AS contamination_x1e6,
  CAST(ROW_NUMBER() OVER (PARTITION BY s.eval_set
       ORDER BY COALESCE(c.n_contaminated, 0) DESC, d.source) AS BIGINT)
    AS rank
FROM sets s CROSS JOIN src d
LEFT JOIN cont c ON c.eval_set = s.eval_set AND c.source = d.source
""",
)
def contamination_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-eval-set, per-domain contamination ranking (VERDICT r11 #7c —
    operators/text.py:contamination_hits): the 13-gram GPT-3-style
    overlap test attributed to WHICH eval set ('dev' / 'test' carved
    deterministically from every-97th doc) leaks into WHICH training
    source domain, ranked within each eval set — the table a data-vendor
    audit or a per-domain decontamination budget reads. Hit generation
    is the guarded-broadcast gram join (eval grams measured, broadcast
    under budget, shuffle fallback above); rollups are domain-sized;
    every (eval_set, source) cell is explicit, zeros included, so the
    leaderboard shape is stable as contamination goes to zero."""
    from ibis_flink_example_spark.operators.text import contamination_hits

    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 97 == 0
    train = docs.filter(~is_eval).select("doc_id", "source", "text")
    evald = docs.filter(is_eval).select(
        F.when(F.col("doc_id") % 2 == 0, F.lit("dev"))
        .otherwise(F.lit("test"))
        .alias("eval_set"),
        "text",
    )
    hits = contamination_hits(
        train,
        evald,
        id_col="doc_id",
        text_col="text",
        set_col="eval_set",
        n=13,
    )
    cont = (
        hits.join(train.select("doc_id", "source"), "doc_id")
        .groupBy("eval_set", "source")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_contaminated"))
    )
    src = train.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_train_docs")
    )
    from pyspark.sql import Window as W

    sets = evald.select("eval_set").distinct()
    w = W.partitionBy("eval_set").orderBy(
        F.desc("n_contaminated"), F.col("source")
    )
    return (
        sets.crossJoin(src)
        .join(cont, ["eval_set", "source"], "left")
        .select(
            "eval_set",
            "source",
            "n_train_docs",
            F.coalesce(F.col("n_contaminated"), F.lit(0))
            .cast("long")
            .alias("n_contaminated"),
        )
        .withColumn(
            "contamination_x1e6",
            F.expr(
                "CAST(n_contaminated * 1000000 DIV n_train_docs AS BIGINT)"
            ),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
    )


@query(
    "dedup_substring_removal",
    # Token-level removal: delete tokens covered only by NON-CANONICAL
    # duplicated windows (canonical = global min doc_id*2^20+pos per
    # hash), reassemble survivors in position order, digest. A fully
    # duplicated doc loses everything — md5('') on both sides, hence
    # the COALESCE.
    oracle="""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0
), w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM aug
), tok AS (
  SELECT doc_id, t.i AS pos, ws[t.i + 1] AS wd
  FROM w, UNNEST(range(0, len(ws))) AS t(i)
), grams AS (
  SELECT doc_id, t.i AS pos,
    md5(array_to_string(list_slice(ws, t.i + 1, t.i + 10), ' ')) AS h
  FROM w, UNNEST(range(0, GREATEST(len(ws) - 9, 0))) AS t(i)
), dup AS (
  SELECT doc_id, pos, enc, canon_enc FROM (
    SELECT doc_id, pos, doc_id * 1048576 + pos AS enc,
      COUNT(*) OVER (PARTITION BY h) AS cnt,
      MIN(doc_id * 1048576 + pos) OVER (PARTITION BY h) AS canon_enc
    FROM grams
  ) WHERE cnt >= 2
), covered AS (
  SELECT doc_id, pos + t.o AS pos, (enc = canon_enc) AS canon
  FROM dup, UNNEST(range(0, 10)) AS t(o)
), removed AS (
  SELECT doc_id, pos FROM covered
  GROUP BY 1, 2
  HAVING MAX(CASE WHEN canon THEN 1 ELSE 0 END) = 0
), marked AS (
  SELECT t.doc_id, t.pos, t.wd, (r.pos IS NOT NULL) AS rm
  FROM tok t LEFT JOIN removed r
    ON r.doc_id = t.doc_id AND r.pos = t.pos
)
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
  md5(COALESCE(string_agg(CASE WHEN NOT rm THEN wd END, ' ' ORDER BY pos), ''))
    AS clean_md5
FROM marked GROUP BY 1
HAVING SUM(CASE WHEN rm THEN 1 ELSE 0 END) > 0
""",
)
def dedup_substring_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVAL transform completing the ExactSubstr trilogy
    (runs -> attribution -> removal; operators/dedup.py:
    substring_dup_removal): over the planted-dup corpus, delete every
    token lying only inside non-canonical duplicated 10-word windows —
    one canonical copy of each duplicated span survives (the global
    min-(doc,pos) occurrence), unique text is untouched, and each
    affected document reports its surviving-text digest. On this
    corpus the planted full-copy docs lose ALL tokens (their every
    window is non-canonical) while the originals lose none — exactly
    first-occurrence-wins at span granularity. Same anchor machinery
    and scale shape as dedup_substring_runs plus one k-bounded explode
    of the duplicated subset and one doc-keyed reassembly."""
    from ibis_flink_example_spark.operators.dedup import (
        substring_dup_removal,
    )

    aug = _with_planted_dups(load_table(spark, sf_dir, "documents"))
    return substring_dup_removal(aug, id_col="doc_id", text_col="text", k=10)


_PII_PLANT_SQL = (
    "CASE WHEN doc_id % 23 = 0 THEN ' reach me at user' || "
    "CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END || "
    "CASE WHEN doc_id % 29 = 0 THEN ' call +1-555-0199' ELSE '' END || "
    "CASE WHEN doc_id % 31 = 0 THEN ' from 10.0.0.7' ELSE '' END"
)
# Spark spells VARCHAR casts as STRING; everything else is shared text
_PII_PLANT_SPARK = _PII_PLANT_SQL.replace("AS VARCHAR", "AS STRING")


@query(
    "pii_incidence_by_source",
    # Patterns are the PII_PATTERNS dialect subset (Java regex == RE2 ==
    # DuckDB, no lookaround/backrefs); counts via leftmost
    # non-overlapping matches in both engines. Witnesses are PLANTED
    # deterministically (the fixture has zero natural PII — the
    # trivially-green trap) and mirrored verbatim in the oracle.
    oracle=rf"""
WITH aug AS (
  SELECT doc_id, source, text || {_PII_PLANT_SQL} AS text FROM documents
), c AS (
  SELECT source,
    len(regexp_extract_all(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}')) AS n_email,
    len(regexp_extract_all(text, '\+[0-9]{{1,2}}-[0-9]{{3}}-[0-9]{{4}}'))
      AS n_phone,
    len(regexp_extract_all(text, '([0-9]{{1,3}}\.){{3}}[0-9]{{1,3}}')) AS n_ip
  FROM aug
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN n_email + n_phone + n_ip > 0 THEN 1 ELSE 0 END)
       AS BIGINT) AS n_docs_with_pii,
  CAST(SUM(n_email) AS BIGINT) AS n_email,
  CAST(SUM(n_phone) AS BIGINT) AS n_phone,
  CAST(SUM(n_ip) AS BIGINT) AS n_ip,
  CAST(SUM(CASE WHEN n_email + n_phone + n_ip > 0 THEN 1 ELSE 0 END)
       * 1000000 // COUNT(*) AS BIGINT) AS pii_rate_x1e6
FROM c GROUP BY 1
""",
)
def pii_incidence_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 governance rollup: per-source PII incidence — document rate and
    per-kind match counts for the email/phone/IPv4 patterns
    (operators/text.py:PII_PATTERNS, the engine-portable regex dialect
    redact_pii scrubs) — the audit a data-governance review reads
    BEFORE the redaction pass runs, and the number that decides whether
    a source needs it at all. Witnesses are planted deterministically
    (every 23rd/29th/31st doc gains an email/phone/IP suffix; the
    synthetic corpus has zero natural PII) so the row proves the
    counters count. Map-only pattern counting fused into the scan; one
    source-keyed rollup with map-side partials."""
    from ibis_flink_example_spark.operators.text import PII_PATTERNS

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.expr(f"text || {_PII_PLANT_SPARK}").alias("text"),
    )
    counted = docs.select(
        "source",
        *[
            F.regexp_count(F.col("text"), F.lit(pat)).alias(f"n_{kind}")
            for kind, (pat, _) in PII_PATTERNS.items()
        ],
    )
    any_pii = (F.col("n_email") + F.col("n_phone") + F.col("n_ipv4")) > 0
    return counted.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count(F.when(any_pii, 1)).cast("long").alias("n_docs_with_pii"),
        F.sum("n_email").cast("long").alias("n_email"),
        F.sum("n_phone").cast("long").alias("n_phone"),
        F.sum("n_ipv4").cast("long").alias("n_ip"),
        F.expr(
            "CAST(COUNT(CASE WHEN n_email + n_phone + n_ipv4 > 0 THEN 1 END)"
            " * 1000000 DIV COUNT(1) AS BIGINT)"
        ).alias("pii_rate_x1e6"),
    )


@query(
    "domain_mixture_weights",
    # DoReMi/data-mixing shape: per-domain resampling weights to hit a
    # UNIFORM target mixture, computed in pure integer arithmetic
    # (round-half-up rational (2e6*total + k*n) // (2*k*n)) so the
    # fixed-point weights are bit-identical across engines.
    oracle="""
WITH d AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
), t AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS k FROM d
)
SELECT d.lang, d.n_docs, d.n_tokens,
  CAST((1000000 * d.n_tokens) // t.total AS BIGINT) AS share_x1e6,
  CAST((2000000 * t.total + t.k * d.n_tokens)
       // (2 * t.k * d.n_tokens) AS BIGINT) AS weight_x1e6
FROM d, t
""",
)
def domain_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture reweighting (the DoReMi-family control knob):
    per-domain (language) token counts and the resampling weight that
    flattens the corpus to a uniform domain mixture — weight(d) =
    target_share / actual_share = total/(k * tokens_d). One scan + one
    tiny per-domain aggregate; the weights table then drives the
    map-only hash-threshold samplers (operators/sampling.py) with no
    further corpus passes. Integer round-half-up keeps the fixed-point
    weights engine-exact (see oracle note)."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
    )
    t = d.agg(
        F.sum("n_tokens").alias("total"), F.count(F.lit(1)).alias("k")
    )
    return (
        d.crossJoin(F.broadcast(t))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            F.expr("(1000000 * n_tokens) DIV total").cast("bigint").alias("share_x1e6"),
            F.expr("(2000000 * total + k * n_tokens) DIV (2 * k * n_tokens)")
            .cast("bigint")
            .alias("weight_x1e6"),
        )
    )


@query(
    "embedding_norms_arrow",
    # mapInArrow result vs pure-SQL integer algebra: per-element
    # round-half-up 1e6 quantization (identical IEEE sequence both sides)
    # then int64 sum of squares — order-free, so numpy-vectorized and SQL
    # list-fold agree bit-for-bit.
    oracle="""
SELECT vec_id,
  -- COALESCE pins the empty/NULL-vector semantics to the operator's
  -- (0 dims, 0 norm): list_sum over an empty list is NULL in SQL while
  -- the Arrow offsets difference is 0 — without the pin a future fixture
  -- with a null vector would hash-mismatch
  CAST(COALESCE(len(embedding), 0) AS INTEGER) AS n_dims,
  CAST(COALESCE(list_sum(list_transform(embedding,
    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
         * CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))), 0)
    AS BIGINT) AS norm2_x1e12
FROM embeddings
""",
)
def embedding_norms_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 mapInArrow (Arrow-native batch UDF — the last Python
    integration surface next to pandas UDF / mapInPandas /
    applyInPandas(WithState) / UDTF): per-vector quantized squared L2
    norms computed zero-copy on Arrow list buffers (flatten once,
    vectorize over the whole batch, reassemble by offsets — no pandas
    object overhead, no per-row Python). Full value oracle via the
    order-free integer algebra (operators/similarity.py:
    arrow_quantized_norms)."""
    em = load_table(spark, sf_dir, "embeddings")
    return S.arrow_quantized_norms(em, id_col="vec_id", vec_col="embedding")


@query(
    "vocab_growth_prefix",
    # Heaps'-law vocabulary growth over corpus prefixes: bucket documents
    # by doc_id DIV 25 (arrival-order proxy), charge each distinct term to
    # the FIRST bucket it appears in, then cumulative-sum new terms and
    # token counts along the bucket axis. Pure integer counts; the only
    # unpartitioned windows run over the tiny per-bucket aggregate frame
    # (|buckets| rows), never over tokens. A bucket whose documents yield
    # zero qualifying tokens is absent from BOTH engines' outputs by the
    # same rule (no toks rows), so the spine stays consistent.
    oracle=rf"""
WITH {_TF_CTE}, first_seen AS (
  SELECT term, MIN(doc_id // 25) AS bucket FROM toks GROUP BY 1
), new_terms AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_terms
  FROM first_seen GROUP BY 1
), bucket_tokens AS (
  SELECT doc_id // 25 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_tokens
  FROM toks GROUP BY 1
)
SELECT b.bucket,
  b.n_tokens,
  CAST(SUM(b.n_tokens) OVER (ORDER BY b.bucket) AS BIGINT) AS cum_tokens,
  COALESCE(n.new_terms, 0) AS new_terms,
  CAST(SUM(COALESCE(n.new_terms, 0)) OVER (ORDER BY b.bucket) AS BIGINT)
    AS cum_vocab
FROM bucket_tokens b LEFT JOIN new_terms n ON n.bucket = b.bucket
""",
)
def vocab_growth_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 corpus diagnostics: the vocabulary-growth (Heaps'-law) curve a
    tokenizer-budget decision reads — new distinct terms and cumulative
    vocabulary per corpus prefix bucket. Two keyed aggregations (term ->
    first bucket, bucket -> token count) shuffle on term/bucket with
    map-side partials; the cumulative windows run over the |buckets|-row
    rollup, so no global sort ever touches token-level data."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = X.doc_terms(docs, id_col="doc_id", text_col="text").select(
        "term", F.expr("doc_id DIV 25").alias("bucket")
    )
    first_seen = toks.groupBy("term").agg(F.min("bucket").alias("bucket"))
    new_terms = first_seen.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("new_terms")
    )
    bucket_tokens = toks.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        bucket_tokens.join(new_terms, "bucket", "left")
        .select(
            "bucket",
            "n_tokens",
            F.sum("n_tokens").over(w).alias("cum_tokens"),
            F.coalesce(F.col("new_terms"), F.lit(0)).alias("new_terms"),
            F.sum(F.coalesce(F.col("new_terms"), F.lit(0)))
            .over(w)
            .alias("cum_vocab"),
        )
    )


@query(
    "dedup_keep_best",
    # Survivor selection policy beyond min-id: within each exact-content
    # duplicate cluster (md5 digest), keep the BEST copy by
    # (longest n_chars, then lowest doc_id) — the rule curation jobs use
    # when duplicates differ in truncation or metadata quality. One
    # shuffle on the digest; the rank is a WindowGroupLimit (top-1 per
    # key), never a self-join.
    oracle="""
WITH ranked AS (
  SELECT doc_id, lang, source, n_chars,
    md5(text) AS digest,
    row_number() OVER (
      PARTITION BY md5(text) ORDER BY n_chars DESC, doc_id ASC
    ) AS rn,
    COUNT(*) OVER (PARTITION BY md5(text)) AS cluster_size
  FROM documents
)
SELECT doc_id, lang, source,
  CAST(n_chars AS BIGINT) AS n_chars,
  CAST(cluster_size AS BIGINT) AS cluster_size
FROM ranked WHERE rn = 1
""",
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 survivor policy: exact dedup that keeps the highest-quality
    copy per content cluster (longest, then smallest id) instead of the
    min-id row — plus the cluster size for audit. Digest computed once in
    the scan projection; the group-limit and the size both ride the same
    single digest-keyed exchange."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select(
        "doc_id", "lang", "source", "n_chars", F.md5("text").alias("digest")
    )
    w = Window.partitionBy("digest").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    wc = Window.partitionBy("digest")
    return (
        hashed.select(
            "doc_id",
            "lang",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).cast("long").alias("cluster_size"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "token_budget_selection",
    # Pretraining-mix assembly: per language, admit documents in
    # deterministic quality order (n_chars DESC, doc_id ASC) until the
    # running token total passes a 20k-token budget — the first document
    # that CROSSES the budget is still admitted (running-sum <= budget
    # checked on the PREVIOUS row's cumulative, i.e. cum - tokens <
    # budget), so the budget is always reached when supply allows.
    # Integer tokens (whitespace tokenizer), integer cumulative sums.
    oracle=r"""
WITH toks AS (
  SELECT doc_id, lang,
    CAST(len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) AS BIGINT) AS n_tokens,
    n_chars
  FROM documents
), ordered AS (
  SELECT doc_id, lang, n_tokens,
    CAST(SUM(n_tokens) OVER (
      PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS BIGINT) AS cum_tokens
  FROM toks
)
SELECT lang,
  CAST(COUNT(*) AS BIGINT) AS n_docs_selected,
  CAST(MAX(cum_tokens) AS BIGINT) AS tokens_selected,
  CAST(MIN(n_tokens) AS BIGINT) AS smallest_doc_tokens
FROM ordered
WHERE cum_tokens - n_tokens < 20000
GROUP BY 1
""",
)
def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling/mix surface: select documents per language up to a 20k
    token budget in deterministic quality order. One per-lang window over
    (tokens, order keys) — the scan projects three small columns and the
    heavy text column is only touched to count tokens map-side; at 100 TB
    the same plan holds with the token count precomputed or sketched."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        X.token_count_whitespace("text").cast("long").alias("n_tokens"),
        "n_chars",
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ordered = toks.select(
        "lang",
        "n_tokens",
        F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
    )
    return (
        ordered.filter(F.col("cum_tokens") - F.col("n_tokens") < 20_000)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs_selected"),
            F.max("cum_tokens").alias("tokens_selected"),
            F.min("n_tokens").alias("smallest_doc_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Sparse retrieval + hashed features (operators/retrieval.py) — round 8.
# Registered AFTER the 50-slot driver window by design: round 8 spends the
# external budget on re-verification (queries.py rotation note); these get
# their first driver rows in r9 and full oracle coverage in CI meanwhile.
# ---------------------------------------------------------------------------

# 'dup' is the corpus's one rare term (planted-duplicate marker, df ~5%
# vs ~78% for everything else) — the query mixes one rare and two common
# terms so both idf regimes are exercised. The oracle interpolates the
# SAME constant (single source of truth — editing one side can't diverge).
_BM25_QUERY_TERMS = ("dup", "spark", "window")
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_QUERY_TERMS)

# The BM25 scoring pipeline as oracle CTEs — ONE definition shared by the
# bm25_topk_docs and rrf_hybrid_retrieval oracles (review r9: a second
# hand-copy of the 44/20/6/18 coefficients and the idf clamp could drift
# from a future re-derivation edited in only one place). Expects the
# {_TF_CTE} toks/tf CTEs in scope; yields per_term(doc_id, term_score).
_BM25_SCORE_CTES = rf"""dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
scal AS (
  SELECT (SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS t_tokens,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs
),
tq AS (
  SELECT doc_id, term, tf FROM tf
  WHERE term IN ({_BM25_TERMS_SQL})
),
dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tq GROUP BY 1),
per_term AS (
  SELECT tq.doc_id,
    (GREATEST(CAST(1 AS HUGEINT),
              CAST(floor(log2(CAST(2 * (s.n_docs + 1) AS DOUBLE)
                              / CAST(2 * dfq.df + 1 AS DOUBLE))) AS HUGEINT))
       * 1000000 * 44 * CAST(s.t_tokens AS HUGEINT) * tq.tf)
    // (20 * CAST(s.t_tokens AS HUGEINT) * tq.tf
        + 6 * CAST(s.t_tokens AS HUGEINT)
        + 18 * CAST(dl.dl AS HUGEINT) * s.n_docs) AS term_score
  FROM tq JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN scal s
)"""


@query(
    "bm25_topk_docs",
    # Whole-bit BM25 (k1=6/5, b=3/4 cleared to integer coefficients:
    # NUM=44*T*tf, DEN=20*T*tf+6*T+18*dl*N; idf quantized to
    # greatest(1, floor(log2(2(N+1)/(2df+1)))) — one correctly-rounded
    # integer division then log2, floor-stable across engines by the
    # doc_unigram_surprisal gap argument; the Lucene-style clamp at 1
    # keeps common-term matches ranked by tf saturation instead of
    # zeroing). Fixed-point x1e6 via integer floor division: Spark
    # DIV == DuckDB // on positive operands.
    oracle=rf"""
WITH {_TF_CTE},
{_BM25_SCORE_CTES}
SELECT doc_id,
  CAST(SUM(term_score) AS BIGINT) AS score_x1e6,
  CAST(COUNT(*) AS BIGINT) AS n_terms_matched
FROM per_term
GROUP BY 1
ORDER BY score_x1e6 DESC, doc_id ASC
LIMIT 25
""",
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3's sparse twin: BM25 keyword retrieval over the documents table
    (operators/retrieval.py:bm25_topk) — top-25 docs for a fixed 3-term
    query, integer-exact whole-bit scoring. Query-term filtering happens
    in the scan stage (only matches shuffle); ranking is
    TakeOrderedAndProject, never a global sort."""
    from ibis_flink_example_spark.operators import retrieval as R

    docs = load_table(spark, sf_dir, "documents")
    return R.bm25_topk(docs, _BM25_QUERY_TERMS, top_k=25)


@query(
    "vocab_coverage_curve",
    # The oracle computes the SAME rank/cumulative quantities with one
    # global window — value-identical because (bucket ASC, cnt DESC, term
    # ASC) is exactly the global (cnt DESC, term ASC) order; the engine
    # side uses the two-level bucketed scan for the 100 TB posture. The
    # crossing test is the integer inequality cum*100 >= t*T (> prev*100).
    oracle=r"""
WITH toks AS (
  SELECT t.term
  FROM documents,
       UNNEST(regexp_split_to_array(trim(lower(text)), '[ \t\n\x0B\f\r]+'))
         AS t(term)
), cnt AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY 1
), ranked AS (
  SELECT
    CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC) AS BIGINT) AS rank,
    CAST(SUM(cnt) OVER (ORDER BY cnt DESC, term ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
    cnt,
    CAST(SUM(cnt) OVER () AS BIGINT) AS total_tokens,
    CAST(COUNT(*) OVER () AS BIGINT) AS vocab_size
  FROM cnt
)
SELECT CAST(t.target_pct AS BIGINT) AS target_pct, rank,
       cum AS cum_tokens, total_tokens, vocab_size
FROM ranked, UNNEST([50, 90, 99]) AS t(target_pct)
WHERE cum * 100 >= t.target_pct * total_tokens
  AND (cum - cnt) * 100 < t.target_pct * total_tokens
ORDER BY target_pct
""",
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 corpus statistic: the Zipf coverage curve — the smallest
    frequency-rank whose cumulative token mass reaches 50/90/99% of the
    corpus (operators/text.py:vocab_coverage). The number that sizes a
    tokenizer vocabulary and prices the tail. Engine side runs the
    two-level log2-bucketed prefix sum (no global-ORDER-BY window over
    the vocabulary — billions of types at 100 TB); the crossing is an
    exact integer inequality, so each target maps to exactly one rank."""
    docs = load_table(spark, sf_dir, "documents")
    return X.vocab_coverage(docs, text_col="text", targets=(50, 90, 99))


# Gold-relevance rule for the ranking-metrics QA: a doc is relevant iff it
# contains the exact adjacent bigram "spark window" — BM25 is bag-of-words,
# the gold rule is the PHRASE intent, so the metric measures something the
# ranker does not directly optimize (the standard eval asymmetry). One rule
# string, used verbatim by both sides.
_NDCG_K = 10


def _ndcg_metric_tail_sql(k: int) -> str:
    from ibis_flink_example_spark.operators.evaluation import _dcg_discounts_x1e6

    disc = _dcg_discounts_x1e6(k)
    cum = [sum(disc[: j + 1]) for j in range(k)]
    disc_sql = "[" + ", ".join(str(d) for d in disc) + "]"
    cum_sql = "[" + ", ".join(str(c) for c in cum) + "]"
    return rf"""
gold AS (
  SELECT doc_id FROM documents
  WHERE concat(' ', lower(regexp_replace(trim(text), '[ \t\n\x0B\f\r]+', ' ', 'g')), ' ')
        LIKE '% spark window %'
),
nrel AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rel_total FROM gold),
hits AS (SELECT rank FROM gold JOIN cand USING (doc_id)),
m AS (
  SELECT
    CAST(COUNT(CASE WHEN rank <= {k} THEN 1 END) AS BIGINT) AS hits_at_k,
    CAST(COALESCE(MIN(rank), 0) AS BIGINT) AS first_rel_rank,
    CAST(COALESCE(SUM(CASE WHEN rank <= {k}
         THEN {disc_sql}[rank] ELSE 0 END), 0) AS BIGINT) AS dcg_at_k
  FROM hits
)
SELECT CAST({k} AS BIGINT) AS k, n_rel_total, hits_at_k, first_rel_rank,
  CAST(CASE WHEN first_rel_rank > 0 THEN 1000000 // first_rel_rank
       ELSE 0 END AS BIGINT) AS mrr_x1e6,
  dcg_at_k,
  CAST(CASE WHEN n_rel_total > 0
       THEN {cum_sql}[LEAST(n_rel_total, {k})] END AS BIGINT) AS idcg_at_k,
  CAST(CASE WHEN n_rel_total > 0
       THEN CAST(dcg_at_k AS HUGEINT) * 1000000
            // {cum_sql}[LEAST(n_rel_total, {k})] END AS BIGINT)
    AS ndcg_at_k_x1e6,
  CAST(hits_at_k * 1000000 // {k} AS BIGINT) AS precision_at_k_x1e6,
  CAST(CASE WHEN n_rel_total > 0 THEN hits_at_k * 1000000 // n_rel_total
       END AS BIGINT) AS recall_at_k_x1e6
FROM m CROSS JOIN nrel
"""


@query(
    "retrieval_ndcg_mrr",
    oracle=rf"""
WITH {_TF_CTE},
{_BM25_SCORE_CTES},
scores AS (
  SELECT doc_id, CAST(SUM(term_score) AS BIGINT) AS score_x1e6
  FROM per_term GROUP BY 1
),
cand AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY score_x1e6 DESC, doc_id ASC) AS rank
  FROM scores ORDER BY score_x1e6 DESC, doc_id ASC LIMIT 25
),
{_ndcg_metric_tail_sql(_NDCG_K)}
""",
)
def retrieval_ndcg_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality QA for the sparse retrieval stack
    (operators/evaluation.py:ranking_metrics): nDCG@10, MRR,
    precision/recall@10 of the BM25 top-25 against a phrase-intent gold
    set (docs containing the exact bigram "spark window"). The metric pass
    a retrieval pipeline is judged by — calibration/ROC cover the
    CLASSIFIER scores, this covers the RANKER. All-integer: the nDCG
    discounts are precomputed x1e6 literals shared with the oracle, so no
    engine ever evaluates a transcendental. Scale shape: the candidate
    frame is the bm25 top-25 (bounded), gold reduces through a broadcast
    semi-join, and the only corpus-scale aggregate is COUNT(gold)."""
    from ibis_flink_example_spark.operators import retrieval as R
    from ibis_flink_example_spark.operators.evaluation import ranking_metrics
    from ibis_flink_example_spark.operators.text import WS_SPLIT

    docs = load_table(spark, sf_dir, "documents")
    ranked = R.bm25_topk(docs, _BM25_QUERY_TERMS, top_k=25)
    normalized = F.lower(F.regexp_replace(F.trim(F.col("text")), WS_SPLIT, " "))
    gold = docs.filter(
        F.concat(F.lit(" "), normalized, F.lit(" ")).contains(" spark window ")
    ).select("doc_id")
    return ranking_metrics(
        ranked, gold, id_col="doc_id", order_cols=("score_x1e6",), k=_NDCG_K
    )


@query(
    "feature_hash_buckets",
    # md5-nibble hashing trick: bucket = hi_nibble*4 + lo_nibble%4 over
    # instr('0123456789abcdef', ...) — byte-identical hex in both engines.
    oracle=rf"""
WITH {_TF_CTE},
vocab AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS occ FROM toks GROUP BY 1),
vb AS (
  SELECT CAST((instr('0123456789abcdef', substr(md5(term), 1, 1)) - 1) * 4
            + (instr('0123456789abcdef', substr(md5(term), 2, 1)) - 1) % 4
         AS BIGINT) AS bucket,
         occ
  FROM vocab
)
SELECT bucket,
  CAST(COUNT(*) AS BIGINT) AS n_terms,
  CAST(SUM(occ) AS BIGINT) AS n_occurrences
FROM vb GROUP BY 1
""",
)
def feature_hash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick collision profile
    (operators/retrieval.py:feature_hash_profile): the vocabulary mapped
    to 64 hashed feature slots with per-slot term and occurrence loads —
    the sizing QA before hashed-feature training. Occurrences collapse to
    the vocab map-side; nothing doc-keyed shuffles."""
    from ibis_flink_example_spark.operators import retrieval as R

    docs = load_table(spark, sf_dir, "documents")
    return R.feature_hash_profile(docs, n_buckets=64)


@query(
    "dsir_target_weights",
    # Whole-bit DSIR: per-doc sum of c_t * (bits_raw - bits_tgt) with
    # add-one-smoothed whole-bit surprisal per corpus; all floors are on
    # log2 of integers (gap argument), all sums integer.
    oracle=rf"""
WITH {_TF_CTE},
tfs AS (
  SELECT t.doc_id, d.source, t.term, t.tf
  FROM tf t JOIN documents d USING (doc_id)
),
cnt_raw AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt_r FROM tf GROUP BY 1),
cnt_tgt AS (
  SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt_t
  FROM tfs WHERE source = 'src0' GROUP BY 1
),
stats AS (
  SELECT c.term, c.cnt_r, COALESCE(ct.cnt_t, 0) AS cnt_t
  FROM cnt_raw c LEFT JOIN cnt_tgt ct USING (term)
),
scal AS (
  SELECT CAST(SUM(cnt_r) AS BIGINT) AS t_raw,
         CAST(SUM(cnt_t) AS BIGINT) AS t_tgt,
         CAST(COUNT(*) AS BIGINT) AS v_terms
  FROM stats
),
bits AS (
  SELECT term,
    CAST(floor(log2(t_raw + v_terms)) AS BIGINT)
      - CAST(floor(log2(cnt_r + 1)) AS BIGINT) AS bits_raw,
    CAST(floor(log2(t_tgt + v_terms)) AS BIGINT)
      - CAST(floor(log2(cnt_t + 1)) AS BIGINT) AS bits_tgt
  FROM stats CROSS JOIN scal
)
SELECT tfs.doc_id, tfs.source,
  CAST(SUM(tfs.tf) AS BIGINT) AS n_tokens,
  CAST(SUM(tfs.tf * (bits.bits_raw - bits.bits_tgt)) AS BIGINT) AS weight_bits
FROM tfs JOIN bits USING (term)
GROUP BY 1, 2
""",
)
def dsir_target_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-targeted data selection signal
    (operators/retrieval.py:dsir_weight_bits): per-doc whole-bit
    log-likelihood ratio of the doc's unigrams under the src0 domain LM
    vs the raw-corpus LM — the DSIR importance weight, integer-quantized.
    Complements domain_mixture_weights (which reweights domains wholesale)
    with a per-document score."""
    from ibis_flink_example_spark.operators import retrieval as R

    docs = load_table(spark, sf_dir, "documents")
    return R.dsir_weight_bits(docs, target_source="src0")


def _top_pc_oracle(
    dim: int = 64,
    iters: int = 6,
    scale: int = 100_000,
    quant: int = 1_000_000,
) -> str:
    """Unrolled power-iteration oracle (the PageRank idiom): each step is
    a CTE pair (w_i, m_i, v_i) repeating the exact integer recurrence of
    operators/similarity.py:top_pc_power_iteration."""
    steps = []
    for i in range(1, iters + 1):
        p = f"v{i - 1}"
        steps.append(
            f"""w{i} AS (
  SELECT c.j AS wd, CAST(SUM(c.g * v.val) AS HUGEINT) AS wv
  FROM cells c JOIN {p} v ON c.k = v.d GROUP BY 1
), m{i} AS (
  SELECT GREATEST(MAX(ABS(wv)), CAST(1 AS HUGEINT)) AS m FROM w{i}
), v{i} AS (
  -- ABS(wv)*scale <= ~1.6e37 with the 1e5 norm scale — inside HUGEINT
  SELECT wd AS d,
    CASE WHEN wv < 0 THEN -((ABS(wv) * {scale}) // m)
         ELSE (wv * {scale}) // m END AS val
  FROM w{i}, m{i}
)"""
        )
    unrolled = ",\n".join(steps)
    return f"""
WITH q AS (
  SELECT list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {quant} + 0.5) AS BIGINT)) AS qa
  FROM embeddings
),
cellraw AS (
  SELECT UNNEST(flatten(list_transform(range(0, {dim}), j ->
    list_transform(range(0, {dim}), k ->
      {{'j': j, 'k': k,
        'p': CAST(qa[j + 1] AS HUGEINT) * CAST(qa[k + 1] AS HUGEINT)}})))) AS s
  FROM q
),
cells AS (
  SELECT s.j AS j, s.k AS k, CAST(SUM(s.p) AS HUGEINT) AS g
  FROM cellraw GROUP BY 1, 2
),
v0 AS (SELECT UNNEST(range(0, {dim})) AS d, CAST({scale} AS HUGEINT) AS val),
{unrolled},
anch AS (SELECT val AS vmax FROM v{iters} ORDER BY ABS(val) DESC, d ASC LIMIT 1),
sgn AS (SELECT CASE WHEN vmax < 0 THEN -1 ELSE 1 END AS s FROM anch)
SELECT CAST(d AS BIGINT) AS dim_idx, CAST(val * s AS BIGINT) AS pc_x1e5
FROM v{iters}, sgn
"""


@query("embedding_top_pc", oracle=_top_pc_oracle())
def embedding_top_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space PCA (X3 QA): the dominant principal direction of
    the embedding cloud by 6 steps of fixed-point power iteration
    (operators/similarity.py:top_pc_power_iteration). The Gram build is
    the ONLY corpus-sized pass (in-row Generate, dim^2 map-side-combined
    cells, vectors never reshuffle); iterations run on the 4096-cell
    frame regardless of corpus size — the same iterative-loop discipline
    as PageRank, with the oracle unrolled CTE-per-step."""
    from ibis_flink_example_spark.operators.similarity import (
        top_pc_power_iteration,
    )

    em = load_table(spark, sf_dir, "embeddings")
    return top_pc_power_iteration(em, vec_col="embedding", dim=64, iters=6)


# ---------------------------------------------------------------------------
# Round 9: hybrid retrieval fusion + classifier calibration
# (operators/retrieval.py:rrf_fuse, operators/evaluation.py) — the next
# tier the 100 TB brief implies past SURVEY §2: sparse+dense result-list
# fusion and the reliability-diagram QA that gates threshold decisions.
# ---------------------------------------------------------------------------

@query(
    "rrf_hybrid_retrieval",
    # RRF is integer-exact: each system contributes 1e6 DIV (60 + rank),
    # fused by integer SUM. The sparse leg is the bm25_topk_docs pipeline
    # cut at 50; the dense leg is the cosine_topk formulation (hash-proven
    # since r1/r4) ranked against query vector vec_id=0. Ranks are
    # ROW_NUMBER with id tiebreaks — deterministic in both engines.
    oracle=rf"""
WITH {_TF_CTE},
{_BM25_SCORE_CTES},
bm AS (
  SELECT doc_id, CAST(SUM(term_score) AS BIGINT) AS score_x1e6
  FROM per_term GROUP BY 1
  ORDER BY score_x1e6 DESC, doc_id ASC LIMIT 50
),
bmr AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY score_x1e6 DESC, doc_id ASC) AS rank
  FROM bm
),
q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id = 0),
dscored AS (
  SELECT e.vec_id,
    list_sum(list_transform(range(1, len(e.embedding) + 1),
      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE)))
    / ( sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
      * sqrt(list_sum(list_transform(range(1, len(q.qvec) + 1),
          i -> CAST(q.qvec[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE)))) ) AS cos
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
),
dnr AS (
  SELECT vec_id AS doc_id, rank FROM (
    SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id ASC) AS rank
    FROM dscored
  ) WHERE rank <= 50
),
contrib AS (
  SELECT doc_id, CAST(1000000 AS BIGINT) // (60 + rank) AS c FROM bmr
  UNION ALL
  SELECT doc_id, CAST(1000000 AS BIGINT) // (60 + rank) AS c FROM dnr
)
SELECT doc_id,
  CAST(SUM(c) AS BIGINT) AS rrf_x1e6,
  CAST(COUNT(*) AS BIGINT) AS n_systems
FROM contrib GROUP BY 1
ORDER BY rrf_x1e6 DESC, doc_id ASC LIMIT 25
""",
)
def rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid sparse+dense retrieval by reciprocal-rank fusion
    (operators/retrieval.py:rrf_fuse): the BM25 top-50 for the standing
    3-term query fused with the embedding-space cosine top-50 for query
    vector 0 (doc and vec ids share the fixture key space), k0=60,
    contributions in exact x1e6 integers. Rank-based fusion needs no
    score normalization — and is therefore integer-exact end-to-end. The
    fusion itself runs on top-k artifacts (tiny regardless of corpus
    size); the corpus-sized work stays inside the two retrievers, whose
    plans are audited separately."""
    from pyspark.sql.window import Window

    from ibis_flink_example_spark.operators import retrieval as R
    from ibis_flink_example_spark.operators import similarity as S2

    docs = load_table(spark, sf_dir, "documents")
    em = load_table(spark, sf_dir, "embeddings")
    sparse = R.bm25_topk(docs, _BM25_QUERY_TERMS, top_k=50)
    # rank over the 50-row artifact (single-partition window is fine on a
    # top-k result; the corpus never sees this exchange)
    sparse_r = sparse.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score_x1e6"), F.asc("doc_id")))
        .alias("rank"),
    )
    # .select() drops bm25_topk's checkpoint handle — re-attach (via the
    # centralized helper) so rrf_fuse can propagate it to the fused result
    # and loop callers can release_eager_checkpoints after consumption
    from ibis_flink_example_spark.operators.checkpoints import (
        attach_eager_checkpoints,
    )

    sparse_r = attach_eager_checkpoints(sparse_r, sparse)
    dense = S2.cosine_topk(
        em,
        em.filter(F.col("vec_id") == 0),
        id_col="vec_id",
        vec_col="embedding",
        query_id_col="vec_id",
        k=50,
    )
    dense_r = dense.select(F.col("vec_id").alias("doc_id"), "rank")
    return R.rrf_fuse(
        [sparse_r, dense_r], id_col="doc_id", k0=60, top_k=25
    )


def _lang_scored_sql(extra_cols: str = "") -> str:
    """The f/s oracle CTEs computing the x1e6 lexical English-ness score
    + gold ``lang = 'en'`` label — the ONE definition the calibration AND
    ROC oracle families share (a lexicon or denominator change edits this
    string once, or the families silently disagree about the same score).
    ``extra_cols`` threads grouping columns (e.g. ``"source, "``) through
    both CTEs for the grouped calibration arm."""
    return rf"""
f AS (
  SELECT {extra_cols}(lang = 'en') AS label,
    len(list_filter(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+'),
        w -> list_contains(['the','of','and','to','in','is','a'], lower(w)))) AS hits,
    len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) AS nw
  FROM documents
), s AS (
  SELECT {extra_cols}label,
         CAST(hits AS BIGINT) * 1000000 // GREATEST(nw, 1) AS score
  FROM f
)"""


@query(
    "lang_score_calibration",
    # Reliability-diagram bins, all-integer: the x1e6 stopword-ratio
    # score, decile bin = LEAST(9, score*10 // 1e6), per-bin integer sums
    # with positive-operand floor divisions (Spark DIV == DuckDB //).
    oracle="WITH " + _lang_scored_sql() + r""", b AS (
  SELECT LEAST(9, score * 10 // 1000000) AS bin, label, score FROM s
), g AS (
  SELECT bin,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
    CAST(SUM(score) AS HUGEINT) AS sum_score
  FROM b GROUP BY 1
)
SELECT CAST(bin AS BIGINT) AS bin, n_docs, n_pos,
  CAST(sum_score // n_docs AS BIGINT) AS mean_score_x1e6,
  CAST(CAST(n_pos AS HUGEINT) * 1000000 // n_docs AS BIGINT) AS pos_rate_x1e6,
  CAST(ABS(sum_score // n_docs
           - CAST(n_pos AS HUGEINT) * 1000000 // n_docs) AS BIGINT) AS gap_x1e6
FROM g
""",
)
def lang_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-calibration QA (operators/evaluation.py:calibration_bins):
    the engine's cheap lexical English-ness score — fraction of words in
    the en marker lexicon, x1e6 — binned into deciles against the gold
    ``lang == 'en'`` label. Each bin reports observed positive rate vs
    mean predicted score and their |gap| (what ECE averages): the
    reliability diagram a curation stack inspects before thresholding
    billions of docs on a quality/language classifier. One counts-only
    aggregation; row-level data never crosses the exchange."""
    from ibis_flink_example_spark.operators.evaluation import (
        calibration_bins,
        stopword_lang_score_x1e6,
    )
    from ibis_flink_example_spark.operators.text import LANG_MARKERS

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        stopword_lang_score_x1e6("text", LANG_MARKERS["en"]).alias("score_x1e6"),
        (F.col("lang") == "en").alias("is_en"),
    )
    return calibration_bins(
        scored, score_col="score_x1e6", label_col="is_en", n_bins=10
    )


@query(
    "calibration_by_source",
    # The grouped arm of calibration_bins: same all-integer bin stats,
    # keyed by (source, bin) — per-domain reliability, the form the
    # VERDICT-r8 brief asked for (a classifier can be calibrated in
    # aggregate yet badly off inside one domain).
    oracle="WITH " + _lang_scored_sql("source, ") + r""", b AS (
  SELECT source, LEAST(9, score * 10 // 1000000) AS bin, label, score FROM s
), g AS (
  SELECT source, bin,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
    CAST(SUM(score) AS HUGEINT) AS sum_score
  FROM b GROUP BY 1, 2
)
SELECT source, CAST(bin AS BIGINT) AS bin, n_docs, n_pos,
  CAST(sum_score // n_docs AS BIGINT) AS mean_score_x1e6,
  CAST(CAST(n_pos AS HUGEINT) * 1000000 // n_docs AS BIGINT) AS pos_rate_x1e6,
  CAST(ABS(sum_score // n_docs
           - CAST(n_pos AS HUGEINT) * 1000000 // n_docs) AS BIGINT) AS gap_x1e6
FROM g
""",
)
def calibration_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain reliability bins (the ``group_cols`` arm of
    operators/evaluation.py:calibration_bins): the English-ness score's
    calibration measured INSIDE each source domain — aggregate
    calibration can hide a domain whose score is systematically
    off, which is exactly what a per-domain threshold policy needs to
    know. Still one counts-only aggregation; output cardinality is
    |sources| x 10 bins."""
    from ibis_flink_example_spark.operators.evaluation import (
        calibration_bins,
        stopword_lang_score_x1e6,
    )
    from ibis_flink_example_spark.operators.text import LANG_MARKERS

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "source",
        stopword_lang_score_x1e6("text", LANG_MARKERS["en"]).alias("score_x1e6"),
        (F.col("lang") == "en").alias("is_en"),
    )
    return calibration_bins(
        scored,
        score_col="score_x1e6",
        label_col="is_en",
        n_bins=10,
        group_cols=("source",),
    )


@query(
    "posting_lists_top_terms",
    # Impact-ordered posting prefixes serialized deterministically
    # (tf desc, doc asc) — the journey-string idiom makes the whole index
    # artifact one scalar per term, value-hashable across engines.
    oracle=rf"""
WITH {_TF_CTE},
stats AS (
  SELECT term, CAST(SUM(tf) AS BIGINT) AS occurrences,
         CAST(COUNT(*) AS BIGINT) AS doc_freq
  FROM tf GROUP BY 1
  ORDER BY occurrences DESC, term ASC LIMIT 20
), ranked AS (
  SELECT tf.term, tf.doc_id, tf.tf,
         ROW_NUMBER() OVER (
           PARTITION BY tf.term ORDER BY tf.tf DESC, tf.doc_id ASC
         ) AS rnk
  FROM tf JOIN stats USING (term)
)
SELECT s.term, s.occurrences, s.doc_freq,
  string_agg(r.doc_id || ':' || r.tf, ',' ORDER BY r.tf DESC, r.doc_id ASC)
    AS postings_csv
FROM ranked r JOIN stats s USING (term)
WHERE r.rnk <= 10
GROUP BY 1, 2, 3
""",
)
def posting_lists_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped inverted-index build (operators/retrieval.py:posting_lists):
    top-20 terms by occurrences, each with its 10 highest-tf postings as
    a deterministic doc:tf CSV — the impact-ordered posting prefix BM25
    serving consumes for early-termination scoring. Term selection is
    TakeOrderedAndProject over the vocab-bounded rollup; selected terms
    broadcast back; the per-term cut plans as WindowGroupLimit so the
    corpus-sized posting stream is pruned per-partition before the full
    window materializes."""
    from ibis_flink_example_spark.operators.retrieval import posting_lists

    docs = load_table(spark, sf_dir, "documents")
    return posting_lists(docs, top_terms=20, postings_per_term=10)


# ---------------------------------------------------------------------------
# X5 x X2: image near-dup via perceptual-hash signatures (r10)
# ---------------------------------------------------------------------------


def _blockhash_sig_sql(src: str = "documents") -> str:
    """Generated oracle CTE block computing the 64-bit block-mean
    perceptual hash per document (mirrors
    operators/multimodal.py:blockhash_signatures bit for bit). LIST-based
    on purpose: a per-character UNNEST + substr formulation goes
    superlinear in DuckDB (substr is O(pos) — quadratic per doc — and the
    re-grouping dominates); here each doc is one codes list, block b's
    sum is a list slice over the closed-form boundaries of
    ``{{p : p*64 // n == b}}`` (0-based [ceil(b*n/64),
    ceil((b+1)*n/64) - 1] — the exact inverse image, so the COUNTED
    block sizes of the engine side are reproduced), the bit test is the
    same non-negative cross-multiplication, and the pack runs in HUGEINT
    shifts with one final signed-64 wrap. Linear: 5000 docs in ~1 s.
    Ends with a CTE named ``sig`` = (media_id, phash64)."""
    return f"""
codes AS (
  SELECT doc_id,
    list_transform(list_filter(regexp_split_to_array(text, ''), c -> c != ''),
                   c -> CAST(ascii(c) AS BIGINT)) AS px
  FROM {src}
), base AS (
  SELECT doc_id, px, len(px) AS n,
         COALESCE(list_sum(px), 0) AS total
  FROM codes
), packed AS (
  SELECT doc_id, n,
    (SELECT COALESCE(SUM(CASE
        WHEN ((b+1)*n + 63)//64 - (b*n + 63)//64 > 0
         AND list_sum(px[((b*n + 63)//64 + 1):(((b+1)*n + 63)//64)]) * n
             >= total * (((b+1)*n + 63)//64 - (b*n + 63)//64)
        THEN (1::HUGEINT << b) ELSE 0::HUGEINT END), 0::HUGEINT) AS s
     FROM range(0, 64) t(b)) AS s
  FROM base
), sig AS (
  SELECT doc_id AS media_id,
    CAST(CASE WHEN n = 0 THEN 0
         WHEN s >= 9223372036854775808::HUGEINT THEN s - 18446744073709551616::HUGEINT
         ELSE s END AS BIGINT) AS phash64
  FROM packed
)"""


@query(
    "image_blockhash_signatures",
    oracle="WITH " + _blockhash_sig_sql() + """
SELECT media_id, phash64 FROM sig
""",
)
def image_blockhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-mean perceptual hash per media payload
    (operators/multimodal.py:blockhash_signatures over documents_as_media
    — the X5 media framing: payload bytes stand in for the decoded pixel
    stream a real pipeline's mapInPandas decode arm would emit). 64
    integer-exact bits per image, 8 bytes regardless of payload size —
    the signature artifact image near-dup (and retrieval-time dedup)
    runs on. Map-only scale shape (plan-audited): block sums are in-row
    slice aggregates and packing is in-row bit math — ZERO exchanges,
    the whole operator pipelines into the scan."""
    docs = load_table(spark, sf_dir, "documents")
    media = M.documents_as_media(docs)
    sigs = M.blockhash_signatures(
        media.select("media_id", M.payload_pixel_codes("payload").alias("__px")),
        id_col="media_id",
        pixels_col="__px",
        sig_col="phash64",
    )
    return sigs


@query(
    "image_phash_neardup_pairs",
    oracle="WITH " + _blockhash_sig_sql() + """
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.phash64, b.phash64)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.media_id < b.media_id
WHERE bit_count(xor(a.phash64, b.phash64)) <= 12
""",
)
def image_phash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup candidate pairs
    (operators/multimodal.py:phash_neardup_pairs): blockhash signatures
    banded into 16 chunks of 4 bits (lossless for Hamming <= 15; the
    query's cut is <= 12), bucket-joined, verified by xor/popcount — the
    SimHash Hamming-LSH machinery (operators/dedup.py:hamming_band_pairs)
    reused over the image-signature space. The oracle is the all-pairs
    definition; the engine never materializes all pairs — only bucket
    co-occupants. 4-bit chunks have a 16-value domain, so at corpus scale
    the hot-bucket cap (drop_hot_keys) is mandatory — the query leaves it
    None so the oracle stays the pure definition at the wider <= 12 cut;
    the PRODUCTION configuration (8x8-bit banding, Hamming <= 7, cap ON)
    is registered and benched as ``image_phash_neardup_pairs_capped``
    below — copy that one at scale."""
    docs = load_table(spark, sf_dir, "documents")
    media = M.documents_as_media(docs)
    pairs = M.phash_neardup_pairs(
        media, max_hamming=12, n_chunks=16, max_bucket_size=None
    )
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


@query(
    "image_phash_neardup_pairs_capped",
    oracle="WITH " + _blockhash_sig_sql() + """
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.phash64, b.phash64)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.media_id < b.media_id
WHERE bit_count(xor(a.phash64, b.phash64)) <= 7
""",
)
def image_phash_neardup_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION-shaped image near-dup arm (VERDICT r10 #2):
    blockhash signatures banded into 8 chunks of 8 BITS with the
    hot-bucket cap ON (operator defaults:
    multimodal.phash_neardup_pairs). This is the configuration the
    100 TB claims rest on, registered so the benched/oracled query IS
    the pattern users copy — unlike the 16x4-bit sibling above, whose
    4-bit chunks have a 16-value domain (each band bucket holds ~n/16 of
    the corpus, so the bucket self-join degenerates toward O(n²/32)
    candidates as the corpus grows). 8-bit chunks give a 256-value
    domain per band — buckets 16x sparser, candidate volume 256x lower
    per band pair — and ``max_bucket_size=50_000`` bounds the worst
    single bucket's self-join at ~2.5e9/2 candidate rows no matter how
    degenerate the signature distribution gets (drop_hot_keys; the
    SimHash/pHash shared skew guard). Banding over 8 chunks is LOSSLESS
    for Hamming <= 7 (pigeonhole), and the fixture corpus never fills a
    bucket past the cap, so the oracle stays the pure all-pairs
    definition at the same cut. SCALING.md carries the measured
    pair-JOIN-stage exponent for this configuration (the signature
    stage's -0.046 was already measured in r10)."""
    docs = load_table(spark, sf_dir, "documents")
    media = M.documents_as_media(docs)
    pairs = M.phash_neardup_pairs(
        media, max_hamming=7, n_chunks=8, max_bucket_size=50_000
    )
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


_PLANT_EDIT_SQL = "concat(substr(text, 1, 100), 'Z', substr(text, 102))"


@query(
    "image_phash_capped_planted_pairs",
    oracle="WITH aug AS ("
    "  SELECT doc_id, text FROM documents"
    "  UNION ALL"
    f"  SELECT doc_id + 10000000, {_PLANT_EDIT_SQL}"
    "  FROM documents WHERE doc_id % 97 = 0 AND length(text) >= 200"
    "  UNION ALL"
    "  SELECT doc_id + 20000000, text"
    "  FROM documents WHERE doc_id % 89 = 0"
    "), " + _blockhash_sig_sql("aug") + """
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.phash64, b.phash64)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.media_id < b.media_id
WHERE bit_count(xor(a.phash64, b.phash64)) <= 7
""",
)
def image_phash_capped_planted_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall witness for the PRODUCTION capped image near-dup arm: the
    fixture corpus has no Hamming <= 7 signature pairs, so the capped
    query's green row is trivially 0-vs-0 — this arm PLANTS
    deterministic duplicates of TWO strengths and runs the IDENTICAL
    8x8-bit, Hamming <= 7, max_bucket_size=50_000 configuration over
    the augmented corpus: (a) every 89th document re-added VERBATIM —
    Hamming 0 by construction, the witness that survives ANY fixture
    refresh; (b) every 97th long document with a one-char same-length
    mid-payload edit — realistically small Hamming on current data but
    NOT structurally bounded (every blockhash bit compares its block
    sum against the doc MEAN, which the edit shifts, so marginal bits
    in untouched blocks can flip too). The oracle is the pure all-pairs
    definition over the same augmentation, so the row proves, with
    NON-ZERO output, that the banded + capped production path recovers
    the planted pairs. Same scale shape as
    image_phash_neardup_pairs_capped (the augmentation is two more
    scan-stage branches, union before the signature stage)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(
        (F.col("doc_id") % 97 == 0) & (F.length("text") >= 200)
    ).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        F.expr(_PLANT_EDIT_SQL).alias("text"),
    )
    exact_copies = docs.filter(F.col("doc_id") % 89 == 0).select(
        (F.col("doc_id") + F.lit(20_000_000)).alias("doc_id"), "text"
    )
    media = docs.unionByName(planted).unionByName(exact_copies).select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
    )
    pairs = M.phash_neardup_pairs(
        media, max_hamming=7, n_chunks=8, max_bucket_size=50_000
    )
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


# ---------------------------------------------------------------------------
# Classifier QA: ROC (r10) — the decision-support twin of calibration_bins
# ---------------------------------------------------------------------------

_ROC_SCORED_SQL = _lang_scored_sql() + r""", g AS (
  SELECT score,
    CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
    CAST(COUNT(*) - SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
  FROM s
  WHERE label IS NOT NULL AND score IS NOT NULL
  GROUP BY 1
)"""


@query(
    "roc_auc_lang_score",
    oracle="WITH " + _ROC_SCORED_SQL + """
, c AS (
  SELECT n_pos, n_neg,
    COALESCE(SUM(n_neg) OVER (ORDER BY score
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
  FROM g
)
SELECT CAST(SUM(n_pos) AS BIGINT) AS n_pos,
       CAST(SUM(n_neg) AS BIGINT) AS n_neg,
       CAST(SUM(CAST(n_pos AS HUGEINT) * (2 * CAST(neg_below AS HUGEINT) + n_neg))
            * 1000000 // (2 * SUM(CAST(n_pos AS HUGEINT)) * SUM(n_neg))
            AS BIGINT) AS auc_x1e6
FROM c
""",
)
def roc_auc_lang_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-aware ROC-AUC (operators/evaluation.py:roc_auc) of the
    lexical English-ness score against the gold ``lang == 'en'`` label —
    the Mann-Whitney rank statistic in pure integer arithmetic
    (numerator x2 so ties contribute exactly half; DECIMAL(38,0)
    products; one final floor division to x1e6). The single number a
    curation stack checks before trusting the classifier's ranking at
    all — calibration (lang_score_calibration) checks the scores'
    MEANING, AUC checks their ORDER. Corpus collapses to the distinct-
    score frame first, so the window runs over a score-domain-bounded
    frame regardless of corpus size."""
    from ibis_flink_example_spark.operators.evaluation import (
        roc_auc,
        stopword_lang_score_x1e6,
    )
    from ibis_flink_example_spark.operators.text import LANG_MARKERS

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        stopword_lang_score_x1e6("text", LANG_MARKERS["en"]).alias("score_x1e6"),
        (F.col("lang") == "en").alias("is_en"),
    )
    return roc_auc(scored, score_col="score_x1e6", label_col="is_en")


@query(
    "roc_threshold_sweep",
    oracle="WITH " + _ROC_SCORED_SQL + """
, c AS (
  SELECT score AS threshold,
    SUM(n_pos) OVER (ORDER BY score DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
    SUM(n_neg) OVER (ORDER BY score DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
    SUM(n_pos) OVER () AS np,
    SUM(n_neg) OVER () AS nn
  FROM g
)
SELECT CAST(threshold AS BIGINT) AS threshold,
  CAST(tp AS BIGINT) AS tp,
  CAST(fp AS BIGINT) AS fp,
  CAST(np - tp AS BIGINT) AS fn,
  CAST(nn - fp AS BIGINT) AS tn,
  CAST(tp * 1000000 // np AS BIGINT) AS tpr_x1e6,
  CAST(fp * 1000000 // nn AS BIGINT) AS fpr_x1e6,
  CAST(tp * 1000000 // (tp + fp) AS BIGINT) AS precision_x1e6,
  CAST(tp * 2000000 // (tp + np + fp) AS BIGINT) AS f1_x1e6
FROM c
""",
)
def roc_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold sweep (operators/evaluation.py:roc_threshold_sweep) of
    the lexical English-ness score against the gold label: per observed
    score t ("predict positive iff score >= t"), the full confusion
    counts plus TPR/FPR/precision/F1 as exact x1e6 integers — the table
    an operating-point decision reads (ROC curve = (fpr, tpr) rows; PR
    curve = (tpr, precision)). Same scale shape as the AUC: one counts-
    of-counts collapse, then windows over the score-domain-bounded
    frame."""
    from ibis_flink_example_spark.operators.evaluation import (
        roc_threshold_sweep as sweep,
        stopword_lang_score_x1e6,
    )
    from ibis_flink_example_spark.operators.text import LANG_MARKERS

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        stopword_lang_score_x1e6("text", LANG_MARKERS["en"]).alias("score_x1e6"),
        (F.col("lang") == "en").alias("is_en"),
    )
    return sweep(scored, score_col="score_x1e6", label_col="is_en")


@query(
    "image_neardup_clusters",
    # End-to-end X5 x X2 oracle: signatures (shared sig CTE), ALL-pairs
    # Hamming edges at the same cut, then components as min-reachable-id
    # via a recursive CTE (UNION dedups, so the fixpoint terminates; the
    # edge residue is tiny — pair generation is the audited LSH path on
    # the engine side only).
    oracle="WITH RECURSIVE " + _blockhash_sig_sql() + """,
e AS (
  SELECT a.media_id AS src, b.media_id AS dst
  FROM sig a JOIN sig b
    ON a.media_id < b.media_id
   AND bit_count(xor(a.phash64, b.phash64)) <= 12
),
edges AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
reach(node, comp) AS (
  SELECT media_id, media_id FROM sig
  UNION
  SELECT ed.dst, r.comp FROM reach r JOIN edges ed ON ed.src = r.node
)
SELECT node AS media_id,
       CAST(MIN(comp) AS BIGINT) AS component,
       CAST(node = MIN(comp) AS BOOLEAN) AS is_representative
FROM reach GROUP BY 1
""",
)
def image_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end image near-dup clustering (X5 x X2): blockhash
    signatures -> Hamming-LSH candidate pairs (16x4-bit bands, cut <= 12,
    lossless) -> connected components -> keep the min-id representative
    per cluster. The full image-dedup decision a curation pipeline
    applies, composed from the audited pieces
    (multimodal.phash_neardup_pairs + dedup.connected_components — the
    driver union-find arm under the bounded post-LSH edge residue, the
    distributed min-label arm beyond it). Oracle computes components via
    a recursive min-reachable-id CTE over the ALL-pairs edge set. The
    16x4-bit uncapped banding here is the oracle-pure definition arm —
    at corpus scale compose the clusters from the PRODUCTION pair
    configuration instead (8x8-bit bands, cap on:
    ``image_phash_neardup_pairs_capped``, measured pair-stage exponent
    in SCALING.md)."""
    from ibis_flink_example_spark.operators.dedup import connected_components

    docs = load_table(spark, sf_dir, "documents")
    media = M.documents_as_media(docs)
    pairs = M.phash_neardup_pairs(
        media, max_hamming=12, n_chunks=16, max_bucket_size=None
    )
    comp = connected_components(
        pairs, media.select("media_id"), id_col="media_id"
    )
    return comp.select(
        "media_id",
        F.col("component").cast("long").alias("component"),
        (F.col("media_id") == F.col("component")).alias("is_representative"),
    )


@query(
    "pr_average_precision",
    oracle="WITH " + _ROC_SCORED_SQL + """
, c AS (
  SELECT n_pos, n_neg,
    SUM(n_pos) OVER (ORDER BY score DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
    SUM(n_neg) OVER (ORDER BY score DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp
  FROM g
)
SELECT CAST(SUM(n_pos) AS BIGINT) AS n_pos,
       CAST(SUM(n_neg) AS BIGINT) AS n_neg,
       CAST(SUM(CAST(n_pos AS HUGEINT)
                * (CAST(tp AS HUGEINT) * 1000000 // (tp + fp)))
            // SUM(n_pos) AS BIGINT) AS ap_x1e6
FROM c
""",
)
def pr_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (operators/evaluation.py:average_precision) of
    the lexical English-ness score against the gold label — the PR-curve
    area in its standard step form, all-integer (nested floor divisions
    mirrored verbatim; DECIMAL(38,0) products). The positive-class-
    weighted complement to roc_auc_lang_score: a rare-positive curation
    filter is judged by precision at its recall, not by how it ranks
    the majority class. Same score-domain-bounded collapse shape."""
    from ibis_flink_example_spark.operators.evaluation import (
        average_precision,
        stopword_lang_score_x1e6,
    )
    from ibis_flink_example_spark.operators.text import LANG_MARKERS

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        stopword_lang_score_x1e6("text", LANG_MARKERS["en"]).alias("score_x1e6"),
        (F.col("lang") == "en").alias("is_en"),
    )
    return average_precision(scored, score_col="score_x1e6", label_col="is_en")


@query(
    "roc_auc_by_source",
    oracle="WITH " + _lang_scored_sql("source, ") + """, g AS (
  SELECT source, score,
    CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
    CAST(COUNT(*) - SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
  FROM s
  WHERE label IS NOT NULL AND score IS NOT NULL
  GROUP BY 1, 2
), c AS (
  SELECT source, n_pos, n_neg,
    COALESCE(SUM(n_neg) OVER (PARTITION BY source ORDER BY score
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
  FROM g
)
SELECT source,
  CAST(SUM(n_pos) AS BIGINT) AS n_pos,
  CAST(SUM(n_neg) AS BIGINT) AS n_neg,
  CASE WHEN SUM(n_pos) = 0 OR SUM(n_neg) = 0 THEN NULL
       ELSE CAST(SUM(CAST(n_pos AS HUGEINT)
                     * (2 * CAST(neg_below AS HUGEINT) + n_neg)) * 1000000
                 // (2 * SUM(CAST(n_pos AS HUGEINT)) * SUM(n_neg))
                 AS BIGINT) END AS auc_x1e6
FROM c GROUP BY 1
""",
)
def roc_auc_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain exact ROC-AUC
    (operators/evaluation.py:roc_auc_by_group) — the grouped arm of
    roc_auc_lang_score, the ranking twin of calibration_by_source: a
    classifier can rank well in aggregate yet be inverted inside one
    domain. Collapse keys on (source, score); the cumulative window
    partitions by source (parallel, never single-partition); a
    single-class domain reports NULL auc instead of dividing by zero."""
    from ibis_flink_example_spark.operators.evaluation import (
        roc_auc_by_group,
        stopword_lang_score_x1e6,
    )
    from ibis_flink_example_spark.operators.text import LANG_MARKERS

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "source",
        stopword_lang_score_x1e6("text", LANG_MARKERS["en"]).alias("score_x1e6"),
        (F.col("lang") == "en").alias("is_en"),
    )
    return roc_auc_by_group(
        scored,
        score_col="score_x1e6",
        label_col="is_en",
        group_cols=("source",),
    )


_SWEEP_THRESHOLDS_X1E6 = (350_000, 500_000, 700_000, 900_000)


@query(
    "semantic_dup_threshold_sweep",
    # One pair scan, every threshold: pairs quantize to cos6 =
    # round(cos*1e6) (away-from-zero halves in BOTH engines for the
    # mirrored float chain — the same 6-dp contract the neardup-pairs
    # value hash already rests on), then integer threshold compares.
    oracle=r"""
WITH n AS (
  SELECT vec_id, label,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec,
    sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))
      AS nrm
  FROM embeddings
), p AS (
  SELECT
    CAST(round(list_sum(list_transform(range(1, len(a.vec) + 1),
      i -> a.vec[i] * b.vec[i])) / (a.nrm * b.nrm) * 1000000) AS BIGINT) AS cos6,
    a.vec_id AS id_a, b.vec_id AS id_b
  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
), t AS (
  SELECT CAST(UNNEST([350000, 500000, 700000, 900000]) AS BIGINT) AS thr
), e AS (
  SELECT thr, id_a, id_b FROM p JOIN t ON p.cos6 >= t.thr
), pc AS (
  SELECT thr, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM e GROUP BY 1
), dc AS (
  SELECT thr, CAST(COUNT(DISTINCT id) AS BIGINT) AS n_docs_in_dups
  FROM (SELECT thr, UNNEST([id_a, id_b]) AS id FROM e) GROUP BY 1
)
SELECT t.thr AS threshold_x1e6,
  COALESCE(pc.n_pairs, 0) AS n_pairs,
  COALESCE(dc.n_docs_in_dups, 0) AS n_docs_in_dups
FROM t LEFT JOIN pc ON pc.thr = t.thr LEFT JOIN dc ON dc.thr = t.thr
""",
)
def semantic_dup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X3 threshold-selection audit: pair and affected-document counts
    at cosine thresholds 0.35/0.50/0.70/0.90 from ONE blocked pair scan
    (the curve that decides where semantic_dedup's threshold should sit —
    too low merges topics, too high misses paraphrases; this table is
    how you see the knee). The pair stage reuses
    embedding_neardup_pairs' blocked equi-join; the sweep is an in-row
    array filter + explode, so adding thresholds costs nothing extra at
    100 TB. Thresholds with no surviving pairs report explicit zeros.
    The pre-filter sits strictly BELOW the lowest sweep value (0.3499 <
    0.35): membership is gated ONLY on the quantized cos6 >= thr, so a
    pair whose float cosine lands in [0.3499995, 0.35) — which rounds
    to the 350000 boundary — cannot be dropped by the float pre-filter
    on one engine and kept by the rounded gate on the other. The oracle
    mirrors the engine's exact float chain (dot / (norm_a * norm_b),
    scalar norms carried per row) so the 6-dp quantization sees
    bit-identical inputs."""
    em = load_table(spark, sf_dir, "embeddings")
    pairs = S.embedding_neardup_pairs(
        em, id_col="vec_id", vec_col="embedding", block_col="label", threshold=0.3499
    )
    scored = pairs.select(
        "id_a",
        "id_b",
        F.round(F.col("cosine") * 1_000_000, 0).cast("long").alias("cos6"),
    )
    thr_arr = F.array(*[F.lit(t).cast("long") for t in _SWEEP_THRESHOLDS_X1E6])
    exploded = scored.select(
        F.explode(F.filter(thr_arr, lambda t: F.col("cos6") >= t)).alias("thr"),
        "id_a",
        "id_b",
    )
    pc = exploded.groupBy("thr").agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    dc = (
        exploded.select("thr", F.explode(F.array("id_a", "id_b")).alias("id"))
        .groupBy("thr")
        .agg(F.countDistinct("id").cast("long").alias("n_docs_in_dups"))
    )
    thresholds = spark.range(1).select(
        F.explode(thr_arr).alias("threshold_x1e6")
    )
    return (
        thresholds.join(pc, thresholds.threshold_x1e6 == pc.thr, "left")
        .drop("thr")
        .join(dc, thresholds.threshold_x1e6 == dc.thr, "left")
        .drop("thr")
        .select(
            "threshold_x1e6",
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce(F.col("n_docs_in_dups"), F.lit(0))
            .cast("long")
            .alias("n_docs_in_dups"),
        )
    )


@query(
    "embedding_outliers_by_centroid",
    # Integer-exact within-label outlier ranking: micro-quantized
    # components (the centroid query's idiom), then the n²-scaled squared
    # distance Σ(micro·n − Σmicro)² — no float centroid ever materializes,
    # so rank order (and the reported d²) is engine-exact.
    oracle=r"""
WITH ex AS (
  SELECT vec_id, label,
    CAST(unnest(range(len(embedding))) AS INTEGER) AS dim_idx,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
      AS micro
  FROM embeddings
), s AS (
  SELECT label, dim_idx, CAST(SUM(micro) AS BIGINT) AS sm,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ex GROUP BY 1, 2
), d AS (
  SELECT ex.vec_id, ex.label, s.n,
    SUM((CAST(ex.micro AS HUGEINT) * s.n - s.sm)
        * (CAST(ex.micro AS HUGEINT) * s.n - s.sm)) AS d2n2
  FROM ex JOIN s ON ex.label = s.label AND ex.dim_idx = s.dim_idx
  GROUP BY 1, 2, 3
), r AS (
  SELECT label, vec_id,
    CAST(d2n2 * 1000000 // (CAST(n AS HUGEINT) * n * 1000000000000)
         AS BIGINT) AS d2_x1e6,
    ROW_NUMBER() OVER (PARTITION BY label ORDER BY d2n2 DESC, vec_id)
      AS rank
  FROM d
)
SELECT label, vec_id, rank, d2_x1e6 FROM r WHERE rank <= 5
""",
)
def embedding_outliers_by_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 label-noise QA: per label, the 5 vectors farthest from their
    label centroid — the embedding-space mislabeling detector (a point
    deep inside another cluster is a labeling error or a polysemous doc;
    this surfaces them for review before the label feeds a classifier).
    Distances are the n²-scaled integer form of ||x − μ||²
    (micro-quantized components, the embedding_centroid_by_label idiom),
    so ranking needs no float centroid. Scale shape: the per-(label,dim)
    sum frame is |labels|·dim rows (broadcast side of the join back onto
    the exploded components); the per-vector reduce and the within-label
    ranking window both partition by label."""
    em = load_table(spark, sf_dir, "embeddings")
    ex = em.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("dim_idx", "v"),
    ).select(
        "vec_id",
        "label",
        "dim_idx",
        F.floor(F.col("v").cast("double") * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("micro"),
    )
    s = ex.groupBy("label", "dim_idx").agg(
        F.sum("micro").cast("long").alias("sm"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    d = (
        ex.join(F.broadcast(s), ["label", "dim_idx"])
        .withColumn(
            "__t",
            F.expr(
                "(CAST(micro AS DECIMAL(38,0)) * n - sm)"
                " * (CAST(micro AS DECIMAL(38,0)) * n - sm)"
            ),
        )
        .groupBy("vec_id", "label", "n")
        .agg(F.sum("__t").alias("d2n2"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("label").orderBy(F.desc("d2n2"), F.col("vec_id"))
    return (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "label",
            "vec_id",
            "rank",
            F.expr(
                "CAST(d2n2 * 1000000 DIV "
                "(CAST(n AS DECIMAL(38,0)) * n * 1000000000000) AS BIGINT)"
            ).alias("d2_x1e6"),
        )
    )


@query(
    "chi2_terms_by_lang",
    # Pearson chi-square on the 2x2 (term presence x lang='en') table as a
    # deterministic integer chain: diff = ad-bc in BIGINT, then
    # (diff^2 * 1e6 DIV ((a+b)(c+d))) * N DIV ((a+c)(b+d)) with the square
    # in DECIMAL(38,0) — exact and identically floored in both engines
    # (headroom to N ~ 1e8 docs; divide by the margins first at larger N).
    oracle="WITH " + _TF_CTE + r""",
pres AS (SELECT DISTINCT doc_id, term FROM toks),
lab AS (SELECT doc_id, (lang = 'en') AS pos FROM documents),
scal AS (
  SELECT CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np,
         CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS nn
  FROM lab
),
tc AS (
  SELECT term,
    CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS a,
    CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS c
  FROM pres JOIN lab USING (doc_id) GROUP BY 1
),
x AS (
  SELECT term, a, np - a AS b, c, nn - c AS d, np + nn AS n,
         a * (nn - c) - (np - a) * c AS diff
  FROM tc CROSS JOIN scal
  WHERE a + c >= 5
)
SELECT term, a AS df_en, c AS df_other,
  CAST((CAST(diff AS HUGEINT) * diff * 1000000 // ((a + b) * (c + d)))
       * n // ((a + c) * (b + d)) AS BIGINT) AS chi2_x1e6
FROM x
ORDER BY chi2_x1e6 DESC, term LIMIT 20
""",
)
def chi2_terms_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 feature selection: the top-20 terms most associated with
    lang='en' by Pearson chi-square over the (presence, class) 2x2 table —
    the classic pick-the-classifier-features pass (and, inverted, the
    leakage detector: a 'content' term with extreme chi2 against a
    metadata label usually means contamination). Presence is one distinct
    over the scan-stage token explode; class margins ride a one-row
    broadcast; the statistic is an exact integer chain so the RANKING is
    engine-exact, with TakeOrderedAndProject for the cut."""
    from ibis_flink_example_spark.operators.text import doc_terms

    docs = load_table(spark, sf_dir, "documents")
    pres = doc_terms(docs, id_col="doc_id", text_col="text").distinct()
    lab = docs.select("doc_id", (F.col("lang") == "en").alias("pos"))
    scal = lab.agg(
        F.count(F.when(F.col("pos"), 1)).cast("long").alias("np"),
        F.count(F.when(~F.col("pos"), 1)).cast("long").alias("nn"),
    )
    tc = (
        pres.join(lab, "doc_id")
        .groupBy("term")
        .agg(
            F.count(F.when(F.col("pos"), 1)).cast("long").alias("a"),
            F.count(F.when(~F.col("pos"), 1)).cast("long").alias("c"),
        )
    )
    x = (
        tc.crossJoin(F.broadcast(scal))
        .filter(F.col("a") + F.col("c") >= 5)
        .select(
            "term",
            "a",
            (F.col("np") - F.col("a")).alias("b"),
            "c",
            (F.col("nn") - F.col("c")).alias("d"),
            (F.col("np") + F.col("nn")).alias("n"),
            (
                F.col("a") * (F.col("nn") - F.col("c"))
                - (F.col("np") - F.col("a")) * F.col("c")
            ).alias("diff"),
        )
    )
    return (
        x.select(
            "term",
            F.col("a").alias("df_en"),
            F.col("c").alias("df_other"),
            F.expr(
                "CAST((CAST(diff AS DECIMAL(38,0)) * diff * 1000000"
                " DIV ((a + b) * (c + d)))"
                " * n DIV ((a + c) * (b + d)) AS BIGINT)"
            ).alias("chi2_x1e6"),
        )
        .orderBy(F.desc("chi2_x1e6"), "term")
        .limit(20)
    )


@query(
    "conformal_score_threshold",
    # Split-conformal threshold for the lexical English-ness score:
    # calibration = a deterministic md5 half, t = the k-th smallest
    # calibration-POSITIVE score with k = max(1, (n_cal+1) DIV 10)
    # (alpha = 0.1), read off the cumulative distinct-score frame; the
    # held-out half reports empirical coverage and false-admit — all
    # integer rank selection, no quantile interpolation.
    oracle=r"""
WITH s AS (
  SELECT doc_id,
    CAST(len(list_filter(
      regexp_split_to_array(trim(lower(text)), '[ \t\n\x0B\f\r]+'),
      w -> list_contains(['the','of','and','to','in','is','a'], w)))
      * 1000000
      // GREATEST(len(regexp_split_to_array(trim(lower(text)),
                  '[ \t\n\x0B\f\r]+')), 1) AS BIGINT) AS score,
    (lang = 'en') AS pos,
    substr(md5(CAST(doc_id AS STRING) || ':conf'), 1, 4) < '8000' AS is_cal
  FROM documents
),
calp AS (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS c FROM s
  WHERE is_cal AND pos GROUP BY 1
),
cum AS (
  SELECT score,
    CAST(SUM(c) OVER (ORDER BY score
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cc,
    CAST(SUM(c) OVER () AS BIGINT) AS n_cal_pos
  FROM calp
),
t AS (
  SELECT n_cal_pos,
    GREATEST(1, (n_cal_pos + 1) // 10) AS k_rank,
    MIN(CASE WHEN cc >= GREATEST(1, (n_cal_pos + 1) // 10)
        THEN score END) AS threshold_x1e6
  FROM cum GROUP BY n_cal_pos
),
ev AS (SELECT score, pos FROM s WHERE NOT is_cal)
SELECT t.n_cal_pos, CAST(t.k_rank AS BIGINT) AS k_rank,
  CAST(t.threshold_x1e6 AS BIGINT) AS threshold_x1e6,
  CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_eval_pos,
  CAST(SUM(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS n_eval_neg,
  CAST(SUM(CASE WHEN pos AND score >= threshold_x1e6 THEN 1 ELSE 0 END)
       * 1000000 // NULLIF(SUM(CASE WHEN pos THEN 1 ELSE 0 END), 0)
       AS BIGINT) AS eval_coverage_x1e6,
  CAST(SUM(CASE WHEN NOT pos AND score >= threshold_x1e6 THEN 1 ELSE 0 END)
       * 1000000 // NULLIF(SUM(CASE WHEN NOT pos THEN 1 ELSE 0 END), 0)
       AS BIGINT) AS eval_false_admit_x1e6
FROM ev CROSS JOIN t
GROUP BY 1, 2, 3
""",
)
def conformal_score_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-QA: split-conformal admission threshold (alpha = 0.1)
    for the stopword English-ness score — the distribution-free way to
    turn a raw score into a filter with a coverage guarantee (admit
    score >= t, where t is the k-th smallest calibration-positive score,
    k = max(1, (n+1) DIV 10)), plus the held-out readout: empirical
    coverage of true positives (expected ~ 1-alpha) and the false-admit
    rate the guarantee does NOT control. Calibration membership is a pure
    md5 function of doc_id (resumable, engine-portable); the rank
    selection runs on the distinct-score collapse (the ROC idiom); the
    one-row threshold frame broadcasts onto the held-out aggregation.

    The score here is token-share-based (stopword hits x1e6 over word
    count) rather than the raw hit count, so the threshold transfers
    across document lengths."""
    from ibis_flink_example_spark.operators.text import LANG_MARKERS, WS_SPLIT

    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.lower(F.col("text"))), WS_SPLIT)
    hits = F.size(
        F.filter(ws, lambda w: w.isin([m.lower() for m in LANG_MARKERS["en"]]))
    )
    s = docs.select(
        hits.cast("long").alias("__h"),
        F.greatest(F.size(ws), F.lit(1)).cast("long").alias("__w"),
        (F.col("lang") == "en").alias("pos"),
        (
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":conf"))),
                1,
                4,
            )
            < "8000"
        ).alias("is_cal"),
    ).select(
        F.expr("CAST(__h * 1000000 DIV __w AS BIGINT)").alias("score"),
        "pos",
        "is_cal",
    )
    calp = (
        s.filter(F.col("is_cal") & F.col("pos"))
        .groupBy("score")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    from pyspark.sql import Window as W

    w_cum = W.orderBy("score").rowsBetween(W.unboundedPreceding, 0)
    w_all = W.orderBy("score").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = calp.select(
        "score",
        F.sum("c").over(w_cum).cast("long").alias("cc"),
        F.sum("c").over(w_all).cast("long").alias("n_cal_pos"),
    )
    k = F.greatest(F.lit(1).cast("long"), F.expr("(n_cal_pos + 1) DIV 10"))
    t = cum.groupBy("n_cal_pos").agg(
        F.max(k).cast("long").alias("k_rank"),
        F.min(F.when(F.col("cc") >= k, F.col("score")))
        .cast("long")
        .alias("threshold_x1e6"),
    )
    ev = s.filter(~F.col("is_cal"))
    return (
        ev.crossJoin(F.broadcast(t))
        .groupBy("n_cal_pos", "k_rank", "threshold_x1e6")
        .agg(
            F.count(F.when(F.col("pos"), 1)).cast("long").alias("n_eval_pos"),
            F.count(F.when(~F.col("pos"), 1)).cast("long").alias("n_eval_neg"),
            F.expr(
                "CAST(COUNT(CASE WHEN pos AND score >= threshold_x1e6 THEN 1 END)"
                " * 1000000 DIV NULLIF(COUNT(CASE WHEN pos THEN 1 END), 0)"
                " AS BIGINT)"
            ).alias("eval_coverage_x1e6"),
            F.expr(
                "CAST(COUNT(CASE WHEN NOT pos AND score >= threshold_x1e6 THEN 1 END)"
                " * 1000000 DIV NULLIF(COUNT(CASE WHEN NOT pos THEN 1 END), 0)"
                " AS BIGINT)"
            ).alias("eval_false_admit_x1e6"),
        )
        .select(
            "n_cal_pos",
            "k_rank",
            "threshold_x1e6",
            "n_eval_pos",
            "n_eval_neg",
            "eval_coverage_x1e6",
            "eval_false_admit_x1e6",
        )
    )


@query(
    "sparse_cosine_neardup_pairs",
    # Mirror of operators/retrieval.py:sparse_cosine_pairs — whole-bit
    # idf weights, integer norms/dots, squared-threshold test (no sqrt,
    # no float anywhere).
    oracle=rf"""
WITH {_TF_CTE},
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
w AS (
  SELECT tf.doc_id, tf.term, dfq.df, nd.n_docs,
    tf.tf * GREATEST(CAST(1 AS BIGINT),
      CAST(floor(log2(CAST(2 * (nd.n_docs + 1) AS DOUBLE)
                      / CAST(2 * dfq.df + 1 AS DOUBLE))) AS BIGINT)) AS w
  FROM tf JOIN dfq USING (term) CROSS JOIN nd
),
norms AS (SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS n2 FROM w GROUP BY 1),
rare AS (SELECT doc_id, term FROM w WHERE df >= 2 AND df * 20 <= n_docs),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM rare a JOIN rare b ON a.term = b.term AND a.doc_id < b.doc_id
),
dots AS (
  SELECT c.id_a, c.id_b,
    CAST(SUM(wa.w * wb.w) AS BIGINT) AS dot,
    CAST(COUNT(*) AS BIGINT) AS n_shared_terms
  FROM cand c
  JOIN w wa ON wa.doc_id = c.id_a
  JOIN w wb ON wb.doc_id = c.id_b AND wb.term = wa.term
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_shared_terms,
  CAST(CAST(dot AS HUGEINT) * dot * 1000000000000
       // (CAST(na.n2 AS HUGEINT) * nb.n2) AS BIGINT) AS cos2_x1e12
FROM dots
JOIN norms na ON na.doc_id = dots.id_a
JOIN norms nb ON nb.doc_id = dots.id_b
WHERE CAST(dot AS HUGEINT) * dot * 1000000000000
      >= CAST(250000000000 AS HUGEINT) * na.n2 * nb.n2
""",
)
def sparse_cosine_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2's weighted-sparse arm: tf-idf cosine near-dup pairs with
    rare-term candidate generation (operators/retrieval.py:
    sparse_cosine_pairs, the PPJoin-family prefix filter) — pairs must
    share a discriminative term (df in [2, N/20]) before the exact
    weighted cosine is computed over ALL shared terms and squared-
    threshold-tested at cos² >= 0.25. Complements MinHash (unweighted
    set overlap) and embedding pairs (dense semantic): the evidence here
    is a handful of rare tokens. Whole-bit idf, integer norms/dots, the
    threshold as an integer cross-multiplication — the pair SET and the
    reported cos² are engine-exact. The df ceiling is the hot-key cap:
    stop-word posting lists never self-join."""
    from ibis_flink_example_spark.operators.retrieval import (
        sparse_cosine_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return sparse_cosine_pairs(docs)


# Shared whitespace-bigram CTE (the doc_rare_bigram_score construction,
# plus the prefix word) for the bigram-LM pair below.
_BIGRAM_CTE = r"""
w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+') AS ws
  FROM documents
), bg AS (
  SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2,
         concat_ws(' ', ws[i], ws[i+1]) AS bigram
  FROM w, UNNEST(range(1, len(ws))) AS t(i)
  WHERE len(ws) >= 2
), cb AS (
  SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY 1
), cp AS (
  SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bg GROUP BY 1
)"""


@query(
    "doc_bigram_surprisal",
    # Whole-bit bigram-MLE surprisal: bits = floor(log2(c1)) -
    # floor(log2(c12)) per bigram occurrence (the doc_unigram_surprisal
    # floor-gap argument, applied to the prefix-normalized bigram LM —
    # the conditional upgrade of the unigram scorer). Integer sums
    # cross rows; one final double division.
    oracle="WITH " + _BIGRAM_CTE + r"""
SELECT bg.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
  CAST(SUM(CAST(floor(log2(cp.c1)) AS BIGINT)
           - CAST(floor(log2(cb.c12)) AS BIGINT)) AS BIGINT)
    AS surprisal_bits,
  CAST(SUM(CAST(floor(log2(cp.c1)) AS BIGINT)
           - CAST(floor(log2(cb.c12)) AS BIGINT)) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS bits_per_bigram
FROM bg JOIN cb USING (bigram) JOIN cp USING (w1)
GROUP BY 1
""",
)
def doc_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 corpus-LM quality scoring, the CONDITIONAL upgrade of
    doc_unigram_surprisal: per-bigram whole-bit surprisal under the
    corpus bigram MLE, -log2 c(w1 w2)/c(w1 ·) as the exact integer
    floor(log2 c1) - floor(log2 c12) — a document of individually-common
    words in improbable ORDER (shuffled text, spam templates) scores
    high where the unigram lens sees nothing. In-corpus scoring never
    backs off (every observed bigram has c12 >= 1); the operator family's
    stupid-backoff path (Brants et al. 2007, alpha=1/2 -> +1 whole bit)
    is the held-out extension. Plan: in-row bigram arrays, one
    bigram-keyed and one prefix-keyed count shuffle, joins on those same
    keys, one doc rollup — text never reshuffles."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.col("text")), X.WS_SPLIT)
    bg = docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(ws) >= 2,
                F.zip_with(
                    F.slice(ws, 1, F.size(ws) - 1),
                    F.slice(ws, 2, F.size(ws) - 1),
                    lambda a, b: F.struct(
                        a.alias("w1"), F.concat_ws(" ", a, b).alias("bigram")
                    ),
                ),
            ).otherwise(
                F.array().cast("array<struct<w1:string,bigram:string>>")
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.bigram").alias("bigram"))
    cb = bg.groupBy("bigram").agg(F.count(F.lit(1)).cast("long").alias("c12"))
    cp = bg.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    bits = (
        F.floor(F.log2(F.col("c1"))).cast("long")
        - F.floor(F.log2(F.col("c12"))).cast("long")
    )
    return (
        bg.join(cb, "bigram")
        .join(cp, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(bits).cast("long").alias("surprisal_bits"),
            (F.sum(bits).cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "bits_per_bigram"
            ),
        )
    )


@query(
    "pmi_top_collocations",
    # Whole-bit PMI: (floor log2 c12 + floor log2 T) - (floor log2 c1 +
    # floor log2 c2), suffix counts from the same bigram frame; min
    # support 5; TakeOrderedAndProject cut.
    oracle="WITH " + _BIGRAM_CTE + r""",
cs AS (
  SELECT w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY 1
), tb AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS t,
         CAST(floor(log2(COUNT(*))) AS BIGINT) AS t_bits
  FROM bg
), scored AS (
  SELECT DISTINCT cb.bigram, cb.c12,
    (CAST(floor(log2(cb.c12)) AS BIGINT) + tb.t_bits)
    - (CAST(floor(log2(cp.c1)) AS BIGINT)
       + CAST(floor(log2(cs.c2)) AS BIGINT)) AS pmi_bits
  FROM bg
  JOIN cb USING (bigram) JOIN cp USING (w1) JOIN cs USING (w2)
  CROSS JOIN tb
  WHERE cb.c12 >= 5
)
SELECT bigram, c12, pmi_bits FROM scored
ORDER BY pmi_bits DESC, c12 DESC, bigram LIMIT 15
""",
)
def pmi_top_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 collocation mining: the 15 word bigrams with the highest
    whole-bit pointwise mutual information (min support 5) — the phrase
    detector (multi-word expressions, named entities, boilerplate
    signatures) that feeds tokenizer merge candidates and template
    discovery. PMI's four log2 terms are each whole-bit floors of plain
    integer counts (engine-stable by the floor-gap argument); the
    bigram/prefix/suffix count frames come from one in-row bigram
    explode; T rides a one-row broadcast; the cut is
    TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.col("text")), X.WS_SPLIT)
    bg = docs.select(
        F.explode(
            F.when(
                F.size(ws) >= 2,
                F.zip_with(
                    F.slice(ws, 1, F.size(ws) - 1),
                    F.slice(ws, 2, F.size(ws) - 1),
                    lambda a, b: F.struct(
                        a.alias("w1"),
                        b.alias("w2"),
                        F.concat_ws(" ", a, b).alias("bigram"),
                    ),
                ),
            ).otherwise(
                F.array().cast(
                    "array<struct<w1:string,w2:string,bigram:string>>"
                )
            )
        ).alias("p"),
    ).select("p.w1", "p.w2", "p.bigram")
    cb = bg.groupBy("bigram", "w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    cp = bg.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    cs = bg.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("c2"))
    tb = bg.agg(
        F.count(F.lit(1)).cast("long").alias("t"),
        F.floor(F.log2(F.count(F.lit(1)))).cast("long").alias("t_bits"),
    )
    pmi = (
        F.floor(F.log2(F.col("c12"))).cast("long")
        + F.col("t_bits")
        - F.floor(F.log2(F.col("c1"))).cast("long")
        - F.floor(F.log2(F.col("c2"))).cast("long")
    )
    return (
        cb.filter(F.col("c12") >= 5)
        .join(cp, "w1")
        .join(cs, "w2")
        .crossJoin(F.broadcast(tb))
        .select("bigram", "c12", pmi.alias("pmi_bits"))
        .orderBy(F.desc("pmi_bits"), F.desc("c12"), "bigram")
        .limit(15)
    )


def _script_profile_oracle() -> str:
    from ibis_flink_example_spark.operators.text import (
        SCRIPT_MIN_SHARE_DEN,
        SCRIPT_RANGES,
    )

    cnt = {
        name: f"CAST(len(regexp_extract_all(text, '{rx}')) AS BIGINT)"
        for name, rx in SCRIPT_RANGES.items()
    }
    cols = ",\n    ".join(f"{e} AS n_{name}" for name, e in cnt.items())
    letters = " + ".join(f"n_{name}" for name in SCRIPT_RANGES)
    names = list(SCRIPT_RANGES)
    dom = "CASE "
    for name in names:
        others = " AND ".join(
            f"n_{name} >= n_{o}" for o in names if o != name
        )
        dom += f"WHEN n_{name} > 0 AND {others} THEN '{name}' "
    dom += "ELSE 'none' END"
    sig = " + ".join(
        f"(CASE WHEN n_{name} * {SCRIPT_MIN_SHARE_DEN} >= ({letters})"
        f" THEN 1 ELSE 0 END)"
        for name in names
    )
    return f"""
WITH c AS (
  SELECT doc_id,
    CAST(length(text) AS BIGINT) AS n_chars_total,
    {cols},
    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit
  FROM documents
)
SELECT doc_id, n_chars_total,
  {', '.join('n_' + n for n in names)}, n_digit,
  CAST({letters} AS BIGINT) AS n_letters,
  {dom} AS dominant_script,
  (({letters}) > 0 AND ({sig}) >= 2) AS mixed_script
FROM c
"""


@query("unicode_script_profile", oracle=_script_profile_oracle())
def unicode_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 homoglyph/obfuscation QA: per-document Unicode script profile
    (operators/text.py:script_profile) — letter counts per coarse script
    block, the dominant script, and the mixed-script flag (>= 2 scripts
    each holding >= 5% of letter mass, as an integer
    cross-multiplication). Spam swaps Latin letters for Cyrillic
    lookalikes; a lang='en' corpus with a Cyrillic-heavy tail has a
    crawling or labeling problem. The \\x{{...}} range table parses
    identically in Java regex and RE2, so ONE table serves the engine
    and the oracle; map-only, zero shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    return X.script_profile(docs, "text", "doc_id")


@query(
    "audio_frame_plan",
    # Mirror of operators/multimodal.py:audio_frame_plan over the
    # deterministic documents_as_audio derivation (n_samples = n_chars,
    # sample_rate 16k/8k by doc parity); pure non-negative integer math.
    oracle="""
WITH a AS (
  SELECT doc_id AS media_id,
    CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 8000 END AS sample_rate,
    CAST(n_chars AS BIGINT) AS n_samples
  FROM documents
), f AS (
  SELECT media_id, CAST(sample_rate AS BIGINT) AS sample_rate, n_samples,
    CAST(CASE WHEN n_samples <= 0 THEN 0
         WHEN n_samples < 400 THEN 1
         ELSE 1 + (n_samples - 400) // 160 END AS BIGINT) AS n_frames
  FROM a
)
SELECT media_id, sample_rate, n_samples, n_frames,
  CAST(CASE WHEN n_frames > 0 THEN (n_frames - 1) * 160 END AS BIGINT)
    AS last_frame_start,
  CASE WHEN n_samples <= 0 THEN false
       ELSE (n_frames - 1) * 160 + 400 > n_samples END AS tail_padded
FROM f
""",
)
def audio_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 audio arm: the 25 ms / 10 ms framing plan (400/160 samples)
    over the deterministic audio derivation of the documents fixture
    (operators/multimodal.py:documents_as_audio / audio_frame_plan) —
    frame counts, last-frame offset, and tail-padding flags as pure
    metadata columns (the payload column is never read: the scan prunes
    to the metadata struct). The boundary math that sizes the
    mapInPandas fbank/MFCC stage; completes the modality plans next to
    image resize_plan and video frame_sample."""
    docs = load_table(spark, sf_dir, "documents")
    media = M.documents_as_audio(docs)
    return M.audio_frame_plan(media)


@query(
    "matryoshka_truncation_recall",
    # Both rankings mirrored with the strict left-to-right fold; the
    # truncated leg scores over the first 16 components only (array
    # slice in both engines); overlap is an integer count per anchor.
    oracle=r"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec
  FROM embeddings WHERE vec_id IN (0,1,2,3,4)
), fullr AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
      ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
        list_sum(list_transform(range(1, len(e.embedding) + 1),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE)))
        / ( sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
              i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
          * sqrt(list_sum(list_transform(range(1, len(q.qvec) + 1),
              i -> CAST(q.qvec[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE)))) )
        DESC, e.vec_id) AS rank
    FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id
  ) WHERE rank <= 10
), truncr AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
      ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
        list_sum(list_transform(range(1, 17),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE)))
        / ( sqrt(list_sum(list_transform(range(1, 17),
              i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
          * sqrt(list_sum(list_transform(range(1, 17),
              i -> CAST(q.qvec[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE)))) )
        DESC, e.vec_id) AS rank
    FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id
  ) WHERE rank <= 10
)
SELECT f.query_id,
  CAST(10 AS BIGINT) AS k,
  CAST(COUNT(t.vec_id) AS BIGINT) AS n_overlap,
  CAST(COUNT(t.vec_id) * 1000000 // 10 AS BIGINT) AS recall_x1e6
FROM fullr f LEFT JOIN truncr t USING (query_id, vec_id)
GROUP BY 1
""",
)
def matryoshka_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 representation QA: how much of the full-dimension cosine top-10
    survives truncating embeddings to their first 16 components — the
    acceptance test for Matryoshka-style dimension reduction (store/scan
    the prefix at 4x less cost iff recall holds; this table is the
    decision). Both rankings run the brute-force broadcast-anchor scan
    (cosine_topk's shape); the truncated leg scores over the sliced
    prefix only; overlap is an exact integer count per anchor. At 100 TB
    the same query prices an ANN index built on the prefix."""
    em = load_table(spark, sf_dir, "embeddings")
    anchors = em.filter(F.col("vec_id").isin(_QUERY_VEC_IDS))
    full = S.cosine_topk(
        em, anchors, id_col="vec_id", vec_col="embedding",
        query_id_col="vec_id", k=10,
    ).select("query_id", "vec_id")
    em16 = em.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    anchors16 = anchors.select(
        "vec_id", F.slice("embedding", 1, 16).alias("embedding")
    )
    trunc = S.cosine_topk(
        em16, anchors16, id_col="vec_id", vec_col="embedding",
        query_id_col="vec_id", k=10,
    ).select("query_id", F.col("vec_id").alias("t_vec_id"))
    joined = full.join(
        trunc,
        (full.query_id == trunc.query_id) & (full.vec_id == trunc.t_vec_id),
        "left",
    ).select(full.query_id.alias("query_id"), "t_vec_id")
    return joined.groupBy("query_id").agg(
        F.lit(10).cast("long").alias("k"),
        F.count("t_vec_id").cast("long").alias("n_overlap"),
        F.expr("CAST(COUNT(t_vec_id) * 1000000 DIV 10 AS BIGINT)").alias(
            "recall_x1e6"
        ),
    )


@query(
    "rater_agreement_kappa",
    # kappa entirely in HUGEINT products with sign-factored truncating
    # division (DuckDB // floors, Spark DIV truncates — they agree only
    # on non-negative operands, and kappa CAN be negative).
    oracle=r"""
WITH r AS (
  SELECT lang,
    n_chars >= 300 AS a,
    len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) >= 60 AS b
  FROM documents
), g AS (
  SELECT lang,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n_both_pos,
    CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n_both_neg,
    CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n_only_a,
    CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n_only_b
  FROM r GROUP BY 1
), k AS (
  SELECT *,
    CAST(n_docs AS HUGEINT) * (n_both_pos + n_both_neg)
      - ((n_both_pos + n_only_a) * CAST(n_both_pos + n_only_b AS HUGEINT)
         + (n_both_neg + n_only_b) * CAST(n_both_neg + n_only_a AS HUGEINT))
      AS num,
    CAST(n_docs AS HUGEINT) * n_docs
      - ((n_both_pos + n_only_a) * CAST(n_both_pos + n_only_b AS HUGEINT)
         + (n_both_neg + n_only_b) * CAST(n_both_neg + n_only_a AS HUGEINT))
      AS den
  FROM g
)
SELECT lang, n_docs, n_both_pos, n_both_neg, n_only_a, n_only_b,
  CAST(CASE WHEN den = 0 THEN NULL
       ELSE (CASE WHEN num >= 0 THEN 1 ELSE -1 END)
            * (abs(num) * 1000000 // den) END AS BIGINT) AS kappa_x1e6
FROM k
""",
)
def rater_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 labeling-QA readout: Cohen's kappa between two deterministic
    quality raters per language (operators/evaluation.py:
    cohen_kappa_by_group) — a char-length rule (n_chars >= 300) vs a
    token-count rule (>= 60 whitespace tokens). Raw agreement is
    inflated whenever one label dominates a language; kappa subtracts
    the marginal-product chance agreement, which is exactly the audit
    you run before trusting any pair of labeling passes (two quality
    classifiers, heuristic vs model judge, annotator vs annotator) to
    vote on training-set admission. One counts-only aggregation; the
    fixed-point kappa is sign-factored integer division, engine-exact
    including negative (below-chance) values."""
    from ibis_flink_example_spark.operators.dedup import words
    from ibis_flink_example_spark.operators.evaluation import (
        cohen_kappa_by_group,
    )

    docs = load_table(spark, sf_dir, "documents")
    rated = docs.select(
        "lang",
        (F.col("n_chars") >= 300).alias("rater_len"),
        (F.size(words("text")) >= 60).alias("rater_tok"),
    )
    return cohen_kappa_by_group(
        rated,
        rater_a_col="rater_len",
        rater_b_col="rater_tok",
        group_cols=("lang",),
    )


_DEQ_SQL = """list_transform(embedding, v ->
      CASE WHEN mab = 0 THEN CAST(0 AS DOUBLE)
           ELSE floor(CAST(v AS DOUBLE) / (mab / 127.0) + 0.5) * (mab / 127.0)
      END)"""


@query(
    "int8_retrieval_agreement",
    # Both legs are the broadcast-anchor brute-force ranking; the int8
    # leg scores over DEQUANTIZED vectors (q * scale) built with the
    # embedding_quantize idiom (floor(x/scale + 0.5): round() half-tie
    # direction differs between engines for negatives; floor(+0.5) is
    # the identical IEEE op), so the oracle replays the distortion
    # bit-for-bit.
    oracle=rf"""
WITH mx AS (
  SELECT vec_id, embedding,
    list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS mab
  FROM embeddings
), deq AS (
  SELECT vec_id, {_DEQ_SQL} AS dvec FROM mx
), q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
  WHERE vec_id IN (0,1,2,3,4)
), qd AS (
  SELECT vec_id AS query_id, dvec AS qvec FROM deq
  WHERE vec_id IN (0,1,2,3,4)
), full_ranked AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
      ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
        list_sum(list_transform(range(1, len(e.embedding) + 1),
          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE)))
        / ( sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
              i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
          * sqrt(list_sum(list_transform(range(1, len(q.qvec) + 1),
              i -> CAST(q.qvec[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE)))) )
        DESC, e.vec_id) AS rank
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> q.query_id
  ) WHERE rank <= 10
), int8_ranked AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
      ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
        list_sum(list_transform(range(1, len(e.dvec) + 1),
          i -> e.dvec[i] * q.qvec[i]))
        / ( sqrt(list_sum(list_transform(range(1, len(e.dvec) + 1),
              i -> e.dvec[i] * e.dvec[i])))
          * sqrt(list_sum(list_transform(range(1, len(q.qvec) + 1),
              i -> q.qvec[i] * q.qvec[i]))) )
        DESC, e.vec_id) AS rank
    FROM deq e CROSS JOIN qd q
    WHERE e.vec_id <> q.query_id
  ) WHERE rank <= 10
)
SELECT f.query_id,
  CAST(10 AS BIGINT) AS k,
  CAST(COUNT(i.vec_id) AS BIGINT) AS n_overlap,
  CAST(COUNT(i.vec_id) * 1000000 // 10 AS BIGINT) AS agreement_x1e6
FROM full_ranked f
LEFT JOIN int8_ranked i
  ON i.query_id = f.query_id AND i.vec_id = f.vec_id
GROUP BY 1
""",
)
def int8_retrieval_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 serving-quantization QA: how much of the float cosine top-10
    survives symmetric per-vector int8 quantization — the acceptance
    test for shipping int8 embeddings to the ANN index (4x memory/
    bandwidth cut iff agreement holds; this table is the decision, the
    matryoshka query's twin for the PRECISION axis instead of the
    dimension axis). The int8 leg ranks over dequantized vectors
    (q * scale with the embedding_quantize idiom) — mathematically the
    same order as ranking the int8 codes, and it reuses the audited
    broadcast-anchor brute-force scan on both legs. Overlap is an exact
    integer count per anchor. At 100 TB the same query prices an int8
    HNSW/IVF index against the float baseline."""
    em = load_table(spark, sf_dir, "embeddings")
    # xd and max_abs lambda-BOUND (bind_col, r15): the dequantize lambda
    # otherwise re-evaluated scale — and through it the array_max pass —
    # once per element (O(dim^2) per row, the embedding_quantize twin).
    from ibis_flink_example_spark.operators.text import bind_col

    xd0 = F.transform(F.col("embedding"), lambda v: v.cast("double"))

    def deq_body(xdb: Column) -> Column:
        def inner(mab: Column) -> Column:
            scale = mab / F.lit(127.0)
            return F.when(
                mab == 0, F.transform(xdb, lambda v: F.lit(0.0))
            ).otherwise(
                F.transform(
                    xdb, lambda v: F.floor(v / scale + F.lit(0.5)) * scale
                )
            )

        return bind_col(F.array_max(F.transform(xdb, F.abs)), inner)

    emq = em.select("vec_id", bind_col(xd0, deq_body).alias("embedding"))
    anchors = em.filter(F.col("vec_id").isin(_QUERY_VEC_IDS))
    anchorsq = emq.filter(F.col("vec_id").isin(_QUERY_VEC_IDS))
    full = S.cosine_topk(
        em, anchors, id_col="vec_id", vec_col="embedding",
        query_id_col="vec_id", k=10,
    ).select("query_id", "vec_id")
    int8 = S.cosine_topk(
        emq, anchorsq, id_col="vec_id", vec_col="embedding",
        query_id_col="vec_id", k=10,
    ).select("query_id", F.col("vec_id").alias("q_vec_id"))
    joined = full.join(
        int8,
        (full.query_id == int8.query_id) & (full.vec_id == int8.q_vec_id),
        "left",
    ).select(full.query_id.alias("query_id"), "q_vec_id")
    return joined.groupBy("query_id").agg(
        F.lit(10).cast("long").alias("k"),
        F.count("q_vec_id").cast("long").alias("n_overlap"),
        F.expr("CAST(COUNT(q_vec_id) * 1000000 DIV 10 AS BIGINT)").alias(
            "agreement_x1e6"
        ),
    )


# ---------------------------------------------------------------------------
# X2/X3: ANN-backed SemDeDup at the LSH layer (r13)
# ---------------------------------------------------------------------------


from ibis_flink_example_spark.oracle_fragments import (  # noqa: E402
    _SEMDEDUP_COS6_AB,
    _semdedup_lsh_cte,
)


@query(
    "semdedup_lsh",
    # Components via recursive transitive closure over the LSH-verified
    # pair residue (the semantic_dedup oracle's CC idiom on the new pair
    # generator).
    oracle="WITH RECURSIVE "
    + _semdedup_lsh_cte()
    + r""", e AS (
  SELECT id_a AS src, id_b AS dst FROM ver
  UNION ALL
  SELECT id_b, id_a FROM ver
), reach AS (
  SELECT src AS id, dst AS r FROM e
  UNION
  SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id
), comp AS (
  SELECT id, MIN(r) AS minr FROM reach GROUP BY id
)
SELECT em.vec_id, em.label
FROM embeddings em
LEFT JOIN comp c ON em.vec_id = c.id
WHERE c.id IS NULL OR em.vec_id <= c.minr
""",
)
def semdedup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X3 ANN-backed SemDeDup (VERDICT r12 #3c): semantic_dedup's
    connected-components representative selection composed with
    lsh_label_agreement's bucket-equi-join candidate machinery,
    amplified to L=6 hyperplane tables x 6 planes with Hamming-1 probes
    (operators/similarity.py:semdedup_lsh). Unlike semantic_dedup's
    same-label blocking (a fixture stand-in for k-means assignment),
    the LSH tables need no trained blocking column — the 100 TB form.
    Candidates are verified at exact cos6 >= 350000 before any edge
    enters the component graph; recall vs the blocked-exact arm is
    MEASURED by semdedup_lsh_recall, not assumed."""
    em = load_table(spark, sf_dir, "embeddings")
    return S.semdedup_lsh(
        em, id_col="vec_id", vec_col="embedding", dim=64
    ).select("vec_id", "label")


@query(
    "semdedup_lsh_recall",
    oracle="WITH "
    + _semdedup_lsh_cte()
    + f""", truth AS MATERIALIZED (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE {_SEMDEDUP_COS6_AB} >= 350000
), counts AS (
  SELECT
    (SELECT COUNT(*) FROM truth) AS nt,
    (SELECT COUNT(*) FROM cand) AS ncand,
    (SELECT COUNT(*) FROM ver) AS nv,
    (SELECT COUNT(*) FROM ver JOIN truth USING (id_a, id_b)) AS nc
)
SELECT CAST(nt AS BIGINT) AS n_truth_pairs,
  CAST(ncand AS BIGINT) AS n_candidate_pairs,
  CAST(nv AS BIGINT) AS n_verified_pairs,
  CAST(nc AS BIGINT) AS n_common_pairs,
  CASE WHEN nt = 0 THEN NULL
       ELSE CAST(floor(CAST(nc AS DOUBLE) / CAST(nt AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
  END AS recall_x1e6
FROM counts
""",
)
def semdedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 recall witness for semdedup_lsh (the ann_recall_ivf idiom):
    ground truth = the blocked-exact arm (semantic_dedup's same-label
    pairs at the same cos6 >= 350000 gate), measured against the LSH
    arm's candidate and verified pair sets. One row:
    (n_truth_pairs, n_candidate_pairs, n_verified_pairs, n_common_pairs,
    recall_x1e6). The candidate stage is computed ONCE (eager
    localCheckpoint) and shared by the count and the verify; a fixture
    rotation that empties the truth set reports NULL recall in both
    engines and trips the witness-premise test
    (tests/test_llm_operators.py) rather than passing trivially."""
    em = load_table(spark, sf_dir, "embeddings")
    cand = S.lsh_multitable_candidate_pairs(
        em, id_col="vec_id", vec_col="embedding", dim=64
    ).localCheckpoint(eager=True)
    ver = S.lsh_semantic_pairs(
        em, id_col="vec_id", vec_col="embedding", dim=64, candidates=cand
    )
    truth = (
        S.embedding_neardup_pairs(
            em,
            id_col="vec_id",
            vec_col="embedding",
            block_col="label",
            threshold=0.3499,
        )
        .select(
            "id_a",
            "id_b",
            F.round(F.col("cosine") * 1_000_000, 0).cast("long").alias("__cos6"),
        )
        .filter(F.col("__cos6") >= 350_000)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    n_t = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth_pairs"))
    n_cand = cand.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidate_pairs")
    )
    n_v = ver.agg(F.count(F.lit(1)).cast("long").alias("n_verified_pairs"))
    n_c = (
        ver.join(truth, ["id_a", "id_b"], "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common_pairs"))
    )
    out = (
        n_t.crossJoin(n_cand)
        .crossJoin(n_v)
        .crossJoin(n_c)
        .select(
            "n_truth_pairs",
            "n_candidate_pairs",
            "n_verified_pairs",
            "n_common_pairs",
            F.when(F.col("n_truth_pairs") == 0, F.lit(None))
            .otherwise(
                F.floor(
                    F.col("n_common_pairs")
                    / F.col("n_truth_pairs")
                    * 1_000_000
                    + 0.5
                ).cast("bigint")
            )
            .alias("recall_x1e6"),
        )
    )
    from ibis_flink_example_spark.operators.checkpoints import (
        attach_eager_checkpoints,
    )

    return attach_eager_checkpoints(out, handles=(cand, truth))


# ---------------------------------------------------------------------------
# X4: URL/domain-layer curation (r13)
# ---------------------------------------------------------------------------

# The C4/Gopher-style domain blocklist, applied at the host level. The
# synthetic corpus carries no URL column, so hosts that EXIST at every SF
# are chosen (every source's hub host is populated by doc_id % 7 < 3).
_BLOCKED_HOSTS = ("src3.hub.example.com", "src7.hub.example.com")
_DOMAIN_DOC_CAP = 8


@query(
    "url_domain_curation",
    oracle=rf"""
WITH u AS (
  SELECT doc_id, n_chars,
    'https://' ||
    CASE WHEN doc_id % 7 < 3 THEN source || '.hub.example.com'
         ELSE source || '-' || CAST(doc_id % 13 AS VARCHAR) || '.example.com'
    END || '/doc/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
), x AS (
  SELECT doc_id, n_chars, regexp_extract(url, '^https?://([^/]+)', 1) AS host
  FROM u
), r AS (
  SELECT host, doc_id, n_chars,
    ROW_NUMBER() OVER (
      PARTITION BY host ORDER BY n_chars DESC, doc_id
    ) AS rn
  FROM x
)
SELECT host,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  (host IN ('src3.hub.example.com', 'src7.hub.example.com')) AS is_blocked,
  CAST(CASE WHEN host IN ('src3.hub.example.com', 'src7.hub.example.com')
       THEN 0 ELSE SUM(CASE WHEN rn <= {_DOMAIN_DOC_CAP} THEN 1 ELSE 0 END)
       END AS BIGINT) AS n_kept,
  CAST(CASE WHEN host IN ('src3.hub.example.com', 'src7.hub.example.com')
       THEN COUNT(*)
       ELSE COUNT(*) - SUM(CASE WHEN rn <= {_DOMAIN_DOC_CAP} THEN 1 ELSE 0 END)
       END AS BIGINT) AS n_dropped,
  CAST(CASE WHEN host IN ('src3.hub.example.com', 'src7.hub.example.com')
       THEN 0 ELSE SUM(CASE WHEN rn <= {_DOMAIN_DOC_CAP} THEN n_chars ELSE 0 END)
       END AS BIGINT) AS kept_chars
FROM r GROUP BY host
""",
)
def url_domain_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 URL/domain-layer curation (VERDICT r12 #3a — the C4/Gopher
    pre-filter): host extraction from a URL column (parse_url, a
    codegen'd JVM expression; the oracle replays it as a regex), a
    per-domain doc cap (keep the top 8 docs per host by
    (n_chars DESC, doc_id) — the boilerplate-farm guard), and a domain
    blocklist applied via a broadcast join against a literal blocklist
    frame. The fixture has no URL column, so a deterministic URL is
    SYNTHESIZED in both engines from (source, doc_id) with a skewed host
    map — every source gets a populated .hub host (doc_id % 7 < 3 — 7 is
    coprime with the fixture's source = doc_id % 20 assignment, so
    every source's hub holds ~3/7 of its docs, >cap at every SF and the
    cap provably binds: the witness premise) and
    13 long-tail hosts. Output is the per-host audit table:
    (host, n_docs, is_blocked, n_kept, n_dropped, kept_chars).

    Scale shape: URL synthesis + host extraction fuse into the scan;
    ONE exchange (the host window), the per-host rollup rides the same
    partitioning; the blocklist attaches to the ~|hosts| rollup as a
    2-row broadcast. A mega-host (a billion-doc domain at 100 TB) makes
    the rank window that host's partition-local sort — the standard
    two-phase top-k rewrite applies if a single host outgrows a
    partition, and the cap itself is what bounds what survives."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.when(
            F.col("doc_id") % 7 < 3,
            F.concat(F.col("source"), F.lit(".hub.example.com")),
        ).otherwise(
            F.concat(
                F.col("source"),
                F.lit("-"),
                (F.col("doc_id") % 13).cast("string"),
                F.lit(".example.com"),
            )
        ),
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
    )
    x = docs.select(
        "doc_id", "n_chars", F.parse_url(url, F.lit("HOST")).alias("host")
    )
    w = Window.partitionBy("host").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    r = x.withColumn("rn", F.row_number().over(w))
    g = r.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("rn") <= _DOMAIN_DOC_CAP, 1).otherwise(0))
        .cast("long")
        .alias("__n_le_cap"),
        F.sum(
            F.when(F.col("rn") <= _DOMAIN_DOC_CAP, F.col("n_chars")).otherwise(0)
        )
        .cast("long")
        .alias("__chars_le_cap"),
    )
    bl = F.broadcast(
        spark.createDataFrame(
            [(h,) for h in _BLOCKED_HOSTS], "host string"
        ).withColumn("__blocked", F.lit(True))
    )
    return g.join(bl, "host", "left").select(
        "host",
        "n_docs",
        F.col("__blocked").isNotNull().alias("is_blocked"),
        F.when(F.col("__blocked").isNotNull(), F.lit(0))
        .otherwise(F.col("__n_le_cap"))
        .cast("long")
        .alias("n_kept"),
        F.when(F.col("__blocked").isNotNull(), F.col("n_docs"))
        .otherwise(F.col("n_docs") - F.col("__n_le_cap"))
        .cast("long")
        .alias("n_dropped"),
        F.when(F.col("__blocked").isNotNull(), F.lit(0))
        .otherwise(F.col("__chars_le_cap"))
        .cast("long")
        .alias("kept_chars"),
    )


@query(
    "prefix_cache_sharing",
    # Shared-prefix groups over the planted-duplicate corpus (every doc
    # with doc_id % 50 == 0 re-added under +1e6 — the _with_planted_dups
    # premise, mirrored here): identical first-32-token prefixes are
    # exact string groups, so the whole readout is SQL-computable.
    oracle=r"""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0
), p AS (
  SELECT doc_id,
    md5(array_to_string(list_slice(
      regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+'), 1, 32), ' ')) AS prefix_md5,
    LEAST(len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')), 32) AS prefix_tokens
  FROM aug
)
SELECT prefix_md5,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(MIN(prefix_tokens) AS BIGINT) AS prefix_tokens,
  CAST((COUNT(*) - 1) * MIN(prefix_tokens) AS BIGINT) AS saved_tokens
FROM p GROUP BY prefix_md5 HAVING COUNT(*) >= 2
""",
)
def prefix_cache_sharing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving-side prefix KV-cache sharing plan: documents whose first
    32 tokens are IDENTICAL can reuse one prefix cache entry at
    inference, so the per-group saving is (n_docs - 1) x prefix_tokens —
    the table a batch-inference scheduler reads to co-locate requests.
    Groups are exact-string (md5 of the joined 32-token prefix, the
    dedup_exact digest idiom); the synthetic corpus has no natural
    shared prefixes, so the shared _with_planted_dups corpus supplies
    the witnesses (every 50th doc duplicated verbatim — identical
    prefix guaranteed), and any NATURAL collision the fixture ever
    grows is reported identically by both engines.

    Scale shape: prefix slice + digest fuse into the scan (only the
    32-token prefix is ever materialized, not the document); ONE
    exchange on the digest; output is bounded by the number of shared
    groups. The HAVING >= 2 cut keeps the result the sharing plan, not
    a per-doc listing."""
    aug = _with_planted_dups(load_table(spark, sf_dir, "documents"))
    ws = D.words("text")
    p = aug.select(
        "doc_id",
        F.md5(F.array_join(F.slice(ws, 1, 32), " ")).alias("prefix_md5"),
        F.least(F.size(ws), F.lit(32)).cast("long").alias("prefix_tokens"),
    )
    return (
        p.groupBy("prefix_md5")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("prefix_tokens").cast("long").alias("prefix_tokens"),
            (
                (F.count(F.lit(1)) - 1) * F.min("prefix_tokens")
            ).cast("long").alias("saved_tokens"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@query(
    "dpo_pair_assembly",
    # Reuses _lang_scored_sql so the pairing score is THE one lexical
    # score definition the calibration/ROC families already share.
    oracle="WITH "
    + _lang_scored_sql("doc_id, ")
    + r""", t AS (
  SELECT s.doc_id, s.score, d.lang,
    CAST(floor(log2(len(regexp_split_to_array(trim(d.text), '[ \t\n\x0B\f\r]+')) + 1)) AS INTEGER) AS len_bucket
  FROM s JOIN documents d ON d.doc_id = s.doc_id
), r AS (
  SELECT lang, len_bucket, doc_id, score,
    ROW_NUMBER() OVER (
      PARTITION BY lang, len_bucket ORDER BY score DESC, doc_id
    ) AS rnk
  FROM t
), p AS (
  SELECT lang, len_bucket, CAST((rnk - 1) // 2 AS BIGINT) AS pair_id,
    MAX(CASE WHEN rnk % 2 = 1 THEN doc_id END) AS chosen_id,
    MAX(CASE WHEN rnk % 2 = 0 THEN doc_id END) AS rejected_id,
    MAX(CASE WHEN rnk % 2 = 1 THEN score END) AS c_score,
    MAX(CASE WHEN rnk % 2 = 0 THEN score END) AS r_score,
    COUNT(*) AS n
  FROM r GROUP BY 1, 2, 3
)
SELECT lang, len_bucket, pair_id,
  CAST(chosen_id AS BIGINT) AS chosen_id,
  CAST(rejected_id AS BIGINT) AS rejected_id,
  CAST(c_score - r_score AS BIGINT) AS margin_x1e6
FROM p WHERE n = 2
""",
)
def dpo_pair_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair assembly (the DPO/RLHF dataset-construction step):
    within each (lang, log2-length-bucket) comparability group, docs are
    ranked by the fleet's shared lexical quality score and adjacent
    ranks pair off — rank 2k-1 becomes the CHOSEN response, rank 2k the
    REJECTED one, so every pair is quality-ordered by construction and
    the reported margin (score difference, x1e6) is the pair's training
    signal strength; a margin-0 pair is a tie the consumer may drop.
    Grouping by language and length bucket is the standard
    comparability control (pairing a long en doc against a short zh doc
    teaches length/language, not quality). Odd leftovers per group are
    excluded (n = 2 filter) identically in both engines.

    Scale shape: score + bucket are scan-stage column math; ONE exchange
    (the (lang, len_bucket) rank window) and the pair rollup rides the
    same partitioning (its keys are a superset). Ties break on doc_id,
    so the pairing is deterministic under any partitioning."""
    from ibis_flink_example_spark.operators.evaluation import (
        stopword_lang_score_x1e6,
    )
    from ibis_flink_example_spark.operators.text import (
        LANG_MARKERS,
        token_count_whitespace,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "lang",
        stopword_lang_score_x1e6("text", LANG_MARKERS["en"]).alias("score"),
        F.floor(F.log2(token_count_whitespace("text") + 1))
        .cast("int")
        .alias("len_bucket"),
    )
    w = Window.partitionBy("lang", "len_bucket").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    r = base.withColumn("rnk", F.row_number().over(w)).withColumn(
        "pair_id", F.expr("CAST((rnk - 1) DIV 2 AS BIGINT)")
    )
    p = r.groupBy("lang", "len_bucket", "pair_id").agg(
        F.max(F.when(F.col("rnk") % 2 == 1, F.col("doc_id"))).alias("chosen_id"),
        F.max(F.when(F.col("rnk") % 2 == 0, F.col("doc_id"))).alias(
            "rejected_id"
        ),
        F.max(F.when(F.col("rnk") % 2 == 1, F.col("score"))).alias("__c"),
        F.max(F.when(F.col("rnk") % 2 == 0, F.col("score"))).alias("__r"),
        F.count(F.lit(1)).alias("__n"),
    )
    return p.filter(F.col("__n") == 2).select(
        "lang",
        "len_bucket",
        "pair_id",
        F.col("chosen_id").cast("long").alias("chosen_id"),
        F.col("rejected_id").cast("long").alias("rejected_id"),
        (F.col("__c") - F.col("__r")).cast("long").alias("margin_x1e6"),
    )


@query(
    "embedding_coverage_audit",
    # vec_id % 37 == 0 simulates a failed backfill shard (mirrored
    # exactly), so n_missing is non-trivially > 0 at every SF even when
    # the fixture's natural doc<->vec coverage is complete; sf0.1's
    # natural 2000-of-5000 partial coverage rides on top.
    oracle=r"""
WITH e AS (
  SELECT vec_id FROM embeddings WHERE vec_id % 37 <> 0
)
SELECT d.source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(e.vec_id) AS BIGINT) AS n_embedded,
  CAST(COUNT(*) - COUNT(e.vec_id) AS BIGINT) AS n_missing,
  CAST(COUNT(e.vec_id) * 1000000 // COUNT(*) AS BIGINT) AS coverage_x1e6
FROM documents d LEFT JOIN e ON d.doc_id = e.vec_id
GROUP BY d.source
""",
)
def embedding_coverage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-backfill coverage monitor: per source, how many docs
    have a vector in the embeddings table — the audit that catches a
    partially-failed embedding job BEFORE a similarity/dedup stage
    silently runs on 40% of the corpus (exactly the sf0.1 fixture's
    natural state: 2000 vectors over 5000 docs). A deterministic failed
    shard is PLANTED (vec_id % 37 == 0 excluded, mirrored in the
    oracle) so the n_missing readout is non-trivially positive at every
    SF — the witness-premise policy.

    Scale shape: one doc->vec equi LEFT join on the id (the vec-id
    projection is a slim 8-byte column; broadcastable while the vector
    table's ID SET fits the budget, shuffle otherwise — Catalyst/AQE
    picks) followed by the per-source rollup. The docs scan reads only
    (doc_id, source)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id")
        .filter(F.col("vec_id") % 37 != 0)
    )
    j = docs.join(e, docs.doc_id == e.vec_id, "left")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count("vec_id").cast("long").alias("n_embedded"),
        (F.count(F.lit(1)) - F.count("vec_id")).cast("long").alias("n_missing"),
        F.expr(
            "CAST(COUNT(vec_id) * 1000000 DIV COUNT(*) AS BIGINT)"
        ).alias("coverage_x1e6"),
    )


# ---------------------------------------------------------------------------
# X2/X3 extension (r14): fixed-point Lloyd k-means + trained-blocking SemDeDup
# ---------------------------------------------------------------------------


_KMEANS_K = 8
_KMEANS_ITERS = 4
# Population cap for a k-means cluster used as a pair-blocking key —
# the drop_hot_keys treatment every LSH band bucket gets (VERDICT r14
# #2: without it the within-cluster self-join is O((n/k)^2) when k is
# fixed). k stays the PRIMARY dial (k ~ n / target_cluster_size keeps
# occupancy constant); the cap is the backstop for the cluster that
# swallowed a degenerate mode anyway. Same value as the band-bucket
# cap; fixture clusters are ~n/8 << cap, so the DuckDB oracle (uncapped)
# still replays exactly — the headroom test pins that premise.
_SEMDEDUP_CLUSTER_CAP = 50_000


def _kmeans_ctes(k: int, iters: int, *, recursive: bool = False) -> str:
    """Unrolled Lloyd k-means CTE chain (PageRank discipline: one CTE
    block per iteration of the EXACT integer recurrence the Spark loop in
    operators/clustering.py runs, so a hash match proves
    iteration-for-iteration equality). Quantize -> seed centroids from
    the k smallest vec_ids -> per iteration: encoded-argmin assignment
    (MIN(dist * k + cid): deterministic tie-break toward the smaller
    cluster id) and truncating-division centroid update with
    empty-cluster carryover; the final iteration assigns only. ``//`` is
    truncation toward zero in DuckDB, matching Spark ``DIV`` and the
    operator's ``_trunc_div`` on the (negative-capable) component sums."""
    head = f"""
WITH {"RECURSIVE " if recursive else ""}ex AS (
  SELECT vec_id,
    CAST(unnest(range(len(embedding))) AS INTEGER) AS d,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
      AS m
  FROM embeddings
), c0 AS (
  SELECT CAST(dense_rank() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, d, m
  FROM ex
  WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
)"""
    assign = """, d{i} AS (
  SELECT e.vec_id, c.cid,
         CAST(SUM((e.m - c.m) * (e.m - c.m)) AS BIGINT) AS dist
  FROM ex e JOIN c{p} c ON c.d = e.d
  GROUP BY 1, 2
), a{i} AS (
  SELECT vec_id, MIN(dist * {k} + cid) AS enc FROM d{i} GROUP BY 1
)"""
    update = """, s{i} AS (
  SELECT a.enc % {k} AS cid, e.d, CAST(SUM(e.m) AS BIGINT) AS sm,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ex e JOIN a{i} a USING (vec_id) GROUP BY 1, 2
), c{i} AS (
  SELECT c.cid, c.d, CAST(COALESCE(s.sm // s.n, c.m) AS BIGINT) AS m
  FROM c{p} c LEFT JOIN s{i} s ON s.cid = c.cid AND s.d = c.d
)"""
    body = ""
    for i in range(1, iters + 1):
        body += assign.format(i=i, p=i - 1, k=k)
        if i < iters:
            body += update.format(i=i, p=i - 1, k=k)
    return head + body


def _kmeans_assign_oracle(k: int, iters: int) -> str:
    return (
        _kmeans_ctes(k, iters)
        + f"""
SELECT a.vec_id, CAST(a.enc % {k} AS BIGINT) AS cluster_id,
       CAST(a.enc // {k} AS BIGINT) AS dist_micro2
FROM a{iters} a
"""
    )


@query(
    "kmeans_assign_embeddings",
    oracle=_kmeans_assign_oracle(_KMEANS_K, _KMEANS_ITERS),
)
def kmeans_assign_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 iterative clustering: fixed-point Lloyd k-means over the
    embeddings table (k=8, 4 assignment passes) — the trained cluster
    assignment SemDeDup/IVF block on at scale (the LSH arm's documented
    stand-in replacement, operators/similarity.py). One row per vector:
    final cluster id + squared L2 distance in micro^2 units, all-BIGINT.

    Scale shape (operators/clustering.py): centroids live on the driver
    as a k x dim integer literal matrix, so each iteration is one
    map-only codegen scan of the checkpointed quantized base (no join)
    plus one k-row aggregation with map-side partials; collects are
    bounded by k. Oracle: CTE-per-iteration unroll of the identical
    integer recurrence."""
    from ibis_flink_example_spark.operators import clustering as C

    em = load_table(spark, sf_dir, "embeddings")
    return C.kmeans_assign(
        em,
        id_col="vec_id",
        vec_col="embedding",
        dim=64,
        k=_KMEANS_K,
        iters=_KMEANS_ITERS,
    )


@query(
    "semdedup_kmeans",
    # The k-means chain above, then semantic_dedup's pair/CC oracle with
    # the learned cluster id as the blocking column (the trained
    # SemDeDup form) instead of the fixture label.
    oracle=_kmeans_ctes(_KMEANS_K, _KMEANS_ITERS, recursive=True)
    + f""", asn AS (
  SELECT vec_id, CAST(enc % {_KMEANS_K} AS BIGINT) AS cluster_id
  FROM a{_KMEANS_ITERS}
), n AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE) /
      sqrt(list_sum(list_transform(embedding,
        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))
    ) AS nvec
  FROM embeddings
), p AS (
  SELECT sa.vec_id AS id_a, sb.vec_id AS id_b
  FROM asn sa
  JOIN asn sb ON sa.cluster_id = sb.cluster_id AND sa.vec_id < sb.vec_id
  JOIN n na ON na.vec_id = sa.vec_id
  JOIN n nb ON nb.vec_id = sb.vec_id
  WHERE list_sum(list_transform(range(1, len(na.nvec) + 1),
                 i -> na.nvec[i] * nb.nvec[i])) >= 0.35
), e AS (
  SELECT id_a AS src, id_b AS dst FROM p
  UNION ALL
  SELECT id_b, id_a FROM p
), reach AS (
  SELECT src AS id, dst AS r FROM e
  UNION
  SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id
), comp AS (
  SELECT id, MIN(r) AS minr FROM reach GROUP BY id
)
SELECT a.vec_id, a.cluster_id
FROM asn a
LEFT JOIN comp c ON a.vec_id = c.id
WHERE c.id IS NULL OR a.vec_id <= c.minr
""",
)
def semdedup_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X3 trained-blocking SemDeDup: k-means cluster assignment as the
    blocking column for embedding-cosine near-dup removal — the actual
    SemDeDup recipe (cluster with k-means, form pairs only within a
    cluster, keep the min-id representative per similarity component).
    Completes the family bracket: `semantic_dedup` blocks on the fixture
    label (given blocking), `semdedup_lsh` on random hyperplanes
    (training-free), this on LEARNED centroids (trained blocking).

    Scale shape: the pair space is |cluster|^2-bounded per cluster (k is
    the dial: k ~ n / target_cluster_size keeps it linear), pairs form
    via one (cluster_id) equi self-join — no CartesianProduct — and the
    component step reuses dedup.connected_components' bounded/distributed
    hybrid. A cluster whose population exceeds _SEMDEDUP_CLUSTER_CAP is
    dropped from pair formation entirely (drop_hot_keys — the same cap
    every LSH band bucket gets), so a degenerate mode cluster cannot go
    quadratic even when k is misconfigured; fixture clusters sit far
    under the cap, which is why the uncapped oracle still replays
    exactly (headroom-tested). Returns surviving (vec_id, cluster_id)."""
    from ibis_flink_example_spark.operators import clustering as C

    em = load_table(spark, sf_dir, "embeddings")
    # The assignment is materialized (localCheckpoint): semantic_dedup's
    # internal actions (hot-block count, CC edge materialization) and the
    # final join otherwise each re-plan AND re-execute the full
    # quantize+argmin lineage per action (guide §1.3; measured ~2 s at
    # sf0.1, r15). 16 bytes/row, executor-local blocks — the
    # minhash-signature checkpoint pattern.
    asn = (
        C.kmeans_assign(
            em,
            id_col="vec_id",
            vec_col="embedding",
            dim=64,
            k=_KMEANS_K,
            iters=_KMEANS_ITERS,
        )
        .select("vec_id", "cluster_id")
        .localCheckpoint(eager=True)
    )
    blocked = em.join(asn, "vec_id")
    out = S.semantic_dedup(
        blocked,
        id_col="vec_id",
        vec_col="embedding",
        block_col="cluster_id",
        threshold=0.35,
        max_rows_per_block=_SEMDEDUP_CLUSTER_CAP,
    )
    from ibis_flink_example_spark.operators.checkpoints import (
        attach_eager_checkpoints,
    )

    return attach_eager_checkpoints(
        out.select("vec_id", "cluster_id"), out, handles=(asn,)
    )


@query(
    "semdedup_kmeans_recall",
    # The kmeans chain + blocked/truth pair counts: trained-blocking
    # recall against the same label-truth arm semdedup_lsh_recall uses,
    # so the two blocking strategies are measured on one yardstick.
    oracle=_kmeans_ctes(_KMEANS_K, _KMEANS_ITERS)
    + f""", v AS (
  SELECT vec_id, label,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec,
    sqrt(list_sum(list_transform(embedding,
      y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))) AS nrm
  FROM embeddings
), asn AS (
  SELECT vec_id, CAST(enc % {_KMEANS_K} AS BIGINT) AS cid
  FROM a{_KMEANS_ITERS}
), blocked AS (
  SELECT sa.vec_id AS id_a, sb.vec_id AS id_b
  FROM asn sa
  JOIN asn sb ON sa.cid = sb.cid AND sa.vec_id < sb.vec_id
  JOIN v a ON a.vec_id = sa.vec_id
  JOIN v b ON b.vec_id = sb.vec_id
  WHERE {_SEMDEDUP_COS6_AB} >= 350000
), truth AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE {_SEMDEDUP_COS6_AB} >= 350000
), counts AS (
  SELECT
    (SELECT COUNT(*) FROM truth) AS nt,
    (SELECT COUNT(*) FROM blocked) AS nb,
    (SELECT COUNT(*) FROM blocked JOIN truth USING (id_a, id_b)) AS nc
)
SELECT CAST(nt AS BIGINT) AS n_truth_pairs,
  CAST(nb AS BIGINT) AS n_blocked_pairs,
  CAST(nc AS BIGINT) AS n_common_pairs,
  CASE WHEN nt = 0 THEN NULL
       ELSE CAST(floor(CAST(nc AS DOUBLE) / CAST(nt AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
  END AS recall_x1e6
FROM counts
""",
)
def semdedup_kmeans_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 recall witness for the TRAINED SemDeDup arm (the
    semdedup_lsh_recall idiom on the other blocking strategy): ground
    truth = the label-blocked exact pairs at cos6 >= 350000, measured
    against the pairs reachable within learned k-means clusters — so
    the random-hyperplane and learned-centroid blockings are compared
    on one yardstick. One row: (n_truth_pairs, n_blocked_pairs,
    n_common_pairs, recall_x1e6); NULL recall on an empty truth set
    trips the witness-premise test rather than passing trivially."""
    from ibis_flink_example_spark.operators import clustering as C

    em = load_table(spark, sf_dir, "embeddings")
    # Materialized for the same reason as semdedup_kmeans's assignment:
    # the blocked-pair stage's internal actions re-plan/re-execute the
    # quantize+argmin lineage per action otherwise (r15).
    asn = (
        C.kmeans_assign(
            em,
            id_col="vec_id",
            vec_col="embedding",
            dim=64,
            k=_KMEANS_K,
            iters=_KMEANS_ITERS,
        )
        .select("vec_id", "cluster_id")
        .localCheckpoint(eager=True)
    )
    blocked_src = em.join(asn, "vec_id")
    blocked = (
        S.embedding_neardup_pairs(
            blocked_src,
            id_col="vec_id",
            vec_col="embedding",
            block_col="cluster_id",
            threshold=0.3499,
            max_rows_per_block=_SEMDEDUP_CLUSTER_CAP,
        )
        .select(
            "id_a",
            "id_b",
            F.round(F.col("cosine") * 1_000_000, 0).cast("long").alias("__cos6"),
        )
        .filter(F.col("__cos6") >= 350_000)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    truth = (
        S.embedding_neardup_pairs(
            em,
            id_col="vec_id",
            vec_col="embedding",
            block_col="label",
            threshold=0.3499,
        )
        .select(
            "id_a",
            "id_b",
            F.round(F.col("cosine") * 1_000_000, 0).cast("long").alias("__cos6"),
        )
        .filter(F.col("__cos6") >= 350_000)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    n_t = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth_pairs"))
    n_b = blocked.agg(F.count(F.lit(1)).cast("long").alias("n_blocked_pairs"))
    n_c = blocked.join(truth, ["id_a", "id_b"], "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_common_pairs")
    )
    out = (
        n_t.crossJoin(n_b)
        .crossJoin(n_c)
        .select(
            "n_truth_pairs",
            "n_blocked_pairs",
            "n_common_pairs",
            F.when(F.col("n_truth_pairs") == 0, F.lit(None).cast("long"))
            .otherwise(
                F.floor(
                    F.col("n_common_pairs").cast("double")
                    / F.col("n_truth_pairs").cast("double")
                    * 1_000_000
                    + F.lit(0.5)
                ).cast("long")
            )
            .alias("recall_x1e6"),
        )
    )
    from ibis_flink_example_spark.operators.checkpoints import (
        attach_eager_checkpoints,
    )

    return attach_eager_checkpoints(out, handles=(blocked, truth, asn))


@query(
    "kmeans_convergence_churn",
    # Churn between the penultimate (a3, centroids c2) and final (a4,
    # centroids c3) assignment passes of the same unrolled chain.
    oracle=_kmeans_ctes(_KMEANS_K, _KMEANS_ITERS)
    + f"""
SELECT CAST(f.enc % {_KMEANS_K} AS BIGINT) AS cluster_id,
  CAST(COUNT(*) AS BIGINT) AS n_final,
  CAST(SUM(CASE WHEN p.enc % {_KMEANS_K} <> f.enc % {_KMEANS_K}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
  CAST(SUM(CASE WHEN p.enc % {_KMEANS_K} <> f.enc % {_KMEANS_K}
                THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
    AS churn_x1e6
FROM a{_KMEANS_ITERS} f
JOIN a{_KMEANS_ITERS - 1} p USING (vec_id)
GROUP BY 1
""",
)
def kmeans_convergence_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convergence monitor for the iterative clustering tier: per final
    cluster, how many members switched clusters between the penultimate
    and final Lloyd passes — the readout that tells you whether
    ``iters`` was enough (churn near zero = the fixpoint has settled;
    persistent churn = budget more passes or re-seed). Both assignments
    come from ONE scan (kmeans_assign(with_prev=True): the penultimate
    encoded argmin is just a second column expression over the same
    quantized frame), so the monitor costs one extra projection plus the
    per-cluster rollup — never a second k-means run.

    Scale shape: the rollup is the only exchange past the k-means loop
    itself; output is k rows."""
    from ibis_flink_example_spark.operators import clustering as C

    em = load_table(spark, sf_dir, "embeddings")
    asn = C.kmeans_assign(
        em,
        id_col="vec_id",
        vec_col="embedding",
        dim=64,
        k=_KMEANS_K,
        iters=_KMEANS_ITERS,
        with_prev=True,
    )
    moved = F.when(
        F.col("prev_cluster_id") != F.col("cluster_id"), 1
    ).otherwise(0)
    return asn.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_final"),
        F.sum(moved).cast("long").alias("n_moved"),
        F.expr(
            "CAST(SUM(CASE WHEN prev_cluster_id <> cluster_id THEN 1 ELSE 0 "
            "END) * 1000000 DIV COUNT(*) AS BIGINT)"
        ).alias("churn_x1e6"),
    )


@query(
    "bitext_margin_mining",
    # LSH candidate CTEs (oracle_fragments) + cross-group orientation +
    # margin scoring; k=4 candidate-neighborhood averages, margins in
    # integer x1e6 with truncating division both sides.
    oracle="WITH "
    + _semdedup_lsh_cte()
    + """, grp AS (
  SELECT vec_id, (label < 5) AS is_a FROM embeddings
), cross_c AS (
  SELECT CASE WHEN ga.is_a THEN c.id_a ELSE c.id_b END AS x,
         CASE WHEN ga.is_a THEN c.id_b ELSE c.id_a END AS y
  FROM cand c
  JOIN grp ga ON ga.vec_id = c.id_a
  JOIN grp gb ON gb.vec_id = c.id_b
  WHERE ga.is_a <> gb.is_a
), scored AS MATERIALIZED (
  SELECT s.x, s.y,
    CAST(round(list_sum(list_transform(range(1, 64+1),
      i -> a.vec[i] * b.vec[i])) / (a.nrm * b.nrm) * 1000000) AS BIGINT)
      AS cos6
  FROM cross_c s JOIN v a ON a.vec_id = s.x JOIN v b ON b.vec_id = s.y
), rx AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY x ORDER BY cos6 DESC, y) AS rnx
  FROM scored
), axw AS (
  SELECT *, CAST(SUM(CASE WHEN rnx <= 4 THEN cos6 ELSE 0 END)
         OVER (PARTITION BY x)
       // SUM(CASE WHEN rnx <= 4 THEN 1 ELSE 0 END)
         OVER (PARTITION BY x) AS BIGINT) AS avgx
  FROM rx
), ryw AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY y ORDER BY cos6 DESC, x) AS rny
  FROM axw
), ayw AS (
  SELECT *, CAST(SUM(CASE WHEN rny <= 4 THEN cos6 ELSE 0 END)
         OVER (PARTITION BY y)
       // SUM(CASE WHEN rny <= 4 THEN 1 ELSE 0 END)
         OVER (PARTITION BY y) AS BIGINT) AS avgy
  FROM ryw
), m AS (
  SELECT x, y, cos6,
    CAST(cos6 * 2000000 // (avgx + avgy) AS BIGINT) AS margin_x1e6
  FROM ayw
  WHERE avgx + avgy > 0
), best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY x ORDER BY margin_x1e6 DESC, y)
    AS rb
  FROM m
)
SELECT x AS vec_id_a, y AS vec_id_b, cos6, margin_x1e6
FROM best WHERE rb = 1 AND margin_x1e6 >= 1200000
""",
)
def bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 cross-corpus alignment mining (the Artetxe-Schwenk margin
    criterion parallel-corpus miners use, on the repo's ANN candidate
    machinery): treat label < 5 vs label >= 5 as the two corpora (the
    deterministic two-language stand-in), generate CROSS-GROUP candidate
    pairs from the L=6-table Hamming-1 LSH (never an all-pairs product),
    score candidates at exact cos6, and rate each pair by the MARGIN
    against both endpoints' candidate neighborhoods:
    margin = 2e6 * cos(x,y) DIV (avg4(x) + avg4(y)) — absolute cosine
    alone over-accepts hub vectors whose neighborhoods are uniformly
    close; the ratio-to-neighborhood form is what makes mined pairs
    precision-viable. Emits each A-side vector's best-margin match above
    1.2 (44-57 winners and ~200-950 rejections at the gate SFs — both
    sides of the threshold are exercised). All margin math is integer
    with truncating division, mirrored verbatim by the oracle.

    Scale shape: the pair space is LSH-bounded (the semdedup_lsh dial:
    planes ~ log2(n) holds bucket occupancy constant); the avg-4
    neighborhoods are computed over the CANDIDATE frame (two windows +
    two rollups on it), which is the approximation real miners make at
    corpus scale — exact kNN margins would need the brute-force pass the
    candidates exist to avoid. The scored frame is checkpointed once and
    consumed by both window passes and the margin join."""
    em = load_table(spark, sf_dir, "embeddings")
    return S.margin_mined_pairs(
        em.withColumn("__isa", F.col("label") < 5),
        id_col="vec_id",
        vec_col="embedding",
        dim=64,
        is_a_col="__isa",
    )

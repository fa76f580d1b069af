"""BPE merge-rule learning — the tokenizer-training stage of an LLM data
pipeline, and this repo's representative ITERATIVE algorithm (driver-bounded
loop over distributed aggregations; the class the correctness harness
records rows-only because SQL cannot express iteration).

Scale design:
- The working state is the DISTINCT-WORD table (word, count, symbols) — at
  100 TB of text this is orders of magnitude smaller than the corpus (the
  corpus is read exactly once, for the initial word count); every
  iteration's cost is proportional to vocabulary size, not corpus size.
- Each iteration: adjacent-pair counts via explode + one keyed shuffle with
  map-side partials; the argmax pair comes back through a
  TakeOrderedAndProject of ONE row (a control-plane collect, like the IVF
  k-means centroids); the merge rewrite is an Arrow-batched mapInPandas
  over the vocabulary table.
- Lineage is truncated every iteration with an eager localCheckpoint —
  without it the plan tree doubles per merge and iteration k replays all
  k-1 predecessors (the classic iterative-Spark trap).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SYMS_SCHEMA = T.StructType(
    [
        T.StructField("word", T.StringType()),
        T.StructField("count", T.LongType()),
        T.StructField("syms", T.ArrayType(T.StringType())),
    ]
)


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count, syms=chars) over the whitespace-tokenized corpus —
    the one corpus-sized pass; everything after works on the vocabulary."""
    return (
        docs.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
        )
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            "word",
            "count",
            F.expr(
                "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
            ).alias("syms"),
        )
    )


def _merge_pair_in_vocab(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Replace every non-overlapping left-to-right (left, right) adjacency
    with the merged symbol — the standard greedy BPE rewrite, Arrow-batched
    over the vocabulary table."""

    def rewrite(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # self-contained closure: no package imports on workers
        merged = left + right

        def merge_syms(syms):
            out = []
            i, n = 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return out

        for pdf in batches:
            pdf = pdf.copy()
            pdf["syms"] = [merge_syms(list(s)) for s in pdf["syms"]]
            yield pdf

    return vocab.mapInPandas(rewrite, schema=_SYMS_SCHEMA)


def bpe_learn_merges(
    docs: DataFrame, text_col: str = "text", n_merges: int = 8
) -> list[tuple[int, str, str, int]]:
    """Learn the first ``n_merges`` BPE merge rules from the corpus.

    Returns [(merge_rank, left, right, pair_count), ...] — deterministic:
    the argmax pair breaks count ties by (left, right) lexicographic order.
    Stops early if no adjacent pair remains.
    """
    # Checkpoint FIRST (the single corpus-scale pass materializes here),
    # then count the cached table (cheap) and coalesce narrowly over the
    # cached blocks — counting the un-checkpointed plan would run the
    # corpus explode+groupBy twice.
    base = word_vocab(docs, text_col).localCheckpoint(eager=True)
    # Size the iteration state to the VOCABULARY, not the corpus: the loop
    # touches this table ~3 jobs per merge, so partition-count is pure
    # per-iteration overhead once partitions are small. ~50k words per
    # partition keeps tasks meaningful; a 100M-word web-scale vocabulary
    # still fans out to thousands of tasks.
    n_words = base.count()
    parts = max(1, min(docs.sparkSession.sparkContext.defaultParallelism,
                       -(-n_words // 50_000)))
    vocab = base.coalesce(parts)
    # the checkpoint whose blocks back `vocab` — released when superseded
    # by the next iteration's checkpoint, and at loop exit (plain
    # unpersist() on a localCheckpointed frame is a silent no-op; see
    # dedup._release_local_checkpoint)
    from ibis_flink_example_spark.operators.dedup import (
        _release_local_checkpoint,
    )

    backing_ckpt = base
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = (
            vocab.select(
                "count",
                F.posexplode(F.slice("syms", 1, F.size("syms") - 1)).alias(
                    "i", "left"
                ),
                F.col("syms"),
            )
            .select(
                "count",
                "left",
                F.element_at("syms", F.col("i") + 2).alias("right"),
            )
            .groupBy("left", "right")
            .agg(F.sum("count").alias("pair_count"))
        )
        top = pairs.orderBy(
            F.col("pair_count").desc(), F.col("left").asc(), F.col("right").asc()
        ).limit(1).collect()  # one-row control-plane collect (argmax)
        if not top:
            break
        l, r, c = top[0]["left"], top[0]["right"], top[0]["pair_count"]
        merges.append((rank, l, r, int(c)))
        vocab = _merge_pair_in_vocab(vocab, l, r).localCheckpoint(eager=True)
        _release_local_checkpoint(backing_ckpt)
        backing_ckpt = vocab
    # release the final iteration state too (nothing downstream reads it —
    # the result is the driver-side merge list)
    _release_local_checkpoint(backing_ckpt)
    return merges


def bpe_merges_df(
    docs: DataFrame, text_col: str = "text", n_merges: int = 8
) -> DataFrame:
    """The learned merge table as a DataFrame (merge_rank, left, right,
    pair_count) — the deliverable a tokenizer build consumes."""
    spark = docs.sparkSession
    merges = bpe_learn_merges(docs, text_col, n_merges)
    schema = (
        "merge_rank int, left string, right string, pair_count bigint"
    )
    return spark.createDataFrame(merges or [], schema)


def bpe_encode_token_counts(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply learned merge rules to the corpus and count the resulting
    BPE tokens per document — the encode side of tokenizer training.

    The merge table rides into the Arrow-batched closure (tiny — ship by
    value, the moral equivalent of a broadcast variable); per-word results
    are memoized per batch, so cost scales with DISTINCT words per batch,
    not total words. Standard encode: repeatedly merge the lowest-rank
    adjacent pair until none applies.
    """
    ranks = {(l, r): rank for rank, l, r, _ in merges}

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}

        def n_tokens(word: str) -> int:
            got = memo.get(word)
            if got is not None:
                return got
            syms = list(word)
            while len(syms) > 1:
                best, best_i = None, -1
                for i in range(len(syms) - 1):
                    rk = ranks.get((syms[i], syms[i + 1]))
                    if rk is not None and (best is None or rk < best):
                        best, best_i = rk, i
                if best is None:
                    break
                syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            memo[word] = len(syms)
            return len(syms)

        for pdf in batches:
            counts = [
                sum(n_tokens(w) for w in (t.split() if t else []))
                for t in pdf[text_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "n_tokens_bpe": counts})

    schema = T.StructType(
        [
            T.StructField(id_col, docs.schema[id_col].dataType),
            T.StructField("n_tokens_bpe", T.LongType()),
        ]
    )
    return docs.select(id_col, text_col).mapInPandas(encode, schema=schema)

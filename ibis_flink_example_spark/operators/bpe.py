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

from ibis_flink_example_spark.operators.dedup import WS_SPLIT

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
            F.explode(F.split(F.trim(F.col(text_col)), WS_SPLIT)).alias("word")
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


# ---------------------------------------------------------------------------
# Fixed demo tokenizer (r11): a PINNED merge table applied in closed form
# ---------------------------------------------------------------------------

# A tokenizer is normally a FROZEN artifact applied to new corpora, so a
# fertility QA (tokens/word, bytes/token per language) evaluates a fixed
# merge table — unlike bpe_learn_merges' data-dependent iteration, this is
# SQL-expressible and therefore fully oracle-able. The table is a chain of
# common-English merges; each component is a single char or an EARLIER
# merge's output (the well-formedness every real BPE table has, because
# learning emits ranks in order).
# Java's \s spelled out — the shared cross-engine class (see text.py).
from ibis_flink_example_spark.operators.text import WS_CLASS as _WS_CLASS

FIXED_DEMO_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("e", "r"),
    ("a", "n"),
    ("o", "n"),
    ("r", "e"),
    ("s", "t"),
)


def _fixed_merge_patterns() -> list[tuple[str, str]]:
    """(flat_pattern, placeholder) per rank. BPE's lowest-rank-first loop
    is equivalent to exhausting ranks in order (a rank-j merge creates
    pairs only AROUND its new symbol, and no symbol here is a component
    of an earlier rank), and exhausting one rank equals one left-to-right
    non-overlapping string replace when earlier outputs are encoded as
    single placeholder chars (chr(1)..chr(n) — can't be matched into by
    later patterns). Equality against the real symbol-rewriting encoder
    is pinned corpus-wide in tests/test_llm_operators.py."""
    sym_to_ph: dict[str, str] = {}
    pats: list[tuple[str, str]] = []
    for rank, (left, right) in enumerate(FIXED_DEMO_MERGES):
        for comp in (left, right):
            if len(comp) > 1 and comp not in sym_to_ph:
                raise ValueError(
                    f"FIXED_DEMO_MERGES rank {rank}: component {comp!r} is "
                    "neither a single char nor an earlier merge's output"
                )
        pat = sym_to_ph.get(left, left) + sym_to_ph.get(right, right)
        sym_to_ph[left + right] = chr(rank + 1)
        pats.append((pat, chr(rank + 1)))
    return pats


def fixed_merge_token_count(text_col) -> "F.Column":
    """Per-row BPE token count of ``text_col`` under FIXED_DEMO_MERGES as
    a pure JVM column: chain the rank-ordered replaces, then count = final
    length minus the whitespace chars (whitespace survives every replace
    1:1, and no pattern spans it, so words encode independently — the
    Σ-over-words definition without splitting). Texts containing the
    placeholder code points chr(1)..chr(8) would alias merged symbols;
    that is raised lazily (loud, per-row) rather than silently folded."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    guarded = F.when(
        c.rlike("[\\x01-\\x08]"),
        F.raise_error(
            F.lit(
                "fixed_merge_token_count: text contains placeholder code "
                "points U+0001..U+0008"
            )
        ),
    ).otherwise(c)
    rep = guarded
    for pat, ph in _fixed_merge_patterns():
        rep = F.replace(rep, F.lit(pat), F.lit(ph))
    # EXPLICIT whitespace class, not \s: Java \s includes U+000B while
    # RE2 (DuckDB) \s does not, so the shorthand silently diverges
    # engine-vs-oracle on vertical-tab payloads (review r11). The class
    # below is Java's \s spelled out and is used VERBATIM by the SQL
    # mirror; Python str.split (the reference encoder) also treats every
    # member as a separator.
    n_ws = F.length(c) - F.length(F.regexp_replace(c, _WS_CLASS, ""))
    return (F.length(rep) - n_ws).cast("long")


def fixed_merge_token_count_sql(expr: str) -> str:
    """The DuckDB mirror of fixed_merge_token_count as a generated SQL
    expression over ``expr`` (placeholders via chr(n), pattern chars as
    quoted literals concatenated with chr() pieces)."""

    def lit(pat: str) -> str:
        parts = []
        for ch in pat:
            if ord(ch) < 9:
                parts.append(f"chr({ord(ch)})")
            else:
                parts.append("'" + ch.replace("'", "''") + "'")
        return " || ".join(parts)

    rep = expr
    for pat, ph in _fixed_merge_patterns():
        rep = f"replace({rep}, {lit(pat)}, chr({ord(ph)}))"
    return (
        f"length({rep}) - (length({expr}) - "
        f"length(regexp_replace({expr}, '{_WS_CLASS}', '', 'g')))"
    )

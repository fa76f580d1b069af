#!/usr/bin/env python
"""From curated corpus to training feed — runnable as-is.

The curation demo (curation_pipeline_demo.py) ends with a clean corpus;
this demo covers the LAST mile a pretraining run needs, each stage a
registered operator with its own DuckDB-verified query twin:

  curated documents
    -> mixture schedule        (operators/sampling.py:mixture_schedule)
       every vt-prefix of the feed is proportionally mixed across
       sources — no domain floods or starves the consumer
    -> epoch shuffle plan      (operators/sampling.py:epoch_shuffle_plan)
       per epoch: rendezvous shard + frozen md5 permutation — byte-
       identical training order across re-runs and retries
    -> sequence packing        (operators/sampling.py:pack_sequences)
       2048-token context windows, deterministic pack membership
    -> image near-dup clusters (queries_llm.py:image_neardup_clusters)
       the multimodal arm: blockhash signatures -> Hamming-LSH pairs ->
       connected components, keep the min-id representative

Everything is a pure function of the keys: re-running this script
reproduces the identical feed, shard files, and pack assignments — the
property that makes a 100 TB training run resumable and auditable.

Run:  python examples/training_feed_demo.py
Env:  SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ibis_flink_example_spark.catalog import load_table  # noqa: E402
from ibis_flink_example_spark.operators.dedup import (  # noqa: E402
    connected_components,
)
from ibis_flink_example_spark.operators.multimodal import (  # noqa: E402
    documents_as_media,
    phash_neardup_pairs,
)
from ibis_flink_example_spark.operators.sampling import (  # noqa: E402
    epoch_shuffle_plan,
    mixture_schedule,
    pack_sequences,
)
from ibis_flink_example_spark.operators.text import (  # noqa: E402
    token_count_whitespace,
)
from ibis_flink_example_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name="training-feed-demo", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("WARN")
    docs = load_table(spark, sf_dir, "documents")

    # 1. mixture schedule: one interleaved feed order across sources
    feed = mixture_schedule(docs, id_col="doc_id", source_col="source")
    head = feed.orderBy("vt_scaled", "source", "doc_id").limit(8).collect()
    print("\n== mixture feed head (proportionally interleaved) ==")
    for r in head:
        print(f"  vt={r['vt_scaled']:>14d}  {r['source']:<12} doc {r['doc_id']}")

    # 2. epoch shuffle: per-epoch shard + order assignment
    plan = epoch_shuffle_plan(docs, id_col="doc_id", n_epochs=2, n_shards=4)
    loads = (
        plan.groupBy("epoch", "shard")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("epoch", "shard")
        .collect()
    )
    print("\n== epoch x shard loads (rendezvous-balanced) ==")
    for r in loads:
        print(f"  epoch {r['epoch']} shard {r['shard']}: {r['n_docs']} docs")

    # 3. pack into 2048-token context windows
    sized = docs.select(
        "doc_id", token_count_whitespace("text").alias("n_tokens")
    )
    packed = pack_sequences(
        sized, key_col="doc_id", token_col="n_tokens", context_tokens=2048
    )
    stats = packed.agg(
        F.countDistinct("pack_id").alias("n_packs"),
        F.count(F.lit(1)).alias("n_docs"),
    ).first()
    print(
        f"\n== packing == {stats['n_docs']} docs -> {stats['n_packs']} packs "
        "of 2048 tokens"
    )

    # 4. multimodal arm: image near-dup clusters over the media payloads
    media = documents_as_media(docs)
    pairs = phash_neardup_pairs(
        media, max_hamming=12, n_chunks=16, max_bucket_size=None
    )
    comp = connected_components(
        pairs, media.select("media_id"), id_col="media_id"
    )
    stats2 = comp.agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(
            (F.col("media_id") == F.col("component")).cast("long")
        ).alias("n_clusters"),
    ).first()
    n_media, n_clusters = stats2["n_media"], stats2["n_clusters"]
    print(
        f"\n== image near-dup == {n_media} media -> {n_clusters} clusters "
        f"({n_media - n_clusters} near-dups would be dropped)"
    )

    spark.stop()
    print("\ndone — every assignment above is a pure function of the keys;"
          "\nre-run the script and the feed is byte-identical.")


if __name__ == "__main__":
    main()

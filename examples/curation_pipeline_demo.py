#!/usr/bin/env python
"""End-to-end training-data curation on this engine — runnable as-is.

The reference (claypotai/ibis-flink-example) demonstrates one streaming
analytics query; this demo chains the engine's LLM-data-pipeline surface
the way a 100 TB curation stack would, each stage a registered operator
with its own DuckDB-verified query twin:

  raw documents
    -> quality filter          (operators/text.py:quality_features)
    -> exact dedup             (operators/dedup.py:exact_dedup)
    -> near-dup dedup          (operators/dedup.py:minhash_dedup)
    -> decontamination         (operators/text.py:decontaminate_ngram_overlap)
    -> calibration QA gate     (operators/evaluation.py:calibration_bins)
    -> DSIR domain weighting   (operators/retrieval.py:dsir_weight_bits)
    -> PPS review panel        (operators/sampling.py:pps_systematic_sample)
    -> rendezvous shard layout (operators/bucketing.py:rendezvous_shard_plan)

Run:  python examples/curation_pipeline_demo.py
Env:  SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ibis_flink_example_spark.catalog import load_table  # noqa: E402
from ibis_flink_example_spark.operators.bucketing import (  # noqa: E402
    rendezvous_shard_plan,
)
from ibis_flink_example_spark.operators.dedup import (  # noqa: E402
    exact_dedup,
    minhash_dedup,
)
from ibis_flink_example_spark.operators.evaluation import (  # noqa: E402
    calibration_bins,
    stopword_lang_score_x1e6,
)
from ibis_flink_example_spark.operators.retrieval import (  # noqa: E402
    dsir_weight_bits,
)
from ibis_flink_example_spark.operators.sampling import (  # noqa: E402
    pps_systematic_sample,
)
from ibis_flink_example_spark.operators.text import (  # noqa: E402
    LANG_MARKERS,
    decontaminate_ngram_overlap,
    quality_features,
)
from ibis_flink_example_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name="curation-pipeline-demo")
    spark.sparkContext.setLogLevel("WARN")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()
    print(f"[0 ingest      ] {n0} documents from {sf_dir}")

    # 1. heuristic quality filter (Gopher/C4-style): keep score >= 0.6
    scored = quality_features(docs, "text", "doc_id")
    keep_ids = scored.filter(F.col("quality_score") >= 0.6).select("doc_id")
    stage1 = docs.join(keep_ids, "doc_id", "left_semi")
    n1 = stage1.count()
    print(f"[1 quality     ] kept {n1}/{n0} (score >= 0.6)")

    # 2. exact dedup (min-id survivor per normalized content digest)
    stage2 = exact_dedup(stage1, text_col="text", id_col="doc_id")
    n2 = stage2.count()
    print(f"[2 exact dedup ] kept {n2}/{n1}")

    # 3. near-dup dedup: MinHash+LSH -> connected components -> representative
    nd = minhash_dedup(
        stage2, id_col="doc_id", text_col="text", threshold=0.8, shingle_n=3
    )
    stage3 = nd.filter(F.col("is_representative")).drop(
        "component", "is_representative"
    )
    n3 = stage3.count()
    print(f"[3 near dedup  ] kept {n3}/{n2} cluster representatives")

    # 4. decontamination: drop training docs sharing any 13-gram with the
    # held-out "eval" slice (every 97th doc stands in for a benchmark)
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)
    flags = decontaminate_ngram_overlap(
        stage3, eval_docs, id_col="doc_id", text_col="text", n=13
    )
    clean_ids = flags.filter(~F.col("contaminated")).select("doc_id")
    stage4 = stage3.join(clean_ids, "doc_id", "left_semi")
    n4 = stage4.count()
    print(f"[4 decontam    ] kept {n4}/{n3} (13-gram eval overlap dropped)")

    # 5. calibration QA gate: is the cheap lang score honest against gold?
    cal = calibration_bins(
        stage4.select(
            stopword_lang_score_x1e6("text", LANG_MARKERS["en"]).alias("s"),
            (F.col("lang") == "en").alias("y"),
        ),
        score_col="s",
        label_col="y",
        n_bins=10,
    )
    worst = cal.agg(F.max("gap_x1e6").alias("g")).first()["g"]
    print(f"[5 calibration ] worst |predicted-observed| bin gap = {worst/1e4:.1f}pp")

    # 6. DSIR-style domain weights toward the src0 target domain
    weights = dsir_weight_bits(stage4, target_source="src0")
    top = weights.orderBy(F.desc("weight_bits")).limit(3).collect()
    print(
        "[6 dsir weights] top target-domain docs: "
        + ", ".join(f"{r['doc_id']}({r['weight_bits']}b)" for r in top)
    )

    # 7. PPS review panel: 20 docs, selection probability ~ document size
    panel = pps_systematic_sample(
        stage4, id_col="doc_id", weight_col="n_chars", n=20
    )
    print(f"[7 review panel] {panel.count()} PPS-sampled docs for human QA")

    # 8. rendezvous shard layout for the curated output
    plan = rendezvous_shard_plan(
        stage4, id_col="doc_id", bytes_col="n_chars", n_shards=8
    ).orderBy("shard")
    rows = plan.collect()
    total_move = sum(r["n_moving_add_one"] for r in rows)
    print(
        f"[8 shard layout] {len(rows)} shards; adding a 9th moves only "
        f"{total_move}/{n4} docs (rendezvous minimal movement)"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

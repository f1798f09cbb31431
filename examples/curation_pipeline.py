"""Corpus-curation scorecard — the round-10 curation operators composed
into one pass over the documents table:

1. ``host_reputation_report`` — the site-level gate (mirror-farm
   duplicate involvement, token mass, language diversity);
2. ``dedup_keep_best`` — exact dedup keeping the highest-quality copy
   per fingerprint (not the smallest id);
3. ``markdown_structure_stats`` — code/tabular/prose routing labels;
4. ``unimax_allocation`` — the UniMax token-budget split across
   sources (saturated prefix + uniform floor shares);
5. ``bpe_coverage_report`` — tokenizer fertility / fallback per
   source with the corpus's own learned merges;
6. ``kcenter_coreset`` — diverse exemplar selection over the
   embedding table (the eval-set seeding rule).

Run:  python examples/curation_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from inception_spark.session import build_session
from inception_spark.functions.text_analysis import (
    host_reputation_report,
    markdown_structure_stats,
)
from inception_spark.operators.bpe import (
    bpe_coverage_report,
    learn_bpe_merges,
)
from inception_spark.operators.clustering import kcenter_coreset
from inception_spark.operators.dedup import dedup_keep_best
from inception_spark.operators.sampling import unimax_allocation


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = build_session(
        "curation_example", master="local[4]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    hosted = docs.withColumn(
        "host",
        F.concat(
            F.lit("h"),
            (F.col("doc_id") % 13).cast("string"),
            F.lit(".example.com"),
        ),
    )
    rep = host_reputation_report(hosted, dup_threshold=0.2)
    print(f"hosts flagged: {rep.filter('flagged').count()}")
    rep.orderBy(F.desc("dup_rate")).show(5)

    kept = dedup_keep_best(docs)
    print(f"survivors after keep-best dedup: {kept.count()}")

    md = markdown_structure_stats(
        docs.select(
            "doc_id",
            F.concat(
                F.lit("# T\n"), F.col("text"), F.lit("\n- item\n")
            ).alias("text"),
        )
    )
    print("routing classes:")
    md.groupBy("doc_class").count().show()

    total = docs.agg(
        F.sum(F.length("text")).cast("long").alias("t")
    ).collect()[0]["t"]
    print("UniMax allocation (char-count proxy):")
    unimax_allocation(
        docs,
        budget_tokens=total,
        max_epochs=2,
        token_count_col=F.length("text"),
    ).orderBy("capacity").show(5)

    merges = [
        (r["left"], r["right"])
        for r in learn_bpe_merges(docs, n_merges=5)
        .orderBy("merge_rank")
        .collect()
    ]
    print("tokenizer coverage per source (first 5):")
    bpe_coverage_report(docs, merges).orderBy("source").show(5)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    print("k-center exemplars (coverage-radius curve):")
    kcenter_coreset(emb, k=5).orderBy("sel_order").show()
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")

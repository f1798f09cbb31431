"""Release-gate pipeline — the round-11 decontamination/eval operators
composed into one pre-release pass over the documents table:

1. ``contamination_13gram`` — the published train/eval release rule
   (any shared verbatim 13-gram with an eval item flags the doc);
2. ``source_overlap_matrix`` — which sources mirror each other (the
   banded-MinHash candidate mass at the source×source grain);
3. ``rouge2_eval`` — multiset ROUGE-2 recall of each flagged doc
   against the eval item it collided with (how MUCH leaked);
4. ``events_js_drift``-style scoring of the post-filter corpus mix via
   ``rake_keywords`` (did dropping contaminated docs shift the
   corpus's keyphrase profile?);
5. ``doc_bigram_kn_logprob`` — KN-smoothed fluency of survivors vs
   dropped docs (contaminated docs are often the most fluent — the
   gate must not be doing quality filtering's job by accident).

Run:  python examples/decontamination_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from inception_spark.session import build_session
from inception_spark.functions.text_analysis import (
    doc_bigram_kn_logprob,
    rake_keywords,
    rouge2_eval,
)
from inception_spark.operators.dedup import (
    contamination_13gram,
    source_overlap_matrix,
)

STOPS = ["join", "hash", "row", "batch", "scan"]


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = build_session(
        "decontamination_example", master="local[4]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter("doc_id % 29 = 0")
    corpus = docs.filter("doc_id % 29 != 0")

    flagged = contamination_13gram(corpus, bench).cache()
    n_flagged = flagged.count()
    print(f"contaminated docs: {n_flagged}")
    flagged.orderBy(F.desc("contam_permille")).show(5)

    print("source mirror matrix (top overlaps):")
    source_overlap_matrix(docs).orderBy(F.desc("n_pairs")).show(5)

    # how much leaked: ROUGE-2 of each flagged doc against every eval
    # item (flagged set is small, so the cross pairing is bounded)
    pairs = (
        flagged.select("doc_id")
        .join(corpus, "doc_id")
        .select(
            F.col("doc_id").alias("cand_id"),
            F.col("text").alias("cand_text"),
        )
        .crossJoin(
            bench.select(
                F.col("doc_id").alias("ref_id"),
                F.col("text").alias("ref_text"),
            )
        )
    )
    print("leak magnitude (ROUGE-2 recall vs eval items, top 5):")
    rouge2_eval(pairs).orderBy(F.desc("rouge2_recall_milli")).show(5)

    clean = corpus.join(flagged.select("doc_id"), "doc_id", "left_anti")
    print("keyphrase profile of the CLEAN corpus (top 5):")
    rake_keywords(clean, STOPS, k=5).orderBy("rank").show(truncate=False)

    kn = doc_bigram_kn_logprob(corpus)
    verdicts = kn.join(
        flagged.select("doc_id", F.lit(True).alias("flagged")),
        "doc_id",
        "left",
    ).groupBy(F.coalesce("flagged", F.lit(False)).alias("flagged")).agg(
        F.round(F.avg("mean_logprob"), 4).alias("avg_kn_logprob"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    print("KN fluency, flagged vs clean (gate must not proxy quality):")
    verdicts.show()

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")

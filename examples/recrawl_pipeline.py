"""Recrawl maintenance example: snapshot diff → incremental rollup
(IVM) → delta-only chunking → boilerplate scrub → corpus profile.

The maintenance loop of a continuously-recrawled 100 TB corpus, all
Spark-first and all delta-sized — history is never re-read:

1. ``snapshot_diff``: classify every doc added / removed / changed /
   unchanged by content hash (one full-outer join on md5);
2. ``ivm_state``/``ivm_apply``: the per-source doc-count/char rollup is
   maintained from the diff ALONE — removed docs retract (mult -1),
   added/changed insert — and must equal recomputing over the new
   snapshot (asserted);
3. ``cdc_chunks`` on ONLY added+changed docs: content-defined chunk
   hashes — insertions don't shift later boundaries, so recrawl chunk
   dedup actually hits;
4. ``substring_dup_spans`` + ``scrub_dup_spans``: cut cross-doc
   verbatim boilerplate out of the fresh text (the ExactSubstr recipe);
5. ``profile_table``: the ANALYZE pass over the maintained corpus.

Run:  python examples/recrawl_pipeline.py
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from inception_spark.operators.dedup import (
    cdc_chunks,
    scrub_dup_spans,
    snapshot_diff,
    substring_dup_spans,
)
from inception_spark.operators.profile import profile_table
from inception_spark.plans.ivm import ivm_apply, ivm_state
from inception_spark.session import build_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = build_session("recrawl_pipeline", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    old = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    # the "new crawl": some docs gone, some revised, some new
    new = (
        old.filter(F.col("doc_id") % 11 != 0)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.col("text"), F.lit(" revised content")),
            ).otherwise(F.col("text")),
        )
        .unionByName(
            old.filter(F.col("doc_id") % 17 == 0).select(
                (F.col("doc_id") + 100000).alias("doc_id"),
                "source",
                F.col("text"),
            )
        )
    )

    # 1. classify the recrawl
    diff = snapshot_diff(old, new).cache()
    print("snapshot diff:")
    diff.groupBy("status").count().orderBy("status").show()

    # 2. maintain the per-source rollup from the DIFF alone
    state = ivm_state(
        old.withColumn("n_chars", F.length("text")),
        ["source"],
        "n_chars",
    )
    changed_ids = diff.filter("status IN ('changed', 'removed')").select(
        "doc_id"
    )
    added_ids = diff.filter("status IN ('changed', 'added')").select(
        "doc_id"
    )
    retracts = (
        old.join(changed_ids, "doc_id", "left_semi")
        .withColumn("n_chars", F.length("text"))
        .withColumn("mult", F.lit(-1))
    )
    inserts = (
        new.join(added_ids, "doc_id", "left_semi")
        .withColumn("n_chars", F.length("text"))
        .withColumn("mult", F.lit(1))
    )
    maintained = ivm_apply(
        state, retracts.unionByName(inserts), ["source"], "n_chars"
    )
    recomputed = new.withColumn("n_chars", F.length("text")).groupBy(
        "source"
    ).agg(
        F.sum(F.col("n_chars").cast("decimal(18,2)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    m = {r["source"]: (str(r["s"]), r["n"]) for r in maintained.collect()}
    r = {r["source"]: (str(r["s"]), r["n"]) for r in recomputed.collect()}
    assert m == r, "IVM fold diverged from recompute"
    print(f"rollup maintained incrementally for {len(m)} sources "
          "(== full recompute)")

    # 3. delta-only CDC chunking
    fresh = new.join(added_ids, "doc_id", "left_semi")
    chunks = cdc_chunks(fresh, mask=31)
    n_chunks = chunks.count()
    n_novel = chunks.select("chunk_hash").distinct().count()
    print(f"delta docs: {fresh.count()}, CDC chunks: {n_chunks}, "
          f"distinct hashes: {n_novel}")

    # 4. boilerplate scrub on the fresh text
    spans = substring_dup_spans(fresh, ngram=8)
    scrubbed = scrub_dup_spans(fresh, spans)
    removed = scrubbed.agg(F.sum("n_removed")).first()[0]
    print(f"ExactSubstr scrub removed {removed} words "
          f"across {spans.select('doc_id').distinct().count()} docs")

    # 5. profile the maintained corpus
    print("corpus profile:")
    profile_table(
        new,
        numeric_cols=["doc_id"],
        string_cols=["source", "text"],
    ).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()

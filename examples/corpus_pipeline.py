"""End-to-end training-corpus preparation — the workflow this engine is
for, composed from the shipped operators:

    raw documents
      → merge recrawl snapshots              (dedup.latest_version_dedup)
      → PII redaction                        (pii.pii_stats)
      → quality/length/exact-dup gate        (dedup.corpus_filter)
      → cross-doc boilerplate paragraphs     (dedup.paragraph_dedup)
      → near-dup edges                       (dedup.lsh_candidate_pairs)
      → duplicate groups                     (dedup.connected_components)
      → keep one doc per group               (dedup.keep_component_heads)
      → screen tomorrow's crawl              (dedup.bloom_screen)
      → corpus language/quality stats        (text_analysis, sketches)
      → fixed-token training sequences       (packing.pack_sequences)

Run:  python examples/corpus_pipeline.py [sf_dir]
(defaults to /root/testdata/sf0.001; everything is deterministic).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from inception_spark.functions.sketches import hll_ndv  # noqa: E402
from inception_spark.functions.text_analysis import (  # noqa: E402
    doc_unigram_logprob,
)
from inception_spark.functions.pii import pii_stats  # noqa: E402
from inception_spark.functions.text_analysis import (  # noqa: E402
    corpus_report,
)
from inception_spark.operators.dedup import (  # noqa: E402
    bloom_screen,
    connected_components,
    corpus_filter,
    keep_component_heads,
    lsh_candidate_pairs,
    paragraph_dedup,
)
from inception_spark.operators.packing import pack_sequences  # noqa: E402
from inception_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session(
        "corpus-pipeline", master="local[4]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # -1. schema contract: assert ingest invariants BEFORE any compute —
    # all rules ride one conditional aggregate (one scan)
    from inception_spark.operators.expectations import check_expectations

    dq = check_expectations(
        raw,
        [
            ("doc_id_not_null", "not_null", "doc_id"),
            ("doc_id_unique", "unique", "doc_id"),
            ("text_not_null", "not_null", "text"),
            ("lang_known", "in_set", "lang", ("en", "de", "fr", "es", "zh")),
        ],
    )
    print("data-quality expectations:")
    dq.show(truncate=False)
    failed = [r["rule"] for r in dq.collect() if not r["passed"]]
    if failed:
        raise SystemExit(f"ingest contract violated: {failed}")

    # 0a. merge snapshots: replay the newest crawl over the corpus —
    # here both snapshots are the fixture itself, so latest-wins is a
    # no-op that still exercises the merge path
    from inception_spark.operators.dedup import latest_version_dedup

    snap = raw.withColumn("version", F.lit(1))
    docs = latest_version_dedup(snap).drop("version")
    n0 = docs.count()

    # 0b. PII scrub: redact before anything else touches the text
    scrubbed = pii_stats(docs)
    n_pii = scrubbed.filter(F.col("has_pii")).count()
    print(f"PII: {n_pii} documents redacted")
    docs = docs.join(
        scrubbed.select("doc_id", "redacted"), "doc_id"
    ).select("doc_id", F.col("redacted").alias("text"), "lang", "source",
             "n_chars")

    # 0c. cross-document boilerplate: keep first owner of each repeated
    # paragraph (word-salad fixture has no newlines — split on articles)
    para = paragraph_dedup(docs, boundary=" the ", sep=" the ")
    n_scrubbed = para.filter(F.col("n_kept") < F.col("n_segments")).count()
    print(f"boilerplate: {n_scrubbed} documents lost repeated paragraphs")

    # 1. gate: exact dups, too-short, low-quality — with audit reasons
    gate = corpus_filter(docs)
    survivors = docs.join(
        gate.filter(F.col("reason").isNull()).select("doc_id"), "doc_id"
    )
    rejected = gate.filter(F.col("reason").isNotNull())
    print("gate rejections by reason:")
    rejected.groupBy("reason").count().show()

    # 2-4. near-dup edges → components → one keeper per group
    edges = lsh_candidate_pairs(survivors)
    comps = connected_components(survivors.select("doc_id"), edges)
    kept = keep_component_heads(survivors, comps)
    n_kept = kept.count()
    print(f"{n0} docs → {n_kept} after exact+near dedup")

    # 5. corpus stats: distinct-fingerprint NDV sketch + LM quality tails
    hll_ndv(kept, "doc_id").show()
    lp = doc_unigram_logprob(kept)
    print("lowest-quality tail by corpus-LM logprob:")
    lp.orderBy("mean_logprob").limit(5).show()

    # 5b. per-source curation dashboard
    corpus_report(kept).orderBy("source").show(5)

    # 5c. incremental path for tomorrow: screen a new crawl against the
    # kept corpus without joining against it (Bloom, no false negatives)
    tomorrow = docs.limit(50).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text"
    )
    screen = bloom_screen(kept, tomorrow, m=1 << 16, k=4)
    screen.groupBy("maybe_dup", "is_dup_exact").count().show()

    # 6. pack into fixed-token training sequences, per language
    packed = pack_sequences(kept, budget=2048)
    packed.groupBy("part").agg(
        F.countDistinct("seq_id").alias("n_sequences"),
        F.sum("n_tokens").alias("n_tokens"),
        F.max("oversize").alias("any_oversize"),
    ).show()

    spark.stop()


if __name__ == "__main__":
    main()

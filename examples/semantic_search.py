"""End-to-end example: the reference's production flow on Spark.

Load documents → validate/quarantine → chunk → embed → semantic search,
plus a dedup sweep — everything a user of the reference service does,
as one Spark job.

Run:  python examples/semantic_search.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inception_spark import EmbeddingEngine
from inception_spark.operators import dedup
from inception_spark.session import build_session


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = build_session("semantic_search_example", master="local[4]",
                          shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    engine = EmbeddingEngine(spark)

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("doc_id AS id", "text")
    )
    good, quarantined = engine.validate_documents(docs)
    print(f"documents: {good.count()} valid, {quarantined.count()} quarantined")

    table = engine.embed_documents(good).cache()
    print(f"chunk-embedding table: {table.count()} rows")
    table.select("doc_id", "chunk_number", "n_tokens").show(3)

    hits = engine.search("fast hash join on a customer table", table, k=5)
    print("top-5 chunks for the query:")
    hits.show(truncate=False)

    dups = dedup.ngram_jaccard_pairs(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), threshold=0.3
    )
    print(f"near-duplicate candidate pairs (jaccard ≥ 0.3): {dups.count()}")

    # ANN over a precomputed embedding table: deterministic IVF-flat
    # (probe 2 of 8 hash-seeded cells instead of scanning everything)
    from inception_spark.operators.similarity import ivf_flat_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    print("IVF-flat top-5 neighbors of vec 0:")
    ivf_flat_topk(emb, qv, k=5).show()

    # hybrid retrieval: BM25 keywords + cosine vectors fused by RRF
    from pyspark.sql import functions as F

    from inception_spark.functions.text_analysis import bm25_topk
    from inception_spark.operators.similarity import cosine_topk, rrf_fuse

    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lex = bm25_topk(raw, ["spark", "join", "filter"], k=20).select(
        F.col("doc_id").alias("vec_id"), "rank"
    )
    vec = cosine_topk(emb, qv, k=20).select("vec_id", "rank")
    print("hybrid (BM25 + cosine, RRF-fused) top-5:")
    rrf_fuse([lex, vec], k=5).show()
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])

"""Write-once / query-many serving example: build the hybrid-search
index layouts ONCE, then answer queries with no corpus scan.

This is the shape a retrieval service over a 100 TB corpus actually
runs: the expensive passes (chunk, embed, corpus explode, bucket
assignment) happen at index-build time; each query then reads only its
terms' row groups from the inverted index and its LSH bucket's files
from the partitioned embedding table.

Run:  python examples/serving_pipeline.py [sf_dir]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inception_spark import EmbeddingEngine
from inception_spark.session import build_session


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = build_session("serving_example", master="local[4]",
                          shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    engine = EmbeddingEngine(spark)

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("doc_id AS id", "text")
        .limit(200)
    )

    # ---- index-build time (once) -------------------------------------
    chunks = engine.embed_documents(docs).localCheckpoint()
    idx = os.path.join(tempfile.mkdtemp(prefix="serve_"), "indexes")
    engine.write_search_indexes(chunks, idx, ann_bits=6)
    print(f"indexes written under {idx}")

    # ---- query time (many) -------------------------------------------
    for q in ("court appeal judgment", "supplier shipment delay"):
        hits = engine.hybrid_search(q, k=5, index_path=idx, ann_bits=6)
        print(f"\nquery: {q!r}")
        for r in hits.collect():
            print(f"  #{r['rank']}  doc {r['doc_id']} "
                  f"chunk {r['chunk_number']}  rrf={r['rrf_score']:.6f}")

    shutil.rmtree(os.path.dirname(idx), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])

"""Streaming surface demo: synthetic document stream → dedup → chunk →
embed → parquet, end to end, with the engine's own Python DataSource as
the unbounded source.

Run:  python examples/streaming_pipeline.py
(drains three micro-batches, prints the materialized chunk-embedding
counts, exits — everything deterministic).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from inception_spark.session import build_session  # noqa: E402
from inception_spark.sources.synthetic import (  # noqa: E402
    SyntheticDocsDataSource,
)
from inception_spark.streaming.pipeline import (  # noqa: E402
    embed_document_stream,
    streaming_exact_dedup,
)


def main() -> None:
    spark = build_session(
        "streaming-pipeline", master="local[4]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(SyntheticDocsDataSource)

    stream = (
        spark.readStream.format("synthetic_docs")
        .option("docs_per_batch", 100)
        .load()
        .select(
            F.col("doc_id").alias("id"),
            "text",
            F.current_timestamp().alias("event_time"),
        )
    )
    deduped = streaming_exact_dedup(stream, watermark="1 hour")
    embedded = embed_document_stream(deduped.drop("fingerprint"))

    out = tempfile.mkdtemp(prefix="stream_demo_out_")
    ck = tempfile.mkdtemp(prefix="stream_demo_ck_")
    q = (
        embedded.drop("event_time")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        p = q.lastProgress
        if p is not None and p["batchId"] >= 3:
            break
        time.sleep(1)
    q.stop()

    got = spark.read.parquet(out)
    print("chunk-embeddings written:", got.count())
    got.select("doc_id", "chunk_number", F.size("embedding").alias("dim")).show(5)
    spark.stop()


if __name__ == "__main__":
    main()

"""WebDataset ingestion example: tar shards → sample completeness gate
→ image features + caption text → near-dup filtering → packed corpus.

The multimodal training-data shape end to end, all Spark-first:

1. synthesize a few WebDataset tar shards (image + caption + class
   members per sample — in production these come from the crawler);
2. ``read_tar_members``: one task per shard, stdlib-tarfile stream
   parse, bounded Arrow batches;
3. ``tar_samples``: reject incomplete samples BEFORE any decode (the
   cheap relational gate);
4. route by extension — REAL BMP decode + feature extraction on the
   image leg, caption text on the text leg — and rejoin per sample;
5. caption-level exact dedup, then token-budget packing of the
   surviving captions.

Run:  python examples/webdataset_pipeline.py
"""

import io
import os
import sys
import tarfile
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from inception_spark.session import build_session
from inception_spark.operators.multimodal import (
    attach_media_meta,
    encode_bmp,
    extract_features,
)
from inception_spark.operators.dedup import exact_dedup
from inception_spark.sources.tar import read_tar_members, tar_samples


def write_demo_shards(d: str, n_shards: int = 3, per_shard: int = 20) -> None:
    rng = np.random.default_rng(11)
    captions = [
        "a photo of a cat on a table",
        "a photo of a dog in the park",
        "a diagram of a spark query plan",
    ]
    for s in range(n_shards):
        with tarfile.open(f"{d}/shard{s:03d}.tar", "w") as tf:
            for i in range(per_shard):
                key = f"{s * per_shard + i:08d}"
                img = rng.integers(0, 255, (16, 12, 3), dtype=np.uint8)
                cap = captions[i % len(captions)]  # deliberate dup captions
                members = [
                    (f"{key}.bmp", encode_bmp(img)),
                    (f"{key}.txt", cap.encode()),
                    (f"{key}.cls", str(i % 3).encode()),
                ]
                if i == per_shard - 1 and s == 0:
                    members = members[:1]  # one incomplete sample
                for name, payload in members:
                    info = tarfile.TarInfo(name)
                    info.size = len(payload)
                    tf.addfile(info, io.BytesIO(payload))


def main() -> None:
    spark = build_session(
        "webdataset_example", master="local[4]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="webdataset_demo_")
    write_demo_shards(d)

    members = read_tar_members(spark, d + "/*.tar")
    samples = tar_samples(members)
    complete = samples.filter(F.col("exts") == "bmp|cls|txt")
    print(
        f"samples: {samples.count()} total, {complete.count()} complete"
    )

    ok = members.join(
        complete.select("shard_file", "sample_key"),
        ["shard_file", "sample_key"],
        "left_semi",
    )
    # id = the numeric sample key: deterministic, join-safe.  (A
    # monotonically_increasing_id computed upstream of a self-join is
    # evaluated independently per branch — a task retry can pair
    # features with the wrong sample.)
    imgs = attach_media_meta(
        ok.filter(F.col("ext") == "bmp").select(
            "sample_key",
            F.col("sample_key").cast("long").alias("id"),
            "payload",
        ),
        modality="image",
        mime="image/bmp",
    )
    feats = extract_features(
        imgs.select("id", "payload", "media_meta"), dim=32, fake=False
    ).withColumn(
        "sample_key", F.lpad(F.col("id").cast("string"), 8, "0")
    )
    caps = ok.filter(F.col("ext") == "txt").select(
        "sample_key", F.col("payload").cast("string").alias("text")
    )
    joined = feats.join(caps, "sample_key")
    print(f"decoded multimodal samples: {joined.count()}")

    marked = exact_dedup(
        caps.withColumn(
            "doc_id", F.col("sample_key").cast("long")
        ).select("doc_id", "text")
    )
    kept = marked.filter(~F.col("is_duplicate"))
    print(
        f"caption dedup: {caps.count()} captions -> {kept.count()} kept"
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Multimodal corpus statistics, oracle-grade: synthesize REAL binary
payloads from a document table, probe their headers JVM-side, decode
them back, and fit the corpus' Zipf health curve.

    documents
      → per-doc BMP / WAV payloads      (synth_bmp_corpus / synth_wav_corpus
                                         — mapInPandas, binary never
                                         transits the driver)
      → JVM header probes               (probe_bmp_dims / probe_wav_meta —
                                         byte-safe per-byte hex reads; no
                                         Python on the probe path)
      → per-width / per-rate rollups    (media_meta_stats / wav_meta_stats)
      → real decode round-trip          (image_pixel_stats — decode_image
                                         under mapInPandas, pixel sums)
    documents → vocab term counts → rank/frequency OLS (vocab_zipf_fit)

Every one of these is a registry entry with a closed-form DuckDB oracle:
dims/duration by construction, file sizes by the BMP/WAV spec formulas,
pixel sums by the synthesis formula, the Zipf fit by the same integer
moment sums — so this pipeline is exactly what the correctness driver
replays.

Run:  python examples/media_stats_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inception_spark.functions.text_analysis import vocab_zipf_fit  # noqa: E402
from inception_spark.operators.multimodal import (  # noqa: E402
    image_pixel_stats,
    media_meta_stats,
    wav_meta_stats,
)
from inception_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session(
        "media-stats", master="local[4]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    print("image metadata rollup (JVM-probed widths/heights/bytes):")
    media_meta_stats(docs).orderBy("width").show()

    print("audio metadata rollup (JVM-probed rates/durations):")
    wav_meta_stats(docs).orderBy("sample_rate").show()

    print("decode round-trip pixel sums (decode_image under mapInPandas):")
    image_pixel_stats(docs).orderBy("width").show()

    print("corpus Zipf fit (slope ≈ -1000 milli on natural language):")
    vocab_zipf_fit(docs).show()

    spark.stop()


if __name__ == "__main__":
    main()

"""Multimodal near-dup sweep: every modality through ONE blocking
primitive.

    images (BMP/PNG/GIF/JPEG payloads)
      → 64-bit dHash            (multimodal.phash_images)
      → banded Hamming pairs    (multimodal.image_dup_pairs)
    audio (16-bit PCM WAV payloads)
      → 64-bit spectral print   (multimodal.fingerprint_audio)
      → banded Hamming pairs    (multimodal.audio_dup_pairs)

Both routes share ``hamming64_dup_pairs`` — the text-SimHash recipe
(4×16-bit band blocking, bucket caps, exact bit_count(xor) verify) —
so image, audio and text dedup all scale with the same story: the only
quadratic term lives inside band buckets.

Run:  python examples/multimodal_dedup.py
(payloads are generated in-process; everything is deterministic).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from inception_spark.operators.multimodal import (  # noqa: E402
    audio_dup_pairs,
    encode_bmp,
    encode_png,
    encode_wav,
    image_dup_pairs,
    phash_images,
)
from inception_spark.session import build_session  # noqa: E402


def _img(seed: int, h: int = 32, w: int = 32) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    base = (x * (seed % 7 + 1) + y * (seed % 5 + 2)) % 256
    return np.stack(
        [base, (base * 2) % 256, (base * 3) % 256], axis=-1
    ).astype(np.uint8)


def _tone(freqs, *, rate=16000, amp=0.5) -> bytes:
    t = np.arange(int(rate * 0.5)) / rate
    x = sum(np.sin(2 * np.pi * f * t) for f in freqs)
    return encode_wav(amp * x / max(1, len(freqs)), rate)


def main() -> None:
    spark = build_session(
        "multimodal-dedup", master="local[4]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")

    # images: the same pixels under two codecs + one distinct image
    images = spark.createDataFrame(
        [
            (0, bytearray(encode_bmp(_img(1)))),
            (1, bytearray(encode_png(_img(1)))),  # re-encoded duplicate
            (2, bytearray(encode_bmp(_img(4)))),
        ],
        "id long, payload binary",
    )
    print("image fingerprints:")
    phash_images(images).show()
    print("image near-dup pairs (hamming ≤ 3):")
    image_dup_pairs(images).show()

    # audio: a volume-renormalized re-encode + distinct content
    audio = spark.createDataFrame(
        [
            (0, bytearray(_tone([440, 1200]))),
            (1, bytearray(_tone([440, 1200], amp=0.2))),  # quieter dup
            (2, bytearray(_tone([3000]))),
        ],
        "id long, payload binary",
    )
    print("audio near-dup pairs (hamming ≤ 3):")
    audio_dup_pairs(audio).show()
    spark.stop()


if __name__ == "__main__":
    main()

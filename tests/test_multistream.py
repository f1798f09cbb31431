"""Multistream bz2/xz member walk (sources/bz2shard.py) — the
Wikipedia-dump container protocol, plus the tarfile pin that .tar.xz /
.tar.bz2 shards already ride tarfile's own streaming path."""

import bz2
import io
import lzma
import tarfile

import pytest

from inception_spark.sources.bz2shard import (
    MultistreamFormatError,
    iter_members,
    multistream_stats,
    synth_multistream_corpus,
)


MEMBERS = [b"first member text", b"second one", b"", b"fourth s s s"]


@pytest.mark.parametrize("codec", ["bz2", "xz"])
def test_iter_members_walks_all_streams(codec):
    comp = bz2.compress if codec == "bz2" else (
        lambda b: lzma.compress(b, format=lzma.FORMAT_XZ)
    )
    blob = b"".join(comp(m) for m in MEMBERS)
    assert list(iter_members(blob, codec)) == MEMBERS


@pytest.mark.parametrize("codec", ["bz2", "xz"])
def test_iter_members_truncated_final_member_raises(codec):
    comp = bz2.compress if codec == "bz2" else (
        lambda b: lzma.compress(b, format=lzma.FORMAT_XZ)
    )
    blob = comp(b"complete") + comp(b"gets truncated here")[:-5]
    with pytest.raises(MultistreamFormatError):
        list(iter_members(blob, codec))


@pytest.mark.parametrize("codec", ["bz2", "xz"])
def test_iter_members_trailing_garbage_raises(codec):
    comp = bz2.compress if codec == "bz2" else (
        lambda b: lzma.compress(b, format=lzma.FORMAT_XZ)
    )
    blob = comp(b"fine") + b"\x00garbage that is no stream"
    with pytest.raises(MultistreamFormatError):
        list(iter_members(blob, codec))


@pytest.mark.parametrize("codec", ["bz2", "xz"])
def test_multistream_stats_roundtrip(spark, codec):
    docs = spark.createDataFrame(
        [(i, f"sss document {i} body text") for i in range(10)],
        "doc_id long, text string",
    )
    rows = {r["shard"]: r for r in
            multistream_stats(docs, codec=codec).collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert sum(r["n_members"] for r in rows.values()) == 10
    total_s = sum(r["n_s"] for r in rows.values())
    assert total_s == sum(
        f"sss document {i} body text".count("s") for i in range(10)
    )


def test_synth_corpus_member_count_checked(spark):
    """The walk cross-checks the member count written at synthesis —
    a lost member fails loudly instead of under-counting."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
    )
    corpus = synth_multistream_corpus(docs, codec="bz2").collect()
    assert sum(r["n_members"] for r in corpus) == 8
    for r in corpus:
        assert len(list(iter_members(bytes(r["blob"]), "bz2"))) == r["n_members"]


@pytest.mark.parametrize("mode", ["xz", "bz2"])
def test_tar_xz_bz2_shards_ride_tarfile_stream_path(spark, tmp_path, mode):
    """tarfile's 'r|*' auto-detects xz and bz2, so .tar.xz/.tar.bz2
    shards already work through read_tar_members with streaming
    memory — pinned here so the multistream operator's scope note
    ('tar containers need no custom walk') stays true."""
    from inception_spark.sources.tar import read_tar_members

    shard = tmp_path / f"shard-000.tar.{mode}"
    with tarfile.open(shard, f"w:{mode}") as tf:
        for i, payload in enumerate([b"alpha text", b"beta text"]):
            info = tarfile.TarInfo(name=f"doc{i}.txt")
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    members = read_tar_members(spark, str(shard)).collect()
    assert sorted(bytes(m["payload"]) for m in members) == [
        b"alpha text", b"beta text",
    ]

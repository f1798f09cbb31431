"""ZIP-shard source unit pins (sources/zipshard.py)."""

import io
import zipfile

import pytest


def _make_shard(path, entries, method=zipfile.ZIP_DEFLATED):
    with zipfile.ZipFile(path, "w", method) as z:
        for name, payload in entries:
            z.writestr(name, payload)


def test_members_and_sample_grouping(spark, tmp_path):
    from inception_spark.sources.zipshard import (
        read_zip_members,
        zip_samples,
    )

    _make_shard(
        tmp_path / "s0.zip",
        [
            ("000001.txt", b"hello"),
            ("000001.json", b"{}"),
            ("000002.txt", b"world!"),
            ("dir/000003.seg.json", b"[1]"),
        ],
        method=zipfile.ZIP_STORED,
    )
    _make_shard(tmp_path / "s1.zip", [("000004.txt", b"zz" * 100)])
    m = read_zip_members(spark, str(tmp_path / "*.zip"))
    rows = {r["member_name"]: r for r in m.collect()}
    assert rows["000001.txt"]["size"] == 5
    assert rows["000001.txt"]["method"] == "stored"
    assert rows["000004.txt"]["method"] == "deflated"
    # deflate actually compressed the repetitive member
    assert rows["000004.txt"]["compressed_size"] < 200
    # webdataset key split: first dot of the basename
    assert rows["dir/000003.seg.json"]["sample_key"] == "dir/000003"
    assert rows["dir/000003.seg.json"]["ext"] == "seg.json"
    s = {r["sample_key"]: r for r in zip_samples(m).collect()}
    assert s["000001"]["n_members"] == 2
    assert s["000001"]["exts"] == ["json", "txt"]
    assert s["000001"]["total_bytes"] == 7


def test_extension_filter_and_truncation(spark, tmp_path):
    from inception_spark.sources.zipshard import read_zip_members

    _make_shard(
        tmp_path / "s.zip",
        [("a.txt", b"x" * 1000), ("a.bin", b"y" * 10)],
    )
    m = read_zip_members(
        spark, str(tmp_path / "s.zip"), extensions=["txt"],
        max_member_bytes=64,
    ).collect()
    assert len(m) == 1
    assert m[0]["ext"] == "txt"
    assert m[0]["size"] == 1000          # central-directory truth
    assert len(m[0]["payload"]) == 64    # payload truncated


def test_corrupt_shard_strict_vs_lenient(spark, tmp_path):
    from inception_spark.sources.zipshard import (
        ZipFormatError,
        read_zip_members,
    )

    (tmp_path / "bad.zip").write_bytes(b"NOT A ZIP FILE AT ALL")
    _make_shard(tmp_path / "good.zip", [("k.txt", b"ok")])
    with pytest.raises(Exception) as ei:
        read_zip_members(spark, str(tmp_path / "*.zip")).collect()
    assert "corrupt zip shard" in str(ei.value)
    ok = read_zip_members(
        spark, str(tmp_path / "*.zip"), strict=False
    ).collect()
    assert [r["member_name"] for r in ok] == ["k.txt"]


def test_scan_has_no_shuffle(spark, tmp_path):
    from inception_spark.sources.zipshard import read_zip_members

    _make_shard(tmp_path / "s.zip", [("a.txt", b"x")])
    m = read_zip_members(spark, str(tmp_path / "s.zip"))
    plan = m._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

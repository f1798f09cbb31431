"""WARC source: spec-conformant parsing, gzip member handling, Spark
reader semantics.  Fixtures are synthesized from the WARC/1.1 record
grammar (version line, CRLF headers, Content-Length payload, CRLF CRLF
terminator) — no external files."""

import gzip
import io

import pytest

from inception_spark.sources.warc import (
    WarcFormatError,
    parse_warc_records,
    read_warc,
)


def _record(warc_type, uri, payload: bytes, rid="<urn:uuid:1>"):
    head = (
        f"WARC/1.1\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: {rid}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _segment():
    return (
        _record("warcinfo", None, b"software: test\r\n")
        + _record("request", "http://a.example/", b"GET / HTTP/1.1\r\n")
        + _record(
            "response",
            "http://a.example/",
            b"HTTP/1.1 200 OK\r\n\r\n<html>alpha page</html>",
        )
        + _record(
            "response",
            "http://b.example/x",
            b"HTTP/1.1 200 OK\r\n\r\n<html>bravo page</html>",
        )
    )


def test_parse_plain_segment():
    recs = list(parse_warc_records(_segment()))
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "request", "response", "response",
    ]
    assert recs[2]["target_uri"] == "http://a.example/"
    assert recs[2]["payload"].endswith(b"alpha page</html>")
    assert recs[2]["content_length"] == len(recs[2]["payload"])
    # offsets are byte-accurate record starts
    assert recs[0]["record_offset"] == 0
    assert _segment()[recs[3]["record_offset"]:].startswith(b"WARC/1.1")


def test_parse_member_per_record_gzip():
    """The WARC .gz convention: each record its own gzip member,
    members concatenated."""
    seg = b"".join(
        gzip.compress(_record("response", f"http://{i}.example/", b"p" * i))
        for i in (1, 2, 3)
    )
    recs = list(parse_warc_records(seg))
    assert [r["content_length"] for r in recs] == [1, 2, 3]


def test_truncated_segment_strict_and_quarantine():
    seg = _segment()[:-30]  # cut into the last payload
    with pytest.raises(WarcFormatError, match="truncated"):
        list(parse_warc_records(seg))
    recs = list(parse_warc_records(seg, strict=False))
    assert len(recs) == 3  # valid prefix survives


def test_garbage_raises_strict():
    with pytest.raises(WarcFormatError, match="version line"):
        list(parse_warc_records(b"HTTP/1.1 200 OK\r\n\r\n"))


def test_read_warc_spark(spark, tmp_path):
    (tmp_path / "seg-00000.warc").write_bytes(_segment())
    (tmp_path / "seg-00001.warc.gz").write_bytes(
        gzip.compress(_record("response", "http://c.example/", b"charlie"))
    )
    df = read_warc(spark, str(tmp_path / "*.warc*"))
    rows = df.collect()
    assert len(rows) == 5
    assert {r["warc_file"].rsplit("/", 1)[-1] for r in rows} == {
        "seg-00000.warc", "seg-00001.warc.gz",
    }

    resp = read_warc(
        spark, str(tmp_path / "*.warc*"), record_types=["response"]
    )
    got = {r["target_uri"]: bytes(r["payload"]) for r in resp.collect()}
    assert set(got) == {
        "http://a.example/", "http://b.example/x", "http://c.example/",
    }
    assert got["http://c.example/"] == b"charlie"


def test_read_warc_payload_cap(spark, tmp_path):
    (tmp_path / "big.warc").write_bytes(
        _record("response", "http://big.example/", b"z" * 1000)
    )
    df = read_warc(spark, str(tmp_path / "big.warc"), max_payload_bytes=64)
    r = df.collect()[0]
    assert len(bytes(r["payload"])) == 64
    assert r["content_length"] == 1000  # declared length preserved


def test_warc_feeds_html_pipeline(spark, tmp_path):
    """End-to-end composition: WARC response → payload decode →
    html_to_text — the Common Crawl ingestion shape."""
    from pyspark.sql import functions as F

    from inception_spark.functions.cleaning import html_to_text_expr

    (tmp_path / "s.warc").write_bytes(_segment())
    df = read_warc(spark, str(tmp_path / "s.warc"),
                   record_types=["response"])
    # strip the HTTP envelope (headers end at the first CRLFCRLF)
    body = F.expr(
        "substring(cast(payload AS STRING),"
        " instr(cast(payload AS STRING), '\r\n\r\n') + 4)"
    )
    txt = df.select(
        "target_uri", html_to_text_expr(body).alias("text")
    ).collect()
    assert {r["text"].strip() for r in txt} == {"alpha page", "bravo page"}

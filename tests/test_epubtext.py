"""EPUB reader: OCF handshake, spine authority, typed errors, fuzz."""

import io
import random
import zipfile

import pytest

import inception_spark.sources.epubtext as E


def test_round_trip_chapter_counts():
    """Every (doc_id, line-count) class round-trips byte-exactly and
    produces the documented 1-3 chapter split."""
    for did in range(6):
        for n in (1, 2, 3, 5, 9):
            text = "\n".join(f"line {i} with é &<> text" for i in range(n))
            blob = E.encode_epub(did, text)
            assert E.epub_to_text(blob) == text
            z = zipfile.ZipFile(io.BytesIO(blob))
            chs = [x for x in z.namelist() if x.endswith(".xhtml")]
            assert len(chs) == min(3, 1 + (did + n) % 3, n)


def test_spine_order_is_authoritative():
    """Zip storage order and manifest listing are both REVERSED vs the
    spine; an extractor following either would emit chapters backwards
    — prove extraction follows the spine by checking a 3-chapter book
    whose chapters are distinguishable."""
    text = "AAA\nBBB\nCCC"
    # find a doc_id giving 3 chapters for 3 lines
    did = next(
        d for d in range(9) if min(3, 1 + (d + 3) % 3, 3) == 3
    )
    blob = E.encode_epub(did, text)
    z = zipfile.ZipFile(io.BytesIO(blob))
    stored = [x for x in z.namelist() if x.endswith(".xhtml")]
    assert stored == ["OEBPS/ch2.xhtml", "OEBPS/ch1.xhtml",
                      "OEBPS/ch0.xhtml"]
    assert E.epub_to_text(blob) == text  # spine wins


def test_ocf_handshake_typed_errors():
    blob = E.encode_epub(1, "a\nb")
    with pytest.raises(E.EpubFormatError, match="not a ZIP"):
        E.epub_to_text(b"PK\x00\x00garbage")

    # mimetype not first: rebuild with container.xml first
    z_in = zipfile.ZipFile(io.BytesIO(blob))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name in reversed(z_in.namelist()):
            z.writestr(name, z_in.read(name))
    with pytest.raises(E.EpubFormatError, match="first zip entry"):
        E.epub_to_text(buf.getvalue())

    # compressed mimetype
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype", E._MIMETYPE,
                   compress_type=zipfile.ZIP_DEFLATED)
        for name in z_in.namelist()[1:]:
            z.writestr(name, z_in.read(name))
    with pytest.raises(E.EpubFormatError, match="must be stored"):
        E.epub_to_text(buf.getvalue())

    # wrong mimetype body
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(zipfile.ZipInfo("mimetype"), b"text/plain",
                   compress_type=zipfile.ZIP_STORED)
        for name in z_in.namelist()[1:]:
            z.writestr(name, z_in.read(name))
    with pytest.raises(E.EpubFormatError, match="epub\\+zip"):
        E.epub_to_text(buf.getvalue())


def _rebuild_without(blob: bytes, drop: str) -> bytes:
    z_in = zipfile.ZipFile(io.BytesIO(blob))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name in z_in.namelist():
            if name == drop:
                continue
            if name == "mimetype":
                z.writestr(zipfile.ZipInfo("mimetype"),
                           z_in.read(name),
                           compress_type=zipfile.ZIP_STORED)
            else:
                z.writestr(name, z_in.read(name))
    return buf.getvalue()


def test_missing_parts_typed():
    blob = E.encode_epub(1, "a\nb\nc")
    with pytest.raises(E.EpubFormatError, match="container.xml"):
        E.epub_to_text(_rebuild_without(blob, "META-INF/container.xml"))
    with pytest.raises(E.EpubFormatError, match="missing package doc"):
        E.epub_to_text(_rebuild_without(blob, "OEBPS/content.opf"))
    # a spine chapter missing from the container
    z = zipfile.ZipFile(io.BytesIO(blob))
    chs = [x for x in z.namelist() if x.endswith(".xhtml")]
    with pytest.raises(E.EpubFormatError, match="missing from container"):
        E.epub_to_text(_rebuild_without(blob, chs[0]))


def test_mutation_fuzz_typed_or_decoded():
    """Typed error or clean decode — never BadZipFile/ParseError/
    KeyError leaking through."""
    blob = E.encode_epub(3, "some text\nacross lines\nfor the fuzzer")
    rng = random.Random(2026)
    caught = ok = 0
    for _ in range(200):
        kind = rng.randrange(3)
        if kind == 0:
            i = rng.randrange(len(blob))
            mut = (blob[:i]
                   + bytes([blob[i] ^ (1 << rng.randrange(8))])
                   + blob[i + 1:])
        elif kind == 1:
            mut = blob[: rng.randrange(1, len(blob))]
        else:
            i = rng.randrange(len(blob))
            mut = blob[:i] + bytes(
                rng.randrange(256) for _ in range(5)
            ) + blob[i:]
        try:
            E.epub_to_text(mut)
            ok += 1
        except E.EpubFormatError:
            caught += 1
    assert caught > 0

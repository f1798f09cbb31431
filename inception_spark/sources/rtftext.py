"""RTF text extraction — pure-Python, spec-transcribed (the public
Microsoft RTF 1.9.1 specification).

RTF is the legacy-document layer of scraped corpora (pre-2007 Word
exports, court filings, email attachments).  No RTF library exists in
this environment, and the format is pure text with a small grammar:
control words (``\\word`` with an optional signed numeric parameter and
one consumed trailing space), groups ``{...}``, destination groups that
must be SKIPPED entirely (``{\\fonttbl ...}``, ``{\\*\\unknown ...}``),
hex escapes ``\\'hh`` in the document codepage, and Unicode escapes
``\\uN`` whose following ``\\ucN``-many fallback characters must be
dropped.

The extractor is a single-pass state machine over those rules; the
writer emits the same subset (escaping specials, non-ASCII as ``\\uN``
with a ``?`` fallback under ``\\uc1``), so round trips are byte-exact —
including through the fallback-skip machinery, which real extractors
routinely get wrong.

Spark shape: identical to pdftext/docxtext — synthesis worker-side,
one mapInPandas extract pass, shard-key shuffle only.  Cost is linear
in file bytes (one Python pass, no inflate); per-task memory = one
file.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from inception_spark.sources import fanout


class RtfFormatError(ValueError):
    """Typed error for corrupt/non-RTF bytes."""


#: destination control words whose whole group is non-content
_DESTINATIONS = frozenset(
    {
        "fonttbl", "colortbl", "stylesheet", "info", "header", "footer",
        "headerl", "headerr", "headerf", "footerl", "footerr", "footerf",
        "footnote", "pict", "object", "field", "themedata", "listtable",
        "listoverridetable", "generator",
    }
)


def encode_rtf(text: str) -> bytes:
    """Minimal RTF 1.x document: ANSI codepage header, ``\\uc1``
    Unicode fallback convention, one ``\\par`` per newline."""
    out = [r"{\rtf1\ansi\ansicpg1252\uc1\deff0"]
    out.append(r"{\fonttbl{\f0\fswiss Helvetica;}}")
    out.append("\n")
    for k, line in enumerate(text.split("\n")):
        if k:
            out.append("\\par\n")
        for ch in line:
            cp = ord(ch)
            if ch in "\\{}":
                out.append("\\" + ch)
            elif 32 <= cp <= 126:
                out.append(ch)
            elif cp == 9:
                out.append("\\tab ")
            elif cp < 32:
                out.append("\\'%02x" % cp)
            elif cp <= 0xFFFF:
                # \uN is a SIGNED 16-bit decimal per spec
                n = cp - 0x10000 if cp > 0x7FFF else cp
                out.append("\\u%d?" % n)
            else:  # astral plane: UTF-16 surrogate pair, two \u escapes
                cp -= 0x10000
                hi, lo = 0xD800 + (cp >> 10), 0xDC00 + (cp & 0x3FF)
                out.append(
                    "\\u%d?\\u%d?" % (hi - 0x10000, lo - 0x10000)
                )
    out.append("}")
    return "".join(out).encode("ascii")


def rtf_to_text(blob: bytes) -> str:
    """Single-pass extraction: group stack tracks the per-group ``\\uc``
    skip count and destination state; ``\\par``/``\\line`` → newline,
    ``\\tab`` → tab, ``\\~`` → NBSP; ``\\'hh`` decodes cp1252; ``\\uN``
    emits the codepoint (reassembling surrogate pairs) and skips the
    group's fallback characters.  Unknown ``{\\*`` destinations skip."""
    if not blob.startswith(b"{\\rtf"):
        raise RtfFormatError("bad magic (not RTF)")
    text: list[str] = []
    i, n = 0, len(blob)
    # group state: (uc_skip, in_destination)
    stack: list[tuple[int, bool]] = []
    uc, dest = 1, False
    pending_skip = 0  # \uN fallback chars left to drop
    pending_high: int | None = None  # high surrogate awaiting its pair

    def emit(s: str) -> None:
        nonlocal pending_skip
        if dest:
            return
        if pending_skip:
            k = min(pending_skip, len(s))
            pending_skip -= k
            s = s[k:]
        if s:
            text.append(s)

    def emit_cp(cp: int) -> None:
        nonlocal pending_high
        if dest:
            return
        if 0xD800 <= cp <= 0xDBFF:
            pending_high = cp
            return
        if 0xDC00 <= cp <= 0xDFFF and pending_high is not None:
            cp = 0x10000 + ((pending_high - 0xD800) << 10) + (cp - 0xDC00)
            pending_high = None
        text.append(chr(cp))

    while i < n:
        c = blob[i : i + 1]
        if c == b"{":
            stack.append((uc, dest))
            i += 1
            # {\* — the "skip if unknown" destination marker
            if blob[i : i + 2] == b"\\*":
                dest = True
                i += 2
            continue
        if c == b"}":
            if not stack:
                raise RtfFormatError("unbalanced group braces")
            uc, dest = stack.pop()
            i += 1
            continue
        if c == b"\\":
            nxt = blob[i + 1 : i + 2]
            if nxt == b"'":
                if i + 4 > n:
                    raise RtfFormatError("truncated hex escape")
                try:
                    b = int(blob[i + 2 : i + 4], 16)
                except ValueError as exc:
                    raise RtfFormatError("bad hex escape") from exc
                emit(bytes([b]).decode("cp1252", errors="replace"))
                i += 4
                continue
            if nxt in (b"\\", b"{", b"}"):
                emit(nxt.decode("ascii"))
                i += 2
                continue
            if nxt == b"~":
                emit("\u00a0")
                i += 2
                continue
            if nxt in (b"\r", b"\n"):  # escaped EOL = \par
                emit("\n")
                i += 2
                continue
            # control word: letters, optional signed digits, one space
            j = i + 1
            while j < n and 97 <= blob[j] <= 122 or j < n and 65 <= blob[j] <= 90:
                j += 1
            word = blob[i + 1 : j].decode("ascii")
            if not word:
                i += 2  # lone symbol we don't model: drop it
                continue
            k = j
            if k < n and blob[k : k + 1] == b"-":
                k += 1
            while k < n and 48 <= blob[k] <= 57:
                k += 1
            param = (
                int(blob[j:k]) if k > j else None
            )
            if k < n and blob[k : k + 1] == b" ":
                k += 1  # the spec: one space terminates and is consumed
            i = k
            if word in ("par", "line"):
                emit("\n")
            elif word == "tab":
                emit("\t")
            elif word == "uc":
                uc = int(param or 0)
            elif word == "u":
                if param is None:
                    raise RtfFormatError("\\u without parameter")
                cp = param + 0x10000 if param < 0 else param
                if not dest:
                    emit_cp(cp)
                pending_skip = uc if not dest else 0
            elif word in _DESTINATIONS:
                dest = True
            continue
        # plain text run up to the next delimiter
        j = i
        while j < n and blob[j : j + 1] not in (b"{", b"}", b"\\"):
            j += 1
        run = blob[i:j].replace(b"\r", b"").replace(b"\n", b"")
        if run:
            emit(run.decode("cp1252", errors="replace"))
        i = j
    if stack:
        raise RtfFormatError("unclosed group at EOF")
    return "".join(text)


_CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def synth_rtf_corpus(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    src = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).where(F.col("text").isNotNull())

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids.to_numpy(),
                    "payload": [encode_rtf(str(t)) for t in pdf["text"]],
                }
            )

    return fanout(src).mapInPandas(gen, _CORPUS_SCHEMA)


_STATS_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType(), False),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("extracted_bytes", T.LongType(), False),
        T.StructField("n_e", T.LongType(), False),
        T.StructField("n_lines", T.LongType(), False),
    ]
)


def rtf_text_partials(corpus: DataFrame, *, n_shards: int = 4) -> DataFrame:
    """The pdftext partial contract over RTF payloads (shared oracle
    shape across all three document formats)."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            agg: dict[int, list[int]] = {}
            for i, p in zip(pdf["doc_id"], pdf["payload"]):
                txt = rtf_to_text(bytes(p))
                sh = int(i) % n_shards
                a = agg.setdefault(sh, [0, 0, 0, 0])
                raw = txt.encode("utf-8")
                a[0] += 1
                a[1] += len(raw)
                a[2] += raw.count(b"e")
                a[3] += txt.count("\n") + 1 if txt else 0
            if agg:
                yield pd.DataFrame(
                    [
                        {
                            "shard": sh,
                            "n_docs": v[0],
                            "extracted_bytes": v[1],
                            "n_e": v[2],
                            "n_lines": v[3],
                        }
                        for sh, v in agg.items()
                    ]
                )

    return corpus.mapInPandas(walk, _STATS_SCHEMA)


def rtf_text_from_partials(parts: DataFrame) -> DataFrame:
    return (
        parts.groupBy("shard")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("extracted_bytes").cast("long").alias("extracted_bytes"),
            F.sum("n_e").cast("long").alias("n_e"),
            F.sum("n_lines").cast("long").alias("n_lines"),
        )
        .orderBy("shard")
    )


def rtf_text_stats(docs: DataFrame) -> DataFrame:
    """REAL RTF extraction, oracle-checked — the third member of the
    document-format family (PDF, DOCX, RTF), all three sharing one
    closed-form oracle over ``documents.text``."""
    return rtf_text_from_partials(rtf_text_partials(synth_rtf_corpus(docs)))

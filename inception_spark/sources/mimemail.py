"""MIME email ingest — stdlib ``email`` over RFC 5322 messages.

Mailing-list archives and enterprise mail dumps (the Enron-corpus
class) are a standing pretraining source; their container is the MIME
message: folded headers, multipart/alternative trees, and
content-transfer encodings (quoted-printable, base64) that the raw
bytes hide the text behind.  CPython's stdlib ``email`` package parses
all of it, so like the DOCX path nothing is transcribed — the
operator's value is the correct EXTRACTION MODEL: pick the text/plain
leaf of the multipart tree (never the HTML sibling), decode the
transfer encoding + charset, and treat the final newline as the MIME
body terminator.

Newline contract (stated, not silent): MIME text bodies are
newline-terminated — ``set_content`` appends a final LF when missing —
so extraction strips exactly ONE trailing LF.  A source text that
itself ends in LF would be ambiguous under this framing, and a lone CR
would be rewritten by the stdlib's line-ending normalization; such
texts are FILTERED at synthesis (predicate mirrored in the oracle SQL)
so a corpus change degrades per-record instead of failing the job —
``encode_mime`` still raises the typed error if handed one directly.

Spark shape: the document-family discipline — synthesis worker-side
(every document becomes a multipart/alternative message with a
quoted-printable text/plain part on even ids and base64 on odd, plus
an HTML sibling that extraction must NOT pick), one mapInPandas parse
pass, shard-key shuffle only.  The scan fans out across every core
before the first Python crossing (``sources.fanout``): the
~5 ms/message stdlib walk over a consolidated single-file drop
otherwise runs at effective parallelism 1 (measured 19-30 s at sf0.1;
fanned out, 4-6 s).
"""

from __future__ import annotations

import re

from email import message_from_bytes, policy
from email.message import EmailMessage
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from inception_spark.sources import fanout


class MimeFormatError(ValueError):
    """Typed error for unextractable messages / ambiguous synth input."""


def _mime_safe(src: DataFrame) -> DataFrame:
    """Drop texts the MIME framing cannot round-trip (final-LF
    ambiguity, lone-CR normalization).  The oracle SQL mirrors this
    predicate (``mime_stats_sql``) so a corpus that grows such a
    document degrades by exclusion on BOTH sides, not a job failure."""
    return src.where(
        ~F.col("text").endswith("\n") & ~F.col("text").contains("\r")
    )


def encode_mime(doc_id: int, text: str) -> bytes:
    """multipart/alternative RFC 5322 message: headers, a text/plain
    part (quoted-printable on even ids, base64 on odd — both transfer
    decodes stay load-bearing), and an HTML alternative the extractor
    must skip."""
    if text.endswith("\n"):
        raise MimeFormatError(
            "text ending in LF is ambiguous under the MIME final-newline "
            "contract (see module docstring)"
        )
    m = EmailMessage()
    m["From"] = f"sender-{doc_id}@corpus.example"
    m["To"] = "archive@corpus.example"
    m["Subject"] = f"doc {doc_id}"
    m["Date"] = "Mon, 01 Jan 2024 00:00:00 +0000"
    m["Message-ID"] = f"<doc-{doc_id}@corpus.example>"
    cte = "quoted-printable" if doc_id % 2 == 0 else "base64"
    m.set_content(text, charset="utf-8", cte=cte)
    m.add_alternative(
        f"<html><body><p>DO NOT EXTRACT {doc_id}</p></body></html>",
        subtype="html",
    )
    return m.as_bytes()


def _decode_text_part(part) -> str:
    """CTE + charset decode of a compat32 text part (strict errors →
    typed)."""
    payload = part.get_payload(decode=True)
    if payload is None:
        raise MimeFormatError("undecodable body: no decodable payload")
    charset = part.get_content_charset() or "us-ascii"
    try:
        return payload.decode(charset)
    except (LookupError, UnicodeDecodeError) as exc:
        raise MimeFormatError(f"undecodable body: {exc}") from exc


def _unfold_subject(raw) -> str:
    """RFC 5322 header unfold (drop the line break before folding WSP)
    + RFC 2047 encoded-word decode when present — what policy.default
    does eagerly for EVERY header, done lazily for the one we read."""
    s = str(raw).replace("\r\n", "\n").replace("\r", "\n")
    s = re.sub(r"\n(?=[ \t])", "", s)
    if "=?" in s:
        from email.header import decode_header, make_header

        try:
            s = str(make_header(decode_header(s)))
        except (LookupError, UnicodeDecodeError, ValueError) as exc:
            raise MimeFormatError(f"undecodable subject: {exc}") from exc
    return s


def _is_attachment(part) -> bool:
    cd = part.get("content-disposition", "")
    return str(cd).strip().lower().startswith("attachment")


def mime_to_text(blob: bytes) -> tuple[str, str]:
    """→ (subject, body text): parse, walk the multipart tree for the
    text/plain leaf, decode CTE + charset, strip the ONE terminating
    LF.  A message with no text/plain leaf raises.

    Perf shape (measured, SCALING.md "stdlib-email floor"): parsing
    with ``policy.default`` costs ~2.3 ms/msg — almost all of it eager
    structured-header parsing, not body handling.  The compat32 parser
    is ~0.2 ms/msg for the same split, so the common shapes
    (single-part text/plain; FLAT multipart/alternative) take a
    compat32 fast path that mirrors ``get_body(("plain",))`` exactly
    (first non-attachment text/plain alternative wins — verified
    against the strict walk in tests), and anything nested or exotic
    falls back to the strict ``policy.default`` walk below."""
    msg = message_from_bytes(blob)  # compat32: no eager header objects
    if msg.defects:
        raise MimeFormatError(f"message defects: {msg.defects!r}")
    ctype = msg.get_content_type()
    body = None
    if ctype == "text/plain" and not msg.is_multipart():
        if not _is_attachment(msg):
            body = _decode_text_part(msg)
    elif ctype == "multipart/alternative" and msg.is_multipart():
        parts = msg.get_payload()
        if all(not p.is_multipart() for p in parts):
            for p in parts:
                if p.get_content_type() == "text/plain" and not (
                    _is_attachment(p)
                ):
                    body = _decode_text_part(p)
                    break
            else:
                raise MimeFormatError("no text/plain part in message")
    if body is None:
        # strict path: nested/mixed/exotic structure — policy.default's
        # full preference walk (attachment skipping, related/mixed
        # recursion) is authoritative here
        smsg = message_from_bytes(blob, policy=policy.default)
        if smsg.defects:
            raise MimeFormatError(f"message defects: {smsg.defects!r}")
        part = smsg.get_body(preferencelist=("plain",))
        if part is None:
            raise MimeFormatError("no text/plain part in message")
        try:
            body = part.get_content()
        except (KeyError, LookupError, UnicodeDecodeError) as exc:
            raise MimeFormatError(f"undecodable body: {exc}") from exc
    if not body.endswith("\n"):
        raise MimeFormatError("MIME text body missing final newline")
    return _unfold_subject(msg["Subject"] or ""), body[:-1]


_CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def synth_mime_corpus(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    src = _mime_safe(
        docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        ).where(F.col("text").isNotNull())
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids.to_numpy(),
                    "payload": [
                        encode_mime(int(i), str(t))
                        for i, t in zip(ids, pdf["text"])
                    ],
                }
            )

    return fanout(src).mapInPandas(gen, _CORPUS_SCHEMA)


_STATS_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType(), False),
        T.StructField("n_msgs", T.LongType(), False),
        T.StructField("body_bytes", T.LongType(), False),
        T.StructField("n_e", T.LongType(), False),
        T.StructField("subject_ids_sum", T.LongType(), False),
    ]
)


def mime_partials(
    corpus: DataFrame, *, n_shards: int = 4, fan: bool = False
) -> DataFrame:
    """Parse every message, extract subject + plain body, fold per-shard
    counters.  ``subject_ids_sum`` re-parses the doc id out of the
    SUBJECT header (folded-header decode is load-bearing); body
    counters prove the CTE + charset decode picked the right part —
    the HTML sibling would flip them.  ``fan=True`` re-spreads the
    input first — for callers whose corpus arrives single-split (the
    streaming twin's one-file micro-batches); the batch pipeline
    inherits the synth fan-out and skips the extra shuffle."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            agg: dict[int, list[int]] = {}
            for i, p in zip(pdf["doc_id"], pdf["payload"]):
                subject, body = mime_to_text(bytes(p))
                if not subject.startswith("doc "):
                    raise MimeFormatError(f"bad subject {subject!r}")
                sid = int(subject[4:])
                sh = int(i) % n_shards
                a = agg.setdefault(sh, [0, 0, 0, 0])
                raw = body.encode("utf-8")
                a[0] += 1
                a[1] += len(raw)
                a[2] += raw.count(b"e")
                a[3] += sid
            if agg:
                yield pd.DataFrame(
                    [
                        {
                            "shard": sh,
                            "n_msgs": v[0],
                            "body_bytes": v[1],
                            "n_e": v[2],
                            "subject_ids_sum": v[3],
                        }
                        for sh, v in agg.items()
                    ]
                )

    if fan:
        corpus = fanout(corpus)
    return corpus.mapInPandas(walk, _STATS_SCHEMA)


def mime_from_partials(parts: DataFrame) -> DataFrame:
    return (
        parts.groupBy("shard")
        .agg(
            F.sum("n_msgs").cast("long").alias("n_msgs"),
            F.sum("body_bytes").cast("long").alias("body_bytes"),
            F.sum("n_e").cast("long").alias("n_e"),
            F.sum("subject_ids_sum").cast("long").alias("subject_ids_sum"),
        )
        .orderBy("shard")
    )


def mime_text_stats(docs: DataFrame) -> DataFrame:
    """REAL MIME extraction, oracle-checked: every document wrapped as
    a multipart/alternative message (QP on even ids, base64 on odd,
    HTML decoy alongside), parsed back, aggregated.  The oracle reads
    body stats off ``documents.text`` and subject ids off doc_id."""
    return mime_from_partials(mime_partials(synth_mime_corpus(docs)))


def mime_stats_sql(*, n_shards: int = 4) -> str:
    """DuckDB twin.  The WHERE mirrors ``_mime_safe``: texts the MIME
    framing cannot round-trip (final LF, any CR) are excluded on both
    sides — today's corpora contain none, so the predicate is
    insurance, not selection."""
    return f"""
SELECT CAST(doc_id % {int(n_shards)} AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_msgs,
       CAST(SUM(strlen(text)) AS BIGINT) AS body_bytes,
       CAST(SUM(strlen(text) - strlen(replace(text, 'e', '')))
            AS BIGINT) AS n_e,
       CAST(SUM(doc_id) AS BIGINT) AS subject_ids_sum
FROM documents
WHERE text IS NOT NULL
  AND NOT ends_with(text, chr(10))
  AND strpos(text, chr(13)) = 0
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# mbox shards: the archive layer above single messages
# ---------------------------------------------------------------------------
#
# Mailing-list archives ship as mbox files — messages concatenated with
# "From " separator lines.  The format's one subtlety is QUOTING: a
# body line that itself starts with "From " must be escaped on write or
# the reader splits the message in half.  This implements the mboxrd
# convention (the only reversible one, used by qmail/Gmail takeout):
# writing prefixes '>' to every body line matching /^>*From /, reading
# strips ONE '>' from the same class — so ">From x" round-trips, which
# the original mboxo convention cannot do.


def encode_mbox(messages: list[bytes]) -> bytes:
    """Concatenate RFC 5322 messages into one mboxrd archive."""
    out = bytearray()
    for raw in messages:
        out += b"From archive@corpus.example Mon Jan  1 00:00:00 2024\n"
        for line in raw.split(b"\n"):
            stripped = line.lstrip(b">")
            if stripped.startswith(b"From "):
                out += b">"
            out += line
            out += b"\n"
        out += b"\n"  # blank line terminates the message
    return bytes(out)


def iter_mbox_messages(blob: bytes):
    """Yield raw message bytes from an mboxrd archive, reversing the
    quoting.  A non-'From '-starting archive raises the typed error."""
    if blob and not blob.startswith(b"From "):
        raise MimeFormatError("not an mbox archive (no From_ line)")
    msg: list[bytes] | None = None
    for line in blob.split(b"\n"):
        if line.startswith(b"From "):
            if msg is not None:
                yield b"\n".join(msg).rstrip(b"\n")
            msg = []
            continue
        if msg is not None:
            stripped = line.lstrip(b">")
            if stripped.startswith(b"From ") and line.startswith(b">"):
                line = line[1:]  # mboxrd: strip exactly one '>'
            msg.append(line)
    if msg is not None:
        yield b"\n".join(msg).rstrip(b"\n")


_MBOX_CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType(), False),
        T.StructField("n_msgs", T.LongType(), False),
        T.StructField("blob", T.BinaryType(), False),
    ]
)


def synth_mbox_corpus(
    docs: DataFrame,
    *,
    n_shards: int = 4,
    n_subshards: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """mboxrd archives of full MIME messages (one per document, in
    doc_id order), worker-side.  Each logical shard is built as
    ``n_subshards`` independent sub-archives (multiple rows sharing a
    ``shard`` key) so the expensive per-message MIME encode runs at
    shard×sub parallelism instead of ``n_shards`` tasks — the stats
    fold per shard, so sub-archive boundaries are invisible to the
    result.  The group exchange is pinned with an EXPLICIT-count
    repartition on the group keys: AQE's partition coalescing sees a
    ~10 MB shuffle and would otherwise fuse the build to ONE task
    (measured: the 2.1 ms/msg encode ran serially, 11 s at sf0.1;
    pinned, <2 s) — a user-numbered repartition it never coalesces."""
    if n_subshards is None:
        par = docs.sparkSession.sparkContext.defaultParallelism
        n_subshards = max(1, int(par))
    src = (
        _mime_safe(
            docs.select(
                F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
            ).where(F.col("text").isNotNull())
        )
        .withColumn(
            "shard", (F.col("doc_id") % F.lit(int(n_shards))).cast("long")
        )
        .withColumn(
            "subshard",
            F.expr(
                f"CAST((doc_id DIV {int(n_shards)}) "
                f"% {int(n_subshards)} AS BIGINT)"
            ),
        )
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        blob = encode_mbox(
            [
                encode_mime(int(i), str(t))
                for i, t in zip(pdf["doc_id"], pdf["text"])
            ]
        )
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "n_msgs": [len(pdf)],
                "blob": [blob],
            }
        )

    n_groups = int(n_shards) * int(n_subshards)
    return (
        src.repartition(n_groups, "shard", "subshard")
        .groupBy("shard", "subshard")
        .applyInPandas(build, _MBOX_CORPUS_SCHEMA)
    )


def mbox_partials(
    corpus: DataFrame, *, n_shards: int = 4, fan: bool = False
) -> DataFrame:
    """Split every archive back into messages (mboxrd unquoting), run
    the FULL MIME extraction on each, fold the mime_partials counters —
    the splitter and the message parser are both load-bearing.
    ``fan=True`` re-spreads single-split input (the streaming twin's
    one-file micro-batches) so each sub-archive parses in its own
    task."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sh, nm, blob in zip(
                pdf["shard"], pdf["n_msgs"], pdf["blob"]
            ):
                n, nbytes, n_e, sid = 0, 0, 0, 0
                for raw in iter_mbox_messages(bytes(blob)):
                    subject, body = mime_to_text(raw)
                    n += 1
                    sid += int(subject[4:])
                    b = body.encode("utf-8")
                    nbytes += len(b)
                    n_e += b.count(b"e")
                if n != int(nm):
                    raise MimeFormatError(
                        f"shard {sh}: split {n} messages, wrote {nm}"
                    )
                rows.append(
                    {
                        "shard": int(sh),
                        "n_msgs": n,
                        "body_bytes": nbytes,
                        "n_e": n_e,
                        "subject_ids_sum": sid,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    if fan:
        corpus = fanout(corpus)
    return corpus.mapInPandas(walk, _STATS_SCHEMA)


def mbox_text_stats(docs: DataFrame) -> DataFrame:
    """REAL mbox ingest, oracle-checked: per-shard mboxrd archives
    (built as sub-archives so the encode spreads across cores), split +
    parsed back, aggregated.  ``fan=True`` round-robins the sub-archive
    rows so each blob's MIME walk runs in its own task — the group-key
    hash otherwise bounds the parse at n-distinct-keys parallelism.
    Shares the single-message entry's closed-form oracle."""
    return mime_from_partials(
        mbox_partials(synth_mbox_corpus(docs), fan=True)
    )

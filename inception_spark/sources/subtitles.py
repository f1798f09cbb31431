"""Subtitle ingest (SRT / WebVTT) — the video-paired text layer.

Subtitle files are how speech text arrives in video-scale corpora
(caption dumps, lecture archives, the transcript side of audio-visual
pretraining pairs).  Both formats are line-oriented text with a tiny
grammar, parsed here from their public descriptions: SRT cues are
``index / HH:MM:SS,mmm --> HH:MM:SS,mmm / text lines / blank line``;
WebVTT (W3C spec) adds a ``WEBVTT`` header, uses ``.`` for the
millisecond separator, makes the cue index optional, and allows
``NOTE``/``STYLE`` blocks that must be skipped.

The parser normalizes both dialects into (start_ms, end_ms, text)
cues; extraction rejoins cue texts in order.  Timestamps are parsed to
integer milliseconds — the duration sum is part of the oracle, so an
off-by-one in the ``,``/``.`` split or a HH→ms arithmetic slip
hash-mismatches.

Spark shape: the pdftext/docxtext discipline — synthesis worker-side
(one cue per document line, deterministic 2 s spacing / 1.5 s
duration), one mapInPandas parse pass, shard-key shuffle only.
Subtitle files are small and per-video; at 100 TB parallelism is
per-file, the natural sharding.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from inception_spark.sources import fanout


class SubtitleFormatError(ValueError):
    """Typed error for malformed cue blocks/timestamps."""


_CUE_GAP_MS = 2000
_CUE_LEN_MS = 1500


def _fmt_ts(ms: int, *, vtt: bool) -> str:
    h, rem = divmod(ms, 3600_000)
    m, rem = divmod(rem, 60_000)
    s, frac = divmod(rem, 1000)
    sep = "." if vtt else ","
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{frac:03d}"


def _parse_ts(tok: str) -> int:
    tok = tok.strip()
    sep = "," if "," in tok else "."
    try:
        hms, frac = tok.rsplit(sep, 1)
        parts = hms.split(":")
        if len(parts) == 2:  # VTT allows MM:SS.mmm
            parts = ["0"] + parts
        h, m, s = (int(p) for p in parts)
        return ((h * 60 + m) * 60 + s) * 1000 + int(frac)
    except ValueError as exc:
        raise SubtitleFormatError(f"bad timestamp {tok!r}") from exc


def encode_srt(text: str, *, vtt: bool = False) -> bytes:
    """One cue per line of ``text``; cue k spans
    [2000k, 2000k + 1500) ms.  ``vtt=True`` emits the WebVTT dialect
    (header, dot separator, indexless cues)."""
    out: list[str] = []
    if vtt:
        out.append("WEBVTT\n\n")
    for k, line in enumerate(text.split("\n")):
        start, end = k * _CUE_GAP_MS, k * _CUE_GAP_MS + _CUE_LEN_MS
        if not vtt:
            out.append(f"{k + 1}\n")
        out.append(
            f"{_fmt_ts(start, vtt=vtt)} --> {_fmt_ts(end, vtt=vtt)}\n"
        )
        out.append(line + "\n\n")
    return "".join(out).encode("utf-8")


def parse_cues(blob: bytes) -> list[tuple[int, int, str]]:
    """→ [(start_ms, end_ms, text)] for either dialect.  Cue text may
    span multiple lines (joined with LF) and may be EMPTY (a timestamp
    line immediately followed by the blank terminator).  WebVTT
    NOTE/STYLE/REGION blocks are skipped; a cue block whose first
    non-index line lacks ``-->`` raises."""
    try:
        body = blob.decode("utf-8")
    except UnicodeDecodeError as exc:
        raise SubtitleFormatError(f"not UTF-8 text: {exc}") from exc
    lines = body.replace("\r\n", "\n").split("\n")
    i, n = 0, len(lines)
    cues: list[tuple[int, int, str]] = []
    if i < n and lines[i].startswith("WEBVTT"):
        i += 1
    while i < n:
        if not lines[i]:
            i += 1
            continue
        block: list[str] = []
        # terminate ONLY on truly empty lines, matching the writer: a
        # whitespace-only line is cue TEXT (ADVICE r12 — '.strip()'
        # termination silently dropped it and broke the round trip)
        while i < n and lines[i]:
            block.append(lines[i])
            i += 1
        head = block[0].strip()
        if head.startswith(("NOTE", "STYLE", "REGION")):
            continue  # non-cue block
        k = 0
        if "-->" not in block[0]:
            # optional numeric index line
            if not block[0].strip().isdigit() or len(block) < 2:
                raise SubtitleFormatError(
                    f"cue block starts with neither index nor "
                    f"timestamps: {block[0]!r}"
                )
            k = 1
        if "-->" not in block[k]:
            raise SubtitleFormatError(
                f"missing '-->' timestamp line: {block[k]!r}"
            )
        a, _, b = block[k].partition("-->")
        # VTT allows cue settings after the end timestamp
        end_tok = b.strip().split(" ")[0]
        cues.append(
            (_parse_ts(a), _parse_ts(end_tok), "\n".join(block[k + 1 :]))
        )
    return cues


def subtitles_to_text(blob: bytes) -> str:
    return "\n".join(c[2] for c in parse_cues(blob))


_CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def synth_subtitle_corpus(
    docs: DataFrame,
    *,
    vtt: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
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
                    "payload": [
                        encode_srt(str(t), vtt=vtt) for t in pdf["text"]
                    ],
                }
            )

    return fanout(src).mapInPandas(gen, _CORPUS_SCHEMA)


_STATS_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType(), False),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("n_cues", T.LongType(), False),
        T.StructField("extracted_bytes", T.LongType(), False),
        T.StructField("n_e", T.LongType(), False),
        T.StructField("speech_ms", T.LongType(), False),
    ]
)


def subtitle_partials(corpus: DataFrame, *, n_shards: int = 4) -> DataFrame:
    """Parse every file's cues and fold per-shard counters.
    ``speech_ms`` sums (end − start) from the PARSED timestamps — the
    arithmetic the oracle recomputes as 1500·n_cues."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            agg: dict[int, list[int]] = {}
            for i, p in zip(pdf["doc_id"], pdf["payload"]):
                cues = parse_cues(bytes(p))
                txt = "\n".join(c[2] for c in cues)
                sh = int(i) % n_shards
                a = agg.setdefault(sh, [0, 0, 0, 0, 0])
                raw = txt.encode("utf-8")
                a[0] += 1
                a[1] += len(cues)
                a[2] += len(raw)
                a[3] += raw.count(b"e")
                a[4] += sum(e - s for s, e, _ in cues)
            if agg:
                yield pd.DataFrame(
                    [
                        {
                            "shard": sh,
                            "n_docs": v[0],
                            "n_cues": v[1],
                            "extracted_bytes": v[2],
                            "n_e": v[3],
                            "speech_ms": v[4],
                        }
                        for sh, v in agg.items()
                    ]
                )

    return corpus.mapInPandas(walk, _STATS_SCHEMA)


def subtitle_from_partials(parts: DataFrame) -> DataFrame:
    return (
        parts.groupBy("shard")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_cues").cast("long").alias("n_cues"),
            F.sum("extracted_bytes").cast("long").alias("extracted_bytes"),
            F.sum("n_e").cast("long").alias("n_e"),
            F.sum("speech_ms").cast("long").alias("speech_ms"),
        )
        .orderBy("shard")
    )


def subtitle_text_stats(docs: DataFrame, *, vtt: bool = False) -> DataFrame:
    """REAL subtitle parse, oracle-checked: render every document as
    one cue per line (SRT or WebVTT dialect), parse the cues back, and
    aggregate — text AND timestamp arithmetic both load-bearing."""
    return subtitle_from_partials(
        subtitle_partials(synth_subtitle_corpus(docs, vtt=vtt))
    )


def subtitle_stats_sql(*, n_shards: int = 4) -> str:
    """DuckDB twin: one cue per newline-separated line, 1500 ms per
    cue."""
    return f"""
WITH d AS (
  SELECT doc_id, text,
         strlen(text) - strlen(replace(text, chr(10), '')) + 1 AS nl
  FROM documents WHERE text IS NOT NULL)
SELECT CAST(doc_id % {int(n_shards)} AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nl) AS BIGINT) AS n_cues,
       CAST(SUM(strlen(text)) AS BIGINT) AS extracted_bytes,
       CAST(SUM(strlen(text) - strlen(replace(text, 'e', '')))
            AS BIGINT) AS n_e,
       CAST(SUM(nl) * 1500 AS BIGINT) AS speech_ms
FROM d
GROUP BY 1
ORDER BY 1
"""

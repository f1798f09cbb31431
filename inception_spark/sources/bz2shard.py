"""Multistream bz2 / xz shard ingestion — the Wikipedia-dump family.

Wikipedia ships ``*-multistream.xml.bz2`` (concatenated independent
bz2 members so decoders can seek per member), historical Reddit/Pile
drops used plain ``.bz2``/``.xz``; both codecs live in the Python
stdlib (``bz2``, ``lzma``), so unlike the lz4/zstd/brotli family there
is no hand-rolled decoder here — the operator's value is the
MULTISTREAM WALK: splitting a concatenated blob into its member
streams via the decompressor's ``eof``/``unused_data`` protocol (the
only correct way — scanning for magic bytes false-positives inside
compressed data).

Spark shape (the lz4shard discipline):

* the corpus is synthesized WORKER-side: per-shard groups compress
  each document as an independent member and concatenate, one
  ``applyInPandas`` over the shard key (deterministic member order by
  doc_id);
* decode walks members sequentially inside one Arrow batch pass and
  folds per-shard counters; the only shuffle is the shard groupBy;
* the oracle replays the same stats off ``documents.text`` in SQL —
  a walk defect (lost member, wrong boundary) hash-mismatches.

At 100 TB: one shard blob per task — per-task memory is compressed +
one member's decoded output (members decode one at a time; the full
decoded shard is never materialized).  Size shards like parquet row
groups (the zipshard contract).  Real Wikipedia multistream dumps
carry an index file (member byte offsets); with one, members become
independently seekable and a shard can fan out to member-per-task —
the walk below is the indexless fallback that still streams.
"""

from __future__ import annotations

import bz2
import lzma
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class MultistreamFormatError(ValueError):
    """Typed error for corrupt/truncated member streams (the lenient
    shard readers catch exactly this)."""


_CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType(), False),
        T.StructField("n_members", T.LongType(), False),
        T.StructField("blob", T.BinaryType(), False),
    ]
)


def _compress_member(raw: bytes, codec: str) -> bytes:
    if codec == "bz2":
        return bz2.compress(raw, compresslevel=6)
    if codec == "xz":
        return lzma.compress(raw, format=lzma.FORMAT_XZ, preset=3)
    raise ValueError(f"unknown codec {codec!r}")


def _decompressor(codec: str):
    if codec == "bz2":
        return bz2.BZ2Decompressor()
    if codec == "xz":
        return lzma.LZMADecompressor(format=lzma.FORMAT_XZ)
    raise ValueError(f"unknown codec {codec!r}")


def iter_members(blob: bytes, codec: str) -> Iterator[bytes]:
    """Walk a multistream blob member by member via the stdlib
    decompressor protocol: each member decodes until ``eof``, the
    remainder continues at ``unused_data``.  Raises
    :class:`MultistreamFormatError` on a truncated final member or
    trailing garbage."""
    data = blob
    while data:
        dec = _decompressor(codec)
        try:
            out = dec.decompress(data)
        except (OSError, EOFError, lzma.LZMAError) as exc:
            raise MultistreamFormatError(
                f"corrupt {codec} member: {exc}"
            ) from exc
        if not dec.eof:
            raise MultistreamFormatError(
                f"truncated {codec} member (stream did not finish)"
            )
        yield out
        data = dec.unused_data


def synth_multistream_corpus(
    docs: DataFrame,
    *,
    codec: str = "bz2",
    n_shards: int = 4,
    n_subshards: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-shard multistream blob: every document's UTF-8 text becomes
    one independent member, members concatenated in doc_id order
    (shard = doc_id mod n_shards).  Worker-side synthesis — one
    applyInPandas per (shard, subshard) group, nothing on the driver.

    Each logical shard is built as ``n_subshards`` independent
    sub-blobs (multiple rows sharing a ``shard`` key — the
    synth_mbox_corpus discipline): the per-record Python encode runs
    at shard x sub parallelism instead of ``n_shards`` tasks, and the
    stats fold per shard so sub-blob boundaries are invisible to the
    result.  The group exchange is pinned with an EXPLICIT-count
    repartition on the group keys so AQE's coalescing cannot fuse the
    build back to a handful of tasks (guide §2.5)."""
    if n_subshards is None:
        par = docs.sparkSession.sparkContext.defaultParallelism
        n_subshards = max(1, (int(par) + n_shards - 1) // n_shards)
    src = (
        docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
        .where(F.col("text").isNotNull())
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
        blob = b"".join(
            _compress_member(str(t).encode("utf-8"), codec)
            for t in pdf["text"]
        )
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "n_members": [len(pdf)],
                "blob": [blob],
            }
        )

    n_groups = int(n_shards) * int(n_subshards)
    return (
        src.repartition(n_groups, "shard", "subshard")
        .groupBy("shard", "subshard")
        .applyInPandas(build, _CORPUS_SCHEMA)
    )


_STATS_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType(), False),
        T.StructField("n_members", T.LongType(), False),
        T.StructField("decoded_bytes", T.LongType(), False),
        T.StructField("n_s", T.LongType(), False),
    ]
)


def multistream_partials(corpus: DataFrame, *, codec: str) -> DataFrame:
    """Walk every blob's members and fold per-shard counters.  ``n_s``
    counts the letter 's' in the DECODED bytes — unproducible from the
    compressed blob without a correct walk.  Mergeable sums."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sh, nm, blob in zip(
                pdf["shard"], pdf["n_members"], pdf["blob"]
            ):
                n, nbytes, n_s = 0, 0, 0
                for member in iter_members(bytes(blob), codec):
                    n += 1
                    nbytes += len(member)
                    n_s += member.count(b"s")
                if n != int(nm):
                    raise MultistreamFormatError(
                        f"shard {sh}: walked {n} members, wrote {nm}"
                    )
                rows.append(
                    {
                        "shard": int(sh),
                        "n_members": n,
                        "decoded_bytes": nbytes,
                        "n_s": n_s,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return corpus.mapInPandas(walk, _STATS_SCHEMA)


def multistream_from_partials(parts: DataFrame) -> DataFrame:
    return (
        parts.groupBy("shard")
        .agg(
            F.sum("n_members").cast("long").alias("n_members"),
            F.sum("decoded_bytes").cast("long").alias("decoded_bytes"),
            F.sum("n_s").cast("long").alias("n_s"),
        )
        .orderBy("shard")
    )


def multistream_stats(docs: DataFrame, *, codec: str = "bz2") -> DataFrame:
    """REAL multistream decode, oracle-checked: compress every document
    as an independent member, concatenate per shard, walk the members
    back and aggregate (shard, n_members, decoded_bytes, n_s).  The
    oracle computes the same stats straight off ``documents.text``."""
    return multistream_from_partials(
        multistream_partials(
            synth_multistream_corpus(docs, codec=codec), codec=codec
        )
    )


def multistream_stats_sql(*, n_shards: int = 4) -> str:
    """DuckDB twin — strlen is BYTES (= decoded UTF-8 length), and
    0x73 's' never occurs inside a UTF-8 continuation byte."""
    return f"""
SELECT CAST(doc_id % {int(n_shards)} AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(strlen(text)) AS BIGINT) AS decoded_bytes,
       CAST(SUM(strlen(text) - strlen(replace(text, 's', '')))
            AS BIGINT) AS n_s
FROM documents
WHERE text IS NOT NULL
GROUP BY 1
ORDER BY 1
"""

"""SQLite shard ingest — document corpora distributed as ``.sqlite`` /
``.db`` files (a common drop format for scraped-site dumps, annotation
exports, and mobile-app corpora).

Spark has no SQLite DataSource and no JDBC driver is shipped here, but
CPython's stdlib ``sqlite3`` (3.11+) can hold a whole database IN
MEMORY via ``Connection.serialize()`` / ``deserialize()`` — so a shard
blob column decodes worker-side with zero temp files and zero
bindings, the same opaque-binary-container discipline as the tar/zip/
avro/tfrecord family.

Spark shape: synthesis is worker-side per shard key (one
``applyInPandas`` builds a real database file image per shard), decode
deserializes the image and runs ONE aggregate SQL statement inside the
worker — per-task memory is the database image (size shards like
parquet row groups; SQLite files don't split, the zipshard contract).
The only cluster shuffle is the shard groupBy.  At 100 TB the bulk
path is converting these shards to parquet ONCE with this reader, not
querying them in place.
"""

from __future__ import annotations

import sqlite3
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SqliteFormatError(ValueError):
    """Typed error for corrupt/undeserializable database images."""


_MAGIC = b"SQLite format 3\x00"

_CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("blob", T.BinaryType(), False),
    ]
)


def build_sqlite_image(rows: list[tuple[int, str]]) -> bytes:
    """Serialize (doc_id, text) rows into a real SQLite database
    image (header, b-tree pages, the works) — stdlib only."""
    con = sqlite3.connect(":memory:")
    try:
        con.execute(
            "CREATE TABLE docs (doc_id INTEGER PRIMARY KEY, text TEXT)"
        )
        con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
        con.commit()
        return con.serialize()
    finally:
        con.close()


def read_sqlite_image(blob: bytes, sql: str) -> list[tuple]:
    """Deserialize a database image and run one read-only statement.
    The magic check fronts the C-level deserialize so truncated or
    non-SQLite bytes raise the typed error, not a low-level one."""
    if blob[: len(_MAGIC)] != _MAGIC:
        raise SqliteFormatError("bad magic (not an SQLite database)")
    con = sqlite3.connect(":memory:")
    try:
        try:
            con.deserialize(blob)
            return list(con.execute(sql))
        except sqlite3.Error as exc:
            raise SqliteFormatError(f"corrupt database image: {exc}") from exc
    finally:
        con.close()


def synth_sqlite_corpus(
    docs: DataFrame,
    *,
    n_shards: int = 4,
    n_subshards: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-shard SQLite image over (doc_id, text) rows in doc_id order
    (shard = doc_id mod n_shards), worker-side.

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
        blob = build_sqlite_image(
            [(int(i), str(t)) for i, t in zip(pdf["doc_id"], pdf["text"])]
        )
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "n_rows": [len(pdf)],
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
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("sum_doc_id", T.LongType(), False),
        T.StructField("decoded_bytes", T.LongType(), False),
        T.StructField("n_o", T.LongType(), False),
    ]
)

#: one in-worker aggregate per shard image; octet_length(CAST AS BLOB)
#: counts UTF-8 BYTES (sqlite length() on TEXT counts chars), matching
#: DuckDB strlen.  The 'o' count rides a per-row byte scan in SQL.
_SHARD_SQL = """
SELECT COUNT(*),
       COALESCE(SUM(doc_id), 0),
       COALESCE(SUM(length(CAST(text AS BLOB))), 0),
       COALESCE(SUM(
         length(CAST(text AS BLOB))
         - length(CAST(replace(text, 'o', '') AS BLOB))
       ), 0)
FROM docs
"""


def sqlite_partials(corpus: DataFrame) -> DataFrame:
    """Deserialize every shard image and fold its stats with ONE
    in-worker SQL aggregate (SQLite does the scan at C speed; Python
    handles images, not rows).  ``sum_doc_id`` proves the b-tree
    walk, the byte/letter counts prove the TEXT payloads survived the
    serialize/deserialize round trip.  Mergeable sums."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sh, nr, blob in zip(
                pdf["shard"], pdf["n_rows"], pdf["blob"]
            ):
                ((n, sid, nbytes, n_o),) = read_sqlite_image(
                    bytes(blob), _SHARD_SQL
                )
                if n != int(nr):
                    raise SqliteFormatError(
                        f"shard {sh}: read {n} rows, wrote {nr}"
                    )
                rows.append(
                    {
                        "shard": int(sh),
                        "n_rows": int(n),
                        "sum_doc_id": int(sid),
                        "decoded_bytes": int(nbytes),
                        "n_o": int(n_o),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return corpus.mapInPandas(walk, _STATS_SCHEMA)


def sqlite_from_partials(parts: DataFrame) -> DataFrame:
    return (
        parts.groupBy("shard")
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("sum_doc_id").cast("long").alias("sum_doc_id"),
            F.sum("decoded_bytes").cast("long").alias("decoded_bytes"),
            F.sum("n_o").cast("long").alias("n_o"),
        )
        .orderBy("shard")
    )


def sqlite_ingest_stats(docs: DataFrame) -> DataFrame:
    """REAL SQLite decode, oracle-checked: write every document into
    per-shard database images, read them back through deserialize +
    one in-worker aggregate, and merge (shard, n_rows, sum_doc_id,
    decoded_bytes, n_o).  The oracle reads the same stats straight off
    ``documents``."""
    return sqlite_from_partials(sqlite_partials(synth_sqlite_corpus(docs)))


def sqlite_stats_sql(*, n_shards: int = 4) -> str:
    return f"""
SELECT CAST(doc_id % {int(n_shards)} AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(strlen(text)) AS BIGINT) AS decoded_bytes,
       CAST(SUM(strlen(text) - strlen(replace(text, 'o', '')))
            AS BIGINT) AS n_o
FROM documents
WHERE text IS NOT NULL
GROUP BY 1
ORDER BY 1
"""

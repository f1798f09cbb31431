"""Document sources & sinks — the engine's scan layer.

Generalizes the reference's two ingestion paths (SURVEY.md §2.1):

* S1 JSON batch (``{documents: [{id, text}...]}``,
  reference routes/embedding.py:95-96) → :func:`read_documents_json`
  (both the nested batch shape and flat json-lines), plus parquet/CSV.
* S2 raw text bodies (routes/embedding.py:75-78; invalid UTF-8 → 422,
  utils.py:129-136) → :func:`read_documents_text` with ``wholetext`` and
  binary-mode quarantine of undecodable files.

Error handling maps the reference's error classifier (V4,
utils.py:119-157) onto Spark's PERMISSIVE mode: malformed records land in
a quarantine DataFrame with the reference's error_type labels instead of
failing the job — the scalable analogue of per-request HTTP 422s.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from inception_spark.schemas import DOCUMENTS

#: reference metric labels (metrics.py:16-20, utils.py:119-157)
ERROR_DECODE = "decode_error"
ERROR_VALIDATION = "validation_error"
ERROR_PROCESSING = "processing_error"

_DOCS_PERMISSIVE = T.StructType(
    list(DOCUMENTS.fields)
    + [T.StructField("_corrupt_record", T.StringType(), True)]
)


def read_documents_json(
    spark: SparkSession, path: str, *, multiline_batch: bool = False
) -> tuple[DataFrame, DataFrame]:
    """→ (documents, quarantine).

    ``multiline_batch=True`` parses the reference's nested request shape
    ``{"documents": [{id, text}...]}`` (one request per file); the default
    reads flat json-lines of ``{id, text}``.  Malformed records are
    quarantined with ``error_type = validation_error`` instead of killing
    the read (PERMISSIVE + corrupt-record column)."""
    if multiline_batch:
        nested = (
            spark.read.option("multiLine", "true")
            .schema("documents array<struct<id: long, text: string>>")
            .json(path)
        )
        docs = nested.select(
            F.explode("documents").alias("d")
        ).select("d.id", "d.text")
        return docs, docs.limit(0).withColumn(
            "error_type", F.lit(None).cast("string")
        )
    raw = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(_DOCS_PERMISSIVE)
        .json(path)
    )
    good = raw.filter(
        F.col("_corrupt_record").isNull() & F.col("id").isNotNull()
    ).select("id", "text")
    bad = raw.filter(
        F.col("_corrupt_record").isNotNull() | F.col("id").isNull()
    ).select(
        F.col("_corrupt_record").alias("raw"),
        F.lit(ERROR_VALIDATION).alias("error_type"),
    )
    return good, bad


def read_documents_csv(
    spark: SparkSession, path: str, *, header: bool = True
) -> tuple[DataFrame, DataFrame]:
    raw = (
        spark.read.option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(_DOCS_PERMISSIVE)
        .csv(path)
    )
    good = raw.filter(
        F.col("_corrupt_record").isNull() & F.col("id").isNotNull()
    ).select("id", "text")
    bad = raw.filter(
        F.col("_corrupt_record").isNotNull() | F.col("id").isNull()
    ).select(
        F.col("_corrupt_record").alias("raw"),
        F.lit(ERROR_VALIDATION).alias("error_type"),
    )
    return good, bad


def read_documents_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar path — schema enforced by the file format itself."""
    return spark.read.parquet(path).select("id", "text")


def read_documents_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC twin of the parquet path (both columnar formats ship in
    Spark's core; same predicate-pushdown/column-pruning machinery)."""
    return spark.read.orc(path).select("id", "text")


def read_documents_xml(
    spark: SparkSession, path: str, *, row_tag: str = "doc"
) -> DataFrame:
    """XML document ingestion (Spark 4 ships the XML source in core) —
    one ``<doc>`` element per document with ``<id>``/``<text>``
    children; schema declared so malformed ids null out instead of
    silently re-typing the column."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )
    return (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .schema(schema)
        .load(path)
    )


def read_media_dir(
    spark: SparkSession, path: str, *, glob: str = "*"
) -> DataFrame:
    """Raw media ingestion over a directory of blob files via Spark's
    ``binaryFile`` source → (path, modificationTime, length, content).
    THE 100 TB multimodal entry point: the source is splittable at file
    granularity, prunes on ``pathGlobFilter``, and feeds content
    straight into the probe/decode families without a Python listing
    step on the driver."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def read_documents_text(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Raw text files, one document per file (S2: the text/plain body).

    Files are read as binary and decoded explicitly so invalid UTF-8 is
    *quarantined* with the reference's ``decode_error`` label (utils.py:
    129-136) rather than silently replaced — Spark's text reader would
    substitute U+FFFD, losing the 422 semantics.  doc ids are assigned by
    file order hash (the single-doc endpoint hardcodes id=0; a directory
    scan needs distinct ids — we use a stable 28-bit path hash)."""
    # decode() hard-fails on malformed input by default in Spark 4; the
    # legacy coding action substitutes U+FFFD, which we then quarantine
    # (files that legitimately contain U+FFFD are quarantined too — the
    # conservative trade for preserving the reference's 422 semantics).
    # The conf flip is scoped to THIS read: the previous value is restored
    # after the eager localCheckpoint below, so unrelated queries in the
    # same session keep strict decode() semantics (advisor finding, r1).
    key = "spark.sql.legacy.codingErrorAction"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        raw = spark.read.format("binaryFile").load(path).select(
            "path", "content"
        )
        decoded = raw.select(
            "path",
            F.decode(F.col("content"), "UTF-8").alias("text"),
            F.conv(F.substring(F.md5(F.col("path")), 1, 7), 16, 10)
            .cast("long")
            .alias("id"),
        # materialize while the legacy action is active — decode() must
        # not lazily evaluate after the conf is restored
        ).localCheckpoint(eager=True)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    good = decoded.filter(
        F.col("text").isNotNull()
        & (F.length(F.regexp_replace("text", "�", "")) == F.length("text"))
    ).select("id", "text")
    bad = decoded.filter(
        F.col("text").isNull()
        | (F.length(F.regexp_replace("text", "�", "")) != F.length("text"))
    ).select(
        F.col("path").alias("raw"),
        F.lit(ERROR_DECODE).alias("error_type"),
    )
    return good, bad


# ---------------------------------------------------------------------------
# sinks (S4)
# ---------------------------------------------------------------------------


def write_chunk_embeddings(
    df: DataFrame, path: str, *, partition_by_doc_bucket: int = 0
) -> None:
    """Parquet sink for the flat chunk table.  At 100 TB, bucket by doc_id
    so downstream per-document reassembly joins are co-located."""
    if partition_by_doc_bucket > 0:
        (
            df.write.mode("overwrite")
            .bucketBy(partition_by_doc_bucket, "doc_id")
            .sortBy("doc_id", "chunk_number")
            .option("path", path)
            .saveAsTable("chunk_embeddings_bucketed")
        )
        return
    df.write.mode("overwrite").parquet(path)


def write_nested_response_json(df: DataFrame, path: str) -> None:
    """The reference's nested TextResponse shape as json-lines
    (schemas.nest_response upstream)."""
    df.write.mode("overwrite").json(path)


def shard_assignment(
    df: DataFrame, *, n_shards: int, key_col: str = "doc_id",
    salt: str = "shard",
) -> DataFrame:
    """Stable content-hash shard id in [0, n_shards): the same document
    lands in the same shard on every run, on any engine, at any
    partitioning — the property that makes incremental re-publication
    and cross-run diffing possible (Spark's own repartition is
    round-robin/hash over an exchange and promises none of that)."""
    from inception_spark.functions.hashing import h28

    return df.withColumn(
        "shard",
        (
            h28(F.concat(F.lit(salt + "\x1f"), F.col(key_col).cast("string")))
            % F.lit(n_shards)
        ).cast("int"),
    )


def shard_manifest(
    df: DataFrame, *, n_shards: int, key_col: str = "doc_id",
    text_col: str = "text", salt: str = "shard",
) -> DataFrame:
    """Per-shard manifest (shard, n_docs, total_chars) — published next
    to the shards so a consumer can verify completeness without listing
    files.  One hash aggregate; map-side combine makes the shuffle carry
    n_shards rows per task."""
    return (
        shard_assignment(df, n_shards=n_shards, key_col=key_col, salt=salt)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.length(F.col(text_col))).cast("long").alias("total_chars"),
        )
    )


def write_sharded_corpus(
    df: DataFrame, path: str, *, n_shards: int, key_col: str = "doc_id",
) -> None:
    """Write the corpus partitioned by stable shard id (partitionBy, so
    each shard is its own directory and partition pruning serves
    shard-targeted reads), plus the manifest alongside."""
    sharded = shard_assignment(df, n_shards=n_shards, key_col=key_col)
    sharded.write.mode("overwrite").partitionBy("shard").parquet(
        f"{path}/data"
    )
    shard_manifest(df, n_shards=n_shards, key_col=key_col).write.mode(
        "overwrite"
    ).parquet(f"{path}/manifest")


def shard_manifest_sql(
    table: str = "documents", *, n_shards: int, key_col: str = "doc_id",
    text_col: str = "text", salt: str = "shard",
) -> str:
    from inception_spark.functions.hashing import h28_sql

    salted = f"'{salt}' || chr(31) || CAST({key_col} AS VARCHAR)"
    return f"""
SELECT CAST({h28_sql(salted)} % {n_shards} AS INTEGER) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length({text_col})) AS BIGINT) AS total_chars
FROM {table}
GROUP BY 1
"""

"""ZIP-shard member source — the other sample container training
corpora arrive in (Kaggle dumps, scraped archives, HF dataset zips).

The reference has no archive surface (SURVEY.md §2.5); this is the
sibling of :mod:`inception_spark.sources.tar` with one honest format
difference: ZIP's central directory lives at the END of the file, so a
shard cannot be parsed as a forward stream — random access is
required.  That shapes the Spark design:

* shards are independently parseable files → ONE TASK PER SHARD via
  the built-in ``binaryFile`` source + Arrow-batched ``mapInPandas``
  (no shuffle in the scan), same as tar;
* per-task memory is the WHOLE compressed shard (the binaryFile
  contract) + one member payload + one pending Arrow batch — there is
  NO constant-memory streaming variant, and unlike tar there cannot
  be one (the central directory is the only authoritative member
  list; local headers may lie about sizes).  Size ZIP shards like
  parquet row groups, not like tar streams — documented, not hidden;
* rows stream out in bounded pandas batches; ``max_member_bytes``
  truncates pathological members;
* sample grouping stays relational downstream (groupBy sample_key),
  the webdataset convention shared with tar.
"""

from __future__ import annotations

import io
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from inception_spark.sources.tar import split_member_name

ZIP_MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard_file", T.StringType(), False),
        T.StructField("member_name", T.StringType(), False),
        T.StructField("sample_key", T.StringType(), True),
        T.StructField("ext", T.StringType(), True),
        T.StructField("size", T.LongType(), False),
        T.StructField("compressed_size", T.LongType(), False),
        T.StructField("method", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

_METHODS = {
    zipfile.ZIP_STORED: "stored",
    zipfile.ZIP_DEFLATED: "deflated",
    zipfile.ZIP_BZIP2: "bzip2",
    zipfile.ZIP_LZMA: "lzma",
}


class ZipFormatError(ValueError):
    """Raised on a structurally invalid shard when ``strict``."""


def read_zip_members(
    spark: SparkSession,
    path: str,
    *,
    extensions: list[str] | None = None,
    max_member_bytes: int | None = None,
    batch_rows: int = 1024,
    strict: bool = True,
) -> DataFrame:
    """All members of every ZIP shard under ``path`` as rows of
    :data:`ZIP_MEMBER_SCHEMA`.  Directories are skipped; member order
    follows the central directory (the authoritative list)."""
    import pandas as pd

    exts = set(extensions) if extensions is not None else None

    def parse(batches):
        for pdf in batches:
            out: list = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                try:
                    zf = zipfile.ZipFile(io.BytesIO(bytes(content)))
                    infos = zf.infolist()
                except zipfile.BadZipFile as exc:
                    if strict:
                        raise ZipFormatError(
                            f"corrupt zip shard {fname}: {exc}"
                        ) from exc
                    continue
                for info in infos:
                    if info.is_dir():
                        continue
                    key, ext = split_member_name(info.filename)
                    if exts is not None and ext not in exts:
                        continue
                    payload = zf.read(info)
                    if (
                        max_member_bytes is not None
                        and len(payload) > max_member_bytes
                    ):
                        payload = payload[:max_member_bytes]
                    out.append(
                        (
                            fname,
                            info.filename,
                            key,
                            ext,
                            info.file_size,
                            info.compress_size,
                            _METHODS.get(
                                info.compress_type,
                                str(info.compress_type),
                            ),
                            payload,
                        )
                    )
                    if len(out) >= batch_rows:
                        yield pd.DataFrame(
                            out, columns=ZIP_MEMBER_SCHEMA.names
                        )
                        out = []
            if out:
                yield pd.DataFrame(out, columns=ZIP_MEMBER_SCHEMA.names)

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(parse, ZIP_MEMBER_SCHEMA)
    )


def zip_samples(members: DataFrame) -> DataFrame:
    """webdataset grouping: members → one row per (shard, sample_key)
    with the member extensions and total payload bytes — plain
    relational code so Catalyst prunes payloads the query never
    touches."""
    return members.groupBy("shard_file", "sample_key").agg(
        F.sort_array(F.collect_list("ext")).alias("exts"),
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("size").cast("long").alias("total_bytes"),
    )

"""WebDataset-style tar-shard source — the de-facto sample container
for large multimodal training datasets (Aizman et al., "High Performance
I/O For Large Scale Deep Learning"; the webdataset/tarp public format:
a sample is the group of consecutive tar members sharing one basename
key, e.g. ``000123.jpg`` + ``000123.txt`` + ``000123.json``).

The reference has no archive surface (SURVEY.md §2.5); this is the
training-pipeline companion to :mod:`inception_spark.sources.warc`,
built the same Spark-first way:

* shards are independently parseable files, so the decomposition is ONE
  TASK PER SHARD via the built-in ``binaryFile`` source + an
  Arrow-batched ``mapInPandas`` — no shuffle anywhere in the scan;
* parsing uses ONLY stdlib ``tarfile`` in sequential-stream mode
  (``r|``/``r|gz`` — forward reads, no seeking, no central index pass),
  so a shard's members are visited once in file order;
* rows stream out in bounded pandas batches (``batch_rows`` /
  ``batch_bytes``), never one frame per shard — the WARC memory
  contract;
* sample GROUPING is ordinary relational code downstream
  (:func:`tar_samples`): members→samples is a groupBy on
  (shard, sample_key), which keeps the parser stateless and lets
  Catalyst prune payload columns the query never touches.

Per-task memory: the compressed shard bytes (the ``binaryFile``
contract) + one member's payload + one pending Arrow batch.
``max_member_bytes`` truncates pathological members so a single huge
sample can't blow the batch budget.
"""

from __future__ import annotations

import io
import tarfile
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TAR_MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard_file", T.StringType(), False),
        T.StructField("member_name", T.StringType(), False),
        T.StructField("sample_key", T.StringType(), True),
        T.StructField("ext", T.StringType(), True),
        T.StructField("size", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


class TarFormatError(ValueError):
    """Raised on a structurally invalid shard when ``strict``."""


def split_member_name(name: str) -> tuple[str, str]:
    """WebDataset key split: everything up to the FIRST dot of the
    basename is the sample key, the rest is the (possibly dotted)
    extension — ``a/b/000123.seg.json`` → ``("a/b/000123", "seg.json")``.
    Matches the published webdataset convention, where multi-dot
    extensions distinguish member roles within one sample."""
    dirname, _, base = name.rpartition("/")
    key, dot, ext = base.partition(".")
    prefix = f"{dirname}/" if dirname else ""
    return prefix + key, ext if dot else ""


def read_tar_members(
    spark: SparkSession,
    path: str,
    *,
    extensions: list[str] | None = None,
    max_member_bytes: int | None = None,
    strict: bool = True,
    batch_rows: int = 1024,
    batch_bytes: int = 64 << 20,
) -> DataFrame:
    """Tar shard directory/glob → one row per member
    (``TAR_MEMBER_SCHEMA``).  Plain and gzipped (``.tar.gz``/``.tgz``)
    shards both parse; compression is detected by tarfile's stream
    reader (``r|*``).

    * ``extensions`` — keep only these member extensions (filtering
      inside the parser avoids materializing unwanted payloads into
      Arrow batches at all — decode-what-you-need).
    * ``max_member_bytes`` — truncate oversized member payloads.
    * ``strict=False`` — quarantine semantics: a corrupt shard yields
      the members parsed so far instead of failing the task.  Detectable
      corruption = truncation mid-member and unreadable first headers;
      a garbage TAIL after a valid member is silently treated as EOF by
      ``tarfile``'s checksum logic in every mode (pinned in tests).
    * ``batch_rows`` / ``batch_bytes`` — Arrow batch bounds, the WARC
      memory contract.
    """
    import pandas as pd

    keep = set(extensions) if extensions is not None else None

    def mapper(batches):
        for pdf in batches:
            for fname, content in zip(pdf["path"], pdf["content"]):
                rows: list[dict] = []
                nbytes = 0
                try:
                    tf = tarfile.open(
                        fileobj=io.BytesIO(bytes(content)), mode="r|*"
                    )
                except tarfile.TarError as exc:
                    if strict:
                        raise TarFormatError(
                            f"unreadable tar shard {fname}: {exc}"
                        ) from exc
                    continue
                try:
                    for member in tf:
                        if not member.isfile():
                            continue
                        key, ext = split_member_name(member.name)
                        if keep is not None and ext not in keep:
                            continue
                        f = tf.extractfile(member)
                        payload = f.read() if f is not None else b""
                        if (
                            max_member_bytes is not None
                            and len(payload) > max_member_bytes
                        ):
                            payload = payload[:max_member_bytes]
                        rows.append(
                            {
                                "shard_file": fname,
                                "member_name": member.name,
                                "sample_key": key,
                                "ext": ext,
                                "size": int(member.size),
                                "payload": payload,
                            }
                        )
                        nbytes += len(payload)
                        if len(rows) >= batch_rows or nbytes >= batch_bytes:
                            yield pd.DataFrame(rows)
                            rows, nbytes = [], 0
                except tarfile.TarError as exc:
                    if strict:
                        raise TarFormatError(
                            f"corrupt tar shard {fname}: {exc}"
                        ) from exc
                    # quarantine: fall through with the valid prefix
                if rows:
                    yield pd.DataFrame(rows)

    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(
        mapper, TAR_MEMBER_SCHEMA
    )


def tar_samples(members: DataFrame) -> DataFrame:
    """Members → WebDataset samples: one row per (shard_file,
    sample_key) with ``exts`` (sorted pipe-joined extension list),
    ``n_members`` and ``total_bytes`` — the completeness view used to
    reject half-written samples before decode (every sample must carry
    the same extension set).  Pure relational; payload grouping stays
    with the caller so unreferenced payloads prune at the scan."""
    return (
        members.groupBy("shard_file", "sample_key")
        .agg(
            F.concat_ws(
                "|", F.array_sort(F.collect_list("ext"))
            ).alias("exts"),
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum("size").cast("long").alias("total_bytes"),
        )
    )

"""Spark schemas for the engine's tables.

Maps the reference's pydantic request/response models
(``/root/reference/inception/schemas.py``) onto DataFrame schemas per
SURVEY.md §1.3: the nested ``TextResponse.embeddings`` shape becomes a flat
exploded chunk table; callers wanting the nested JSON shape use
:func:`nest_response`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: TextRequest / BatchTextRequest.documents (reference schemas.py:4-22)
DOCUMENTS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)

#: flat chunk table after chunk fan-out (reference C3, embedding_service.py:179-200)
CHUNKS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("chunk_number", T.IntegerType(), False),  # 1-based
        T.StructField("chunk", T.StringType(), False),
        T.StructField("n_tokens", T.IntegerType(), False),
    ]
)

#: ChunkEmbedding rows keyed by doc (reference schemas.py:46-64), exploded
CHUNK_EMBEDDINGS = T.StructType(
    CHUNKS.fields
    + [T.StructField("embedding", T.ArrayType(T.FloatType(), False), False)]
)

#: /api/v1/validate/text output (reference routes/embedding.py:130-150)
VALIDATED_TEXTS = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("original_text", T.StringType(), True),
        T.StructField("processed_text", T.StringType(), True),
        T.StructField("is_valid", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)


def nest_response(chunk_embeddings: DataFrame) -> DataFrame:
    """Reassemble the flat chunk table into the reference's nested
    ``TextResponse`` shape: one row per document with
    ``embeddings: array<struct<chunk_number,chunk,embedding>>`` ordered by
    chunk_number (reference embedding_service.py:226-252, C7)."""
    return (
        chunk_embeddings.groupBy(F.col("doc_id").alias("id"))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("chunk_number", "chunk", "embedding")
                )
            ).alias("embeddings")
        )
    )

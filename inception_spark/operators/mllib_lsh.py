"""MLlib-backed LSH alternatives (SURVEY.md §7.2.7).

The hand-rolled operators in ``dedup.py``/``similarity.py`` are the
oracle-checkable paths (deterministic md5 arithmetic).  These wrappers
expose Spark MLlib's native LSH estimators — ``MinHashLSH`` for Jaccard
dedup and ``BucketedRandomProjectionLSH`` for Euclidean ANN — which bring
``approxSimilarityJoin``'s optimized implementation to the same call
shapes.  Trade-off: MLlib's hash families are seeded differently from our
DuckDB twins, so these are rows-only checked (no SQL oracle), but at 100 TB
they benefit from MLlib's tuned join strategy.
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH, MinHashLSH
from pyspark.ml.functions import array_to_vector
from pyspark.ml.linalg import Vectors
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inception_spark.functions import hashing as H


def _shingle_vectors(
    df: DataFrame, *, id_col: str, text_col: str, n: int, dim: int = 1 << 18
) -> DataFrame:
    """Sparse binary shingle vectors for MinHashLSH (hash shingles into a
    fixed space; sorted distinct indices as required by SparseVector)."""
    from inception_spark.operators.dedup import exploded_shingles

    ex = exploded_shingles(df, id_col=id_col, text_col=text_col, n=n)
    # no .distinct() here: collect_set deduplicates, and a pre-distinct
    # would add a full extra shuffle of the widest intermediate
    idx = ex.select(
        "doc_id", (H.h28(F.col("s")) % F.lit(dim)).alias("i")
    )
    grouped = idx.groupBy("doc_id").agg(
        F.array_sort(F.collect_set("i")).alias("indices")
    )

    def to_vec(indices):
        return Vectors.sparse(dim, [(int(i), 1.0) for i in indices])

    from pyspark.sql.types import StructField, StructType
    from pyspark.ml.linalg import VectorUDT

    udf = F.udf(to_vec, VectorUDT())
    return grouped.select("doc_id", udf("indices").alias("features"))


def mllib_minhash_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hash_tables: int = 4,
    max_jaccard_distance: float = 0.8,
    seed: int = 1337,
) -> DataFrame:
    """approxSimilarityJoin on MinHashLSH: (doc_a, doc_b, jaccard_distance)."""
    feats = _shingle_vectors(
        df, id_col=id_col, text_col=text_col, n=shingle_n
    )
    model = MinHashLSH(
        inputCol="features",
        outputCol="hashes",
        numHashTables=num_hash_tables,
        seed=seed,
    ).fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, max_jaccard_distance, distCol="jaccard_distance"
    )
    return (
        joined.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_distance", 4).alias("jaccard_distance"),
        )
    )


def mllib_ann_topk(
    df: DataFrame,
    query_vec: list[float],
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 2024,
) -> DataFrame:
    """approxNearestNeighbors on BucketedRandomProjectionLSH (Euclidean):
    (vec_id, eucl_dist).  The Euclidean counterpart of ann_lsh_topk."""
    feats = df.select(
        F.col(id_col).alias("vec_id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    ).fit(feats)
    out = model.approxNearestNeighbors(
        feats, Vectors.dense(query_vec), k, distCol="eucl_dist"
    )
    return out.select("vec_id", F.round("eucl_dist", 6).alias("eucl_dist"))

"""Round-4 additions: int8 scalar quantization ANN + incremental embedding.

sq_encode/sq_topk: the memory-bound ANN scale path (4x scan reduction,
integer scores — exact across engines with no rounding discipline).
embed_documents_delta: the recrawl path (embed only chunks whose
(doc_id, chunk_md5) is new; carry stored embeddings otherwise).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from inception_spark.engine import EmbeddingEngine
from inception_spark.operators.similarity import (
    cosine_topk,
    sq_encode,
    sq_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    rows = [
        (i, [float(x) for x in rng.standard_normal(16)]) for i in range(200)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_sq_encode_range_and_scale(emb):
    enc = sq_encode(emb).collect()
    assert all(-127 <= v <= 127 for r in enc for v in r["qvec"])
    scales = {r["scale"] for r in enc}
    assert len(scales) == 1  # one corpus-wide scale, broadcast
    # at least one component must hit the clamp boundary (the max element)
    assert any(abs(v) == 127 for r in enc for v in r["qvec"])


def test_sq_topk_approximates_exact_cosine(emb):
    qv = [r["embedding"] for r in emb.filter("vec_id = 0").collect()][0]
    exact = [r["vec_id"] for r in cosine_topk(emb, list(qv), k=10).collect()]
    quant = [r["vec_id"] for r in sq_topk(emb, list(qv), k=10).collect()]
    # int8 over 16-dim gaussians: the top result must survive quantization
    # and the top-10 sets should overlap heavily
    assert quant[0] == exact[0] == 0
    assert len(set(exact) & set(quant)) >= 7


def test_sq_topk_integer_scores_partitioning_independent(emb):
    qv = [r["embedding"] for r in emb.filter("vec_id = 0").collect()][0]
    a = sq_topk(emb, list(qv), k=10).collect()
    b = sq_topk(emb.repartition(13), list(qv), k=10).collect()
    assert [(r["vec_id"], r["qdot"]) for r in a] == [
        (r["vec_id"], r["qdot"]) for r in b
    ]
    assert all(isinstance(r["qdot"], int) for r in a)


def test_sq_quant_half_up_rounding_matches_duckdb(spark):
    """floor(x*scale+0.5) on negative midpoints: Spark, DuckDB, and the
    docstring must agree (builtin round() differs between engines)."""
    vals = [-2.5, -1.5, -0.5, 0.5, 1.5, 2.5]
    df = spark.createDataFrame(
        [(0, [float(v) for v in vals])], "vec_id long, embedding array<float>"
    )
    # scale -> 127/2.5 ; q = floor(v*scale+0.5)
    enc = sq_encode(df).collect()[0]
    duck = duckdb.sql(
        """
        WITH s AS (SELECT CAST(127.0 AS DOUBLE) / 2.5 AS scale)
        SELECT list_transform(
            [-2.5, -1.5, -0.5, 0.5, 1.5, 2.5],
            x -> greatest(-127, least(127,
                 CAST(floor(CAST(x AS DOUBLE) * scale + 0.5) AS BIGINT))))
        FROM s
        """
    ).fetchone()[0]
    assert list(enc["qvec"]) == [int(v) for v in duck]


def test_embed_delta_carries_and_embeds(spark):
    eng = EmbeddingEngine(spark)
    docs = spark.createDataFrame(
        [
            (1, "alpha bravo charlie delta"),
            (2, "echo foxtrot golf hotel"),
            (3, "india juliet kilo lima"),
        ],
        "id long, text string",
    )
    existing = eng.embed_documents(docs.filter("id < 3")).withColumn(
        "chunk_md5", F.md5("chunk")
    )
    # doc 2 revised, doc 3 brand-new, doc 1 untouched
    new = spark.createDataFrame(
        [
            (1, "alpha bravo charlie delta"),
            (2, "echo foxtrot golf hotel REVISED"),
            (3, "india juliet kilo lima"),
        ],
        "id long, text string",
    )
    out = eng.embed_documents_delta(new, existing)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["fresh"] is False
    assert rows[2]["fresh"] is True and rows[3]["fresh"] is True
    # carried embedding is byte-identical to the stored one
    stored = existing.filter("doc_id = 1").collect()[0]["embedding"]
    assert list(rows[1]["embedding"]) == list(stored)
    # fresh embedding matches what a full re-embed would produce
    full = {
        r["doc_id"]: r["embedding"]
        for r in eng.embed_documents(new).collect()
    }
    assert list(rows[2]["embedding"]) == list(full[2])


def test_embed_delta_drops_stale_rows(spark):
    """Chunks the new corpus no longer produces must not appear."""
    eng = EmbeddingEngine(spark)
    old_docs = spark.createDataFrame(
        [(1, "old text gone now"), (2, "kept text")], "id long, text string"
    )
    existing = eng.embed_documents(old_docs).withColumn(
        "chunk_md5", F.md5("chunk")
    )
    new = spark.createDataFrame([(2, "kept text")], "id long, text string")
    out = eng.embed_documents_delta(new, existing)
    assert [r["doc_id"] for r in out.collect()] == [2]
    assert out.collect()[0]["fresh"] is False


def test_multiprobe_recall_superset_of_single_bucket(emb):
    from inception_spark.operators.similarity import (
        ann_lsh_multiprobe_topk,
        ann_lsh_topk,
    )

    qv = [r["embedding"] for r in emb.filter("vec_id = 0").collect()][0]
    exact = [r["vec_id"] for r in cosine_topk(emb, list(qv), k=10).collect()]
    single = [r["vec_id"] for r in ann_lsh_topk(emb, list(qv), k=10).collect()]
    multi = [
        r["vec_id"]
        for r in ann_lsh_multiprobe_topk(
            emb, list(qv), k=10, probe_hamming=1
        ).collect()
    ]
    # r=1 probing scans a strict superset of the query bucket, so recall
    # against the exact answer can only improve
    assert len(set(multi) & set(exact)) >= len(set(single) & set(exact))
    assert multi[0] == 0  # the query row itself always survives
    # r=bits degenerates to the exact scan
    full = [
        r["vec_id"]
        for r in ann_lsh_multiprobe_topk(
            emb, list(qv), k=10, probe_hamming=8
        ).collect()
    ]
    assert full == exact


def test_sq_rerank_degenerates_to_exact_and_broadcasts(emb):
    from inception_spark.operators.similarity import sq_topk_rerank

    qv = [r["embedding"] for r in emb.filter("vec_id = 0").collect()][0]
    exact = cosine_topk(emb, list(qv), k=10).collect()
    rer = sq_topk_rerank(emb, list(qv), k=10, prescan=200).collect()
    assert [(r["vec_id"], r["score"]) for r in rer] == [
        (r["vec_id"], r["score"]) for r in exact
    ]
    plan = sq_topk_rerank(emb, list(qv), k=10, prescan=50)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # tight prescan still recovers the true top hit
    tight = sq_topk_rerank(emb, list(qv), k=10, prescan=30).collect()
    assert tight[0]["vec_id"] == 0


def test_contrastive_negatives_deterministic_and_bucketed(spark):
    """Negatives come from the anchor's own bucket, never itself, at
    most k each, and two runs (different partitionings) agree exactly."""
    from inception_spark.operators.similarity import (
        contrastive_hard_negatives,
        lsh_bucket_expr,
        lsh_hyperplanes,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    out = contrastive_hard_negatives(emb, k=3, bits=6)
    rows = out.collect()
    assert all(r.anchor_id != r.negative_id for r in rows)
    per = {}
    for r in rows:
        per.setdefault(r.anchor_id, []).append(r.neg_rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 3
               for v in per.values())
    planes = lsh_hyperplanes(64, bits=6)
    bk = {
        r.vec_id: r.b
        for r in emb.select(
            "vec_id", lsh_bucket_expr(F.col("embedding"), planes).alias("b")
        ).collect()
    }
    assert all(bk[r.anchor_id] == bk[r.negative_id] for r in rows)
    again = sorted(map(tuple, contrastive_hard_negatives(
        emb.repartition(13), k=3, bits=6).collect()))
    assert again == sorted(map(tuple, rows))


class TestMaxSim:
    def test_maxsim_beats_pooled_on_partial_match(self, spark):
        """The property MaxSim exists for: a doc matching ONE query
        token exactly outranks a doc that is mediocre everywhere, even
        when their pooled cosines order the other way."""
        from inception_spark.operators.similarity import maxsim_topk

        # 8-dim, 2 subvecs of 4.  Query: token A = e0, token B = e4.
        q = [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]
        rows = [
            # doc 1: first token == query token A exactly, second
            # token orthogonal to both
            (1, [1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0]),
            # doc 2: both tokens mediocre (cos ~0.5 to each query token)
            (2, [1.0, 1.7, 0.0, 0.0, 1.0, 1.7, 0.0, 0.0]),
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        out = {
            r["vec_id"]: r["score"]
            for r in maxsim_topk(df, q, k=2, n_subvecs=2).collect()
        }
        # doc1 maxsim: max(1.0, 0) + max(0, ~0.7) — dominated by exact hit
        assert out[1] > out[2]

    def test_matches_duckdb_twin_and_plan_is_map_only(self, spark):
        import duckdb

        from inception_spark.operators.similarity import (
            maxsim_topk,
            maxsim_topk_sql,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        qv = list(emb.filter("vec_id = 0").head()["embedding"])
        out = maxsim_topk(emb, qv, k=10)
        s = [tuple(r) for r in out.collect()]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
            "'/root/testdata/sf0.001/embeddings.parquet')"
        )
        o = [
            tuple(r)
            for r in con.execute(
                maxsim_topk_sql("embeddings", qv, k=10)
            ).fetchall()
        ]
        assert s == o
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "EvalPython" not in plan
        assert "Exchange" not in plan  # map + distributed top-k only

    def test_rejects_indivisible_dim(self, spark):
        import pytest as _pytest

        from inception_spark.operators.similarity import maxsim_topk

        df = spark.createDataFrame(
            [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
        )
        with _pytest.raises(ValueError, match="divide"):
            maxsim_topk(df, [1.0, 2.0, 3.0], n_subvecs=2)


def test_ivf_balance_report_accounts_every_vector(spark):
    from inception_spark.operators.similarity import ivf_balance_report

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    rep = ivf_balance_report(emb, n_centroids=8).collect()
    assert len(rep) == 8
    assert sum(r["n_vecs"] for r in rep) == emb.count()
    # imbalance factors average to 1 by construction
    assert abs(sum(r["imbalance"] for r in rep) / 8 - 1.0) < 1e-4


def test_embed_delta_stage_path_matches_checkpoint_path(spark, tmp_path):
    """VERDICT r11 ask 3: the scale-safe lineage cut.  stage_path
    writes the chunk⋈existing table to parquet staging instead of
    localCheckpoint; results must be identical row-for-row."""
    eng = EmbeddingEngine(spark)
    docs = spark.createDataFrame(
        [
            (1, "alpha bravo charlie delta"),
            (2, "echo foxtrot golf hotel REVISED"),
            (3, "india juliet kilo lima"),
        ],
        "id long, text string",
    )
    existing = eng.embed_documents(
        spark.createDataFrame(
            [(1, "alpha bravo charlie delta"), (2, "echo foxtrot golf hotel")],
            "id long, text string",
        )
    ).withColumn("chunk_md5", F.md5("chunk"))

    base = eng.embed_documents_delta(docs, existing)
    staged = eng.embed_documents_delta(
        docs, existing, stage_path=str(tmp_path / "delta_stage")
    )

    def key(rows):
        return sorted(
            (r["doc_id"], r["chunk_number"], r["fresh"],
             tuple(round(float(x), 6) for x in r["embedding"]))
            for r in rows
        )

    assert key(base.collect()) == key(staged.collect())
    # the staging directory really holds the joined chunk table
    import os

    assert any(
        f.endswith(".parquet")
        for f in os.listdir(tmp_path / "delta_stage")
    )


def test_embed_delta_chunker_runs_once_both_paths(spark, tmp_path):
    """The double-execution pin, parameterized over BOTH lineage cuts:
    an accumulator-tapped UDF spliced between the chunker and the join
    counts how many chunk rows the pre-cut lineage produces.  Without a
    cut the carried/fresh branches would re-execute the chunker (2x);
    with either cut each chunk flows through exactly once.

    The tap sits POST-chunker deliberately: tapping the input text
    instead counts expression duplication across the validate-filter
    and chunker-input operator nodes (2x by plan shape, pre-cut — not
    what the cut is for)."""
    from pyspark.sql.functions import pandas_udf

    eng = EmbeddingEngine(spark)
    n = 6
    docs = spark.createDataFrame(
        [(i, f"alpha bravo charlie doc{i}") for i in range(n)],
        "id long, text string",
    )
    existing = eng.embed_documents(docs.filter("id < 3")).withColumn(
        "chunk_md5", F.md5("chunk")
    )

    acc = spark.sparkContext.accumulator(0)

    @pandas_udf("string")
    def tapped(s):
        acc.add(len(s))
        return s

    orig_chunk = eng.chunk

    def counted_chunk(df):
        return orig_chunk(df).withColumn("chunk", tapped("chunk"))

    eng.chunk = counted_chunk
    try:
        for stage in (None, str(tmp_path / "once_stage")):
            acc.value = 0
            out = eng.embed_documents_delta(docs, existing,
                                            stage_path=stage)
            out.collect()
            assert acc.value == n, (
                f"stage_path={stage}: chunker lineage executed "
                f"{acc.value / n:.1f}x (expected once)"
            )
    finally:
        eng.chunk = orig_chunk

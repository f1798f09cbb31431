"""Physical-plan assertions: the plans we ship are the plans we designed.

Catalyst must show (a) predicate pushdown into the parquet scan, (b)
column pruning (ReadSchema carries only needed fields), (c) broadcast
joins for dimension tables, (d) map-side partial aggregation, (e) no
Python UDFs in pure-relational pipelines.  These tests pin the *shape* so
a future refactor that silently de-optimizes a plan fails CI.
"""

import pytest

from inception_spark.plans import relational as R

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q6_filter_pushdown_and_pruning(spark):
    df = R.q6_forecast_revenue(spark, SF)
    f = formatted(df)
    # shipdate/discount/quantity predicates reach the parquet scan
    assert "PushedFilters" in f
    assert "l_shipdate" in f.split("PushedFilters")[1][:400]
    # column pruning: scan reads only the 4 referenced columns
    read_schema = f.split("ReadSchema")[1][:400]
    assert "l_extendedprice" in read_schema
    assert "l_returnflag" not in read_schema  # unused column NOT read


def test_q5_broadcasts_dimensions(spark):
    p = plan_of(R.q5_region_revenue(spark, SF))
    assert p.count("BroadcastHashJoin") >= 3  # cust/supp/nation/region
    # the fact-side join may be broadcast at this tiny SF; what must NOT
    # happen is a cartesian product
    assert "CartesianProduct" not in p


def test_q1_partial_aggregation(spark):
    p = plan_of(R.q1_pricing_summary(spark, SF))
    # two-phase agg: partial_ functions before the exchange, final after
    assert "partial_sum" in p or "partial_count" in p


def test_relational_plans_have_no_python_udf(spark):
    for name, fn in [
        ("q1", R.q1_pricing_summary),
        ("q3", R.q3_shipping_priority),
        ("q5", R.q5_region_revenue),
        ("sessionization", R.events_sessionization),
    ]:
        p = plan_of(fn(spark, SF))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, name


def test_dedup_minhash_single_md5_pass(spark):
    """The shingle hash appears in ONE projection (the explode side), not
    inside each of the 16 aggregate expressions."""
    from inception_spark.operators.dedup import minhash_signatures

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(minhash_signatures(docs))
    assert p.count("md5") <= 2  # one for shingle hash (+ possible reuse)
    assert "partial_min" in p  # map-side combine before the shuffle


def test_chunk_pipeline_uses_arrow_udf(spark):
    """The chunker crosses to Python exactly once, via Arrow."""
    from inception_spark.operators.chunking import chunk_documents

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(chunk_documents(docs, id_col="doc_id", text_col="text"))
    assert "ArrowEvalPython" in p
    assert "BatchEvalPython" not in p  # never the row-at-a-time path


def test_cosine_topk_no_python(spark):
    from inception_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = [0.1] * 64
    p = plan_of(cosine_topk(emb, qv, k=5))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_topk_uses_take_ordered_not_global_window(spark):
    """Pin the review fix: single-query top-k compiles to the distributed
    TakeOrderedAndProject, never a global-window shuffle of all rows."""
    from inception_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = plan_of(cosine_topk(emb, [0.1] * 64, k=5))
    assert "TakeOrderedAndProject" in p


def test_ann_bucketed_layout_prunes_partitions(spark, tmp_path):
    """The write-once/query-many ANN layout: probing a bucketed table
    must prune at the FILE level (PartitionFilters on the scan, only the
    query bucket's partition read) and return exactly what the raw-table
    probe returns."""
    from inception_spark.operators.similarity import (
        ann_lsh_topk,
        ann_lsh_topk_pruned,
        write_bucketed_embeddings,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = list(emb.filter("vec_id = 0").select("embedding").head()[0])
    path = str(tmp_path / "emb_bucketed")
    write_bucketed_embeddings(emb, path, dim=len(qv))

    pruned = ann_lsh_topk_pruned(spark, path, qv, k=5)
    f = formatted(pruned)
    part_filters = f.split("PartitionFilters")[1][:200]
    assert "bucket" in part_filters  # bucket=q is a partition filter
    assert "ArrowEvalPython" not in f and "BatchEvalPython" not in f

    raw = ann_lsh_topk(emb, qv, k=5)
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, raw.collect())
    )


def test_q7_broadcasts_all_dimensions(spark):
    """Q7 shape: both nation resolution chains broadcast; the only
    shuffle join is lineitem⋈orders."""
    p = plan_of(R.q7_volume_shipping(spark, SF))
    assert p.count("BroadcastHashJoin") >= 4  # supp/cust/n1/n2
    assert "CartesianProduct" not in p


def test_q4_exists_is_semi_join(spark):
    """The EXISTS correlation compiles to a semi join, never a distinct
    over an inner join."""
    p = plan_of(R.q4_priority_exists(spark, SF))
    assert "LeftSemi" in p


def test_q17_correlated_avg_is_broadcast(spark):
    """The per-part average (correlated subquery in TPC-H Q17) joins back
    broadcast — the fact table never shuffles for it."""
    p = plan_of(R.q17_small_quantity_revenue(spark, SF))
    assert "BroadcastHashJoin" in p


def test_paragraph_dedup_partial_agg_no_nested_loop(spark):
    from inception_spark.operators.dedup import paragraph_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(paragraph_dedup(docs, boundary=" the ", sep=" "))
    # first-owner must be a partial-agg'd groupBy-min, never a sorted
    # window over the raw digest stream, and the flag-back join must be
    # an equi join
    assert "partial_min" in p
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


def test_temperature_mix_broadcasts_rate_table(spark):
    from inception_spark.operators.sampling import temperature_mix

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(temperature_mix(docs))
    # the #groups-row rate table rides a broadcast; the fact side of the
    # membership filter must not shuffle through a sort-merge join
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" not in p
    assert "SortMergeJoin" not in p


def test_events_anomaly_broadcasts_stats(spark):
    p = plan_of(R.events_anomaly(spark, SF))
    assert "BroadcastHashJoin" in p
    assert "partial_sum" in p  # decimal moments are two-phase


def test_pagerank_iteration_no_cartesian(spark):
    from inception_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    p = plan_of(pagerank(edges, n_iter=2))
    assert "CartesianProduct" not in p


def test_sq_topk_all_jvm_take_ordered(spark):
    """Quantized ANN: encode + integer dot + top-k must stay entirely in
    codegen (no Python UDF), use TakeOrderedAndProject (never a global
    sort/window over all scored rows), and broadcast the 1-row scale."""
    from inception_spark.operators.similarity import sq_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = emb.filter("vec_id = 0").select("embedding").head()[0]
    p = plan_of(sq_topk(emb, list(qv), k=10))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p  # scale joins via broadcast
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p


def test_registry_udf_free_entries_have_no_python_eval(spark):
    """Repo-wide pin of the 'stay JVM-side' rule: every registry entry
    outside the known Python-UDF families (embedding pipeline, streaming
    bridges, which materialize via foreachBatch) must compile to a plan
    with no Python evaluation nodes."""
    import __spark_entry__ as entry_mod

    UDF_FAMILIES = {
        # the encoder/chunker ARE pandas UDFs — that's their design
        "chunk_documents", "embed_documents", "embed_delta",
        # r8: the giant-doc regime runs the same chunker UDF
        "chunk_giant_doc",
        # streaming bridges execute eagerly inside the builder
        "streaming_events_hourly", "streaming_sessionization",
        "streaming_exact_dedup", "streaming_interval_join",
        "streaming_embed_documents",
        # bounded applyInPandas block grid (documented hot-block path)
        "embedding_dup_pairs",
        # delegates its within-cluster pair scan to the same block grid
        "semantic_dedup",
    }
    offenders = []
    for name, fn in entry_mod.queries().items():
        if name in UDF_FAMILIES:
            continue
        plan = plan_of(fn(spark, SF))
        if "BatchEvalPython" in plan or "ArrowEvalPython" in plan:
            offenders.append(name)
    assert offenders == [], (
        f"Python eval nodes in supposedly JVM-only plans: {offenders}"
    )


def test_sq_codes_probe_reads_codes_only(spark, tmp_path):
    """The materialized SQ8 layout must deliver its bandwidth claim in
    the plan: the probe's parquet scan reads (vec_id, qvec, scale) ONLY —
    the float `embedding` column is absent from ReadSchema — stays fully
    in codegen, and returns bit-identical results to quantizing the float
    corpus on the fly."""
    from inception_spark.operators.similarity import (
        sq_topk,
        sq_topk_over_codes,
        sq_topk_rerank,
        sq_topk_rerank_over_codes,
        write_sq_codes,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = list(emb.filter("vec_id = 0").select("embedding").head()[0])
    path = str(tmp_path / "sq_codes")
    write_sq_codes(emb, path)

    probe = sq_topk_over_codes(spark, path, qv, k=10)
    f = formatted(probe)
    read_schema = f.split("ReadSchema")[1][:400]
    assert "qvec" in read_schema
    assert "embedding" not in read_schema  # float bytes never scanned
    assert "ArrowEvalPython" not in f and "BatchEvalPython" not in f
    assert "TakeOrderedAndProject" in f

    raw = sq_topk(emb, qv, k=10)
    assert sorted(map(tuple, probe.collect())) == sorted(
        map(tuple, raw.collect())
    )

    # full recipe: codes prescan + float rerank restricted to shortlist
    rr = sq_topk_rerank_over_codes(spark, path, emb, qv, k=10, prescan=50)
    rr_raw = sq_topk_rerank(emb, qv, k=10, prescan=50)
    assert sorted(map(tuple, rr.collect())) == sorted(
        map(tuple, rr_raw.collect())
    )


def test_multiprobe_bucketed_layout_prunes_partitions(spark, tmp_path):
    """Multi-probe ANN over the bucketed layout: the r-flip probe set is
    a partition IN-filter, so at most 1+bits partitions' files are listed
    and read (verified on the actual files scanned, not just the plan
    string), and results are bit-identical to the raw-table multiprobe."""
    import re

    from pyspark.sql import functions as F

    from inception_spark.operators.similarity import (
        ann_lsh_multiprobe_topk,
        ann_lsh_multiprobe_topk_pruned,
        lsh_hyperplanes,
        probe_buckets,
        query_bucket,
        write_bucketed_embeddings,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = list(emb.filter("vec_id = 0").select("embedding").head()[0])
    path = str(tmp_path / "emb_bucketed")
    bits = 8
    write_bucketed_embeddings(emb, path, dim=len(qv), bits=bits)

    pruned = ann_lsh_multiprobe_topk_pruned(
        spark, path, qv, k=5, bits=bits, probe_hamming=1
    )
    f = formatted(pruned)
    part_filters = f.split("PartitionFilters")[1][:200]
    assert "bucket" in part_filters  # probe set is a partition filter

    # runtime proof of the ≤ 1+bits bound: the candidate scan touches
    # files from at most 1+bits distinct bucket= directories
    qbits = query_bucket(lsh_hyperplanes(len(qv), bits=bits), qv)
    probes = probe_buckets(qbits, bits=bits, probe_hamming=1)
    assert len(probes) == 1 + bits
    cand = spark.read.parquet(path).filter(F.col("bucket").isin(probes))
    touched = {
        re.search(r"bucket=(\d+)", r[0]).group(1)
        for r in cand.select(F.input_file_name()).distinct().collect()
    }
    assert len(touched) <= 1 + bits

    raw = ann_lsh_multiprobe_topk(emb, qv, k=5, bits=bits, probe_hamming=1)
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, raw.collect())
    )


def test_lsh_pairs_plan_no_cartesian(spark):
    """Band-bucket candidate generation must stay an equi-join on the
    band/bucket key — never an all-pairs product."""
    from inception_spark.operators.dedup import lsh_candidate_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(lsh_candidate_pairs(docs, k=16, bands=4))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_ivf_layout_prunes_to_n_probe_cells(spark, tmp_path):
    """The materialized IVF layout: probing reads files from at most
    n_probe cell= partitions (verified on the actual files scanned) and
    returns bit-identical results to the in-plan ivf_flat_topk."""
    import re

    from pyspark.sql import functions as F

    from inception_spark.functions.vectors import cosine
    from inception_spark.operators.similarity import (
        _query_vec_col,
        ivf_flat_topk,
        ivf_flat_topk_pruned,
        write_ivf_layout,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = list(emb.filter("vec_id = 0").select("embedding").head()[0])
    path = str(tmp_path / "ivf")
    write_ivf_layout(emb, path, n_centroids=8)

    pruned = ivf_flat_topk_pruned(spark, path, qv, k=10, n_probe=2)
    f = formatted(pruned)
    part_filters = f.split("PartitionFilters")[1][:200]
    assert "cell" in part_filters  # probe set is a partition filter

    # runtime bound: replicate the probe selection and assert the
    # filtered scan touches files from <= n_probe cell= directories
    cent = spark.read.parquet(f"{path}/centroids")
    probe = [
        r["cid"]
        for r in cent.select(
            "cid",
            F.round(cosine(F.col("cvec"), _query_vec_col(qv)), 6).alias(
                "qs"
            ),
        )
        .orderBy(F.desc("qs"), F.asc("cid"))
        .limit(2)
        .collect()
    ]
    touched = {
        re.search(r"cell=(\d+)", r[0]).group(1)
        for r in spark.read.parquet(f"{path}/data")
        .filter(F.col("cell").isin(probe))
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    assert len(touched) <= 2

    raw = ivf_flat_topk(emb, qv, k=10, n_probe=2)
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, raw.collect())
    )


def test_pq_encode_join_free_and_codes_probe_reads_codes_only(spark, tmp_path):
    """PQ's two scale claims, pinned: (a) encoding is a pure codegen scan
    — NO join/shuffle anywhere in the plan (the codebook rides as
    literals); (b) the materialized-codes ADC probe scans the m-byte
    codes only — the float embedding column is absent from ReadSchema —
    and returns bit-identical results to the in-plan variant."""
    from inception_spark.operators.similarity import (
        pq_codebook,
        pq_encode,
        pq_topk,
        pq_topk_over_codes,
        write_pq_codes,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = list(emb.filter("vec_id = 0").select("embedding").head()[0])

    cb = pq_codebook(emb, ksub=8)
    p = plan_of(pq_encode(emb, cb, m=8))
    assert "Join" not in p and "Exchange" not in p  # embarrassingly parallel
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p

    path = str(tmp_path / "pq")
    write_pq_codes(emb, path)
    probe = pq_topk_over_codes(spark, path, qv, k=10)
    f = formatted(probe)
    read_schema = f.split("ReadSchema")[1][:400]
    assert "codes" in read_schema
    assert "embedding" not in read_schema  # float bytes never scanned
    assert "TakeOrderedAndProject" in f

    raw = pq_topk(emb, qv, k=10)
    assert sorted(map(tuple, probe.collect())) == sorted(
        map(tuple, raw.collect())
    )


def test_knn_join_lsh_is_equi_join(spark):
    """The LSH-blocked batch kNN must join on the bucket KEY (hash/merge
    equi join) — the bit_count(xor)<=r predicate as a join condition
    would compile to a nested-loop cross product."""
    from pyspark.sql import functions as F

    from inception_spark.operators.similarity import knn_join_lsh

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter("vec_id < 10").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    p = plan_of(knn_join_lsh(queries, emb, dim=64, k=5))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert (
        "SortMergeJoin" in p
        or "ShuffledHashJoin" in p
        or "BroadcastHashJoin" in p
    )
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_ivf_pq_codes_probe_prunes_cells_and_reads_bytes_only(spark, tmp_path):
    """The composed IVFPQ layout delivers both economics in one plan:
    the probe's scan is partition-filtered to the probed cells AND its
    ReadSchema is the tinyint code bytes (no float column exists in the
    layout), ranking stays in codegen, results bit-identical to the
    in-plan ivf_pq_topk."""
    from inception_spark.operators.similarity import (
        ivf_pq_topk,
        ivf_pq_topk_over_codes,
        write_ivf_pq_layout,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = list(emb.filter("vec_id = 0").select("embedding").head()[0])
    path = str(tmp_path / "ivfpq")
    write_ivf_pq_layout(emb, path, n_centroids=8)

    probe = ivf_pq_topk_over_codes(spark, path, qv, k=10, n_probe=2)
    f = formatted(probe)
    part_filters = f.split("PartitionFilters")[1][:200]
    assert "cell" in part_filters
    read_schema = f.split("ReadSchema")[1][:400]
    assert "codes" in read_schema and "embedding" not in read_schema
    assert "ArrowEvalPython" not in f and "BatchEvalPython" not in f
    assert "TakeOrderedAndProject" in f

    raw = ivf_pq_topk(emb, qv, k=10, n_centroids=8, n_probe=2)
    assert sorted(map(tuple, probe.collect())) == sorted(
        map(tuple, raw.collect())
    )


def test_q11_threshold_is_broadcast_no_udf(spark):
    """Q11 shape: the global-total threshold must arrive as a broadcast
    (single-row scalar), never a shuffle; dimension semi-joins broadcast;
    the whole plan stays in codegen."""
    p = plan_of(R.q11_part_value_concentration(spark, SF))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_q12_pushdown_and_partial_agg(spark):
    """Q12 shape: two-phase aggregation and no Python anywhere; the
    late-shipment predicate is a join-time filter (depends on both
    sides, so it can't be pushed to one scan)."""
    p = plan_of(R.q12_late_shipment_priority(spark, SF))
    assert "partial_sum" in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_q20_share_join_reuses_part_key_no_cartesian(spark):
    """Q20 shape: the (part, supplier) aggregate and the per-part total
    join on the same key — no cartesian, broadcast decorations only."""
    p = plan_of(R.q20_promo_part_suppliers(spark, SF))
    assert "CartesianProduct" not in p
    assert p.count("BroadcastHashJoin") >= 2  # supplier + nation
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_q21_exists_pattern_single_fact_join(spark):
    """Q21 shape: exists/not-exists collapses to per-order aggregates +
    a semi join; supplier/nation decorate via broadcast; no Python."""
    p = plan_of(R.q21_waiting_suppliers(spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p
    assert "partial_count" in p or "partial_sum" in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_hamming_dup_pairs_blocked_join_no_cartesian(spark):
    """Multimodal near-dup pairs must go through the banded equi-join
    (the SimHash shape), never a cross join; the only Python in the
    plan is the single fingerprint mapInPandas pass."""
    import numpy as np

    from inception_spark.operators.multimodal import (
        encode_bmp,
        image_dup_pairs,
    )

    img = np.arange(192, dtype=np.uint8).reshape(8, 8, 3)
    rows = [(i, bytearray(encode_bmp(img))) for i in range(4)]
    df = spark.createDataFrame(rows, "id long, payload binary")
    p = plan_of(image_dup_pairs(df, max_bucket=100))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # exactly one fingerprint computation feeding both join sides
    assert p.count("MapInPandas") <= 2  # self-join may re-evaluate source


def test_bm25_index_probe_pushes_term_filter(spark, tmp_path):
    """The materialized inverted-index probe must read index tables
    only: the query's IN-list lands in the (term, doc_id, tf) scan's
    PushedFilters and no text column appears anywhere in the plan —
    plus bit-identical results to the in-plan scorer."""
    from inception_spark.functions.text_analysis import (
        bm25_topk,
        bm25_topk_over_index,
        write_inverted_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "idx")
    write_inverted_index(docs, path)

    probe = bm25_topk_over_index(spark, path, ["spark", "join"], k=10)
    f = formatted(probe)
    pushed = f.split("PushedFilters")[1][:300]
    assert "term" in pushed and ("In(" in pushed or "EqualTo" in pushed)
    assert "text" not in f.split("ReadSchema")[1][:800]
    assert "ArrowEvalPython" not in f and "BatchEvalPython" not in f

    raw = bm25_topk(docs, ["spark", "join"], k=10)
    assert probe.collect() == raw.collect()


def test_r6_eval_ops_plan_shapes(spark):
    """Round-6 operator plan pins: the scorecard and selection ops keep
    their designed scale shapes."""
    from pyspark.sql import functions as F

    from inception_spark.functions.cleaning import c4_line_clean
    from inception_spark.functions.sketches import hll_ndv_by_group
    from inception_spark.functions.text_analysis import dsir_scores
    from inception_spark.operators.classify import (
        lr_quality_classify,
        roc_auc,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ev = spark.read.parquet(f"{SF}/events.parquet")

    # c4_line_clean is a pure projection: NO shuffle, no UDF
    p = plan_of(c4_line_clean(docs))
    assert "Exchange" not in p and "ArrowEvalPython" not in p

    # grouped NDV: register max combines map-side before the exchange
    p = plan_of(hll_ndv_by_group(ev, "event_type", "user_id"))
    assert "partial_max" in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p

    # roc_auc: corpus-level per-score aggregate is partial (map-side
    # combine); the only window runs over that tiny table
    p = plan_of(roc_auc(lr_quality_classify(docs)))
    assert "partial_count" in p or "partial_sum" in p
    assert "ArrowEvalPython" not in p

    # dsir: the token explode is computed ONCE (lazy checkpoint) — the
    # final plan reads the cached RDD, no Generate node per consumer
    p = plan_of(dsir_scores(docs, F.col("lang") == "en"))
    assert "Generate" not in p, "explode re-evaluated per consumer"


def test_r7_ops_plan_shapes(spark):
    """Round-7 operator plan pins."""
    from pyspark.sql import functions as F

    from inception_spark.functions.cleaning import canonical_url_expr
    from inception_spark.functions.text_analysis import doc_script_profile
    from inception_spark.operators.dedup import url_dedup
    from inception_spark.plans.relational import events_gap_fill

    docs = spark.read.parquet(f"{SF}/documents.parquet")

    # script profile: pure projection — NO shuffle, no Python
    p = plan_of(doc_script_profile(docs))
    assert "Exchange" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p

    # url_dedup: canonicalization is in-projection; exactly the ONE
    # aggregate exchange, with map-side partial combine
    urls = docs.select(
        "doc_id", F.concat(F.lit("https://x.com/"), "doc_id").alias("url")
    )
    p = plan_of(url_dedup(urls))
    assert p.count("Exchange") == 1
    assert "partial_count" in p or "partial_min" in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # the canonicalizer alone adds no exchange at all
    assert "Exchange" not in plan_of(
        urls.select(canonical_url_expr(F.col("url")))
    )

    # gap fill: the spine side is metadata-sized; the raw events scan
    # aggregates partially map-side before its exchange, and the
    # distinct-types side broadcasts into the spine cross join
    p = plan_of(events_gap_fill(spark, SF))
    assert "partial_count" in p or "partial_sum" in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p


def test_scd2_history_islands(spark):
    """Runs collapse, intervals tile the timeline, reopened values get a
    NEW interval (type-2, not type-1), open row has NULL valid_to."""
    from datetime import datetime as dt

    from inception_spark.plans.relational import scd2_history

    rows = [
        (1, "a", dt(2024, 1, 1), 1),
        (1, "a", dt(2024, 1, 2), 2),   # same run
        (1, "b", dt(2024, 1, 3), 3),   # change
        (1, "a", dt(2024, 1, 4), 4),   # back to a -> NEW interval
        (2, "x", dt(2024, 1, 1), 5),   # single-run key
    ]
    df = spark.createDataFrame(rows, "k long, attr string, ts timestamp, i long")
    got = [
        (r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(df, key="k", attr="attr", ts="ts", tiebreak="i")
        .orderBy("k", "valid_from")
        .collect()
    ]
    assert got == [
        (1, "a", dt(2024, 1, 1), dt(2024, 1, 3), False),
        (1, "b", dt(2024, 1, 3), dt(2024, 1, 4), False),
        (1, "a", dt(2024, 1, 4), None, True),
        (2, "x", dt(2024, 1, 1), None, True),
    ]


def test_events_twap_weights_by_holding_time(spark, tmp_path):
    """A value held 9x longer dominates the TWAP 9:1 regardless of how
    many short-lived samples follow it."""
    import pandas as pd

    from inception_spark.plans.relational import events_twap

    rows = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:09:00",
                 "2024-01-01 00:10:00"]
            ),
            "user_id": [7, 7, 7],
            "event_type": ["a"] * 3,
            "value": [10.0, 100.0, 5.0],
            "props": ["{}"] * 3,
        }
    )
    p = str(tmp_path / "events.parquet")
    rows.to_parquet(p)
    d = str(tmp_path)
    import os, shutil
    os.rename(p, os.path.join(d, "events.parquet"))
    r = events_twap(spark, d).collect()[0]
    # 9 min at 10 + 1 min at 100 -> (9*10+1*100)/10 = 19
    assert r.user_id == 7 and abs(r.twap - 19.0) < 1e-6
    assert r.total_usecs == 600 * 1_000_000


def test_events_cusum_closed_form_equals_recursion(spark, tmp_path):
    """The two-window closed form must equal the literal
    max(0, s + x - k) recursion on a series with a planted level shift,
    and the alarm must fire only after the shift."""
    import pandas as pd

    from inception_spark.plans.relational import events_cusum

    # 12 quiet hours at ~2 events, then 6 loud hours at 12 events
    counts = [2] * 12 + [12] * 6
    rows = []
    eid = 0
    for h, n in enumerate(counts):
        for _ in range(n):
            rows.append(
                {
                    "event_id": eid,
                    "ts": pd.Timestamp("2024-03-01") + pd.Timedelta(hours=h, minutes=1),
                    "user_id": 1,
                    "event_type": "x",
                    "value": 1.0,
                    "props": "{}",
                }
            )
            eid += 1
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(str(tmp_path / "events.parquet"))
    out = {
        r.hour_ts.hour: (r.cusum_milli, r.alarm)
        for r in events_cusum(spark, str(tmp_path)).collect()
    }
    # replay the recursion in python with the same integer arithmetic
    total, n_hours, k = sum(counts), len(counts), 500
    s, want = 0, {}
    for h, n in enumerate(counts):
        x = (n * 1000 * n_hours) // total - 1000 - k
        s = max(0, s + x)
        want[h] = (s, s > 4000)
    assert out == want
    assert not out[11][1] and out[17][1]  # quiet end vs post-shift alarm


def test_events_resample_linear_interpolates(spark, tmp_path):
    """Grid points between two events take the exact linear blend;
    points before the first / after the last event clamp."""
    import pandas as pd

    from inception_spark.plans.relational import events_resample_linear

    rows = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": pd.to_datetime(["2024-01-01 00:30:00", "2024-01-01 04:30:00"]),
            "user_id": [5, 5],
            "event_type": ["a", "a"],
            "value": [10.0, 50.0],
            "props": ["{}", "{}"],
        }
    )
    rows["ts"] = rows["ts"].astype("datetime64[us]")
    rows.to_parquet(str(tmp_path / "events.parquet"))
    got = {
        r.hour_ts.hour: r.value_interp
        for r in events_resample_linear(spark, str(tmp_path)).collect()
    }
    # events at 00:30 (10) and 04:30 (50): slope 10/hour
    assert got[0] == 10.0          # before first event -> clamp
    assert got[1] == 15.0          # 0.5h after first
    assert got[2] == 25.0
    assert got[3] == 35.0
    assert got[4] == 45.0


def test_r7_late_ops_plan_shapes(spark):
    """Late round-7 operator plan pins."""
    from pyspark.sql import functions as F

    from inception_spark.functions.text_analysis import phrase_search
    from inception_spark.operators.dedup import jaccard_prefix_pairs
    from inception_spark.operators.layout import assign_global_ids
    from inception_spark.operators.pca import embedding_covariance
    from inception_spark.plans.relational import (
        events_cusum,
        scd2_history,
    )
    from inception_spark.plans.skew import salted_join

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    # covariance: NO join anywhere in the pair generation (double
    # explode), marginal tables broadcast, no Python
    p = plan_of(embedding_covariance(emb))
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    assert "BroadcastHashJoin" in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "Generate" in p  # the explode path, not a self-join

    # prefix join: the doc-frequency table broadcasts; the candidate
    # and verify joins are equi-joins — no cartesian anywhere
    p = plan_of(jaccard_prefix_pairs(docs, threshold_num=3, threshold_den=4))
    assert "CartesianProduct" not in p
    assert "BroadcastExchange" in p

    # global ids: the rank window partitions BY PARTITION ID (never the
    # single-reducer empty partitionBy), offsets broadcast.  The range
    # exchange itself sits above the localCheckpoint cut, so the visible
    # plan starts at the checkpointed RDD scan.
    p = plan_of(assign_global_ids(docs, ["n_chars", "doc_id"], num_partitions=4))
    assert "windowspecdefinition(_pid" in p
    assert "windowspecdefinition()" not in p
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p

    # salted join: both sides exchange (it IS a shuffle join by
    # design — the point is spreading, not broadcasting), no cartesian
    li = spark.range(100).select(F.col("id").alias("k"), F.lit(1).alias("x"))
    sm = spark.range(10).select(F.col("id").alias("k2"), F.lit(2).alias("y"))
    p = plan_of(
        salted_join(li, sm, key_large="k", key_small="k2", n_salts=4)
    )
    assert "CartesianProduct" not in p

    # scd2: windows partitioned by the key; one final aggregate
    p = plan_of(
        scd2_history(
            spark.createDataFrame(
                [(1, "a", 1)], "k long, attr string, ts long"
            ),
            key="k", attr="attr", ts="ts",
        )
    )
    assert "windowspecdefinition(k" in p
    assert "windowspecdefinition()" not in p

    # cusum: hourly rollup aggregates partially before its exchange;
    # windows partition by event_type
    p = plan_of(events_cusum(spark, SF))
    assert "partial_count" in p
    assert "windowspecdefinition(event_type" in p

    # phrase search: postings legs join as equi-joins (no cartesian,
    # no Python), counts partial-aggregate map-side
    p = plan_of(phrase_search(docs, "key order"))
    assert "CartesianProduct" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "partial_count" in p


def test_cusum_resample_empty_events(spark, tmp_path):
    """Empty event tables produce empty (not erroring) outputs for the
    windowed time-series operators."""
    import pandas as pd

    from inception_spark.plans.relational import (
        events_cusum,
        events_resample_linear,
        events_twap,
    )

    pdf = pd.DataFrame(
        {
            "event_id": pd.Series([], dtype="int64"),
            "ts": pd.Series([], dtype="datetime64[us]"),
            "user_id": pd.Series([], dtype="int64"),
            "event_type": pd.Series([], dtype="object"),
            "value": pd.Series([], dtype="float64"),
            "props": pd.Series([], dtype="object"),
        }
    )
    pdf.to_parquet(str(tmp_path / "events.parquet"))
    d = str(tmp_path)
    assert events_cusum(spark, d).count() == 0
    assert events_resample_linear(spark, d).count() == 0
    assert events_twap(spark, d).count() == 0


def test_scd2_null_attr_is_its_own_run(spark):
    """NULL attribute values form their own island (null-safe change
    detection) and an all-NULL run reports attr NULL."""
    from datetime import datetime as dt

    from inception_spark.plans.relational import scd2_history

    rows = [
        (1, "a", dt(2024, 1, 1), 1),
        (1, None, dt(2024, 1, 2), 2),
        (1, None, dt(2024, 1, 3), 3),  # same NULL run
        (1, "a", dt(2024, 1, 4), 4),   # new 'a' interval
    ]
    df = spark.createDataFrame(rows, "k long, attr string, ts timestamp, i long")
    got = [
        (r.attr, r.valid_from, r.is_current)
        for r in scd2_history(df, key="k", attr="attr", ts="ts", tiebreak="i")
        .orderBy("valid_from")
        .collect()
    ]
    assert got == [
        ("a", dt(2024, 1, 1), False),
        (None, dt(2024, 1, 2), False),
        ("a", dt(2024, 1, 4), True),
    ]


def test_events_resample_same_microsecond_tiebreak(spark, tmp_path):
    """Two events in the same microsecond: the event_id tiebreak makes
    the bracketing values deterministic (higher id wins the 'last
    before' slot)."""
    import pandas as pd

    from inception_spark.plans.relational import events_resample_linear

    rows = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:00:00",
                 "2024-01-01 02:00:00"]
            ),
            "user_id": [1, 1, 1],
            "event_type": ["a"] * 3,
            "value": [10.0, 30.0, 30.0],
            "props": ["{}"] * 3,
        }
    )
    rows["ts"] = rows["ts"].astype("datetime64[us]")
    rows.to_parquet(str(tmp_path / "events.parquet"))
    got = {
        r.hour_ts.hour: r.value_interp
        for r in events_resample_linear(spark, str(tmp_path)).collect()
    }
    # id=2 (value 30) is the last event at t0 -> flat 30 to the end
    assert got == {0: 30.0, 1: 30.0, 2: 30.0}


def test_events_resample_windows_are_running_frames(spark):
    """The forward bracket runs as a DESC-ordered RUNNING frame, not a
    (currentRow, unboundedFollowing) frame — Spark re-scans the latter's
    frame for every row (O(partition²); same-session A/B min-of-4 at
    sf0.1: 3.01 s → 0.98 s).  Pin: no unboundedfollowing frame anywhere, and exactly two
    Window nodes (same-frame functions grouped, no projection-split
    third Window)."""
    import re

    from inception_spark.plans.relational import events_resample_linear

    p = plan_of(events_resample_linear(spark, SF))
    assert "unboundedfollowing" not in p.lower()
    # every frame is the incremental running frame
    frames = re.findall(r"specifiedwindowframe\(RowFrame, ([^,]+), ([^)]+)\)", p)
    assert frames, "expected window frames in the plan"
    for lo, hi in frames:
        assert "unboundedpreceding" in lo
        assert "currentrow" in hi
    # exactly two Window operators (pv+pt grouped, nv+nt grouped): the
    # pre-projected ev_t keeps Spark from splitting a third Window off
    n_windows = len(re.findall(r"\bWindow \[", p))
    assert n_windows == 2, p


def test_ab_conversion_z_hand_computed(spark, tmp_path):
    """The z statistic matches the textbook two-proportion formula on a
    constructed assignment (all exposed, known conversion counts)."""
    import math

    import pandas as pd

    from inception_spark.plans.relational import ab_conversion_z

    rows = []
    eid = 0
    # variant A (even ids): 10 users, 6 convert; B (odd): 10 users, 2
    for u in range(20):
        conv = (u % 2 == 0 and u < 12) or (u % 2 == 1 and u < 4)
        rows.append({"event_id": eid, "ts": pd.Timestamp("2024-01-01"),
                     "user_id": u, "event_type": "view", "value": 1.0,
                     "props": "{}"}); eid += 1
        if conv:
            rows.append({"event_id": eid, "ts": pd.Timestamp("2024-01-02"),
                         "user_id": u, "event_type": "purchase",
                         "value": 1.0, "props": "{}"}); eid += 1
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(str(tmp_path / "events.parquet"))
    r = ab_conversion_z(spark, str(tmp_path)).collect()[0]
    assert (r.n_a, r.n_b, r.conv_a, r.conv_b) == (10, 10, 6, 2)
    pa, pb, pool = 0.6, 0.2, 0.4
    z = (pa - pb) / math.sqrt(pool * 0.6 * (0.1 + 0.1))
    assert abs(r.z_score - round(z, 6)) < 1e-9
    assert r.significant == (abs(z) > 1.96)


def test_rfm_scores_direction(spark, tmp_path):
    """The heaviest/most-recent/most-frequent user lands in segment
    '333'; a stale one-shot user gets r=1."""
    import pandas as pd

    from inception_spark.plans.relational import user_rfm_segments

    rows = []
    eid = 0
    # user 1: recent, frequent, big spender; user 2: middling;
    # user 3: one stale cheap event; spread more users for thresholds
    for u, (n, day, val) in enumerate(
        [(20, 28, 100.0), (6, 15, 10.0), (1, 1, 1.0),
         (3, 10, 5.0), (8, 20, 20.0), (2, 5, 2.0)], start=1
    ):
        for i in range(n):
            rows.append({"event_id": eid,
                         "ts": pd.Timestamp(f"2024-01-{day:02d}"),
                         "user_id": u, "event_type": "view",
                         "value": val, "props": "{}"})
            eid += 1
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(str(tmp_path / "events.parquet"))
    seg = {r.user_id: r.segment
           for r in user_rfm_segments(spark, str(tmp_path)).collect()}
    assert seg[1] == "333"
    assert seg[3].startswith("1")  # stalest user: worst recency score


def test_r7_final_ops_plan_shapes(spark):
    """Plan pins for the last round-7 additions."""
    from pyspark.sql import functions as F

    from inception_spark.functions.sketches import cumulative_ndv
    from inception_spark.operators.similarity import (
        contrastive_hard_negatives,
    )
    from inception_spark.plans.ivm import ivm_apply, ivm_state
    from inception_spark.plans.relational import (
        ab_conversion_z,
        user_rfm_segments,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    # cumulative NDV: the running max windows over the REGISTER table,
    # partitioned by register — never an empty partitionBy
    p = plan_of(cumulative_ndv(ev, time_col="ts", col="user_id"))
    assert "windowspecdefinition(reg" in p
    assert "windowspecdefinition()" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p

    # RFM: thresholds ride broadcasts; no sort-merge join anywhere
    from inception_spark.plans import relational as RR

    p = plan_of(user_rfm_segments(spark, SF))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert "SortMergeJoin" not in p

    # A/B: one conditional aggregate chain, partial map-side, no joins
    p = plan_of(ab_conversion_z(spark, SF))
    assert "partial_max" in p or "partial_sum" in p
    assert "SortMergeJoin" not in p

    # IVM: the merge aggregates partially before its exchange
    df = spark.createDataFrame([(1, "g", 1.0)], "id long, g string, v double")
    st = ivm_state(df, ["g"], "v")
    d = df.withColumn("mult", F.lit(1))
    p = plan_of(ivm_apply(st, d, ["g"], "v"))
    assert "partial_sum" in p
    assert "CartesianProduct" not in p

    # contrastive negatives: bucket equi-join (no cartesian), window
    # partitioned by anchor
    p = plan_of(contrastive_hard_negatives(emb, k=2, bits=4))
    assert "CartesianProduct" not in p
    assert "windowspecdefinition(anchor_id" in p


def test_event_transitions_rows_sum_to_one(spark):
    from inception_spark.plans.relational import event_transition_matrix

    out = event_transition_matrix(spark, SF).collect()
    rows = {}
    for r in out:
        rows.setdefault(r.from_type, 0.0)
        rows[r.from_type] += r.p
    # per-row probabilities sum to 1 within rounding slack
    assert all(abs(v - 1.0) < 1e-4 for v in rows.values())


def test_monthly_yoy_hand_case(spark, tmp_path):
    import pandas as pd

    from inception_spark.plans.relational import monthly_revenue_yoy

    rows = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_custkey": [1, 1, 1],
            "o_orderstatus": ["F"] * 3,
            "o_totalprice": [100.0, 150.0, 80.0],
            "o_orderdate": pd.to_datetime(
                ["2023-03-05", "2024-03-20", "2024-04-01"]
            ),
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    rows["o_orderdate"] = rows["o_orderdate"].astype("datetime64[us]")
    rows.to_parquet(str(tmp_path / "orders.parquet"))
    got = {
        (r.month_ts.year, r.month_ts.month): (r.yoy_pct, r.prev_year_revenue)
        for r in monthly_revenue_yoy(spark, str(tmp_path)).collect()
    }
    assert got[(2024, 3)] == (50.0, 100.0)
    assert got[(2024, 4)] == (None, None)
    assert got[(2023, 3)] == (None, None)


def test_basket_rules_hand_case(spark, tmp_path):
    """lift/confidence/support on a constructed basket set: a perfectly
    co-occurring pair tops the ranking with lift = n_orders/n_item."""
    import pandas as pd

    rows = []
    # orders 1-4: {10, 20} always together; orders 5-8: {30} alone with
    # rotating partners 40..70 (no repeat pair)
    for o in range(1, 5):
        rows += [(o, 10), (o, 20)]
    for i, o in enumerate(range(5, 9)):
        rows += [(o, 30), (o, 40 + 10 * i)]
    pdf = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    pdf["l_suppkey"] = 1
    pdf["l_quantity"] = 1.0
    pdf.to_parquet(str(tmp_path / "lineitem.parquet"))
    from inception_spark.plans.relational import basket_rules

    out = basket_rules(spark, str(tmp_path), min_pair_orders=2, k=10).collect()
    top = out[0]
    assert {top.antecedent, top.consequent} == {10, 20}
    assert top.n_both == 4 and top.confidence == 1.0
    assert top.support == 0.5          # 4 of 8 orders
    assert top.lift == 2.0             # 4*8/(4*4)
    # singles with no repeated partner never form a rule
    assert all({r.antecedent, r.consequent} == {10, 20} for r in out)


def test_r8_ops_plan_shapes(spark):
    """Round-8 operator plan pins."""
    from pyspark.sql import functions as F

    from inception_spark.operators.dedup import (
        cdc_chunks,
        scrub_dup_spans,
        snapshot_diff,
        substring_dup_spans,
    )
    from inception_spark.operators.pca import pca_power_project
    from inception_spark.operators.profile import profile_table
    from inception_spark.plans.skew import join_skew_report

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    events = spark.read.parquet(f"{SF}/events.parquet")

    # power-iteration projection: MAP-ONLY — the returned plan has no
    # exchange, no Python, no explode; the fit's jobs ran at build time
    p = plan_of(pca_power_project(emb))
    assert "Exchange" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "Generate" not in p

    # CDC chunking: one explode + per-doc window + aggregate, no Python
    p = plan_of(cdc_chunks(docs))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "CartesianProduct" not in p

    # scrub: the span filter is an ANTI join, never a rescan/cartesian
    p = plan_of(scrub_dup_spans(docs, substring_dup_spans(docs)))
    assert "CartesianProduct" not in p
    assert "LeftAnti" in p

    # snapshot diff: ONE full-outer join, hashes projected pre-shuffle
    p = plan_of(snapshot_diff(docs, docs.filter("doc_id % 2 = 0")))
    assert p.count("SortMergeJoin") + p.count("ShuffledHashJoin") <= 1
    assert "FullOuter" in p

    # skew report: count aggregates partial-combine map-side; the 1-row
    # total broadcasts; top-k is distributed (TakeOrderedAndProject)
    p = plan_of(
        join_skew_report(
            events, orders, key_left="user_id", key_right="o_custkey"
        )
    )
    assert "partial_count" in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert "TakeOrderedAndProject" in p

    # profiler exact mode: ONE scan
    p = plan_of(
        profile_table(
            orders,
            numeric_cols=["o_orderkey"],
            string_cols=["o_orderstatus"],
        )
    )
    assert p.count("FileScan") == 1


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Bucketed catalog tables with matching bucket counts join with
    ZERO Exchange operators — the whole point of paying the bucket
    shuffle at write time.  colocated_join also self-asserts this, so
    the test doubles as a check that the assert sees the real plan."""
    from inception_spark.operators.layout import (
        colocated_join,
        write_bucketed_table,
    )

    orders = spark.read.parquet(SF + "/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    li = spark.read.parquet(SF + "/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    write_bucketed_table(
        spark, orders, "o_orderkey", "t_bkt_orders", str(tmp_path / "o")
    )
    write_bucketed_table(
        spark, li, "l_orderkey", "t_bkt_li", str(tmp_path / "l")
    )
    j = colocated_join(
        spark, "t_bkt_li", "t_bkt_orders", "l_orderkey", "o_orderkey"
    )
    p = plan_of(j)
    assert "SortMergeJoin" in p
    assert "Exchange" not in p
    # result parity with the plain (shuffled) join
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
    assert sorted(map(tuple, j.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # bucket-count mismatch must fail loudly, not silently shuffle
    write_bucketed_table(
        spark, orders, "o_orderkey", "t_bkt_o4", str(tmp_path / "o4"),
        n_buckets=4,
    )
    import pytest as _pytest

    # RuntimeError, not assert: the guard must survive python -O
    with _pytest.raises(RuntimeError, match="not co-located"):
        colocated_join(
            spark, "t_bkt_li", "t_bkt_o4", "l_orderkey", "o_orderkey"
        )
    # the post-execution re-check must have inspected the COMMITTED
    # final adaptive plan, not the unfinalized initial one (the r9
    # ADVICE no-op: head(1) ran a separate limit query and left
    # isFinalPlan=false on the join's own QueryExecution)
    final = j._jdf.queryExecution().executedPlan().toString()
    if "AdaptiveSparkPlan" in final:
        assert "isFinalPlan=true" in final


def test_colocated_join_verify_knob(spark, tmp_path):
    """The AQE final-plan check costs one partition execution per call
    (r10: +78% on the bench join when paid every time), so it is gated:
    verify="once" memoizes a passed (tables, keys) check and later calls
    run the free static check only; "always" re-touches; "never" skips.
    The static zero-Exchange check runs in every mode."""
    import pytest as _pytest

    from inception_spark.operators import layout as L

    orders = spark.read.parquet(SF + "/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    li = spark.read.parquet(SF + "/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    L.write_bucketed_table(
        spark, orders, "o_orderkey", "t_vk_orders", str(tmp_path / "o")
    )
    L.write_bucketed_table(
        spark, li, "l_orderkey", "t_vk_li", str(tmp_path / "l")
    )
    key = ("t_vk_li", "t_vk_orders", "l_orderkey", "o_orderkey")
    L._VERIFIED_COLOCATED.discard(key)

    with _pytest.raises(ValueError, match="always|once|never"):
        L.colocated_join(spark, *key, verify="sometimes")

    # first "once" call pays the touch and memoizes
    j1 = L.colocated_join(spark, *key, verify="once")
    assert key in L._VERIFIED_COLOCATED
    p1 = j1._jdf.queryExecution().executedPlan().toString()
    if "AdaptiveSparkPlan" in p1:
        assert "isFinalPlan=true" in p1
    # second "once" call skips the touch: its OWN adaptive plan stays
    # unfinalized because nothing executed
    j2 = L.colocated_join(spark, *key, verify="once")
    p2 = j2._jdf.queryExecution().executedPlan().toString()
    if "AdaptiveSparkPlan" in p2:
        assert "isFinalPlan=true" not in p2
    # "always" re-touches even though the memo holds the key
    j3 = L.colocated_join(spark, *key, verify="always")
    p3 = j3._jdf.queryExecution().executedPlan().toString()
    if "AdaptiveSparkPlan" in p3:
        assert "isFinalPlan=true" in p3
    # "never" skips the touch but the static guard still fires on a
    # genuine layout regression
    j4 = L.colocated_join(spark, *key, verify="never")
    p4 = j4._jdf.queryExecution().executedPlan().toString()
    if "AdaptiveSparkPlan" in p4:
        assert "isFinalPlan=true" not in p4
    L.write_bucketed_table(
        spark, orders, "o_orderkey", "t_vk_o4", str(tmp_path / "o4"),
        n_buckets=4,
    )
    with _pytest.raises(RuntimeError, match="not co-located"):
        L.colocated_join(
            spark, "t_vk_li", "t_vk_o4", "l_orderkey", "o_orderkey",
            verify="never",
        )


def test_events_ewma_matches_truncated_recursion(spark, tmp_path):
    """The integer-weight window form equals the literal truncated
    EWMA recursion y_t = Σ w_j v_{t-j} / Σ w_j computed in Python,
    including the partial frames at the start of the series."""
    import pandas as pd

    from inception_spark.plans.relational import (
        EWMA_WEIGHTS,
        events_ewma,
    )

    vals = [10.0, 20.0, 5.0, 5.0, 80.0, 1.0, 2.0, 3.0, 4.0, 100.0]
    rows = pd.DataFrame(
        {
            "event_id": list(range(1, 11)),
            "ts": pd.to_datetime(
                [f"2024-01-01 00:{m:02d}:00" for m in range(10)]
            ),
            "user_id": [7] * 10,
            "event_type": ["a"] * 10,
            "value": vals,
            "props": ["{}"] * 10,
        }
    )
    rows.to_parquet(str(tmp_path / "events.parquet"))
    got = {
        r["event_id"]: r["ewma"]
        for r in events_ewma(spark, str(tmp_path)).collect()
    }
    for t in range(len(vals)):
        terms = [
            (wt, vals[t - j])
            for j, wt in enumerate(EWMA_WEIGHTS)
            if t - j >= 0
        ]
        expect = round(
            sum(w * v for w, v in terms) / sum(w for w, _ in terms), 6
        )
        assert abs(got[t + 1] - expect) < 1e-9, (t, got[t + 1], expect)
    # newest sample dominates: weight ratio w0 / sum = 16384/~54k
    assert got[10] > 30  # the 100.0 at t=9 pulls hard immediately


def test_events_robust_anomaly_resists_masking(spark, tmp_path):
    """The case MAD exists for: one colossal outlier inflates the std
    enough to mask a second, smaller outlier from the z-score rule, but
    median/MAD flags both."""
    import pandas as pd

    from inception_spark.plans.relational import (
        events_anomaly,
        events_robust_anomaly,
    )

    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.0, 11.0, 9.0, 10.0, 10.5,
            9.5, 10.0, 200.0, 40.0]
    rows = pd.DataFrame(
        {
            "event_id": list(range(1, len(vals) + 1)),
            "ts": pd.to_datetime(
                [f"2024-01-01 00:{m:02d}:00" for m in range(len(vals))]
            ),
            "user_id": [1] * len(vals),
            "event_type": ["a"] * len(vals),
            "value": vals,
            "props": ["{}"] * len(vals),
        }
    )
    rows.to_parquet(str(tmp_path / "events.parquet"))
    # rate=1.0: thresholds from the full (tiny) fixture
    robust = {
        r["event_id"]
        for r in events_robust_anomaly(
            spark, str(tmp_path), rate=1.0
        ).collect()
    }
    classic = {
        r["event_id"] for r in events_anomaly(spark, str(tmp_path)).collect()
    }
    assert 13 in robust and 14 in robust     # both outliers flagged
    assert 14 not in classic                 # masked by the 200.0


def test_session_paths_truncation_and_order(spark, tmp_path):
    """Path strings follow event order within the session, sessions
    split at the 30-min gap, and journeys longer than max_steps get
    the '>…' marker so they never collide with complete paths."""
    import pandas as pd

    from inception_spark.plans.relational import session_paths

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    # user 1, session 1: a -> b -> c (complete)
    for i, et in enumerate(["a", "b", "c"]):
        rows.append((i + 1, t0 + pd.Timedelta(minutes=i), 1, et))
    # user 1, session 2 (90 min later): a -> b (prefix of session 1!)
    for i, et in enumerate(["a", "b"]):
        rows.append((10 + i, t0 + pd.Timedelta(minutes=90 + i), 1, et))
    # user 2: 4 steps with max_steps=3 -> truncated marker
    for i, et in enumerate(["a", "b", "c", "d"]):
        rows.append((20 + i, t0 + pd.Timedelta(minutes=i), 2, et))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type"])
    df["value"] = 1.0
    df["props"] = "{}"
    df.to_parquet(str(tmp_path / "events.parquet"))
    got = {
        r["path"]: r["n_sessions"]
        for r in session_paths(
            spark, str(tmp_path), max_steps=3, top_k=10
        ).collect()
    }
    assert got == {"a>b>c": 1, "a>b": 1, "a>b>c>…": 1}


def test_window_funnel_restart_and_window_bound(spark, tmp_path):
    """The two cases first-occurrence funnels get wrong: (a) a stale
    first anchor is rescued by a later restart inside the window;
    (b) a conversion outside the window does not count."""
    import pandas as pd

    from inception_spark.plans.relational import window_funnel

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        # user 1: signup day0, click day30 (outside 7d of anchor 1),
        # but a SECOND signup day28 makes a valid chain -> level 2
        (1, t0, 1, "signup"),
        (2, t0 + pd.Timedelta(days=28), 1, "signup"),
        (3, t0 + pd.Timedelta(days=30), 1, "click"),
        # user 2: signup then click 10 days later, no restart -> level 1
        (4, t0, 2, "signup"),
        (5, t0 + pd.Timedelta(days=10), 2, "click"),
        # user 3: full chain inside the window -> level 2
        (6, t0, 3, "signup"),
        (7, t0 + pd.Timedelta(days=1), 3, "click"),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type"])
    df["value"] = 1.0
    df["props"] = "{}"
    df.to_parquet(str(tmp_path / "events.parquet"))
    got = {
        r["level"]: r["n_users"]
        for r in window_funnel(
            spark, str(tmp_path), steps=("signup", "click"),
            window_days=7,
        ).collect()
    }
    assert got == {1: 3, 2: 2}


def test_pareto_frontier_dominance_semantics(spark):
    """Hand case: equal-y higher-x dominates; interior points drop;
    the max-x point always survives."""
    from inception_spark.plans.relational import pareto_frontier

    pts = [(1, 5.0), (2, 3.0), (3, 3.0), (3, 9.0), (4, 7.0), (5, 8.0)]
    df = spark.createDataFrame(pts, "x int, y double")
    got = sorted(
        map(tuple, pareto_frontier(df, max_col="x", min_col="y").collect())
    )
    # x=2 (y=3) dominated by x=3 y=3 (same y, more x); x=4 y=7 beats
    # x=5 y=8 on y, so both stay; x=1 y=5 dominated by x=3 y=3
    assert got == [(3, 3.0), (4, 7.0), (5, 8.0)]
    # brute-force cross-check
    def dominated(p, q):
        return (q[0] >= p[0] and q[1] <= p[1]) and q != p
    brute = sorted({p for p in pts
                    if not any(dominated(p, q) for q in pts)})
    assert got == brute


def test_psi_detects_planted_drift(spark, tmp_path):
    """PSI flags a distribution that moved between halves and stays
    quiet on one that didn't."""
    import pandas as pd

    from inception_spark.plans.relational import psi_drift_report

    rows = []
    eid = 0
    # type 'stable': uniform-ish values both halves
    # type 'shifted': low values first half, high values second half
    for day in range(1, 31):
        for i in range(20):
            eid += 1
            rows.append((eid, pd.Timestamp(f"2024-01-{day:02d} 12:00:00"),
                         1, "stable", float((i * 25) % 490)))
            eid += 1
            v = 10.0 if day <= 15 else 450.0
            rows.append((eid, pd.Timestamp(f"2024-01-{day:02d} 13:00:00"),
                         1, "shifted", v))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    df["props"] = "{}"
    df.to_parquet(str(tmp_path / "events.parquet"))
    got = {
        r["event_type"]: (r["psi"], r["drifted"])
        for r in psi_drift_report(spark, str(tmp_path)).collect()
    }
    assert got["shifted"][1] is True and got["shifted"][0] > 1.0
    assert got["stable"][1] is False and got["stable"][0] < 0.05


def test_events_seasonal_decomp_identity_and_bump(spark, tmp_path):
    """The three components recompose EXACTLY (1000*n == trend +
    seasonal + residual, an integer identity by construction), and a
    planted hour-of-day bump surfaces as that hour's max seasonal
    component."""
    import pandas as pd

    from inception_spark.plans.relational import events_seasonal_decomp

    rows, eid = [], 0
    for day in range(1, 4):          # 3 full days, hourly
        for h in range(24):
            n = 2 + (6 if h == 12 else 0)
            for _ in range(n):
                eid += 1
                rows.append(
                    (eid, pd.Timestamp(f"2024-01-{day:02d} {h:02d}:30:00"),
                     1, "a", 1.0)
                )
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    df["props"] = "{}"
    df.to_parquet(str(tmp_path / "events.parquet"))

    out = events_seasonal_decomp(spark, str(tmp_path)).collect()
    assert len(out) == 72
    for r in out:
        assert (1000 * r["n_events"]
                == r["trend_milli"] + r["seasonal_milli"]
                + r["residual_milli"]), r
    seas = {}
    for r in out:
        seas[r["hour_ts"].hour] = r["seasonal_milli"]
    assert seas[12] == max(seas.values())
    assert seas[12] > 0 > seas[0]    # bump above trend, troughs below


def test_decayed_heavy_hitters_ranks_and_clamps(spark, tmp_path):
    """Recency beats raw volume per the exact bit-shift weights, and
    events 40 halflives old weigh EXACTLY zero — the regime where a JVM
    int shift would wrap (40 & 31 = 8 -> weight 3906) if the operator
    didn't clamp before shifting."""
    import pandas as pd

    from inception_spark.plans.relational import decayed_heavy_hitters

    rows, eid = [], 0
    # user 1: one event today -> 1_000_000
    # user 2: three events 1 day old -> 3 * 500_000 = 1_500_000 (rank 1)
    # user 3: a hundred events 40 days old -> 0 (clamped, despite volume)
    specs = [(1, "2024-02-10", 1), (2, "2024-02-09", 3),
             (3, "2024-01-01", 100)]
    for uid, day, n in specs:
        for _ in range(n):
            eid += 1
            rows.append((eid, pd.Timestamp(f"{day} 08:00:00"),
                         uid, "a", 1.0))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    df["props"] = "{}"
    df.to_parquet(str(tmp_path / "events.parquet"))

    out = {r["user_id"]: r for r in
           decayed_heavy_hitters(spark, str(tmp_path)).collect()}
    assert out[2]["decayed_micro"] == 1_500_000 and out[2]["rank"] == 1
    assert out[1]["decayed_micro"] == 1_000_000 and out[1]["rank"] == 2
    assert out[3]["decayed_micro"] == 0 and out[3]["n_events"] == 100


def test_events_burst_windows_planted_burst(spark, tmp_path):
    """Steady 2/hour baseline for 48h, then a 3-hour 10/hour burst:
    exactly one interval, spanning exactly the planted hours."""
    import pandas as pd

    from inception_spark.plans.relational import events_burst_windows

    rows, eid = [], 0
    for h in range(72):
        n = 10 if 48 <= h < 51 else 2
        for _ in range(n):
            eid += 1
            rows.append(
                (eid, pd.Timestamp("2024-01-01") + pd.Timedelta(hours=h),
                 1, "a", 1.0)
            )
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    df["props"] = "{}"
    df.to_parquet(str(tmp_path / "events.parquet"))

    out = events_burst_windows(spark, str(tmp_path)).collect()
    assert len(out) == 1, out
    b = out[0]
    assert b["burst_start"] == pd.Timestamp("2024-01-03 00:00:00")
    assert b["burst_end"] == pd.Timestamp("2024-01-03 02:00:00")
    assert b["n_hours"] == 3 and b["peak_events"] == 10
    assert b["total_events"] == 30


def test_growth_accounting_statuses_and_identity(spark, tmp_path):
    """Planted lifecycle: user 1 active days 1-3 (new, retained x2);
    user 2 active day 1 and day 3 (new, then resurrected, churned on
    day 2); both absent day 4 is outside the window (max day = 3)."""
    import pandas as pd

    from inception_spark.plans.relational import growth_accounting

    rows = [
        (1, "2024-01-01", 1), (2, "2024-01-02", 1), (3, "2024-01-03", 1),
        (4, "2024-01-01", 2), (5, "2024-01-03", 2),
    ]
    df = pd.DataFrame(
        [
            (eid, pd.Timestamp(f"{d} 10:00:00"), uid, "a", 1.0)
            for eid, d, uid in rows
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    df["props"] = "{}"
    df.to_parquet(str(tmp_path / "events.parquet"))

    got = {
        str(r["day"]): r
        for r in growth_accounting(spark, str(tmp_path)).collect()
    }
    d1, d2, d3 = got["2024-01-01"], got["2024-01-02"], got["2024-01-03"]
    assert d1["n_new"] == 2 and d1["n_active"] == 2
    assert d2["n_active"] == 1 and d2["n_retained"] == 1
    assert d2["n_churned"] == 1                      # user 2 left
    assert d3["n_retained"] == 1 and d3["n_resurrected"] == 1
    for r in got.values():
        assert r["n_active"] == r["n_new"] + r["n_retained"] + r[
            "n_resurrected"
        ]


def test_user_survival_curve_km_by_hand(spark, tmp_path):
    """4 users: durations 1h, 1h, 2h (churned) and one censored at the
    max day.  KM: S(1) = 3/4 over... n_at_risk(1)=4, d=2 -> ln(1/2);
    n_at_risk(2)=2, d=1 -> + ln(1/2)."""
    import math

    import pandas as pd

    from inception_spark.plans.relational import user_survival_curve

    rows = [
        # (user, first, last) — churned users end before the max day
        (1, "2024-01-01 08:00", "2024-01-01 09:30"),   # 1 hour-crossing
        (2, "2024-01-01 10:15", "2024-01-01 11:20"),   # 1
        (3, "2024-01-01 08:00", "2024-01-01 10:10"),   # 2
        (4, "2024-01-01 08:00", "2024-01-02 08:00"),   # censored (max day)
    ]
    recs, eid = [], 0
    for uid, f, l in rows:
        for t in (f, l):
            eid += 1
            recs.append((eid, pd.Timestamp(t), uid, "a", 1.0))
    df = pd.DataFrame(recs, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    df["props"] = "{}"
    df.to_parquet(str(tmp_path / "events.parquet"))

    got = {r["duration"]: r for r in
           user_survival_curve(spark, str(tmp_path)).collect()}
    assert set(got) == {1, 2}
    assert got[1]["n_at_risk"] == 4 and got[1]["n_events"] == 2
    assert got[2]["n_at_risk"] == 2 and got[2]["n_events"] == 1
    assert abs(got[1]["log_survival"] - round(math.log(0.5), 6)) < 1e-9
    assert abs(got[2]["log_survival"]
               - 2 * round(math.log(0.5), 6)) < 1e-9


def test_events_ohlc_tie_breaks_and_volume(spark, tmp_path):
    """Duplicate timestamps inside the hour: open/close break ties on
    event_id; volume is the exact decimal sum."""
    import pandas as pd

    from inception_spark.plans.relational import events_ohlc

    t = pd.Timestamp("2024-01-01 10:00:00")
    rows = [
        (2, t, 1, "a", 5.0),                    # same ts as eid 1
        (1, t, 1, "a", 3.0),                    # open (lowest eid)
        (3, t + pd.Timedelta(minutes=30), 1, "a", 9.0),   # high
        (5, t + pd.Timedelta(minutes=59), 1, "a", 4.0),   # close
        (4, t + pd.Timedelta(minutes=59), 1, "a", 1.0),   # low, not close
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    df["props"] = "{}"
    df.to_parquet(str(tmp_path / "events.parquet"))

    out = events_ohlc(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["open"] == 3.0 and r["close"] == 4.0
    assert r["high"] == 9.0 and r["low"] == 1.0
    assert r["n_events"] == 5 and r["volume"] == 22.0


def test_ab_sprt_curve_crosses_h1(spark, tmp_path):
    """A treatment arm converting at 100% daily drives the LLR up by
    n*ln(p1/p0) per day and crosses the H1 boundary."""
    import math

    import pandas as pd

    from inception_spark.plans.relational import ab_sprt_curve

    rows, eid = [], 0
    for d in range(1, 11):
        for uid in (1, 3, 5, 7):       # odd ids = treatment arm
            eid += 1
            rows.append((eid, pd.Timestamp(f"2024-01-{d:02d} 09:00:00"),
                         uid, "purchase", 1.0))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    df["props"] = "{}"
    df.to_parquet(str(tmp_path / "events.parquet"))

    out = sorted(ab_sprt_curve(spark, str(tmp_path)).collect(),
                 key=lambda r: r["day"])
    la = round(math.log(0.05 / 0.04), 6)
    assert abs(out[0]["cum_llr"] - 4 * la) < 1e-9
    assert abs(out[-1]["cum_llr"] - 40 * la) < 1e-9
    hi = round(math.log(0.8 / 0.05), 6)
    crossed = [r for r in out if r["cum_llr"] >= hi]
    assert crossed and all(r["decision"] == "accept_h1" for r in crossed)
    assert out[0]["decision"] == "continue"


def test_cohort_ltv_triangle_by_hand(spark, tmp_path):
    """Two-user day-1 cohort: ages 0 and 1 accumulate value / 2 (fixed
    denominator even though only one user is active at age 1)."""
    import pandas as pd

    from inception_spark.plans.relational import cohort_ltv

    rows = [
        (1, "2024-01-01 08:00", 1, 10.0),
        (2, "2024-01-01 09:00", 2, 20.0),
        (3, "2024-01-02 08:00", 1, 6.0),
    ]
    df = pd.DataFrame(
        [(eid, pd.Timestamp(t), uid, "a", v) for eid, t, uid, v in rows],
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    df["props"] = "{}"
    df.to_parquet(str(tmp_path / "events.parquet"))

    got = {r["age"]: r for r in cohort_ltv(spark, str(tmp_path)).collect()}
    assert got[0]["cohort_size"] == 2 and got[0]["n_active"] == 2
    assert got[0]["cum_value_per_user"] == 15.0
    assert got[1]["n_active"] == 1
    assert got[1]["cum_value_per_user"] == 18.0    # (30 + 6) / 2


def test_ohlc_is_one_exchange_no_window_sort(spark, sf_dir):
    """The struct-pick refactor's contract: candlesticks cost ONE
    shuffle (the group key), with no row_number window pass."""
    from inception_spark.plans.relational import events_ohlc

    p = plan_of(events_ohlc(spark, sf_dir))
    assert p.count("Exchange") == 1, p
    assert "Window" not in p, p


def test_fd_profile_is_one_expand_scan(spark, sf_dir):
    """All 16 exact distinct counts ride ONE Expand pass over a single
    scan — no per-pair rescan."""
    from inception_spark.operators.profile import fd_profile
    from inception_spark.plans.relational import load

    p = plan_of(fd_profile(
        load(spark, sf_dir, "orders"),
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
    ))
    assert p.count("Expand") == 1, p
    assert p.count("Scan parquet") == 1, p


def test_events_forecast_snaive_by_hand(spark, tmp_path):
    """Two observed days: day1 hour-h count = h+1, day2 = 2*(h+1)
    (daily total doubles -> drift = 1000*24*avg... computed by hand).
    forecast(h) = 1000 * day2[slot] + drift, floored at 0."""
    import pandas as pd

    from inception_spark.plans.relational import events_forecast

    rows, eid = [], 0
    for day, mult in ((1, 1), (2, 2)):
        for h in range(24):
            for _ in range(mult * (h + 1)):
                eid += 1
                rows.append(
                    (eid,
                     pd.Timestamp(f"2024-01-0{day} {h:02d}:00:00"),
                     1, "a", 1.0)
                )
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    df["props"] = "{}"
    df.to_parquet(str(tmp_path / "events.parquet"))

    out = {r["horizon_h"]: r
           for r in events_forecast(spark, str(tmp_path)).collect()}
    assert len(out) == 24
    s1 = 2 * sum(h + 1 for h in range(24))       # last-day total 600
    s0 = sum(h + 1 for h in range(24))           # prev-day total 300
    drift = (1000 * (s1 - s0)) // 24
    # h=1 looks back to slot 23 == day-2 hour 0 (count 2) ... the max
    # hour L is day-2 23:00, so L+h wraps: slot(h) = (24 - h%24) % 24,
    # and last-day counts are n(slot) = 2 * (23 - slot + 1)... verify
    # via two anchors instead of re-deriving the whole closed form:
    # h=24 -> slot 0 -> _back 0 -> hour L (count 2*24)
    assert out[24]["forecast_milli"] == 1000 * 48 + drift
    # h=1 -> slot 23 -> _back 23 -> hour L-23 (count 2*1)
    assert out[1]["forecast_milli"] == 1000 * 2 + drift
    assert out[1]["forecast_hour"] == "2024-01-03 00:00:00"
    assert out[24]["forecast_hour"] == "2024-01-03 23:00:00"


def test_markov_stationary_two_state_symmetric(spark, tmp_path):
    """A strictly alternating a->b->a->... chain has stationary
    (1/2, 1/2): both states land on pi_milli == 500 exactly."""
    import pandas as pd

    from inception_spark.plans.relational import events_markov_stationary

    rows = []
    for i in range(20):
        rows.append((i + 1, pd.Timestamp("2024-01-01") +
                     pd.Timedelta(minutes=i), 1, "ab"[i % 2], 1.0))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    df["props"] = "{}"
    df.to_parquet(str(tmp_path / "events.parquet"))

    got = {r["event_type"]: r for r in
           events_markov_stationary(spark, str(tmp_path)).collect()}
    assert set(got) == {"a", "b"}
    assert got["a"]["pi_milli"] == 500
    assert got["b"]["pi_milli"] == 500
    assert got["a"]["pi_nano"] == got["b"]["pi_nano"]


def test_ks_drift_detects_planted_shift(spark, tmp_path):
    """Type 'shifted' doubles its values in the late half -> large KS;
    type 'stable' keeps one distribution -> small KS."""
    import pandas as pd

    from inception_spark.plans.relational import events_ks_drift

    rows, eid = [], 0
    for day in range(1, 21):
        late = day > 10
        for i in range(10):
            eid += 1
            rows.append((eid, pd.Timestamp(f"2024-01-{day:02d} 10:00:00"),
                         1, "stable", float(i)))
            eid += 1
            v = float(i) + (100.0 if late else 0.0)
            rows.append((eid, pd.Timestamp(f"2024-01-{day:02d} 11:00:00"),
                         1, "shifted", v))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    df["props"] = "{}"
    df.to_parquet(str(tmp_path / "events.parquet"))

    got = {r["event_type"]: r
           for r in events_ks_drift(spark, str(tmp_path)).collect()}
    assert got["shifted"]["drifted"] is True
    assert got["shifted"]["ks_milli"] == 1000   # disjoint supports
    assert got["stable"]["drifted"] is False
    assert got["stable"]["ks_milli"] < 100


def test_revenue_gini_extremes(spark, tmp_path):
    """Perfectly equal revenues -> gini ~0 (exactly (n-1 terms) small);
    one customer holding everything -> gini -> (n-1)/n."""
    import pandas as pd

    orders = pd.DataFrame({
        "o_orderkey": range(1, 9),
        "o_custkey": [1, 2, 3, 4, 5, 6, 7, 8],
        "o_orderstatus": ["F"] * 8,
        "o_totalprice": [100.0] * 4 + [0.01, 0.01, 0.01, 400.0],
        "o_orderdate": pd.to_datetime(["2024-01-01"] * 8).date,
        "o_orderpriority": ["1-URGENT"] * 8,
    })
    cust = pd.DataFrame({
        "c_custkey": range(1, 9),
        "c_name": [f"c{i}" for i in range(1, 9)],
        "c_nationkey": [0] * 8,
        "c_mktsegment": ["EQ"] * 4 + ["SKEW"] * 4,
        "c_acctbal": [0.0] * 8,
    })
    orders.to_parquet(str(tmp_path / "orders.parquet"))
    cust.to_parquet(str(tmp_path / "customer.parquet"))

    from inception_spark.plans.relational import revenue_gini

    got = {r["segment"]: r
           for r in revenue_gini(spark, str(tmp_path)).collect()}
    assert got["EQ"]["gini_milli"] == 0          # perfect equality
    assert got["SKEW"]["gini_milli"] > 700       # near-total concentration


def test_purchase_attribution_segments(spark, tmp_path):
    """signup -> view -> purchase -> click -> purchase -> purchase:
    first conversion attributes first=signup last=view; the second
    first=last=click; the third (no touch since) is 'direct'."""
    import pandas as pd

    from inception_spark.plans.relational import purchase_attribution

    types = ["signup", "view", "purchase", "click", "purchase",
             "purchase"]
    rows = [
        (i + 1, pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
         1, t, 1.0)
        for i, t in enumerate(types)
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    df["props"] = "{}"
    df.to_parquet(str(tmp_path / "events.parquet"))

    got = {r["touch_type"]: r
           for r in purchase_attribution(spark, str(tmp_path)).collect()}
    assert got["signup"]["n_first_touch"] == 1
    assert got["signup"]["n_last_touch"] == 0
    assert got["view"]["n_last_touch"] == 1
    assert got["click"]["n_first_touch"] == 1
    assert got["click"]["n_last_touch"] == 1
    assert got["direct"]["n_first_touch"] == 1
    assert got["direct"]["n_last_touch"] == 1


def test_forecast_conformal_bands(spark):
    """Split-conformal bands: the order-statistic index follows
    ceil((1-alpha)(n+1)); on a planted 2-day series with constant
    per-slot gap g the 80% q is exactly g, bands are forecast ± 1000g
    clamped at 0, and every interval contains the point forecast."""
    import datetime

    from inception_spark.plans.relational import (
        _conformal_k,
        burst_hourly_partials,
        forecast_conformal_from_hourly,
    )

    assert _conformal_k(200) == 20   # ceil(0.8 * 25)
    assert _conformal_k(50) == 24    # ceil(0.95 * 25) = 23.75 -> 24
    assert _conformal_k(500) == 13
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _conformal_k(0)

    # two full days: day -2 has 3 events/hour, day -1 has 5 -> every
    # slot residual is exactly 2
    t0 = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for day, per_hour in ((0, 3), (1, 5)):
        for h in range(24):
            for i in range(per_hour):
                eid += 1
                rows.append(
                    (eid, t0 + datetime.timedelta(days=day, hours=h,
                                                  minutes=i), 1, "view",
                     1.0, "{}")
                )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = forecast_conformal_from_hourly(
        burst_hourly_partials(ev), horizon=6
    ).collect()
    assert len(out) == 6
    for r in out:
        assert r["q_milli"] == 2000
        assert r["lo_milli"] == max(0, r["forecast_milli"] - 2000)
        assert r["hi_milli"] == r["forecast_milli"] + 2000
        assert r["lo_milli"] <= r["forecast_milli"] <= r["hi_milli"]


def test_media_synth_prunes_to_doc_id_and_probe_stays_jvm(spark):
    """The multimodal stats plans: column pruning must reach the scan
    through the mapInPandas synthesis (only doc_id read — the text
    column never leaves parquet), the synthesis is the ONLY Python
    crossing (Arrow-batched), and the header probe / aggregate side has
    no row-at-a-time Python anywhere."""
    from inception_spark.operators.multimodal import media_meta_stats

    docs = spark.read.parquet(SF + "/documents.parquet")
    p = plan_of(media_meta_stats(docs))
    assert "ReadSchema: struct<doc_id:bigint>" in p
    assert p.count("MapInPandas") == 1
    assert "BatchEvalPython" not in p


def test_vocab_zipf_plan_is_jvm_only_and_prunes(spark):
    """The Zipf fit is pure Catalyst: no Python evaluation node at all,
    and the scan reads only the text column."""
    from inception_spark.functions.text_analysis import vocab_zipf_fit

    docs = spark.read.parquet(SF + "/documents.parquet")
    p = plan_of(vocab_zipf_fit(docs))
    assert "ReadSchema: struct<text:string>" in p
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in p


def test_packing_efficiency_single_scan_jvm_only(spark):
    """The context-length report fans out over candidate budgets from
    ONE corpus scan (no per-L rescan) and stays JVM-side."""
    from inception_spark.operators.packing import (
        packing_efficiency_report,
    )

    docs = spark.read.parquet(SF + "/documents.parquet")
    p = plan_of(packing_efficiency_report(docs, budgets=(512, 2048)))
    # one scan for the per-doc stats + one for the partition totals —
    # never one per candidate budget
    assert p.count("FileScan") <= 2
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in p


def test_item_item_cosine_recs_hand_check(spark, tmp_path):
    """Known baskets → known cosines, and the heavy-basket guard
    excludes an oversized order from counts AND norms."""
    import pandas as pd

    from inception_spark.plans.relational import item_item_cosine_recs

    # baskets: {1,2} x3, {1,3} x1, {2,3} x1, plus one oversized basket
    # (items 1..5) that must be dropped by max_basket=4
    rows = []
    ok = 0
    for _ in range(3):
        ok += 1
        rows += [(ok, 1), (ok, 2)]
    ok += 1
    rows += [(ok, 1), (ok, 3)]
    ok += 1
    rows += [(ok, 2), (ok, 3)]
    ok += 1
    rows += [(ok, p) for p in (1, 2, 3, 4, 5)]
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    for c in ["l_suppkey", "l_linenumber", "l_quantity", "l_extendedprice",
              "l_discount", "l_tax"]:
        df[c] = 1
    df["l_returnflag"] = "N"
    df["l_linestatus"] = "O"
    df["l_shipdate"] = pd.Timestamp("2024-01-01")
    df.to_parquet(str(tmp_path / "lineitem.parquet"))

    got = {
        (r["item"], r["rec"]): (r["cooc"], r["cosine"], r["rank"])
        for r in item_item_cosine_recs(
            spark, str(tmp_path), min_cooc=1, k=5, max_basket=4
        ).collect()
    }
    # without the oversized basket: n1=4, n2=4, n3=2
    # cooc(1,2)=3 -> 3/sqrt(16)=0.75; cooc(1,3)=1 -> 1/sqrt(8);
    # cooc(2,3)=1 -> 1/sqrt(8)
    import math
    s13 = round(1 / math.sqrt(8), 6)
    assert got[(1, 2)] == (3, 0.75, 1) and got[(2, 1)] == (3, 0.75, 1)
    assert got[(1, 3)] == (1, s13, 2) and got[(3, 1)] == (1, s13, 1)
    assert got[(2, 3)] == (1, s13, 2) and got[(3, 2)] == (1, s13, 2)
    # items 4/5 appear ONLY in the dropped basket -> no rows at all
    assert not any(it in (4, 5) or rec in (4, 5) for it, rec in got)


def test_wasserstein_drift_closed_forms(spark, tmp_path):
    """W1 on planted fixtures: a pure location shift of delta scores
    exactly delta; identical halves score exactly 0 (the property that
    separates W1 from KS, which saturates at any full separation)."""
    import pandas as pd

    from inception_spark.plans.relational import events_wasserstein_drift

    rows = []
    eid = 0
    for day in range(1, 31):
        new = day > 15
        for i in range(10):
            eid += 1
            # 'shifted': uniform grid, second half moved up by exactly 7
            v = float(i * 3) + (7.0 if new else 0.0)
            rows.append((eid, pd.Timestamp(f"2024-01-{day:02d} 12:00:00"),
                         1, "shifted", v))
            eid += 1
            rows.append((eid, pd.Timestamp(f"2024-01-{day:02d} 13:00:00"),
                         1, "same", float(i * 5)))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    df["props"] = "{}"
    df.to_parquet(str(tmp_path / "events.parquet"))
    got = {
        r["event_type"]: (r["w1"], r["n_old"], r["n_new"])
        for r in events_wasserstein_drift(spark, str(tmp_path)).collect()
    }
    assert got["same"] == (0.0, 150, 150)
    assert got["shifted"] == (7.0, 150, 150)


def test_funnel_latency_planted(spark, tmp_path):
    """Planted funnel timings → exact known percentiles: three users
    convert signup>click at 10/20/30 s (p50 = 20, p90 interpolates),
    one converts click>purchase at 60 s; a user who clicked BEFORE
    signing up does not count."""
    import pandas as pd

    from inception_spark.plans.relational import funnel_latency

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    eid = 0
    def add(u, et, sec):
        nonlocal eid
        eid += 1
        rows.append((eid, base + pd.Timedelta(seconds=sec), u, et, 1.0))
    for u, gap in ((1, 10), (2, 20), (3, 30)):
        add(u, "signup", 0)
        add(u, "click", gap)
    add(1, "purchase", 70)        # 10 + 60
    add(4, "click", 0)            # clicked before signup -> no convert
    add(4, "signup", 5)
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    df["props"] = "{}"
    df.to_parquet(str(tmp_path / "events.parquet"))
    got = {r["step_pair"]: (r["n_converted"], r["p50_s"], r["p90_s"],
                            r["max_s"])
           for r in funnel_latency(spark, str(tmp_path)).collect()}
    assert got["signup>click"] == (3, 20.0, 28.0, 30.0)
    assert got["click>purchase"] == (1, 60.0, 60.0, 60.0)


def test_item_item_recs_plan_shapes(spark):
    """Basket CF: equi-joins only (never cartesian), the per-item rank
    window partitioned by item (never a global window sort)."""
    from inception_spark.plans.relational import item_item_cosine_recs

    p = plan_of(item_item_cosine_recs(spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # window sorts carry the partition key — a global rank would sort
    # on [_s, rec] with no leading item key
    import re
    for mname in re.findall(r"Sort \[([^\]]*)\]", p):
        if "_s" in mname:
            assert "item" in mname.split(",")[0]


def test_margin_mine_blocked_plan_has_no_cartesian(spark):
    """With block_on, candidate generation is an equi-join — the
    100 TB contract (the cross-join form is the warned opt-in)."""
    from pyspark.sql import functions as F

    from inception_spark.operators.similarity import margin_mine_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = emb.filter("vec_id % 2 = 0").selectExpr(
        "vec_id AS a_id", "embedding AS a_vec", "label AS a_blk"
    )
    b = emb.filter("vec_id % 2 <> 0").selectExpr(
        "vec_id AS b_id", "embedding AS b_vec", "label AS b_blk"
    )
    out = margin_mine_pairs(a, b, k=4, block_on=("a_blk", "b_blk"))
    p = plan_of(out)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_wasserstein_single_spine_window(spark):
    """W1 runs ONE cumulative pass over the (type, value) spine — the
    windows are all partitioned by event_type, and no cartesian or
    nested-loop join appears."""
    from inception_spark.plans.relational import events_wasserstein_drift

    p = plan_of(events_wasserstein_drift(spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Window" in p


def test_image_phash_dedup_plan_shape(spark):
    """The engineered-codeword image-dedup entry: no cartesian product
    anywhere (the self-join is an equi-join on band keys), and exactly
    the designed Python crossings — synthesis + hash (2 mapInPandas);
    banding/verify/rollup stay JVM-side."""
    from inception_spark.operators.multimodal import (
        image_phash_dedup_stats,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = image_phash_dedup_stats(docs)
    p = plan_of(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # the band table is localCheckpoint-cut before the self-join, so the
    # synth+hash pipeline appears ONCE even though both join sides read
    # it (without the cut the decode pass evaluates twice);
    # the cut materializes lazily, so the pre-action plan shows the
    # subtree on one side only — count crossings after forcing it
    df.write.format("noop").mode("overwrite").save()
    p2 = plan_of(df)
    assert p2.count("MapInPandas") <= 2  # synth + phash, at most once each


def test_container_ingest_plans_single_python_pass(spark):
    """Each container entry crosses Python exactly twice (applyInPandas
    synthesis, mapInPandas walk) and shuffles only on the shard key —
    the whole decode is one scan, no joins at all."""
    from inception_spark.sources.avrocontainer import avro_ingest_stats
    from inception_spark.sources.sqliteshard import sqlite_ingest_stats
    from inception_spark.sources.tfrecord import tfrecord_ingest_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for fn in (avro_ingest_stats, tfrecord_ingest_stats,
               sqlite_ingest_stats):
        p = plan_of(fn(docs))
        assert "Join" not in p, fn.__name__
        assert p.count("MapInPandas") == 1, fn.__name__
        assert p.count("FlatMapGroupsInPandas") == 1, fn.__name__


def test_document_ingest_plans_no_joins(spark):
    """Every r12 document/subtitle/mail/interchange entry is scan-shaped:
    Python crossings exactly as designed, zero joins.  The mapInPandas
    family additionally carries exactly ONE round-robin fan-out exchange
    between the scan and the first Python pass (VERDICT r12 ask 1: a
    consolidated single-file input otherwise runs the per-record pass at
    effective parallelism 1 — measured 19-30 s for the MIME family at
    sf0.1, 4-6 s fanned out); the applyInPandas entries parallelize
    through their group-key hash exchange instead."""
    from inception_spark.sources.arrowipc import arrow_ipc_stats
    from inception_spark.sources.docxtext import (
        doc_format_matrix_stats,
        docx_text_stats,
    )
    from inception_spark.sources.mimemail import (
        mbox_text_stats,
        mime_text_stats,
    )
    from inception_spark.sources.pdftext import pdf_text_stats
    from inception_spark.sources.rtftext import rtf_text_stats
    from inception_spark.sources.subtitles import subtitle_text_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # (fn, n_mapInPandas, n_applyInPandas, n_roundrobin_fanouts)
    shapes = [
        (pdf_text_stats, 2, 0, 1),
        (docx_text_stats, 2, 0, 1),
        (rtf_text_stats, 2, 0, 1),
        (mime_text_stats, 2, 0, 1),
        (lambda d: subtitle_text_stats(d, vtt=False), 2, 0, 1),
        (mbox_text_stats, 1, 1, 1),
        (arrow_ipc_stats, 1, 1, 0),
        (doc_format_matrix_stats, 1, 0, 1),
    ]
    for fn, n_mip, n_fgp, n_rr in shapes:
        p = plan_of(fn(docs))
        name = getattr(fn, "__name__", "subtitle")
        assert "Join" not in p, name
        assert p.count("MapInPandas") == n_mip, name
        assert p.count("FlatMapGroupsInPandas") == n_fgp, name
        assert p.count("RoundRobinPartitioning") == n_rr, name


def test_r13_ingest_plans_scan_shaped(spark):
    """The r13 ingest entries inherit the r12 discipline at birth:
    zero joins, the designed Python crossings, and the fan-out
    exchange ahead of every per-record Python pass (tfexample's
    applyInPandas shard build parallelizes via its group-key hash
    exchange, like arrow_ipc)."""
    from inception_spark.sources.epubtext import epub_text_stats
    from inception_spark.sources.protoexample import tfexample_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    shapes = [
        (epub_text_stats, 2, 0, 1),
        # r13 optimization: the tfexample build went (shard, subshard)
        # sub-sharded — parallelism comes from the groupBy hash
        # exchange (32+ keys), not an upstream RoundRobin fanout
        (tfexample_stats, 1, 1, 0),
    ]
    for fn, n_mip, n_fgp, n_rr in shapes:
        p = plan_of(fn(docs))
        name = fn.__name__
        assert "Join" not in p, name
        assert p.count("MapInPandas") == n_mip, name
        assert p.count("FlatMapGroupsInPandas") == n_fgp, name
        assert p.count("RoundRobinPartitioning") == n_rr, name
    assert "hashpartitioning" in plan_of(tfexample_stats(docs))


def test_dlog_read_plans(spark):
    """dlog read surfaces: the snapshot read is a bare multi-path
    parquet scan (no Python, no joins — replay happens driver-side on
    the KB log); the CDF diff joins touch only rewritten groups and
    carry no Python either."""
    from inception_spark.sources import dlog as D

    table = D.build_orders_dlog(spark, SF)
    p = plan_of(D.read_snapshot(spark, table))
    for marker in ("Join", "MapInPandas", "BatchEvalPython",
                   "FlatMapGroupsInPandas"):
        assert marker not in p
    assert "Scan parquet" in p or "FileScan" in p
    p = plan_of(D.dlog_cdf_rows(spark, table, 1, 3))
    for marker in ("MapInPandas", "BatchEvalPython"):
        assert marker not in p

"""Winnowing fingerprint guarantees + dedup family edge cases."""

from pyspark.sql import functions as F

from inception_spark.operators.dedup import (
    corpus_ngram_topk,
    exact_dedup,
    winnowing_fingerprints,
)


def test_winnowing_shared_run_produces_shared_fingerprint(spark):
    shared = "the quick brown fox jumps over seven lazy sleeping dogs today"
    rows = [
        (1, "intro words here. " + shared + " closing remarks."),
        (2, "totally different opening. " + shared + " and another ending."),
        (3, "no overlap with the others at all in any way whatsoever."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnowing_fingerprints(df).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    # the winnowing guarantee: a shared ≥(window+ngram-1)-word run ⇒
    # at least one shared fingerprint
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3] and by_doc[2] & by_doc[3])


def test_winnowing_deterministic(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, winnowing_fingerprints(df).collect()))
    b = sorted(map(tuple, winnowing_fingerprints(df).collect()))
    assert a == b and len(a) > 0


def test_exact_dedup_finds_planted_duplicates(spark):
    rows = [(1, "Alpha beta gamma."), (2, "alpha  BETA gamma"), (3, "other")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in exact_dedup(df).collect()}
    # case/whitespace/punct-invariant fingerprint groups 1 and 2
    assert out[1]["keeper_id"] == 1 and not out[1]["is_duplicate"]
    assert out[2]["keeper_id"] == 1 and out[2]["is_duplicate"]
    assert out[3]["group_size"] == 1


def test_corpus_ngram_topk_ranks(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = corpus_ngram_topk(df, k=5).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    freqs = [r["doc_freq"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)


def test_connected_components_known_graph(spark):
    from inception_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(1, 9)], "doc_id long")
    # components: {1,2,3,4} (chain), {5,6} (pair), {7}, {8} (singletons)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7, 8: 8}


def test_connected_components_long_chain_converges(spark):
    from inception_spark.operators.dedup import connected_components

    n = 30  # diameter 29 > default propagation per round → tests iteration
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    got = connected_components(nodes, edges, max_iterations=40).collect()
    assert all(r["component_id"] == 0 for r in got)


def test_keep_component_heads(spark):
    from inception_spark.operators.dedup import (
        connected_components,
        keep_component_heads,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 7)], "doc_id long, text string"
    )
    edges = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    comps = connected_components(df.select("doc_id"), edges)
    kept = sorted(r["doc_id"] for r in keep_component_heads(df, comps).collect())
    assert kept == [1, 4, 5, 6]  # 2,3 merged into component 1


def test_corpus_filter_reasons(spark):
    from inception_spark.operators.dedup import corpus_filter

    rows = [
        (1, "the and of to in is that it was for with as on be at by this have not are good long document words here"),
        (2, "the and of to in is that it was for with as on be at by this have not are good long document words here"),  # dup of 1
        (3, "short text"),  # too few words
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["reason"] for r in corpus_filter(df).collect()}
    assert got[1] is None
    assert got[2] == "duplicate"
    assert got[3] == "too_short"


def test_simhash_near_dup_found_and_bucket_cap_drops(spark):
    """Planted near-dup pair is recovered at hamming<=3; identical docs
    flooding one bucket are dropped once the bucket exceeds max_bucket."""
    from inception_spark.operators.dedup import simhash_dup_pairs

    base = ("the quick brown fox jumps over the lazy dog while seven "
            "judges review twelve appellate briefs before noon recess ") * 10
    rows = [(1, base), (2, base + " extra"), (3, "entirely unrelated words "
            "about cooking pasta sauce with garlic tomatoes and basil")]
    # a hot clique: 8 identical docs → every band bucket holds all 8
    rows += [(100 + i, "identical boilerplate footer text repeated")
             for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = simhash_dup_pairs(df, max_hamming=3, max_bucket=1000).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in uncapped}
    assert (1, 2) in pairs                      # planted near-dup recovered
    assert (100, 101) in pairs                  # clique present uncapped
    assert not any(a in (1, 2) and b == 3 for a, b in pairs)

    capped = simhash_dup_pairs(df, max_hamming=3, max_bucket=5).collect()
    cpairs = {(r["doc_a"], r["doc_b"]) for r in capped}
    assert (1, 2) in cpairs                     # small buckets untouched
    assert not any(a >= 100 for a, _ in cpairs)  # hot bucket dropped


def test_simhash_heuristic_recall_warns(spark):
    import warnings

    from inception_spark.operators.dedup import simhash_dup_pairs

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        simhash_dup_pairs(df, max_hamming=8)
        assert any("guarantees recall" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        simhash_dup_pairs(df, max_hamming=3)
        assert not w


def test_embedding_dup_pairs_hot_block_grid_exact(spark):
    """A block larger than max_block goes through the chunk-pair grid
    decomposition; results must be bit-identical to the single-group
    path, and no grid task ever holds more than 2*chunk vectors."""
    from inception_spark.operators.dedup import embedding_dup_pairs

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        # one pathological hot block: every vector shares a label
        .withColumn("label", F.lit(0))
    )
    whole = embedding_dup_pairs(emb, threshold=0.2)          # single group
    grid = embedding_dup_pairs(
        emb, threshold=0.2, max_block=16, chunk=7            # forced grid
    )
    a = sorted(map(tuple, whole.collect()))
    b = sorted(map(tuple, grid.collect()))
    assert a == b and len(a) > 0


def test_lsh_hot_bucket_cap_and_observation(spark):
    """Buckets above max_bucket are dropped before the self-join (the
    boilerplate-clique skew bomb); the Observation reports how many band
    rows sat in dropped buckets."""
    from pyspark.sql import Observation

    from inception_spark.operators.dedup import lsh_candidate_pairs

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo ") * 3
    rows = [(1, base), (2, base + " sierra tango")]
    # 12 identical boilerplate docs: every band bucket holds all 12
    rows += [(100 + i, "common footer disclaimer repeated verbatim text "
              "for every single document in this corpus")
             for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    obs = Observation("lsh_skew")
    capped = lsh_candidate_pairs(df, max_bucket=8, observation=obs)
    pairs = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert (1, 2) in pairs                       # small buckets untouched
    assert not any(a >= 100 for a, _ in pairs)   # clique dropped
    # 12 docs × 4 bands of identical keys = 48 rows in dropped buckets
    assert obs.get["rows_in_dropped_buckets"] == 48
    assert obs.get["band_rows"] == 14 * 4

    uncapped = lsh_candidate_pairs(df, max_bucket=None)
    upairs = {(r["doc_a"], r["doc_b"]) for r in uncapped.collect()}
    assert (100, 101) in upairs and (1, 2) in upairs


def test_winnowing_overlap_pairs_finds_shared_run(spark):
    from inception_spark.operators.dedup import winnowing_overlap_pairs

    shared = ("the quick brown fox jumps over seven lazy sleeping dogs "
              "while appellate judges review briefs today in court")
    rows = [
        (1, "intro words here first. " + shared + " closing remarks."),
        (2, "different opening text. " + shared + " another ending."),
        (3, "no overlap with the others at all in any way whatsoever "
            "cooking pasta sauce garlic tomato basil dinner tonight"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"]): r["n_shared"]
             for r in winnowing_overlap_pairs(df, min_shared=2).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert not any(3 in p for p in pairs)


def test_shingle_novelty_ordering_semantics(spark):
    from inception_spark.operators.dedup import doc_shingle_novelty

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [(1, base), (2, base), (3, "totally different words forming "
            "their own unique shingle population here today")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in doc_shingle_novelty(df).collect()}
    assert out[1]["novelty"] == 1.0        # first owner of its shingles
    assert out[2]["novelty"] == 0.0        # exact rehash of doc 1
    assert out[3]["novelty"] == 1.0        # disjoint content


def test_benchmark_contamination_detects_overlap(spark):
    from inception_spark.operators.dedup import benchmark_contamination

    bench_text = "the quick brown fox jumps over the lazy dog again"
    rows_b = [(1, bench_text)]
    rows_t = [
        (10, bench_text),                                  # fully leaked
        (11, "half leak: the quick brown fox jumps plus novel "
             "training words appended here"),
        (12, "completely clean training document with fresh content"),
    ]
    bench = spark.createDataFrame(rows_b, "doc_id long, text string")
    train = spark.createDataFrame(rows_t, "doc_id long, text string")
    out = {r["doc_id"]: r for r in benchmark_contamination(train, bench).collect()}
    assert out[10]["contamination"] == 1.0
    assert 0.0 < out[11]["contamination"] < 1.0
    assert out[12]["contamination"] == 0.0


def test_frequent_ngram_scrub_removes_shared_boilerplate(spark):
    from inception_spark.operators.dedup import frequent_ngram_scrub

    boiler = "all rights reserved contact us today"  # 6 words → two 5-grams
    rows = [
        (1, "unique opening words here " + boiler),
        (2, boiler + " some distinct tail content"),
        (3, "entirely original text with " + boiler),
        (4, "nothing shared in this one at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in frequent_ngram_scrub(df, n=5, min_docs=3).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    # the 6 boilerplate words vanish from every carrier, order preserved
    assert out[1]["clean_text"] == "unique opening words here"
    assert out[2]["clean_text"] == "some distinct tail content"
    assert out[3]["clean_text"] == "entirely original text with"
    assert out[1]["n_removed"] == 6 and out[2]["n_removed"] == 6
    # the non-carrier is untouched
    assert out[4]["n_removed"] == 0
    assert out[4]["clean_text"] == "nothing shared in this one at all"


def test_frequent_ngram_scrub_fully_scrubbed_doc_keeps_row(spark):
    from inception_spark.operators.dedup import frequent_ngram_scrub

    same = "one two three four five"
    df = spark.createDataFrame(
        [(i, same) for i in range(3)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in frequent_ngram_scrub(df).collect()}
    assert all(r["clean_text"] == "" and r["n_removed"] == 5
               for r in out.values())


def test_doc_repetition_stats_hand_computed(spark):
    from inception_spark.functions.text_analysis import doc_repetition_stats

    # "a a a b": words a×3 b×1 → top word mass 3/4; 2-grams "a a"×2,
    # "a b"×1 → top 2-gram mass 2*3/(3*3)=6/9; 3 words of 3-grams:
    # "a a a", "a a b" each once → top 1/2; no 5-grams → NULL dup frac
    df = spark.createDataFrame([(1, "a a a b")], "doc_id long, text string")
    r = doc_repetition_stats(df).collect()[0]
    assert r["n_words"] == 4
    assert r["top_word_frac"] == 0.75
    assert r["top_2gram_frac"] == round(6 / 9, 6)
    assert r["top_3gram_frac"] == 0.5
    assert r["dup_5gram_frac"] is None


def test_doc_repetition_stats_dup_5gram(spark):
    from inception_spark.functions.text_analysis import doc_repetition_stats

    # ten words = the same 5 repeated twice → every 5-gram window that
    # repeats contributes; "v w x y z" occurs at pos 0 and 5 (cnt 2)
    df = spark.createDataFrame(
        [(1, "v w x y z v w x y z")], "doc_id long, text string"
    )
    r = doc_repetition_stats(df).collect()[0]
    # 6 windows: "v w x y z"×2 plus 4 distinct rotations → dup mass
    # = 2*9, total = 6*9
    assert r["dup_5gram_frac"] == round(2 / 6, 6)


def test_paragraph_dedup_first_owner_and_reassembly(spark):
    from inception_spark.operators.dedup import paragraph_dedup

    rows = [
        (1, "alpha beta\n\nshared boilerplate\n\ngamma"),
        (2, "shared boilerplate\n\ndelta"),          # para 0 owned by doc 1
        (3, "shared boilerplate"),                    # fully scrubbed
        (4, "echo\n\necho\n\nfoxtrot"),               # within-doc repeat
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
    assert out[1]["n_segments"] == 3 and out[1]["n_kept"] == 3
    assert out[1]["deduped_text"] == "alpha beta\n\nshared boilerplate\n\ngamma"
    assert out[2]["n_kept"] == 1
    assert out[2]["deduped_text"] == "delta"
    assert out[3]["n_kept"] == 0 and out[3]["deduped_text"] == ""
    assert out[4]["n_kept"] == 2
    assert out[4]["deduped_text"] == "echo\n\nfoxtrot"


def test_paragraph_dedup_duckdb_parity(spark, tmp_path):
    import duckdb

    from inception_spark.operators.dedup import (
        paragraph_dedup,
        paragraph_dedup_sql,
    )

    rows = [
        (1, "alpha beta\n\nshared boilerplate\n\ngamma"),
        (2, "shared boilerplate\n\ndelta"),
        (3, "shared boilerplate"),
        (4, "echo\n\n\n\necho\n\nfoxtrot\n\n"),      # blank paragraphs
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "docs.parquet")
    df.coalesce(1).write.parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    got_o = {
        r[0]: r
        for r in con.execute(paragraph_dedup_sql("documents")).fetchall()
    }
    got_s = {
        r["doc_id"]: (r["doc_id"], r["n_segments"], r["n_kept"], r["deduped_text"])
        for r in paragraph_dedup(df).collect()
    }
    assert got_s == got_o


def test_bloom_screen_no_false_negatives_and_fp_observable(spark):
    from inception_spark.operators.dedup import bloom_screen

    corpus = spark.createDataFrame(
        [(i, f"corpus document number {i} unique words {i * 7}") for i in range(60)],
        "doc_id long, text string",
    )
    # probes: 10 true members (replayed text) + 40 fresh
    rows = [(100 + i, f"corpus document number {i} unique words {i * 7}")
            for i in range(10)]
    rows += [(200 + i, f"fresh probe {i} never seen before {i * 13}")
             for i in range(40)]
    probe = spark.createDataFrame(rows, "doc_id long, text string")
    # tiny m saturates the filter -> false positives likely but bounded
    out = {r["doc_id"]: r for r in bloom_screen(corpus, probe, m=64, k=3).collect()}
    assert len(out) == 50
    # Bloom guarantee: every true member is flagged (no false negatives)
    for i in range(10):
        r = out[100 + i]
        assert r["maybe_dup"] and r["is_dup_exact"] and not r["false_positive"]
    for i in range(40):
        r = out[200 + i]
        assert not r["is_dup_exact"]
        assert r["false_positive"] == r["maybe_dup"]
    # with a roomy filter the fresh probes come back clean
    roomy = {r["doc_id"]: r
             for r in bloom_screen(corpus, probe, m=1 << 20, k=4).collect()}
    assert not any(roomy[200 + i]["maybe_dup"] for i in range(40))


def test_bloom_screen_broadcasts_filter(spark):
    from inception_spark.operators.dedup import bloom_screen

    corpus = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    probe = spark.createDataFrame([(2, "a b c")], "doc_id long, text string")
    plan = (
        bloom_screen(corpus, probe, m=256, k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_lsh_eval_report_planted_dups(spark):
    from inception_spark.operators.dedup import lsh_eval_report

    # mutually-distinct base docs (per-doc word vocabulary) so the ONLY
    # ground-truth pairs are the 5 planted near-identical copies
    base = [
        (i, " ".join(f"w{i}x{j}" for j in range(16))) for i in range(10)
    ]
    dups = [(100 + i, base[i][1] + " zulu") for i in range(5)]
    df = spark.createDataFrame(base + dups, "doc_id long, text string")
    r = lsh_eval_report(df, threshold=0.5).collect()[0]
    assert r["n_truth"] == 5                    # exactly the planted pairs
    assert r["n_hit"] == 5                      # recall 1.0 at jaccard~0.9
    assert r["cand_recall"] == 1.0
    assert r["cand_precision"] is not None and r["cand_precision"] > 0


def test_lsh_eval_report_enforces_sample_contract(spark):
    """Full-corpus misuse must fail LOUD before the quadratic ground-
    truth join launches, with downsample guidance; an explicit higher cap
    (or None) opts in."""
    import pytest

    from inception_spark.operators.dedup import lsh_eval_report

    docs = spark.range(30).selectExpr(
        "id AS doc_id", "concat('tok', id, ' a b c d e f g') AS text"
    )
    with pytest.raises(ValueError, match="EVAL-ONLY.*stable_sample"):
        lsh_eval_report(docs, max_eval_rows=10)
    # explicit opt-in runs
    row = lsh_eval_report(docs, max_eval_rows=None).head()
    assert row["n_cand"] >= 0


def test_simhash_packed_lane_guard_is_loud(spark):
    """A >2^21-word document must error (ANSI lane-sum overflow or the
    explicit word-count guard), never silently corrupt the packed
    tallies."""
    import pytest as _pytest

    from inception_spark.operators.dedup import simhash_docs

    big = spark.createDataFrame(
        [(1, "w " * (2**21))], "doc_id long, text string"
    )
    with _pytest.raises(Exception, match="overflow|packed-tally bound"):
        simhash_docs(big).collect()


def test_simhash_packed_matches_legacy_sixty_sum(spark, sf_dir):
    """The packed 21-bit-lane tallies reproduce the old ±1 conditional-
    sum fingerprints bit for bit."""
    from pyspark.sql import functions as F

    from inception_spark.functions import hashing as H
    from inception_spark.operators.dedup import simhash_docs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ex = docs.select(
        F.col("doc_id"),
        F.explode_outer(H.words(F.col("text"))).alias("w"),
    )
    hashed = ex.select("doc_id", H.h60(F.col("w")).alias("h"))
    aggs = [
        F.sum(
            F.when(
                F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"t{b}")
        for b in range(H.SIMHASH_BITS)
    ]
    tallies = hashed.groupBy("doc_id").agg(*aggs)
    sim = None
    for b in range(H.SIMHASH_BITS):
        term = F.when(
            F.col(f"t{b}") > 0, F.lit(2**b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    legacy = {
        r["doc_id"]: r["simhash"]
        for r in tallies.select("doc_id", sim.alias("simhash")).collect()
    }
    packed = {
        r["doc_id"]: r["simhash"] for r in simhash_docs(docs).collect()
    }
    assert packed == legacy


def test_lsh_index_probe_matches_batch_candidates(spark, tmp_path):
    """Incremental probe ≡ batch LSH restricted to new×corpus pairs:
    probing the materialized band table finds EXACTLY the candidates the
    full (uncapped) self-join would emit across the boundary."""
    from inception_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_probe_pairs,
        write_lsh_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter("doc_id < 300")
    probe = docs.filter("doc_id >= 300")
    path = str(tmp_path / "bands")
    write_lsh_index(corpus, path)
    got = {
        (r["probe_doc"], r["corpus_doc"])
        for r in lsh_probe_pairs(spark, path, probe).collect()
    }
    full = lsh_candidate_pairs(docs, max_bucket=None).collect()
    want = {
        (b, a) for r in full
        for a, b in [(r["doc_a"], r["doc_b"])]
        if a < 300 <= b
    }
    assert got == want and len(want) > 0


def test_lsh_probe_scan_is_pruned(spark, tmp_path):
    """The probe reads the index with pushed key filters and band
    partition filters — not a full scan."""
    from inception_spark.operators.dedup import (
        lsh_probe_pairs,
        write_lsh_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "bands")
    write_lsh_index(docs.filter("doc_id < 300"), path)
    out = lsh_probe_pairs(spark, path, docs.filter("doc_id >= 490"))
    f = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    scan = f[f.index("bands"):]
    assert "PushedFilters" in scan
    pushed = scan.split("PushedFilters")[1][:400]
    assert "key" in pushed and "In(" in pushed
    assert "PartitionFilters" in scan
    # broadcast probe side: no shuffle of index rows into the join
    assert "BroadcastHashJoin" in f


def test_lsh_probe_empty_batch(spark, tmp_path):
    """An empty (or all-filtered) probe batch returns an empty pair
    frame with the contract schema instead of raising on a null
    predicate."""
    from inception_spark.operators.dedup import (
        lsh_probe_pairs,
        write_lsh_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "bands")
    write_lsh_index(docs.filter("doc_id < 100"), path)
    out = lsh_probe_pairs(spark, path, docs.filter("doc_id < 0"))
    assert out.columns == ["probe_doc", "corpus_doc"]
    assert out.count() == 0


def test_url_dedup_collapses_refetch_variants(spark):
    """scheme/www/utm/query-order/slash/fragment variants of one page
    collapse to one canonical key; distinct pages stay distinct."""
    from inception_spark.operators.dedup import url_dedup

    rows = [
        (1, "https://www.Site.com/a/b?utm_c=x&z=1&a=2"),
        (2, "http://site.com/a/b/?a=2&z=1"),
        (3, "HTTPS://SITE.com/a/b?z=1&a=2#sec"),
        (4, "https://site.com/a/c"),
        (5, "https://other.com/a/b?a=2&z=1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r["canon_url"]: (r["n_dups"], r["keep_id"])
        for r in url_dedup(df).collect()
    }
    assert got == {
        "site.com/a/b?a=2&z=1": (3, 1),
        "site.com/a/c": (1, 4),
        "other.com/a/b?a=2&z=1": (1, 5),
    }


def test_jaccard_prefix_pairs_lossless(spark):
    """Prefix filtering must be EXACT: result equals brute-force
    all-pairs Jaccard at the same threshold, including ties exactly
    at the threshold (integer compare, no float slop)."""
    from itertools import combinations

    from inception_spark.operators.dedup import jaccard_prefix_pairs

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma epsilon"),          # J=3/5 with 1
        (3, "alpha beta gamma delta"),            # J=1 with 1
        (4, "zeta eta theta iota kappa"),
        (5, "zeta eta theta iota kappa lambda"),  # J=5/6 with 4
        (6, "completely different words here"),
        (7, "alpha alpha beta beta gamma delta"), # dup tokens collapse
        (8, ""),                                  # empty doc: no tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_prefix_pairs(
            df, threshold_num=3, threshold_den=5, shingle_n=1
        ).collect()
    }
    sets = {i: set(t.split()) for i, t in rows if t}
    want = {}
    for a, b in combinations(sorted(sets), 2):
        i = len(sets[a] & sets[b])
        u = len(sets[a] | sets[b])
        if i * 5 >= u * 3:
            want[(a, b)] = round(i / u, 4)
    assert got == want
    # the J=3/5 tie must be INCLUDED (>= semantics, integer-exact)
    assert (1, 2) in got and got[(1, 2)] == 0.6


def test_jaccard_prefix_pairs_empty(spark):
    from inception_spark.operators.dedup import jaccard_prefix_pairs

    df = spark.createDataFrame([], "doc_id long, text string")
    out = jaccard_prefix_pairs(df)
    assert out.columns == ["doc_a", "doc_b", "jaccard"]
    assert out.count() == 0


def test_jaccard_prefix_pairs_shingle_mode(spark):
    """Shingle-set mode: near-identical docs pair up; docs sharing all
    WORDS but no word ORDER don't (the word-level pathology the shingle
    default exists to avoid)."""
    from inception_spark.operators.dedup import jaccard_prefix_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
        (3, "dog lazy the over jumps fox brown quick the today"),  # permuted
        (4, "an entirely different sentence with other words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b) for r in jaccard_prefix_pairs(
        df, threshold_num=1, threshold_den=2, shingle_n=3).collect()}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_containment_pairs_asymmetric(spark):
    """A short doc fully inside a long one scores containment 1.0 in
    the short->long direction even though Jaccard is tiny; the reverse
    direction fails the threshold."""
    from inception_spark.operators.dedup import containment_pairs

    short = "alpha beta gamma delta epsilon"
    rows = [
        (1, short),
        # one extra word: contains ALL of doc 1's shingles (containment
        # 1.0 forward, 3/4 backward — under the 4/5 bar) and stays
        # similar enough for the banded-MinHash blocking to recall
        # deterministically (the low-Jaccard recall caveat is the
        # operator docstring's own warning, not this test's subject)
        (2, short + " zeta"),
        (3, "totally unrelated words all over here today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.contained_doc, r.container_doc): r.containment
        for r in containment_pairs(
            df, threshold_num=4, threshold_den=5, max_bucket=None
        ).collect()
    }
    assert got.get((1, 2)) == 1.0
    assert (2, 1) not in got
    assert all(3 not in k for k in got)


def test_containment_exact_below_finds_tiny_in_huge(spark):
    """The exact small-doc stratum recalls the tiny-doc-in-huge-doc
    pair that MinHash blocking (Jaccard-tracking) misses."""
    from inception_spark.operators.dedup import containment_pairs

    short = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i}" for i in range(150))
    rows = [
        (1, short),
        (2, short + " " + filler),  # J ~ 0.02, containment(1->2) = 1.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # LSH-only: missed (documented)
    lsh_only = containment_pairs(
        df, threshold_num=4, threshold_den=5, max_bucket=None
    ).collect()
    assert lsh_only == []
    # exact stratum: found, with containment 1.0 in one direction only
    got = {
        (r.contained_doc, r.container_doc): r.containment
        for r in containment_pairs(
            df, threshold_num=4, threshold_den=5, max_bucket=None,
            exact_below=10,
        ).collect()
    }
    assert got == {(1, 2): 1.0}


def test_canonical_url_pathless_query_and_engine_parity(spark):
    """ADVICE r7: the authority must end at the FIRST of '/', '?', '#'.
    A pathless query ('example.com?B=2&a=1') previously lowercased the
    whole query as part of the host and skipped param normalization.
    Value pins + Spark == DuckDB on every adversarial shape."""
    import duckdb

    from inception_spark.functions.cleaning import (
        canonical_url_expr,
        canonical_url_sql,
    )

    urls = [
        "https://Example.com?B=2&a=1",          # pathless query
        "http://example.com/?a=1&B=2",          # slash variant, reordered
        "https://WWW.Example.com?utm_x=1&B=2&a=1",  # utm in pathless query
        "example.com?a=1&B=2",                  # schemeless
        "https://example.com?B=2&a=1#frag",     # fragment after query
        "https://example.com",                  # bare host
        "https://example.com/p?Case=Q",         # query case preserved
        "https://example.com:8080/p",           # port stays in authority
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r[0]
        for r in df.select(canonical_url_expr(F.col("url"))).collect()
    ]
    # case-distinct pathless queries collapse to ONE key with the query
    # case preserved and params sorted/stripped
    assert got[0] == got[1] == got[2] == got[3] == got[4] \
        == "example.com?B=2&a=1"
    assert got[5] == "example.com"
    assert got[6] == "example.com/p?Case=Q"
    assert got[7] == "example.com:8080/p"

    con = duckdb.connect()
    for u, want in zip(urls, got):
        o = con.execute(
            f"SELECT {canonical_url_sql('?')}", [u]
        ).fetchone()[0]
        assert o == want, f"{u}: spark={want!r} duckdb={o!r}"


def test_substring_dup_spans_semantics(spark):
    """ExactSubstr spans: shared 8-gram regions found with exact word
    offsets; overlapping self-repeats merge; two disjoint shared
    regions stay two islands; unrelated docs emit nothing."""
    from inception_spark.operators.dedup import substring_dup_spans

    boiler = "all rights reserved provided without any warranty of fitness"
    rows = [
        (1, "unique alpha words here " + boiler + " trailing bits"),
        (2, "other opening text " + boiler + " and more stuff"),
        (3, "totally unrelated content with no shared region at all"),
        (4, boiler + " " + boiler),                       # merged overlap
        (5, "x y " + boiler + " z z z z q w e r t y u i " + boiler),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in substring_dup_spans(df, ngram=8).collect()
    )
    assert got == [
        (1, 4, 13, 2),     # 9-word boiler = two 8-gram starts
        (2, 3, 12, 2),
        (4, 0, 18, 4),     # adjacent repeats merge into ONE span
        (5, 2, 11, 2),     # …but two separated regions stay TWO islands
        (5, 23, 32, 2),
    ]


def test_substring_dup_spans_plan_and_empty(spark):
    from inception_spark.operators.dedup import substring_dup_spans

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = substring_dup_spans(empty)
    assert out.columns == ["doc_id", "span_start", "span_end", "n_grams"]
    assert out.count() == 0
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = (
        substring_dup_spans(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in p
    assert "LeftSemi" in p  # dup filter is a semi-join, never a rescan
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_edit_distance_pairs_lossless_vs_bruteforce(spark):
    """Ed-Join must be EXACT: equals all-pairs levenshtein at k, with
    duplicated grams, equal strings (dist 0), length variety, and
    sub-q strings (len < q emits no gram — covered by the short
    stratum's length block, not the prefix filter)."""
    import itertools

    from inception_spark.operators.dedup import edit_distance_pairs

    def lev(a, b):
        m = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(len(a) + 1):
            m[i][0] = i
        for j in range(len(b) + 1):
            m[0][j] = j
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                m[i][j] = min(
                    m[i - 1][j] + 1,
                    m[i][j - 1] + 1,
                    m[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                )
        return m[len(a)][len(b)]

    # deterministic pseudo-random corpus with planted near-pairs
    base = ["kitten", "mitten", "aaaa", "abcdefgh", "banana", "bananas",
            "Supplier#0001", "Supplier#0002", "Supplier#0011", "zzz"]
    rows = []
    for i, s in enumerate(base):
        rows.append((2 * i, s))
        # mutate one char deterministically
        pos = i % len(s)
        rows.append((2 * i + 1, s[:pos] + chr(97 + (i % 26)) + s[pos + 1:]))
    # sub-q strata: empty, single chars (some within k of each other
    # and of the 2-char strings), and a 2-char bridge string
    rows += [(100, "a"), (101, "b"), (102, ""), (103, "ab"), (104, "a")]
    df = spark.createDataFrame(rows, "id long, s string")
    for k in (1, 2):
        got = sorted(
            tuple(r)
            for r in edit_distance_pairs(df, k=k, q=2).collect()
        )
        want = sorted(
            (i, j, lev(a, b))
            for (i, a), (j, b) in itertools.combinations(rows, 2)
            if lev(a, b) <= k
        )
        assert got == want, f"k={k}"


def test_edit_distance_pairs_plan_no_allpairs(spark):
    from inception_spark.operators.dedup import edit_distance_pairs

    sup = spark.read.parquet(
        "/root/testdata/sf0.001/supplier.parquet"
    ).select("s_suppkey", "s_name")
    out = edit_distance_pairs(
        sup, id_col="s_suppkey", str_col="s_name", k=1
    )
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # verify runs on candidates only: result non-empty on the
    # near-identical supplier-name fixture and symmetric-free
    rows = out.collect()
    assert rows and all(r["id_a"] < r["id_b"] for r in rows)


def test_scrub_dup_spans_removes_exactly_span_words(spark):
    """Find→scrub roundtrip: scrubbed text = words outside spans in
    order; fully-scrubbed docs emit empty text; span-free docs pass
    through as the canonical word join."""
    from inception_spark.operators.dedup import (
        scrub_dup_spans,
        substring_dup_spans,
    )

    boiler = "all rights reserved provided without any warranty of fitness"
    rows = [
        (1, "keep one " + boiler + " keep two"),
        (2, "other head " + boiler + " other tail"),
        (3, "no shared region in this document at all whatsoever"),
        (4, boiler),                       # entire doc = the span
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = substring_dup_spans(df, ngram=8)
    got = {
        r["doc_id"]: (r["text_clean"], r["n_kept"], r["n_removed"])
        for r in scrub_dup_spans(df, spans).collect()
    }
    # the 9-word boiler spans pos 2..11 in doc 1 (grams at 2 and 3)
    assert got[1] == ("keep one keep two", 4, 9)
    assert got[2] == ("other head other tail", 4, 9)
    assert got[3] == (rows[2][1], 9, 0)
    assert got[4] == ("", 0, 9)


def test_cdc_chunks_shift_robust_and_deterministic(spark):
    """The CDC property: prepending words reshapes only the FIRST
    chunk — every later chunk hash survives; fixed determinism."""
    from inception_spark.operators.dedup import cdc_chunks

    base = (
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
        "eiusmod tempor incididunt ut labore et dolore magna aliqua enim "
        "ad minim veniam quis nostrud exercitation ullamco laboris nisi "
        "aliquip ex ea commodo consequat duis aute irure"
    ) * 3
    rows = [(1, base), (2, "three new words " + base)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = cdc_chunks(df, mask=7).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_hash"], r["n_words"])
        )
    c1 = sorted(by_doc[1])
    c2 = sorted(by_doc[2])
    # all chunks except doc 2's first are hash-identical to doc 1's
    assert [h for _, h, _ in c1[1:]] == [h for _, h, _ in c2[1:]]
    assert c1[0][1] != c2[0][1]
    # word counts tile the docs exactly
    assert sum(n for _, _, n in c1) + 3 == sum(n for _, _, n in c2)
    # deterministic
    again = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_hash"])
        for r in cdc_chunks(df, mask=7).collect()
    )
    assert again == sorted(
        (d, c, h) for d, v in by_doc.items() for c, h, _ in v
    )


def test_snapshot_diff_all_statuses(spark):
    from inception_spark.operators.dedup import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_dedup_keep_best_prefers_quality_copy(spark):
    """Two fingerprint-identical copies (same words, different
    punctuation/length) — the survivor is the higher-quality one,
    regardless of id order; singleton docs survive untouched."""
    from inception_spark.operators.dedup import dedup_keep_best

    rows = [
        # id 1 is noisy (symbols tank alpha ratio), id 2 is clean,
        # same word sequence -> same fingerprint
        (1, "the quick brown fox jumps over the lazy dog ####$$$$%%%%"),
        (2, "The quick brown fox jumps over the lazy dog."),
        (3, "an entirely different document about spark joins"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n_dups"] for r in dedup_keep_best(df).collect()}
    assert got == {2: 2, 3: 1}


def test_semantic_contamination_self_hit_and_merge(spark):
    """Eval copies leaked into the corpus must self-hit with
    max_cos = 1.0; clean eval rows report n_hits = 0 with NULL
    max_cos; and micro-batch partials re-merge to the batch answer
    exactly (the streaming twin's contract)."""
    from inception_spark.operators.dedup import (
        semantic_contamination,
        semantic_contamination_from_partials,
        semantic_contamination_partials,
    )

    # orthogonal basis vectors: cosine is 0 or 1 exactly
    def e(i):
        v = [0.0] * 4
        v[i] = 1.0
        return v

    corpus = spark.createDataFrame(
        [(0, e(0)), (1, e(0)), (2, e(1)), (3, e(2))],
        "vec_id long, embedding array<float>",
    )
    evalset = spark.createDataFrame(
        [(100, e(0)), (101, e(3))], "vec_id long, embedding array<float>"
    )
    rows = {
        r["eval_id"]: r
        for r in semantic_contamination(corpus, evalset, tau=0.9).collect()
    }
    assert rows[100]["n_hits"] == 2 and rows[100]["max_cos"] == 1.0
    assert rows[101]["n_hits"] == 0 and rows[101]["max_cos"] is None

    # split the corpus into two "micro-batches": partials must merge
    # to the identical answer
    p1 = semantic_contamination_partials(
        corpus.filter("vec_id < 2"), evalset, tau=0.9
    )
    p2 = semantic_contamination_partials(
        corpus.filter("vec_id >= 2"), evalset, tau=0.9
    )
    merged = {
        r["eval_id"]: r
        for r in semantic_contamination_from_partials(
            p1.unionByName(p2), evalset
        ).collect()
    }
    assert {k: (v["n_hits"], v["max_cos"]) for k, v in merged.items()} == {
        k: (v["n_hits"], v["max_cos"]) for k, v in rows.items()
    }


def test_semantic_contamination_plan_broadcasts_eval(spark):
    """Scale pin: the eval side must broadcast (BroadcastNestedLoopJoin
    over the corpus scan), never a corpus-sized shuffle."""
    from inception_spark.operators.dedup import semantic_contamination

    corpus = spark.range(100).selectExpr(
        "id AS vec_id", "array(CAST(id AS FLOAT), 1.0F) AS embedding"
    )
    ev = spark.range(3).selectExpr(
        "id AS vec_id", "array(CAST(id AS FLOAT), 1.0F) AS embedding"
    )
    plan = semantic_contamination(corpus, ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

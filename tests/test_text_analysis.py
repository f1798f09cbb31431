

def test_corpus_drift_shares_sum_to_one(spark):
    from inception_spark.functions.text_analysis import corpus_drift_report

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rep = corpus_drift_report(
        docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1")
    )
    rows = rep.collect()
    assert {r["dim"] for r in rows} == {"lang", "source", "len_bucket"}
    for dim in ("lang", "source", "len_bucket"):
        sub = [r for r in rows if r["dim"] == dim]
        assert abs(sum(r["old_share"] for r in sub) - 1.0) < 1e-4
        assert abs(sum(r["new_share"] for r in sub) - 1.0) < 1e-4
        # counts partition the snapshots exactly
        assert sum(r["old_n"] for r in sub) == docs.filter("doc_id % 2 = 0").count()
    for r in rows:
        assert abs(r["delta_share"] - round(r["new_share"] - r["old_share"], 6)) < 1e-9


def test_bm25_matches_python_reference(spark):
    """BM25 scores cross-checked against a from-scratch Python
    implementation on a tiny corpus — oracle agreement alone can't
    catch a bug shared by both SQL twins."""
    import math
    import re

    from inception_spark.functions.text_analysis import bm25_topk

    corpus = {
        1: "spark join filter spark spark",
        2: "join filter group window",
        3: "table scan parquet filter",
        4: "unrelated words entirely here",
    }
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    terms, k1, b = ["spark", "filter"], 1.2, 0.75

    toks = {d: re.findall(r"[0-9a-z]+", t.lower()) for d, t in corpus.items()}
    N = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / N

    def ref_score(d):
        s = 0.0
        for t in set(terms):
            dfreq = sum(1 for v in toks.values() if t in v)
            if not dfreq or t not in toks[d]:
                continue
            idf = math.log(1.0 + (N - dfreq + 0.5) / (dfreq + 0.5))
            tf = toks[d].count(t)
            dl = len(toks[d])
            s += round(
                idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)),
                6,
            )
        return round(s, 6)

    got = {r["doc_id"]: r["score"] for r in bm25_topk(df, terms, k=4).collect()}
    assert set(got) == {1, 2, 3}  # doc 4 has no query term
    for d, s in got.items():
        assert abs(s - ref_score(d)) < 1e-9, (d, s, ref_score(d))
    # doc 1 (3x spark + filter) must outrank the single-term docs
    assert got[1] == max(got.values())


def test_dsir_scores_rank_target_like_text_higher(spark):
    """Docs written in the target domain's vocabulary get positive
    avg_llr; source-vocabulary docs negative — the selection signal the
    DSIR recipe relies on."""
    from pyspark.sql import functions as F

    from inception_spark.functions.text_analysis import dsir_scores

    tgt = "court appeal judgment statute ruling opinion"
    src = "pizza recipe cheese oven tomato basil"
    rows = (
        [(i, "t", tgt) for i in range(10)]
        + [(100 + i, "s", src) for i in range(10)]
        # held-out docs, one per domain vocabulary
        + [(900, "s", "court statute ruling"), (901, "t", "pizza cheese oven")]
    )
    df = spark.createDataFrame(rows, "doc_id long, grp string, text string")
    out = {
        r["doc_id"]: r
        for r in dsir_scores(df, F.col("grp") == "t").collect()
    }
    assert out[0]["avg_llr"] > 0 and out[100]["avg_llr"] < 0
    # held-out docs score by their VOCABULARY, not their label
    assert out[900]["avg_llr"] > 0 > out[901]["avg_llr"]
    assert out[900]["n_tokens"] == 3


def test_gopher_rules_on_characteristic_documents(spark):
    """Each published Gopher rule fires on a document built to violate
    exactly it; real prose passes."""
    from inception_spark.functions.text_analysis import (
        gopher_quality_filter,
    )

    prose = (
        "The committee said that it would have to be fair with every "
        "member of the public and that the decision would be made "
        "before the end of the year. " * 5
    )
    rows = [
        (1, prose),
        (2, "short text here"),                               # too few words
        (3, " ".join("ab" for _ in range(60))),               # mean len low
        (4, " ".join("strengthlessnesses" for _ in range(60))),  # len high
        (5, prose + " " + "# " * 20),                         # symbol ratio
        (6, prose + " " + "42 17 99 " * 40),                  # alpha ratio
        (7, " ".join(f"w{i:04d}xyz" for i in range(80))),     # no stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_quality_filter(df).collect()}
    assert out[1]["keep"] and out[1]["reason"] is None
    assert out[2]["reason"] == "too_few_words"
    assert out[3]["reason"] == "mean_word_len_low"
    assert out[4]["reason"] == "mean_word_len_high"
    assert out[5]["reason"] == "symbol_ratio"
    assert out[6]["reason"] == "alpha_ratio"
    assert out[7]["reason"] == "stopwords"


def test_doc_script_profile_branches(spark):
    from pyspark.sql import functions as F

    from inception_spark.functions.text_analysis import doc_script_profile

    rows = [
        (1, "hello world 42"),
        (2, "привет мир"),
        (3, "你好 世界"),
        (4, "12345"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in doc_script_profile(df).collect()}
    assert got[1]["dominant_script"] == "latin"
    assert got[2]["dominant_script"] == "cyrillic"
    assert got[2]["cyrillic_frac"] > 0.8
    assert got[3]["dominant_script"] == "cjk"
    assert got[4]["dominant_script"] == "digit"
    assert got[4]["digit_frac"] == 1.0
    # empty doc: fractions NULL (no division by zero), total 0
    assert got[5]["n_chars_total"] == 0 and got[5]["latin_frac"] is None


class TestBlocklistFilter:
    PHRASES = ["hash join", "Slow SCAN!", "row", "one two three"]

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_hits_counts_and_normalization(self, spark):
        from inception_spark.functions.text_analysis import blocklist_filter

        docs = self._docs(spark, [
            (1, "a HASH   join, then hash join again; row Row ROW"),
            (2, "slow scan! and nothing else"),
            (3, "one two three four"),
            (4, "no matches here at all"),
            (5, "short"),  # shorter than every multi-word phrase
        ])
        out = {
            (r["doc_id"], r["phrase"]): r["n_hits"]
            for r in blocklist_filter(docs, self.PHRASES).collect()
        }
        assert out[(1, "hash join")] == 2
        assert out[(1, "row")] == 3          # case-folded single word
        assert out[(2, "slow scan")] == 1    # punctuation normalized
        assert out[(3, "one two three")] == 1
        assert not any(d in (4, 5) for d, _ in out)

    def test_overlapping_occurrences(self, spark):
        from inception_spark.functions.text_analysis import blocklist_filter

        docs = self._docs(spark, [(1, "row row row row")])
        out = blocklist_filter(docs, ["row row"]).collect()
        # positions 1,2,3 all start an occurrence (sliding, not disjoint)
        assert out[0]["n_hits"] == 3

    def test_duckdb_twin_parity(self, spark):
        import duckdb

        from inception_spark.functions.text_analysis import (
            blocklist_filter,
            blocklist_filter_sql,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        s = sorted(
            map(tuple, blocklist_filter(docs, self.PHRASES).collect())
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/documents.parquet')"
        )
        o = sorted(
            map(tuple, con.execute(
                blocklist_filter_sql(self.PHRASES)
            ).fetchall())
        )
        assert s == o

    def test_no_udf_in_plan(self, spark):
        from inception_spark.functions.text_analysis import blocklist_filter

        docs = self._docs(spark, [(1, "hash join row")])
        plan = (
            blocklist_filter(docs, self.PHRASES)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # JVM-side end to end: n-grams are transform/slice expressions,
        # the phrase probe is a broadcast hash join
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "BroadcastHashJoin" in plan

    def test_stateless_form_equals_join_form(self, spark):
        """blocklist_hits_stateless (the streaming-safe row-local form)
        must be result-identical to the broadcast-join form."""
        from inception_spark.functions.text_analysis import (
            blocklist_filter,
            blocklist_hits_stateless,
        )

        docs = self._docs(spark, [
            (1, "a HASH   join, then hash join again; row Row ROW"),
            (2, "slow scan! and nothing else"),
            (3, "one two three four"),
            (4, "no matches here"),
            (5, ""),
        ])
        a = sorted(map(tuple, blocklist_filter(docs, self.PHRASES).collect()))
        b = sorted(
            map(tuple, blocklist_hits_stateless(docs, self.PHRASES).collect())
        )
        assert a == b

    def test_stateless_builds_gram_arrays_once_per_length(self, spark):
        """r14 restructure pin: the stateless form builds its n-gram
        arrays once per DISTINCT PHRASE LENGTH per row, not once per
        (row, phrase) — the gram transform is the expensive interpreted
        HOF, the per-phrase count is a cheap equality filter over the
        pre-built array.  PHRASES here has 4 phrases over 3 distinct
        lengths, so exactly 3 gram builds may appear in the optimized
        plan (CollapseProject must not have re-inlined them into
        per-phrase copies), and the plan must stay row-local (no join,
        no aggregate — the streaming-gate contract)."""
        from inception_spark.functions.text_analysis import (
            blocklist_hits_stateless,
        )

        docs = self._docs(spark, [(1, "hash join row")])
        qe = blocklist_hits_stateless(docs, self.PHRASES)._jdf.queryExecution()
        opt = qe.optimizedPlan().toString()
        assert opt.count("sequence(1,") == 3
        phys = qe.executedPlan().toString()
        assert "Join" not in phys and "Aggregate" not in phys


class TestTfidfCosinePairs:
    def test_hand_computed_cosine(self, spark):
        from inception_spark.functions.text_analysis import (
            tfidf_cosine_pairs,
        )

        # 4 docs; 'rare' in 2 docs, 'common' in all 4 (pruned at
        # max_df=3), 'solo' in 1.  Pair (1,2) shares only 'rare'.
        docs = spark.createDataFrame(
            [
                (1, "rare common solo"),
                (2, "rare common"),
                (3, "common other"),
                (4, "common other"),
            ],
            "doc_id long, text string",
        )
        out = {
            (r["doc_a"], r["doc_b"]): r["cosine"]
            for r in tfidf_cosine_pairs(
                docs, max_df=3, min_score=0.0
            ).collect()
        }
        import math

        n = 4.0
        w_rare = round(math.log(1 + n / 2), 6)
        w_solo = round(math.log(1 + n / 1), 6)
        w_other = round(math.log(1 + n / 2), 6)
        # doc1 = {rare, solo}, doc2 = {rare}: cos = wr²/(|d1||d2|)
        expect_12 = round(
            w_rare * w_rare
            / (math.hypot(w_rare, w_solo) * w_rare),
            6,
        )
        assert abs(out[(1, 2)] - expect_12) < 1e-6
        # docs 3,4 are identical over the pruned vocab {other}
        assert out[(3, 4)] == 1.0
        # 'common' was pruned: docs sharing only it produce no pair
        assert (1, 3) not in out and (2, 4) not in out

    def test_df_cap_bounds_fanout(self, spark):
        """A term over the df cap contributes ZERO candidate pairs —
        the quadratic is capped before the join, not filtered after."""
        from inception_spark.functions.text_analysis import (
            tfidf_cosine_pairs,
        )

        docs = spark.createDataFrame(
            [(i, "everywhere") for i in range(30)],
            "doc_id long, text string",
        )
        out = tfidf_cosine_pairs(docs, max_df=10, min_score=0.0)
        assert out.count() == 0


def test_term_collocations_planted_phrase(spark):
    """A fixed two-word phrase whose words never occur apart dominates
    the PMI ranking; a pair of independently-frequent words ranks below
    it despite a higher raw count."""
    from inception_spark.functions.text_analysis import term_collocations

    # "hong kong" always together (8x); "the cat"/"the dog"... "the"
    # everywhere makes any "the X" pair low-PMI despite high counts
    filler = "the cat sat on the mat with the dog near the door"
    docs = spark.createDataFrame(
        [(i, f"{filler} hong kong {filler}") for i in range(8)],
        "doc_id long, text string",
    )
    out = term_collocations(docs, k=5, min_count=5).collect()
    assert out[0]["bg"] == "hong kong" and out[0]["rank"] == 1
    pmis = {r["bg"]: r["pmi"] for r in out}
    assert all(pmis["hong kong"] >= p for p in pmis.values())


def test_host_reputation_flags_mirror_farm(spark):
    """A host whose pages all duplicate content elsewhere gets flagged;
    a host of unique pages does not — and duplicate involvement is
    corpus-wide (the mirror's ORIGINALS live on the clean host and get
    counted as involved too)."""
    from inception_spark.functions.text_analysis import (
        host_reputation_report,
    )

    rows = []
    did = 0
    for i in range(4):  # clean host: unique docs 0..3
        did += 1
        rows.append((did, f"unique document number {i} about topic {i}",
                     "en", "clean.example.com"))
    # mirror host: copies of clean docs 0 and 1
    for i in range(2):
        did += 1
        rows.append((did, f"unique document number {i} about topic {i}",
                     "en", "mirror.example.com"))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, host string"
    )
    got = {
        r["host"]: (r["n_docs"], r["n_dup_docs"], r["flagged"])
        for r in host_reputation_report(df, dup_threshold=0.6).collect()
    }
    assert got["mirror.example.com"] == (2, 2, True)
    # 2 of clean's 4 docs are involved in corpus-wide dups -> 0.5 <= 0.6
    assert got["clean.example.com"] == (4, 2, False)


def test_markdown_structure_stats_hand_doc(spark):
    """Hand-written markdown → known structure counts; mid-line pipes
    and hash characters don't count (line starts only); the routing
    label prefers code over tabular over prose."""
    from inception_spark.functions.text_analysis import (
        markdown_structure_stats,
    )

    md = (
        "# Title\n\npara with #hashtag and |pipe inline\n\n"
        "- a\n- b\n* c\n\n```py\nx = 1\n```\n\n"
        "[link](http://u) text\n| r1 | r2 |\n> quoted\n"
    )
    df = spark.createDataFrame([(1, md), (2, "plain prose only")],
                               "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in
           markdown_structure_stats(df).collect()}
    one = got[1]
    assert (one["n_headings"], one["n_code_blocks"], one["n_links"],
            one["n_list_items"], one["n_table_rows"], one["n_quotes"],
            one["doc_class"]) == (1, 1, 1, 3, 1, 1, "code")
    assert got[2]["doc_class"] == "prose"
    assert sum(v for k, v in got[2].items()
               if k.startswith("n_")) == 0


def test_markdown_odd_fence_floors_in_both_engines(spark):
    """An unclosed code fence (odd fence count) must FLOOR in both
    engines: 3 fences -> 1 complete block, never 2.  This was a latent
    engine/twin divergence (Spark truncated, DuckDB's CAST(c/2 AS
    BIGINT) rounds) masked by even-fence-only fixtures (r10 ADVICE)."""
    import duckdb

    from inception_spark.functions.text_analysis import (
        markdown_structure_stats,
        markdown_structure_stats_sql,
    )

    rows = [
        (1, "```py\nx\n```\ntext\n```unclosed\ny\n"),   # 3 fences
        (2, "```\na\n```\n\n```\nb\n```\n"),             # 4 fences
        (3, "```only one fence\n"),                        # 1 fence
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n_code_blocks"]
           for r in markdown_structure_stats(df).collect()}
    assert got == {1: 1, 2: 2, 3: 0}

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    oracle = {r[0]: r[2] for r in con.execute(
        markdown_structure_stats_sql()
    ).fetchall()}
    assert oracle == got

"""Deterministic sampling & vocab operators."""

import pytest
from pyspark.sql import functions as F

from inception_spark.operators.sampling import (
    build_vocab,
    stable_sample,
    stratified_sample,
)

SF = "/root/testdata/sf0.001"


def test_stable_sample_deterministic_and_nested(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    s25 = {r["doc_id"] for r in stable_sample(docs, 0.25).select("doc_id").collect()}
    s25b = {r["doc_id"] for r in stable_sample(docs, 0.25).select("doc_id").collect()}
    s50 = {r["doc_id"] for r in stable_sample(docs, 0.50).select("doc_id").collect()}
    assert s25 == s25b                      # run-to-run deterministic
    assert s25 <= s50                       # rates nest (same hash, bigger cut)
    n = docs.count()
    assert 0.1 * n < len(s25) < 0.4 * n     # roughly the asked fraction

    # membership is stable under corpus growth: sampling half the corpus
    # keeps exactly the intersection
    half = docs.filter(F.col("doc_id") < 250)
    sh = {r["doc_id"] for r in stable_sample(half, 0.25).select("doc_id").collect()}
    assert sh == {d for d in s25 if d < 250}


def test_stable_sample_salt_independence(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {r["doc_id"] for r in stable_sample(docs, 0.5, salt="train").select("doc_id").collect()}
    b = {r["doc_id"] for r in stable_sample(docs, 0.5, salt="valid").select("doc_id").collect()}
    assert a != b                            # different salts → different cuts
    with pytest.raises(ValueError):
        stable_sample(docs, 1.5)


def test_stratified_rates_respected(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = stratified_sample(
        docs, {"en": 1.0, "de": 0.0}, default_rate=0.5
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang["en"] == totals["en"]     # rate 1.0 keeps everything
    assert "de" not in by_lang               # rate 0.0 keeps nothing
    for lang in totals:
        if lang not in ("en", "de"):
            assert 0 < by_lang.get(lang, 0) < totals[lang]


def test_build_vocab_ids_by_rank(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    v = build_vocab(docs, min_count=2, max_size=50).collect()
    assert 0 < len(v) <= 50  # the tiny-SF corpus vocab may be < max_size
    assert [
        r["term_id"] for r in sorted(v, key=lambda r: r["term_id"])
    ] == list(range(len(v)))
    ns = [r["n"] for r in sorted(v, key=lambda r: r["term_id"])]
    assert ns == sorted(ns, reverse=True)    # ids follow frequency rank


def test_cap_per_group_bounds_and_determinism(spark):
    from inception_spark.operators.sampling import cap_per_group

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = cap_per_group(df, cap=5)
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts and all(n <= 5 for n in counts.values())
    # groups smaller than the cap are untouched
    orig = {
        r["source"]: r["n"]
        for r in df.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for s, n in orig.items():
        assert counts[s] == min(n, 5)
    # deterministic kept set across runs
    a = sorted(r["doc_id"] for r in cap_per_group(df, cap=5).collect())
    b = sorted(r["doc_id"] for r in cap_per_group(df, cap=5).collect())
    assert a == b


def test_temperature_mix_rebalances_skewed_groups(spark):
    from inception_spark.operators.sampling import temperature_mix

    rows = [(i, "head") for i in range(900)] + [
        (1000 + i, "tail") for i in range(9)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(df).groupBy("source").count().collect()
    got = {r["source"]: r["count"] for r in out}
    # tail (smallest group) is kept whole; head keeps ~sqrt(9/900)=10%
    assert got["tail"] == 9
    assert 45 <= got["head"] <= 135  # 90 expected, hash-noise tolerance
    # deterministic: same membership on a second run
    again = {r["source"]: r["count"]
             for r in temperature_mix(df).groupBy("source").count().collect()}
    assert got == again


def test_leakage_safe_split_keeps_near_dups_together(spark):
    from inception_spark.operators.sampling import leakage_safe_split

    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    # components: pairs (2k, 2k+1) are near-dups sharing a component
    comps = spark.createDataFrame(
        [(i, i - (i % 2)) for i in range(200)],
        "doc_id long, component_id long",
    )
    out = leakage_safe_split(docs, comps).collect()
    split_of = {r["doc_id"]: r["split"] for r in out}
    for k in range(0, 200, 2):
        assert split_of[k] == split_of[k + 1], k   # no straddling pairs
    frac_train = sum(1 for s in split_of.values() if s == "train") / 200
    assert 0.6 < frac_train < 0.95                 # ~0.8 with hash noise
    assert set(split_of.values()) <= {"train", "val", "test"}


def test_epoch_shuffle_permutation_properties(spark, sf_dir):
    from inception_spark.operators.sampling import epoch_shuffle

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    e0 = epoch_shuffle(docs, epoch=0, n_shards=8).collect()
    assert len(e0) == n
    # positions are 1..len(shard) contiguous within each shard
    by_shard = {}
    for r in e0:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    assert set(by_shard) <= set(range(8))
    # a different epoch produces a different permutation, same epoch is stable
    e1 = epoch_shuffle(docs, epoch=1, n_shards=8).collect()
    k0 = {(r["doc_id"], r["shard"], r["pos"]) for r in e0}
    k1 = {(r["doc_id"], r["shard"], r["pos"]) for r in e1}
    assert k0 != k1
    again = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in epoch_shuffle(docs.repartition(11), epoch=0, n_shards=8).collect()
    }
    assert again == k0


def test_curriculum_bins_monotone_in_score(spark, sf_dir):
    from inception_spark.operators.sampling import curriculum_bins

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = curriculum_bins(docs, "n_chars", n_bins=4).collect()
    assert len(rows) == docs.count()
    assert {r["bin"] for r in rows} <= {1, 2, 3, 4}
    # bin must be monotone in score: sort by score, bins never decrease
    srt = sorted(rows, key=lambda r: r["score"])
    for a, b in zip(srt, srt[1:]):
        assert a["bin"] <= b["bin"]
    # all bins populated on this fixture
    assert {r["bin"] for r in rows} == {1, 2, 3, 4}


def test_curriculum_bins_validation(spark, sf_dir):
    import pytest as _pytest

    from inception_spark.operators.sampling import curriculum_bins

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with _pytest.raises(ValueError):
        curriculum_bins(docs, "n_chars", n_bins=1)
    with _pytest.raises(ValueError):
        curriculum_bins(docs, "n_chars", rate=0.0)


def test_token_budget_sample_respects_shares(spark):
    """Each source's selected token mass lands at-or-just-over its share
    of the budget (the straddling doc is included, never silently
    undershot); zero-weight sources select nothing; deterministic."""
    from inception_spark.operators.sampling import token_budget_sample

    rows = [
        (i, "a" if i < 40 else "b" if i < 80 else "c",
         "tok " * (5 + i % 7))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = token_budget_sample(
        df, 300, weights={"a": 2.0, "b": 1.0}
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    shares = {"a": 200, "b": 100}
    for s, share in shares.items():
        sel = sorted(
            (r for r in by_src[s] if r["selected"]),
            key=lambda r: r["cum_tokens"],
        )
        got = sum(r["n_tokens"] for r in sel)
        assert got >= share, (s, got)                     # met
        assert got - sel[-1]["n_tokens"] < share, (s, got)  # just barely
    assert not any(r["selected"] for r in by_src["c"])    # unweighted
    again = token_budget_sample(df, 300, weights={"a": 2.0, "b": 1.0}).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_token_budget_sample_uniform_split(spark):
    from inception_spark.operators.sampling import token_budget_sample

    rows = [(i, f"s{i % 3}", "w " * 10) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = token_budget_sample(df, 60).collect()  # 20 tokens per source
    per = {}
    for r in out:
        if r["selected"]:
            per[r["source"]] = per.get(r["source"], 0) + r["n_tokens"]
    assert set(per) == {"s0", "s1", "s2"}
    assert all(v == 20 for v in per.values())  # 2 docs × 10 tokens each


def test_systematic_weighted_sample_proportionality(spark):
    """Selection count ~ total_weight/step; a row heavier than the step
    is ALWAYS selected with multiplicity >= 1; zero-weight rows never."""
    rows = [(i, 10) for i in range(500)] + [(999, 50_000), (1000, 0)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    from inception_spark.operators.sampling import (
        systematic_weighted_sample,
    )

    out = {
        r.key: r.n_units
        for r in systematic_weighted_sample(
            df, weight_col="w", step_weight=1000, key_col="doc_id"
        ).collect()
    }
    total = 500 * 10 + 50_000
    assert sum(out.values()) == total // 1000  # exact line-length count
    assert out.get(999, 0) >= 50_000 // 1000  # heavy row multiplicity
    assert 1000 not in out                     # zero weight never


def test_systematic_weighted_sample_deterministic(spark):
    from inception_spark.operators.sampling import (
        systematic_weighted_sample,
    )

    df = spark.createDataFrame(
        [(i, 1 + i % 7) for i in range(300)], "doc_id long, w long"
    )
    a = sorted(map(tuple, systematic_weighted_sample(
        df, weight_col="w", step_weight=50).collect()))
    b = sorted(map(tuple, systematic_weighted_sample(
        df.repartition(11), weight_col="w", step_weight=50).collect()))
    assert a == b and len(a) > 0


def test_sharded_cumsum_samplers_equal_global_window(spark):
    """The partitioned two-pass prefix-sum path (default, shards>1)
    must be BIT-identical to the naive global-window form
    (shards=None) for both cumsum samplers, at several shard counts
    including shards >> distinct-hash-buckets-hit."""
    from inception_spark.operators.sampling import (
        systematic_weighted_sample,
        token_budget_sample,
    )

    df = spark.createDataFrame(
        [(i, 1 + i % 7) for i in range(500)], "doc_id long, w long"
    )
    base = sorted(map(tuple, systematic_weighted_sample(
        df, weight_col="w", step_weight=37, shards=None).collect()))
    assert len(base) > 0
    for sh in (2, 32, 4096):
        got = sorted(map(tuple, systematic_weighted_sample(
            df, weight_col="w", step_weight=37, shards=sh).collect()))
        assert got == base, f"shards={sh}"

    docs = spark.createDataFrame(
        [
            (i, ["web", "books", "code"][i % 3],
             "tok " * (1 + i % 9))
            for i in range(400)
        ],
        "doc_id long, source string, text string",
    )
    tb_base = sorted(map(tuple, token_budget_sample(
        docs, 600, weights={"web": 3.0, "books": 1.0, "code": 1.0},
        shards=None,
    ).collect()))
    for sh in (2, 32):
        tb = sorted(map(tuple, token_budget_sample(
            docs, 600, weights={"web": 3.0, "books": 1.0, "code": 1.0},
            shards=sh,
        ).collect()))
        assert tb == tb_base, f"shards={sh}"


def test_sharded_cumsum_no_global_sort_in_plan(spark):
    """The default sampler path must not plan a corpus-wide
    single-partition sort: the only rangepartitioning/SinglePartition
    exchange allowed is the tiny per-shard offset table's."""
    from inception_spark.operators.sampling import (
        systematic_weighted_sample,
    )

    df = spark.createDataFrame(
        [(i, 1 + i % 7) for i in range(300)], "doc_id long, w long"
    )
    out = systematic_weighted_sample(df, weight_col="w", step_weight=50)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the data path partitions by _sh (hashpartitioning); the offset
    # branch may legally use a single partition for its shards-row scan
    data_windows = [
        ln for ln in plan.splitlines() if "Window" in ln and "_lcw" in ln
    ]
    assert data_windows, "expected the sharded local-cumsum window"
    assert all("_sh" in ln for ln in data_windows)


class TestPoissonBootstrap:
    def test_ci_brackets_truth_and_draws_are_row_properties(self, spark):
        """CI from a large clean sample brackets the true mean, and the
        per-(replica,key) weights are partition-invariant (a row
        property), so repartitioning cannot change the interval."""
        from pyspark.sql import functions as F

        from inception_spark.operators.sampling import (
            poisson_bootstrap_ci,
        )

        df = spark.range(2000).select(
            F.col("id").alias("k"),
            (F.col("id") % 100).cast("double").alias("v"),
        )
        a = poisson_bootstrap_ci(df, "v", key_col="k").collect()[0]
        assert a["ci_lo"] <= 49.5 <= a["ci_hi"]
        assert a["ci_hi"] - a["ci_lo"] < 10.0  # sane width at n=2000
        b = poisson_bootstrap_ci(
            df.repartition(17), "v", key_col="k"
        ).collect()[0]
        assert tuple(a) == tuple(b)

    def test_cluster_draws_replicate_whole_clusters(self, spark):
        """Rows sharing the draw key get the SAME weight per replica —
        the cluster-bootstrap contract."""
        from pyspark.sql import functions as F

        from inception_spark.functions.hashing import h28
        from inception_spark.operators.sampling import POISSON1_THRESH

        df = spark.createDataFrame(
            [(1, 1.0), (1, 99.0), (2, 5.0)], "k long, v double"
        )
        h = h28(F.concat(F.lit("bs\x1f0\x1f"), F.col("k").cast("string")))
        w = F.lit(6)
        for kk, t in reversed(POISSON1_THRESH):
            w = F.when(h < F.lit(t), F.lit(kk)).otherwise(w)
        ws = df.select("k", w.alias("w")).collect()
        by_k = {}
        for r in ws:
            by_k.setdefault(r["k"], set()).add(r["w"])
        assert all(len(v) == 1 for v in by_k.values())


class TestMatchDistribution:
    def test_hits_target_shares_and_bottleneck_passes_whole(self, spark):
        from pyspark.sql import functions as F

        from inception_spark.operators.sampling import (
            match_distribution_sample,
        )

        rows = (
            [(i, "big") for i in range(900)]
            + [(1000 + i, "small") for i in range(100)]
        )
        df = spark.createDataFrame(rows, "k long, g string")
        # target 50/50: 'small' (n/t = 100/50 = 2) is the bottleneck
        out = match_distribution_sample(
            df, {"big": 50, "small": 50}, group_col="g", key_col="k"
        )
        counts = {
            r["g"]: r["n"]
            for r in out.groupBy("g").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        assert counts["small"] == 100          # bottleneck kept whole
        # 'big' thins to ~rate 1/9 of 900 = ~100 (hash noise ~ ±20%)
        assert 75 <= counts["big"] <= 125

    def test_groups_absent_from_target_drop(self, spark):
        from inception_spark.operators.sampling import (
            match_distribution_sample,
        )

        df = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "junk")], "k long, g string"
        )
        out = match_distribution_sample(
            df, {"a": 50, "b": 50}, group_col="g", key_col="k"
        )
        assert {r["g"] for r in out.collect()} <= {"a", "b"}

    def test_shares_must_sum_to_100(self, spark):
        import pytest as _pytest

        from inception_spark.operators.sampling import (
            match_distribution_sample,
        )

        df = spark.createDataFrame([(1, "a")], "k long, g string")
        with _pytest.raises(ValueError, match="sum to 100"):
            match_distribution_sample(
                df, {"a": 60}, group_col="g", key_col="k"
            )


def test_weighted_quantiles_hand_case(spark):
    """Weighted median of {1 w5, 10 w4, 100 w1}: cum shares 0.5/0.9/1.0
    -> p50 = 1 (left-continuous), p90 = 10, p25 = 1."""
    from inception_spark.functions.sketches import weighted_quantiles

    df = spark.createDataFrame(
        [("g", 1.0, 5), ("g", 10.0, 4), ("g", 100.0, 1)],
        "grp string, v double, w long",
    )
    r = weighted_quantiles(
        df, "v", "w", group_col="grp", probs=(0.25, 0.5, 0.9)
    ).collect()[0]
    assert r["total_weight"] == 10
    assert r["p25"] == 1.0 and r["p50"] == 1.0 and r["p90"] == 10.0


def test_unimax_allocation_waterfilling(spark):
    """Planted skew: tiny sources saturate at max_epochs, the rest
    split the remaining budget in identical floor shares; allocations
    never exceed capacity and the saturated set is the ascending
    prefix."""
    from pyspark.sql import functions as F

    from inception_spark.operators.sampling import unimax_allocation

    rows = []
    did = 0
    sizes = {"tiny": 10, "small": 30, "big": 300, "huge": 1000}
    for src, n_tok in sizes.items():
        did += 1
        rows.append((did, " ".join(["tok"] * n_tok), src))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    # capacities at max_epochs=2: 20, 60, 600, 2000; budget 500
    got = {
        r["source"]: (r["tokens"], r["capacity"], r["allocation"],
                      r["epochs_milli"], r["saturated"])
        for r in unimax_allocation(
            docs, budget_tokens=500, max_epochs=2
        ).collect()
    }
    # waterfill: tiny sat (20*4 <= 500), small sat (60*3 <= 480),
    # big: 600*2 <= 420? no -> unsat; share = (500-80) div 2 = 210
    assert got["tiny"] == (10, 20, 20, 2000, True)
    assert got["small"] == (30, 60, 60, 2000, True)
    assert got["big"] == (300, 600, 210, 700, False)
    assert got["huge"] == (1000, 2000, 210, 210, False)
    # the undistributed remainder is r = 500 - 80 - 2*210 = 0 here;
    # check allocations never exceed capacity on a non-divisible budget
    got2 = {
        r["source"]: r["allocation"]
        for r in unimax_allocation(
            docs, budget_tokens=503, max_epochs=2
        ).collect()
    }
    assert got2["big"] == got2["huge"] == (503 - 80) // 2

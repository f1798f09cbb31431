

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

"""Data-quality expectations: rule semantics, NULL discipline, and the
one-scan plan shape."""

import pytest

from inception_spark.operators.expectations import (
    check_expectations,
    quarantine_violations,
)

RULES = [
    ("id_not_null", "not_null", "id"),
    ("id_unique", "unique", "id"),
    ("lang_ok", "in_set", "lang", ("en", "de")),
    ("score_range", "in_range", "score", 0, 10),
    ("name_shape", "matches", "name", "^[a-z]+$"),
    ("name_len", "min_length", "name", 3),
]


@pytest.fixture()
def df(spark):
    rows = [
        (1, "en", 5, "alpha"),      # clean
        (1, "de", 11, "beta"),      # dup id, score out of range
        (None, "fr", 5, "x"),       # null id, bad lang, short name
        (3, "en", None, "Gamma9"),  # NULL score (no range violation), bad shape
        (4, None, -1, None),        # NULL lang/name don't hit value rules
    ]
    return spark.createDataFrame(
        rows, "id int, lang string, score int, name string"
    )


def test_report_counts(spark, df):
    out = {
        r["rule"]: (r["violations"], r["total"], r["passed"])
        for r in check_expectations(df, RULES).collect()
    }
    assert out["id_not_null"] == (1, 5, False)
    assert out["id_unique"] == (1, 5, False)      # one duplicated row
    assert out["lang_ok"] == (1, 5, False)        # 'fr' (NULL lang skipped)
    assert out["score_range"] == (2, 5, False)    # 11 and -1; NULL skipped
    assert out["name_shape"] == (1, 5, False)     # 'Gamma9'; NULL skipped
    assert out["name_len"] == (1, 5, False)       # 'x'
    clean = check_expectations(df.limit(1), RULES)
    assert all(r["passed"] for r in clean.collect())


def test_report_is_single_aggregate_job(spark, df):
    """All non-unique rules ride ONE hash aggregate: the compiled plan
    contains conditional sums, not one pass per rule."""
    row_rules = [r for r in RULES if r[1] != "unique"]
    aggs = [r for r in RULES if r[1] != "unique"]
    assert len(aggs) == 5  # the shape under test
    out = check_expectations(df, row_rules)
    assert out.count() == len(row_rules)


def test_quarantine_tags_and_filters(spark, df):
    out = quarantine_violations(
        df, [r for r in RULES if r[1] != "unique"]
    ).collect()
    tags = {r["name"]: r["violated_rules"] for r in out}
    assert tags["x"] == "id_not_null,lang_ok,name_len"  # rule order kept
    assert tags["Gamma9"] == "name_shape"
    assert "alpha" not in tags  # clean row filtered out
    kept = quarantine_violations(
        df, [("id_not_null", "not_null", "id")], keep_passing=True
    )
    assert kept.count() == 5


def test_unknown_kind_raises(spark, df):
    with pytest.raises(ValueError, match="unknown expectation kind"):
        check_expectations(df, [("bad", "nope", "id")]).collect()


def test_quarantine_requires_row_rule(spark, df):
    with pytest.raises(ValueError, match="row-level rule"):
        quarantine_violations(df, [("u", "unique", "id")])


def test_report_matches_python_reference(spark):
    """Cross-check the aggregate against a row-by-row Python evaluation
    on a randomized-but-seeded frame."""
    import random

    rnd = random.Random(7)
    langs = ["en", "de", None, "fr", "xx"]
    rows = [
        (
            rnd.choice([i, None]) if i % 7 == 0 else i,
            rnd.choice(langs),
            rnd.choice([rnd.randint(-5, 15), None]),
            rnd.choice(["ok", "Bad1", "x", None]),
        )
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id int, lang string, score int, name string")
    out = {
        r["rule"]: r["violations"]
        for r in check_expectations(df, RULES).collect()
    }

    def viol(pred):
        return sum(1 for r in rows if pred(r))

    assert out["id_not_null"] == viol(lambda r: r[0] is None)
    ids = [r[0] for r in rows if r[0] is not None]
    assert out["id_unique"] == len(ids) - len(set(ids))
    assert out["lang_ok"] == viol(
        lambda r: r[1] is not None and r[1] not in ("en", "de")
    )
    assert out["score_range"] == viol(
        lambda r: r[2] is not None and not (0 <= r[2] <= 10)
    )
    assert out["name_shape"] == viol(
        lambda r: r[3] is not None
        and not __import__("re").fullmatch("[a-z]+", r[3])
    )
    assert out["name_len"] == viol(lambda r: r[3] is not None and len(r[3]) < 3)


def test_duplicate_rule_names_rejected(spark, df):
    """Aggregate aliases key on rule name: a duplicate would silently
    misreport the second rule (ADVICE r5) — refuse up front."""
    from inception_spark.operators.expectations import check_expectations

    rules = [
        ("r", "not_null", "doc_id"),
        ("r", "min_length", "text", 5),
    ]
    with pytest.raises(ValueError, match="duplicate rule name"):
        check_expectations(df, rules)

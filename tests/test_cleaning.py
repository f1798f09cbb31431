"""Three-way parity tests for cleaning/validation: pure Python ==
Spark Column expressions == DuckDB oracle SQL.  Golden cases from the
reference behavior table in FIXTURES.md §1."""

import duckdb
import pytest
from pyspark.sql import functions as F

from inception_spark.functions.cleaning import (
    clean_text_expr,
    clean_text_py,
    clean_text_sql,
    validation_error_expr,
)

CASES = [
    ("plain", "hello world", "hello world"),
    ("tabs", "a\tb", "a b"),
    ("crlf", "a\r\nb\rc", "a\nbc"),
    ("messy", "a\tb\r\nc\r d\n\n\n\ne  \x00\x07", None),
    ("unicode_only", "ñ😊", ""),
    ("unicode_mixed", "héllo wörld", "hllo wrld"),
    ("blank_lines", "x\n\n\n\n\ny", "x\n\ny"),
    ("line_spaces", "  a  \n  b  ", "a\nb"),
    ("empty", "", ""),
    ("newline_edges", "\n\nabc\n\n", "abc"),
]


@pytest.mark.parametrize("name,raw,expected", CASES)
def test_python_clean(name, raw, expected):
    got = clean_text_py(raw)
    if expected is not None:
        assert got == expected
    # invariants regardless of expected
    assert got == got.strip()
    assert "\t" not in got and "\r" not in got
    assert "\n\n\n" not in got


def test_reference_semantics_crlf():
    # \r is a control char removed by step 1 (reference utils.py:51-55), so
    # "a\r\nb" → "a\nb" and a bare "\r" disappears entirely.
    assert clean_text_py("a\r\nb\rc") == "a\nbc"


@pytest.mark.parametrize("name,raw,expected", CASES)
def test_spark_matches_python(spark, name, raw, expected):
    df = spark.createDataFrame([(raw,)], "text string")
    got = df.select(clean_text_expr(F.col("text")).alias("c")).collect()[0]["c"]
    assert got == clean_text_py(raw), name


@pytest.mark.parametrize("name,raw,expected", CASES)
def test_duckdb_oracle_matches_python(name, raw, expected):
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {clean_text_sql('?')} AS c", [raw]
    ).fetchone()[0]
    assert got == clean_text_py(raw), name


# --- validation expression -----------------------------------------------------

def _error_for(spark, text, **kw):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(
        validation_error_expr(F.col("text"), **kw).alias("e")
    ).collect()[0]["e"]


def test_validation_messages(spark):
    kw = dict(min_len=1, max_len=20, label="Text")
    assert _error_for(spark, "ok", **kw) is None
    assert _error_for(spark, "", **kw) == "Text length (0) below minimum (1)"
    assert _error_for(spark, "   ", **kw) == "Text length (0) below minimum (1)"
    assert (
        _error_for(spark, "x" * 25, **kw)
        == "Text length (25) exceeds maximum (20)"
    )
    # query label parity (reference utils.py:104-116)
    assert (
        _error_for(spark, "x" * 25, min_len=1, max_len=20, label="Query")
        == "Query length (25) exceeds maximum (20)"
    )


def test_validation_empty_after_cleaning(spark):
    e = _error_for(spark, "ñ😊", min_len=1, max_len=100, check_clean=True)
    assert e == "Text is empty after cleaning."
    # but raw-path (batch) validation lets it through (reference chunks raw)
    e2 = _error_for(spark, "ñ😊", min_len=1, max_len=100, check_clean=False)
    assert e2 is None


# --- accent-fold normalization -------------------------------------------------

NORM_CASES = [
    ("accents", "Café RÉSUMÉ naïve", "cafe resume naive"),
    ("nordic", "Ångström møller", "angstrom moller"),
    ("macrons", "Tōkyō rōmaji", "tokyo romaji"),
    ("ws_runs", "a\t\tb\n\n c  d", "a b c d"),
    ("already_clean", "plain text", "plain text"),
    ("mixed", "  ÑOÑO  über\tnaïf ", "nono uber naif"),
]


@pytest.mark.parametrize("name,raw,expected", NORM_CASES)
def test_normalize_python(name, raw, expected):
    from inception_spark.functions.cleaning import normalize_text_py

    assert normalize_text_py(raw) == expected, name


@pytest.mark.parametrize("name,raw,expected", NORM_CASES)
def test_normalize_spark_matches(spark, name, raw, expected):
    from inception_spark.functions.cleaning import normalize_text_expr

    df = spark.createDataFrame([(raw,)], "text string")
    got = df.select(normalize_text_expr(F.col("text")).alias("n")).collect()
    assert got[0]["n"] == expected, name


@pytest.mark.parametrize("name,raw,expected", NORM_CASES)
def test_normalize_duckdb_matches(name, raw, expected):
    import duckdb as _duckdb

    from inception_spark.functions.cleaning import normalize_text_sql

    got = _duckdb.connect().execute(
        f"SELECT {normalize_text_sql('?')} AS n", [raw]
    ).fetchone()[0]
    assert got == expected, name


HTML_CASES = [
    (
        "full_page",
        '<html><head><script>if (a < b && c > 1) { x("s"); }</script>'
        "<style>.c{}</style></head><body><!-- c --><h1>T</h1>"
        "<p>hello &amp; bye</p><br><div>tail &lt;b&gt;&nbsp;x</div>"
        "</body></html>",
        "T\nhello & bye\ntail <b> x",
    ),
    ("plain_text_untouched", "no tags at   all\twith  spaces",
     "no tags at all with spaces"),
    ("blocks_to_newlines", "<p>one</p><p>two</p><ul><li>a</li><li>b</li></ul>",
     "one\ntwo\na\nb"),
    ("case_insensitive", "<SCRIPT>x</SCRIPT><P>upper</P><BR/>next",
     "upper\nnext"),
    # &amp;lt; must yield the LITERAL "&lt;", not double-decode to "<"
    ("no_double_decode", "a &amp;lt;tag&amp;gt; b", "a &lt;tag&gt; b"),
    ("empty", "", ""),
]


@pytest.mark.parametrize("name,raw,expected", HTML_CASES)
def test_html_to_text_spark(spark, name, raw, expected):
    from inception_spark.functions.cleaning import html_to_text_expr

    df = spark.createDataFrame([(raw,)], "text string")
    got = df.select(html_to_text_expr(F.col("text")).alias("t")).collect()
    assert got[0]["t"] == expected, name


@pytest.mark.parametrize("name,raw,expected", HTML_CASES)
def test_html_to_text_duckdb_parity(name, raw, expected):
    import duckdb as _duckdb

    from inception_spark.functions.cleaning import html_to_text_sql

    got = _duckdb.connect().execute(
        f"SELECT {html_to_text_sql('?')} AS t", [raw]
    ).fetchone()[0]
    assert got == expected, name


def test_c4_line_clean_applies_published_rules(spark):
    """The C4 §2.2 line rules: terminal punctuation, >=5 words, no
    javascript; page rules: brace / lorem ipsum / minimum kept lines."""
    from inception_spark.functions.cleaning import c4_line_clean

    good = ("Alpha beta gamma delta epsilon.\n"
            "Second proper sentence sits right here!\n"
            "Third good line closes the page out.")
    rows = [
        (1, good),
        (2, good + "\nshort.\nEnable javascript to continue reading."),
        (3, "Only one good line survives in this page.\nbad\nbad"),
        (4, good + "\nvar x = {a: 1};"),          # brace -> page dropped
        (5, good.replace("Second", "Lorem ipsum")),  # boilerplate marker
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_line_clean(df).collect()}
    assert out[1]["keep_page"] and out[1]["n_kept"] == 3
    assert out[1]["text_clean"] == good
    # bad lines stripped but page survives (still 3 good lines)
    assert out[2]["keep_page"] and out[2]["n_kept"] == 3
    assert "javascript" not in out[2]["text_clean"]
    assert not out[3]["keep_page"] and out[3]["n_kept"] == 1
    assert not out[4]["keep_page"]  # '{' page rule
    assert not out[5]["keep_page"]  # lorem ipsum page rule


def test_html_main_content_drops_boilerplate(spark):
    """The jusText-family gate: nav rails and related-link blocks fall
    to the link-density cap, short headlines/footers to min_words, the
    main paragraph survives and main_md5 fingerprints exactly it."""
    import hashlib

    from inception_spark.functions.cleaning import html_main_content

    body = "alpha bravo charlie delta echo foxtrot golf hotel"
    page = (
        "<html><body>"
        '<div><a href="/">Home</a> <a href="/a">About</a>'
        ' <a href="/b">Contact</a></div>'
        "<h1>Tiny Head</h1>"
        f"<p>{body}</p>"
        '<div>See also: <a href="/x">first related page</a>'
        ' <a href="/y">second related page</a></div>'
        "<div>Copyright 2024</div>"
        "</body></html>"
    )
    df = spark.createDataFrame([(7, page)], "doc_id long, html string")
    row = html_main_content(df).collect()[0]
    assert row["n_kept"] == 1
    assert row["main_chars"] == len(body)
    assert row["main_md5"] == hashlib.md5(body.encode()).hexdigest()
    assert row["n_blocks"] == 5  # nav, h1, p, related, footer


def test_html_main_content_all_boilerplate_yields_null_md5(spark):
    from inception_spark.functions.cleaning import html_main_content

    page = '<div><a href="/">Home</a> <a href="/b">More</a></div>'
    df = spark.createDataFrame([(1, page)], "doc_id long, html string")
    row = html_main_content(df).collect()[0]
    assert row["n_kept"] == 0 and row["main_md5"] is None
    assert row["main_chars"] == 0


def test_html_main_content_density_boundary_is_integer_exact(spark):
    """1000*ll <= 333*tl with zero division: a block at exactly the cap
    keeps, one char of extra link text drops it."""
    from inception_spark.functions.cleaning import html_main_content

    # tl = 1000 non-ws chars, ll = 333 -> 333000 <= 333000 keep
    plain = "word " * 100  # 100 words, 400 non-ws chars
    link_in = "x" * 333
    filler = "y" * (1000 - 400 - 333)
    page_keep = f'<p>{plain}<a href="/">{link_in}</a>{filler}</p>'
    page_drop = f'<p>{plain}<a href="/">{link_in}z</a>{filler[:-1]}</p>'
    df = spark.createDataFrame(
        [(1, page_keep), (2, page_drop)], "doc_id long, html string"
    )
    rows = {r["doc_id"]: r for r in html_main_content(df).collect()}
    assert rows[1]["n_kept"] == 1
    assert rows[2]["n_kept"] == 0

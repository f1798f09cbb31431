"""split_sentences (Python) == split_sentences_sql (DuckDB twin).

Seeded adversarial fuzz over abbreviation/initial/multi-dot/mixed-punct/
quote/bracket/digit/dotted-compound text plus the hand-picked regression
corpus.  This is what lets the chunk_documents oracle survive a future
testdata regeneration with REAL punctuation: the twin is proven general,
not fixture-shaped.
"""

import random

import duckdb
import pytest

from inception_spark.sentences import split_sentences, split_sentences_sql

CASES = [
    "Mr. Smith went west. The U.S. Supreme Court ruled. etc.. Done!? 'Yes.'",
    "J. D. Salinger wrote it. No. 5 is next.",
    "x.y. Next word.",            # dotted compound is NOT an initial
    "etc.. Second",               # whole run after abbreviation suppressed
    "etc.! Third",                # mixed run after abbreviation suppressed
    "v.v. Boundary here",         # consecutive dotted tokens = one word
    "page 3. Next",               # digit before dot: boundary
    "Pi is 3.14 exactly. Yes.",   # decimal: no whitespace, no boundary
    'He said "stop." Then left.',
    "Dr.\tTabbed. Newline\nhere. (Parens.) [Brackets.] Done",
    "A! B! C",                    # adjacent short boundaries
    "U.S.A. Works",
    "trailing whitespace. Last one.\t",
    "",
    "   ",
]


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def sql_split(con, text):
    return con.execute(
        f"SELECT {split_sentences_sql('t')} FROM (SELECT ? AS t)", [text]
    ).fetchone()[0]


@pytest.mark.parametrize("text", CASES)
def test_handpicked(con, text):
    assert sql_split(con, text) == split_sentences(text), repr(text)


WORDS = ["alpha", "bravo", "the", "Mr", "Dr", "etc", "U.S", "No", "x.y", "J",
         "a", "B", "cat", "dog", "page", "3", "14", "Xray", "Under"]
PUNCT = [".", "!", "?", "..", "...", ".!", "!?"]
QUOTES = ["", '"', "'", ")", "]"]
OPENERS = ["", '"', "'", "(", "["]
WS = [" ", "  ", "\t", "\n"]


def test_fuzz_2000_cases(con):
    rng = random.Random(11)
    for _ in range(2000):
        parts = []
        for _ in range(rng.randint(1, 12)):
            parts.append(rng.choice(WORDS))
            if rng.random() < 0.55:
                parts.append(rng.choice(PUNCT) + rng.choice(QUOTES))
            parts.append(rng.choice(WS))
            if rng.random() < 0.3:
                parts.append(rng.choice(OPENERS))
        t = "".join(parts)
        assert sql_split(con, t) == split_sentences(t), repr(t)

"""Chunker invariant tests — the golden spec ported from the reference's
tests/test_embedding_service.py:269-476 (semantics, not code).

Reference invariants, adapted to our substring-preserving tokenizer:
1. every chunk re-encoded WITH the lead prefix is ≤ max_tokens;
2. whitespace-stripped concat of chunks == whitespace-stripped original;
3. default config: chunks end in sentence punctuation and start uppercase;
4. truncation mode (tiny budget, no overlap): one chunk per sentence,
   truncated chunks do NOT end with punctuation, prefix of original kept;
5. overlap mode: last sentence(s) of chunk i reappear at start of chunk i+1.
"""

import re

import pytest

from inception_spark.config import DEFAULT_CONFIG, TestEngineConfig
from inception_spark.operators.chunking import split_text_into_chunks
from inception_spark.sentences import split_sentences
from inception_spark.tokenizer import RegexTokenizer

TOK = RegexTokenizer()
LEAD = DEFAULT_CONFIG.lead_document
LEAD_LEN = TOK.count(LEAD)


def strip_ws(s: str) -> str:
    return re.sub(r"\s+", "", s)


# --- sentence splitter sanity -----------------------------------------------

def test_sentence_splitter_basics():
    s = split_sentences("First sentence. Second one! Third? Yes.")
    assert s == ["First sentence.", "Second one!", "Third?", "Yes."]


def test_sentence_splitter_abbreviations():
    s = split_sentences("Mr. Smith went to Washington. He saw Dr. Jones.")
    assert s == ["Mr. Smith went to Washington.", "He saw Dr. Jones."]


def test_sentence_splitter_quotes(sample_opinion):
    s = split_sentences(sample_opinion)
    assert len(s) >= 10
    # every sentence ends with terminal punctuation or closing quote
    for sent in s:
        assert sent[-1] in '.?!"\'', sent


def test_sentence_splitter_empty():
    assert split_sentences("") == []
    assert split_sentences("   \n  ") == []


# --- invariant 1+2+3: default-config golden path ------------------------------

def test_chunks_within_budget(sample_opinion):
    chunks = split_text_into_chunks(sample_opinion)
    assert chunks
    for c in chunks:
        assert LEAD_LEN + TOK.count(c) <= DEFAULT_CONFIG.max_tokens


def test_content_preserved(sample_opinion):
    cfg = TestEngineConfig(max_tokens=300, overlap_ratio=0.0)
    chunks = split_text_into_chunks(
        sample_opinion,
        max_tokens=cfg.max_tokens,
        num_overlap_sentences=cfg.num_overlap_sentences,
    )
    assert len(chunks) >= 2  # actually exercises the fold
    assert strip_ws("".join(chunks)) == strip_ws(sample_opinion)


def test_chunks_look_like_sentences(sample_opinion):
    for c in split_text_into_chunks(sample_opinion):
        assert c[-1] in '.?!"', f"chunk should end at sentence boundary: {c[-40:]!r}"
        assert c[0].isupper() or c[0] in "\"'(", c[:40]


# --- invariant 4: truncation mode --------------------------------------------

def test_truncation_mode(sample_opinion):
    cfg = TestEngineConfig(max_tokens=15, overlap_ratio=0.0)
    sentences = split_sentences(sample_opinion)
    chunks = split_text_into_chunks(
        sample_opinion,
        max_tokens=cfg.max_tokens,
        num_overlap_sentences=0,
    )
    # (almost) every sentence is over 15 tokens → one chunk per sentence
    assert len(chunks) == len(sentences)
    for chunk, sent in zip(chunks, sentences):
        assert LEAD_LEN + TOK.count(chunk) <= 15
        assert chunk[:10] == sent[:10]
        # sentences over budget are truncated mid-sentence to a strictly
        # shorter prefix; sentences that fit pass through verbatim
        if LEAD_LEN + TOK.count(sent) > 15:
            assert len(chunk) < len(sent) and sent.startswith(chunk)
        else:
            assert chunk == sent


def test_giant_single_sentence_truncated():
    text = "word " * 5000  # no sentence punctuation at all
    chunks = split_text_into_chunks(text.strip())
    assert len(chunks) == 1
    assert LEAD_LEN + TOK.count(chunks[0]) <= DEFAULT_CONFIG.max_tokens


# --- invariant 5: overlap mode ------------------------------------------------

def test_overlap_mode(sample_opinion):
    # max_tokens=200, 1 overlap sentence (reference: ratio 0.005 → 1)
    chunks = split_text_into_chunks(
        sample_opinion, max_tokens=200, num_overlap_sentences=1
    )
    assert len(chunks) >= 2
    for prev, nxt in zip(chunks, chunks[1:]):
        prev_sents = split_sentences(prev)
        nxt_sents = split_sentences(nxt)
        # last sentence of chunk i == first sentence of chunk i+1,
        # unless the break came from the truncation path (no overlap then)
        assert prev_sents[-1] == nxt_sents[0]


def test_overlap_skipped_when_it_would_overflow():
    # sentences of ~60 tokens with budget 80: overlap(60) + next(60) > 80-lead
    sent = ("Alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon.")
    text = " ".join([sent] * 4)
    chunks = split_text_into_chunks(text, max_tokens=80, num_overlap_sentences=2)
    for c in chunks:
        assert LEAD_LEN + TOK.count(c) <= 80


# --- edge cases ---------------------------------------------------------------

def test_empty_text():
    assert split_text_into_chunks("") == []
    assert split_text_into_chunks("   ") == []


def test_tokenizer_truncate_is_prefix():
    t = "The quick brown fox jumps over the lazy dog 123 !?"
    for n in range(1, TOK.count(t) + 1):
        tr = TOK.truncate(t, n)
        assert t.startswith(tr)
        assert TOK.count(tr) == n
    assert TOK.truncate(t, 0) == ""
    assert TOK.truncate(t, 10_000) == t


def test_giant_doc_closed_form_matches_chunker():
    """chunk_giant_doc's oracle is floor arithmetic, not a recursive CTE:
    with every sentence costing exactly k tokens the greedy fold yields
    m0 = (B-L)//k sentences in chunk 1 and m1 = m0 - n_overlap new ones
    per later chunk.  Pin that against the real chunker at the exact-fit
    boundaries (N == m0, m0+1, m0+m1, m0+m1+1) and a large N."""
    import re

    from inception_spark.config import DEFAULT_CONFIG
    from inception_spark.operators.chunking import split_text_into_chunks
    from inception_spark.tokenizer import RegexTokenizer

    tok = RegexTokenizer()
    L = tok.count(DEFAULT_CONFIG.lead_document)
    B = DEFAULT_CONFIG.max_tokens
    n_ov = DEFAULT_CONFIG.num_overlap_sentences
    sent = lambda i: f"S{i:07d} alpha beta gamma."  # noqa: E731
    k = tok.count(sent(1))
    m0 = (B - L) // k
    m1 = m0 - n_ov
    for N in (1, m0, m0 + 1, m0 + m1, m0 + m1 + 1, 500):
        doc = " ".join(sent(i) for i in range(1, N + 1))
        chunks = split_text_into_chunks(doc)
        expect_c = 1 if N <= m0 else 1 + -(-(N - m0) // m1)
        assert len(chunks) == expect_c, (N, len(chunks), expect_c)
        for c, ch in enumerate(chunks, 1):
            ids = [int(x) for x in re.findall(r"S(\d{7})", ch)]
            first = 1 if c == 1 else m0 + (c - 2) * m1 - (n_ov - 1)
            last = min(m0 + (c - 1) * m1, N)
            assert ids[0] == first and ids[-1] == last, (N, c, ids[:2])
            assert len(ids) == last - first + 1
            assert tok.count(ch) + L == L + len(ids) * k

"""Property-based chunker tests (hypothesis): the budget/coverage/overlap
invariants must hold for arbitrary ASCII text, not just the fixture."""

from hypothesis import given, settings, strategies as st

from inception_spark.operators.chunking import split_text_into_chunks
from inception_spark.sentences import split_sentences
from inception_spark.tokenizer import RegexTokenizer

TOK = RegexTokenizer()
LEAD_LEN = TOK.count("search_document: ")

# sentence-ish ASCII text: words + punctuation + whitespace
words = st.text(
    alphabet=st.sampled_from("abcdefghij ABCDE .!?,\n"), min_size=0, max_size=400
)


@given(words)
@settings(max_examples=200, deadline=None)
def test_budget_never_exceeded(text):
    for chunk in split_text_into_chunks(text, max_tokens=32, num_overlap_sentences=1):
        assert LEAD_LEN + TOK.count(chunk) <= 32


@given(words)
@settings(max_examples=200, deadline=None)
def test_zero_overlap_content_preserved_when_no_truncation(text):
    sentences = split_sentences(text)
    # truncation only fires for sentences over budget; give a budget that
    # fits every sentence so content preservation must hold exactly
    if not sentences:
        assert split_text_into_chunks(text) == []
        return
    budget = max(LEAD_LEN + TOK.count(s) for s in sentences) + LEAD_LEN
    chunks = split_text_into_chunks(
        text, max_tokens=budget, num_overlap_sentences=0
    )
    strip = lambda s: "".join(s.split())
    assert strip("".join(chunks)) == strip(" ".join(sentences))


@given(words, st.integers(min_value=20, max_value=60))
@settings(max_examples=100, deadline=None)
def test_chunks_nonempty_and_ordered(text, budget):
    chunks = split_text_into_chunks(text, max_tokens=budget, num_overlap_sentences=2)
    for c in chunks:
        assert c.strip() != "" or c == ""
        assert TOK.count(c) > 0 or c == ""


@given(st.integers(min_value=0, max_value=5))
@settings(max_examples=20, deadline=None)
def test_overlap_sentences_repeat(n_overlap):
    text = " ".join(f"Sentence number {i} has several words inside." for i in range(12))
    chunks = split_text_into_chunks(
        text, max_tokens=40, num_overlap_sentences=n_overlap
    )
    if n_overlap == 0 or len(chunks) < 2:
        return
    for prev, nxt in zip(chunks, chunks[1:]):
        prev_s = split_sentences(prev)
        nxt_s = split_sentences(nxt)
        carried = prev_s[-min(n_overlap, len(prev_s)):]
        # chunks that start with the overlap carry it verbatim (unless the
        # overlap was skipped because it would overflow)
        if nxt_s[: len(carried)] == carried:
            continue
        # overflow-skip case: the next chunk must then fit without overlap
        assert LEAD_LEN + TOK.count(nxt) <= 40

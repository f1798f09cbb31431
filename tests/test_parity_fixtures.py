"""Golden-fixture pins for chunker parity on the reference's own fixture
text (Brown v. Board sample opinion, reference tests/test_data/
sample_opinion.txt).

The reference counts tokens with a HuggingFace AutoTokenizer and splits
sentences with NLTK punkt; neither library is installable in this
environment (no network, no pip — see PARITY.md for the full analysis).
These fixtures freeze the stand-in pipeline's observable behavior on the
real legal text the reference tests against, so (a) any drift in the
heuristic splitter / regex tokenizer fails loudly, and (b) the moment the
real libraries become available, the recorded deltas can be diffed
directly against punkt/HF output.
"""

import hashlib
import json
import os

import pytest

from inception_spark.config import DEFAULT_CONFIG
from inception_spark.operators.chunking import split_text_into_chunks
from inception_spark.sentences import split_sentences
from inception_spark.tokenizer import RegexTokenizer

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "sample_opinion_golden.json"
)
OPINION = "/root/reference/tests/test_data/sample_opinion.txt"

md5 = lambda s: hashlib.md5(s.encode()).hexdigest()


@pytest.fixture(scope="module")
def golden():
    with open(FIXTURE) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def text():
    if not os.path.exists(OPINION):
        pytest.skip("reference fixture text not present")
    with open(OPINION) as f:
        return f.read()


def test_source_text_unchanged(golden, text):
    assert md5(text) == golden["text_md5"]
    assert len(text) == golden["n_chars"]


def test_sentence_segmentation_pinned(golden, text):
    sents = split_sentences(text)
    assert len(sents) == golden["n_sentences"]
    assert [md5(s) for s in sents] == golden["sentence_md5s"]


def test_token_counts_pinned(golden, text):
    tok = RegexTokenizer()
    assert tok.count(text) == golden["n_tokens"]
    assert [
        tok.count(s) for s in split_sentences(text)
    ] == golden["sentence_token_counts"]


@pytest.mark.parametrize(
    "key", ["small_budget", "small_budget_no_overlap", "tiny_budget_truncate"]
)
def test_chunk_boundaries_pinned(golden, text, key):
    g = golden[f"chunks_{key}"]
    chunks = split_text_into_chunks(
        text,
        max_tokens=g["max_tokens"],
        num_overlap_sentences=g["num_overlap_sentences"],
    )
    assert len(chunks) == g["n_chunks"]
    assert [md5(c) for c in chunks] == g["chunk_md5s"]
    tok = RegexTokenizer()
    assert [tok.count(c) for c in chunks] == g["chunk_token_counts"]
    # the reference's budget invariant holds on the real text: every
    # chunk + lead prefix fits max_tokens
    lead = tok.count(DEFAULT_CONFIG.lead_document)
    assert all(tok.count(c) + lead <= g["max_tokens"] for c in chunks)


def test_default_config_single_chunk(golden, text):
    g = golden["chunks_default_overlap"]
    chunks = split_text_into_chunks(text)
    assert len(chunks) == g["n_chunks"] == 1
    assert md5(chunks[0]) == g["chunk_md5s"][0]


def test_no_overlap_preserves_all_sentences(text):
    """Content preservation (reference test_embedding_service.py:309-315):
    at overlap 0, with a budget every sentence fits, every sentence lands
    in exactly one chunk, in order.  (At budgets below the longest
    sentence the truncation path fires instead — pinned separately by
    tiny_budget_truncate.)"""
    tok = RegexTokenizer()
    sents = split_sentences(text)
    lead = tok.count(DEFAULT_CONFIG.lead_document)
    budget = max(tok.count(s) for s in sents) + lead
    chunks = split_text_into_chunks(
        text, max_tokens=budget, num_overlap_sentences=0
    )
    assert len(chunks) > 1  # budget is tight enough to force folding
    joined = " ".join(chunks)
    for s in sents:
        assert s in joined
    assert joined == " ".join(sents)

"""Content contract for driver-owned fixtures — the round-3 lesson
generalized from physical schema to VALUE DOMAIN.

Several oracles rely on properties of the generated data, not just its
schema.  If the driver regenerates testdata with different content
(punctuation in documents, longer texts, a different embedding dim),
those oracles would silently mismatch at the next driver run; these
assertions fail loudly in-repo first and name the oracle to update.
"""

import os
import string

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TOKEN_SQL = "[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9 \t\n\r\f\x0B]"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    c.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    return c


def test_documents_are_single_sentence_word_bags(con):
    """embed_documents / embed_delta oracles model every document as ONE
    untruncated chunk == trim(text).  That holds iff the text contains no
    sentence-boundary characters and stays under the 506-token content
    budget.  If this fails: rewrite those oracles with the full
    recursive-CTE fold (oracle_sql()['chunk_documents'] has it)."""
    bad_chars = con.execute(
        r"""
        SELECT COUNT(*) FROM documents
        WHERE regexp_matches(text, '[^a-z ]')
        """
    ).fetchone()[0]
    assert bad_chars == 0, (
        "documents.text is no longer a lowercase word-bag — the "
        "single-sentence assumption behind the embed_documents/"
        "embed_delta oracles is void"
    )
    max_tokens = con.execute(
        f"SELECT MAX(length(regexp_extract_all(trim(text), '{TOKEN_SQL}'))) "
        "FROM documents"
    ).fetchone()[0]
    assert max_tokens <= 506, (
        f"documents now reach {max_tokens} tokens — single documents "
        "would truncate and the 1-chunk-per-doc oracles break"
    )
    empties = con.execute(
        "SELECT COUNT(*) FROM documents WHERE trim(text) = ''"
    ).fetchone()[0]
    assert empties == 0  # every doc yields exactly one chunk


def test_documents_free_of_oracle_sentinel_chars(con):
    """The sentence-splitter twin uses '#', '@', \\x02, \\x03 as rewrite
    sentinels and '|' delimits BPE symbol sequences — all must be absent
    from the corpus alphabet."""
    n = con.execute(
        "SELECT COUNT(*) FROM documents WHERE "
        "contains(text, '#') OR contains(text, '@') OR contains(text, '|') "
        "OR contains(text, e'\\x02') OR contains(text, e'\\x03')"
    ).fetchone()[0]
    assert n == 0


def test_embeddings_dim_and_probe_row(con):
    """The ANN oracles inline 64-dim hyperplanes and every *_topk entry
    probes with vec_id = 0."""
    dims = con.execute(
        "SELECT DISTINCT length(embedding) FROM embeddings"
    ).fetchall()
    assert dims == [(64,)], f"embedding dim changed: {dims}"
    assert con.execute(
        "SELECT COUNT(*) FROM embeddings WHERE vec_id = 0"
    ).fetchone()[0] == 1

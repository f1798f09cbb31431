"""MIME email extraction (sources/mimemail.py): multipart walk, CTE
decode, folded headers, newline contract, taxonomy, Spark rollup."""

import pytest

import inception_spark.sources.mimemail as M


def test_roundtrip_both_ctes():
    cases = [
        "hello world",
        "multi\nline\ntext",
        "",
        "unicode héllo — naïve — 日本語",
        "qp specials =3D = and dots\n.leading dot",
        "x" * 400,  # forces QP soft line breaks / base64 wrapping
    ]
    for t in cases:
        for i in (0, 1):  # even=QP, odd=base64
            subj, body = M.mime_to_text(M.encode_mime(i, t))
            assert body == t and subj == f"doc {i}", (i, repr(t))


def test_html_sibling_not_extracted():
    _, body = M.mime_to_text(M.encode_mime(4, "plain wins"))
    assert "DO NOT EXTRACT" not in body


def test_long_subject_header_folding():
    """A subject long enough to fold across header lines must re-parse
    whole (the folded-header decode path)."""
    blob = M.encode_mime(123456789012345, "body")
    subj, _ = M.mime_to_text(blob)
    assert subj == "doc 123456789012345"


def test_taxonomy():
    from email.message import EmailMessage

    with pytest.raises(M.MimeFormatError, match="ambiguous"):
        M.encode_mime(1, "ends with lf\n")
    m = EmailMessage()
    m["Subject"] = "x"
    m.set_content("<p>html only</p>", subtype="html")
    with pytest.raises(M.MimeFormatError, match="text/plain"):
        M.mime_to_text(m.as_bytes())


def test_mime_text_stats_matches_text(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"mail body {i} (e) {'e' * (i % 4)}") for i in range(40)],
        "doc_id long, text string",
    )
    got = {r["shard"]: r for r in M.mime_text_stats(docs).collect()}
    want = docs.groupBy((F.col("doc_id") % 4).alias("shard")).agg(
        F.count("*").alias("n_msgs"),
        F.sum(F.octet_length("text")).alias("body_bytes"),
        F.sum(
            F.octet_length("text")
            - F.octet_length(F.replace(F.col("text"), F.lit("e")))
        ).alias("n_e"),
        F.sum("doc_id").alias("subject_ids_sum"),
    )
    for r in want.collect():
        g = got[r["shard"]]
        assert (
            g["n_msgs"],
            g["body_bytes"],
            g["n_e"],
            g["subject_ids_sum"],
        ) == (
            r["n_msgs"],
            r["body_bytes"],
            r["n_e"],
            r["subject_ids_sum"],
        )


def test_mbox_from_quoting_reversible():
    """mboxrd: '>From '-class body lines round-trip — the property the
    mboxo convention cannot provide."""
    msgs = [
        M.encode_mime(
            i, f"body {i}\nFrom the start\n>From quoted\n>>From deeper"
        )
        for i in range(5)
    ]
    back = list(M.iter_mbox_messages(M.encode_mbox(msgs)))
    assert len(back) == 5
    for raw, orig in zip(back, msgs):
        assert M.mime_to_text(raw) == M.mime_to_text(orig)


def test_mbox_taxonomy():
    with pytest.raises(M.MimeFormatError, match="mbox"):
        list(M.iter_mbox_messages(b"not an archive"))
    assert list(M.iter_mbox_messages(b"")) == []


def test_mbox_text_stats_matches_text(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"mail body {i}\nFrom a risky line (e)") for i in range(40)],
        "doc_id long, text string",
    )
    got = {r["shard"]: r for r in M.mbox_text_stats(docs).collect()}
    want = docs.groupBy((F.col("doc_id") % 4).alias("shard")).agg(
        F.count("*").alias("n_msgs"),
        F.sum(F.octet_length("text")).alias("body_bytes"),
        F.sum("doc_id").alias("subject_ids_sum"),
    )
    for r in want.collect():
        g = got[r["shard"]]
        assert (g["n_msgs"], g["body_bytes"], g["subject_ids_sum"]) == (
            r["n_msgs"],
            r["body_bytes"],
            r["subject_ids_sum"],
        )


def test_unroundtrippable_texts_filtered_not_fatal(spark):
    """ADVICE r12: a corpus document the MIME framing cannot round-trip
    (final LF / lone CR) is EXCLUDED at synthesis — mirrored in the
    oracle predicate — instead of failing the whole job."""
    docs = spark.createDataFrame(
        [
            (0, "fine"),
            (1, "ends with lf\n"),
            (2, "has \r carriage"),
            (3, "also fine"),
        ],
        "doc_id long, text string",
    )
    rows = {r["shard"]: r for r in M.mime_text_stats(docs).collect()}
    assert set(rows) == {0, 3}
    assert rows[0]["n_msgs"] == 1 and rows[3]["n_msgs"] == 1
    # mbox path shares the filter
    mrows = {r["shard"]: r for r in M.mbox_text_stats(docs).collect()}
    assert set(mrows) == {0, 3}
    # and the oracle predicate mirrors it
    import duckdb

    con = duckdb.connect()
    con.register(
        "documents",
        __import__("pandas").DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": ["fine", "ends with lf\n", "has \r x", "also fine"],
            }
        ),
    )
    got = con.execute(M.mime_stats_sql()).fetchall()
    assert [r[0] for r in got] == [0, 3]


def test_mbox_subsharding_invisible_to_stats(spark):
    """Sub-archive boundaries must not change the per-shard fold."""
    docs = spark.createDataFrame(
        [(i, f"text {i} e") for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(
        tuple(r)
        for r in M.mime_from_partials(
            M.mbox_partials(M.synth_mbox_corpus(docs, n_subshards=1))
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in M.mime_from_partials(
            M.mbox_partials(M.synth_mbox_corpus(docs, n_subshards=5), fan=True)
        ).collect()
    )
    assert a == b
    # and the corpus really is sub-sharded: >4 archive rows
    assert M.synth_mbox_corpus(docs, n_subshards=5).count() > 4


def test_fast_path_matches_strict_walk():
    """The compat32 fast path must be observationally identical to the
    policy.default get_body walk on every shape, including the ones
    that force the fallback (nested multiparts, attachments)."""
    from email import message_from_bytes, policy
    from email.message import EmailMessage

    def strict(blob):
        msg = message_from_bytes(blob, policy=policy.default)
        part = msg.get_body(preferencelist=("plain",))
        if part is None:
            return None
        return str(msg["Subject"] or ""), part.get_content()

    blobs = []
    # plain single-part, both CTEs, folded + unicode subjects
    for i in (0, 1):
        m = EmailMessage()
        m["Subject"] = "s" * 100  # folds
        m.set_content("body é\n2nd", charset="utf-8",
                      cte="quoted-printable" if i == 0 else "base64")
        blobs.append(m.as_bytes())
    m = EmailMessage()
    m["Subject"] = "naïve — héllo"  # RFC 2047 encoded words
    m.set_content("x")
    blobs.append(m.as_bytes())
    # flat multipart/alternative: first plain wins
    m = EmailMessage()
    m["Subject"] = "alt"
    m.set_content("FIRST")
    m.add_alternative("SECOND", subtype="plain")
    m.add_alternative("<p>h</p>", subtype="html")
    blobs.append(m.as_bytes())
    # mixed with attachment: strict-path territory
    m = EmailMessage()
    m["Subject"] = "mixed"
    m.set_content("real body")
    m.add_attachment("ATTACHED", filename="a.txt")
    blobs.append(m.as_bytes())
    # nested: alternative inside mixed
    m = EmailMessage()
    m["Subject"] = "nested"
    m.set_content("inner plain")
    m.add_alternative("<p>h</p>", subtype="html")
    m.make_mixed()
    blobs.append(m.as_bytes())

    for blob in blobs:
        want = strict(blob)
        subj, body = M.mime_to_text(blob)
        assert (subj, body + "\n") == want, blob[:120]

    # html-only: both paths raise the typed error
    m = EmailMessage()
    m["Subject"] = "h"
    m.set_content("<p>x</p>", subtype="html")
    with pytest.raises(M.MimeFormatError, match="text/plain"):
        M.mime_to_text(m.as_bytes())

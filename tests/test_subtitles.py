"""Subtitle parsing (sources/subtitles.py): both dialects, timestamp
arithmetic, block taxonomy, and the Spark rollup."""

import pytest

import inception_spark.sources.subtitles as S


CASES = [
    "hello world",
    "multi\nline\ntext",
    "",
    "unicode héllo — 日本語",
    "arrow --> inside text",
    "NOTE this looks like a vtt note\nbut is cue text",
    "42\npurely numeric line",
]


@pytest.mark.parametrize("vtt", [False, True])
def test_roundtrip_cases(vtt):
    for t in CASES:
        assert S.subtitles_to_text(S.encode_srt(t, vtt=vtt)) == t, repr(t)


def test_timestamp_arithmetic():
    cues = S.parse_cues(S.encode_srt("a\nb\nc"))
    assert [(c[0], c[1]) for c in cues] == [
        (0, 1500),
        (2000, 3500),
        (4000, 5500),
    ]
    # hour rollover + VTT MM:SS.mmm short form
    assert S._parse_ts("01:02:03,456") == 3723456
    assert S._parse_ts("02:03.456") == 123456


def test_vtt_dialect_features():
    src = (
        "WEBVTT\n\nNOTE a comment block\nspanning lines\n\n"
        "00:00.000 --> 00:01.500 align:start\nindexless cue\n\n"
        "STYLE\n::cue { color: red }\n\n"
        "2\n00:02.000 --> 00:03.500\nindexed cue\n"
    )
    cues = S.parse_cues(src.encode())
    assert [c[2] for c in cues] == ["indexless cue", "indexed cue"]
    assert cues[0] == (0, 1500, "indexless cue")


def test_multiline_cue_text():
    src = "1\n00:00:00,000 --> 00:00:01,500\nfirst\nsecond\n\n"
    assert S.parse_cues(src.encode())[0][2] == "first\nsecond"


def test_taxonomy():
    with pytest.raises(S.SubtitleFormatError, match="-->"):
        S.parse_cues(b"1\nnot a timestamp\ntext\n")
    with pytest.raises(S.SubtitleFormatError, match="timestamp"):
        S.parse_cues(b"1\n00:xx:00,000 --> 00:00:01,000\nt\n")
    with pytest.raises(S.SubtitleFormatError, match="UTF-8"):
        S.parse_cues(b"\xff\xfe binary")
    with pytest.raises(S.SubtitleFormatError, match="neither"):
        S.parse_cues(b"not-an-index\nalso not ts\n")


def test_subtitle_stats_matches_text(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"cue one {i}\ncue two (e) {'e' * (i % 4)}") for i in range(40)],
        "doc_id long, text string",
    )
    for vtt in (False, True):
        got = {
            r["shard"]: r
            for r in S.subtitle_text_stats(docs, vtt=vtt).collect()
        }
        want = docs.groupBy((F.col("doc_id") % 4).alias("shard")).agg(
            F.count("*").alias("n_docs"),
            F.sum(F.lit(2)).alias("n_cues"),
            F.sum(F.octet_length("text")).alias("extracted_bytes"),
            F.sum(
                F.octet_length("text")
                - F.octet_length(F.replace(F.col("text"), F.lit("e")))
            ).alias("n_e"),
            F.sum(F.lit(3000)).alias("speech_ms"),
        )
        for r in want.collect():
            g = got[r["shard"]]
            assert (
                g["n_docs"],
                g["n_cues"],
                g["extracted_bytes"],
                g["n_e"],
                g["speech_ms"],
            ) == (
                r["n_docs"],
                r["n_cues"],
                r["extracted_bytes"],
                r["n_e"],
                r["speech_ms"],
            ), vtt


def test_whitespace_only_cue_lines_preserved():
    """ADVICE r12: cue blocks terminate ONLY on truly empty lines — a
    whitespace-only line is cue text and must round-trip byte-exact."""
    cases = [
        "   \nwhitespace-only first line",
        "a\n \nb",
        "\t",
        "end\n  ",
    ]
    for t in cases:
        for vtt in (False, True):
            assert S.subtitles_to_text(S.encode_srt(t, vtt=vtt)) == t, (
                repr(t),
                vtt,
            )

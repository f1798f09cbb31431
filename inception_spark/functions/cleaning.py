"""Text cleaning & validation — pure Catalyst column expressions.

Replicates ``clean_text_for_json`` / ``preprocess_text`` / ``validate_text_length``
(``/root/reference/inception/utils.py:38-116``) with **zero UDFs**: every step
is a built-in string expression, so the whole cleaning chain stays inside
whole-stage codegen and is pushed through Catalyst like any other projection.

A character-identical pure-Python twin (:func:`clean_text_py`) backs the
driver-side single-query path and the three-way parity tests
(Python == Spark == DuckDB oracle).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# P1: clean_text_for_json (reference utils.py:38-70)
# ---------------------------------------------------------------------------
# Step order matters and mirrors the reference exactly:
#   1. keep only chars with 32 <= ord < 127, plus \n and \t
#      (note: this already deletes \r, so the reference's \r\n→\n replace
#       is a no-op by the time it runs; we keep only the meaningful steps)
#   2. \t → space
#   3. strip spaces at start/end of every line
#   4. collapse 3+ consecutive \n into exactly 2
#   5. strip leading/trailing whitespace of the whole text


def clean_text_expr(col: Column) -> Column:
    c = F.regexp_replace(col, r"[^\x20-\x7E\n\t]", "")       # 1
    c = F.regexp_replace(c, r"\t", " ")                       # 2
    c = F.regexp_replace(c, r"(?m)^ +| +$", "")               # 3
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")                # 4
    c = F.regexp_replace(c, r"^\s+|\s+$", "")                 # 5
    return c


def clean_text_py(text: str) -> str:
    """Pure-Python twin of :func:`clean_text_expr` (same 5 steps)."""
    if not text:
        return ""
    t = "".join(ch for ch in text if ch in "\n\t" or 32 <= ord(ch) < 127)
    t = t.replace("\t", " ")
    t = "\n".join(line.strip(" ") for line in t.split("\n"))
    t = re.sub(r"\n{3,}", "\n\n", t)
    return t.strip()


#: DuckDB SQL twin — used by oracle_sql() in __spark_entry__.py.  RE2 needs
#: the 'g' (global) option; Spark regexp_replace is always global.
def clean_text_sql(col_sql: str) -> str:
    # RE2 notes: multiline must be the inline (?m) flag (the 'm' option is a
    # no-op for replace); replacement strings don't interpret \n, so build
    # the double-newline replacement with chr(10).
    c = f"regexp_replace({col_sql}, '[^\\x20-\\x7E\\n\\t]', '', 'g')"
    c = f"regexp_replace({c}, '\\t', ' ', 'g')"
    c = f"regexp_replace({c}, '(?m)^ +| +$', '', 'g')"
    c = f"regexp_replace({c}, '\\n{{3,}}', chr(10)||chr(10), 'g')"
    c = f"regexp_replace({c}, '^\\s+|\\s+$', '', 'g')"
    return c


# ---------------------------------------------------------------------------
# V1: validate_text_length (reference utils.py:84-116)
# P2: preprocess = clean + empty-after-cleaning error (utils.py:73-81)
# ---------------------------------------------------------------------------
# Error strings are kept byte-identical to the reference so downstream
# consumers (and the validation endpoint's contract, M5) see the same text.

TEXT_EMPTY_AFTER_CLEANING = "Text is empty after cleaning."


def _too_short_msg(length: Column, minimum: int) -> Column:
    return F.concat(
        F.lit("Text length ("), length.cast("string"),
        F.lit(f") below minimum ({minimum})"),
    )


def _too_long_msg(label: str, length: Column, maximum: int) -> Column:
    return F.concat(
        F.lit(f"{label} length ("), length.cast("string"),
        F.lit(f") exceeds maximum ({maximum})"),
    )


def validation_error_expr(
    col: Column,
    *,
    min_len: int,
    max_len: int,
    label: str = "Text",
    check_clean: bool = True,
) -> Column:
    """NULL when valid, else the reference's exact error message.

    Mirrors the endpoint order: length-validate the *raw* text
    (routes/embedding.py:113-115), then — on the query/validate paths —
    fail texts that clean to empty (utils.py:79-80).
    """
    # strip ALL whitespace like the reference's len(text.strip()) — F.trim
    # removes ASCII spaces only, which made "\n\n" valid here but invalid
    # on the driver path.  Explicit class (no \x0B) so Spark's Java regex
    # and the DuckDB oracle's RE2 agree; \x0B-only texts are the one
    # documented deviation from Python's str.strip().
    length = F.length(F.regexp_replace(col, r"^[ \t\n\r\f]+|[ \t\n\r\f]+$", ""))
    err = (
        F.when(
            col.isNull(),
            F.lit(f"Text length (0) below minimum ({min_len})"),
        )
        .when(length < min_len, _too_short_msg(length, min_len))
        .when(length > max_len, _too_long_msg(label, length, max_len))
    )
    if check_clean:
        err = err.when(
            F.length(clean_text_expr(col)) == 0, F.lit(TEXT_EMPTY_AFTER_CLEANING)
        )
    return err.otherwise(F.lit(None).cast("string"))


def validate_text_length_py(
    text: str, *, min_len: int, max_len: int, label: str = "Text"
) -> None:
    """Driver-side strict validation (raises ValueError like utils.py:84-116)."""
    n = len(text.strip())
    if n < min_len:
        raise ValueError(f"Text length ({n}) below minimum ({min_len})")
    if n > max_len:
        raise ValueError(f"{label} length ({n}) exceeds maximum ({max_len})")


# ---------------------------------------------------------------------------
# Unicode accent folding + canonical whitespace (pre-hash normalization)
# ---------------------------------------------------------------------------
# Dedup fingerprints, shingles and vocabularies should not split on "café"
# vs "cafe" or on exotic whitespace.  The fold is an EXPLICIT character
# map (not ICU/NFKD — neither engine exposes that identically), applied
# with translate() which both Spark and DuckDB implement codepoint-wise,
# then lowercase, then whitespace-run collapse.  Deterministic by
# construction; extend the map, never swap in locale-dependent APIs.

ACCENT_FROM = (
    "áàâäãåāéèêëēíìîïīóòôöõøōúùûüūçñýÿ"
    "ÁÀÂÄÃÅĀÉÈÊËĒÍÌÎÏĪÓÒÔÖÕØŌÚÙÛÜŪÇÑÝ"
)
ACCENT_TO = (
    "aaaaaaaeeeeeiiiiiooooooouuuuucnyy"
    "AAAAAAAEEEEEIIIIIOOOOOOOUUUUUCNY"
)
assert len(ACCENT_FROM) == len(ACCENT_TO)


def normalize_text_expr(col: Column) -> Column:
    """Accent-fold → lowercase → collapse whitespace runs → trim."""
    folded = F.lower(F.translate(col, ACCENT_FROM, ACCENT_TO))
    return F.trim(F.regexp_replace(folded, r"\s+", " "))


def normalize_text_sql(col_sql: str) -> str:
    return (
        f"trim(regexp_replace(lower(translate({col_sql}, "
        f"'{ACCENT_FROM}', '{ACCENT_TO}')), '\\s+', ' ', 'g'))"
    )


def normalize_text_py(text: str) -> str:
    import re as _re

    folded = text.translate(str.maketrans(ACCENT_FROM, ACCENT_TO)).lower()
    return _re.sub(r"[ \t\n\x0b\f\r]+", " ", folded).strip()


# ---------------------------------------------------------------------------
# HTML → text (boilerplate strip for web-crawl training corpora)
# ---------------------------------------------------------------------------
# The first step of every web-derived training pipeline (C4/CCNet-style):
# drop script/style/comment payloads, keep block structure as newlines,
# strip tags, decode the common entities, collapse whitespace.  Pure
# Catalyst regexp_replace chain — every pattern sits in the Java-regex ∩
# RE2 subset (inline (?is) flags, non-greedy, NO backreferences — script
# and style need separate passes for exactly that reason), so the DuckDB
# twin replays it verbatim.  Entities decode AFTER tag stripping, the
# standard extractor order; &amp; decodes LAST so "&amp;lt;" yields the
# literal "&lt;" instead of double-decoding.

_HTML_BLOCK_BREAKS = r"(?i)</(?:p|div|h[1-6]|li|tr|table|ul|ol|blockquote)\s*>"
_HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def html_to_text_expr(col: Column) -> Column:
    x = F.regexp_replace(col, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    x = F.regexp_replace(x, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    x = F.regexp_replace(x, r"(?s)<!--.*?-->", " ")
    x = F.regexp_replace(x, r"(?i)<(?:br|hr)\s*/?\s*>", "\n")
    x = F.regexp_replace(x, _HTML_BLOCK_BREAKS, "\n")
    x = F.regexp_replace(x, r"<[^>]+>", " ")
    for ent, ch in _HTML_ENTITIES:
        x = F.replace(x, F.lit(ent), F.lit(ch))
    x = F.regexp_replace(x, r"[ \t\r]+", " ")
    x = F.regexp_replace(x, r" ?\n ?", "\n")
    x = F.regexp_replace(x, r"\n+", "\n")
    return F.btrim(x, F.lit(" \n"))


def html_to_text_sql(col_sql: str) -> str:
    """DuckDB twin — same pattern chain, 'g' flag per pass."""
    x = col_sql
    x = f"regexp_replace({x}, '(?is)<script\\b[^>]*>.*?</script\\s*>', ' ', 'g')"
    x = f"regexp_replace({x}, '(?is)<style\\b[^>]*>.*?</style\\s*>', ' ', 'g')"
    x = f"regexp_replace({x}, '(?s)<!--.*?-->', ' ', 'g')"
    x = f"regexp_replace({x}, '(?i)<(?:br|hr)\\s*/?\\s*>', chr(10), 'g')"
    x = (
        f"regexp_replace({x}, "
        f"'{_HTML_BLOCK_BREAKS}', chr(10), 'g')"
    )
    x = f"regexp_replace({x}, '<[^>]+>', ' ', 'g')"
    for ent, ch in _HTML_ENTITIES:
        lit = ch.replace("'", "''")
        x = f"replace({x}, '{ent}', '{lit}')"
    x = f"regexp_replace({x}, '[ \\t\\r]+', ' ', 'g')"
    x = f"regexp_replace({x}, ' ?\\n ?', chr(10), 'g')"
    x = f"regexp_replace({x}, '\\n+', chr(10), 'g')"
    return f"trim({x}, ' ' || chr(10))"


# ---------------------------------------------------------------------------
# C4-style line-level web cleaning (Raffel et al. 2020, §2.2)
# ---------------------------------------------------------------------------
# The published C4 recipe, line rules: keep only lines that end in a
# terminal punctuation mark and contain >= 5 words; drop lines mentioning
# javascript.  Page rules: drop pages containing '{' or 'lorem ipsum',
# or with fewer than `min_kept_lines` surviving lines.  All pure Catalyst
# higher-order array functions — no UDF, no shuffle, scales as a
# projection over the corpus.

_C4_TERMINAL = r'[.!?"’”]$'


def _c4_line_keep(line: Column, min_words: int) -> Column:
    t = F.btrim(line, F.lit(" \t"))
    words_n = F.size(
        F.filter(F.split(t, r"\s+"), lambda w: F.length(w) > 0)
    )
    return (
        t.rlike(_C4_TERMINAL)
        & (words_n >= F.lit(int(min_words)))
        & ~F.lower(t).contains("javascript")
    )


def c4_line_clean(
    df,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    min_kept_lines: int = 3,
):
    """→ (doc_id, n_lines, n_kept, keep_page, text_clean) — the C4
    line-and-page cleaning pass.  ``text_clean`` rejoins the surviving
    lines; ``keep_page`` applies the page-level rules (brace /
    lorem-ipsum boilerplate markers, minimum surviving lines).  Rejected
    pages keep their cleaned text so the filter decision stays
    auditable (the corpus_filter quarantine pattern)."""
    lines = F.split(F.col(text_col), r"\n")
    kept = F.filter(lines, lambda l: _c4_line_keep(l, min_words))
    cleaned = F.array_join(
        F.transform(kept, lambda l: F.btrim(l, F.lit(" \t"))), "\n"
    )
    n_kept = F.size(kept)
    low = F.lower(F.col(text_col))
    keep_page = (
        (n_kept >= F.lit(int(min_kept_lines)))
        & ~low.contains("{")
        & ~low.contains("lorem ipsum")
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept"),
        keep_page.alias("keep_page"),
        cleaned.alias("text_clean"),
    )


def c4_line_clean_sql(
    table: str = "documents",
    *,
    text_expr: str = "text",
    min_words: int = 5,
    min_kept_lines: int = 3,
) -> str:
    """DuckDB twin of :func:`c4_line_clean`."""
    keep = (
        "regexp_matches(trim(l, ' ' || chr(9)), '[.!?\"’”]$') AND "
        "len(list_filter(regexp_split_to_array(trim(l, ' ' || chr(9)),"
        " '\\s+'), w -> length(w) > 0)) >= {mw} AND "
        "NOT contains(lower(trim(l, ' ' || chr(9))), 'javascript')"
    ).format(mw=int(min_words))
    return f"""
WITH lx AS (
  SELECT doc_id, {text_expr} AS t,
         regexp_split_to_array({text_expr}, '\\n') AS lines
  FROM {table}),
k AS (
  SELECT doc_id, t, lines,
         list_filter(lines, l -> {keep}) AS kept
  FROM lx)
SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept,
       (len(kept) >= {int(min_kept_lines)}
        AND NOT contains(lower(t), '{{')
        AND NOT contains(lower(t), 'lorem ipsum')) AS keep_page,
       coalesce(list_aggregate(
         list_transform(kept, l -> trim(l, ' ' || chr(9))),
         'string_agg', chr(10)), '') AS text_clean
FROM k
"""


# ---------------------------------------------------------------------------
# Main-content extraction (link-density boilerplate removal)
# ---------------------------------------------------------------------------
#
# html_to_text strips markup UNIFORMLY — navigation, footers, and
# related-link rails survive as text and poison a training corpus.
# This is the jusText/Arc90-family rule reduced to its distributable,
# oracle-expressible core: split the page into block segments, score
# each by LINK DENSITY (non-whitespace chars inside <a> anchors vs the
# block's total) and word count, keep blocks under the density cap
# with enough words.  The density compare is the INTEGER inequality
# 1000*link_chars <= cap*text_chars — no division, no float, so the
# keep SET is bit-reproducible across engines (the all-integer
# threshold discipline from sampling.py).
#
# Spark shape: posexplode the block array, then every score is an
# ordinary codegen'd projection on a row-per-block frame (NOT a HOF
# lambda — the contamination_13gram lesson: interpreted per-element
# lambdas re-evaluate heavy regexes), one per-doc hash aggregate at
# the end.  Scales as scan → explode → agg; no joins, no corpus-sized
# shuffle beyond the per-doc rollup.

_LINK_PAT = r"(?is)<a\b[^>]*>(.*?)</a\s*>"


def _block_text_expr(seg: Column) -> Column:
    x = F.regexp_replace(seg, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    x = F.regexp_replace(x, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    x = F.regexp_replace(x, r"(?s)<!--.*?-->", " ")
    x = F.regexp_replace(x, r"<[^>]+>", " ")
    for ent, ch in _HTML_ENTITIES:
        x = F.replace(x, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(x, r"\s+", " "))


def html_main_content(
    df,
    *,
    id_col: str = "doc_id",
    html_col: str = "html",
    max_link_permille: int = 333,
    min_words: int = 5,
):
    """Per-document main-content report: (doc_id, n_blocks, n_kept,
    main_chars, main_md5) where kept = text blocks whose link density
    stays under ``max_link_permille`` and word count reaches
    ``min_words``.  ``main_md5`` fingerprints the kept blocks joined
    in page order (NULL when nothing survives) — the extraction itself
    is verified, not just the counts."""
    blocks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(html_col), _HTML_BLOCK_BREAKS)).alias(
            "pos", "seg"
        ),
    )
    txt = _block_text_expr(F.col("seg"))
    link_txt = F.regexp_replace(
        F.array_join(
            F.regexp_extract_all(F.col("seg"), F.lit(_LINK_PAT), F.lit(1)),
            " ",
        ),
        r"<[^>]+>",
        " ",
    )
    scored = blocks.select(
        "doc_id",
        "pos",
        txt.alias("txt"),
        F.length(F.regexp_replace(txt, r"\s+", "")).alias("_tl"),
        F.length(F.regexp_replace(link_txt, r"\s+", "")).alias("_ll"),
    ).withColumn(
        "_nw",
        F.size(F.filter(F.split(F.col("txt"), " "), lambda w: F.length(w) > 0)),
    )
    keep = (
        (F.col("_tl") > 0)
        & (
            F.lit(1000) * F.col("_ll")
            <= F.lit(int(max_link_permille)) * F.col("_tl")
        )
        & (F.col("_nw") >= F.lit(int(min_words)))
    )
    kept_struct = F.when(keep, F.struct("pos", "txt"))
    agg = scored.groupBy("doc_id").agg(
        F.sum(F.when(F.col("_tl") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_blocks"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(keep, F.length("txt")).otherwise(0))
        .cast("long")
        .alias("main_chars"),
        F.sort_array(F.collect_list(kept_struct)).alias("_kept"),
    )
    joined = F.array_join(
        F.transform(F.col("_kept"), lambda s: s["txt"]), "\n"
    )
    return agg.select(
        "doc_id",
        "n_blocks",
        "n_kept",
        "main_chars",
        F.when(F.col("n_kept") > 0, F.md5(joined)).alias("main_md5"),
    )


def html_main_content_sql(
    table: str = "pages",
    *,
    html_expr: str = "html",
    max_link_permille: int = 333,
    min_words: int = 5,
) -> str:
    """DuckDB twin of :func:`html_main_content` — same split pattern,
    same strip chain, same integer density inequality."""
    strip = "regexp_replace(seg, '(?is)<script\\b[^>]*>.*?</script\\s*>', ' ', 'g')"
    strip = f"regexp_replace({strip}, '(?is)<style\\b[^>]*>.*?</style\\s*>', ' ', 'g')"
    strip = f"regexp_replace({strip}, '(?s)<!--.*?-->', ' ', 'g')"
    strip = f"regexp_replace({strip}, '<[^>]+>', ' ', 'g')"
    for ent, ch in _HTML_ENTITIES:
        lit = ch.replace("'", "''")
        strip = f"replace({strip}, '{ent}', '{lit}')"
    strip = f"trim(regexp_replace({strip}, '\\s+', ' ', 'g'))"
    link = (
        "regexp_replace(array_to_string(regexp_extract_all(seg, "
        "'(?is)<a\\b[^>]*>(.*?)</a\\s*>', 1), ' '), '<[^>]+>', ' ', 'g')"
    )
    return f"""
WITH segs AS (
  SELECT doc_id, arr FROM (
    SELECT doc_id,
           regexp_split_to_array({html_expr},
               '{_HTML_BLOCK_BREAKS}') AS arr
    FROM {table})),
b AS (
  SELECT doc_id, generate_subscripts(arr, 1) AS pos,
         unnest(arr) AS seg
  FROM segs),
sc AS (
  SELECT doc_id, pos, {strip} AS txt,
         length(regexp_replace({strip}, '\\s+', '', 'g')) AS tl,
         -- a no-anchor block yields NULL here (array_to_string of an
         -- empty extract list), where Spark's array_join gives '' -> 0
         coalesce(length(regexp_replace({link}, '\\s+', '', 'g')), 0)
           AS ll
  FROM b),
k AS (
  SELECT doc_id, pos, txt, tl, ll,
         (tl > 0 AND 1000 * ll <= {int(max_link_permille)} * tl
          AND len(list_filter(string_split(txt, ' '),
                  w -> length(w) > 0)) >= {int(min_words)}) AS keep
  FROM sc)
SELECT doc_id,
       CAST(SUM(CASE WHEN tl > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_blocks,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN keep THEN length(txt) ELSE 0 END) AS BIGINT)
         AS main_chars,
       CASE WHEN SUM(CASE WHEN keep THEN 1 ELSE 0 END) > 0
            THEN md5(string_agg(txt, chr(10) ORDER BY pos)
                     FILTER (WHERE keep))
            END AS main_md5
FROM k
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# URL canonicalization (crawl dedup keying)
# ---------------------------------------------------------------------------
#
# The standard first-stage dedup key of every web-crawl pipeline: the
# same page gets fetched as http/https, with/without "www.", with
# tracking params, reordered query strings, fragments, and trailing
# slashes.  Rules (RFC 3986 §6 syntax-based normalization + the usual
# crawl extensions):
#   1. drop the fragment (#...)
#   2. drop the scheme (http vs https: same resource)
#   3. lowercase the host, strip a leading "www."
#   4. drop utm_* tracking params, sort the remaining query params
#   5. strip trailing "/" from the path
# Pure codegen'd Catalyst (regexp + higher-order array ops on the query
# string) — a projection: no UDF, no shuffle, runs unchanged in-stream.

def canonical_url_expr(col: Column) -> Column:
    u = F.regexp_replace(col, r"#.*$", "")                       # 1
    u = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")  # 2
    # the authority ends at the FIRST of '/', '?' or '#' — splitting on
    # '/' alone would swallow a pathless query ('example.com?b=2') into
    # the host and lowercase/skip-normalize the whole query string
    auth = F.regexp_extract(u, r"^[^/?#]*", 0)
    host = F.regexp_replace(F.lower(auth), r"^www\.", "")        # 3
    pathq = F.substring(u, F.length(auth) + 1, F.length(u))
    return F.concat(host, _canon_pathq(pathq))


def _canon_pathq(pathq: Column) -> Column:
    path = F.substring_index(pathq, "?", 1)
    has_q = F.instr(pathq, "?") > 0
    query = F.when(
        has_q, F.substring(pathq, F.length(path) + 2, F.length(pathq))
    ).otherwise(F.lit(""))
    path_c = F.regexp_replace(path, r"/+$", "")                  # 5
    params = F.filter(
        F.split(query, "&"),
        lambda x: (~x.startswith("utm_")) & (x != ""),
    )
    q_c = F.array_join(F.array_sort(params), "&")                # 4
    return F.concat(
        path_c, F.when(q_c != "", F.concat(F.lit("?"), q_c)).otherwise("")
    )


def canonical_url_sql(url_expr: str) -> str:
    """DuckDB twin of :func:`canonical_url_expr` (same rule order;
    list_filter/list_sort for the query params)."""
    u = (
        f"regexp_replace(regexp_replace({url_expr}, '#.*$', ''), "
        "'^[A-Za-z][A-Za-z0-9+.\\-]*://', '')"
    )
    return f"""(
  WITH x AS (SELECT {u} AS u),
  parts AS (
    SELECT regexp_replace(lower(regexp_extract(u, '^[^/?#]*')),
                          '^www\\.', '') AS host,
           substr(u, length(regexp_extract(u, '^[^/?#]*')) + 1) AS pathq
    FROM x),
  pq AS (
    SELECT host, split_part(pathq, '?', 1) AS path,
           CASE WHEN position('?' IN pathq) > 0
                THEN substr(pathq, length(split_part(pathq, '?', 1)) + 2)
                ELSE '' END AS query
    FROM parts)
  SELECT host || regexp_replace(path, '/+$', '') ||
         CASE WHEN q <> '' THEN '?' || q ELSE '' END
  FROM (
    SELECT host, path,
           coalesce(list_aggregate(list_sort(list_filter(
             string_split(query, '&'),
             p -> NOT starts_with(p, 'utm_') AND p <> '')),
             'string_agg', '&'), '') AS q
    FROM pq)
)"""

"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

All pure built-in column expressions (whole-stage codegen, no Python), each
with a DuckDB SQL twin for the correctness oracle.  These extend the
reference's surface per the build brief (the reference itself has only the
cleaning ops, SURVEY.md §2.5) — designed for the ``documents`` table but
applicable to any string column at 100 TB (narrow projections, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from inception_spark.functions.hashing import words, words_sql
from inception_spark.tokenizer import TOKEN_PATTERN_SQL

# ---------------------------------------------------------------------------
# token counting — same rule as the chunker's RegexTokenizer
# ---------------------------------------------------------------------------


def token_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_PATTERN_SQL), F.lit(0)))


def token_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{TOKEN_PATTERN_SQL}'))"


def word_count(col: Column) -> Column:
    return F.size(words(col))


def word_count_sql(expr: str) -> str:
    return f"len({words_sql(expr)})"


# ---------------------------------------------------------------------------
# language ID — stopword-overlap heuristic
# ---------------------------------------------------------------------------
# Tiny curated stopword lists; the *argmax of overlap ratios* is the
# prediction.  Deterministic tie-break: first language in LANGS order wins
# (strict greater-than comparisons).

LANGS = ["en", "de", "fr", "es"]

STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
           "with", "as", "on", "be", "at", "by", "this", "have", "not", "are"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "den", "mit",
           "auf", "ein", "eine", "nicht", "im", "sich", "des", "auch", "es"],
    "fr": ["le", "la", "les", "et", "de", "des", "un", "une", "est", "en",
           "que", "qui", "dans", "pour", "pas", "au", "plus", "par", "sur"],
    "es": ["el", "la", "los", "las", "y", "de", "que", "en", "un", "una",
           "es", "por", "con", "para", "del", "se", "no", "su", "al", "lo"],
}


def _lang_hits(w: Column, lang: str) -> Column:
    return F.size(F.array_intersect(w, F.array(*[F.lit(s) for s in STOPWORDS[lang]])))


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language overlap count of distinct words with the stopword list."""
    w = F.array_distinct(words(col))
    return {lang: _lang_hits(w, lang) for lang in LANGS}


def lang_id(col: Column) -> Column:
    """Predicted language code, 'und' when nothing matched."""
    scores = lang_scores(col)
    # argmax with first-wins tie-break, expressed as nested CASE WHEN:
    # lang L wins if score(L) > 0 and score(L) >= all later langs and
    # score(L) > all earlier langs (strict) — equivalently evaluate in
    # order with >= against the running best of the remaining.
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(LANGS):
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def _lang_hits_sql(w_expr: str, lang: str) -> str:
    lst = ", ".join(f"'{s}'" for s in STOPWORDS[lang])
    return f"len(list_intersect({w_expr}, [{lst}]))"


def lang_id_sql(expr: str) -> str:
    w = f"list_distinct({words_sql(expr)})"
    hits = {lang: _lang_hits_sql(w, lang) for lang in LANGS}
    best = "greatest(" + ", ".join(hits.values()) + ")"
    sql = "'und'"
    for lang in reversed(LANGS):
        sql = (
            f"CASE WHEN {hits[lang]} > 0 AND {hits[lang]} = {best} "
            f"THEN '{lang}' ELSE {sql} END"
        )
    return sql


# ---------------------------------------------------------------------------
# quality scoring — length/punct/stopword/digit ratios
# ---------------------------------------------------------------------------
# score in [0,1]: weighted blend of
#   * length_ok: 1 if 50 <= n_chars <= 100_000 (ramps at the low end)
#   * alpha_ratio: alphabetic chars / non-space chars
#   * stopword_ratio hit: fraction of words that are (en) stopwords,
#     capped at 0.4 (typical natural text sits 0.2-0.5)
#   * digit penalty: fraction of digit chars
# Arithmetic kept to plain +,*,/,least/greatest so both engines agree
# bit-for-bit after rounding to 4 decimals.


def quality_score(col: Column) -> Column:
    n_chars = F.length(col).cast("double")
    nonspace = F.length(F.regexp_replace(col, r"\s", "")).cast("double")
    alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", "")).cast("double")
    digits = F.length(F.regexp_replace(col, r"[^0-9]", "")).cast("double")
    w = words(col)
    n_words = F.size(w).cast("double")
    stop_hits = F.size(
        F.array_intersect(F.array_distinct(w),
                          F.array(*[F.lit(s) for s in STOPWORDS["en"]]))
    ).cast("double")

    length_ok = F.least(n_chars / F.lit(50.0), F.lit(1.0))
    alpha_ratio = F.when(nonspace > 0, alpha / nonspace).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, F.least(stop_hits / n_words * 2.5, F.lit(1.0))).otherwise(F.lit(0.0))
    digit_pen = F.when(nonspace > 0, F.lit(1.0) - digits / nonspace).otherwise(F.lit(0.0))
    return F.round(
        F.lit(0.25) * length_ok
        + F.lit(0.35) * alpha_ratio
        + F.lit(0.2) * stop_ratio
        + F.lit(0.2) * digit_pen,
        4,
    )


def quality_score_sql(expr: str) -> str:
    n_chars = f"CAST(length({expr}) AS DOUBLE)"
    nonspace = f"CAST(length(regexp_replace({expr}, '\\s', '', 'g')) AS DOUBLE)"
    alpha = f"CAST(length(regexp_replace({expr}, '[^A-Za-z]', '', 'g')) AS DOUBLE)"
    digits = f"CAST(length(regexp_replace({expr}, '[^0-9]', '', 'g')) AS DOUBLE)"
    w = words_sql(expr)
    n_words = f"CAST(len({w}) AS DOUBLE)"
    stop_hits = f"CAST({_lang_hits_sql(f'list_distinct({w})', 'en')} AS DOUBLE)"
    length_ok = f"least({n_chars} / 50.0, 1.0)"
    alpha_ratio = f"(CASE WHEN {nonspace} > 0 THEN {alpha} / {nonspace} ELSE 0.0 END)"
    stop_ratio = (
        f"(CASE WHEN {n_words} > 0 THEN least({stop_hits} / {n_words} * 2.5, 1.0) "
        f"ELSE 0.0 END)"
    )
    digit_pen = f"(CASE WHEN {nonspace} > 0 THEN 1.0 - {digits} / {nonspace} ELSE 0.0 END)"
    return (
        f"round(0.25 * {length_ok} + 0.35 * {alpha_ratio} + "
        f"0.2 * {stop_ratio} + 0.2 * {digit_pen}, 4)"
    )


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------
# Normalized-content fingerprint: md5 over lowercased words joined by single
# spaces — invariant to case, punctuation and whitespace layout.  This is
# the exact-dedup key.


def fingerprint(col: Column) -> Column:
    return F.md5(F.concat_ws(" ", words(col)))


def fingerprint_sql(expr: str) -> str:
    # coalesce: DuckDB string_agg over an empty list yields NULL, while
    # Spark's concat_ws over an empty array yields '' — align on ''.
    return (
        f"md5(coalesce(list_aggregate({words_sql(expr)}, "
        f"'string_agg', ' '), ''))"
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms
# ---------------------------------------------------------------------------


def doc_unigram_logprob(df, *, id_col="doc_id", text_col="text"):
    """CCNet-style corpus-LM quality signal: per-document mean unigram
    log-probability under the corpus's own word distribution —
    (doc_id, n_words, mean_logprob).  Documents full of rare/garbled
    tokens score low; formulaic boilerplate scores high; both tails are
    filter candidates.

    Determinism discipline: each word's ln(freq/total) is rounded to 6 dp
    and summed as DECIMAL(28,6) — exact, order-independent — then divided
    by the word count in double and rounded to 4.  (A raw double sum over
    a shuffle would be partition-order-dependent and could never
    hash-match the oracle.)  Plan: one explode, two hash aggregates, one
    broadcast of the |vocab|-row frequency table's totals — no shuffle
    beyond the semantics."""
    from pyspark.sql import functions as F

    from inception_spark.functions.hashing import words

    ex = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(words(F.col(text_col))).alias("w"),
    )
    freq = ex.groupBy("w").agg(F.count(F.lit(1)).alias("wf"))
    total = ex.agg(F.count(F.lit(1)).cast("double").alias("total_words"))
    scored = (
        ex.join(freq, "w")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.round(
                F.log(F.col("wf").cast("double") / F.col("total_words")), 6
            )
            .cast("decimal(28,6)")
            .alias("lp"),
        )
    )
    # no final round: the decimal sum and the count are engine-identical,
    # so the IEEE quotient already matches bit-for-bit — while rounding
    # a quotient of an exact decimal can land on the half-boundary where
    # Spark's and DuckDB's round() disagree (see doc_word_entropy)
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        (F.sum("lp").cast("double") / F.count(F.lit(1))).alias(
            "mean_logprob"
        ),
    )


def doc_unigram_logprob_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`doc_unigram_logprob`."""
    return f"""
WITH ex AS (
  SELECT doc_id, unnest({words_sql('text')}) AS w FROM {table}),
freq AS (SELECT w, COUNT(*) AS wf FROM ex GROUP BY w),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total_words FROM ex),
scored AS (
  SELECT doc_id,
         CAST(round(ln(CAST(wf AS DOUBLE) / total_words), 6)
              AS DECIMAL(28,6)) AS lp
  FROM ex JOIN freq USING (w), tot)
SELECT doc_id, COUNT(*) AS n_words,
       CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS mean_logprob
FROM scored GROUP BY doc_id
"""


def doc_bigram_logprob(df, *, id_col="doc_id", text_col="text"):
    """Markov-order-2 corpus-LM quality signal: per-document mean
    conditional bigram log-probability ln p(w2|w1) under the corpus's
    own bigram counts — (doc_id, n_bigrams, mean_logprob).  The bigram
    model separates "plausible word sequences" from "bag of frequent
    words", which the unigram score cannot: shuffled text keeps its
    unigram score but craters here.  KenLM-style pipelines (CCNet) use
    a 5-gram; order 2 is the in-engine analog with the same filtering
    power at corpus scale.

    MLE probabilities (no smoothing) are total on resubstitution: every
    bigram being scored was counted, so c12 ≥ 1 and the ratio never hits
    zero.  Same determinism discipline as :func:`doc_unigram_logprob`
    (6-dp rounded terms, exact DECIMAL sum, one final double divide).
    Plan: bigram explode → two hash aggregates (c12, c1) → join back →
    per-doc aggregate → left join onto the doc list so 0/1-word docs
    surface with n_bigrams=0 instead of vanishing."""
    from pyspark.sql import functions as F

    from inception_spark.functions.hashing import words

    ws = words(F.col(text_col))
    n = F.size(ws)
    bg = F.zip_with(
        F.slice(ws, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(ws, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    ex = df.select(
        F.col(id_col).alias("doc_id"), F.explode(bg).alias("bg")
    ).select(
        "doc_id",
        "bg",
        F.substring_index(F.col("bg"), " ", 1).alias("w1"),
    )
    c12 = ex.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    c1 = ex.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    scored = (
        ex.join(c12, "bg")
        .join(c1, "w1")
        .select(
            "doc_id",
            F.round(
                F.log(F.col("c12").cast("double") / F.col("c1")), 6
            )
            .cast("decimal(28,6)")
            .alias("lp"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("nb"),
        (F.sum("lp").cast("double") / F.count(F.lit(1))).alias("mlp"),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("nb"), F.lit(0)).alias("n_bigrams"),
            F.col("mlp").alias("mean_logprob"),
        )
    )


def doc_bigram_logprob_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`doc_bigram_logprob`."""
    w = words_sql("text")
    return f"""
WITH ws AS (SELECT doc_id, {w} AS ws FROM {table}),
ex AS (
  SELECT doc_id,
         unnest(list_transform(
           list_zip(ws[1:len(ws)-1], ws[2:len(ws)]),
           p -> p[1] || ' ' || p[2])) AS bg
  FROM ws),
ex2 AS (SELECT doc_id, bg, split_part(bg, ' ', 1) AS w1 FROM ex),
c12 AS (SELECT bg, COUNT(*) AS c12 FROM ex2 GROUP BY bg),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM ex2 GROUP BY w1),
scored AS (
  SELECT doc_id,
         CAST(round(ln(CAST(c12 AS DOUBLE) / c1), 6)
              AS DECIMAL(28,6)) AS lp
  FROM ex2 JOIN c12 USING (bg) JOIN c1 USING (w1)),
per_doc AS (
  SELECT doc_id, COUNT(*) AS nb,
         CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS mlp
  FROM scored GROUP BY doc_id)
SELECT t.doc_id, COALESCE(p.nb, 0) AS n_bigrams, p.mlp AS mean_logprob
FROM {table} t LEFT JOIN per_doc p ON t.doc_id = p.doc_id
"""


def doc_word_entropy(df, *, id_col="doc_id", text_col="text"):
    """Per-document word-distribution entropy (nats):
    (doc_id, n_words, n_distinct, entropy).  Low entropy flags
    repetitive/boilerplate text, abnormally high entropy flags gibberish
    — both standard corpus-quality gates.

    Same determinism discipline as :func:`doc_unigram_logprob`: each
    term's −p·ln(p) is rounded to 6 dp and summed as DECIMAL(28,6)
    (order-independent); the entropy is that exact 6-dp sum cast to
    double, NOT re-rounded — re-rounding an exactly-representable
    decimal hits the x.xxxx50 half-boundary on ~1% of documents, where
    Spark's round (BigDecimal.valueOf → shortest-string HALF_UP) and
    DuckDB's (binary-double) disagree.  Plan: one explode + two hash
    aggregates."""
    from pyspark.sql import functions as F

    from inception_spark.functions.hashing import words

    ex = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(words(F.col(text_col))).alias("w"),
    )
    wc = ex.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    totals = ex.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words")
    )
    terms = wc.join(totals, "doc_id").select(
        "doc_id",
        "n_words",
        F.round(
            -(F.col("c").cast("double") / F.col("n_words"))
            * F.log(F.col("c").cast("double") / F.col("n_words")),
            6,
        )
        .cast("decimal(28,6)")
        .alias("h_term"),
    )
    return terms.groupBy("doc_id", "n_words").agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum("h_term").cast("double").alias("entropy"),
    ).select("doc_id", "n_words", "n_distinct", "entropy")


def doc_word_entropy_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`doc_word_entropy`."""
    return f"""
WITH ex AS (
  SELECT doc_id, unnest({words_sql('text')}) AS w FROM {table}),
wc AS (SELECT doc_id, w, COUNT(*) AS c FROM ex GROUP BY doc_id, w),
tot AS (SELECT doc_id, COUNT(*) AS n_words FROM ex GROUP BY doc_id),
terms AS (
  SELECT wc.doc_id, tot.n_words,
         CAST(round(-(CAST(c AS DOUBLE) / n_words)
                    * ln(CAST(c AS DOUBLE) / n_words), 6)
              AS DECIMAL(28,6)) AS h_term
  FROM wc JOIN tot ON wc.doc_id = tot.doc_id)
SELECT doc_id, n_words, COUNT(*) AS n_distinct,
       CAST(SUM(h_term) AS DOUBLE) AS entropy
FROM terms GROUP BY doc_id, n_words
"""


def doc_repetition_stats(df, *, id_col="doc_id", text_col="text"):
    """Gopher-style repetition filters (Rae et al. 2021, appendix A1.1):
    per-document fraction of word-character mass captured by the most
    common word / 2-gram / 3-gram, and by *duplicated* 5-grams —
    (doc_id, n_words, top_word_frac, top_2gram_frac, top_3gram_frac,
    dup_5gram_frac).  High values flag boilerplate and degenerate
    repetition; standard pretraining-corpus quality gates.

    Character mass of an n-gram = occurrences × length (spaces included)
    over the summed mass of all n-grams at that level; levels missing for
    short documents (fewer than n words) yield NULL fractions.  "Most
    common" ties break on the lexicographically smallest gram
    (min over struct(-count, gram) — same rule as the oracle's
    ``ORDER BY cnt DESC, gram``).

    Plan: ONE posexplode of the word array + window leads builds all four
    gram levels in a single pass (the same shape as
    ``dedup.exploded_shingles`` — higher-order-function gram builders
    re-evaluate the words subtree per element and measure ~5× slower);
    then two hash aggregates, both keyed by doc_id-prefixed keys with
    map-side partial aggregation.  No join — scale-safe at 100 TB.
    Documents with zero words vanish (no gram rows); the harness corpus
    has none."""
    from pyspark.sql import Window

    pw = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(words(F.col(text_col))).alias("pos", "w"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    # windows can't appear inside a generator — materialize the leads
    # first, then build the gram levels from plain columns
    pw = pw.select(
        "doc_id",
        "w",
        *[F.lead("w", i).over(win).alias(f"w{i}") for i in range(1, 5)],
    )
    lead = [F.col("w")] + [F.col(f"w{i}") for i in range(1, 5)]

    def gram(n: int) -> Column:
        # concat_ws skips NULLs, so gate on the LAST lead: within a doc the
        # leads are contiguous — lead(n-1) non-null implies all earlier are.
        return F.when(
            lead[n - 1].isNotNull(), F.concat_ws(" ", *lead[:n])
        ).otherwise(F.lit(None))

    levels = pw.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("level"), gram(n).alias("gram")
                    )
                    for n in (1, 2, 3, 5)
                ]
            )
        ).alias("lg"),
    ).select(
        "doc_id", F.col("lg.level").alias("level"), F.col("lg.gram").alias("gram")
    ).filter(F.col("gram").isNotNull())

    counts = levels.groupBy("doc_id", "level", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    mass = F.col("cnt") * F.length("gram").cast("long")
    per_level = counts.groupBy("doc_id", "level").agg(
        F.sum("cnt").alias("n_occ"),
        F.sum(mass).alias("total_mass"),
        F.min(
            F.struct(
                (-F.col("cnt")).alias("negc"),
                F.col("gram").alias("g"),
                mass.alias("m"),
            )
        ).getField("m").alias("top_mass"),
        F.sum(F.when(F.col("cnt") > 1, mass)).alias("dup_mass"),
    )

    def at(level: int, col: str) -> Column:
        return F.max(F.when(F.col("level") == level, F.col(col)))

    def frac(num: Column, den: Column) -> Column:
        # int/int ratio: binary-exact halves only — round(6) is
        # engine-stable (see doc_word_entropy for the decimal caveat)
        return F.round(num.cast("double") / den.cast("double"), 6)

    return per_level.groupBy("doc_id").agg(
        at(1, "n_occ").alias("n_words"),
        frac(at(1, "top_mass"), at(1, "total_mass")).alias("top_word_frac"),
        frac(at(2, "top_mass"), at(2, "total_mass")).alias("top_2gram_frac"),
        frac(at(3, "top_mass"), at(3, "total_mass")).alias("top_3gram_frac"),
        frac(
            F.coalesce(at(5, "dup_mass"), F.lit(0)), at(5, "total_mass")
        ).alias("dup_5gram_frac"),
    )


def doc_repetition_stats_sql(table: str = "documents") -> str:
    """DuckDB twin of :func:`doc_repetition_stats`."""
    leads = ["w"] + [f"lead(w, {i}) OVER win" for i in range(1, 5)]

    def gram(n: int) -> str:
        cat = " || ' ' || ".join(leads[:n])
        return (
            f"CASE WHEN {leads[n - 1]} IS NOT NULL THEN {cat} END"
        )

    return f"""
WITH wt AS (SELECT doc_id, {words_sql('text')} AS ws FROM {table}),
ex AS (SELECT doc_id, unnest(ws) AS w,
              generate_subscripts(ws, 1) AS pos FROM wt),
g AS (SELECT doc_id, {gram(1)} AS g1, {gram(2)} AS g2,
             {gram(3)} AS g3, {gram(5)} AS g5
      FROM ex WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
lv AS (
  SELECT doc_id, 1 AS level, g1 AS gram FROM g WHERE g1 IS NOT NULL
  UNION ALL SELECT doc_id, 2, g2 FROM g WHERE g2 IS NOT NULL
  UNION ALL SELECT doc_id, 3, g3 FROM g WHERE g3 IS NOT NULL
  UNION ALL SELECT doc_id, 5, g5 FROM g WHERE g5 IS NOT NULL),
c AS (SELECT doc_id, level, gram, COUNT(*) AS cnt
      FROM lv GROUP BY 1, 2, 3),
r AS (SELECT doc_id, level, cnt, cnt * length(gram) AS m,
             row_number() OVER (PARTITION BY doc_id, level
                                ORDER BY cnt DESC, gram) AS rn
      FROM c),
pl AS (SELECT doc_id, level,
              CAST(SUM(cnt) AS BIGINT) AS n_occ,
              CAST(SUM(m) AS BIGINT) AS total_mass,
              MAX(CASE WHEN rn = 1 THEN m END) AS top_mass,
              SUM(CASE WHEN cnt > 1 THEN m END) AS dup_mass
       FROM r GROUP BY 1, 2)
SELECT doc_id,
  MAX(CASE WHEN level = 1 THEN n_occ END) AS n_words,
  round(CAST(MAX(CASE WHEN level = 1 THEN top_mass END) AS DOUBLE)
        / MAX(CASE WHEN level = 1 THEN total_mass END), 6) AS top_word_frac,
  round(CAST(MAX(CASE WHEN level = 2 THEN top_mass END) AS DOUBLE)
        / MAX(CASE WHEN level = 2 THEN total_mass END), 6) AS top_2gram_frac,
  round(CAST(MAX(CASE WHEN level = 3 THEN top_mass END) AS DOUBLE)
        / MAX(CASE WHEN level = 3 THEN total_mass END), 6) AS top_3gram_frac,
  round(CAST(COALESCE(MAX(CASE WHEN level = 5 THEN dup_mass END), 0) AS DOUBLE)
        / MAX(CASE WHEN level = 5 THEN total_mass END), 6) AS dup_5gram_frac
FROM pl GROUP BY doc_id
"""


def tfidf_top_terms(df, *, id_col="doc_id", text_col="text", top_n=3):
    """Top-n characteristic terms per document by TF-IDF:
    (doc_id, term, tf, df_docs, tfidf, term_rank).

    tf = in-document count, idf = ln(N / df) with exact integer counts, so
    the only float op is one log+multiply per (doc, term) — deterministic
    and oracle-checkable.  Plan: one explode + two hash aggregates + a
    per-doc window; the corpus-size scalar rides a broadcast cross join.
    Ties broken alphabetically for reproducible top-n sets."""
    from pyspark.sql import DataFrame, Window
    from pyspark.sql import functions as F

    from inception_spark.functions.hashing import words

    ex = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(words(F.col(text_col))).alias("term"),
    )
    tf = ex.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        ex.distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_docs"))
    )
    n_docs = df.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("n_docs") / F.col("df_docs").cast("double")),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("term_rank") <= top_n)
        .select("doc_id", "term", "tf", "df_docs", "tfidf", "term_rank")
    )


def corpus_report(df, *, source_col="source", text_col="text",
                  lang_col="lang"):
    """Per-source corpus profile — the curation dashboard query: document
    count, size, mean words, mean quality, language mix, and the modal
    language per source.

    Determinism engineering: avg_words is a ratio of integers (safe to
    round — a decimal-half quotient of ints is binary-exact in both
    engines); avg_quality sums the already-4dp-rounded per-doc scores
    through DECIMAL(18,4) (exact, order-independent) and divides in
    double LAST, output unrounded (re-rounding a decimal-derived double
    diverges across engines on representability halves).  top_lang is
    the modal ``lang`` with alphabetical tie-break.

    Scale shape: one hash aggregate by source (map-side combine over
    whatever partitioning the scan yields), plus a tiny (source × lang)
    aggregate for the mode — both shuffle only group keys, never text."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    base = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length(F.col(text_col))).cast("long").alias("total_chars"),
        F.round(
            F.sum(word_count(F.col(text_col))).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("avg_words"),
        (
            F.sum(quality_score(F.col(text_col)).cast("decimal(18,4)"))
            .cast("double")
            / F.count(F.lit(1))
        ).alias("avg_quality"),
        F.countDistinct(F.col(lang_col)).cast("long").alias("n_langs"),
    )
    lc = df.groupBy(
        F.col(source_col).alias("source"), F.col(lang_col).alias("lang")
    ).agg(F.count(F.lit(1)).alias("n"))
    # asc_nulls_last, not asc: Spark ASC defaults NULLS FIRST while DuckDB
    # defaults NULLS LAST — a NULL lang would win every tie on one engine
    # and lose it on the other (advisor finding, round 2)
    w = Window.partitionBy("source").orderBy(
        F.desc("n"), F.asc_nulls_last("lang")
    )
    top = (
        lc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    return base.join(top, "source")


def corpus_report_sql(table: str = "documents", *, source_col="source",
                      text_col="text", lang_col="lang") -> str:
    q = quality_score_sql(text_col)
    return f"""
WITH base AS (
  SELECT {source_col} AS source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(length({text_col})) AS BIGINT) AS total_chars,
         round(CAST(SUM({word_count_sql(text_col)}) AS DOUBLE)
               / COUNT(*), 4) AS avg_words,
         CAST(SUM(CAST({q} AS DECIMAL(18,4))) AS DOUBLE)
               / COUNT(*) AS avg_quality,
         CAST(COUNT(DISTINCT {lang_col}) AS BIGINT) AS n_langs
  FROM {table} GROUP BY {source_col}),
lc AS (
  SELECT {source_col} AS source, {lang_col} AS lang, COUNT(*) AS n
  FROM {table} GROUP BY {source_col}, {lang_col}),
top AS (
  SELECT source, lang AS top_lang
  FROM (SELECT *, row_number() OVER (
            PARTITION BY source ORDER BY n DESC, lang ASC NULLS LAST) AS rn
        FROM lc)
  WHERE rn = 1)
SELECT b.*, t.top_lang FROM base b JOIN top t USING (source)
"""


# ---------------------------------------------------------------------------
# legal citation extraction (the reference's home domain: court opinions)
# ---------------------------------------------------------------------------
# The reference embeds legal opinions (freelawproject/inception serves
# CourtListener); a corpus pipeline over that domain wants the citation
# graph.  Patterns live in the Java-regex ∩ RE2 subset like pii.py.

CITATION_PATTERNS: dict[str, str] = {
    # 347 U.S. 483  (U.S. Supreme Court reporter)
    "us": r"\b\d{1,3} U\.S\. \d{1,4}\b",
    # 163 F.3d 952 / 98 F. Supp. 797  (federal reporters)
    "fed": r"\b\d{1,3} F\.(?: Supp\.)?(?:[23]d)? \d{1,4}\b",
    # 410 P.2d 535 / 12 N.E.3d 44  (regional reporters, common series)
    "regional": r"\b\d{1,3} (?:P|N\.E|N\.W|S\.E|S\.W|A|So)\.(?:[23]d)? \d{1,4}\b",
    # § 1983 statute sections
    "section": r"§ ?\d+[a-z]?\b",
}


def citation_count(col: Column, kind: str) -> Column:
    return F.size(
        F.regexp_extract_all(col, F.lit(CITATION_PATTERNS[kind]), F.lit(0))
    ).cast("bigint")


def citation_count_sql(expr: str, kind: str) -> str:
    return (
        f"CAST(len(regexp_extract_all({expr}, "
        f"'{CITATION_PATTERNS[kind]}')) AS BIGINT)"
    )


def extract_citations(df, *, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document citation inventory: counts per reporter family plus
    the ordered '|'-joined list of extracted citation strings — the
    input to a citation-graph build (explode on split('|') downstream).
    One codegen projection, no shuffle."""
    c = F.col(text_col)
    counts = {f"n_{k}": citation_count(c, k) for k in CITATION_PATTERNS}
    all_pat = "|".join(f"(?:{p})" for p in CITATION_PATTERNS.values())
    return df.select(
        F.col(id_col),
        *[v.alias(k) for k, v in counts.items()],
        F.array_join(
            F.regexp_extract_all(c, F.lit(all_pat), F.lit(0)), "|"
        ).alias("citations"),
    )


def extract_citations_sql(table: str = "documents", *,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> str:
    counts = ",\n       ".join(
        f"{citation_count_sql(text_col, k)} AS n_{k}"
        for k in CITATION_PATTERNS
    )
    all_pat = "|".join(f"(?:{p})" for p in CITATION_PATTERNS.values())
    return f"""
SELECT {id_col},
       {counts},
       COALESCE(list_aggregate(regexp_extract_all({text_col}, '{all_pat}'),
                               'string_agg', '|'), '') AS citations
FROM {table}
"""


def doc_trigram_logprob(
    df,
    *,
    id_col="doc_id",
    text_col="text",
    train_mod=2,
    alpha=0.4,
):
    """Stupid-backoff trigram LM quality score (Brants et al. 2007, the
    web-scale LM recipe built from nothing but counts): per-document mean
    ln S(w3|w1,w2) — (doc_id, n_trigrams, mean_logprob).

    S(w3|w1w2) = c123/c12 when the trigram was seen, else α·c23/c2, else
    α²·c3/N, else the α²/(N+1) OOV floor.  Unlike the resubstitution
    bigram score (where every n-gram was counted and backoff is dead
    code), the model here trains on the ``doc_id % train_mod == 0`` slice
    and scores EVERY document, so the backoff chain is genuinely
    exercised on held-out docs.  Each denominator is ≥1 whenever its
    branch is taken (a seen trigram implies its prefix bigram was seen,
    etc.), so the ANSI division never trips.

    Scale shape: ONE words() regex pass per side — the train slice's
    word arrays are lazily checkpointed and the trigram/bigram/unigram
    count tables all derive from that relation; scoring is 5 left joins
    against count tables (broadcast when small, ordinary shuffle joins
    for web-scale vocabularies — Catalyst/AQE picks) + one per-doc
    aggregate.  Same 6-dp DECIMAL determinism as
    :func:`doc_unigram_logprob`."""
    from pyspark.sql import functions as F

    from inception_spark.functions.hashing import words

    base = df.select(
        F.col(id_col).alias("doc_id"), words(F.col(text_col)).alias("ws")
    )
    tws = base.filter(
        (F.col("doc_id") % train_mod) == 0
    ).localCheckpoint(eager=False)

    def grams(rel, n):
        sz = F.size(F.col("ws"))
        cols = [
            F.slice(F.col("ws"), i + 1, F.greatest(sz - (n - 1), F.lit(0)))
            for i in range(n)
        ]
        g = cols[0]
        for c in cols[1:]:
            g = F.zip_with(g, c, lambda a, b: F.concat(a, F.lit(" "), b))
        return rel.select("doc_id", F.explode(g).alias("g"))

    t123 = grams(tws, 3).groupBy("g").agg(F.count(F.lit(1)).alias("c123"))
    tb = grams(tws, 2).groupBy("g").agg(F.count(F.lit(1)).alias("cb"))
    tu = (
        tws.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    ntot = tws.select(F.explode("ws").alias("w")).agg(
        F.count(F.lit(1)).alias("n_train")
    )

    ex = grams(base, 3).select(
        "doc_id",
        F.col("g"),
        F.substring_index(F.col("g"), " ", 2).alias("bg12"),
        F.substring_index(F.col("g"), " ", -2).alias("bg23"),
        F.substring_index(F.col("g"), " ", -1).alias("w3"),
        F.substring_index(
            F.substring_index(F.col("g"), " ", 2), " ", -1
        ).alias("w2"),
    )
    j = (
        ex.join(t123.withColumnRenamed("g", "_t"), ex["g"] == F.col("_t"), "left")
        .join(
            tb.select(F.col("g").alias("_b12"), F.col("cb").alias("c12")),
            F.col("bg12") == F.col("_b12"),
            "left",
        )
        .join(
            tb.select(F.col("g").alias("_b23"), F.col("cb").alias("c23")),
            F.col("bg23") == F.col("_b23"),
            "left",
        )
        .join(
            tu.select(F.col("w").alias("_w2"), F.col("cu").alias("c2")),
            F.col("w2") == F.col("_w2"),
            "left",
        )
        .join(
            tu.select(F.col("w").alias("_w3"), F.col("cu").alias("c3")),
            F.col("w3") == F.col("_w3"),
            "left",
        )
        .crossJoin(F.broadcast(ntot))
    )
    a = F.lit(float(alpha))
    a2 = F.lit(float(alpha) * float(alpha))
    s = (
        F.when(
            F.col("c123").isNotNull(),
            F.col("c123").cast("double") / F.col("c12"),
        )
        .when(
            F.col("c23").isNotNull(),
            a * (F.col("c23").cast("double") / F.col("c2")),
        )
        .when(
            F.col("c3").isNotNull(),
            a2 * (F.col("c3").cast("double") / F.col("n_train")),
        )
        .otherwise(a2 / (F.col("n_train") + F.lit(1)).cast("double"))
    )
    scored = j.select(
        "doc_id",
        F.round(F.log(s), 6).cast("decimal(28,6)").alias("lp"),
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("nt"),
        (F.sum("lp").cast("double") / F.count(F.lit(1))).alias("mlp"),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("nt"), F.lit(0)).alias("n_trigrams"),
            F.col("mlp").alias("mean_logprob"),
        )
    )


def doc_trigram_logprob_sql(
    table: str = "documents", *, train_mod: int = 2, alpha: float = 0.4
) -> str:
    """DuckDB twin of :func:`doc_trigram_logprob`."""
    w = words_sql("text")
    a = f"CAST({alpha} AS DOUBLE)"
    a2 = f"CAST({alpha * alpha} AS DOUBLE)"
    return f"""
WITH base AS (SELECT doc_id, {w} AS ws FROM {table}),
tws AS (SELECT * FROM base WHERE doc_id % {train_mod} = 0),
t123 AS (
  SELECT g, COUNT(*) AS c123 FROM (
    SELECT unnest(list_transform(
      list_zip(ws[1:len(ws)-2], ws[2:len(ws)-1], ws[3:len(ws)]),
      p -> p[1] || ' ' || p[2] || ' ' || p[3])) AS g FROM tws)
  GROUP BY g),
tb AS (
  SELECT g, COUNT(*) AS cb FROM (
    SELECT unnest(list_transform(
      list_zip(ws[1:len(ws)-1], ws[2:len(ws)]),
      p -> p[1] || ' ' || p[2])) AS g FROM tws)
  GROUP BY g),
tu AS (
  SELECT w, COUNT(*) AS cu FROM (SELECT unnest(ws) AS w FROM tws)
  GROUP BY w),
ntot AS (SELECT COUNT(*) AS n_train FROM (SELECT unnest(ws) FROM tws)),
ex AS (
  SELECT doc_id, g,
         split_part(g, ' ', 1) || ' ' || split_part(g, ' ', 2) AS bg12,
         split_part(g, ' ', 2) || ' ' || split_part(g, ' ', 3) AS bg23,
         split_part(g, ' ', 2) AS w2, split_part(g, ' ', 3) AS w3
  FROM (
    SELECT doc_id, unnest(list_transform(
      list_zip(ws[1:len(ws)-2], ws[2:len(ws)-1], ws[3:len(ws)]),
      p -> p[1] || ' ' || p[2] || ' ' || p[3])) AS g FROM base)),
scored AS (
  SELECT e.doc_id,
         CAST(round(ln(
           CASE
             WHEN t.c123 IS NOT NULL
               THEN CAST(t.c123 AS DOUBLE) / b12.cb
             WHEN b23.cb IS NOT NULL
               THEN {a} * (CAST(b23.cb AS DOUBLE) / u2.cu)
             WHEN u3.cu IS NOT NULL
               THEN {a2} * (CAST(u3.cu AS DOUBLE) / n.n_train)
             ELSE {a2} / CAST(n.n_train + 1 AS DOUBLE)
           END), 6) AS DECIMAL(28,6)) AS lp
  FROM ex e
  LEFT JOIN t123 t ON t.g = e.g
  LEFT JOIN tb b12 ON b12.g = e.bg12
  LEFT JOIN tb b23 ON b23.g = e.bg23
  LEFT JOIN tu u2 ON u2.w = e.w2
  LEFT JOIN tu u3 ON u3.w = e.w3
  CROSS JOIN ntot n),
per_doc AS (
  SELECT doc_id, COUNT(*) AS nt,
         CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS mlp
  FROM scored GROUP BY doc_id)
SELECT t.doc_id, COALESCE(p.nt, 0) AS n_trigrams, p.mlp AS mean_logprob
FROM {table} t LEFT JOIN per_doc p ON t.doc_id = p.doc_id
"""


# ---------------------------------------------------------------------------
# snapshot-over-snapshot drift: the crawl-monitoring query
# ---------------------------------------------------------------------------

def corpus_drift_report(old_df, new_df, *, lang_col="lang",
                        source_col="source", chars_col="n_chars"):
    """Distribution shift between two corpus snapshots — the query a
    crawl pipeline runs before accepting a new dump: per (dimension,
    key) document counts and share deltas across three dimensions
    (language mix, source mix, length-bucket histogram at 100-char
    granularity).  → (dim, key, old_n, new_n, old_share, new_share,
    delta_share).

    Shape: each row melts to three (dim, key) structs, both snapshots
    union behind a 0/1 tag, and ONE hash aggregate (map-side combined)
    produces every dimension's counts — one scan per snapshot, one
    shuffle of (dim, key) rows total.  Shares divide by the per-dim
    snapshot totals via a window over the tiny report, not a second
    pass over the data.

    Determinism: counts are exact; shares are round(int/int, 6) — the
    quotient of identical integers is the identical double in both
    engines, so the 6-dp round matches bit-for-bit."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def melt(df, tag):
        return df.select(
            F.lit(tag).alias("snap"),
            F.explode(
                F.array(
                    F.struct(
                        F.lit("lang").alias("dim"),
                        F.col(lang_col).cast("string").alias("key"),
                    ),
                    F.struct(
                        F.lit("source").alias("dim"),
                        F.col(source_col).cast("string").alias("key"),
                    ),
                    F.struct(
                        F.lit("len_bucket").alias("dim"),
                        (F.col(chars_col).cast("long") / F.lit(100))
                        .cast("long")
                        .cast("string")
                        .alias("key"),
                    ),
                )
            ).alias("dk"),
        ).select("snap", "dk.dim", "dk.key")

    melted = melt(old_df, 0).unionByName(melt(new_df, 1))
    counts = melted.groupBy("dim", "key").agg(
        F.sum(F.when(F.col("snap") == 0, 1).otherwise(0)).alias("old_n"),
        F.sum(F.when(F.col("snap") == 1, 1).otherwise(0)).alias("new_n"),
    )
    w = Window.partitionBy("dim")
    shares = counts.select(
        "dim",
        "key",
        F.col("old_n").cast("long").alias("old_n"),
        F.col("new_n").cast("long").alias("new_n"),
        F.round(
            F.col("old_n") / F.sum("old_n").over(w).cast("double"), 6
        ).alias("old_share"),
        F.round(
            F.col("new_n") / F.sum("new_n").over(w).cast("double"), 6
        ).alias("new_share"),
    )
    return shares.withColumn(
        "delta_share",
        F.round(F.col("new_share") - F.col("old_share"), 6),
    )


def corpus_drift_report_sql(old_rel: str, new_rel: str, *,
                            lang_col="lang", source_col="source",
                            chars_col="n_chars") -> str:
    """DuckDB twin of :func:`corpus_drift_report` — ``old_rel`` /
    ``new_rel`` are parenthesized relations or table names."""
    def melt(rel, tag):
        return f"""
  SELECT {tag} AS snap, 'lang' AS dim, CAST({lang_col} AS VARCHAR) AS key
  FROM {rel}
  UNION ALL
  SELECT {tag}, 'source', CAST({source_col} AS VARCHAR) FROM {rel}
  UNION ALL
  SELECT {tag}, 'len_bucket',
         CAST(CAST({chars_col} AS BIGINT) // 100 AS VARCHAR) FROM {rel}"""

    return f"""
WITH melted AS ({melt(old_rel, 0)}
  UNION ALL{melt(new_rel, 1)}),
counts AS (
  SELECT dim, key,
         SUM(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS old_n,
         SUM(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS new_n
  FROM melted GROUP BY dim, key),
shares AS (
  SELECT dim, key,
         CAST(old_n AS BIGINT) AS old_n, CAST(new_n AS BIGINT) AS new_n,
         round(old_n / CAST(SUM(old_n) OVER (PARTITION BY dim) AS DOUBLE),
               6) AS old_share,
         round(new_n / CAST(SUM(new_n) OVER (PARTITION BY dim) AS DOUBLE),
               6) AS new_share
  FROM counts)
SELECT *, round(new_share - old_share, 6) AS delta_share FROM shares
"""


# ---------------------------------------------------------------------------
# lexical retrieval: BM25 — the keyword half of hybrid search
# ---------------------------------------------------------------------------

def bm25_topk(df, query_terms, *, k=10, k1=1.2, b=0.75,
              id_col="doc_id", text_col="text"):
    """Okapi BM25 top-k for a term-list query:
    (doc_id, score, rank) — the lexical complement to
    ``similarity.cosine_topk``.

    Scoring: ``idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))`` (the
    non-negative BM25+ idf), ``tf`` component with k1/b length
    normalization against the corpus average document length.

    Determinism engineering: per-(doc, term) partial scores are rounded
    to 6 dp and summed as exact DECIMAL(18,6) (order-independent), and
    ranking orders on the exact decimal with id tie-breaks.  The tf/
    length inputs are ratios of identical integers in both engines, so
    they are the identical doubles; the idf term, however, goes through
    ``ln()``, which the JVM and an external oracle's libm are not
    guaranteed to agree on to the last ulp — a partial score sitting
    exactly on a 0.0000005 rounding boundary could therefore round
    differently across engines.  No such boundary value exists in the
    test corpora (hash-verified), but bit-for-bit parity is engineered
    ONLY up to that ln() caveat; for guaranteed parity compute the
    |terms|-row idf table driver-side as 6-dp literals (the
    ``ndcg_gain_table`` pattern) at the cost of an eager job.

    Scale shape: one explode over the corpus (the inverted-index pass),
    a per-doc length aggregate reusing the same scan, term df from a
    distinct-pairs aggregate, the avgdl/N scalars ride one broadcast,
    and the query terms are an IN-filter pushed against the exploded
    term column — candidate set is only docs containing ≥1 query term.
    Top-k compiles to TakeOrderedAndProject, never a global window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from inception_spark.functions.hashing import words

    terms = sorted(set(query_terms))
    ex = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(words(F.col(text_col))).alias("term"),
    )
    doclen = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    scalars = doclen.agg(
        (
            F.sum("dl").cast("double") / F.count(F.lit(1))
        ).alias("avgdl"),
        F.count(F.lit(1)).cast("double").alias("n_docs"),
    )
    dfreq = (
        ex.filter(F.col("term").isin(terms))
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_docs"))
    )
    tf = (
        ex.filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_docs") + F.lit(0.5))
        / (F.col("df_docs") + F.lit(0.5))
    )
    tf_part = (
        F.col("tf") * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("dl") / F.col("avgdl")
            )
        )
    )
    per_term = (
        tf.join(F.broadcast(dfreq), "term")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(scalars))
        .select(
            "doc_id",
            F.round(idf * tf_part, 6)
            .cast("decimal(18,6)")
            .alias("s_dec"),
        )
    )
    scored = per_term.groupBy("doc_id").agg(
        F.sum("s_dec").alias("score_dec")
    )
    top = scored.orderBy(F.desc("score_dec"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score_dec"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id",
        F.col("score_dec").cast("double").alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


def bm25_topk_sql(table, terms, *, k=10, k1=1.2, b=0.75,
                  text_col="text") -> str:
    """DuckDB twin of :func:`bm25_topk` (same rounding discipline)."""
    from inception_spark.functions.hashing import words_sql

    tl = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""
WITH ex AS (
  SELECT doc_id, unnest({words_sql(text_col)}) AS term FROM {table}),
doclen AS (SELECT doc_id, COUNT(*) AS dl FROM ex GROUP BY doc_id),
scalars AS (
  SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
         CAST(COUNT(*) AS DOUBLE) AS n_docs
  FROM doclen),
dfreq AS (
  SELECT term, COUNT(*) AS df_docs
  FROM (SELECT DISTINCT doc_id, term FROM ex WHERE term IN ({tl}))
  GROUP BY term),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM ex
  WHERE term IN ({tl}) GROUP BY doc_id, term),
per_term AS (
  SELECT tf.doc_id,
    CAST(round(
      ln(1.0 + (s.n_docs - d.df_docs + 0.5) / (d.df_docs + 0.5))
      * (tf.tf * CAST({k1 + 1.0!r} AS DOUBLE)
         / (tf.tf + CAST({k1!r} AS DOUBLE)
            * (CAST({1.0 - b!r} AS DOUBLE)
               + CAST({b!r} AS DOUBLE) * dl.dl / s.avgdl))),
      6) AS DECIMAL(18,6)) AS s_dec
  FROM tf JOIN dfreq d USING (term) JOIN doclen dl USING (doc_id),
       scalars s),
scored AS (
  SELECT doc_id, SUM(s_dec) AS score_dec FROM per_term GROUP BY doc_id)
SELECT doc_id, CAST(score_dec AS DOUBLE) AS score,
       CAST(row_number() OVER (
         ORDER BY score_dec DESC, doc_id) AS BIGINT) AS rank
FROM scored
ORDER BY score_dec DESC, doc_id LIMIT {k}
"""


def write_inverted_index(df, path, *, id_col="doc_id", text_col="text"):
    """Materialize the BM25 inverted index — the write-once/query-many
    layout (the lexical sibling of ``similarity.write_sq_codes`` /
    ``write_ivf_layout``): three parquet tables under ``path``:

    * ``index/``  — (term, doc_id, tf), sorted by term within files so
      parquet row-group min/max stats prune query terms at scan time;
    * ``doclen/`` — (doc_id, dl);
    * ``scalars/`` — 1 row: (avgdl, n_docs).

    At 100 TB the corpus explode happens ONCE here; each query then
    reads only the row groups whose term range intersects its IN-list —
    the economics a search service actually needs."""
    from pyspark.sql import functions as F

    from inception_spark.functions.hashing import words

    ex = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(words(F.col(text_col))).alias("term"),
    )
    tf = ex.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    tf.sortWithinPartitions("term").write.mode("overwrite").parquet(
        f"{path}/index"
    )
    doclen = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    doclen.write.mode("overwrite").parquet(f"{path}/doclen")
    doclen.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        F.count(F.lit(1)).cast("double").alias("n_docs"),
    ).write.mode("overwrite").parquet(f"{path}/scalars")


def bm25_topk_over_index(spark, path, query_terms, *, k=10, k1=1.2,
                         b=0.75):
    """BM25 top-k over a :func:`write_inverted_index` layout: no corpus
    scan, no explode — the query's IN-filter pushes into the (term,
    doc_id, tf) parquet scan (row-group pruned via the sorted-term
    stats), df comes from a |terms|-row aggregate of the same scan, and
    the scalars table is a 1-row broadcast.  Bit-identical to
    :func:`bm25_topk` on the source corpus by construction (same
    rounding discipline)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    terms = sorted(set(query_terms))
    tf = spark.read.parquet(f"{path}/index").filter(
        F.col("term").isin(terms)
    )
    doclen = spark.read.parquet(f"{path}/doclen")
    scalars = spark.read.parquet(f"{path}/scalars")
    return _bm25_score_index(tf, doclen, scalars, k=k, k1=k1, b=b)


def bm25_topk_over_indexes(spark, paths, query_terms, *, k=10, k1=1.2,
                           b=0.75):
    """BM25 top-k over SEVERAL :func:`write_inverted_index` layouts of
    DISJOINT document batches — the LSM-style segment probe: each
    ingest batch writes its own index segment, queries probe all live
    segments, and the occasional segment merge is ordinary layout
    compaction.  Nothing rescans history on ingest.

    Scoring is as-if-one-index EXACTLY: batches are doc-disjoint, so
    the unioned (term, doc_id, tf) rows are the merged index's rows,
    per-term df is a count over the union, and avgdl/n_docs are
    recomputed from the unioned doclen — integer sums, so the double
    division is bit-identical to a fresh single-index build (pinned by
    the ``bm25_segmented_search`` driver oracle, which replays the
    ONE-index scorer)."""
    from functools import reduce

    terms = sorted(set(query_terms))
    tf = reduce(
        lambda a, b_: a.unionByName(b_),
        [
            spark.read.parquet(f"{p}/index").filter(
                F.col("term").isin(terms)
            )
            for p in paths
        ],
    )
    doclen = reduce(
        lambda a, b_: a.unionByName(b_),
        [spark.read.parquet(f"{p}/doclen") for p in paths],
    )
    scalars = doclen.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        F.count(F.lit(1)).cast("double").alias("n_docs"),
    )
    return _bm25_score_index(tf, doclen, scalars, k=k, k1=k1, b=b)


def _bm25_score_index(tf, doclen, scalars, *, k, k1, b):
    """Shared scoring body of the index probes: (term, doc_id, tf) ⋈
    doclen ⋈ broadcast scalars → rounded decimal per-term scores →
    one doc aggregate → top-k."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_docs") + F.lit(0.5))
        / (F.col("df_docs") + F.lit(0.5))
    )
    tf_part = (
        F.col("tf") * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    per_term = (
        tf.join(F.broadcast(dfreq), "term")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(scalars))
        .select(
            "doc_id",
            F.round(idf * tf_part, 6).cast("decimal(18,6)").alias("s_dec"),
        )
    )
    scored = per_term.groupBy("doc_id").agg(
        F.sum("s_dec").alias("score_dec")
    )
    top = scored.orderBy(F.desc("score_dec"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score_dec"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id",
        F.col("score_dec").cast("double").alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


# ---------------------------------------------------------------------------
# importance-weighted data selection (DSIR-style)
# ---------------------------------------------------------------------------

def dsir_scores(df, is_target, *, id_col="doc_id", text_col="text",
                alpha=0.5):
    """Importance-resampling scores for target-domain data selection
    (the DSIR recipe — Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling" — with unigram LM importance
    weights): every document gets the mean per-token log-likelihood
    ratio ln(p_target(w)/p_source(w)) between an add-α-smoothed unigram
    LM fit on the TARGET slice (rows where ``is_target``) and one fit on
    the rest.  → (doc_id, is_target, n_tokens, avg_llr) — positive
    avg_llr means "reads like the target domain"; feed it to a
    threshold or a top-k to select pretraining data that matches a
    high-quality target (the published use: select Common-Crawl-like
    source data that resembles Wikipedia/books).

    Smoothing is what makes cross-domain scoring total: add-α over the
    JOINT vocabulary guarantees both models assign every observed token
    non-zero mass (MLE would zero out source-only tokens under the
    target model).

    Determinism: counts and vocab size are integers, each token's llr
    term is a 6-dp round summed as exact DECIMAL, one final double
    divide — the ``doc_unigram_logprob`` discipline (same accepted
    last-ulp ``ln`` libm caveat).  Plan shape: ONE token explode
    (lazily checkpointed — the exploded table feeds both the count
    aggregate and the join-back, and without the checkpoint Catalyst
    re-evaluates the explode subtree per consumer; the dedup.py
    band-table pattern), ONE conditional hash aggregate fits BOTH
    models' counts (no separate target/source scans), scalars
    broadcast, join back, per-doc aggregate."""
    from pyspark.sql import functions as F

    from inception_spark.functions.hashing import words

    a = float(alpha)
    ex = df.select(
        F.col(id_col).alias("doc_id"),
        is_target.cast("int").alias("t"),
        F.explode(words(F.col(text_col))).alias("w"),
    ).localCheckpoint(eager=False)
    wc = ex.groupBy("w").agg(
        F.sum("t").alias("c_t"),
        F.sum(F.lit(1) - F.col("t")).alias("c_s"),
    )
    scal = wc.agg(
        F.sum("c_t").alias("n_t"),
        F.sum("c_s").alias("n_s"),
        F.count(F.lit(1)).alias("v"),
    )
    p_t = (F.col("c_t") + F.lit(a)) / (
        F.col("n_t") + F.lit(a) * F.col("v")
    )
    p_s = (F.col("c_s") + F.lit(a)) / (
        F.col("n_s") + F.lit(a) * F.col("v")
    )
    scored = (
        ex.join(wc, "w")
        .crossJoin(F.broadcast(scal))
        .select(
            "doc_id",
            F.round(F.log(p_t / p_s), 6)
            .cast("decimal(28,6)")
            .alias("llr"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (F.sum("llr").cast("double") / F.count(F.lit(1))).alias(
            "avg_llr"
        ),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), is_target.alias("is_target"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "is_target",
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias(
                "n_tokens"
            ),
            F.col("avg_llr"),
        )
    )


def dsir_scores_sql(table: str = "documents", target_pred: str =
                    "lang = 'en'", *, alpha=0.5) -> str:
    """DuckDB twin of :func:`dsir_scores` under ``target_pred``.

    ``target_pred`` is evaluated ONCE, unqualified, in a ``base`` CTE
    over ``{table}`` — it may reference any of the table's columns (no
    string-rewrite qualification, which corrupted predicates where a
    column name occurred inside another identifier)."""
    w = words_sql("text")
    a = float(alpha)
    return f"""
WITH base AS (
  SELECT doc_id, CAST({target_pred} AS INT) AS t, text FROM {table}),
ex AS (
  SELECT doc_id, t, unnest({w}) AS w FROM base),
wc AS (
  SELECT w, SUM(t) AS c_t, SUM(1 - t) AS c_s FROM ex GROUP BY w),
scal AS (
  SELECT SUM(c_t) AS n_t, SUM(c_s) AS n_s, COUNT(*) AS v FROM wc),
scored AS (
  SELECT ex.doc_id,
    CAST(round(ln(
      ((wc.c_t + CAST({a!r} AS DOUBLE))
        / (scal.n_t + CAST({a!r} AS DOUBLE) * scal.v))
      / ((wc.c_s + CAST({a!r} AS DOUBLE))
        / (scal.n_s + CAST({a!r} AS DOUBLE) * scal.v))), 6)
      AS DECIMAL(28,6)) AS llr
  FROM ex JOIN wc USING (w), scal),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         CAST(SUM(llr) AS DOUBLE) / COUNT(*) AS avg_llr
  FROM scored GROUP BY doc_id)
SELECT b.doc_id, CAST(b.t AS BOOLEAN) AS is_target,
       CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       p.avg_llr
FROM base b LEFT JOIN per_doc p ON b.doc_id = p.doc_id
"""


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", Table A1)
# ---------------------------------------------------------------------------

def gopher_quality_filter(
    df,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
) -> "DataFrame":
    """The published Gopher document-quality rule set as ONE Catalyst
    projection — the heuristic complement to the learned LR gate and
    the line-level C4 cleaner:

    * word count in [min_words, max_words];
    * mean word length in [min_mean_word_len, max_mean_word_len];
    * ``#``/``...`` symbol-to-word ratio ≤ max_symbol_word_ratio;
    * ≥ min_alpha_word_ratio of words contain an alphabetic character;
    * ≥ min_stopword_hits distinct common English stopwords present
      (Gopher uses "the, be, to, of, and, that, have, with" — the
      "contains real prose" test).

    → (doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_ratio,
    stopword_hits, reason, keep) with ``reason`` the FIRST failed rule
    (reading order above) and NULL for keepers — the quarantine
    auditability contract of ``corpus_filter``.  No UDF, no shuffle;
    at 100 TB this is one narrow scan you were already paying.  The
    metric/reason expressions live in :func:`_gopher_metrics` so the
    funnel composition (``corpus_funnel_report``) reuses the identical
    rule set without a join."""
    from pyspark.sql import functions as F

    m = _gopher_metrics(
        F.col(text_col),
        min_words=min_words,
        max_words=max_words,
        min_mean_word_len=min_mean_word_len,
        max_mean_word_len=max_mean_word_len,
        max_symbol_word_ratio=max_symbol_word_ratio,
        min_alpha_word_ratio=min_alpha_word_ratio,
        min_stopword_hits=min_stopword_hits,
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        m["n_words"].cast("long").alias("n_words"),
        m["mean_word_len"].alias("mean_word_len"),
        m["symbol_ratio"].alias("symbol_ratio"),
        m["alpha_word_ratio"].alias("alpha_word_ratio"),
        m["stopword_hits"].cast("long").alias("stopword_hits"),
        m["reason"].alias("reason"),
        m["reason"].isNull().alias("keep"),
    )


def _gopher_metrics(
    text: Column,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
) -> dict:
    """The Gopher rule metrics + first-failure reason as reusable
    Catalyst expressions over a text column."""
    from pyspark.sql import functions as F

    from inception_spark.functions.hashing import words

    ws = words(text)
    n_words = F.size(ws)
    total_chars = F.aggregate(
        F.transform(ws, lambda w: F.length(w)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    mean_wl = F.when(
        n_words > 0, F.round(total_chars.cast("double") / n_words, 6)
    ).otherwise(F.lit(0.0))
    n_hash = F.size(F.split(text, "#", -1)) - 1
    n_ellipsis = F.size(F.split(text, r"\.\.\.", -1)) - 1
    sym_ratio = F.when(
        n_words > 0,
        F.round((n_hash + n_ellipsis).cast("double") / n_words, 6),
    ).otherwise(F.lit(0.0))
    alpha_words = F.size(F.filter(ws, lambda w: w.rlike("[a-z]")))
    alpha_ratio = F.when(
        n_words > 0, F.round(alpha_words.cast("double") / n_words, 6)
    ).otherwise(F.lit(0.0))
    gopher_stops = ["the", "be", "to", "of", "and", "that", "have", "with"]
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(ws),
            F.array(*[F.lit(s) for s in gopher_stops]),
        )
    )
    reason = (
        F.when(n_words < min_words, F.lit("too_few_words"))
        .when(n_words > max_words, F.lit("too_many_words"))
        .when(mean_wl < min_mean_word_len, F.lit("mean_word_len_low"))
        .when(mean_wl > max_mean_word_len, F.lit("mean_word_len_high"))
        .when(sym_ratio > max_symbol_word_ratio, F.lit("symbol_ratio"))
        .when(alpha_ratio < min_alpha_word_ratio, F.lit("alpha_ratio"))
        .when(stop_hits < min_stopword_hits, F.lit("stopwords"))
        .otherwise(F.lit(None).cast("string"))
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_wl,
        "symbol_ratio": sym_ratio,
        "alpha_word_ratio": alpha_ratio,
        "stopword_hits": stop_hits,
        "reason": reason,
    }


def gopher_quality_filter_sql(
    table: str = "documents",
    *,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
) -> str:
    """DuckDB twin of :func:`gopher_quality_filter`."""
    w = words_sql(text_col)
    stops = ", ".join(
        f"'{s}'" for s in
        ["the", "be", "to", "of", "and", "that", "have", "with"]
    )
    return f"""
WITH b AS (
  SELECT doc_id, {w} AS ws, {text_col} AS t FROM {table}),
m AS (
  SELECT doc_id,
    len(ws) AS n_words,
    CASE WHEN len(ws) > 0 THEN round(
      CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE)
      / len(ws), 6) ELSE 0.0 END AS mean_word_len,
    CASE WHEN len(ws) > 0 THEN round(
      CAST((len(string_split(t, '#')) - 1)
           + (len(string_split(t, '...')) - 1) AS DOUBLE)
      / len(ws), 6) ELSE 0.0 END AS symbol_ratio,
    CASE WHEN len(ws) > 0 THEN round(
      CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
           AS DOUBLE) / len(ws), 6) ELSE 0.0 END AS alpha_word_ratio,
    len(list_intersect(list_distinct(ws), [{stops}])) AS stopword_hits
  FROM b)
SELECT doc_id,
  CAST(n_words AS BIGINT) AS n_words,
  mean_word_len, symbol_ratio, alpha_word_ratio,
  CAST(stopword_hits AS BIGINT) AS stopword_hits,
  CASE
    WHEN n_words < {min_words} THEN 'too_few_words'
    WHEN n_words > {max_words} THEN 'too_many_words'
    WHEN mean_word_len < CAST({min_mean_word_len!r} AS DOUBLE)
      THEN 'mean_word_len_low'
    WHEN mean_word_len > CAST({max_mean_word_len!r} AS DOUBLE)
      THEN 'mean_word_len_high'
    WHEN symbol_ratio > CAST({max_symbol_word_ratio!r} AS DOUBLE)
      THEN 'symbol_ratio'
    WHEN alpha_word_ratio < CAST({min_alpha_word_ratio!r} AS DOUBLE)
      THEN 'alpha_ratio'
    WHEN stopword_hits < {min_stopword_hits} THEN 'stopwords'
  END AS reason,
  (CASE
    WHEN n_words < {min_words} THEN 'too_few_words'
    WHEN n_words > {max_words} THEN 'too_many_words'
    WHEN mean_word_len < CAST({min_mean_word_len!r} AS DOUBLE)
      THEN 'mean_word_len_low'
    WHEN mean_word_len > CAST({max_mean_word_len!r} AS DOUBLE)
      THEN 'mean_word_len_high'
    WHEN symbol_ratio > CAST({max_symbol_word_ratio!r} AS DOUBLE)
      THEN 'symbol_ratio'
    WHEN alpha_word_ratio < CAST({min_alpha_word_ratio!r} AS DOUBLE)
      THEN 'alpha_ratio'
    WHEN stopword_hits < {min_stopword_hits} THEN 'stopwords'
  END) IS NULL AS keep
FROM m
"""


# ---------------------------------------------------------------------------
# Unicode-script character profile (language/script ID signal)
# ---------------------------------------------------------------------------

def doc_script_profile(
    df, *, id_col: str = "doc_id", text_col: str = "text"
) -> "DataFrame":
    """Per-document Unicode-script character profile → fractions of
    Latin letters, digits, Cyrillic, CJK-ideograph, and whitespace
    characters, plus a dominant-script call.

    The char-class signal complements :func:`doc_lang_id`'s word-level
    n-gram heuristic: script mixing (latin text shot through with CJK,
    mojibake, ransom-note spam) is invisible to token models but leaps
    out of a character histogram — it's the standard first-pass router
    in multilingual crawl pipelines (e.g. choose tokenizer / language
    model family by script before any word-level work).

    Pure Catalyst: each class count is ``length(text) -
    length(regexp_replace(text, class, ''))`` — codegen'd, no UDF, no
    shuffle (a projection).  Fractions round to 4 decimals; the
    dominant call breaks ties by fixed priority latin > cyrillic > cjk
    > digit (deterministic, oracle-matchable)."""
    t = F.col(text_col)
    n = F.length(t)

    def cnt(pattern):
        return n - F.length(F.regexp_replace(t, pattern, ""))

    latin = cnt(r"[A-Za-z]")
    digit = cnt(r"[0-9]")
    cyr = cnt(r"[Ѐ-ӿ]")
    cjk = cnt(r"[一-鿿]")
    space = cnt(r"\s")

    def frac(c):
        return F.when(n > 0, F.round(c.cast("double") / n, 4))

    dominant = (
        F.when((latin >= cyr) & (latin >= cjk) & (latin >= digit), "latin")
        .when((cyr >= cjk) & (cyr >= digit), "cyrillic")
        .when(cjk >= digit, "cjk")
        .otherwise("digit")
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_chars_total"),
        frac(latin).alias("latin_frac"),
        frac(digit).alias("digit_frac"),
        frac(cyr).alias("cyrillic_frac"),
        frac(cjk).alias("cjk_frac"),
        frac(space).alias("space_frac"),
        dominant.alias("dominant_script"),
    )


def doc_script_profile_sql(
    table: str = "documents", *, id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`doc_script_profile` (RE2 ``\\x{...}``
    char-class syntax instead of Java's ``\\uXXXX``; ``'g'`` flag since
    DuckDB's regexp_replace is single-match by default)."""
    classes = {
        "latin": "[A-Za-z]",
        "digit": "[0-9]",
        "cyr": r"[\x{0400}-\x{04FF}]",
        "cjk": r"[\x{4E00}-\x{9FFF}]",
        "space": r"[\s]",
    }
    cnts = ",\n  ".join(
        f"length({text_col}) - length(regexp_replace({text_col}, "
        f"'{pat}', '', 'g')) AS {name}"
        for name, pat in classes.items()
    )
    return f"""
WITH c AS (
  SELECT {id_col} AS doc_id, length({text_col}) AS n,
  {cnts}
  FROM {table})
SELECT doc_id, CAST(n AS BIGINT) AS n_chars_total,
  CASE WHEN n > 0 THEN round(CAST(latin AS DOUBLE) / n, 4) END AS latin_frac,
  CASE WHEN n > 0 THEN round(CAST(digit AS DOUBLE) / n, 4) END AS digit_frac,
  CASE WHEN n > 0 THEN round(CAST(cyr AS DOUBLE) / n, 4) END AS cyrillic_frac,
  CASE WHEN n > 0 THEN round(CAST(cjk AS DOUBLE) / n, 4) END AS cjk_frac,
  CASE WHEN n > 0 THEN round(CAST(space AS DOUBLE) / n, 4) END AS space_frac,
  CASE WHEN latin >= cyr AND latin >= cjk AND latin >= digit THEN 'latin'
       WHEN cyr >= cjk AND cyr >= digit THEN 'cyrillic'
       WHEN cjk >= digit THEN 'cjk'
       ELSE 'digit' END AS dominant_script
FROM c
"""


def _phrase_terms(phrase: str) -> list[str]:
    """Phrase terms through the SAME word normalization the postings
    use (``[a-z0-9]+`` runs of the lowercased text) — a naive split()
    would leave punctuation stuck to terms ('fast,') that can never
    equal a postings token, silently matching nothing."""
    import re

    from .hashing import WORD_PATTERN

    terms = re.findall(WORD_PATTERN, phrase.lower())
    if not terms:
        raise ValueError("phrase_search: empty phrase")
    return terms


def phrase_search(
    df,
    phrase: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Exact phrase matching via a POSITIONAL postings join — the
    operator behind quoted queries, which bag-of-words BM25
    (:func:`bm25_topk`) cannot express: (doc_id, n_occurrences).

    Build (doc, term, pos) postings with one posexplode, then join the
    phrase's consecutive terms with position offsets (+1, +2, ...):
    an occurrence exists where all terms line up.  Each join leg is an
    equi-join on (doc, term-slot position) — hash-partitioned postings,
    no per-doc scan of full text downstream of the explode, which is
    how a positional inverted index answers phrases at corpus scale
    (materialize the postings once, probe per query).

    Terms go through the same word normalization as every other text
    operator, so "Fast KEY order!" matches the phrase "fast key order".
    """
    from pyspark.sql import functions as F

    from . import hashing as H

    terms = _phrase_terms(phrase)
    post = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(H.words(F.col(text_col))).alias("pos", "w"),
    )
    base = (
        post.filter(F.col("w") == terms[0])
        .select("doc_id", F.col("pos").alias("p0"))
    )
    for off, t in enumerate(terms[1:], start=1):
        nxt = post.filter(F.col("w") == t).select(
            F.col("doc_id"), (F.col("pos") - off).alias("p0")
        )
        base = base.join(nxt, ["doc_id", "p0"], "left_semi")
    return base.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )


def phrase_search_sql(
    phrase: str, *, table: str = "documents"
) -> str:
    """DuckDB twin of :func:`phrase_search` — same postings-offset
    join over the shared word normalization."""
    from . import hashing as H

    terms = _phrase_terms(phrase)
    joins = []
    for off, t in enumerate(terms[1:], start=1):
        joins.append(
            f"JOIN post t{off} ON t{off}.doc_id = b.doc_id"
            f" AND t{off}.w = '{t}' AND t{off}.pos = b.pos + {off}"
        )
    return f"""
WITH w AS (SELECT doc_id, {H.words_sql('text')} AS ws FROM {table}),
post AS (
  SELECT doc_id, u.i - 1 AS pos, ws[u.i] AS w
  FROM w, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) u),
base AS (
  SELECT DISTINCT b.doc_id, b.pos AS p0
  FROM post b {' '.join(joins)}
  WHERE b.w = '{terms[0]}')
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM base GROUP BY doc_id
"""


def term_keyness_chi2(
    df,
    *,
    group_value: str,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
):
    """KEYNESS: the k terms most distinctive of one corpus slice vs the
    rest, ranked by the chi-squared statistic over the 2x2 term
    contingency table — the standard corpus-linguistics "what words
    characterize this sublanguage" query (Dunning's G² is the other
    usual choice, but G² needs ln; chi² is +,-,*,/ only, so the ranking
    is engine-exact with no libm anywhere).

    chi² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)) over a=term-in-slice,
    b=term-out, c/d the complements — all from ONE token-count
    aggregate; enrichment (a·N vs (a+b)·(a+c)) restricts output to
    OVER-represented terms.  Scores are 4-dp rounded; ties break on the
    term for a total order.
    """
    from pyspark.sql import Window, functions as F

    from . import hashing as H

    tok = df.select(
        F.col(id_col).alias("_id"),
        (F.col(group_col) == group_value).alias("in_slice"),
        F.explode(H.words(F.col(text_col))).alias("term"),
    )
    counts = tok.groupBy("term").agg(
        F.sum(F.when(F.col("in_slice"), 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(~F.col("in_slice"), 1).otherwise(0))
        .cast("long")
        .alias("b"),
    )
    totals = counts.agg(
        F.sum("a").alias("ta"), F.sum("b").alias("tb")
    )
    j = counts.crossJoin(F.broadcast(totals)).select(
        "term",
        "a",
        "b",
        (F.col("ta") - F.col("a")).alias("c"),
        (F.col("tb") - F.col("b")).alias("d"),
        (F.col("ta") + F.col("tb")).alias("n"),
    )
    # (ad-bc)^2 as an explicit self-product: pow(x, 2) is not
    # guaranteed correctly rounded by every libm; x*x is exact IEEE
    adbc = (
        F.col("a").cast("double") * F.col("d").cast("double")
        - F.col("b").cast("double") * F.col("c").cast("double")
    )
    num = F.col("n").cast("double") * (adbc * adbc)
    den = (
        (F.col("a") + F.col("b")).cast("double")
        * (F.col("c") + F.col("d")).cast("double")
        * (F.col("a") + F.col("c")).cast("double")
        * (F.col("b") + F.col("d")).cast("double")
    )
    enriched = (
        F.col("a").cast("double") * F.col("n").cast("double")
        > (F.col("a") + F.col("b")).cast("double")
        * (F.col("a") + F.col("c")).cast("double")
    )
    scored = j.select(
        "term",
        "a",
        "b",
        F.round(
            F.when(den > 0, num / den).otherwise(F.lit(0.0)), 4
        ).alias("chi2"),
    ).filter(enriched)
    w = Window.orderBy(F.desc("chi2"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "term",
            F.col("a").alias("n_in_slice"),
            F.col("b").alias("n_rest"),
            "chi2",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def term_keyness_chi2_sql(
    *, group_value: str, group_col: str = "lang", k: int = 20,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`term_keyness_chi2`."""
    from . import hashing as H

    words = H.words_sql("text")
    return f"""
WITH tok AS (
  SELECT ({group_col} = '{group_value}') AS in_slice,
         unnest({words}) AS term
  FROM {table}),
counts AS (
  SELECT term,
         CAST(SUM(CASE WHEN in_slice THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN NOT in_slice THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM tok GROUP BY term),
tot AS (SELECT SUM(a) AS ta, SUM(b) AS tb FROM counts),
j AS (
  SELECT term, a, b, (ta - a) AS c, (tb - b) AS d, (ta + tb) AS n
  FROM counts CROSS JOIN tot),
scored AS (
  SELECT term, a, b,
    round(CASE WHEN (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
                     * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)) > 0
          THEN CAST(n AS DOUBLE)
               * ((CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                   - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
                  * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                     - CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))
               / (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
                  * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE))
          ELSE 0.0 END, 4) AS chi2
  FROM j
  WHERE CAST(a AS DOUBLE) * CAST(n AS DOUBLE)
        > CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE))
SELECT term, a AS n_in_slice, b AS n_rest, chi2,
       CAST(row_number() OVER (ORDER BY chi2 DESC, term) AS BIGINT)
         AS rank
FROM scored
QUALIFY rank <= {k}
"""


def blocklist_filter(
    df,
    phrases: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Multi-phrase blocklist screening in ONE pass — the corpus-scale
    form of "does this document contain any of these N phrases"
    (bad-word lists, compliance phrase lists, boilerplate markers).
    Returns (doc_id, phrase, n_hits) for every match.

    The naive plans both fail at 100 TB: N ``LIKE`` predicates rescan
    every document N times, and a single mega-regex alternation is a
    per-row Python/regex hot loop that can't be hash-joined.  This is
    the Aho-Corasick economy re-expressed relationally: documents are
    word-tokenized ONCE (shared normalization with every other text
    operator), then for each DISTINCT phrase LENGTH n — a small
    constant, not N — the word array is turned into position n-grams
    JVM-side (``transform`` + ``slice``, no UDF) and equi-joined
    against the broadcast phrase list.  Cost: one scan per distinct
    length, each a map + broadcast-hash join; no shuffle touches the
    corpus until the final per-doc aggregate, and growing the
    blocklist from 10 to 10,000 phrases only grows the broadcast side.

    Phrases go through :func:`_phrase_terms` normalization, so
    "Fast MERGE!" matches the words "fast merge" — a raw split would
    silently match nothing (same contract as phrase_search).
    """
    from functools import reduce

    from pyspark.sql import functions as F

    from . import hashing as H

    norm: dict[str, int] = {}
    for p in phrases:
        terms = _phrase_terms(p)
        norm[" ".join(terms)] = len(terms)
    spark = df.sparkSession
    pdf = spark.createDataFrame(
        [(k, n) for k, n in norm.items()], "phrase string, n int"
    )
    docs = df.select(
        F.col(id_col).alias("doc_id"),
        H.words(F.col(text_col)).alias("ws"),
    )
    def _gram_at(n: int):
        # factory, NOT a two-arg lambda with a default: F.transform
        # passes (element, index) to two-parameter lambdas, which would
        # silently rebind the default
        return lambda i: F.concat_ws(" ", F.slice(F.col("ws"), i, n))

    legs = []
    for n in sorted(set(norm.values())):
        grams = docs.select(
            "doc_id",
            F.explode(
                F.when(
                    F.size("ws") >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.size("ws") - n + 1),
                        _gram_at(n),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("gram"),
        )
        legs.append(
            grams.join(
                F.broadcast(
                    pdf.filter(F.col("n") == n).select("phrase")
                ),
                F.col("gram") == F.col("phrase"),
            ).select("doc_id", "phrase")
        )
    hits = reduce(lambda a, b: a.unionByName(b), legs)
    return hits.groupBy("doc_id", "phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits")
    )


def blocklist_filter_sql(
    phrases: list[str], *, table: str = "documents"
) -> str:
    """DuckDB twin of :func:`blocklist_filter`: identical word
    normalization, identical per-length n-gram construction (1-based
    inclusive list slice), phrases inlined as a VALUES relation."""
    from . import hashing as H

    norm: dict[str, int] = {}
    for p in phrases:
        terms = _phrase_terms(p)
        norm[" ".join(terms)] = len(terms)
    vals = ", ".join(
        f"('{k}', {n})" for k, n in sorted(norm.items())
    )
    return f"""
WITH p(phrase, n) AS (VALUES {vals}),
w AS (SELECT doc_id, {H.words_sql('text')} AS ws FROM {table}),
wp AS (SELECT w.doc_id, p.phrase, p.n, w.ws FROM w CROSS JOIN p),
-- unnest in SELECT (not LATERAL: DuckDB's binder hits an internal
-- error on lateral slice bounds referencing a joined column);
-- range(1, stop) is empty when stop <= 1, so short docs fall out
-- without an explicit len(ws) >= n guard
g0 AS (SELECT doc_id, phrase, n, ws,
              unnest(range(1, len(ws) - n + 2)) AS i FROM wp),
g AS (
  SELECT doc_id, phrase FROM g0
  WHERE array_to_string(ws[i : i + n - 1], ' ') = phrase)
SELECT doc_id, phrase, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM g GROUP BY doc_id, phrase
"""


def blocklist_hits_stateless(
    df,
    phrases: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Row-local twin of :func:`blocklist_filter` — no join, no
    aggregation, so it runs UNCHANGED over Structured Streaming
    micro-batches (the live ingest gate): per row, every phrase's
    occurrence count is a pure array expression (n-gram transform +
    filter + size).  Work is O(words × n_phrases) per row, so for
    large phrase lists prefer the broadcast-join form; the two are
    result-identical by construction (pinned in tests and by the
    streaming driver entry sharing blocklist_filter's oracle)."""
    from pyspark.sql import functions as F

    from . import hashing as H

    norm: dict[str, int] = {}
    for p in phrases:
        terms = _phrase_terms(p)
        norm[" ".join(terms)] = len(terms)
    # Gram arrays are built ONCE PER DISTINCT PHRASE LENGTH per row —
    # not once per (row, phrase) as the previous explode-then-build
    # shape did (guide §2.3 "project before" applied to the expression
    # level; the measured ≈1.7× r13 probe, VERDICT r13 ask 3).  The
    # gram transform (interpreted HOF: sequence + slice + concat_ws
    # per position) is the expensive part; the per-phrase occurrence
    # count is then a cheap equality filter over the pre-built array.
    # Each per-length array column is referenced by every phrase of
    # that length in the counts projection, and CollapseProject never
    # inlines a non-cheap producer that is referenced more than once
    # — and when a length has exactly one phrase, inlining it is one
    # construction per row anyway — so the once-per-length evaluation
    # is structural, not an optimizer accident (pinned by
    # tests/test_text_analysis.py plan assertions).  Still row-local:
    # no join, no aggregation — the counts array explodes into the
    # same (doc_id, phrase, n_hits) rows, n_hits > 0, as before.
    lengths = sorted(set(norm.values()))

    def _gram_arr(n: int):
        return F.when(
            F.size("ws") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - n + 1),
                lambda i: F.concat_ws(" ", F.slice(F.col("ws"), i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    docs = df.select(
        F.col(id_col).alias("doc_id"),
        H.words(F.col(text_col)).alias("ws"),
    ).select(
        "doc_id", *[_gram_arr(n).alias(f"_g{n}") for n in lengths]
    )
    counts = F.array(*[
        F.struct(
            F.lit(k).alias("phrase"),
            F.size(
                F.filter(F.col(f"_g{n}"), lambda g: g == F.lit(k))
            ).cast("long").alias("n_hits"),
        )
        for k, n in sorted(norm.items())
    ])
    return (
        docs.select("doc_id", F.explode(counts).alias("h"))
        .filter(F.col("h.n_hits") > 0)
        .select(
            "doc_id",
            F.col("h.phrase").alias("phrase"),
            F.col("h.n_hits").alias("n_hits"),
        )
    )


def tfidf_cosine_pairs(
    df,
    *,
    max_df: int = 20,
    min_score: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Sparse-vector similarity join: document pairs by TF-IDF cosine —
    the classic lexical near-duplicate/related-content metric, computed
    as a POSTINGS SELF-JOIN rather than anything dense.

    The scale lever is ``max_df``: terms appearing in more than
    ``max_df`` documents are dropped from the vector space BEFORE the
    join.  That is simultaneously the quality convention (stop-terms
    carry no signal; their idf ≈ 0) and the pair-generation economy —
    the join fan-out is Σ df² over surviving terms, so capping df caps
    the quadratic exactly like the prefix filter in jaccard_prefix_pairs
    (a term in df docs contributes df² candidate pairs; uncapped 'the'
    is the whole corpus²).  The operator is DEFINED over the pruned
    vocabulary: weights, norms, and scores all use it consistently.

    Determinism: weight = round(tf · ln(1 + N/df), 6) as DECIMAL(18,6)
    (the doc_unigram_logprob discipline), dot products and squared
    norms are exact decimal sums — order-independent across the
    shuffle — and only the final cosine divides in double, rounded to
    6 dp before the ``min_score`` gate.

    Output: (doc_a, doc_b, cosine) with doc_a < doc_b,
    cosine ≥ min_score.
    """
    from pyspark.sql import functions as F

    from . import hashing as H

    ex = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(H.words(F.col(text_col))).alias("w"),
    )
    tf = ex.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(
        F.countDistinct(F.col(id_col)).cast("double").alias("n_docs")
    )
    wt = (
        tf.join(dfreq.filter(F.col("df") <= max_df), "w")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "w",
            F.round(
                F.col("tf")
                * F.log(F.lit(1.0) + F.col("n_docs") / F.col("df")),
                6,
            )
            .cast("decimal(18,6)")
            .alias("wt"),
        )
    )
    # wt feeds both self-join sides and the norm aggregate (and norms
    # feeds two projections): without a lineage cut each reference
    # re-plans the explode+tf+df subtree — the before plan carried 24
    # documents scans (guide §7.2 duplicated subtrees).  The postings
    # table is df-capped (Σ df ≤ max_df·|vocab|), so one
    # materialization is the cheap side of the trade.
    wt = wt.localCheckpoint(eager=False)
    norms = wt.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("wt") * F.col("wt")).cast("double")).alias(
            "nrm"
        )
    ).localCheckpoint(eager=False)
    a = wt.select(
        F.col("doc_id").alias("doc_a"), "w", F.col("wt").alias("wa")
    )
    b = wt.select(
        F.col("doc_id").alias("doc_b"), "w", F.col("wt").alias("wb")
    )
    dots = (
        a.join(b, "w")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(
        F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na")
    )
    nb = norms.select(
        F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb")
    )
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("dot").cast("double")
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= min_score)
    )


def tfidf_cosine_pairs_sql(
    table: str = "documents",
    *,
    max_df: int = 20,
    min_score: float = 0.5,
) -> str:
    """DuckDB twin of :func:`tfidf_cosine_pairs`."""
    from . import hashing as H

    return f"""
WITH ex AS (
  SELECT doc_id, unnest({H.words_sql('text')}) AS w FROM {table}),
tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM ex GROUP BY doc_id, w),
dfreq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w
          HAVING COUNT(*) <= {max_df}),
nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs
       FROM {table}),
wt AS (
  SELECT doc_id, w,
         CAST(round(tf * ln(CAST(1.0 AS DOUBLE) + n_docs / df), 6)
              AS DECIMAL(18,6)) AS wt
  FROM tf JOIN dfreq USING (w), nd),
norms AS (
  SELECT doc_id, sqrt(CAST(SUM(wt * wt) AS DOUBLE)) AS nrm
  FROM wt GROUP BY doc_id),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.wt * b.wt) AS dot
  FROM wt a JOIN wt b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT doc_a, doc_b,
       round(CAST(dot AS DOUBLE) / (na.nrm * nb.nrm), 6) AS cosine
FROM dots
JOIN norms na ON na.doc_id = doc_a
JOIN norms nb ON nb.doc_id = doc_b
WHERE round(CAST(dot AS DOUBLE) / (na.nrm * nb.nrm), 6)
      >= CAST({min_score!r} AS DOUBLE)
"""


def term_collocations(df, *, k=30, min_count=5, id_col="doc_id",
                      text_col="text"):
    """PMI-ranked bigram collocations over the corpus — the classic
    "fixed expressions" extractor (Church & Hanks 1990): top-``k``
    adjacent word pairs by pointwise mutual information
    ``ln(p(ab) / (p(a)·p(b)))`` with ``p(ab) = c12/N_bi`` over bigram
    occurrences and ``p(w) = c(w)/N_uni`` over token occurrences,
    among pairs seen at least ``min_count`` times (raw PMI is
    rank-dominated by hapax pairs otherwise).  Output
    ``(bigram, n_pair, pmi, rank)``.

    Determinism: the PMI argument is one double-division chain over
    exact integer counts — identical IEEE doubles in both engines —
    and the final ``ln`` rounds at 6 dp (the libm-ulp discipline of
    :func:`doc_bigram_logprob`); ranking is round-then-rank with the
    bigram string as tiebreak.  Plan: one bigram explode + one token
    explode → three hash aggregates → two broadcast-scalar joins; the
    global top-k window runs only after a per-first-word top-k
    pre-prune (partitioned window), never a single reducer over the
    full pair table (the basket_rules discipline)."""
    from pyspark.sql import Window

    ws = words(F.col(text_col))
    n = F.size(ws)
    bg = F.zip_with(
        F.slice(ws, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(ws, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    ex_bg = df.select(F.explode(bg).alias("bg"))
    ex_w = df.select(F.explode(ws).alias("w"))
    c12 = ex_bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    cw = ex_w.groupBy("w").agg(F.count(F.lit(1)).alias("cw"))
    totals = ex_bg.agg(F.count(F.lit(1)).alias("n_bi")).crossJoin(
        ex_w.agg(F.count(F.lit(1)).alias("n_uni"))
    )
    cand = (
        c12.filter(F.col("c12") >= min_count)
        .withColumn("w1", F.substring_index("bg", " ", 1))
        .withColumn("w2", F.substring_index("bg", " ", -1))
        .join(cw.selectExpr("w AS w1", "cw AS c1"), "w1")
        .join(cw.selectExpr("w AS w2", "cw AS c2"), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "bg",
            F.col("c12").cast("long").alias("n_pair"),
            F.round(
                F.log(
                    F.col("c12").cast("double")
                    / F.col("n_bi")
                    / (
                        F.col("c1").cast("double") / F.col("n_uni")
                        * (F.col("c2").cast("double") / F.col("n_uni"))
                    )
                ),
                6,
            ).alias("pmi"),
            F.substring_index("bg", " ", 1).alias("_w1"),
        )
    )
    pre = Window.partitionBy("_w1").orderBy(
        F.col("pmi").desc(), F.col("bg")
    )
    glob = Window.orderBy(F.col("pmi").desc(), F.col("bg"))
    return (
        cand.withColumn("_pr", F.row_number().over(pre))
        .filter(F.col("_pr") <= k)
        .withColumn("rank", F.row_number().over(glob).cast("long"))
        .filter(F.col("rank") <= k)
        .select("bg", "n_pair", "pmi", "rank")
    )


def term_collocations_sql(table: str = "documents", *, k=30,
                          min_count=5) -> str:
    """DuckDB twin of :func:`term_collocations` (pre-prune omitted —
    it is result-invariant by construction)."""
    w = words_sql("text")
    return f"""
WITH ws AS (SELECT doc_id, {w} AS ws FROM {table}),
ex_bg AS (
  SELECT unnest(list_transform(
           list_zip(ws[1:len(ws)-1], ws[2:len(ws)]),
           p -> p[1] || ' ' || p[2])) AS bg
  FROM ws),
ex_w AS (SELECT unnest(ws) AS w FROM ws),
c12 AS (SELECT bg, COUNT(*) AS c12 FROM ex_bg GROUP BY bg),
cw AS (SELECT w, COUNT(*) AS cw FROM ex_w GROUP BY w),
tot AS (SELECT (SELECT COUNT(*) FROM ex_bg) AS n_bi,
               (SELECT COUNT(*) FROM ex_w) AS n_uni),
cand AS (
  SELECT bg, CAST(c12 AS BIGINT) AS n_pair,
         round(ln(CAST(c12 AS DOUBLE) / n_bi
                  / (CAST(a.cw AS DOUBLE) / n_uni
                     * (CAST(b.cw AS DOUBLE) / n_uni))), 6) AS pmi
  FROM c12
  JOIN cw a ON a.w = split_part(bg, ' ', 1)
  JOIN cw b ON b.w = split_part(bg, ' ', -1)
  CROSS JOIN tot
  WHERE c12 >= {min_count})
SELECT bg, n_pair, pmi,
       CAST(row_number() OVER (ORDER BY pmi DESC, bg) AS BIGINT) AS rank
FROM cand QUALIFY rank <= {k}
"""


def vocab_growth_curve(df, *, bucket_size=10, id_col="doc_id",
                       text_col="text"):
    """Heaps-law vocabulary growth: reading the corpus in ``id_col``
    order, ``bucket_size`` docs at a time — (bucket, n_tokens,
    n_tokens_cum, n_new_words, n_distinct_cum).  A flattening distinct
    curve is the classic saturation signal (more data, no new
    vocabulary → dedup harder, LM value declining); a linear one says
    the corpus is still growing vocabulary.

    Exact distributed form of the inherently sequential definition:
    a word's FIRST bucket is min(bucket) over its occurrences (one
    hash aggregate — no sequential scan), n_new_words counts words by
    first bucket, and both cumulative columns are window sums over the
    bucket spine.  All integers."""
    return vocab_growth_finalize(
        vocab_bucket_partials(
            df, bucket_size=bucket_size, id_col=id_col, text_col=text_col
        )
    )


def vocab_bucket_partials(df, *, bucket_size=10, id_col="doc_id",
                          text_col="text"):
    """Mergeable partial for :func:`vocab_growth_curve`: per
    (bucket, word) occurrence counts.  Counts re-sum exactly and the
    per-word min-bucket falls out of the merged rollup, so the curve
    maintained over micro-batches equals the batch one."""
    ws = words(F.col(text_col))
    return df.select(
        F.expr(f"{id_col} div {bucket_size}").cast("long").alias("bucket"),
        F.explode(ws).alias("w"),
    ).groupBy("bucket", "w").agg(F.count(F.lit(1)).alias("n"))


def vocab_growth_finalize(parts):
    """Re-merge :func:`vocab_bucket_partials` rows and emit the growth
    curve."""
    from pyspark.sql import Window

    ex = parts.groupBy("bucket", "w").agg(F.sum("n").alias("n"))
    toks = ex.groupBy("bucket").agg(F.sum("n").alias("n_tokens"))
    news = (
        ex.groupBy("w")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_new_words"))
    )
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        toks.join(news, "bucket", "left")
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("n_new_words", F.lit(0))
            .cast("long")
            .alias("n_new_words"),
        )
        .withColumn(
            "n_tokens_cum", F.sum("n_tokens").over(w_cum).cast("long")
        )
        .withColumn(
            "n_distinct_cum",
            F.sum("n_new_words").over(w_cum).cast("long"),
        )
        .select(
            "bucket", "n_tokens", "n_tokens_cum",
            "n_new_words", "n_distinct_cum",
        )
    )


def vocab_growth_curve_sql(table: str = "documents", *,
                           bucket_size=10) -> str:
    """DuckDB twin of :func:`vocab_growth_curve`."""
    w = words_sql("text")
    return f"""
WITH ex AS (
  SELECT CAST(doc_id // {bucket_size} AS BIGINT) AS bucket,
         unnest({w}) AS w
  FROM {table}),
toks AS (SELECT bucket, COUNT(*) AS n_tokens FROM ex GROUP BY 1),
news AS (
  SELECT bucket, COUNT(*) AS n_new_words FROM (
    SELECT w, MIN(bucket) AS bucket FROM ex GROUP BY w)
  GROUP BY 1)
SELECT t.bucket, CAST(t.n_tokens AS BIGINT) AS n_tokens,
       CAST(SUM(t.n_tokens) OVER (ORDER BY t.bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_tokens_cum,
       CAST(COALESCE(n.n_new_words, 0) AS BIGINT) AS n_new_words,
       CAST(SUM(COALESCE(n.n_new_words, 0)) OVER (ORDER BY t.bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_distinct_cum
FROM toks t LEFT JOIN news n ON t.bucket = n.bucket
"""


def doc_length_percentile(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Each document's token-count percentile WITHIN its source —
    (doc_id, source-group, n_tokens, pct_milli): the per-parent rank
    normalization every length-based curriculum/filter wants ("drop
    the shortest 5% of each source", never "of the corpus", because
    sources have wildly different length distributions).

    Exactness: pct_milli = (1000·(rank−1)) div (n−1) over the
    (n_tokens, doc_id)-tiebroken per-group order — min 0, max 1000,
    single-doc groups pin to 0 under an explicit n>1 guard instead of
    dividing by zero.  Per-group windows parallelize across sources;
    for one colossal source the sharded-prefix-sum form in
    operators/sampling.py is the 100× path."""
    w = Window.partitionBy(group_col).orderBy("n_tokens", id_col)
    nw = Window.partitionBy(group_col)
    base = df.select(
        F.col(id_col).alias(id_col),
        F.col(group_col).alias(group_col),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    return (
        base.withColumn("_rk", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(nw))
        .select(
            id_col,
            group_col,
            "n_tokens",
            F.when(
                F.col("_n") > 1,
                F.expr("(1000 * (CAST(_rk AS BIGINT) - 1)) div (_n - 1)"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("pct_milli"),
        )
    )


def doc_length_percentile_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> str:
    """DuckDB twin of :func:`doc_length_percentile`."""
    tok = token_count_sql(text_col)
    return f"""
WITH base AS (
  SELECT {id_col}, {group_col},
         CAST({tok} AS BIGINT) AS n_tokens
  FROM {table}),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY {group_col}
                            ORDER BY n_tokens, {id_col}) AS _rk,
         COUNT(*) OVER (PARTITION BY {group_col}) AS _n
  FROM base)
SELECT {id_col}, {group_col}, n_tokens,
       CAST(CASE WHEN _n > 1
            THEN (1000 * (_rk - 1)) // (_n - 1) ELSE 0 END AS BIGINT)
         AS pct_milli
FROM r
"""


def vocab_zipf_fit(
    df: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary — the rank-frequency
    power law every natural-language corpus follows (count ∝ rank^s
    with s ≈ −1): ordinary least squares on (ln rank, ln count) across
    the full vocab, one row: ``(n_terms, slope_milli, intercept_milli)``.
    The corpus-health gate of a pretraining pipeline — boilerplate
    floods and template spam flatten the tail (slope → 0), dedup
    failures steepen the head; a slope drifting from ≈ −1000 milli is
    the cheapest corpus-composition alarm there is.

    Determinism: ranks are total (count desc, term asc tiebreak), each
    ln is rounded to micro-units as a BIGINT (positive values, so
    half-up rounds identically in both engines; the last-ulp libm
    caveat of the unigram-LM ops applies), the OLS moment sums run in
    decimal(38,0) (HUGEINT in the oracle — micro² products reach
    ~1.7·10^15 per term, int64 would wrap past ~5,000 terms), and the
    single slope/intercept divide is double, rounded to milli.

    Plan shape: ONE token explode into a hash aggregate (the vocab),
    a rank window + moment aggregate over |vocab| — never the corpus —
    so the fit costs the same as build_vocab at any corpus size.
    Built on the shared partial/finalize pair (term counts are pure
    sums), so the streaming twin is ≡ by construction."""
    return zipf_from_term_counts(zipf_term_partials(df, text_col=text_col))


def zipf_term_partials(
    df: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Mergeable state for the live Zipf fit: (w, c) term counts —
    pure sums, re-merging exactly under any micro-batch regrouping;
    state is vocab-bounded (the order statistic — the rank — runs only
    at finalize over the term spine, never over history: the Gini/KS/
    equi-depth finalize discipline)."""
    return (
        df.select(F.explode(words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def zipf_from_term_counts(parts: DataFrame) -> DataFrame:
    """Zipf OLS from (w, c) term-count partials — re-merge, rank over
    the vocab spine, micro-unit moment sums; shared by the batch op
    and the streaming twin."""
    vocab = parts.groupBy("w").agg(F.sum("c").alias("c"))
    win = Window.orderBy(F.desc("c"), F.asc("w"))
    ranked = vocab.withColumn("rk", F.row_number().over(win)).select(
        F.round(F.log(F.col("rk").cast("double")) * 1e6, 0)
        .cast("bigint")
        .alias("x6"),
        F.round(F.log(F.col("c").cast("double")) * 1e6, 0)
        .cast("bigint")
        .alias("y6"),
    )
    m = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x6").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y6").cast("decimal(38,0)")).alias("sy"),
        F.sum(
            F.col("x6").cast("decimal(38,0)") * F.col("y6")
        ).alias("sxy"),
        F.sum(
            F.col("x6").cast("decimal(38,0)") * F.col("x6")
        ).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    denom = n * sxx - sx * sx
    slope = F.when(denom != 0, (n * sxy - sx * sy) / denom)
    intercept = (sy - slope * sx) / n / F.lit(1e6)
    return m.select(
        F.col("n").alias("n_terms"),
        F.round(slope * 1000, 0).cast("long").alias("slope_milli"),
        F.round(intercept * 1000, 0).cast("long").alias(
            "intercept_milli"
        ),
    )


def vocab_zipf_fit_sql(
    table: str = "documents", *, text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`vocab_zipf_fit`."""
    return f"""
WITH ex AS (
  SELECT unnest({words_sql(text_col)}) AS w FROM {table}),
vocab AS (
  SELECT w, COUNT(*) AS c FROM ex GROUP BY w),
ranked AS (
  SELECT CAST(round(ln(CAST(row_number() OVER (ORDER BY c DESC, w)
                            AS DOUBLE)) * 1e6, 0) AS BIGINT) AS x6,
         CAST(round(ln(CAST(c AS DOUBLE)) * 1e6, 0) AS BIGINT) AS y6
  FROM vocab),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(x6 AS HUGEINT)) AS sx,
         SUM(CAST(y6 AS HUGEINT)) AS sy,
         SUM(CAST(x6 AS HUGEINT) * y6) AS sxy,
         SUM(CAST(x6 AS HUGEINT) * x6) AS sxx
  FROM ranked)
SELECT n AS n_terms,
       CAST(round(1000 * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 0)
            AS BIGINT) AS slope_milli,
       CAST(round(1000 * (CAST(sy AS DOUBLE)
                          - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                            * CAST(sx AS DOUBLE))
                  / CAST(n AS DOUBLE) / 1e6, 0) AS BIGINT)
         AS intercept_milli
FROM m
"""


def corpus_funnel_report(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    min_words: int = 50,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """THE pretraining-corpus funnel in one pass — raw → language gate
    → Gopher quality gate → exact dedup — as a single row:
    ``(n_raw, n_lang, n_quality, n_unique)``, each count the survivors
    of that stage AND every stage before it.  This is the headline
    number of every dataset paper ("we started with X documents and
    kept Y"), composed from the engine's own gates: :func:`lang_id`,
    the Gopher rule set (:func:`_gopher_metrics` — identical
    expressions to ``gopher_quality_filter``), and first-copy-wins
    exact dedup on :func:`fingerprint`.

    Plan shape — the reason this is an operator and not four queries:
    all gate flags are ONE Catalyst projection over one scan (no gate
    rescans the corpus), the dedup stage is one fingerprint-keyed
    window (min surviving doc_id per fingerprint), and the report is
    one aggregate.  At 100 TB that is one scan + one shuffle, versus
    the 4 scans + 1 shuffle of running the stages as separate counts."""
    from pyspark.sql import Window

    from inception_spark.functions.hashing import words  # noqa: F401

    text = F.col(text_col)
    reason = _gopher_metrics(
        text, min_words=min_words, min_stopword_hits=min_stopword_hits
    )["reason"]
    flags = df.select(
        F.col(id_col).alias("doc_id"),
        (lang_id(text) == lang).alias("f_lang"),
        reason.isNull().alias("f_gopher"),
        fingerprint(text).alias("fp"),
    ).withColumn("s3", F.col("f_lang") & F.col("f_gopher"))
    first = F.min(F.when(F.col("s3"), F.col("doc_id"))).over(
        Window.partitionBy("fp")
    )
    return (
        flags.withColumn(
            "f_first", F.col("s3") & (F.col("doc_id") == first)
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_raw"),
            F.sum(F.col("f_lang").cast("long"))
            .cast("long")
            .alias("n_lang"),
            F.sum(F.col("s3").cast("long")).cast("long").alias(
                "n_quality"
            ),
            F.sum(F.col("f_first").cast("long"))
            .cast("long")
            .alias("n_unique"),
        )
    )


def corpus_funnel_report_sql(
    table: str = "documents",
    *,
    text_col: str = "text",
    lang: str = "en",
    min_words: int = 50,
    min_stopword_hits: int = 2,
) -> str:
    """DuckDB twin of :func:`corpus_funnel_report` — reuses the gopher
    filter query as a subquery so the rule set stays single-sourced."""
    return f"""
WITH g AS ({gopher_quality_filter_sql(
        table, text_col=text_col, min_words=min_words,
        min_stopword_hits=min_stopword_hits)}),
flags AS (
  SELECT d.doc_id,
         {lang_id_sql('d.' + text_col)} = '{lang}' AS f_lang,
         g.keep AS f_gopher,
         {fingerprint_sql('d.' + text_col)} AS fp
  FROM {table} d JOIN g USING (doc_id)),
surv AS (SELECT *, f_lang AND f_gopher AS s3 FROM flags),
firsts AS (
  SELECT fp, MIN(CASE WHEN s3 THEN doc_id END) AS first_id
  FROM surv GROUP BY fp)
SELECT CAST(COUNT(*) AS BIGINT) AS n_raw,
       CAST(SUM(CASE WHEN f_lang THEN 1 ELSE 0 END) AS BIGINT)
         AS n_lang,
       CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_quality,
       CAST(SUM(CASE WHEN s3 AND doc_id = first_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_unique
FROM surv JOIN firsts USING (fp)
"""


def funnel_flag_partials(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    min_words: int = 50,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Mergeable state for the LIVE corpus funnel: per-fingerprint
    counts (fp, c_raw, c_lang, c_s3) — pure sums, so micro-batch
    regrouping re-merges exactly, and the dedup stage needs no order:
    first-copy-wins keeps exactly ONE doc per fingerprint with a
    surviving copy, so n_unique = #fingerprints with c_s3 > 0 — a
    predicate on merged state, not an order statistic.  State is
    distinct-fingerprint bounded."""
    text = F.col(text_col)
    reason = _gopher_metrics(
        text, min_words=min_words, min_stopword_hits=min_stopword_hits
    )["reason"]
    flags = df.select(
        F.col(id_col).alias("doc_id"),
        (lang_id(text) == lang).alias("f_lang"),
        reason.isNull().alias("f_gopher"),
        fingerprint(text).alias("fp"),
    ).withColumn("s3", F.col("f_lang") & F.col("f_gopher"))
    return flags.groupBy("fp").agg(
        F.count(F.lit(1)).cast("long").alias("c_raw"),
        F.sum(F.col("f_lang").cast("long")).cast("long").alias("c_lang"),
        F.sum(F.col("s3").cast("long")).cast("long").alias("c_s3"),
    )


def funnel_from_partials(parts: DataFrame) -> DataFrame:
    """Re-merge per-fingerprint funnel partials — identical single-row
    output to :func:`corpus_funnel_report`."""
    merged = parts.groupBy("fp").agg(
        F.sum("c_raw").alias("c_raw"),
        F.sum("c_lang").alias("c_lang"),
        F.sum("c_s3").alias("c_s3"),
    )
    return merged.agg(
        F.sum("c_raw").cast("long").alias("n_raw"),
        F.sum("c_lang").cast("long").alias("n_lang"),
        F.sum("c_s3").cast("long").alias("n_quality"),
        F.sum((F.col("c_s3") > 0).cast("long"))
        .cast("long")
        .alias("n_unique"),
    )


def host_reputation_report(
    docs: DataFrame,
    *,
    host_col: str = "host",
    dup_threshold: float = 0.5,
) -> DataFrame:
    """Host-level curation scorecard — the RefinedWeb/FineWeb-style
    site gate: per host, doc count, exact-duplicate involvement
    (corpus-WIDE fingerprint multiplicity, not host-local — a mirror
    farm's copies live on OTHER hosts), total tokens, language
    diversity, and the flag at ``dup_threshold``.  Host-level signals
    catch what per-doc gates can't: a template farm's pages each look
    fine alone.

    Exactness: integer counts throughout; dup_rate is one double
    divide rounded 6 dp, compared to the literal threshold after
    rounding (both engines).  Shape: one fingerprint aggregate
    (corpus-wide multiplicity), one key join back, one host
    aggregate — the report is |hosts|-sized."""
    base = docs.select(
        F.col(host_col).alias("host"),
        "lang",
        token_count(F.col("text")).cast("long").alias("tok"),
        fingerprint(F.col("text")).alias("fp"),
    )
    fpn = base.groupBy("fp").agg(F.count(F.lit(1)).alias("n_fp"))
    rep = (
        base.join(fpn, "fp")
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("n_fp") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_docs"),
            F.sum("tok").cast("long").alias("total_tokens"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
        )
    )
    dup_rate = F.round(
        F.col("n_dup_docs").cast("double") / F.col("n_docs"), 6
    )
    return rep.select(
        "host",
        "n_docs",
        "n_dup_docs",
        dup_rate.alias("dup_rate"),
        "total_tokens",
        "n_langs",
        (dup_rate > F.lit(float(dup_threshold))).alias("flagged"),
    )


def host_reputation_report_sql(
    *,
    host_expr: str,
    dup_threshold: float = 0.5,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`host_reputation_report` with the host
    derived by ``host_expr`` (the entry's deterministic fixture)."""
    return f"""
WITH base AS (
  SELECT {host_expr} AS host, lang,
         CAST({token_count_sql('text')} AS BIGINT) AS tok,
         {fingerprint_sql('text')} AS fp
  FROM {table}),
fpn AS (SELECT fp, COUNT(*) AS n_fp FROM base GROUP BY fp),
rep AS (
  SELECT b.host,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN f.n_fp > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_docs,
         CAST(SUM(b.tok) AS BIGINT) AS total_tokens,
         CAST(COUNT(DISTINCT b.lang) AS BIGINT) AS n_langs
  FROM base b JOIN fpn f USING (fp)
  GROUP BY b.host)
SELECT host, n_docs, n_dup_docs,
       round(CAST(n_dup_docs AS DOUBLE) / n_docs, 6) AS dup_rate,
       total_tokens, n_langs,
       (round(CAST(n_dup_docs AS DOUBLE) / n_docs, 6)
        > CAST({dup_threshold!r} AS DOUBLE)) AS flagged
FROM rep
"""


def markdown_structure_stats(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Markdown/structure profile per document — the curation signal
    that routes structured content (code-fence density → code
    pipeline, table density → tabular handling) which plain token/
    quality gates are blind to.  Counts: ATX headings, fenced code
    blocks (fence pairs), inline links, list items, table rows,
    blockquote lines, plus the routing label (code > tabular > prose).

    All patterns live in the Java-regex ∩ RE2 subset (the doc_pii_scrub
    discipline — no lookarounds, no anchors: line starts are matched
    against an explicit leading newline on a '\\n'-prefixed copy), so
    Spark and DuckDB count identically.  One codegen projection, no
    shuffle."""
    t = F.concat(F.lit("\n"), F.col(text_col))

    def cnt(pat: str):
        return F.size(
            F.regexp_extract_all(t, F.lit(pat), F.lit(0))
        ).cast("long")

    n_fences = cnt("\n```")
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        cnt("\n#{1,6} [^\n]*").alias("n_headings"),
        # floor division, NOT (n/2).cast("long"): an unclosed fence (odd
        # count) must floor in BOTH engines — DuckDB's CAST(c/2) rounds.
        F.floor(n_fences / F.lit(2)).cast("long").alias("n_code_blocks"),
        cnt(r"\[[^\]]*\]\([^)]*\)").alias("n_links"),
        cnt("\n[-*+] ").alias("n_list_items"),
        cnt("\n\\|").alias("n_table_rows"),
        cnt("\n> ").alias("n_quotes"),
    )
    label = (
        F.when(F.col("n_code_blocks") > 0, F.lit("code"))
        .when(F.col("n_table_rows") > 0, F.lit("tabular"))
        .otherwise(F.lit("prose"))
    )
    return out.withColumn("doc_class", label)


def markdown_structure_stats_sql(
    *, text_expr: str = "text", table: str = "documents"
) -> str:
    """DuckDB twin of :func:`markdown_structure_stats` — identical
    RE2-safe patterns over the same newline-prefixed text."""
    t = f"(chr(10) || {text_expr})"

    def cnt(pat: str) -> str:
        return f"CAST(len(regexp_extract_all({t}, '{pat}')) AS BIGINT)"

    c_head = cnt("\n#{1,6} [^\n]*")
    c_fence = cnt("\n```")
    c_link = cnt("\\[[^\\]]*\\]\\([^)]*\\)")
    c_list = cnt("\n[-*+] ")
    c_table = cnt("\n\\|")
    c_quote = cnt("\n> ")
    return f"""
WITH s AS (
  SELECT doc_id,
         {c_head} AS n_headings,
         {c_fence} // 2 AS n_code_blocks,
         {c_link} AS n_links,
         {c_list} AS n_list_items,
         {c_table} AS n_table_rows,
         {c_quote} AS n_quotes
  FROM {table})
SELECT *,
       CASE WHEN n_code_blocks > 0 THEN 'code'
            WHEN n_table_rows > 0 THEN 'tabular'
            ELSE 'prose' END AS doc_class
FROM s
"""


def host_rep_partials(batch: DataFrame, *, host_col: str = "host") -> DataFrame:
    """Mergeable host-reputation state: exact (host, lang, fingerprint)
    → (cnt, tok) rows for one ingest batch.  Fingerprinting and token
    counting are per-row, so the counters re-sum under any
    micro-batching; state is fingerprint-cardinality sized (the
    streaming_exact_dedup class — the price of corpus-wide duplicate
    accounting, and still a rollup, never raw text)."""
    return (
        batch.select(
            F.col(host_col).alias("host"),
            "lang",
            token_count(F.col("text")).cast("long").alias("tok"),
            fingerprint(F.col("text")).alias("fp"),
        )
        .groupBy("host", "lang", "fp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("tok").cast("long").alias("tok"),
        )
    )


def host_rep_finalize(
    parts: DataFrame,
    *,
    dup_threshold: float = 0.5,
    assume_merged: bool = False,
) -> DataFrame:
    """The host scorecard from (possibly un-merged) state rows —
    corpus-wide fingerprint multiplicity, then the host rollup;
    identical output to :func:`host_reputation_report` (shared
    oracle).  ``assume_merged=True`` skips the re-merge."""
    merged = parts if assume_merged else (
        parts.groupBy("host", "lang", "fp").agg(
            F.sum("cnt").cast("long").alias("cnt"),
            F.sum("tok").cast("long").alias("tok"),
        )
    )
    fpn = merged.groupBy("fp").agg(F.sum("cnt").alias("n_fp"))
    rep = (
        merged.join(fpn, "fp")
        .groupBy("host")
        .agg(
            F.sum("cnt").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("n_fp") > 1, F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_dup_docs"),
            F.sum("tok").cast("long").alias("total_tokens"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
        )
    )
    dup_rate = F.round(
        F.col("n_dup_docs").cast("double") / F.col("n_docs"), 6
    )
    return rep.select(
        "host",
        "n_docs",
        "n_dup_docs",
        dup_rate.alias("dup_rate"),
        "total_tokens",
        "n_langs",
        (dup_rate > F.lit(float(dup_threshold))).alias("flagged"),
    )


def rake_keywords(
    docs: DataFrame,
    stopwords: list,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_len: int = 4,
    k: int = 20,
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) at corpus grain —
    the classic unsupervised keyword scorer: candidate phrases are
    maximal stopword-free word runs (length ≤ max_len), each word gets
    degree/frequency (degree = Σ phrase length over its occurrences —
    words living in long phrases score up), a phrase scores the sum of
    its member words, top-k phrases win.

    All-integer scoring: score_milli(word) = 1000·degree div freq, the
    phrase score sums those — hash-exact across engines, no doubles.
    Shape: one posexplode + a per-doc running stop-count window assigns
    phrase ids in a single pass; word stats and phrase scores are two
    hash aggregates; top-k is one TakeOrdered.  The corpus is scanned
    once.  The whole scorer is a pure function of the (phrase →
    n_occurrences) COUNTER TABLE (word degree/freq re-derive from it
    by weighted explode), which is what the live twin maintains."""
    return rake_finalize(
        rake_phrase_partials(
            docs, stopwords, text_col=text_col, id_col=id_col,
            max_len=max_len,
        ),
        k=k,
        assume_merged=True,
    )


def rake_phrase_partials(
    docs: DataFrame,
    stopwords: list,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_len: int = 4,
) -> DataFrame:
    """Mergeable RAKE state: (phrase, plen) → n_occurrences for one
    batch.  Phrase extraction is per-doc (docs arrive whole), so the
    counters re-sum under any micro-batching; state is |distinct
    phrases| — a rollup, never text."""
    from pyspark.sql import Window

    w = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0)
            )
        ).alias("pos", "word"),
    )
    stop = F.col("word").isin(*stopwords)
    win = Window.partitionBy("doc_id").orderBy("pos")
    members = (
        w.withColumn(
            "pid", F.sum(F.when(stop, 1).otherwise(0)).over(win)
        )
        .filter(~stop)
    )
    phr = (
        members.groupBy("doc_id", "pid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "word"))
            ).alias("sw")
        )
        .select(
            F.transform(F.col("sw"), lambda s: s["word"]).alias("pw")
        )
        .filter((F.size("pw") >= 1) & (F.size("pw") <= max_len))
        .select(
            F.concat_ws(" ", F.col("pw")).alias("phrase"),
            F.size("pw").alias("plen"),
        )
    )
    return phr.groupBy("phrase", "plen").agg(
        F.count(F.lit(1)).cast("long").alias("n_occ")
    )


def rake_finalize(
    parts: DataFrame, *, k: int = 20, assume_merged: bool = False
) -> DataFrame:
    """Score + top-k over the phrase counter table — shared with the
    live twin, whose state IS that table.  Word degree/frequency
    re-derive exactly by n_occ-weighted explode (each phrase
    occurrence contributed one freq count and plen degree)."""
    from pyspark.sql import Window as W2

    merged = parts if assume_merged else (
        parts.groupBy("phrase", "plen").agg(
            F.sum("n_occ").cast("long").alias("n_occ")
        )
    )
    wstats = (
        merged.select(
            "plen", "n_occ", F.explode(F.split("phrase", " ")).alias("word")
        )
        .groupBy("word")
        .agg(
            F.sum("n_occ").cast("long").alias("freq"),
            F.sum(F.col("plen") * F.col("n_occ")).cast("long").alias(
                "degree"
            ),
        )
        .select(
            "word",
            F.expr("(1000 * degree) div freq").alias("w_score"),
        )
    )
    scored = (
        merged.select(
            "phrase",
            F.col("n_occ").alias("n_occurrences"),
            F.col("plen").cast("long").alias("n_words"),
            F.explode(F.split("phrase", " ")).alias("word"),
        )
        .join(F.broadcast(wstats), "word")
        .groupBy("phrase", "n_occurrences", "n_words")
        .agg(F.sum("w_score").cast("long").alias("score_milli"))
    )
    rk = W2.orderBy(F.desc("score_milli"), F.asc("phrase"))
    return (
        scored.withColumn("rank", F.row_number().over(rk).cast("long"))
        .filter(F.col("rank") <= k)
    )


def rake_keywords_sql(
    stopwords: list,
    *,
    table: str = "documents",
    max_len: int = 4,
    k: int = 20,
) -> str:
    """DuckDB twin of :func:`rake_keywords`."""
    stops = ", ".join(f"'{s}'" for s in stopwords)
    return f"""
WITH wt AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
  FROM {table}),
w AS (
  SELECT doc_id, ws[t.i] AS word, t.i AS pos
  FROM wt, unnest(range(1, len(ws) + 1)) AS t(i)),
m AS (
  SELECT doc_id, word, pos,
         SUM(CASE WHEN word IN ({stops}) THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS pid,
         (word IN ({stops})) AS is_stop
  FROM w),
phr AS (
  SELECT array_to_string(list(word ORDER BY pos), ' ') AS phrase,
         COUNT(*) AS plen
  FROM m WHERE NOT is_stop
  GROUP BY doc_id, pid
  HAVING COUNT(*) BETWEEN 1 AND {max_len}),
wstats AS (
  SELECT u.word,
         (1000 * SUM(p.plen)) // COUNT(*) AS w_score
  FROM phr p, unnest(string_split(p.phrase, ' ')) AS u(word)
  GROUP BY u.word),
pcount AS (
  SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         CAST(MAX(plen) AS BIGINT) AS n_words
  FROM phr GROUP BY phrase),
scored AS (
  SELECT p.phrase, p.n_occurrences, p.n_words,
         CAST(SUM(s.w_score) AS BIGINT) AS score_milli
  FROM pcount p, unnest(string_split(p.phrase, ' ')) AS u(word)
  JOIN wstats s ON s.word = u.word
  GROUP BY p.phrase, p.n_occurrences, p.n_words)
SELECT phrase, n_occurrences, n_words, score_milli,
       CAST(row_number() OVER (ORDER BY score_milli DESC, phrase)
            AS BIGINT) AS rank
FROM scored QUALIFY rank <= {k}
"""


def rouge2_eval(
    pairs: DataFrame,
    *,
    cand_col: str = "cand_text",
    ref_col: str = "ref_text",
    cand_id: str = "cand_id",
    ref_id: str = "ref_id",
) -> DataFrame:
    """ROUGE-2 recall per (candidate, reference) pair — the standard
    summarization/overlap eval: multiset bigram intersection over the
    reference's bigram count, Σ_g min(c_cand, c_ref) / Σ_g c_ref.
    MULTISET, not distinct — a candidate repeating a reference bigram
    twice only gets credit up to the reference's own count (the
    distinct-shingle ops in dedup.py answer a different question).

    Integer end to end: counts in, recall_milli = 1000·overlap div
    ref_total out.  Shape: both sides explode NON-distinct bigrams
    behind a side tag, one (pair, gram) hash aggregate computes both
    counts, one pair-grain rollup — a single shuffle keyed (pair,
    gram), which is the natural skew-free key."""

    def grams(col):
        w = F.regexp_extract_all(
            F.lower(col), F.lit("[a-z0-9]+"), F.lit(0)
        )
        return F.when(
            F.size(w) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(w, i), F.element_at(w, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    tagged = pairs.select(
        F.col(cand_id), F.col(ref_id),
        F.explode(grams(F.col(cand_col))).alias("gram"),
        F.lit(1).alias("is_cand"),
    ).unionByName(
        pairs.select(
            F.col(cand_id), F.col(ref_id),
            F.explode(grams(F.col(ref_col))).alias("gram"),
            F.lit(0).alias("is_cand"),
        )
    )
    per_gram = tagged.groupBy(cand_id, ref_id, "gram").agg(
        F.sum("is_cand").cast("long").alias("c_cand"),
        F.sum(1 - F.col("is_cand")).cast("long").alias("c_ref"),
    )
    return (
        per_gram.groupBy(cand_id, ref_id)
        .agg(
            F.sum("c_ref").cast("long").alias("ref_bigrams"),
            F.sum(F.least("c_cand", "c_ref")).cast("long").alias(
                "overlap_bigrams"
            ),
        )
        .filter(F.col("ref_bigrams") > 0)
        .withColumn(
            "rouge2_recall_milli",
            F.expr("(1000 * overlap_bigrams) div ref_bigrams").cast(
                "long"
            ),
        )
    )


def rouge2_eval_sql(
    *, pairs_cte: str, table: str = "documents"
) -> str:
    """DuckDB twin of :func:`rouge2_eval`; ``pairs_cte`` must yield
    (cand_id, ref_id, cand_text, ref_text)."""
    return f"""
WITH pairs AS ({pairs_cte}),
cw AS (
  SELECT cand_id, ref_id,
         regexp_extract_all(lower(cand_text), '[a-z0-9]+') AS w
  FROM pairs),
rw AS (
  SELECT cand_id, ref_id,
         regexp_extract_all(lower(ref_text), '[a-z0-9]+') AS w
  FROM pairs),
tagged AS (
  SELECT cand_id, ref_id, g.gram, 1 AS is_cand
  FROM cw, unnest([w[i] || ' ' || w[i+1]
                   FOR i IN range(1, greatest(len(w), 1))]) AS g(gram)
  UNION ALL
  SELECT cand_id, ref_id, g.gram, 0
  FROM rw, unnest([w[i] || ' ' || w[i+1]
                   FOR i IN range(1, greatest(len(w), 1))]) AS g(gram)),
per_gram AS (
  SELECT cand_id, ref_id, gram,
         SUM(is_cand) AS c_cand, SUM(1 - is_cand) AS c_ref
  FROM tagged GROUP BY 1, 2, 3),
rolled AS (
  SELECT cand_id, ref_id,
         CAST(SUM(c_ref) AS BIGINT) AS ref_bigrams,
         CAST(SUM(LEAST(c_cand, c_ref)) AS BIGINT) AS overlap_bigrams
  FROM per_gram GROUP BY 1, 2)
SELECT cand_id, ref_id, ref_bigrams, overlap_bigrams,
       CAST((1000 * overlap_bigrams) // ref_bigrams AS BIGINT)
         AS rouge2_recall_milli
FROM rolled WHERE ref_bigrams > 0
"""


def doc_bigram_kn_logprob(df, *, id_col="doc_id", text_col="text", d=0.75):
    """Interpolated Kneser–Ney bigram scoring — the smoothing real
    KenLM/CCNet pipelines use, upgrading :func:`doc_bigram_logprob`'s
    MLE: P(w|v) = (c(v,w) − D)/c(v) + D·N1+(v,·)/c(v) · N1+(·,w)/T,
    where N1+(v,·) / N1+(·,w) are distinct-continuation counts and T
    the distinct bigram-type total.  KN's continuation probability
    fixes the MLE's over-confidence on frequent-but-unproductive words
    ("san francisco": high c(francisco) but only one history), the
    failure mode that matters when ranking near-natural junk.

    On resubstitution every scored bigram has c(v,w) ≥ 1 > D, so the
    discounted term stays positive and the log is total.  Determinism:
    the probability is ONE fixed-shape double expression (identical
    operation order in both engines → identical IEEE bits), 6-dp
    rounded, decimal-summed, one final divide.  Plan: bigram explode →
    three hash aggregates over the TYPE table (c12, N1+ forward,
    N1+ backward) + one c1 aggregate → joins back → per-doc rollup.
    All model tables are vocabulary-sized, never corpus-sized."""
    from pyspark.sql import functions as F

    from inception_spark.functions.hashing import words

    ws = words(F.col(text_col))
    n = F.size(ws)
    bg = F.zip_with(
        F.slice(ws, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(ws, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    ex = df.select(
        F.col(id_col).alias("doc_id"), F.explode(bg).alias("bg")
    ).select(
        "doc_id",
        "bg",
        F.substring_index(F.col("bg"), " ", 1).alias("w1"),
        F.substring_index(F.col("bg"), " ", -1).alias("w2"),
    )
    types = ex.groupBy("bg").agg(F.count(F.lit(1)).alias("c12")).select(
        "bg",
        "c12",
        F.substring_index(F.col("bg"), " ", 1).alias("w1"),
        F.substring_index(F.col("bg"), " ", -1).alias("w2"),
    ).localCheckpoint(eager=False)
    c1 = ex.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    n1f = types.groupBy("w1").agg(F.count(F.lit(1)).alias("n1f"))
    n1b = types.groupBy("w2").agg(F.count(F.lit(1)).alias("n1b"))
    t = types.agg(F.count(F.lit(1)).alias("t_types"))
    dd = float(d)
    p = (
        (F.col("c12").cast("double") - F.lit(dd)) / F.col("c1")
        + ((F.lit(dd) * F.col("n1f")) / F.col("c1"))
        * (F.col("n1b").cast("double") / F.col("t_types"))
    )
    scored = (
        ex.join(types.select("bg", "c12"), "bg")
        .join(c1, "w1")
        .join(F.broadcast(n1f), "w1")
        .join(F.broadcast(n1b), "w2")
        .join(F.broadcast(t))
        .select(
            "doc_id",
            F.round(F.log(p), 6).cast("decimal(28,6)").alias("lp"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("nb"),
        (F.sum("lp").cast("double") / F.count(F.lit(1))).alias("mlp"),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("nb"), F.lit(0)).alias("n_bigrams"),
            F.col("mlp").alias("mean_logprob"),
        )
    )


def doc_bigram_kn_logprob_sql(table: str = "documents", *, d=0.75) -> str:
    """DuckDB twin of :func:`doc_bigram_kn_logprob` — the probability
    expression mirrors the Spark operation order token for token."""
    w = words_sql("text")
    dd = float(d)
    return f"""
WITH ws AS (SELECT doc_id, {w} AS ws FROM {table}),
ex AS (
  SELECT doc_id,
         unnest(list_transform(
           list_zip(ws[1:len(ws)-1], ws[2:len(ws)]),
           p -> p[1] || ' ' || p[2])) AS bg
  FROM ws),
ex2 AS (SELECT doc_id, bg, split_part(bg, ' ', 1) AS w1,
               split_part(bg, ' ', 2) AS w2 FROM ex),
types AS (
  SELECT bg, COUNT(*) AS c12,
         split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2
  FROM ex2 GROUP BY bg),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM ex2 GROUP BY w1),
n1f AS (SELECT w1, COUNT(*) AS n1f FROM types GROUP BY w1),
n1b AS (SELECT w2, COUNT(*) AS n1b FROM types GROUP BY w2),
t AS (SELECT COUNT(*) AS t_types FROM types),
tyc AS (SELECT bg, c12 FROM types),
scored AS (
  SELECT e.doc_id,
         CAST(round(ln(
           (CAST(ty.c12 AS DOUBLE) - {dd!r}) / c1.c1
           + (({dd!r} * n1f.n1f) / c1.c1)
           * (CAST(n1b.n1b AS DOUBLE) / t.t_types)), 6)
           AS DECIMAL(28,6)) AS lp
  FROM ex2 e
  JOIN tyc ty USING (bg)
  JOIN c1 ON c1.w1 = e.w1
  JOIN n1f ON n1f.w1 = e.w1
  JOIN n1b ON n1b.w2 = e.w2
  CROSS JOIN t),
per_doc AS (
  SELECT doc_id, COUNT(*) AS nb,
         CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS mlp
  FROM scored GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(p.nb, 0) AS BIGINT) AS n_bigrams,
       p.mlp AS mean_logprob
FROM {table} d LEFT JOIN per_doc p USING (doc_id)
"""


def doc_compression_ratio(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Per-document gzip compressibility — the RedPajama-v2-class
    quality signal: near-random text barely compresses (ratio → 1+),
    boilerplate/templated text compresses far below typical prose, so
    BOTH tails of the distribution are suspect for pretraining.

    Emits (id, n_bytes, n_compressed, ratio_millis) where ratio_millis
    = 1000·compressed/raw as an integer (the repo's cross-engine
    determinism discipline: zlib output is deterministic for a fixed
    level + library version, but no SQL twin can replay DEFLATE — this
    function is pytest/property-pinned, not oracle-paired, and is
    stated as such).

    Scale shape: one Arrow-batched pass, no shuffle; gzip of a ~1 KB
    doc is ~10 µs of C, so the scan stays ingest-bound at 100 TB.
    """
    import gzip as _gzip

    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), False),
            T.StructField("n_compressed", T.LongType(), False),
            T.StructField("ratio_millis", T.LongType(), False),
        ]
    )
    src = df.select(id_col, text_col).where(F.col(text_col).isNotNull())

    def fold(batches):
        for pdf in batches:
            ids, nb, nc, rm = [], [], [], []
            for i, t in zip(pdf[id_col].astype("int64"), pdf[text_col]):
                raw = str(t).encode("utf-8")
                comp = _gzip.compress(raw, compresslevel=level)
                ids.append(int(i))
                nb.append(len(raw))
                nc.append(len(comp))
                rm.append(
                    (1000 * len(comp)) // len(raw) if raw else 1000
                )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_bytes": nb,
                    "n_compressed": nc,
                    "ratio_millis": rm,
                }
            )

    return src.mapInPandas(fold, out_schema)


def compression_quality_gate(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_ratio_millis: int = 250,
    max_ratio_millis: int = 1100,
) -> DataFrame:
    """Route documents by gzip compressibility: ``keep`` inside the
    band, ``too_repetitive`` below it (templates/boilerplate/degenerate
    repetition), ``too_random`` above it (binary-ish noise, encoding
    damage).  Default band follows the published RedPajama-v2 usage
    (ratio as a FEATURE with both tails suspect), expressed in integer
    millis so downstream routing is engine-exact."""
    ratios = doc_compression_ratio(
        df, id_col=id_col, text_col=text_col
    )
    return (
        df.join(ratios.select(id_col, "ratio_millis"), id_col, "inner")
        .withColumn(
            "compress_route",
            F.when(
                F.col("ratio_millis") < min_ratio_millis,
                F.lit("too_repetitive"),
            )
            .when(
                F.col("ratio_millis") > max_ratio_millis,
                F.lit("too_random"),
            )
            .otherwise(F.lit("keep")),
        )
    )

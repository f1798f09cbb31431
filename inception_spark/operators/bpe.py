"""Corpus-scale BPE tokenizer training (Sennrich et al. 2016 merges).

A training-data pipeline that packs/counts tokens eventually needs to
TRAIN the tokenizer on its own corpus.  The classic BPE learner is a
loop over "count adjacent symbol pairs, merge the most frequent"; the
Spark-first shape mirrors how production tokenizer trainers actually
work at scale:

1. ONE pass over the raw corpus builds the distinct-word frequency
   table (``groupBy(word).count`` — map-side partial agg).  Everything
   after iterates on that table, which is orders of magnitude smaller
   than the corpus (~10^8 distinct words vs ~10^13 tokens at 100 TB).
2. Each merge iteration is one pair-explode + one integer-sum aggregate
   on the word table, plus a scalar argmax.  The per-iteration driver
   ``head()`` fetches ONE row (control plane, like pagerank's
   convergence probe) — the data never leaves executors.

Determinism engineering: pair counts are integer sums (no float
anywhere); ties break on (count DESC, left ASC, right ASC) with binary
string comparison — identical in Spark and DuckDB, so the learned merge
table is oracle-checkable end to end.

The merge step uses a delimiter encoding instead of per-word Python:
a word's symbol sequence is the string ``|s1||s2||...||sn|``.  Merging
pair (a, b) is then the LITERAL replace of ``|a||b|`` with ``|ab|``,
and because each match consumes its closing ``|``, left-to-right
non-overlapping replace semantics (identical in Spark ``replace``,
DuckDB ``replace``, and Python ``str.replace``) are exactly BPE's
single-pass merge: ``|a||a||a|`` merges once, not twice.  Symbols never
contain ``|`` (words containing it are dropped up front).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_frequencies(
    df: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over whitespace-split text — the one corpus pass."""
    w = F.explode(F.split(F.col(text_col), r"\s+")).alias("w")
    return (
        df.select(w)
        .filter((F.col("w") != "") & (~F.col("w").contains("|")))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_repr():
    # "word" -> "|w||o||r||d|"
    return F.concat(
        F.lit("|"),
        F.concat_ws("||", F.split(F.col("w"), "")),
        F.lit("|"),
    ).alias("repr")


def _pair_counts(wf: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over current symbol sequences.

    Counts every adjacent position (Sennrich semantics: ``aaa`` counts
    the (a, a) pair twice even though one merge pass collapses it once).
    """
    syms = F.split(F.expr("substring(repr, 2, length(repr) - 2)"), r"\|\|")
    pairs = F.zip_with(
        F.slice(syms, 1, F.size(syms) - 1),
        F.slice(syms, 2, F.size(syms) - 1),
        lambda x, y: F.struct(x.alias("left"), y.alias("right")),
    )
    ex = wf.select(
        F.explode(pairs).alias("p"), F.col("freq")
    ).select("p.left", "p.right", "freq")
    return ex.groupBy("left", "right").agg(
        F.sum("freq").cast("long").alias("pair_count")
    )


def learn_bpe_merges(
    df: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 10,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from a corpus.

    Returns (merge_rank, left, right, merged, pair_count) — the merge
    table a tokenizer would apply in rank order.  Stops early if no
    adjacent pair remains.
    """
    spark = df.sparkSession
    wf = word_frequencies(df, text_col=text_col).select(
        _initial_repr(), "freq"
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        # cut lineage: each iteration's repr builds on the last, and the
        # pair-count job must not replay every prior replace over the
        # corpus scan
        wf = wf.localCheckpoint(eager=False)
        best = (
            _pair_counts(wf)
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .head()
        )
        if best is None:
            break
        a, b, cnt = best["left"], best["right"], best["pair_count"]
        merges.append((rank, a, b, a + b, cnt))
        # literal (non-regex) replace — see module docstring for why this
        # IS the single-pass non-overlapping BPE merge
        wf = wf.withColumn(
            "repr",
            F.replace(
                F.col("repr"),
                F.lit(f"|{a}||{b}|"),
                F.lit(f"|{a + b}|"),
            ),
        )
    return spark.createDataFrame(
        merges,
        "merge_rank long, left string, right string, "
        "merged string, pair_count long",
    )


def apply_bpe_merges(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list (rank order).

    Pure column expressions: per word, build the ``|..|`` repr, apply
    each merge as a literal replace, split back to symbols.  The merge
    list is a plan literal (it is tokenizer vocabulary, not data), so
    the whole tokenization stays in whole-stage codegen.
    """
    w = F.explode(F.split(F.col(text_col), r"\s+")).alias("w")
    base = df.select("*", w).filter(F.col("w") != "")
    repr_col = F.concat(
        F.lit("|"), F.concat_ws("||", F.split(F.col("w"), "")), F.lit("|")
    )
    for a, b in merges:
        repr_col = F.replace(
            repr_col, F.lit(f"|{a}||{b}|"), F.lit(f"|{a + b}|")
        )
    toks = F.split(
        repr_col.substr(F.lit(2), F.length(repr_col) - 2), r"\|\|"
    )
    return base.withColumn(out_col, toks).drop("w")


def bpe_coverage_report(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Tokenizer-coverage scorecard per source — the eval that decides
    whether a learned vocabulary FITS a corpus slice: fertility
    (tokens per word — the compression the vocab achieves) and the
    single-character fallback rate (merge pressure the vocab failed to
    absorb; the BPE analog of byte-fallback).  A source whose
    fertility is far above the training slice's is under-served by the
    tokenizer — the standard signal for re-training or per-domain
    vocabularies.

    Same plan-literal tokenization as :func:`apply_bpe_merges` (whole-
    stage codegen, no UDF), then ONE source-grouped aggregate; ratios
    are single double divides rounded 6 dp over exact counts."""
    words = (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(F.split(F.col(text_col), r"\s+")).alias("w"),
        )
        .filter((F.col("w") != "") & (~F.col("w").contains("|")))
        .select("source", F.col("w").alias("text"))
    )
    toked = apply_bpe_merges(words, merges)
    toks = F.col("bpe_tokens")
    per = toked.select(
        "source",
        F.size(toks).cast("long").alias("nt"),
        F.size(
            F.filter(toks, lambda t: F.length(t) == 1)
        ).cast("long").alias("ns"),
    )
    agg = per.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("nt").cast("long").alias("n_tokens"),
        F.sum("ns").cast("long").alias("n_single_char"),
    )
    return agg.select(
        "source",
        "n_words",
        "n_tokens",
        "n_single_char",
        F.round(
            F.col("n_tokens").cast("double") / F.col("n_words"), 6
        ).alias("fertility"),
        F.round(
            F.col("n_single_char").cast("double") / F.col("n_tokens"), 6
        ).alias("single_char_rate"),
    )

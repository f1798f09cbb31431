"""Trainable document classifiers: distributed naive Bayes.

A large-scale training-data pipeline needs *trained-on-the-corpus*
classifiers, not just heuristics: language ID for mixing ratios, quality
gates learned from labeled seed sets (the CCNet / fastText pattern).
This module implements multinomial naive Bayes the Spark-first way —

* **fit** is nothing but aggregates: one token explode, a vocabulary
  count, per-(label, token) counts, per-label totals — all map-side
  combinable hash aggregates, no iteration;
* **the model is a table**: (label, token, logprob) plus per-label
  smoothing defaults — it joins back onto the corpus like any dimension
  (small → broadcast; huge vocab → ordinary shuffle join, Catalyst/AQE
  picks);
* **predict** is one join + one argmax aggregate — whole-stage codegen,
  zero UDFs.

Determinism discipline (the repo convention from doc_unigram_logprob):
every token log-probability is ``round(ln(p), 6)`` cast to
DECIMAL(28,6), so per-document sums are exact and order-independent;
the argmax ties break on the lexicographically smallest label via
``min(struct(-score, label))``.  ln() itself is not guaranteed
correctly rounded across libms, but at 6 dp only exact half-boundary
values could diverge — the same accepted risk as every logprob operator
here.

Evaluation is resubstitution (train and score the same corpus): the
operator's contract is the fit/score machinery, not a holdout
methodology — split upstream with ``sampling.stable_sample`` for a real
eval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from inception_spark.functions.hashing import words, words_sql


def nb_lang_classify(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    min_count: int = 3,
) -> DataFrame:
    """Fit multinomial NB on (words(text) → label) and score every doc:
    returns (doc_id, label, pred, correct, score).

    Add-one smoothing over the ``min_count``-pruned vocabulary; tokens
    outside the vocabulary are dropped (standard NB practice — they
    carry no class signal and would blow the model up with hapaxes).
    Documents with no in-vocab tokens fall back to the class prior.

    Plan: explode → per-(doc, word) count table (the ONE pass over raw
    occurrences, lazily checkpointed so the regex/explode never re-runs)
    → 3 hash aggregates (vocab, per-(label,w) counts, per-label totals)
    → per-DISTINCT-doc-word scoring join ⨯ |labels|, weighted by the
    occurrence count (sum(lp)·ct is exact in DECIMAL, so the result is
    identical to scoring every occurrence — the oracle still scores
    per-occurrence) → one (doc, label) sum aggregate → one doc argmax.
    The ⨯|labels| factor is the label cardinality (a handful for
    language ID) — the classic dense-scoring blowup, bounded and
    map-side combinable, and it now multiplies distinct doc-words
    (~2-5× fewer than occurrences on natural text) rather than every
    token."""
    dtw = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(words(F.col(text_col))).alias("w"),
        )
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("ct"))
        .localCheckpoint(eager=False)
    )
    vocab = (
        dtw.groupBy("w")
        .agg(F.sum("ct").alias("wf"))
        .where(F.col("wf") >= min_count)
        .select("w")
    )
    vsize = vocab.agg(F.count(F.lit(1)).alias("v"))
    exv = dtw.join(F.broadcast(vocab), "w")  # vocab is |V| rows: broadcast
    cnt = (
        df.select(F.col(label_col).alias("lbl"), F.col(id_col).alias("doc_id"))
        .join(exv, "doc_id")
        .groupBy("lbl", "w")
        .agg(F.sum("ct").alias("c"))
        .localCheckpoint(eager=False)  # feeds both n_l and the score join
    )
    nl = cnt.groupBy("lbl").agg(F.sum("c").alias("n_l"))
    # class priors from document counts
    docs_per = df.groupBy(F.col(label_col).alias("lbl")).agg(
        F.count(F.lit(1)).alias("nd")
    )
    total_docs = df.agg(F.count(F.lit(1)).alias("ndt"))
    labels = (
        docs_per.crossJoin(F.broadcast(total_docs))
        .join(nl, "lbl", "left")
        .withColumn("n_l", F.coalesce(F.col("n_l"), F.lit(0)))
        .crossJoin(F.broadcast(vsize))
        .select(
            "lbl",
            F.round(
                F.log(F.col("nd").cast("double") / F.col("ndt")), 6
            )
            .cast("decimal(28,6)")
            .alias("prior"),
            F.col("n_l"),
            F.col("v"),
        )
    )
    # score every distinct in-vocab (doc, word) against every label,
    # weighted by the occurrence count: round-then-scale keeps the sum
    # bit-identical to per-occurrence scoring (DECIMAL × int is exact)
    tok = (
        exv.crossJoin(F.broadcast(labels.select("lbl", "n_l", "v")))
        .join(F.broadcast(cnt), ["lbl", "w"], "left")
        .select(
            "doc_id",
            "lbl",
            (
                F.round(
                    F.log(
                        (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)).cast(
                            "double"
                        )
                        / (F.col("n_l") + F.col("v")).cast("double")
                    ),
                    6,
                ).cast("decimal(28,6)")
                * F.col("ct")
            )
            .cast("decimal(28,6)")
            .alias("lp"),
        )
    )
    tok_sum = tok.groupBy("doc_id", "lbl").agg(F.sum("lp").alias("tlp"))
    base = df.select(
        F.col(id_col).alias("doc_id"), F.col(label_col).alias("label")
    ).crossJoin(F.broadcast(labels.select("lbl", "prior")))
    scored = base.join(tok_sum, ["doc_id", "lbl"], "left").select(
        "doc_id",
        "label",
        "lbl",
        (
            F.col("prior")
            + F.coalesce(F.col("tlp"), F.lit(0).cast("decimal(28,6)"))
        ).alias("score"),
    )
    best = (
        scored.groupBy("doc_id", "label")
        .agg(F.min(F.struct((-F.col("score")).alias("ns"), "lbl")).alias("m"))
        .select(
            "doc_id",
            "label",
            F.col("m.lbl").alias("pred"),
            (F.col("m.lbl") == F.col("label")).alias("correct"),
            (-F.col("m.ns")).cast("double").alias("score"),
        )
    )
    return best


def nb_lang_classify_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    min_count: int = 3,
) -> str:
    """DuckDB twin of :func:`nb_lang_classify`."""
    return f"""
WITH ex AS (
  SELECT {id_col} AS doc_id, unnest({words_sql(text_col)}) AS w
  FROM {table}),
vocab AS (SELECT w FROM ex GROUP BY w HAVING COUNT(*) >= {min_count}),
vsize AS (SELECT COUNT(*) AS v FROM vocab),
exv AS (SELECT doc_id, w FROM ex JOIN vocab USING (w)),
cnt AS (
  SELECT t.{label_col} AS lbl, e.w, COUNT(*) AS c
  FROM {table} t JOIN exv e ON t.{id_col} = e.doc_id
  GROUP BY t.{label_col}, e.w),
nl AS (SELECT lbl, CAST(SUM(c) AS BIGINT) AS n_l FROM cnt GROUP BY lbl),
docs_per AS (
  SELECT {label_col} AS lbl, COUNT(*) AS nd FROM {table} GROUP BY 1),
total_docs AS (SELECT COUNT(*) AS ndt FROM {table}),
labels AS (
  SELECT d.lbl,
         CAST(round(ln(CAST(d.nd AS DOUBLE) / t.ndt), 6)
              AS DECIMAL(28,6)) AS prior,
         COALESCE(n.n_l, 0) AS n_l, s.v
  FROM docs_per d
  CROSS JOIN total_docs t
  CROSS JOIN vsize s
  LEFT JOIN nl n ON n.lbl = d.lbl),
tok AS (
  SELECT e.doc_id, l.lbl,
         CAST(round(ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE)
                       / CAST(l.n_l + l.v AS DOUBLE)), 6)
              AS DECIMAL(28,6)) AS lp
  FROM exv e CROSS JOIN labels l
  LEFT JOIN cnt c ON c.lbl = l.lbl AND c.w = e.w),
tok_sum AS (
  SELECT doc_id, lbl, SUM(lp) AS tlp FROM tok GROUP BY doc_id, lbl),
scored AS (
  SELECT t.{id_col} AS doc_id, t.{label_col} AS label, l.lbl,
         l.prior + COALESCE(s.tlp, CAST(0 AS DECIMAL(28,6))) AS score
  FROM {table} t CROSS JOIN labels l
  LEFT JOIN tok_sum s ON s.doc_id = t.{id_col} AND s.lbl = l.lbl),
r AS (
  SELECT doc_id, label, lbl, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lbl) AS rn
  FROM scored)
SELECT doc_id, label, lbl AS pred, lbl = label AS correct,
       CAST(score AS DOUBLE) AS score
FROM r WHERE rn = 1
"""


def _lr_feats(df, id_col, text_col, label_col, positive):
    """Shared feature projection: (doc_id, f0=1, f1, f2, f3, y)."""
    from inception_spark.functions.hashing import words

    nw = F.size(words(F.col(text_col)))
    ln = F.length(F.col(text_col)).cast("double")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit(1.0).alias("f0"),
        (ln / F.lit(1000.0)).alias("f1"),
        (nw.cast("double") / F.lit(100.0)).alias("f2"),
        F.when(nw == 0, F.lit(0.0))
        .otherwise(ln / nw.cast("double"))
        .alias("f3"),
        F.when(F.col(label_col) == positive, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("y"),
    )


def lr_quality_classify(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    positive: str = "en",
    n_iter: int = 3,
    lr: float = 0.5,
) -> DataFrame:
    """Binary logistic regression trained IN the engine by full-batch
    gradient descent, then scored: (doc_id, y, prob, pred, correct).
    The fastText/CCNet "learned quality gate" slot with the same
    determinism engineering as k-means:

    * one feature projection (length, token count, mean token length —
      pure codegen, shared with the oracle);
    * each GD round is ONE aggregate: per-row gradient contributions
      ``round((sigmoid(w·x) − y)·x_j, 6)`` summed as DECIMAL(28,6) —
      order-independent, engine-exact modulo the accepted last-ulp
      ``exp`` libm risk (the doc_unigram_logprob class);
    * weights live DRIVER-side (control plane, 4 doubles) and update as
      ``w_j − lr·(sum_j / n)`` — IEEE double ops in a pinned order the
      DuckDB oracle replays with the same unrolled-CTE pattern as
      ``kmeans_train_sql``;
    * the returned frame is a pure plan with the final weights as
      literals — re-executable without re-training, zero joins.

    Resubstitution scoring (the NB contract): the deliverable is the
    distributed fit/score machinery, not a holdout methodology."""
    w = lr_quality_fit(
        df, id_col=id_col, text_col=text_col, label_col=label_col,
        positive=positive, n_iter=n_iter, lr=lr,
    )
    return lr_quality_score(
        df, w, id_col=id_col, text_col=text_col, label_col=label_col,
        positive=positive,
    )


_LR_FEAT_NAMES = ["f0", "f1", "f2", "f3"]


def _lr_sigmoid(weights):
    z = None
    for wj, nm in zip(weights, _LR_FEAT_NAMES):
        term = F.lit(float(wj)) * F.col(nm)
        z = term if z is None else z + term
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def lr_quality_fit(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    positive: str = "en",
    n_iter: int = 3,
    lr: float = 0.5,
) -> list[float]:
    """The GD rounds alone: returns the trained weights (driver-side
    control plane, 4 doubles) — feed them to :func:`lr_quality_score`,
    including over a STREAMING frame (the score is a stateless
    projection, so fit-in-batch / score-in-stream works unchanged)."""
    f = _lr_feats(df, id_col, text_col, label_col, positive).localCheckpoint(
        eager=False
    )
    w = [0.0, 0.0, 0.0, 0.0]
    for _ in range(max(1, int(n_iter))):
        p = _lr_sigmoid(w)
        row = f.agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(
                    F.round((p - F.col("y")) * F.col(nm), 6).cast(
                        "decimal(28,6)"
                    )
                ).alias(f"g{j}")
                for j, nm in enumerate(_LR_FEAT_NAMES)
            ],
        ).collect()[0]
        n = int(row["n"])
        w = [
            w[j] - float(lr) * (float(row[f"g{j}"]) / n)
            for j in range(len(_LR_FEAT_NAMES))
        ]
    return w


def lr_quality_score(
    df: DataFrame,
    weights: list[float],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    positive: str = "en",
) -> DataFrame:
    """Stateless scoring projection under literal ``weights`` — pure
    codegen, valid on batch AND streaming DataFrames."""
    f = _lr_feats(df, id_col, text_col, label_col, positive)
    prob = F.round(_lr_sigmoid(weights), 6)
    return f.select(
        "doc_id",
        "y",
        prob.alias("prob"),
        (prob >= F.lit(0.5)).alias("pred"),
        ((prob >= F.lit(0.5)) == (F.col("y") == F.lit(1.0))).alias(
            "correct"
        ),
    )


def lr_quality_classify_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
    positive: str = "en",
    n_iter: int = 3,
    lr: float = 0.5,
) -> str:
    """DuckDB twin: the same GD rounds unrolled as CTEs (the
    kmeans_train_sql pattern) — each round computes the DECIMAL gradient
    sums under the previous round's weights and derives the next weights
    with the identical double arithmetic."""
    from inception_spark.functions.hashing import words_sql

    w = words_sql(text_col)
    lrs = f"CAST({lr} AS DOUBLE)"
    sig = (
        "(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + exp(-("
        "{a}*f0 + {b}*f1 + {c}*f2 + {d}*f3))))"
    )
    ctes = [
        f"""f AS (
  SELECT {id_col} AS doc_id,
         CAST(1 AS DOUBLE) AS f0,
         CAST(length({text_col}) AS DOUBLE) / CAST(1000 AS DOUBLE) AS f1,
         CAST(len({w}) AS DOUBLE) / CAST(100 AS DOUBLE) AS f2,
         CASE WHEN len({w}) = 0 THEN CAST(0 AS DOUBLE)
              ELSE CAST(length({text_col}) AS DOUBLE)
                   / CAST(len({w}) AS DOUBLE) END AS f3,
         CASE WHEN {label_col} = '{positive}' THEN CAST(1 AS DOUBLE)
              ELSE CAST(0 AS DOUBLE) END AS y
  FROM {table})""",
        "nn AS (SELECT COUNT(*) AS n FROM f)",
        (
            "w0 AS (SELECT CAST(0 AS DOUBLE) AS a, CAST(0 AS DOUBLE) AS b,"
            " CAST(0 AS DOUBLE) AS c, CAST(0 AS DOUBLE) AS d)"
        ),
    ]
    for r in range(1, max(1, int(n_iter)) + 1):
        s = sig.format(a="w.a", b="w.b", c="w.c", d="w.d")
        gsums = ", ".join(
            f"SUM(CAST(round(({s} - y) * f{j} , 6) AS DECIMAL(28,6)))"
            f" AS g{j}"
            for j in range(4)
        )
        ctes.append(f"g{r} AS (SELECT {gsums} FROM f, w{r - 1} w)")
        ctes.append(
            f"""w{r} AS (
  SELECT w.a - {lrs} * (CAST(g.g0 AS DOUBLE) / nn.n) AS a,
         w.b - {lrs} * (CAST(g.g1 AS DOUBLE) / nn.n) AS b,
         w.c - {lrs} * (CAST(g.g2 AS DOUBLE) / nn.n) AS c,
         w.d - {lrs} * (CAST(g.g3 AS DOUBLE) / nn.n) AS d
  FROM w{r - 1} w, g{r} g, nn)"""
        )
    s = sig.format(a="w.a", b="w.b", c="w.c", d="w.d")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT doc_id, y, round({s}, 6) AS prob,
       round({s}, 6) >= CAST(0.5 AS DOUBLE) AS pred,
       (round({s}, 6) >= CAST(0.5 AS DOUBLE)) = (y = CAST(1 AS DOUBLE))
         AS correct
FROM f, w{max(1, int(n_iter))} w"""
    )

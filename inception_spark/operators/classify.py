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


# ---------------------------------------------------------------------------
# classifier evaluation: the quality-gate scorecard
# ---------------------------------------------------------------------------
#
# A learned quality/language gate (fastText/CCNet style — the
# lr_quality_classify / nb_lang_classify slots above) is only usable at
# 100 TB if you can measure it: AUC to pick a model, the PR curve to pick
# the operating threshold, calibration to trust the probabilities as
# sampling weights.  All three compile to the same scale shape:
# ONE hash aggregate over the scored corpus (group by distinct score —
# bounded by 10^6+1 values at the engine's 6-dp score discipline, usually
# far fewer) followed by a window over that tiny aggregate.  The corpus
# is scanned once; nothing quadratic, nothing collected.

def roc_auc(
    scored: DataFrame, *, label_col: str = "y", score_col: str = "prob"
) -> DataFrame:
    """→ 1 row (auc, n_pos, n_neg) — ROC-AUC by the Mann-Whitney
    rank-sum identity with average-rank tie handling (the exact value,
    not a trapezoid approximation):

        AUC = (R_pos − P(P+1)/2) / (P·N)

    where R_pos is the sum of (average) ranks of the positives under
    ascending score order.  Determinism: ranks of a tied score group
    are kept as INTEGERS by working with 2·rank (2·cum_before + n + 1),
    so the numerator is exact integer arithmetic and the single final
    division is a ratio of identical integers in every engine.  The
    global window runs over the per-score aggregate (≤ distinct scores
    rows), not the corpus."""
    from pyspark.sql import Window

    per = scored.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(label_col).cast("long")).alias("pos"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per.withColumn(
        "cum_before", F.coalesce(F.sum("n").over(w), F.lit(0))
    )
    agg = ranked.agg(
        F.sum(
            F.col("pos") * (F.lit(2) * F.col("cum_before") + F.col("n")
                            + F.lit(1))
        ).alias("r2"),          # 2 · Σ avg-ranks of positives
        F.sum("pos").alias("p"),
        F.sum("n").alias("t"),
    )
    p, t = F.col("p"), F.col("t")
    auc2_num = F.col("r2") - p * (p + F.lit(1))   # 2·U, exact bigint
    return agg.select(
        F.when(
            (p > 0) & (t - p > 0),
            F.round(
                auc2_num.cast("double")
                / (F.lit(2) * p * (t - p)).cast("double"),
                6,
            ),
        ).alias("auc"),
        p.cast("long").alias("n_pos"),
        (t - p).cast("long").alias("n_neg"),
    )


def roc_auc_sql(scored_rel: str, *, label_col: str = "y",
                score_col: str = "prob") -> str:
    """DuckDB twin of :func:`roc_auc` — ``scored_rel`` is a
    parenthesized relation or CTE name with the scored rows."""
    return f"""
WITH per AS (
  SELECT {score_col} AS s, COUNT(*) AS n,
         SUM(CAST({label_col} AS BIGINT)) AS pos
  FROM {scored_rel} GROUP BY {score_col}),
ranked AS (
  SELECT *, COALESCE(SUM(n) OVER (ORDER BY s
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM per),
agg AS (
  SELECT SUM(pos * (2 * cum_before + n + 1)) AS r2,
         SUM(pos) AS p, SUM(n) AS t
  FROM ranked)
SELECT CASE WHEN p > 0 AND t - p > 0 THEN
         round(CAST(r2 - p * (p + 1) AS DOUBLE)
               / CAST(2 * p * (t - p) AS DOUBLE), 6)
       END AS auc,
       CAST(p AS BIGINT) AS n_pos, CAST(t - p AS BIGINT) AS n_neg
FROM agg
"""


def pr_curve(
    scored: DataFrame, *, label_col: str = "y", score_col: str = "prob"
) -> DataFrame:
    """→ (threshold, tp, fp, precision, recall) — one point per
    distinct score, classifying positive at ``score ≥ threshold``
    (descending-threshold sweep).  Precision/recall are 6-dp rounds of
    integer ratios — engine-exact.  Same scale shape as
    :func:`roc_auc`: corpus-sized aggregate, score-sized window."""
    from pyspark.sql import Window

    per = scored.groupBy(F.col(score_col).alias("threshold")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(label_col).cast("long")).alias("pos"),
    )
    wd = Window.orderBy(F.desc("threshold")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cur = per.select(
        "threshold",
        F.sum("pos").over(wd).alias("tp"),
        (F.sum("n").over(wd) - F.sum("pos").over(wd)).alias("fp"),
        F.sum("pos").over(wall).alias("p_all"),
    )
    return cur.select(
        "threshold",
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.round(
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fp")).cast("double"),
            6,
        ).alias("precision"),
        F.when(
            F.col("p_all") > 0,
            F.round(
                F.col("tp").cast("double") / F.col("p_all").cast("double"),
                6,
            ),
        ).alias("recall"),
    )


def pr_curve_sql(scored_rel: str, *, label_col: str = "y",
                 score_col: str = "prob") -> str:
    """DuckDB twin of :func:`pr_curve`."""
    return f"""
WITH per AS (
  SELECT {score_col} AS threshold, COUNT(*) AS n,
         SUM(CAST({label_col} AS BIGINT)) AS pos
  FROM {scored_rel} GROUP BY {score_col}),
cur AS (
  SELECT threshold,
         SUM(pos) OVER (ORDER BY threshold DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
         SUM(n) OVER (ORDER BY threshold DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         - SUM(pos) OVER (ORDER BY threshold DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
         SUM(pos) OVER () AS p_all
  FROM per)
SELECT threshold, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6)
         AS precision,
       CASE WHEN p_all > 0 THEN
         round(CAST(tp AS DOUBLE) / CAST(p_all AS DOUBLE), 6)
       END AS recall
FROM cur
"""


def calibration_bins(
    scored: DataFrame, *, label_col: str = "y", score_col: str = "prob",
    n_bins: int = 10,
) -> DataFrame:
    """→ (bin, n, n_pos, mean_prob, frac_pos) — reliability-diagram
    bins: a well-calibrated gate has mean_prob ≈ frac_pos per bin,
    which is what justifies using its probabilities as sampling/mixing
    weights downstream.  ONE hash aggregate (n_bins rows out);
    mean_prob sums the 6-dp scores as exact DECIMAL before the single
    division, frac_pos is an integer ratio."""
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("long"),
        F.lit(int(n_bins) - 1),
    )
    agg = scored.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(label_col).cast("long")).alias("n_pos"),
        F.sum(F.col(score_col).cast("decimal(18,6)")).alias("s_dec"),
    )
    return agg.select(
        "bin",
        F.col("n").cast("long").alias("n"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.round(
            F.col("s_dec").cast("double") / F.col("n").cast("double"), 6
        ).alias("mean_prob"),
        F.round(
            F.col("n_pos").cast("double") / F.col("n").cast("double"), 6
        ).alias("frac_pos"),
    )


def calibration_bins_sql(scored_rel: str, *, label_col: str = "y",
                         score_col: str = "prob", n_bins: int = 10) -> str:
    """DuckDB twin of :func:`calibration_bins`."""
    return f"""
WITH agg AS (
  SELECT LEAST(CAST(FLOOR({score_col} * {n_bins}) AS BIGINT),
               {int(n_bins) - 1}) AS bin,
         COUNT(*) AS n, SUM(CAST({label_col} AS BIGINT)) AS n_pos,
         SUM(CAST({score_col} AS DECIMAL(18,6))) AS s_dec
  FROM {scored_rel} GROUP BY 1)
SELECT bin, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
       round(CAST(s_dec AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_prob,
       round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS frac_pos
FROM agg
"""


def best_f1_threshold(
    scored: DataFrame, *, label_col: str = "y", score_col: str = "prob"
) -> DataFrame:
    """→ 1 row (threshold, tp, fp, precision, recall, f1) — the
    operating point a deployed quality gate actually needs: the
    :func:`pr_curve` sweep reduced to its max-F1 threshold (highest
    threshold wins ties, so the chosen gate is the most conservative of
    the equally-good ones).  F1 is computed from the 6-dp rounded
    precision/recall — identical doubles in every engine — and itself
    rounded to 6 dp before the arg-max."""
    from pyspark.sql import Window

    pts = pr_curve(scored, label_col=label_col, score_col=score_col)
    f1 = F.when(
        (F.col("precision") + F.col("recall")) > 0,
        F.round(
            F.lit(2.0) * F.col("precision") * F.col("recall")
            / (F.col("precision") + F.col("recall")),
            6,
        ),
    ).otherwise(F.lit(0.0))
    w = Window.orderBy(F.desc("f1"), F.desc("threshold"))
    return (
        pts.withColumn("f1", f1)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("threshold", "tp", "fp", "precision", "recall", "f1")
    )


def best_f1_threshold_sql(scored_rel: str, *, label_col: str = "y",
                          score_col: str = "prob") -> str:
    """DuckDB twin of :func:`best_f1_threshold`."""
    inner = pr_curve_sql(scored_rel, label_col=label_col,
                         score_col=score_col)
    return f"""
WITH pts AS ({inner}),
f AS (
  SELECT *, CASE WHEN precision + recall > 0 THEN
      round(2.0 * precision * recall / (precision + recall), 6)
    ELSE 0.0 END AS f1
  FROM pts)
SELECT threshold, tp, fp, precision, recall, f1
FROM f ORDER BY f1 DESC, threshold DESC LIMIT 1
"""

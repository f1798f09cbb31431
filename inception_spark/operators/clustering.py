"""Distributed k-means clustering and SemDeDup-style semantic dedup.

Fills the "cluster the corpus's embedding space" slot of a training-data
pipeline: k-means gives the partitioning used by semantic dedup (SemDeDup,
Abbas et al. 2023 — remove documents whose embeddings are near-identical
to an earlier-kept document *within the same cluster*), curriculum /
difficulty binning, and topic-balanced sampling.  The reference service
(/root/reference/inception/embedding_service.py) produces the embeddings;
this module is the corpus-level consumer the reference leaves to its
callers.

Determinism engineering — the whole of Lloyd's algorithm runs in integer
micro-units so every engine produces bit-identical assignments:

* coordinates quantize once to ``floor(x*1e6 + 0.5) + OFF`` (half-up, the
  ``_pq_sub_dist_units`` convention) with ``OFF = 2^21`` so every value is
  a non-negative int64 — from then on there is NO float anywhere;
* distances are integer squared L2 (the +OFF shift cancels in the
  subtraction); argmin ties break on the smaller centroid id;
* centroid updates are ``sum div count`` — floor division of non-negative
  int64, identical in Spark (``div``), DuckDB (``//``) and Python
  (``//``), the pagerank "picorank" discipline;
* seeds are the ``k`` rows with the smallest ``(md5(id), id)`` — the same
  deterministic pseudo-random draw as ``ivf_flat_topk`` / ``pq_codebook``.

Scale shape (the part that matters at 100 TB): centroids live DRIVER-side
(k·d int64s — control plane), so cluster assignment is a zero-join,
zero-shuffle whole-stage-codegen scan with the centroids riding as plan
literals, and each Lloyd round is ONE hash aggregate (k groups × d+1
columns) with map-side partial combine — per-round cluster traffic is
``k·(d+1)·n_tasks`` longs, independent of row count.  The quantized input
is localCheckpoint'ed once so the n_iter rounds don't re-derive it.  For
k beyond a few hundred the literal argmin expression gets large; that
regime wants the broadcast-join formulation instead (see ``_ivf_cells``),
trading a broadcast hash join per round for unbounded k.

Overflow headroom: unit-norm embedding coords quantize to ≤ ~3.1e6 units;
per-dimension sums stay under 2^63 up to ~3e12 rows per cluster, and
squared distances under 2^63 up to ~10^5 dimensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

UNIT = 1_000_000  # micro-units per 1.0 of coordinate
OFF = 1 << 21     # shift making every quantized coordinate non-negative


def _uvec_expr(vec):
    """Column expr: half-up micro-unit quantization of a float vector,
    shifted non-negative — usable inline so callers can assign cluster
    ids in the SAME scan that reads the floats (no quantize-then-join)."""
    return F.transform(
        vec,
        lambda x: (
            F.floor(x.cast("double") * F.lit(float(UNIT)) + F.lit(0.5))
            + F.lit(OFF)
        ).cast("long"),
    )


def quantize_units(
    df: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, uvec array<long>): half-up micro-unit quantization, shifted
    non-negative.  Requires coordinates in (-2, 2) — true for the
    unit-norm embeddings this engine produces (OFF/UNIT ≈ 2.097)."""
    return df.select(
        F.col(id_col).alias("id"), _uvec_expr(F.col(vec_col)).alias("uvec")
    )


def _dist2(uvec, cent: list[int]):
    """Integer squared L2 between ``uvec`` and a literal centroid."""
    lit = F.array(*[F.lit(int(v)) for v in cent])
    return F.aggregate(
        F.zip_with(uvec, lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _argmin_on(uvec, cents: list[list[int]]):
    """struct(d, cid) of the nearest literal centroid (min-cid ties).

    The centroid matrix rides as ONE 2-D array literal probed by a
    single indexed ``transform`` lambda, instead of k per-centroid
    expression expansions — identical arithmetic, but the expression
    tree (and Catalyst analysis time, which dominates when the plan is
    built per query) stays O(k·d literals + 1 lambda), not O(k lambdas).
    Python ints lower to LongType, so the literal is array<array<bigint>>
    exactly like the per-element F.lit path it replaces.

    ``uvec`` is LET-BOUND through a one-element-array transform before
    the per-centroid probe (r14, guide §4.2's "materialize the word
    array" lesson at the expression level): higher-order-function
    lambdas are interpreted with no common-subexpression elimination,
    so when callers pass an INLINE quantization expression
    (``_uvec_expr(floats)``, a d-element transform) the per-centroid
    ``zip_with`` would re-evaluate it once per centroid — k× the
    quantize work per argmin evaluation (×3 plan references in
    semantic_dedup).  Binding it to a lambda variable evaluates it
    exactly once per row; a plain projection alias can't guarantee
    that (CollapseProject re-inlines single-reference producers).
    Measured a WASH at this fixture's shape (same-session interleaved
    A/B min-of-4 at sf0.1: semantic_dedup 3.28 → 3.19, kmeans_train
    2.28 → 2.38 — k=8 × d=64 quantize re-evaluation is small next to
    the Lloyd rounds' driver-side jobs and the dup-pair matmuls) and
    KEPT as structural insurance: the re-evaluation grows with k, and
    this is the same interpreted-HOF inlining class that cost 10×
    elsewhere (hashing.shingles_from_words).  Bit-identical outputs,
    oracle-green at sf0.001/0.01, collect-equal at sf0.1."""
    lit2 = F.lit([[int(v) for v in c] for c in cents])

    def _min_over(uv):
        return F.array_min(
            F.transform(
                lit2,
                lambda c, i: F.struct(
                    F.aggregate(
                        F.zip_with(uv, c, lambda x, y: (x - y) * (x - y)),
                        F.lit(0).cast("long"),
                        lambda acc, x: acc + x,
                    ).alias("d"),
                    i.alias("cid"),  # transform index is INT, as F.lit(cid) was
                ),
            )
        )

    return F.element_at(
        F.transform(F.array(uvec), lambda uv: _min_over(uv)), 1
    )


def _argmin_expr(cents: list[list[int]]):
    return _argmin_on(F.col("uvec"), cents)


def kmeans_seeds(u: DataFrame, k: int) -> list[list[int]]:
    """The k smallest (md5(id), id) rows' uvecs, in draw order —
    driver-side control plane (k·d int64s), like ``pq_codebook``."""
    rows = (
        u.select(F.md5(F.col("id").cast("string")).alias("h"), "id", "uvec")
        .orderBy("h", "id")
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(rows)}")
    return [[int(v) for v in r["uvec"]] for r in rows]


def kmeans_fit(
    df: DataFrame,
    *,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[int]]:
    """Run Lloyd's rounds and return the final centroids (driver-side
    control plane, k·d int64 micro-units).  Each round: one
    literal-centroid codegen scan (no join, no shuffle) + one k-row hash
    aggregate collected to the driver."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    u = quantize_units(df, id_col=id_col, vec_col=vec_col).localCheckpoint(
        eager=False
    )
    cents = kmeans_seeds(u, k)
    dim = len(cents[0])
    for _ in range(n_iter):
        m = _argmin_expr(cents)
        agg = (
            u.select(m["cid"].alias("cid"), "uvec")
            .groupBy("cid")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.element_at("uvec", i + 1)).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        new = [list(c) for c in cents]  # empty cluster keeps its centroid
        for r in agg:
            n = int(r["n"])
            new[int(r["cid"])] = [int(r[f"s{i}"]) // n for i in range(dim)]
        cents = new
    return cents


def kmeans_train(
    df: DataFrame,
    *,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means, bit-exact across engines: returns the final
    assignment ``(id, cid, dist2_units)``.

    The returned DataFrame is a pure plan over the input with the final
    centroids as literals — re-executable without re-training, and the
    assignment scan quantizes inline (one pass over the floats, zero
    joins, zero shuffles)."""
    cents = kmeans_fit(
        df, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col
    )
    m = _argmin_on(_uvec_expr(F.col(vec_col)), cents)
    return df.select(
        F.col(id_col),
        m["cid"].alias("cid"),
        m["d"].alias("dist2_units"),
    )


def kmeans_train_sql(
    table: str = "embeddings",
    *,
    k: int = 8,
    n_iter: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin: the same integer Lloyd iteration unrolled into CTEs
    (the ``pagerank_sql`` pattern).  Per-dimension sums are generated as
    explicit ``list_value(...)`` terms; ``CAST AS BIGINT`` pins DuckDB's
    HUGEINT sum widening back to int64."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    d2 = (
        "CAST(list_sum(list_transform(list_zip(u.uvec, c.cvec),"
        " p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT)"
    )
    ctes = [
        f"""u AS (
  SELECT {id_col} AS id,
         list_transform({vec_col},
           x -> CAST(floor(CAST(x AS DOUBLE)*{UNIT} + 0.5) AS BIGINT)
                + {OFF}) AS uvec
  FROM {table})""",
        f"""c0 AS (
  SELECT cid, uvec AS cvec FROM (
    SELECT uvec,
           row_number() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id) - 1
             AS cid
    FROM u) WHERE cid < {k})""",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"""a{i} AS (
  SELECT id, uvec, cid, d FROM (
    SELECT u.id, u.uvec, c.cid, {d2} AS d,
           row_number() OVER (PARTITION BY u.id ORDER BY d, c.cid) AS rn
    FROM u CROSS JOIN c{i - 1} c) WHERE rn = 1)"""
        )
        sums = ", ".join(
            f"CAST(SUM(uvec[{j + 1}]) AS BIGINT) AS s{j}"
            for j in range(dim)
        )
        mean = ", ".join(f"g.s{j} // g.n" for j in range(dim))
        ctes.append(
            f"""g{i} AS (
  SELECT cid, COUNT(*) AS n, {sums} FROM a{i} GROUP BY cid)""",
        )
        ctes.append(
            f"""c{i} AS (
  SELECT c.cid,
         CASE WHEN g.n IS NULL THEN c.cvec
              ELSE list_value({mean}) END AS cvec
  FROM c{i - 1} c LEFT JOIN g{i} g USING (cid))"""
        )
    # final assignment under the post-update centroids (= what the Spark
    # side returns after its last round)
    ctes.append(
        f"""afin AS (
  SELECT id, cid, d FROM (
    SELECT u.id, c.cid, {d2} AS d,
           row_number() OVER (PARTITION BY u.id ORDER BY d, c.cid) AS rn
    FROM u CROSS JOIN c{n_iter} c) WHERE rn = 1)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT id AS {id_col}, cid, d AS dist2_units FROM afin"
    )


def semantic_dedup(
    df: DataFrame,
    *,
    k: int = 8,
    n_iter: int = 2,
    eps: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_block: int = 4096,
    chunk: int = 2048,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster embeddings with k-means,
    then within each cluster drop every item whose rounded cosine to a
    SMALLER-id cluster-mate reaches ``eps`` — the deterministic stand-in
    for "keep one representative per semantic-duplicate set".  Returns
    ``(id, cid, keep)`` for every input row.

    Scale shape: (1) cluster assignment is an INLINE literal-centroid
    expression on the float scan (fit collects centroids driver-side) —
    no quantize-then-join; (2) the quadratic within-cluster step
    delegates to :func:`dedup.embedding_dup_pairs` with the cluster id
    as the block key — the declared grid-matmul family: bounded
    ``applyInPandas`` groups for small clusters, and the EXACT
    chunk-pair-grid decomposition for hot ones, so a pathological
    cluster spreads over (n/chunk)² tasks instead of landing O(n²) on
    one worker.  A row-at-a-time JVM pair join was measured 6× slower
    here: 250k pairs × 64-dim interpreted higher-order-function dots vs
    one numpy matmul per grid cell.  Cosine is rounded to 6 dp before
    the threshold compare (the repo-wide score discipline, same as the
    ``embedding_dup_pairs`` oracle).  ``id_col`` must be integral (the
    pair schema is long — the embedding_dup_pairs contract)."""
    from inception_spark.operators.dedup import embedding_dup_pairs

    cents = kmeans_fit(
        df, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col
    )
    cid = _argmin_on(_uvec_expr(F.col(vec_col)), cents)["cid"]
    # NOT checkpointed: the three static-plan evaluations of the
    # literal-centroid argmin (two dup-pair strata + keep join) share
    # work through runtime exchange reuse — a same-session A/B
    # (3 alternating rounds, sf0.1) read 5.31 s with an assignment
    # localCheckpoint vs 4.80 s without (guide §1: measure first).
    assigned = df.select(
        F.col(id_col), F.col(vec_col), cid.alias("_sd_cid")
    )
    pairs = embedding_dup_pairs(
        assigned,
        id_col=id_col,
        vec_col=vec_col,
        block_col="_sd_cid",
        threshold=eps,
        max_block=max_block,
        chunk=chunk,
    )
    # drop every id with a SMALLER-id cluster-mate at/above eps: pairs
    # come back vec_a < vec_b, so the drop set is exactly {vec_b}
    dups = (
        pairs.select(F.col("vec_b").alias(id_col))
        .distinct()
        .withColumn("dup", F.lit(True))
    )
    assign = assigned.select(
        F.col(id_col), F.col("_sd_cid").alias("cid")
    )
    return (
        assign.join(dups, id_col, "left")
        .select(
            id_col,
            "cid",
            F.coalesce(~F.col("dup"), F.lit(True)).alias("keep"),
        )
    )


def semantic_dedup_sql(
    table: str = "embeddings",
    *,
    k: int = 8,
    n_iter: int = 2,
    eps: float = 0.5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin: k-means replay + the same cluster-blocked pair scan."""
    from inception_spark.functions.vectors import cosine_sql

    km = kmeans_train_sql(
        table,
        k=k,
        n_iter=n_iter,
        dim=dim,
        id_col=id_col,
        vec_col=vec_col,
    )
    cs = cosine_sql("a.vb_a", "b.vb_b")
    return f"""
WITH assign AS ({km}),
j AS (
  SELECT t.{id_col} AS id, s.cid, t.{vec_col} AS v
  FROM {table} t JOIN assign s ON t.{id_col} = s.{id_col}),
dups AS (
  SELECT DISTINCT b.id_b AS id
  FROM (SELECT cid, id AS id_a, v AS vb_a FROM j) a
  JOIN (SELECT cid, id AS id_b, v AS vb_b FROM j) b USING (cid)
  WHERE a.id_a < b.id_b
    AND COALESCE(round({cs}, 6), -2.0) >= {eps})
SELECT s.{id_col}, s.cid, d.id IS NULL AS keep
FROM assign s LEFT JOIN dups d ON s.{id_col} = d.id
"""


def kcenter_coreset(
    df: DataFrame,
    *,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985 farthest-point
    traversal — the selection rule behind k-Center data pruning and
    diverse eval-set seeding): start from the deterministic md5 draw's
    first row, then k−1 times add the point FARTHEST from the selected
    set.  Returns (vec_id, sel_order, radius2): ``radius2`` is the
    selected point's squared distance to the previously-selected set —
    the classic 2-approximation of the covering radius, so the k rows
    ARE the coverage-radius curve ("how much diversity does the next
    exemplar buy").

    Determinism: the kmeans micro-unit discipline end to end — integer
    squared L2, argmax ties on the smaller id, seed = smallest
    (md5(id), id).  A point already selected has distance 0 and can
    never beat a positive candidate; a degenerate corpus with < k
    distinct vectors raises rather than emitting duplicate exemplars.

    Scale shape: selected centers live DRIVER-side (≤ k·d int64s —
    control plane); each round is ONE whole-stage-codegen scan with
    the centers riding as plan literals into a TakeOrderedAndProject
    1-row reduce (orderBy+limit — never a global sort), k−1 rounds
    total, no shuffle anywhere.  The quantized input is
    localCheckpoint'ed once."""
    spark = df.sparkSession
    u = quantize_units(df, id_col=id_col, vec_col=vec_col).localCheckpoint(
        eager=False
    )
    first = (
        u.select(
            F.md5(F.col("id").cast("string")).alias("h"), "id", "uvec"
        )
        .orderBy("h", "id")
        .limit(1)
        .collect()
    )
    if not first:
        raise ValueError("kcenter_coreset: empty input")
    sel: list[tuple] = [(first[0]["id"], list(first[0]["uvec"]), None)]
    for _ in range(int(k) - 1):
        cents = [uv for _, uv, _ in sel]
        dmin = _argmin_on(F.col("uvec"), cents).getField("d")
        # carry uvec through the TakeOrdered row: one scan per round,
        # not a second full scan to re-read the winner's coordinates
        row = (
            u.select("id", "uvec", dmin.alias("d"))
            .orderBy(F.desc("d"), F.asc("id"))
            .limit(1)
            .collect()[0]
        )
        if row["d"] == 0:
            raise RuntimeError(
                "kcenter_coreset: fewer than k distinct vectors — "
                "the next exemplar would duplicate a selected center"
            )
        sel.append((row["id"], list(row["uvec"]), row["d"]))
    return spark.createDataFrame(
        [
            (int(sid), i + 1, None if r is None else int(r))
            for i, (sid, _, r) in enumerate(sel)
        ],
        "vec_id long, sel_order long, radius2 long",
    )


def kcenter_coreset_sql(
    table: str = "embeddings",
    *,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`kcenter_coreset` — the greedy traversal
    unrolled into CTEs: each round LEAST-folds the new center's
    distance into the running min (identical integers to the engine's
    fresh argmin over all centers), then a 1-row ORDER BY ... LIMIT 1
    pick with the same (dmin DESC, id) tie-break."""
    d2 = (
        "CAST(list_sum(list_transform(list_zip({L}.uvec, s.uvec),"
        " p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT)"
    )
    ctes = [
        f"""u AS (
  SELECT {id_col} AS id,
         list_transform({vec_col},
           x -> CAST(floor(CAST(x AS DOUBLE)*{UNIT} + 0.5) AS BIGINT)
                + {OFF}) AS uvec
  FROM {table})""",
        """s1 AS (
  SELECT id, uvec FROM u
  ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT 1)""",
        f"""d1 AS (
  SELECT u.id, u.uvec, {d2.format(L='u')} AS dmin
  FROM u CROSS JOIN s1 s)""",
    ]
    for i in range(2, int(k) + 1):
        ctes.append(
            f"""s{i} AS (
  SELECT id, uvec, dmin FROM d{i - 1}
  ORDER BY dmin DESC, id LIMIT 1)"""
        )
        if i < int(k):
            ctes.append(
                f"""d{i} AS (
  SELECT d.id, d.uvec,
         LEAST(d.dmin, {d2.format(L='d')}) AS dmin
  FROM d{i - 1} d CROSS JOIN s{i} s)"""
            )
    picks = [
        "SELECT CAST(id AS BIGINT) AS vec_id, CAST(1 AS BIGINT) AS"
        " sel_order, CAST(NULL AS BIGINT) AS radius2 FROM s1"
    ] + [
        f"SELECT CAST(id AS BIGINT), CAST({i} AS BIGINT),"
        f" CAST(dmin AS BIGINT) FROM s{i}"
        for i in range(2, int(k) + 1)
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(picks)
    )

"""Conversation / SFT training-data operators.

Chat-style fine-tuning data is its own modality: a corpus of
CONVERSATIONS (ordered role-tagged turns), not flat documents — and a
training pipeline over it needs operators documents don't: turn
fan-out, chat-template rendering with exact framing accounting,
loss-mask (trainable-vs-masked token) budgeting, and turn-level
dedup (boilerplate greetings and canned answers repeat across
conversations far more than whole documents repeat).

The corpus here is derived DETERMINISTICALLY from the documents table
so every operator has a full-strength relational oracle: each document
becomes one conversation by splitting its text on single spaces and
folding consecutive ``TURN_WORDS``-word windows into alternating
user/assistant turns (conversation id = doc_id; a fixed system prompt
heads every conversation; documents whose doc_id % 13 == 0 open with a
canned greeting turn — the deliberate cross-conversation duplicate the
dedup operator must find).  Both engines — the Spark pipeline below
and the DuckDB oracle SQL — REBUILD the turns independently from
``documents.text`` with pure relational code (split → window slice →
re-join), so a slip anywhere in the fan-out arithmetic, role
assignment, template framing, or dedup keying is a value-hash
mismatch, not a plausible-looking number.

Spark shape (scales to 100 TB of chat logs):

* turn fan-out is ``posexplode`` over a computed slice array — pure
  Catalyst, whole-stage codegen, no Python;
* per-conversation stats fold BEFORE any shuffle (the slice arithmetic
  is per-row); corpus rollups are one map-side-combined aggregate;
* turn dedup is hash-groupBy on the turn text (the exact-dedup shape of
  ``operators/dedup.py``) — shuffle keyed by turn hash, never all-pairs;
* template rendering is ``concat_ws`` over the already-ordered slice
  array — no collect, no window over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: words per turn window (small enough that fixture docs yield
#: multi-turn conversations, large enough that turns carry content)
TURN_WORDS = 24

#: the fixed system prompt every conversation opens with
SYSTEM_PROMPT = "You are a helpful assistant."

#: the canned opening turn for doc_id % 13 == 0 conversations — the
#: deliberate cross-conversation duplicate
GREETING = "Hello! How can I help you today?"

#: chat-template framing (role headers the renderer emits)
_HDR_SYS = "### System\n"
_HDR_USER = "\n### User\n"
_HDR_ASST = "\n### Assistant\n"


def conversation_turns(docs: DataFrame) -> DataFrame:
    """documents → (conv_id, turn_no, role, turn_text): the
    deterministic turn fan-out.  turn 0 is the canned greeting for
    doc_id % 13 == 0 conversations, else the first word window; roles
    alternate user/assistant from turn 0."""
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    n_turns = F.ceil(n_words / F.lit(TURN_WORDS)).cast("int")
    turns = F.transform(
        F.sequence(F.lit(0), n_turns - 1),
        lambda i: F.concat_ws(
            " ", F.slice(words, i * TURN_WORDS + 1, TURN_WORDS)
        ),
    )
    turns = F.when(
        F.col("doc_id") % 13 == 0,
        F.concat(
            F.array(F.lit(GREETING)),
            F.slice(turns, 2, F.size(turns) - 1),
        ),
    ).otherwise(turns)
    return (
        docs.where(F.col("text").isNotNull())
        .select(
            F.col("doc_id").alias("conv_id"),
            F.posexplode(turns).alias("turn_no", "turn_text"),
        )
        .withColumn(
            "role",
            F.when(F.col("turn_no") % 2 == 0, F.lit("user")).otherwise(
                F.lit("assistant")
            ),
        )
        .select("conv_id", "turn_no", "role", "turn_text")
    )


#: the same fan-out in DuckDB (generate_series lateral + list slice);
#: {docs} lets callers restrict the source
TURNS_SQL_TPL = f"""
  SELECT d.doc_id AS conv_id,
         g.i AS turn_no,
         CASE WHEN g.i % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN d.doc_id % 13 = 0 AND g.i = 0 THEN '{GREETING}'
              ELSE array_to_string(
                     (string_split(d.text, ' '))
                       [g.i * {TURN_WORDS} + 1 : (g.i + 1) * {TURN_WORDS}],
                     ' ')
         END AS turn_text
  FROM ({{docs}}) d,
       LATERAL (
         SELECT UNNEST(generate_series(
           0,
           CAST(CEIL(len(string_split(d.text, ' '))
                     / {TURN_WORDS}.0) AS BIGINT) - 1)) AS i
       ) g
"""

TURNS_SQL = TURNS_SQL_TPL.format(
    docs="SELECT doc_id, text FROM documents WHERE text IS NOT NULL"
)


def conv_turn_stats(docs: DataFrame) -> DataFrame:
    """Per-conversation accounting: turn counts and per-role word/char
    volume — the shape a mixture builder reads before budgeting."""
    t = conversation_turns(docs)
    wc = F.size(F.split(F.col("turn_text"), " "))
    return (
        t.groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.sum((F.col("role") == "user").cast("long"))
            .cast("long")
            .alias("n_user_turns"),
            F.sum(F.when(F.col("role") == "user", wc).otherwise(0))
            .cast("long")
            .alias("user_words"),
            F.sum(
                F.when(F.col("role") == "assistant", wc).otherwise(0)
            )
            .cast("long")
            .alias("asst_words"),
            F.sum(F.length("turn_text"))
            .cast("long")
            .alias("turn_chars"),
        )
        .orderBy("conv_id")
    )


CONV_TURN_STATS_SQL = f"""
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(COUNT(*) FILTER (WHERE role = 'user') AS BIGINT)
         AS n_user_turns,
       CAST(COALESCE(SUM(CASE WHEN role = 'user'
                    THEN len(string_split(turn_text, ' ')) END), 0)
            AS BIGINT) AS user_words,
       CAST(COALESCE(SUM(CASE WHEN role = 'assistant'
                    THEN len(string_split(turn_text, ' ')) END), 0)
            AS BIGINT) AS asst_words,
       CAST(SUM(length(turn_text)) AS BIGINT) AS turn_chars
FROM ({TURNS_SQL}) t
GROUP BY conv_id
ORDER BY conv_id
"""


def chat_template_render(docs: DataFrame) -> DataFrame:
    """Render each conversation through the fixed chat template and
    account for it EXACTLY: rendered_chars must equal the closed-form
    framing arithmetic (system header + prompt + per-turn headers +
    turn text), which the oracle restates over the rebuilt turns — an
    off-by-one in any separator breaks the hash.  Returns the
    accounting, not the rendered blobs (control-plane width); the
    rendering itself IS executed (length() is computed over the
    rendered string)."""
    t = conversation_turns(docs)
    rendered = F.concat(
        F.lit(_HDR_SYS),
        F.lit(SYSTEM_PROMPT),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("turn_no", "role", "turn_text"))
            ),
            F.lit(""),
            lambda acc, x: F.concat(
                acc,
                F.when(
                    x["role"] == "user", F.lit(_HDR_USER)
                ).otherwise(F.lit(_HDR_ASST)),
                x["turn_text"],
            ),
        ),
    )
    return (
        t.groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.length(rendered).cast("long").alias("rendered_chars"),
        )
        .orderBy("conv_id")
    )


CHAT_TEMPLATE_SQL = f"""
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST({len(_HDR_SYS) + len(SYSTEM_PROMPT)}
            + SUM(CASE WHEN role = 'user' THEN {len(_HDR_USER)}
                       ELSE {len(_HDR_ASST)} END + length(turn_text))
            AS BIGINT) AS rendered_chars
FROM ({TURNS_SQL}) t
GROUP BY conv_id
ORDER BY conv_id
"""


def sft_mask_stats(docs: DataFrame) -> DataFrame:
    """Corpus-level loss-mask budget: assistant-turn words train, user/
    system words are masked — the number that decides whether an SFT
    mix is worth its storage.  ONE map-side-combined aggregate."""
    t = conversation_turns(docs)
    wc = F.size(F.split(F.col("turn_text"), " "))
    return t.agg(
        F.count("*").cast("long").alias("n_turns"),
        F.countDistinct("conv_id").cast("long").alias("n_convs"),
        F.sum(F.when(F.col("role") == "assistant", wc).otherwise(0))
        .cast("long")
        .alias("trainable_words"),
        F.sum(F.when(F.col("role") == "user", wc).otherwise(0))
        .cast("long")
        .alias("masked_words"),
    ).select(
        "n_turns",
        "n_convs",
        "trainable_words",
        "masked_words",
        (
            F.col("trainable_words")
            / (F.col("trainable_words") + F.col("masked_words"))
        ).alias("trainable_ratio"),
    )


SFT_MASK_SQL = f"""
SELECT n_turns, n_convs, trainable_words, masked_words,
       CAST(trainable_words AS DOUBLE)
         / (trainable_words + masked_words) AS trainable_ratio
FROM (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_turns,
         CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs,
         CAST(COALESCE(SUM(CASE WHEN role = 'assistant'
                      THEN len(string_split(turn_text, ' ')) END), 0)
              AS BIGINT) AS trainable_words,
         CAST(COALESCE(SUM(CASE WHEN role = 'user'
                      THEN len(string_split(turn_text, ' ')) END), 0)
              AS BIGINT) AS masked_words
  FROM ({TURNS_SQL}) t
) s
"""


def conv_turn_dedup(docs: DataFrame) -> DataFrame:
    """Turn-level exact dedup across conversations: hash-groupBy on
    turn text (md5 key, same discipline as operators/dedup.exact
    dedup), keep groups seen in MORE than one conversation.  The
    canned greeting is the engineered hot group; any naturally
    repeated word-window also surfaces, and the oracle — rebuilding
    every turn — finds exactly the same groups."""
    t = conversation_turns(docs)
    return (
        t.groupBy(F.md5(F.col("turn_text")).alias("turn_md5"))
        .agg(
            F.countDistinct("conv_id").cast("long").alias("n_convs"),
            F.count("*").cast("long").alias("n_turns"),
            F.min("conv_id").cast("long").alias("first_conv"),
            F.min(F.length("turn_text"))
            .cast("long")
            .alias("turn_len"),
        )
        .filter(F.col("n_convs") > 1)
        .orderBy("turn_md5")
    )


CONV_DEDUP_SQL = f"""
SELECT md5(turn_text) AS turn_md5,
       CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(MIN(conv_id) AS BIGINT) AS first_conv,
       CAST(MIN(length(turn_text)) AS BIGINT) AS turn_len
FROM ({TURNS_SQL}) t
GROUP BY md5(turn_text)
HAVING COUNT(DISTINCT conv_id) > 1
ORDER BY turn_md5
"""


def conv_dedup_partials(docs_batch: DataFrame) -> DataFrame:
    """Per-batch turn-hash counters.  Each conversation lives in
    exactly one batch, so per-batch distinct-conv counts re-SUM to the
    global distinct count — the same mergeability argument as the mask
    partials, keyed by turn hash."""
    t = conversation_turns(docs_batch)
    return t.groupBy(F.md5(F.col("turn_text")).alias("turn_md5")).agg(
        F.countDistinct("conv_id").cast("long").alias("n_convs"),
        F.count("*").cast("long").alias("n_turns"),
        F.min("conv_id").cast("long").alias("first_conv"),
        F.min(F.length("turn_text")).cast("long").alias("turn_len"),
    )


def conv_dedup_from_partials(parts: DataFrame) -> DataFrame:
    return (
        parts.groupBy("turn_md5")
        .agg(
            F.sum("n_convs").cast("long").alias("n_convs"),
            F.sum("n_turns").cast("long").alias("n_turns"),
            F.min("first_conv").cast("long").alias("first_conv"),
            F.min("turn_len").cast("long").alias("turn_len"),
        )
        .filter(F.col("n_convs") > 1)
        .orderBy("turn_md5")
    )


# ---------------------------------------------------------------------------
# streaming twin: the corpus mask budget as exactly mergeable partials
# ---------------------------------------------------------------------------


def sft_mask_partials(docs_batch: DataFrame) -> DataFrame:
    """Per-batch partial counters for the mask budget.  conv_id is
    carried per-conversation (one doc = one conversation = one batch
    row family), so COUNT DISTINCT re-merges exactly as a count of
    distinct conv_ids across partials."""
    t = conversation_turns(docs_batch)
    wc = F.size(F.split(F.col("turn_text"), " "))
    return t.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum(F.when(F.col("role") == "assistant", wc).otherwise(0))
        .cast("long")
        .alias("trainable_words"),
        F.sum(F.when(F.col("role") == "user", wc).otherwise(0))
        .cast("long")
        .alias("masked_words"),
    )


def sft_mask_from_partials(parts: DataFrame) -> DataFrame:
    return parts.agg(
        F.sum("n_turns").cast("long").alias("n_turns"),
        F.countDistinct("conv_id").cast("long").alias("n_convs"),
        F.sum("trainable_words").cast("long").alias("trainable_words"),
        F.sum("masked_words").cast("long").alias("masked_words"),
    ).select(
        "n_turns",
        "n_convs",
        "trainable_words",
        "masked_words",
        (
            F.col("trainable_words")
            / (F.col("trainable_words") + F.col("masked_words"))
        ).alias("trainable_ratio"),
    )

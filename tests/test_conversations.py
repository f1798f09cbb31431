"""Conversation/SFT operators: fan-out arithmetic, template framing,
dedup semantics.  The oracle sweep proves value parity with DuckDB;
these pin the properties the oracles state implicitly.
"""

import pytest
from pyspark.sql import functions as F

from inception_spark.operators import conversations as C


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 0 % 13 == 0: canned greeting replaces turn 0
        (0, "alpha " * (C.TURN_WORDS * 2)),
        # exactly one turn
        (1, "one short doc"),
        # exact multiple of the window: no ragged last turn
        (2, "w " * (C.TURN_WORDS * 3)),
        # ragged last turn
        (3, "x " * (C.TURN_WORDS + 5)),
        # 26 % 13 == 0 and shares the greeting with conv 0
        (26, "beta " * C.TURN_WORDS),
    ]
    return spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], ["doc_id", "text"]
    )


def test_turn_fanout_counts_and_roles(docs):
    t = C.conversation_turns(docs).collect()
    by_conv = {}
    for r in t:
        by_conv.setdefault(r["conv_id"], []).append(r)
    # trailing strip: doc 0 has 2*W words -> "alpha "*2W stripped is
    # still 2W words -> 2 turns; doc 3 has W+5 -> 2 turns (ragged)
    assert len(by_conv[0]) == 2
    assert len(by_conv[1]) == 1
    assert len(by_conv[2]) == 3
    assert len(by_conv[3]) == 2
    for conv in by_conv.values():
        for r in conv:
            want = "user" if r["turn_no"] % 2 == 0 else "assistant"
            assert r["role"] == want


def test_greeting_replaces_turn_zero_only_for_13_multiples(docs):
    t = {
        (r["conv_id"], r["turn_no"]): r["turn_text"]
        for r in C.conversation_turns(docs).collect()
    }
    assert t[(0, 0)] == C.GREETING
    assert t[(26, 0)] == C.GREETING
    assert t[(1, 0)] == "one short doc"
    # non-greeting turns carry the real window text
    assert t[(0, 1)].split(" ") == ["alpha"] * C.TURN_WORDS


def test_turn_concat_rebuilds_text_for_non_greeting(docs):
    """Joining a conversation's turns with single spaces must rebuild
    the original text exactly (the fan-out loses nothing) — for
    conversations without the greeting substitution."""
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    t = C.conversation_turns(docs).orderBy("conv_id", "turn_no")
    joined = (
        t.groupBy("conv_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("turn_no", "turn_text")
                        )
                    ),
                    lambda s: s["turn_text"],
                ),
            ).alias("rebuilt")
        )
        .collect()
    )
    for r in joined:
        if r["conv_id"] % 13 != 0:
            assert r["rebuilt"] == orig[r["conv_id"]], r["conv_id"]


def test_template_accounting_matches_actual_render(docs):
    """rendered_chars is computed over the ACTUALLY rendered string;
    cross-check the closed form by hand for the single-turn doc."""
    out = {
        r["conv_id"]: r["rendered_chars"]
        for r in C.chat_template_render(docs).collect()
    }
    body = "one short doc"
    want = (
        len(C._HDR_SYS)
        + len(C.SYSTEM_PROMPT)
        + len(C._HDR_USER)
        + len(body)
    )
    assert out[1] == want


def test_dedup_finds_greeting_group(docs):
    groups = C.conv_turn_dedup(docs).collect()
    greet = [g for g in groups if g["n_convs"] == 2]
    assert len(greet) == 1
    assert greet[0]["turn_len"] == len(C.GREETING)
    assert greet[0]["first_conv"] == 0


def test_mask_budget_balances(docs):
    r = C.sft_mask_stats(docs).collect()[0]
    assert r["n_convs"] == 5
    assert r["n_turns"] == 2 + 1 + 3 + 2 + 1
    assert 0.0 < r["trainable_ratio"] < 1.0
    # per-conv partials merge to the same corpus totals
    parts = C.sft_mask_partials(docs)
    merged = C.sft_mask_from_partials(parts).collect()[0]
    assert merged == r


def test_streaming_partials_split_invariance(docs):
    """Any regrouping of docs into batches re-merges identically."""
    a = C.sft_mask_from_partials(
        C.sft_mask_partials(docs.filter("doc_id < 2")).unionByName(
            C.sft_mask_partials(docs.filter("doc_id >= 2"))
        )
    ).collect()
    b = C.sft_mask_from_partials(C.sft_mask_partials(docs)).collect()
    assert a == b


def test_no_python_in_turn_fanout_plan(docs):
    """The fan-out is pure Catalyst: no BatchEvalPython / ArrowEval /
    mapInPandas in the plan."""
    plan = C.conv_turn_stats(docs)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas"):
        assert marker not in plan

"""Rotation-window staging arithmetic (VERDICT r10 ask 8, rotated r13,
rotated again r14).

The driver's correctness window runs the first 50 entries of
``queries()``; the cohort lists in ``__spark_entry__`` are the
rotation's source of truth.  These pins make a drifted comment or a
mis-sized cohort fail loudly instead of silently mis-driving a round's
rotation (the r9/r10 ADVICE class: staging comments said 37+13 while
the list held 39+11).
"""

import importlib

import pytest

E = importlib.import_module("__spark_entry__")


def test_window_is_exactly_fifty():
    assert len(E._WINDOW_R14) == 50
    assert len(E._WINDOW_R13) == 50  # historical (CORRECTNESS_r13)


def test_cohort_arithmetic():
    # r14 window = the whole staged r14 head: the 30 remaining r10
    # entries (oldest driver signal left, last green r11) + the first
    # 20 of the 23-entry r13 cohort (zero signal since birth).  The 3
    # remaining r13-cohort entries stage as the r15 head; round 14
    # added no registry entries (optimization round).
    assert len(E._COHORT_NEW_R10) == 39
    assert len(E._COHORT_R5_GREEN) == 37
    assert len(E._COHORT_NEW_R11) == 30
    assert len(E._COHORT_NEW_R12) == 35
    assert len(E._COHORT_NEW_R13) == 23
    assert E._STAGED_R14 == E._COHORT_NEW_R10[9:] + E._COHORT_NEW_R13
    assert E._WINDOW_R14 == E._STAGED_R14[:50]
    assert E._STAGED_R15 == E._STAGED_R14[50:]
    assert len(E._STAGED_R15) == 3
    # historical windows stay frozen (CORRECTNESS_r12/r13 recorded them)
    assert E._WINDOW_R13 == E._STAGED_R13 + E._COHORT_NEW_R10[:9]
    assert E._STAGED_R13 == E._COHORT_NEW_R11[24:] + E._COHORT_NEW_R12
    assert E._WINDOW_R12 == E._COHORT_R5_GREEN[11:] + E._COHORT_NEW_R11[:24]
    assert len(E._WINDOW_R12) == 50


def test_staging_comment_matches_lists():
    """The r9/r10/r11 ADVICE class, closed mechanically: regex-parse the
    numbers quoted in the r14 staging comment and compare them to the
    actual cohort arithmetic, so a late-round cohort addition that skips
    the comment fails here instead of mis-driving the next rotation."""
    import re

    src = open(E.__file__).read()
    m = re.search(
        r"the (\d+) remaining r10 entries.*?plus the first (\d+) of "
        r"_COHORT_NEW_R13.*?(\d+) \+ (\d+) = 50 fills the r14 window "
        r"exactly; the\s*#\s+(\d+) remaining",
        src,
        re.S,
    )
    assert m, "r14 staging comment not found or reworded — keep it parseable"
    n10, n13, a, b, rest = map(int, m.groups())
    assert n10 == a == len(E._COHORT_NEW_R10) - 9
    assert n13 == b
    assert a + b == 50
    assert rest == len(E._COHORT_NEW_R13) - n13 == len(E._STAGED_R15)


def test_no_duplicates_across_cohorts():
    all_names = (
        E._COHORT_NEW_R10
        + E._COHORT_R5_GREEN
        + E._COHORT_NEW_R11
        + E._COHORT_NEW_R12
        + E._COHORT_NEW_R13
    )
    assert len(all_names) == len(set(all_names))


def test_every_staged_name_is_a_registry_entry():
    reg = E.queries()
    order = E._WINDOW_R14 + E._STAGED_R15
    missing = [k for k in order if k not in reg]
    assert not missing, f"staged names unknown to the registry: {missing}"


def test_registry_head_is_the_window():
    reg = E.queries()
    head = list(reg)[:50]
    assert head == E._WINDOW_R14
    # and the staged r15 cohort sits immediately past the boundary
    nxt = list(reg)[50 : 50 + len(E._STAGED_R15)]
    assert nxt == E._STAGED_R15


def test_window_entries_have_oracles_or_documented_exemption():
    """Every windowed entry should be oracle-paired (the driver records a
    weaker rows-only check otherwise).  Streaming twins share their batch
    oracle; a missing oracle here is a staging mistake."""
    oracles = E.oracle_sql()
    missing = [k for k in E._WINDOW_R14 if k not in oracles]
    assert not missing, f"windowed entries without oracle SQL: {missing}"

"""Rotation-window staging arithmetic (VERDICT r10 ask 8, rotated r13).

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
    assert len(E._WINDOW_R13) == 50


def test_cohort_arithmetic():
    # r13 window = the 41 staged entries (6 remaining new-in-r11 + all
    # 35 new-in-r12, zero driver signal) + the first 9 of the 39-entry
    # r10 cohort as fillers (oldest signal left: last green r11); the
    # 30 remaining r10 entries stage as the r14 head, followed by
    # anything added this round (_COHORT_NEW_R13).
    assert len(E._COHORT_NEW_R10) == 39
    assert len(E._COHORT_R5_GREEN) == 37
    assert len(E._COHORT_NEW_R11) == 30
    assert len(E._COHORT_NEW_R12) == 35
    assert E._STAGED_R13 == E._COHORT_NEW_R11[24:] + E._COHORT_NEW_R12
    assert len(E._STAGED_R13) == 41
    assert E._WINDOW_R13 == E._STAGED_R13 + E._COHORT_NEW_R10[:9]
    assert E._STAGED_R14 == E._COHORT_NEW_R10[9:] + E._COHORT_NEW_R13
    assert len(E._COHORT_NEW_R10[9:]) == 30
    # historical windows stay frozen (CORRECTNESS_r11/r12 recorded them)
    assert E._WINDOW_R12 == E._COHORT_R5_GREEN[11:] + E._COHORT_NEW_R11[:24]
    assert len(E._WINDOW_R12) == 50


def test_staging_comment_matches_lists():
    """The r9/r10/r11 ADVICE class, closed mechanically: regex-parse the
    numbers quoted in the staging comment and compare them to the actual
    cohort arithmetic, so a late-round cohort addition that skips the
    comment fails here instead of mis-driving the next rotation."""
    import re

    src = open(E.__file__).read()
    m = re.search(
        r"(\d+) remaining of _COHORT_NEW_R11 plus all\s*#\s+(\d+) of "
        r"_COHORT_NEW_R12.*?first\s*#\s+(\d+) of _COHORT_NEW_R10 as "
        r"fillers.*?(\d+) \+ (\d+) = 50 fills\s*#\s+the r13 window "
        r"exactly; the (\d+) remaining",
        src,
        re.S,
    )
    assert m, "staging comment not found or reworded — keep it parseable"
    rem11, n12, fill, a, b, rest = map(int, m.groups())
    assert rem11 == len(E._COHORT_NEW_R11) - 24
    assert n12 == len(E._COHORT_NEW_R12)
    assert a == rem11 + n12 == len(E._STAGED_R13)
    assert b == fill
    assert a + b == 50
    assert rest == len(E._COHORT_NEW_R10) - fill


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
    order = E._WINDOW_R13 + E._STAGED_R14
    missing = [k for k in order if k not in reg]
    assert not missing, f"staged names unknown to the registry: {missing}"


def test_registry_head_is_the_window():
    reg = E.queries()
    head = list(reg)[:50]
    assert head == E._WINDOW_R13
    # and the staged r14 cohort sits immediately past the boundary
    nxt = list(reg)[50 : 50 + len(E._STAGED_R14)]
    assert nxt == E._STAGED_R14


def test_window_entries_have_oracles_or_documented_exemption():
    """Every windowed entry should be oracle-paired (the driver records a
    weaker rows-only check otherwise).  Streaming twins share their batch
    oracle; a missing oracle here is a staging mistake."""
    oracles = E.oracle_sql()
    missing = [k for k in E._WINDOW_R13 if k not in oracles]
    assert not missing, f"windowed entries without oracle SQL: {missing}"

"""Rotation-window staging arithmetic (VERDICT r10 ask 8, rotated r12).

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
    assert len(E._WINDOW_R12) == 50


def test_cohort_arithmetic():
    # r12 window = the remaining 26 of the 37-entry r5-green cohort
    # (first 11 harvested in the r11 window, CORRECTNESS_r11.json all
    # green) + the first 24 of the 30 new-in-r11 zero-signal entries;
    # the 6 remaining new-in-r11 entries stage as the r13 head,
    # followed by anything added this round (_COHORT_NEW_R12).
    assert len(E._COHORT_NEW_R10) == 39
    assert len(E._COHORT_R5_GREEN) == 37
    assert len(E._COHORT_NEW_R11) == 30
    assert E._WINDOW_R12 == E._COHORT_R5_GREEN[11:] + E._COHORT_NEW_R11[:24]
    assert E._STAGED_R13 == E._COHORT_NEW_R11[24:] + E._COHORT_NEW_R12
    assert len(E._COHORT_R5_GREEN[11:]) == 26
    assert len(E._COHORT_NEW_R11[24:]) == 6


def test_staging_comment_matches_lists():
    """The r9/r10/r11 ADVICE class, closed mechanically: regex-parse the
    numbers quoted in the staging comment and compare them to the actual
    cohort arithmetic, so a late-round cohort addition that skips the
    comment fails here instead of mis-driving the next rotation."""
    import re

    src = open(E.__file__).read()
    m = re.search(
        r"first\s*#\s+(\d+) of _COHORT_NEW_R11 \(the (\d+) entries added "
        r"in round\s*#\s+11, zero driver signal\)\.\s+(\d+) \+ (\d+) = 50 "
        r"fills the r12\s*#\s+window exactly; the (\d+) remaining",
        src,
        re.S,
    )
    assert m, "staging comment not found or reworded — keep it parseable"
    take, n_new, a, b, rest = map(int, m.groups())
    assert n_new == len(E._COHORT_NEW_R11)
    assert a == len(E._COHORT_R5_GREEN) - 11
    assert b == take
    assert a + b == 50
    assert rest == n_new - take


def test_no_duplicates_across_cohorts():
    all_names = (
        E._COHORT_NEW_R10
        + E._COHORT_R5_GREEN
        + E._COHORT_NEW_R11
        + E._COHORT_NEW_R12
    )
    assert len(all_names) == len(set(all_names))


def test_every_staged_name_is_a_registry_entry():
    reg = E.queries()
    order = E._WINDOW_R12 + E._STAGED_R13
    missing = [k for k in order if k not in reg]
    assert not missing, f"staged names unknown to the registry: {missing}"


def test_registry_head_is_the_window():
    reg = E.queries()
    head = list(reg)[:50]
    assert head == E._WINDOW_R12
    # and the staged r13 cohort sits immediately past the boundary
    nxt = list(reg)[50 : 50 + len(E._STAGED_R13)]
    assert nxt == E._STAGED_R13


def test_window_entries_have_oracles_or_documented_exemption():
    """Every windowed entry should be oracle-paired (the driver records a
    weaker rows-only check otherwise).  Streaming twins share their batch
    oracle; a missing oracle here is a staging mistake."""
    oracles = E.oracle_sql()
    missing = [k for k in E._WINDOW_R12 if k not in oracles]
    assert not missing, f"windowed entries without oracle SQL: {missing}"

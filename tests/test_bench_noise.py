"""Noise self-adjudication in bench.py (VERDICT r11 ask 2).

The r11 driver artifact was captured in a degraded VM phase — canaries
2.6-14x their quiet pins, rouge2_eval 22x steady state — and was
indistinguishable from a real regression without judge-side re-runs.
These tests pin the adjudicator: a synthetic stall inflates a query's
sweep reading, the suspect finder flags it, and the re-measure loop
(gated on quiet canaries) reverts it; a reading that stays slow under
proven-quiet canaries is kept as a confirmed regression instead.

No Spark session: the adjudicator takes measure/canary callables, so
the stall is injected as pure functions.
"""

import importlib
import sys

sys.path.insert(0, "/root/repo")

bench = importlib.import_module("bench")


PINS = {"fast_q": 0.4, "slow_q": 2.0, "ok_q": 1.0}


def test_find_suspects_ratio_and_floor():
    timings = {
        "fast_q": 0.9,   # 2.25x pin but only +0.5 — under both gates
        "slow_q": 9.0,   # 4.5x pin and +7.0 — suspect
        "ok_q": 1.1,     # steady
        "unpinned_q": 50.0,  # no pin -> never flagged
    }
    assert bench.find_suspects(timings, PINS) == ["slow_q"]


def test_find_suspects_floor_protects_subsecond_queries():
    # 0.1 s pin jittering to 0.35 s is 3.5x but +0.25 s — scheduler
    # jitter, not a stall; must not flag
    assert bench.find_suspects({"tiny": 0.35}, {"tiny": 0.1}) == []
    # but a genuine blowup past both gates flags
    assert bench.find_suspects({"tiny": 1.2}, {"tiny": 0.1}) == ["tiny"]


def test_canaries_quiet_median_rule():
    pins = {"a": 1.0, "b": 1.0, "c": 1.0}
    assert bench.canaries_quiet({"a": 1.0, "b": 1.2, "c": 9.0}, pins)
    assert not bench.canaries_quiet({"a": 1.0, "b": 3.0, "c": 9.0}, pins)
    assert bench.canaries_quiet({}, pins)  # vacuous


def test_synthetic_stall_flagged_then_reverted():
    """The r11 scenario end-to-end: the sweep reading was taken during
    a stall (22x), the canaries later read quiet, and the re-measure
    reverts the artifact value."""
    timings = {"slow_q": 44.0, "ok_q": 1.0}
    suspects = bench.find_suspects(timings, PINS)
    assert suspects == ["slow_q"]

    canary_seq = iter(
        [
            # first gate: still hot (median 5x) -> sleep + retry
            {"minhash_signatures": 4.5, "pack_sequences": 1.55,
             "cosine_topk": 2.05},
            # second gate: quiet
            {"minhash_signatures": 0.95, "pack_sequences": 0.33,
             "cosine_topk": 0.44},
        ]
    )
    slept = []
    remeasured, unresolved = bench.adjudicate_suspects(
        timings,
        PINS,
        suspects,
        measure=lambda n: 1.9,  # quiet re-measure: back under pin
        canary_sample=lambda: next(canary_seq),
        sleep=slept.append,
    )
    assert slept == [20]
    assert remeasured == {"slow_q": 1.9}
    assert unresolved == []
    assert timings["slow_q"] == 1.9  # artifact value reverted


def test_confirmed_regression_stays_flagged():
    """A reading that reproduces under quiet canaries is NOT noise —
    it stays unresolved (the artifact reports regression-confirmed)."""
    timings = {"slow_q": 44.0}
    remeasured, unresolved = bench.adjudicate_suspects(
        timings,
        PINS,
        ["slow_q"],
        measure=lambda n: 42.0,  # still 21x under a quiet VM
        canary_sample=lambda: {
            "minhash_signatures": 0.9,
            "pack_sequences": 0.3,
            "cosine_topk": 0.4,
        },
        sleep=lambda s: None,
    )
    assert remeasured == {"slow_q": 42.0}
    assert unresolved == ["slow_q"]
    assert timings["slow_q"] == 42.0


def test_never_quiet_vm_leaves_suspects_unadjudicated():
    timings = {"slow_q": 44.0}
    hot = {"minhash_signatures": 9.0, "pack_sequences": 3.0,
           "cosine_topk": 4.0}
    slept = []
    remeasured, unresolved = bench.adjudicate_suspects(
        timings,
        PINS,
        ["slow_q"],
        measure=lambda n: (_ for _ in ()).throw(AssertionError("no gate")),
        canary_sample=lambda: dict(hot),
        sleep=slept.append,
    )
    assert remeasured == {} and unresolved == ["slow_q"]
    assert slept == [20, 20, 20]  # one per attempt, never gated through


def test_canary_pins_cover_canaries():
    assert set(bench.CANARY_PINS) == set(bench.CANARIES)
    assert all(v > 0 for v in bench.CANARY_PINS.values())


def test_subsecond_pin_gets_tighter_ratio_gate():
    """VERDICT r12 ask 6: customer_order_stats read 2.39x its 0.791 s
    pin and escaped the 2.5x gate.  Sub-second pins now gate at 2.0x
    (the absolute floor still applies), multi-second pins keep 2.5x."""
    # the exact r12 escape shape: 1.891 vs pin 0.791 -> now flagged
    assert bench.find_suspects(
        {"customer_order_stats": 1.891}, {"customer_order_stats": 0.791}
    ) == ["customer_order_stats"]
    # same 2.39x ratio on a multi-second pin: NOT flagged (2.5x gate)
    assert bench.find_suspects({"big": 4.78}, {"big": 2.0}) == []
    # sub-second pin under the floor still protected (2.25x but +0.45)
    assert bench.find_suspects({"tiny2": 0.85}, {"tiny2": 0.4}) == []


def test_newborn_pins_would_cover_headline():
    """VERDICT r12 ask 5 invariant: after any sweep, BENCH_PINS keys
    must cover HEADLINE — verify the auto-append arithmetic: newborn
    pins are the measured values normalized by the end-phase median
    canary ratio, never scaled UP."""
    pins = {"old_q": 1.0}
    timings = {"old_q": 1.0, "new_q": 4.0}
    newborn = [n for n in ["old_q", "new_q"] if n not in pins]
    assert newborn == ["new_q"]
    # warm capture (median ratio 2.0): pin normalized down
    r = sorted({"a": 2.0, "b": 2.0, "c": 1.0}.values())
    scale = max(1.0, r[len(r) // 2])
    assert round(timings["new_q"] / scale, 3) == 2.0
    # quiet capture (ratios < 1): never scale a pin UP
    r = sorted({"a": 0.8, "b": 0.9, "c": 1.0}.values())
    scale = max(1.0, r[len(r) // 2])
    assert scale == 1.0

"""Benched-or-excused coverage (VERDICT r12 ask 2, made structural).

The r12 perf defect (MIME/mbox at 19-30 s) hid in registry entries
with NO bench signal: not in HEADLINE, no BENCH_PINS key.  These pins
make that state unshippable — every non-streaming registry entry must
hold a HEADLINE slot or an EXCLUDED reason, and the two sets must not
drift (stale names, double-listing).
"""

import importlib

E = importlib.import_module("__spark_entry__")
bench = importlib.import_module("bench")


def test_every_registry_entry_benched_or_excused():
    gaps = bench.coverage_gaps(E.queries())
    assert gaps == [], (
        f"registry entries with no bench signal and no exclusion "
        f"reason: {gaps}"
    )


def test_excluded_names_are_real_and_not_double_listed():
    reg = set(E.queries())
    stale = sorted(set(bench.EXCLUDED) - reg)
    assert stale == [], f"EXCLUDED names not in the registry: {stale}"
    both = sorted(set(bench.EXCLUDED) & set(bench.HEADLINE))
    assert both == [], f"names both benched and excluded: {both}"
    assert all(
        isinstance(r, str) and r.strip() for r in bench.EXCLUDED.values()
    )


def test_headline_names_are_registry_entries():
    reg = set(E.queries())
    missing = sorted(set(bench.HEADLINE) - reg)
    assert missing == [], f"HEADLINE names not in the registry: {missing}"


def test_r12_ingest_family_is_benched():
    """The specific r12 gap (VERDICT ask 2): these six plus a streaming
    sample must stay in HEADLINE."""
    for n in [
        "srt_text_stats",
        "vtt_text_stats",
        "mime_text_stats",
        "mbox_text_stats",
        "arrow_ipc_stats",
        "doc_format_matrix",
        "streaming_mime_text",
    ]:
        assert n in bench.HEADLINE, n

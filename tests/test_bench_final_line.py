"""The r14 final-stdout-line contract (VERDICT r13 ask 2): the driver's
~2 KB tail capture must receive a PARSEABLE final line that carries a
per-query map — PERF_r13 had ``per_query: {}`` because the map lived
only on the (tail-truncated) detail line.  These pins keep the compact
line inside the capture window and keep its required fields present.
"""

import json

import bench


def _fields(**over):
    f = {
        "metric": "headline_queries_total_wall",
        "value": 200.0,
        "unit": "sec",
        "sf": 0.1,
        "queryset": "r13",
        "n_queries": 194,
        "max_query_sec": 3.9,
        "max_query": "streaming_mime_text",
        "canaries": {"minhash_signatures": 1.0, "pack_sequences": 0.3,
                     "cosine_topk": 0.4},
        "canary_phase_ratios": {
            p: {"minhash_signatures": 1.1, "pack_sequences": 1.0,
                "cosine_topk": 1.2} for p in ("start", "mid", "end")},
        "noise_suspect": [],
        "noise_verdict": "quiet",
        "core_total_sec": 45.0,
        "core_queryset": "core50_v1",
        "detail": "full per-query map on the previous stdout line",
    }
    f.update(over)
    return f


def _timings(n):
    # realistic name lengths (headline names average ~18 chars)
    return {
        f"some_operator_name_{i:03d}": round(0.3 + (i % 40) / 10, 3)
        for i in range(n)
    }


def test_final_line_fits_budget_at_headline_scale():
    line = bench.compact_final_line(_fields(), _timings(len(bench.HEADLINE)))
    assert len(line) <= bench.FINAL_LINE_BUDGET
    doc = json.loads(line)
    assert doc["queries"], "per-query map must be present"
    assert doc["queries_is_top_n"] == len(doc["queries"])
    assert doc["queries_rest_n"] == len(bench.HEADLINE) - doc["queries_is_top_n"]


def test_final_line_top_n_is_slowest_first_superset():
    timings = _timings(194)
    timings["the_hog"] = 99.9
    doc = json.loads(bench.compact_final_line(_fields(), timings))
    assert "the_hog" in doc["queries"]
    # rest_sec accounts for everything not in the map (2-dp tolerance)
    total = sum(timings.values())
    mapped = sum(
        timings[q] for q in doc["queries"]
    )
    assert abs((total - mapped) - doc["queries_rest_sec"]) < 0.5


def test_final_line_small_headline_ships_full_map():
    t = {"a": 1.0, "b": 2.0}
    doc = json.loads(bench.compact_final_line(_fields(), t))
    assert doc["queries"] == t


def test_final_line_keeps_r13_fields():
    """Additions-only: every field the r13 final line carried must
    still be present (the driver and judge parse them)."""
    doc = json.loads(bench.compact_final_line(_fields(), _timings(194)))
    for key in (
        "metric", "value", "unit", "sf", "queryset", "n_queries",
        "max_query_sec", "max_query", "canaries", "canary_phase_ratios",
        "noise_suspect", "noise_verdict", "core_total_sec",
        "core_queryset", "detail",
    ):
        assert key in doc, key


def test_scaling_query_set_is_registry_resident():
    """Scaling probes must be real registry entries; most are headline,
    plus link_prediction_eval (registry-only by design — the excused
    heavyweight is exactly the best scaling witness)."""
    import __spark_entry__ as E

    reg = set(E.queries())
    assert set(bench.SCALING_QUERIES) <= reg
    assert set(bench.SCALING_QUERIES) - set(bench.HEADLINE) <= {
        "link_prediction_eval"
    }

"""Pin the driver-window invariants: the correctness driver verifies the
first 50 registered queries only, so the registry head must stay curated
(VERDICT r1 item 1) — every window name oracled, no duplicates, and the
window actually at the head of both dicts.
"""

from __future__ import annotations

from mapreduce_hw05_spark.plans import DRIVER_WINDOW, ORACLES, QUERIES


def test_window_is_registry_prefix():
    assert list(QUERIES)[: len(DRIVER_WINDOW)] == DRIVER_WINDOW
    assert list(ORACLES)[: len(DRIVER_WINDOW)] == DRIVER_WINDOW


def test_window_size_and_uniqueness():
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50


def test_window_fully_oracled():
    """Rows-only contracts in the window would come back err: no_oracle."""
    unoracled = [n for n in DRIVER_WINDOW if n not in ORACLES]
    assert not unoracled, unoracled


def test_window_spans_families():
    """At least one representative per major §2 family group."""
    family_markers = {
        "llm-dedup": ["q_dedup_exact", "q_near_dup_jaccard"],
        "llm-text": ["q_wordcount", "q_tfidf_top_terms"],
        "similarity": ["q_similarity_topk"],
        "udf": ["q_udf_python", "q_udtf_tokens"],
        "graph": ["q_pagerank", "q_triangle_count"],
        "io": ["q_csv_roundtrip", "q_custom_datasource"],
        "streaming": ["q_stream_dedup", "q_stream_upsert_cdc"],
        "subquery": ["q_exists_shiplag"],
        "sketch": ["q_approx_quantile", "q_hll_rollup"],
        "pipeline": ["q_pack_sequences", "q_decontaminate"],
        "tpch": ["q_tpch_q3"],
    }
    window = set(DRIVER_WINDOW)
    missing = {
        fam: names
        for fam, names in family_markers.items()
        if not any(n in window for n in names)
    }
    assert not missing, missing


def test_rotation_plan_covers_all_queries_exactly_once():
    """R2 window + R3/R4 rotation + the r1-green set must cover every
    registered query with no overlaps — the schedule that gets every
    contract a driver-green CORRECTNESS row by round 4."""
    import json

    from mapreduce_hw05_spark.plans import (
        DRIVER_WINDOW_R3,
        DRIVER_WINDOW_R4,
    )

    r1 = set(json.load(open("/root/repo/CORRECTNESS_r01.json")))
    sets = [set(DRIVER_WINDOW) - r1, set(DRIVER_WINDOW_R3), set(DRIVER_WINDOW_R4)]
    union = r1 | sets[0] | sets[1] | sets[2]
    assert union >= set(QUERIES), set(QUERIES) - union
    assert not (sets[1] & (r1 | set(DRIVER_WINDOW)))
    assert not (sets[2] & (r1 | set(DRIVER_WINDOW) | sets[1]))
    assert len(DRIVER_WINDOW_R3) == 50
    assert all(n in ORACLES for n in DRIVER_WINDOW_R3 + DRIVER_WINDOW_R4)

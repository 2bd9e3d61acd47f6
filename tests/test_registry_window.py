"""Pin the driver-window invariants: the correctness driver verifies the
first 50 registered queries only, so the registry head must stay curated
(VERDICT r1 item 1) — every window name oracled, no duplicates, and the
window actually at the head of both dicts.
"""

from __future__ import annotations

import json

from mapreduce_hw05_spark.plans import (
    DRIVER_WINDOW,
    DRIVER_WINDOW_R2,
    DRIVER_WINDOW_R3,
    DRIVER_WINDOW_R4,
    DRIVER_WINDOW_R5_PENDING,
    DRIVER_WINDOW_R5_REVERIFY,
    ORACLES,
    QUERIES,
)


def test_window_is_registry_prefix():
    assert list(QUERIES)[: len(DRIVER_WINDOW)] == DRIVER_WINDOW
    assert list(ORACLES)[: len(DRIVER_WINDOW)] == DRIVER_WINDOW


def test_window_size_and_uniqueness():
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50


def test_window_is_r4_head():
    """VERDICT r3 item 1: the r4 swap is exactly DRIVER_WINDOW_R4[:50]."""
    assert DRIVER_WINDOW == DRIVER_WINDOW_R4[:50]


def test_window_fully_oracled():
    """Rows-only contracts in the window would come back err: no_oracle."""
    unoracled = [n for n in DRIVER_WINDOW if n not in ORACLES]
    assert not unoracled, unoracled


def test_window_spans_families():
    """At least one representative per family the R4 window targets
    (the never-driver-verified remainder: new r3-continuation operators,
    physical-strategy contract machinery, null semantics, text/similarity
    remainder, governance, analytics remainder, subqueries, TPC-H)."""
    family_markers = {
        "heavy-hitters": ["q_heavy_hitters", "q_stream_heavy_hitters"],
        "semantic-dedup": ["q_semantic_dedup"],
        "weighted-sampling": ["q_weighted_sample", "q_stream_weighted_reservoir"],
        "null-semantics": ["q_not_in_null_semantics", "q_null_safe_join"],
        "physical-machinery": ["q_salted_join_contract", "q_bloom_join_contract"],
        "schema-evolution": ["q_schema_evolution", "q_union_by_name"],
        "text-remainder": ["q_simhash", "q_token_entropy", "q_lm_score"],
        "dedup-clusters": ["q_dedup_clusters", "q_decontaminate_ngram"],
        "governance": ["q_pseudonymize_users", "q_sample_hash"],
        "analytics-remainder": ["q_rfm_segments", "q_skyline_pareto"],
        "subqueries": ["q_having_in_big_orders", "q_max_price_in_brand"],
        "tpch-remainder": ["q_tpch_q14", "q_tpch_q19", "q_tpch_q18"],
    }
    window = set(DRIVER_WINDOW)
    missing = {
        fam: names
        for fam, names in family_markers.items()
        if not any(n in window for n in names)
    }
    assert not missing, missing


def test_frozen_windows_match_driver_records():
    """The frozen R2/R3 lists must equal what the driver actually
    verified those rounds (CORRECTNESS_r0N.json key sets)."""
    r2 = set(json.load(open("/root/repo/CORRECTNESS_r02.json")))
    r3 = set(json.load(open("/root/repo/CORRECTNESS_r03.json")))
    assert r2 == set(DRIVER_WINDOW_R2)
    assert r3 == set(DRIVER_WINDOW_R3)


def test_rotation_plan_covers_all_queries_exactly_once():
    """r1-green set + frozen r2/r3 windows + this round's window + the
    pre-staged r5 pending list must cover every registered query with no
    overlaps — the schedule that gets every contract a driver-green
    CORRECTNESS row. New contracts added this round MUST be appended to
    DRIVER_WINDOW_R5_PENDING (that is what keeps this test green)."""
    r1 = set(json.load(open("/root/repo/CORRECTNESS_r01.json")))
    r2 = set(DRIVER_WINDOW_R2)
    r3 = set(DRIVER_WINDOW_R3)
    verified = r1 | r2 | r3
    window = set(DRIVER_WINDOW)
    pending = set(DRIVER_WINDOW_R5_PENDING)
    union = verified | window | pending
    assert union >= set(QUERIES), set(QUERIES) - union
    assert not (window & verified)
    assert not (pending & (verified | window))
    assert all(n in ORACLES for n in DRIVER_WINDOW_R4)


def test_r5_prestage_is_valid():
    """VERDICT r3 item 4: the r5 window is pre-staged — pending tail +
    r1-core re-verifications, currently summing to exactly one window."""
    r1 = set(json.load(open("/root/repo/CORRECTNESS_r01.json")))
    reverify = list(DRIVER_WINDOW_R5_REVERIFY)
    assert len(set(reverify)) == len(reverify)
    # every re-verification target was r1-green and is still registered+oracled
    assert set(reverify) <= r1
    assert all(n in ORACLES for n in reverify)
    combined = list(DRIVER_WINDOW_R5_PENDING) + reverify
    assert len(set(combined)) == len(combined)
    assert len(combined) >= 50

"""Pin the driver-window invariants: the correctness driver verifies the
first 50 registered queries only, so the registry head must stay curated
(VERDICT r1 item 1) — every window name oracled, no duplicates, and the
window actually at the head of both dicts. Frozen windows R2–R4 are pinned
against the driver's own CORRECTNESS records so history can't drift.
"""

from __future__ import annotations

import json

from mapreduce_hw05_spark.plans import (
    DRIVER_WINDOW,
    DRIVER_WINDOW_R2,
    DRIVER_WINDOW_R3,
    DRIVER_WINDOW_R4,
    DRIVER_WINDOW_R5,
    DRIVER_WINDOW_R6_PENDING,
    DRIVER_WINDOW_R7_REVERIFY,
    ORACLES,
    QUERIES,
)


def test_window_is_registry_prefix():
    assert list(QUERIES)[: len(DRIVER_WINDOW)] == DRIVER_WINDOW
    assert list(ORACLES)[: len(DRIVER_WINDOW)] == DRIVER_WINDOW


def test_window_size_and_uniqueness():
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50


def test_window_is_r5():
    """VERDICT r4 item 1: the r5 swap is exactly the pre-staged risk-first
    head of the r4 pending list."""
    assert DRIVER_WINDOW == DRIVER_WINDOW_R5


def test_window_fully_oracled():
    """Rows-only contracts in the window would come back err: no_oracle."""
    unoracled = [n for n in DRIVER_WINDOW if n not in ORACLES]
    assert not unoracled, unoracled


def test_window_spans_families():
    """At least one representative per family the R5 window targets
    (never-driver-verified ENGINE machinery: streaming-executed sinks,
    multimodal kernels, graph iteration, ML/eval, delicate stats)."""
    family_markers = {
        "streaming-executed": ["q_stream_near_dup_filter", "q_stream_ewma"],
        "streaming-sketch": ["q_stream_count_min", "q_stream_moments"],
        "multimodal": ["q_frame_sample", "q_resize_images", "q_audio_vad"],
        "graph-iterative": ["q_label_propagation", "q_sssp_cheapest"],
        "graph-metrics": ["q_kcore_rounds", "q_clustering_coefficient"],
        "ml-train": ["q_nb_classify", "q_decision_stump", "q_tree_depth2"],
        "ml-eval": ["q_nb_auc", "q_ranking_eval", "q_kfold_nb_accuracy"],
        "recsys": ["q_item_item_cosine", "q_als_user_step"],
        "timeseries-stats": ["q_ewma_hourly", "q_holt_linear", "q_acf_lags"],
        "hypothesis-tests": ["q_ab_test_stats", "q_ks_test", "q_chi_square"],
        "changepoint": ["q_cusum_changepoint", "q_anomaly_hours"],
    }
    window = set(DRIVER_WINDOW)
    missing = {
        fam: names
        for fam, names in family_markers.items()
        if not any(n in window for n in names)
    }
    assert not missing, missing


def test_frozen_windows_match_driver_records():
    """The frozen R2/R3/R4 lists must equal what the driver actually
    verified those rounds (CORRECTNESS_r0N.json key sets). R4's record is
    the ordered head of the 58-entry rotation list (VERDICT r4 item 1:
    freeze DRIVER_WINDOW_R4 using CORRECTNESS_r04.json)."""
    r2 = set(json.load(open("/root/repo/CORRECTNESS_r02.json")))
    r3 = set(json.load(open("/root/repo/CORRECTNESS_r03.json")))
    r4 = json.load(open("/root/repo/CORRECTNESS_r04.json"))
    assert r2 == set(DRIVER_WINDOW_R2)
    assert r3 == set(DRIVER_WINDOW_R3)
    assert list(r4) == DRIVER_WINDOW_R4[:50]
    for row in r4.values():
        assert row["rows_match"] and row["schema_match"] and row["hash_match"]


def test_rotation_plan_covers_all_queries_exactly_once():
    """r1-green set + frozen r2/r3/r4 windows + this round's window + the
    r6 pending list must cover every registered query with no overlaps —
    the schedule that gets every contract a driver-green CORRECTNESS row.
    New contracts added this round MUST be appended to
    DRIVER_WINDOW_R6_PENDING (that is what keeps this test green)."""
    r1 = set(json.load(open("/root/repo/CORRECTNESS_r01.json")))
    verified = (
        r1
        | set(DRIVER_WINDOW_R2)
        | set(DRIVER_WINDOW_R3)
        | set(DRIVER_WINDOW_R4[:50])
    )
    window = set(DRIVER_WINDOW)
    pending = set(DRIVER_WINDOW_R6_PENDING)
    union = verified | window | pending
    assert union >= set(QUERIES), set(QUERIES) - union
    assert not (window & verified)
    assert not (pending & (verified | window))
    assert all(n in ORACLES for n in DRIVER_WINDOW_R5)


def test_pending_debt_capped():
    """VERDICT r4 item 2: stop verification-debt growth. The r6 pending
    list starts this round at 64; additions must keep it ≤ 70."""
    assert len(DRIVER_WINDOW_R6_PENDING) <= 70, (
        "verification debt exceeds the r5 cap — remove or defer new "
        "contracts (VERDICT r4 item 2)"
    )


def test_r6_r7_prestage_is_valid():
    """VERDICT r4 item 5: the r6/r7 rotation is pre-staged — pending tail
    then the r1-core re-verification set, all still registered + oracled."""
    r1 = set(json.load(open("/root/repo/CORRECTNESS_r01.json")))
    reverify = list(DRIVER_WINDOW_R7_REVERIFY)
    assert len(set(reverify)) == len(reverify)
    # every re-verification target was r1-green and is still registered+oracled
    assert set(reverify) <= r1
    assert all(n in ORACLES for n in reverify)
    combined = list(DRIVER_WINDOW_R6_PENDING) + reverify
    assert len(set(combined)) == len(combined)
    assert len(combined) >= 50

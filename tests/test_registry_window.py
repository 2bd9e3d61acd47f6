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
    """At least one representative per §2 family the R3 window targets
    (the never-driver-verified half: streaming matrix, connectors, ANN,
    BPE/ML, sketches, maintenance, TPC-H remainder, governance)."""
    family_markers = {
        "stream-stream": ["q_stream_stream_join", "q_stream_stream_full"],
        "stream-late-data (st-4)": ["q_stream_late_data"],
        "stream-sinks": ["q_stream_file_sink", "q_stream_compacted_sink"],
        "connectors": ["q_json_roundtrip", "q_orc_roundtrip"],
        "lsh-ann": ["q_near_dup_lsh", "q_ann_ivf_topk"],
        "ml": ["q_logreg_train", "q_bpe_merges"],
        "sketch": ["q_kll_rollup", "q_theta_sketch_ops"],
        "pipeline": ["q_pretrain_pipeline"],
        "maintenance": ["q_compact_small_files", "q_zorder_rewrite"],
        "tpch": ["q_tpch_q5", "q_tpch_q6"],
        "analytics": ["q_funnel_steps"],
        "governance": ["q_redact_pii"],
        "timeseries": ["q_gapfill_hourly"],
    }
    window = set(DRIVER_WINDOW)
    missing = {
        fam: names
        for fam, names in family_markers.items()
        if not any(n in window for n in names)
    }
    assert not missing, missing


def test_rotation_plan_covers_all_queries_exactly_once():
    """r1-green set + frozen r2 window + this round's window + R4 must
    cover every registered query with no overlaps — the schedule that
    gets every contract a driver-green CORRECTNESS row by round 4."""
    import json

    from mapreduce_hw05_spark.plans import (
        DRIVER_WINDOW_R2,
        DRIVER_WINDOW_R4,
    )

    r1 = set(json.load(open("/root/repo/CORRECTNESS_r01.json")))
    r2 = set(json.load(open("/root/repo/CORRECTNESS_r02.json")))
    assert r2 == set(DRIVER_WINDOW_R2)  # frozen record matches the driver's
    sets = [r2 - r1, set(DRIVER_WINDOW), set(DRIVER_WINDOW_R4)]
    union = r1 | sets[0] | sets[1] | sets[2]
    assert union >= set(QUERIES), set(QUERIES) - union
    assert not (sets[1] & (r1 | r2))
    assert not (sets[2] & (r1 | r2 | sets[1]))
    assert all(n in ORACLES for n in DRIVER_WINDOW + DRIVER_WINDOW_R4)

"""Pin the driver-window invariants: the correctness driver verifies the
first 50 registered queries only, so the registry head must stay curated
(VERDICT r1 item 1) — every window name oracled, no duplicates, and the
window actually at the head of both dicts. Frozen windows R2–R8 are pinned
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
    DRIVER_WINDOW_R6,
    DRIVER_WINDOW_R7,
    DRIVER_WINDOW_R8,
    DRIVER_WINDOW_R9,
    DRIVER_WINDOW_R9_CHURN,
    DRIVER_WINDOW_R9_PENDING,
    DRIVER_WINDOW_R9_REVERIFY,
    DRIVER_WINDOW_R10_CHURN,
    DRIVER_WINDOW_R10_PENDING,
    DRIVER_WINDOW_R10_REVERIFY,
    ORACLES,
    QUERIES,
)


def test_window_is_registry_prefix():
    assert list(QUERIES)[: len(DRIVER_WINDOW)] == DRIVER_WINDOW
    assert list(ORACLES)[: len(DRIVER_WINDOW)] == DRIVER_WINDOW


def test_window_size_and_uniqueness():
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50


def test_window_is_r9():
    """VERDICT r8 item 1: the r9 swap is the pre-staged composition —
    the one never-driver-verified contract (q_global_rank), then the
    five r8 ranks-rewrite churn entries, then the head of the 60-entry
    R9_REVERIFY tranche."""
    assert DRIVER_WINDOW == DRIVER_WINDOW_R9
    assert DRIVER_WINDOW_R9 == (
        list(DRIVER_WINDOW_R9_PENDING)
        + list(DRIVER_WINDOW_R9_CHURN)
        + list(DRIVER_WINDOW_R9_REVERIFY[:44])
    )
    assert DRIVER_WINDOW[0] == "q_global_rank"


def test_window_fully_oracled():
    """Rows-only contracts in the window would come back err: no_oracle."""
    unoracled = [n for n in DRIVER_WINDOW if n not in ORACLES]
    assert not unoracled, unoracled


def test_window_spans_families():
    """At least one representative per family the R9 window targets: the
    new global-rank primitive, the ranks-rewrite churn head, the
    displaced r8 re-verifies, the R2 exclusions, the r1 leftovers, and
    the r3 streaming/connector/sketch core."""
    family_markers = {
        "new-contract": ["q_global_rank"],
        "ranks-churn": ["q_nb_auc", "q_lift_deciles", "q_rfm_segments",
                        "q_equi_depth_histogram", "q_skyline_pareto"],
        "displaced-r8": ["q_partitioned_pruning", "q_custom_datasource",
                         "q_multimodal_features"],
        "r2-exclusions": ["q_decimal_exact", "q_approx_distinct",
                          "q_language_id", "q_quality_score"],
        "r1-leftovers": ["q_string_funcs", "q_math_funcs"],
        "stream-stream": ["q_stream_stream_join", "q_stream_stream_outer",
                          "q_stream_stream_full"],
        "connectors": ["q_json_roundtrip", "q_orc_roundtrip",
                       "q_xml_roundtrip", "q_permissive_csv"],
        "ann-lsh": ["q_near_dup_lsh", "q_ann_ivf_topk", "q_ann_lsh_topk"],
        "sketches": ["q_kll_rollup", "q_theta_sketch_ops"],
        "maintenance": ["q_compact_small_files", "q_zorder_rewrite",
                        "q_incremental_rollup"],
    }
    window = set(DRIVER_WINDOW)
    missing = {
        fam: names
        for fam, names in family_markers.items()
        if not any(n in window for n in names)
    }
    assert not missing, missing


def test_frozen_windows_match_driver_records():
    """The frozen R2–R8 lists must equal what the driver actually
    verified those rounds (CORRECTNESS_r0N.json key sets). R4's record is
    the ordered head of the 58-entry rotation list; R5–R8's are the
    exact ordered windows."""
    r2 = set(json.load(open("/root/repo/CORRECTNESS_r02.json")))
    r3 = set(json.load(open("/root/repo/CORRECTNESS_r03.json")))
    r4 = json.load(open("/root/repo/CORRECTNESS_r04.json"))
    r5 = json.load(open("/root/repo/CORRECTNESS_r05.json"))
    r6 = json.load(open("/root/repo/CORRECTNESS_r06.json"))
    r7 = json.load(open("/root/repo/CORRECTNESS_r07.json"))
    r8 = json.load(open("/root/repo/CORRECTNESS_r08.json"))
    assert r2 == set(DRIVER_WINDOW_R2)
    assert r3 == set(DRIVER_WINDOW_R3)
    assert list(r4) == DRIVER_WINDOW_R4[:50]
    assert list(r5) == DRIVER_WINDOW_R5
    assert list(r6) == DRIVER_WINDOW_R6
    assert list(r7) == DRIVER_WINDOW_R7
    assert list(r8) == DRIVER_WINDOW_R8
    for record in (r4, r5, r6, r7, r8):
        for row in record.values():
            assert (
                row["rows_match"] and row["schema_match"] and row["hash_match"]
            )


def test_rotation_plan_covers_all_queries_exactly_once():
    """driver-green history (r1–r8) + this round's window + the r10
    pending list must cover every registered query — the schedule that
    gets every contract a driver-green CORRECTNESS row. New contracts
    added this round MUST be appended to DRIVER_WINDOW_R10_PENDING (that
    is what keeps this test green)."""
    r1 = set(json.load(open("/root/repo/CORRECTNESS_r01.json")))
    verified = (
        r1
        | set(DRIVER_WINDOW_R2)
        | set(DRIVER_WINDOW_R3)
        | set(DRIVER_WINDOW_R4[:50])
        | set(DRIVER_WINDOW_R5)
        | set(DRIVER_WINDOW_R6)
        | set(DRIVER_WINDOW_R7)
        | set(DRIVER_WINDOW_R8)
    )
    window = set(DRIVER_WINDOW)
    pending = set(DRIVER_WINDOW_R10_PENDING)
    union = verified | window | pending
    assert union >= set(QUERIES), set(QUERIES) - union
    # the ONLY never-driver-verified contract in the r9 window is
    # q_global_rank (new in r8, staged at the window head per VERDICT r8)
    assert window - verified == {"q_global_rank"}
    # new-contract debt never overlaps history or the active window
    assert not (pending & (verified | window))


def test_pending_debt_capped():
    """VERDICT r6 item 3 (renewed every round since): keep registry
    growth ≤ 6 per round so the r10 window (16 tranche-tail re-verifies
    + the r4-stale core) still clears its tranche on schedule."""
    assert len(DRIVER_WINDOW_R10_PENDING) <= 6, (
        "verification debt exceeds the cap — remove or defer new "
        "contracts (VERDICT r6 item 3)"
    )


def test_r10_churn_entries_valid():
    """VERDICT r8 item 4: churn entries must be registered, oracled,
    previously driver-green, and not already re-verifying in the active
    window (else the churn listing is redundant)."""
    churn = list(DRIVER_WINDOW_R10_CHURN)
    assert len(set(churn)) == len(churn)
    assert all(n in QUERIES and n in ORACLES for n in churn)
    assert not set(churn) & set(DRIVER_WINDOW)


def test_r10_prestage_is_valid():
    """VERDICT r8 item 3: the r10 window = R10_PENDING + R10_CHURN + the
    head of the R10_REVERIFY tranche (the 16-entry R9_REVERIFY tail,
    then the 48 r4-stale contracts churn-first). Every entry previously
    driver-green, still registered + oracled, no overlap with the active
    r9 window, and the composed window is a valid 50."""
    r1 = set(json.load(open("/root/repo/CORRECTNESS_r01.json")))
    history = (
        r1
        | set(DRIVER_WINDOW_R2)
        | set(DRIVER_WINDOW_R3)
        | set(DRIVER_WINDOW_R4[:50])
        | set(DRIVER_WINDOW_R5)
        | set(DRIVER_WINDOW_R6)
        | set(DRIVER_WINDOW_R7)
        | set(DRIVER_WINDOW_R8)
    )
    tranche = list(DRIVER_WINDOW_R10_REVERIFY)
    assert len(set(tranche)) == len(tranche)
    assert set(tranche) <= history
    assert all(n in QUERIES and n in ORACLES for n in tranche)
    # the R9_REVERIFY remainder leads the tranche
    assert tranche[: len(DRIVER_WINDOW_R9_REVERIFY) - 44] == list(
        DRIVER_WINDOW_R9_REVERIFY[44:]
    )
    # no overlap with the active r9 window or the churn head
    assert not set(tranche) & set(DRIVER_WINDOW)
    assert not set(tranche) & set(DRIVER_WINDOW_R10_CHURN)
    head = list(DRIVER_WINDOW_R10_PENDING) + list(DRIVER_WINDOW_R10_CHURN)
    assert len(set(head)) == len(head)
    r10_window = head + [n for n in tranche if n not in head][: 50 - len(head)]
    assert len(r10_window) == 50 and len(set(r10_window)) == 50
    # together, r10 + history + the r9 window cover the whole registry
    # except what rolls to r11 (the tranche tail) — all driver-green
    leftover = set(QUERIES) - history - set(DRIVER_WINDOW) - set(r10_window)
    assert leftover <= set(tranche), leftover - set(tranche)


def test_r10_churn_covers_r9_kernel_churn():
    """The broadcast cosine kernel was vectorized in r9 (VERDICT r8
    item 5); every r8-green contract that routes through
    exact_topk_broadcast / knn_join at driver scale must re-verify at
    the head of r10."""
    for name in ("q_similarity_topk", "q_knn_accuracy",
                 "q_hard_negatives", "q_near_dup_embedding"):
        assert name in DRIVER_WINDOW_R10_CHURN, name

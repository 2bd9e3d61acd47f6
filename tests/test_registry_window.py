"""Pin the driver-window invariants: the correctness driver verifies the
first 50 registered queries only, so the registry head must stay curated
(VERDICT r1 item 1) — every window name oracled, no duplicates, and the
window actually at the head of both dicts. Frozen windows R2–R6 are pinned
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
    DRIVER_WINDOW_R7_PENDING,
    DRIVER_WINDOW_R7_REVERIFY,
    DRIVER_WINDOW_R8_CHURN,
    DRIVER_WINDOW_R8_PENDING,
    DRIVER_WINDOW_R8_REVERIFY,
    ORACLES,
    QUERIES,
)


def test_window_is_registry_prefix():
    assert list(QUERIES)[: len(DRIVER_WINDOW)] == DRIVER_WINDOW
    assert list(ORACLES)[: len(DRIVER_WINDOW)] == DRIVER_WINDOW


def test_window_size_and_uniqueness():
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50


def test_window_is_r7():
    """VERDICT r6 item 1: the r7 swap is the staged composition — the 14
    never-driver-verified contracts first (clearing the pool to zero),
    then the r1 relational-core re-verification head (joins first)."""
    assert DRIVER_WINDOW == DRIVER_WINDOW_R7
    assert DRIVER_WINDOW_R7 == (
        list(DRIVER_WINDOW_R7_PENDING) + list(DRIVER_WINDOW_R7_REVERIFY[:36])
    )


def test_window_fully_oracled():
    """Rows-only contracts in the window would come back err: no_oracle."""
    unoracled = [n for n in DRIVER_WINDOW if n not in ORACLES]
    assert not unoracled, unoracled


def test_window_spans_families():
    """At least one representative per family the R7 window targets:
    the pending long-tail (data-quality, time-series, histogram) and the
    r1 relational core being re-verified (joins, group-aggs, windows,
    sets, null semantics)."""
    family_markers = {
        "pending-data-quality": ["q_dedup_survivorship",
                                 "q_referential_integrity",
                                 "q_span_corruption"],
        "pending-time-series": ["q_forward_fill", "q_seasonal_index",
                                "q_asof_nearest"],
        "pending-histogram": ["q_equi_depth_histogram",
                              "q_weighted_median"],
        "joins": ["q_join_orders_customer", "q_join_lineitem_part_bcast",
                  "q_join_left_outer"],
        "semi-anti": ["q_semi_customers_with_orders",
                      "q_anti_customers_without_orders"],
        "group-aggs": ["q_groupagg_pricing", "q_rollup_nation_segment",
                       "q_cube_year_status"],
        "windows": ["q_window_rank", "q_window_running",
                    "q_window_moving_avg"],
        "sets": ["q_union_users", "q_intersect_users", "q_except_users"],
        "semi-structured": ["q_json_extract"],
        "events": ["q_tumbling_counts", "q_sliding_counts"],
    }
    window = set(DRIVER_WINDOW)
    missing = {
        fam: names
        for fam, names in family_markers.items()
        if not any(n in window for n in names)
    }
    assert not missing, missing


def test_frozen_windows_match_driver_records():
    """The frozen R2–R6 lists must equal what the driver actually
    verified those rounds (CORRECTNESS_r0N.json key sets). R4's record is
    the ordered head of the 58-entry rotation list; R5's and R6's are the
    exact ordered windows."""
    r2 = set(json.load(open("/root/repo/CORRECTNESS_r02.json")))
    r3 = set(json.load(open("/root/repo/CORRECTNESS_r03.json")))
    r4 = json.load(open("/root/repo/CORRECTNESS_r04.json"))
    r5 = json.load(open("/root/repo/CORRECTNESS_r05.json"))
    r6 = json.load(open("/root/repo/CORRECTNESS_r06.json"))
    assert r2 == set(DRIVER_WINDOW_R2)
    assert r3 == set(DRIVER_WINDOW_R3)
    assert list(r4) == DRIVER_WINDOW_R4[:50]
    assert list(r5) == DRIVER_WINDOW_R5
    assert list(r6) == DRIVER_WINDOW_R6
    for record in (r4, r5, r6):
        for row in record.values():
            assert (
                row["rows_match"] and row["schema_match"] and row["hash_match"]
            )


def test_rotation_plan_covers_all_queries_exactly_once():
    """driver-green history (r1–r6) + this round's window + the r8
    pending list must cover every registered query — the schedule that
    gets every contract a driver-green CORRECTNESS row. New contracts
    added this round MUST be appended to DRIVER_WINDOW_R8_PENDING (that
    is what keeps this test green). With the r7 swap the
    never-driver-verified pool is ZERO: every registered contract is
    either driver-green already or in the active window."""
    r1 = set(json.load(open("/root/repo/CORRECTNESS_r01.json")))
    verified = (
        r1
        | set(DRIVER_WINDOW_R2)
        | set(DRIVER_WINDOW_R3)
        | set(DRIVER_WINDOW_R4[:50])
        | set(DRIVER_WINDOW_R5)
        | set(DRIVER_WINDOW_R6)
    )
    window = set(DRIVER_WINDOW)
    pending = set(DRIVER_WINDOW_R8_PENDING)
    union = verified | window | pending
    assert union >= set(QUERIES), set(QUERIES) - union
    # the 14 pending names were never verified before this window
    assert not (set(DRIVER_WINDOW_R7_PENDING) & verified)
    # new-contract debt never overlaps history or the active window
    assert not (pending & (verified | window))


def test_pending_debt_capped():
    """VERDICT r6 item 3: keep registry growth ≤ 6 this round so the r8
    window (6 displaced re-verifies + churn head + r2 tranche) still
    clears its tranche on schedule."""
    assert len(DRIVER_WINDOW_R8_PENDING) <= 6, (
        "verification debt exceeds the r7 cap — remove or defer new "
        "contracts (VERDICT r6 item 3)"
    )


def test_r7_reverify_targets_were_r1_green():
    """Every re-verification entry in the active window was r1-green and
    is still registered + oracled."""
    r1 = set(json.load(open("/root/repo/CORRECTNESS_r01.json")))
    reverify = list(DRIVER_WINDOW_R7_REVERIFY)
    assert len(set(reverify)) == len(reverify)
    assert set(reverify) <= r1
    assert all(n in ORACLES for n in reverify)


def test_r8_prestage_is_valid():
    """The r8 window: the R7_REVERIFY remainder (6) + new-contract debt +
    the churn-first head (r6 ADVICE: contracts whose plan/oracle changed
    after their last driver-green round) + the head of the 44-entry
    r2-core tranche must form a full 50-window — every entry previously
    driver-green (or new), still registered + oracled, no overlap with
    the active window. The displaced R8_REVERIFY tail joins r9."""
    r2 = set(json.load(open("/root/repo/CORRECTNESS_r02.json")))
    r3 = set(json.load(open("/root/repo/CORRECTNESS_r03.json")))
    r5 = set(json.load(open("/root/repo/CORRECTNESS_r05.json")))
    r6 = set(json.load(open("/root/repo/CORRECTNESS_r06.json")))
    tranche = list(DRIVER_WINDOW_R8_REVERIFY)
    assert len(tranche) == 44 and len(set(tranche)) == 44
    assert set(tranche) <= r2
    assert all(n in ORACLES for n in tranche)
    churn = list(DRIVER_WINDOW_R8_CHURN)
    assert len(set(churn)) == len(churn)
    # churn entries must each have SOME prior driver-green record
    # (q_kcore_rounds: r5-verified, operator gate changed in r7)
    assert set(churn) <= (r2 | r3 | r5 | r6)
    assert all(n in ORACLES for n in churn)
    displaced = [n for n in DRIVER_WINDOW_R7_REVERIFY if n not in DRIVER_WINDOW]
    head = displaced + list(DRIVER_WINDOW_R8_PENDING) + churn
    assert not (set(head) | set(tranche)) & set(DRIVER_WINDOW)
    assert len(set(head)) == len(head)
    r8_window = head + [n for n in tranche if n not in head][: 50 - len(head)]
    assert len(r8_window) == 50 and len(set(r8_window)) == 50

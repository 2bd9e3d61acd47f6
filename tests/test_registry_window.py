"""Pin the driver-window invariants: the correctness driver verifies the
first 50 registered queries only, so the registry head must stay curated
(VERDICT r1 item 1) — every window name oracled, no duplicates, and the
window actually at the head of both dicts. Frozen windows R2–R5 are pinned
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
    DRIVER_WINDOW_R7_PENDING,
    DRIVER_WINDOW_R7_REVERIFY,
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


def test_window_is_r6():
    """VERDICT r5 item 1: the r6 swap is the 50-head of the r5 pending
    pool (with the two two-pass-histogram quantile contracts promoted
    into the head per VERDICT r5 item 8)."""
    assert DRIVER_WINDOW == DRIVER_WINDOW_R6


def test_window_fully_oracled():
    """Rows-only contracts in the window would come back err: no_oracle."""
    unoracled = [n for n in DRIVER_WINDOW if n not in ORACLES]
    assert not unoracled, unoracled


def test_window_spans_families():
    """At least one representative per family the R6 window targets
    (never-driver-verified: delicate stats, pair-emitting near-dup,
    two-pass quantiles, retrieval, corpus planning, TPC-H tail)."""
    family_markers = {
        "delicate-stats": ["q_benford_digits", "q_welch_ttest",
                           "q_spearman_corr"],
        "near-dup-pairs": ["q_containment_near_dup",
                           "q_near_dup_shingle_lsh"],
        "sketch": ["q_count_min"],
        "ann": ["q_ann_pq_topk"],
        "two-pass-quantiles": ["q_weighted_median_hist",
                               "q_weighted_percentiles_hist"],
        "retrieval": ["q_bm25_topk", "q_phrase_search", "q_rrf_fusion"],
        "corpus-planning": ["q_shard_manifest", "q_token_budget_mix",
                            "q_epoch_mixture_plan"],
        "tpch-tail": ["q_tpch_q2_mincost", "q_tpch_q11_important",
                      "q_tpch_q20_semi_chain"],
        "range-joins": ["q_band_join_balances", "q_interval_overlap_join"],
        "governance": ["q_l_diversity"],
    }
    window = set(DRIVER_WINDOW)
    missing = {
        fam: names
        for fam, names in family_markers.items()
        if not any(n in window for n in names)
    }
    assert not missing, missing


def test_frozen_windows_match_driver_records():
    """The frozen R2/R3/R4/R5 lists must equal what the driver actually
    verified those rounds (CORRECTNESS_r0N.json key sets). R4's record is
    the ordered head of the 58-entry rotation list; R5's is the exact
    ordered window (VERDICT r5 item 1: freeze DRIVER_WINDOW_R5 using
    CORRECTNESS_r05.json)."""
    r2 = set(json.load(open("/root/repo/CORRECTNESS_r02.json")))
    r3 = set(json.load(open("/root/repo/CORRECTNESS_r03.json")))
    r4 = json.load(open("/root/repo/CORRECTNESS_r04.json"))
    r5 = json.load(open("/root/repo/CORRECTNESS_r05.json"))
    assert r2 == set(DRIVER_WINDOW_R2)
    assert r3 == set(DRIVER_WINDOW_R3)
    assert list(r4) == DRIVER_WINDOW_R4[:50]
    assert list(r5) == DRIVER_WINDOW_R5
    for record in (r4, r5):
        for row in record.values():
            assert (
                row["rows_match"] and row["schema_match"] and row["hash_match"]
            )


def test_rotation_plan_covers_all_queries_exactly_once():
    """r1-green set + frozen r2–r5 windows + this round's window + the
    r7 pending list must cover every registered query with no overlaps —
    the schedule that gets every contract a driver-green CORRECTNESS row.
    New contracts added this round MUST be appended to
    DRIVER_WINDOW_R7_PENDING (that is what keeps this test green)."""
    r1 = set(json.load(open("/root/repo/CORRECTNESS_r01.json")))
    verified = (
        r1
        | set(DRIVER_WINDOW_R2)
        | set(DRIVER_WINDOW_R3)
        | set(DRIVER_WINDOW_R4[:50])
        | set(DRIVER_WINDOW_R5)
    )
    window = set(DRIVER_WINDOW)
    pending = set(DRIVER_WINDOW_R7_PENDING)
    union = verified | window | pending
    assert union >= set(QUERIES), set(QUERIES) - union
    assert not (window & verified)
    assert not (pending & (verified | window))
    assert all(n in ORACLES for n in DRIVER_WINDOW_R6)


def test_pending_debt_capped():
    """VERDICT r5 item 5: keep registry growth ≤ 6 this round. The r7
    pending list starts this round at 14; additions must keep it ≤ 20 so
    r7 clears the pool and starts the r1-core re-verifications on
    schedule."""
    assert len(DRIVER_WINDOW_R7_PENDING) <= 20, (
        "verification debt exceeds the r6 cap — remove or defer new "
        "contracts (VERDICT r5 item 5)"
    )


def test_r7_prestage_is_valid():
    """VERDICT r5 items 5–6: the r7 rotation is pre-staged — pending tail
    then the r1-core re-verification set, all still registered + oracled."""
    r1 = set(json.load(open("/root/repo/CORRECTNESS_r01.json")))
    reverify = list(DRIVER_WINDOW_R7_REVERIFY)
    assert len(set(reverify)) == len(reverify)
    # every re-verification target was r1-green and is still registered+oracled
    assert set(reverify) <= r1
    assert all(n in ORACLES for n in reverify)
    combined = list(DRIVER_WINDOW_R7_PENDING) + reverify
    assert len(set(combined)) == len(combined)
    assert len(combined) >= 50


def test_r8_prestage_is_valid():
    """r6 pre-stage of the r8 window: the R7_REVERIFY remainder (what r7
    doesn't consume) + the 44-entry r2-core tranche must form a full
    50-window — every entry r2-driver-green, still registered + oracled,
    no overlap with the r7 lists."""
    r2 = set(json.load(open("/root/repo/CORRECTNESS_r02.json")))
    tranche = list(DRIVER_WINDOW_R8_REVERIFY)
    assert len(tranche) == 44 and len(set(tranche)) == 44
    assert set(tranche) <= r2
    assert all(n in ORACLES for n in tranche)
    assert not set(tranche) & (
        set(DRIVER_WINDOW_R7_PENDING) | set(DRIVER_WINDOW_R7_REVERIFY)
    )
    r7_window = (
        list(DRIVER_WINDOW_R7_PENDING) + list(DRIVER_WINDOW_R7_REVERIFY)
    )[:50]
    r8_window = [n for n in DRIVER_WINDOW_R7_REVERIFY if n not in r7_window]
    r8_window += tranche
    assert len(r8_window) == 50 and len(set(r8_window)) == 50

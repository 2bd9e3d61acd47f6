"""Pin the driver-window invariants: the correctness driver verifies the
first 50 registered queries only, so the registry head must stay curated
(VERDICT r1 item 1) — every window name oracled, no duplicates, and the
window actually at the head of both dicts. Frozen windows R2–R9 are pinned
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
    DRIVER_WINDOW_R10,
    DRIVER_WINDOW_R10_CHURN,
    DRIVER_WINDOW_R10_PENDING,
    DRIVER_WINDOW_R10_REVERIFY,
    DRIVER_WINDOW_R11_CHURN,
    DRIVER_WINDOW_R11_PENDING,
    DRIVER_WINDOW_R11_REVERIFY,
    ORACLES,
    QUERIES,
)

#: the new-contract cap (VERDICT r6 item 3, renewed every round since)
PENDING_CAP = 6


def _history_through_r9() -> set[str]:
    """Every contract with a driver-green record in r1–r9."""
    r1 = set(json.load(open("/root/repo/CORRECTNESS_r01.json")))
    return (
        r1
        | set(DRIVER_WINDOW_R2)
        | set(DRIVER_WINDOW_R3)
        | set(DRIVER_WINDOW_R4[:50])
        | set(DRIVER_WINDOW_R5)
        | set(DRIVER_WINDOW_R6)
        | set(DRIVER_WINDOW_R7)
        | set(DRIVER_WINDOW_R8)
        | set(DRIVER_WINDOW_R9)
    )


def test_window_is_registry_prefix():
    assert list(QUERIES)[: len(DRIVER_WINDOW)] == DRIVER_WINDOW
    assert list(ORACLES)[: len(DRIVER_WINDOW)] == DRIVER_WINDOW


def test_window_size_and_uniqueness():
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50


def test_window_is_r10():
    """VERDICT r9 item 1: the r10 swap is the pre-staged composition —
    the two new r10 contracts, the four r9 broadcast-cosine churn
    entries, then the head of the R10_REVERIFY tranche (the 16-entry
    R9_REVERIFY tail + the r4-stale core churn-first)."""
    assert DRIVER_WINDOW == DRIVER_WINDOW_R10
    assert DRIVER_WINDOW_R10 == (
        list(DRIVER_WINDOW_R10_PENDING)
        + list(DRIVER_WINDOW_R10_CHURN)
        + list(DRIVER_WINDOW_R10_REVERIFY[:44])
    )
    # new contracts head the window (never-driver-verified first)
    assert DRIVER_WINDOW[0] == "q_cross_table_knn"
    assert DRIVER_WINDOW[1] == "q_running_total_nulls"


def test_window_fully_oracled():
    """Rows-only contracts in the window would come back err: no_oracle."""
    unoracled = [n for n in DRIVER_WINDOW if n not in ORACLES]
    assert not unoracled, unoracled


def test_window_spans_families():
    """At least one representative per family the R10 window targets:
    the two new contracts, the r9 kernel-churn head, the R9_REVERIFY
    tail (streaming/connector core), and the r4-stale families
    (sketch/quantile, similarity/fingerprint, text-analysis,
    join-strategy, events, relational/TPC-H)."""
    family_markers = {
        "new-contracts": ["q_cross_table_knn", "q_running_total_nulls"],
        "kernel-churn": ["q_similarity_topk", "q_knn_accuracy",
                         "q_hard_negatives", "q_near_dup_embedding"],
        "sketch-quantile": ["q_heavy_hitters", "q_weighted_sample",
                            "q_rank_distribution"],
        "similarity-fingerprint": ["q_semantic_dedup", "q_dedup_clusters",
                                   "q_simhash", "q_fingerprint_groups"],
        "text-analysis": ["q_chunk_documents", "q_token_entropy",
                          "q_lm_score"],
        "join-strategy": ["q_salted_join_contract", "q_bloom_join_contract",
                          "q_join_hints_contract"],
        "schema-io": ["q_null_safe_join", "q_union_by_name",
                      "q_schema_evolution"],
        # the events + relational/TPC-H tail of the r4-stale core rolls
        # to r11 (DRIVER_WINDOW_R11_REVERIFY head) — covered by
        # test_stale_pool_drained_by_r11, not window membership
    }
    window = set(DRIVER_WINDOW)
    missing = {
        fam: names
        for fam, names in family_markers.items()
        if not any(n in window for n in names)
    }
    assert not missing, missing


def test_frozen_windows_match_driver_records():
    """The frozen R2–R9 lists must equal what the driver actually
    verified those rounds (CORRECTNESS_r0N.json key sets). R4's record is
    the ordered head of the 58-entry rotation list; R5–R9's are the
    exact ordered windows."""
    r2 = set(json.load(open("/root/repo/CORRECTNESS_r02.json")))
    r3 = set(json.load(open("/root/repo/CORRECTNESS_r03.json")))
    r4 = json.load(open("/root/repo/CORRECTNESS_r04.json"))
    r5 = json.load(open("/root/repo/CORRECTNESS_r05.json"))
    r6 = json.load(open("/root/repo/CORRECTNESS_r06.json"))
    r7 = json.load(open("/root/repo/CORRECTNESS_r07.json"))
    r8 = json.load(open("/root/repo/CORRECTNESS_r08.json"))
    r9 = json.load(open("/root/repo/CORRECTNESS_r09.json"))
    assert r2 == set(DRIVER_WINDOW_R2)
    assert r3 == set(DRIVER_WINDOW_R3)
    assert list(r4) == DRIVER_WINDOW_R4[:50]
    assert list(r5) == DRIVER_WINDOW_R5
    assert list(r6) == DRIVER_WINDOW_R6
    assert list(r7) == DRIVER_WINDOW_R7
    assert list(r8) == DRIVER_WINDOW_R8
    assert list(r9) == DRIVER_WINDOW_R9
    # the executed r9 composition stays frozen too
    assert DRIVER_WINDOW_R9 == (
        list(DRIVER_WINDOW_R9_PENDING)
        + list(DRIVER_WINDOW_R9_CHURN)
        + list(DRIVER_WINDOW_R9_REVERIFY[:44])
    )
    for record in (r4, r5, r6, r7, r8, r9):
        for row in record.values():
            assert (
                row["rows_match"] and row["schema_match"] and row["hash_match"]
            )


def test_rotation_plan_covers_all_queries_exactly_once():
    """driver-green history (r1–r9) + this round's window + the r11
    pending list must cover every registered query — the schedule that
    gets every contract a driver-green CORRECTNESS row. New contracts
    added NEXT round must be appended to DRIVER_WINDOW_R11_PENDING (that
    is what keeps this test green)."""
    verified = _history_through_r9()
    window = set(DRIVER_WINDOW)
    pending = set(DRIVER_WINDOW_R11_PENDING)
    union = verified | window | pending
    assert union >= set(QUERIES), set(QUERIES) - union
    # the ONLY never-driver-verified contracts in the r10 window are the
    # two new r10 contracts, staged at the window head
    assert window - verified == {"q_cross_table_knn", "q_running_total_nulls"}
    # new-contract debt never overlaps history or the active window
    assert not (pending & (verified | window))


def test_pending_debt_capped():
    """VERDICT r6 item 3 (renewed every round since): keep registry
    growth ≤ 6 per round so each window still clears its re-verification
    tranche on schedule."""
    assert len(DRIVER_WINDOW_R10_PENDING) <= PENDING_CAP
    assert len(DRIVER_WINDOW_R11_PENDING) <= PENDING_CAP, (
        "verification debt exceeds the cap — remove or defer new "
        "contracts (VERDICT r6 item 3)"
    )


def test_r11_churn_entries_valid():
    """Churn entries must be registered, oracled, previously
    driver-green, and not already re-verifying in the active window
    (else the churn listing is redundant)."""
    churn = list(DRIVER_WINDOW_R11_CHURN)
    assert len(set(churn)) == len(churn)
    assert all(n in QUERIES and n in ORACLES for n in churn)
    assert set(churn) <= _history_through_r9()
    assert not set(churn) & set(DRIVER_WINDOW)


def test_r11_churn_covers_r10_ranks_churn():
    """operators.ranks null semantics changed in r10 (ADVICE r9: nulls
    contribute 0 on both routes); every ranks consumer NOT re-verifying
    in the r10 window must head the r11 rotation."""
    in_window = set(DRIVER_WINDOW)
    for name in ("q_global_rank", "q_lift_deciles", "q_rfm_segments",
                 "q_equi_depth_histogram", "q_nb_auc"):
        assert name in DRIVER_WINDOW_R11_CHURN or name in in_window, name


def test_r11_prestage_is_valid():
    """VERDICT r9 item 2: the r11 window = R11_PENDING + R11_CHURN + the
    head of the R11_REVERIFY tranche (the 20-entry R10_REVERIFY tail,
    the four r1-latest batteries, then the r5-latest pool churn-first).
    Every entry previously driver-green, still registered + oracled, no
    overlap with the active r10 window, and the composed window is a
    valid 50."""
    history = _history_through_r9()
    tranche = list(DRIVER_WINDOW_R11_REVERIFY)
    assert len(set(tranche)) == len(tranche)
    assert set(tranche) <= history
    assert all(n in QUERIES and n in ORACLES for n in tranche)
    # the R10_REVERIFY remainder leads the tranche
    assert tranche[: len(DRIVER_WINDOW_R10_REVERIFY) - 44] == list(
        DRIVER_WINDOW_R10_REVERIFY[44:]
    )
    # no overlap with the active r10 window or the churn head
    assert not set(tranche) & set(DRIVER_WINDOW)
    assert not set(tranche) & set(DRIVER_WINDOW_R11_CHURN)
    head = list(DRIVER_WINDOW_R11_PENDING) + list(DRIVER_WINDOW_R11_CHURN)
    assert len(set(head)) == len(head)
    r11_window = head + [n for n in tranche if n not in head][: 50 - len(head)]
    assert len(r11_window) == 50 and len(set(r11_window)) == 50


def test_stale_pool_drained_by_r11():
    """VERDICT r9 item 2 — the stale-pool ENDGAME, asserted statically
    against the committed CORRECTNESS history: every contract whose
    LATEST driver-green record predates r5 (i.e. older than the
    near-dup-gate/quantile/ranks engine churn of r5–r9) is re-verified
    by the r10 window or by the GUARANTEED-EXECUTED prefix of the r11
    staging — the churn head plus the reverify slots that survive even
    a maximally-filled (6-entry) r11 pending list. So by r11 close, max
    staleness across all contracts is ≥ r5 regardless of how much new
    surface r11 adds."""
    latest: dict[str, int] = {}
    for rnd in range(1, 10):
        record = json.load(open(f"/root/repo/CORRECTNESS_r0{rnd}.json"))
        for name, row in record.items():
            if row["rows_match"] and not row.get("err"):
                latest[name] = rnd
    stale = {n for n in QUERIES if n in latest and latest[n] <= 4}
    guaranteed_r11_slots = 50 - PENDING_CAP - len(DRIVER_WINDOW_R11_CHURN)
    guaranteed = (
        set(DRIVER_WINDOW)
        | set(DRIVER_WINDOW_R11_CHURN)
        | set(DRIVER_WINDOW_R11_REVERIFY[:guaranteed_r11_slots])
    )
    uncovered = stale - guaranteed
    assert not uncovered, sorted(uncovered)


def test_r10_churn_covers_r9_kernel_churn():
    """The broadcast cosine kernel was vectorized in r9 (VERDICT r8
    item 5); every r8-green contract that routes through
    exact_topk_broadcast / knn_join at driver scale must re-verify at
    the head of r10."""
    for name in ("q_similarity_topk", "q_knn_accuracy",
                 "q_hard_negatives", "q_near_dup_embedding"):
        assert name in DRIVER_WINDOW_R10_CHURN, name
        assert name in DRIVER_WINDOW, name

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
    DRIVER_WINDOW_R12,
    DRIVER_WINDOW_R12_CHURN,
    DRIVER_WINDOW_R12_CHURN_B,
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


def _history_through_r11() -> set[str]:
    """r1–r9 history plus the executed r10/r11 windows (same 50 both
    rounds — the r11 optimization round did not rotate)."""
    out = _history_through_r9()
    for rnd in ("10", "11"):
        out |= set(json.load(open(f"/root/repo/CORRECTNESS_r{rnd}.json")))
    return out


def test_window_is_registry_prefix():
    assert list(QUERIES)[: len(DRIVER_WINDOW)] == DRIVER_WINDOW
    assert list(ORACLES)[: len(DRIVER_WINDOW)] == DRIVER_WINDOW


def test_window_size_and_uniqueness():
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50


def test_window_is_r12():
    """VERDICT r11 item 7 (executed): the active window is the r12
    composition — the pre-staged R12_CHURN head, the r12-round churn
    additions, the five r11 ranks-churn entries (the r11 optimization
    round deliberately did not rotate), then the R11_REVERIFY tranche
    head to fill 50, deduped in that priority order (ADVICE r11: the
    dedup rule is now enforced here, not by a comment)."""
    assert DRIVER_WINDOW == DRIVER_WINDOW_R12
    head = list(
        dict.fromkeys(
            list(DRIVER_WINDOW_R12_CHURN)
            + list(DRIVER_WINDOW_R12_CHURN_B)
            + list(DRIVER_WINDOW_R11_CHURN)
        )
    )
    assert DRIVER_WINDOW_R12 == head + [
        n for n in DRIVER_WINDOW_R11_REVERIFY if n not in head
    ][: 50 - len(head)]
    # every plan-changed contract re-verifies THIS round, at the head
    assert DRIVER_WINDOW[0] == "q_pagerank"
    for n in list(DRIVER_WINDOW_R12_CHURN) + list(DRIVER_WINDOW_R12_CHURN_B):
        assert n in DRIVER_WINDOW, n


def test_r10_window_stays_frozen():
    """The executed r10/r11 window (the driver verified the same 50 both
    rounds) stays pinned against its own CORRECTNESS records."""
    r10 = json.load(open("/root/repo/CORRECTNESS_r10.json"))
    r11 = json.load(open("/root/repo/CORRECTNESS_r11.json"))
    assert list(r10) == DRIVER_WINDOW_R10
    assert list(r11) == DRIVER_WINDOW_R10
    assert DRIVER_WINDOW_R10 == (
        list(DRIVER_WINDOW_R10_PENDING)
        + list(DRIVER_WINDOW_R10_CHURN)
        + list(DRIVER_WINDOW_R10_REVERIFY[:44])
    )
    for record in (r10, r11):
        for row in record.values():
            assert (
                row["rows_match"] and row["schema_match"] and row["hash_match"]
            )


def test_r12_churn_entries_valid():
    """ADVICE r11 item 3: both r12 churn lists must be registered,
    oracled, de-dupable (no dup WITHIN a list), and — unlike the r11
    situation the advice flagged — their overlap with other window
    sources is resolved by the enforced composition above, not a
    comment."""
    for churn in (DRIVER_WINDOW_R12_CHURN, DRIVER_WINDOW_R12_CHURN_B):
        assert len(set(churn)) == len(churn)
        assert all(n in QUERIES and n in ORACLES for n in churn)
    # the B-list is the genuinely-new churn: no overlap with the
    # pre-staged list
    assert not set(DRIVER_WINDOW_R12_CHURN_B) & set(DRIVER_WINDOW_R12_CHURN)


def test_window_fully_oracled():
    """Rows-only contracts in the window would come back err: no_oracle."""
    unoracled = [n for n in DRIVER_WINDOW if n not in ORACLES]
    assert not unoracled, unoracled


def test_window_spans_families():
    """At least one representative per family the R12 window targets:
    the r11/r12 plan-churn families (graph, iterative ML, LSH/near-dup,
    pipelines, ranks), then the r4-stale reverify core (events,
    aggregates, relational/TPC-H) and the r1-latest scalar batteries."""
    family_markers = {
        "graph-churn": ["q_pagerank", "q_connected_components",
                        "q_khop_reach", "q_sssp_cheapest"],
        "iterative-ml-churn": ["q_kmeans", "q_logreg_score",
                               "q_logreg_train"],
        "lsh-near-dup-churn": ["q_near_dup_lsh", "q_near_dup_shingle_lsh",
                               "q_dedup_clusters"],
        "pipeline-churn": ["q_pretrain_pipeline", "q_dedup_survivorship"],
        "ranks-churn": ["q_global_rank", "q_lift_deciles",
                        "q_rfm_segments", "q_nb_auc"],
        "events-stale": ["q_rolling_dau", "q_cumulative_users",
                         "q_event_sequences", "q_time_weighted_avg"],
        "aggregate-stale": ["q_stats_moments", "q_string_agg",
                            "q_min_max_by", "q_conditional_agg"],
        "tpch-stale": ["q_tpch_q18", "q_tpch_q14", "q_tpch_q19",
                       "q_tpch_q22"],
        "scalar-batteries": ["q_calendar_funcs", "q_bitwise_funcs",
                             "q_encoding_funcs", "q_format_funcs"],
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
    """driver-green history (now r1–r11) + this round's window + the
    pending list must cover every registered query — the schedule that
    gets every contract a driver-green CORRECTNESS row. New contracts
    (none in r11/r12) must join DRIVER_WINDOW_R11_PENDING."""
    verified = _history_through_r11()
    window = set(DRIVER_WINDOW)
    pending = set(DRIVER_WINDOW_R11_PENDING)
    union = verified | window | pending
    assert union >= set(QUERIES), set(QUERIES) - union
    # every r12-window entry was previously driver-green: this round's
    # window is pure re-verification (churn-first), no new-contract debt
    assert not window - verified
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
    driver-green — and, now that the r12 rotation executed, IN the
    active window (they re-verify this round, at last)."""
    churn = list(DRIVER_WINDOW_R11_CHURN)
    assert len(set(churn)) == len(churn)
    assert all(n in QUERIES and n in ORACLES for n in churn)
    assert set(churn) <= _history_through_r9()
    assert set(churn) <= set(DRIVER_WINDOW)


def test_r11_churn_covers_r10_ranks_churn():
    """operators.ranks null semantics changed in r10 (ADVICE r9: nulls
    contribute 0 on both routes); every ranks consumer NOT re-verifying
    in the r10 window must head the r11 rotation."""
    in_window = set(DRIVER_WINDOW)
    for name in ("q_global_rank", "q_lift_deciles", "q_rfm_segments",
                 "q_equi_depth_histogram", "q_nb_auc"):
        assert name in DRIVER_WINDOW_R11_CHURN or name in in_window, name


def test_r11_prestage_is_valid():
    """The R11_REVERIFY tranche (now feeding the r12 window's fill
    slots): every entry previously driver-green, still registered +
    oracled, no duplicates, the R10_REVERIFY remainder leads it, and no
    overlap with the r11 churn head."""
    history = _history_through_r9()
    tranche = list(DRIVER_WINDOW_R11_REVERIFY)
    assert len(set(tranche)) == len(tranche)
    assert set(tranche) <= history
    assert all(n in QUERIES and n in ORACLES for n in tranche)
    # the R10_REVERIFY remainder leads the tranche
    assert tranche[: len(DRIVER_WINDOW_R10_REVERIFY) - 44] == list(
        DRIVER_WINDOW_R10_REVERIFY[44:]
    )
    assert not set(tranche) & set(DRIVER_WINDOW_R11_CHURN)


def test_stale_pool_drained_by_r12():
    """The stale-pool ENDGAME (VERDICT r9 item 2, rescheduled after the
    r11 optimization round held the r10 window), asserted statically
    against the committed CORRECTNESS history r1–r11: every contract
    whose LATEST driver-green record predates r5 re-verifies IN the
    active r12 window — by r12 close, max staleness across all
    contracts is ≥ r5."""
    latest: dict[str, int] = {}
    for rnd in range(1, 12):
        record = json.load(open(f"/root/repo/CORRECTNESS_r{rnd:02d}.json"))
        for name, row in record.items():
            if row["rows_match"] and not row.get("err"):
                latest[name] = rnd
    assert set(latest) == set(QUERIES)  # no never-verified contracts
    stale = {n for n in QUERIES if latest[n] <= 4}
    uncovered = stale - set(DRIVER_WINDOW)
    assert not uncovered, sorted(uncovered)


def test_r10_churn_covers_r9_kernel_churn():
    """The broadcast cosine kernel was vectorized in r9 (VERDICT r8
    item 5); every r8-green contract that routes through
    exact_topk_broadcast / knn_join at driver scale must re-verify at
    the head of r10."""
    for name in ("q_similarity_topk", "q_knn_accuracy",
                 "q_hard_negatives", "q_near_dup_embedding"):
        assert name in DRIVER_WINDOW_R10_CHURN, name
        # they re-verified in the executed r10/r11 windows (frozen above)
        assert name in DRIVER_WINDOW_R10, name

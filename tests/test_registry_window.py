"""Pin the driver-window invariants: the correctness driver verifies the
first 50 registered queries only, so the registry head must stay curated
(VERDICT r1 item 1) — every window name oracled, no duplicates, and the
window actually at the head of both dicts. Frozen windows R2–R7 are pinned
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
    DRIVER_WINDOW_R8,
    DRIVER_WINDOW_R8_CHURN,
    DRIVER_WINDOW_R8_PENDING,
    DRIVER_WINDOW_R8_REVERIFY,
    DRIVER_WINDOW_R9_CHURN,
    DRIVER_WINDOW_R9_PENDING,
    DRIVER_WINDOW_R9_REVERIFY,
    ORACLES,
    QUERIES,
)


def test_window_is_registry_prefix():
    assert list(QUERIES)[: len(DRIVER_WINDOW)] == DRIVER_WINDOW
    assert list(ORACLES)[: len(DRIVER_WINDOW)] == DRIVER_WINDOW


def test_window_size_and_uniqueness():
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50


def test_window_is_r8():
    """VERDICT r7 item 2: the r8 swap is the pre-staged composition — the
    6 R7_REVERIFY entries displaced by the r7 pending head, then
    new-contract debt (zero), then the churn-first head, then the head of
    the 44-entry r2-core tranche."""
    assert DRIVER_WINDOW == DRIVER_WINDOW_R8
    assert DRIVER_WINDOW_R8 == (
        list(DRIVER_WINDOW_R7_REVERIFY[36:])
        + list(DRIVER_WINDOW_R8_PENDING)
        + list(DRIVER_WINDOW_R8_CHURN)
        + list(DRIVER_WINDOW_R8_REVERIFY[:41])
    )


def test_window_fully_oracled():
    """Rows-only contracts in the window would come back err: no_oracle."""
    unoracled = [n for n in DRIVER_WINDOW if n not in ORACLES]
    assert not unoracled, unoracled


def test_window_spans_families():
    """At least one representative per family the R8 window targets: the
    displaced r1 expression/sessionize tail, the churn head, and the
    r2-core similarity / UDF / graph / streaming / subquery families."""
    family_markers = {
        "displaced-r1-tail": ["q_sessionize", "q_null_semantics",
                              "q_date_funcs", "q_map_funcs"],
        "churn": ["q_logreg_train", "q_hard_negatives", "q_kcore_rounds"],
        "near-dup": ["q_near_dup_jaccard", "q_near_dup_ngram",
                     "q_simhash_near_dup"],
        "similarity-ml": ["q_similarity_topk", "q_knn_accuracy",
                          "q_kmeans", "q_pca_variance"],
        "udf-surface": ["q_udf_python", "q_pandas_udf_cosine",
                        "q_grouped_map_zscore", "q_udaf_geomean",
                        "q_udtf_tokens"],
        "graph-capstones": ["q_triangle_count", "q_connected_components",
                            "q_pagerank"],
        "streaming-twins": ["q_stream_batch_equiv", "q_stream_dedup",
                            "q_stream_stateful_counts"],
        "cdc": ["q_stream_upsert_cdc", "q_cdc_merge", "q_scd2_history"],
        "text-dedup": ["q_dedup_exact", "q_wordcount", "q_decontaminate"],
        "subqueries": ["q_exists_shiplag", "q_correlated_avg_qty",
                       "q_recursive_cte", "q_lateral_topn"],
        "sketches": ["q_median_exact", "q_approx_quantile", "q_hll_rollup"],
    }
    window = set(DRIVER_WINDOW)
    missing = {
        fam: names
        for fam, names in family_markers.items()
        if not any(n in window for n in names)
    }
    assert not missing, missing


def test_frozen_windows_match_driver_records():
    """The frozen R2–R7 lists must equal what the driver actually
    verified those rounds (CORRECTNESS_r0N.json key sets). R4's record is
    the ordered head of the 58-entry rotation list; R5–R7's are the
    exact ordered windows."""
    r2 = set(json.load(open("/root/repo/CORRECTNESS_r02.json")))
    r3 = set(json.load(open("/root/repo/CORRECTNESS_r03.json")))
    r4 = json.load(open("/root/repo/CORRECTNESS_r04.json"))
    r5 = json.load(open("/root/repo/CORRECTNESS_r05.json"))
    r6 = json.load(open("/root/repo/CORRECTNESS_r06.json"))
    r7 = json.load(open("/root/repo/CORRECTNESS_r07.json"))
    assert r2 == set(DRIVER_WINDOW_R2)
    assert r3 == set(DRIVER_WINDOW_R3)
    assert list(r4) == DRIVER_WINDOW_R4[:50]
    assert list(r5) == DRIVER_WINDOW_R5
    assert list(r6) == DRIVER_WINDOW_R6
    assert list(r7) == DRIVER_WINDOW_R7
    for record in (r4, r5, r6, r7):
        for row in record.values():
            assert (
                row["rows_match"] and row["schema_match"] and row["hash_match"]
            )


def test_rotation_plan_covers_all_queries_exactly_once():
    """driver-green history (r1–r7) + this round's window + the r9
    pending list must cover every registered query — the schedule that
    gets every contract a driver-green CORRECTNESS row. New contracts
    added this round MUST be appended to DRIVER_WINDOW_R9_PENDING (that
    is what keeps this test green). Since the r7 swap the
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
        | set(DRIVER_WINDOW_R7)
    )
    window = set(DRIVER_WINDOW)
    pending = set(DRIVER_WINDOW_R9_PENDING)
    union = verified | window | pending
    assert union >= set(QUERIES), set(QUERIES) - union
    # every name in the r8 window already has a driver-green record —
    # r8 is a pure re-verification round (R8_PENDING stayed empty)
    assert window <= verified
    # new-contract debt never overlaps history or the active window
    assert not (pending & (verified | window))


def test_pending_debt_capped():
    """VERDICT r6 item 3 (renewed r7 item 4): keep registry growth ≤ 6
    per round so the r9 window (3 displaced re-verifies + R2 exclusions
    + r1 leftovers + r3 core head) still clears its tranche on
    schedule."""
    assert len(DRIVER_WINDOW_R9_PENDING) <= 6, (
        "verification debt exceeds the cap — remove or defer new "
        "contracts (VERDICT r6 item 3)"
    )


def test_r9_churn_entries_valid():
    """VERDICT r7 item 4: churn entries must be registered, oracled,
    previously driver-green, and not already re-verifying in the active
    window (else the churn listing is redundant)."""
    churn = list(DRIVER_WINDOW_R9_CHURN)
    assert len(set(churn)) == len(churn)
    assert all(n in QUERIES and n in ORACLES for n in churn)
    assert not set(churn) & set(DRIVER_WINDOW)


def test_r9_prestage_is_valid():
    """VERDICT r7 item 3: the r9 window = R9_PENDING + R9_CHURN + the
    head of the 60-entry R9_REVERIFY tranche (R8_REVERIFY remainder,
    R2's 6 exclusions, the two r1 leftovers q_string_funcs/q_math_funcs
    that were in no tranche, then the r3 streaming/connector core minus
    the r8-churn q_logreg_train). Every entry previously driver-green,
    still registered + oracled, no overlap with the active r8 window,
    and the composed window is a valid 50."""
    r1 = set(json.load(open("/root/repo/CORRECTNESS_r01.json")))
    r2 = set(json.load(open("/root/repo/CORRECTNESS_r02.json")))
    r3 = set(json.load(open("/root/repo/CORRECTNESS_r03.json")))
    tranche = list(DRIVER_WINDOW_R9_REVERIFY)
    assert len(tranche) == 60 and len(set(tranche)) == 60
    assert set(tranche) <= (r1 | r2 | r3)
    assert all(n in QUERIES and n in ORACLES for n in tranche)
    # the two r1 leftovers VERDICT r7 missing-#2 called out are staged
    assert "q_string_funcs" in tranche and "q_math_funcs" in tranche
    # the R8_REVERIFY remainder leads the tranche
    assert tranche[:3] == list(DRIVER_WINDOW_R8_REVERIFY[41:])
    # no overlap with the active r8 window
    assert not set(tranche) & set(DRIVER_WINDOW)
    head = list(DRIVER_WINDOW_R9_PENDING) + list(DRIVER_WINDOW_R9_CHURN)
    assert len(set(head)) == len(head)
    r9_window = head + [n for n in tranche if n not in head][: 50 - len(head)]
    assert len(r9_window) == 50 and len(set(r9_window)) == 50

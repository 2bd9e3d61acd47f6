"""Fleet-wide physical-plan audit: every batch contract query is planned
(not executed) at sf0.01 and checked for join red flags.

- ``CartesianProduct`` is forbidden outright — an unkeyed cross product
  at fact scale is always a bug.
- ``BroadcastNestedLoopJoin`` is allowed only where the query is
  genuinely non-equi (theta/range/all-pairs) or broadcasts a single-row
  aggregate (scalar subquery) — an allowlist; anything new that plans a
  BNLJ must be reviewed and either fixed or added here.

Side-effecting queries (sinks, streaming replays, iterative loops that
execute during construction) are skipped — they have their own tests.
"""

from __future__ import annotations

import pytest

from mapreduce_hw05_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.01"

#: construction executes work (writes, streams, driver loops) — planned
#: elsewhere, skipped here.
SKIP_PREFIXES = (
    "q_stream", "q_custom", "q_compact", "q_zorder", "q_csv",
    "q_json_roundtrip", "q_orc", "q_xml", "q_partitioned", "q_bucketed",
    "q_permissive", "q_schema_evolution", "q_pagerank", "q_kmeans",
    "q_connected", "q_bpe", "q_pca", "q_ann_ivf",
)

#: queries where a BroadcastNestedLoopJoin is the intended plan.
BNLJ_ALLOWED = {
    "q_bigram_pmi",        # single-row corpus-total broadcast
    "q_cross_region_pairs",  # intentional all-pairs (bounded dims)
    "q_domain_mix",        # single-row total broadcast
    "q_fuzzy_name_match",  # non-equi similarity condition
    "q_rolling_dau",       # single-row date-bounds broadcast
    "q_scalar_subquery",   # the scalar-subquery contract itself
    "q_theta_join",        # the theta-join contract itself
    "q_tpch_q22",          # scalar avg-balance subquery
}

_BATCH_QUERIES = sorted(
    name for name in QUERIES if not name.startswith(SKIP_PREFIXES)
)


@pytest.mark.parametrize("name", _BATCH_QUERIES)
def test_no_join_red_flags(spark, name):
    plan = (
        QUERIES[name](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
        raise AssertionError(
            f"{name} plans an unexpected BroadcastNestedLoopJoin — fix the "
            "join condition or allowlist it with a justification"
        )

"""Data-governance and data-quality contract queries.

The privacy passes a training-data pipeline runs before anything ships:
PII redaction (regex scrub, scan-side single pass), k-anonymity
generalization (two-phase aggregate), declarative data-quality
expectations (one-pass conditional aggregation + FK anti-join), plus the
schema-lifecycle surface: union-by-name alignment of heterogeneous
inputs and mergeSchema reads across parquet schema versions.

All pure Catalyst — no Python executes per row; every op is a scan-side
map or a keyed aggregate, so the shapes hold at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_hw05_spark.plans.common import lng, money
from mapreduce_hw05_spark.plans.registry import contract
from mapreduce_hw05_spark.sources import load_table

_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".tmp"
)

_EMAIL_RE = "[a-z0-9]+@[a-z]+\\.[a-z]+"
_PHONE_RE = "\\+1-[0-9]{3}-[0-9]{4}"


@contract(
    "q_redact_pii",
    oracle="""
    WITH lines AS (
        SELECT c_mktsegment,
               concat('contact ', c_name, ' <u', CAST(c_custkey AS VARCHAR),
                      '@example.com> or +1-',
                      lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0'), '-',
                      lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')) AS line
        FROM customer
    ), red AS (
        SELECT c_mktsegment,
               regexp_replace(
                   regexp_replace(line, '[a-z0-9]+@[a-z]+\\.[a-z]+', '[EMAIL]', 'g'),
                   '\\+1-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g') AS redacted
        FROM lines
    )
    SELECT c_mktsegment,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN redacted LIKE '%[EMAIL]%' THEN 1 ELSE 0 END) AS BIGINT) AS n_emails,
           CAST(sum(CASE WHEN redacted LIKE '%[PHONE]%' THEN 1 ELSE 0 END) AS BIGINT) AS n_phones,
           CAST(sum(length(redacted)) AS BIGINT) AS sum_len,
           count(DISTINCT redacted) AS n_distinct
    FROM red GROUP BY c_mktsegment
    """,
)
def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII scrub: deterministic contact lines synthesized from
    customer fields (the fixtures carry no real PII), emails and phone
    numbers replaced by placeholder tags, redaction coverage and a
    length/cardinality checksum aggregated per segment.

    Scan-side single pass — ``regexp_replace`` runs inside whole-stage
    codegen, so at 100 TB this is exactly one read of the corpus with no
    shuffle beyond the tiny per-segment rollup.
    """
    c = load_table(spark, sf_dir, "customer")
    line = F.concat(
        F.lit("contact "),
        F.col("c_name"),
        F.lit(" <u"),
        F.col("c_custkey").cast("string"),
        F.lit("@example.com> or +1-"),
        F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(line, _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    return (
        c.select("c_mktsegment", redacted.alias("redacted"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_rows"),
            lng(
                F.sum(F.when(F.col("redacted").contains("[EMAIL]"), 1).otherwise(0))
            ).alias("n_emails"),
            lng(
                F.sum(F.when(F.col("redacted").contains("[PHONE]"), 1).otherwise(0))
            ).alias("n_phones"),
            lng(F.sum(F.length("redacted"))).alias("sum_len"),
            F.countDistinct("redacted").alias("n_distinct"),
        )
    )


@contract(
    "q_k_anonymity",
    oracle="""
    WITH g1 AS (
        SELECT n_name, c_mktsegment, count(*) AS c
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, c_mktsegment
    ), anon AS (
        SELECT CASE WHEN c < 10 THEN '*' ELSE n_name END AS qi_nation,
               c_mktsegment AS qi_segment, c
        FROM g1
    )
    SELECT qi_nation, qi_segment,
           CAST(sum(c) AS BIGINT) AS n_people,
           count(*) AS n_groups_merged
    FROM anon GROUP BY qi_nation, qi_segment
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity generalization (k=10) over the quasi-identifier pair
    (nation, market segment): groups smaller than k collapse their nation
    into ``*`` and re-aggregate, so every released row describes ≥ k
    people or is explicitly generalized.

    Two keyed aggregates back to back; the second runs on group-level
    rows (bounded by QI cardinality, not data size), so the release step
    costs nothing at scale.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    g1 = (
        # dim-sized: nation
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(F.count("*").alias("c"))
    )
    anon = g1.select(
        F.when(F.col("c") < 10, F.lit("*")).otherwise(F.col("n_name")).alias(
            "qi_nation"
        ),
        F.col("c_mktsegment").alias("qi_segment"),
        "c",
    )
    return anon.groupBy("qi_nation", "qi_segment").agg(
        lng(F.sum("c")).alias("n_people"),
        F.count("*").alias("n_groups_merged"),
    )


@contract(
    "q_dq_expectations",
    oracle="""
    SELECT 'null_custkey' AS check_name,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'nonpositive_totalprice',
           CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'discount_out_of_range',
           CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'quantity_not_positive',
           CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'orphan_lineitem',
           count(*)
    FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    """,
)
def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations: per-table rule violations
    computed in ONE conditional-aggregation pass per table (not one scan
    per rule), plus referential integrity via a left-anti join.

    At 100 TB each fact table is read exactly once for all its column
    rules; the FK check shuffles only the anti-join keys. Output is one
    row per check — the contract a write-audit-publish gate evaluates
    before promoting a batch.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def flag(cond) -> F.Column:
        return lng(F.sum(F.when(cond, 1).otherwise(0)))

    o_checks = orders.agg(
        flag(F.col("o_custkey").isNull()).alias("null_custkey"),
        flag(F.col("o_totalprice") <= 0).alias("nonpositive_totalprice"),
    )
    l_checks = li.agg(
        flag((F.col("l_discount") < 0) | (F.col("l_discount") > 0.5)).alias(
            "discount_out_of_range"
        ),
        flag(F.col("l_quantity") <= 0).alias("quantity_not_positive"),
    )
    orphans = (
        li.join(orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"),
                "left_anti")
        .agg(lng(F.count("*")).alias("orphan_lineitem"))
    )
    melted = (
        o_checks.unpivot([], ["null_custkey", "nonpositive_totalprice"],
                         "check_name", "n_violations")
        .unionByName(
            l_checks.unpivot([], ["discount_out_of_range", "quantity_not_positive"],
                             "check_name", "n_violations")
        )
        .unionByName(
            orphans.unpivot([], ["orphan_lineitem"], "check_name", "n_violations")
        )
    )
    return melted


@contract(
    "q_union_by_name",
    oracle="""
    WITH unified AS (
        SELECT 'customer' AS ent_type, c_custkey AS ent_key,
               c_acctbal AS acctbal, c_mktsegment AS mktsegment,
               CAST(NULL AS INTEGER) AS nationkey
        FROM customer
        UNION ALL
        SELECT 'supplier', s_suppkey, s_acctbal,
               CAST(NULL AS VARCHAR), s_nationkey
        FROM supplier
    )
    SELECT ent_type,
           count(*) AS n_rows,
           round(sum(acctbal), 2) AS sum_bal,
           count(mktsegment) AS n_with_segment,
           count(nationkey) AS n_with_nation
    FROM unified GROUP BY ent_type
    """,
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-aligned union of heterogeneous entity tables via
    ``unionByName(allowMissingColumns=True)`` — each side keeps its own
    columns and the other side's are null-filled, the ingestion shape for
    merging feeds whose schemas drifted apart.

    Union is a zero-shuffle plan node; the null-fill is a metadata
    projection, so alignment is free at any scale.
    """
    c = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("ent_type"),
        F.col("c_custkey").alias("ent_key"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("ent_type"),
        F.col("s_suppkey").alias("ent_key"),
        F.col("s_acctbal").alias("acctbal"),
        F.col("s_nationkey").alias("nationkey"),
    )
    unified = c.unionByName(s, allowMissingColumns=True)
    return unified.groupBy("ent_type").agg(
        F.count("*").alias("n_rows"),
        money(F.sum("acctbal")).alias("sum_bal"),
        F.count("mktsegment").alias("n_with_segment"),
        F.count("nationkey").alias("n_with_nation"),
    )


@contract(
    "q_schema_evolution",
    oracle="""
    SELECT count(*) AS n_rows,
           count(CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END)
               AS n_with_status,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    """,
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution: version-1 files (key, price) and
    version-2 files (key, price, status) written side by side, read back
    as ONE table with ``mergeSchema=true`` — v1 rows surface a null
    status. The oracle replays the same column-availability rule on the
    source table.

    This is how a 100-TB table absorbs an added column without rewriting
    history: old files stay valid, the unified schema is reconciled at
    scan time from footer metadata only.
    """
    orders = load_table(spark, sf_dir, "orders")
    base = os.path.join(_SCRATCH, "schema_evolution")
    v1 = os.path.join(base, "v1")
    v2 = os.path.join(base, "v2")
    orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    ).write.mode("overwrite").parquet(v1)
    orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    ).write.mode("overwrite").parquet(v2)
    merged = spark.read.option("mergeSchema", "true").parquet(v1, v2)
    return merged.agg(
        F.count("*").alias("n_rows"),
        F.count("o_orderstatus").alias("n_with_status"),
        money(F.sum("o_totalprice")).alias("sum_price"),
    )


# --------------------------------------------------------------------------
# gov-ext — l-diversity audit over the k-anonymity quasi-identifiers
# --------------------------------------------------------------------------


@contract(
    "q_l_diversity",
    oracle="""
    WITH rows_s AS (
        SELECT n_name AS qi_nation, c_mktsegment AS qi_segment,
               CAST(floor(c_acctbal / 2000) AS BIGINT) AS sens
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    )
    SELECT qi_nation, qi_segment,
           count(*) AS n_people,
           count(DISTINCT sens) AS n_sensitive_values,
           count(DISTINCT sens) >= 3 AS l3_diverse
    FROM rows_s GROUP BY qi_nation, qi_segment
    """,
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (l=3) over the same quasi-identifier pair as
    q_k_anonymity, with the account-balance band as the sensitive
    attribute: a released group is safe only if it contains at least 3
    distinct sensitive values — the attribute-disclosure check
    k-anonymity alone misses.

    One distinct-aggregate per QI group (two-phase count-distinct
    shuffle); the sensitive band is a deterministic single-op chain
    (÷2000, floor) so the distinct sets are engine-identical.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    # dim-sized: nation
    rows_s = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        F.col("n_name").alias("qi_nation"),
        F.col("c_mktsegment").alias("qi_segment"),
        F.floor(F.col("c_acctbal") / 2000).cast("long").alias("sens"),
    )
    return rows_s.groupBy("qi_nation", "qi_segment").agg(
        F.count("*").alias("n_people"),
        F.countDistinct("sens").alias("n_sensitive_values"),
        (F.countDistinct("sens") >= 3).alias("l3_diverse"),
    )


# --------------------------------------------------------------------------
# gov-ext — differentially-private count release (deterministic Laplace)
# --------------------------------------------------------------------------


@contract(
    "q_dp_noisy_counts",
    oracle="""
    WITH c AS (
        SELECT user_id % 50 AS cohort,
               CAST(count(*) AS BIGINT) AS n_true
        FROM events GROUP BY cohort
    ), seeded AS (
        SELECT cohort, n_true,
               (CAST((cohort * 2654435761 + 12345) % 2147483648 AS DOUBLE)
                / 2147483648.0) - 0.5 AS centered
        FROM c
    )
    SELECT cohort, n_true,
           round(-1.0 * sign(centered) * ln(1.0 - 2.0 * abs(centered)), 9)
               AS noise_q9
    FROM seeded ORDER BY cohort
    """,
)
def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε=1 differentially-private per-cohort event-count release via the
    inverse-CDF Laplace mechanism, with the noise drawn from a
    DETERMINISTIC per-key Knuth-multiplicative PRNG instead of an OS RNG
    — the standard trick for replayable / auditable DP releases (same
    key ⇒ same noise on re-run, so a re-published dashboard doesn't
    leak a fresh sample each refresh). Caller adds ``noise_q9 / ε`` to
    ``n_true``; completes the privacy suite next to k-anonymity
    ([[q_k_anonymity]]) and l-diversity.

    Bit-exact cross-engine: the PRNG is pure BIGINT arithmetic, the
    uniform is one exact-int→double divide, and the Laplace transform
    −sign(u−½)·ln(1−2|u−½|) is a fixed-shape IEEE chain rounded at 9
    decimals only because ln() is ~1 ulp across engines (the PageRank
    rounding discipline). Cohort keys are bounded 0..49, so
    1−2|u−½| ≥ 2⁻³¹ and the noise is finite by construction. At 100 TB
    the plan is one map-side-combinable 50-group aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy((F.col("user_id") % 50).alias("cohort")).agg(
        F.count("*").cast("long").alias("n_true")
    )
    centered = (
        ((F.col("cohort") * 2654435761 + 12345) % 2147483648).cast("double")
        / F.lit(2147483648.0)
    ) - 0.5
    seeded = c.select("cohort", "n_true", centered.alias("centered"))
    noise = -1.0 * F.signum("centered") * F.log(
        1.0 - 2.0 * F.abs(F.col("centered"))
    )
    return seeded.select(
        "cohort", "n_true", F.round(noise, 9).alias("noise_q9")
    ).orderBy("cohort")


# --------------------------------------------------------------------------
# gov-ext — referential-integrity audit across the FK chain
# --------------------------------------------------------------------------


@contract(
    "q_referential_integrity",
    oracle="""
    SELECT 'lineitem.l_orderkey->orders' AS relation,
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_orphans
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           (SELECT CAST(count(*) AS BIGINT) FROM orders),
           CAST(count(*) AS BIGINT)
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           (SELECT CAST(count(*) AS BIGINT) FROM customer),
           CAST(count(*) AS BIGINT)
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM nation n
                      WHERE n.n_nationkey = c.c_nationkey)
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
           CAST(count(*) AS BIGINT)
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM part p
                      WHERE p.p_partkey = l.l_partkey)
    ORDER BY relation
    """,
)
def q_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the four load-bearing FK
    relations of the star schema: row count and orphan count (child keys
    with no parent) per relation — the first gate a warehouse ingest
    runs, complementing the column-level checks in
    [[q_dq_expectations]]. All-zero orphans is the expected fixture
    result; the contract's value is that the plan REPORTS rather than
    assumes it.

    Each orphan probe is one LEFT ANTI join on the key — hash-joinable,
    map-side-combinable counts, and the small parents (nation, customer,
    part at fixture scale) broadcast. Pure integers, no rounding. At
    100 TB each relation is one shuffle (or zero for broadcast-able
    parents); the four audits share nothing and can run as one union
    DAG.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")

    def audit(name, child, child_key, parent, parent_key):
        orphans = child.join(
            parent,
            child[child_key] == parent[parent_key],
            "left_anti",
        ).agg(F.count("*").cast("long").alias("n_orphans"))
        total = child.agg(F.count("*").cast("long").alias("n_rows"))
        return total.crossJoin(orphans).select(
            F.lit(name).alias("relation"), "n_rows", "n_orphans"
        )

    out = (
        audit("lineitem.l_orderkey->orders", li, "l_orderkey",
              orders, "o_orderkey")
        .unionAll(audit("orders.o_custkey->customer", orders, "o_custkey",
                        customer, "c_custkey"))
        .unionAll(audit("customer.c_nationkey->nation", customer,
                        "c_nationkey", nation, "n_nationkey"))
        .unionAll(audit("lineitem.l_partkey->part", li, "l_partkey",
                        part, "p_partkey"))
    )
    return out.orderBy("relation")

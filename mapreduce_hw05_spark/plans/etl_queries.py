"""Table-maintenance / CDC contract queries: upsert MERGE and SCD
type-2 history building over the fixture tables.

The genre's ETL pipelines rebuild snapshots by joining yesterday's
output directory against a delta file in a reduce-side join; these are
the declarative equivalents (one full-outer join; one window pass) —
see :mod:`mapreduce_hw05_spark.operators.cdc` for the scale notes.

The change feed is derived deterministically from ``orders`` (key mod
arithmetic) so the DuckDB oracle can reconstruct it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_hw05_spark.operators.cdc import merge_upsert, scd2_intervals
from mapreduce_hw05_spark.operators.profiling import profile
from mapreduce_hw05_spark.operators.similarity import maybe_broadcast
from mapreduce_hw05_spark.plans.common import lng, money
from mapreduce_hw05_spark.plans.registry import contract
from mapreduce_hw05_spark.sources import dim_broadcast, load_table

# --------------------------------------------------------------------------
# etl-1 (ext) — CDC upsert merge (MERGE INTO semantics)
# --------------------------------------------------------------------------


@contract(
    "q_cdc_merge",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               round(o_totalprice, 2) AS o_totalprice
        FROM orders WHERE o_orderkey % 2 = 0
    ), chg AS (
        SELECT o_orderkey, o_custkey,
               'M' AS o_orderstatus,
               CAST(round(CAST(o_totalprice AS DECIMAL(12,2))
                          * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE)
                   AS o_totalprice,
               CASE WHEN o_orderkey % 12 = 0 THEN 'D' ELSE 'U' END AS op
        FROM orders WHERE o_orderkey % 3 = 0
    )
    SELECT coalesce(b.o_orderkey, c.o_orderkey) AS o_orderkey,
           CASE WHEN c.op IS NOT NULL THEN c.o_custkey
                ELSE b.o_custkey END AS o_custkey,
           CASE WHEN c.op IS NOT NULL THEN c.o_orderstatus
                ELSE b.o_orderstatus END AS o_orderstatus,
           CASE WHEN c.op IS NOT NULL THEN c.o_totalprice
                ELSE b.o_totalprice END AS o_totalprice
    FROM base b FULL JOIN chg c ON b.o_orderkey = c.o_orderkey
    WHERE c.op IS NULL OR c.op <> 'D'
    """,
)
def q_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC feed (upserts + deletes) to an orders snapshot.

    Base = even order keys; feed = keys divisible by 3, re-priced +10%
    and re-statused, with keys divisible by 12 marked for delete — so
    every MERGE path is exercised: update (matched 'U'), insert
    (unmatched 'U'), delete (matched 'D'), pass-through (unmatched
    base). Full merged row set is the contract.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        money(F.col("o_totalprice")).alias("o_totalprice"),
    )
    changes = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("M").alias("o_orderstatus"),
        # Reprice in exact decimal, not double: round(double*1.1) lands on
        # half-cent ties whose direction differs across engines.
        F.round(
            F.col("o_totalprice").cast("decimal(12,2)")
            * F.lit("1.1").cast("decimal(2,1)"),
            2,
        )
        .cast("double")
        .alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 12 == 0, "D").otherwise("U").alias("op"),
    )
    return merge_upsert(base, changes, ["o_orderkey"])


# --------------------------------------------------------------------------
# etl-2 (ext) — SCD type-2 history from a change log
# --------------------------------------------------------------------------


@contract(
    "q_scd2_history",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER w AS prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changed AS (
        SELECT user_id, event_type, ts, event_id
        FROM ordered
        WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id,
           event_type AS state,
           epoch_us(ts) AS valid_from_us,
           epoch_us(lead(ts) OVER w) AS valid_to_us,
           CAST(lead(ts) OVER w IS NULL AS BIGINT) AS is_current
    FROM changed
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 validity intervals of each user's event_type stream:
    consecutive same-state events collapse into one row with
    ``[valid_from, valid_to)`` bounds and a current flag. Timestamps are
    emitted as epoch micros (the repo's hash-stable timestamp form).
    """
    ev = load_table(spark, sf_dir, "events")
    hist = scd2_intervals(
        ev, key="user_id", state_col="event_type", ts_col="ts", tiebreak="event_id"
    )
    return hist.select(
        "user_id",
        "state",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        lng(F.col("is_current").cast("int")).alias("is_current"),
    )


# --------------------------------------------------------------------------
# etl-3 (ext) — one-pass table profiling (data-quality stats per column)
# --------------------------------------------------------------------------

_PROFILE_ORACLE_ROW = """
    SELECT '{c}' AS col_name, count(*) AS n_rows, count({c}) AS n_nonnull,
           count(DISTINCT {c}) AS n_distinct,
           {mn} AS min_num, {mx} AS max_num
    FROM events
"""


def _profile_oracle() -> str:
    rows = []
    for c, numeric in [
        ("event_id", True),
        ("ts", False),
        ("user_id", True),
        ("event_type", False),
        ("value", True),
        ("props", False),
    ]:
        mn = f"CAST(min({c}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        mx = f"CAST(max({c}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        rows.append(_PROFILE_ORACLE_ROW.format(c=c, mn=mn, mx=mx))
    return " UNION ALL ".join(rows)


@contract("q_profile_events", oracle=_profile_oracle())
def q_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null/cardinality/range profile of ``events`` computed
    in ONE aggregate over one scan (the oracle needs six) — the
    data-quality first pass a pipeline runs on every new drop."""
    ev = load_table(spark, sf_dir, "events")
    return profile(ev)


# --------------------------------------------------------------------------
# etl-4 (ext) — stratified hash sampling (training-mix construction)
# --------------------------------------------------------------------------

_MIX_RATES = {"en": 0.5, "zh": 0.25, "de": 0.125}
_MIX_DEFAULT = 0.0625


def _stratified_oracle() -> str:
    from mapreduce_hw05_spark.operators.sampling import (
        stratified_sample_oracle_where,
    )

    where = stratified_sample_oracle_where("lang", "doc_id", _MIX_RATES, _MIX_DEFAULT)
    return f"""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    WHERE {where}
    GROUP BY lang
    """


@contract("q_stratified_sample", oracle=_stratified_oracle())
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Down-sample documents per language at mix rates (en 50%, zh 25%,
    de 12.5%, rest 6.25%) with a content-hash acceptance test — the
    reproducible training-mix sampler. Per-lang count + id/char
    checksums are the contract."""
    from mapreduce_hw05_spark.operators.sampling import stratified_hash_sample

    docs = load_table(spark, sf_dir, "documents")
    sampled = stratified_hash_sample(docs, "lang", "doc_id", _MIX_RATES, _MIX_DEFAULT)
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        lng(F.sum("doc_id")).alias("id_checksum"),
        lng(F.sum("n_chars")).alias("sum_chars"),
    )


# --------------------------------------------------------------------------
# etl-5 (ext) — token-budget sequence packing over document chunks
# --------------------------------------------------------------------------


@contract(
    "q_pack_sequences",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
    ), starts AS (
        SELECT doc_id, lang, t,
               unnest(generate_series(1, greatest(len(t), 1), 40)) AS s
        FROM toks
    ), chunks AS (
        SELECT doc_id, lang,
               CAST((s - 1) // 40 AS BIGINT) AS chunk_idx,
               CAST(len(t[s:least(s + 49, len(t))]) AS BIGINT) AS n_tokens
        FROM starts
    ), binned AS (
        SELECT lang,
               CAST(floor(coalesce(sum(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id, chunk_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / 512) AS BIGINT) AS bin_id,
               n_tokens
        FROM chunks
    )
    SELECT lang, bin_id, count(*) AS n_chunks,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
    FROM binned
    GROUP BY lang, bin_id
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack 50/40 document chunks into 512-token training sequences per
    language: each chunk lands in the bin where its running token total
    starts (contiguous greedy packing, deterministic layout by
    (doc_id, chunk_idx)). Per-bin chunk/token totals are the contract."""
    from mapreduce_hw05_spark.operators.text import chunk_documents, pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    # the doc→lang metadata table is doc-count-sized: counted broadcast
    # routing (r6, same gate as the near-dup size tables)
    chunks = chunk_documents(docs, size=50, stride=40).join(
        maybe_broadcast(docs.select("doc_id", "lang"), docs.count()), "doc_id"
    )
    packed = pack_sequences(
        chunks, budget=512, group_col="lang", order_cols=["doc_id", "chunk_idx"]
    )
    return packed.groupBy("lang", "bin_id").agg(
        F.count("*").alias("n_chunks"),
        lng(F.sum("n_tokens")).alias("bin_tokens"),
    )


# --------------------------------------------------------------------------
# etl-6 (ext) — benchmark decontamination (exact-hash overlap vs held-out)
# --------------------------------------------------------------------------


@contract(
    "q_decontaminate",
    oracle="""
    WITH bench AS (
        SELECT md5(text) AS h FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
    ), train AS (
        SELECT lang, doc_id, md5(text) AS h FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> '0'
    )
    SELECT lang, count(*) AS n_contaminated,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM train
    WHERE h IN (SELECT h FROM bench)
    GROUP BY lang
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs whose exact text hash
    appears in the held-out split (a deterministic ~1/16 hash sample of
    doc ids) counted per language. A real eval suite's hash set is
    fixed-small and the semi-join stays map-side at any corpus size;
    the CONTRACT's held-out split grows 1/16-proportionally with the
    corpus, so the hint is file-stat gated (``dim_broadcast`` on the
    documents footprint) and the same semi join runs shuffled past the
    cap. The fixture corpus has no exact
    duplicate texts at sf0.01, so the empty result's schema/hash is
    itself the contract (same precedent as q_dedup_exact)."""
    docs = load_table(spark, sf_dir, "documents")
    split = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    h = F.md5(F.col("text").cast("binary"))
    bench = docs.filter(split == "0").select(h.alias("h"))
    train = docs.filter(split != "0").select("lang", "doc_id", h.alias("h"))
    return (
        # corpus-split hash set (1/16 OF THE CORPUS, not a fixed eval
        # suite): file-stat gated like the n-gram decontamination pair —
        # past the cap the same semi join runs shuffled, identical rows
        train.join(dim_broadcast(bench, sf_dir, "documents"), "h", "left_semi")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_contaminated"),
            lng(F.sum("doc_id")).alias("id_checksum"),
        )
    )


# --------------------------------------------------------------------------
# etl-7 (ext) — point-in-time join against SCD2 history
# --------------------------------------------------------------------------


@contract(
    "q_pit_join",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER w AS prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), hist AS (
        SELECT user_id, event_type AS state, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to
        FROM ordered
        WHERE prev IS NULL OR prev <> event_type
    ), purchases AS (
        SELECT user_id, value, ts - INTERVAL 1 HOUR AS lookback_ts
        FROM events WHERE event_type = 'purchase'
    )
    SELECT coalesce(h.state, 'none') AS state_1h_before,
           count(*) AS n_purchases,
           round(sum(p.value), 2) AS sum_value
    FROM purchases p
    LEFT JOIN hist h
      ON p.user_id = h.user_id
     AND h.valid_from <= p.lookback_ts
     AND (h.valid_to IS NULL OR p.lookback_ts < h.valid_to)
    GROUP BY 1
    """,
)
def q_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup: each purchase joined to the SCD2
    state interval (operators.cdc.scd2_intervals over the same event
    stream) that was valid one hour before the purchase; purchases
    before the user's first interval fall into 'none'.

    The join is equi on the entity key with the interval predicate as a
    post-join filter — per-key interval counts are small and bounded, so
    this stays an ordinary hash join at 100 TB (never a nested-loop range
    join), and each fact row matches at most one interval.
    """
    ev = load_table(spark, sf_dir, "events")
    hist = scd2_intervals(
        ev, key="user_id", state_col="event_type", ts_col="ts", tiebreak="event_id"
    ).select("user_id", "state", "valid_from", "valid_to")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "value",
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("lookback_ts"),
    )
    p, h = purchases.alias("p"), hist.alias("h")
    joined = p.join(
        h,
        (F.col("p.user_id") == F.col("h.user_id"))
        & (F.col("h.valid_from") <= F.col("p.lookback_ts"))
        & (
            F.col("h.valid_to").isNull()
            | (F.col("p.lookback_ts") < F.col("h.valid_to"))
        ),
        "left",
    )
    return joined.groupBy(
        F.coalesce(F.col("h.state"), F.lit("none")).alias("state_1h_before")
    ).agg(
        F.count("*").alias("n_purchases"),
        money(F.sum("p.value")).alias("sum_value"),
    )


# --------------------------------------------------------------------------
# etl-8 (ext) — incremental rollup maintenance (partial-state merge)
# --------------------------------------------------------------------------


@contract(
    "q_incremental_rollup",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           o_orderstatus,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price,
           max(o_totalprice) AS max_price
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-rollup maintenance: the per-(year, status) aggregate
    is computed as two independent partial-state tables (orders before /
    since 1998-01-01) whose states are merged by re-aggregation — the
    oracle recomputes from scratch, proving merge(partial(A), partial(B))
    ≡ full(A ∪ B).

    Only mergeable states are used (count→sum, sum→sum, max→max), which
    is exactly what lets a 100 TB rollup absorb a daily delta without
    rescanning history.
    """
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            lng(F.year("o_orderdate")).alias("o_year"), "o_orderstatus"
        ).agg(
            F.count("*").alias("n"),
            F.sum("o_totalprice").alias("sp"),
            F.max("o_totalprice").alias("mx"),
        )

    base = partial(o.filter(F.col("o_orderdate") < cutoff))
    delta = partial(o.filter(F.col("o_orderdate") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("o_year", "o_orderstatus")
        .agg(
            lng(F.sum("n")).alias("n_orders"),
            money(F.sum("sp")).alias("sum_price"),
            F.max("mx").alias("max_price"),
        )
    )


# --------------------------------------------------------------------------
# etl-9 (ext) — small-file compaction (content-preserving rewrite)
# --------------------------------------------------------------------------


@contract(
    "q_compact_small_files",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_lines,
           CAST(sum(l_orderkey) AS BIGINT) AS sum_keys,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fragment lineitem into 64 small files, compact the directory back
    to size-derived big files, and aggregate the compacted table — the
    oracle aggregates the original, so compaction must be exactly
    content-preserving (no lost, duplicated, or mutated row survives
    the hash). File-count collapse is asserted by the engine test; here
    the contract is the row multiset."""
    import os as _os

    from mapreduce_hw05_spark.operators.compaction import compact_parquet_dir
    from mapreduce_hw05_spark.plans.io_queries import _scratch_dir

    out = _scratch_dir("compact_demo")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    li.repartition(64).write.mode("overwrite").parquet(out)
    compact_parquet_dir(spark, out, target_bytes=64 * (1 << 20))
    back = spark.read.parquet(out)
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n_lines"),
        lng(F.sum("l_orderkey")).alias("sum_keys"),
        money(F.sum("l_extendedprice")).alias("sum_price"),
    )


# --------------------------------------------------------------------------
# etl-10 (ext) — Z-order clustering rewrite (multi-column data skipping)
# --------------------------------------------------------------------------


@contract(
    "q_zorder_rewrite",
    oracle="""
    SELECT l_linestatus,
           count(*) AS n_lines,
           CAST(sum(l_partkey) AS BIGINT) AS sum_parts,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q_zorder_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rewrite lineitem Z-ordered on (l_partkey, l_suppkey) and
    aggregate the rewritten table — content-equality contract (the
    oracle aggregates the original). The engine test proves the point
    of the rewrite: per-file min/max envelopes tighten in BOTH key
    dimensions, so parquet stats prune scans filtered on either.
    """
    from mapreduce_hw05_spark.operators.zorder import zorder_rewrite
    from mapreduce_hw05_spark.plans.io_queries import _scratch_dir

    out = _scratch_dir("zorder_demo")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_linestatus", "l_quantity"
    )
    zorder_rewrite(li, ["l_partkey", "l_suppkey"], num_files=8).write.mode(
        "overwrite"
    ).parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("l_linestatus").agg(
        F.count("*").alias("n_lines"),
        lng(F.sum("l_partkey")).alias("sum_parts"),
        money(F.sum("l_quantity")).alias("sum_qty"),
    )


# --------------------------------------------------------------------------
# Weighted sampling — Efraimidis–Spirakis without replacement, hash-seeded
# --------------------------------------------------------------------------


@contract(
    "q_weighted_sample",
    oracle="""
    WITH keyed AS (
        SELECT lang, doc_id, n_chars,
               round(pow(
                   (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::UBIGINT
                    + 1) / 4503599627370497.0,
                   1.0 / n_chars), 9) AS sample_key
        FROM documents
    ), topk AS (
        SELECT * FROM keyed ORDER BY sample_key DESC, doc_id LIMIT 100
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM topk GROUP BY lang
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted 100-doc sample without replacement
    (Efraimidis–Spirakis A-Res: largest ``u^(1/w)`` keys win, u =
    hash-uniform of the doc id, w = n_chars), summarized per language.

    Deterministic by construction — the uniform comes from md5(doc_id),
    not rand(), so the SAME sample falls out on any engine, any retry,
    any partitioning; the oracle recomputes the identical keys in SQL
    and must select the identical 100 docs. Longer documents are
    proportionally more likely to be drawn — the importance-sampling
    primitive a token-budget corpus cut needs.
    """
    from mapreduce_hw05_spark.operators.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    top = weighted_sample(docs, "doc_id", "n_chars", 100)
    return top.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        lng(F.sum("doc_id")).alias("id_checksum"),
        lng(F.sum("n_chars")).alias("sum_chars"),
    )


# --------------------------------------------------------------------------
# feat-ext — leave-one-out target encoding of order priority
# --------------------------------------------------------------------------


@contract(
    "q_target_encoding",
    oracle="""
    WITH t AS (
        SELECT o_orderpriority AS cat,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y
        FROM orders
    ), g AS (
        SELECT cat, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS s
        FROM t GROUP BY cat
    ), loo AS (
        SELECT t.cat, g.n, g.s,
               CAST(floor(CAST(g.s - t.y AS DOUBLE) / (g.n - 1))
                    AS BIGINT) AS enc_floor_cents
        FROM t JOIN g ON t.cat = g.cat
    )
    SELECT cat, CAST(any_value(n) AS BIGINT) AS n_rows,
           CAST(any_value(s) AS BIGINT) AS sum_cents,
           CAST(sum(enc_floor_cents) AS BIGINT) AS loo_checksum,
           CAST(min(enc_floor_cents) AS BIGINT) AS loo_min,
           CAST(max(enc_floor_cents) AS BIGINT) AS loo_max
    FROM loo GROUP BY cat ORDER BY cat
    """,
)
def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of order priority against order
    revenue — the standard high-cardinality categorical feature for
    tabular models: each row's encoding is the category's mean target
    EXCLUDING the row itself, (S_cat − y_row)/(n_cat − 1), which kills
    the self-leakage that makes plain mean-encoding overfit. Emitted as
    per-category audit aggregates (row count, exact target sum, and the
    checksum/min/max of the floored per-row encodings) so the contract
    stays small while pinning every row's value.

    Bit-exact: targets are cent-quantized BIGINT, the LOO ratio is one
    exact-int divide and one floor (both engine-identical), and the
    checksum re-sums exact integers. Scale: one category aggregate + a
    broadcast join back to the rows — the same two-pass shape as
    [[q_grouped_map_zscore]]; no per-row Python anywhere.
    """
    orders = load_table(spark, sf_dir, "orders")
    t = orders.select(
        F.col("o_orderpriority").alias("cat"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("y"),
    )
    g = t.groupBy("cat").agg(
        F.count("*").cast("long").alias("n"),
        lng(F.sum("y")).alias("s"),
    )
    # label-sized: one row per o_orderpriority
    loo = t.join(F.broadcast(g), "cat").select(
        "cat",
        "n",
        "s",
        F.floor(
            (F.col("s") - F.col("y")).cast("double") / (F.col("n") - 1)
        )
        .cast("long")
        .alias("enc_floor_cents"),
    )
    return (
        loo.groupBy("cat")
        .agg(
            lng(F.any_value("n")).alias("n_rows"),
            lng(F.any_value("s")).alias("sum_cents"),
            lng(F.sum("enc_floor_cents")).alias("loo_checksum"),
            lng(F.min("enc_floor_cents")).alias("loo_min"),
            lng(F.max("enc_floor_cents")).alias("loo_max"),
        )
        .orderBy("cat")
    )

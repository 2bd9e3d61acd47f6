"""Corpus-construction contract queries — the C4/Gopher-style stages a
pre-training data pipeline runs BETWEEN per-op primitives and the final
shard write: span-level dedup with document reassembly, deterministic
shard assignment + manifest, per-domain token-budget mixing, and
per-language quantile quality filtering.

Everything is pure Catalyst (split/slice/window/groupBy) with
content-hash determinism where sampling/ordering is involved — the same
doc set falls out on any engine, any retry, any partitioning, which is
what lets each stage sit inside a hash-checked contract (and, in
production, inside a resumable pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from mapreduce_hw05_spark.functions.text_analysis import STOPWORDS
from mapreduce_hw05_spark.operators.text import chunk_documents
from mapreduce_hw05_spark.plans.common import lng
from mapreduce_hw05_spark.plans.registry import contract
from mapreduce_hw05_spark.plans.text_analysis_queries import _sql_in
from mapreduce_hw05_spark.sources import load_table

#: Constants shared by the Spark plans and their f-string oracles so the
#: two sides cannot drift.
_SPAN_TOKENS = 20          # span (synthetic "paragraph") width, tokens
_N_SHARDS = 16             # training shards
_TOKEN_BUDGET = 600        # per-source token budget for the mix cut
_KEEP_NUM, _KEEP_DEN = 3, 4  # keep top 3/4 of each language by quality

#: 52-bit exact content hash — both engines compute the identical BIGINT
#: (13 hex chars of md5; see operators/sampling.py on why 52 bits).
_HASH52_SQL = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))"
    "::UBIGINT AS BIGINT)"
)


def _hash52(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 13), 16, 10).cast(
        "long"
    )


# --------------------------------------------------------------------------
# Span-level exact dedup with reassembly (the C4 "three-sentence span"
# pass, over fixed token windows since the fixture has no sentence marks)
# --------------------------------------------------------------------------


@contract(
    "q_paragraph_dedup",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), chunks AS (
        SELECT doc_id,
               CAST((s - 1) // {_SPAN_TOKENS} AS BIGINT) AS chunk_idx,
               array_to_string(
                   t[s:least(s + {_SPAN_TOKENS - 1}, len(t))], ' '
               ) AS chunk_text
        FROM (
            SELECT doc_id, t,
                   unnest(generate_series(1, greatest(len(t), 1),
                                          {_SPAN_TOKENS})) AS s
            FROM toks
        )
    ), ranked AS (
        SELECT doc_id, chunk_idx, chunk_text,
               row_number() OVER (
                   PARTITION BY chunk_text ORDER BY doc_id, chunk_idx
               ) AS rn
        FROM chunks
    ), rebuilt AS (
        SELECT doc_id,
               count(*) AS n_kept,
               string_agg(chunk_text, ' ' ORDER BY chunk_idx)
                   AS cleaned_text
        FROM ranked WHERE rn = 1 GROUP BY doc_id
    ), totals AS (
        SELECT doc_id, count(*) AS n_chunks FROM chunks GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(t.n_chunks AS BIGINT) AS n_chunks,
           CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
           coalesce(r.cleaned_text, '') AS cleaned_text
    FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
    """,
)
def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide span-level exact dedup with document reassembly: every
    doc is split into consecutive {span}-token spans, a span survives only
    at its FIRST corpus occurrence (min (doc_id, chunk_idx)), and each doc
    is rebuilt from its surviving spans in order — C4's repeated-span
    removal, with empty-after-dedup docs kept as '' so the drop is
    observable.

    Scale: one shuffle on the span text (the dedup key — at 100 TB you
    group on xxhash64(span) with the text riding along; the equality key
    here stays the text so the contract is collision-free), then one on
    doc_id for the rebuild. Both aggregations partial-combine map-side;
    nothing is quadratic in corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(
        docs, size=_SPAN_TOKENS, stride=_SPAN_TOKENS
    ).select("doc_id", "chunk_idx", "chunk_text")
    rn = F.row_number().over(
        W.partitionBy("chunk_text").orderBy("doc_id", "chunk_idx")
    )
    kept = chunks.withColumn("rn", rn).filter(F.col("rn") == 1)
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk_text"))),
                lambda s: s.chunk_text,
            ),
            " ",
        ).alias("cleaned_text"),
    )
    totals = chunks.groupBy("doc_id").agg(F.count("*").alias("n_chunks"))
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        lng(F.col("n_chunks")).alias("n_chunks"),
        lng(F.coalesce("n_kept", F.lit(0))).alias("n_kept"),
        F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
    )


# --------------------------------------------------------------------------
# Deterministic shard assignment + manifest
# --------------------------------------------------------------------------


@contract(
    "q_shard_manifest",
    oracle=f"""
    SELECT CAST({_HASH52_SQL} % {_N_SHARDS} AS BIGINT) AS shard_id,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id,
           CAST(max(doc_id) AS BIGINT) AS max_doc_id,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM documents
    GROUP BY 1
    """,
)
def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard manifest: every doc lands in shard
    ``md5_52(doc_id) % {n}`` — content-hash assignment, so shard
    membership survives retries, re-partitioning, and incremental
    re-runs (round-robin / monotonically_increasing_id would not) — with
    per-shard doc/token/char counts, id range, source spread, and an id
    checksum.

    Scale: this IS the 100-TB write path —
    ``df.repartition(n, shard_col).write.partitionBy("shard_id")`` gives
    one writer task per shard and the manifest falls out of the same
    single partial-aggregated shuffle computed here; downstream loaders
    read the manifest instead of listing files.
    """
    docs = load_table(spark, sf_dir, "documents")
    sharded = docs.withColumn(
        "shard_id", _hash52(F.col("doc_id")) % _N_SHARDS
    )
    return sharded.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"),
        lng(F.sum(F.size(F.split("text", " ")))).alias("n_tokens"),
        lng(F.sum("n_chars")).alias("sum_chars"),
        lng(F.min("doc_id")).alias("min_doc_id"),
        lng(F.max("doc_id")).alias("max_doc_id"),
        lng(F.countDistinct("source")).alias("n_sources"),
        lng(F.sum("doc_id")).alias("id_checksum"),
    )


# --------------------------------------------------------------------------
# Per-domain token-budget mix cut
# --------------------------------------------------------------------------


@contract(
    "q_token_budget_mix",
    oracle=f"""
    WITH keyed AS (
        SELECT source, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               {_HASH52_SQL} AS h
        FROM documents
    ), ranked AS (
        SELECT source, doc_id, n_tokens,
               row_number() OVER (
                   PARTITION BY source ORDER BY h, doc_id
               ) AS pick_rank,
               coalesce(sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cum_before
        FROM keyed
    )
    SELECT source, doc_id, n_tokens, CAST(pick_rank AS BIGINT) AS pick_rank
    FROM ranked WHERE cum_before < {_TOKEN_BUDGET}
    """,
)
def q_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture cut: within each source (domain), docs are
    laid out in content-hash order and kept while the running token total
    BEFORE the doc is under the budget — the doc that crosses the
    boundary is kept, then the tap closes. Hash order = a reproducible
    uniform shuffle, so this is "sample ~{b} tokens per domain" with
    zero randomness state; re-running on a grown corpus keeps a stable
    prefix property per domain.

    Scale: one window pass per domain partition (single shuffle on
    source); skewed domains cost one sort of their own rows, never a
    global sort. The 52-bit md5 key makes Spark and the SQL oracle order
    and accumulate bit-identically.
    """
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        _hash52(F.col("doc_id")).alias("h"),
    )
    w = W.partitionBy("source").orderBy("h", "doc_id")
    cum_before = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(W.unboundedPreceding, -1)),
        F.lit(0),
    )
    return (
        keyed.withColumn("pick_rank", F.row_number().over(w).cast("long"))
        .withColumn("cum_before", cum_before)
        .filter(F.col("cum_before") < _TOKEN_BUDGET)
        .select("source", "doc_id", "n_tokens", "pick_rank")
    )


# --------------------------------------------------------------------------
# Per-language quantile quality filter
# --------------------------------------------------------------------------


@contract(
    "q_quality_filter_per_lang",
    oracle=f"""
    WITH per_doc AS (
        SELECT lang, doc_id,
               CAST(floor((0.4 * least(1.0, len(text) / 300.0)
                     + 0.3 * (1.0 - len(list_filter(string_split(text, ' '),
                                   t -> t IN ({_sql_in(STOPWORDS)}))) * 1.0
                              / len(string_split(text, ' ')))
                     + 0.3 * (len(regexp_replace(text, '[^a-z]', '', 'g'))
                              * 1.0 / len(text))) * 1000000)
                    AS BIGINT) AS micro_quality
        FROM documents
    ), ranked AS (
        SELECT lang, doc_id, micro_quality,
               row_number() OVER (
                   PARTITION BY lang ORDER BY micro_quality DESC, doc_id
               ) AS keep_rank,
               count(*) OVER (PARTITION BY lang) AS n
        FROM per_doc
    )
    SELECT lang, doc_id, micro_quality, CAST(keep_rank AS BIGINT) AS keep_rank
    FROM ranked
    WHERE keep_rank <= CAST(floor(({_KEEP_NUM} * n + {_KEEP_DEN - 1})
                                  / {_KEEP_DEN}.0) AS BIGINT)
    """,
)
def q_quality_filter_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style RELATIVE quality gate: rank docs by the blended
    quality score WITHIN each language and keep the top {num}/{den} —
    per-language quantile thresholds, not one global cutoff, so a
    low-resource language is not wiped out by a high-resource one's
    score distribution.

    The threshold is the integer rank bound ceil({num}n/{den}) — no
    floating quantile estimate crosses the engine boundary; the score is
    carried as ``floor(quality * 1e6)`` (an exact scaled integer — the
    raw blend is bit-identical IEEE arithmetic on both engines, while
    ``round(x, 6)`` is NOT: Spark's BigDecimal HALF_UP and DuckDB's
    multiply-then-round disagree 1 ulp under a half boundary, observed
    at sf0.1) with doc_id tiebreak, so ranks are identical on both
    engines. Scale: one window pass per language partition (single
    shuffle on lang); at 100 TB with few languages the same cut runs as
    a two-pass computed-threshold filter (per-lang exact quantile via
    one agg, then a map-only filter) — both expressible from this
    plan's pieces.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop_ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / F.size(
        toks
    )
    blend = (
        F.lit(0.4) * F.least(F.lit(1.0), F.length("text") / F.lit(300.0))
        + F.lit(0.3) * (F.lit(1.0) - stop_ratio)
        + F.lit(0.3)
        * (
            F.length(F.regexp_replace(F.col("text"), "[^a-z]", ""))
            / F.length("text")
        )
    )
    q = docs.select(
        "lang",
        "doc_id",
        F.floor(blend * F.lit(1000000)).cast("long").alias("micro_quality"),
    )
    w = W.partitionBy("lang").orderBy(F.desc("micro_quality"), F.asc("doc_id"))
    n = F.count("*").over(W.partitionBy("lang"))
    bound = F.floor(
        (F.lit(_KEEP_NUM) * n + F.lit(_KEEP_DEN - 1)) / F.lit(float(_KEEP_DEN))
    ).cast("long")
    return (
        q.withColumn("keep_rank", F.row_number().over(w).cast("long"))
        .withColumn("__bound", bound)
        .filter(F.col("keep_rank") <= F.col("__bound"))
        .select("lang", "doc_id", "micro_quality", "keep_rank")
    )


# --------------------------------------------------------------------------
# Feature hashing (the hashing trick) — fixed-width token featurization
# --------------------------------------------------------------------------

_N_FEATURES = 64

_TOKEN_HASH52_SQL = (
    "CAST(('0x' || substr(md5(token), 1, 13)) AS BIGINT)"
)


@contract(
    "q_feature_hashing",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), feats AS (
        SELECT doc_id,
               CAST({_TOKEN_HASH52_SQL} % {_N_FEATURES} AS BIGINT) AS bucket,
               count(*) AS cnt
        FROM toks GROUP BY 1, 2
    )
    SELECT doc_id,
           count(*) AS nnz,
           CAST(sum(cnt) AS BIGINT) AS norm1,
           CAST(sum((bucket + 1) * cnt) AS BIGINT) AS f_checksum
    FROM feats GROUP BY doc_id
    """,
)
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization: every token lands in one of
    {nf} buckets by its 52-bit md5, giving each document a fixed-width
    sparse count vector with NO vocabulary build — the stateless
    featurizer (fastText/Vowpal style) that needs no fit pass, no
    broadcast dictionary, and is retry/partitioning-invariant at 100 TB.
    Emitted per doc as (nnz, L1 norm, position-weighted checksum) so the
    whole vector is hash-pinned without exploding the output.

    The md5-52 key is the repo-wide content-hash convention (52 bits =
    exactly representable; see operators/sampling.py); bucket counts
    and checksums are order-free exact integers — no floats at all.
    """.format(nf=_N_FEATURES)
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    feats = toks.groupBy(
        "doc_id",
        (
            F.conv(F.substring(F.md5(F.col("token")), 1, 13), 16, 10).cast(
                "long"
            )
            % _N_FEATURES
        ).alias("bucket"),
    ).agg(F.count("*").alias("cnt"))
    return feats.groupBy("doc_id").agg(
        F.count("*").alias("nnz"),
        lng(F.sum("cnt")).alias("norm1"),
        lng(F.sum((F.col("bucket") + 1) * F.col("cnt"))).alias("f_checksum"),
    )


# --------------------------------------------------------------------------
# Epoch-mixture plan — per-domain repeat factors toward a token budget
# --------------------------------------------------------------------------


@contract(
    "q_epoch_mixture_plan",
    oracle="""
    WITH domain_tokens AS (
        SELECT source,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
               count(*) AS n_docs
        FROM documents GROUP BY source
    ), budget AS (
        SELECT CAST(sum(n_tokens) // 2 AS BIGINT) AS total_budget,
               count(*) AS n_domains
        FROM domain_tokens
    )
    SELECT d.source,
           d.n_docs,
           d.n_tokens,
           CAST(b.total_budget // b.n_domains AS BIGINT) AS target_tokens,
           CAST(least(4000,
               (b.total_budget // b.n_domains) * 1000 // d.n_tokens
           ) AS BIGINT) AS milli_epochs,
           CAST(d.n_tokens * least(4000,
               (b.total_budget // b.n_domains) * 1000 // d.n_tokens
           ) // 1000 AS BIGINT) AS planned_tokens
    FROM domain_tokens d CROSS JOIN budget b
    """,
)
def q_epoch_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing recipe: give every domain an equal share of a
    half-corpus token budget and express it as a repeat (epoch) factor
    capped at 4× — the up/down-sampling plan a pretraining run computes
    before q_token_budget_mix does the per-document cut.

    Pure integer arithmetic end to end (milli-epoch fixed point,
    engine-identical integer division), so every cell is exact. One
    token-counting aggregate per domain + a 1-row budget broadcast; the
    plan table is domains-sized.
    """
    docs = load_table(spark, sf_dir, "documents")
    domain_tokens = docs.groupBy("source").agg(
        lng(F.sum(F.size(F.split(F.col("text"), " ")))).alias("n_tokens"),
        F.count("*").alias("n_docs"),
    )
    budget = domain_tokens.agg(
        F.expr("CAST(sum(n_tokens) div 2 AS BIGINT)").alias("total_budget"),
        F.count("*").alias("n_domains"),
    )
    # one-row: global budget aggregate
    j = domain_tokens.crossJoin(F.broadcast(budget))
    target = F.expr("total_budget div n_domains")
    milli = F.least(
        F.lit(4000).cast("long"),
        F.expr("(total_budget div n_domains) * 1000 div n_tokens"),
    )
    return j.select(
        "source",
        "n_docs",
        "n_tokens",
        target.cast("long").alias("target_tokens"),
        milli.cast("long").alias("milli_epochs"),
    ).withColumn(
        "planned_tokens",
        F.expr("CAST(n_tokens * milli_epochs div 1000 AS BIGINT)"),
    )


# --------------------------------------------------------------------------
# Span-corruption masking — deterministic T5-style objective prep
# --------------------------------------------------------------------------

_POS_HASH52_SQL = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' "
    "|| CAST(pos AS VARCHAR)), 1, 13)) AS BIGINT)"
)


@contract(
    "q_span_corruption",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, s.pos AS pos, s.token AS token
        FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       string_split(text, ' '),
                       (t, i) -> struct_pack(pos := i, token := t)
                   )) AS s
            FROM documents
        )
    ), starts AS (
        SELECT doc_id, pos
        FROM toks
        WHERE {_POS_HASH52_SQL} % 15 = 0
    ), masked AS (
        SELECT DISTINCT s.doc_id, s.pos + k.off AS pos
        FROM starts s, (SELECT unnest([0, 1, 2]) AS off) k
    ), flags AS (
        SELECT t.doc_id, t.token,
               CASE WHEN m.pos IS NOT NULL THEN 1 ELSE 0 END AS is_masked
        FROM toks t
        LEFT JOIN masked m ON t.doc_id = m.doc_id AND t.pos = m.pos
    ), spans AS (
        SELECT doc_id, count(*) AS n_spans FROM starts GROUP BY doc_id
    )
    SELECT f.doc_id,
           count(*) AS n_tokens,
           CAST(sum(f.is_masked) AS BIGINT) AS n_masked,
           CAST(coalesce(any_value(s.n_spans), 0) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN f.is_masked = 0 THEN
               CAST(('0x' || substr(md5(f.token), 1, 13)) AS BIGINT)
           END) AS BIGINT) AS visible_checksum
    FROM flags f LEFT JOIN spans s ON f.doc_id = s.doc_id
    GROUP BY f.doc_id
    """,
)
def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption, deterministically: a span of 3 tokens
    is masked wherever md5₅₂(doc:pos) % 15 = 0 (≈20 % corruption rate),
    overlapping spans merge, and each document emits its visible-token
    checksum — the objective-preparation transform a denoising
    pretraining pipeline applies, made retry/partition-invariant by
    content hashing (no rand()).

    Map-side throughout: positions come from one explode, span
    expansion is a 3-element unnest, and the mask join is keyed on
    (doc, pos) — the only shuffles are token-sized dedup/aggregate on
    the doc key. Checksums are order-free BIGINT sums of 52-bit token
    hashes; no floats.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("p0", "token")
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "token")
    pos_hash = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("pos").cast("string"),
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    starts = toks.filter(pos_hash % 15 == 0).select("doc_id", "pos")
    masked = (
        starts.select(
            "doc_id",
            F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("off"),
            "pos",
        )
        .select("doc_id", (F.col("pos") + F.col("off")).alias("pos"))
        .distinct()
        .withColumn("is_masked", F.lit(1))
    )
    flags = toks.join(masked, ["doc_id", "pos"], "left").select(
        "doc_id",
        "token",
        F.coalesce(F.col("is_masked"), F.lit(0)).alias("is_masked"),
    )
    spans = starts.groupBy("doc_id").agg(F.count("*").alias("n_spans"))
    tok_hash = F.conv(F.substring(F.md5(F.col("token")), 1, 13), 16, 10).cast(
        "long"
    )
    return (
        flags.join(spans, "doc_id", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            lng(F.sum("is_masked")).alias("n_masked"),
            F.coalesce(F.any_value("n_spans"), F.lit(0))
            .cast("long")
            .alias("n_spans"),
            lng(
                F.sum(F.when(F.col("is_masked") == 0, tok_hash))
            ).alias("visible_checksum"),
        )
    )

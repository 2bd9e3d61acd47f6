"""Contract queries for the text-analysis surface (driver-mandated
training-data-pipeline ops): language ID, quality scoring, token
counting, document fingerprinting, SimHash.

All five stay pure Catalyst (split/filter/regexp/md5 inside whole-stage
codegen) — at 100 TB these run at scan throughput with one hash-partition
shuffle for the final per-key aggregate. The oracle SQL strings are
GENERATED from the same constants (``LANG_PROFILES``/``STOPWORDS``) so the
two sides can never drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mapreduce_hw05_spark.functions.text_analysis import (
    LANG_PROFILES,
    STOPWORDS,
    char_ngram_fingerprint,
    language_scores,
    predict_language,
    quality_metrics,
    simhash16,
    simhash16_oracle_sql,
    token_counts,
)
from mapreduce_hw05_spark.operators.text import tokenize
from mapreduce_hw05_spark.plans.common import lng, ratio, spread_small
from mapreduce_hw05_spark.plans.registry import contract
from mapreduce_hw05_spark.sources import dim_broadcast, load_table

# --------------------------------------------------------------------------
# Language identification — confusion counts actual×predicted
# --------------------------------------------------------------------------


def _sql_in(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def _language_id_oracle() -> str:
    langs = sorted(LANG_PROFILES)
    score_exprs = ",\n               ".join(
        f"sum(CASE WHEN token IN ({_sql_in(LANG_PROFILES[lang])}) THEN 1 ELSE 0 END)"
        f" * 1.0 / count(*) AS score_{lang}"
        for lang in langs
    )
    greatest = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    case = (
        "CASE "
        + " ".join(f"WHEN score_{lang} = {greatest} THEN '{lang}'" for lang in langs)
        + " END"
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), scores AS (
        SELECT doc_id, any_value(lang) AS lang,
               {score_exprs}
        FROM toks GROUP BY doc_id
    )
    SELECT lang, {case} AS predicted_lang, count(*) AS n_docs
    FROM scores
    GROUP BY lang, predicted_lang
    """


@contract("q_language_id", oracle=_language_id_oracle())
def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID: confusion counts (actual × predicted).

    argmax of per-language stopword-hit ratio, ties to the alphabetically
    first language (deterministic, SQL-replicable). One explode + one
    doc-key aggregate — linear, partial-agg friendly.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(docs, "text", "doc_id", "lang")
    scored = language_scores(toks, "doc_id")
    actual = docs.select("doc_id", "lang")
    pred = predict_language(scored, "doc_id").join(actual, "doc_id")
    return pred.groupBy("lang", "predicted_lang").agg(F.count("*").alias("n_docs"))


# --------------------------------------------------------------------------
# Quality scoring — per-language aggregate of the per-doc heuristics
# --------------------------------------------------------------------------


def _quality_oracle() -> str:
    stop_in = _sql_in(STOPWORDS)
    return f"""
    WITH per_doc AS (
        SELECT lang,
               round(least(1.0, len(text) / 300.0), 6) AS length_score,
               round(len(list_filter(string_split(text, ' '),
                         t -> t IN ({stop_in}))) * 1.0
                     / len(string_split(text, ' ')), 6) AS stopword_ratio,
               round((len(text) - (len(string_split(text, ' ')) - 1)) * 1.0
                     / len(string_split(text, ' ')), 6) AS mean_token_len,
               round(len(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0
                     / len(text), 6) AS alpha_ratio,
               round(0.4 * least(1.0, len(text) / 300.0)
                     + 0.3 * (1.0 - len(list_filter(string_split(text, ' '),
                                   t -> t IN ({stop_in}))) * 1.0
                              / len(string_split(text, ' ')))
                     + 0.3 * (len(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0
                              / len(text)), 6) AS quality
        FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           round(avg(length_score), 4) AS avg_length_score,
           round(avg(stopword_ratio), 4) AS avg_stopword_ratio,
           round(avg(mean_token_len), 4) AS avg_mean_token_len,
           round(avg(alpha_ratio), 4) AS avg_alpha_ratio,
           round(avg(quality), 4) AS avg_quality,
           CAST(sum(CASE WHEN quality >= 0.7 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_high_quality
    FROM per_doc
    GROUP BY lang
    """


@contract("q_quality_score", oracle=_quality_oracle())
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-quality profile (length / stopword / alpha
    heuristics blended into a [0,1] score) + high-quality doc count."""
    docs = load_table(spark, sf_dir, "documents")
    q = quality_metrics(docs, "text")
    return q.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("length_score"), 4).alias("avg_length_score"),
        F.round(F.avg("stopword_ratio"), 4).alias("avg_stopword_ratio"),
        F.round(F.avg("mean_token_len"), 4).alias("avg_mean_token_len"),
        F.round(F.avg("alpha_ratio"), 4).alias("avg_alpha_ratio"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
        lng(F.sum(F.when(F.col("quality") >= 0.7, 1).otherwise(0))).alias(
            "n_high_quality"
        ),
    )


# --------------------------------------------------------------------------
# Token counting — whitespace vs regex-word tokenizers, per source
# --------------------------------------------------------------------------


@contract(
    "q_token_stats",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
           CAST(sum(len(regexp_extract_all(text, '[a-z]+'))) AS BIGINT)
               AS total_word_tokens,
           CAST(sum(len(text)) AS BIGINT) AS total_chars,
           round(avg(len(string_split(text, ' '))), 6) AS avg_ws_tokens
    FROM documents
    GROUP BY source
    """,
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count battery per source: whitespace tokenizer vs regex word
    tokenizer vs raw chars. The BPE-ish regex count and the whitespace
    count bracket a real tokenizer's output."""
    docs = load_table(spark, sf_dir, "documents")
    counted = token_counts(docs, "text")
    return counted.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        lng(F.sum("n_ws_tokens")).alias("total_ws_tokens"),
        lng(F.sum("n_word_tokens")).alias("total_word_tokens"),
        lng(F.sum("n_chars_measured")).alias("total_chars"),
        ratio(F.avg("n_ws_tokens")).alias("avg_ws_tokens"),
    )


# --------------------------------------------------------------------------
# Document fingerprinting — shared min-8-gram winnowing fingerprints
# --------------------------------------------------------------------------


@contract(
    "q_fingerprint_groups",
    oracle="""
    WITH grams AS (
        SELECT doc_id, unnest(generate_series(1, len(text) - 7)) AS i, text
        FROM documents
    ), fps AS (
        SELECT doc_id, min(md5(substring(text, i, 8))) AS fingerprint
        FROM grams GROUP BY doc_id
    )
    SELECT fingerprint, count(*) AS n_docs
    FROM fps
    GROUP BY fingerprint
    HAVING count(*) > 1
    """,
)
def q_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style fingerprint collisions: documents sharing a minimum
    char-8-gram md5 — the cheap first pass of containment detection.
    The per-doc fingerprint is MAP-ONLY (``array_min(transform(...))`` —
    no explode, no per-doc aggregate; see char_ngram_fingerprint's
    docstring for the r6 explode-blowup story), so the only shuffle is
    the final count-per-fingerprint group-by, which partial-aggregates
    to one skinny row per distinct fingerprint."""
    docs = load_table(spark, sf_dir, "documents")
    fps = char_ngram_fingerprint(docs, "text", "doc_id", n=8)
    return (
        fps.groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


# --------------------------------------------------------------------------
# SimHash — 16-bit fingerprint per document (near-dup building block)
# --------------------------------------------------------------------------


@contract("q_simhash", oracle=simhash16_oracle_sql())
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level 16-bit SimHash from md5 token votes (bit-identical to the
    DuckDB oracle). The production variant is the same construction at 64
    bits over xxhash64; Hamming-ball lookup then buckets by bit-masked
    prefixes rather than comparing all pairs."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(docs, "text", "doc_id")
    return simhash16(toks, "doc_id")


# --------------------------------------------------------------------------
# SimHash near-dup: identical-fingerprint pairs via bucket join
# --------------------------------------------------------------------------


@contract(
    "q_simhash_near_dup",
    oracle=f"""
    WITH sims AS ({simhash16_oracle_sql()})
    SELECT a.doc_id AS id1, b.doc_id AS id2, a.simhash
    FROM sims a JOIN sims b
      ON a.simhash = b.simhash AND a.doc_id < b.doc_id
    """,
)
def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs = documents with IDENTICAL SimHash.

    This is the scale form of SimHash dedup: a self-join keyed on the
    fingerprint (bucket join), never all-pairs. The Hamming-ball variant
    (distance ≤ k) buckets on k+1 disjoint fingerprint segments — by
    pigeonhole any pair within distance k collides on at least one
    segment — then verifies bit_count(xor) on candidates only.
    """
    docs = load_table(spark, sf_dir, "documents")
    sims = simhash16(tokenize(docs, "text", "doc_id"), "doc_id")
    a = sims.withColumnRenamed("doc_id", "id1")
    b = sims.withColumnRenamed("doc_id", "id2")
    return (
        a.join(b, "simhash")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "simhash")
    )


# --------------------------------------------------------------------------
# Document chunking — fixed-size token windows with overlap (pre-training
# chunking pass; size 50, stride 40)
# --------------------------------------------------------------------------


@contract(
    "q_chunk_documents",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), starts AS (
        SELECT doc_id, t,
               unnest(generate_series(1, greatest(len(t), 1), 40)) AS s
        FROM toks
    )
    SELECT doc_id,
           CAST((s - 1) // 40 AS BIGINT) AS chunk_idx,
           array_to_string(t[s:least(s + 49, len(t))], ' ') AS chunk_text,
           CAST(len(t[s:least(s + 49, len(t))]) AS BIGINT) AS n_tokens
    FROM starts
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document split into 50-token chunks at stride 40 (10-token
    overlap); full chunk text is the contract so windowing, ordering,
    and tail handling all hash-match."""
    from mapreduce_hw05_spark.operators.text import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, size=50, stride=40)


# --------------------------------------------------------------------------
# Fuzzy string matching — edit-distance near-dup over distinct names
# --------------------------------------------------------------------------


@contract(
    "q_fuzzy_name_match",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a,
           b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM names a JOIN names b ON a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def q_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct part-name pairs within Levenshtein distance 3 — the
    edit-distance member of the dedup family (exact / MinHash / SimHash /
    n-gram / embedding / fuzzy).

    The pair space is deduped-key-sized, not row-sized: distinct names
    first (one shuffle), then a broadcast self-join. Name cardinality,
    not row count, bounds the quadratic term — but TPC-H part names are
    near-unique, so the hint is file-stat gated on the part table's
    footprint; past the cap the same inequality join runs as a
    partitioned cartesian (grindable compute instead of an executor-OOM
    broadcast). For high-cardinality keys the LSH/banding operators are
    the scale path instead.
    """
    part = load_table(spark, sf_dir, "part")
    names = part.select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    dist = F.levenshtein("name_a", "name_b")
    return (
        # key-cardinality-proportional: file-stat gated on the part table
        a.join(
            dim_broadcast(b, sf_dir, "part"),
            F.col("name_a") < F.col("name_b"),
        )
        .filter(dist <= 3)
        .select("name_a", "name_b", lng(dist).alias("dist"))
    )


# --------------------------------------------------------------------------
# Repetition / boilerplate scoring — top-token concentration per document
# --------------------------------------------------------------------------


@contract(
    "q_repetition_score",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), cnts AS (
        SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
    ), per_doc AS (
        SELECT doc_id, round(max(c) * 1.0 / sum(c), 6) AS rep_ratio
        FROM cnts GROUP BY doc_id
    )
    SELECT d.lang,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN p.rep_ratio >= 0.2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_repetitive,
           round(avg(p.rep_ratio), 6) AS avg_rep_ratio
    FROM per_doc p JOIN documents d ON p.doc_id = d.doc_id
    GROUP BY d.lang
    """,
)
def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition scoring for training-data quality: each document's
    top-token concentration (most frequent token count / total tokens),
    aggregated per language with a ≥0.2 'repetitive' flag.

    Two hash aggregates over the exploded token stream — scan-bound at
    scale, same shape as wordcount. The ratio is rounded BEFORE the
    threshold test on both engines so the flag itself is hash-stable.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(docs, "text", "doc_id")
    cnts = toks.groupBy("doc_id", "token").agg(F.count("*").alias("c"))
    per_doc = cnts.groupBy("doc_id").agg(
        F.round((F.max("c") * F.lit(1.0)) / F.sum("c"), 6).alias("rep_ratio")
    )
    joined = per_doc.join(docs.select("doc_id", "lang"), "doc_id")
    return joined.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        lng(F.sum((F.col("rep_ratio") >= 0.2).cast("int"))).alias("n_repetitive"),
        ratio(F.avg("rep_ratio")).alias("avg_rep_ratio"),
    )


# --------------------------------------------------------------------------
# Token-distribution entropy — vocabulary diversity per source
# --------------------------------------------------------------------------


@contract(
    "q_token_entropy",
    oracle="""
    WITH toks AS (
        SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
    ), cnts AS (
        SELECT source, token, count(*) AS c
        FROM toks WHERE token <> '' GROUP BY source, token
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS distinct_tokens,
           CAST(sum(c) AS BIGINT) AS total_tokens,
           round(count(*) * 1.0 / sum(c), 6) AS type_token_ratio,
           round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) AS entropy_bits
    FROM cnts GROUP BY source
    """,
)
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each source's token distribution plus
    type-token ratio — the corpus-diversity diagnostic a training-data
    pipeline uses to catch template/boilerplate-heavy sources (low
    entropy) before mixing.

    One exploded-token aggregate then one per-source aggregate; entropy
    uses the single-pass identity H = log2(N) - Σc·log2(c)/N so no total
    needs to be joined back. The oracle uses the SAME identity so both
    engines accumulate the identical float shape (rounded at 6).
    """
    docs = load_table(spark, sf_dir, "documents")
    cnts = (
        tokenize(docs, "text", "source")
        .filter(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count("*").alias("c"))
    )
    return cnts.groupBy("source").agg(
        lng(F.count("*")).alias("distinct_tokens"),
        lng(F.sum("c")).alias("total_tokens"),
        ratio(F.count("*") * F.lit(1.0) / F.sum("c")).alias("type_token_ratio"),
        ratio(
            F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c")
        ).alias("entropy_bits"),
    )


# --------------------------------------------------------------------------
# Bigram collocations by PMI — phrase mining over the corpus
# --------------------------------------------------------------------------


@contract(
    "q_bigram_pmi",
    oracle="""
    WITH s AS (
        SELECT string_split(text, ' ') AS w FROM documents
    ), zipped AS (
        SELECT unnest(list_zip(w, w[2:])) AS pr FROM s
    ), big AS (
        SELECT pr[1] AS w1, pr[2] AS w2 FROM zipped WHERE pr[2] IS NOT NULL
    ), bc AS (
        SELECT w1, w2, count(*) AS pair_n FROM big GROUP BY w1, w2
    ), uni AS (
        SELECT w1 AS tok, count(*) AS n FROM big GROUP BY w1
    ), tot AS (
        SELECT sum(pair_n) AS n FROM bc
    )
    SELECT w1, w2, CAST(pair_n AS BIGINT) AS pair_n,
           round(log2((pair_n / tot.n) / ((u1.n / tot.n) * (u2.n / tot.n))), 6)
               AS pmi
    FROM bc, tot
    JOIN uni u1 ON bc.w1 = u1.tok
    JOIN uni u2 ON bc.w2 = u2.tok
    WHERE pair_n >= 20
    ORDER BY pmi DESC, w1, w2
    LIMIT 15
    """,
)
def q_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-15 adjacent-word bigrams by pointwise
    mutual information (min support 20) — the phrase-detection pass a
    tokenizer-training pipeline runs before BPE merges.

    Bigrams come from one Catalyst ``transform(sequence(...))`` over the
    split array (no self-join on position); unigram marginals count
    first-element occurrences on BOTH engines (so the inner join drops
    identical pairs), and the bigram grand total arrives via a broadcast
    one-row crossJoin, never a collect. Ordered by the ROUNDED pmi with a
    (w1, w2) tiebreak so the top-15 cut is engine-stable.
    """
    docs = load_table(spark, sf_dir, "documents")
    big = (
        spread_small(docs)
        .select(F.split("text", " ").alias("w"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 2),"
                    " i -> struct(w[i] AS w1, w[i + 1] AS w2))"
                )
            ).alias("pr")
        )
        .select("pr.w1", "pr.w2")
    )
    bc = big.groupBy("w1", "w2").agg(F.count("*").alias("pair_n"))
    uni = big.groupBy(F.col("w1").alias("tok")).agg(F.count("*").alias("n"))
    tot = bc.agg(F.sum("pair_n").alias("total_n"))
    pmi = (
        F.col("pair_n") / F.col("total_n")
        / ((F.col("n1") / F.col("total_n")) * (F.col("n2") / F.col("total_n")))
    )
    return (
        bc.filter(F.col("pair_n") >= 20)
        # vocab-sized: unigram count table
        .join(F.broadcast(uni.select(F.col("tok"), F.col("n").alias("n1"))),
              F.col("w1") == F.col("tok")).drop("tok")
        # vocab-sized: unigram count table
        .join(F.broadcast(uni.select(F.col("tok"), F.col("n").alias("n2"))),
              F.col("w2") == F.col("tok")).drop("tok")
        # one-row: grand total
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", lng(F.col("pair_n")).alias("pair_n"),
                ratio(F.log2(pmi)).alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(15)
    )


# --------------------------------------------------------------------------
# Naive Bayes language classifier — train on 4/5 of the corpus, score the
# held-out fifth, report the actual×predicted confusion matrix
# --------------------------------------------------------------------------


@contract(
    "q_nb_classify",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), train AS (
        SELECT * FROM toks WHERE doc_id % 5 <> 0
    ), vocab AS (
        SELECT DISTINCT token FROM train
    ), vsize AS (
        SELECT count(*) AS v FROM vocab
    ), class_docs AS (
        SELECT lang, count(DISTINCT doc_id) AS nd FROM train GROUP BY lang
    ), ndocs AS (
        SELECT sum(nd) AS n FROM class_docs
    ), tok_counts AS (
        SELECT lang, token, count(*) AS c FROM train GROUP BY lang, token
    ), class_tokens AS (
        SELECT lang, sum(c) AS nt FROM tok_counts GROUP BY lang
    ), priors AS (
        SELECT cd.lang,
               ln(cd.nd * 1.0 / (SELECT n FROM ndocs)) AS log_prior,
               ln(1.0 / (ct.nt + (SELECT v FROM vsize))) AS default_ll
        FROM class_docs cd JOIN class_tokens ct ON cd.lang = ct.lang
    ), lik AS (
        SELECT tc.lang, tc.token,
               ln((tc.c + 1.0) / (ct.nt + (SELECT v FROM vsize))) AS ll
        FROM tok_counts tc JOIN class_tokens ct ON tc.lang = ct.lang
    ), tf AS (
        SELECT doc_id, token, count(*) AS f
        FROM toks WHERE doc_id % 5 = 0
        GROUP BY doc_id, token
    ), tf_known AS (
        SELECT * FROM tf WHERE token IN (SELECT token FROM vocab)
    ), scores AS (
        SELECT t.doc_id, p.lang,
               p.log_prior + sum(t.f * coalesce(l.ll, p.default_ll)) AS score
        FROM tf_known t
        CROSS JOIN priors p
        LEFT JOIN lik l ON l.lang = p.lang AND l.token = t.token
        GROUP BY t.doc_id, p.lang, p.log_prior
    ), pred AS (
        SELECT doc_id, lang AS pred
        FROM scores
        QUALIFY row_number()
            OVER (PARTITION BY doc_id ORDER BY round(score, 6) DESC, lang) = 1
    )
    SELECT d.lang, p.pred, count(*) AS n_docs,
           CAST(sum(d.doc_id) AS BIGINT) AS id_checksum
    FROM pred p JOIN documents d ON p.doc_id = d.doc_id
    GROUP BY d.lang, p.pred
    """,
)
def q_nb_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language ID: fit on docs with
    doc_id %5 ≠ 0 (Laplace α=1), score the held-out fifth, emit the
    actual×predicted confusion matrix with an exact id checksum.

    The fastText-shaped classify stage of a pretraining pipeline run as
    two token-stream aggregates plus a broadcast model join
    (operators.naive_bayes). Per-class scores are argmaxed on
    round(score, 6) with the class label as tiebreak — the same
    round-before-order discipline as q_pagerank — so the emitted matrix
    is integers only. Documents whose tokens are all out-of-vocabulary
    drop out identically on both engines.
    """
    from pyspark.sql import Window

    from mapreduce_hw05_spark.operators.naive_bayes import nb_fit, nb_score

    docs = load_table(spark, sf_dir, "documents")
    train = tokenize(
        docs.filter(F.col("doc_id") % 5 != 0), "text", "doc_id", "lang"
    ).select("doc_id", F.col("lang").alias("label"), "token")
    priors, lik = nb_fit(train)
    test = tokenize(docs.filter(F.col("doc_id") % 5 == 0), "text", "doc_id")
    scores = nb_score(test, priors, lik)
    w = Window.partitionBy("doc_id").orderBy(
        F.round(F.col("score"), 6).desc(), F.col("label")
    )
    pred = (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("label").alias("pred"))
    )
    return (
        pred.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "pred")
        .agg(
            F.count("*").alias("n_docs"),
            lng(F.sum("doc_id")).alias("id_checksum"),
        )
    )


# --------------------------------------------------------------------------
# NB evaluation — exact Mann–Whitney AUC of the 'en' one-vs-rest score
# --------------------------------------------------------------------------


@contract(
    "q_nb_auc",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), train AS (
        SELECT * FROM toks WHERE doc_id % 5 <> 0
    ), vocab AS (
        SELECT DISTINCT token FROM train
    ), vsize AS (
        SELECT count(*) AS v FROM vocab
    ), class_docs AS (
        SELECT lang, count(DISTINCT doc_id) AS nd FROM train GROUP BY lang
    ), ndocs AS (
        SELECT sum(nd) AS n FROM class_docs
    ), tok_counts AS (
        SELECT lang, token, count(*) AS c FROM train GROUP BY lang, token
    ), class_tokens AS (
        SELECT lang, sum(c) AS nt FROM tok_counts GROUP BY lang
    ), priors AS (
        SELECT cd.lang,
               ln(cd.nd * 1.0 / (SELECT n FROM ndocs)) AS log_prior,
               ln(1.0 / (ct.nt + (SELECT v FROM vsize))) AS default_ll
        FROM class_docs cd JOIN class_tokens ct ON cd.lang = ct.lang
    ), lik AS (
        SELECT tc.lang, tc.token,
               ln((tc.c + 1.0) / (ct.nt + (SELECT v FROM vsize))) AS ll
        FROM tok_counts tc JOIN class_tokens ct ON tc.lang = ct.lang
    ), tf AS (
        SELECT doc_id, token, count(*) AS f
        FROM toks WHERE doc_id % 5 = 0
        GROUP BY doc_id, token
    ), tf_known AS (
        SELECT * FROM tf WHERE token IN (SELECT token FROM vocab)
    ), scores AS (
        SELECT t.doc_id, p.lang,
               round(p.log_prior
                     + sum(t.f * coalesce(l.ll, p.default_ll)), 6) AS s
        FROM tf_known t
        CROSS JOIN priors p
        LEFT JOIN lik l ON l.lang = p.lang AND l.token = t.token
        WHERE p.lang = 'en'
        GROUP BY t.doc_id, p.lang, p.log_prior
    ), labeled AS (
        SELECT sc.s,
               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
        FROM scores sc JOIN documents d ON sc.doc_id = d.doc_id
    ), ranked AS (
        SELECT y,
               rank() OVER (ORDER BY s)
               + (count(*) OVER (PARTITION BY s) - 1) / 2.0 AS midrank
        FROM labeled
    )
    SELECT CAST(sum(y) AS BIGINT) AS n_pos,
           CAST(sum(1 - y) AS BIGINT) AS n_neg,
           (sum(CASE WHEN y = 1 THEN midrank ELSE 0 END)
            - sum(y) * (sum(y) + 1.0) / 2)
           / (sum(y) * CAST(sum(1 - y) AS DOUBLE)) AS auc
    FROM ranked
    """,
)
def q_nb_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann–Whitney AUC of the Naive Bayes 'en' one-vs-rest score
    on the held-out fifth — the ranking-quality evaluation a classifier
    pipeline runs after q_nb_classify's argmax accuracy.

    Scores are rounded to 6 decimals FIRST (the engine-stability
    boundary), after which everything is exact: midranks are
    half-integers, their sums stay on the 0.5 grid well inside 2⁵³ (so
    the double sum is order-independent), and the U-statistic
    normalization is a single-op chain — AUC is emitted unrounded.

    Scale note (r8): the held-out fifth is corpus-proportional, NOT
    sample-sized, so the old unpartitioned rank window (a
    single-partition sort) was the one non-distributing stage in the
    whole evaluation. The rank prefix now comes from
    :func:`operators.ranks.global_cumsum` — range shuffle +
    per-partition offsets + Arrow cumsum with cross-batch carry — over
    the distinct-score histogram: exact, deterministic, and every stage
    partition-parallel at 100 TB.
    """
    from mapreduce_hw05_spark.operators.naive_bayes import nb_fit, nb_score
    from mapreduce_hw05_spark.operators.ranks import global_cumsum

    docs = load_table(spark, sf_dir, "documents")
    train = tokenize(
        docs.filter(F.col("doc_id") % 5 != 0), "text", "doc_id", "lang"
    ).select("doc_id", F.col("lang").alias("label"), "token")
    priors, lik = nb_fit(train)
    test = tokenize(docs.filter(F.col("doc_id") % 5 == 0), "text", "doc_id")
    scores = (
        nb_score(test, priors, lik)
        .filter(F.col("label") == "en")
        .select("doc_id", F.round("score", 6).alias("s"))
    )
    labeled = scores.join(docs.select("doc_id", "lang"), "doc_id").select(
        "s", (F.col("lang") == "en").cast("int").alias("y")
    )
    # Distinct-score histogram first (one shuffle, score-cardinality-
    # sized), then the rank prefix comes from the DISTRIBUTED exact
    # cumsum — no single-partition window anywhere. midrank(s) =
    # (#rows below s) + (cnt(s)+1)/2 ≡ rank() + (ties-1)/2 of the old
    # window formulation, so per-score pos·midrank sums are identical
    # half-integers and the AUC is bit-for-bit the window result
    # (identity test: test_nb_auc_matches_window_formulation).
    hist = labeled.groupBy("s").agg(
        lng(F.sum("y")).alias("pos"),
        lng(F.sum(1 - F.col("y"))).alias("neg"),
        F.count("*").cast("long").alias("cnt"),
    )
    ranked = global_cumsum(hist, [F.col("s").asc()], ["cnt"]).select(
        "pos",
        "neg",
        (
            (F.col("cum_cnt") - F.col("cnt")) + (F.col("cnt") + 1) / 2.0
        ).alias("midrank"),
    )
    n_pos = F.sum("pos")
    n_neg = F.sum("neg")
    return ranked.agg(
        lng(n_pos).alias("n_pos"),
        lng(n_neg).alias("n_neg"),
        (
            (
                F.sum(F.col("pos") * F.col("midrank"))
                - n_pos * (n_pos + 1.0) / 2
            )
            / (n_pos * n_neg.cast("double"))
        ).alias("auc"),
    )


# --------------------------------------------------------------------------
# Taxonomy keyword tagging — broadcast dimension join over the token stream
# --------------------------------------------------------------------------

#: keyword → topic taxonomy; the oracle VALUES list is generated from this
#: dict so the two engines can never drift.
KEYWORD_TOPICS: dict[str, str] = {
    "join": "joins",
    "merge": "joins",
    "hash": "joins",
    "scan": "scans",
    "filter": "scans",
    "table": "scans",
    "window": "streaming",
    "stream": "streaming",
    "batch": "streaming",
    "vector": "ml",
    "data": "ml",
}


def _keyword_values_sql() -> str:
    return ", ".join(f"('{k}', '{v}')" for k, v in KEYWORD_TOPICS.items())


@contract(
    "q_keyword_tagging",
    oracle=f"""
    WITH taxonomy (keyword, topic) AS (
        VALUES {_keyword_values_sql()}
    ), toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), hits AS (
        SELECT DISTINCT t.doc_id, x.topic
        FROM toks t JOIN taxonomy x ON t.token = x.keyword
    )
    SELECT doc_id,
           string_agg(topic, ',' ORDER BY topic) AS topics,
           count(*) AS n_topics
    FROM hits GROUP BY doc_id
    """,
)
def q_keyword_tagging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-label taxonomy tagging: each document is tagged with the
    sorted distinct topics of the taxonomy keywords it contains — the
    broadcast-dimension classify stage every corpus router runs (domain
    routing, topic mixing, safety keyword screens).

    The taxonomy is a literal broadcast side (both engines read the SAME
    Python dict, so keyword/topic sets cannot drift); the token stream
    joins it map-side, the DISTINCT collapses repeat hits before the
    per-doc aggregate, and topics emit as a sorted comma-joined string —
    deterministic and hash-comparable. At 100 TB this is scan throughput
    + one doc-keyed exchange of (doc, topic) hits, never token-sized.
    """
    docs = load_table(spark, sf_dir, "documents")
    taxonomy = spark.createDataFrame(
        list(KEYWORD_TOPICS.items()), "keyword string, topic string"
    )
    hits = (
        tokenize(docs, "text", "doc_id")
        # model-sized: keyword taxonomy
        .join(F.broadcast(taxonomy), F.col("token") == F.col("keyword"))
        .select("doc_id", "topic")
        .distinct()
    )
    return hits.groupBy("doc_id").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("topic"))).alias(
            "topics"
        ),
        F.count("*").alias("n_topics"),
    )


# --------------------------------------------------------------------------
# NB evaluation — per-class precision / recall / F1 from the held-out fifth
# --------------------------------------------------------------------------

#: The NB train/predict CTE chain shared by q_nb_classify / q_nb_auc,
#: ending in pred(doc_id, pred) over the held-out fifth.
_NB_PRED_SQL = """
    WITH toks AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), train AS (
        SELECT * FROM toks WHERE doc_id % 5 <> 0
    ), vocab AS (
        SELECT DISTINCT token FROM train
    ), vsize AS (
        SELECT count(*) AS v FROM vocab
    ), class_docs AS (
        SELECT lang, count(DISTINCT doc_id) AS nd FROM train GROUP BY lang
    ), ndocs AS (
        SELECT sum(nd) AS n FROM class_docs
    ), tok_counts AS (
        SELECT lang, token, count(*) AS c FROM train GROUP BY lang, token
    ), class_tokens AS (
        SELECT lang, sum(c) AS nt FROM tok_counts GROUP BY lang
    ), priors AS (
        SELECT cd.lang,
               ln(cd.nd * 1.0 / (SELECT n FROM ndocs)) AS log_prior,
               ln(1.0 / (ct.nt + (SELECT v FROM vsize))) AS default_ll
        FROM class_docs cd JOIN class_tokens ct ON cd.lang = ct.lang
    ), lik AS (
        SELECT tc.lang, tc.token,
               ln((tc.c + 1.0) / (ct.nt + (SELECT v FROM vsize))) AS ll
        FROM tok_counts tc JOIN class_tokens ct ON tc.lang = ct.lang
    ), tf AS (
        SELECT doc_id, token, count(*) AS f
        FROM toks WHERE doc_id % 5 = 0
        GROUP BY doc_id, token
    ), tf_known AS (
        SELECT * FROM tf WHERE token IN (SELECT token FROM vocab)
    ), scores AS (
        SELECT t.doc_id, p.lang,
               p.log_prior + sum(t.f * coalesce(l.ll, p.default_ll)) AS score
        FROM tf_known t
        CROSS JOIN priors p
        LEFT JOIN lik l ON l.lang = p.lang AND l.token = t.token
        GROUP BY t.doc_id, p.lang, p.log_prior
    ), pred AS (
        SELECT doc_id, lang AS pred
        FROM scores
        QUALIFY row_number()
            OVER (PARTITION BY doc_id ORDER BY round(score, 6) DESC, lang) = 1
    )
"""


@contract(
    "q_nb_confusion",
    oracle=_NB_PRED_SQL
    + """
    , base AS (
        SELECT p.pred, d.lang
        FROM pred p JOIN documents d ON p.doc_id = d.doc_id
    ), per_true AS (
        SELECT lang, count(*) AS n_true,
               CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS BIGINT)
                   AS tp
        FROM base GROUP BY lang
    ), per_pred AS (
        SELECT pred AS lang, count(*) AS n_pred FROM base GROUP BY pred
    ), m AS (
        SELECT coalesce(t.lang, p.lang) AS lang,
               CAST(coalesce(t.n_true, 0) AS BIGINT) AS n_true,
               CAST(coalesce(p.n_pred, 0) AS BIGINT) AS n_pred,
               CAST(coalesce(t.tp, 0) AS BIGINT) AS tp
        FROM per_true t FULL OUTER JOIN per_pred p ON t.lang = p.lang
    )
    SELECT lang, n_true, n_pred, tp,
           CASE WHEN n_pred > 0
                THEN CAST(tp AS DOUBLE) / n_pred END AS precision,
           CASE WHEN n_true > 0
                THEN CAST(tp AS DOUBLE) / n_true END AS recall,
           CASE WHEN tp > 0
                THEN 2.0 * (CAST(tp AS DOUBLE) / n_pred)
                     * (CAST(tp AS DOUBLE) / n_true)
                     / ((CAST(tp AS DOUBLE) / n_pred)
                        + (CAST(tp AS DOUBLE) / n_true))
                ELSE 0.0 END AS f1
    FROM m
    """,
)
def q_nb_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision / recall / F1 of the Naive Bayes language
    classifier on the held-out fifth — the evaluation readout that turns
    q_nb_classify's confusion matrix into the numbers a model card
    reports.

    The prediction pipeline is the SAME broadcast-model scorer
    (operators.naive_bayes, round-6 argmax with label tiebreak); the
    metrics reduce to three exact integers per class, and each metric is
    a guarded single-division (F1: a fixed IEEE expression tree on those
    divisions) — bit-identical cross-engine, NULL where undefined.
    """
    from pyspark.sql import Window

    from mapreduce_hw05_spark.operators.naive_bayes import nb_fit, nb_score

    docs = load_table(spark, sf_dir, "documents")
    train = tokenize(
        docs.filter(F.col("doc_id") % 5 != 0), "text", "doc_id", "lang"
    ).select("doc_id", F.col("lang").alias("label"), "token")
    priors, lik = nb_fit(train)
    test = tokenize(docs.filter(F.col("doc_id") % 5 == 0), "text", "doc_id")
    scores = nb_score(test, priors, lik)
    w = Window.partitionBy("doc_id").orderBy(
        F.round(F.col("score"), 6).desc(), F.col("label")
    )
    pred = (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("label").alias("pred"))
    )
    base = pred.join(docs.select("doc_id", "lang"), "doc_id").select(
        "pred", "lang"
    )
    per_true = base.groupBy("lang").agg(
        F.count("*").alias("n_true"),
        lng(F.sum((F.col("pred") == F.col("lang")).cast("int"))).alias("tp"),
    )
    per_pred = base.groupBy(F.col("pred").alias("lang")).agg(
        F.count("*").alias("n_pred")
    )
    m = (
        per_true.join(per_pred, "lang", "full")
        .select(
            "lang",
            F.coalesce(F.col("n_true"), F.lit(0)).cast("long").alias("n_true"),
            F.coalesce(F.col("n_pred"), F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce(F.col("tp"), F.lit(0)).cast("long").alias("tp"),
        )
    )
    p = F.col("tp").cast("double") / F.col("n_pred")
    r = F.col("tp").cast("double") / F.col("n_true")
    return m.select(
        "lang",
        "n_true",
        "n_pred",
        "tp",
        F.when(F.col("n_pred") > 0, p).alias("precision"),
        F.when(F.col("n_true") > 0, r).alias("recall"),
        F.when(F.col("tp") > 0, 2.0 * p * r / (p + r))
        .otherwise(F.lit(0.0))
        .alias("f1"),
    )


# --------------------------------------------------------------------------
# ir-ext — ranking evaluation: NDCG@10 + MAP@10 terms per query token
# --------------------------------------------------------------------------

#: 1/log2(rank+1) for ranks 1..10 — identical decimal literals on both
#: engines parse to identical doubles (never recompute log2 in-engine:
#: ln() is ~1 ulp cross-engine, literals are exact).
_DCG_W = (
    "1.0",
    "0.6309297535714575",
    "0.5",
    "0.43067655807339306",
    "0.38685280723454163",
    "0.3562071871080222",
    "0.3333333333333333",
    "0.31546487678572877",
    "0.3010299956639812",
    "0.2890648263178879",
)

# ``e0`` forces DuckDB to parse each literal as DOUBLE — a bare decimal
# literal becomes DECIMAL(17,16) there, and the later decimal→double
# conversion (m / 10^s in floating point) lands 1 ulp off the direct
# double parse for several weights.
_DCG_CASE = (
    "CASE rank "
    + " ".join(f"WHEN {r + 1} THEN {w}e0" for r, w in enumerate(_DCG_W))
    + " END"
)

_IDCG_CASE = _DCG_CASE.replace("CASE rank", "CASE ideal_rank")


@contract(
    "q_ranking_eval",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), tf AS (
        SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
        FROM toks GROUP BY 1, 2
    ), queries AS (
        SELECT token FROM (
            SELECT token, CAST(sum(tf) AS BIGINT) AS total
            FROM tf GROUP BY token
        ) ORDER BY total DESC, token LIMIT 5
    ), ranked AS (
        SELECT t.token, t.doc_id, t.tf,
               row_number() OVER (PARTITION BY t.token
                                  ORDER BY t.tf DESC, t.doc_id) AS rank,
               (t.doc_id * 31 + ascii(substr(t.token, 1, 1))) % 4 AS rel
        FROM tf t JOIN queries q ON t.token = q.token
        QUALIFY rank <= 10
    ), ideal AS (
        SELECT token, doc_id, rank, rel,
               row_number() OVER (PARTITION BY token
                                  ORDER BY rel DESC, doc_id) AS ideal_rank,
               CAST(sum(CASE WHEN rel >= 2 THEN 1 ELSE 0 END)
                        OVER (PARTITION BY token ORDER BY rank)
                    AS BIGINT) AS cum_hits
        FROM ranked
    )
    SELECT token, rank, doc_id, CAST(rel AS BIGINT) AS rel,
           rel * {_DCG_CASE} AS gain_term,
           rel * {_IDCG_CASE} AS ideal_slot_term,
           CASE WHEN rel >= 2
                THEN CAST(cum_hits AS DOUBLE) / rank ELSE 0.0
           END AS ap_term
    FROM ideal
    """,
)
def q_ranking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation over a deterministic retrieval run:
    for the 5 highest-volume query tokens, docs are ranked by exact term
    frequency (tf DESC, doc_id tie-break, top-10), each hit carries a
    hash-derived graded relevance 0–3, and the output emits the additive
    per-rank pieces of the two standard IR metrics — DCG gains
    (rel · 1/log₂(rank+1)), the ideal-permutation slot terms (the same
    retrieved relevances re-sorted rel DESC — summing them gives the
    IDCG@10 of the retrieved set), and average-precision terms
    (precision-at-rank when the doc is relevant, rel ≥ 2). The caller
    sums per token: NDCG = Σgain/Σideal, AP = Σap_term/Σ(rel≥2) — the
    offline eval loop for [[q_bm25_topk]] / [[q_rrf_fusion]] retrieval.

    Bit-exact discipline: ranks and relevances are exact integers, the
    1/log₂ weights are identical decimal LITERALS on both engines
    (never engine-computed — ln is ~1 ulp cross-engine), each term is
    one int×literal multiply or one exact-int divide, and terms are
    emitted per rank (never pre-summed) per the PSI-terms rule. Scale:
    tf is one map-side-combinable aggregate; the top-10 window runs per
    query token only.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    tf = toks.groupBy("token", "doc_id").agg(
        lng(F.count("*")).alias("tf")
    )
    queries = (
        tf.groupBy("token")
        .agg(lng(F.sum("tf")).alias("total"))
        .orderBy(F.col("total").desc(), "token")
        .limit(5)
        .select("token")
    )
    ranked = (
        # model-sized: query term set
        tf.join(F.broadcast(queries), "token")
        .withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("token").orderBy(
                    F.col("tf").desc(), "doc_id"
                )
            ),
        )
        .filter(F.col("rank") <= 10)
        .withColumn(
            "rel",
            (
                F.col("doc_id") * 31
                + F.ascii(F.substring("token", 1, 1))
            )
            % 4,
        )
    )
    ideal = ranked.select(
        "token",
        "doc_id",
        "rank",
        "rel",
        F.row_number()
        .over(W.partitionBy("token").orderBy(F.col("rel").desc(), "doc_id"))
        .alias("ideal_rank"),
        F.sum(F.when(F.col("rel") >= 2, 1).otherwise(0))
        .over(W.partitionBy("token").orderBy("rank"))
        .cast("long")
        .alias("cum_hits"),
    )
    w_by_rank = F.lit(None).cast("double")
    wi_by_rank = F.lit(None).cast("double")
    for r, w in enumerate(_DCG_W):
        w_by_rank = F.when(F.col("rank") == r + 1, float(w)).otherwise(
            w_by_rank
        )
        wi_by_rank = F.when(
            F.col("ideal_rank") == r + 1, float(w)
        ).otherwise(wi_by_rank)
    return ideal.select(
        "token",
        "rank",
        "doc_id",
        lng(F.col("rel")).alias("rel"),
        (F.col("rel") * w_by_rank).alias("gain_term"),
        (F.col("rel") * wi_by_rank).alias("ideal_slot_term"),
        F.when(
            F.col("rel") >= 2,
            F.col("cum_hits").cast("double") / F.col("rank"),
        )
        .otherwise(F.lit(0.0))
        .alias("ap_term"),
    )


# --------------------------------------------------------------------------
# ml-ext — 5-fold cross-validated NB accuracy WITHOUT refits
# --------------------------------------------------------------------------


@contract(
    "q_kfold_nb_accuracy",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, doc_id % 5 AS fold,
               unnest(string_split(text, ' ')) AS token
        FROM documents
    ), flc AS (
        SELECT fold, lang, token, count(*) AS c
        FROM toks GROUP BY 1, 2, 3
    ), tot AS (
        SELECT lang, token, sum(c) AS ctot FROM flc GROUP BY 1, 2
    ), folds AS (
        SELECT unnest(generate_series(0, 4)) AS fold
    ), model AS (
        SELECT f.fold, t.lang, t.token,
               t.ctot - coalesce(x.c, 0) AS cm
        FROM folds f CROSS JOIN tot t
        LEFT JOIN flc x
          ON x.fold = f.fold AND x.lang = t.lang AND x.token = t.token
        WHERE t.ctot - coalesce(x.c, 0) > 0
    ), vf AS (
        SELECT fold, count(DISTINCT token) AS v FROM model GROUP BY fold
    ), ctk AS (
        SELECT fold, lang, sum(cm) AS nt FROM model GROUP BY 1, 2
    ), dl AS (
        SELECT lang, count(DISTINCT doc_id) AS ndl FROM toks GROUP BY lang
    ), dlf AS (
        SELECT fold, lang, count(DISTINCT doc_id) AS ndf
        FROM toks GROUP BY 1, 2
    ), cd AS (
        SELECT f.fold, d.lang, d.ndl - coalesce(x.ndf, 0) AS ndm
        FROM folds f CROSS JOIN dl d
        LEFT JOIN dlf x ON x.fold = f.fold AND x.lang = d.lang
        WHERE d.ndl - coalesce(x.ndf, 0) > 0
    ), nd AS (
        SELECT fold, sum(ndm) AS n FROM cd GROUP BY fold
    ), priors AS (
        SELECT cd.fold, cd.lang,
               ln(cd.ndm * 1.0 / nd.n) AS log_prior,
               ln(1.0 / (ctk.nt + vf.v)) AS default_ll
        FROM cd
        JOIN nd ON cd.fold = nd.fold
        JOIN ctk ON ctk.fold = cd.fold AND ctk.lang = cd.lang
        JOIN vf ON vf.fold = cd.fold
    ), lik AS (
        SELECT m.fold, m.lang, m.token,
               ln((m.cm + 1.0) / (ctk.nt + vf.v)) AS ll
        FROM model m
        JOIN ctk ON ctk.fold = m.fold AND ctk.lang = m.lang
        JOIN vf ON vf.fold = m.fold
    ), tf AS (
        SELECT fold, doc_id, token, count(*) AS f
        FROM toks GROUP BY 1, 2, 3
    ), tfk AS (
        SELECT t.* FROM tf t
        WHERE EXISTS (SELECT 1 FROM model m
                      WHERE m.fold = t.fold AND m.token = t.token)
    ), scores AS (
        SELECT t.doc_id, t.fold, p.lang,
               p.log_prior + sum(t.f * coalesce(l.ll, p.default_ll))
                   AS score
        FROM tfk t
        JOIN priors p ON p.fold = t.fold
        LEFT JOIN lik l ON l.fold = t.fold AND l.lang = p.lang
                        AND l.token = t.token
        GROUP BY t.doc_id, t.fold, p.lang, p.log_prior
    ), pred AS (
        SELECT doc_id, fold, lang AS pred
        FROM scores
        QUALIFY row_number()
            OVER (PARTITION BY doc_id
                  ORDER BY round(score, 6) DESC, lang) = 1
    )
    SELECT CAST(p.fold AS BIGINT) AS fold,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN p.pred = d.lang THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(sum(CASE WHEN p.pred = d.lang THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS accuracy
    FROM pred p JOIN documents d ON p.doc_id = d.doc_id
    GROUP BY p.fold ORDER BY fold
    """,
)
def q_kfold_nb_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validated Naive Bayes language-ID accuracy computed
    WITHOUT refitting: (fold, lang, token) counts are aggregated ONCE,
    and each fold's leave-one-out model is the total minus the fold's
    own counts — the subtraction trick that turns k-fold CV from k
    corpus passes into one (the same mergeable-statistics insight as
    the jackknife, applied to a classifier). Each held-out fifth is
    scored against its own-fold model; output is per-fold test size,
    correct count, and accuracy (exact-int divide).

    All model tables are (5 × V × C)-sized, so the per-fold smoothing
    denominators (fold vocabulary V_f, class token totals) come from
    model-sized aggregates. Scoring follows [[q_nb_classify]]'s
    round(score, 6)-before-argmax discipline (per-doc log-likelihood
    sums are the one order-dependent float reduction; rounding absorbs
    the ~1e-13 drift). Docs whose tokens are all outside their fold's
    vocabulary drop out identically on both engines. At 100 TB: two
    corpus-sized aggregates (token counts, doc-label distincts), one
    corpus-sized scoring join against the model — broadcast only while
    the counted model fits under ``MAX_BROADCAST_MODEL_ROWS`` (the
    vocabulary dimension is Heaps-, not constant-, bounded), shuffled
    on (fold, lang, token) past it; fold parallelism is free because
    fold is just a column.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(docs, "text", "doc_id", "lang").withColumn(
        "fold", F.col("doc_id") % 5
    )
    flc = toks.groupBy("fold", "lang", "token").agg(
        F.count("*").alias("c")
    )
    tot = flc.groupBy("lang", "token").agg(F.sum("c").alias("ctot"))
    folds = spark.range(0, 5).select(F.col("id").alias("fold"))
    model = (
        folds.crossJoin(tot)
        .join(flc, ["fold", "lang", "token"], "left")
        .select(
            "fold",
            "lang",
            "token",
            (F.col("ctot") - F.coalesce(F.col("c"), F.lit(0))).alias("cm"),
        )
        .filter(F.col("cm") > 0)
        .persist()
    )
    vf = model.groupBy("fold").agg(F.countDistinct("token").alias("v"))
    ctk = model.groupBy("fold", "lang").agg(F.sum("cm").alias("nt"))
    dl = toks.groupBy("lang").agg(F.countDistinct("doc_id").alias("ndl"))
    dlf = toks.groupBy("fold", "lang").agg(
        F.countDistinct("doc_id").alias("ndf")
    )
    cd = (
        folds.crossJoin(dl)
        .join(dlf, ["fold", "lang"], "left")
        .select(
            "fold",
            "lang",
            (F.col("ndl") - F.coalesce(F.col("ndf"), F.lit(0))).alias(
                "ndm"
            ),
        )
        .filter(F.col("ndm") > 0)
    )
    nd = cd.groupBy("fold").agg(F.sum("ndm").alias("n"))
    priors = (
        cd.join(nd, "fold")
        .join(ctk, ["fold", "lang"])
        .join(vf, "fold")
        .select(
            "fold",
            "lang",
            F.log(F.col("ndm") * 1.0 / F.col("n")).alias("log_prior"),
            F.log(1.0 / (F.col("nt") + F.col("v"))).alias("default_ll"),
        )
    )
    lik = (
        model.join(ctk, ["fold", "lang"])
        .join(vf, "fold")
        .select(
            "fold",
            "lang",
            "token",
            F.log((F.col("cm") + 1.0) / (F.col("nt") + F.col("v"))).alias(
                "ll"
            ),
        )
    )
    tf = toks.groupBy("fold", "doc_id", "token").agg(
        F.count("*").alias("f")
    )
    tfk = tf.join(
        model.select("fold", "token").distinct(),
        ["fold", "token"],
        "left_semi",
    )
    # The likelihood table is (fold × lang × VOCAB)-sized — Heaps' law
    # grows it sublinearly but WITHOUT bound (the r6 x1000 probe OOMed
    # the unconditional broadcast: unique per-doc tokens put V near doc
    # count). Count the persisted model once (also materializes the
    # cache before the fan-out below) and route the scoring join the
    # same way nb_score does; past the cap it runs shuffled — identical
    # results, one extra exchange.
    from mapreduce_hw05_spark.operators.naive_bayes import (
        MAX_BROADCAST_MODEL_ROWS,
    )

    bcast_model = model.count() <= MAX_BROADCAST_MODEL_ROWS
    scores = (
        # bounded: per-fold class priors (folds × label set)
        tfk.join(F.broadcast(priors), "fold")
        # counted: fold x lang x token likelihoods routed on model size
        .join(
            F.broadcast(lik) if bcast_model else lik,
            ["fold", "lang", "token"],
            "left",
        )
        .groupBy("doc_id", "fold", "lang")
        .agg(
            (
                F.first("log_prior")
                + F.sum(
                    F.col("f")
                    * F.coalesce(F.col("ll"), F.col("default_ll"))
                )
            ).alias("score")
        )
    )
    w = W.partitionBy("doc_id").orderBy(
        F.round(F.col("score"), 6).desc(), F.col("lang")
    )
    pred = (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "fold", F.col("lang").alias("pred"))
    )
    correct = F.when(F.col("pred") == F.col("lang"), 1).otherwise(0)
    return (
        pred.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy(F.col("fold").cast("long").alias("fold"))
        .agg(
            lng(F.count("*")).alias("n_test"),
            lng(F.sum(correct)).alias("n_correct"),
            (
                F.sum(correct).cast("double") / F.count("*")
            ).alias("accuracy"),
        )
        .orderBy("fold")
    )


# --------------------------------------------------------------------------
# norm-ext — cross-source quantile normalization of document lengths
# --------------------------------------------------------------------------


@contract(
    "q_quantile_normalize",
    oracle="""
    WITH ranked AS (
        SELECT source, len(text) AS n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY len(text), doc_id) AS rnk
        FROM documents
    )
    SELECT rnk AS rank,
           CAST(count(*) AS BIGINT) AS n_sources,
           CAST(sum(n_chars) AS BIGINT) AS sum_len,
           CAST(sum(n_chars) AS DOUBLE) / count(*) AS normalized_len
    FROM ranked GROUP BY rnk ORDER BY rnk
    """,
)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization across sources — the batch-effect
    remover (canonical in bioinformatics, equally applicable to mixing
    text sources with different length distributions): rank documents
    within each source by length, then the normalized value at rank r
    is the MEAN of the r-th order statistics across sources. Replacing
    each doc's length by ``normalized_len[rank]`` gives every source
    the identical marginal distribution while preserving within-source
    order — what a data-mixing pipeline wants before length-stratified
    sampling ([[q_token_budget_mix]]).

    Exact: integer lengths, deterministic (len, doc_id) ranks, BIGINT
    rank-sums, one exact-int divide for the mean. Scale: one window
    rank per source plus a rank-keyed aggregate — both shuffle on
    bounded keys; at 100 TB the per-source rank becomes the two-pass
    histogram rank ([[q_weighted_percentiles_hist]]'s machinery) and
    the rank aggregate is unchanged.
    """
    docs = load_table(spark, sf_dir, "documents")
    ranked = docs.select(
        "source",
        F.length("text").alias("n_chars"),
        F.row_number()
        .over(
            W.partitionBy("source").orderBy(F.length("text"), "doc_id")
        )
        .alias("rank"),
    )
    return (
        ranked.groupBy("rank")
        .agg(
            lng(F.count("*")).alias("n_sources"),
            lng(F.sum("n_chars")).alias("sum_len"),
            (
                F.sum("n_chars").cast("double") / F.count("*")
            ).alias("normalized_len"),
        )
        .orderBy("rank")
    )

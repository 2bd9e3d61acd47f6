"""Multinomial Naive Bayes over token streams — the fastText-shaped
train/score stage a pretraining pipeline runs for language or quality
classification before filtering.

Training is two partial-aggregate-friendly passes over the token stream
(per-(class, token) counts and per-class totals); the fitted model is a
V×C likelihood table plus a C-row prior table. Scoring attaches the model
to the probe side with a broadcast hash join when the model fits an
executor (vocabulary is Heaps'-law bounded, so it does at any corpus
scale once the vocab is capped) and falls back to a shuffled join past
``MAX_BROADCAST_MODEL_ROWS``. Everything stays JVM-side Catalyst: the
per-class expansion is an ``explode`` over the (tiny, driver-collected)
class list, never a cartesian join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Likelihood tables up to this many (class, token) rows are broadcast to
#: the scoring join (~4 M × ~40 B ≈ 160 MB — the same executor-memory gate
#: as operators.similarity). Larger models take the shuffled-join path.
MAX_BROADCAST_MODEL_ROWS = 4_000_000


def nb_fit(
    tokens: DataFrame,
    label_col: str = "label",
    token_col: str = "token",
    doc_col: str = "doc_id",
    alpha: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Fit multinomial NB with Laplace ``alpha`` → ``(priors, likelihoods)``.

    ``tokens`` is one row per (doc, label, token) occurrence. Returns

    - ``priors``: (label, log_prior, default_ll) where ``default_ll`` is
      the smoothed log-likelihood of an in-vocabulary token the class
      never saw — ln(α / (class_tokens + α·V));
    - ``likelihoods``: (label, token, ll) with
      ll = ln((count + α) / (class_tokens + α·V)).

    Both outputs are model-sized (C and V×C rows), not corpus-sized. The
    two scalar actions (vocabulary size, total docs) are one job each.
    """
    tokens = tokens.select(
        F.col(doc_col).alias("doc_id"),
        F.col(label_col).alias("label"),
        F.col(token_col).alias("token"),
    )
    # Two corpus-sized passes total: the (label, token) count and the
    # (doc, label) distinct. Everything else (vocabulary size, doc total,
    # class token totals) derives from those model-sized aggregates so the
    # raw token stream is never re-scanned for a scalar.
    tok_counts = tokens.groupBy("label", "token").agg(
        F.count("*").alias("c")
    ).persist()
    vocab_size = tok_counts.select("token").distinct().count()
    class_docs = (
        tokens.select("doc_id", "label")
        .distinct()
        .groupBy("label")
        .agg(F.count("*").alias("nd"))
        .persist()  # C rows; caching skips a rescan for the doc total
    )
    n_docs = class_docs.agg(F.sum("nd")).first()[0]
    class_tokens = tok_counts.groupBy("label").agg(F.sum("c").alias("nt"))
    denom = F.col("nt") + F.lit(float(alpha) * vocab_size)
    priors = (
        class_docs.join(class_tokens, "label")
        .select(
            "label",
            F.log(F.col("nd") * F.lit(1.0) / F.lit(float(n_docs))).alias(
                "log_prior"
            ),
            F.log(F.lit(float(alpha)) / denom).alias("default_ll"),
        )
    )
    likelihoods = tok_counts.join(class_tokens, "label").select(
        "label",
        "token",
        F.log((F.col("c") + F.lit(float(alpha))) / denom).alias("ll"),
    )
    return priors, likelihoods


def nb_score(
    doc_tokens: DataFrame,
    priors: DataFrame,
    likelihoods: DataFrame,
    doc_col: str = "doc_id",
    token_col: str = "token",
) -> DataFrame:
    """Score every document against every class → (doc_id, label, score).

    ``score = log_prior + Σ_t tf(t) · ll(t | class)`` with the class's
    ``default_ll`` for in-vocabulary tokens it never saw. Out-of-vocabulary
    tokens are dropped (standard multinomial NB); a document whose tokens
    are ALL out-of-vocabulary is absent from the result.

    The class list is driver-collected (C-sized by definition) and
    expanded with ``explode`` — no cartesian join; the model join
    broadcasts under :data:`MAX_BROADCAST_MODEL_ROWS`.
    """
    prior_rows = priors.collect()  # C rows — model-sized by definition
    class_arr = F.array(
        *[
            F.struct(
                F.lit(r["label"]).alias("label"),
                F.lit(r["log_prior"]).alias("log_prior"),
                F.lit(r["default_ll"]).alias("default_ll"),
            )
            for r in sorted(prior_rows, key=lambda r: r["label"])
        ]
    )
    tf = (
        doc_tokens.select(
            F.col(doc_col).alias("doc_id"), F.col(token_col).alias("token")
        )
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("f"))
    )
    vocab = likelihoods.select("token").distinct()
    bcast = likelihoods.count() <= MAX_BROADCAST_MODEL_ROWS
    tf_known = tf.join(F.broadcast(vocab) if bcast else vocab, "token", "semi")
    expanded = tf_known.select(
        "doc_id", "token", "f", F.explode(class_arr).alias("cls")
    ).select(
        "doc_id",
        "token",
        "f",
        F.col("cls.label").alias("label"),
        F.col("cls.log_prior").alias("log_prior"),
        F.col("cls.default_ll").alias("default_ll"),
    )
    joined = expanded.join(
        F.broadcast(likelihoods) if bcast else likelihoods,
        ["label", "token"],
        "left",
    )
    return joined.groupBy("doc_id", "label").agg(
        (
            F.first("log_prior")
            + F.sum(F.col("f") * F.coalesce(F.col("ll"), F.col("default_ll")))
        ).alias("score")
    )

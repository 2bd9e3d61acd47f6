"""Text-analysis operators over document tables (SURVEY §2.11).

Tokenization stays in Catalyst (``split``/``explode``) — no Python in the
hot path. At 100 TB the explode multiplies row count by ~tokens/doc; all
downstream aggregates are partial-agg friendly (token keys), and the
explode itself is pipelined inside whole-stage codegen, never
materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def tokenize(df: DataFrame, text_col: str = "text", *keep_cols: str) -> DataFrame:
    """One row per (keep_cols…, token); splits on single spaces.

    The fixture corpus is single-space-separated lowercase words; for raw
    text swap the delimiter regex for ``\\s+`` and add a lower().
    """
    return df.select(
        *keep_cols, F.explode(F.split(F.col(text_col), " ")).alias("token")
    )


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The genre's WordCount: token → count."""
    return tokenize(df, text_col).groupBy("token").agg(F.count("*").alias("n"))


def exact_duplicates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-duplicate groups by md5(text): hash → group size (>1 only).

    Scale: hash-groupBy shuffles 16-byte digests, not documents; at
    100 TB add a first pass on (length, prefix-hash) to pre-bucket if the
    digest shuffle itself is too wide.
    """
    return (
        df.groupBy(F.md5(F.col(text_col).cast("binary")).alias("text_hash"))
        .agg(F.count("*").alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )


def word_shingles(df: DataFrame, n: int = 2, text_col: str = "text",
                  *keep_cols: str) -> DataFrame:
    """One row per (keep_cols…, shingle): contiguous n-word grams.
    Shingles (vs single tokens) make Jaccard sensitive to word ORDER,
    which is what near-dup detection wants.

    The text is split ONCE into a materialized array column and each
    gram is ``array_join(slice(toks, i, n))`` — O(n·L) per doc. The
    first version kept ``split(text)`` as an unmaterialized expression
    INSIDE the ``transform()`` lambda; higher-order-function lambdas
    are interpreted (never codegen'd) and Catalyst does no
    subexpression elimination across lambda elements, so the text was
    re-split n times per SHINGLE — O(n·L²) interpreted evals per doc.
    The r6 x1000 probe caught it: the 8-gram contracts at 5 M docs
    spun 25+ min inside ``UTF8String.split`` without finishing one
    task (jstack evidence in PERF.md); the rewrite is the same values
    at every scale for docs with ≥ n tokens. Shorter docs now yield
    zero shingles (the old expression errored under ANSI on them, so
    every contract already pre-filters — unobservable).
    """
    toks = F.split(F.col(text_col), " ")
    with_toks = df.select(*keep_cols, toks.alias("__toks"))
    grams = F.when(
        F.size("__toks") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("__toks") - (n - 1)),
            lambda i: F.array_join(F.slice("__toks", i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return with_toks.select(*keep_cols, F.explode(grams).alias("shingle"))


def chunk_documents(
    df: DataFrame,
    size: int = 50,
    stride: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap —
    (id, chunk_idx, chunk_text, n_tokens), the standard pre-training
    chunking pass (size 50 / stride 40 → 10 tokens of overlap).

    Pure Catalyst: split → sequence of window starts → posexplode →
    slice. The explode multiplies rows by ~tokens/(doc·stride) but stays
    pipelined inside codegen; no shuffle at all — chunking composes with
    whatever partitioning the surrounding pipeline already has.
    """
    toks = F.split(F.col(text_col), " ")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(stride)
    )
    exploded = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.posexplode(starts).alias("chunk_idx", "__start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start"), size)
    return exploded.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_tokens"),
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    group_col: str,
    order_cols: list[str],
    token_col: str = "n_tokens",
) -> DataFrame:
    """Assign each chunk to a token-budget bin (sequence packing): within
    each group, chunks are laid out in ``order_cols`` order and a chunk
    lands in the bin where its running token total starts
    (``bin_id = exclusive-cumsum // budget``) — the deterministic
    contiguous approximation of greedy packing, so bins can overflow by
    at most one chunk.

    Scale: one window pass per group partition (single shuffle on
    ``group_col``); no global sort. ``order_cols`` must be unique per
    group for a deterministic layout.
    """
    w = (
        W.partitionBy(group_col)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn(
        "bin_id", F.floor(cum_excl / F.lit(budget)).cast("long")
    )

"""BPE (byte-pair-encoding) merge induction — tokenizer training.

The classic subword-vocabulary algorithm (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units",
public), restructured for Spark's execution model:

- The working set is one row per DISTINCT word (symbols + corpus
  count), not per token occurrence — corpus size only influences the
  initial word-count aggregate, which is the engine's ordinary
  wordcount shuffle. At 100 TB the distinct-word table is millions of
  rows, not trillions.
- Each merge round counts adjacent symbol pairs in Catalyst
  (``transform`` over index sequences + explode + keyed sum — partial
  aggregation applies), collects ONE winning pair to the driver, and
  rewrites the symbol arrays with a vectorized pandas UDF (greedy
  non-overlapping left-to-right merge — genuinely sequential per word,
  the documented Python-UDF escape hatch).
- ``localCheckpoint`` per round truncates the growing lineage, the
  Spark-idiomatic replacement for materializing between iterations.

Ties are broken deterministically (weight desc, then pair lexicographic)
so the learned merge list is reproducible across engines and runs.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

END = "</w>"


def word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt) over whitespace-tokenized, lowercased text."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), "\\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def init_symbols(words: DataFrame) -> DataFrame:
    """Split each word into single-character symbols + end-of-word mark."""
    chars = F.expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    )
    return words.select(
        "word", "cnt", F.concat(chars, F.array(F.lit(END))).alias("syms")
    )


def pair_counts(seqs: DataFrame) -> DataFrame:
    """Corpus-weighted adjacent-pair counts, fully in Catalyst."""
    pairs = F.expr(
        "transform(sequence(1, size(syms) - 1),"
        " i -> struct(syms[i - 1] AS a, syms[i] AS b))"
    )
    return (
        seqs.select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("weight"))
    )


def _merge_udf(a: str, b: str):
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def merge(sy: pd.Series) -> pd.Series:
        def one(seq):
            out, i, n = [], 0, len(seq)
            while i < n:
                if i + 1 < n and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            return out

        return sy.apply(lambda s: one(list(s)))

    return merge


def learn_bpe(docs: DataFrame, text_col: str, n_merges: int) -> list[tuple]:
    """Learn ``n_merges`` BPE merges; returns [(rank, a, b, weight)]."""
    seqs = init_symbols(word_counts(docs, text_col)).localCheckpoint()
    merges: list[tuple] = []
    for rank in range(n_merges):
        top = (
            pair_counts(seqs)
            .orderBy(F.desc("weight"), "a", "b")
            .limit(1)
            .collect()  # bounded: one winning pair per round
        )
        if not top:
            break
        a, b, weight = top[0]["a"], top[0]["b"], int(top[0]["weight"])
        merges.append((rank, a, b, weight))
        seqs = seqs.withColumn(
            "syms", _merge_udf(a, b)(F.col("syms"))
        ).localCheckpoint()
    return merges


def learn_bpe_local(word_cnt: dict[str, int], n_merges: int) -> list[tuple]:
    """Single-machine reference implementation (for differential tests)."""
    seqs = {w: list(w) + [END] for w in word_cnt}
    merges: list[tuple] = []
    for rank in range(n_merges):
        counts: dict[tuple, int] = {}
        for w, seq in seqs.items():
            c = word_cnt[w]
            for i in range(len(seq) - 1):
                counts[(seq[i], seq[i + 1])] = counts.get(
                    (seq[i], seq[i + 1]), 0
                ) + c
        if not counts:
            break
        (a, b), weight = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, weight))
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
    return merges


def encode_words(words: DataFrame, merges: list[tuple]) -> DataFrame:
    """Encode each distinct word with the learned merge list → (word,
    cnt, tokens array<string>).

    Classic BPE application: start from characters (+ end-of-word mark),
    repeatedly merge the adjacent pair with the LOWEST merge rank until
    none applies. Greedy rank order is genuinely sequential per word —
    the vectorized-pandas-UDF escape hatch — but runs on the
    distinct-word table, never per occurrence, and the rank table rides
    to executors inside the UDF closure (broadcast-sized: one entry per
    merge).
    """
    rank = {(a, b): r for r, a, b, _w in merges}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def enc(col: pd.Series) -> pd.Series:
        def one(word: str) -> list[str]:
            seq = list(word) + [END]
            while len(seq) > 1:
                best_rank, best_i = None, None
                for i in range(len(seq) - 1):
                    r = rank.get((seq[i], seq[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_i is None:
                    break
                seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
            return seq
        return col.map(one)

    return words.withColumn("tokens", enc(F.col("word")))


def encode_words_local(
    word_cnt: dict[str, int], merges: list[tuple]
) -> dict[str, list[str]]:
    """Single-machine reference encode (for differential tests)."""
    rank = {(a, b): r for r, a, b, _w in merges}
    out: dict[str, list[str]] = {}
    for word in word_cnt:
        seq = list(word) + [END]
        while len(seq) > 1:
            best = min(
                (
                    (rank[(seq[i], seq[i + 1])], i)
                    for i in range(len(seq) - 1)
                    if (seq[i], seq[i + 1]) in rank
                ),
                default=None,
            )
            if best is None:
                break
            i = best[1]
            seq[i : i + 2] = [seq[i] + seq[i + 1]]
        out[word] = seq
    return out

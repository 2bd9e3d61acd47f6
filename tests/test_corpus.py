"""Semantic invariants for the corpus-construction contracts
(plans/corpus_queries.py) beyond the oracle hash-match: dedup actually
removes every repeated span, the shard map is a partition of the corpus,
the budget cut stops exactly at the boundary doc, and the quality gate
keeps exactly the per-language rank bound.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_hw05_spark.operators.text import chunk_documents
from mapreduce_hw05_spark.plans import QUERIES
from mapreduce_hw05_spark.plans.corpus_queries import (
    _KEEP_DEN,
    _KEEP_NUM,
    _N_SHARDS,
    _SPAN_TOKENS,
    _TOKEN_BUDGET,
)
from mapreduce_hw05_spark.sources import load_table
from tests.conftest import SF_DIR


def test_paragraph_dedup_removes_every_repeat(spark):
    out = QUERIES["q_paragraph_dedup"](spark, SF_DIR)
    docs = load_table(spark, SF_DIR, "documents")
    chunks = chunk_documents(docs, size=_SPAN_TOKENS, stride=_SPAN_TOKENS)
    n_chunks = chunks.count()
    n_distinct = chunks.select("chunk_text").distinct().count()
    agg = out.agg(
        F.sum("n_kept").alias("kept"),
        F.sum("n_chunks").alias("total"),
        F.count("*").alias("docs"),
    ).first()
    # every doc is in the output, every span is counted, and the kept
    # multiset has exactly one survivor per distinct span text
    assert agg["docs"] == docs.count()
    assert agg["total"] == n_chunks
    assert agg["kept"] == n_distinct
    # a doc's cleaned_text token count is the sum of its kept span sizes
    sample = out.filter(F.col("n_kept") > 0).limit(5).collect()
    for row in sample:
        assert len(row["cleaned_text"].split(" ")) <= row["n_chunks"] * _SPAN_TOKENS


def test_shard_manifest_is_a_partition(spark):
    out = QUERIES["q_shard_manifest"](spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents")
    total = docs.count()
    assert sum(r["n_docs"] for r in out) == total
    assert all(0 <= r["shard_id"] < _N_SHARDS for r in out)
    want_checksum = docs.agg(F.sum("doc_id")).first()[0]
    assert sum(r["id_checksum"] for r in out) == want_checksum


def test_token_budget_mix_stops_at_boundary(spark):
    rows = QUERIES["q_token_budget_mix"](spark, SF_DIR).collect()
    per_source: dict[str, list] = {}
    for r in rows:
        per_source.setdefault(r["source"], []).append(r)
    for source, picks in per_source.items():
        picks.sort(key=lambda r: r["pick_rank"])
        # ranks are the contiguous prefix 1..k of the hash order
        assert [r["pick_rank"] for r in picks] == list(range(1, len(picks) + 1))
        kept = sum(r["n_tokens"] for r in picks)
        # all picks but the boundary doc fit strictly inside the budget
        assert kept - picks[-1]["n_tokens"] < _TOKEN_BUDGET, source


def test_quality_filter_keeps_exact_rank_bound(spark):
    out = QUERIES["q_quality_filter_per_lang"](spark, SF_DIR)
    docs = load_table(spark, SF_DIR, "documents")
    n_per_lang = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    kept_per_lang = {
        r["lang"]: r["k"]
        for r in out.groupBy("lang").agg(F.count("*").alias("k")).collect()
    }
    for lang, n in n_per_lang.items():
        want = (_KEEP_NUM * n + (_KEEP_DEN - 1)) // _KEEP_DEN
        assert kept_per_lang.get(lang, 0) == want, lang

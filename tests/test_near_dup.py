"""Near-dup engine tests (SURVEY §2.11 llm-3): the LSH fast path must
never lose a true high-Jaccard pair at contract scale (128 hashes / 32
bands → s-curve threshold ≈ 0.4, well under the 0.8 target).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_hw05_spark.operators.similarity import (
    lsh_candidate_pairs,
    minhash_signatures,
)
from mapreduce_hw05_spark.plans import QUERIES
from mapreduce_hw05_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_lsh_candidates_cover_true_high_jaccard_pairs(spark):
    docs = load_table(spark, SF_DIR, "documents")
    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=128)
    candidates = {
        (r["id1"], r["id2"])
        for r in lsh_candidate_pairs(sigs, "doc_id", num_bands=32).collect()
    }
    truth = {
        (r["id1"], r["id2"])
        for r in QUERIES["q_near_dup_jaccard"](spark, SF_DIR).collect()
    }
    assert truth, "fixture should contain high-Jaccard pairs at sf0.01"
    missed = truth - candidates
    assert not missed, f"LSH lost {len(missed)}/{len(truth)} true pairs: {sorted(missed)[:5]}"


def test_lsh_verified_output_equals_exact(spark):
    """LSH candidates + exact verify ≡ the exact pairwise query."""
    lsh = {
        (r["id1"], r["id2"], r["jaccard"])
        for r in QUERIES["q_near_dup_lsh"](spark, SF_DIR).collect()
    }
    exact = {
        (r["id1"], r["id2"], r["jaccard"])
        for r in QUERIES["q_near_dup_jaccard"](spark, SF_DIR).collect()
    }
    assert lsh == exact


def test_minhash_signatures_deterministic(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    s1 = {r["doc_id"]: tuple(r["signature"])
          for r in minhash_signatures(docs, num_hashes=32).collect()}
    s2 = {r["doc_id"]: tuple(r["signature"])
          for r in minhash_signatures(docs, num_hashes=32).collect()}
    assert s1 == s2
    assert all(len(sig) == 32 for sig in s1.values())

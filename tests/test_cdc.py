"""Semantic unit tests for the CDC operators (merge_upsert paths,
SCD2 interval edges) on tiny in-memory frames — the oracle parity test
covers the fixture-scale contracts."""

from __future__ import annotations

from mapreduce_hw05_spark.operators.cdc import merge_upsert, scd2_intervals


def test_merge_upsert_all_paths(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["k", "s", "v"],
    )
    changes = spark.createDataFrame(
        [
            (2, "B", 21.0, "U"),  # matched update
            (3, None, 0.0, "D"),  # matched delete
            (4, "d", 40.0, "U"),  # unmatched upsert -> insert
            (5, None, 0.0, "D"),  # unmatched delete -> no-op
        ],
        ["k", "s", "v", "op"],
    )
    out = {r.k: (r.s, r.v) for r in merge_upsert(base, changes, ["k"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("B", 21.0), 4: ("d", 40.0)}


def test_merge_upsert_composite_key(spark):
    base = spark.createDataFrame([(1, "x", 1.0)], ["k1", "k2", "v"])
    changes = spark.createDataFrame([(1, "x", 2.0, "U")], ["k1", "k2", "v", "op"])
    rows = merge_upsert(base, changes, ["k1", "k2"]).collect()
    assert [(r.k1, r.k2, r.v) for r in rows] == [(1, "x", 2.0)]


def test_scd2_intervals_collapse_and_current(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 10, 100),  # user 1: a,a,b -> [a: 10..30), [b: 30..)
            (1, "a", 20, 101),
            (1, "b", 30, 102),
            (2, "x", 10, 200),  # user 2: single state, always current
        ],
        ["uid", "state", "ts", "eid"],
    )
    rows = scd2_intervals(df, "uid", "state", "ts", "eid").collect()
    got = {(r.uid, r.state): (r.valid_from, r.valid_to, r.is_current) for r in rows}
    assert got == {
        (1, "a"): (10, 30, False),
        (1, "b"): (30, None, True),
        (2, "x"): (10, None, True),
    }


def test_scd2_reentrant_state_gets_new_interval(spark):
    # a -> b -> a again: the second 'a' is a NEW interval, not a merge.
    df = spark.createDataFrame(
        [(1, "a", 10, 1), (1, "b", 20, 2), (1, "a", 30, 3)],
        ["uid", "state", "ts", "eid"],
    )
    rows = scd2_intervals(df, "uid", "state", "ts", "eid").collect()
    spans = sorted((r.valid_from, r.valid_to, r.state) for r in rows)
    assert spans == [(10, 20, "a"), (20, 30, "b"), (30, None, "a")]


def test_scd2_same_ts_tiebreak(spark):
    # Equal timestamps: eid orders deterministically, so state 'b' wins
    # as the later record and 'a' closes at ts=10.
    df = spark.createDataFrame(
        [(1, "a", 10, 1), (1, "b", 10, 2)],
        ["uid", "state", "ts", "eid"],
    )
    rows = scd2_intervals(df, "uid", "state", "ts", "eid").collect()
    got = sorted((r.state, r.valid_from, r.valid_to) for r in rows)
    assert got == [("a", 10, 10), ("b", 10, None)]


def test_profile_nulls_and_types(spark):
    from mapreduce_hw05_spark.operators.profiling import profile

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, None), (2, "b", 2.5)],
        ["k", "s", "v"],
    )
    got = {r.col_name: r for r in profile(df).collect()}
    assert got["k"].n_rows == 3
    assert (got["k"].n_nonnull, got["k"].n_distinct) == (3, 2)
    assert (got["s"].n_nonnull, got["s"].n_distinct) == (2, 2)
    assert got["s"].min_num is None and got["s"].max_num is None
    assert (got["v"].min_num, got["v"].max_num) == (1.5, 2.5)


def test_profile_approx_mode_runs(spark):
    from mapreduce_hw05_spark.operators.profiling import profile

    df = spark.createDataFrame([(i, float(i)) for i in range(100)], ["k", "v"])
    got = {r.col_name: r for r in profile(df, approx=True).collect()}
    # HLL estimate within 5% of exact at this cardinality
    assert abs(got["k"].n_distinct - 100) <= 5


def test_stratified_hash_sample_rates_and_determinism(spark):
    from mapreduce_hw05_spark.operators.sampling import stratified_hash_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(2000)], ["id", "cls"]
    )
    rates = {"a": 0.5, "b": 0.0}
    got1 = stratified_hash_sample(df, "cls", "id", rates).collect()
    got2 = stratified_hash_sample(df, "cls", "id", rates).collect()
    assert sorted(r.id for r in got1) == sorted(r.id for r in got2)  # reproducible
    by_cls = {}
    for r in got1:
        by_cls[r.cls] = by_cls.get(r.cls, 0) + 1
    assert by_cls.get("b", 0) == 0  # zero-rate stratum fully dropped
    assert 400 <= by_cls["a"] <= 600  # ~50% of the 1000 'a' rows


def test_pack_sequences_bins(spark):
    from mapreduce_hw05_spark.operators.text import pack_sequences

    # budget 10; token runs 6,6,6 -> cumsum-exclusive 0,6,12 -> bins 0,0,1
    df = spark.createDataFrame(
        [("g", 1, 6), ("g", 2, 6), ("g", 3, 6), ("h", 1, 25)],
        ["grp", "ord", "n_tokens"],
    )
    rows = pack_sequences(df, budget=10, group_col="grp", order_cols=["ord"]).collect()
    got = {(r.grp, r.ord): r.bin_id for r in rows}
    assert got == {("g", 1): 0, ("g", 2): 0, ("g", 3): 1, ("h", 1): 0}


def test_decontamination_finds_planted_overlap(spark):
    # Plant an exact-text collision across the held-out/train hash split
    # and assert the semi-join flags it (the fixture corpus has none).
    # md5("27") starts with '0' -> doc 27 is in the benchmark split;
    # md5("1000") does not -> doc 1000 stays in train with 27's text.
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"text {i}", "en") for i in range(64)]
        + [(1000, "text 27", "en")],
        ["doc_id", "text", "lang"],
    )
    split = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    h = F.md5(F.col("text").cast("binary"))
    bench = docs.filter(split == "0").select(h.alias("h"))
    train = docs.filter(split != "0").select("doc_id", h.alias("h"))
    hits = {r.doc_id for r in train.join(F.broadcast(bench), "h", "left_semi").collect()}
    assert hits == {1000}


# --------------------------------------------------------------------------
# Randomized CDC fold — seeded change-batch sequences vs a dict reference
# --------------------------------------------------------------------------


def test_random_cdc_sequences_fold_like_reference(spark):
    """Seeded random sequences of upsert/delete batches folded through
    merge_upsert must land on the same final table as a plain dict
    fold — hunts cross-batch interactions (delete-then-reinsert,
    re-delete of a missing key, op precedence) that single-batch unit
    fixtures miss."""
    import random

    for seed in (3, 19, 71):
        rng = random.Random(seed)
        ref: dict[int, tuple[str, float]] = {}
        base = spark.createDataFrame([], "k long, s string, v double")
        for _batch in range(rng.randint(2, 5)):
            keys = rng.sample(range(12), rng.randint(1, 8))
            rows = []
            for k in keys:
                if rng.random() < 0.3:
                    rows.append((k, None, 0.0, "D"))
                    ref.pop(k, None)
                else:
                    s, v = rng.choice("abcde"), round(rng.uniform(0, 99), 2)
                    rows.append((k, s, v, "U"))
                    ref[k] = (s, v)
            changes = spark.createDataFrame(
                rows, "k long, s string, v double, op string"
            )
            base = merge_upsert(base, changes, ["k"]).localCheckpoint()
        got = {r.k: (r.s, r.v) for r in base.collect()}
        assert got == ref, f"seed={seed}"

"""Streaming engine tests (SURVEY §5.2 item 3): batch-equivalence by file
replay, watermark late-data drop, stateful ops.

Each test replays the sf0.001 events fixture (1000 rows) in controlled
micro-batches (write chunk → processAllAvailable → next chunk) into a
memory sink, then compares against the batch analog.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from mapreduce_hw05_spark.sources import load_table
from mapreduce_hw05_spark.streaming import ops
from mapreduce_hw05_spark.streaming.replay import FileReplay, time_ordered_chunks

SF_DIR = "/root/testdata/sf0.001"
SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


@pytest.fixture()
def events(spark):
    return load_table(spark, SF_DIR, "events")


def replay_through(spark, chunks, op, output_mode: str, schema=None):
    """Run a streaming op over a chunked replay; return the memory table DF.

    r12: the replay runs under the engine's own row-scaled state
    partitioning (`_replay_state_partitions`, exactly as every streaming
    CONTRACT does). The test session's 32 shuffle partitions meant a
    stream-stream join spun up 32×4 state-store instances per
    micro-batch — measured 25.4 s → 11.8 s on the seed-11 band-join
    replay at 4 partitions, identical results (partition count is not a
    result property; every test here asserts against a batch analog or
    a reference replay anyway).
    """
    from mapreduce_hw05_spark.plans.streaming_queries import (
        _replay_state_partitions,
    )

    name = "sink_" + uuid.uuid4().hex[:8]
    root = os.path.join(SCRATCH, name)
    replay = FileReplay(spark, chunks, root)
    with _replay_state_partitions(spark, replay):
        stream_df = op(replay.stream(schema) if schema else replay.stream())
        ckpt = os.path.join(root, "ckpt")
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            while replay.push_next():
                q.processAllAvailable()
            q.processAllAvailable()
        finally:
            q.stop()
    out = spark.table(name)
    out = out.localCheckpoint()  # detach from the stopped query
    shutil.rmtree(root, ignore_errors=True)
    return out


def as_sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_batch_equivalence(spark, events):
    """st-1: streaming tumbling counts == batch analog after full replay."""
    got = replay_through(
        spark, time_ordered_chunks(events, "ts", 5), ops.tumbling_counts, "complete"
    )
    expect = (
        events.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
    assert as_sorted_rows(got) == as_sorted_rows(expect)


def test_sliding_batch_equivalence(spark, events):
    """st-2: sliding windows — every event in exactly 2 windows."""
    got = replay_through(
        spark, time_ordered_chunks(events, "ts", 4), ops.sliding_counts, "complete"
    )
    n_events = events.count()
    assert got.agg(F.sum("n_events")).first()[0] == 2 * n_events


def test_session_window_batch_equivalence(spark, events):
    """st-3: native session_window session counts == lag+cumsum operator."""
    from mapreduce_hw05_spark.operators.sessions import session_stats

    got = replay_through(
        spark,
        time_ordered_chunks(events, "ts", 5),
        lambda s: ops.session_window_stats(s, gap="30 minutes"),
        "complete",
    )
    got_per_user = got.groupBy("user_id").agg(F.count("*").alias("n_sessions"))
    expect_per_user = (
        session_stats(events, "user_id", "ts", 1800, ("event_id",))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
    )
    assert as_sorted_rows(got_per_user) == as_sorted_rows(expect_per_user)


def test_watermark_drops_late_rows(spark, events):
    """st-4: a row arriving far behind the watermark is dropped (append mode)."""
    on_time = events.filter(F.col("event_id") != 0)
    late_row = events.filter(F.col("event_id") == 0).withColumn(
        "ts", F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    )
    # chunk order: all on-time data first (advances watermark to stream end),
    # then one chunk containing only the very-late row
    chunks = time_ordered_chunks(on_time, "ts", 3) + [late_row]
    got = replay_through(
        spark, chunks, lambda s: ops.tumbling_counts(s, watermark="10 minutes"), "append"
    )
    # append mode only emits finalized windows; the late row's window
    # (2024-01-01 00:00) was finalized long before it arrived → dropped.
    late_epoch = 1704067200  # 2024-01-01T00:00:00Z
    late_window = got.filter(
        (F.col("hour_epoch") == late_epoch) & (F.col("event_type").isNotNull())
    )
    on_time_first_hour = on_time.filter(
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) == late_epoch
    ).count()
    emitted = late_window.agg(F.coalesce(F.sum("n_events"), F.lit(0))).first()[0]
    assert emitted == on_time_first_hour  # late row not counted


def test_streaming_dedup(spark, events):
    """st-5: duplicated chunk is emitted once (dropDuplicates state)."""
    chunks = time_ordered_chunks(events, "ts", 3)
    chunks = [chunks[0], chunks[0], chunks[1], chunks[2]]  # replay chunk 0 twice
    got = replay_through(spark, chunks, ops.dedup_events, "append")
    assert got.count() == events.count()
    assert got.select("event_id").distinct().count() == events.count()


def test_stream_static_join(spark, events):
    """st-6: stream-static broadcast join enriches every event."""
    customer = load_table(spark, SF_DIR, "customer")
    got = replay_through(
        spark,
        time_ordered_chunks(events, "ts", 3),
        lambda s: ops.enrich_with_users(s, customer),
        "append",
    )
    assert got.count() == events.count()
    # user_id domain ⊂ custkey domain at this SF → every row enriched
    n_users = customer.count()
    matched = got.filter(F.col("c_mktsegment").isNotNull()).count()
    assert matched == events.filter(F.col("user_id") < n_users).count()


def test_stateful_user_counts(spark, events):
    """st-7: applyInPandasWithState running counts converge to batch totals."""
    got = replay_through(
        spark, time_ordered_chunks(events, "ts", 4), ops.stateful_user_counts, "update"
    )
    # memory sink in update mode appends each emission; last per user wins
    from pyspark.sql import Window as W

    latest = (
        got.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id").orderBy(F.col("n_events").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "sum_value")
    )
    expect = events.groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value")
    )
    assert as_sorted_rows(latest) == as_sorted_rows(expect)


def test_stateful_user_counts_v2(spark, events):
    """st-7 on the transformWithState v2 API: same batch totals.

    The v2 state server speaks protobuf; this container ships PySpark
    without ``google.protobuf``, so the test (not the operator) is
    gated — on a full install it runs as-is.
    """
    pytest.importorskip("google.protobuf.descriptor")
    got = replay_through(
        spark,
        time_ordered_chunks(events, "ts", 4),
        ops.stateful_user_counts_v2,
        "update",
    )
    from pyspark.sql import Window as W

    latest = (
        got.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id").orderBy(F.col("n_events").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "sum_value")
    )
    expect = events.groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value")
    )
    assert as_sorted_rows(latest) == as_sorted_rows(expect)


def test_stream_upsert_foreachbatch(spark, events, tmp_path):
    """foreachBatch MERGE sink: after replaying all chunks, the parquet
    state table holds exactly the latest event per user."""
    state = str(tmp_path / "state")
    root = str(tmp_path / "replay")
    replay = FileReplay(spark, time_ordered_chunks(events, "ts", 4), root)
    q = ops.stream_upsert_foreachbatch(
        replay.stream(), state, str(tmp_path / "ckpt")
    ).start()
    try:
        while replay.push_next():
            q.processAllAvailable()
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(state)
    from pyspark.sql import Window as W

    expect = (
        events.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id").orderBy(
                    F.col("ts").desc(), F.col("event_id").desc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    assert got.count() == expect.count()
    a = as_sorted_rows(got.select("user_id", "event_id"))
    b = as_sorted_rows(expect.select("user_id", "event_id"))
    assert a == b


def test_exactly_once_sink_batch_manifest_guard(spark, tmp_path):
    """A re-delivered foreachBatch batch id must be a no-op: the additive
    sink is duplicate-sensitive by design, so the committed-batch
    manifest inside the state dir is what makes it exactly-once."""
    from mapreduce_hw05_spark.streaming.ops import (
        stream_exactly_once_agg_foreachbatch,
    )

    state = str(tmp_path / "state")
    batch = spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 2.0)], "user_id long, value double"
    )

    # Capture the foreachBatch callable without starting a real stream:
    # the factory only touches stream.writeStream.foreachBatch(...).
    captured = {}

    class _CaptureWriter:
        def foreachBatch(self, fn):
            captured["fn"] = fn
            return self

        def outputMode(self, *_):
            return self

        def option(self, *_):
            return self

    class _FakeStream:
        writeStream = _CaptureWriter()

    stream_exactly_once_agg_foreachbatch(_FakeStream(), state, str(tmp_path / "ckpt"))
    apply_batch = captured["fn"]

    def snapshot():
        return {
            r["user_id"]: (r["n_events"], r["sum_value"])
            for r in spark.read.parquet(state).collect()
        }

    apply_batch(batch, 0)
    first = snapshot()
    assert first == {1: (2, 15.0), 2: (1, 2.0)}

    apply_batch(batch, 0)  # re-delivery of a committed batch -> no-op
    assert snapshot() == first

    apply_batch(batch, 1)  # a new batch id does merge additively
    assert snapshot() == {1: (4, 30.0), 2: (2, 4.0)}
    assert sorted(os.listdir(os.path.join(state, "_batches"))) == ["0", "1"]


def test_compacting_sink_bounds_file_count(spark, tmp_path):
    """After a 6-batch replay with max_files=4 → target 1, the sink dir
    must hold far fewer part files than batches, and its contents must
    equal the input exactly."""
    import glob

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    out = str(tmp_path / "out")
    replay = FileReplay(
        spark, time_ordered_chunks(events, "ts", 6), str(tmp_path / "in")
    )
    q = ops.stream_append_compacting_sink(
        replay.stream(), out, str(tmp_path / "ckpt"), max_files=4, target_files=1
    ).start()
    try:
        while replay.push_next():
            q.processAllAvailable()
        q.processAllAvailable()
    finally:
        q.stop()
    n_files = len(glob.glob(out + "/part-*") + glob.glob(out + "/b*-*.parquet"))
    assert n_files <= 4, n_files  # 6 batches appended, compaction fired
    got = spark.read.parquet(out)
    assert got.count() == events.count()
    assert got.select(F.sum("user_id")).first()[0] == \
        events.select(F.sum("user_id")).first()[0]


def _capture_foreach_batch(factory, *args, **kwargs):
    """Extract a sink factory's foreachBatch callable without starting a
    real stream (the factories only touch stream.writeStream...)."""
    captured = {}

    class _CaptureWriter:
        def foreachBatch(self, fn):
            captured["fn"] = fn
            return self

        def outputMode(self, *_):
            return self

        def option(self, *_):
            return self

    class _FakeStream:
        writeStream = _CaptureWriter()

    factory(_FakeStream(), *args, **kwargs)
    return captured["fn"]


def test_sketch_rollup_sink_survives_crash_mid_swap(spark, tmp_path):
    """Same crash window as the agg sink, for the theta-sketch rollup
    state: a fully-written .next left by a crash between the two swap
    renames must be rolled forward with its committed-batch manifest, so
    the replayed batch neither resets nor double-merges the sketches."""
    import os

    from mapreduce_hw05_spark.operators.theta_sketch import ThetaSketch
    from mapreduce_hw05_spark.streaming.ops import (
        stream_sketch_rollup_foreachbatch,
    )

    state = str(tmp_path / "state")

    class _S:
        pass

    batch = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 7)], "k string, v long"
    )

    captured = {}

    class _CaptureWriter:
        def foreachBatch(self, fn):
            captured["fn"] = fn
            return self

        def outputMode(self, *_):
            return self

        def option(self, *_):
            return self

    fake = _S()
    fake.schema = batch.schema  # the factory derives state_schema from it
    fake.writeStream = _CaptureWriter()
    stream_sketch_rollup_foreachbatch(
        fake, ["k"], "v", state, str(tmp_path / "ckpt"), k=64
    )
    apply_batch = captured["fn"]

    def estimates():
        return {
            r["k"]: round(
                ThetaSketch.deserialize(bytes(r["sketch"])).estimate(), 3
            )
            for r in spark.read.parquet(state).collect()
        }

    apply_batch(batch, 0)
    batch2 = spark.createDataFrame([("a", 3), ("b", 7)], "k string, v long")
    apply_batch(batch2, 1)
    post = estimates()
    assert post == {"a": 3.0, "b": 1.0}

    # crash: state fully swapped out to .next, dst missing
    os.rename(state, state + ".next")
    apply_batch(batch2, 1)  # replay: roll forward, marker makes it a no-op
    assert estimates() == post
    assert sorted(os.listdir(os.path.join(state, "_batches"))) == ["0", "1"]


def test_sketch_rollup_distributed_state_matches_driver_state(spark, tmp_path):
    """The distributed-state fallback (VERDICT r3 item 5): the same
    micro-batch sequence run through (a) the driver-side state path,
    (b) the forced distributed path, and (c) a threshold that flips the
    mode mid-stream must all produce BIT-IDENTICAL sketch state — the
    KMV union is associative and order-independent, so the merge
    topology must not leak into the persisted bytes."""
    from mapreduce_hw05_spark.operators.theta_sketch import ThetaSketch
    from mapreduce_hw05_spark.streaming.ops import (
        stream_sketch_rollup_foreachbatch,
    )

    batches = [
        spark.createDataFrame(
            [(f"k{i % 5}", i * 37 + j) for i in range(20) for j in range(3)],
            "k string, v long",
        )
        for _ in range(3)
    ]
    batches[1] = spark.createDataFrame(
        [(f"k{i % 7}", i * 11) for i in range(40)], "k string, v long"
    )

    def run(state, **kw):
        class _S:
            pass

        fake = _S()
        fake.schema = batches[0].schema
        fake.writeStream = type(
            "_W",
            (),
            {
                "foreachBatch": lambda s, fn: (captured.__setitem__("fn", fn), s)[1],
                "outputMode": lambda s, *_: s,
                "option": lambda s, *_: s,
            },
        )()
        captured = {}
        stream_sketch_rollup_foreachbatch(
            fake, ["k"], "v", state, state + "_ckpt", k=64, **kw
        )
        for i, b in enumerate(batches):
            captured["fn"](b, i)
        return {
            r["k"]: (
                ThetaSketch.deserialize(bytes(r["sketch"])).theta,
                tuple(ThetaSketch.deserialize(bytes(r["sketch"])).hashes),
            )
            for r in spark.read.parquet(state).collect()
        }

    driver = run(str(tmp_path / "drv"))                          # always driver
    distributed = run(str(tmp_path / "dst"), max_driver_keys=-1)  # always distributed
    crossing = run(str(tmp_path / "mix"), max_driver_keys=5)      # flips after batch 0
    assert driver == distributed
    assert driver == crossing
    assert len(driver) == 7  # k0..k6 across the two key shapes


def test_sketch_rollup_distributed_replayed_batch_is_noop(spark, tmp_path):
    """Exactly-once on the distributed path: a re-delivered batch id is
    absorbed by the committed-batch manifest, same as driver-side."""
    from mapreduce_hw05_spark.operators.theta_sketch import ThetaSketch
    from mapreduce_hw05_spark.streaming.ops import (
        stream_sketch_rollup_foreachbatch,
    )

    state = str(tmp_path / "state")

    # built directly — the shared helper can't inject the schema attr
    class _S:
        pass

    batch = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 7)], "k string, v long"
    )
    captured = {}
    fake = _S()
    fake.schema = batch.schema
    fake.writeStream = type(
        "_W",
        (),
        {
            "foreachBatch": lambda s, fn: (captured.__setitem__("fn", fn), s)[1],
            "outputMode": lambda s, *_: s,
            "option": lambda s, *_: s,
        },
    )()
    stream_sketch_rollup_foreachbatch(
        fake, ["k"], "v", state, str(tmp_path / "ckpt"), k=64,
        max_driver_keys=-1,
    )
    apply = captured["fn"]
    apply(batch, 0)

    def estimates():
        return {
            r["k"]: round(
                ThetaSketch.deserialize(bytes(r["sketch"])).estimate(), 3
            )
            for r in spark.read.parquet(state).collect()
        }

    first = estimates()
    assert first == {"a": 2.0, "b": 1.0}
    apply(batch, 0)  # re-delivery: manifest makes it a no-op
    assert estimates() == first
    import os

    assert os.listdir(os.path.join(state, "_batches")) == ["0"]


def test_stream_count_min_sink_exact_and_replay_noop(spark, tmp_path):
    """The streaming CMS sink folds batch partials into one persisted
    blob: estimates equal exact counts in the sparse regime, and a
    re-delivered batch id is absorbed by the manifest (no double-add —
    CMS is duplicate-SENSITIVE, a replayed merge would inflate)."""
    import numpy as np

    from mapreduce_hw05_spark.operators.count_min import CountMinSketch
    from mapreduce_hw05_spark.streaming import ops

    state = str(tmp_path / "state")
    apply_batch = _capture_foreach_batch(
        ops.stream_count_min_foreachbatch,
        "k", state, str(tmp_path / "ckpt"),
    )
    b0 = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    b1 = spark.createDataFrame([("a",), ("c",), ("c",)], "k string")
    apply_batch(b0, 0)
    apply_batch(b1, 1)

    def estimates():
        blob = spark.read.parquet(state).collect()[0]["sketch"]
        sk = CountMinSketch.deserialize(bytes(blob))
        return list(sk.query_many(np.array(["a", "b", "c"], dtype=object)))

    assert estimates() == [3, 1, 2]
    apply_batch(b1, 1)  # at-least-once re-delivery: must not double-add
    assert estimates() == [3, 1, 2]


def test_stream_near_dup_filter_admission_and_replay(spark, tmp_path):
    """The online admission filter: a doc is admitted iff no earlier-id
    doc seen so far is a >=0.8 near-dup — across batches (vs the
    persisted index) AND within a batch; re-delivering a batch id must
    reconverge to the same state (idempotent partition overwrites)."""
    import os

    from mapreduce_hw05_spark.streaming import ops

    state_root = str(tmp_path / "state")
    apply_batch = _capture_foreach_batch(
        ops.stream_near_dup_filter_foreachbatch,
        "doc_id", "text", state_root, str(tmp_path / "ckpt"),
    )
    uniq1 = " ".join(f"w{i}" for i in range(20))
    uniq2 = " ".join(f"x{i}" for i in range(20))
    uniq3 = " ".join(f"y{i}" for i in range(20))
    b0 = spark.createDataFrame(
        [(1, uniq1), (2, uniq2)], "doc_id long, text string"
    )
    b1 = spark.createDataFrame(
        [(3, uniq1),   # near-dup of doc 1 (earlier batch) -> dropped
         (4, uniq3),   # admitted
         (5, uniq3)],  # near-dup of doc 4 (same batch) -> dropped
        "doc_id long, text string",
    )
    apply_batch(b0, 0)
    apply_batch(b1, 1)

    def admitted():
        return {
            r["doc_id"]
            for r in spark.read.parquet(os.path.join(state_root, "admitted"))
            .collect()
        }

    assert admitted() == {1, 2, 4}
    apply_batch(b1, 1)  # at-least-once re-delivery
    assert admitted() == {1, 2, 4}


def test_stream_near_dup_filter_shingle_mode(spark, tmp_path):
    """shingle=2 switches both signatures and verify to word-bigram
    sets: a token-SHUFFLED copy (identical unigram set) must be
    ADMITTED in shingle mode and DROPPED in unigram mode."""
    import os

    from mapreduce_hw05_spark.streaming import ops

    base = " ".join(f"t{i}" for i in range(30))
    shuffled = " ".join(f"t{i}" for i in reversed(range(30)))
    b0 = spark.createDataFrame([(1, base)], "doc_id long, text string")
    b1 = spark.createDataFrame([(2, shuffled)], "doc_id long, text string")

    def admitted(shingle):
        root = str(tmp_path / f"s{shingle}")
        apply_batch = _capture_foreach_batch(
            ops.stream_near_dup_filter_foreachbatch,
            "doc_id", "text", root, root + "_ckpt", shingle=shingle,
        )
        apply_batch(b0, 0)
        apply_batch(b1, 1)
        return {
            r["doc_id"]
            for r in spark.read.parquet(os.path.join(root, "admitted"))
            .collect()
        }

    assert admitted(1) == {1}      # unigram: shuffled copy is a dup
    assert admitted(2) == {1, 2}   # shingle: order matters, admitted


def test_compacting_sink_replayed_batch_is_noop(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering a committed batch id
    to the compacting append sink must not duplicate rows (ADVICE r2
    item 2), including when the batch's files were already compacted
    away."""
    out = str(tmp_path / "out")
    apply_batch = _capture_foreach_batch(
        ops.stream_append_compacting_sink, out, str(tmp_path / "ckpt"),
        2, 1,  # max_files, target_files — force compaction quickly
    )
    batch = spark.createDataFrame(
        [(1, 10.0), (2, 2.0)], "user_id long, value double"
    )

    apply_batch(batch, 0)
    assert spark.read.parquet(out).count() == 2
    apply_batch(batch, 0)  # immediate re-delivery
    assert spark.read.parquet(out).count() == 2

    for bid in (1, 2, 3):  # trips compaction (max_files=2)
        apply_batch(batch, bid)
    total = spark.read.parquet(out).count()
    assert total == 8
    # re-deliver an old batch AFTER compaction rewrote its files
    apply_batch(batch, 2)
    assert spark.read.parquet(out).count() == total


def test_exactly_once_sink_survives_crash_mid_swap(spark, tmp_path):
    """Simulate a crash between the two renames of the state swap: on
    the next batch the sink must recover the fully-written .next state
    (roll-forward) instead of restarting from nothing — the silent
    state-reset bug of the old rmtree-then-rename swap."""
    import os

    from mapreduce_hw05_spark.streaming.ops import (
        stream_exactly_once_agg_foreachbatch,
    )

    state = str(tmp_path / "state")
    apply_batch = _capture_foreach_batch(
        stream_exactly_once_agg_foreachbatch, state, str(tmp_path / "ckpt")
    )
    batch = spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 2.0)], "user_id long, value double"
    )

    apply_batch(batch, 0)
    apply_batch(batch, 1)
    expect = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(state).collect()
    }
    assert expect == {1: (4, 30.0), 2: (2, 4.0)}

    # crash injection: state was renamed aside, .next (complete, with
    # batch-2 merged + its marker) not yet renamed in
    os.rename(state, state + ".next")      # stand-in for the written tmp
    os.rename(state + ".next", state + ".old")
    # now simulate the real window: .old holds pre-batch state, .next
    # holds post-batch state. Rebuild both sides explicitly:
    os.rename(state + ".old", state)
    apply_batch(batch, 2)                  # commits batch 2 normally
    post = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(state).collect()
    }
    os.rename(state, state + ".next")      # crash left only .next
    apply_batch(batch, 2)                  # replay: recover + marker no-op
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(state).collect()
    }
    assert got == post  # state rolled forward, replayed batch a no-op


def test_heavy_hitters_sink_survives_crash_mid_swap(spark, tmp_path):
    """Crash-mid-swap + replayed-batch semantics for the space-saving
    frequent-items sink: a dangling .next rolls forward with its
    manifest, and the re-delivered batch id is a no-op (no double
    counting)."""
    import os

    from mapreduce_hw05_spark.streaming.ops import (
        stream_heavy_hitters_foreachbatch,
    )

    state = str(tmp_path / "hh_state")
    apply_batch = _capture_foreach_batch(
        stream_heavy_hitters_foreachbatch, "k", state,
        str(tmp_path / "ckpt"), 64,
    )

    def counts():
        return {
            r["k"]: (r["count"], r["err"])
            for r in spark.read.parquet(state).collect()
        }

    b0 = spark.createDataFrame(
        [("a",), ("a",), ("b",)], "k string"
    )
    b1 = spark.createDataFrame([("a",), ("c",)], "k string")
    apply_batch(b0, 0)
    apply_batch(b1, 1)
    post = counts()
    assert post == {"a": (3, 0), "b": (1, 0), "c": (1, 0)}

    os.rename(state, state + ".next")  # crash between the two renames
    apply_batch(b1, 1)  # replay: roll forward; marker makes it a no-op
    assert counts() == post
    assert sorted(os.listdir(os.path.join(state, "_batches"))) == ["0", "1"]


def test_weighted_reservoir_sink_survives_crash_mid_swap(spark, tmp_path):
    """Crash-mid-swap + replayed-batch semantics for the weighted
    reservoir sink, and the fold property: per-batch top-k merged into
    state equals the global top-k over all delivered rows."""
    import os

    from mapreduce_hw05_spark.operators.sampling import weighted_sample
    from mapreduce_hw05_spark.streaming.ops import (
        stream_weighted_reservoir_foreachbatch,
    )

    state = str(tmp_path / "res_state")
    apply_batch = _capture_foreach_batch(
        stream_weighted_reservoir_foreachbatch, "id", "w", 5,
        state, str(tmp_path / "ckpt"),
    )
    b0 = spark.createDataFrame(
        [(i, float(10 + i)) for i in range(1, 8)], "id long, w double"
    )
    b1 = spark.createDataFrame(
        [(i, float(100 * i)) for i in range(8, 12)], "id long, w double"
    )
    apply_batch(b0, 0)
    apply_batch(b1, 1)

    def reservoir():
        return {r["id"] for r in spark.read.parquet(state).collect()}

    expect = {
        r["id"]
        for r in weighted_sample(b0.union(b1), "id", "w", 5).collect()
    }
    post = reservoir()
    assert post == expect

    os.rename(state, state + ".next")  # crash between the two renames
    apply_batch(b1, 1)  # replay: roll forward; marker makes it a no-op
    assert reservoir() == post
    assert sorted(os.listdir(os.path.join(state, "_batches"))) == ["0", "1"]


def test_additive_rollup_sink_manifest_guard_and_merge(spark, tmp_path):
    """The generic additive rollup sink: per-batch deltas fold by
    per-alias re-sum, a re-delivered batch id is a no-op, and the final
    state equals the batch aggregate of the union of all chunks."""
    import datetime as dt

    from mapreduce_hw05_spark.plans.events_queries import hourly_value_stats
    from mapreduce_hw05_spark.streaming.ops import (
        stream_additive_rollup_foreachbatch,
    )

    state = str(tmp_path / "state")
    base = dt.datetime(2024, 1, 1)
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "ts timestamp, event_type string, value double"
    )
    b0 = mk([(base, "click", 1.5), (base, "click", 2.5)])
    b1 = mk([(base, "click", 4.0), (base + dt.timedelta(hours=1), "view", 8.0)])

    captured = {}

    class _CaptureWriter:
        def foreachBatch(self, fn):
            captured["fn"] = fn
            return self

        def outputMode(self, *_):
            return self

        def option(self, *_):
            return self

    class _FakeStream:
        writeStream = _CaptureWriter()

    stream_additive_rollup_foreachbatch(
        _FakeStream(), state, str(tmp_path / "ckpt"),
        ["event_type", "hour_epoch"], hourly_value_stats,
    )
    apply_batch = captured["fn"]

    def snapshot():
        return {
            (r["event_type"], r["hour_epoch"]): (r["s"], r["n"])
            for r in spark.read.parquet(state).collect()
        }

    apply_batch(b0, 0)
    epoch0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
    assert snapshot() == {("click", epoch0): (4000, 2)}

    apply_batch(b0, 0)  # re-delivery -> no-op
    assert snapshot() == {("click", epoch0): (4000, 2)}

    apply_batch(b1, 1)
    assert snapshot() == {
        ("click", epoch0): (8000, 3),
        ("view", epoch0 + 3600): (8000, 1),
    }

"""Distributed exact global ranking / prefix sums.

An unpartitioned ``Window.orderBy(...)`` is the textbook 100-TB killer:
Catalyst compiles it to a SINGLE-partition sort, so every row in the
corpus funnels through one task regardless of cluster size. Spark's own
``orderBy`` avoids that with a range shuffle (sampled boundaries →
balanced sorted partitions) but offers no built-in way to turn the
result into global ranks or running totals without re-introducing the
one-partition window.

:func:`global_cumsum` completes the pattern with the classic two-pass
construction (the same shape as the repo's two-pass exact-quantile
histograms — see ``plans/analytics_queries.py`` an-5):

1. ``repartitionByRange`` + ``sortWithinPartitions`` on the order keys —
   ONE range shuffle, the identical cost Spark's ``orderBy`` pays; a
   ``localCheckpoint`` pins the partitioned layout so both passes read
   it once.
2. Per-partition totals AND row counts of the summed columns — a tiny
   aggregate (one output row per shuffle partition), collected to the
   driver and turned into EXCLUSIVE per-partition offsets. This is
   bounded by the partition count, never by the data.
3. The per-partition running sum, by COUNTED physical routing (the
   count rides the pass-2 totals — zero extra actions):

   - while the largest partition fits ``JVM_WINDOW_PARTITION_ROWS``,
     a ``Window.partitionBy(__pid)`` running sum plus the broadcast
     offset — whole-stage-codegen JVM work; pays one hash exchange on
     __pid but measured 2.5× faster than the Arrow path at 10 M rows
     (PERF.md r8 A/B);
   - past the cap, ``mapInPandas`` with an Arrow-vectorized ``cumsum``
     per batch and a cross-batch carry initialised from the partition's
     offset (no join, the checkpointed sort order is untouched). The
     Python workers' separate memory makes this the safe route for
     oversized partitions: the JVM window's per-task sort OOMed a
     shared 32-thread heap at ~3 M rows/partition where the Arrow path
     ran fine (PERF.md r8 A/B). The routes are result-identical for
     integer sums (exact arithmetic, forced-route test). For floating
     sums both routes emit DOUBLE (FloatType inputs upcast before
     accumulating, so routing can never change the output schema), but
     the two associate additions differently once a partition spans
     multiple Arrow batches ((per-batch cumsum)+carry vs
     whole-partition running sum+offset) — double values may differ in
     the last ulps there; test_ranks.py pins the tolerance with a
     forced 64-row Arrow batch size.

The result is an exact, deterministic global prefix sum with no
single-task stage and no corpus-sized driver state: max parallelism =
``num_partitions`` on pass 3, and partition-boundary placement cannot
affect values (offsets absorb whatever the range sampler chose).

Determinism requires the order keys to be UNIQUE per row (pass a
tie-breaking key, or pre-aggregate to one row per key as the AUC
midrank consumer does); rows that compare equal would receive
order-dependent intermediate sums. Summed columns may contain nulls:
a null contributes 0 to the running total on BOTH routes, implemented
as ONE JVM-side ``coalesce(cast(c), 0)`` into a typed temp column
BEFORE the routes split (ADVICE r9 + r10 review). Doing it before the
split is load-bearing twice over: a worker-side ``fillna`` cannot
distinguish Spark NULL from a genuine NaN data value after Arrow
conversion (it would zero NaNs the JVM window sum propagates), and a
nullable long column reaches pandas as float64, silently rounding
values past 2**53 (the non-null temp stays exact int64 end-to-end).
Consequently: nulls read as 0 (matching SQL's null-skipping window
sum everywhere except an all-null global prefix, where SQL yields
NULL and ``cum_<c>`` yields 0 — null is "absent", never "unknown"),
and routing cannot change results, types, or precision (forced-route
null/2**53 tests in test_ranks.py). NON-FINITE doubles (NaN/inf) are
REJECTED up front: the JVM window sum would propagate them but
Spark's pandas serializer encodes NaN as NULL on the Arrow return
path (measured — a NaN cannot round-trip ``mapInPandas``), so no
implementation could make the routes agree; detection rides the
already-collected offsets pass for free. Same policy as DECIMAL
inputs, whose running sums widen precision differently per route and
are likewise rejected rather than silently diverging.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

__all__ = ["global_cumsum", "distributed_ntile"]

#: integer-kind Spark simpleStrings whose running sum stays integral
_INT_KINDS = {"tinyint", "smallint", "int", "bigint", "long"}

#: Counted route gate: largest partition row count at which the running
#: sum runs as a JVM window over __pid instead of mapInPandas. Measured
#: on this rig (PERF.md r8 A/B): 390 k rows/partition sorted fine, 3.1 M
#: rows/partition × 32 concurrent window sorts OOMed the shared heap;
#: 1 M leaves 3× headroom while keeping the fast JVM route for every
#: sanely-partitioned input. Cluster deployments with per-executor heaps
#: can raise it.
JVM_WINDOW_PARTITION_ROWS = 1_000_000


def global_cumsum(
    df: DataFrame,
    order_exprs: list[Column],
    sum_cols: list[str],
    num_partitions: int | None = None,
    include_totals: bool = False,
) -> DataFrame:
    """Append exact global running totals ``cum_<c>`` (inclusive, in the
    total order given by ``order_exprs``) for each ``c`` in
    ``sum_cols`` — without a single-partition window.

    With ``include_totals`` each grand total is also attached as a
    literal column ``tot_<c>`` (driver-known after the offset pass, so
    it costs nothing extra) — consumers like exact ntile need N in the
    same expression as the rank.

    A global rank / row_number is the special case
    ``global_cumsum(df.withColumn("one", F.lit(1L)), ..., ["one"])``
    → ``cum_one``.
    """
    spark = df.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    int_kind = {
        c: df.schema[c].dataType.simpleString() in _INT_KINDS
        for c in sum_cols
    }
    bad = [
        c
        for c in sum_cols
        if not int_kind[c]
        and df.schema[c].dataType.simpleString() not in ("float", "double")
    ]
    if bad:
        raise TypeError(
            f"global_cumsum sum_cols must be integer or float/double kind; "
            f"got {[(c, df.schema[c].dataType.simpleString()) for c in bad]} "
            "— cast DECIMAL inputs first (running-sum precision widening "
            "differs between the JVM and Arrow routes)"
        )
    # FloatType inputs accumulate in DOUBLE on BOTH routes (the JVM
    # window sum of float is already double; the Arrow route upcasts to
    # float64 below) so output schema and precision cannot depend on the
    # routing threshold (ADVICE r8). Integer kinds stay LONG.

    # Null handling happens HERE, once, JVM-side (r10 review fix): each
    # sum_col is coalesced to 0 and upcast into a typed temp BEFORE the
    # routes split, so (a) the Arrow route's pandas column arrives as
    # non-null int64 — never the nullable-long→float64 conversion that
    # would round values past 2^53 and break integer exactness; (b) a
    # genuine NaN DATA value (distinct from NULL) propagates through
    # sum/cumsum/off_map identically on both routes, instead of being
    # conflated with NULL by a worker-side fillna (pandas cannot tell
    # Spark NULL from NaN after Arrow conversion — so the fill must
    # happen where the distinction still exists).
    sum_exprs = {
        f"__sum_{c}": F.coalesce(
            F.col(c).cast("long" if int_kind[c] else "double"),
            F.lit(0).cast("long" if int_kind[c] else "double"),
        )
        for c in sum_cols
    }
    part = (
        df.withColumns(sum_exprs)
        .repartitionByRange(n_part, *order_exprs)
        .sortWithinPartitions(*order_exprs)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )

    totals = part.groupBy("__pid").agg(
        F.count("*").alias("__nrows"),
        *[F.sum(f"__sum_{c}").alias(c) for c in sum_cols],
    )
    # driver-sized: one row per shuffle partition (n_part), never data-sized
    rows = sorted(totals.collect(), key=lambda r: r["__pid"])
    # Fail fast on non-finite data (r10 review): a NaN/inf double is a
    # DATA value, not a NULL — the JVM window sum would propagate it
    # while the Arrow return path CANNOT (Spark's pandas serializer
    # encodes NaN as NULL — measured, PERF.md r10), so results would be
    # route-dependent. Detection is free: Spark's SUM propagates NaN
    # and overflows to ±inf, so any poisoned partition shows a
    # non-finite total in the offsets pass already collected above.
    # Same up-front-rejection policy as DECIMAL inputs.
    import math

    for r in rows:
        for c in sum_cols:
            if not int_kind[c] and not math.isfinite(r[c] or 0.0):
                raise ValueError(
                    f"global_cumsum: non-finite value (NaN/inf) or an "
                    f"overflowing running total in sum_col {c!r} — the "
                    "check is on per-partition SUMS, so all-finite "
                    "inputs whose total overflows to ±inf are also "
                    "rejected (ADVICE r10). Running totals over "
                    "non-finite doubles are route-dependent (the Arrow "
                    "path cannot represent NaN distinctly from NULL); "
                    "clean, filter, or rescale the column first"
                )
    max_part_rows = max((r["__nrows"] for r in rows), default=0)
    off_map: dict[int, dict[str, float]] = {}
    run = {c: 0 for c in sum_cols}
    for r in rows:
        off_map[r["__pid"]] = dict(run)
        for c in sum_cols:
            run[c] += r[c] or 0

    if max_part_rows <= JVM_WINDOW_PARTITION_ROWS:
        # JVM route: running sum as a __pid-partitioned window (codegen)
        # + broadcast offsets. One extra hash exchange on __pid; 2.5×
        # faster than the Arrow path when partitions fit the heap.
        from pyspark.sql import Window

        off_df = spark.createDataFrame(
            [
                (pid, *[offs[c] if int_kind[c] else float(offs[c])
                        for c in sum_cols])
                for pid, offs in off_map.items()
            ]
            or [(0, *[0 for _ in sum_cols])],
            StructType(
                [part.schema["__pid"]]
                + [
                    StructField(
                        f"__off_{c}",
                        LongType() if int_kind[c] else DoubleType(),
                    )
                    for c in sum_cols
                ]
            ),
        )
        w = Window.partitionBy("__pid").orderBy(*order_exprs).rowsBetween(
            Window.unboundedPreceding, 0
        )
        # driver-sized: one offset row per shuffle partition
        out = part.join(F.broadcast(off_df), "__pid")
        for c in sum_cols:
            # __sum_<c> is non-null by construction and the frame always
            # holds ≥1 row, so this window sum can never be NULL — no
            # coalesce needed (nulls became 0 before the routes split)
            cum_col = F.sum(f"__sum_{c}").over(w) + F.col(f"__off_{c}")
            out = out.withColumn(
                f"cum_{c}",
                cum_col.cast("long" if int_kind[c] else "double"),
            )
        out = out.drop(
            "__pid",
            *[f"__off_{c}" for c in sum_cols],
            *[f"__sum_{c}" for c in sum_cols],
        )
    else:
        # Arrow route: per-batch cumsum with cross-batch carry in the
        # Python workers' own memory — safe for oversized partitions.
        out_fields = list(part.schema.fields) + [
            StructField(
                f"cum_{c}",
                LongType() if int_kind[c] else DoubleType(),
            )
            for c in sum_cols
        ]
        out_schema = StructType(out_fields)

        def cum(batches):
            carry = None
            for b in batches:
                if len(b) == 0:
                    continue
                if carry is None:
                    # every non-empty pid has a totals row; a miss means
                    # pid stability broke (e.g. the localCheckpoint was
                    # removed) — fail fast, never silently mis-offset
                    carry = dict(off_map[int(b["__pid"].iloc[0])])
                for c in sum_cols:
                    # __sum_<c> is non-null long/double by construction
                    # (nulls → 0 JVM-side, where NULL and NaN are still
                    # distinguishable), so this column arrives as exact
                    # int64 — never nullable-long→float64 — and a real
                    # NaN propagates through the cumsum and the carry
                    # exactly as the JVM window sum propagates it
                    base = b[f"__sum_{c}"].astype(
                        "int64" if int_kind[c] else "float64"
                    )
                    s = base.cumsum() + carry[c]
                    b = b.assign(**{f"cum_{c}": s})
                    carry[c] = s.iloc[-1]
                yield b

        out = part.mapInPandas(cum, schema=out_schema).drop(
            "__pid", *[f"__sum_{c}" for c in sum_cols]
        )

    if include_totals:
        for c in sum_cols:
            tot = run[c] if int_kind[c] else float(run[c])
            out = out.withColumn(f"tot_{c}", F.lit(tot))
    return out


def distributed_ntile(
    df: DataFrame,
    n_buckets: int,
    order_exprs: list[Column],
    num_partitions: int | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Exact SQL ``ntile(n)`` over the global order WITHOUT the
    single-partition window Catalyst compiles ``Window.orderBy`` to.

    SQL semantics — with N rows, ``q = N // n`` and ``r = N %% n``, the
    first r buckets take q+1 rows, the rest q — reproduced closed-form
    from the distributed global row number rn (:func:`global_cumsum` of
    a literal 1):

        rn <= r(q+1)  →  bucket = ceil(rn / (q+1))
        else          →  bucket = r + ceil((rn - r(q+1)) / q)

    The q=0 edge (N < n) never reaches the else branch: cut = r = N ≥
    every rn. Order keys must be a TOTAL order (tie-break on a unique
    key) — SQL ntile over tied orders is engine-nondeterministic anyway,
    and every contract here already tie-breaks. Bit-identical to
    ``F.ntile(n).over(Window.orderBy(...))`` by test
    (test_lift_deciles_ntile_arithmetic_matches_window and the oracle
    parity of every consumer).

    Returns ``df`` + a LONG ``bucket_col``; the helper columns are
    dropped.
    """
    ranked = global_cumsum(
        df.withColumn("__one", F.lit(1).cast("long")),
        order_exprs,
        ["__one"],
        num_partitions=num_partitions,
        include_totals=True,
    )
    rn, n_all = F.col("cum___one"), F.col("tot___one")
    q = F.floor(n_all / n_buckets)
    r = n_all % n_buckets
    cut = r * (q + 1)
    bucket = F.when(rn <= cut, F.ceil(rn / (q + 1))).otherwise(
        r + F.ceil((rn - cut) / q)
    )
    return ranked.withColumn(bucket_col, bucket.cast("long")).drop(
        "__one", "cum___one", "tot___one"
    )

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
2. Per-partition totals of the summed columns — a tiny aggregate
   (`one output row per shuffle partition`), collected to the driver
   and turned into EXCLUSIVE per-partition offsets. This is bounded by
   the partition count, never by the data.
3. ``mapInPandas`` over the partitioned rows: an Arrow-vectorized
   ``cumsum`` per batch with a cross-batch carry initialised from the
   partition's offset (captured as a plain dict in the UDF closure — no
   join, so the checkpointed sort order is untouched).

The result is an exact, deterministic global prefix sum with no
single-task stage and no corpus-sized driver state: max parallelism =
``num_partitions`` on pass 3, and partition-boundary placement cannot
affect values (offsets absorb whatever the range sampler chose).

Determinism requires the order keys to be UNIQUE per row (pass a
tie-breaking key, or pre-aggregate to one row per key as the AUC
midrank consumer does); rows that compare equal would receive
order-dependent intermediate sums.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

__all__ = ["global_cumsum", "distributed_ntile"]

#: integer-kind Spark simpleStrings whose running sum stays integral
_INT_KINDS = {"tinyint", "smallint", "int", "bigint", "long"}


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

    part = (
        df.repartitionByRange(n_part, *order_exprs)
        .sortWithinPartitions(*order_exprs)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )

    totals = part.groupBy("__pid").agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )
    # driver-sized: one row per shuffle partition (n_part), never data-sized
    rows = sorted(totals.collect(), key=lambda r: r["__pid"])
    off_map: dict[int, dict[str, float]] = {}
    run = {c: 0 for c in sum_cols}
    for r in rows:
        off_map[r["__pid"]] = dict(run)
        for c in sum_cols:
            run[c] += r[c] or 0

    out_fields = list(part.schema.fields) + [
        StructField(
            f"cum_{c}",
            LongType() if int_kind[c] else part.schema[c].dataType,
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
                # every non-empty pid has a totals row; `run` is a safe
                # default for the impossible miss
                carry = dict(off_map.get(int(b["__pid"].iloc[0]), run))
            for c in sum_cols:
                base = b[c].astype("int64") if int_kind[c] else b[c]
                s = base.cumsum() + carry[c]
                b = b.assign(**{f"cum_{c}": s})
                carry[c] = s.iloc[-1]
            yield b

    out = part.mapInPandas(cum, schema=out_schema).drop("__pid")
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

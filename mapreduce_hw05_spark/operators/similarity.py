"""Vector-similarity operators: brute-force cosine top-k (broadcast kernel),
kNN, and MinHash-LSH near-dedup support (SURVEY §2.11 llm-2/3/7, §4 item 2).

Physical strategy
-----------------
Per-row vector math must NOT go through Catalyst higher-order functions
(``zip_with``+``aggregate`` measured ~40× slower than a NumPy kernel at
2000×64, BASELINE.md q11). Instead:

- The *reference* side (the vectors being searched against) is collected
  once and broadcast — the same contract as a broadcast hash join's build
  side. This is the brute-force baseline, valid while the reference side
  fits in executor memory (≈ millions of 64-dim vectors).
- The *probe* side streams through ``mapInPandas`` in Arrow batches; each
  batch does one ``V @ M.T`` BLAS call in float64.
- At 100-TB scale the reference side no longer fits: gate behind LSH
  banding (near-dup) or IVF-style coarse quantization (centroid routing
  via the same kernel, then per-bucket brute force). ``minhash_signatures``
  + ``lsh_candidate_pairs`` below implement the LSH path.

All similarities are computed in float64 so results agree with a
double-precision SQL oracle to ~1e-15 (round-to-6 is then hash-stable).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("id1", T.LongType()),
        T.StructField("id2", T.LongType()),
        T.StructField("sim", T.DoubleType()),
    ]
)


def _l2_normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


#: Hard cap on broadcast-able reference rows (~2 GB at 64-dim float64).
#: Beyond this, brute force is the wrong physical strategy — route through
#: operators.ann (IVF) or LSH banding instead.
MAX_BROADCAST_REFERENCE_ROWS = 4_000_000

#: Broadcast cap for per-doc token-ARRAY tables in the exact-Jaccard
#: verify joins (batch ``lsh_jaccard_pairs`` and the streaming admission
#: filter): ~100-token string arrays put 1 M docs at low single-digit
#: GB — safely inside an executor. Past the cap the SAME joins run
#: shuffled (one extra exchange, identical results); the routing is
#: implemented, not just documented (r5 — the r4 sketch-sink lesson).
MAX_BROADCAST_TOKEN_DOCS = 1_000_000


def maybe_broadcast(
    df: DataFrame, n_rows: int, limit: int | None = None
) -> DataFrame:
    """Counted broadcast routing for row-count-proportional build sides
    (per-doc token/shingle arrays, per-doc size tables): return the
    broadcast-marked frame while ``n_rows`` fits under ``limit``, the
    frame unchanged otherwise — identical results, one extra exchange.

    ``limit`` defaults to :data:`MAX_BROADCAST_TOKEN_DOCS`, read at call
    time so tests can monkeypatch it to 0 and prove the shuffled path is
    result-identical. Static routing on a counted size, not bare AQE: a
    static sort-merge join shuffle-writes the (corpus-sized) probe side
    before AQE could convert it to a broadcast join (PERF.md negative
    result, r5)."""
    if limit is None:
        limit = MAX_BROADCAST_TOKEN_DOCS
    return F.broadcast(df) if n_rows <= limit else df


def _reference_matrix(df: DataFrame, id_col: str, vec_col: str, normalize: bool):
    """Materialize the reference side as (ids, float64 matrix).

    Driver-side collect is intentional and bounded — identical role to a
    broadcast hash join's build side. The row gate fails fast with a
    pointer to the IVF path rather than letting a 100-TB reference OOM
    the driver.
    """
    n_ref = df.count()
    if n_ref > MAX_BROADCAST_REFERENCE_ROWS:
        raise ValueError(
            f"reference side has {n_ref} rows (cap "
            f"{MAX_BROADCAST_REFERENCE_ROWS}); broadcast brute force would "
            "OOM the driver — use operators.ann.ivf_knn_candidates (IVF) "
            "or LSH banding instead"
        )
    pdf = df.select(id_col, vec_col).toPandas()  # bounded: gated by MAX_BROADCAST_REFERENCE_ROWS above
    ids = pdf[id_col].to_numpy(dtype=np.int64)
    mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    return ids, _l2_normalize(mat) if normalize else mat


def cosine_pairs_topk_per_row(
    probe: DataFrame,
    reference: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 20,
    mode: str = "pairs",
    normalize: bool = True,
) -> DataFrame:
    """Per-probe-row top-k most-cosine-similar reference vectors.

    mode='pairs': only neighbors with id2 > id1 (unordered-pair dedup) —
    the global top-k pairs are a subset of the union of per-row top-k.
    mode='knn':   all neighbors except self.

    Ties are broken by (sim rounded to 6 desc, id2 asc) so downstream
    row_number() semantics match a SQL oracle exactly. All math is
    float64 (cast + L2-normalize + dot), matching a double-precision SQL
    oracle to ~1e-15.
    """
    spark = probe.sparkSession
    ref_ids, ref_mat = _reference_matrix(reference, id_col, vec_col, normalize)
    bc = spark.sparkContext.broadcast((ref_ids, ref_mat))

    def kernel(batches):
        ids_all, mat = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            probe_ids = pdf[id_col].to_numpy(dtype=np.int64)
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if normalize:
                vecs = _l2_normalize(vecs)
            sims = vecs @ mat.T  # (batch, N) — one BLAS call per Arrow batch
            out_id1, out_id2, out_sim = [], [], []
            for row, pid in enumerate(probe_ids):
                mask = ids_all > pid if mode == "pairs" else ids_all != pid
                cand_ids = ids_all[mask]
                cand_sims = sims[row, mask]
                if cand_ids.size == 0:
                    continue
                # exact tie semantics: (-round(sim,6), id) ascending
                order = np.lexsort((cand_ids, -np.round(cand_sims, 6)))[:k]
                out_id1.append(np.full(order.size, pid, dtype=np.int64))
                out_id2.append(cand_ids[order])
                out_sim.append(cand_sims[order])
            if out_id1:
                yield pd.DataFrame(
                    {
                        "id1": np.concatenate(out_id1),
                        "id2": np.concatenate(out_id2),
                        "sim": np.concatenate(out_sim),
                    }
                )

    return probe.mapInPandas(kernel, schema=_PAIR_SCHEMA)


def global_topk_pairs(pairs: DataFrame, k: int = 20) -> DataFrame:
    """Global top-k pairs by similarity, deterministic via rounded sim + ids."""
    return (
        pairs.select("id1", "id2", F.round("sim", 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "id1", "id2")
        .limit(k)
    )


# --------------------------------------------------------------------------
# MinHash + LSH (the 100-TB near-dedup path)
# --------------------------------------------------------------------------

#: Large Mersenne prime for universal hashing (public-domain construction).
_MERSENNE = (1 << 61) - 1


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 128,
    seed: int = 42,
    shingle: int = 1,
) -> DataFrame:
    """Per-document MinHash signature (array<long>) over its token set
    (``shingle=1``) or its word-``shingle``-gram set (``shingle>=2`` —
    the order-sensitive representation real text dedup uses: a shuffled
    copy shares every unigram but almost no shingle).

    Fully batch-vectorized pandas UDF — the 100-TB near-dup pipeline's
    compute bottleneck is exactly this pass (O(total tokens)), so no
    per-token or per-document Python runs in it:

    1. tokenize the WHOLE Arrow batch with ``pyarrow.compute
       .split_pattern`` (C++, one ListArray; its offsets delimit docs),
    2. ``dictionary_encode`` the flat token array (C++), hash only the
       DISTINCT tokens in one ``pd.util.hash_array`` pass (vectorized
       64-bit SipHash, process-stable key), and evaluate the whole
       ``(a·h + b) mod p`` family once per distinct token — a
       (num_hashes × vocab) table instead of (num_hashes × tokens),
    3. per hash function, a table-gather over the token codes and one
       ``np.minimum.reduceat`` at the doc offsets — duplicates within a
       doc are harmless (min over a multiset equals min over its set),
       so no per-doc dedup either.

    Deterministic given seed. Scale: one pass, no shuffle — signatures
    are tiny (num_hashes longs) regardless of document size. Measured
    ≈5× the per-token-Python kernel it replaced at 128 hashes
    (0.45 → 2.3 M tokens/s single-core; PERF.md r3).

    ``shingle >= 2`` stays in the same vectorized shape: per-position
    token hashes (a gather from the distinct-token table) fold into
    composite shingle hashes with an FNV-style rolling combine —
    shingle STRINGS are never materialized — and the distinct-shingle
    trick replaces the distinct-token one. A document with fewer than
    ``shingle`` tokens has an empty shingle set and gets the sentinel
    all-``p`` signature (identical for all such docs — the downstream
    exact verify discards their 0/0-Jaccard pairs, and
    ``max_bucket_size`` caps the degenerate bucket if such docs are
    common).
    """
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_hashes, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_hashes, dtype=np.int64)
    if shingle < 1:
        raise ValueError(f"shingle must be >= 1, got {shingle}")

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(texts: pd.Series) -> pd.Series:
        import pyarrow as pa
        import pyarrow.compute as pc

        if texts.empty:
            return pd.Series([], dtype=object)
        arr = pc.coalesce(
            pa.array(texts, type=pa.string()), pa.scalar("", type=pa.string())
        )
        toks = pc.split_pattern(arr, " ")
        # split_pattern maps "" → [""], so every doc segment is
        # non-empty and reduceat's start indices are strictly increasing.
        offsets = toks.offsets.to_numpy()
        starts = offsets[:-1].astype(np.int64)
        dct = toks.flatten().dictionary_encode()
        codes = dct.indices.to_numpy().astype(np.int64)
        uniq = dct.dictionary.to_pandas().to_numpy()
        huniq = pd.util.hash_array(uniq).astype(np.uint64)
        au, bu = a.astype(np.uint64), b.astype(np.uint64)
        p = np.uint64(_MERSENNE)
        if shingle == 1:
            # uint64 wrap-around mul then mod p, once per DISTINCT token
            table = (au[:, None] * huniq[None, :] + bu[:, None]) % p
            sig_mat = np.empty((num_hashes, len(starts)), dtype=np.int64)
            for i in range(num_hashes):
                sig_mat[i] = np.minimum.reduceat(
                    table[i][codes], starts
                ).astype(np.int64)
            return pd.Series(list(sig_mat.T))
        # ---- shingle >= 2: composite hashes over sliding windows ----
        s = shingle
        ends = offsets[1:].astype(np.int64)
        n_toks = ends - starts
        h = huniq[codes]  # per-position token hash
        n_windows = max(len(h) - s + 1, 0)
        comb = np.zeros(n_windows, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for k in range(s):
                comb = comb * np.uint64(0x100000001B3) + h[k : n_windows + k]
        # a window is a real shingle iff it stays inside one document
        doc_of = np.repeat(np.arange(len(starts), dtype=np.int64), n_toks)
        valid = doc_of[:n_windows] == doc_of[s - 1 :]
        vals = comb[valid]  # doc-ordered, contiguous per doc
        n_sh = np.maximum(n_toks - (s - 1), 0)
        sig_mat = np.full(
            (num_hashes, len(starts)), np.int64(_MERSENNE), dtype=np.int64
        )
        if vals.size:
            sh_starts = np.concatenate(
                [[0], np.cumsum(n_sh)[:-1]]
            ).astype(np.int64)
            nz = n_sh > 0
            red_starts = sh_starts[nz]
            # Adaptive: the distinct-value table only pays when shingles
            # repeat a lot (dense/tiny-vocab corpora). Realistic corpora
            # have ~all-distinct shingles, where np.unique's sort plus a
            # (num_hashes x n_distinct) table + per-hash gather is pure
            # memory-traffic overhead (~3x measured at 45M shingles) —
            # hash the window values directly instead. Both routes
            # evaluate the identical (a·x + b) mod p values, so
            # signatures are bit-identical either way.
            sample = vals[: 4096]
            if len(np.unique(sample)) < len(sample) // 2:
                ush, ucodes = np.unique(vals, return_inverse=True)
                table = (au[:, None] * ush[None, :] + bu[:, None]) % p
                for i in range(num_hashes):
                    sig_mat[i][nz] = np.minimum.reduceat(
                        table[i][ucodes], red_starts
                    ).astype(np.int64)
            else:
                for i in range(num_hashes):
                    hv = (au[i] * vals + bu[i]) % p
                    sig_mat[i][nz] = np.minimum.reduceat(
                        hv, red_starts
                    ).astype(np.int64)
        return pd.Series(list(sig_mat.T))

    return docs.select(id_col, sig(F.col(text_col)).alias("signature"))


def lsh_band_buckets(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 32,
) -> DataFrame:
    """Explode signatures into (id, band, bucket) rows — one xxhash64
    bucket per signature band. The shared banding step of the batch
    candidate join (:func:`lsh_candidate_pairs`) and the persisted
    streaming near-dup index (streaming.ops.stream_near_dup_filter):
    two documents are LSH candidates iff they share a (band, bucket)
    row, and the rows are storable/joinable state."""
    n_hashes = len(signatures.select("signature").first()["signature"])
    rows_per_band = n_hashes // num_bands
    return signatures.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.xxhash64(
                            F.slice("signature", band * rows_per_band + 1, rows_per_band)
                        ).alias("bucket"),
                    )
                    for band in range(num_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 32,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH banding: split signatures into bands, bucket-join per band.

    Returns candidate (id1 < id2) pairs — documents sharing ≥1 identical
    band. Scale: the self-join is per (band, bucket-hash) group; no
    all-pairs product ever forms. Follow with an exact verify.

    ``max_bucket_size`` bounds the known LSH failure mode: a DEGENERATE
    bucket (constant signature — empty docs, boilerplate) forms a
    quadratic group inside the bucket join (m members → m²/2 rows per
    band). Buckets larger than the cap emit a representative STAR
    instead — (min-id, member) pairs, linear in m — which preserves
    dedup-cluster connectivity exactly (every member stays reachable
    from the representative) while bounding join output. Pair-level
    enumeration inside an oversize bucket is intentionally reduced to
    the star: all-pairs output there is inherently quadratic, so a
    consumer that needs exact pair enumeration keeps the default
    ``None`` (unchanged exact behavior, no size scan).
    """
    banded = lsh_band_buckets(signatures, id_col, num_bands)
    if max_bucket_size is None:
        left = banded.select(
            F.col(id_col).alias("id1"), F.col("band"), F.col("bucket")
        )
        right = banded.select(
            F.col(id_col).alias("id2"), F.col("band"), F.col("bucket")
        )
        return (
            left.join(right, ["band", "bucket"])
            .filter(F.col("id1") < F.col("id2"))
            .select("id1", "id2")
            .distinct()
        )
    # Size + representative per (band, bucket) via one window pass — the
    # window's hash partitioning on the join key is reused by the
    # small-bucket self-join, so the cap costs no extra exchange.
    from pyspark.sql import Window as W

    w = W.partitionBy("band", "bucket")
    sized = banded.select(
        F.col(id_col),
        "band",
        "bucket",
        F.count("*").over(w).alias("_n"),
        F.min(id_col).over(w).alias("_rep"),
    )
    small = sized.filter(F.col("_n") <= max_bucket_size)
    left = small.select(F.col(id_col).alias("id1"), "band", "bucket")
    right = small.select(F.col(id_col).alias("id2"), "band", "bucket")
    pairs_small = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
    )
    star = (
        sized.filter(
            (F.col("_n") > max_bucket_size) & (F.col(id_col) != F.col("_rep"))
        )
        .select(F.col("_rep").alias("id1"), F.col(id_col).alias("id2"))
    )
    return pairs_small.unionByName(star).distinct()


def cosine_pairs_above(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All unordered pairs (id1 < id2) with cosine ≥ threshold — the
    embedding-space analog of near-dup detection.

    Same broadcast+mapInPandas shape as the top-k kernel; the threshold
    filter happens inside the NumPy batch so only qualifying pairs ever
    materialize as rows. At reference sizes beyond executor memory this
    routes through IVF bucketing (operators.ann) with threshold instead
    of top-k selection.
    """
    spark = df.sparkSession
    ref_ids, ref_mat = _reference_matrix(df, id_col, vec_col, normalize=True)
    bc = spark.sparkContext.broadcast((ref_ids, ref_mat))

    def kernel(batches):
        ids_all, mat = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            probe_ids = pdf[id_col].to_numpy(dtype=np.int64)
            vecs = _l2_normalize(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            sims = vecs @ mat.T
            keep = (sims >= threshold) & (ids_all[None, :] > probe_ids[:, None])
            rows, cols = np.nonzero(keep)
            if rows.size:
                yield pd.DataFrame(
                    {
                        "id1": probe_ids[rows],
                        "id2": ids_all[cols],
                        "sim": sims[rows, cols],
                    }
                )

    return df.mapInPandas(kernel, schema=_PAIR_SCHEMA)


def l2_normalize_arrow(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Unit-normalize a vector column with ``mapInArrow`` — the
    zero-copy Arrow path (no pandas materialization at all), the
    batch shape GPU/np preprocessing kernels want at 100 TB.

    Fixed-width vectors are viewed as one contiguous (rows × dim)
    float64 matrix straight from the Arrow list buffer, normalized with
    a single BLAS-backed NumPy pass, and re-wrapped as an Arrow
    FixedSizeList-backed list column. Narrow op — no shuffle.
    """
    import pyarrow as pa

    schema_out = df.select(
        "*", F.col(vec_col).cast("array<double>").alias("__unit")
    ).withColumnRenamed("__unit", "unit_vec").schema

    def kernel(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            tbl = pa.table(batch)
            vecs = tbl[vec_col].combine_chunks()
            lengths = vecs.value_lengths().to_numpy()
            dim = int(lengths[0])
            if not (lengths == dim).all():
                raise ValueError(
                    f"l2_normalize_arrow: ragged {vec_col!r} column — "
                    f"expected every vector to have length {dim}"
                )
            vals = vecs.flatten().to_numpy(zero_copy_only=False).astype(
                np.float64
            ).reshape(-1, dim)
            norms = np.linalg.norm(vals, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            unit = vals / norms
            unit_col = pa.FixedSizeListArray.from_arrays(
                pa.array(unit.ravel(), type=pa.float64()), dim
            ).cast(pa.list_(pa.float64()))
            yield pa.RecordBatch.from_arrays(
                [tbl[c].combine_chunks() for c in tbl.column_names]
                + [unit_col],
                names=tbl.column_names + ["unit_vec"],
            )

    return df.mapInArrow(kernel, schema=schema_out)

"""Multimodal column plumbing (llm-8): image/audio/video as opaque
``binary`` columns with a typed metadata struct, plus decode /
feature-extract / resize / frame-sample stages as Arrow-batched
``mapInPandas`` operators.

The Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested. The actual codec step is STUBBED: the
image/audio libraries are not in this container, so ``decode_media``
raises ``NotImplementedError`` for real codecs and the pipeline is
exercised end-to-end with the deterministic fake codec below
(``FAKE_CODEC``), whose "pixels" are just the payload bytes.

Scale design: payloads never pass through Python row-at-a-time — every
stage is mapInPandas over Arrow record batches, so a 100-TB media corpus
streams through executors at batch granularity with no shuffle at all
(decode/extract are narrow). Batch byte-size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` against executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried alongside every media payload.
MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),        # image | audio | video
        T.StructField("format", T.StringType()),      # png/wav/… or x-fake
        T.StructField("width", T.IntegerType()),      # images/video
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),  # audio
        T.StructField("n_frames", T.IntegerType()),     # video/audio
    ]
)

FAKE_CODEC = "x-fake"

#: Feature vector width produced by extract_features (byte histogram).
N_FEATURES = 16


def attach_fake_media(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Synthesize a deterministic binary payload + metadata per row.

    Stand-in for a real media ingest (S3 blob / parquet binary): payload =
    sha2-seeded bytes stretched to a kind-dependent size, all derived from
    the row's id so every engine run agrees bit-for-bit. Pure Catalyst —
    no Python.
    """
    kind = (
        F.when(F.col(id_col) % 3 == 0, F.lit("image"))
        .when(F.col(id_col) % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    # sha2 hex repeated 4× then hex-decoded → 128-byte payload.
    seed = F.sha2(F.col(text_col).cast("binary"), 256)
    payload = F.to_binary(F.repeat(seed, 4), F.lit("hex"))
    meta = F.struct(
        kind.alias("kind"),
        F.lit(FAKE_CODEC).alias("format"),
        F.when(kind == "image", F.lit(16)).otherwise(F.lit(None)).cast("int").alias("width"),
        F.when(kind == "image", F.lit(16)).otherwise(F.lit(None)).cast("int").alias("height"),
        F.when(kind == "audio", F.lit(16000)).otherwise(F.lit(None)).cast("int").alias("sample_rate"),
        F.when(kind != "image", F.lit(8)).otherwise(F.lit(None)).cast("int").alias("n_frames"),
    )
    return df.select(
        F.col(id_col), payload.alias("payload"), meta.alias("media_meta")
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """The deterministic fake codec: bytes ARE the samples/pixels."""
    return np.frombuffer(payload, dtype=np.uint8)


def decode_media(payload: bytes, fmt: str) -> np.ndarray:
    """Codec dispatch. Real codecs are stubbed in this container."""
    if fmt == FAKE_CODEC:
        return _fake_decode(payload)
    # Real deployments plug PIL / soundfile / pyav in right here; the
    # container has none of them, so fail loudly rather than fake it.
    raise NotImplementedError(
        f"codec {fmt!r} requires image/audio libraries not present in this "
        "container; only the deterministic x-fake codec is available"
    )


_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract: 16-bin normalized byte histogram per row.

    One mapInPandas stage — narrow (no shuffle); each Arrow batch is
    vectorized with NumPy. The histogram stands in for a real embedding
    model's forward pass; the batch shape (pandas DataFrame in / out,
    bounded size) is exactly what a GPU-backed extractor needs.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats, nbytes, kinds = [], [], []
            for payload, meta in zip(pdf["payload"], pdf["media_meta"]):
                arr = decode_media(payload, meta["format"])
                hist = np.bincount(arr >> 4, minlength=N_FEATURES).astype(np.float64)
                feats.append(np.round(hist / max(arr.size, 1), 6))
                nbytes.append(arr.size)
                kinds.append(meta["kind"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "kind": kinds,
                    "n_bytes": np.asarray(nbytes, dtype=np.int64),
                    "features": feats,
                }
            )

    return media.mapInPandas(kernel, schema=_FEATURES_SCHEMA)


_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame-sample video payloads: keep every ``every``-th fixed-size
    frame as its own binary row (doc_id, frame_idx, frame).

    mapInPandas so the explode happens JVM←Arrow-batched; output rows
    carry only their own frame bytes, so downstream per-frame decode
    parallelizes across the cluster.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_meta"]
            ):
                if meta["kind"] != "video":
                    continue
                n = int(meta["n_frames"])
                size = len(payload) // n
                for i in range(0, n, every):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(payload[i * size: (i + 1) * size])
            if ids:
                yield pd.DataFrame(
                    {
                        "doc_id": np.asarray(ids, dtype=np.int64),
                        "frame_idx": np.asarray(idxs, dtype=np.int32),
                        "frame": frames,
                    }
                )

    return media.mapInPandas(kernel, schema=_FRAMES_SCHEMA)


_RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("orig_bytes", T.LongType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("resized_bytes", T.LongType()),
    ]
)


def resize_images(media: DataFrame, factor: int = 2) -> DataFrame:
    """Resize image payloads by an integer downsample ``factor``:
    decode → strided subsample (the stand-in for real interpolation) →
    re-encode bytes.

    Same mapInPandas contract as :func:`extract_features` — narrow,
    Arrow-batched, NumPy-vectorized per row; a real deployment swaps
    the strided slice for PIL/OpenCV interpolation inside the same
    kernel without touching the Spark plumbing. Non-image rows are
    filtered before the kernel so the scan prunes them by metadata.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, orig, resized, rbytes = [], [], [], []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_meta"]
            ):
                arr = decode_media(payload, meta["format"])
                out = np.ascontiguousarray(arr[::factor]).tobytes()
                ids.append(doc_id)
                orig.append(arr.size)
                resized.append(out)
                rbytes.append(len(out))
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    "orig_bytes": np.asarray(orig, dtype=np.int64),
                    "resized": resized,
                    "resized_bytes": np.asarray(rbytes, dtype=np.int64),
                }
            )

    images = media.filter(F.col("media_meta.kind") == "image")
    return images.mapInPandas(kernel, schema=_RESIZED_SCHEMA)


_RESAMPLED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("new_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("resampled", T.BinaryType()),
        T.StructField("energy", T.LongType()),
    ]
)


def resample_audio(media: DataFrame, factor: int = 2) -> DataFrame:
    """Decimate audio payloads by an integer ``factor``: decode → average
    each non-overlapping ``factor``-sample window (integer floor mean —
    the boxcar stand-in for a real polyphase resampler) → re-encode, with
    the output's exact integer energy (Σ sample²).

    Same mapInPandas contract as :func:`resize_images`: non-audio rows
    are pruned by metadata before Python, batches are Arrow-fed and
    NumPy-vectorized, output rows carry only their own bytes. A real
    deployment swaps the window mean for scipy/soxr inside the same
    kernel without touching the plumbing.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, rates, ns, outs, energy = [], [], [], [], []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_meta"]
            ):
                arr = decode_media(payload, meta["format"])
                usable = arr[: (arr.size // factor) * factor]
                out = (
                    usable.astype(np.int64).reshape(-1, factor).sum(axis=1)
                    // factor
                ).astype(np.uint8)
                ids.append(doc_id)
                rates.append(int(meta["sample_rate"]) // factor)
                ns.append(out.size)
                outs.append(out.tobytes())
                energy.append(int((out.astype(np.int64) ** 2).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    "new_rate": np.asarray(rates, dtype=np.int32),
                    "n_samples": np.asarray(ns, dtype=np.int64),
                    "resampled": outs,
                    "energy": np.asarray(energy, dtype=np.int64),
                }
            )

    audio = media.filter(F.col("media_meta.kind") == "audio")
    return audio.mapInPandas(kernel, schema=_RESAMPLED_SCHEMA)


_VAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_voiced", T.LongType()),
        T.StructField("voiced_mask", T.StringType()),
        T.StructField("total_energy", T.LongType()),
    ]
)


def vad_energy(
    media: DataFrame, frame: int = 16, threshold: int = 260000
) -> DataFrame:
    """Energy-threshold voice-activity detection: decode each audio
    payload, split into non-overlapping ``frame``-sample windows, mark a
    frame voiced when its exact integer energy Σs² exceeds
    ``threshold`` → (doc_id, n_frames, n_voiced, voiced_mask,
    total_energy) with the mask as a '10…' string in frame order.

    Same mapInPandas contract as :func:`resample_audio`: metadata prunes
    non-audio rows before Python, Arrow feeds the batches, NumPy does a
    single reshape+square+sum per payload. A real deployment swaps the
    energy gate for a WebRTC/Silero VAD inside the same kernel; the
    plumbing (schema, pruning, batch shape) is what this operator
    locks down.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, nf, nv, masks, te = [], [], [], [], []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_meta"]
            ):
                arr = decode_media(payload, meta["format"]).astype(np.int64)
                usable = arr[: (arr.size // frame) * frame]
                frames = usable.reshape(-1, frame)
                energy = (frames * frames).sum(axis=1)
                voiced = energy > threshold
                ids.append(doc_id)
                nf.append(frames.shape[0])
                nv.append(int(voiced.sum()))
                masks.append("".join("1" if v else "0" for v in voiced))
                te.append(int(energy.sum()))
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    "n_frames": np.asarray(nf, dtype=np.int64),
                    "n_voiced": np.asarray(nv, dtype=np.int64),
                    "voiced_mask": masks,
                    "total_energy": np.asarray(te, dtype=np.int64),
                }
            )

    audio = media.filter(F.col("media_meta.kind") == "audio")
    return audio.mapInPandas(kernel, schema=_VAD_SCHEMA)


_SCENE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_cuts", T.LongType()),
        T.StructField("cut_mask", T.StringType()),
        T.StructField("total_l1", T.LongType()),
    ]
)


def scene_cuts(media: DataFrame, threshold: int = 1360) -> DataFrame:
    """Shot-boundary detection on video payloads: decode, split into the
    metadata's ``n_frames`` equal frames, compute the exact L1 pixel
    difference between consecutive frames, and mark a cut where the
    difference exceeds ``threshold`` → (doc_id, n_frames, n_cuts,
    cut_mask, total_l1) with the mask over the n_frames−1 transitions.

    The frame-difference gate is the classic first-pass shot detector
    (FFmpeg's scdet / PySceneDetect's content-detector shape); a real
    deployment swaps in HSV histograms inside the same kernel. Same
    mapInPandas plumbing as the other multimodal kernels.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, nf, nc, masks, tl = [], [], [], [], []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_meta"]
            ):
                arr = decode_media(payload, meta["format"]).astype(np.int64)
                k = int(meta["n_frames"])
                frames = arr[: (arr.size // k) * k].reshape(k, -1)
                l1 = np.abs(np.diff(frames, axis=0)).sum(axis=1)
                cuts = l1 > threshold
                ids.append(doc_id)
                nf.append(k)
                nc.append(int(cuts.sum()))
                masks.append("".join("1" if c else "0" for c in cuts))
                tl.append(int(l1.sum()))
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    "n_frames": np.asarray(nf, dtype=np.int64),
                    "n_cuts": np.asarray(nc, dtype=np.int64),
                    "cut_mask": masks,
                    "total_l1": np.asarray(tl, dtype=np.int64),
                }
            )

    video = media.filter(F.col("media_meta.kind") == "video")
    return video.mapInPandas(kernel, schema=_SCENE_SCHEMA)

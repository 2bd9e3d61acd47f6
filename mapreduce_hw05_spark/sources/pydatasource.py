"""Custom connector via the Python DataSource API (Spark 4, SPARK-44076).

The reference genre's "custom source" is an InputFormat subclass; the
Spark-4-native equivalent is ``pyspark.sql.datasource.DataSource`` —
a pure-Python batch connector whose ``partitions()`` defines the split
set (each InputPartition becomes one Spark task, so parallelism is
declared by the source, exactly like InputFormat splits) and whose
``read(partition)`` streams that split's rows.

``SeqGenDataSource`` here is a deterministic synthetic generator
(id, bucket, id_md5): the connector machinery is real — registration,
schema declaration, option parsing, partition planning, per-task
iteration — while the payload is reproducible on any engine, so the
contract query is SQL-oracle-able (DuckDB ``range()`` + ``md5()``).

At 100 TB the same shape wraps any record-stream API (a REST cursor, a
queue, an internal DB): split by key-range/shard into InputPartitions
and let Spark schedule one task per split; no driver-side collect ever
holds the data.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SeqGenReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 10000))
        self.num_parts = int(options.get("parts", 8))
        self.buckets = int(options.get("buckets", 16))

    def partitions(self) -> list[InputPartition]:
        step = max(1, -(-self.n // self.num_parts))  # ceil div
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (
                i,
                i % self.buckets,
                hashlib.md5(str(i).encode()).hexdigest(),
            )


def _row(i: int, buckets: int) -> tuple:
    return (i, i % buckets, hashlib.md5(str(i).encode()).hexdigest())


class SeqGenStreamReader(SimpleDataSourceStreamReader):
    """Micro-batched variant: offsets are row indices; each read attempt
    serves the next ``batch`` rows until ``n`` are exhausted, then empty
    batches (a bounded stream). ``readBetweenOffsets`` regenerates any
    committed batch deterministically — the replayability contract that
    gives the source exactly-once semantics under failure recovery.
    """

    def __init__(self, options: dict):
        self.n = int(options.get("n", 10000))
        self.batch = int(options.get("batch", 2500))
        self.buckets = int(options.get("buckets", 16))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        lo = start["i"]
        hi = min(lo + self.batch, self.n)
        # A LIST iterator, not a generator: Spark's driver-side prefetch
        # cache both next()s and copy.copy()s the returned iterator, and
        # generators support only the former.
        return iter([_row(i, self.buckets) for i in range(lo, hi)]), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i, self.buckets) for i in range(start["i"], end["i"])])


class SeqGenDataSource(DataSource):
    """``spark.read.format("seqgen")`` (batch) and
    ``spark.readStream.format("seqgen")`` (micro-batched stream) over the
    same deterministic payload."""

    @classmethod
    def name(cls) -> str:
        return "seqgen"

    def schema(self) -> str:
        return "id bigint, bucket int, id_md5 string"

    def reader(self, schema) -> SeqGenReader:
        return SeqGenReader(self.options)

    def simpleStreamReader(self, schema) -> SeqGenStreamReader:
        return SeqGenStreamReader(self.options)


def register_seqgen(spark) -> None:
    """Idempotent per-SESSION registration (latest registration wins).

    Caveat (Spark 4.1, surfaced by the r12 pooled parity sweep): only
    same-session re-registration overwrites cleanly. A ``newSession()``
    CLONE whose parent already registered the name can raise
    DATA_SOURCE_ALREADY_EXISTS on re-register while its own lookup
    still misses — run data-source contracts on the session that owns
    the registration (the sweep schedules them on the root session).
    """
    spark.dataSource.register(SeqGenDataSource)


# --------------------------------------------------------------------------
# Custom SINK: transactional JSONL writer (DataSourceWriter, two-phase)
# --------------------------------------------------------------------------


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, rows: int):
        self.tmp_path = tmp_path
        self.rows = rows


class JsonlWriter(DataSourceWriter):
    """Task side writes a temp file and reports it in the commit message;
    the driver's ``commit`` atomically renames every temp and publishes a
    ``_MANIFEST`` naming exactly the committed files — readers that honor
    the manifest never see a torn write. ``abort`` removes the temps.
    This is the same job-commit protocol Spark's file sinks use, in
    ~40 lines of Python — the point of the exercise is the protocol,
    not the format.
    """

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator) -> _JsonlCommit:
        import json as _json
        import os as _os
        import uuid as _uuid

        tmp = _os.path.join(self.path, f".tmp-{_uuid.uuid4().hex}.jsonl")
        n = 0
        try:
            with open(tmp, "w") as fh:
                for row in iterator:
                    fh.write(_json.dumps(row.asDict()) + "\n")
                    n += 1
        except BaseException:
            # Task-side cleanup: a failing task's temp never reaches the
            # driver's abort() (no commit message), so remove it here.
            _os.remove(tmp)
            raise
        return _JsonlCommit(tmp, n)

    def commit(self, messages) -> None:
        import json as _json
        import os as _os

        final = []
        for i, msg in enumerate(messages):
            if msg is None or msg.rows == 0:
                if msg is not None:
                    _os.remove(msg.tmp_path)
                continue
            name = f"part-{i:05d}.jsonl"
            _os.replace(msg.tmp_path, _os.path.join(self.path, name))
            final.append({"file": name, "rows": msg.rows})
        with open(_os.path.join(self.path, "_MANIFEST"), "w") as fh:
            _json.dump({"files": final}, fh)

    def abort(self, messages) -> None:
        import os as _os

        for msg in messages:
            if msg is not None and _os.path.exists(msg.tmp_path):
                _os.remove(msg.tmp_path)


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonlsink").option("path", dir).save()``."""

    @classmethod
    def name(cls) -> str:
        return "jsonlsink"

    def writer(self, schema, overwrite: bool) -> JsonlWriter:
        return JsonlWriter(self.options)


def manifest_files(path: str) -> list[str]:
    """The committed files of a jsonlsink directory, absolute paths."""
    import json as _json
    import os as _os

    with open(_os.path.join(path, "_MANIFEST")) as fh:
        manifest = _json.load(fh)
    return [_os.path.join(path, f["file"]) for f in manifest["files"]]


def register_jsonlsink(spark) -> None:
    """Idempotent per-SESSION registration (see register_seqgen's
    clone caveat)."""
    spark.dataSource.register(JsonlSinkDataSource)

"""Custom Python DataSource: REST-payload JSON directories as a
first-class Spark connector.

The reference turns a REST response into a table by hand:
``requests.get(...).json()["apps"]`` → ``pd.DataFrame.from_dict``
(`lakehouse_app_helpers.py:28-31`), then extracts nested ``status``
fields row-at-a-time (`lakehouse_app_helpers.py:32-33`). This module
re-expresses that ingestion path as a proper pluggable source on
Spark 4's Python DataSource API (`pyspark.sql.datasource`): register
once, then ``spark.read.format("rest_json").load(dir)`` — the payload
directory becomes a DataFrame with ordinary Catalyst pushdown on top.

Scale design: partition planning is one InputPartition per payload
file, so a directory of N snapshot files fans out to N parallel read
tasks with no driver-side parsing; each task parses only its own
file. Nested objects are flattened with dotted names at parse time
(``status.state`` → ``status_state``) — the connector does the
envelope unwrap + flatten that the reference did in pandas, and
everything downstream is plain columnar Spark.

Options:
- ``path``: directory of ``*.json`` payload files (required)
- ``envelope``: top-level key holding the record list (e.g. ``apps``;
  default: the payload root must itself be a list)
- ``columns``: comma-separated output column order (default: sorted
  union of flattened keys from the first file — deterministic)

The writer side (``.write.format("rest_json")``) emits one JSON-lines
file per partition and an empty commit marker, mirroring a
task-commit protocol in miniature.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StringType, StructField, StructType


def _flatten(obj: dict, prefix: str = "") -> dict:
    """Flatten one level of nesting with underscore-joined names —
    the connector-side analog of `lakehouse_app_helpers.py:32-33`'s
    per-row ``x["state"]`` extraction."""
    out: dict = {}
    for k, v in obj.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, prefix=f"{key}_"))
        else:
            out[key] = v
    return out


def _load_records(path: str, envelope: str | None) -> list[dict]:
    with open(path, "r", encoding="utf-8") as fh:
        payload = json.load(fh)
    records = payload[envelope] if envelope else payload
    return [_flatten(r) for r in records]


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class RestJsonReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options["path"]
        self.envelope = options.get("envelope")

    def partitions(self) -> Sequence[InputPartition]:
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".json")
        )
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        names = [f.name for f in self.schema.fields]
        for rec in _load_records(partition.path, self.envelope):
            yield tuple(
                None if rec.get(n) is None else str(rec.get(n)) for n in names
            )


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, tmp: str, final: str):
        self.tmp = tmp
        self.final = final


class RestJsonWriter(DataSourceWriter):
    """JSONL writer with a two-phase commit: tasks write dot-prefixed
    temp files (invisible to list-based readers), the driver-side
    ``commit`` renames them into place and drops a ``_SUCCESS``
    marker, and ``abort`` removes the temps — so a failed job never
    leaves half its partitions masquerading as committed output.
    ``overwrite`` clears prior part files up front, so a smaller
    overwrite can't leave stale high-numbered parts mixed in."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options["path"]
        if overwrite and os.path.isdir(self.path):
            for f in os.listdir(self.path):
                # also sweep orphan attempt temps (a crashed/zombie
                # attempt whose commit message never reached the
                # driver leaves .part-*-attemptN.jsonl.inprogress
                # behind — review r7); single-writer-per-path is the
                # sink's contract, so they are never a live writer's
                if (
                    f.startswith("part-")
                    or f == "_SUCCESS"
                    or (f.startswith(".part-") and f.endswith(".inprogress"))
                ):
                    os.remove(os.path.join(self.path, f))

    def write(self, iterator: Iterator[Row]) -> WriterCommitMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        # temp name carries the TASK ATTEMPT id (review r6): a retried
        # or speculative attempt overlapping a zombie attempt for the
        # same partition writes its OWN temp file; commit renames only
        # the attempt named in each commit message, so a zombie can
        # never corrupt the bytes the winner committed.
        attempt = ctx.taskAttemptId()
        os.makedirs(self.path, exist_ok=True)
        final = os.path.join(self.path, f"part-{pid:05d}.jsonl")
        tmp = os.path.join(
            self.path, f".part-{pid:05d}-attempt{attempt}.jsonl.inprogress"
        )
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
        return _JsonlCommit(tmp, final)

    def commit(self, messages) -> None:
        for m in messages:
            if m is not None:
                os.replace(m.tmp, m.final)
        # sweep losing-attempt temps (their commit messages were never
        # delivered); safe under the single-writer-per-path contract
        for f in os.listdir(self.path):
            if f.startswith(".part-") and f.endswith(".inprogress"):
                try:
                    os.remove(os.path.join(self.path, f))
                except FileNotFoundError:
                    pass
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write("")

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(m.tmp)
                except FileNotFoundError:
                    pass


class RestJsonStreamReader(SimpleDataSourceStreamReader):
    """Incremental (streaming) variant of the connector: each
    micro-batch picks up payload files that arrived since the last
    committed offset. The offset stores the NAME of the last consumed
    file (not a count), so a batch consumes exactly the files whose
    names sort strictly after it: the offset stays O(1) regardless of
    directory size, and ``readBetweenOffsets`` (failure replay) is a
    pure name-range filter — exactly-once replay under ANY listing
    change, because a name range is stable where a count is not.

    Source CONTRACT (the price of O(1) offsets): producers must name
    files monotonically (timestamp/sequence prefixes — what every
    log-shipping layout does). A file landing with a name that sorts
    at or below the committed watermark is intentionally never read:
    consuming it would make replayed batches differ from their first
    run and silently break exactly-once. Producers that can't
    guarantee ordering need a seen-set source (Spark's built-in file
    source keeps one) — a different trade, documented here rather
    than half-made. This is the reference's poll loop
    (`lakehouse_app_helpers.py:69-75`) re-expressed as an
    exactly-once Structured Streaming source."""

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options["path"]
        self.envelope = options.get("envelope")

    def _files(self) -> list[str]:
        return sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".json")
        )

    def initialOffset(self) -> dict:
        return {"last": ""}

    def _boundary(self, start: dict, files: list[str]) -> str:
        """Consumed-watermark name for an offset. Legacy ``{"idx": n}``
        (count-based) checkpoints upgrade via the current listing's
        first ``n`` names — best-effort: if files were INSERTED below
        the old boundary since the checkpoint, the reconstructed
        watermark is lower and already-consumed files replay
        (at-least-once, never loss); only deleting consumed files
        from the directory (outside the source contract) could push
        it higher. New checkpoints always carry the name."""
        if "last" in start:
            return start["last"]
        consumed = files[: start.get("idx", 0)]
        return os.path.basename(consumed[-1]) if consumed else ""

    def _rows(self, paths: list[str]) -> list[tuple]:
        # a LIST, not a generator: the runtime pickles these rows to
        # ship them executor-side (prefetch-and-cache design of the
        # simple reader API)
        names = [f.name for f in self.schema.fields]
        return [
            tuple(
                None if rec.get(n) is None else str(rec.get(n)) for n in names
            )
            for p in paths
            for rec in _load_records(p, self.envelope)
        ]

    def read(self, start: dict) -> tuple[list[tuple], dict]:
        files = self._files()
        last = self._boundary(start, files)
        new = [p for p in files if os.path.basename(p) > last]
        nxt = os.path.basename(new[-1]) if new else last
        return self._rows(new), {"last": nxt}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        files = self._files()
        lo = self._boundary(start, files)
        hi = self._boundary(end, files)
        return self._rows(
            [p for p in files if lo < os.path.basename(p) <= hi]
        )


class RestJsonDataSource(DataSource):
    """``spark.read.format("rest_json")`` after registration via
    :func:`register_rest_json_source`."""

    @classmethod
    def name(cls) -> str:
        return "rest_json"

    def schema(self) -> StructType:
        cols = self.options.get("columns")
        if cols:
            names = [c.strip() for c in cols.split(",")]
        else:
            files = sorted(
                f for f in os.listdir(self.options["path"]) if f.endswith(".json")
            )
            if not files:
                raise ValueError(
                    "rest_json: no .json payloads under "
                    f"{self.options['path']!r} and no 'columns' option — "
                    "schema inference needs at least one file"
                )
            first = os.path.join(self.options["path"], files[0])
            recs = _load_records(first, self.options.get("envelope"))
            names = sorted({k for r in recs for k in r})
        return StructType([StructField(n, StringType()) for n in names])

    def reader(self, schema: StructType) -> RestJsonReader:
        return RestJsonReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> RestJsonWriter:
        return RestJsonWriter(self.options, overwrite)

    def simpleStreamReader(self, schema: StructType) -> RestJsonStreamReader:
        return RestJsonStreamReader(schema, self.options)


def register_rest_json_source(spark) -> None:
    spark.dataSource.register(RestJsonDataSource)

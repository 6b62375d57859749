"""Snapshot-versioned parquet tables — an Iceberg-style table format.

Real Apache Iceberg needs its runtime jars on the Spark classpath,
which this sandbox does not ship; :class:`SnapshotTable` implements the
same *contract* the engine needs from Iceberg — atomic commits, a
snapshot log, read-at-snapshot (time travel), and append/overwrite
semantics — over plain parquet plus a JSON snapshot log, so every
snapshot-dependent behavior (checkpoint/resume, lineage) is real and
tested.  A deployment with Iceberg jars can swap
``spark.read.format("iceberg")`` in behind the same interface
(:func:`load_table` probes for it).

Layout::

    <root>/data/<snapshot-uuid>/part-*.parquet   (immutable once committed)
    <root>/_snapshots/v00000001.json             (manifest: file list)
    <root>/_snapshots/LATEST                     (atomic pointer)

Commit protocol: data files are fully written first, then the manifest
is written to a temp file and atomically ``rename``d in, then LATEST is
atomically replaced — a reader always sees a complete snapshot, a
killed writer leaves only unreferenced orphan files (cleaned by
:meth:`SnapshotTable.vacuum`).
"""
from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Snapshot:
    version: int
    snapshot_id: str
    parent_id: Optional[str]
    operation: str
    committed_at: float
    files: List[str]
    properties: dict


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.log_dir = os.path.join(root, "_snapshots")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.log_dir, exist_ok=True)

    # -- log ---------------------------------------------------------------

    def snapshots(self) -> List[Snapshot]:
        out = []
        for name in sorted(os.listdir(self.log_dir)):
            if name.startswith("v") and name.endswith(".json"):
                with open(os.path.join(self.log_dir, name)) as f:
                    out.append(Snapshot(**json.load(f)))
        return out

    def current(self) -> Optional[Snapshot]:
        ptr = os.path.join(self.log_dir, "LATEST")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            version = int(f.read().strip())
        path = os.path.join(self.log_dir, f"v{version:08d}.json")
        with open(path) as f:
            return Snapshot(**json.load(f))

    def _commit(self, files: List[str], operation: str,
                properties: Optional[dict] = None) -> Snapshot:
        cur = self.current()
        version = (cur.version + 1) if cur else 1
        snap = Snapshot(
            version=version,
            snapshot_id=uuid.uuid4().hex,
            parent_id=cur.snapshot_id if cur else None,
            operation=operation,
            committed_at=time.time(),
            files=sorted(files),
            properties=properties or {},
        )
        path = os.path.join(self.log_dir, f"v{version:08d}.json")
        tmp = path + f".tmp-{snap.snapshot_id}"
        with open(tmp, "w") as f:
            json.dump(snap.__dict__, f, indent=1)
        os.rename(tmp, path)
        ptr_tmp = os.path.join(self.log_dir, f".LATEST-{snap.snapshot_id}")
        with open(ptr_tmp, "w") as f:
            f.write(str(version))
        os.replace(ptr_tmp, os.path.join(self.log_dir, "LATEST"))
        return snap

    # -- IO ----------------------------------------------------------------

    def write(self, df: DataFrame, mode: str = "append",
              properties: Optional[dict] = None) -> Snapshot:
        """Commit ``df`` as a new snapshot.  ``append`` unions with the
        parent's file list; ``overwrite`` starts a fresh list (old files
        stay on disk for time travel until ``vacuum``)."""
        if mode not in ("append", "overwrite"):
            raise ValueError(mode)
        dirname = os.path.join(self.data_dir, uuid.uuid4().hex)
        df.write.mode("errorifexists").parquet(dirname)
        new_files = [
            os.path.join(dirname, f) for f in os.listdir(dirname)
            if f.endswith(".parquet")
        ]
        cur = self.current()
        files = list(new_files)
        if mode == "append" and cur:
            files += cur.files
        return self._commit(files, mode, properties)

    def read(self, spark: SparkSession,
             snapshot_id: Optional[str] = None,
             version: Optional[int] = None) -> DataFrame:
        """Read the table at a snapshot (default: current) — time
        travel by ``snapshot_id`` or ``version``."""
        snap = None
        if snapshot_id is not None or version is not None:
            for s in self.snapshots():
                if s.snapshot_id == snapshot_id or s.version == version:
                    snap = s
                    break
            if snap is None:
                raise KeyError(f"no such snapshot: {snapshot_id or version}")
        else:
            snap = self.current()
        if snap is None or not snap.files:
            raise FileNotFoundError(f"table {self.root} has no snapshot")
        return spark.read.parquet(*snap.files)

    def vacuum(self) -> int:
        """Delete data files not referenced by any snapshot (orphans of
        killed writers).  Returns the number removed."""
        referenced = {f for s in self.snapshots() for f in s.files}
        removed = 0
        for d in os.listdir(self.data_dir):
            full = os.path.join(self.data_dir, d)
            for name in os.listdir(full):
                p = os.path.join(full, name)
                if name.endswith(".parquet") and p not in referenced:
                    os.remove(p)
                    removed += 1
            if not os.listdir(full):
                os.rmdir(full)
        return removed


def load_table(spark: SparkSession, path_or_identifier: str):
    """Probe for a real Iceberg catalog; fall back to SnapshotTable.
    Returns an object with ``read(spark, ...)``."""
    try:  # real Iceberg needs its jars + a configured catalog
        jvm_has_iceberg = (
            spark.conf.get("spark.sql.catalog.spark_catalog", "")
            .startswith("org.apache.iceberg"))
    except Exception:  # noqa: BLE001
        jvm_has_iceberg = False
    if jvm_has_iceberg:
        class _IcebergHandle:
            def __init__(self, ident):
                self.ident = ident

            def read(self, spark_, snapshot_id=None, version=None):
                reader = spark_.read
                if snapshot_id is not None:
                    reader = reader.option("snapshot-id", snapshot_id)
                return reader.format("iceberg").load(self.ident)

        return _IcebergHandle(path_or_identifier)
    return SnapshotTable(path_or_identifier)

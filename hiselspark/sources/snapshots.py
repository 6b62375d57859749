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
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class Snapshot:
    version: int
    snapshot_id: str
    parent_id: Optional[str]
    operation: str
    committed_at: float
    files: List[str]
    properties: dict
    # Iceberg-manifest-style per-file column stats for data skipping:
    # {file: {column: [min, max]}} (JSON-native primitives only);
    # absent for snapshots committed before stats existed
    stats: dict = field(default_factory=dict)
    # the table schema AS OF this snapshot (Spark StructType JSON) —
    # Iceberg-style schema evolution: appends may add columns; readers
    # apply the snapshot's schema so files written before a column
    # existed surface it as null (and time travel sees the old schema)
    schema_json: Optional[str] = None


def _file_column_stats(path: str) -> dict:
    """Per-file [min, max] per primitive column, read from the parquet
    FOOTER (row-group statistics) — no data pages are touched, which
    is what makes collecting them at commit time free.  Columns whose
    stats are missing or non-primitive are omitted (readers treat
    missing stats as 'cannot prune')."""
    import pyarrow.parquet as pq
    md = pq.ParquetFile(path).metadata
    out: dict = {}
    for rg in range(md.num_row_groups):
        for ci in range(md.num_columns):
            col = md.row_group(rg).column(ci)
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode("utf-8"), mx.decode("utf-8")
                except UnicodeDecodeError:
                    continue
            if not isinstance(mn, (int, float, str)) or \
                    isinstance(mn, bool):
                continue
            name = col.path_in_schema
            if name in out:
                out[name] = [min(out[name][0], mn),
                             max(out[name][1], mx)]
            else:
                out[name] = [mn, mx]
    return out


def _range_may_match(mn, mx, op: str, value) -> bool:
    """Can a file whose column spans [mn, mx] contain a row matching
    ``col <op> value``?  Conservative (True on any doubt)."""
    try:
        if op == "=":
            return mn <= value <= mx
        if op == "<":
            return mn < value
        if op == "<=":
            return mn <= value
        if op == ">":
            return mx > value
        if op == ">=":
            return mx >= value
        if op == "between":
            lo, hi = value
            return lo <= mx and hi >= mn
    except TypeError:
        return True     # incomparable types: never prune
    return True          # unknown op: never prune


def _merge_schema_json(parent_json: Optional[str], df_schema) -> str:
    """Evolve the table schema: keep every parent column (in order),
    append genuinely new columns from the written frame.  A column
    changing type is refused — silent coercion across historical files
    is how tables rot."""
    from pyspark.sql.types import StructType
    if parent_json is None:
        return df_schema.json()
    parent = StructType.fromJson(json.loads(parent_json))
    new_by_name = {f.name: f for f in df_schema.fields}
    merged = []
    for f in parent.fields:
        g = new_by_name.pop(f.name, None)
        if g is not None and g.dataType != f.dataType:
            raise ValueError(
                f"schema evolution cannot change column '{f.name}' "
                f"from {f.dataType} to {g.dataType}")
        merged.append(f)
    merged += [f for f in df_schema.fields if f.name in new_by_name]
    return StructType(merged).json()


def _with_zvalue(df: DataFrame, cols: Sequence[str],
                 out_col: str = "__z") -> DataFrame:
    """Z-order (Morton) key over up to 4 columns: each column is
    reduced to a 16-bit key — numeric/timestamp columns by min-max
    scaling (bounds from ONE aggregate over the frame), string columns
    by ``crc32 & 0xFFFF`` (hash clustering: groups equal values, which
    is what point-lookup pruning needs; strings have no cheap rank) —
    and the bits are interleaved into one long.  Range-partitioning on
    the key gives every file a tight min/max box in EVERY listed
    column at once, which is what makes multi-column predicates prune
    (linear clustering only ever serves its leading column)."""
    from pyspark.sql.types import (DateType, StringType, TimestampNTZType,
                                   TimestampType)
    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder supports 1-4 columns")
    fields = {f.name: f.dataType for f in df.schema.fields}
    num_exprs = {}
    aggs = []
    for c in cols:
        dt = fields[c]
        if isinstance(dt, StringType):
            continue
        e = (F.col(c).cast("timestamp").cast("double")
             if isinstance(dt, (TimestampType, TimestampNTZType, DateType))
             else F.col(c).cast("double"))
        num_exprs[c] = e
        aggs += [F.min(e).alias(f"__mn_{c}"), F.max(e).alias(f"__mx_{c}")]
    bounds = df.agg(*aggs).collect()[0] if aggs else None
    keys = []
    for c in cols:
        if c in num_exprs:
            mn, mx = bounds[f"__mn_{c}"], bounds[f"__mx_{c}"]
            if mn is None or mx == mn:
                k = F.lit(0).cast("long")
            else:
                k = F.least(
                    F.lit(65535).cast("long"),
                    F.greatest(
                        F.lit(0).cast("long"),
                        ((num_exprs[c] - F.lit(float(mn)))
                         / F.lit(float(mx) - float(mn)) * 65535)
                        .cast("long")))
            k = F.coalesce(k, F.lit(0).cast("long"))
        else:
            k = F.coalesce(
                F.crc32(F.col(c)).bitwiseAND(F.lit(0xFFFF).cast("long")),
                F.lit(0).cast("long"))
        keys.append(k)
    z = F.lit(0).cast("long")
    for b in range(16):
        for i, k in enumerate(keys):
            bit = F.shiftrightunsigned(k, b).bitwiseAND(
                F.lit(1).cast("long"))
            z = z + F.shiftleft(bit, b * len(keys) + i)
    return df.withColumn(out_col, z)


def _strip_file_scheme(path: str) -> str:
    """``_metadata.file_path`` URIs (``file:///x``) -> local paths, so
    they compare equal to the manifest's plain paths."""
    if path.startswith("file:"):
        path = path[5:]
        while path.startswith("//"):
            path = path[1:]
    return path


def _apply_predicates(df: DataFrame,
                      where: Sequence[Tuple[str, str, object]]
                      ) -> DataFrame:
    for col, op, value in where:
        c = F.col(col)
        if op == "=":
            df = df.where(c == value)
        elif op == "<":
            df = df.where(c < value)
        elif op == "<=":
            df = df.where(c <= value)
        elif op == ">":
            df = df.where(c > value)
        elif op == ">=":
            df = df.where(c >= value)
        elif op == "between":
            df = df.where(c.between(value[0], value[1]))
        else:
            raise ValueError(f"unsupported predicate op: {op}")
    return df


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
                properties: Optional[dict] = None,
                stats: Optional[dict] = None,
                schema_json: Optional[str] = None) -> Snapshot:
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
            stats={f: s for f, s in (stats or {}).items()
                   if f in set(files)},
            schema_json=schema_json,
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
        stats = {f: _file_column_stats(f) for f in new_files}
        if mode == "append" and cur:
            files += cur.files
            stats.update(cur.stats or {})   # carry retained files' stats
            schema_json = _merge_schema_json(cur.schema_json, df.schema)
        else:
            schema_json = df.schema.json()
        return self._commit(files, mode, properties, stats=stats,
                            schema_json=schema_json)

    def read(self, spark: SparkSession,
             snapshot_id: Optional[str] = None,
             version: Optional[int] = None,
             where: Optional[Sequence[Tuple[str, str, object]]] = None,
             ) -> DataFrame:
        """Read the table at a snapshot (default: current) — time
        travel by ``snapshot_id`` or ``version``.

        ``where`` is an optional list of simple predicates
        ``(column, op, value)`` with op in ``= < <= > >= between``
        (``between`` takes a ``(lo, hi)`` tuple).  Files whose
        manifest [min, max] stats PROVABLY exclude a predicate are
        never handed to Spark — the Iceberg data-skipping move that
        makes a selective query on a 10^12-row table open thousands of
        files instead of millions.  The predicates are ALSO applied as
        real filters, so results are exact whether or not stats exist
        (files without stats are conservatively kept, and Spark's own
        row-group pushdown still applies inside every opened file)."""
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
        reader = spark.read
        if snap.schema_json:
            from pyspark.sql.types import StructType
            reader = reader.schema(
                StructType.fromJson(json.loads(snap.schema_json)))
        files = snap.files
        if where:
            stats = snap.stats or {}
            kept = []
            for f in files:
                fs = stats.get(f)
                keep = True
                if fs:
                    for col, op, value in where:
                        rng = fs.get(col)
                        if rng is not None and not _range_may_match(
                                rng[0], rng[1], op, value):
                            keep = False
                            break
                if keep:
                    kept.append(f)
            files = kept
            if not files:
                df = reader.parquet(*snap.files).limit(0)
                return _apply_predicates(df, where)
        df = reader.parquet(*files)
        return _apply_predicates(df, where) if where else df

    def read_incremental(self, spark: SparkSession,
                         from_version: int,
                         to_version: Optional[int] = None) -> DataFrame:
        """Rows ADDED by append snapshots in ``(from_version,
        to_version]`` — Iceberg's incremental append scan, the primitive
        under checkpoint/resume and streaming backfill: a consumer that
        processed the table at ``from_version`` catches up by reading
        only the new files, never rescanning the 10^12 rows it already
        saw.

        Chain rules (Iceberg's own): ``append`` snapshots contribute
        exactly the files they added; ``compact`` snapshots are skipped
        (they rewrite bytes, not rows); an ``overwrite`` or ``upsert``
        in the range raises — row-level changes have no append-delta
        representation, so silently returning something would be a
        correctness bug, not a convenience."""
        snaps = {s.version: s for s in self.snapshots()}
        if to_version is None:
            cur = self.current()
            if cur is None:
                raise FileNotFoundError(
                    f"table {self.root} has no snapshot")
            to_version = cur.version
        if from_version > to_version:
            raise ValueError(
                f"from_version {from_version} > to_version {to_version}")
        added: List[str] = []
        for v in range(from_version + 1, to_version + 1):
            snap = snaps.get(v)
            if snap is None:
                raise KeyError(f"no such snapshot version: {v}")
            if snap.operation == "compact":
                continue
            if snap.operation != "append":
                raise ValueError(
                    f"incremental read across a '{snap.operation}' "
                    f"snapshot (v{v}) is undefined; read the full table "
                    "at the target snapshot instead")
            parent_files = set(
                snaps[v - 1].files) if v - 1 in snaps else set()
            added += [f for f in snap.files if f not in parent_files]
        reader = spark.read
        if snaps[to_version].schema_json:
            from pyspark.sql.types import StructType
            reader = reader.schema(StructType.fromJson(
                json.loads(snaps[to_version].schema_json)))
        if not added:
            base = snaps[to_version].files or snaps[from_version].files
            return reader.parquet(*base).limit(0)
        return reader.parquet(*sorted(added))

    def upsert(self, df: DataFrame, key_cols: Sequence[str],
               properties: Optional[dict] = None) -> Snapshot:
        """Copy-on-write MERGE by key (Iceberg COW ``MERGE INTO``):
        target rows whose key appears in ``df`` are replaced by the
        source rows; unmatched source rows are inserted.  Only data
        files that ACTUALLY contain a matched key are rewritten:

        1. manifest [min, max] stats on the key columns prune the
           candidate file set (a point upsert on a range-clustered
           10^12-row table touches a handful of files);
        2. Spark's hidden ``_metadata.file_path`` column narrows that
           to files with a real key hit (a semi-join, not a guess);
        3. those files are rewritten (anti-join + union source) into a
           new file group; every untouched file is carried into the
           new snapshot by reference.

        The rewrite is one Spark job; nothing is collected to the
        driver but the matched-file list."""
        spark = df.sparkSession
        cur = self.current()
        if cur is None:
            return self.write(df, mode="append", properties=properties)
        key_cols = list(key_cols)
        reader = spark.read
        if cur.schema_json:
            from pyspark.sql.types import StructType
            reader = reader.schema(
                StructType.fromJson(json.loads(cur.schema_json)))
        src = df.cache()
        try:
            # 1. stats prune: files whose key range can overlap source's
            bounds = src.agg(
                *[F.min(k).alias(f"__mn_{k}") for k in key_cols],
                *[F.max(k).alias(f"__mx_{k}") for k in key_cols]
            ).collect()[0]
            candidates = []
            for f in cur.files:
                fs = (cur.stats or {}).get(f)
                keep = True
                if fs:
                    for k in key_cols:
                        rng = fs.get(k)
                        lo, hi = bounds[f"__mn_{k}"], bounds[f"__mx_{k}"]
                        if rng is not None and lo is not None and \
                                not _range_may_match(
                                    rng[0], rng[1], "between", (lo, hi)):
                            keep = False
                            break
                if keep:
                    candidates.append(f)
            # 2. exact matched-file list via the scan's metadata column
            matched_files: List[str] = []
            if candidates:
                cand = (reader.parquet(*candidates)
                        .select(*key_cols, F.col("_metadata.file_path")
                                .alias("__fp")))
                matched_files = [
                    _strip_file_scheme(r["__fp"]) for r in
                    (cand.join(src.select(*key_cols).distinct(),
                               on=key_cols, how="semi")
                     .select("__fp").distinct().collect())
                ]
            # 3. rewrite only files with a hit
            if matched_files:
                keep_rows = (reader.parquet(*matched_files)
                             .join(src.select(*key_cols).distinct(),
                                   on=key_cols, how="anti"))
                rewritten = keep_rows.unionByName(
                    src.select(*keep_rows.columns))
            else:
                rewritten = src
            dirname = os.path.join(self.data_dir, uuid.uuid4().hex)
            rewritten.write.mode("errorifexists").parquet(dirname)
            new_files = [
                os.path.join(dirname, f) for f in os.listdir(dirname)
                if f.endswith(".parquet")
            ]
            untouched = [f for f in cur.files if f not in set(matched_files)]
            stats = {f: _file_column_stats(f) for f in new_files}
            stats.update({f: s for f, s in (cur.stats or {}).items()
                          if f in set(untouched)})
            props = dict(properties or {})
            props.setdefault("rewritten_files", len(matched_files))
            props.setdefault("carried_files", len(untouched))
            return self._commit(untouched + new_files, "upsert",
                                props, stats=stats,
                                schema_json=cur.schema_json)
        finally:
            src.unpersist()

    def delete_where(self, spark: SparkSession, column: str, op: str,
                     value, properties: Optional[dict] = None
                     ) -> "Snapshot":
        """Copy-on-write DELETE (Iceberg COW ``DELETE WHERE``) for a
        structured predicate ``column <op> value`` — structured so the
        manifest stats prune is honest, the same discipline as
        :meth:`read`'s pushdown:

        1. files whose [min, max] stats cannot match the predicate are
           carried into the new snapshot BY REFERENCE (a ranged delete
           on a range-clustered table touches only its files);
        2. surviving candidates are rewritten with the predicate's
           negation (rows matching the delete vanish);
        3. time travel keeps every older snapshot readable — deletes
           are never destructive until ``expire_snapshots``+``vacuum``.

        ``op`` ∈ {'=', '<', '<=', '>', '>=', 'between'} (between takes
        a (lo, hi) tuple, inclusive).  Returns the new snapshot."""
        cur = self.current()
        if cur is None:
            raise ValueError("delete_where on an empty table")
        ops = {
            "=": lambda c: c == value,
            "<": lambda c: c < value,
            "<=": lambda c: c <= value,
            ">": lambda c: c > value,
            ">=": lambda c: c >= value,
            "between": lambda c: c.between(value[0], value[1]),
        }
        if op not in ops:
            raise ValueError(f"unsupported delete predicate op: {op}")
        pred = ops[op](F.col(column))
        reader = spark.read
        if cur.schema_json:
            from pyspark.sql.types import StructType
            reader = reader.schema(
                StructType.fromJson(json.loads(cur.schema_json)))
        candidates, untouched = [], []
        for f in cur.files:
            rng = ((cur.stats or {}).get(f) or {}).get(column)
            if rng is not None and not _range_may_match(
                    rng[0], rng[1], op, value):
                untouched.append(f)
            else:
                candidates.append(f)
        new_files: List[str] = []
        if candidates:
            kept = reader.parquet(*candidates).filter(~pred)
            dirname = os.path.join(self.data_dir, uuid.uuid4().hex)
            kept.write.mode("errorifexists").parquet(dirname)
            new_files = [
                os.path.join(dirname, f) for f in os.listdir(dirname)
                if f.endswith(".parquet")
            ]
        stats = {f: _file_column_stats(f) for f in new_files}
        stats.update({f: s for f, s in (cur.stats or {}).items()
                      if f in set(untouched)})
        props = dict(properties or {})
        props.setdefault("predicate", f"{column} {op} {value!r}")
        props.setdefault("rewritten_files", len(candidates))
        props.setdefault("carried_files", len(untouched))
        return self._commit(untouched + new_files, "delete", props,
                            stats=stats, schema_json=cur.schema_json)

    def compact(self, spark: SparkSession,
                target_files: int = 1,
                zorder_by: Optional[Sequence[str]] = None,
                properties: Optional[dict] = None) -> Snapshot:
        """Bin-pack the current snapshot's files into ``target_files``
        (Iceberg ``rewrite_data_files``): identical rows, fewer/bigger
        files, committed as operation ``compact`` so incremental readers
        know no rows changed.  The maintenance move that keeps a table
        fed by many small streaming commits scannable.

        ``zorder_by`` re-clusters on a Morton interleave of the listed
        columns instead of plain coalesce (Iceberg's zorder rewrite
        strategy): every output file then has a tight min/max box in
        every listed column, so the manifest stats prune multi-column
        predicates — the layout move that turns ``entity = e AND ts
        BETWEEN a AND b`` on a huge table into a handful of file
        opens."""
        cur = self.current()
        if cur is None:
            raise FileNotFoundError(f"table {self.root} has no snapshot")
        if zorder_by:
            df = (_with_zvalue(self.read(spark), list(zorder_by))
                  .repartitionByRange(target_files, F.col("__z"))
                  .sortWithinPartitions("__z")
                  .drop("__z"))
        else:
            df = self.read(spark).coalesce(target_files)
        dirname = os.path.join(self.data_dir, uuid.uuid4().hex)
        df.write.mode("errorifexists").parquet(dirname)
        new_files = [
            os.path.join(dirname, f) for f in os.listdir(dirname)
            if f.endswith(".parquet")
        ]
        stats = {f: _file_column_stats(f) for f in new_files}
        props = dict(properties or {})
        props.setdefault("compacted_from", len(cur.files))
        if zorder_by:
            props.setdefault("zorder_by", list(zorder_by))
        return self._commit(new_files, "compact", props, stats=stats,
                            schema_json=cur.schema_json)

    def rollback(self, version: int) -> Snapshot:
        """Roll the table back to ``version`` AS A NEW COMMIT
        (Iceberg semantics: the log is append-only — rollback writes
        a new snapshot referencing the target version's file set, so
        the bad commits stay inspectable and time travel across them
        keeps working).  Metadata-only: no data files move; cites the
        target in ``properties['rollback_of']``."""
        target = next((s for s in self.snapshots()
                       if s.version == int(version)), None)
        if target is None:
            raise ValueError(f"no snapshot with version {version}")
        return self._commit(
            list(target.files), "rollback",
            properties={"rollback_of": str(int(version))},
            stats=dict(target.stats),
            schema_json=target.schema_json)

    def expire_snapshots(self, keep_last: int = 1) -> int:
        """Drop all but the newest ``keep_last`` snapshot manifests
        (never the current one), so a following :meth:`vacuum` can
        reclaim the data files only they referenced.  Returns the
        number of manifests removed."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        snaps = self.snapshots()
        expire = snaps[:-keep_last] if len(snaps) > keep_last else []
        for s in expire:
            os.remove(os.path.join(self.log_dir, f"v{s.version:08d}.json"))
        return len(expire)

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

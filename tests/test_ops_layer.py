"""Snapshot table format, checkpoint/resume with lineage, metrics
side-channel (SURVEY.md §5.3 resume test)."""
import json
import os

import numpy as np
import pandas as pd
import pytest

from hiselspark.checkpoint import PartitionedRun
from hiselspark.metrics import instrument
from hiselspark.sources.snapshots import SnapshotTable


def test_snapshot_append_overwrite_timetravel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    df1 = spark.range(0, 10).withColumnRenamed("id", "x")
    s1 = t.write(df1, mode="overwrite")
    df2 = spark.range(10, 15).withColumnRenamed("id", "x")
    s2 = t.write(df2, mode="append")
    assert t.read(spark).count() == 15
    assert t.read(spark, snapshot_id=s1.snapshot_id).count() == 10
    assert t.read(spark, version=s2.version).count() == 15
    df3 = spark.range(0, 3).withColumnRenamed("id", "x")
    t.write(df3, mode="overwrite")
    assert t.read(spark).count() == 3
    # time travel still sees the old snapshots
    assert t.read(spark, snapshot_id=s2.snapshot_id).count() == 15
    snaps = t.snapshots()
    assert [s.version for s in snaps] == [1, 2, 3]
    assert snaps[1].parent_id == snaps[0].snapshot_id


def test_snapshot_vacuum_removes_only_orphans(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.write(spark.range(5), mode="overwrite")
    # orphan: data written but never committed (simulated kill)
    orphan_dir = os.path.join(t.data_dir, "deadbeef")
    spark.range(3).write.parquet(orphan_dir)
    removed = t.vacuum()
    assert removed >= 1
    assert t.read(spark).count() == 5


def test_checkpoint_resume_skips_committed(spark, tmp_path):
    calls = []

    def job(partition, out):
        calls.append(partition)
        df = spark.range(int(partition) * 10, int(partition) * 10 + 10)
        df.write.parquet(out)
        return df

    run = PartitionedRun(str(tmp_path / "run"), input_snapshot="snap-1")
    run.run(["0", "1"], job)
    assert calls == ["0", "1"]

    # simulate a later resume over a larger partition list: the two
    # committed partitions must NOT be recomputed
    run2 = PartitionedRun(str(tmp_path / "run"), input_snapshot="snap-1")
    before = {p: e["finished_at"] for p, e in run2.committed().items()}
    run2.run(["0", "1", "2"], job)
    assert calls == ["0", "1", "2"]  # only "2" was recomputed
    after = run2.committed()
    for p, ts in before.items():
        assert after[p]["finished_at"] == ts  # untouched lineage
    assert run2.read_output(spark).count() == 30
    for e in run2.lineage():
        assert e["input_snapshot"] == "snap-1"
        assert e["rows"] == 10
        assert e["bytes"] > 0


def test_checkpoint_cleans_inprogress_debris(spark, tmp_path):
    run = PartitionedRun(str(tmp_path / "run"))
    debris = run.output_path("7") + ".inprogress"
    os.makedirs(debris)
    with open(os.path.join(debris, "junk"), "w") as f:
        f.write("killed mid-write")

    def job(partition, out):
        df = spark.range(4)
        df.write.parquet(out)
        return df

    run.run(["7"], job)
    assert not os.path.exists(debris)
    assert run.read_output(spark).count() == 4


def test_metrics_side_channel(spark):
    df = spark.range(0, 1000, numPartitions=4)
    out, m = instrument(df, "scan")
    assert out.count() == 1000
    d = m.as_dict()
    assert d["rows"] == 1000
    assert d["partitions_seen"] == 4
    assert d["approx_bytes"] > 0


def test_snapshot_stats_prune_files_exactly(spark, tmp_path):
    """Iceberg-style data skipping: per-file [min,max] stats from the
    parquet footers prune files a predicate provably excludes, and the
    pruned read returns exactly the full-scan-plus-filter answer."""
    import pandas as pd
    t = SnapshotTable(str(tmp_path / "tbl"))
    for lo in (0, 100, 200):       # three appends, disjoint id ranges
        pdf = pd.DataFrame({"doc_id": range(lo, lo + 50),
                            "src": [f"s{lo}"] * 50})
        t.write(spark.createDataFrame(pdf).coalesce(1), mode="append")
    snap = t.current()
    assert len(snap.files) == 3 and len(snap.stats) == 3
    for f, st in snap.stats.items():
        assert "doc_id" in st and st["doc_id"][1] - st["doc_id"][0] == 49
    # predicate inside one file's range -> one file scanned
    pruned = t.read(spark, where=[("doc_id", "between", (120, 130))])
    assert len(pruned.inputFiles()) == 1
    full = t.read(spark).where("doc_id between 120 and 130")
    assert sorted(map(tuple, pruned.collect())) == \
        sorted(map(tuple, full.collect()))
    # string stats prune too; op variants
    assert len(t.read(spark, where=[("src", "=", "s200")])
               .inputFiles()) == 1
    assert len(t.read(spark, where=[("doc_id", "<", 100)])
               .inputFiles()) == 1
    assert len(t.read(spark, where=[("doc_id", ">=", 100)])
               .inputFiles()) == 2
    # predicate excluding every file -> empty result, correct schema
    none = t.read(spark, where=[("doc_id", ">", 10_000)])
    assert none.count() == 0 and none.columns == ["doc_id", "src"]
    # stats survive time travel and append carries parent stats
    s1 = t.snapshots()[0]
    assert t.read(spark, snapshot_id=s1.snapshot_id,
                  where=[("doc_id", "<", 10)]).count() == 10


def _pdf(lo, hi, tag):
    return pd.DataFrame({"doc_id": range(lo, hi),
                         "src": [tag] * (hi - lo)})


def test_incremental_read_appends_only(spark, tmp_path):
    """Iceberg incremental append scan: exactly the rows added in
    (from, to], compact snapshots skipped, row-level ops rejected."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    for lo in (0, 100, 200):                       # v1, v2, v3
        t.write(spark.createDataFrame(_pdf(lo, lo + 50, f"b{lo}"))
                .coalesce(1), mode="append")
    inc = t.read_incremental(spark, from_version=1)
    got = sorted(r["doc_id"] for r in inc.collect())
    assert got == list(range(100, 150)) + list(range(200, 250))
    # bounded range (v1, v2]
    assert t.read_incremental(spark, 1, 2).count() == 50
    # compact rewrites bytes, not rows: skipped, so (v3, v4] is empty
    t.compact(spark, target_files=1)               # v4
    assert t.read_incremental(spark, 3, 4).count() == 0
    # ...and (v1, v4] still returns exactly the appended rows
    assert t.read_incremental(spark, 1, 4).count() == 100
    # row-level change in range -> explicit refusal
    t.upsert(spark.createDataFrame(_pdf(0, 5, "up")), ["doc_id"])  # v5
    with pytest.raises(ValueError):
        t.read_incremental(spark, 3, 5)


def test_upsert_rewrites_only_matched_files(spark, tmp_path):
    """Copy-on-write MERGE: stats + _metadata narrow the rewrite to
    files actually containing a matched key; everything else is
    carried by reference; old snapshots still read the old rows."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    for lo in (0, 100, 200):
        t.write(spark.createDataFrame(_pdf(lo, lo + 50, f"b{lo}"))
                .coalesce(1), mode="append")
    before = t.current()
    src = pd.concat([_pdf(120, 130, "upd"),        # matches file b100
                     _pdf(500, 505, "new")])       # pure insert
    snap = t.upsert(spark.createDataFrame(src).coalesce(1), ["doc_id"])
    assert snap.operation == "upsert"
    assert snap.properties["rewritten_files"] == 1
    assert len(set(snap.files) & set(before.files)) == 2
    got = t.read(spark).toPandas().sort_values("doc_id")
    assert len(got) == 155                         # 150 - 10 + 10 + 5
    assert (got.loc[got.doc_id.between(120, 129), "src"] == "upd").all()
    assert (got.loc[got.doc_id >= 500, "src"] == "new").all()
    assert (got.loc[got.doc_id.between(100, 119), "src"] == "b100").all()
    # time travel: the pre-upsert snapshot is untouched
    old = t.read(spark, version=before.version).toPandas()
    assert len(old) == 150 and (old.src != "upd").all()
    # new files carry stats so later reads keep pruning
    new_files = set(snap.files) - set(before.files)
    assert all("doc_id" in snap.stats[f] for f in new_files)
    # stats-pruned read over the upserted table is still exact
    assert t.read(spark, where=[("doc_id", "=", 125)]).collect()[0][
        "src"] == "upd"


def test_compact_expire_vacuum_lifecycle(spark, tmp_path):
    """compact bin-packs to fewer files with identical rows; expire +
    vacuum reclaim the files only dead snapshots referenced."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    for lo in (0, 100, 200):
        t.write(spark.createDataFrame(_pdf(lo, lo + 50, f"b{lo}"))
                .coalesce(1), mode="append")
    rows_before = sorted(map(tuple, t.read(spark).collect()))
    snap = t.compact(spark, target_files=1)
    assert len(snap.files) == 1
    assert snap.properties["compacted_from"] == 3
    assert sorted(map(tuple, t.read(spark).collect())) == rows_before
    n_expired = t.expire_snapshots(keep_last=1)
    assert n_expired == 3
    assert t.vacuum() == 3          # the three pre-compact files
    assert sorted(map(tuple, t.read(spark).collect())) == rows_before
    assert [s.version for s in t.snapshots()] == [snap.version]


def test_schema_evolution_add_column(spark, tmp_path):
    """Appends may add columns: files written before the column
    existed surface it as null; time travel sees the old schema;
    upsert and compact preserve the evolved schema."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.write(spark.createDataFrame(_pdf(0, 50, "b0")), mode="append")
    evolved = pd.DataFrame({"doc_id": range(100, 150),
                            "src": ["b100"] * 50,
                            "lang": ["en"] * 50})
    t.write(spark.createDataFrame(evolved), mode="append")       # v2
    got = t.read(spark).toPandas().sort_values("doc_id")
    assert list(got.columns) == ["doc_id", "src", "lang"]
    assert got.loc[got.doc_id < 50, "lang"].isna().all()
    assert (got.loc[got.doc_id >= 100, "lang"] == "en").all()
    # time travel: v1 has the pre-evolution schema
    assert list(t.read(spark, version=1).columns) == ["doc_id", "src"]
    # type change is refused
    bad = pd.DataFrame({"doc_id": [1], "src": ["x"], "lang": [1.5]})
    with pytest.raises(ValueError):
        t.write(spark.createDataFrame(bad), mode="append")
    # upsert + compact keep the evolved schema (old-file rows rewritten
    # with explicit nulls where the column predates them)
    up = pd.DataFrame({"doc_id": [10], "src": ["upd"], "lang": ["fr"]})
    t.upsert(spark.createDataFrame(up).coalesce(1), ["doc_id"])
    t.compact(spark, target_files=1)
    got = t.read(spark).toPandas().sort_values("doc_id")
    assert len(got) == 100
    assert got.loc[got.doc_id == 10, "lang"].iloc[0] == "fr"
    assert got.loc[got.doc_id == 11, "lang"].isna().all()


def test_zorder_compact_prunes_both_dimensions(spark, tmp_path):
    """Z-order rewrite: after compacting on a Morton interleave of
    (x, y), a 2-D box predicate prunes files in BOTH dimensions —
    the linear-clustered layout can only ever serve its leading
    column — and the rows are bit-identical to pre-compact."""
    import itertools
    grid = pd.DataFrame(
        [(x, y, x * 32 + y) for x, y in
         itertools.product(range(32), range(32))],
        columns=["x", "y", "v"])
    # linear layout: 16 files clustered by x only
    lin = SnapshotTable(str(tmp_path / "lin"))
    sdf = spark.createDataFrame(grid)
    lin.write(sdf.repartitionByRange(16, "x"), mode="append")
    # z-order layout: same rows, 16 files clustered by interleave(x,y)
    zt = SnapshotTable(str(tmp_path / "z"))
    zt.write(sdf.repartitionByRange(16, "x"), mode="append")
    snap = zt.compact(spark, target_files=16, zorder_by=["x", "y"])
    assert snap.properties["zorder_by"] == ["x", "y"]
    rows = sorted(map(tuple, zt.read(spark).collect()))
    assert rows == sorted(map(tuple, lin.read(spark).collect()))
    box = [("x", "between", (8, 15)), ("y", "between", (8, 15))]
    n_lin = len(lin.read(spark, where=box).inputFiles())
    n_z = len(zt.read(spark, where=box).inputFiles())
    # linear: y prunes nothing -> all x-matching files open (~1/4 of
    # the table); zorder: the box maps to a contiguous z range
    assert n_z < n_lin
    assert n_z <= 4
    # and the pruned read is still exact
    got = sorted(map(tuple, zt.read(spark, where=box).collect()))
    exp = [(x, y, x * 32 + y) for x in range(8, 16) for y in range(8, 16)]
    assert got == sorted(exp)


def test_catchup_featurize_incremental(spark, tmp_path):
    """Derived-table catch-up: transform ONLY the delta, stamp the
    processed source version, idempotent no-op when current, and the
    final content equals a one-shot transform of the whole source."""
    from pyspark.sql import functions as F
    from hiselspark.incremental import (catchup,
                                        processed_source_version)

    src = SnapshotTable(str(tmp_path / "src"))
    drv = SnapshotTable(str(tmp_path / "drv"))
    feat = lambda df: df.select(
        "doc_id", "src", F.length("src").alias("n"))

    # nothing to do on an empty source
    assert catchup(spark, src, drv, feat) is None

    for lo in (0, 100):                              # src v1, v2
        src.write(spark.createDataFrame(_pdf(lo, lo + 50, f"b{lo}"))
                  .coalesce(1), mode="append")
    s = catchup(spark, src, drv, feat, to_version=1)  # bounded
    assert s is not None and processed_source_version(drv) == 1
    assert drv.read(spark).count() == 50
    s = catchup(spark, src, drv, feat)                # v2 delta only
    assert processed_source_version(drv) == 2
    # idempotent: already current
    assert catchup(spark, src, drv, feat) is None

    # third source append, catch up again
    src.write(spark.createDataFrame(_pdf(200, 230, "b200"))
              .coalesce(1), mode="append")
    catchup(spark, src, drv, feat)
    got = sorted((r["doc_id"], r["src"], r["n"])
                 for r in drv.read(spark).collect())
    want = sorted((r["doc_id"], r["src"], r["n"])
                  for r in feat(src.read(spark)).collect())
    assert got == want

    # a compact in the range is transparent
    src.compact(spark, target_files=1)
    assert catchup(spark, src, drv, feat) is None
    # beyond-current target is an explicit error
    with pytest.raises(ValueError):
        catchup(spark, src, drv, feat, to_version=99)


def test_snapshot_delete_where(spark, tmp_path):
    """Copy-on-write DELETE: stats-pruned files carried by reference,
    matching rows gone, time travel intact, predicate ops validated."""
    import pytest as _pytest
    from pyspark.sql import functions as F
    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.range(0, 300).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    for lo in (0, 100, 200):
        t.write(df.where(F.col("k").between(lo, lo + 99)).coalesce(1),
                mode="append")
    snap = t.delete_where(spark, "k", "between", (120, 179))
    # two range files cannot contain 120..179 -> carried by reference
    assert snap.properties["carried_files"] == "2" or \
        int(snap.properties["carried_files"]) == 2
    now = {r["k"] for r in t.read(spark).select("k").collect()}
    assert now == set(range(0, 120)) | set(range(180, 300))
    # time travel: the pre-delete version still has every row
    old = t.read(spark, version=3).count()
    assert old == 300
    # equality-op delete and validation
    t.delete_where(spark, "k", "=", 5)
    assert 5 not in {r["k"] for r in t.read(spark).select("k")
                     .collect()}
    with _pytest.raises(ValueError):
        t.delete_where(spark, "k", "like", "x")

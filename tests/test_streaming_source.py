"""Streaming read of the SnapshotTable commit log (Spark 4 Python
Data Source API): snapshot versions as offsets -> exactly-once
incremental consumption, restart-safe via the stream checkpoint."""
import uuid

import pandas as pd
import pytest

from pyspark.sql import functions as F

from hiselspark.sources.snapshots import SnapshotTable
from hiselspark.sources.stream_source import SnapshotStreamDataSource


def _drain(spark, root, ckpt, start_version=None):
    """availableNow drain into a fresh memory table; the CHECKPOINT
    carries offsets across calls, so each drain yields only rows the
    previous drains have not emitted — the exactly-once property."""
    reader = (spark.readStream.format("snapshot_stream")
              .option("path", root))
    if start_version is not None:
        reader = reader.option("startVersion", str(start_version))
    name = f"snapstream_{uuid.uuid4().hex[:12]}"
    q = (reader.load().writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name).collect()


def _pdf(lo, hi, tag, **extra):
    d = {"doc_id": range(lo, hi), "src": [tag] * (hi - lo)}
    d.update({k: [v] * (hi - lo) for k, v in extra.items()})
    return pd.DataFrame(d)


@pytest.fixture(autouse=True)
def _register(spark):
    spark.dataSource.register(SnapshotStreamDataSource)


def test_stream_drains_resumes_and_skips_compact(spark, tmp_path):
    """Exactly-once across restarts: drain to a FILE sink (the memory
    sink forbids checkpoint recovery) and assert the cumulative output
    after each restart — nothing doubled, nothing lost, compact
    invisible."""
    root = str(tmp_path / "tbl")
    t = SnapshotTable(root)
    for lo in (0, 100):
        t.write(spark.createDataFrame(_pdf(lo, lo + 50, f"b{lo}"))
                .coalesce(1), mode="append")
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def drain_to_files():
        q = (spark.readStream.format("snapshot_stream")
             .option("path", root).load()
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return sorted(r["doc_id"]
                      for r in spark.read.parquet(out).collect())

    assert drain_to_files() == \
        list(range(0, 50)) + list(range(100, 150))
    # no new commits -> restart emits nothing new
    assert len(drain_to_files()) == 100
    # two more appends + a compact; only the appended rows arrive,
    # exactly once — compact rewrote every byte but added no rows
    t.write(spark.createDataFrame(_pdf(200, 220, "b200")).coalesce(1),
            mode="append")
    t.compact(spark, target_files=1)
    t.write(spark.createDataFrame(_pdf(300, 310, "b300")).coalesce(1),
            mode="append")
    assert drain_to_files() == (
        list(range(0, 50)) + list(range(100, 150))
        + list(range(200, 220)) + list(range(300, 310)))


def test_stream_start_version_and_schema_evolution(spark, tmp_path):
    root = str(tmp_path / "tbl")
    t = SnapshotTable(root)
    t.write(spark.createDataFrame(_pdf(0, 50, "b0")).coalesce(1),
            mode="append")                               # v1
    t.write(spark.createDataFrame(_pdf(100, 150, "b100", lang="en"))
            .coalesce(1), mode="append")                 # v2, adds col
    # stream sees the LATEST schema; pre-evolution files null-fill
    rows = _drain(spark, root, str(tmp_path / "c1"))
    assert {r["lang"] for r in rows if r["doc_id"] < 50} == {None}
    assert {r["lang"] for r in rows if r["doc_id"] >= 100} == {"en"}
    # startVersion skips history: only v2's rows
    rows2 = _drain(spark, root, str(tmp_path / "c2"), start_version=1)
    assert sorted(r["doc_id"] for r in rows2) == list(range(100, 150))


def test_stream_rejects_row_level_change(spark, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException
    root = str(tmp_path / "tbl")
    t = SnapshotTable(root)
    t.write(spark.createDataFrame(_pdf(0, 50, "b0")).coalesce(1),
            mode="append")
    t.upsert(spark.createDataFrame(_pdf(10, 15, "up")).coalesce(1),
             ["doc_id"])
    with pytest.raises(StreamingQueryException):
        _drain(spark, root, str(tmp_path / "c"))

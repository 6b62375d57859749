"""Stream-stream interval join: drained backlog equals the batch
range join; watermark bounds state and drops too-late rows."""
import pandas as pd

from pyspark.sql import functions as F

from hiselspark.streaming.joins import stream_interval_join
from hiselspark.streaming.sessions import (read_events_stream,
                                           run_stream_to_batch,
                                           stage_microbatch_files)

T0 = pd.Timestamp("2024-05-01 12:00:00")


def _stage(spark, tmp_path, name, frames):
    src = str(tmp_path / name)
    sdf = [spark.createDataFrame(f) for f in frames]
    stage_microbatch_files(sdf, src)
    return read_events_stream(spark, src, sdf[0].schema,
                              max_files_per_trigger=1) \
        .withColumn("ts", F.col("ts").cast("timestamp"))


def test_stream_interval_join_equals_batch(spark, tmp_path):
    lefts = pd.DataFrame({
        "lid": [0, 1, 2],
        "key": [1, 1, 2],
        "ts": [T0, T0 + pd.Timedelta(minutes=40), T0],
    })
    rights = pd.DataFrame({
        "rid": [10, 11, 12, 13],
        "key": [1, 1, 2, 2],
        "ts": [T0 - pd.Timedelta(minutes=10),     # in window of lid 0
               T0 + pd.Timedelta(minutes=20),     # in window of lid 1
               T0 - pd.Timedelta(minutes=31),     # just outside (30m)
               T0],                               # in window of lid 2
    })
    l = _stage(spark, tmp_path, "l", [lefts.iloc[:2], lefts.iloc[2:]])
    r = _stage(spark, tmp_path, "r", [rights.iloc[:2], rights.iloc[2:]])
    j = stream_interval_join(l, r, "key", -1800.0, 0.0,
                             watermark_seconds=7200)
    out = (run_stream_to_batch(j, output_mode="append")
           .select("lid", "rid_r").toPandas())
    pairs = set(map(tuple, out.to_numpy()))
    assert pairs == {(0, 10), (1, 11), (2, 13)}


def test_stream_interval_join_drops_beyond_watermark(spark, tmp_path):
    # batch 0 advances BOTH watermarks far past T0 (the global
    # watermark is the min across inputs); eviction is applied at the
    # END of the following batch, so an intermediate batch must pass
    # before the left row's state is really gone — the late right row
    # arriving after that finds nothing.  (A late row landing in the
    # same batch the eviction is due CAN still match: Spark's contract
    # for rows older than the watermark is best-effort drop, the
    # guarantee is only that in-watermark matches are kept.)
    far = T0 + pd.Timedelta(hours=6)
    l1 = pd.DataFrame({"lid": [0, 1], "key": [1, 9],
                       "ts": [T0, far]})
    r1 = pd.DataFrame({"rid": [20], "key": [8], "ts": [far]})
    rmid = pd.DataFrame({"rid": [22], "key": [8],
                         "ts": [far + pd.Timedelta(hours=1)]})
    r2 = pd.DataFrame({"rid": [21], "key": [1],
                       "ts": [T0 - pd.Timedelta(minutes=5)]})  # too late
    l = _stage(spark, tmp_path, "l", [l1])
    r = _stage(spark, tmp_path, "r", [r1, rmid, r2])
    j = stream_interval_join(l, r, "key", -1800.0, 0.0,
                             watermark_seconds=60)
    out = run_stream_to_batch(j, output_mode="append").toPandas()
    assert len(out) == 0

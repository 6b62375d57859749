"""Stream-stream interval join: drained backlog equals the batch
range join; watermark bounds state and drops too-late rows."""
import pandas as pd
import pytest

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


def test_stream_asof_enrich_equals_batch_and_never_leaks(spark, tmp_path):
    """Ordered replay across 3 micro-batches equals the batch as-of
    join; an out-of-order label (older than the retained feature)
    gets NULL, never a future value."""
    import numpy as np
    from hiselspark.operators.asof import asof_join
    from hiselspark.streaming.asof import stream_asof_enrich

    rng = np.random.default_rng(31)
    n = 120
    rows = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 6, n),
        "ts": T0 + pd.to_timedelta(np.sort(rng.integers(0, 86400, n)),
                                   unit="s"),
        "is_feature": rng.uniform(size=n) < 0.5,
        "fvalue": rng.normal(size=n).round(3),
    })
    frames = [rows.iloc[:40], rows.iloc[40:80], rows.iloc[80:]]
    src = str(tmp_path / "asof_src")
    sdf = [spark.createDataFrame(f) for f in frames]
    stage_microbatch_files(sdf, src)
    stream = (read_events_stream(spark, src, sdf[0].schema,
                                 max_files_per_trigger=1)
              .withColumn("ts", F.col("ts").cast("timestamp"))
              .withColumn("us", (F.col("ts").cast("double")
                                 * 1_000_000).cast("long")))
    got = (run_stream_to_batch(stream_asof_enrich(stream),
                               output_mode="append")
           .toPandas().set_index("label_id").sort_index())

    feats = (rows[rows["is_feature"]]
             .rename(columns={"fvalue": "v"})[["user_id", "ts", "v"]])
    labels = rows[~rows["is_feature"]][["event_id", "user_id", "ts"]]
    fdf = spark.createDataFrame(feats)
    ldf = spark.createDataFrame(labels)
    exp = (asof_join(ldf, fdf, on="user_id", left_ts="ts",
                     right_ts="ts", value_cols=["v"])
           .toPandas().set_index("event_id").sort_index())
    assert len(got) == len(exp)
    pd.testing.assert_series_equal(
        got["matched_value"], exp["v"],
        check_names=False, check_dtype=False)

    # out-of-order: a label OLDER than everything arrives last
    late_label = rows.iloc[[0]].copy()
    late_label["event_id"] = 999
    late_label["is_feature"] = False
    late_label["ts"] = T0 - pd.Timedelta(hours=1)
    src2 = str(tmp_path / "asof_src2")
    stage_microbatch_files(
        [spark.createDataFrame(f) for f in frames + [late_label]], src2)
    stream2 = (read_events_stream(spark, src2, sdf[0].schema,
                                  max_files_per_trigger=1)
               .withColumn("ts", F.col("ts").cast("timestamp"))
               .withColumn("us", (F.col("ts").cast("double")
                                  * 1_000_000).cast("long")))
    got2 = (run_stream_to_batch(stream_asof_enrich(stream2),
                                output_mode="append")
            .toPandas().set_index("label_id"))
    assert pd.isna(got2.loc[999, "matched_value"])


def test_stream_cusum_multi_batch_equals_literal_recursion(
        spark, tmp_path):
    import numpy as np
    from pyspark.sql import functions as F  # noqa: F811
    from hiselspark.streaming.stateful import stream_cusum
    rng = np.random.default_rng(17)
    n = 120
    pdf = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 4, n),
        "ts": T0 + pd.to_timedelta(np.arange(n) * 90, unit="s"),
        "cents": rng.integers(800, 1300, n),
    })
    # two micro-batch files, split in time order (the source contract)
    stream = _stage(spark, tmp_path, "cusum",
                    [pdf.iloc[:70], pdf.iloc[70:]])
    out = run_stream_to_batch(
        stream_cusum(stream, "user_id", "ts", "cents", "event_id",
                     target=1000, slack=50),
        output_mode="update")
    final = (out.orderBy(F.col("n_events").desc())
                .toPandas().drop_duplicates("entity")
                .set_index("entity"))
    for u in range(4):
        g = pdf[pdf.user_id == u].sort_values(["ts", "event_id"])
        sp = sn = 0
        for x in g.cents:
            sp = max(0, sp + (int(x) - 1050))
            sn = max(0, sn + (950 - int(x)))
        assert int(final.loc[u, "n_events"]) == len(g)
        assert int(final.loc[u, "cusum_pos"]) == sp
        assert int(final.loc[u, "cusum_neg"]) == sn


def test_stream_decayed_count_multi_batch_equals_recurrence(
        spark, tmp_path):
    import numpy as np
    from pyspark.sql import functions as F  # noqa: F811
    from hiselspark.streaming.stateful import stream_decayed_count
    rng = np.random.default_rng(23)
    n = 90
    pdf = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 3, n),
        "ts": T0 + pd.to_timedelta(
            np.cumsum(rng.integers(1, 7200, n)), unit="s"),
    })
    stream = _stage(spark, tmp_path, "decay",
                    [pdf.iloc[:40], pdf.iloc[40:]])
    out = run_stream_to_batch(
        stream_decayed_count(stream, "user_id", "ts", "event_id",
                             halflife_seconds=3600.0),
        output_mode="update")
    final = (out.orderBy(F.col("n_events").desc())
                .toPandas().drop_duplicates("entity")
                .set_index("entity"))
    for u in range(3):
        g = pdf[pdf.user_id == u].sort_values(["ts", "event_id"])
        if not len(g):
            continue
        s, last = 0.0, None
        for t in g.ts:
            us = t.value // 1000
            s = (s * 2.0 ** ((last - us) / 3.6e9) + 1.0
                 if last is not None else 1.0)
            last = us
        assert int(final.loc[u, "n_events"]) == len(g)
        assert final.loc[u, "score"] == pytest.approx(s, rel=1e-12)
        assert int(final.loc[u, "last_us"]) == last

"""Streaming attribution: state spans micro-batches, horizon honored,
first-touch is lifetime, never credits a future touch."""
import pandas as pd

from hiselspark.streaming.attribution import stream_attribution
from hiselspark.streaming.sessions import (read_events_stream,
                                           run_stream_to_batch,
                                           stage_microbatch_files)

US = 1_000_000


def _df(rows):
    return pd.DataFrame(rows, columns=["user_id", "event_id", "us",
                                       "is_touch"])


def test_attribution_state_spans_microbatches(spark, tmp_path):
    horizon = 100 * US
    # batch 1: first touch (id 1) and a later touch (id 2)
    b1 = _df([(7, 1, 10 * US, True), (7, 2, 50 * US, True),
              # conversion before any touch on another user
              (8, 3, 20 * US, False)])
    # batch 2: conversion inside horizon of touch 2; touch for user 8
    b2 = _df([(7, 4, 120 * US, False), (8, 5, 130 * US, True)])
    # batch 3: conversion far outside horizon of last touch (id 2)
    # but first-touch (lifetime) still credited; user 8 conversion
    # after its touch
    b3 = _df([(7, 6, 900 * US, False), (8, 7, 150 * US, False)])
    frames = [spark.createDataFrame(b) for b in (b1, b2, b3)]
    src = str(tmp_path / "src")
    stage_microbatch_files(frames, src)
    stream = read_events_stream(spark, src, frames[0].schema,
                                max_files_per_trigger=1)
    out = run_stream_to_batch(
        stream_attribution(stream, horizon_us=horizon),
        output_mode="append").toPandas().set_index("conv_id")
    assert len(out) == 4
    # user 7, conv 4 @120s: last touch id 2 @50s (within 100s), first 1
    assert out.loc[4, "first_touch_id"] == 1
    assert out.loc[4, "last_touch_id"] == 2
    assert out.loc[4, "last_latency_us"] == 70 * US
    # user 7, conv 6 @900s: horizon excludes last touch; first stays
    assert out.loc[6, "first_touch_id"] == 1
    assert pd.isna(out.loc[6, "last_touch_id"])
    assert pd.isna(out.loc[6, "last_latency_us"])
    # user 8, conv 3 @20s: NO touch yet (touch arrives later) -> NULLs
    assert pd.isna(out.loc[3, "first_touch_id"])
    assert pd.isna(out.loc[3, "last_touch_id"])
    # user 8, conv 7 @150s: touch 5 @130s credited both ways
    assert out.loc[7, "first_touch_id"] == 5
    assert out.loc[7, "last_touch_id"] == 5
    assert out.loc[7, "last_latency_us"] == 20 * US


def test_threshold_alerts_transitions_and_state(spark, tmp_path):
    """k-of-last-n alerting: fires on the transition only, re-fires
    after clearing, bitmask state spans micro-batches."""
    import pandas as pd
    from hiselspark.streaming.alerts import stream_threshold_alerts
    from hiselspark.streaming.sessions import (read_events_stream,
                                               run_stream_to_batch,
                                               stage_microbatch_files)
    # entity 1: values cross k=2-of-n=4 twice with a clear between;
    # the second rise spans a batch boundary
    seq = [1, 9, 9, 1, 1, 1, 1, 9, 9, 1]   # threshold 5
    rows = [(1, i + 1, (i + 1) * US, v) for i, v in enumerate(seq)]
    b1 = pd.DataFrame(rows[:7],
                      columns=["user_id", "event_id", "us", "v"])
    b2 = pd.DataFrame(rows[7:],
                      columns=["user_id", "event_id", "us", "v"])
    frames = [spark.createDataFrame(b) for b in (b1, b2)]
    src = str(tmp_path / "src")
    stage_microbatch_files(frames, src)
    stream = read_events_stream(spark, src, frames[0].schema,
                                max_files_per_trigger=1)
    out = run_stream_to_batch(
        stream_threshold_alerts(stream, threshold=5, n=4, k=2),
        output_mode="append").toPandas()
    # brute replay: cnt over last 4, alert when cnt>=2 and prev<2
    ex = [1 if v > 5 else 0 for v in seq]
    cnts = [sum(ex[max(0, i - 3):i + 1]) for i in range(len(ex))]
    want = [i + 1 for i in range(len(ex))
            if cnts[i] >= 2 and (i == 0 or cnts[i - 1] < 2)]
    assert sorted(out["event_id"]) == want
    assert len(want) == 2          # two separate incidents

"""Triple-barrier and inactivity labels vs hand-computed oracles."""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hiselspark.operators.labels import inactivity_label, triple_barrier


def test_triple_barrier_all_three_outcomes(spark):
    t0 = pd.Timestamp("2024-04-01")

    def row(i, mins, lvl):
        return {"i": i, "e": "u", "ts": t0 + pd.Timedelta(minutes=mins),
                "lvl": lvl}

    rows = [
        row(0, 0, 1000),    # -> +1: hits 1020 at t=10min
        row(1, 10, 1021),   # -> -1: falls to 998 (<=1000.9..) at t=20
        row(2, 30, 998),    # -> 0: stays inside barriers till horizon
        row(3, 40, 999),
        row(4, 50, 1000),
        row(5, 4000, 500),  # isolated late point: empty fwd window -> 0
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = (triple_barrier(df, "e", "ts", "lvl",
                          horizon_seconds=3600.0,
                          up_frac=0.02, dn_frac=0.02)
           .toPandas().sort_values("i").reset_index(drop=True))
    assert out.loc[0, "tb_label"] == 1
    assert out.loc[0, "tb_seconds"] == pytest.approx(600.0)
    assert out.loc[1, "tb_label"] == -1
    assert out.loc[1, "tb_seconds"] == pytest.approx(1200.0)
    # row 2: 999,1000 within +-2% of 998 -> vertical barrier
    assert out.loc[2, "tb_label"] == 0
    assert out.loc[2, "tb_seconds"] == pytest.approx(3600.0)
    assert out.loc[5, "tb_label"] == 0  # empty forward window


def test_triple_barrier_first_hit_wins(spark):
    # both barriers eventually hit; the EARLIER one decides
    t0 = pd.Timestamp("2024-04-01")
    rows = [
        {"i": 0, "e": "u", "ts": t0, "lvl": 1000},
        {"i": 1, "e": "u", "ts": t0 + pd.Timedelta(minutes=5),
         "lvl": 970},   # lower barrier first
        {"i": 2, "e": "u", "ts": t0 + pd.Timedelta(minutes=10),
         "lvl": 1050},  # upper later
    ]
    out = (triple_barrier(spark.createDataFrame(pd.DataFrame(rows)),
                          "e", "ts", "lvl", 3600.0, 0.02, 0.02)
           .toPandas().sort_values("i").reset_index(drop=True))
    assert out.loc[0, "tb_label"] == -1
    assert out.loc[0, "tb_seconds"] == pytest.approx(300.0)


def test_inactivity_label(spark):
    t0 = pd.Timestamp("2024-04-01")
    rows = [
        {"i": 0, "e": 1, "ts": t0},
        {"i": 1, "e": 1, "ts": t0 + pd.Timedelta(hours=1)},   # gap 1h -> 0
        {"i": 2, "e": 1, "ts": t0 + pd.Timedelta(days=3)},    # gap 3d -> 1
        {"i": 3, "e": 2, "ts": t0},                           # last -> NULL
    ]
    out = (inactivity_label(spark.createDataFrame(pd.DataFrame(rows)),
                            "e", "ts", 86400.0, tiebreak=("i",))
           .toPandas().sort_values("i").reset_index(drop=True))
    assert out.loc[0, "churned"] == 0
    assert out.loc[1, "churned"] == 1
    assert pd.isna(out.loc[2, "churned"])  # last event of entity 1
    assert pd.isna(out.loc[3, "churned"])


def test_horizon_label_brute_with_censoring(spark):
    """horizon_label vs a scalar replay: hits, fully-observed zeros
    and right-censored NULLs near each entity's data edge."""
    import datetime as dt
    from hiselspark.operators.labels import horizon_label
    base = dt.datetime(2024, 3, 1)
    rows = []
    # user 0: events at hours 0,1,2,30; purchase at h=2
    for i, (h, et) in enumerate([(0, "view"), (1, "click"),
                                 (2, "purchase"), (30, "view")]):
        rows.append((0, base + dt.timedelta(hours=h), i, et))
    # user 1: no purchases at all; events at 0, 5, 50 h
    for i, h in enumerate([0, 5, 50]):
        rows.append((1, base + dt.timedelta(hours=h), 10 + i, "view"))
    df = spark.createDataFrame(
        rows, "u long, ts timestamp, eid long, event_type string")
    out = {r["eid"]: r for r in horizon_label(
        df, "u", "ts", F.col("event_type") == "purchase",
        horizon_seconds=24 * 3600.0, tiebreak=("eid",)).collect()}
    # u0 h0: purchase at h2 -> label 1, tte 2h
    assert out[0]["label"] == 1
    assert out[0]["tte_seconds"] == pytest.approx(7200.0)
    # u0 h1: purchase 1h later -> 1
    assert out[1]["label"] == 1
    # u0 h2 (the purchase itself): next purchase never -> window runs
    # to h26 but last event is h30 -> fully observed 0
    assert out[2]["label"] == 0 and out[2]["censored"] == 0
    # u0 h30: last event -> censored NULL
    assert out[3]["label"] is None and out[3]["censored"] == 1
    # u1 h0: no purchase, window to h24, last obs h50 -> 0
    assert out[10]["label"] == 0
    # u1 h50: censored
    assert out[12]["label"] is None and out[12]["censored"] == 1

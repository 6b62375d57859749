"""touch_attribution vs a brute-force window scan."""
import datetime as dt

import pytest

from pyspark.sql import functions as F

from hiselspark.operators.attribution import touch_attribution

BASE = dt.datetime(2024, 1, 1)
US = 1_000_000


def _events():
    # (entity, sec, oid, kind) — kind: t=touch, c=conversion, x=other
    return [
        # entity 1: touches before and inside window, conv at 100
        (1, 0, 10, "t"),     # outside 50s horizon of conv@100
        (1, 60, 11, "t"),    # first in window
        (1, 90, 12, "t"),    # last in window
        (1, 100, 13, "c"),
        (1, 100, 14, "t"),   # same-timestamp touch (counts, larger id)
        # entity 2: conversion with NO touch in window
        (2, 0, 20, "t"),
        (2, 500, 21, "c"),
        # entity 3: touch tie on timestamp -> smallest id is first,
        # largest is last
        (3, 10, 30, "t"),
        (3, 10, 31, "t"),
        (3, 20, 32, "c"),
        # entity 1 second conversion: window slides
        (1, 130, 15, "c"),
        (1, 120, 16, "x"),   # non-touch inside window, ignored
    ]


def test_touch_attribution_matches_brute(spark):
    horizon = 50
    rows = [(e, BASE + dt.timedelta(seconds=s), o, k)
            for e, s, o, k in _events()]
    df = spark.createDataFrame(
        rows, "entity int, ts timestamp, oid long, kind string")
    out = {r["conv_id"]: r for r in touch_attribution(
        df, "entity", "ts", "oid",
        is_touch=F.col("kind") == "t",
        is_conversion=F.col("kind") == "c",
        horizon_seconds=horizon).collect()}
    evs = _events()
    convs = [e for e in evs if e[3] == "c"]
    assert set(out) == {o for _, _, o, _ in convs}
    for ent, sec, oid, _ in convs:
        touches = sorted(
            (s, o) for e2, s, o, k in evs
            if e2 == ent and k == "t"
            and sec - horizon <= s <= sec)
        r = out[oid]
        base_us = int(BASE.replace(
            tzinfo=dt.timezone.utc).timestamp()) * US
        assert r["conv_t_us"] == base_us + sec * US
        if not touches:
            assert r["first_touch_id"] is None
            assert r["last_touch_id"] is None
            assert r["last_latency_us"] is None
        else:
            assert r["first_touch_id"] == touches[0][1]
            assert r["last_touch_id"] == touches[-1][1]
            assert r["last_latency_us"] == (sec - touches[-1][0]) * US


def test_touch_attribution_validates_horizon(spark):
    df = spark.createDataFrame(
        [(1, BASE, 1, "c")], "entity int, ts timestamp, oid long, kind string")
    with pytest.raises(ValueError):
        touch_attribution(df, "entity", "ts", "oid",
                          F.col("kind") == "t", F.col("kind") == "c",
                          horizon_seconds=0)

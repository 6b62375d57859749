"""Geohash vs public test vectors + bisection reference; radius join
vs brute-force haversine."""
import itertools
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hiselspark.operators.spatial import (geohash, geohash_sql,
                                          haversine_m, radius_join)

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _gh_bisect(lat, lon, precision):
    """The textbook bisection geohash (Niemeyer's algorithm)."""
    latr, lonr = [-90.0, 90.0], [-180.0, 180.0]
    even, out, ch, nb = True, [], 0, 0
    while len(out) < precision:
        rng = lonr if even else latr
        v = lon if even else lat
        mid = (rng[0] + rng[1]) / 2
        if v >= mid:
            ch, rng[0] = (ch << 1) | 1, mid
        else:
            ch, rng[1] = ch << 1, mid
        even, nb = not even, nb + 1
        if nb == 5:
            out.append(_B32[ch])
            ch = nb = 0
    return "".join(out)


def _hv(la1, lo1, la2, lo2):
    rl1, rl2 = math.radians(la1), math.radians(la2)
    dla, dlo = math.radians(la2 - la1) / 2, math.radians(lo2 - lo1) / 2
    a = (math.sin(dla) ** 2
         + math.cos(rl1) * math.cos(rl2) * math.sin(dlo) ** 2)
    return 2 * 6371000.0 * math.asin(math.sqrt(a))


def test_geohash_public_vectors_and_bisection(spark):
    pts = [(57.64911, 10.40744), (42.605, -5.603), (0.0, 0.0),
           (-25.382708, -49.265506), (90.0, 180.0), (-90.0, -180.0),
           (89.9999999, 179.9999999), (-0.0000001, 0.0000001)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    got = [r[0] for r in
           df.select(geohash(F.col("lat"), F.col("lon"), 6)).collect()]
    # the two published vectors
    assert got[0] == "u4pruy" and got[1][:5] == "ezs42"
    for (la, lo), g in zip(pts, got):
        assert g == _gh_bisect(la, lo, 6), (la, lo)


def test_geohash_sql_replay_matches(spark):
    import duckdb
    pts = [((i * 37 % 180) - 90 + 0.123, (i * 91 % 360) - 180 + 0.456)
           for i in range(50)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    got = [r[0] for r in
           df.select(geohash(F.col("lat"), F.col("lon"), 8)).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE p (lat DOUBLE, lon DOUBLE)")
    con.executemany("INSERT INTO p VALUES (?,?)", pts)
    exp = [r[0] for r in con.execute(
        "SELECT " + geohash_sql("lat", "lon", 8) + " FROM p"
    ).fetchall()]
    assert got == exp


def test_geohash_rejects_odd_precision():
    with pytest.raises(ValueError):
        geohash(F.lit(0.0), F.lit(0.0), 5)
    with pytest.raises(ValueError):
        geohash_sql("lat", "lon", 13)


def test_radius_join_matches_brute_force(spark):
    L = [(i, 40.0 + ((i * 7919) % 2000) / 1000.0,
          -74.0 + ((i * 104729) % 3000) / 1000.0) for i in range(60)]
    R = [(j, 40.0 + ((j * 7907) % 2000) / 1000.0,
          -74.0 + ((j * 104717) % 3000) / 1000.0) for j in range(80)]
    ldf = spark.createDataFrame(L, "lid long, lat double, lon double")
    rdf = spark.createDataFrame(R, "rid long, lat double, lon double")
    rad = 30000.0
    out = radius_join(ldf, rdf, rad, cell_deg=0.5, max_abs_lat=43.0)
    pairs = {(r["lid"], r["rid"]) for r in out.collect()}
    brute = {(i, j) for (i, la1, lo1), (j, la2, lo2)
             in itertools.product(L, R)
             if _hv(la1, lo1, la2, lo2) <= rad}
    assert pairs == brute
    # distances are exact haversine
    for r in out.limit(10).collect():
        exp = _hv(r["lat_l"], r["lon_l"], r["lat_r"], r["lon_r"])
        assert r["dist_m"] == pytest.approx(exp, rel=1e-12)


def test_radius_join_validates_cell_size(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)],
                               "id long, lat double, lon double")
    with pytest.raises(ValueError):
        radius_join(df, df, 30000.0, cell_deg=0.05, max_abs_lat=60.0)


def test_radius_join_no_cartesian(spark):
    df = spark.createDataFrame(
        [(i, 40.0 + i / 100.0, -74.0 + i / 100.0) for i in range(30)],
        "id long, lat double, lon double")
    out = radius_join(df.withColumnRenamed("id", "a"),
                      df.withColumnRenamed("id", "b"),
                      5000.0, cell_deg=0.25, max_abs_lat=42.0)
    jvm = out.sparkSession._jvm
    txt = jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(),
                                           "simple")
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt

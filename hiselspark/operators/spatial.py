"""Geospatial primitives — geohash encoding and radius joins — as
pure JVM expressions and grid-cell equi-joins.

The reference engine (transferwise/hisel) has no spatial layer; this
extends the grafted feature-engineering surface (location features are
a standard tabular-ML input) with the two primitives every geospatial
pipeline needs:

* :func:`geohash` — the public Niemeyer geohash (interleaved
  lat/lon bisection bits, base-32 alphabet).  Computed as ONE floor per
  axis (quantize to ``5·precision/2`` bits) followed by pure integer
  bit arithmetic, so the encoding is exactly replayable in SQL and
  bit-identical across engines — no transcendentals, no loops.
* :func:`radius_join` — "all right-side points within R meters of
  each left-side point".  The scale plan is the standard grid-cell
  candidate join: quantize both sides to square cells of side
  ``cell_deg`` degrees, replicate the LEFT side into its 3×3 cell
  neighborhood (9 rows), equi-join on the cell key, then filter exact
  haversine ≤ R.  One hash shuffle on the cell key; no cross join.
  Correct iff every pair within R shares one of the 9 cells, i.e.
  ``cell_deg ≥ R / (111320 · cos(max|lat|))`` — the caller passes
  ``cell_deg`` and the precondition is validated against the
  worst-case latitude the caller declares (default ±84°, beyond which
  grid joins need polar handling anyway).

Skew note for 100 TB: city-dense cells are the hot keys of the cell
join.  The neighborhood replication factor is fixed (9), so the skew
defense is the same as every hot-key join in this engine — salt the
dense cells or shrink ``cell_deg`` (more, smaller cells) and let AQE
split the stragglers.

Determinism: haversine uses sin/cos/asin doubles; engines may differ
in the last ulp, so gate queries must not synthesize pairs within
~1e-9 relative of the radius boundary (measure-zero for arithmetic
synth coordinates; outputs are rounded for comparison).
"""
from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

#: the public geohash base-32 alphabet (no a, i, l, o)
_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"

EARTH_RADIUS_M = 6_371_000.0


def geohash(lat: Column, lon: Column, precision: int = 6) -> Column:
    """Niemeyer geohash of (lat, lon) at ``precision`` base-32 chars.

    ``precision`` must be even (equal lat/lon bit budgets keeps the
    arithmetic one floor per axis): n = 5·precision/2 bits per axis,
    qlat = floor((lat+90)/180 · 2ⁿ) clamped to 2ⁿ−1, same for lon over
    360; bit k of the hash (MSB first) is a lon bit for even k and a
    lat bit for odd k (geohash starts with longitude).  Everything
    after the two floors is integer shifts/masks — SQL-replayable and
    exact.
    """
    if precision % 2 or not 2 <= precision <= 12:
        raise ValueError("precision must be even, in [2, 12]; got "
                         f"{precision!r}")
    n = 5 * precision // 2
    top = (1 << n) - 1
    qlat = F.least(
        F.lit(top).cast("long"),
        F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << n))))
    qlon = F.least(
        F.lit(top).cast("long"),
        F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << n))))
    # interleave: hash bit (2n-1-k) ... build the 5-bit groups directly
    chars = []
    for c in range(precision):
        code = F.lit(0).cast("long")
        for b in range(5):
            k = 5 * c + b              # bit index from the MSB
            axis, src = (qlon, k // 2) if k % 2 == 0 else (qlat, k // 2)
            bit = F.shiftright(axis, n - 1 - src).bitwiseAND(F.lit(1))
            code = code + F.shiftleft(bit, 4 - b)
        chars.append(F.lit(_B32).substr((code + 1).cast("int"),
                                        F.lit(1)))
    return F.concat(*chars)


def geohash_sql(lat_expr: str, lon_expr: str, precision: int = 6) -> str:
    """The DuckDB/ANSI replay of :func:`geohash` — identical floors,
    shifts and alphabet, for use in gate oracles."""
    if precision % 2 or not 2 <= precision <= 12:
        raise ValueError("precision must be even, in [2, 12]")
    n = 5 * precision // 2
    top = (1 << n) - 1
    qlat = (f"least({top}, CAST(floor((({lat_expr}) + 90.0) / 180.0"
            f" * {float(1 << n)!r}) AS BIGINT))")
    qlon = (f"least({top}, CAST(floor((({lon_expr}) + 180.0) / 360.0"
            f" * {float(1 << n)!r}) AS BIGINT))")
    chars = []
    for c in range(precision):
        bits = []
        for b in range(5):
            k = 5 * c + b
            axis, src = (qlon, k // 2) if k % 2 == 0 else (qlat, k // 2)
            bits.append(f"((({axis}) >> {n - 1 - src}) & 1) * {1 << (4 - b)}")
        chars.append(f"substr('{_B32}', CAST({' + '.join(bits)}"
                     f" AS INTEGER) + 1, 1)")
    return " || ".join(chars)


def haversine_m(lat1: Column, lon1: Column,
                lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters (haversine, sphere radius
    6371 km) — double expressions, same formula the oracle replays."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / F.lit(2.0)
    dlon = F.radians(lon2 - lon1) / F.lit(2.0)
    a = (F.sin(dlat) * F.sin(dlat)
         + F.cos(rl1) * F.cos(rl2) * F.sin(dlon) * F.sin(dlon))
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def radius_join(left: DataFrame, right: DataFrame, radius_m: float,
                cell_deg: float,
                lat_col: str = "lat", lon_col: str = "lon",
                max_abs_lat: float = 84.0) -> DataFrame:
    """All (left, right) pairs within ``radius_m`` meters — grid-cell
    candidate equi-join + exact haversine filter (see module
    docstring).  ``left``/``right`` carry their own id/payload columns
    (disjoint names from each other apart from ``lat_col``/
    ``lon_col``, which are suffixed ``_l``/``_r`` in the output).
    Raises unless ``cell_deg`` covers ``radius_m`` at ``max_abs_lat``
    — the correctness precondition of the 3×3 neighborhood.
    """
    need = radius_m / (111_320.0 * math.cos(math.radians(max_abs_lat)))
    if cell_deg < need:
        raise ValueError(
            f"cell_deg={cell_deg} too small: radius {radius_m} m at "
            f"|lat|<={max_abs_lat} needs >= {need:.6f} deg")
    gl = F.floor(F.col(lat_col) / F.lit(cell_deg)).cast("long")
    gn = F.floor(F.col(lon_col) / F.lit(cell_deg)).cast("long")
    offs = F.array([F.struct(F.lit(i).alias("di"), F.lit(j).alias("dj"))
                    for i in (-1, 0, 1) for j in (-1, 0, 1)])
    lrn = {lat_col: f"{lat_col}_l", lon_col: f"{lon_col}_l"}
    l9 = (left.withColumn("_o", F.explode(offs))
              .withColumn("_ci", gl + F.col("_o.di"))
              .withColumn("_cj", gn + F.col("_o.dj"))
              .drop("_o")
              .withColumnsRenamed(lrn))
    r1 = (right.withColumn("_ci", gl).withColumn("_cj", gn)
               .withColumnsRenamed({lat_col: f"{lat_col}_r",
                                    lon_col: f"{lon_col}_r"}))
    dist = haversine_m(F.col(f"{lat_col}_l"), F.col(f"{lon_col}_l"),
                       F.col(f"{lat_col}_r"), F.col(f"{lon_col}_r"))
    return (l9.join(r1, ["_ci", "_cj"])
              .drop("_ci", "_cj")
              .withColumn("dist_m", dist)
              .filter(F.col("dist_m") <= F.lit(float(radius_m))))

"""Marketing-touch attribution: first/last touch per conversion.

For every conversion event, find the first and the last qualifying
touch event by the same entity inside the attribution window
``[t_conv − horizon, t_conv]`` — the two classic single-touch credit
models (last-touch is the default in most analytics stacks;
first-touch credits discovery).  Emitting both from one pass also
gives U-shaped models their endpoints.

Scale shape: ONE entity shuffle.  Touches and conversions stay in the
same ordered stream; two RANGE-framed window aggregates (min/max over
a struct of exact integers) compute the first/last touch for every
row, and conversions are filtered afterwards — no touch×conversion
join, no per-entity collection, bounded state per window frame.

Semantics and determinism: timestamps are exact integer microseconds;
the RANGE frame means touches sharing the conversion's timestamp
qualify regardless of their tiebreaker order (documented, matches the
SQL replay).  The struct ordering (t, order, value) makes argmin/
argmax total, so ties land identically in any engine.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def touch_attribution(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    order_col: str,
    is_touch: Column,
    is_conversion: Column,
    horizon_seconds: int,
) -> DataFrame:
    """One row per conversion: (entity, conv_id, conv_t_us,
    first_touch_id, last_touch_id, last_latency_us).  ``*_id`` are the
    touch rows' ``order_col`` values; conversions with no touch in
    the window keep NULL ids.  ``last_latency_us`` is the exact
    microsecond gap conversion-minus-last-touch."""
    if horizon_seconds <= 0:
        raise ValueError("horizon_seconds must be positive")
    t = (F.unix_micros(F.col(ts_col).cast("timestamp"))
         .cast("long").alias("__t"))
    base = df.select(
        F.col(entity_col).alias("entity"), t,
        F.col(order_col).cast("long").alias("__o"),
        is_touch.alias("__touch"), is_conversion.alias("__conv"))
    w = (Window.partitionBy("entity").orderBy("__t")
         .rangeBetween(-horizon_seconds * 1_000_000, 0))
    tstruct = F.when(F.col("__touch"),
                     F.struct(F.col("__t").alias("t"),
                              F.col("__o").alias("o")))
    cur = (base
           .withColumn("__first", F.min(tstruct).over(w))
           .withColumn("__last", F.max(tstruct).over(w)))
    return (cur.filter("__conv")
            .select(F.col("entity"),
                    F.col("__o").alias("conv_id"),
                    F.col("__t").alias("conv_t_us"),
                    F.col("__first.o").alias("first_touch_id"),
                    F.col("__last.o").alias("last_touch_id"),
                    (F.col("__t") - F.col("__last.t"))
                    .alias("last_latency_us")))

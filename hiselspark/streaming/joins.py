"""Stream-stream event-time interval join.

The streaming twin of ``operators/interval_join.py``: pair each left
event with the right-stream events whose timestamps fall in
``[left_ts + lo, left_ts + hi]`` on the same key — e.g. every purchase
with the clicks in its trailing 30 minutes — while BOTH sides keep
flowing.

This is Spark's native stream-stream join: both inputs carry
watermarks, and the join condition carries explicit event-time bounds;
from those two facts the engine derives how long each side's rows must
be buffered in the state store and evicts everything older — the
property that lets the join run forever at cluster scale with bounded
state.  Without the time bounds Spark must keep ALL past rows and
(for outer joins) refuses the query outright.

Parity contract (tested + driver gate): a backlog drained with
``Trigger.AvailableNow`` produces exactly the rows of the batch
interval join / the ANSI range-join oracle, as long as the watermark
delay covers the backlog's disorder (late rows beyond it are dropped
— that trade-off is the same one `streaming_late_data` demonstrates
for aggregations).  Late-row dropping is best-effort and lags one
micro-batch: state eviction runs at the END of the batch after the
watermark passes, so a too-late row arriving in that same batch can
still match — Spark's guarantee is "no in-watermark match is lost",
not "every out-of-watermark row is dropped".
"""
from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    lo_seconds: float,
    hi_seconds: float,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark_seconds: int = 3600,
    how: str = "inner",
    right_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Join two STREAMING DataFrames on ``on`` with the right event's
    time in ``[left_ts + lo_seconds, left_ts + hi_seconds]``.

    Right columns are suffixed ``_r`` (the key keeps the left name).
    ``how`` may be ``inner`` or ``left_outer`` — for outer joins Spark
    emits the unmatched-left row only once the watermark passes the
    join window, which ``Trigger.AvailableNow`` backlogs reach at
    drain time.
    """
    if lo_seconds > hi_seconds:
        raise ValueError(f"lo {lo_seconds} > hi {hi_seconds}")
    l = left.withWatermark(left_ts, f"{int(watermark_seconds)} seconds")
    r = right.withWatermark(right_ts,
                            f"{int(watermark_seconds)} seconds")
    r = r.select(
        [F.col(c).alias(c if c == on else f"{c}_r")
         for c in (right_cols or right.columns)])
    rts = f"{right_ts}_r"
    lo = F.expr(f"INTERVAL {int(lo_seconds * 1e6)} MICROSECONDS")
    hi = F.expr(f"INTERVAL {int(hi_seconds * 1e6)} MICROSECONDS")
    cond = ((l[on] == r[on])
            & (r[rts] >= l[left_ts] + lo)
            & (r[rts] <= l[left_ts] + hi))
    joined = l.join(r, cond, how)
    return joined.drop(r[on])

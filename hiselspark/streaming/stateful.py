"""Custom stateful streaming operator via ``applyInPandasWithState``.

Running per-entity feature state across micro-batches — the streaming
analogue of the batch running-window features (``operators/windows``).
Each entity's state is a tiny fixed-size record (count, sum, min/max
ts), so state size is O(active entities), independent of stream length;
this is the shape that keeps a stateful operator alive on an unbounded
stream where windowed aggregation doesn't fit (running totals have no
window to close).

Draining the stream with ``Trigger.AvailableNow`` and taking each
entity's last emitted row must equal the batch ``groupBy().agg()`` on
the same data — asserted by tests and the driver-gate query.
"""
from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = T.StructType([
    T.StructField("entity", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.LongType()),
    T.StructField("first_ts_us", T.LongType()),
    T.StructField("last_ts_us", T.LongType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("s", T.LongType()),
    T.StructField("first_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
])


def stream_running_totals(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "cents",
) -> DataFrame:
    """Per-entity running (count, sum, first/last event time), updated
    each micro-batch the entity appears in.  ``value_col`` must be an
    integer column (exact associative sums — convert money to cents
    upstream).  Output mode is 'update': one row per touched entity per
    micro-batch carrying the cumulative totals so far."""

    def update(key: Tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, s, first_us, last_us = state.get
        else:
            n, s, first_us, last_us = 0, 0, None, None
        for pdf in pdfs:
            n += len(pdf)
            s += int(pdf[value_col].sum())
            ts_us = pdf[ts_col].astype("int64") // 1000
            lo, hi = int(ts_us.min()), int(ts_us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        state.update((n, s, first_us, last_us))
        yield pd.DataFrame({
            "entity": [key[0]],
            "n_events": [n],
            "sum_value": [s],
            "first_ts_us": [first_us],
            "last_ts_us": [last_us],
        })

    return (events
            .groupBy(entity_col)
            .applyInPandasWithState(
                update,
                outputStructType=_OUT_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))

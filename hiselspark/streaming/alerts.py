"""Streaming k-of-last-n threshold alerting — O(1) bitmask state.

The standard noise-robust alert rule (a single spike is noise; k
exceedances within the last n observations is a condition): per
entity, track the exceedance pattern of the trailing ``n``
observations as ONE integer bitmask and emit a row whenever the
count of set bits crosses from below ``k`` to at-or-above it — alert
on the TRANSITION, not on every breaching observation, so a sustained
incident emits once until it clears and re-fires.

State per entity is two integers (bitmask, previous-alert flag) —
the O(1) forever-stream shape.  Semantics contract: drained over an
event-time-ordered replay, the emitted (entity, event id) set equals
the batch window replay ``count over last n ≥ k AND count over the
previous window < k`` exactly (the driver-gate oracle).  Everything
in the kernel is vectorized NumPy over each micro-batch group.
"""
from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = T.StructType([
    T.StructField("entity", T.LongType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("us", T.LongType()),
    T.StructField("n_exceed", T.LongType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("mask", T.LongType()),
    T.StructField("alerting", T.BooleanType()),
])


def stream_threshold_alerts(
    events: DataFrame,
    threshold: int,
    n: int = 8,
    k: int = 3,
    entity_col: str = "user_id",
    us_col: str = "us",
    id_col: str = "event_id",
    value_col: str = "v",
) -> DataFrame:
    """Emit (entity, event_id, us, n_exceed) whenever the trailing-n
    exceedance count reaches ``k`` from below.  ``n`` ≤ 62 (one int64
    bitmask)."""
    if not (1 <= k <= n <= 62):
        raise ValueError("need 1 <= k <= n <= 62")
    window_mask = (1 << n) - 1

    def update(key: Tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        mask, alerting = state.get if state.exists else (0, False)
        for pdf in pdfs:
            pdf = pdf.sort_values([us_col, id_col], kind="mergesort")
            vals = pdf[value_col].to_numpy(dtype=np.int64)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            uss = pdf[us_col].to_numpy(dtype=np.int64)
            out_ids, out_us, out_cnt = [], [], []
            for v, i, u in zip(vals, ids, uss):
                mask = ((mask << 1) | int(v > threshold)) \
                    & window_mask
                cnt = bin(mask).count("1")
                now = cnt >= k
                if now and not alerting:
                    out_ids.append(int(i))
                    out_us.append(int(u))
                    out_cnt.append(cnt)
                alerting = now
            if out_ids:
                yield pd.DataFrame({
                    "entity": key[0],
                    "event_id": out_ids,
                    "us": out_us,
                    "n_exceed": out_cnt,
                })
        state.update((int(mask), bool(alerting)))

    return (events.groupBy(entity_col)
            .applyInPandasWithState(
                update, _OUT_SCHEMA, _STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))

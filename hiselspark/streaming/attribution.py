"""Streaming touch attribution — the online twin of
``operators/attribution.touch_attribution``.

A single event stream carries TOUCH rows and CONVERSION rows.  Each
conversion is attributed on arrival:

* ``last_touch`` — the most recent touch at-or-before the conversion,
  credited only when it lies inside the attribution horizon;
* ``first_touch`` — the entity's FIRST touch ever (at-or-before the
  conversion).

Per-entity state is four integers (first/last touch time + id) —
O(1) per active entity, the shape that lives forever on an unbounded
stream.  This is why the streaming first-touch is LIFETIME rather
than windowed: an exact "first touch within the trailing horizon"
needs every touch in the horizon retained per entity, which is not
O(1); last-touch-within-horizon needs only the latest.  The batch
operator (both touches windowed) and this twin therefore declare
different first-touch contracts, each matched by its own oracle.

Semantics contract: drained with ``Trigger.AvailableNow`` over an
event-time-ordered replay, the output equals the batch SQL below
exactly.  Under out-of-order arrival the operator never credits a
future touch; a touch arriving after its conversion was emitted is
missed — the honest failure mode of O(1) online attribution.

Ties: touches sharing a timestamp resolve to the smallest (us, id)
for first and the greatest (us, id) for last — the batch operator's
struct min/max rule.  Everything in the kernel is vectorized pandas
(one ``merge_asof`` per micro-batch per entity group).
"""
from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = T.StructType([
    T.StructField("entity", T.LongType()),
    T.StructField("conv_id", T.LongType()),
    T.StructField("conv_us", T.LongType()),
    T.StructField("first_touch_id", T.LongType()),
    T.StructField("last_touch_id", T.LongType()),
    T.StructField("last_latency_us", T.LongType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("first_us", T.LongType()),
    T.StructField("first_id", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("last_id", T.LongType()),
])


def stream_attribution(
    events: DataFrame,
    horizon_us: int,
    entity_col: str = "user_id",
    us_col: str = "us",
    id_col: str = "event_id",
    is_touch_col: str = "is_touch",
) -> DataFrame:
    """Attribute conversions (rows with ``is_touch_col`` false) to the
    entity's first-ever and horizon-windowed last touch.  Emits one
    append-mode row per conversion."""
    if horizon_us <= 0:
        raise ValueError("horizon_us must be positive")

    def update(key: Tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            first_us, first_id, last_us, last_id = state.get
        else:
            first_us = first_id = last_us = last_id = None
        for pdf in pdfs:
            touches = pdf.loc[pdf[is_touch_col], [us_col, id_col]]
            if last_us is not None:
                carry = pd.DataFrame({us_col: [last_us],
                                      id_col: [last_id]})
                touches = pd.concat([carry, touches],
                                    ignore_index=True)
            # (us, id) sort: merge_asof keeps the LAST equal-key row,
            # so the winner is the greatest (us, id) — the batch rule
            touches = touches.sort_values([us_col, id_col],
                                          kind="mergesort")
            convs = (pdf.loc[~pdf[is_touch_col], [id_col, us_col]]
                     .sort_values(us_col, kind="mergesort"))
            # batch-local first touch folded into lifetime first
            if len(touches):
                bf = touches.iloc[0]
                cand = (int(bf[us_col]), int(bf[id_col]))
                if first_us is None or cand < (first_us, first_id):
                    first_us, first_id = cand
            if len(convs):
                right = touches.rename(columns={
                    us_col: "t_us", id_col: "t_id"})
                merged = pd.merge_asof(
                    convs, right[["t_us", "t_id"]],
                    left_on=us_col, right_on="t_us",
                    direction="backward")
                in_h = (merged[us_col] - merged["t_us"]) <= horizon_us
                lt_id = merged["t_id"].where(in_h)
                lt_lat = (merged[us_col] - merged["t_us"]).where(in_h)
                if first_us is None:
                    ft_id = pd.Series([float("nan")] * len(merged),
                                      index=merged.index)
                else:
                    ft_id = pd.Series(
                        float(first_id), index=merged.index
                    ).where(merged[us_col] >= first_us)
                yield pd.DataFrame({
                    "entity": key[0],
                    "conv_id": merged[id_col].to_numpy(),
                    "conv_us": merged[us_col].to_numpy(),
                    "first_touch_id": ft_id,
                    "last_touch_id": lt_id,
                    "last_latency_us": lt_lat,
                })
            if len(touches):
                top = touches.iloc[-1]
                cand = (int(top[us_col]), int(top[id_col]))
                if last_us is None or cand > (last_us, last_id):
                    last_us, last_id = cand
        if first_us is not None or last_us is not None:
            state.update((first_us, first_id, last_us, last_id))

    return (events.groupBy(entity_col)
            .applyInPandasWithState(
                update, _OUT_SCHEMA, _STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))

"""Streaming as-of enrichment — the online-serving twin of the batch
point-in-time join (``operators/asof.py``).

A single event stream carries both FEATURE rows (observations that
update an entity's current value) and LABEL rows (requests that must be
enriched with the most recent feature at-or-before their event time).
Per-entity state holds only the latest feature ``(us, value)`` — O(1)
per active entity, the shape that lives forever on an unbounded stream.

Semantics contract: drained with ``Trigger.AvailableNow`` over a
per-entity event-time-ordered replay, the enriched labels equal the
batch ``asof_join`` exactly (asserted by the driver-gate query against
the same DuckDB ``ASOF JOIN`` oracle the batch operator uses).  Under
out-of-order arrival the operator never leaks: a label older than the
retained feature matches NULL (``merge_asof`` only looks backward), it
is never served a future value — the honest failure mode for an online
store with O(1) state.

Everything in the kernel is vectorized pandas (one ``merge_asof`` per
micro-batch per entity group; no per-row Python), per the input-hint
mandate.
"""
from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = T.StructType([
    T.StructField("entity", T.LongType()),
    T.StructField("label_id", T.LongType()),
    T.StructField("label_us", T.LongType()),
    T.StructField("matched_value", T.DoubleType()),
    T.StructField("matched_us", T.LongType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("last_us", T.LongType()),
    T.StructField("last_value", T.DoubleType()),
])


def stream_asof_enrich(
    events: DataFrame,
    entity_col: str = "user_id",
    us_col: str = "us",
    id_col: str = "event_id",
    is_feature_col: str = "is_feature",
    value_col: str = "fvalue",
) -> DataFrame:
    """Enrich label rows with the entity's most recent feature value
    at-or-before the label's event time, across micro-batches.

    ``events`` is a streaming DataFrame with an int64 event-time column
    ``us_col`` (microseconds), a boolean ``is_feature_col`` marking
    feature rows, and ``value_col`` (double) carrying the feature value
    (ignored on label rows).  Emits one row per label (append mode):
    ``(entity, label_id, label_us, matched_value, matched_us)`` with
    NULLs when no feature at-or-before the label is available.

    Ties: several features at the same ``(entity, us)`` resolve to the
    greatest ``(value, id)`` — the same deterministic rule as the batch
    union-window plan's lexicographic-max value struct, so the two
    paths agree row-for-row (pre-aggregate per (entity, us) upstream
    if a different tie rule is wanted).
    """

    def update(key: Tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        last_us, last_val = state.get if state.exists else (None, None)
        for pdf in pdfs:
            feats = pdf.loc[pdf[is_feature_col],
                            [us_col, value_col, id_col]]
            if last_us is not None:
                carry = pd.DataFrame(
                    {us_col: [last_us], value_col: [last_val],
                     id_col: [-1]})
                feats = pd.concat([carry, feats], ignore_index=True)
            # stable-sort by (us, value, id): merge_asof keeps the LAST
            # row at an equal key, making the winner the greatest
            # (value, id) at that us — the batch plan's tie rule
            feats = feats.sort_values(
                [us_col, value_col, id_col], kind="mergesort")
            labels = (pdf.loc[~pdf[is_feature_col], [id_col, us_col]]
                      .sort_values(us_col, kind="mergesort"))
            if len(labels):
                right = feats.rename(columns={
                    us_col: "matched_us", value_col: "matched_value"})
                merged = pd.merge_asof(
                    labels, right[["matched_us", "matched_value"]],
                    left_on=us_col, right_on="matched_us",
                    direction="backward")
                out = pd.DataFrame({
                    "entity": key[0],
                    "label_id": merged[id_col].to_numpy(),
                    "label_us": merged[us_col].to_numpy(),
                    "matched_value": merged["matched_value"].to_numpy(),
                    "matched_us": merged["matched_us"].to_numpy(),
                })
                yield out
            if len(feats):
                top = feats.iloc[-1]
                if last_us is None or int(top[us_col]) >= last_us:
                    last_us = int(top[us_col])
                    last_val = float(top[value_col])
        if last_us is not None:
            state.update((last_us, last_val))

    return (events.groupBy(entity_col)
            .applyInPandasWithState(
                update, _OUT_SCHEMA, _STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))

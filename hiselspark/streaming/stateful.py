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


_CUSUM_OUT = T.StructType([
    T.StructField("entity", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("cusum_pos", T.LongType()),
    T.StructField("cusum_neg", T.LongType()),
])

_CUSUM_STATE = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("spos", T.LongType()),
    T.StructField("sneg", T.LongType()),
])


def stream_cusum(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "cents",
    order_col: str = "event_id",
    target: int = 1000,
    slack: int = 50,
) -> DataFrame:
    """Streaming twin of :func:`operators.windows.cusum` — per-entity
    one-sided CUSUM drift statistics carried across micro-batches in
    O(1) integer state ``(n, S⁺, S⁻)``.

    ``value_col`` and ``target``/``slack`` must be integer units
    (cents) so the statistics stay exact.  Within a micro-batch rows
    are sorted by ``(ts, order_col)`` and the recursion
    ``S⁺ᵢ = max(0, S⁺ᵢ₋₁ + (xᵢ − target − slack))`` is evaluated in
    closed form with the carried-in state:
    ``S⁺ᵢ = max(s₀ + Pᵢ, Pᵢ − min(P₀..Pᵢ))`` (prefix sums ``P``,
    ``P₀ = 0``) — one vectorized pass, no Python loop.  Ordering
    ACROSS micro-batches follows the source contract of this module:
    a file stream replayed with ``maxFilesPerTrigger`` delivers files
    in order, and each file is internally handled here.

    Emits one row per touched entity per micro-batch with the
    cumulative ``(n, S⁺, S⁻)`` so far (update mode)."""
    import numpy as np

    dev_p = int(target) + int(slack)
    dev_n = int(target) - int(slack)

    def _advance(carry: int, dev: "np.ndarray") -> int:
        P = np.cumsum(dev)
        m = np.minimum.accumulate(np.minimum(P, 0))
        s = np.maximum(carry + P, P - m)
        return int(s[-1]) if len(s) else carry

    def update(key: Tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, spos, sneg = state.get
        else:
            n, spos, sneg = 0, 0, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values([ts_col, order_col])
            x = pdf[value_col].to_numpy(dtype=np.int64)
            spos = _advance(spos, x - dev_p)
            sneg = _advance(sneg, dev_n - x)
            n += len(pdf)
        state.update((n, spos, sneg))
        yield pd.DataFrame({
            "entity": [key[0]],
            "n_events": [n],
            "cusum_pos": [spos],
            "cusum_neg": [sneg],
        })

    return (events
            .groupBy(entity_col)
            .applyInPandasWithState(
                update,
                outputStructType=_CUSUM_OUT,
                stateStructType=_CUSUM_STATE,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))


_HOLT_OUT = T.StructType([
    T.StructField("entity", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("level", T.DoubleType()),
    T.StructField("trend", T.DoubleType()),
])

_HOLT_STATE = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("l", T.DoubleType()),
    T.StructField("b", T.DoubleType()),
])


def stream_holt(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "cents",
    order_col: str = "event_id",
    alpha: float = 0.5,
    beta: float = 0.5,
) -> DataFrame:
    """Streaming twin of :func:`operators.tsprofile.holt_linear` —
    per-entity Holt level/trend carried across micro-batches in O(1)
    state ``(n, level, trend)``.

    The recursion is evaluated with EXACTLY the batch fold's float
    operation order (``l' = α·x + (1−α)·(l+b)``; ``b' = β·(l'−l) +
    (1−β)·b``), one scalar step per row of the (ts, order)-sorted
    micro-batch.  A closed-form linear-recurrence vectorization
    exists, but it reorders the float ops and would break the
    drained-equals-batch contract — the loop IS the operator here,
    bounded by rows-per-entity-per-micro-batch (the same cost class
    as the batch fold, which also materializes each series in its
    group).  Ordering across micro-batches follows this module's
    file-stream source contract.

    Emits one row per touched entity per micro-batch with the
    cumulative (n, level, trend) so far (update mode).
    """
    a = float(alpha)
    bta = float(beta)

    def update(key: Tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, lvl, trd = state.get
        else:
            n, lvl, trd = 0, None, None
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values([ts_col, order_col])
            for x in pdf[value_col].astype(float):
                if n == 0:
                    lvl, trd = float(x), 0.0
                else:
                    new_l = a * x + (1.0 - a) * (lvl + trd)
                    trd = bta * (new_l - lvl) + (1.0 - bta) * trd
                    lvl = new_l
                n += 1
        state.update((n, lvl, trd))
        yield pd.DataFrame({
            "entity": [key[0]],
            "n_events": [n],
            "level": [lvl],
            "trend": [trd],
        })

    return (events
            .groupBy(entity_col)
            .applyInPandasWithState(
                update,
                outputStructType=_HOLT_OUT,
                stateStructType=_HOLT_STATE,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))


def stream_decayed_count(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    halflife_seconds: float = 21600.0,
) -> DataFrame:
    """Streaming twin of :func:`operators.windows.decayed_count` —
    the per-entity wall-clock decayed engagement score carried across
    micro-batches in O(1) float state ``(n, last_us, score)`` via the
    exact recurrence

        score ← score · 2^((last_us − u)/h) + 1,   last_us ← u

    applied in ``(ts, order)`` order (``score`` INCLUDES the current
    event at weight 1; the batch operator's strictly-before value is
    ``score − 1`` at the same instant).  The recurrence is evaluated
    as a per-row loop inside the Arrow batch — it is inherently
    sequential, and the numerically stable prefix-product
    vectorization overflows when a batch spans ≫ 40 half-lives (a
    replay drains months in one trigger), so the honest loop wins;
    rows per (entity, micro-batch) bound the cost.  Differs from the
    batch fold by ≤ n·ulp + the batch's 40-half-life truncation —
    both orders of magnitude below the gate's 1e-6 rounding.

    Emits one row per touched entity per micro-batch with the
    cumulative ``(n_events, last_us, score)`` (update mode)."""
    import numpy as np

    hl_us = float(halflife_seconds) * 1e6

    def update(key: Tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, last_us, score = state.get
        else:
            n, last_us, score = 0, None, 0.0
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values([ts_col, order_col])
            # pandas datetime64[ns] -> exact integer MICROseconds,
            # matching the batch operator's unix_micros arithmetic
            us = (pdf[ts_col].astype("int64") // 1000).to_numpy()
            for u in us:
                if last_us is not None:
                    score = score * 2.0 ** ((last_us - u) / hl_us) + 1.0
                else:
                    score = 1.0
                last_us = int(u)
            n += len(pdf)
        state.update((n, last_us, score))
        yield pd.DataFrame({"entity": [key[0]], "n_events": [n],
                            "last_us": [last_us], "score": [score]})

    out_schema = ("entity long, n_events long, last_us long, "
                  "score double")
    state_schema = "n long, last_us long, score double"
    return (events
            .groupBy(entity_col)
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update",
                                    GroupStateTimeout.NoTimeout))


_KALMAN_OUT = T.StructType([
    T.StructField("entity", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("level", T.DoubleType()),
    T.StructField("p_var", T.DoubleType()),
    T.StructField("gain", T.DoubleType()),
])

_KALMAN_STATE = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("m", T.DoubleType()),
    T.StructField("p", T.DoubleType()),
    T.StructField("k", T.DoubleType()),
])


def stream_kalman(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "cents",
    order_col: str = "event_id",
    q_var: float = 1.0,
    r_var: float = 4.0,
) -> DataFrame:
    """Streaming twin of :func:`operators.tsprofile.kalman1d` —
    per-entity local-level Kalman state (n, m, p, k) carried across
    micro-batches in O(1) floats, stepped with EXACTLY the batch
    fold's operation order (``p' = p+q; K = p'/(p'+r);
    m += K(x−m); p = (1−K)p'``) one row at a time over the
    (ts, order)-sorted micro-batch — the drained stream must equal
    the batch recursion bit-for-bit (the stream_holt contract).
    Emits one cumulative row per touched entity per micro-batch
    (update mode)."""
    qv = float(q_var)
    rv = float(r_var)

    def update(key: Tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, m, p, k = state.get
        else:
            n, m, p, k = 0, None, None, None
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values([ts_col, order_col])
            for x in pdf[value_col].astype(float):
                if n == 0:
                    m, p, k = float(x), rv, rv / (rv + rv)
                else:
                    pp = p + qv
                    k = pp / (pp + rv)
                    m = m + k * (float(x) - m)
                    p = (1.0 - k) * pp
                n += 1
        state.update((n, m, p, k))
        yield pd.DataFrame({
            "entity": [key[0]],
            "n_events": [n],
            "level": [m],
            "p_var": [p],
            "gain": [k],
        })

    return (events
            .groupBy(entity_col)
            .applyInPandasWithState(
                update,
                outputStructType=_KALMAN_OUT,
                stateStructType=_KALMAN_STATE,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))


_SPRT_OUT = T.StructType([
    T.StructField("entity", T.LongType()),
    T.StructField("n_total", T.LongType()),
    T.StructField("n_pos", T.LongType()),
    T.StructField("decision", T.StringType()),
    T.StructField("n_decide", T.LongType()),
])

_SPRT_STATE = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("npos", T.LongType()),
    T.StructField("dec", T.LongType()),      # 0 continue, 1 h1, -1 h0
    T.StructField("n_decide", T.LongType()),
])


def stream_sprt(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    outcome_col: str = "y",
    p0: float = 0.3,
    p1: float = 0.5,
    alpha: float = 0.05,
    beta: float = 0.2,
) -> DataFrame:
    """Streaming twin of :func:`operators.seqtest.sprt` — the
    always-valid sequential A/B monitor run ONLINE: per-entity O(1)
    integer state (n, npos, decision, n_decide) carried across
    micro-batches; each micro-batch is sorted by (ts, order) and the
    cumulative LLR  npos·l1 + nneg·l0  (the batch operator's exact
    three-operation float expression over exact int prefix counts —
    no running float state at all) is evaluated vectorized; the FIRST
    boundary crossing in stream order freezes the decision, the
    lifetime-first contract of streaming_attribution.  The drained
    stream's final row per entity must equal the batch operator
    row-for-row (gate + SQL oracle).  Emits one cumulative row per
    touched entity per micro-batch (update mode)."""
    import numpy as np
    from hiselspark.operators.seqtest import sprt_constants

    l1, l0, a, b = sprt_constants(p0, p1, alpha, beta)

    def update(key: Tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, npos, dec, n_dec = state.get
        else:
            n, npos, dec, n_dec = 0, 0, 0, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values([ts_col, order_col])
            x = pdf[outcome_col].to_numpy(dtype="int64")
            cn = n + np.arange(1, len(x) + 1, dtype="int64")
            cp = npos + np.cumsum(x)
            if dec == 0:
                llr = cp.astype("float64") * l1 \
                    + (cn - cp).astype("float64") * l0
                up = np.nonzero(llr >= a)[0]
                dn = np.nonzero(llr <= b)[0]
                iu = up[0] if len(up) else len(x)
                idn = dn[0] if len(dn) else len(x)
                first = min(iu, idn)
                if first < len(x):
                    dec = 1 if iu <= idn else -1
                    n_dec = int(cn[first])
            n = int(cn[-1])
            npos = int(cp[-1])
        state.update((n, npos, dec, n_dec))
        yield pd.DataFrame({
            "entity": [key[0]],
            "n_total": [n],
            "n_pos": [npos],
            "decision": ["h1" if dec == 1 else
                         "h0" if dec == -1 else "continue"],
            "n_decide": [n_dec if dec != 0 else None],
        })

    return (events
            .groupBy(entity_col)
            .applyInPandasWithState(
                update,
                outputStructType=_SPRT_OUT,
                stateStructType=_SPRT_STATE,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))


_HW_OUT = T.StructType([
    T.StructField("entity", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("level", T.DoubleType()),
    T.StructField("trend", T.DoubleType()),
    T.StructField("s_next", T.DoubleType()),
])

_HW_STATE = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("l", T.DoubleType()),
    T.StructField("b", T.DoubleType()),
    T.StructField("s1", T.DoubleType()),
    T.StructField("s2", T.DoubleType()),
    T.StructField("s3", T.DoubleType()),
    T.StructField("s4", T.DoubleType()),
])


def stream_holt_winters(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "cents",
    order_col: str = "event_id",
    alpha: float = 0.5,
    beta: float = 0.5,
    gamma: float = 0.5,
) -> DataFrame:
    """Streaming twin of
    :func:`operators.tsprofile.holt_winters_additive` (period 4) —
    per-entity (n, l, b, s1..s4) carried across micro-batches in O(1)
    floats.  The first 4 observations initialize EXACTLY like the
    batch operator (l = left-assoc mean, b = 0, s_i = x_i − l); the
    warm-up values are carried IN the seasonal slots until the 4th
    arrives (s1..sk hold the raw x's, l encodes how many are banked
    via n < 4 — no extra state fields).  From row 5 on, each step is
    the batch fold's float op order with the rotating seasonal
    shift.  Entities still inside warm-up emit NULL level/trend.
    Drained with AvailableNow, the final per-entity row equals the
    batch operator (SQL oracle contract).  Emits one row per touched
    entity per micro-batch (update mode)."""
    a = float(alpha)
    bt = float(beta)
    g = float(gamma)

    def update(key: Tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, lvl, b, s1, s2, s3, s4 = state.get
        else:
            n, lvl, b, s1, s2, s3, s4 = 0, None, None, None, None, \
                None, None
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values([ts_col, order_col])
            for x in pdf[value_col].astype(float):
                n += 1
                if n <= 4:
                    # bank the warm-up values in the seasonal slots
                    if n == 1:
                        s1 = float(x)
                    elif n == 2:
                        s2 = float(x)
                    elif n == 3:
                        s3 = float(x)
                    else:
                        s4 = float(x)
                        lvl = (s1 + s2 + s3 + s4) / 4.0
                        b = 0.0
                        s1, s2, s3, s4 = (s1 - lvl, s2 - lvl,
                                          s3 - lvl, s4 - lvl)
                    continue
                new_l = a * (x - s1) + (1.0 - a) * (lvl + b)
                new_b = bt * (new_l - lvl) + (1.0 - bt) * b
                new_s = g * (x - new_l) + (1.0 - g) * s1
                lvl, b = new_l, new_b
                s1, s2, s3, s4 = s2, s3, s4, new_s
        state.update((n, lvl, b, s1, s2, s3, s4))
        ready = n >= 4
        yield pd.DataFrame({
            "entity": [key[0]],
            "n_events": [n],
            "level": [lvl if ready else None],
            "trend": [b if ready else None],
            "s_next": [s1 if ready else None],
        })

    return (events
            .groupBy(entity_col)
            .applyInPandasWithState(
                update,
                outputStructType=_HW_OUT,
                stateStructType=_HW_STATE,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))

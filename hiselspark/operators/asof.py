"""Point-in-time (as-of / backward) join — the leakage-free feature join.

For every label row ``(entity_id, ts)`` attach, per feature column, the
most recent feature row of the same entity with ``feature_ts <= ts``
(or ``< ts`` when ``strict``), optionally within a tolerance window.
Semantics match ``pandas.merge_asof(direction="backward")`` and DuckDB
``ASOF JOIN`` (both used as oracles in tests), which is what the
reference-derived north rule requires (BASELINE.json: "as-of/backward
merge", "zero temporal leakage").

Two physical strategies, both shuffle-once:

* :func:`asof_join` (default) — **union + running last**: tag both
  sides, union them, and compute ``last(value, ignoreNulls=True)`` over
  a ``(entity)`` window ordered by ``(ts, side)``.  Pure built-in
  operators: one hash shuffle on the entity key, whole-stage codegen,
  no Python in the hot path, and Catalyst/AQE handle partition
  coalescing.  This is the scale path — state per task is O(1) per
  entity (the running window frame), so it survives 1000 executors
  reading 100 TB as long as single-entity timelines fit a partition
  (they do: the shuffle key is the entity, and skewed entities are
  handled by AQE skew-join or upstream salting, see operators/skew.py).
* :func:`asof_join_cogrouped` — cogrouped ``applyInPandas`` running
  ``pd.merge_asof`` per entity group: Arrow-vectorized, useful when
  joining very many feature columns at once where the window variant
  would build one running-last state per column.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    labels: DataFrame,
    features: DataFrame,
    on: str = "entity_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Optional[Sequence[str]] = None,
    tolerance_seconds: Optional[float] = None,
    strict: bool = False,
    suffix: str = "",
    direction: str = "backward",
) -> DataFrame:
    """As-of join via union + running ``last``/``first(...ignoreNulls)``.

    ``direction='backward'`` (default) matches the most recent feature
    row with ``feature_ts <= label_ts``; ``'forward'`` matches the
    earliest feature row with ``feature_ts >= label_ts`` (strict flips
    both to strict inequality); ``'nearest'`` takes whichever of the
    two is closer in absolute time, backward winning ties (pandas
    rule) — see :func:`_asof_join_nearest`, same one-shuffle plan.
    Matches pandas ``merge_asof`` directions and DuckDB ``ASOF JOIN``
    with ``<=`` / ``>=``.

    Returns ``labels`` with one extra column per feature value column
    (named ``f"{col}{suffix}"``), plus ``__matched_ts`` with the
    timestamp the value came from (null when no match — e.g. a label
    earlier than every feature row: zero temporal leakage by
    construction, since only rows ordered at-or-before the label in the
    ``(ts, side)`` sort can ever be seen by the running window).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unsupported direction={direction!r}")
    if direction == "nearest":
        return _asof_join_nearest(labels, features, on, left_ts,
                                  right_ts, value_cols,
                                  tolerance_seconds, strict, suffix)
    backward = direction == "backward"
    if value_cols is None:
        value_cols = [c for c in features.columns if c not in (on, right_ts)]
    value_cols = list(value_cols)

    # side marker (backward): features sort before labels at equal ts so
    # an equal-timestamp feature IS visible (<=); with strict=True labels
    # sort first, so equal-timestamp features are NOT visible (<).
    # forward mirrors this around the frame direction.
    if backward:
        feat_rank, label_rank = (0, 1) if not strict else (1, 0)
    else:
        feat_rank, label_rank = (1, 0) if not strict else (0, 1)

    # label columns ride through the union (null on feature rows) so no
    # join-back is needed — the whole operator is ONE shuffle on the
    # entity key.
    ltypes = {f.name: f.dataType for f in labels.schema.fields}
    passthrough = [c for c in labels.columns if c not in (on, left_ts)]

    # matched values are row-atomic: the whole feature row rides in one
    # struct, and the running last(ignoreNulls) picks the latest feature
    # ROW — a null field inside the matched row stays null, exactly like
    # pandas merge_asof / DuckDB ASOF JOIN (a per-column last() would
    # wrongly reach further back for null fields).
    packed = F.struct(
        F.col(right_ts).alias("__mts"),
        *[F.col(c).alias(f"v_{c}") for c in value_cols])
    f_tagged = features.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(feat_rank).alias("__side"),
        packed.alias("__v"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in passthrough],
    )
    null_struct = F.lit(None).cast(
        f_tagged.schema["__v"].dataType)
    l_tagged = labels.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(label_rank).alias("__side"),
        null_struct.alias("__v"),
        *passthrough,
    )
    unioned = f_tagged.unionByName(l_tagged)

    # backward: running last over the preceding frame; forward: the
    # mirror image — first feature row in the following frame.  The
    # packed value struct is the final sort key: among several feature
    # rows at the SAME (entity, ts) the winner is the lexicographic-max
    # (backward) / -min (forward) value tuple — deterministic across
    # partition layouts (a bare (ts, side) order left the tie winner to
    # partition order) and SQL-expressible for oracles (argmax by value
    # within (entity, ts), then plain ASOF JOIN).
    if backward:
        w = (Window.partitionBy("__k")
                   .orderBy(F.col("__t").asc(), F.col("__side").asc(),
                            F.col("__v").asc())
                   .rowsBetween(Window.unboundedPreceding, 0))
        match = F.last("__v", ignorenulls=True).over(w)
    else:
        w = (Window.partitionBy("__k")
                   .orderBy(F.col("__t").asc(), F.col("__side").asc(),
                            F.col("__v").asc())
                   .rowsBetween(0, Window.unboundedFollowing))
        match = F.first("__v", ignorenulls=True).over(w)
    filled = unioned.select(
        "__k", "__t", "__side", *passthrough,
        match.alias("__m"),
    ).filter(F.col("__side") == label_rank)

    if tolerance_seconds is not None:
        gap = (F.col("__t").cast("timestamp").cast("double")
               - F.col("__m.__mts").cast("timestamp").cast("double"))
        if not backward:
            gap = -gap
        in_window = (F.col("__m").isNotNull()
                     & (gap <= F.lit(float(tolerance_seconds))))
        filled = filled.withColumn("__m", F.when(in_window, F.col("__m")))

    return filled.select(
        F.col("__k").alias(on),
        F.col("__t").alias(left_ts),
        *passthrough,
        *[F.col(f"__m.v_{c}").alias(f"{c}{suffix}") for c in value_cols],
        F.col("__m.__mts").alias("__matched_ts"),
    )


def _asof_join_nearest(
    labels: DataFrame,
    features: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: Optional[Sequence[str]],
    tolerance_seconds: Optional[float],
    strict: bool,
    suffix: str,
) -> DataFrame:
    """``direction='nearest'`` on the union-window plan: the backward
    and forward candidates are two window aggregates over the SAME
    ``(entity)`` clustering and sort — one shuffle, one WindowExec —
    and the row picks whichever is closer in absolute time, backward
    winning ties (pandas ``merge_asof`` rule: ``left_distance <=
    right_distance``).

    Layout: non-strict puts features before labels at equal ``ts`` so
    an exact-timestamp match is seen by the backward frame with gap 0
    (and therefore always wins); strict puts labels first, which hides
    equal-ts features from the backward frame, and the forward match is
    additionally gated on ``gap > 0`` (the following frame does see
    equal-ts rows in that layout)."""
    if value_cols is None:
        value_cols = [c for c in features.columns if c not in (on, right_ts)]
    value_cols = list(value_cols)
    feat_rank, label_rank = (0, 1) if not strict else (1, 0)

    ltypes = {f.name: f.dataType for f in labels.schema.fields}
    passthrough = [c for c in labels.columns if c not in (on, left_ts)]
    packed = F.struct(
        F.col(right_ts).alias("__mts"),
        *[F.col(c).alias(f"v_{c}") for c in value_cols])
    f_tagged = features.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(feat_rank).alias("__side"),
        packed.alias("__v"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in passthrough],
    )
    null_struct = F.lit(None).cast(f_tagged.schema["__v"].dataType)
    l_tagged = labels.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(label_rank).alias("__side"),
        null_struct.alias("__v"),
        *passthrough,
    )
    unioned = f_tagged.unionByName(l_tagged)

    order = [F.col("__t").asc(), F.col("__side").asc(), F.col("__v").asc()]
    wb = (Window.partitionBy("__k").orderBy(*order)
          .rowsBetween(Window.unboundedPreceding, 0))
    wf = (Window.partitionBy("__k").orderBy(*order)
          .rowsBetween(0, Window.unboundedFollowing))
    cand = unioned.select(
        "__k", "__t", "__side", *passthrough,
        F.last("__v", ignorenulls=True).over(wb).alias("__mb"),
        F.first("__v", ignorenulls=True).over(wf).alias("__mf"),
    ).filter(F.col("__side") == label_rank)

    def _us(c):
        return (c.cast("timestamp").cast("double") * 1_000_000
                ).cast("long")

    t_us = _us(F.col("__t"))
    gap_b = t_us - _us(F.col("__mb.__mts"))
    gap_f = _us(F.col("__mf.__mts")) - t_us
    mb, mf = F.col("__mb"), F.col("__mf")
    if strict:
        mf = F.when(gap_f > 0, mf)
        gap_f = F.when(gap_f > 0, gap_f)
    if tolerance_seconds is not None:
        tol_us = F.lit(int(tolerance_seconds * 1_000_000))
        mb = F.when(gap_b <= tol_us, mb)
        gap_b = F.when(gap_b <= tol_us, gap_b)
        mf = F.when(gap_f <= tol_us, mf)
        gap_f = F.when(gap_f <= tol_us, gap_f)
    pick_b = mb.isNotNull() & (mf.isNull() | (gap_b <= gap_f))
    chosen = cand.select(
        "__k", "__t", *passthrough,
        F.when(pick_b, mb).otherwise(mf).alias("__m"),
    )
    return chosen.select(
        F.col("__k").alias(on),
        F.col("__t").alias(left_ts),
        *passthrough,
        *[F.col(f"__m.v_{c}").alias(f"{c}{suffix}") for c in value_cols],
        F.col("__m.__mts").alias("__matched_ts"),
    )


def asof_join_multi(
    labels: DataFrame,
    tables: "dict[str, DataFrame]",
    on: str = "entity_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: "Optional[dict[str, Sequence[str]]]" = None,
    tolerance_seconds: "Optional[dict[str, float]]" = None,
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join of ONE label stream against MANY feature
    tables in a single shuffle — the feature-store enrichment shape
    (one entity timeline, K feature families maintained by K jobs).

    K separate :func:`asof_join` calls cost K shuffles of the
    (growing) label frame; here every feature table is tagged with its
    own packed value struct, all sides union with the labels, and the
    K running ``last(..., ignoreNulls)`` aggregates share ONE window
    (same partitioning, same ordering) — Catalyst compiles them into a
    single Exchange + Sort + WindowExec regardless of K (plan-asserted
    in tests).  At 100 TB this turns the enrichment stage from K
    entity-hash shuffles of an ever-wider frame into one shuffle of
    the union of inputs.

    Per-table semantics are exactly :func:`asof_join`
    ``direction='backward'``: most recent row at-or-before the label
    (strictly before with ``strict=True``), deterministic on
    same-timestamp ties via the packed value struct in the sort key,
    optional per-table staleness bound through ``tolerance_seconds``
    (dict ``table_name -> seconds``).

    Returns ``labels`` plus, per table ``t``, its value columns
    renamed ``f"{col}_{t}"`` and a ``f"__matched_ts_{t}"`` timestamp
    (null = no match, zero temporal leakage by construction).
    """
    names = list(tables)
    vmap = {
        t: list(value_cols[t]) if value_cols and t in value_cols
        else [c for c in tables[t].columns if c not in (on, right_ts)]
        for t in names}
    feat_rank, label_rank = (0, 1) if not strict else (1, 0)

    ltypes = {f.name: f.dataType for f in labels.schema.fields}
    passthrough = [c for c in labels.columns if c not in (on, left_ts)]

    # one packed struct per table; a side's row carries its own struct
    # and nulls for every other table's, so each running last() only
    # ever sees its own table's rows.
    def packed(t):
        return F.struct(
            F.col(right_ts).alias("__mts"),
            *[F.col(c).alias(f"v_{c}") for c in vmap[t]])

    tagged = []
    struct_types = {}
    for i, t in enumerate(names):
        sel = tables[t].select(
            F.col(on).alias("__k"),
            F.col(right_ts).alias("__t"),
            F.lit(feat_rank).alias("__side"),
            packed(t).alias(f"__v_{t}"),
        )
        struct_types[t] = sel.schema[f"__v_{t}"].dataType
        tagged.append(sel)
    # fill in the other tables' null structs + null label passthrough
    sides = []
    for i, t in enumerate(names):
        sides.append(tagged[i].select(
            "__k", "__t", "__side",
            *[F.col(f"__v_{u}") if u == t
              else F.lit(None).cast(struct_types[u]).alias(f"__v_{u}")
              for u in names],
            *[F.lit(None).cast(ltypes[c]).alias(c) for c in passthrough],
        ))
    l_tagged = labels.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(label_rank).alias("__side"),
        *[F.lit(None).cast(struct_types[u]).alias(f"__v_{u}")
          for u in names],
        *passthrough,
    )
    unioned = l_tagged
    for s in sides:
        unioned = unioned.unionByName(s)

    # ONE sort order shared by every aggregate: ties within table t are
    # broken by __v_t itself (all other tables' structs are equally
    # null on t's rows), so each table's winner is layout-independent.
    w = (Window.partitionBy("__k")
               .orderBy(F.col("__t").asc(), F.col("__side").asc(),
                        *[F.col(f"__v_{t}").asc() for t in names])
               .rowsBetween(Window.unboundedPreceding, 0))
    filled = unioned.select(
        "__k", "__t", "__side", *passthrough,
        *[F.last(f"__v_{t}", ignorenulls=True).over(w).alias(f"__m_{t}")
          for t in names],
    ).filter(F.col("__side") == label_rank)

    for t in names:
        tol = (tolerance_seconds or {}).get(t)
        if tol is not None:
            gap = (F.col("__t").cast("timestamp").cast("double")
                   - F.col(f"__m_{t}.__mts").cast("timestamp")
                      .cast("double"))
            ok = F.col(f"__m_{t}").isNotNull() & (gap <= F.lit(float(tol)))
            filled = filled.withColumn(
                f"__m_{t}", F.when(ok, F.col(f"__m_{t}")))

    return filled.select(
        F.col("__k").alias(on),
        F.col("__t").alias(left_ts),
        *passthrough,
        *[c for t in names for c in
          (*[F.col(f"__m_{t}.v_{v}").alias(f"{v}_{t}") for v in vmap[t]],
           F.col(f"__m_{t}.__mts").alias(f"__matched_ts_{t}"))],
    )


def asof_join_cogrouped(
    labels: DataFrame,
    features: DataFrame,
    on: str = "entity_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Optional[Sequence[str]] = None,
    tolerance_seconds: Optional[float] = None,
    strict: bool = False,
    suffix: str = "",
    direction: str = "backward",
) -> DataFrame:
    """As-of join via cogrouped ``applyInPandas`` running
    ``pd.merge_asof`` per entity.  One shuffle per side on the entity
    key; the per-group pandas merge is O(n log n) sort + linear scan.
    ``direction`` is any ``merge_asof`` direction — 'backward',
    'forward', or 'nearest' (all three also exist on the union-window
    strategy; this variant is the Arrow/pandas cross-check)."""
    import pyspark.sql.types as T

    if value_cols is None:
        value_cols = [c for c in features.columns if c not in (on, right_ts)]
    value_cols = list(value_cols)

    lab = labels
    out_fields = list(lab.schema.fields)
    fschema = {f.name: f.dataType for f in features.schema.fields}
    out_fields += [T.StructField(f"{c}{suffix}", fschema[c], True)
                   for c in value_cols]
    out_fields.append(T.StructField("__matched_ts",
                                    fschema[right_ts], True))
    out_schema = T.StructType(out_fields)
    label_cols = list(lab.columns)

    # rename the right side to unique internal names BEFORE the cogroup:
    # when both sides derive from the same source relation the left and
    # right ts attributes share expression ids, and the cogroup plan
    # deduplicates one away — the pandas frame then silently misses the
    # column.  Fresh aliases get fresh expression ids.
    feat = features.select(
        F.col(on).alias("__rk"),
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"__rv_{i}") for i, c in enumerate(value_cols)])

    def merge(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        if ldf.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        ldf = ldf.sort_values(left_ts, kind="mergesort")
        rdf = rdf.sort_values("__rts", kind="mergesort")
        right = rdf.rename(
            columns={"__rts": "__matched_ts",
                     **{f"__rv_{i}": f"{c}{suffix}"
                        for i, c in enumerate(value_cols)}})
        right = right[["__matched_ts"]
                      + [f"{c}{suffix}" for c in value_cols]]
        tol = (pd.Timedelta(seconds=tolerance_seconds)
               if tolerance_seconds is not None else None)
        merged = pd.merge_asof(
            ldf, right,
            left_on=left_ts, right_on="__matched_ts",
            direction=direction,
            allow_exact_matches=not strict,
            tolerance=tol,
        )
        return merged[label_cols + [f"{c}{suffix}" for c in value_cols]
                      + ["__matched_ts"]]

    return (
        lab.groupBy(on)
        .cogroup(feat.groupBy("__rk"))
        .applyInPandas(merge, out_schema)
    )


def scd2_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    fact_ts: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    value_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Point-in-time join of a fact stream against a slowly-changing
    type-2 dimension: each fact row picks up the dimension attributes
    whose validity period covers it (``valid_from <= fact_ts <
    valid_to``; ``valid_to`` NULL = current row, open-ended).

    For a well-formed SCD2 dimension (periods per key non-overlapping)
    this is exactly an as-of backward join on ``valid_from`` followed
    by a ``fact_ts < valid_to`` guard — so it rides the one-shuffle
    union plan of :func:`asof_join` instead of a generic interval
    join: the dimension's periods per key are totally ordered, and the
    latest ``valid_from`` at-or-before the fact IS the covering period
    if any period covers it.  Facts outside every period (before the
    first, or in a retired gap) keep NULL attributes, like SQL's
    LEFT JOIN ... BETWEEN.
    """
    if value_cols is None:
        value_cols = [c for c in dim.columns
                      if c not in (on, valid_from, valid_to)]
    value_cols = list(value_cols)
    out = asof_join(facts, dim, on=on, left_ts=fact_ts,
                    right_ts=valid_from,
                    value_cols=value_cols + [valid_to])
    ts_us = (F.col(fact_ts).cast("timestamp").cast("double")
             * 1_000_000).cast("long")
    to_us = (F.col(valid_to).cast("timestamp").cast("double")
             * 1_000_000).cast("long")
    covered = F.col(valid_to).isNull() | (ts_us < to_us)
    matched = F.col("__matched_ts").isNotNull() & covered
    for c in value_cols:
        out = out.withColumn(c, F.when(matched, F.col(c)))
    return out.drop(valid_to, "__matched_ts")

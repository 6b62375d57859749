"""Skew-proof (chunked) timeline operators — exact results on hot keys.

The plain window/as-of operators cluster by the entity key, so a hot
entity (spam account, default id) puts its whole timeline in ONE task:
a straggler that caps scaling no matter how many executors exist.  The
operators here cluster by ``(entity, time-bucket)`` instead — a hot
entity's 90-day timeline splits into ``span/bucket`` independent tasks
— while producing **bit-identical results** to the plain operators.

Cost discipline (this is what makes the chunked path as cheap as the
plain one): each operator moves the full frame through exactly ONE
shuffle — the ``repartition(entity, bucket)`` clustering (for rolling,
the time-overlap context rows are ``explode``-duplicated narrowly in
the SAME scan BEFORE that shuffle — single consumer of the upstream,
so an expensive decode never needs a protective cache).  Everything
cross-bucket rides on per-(entity, bucket) summary tables: one row per
non-empty bucket per entity, built with NO extra shuffle (groupBy on
the clustering keys reuses the partitioning), prefix-scanned per
entity (tiny windows, pure JVM), and joined back on the clustering
keys — the big side is already hash-partitioned on them, so only the
tiny summary moves.  The summary branch and the join's big side share
the clustering exchange via ReusedExchange: pre-shuffle work runs
once by construction, and the duplicated post-shuffle window pass over
the narrow frame measures cheaper than persisting the intermediate
(the cache write alone cost ~1.7s of the sf0.1 stage wall).  (No
broadcast hints: a per-(entity, bucket) table grows with the corpus,
and the driver-side broadcast build measurably dominated the stage
wall even at 500k rows; AQE may still choose broadcast when a summary
is genuinely small.)

Exactness mechanisms, per operator:

* rolling (time-range): rows within ``window_seconds`` of a bucket end
  are duplicated into the next bucket as context (rows older than the
  reach cannot matter, so one-bucket forwarding is exact);
* lags (row-based, NOT time-bounded): each bucket's carry-in — the
  ``max(lags)`` rows preceding it across ALL earlier buckets, however
  sparse — is folded from per-bucket tail arrays and consulted by the
  first rows of the bucket;
* sessionize: local gap flags, with the bucket's first row resolved
  against the previous bucket's last timestamp and the session-id base
  prefix-summed over buckets;
* as-of join: the per-bucket last feature row is prefix-filled over
  buckets and joined on as a seed COLUMN (``coalesce(running_last,
  seed)``) — no seed rows, no second shuffle.

The equality contract is asserted by tests/test_chunked.py against the
plain operators on hot, sparse, and boundary-heavy inputs.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from .windows import ts_seconds

_B = "__bucket"
_CTX = "__ctx"

# persisted intermediates of chunked-operator calls; a long-lived
# session releases them with release_chunk_caches() once the returned
# frames are materialized (they are tiny relative to executor memory,
# but unbounded accumulation across many calls eventually evicts)
_LIVE_CACHES: list = []


def _remember(df: DataFrame) -> DataFrame:
    _LIVE_CACHES.append(df)
    return df


def release_chunk_caches() -> int:
    """Unpersist every cached intermediate created by chunked operators
    so far.  Call after materializing their outputs (count/write/
    collect); returns the number of frames released.  Safe to call any
    time — an unpersisted upstream only means recomputation if the
    output is re-evaluated later."""
    n = 0
    while _LIVE_CACHES:
        df = _LIVE_CACHES.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n


def _bucket_of(ts_col, bucket_seconds: float) -> Column:
    us = (ts_seconds(ts_col) * 1_000_000).cast("long")
    return F.floor(us / F.lit(int(bucket_seconds * 1_000_000)))


def _cluster(df: DataFrame, entity_col: str,
             materialize: bool = True) -> DataFrame:
    """THE one full-frame shuffle: hash-cluster on (entity, bucket).
    Downstream windows/groupBys on these keys reuse the partitioning.

    ``materialize=True`` persists the clustered frame.  All chunked
    operators now pass ``False``: their summary branch and join big
    side share this exchange via ReusedExchange, so the expensive
    pre-shuffle upstream runs once regardless, and the duplicated
    post-shuffle work (one window/agg pass over the narrow frame)
    measures cheaper than the cache materialization at every scale
    tried (same-day A/B at 2M images: no-persist plan 1.5× faster
    end-to-end, ``plan_cost_ab`` in BENCH_SCALING.json).  The knob
    stays for callers whose downstream re-evaluates the frame many
    times (iterative algorithms) — the production equivalent is
    checkpointing to the warehouse (checkpoint/resume layer)."""
    out = df.repartition(F.col(entity_col), F.col(_B))
    if materialize:
        out = _remember(out.persist())
    return out


# ---------------------------------------------------------------------------
# lags
# ---------------------------------------------------------------------------

def _tail_arrays(clustered: DataFrame, entity_col: str, k: int,
                 sort_struct) -> DataFrame:
    """Per-(entity, bucket) array of the last ``k`` rows (ascending).
    No shuffle: the groupBy keys match the clustering.  NB ``slice``
    with a negative start returns EMPTY for arrays shorter than k, so
    small buckets keep their whole array."""
    arr = F.sort_array(F.collect_list(sort_struct))
    tail = F.when(F.size(arr) <= k, arr).otherwise(F.slice(arr, -k, k))
    return clustered.groupBy(entity_col, _B).agg(tail.alias("__tail"))


def _carry_arrays(tails: DataFrame, entity_col: str, k: int) -> DataFrame:
    """Fold tails over buckets per entity: each bucket's carry-in = the
    k rows preceding it across all earlier buckets.  Pure window
    expressions — concatenate every EARLIER bucket's tail (each already
    holds that bucket's last <= k rows, so the flattened prefix is
    exactly the candidate pool) and keep the last k.  An earlier
    ``applyInPandas`` fold computed the same thing 10x slower: with one
    summary row per (entity, bucket) the per-group pandas construction
    overhead dominated (measured ~1.5 ms x 10k entities = the whole
    stage), and it put a Python stage in an otherwise codegen'd plan."""
    w_prev = (Window.partitionBy(entity_col).orderBy(_B)
              .rowsBetween(Window.unboundedPreceding, -1))
    prev = F.flatten(F.collect_list("__tail").over(w_prev))
    carry = F.when(F.size(prev) <= k, prev).otherwise(F.slice(prev, -k, k))
    return tails.select(entity_col, _B, carry.alias("__carry"))


def chunked_lags(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    cols: Sequence[str],
    lags: Sequence[int] = (1,),
    bucket_seconds: float = 7 * 86400.0,
) -> DataFrame:
    """Exact twin of ``windows.with_lags`` clustered by (entity,
    bucket), correct under arbitrary bucket sparsity.

    Ties in ``ts`` are ordered by the value columns — the same rule as
    the plain operator (``windows.with_lags``), so the two paths agree
    row-for-row even on tied timestamps."""
    k = max(lags)
    cols = list(cols)
    clustered = _cluster(
        df.withColumn(_B, _bucket_of(ts_col, bucket_seconds)), entity_col,
        materialize=False)
    sort_struct = F.struct(F.col(ts_col).alias("__t"),
                           *[F.col(c).alias(c) for c in cols])
    carries = _carry_arrays(
        _tail_arrays(clustered, entity_col, k, sort_struct),
        entity_col, k)

    joined = clustered.join(carries, [entity_col, _B], "left")
    w_local = Window.partitionBy(entity_col, _B).orderBy(
        F.col(ts_col), *[F.col(c) for c in cols])
    joined = joined.withColumn("__rn", F.row_number().over(w_local))
    out = joined
    for c in cols:
        for j in lags:
            local = F.lag(c, j).over(w_local)
            need = F.lit(j) - F.col("__rn") + 1      # rows missing locally
            size = F.coalesce(F.size("__carry"), F.lit(0))
            idx = size - need + 1                    # 1-based from end
            from_carry = F.when(
                (need >= 1) & (idx >= 1),
                F.element_at("__carry", idx.cast("int"))[c])
            out = out.withColumn(
                f"{c}_lag{j}",
                F.when(F.col("__rn") > j, local).otherwise(from_carry))
    return out.drop(_B, "__carry", "__rn")


# ---------------------------------------------------------------------------
# rolling
# ---------------------------------------------------------------------------

def _rolling_exprs(aggs: Dict[str, Sequence[str]], window_seconds: float,
                   w) -> Dict[str, Column]:
    fns = {"sum": F.sum, "mean": F.avg, "min": F.min, "max": F.max,
           "count": F.count, "std": F.stddev_samp}
    return {
        f"{c}_roll_{name}_{window_seconds:g}s": fns[name](c).over(w)
        for c, names in aggs.items() for name in names
    }


def _overlap_context(tagged: DataFrame, ts_col: str, bucket_seconds: float,
                     overlap_seconds: float) -> DataFrame:
    """Narrow (pre-shuffle) duplication of each bucket's last
    ``overlap_seconds`` of rows into the next bucket, flagged __ctx=1.

    Single-scan form: each tail-window row ``explode``s into itself
    plus its next-bucket context copy — the input is consumed ONCE, so
    callers need no protective persist of the upstream (an earlier
    two-branch union scanned it twice, forcing a cache of the whole
    tagged frame just to avoid a double image-decode)."""
    bucket_us = int(bucket_seconds * 1_000_000)
    row_us = (ts_seconds(ts_col) * 1_000_000).cast("long")
    in_tail = (row_us >= (F.col(_B) + 1) * bucket_us
               - F.lit(int(overlap_seconds * 1_000_000)))
    dup = F.explode(F.when(in_tail, F.array(F.lit(0), F.lit(1)))
                    .otherwise(F.array(F.lit(0))))
    out = tagged.withColumn(_CTX, dup)
    return out.withColumn(_B, F.col(_B) + F.col(_CTX))


def chunked_rolling(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    aggs: Dict[str, Sequence[str]],
    window_seconds: float,
    bucket_seconds: float = 7 * 86400.0,
    include_current: bool = True,
) -> DataFrame:
    """Exact twin of ``windows.rolling_aggregates`` clustered by
    (entity, bucket); needs ``window_seconds <= bucket_seconds``."""
    if window_seconds > bucket_seconds:
        raise ValueError("rolling window must fit in one bucket")
    tagged = df.withColumn(_B, _bucket_of(ts_col, bucket_seconds))
    clustered = _cluster(
        _overlap_context(tagged, ts_col, bucket_seconds, window_seconds),
        entity_col, materialize=False)
    upper = 0 if include_current else -1
    w = (Window.partitionBy(entity_col, _B)
               .orderBy((ts_seconds(ts_col) * 1_000_000).cast("long"))
               .rangeBetween(-int(window_seconds * 1_000_000), upper))
    out = clustered
    for name, expr in _rolling_exprs(aggs, window_seconds, w).items():
        out = out.withColumn(name, expr)
    return out.filter(F.col(_CTX) == 0).drop(_CTX, _B)


# ---------------------------------------------------------------------------
# sessionize
# ---------------------------------------------------------------------------

def _session_pieces(clustered: DataFrame, entity_col: str, ts_col: str,
                    gap_seconds: float):
    """Local gap flags + the per-bucket summary with each bucket's
    session-id base.  Shares the caller's clustering (no shuffle for
    the groupBy; a tiny per-entity window on the summary)."""
    w_local = Window.partitionBy(entity_col, _B).orderBy(ts_col)
    prev_local = F.lag(F.col(ts_col)).over(w_local)
    gap = F.lit(float(gap_seconds))
    inner_new = (prev_local.isNotNull()
                 & ((ts_seconds(ts_col) - ts_seconds(prev_local)) > gap)
                 ).cast("long")
    flagged = (clustered
               .withColumn("__inner_new", inner_new)
               .withColumn("__is_first",
                           (F.row_number().over(w_local) == 1).cast("long")))

    summary = (flagged.groupBy(entity_col, _B)
               .agg(F.min(ts_col).alias("__first_ts"),
                    F.max(ts_col).alias("__last_ts"),
                    F.sum("__inner_new").alias("__inner_starts")))
    w_b = Window.partitionBy(entity_col).orderBy(_B)
    carry_last = F.lag("__last_ts").over(w_b)
    first_new = F.when(
        carry_last.isNull()
        | ((ts_seconds(F.col("__first_ts")) - ts_seconds(carry_last))
           > gap),
        F.lit(1)).otherwise(F.lit(0))
    summary = summary.withColumn("__first_new", first_new)
    starts = F.col("__first_new") + F.col("__inner_starts")
    summary = summary.withColumn(
        "__base",
        F.coalesce(
            F.sum(starts).over(
                w_b.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0)))
    return flagged, summary.select(entity_col, _B, "__first_new", "__base")


def chunked_sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: float = 1800.0,
    session_col: str = "session_id",
    bucket_seconds: float = 7 * 86400.0,
) -> DataFrame:
    """Exact twin of ``windows.sessionize`` without the per-entity
    straggler (two-level scan, see module docstring)."""
    clustered = _cluster(
        df.withColumn(_B, _bucket_of(ts_col, bucket_seconds)), entity_col,
        materialize=False)
    flagged, summary = _session_pieces(clustered, entity_col, ts_col,
                                       gap_seconds)
    joined = flagged.join(summary, [entity_col, _B])
    w_local = Window.partitionBy(entity_col, _B).orderBy(ts_col)
    local_flag = (F.col("__inner_new")
                  + F.col("__is_first") * F.col("__first_new"))
    w_cum = w_local.rowsBetween(Window.unboundedPreceding, 0)
    out = joined.withColumn(
        session_col,
        F.col("__base") + F.sum(local_flag).over(w_cum) - 1)
    return out.drop(_B, "__inner_new", "__is_first", "__first_new",
                    "__base")


# ---------------------------------------------------------------------------
# combined timeline pass (pipeline hot path): ONE clustering shuffle
# ---------------------------------------------------------------------------

def chunked_timeline_features(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    lag_cols: Sequence[str],
    lags: Sequence[int],
    rolling_aggs: Dict[str, Sequence[str]],
    rolling_window_s: float,
    session_gap_s: float,
    session_col: str = "session_id",
    bucket_seconds: float = 7 * 86400.0,
) -> DataFrame:
    """sessionize + lags + trailing rolling aggregates in ONE clustered
    pass: a single full-frame shuffle (including the rolling context
    rows), tiny broadcast summaries for everything cross-bucket."""
    if rolling_window_s > bucket_seconds:
        raise ValueError("rolling window must fit in one bucket")
    k = max(lags)
    lag_cols = list(lag_cols)

    tagged = df.withColumn(_B, _bucket_of(ts_col, bucket_seconds))
    clustered = _cluster(
        _overlap_context(tagged, ts_col, bucket_seconds, rolling_window_s),
        entity_col, materialize=False)

    # rolling first — the only op that needs the context rows
    w_range = (Window.partitionBy(entity_col, _B)
               .orderBy((ts_seconds(ts_col) * 1_000_000).cast("long"))
               .rangeBetween(-int(rolling_window_s * 1_000_000), 0))
    out = clustered
    for name, expr in _rolling_exprs(rolling_aggs, rolling_window_s,
                                     w_range).items():
        out = out.withColumn(name, expr)
    # no persist: the summary branch and the join's big side share the
    # clustering exchange (ReusedExchange — the expensive pre-shuffle
    # work, e.g. image decode, runs once by construction), and the
    # duplicated post-shuffle work is one window pass over the narrow
    # frame — measured cheaper than materializing the cache at every
    # scale tried (the cache write alone cost ~1.7s of the sf0.1 wall)
    real = out.filter(F.col(_CTX) == 0).drop(_CTX)

    # ONE summary pass for sessionize AND lag carries: both aggregate
    # per (entity, bucket) and prefix-scan per entity, so they share a
    # single groupBy (reuses the clustering), a single tiny per-entity
    # window stage, and a single join back — at small scale this halves
    # the fixed per-stage cost of the two-branch version (measured
    # ~1.5s of the sf0.1 stage wall), at corpus scale it halves the
    # summary-side shuffles.
    # order by the SAME µs expression as the rolling range window: the
    # µs long is a monotone image of ts (identical tie groups, so
    # results are bit-identical), and the matching sort order lets
    # Catalyst elide this stage's re-sort entirely
    w_local = (Window.partitionBy(entity_col, _B)
               .orderBy((ts_seconds(ts_col) * 1_000_000).cast("long")))
    prev_local = F.lag(F.col(ts_col)).over(w_local)
    inner_new = (prev_local.isNotNull()
                 & ((ts_seconds(ts_col) - ts_seconds(prev_local))
                    > F.lit(float(session_gap_s)))).cast("long")
    flagged = (real
               .withColumn("__inner_new", inner_new)
               .withColumn("__is_first",
                           (F.row_number().over(w_local) == 1)
                           .cast("long")))
    sort_struct = F.struct(F.col(ts_col).alias("__t"),
                           *[F.col(c).alias(c) for c in lag_cols])
    arr = F.sort_array(F.collect_list(sort_struct))
    tail = F.when(F.size(arr) <= k, arr).otherwise(F.slice(arr, -k, k))
    summary = (flagged.groupBy(entity_col, _B)
               .agg(F.min(ts_col).alias("__first_ts"),
                    F.max(ts_col).alias("__last_ts"),
                    F.sum("__inner_new").alias("__inner_starts"),
                    tail.alias("__tail")))
    w_b = Window.partitionBy(entity_col).orderBy(_B)
    carry_last = F.lag("__last_ts").over(w_b)
    first_new = F.when(
        carry_last.isNull()
        | ((ts_seconds(F.col("__first_ts")) - ts_seconds(carry_last))
           > F.lit(float(session_gap_s))),
        F.lit(1)).otherwise(F.lit(0))
    summary = summary.withColumn("__first_new", first_new)
    starts = F.col("__first_new") + F.col("__inner_starts")
    w_prev = w_b.rowsBetween(Window.unboundedPreceding, -1)
    prev_tails = F.flatten(F.collect_list("__tail").over(w_prev))
    carry = F.when(F.size(prev_tails) <= k, prev_tails) \
             .otherwise(F.slice(prev_tails, -k, k))
    summary = (summary
               .withColumn("__base",
                           F.coalesce(F.sum(starts).over(w_prev),
                                      F.lit(0)))
               .withColumn("__carry", carry)
               .select(entity_col, _B, "__first_new", "__base",
                       "__carry"))

    joined = flagged.join(summary, [entity_col, _B], "left")
    local_flag = (F.col("__inner_new")
                  + F.col("__is_first") * F.col("__first_new"))
    joined = joined.withColumn(
        session_col,
        F.col("__base")
        + F.sum(local_flag).over(
            w_local.rowsBetween(Window.unboundedPreceding, 0)) - 1)
    joined = joined.drop("__inner_new", "__is_first", "__first_new",
                         "__base")
    w_sorted = Window.partitionBy(entity_col, _B).orderBy(
        F.col(ts_col), *[F.col(c) for c in lag_cols])
    joined = joined.withColumn("__rn", F.row_number().over(w_sorted))
    for c in lag_cols:
        for j in lags:
            local = F.lag(c, j).over(w_sorted)
            need = F.lit(j) - F.col("__rn") + 1
            size = F.coalesce(F.size("__carry"), F.lit(0))
            idx = size - need + 1
            from_carry = F.when(
                (need >= 1) & (idx >= 1),
                F.element_at("__carry", idx.cast("int"))[c])
            joined = joined.withColumn(
                f"{c}_lag{j}",
                F.when(F.col("__rn") > j, local).otherwise(from_carry))
    return joined.drop(_B, "__carry", "__rn")


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------

def chunked_asof_join(
    labels: DataFrame,
    features: DataFrame,
    on: str = "entity_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Optional[Sequence[str]] = None,
    tolerance_seconds: Optional[float] = None,
    strict: bool = False,
    suffix: str = "",
    bucket_seconds: float = 7 * 86400.0,
) -> DataFrame:
    """Exact twin of ``asof.asof_join`` (backward) clustered by
    (entity, time-bucket): ONE shuffle of the unioned sides.  The
    unbounded backward lookback is restored by a per-bucket seed — the
    prefix-filled last feature row of all earlier buckets — broadcast-
    joined as a COLUMN and coalesced under the running last."""
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
    unioned = (f_tagged.unionByName(l_tagged)
               .withColumn(_B, _bucket_of("__t", bucket_seconds)))
    clustered = _cluster(unioned, "__k", materialize=False)

    # per-bucket last feature struct ("last" in (t, side) order — the
    # same order the running window uses).  ONE aggregation pass over
    # the clustered frame covers every bucket: max_by ignores rows with
    # a null ordering key, so label-only buckets yield a null __last_v
    # (an earlier two-pass version — feature-row agg + distinct + join —
    # plus an explicit broadcast of the seeds cost 11s of the stage
    # wall at 500k rows, and a broadcast of a per-(entity, bucket)
    # table is wrong at corpus scale anyway; the groupBy and the join
    # below both reuse the (entity, bucket) clustering, so neither
    # moves the big frame again).
    w_b = Window.partitionBy("__k").orderBy(_B)
    seeds = (clustered
             .groupBy("__k", _B)
             .agg(F.max_by(
                 "__v",
                 F.when(F.col("__v").isNotNull(),
                        F.struct(F.col("__t"), F.col("__side"))))
                 .alias("__last_v"))
             .withColumn("__seed_v",
                         F.last("__last_v", ignorenulls=True).over(
                             w_b.rowsBetween(Window.unboundedPreceding, -1)))
             .filter(F.col("__seed_v").isNotNull())
             .select("__k", _B, "__seed_v"))

    with_seed = clustered.join(seeds, ["__k", _B], "left")
    w = (Window.partitionBy("__k", _B)
               .orderBy(F.col("__t").asc(), F.col("__side").asc())
               .rowsBetween(Window.unboundedPreceding, 0))
    filled = with_seed.select(
        "__k", "__t", "__side", *passthrough,
        F.coalesce(F.last("__v", ignorenulls=True).over(w),
                   F.col("__seed_v")).alias("__m"),
    ).filter(F.col("__side") == label_rank)

    if tolerance_seconds is not None:
        gap = (F.col("__t").cast("timestamp").cast("double")
               - F.col("__m.__mts").cast("timestamp").cast("double"))
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


def chunked_rolling_corr(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    xcol: str,
    ycol: str,
    window_seconds: float,
    bucket_seconds: float = 7 * 86400.0,
    out_col: str = "roll_corr",
) -> DataFrame:
    """Skew-proof twin of ``windows.rolling_corr``: the six sufficient
    sums ride :func:`chunked_rolling` (clustered by (entity,
    time-bucket), hot entities split across tasks, overlap-context
    rows supply the trailing window across bucket edges), and the same
    closed-form correlation expression as the plain operator turns
    them into bit-identical values."""
    tagged = (df.withColumn("__cx", F.col(xcol).cast("long"))
                .withColumn("__cy", F.col(ycol).cast("long"))
                .withColumn("__cxx", F.col(xcol).cast("long")
                            * F.col(xcol).cast("long"))
                .withColumn("__cyy", F.col(ycol).cast("long")
                            * F.col(ycol).cast("long"))
                .withColumn("__cxy", F.col(xcol).cast("long")
                            * F.col(ycol).cast("long")))
    rolled = chunked_rolling(
        tagged, entity_col, ts_col,
        {"__cx": ["sum", "count"], "__cy": ["sum"], "__cxx": ["sum"],
         "__cyy": ["sum"], "__cxy": ["sum"]},
        window_seconds)
    ws = f"{window_seconds:g}s"
    n = F.col(f"__cx_roll_count_{ws}")
    nd = n.cast("double")
    sx = F.col(f"__cx_roll_sum_{ws}").cast("double")
    sy = F.col(f"__cy_roll_sum_{ws}").cast("double")
    sxx = F.col(f"__cxx_roll_sum_{ws}").cast("double")
    syy = F.col(f"__cyy_roll_sum_{ws}").cast("double")
    sxy = F.col(f"__cxy_roll_sum_{ws}").cast("double")
    cov = nd * sxy - sx * sy
    vx = nd * sxx - sx * sx
    vy = nd * syy - sy * sy
    corr = F.when((n >= 2) & (vx > 0) & (vy > 0),
                  cov / (F.sqrt(vx) * F.sqrt(vy)))
    drop = [c for c in rolled.columns if c.startswith("__c")]
    return rolled.withColumn(out_col, corr).drop(*drop)


def chunked_ewma(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    col: str,
    alpha: float = 0.5,
    max_lags: int = 8,
    out_col: Optional[str] = None,
    tie_col: str = "event_id",
    bucket_seconds: float = 7 * 86400.0,
) -> DataFrame:
    """Skew-proof twin of ``windows.ewma``: the K lagged values ride
    :func:`chunked_lags` and the identical fixed-order weighted sum
    turns them into bit-identical EWMAs.

    Tie handling: ``chunked_lags`` orders ties by its value columns,
    so passing ``(tie_col, col)`` makes the effective order
    ``(ts, tie_col, col)`` — identical to the plain operator's
    ``(ts, tie_col)`` whenever ``tie_col`` is unique (which is what a
    tiebreaker column is)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    out_col = out_col or f"{col}_ewma"
    lags = list(range(1, int(max_lags) + 1))
    lagged = chunked_lags(df, entity_col, ts_col, [tie_col, col],
                          lags=lags, bucket_seconds=bucket_seconds)
    decay = 1.0 - alpha
    num = F.lit(0.0)
    den = F.lit(0.0)
    for k in range(int(max_lags) + 1):
        xk = F.col(col) if k == 0 else F.col(f"{col}_lag{k}")
        wk = F.lit(decay ** k)
        num = num + F.when(xk.isNotNull(),
                           xk.cast("double") * wk).otherwise(0.0)
        den = den + F.when(xk.isNotNull(), wk).otherwise(0.0)
    out = lagged.withColumn(out_col, F.when(den > 0, num / den))
    drop = ([f"{col}_lag{k}" for k in lags]
            + [f"{tie_col}_lag{k}" for k in lags])
    return out.drop(*drop)


def chunked_rolling_quantile(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    col: str,
    q: float = 0.5,
    window_seconds: float = 3600.0,
    bucket_seconds: float = 7 * 86400.0,
    out_col: Optional[str] = None,
) -> DataFrame:
    """Skew-proof twin of ``windows.rolling_quantile``: a trailing
    TIME-RANGE quantile only ever reads rows within ``window_seconds``
    of the current row, so the one-bucket overlap-context duplication
    that makes chunked_rolling exact applies verbatim — ``percentile``
    over the (entity, bucket) clustering with context rows supplying
    the cross-edge history.  (The EXPANDING quantile — winsorize_pit —
    is deliberately NOT chunkable this way: it reads the entity's full
    history, which no bounded context can carry.)"""
    if window_seconds > bucket_seconds:
        raise ValueError("rolling window must fit in one bucket")
    out_col = out_col or f"{col}_roll_q{q:g}"
    tagged = df.withColumn(_B, _bucket_of(ts_col, bucket_seconds))
    clustered = _cluster(
        _overlap_context(tagged, ts_col, bucket_seconds, window_seconds),
        entity_col, materialize=False)
    w = (Window.partitionBy(entity_col, _B)
               .orderBy((ts_seconds(ts_col) * 1_000_000).cast("long"))
               .rangeBetween(-int(window_seconds * 1_000_000), 0))
    out = clustered.withColumn(
        out_col, F.percentile(col, F.lit(float(q))).over(w))
    return out.filter(F.col(_CTX) == 0).drop(_CTX, _B)


def chunked_rolling_distinct(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    col: str,
    window_seconds: float,
    bucket_seconds: float = 7 * 86400.0,
    out_col: str = "roll_distinct",
) -> DataFrame:
    """Exact trailing-range COUNT(DISTINCT ``col``) per entity — "how
    many distinct event types did this user touch in the last 7 days".
    Neither Spark nor DuckDB supports a windowed COUNT(DISTINCT), so
    this is a grouped-Arrow kernel on the same (entity, time-bucket)
    clustering + overlap-context recipe as the other chunked rollers:
    one shuffle, hot entities split across tasks, context rows carry
    the cross-edge history.

    The kernel is fully vectorized NumPy (no per-row Python).  With
    rows sorted by event time ``us``, the RANGE frame of row ``i`` is
    the index span ``[j_i, k_i]`` (``searchsorted`` both bounds, so
    same-microsecond peers count like a SQL RANGE frame).  Then

        distinct_i = (k_i − j_i + 1) − pairs_i

    where ``pairs_i`` counts rows in the frame whose PREVIOUS
    same-value occurrence is also in the frame (each value with m
    occurrences contributes m−1 such pairs, collapsing it to one).
    ``pairs_i`` is an interval-stabbing count: pair ``r`` (a row and
    its predecessor ``p_r``) is inside frame ``i`` exactly for
    ``i ∈ [first i with k_i ≥ r, last i with j_i ≤ p_r]`` — both
    endpoints via ``searchsorted`` on the monotone ``k``/``j`` arrays,
    accumulated with a difference array + ``cumsum``.  O(n log n) per
    group, all NumPy."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.types as T

    if window_seconds > bucket_seconds:
        raise ValueError("rolling window must fit in one bucket")
    win_us = int(window_seconds * 1_000_000)
    tagged = df.withColumn(_B, _bucket_of(ts_col, bucket_seconds))
    clustered = _cluster(
        _overlap_context(tagged, ts_col, bucket_seconds, window_seconds),
        entity_col, materialize=False)
    withus = clustered.withColumn(
        "__us", (ts_seconds(ts_col) * 1_000_000).cast("long"))

    out_fields = list(df.schema.fields) + [
        T.StructField(out_col, T.LongType(), True)]
    out_schema = T.StructType(out_fields)
    keep = [f.name for f in out_fields]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(columns=keep)
        pdf = pdf.sort_values("__us", kind="mergesort").reset_index(drop=True)
        us = pdf["__us"].to_numpy(np.int64)
        vals = pdf[col].to_numpy()
        n = len(pdf)
        j = np.searchsorted(us, us - win_us, side="left")
        k = np.searchsorted(us, us, side="right") - 1
        prev = (pd.Series(np.arange(n)).groupby(vals).shift(1)
                .to_numpy())
        p = np.where(np.isnan(prev), -1, prev).astype(np.int64)
        t1 = np.searchsorted(k, np.arange(n), side="left")
        u = np.searchsorted(j, p, side="right") - 1
        valid = u >= t1
        delta = np.zeros(n + 1, np.int64)
        np.add.at(delta, t1[valid], 1)
        np.add.at(delta, u[valid] + 1, -1)
        pairs = np.cumsum(delta[:n])
        pdf[out_col] = (k - j + 1) - pairs
        return pdf.loc[pdf[_CTX] == 0, keep]

    return withus.groupBy(entity_col, _B).applyInPandas(kernel, out_schema)

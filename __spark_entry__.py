"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship north-star query (point-in-time
feature engineering + HSIC-Lasso selection) on sf0.001.
``queries()``/``oracle_sql()`` expose each implemented operator from
SURVEY.md §2 with a DuckDB-checkable ANSI-SQL oracle.

Cross-engine determinism conventions used throughout:
* timestamps compared as ``unix_micros`` (int64, exact);
* money aggregates computed in integer cents (exact in both engines —
  double summation order differs between engines otherwise);
* every ORDER/window includes a unique tiebreaker column;
* aggregate/computed columns aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

SF_DEFAULT = "/root/testdata/sf0.001"


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _us(col) -> "F.Column":
    """Epoch microseconds (int64) of a timestamp column — exact for
    cross-engine comparison.  Parquet timestamps arrive as
    TIMESTAMP_NTZ in Spark 4; with the session pinned to UTC the cast
    matches DuckDB's epoch_us."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


# ---------------------------------------------------------------------------
# negative-zero normalization (applied to EVERY gate query and oracle)
#
# IEEE-754 round() can land a tiny negative value exactly on zero, and
# Spark's round() normalizes that to +0.0 while DuckDB's preserves
# -0.0 — numerically equal values that hash differently under the
# driver's representation-exact value hash (round-3 finding: pit_ols,
# rolling_slope).  `x + 0.0` maps -0.0 -> +0.0 (and is the identity on
# every other double, NULL and NaN), so both engines are normalized at
# one chokepoint instead of editing ~200 float-emitting queries:
# queries() wraps every result's double / float / array<double>
# columns in `+ 0.0`, and oracle_sql() wraps each oracle in a
# `SELECT * REPLACE (col + 0.0 AS col)` shell over the same columns
# (per-oracle float columns enumerated by tools/gen_float_cols.py via
# DuckDB DESCRIBE into hiselspark/gate_float_cols.py).
# ---------------------------------------------------------------------------

def _nz_df(df: DataFrame) -> DataFrame:
    from pyspark.sql import types as T
    exprs = []
    changed = False
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, T.DoubleType):
            exprs.append((c + F.lit(0.0)).alias(f.name))
            changed = True
        elif isinstance(f.dataType, T.FloatType):
            exprs.append((c + F.lit(0.0).cast("float")).cast("float")
                         .alias(f.name))
            changed = True
        elif (isinstance(f.dataType, T.ArrayType)
              and isinstance(f.dataType.elementType, T.DoubleType)):
            exprs.append(F.transform(c, lambda v: v + F.lit(0.0))
                         .alias(f.name))
            changed = True
        else:
            exprs.append(c)
    return df.select(*exprs) if changed else df


def _nz_query(fn: "Callable[[SparkSession, str], DataFrame]"):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _nz_df(fn(spark, sf_dir))
    wrapped.__name__ = getattr(fn, "__name__", "q")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def _nz_sql(name: str, sql: str) -> str:
    try:
        from hiselspark.gate_float_cols import ORACLE_FLOAT_COLS
    except ImportError:  # mapping not generated yet
        return sql
    cols = ORACLE_FLOAT_COLS.get(name)
    if not cols:
        return sql
    parts = []
    for col, kind in cols:
        q = '"' + col + '"'
        if kind == "list":
            parts.append(f"list_transform({q}, __v -> __v + 0.0) AS {q}")
        elif kind == "float":
            parts.append(f"CAST({q} + 0.0 AS FLOAT) AS {q}")
        else:
            parts.append(f"({q} + 0.0) AS {q}")
    return ("SELECT * REPLACE (" + ", ".join(parts) + ") FROM (\n"
            + sql + "\n) __nz")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def flagship(spark: SparkSession, sf_dir: str = SF_DEFAULT) -> DataFrame:
    """Point-in-time feature selection over the events stream: engineer
    lag/rolling/session features per user timeline, as-of join them
    (strictly backward — zero leakage) onto purchase events, then rank
    features by distributed HSIC-Lasso."""
    from hiselspark.operators.asof import asof_join
    from hiselspark.operators.windows import (rolling_aggregates, sessionize,
                                              with_lags)
    from hiselspark.selection import SparkHSICSelector

    events = _ev(spark, sf_dir).withColumn("value", F.col("value").cast("double"))
    feats = sessionize(events, "user_id", "ts")
    feats = with_lags(feats, "user_id", "ts", ["value"], lags=(1, 2))
    feats = rolling_aggregates(feats, "user_id", "ts",
                               {"value": ["mean", "count"]},
                               window_seconds=3600.0)
    feats = (feats
             .withColumn("hour_of_day",
                         F.hour("ts").cast("double"))
             .withColumn("is_error",
                         (F.col("event_type") == "error").cast("double"))
             .withColumn("sess_pos",
                         F.col("session_id").cast("double")))
    feature_cols = ["value", "value_lag1", "value_lag2",
                    "value_roll_mean_3600s", "value_roll_count_3600s",
                    "hour_of_day", "is_error", "sess_pos"]
    feats = feats.select("user_id", "ts", *feature_cols)

    labels = (events.filter(F.col("event_type") == "purchase")
              .select("user_id", "ts", F.col("value").alias("y")))
    frame = asof_join(labels, feats, on="user_id", left_ts="ts",
                      right_ts="ts", value_cols=feature_cols, strict=True)
    frame = frame.dropna(subset=feature_cols)
    frame = frame.select(
        F.col("y"), *[F.col(c).cast("double").alias(c) for c in feature_cols])
    # production plan: hash-bucketed minibatches — one shuffle of the
    # narrow numeric frame, no global sort, and batch membership is a
    # content hash, so the ranking is deterministic across cluster sizes
    sel = SparkHSICSelector(frame, feature_cols, ["y"])
    res = sel.run(number_of_features=4, minibatch_size=100, mode="hash")
    rows = [
        (name, float(res.hsic_scores[name]), rank + 1,
         name in res.features)
        for rank, name in enumerate(res.hsic_scores
                                    .sort_values(ascending=False).index)
    ]
    return spark.createDataFrame(
        rows, "feature string, hsic_score double, rank int, selected boolean")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, SF_DEFAULT)


# ---------------------------------------------------------------------------
# operator queries (Spark side)
# ---------------------------------------------------------------------------

def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hiselspark.operators.windows import with_lags, with_leads
    ev = _ev(spark, sf_dir)
    out = with_lags(ev, "user_id", "ts", ["value"], lags=(1,))
    out = with_leads(out, "user_id", "ts", ["value"], leads=(1,))
    return out.select(
        "event_id", "user_id",
        _us("ts").alias("ts_us"),
        F.col("value_lag1").alias("lag1"),
        F.col("value_lead1").alias("lead1"))


def q_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hiselspark.operators.windows import forward_fill
    ev = _ev(spark, sf_dir).withColumn(
        "v_or_null",
        F.when(F.col("event_type") != "error", F.col("value")))
    out = forward_fill(ev, "user_id", "ts", ["v_or_null"])
    return out.select(
        "event_id", "user_id",
        F.col("v_or_null_ffill").alias("v_filled"))


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hiselspark.operators.windows import sessionize
    ev = _ev(spark, sf_dir)
    out = sessionize(ev, "user_id", "ts", gap_seconds=1800.0)
    return (out.groupBy("user_id", "session_id")
               .agg(F.count("*").alias("n_events"),
                    F.min(_us("ts")).alias("session_start_us")))


def q_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hiselspark.operators.windows import rolling_aggregates
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = rolling_aggregates(ev, "user_id", "ts",
                             {"cents": ["sum", "count"]},
                             window_seconds=3600.0)
    return out.select(
        "event_id", "user_id",
        F.col("cents_roll_sum_3600s").alias("roll_sum_cents"),
        F.col("cents_roll_count_3600s").alias("roll_n"))


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of: for each purchase, the user's most recent click
    value at-or-before the purchase."""
    from hiselspark.operators.asof import asof_join
    ev = _ev(spark, sf_dir)
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .select("event_id", "user_id", "ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
                .groupBy("user_id", "ts")
                .agg(F.max("value").alias("click_value")))
    out = asof_join(purchases, clicks, on="user_id", left_ts="ts",
                    right_ts="ts", value_cols=["click_value"])
    return out.select(
        "event_id", "user_id",
        _us("ts").alias("ts_us"),
        "click_value",
        _us("__matched_ts").alias("click_ts_us"))


def q_asof_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store enrichment: each purchase picks up the most
    recent click value AND the most recent view value in ONE shuffle +
    ONE WindowExec (K=2 running lasts over a shared window) — vs two
    chained ASOF joins in the oracle."""
    from hiselspark.operators.asof import asof_join_multi
    ev = _ev(spark, sf_dir)
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .select("event_id", "user_id", "ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
                .groupBy("user_id", "ts")
                .agg(F.max("value").alias("cval")))
    views = (ev.filter(F.col("event_type") == "view")
               .groupBy("user_id", "ts")
               .agg(F.max("value").alias("vval")))
    out = asof_join_multi(purchases, {"c": clicks, "v": views},
                          on="user_id", left_ts="ts", right_ts="ts")
    return out.select(
        "event_id", "user_id",
        _us("ts").alias("ts_us"),
        F.col("cval_c").alias("click_value"),
        _us("__matched_ts_c").alias("click_ts_us"),
        F.col("vval_v").alias("view_value"),
        _us("__matched_ts_v").alias("view_ts_us"))


def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of with a 2h tolerance window (stale features rejected)."""
    from hiselspark.operators.asof import asof_join
    ev = _ev(spark, sf_dir)
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .select("event_id", "user_id", "ts"))
    views = (ev.filter(F.col("event_type") == "view")
               .groupBy("user_id", "ts")
               .agg(F.max("value").alias("view_value")))
    out = asof_join(purchases, views, on="user_id", left_ts="ts",
                    right_ts="ts", value_cols=["view_value"],
                    tolerance_seconds=7200.0)
    return out.select("event_id", "user_id", "view_value",
                      _us("__matched_ts").alias("view_ts_us"))


def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of: each purchase picks the click closest
    in absolute time (backward wins ties) — one-shuffle union-window
    plan."""
    from hiselspark.operators.asof import asof_join
    ev = _ev(spark, sf_dir)
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .select("event_id", "user_id", "ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
                .groupBy("user_id", "ts")
                .agg(F.max("value").alias("click_value")))
    out = asof_join(purchases, clicks, on="user_id", left_ts="ts",
                    right_ts="ts", value_cols=["click_value"],
                    direction="nearest")
    return out.select("event_id", "user_id", "click_value",
                      _us("__matched_ts").alias("click_ts_us"))


def q_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    return (ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
              .agg(F.sum("cents").alias("day_cents"),
                   F.count("*").alias("day_n"))
              .select("user_id", _us("day").alias("day_us"),
                      "day_cents", "day_n"))


def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free categorical encodings: each event's event_type is
    encoded by the m-estimate mean (smoothing=10 toward prior=250
    cents) and the occurrence count of STRICTLY-EARLIER same-type
    events — rows at the same microsecond are mutually invisible.
    Target quantized to integer cents so the expanding sums are exact;
    the final ratio is one double division both engines perform on
    identical operands."""
    from hiselspark.operators.encoding import (count_encode_pit,
                                               target_encode_pit)
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = target_encode_pit(ev, "event_type", "cents",
                            prior=250.0, smoothing=10.0, out_col="te")
    out = count_encode_pit(out, "event_type", out_col="ce")
    return out.select("event_id", "user_id", "event_type", "te", "ce")


def q_pit_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free feature scaling + the hashing trick: each event's
    value is z-scored against the mean/std of STRICTLY-EARLIER
    same-type events (the point-in-time twin of a fitted
    StandardScaler — NULL until 2 earlier rows exist), and its
    free-text props column is bucketed by the cross-engine content
    hash (no fitted vocabulary).  Integer-cents expanding sums keep
    both engines on identical doubles through the identical
    mean/variance/sqrt expression tree."""
    from hiselspark.operators.encoding import (expanding_zscore_pit,
                                               hash_bucket)
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = expanding_zscore_pit(ev, "event_type", "cents", out_col="z")
    out = out.withColumn("pbucket", hash_bucket("props", 32, salt=7))
    return out.select("event_id", "event_type", "z", "pbucket")


def q_target_encode_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof (category, time-bucket) twin of target_encode —
    bit-identical by construction (exact integer split sums), checked
    against the SAME oracle."""
    from hiselspark.operators.encoding import (chunked_count_encode,
                                               chunked_target_encode)
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = chunked_target_encode(ev, "event_type", "cents",
                                bucket_seconds=7 * 86400.0,
                                prior=250.0, smoothing=10.0,
                                out_col="te")
    out = chunked_count_encode(out, "event_type",
                               bucket_seconds=7 * 86400.0, out_col="ce")
    return out.select("event_id", "user_id", "event_type", "te", "ce")


def q_pit_zscore_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof twin of the expanding z-score — same oracle."""
    from hiselspark.operators.encoding import (chunked_expanding_zscore,
                                               hash_bucket)
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = chunked_expanding_zscore(ev, "event_type", "cents",
                                   bucket_seconds=7 * 86400.0,
                                   out_col="z")
    out = out.withColumn("pbucket", hash_bucket("props", 32, salt=7))
    return out.select("event_id", "event_type", "z", "pbucket")


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload columns, schema-on-read: the JSON props
    string parsed with a typed schema (from_json — JVM-side, no Python)
    into numeric features (value + equal-width bin), the pattern for
    event properties / EXIF / sidecar metadata columns."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    ev = _ev(spark, sf_dir)
    parsed = ev.withColumn(
        "__p", F.from_json("props",
                           StructType([StructField("k", IntegerType())])))
    return parsed.select(
        "event_id", "event_type",
        F.col("__p.k").cast("long").alias("k"),
        (F.col("__p.k").cast("long") / F.lit(10)).cast("long")
        .alias("k_bin"))


def q_topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc())
    return (ev.withColumn("rk", F.row_number().over(w))
              .filter(F.col("rk") <= 3)
              .select("user_id", "rk", "event_id", "value"))


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cents = lambda c: F.round(F.col(c) * 100).cast("long")  # noqa: E731
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
              .groupBy("l_returnflag", "l_linestatus")
              .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
                   F.sum(cents("l_extendedprice")).alias("sum_base_cents"),
                   F.count("*").alias("count_order"))
              .orderBy("l_returnflag", "l_linestatus"))


def q_broadcast_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with explicit broadcast of the dimensions."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (orders
            .join(F.broadcast(cust),
                  orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation),
                  cust.c_nationkey == nation.n_nationkey)
            .groupBy("n_name")
            .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                  .alias("total_cents"),
                 F.count("*").alias("n_orders")))


def q_caption_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hiselspark.functions.text import token_count
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_calc"),
        token_count("text").cast("int").alias("n_tokens"))


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups on normalized text: canonical doc id +
    group size for every document."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return (docs.withColumn("__n", norm)
                .groupBy("__n")
                .agg(F.min("doc_id").alias("canonical_id"),
                     F.count("*").alias("group_size"))
                .groupBy("group_size")
                .agg(F.count("*").alias("n_groups"))
                .orderBy("group_size"))


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbours of the first 20 vectors
    (vectorized JVM expressions: zip_with + aggregate)."""
    from pyspark.sql import Window
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    probes = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("probe_id"), F.col("v").alias("p"))
    dot = F.aggregate(F.zip_with("p", "v", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x))
    pairs = (probes.crossJoin(e)
             .filter(F.col("probe_id") != F.col("vec_id"))
             .withColumn("cos", dot / (norm(F.col("p")) * norm(F.col("v")))))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc())
    return (pairs.withColumn("rk", F.row_number().over(w))
                 .filter(F.col("rk") <= 5)
                 .select("probe_id", "rk", "vec_id",
                         F.round("cos", 6).alias("cos_sim")))


def q_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate canonicalization keeping the HIGHEST-quality copy per
    normalized-content group (ties -> lowest doc_id): survivor ids +
    the per-group size, quality = doc length in chars."""
    from hiselspark.operators.dedup import keep_best_duplicate
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .withColumn("qual", F.length("text").cast("long")))
    out = keep_best_duplicate(docs, "doc_id", "text", "qual")
    return out.select("doc_id", "qual").orderBy("doc_id")


def q_rank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank/quantile normalization of the event value (cents) to (0,1)
    via the midpoint empirical CDF — count-table + join-back, no
    global row sort."""
    from hiselspark.operators.encoding import rank_normalize
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = rank_normalize(ev, "cents", out_col="u")
    return out.select("event_id", F.round("u", 6).alias("u"))


def q_feature_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-trick crossing of event_type × hour-of-day into 64
    buckets (portable polynomial hash — the oracle replays the exact
    arithmetic); per bucket: row count + distinct crossed keys."""
    from hiselspark.operators.encoding import feature_cross
    ev = _ev(spark, sf_dir).withColumn(
        "hour",
        F.pmod(F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                       / 3_600_000_000), 24).cast("long"))
    out = feature_cross(ev, ["event_type", "hour"], n_buckets=64)
    return (out.groupBy("cross_bucket")
               .agg(F.count(F.lit(1)).alias("n_events"),
                    F.countDistinct("__cross_key").alias("n_keys")))


def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of four lineitem measures from ONE
    pass of exact integer sufficient statistics (quantity, price in
    dollars, discount/tax in basis points)."""
    from hiselspark.operators.profile import corr_matrix
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select(F.round("l_quantity").cast("long").alias("qty"),
                  F.round("l_extendedprice").cast("long").alias("price"),
                  F.round(F.col("l_discount") * 10000).cast("long")
                   .alias("disc_bp"),
                  F.round(F.col("l_tax") * 10000).cast("long")
                   .alias("tax_bp")))
    out = corr_matrix(li, ["qty", "price", "disc_bp", "tax_bp"])
    return out.select("col_x", "col_y", "n",
                      F.round("corr", 6).alias("corr"))


def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit Benford distribution of lineitem prices (cents):
    observed counts/shares vs log10(1+1/d) and χ² contributions."""
    from hiselspark.operators.profile import benford_digits
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select(F.round(F.col("l_extendedprice") * 100).cast("long")
                   .alias("cents")))
    out = benford_digits(li, "cents")
    return out.select("digit", "obs",
                      F.round("share", 6).alias("share"),
                      F.round("benford_p", 6).alias("benford_p"),
                      F.round("chi2", 6).alias("chi2"))


def q_ma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average crossover events per user: 6h vs 48h trailing
    means of the event value, cross-up/cross-down flags from one lag
    of the comparison sign — indicators and detector share the single
    entity shuffle."""
    from hiselspark.operators.windows import (crossover_events,
                                              rolling_aggregates)
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    d = rolling_aggregates(ev, "user_id", "ts", {"cents": ["mean"]},
                           window_seconds=21600.0)
    d = rolling_aggregates(d, "user_id", "ts", {"cents": ["mean"]},
                           window_seconds=172800.0)
    out = crossover_events(d, "user_id", "ts",
                           "cents_roll_mean_21600s",
                           "cents_roll_mean_172800s",
                           tiebreak=("event_id",))
    return out.select("event_id", "cross_up", "cross_down")


def q_rolling_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h Shannon entropy of each user's event-type mix —
    behavioral diversity; conditional counts in one WindowExec, terms
    in fixed category order."""
    from hiselspark.operators.windows import rolling_entropy
    ev = _ev(spark, sf_dir)
    out = rolling_entropy(
        ev, "user_id", "ts", "event_type", 86400.0,
        categories=["click", "error", "purchase", "signup", "view"])
    return out.select("event_id",
                      F.round("roll_entropy", 6).alias("h"))


def q_ppmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level PPMI between the top-32 caption-corpus tokens —
    the count matrix behind classical distributional embeddings;
    exact counts, ln of exact ratios."""
    from hiselspark.operators.cooccur import ppmi_cooccurrence
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = ppmi_cooccurrence(docs, "doc_id", "text", vocab_size=32)
    return out.select("tok_a", "tok_b", "nab", "na", "nb",
                      F.round("ppmi", 6).alias("ppmi"))


def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency table of session shapes: each 30-min session reduced
    to its first 4 event types, counted corpus-wide (paths seen in ≥ 2
    sessions)."""
    from hiselspark.operators.windows import session_paths
    ev = _ev(spark, sf_dir)
    out = session_paths(ev, "user_id", "ts", "event_type",
                        gap_seconds=1800.0, max_len=4,
                        min_sessions=2, tiebreak=("event_id",))
    return out.select("path", "n_sessions", "n_entities")


def q_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition table of event types along user
    timelines: exact counts + row-normalized P(next|cur)."""
    from hiselspark.operators.cooccur import markov_transitions
    ev = _ev(spark, sf_dir)
    out = markov_transitions(ev, "user_id", "ts", "event_type",
                             tiebreak=("event_id",))
    return out.select("cur", "nxt", "n", F.round("p", 6).alias("p"))


def q_roc_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC polyline of the clamped-cents score vs the
    value>10.00 label: one point per distinct threshold."""
    from hiselspark.operators.evaluate import roc_curve
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    scored = ev.withColumn(
        "score", F.least(F.col("cents"), F.lit(2000)).cast("long")
    ).withColumn("lbl", (F.col("cents") > 1000).cast("long"))
    out = roc_curve(scored, "score", "lbl")
    return out.select("threshold", "tp", "fp",
                      F.round("tpr", 6).alias("tpr"),
                      F.round("fpr", 6).alias("fpr"))


def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of total event value (cents) across users —
    the 'is the corpus dominated by a few sources' screen."""
    from hiselspark.operators.evaluate import gini_concentration
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = gini_concentration(ev, "user_id", "cents")
    return out.select(F.round("gini", 6).alias("gini"), "n_groups",
                      "total")


def q_ols_detrend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIT expanding-OLS detrend: each event's value vs this user's
    own strictly-before trend (x = hours since the user's first seen
    event) — prediction and residual at decision time."""
    from pyspark.sql import Window
    from hiselspark.operators.windows import (expanding_ols_resid,
                                              ts_seconds)
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    sec = F.floor(ts_seconds("ts")).cast("long")
    w = (Window.partitionBy("user_id")
               .orderBy((ts_seconds("ts") * 1_000_000).cast("long"))
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d = ev.withColumn("sec", sec).withColumn(
        "xh", F.floor((F.col("sec") - F.min("sec").over(w))
                      / F.lit(3600)).cast("long"))
    out = expanding_ols_resid(d, "user_id", "ts", "xh", "cents")
    return out.select("event_id",
                      F.round("ols_pred", 6).alias("pred"),
                      F.round("ols_resid", 6).alias("resid"))


def q_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrievers over the same probes —
    exact cosine top-20 and raw dot-product top-20 — fused with the
    published k=60 and re-ranked; contributions folded in sorted order
    (deterministic-float convention)."""
    from pyspark.sql import Window
    from hiselspark.operators.similarity import (_dot, _norm,
                                                 cosine_topk, rrf_fuse)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 20)
    cos = cosine_topk(probes, emb, k=20)
    p = probes.select(F.col("vec_id").alias("probe_id"),
                      F.col("embedding").cast("array<double>")
                       .alias("p"))
    c = emb.select("vec_id",
                   F.col("embedding").cast("array<double>").alias("v"))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("dot").desc(), F.col("vec_id").asc())
    dotr = (p.crossJoin(c)
             .filter(F.col("probe_id") != F.col("vec_id"))
             .withColumn("dot", _dot("p", "v"))
             .withColumn("rk", F.row_number().over(w))
             .filter(F.col("rk") <= 20))
    out = rrf_fuse([cos, dotr], k=60, topk=5)
    return out.select("probe_id", "rk", "doc_id",
                      F.round("rrf", 6).alias("rrf"), "n_systems")


def q_group_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend of event value (cents) against hours since
    the user's first event — slope/intercept/r² from one pass of
    exact integer sums."""
    from pyspark.sql import Window
    from hiselspark.operators.regress import group_ols
    from hiselspark.operators.windows import ts_seconds
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    w = Window.partitionBy("user_id")
    sec = F.floor(ts_seconds("ts")).cast("long")
    d = ev.withColumn(
        "xh", F.floor((sec - F.min(sec).over(w)) / F.lit(3600))
        .cast("long"))
    out = group_ols(d, "user_id", "xh", "cents")
    return out.select("user_id", "n",
                      F.round("slope", 6).alias("slope"),
                      F.round("intercept", 6).alias("intercept"),
                      F.round("r2", 6).alias("r2"))


def q_perm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization (permutation) test: is the mean event value of
    'purchase' events different from the rest?  200 counter-hash
    relabelings in one scan; add-one two-sided p-value.  Runs the
    cross-engine 'poly' hash mode, so the DuckDB oracle replays every
    pseudo-label draw and replicate — nothing pinned."""
    from hiselspark.operators.bootstrap import (
        permutation_test_diff_means)
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    ).withColumn("grp", (F.col("event_type") == "purchase")
                 .cast("long"))
    out = permutation_test_diff_means(ev, "cents", "grp", "event_id",
                                      n_permutations=200, seed=11,
                                      hash="poly")
    return out.select(F.round("obs_diff", 6).alias("obs_diff"),
                      F.round("p_value", 6).alias("p_value"),
                      "n_permutations")


def q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5%-trimmed mean of the event value (cents): tails dropped
    by count-table interval arithmetic (ties at the boundary handled
    exactly), no sort of the data rows."""
    from hiselspark.operators.profile import trimmed_mean
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = trimmed_mean(ev, "cents", 0.05)
    return out.select(F.round("trimmed_mean", 6).alias("tmean"),
                      "n_used", "n_trimmed_each_side",
                      F.round("raw_mean", 6).alias("raw_mean"))


def q_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5%-winsorized mean of the event value: tails clamped to
    the boundary values via count-table arithmetic."""
    from hiselspark.operators.profile import winsorized_mean
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = winsorized_mean(ev, "cents", 0.05)
    return out.select(F.round("winsorized_mean", 6).alias("wmean"),
                      "lo_clamp", "hi_clamp", "n")


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS statistic of the event-value distribution,
    first two weeks vs the rest (binning-free drift metric); the sup of the empirical CDF gap plus where it's
    attained."""
    from hiselspark.operators.drift import ks_statistic
    from hiselspark.operators.windows import ts_seconds
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    split = F.lit("2024-01-15 00:00:00").cast("timestamp")
    out = ks_statistic(ev, "cents",
                       F.col("ts").cast("timestamp") < split)
    return out.select(F.round("ks", 6).alias("ks"), "at_value",
                      "n_ref", "n_cur")


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle-containment pairs (quote / subset
    detection): pairs whose smaller shingle set is >= 60% contained in
    the other — catches verbatim-inclusion duplicates whose Jaccard
    stays low when lengths differ."""
    from hiselspark.operators.dedup import containment_pairs
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = containment_pairs(docs, "doc_id", "text", threshold=0.6)
    return out.select("a", "b", "n_common", "n_a", "n_b",
                      F.round("c_ab", 6).alias("c_ab"),
                      F.round("c_ba", 6).alias("c_ba"))


def q_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-Wasserstein (earth-mover) drift of the event-value
    distribution, first two weeks vs the rest — complements KS (sup
    norm) by weighting how FAR the mass moved.  Integer count-table
    arithmetic, one division at the end."""
    from hiselspark.operators.drift import wasserstein_1
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    split = F.lit("2024-01-15 00:00:00").cast("timestamp")
    out = wasserstein_1(ev, "cents",
                        F.col("ts").cast("timestamp") < split)
    return out.select(F.round("w1", 6).alias("w1"), "n_ref", "n_cur")


def _mi_feature_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six deterministic discrete features + a label over events, all
    pure integer arithmetic in (cents, ts, event_type) so a second
    engine reproduces every value exactly.  f_seven2/f_seven4 share the
    label's ``cents DIV 7`` driver (high relevance, high mutual
    redundancy) — exactly the structure mRMR exists to untangle."""
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    return ev.select(
        (F.col("cents") % 2).alias("f_parity"),
        (F.col("cents") % 5).alias("f_mod5"),
        (F.expr("cents DIV 7") % 2).alias("f_seven2"),
        (F.expr("cents DIV 7") % 4).alias("f_seven4"),
        (F.expr("unix_micros(cast(ts as timestamp)) DIV 3600000000")
         % 24).alias("f_hour"),
        F.length("event_type").alias("f_typelen"),
        (F.expr("cents DIV 7") % 3).alias("y"))


_MI_FEATURES = ["f_parity", "f_mod5", "f_seven2", "f_seven4",
                "f_hour", "f_typelen"]


def q_info_gain_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information-gain (= exact discrete MI) ranking of six derived
    event features against a derived label — the count-based sibling
    of the reference's ksgmi preselection, one unpivoted count shuffle
    for all features at once."""
    from hiselspark.operators.feature_rank import info_gain_rank
    out = info_gain_rank(_mi_feature_frame(spark, sf_dir),
                         _MI_FEATURES, "y")
    return out.select("feature", "n",
                      F.round("mi", 6).alias("mi"), "rank")


def q_mrmr_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy mRMR over the same feature frame: max relevance minus
    mean redundancy per step, k=4.  The DuckDB oracle replays the
    ENTIRE selection — every MI, every fold, every argmax — from the
    parquet via unrolled CTE steps; nothing is pinned."""
    from hiselspark.operators.feature_rank import mrmr_select
    out = mrmr_select(_mi_feature_frame(spark, sf_dir),
                      _MI_FEATURES, "y", k=4)
    return out.select("rk", "feature",
                      F.round("relevance", 6).alias("relevance"),
                      F.round("redundancy", 6).alias("redundancy"),
                      F.round("score", 6).alias("score"))


def q_cmim_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy CMIM (Fleuret 2004) over the same feature frame:
    max of min-conditional-MI-given-selected per step, k=4 — the
    sharper redundancy test next to mRMR's mean penalty.  The oracle
    replays every conditional MI (3-way count cells, sorted fold) and
    every min/argmax step; nothing is pinned."""
    from hiselspark.operators.feature_rank import cmim_select
    out = cmim_select(_mi_feature_frame(spark, sf_dir),
                      _MI_FEATURES, "y", k=4)
    return out.select("rk", "feature",
                      F.round("relevance", 6).alias("relevance"),
                      F.round("cmim_score", 6).alias("cmim_score"))


def q_hsic_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact delta-kernel HSIC-b feature ranking over the derived
    event features — the count-closed form of the reference's
    featurewise HSIC scores; the oracle recomputes the statistic
    itself from integer contingency sums (no pinning)."""
    from hiselspark.operators.feature_rank import hsic_rank
    out = hsic_rank(_mi_feature_frame(spark, sf_dir),
                    _MI_FEATURES, "y")
    return out.select("feature", "n",
                      F.round("hsic", 9).alias("hsic"), "rank")


def q_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAVA) calibration of a derived response over a
    derived score, per event type — the oracle PROVES the fit in
    exact integer arithmetic via the greatest-convex-minorant hull
    characterization and replays each fitted value's one division."""
    from hiselspark.operators.isotonic import isotonic_fit
    ev = (_ev(spark, sf_dir)
          .filter(F.col("event_id") % 37 == 0)
          .withColumn("cents", F.abs(F.round(F.col("value") * 100)
                                     .cast("long"))))
    df = ev.select("event_type",
                   (F.col("cents") % 97).alias("score"),
                   "event_id",
                   (F.col("cents") % 5).alias("resp"))
    out = isotonic_fit(df, "event_type", "score", "event_id", "resp")
    return out.select(F.col("group").alias("event_type"), "idx", "x",
                      "y", F.round("fitted", 6).alias("fitted"))


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last-touch attribution of purchases to view/click touches
    within a 7-day window, one entity shuffle with RANGE-framed
    struct min/max — the oracle independently joins every purchase to
    its window of touches and picks argmin/argmax."""
    from hiselspark.operators.attribution import touch_attribution
    ev = _ev(spark, sf_dir)
    out = touch_attribution(
        ev, "user_id", "ts", "event_id",
        is_touch=F.col("event_type").isin("view", "click"),
        is_conversion=F.col("event_type") == "purchase",
        horizon_seconds=7 * 86400)
    return out.select("entity", "conv_id", "conv_t_us",
                      "first_touch_id", "last_touch_id",
                      "last_latency_us")


def q_hsic_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate delta-kernel HSIC: feature SUBSETS jointly encoded
    as mixed-radix codes (the reference's `_delta_multivariate`,
    kernels.py:130-147) and scored with the same count-closed exact
    HSIC — the statistic a greedy subset search maximizes.  The oracle
    recomputes codes and statistic from the parquet."""
    from hiselspark.operators.feature_rank import delta_hsic_table
    df = _mi_feature_frame(spark, sf_dir)
    # radices: f_parity in {0,1} (2), f_mod5 in 0..4 (5),
    # f_seven2 in {0,1} (2), f_seven4 in 0..3 (4)
    subsets = [
        ("parity_mod5", F.col("f_parity") * 5 + F.col("f_mod5")),
        ("seven2_seven4", F.col("f_seven2") * 4 + F.col("f_seven4")),
        ("parity_seven2", F.col("f_parity") * 2 + F.col("f_seven2")),
    ]
    frames = [
        df.select(F.lit(name).alias("subset"),
                  code.cast("long").alias("code"), "y")
        for name, code in subsets
    ]
    longd = frames[0]
    for f in frames[1:]:
        longd = longd.unionByName(f)
    out = delta_hsic_table(longd, "code", "y", key_cols=["subset"])
    return out.select("subset", "n",
                      F.round("hsic", 9).alias("hsic"))


def q_hsic_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stability selection over the exact delta-HSIC ranking: 8
    Poisson counter-hash resamples, top-3 membership per replicate,
    exact stability fractions — the oracle regrows every resample's
    weighted contingency table and replays all 8 rankings."""
    from hiselspark.operators.feature_rank import hsic_stability
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    df = ev.select(
        "event_id",
        (F.col("cents") % 2).alias("f_parity"),
        (F.col("cents") % 5).alias("f_mod5"),
        (F.expr("cents DIV 7") % 2).alias("f_seven2"),
        (F.expr("cents DIV 7") % 4).alias("f_seven4"),
        (F.expr("unix_micros(cast(ts as timestamp)) DIV 3600000000")
         % 24).alias("f_hour"),
        F.length("event_type").alias("f_typelen"),
        (F.expr("cents DIV 7") % 3).alias("y"))
    out = hsic_stability(df, _MI_FEATURES, "y", "event_id",
                         top_m=3, n_replicates=8)
    return out.select("feature", "n_selected", "n_replicates",
                      F.round("stability", 6).alias("stability"))


def q_hsic_perm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation independence test on the exact delta-kernel HSIC
    (20 Carter-Wegman permutations shared as literals): a dependent
    pair and an independent pair over the same bounded event slice —
    the oracle rebuilds every permutation, every permuted statistic
    and the exact p-values."""
    from hiselspark.operators.feature_rank import hsic_perm_test
    ev = (_ev(spark, sf_dir)
          .filter(F.col("event_id") % 11 == 0)
          .withColumn("cents", F.abs(F.round(F.col("value") * 100)
                                     .cast("long"))))
    dep = ev.select("event_id",
                    (F.expr("cents DIV 7") % 2).alias("x"),
                    (F.expr("cents DIV 7") % 3).alias("y"))
    ind = ev.select("event_id",
                    (F.col("cents") % 2).alias("x"),
                    (F.col("cents") % 5).alias("y"))
    a = (hsic_perm_test(dep, "x", "y", "event_id")
         .withColumn("pair", F.lit("dependent")))
    b = (hsic_perm_test(ind, "x", "y", "event_id")
         .withColumn("pair", F.lit("independent")))
    out = a.unionByName(b)
    return out.select("pair", "n", F.round("hsic", 9).alias("hsic"),
                      "n_perms", "n_ge",
                      F.round("p_value", 6).alias("p_value"))


def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test per user over the trailing 24 events:
    exact integer S and tie-corrected 18·var(S), continuity-corrected
    z — the oracle replays every pair, every tie group and the z
    arithmetic from the parquet."""
    from hiselspark.operators.trend import mann_kendall
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    out = mann_kendall(ev, "user_id", "ts", "event_id", "cents",
                       last_k=24)
    return out.select(F.col("entity").alias("user_id"), "n", "s_stat",
                      "var18", F.round("z", 6).alias("z"))


def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust slope per user over the trailing 24 events
    (cents per second): median of all pairwise slopes, every division
    and the sorted-list midpoint replayed exactly by the oracle."""
    from hiselspark.operators.trend import theil_sen
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    out = theil_sen(ev, "user_id", "ts", "event_id", "cents",
                    last_k=24)
    return out.select(F.col("entity").alias("user_id"), "n",
                      "n_pairs", F.round("slope", 6).alias("slope"))


def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single mean-shift change point per user (binary-segmentation
    step): argmax of the SSE-reduction gain over prefix splits, exact
    integer prefix sums, bit-identical candidate scores — the oracle
    replays every candidate and the tie rule."""
    from hiselspark.operators.trend import changepoint_mean
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    out = changepoint_mean(ev, "user_id", "ts", "event_id", "cents")
    # gain is emitted UNROUNDED: the raw doubles are bit-identical
    # across engines (identical expression tree over exact ints), but
    # round(x, 6) itself is NOT engine-portable at gain's magnitude
    # (~1e8 at sf0.1: Spark rounds via decimal-exact HALF_UP, DuckDB
    # through a float multiply - 17/1500 last-ulp diffs measured)
    return out.select(F.col("entity").alias("user_id"), "n",
                      "split_idx", F.col("gain"),
                      F.round("left_mean", 6).alias("left_mean"),
                      F.round("right_mean", 6).alias("right_mean"))


def q_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolic words per user (PAA means -> z-score quartile
    letters): exact integer segment split and variance numerator, one
    fixed expression tree for the z binning — the oracle rebuilds
    every word letter-by-letter from the parquet."""
    from hiselspark.operators.tsprofile import sax_symbols
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    out = sax_symbols(ev, "user_id", "ts", "event_id", "cents",
                      n_segments=8)
    return out.select(F.col("entity").alias("user_id"), "n", "sax")


def q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter linkage weights: customers vs a deterministic
    perturbed twin (reversed names on k%3, shifted balances on k%5,
    relabeled segments on k%7), candidate pairs blocked on nation,
    exact add-one m/u counts and ln(m/u) weights — the oracle replays
    the perturbation, the blocking, every count and the ln."""
    from hiselspark.operators.linkage import fs_weights
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    base = cust.select(
        "c_custkey", "c_nationkey", "c_name", "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"))
    twin = base.select(
        F.col("c_custkey").alias("t_custkey"),
        F.col("c_nationkey").alias("t_nationkey"),
        F.when(F.col("c_custkey") % 3 == 0, F.reverse("c_name"))
         .otherwise(F.col("c_name")).alias("t_name"),
        F.when(F.col("c_custkey") % 7 == 0, F.lit("OTHER"))
         .otherwise(F.col("c_mktsegment")).alias("t_seg"),
        (F.col("cents")
         + F.when(F.col("c_custkey") % 5 == 0, 100).otherwise(0))
        .alias("t_cents"))
    pairs = base.join(twin,
                      base.c_nationkey == twin.t_nationkey)
    out = fs_weights(
        pairs,
        agreements=[
            ("name", F.col("c_name") == F.col("t_name")),
            ("segment", F.col("c_mktsegment") == F.col("t_seg")),
            ("balance", F.col("cents") == F.col("t_cents")),
        ],
        is_match=F.col("c_custkey") == F.col("t_custkey"))
    return out.select("field", "m_num", "m_den", "u_num", "u_den",
                      F.round("weight", 6).alias("weight"))


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): 4-way join with a
    3-month order window and returnflag filter pushed to the scans,
    exact-cents revenue per customer, top-20 with deterministic
    tie-break."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp")
    rev = (F.round(F.col("l_extendedprice") * 100).cast("long")
           * (F.lit(100) - F.round(F.col("l_discount") * 100)
              .cast("long")))
    out = (orders
           .filter((F.col("o_orderdate").cast("timestamp") >= lo)
                   & (F.col("o_orderdate").cast("timestamp") < hi))
           .join(li.filter(F.col("l_returnflag") == "R"),
                 F.col("l_orderkey") == F.col("o_orderkey"))
           .join(cust, F.col("c_custkey") == F.col("o_custkey"))
           .join(F.broadcast(nation),
                 F.col("n_nationkey") == F.col("c_nationkey"))
           .groupBy("c_custkey", "c_name", "n_name")
           .agg(F.sum(rev).alias("revenue_e4"),
                F.round(F.max("c_acctbal") * 100).cast("long")
                 .alias("acctbal_cents"))
           .orderBy(F.col("revenue_e4").desc(), F.col("c_custkey"))
           .limit(20))
    return out.select("c_custkey", "c_name", "n_name", "revenue_e4",
                      "acctbal_cents")


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promo-class revenue share): one-month
    shipdate window, broadcast part join, CASE aggregation — the
    ratio stays exact integers until one division."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    lo = F.lit("1996-03-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp")
    rev = (F.round(F.col("l_extendedprice") * 100).cast("long")
           * (F.lit(100) - F.round(F.col("l_discount") * 100)
              .cast("long")))
    j = (li.filter((F.col("l_shipdate").cast("timestamp") >= lo)
                   & (F.col("l_shipdate").cast("timestamp") < hi))
         .join(F.broadcast(part),
               F.col("p_partkey") == F.col("l_partkey")))
    agg = j.agg(
        F.sum(F.when(F.col("p_type") == "ECONOMY", rev)
              .otherwise(F.lit(0))).alias("promo_e4"),
        F.sum(rev).alias("total_e4"))
    ratio = (F.lit(100.0) * F.col("promo_e4").cast("double")
             / F.col("total_e4").cast("double"))
    return agg.select("promo_e4", "total_e4",
                      F.round(ratio, 6).alias("promo_pct"))


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """45-core of the folded order↔part graph by 6 bounded peeling
    rounds (converges in 4 on this family) — the oracle unrolls the
    identical rounds as chained CTEs."""
    from hiselspark.operators.graph import kcore
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = li.select((F.col("l_orderkey") % 2000).alias("src"),
                      (F.col("l_partkey") % 2000).alias("dst"))
    return kcore(edges, k=45, rounds=6)


def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the folded order↔part graph — exact
    integer degree sums over the symmetric edge list, one float
    expression; the oracle replays canonicalization, degrees and the
    Pearson form."""
    from hiselspark.operators.graph import degree_assortativity
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = li.select((F.col("l_orderkey") % 2000).alias("src"),
                      (F.col("l_partkey") % 2000).alias("dst"))
    out = degree_assortativity(edges)
    return out.select("n_edges", F.round("r", 6).alias("r"))


def q_ks_by_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift dashboard: exact two-sample KS for all six derived event
    features in ONE unpivoted count shuffle, periods split at
    2024-01-15 — the oracle replays every feature's distinct-value
    table, cumulative gap and argmax."""
    from hiselspark.operators.drift import ks_by_feature
    # _mi_feature_frame drops ts, so derive features + ref together
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    base = ev.select(
        (F.col("cents") % 2).alias("f_parity"),
        (F.col("cents") % 5).alias("f_mod5"),
        (F.expr("cents DIV 7") % 2).alias("f_seven2"),
        (F.expr("cents DIV 7") % 4).alias("f_seven4"),
        (F.expr("unix_micros(cast(ts as timestamp))"
                " DIV 3600000000") % 24).alias("f_hour"),
        F.length("event_type").alias("f_typelen"),
        (F.col("ts").cast("timestamp")
         < F.lit("2024-01-15 00:00:00").cast("timestamp"))
        .alias("__ref"))
    out = ks_by_feature(base, _MI_FEATURES, F.col("__ref"))
    return out.select("feature", F.round("ks", 6).alias("ks"),
                      "at_value", "n_ref", "n_cur")


def q_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Carter-Wegman negative sampling over order→part
    positives (3 corruptions per positive, collision-bumped) — every
    draw replayed arithmetically by the oracle from the shared
    constants."""
    from hiselspark.operators.sampling import negative_samples
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .filter(F.col("l_orderkey") <= 3000))
    pos = li.select(F.col("l_orderkey").alias("u"),
                    (F.col("l_partkey") % 2000).alias("it")).distinct()
    out = negative_samples(pos, "u", "it", n_items=2000, k=3)
    return out.select(F.col("user").alias("u"),
                      F.col("item").alias("it"), "slot", "neg_item")


def q_hll_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ integration contract: per event type, the exact
    distinct-user count (oracle-checked value) next to a boolean
    asserting Spark's approx_count_distinct(rsd=0.05) landed within
    the 5% envelope.  The approximate digest itself is not portable
    across engines — the honest cross-engine claim is the exact count
    plus the bounded-error flag (HLL merge is commutative, so the
    flag is layout-independent)."""
    ev = _ev(spark, sf_dir)
    # rsd is a STANDARD DEVIATION: at 0.05 the estimate misses the 5%
    # envelope ~1/3 of the time once cardinalities leave the exact
    # linear-counting range (hit at sf0.1) — sketch at rsd=0.01 so
    # the advertised 5% contract holds with ~5-sigma margin
    out = (ev.groupBy("event_type")
           .agg(F.countDistinct("user_id").alias("exact_users"),
                F.approx_count_distinct("user_id", 0.01)
                 .alias("__approx")))
    ok = (F.abs(F.col("__approx") - F.col("exact_users"))
          <= F.col("exact_users") * F.lit(0.05))
    return out.select("event_type", "exact_users",
                      ok.alias("approx_within_5pct"))


def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurizer: signed 16-bucket counts of each
    user's event-type stream via the portable polynomial hash + CW
    mixes — every bucket, sign and count replayed by the oracle."""
    from hiselspark.operators.encoding import feature_hashing
    ev = _ev(spark, sf_dir)
    out = feature_hashing(ev, "user_id", "event_type", n_dims=16)
    return out.select(F.col("entity").alias("user_id"), "bucket",
                      "signed_count")


def q_best_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-F1 operating point from exact suffix-sum counts over the
    distinct-score table (ties to the highest threshold) — the oracle
    replays every candidate's confusion counts and the argmax."""
    from hiselspark.operators.evaluate import best_f1_threshold
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    df = ev.select((F.col("cents") % 97).alias("score"),
                   ((F.expr("cents DIV 7") % 3) == 0).cast("long")
                   .alias("lbl"))
    out = best_f1_threshold(df, "score", "lbl")
    return out.select("threshold", "tp", "fp", "fn",
                      F.round("precision", 6).alias("precision"),
                      F.round("recall", 6).alias("recall"),
                      F.round("f1", 6).alias("f1"))


def q_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal interval per event type at alpha = 0.1:
    even event ids calibrate (exact fraction mean predictor + exact
    order-statistic threshold on the residual count table), odd ids
    test coverage — every count, the integer-ceiling k and the
    threshold replay in SQL."""
    from hiselspark.operators.conformal import split_conformal
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    out = split_conformal(ev, "event_type",
                          F.col("event_id") % 2 == 0, "cents")
    return out.select("event_type", "n_cal", "n_test", "k",
                      "q_scaled", F.round("q", 6).alias("q"),
                      "covered", F.round("coverage", 6)
                      .alias("coverage"))


def q_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two derived labelings of events — exact
    integers until one division; the oracle replays the confusion
    grid, marginals and the (N·agree − cross)/(N² − cross) form."""
    from hiselspark.operators.evaluate import cohen_kappa
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    df = ev.select((F.col("cents") % 4).alias("r1"),
                   (F.expr("cents DIV 3") % 4).alias("r2"))
    out = cohen_kappa(df, "r1", "r2")
    return out.select("n", "n_agree", "chance_cross",
                      F.round("kappa", 6).alias("kappa"))


def q_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-dimensional Pareto front (skyline) of users maximizing
    (max event cents, event count) — two-phase distributed skyline
    (partition-local candidates, then a windowed global pass); the
    oracle is an independent NOT-EXISTS dominance check."""
    from hiselspark.operators.skyline import pareto_front
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    agg = (ev.groupBy("user_id")
           .agg(F.max("cents").alias("max_cents"),
                F.count(F.lit(1)).alias("n_events")))
    return pareto_front(agg, "max_cents", "n_events",
                        keep_cols=["user_id"])


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count of the folded order↔part graph
    (keys mod 2000) via degree-oriented wedge closing — the oracle
    brute-forces all a<b<c edge triples from the parquet."""
    from hiselspark.operators.graph import triangle_count
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = li.select((F.col("l_orderkey") % 2000).alias("src"),
                      (F.col("l_partkey") % 2000).alias("dst"))
    return triangle_count(edges)


def q_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality strength (ANOVA eta-squared) per user —
    exact per-phase integer sums, sorted-phase float fold; the oracle
    replays every phase partial and both divisions."""
    from hiselspark.operators.tsprofile import seasonality_strength
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    out = seasonality_strength(ev, "user_id", "ts", "cents")
    return out.select(F.col("entity").alias("user_id"), "n",
                      "n_phases", F.round("eta2", 6).alias("eta2"))


def q_ts_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tsfresh-style per-user series features in one entity shuffle —
    abs energy, mean abs change, peaks, exact above-mean counts/runs,
    argmax positions; the oracle replays each from the parquet with
    independent window SQL."""
    from hiselspark.operators.tsprofile import ts_profile
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    out = ts_profile(ev, "user_id", "ts", "event_id", "cents")
    return out.select(
        F.col("entity").alias("user_id"), "n", "abs_energy",
        F.round("mean_abs_change", 6).alias("mean_abs_change"),
        "n_peaks", "count_above_mean", "longest_above",
        F.col("first_max_idx").cast("long").alias("first_max_idx"),
        F.col("last_max_idx").cast("long").alias("last_max_idx"))


def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter-based Poisson bootstrap: 95% CI for the mean event
    value (cents) from 100 one-pass replicates.  Runs the cross-engine
    'poly' hash mode (Carter-Wegman counter draws), so the DuckDB
    oracle replays the ENTIRE bootstrap — every weight, replicate mean
    and percentile — from the parquet; nothing is pinned."""
    from hiselspark.operators.bootstrap import poisson_bootstrap_mean
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = poisson_bootstrap_mean(ev, "cents", "event_id",
                                 n_replicates=100, seed=7, hash="poly")
    return out.select(F.round("point", 6).alias("point"),
                      F.round("lo", 6).alias("lo"),
                      F.round("hi", 6).alias("hi"),
                      "n_replicates")


def q_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval quality of the raw dot-product ranking against the
    exact cosine top-5 truth set, per probe: recall@10, precision@10,
    MRR — the grading harness every ANN index here is judged by."""
    from pyspark.sql import Window
    from hiselspark.operators.evaluate import retrieval_metrics
    from hiselspark.operators.similarity import _dot, cosine_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 20)
    truth = cosine_topk(probes, emb, k=5)
    p = probes.select(F.col("vec_id").alias("probe_id"),
                      F.col("embedding").cast("array<double>")
                       .alias("p"))
    c = emb.select("vec_id",
                   F.col("embedding").cast("array<double>").alias("v"))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("dot").desc(), F.col("vec_id").asc())
    pred = (p.crossJoin(c)
             .filter(F.col("probe_id") != F.col("vec_id"))
             .withColumn("dot", _dot("p", "v"))
             .withColumn("rk", F.row_number().over(w))
             .filter(F.col("rk") <= 10))
    out = retrieval_metrics(pred, truth, k=10)
    return out.select("probe_id", "n_rel", "n_hit",
                      F.round("recall_at_10", 6).alias("recall"),
                      F.round("precision_at_10", 6).alias("precision"),
                      F.round("mrr", 6).alias("mrr"))


def q_auc_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC per epoch-week: the model-degradation trend view,
    all periods in one pass of the (period, score) count table."""
    from hiselspark.operators.evaluate import auc_by_period
    from hiselspark.operators.windows import ts_seconds
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    scored = (ev.withColumn("score",
                            F.least(F.col("cents"), F.lit(2000))
                            .cast("long"))
                .withColumn("lbl", (F.col("cents") > 1000).cast("long"))
                .withColumn("week",
                            F.floor(ts_seconds("ts") / 604800.0)
                            .cast("long")))
    out = auc_by_period(scored, "score", "lbl", "week")
    return out.select("week", F.round("auc", 6).alias("auc"),
                      "n_pos", "n_neg")


def q_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier time-to-next-event curves per event_type:
    durations in whole hours, right-censored at 24h (and at each
    user's last event) — at-risk counts exact, survival as the
    deterministic ordered product."""
    from pyspark.sql import Window
    from hiselspark.operators.survival import km_curve
    from hiselspark.operators.windows import ts_seconds
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lead(ts_seconds("ts")).over(w) - ts_seconds("ts")
    d = ev.withColumn("gap", gap)
    obs = (d.withColumn(
        "duration",
        F.when(F.col("gap").isNull() | (F.col("gap") > 86400.0),
               F.lit(24))
         .otherwise(F.floor(F.col("gap") / 3600.0)).cast("long"))
        .withColumn(
        "event",
        F.when(F.col("gap").isNull() | (F.col("gap") > 86400.0),
               F.lit(0)).otherwise(F.lit(1))))
    out = km_curve(obs, "event_type", "duration", "event")
    return out.select("event_type", "duration", "n_at_risk",
                      "n_events", "n_censored",
                      F.round("survival", 6).alias("survival"))


def q_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed ROC-AUC (Mann–Whitney rank-sum over the
    per-distinct-score count table, ties handled exactly) of a
    monotone-in-value score against the value>10.00 label, plus the
    calibration-style confusion counts at the matching threshold."""
    from hiselspark.operators.evaluate import binary_auc
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    scored = ev.withColumn(
        "score", F.least(F.col("cents"), F.lit(2000)).cast("long")
    ).withColumn("lbl", (F.col("cents") > 1000).cast("long"))
    out = binary_auc(scored, "score", "lbl")
    return out.select(F.round("auc", 6).alias("auc"), "n_pos", "n_neg")


def q_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table of the same quantized score (clamped cents /
    2000 as pseudo-probability): exact per-bin counts, mean predicted
    probability and observed positive fraction."""
    from hiselspark.operators.evaluate import (calibration_bins,
                                               confusion_at)
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    scored = ev.withColumn(
        "score", F.least(F.col("cents"), F.lit(2000)).cast("long")
    ).withColumn("lbl", (F.col("cents") > 1000).cast("long"))
    out = calibration_bins(scored, "score", "lbl", n_bins=10,
                           score_scale=2000)
    return out.select("bin", "n", "n_pos",
                      F.round("mean_pred", 6).alias("mean_pred"),
                      F.round("frac_pos", 6).alias("frac_pos"))


def q_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact confusion counts + precision/recall/F1/accuracy at the
    score threshold 1200 (quantized units)."""
    from hiselspark.operators.evaluate import confusion_at
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    scored = ev.withColumn(
        "score", F.least(F.col("cents"), F.lit(2000)).cast("long")
    ).withColumn("lbl", (F.col("cents") > 1000).cast("long"))
    out = confusion_at(scored, "score", "lbl", threshold=1200)
    return out.select("tp", "fp", "fn", "tn",
                      F.round("precision", 6).alias("precision"),
                      F.round("recall", 6).alias("recall"),
                      F.round("f1", 6).alias("f1"),
                      F.round("accuracy", 6).alias("accuracy"))


def q_triple_barrier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triple-barrier labels (±0.2%, 48h vertical) on a positive
    meandering per-user series (100000 + cumulative value deviation
    from 10.00) — which barrier is hit first, and when."""
    from pyspark.sql import Window
    from hiselspark.operators.labels import triple_barrier
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ser = ev.withColumn(
        "level", (F.lit(100000) + F.sum(F.col("cents") - 1000).over(w))
        .cast("long"))
    out = triple_barrier(ser, "user_id", "ts", "level",
                         horizon_seconds=172800.0,
                         up_frac=0.002, dn_frac=0.002)
    return out.select("event_id", F.col("tb_label").alias("label"),
                      F.round("tb_seconds", 6).alias("tsec"))


def q_horizon_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-within-24h horizon labels with explicit right-
    censoring (NULL when the window runs past the entity's last
    observation and saw no positive) — the oracle replays the
    future-min window and the three-way label rule."""
    from hiselspark.operators.labels import horizon_label
    ev = _ev(spark, sf_dir)
    out = horizon_label(ev, "user_id", "ts",
                        F.col("event_type") == "purchase",
                        horizon_seconds=86400.0,
                        tiebreak=("event_id",))
    return out.select("event_id", "label",
                      F.round("tte_seconds", 6).alias("tte_seconds"),
                      "censored")


def q_churn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inactivity label: 1 when the user's next event is > 24h away,
    NULL on the final observed event (right-censored)."""
    from hiselspark.operators.labels import inactivity_label
    ev = _ev(spark, sf_dir)
    out = inactivity_label(ev, "user_id", "ts", 86400.0,
                           tiebreak=("event_id",))
    return out.select("event_id", F.col("churned"))


def q_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson χ² independence test (+ Cramér's V) between event_type
    and hour-of-day, from one exact-count contingency pass."""
    from hiselspark.operators.profile import chi2_independence
    ev = _ev(spark, sf_dir).withColumn(
        "hour",
        F.pmod(F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                       / 3_600_000_000), 24).cast("long"))
    out = chi2_independence(ev, "event_type", "hour")
    return out.select("event_type", "hour", "obs",
                      F.round("expected", 6).alias("expected"),
                      F.round("chi2", 6).alias("chi2"),
                      "dof",
                      F.round("cramers_v", 6).alias("cramers_v"))


def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over user event-type baskets: support /
    confidence / lift per co-occurring pair, exact integer counts,
    basket-key self-join (never item×item)."""
    from hiselspark.operators.cooccur import assoc_rules
    ev = _ev(spark, sf_dir)
    out = assoc_rules(ev, "user_id", "event_type",
                      min_pair_count=2, max_basket_size=100)
    return out.select("item_a", "item_b", "n_ab", "n_a", "n_b",
                      F.round("support", 6).alias("support"),
                      F.round("conf_a_b", 6).alias("conf_a_b"),
                      F.round("conf_b_a", 6).alias("conf_b_a"),
                      F.round("lift", 6).alias("lift"))


def q_streaming_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the batch CUSUM: per-user drift statistics
    carried across micro-batches in O(1) integer state; drained with
    AvailableNow, the final row per user must equal the batch
    closed-form CUSUM at each user's last event."""
    import hashlib
    import os
    from pyspark.sql import Window
    from hiselspark.streaming.sessions import (read_events_stream,
                                               run_stream_to_batch)
    from hiselspark.streaming.stateful import stream_cusum
    batch = _ev(spark, sf_dir)
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    src_dir = f"/tmp/hiselspark_stream_src_{tag}"
    os.makedirs(src_dir, exist_ok=True)
    link = f"{src_dir}/events.parquet"
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/events.parquet", link)
    stream = (read_events_stream(spark, src_dir, batch.schema)
              .withColumn("ts", F.col("ts").cast("timestamp"))
              .withColumn("cents",
                          F.round(F.col("value") * 100).cast("long")))
    out = run_stream_to_batch(
        stream_cusum(stream, "user_id", "ts", "cents", "event_id",
                     target=1000, slack=50),
        output_mode="update")
    w = Window.partitionBy("entity").orderBy(F.col("n_events").desc())
    return (out.withColumn("rk", F.row_number().over(w))
               .filter(F.col("rk") == 1)
               .select(F.col("entity").alias("user_id"), "n_events",
                       "cusum_pos", "cusum_neg"))


def q_streaming_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of decayed_count: per-user O(1) state
    (n, last_us, score) advanced by the exact half-life recurrence;
    drained with AvailableNow, the final row per user must equal the
    all-events decay fold at that user's last event (oracle replays
    it in SQL)."""
    import hashlib
    import os
    from pyspark.sql import Window
    from hiselspark.streaming.sessions import (read_events_stream,
                                               run_stream_to_batch)
    from hiselspark.streaming.stateful import stream_decayed_count
    batch = _ev(spark, sf_dir)
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    src_dir = f"/tmp/hiselspark_stream_src_{tag}"
    os.makedirs(src_dir, exist_ok=True)
    link = f"{src_dir}/events.parquet"
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/events.parquet", link)
    stream = (read_events_stream(spark, src_dir, batch.schema)
              .withColumn("ts", F.col("ts").cast("timestamp")))
    out = run_stream_to_batch(
        stream_decayed_count(stream, "user_id", "ts", "event_id",
                             halflife_seconds=6 * 3600.0),
        output_mode="update")
    w = Window.partitionBy("entity").orderBy(F.col("n_events").desc())
    return (out.withColumn("rk", F.row_number().over(w))
               .filter(F.col("rk") == 1)
               .select(F.col("entity").alias("user_id"), "n_events",
                       F.round("score", 6).alias("score")))


def q_streaming_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the batch Holt smoother: per-user (level,
    trend) carried across micro-batches in O(1) float state with the
    batch fold's exact op order; drained with AvailableNow, the final
    row per user must equal the batch recursion — the oracle replays
    it as the same recursive CTE as ``holt_forecast``."""
    import hashlib
    import os
    from pyspark.sql import Window
    from hiselspark.streaming.sessions import (read_events_stream,
                                               run_stream_to_batch)
    from hiselspark.streaming.stateful import stream_holt
    batch = _ev(spark, sf_dir)
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    src_dir = f"/tmp/hiselspark_stream_src_{tag}"
    os.makedirs(src_dir, exist_ok=True)
    link = f"{src_dir}/events.parquet"
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/events.parquet", link)
    stream = (read_events_stream(spark, src_dir, batch.schema)
              .withColumn("ts", F.col("ts").cast("timestamp"))
              .withColumn("cents",
                          F.abs(F.round(F.col("value") * 100)
                                .cast("long"))))
    out = run_stream_to_batch(
        stream_holt(stream, "user_id", "ts", "cents", "event_id"),
        output_mode="update")
    w = Window.partitionBy("entity").orderBy(F.col("n_events").desc())
    return (out.withColumn("rk", F.row_number().over(w))
               .filter(F.col("rk") == 1)
               .select(F.col("entity").alias("user_id"), "n_events",
                       F.round("level", 6).alias("level"),
                       F.round("trend", 6).alias("trend")))


def _geo_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic coordinates over a ~220x255 km region
    (lat 40-42, lon -74..-71): integer multiply-mod then exact decimal
    division, so Spark and DuckDB derive identical doubles."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        "event_id",
        (F.lit(40.0) + ((F.col("event_id") * 7919) % 2_000_000)
         / F.lit(1e6)).alias("lat"),
        (F.lit(-74.0) + ((F.col("event_id") * 104_729) % 3_000_000)
         / F.lit(1e6)).alias("lon"))


def q_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-threshold audio segmentation over PCM-packed embedding
    clips: exact integer frame energies, gaps-and-islands runs; the
    oracle replays every sample, frame sum and run boundary."""
    from hiselspark.functions.audio import audio_segments, pack_pcm16
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    clips = (emb.select("vec_id",
                        F.col("embedding").cast("array<double>")
                        .alias("v"))
             .withColumn("n_channels", F.lit(1))
             .withColumn("codec", F.lit("pcm16")))
    clips = pack_pcm16(clips, "v").drop("v")
    out = audio_segments(clips, "vec_id", "audio",
                         frame_samples=16,
                         energy_threshold=260_000_000)
    return out.select("vec_id", "seg", "start_frame", "end_frame",
                      "n_frames", "energy_sum")


def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail on a DELIBERATELY broken 50/50
    split (treat = user_id % 5 == 0, i.e. a true 20% share) — the
    check must alarm; exact counts, A-S erfc p-value replayed
    term-for-term."""
    from hiselspark.operators.nbayes import srm_check
    ev = _ev(spark, sf_dir)
    d = ev.select((F.col("user_id") % 5 == 0).cast("int").alias("arm"))
    out = srm_check(d, "arm", expected_ratio=0.5)
    return out.select("n_treat", "n_ctrl", "expected_p",
                      F.round("chi2", 6).alias("chi2"),
                      F.round("p_value", 9).alias("p_value"))


def q_qte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects at the deciles (treat = odd user
    id) — exact interpolated order statistics per arm (Spark
    percentile == DuckDB quantile_cont), one aggregate per arm."""
    from hiselspark.operators.nbayes import quantile_treatment_effect
    ev = _ev(spark, sf_dir)
    d = ev.select((F.col("user_id") % 2).alias("treat"), "value")
    out = quantile_treatment_effect(d, "treat", "value")
    return out.select(F.round("q", 2).alias("q"),
                      F.round("y_ctrl", 6).alias("y_ctrl"),
                      F.round("y_treat", 6).alias("y_treat"),
                      F.round("qte", 6).alias("qte"))


def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full two-sample KS TEST (exact statistic + asymptotic p-value
    via the Kolmogorov series with Stephens' correction) on the
    event-value drift split — the series is a fixed 20-term fold the
    oracle replays term-for-term."""
    from hiselspark.operators.drift import ks_test
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    split = F.lit("2024-01-15 00:00:00").cast("timestamp")
    out = ks_test(ev, "cents", F.col("ts").cast("timestamp") < split)
    return out.select(F.round("ks", 6).alias("ks"), "at_value",
                      "n_ref", "n_cur",
                      F.round("lambda", 6).alias("lam"),
                      F.round("p_value", 6).alias("p_value"))


def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2x2 difference-in-differences on the events panel (treat =
    odd user id, post = on/after 2024-01-16, mid-range of the data) — per-unit means first, cell means as ordered
    folds, one double subtraction chain; the oracle replays every
    mean and the fold order."""
    from hiselspark.operators.nbayes import diff_in_diff
    ev = _ev(spark, sf_dir)
    d = ev.select(
        F.col("user_id").alias("u"),
        (F.col("user_id") % 2).alias("treat"),
        (F.col("ts").cast("timestamp")
         >= F.lit("2024-01-16").cast("timestamp")).cast("int")
        .alias("period"),
        "value")
    out = diff_in_diff(d, "u", "treat", "period", "value")
    return out.select(
        F.round("ctrl_pre", 6).alias("ctrl_pre"),
        F.round("ctrl_post", 6).alias("ctrl_post"),
        F.round("treat_pre", 6).alias("treat_pre"),
        F.round("treat_post", 6).alias("treat_post"),
        "n_ctrl_pre", "n_ctrl_post", "n_treat_pre", "n_treat_post",
        F.round("did", 6).alias("did"))


def q_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit with PLANTED violations: lineitem's
    part key is corrupted for every 97th order (orphan) and nulled for
    every 101st — the audit must count exactly those; oracle replays
    the corruption and the anti-join."""
    from hiselspark.operators.profile import fk_orphans
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    fk = (F.when(F.col("l_orderkey") % 101 == 0, F.lit(None))
           .when(F.col("l_orderkey") % 97 == 0,
                 F.col("l_partkey") + 1_000_000)
           .otherwise(F.col("l_partkey")))
    fact = li.withColumn("fk", fk)
    out = fk_orphans(fact, part, "fk", "p_partkey")
    return out.select("n_fact", "n_null_fk", "n_orphan",
                      "n_orphan_keys",
                      F.round("orphan_rate", 6).alias("orphan_rate"))


def q_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (BPE pre-tokens per word) + chars/token per
    document — the token-budget cost model; the oracle replays both
    tokenization contracts and the two divisions."""
    from hiselspark.functions.text import token_fertility
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = token_fertility(docs)
    return out.select("doc_id", "n_chars", "n_words", "n_pretokens",
                      F.round("fertility", 6).alias("fertility"),
                      F.round("chars_per_token", 6)
                      .alias("chars_per_token"))


def q_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary drift between the even-doc_id half (reference) and
    the odd half (candidate): type overlap Jaccard + token-weighted
    OOV rate, exact integers; the oracle replays the tokenization and
    both vocabulary tables."""
    from hiselspark.functions.text import vocab_drift
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    cand = docs.filter(F.col("doc_id") % 2 == 1)
    out = vocab_drift(ref, cand)
    return out.select("vocab_ref", "vocab_cand", "vocab_common",
                      "oov_tokens", "cand_tokens",
                      F.round("vocab_jaccard", 6).alias("vocab_jaccard"),
                      F.round("oov_rate", 6).alias("oov_rate"))


def q_mase_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive (period 7) MASE backtest per user over daily
    cent sums — exact BIGINT error sums, one double division; the
    oracle replays buckets, lags and sums."""
    from hiselspark.operators.tsprofile import seasonal_naive_mase
    ev = _ev(spark, sf_dir)
    out = seasonal_naive_mase(ev, "user_id", "ts", "value", period=7)
    return out.select("user_id", "n_scored", "sum_abs_err",
                      "sum_abs_naive", F.round("mase", 6).alias("mase"))


def q_decayed_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wall-clock exponentially decayed engagement score per event
    (half-life 6 h, strictly-before, 40-half-life exact horizon) —
    terms folded in ascending-timestamp order; the oracle replays the
    identical window list and fold."""
    from hiselspark.operators.windows import decayed_count
    ev = _ev(spark, sf_dir)
    out = decayed_count(ev, "user_id", "ts", 6 * 3600.0)
    return out.select("event_id", "user_id",
                      F.round("decayed_count", 6).alias("score"))


def q_leakage_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-feature AUC leak scan over four derived features, one of
    them a PLANTED leak (label baked into its high digits) — the scan
    must rank it near 1.0 while honest features sit near 0.5.  The
    oracle replays the melted count table and per-feature exact AUC."""
    from hiselspark.operators.evaluate import feature_auc_scan
    ev = _ev(spark, sf_dir)
    y = F.col("event_type").isin("purchase", "signup").cast("int")
    cents = F.abs(F.round(F.col("value") * 100).cast("long"))
    d = ev.select(
        y.alias("y"),
        (cents % 1000).cast("double").alias("f_cents"),
        F.hour(F.col("ts").cast("timestamp")).cast("double")
        .alias("f_hour"),
        (F.col("user_id") % 10).cast("double").alias("f_user"),
        ((cents % 3) + y * 100).cast("double").alias("f_leak"))
    out = feature_auc_scan(
        d, ["f_cents", "f_hour", "f_user", "f_leak"], "y")
    return out.select("feature", F.round("auc", 6).alias("auc"),
                      "n_pos", "n_neg", "n_distinct")


def q_ssim_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage image near-dup: dHash pigeonhole banding proposes
    candidate pairs, tiled SSIM verifies them — the cheap-candidates /
    expensive-verify pattern at image scale.  Duplicate groups are
    planted as BRIGHTNESS-SHIFTED copies: key2 = seed + 15·shift adds
    exactly ``shift`` to every byte (15·7919 ≡ 1 mod 256 — modular
    inverse), so group members are near- but not bit-identical and
    SSIM scores them < 1; a per-image byte step (seed-keyed) makes
    DIFFERENT seeds structurally different, so banding separates
    them.  The oracle recomputes pixels, hashes,
    banding, tile sums, the SSIM formula and the ordered mean fold."""
    from pyspark.sql import Window
    from hiselspark.functions.image import with_dhash, ssim_tiles
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .filter(F.col("o_orderkey") <= 3000))
    imgs = (orders.select(F.col("o_orderkey").alias("okey"))
            .withColumn("key2",
                        (F.pmod(F.col("okey"), F.lit(500))
                         + 15 * F.expr("okey DIV 500")).cast("long"))
            .withColumn("step",
                        (13 + 2 * (F.pmod(F.col("okey"), F.lit(500))
                                   % 23)).cast("long"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8))
            .withColumn("fmt", F.lit("raw")))
    imgs = _synth_raw_bytes_vstep(imgs, "key2", "step", 7919,
                                  8 * 8 * 3)
    hsh = with_dhash(imgs).select("okey", "dhash_lo", "dhash_hi")
    a = hsh.select(F.col("okey").alias("pa"),
                   F.col("dhash_lo").alias("alo"),
                   F.col("dhash_hi").alias("ahi"))
    b = hsh.select(F.col("okey").alias("pb"),
                   F.col("dhash_lo").alias("blo"),
                   F.col("dhash_hi").alias("bhi"))
    ham = (F.bit_count(F.col("alo").bitwiseXOR(F.col("blo")))
           + F.bit_count(F.col("ahi").bitwiseXOR(F.col("bhi"))))
    cand = (a.join(b, (F.col("pa") < F.col("pb"))
                   & ((F.col("alo") == F.col("blo"))
                      | (F.col("ahi") == F.col("bhi"))))
             .filter(ham <= 6)
             .select("pa", "pb"))
    payload = imgs.select("okey", "bytes")
    pairs = (cand
             .join(payload.select(F.col("okey").alias("pa"),
                                  F.col("bytes").alias("bytes_a")),
                   "pa")
             .join(payload.select(F.col("okey").alias("pb"),
                                  F.col("bytes").alias("bytes_b")),
                   "pb")
             .withColumn("w", F.lit(8)).withColumn("h", F.lit(8)))
    tiles = ssim_tiles(pairs, "bytes_a", "bytes_b", tile=4)
    mean = (F.aggregate(
        F.transform(
            F.sort_array(F.collect_list(F.struct(
                F.col("ti").alias("i"), F.col("tj").alias("j"),
                F.col("ssim").alias("v")))),
            lambda x: x["v"]),
        F.lit(0.0), lambda acc, v: acc + v) / F.lit(4.0))
    out = (tiles.groupBy("pa", "pb")
                .agg(mean.alias("mean_ssim"))
                .filter(F.col("mean_ssim") >= 0.5))
    return out.select("pa", "pb",
                      F.round("mean_ssim", 6).alias("mean_ssim"))


def q_avg_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact average precision (step-interpolated PR-AUC) of the
    cents-quantized score against the purchase/signup label — count
    table + ordered term fold; the oracle replays every precision
    term in the identical ascending-threshold order."""
    from hiselspark.operators.evaluate import average_precision
    ev = _ev(spark, sf_dir)
    scored = ev.select(
        (F.abs(F.round(F.col("value") * 100).cast("long")) % 1000)
        .alias("s"),
        F.col("event_type").isin("purchase", "signup")
        .cast("int").alias("y"))
    out = average_precision(scored, "s", "y")
    return out.select(F.round("ap", 6).alias("ap"), "n_pos", "n_neg")


def q_platt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Platt sigmoid calibration of an exact-decimal score against the
    purchase/signup label — 3 fixed-point Newton iterations whose six
    sufficient sums are floored BIGINTs (engine-exact); the oracle
    unrolls the same iterations as single-reference CTEs (a/b carried
    through each sums CTE to avoid double references)."""
    from hiselspark.operators.isotonic import platt_fit
    ev = _ev(spark, sf_dir)
    scored = ev.select(
        ((F.abs(F.round(F.col("value") * 100).cast("long")) % 1000)
         / F.lit(1000.0)).alias("s"),
        F.col("event_type").isin("purchase", "signup")
        .cast("int").alias("y"))
    r = platt_fit(scored, "s", "y", iterations=3)
    out = spark.createDataFrame(
        [(r["a"], r["b"], r["n_pos"], r["n_neg"])],
        "a double, b double, n_pos long, n_neg long")
    return out.select(F.round("a", 6).alias("a"),
                      F.round("b", 6).alias("b"), "n_pos", "n_neg")


def q_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal k-NN pairs over the first 120 embeddings: exact
    cosine top-5 each way, keep pairs in EACH OTHER's top-5 (hub-noise
    filter).  The oracle replays the full ranking and the mutuality
    join."""
    from pyspark.sql import Window
    from hiselspark.operators.similarity import mutual_pairs
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    e = (emb.filter(F.col("vec_id") < 120)
            .select("vec_id",
                    F.col("embedding").cast("array<double>").alias("v")))
    p = e.select(F.col("vec_id").alias("probe_id"),
                 F.col("v").alias("p"))
    dot = F.aggregate(F.zip_with("p", "v", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)

    def norm(c):
        return F.sqrt(F.aggregate(F.transform(c, lambda a: a * a),
                                  F.lit(0.0), lambda acc, x: acc + x))

    pairs = (p.crossJoin(e)
              .filter(F.col("probe_id") != F.col("vec_id"))
              .withColumn("cos", dot / (norm(F.col("p"))
                                        * norm(F.col("v")))))
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(),
                                               F.col("vec_id").asc())
    topk = (pairs.withColumn("rk", F.row_number().over(w))
                 .filter(F.col("rk") <= 5)
                 .select("probe_id", "vec_id", "cos"))
    out = mutual_pairs(topk, "probe_id", "vec_id")
    return out.select("a", "b", F.round("cos", 6).alias("cos_sim"))


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis weighted sampling without replacement, 10
    docs per group, weight = text length — priorities from the
    portable polynomial hash, so the oracle replays every key and the
    full ranking."""
    from hiselspark.operators.sampling import weighted_sample
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = docs.select("doc_id",
                    (F.col("doc_id") % 7).alias("grp"),
                    (F.length("text") + 1).alias("wt"))
    out = weighted_sample(d, "wt", 10, "doc_id", "grp", salt=5)
    return out.select("grp", "rk", "doc_id", "wt",
                      F.round("es_key", 6).alias("es_key"))


def q_embedding_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIT user profile vectors (strictly-before expanding mean of the
    64-dim embedding attached to each event) — the "user tower"
    feature.  Output exploded per dimension (every double checked) on
    a 1/16 event sample; the oracle replays the running sums in the
    identical (ts, event_id) order."""
    from hiselspark.operators.encoding import embedding_profile_pit
    ev = _ev(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    joined = ev.join(emb.select((F.col("vec_id")).alias("_vid"),
                                "embedding"),
                     F.pmod(F.col("event_id"), F.lit(n)) == F.col("_vid"))
    out = embedding_profile_pit(joined, "user_id", "ts", "event_id")
    return (out.filter(F.col("event_id") % 16 == 0)
               .select("event_id", "user_id", "n_prior",
                       F.posexplode("profile").alias("dim", "m"))
               .select("event_id", "user_id", "n_prior", "dim",
                       F.round("m", 6).alias("prior_mean")))


def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered semi-join (the runtime-filter plan): lineitem
    rows whose order is URGENT — map-side bitmap pruning, then the
    exact refine semi-join.  The oracle is the plain semi-join, so the
    gate proves the bloom stage drops no true match and the refine
    removes every false positive."""
    from hiselspark.operators.skew import bloom_semi_join
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    urgent = (orders.filter(F.col("o_orderpriority") == "1-URGENT")
                    .select(F.col("o_orderkey").alias("l_orderkey")))
    out = bloom_semi_join(li, urgent, "l_orderkey", n_bits=1 << 16)
    return out.select("l_orderkey", "l_linenumber",
                      (F.col("l_quantity").cast("long"))
                      .alias("qty"))


def q_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level Niemeyer geohash (precision 6) of synthetic
    coordinates spread over the full globe — one floor per axis then
    pure integer bit interleaving, zero shuffles; the oracle replays
    the identical arithmetic (hiselspark.operators.spatial.geohash_sql
    emits it)."""
    from hiselspark.operators.spatial import geohash
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = ev.select(
        "event_id",
        (F.lit(-80.0) + ((F.col("event_id") * 7919) % 160_000_000)
         / F.lit(1e6)).alias("lat"),
        (F.lit(-180.0) + ((F.col("event_id") * 104_729) % 360_000_000)
         / F.lit(1e6)).alias("lon"))
    return pts.select("event_id",
                      geohash(F.col("lat"), F.col("lon"), 6)
                      .alias("gh6"),
                      geohash(F.col("lat"), F.col("lon"), 2)
                      .alias("gh2"))


def q_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius join: every event point within 10 km of each hub point
    (every 199th event), via the 3x3 grid-cell candidate equi-join +
    exact haversine — the oracle is the BRUTE-FORCE cross join in
    DuckDB, independently proving the grid plan drops no pair."""
    from hiselspark.operators.spatial import radius_join
    pts = _geo_points(spark, sf_dir)
    hubs = (pts.filter(F.col("event_id") % 199 == 0)
               .select(F.col("event_id").alias("hub_id"),
                       "lat", "lon"))
    out = radius_join(hubs, pts, radius_m=10_000.0, cell_deg=0.25,
                      max_abs_lat=42.5)
    return out.select("hub_id", "event_id",
                      F.round("dist_m", 2).alias("dist_m"))


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point integer PageRank (5 iterations, d=0.85) over the
    undirected order↔part bipartite graph from lineitem.  Exact BIGINT
    arithmetic -> the oracle replays the identical iterations as
    unrolled SQL CTEs; ranks match bit-for-bit."""
    from hiselspark.operators.graph import pagerank
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = li.select((F.col("l_orderkey") * 2).alias("src"),
                      (F.col("l_partkey") * 2 + 1).alias("dst"))
    return pagerank(edges, iterations=5).select("node", "r")


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point integer HITS (4 iterations, L1 renormalization)
    over the DIRECTED order→part bipartite graph from lineitem —
    hubs are orders, authorities are parts.  Exact BIGINT arithmetic;
    the oracle replays the identical iterations as unrolled CTEs
    (window-function totals so every CTE is referenced exactly once —
    a twice-referenced CTE inlines exponentially in DuckDB)."""
    from hiselspark.operators.graph import hits
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = li.select((F.col("l_orderkey") * 2).alias("src"),
                      (F.col("l_partkey") * 2 + 1).alias("dst"))
    return hits(edges, iterations=4).select("node", "kind", "score")


def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distance (≤ 3) from the first three order nodes over
    the undirected order↔part graph — exact frontier relaxation; the
    oracle is a recursive CTE."""
    from hiselspark.operators.graph import bfs_hops
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = li.select((F.col("l_orderkey") * 2).alias("src"),
                      (F.col("l_partkey") * 2 + 1).alias("dst"))
    sources = (li.filter(F.col("l_orderkey") <= 3)
                 .select((F.col("l_orderkey") * 2).alias("node"))
                 .distinct())
    out = bfs_hops(edges, sources, max_hops=3)
    return out.select("node", "hops")


def q_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-5 (λ=0.7) from each probe's exact top-20
    cosine candidates — relevance minus redundancy re-ranking.
    TRUE SQL oracle: DuckDB rebuilds the candidate pool and replays
    the whole greedy selection (_mmr_oracle_sql) — nothing pinned."""
    from hiselspark.operators.similarity import cosine_topk, mmr_rerank
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 20)
    top = cosine_topk(probes, emb, k=20)
    vecs = emb.select(F.col("vec_id").alias("cid"),
                      F.col("embedding").cast("array<double>")
                       .alias("v"))
    cands = top.join(vecs, top.vec_id == vecs.cid).drop("cid")
    out = mmr_rerank(cands, k=5, lam=0.7, rel_col="cos_sim")
    return out.select("probe_id", "rk", "vec_id",
                      F.round("mmr", 6).alias("mmr"))


def q_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center (farthest-point) diversity sample: 16 centers
    over the embedding corpus + per-center assignment counts and
    coverage radius.  TRUE SQL oracle: at gate scale the pool is the
    whole id-sorted table, so DuckDB replays the full greedy trace and
    the assignment (_kcenter_oracle_sql) — nothing pinned."""
    from hiselspark.operators.similarity import kcenter_sample
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centers, assigned = kcenter_sample(emb, k=16, pool_size=4096,
                                       seed=7)
    per = (assigned.groupBy("center_id")
                   .agg(F.count("*").alias("n_assigned"),
                        F.round(F.max("dist"), 6).alias("radius")))
    return (centers.join(per, "center_id")
                   .select("order", "center_id",
                           F.round("sel_dist", 6).alias("sel_dist"),
                           "n_assigned", "radius"))


def q_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA fit from exact integer sufficient statistics (map-only, no
    embedding-row shuffle) + top-4 projection per vector.  Oracle
    contract: the fitted model (mean + components, pytest-verified
    against numpy.linalg.eigh) is a pinned constant; the per-row
    projection arithmetic is replayed by DuckDB on every parquet
    vector (_pca_pinned_oracle)."""
    from hiselspark.operators.projection import pca_fit, pca_project
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = pca_fit(emb, "embedding", k=4)
    out = pca_project(emb, model, "embedding", "proj")
    return out.select(
        "vec_id",
        *[F.round(F.element_at("proj", i + 1), 6).alias(f"p{i}")
          for i in range(4)])


def _hsic_emb_rows(spark: SparkSession, sf_dir: str) -> list:
    """Shared by the gate query and tools/pin_constants.py (so the
    pinned constants can never drift from the config the gate runs):
    per-feature EXACT (unrounded) HSIC score, score-rank and
    LARS-selected flag from the production hash-bucketed plan
    (deterministic across layouts: batch ids hash vec_id, float blocks
    summed in fixed key order)."""
    from hiselspark.selection import SparkHSICSelector
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    d = 64
    wide = emb.select(
        "vec_id",
        F.col("label").cast("double").alias("y"),
        *[F.col("embedding")[i].cast("double").alias(f"e{i}")
          for i in range(d)])
    cols = [f"e{i}" for i in range(d)]
    sel = SparkHSICSelector(wide, cols, ["y"])
    res = sel.run(number_of_features=8, minibatch_size=100, mode="hash",
                  order_col="vec_id")
    order = sorted(cols, key=lambda c: (-float(res.hsic_scores[c]), c))
    rank = {c: i + 1 for i, c in enumerate(order)}
    return [(c, float(res.hsic_scores[c]), rank[c], c in res.features)
            for c in cols]


def q_hsic_select_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed HSIC-Lasso on the embeddings table: which of the 64
    embedding dimensions carry dependence with the label.  Oracle
    contract (constant-pinned, not a full literal pin): the EXACT
    per-feature scores and the LARS-selected set are pinned constants
    (layout-determinism checked by tools/pin_constants.py; the kernel
    math itself is pytest-parity-tested against the reference), while
    the 6-decimal display rounding and the score RANKING are
    recomputed by DuckDB from the pinned exact doubles."""
    rows = _hsic_emb_rows(spark, sf_dir)
    # rounding happens in F.round (not Python round, which is
    # half-to-even) so it is the same round pairing every other
    # query/oracle uses on identical doubles
    df = spark.createDataFrame(
        rows, "feature string, hsic_score double, rank_by_score int,"
        " selected boolean")
    return df.select("feature", F.round("hsic_score", 6)
                     .alias("hsic_score"), "rank_by_score", "selected")


def q_feature_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end S19 facade run exactly as the reference flagship
    (``/root/reference/hisel/feature_selection.py:69-105``): one mixed
    continuous+discrete frame -> ksgmi MI preselection -> HSIC-Lasso
    autoselect on the continuous block + AMI categorical search on the
    discrete block -> concatenated selection (categorical first).
    Deterministic end to end (hash minibatches, seeded permutohedron
    search) -> pinned parity oracle (search/selection family); emits
    the selection order, each feature's origin, and the
    autoselect/regularization-curve evidence."""
    from hiselspark.api import (HSICLassoParameters, SearchParameters,
                                select_features)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    wide = emb.select(
        "vec_id",
        F.col("label").cast("double").alias("y"),
        *[F.col("embedding")[i].cast("double").alias(f"e{i}")
          for i in range(8)],
        # discrete block: a signal bucket (quantized first embedding
        # dim) and an id-derived factor
        F.floor(F.col("embedding")[0] * 4).cast("int").alias("c0"),
        F.pmod(F.col("vec_id"), 5).cast("int").alias("c1"),
    )
    res = select_features(
        wide, [f"e{i}" for i in range(8)] + ["c0", "c1"], ["y"],
        HSICLassoParameters(use_preselection=True, minibatch_size=100,
                            mode="hash", order_col="vec_id"),
        SearchParameters(num_permutations=10, random_state=3),
    )
    cont = res.continuous_selection
    n_cont = len(cont.features) if cont is not None else 0
    reg_last = (round(float(cont.reg_curve[-1]), 6)
                if cont is not None and len(cont.reg_curve) else 0.0)
    rows = [
        (i, f, "categorical" if f in res.categorical_selection
         else "continuous",
         len(res.selected_features), n_cont, reg_last)
        for i, f in enumerate(res.selected_features)
    ]
    return spark.createDataFrame(
        rows, "ord int, feature string, origin string, n_selected int,"
              " n_continuous int, regcurve_last double")


def q_asof_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same as-of semantics via the cogrouped merge_asof strategy —
    checked against the identical oracle as q_asof_join."""
    from hiselspark.operators.asof import asof_join_cogrouped
    ev = _ev(spark, sf_dir)
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .select("event_id", "user_id", "ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
                .groupBy("user_id", "ts")
                .agg(F.max("value").alias("click_value")))
    out = asof_join_cogrouped(purchases, clicks, on="user_id",
                              left_ts="ts", right_ts="ts",
                              value_cols=["click_value"])
    return out.select(
        "event_id", "user_id",
        _us("ts").alias("ts_us"),
        "click_value",
        _us("__matched_ts").alias("click_ts_us"))


def q_bfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hiselspark.operators.windows import backward_fill
    ev = _ev(spark, sf_dir).withColumn(
        "v_or_null",
        F.when(F.col("event_type") != "error", F.col("value")))
    out = backward_fill(ev, "user_id", "ts", ["v_or_null"])
    return out.select("event_id", "user_id",
                      F.col("v_or_null_bfill").alias("v_bfilled"))


def q_rolling_excl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1h window EXCLUDING the current row (leakage-safe)."""
    from hiselspark.operators.windows import rolling_aggregates
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = rolling_aggregates(ev, "user_id", "ts", {"cents": ["sum"]},
                             window_seconds=3600.0, include_current=False)
    return out.select("event_id", "user_id",
                      F.col("cents_roll_sum_3600s").alias("prior_cents"))


def q_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    return ev.select(
        "event_id", "user_id",
        F.row_number().over(w).alias("rn"),
        F.sum("cents").over(wcum).alias("cum_cents"),
        F.rank().over(Window.partitionBy("user_id")
                      .orderBy(F.col("cents").desc())).alias("value_rank"))


def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    return (ev.cube("event_type",
                    F.dayofweek("ts").alias("dow"))
              .agg(F.sum("cents").alias("cents"),
                   F.count("*").alias("n")))


def q_decimal_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL money aggregation (the type-system path the
    cents-long convention sidesteps): sums and averages in
    DECIMAL(38,2)/(38,8), emitted as canonical strings so the
    cross-engine compare is on exact digits, never floats."""
    ev = _ev(spark, sf_dir).withColumn(
        "d", F.round(F.col("value"), 2).cast("decimal(18,2)"))
    out = (ev.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("d").alias("s"),
                F.min("d").alias("mn"),
                F.max("d").alias("mx")))
    return out.select(
        "event_type", "n",
        F.col("s").cast("decimal(38,2)").cast("string").alias("total"),
        F.col("mn").cast("string").alias("vmin"),
        F.col("mx").cast("string").alias("vmax"))


def q_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (type -> type×dow -> grand total) with
    the GROUPING id distinguishing real NULL groups from subtotal
    rows — completes the cube/grouping-sets family."""
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    return (ev.rollup("event_type",
                      F.dayofweek("ts").alias("dow"))
              .agg(F.sum("cents").alias("cents"),
                   F.count("*").alias("n"),
                   F.grouping_id().alias("gid")))


def q_pivot_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    types = ["click", "view", "purchase", "signup", "error"]
    piv = (ev.groupBy("user_id")
             .pivot("event_type", types)
             .sum("cents"))
    # coalesce the sparse cells to 0 so both engines yield pure int64
    return piv.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0).cast("long")).alias(t)
          for t in types])


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for skewed keys — must equal the
    plain GROUP BY (the oracle)."""
    from hiselspark.operators.skew import salted_aggregate
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    return salted_aggregate(
        ev, ["event_type"],
        {"cents_sum": (F.sum, F.sum, "cents"),
         "n": (F.count, F.sum, "cents")},
        n_salts=8)


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard similarity for all document pairs >= 0.5."""
    from hiselspark.operators.dedup import jaccard_pairs
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (jaccard_pairs(docs, "doc_id", "text", threshold=0.5)
            .select("a", "b", "n_common", F.round("jaccard", 6)
                    .alias("jaccard")))


def q_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-group size histogram via 64-bit fingerprints; the
    oracle groups by normalized text — equal absent hash collisions,
    which validates the fingerprint semantics."""
    from hiselspark.functions.text import with_fingerprint
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (with_fingerprint(docs, "text")
            .groupBy("fingerprint")
            .agg(F.count("*").alias("group_size"))
            .groupBy("group_size")
            .agg(F.count("*").alias("n_groups"))
            .orderBy("group_size"))


def q_language_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hiselspark.functions.text import with_language_guess
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (with_language_guess(docs, "text")
            .select("doc_id", "lang_guess"))


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hiselspark.functions.text import with_quality_score
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (with_quality_score(docs, "text")
            .select("doc_id", F.round("quality", 6).alias("quality")))


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All embedding pairs with cosine >= 0.5 (brute force — the exact
    semantics; the LSH variant is checked in tests for recall)."""
    from hiselspark.operators.similarity import embedding_near_duplicates
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return (embedding_near_duplicates(emb, dim=64, threshold=0.5,
                                      use_lsh=False)
            .select("a", "b", F.round("cos_sim", 6).alias("cos_sim")))


def q_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate generation with exact-Jaccard verification.
    Checked against the exact all-pairs Jaccard oracle: at this banding
    (32 hashes, 8 bands of 4) the LSH candidate recall on the gate data
    is verified 1.0, so the verified output must EQUAL the exact
    result — the strongest possible check of the whole pipeline."""
    from hiselspark.operators.dedup import minhash_near_duplicates
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = minhash_near_duplicates(docs, "doc_id", "text",
                                  num_hashes=32, bands=8, threshold=0.5)
    return out.select("a", "b", "n_common",
                      F.round("jaccard", 6).alias("jaccard"))


def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicates within Hamming distance 3, in the
    cross-engine 'poly' hash mode: DuckDB recomputes every token hash,
    vote, signature bit and Hamming distance from the parquet text (by
    brute force — the 4x16-bit pigeonhole banding is lossless at
    distance 3, so the sets must be identical).  Nothing is pinned."""
    from hiselspark.operators.dedup import simhash_near_duplicates
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_near_duplicates(docs, "doc_id", "text", max_distance=3,
                                   hash="poly")


# Pinned ANN recall floors (vs the exact verifier, recall@5 over the
# <20-id probes) — measured on the structureless synthetic embeddings
# (mean pairwise cos ~0, the worst case for every bucketing scheme)
# at sf0.01 AND sf0.1, floored below the weaker scale:
#   pq_topk  (PQ16x8 + refine=32 exact re-rank)   measured 1.00 / 1.00
#   ivf_topk (16 cells, n_probe=8)                measured 0.80 / 0.80
#   lsh_topk (128 planes, 21 bands x 6 bits)      measured 0.58 / 0.77
# The floors make retrieval QUALITY a gate invariant — a quantizer /
# banding / re-rank regression now fails the gate even though the
# candidate ids themselves are pinned.
PQ_RECALL_FLOOR = 0.9
IVF_RECALL_FLOOR = 0.75
LSH_RECALL_FLOOR = 0.5


def _assert_ann_recall(emb: DataFrame, out_df: DataFrame, k: int,
                       floor: float, name: str) -> DataFrame:
    """Recall floor vs the exact brute-force verifier — the gate FAILS
    (the query raises) when the approximate plan's retrieval quality
    regresses below the pinned floor, instead of merely proving the
    reported values.  The verifier is O(probes x corpus) — trivial at
    gate scale, and exactly the recall bench.py reports at sf0.1."""
    from hiselspark.operators.similarity import cosine_topk
    probes = emb.filter(F.col("vec_id") < 20)
    exact = (cosine_topk(probes, emb, k=k, probe_id_col="vec_id")
             .select("probe_id", "vec_id").toPandas())
    got = out_df.select("probe_id", "vec_id").toPandas()
    t = exact.groupby("probe_id")["vec_id"].apply(set)
    g = got.groupby("probe_id")["vec_id"].apply(set)
    hits = sum(len(t[p] & g.get(p, set())) for p in t.index)
    recall = hits / max(1, int(sum(len(s) for s in t)))
    if recall < floor:
        raise AssertionError(
            f"{name}: recall@{k} = {recall:.3f} is below the pinned "
            f"floor {floor} vs the exact verifier")
    return out_df


def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5 neighbours.  Oracle contract:
    the candidate (probe, rk, vec) triples are pinned constants (they
    encode the hyperplane buckets — engine-specific by design), while
    every reported cosine is recomputed by DuckDB from the parquet
    vectors; retrieval quality is gated by a recall floor vs the
    exact verifier (structureless synthetic embeddings are LSH's
    worst case — the floor reflects that regime; the clustered-corpus
    regime is pytest-covered)."""
    from hiselspark.operators.similarity import lsh_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 20)
    # 21 bands x 6 bits: ~28% expected candidate fraction on
    # orthogonal-ish vectors (1-(1-2^-6)^21) for 0.6-0.8 recall@5 —
    # the honest LSH operating point on structureless data; the old
    # 8x8 config scanned ~3% and recalled only 0.1-0.3
    out = lsh_topk(probes, emb, dim=64, k=5, probe_id_col="vec_id",
                   n_planes=128, band_bits=6)
    out = out.withColumn("cos_sim", F.round("cos_sim", 6))
    return _assert_ann_recall(emb, out, 5, LSH_RECALL_FLOOR, "lsh_topk")


def q_greedy_hsic_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy HSIC forward selection on embedding dims.  Seeded
    permutohedron sampling + hash-ordered deterministic sample make the
    search reproducible; the sf0.01 pick sequence is pinned as a
    literal-table oracle (the iterative search itself is not
    SQL-expressible)."""
    from hiselspark.hsic_search import hsic_search
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    d = 16
    wide = emb.select(
        F.col("label").cast("double").alias("y"),
        *[F.col("embedding")[i].cast("double").alias(f"e{i}")
          for i in range(d)])
    sel = hsic_search(wide, [f"e{i}" for i in range(d)], ["y"],
                      num_permutations=16, max_iter=2, random_state=0)
    return spark.createDataFrame(
        [(i, name) for i, name in enumerate(sel)] or [(-1, "none")],
        "pick_order int, feature string")


def q_categorical_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMI categorical search over discretised event features.  Fully
    deterministic (exact percentile discretisation, seeded permutation
    sampling, exact-EMI AMI); the sf0.01 selection is pinned as a
    literal-table oracle (the search is not SQL-expressible)."""
    from hiselspark.categorical import categorical_select
    ev = _ev(spark, sf_dir)
    feats = ev.select(
        F.col("value").alias("y"),
        F.hour("ts").cast("long").alias("hour"),
        F.dayofweek("ts").cast("long").alias("dow"),
        (F.col("user_id") % 5).cast("long").alias("user_mod"),
        F.length("event_type").cast("long").alias("type_len"))
    sel = categorical_select(feats, ["hour", "dow", "user_mod", "type_len"],
                             ["y"], random_state=0)
    return spark.createDataFrame(
        [(s,) for s in sel] or [("none",)], "feature string")


def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: for each purchase, the user's EARLIEST view value
    at-or-after the purchase (label construction / outcome attribution
    direction)."""
    from hiselspark.operators.asof import asof_join
    ev = _ev(spark, sf_dir)
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .select("event_id", "user_id", "ts"))
    views = (ev.filter(F.col("event_type") == "view")
               .groupBy("user_id", "ts")
               .agg(F.max("value").alias("view_value")))
    out = asof_join(purchases, views, on="user_id", left_ts="ts",
                    right_ts="ts", value_cols=["view_value"],
                    direction="forward")
    return out.select(
        "event_id", "user_id",
        _us("ts").alias("ts_us"),
        "view_value",
        _us("__matched_ts").alias("view_ts_us"))


def q_asof_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of against RAW click rows (colliding (user, ts)
    feature timestamps): the deterministic tie rule — max value tuple
    wins within a timestamp — must match an oracle that argmaxes per
    (user, ts) and then ASOF-joins."""
    from hiselspark.operators.asof import asof_join
    ev = _ev(spark, sf_dir)
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .select("event_id", "user_id", "ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
                .select("user_id", "ts",
                        F.round(F.col("value") * 100).cast("long")
                        .alias("cents")))
    out = asof_join(purchases, clicks, on="user_id", left_ts="ts",
                    right_ts="ts", value_cols=["cents"])
    return out.select(
        "event_id", "user_id",
        _us("ts").alias("ts_us"),
        F.col("cents").alias("click_cents"),
        _us("__matched_ts").alias("click_ts_us"))


def q_interval_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketized interval join: every (purchase, click) pair where the
    click is within the trailing hour of the purchase, aggregated per
    purchase."""
    from hiselspark.operators.interval_join import interval_join
    ev = _ev(spark, sf_dir)
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .select("event_id", "user_id", "ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
                .select("user_id", "ts",
                        F.round(F.col("value") * 100).cast("long")
                        .alias("cents")))
    out = interval_join(purchases, clicks, on="user_id",
                        lo_seconds=-3600.0, hi_seconds=0.0,
                        value_cols=["cents"])
    return (out.groupBy("event_id", "user_id")
               .agg(F.count("*").alias("n_clicks"),
                    F.sum("cents").alias("click_cents")))


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-heavy scan aggregate (predicate pushdown showcase);
    revenue computed in exact integer cents*bps."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rev = (F.round(F.col("l_extendedprice") * 100).cast("long")
           * F.round(F.col("l_discount") * 100).cast("long"))
    return (li.filter((F.col("l_shipdate") >= F.lit("1996-01-01"))
                      & (F.col("l_shipdate") < F.lit("1997-01-01"))
                      & (F.round(F.col("l_discount") * 100).cast("long")
                         .between(5, 7))
                      & (F.col("l_quantity") < 24))
              .agg(F.sum(rev).alias("revenue_unit"),
                   F.count("*").alias("n_items")))


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders (left anti join)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (cust.join(orders, cust.c_custkey == orders.o_custkey,
                      "left_anti")
                .select("c_custkey", "c_name", "c_nationkey"))


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers that ship at least one item (left semi join)."""
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (supp.join(li, supp.s_suppkey == li.l_suppkey, "left_semi")
                .select("s_suppkey", "s_name", "s_nationkey"))


def q_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles of event value per type (Spark
    ``percentile`` == DuckDB ``quantile_cont``)."""
    ev = _ev(spark, sf_dir)
    return (ev.groupBy("event_type")
              .agg(F.percentile("value", 0.25).alias("p25"),
                   F.percentile("value", 0.5).alias("p50"),
                   F.percentile("value", 0.75).alias("p75"),
                   F.count("*").alias("n")))


def q_phash_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The phash bit-unpack + hamming-weight operators (JVM bit
    expressions), oracle-checked on an integer key column."""
    from hiselspark.functions.image import (phash_bit_columns,
                                            phash_hamming_weight)
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .select(F.col("o_orderkey").alias("phash")))
    out = phash_bit_columns(orders, n_bits=8)
    out = phash_hamming_weight(out)
    return out.select(
        F.col("phash").alias("okey"),
        *[F.col(f"pbit{i}").alias(f"bit{i}") for i in range(8)],
        F.col("phash_weight").alias("popcount"))


def q_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming distance between integer fingerprints of close key
    pairs — the same expression near-duplicate phash mining uses."""
    from hiselspark.functions.image import phash_hamming_distance
    o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .filter(F.col("o_orderkey") <= 64)
         .select(F.col("o_orderkey").alias("k")))
    l = o.select(F.col("k").alias("a"))
    r = o.select(F.col("k").alias("b"))
    return (l.crossJoin(r).filter(F.col("a") < F.col("b"))
             .withColumn("hamming",
                         phash_hamming_distance("a", "b").cast("int"))
             .filter(F.col("hamming") <= 2))


def q_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming sessionization (session_window + watermark)
    drained with Trigger.AvailableNow — must equal the batch gap-rule
    oracle (new session when inter-event gap >= 30 min)."""
    from hiselspark.streaming.sessions import (read_events_stream,
                                               run_stream_to_batch,
                                               stream_sessions)
    import hashlib
    import os
    batch = _ev(spark, sf_dir)
    # the file stream source needs a *directory*; stage a symlink dir
    # pointing at the single parquet file
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    src_dir = f"/tmp/hiselspark_stream_src_{tag}"
    os.makedirs(src_dir, exist_ok=True)
    link = f"{src_dir}/events.parquet"
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/events.parquet", link)
    stream = read_events_stream(spark, src_dir, batch.schema)
    # parquet timestamps arrive as TIMESTAMP_NTZ; watermarks need
    # TIMESTAMP (session is pinned to UTC so the instant is unchanged)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    sess = stream_sessions(stream, "user_id", "ts", gap_seconds=1800)
    out = run_stream_to_batch(sess)
    return (out.groupBy("user_id")
               .agg(F.count("*").alias("n_sessions"),
                    F.sum("n_events").alias("n_events"),
                    F.min(_us("first_event_ts")).alias("first_us")))


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF(-flat) approximate top-5 neighbours.  Oracle contract: the
    candidate (probe, rk, vec) triples are pinned constants (they
    encode the trained quantizer — engine-specific; recall vs exact is
    measured separately in pytest), while every reported cosine is
    recomputed by DuckDB from the parquet vectors."""
    from hiselspark.operators.similarity import ivf_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 20)
    # n_probe=8 of 16 cells: on STRUCTURELESS synthetic embeddings
    # (mean pairwise cos ~0, IVF's worst case) recall tracks the scan
    # fraction — 8/16 measures ~0.9@5 where 4/16 sat at ~0.58; on a
    # clustered corpus the same index gets that recall at far lower
    # n_probe (pytest covers that regime)
    out = ivf_topk(probes, emb, dim=64, k=5, probe_id_col="vec_id",
                   n_centroids=16, n_probe=8)
    out = out.withColumn("cos_sim", F.round("cos_sim", 6))
    return _assert_ann_recall(emb, out, 5, IVF_RECALL_FLOOR, "ivf_topk")


def q_mi_preselect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-MI preselection over embedding dims (the reference's
    ksgmi stage, reimplemented distributed).  Exact percentile bin
    edges make the estimate deterministic across partition layouts;
    the sf0.01 result is pinned as a literal-table oracle."""
    from hiselspark.preselect import mi_preselect
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    d = 16
    wide = emb.select(
        F.col("label").cast("long").alias("y"),
        *[F.col("embedding")[i].cast("double").alias(f"e{i}")
          for i in range(d)])
    cols = [f"e{i}" for i in range(d)]
    kept, mis = mi_preselect(wide, cols, ["y"], threshold=0.05,
                             n_bins=8, discrete_target=True,
                             exact_edges=True)
    rows = [(c, round(float(mis[c]), 6), c in kept) for c in cols]
    return spark.createDataFrame(rows,
                                 "feature string, mi double, kept boolean")


def q_streaming_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running totals drained to completion must equal the batch
    GROUP BY."""
    import hashlib
    import os
    from pyspark.sql import Window
    from hiselspark.streaming.sessions import (read_events_stream,
                                               run_stream_to_batch)
    from hiselspark.streaming.stateful import stream_running_totals
    batch = _ev(spark, sf_dir)
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    src_dir = f"/tmp/hiselspark_stream_src_{tag}"
    os.makedirs(src_dir, exist_ok=True)
    link = f"{src_dir}/events.parquet"
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/events.parquet", link)
    stream = (read_events_stream(spark, src_dir, batch.schema)
              .withColumn("ts", F.col("ts").cast("timestamp"))
              .withColumn("cents",
                          F.round(F.col("value") * 100).cast("long")))
    out = run_stream_to_batch(
        stream_running_totals(stream, "user_id", "ts", "cents"),
        output_mode="update")
    w = Window.partitionBy("entity").orderBy(F.col("n_events").desc())
    return (out.withColumn("rk", F.row_number().over(w))
               .filter(F.col("rk") == 1)
               .select(F.col("entity").alias("user_id"),
                       "n_events",
                       F.col("sum_value").alias("sum_cents"),
                       "first_ts_us", "last_ts_us"))


def q_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (fact salted, dim exploded) — must equal the
    plain join the oracle runs."""
    from hiselspark.operators.skew import salted_join
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    dim = (_ev(spark, sf_dir)
           .groupBy("user_id")
           .agg(F.count("*").alias("user_n")))
    joined = salted_join(ev, dim, on=["user_id"], n_salts=8,
                         deterministic_by="event_id")
    return (joined.groupBy("user_n")
                  .agg(F.count("*").alias("n_rows"),
                       F.sum("cents").alias("cents")))


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregate over (event_type, hour)."""
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    return (ev.rollup("event_type", F.hour("ts").alias("hr"))
              .agg(F.sum("cents").alias("cents"),
                   F.count("*").alias("n")))


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: users who click but never error (EXCEPT) plus
    users who both view and purchase (INTERSECT), tagged."""
    ev = _ev(spark, sf_dir)
    u = lambda t: (ev.filter(F.col("event_type") == t)  # noqa: E731
                     .select("user_id").distinct())
    click_no_error = u("click").exceptAll(u("error")).distinct()
    view_and_buy = u("view").intersect(u("purchase"))
    return (click_no_error.withColumn("tag", F.lit("click_no_error"))
            .unionByName(view_and_buy.withColumn("tag",
                                                 F.lit("view_and_buy"))))


def q_asof_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof (entity x time-bucket) as-of join — must equal the
    same DuckDB oracle as the plain asof_join."""
    from hiselspark.operators.chunked import chunked_asof_join
    ev = _ev(spark, sf_dir)
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .select("event_id", "user_id", "ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
                .groupBy("user_id", "ts")
                .agg(F.max("value").alias("click_value")))
    out = chunked_asof_join(purchases, clicks, on="user_id",
                            left_ts="ts", right_ts="ts",
                            value_cols=["click_value"],
                            bucket_seconds=86400.0)
    return out.select(
        "event_id", "user_id",
        _us("ts").alias("ts_us"),
        "click_value",
        _us("__matched_ts").alias("click_ts_us"))


def q_sessionize_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof sessionization (two-level scan over time buckets) —
    same oracle as the plain sessionize."""
    from hiselspark.operators.chunked import chunked_sessionize
    ev = _ev(spark, sf_dir)
    out = chunked_sessionize(ev, "user_id", "ts", gap_seconds=1800.0,
                             bucket_seconds=86400.0)
    return (out.groupBy("user_id", "session_id")
               .agg(F.count("*").alias("n_events"),
                    F.min(_us("ts")).alias("session_start_us")))


def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-user counts per event type (plus total events)."""
    ev = _ev(spark, sf_dir)
    return (ev.groupBy("event_type")
              .agg(F.countDistinct("user_id").alias("n_users"),
                   F.count("*").alias("n_events")))


def q_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-GROUP clustering: connected components over the
    verified near-duplicate pairs (jaccard >= 0.5), each doc labelled
    with min(member ids).  Oracle: the same pairs derived by exact SQL
    plus a recursive-CTE transitive closure."""
    from hiselspark.operators.dedup import (connected_components,
                                            minhash_near_duplicates)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_near_duplicates(docs, "doc_id", "text",
                                    num_hashes=32, bands=8, threshold=0.5)
    return (connected_components(pairs)
            .select(F.col("node").alias("doc_id"),
                    F.col("comp").alias("component")))


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio operator end-to-end with a REAL oracle: pack each
    embedding vector as 16-bit PCM, run the pcm16 decode + feature
    reduction (duration/RMS/peak/zero-crossing rate), and check the
    whole encode->decode->reduce path against DuckDB computing the same
    arithmetic directly on the floats."""
    from hiselspark.functions.audio import pack_pcm16, with_audio_features
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    clips = (emb.select("vec_id",
                        F.col("embedding").cast("array<double>")
                        .alias("v"))
             .withColumn("sample_rate", F.lit(16000))
             .withColumn("n_channels", F.lit(1))
             .withColumn("codec", F.lit("pcm16")))
    clips = pack_pcm16(clips, "v").drop("v")
    out = with_audio_features(clips)
    return out.select(
        "vec_id",
        F.round("au_duration_s", 6).alias("duration_s"),
        F.round("au_rms", 6).alias("rms"),
        F.round("au_peak", 6).alias("peak"),
        F.round("au_zcr", 6).alias("zcr"))


def _synth_raw_bytes(df: DataFrame, key_col: str, mult: int, step: int,
                     n_bytes: int) -> DataFrame:
    """Deterministic byte payloads ``p[i] = (key*mult + i*step) % 256``
    as an Arrow-batched pandas UDF — the gate's stand-in for real
    image/video payloads, chosen because DuckDB can reproduce every
    pixel arithmetically (the oracle never touches binary)."""
    import numpy as np
    import pandas as pd

    def synth(keys):
        k = keys.to_numpy(dtype=np.int64)
        i = np.arange(n_bytes, dtype=np.int64)
        block = ((k[:, None] * mult + i[None, :] * step) % 256
                 ).astype(np.uint8)
        return pd.Series([block[r].tobytes() for r in range(len(k))])

    udf = F.pandas_udf(synth, "binary")
    return df.withColumn("bytes", udf(F.col(key_col)))


def _synth_raw_bytes_vstep(df: DataFrame, key_col: str, step_col: str,
                           mult: int, n_bytes: int) -> DataFrame:
    """``_synth_raw_bytes`` with a PER-IMAGE byte step
    ``p[i] = (key*mult + i*step) % 256`` — images with different
    steps are structurally different (different neighbor gradients),
    while adding a constant to ``key*mult`` is a pure brightness
    shift regardless of step."""
    import numpy as np
    import pandas as pd

    def synth(keys, steps):
        k = keys.to_numpy(dtype=np.int64)
        st = steps.to_numpy(dtype=np.int64)
        i = np.arange(n_bytes, dtype=np.int64)
        block = ((k[:, None] * mult + i[None, :] * st[:, None]) % 256
                 ).astype(np.uint8)
        return pd.Series([block[r].tobytes() for r in range(len(k))])

    udf = F.pandas_udf(synth, "binary")
    return df.withColumn("bytes", udf(F.col(key_col), F.col(step_col)))


def q_image_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode + histogram pixel-stats path end-to-end with a REAL
    oracle: synthesize 8x8 raw RGB images whose pixel values are pure
    arithmetic in the order key, run the production ``with_pixel_stats``
    (uint8 histogram reduction — never widened), and check per-channel
    means, stds and combined-channel quantiles against DuckDB computing
    the same arithmetic directly."""
    from hiselspark.functions.image import with_pixel_stats
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    imgs = (orders.select(F.col("o_orderkey").alias("okey"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8))
            .withColumn("fmt", F.lit("raw")))
    imgs = _synth_raw_bytes(imgs, "okey", 7919, 31, 8 * 8 * 3)
    out = with_pixel_stats(imgs)
    return out.select(
        "okey",
        F.round("px_mean_r", 6).alias("mean_r"),
        F.round("px_mean_g", 6).alias("mean_g"),
        F.round("px_mean_b", 6).alias("mean_b"),
        F.round("px_std_r", 6).alias("std_r"),
        F.round("px_q25", 6).alias("q25"),
        F.round("px_q50", 6).alias("q50"),
        F.round("px_q75", 6).alias("q75"))


def q_image_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized 4x4x4 color-cube stats per synthesized 8x8 image —
    exact cell counts, dominant cell with lowest-index tie rule, and
    the entropy left fold in bin order; the oracle reproduces every
    pixel, cell count and fold term."""
    from hiselspark.functions.image import with_color_stats
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = (orders.select(F.col("o_orderkey").alias("okey"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8)))
    imgs = _synth_raw_bytes(base, "okey", 7919, 31, 8 * 8 * 3)
    out = with_color_stats(imgs, 4)
    return out.select("okey", "n_bins", "dom_bin",
                      F.round("dom_share", 6).alias("dom_share"),
                      F.round("color_entropy", 6).alias("color_entropy"))


def q_image_ssim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiled SSIM between two synthesized 8x8 raw payloads per order
    key — the pandas stage emits exact BIGINT tile sums, the SSIM
    double formula is one JVM expression; the oracle reproduces every
    pixel, every integer sum and the identical double arithmetic."""
    from hiselspark.functions.image import ssim_tiles
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = (orders.select(F.col("o_orderkey").alias("okey"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8)))
    a = _synth_raw_bytes(base, "okey", 7919, 31, 8 * 8 * 3) \
        .withColumnRenamed("bytes", "bytes_a")
    ab = _synth_raw_bytes(a, "okey", 104_729, 57, 8 * 8 * 3) \
        .withColumnRenamed("bytes", "bytes_b")
    out = ssim_tiles(ab, "bytes_a", "bytes_b", tile=4)
    return out.select("okey", "ti", "tj", "sx", "sy", "sxx", "syy",
                      "sxy", F.round("ssim", 6).alias("ssim"))


def q_image_spatial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial image features end-to-end: 2x2 tile brightness means +
    gradient (sharpness) energy over synthesized 8x8 raw payloads —
    the oracle reproduces every pixel and every |diff| arithmetically
    in SQL."""
    from hiselspark.functions.image import with_spatial_features
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    imgs = (orders.select(F.col("o_orderkey").alias("okey"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8))
            .withColumn("fmt", F.lit("raw")))
    imgs = _synth_raw_bytes(imgs, "okey", 7919, 31, 8 * 8 * 3)
    out = with_spatial_features(imgs, grid=2)
    return out.select(
        "okey",
        *[F.round(F.element_at("tile_means", i + 1), 6)
           .alias(f"tile{i}") for i in range(4)],
        F.round("edge_dx", 6).alias("edge_dx"),
        F.round("edge_dy", 6).alias("edge_dy"),
        F.round("edge_energy", 6).alias("edge_energy"))


def q_image_conv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3x3 integer Laplacian convolution stats end-to-end (decode ->
    grayscale-sum -> valid-region stencil -> exact-integer reductions)
    over synthesized 8x8 raw payloads — the oracle recomputes every
    pixel, every response and every reduction arithmetically in SQL."""
    from hiselspark.functions.image import with_conv_features
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    imgs = (orders.select(F.col("o_orderkey").alias("okey"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8))
            .withColumn("fmt", F.lit("raw")))
    imgs = _synth_raw_bytes(imgs, "okey", 7919, 31, 8 * 8 * 3)
    out = with_conv_features(imgs)
    return out.select(
        "okey",
        F.round("conv_abs_mean", 6).alias("conv_abs_mean"),
        "conv_max", "conv_n_pos")


def q_image_equalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram equalization end-to-end on synthesized 8x8 raw
    payloads — the exact-integer LUT (no float division anywhere)
    means DuckDB replays every histogram count, every CDF step and
    every remapped pixel."""
    from hiselspark.functions.image import with_equalized_stats
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    imgs = (orders.select(F.col("o_orderkey").alias("okey"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8))
            .withColumn("fmt", F.lit("raw")))
    imgs = _synth_raw_bytes(imgs, "okey", 7919, 31, 8 * 8 * 3)
    out = with_equalized_stats(imgs)
    return out.select("okey", "eq_sum",
                      F.round("eq_mean", 6).alias("eq_mean"),
                      "eq_distinct")


def q_image_otsu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Otsu adaptive binarization end-to-end on synthesized 8x8 raw
    payloads: exact integer histogram cumulatives, exact sub-2^53
    between-class-variance scores, first-occurrence argmax — the SQL
    oracle replays every candidate score and picks the same threshold
    bit-for-bit."""
    from hiselspark.functions.image import with_otsu_stats
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    imgs = (orders.select(F.col("o_orderkey").alias("okey"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8))
            .withColumn("fmt", F.lit("raw")))
    imgs = _synth_raw_bytes(imgs, "okey", 7919, 31, 8 * 8 * 3)
    out = with_otsu_stats(imgs)
    return out.select("okey", "otsu_t", "fg_count", "fg_sum")


def q_image_morph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3x3 binary erosion/dilation counts on the mask gray>380 over
    synthesized 8x8 raw payloads — every neighborhood min/max replayed
    inline-arithmetically by the SQL oracle."""
    from hiselspark.functions.image import with_morphology_stats
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    imgs = (orders.select(F.col("o_orderkey").alias("okey"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8))
            .withColumn("fmt", F.lit("raw")))
    imgs = _synth_raw_bytes(imgs, "okey", 7919, 31, 8 * 8 * 3)
    out = with_morphology_stats(imgs, thresh=380)
    return out.select("okey", "n_fg", "n_eroded", "n_dilated")


def q_image_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-connected components of the thresholded mask per image
    (blob count + largest blob) on synthesized 8x8 raw payloads — the
    oracle rebuilds the pixel graph and replays min-label propagation
    with a recursive CTE."""
    from hiselspark.functions.image import with_blob_stats
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .filter(F.col("o_orderkey") <= 1200))
    imgs = (orders.select(F.col("o_orderkey").alias("okey"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8))
            .withColumn("fmt", F.lit("raw")))
    imgs = _synth_raw_bytes(imgs, "okey", 7919, 31, 8 * 8 * 3)
    out = with_blob_stats(imgs, thresh=380)
    return out.select("okey", "n_blobs", "max_blob")


def q_image_gradhist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOG-lite 8-sector gradient orientation histogram (integer
    octant tests, L1 magnitudes) on synthesized 8x8 raw payloads —
    every gradient, octant comparison and magnitude sum replayed
    inline-arithmetically by the SQL oracle."""
    from hiselspark.functions.image import with_gradient_hist
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    imgs = (orders.select(F.col("o_orderkey").alias("okey"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8))
            .withColumn("fmt", F.lit("raw")))
    imgs = _synth_raw_bytes(imgs, "okey", 7919, 31, 8 * 8 * 3)
    out = with_gradient_hist(imgs)
    return out.select("okey", *[f"hog{b}" for b in range(8)],
                      "n_flat")


def q_image_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer image moments (raw + central numerators, the Hu
    shape-descriptor base) on synthesized 8x8 raw payloads — every
    moment recomputed arithmetically by the SQL oracle."""
    from hiselspark.functions.image import with_image_moments
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    imgs = (orders.select(F.col("o_orderkey").alias("okey"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8))
            .withColumn("fmt", F.lit("raw")))
    imgs = _synth_raw_bytes(imgs, "okey", 7919, 31, 8 * 8 * 3)
    out = with_image_moments(imgs)
    return out.select("okey", "m00", "m10", "m01", "cn20", "cn11",
                      "cn02")


def q_image_boxpeak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak 3x3 box sum per image computed via a summed-area table —
    the oracle PROVES the SAT algebra by recomputing every box with
    direct 9-term addition and replaying the row-major argmax."""
    from hiselspark.functions.image import with_box_peak
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    imgs = (orders.select(F.col("o_orderkey").alias("okey"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8))
            .withColumn("fmt", F.lit("raw")))
    imgs = _synth_raw_bytes(imgs, "okey", 7919, 31, 8 * 8 * 3)
    out = with_box_peak(imgs)
    return out.select("okey", "box_max", "box_y", "box_x")


def q_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real perceptual hash computed from pixels: dHash (9x8 nearest
    downsample -> 64 horizontal-gradient sign bits, packed as two
    uint32 halves) over synthesized raw payloads — every bit
    recomputed arithmetically by the SQL oracle."""
    from hiselspark.functions.image import with_dhash
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    imgs = (orders.select(F.col("o_orderkey").alias("okey"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8))
            .withColumn("fmt", F.lit("raw")))
    imgs = _synth_raw_bytes(imgs, "okey", 7919, 31, 8 * 8 * 3)
    out = with_dhash(imgs)
    return out.select("okey", "dhash_lo", "dhash_hi")


def q_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end image near-dup mining on COMPUTED hashes: payloads
    seeded by okey%500 plant duplicate groups; dHash halves act as
    pigeonhole bands (a ≤6-bit pair must agree on one uint32 half),
    candidates verified by exact Hamming ≤ 6.  The oracle recomputes
    hashes, banding and Hamming arithmetically."""
    from hiselspark.functions.image import with_dhash
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .filter(F.col("o_orderkey") <= 3000))
    imgs = (orders.select(F.col("o_orderkey").alias("okey"))
            .withColumn("seed", F.pmod(F.col("okey"), F.lit(500))
                        .cast("long"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8))
            .withColumn("fmt", F.lit("raw")))
    imgs = _synth_raw_bytes(imgs, "seed", 7919, 31, 8 * 8 * 3)
    h = with_dhash(imgs).select("okey", "dhash_lo", "dhash_hi")
    a = h.select(F.col("okey").alias("a"),
                 F.col("dhash_lo").alias("alo"),
                 F.col("dhash_hi").alias("ahi"))
    b = h.select(F.col("okey").alias("b"),
                 F.col("dhash_lo").alias("blo"),
                 F.col("dhash_hi").alias("bhi"))
    cand = (a.join(b, (F.col("a") < F.col("b"))
                   & ((F.col("alo") == F.col("blo"))
                      | (F.col("ahi") == F.col("bhi")))))
    ham = (F.bit_count(F.col("alo").bitwiseXOR(F.col("blo")))
           + F.bit_count(F.col("ahi").bitwiseXOR(F.col("bhi"))))
    out = (cand.withColumn("hamming", ham.cast("int"))
               .filter(F.col("hamming") <= 6))
    return out.groupBy("hamming").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("a").alias("n_left"))


def q_image_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end IMAGE curation chain on synthesized payloads with
    planted duplicate groups (seed = okey%400): decode → gradient
    sharpness score → drop the blurriest decile (corpus-relative
    threshold, exact integer compare) → perceptual-hash (dHash) exact
    dedup keeping the SHARPEST copy per group (ties → lowest id) →
    survivor histogram by duplicate-group size.  Every stage is exact
    integer arithmetic the oracle replays in SQL."""
    from pyspark.sql import Window
    from hiselspark.functions.image import (with_dhash,
                                            with_spatial_features)
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .filter(F.col("o_orderkey") <= 2000))
    imgs = (orders.select(F.col("o_orderkey").alias("okey"))
            .withColumn("seed", F.pmod(F.col("okey"), F.lit(400))
                        .cast("long"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8))
            .withColumn("fmt", F.lit("raw")))
    imgs = _synth_raw_bytes(imgs, "seed", 7919, 31, 8 * 8 * 3)
    feat = (with_spatial_features(imgs, grid=2)
            .select("okey", "seed",
                    # integer sharpness: sum|dx| over the frame
                    F.round(F.col("edge_dx") * (8 * 7 * 3))
                     .cast("long").alias("sharp")))
    hsh = with_dhash(imgs).select(F.col("okey").alias("hk"),
                                  "dhash_lo", "dhash_hi")
    j = feat.join(hsh, feat.okey == hsh.hk).drop("hk")
    # corpus-relative blur cut: strictly above the exact p10 of sharp
    p10 = F.expr("percentile(sharp, 0.1)")
    thresh = j.agg(p10.alias("t")).collect()[0]["t"]
    kept = j.filter(F.col("sharp").cast("double") > float(thresh))
    w = Window.partitionBy("dhash_lo", "dhash_hi").orderBy(
        F.col("sharp").desc(), F.col("okey").asc())
    surv = (kept.withColumn("rk", F.row_number().over(w))
                .withColumn("gsz", F.count(F.lit(1)).over(
                    Window.partitionBy("dhash_lo", "dhash_hi")))
                .filter(F.col("rk") == 1))
    return (surv.groupBy("gsz")
                .agg(F.count(F.lit(1)).alias("n_groups"),
                     F.min("okey").alias("min_survivor"))
                .select(F.col("gsz").cast("long").alias("group_size"),
                        "n_groups", "min_survivor"))


def q_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline end-to-end: synthesize 8x8 raw images, resize to
    4x4 with the production nearest-neighbor gather (pixel-center
    mapping: output (y,x) reads input (2y+1, 2x+1)), then pixel-stats
    the resized payload.  Oracle recomputes the sampled pixels
    arithmetically in SQL."""
    from hiselspark.functions.image import resize_images, with_pixel_stats
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    imgs = (orders.select(F.col("o_orderkey").alias("okey"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8))
            .withColumn("fmt", F.lit("raw")))
    imgs = _synth_raw_bytes(imgs, "okey", 7919, 31, 8 * 8 * 3)
    out = with_pixel_stats(resize_images(imgs, 4, 4))
    return out.select(
        "okey",
        F.round("px_mean_r", 6).alias("mean_r"),
        F.round("px_mean_g", 6).alias("mean_g"),
        F.round("px_mean_b", 6).alias("mean_b"),
        F.round("px_q50", 6).alias("q50"))


def q_lossy_codec_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The input-hint payload contract, end-to-end on REAL entropy
    codecs (libgd/libjpeg/libwebp via ctypes): synthesize a smooth
    deterministic image per document, encode as baseline JPEG q95
    (even doc_id) or lossless WebP (odd), decode back through the
    production codec registry, and emit the per-row contract bits —
    decoded-pixel PSNR >= 40 dB for lossy, exact pixels for lossless,
    exact caption round-trip.  The oracle states the contract as
    literals: any codec regression flips a boolean and the hash.
    All pixel work is Arrow-batched mapInPandas (no per-row Python)."""
    import pandas as pd

    from hiselspark.functions import gdcodec
    from hiselspark.functions.image import decode_image, psnr

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .where(F.col("doc_id") < 64)
            .select("doc_id", F.col("text").alias("caption")))
    schema = ("image_id long, w int, h int, fmt string, "
              "psnr_ok boolean, exact_ok boolean, caption string")

    def run(pdfs):
        import numpy as np
        for pdf in pdfs:
            rows = []
            for doc_id, caption in zip(pdf["doc_id"], pdf["caption"]):
                doc_id = int(doc_id)
                w = 24 + (doc_id % 8) * 2
                h = 16 + (doc_id % 5) * 4
                yy, xx = np.mgrid[0:h, 0:w]
                img = np.stack([
                    xx * 255.0 / (w - 1),
                    yy * 255.0 / (h - 1),
                    127 + 120 * np.sin(xx / (7.0 + doc_id % 11))
                    * np.cos(yy / (5.0 + doc_id % 7)),
                ], axis=-1).clip(0, 255).astype(np.uint8)
                if doc_id % 2 == 0:
                    fmt, buf = "jpeg", gdcodec.encode_jpeg(img, quality=95)
                else:
                    fmt, buf = "webp", gdcodec.encode_webp(img)  # lossless
                dec = decode_image(buf, w, h, fmt)
                p = psnr(img, dec)
                rows.append((doc_id, w, h, fmt, bool(p >= 40.0),
                             fmt == "jpeg" or bool((dec == img).all()),
                             caption))
            yield pd.DataFrame(rows, columns=[
                "image_id", "w", "h", "fmt",
                "psnr_ok", "exact_ok", "caption"])

    return docs.mapInPandas(run, schema)


def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling fan-out end-to-end: synthesize 6-frame 4x4
    rawv clips, sample every 2nd frame into image rows, pixel-stat the
    sampled frames — the multimodal pattern where video reuses the one
    image path.  Oracle recomputes each sampled frame's channel means
    arithmetically."""
    from hiselspark.functions.image import with_pixel_stats
    from hiselspark.functions.video import sample_frames
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    vids = (orders.filter(F.col("o_orderkey") % 4 == 0)
            .select(F.col("o_orderkey").alias("okey"))
            .withColumn("w", F.lit(4)).withColumn("h", F.lit(4))
            .withColumn("container", F.lit("rawv")))
    vids = (_synth_raw_bytes(vids, "okey", 131, 7, 6 * 4 * 4 * 3)
            .withColumnRenamed("bytes", "video"))
    frames = sample_frames(vids, every_k=2, id_col="okey",
                           bytes_col="video", container_col="container")
    out = with_pixel_stats(frames)
    return out.select(
        "okey", "frame_idx",
        F.round("px_mean_r", 6).alias("mean_r"),
        F.round("px_mean_g", 6).alias("mean_g"),
        F.round("px_mean_b", 6).alias("mean_b"))


def q_video_motion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Motion scoring (mean absolute inter-frame difference / 255) over
    synthesized rawv clips, oracle-checked against DuckDB computing the
    same frame-difference arithmetic."""
    from hiselspark.functions.video import with_motion_score
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    vids = (orders.filter(F.col("o_orderkey") % 4 == 0)
            .select(F.col("o_orderkey").alias("okey"))
            .withColumn("w", F.lit(4)).withColumn("h", F.lit(4))
            .withColumn("container", F.lit("rawv")))
    vids = (_synth_raw_bytes(vids, "okey", 131, 7, 6 * 4 * 4 * 3)
            .withColumnRenamed("bytes", "video"))
    out = with_motion_score(vids, id_col="okey", bytes_col="video",
                            container_col="container")
    return out.select("okey",
                      F.round("motion_score", 6).alias("motion"))


def q_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-sharded training-corpus sink, round-tripped: write the
    documents as shard-partitioned parquet (shard = content_hash %
    n_shards, size-bounded files), read them BACK from disk, and
    aggregate per shard.  Oracle recomputes every row's shard
    arithmetically in DuckDB — the write -> read round trip must
    reproduce the exact per-shard membership."""
    import hashlib
    import os
    from hiselspark.sinks import read_training_shards, write_training_shards
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    st = os.stat(f"{sf_dir}/documents.parquet")
    params = "shards8:salt3:maxrec200"  # keep in sync with the call
    tag = hashlib.sha1(
        f"{sf_dir}:{st.st_mtime_ns}:{st.st_size}:{params}"
        .encode()).hexdigest()[:10]
    path = f"/tmp/hiselspark_shards_{tag}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        write_training_shards(docs, path, text_col="text", n_shards=8,
                              salt=3, max_records_per_file=200)
    back = read_training_shards(spark, path)
    return (back.groupBy(F.col("shard").cast("int").alias("shard"))
            .agg(F.count("*").alias("n_docs"),
                 F.sum("doc_id").cast("long").alias("sum_ids")))


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing manifest: documents laid
    head-to-tail on content-keyed token tapes, cut every 128 tokens;
    per-sequence doc count / filled tokens / straddle count.  DuckDB
    reproduces the whole segment table arithmetically (window cumsum +
    generate_series over the same polynomial stream hash)."""
    from hiselspark.operators.packing import (pack_sequences,
                                              sequence_manifest)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seg = pack_sequences(docs, text_col="text", id_col="doc_id",
                         seq_len=128, n_streams=4)
    m = sequence_manifest(seg)
    return m.select(F.col("stream").cast("int").alias("stream"),
                    F.col("seq").cast("long").alias("seq"),
                    F.col("n_docs").cast("long").alias("n_docs"),
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.col("n_straddle").cast("long").alias("n_straddle"))


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style n-gram repetition metrics per document (distinct-
    unigram fraction, top-1/2/3-gram fractions) — pure relational
    explode + two doc-keyed shuffles, reproduced verbatim in DuckDB."""
    from hiselspark.operators.repetition import repetition_stats
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (repetition_stats(docs)
            .withColumn("n_tokens", F.col("n_tokens").cast("int")))


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + masking on documents with deterministically
    injected emails/URLs/IPs (the corpus itself is clean): counts per
    kind and the exact masked text, string-matched against DuckDB
    running the SAME RE2-compatible patterns."""
    from hiselspark.operators.pii import with_pii
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id").cast("string")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact user"), d, F.lit("@example"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".com via https://s"),
            (F.col("doc_id") % 13).cast("string"), F.lit(".example/p"),
            F.when(F.col("doc_id") % 3 == 0,
                   F.concat(F.lit(" at 10.0."),
                            (F.col("doc_id") % 256).cast("string"),
                            F.lit("."),
                            (F.col("doc_id") % 100).cast("string")))
            .otherwise(F.lit(""))).alias("text"))
    return (with_pii(injected)
            .select("doc_id", "n_email", "n_url", "n_ip",
                    F.length("text_scrubbed").alias("len_scrubbed"),
                    "text_scrubbed"))


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-keyed 30% Bernoulli sample — membership
    recomputed row-by-row in DuckDB from the same polynomial hash."""
    from hiselspark.operators.sampling import hash_sample
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (hash_sample(docs, 0.3, salt=7)
            .select("doc_id", "lang", "source"))


def q_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota cap (at most 10 docs per source, chosen by
    (content_hash, doc_id) priority) — the skew-safe two-level rank;
    DuckDB replays the global rank directly."""
    from hiselspark.operators.sampling import quota_sample
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (quota_sample(docs, "source", cap=10, salt=11)
            .select("doc_id", "source"))


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing by per-source token budget: keep docs in
    (content_hash, id) priority while the source's cumulative token
    count stays ≤ 600.  DuckDB replays the exact prefix-sum rule."""
    from hiselspark.operators.sampling import token_budget_sample
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (token_budget_sample(docs, "source", 600, salt=13)
            .select("doc_id", "source"))


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture reweighting (alpha=0.5): per-source
    budgets ∝ sqrt(source token mass) normalized to 4000 tokens —
    exact integer arithmetic (isqrt + floor division) so DuckDB
    replays budget derivation AND the prefix-sum cut bit-for-bit."""
    from hiselspark.operators.sampling import temperature_mix
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (temperature_mix(docs, "source", 0.5, 4000, salt=13)
            .select("doc_id", "source"))


def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (40-token windows, 8-token
    overlap) — map-only explode; DuckDB reproduces every window's
    bounds and exact chunk text via list slicing."""
    from hiselspark.operators.packing import chunk_documents
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return chunk_documents(docs, chunk_tokens=40, overlap=8)


def q_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END curation pipeline (PII scrub → Gopher quality filter
    → exact dedup → per-source token budget → sequence packing) on
    documents with injected PII; the oracle replays the ENTIRE chain
    in one DuckDB query and the final per-sequence packing manifest
    must hash-match — every stage's semantics are load-bearing."""
    from hiselspark.curation import curate_corpus
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id").cast("string")
    injected = docs.select(
        "doc_id", "source",
        F.concat(F.col("text"), F.lit(" contact user"), d,
                 F.lit("@example"),
                 (F.col("doc_id") % 7).cast("string"),
                 F.lit(".com via https://s"),
                 (F.col("doc_id") % 13).cast("string"),
                 F.lit(".example/p")).alias("text"))
    res = curate_corpus(injected, min_tokens=20, max_top1_frac=0.12,
                        group_col="source", token_budget=800,
                        seq_len=128, n_streams=4)
    m = res.manifest
    return m.select(F.col("stream").cast("int").alias("stream"),
                    F.col("seq").cast("long").alias("seq"),
                    F.col("n_docs").cast("long").alias("n_docs"),
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.col("n_straddle").cast("long").alias("n_straddle"))


def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (dropDuplicates on the content key,
    state across micro-batches) drained with AvailableNow — the
    surviving set of normalized texts must equal batch DISTINCT.
    Content-derived projection only: which duplicate copy survives is
    arrival-order-dependent, the normalized text is not."""
    import hashlib
    import os
    from hiselspark.streaming.dedup import stream_dedup
    from hiselspark.streaming.sessions import (read_events_stream,
                                               run_stream_to_batch)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tag = hashlib.sha1(f"docs:{sf_dir}".encode()).hexdigest()[:10]
    src_dir = f"/tmp/hiselspark_stream_docs_{tag}"
    os.makedirs(src_dir, exist_ok=True)
    link = f"{src_dir}/documents.parquet"
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/documents.parquet", link)
    stream = read_events_stream(spark, src_dir, docs.schema)
    out = run_stream_to_batch(stream_dedup(stream),
                              output_mode="append")
    return out.select(
        F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
        .alias("norm"))


def q_sketch_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch aggregates (HLL++ distinct, Greenwald–Khanna
    median) with their mathematical guarantees checked as booleans:
    the HLL estimate within 3·rsd of the exact count (recomputed in
    DuckDB), the GK median within its rank-error bound (counted
    against the real data).  Shuffle volume is O(groups) sketches —
    the 100-TB shape for cardinality/quantile questions."""
    from hiselspark.operators.sketches import (approx_distinct,
                                               approx_quantiles)
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .where(F.col("value").isNotNull()))
    d = approx_distinct(ev, "event_type", "user_id", rsd=0.05)
    q = approx_quantiles(ev, "event_type", "value", [0.5],
                         accuracy=1000)
    eps = 1.0 / 1000
    ranks = (ev.join(q, "event_type").groupBy("event_type").agg(
        F.sum(F.when(F.col("value") <= F.col("q50"), 1).otherwise(0))
        .alias("n_le"),
        F.sum(F.when(F.col("value") < F.col("q50"), 1).otherwise(0))
        .alias("n_lt"),
        F.count("*").alias("n")))
    return (d.join(ranks, "event_type").select(
        "event_type",
        F.col("n_exact").cast("long").alias("n_exact"),
        (F.abs(F.col("n_approx") - F.col("n_exact"))
         <= 0.15 * F.col("n_exact")).alias("hll_ok"),
        ((F.col("n_le") >= F.floor((0.5 - eps) * F.col("n")))
         & (F.col("n_lt") <= F.ceil((0.5 + eps) * F.col("n"))))
        .alias("gk_rank_ok")))


def q_snapshot_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot table with Iceberg-style manifest stats: documents
    committed as 4 disjoint doc_id-range files, read back through the
    stats-pruned path with a range predicate — the answer must equal
    the plain SQL filter (pruning is an optimization, never a
    semantics change).  The file-skipping itself is plan-asserted in
    pytest (inputFiles count)."""
    import hashlib
    import os
    from hiselspark.sources.snapshots import SnapshotTable
    st = os.stat(f"{sf_dir}/documents.parquet")
    tag = hashlib.sha1(
        f"snapprune:{sf_dir}:{st.st_mtime_ns}:{st.st_size}"
        .encode()).hexdigest()[:10]
    root = f"/tmp/hiselspark_snap_{tag}"
    t = SnapshotTable(root)
    if t.current() is None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = docs.count()
        step = (n + 3) // 4
        for i in range(4):
            part = docs.where(
                (F.col("doc_id") >= i * step)
                & (F.col("doc_id") < (i + 1) * step)).coalesce(1)
            t.write(part, mode="append")
    lo, hi = 120, 260
    out = t.read(spark, where=[("doc_id", "between", (lo, hi))])
    return (out.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("doc_id").cast("long").alias("sum_ids"),
                 F.sum(F.length("text")).cast("long").alias("sum_len")))


def _ensure_snapinc_table(spark: SparkSession, sf_dir: str) -> str:
    """Shared fixture: documents committed as 4 doc_id-quartile
    appends (v1..v4), cached in /tmp keyed on the source parquet."""
    import hashlib
    import os
    from hiselspark.sources.snapshots import SnapshotTable
    st = os.stat(f"{sf_dir}/documents.parquet")
    tag = hashlib.sha1(
        f"snapinc:{sf_dir}:{st.st_mtime_ns}:{st.st_size}"
        .encode()).hexdigest()[:10]
    root = f"/tmp/hiselspark_snapinc_{tag}"
    t = SnapshotTable(root)
    cur = t.current()
    if cur is None or cur.version != 4:
        import shutil
        if os.path.exists(root):        # stale partial build: restart
            shutil.rmtree(root)
        t = SnapshotTable(root)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = docs.count()
        step = (n + 3) // 4
        for i in range(4):
            part = docs.where(
                (F.col("doc_id") >= i * step)
                & (F.col("doc_id") < (i + 1) * step)).coalesce(1)
            t.write(part, mode="append")
    return root


def q_snapshot_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-style incremental append scan: documents committed as 4
    doc_id-range appends; reading the delta (v1, v3] must return
    exactly the rows of batches 2 and 3 — what a checkpointed consumer
    reads to catch up without rescanning history."""
    from hiselspark.sources.snapshots import SnapshotTable
    t = SnapshotTable(_ensure_snapinc_table(spark, sf_dir))
    inc = t.read_incremental(spark, from_version=1, to_version=3)
    return (inc.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("doc_id").cast("long").alias("sum_ids"),
                 F.sum(F.length("text")).cast("long").alias("sum_len")))


def q_snapshot_catchup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resumable catch-up featurization: the derived features table
    follows the 4-append documents table in TWO catch-up calls (first
    bounded to v2, then to current), each transforming only its delta
    and stamping the processed source version; a third call is an
    idempotent no-op.  The oracle replays the whole chain as a single
    featurization of the full table — delta-transform-append must be
    indistinguishable from transform-everything."""
    import hashlib
    import os
    import shutil
    from hiselspark.functions.text import token_count
    from hiselspark.incremental import (SOURCE_VERSION_PROP, catchup,
                                        processed_source_version)
    from hiselspark.sources.snapshots import SnapshotTable

    src = SnapshotTable(_ensure_snapinc_table(spark, sf_dir))
    st = os.stat(f"{sf_dir}/documents.parquet")
    tag = hashlib.sha1(
        f"snapcatch:{sf_dir}:{st.st_mtime_ns}:{st.st_size}"
        .encode()).hexdigest()[:10]
    root = f"/tmp/hiselspark_snapcatch_{tag}"
    drv = SnapshotTable(root)

    def feat(df: DataFrame) -> DataFrame:
        return df.select(
            "doc_id", "source",
            token_count("text").cast("long").alias("n_tok"),
            F.length("text").cast("long").alias("text_len"))

    cur = drv.current()
    if cur is None or cur.version != 2 or \
            cur.properties.get(SOURCE_VERSION_PROP) != "4":
        if os.path.exists(root):        # stale partial build: restart
            shutil.rmtree(root)
        drv = SnapshotTable(root)
        catchup(spark, src, drv, feat, to_version=2)   # drv v1
        catchup(spark, src, drv, feat)                 # drv v2 (delta)
    if catchup(spark, src, drv, feat) is not None:     # must no-op
        raise AssertionError("catch-up on a current table re-ran")
    if processed_source_version(drv) != 4:
        raise AssertionError("derived table not current through v4")
    return drv.read(spark)


def q_snapshot_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write DELETE WHERE on the snapshot table with honest
    stats pruning (the 0..99 and 200..299 range files ride into the
    new snapshot by reference) and non-destructive time travel — the
    output joins the post-delete aggregate with the pre-delete
    version's, and the oracle replays both from the parquet."""
    import hashlib
    import os
    import shutil
    from hiselspark.sources.snapshots import SnapshotTable
    st = os.stat(f"{sf_dir}/documents.parquet")
    tag = hashlib.sha1(
        f"snapdel:{sf_dir}:{st.st_mtime_ns}:{st.st_size}"
        .encode()).hexdigest()[:10]
    root = f"/tmp/hiselspark_snapdel_{tag}"
    t = SnapshotTable(root)
    cur = t.current()
    if cur is None or cur.version != 4 or cur.operation != "delete":
        if os.path.exists(root):
            shutil.rmtree(root)
        t = SnapshotTable(root)
        docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                .select("doc_id", "text", "source"))
        for lo in (0, 100, 200):                       # v1..v3
            t.write(docs.where(F.col("doc_id").between(lo, lo + 99))
                    .coalesce(1), mode="append")
        t.delete_where(spark, "doc_id", "between", (120, 179))  # v4
        snap = t.current()
        assert snap.properties.get("carried_files") == "2" or \
            int(snap.properties.get("carried_files", 0)) == 2, \
            "stats prune must carry the two untouched range files"
    now = t.read(spark).groupBy("source").agg(
        F.count("*").alias("n_now"),
        F.sum("doc_id").cast("long").alias("ids_now"))
    before = t.read(spark, version=3).groupBy("source").agg(
        F.count("*").alias("n_before"))
    return now.join(before, "source")


def q_snapshot_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order compaction (Iceberg rewrite_data_files) as its own
    gate: 6 single-file streaming-style commits are bin-packed into 2
    z-ordered files; rows must be IDENTICAL before and after (joined
    per-source aggregates), the file counts are deterministic
    contract constants, and time travel to the pre-compact version
    still works — the oracle replays the aggregates from parquet and
    pins the 6 -> 2 file contract."""
    import hashlib
    import os
    import shutil
    from hiselspark.sources.snapshots import SnapshotTable
    st = os.stat(f"{sf_dir}/documents.parquet")
    tag = hashlib.sha1(
        f"snapcompact:{sf_dir}:{st.st_mtime_ns}:{st.st_size}"
        .encode()).hexdigest()[:10]
    root = f"/tmp/hiselspark_snapcompact_{tag}"
    t = SnapshotTable(root)
    cur = t.current()
    if cur is None or cur.version != 7 or cur.operation != "compact":
        if os.path.exists(root):
            shutil.rmtree(root)
        t = SnapshotTable(root)
        docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                .select("doc_id", "text", "source"))
        for lo in range(0, 300, 50):                   # v1..v6
            t.write(docs.where(F.col("doc_id").between(lo, lo + 49))
                    .coalesce(1), mode="append")
        t.compact(spark, target_files=2, zorder_by=["doc_id"])  # v7
    snap = t.current()
    files_before = int(snap.properties.get("compacted_from", -1))
    files_after = len(snap.files)
    assert snap.operation == "compact"
    now = t.read(spark).groupBy("source").agg(
        F.count("*").alias("n_now"),
        F.sum("doc_id").cast("long").alias("ids_now"))
    before = t.read(spark, version=6).groupBy("source").agg(
        F.count("*").alias("n_before"))
    return (now.join(before, "source")
            .withColumn("files_before", F.lit(files_before)
                        .cast("long"))
            .withColumn("files_after", F.lit(files_after)
                        .cast("long")))


def q_snapshot_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-style ROLLBACK as a new commit: v1 = docs 0-99, v2
    appends 100-199, v3 = rollback(1) — the latest read must equal v1
    exactly while v2 stays time-travelable (checked via version=2
    rowcount in the same output row set: one row per doc plus a
    summary row would break schema, so the v2 check rides in pytest;
    here the oracle replays the v1 content)."""
    import hashlib
    import os
    import shutil
    from hiselspark.sources.snapshots import SnapshotTable
    st = os.stat(f"{sf_dir}/documents.parquet")
    tag = hashlib.sha1(
        f"snaprb:{sf_dir}:{st.st_mtime_ns}:{st.st_size}"
        .encode()).hexdigest()[:10]
    root = f"/tmp/hiselspark_snaprb_{tag}"
    t = SnapshotTable(root)
    cur = t.current()
    if cur is None or cur.version != 3 or cur.operation != "rollback":
        if os.path.exists(root):
            shutil.rmtree(root)
        t = SnapshotTable(root)
        docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                .select("doc_id", "text"))
        t.write(docs.where(F.col("doc_id") < 100).coalesce(1),
                mode="append")
        t.write(docs.where(F.col("doc_id").between(100, 199))
                .coalesce(1), mode="append")
        t.rollback(1)
    out = t.read(spark)
    return out.select("doc_id", F.length("text").alias("text_len"))


def q_snapshot_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write MERGE on the snapshot table: target = documents
    with doc_id < 300 committed as 3 range files; source updates
    150..249 (text + '!', source -> 'upd') and inserts 400..449; the
    table is then compacted (operation that must not change rows).
    Only the two files containing matched keys are rewritten — the
    0..99 file rides into the new snapshot by reference (asserted in
    pytest; here the ORACLE replays the whole MERGE in SQL)."""
    import hashlib
    import os
    import shutil
    from hiselspark.sources.snapshots import SnapshotTable
    st = os.stat(f"{sf_dir}/documents.parquet")
    tag = hashlib.sha1(
        f"snapup:{sf_dir}:{st.st_mtime_ns}:{st.st_size}"
        .encode()).hexdigest()[:10]
    root = f"/tmp/hiselspark_snapup_{tag}"
    t = SnapshotTable(root)
    cur = t.current()
    if cur is None or cur.version != 5 or cur.operation != "compact":
        if os.path.exists(root):        # stale partial build: restart
            shutil.rmtree(root)
        t = SnapshotTable(root)
        docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                .select("doc_id", "text", "source"))
        for lo in (0, 100, 200):                       # v1..v3
            t.write(docs.where(F.col("doc_id").between(lo, lo + 99))
                    .coalesce(1), mode="append")
        src = (docs.where(F.col("doc_id").between(150, 249))
               .withColumn("text", F.concat("text", F.lit("!")))
               .withColumn("source", F.lit("upd"))
               .unionByName(
                   docs.where(F.col("doc_id").between(400, 449))))
        t.upsert(src.coalesce(1), ["doc_id"])          # v4
        t.compact(spark, target_files=1)               # v5
    out = t.read(spark)
    return (out.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("doc_id").cast("long").alias("sum_ids"),
                 F.sum(F.length("text")).cast("long").alias("sum_len")))


def q_snapshot_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The snapshot table's commit log consumed AS A STREAM (Spark 4
    Python Data Source: versions are offsets): starting after v1, an
    availableNow drain must deliver exactly the rows of appends
    v2..v4, once — the streaming twin of the incremental batch scan,
    against the matching SQL oracle."""
    from hiselspark.sources.stream_source import SnapshotStreamDataSource
    from hiselspark.streaming.sessions import run_stream_to_batch
    root = _ensure_snapinc_table(spark, sf_dir)
    try:
        spark.dataSource.register(SnapshotStreamDataSource)
    except Exception:       # already registered in this session
        pass
    stream = (spark.readStream.format("snapshot_stream")
              .option("path", root).option("startVersion", "1").load())
    agg = (stream.groupBy("source")
           .agg(F.count("*").alias("n_docs"),
                F.sum("doc_id").cast("long").alias("sum_ids"),
                F.sum(F.length("text")).cast("long").alias("sum_len")))
    return run_stream_to_batch(agg, output_mode="complete")


def q_zorder_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order rewrite + 2-D stats pruning: documents re-clustered on
    a Morton interleave of (doc_id, n_chars), then read through a box
    predicate on BOTH columns.  The pruning (files skipped in both
    dimensions) is plan-asserted in pytest; the ORACLE here pins the
    semantics — re-clustering must never change a query's answer."""
    import hashlib
    import os
    import shutil
    from hiselspark.sources.snapshots import SnapshotTable
    st = os.stat(f"{sf_dir}/documents.parquet")
    tag = hashlib.sha1(
        f"snapz:{sf_dir}:{st.st_mtime_ns}:{st.st_size}"
        .encode()).hexdigest()[:10]
    root = f"/tmp/hiselspark_snapz_{tag}"
    t = SnapshotTable(root)
    cur = t.current()
    if cur is None or cur.operation != "compact":
        if os.path.exists(root):        # stale partial build: restart
            shutil.rmtree(root)
        t = SnapshotTable(root)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        t.write(docs.repartition(8), mode="append")
        t.compact(spark, target_files=8,
                  zorder_by=["doc_id", "n_chars"])
    out = t.read(spark, where=[("doc_id", "between", (100, 299)),
                               ("n_chars", "between", (100, 300))])
    return (out.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("doc_id").cast("long").alias("sum_ids"),
                 F.sum("n_chars").cast("long").alias("sum_chars")))


def q_bucketed_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join over BUCKETED tables: both sides hash-bucketed
    on user_id at write time, so the join reads pre-shuffled buckets
    and skips the exchange (plan-asserted in tests/test_plans.py) —
    the persistent-layout lever for repeated fact-fact joins at
    10^12 rows.  Results are layout-independent; the oracle is the
    plain join."""
    import hashlib
    from hiselspark.sources.bucketed import ensure_bucketed
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    ev = _ev(spark, sf_dir)

    def facts():
        return ev.select("event_id", "user_id",
                         F.round(F.col("value") * 100).cast("long")
                         .alias("cents"))

    def dims():
        return ev.groupBy("user_id").agg(F.count("*").alias("user_n"))

    f = ensure_bucketed(spark, f"bkt_events_{tag}", facts, ["user_id"], 8,
                        path=f"/tmp/hiselspark_bkt_{tag}/facts")
    d = ensure_bucketed(spark, f"bkt_users_{tag}", dims, ["user_id"], 8,
                        path=f"/tmp/hiselspark_bkt_{tag}/dims")
    return (f.join(d.hint("merge"), "user_id")
            .groupBy("user_n")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("cents").cast("long").alias("cents")))


def q_streaming_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling aggregation with REAL late data: events
    with event_id % 97 == 0 are held back and replayed after the
    watermark has passed (deterministic micro-batch order via one file
    per trigger).  Spark drops a late row iff its day-window was
    already evicted — window_end <= watermark at its arrival batch,
    where that watermark is max(on-time ts) - 2 days (verified
    empirically: the filter is window-end-based, not row-ts-based).
    The oracle applies the same accept rule in SQL.  Sentinel rows
    (user_id -1, filtered out) advance the watermark so every real
    window is emitted in append mode before the stream ends."""
    from hiselspark.streaming.sessions import (read_events_stream,
                                               run_stream_to_batch,
                                               stage_microbatch_files,
                                               stream_tumbling)
    import datetime
    import hashlib
    import os
    ev = _ev(spark, sf_dir).withColumn("ts", F.col("ts").cast("timestamp"))
    late = ev.filter(F.col("event_id") % 97 == 0)
    ontime = ev.filter(F.col("event_id") % 97 != 0)
    # tag includes the source file's (mtime, size): this staging COPIES
    # rows, so a regenerated corpus at the same path must re-stage
    st = os.stat(f"{sf_dir}/events.parquet")
    tag = hashlib.sha1(
        f"{sf_dir}:{st.st_mtime_ns}:{st.st_size}".encode()).hexdigest()[:10]
    src = f"/tmp/hiselspark_latedata_{tag}"
    if not os.path.exists(f"{src}/0004.parquet"):
        maxts = ontime.agg(F.max("ts")).collect()[0][0]

        def sentinel(ts):
            return spark.createDataFrame(
                [(-1, ts, -1, "sentinel", 0.0, "")], ev.schema)

        # batch order: on-time backlog; spacer (evicts windows closed
        # by the on-time watermark BEFORE the late rows arrive); late
        # rows; two flush sentinels (the last batch emits every real
        # window: its watermark is maxts + 28 days)
        stage_microbatch_files(
            [ontime,
             sentinel(maxts),
             late,
             sentinel(maxts + datetime.timedelta(days=30)),
             sentinel(maxts + datetime.timedelta(days=31))],
            src)
    stream = (read_events_stream(spark, src, ev.schema,
                                 max_files_per_trigger=1)
              .withColumn("ts", F.col("ts").cast("timestamp"))
              .withColumn("cents",
                          F.round(F.col("value") * 100).cast("long")))
    agg = stream_tumbling(stream, "user_id", "ts",
                          {"cents": ["sum", "count"]},
                          window_seconds=86400,
                          watermark_seconds=2 * 86400)
    out = run_stream_to_batch(agg, output_mode="append")
    return (out.filter(F.col("user_id") >= 0)
            .select("user_id",
                    _us(F.col("window.start")).alias("day_us"),
                    F.col("cents_count").alias("n_events"),
                    F.col("cents_sum").alias("cents")))


def q_streaming_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming as-of enrichment (applyInPandasWithState): clicks
    update per-user state, purchases are enriched with the most recent
    click value at-or-before them.  Replayed as four event-time-ordered
    micro-batches (state crosses batch edges), drained result must
    equal the batch ASOF JOIN oracle."""
    import hashlib
    import os
    from hiselspark.streaming.asof import stream_asof_enrich
    from hiselspark.streaming.sessions import (read_events_stream,
                                               run_stream_to_batch,
                                               stage_microbatch_files)
    ev = _ev(spark, sf_dir).withColumn("ts", F.col("ts").cast("timestamp"))
    sub = ev.filter(F.col("event_type").isin("click", "purchase"))
    st = os.stat(f"{sf_dir}/events.parquet")
    tag = hashlib.sha1(
        f"{sf_dir}:{st.st_mtime_ns}:{st.st_size}".encode()).hexdigest()[:10]
    src = f"/tmp/hiselspark_streamasof_{tag}"
    if not os.path.exists(f"{src}/0003.parquet"):
        max_id = sub.agg(F.max("event_id")).collect()[0][0]
        cut = max_id // 4 + 1
        stage_microbatch_files(
            [sub.filter((F.col("event_id") >= i * cut)
                        & (F.col("event_id") < (i + 1) * cut))
             for i in range(4)], src)
    stream = (read_events_stream(spark, src, ev.schema,
                                 max_files_per_trigger=1)
              .withColumn("ts", F.col("ts").cast("timestamp"))
              .withColumn("us", (F.col("ts").cast("double")
                                 * 1_000_000).cast("long"))
              .withColumn("is_feature", F.col("event_type") == "click")
              .withColumn("fvalue", F.col("value").cast("double")))
    return run_stream_to_batch(stream_asof_enrich(stream),
                               output_mode="append")


def q_streaming_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming touch attribution (applyInPandasWithState, O(1)
    state): purchases credited on arrival with the user's first-ever
    touch and the horizon-windowed last touch.  Replayed as four
    event-time-ordered micro-batches; the drained result must equal
    the batch SQL oracle row-for-row."""
    import hashlib
    import os
    from hiselspark.streaming.attribution import stream_attribution
    from hiselspark.streaming.sessions import (read_events_stream,
                                               run_stream_to_batch,
                                               stage_microbatch_files)
    ev = _ev(spark, sf_dir).withColumn("ts",
                                       F.col("ts").cast("timestamp"))
    sub = ev.filter(F.col("event_type").isin("view", "click",
                                             "purchase"))
    st = os.stat(f"{sf_dir}/events.parquet")
    tag = hashlib.sha1(
        f"{sf_dir}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:10]
    src = f"/tmp/hiselspark_streamattr_{tag}"
    if not os.path.exists(f"{src}/0003.parquet"):
        max_id = sub.agg(F.max("event_id")).collect()[0][0]
        cut = max_id // 4 + 1
        stage_microbatch_files(
            [sub.filter((F.col("event_id") >= i * cut)
                        & (F.col("event_id") < (i + 1) * cut))
             for i in range(4)], src)
    stream = (read_events_stream(spark, src, ev.schema,
                                 max_files_per_trigger=1)
              .withColumn("ts", F.col("ts").cast("timestamp"))
              .withColumn("us", (F.col("ts").cast("double")
                                 * 1_000_000).cast("long"))
              .withColumn("is_touch",
                          F.col("event_type").isin("view", "click")))
    out = run_stream_to_batch(
        stream_attribution(stream, horizon_us=7 * 86400 * 1_000_000),
        output_mode="append")
    return out.select("entity", "conv_id", "conv_us",
                      "first_touch_id", "last_touch_id",
                      "last_latency_us")


def _roundtrip_agg(df: DataFrame) -> DataFrame:
    """Fidelity aggregate for text-format round trips: counts, exact
    cents sum, exact timestamp sums and total props-string length per
    event type — any loss of precision, quoting or row fidelity in
    the round trip breaks at least one column.  The timestamp check
    sums DAYS and MICROSECONDS-WITHIN-DAY separately: a raw
    Σ unix_micros overflows int64 past ~5k rows-per-group × 50 years
    (hit at sf0.1 under ANSI mode), while the split sums stay exact
    at any scale and still catch single-microsecond corruption."""
    return (df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.abs(F.round(F.col("value") * 100).cast("long")))
         .alias("sum_cents"),
        F.expr("sum(unix_micros(cast(ts as timestamp)) "
               "DIV 86400000000)").alias("sum_days"),
        F.expr("sum(unix_micros(cast(ts as timestamp)) "
               "% 86400000000)").alias("sum_us_in_day"),
        F.sum(F.length("props")).alias("sum_props_len")))


def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink -> schema-enforced FAILFAST source round trip over
    events (the JSON props column stresses quoting/escaping; ISO-8601
    microsecond timestamps stress precision).  The oracle recomputes
    the fidelity aggregate from the original parquet — any round-trip
    loss mismatches."""
    import hashlib
    import os
    from hiselspark.sources.textfiles import read_csv, write_csv
    ev = _ev(spark, sf_dir).withColumn("ts",
                                       F.col("ts").cast("timestamp"))
    st = os.stat(f"{sf_dir}/events.parquet")
    tag = hashlib.sha1(
        f"{sf_dir}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:10]
    path = f"/tmp/hiselspark_csv_{tag}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        write_csv(ev, path)
    back = read_csv(spark, path, ev.schema)
    return _roundtrip_agg(back)


def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL sink -> schema-enforced FAILFAST source round trip over
    events; same fidelity aggregate and oracle as the CSV twin."""
    import hashlib
    import os
    from hiselspark.sources.textfiles import read_jsonl, write_jsonl
    ev = _ev(spark, sf_dir).withColumn("ts",
                                       F.col("ts").cast("timestamp"))
    st = os.stat(f"{sf_dir}/events.parquet")
    tag = hashlib.sha1(
        f"{sf_dir}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:10]
    path = f"/tmp/hiselspark_jsonl_{tag}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        write_jsonl(ev, path)
    back = read_jsonl(spark, path, ev.schema)
    return _roundtrip_agg(back)


def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex pretokenization (GPT-2-style, dialect-portable
    pattern): per-doc subword-budget counts next to the whitespace
    tokenizer — the oracle runs the SAME pattern literal through
    DuckDB's RE2."""
    from hiselspark.functions.text import bpe_pretokens
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    arr = bpe_pretokens("text")
    return docs.select(
        "doc_id",
        F.size(arr).cast("long").alias("n_bpe"),
        F.size(F.array_distinct(arr)).cast("long").alias("n_distinct"),
        F.coalesce(F.array_max(F.transform(arr, F.length)),
                   F.lit(0)).cast("long").alias("max_len"))


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM quality score with add-one smoothing per document —
    the oracle rebuilds the corpus bigram/unigram counts and refolds
    every document's sorted ln terms."""
    from hiselspark.functions.text import bigram_logprob
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = bigram_logprob(docs, "doc_id")
    return out.select("doc_id", "n_bigrams",
                      F.round("bigram_logprob", 6)
                       .alias("bigram_logprob"))


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus token distribution (ln-freq on
    ln-rank OLS over the top-200 vocabulary): a one-row corpus health
    gate; the oracle refolds the same six rank-ordered sums and the
    same OLS expression tree."""
    from hiselspark.functions.text import zipf_fit
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = zipf_fit(docs, "text", top_v=200)
    return out.select("v", F.round("slope", 6).alias("slope"),
                      F.round("intercept", 6).alias("intercept"),
                      F.round("r2", 6).alias("r2"))


def q_int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 embedding quantization with per-dimension min/max
    calibration — every code and the reconstruction-error bound
    replayed by the oracle from the parquet floats."""
    from hiselspark.operators.similarity import int8_quantize
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = int8_quantize(emb)
    return out.select(F.col("vid").alias("vec_id"), "code_sum",
                      "code_min", "code_max",
                      F.round("max_err", 6).alias("max_err"))


def q_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-hard triplet mining over the labeled embeddings: per
    anchor, the hardest positive and hardest negative by exact cosine
    with the semi-hard flag — every cosine, argmax and flag replayed
    by the oracle."""
    from hiselspark.operators.similarity import triplet_mining
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    anchors = emb.filter(F.col("vec_id") < 60)
    out = triplet_mining(anchors, emb)
    return out.select("anchor_id", "pos_id",
                      F.round("pos_cos", 6).alias("pos_cos"),
                      "neg_id", F.round("neg_cos", 6).alias("neg_cos"),
                      "semi_hard")


def q_srp_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed-random-projection angular sketch of the embeddings: 16
    sign bits from Carter-Wegman ±1 planes shared as LITERALS with
    the oracle (no RNG stream trusted); every bit recomputed by DuckDB
    from the same fixed-order dot products."""
    from hiselspark.operators.similarity import srp_signatures
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = srp_signatures(emb)
    return out.select(F.col("vid").alias("vec_id"), "srp_sig",
                      F.bit_count("srp_sig").cast("long")
                       .alias("srp_pop"))


def q_streaming_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming k-of-last-n threshold alerting (3 of the last 8 events
    above the ~p70 cents threshold), O(1) bitmask state per user, alert on the
    transition only — drained over four event-time-ordered
    micro-batches and matched row-for-row against the batch window
    replay."""
    import hashlib
    import os
    from hiselspark.streaming.alerts import stream_threshold_alerts
    from hiselspark.streaming.sessions import (read_events_stream,
                                               run_stream_to_batch,
                                               stage_microbatch_files)
    ev = _ev(spark, sf_dir).withColumn("ts",
                                       F.col("ts").cast("timestamp"))
    st = os.stat(f"{sf_dir}/events.parquet")
    tag = hashlib.sha1(
        f"{sf_dir}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:10]
    src = f"/tmp/hiselspark_streamalert_{tag}"
    if not os.path.exists(f"{src}/0003.parquet"):
        max_id = ev.agg(F.max("event_id")).collect()[0][0]
        cut = max_id // 4 + 1
        stage_microbatch_files(
            [ev.filter((F.col("event_id") >= i * cut)
                       & (F.col("event_id") < (i + 1) * cut))
             for i in range(4)], src)
    stream = (read_events_stream(spark, src, ev.schema,
                                 max_files_per_trigger=1)
              .withColumn("ts", F.col("ts").cast("timestamp"))
              .withColumn("us", (F.col("ts").cast("double")
                                 * 1_000_000).cast("long"))
              .withColumn("v", F.abs(F.round(F.col("value") * 100))
                          .cast("long")))
    out = run_stream_to_batch(
        stream_threshold_alerts(stream, threshold=6000, n=8, k=3),
        output_mode="append")
    return out.select("entity", "event_id", "us", "n_exceed")


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-keyed train/val/test split: polynomial
    rolling hash of the normalized text (pure JVM integer expressions,
    no shuffle) bucketed 80/10/10.  Duplicate texts always share a
    split — the property row-random splits lack.  Oracle recomputes the
    identical hash arithmetic in DuckDB with list_reduce."""
    from hiselspark.operators.splits import content_split
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (content_split(docs, "text", salt=7)
            .select("doc_id", "split"))


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs with doc_id % 10 == 0 play the
    eval set; train docs within Jaccard >= 0.5 of ANY eval doc are
    dropped (MinHash+LSH candidates at 2 rows/band — ~0.99 candidate
    recall at the 0.5 boundary, 1.0 verified on this corpus — then
    exact-Jaccard verification).  Oracle: the exact all-pairs Jaccard
    in SQL, cross-split pairs, anti-join."""
    from hiselspark.operators.dedup import decontaminate
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    eval_df = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    clean = decontaminate(train, eval_df, "doc_id", "text",
                          threshold=0.5, num_hashes=32, bands=16)
    return clean.select("doc_id")


def q_interval_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT interval join: every purchase keeps a row even when no
    click landed in its trailing 30 minutes."""
    from hiselspark.operators.interval_join import interval_join
    ev = _ev(spark, sf_dir)
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .select("event_id", "user_id", "ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
                .select("user_id", "ts",
                        F.round(F.col("value") * 100).cast("long")
                        .alias("cents")))
    out = interval_join(purchases, clicks, on="user_id",
                        lo_seconds=-1800.0, hi_seconds=0.0,
                        value_cols=["cents"], how="left")
    return (out.groupBy("event_id", "user_id")
               .agg(F.count("cents").alias("n_clicks"),
                    F.coalesce(F.sum("cents"), F.lit(0).cast("long"))
                    .alias("click_cents")))


def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 6-hour time-grid resample with as-of forward fill
    (pandas ``resample().ffill()``, point-in-time-safe): grid generated
    distributed via ``sequence``/``explode``, values looked up with the
    one-shuffle as-of join; ties at equal ``(user, ts)`` broken by max
    event_id.  Oracle: DuckDB ``generate_series`` + ``ASOF JOIN``."""
    from hiselspark.operators.resample import resample_ffill
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = resample_ffill(ev, "user_id", "ts", 6 * 3600, ["cents"],
                         tie_col="event_id")
    return out.select(
        "user_id",
        F.col("grid_ts").cast("timestamp").cast("double").cast("long")
         .alias("grid_s"),
        "cents")


def q_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear time-interpolation onto the 6h grid (the offline/label-
    side resampler — reads the future by design, unlike the
    leakage-free ffill twin): two as-of passes on one clustering,
    microsecond-integer weights, pandas boundary conventions."""
    from hiselspark.operators.resample import resample_interp
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = resample_interp(ev, "user_id", "ts", 6 * 3600, "cents",
                          tie_col="event_id", out_col="v")
    return out.select(
        "user_id",
        F.col("grid_ts").cast("timestamp").cast("double").cast("long")
         .alias("grid_s"),
        F.round("v", 6).alias("v"))


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event_type between the first and
    second half of the month (value bucketed to 200-cent bins, capped):
    integer counts → smoothed shares → ln terms summed in sorted-bucket
    order, mirrored term-for-term by the DuckDB ``list_sort`` +
    ``list_reduce`` oracle (round 6 absorbs the libm ln ulp)."""
    from hiselspark.operators.drift import psi_drift
    ev = (_ev(spark, sf_dir)
          .withColumn("cents", F.round(F.col("value") * 100).cast("long"))
          .withColumn("bucket", F.least(F.col("cents") / F.lit(200),
                                        F.lit(24)).cast("long")))
    out = psi_drift(ev, ["event_type"], "bucket",
                    F.col("ts") < F.lit("2024-01-16 00:00:00")
                                   .cast("timestamp"))
    return out.select("event_type", "n_ref", "n_cur",
                      F.round("psi", 6).alias("psi"))


def q_jsd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence per event_type between the first and
    second half of the month over the same 200-cent value bucketing as
    ``psi_drift`` — symmetric, bounded by ln 2, the better alarm for
    heavy-tailed features.  Sorted-bucket float summation mirrored
    term-for-term by the DuckDB ``list_sort`` + ``list_reduce``
    oracle."""
    from hiselspark.operators.drift import jsd_drift
    ev = (_ev(spark, sf_dir)
          .withColumn("cents", F.round(F.col("value") * 100).cast("long"))
          .withColumn("bucket", F.least(F.col("cents") / F.lit(200),
                                        F.lit(24)).cast("long")))
    out = jsd_drift(ev, ["event_type"], "bucket",
                    F.col("ts") < F.lit("2024-01-16 00:00:00")
                                   .cast("timestamp"))
    return out.select("event_type", "n_ref", "n_cur",
                      F.round("jsd", 6).alias("jsd"))


def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day Pearson correlation between the event value
    (cents) and its JSON ``k`` property per user — six exact integer
    sufficient sums over ONE range window, closed-form correlation as
    the identical double expression tree in both engines."""
    from hiselspark.operators.windows import rolling_corr
    ev = (_ev(spark, sf_dir)
          .withColumn("cents", F.round(F.col("value") * 100).cast("long"))
          .withColumn("k", F.get_json_object("props", "$.k")
                            .cast("long")))
    out = rolling_corr(ev, "user_id", "ts", "cents", "k", 7 * 86400.0)
    return out.select("event_id", F.round("roll_corr", 6)
                      .alias("roll_corr"))


def q_ewma_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof twin of ewma (lags ride chunked_lags) — same
    oracle."""
    from hiselspark.operators.chunked import chunked_ewma
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = chunked_ewma(ev, "user_id", "ts", "cents", alpha=0.5,
                       max_lags=8, tie_col="event_id")
    return out.select("event_id", F.col("cents_ewma").alias("ew"))


def q_inter_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seconds since the user's previous event (NULL on the first) —
    one lag on the shared entity clustering, microsecond-exact."""
    from hiselspark.operators.windows import with_inter_arrival
    ev = _ev(spark, sf_dir)
    out = with_inter_arrival(ev, "user_id", "ts",
                             tie_cols=("event_id",))
    return out.select("event_id", "delta_s")


def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h median (and p90) of the event value per user —
    ``percentile`` over a range frame; linear interpolation at rank
    q·(n−1) matches DuckDB ``quantile_cont`` exactly on integer
    cents."""
    from hiselspark.operators.windows import rolling_quantile
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = rolling_quantile(ev, "user_id", "ts", "cents", 0.5, 86400.0,
                           out_col="med")
    out = rolling_quantile(out, "user_id", "ts", "cents", 0.9, 86400.0,
                           out_col="p90")
    return out.select("event_id", F.round("med", 6).alias("med"),
                      F.round("p90", 6).alias("p90"))


def q_rolling_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h median absolute deviation + robust z-score of the
    event value per user — the outlier detector with a 50% breakdown
    point.  Pure JVM ``array_sort(collect_list)`` + higher-order
    median; q·(n−1) interpolation matches DuckDB
    ``quantile_cont``/``mad`` exactly on integer cents."""
    from hiselspark.operators.windows import rolling_mad
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = rolling_mad(ev, "user_id", "ts", "cents", 86400.0)
    return out.select("event_id",
                      F.round("roll_med", 6).alias("med"),
                      F.round("roll_mad", 6).alias("mad"),
                      F.round("robust_z", 6).alias("rz"))


def q_rolling_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h percentile rank of the event value per user —
    distribution-free 'how large is this, lately' normalizer.  Exact
    integer count ratio (size(filter)/size) on integer cents."""
    from hiselspark.operators.windows import rolling_rank
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = rolling_rank(ev, "user_id", "ts", "cents", 86400.0,
                       out_col="rr")
    return out.select("event_id", F.round("rr", 6).alias("rr"))


def q_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running peak + drawdown fraction of the cumulative event value
    per user (the equity-curve view of a user's activity): peak of the
    running total so far, and how far below it the total sits now."""
    from pyspark.sql import Window
    from hiselspark.operators.windows import running_drawdown
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = ev.withColumn("cum", F.sum("cents").over(w))
    out = running_drawdown(cum, "user_id", "ts", "cum",
                           tiebreak=("event_id",))
    return out.select("event_id",
                      F.col("run_peak").cast("long").alias("peak"),
                      F.round("drawdown", 6).alias("dd"))


def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift statistics (Page) of the event value per
    user against a global target of 10.00, slack 0.50 — the sequential
    small-shift detector, computed as running-sum-minus-running-min
    (closed form, no recursion)."""
    from hiselspark.operators.windows import cusum
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = cusum(ev, "user_id", "ts", "cents", target=1000.0, slack=50.0,
                tiebreak=("event_id",))
    return out.select("event_id",
                      F.round("cusum_pos", 6).alias("cpos"),
                      F.round("cusum_neg", 6).alias("cneg"))


def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC candlestick bars of the event value per user —
    positional open/close by (ts, event_id), extrema high/low, all in
    one (user, bar) shuffle."""
    from hiselspark.operators.resample import ohlc_bars
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = ohlc_bars(ev, "user_id", "ts", "cents", 86400,
                    tiebreak=("event_id",))
    return out.select("user_id", "bar_start", "open", "high", "low",
                      "close", "n", "total")


def q_woe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence + information value of event_type against
    the binary label value>10.00 — the scorecard categorical encoding,
    exact-integer counts, smoothed α=0.5."""
    from hiselspark.operators.encoding import woe_encode
    ev = _ev(spark, sf_dir).withColumn(
        "lbl", (F.round(F.col("value") * 100).cast("long") > 1000)
        .cast("long"))
    out = woe_encode(ev, "event_type", "lbl", alpha=0.5)
    return out.select("event_type", "pos", "neg",
                      F.round("woe", 6).alias("woe"),
                      F.round("iv", 6).alias("iv"))


def q_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week seasonal baseline (strictly-before expanding mean
    per user×phase) and deseasonalized residual of the event value."""
    from hiselspark.operators.windows import seasonal_baseline
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = seasonal_baseline(ev, "user_id", "ts", "cents", 168)
    return out.select("event_id",
                      F.round("seasonal_base", 6).alias("base"),
                      F.round("seasonal_resid", 6).alias("resid"))


def q_rolling_median_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof twin of rolling_median — same oracle."""
    from hiselspark.operators.chunked import chunked_rolling_quantile
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = chunked_rolling_quantile(ev, "user_id", "ts", "cents", 0.5,
                                   86400.0, out_col="med")
    out = chunked_rolling_quantile(out, "user_id", "ts", "cents", 0.9,
                                   86400.0, out_col="p90")
    return out.select("event_id", F.round("med", 6).alias("med"),
                      F.round("p90", 6).alias("p90"))


def q_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT event_type count per user (novelty feature):
    first-occurrence flag over (user, type) + running sum over the
    user timeline — the standard exact rewrite of the window
    COUNT(DISTINCT) no engine supports."""
    from hiselspark.operators.windows import distinct_so_far
    ev = _ev(spark, sf_dir)
    out = distinct_so_far(ev, "user_id", "ts", "event_type",
                          out_col="n_types", tie_cols=("event_id",))
    return out.select("event_id", "n_types")


def q_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day least-squares trend of the event value per user
    (cents per second): exact integer sums with time as whole seconds
    relative to the user's first event."""
    from hiselspark.operators.windows import rolling_slope
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = rolling_slope(ev, "user_id", "ts", "cents", 7 * 86400.0)
    return out.select("event_id", F.round("roll_slope", 6)
                      .alias("roll_slope"))


def q_time_since_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seconds since the user's previous error event (recency
    feature) — NULL before the first error."""
    from hiselspark.operators.windows import time_since_event
    ev = _ev(spark, sf_dir)
    out = time_since_event(ev, "user_id", "ts",
                           F.col("event_type") == "error", "event_id")
    return out.select("event_id", "since_s")


def q_horizon_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event value as of one hour before each event (time-shifted
    snapshot feature), leakage-free range frame."""
    from hiselspark.operators.windows import horizon_lag
    ev = _ev(spark, sf_dir)
    out = horizon_lag(ev, "user_id", "ts", "value", 3600.0, "event_id",
                      out_col="value_1h_ago")
    return out.select("event_id", "value_1h_ago")


def q_rolling_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day skewness and excess kurtosis of the event value
    per user — exact integer/decimal power sums in one WindowExec."""
    from hiselspark.operators.windows import rolling_moments
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = rolling_moments(ev, "user_id", "ts", "cents", 7 * 86400.0)
    return out.select("event_id",
                      F.round("roll_skew", 6).alias("roll_skew"),
                      F.round("roll_kurt", 6).alias("roll_kurt"))


def q_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day exact distinct event types per user — pure-JVM
    count-minus-pairs rewrite (delta events + running sum)."""
    from hiselspark.operators.windows import rolling_distinct
    ev = _ev(spark, sf_dir)
    out = rolling_distinct(ev, "user_id", "ts", "event_type",
                           7 * 86400.0, "event_id")
    return out.select("event_id",
                      F.col("roll_distinct").alias("n_types_7d"))


def q_rolling_distinct_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof Arrow-kernel twin of rolling_distinct — same
    oracle."""
    from hiselspark.operators.chunked import chunked_rolling_distinct
    ev = _ev(spark, sf_dir)
    out = chunked_rolling_distinct(ev, "user_id", "ts", "event_type",
                                   7 * 86400.0)
    return out.select("event_id",
                      F.col("roll_distinct").alias("n_types_7d"))


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel per user: earliest step
    times with strict progression, plus depth reached."""
    from hiselspark.operators.windows import funnel_steps
    ev = _ev(spark, sf_dir)
    out = funnel_steps(
        ev, "user_id", "ts",
        [F.col("event_type") == "view",
         F.col("event_type") == "click",
         F.col("event_type") == "purchase"],
        "event_id")
    return out.select("user_id", "step1_us", "step2_us", "step3_us",
                      "funnel_depth")


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active day,
    distinct active users per (cohort_day, days_since_cohort)."""
    from pyspark.sql import Window
    ev = _ev(spark, sf_dir)
    day = F.date_trunc("day", F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id")
    tagged = (ev.withColumn("day", day)
                .withColumn("cohort", F.min("day").over(w)))
    out = (tagged
           .select("user_id", "cohort",
                   F.datediff("day", "cohort").alias("days_since"))
           .distinct()
           .groupBy("cohort", "days_since")
           .agg(F.count("*").alias("n_users")))
    return out.select(_us("cohort").alias("cohort_us"),
                      F.col("days_since").cast("int").alias("days_since"),
                      F.col("n_users"))


def q_rolling_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day lag-1 autocorrelation of the event value per
    user — persistence/mean-reversion signal, composed from with_lags
    (tie rule: value cols) + rolling_corr on the (x, x_lag1) pair
    timeline (rows with no predecessor dropped BEFORE windowing, so
    both engines window the same filtered timeline)."""
    from hiselspark.operators.windows import rolling_corr, with_lags
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    lagged = (with_lags(ev, "user_id", "ts", ["cents"], lags=(1,))
              .filter(F.col("cents_lag1").isNotNull()))
    out = rolling_corr(lagged, "user_id", "ts", "cents", "cents_lag1",
                       7 * 86400.0, out_col="autocorr")
    return out.select("event_id", F.round("autocorr", 6)
                      .alias("autocorr"))


def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst score: events in the trailing hour vs the user's 7-day
    hourly baseline rate — exact integer counts, one division."""
    from hiselspark.operators.windows import rolling_aggregates
    ev = _ev(spark, sf_dir)
    out = rolling_aggregates(
        rolling_aggregates(ev, "user_id", "ts", {"event_id": ["count"]},
                           window_seconds=3600.0),
        "user_id", "ts", {"event_id": ["count"]},
        window_seconds=7 * 86400.0)
    short = F.col("event_id_roll_count_3600s")
    long_ = F.col("event_id_roll_count_604800s")
    score = F.when(long_ > 0,
                   short.cast("double")
                   / (long_.cast("double") / F.lit(168.0)))
    return (out.withColumn("burst", F.round(score, 6))
            .select("event_id", "burst"))


def q_rolling_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h holding-time-weighted mean of the event value per
    user (TWAP) — de-biases bursts of rapid updates."""
    from hiselspark.operators.windows import rolling_twap
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = rolling_twap(ev, "user_id", "ts", "cents", 86400.0, "event_id")
    return out.select("event_id", F.round("roll_twap", 6)
                      .alias("roll_twap"))


def q_cross_sectional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peer-relative daily rank/percentile/z-score of the event value
    (cross-sectional axis) — aggregate-then-join-back plan, never a
    whole-bucket window sort."""
    from hiselspark.operators.windows import cross_sectional_features
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = cross_sectional_features(ev, "ts", "cents", bucket="day")
    return out.select("event_id",
                      F.col("cs_rank").cast("long").alias("cs_rank"),
                      F.round("cs_pct", 6).alias("cs_pct"),
                      F.round("cs_z", 6).alias("cs_z"))


def q_rolling_corr_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof twin of rolling_corr — same oracle, hot users split
    across (entity, time-bucket) tasks."""
    from hiselspark.operators.chunked import chunked_rolling_corr
    ev = (_ev(spark, sf_dir)
          .withColumn("cents", F.round(F.col("value") * 100).cast("long"))
          .withColumn("k", F.get_json_object("props", "$.k")
                            .cast("long")))
    out = chunked_rolling_corr(ev, "user_id", "ts", "cents", "k",
                               7 * 86400.0)
    return out.select("event_id", F.round("roll_corr", 6)
                      .alias("roll_corr"))


def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of the event value per
    user (α=0.5, 8 lags — weights decay below double noise, so the
    bounded-lag form IS the exact answer): pure lag expressions over
    one entity clustering, bit-identical arithmetic in the oracle."""
    from hiselspark.operators.windows import ewma
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = ewma(ev, "user_id", "ts", "cents", alpha=0.5, max_lags=8,
               tie_cols=("event_id",))
    return out.select("event_id", F.col("cents_ewma").alias("ew"))


def q_session_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session aggregates (duration, size, value sum) on the same
    entity clustering as sessionize — one shuffle total."""
    from hiselspark.operators.windows import session_features
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = session_features(ev, "user_id", "ts", 1800.0,
                           value_col="cents")
    return out.select(
        "user_id", "session_id", "n_events",
        _us("session_start").alias("start_us"),
        F.round("duration_s", 6).alias("duration_s"),
        F.col("cents_sum"))


def q_calendar_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar + cyclical time features (hour/isodow/dom/weekend and
    the sin/cos circle encodings) — pure JVM map stage; trig rounded
    to absorb the libm/JVM ulp."""
    from hiselspark.operators.windows import with_calendar_features
    ev = _ev(spark, sf_dir)
    out = with_calendar_features(ev, "ts")
    return out.select(
        "event_id", "hour", "isodow", "dom", "is_weekend",
        F.round("hour_sin", 6).alias("hour_sin"),
        F.round("hour_cos", 6).alias("hour_cos"),
        F.round("dow_sin", 6).alias("dow_sin"),
        F.round("dow_cos", 6).alias("dow_cos"))


def q_scd2_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension join: each user's purchases define validity
    periods [purchase_ts, next_purchase_ts) carrying the purchase
    amount; every click picks up the attribute of its covering period
    (NULL before the first purchase).  Runs as the one-shuffle as-of
    union plan + valid_to guard, not a generic interval join."""
    from pyspark.sql import Window
    from hiselspark.operators.asof import scd2_join
    ev = _ev(spark, sf_dir)
    purch = (ev.filter(F.col("event_type") == "purchase")
             .withColumn("cents", F.round(F.col("value") * 100)
                         .cast("long"))
             .groupBy("user_id", "ts")
             .agg(F.max_by("cents", "event_id").alias("p_cents")))
    dim = (purch.select("user_id", F.col("ts").alias("valid_from"),
                        F.lead("ts").over(
                            Window.partitionBy("user_id")
                                  .orderBy("ts")).alias("valid_to"),
                        "p_cents"))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("event_id", "user_id", "ts"))
    out = scd2_join(clicks, dim, on="user_id", fact_ts="ts",
                    value_cols=["p_cents"])
    return out.select("event_id", "user_id", "p_cents")


def q_merge_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: coalesce each user's event intervals
    [ts, ts+30min] into maximal merged spans — sessionize generalized
    from points to intervals; two windows + one groupBy on a single
    entity clustering."""
    from hiselspark.operators.windows import merge_intervals
    ev = (_ev(spark, sf_dir)
          .withColumn("s_us", _us("ts"))
          .withColumn("e_us", _us("ts") + F.lit(1800 * 1_000_000)))
    out = merge_intervals(ev, "user_id", "s_us", "e_us",
                          tie_cols=("event_id",))
    return out.select("user_id", "island_id", "island_start",
                      "island_end", "n_intervals")


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free winsorization: clamp each event's value to the
    [p05, p95] band of the SAME user's strictly-earlier history (>= 20
    rows of history, else pass-through) — expanding strictly-before
    percentile frame, interpolation rule matching quantile_cont."""
    from hiselspark.operators.windows import winsorize_pit
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = winsorize_pit(ev, "user_id", "ts", "cents", 0.05, 0.95,
                        min_history=20)
    return out.select("event_id", F.round("cents_wins", 6).alias("wz"))


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): 3-way join with pushdown
    filters on both sides, revenue aggregation in exact integer
    cents, top-10 by revenue with deterministic tie-break."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cutoff = F.lit("1998-06-01 00:00:00").cast("timestamp")
    rev = (F.round(F.col("l_extendedprice") * 100).cast("long")
           * (F.lit(100) - F.round(F.col("l_discount") * 100)
              .cast("long")))
    out = (cust.filter(F.col("c_mktsegment") == "BUILDING")
           .join(orders, F.col("c_custkey") == F.col("o_custkey"))
           .filter(F.col("o_orderdate").cast("timestamp") < cutoff)
           .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
           .filter(F.col("l_shipdate").cast("timestamp") > cutoff)
           .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
           .agg(F.sum(rev).alias("revenue_e4"))
           .orderBy(F.col("revenue_e4").desc(), F.col("l_orderkey"))
           .limit(10))
    return out.select("l_orderkey",
                      F.col("o_orderdate").cast("timestamp")
                       .cast("double").cast("long").alias("odate_s"),
                      "o_orderpriority", "revenue_e4")


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): a 6-table star join —
    region/nation broadcast dims, customer⋈orders⋈lineitem⋈supplier
    with the same-nation constraint — revenue per nation in exact
    integer cents×bp, one-year date window pushed to the orders
    scan."""
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    rev = (F.round(F.col("l_extendedprice") * 100).cast("long")
           * (F.lit(10000)
              - F.round(F.col("l_discount") * 10000).cast("long")))
    out = (F.broadcast(r.filter(F.col("r_name") == "ASIA"))
           .join(F.broadcast(n),
                 F.col("n_regionkey") == F.col("r_regionkey"))
           .join(c, F.col("c_nationkey") == F.col("n_nationkey"))
           .join(o.filter((F.col("o_orderdate").cast("timestamp")
                           >= lo)
                          & (F.col("o_orderdate").cast("timestamp")
                             < hi)),
                 F.col("o_custkey") == F.col("c_custkey"))
           .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
           .join(s, (F.col("l_suppkey") == F.col("s_suppkey"))
                 & (F.col("s_nationkey") == F.col("c_nationkey")))
           .groupBy("n_name")
           .agg(F.sum(rev).alias("revenue_e6"),
                F.count(F.lit(1)).alias("n_items")))
    return out.select("n_name", "revenue_e6", "n_items")


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution), adapted to the
    testdata schema (no o_comment — the excluded class is the
    '1-URGENT' priority): LEFT join keeps zero-order customers, then
    the distribution of per-customer counts."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    per = (cust.join(orders.filter(
                F.col("o_orderpriority") != "1-URGENT"),
                cust.c_custkey == orders.o_custkey, "left")
               .groupBy("c_custkey")
               .agg(F.count("o_orderkey").alias("c_count")))
    return (per.groupBy("c_count")
               .agg(F.count(F.lit(1)).alias("custdist"))
               .select("c_count", "custdist"))


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue), adapted (p_container
    -> p_size < 15): lineitems of Brand#12 small parts with quantity
    strictly below 0.2x the part's average — the correlated average
    decorrelated into a per-part aggregate join, and the float
    predicate cross-multiplied into exact integers
    (5·qty·cnt < Σqty)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    sel = part.filter((F.col("p_brand") == "Brand#12")
                      & (F.col("p_size") < 15)).select("p_partkey")
    qli = li.select("l_partkey",
                    F.round(F.col("l_quantity")).cast("long")
                    .alias("qty"),
                    F.round(F.col("l_extendedprice") * 100)
                    .cast("long").alias("cents"))
    avg = (qli.join(F.broadcast(sel),
                    qli.l_partkey == sel.p_partkey)
              .groupBy("l_partkey")
              .agg(F.sum("qty").alias("sum_qty"),
                   F.count(F.lit(1)).alias("cnt")))
    out = (qli.join(avg, "l_partkey")
              .filter(5 * F.col("qty") * F.col("cnt")
                      < F.col("sum_qty"))
              .agg(F.sum("cents").alias("sum_cents"),
                   F.count(F.lit(1)).alias("n_items")))
    return out.select(F.col("sum_cents").cast("long").alias("sum_cents"),
                      "n_items")


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (disjunctive brand/size/quantity predicates, adapted
    from container/shipmode): revenue over an OR of three conjunctive
    clauses — the classic OR-pushdown shape; exact _e6 money
    arithmetic as in tpch_q5."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    j = li.join(part, li.l_partkey == part.p_partkey)
    qty = F.round(F.col("l_quantity")).cast("long")
    c1 = ((F.col("p_brand") == "Brand#12")
          & F.col("p_size").between(1, 5) & qty.between(1, 11))
    c2 = ((F.col("p_brand") == "Brand#23")
          & F.col("p_size").between(1, 10) & qty.between(10, 20))
    c3 = ((F.col("p_brand") == "Brand#34")
          & F.col("p_size").between(1, 15) & qty.between(20, 30))
    rev = (F.round(F.col("l_extendedprice") * 100).cast("long")
           * (10000 - F.round(F.col("l_discount") * 10000)
              .cast("long")))
    return (j.filter(c1 | c2 | c3)
             .agg(F.sum(rev).cast("long").alias("revenue_e6"),
                  F.count(F.lit(1)).alias("n_items")))


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted (no c_phone —
    country code is c_custkey % 7): rich-but-inactive customers in
    codes {1,3,5} with balance above the positive-balance average
    (exact integer cross-multiplication, cents·n > Σcents) and NO
    high-priority orders (anti join — every customer has SOME order
    at this density, so the inactivity class is 'no 2-HIGH order',
    keeping the result set non-trivial)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = (cust.withColumn("cntry", F.col("c_custkey") % 7)
             .filter(F.col("cntry").isin(1, 3, 5))
             .withColumn("cents",
                         F.round(F.col("c_acctbal") * 100)
                         .cast("long")))
    pos = c.filter(F.col("cents") > 0).agg(
        F.sum("cents").alias("sum_pos"),
        F.count(F.lit(1)).alias("n_pos"))
    out = (c.crossJoin(F.broadcast(pos))
            .filter(F.col("cents") * F.col("n_pos") > F.col("sum_pos"))
            .join(orders.filter(F.col("o_orderpriority") == "2-HIGH")
                        .select(F.col("o_custkey").alias("c_custkey")),
                  "c_custkey", "left_anti")
            .groupBy("cntry")
            .agg(F.count(F.lit(1)).alias("numcust"),
                 F.sum("cents").cast("long").alias("totacctbal_cents")))
    return out.select("cntry", "numcust", "totacctbal_cents")


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): the HAVING-subquery
    pattern — orders whose total lineitem quantity exceeds a
    threshold, semi-joined back and re-aggregated with customer
    attribution; exact integer quantities throughout."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    qty = F.round("l_quantity").cast("long")
    big = (li.groupBy("l_orderkey")
             .agg(F.sum(qty).alias("tot_qty"))
             .filter(F.col("tot_qty") > 120))
    out = (big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
              .join(c, F.col("c_custkey") == F.col("o_custkey"))
              .groupBy("c_custkey")
              .agg(F.count(F.lit(1)).alias("n_big_orders"),
                   F.sum("tot_qty").alias("total_qty"))
              .orderBy(F.col("total_qty").desc(),
                       F.col("c_custkey").asc())
              .limit(20))
    return out.select("c_custkey", "n_big_orders", "total_qty")


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier), adapted to the testdata
    schema (no partsupp — supplier⋈part pairs come from lineitem, and
    the minimized cost is the supplier's account balance in exact
    cents): for each STANDARD part of size 10-20, every EUROPE
    supplier that shipped it and holds the per-part MINIMUM acctbal —
    the correlated-min-subquery pattern decorrelated into a per-part
    aggregate join; ties all emitted, like the reference query."""
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sel = p.filter((F.col("p_type") == "STANDARD")
                   & F.col("p_size").between(10, 20)).select("p_partkey")
    eur = (F.broadcast(r.filter(F.col("r_name") == "EUROPE"))
           .join(F.broadcast(n),
                 F.col("n_regionkey") == F.col("r_regionkey"))
           .join(s, F.col("s_nationkey") == F.col("n_nationkey"))
           .select("s_suppkey", "s_name", "n_name",
                   F.round(F.col("s_acctbal") * 100).cast("long")
                   .alias("acct_cents")))
    pairs = (li.join(F.broadcast(sel), li.l_partkey == sel.p_partkey)
               .select("p_partkey", "l_suppkey").distinct()
               .join(eur, F.col("l_suppkey") == F.col("s_suppkey")))
    mins = (pairs.groupBy("p_partkey")
                 .agg(F.min("acct_cents").alias("min_cents")))
    out = (pairs.join(mins, "p_partkey")
                .filter(F.col("acct_cents") == F.col("min_cents"))
                .select("p_partkey", "s_name", "n_name", "acct_cents"))
    return out


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): revenue between NATION_1 and
    NATION_2 in both directions by ship year — the dual-aliased
    nation-dimension join (supplier nation x customer nation), ship
    window 1996-1997 pushed to the lineitem scan, exact _e6 money."""
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    n1 = n.select(F.col("n_nationkey").alias("sn_key"),
                  F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("cn_key"),
                  F.col("n_name").alias("cust_nation"))
    rev = (F.round(F.col("l_extendedprice") * 100).cast("long")
           * (F.lit(10000)
              - F.round(F.col("l_discount") * 10000).cast("long")))
    out = (li.filter((F.col("l_shipdate") >= lo)
                     & (F.col("l_shipdate") < hi))
             .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
             .join(F.broadcast(n1),
                   F.col("s_nationkey") == F.col("sn_key"))
             .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
             .join(c, F.col("o_custkey") == F.col("c_custkey"))
             .join(F.broadcast(n2),
                   F.col("c_nationkey") == F.col("cn_key"))
             .filter(((F.col("supp_nation") == "NATION_1")
                      & (F.col("cust_nation") == "NATION_2"))
                     | ((F.col("supp_nation") == "NATION_2")
                        & (F.col("cust_nation") == "NATION_1")))
             .groupBy("supp_nation", "cust_nation",
                      F.year("l_shipdate").cast("long").alias("l_year"))
             .agg(F.sum(rev).alias("revenue_e6"),
                  F.count(F.lit(1)).alias("n_items")))
    return out.select("supp_nation", "cust_nation", "l_year",
                      "revenue_e6", "n_items")


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): of all PROMO-part order
    volume delivered into the ASIA market in 1996-1997, the share
    supplied from NATION_7 per order year.  Numerator and denominator
    are exact _e6 integers; the share itself is the single emitted
    float (one mirrored division in each engine)."""
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    rev = (F.round(F.col("l_extendedprice") * 100).cast("long")
           * (F.lit(10000)
              - F.round(F.col("l_discount") * 10000).cast("long")))
    sn = n.select(F.col("n_nationkey").alias("sn_key"),
                  F.col("n_name").alias("supp_nation"))
    mkt = (F.broadcast(r.filter(F.col("r_name") == "ASIA"))
           .join(F.broadcast(n),
                 F.col("n_regionkey") == F.col("r_regionkey"))
           .join(c, F.col("c_nationkey") == F.col("n_nationkey"))
           .select("c_custkey"))
    out = (li.join(F.broadcast(p.filter(F.col("p_type") == "PROMO")
                               .select("p_partkey")),
                   F.col("l_partkey") == F.col("p_partkey"))
             .join(o.filter((F.col("o_orderdate") >= lo)
                            & (F.col("o_orderdate") < hi)),
                   F.col("l_orderkey") == F.col("o_orderkey"))
             .join(mkt, F.col("o_custkey") == F.col("c_custkey"))
             .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
             .join(F.broadcast(sn),
                   F.col("s_nationkey") == F.col("sn_key"))
             .groupBy(F.year("o_orderdate").cast("long")
                      .alias("o_year"))
             .agg(F.sum(F.when(F.col("supp_nation") == "NATION_7",
                               rev).otherwise(F.lit(0)))
                  .alias("nation_e6"),
                  F.sum(rev).alias("total_e6")))
    share = (F.col("nation_e6").cast("double")
             / F.col("total_e6").cast("double"))
    return out.select("o_year", "nation_e6", "total_e6",
                      share.alias("mkt_share"))


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), adapted (no partsupp: the unit
    cost proxy is the part's retail price): profit per supplier
    nation per order year over parts named '%red%', all in exact _e6
    integers — profit = revenue_e6 - retail_cents*qty*10000."""
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    rev = (F.round(F.col("l_extendedprice") * 100).cast("long")
           * (F.lit(10000)
              - F.round(F.col("l_discount") * 10000).cast("long")))
    cost = (F.round(F.col("p_retailprice") * 100).cast("long")
            * F.round(F.col("l_quantity")).cast("long")
            * F.lit(10000))
    out = (li.join(F.broadcast(
                p.filter(F.col("p_name").like("%red%"))
                 .select("p_partkey", "p_retailprice")),
                   F.col("l_partkey") == F.col("p_partkey"))
             .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
             .join(F.broadcast(n),
                   F.col("s_nationkey") == F.col("n_nationkey"))
             .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
             .groupBy("n_name",
                      F.year("o_orderdate").cast("long")
                      .alias("o_year"))
             .agg(F.sum(rev - cost).alias("profit_e6"),
                  F.count(F.lit(1)).alias("n_items")))
    return out.select("n_name", "o_year", "profit_e6", "n_items")


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock), adapted (no partsupp: a part's
    held value for NATION_4's suppliers is the exact cent sum of
    their lineitems): parts whose value exceeds 2x the average
    per-part value — the global-scalar-subquery HAVING shape with the
    float fraction cross-multiplied into exact integers
    (value*n_parts > 2*total)."""
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    nat = (F.broadcast(n.filter(F.col("n_name") == "NATION_4"))
           .join(s, F.col("s_nationkey") == F.col("n_nationkey"))
           .select("s_suppkey"))
    val = (li.join(F.broadcast(nat),
                   F.col("l_suppkey") == F.col("s_suppkey"))
             .groupBy("l_partkey")
             .agg(F.sum(F.round(F.col("l_extendedprice") * 100)
                        .cast("long")).alias("value_cents")))
    tot = val.agg(F.sum("value_cents").alias("total_cents"),
                  F.count(F.lit(1)).alias("n_parts"))
    out = (val.join(F.broadcast(tot))
              .filter(F.col("value_cents") * F.col("n_parts")
                      > F.lit(2) * F.col("total_cents"))
              .select("l_partkey", "value_cents"))
    return out


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): revenue per supplier over 1996Q1,
    keeping every supplier tied at the MAXIMUM — the create-view +
    scalar-max-subquery pattern as a broadcast max join; exact _e6
    revenue so the max comparison is integer-exact."""
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp")
    rev = (F.round(F.col("l_extendedprice") * 100).cast("long")
           * (F.lit(10000)
              - F.round(F.col("l_discount") * 10000).cast("long")))
    per = (li.filter((F.col("l_shipdate") >= lo)
                     & (F.col("l_shipdate") < hi))
             .groupBy("l_suppkey")
             .agg(F.sum(rev).alias("total_rev_e6")))
    mx = per.agg(F.max("total_rev_e6").alias("max_rev_e6"))
    out = (per.join(F.broadcast(mx))
              .filter(F.col("total_rev_e6") == F.col("max_rev_e6"))
              .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
              .select(F.col("s_suppkey"), F.col("s_name"),
                      F.col("total_rev_e6")))
    return out


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), adapted (supplier-part
    pairs from lineitem; the excluded-complaints predicate becomes
    s_acctbal < 0): distinct supplier count per (brand, type, size)
    over the eight TPC-H size classes, brand/type exclusions in
    place — the NOT-IN-subquery + count-distinct shape."""
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sel = p.filter((F.col("p_brand") != "Brand#45")
                   & (F.col("p_type") != "PROMO")
                   & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    out = (li.select("l_partkey", "l_suppkey").distinct()
             .join(F.broadcast(sel),
                   F.col("l_partkey") == F.col("p_partkey"))
             .join(F.broadcast(bad),
                   F.col("l_suppkey") == F.col("s_suppkey"),
                   "left_anti")
             .groupBy("p_brand", "p_type", "p_size")
             .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))
    return out.select("p_brand", "p_type",
                      F.col("p_size").cast("long").alias("p_size"),
                      "supplier_cnt")


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), adapted (no partsupp:
    "excess availability" becomes having shipped MORE THAN DOUBLE a
    part's fair per-supplier share): NATION_3 suppliers dominating
    any 'small%' part, the nested-EXISTS chain as aggregate + semi
    join with the fraction cross-multiplied exact (supp_qty*n_supp >
    2*tot_qty)."""
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    qty = F.round("l_quantity").cast("long")
    sm = (li.join(F.broadcast(p.filter(F.col("p_name").like("small%"))
                              .select("p_partkey")),
                  F.col("l_partkey") == F.col("p_partkey"))
            .select("p_partkey", "l_suppkey", qty.alias("qty")))
    per = (sm.groupBy("p_partkey", "l_suppkey")
             .agg(F.sum("qty").alias("supp_qty")))
    tot = (sm.groupBy("p_partkey")
             .agg(F.sum("qty").alias("tot_qty"),
                  F.countDistinct("l_suppkey").alias("n_supp")))
    dom = (per.join(tot, "p_partkey")
              .filter(F.col("supp_qty") * F.col("n_supp")
                      > F.lit(2) * F.col("tot_qty"))
              .select("l_suppkey").distinct())
    out = (s.join(F.broadcast(n.filter(F.col("n_name") == "NATION_3")),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .join(dom, F.col("s_suppkey") == F.col("l_suppkey"),
                  "left_semi")
            .select("s_suppkey", "s_name"))
    return out


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted (no
    receipt/commit dates: "late" is shipping >90 days after the order
    date): per NATION_2 supplier, the count of finalized multi-
    supplier orders where it was the ONLY late supplier — the
    EXISTS/NOT-EXISTS pair rewritten as per-order supplier and
    late-supplier distinct counts (n_supp >= 2, n_late_supp = 1)."""
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    fl = (li.join(o.filter(F.col("o_orderstatus") == "F")
                   .select("o_orderkey", "o_orderdate"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .select("l_orderkey", "l_suppkey",
                    (F.col("l_shipdate")
                     > F.col("o_orderdate")
                     + F.expr("INTERVAL 90 DAYS")).alias("late")))
    per = (fl.groupBy("l_orderkey")
             .agg(F.countDistinct("l_suppkey").alias("n_supp"),
                  F.countDistinct(F.when(F.col("late"),
                                         F.col("l_suppkey")))
                  .alias("n_late_supp")))
    out = (fl.filter(F.col("late"))
             .select("l_orderkey", "l_suppkey").distinct()
             .join(per.filter((F.col("n_supp") >= 2)
                              & (F.col("n_late_supp") == 1)),
                   "l_orderkey", "left_semi")
             .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
             .join(F.broadcast(n.filter(F.col("n_name") == "NATION_2")),
                   F.col("s_nationkey") == F.col("n_nationkey"))
             .groupBy("s_name")
             .agg(F.count(F.lit(1)).alias("numwait"))
             .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
             .limit(20))
    return out.select("s_name", "numwait")


def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative hazard of time-to-next-event per
    event_type: durations in whole hours, right-censored at 12h (and
    at each user's last event) — at-risk counts exact, the hazard
    cumulated as the deterministic ordered fold."""
    from pyspark.sql import Window
    from hiselspark.operators.survival import nelson_aalen
    from hiselspark.operators.windows import ts_seconds
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lead(ts_seconds("ts")).over(w) - ts_seconds("ts")
    d = ev.withColumn("gap", gap)
    obs = (d.withColumn(
        "duration",
        F.when(F.col("gap").isNull() | (F.col("gap") > 43200.0),
               F.lit(12))
         .otherwise(F.floor(F.col("gap") / 3600.0)).cast("long"))
        .withColumn(
        "event",
        F.when(F.col("gap").isNull() | (F.col("gap") > 43200.0),
               F.lit(0)).otherwise(F.lit(1))))
    out = nelson_aalen(obs, "event_type", "duration", "event")
    return out.select("event_type", "duration", "n_at_risk",
                      "n_events", "n_censored",
                      F.round("cumhaz", 6).alias("cumhaz"))


def q_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F across the four event types on exact value
    cents — per-group sufficient stats exact int64, the single float
    cross-group term folded in group-key order."""
    from hiselspark.operators.evaluate import anova_f
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = anova_f(ev, "event_type", "cents")
    return out.select("k", "n",
                      F.round("ss_between", 6).alias("ss_between"),
                      F.round("ss_within", 6).alias("ss_within"),
                      F.round("f_stat", 6).alias("f_stat"))


def q_reg_discontinuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp RDD of value cents on the props-k running variable at
    cutoff 50 (bandwidth 30): closed-form OLS per side off exact
    int64 sufficient statistics, effect = intercept jump at the
    cutoff."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.causal import reg_discontinuity
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .select(F.col("__p.k").cast("long").alias("k"),
                   F.round(F.col("value") * 100).cast("long")
                   .alias("cents")))
    out = reg_discontinuity(d, "k", "cents", cutoff=50, bandwidth=30)
    return out.select(
        "n_left", "n_right",
        F.round("slope_left", 6).alias("slope_left"),
        F.round("slope_right", 6).alias("slope_right"),
        F.round("icept_left", 6).alias("icept_left"),
        F.round("icept_right", 6).alias("icept_right"),
        F.round("effect", 6).alias("effect"))


def q_energy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy distance between click and purchase value-cents
    distributions — all three pairwise absolute sums exact int64 off
    the distinct-value count table, the statistic one mirrored float
    expression."""
    from hiselspark.operators.drift import energy_distance
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = energy_distance(ev, "event_type", "cents",
                          "click", "purchase")
    return out.select("n_a", "n_b", "s_ab", "s_aa", "s_bb",
                      F.round("energy_d", 6).alias("energy_d"))


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity audit (l=5) of the k-decile sensitive
    attribute under the (user bucket, event_type) quasi-identifier —
    exact class sizes and distinct counts, one shuffle (the same
    operator q_k_anonymity composes, here gated standalone on a
    different quasi/sensitive projection)."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.pii import l_diversity
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .select((F.col("user_id") % 25).alias("user_bucket"),
                   "event_type",
                   (F.col("__p.k").cast("long") % 10).alias("k_dec")))
    out = l_diversity(d, ["user_bucket", "event_type"], "k_dec", l=5)
    return out.select("user_bucket", "event_type", "class_size",
                      "n_sensitive", "violates_l")


def q_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample log-rank test of click vs purchase time-to-next-
    event curves (hours, censored at 12h) — per-time counts exact,
    E/V accumulated as duration-ordered folds, A-S erfc p-value."""
    from pyspark.sql import Window
    from hiselspark.operators.survival import logrank_test
    from hiselspark.operators.windows import ts_seconds
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lead(ts_seconds("ts")).over(w) - ts_seconds("ts")
    d = ev.withColumn("gap", gap)
    obs = (d.withColumn(
        "duration",
        F.when(F.col("gap").isNull() | (F.col("gap") > 43200.0),
               F.lit(12))
         .otherwise(F.floor(F.col("gap") / 3600.0)).cast("long"))
        .withColumn(
        "event",
        F.when(F.col("gap").isNull() | (F.col("gap") > 43200.0),
               F.lit(0)).otherwise(F.lit(1))))
    out = logrank_test(obs, "event_type", "duration", "event",
                       "click", "purchase")
    return out.select("n_a", "n_b", "o_a",
                      F.round("e_a", 6).alias("e_a"),
                      F.round("var_sum", 6).alias("var_sum"),
                      F.round("chi2", 6).alias("chi2"),
                      F.round("p_value", 6).alias("p_value"))


def q_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box whiteness statistic (m=3) per user on value cents —
    built on the acf sufficient sums; Q one fixed float expression,
    chi-square df carried (the anova_f convention for distribution
    tails)."""
    from hiselspark.operators.tsprofile import ljung_box
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    out = ljung_box(ev, "user_id", "ts", "event_id", "cents",
                    max_lag=3)
    return out.select(F.col("entity").alias("user_id"), "n",
                      F.round("q_stat", 6).alias("q_stat"), "df")


def q_chrf_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chrF (β=2, char 1-2-grams) between the same consecutive-doc-id
    pairs as bleu_pairs — clipped char-n-gram matches exact int64,
    the F-score one mirrored float expression."""
    from hiselspark.functions.text import chrf_pairs
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = (docs.filter(F.col("doc_id") % 2 == 0)
             .select((F.col("doc_id") / 2).cast("long")
                     .alias("pair_id"),
                     F.col("text").alias("cand")))
    b = (docs.filter(F.col("doc_id") % 2 == 1)
             .select(((F.col("doc_id") - 1) / 2).cast("long")
                     .alias("pair_id"),
                     F.col("text").alias("ref")))
    pairs = a.join(b, "pair_id")
    out = chrf_pairs(pairs, "pair_id", "cand", "ref", max_n=2,
                     beta=2.0)
    return out.select("pair_id", "cand_chars", "ref_chars",
                      "m1", "c1", "r1", "m2", "c2", "r2",
                      F.round("chrf", 6).alias("chrf"))


def q_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP Laplace count release (ε=1) per user bucket with the
    REPLAYABLE counter-hash noise draw — the oracle recomputes the
    hash fold, the inverse-CDF noise and the post-processed integer
    release digit for digit."""
    from hiselspark.operators.pii import dp_noisy_counts
    ev = _ev(spark, sf_dir)
    d = ev.select((F.col("user_id") % 50).alias("user_bucket"))
    out = dp_noisy_counts(d, ["user_bucket"], epsilon=1.0, seed=11)
    return out.select("user_bucket", "n",
                      F.round("u", 6).alias("u"),
                      F.round("noise", 6).alias("noise"),
                      F.round("noisy_count", 6).alias("noisy_count"),
                      "released")


def q_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected calibration error (Naeini et al. 2015) on the same
    quantized pseudo-probability as the `calibration` gate: ECE =
    Σ_b (n_b/n)·|frac_pos_b − mean_pred_b| over the 10-bin
    reliability table — per-bin sufficient statistics exact int64,
    the bin-ordered fold one deterministic float sum."""
    from hiselspark.operators.evaluate import calibration_bins
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    scored = ev.withColumn(
        "score", F.least(F.col("cents"), F.lit(2000)).cast("long")
    ).withColumn("lbl", (F.col("cents") > 1000).cast("long"))
    bins = calibration_bins(scored, "score", "lbl", n_bins=10,
                            score_scale=2000)
    agg = bins.agg(
        F.sum("n").alias("n"),
        F.count(F.lit(1)).alias("n_bins"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(
                    F.col("bin").alias("g"),
                    (F.col("n").cast("double")
                     * F.abs(F.col("frac_pos") - F.col("mean_pred")))
                    .alias("t")))),
                lambda s: s["t"]),
            F.lit(0.0), lambda acc, x: acc + x).alias("werr"))
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_bins").cast("long").alias("n_bins"),
        F.round(F.col("werr") / F.col("n").cast("double"), 6)
        .alias("ece"))


def q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test of the value>10 rule vs the k>=50 rule
    as paired binary judgments over events — discordant counts exact,
    continuity-corrected chi-square + A-S erfc p-value as mirrored
    float expressions."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.evaluate import mcnemar_test
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .select((F.round(F.col("value") * 100).cast("long")
                    > 1000).cast("long").alias("y1"),
                   (F.col("__p.k") >= 50).cast("long").alias("y2")))
    out = mcnemar_test(d, "y1", "y2")
    return out.select("n", "n00", "n01", "n10", "n11",
                      F.round("chi2", 6).alias("chi2"),
                      F.round("p_value", 6).alias("p_value"))


def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa over a 4-rater panel built deterministically
    from events (item = event_id//4, rater category = event_type) —
    all sufficient statistics exact int64, kappa one mirrored float
    expression (NULL if panel sizes were unequal)."""
    from hiselspark.operators.evaluate import fleiss_kappa
    ev = _ev(spark, sf_dir)
    d = ev.select(F.floor(F.col("event_id") / 4).cast("long")
                  .alias("item"), "event_type")
    out = fleiss_kappa(d, "item", "event_type")
    return out.select("n_items", "n_raters",
                      F.round("p_bar", 6).alias("p_bar"),
                      F.round("p_e", 6).alias("p_e"),
                      F.round("kappa", 6).alias("kappa"))


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness (t=0.05) of the event_type sensitive attribute
    under the user-bucket quasi-identifier — the TVD numerator exact
    int64 incl. the absent-category closed form, one mirrored
    division."""
    from hiselspark.operators.pii import t_closeness
    ev = _ev(spark, sf_dir)
    d = ev.select((F.col("user_id") % 20).alias("user_bucket"),
                  "event_type")
    out = t_closeness(d, ["user_bucket"], "event_type", t=0.05)
    return out.select("user_bucket", "group_size", "tvd_num",
                      F.round("tvd", 6).alias("tvd"), "t_close")


def q_image_corners(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer Harris corner response (k=1/20 cross-multiplied,
    3x3 Sobel + 3x3 box sums) on synthesized 8x8 raw payloads — the
    oracle replays every pixel, both gradients, all box sums and the
    scaled response; corner decision is an integer comparison."""
    from hiselspark.functions.image import with_harris_corners
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    imgs = (orders.select(F.col("o_orderkey").alias("okey"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8))
            .withColumn("fmt", F.lit("raw")))
    imgs = _synth_raw_bytes(imgs, "okey", 7919, 31, 8 * 8 * 3)
    out = with_harris_corners(imgs, threshold=0)
    return out.select("okey", "corner_count", "resp_max",
                      "resp_argmax")


def q_weighted_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded Bellman–Ford (3 relaxation rounds) from the first
    three order nodes over the undirected order↔part graph with
    quantity weights — exact integer distances; the oracle unrolls
    the rounds as CTEs (a converged table is a fixed point, so the
    fixed-round replay is identical)."""
    from hiselspark.operators.graph import weighted_hops
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = li.select((F.col("l_orderkey") * 2).alias("src"),
                      (F.col("l_partkey") * 2 + 1).alias("dst"),
                      F.round("l_quantity").cast("long").alias("w"))
    sources = (li.filter(F.col("l_orderkey") <= 3)
                 .select((F.col("l_orderkey") * 2).alias("node"))
                 .distinct())
    out = weighted_hops(edges, sources, max_rounds=3)
    return out.select("node", "dist")


def q_ips_offpolicy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPS / SNIPS off-policy value of the deterministic target
    policy "purchase if k ≥ 50 else click" from the logged
    (event_type, cents) bandit data, logging propensities = empirical
    action frequencies — every sufficient statistic exact int64, the
    two estimates folded per-action in action order."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.causal import ips_offpolicy
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .select("event_type",
                   F.round(F.col("value") * 100).cast("long")
                   .alias("cents"),
                   F.when(F.col("__p.k") >= 50, F.lit("purchase"))
                    .otherwise(F.lit("click")).alias("target")))
    out = ips_offpolicy(d, "event_type", "cents", "target")
    return out.select("n", "n_matched",
                      F.round("value_ips", 6).alias("value_ips"),
                      F.round("value_snips", 6).alias("value_snips"))


def q_linear_shap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-SHAP attributions of a two-feature closed-form
    OLS (cents ~ props-k + event_id%7): the 2x2 normal equations
    solved by Cramer's rule on exact int64 moments, per-row
    contributions βⱼ·(xᵢⱼ−x̄ⱼ) as fixed float expressions."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.regress import linear_shap
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .select("event_id",
                   F.col("__p.k").cast("long").alias("k"),
                   (F.col("event_id") % 7).alias("x2"),
                   F.round(F.col("value") * 100).cast("long")
                   .alias("cents")))
    out = linear_shap(d, "event_id", "k", "x2", "cents")
    return out.select(
        "event_id",
        F.round("contrib_x1", 6).alias("contrib_x1"),
        F.round("contrib_x2", 6).alias("contrib_x2"),
        F.round("baseline", 6).alias("baseline"),
        F.round("prediction", 6).alias("prediction"))


def q_bleu_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU-2 between consecutive-doc-id candidate/reference pairs:
    clipped n-gram precisions as exact integer num/den per order,
    brevity penalty + geometric mean as the one mirrored float
    expression (NULL where a precision is zero)."""
    from hiselspark.functions.text import bleu_pairs
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = (docs.filter(F.col("doc_id") % 2 == 0)
             .select((F.col("doc_id") / 2).cast("long")
                     .alias("pair_id"),
                     F.col("text").alias("cand")))
    b = (docs.filter(F.col("doc_id") % 2 == 1)
             .select(((F.col("doc_id") - 1) / 2).cast("long")
                     .alias("pair_id"),
                     F.col("text").alias("ref")))
    pairs = a.join(b, "pair_id")
    out = bleu_pairs(pairs, "pair_id", "cand", "ref", max_n=2)
    return out.select("pair_id", "cand_len", "ref_len",
                      "p1_num", "p1_den", "p2_num", "p2_den",
                      F.round("bleu", 6).alias("bleu"))


def q_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good–Turing count-of-counts over the documents vocabulary:
    exact n_r per frequency r, Turing-smoothed r* as one mirrored
    division (NULL at gaps), total token mass attached."""
    from hiselspark.functions.text import good_turing
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = good_turing(docs, "text")
    return out.select("r", "n_r",
                      F.round("r_star", 6).alias("r_star"),
                      "total_tokens")


def q_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram probabilities (d=0.75, bigrams
    with count >= 3) over the documents corpus — every sufficient
    statistic (c12, c1, continuation counts, type total) exact int64,
    pkn one fixed float expression."""
    from hiselspark.functions.text import kneser_ney
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = kneser_ney(docs, "text", discount=0.75, min_count=3,
                     id_col="doc_id")
    return out.select("w1", "w2", "c12", "c1", "n1p_fwd",
                      "n1p_back", "n_types",
                      F.round("pkn", 6).alias("pkn"))


def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-5 with exact re-rank (PQ16x8 +
    IVFADC-R refine: the ADC scan shortlists 32 candidates per probe
    from 16 one-byte codes — 32x smaller scan — then the true cosine
    of the bounded shortlist picks the final 5).  Deterministic end to
    end (hash-ordered trainer sample, seeded per-subspace k-means,
    vec_id tie-break).  Oracle contract: the picked (probe_id, rk,
    vec_id, adc_sim) rows are pinned constants (they encode the
    codebooks — engine-specific by construction; layout-determinism
    checked by tools/pin_constants.py), while ``cos_sim`` is the TRUE
    cosine of each returned pair, independently recomputed by DuckDB
    from the parquet; retrieval quality is gated by a recall floor vs
    the exact verifier (refine lifts recall@5 from ~0.6 to ~1.0 at
    bench scale)."""
    from hiselspark.operators.similarity import pq_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 20)
    out = pq_topk(probes, emb, dim=64, k=5, probe_id_col="vec_id",
                  m=16, n_codes=256, refine=32)
    out = out.select("probe_id", "rk", "vec_id", "adc_sim", "cos_sim")
    return _assert_ann_recall(emb, out, 5, PQ_RECALL_FLOOR, "pq_topk")


def q_embedding_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise embedding centroids (mean pooling) — posexplode +
    two map-side-combined shuffles, dimensions reassembled in order;
    exploded back to scalar rows for the oracle hash."""
    from hiselspark.operators.similarity import embedding_centroid
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .withColumn("grp", F.col("vec_id") % 8))
    cent = embedding_centroid(emb, "grp")
    return (cent.select("grp", "n",
                        F.posexplode("centroid").alias("pos", "m"))
            .select("grp", "n", "pos", F.round("m", 6).alias("m")))


def q_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SymSpell-style fuzzy matching: all token pairs within edit
    distance 1 over the corpus vocabulary plus deterministic typo
    twins (first char dropped from tokens >= 5 chars).  Candidates
    from deletion neighborhoods (complete for distance 1), verified
    with the built-in levenshtein; never a vocabulary cross join."""
    from hiselspark.functions.text import tokens
    from hiselspark.operators.dedup import edit_distance_pairs
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = (docs.select(F.explode(tokens("text")).alias("w"))
             .distinct())
    typos = (vocab.filter(F.length("w") >= 5)
             .select(F.expr("substring(w, 2)").alias("w")))
    out = edit_distance_pairs(vocab.unionByName(typos), "w")
    return out.select("a", "b", "dist")


def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiler (nulls, min/max) over the exact-
    representable columns; the approx-distinct column is bound-checked
    in pytest, not hash-compared (HLL values are engine-specific)."""
    from hiselspark.operators.profile import profile_table
    ev = _ev(spark, sf_dir)
    out = profile_table(ev, ["event_id", "user_id", "event_type"])
    return out.select("column", "n_rows", "n_null", "min_repr",
                      "max_repr")


def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: diff two derived versions of the
    events table (day-20 cut vs day-25 cut with a deterministic
    value bump on event_id % 7 == 0) -> added/removed/changed/
    unchanged counts, null-safe change detection."""
    from hiselspark.operators.profile import table_diff
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    d20 = F.lit("2024-01-20 00:00:00").cast("timestamp")
    d25 = F.lit("2024-01-25 00:00:00").cast("timestamp")
    old = (ev.filter(F.col("ts") < d20)
           .select("event_id", "user_id", "cents"))
    new = (ev.filter(F.col("ts") < d25)
           .withColumn("cents",
                       F.when(F.col("event_id") % 7 == 0,
                              F.col("cents") + 1)
                        .otherwise(F.col("cents")))
           .select("event_id", "user_id", "cents"))
    return table_diff(old, new, ["event_id"])


def q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite over events (Deequ-style): all
    conditional-count rules in ONE aggregate pass + an exact
    uniqueness pass; integer violation counts per rule."""
    from hiselspark.operators.expectations import (check_expectations,
                                                   in_range, in_set,
                                                   matches, not_null)
    ev = _ev(spark, sf_dir)
    out = check_expectations(
        ev,
        [not_null("event_id"), not_null("value"),
         in_range("value", 0.0, 50.0),
         in_set("event_type", ["click", "view", "purchase", "error",
                               "scroll"]),
         matches("props", r"^\{.*\}$")],
        unique_cols=["event_id"])
    return out.select("rule", "violations", "n_rows",
                      F.col("pass").cast("int").alias("ok"))


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters over the corpus token stream (k=40: every
    token with count·41 > N): per-partition Misra-Gries candidates in
    bounded memory, broadcast-semi-join, exact recount — the full
    token stream is never shuffled.  Oracle: plain GROUP BY/HAVING
    with the shared whitespace tokenizer."""
    from hiselspark.functions.text import tokens
    from hiselspark.operators.sketches import heavy_hitters
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(F.explode(tokens("text")).alias("tok"))
    return (heavy_hitters(toks, "tok", k=40, count_col="n")
            .select("tok", "n"))


def q_heavy_hitters_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group exact heavy hitters (top tokens per document lang,
    k=30): Misra-Gries candidates keyed (group, value), exact
    recount — inherits the pigeonhole soundness per group."""
    from hiselspark.functions.text import tokens
    from hiselspark.operators.sketches import heavy_hitters_per_group
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select("lang",
                       F.explode(tokens("text")).alias("tok"))
    return (heavy_hitters_per_group(toks, "lang", "tok", k=30)
            .select("lang", "tok", "n"))


def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-distribution Shannon entropy (quality
    band signal): exact integer counts through two doc-keyed
    shuffles, identical log expression tree in the oracle."""
    from hiselspark.functions.text import char_entropy
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = char_entropy(docs, "doc_id", "text")
    return out.select("doc_id", F.round("char_entropy", 6).alias("h"))


def q_token_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram LM quality score: mean per-token ln P(token)
    under the corpus's own unigram distribution — exact integer counts
    end to end, the per-doc ln fold runs over the SORTED count list so
    both engines add identical doubles in identical order."""
    from hiselspark.functions.text import token_logprob
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = token_logprob(docs, "doc_id", "text")
    return out.select("doc_id", F.round("token_logprob", 6).alias("lp"))


def q_tfidf_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF featurization table: exact integer tf/df per
    (doc, token), weight = tf·ln(N/df) as the identical expression
    tree in both engines."""
    from hiselspark.functions.text import tfidf_weights
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = tfidf_weights(docs, "doc_id", "text")
    return out.select("doc_id", "token", "tf", "df",
                      F.round("tfidf", 6).alias("w"))


def _segmented_select_rows(spark: SparkSession, sf_dir: str):
    """Shared by the gate query and tools/pin_constants.py: the
    per-segment LARS selection with EXACT (unrounded) scores."""
    from hiselspark.selection import select_features_by_segment
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    d = 16
    wide = emb.select(
        "vec_id",
        F.pmod(F.col("vec_id"), F.lit(3)).cast("long").alias("seg"),
        F.col("label").cast("double").alias("y"),
        *[F.col("embedding")[i].cast("double").alias(f"e{i}")
          for i in range(d)])
    out = select_features_by_segment(
        wide, "seg", [f"e{i}" for i in range(d)], ["y"],
        number_of_features=3, n_minibatches=4, order_col="vec_id")
    return [(int(r.segment), int(r.rank), str(r.feature),
             float(r.hsic_score))
            for r in out.itertuples(index=False)]


def q_segmented_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment HSIC-Lasso: which embedding dimensions predict the
    label inside EACH hash segment — all segments in one distributed
    sufficient-stats pass, per-segment LARS on the driver.
    Deterministic (hash minibatches, sorted in-group rows, fixed fold
    order).  Oracle contract (constant-pinned): the per-(segment,
    rank) picks and EXACT scores are pinned constants; the display
    rounding is recomputed by DuckDB from the pinned doubles."""
    rows = _segmented_select_rows(spark, sf_dir)
    df = spark.createDataFrame(
        rows, "segment long, rank int, feature string, hsic_score double")
    return df.select("segment", "rank", "feature",
                     F.round("hsic_score", 6).alias("hsic_score"))


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: k-means cluster the embeddings, greedy eps-ball drop
    within each cluster (id-ordered leader scan).  Oracle contract:
    the seeded k-means assignment is a pinned constant; the dedup
    decision itself (the leader scan) is replayed by DuckDB from the
    parquet vectors (recursive CTE) — see _semantic_dedup_oracle_sql.
    eps is gate-scale-wide so the drop path is exercised on the
    synthetic embeddings (max pairwise cos ~0.51)."""
    from hiselspark.operators.similarity import semantic_dedup
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return (semantic_dedup(emb, dim=64, n_clusters=8, eps=0.65, seed=11)
            .select("vec_id", "cluster", "keep"))


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 lexical retrieval score of every document against a
    fixed query — exact integer tf/df/doclen/N, per-term scores folded
    in token-sorted order so both engines add identical doubles."""
    from hiselspark.functions.text import bm25_score
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = bm25_score(docs, "doc_id", "fast spark query engine", "text")
    return out.select("doc_id", F.round("bm25", 6).alias("s"))


def q_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe grouped k-fold: every event of a user lands in the
    same fold via a deterministic polynomial key hash (pure map stage,
    no shuffle); the oracle recomputes the identical integer fold."""
    from hiselspark.operators.splits import group_kfold
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (group_kfold(ev, "user_id", k=5, salt=3)
            .select("event_id", "user_id", "fold"))


def q_streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM event-time interval join: purchases stream joined
    to the clicks stream within the purchase's trailing 30 minutes —
    Spark buffers each side only as long as the watermark + time
    bounds require (bounded state forever), and the drained backlog
    must equal the ANSI range-join oracle exactly."""
    from hiselspark.streaming.joins import stream_interval_join
    from hiselspark.streaming.sessions import (read_events_stream,
                                               run_stream_to_batch)
    import hashlib
    import os
    batch = _ev(spark, sf_dir)
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    src_dir = f"/tmp/hiselspark_stream_src_{tag}"
    os.makedirs(src_dir, exist_ok=True)
    link = f"{src_dir}/events.parquet"
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/events.parquet", link)

    def load():
        s = read_events_stream(spark, src_dir, batch.schema)
        return s.withColumn("ts", F.col("ts").cast("timestamp"))

    purchases = (load().filter(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts"))
    clicks = (load().filter(F.col("event_type") == "click")
              .select("user_id", "ts",
                      F.round(F.col("value") * 100).cast("long")
                      .alias("cents")))
    j = stream_interval_join(purchases, clicks, "user_id",
                             -1800.0, 0.0, watermark_seconds=3600)
    out = run_stream_to_batch(j, output_mode="append")
    return (out.groupBy("event_id", "user_id")
               .agg(F.count(F.lit(1)).alias("n_clicks"),
                    F.sum("cents_r").alias("click_cents")))


def q_image_augment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic geometric augmentation end-to-end: synthesize 8x8
    raw images, (a) crop(2,1,4x4) + hflip, (b) rot90 — checksummed
    with the position-weighted byte checksum, which any byte
    reordering changes, so the oracle verifies the exact gather
    arithmetic (crop+hflip: out(y,x,c) <- in(1+y, 5-x, c); rot90 CCW:
    out(y,x,c) <- in(x, 7-y, c))."""
    from hiselspark.functions.image import (augment_images,
                                            with_byte_checksum)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    imgs = (orders.select(F.col("o_orderkey").alias("okey"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8))
            .withColumn("fmt", F.lit("raw")))
    imgs = _synth_raw_bytes(imgs, "okey", 7919, 31, 8 * 8 * 3)
    a = with_byte_checksum(
        augment_images(imgs, [("crop", 2, 1, 4, 4), ("hflip",)]),
        out_col="ck_crop_flip")
    b = with_byte_checksum(augment_images(imgs, [("rot90",)]),
                           out_col="ck_rot90")
    return (a.select("okey", F.col("w").alias("aw"),
                     F.col("h").alias("ah"), "ck_crop_flip")
             .join(b.select("okey", "ck_rot90"), "okey"))


def q_purged_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free walk-forward split: train / purged (label window
    crosses the cutoff) / embargo (12 h after cutoff, dropped from
    eval) / eval — microsecond-integer comparisons, pure map stage."""
    from hiselspark.operators.splits import purged_time_split
    ev = _ev(spark, sf_dir)
    out = purged_time_split(ev, "ts", "2024-01-20 00:00:00",
                            label_horizon_seconds=86400.0,
                            embargo_seconds=43200.0)
    return out.select("event_id", "split")


def q_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering top-5 per user (cosine on
    exact co-occurrence counts, sorted score fold, deterministic
    rank) — the oracle replays every similarity and the per-user
    ranking."""
    from hiselspark.operators.cooccur import item_cf_topk
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    inter = ev.select("user_id", (F.col("cents") % 200).alias("item"))
    out = item_cf_topk(inter, "user_id", "item", k=5, min_cooccur=2)
    return out.select(F.col("user").alias("user_id"), "rk", "item",
                      F.round("score", 6).alias("score"))


def q_sessionize_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GA4-style sessionization: inactivity gap (1 day) OR maximum
    session duration (2 days) — the cap makes the rule recursive, so
    it runs as the per-entity fold and the oracle replays it with a
    recursive CTE in pure integer microseconds."""
    from hiselspark.operators.windows import sessionize_capped
    ev = _ev(spark, sf_dir)
    out = sessionize_capped(ev, "user_id", "ts", "event_id",
                            gap_seconds=86400.0,
                            cap_seconds=172800.0)
    return out.select(F.col("entity").alias("user_id"), "ts_us",
                      F.col("order_id").alias("event_id"),
                      "session_id", "session_start_us")


def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM features at a point-in-time cutoff: exact pre-cutoff
    recency/frequency/monetary plus equal-frequency quintile scores
    from the exact CDF binning rule — all integer arithmetic."""
    from hiselspark.operators.labels import rfm_features
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    out = rfm_features(ev, "user_id", "ts", "cents",
                       "2024-01-20 00:00:00", n_bins=5)
    return out.select(F.col("entity").alias("user_id"),
                      "recency_days", "frequency", "monetary",
                      "r_score", "f_score", "m_score")


def q_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus diversity: distinct-1/2/3 n-gram ratios — the standard
    template-spam / decoding-collapse check, exact counts and one
    mirrored division per n."""
    from hiselspark.functions.text import distinct_ngram_ratios
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = distinct_ngram_ratios(docs, "text", max_n=3)
    return out.select("n", "total", "n_distinct",
                      F.round("distinct_ratio", 6)
                      .alias("distinct_ratio"))


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade per document from
    exact word/sentence/syllable counts — zero-shuffle JVM
    expressions; the oracle replays the identical regex arithmetic."""
    from hiselspark.functions.text import readability
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = readability(docs, "doc_id", "text")
    return out.select("doc_id", "n_words", "n_sentences",
                      "n_syllables",
                      F.round("flesch", 4).alias("flesch"),
                      F.round("fk_grade", 4).alias("fk_grade"))


def q_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi decoding of held-out event sequences under the HMM
    count-trained on even user ids (states = event types, obs = cents
    mod 4) — the oracle recomputes every smoothed log probability from
    the parquet and replays the whole lattice with a recursive CTE
    (GREATEST + first-match argmax = the fold's strict-max tie rule)."""
    from hiselspark.operators.hmm import viterbi_decode
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    df = ev.withColumn("obs", F.col("cents") % 4)
    train = df.filter(F.col("user_id") % 2 == 0)
    score = df.filter(F.col("user_id") % 2 == 1)
    out = viterbi_decode(train, score, "user_id", "ts", "event_id",
                         "event_type", "obs")
    return out.select(F.col("entity").alias("user_id"), "n",
                      F.round("best_logprob", 6).alias("best_logprob"),
                      "path")


def q_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity self-join with prefix filtering (AllPairs,
    WWW 2007) at Jaccard >= 1/2 over documents + planted suffix
    copies — no false negatives by the prefix lemma, so the oracle is
    the BRUTE all-pairs Jaccard (no candidate mechanics to trust)."""
    from hiselspark.operators.dedup import prefix_similarity_join
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") < 200))
    mut = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail word")).alias("text"))
    both = docs.select("doc_id", "text").unionByName(mut)
    out = prefix_similarity_join(both, "doc_id", "text", 1, 2)
    return out.select("a", "b", "n_common",
                      F.round("jaccard", 6).alias("jaccard"))


def q_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical Naive Bayes trained on even event ids, scored on
    odd — every Laplace-smoothed likelihood, prior and argmax
    replayed by the oracle (held-out count-model shape)."""
    from hiselspark.operators.nbayes import naive_bayes
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    df = ev.select(F.col("event_id").alias("row_id"),
                   (F.col("cents") % 4).alias("f1"),
                   (F.expr("cents DIV 7") % 3).alias("f2"),
                   (F.col("cents") % 5).alias("f3"),
                   ((F.col("cents") + F.expr("cents DIV 7")) % 3)
                   .alias("y"))
    train = df.filter(F.col("row_id") % 2 == 0)
    score = df.filter(F.col("row_id") % 2 == 1)
    out = naive_bayes(train, score, ["f1", "f2", "f3"], "y")
    return out.select("row_id", "pred_class",
                      F.round("best_logpost", 6).alias("best_logpost"))


def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction per event type with a correlated
    pre-period covariate — pooled theta, adjusted means and the
    variance-reduction ratio all from exact integer sums, one
    mirrored float expression each."""
    from hiselspark.operators.nbayes import cuped
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    df = ev.withColumn(
        "pre", F.expr("cents DIV 2") + F.col("event_id") % 50)
    out = cuped(df, "event_type", "cents", "pre")
    return out.select(F.col("grp").alias("event_type"), "n",
                      F.round("mean_y", 6).alias("mean_y"),
                      F.round("mean_y_adj", 6).alias("mean_y_adj"),
                      F.round("theta", 6).alias("theta"),
                      F.round("var_reduction", 6)
                      .alias("var_reduction"))


def q_stl_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition per user (seasonal = hour
    phase mean, trend = centered ±6-row mean, resid closes the
    identity with the grand mean) — exact integer sums with one
    mirrored division per component."""
    from hiselspark.operators.tsprofile import classical_decompose
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    out = classical_decompose(ev, "user_id", "ts", "event_id",
                              "cents")
    return out.select(F.col("entity").alias("user_id"), "ts_us",
                      F.col("order_id").alias("event_id"), "v",
                      "phase",
                      F.round("seasonal", 6).alias("seasonal"),
                      F.round("trend", 6).alias("trend"),
                      F.round("resid", 6).alias("resid"))


def q_grid_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-density clustering (DBSCAN-lite) over two embedding
    coordinates: power-of-two cell binning (exact float floor), dense
    cells >= 3 points, 8-neighbor components — the oracle replays the
    binning and the component closure with a recursive CTE."""
    from hiselspark.operators.similarity import grid_cluster
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = grid_cluster(emb, "vec_id", "embedding", dims=(0, 1),
                       cell_scale=16, min_pts=3)
    return out.select(F.col("id").alias("vec_id"), "cx", "cy",
                      "is_core", "cluster")


def q_trigram_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram stupid-backoff LM scores for src0 documents against
    the rest-of-corpus reference — every count, branch and ln term of
    the held-out fold replayed by the oracle."""
    from hiselspark.functions.text import trigram_backoff_logprob
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    score = docs.filter(F.col("source") == "src0")
    ref = docs.filter(F.col("source") != "src0")
    out = trigram_backoff_logprob(score, ref, "doc_id")
    return out.select("doc_id", "n_trigrams",
                      F.round("trigram_logprob", 6)
                      .alias("trigram_logprob"))


def q_pit_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free expanding OLS trend per event (slope/intercept/
    prediction fitted on strictly prior rows only) — exact integer
    sufficient sums over the prior-rows frame, mirrored float
    expressions."""
    from hiselspark.operators.regress import pit_expanding_ols
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    out = pit_expanding_ols(ev, "user_id", "ts", "event_id", "cents")
    return out.select(F.col("entity").alias("user_id"), "ts_us",
                      F.col("order_id").alias("event_id"), "y",
                      "n_prior",
                      F.round("slope", 6).alias("slope"),
                      F.round("intercept", 6).alias("intercept"),
                      F.round("prediction", 6).alias("prediction"))


def q_uplift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift-by-decile table (treatment = even event ids): exact
    two-arm response counts per deterministic NTILE cut, mirrored
    rate/uplift divisions — the incremental-lift grading view."""
    from hiselspark.operators.evaluate import uplift_deciles
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    df = ev.select("event_id",
                   (F.col("cents") % 97).alias("score"),
                   (F.col("event_id") % 2 == 0).alias("treat"),
                   ((F.expr("cents DIV 7") % 3) == 0).cast("long")
                   .alias("lbl"))
    out = uplift_deciles(df, "score", F.col("treat"), "lbl",
                         "event_id", n_buckets=10)
    return out.select(F.col("bucket").cast("long").alias("bucket"),
                      "n_t", "n_c", "resp_t", "resp_c",
                      F.round("rate_t", 6).alias("rate_t"),
                      F.round("rate_c", 6).alias("rate_c"),
                      F.round("uplift", 6).alias("uplift"),
                      F.round("cum_uplift", 6).alias("cum_uplift"))


def q_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) substring-level near-dup pairs: documents
    unioned with planted suffix-mutated copies; every k-gram hash,
    window minimum and shared-fingerprint count is replayed by the
    oracle character for character."""
    from hiselspark.operators.dedup import winnowing_pairs
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") < 120))
    mut = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.expr("substring(text, 21)"),
                 F.lit(" extra trailing words here")).alias("text"))
    both = docs.select("doc_id", "text").unionByName(mut)
    out = winnowing_pairs(both, "doc_id", min_shared=3)
    return out.select(F.col("a"), F.col("b"), F.col("n_shared"))


def q_quantile_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency decile binning by the exact CDF rule
    bin = (B·below) DIV n off the distinct-value count table — every
    boundary an integer comparison, no float quantile edges."""
    from hiselspark.operators.encoding import quantile_bin
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    out = quantile_bin(ev, "cents", n_bins=10)
    return out.select("event_id", "cents",
                      F.col("cents_qbin").alias("qbin"))


def q_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Haar wavelet detail energies (3 levels, unnormalized
    integer transform) — every pair sum/difference and energy is an
    exact int64 the oracle replays level by level."""
    from hiselspark.operators.tsprofile import haar_energy
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    out = haar_energy(ev, "user_id", "ts", "event_id", "cents",
                      levels=3)
    return out.select(F.col("entity").alias("user_id"), "n_used",
                      "e1", "e2", "e3")


def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of a block partition over the folded
    supplier-part graph — exact intra-edge/degree counts per
    community, sorted fold for Q, all replayed by the oracle."""
    from hiselspark.operators.graph import modularity
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = li.select((F.col("l_suppkey")).alias("src"),
                      (F.col("l_partkey") % 500 + 1000).alias("dst"))
    nodes = (edges.select(F.col("src").alias("node"))
             .union(edges.select(F.col("dst").alias("node")))
             .distinct())
    comms = nodes.select("node",
                         F.expr("node DIV 64").alias("community"))
    out = modularity(edges, comms)
    return out.select("m", "n_communities",
                      F.round("q", 6).alias("q"))


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / distinct l-diversity audit over a
    quasi-identifier projection of the events table — exact class
    sizes and distinct-sensitive counts, flags as integer
    comparisons."""
    from hiselspark.operators.pii import k_anonymity, l_diversity
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    df = ev.select((F.col("cents") % 10).alias("qa"),
                   (F.hour(F.col("ts").cast("timestamp")) % 4)
                   .alias("qb"),
                   F.col("event_type").alias("sens"))
    ka = k_anonymity(df, ["qa", "qb"], k=50)
    ld = l_diversity(df, ["qa", "qb"], "sens", l=5)
    return (ka.join(ld.select("qa", "qb", "n_sensitive",
                              "violates_l"), ["qa", "qb"])
            .select("qa", "qb", "class_size", "violates_k",
                    "n_sensitive", "violates_l"))


def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between two derived integer features — the
    concordant/discordant counts come off the contingency-cell
    self-join (O(V²) in distinct values, never O(n²) in rows) and the
    oracle replays every product cell."""
    from hiselspark.operators.rankstats import kendall_tau
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    df = ev.select(
        (F.col("cents") % 25).alias("x"),
        ((F.col("cents") % 25) * 3
         + (F.expr("cents DIV 7") % 10)).alias("__t")
    ).select("x", (F.col("__t") % 30).alias("y"))
    out = kendall_tau(df, "x", "y")
    return out.select("n", "n_pairs", "concordant", "discordant",
                      F.round("tau_b", 6).alias("tau_b"))


def q_stump_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best decision-stump threshold by exact information gain over
    the (feature, label) count table — every candidate's class
    entropies fold in sorted order and the oracle replays every
    split's gain plus the deterministic argmax."""
    from hiselspark.operators.rankstats import stump_split
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    df = ev.select((F.col("cents") % 50).alias("x"),
                   (F.expr("cents DIV 7") % 3).alias("y"))
    out = stump_split(df, "x", "y")
    return out.select("threshold", "n_left", "n_right",
                      F.round("h_parent", 6).alias("h_parent"),
                      F.round("gain", 6).alias("gain"))


def q_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KS drift dashboard with Benjamini-Hochberg FDR control:
    exact per-feature D, the asymptotic Smirnov p-value (one mirrored
    exp expression) and the step-up rejection at alpha=0.05 — rank,
    thresholds and the k* cut all replayed by the oracle."""
    from hiselspark.operators.drift import ks_drift_fdr
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    base = ev.select(
        (F.col("cents") % 2).alias("f_parity"),
        (F.col("cents") % 5).alias("f_mod5"),
        (F.expr("cents DIV 7") % 2).alias("f_seven2"),
        (F.expr("cents DIV 7") % 4).alias("f_seven4"),
        (F.expr("unix_micros(cast(ts as timestamp))"
                " DIV 3600000000") % 24).alias("f_hour"),
        F.length("event_type").alias("f_typelen"),
        (F.col("ts").cast("timestamp")
         < F.lit("2024-01-15 00:00:00").cast("timestamp"))
        .alias("__ref"))
    out = ks_drift_fdr(base, _MI_FEATURES, F.col("__ref"), alpha=0.05)
    return out.select(F.col("key").alias("feature"),
                      F.round("ks", 6).alias("ks"),
                      F.round("p", 6).alias("p"),
                      "rank", "m",
                      F.round("bh_threshold", 6).alias("bh_threshold"),
                      "reject")


def q_quantile_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch integration contract (the KLL/GK sibling of
    hll_contract): per event type, the EXACT interpolated median
    (oracle-checked value) next to a boolean asserting Spark's
    approx_percentile(accuracy=1000) landed within its published rank
    error n/accuracy (plus ONE rank of slack for the target-rank
    definition: the sketch aims at ceil(q*n) while the test centers
    on q*n — the half-rank gap otherwise fails hairline cases) — the
    rank test is pure integer arithmetic against the count of values
    below/at the sketch's answer."""
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    apx = (ev.groupBy("event_type")
           .agg(F.expr("approx_percentile(cents, 0.5, 1000)")
                .alias("__apx"),
                F.percentile("cents", 0.5).alias("p50_exact"),
                F.count(F.lit(1)).alias("n")))
    j = ev.join(F.broadcast(apx), "event_type")
    out = (j.groupBy("event_type")
           .agg(F.max("n").alias("n"),
                F.max("p50_exact").alias("p50_exact"),
                F.sum(F.when(F.col("cents") < F.col("__apx"), 1)
                      .otherwise(0)).alias("__lt"),
                F.sum(F.when(F.col("cents") <= F.col("__apx"), 1)
                      .otherwise(0)).alias("__le")))
    ok = ((F.lit(1000) * F.col("__lt")
           <= F.lit(500) * F.col("n") + F.col("n") + F.lit(1000))
          & (F.lit(1000) * F.col("__le")
             >= F.lit(500) * F.col("n") - F.col("n") - F.lit(1000)))
    return out.select("event_type", "n",
                      F.round("p50_exact", 6).alias("p50_exact"),
                      ok.alias("within_rank_bound"))


def q_image_lbp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-binary-pattern texture stats end-to-end on synthesized
    8x8 raw payloads — code bits, uniform-pattern test (circular
    transitions via xor/bit_count) and distinct-code count all exact
    integers; the oracle replays every pixel's 8 comparisons."""
    from hiselspark.functions.image import with_lbp_stats
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    imgs = (orders.select(F.col("o_orderkey").alias("okey"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8))
            .withColumn("fmt", F.lit("raw")))
    imgs = _synth_raw_bytes(imgs, "okey", 7919, 31, 8 * 8 * 3)
    out = with_lbp_stats(imgs)
    return out.select("okey", "lbp_sum", "lbp_n_uniform",
                      "lbp_distinct")


def q_image_median3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3x3 median filter (impulse-noise denoiser) stats end-to-end on
    synthesized 8x8 raw payloads — the 9-neighborhood median is the
    exact 5th-smallest integer, replayed by the oracle with
    list_sort over the same arithmetic pixels."""
    from hiselspark.functions.image import with_median3_stats
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    imgs = (orders.select(F.col("o_orderkey").alias("okey"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8))
            .withColumn("fmt", F.lit("raw")))
    imgs = _synth_raw_bytes(imgs, "okey", 7919, 31, 8 * 8 * 3)
    out = with_median3_stats(imgs)
    return out.select("okey", "med_sum", "med_max", "n_changed")


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): 3-month order
    window, EXISTS-style left-semi join against late lineitems
    (adapted predicate: the testdata schema has no commit/receipt
    dates, so "late" = shipped > 30 days after the order date — the
    plan shape, a date-windowed semi-join + priority rollup, is
    Q4's)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp")
    win = orders.filter(
        (F.col("o_orderdate").cast("timestamp") >= lo)
        & (F.col("o_orderdate").cast("timestamp") < hi))
    late = li.select("l_orderkey", "l_shipdate")
    joined = win.join(
        late,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.unix_micros(F.col("l_shipdate").cast("timestamp"))
           > F.unix_micros(F.col("o_orderdate").cast("timestamp"))
           + F.lit(30 * 86400 * 1_000_000)),
        "left_semi")
    return (joined.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count")))


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority split): one-year
    shipdate window, order join, two-way CASE rollup (adapted:
    l_returnflag stands in for the missing l_shipmode — the plan
    shape, a windowed join + conditional counts per mode, is
    Q12's)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    out = (li.filter((F.col("l_shipdate").cast("timestamp") >= lo)
                     & (F.col("l_shipdate").cast("timestamp") < hi))
           .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
           .groupBy(F.col("l_returnflag").alias("mode"))
           .agg(F.sum(F.when(high, 1).otherwise(0))
                .alias("high_line_count"),
                F.sum(F.when(high, 0).otherwise(1))
                .alias("low_line_count")))
    return out


def q_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile cumulative-gains/lift table of a derived score —
    NTILE cuts with the deterministic (score DESC, id) order; exact
    bucket counts, mirrored rate/lift divisions."""
    from hiselspark.operators.evaluate import lift_table
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    df = ev.select("event_id",
                   (F.col("cents") % 97).alias("score"),
                   ((F.expr("cents DIV 7") % 3) == 0).cast("long")
                   .alias("lbl"))
    out = lift_table(df, "score", "lbl", "event_id", n_buckets=10)
    return out.select(F.col("bucket").cast("long").alias("bucket"),
                      "n", "pos", "cum_n", "cum_pos",
                      F.round("response_rate", 6).alias("response_rate"),
                      F.round("cum_capture", 6).alias("cum_capture"),
                      F.round("cum_lift", 6).alias("cum_lift"))


def q_brier_decomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score on an exact 0..100
    forecast grid — BS computed exactly as integers, REL/RES folded
    over sorted grid cells (on the distinct-value binning the Murphy
    identity BS = REL − RES + UNC holds); the oracle replays every
    cell and fold term."""
    from hiselspark.operators.evaluate import brier_decomposition
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    df = ev.select((F.col("cents") % 101).alias("k"),
                   ((F.col("cents") * 13) % 100
                    < F.col("cents") % 101).cast("long").alias("y"))
    out = brier_decomposition(df, "k", "y", denom=100)
    return out.select("n", "n_groups",
                      F.round("brier", 6).alias("brier"),
                      F.round("rel", 6).alias("rel"),
                      F.round("res", 6).alias("res"),
                      F.round("unc", 6).alias("unc"))


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-filter rule set per document (Rae et al. 2021
    §A1.1) — exact integer counts and integer-comparison flags (the
    thresholds multiply through denominators), replayed by the
    oracle with list expressions."""
    from hiselspark.functions.text import with_gopher_flags
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = with_gopher_flags(docs, "text", min_words=20)
    return out.select(
        "doc_id", "n_words", "sum_word_len", "n_alpha_words",
        "n_stopwords", "n_symbols",
        F.round("mean_word_len", 6).alias("mean_word_len"),
        "flag_word_count", "flag_mean_len", "flag_symbols",
        "flag_alpha", "flag_stopwords", "gopher_pass")


def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction on the supplier↔part bipartite
    projection: for every supplier pair sharing a part, the exact
    common-neighbor count, Jaccard overlap and sorted-fold
    Adamic-Adar score — every term replayed by the oracle."""
    from hiselspark.operators.graph import link_prediction
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = link_prediction(
        li.select(F.col("l_suppkey").alias("src"),
                  F.col("l_partkey").alias("dst")),
        symmetrize_input=False)
    return out.select("a", "b", "cn", "deg_a", "deg_b",
                      F.round("jaccard", 6).alias("jaccard"),
                      F.round("adamic_adar", 6).alias("adamic_adar"))


def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank-correlation matrix of three derived integer
    features — doubled average ranks off the distinct-value count
    table keep every sufficient sum an exact int64; the oracle
    replays ranks via RANK()+tie counts and mirrors the float
    expression tree."""
    from hiselspark.operators.rankstats import spearman_matrix
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    df = ev.select("event_id",
                   (F.col("cents") % 500).alias("f1"),
                   (F.col("cents") % 97).alias("f2"),
                   ((F.col("cents") * 7) % 211).alias("f3"))
    out = spearman_matrix(df, "event_id", ["f1", "f2", "f3"])
    return out.select("col_x", "col_y", "n",
                      F.round("rho", 6).alias("rho"))


def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis rank ANOVA of event value (cents) across event
    types, with the exact tie correction — doubled ranks exact, the
    per-group Σ R²/n fold in sorted group order replayed by the
    oracle term for term."""
    from hiselspark.operators.rankstats import kruskal_wallis
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    out = kruskal_wallis(ev, "event_type", "cents")
    return out.select("n", "n_groups",
                      F.round("h", 6).alias("h"),
                      F.round("tie_c", 6).alias("tie_c"),
                      F.round("h_c", 6).alias("h_c"))


def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t per event type between even and odd
    event ids — exact integer moments, one mirrored float expression
    for mean/variance/t/df."""
    from hiselspark.operators.rankstats import welch_ttest
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    out = welch_ttest(ev, "event_type", F.col("event_id") % 2 == 0,
                      "cents")
    return out.select(F.col("grp").alias("event_type"), "n_a", "n_b",
                      F.round("mean_a", 6).alias("mean_a"),
                      F.round("mean_b", 6).alias("mean_b"),
                      F.round("t", 6).alias("t"),
                      F.round("df", 6).alias("df"))


def q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user autocorrelation function at lags 1-3 — the textbook
    estimator expanded into exact integer sufficient sums (lag
    products + head/tail edge sums), one float expression per lag
    mirrored by the oracle."""
    from hiselspark.operators.tsprofile import autocorrelation
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    out = autocorrelation(ev, "user_id", "ts", "event_id", "cents")
    return out.select(F.col("entity").alias("user_id"), "n",
                      F.round("r1", 6).alias("r1"),
                      F.round("r2", 6).alias("r2"),
                      F.round("r3", 6).alias("r3"))


def q_hampel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel outlier filter (centered ±3-row window, 3 MADs) per
    user — doubled medians keep the entire decision in integer
    arithmetic; the oracle replays both nested medians and the flag
    from the same frame."""
    from hiselspark.operators.tsprofile import hampel_filter
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    out = hampel_filter(ev, "user_id", "ts", "event_id", "cents")
    return out.select(F.col("entity").alias("user_id"), "ts_us",
                      F.col("order_id").alias("event_id"), "v",
                      "med2", "mad2d", "is_outlier")


def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear (double-exponential) smoothing per user timeline —
    the level/trend left fold over the time-ordered series, replayed
    by the oracle with a struct-accumulator list_reduce in the
    identical operation order."""
    from hiselspark.operators.tsprofile import holt_linear
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    out = holt_linear(ev, "user_id", "ts", "event_id", "cents")
    return out.select(F.col("entity").alias("user_id"), "n",
                      F.round("level", 6).alias("level"),
                      F.round("trend", 6).alias("trend"),
                      F.round("forecast_1", 6).alias("forecast_1"))


def q_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 per user query: a structured ranker (score correlated
    with the derived relevance grade) graded with exponential gains
    2^rel − 1 (exact ints) and ln-discounted positions folded in
    ascending-rank order — the oracle replays gains, both rankings
    and both folds term for term."""
    from hiselspark.operators.rank_eval import ndcg_at_k
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    df = ev.select(
        F.col("user_id").alias("q"), "event_id",
        (F.expr("cents DIV 11") % 4).alias("rel"),
        ((F.expr("cents DIV 11") % 4) * 50 + F.col("cents") % 45)
        .alias("sa"))
    out = ndcg_at_k(df, "q", "event_id", "sa", "rel", k=10)
    return out.select(F.col("query").alias("user_id"), "n_docs",
                      F.round("dcg", 6).alias("dcg"),
                      F.round("idcg", 6).alias("idcg"),
                      F.round("ndcg", 6).alias("ndcg"))


def q_pairwise_pref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-encoder-style reranker evaluation: head-to-head pairwise
    preference table of a relevance-correlated ranker vs a hash
    ranker over every labeled within-query preference pair — exact
    integer counts from the bounded per-query self-join, replayed by
    the oracle as the same join."""
    from hiselspark.operators.rank_eval import pairwise_preferences
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    df = ev.select(
        F.col("user_id").alias("q"), "event_id",
        (F.expr("cents DIV 11") % 4).alias("rel"),
        ((F.expr("cents DIV 11") % 4) * 50 + F.col("cents") % 45)
        .alias("sa"),
        (F.col("cents") % 97).alias("sb"))
    out = pairwise_preferences(df, "q", "event_id", "rel", "sa", "sb")
    return out.select(F.col("query").alias("user_id"), "n_pref_pairs",
                      "a_correct", "a_tied", "b_correct", "b_tied",
                      "both_correct")


def q_graph_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UMAP-lite corpus atlas: exact top-3 cosine k-NN edges over the
    embeddings (the SQL-replayable neighbor source; at corpus scale
    the same operator takes mutual_knn / ANN edges), laid out by 3
    rounds of int64 Laplacian smoothing blended with the CW-hash
    anchor — bit-identical across layouts and engines; the oracle
    rebuilds the k-NN graph, the hash init and all 3 rounds as
    materialized CTEs."""
    from hiselspark.operators.layout import graph_layout
    from hiselspark.operators.similarity import cosine_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    knn = (cosine_topk(emb, emb, k=3)
           .select(F.col("probe_id").alias("src"),
                   F.col("vec_id").alias("dst")))
    out = graph_layout(knn, iterations=3, seed=5)
    return out.select("node", "x", "y", "x0", "y0")


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring spans (Lee et al. 2021 fixed-k
    form): per document, how many 20-char k-gram positions occur in
    >= 2 distinct documents, plus the longest run of consecutive
    duplicated positions (= longest fully-duplicated substring,
    length run + k - 1) — the span-masking view of dedup, next to
    the document-level winnowing / containment gates.  The oracle
    replays every position, gram, document frequency and run."""
    from hiselspark.operators.spans import dup_spans
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dup_spans(docs, "doc_id", "text", k=20, min_docs=2)


def q_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT per user over the purchase outcome stream
    (H0: rate 0.15 vs H1: rate 0.25, alpha=0.05, beta=0.2): the
    always-valid sequential A/B decision — first boundary crossing in
    (ts, event_id) order.  Every LLR is npos*l1 + nneg*l0 over EXACT
    integer prefix counts (no ordered float fold), with the four
    double constants shared verbatim with the oracle."""
    from hiselspark.operators.seqtest import sprt
    ev = _ev(spark, sf_dir)
    df = ev.select(
        "user_id", "ts", "event_id",
        (F.col("event_type") == "purchase").cast("int").alias("x"))
    out = sprt(df, "user_id", ["ts", "event_id"], "x",
               p0=0.15, p1=0.25, alpha=0.05, beta=0.2)
    return out.select(F.col("entity").alias("user_id"), "n_total",
                      "n_pos", "decision", "n_decide", "llr_decide",
                      "llr_final")


def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Mann-Whitney U of purchase vs view cents with
    tie-corrected z, A-S erfc p-value and Cliff's delta — doubled
    average ranks off the value count table keep every sufficient
    statistic an exact int64; the oracle replays the count table,
    ranks, sums and the identical float expressions."""
    from hiselspark.operators.rankstats import mann_whitney
    ev = _ev(spark, sf_dir).filter(
        F.col("event_type").isin("purchase", "view"))
    df = ev.select(
        (F.col("event_type") == "purchase").cast("long").alias("a"),
        F.abs(F.round(F.col("value") * 100).cast("long"))
        .alias("cents"))
    return mann_whitney(df, "a", "cents")


def q_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 heuristic cleaning flags (Raffel et al. 2020 §2.2) — the
    line-level rule set next to gopher_rules.  The synthetic corpus
    has no punctuation or line structure, so the gate plants it
    deterministically in BOTH engines: sentence breaks via a literal
    replace of ' table ' with '.\\n', lorem-ipsum / curly-brace /
    javascript-line contamination keyed off doc_id residues.  The
    oracle replays the plant, the line split, every per-line test
    and every count."""
    from hiselspark.functions.text import with_c4_flags
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = F.replace(F.col("text"), F.lit(" table "), F.lit(".\n"))
    t = F.concat(
        t,
        F.when(F.col("doc_id") % 7 == 0, F.lit(" lorem ipsum."))
         .when(F.col("doc_id") % 7 == 1, F.lit(" { config }"))
         .otherwise(F.lit("")))
    t = F.concat(
        t,
        F.when(F.col("doc_id") % 31 == 2,
               F.lit("\njavascript ad code here"))
         .otherwise(F.lit("")))
    out = with_c4_flags(docs.select("doc_id", t.alias("text")))
    return out.select(
        "doc_id", "n_lines", "n_kept_lines", "n_sentences",
        "n_js_lines", "kept_chars", "total_line_chars", "has_lorem",
        "has_brace", F.round("kept_ratio", 6).alias("kept_ratio"),
        "c4_pass")


def q_image_blur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-of-Laplacian blur gate end-to-end on synthesized 8x8
    raw payloads with a PER-IMAGE byte step ((okey % 16)*4): step 0
    yields constant (variance-0) images and small steps yield smooth
    ramps whose only responses are mod-256 wraps, so the blur flag
    splits the population.  The pandas stage emits exact int64
    sufficient statistics; the variance is one mirrored float
    expression and the decision an integer comparison — the oracle
    recomputes every pixel, response, sum and the flag."""
    from hiselspark.functions.image import with_blur_score
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    imgs = (orders.select(F.col("o_orderkey").alias("okey"))
            .withColumn("step", ((F.col("okey") % 16) * 4).cast("long"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8))
            .withColumn("fmt", F.lit("raw")))
    imgs = _synth_raw_bytes_vstep(imgs, "okey", "step", 7919, 8 * 8 * 3)
    # threshold in channel-sum units; synthetic ramps carry mod-256
    # wrap spikes, so the smooth-image band sits well above the
    # classical ~900 — 200000 splits constants+gentle ramps from
    # textured images on this payload model
    out = with_blur_score(imgs.select("okey", "w", "h", "fmt", "bytes"),
                          var_threshold=200000)
    return out.select("okey", "lap_n", "lap_sum", "lap_sumsq",
                      F.round("lap_var", 6).alias("lap_var"),
                      "is_blurry")


def q_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (3 rounds, smallest-label tie
    rule) over the undirected order↔part bipartite graph — the
    community detector whose output modularity() grades.  Exact
    integer votes and a deterministic argmax make every round
    bit-reproducible; the oracle unrolls the identical rounds as
    single-reference CTEs."""
    from hiselspark.operators.graph import label_propagation
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = li.select((F.col("l_orderkey") * 2).alias("src"),
                      (F.col("l_partkey") * 2 + 1).alias("dst"))
    return label_propagation(edges, rounds=3)


def q_ipw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified-propensity ATE (subclassification + Horvitz-
    Thompson IPW) with hour-of-day strata and a planted
    positivity violation (hour 0 is all-treated and must be dropped
    WITH its row count reported).  Exact per-stratum integer sums;
    both cross-stratum folds run in ascending-stratum order and the
    oracle replays every cell and term."""
    from hiselspark.operators.causal import ipw_estimate
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    df = ev.select(
        F.hour("ts").cast("long").alias("b"),
        F.when(F.hour("ts") == 0, F.lit(1))
         .otherwise((F.col("user_id") % 3 == 0).cast("long"))
         .alias("t"),
        F.col("cents").alias("y"))
    return ipw_estimate(df, "t", "y", "b")


def q_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection end-to-end: synthesize 6-frame 4x4 rawv
    clips with PLANTED scene structure (frames identical within a
    scene, base-shifted across boundaries; scene length 2 or 3 keyed
    off the order key), threshold the exact inter-frame SADs, and
    derive cuts / scene count / longest scene / first cut.  Every
    byte, SAD, threshold decision and scene run is replayed
    arithmetically by the oracle."""
    from hiselspark.functions.video import with_scene_cuts
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    vids = (orders.filter(F.col("o_orderkey") % 4 == 0)
            .select(F.col("o_orderkey").alias("okey"))
            .withColumn("w", F.lit(4)).withColumn("h", F.lit(4))
            .withColumn("container", F.lit("rawv")))

    import numpy as np
    import pandas as pd

    def synth(keys):
        k = keys.to_numpy(dtype=np.int64)
        i = np.arange(6 * 48, dtype=np.int64)
        f, j = i // 48, i % 48
        slen = 2 + (k[:, None] // 4) % 2
        scene = f[None, :] // slen
        block = ((k[:, None] * 131 + scene * 347 + j[None, :] * 7)
                 % 256).astype(np.uint8)
        return pd.Series([block[r].tobytes()
                          for r in range(len(k))])

    vids = vids.withColumn(
        "video", F.pandas_udf(synth, "binary")(F.col("okey")))
    out = with_scene_cuts(vids, id_col="okey", bytes_col="video",
                          container_col="container",
                          sad_threshold_per_byte=8)
    return out.select("okey", "n_frames", "n_cuts", "n_scenes",
                      "longest_scene", "first_cut", "sad_total")


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge training (Sennrich et al. 2016) on the corpus
    word-frequency table: 6 rounds of exact weighted pair counting
    with the (count DESC, lhs ASC, rhs ASC) argmax and the
    double-space literal-replace merge.  The oracle replays the vocab
    build, every round's pair counts, every argmax and every merge as
    materialized CTEs — the corpus state round-for-round."""
    from hiselspark.operators.bpe import bpe_train
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = (docs.select(
        F.explode(F.filter(F.split(F.trim("text"), r"\s+"),
                           lambda x: F.length(x) > 0)).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("w")))
    return bpe_train(words, "word", "w", rounds=6)


def q_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust z of three integer features — both order
    statistics off per-(feature, value) count tables via the exact
    doubled-median trick, never a row sort; the score is one mirrored
    float expression over exact ints.  The oracle replays the count
    tables, both medians and every score."""
    from hiselspark.operators.encoding import robust_scale
    ev = _ev(spark, sf_dir).select(
        "event_id", "ts",
        F.abs(F.round(F.col("value") * 100).cast("long"))
        .alias("cents"))
    df = ev.select(
        "event_id", "cents",
        F.hour("ts").cast("long").alias("h"),
        (F.col("event_id") % 50).alias("em"))
    out = robust_scale(df, "event_id", ["cents", "h", "em"])
    return out.select(F.col("id").alias("event_id"), "feature", "v",
                      "m2", "mad2d", F.round("rz", 6).alias("rz"))


def q_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR/hit@10 per user query on the same derived relevance grades
    as the ndcg gate — first-relevant rank via the shared unique tie
    rule, reciprocal as one mirrored division, 0.0 on a miss.  The
    oracle replays the ranking window and the argmin."""
    from hiselspark.operators.rank_eval import mrr_at_k
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    df = ev.select(
        F.col("user_id").alias("q"), "event_id",
        # sparser grades than the ndcg gate so some queries MISS
        F.when(F.expr("cents DIV 11") % 17 == 0, F.lit(1))
         .otherwise(F.lit(0)).alias("rel"),
        (F.col("cents") % 97).alias("s"))
    out = mrr_at_k(df, "q", "event_id", "s", "rel", k=10)
    return out.select(F.col("query").alias("user_id"), "n_docs",
                      "first_rel_rank",
                      F.round("rr", 6).alias("rr"), "hit")


def q_matched_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-stratum 1:1 rank matching (ATT) on the same planted
    design as the ipw gate — hour strata, hour 0 all-treated so a
    genuinely unmatched treated tail exists.  Exact integer pair
    differences off one full-outer (stratum, rank) join; the oracle
    replays ranks, join and sums."""
    from hiselspark.operators.causal import matched_pairs
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    df = ev.select(
        F.hour("ts").cast("long").alias("b"),
        F.when(F.hour("ts") == 0, F.lit(1))
         .otherwise((F.col("user_id") % 3 == 0).cast("long"))
         .alias("t"),
        F.col("cents").alias("y"),
        F.col("event_id").alias("o"))
    return matched_pairs(df, "t", "y", "b", "o")


def q_log_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monroe et al. 2008 log-odds with informative Dirichlet prior:
    which words distinguish the single-digit sources (src0-9) from
    the rest — exact (word, flag) counts, one fixed float expression
    per word (delta, z), every term replayed by the oracle modulo
    libm's ln ulp (rounded to 6)."""
    from hiselspark.operators.cooccur import log_odds_ratio
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = docs.select(
        (F.length("source") == 4).cast("long").alias("fa"), "text")
    return log_odds_ratio(df, "text", "fa", alpha0=100.0, min_count=5)


def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization (Bolstad et al. 2003) of three integer
    features onto their average distribution — unique-tiebroken
    within-feature ranks, exact per-position cross-feature sums, one
    mirrored division; the oracle replays ranks, sums and every
    normalized value."""
    from hiselspark.operators.encoding import quantile_normalize
    ev = _ev(spark, sf_dir).select(
        "event_id", "ts",
        F.abs(F.round(F.col("value") * 100).cast("long"))
        .alias("cents"))
    df = ev.select(
        "event_id", "cents",
        F.hour("ts").cast("long").alias("h"),
        (F.col("event_id") % 50).alias("em"))
    out = quantile_normalize(df, "event_id", ["cents", "h", "em"])
    return out.select(F.col("id").alias("event_id"), "feature", "v",
                      "pos", "qn")


def q_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient of the value>10 rule vs the
    k>=50 rule (the mcnemar pairing re-read as prediction vs label) —
    four exact confusion cells from one aggregate, MCC one mirrored
    float expression."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.evaluate import mcc
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .select((F.round(F.col("value") * 100).cast("long")
                    > 1000).cast("long").alias("y_true"),
                   (F.col("__p.k") >= 50).cast("long").alias("y_pred")))
    out = mcc(d, "y_true", "y_pred")
    return out.select("n", "tp", "fp", "fn", "tn",
                      F.round("mcc", 6).alias("mcc"))


def q_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q over 5-treatment blocks built deterministically
    from events (subject = event_id DIV 5, treatment = event_id % 5,
    success = cents > 500) — incomplete blocks dropped and COUNTED,
    all within-subject statistics exact int64, the k-term column fold
    in treatment order."""
    from hiselspark.operators.evaluate import cochran_q
    ev = _ev(spark, sf_dir)
    d = ev.select(
        F.floor(F.col("event_id") / 5).cast("long").alias("subj"),
        F.pmod(F.col("event_id"), 5).cast("long").alias("treat"),
        (F.round(F.col("value") * 100).cast("long") > 500)
        .cast("long").alias("y"))
    out = cochran_q(d, "subj", "treat", "y")
    return out.select("k", "n_subjects", "n_dropped", "t", "sum_ti2",
                      F.round("sum_cj2", 6).alias("sum_cj2"),
                      F.round("q_stat", 6).alias("q_stat"), "df")


def q_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe equal-variance test of value cents across event
    types — per-group doubled medians off the count table, exact
    int64 deviation sufficient statistics, the anova_f ordered float
    fold for the between-group term."""
    from hiselspark.operators.evaluate import brown_forsythe
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = brown_forsythe(ev, "event_type", "cents")
    return out.select("k", "n",
                      F.round("ss_between", 6).alias("ss_between"),
                      F.round("ss_within", 6).alias("ss_within"),
                      F.round("f_stat", 6).alias("f_stat"))


def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque–Bera normality check of value cents per event type —
    raw power sums exact (Σv int64; Σv²/Σv³/Σv⁴ DECIMAL(38,0)
    matching DuckDB's int128), moments/skew/kurtosis/JB mirrored
    float expressions."""
    from hiselspark.operators.profile import jarque_bera
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.round(F.col("value") * 100).cast("long"))
    out = jarque_bera(ev, "event_type", "cents")
    return out.select("event_type", "n",
                      F.round("mean", 6).alias("mean"),
                      F.round("m2", 6).alias("m2"),
                      F.round("skewness", 6).alias("skewness"),
                      F.round("kurtosis", 6).alias("kurtosis"),
                      F.round("jb", 6).alias("jb"))


def q_iv_wald(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald IV / LATE of a synthetic encouragement design over the
    events stream: instrument z = event parity, dose x = props-k
    shifted +10 under encouragement (guaranteed first-stage
    relevance), outcome y = value cents — per-arm sufficient
    statistics exact int64 from ONE aggregate, ITT / first stage /
    ratio mirrored float expressions."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.causal import iv_wald
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .select(F.pmod(F.col("event_id"), 2).cast("long").alias("z"),
                   (F.col("__p.k").cast("long")
                    + 10 * F.pmod(F.col("event_id"), 2).cast("long"))
                   .alias("x"),
                   F.round(F.col("value") * 100).cast("long")
                   .alias("y")))
    out = iv_wald(d, "z", "x", "y")
    return out.select("n0", "n1", "sx0", "sx1", "sy0", "sy1",
                      F.round("itt_y", 6).alias("itt_y"),
                      F.round("first_stage", 6).alias("first_stage"),
                      F.round("late", 6).alias("late"))


def q_e_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VanderWeele-Ding E-value of the k>=50 "treatment" on the
    cents>1000 outcome (the mcc pairing re-read causally): 2x2 cells
    exact int64 from one aggregate, risk ratio and
    E = RR* + sqrt(RR*(RR*-1)) mirrored float expressions."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.causal import e_value
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .select((F.col("__p.k") >= 50).cast("long").alias("t"),
                   (F.round(F.col("value") * 100).cast("long")
                    > 1000).cast("long").alias("y")))
    out = e_value(d, "t", "y")
    return out.select("n", "n1", "n0", "n11", "n01",
                      F.round("rr", 6).alias("rr"),
                      F.round("evalue", 6).alias("evalue"))


def q_loo_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of event_type against value
    cents — one map-side-combined category aggregate joined back
    (broadcast-sized dim), per-row (S_g - y)/(n_g - 1) the one
    mirrored float division; NULL-y rows kept with NULL loo."""
    from hiselspark.operators.encoding import loo_encode
    ev = _ev(spark, sf_dir).select(
        "event_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    out = loo_encode(ev, "event_id", "event_type", "cents")
    return out.select(F.col("id").alias("event_id"), "category", "y",
                      "n_g", "s_g",
                      F.round("loo", 6).alias("loo"))


def q_theils_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's uncertainty coefficient U(X|Y) for X = k mod 12 and
    Y = k mod 8 (a genuine shared mod-4 dependency): MI by the exact
    sorted count-table fold of mutual_info_table, H(X) by its own
    x-ordered marginal fold, U the one mirrored division."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.feature_rank import theils_u
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .filter(F.col("__p.k").isNotNull())
           .select(F.pmod(F.col("__p.k"), 12).cast("long").alias("x"),
                   F.pmod(F.col("__p.k"), 8).cast("long").alias("y")))
    out = theils_u(d, "x", "y")
    return out.select("n", F.round("h_x", 6).alias("h_x"),
                      F.round("mi", 6).alias("mi"),
                      F.round("u", 6).alias("u"))


def q_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test over 4-treatment blocks built
    deterministically from events (subject = event_id DIV 4,
    treatment = event_id % 4, value = cents) — complete blocks only
    (incomplete dropped AND counted), doubled average ranks exact
    int64 off one value-range window per block, the k-term numerator
    a treatment-ordered float fold."""
    from hiselspark.operators.rankstats import friedman_test
    ev = _ev(spark, sf_dir)
    d = ev.select(
        F.floor(F.col("event_id") / 4).cast("long").alias("subj"),
        F.pmod(F.col("event_id"), 4).cast("long").alias("treat"),
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    out = friedman_test(d, "subj", "treat", "cents")
    return out.select("k", "n_subjects", "n_dropped", "sum_r2sq",
                      F.round("q_stat", 6).alias("q_stat"), "df")


def q_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L ordered-alternative trend test over the same
    complete 4-treatment blocks as q_friedman — L2 = SUM j*R2j exact
    int64 (treatment index j a key-ordered row_number on the k-row
    table), mu/sigma/z mirrored float expressions."""
    from hiselspark.operators.rankstats import page_trend
    ev = _ev(spark, sf_dir)
    d = ev.select(
        F.floor(F.col("event_id") / 4).cast("long").alias("subj"),
        F.pmod(F.col("event_id"), 4).cast("long").alias("treat"),
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    out = page_trend(d, "subj", "treat", "cents")
    return out.select("k", "n_subjects", "n_dropped",
                      F.round("l_stat", 6).alias("l_stat"),
                      F.round("mu_l", 6).alias("mu_l"),
                      F.round("sigma_l", 6).alias("sigma_l"),
                      F.round("z", 6).alias("z"))


def q_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d / Hedges' g of value cents between the k>=50 and
    k<50 arms — per-arm (n, Sv, Sv2) exact int64 from one aggregate,
    pooled variance / d / g mirrored float expressions."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.rankstats import cohens_d
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .select((F.col("__p.k") >= 50).cast("long").alias("f"),
                   F.round(F.col("value") * 100).cast("long")
                   .alias("cents")))
    out = cohens_d(d, "f", "cents")
    return out.select("n1", "n0",
                      F.round("mean1", 6).alias("mean1"),
                      F.round("mean0", 6).alias("mean0"),
                      F.round("var_pooled", 6).alias("var_pooled"),
                      F.round("cohens_d", 6).alias("cohens_d"),
                      F.round("hedges_g", 6).alias("hedges_g"))


def q_somers_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Somers' asymmetric ordinal D between two bounded derived
    features (the kendall_tau contingency-cell self-join plan —
    O(distinct^2), never O(n^2) rows); the oracle replays every
    product cell and both tie-corrected denominators."""
    from hiselspark.operators.rankstats import somers_d
    ev = _ev(spark, sf_dir).withColumn(
        "cents", F.abs(F.round(F.col("value") * 100).cast("long")))
    df = ev.select(
        (F.col("cents") % 25).alias("x"),
        ((F.col("cents") % 25) * 3
         + (F.expr("cents DIV 7") % 10)).alias("__t")
    ).select("x", (F.col("__t") % 30).alias("y"))
    out = somers_d(df, "x", "y")
    return out.select("n", "concordant", "discordant",
                      F.round("d_yx", 6).alias("d_yx"),
                      F.round("d_xy", 6).alias("d_xy"))


def q_hellinger_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hellinger distance per event_type between the first and second
    half of the month over the psi_drift 200-cent bucketing — raw
    shares (no smoothing: sqrt(p*0) = 0 exactly), the Bhattacharyya
    fold in sorted-bucket order mirrored by list_sort+list_reduce."""
    from hiselspark.operators.drift import hellinger_drift
    ev = (_ev(spark, sf_dir)
          .withColumn("cents",
                      F.round(F.col("value") * 100).cast("long"))
          .withColumn("bucket", F.least(F.col("cents") / F.lit(200),
                                        F.lit(24)).cast("long")))
    out = hellinger_drift(ev, ["event_type"], "bucket",
                          F.col("ts") < F.lit("2024-01-16 00:00:00")
                                         .cast("timestamp"))
    return out.select("event_type", "n_ref", "n_cur",
                      F.round("bc", 6).alias("bc"),
                      F.round("hellinger", 6).alias("hellinger"))


def q_tv_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation drift per event_type over the same bucketing —
    the cross-multiplied numerator SUM |cr*n_cur - cc*n_ref| is an
    EXACT int64 integer fold (order-free), TV one mirrored
    division."""
    from hiselspark.operators.drift import tv_drift
    ev = (_ev(spark, sf_dir)
          .withColumn("cents",
                      F.round(F.col("value") * 100).cast("long"))
          .withColumn("bucket", F.least(F.col("cents") / F.lit(200),
                                        F.lit(24)).cast("long")))
    out = tv_drift(ev, ["event_type"], "bucket",
                   F.col("ts") < F.lit("2024-01-16 00:00:00")
                                  .cast("timestamp"))
    return out.select("event_type", "n_ref", "n_cur", "tv_num",
                      F.round("tv", 6).alias("tv"))


def q_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Likelihood-ratio G independence test for k mod 12 vs k mod 8
    (the theils_u pairing): G = 2n*MI off mutual_info_table's exact
    sorted count-table fold, df = (R-1)(C-1) from the marginal
    cardinalities."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.feature_rank import g_test
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .filter(F.col("__p.k").isNotNull())
           .select(F.pmod(F.col("__p.k"), 12).cast("long").alias("x"),
                   F.pmod(F.col("__p.k"), 8).cast("long").alias("y")))
    out = g_test(d, "x", "y")
    return out.select("n", "r", "c",
                      F.round("g_stat", 6).alias("g_stat"), "df")


def q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson lag-1 autocorrelation of each user's cents
    series ordered by event_id — all four sufficient statistics
    (n, Sv, Sv2, S(dv)2) exact int64 off one lag window + one
    aggregate, DW one mirrored float expression."""
    from hiselspark.operators.tsprofile import durbin_watson
    ev = _ev(spark, sf_dir).select(
        "user_id", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    out = durbin_watson(ev, "user_id", "event_id", "cents")
    return out.select(F.col("grp").alias("user_id"), "n",
                      "diff_sq_sum",
                      F.round("dw", 6).alias("dw"))


def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test of each event type's cents series
    around its median (doubled-median off the count table, at-median
    rows dropped — the standard convention), runs counted by one lag
    window over event_id order, z mirrored."""
    from hiselspark.operators.tsprofile import runs_test
    ev = _ev(spark, sf_dir).select(
        "event_type", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    out = runs_test(ev, "event_type", "event_id", "cents")
    return out.select(F.col("grp").alias("event_type"), "n1", "n2",
                      "runs", F.round("z", 6).alias("z"))


def q_grubbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs max-studentized-deviation outlier statistic of cents
    per event type — max|v-mean| folded into max(v_max-mean,
    mean-v_min) so ONE aggregate of exact int64 (n, Sv, Sv2, min,
    max) suffices; G and the flagged endpoint mirrored."""
    from hiselspark.operators.profile import grubbs_test
    ev = _ev(spark, sf_dir).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    out = grubbs_test(ev, "event_type", "cents")
    return out.select(F.col("grp").alias("event_type"), "n",
                      "v_min", "v_max", "outlier_value",
                      F.round("g_stat", 6).alias("g_stat"))


def q_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HHI / top-share / entropy concentration profile of the user
    mix within each event type — exact int64 category counts and
    sum(c^2), the entropy the category-ordered float fold."""
    from hiselspark.operators.profile import concentration_profile
    ev = _ev(spark, sf_dir).select(
        "event_type", F.pmod(F.col("user_id"), 20).alias("ub"))
    out = concentration_profile(ev, "event_type", "ub")
    return out.select(F.col("grp").alias("event_type"), "n",
                      "n_categories", "sum_c2",
                      F.round("hhi", 6).alias("hhi"),
                      F.round("top_share", 6).alias("top_share"),
                      F.round("entropy", 6).alias("entropy"))


def q_group_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment confusion cells and pos-rate/TPR/FPR of the k>=50
    rule against the cents>1000 outcome, segments = user_id mod 3 —
    exact int64 cells from one aggregate, rates mirrored."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.evaluate import group_confusion
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .select(F.pmod(F.col("user_id"), 3).cast("long")
                   .alias("seg"),
                   (F.round(F.col("value") * 100).cast("long")
                    > 1000).cast("long").alias("y"),
                   (F.col("__p.k") >= 50).cast("long").alias("p")))
    out = group_confusion(d, "seg", "y", "p")
    return out.select(F.col("grp").alias("seg"), "n", "tp", "fp",
                      "fn", "tn",
                      F.round("pos_rate", 6).alias("pos_rate"),
                      F.round("tpr", 6).alias("tpr"),
                      F.round("fpr", 6).alias("fpr"))


def q_fairness_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-card fairness summary over q_group_confusion's segments:
    demographic-parity gap, four-fifths disparate-impact ratio,
    equalized-odds gap — max/min selections over the mirrored
    per-group rates (order-free)."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.evaluate import fairness_gaps
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .select(F.pmod(F.col("user_id"), 3).cast("long")
                   .alias("seg"),
                   (F.round(F.col("value") * 100).cast("long")
                    > 1000).cast("long").alias("y"),
                   (F.col("__p.k") >= 50).cast("long").alias("p")))
    out = fairness_gaps(d, "seg", "y", "p")
    return out.select("n_groups",
                      F.round("dp_gap", 6).alias("dp_gap"),
                      F.round("di_ratio", 6).alias("di_ratio"),
                      F.round("tpr_gap", 6).alias("tpr_gap"),
                      F.round("fpr_gap", 6).alias("fpr_gap"),
                      F.round("eo_gap", 6).alias("eo_gap"))


def q_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired sign test of props-k against cents mod 100 — exact
    pos/neg/tie counts from one aggregate, the binomial z one
    mirrored expression."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.rankstats import sign_test
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .select(F.col("__p.k").cast("long").alias("x"),
                   F.pmod(F.round(F.col("value") * 100).cast("long"),
                          100).alias("y")))
    out = sign_test(d, "x", "y")
    return out.select("n_pos", "n_neg", "n_tie",
                      F.round("z", 6).alias("z"))


def q_wilcoxon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test of the same pairing as q_sign_test —
    doubled average ranks of |d| off the count table (exact int64
    W2+), tie-corrected variance, z mirrored."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.rankstats import wilcoxon_signed_rank
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .select(F.col("__p.k").cast("long").alias("x"),
                   F.pmod(F.round(F.col("value") * 100).cast("long"),
                          100).alias("y")))
    out = wilcoxon_signed_rank(d, "x", "y")
    return out.select("n_nonzero", "n_zero", "w2_plus",
                      F.round("z", 6).alias("z"))


def q_kalman1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-level Kalman filter of each user's cents series ordered
    by event_id (q=1, r=4 — exact binary fractions): the sequential
    recursion as a LEFT FOLD with an (m, p, k) struct accumulator,
    replayed operation-for-operation by the DuckDB list_reduce
    oracle."""
    from hiselspark.operators.tsprofile import kalman1d
    ev = _ev(spark, sf_dir).select(
        "user_id", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    out = kalman1d(ev, "user_id", "event_id", "cents",
                   q_var=1.0, r_var=4.0)
    return out.select(F.col("entity").alias("user_id"), "n",
                      F.round("level", 6).alias("level"),
                      F.round("p_var", 6).alias("p_var"),
                      F.round("gain", 6).alias("gain"))


def q_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston intermittent-demand smoothing per user over the
    purchase-only cents series (non-purchase periods are zero
    demand), alpha=1/2 — the (z, p, gap, started) struct fold
    mirrored by the DuckDB list_reduce oracle; NULL forecast for
    users who never purchased."""
    from hiselspark.operators.tsprofile import croston
    ev = _ev(spark, sf_dir).select(
        "user_id", "event_id",
        F.when(F.col("event_type") == "purchase",
               F.round(F.col("value") * 100).cast("long"))
         .otherwise(F.lit(0)).alias("demand"))
    out = croston(ev, "user_id", "event_id", "demand", alpha=0.5)
    return out.select(F.col("entity").alias("user_id"), "n",
                      "n_demand",
                      F.round("z", 6).alias("z"),
                      F.round("p", 6).alias("p"),
                      F.round("forecast", 6).alias("forecast"))


def q_hosmer_lemeshow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hosmer-Lemeshow calibration test of the per-mille score
    k*10 against the cents>1000 outcome, 10 equal-frequency bins via
    the exact integer CDF split — E_b off the exact int64 per-mille
    sum, the B-term chi2 a bin-ordered float fold."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.evaluate import hosmer_lemeshow
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .select((F.col("__p.k").cast("long") * 10).alias("pm"),
                   (F.round(F.col("value") * 100).cast("long")
                    > 1000).cast("long").alias("y")))
    out = hosmer_lemeshow(d, "pm", "y", n_bins=10)
    return out.select("n", "n_bins", "n_degenerate",
                      F.round("hl_stat", 6).alias("hl_stat"), "df")


def q_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T and Atkinson(eps=1) inequality of cents per event
    type — two log-moment folds over the per-value count table in
    value order plus exact int64 (n, sum); non-positive cents dropped
    AND counted."""
    from hiselspark.operators.profile import inequality_profile
    ev = _ev(spark, sf_dir).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    out = inequality_profile(ev, "event_type", "cents")
    return out.select(F.col("grp").alias("event_type"), "n",
                      "n_nonpos", "sum_v",
                      F.round("theil_t", 6).alias("theil_t"),
                      F.round("atkinson", 6).alias("atkinson"))


def q_jonckheere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra ordered-alternative trend across the five
    k-deciles (k DIV 20) over cents mod 200 — doubled J2 exact int64
    off the contingency-cell pair join (O(cells^2), bounded
    alphabet), z from the standard no-tie moments."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.rankstats import jonckheere
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .filter(F.col("__p.k").isNotNull())
           .select(F.floor(F.col("__p.k") / 20).cast("long")
                   .alias("g"),
                   F.pmod(F.round(F.col("value") * 100).cast("long"),
                          200).alias("v")))
    out = jonckheere(d, "g", "v")
    return out.select("k", "n", "j2",
                      F.round("z", 6).alias("z"))


def q_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test of cents across event types — the 2xk
    above/not-above table around the grand doubled median (count-
    table trick), chi2 a group-ordered float fold."""
    from hiselspark.operators.rankstats import mood_median
    ev = _ev(spark, sf_dir).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    out = mood_median(ev, "event_type", "cents")
    return out.select("k", "n", "n_above",
                      F.round("chi2", 6).alias("chi2"), "df")


def q_bartlett(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett equal-variance test of cents across event types —
    per-group exact int64 moments, the two k-term folds
    (ln-variances, reciprocal dfs) in group order, T/C mirrored."""
    from hiselspark.operators.evaluate import bartlett_test
    ev = _ev(spark, sf_dir).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    out = bartlett_test(ev, "event_type", "cents")
    return out.select("k", "n", "n_dropped_groups",
                      F.round("bartlett_stat", 6)
                      .alias("bartlett_stat"), "df")


def q_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend z of the cents>1000 outcome across the
    ten k-deciles used as integer scores — all five sufficient sums
    exact int64 from one aggregate over the score table."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.evaluate import cochran_armitage
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .select(F.floor(F.col("__p.k") / 10).cast("long")
                   .alias("s"),
                   (F.round(F.col("value") * 100).cast("long")
                    > 1000).cast("long").alias("y")))
    out = cochran_armitage(d, "s", "y")
    return out.select("k", "n", "n_pos",
                      F.round("z", 6).alias("z"))


def q_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient of the folded
    order-part graph (keys mod 400) — degree-oriented wedge closing
    kept as an inner join so each triangle credits all three
    corners; the oracle brute-forces the a<b<c triples and unions
    the three corner projections."""
    from hiselspark.operators.graph import clustering_coefficient
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = li.select((F.col("l_orderkey") % 400).alias("src"),
                      (F.col("l_partkey") % 400).alias("dst"))
    out = clustering_coefficient(edges)
    return out.select("node", "degree", "triangles",
                      F.round("lcc", 6).alias("lcc"))


def q_cronbach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha over four derived "items" — three monotone
    views of props-k (highly correlated) plus a cents noise item —
    all sufficient statistics exact int64 from ONE aggregate,
    listwise NULL deletion counted."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.evaluate import cronbach_alpha
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .select(
               F.floor(F.col("__p.k") / 2).cast("long").alias("i1"),
               F.floor(F.col("__p.k") / 3).cast("long").alias("i2"),
               F.floor(F.col("__p.k") / 5).cast("long").alias("i3"),
               F.pmod(F.round(F.col("value") * 100).cast("long"),
                      20).alias("i4")))
    out = cronbach_alpha(d, ["i1", "i2", "i3", "i4"])
    return out.select("n", "n_dropped", "k",
                      F.round("sum_item_var", 6)
                      .alias("sum_item_var"),
                      F.round("total_var", 6).alias("total_var"),
                      F.round("alpha", 6).alias("alpha"))


def q_dickey_fuller(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey-Fuller unit-root regression of each user's cents
    series (Dv on lag v, intercept): all six sufficient sums exact
    int64 off one lag window, b and DF mirrored."""
    from hiselspark.operators.tsprofile import dickey_fuller
    ev = _ev(spark, sf_dir).select(
        "user_id", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    out = dickey_fuller(ev, "user_id", "event_id", "cents")
    return out.select(F.col("grp").alias("user_id"), "n_pairs",
                      F.round("b", 6).alias("b"),
                      F.round("df_stat", 6).alias("df_stat"))


def q_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dyadic periodogram (Nyquist and period-4 lines) of each
    event type's cents sequence — spectral sums are plain signed
    int64 sums keyed by row-number mod 4, no trigonometry; shares
    mirrored."""
    from hiselspark.operators.tsprofile import periodogram_power
    ev = _ev(spark, sf_dir).select(
        "event_type", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    out = periodogram_power(ev, "event_type", "event_id", "cents")
    return out.select(F.col("grp").alias("event_type"), "n", "p2",
                      "p4", "ss2_num",
                      F.round("p2_share", 6).alias("p2_share"),
                      F.round("p4_share", 6).alias("p4_share"))


def q_streaming_kalman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the batch Kalman local-level filter:
    per-user (n, m, p, k) carried across micro-batches with the
    batch fold's exact op order; drained with AvailableNow, the
    final row per user must equal the batch recursion — the oracle
    replays it as a recursive CTE in (ts, event_id) order."""
    import hashlib
    import os
    from pyspark.sql import Window
    from hiselspark.streaming.sessions import (read_events_stream,
                                               run_stream_to_batch)
    from hiselspark.streaming.stateful import stream_kalman
    batch = _ev(spark, sf_dir)
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    src_dir = f"/tmp/hiselspark_stream_src_{tag}"
    os.makedirs(src_dir, exist_ok=True)
    link = f"{src_dir}/events.parquet"
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/events.parquet", link)
    stream = (read_events_stream(spark, src_dir, batch.schema)
              .withColumn("ts", F.col("ts").cast("timestamp"))
              .withColumn("cents",
                          F.abs(F.round(F.col("value") * 100)
                                .cast("long"))))
    out = run_stream_to_batch(
        stream_kalman(stream, "user_id", "ts", "cents", "event_id"),
        output_mode="update")
    w = Window.partitionBy("entity").orderBy(F.col("n_events").desc())
    return (out.withColumn("rk", F.row_number().over(w))
               .filter(F.col("rk") == 1)
               .select(F.col("entity").alias("user_id"), "n_events",
                       F.round("level", 6).alias("level"),
                       F.round("p_var", 6).alias("p_var"),
                       F.round("gain", 6).alias("gain")))


def q_image_glcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haralick GLCM texture stats (8-level quantized, horizontal
    pairs) on synthesized 8x8 raw payloads — contrast / energy
    numerator / lcm-840 homogeneity numerator all exact int64; the
    oracle replays every pixel pair and the 64-cell histogram."""
    from hiselspark.functions.image import with_glcm_stats
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    imgs = (orders.select(F.col("o_orderkey").alias("okey"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8))
            .withColumn("fmt", F.lit("raw")))
    imgs = _synth_raw_bytes(imgs, "okey", 7919, 31, 8 * 8 * 3)
    out = with_glcm_stats(imgs)
    return out.select("okey", "glcm_pairs", "glcm_contrast",
                      "glcm_energy_num", "glcm_hom840")


def q_image_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row/column projection profiles on synthesized 8x8 raw
    payloads — profile sums of squares and center-of-mass numerators
    exact int64; the oracle re-derives both profiles from the pixel
    arithmetic."""
    from hiselspark.functions.image import with_projection_stats
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    imgs = (orders.select(F.col("o_orderkey").alias("okey"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8))
            .withColumn("fmt", F.lit("raw")))
    imgs = _synth_raw_bytes(imgs, "okey", 7919, 31, 8 * 8 * 3)
    out = with_projection_stats(imgs)
    return out.select("okey", "proj_total", "proj_row_ssq",
                      "proj_col_ssq", "com_y_num", "com_x_num")


def q_rbf_hsic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RBF-kernel biased HSIC between k mod 12 and k mod 8 (the
    theils_u pairing) in closed count-table form — the continuous-
    kernel completion of the delta-HSIC gate: nested sorted folds
    over the bounded joint alphabet, gamma an exact binary fraction,
    the oracle replays the double fold with nested list_reduce."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.feature_rank import rbf_hsic_table
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .filter(F.col("__p.k").isNotNull())
           .select(F.pmod(F.col("__p.k"), 12).cast("long").alias("x"),
                   F.pmod(F.col("__p.k"), 8).cast("long").alias("y")))
    out = rbf_hsic_table(d, "x", "y")
    return out.select("n", "n_cells",
                      F.round("hsic", 6).alias("hsic"))


def q_mmd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RBF-kernel two-sample MMD between the month halves over the
    psi_drift 200-cent bucketing — one O(V^2) sorted pair fold
    accumulating all three kernel sums, mirrored by the oracle's
    nested list_reduce."""
    from hiselspark.operators.drift import mmd_rbf_drift
    ev = (_ev(spark, sf_dir)
          .withColumn("cents",
                      F.round(F.col("value") * 100).cast("long"))
          .withColumn("bucket", F.least(F.col("cents") / F.lit(200),
                                        F.lit(24)).cast("long")))
    out = mmd_rbf_drift(ev, "bucket",
                        F.col("ts") < F.lit("2024-01-16 00:00:00")
                                       .cast("timestamp"))
    return out.select("n_ref", "n_cur", "n_values",
                      F.round("mmd2", 9).alias("mmd2"))


def q_rolling_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour VWAP of cents weighted by a derived integer
    volume — both window sums exact int64, one mirrored division
    (NULL on zero-volume windows)."""
    from hiselspark.operators.windows import rolling_vwap
    ev = _ev(spark, sf_dir).select(
        "user_id", "event_id", "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (1 + F.pmod(F.col("event_id"), 9)).alias("vol"))
    out = rolling_vwap(ev, "user_id", "ts", "cents", "vol", 3600.0)
    return out.select("event_id",
                      F.round("roll_vwap", 6).alias("roll_vwap"))


def q_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour Bollinger %B and band-breach flags on cents —
    the breach decision is the exact INTEGER comparison
    (n*x - Sv)^2 * (n-1) > k^2 * n * (n*Sv2 - Sv^2), so on-band ties
    classify identically in every engine; %B mirrored."""
    from hiselspark.operators.windows import bollinger_bands
    ev = _ev(spark, sf_dir).select(
        "user_id", "event_id", "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    out = bollinger_bands(ev, "user_id", "ts", "cents", 3600.0, 2)
    return out.select("event_id",
                      F.round("pct_b", 6).alias("pct_b"),
                      "above_upper", "below_lower")


def q_rolling_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cutler's RSI over the trailing hour of cents moves — gain and
    loss sums exact int64 (lag diffs assigned to the later row,
    (ts, event_id) tie order), RSI one mirrored division."""
    from hiselspark.operators.windows import rolling_rsi
    ev = _ev(spark, sf_dir).select(
        "user_id", "event_id", "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    out = rolling_rsi(ev, "user_id", "ts", "cents", 3600.0,
                      "event_id")
    return out.select("event_id", "rsi_gain", "rsi_loss",
                      F.round("rsi", 6).alias("rsi"))


def q_competing_risks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aalen-Johansen cumulative incidence with cause = event_id mod
    3 (0 censored) and duration = cents DIV 500 per event type —
    exact at-risk windows, the (S, cif1, cif2) prefix fold branch-
    free so the DuckDB list_reduce replay is safe (croston lesson);
    surv+cif1+cif2 = 1 row-for-row."""
    from hiselspark.operators.survival import competing_risks
    ev = _ev(spark, sf_dir).select(
        "event_type",
        F.expr("CAST(round(value*100) AS LONG) DIV 500").alias("dur"),
        F.pmod(F.col("event_id"), 3).cast("long").alias("cause"))
    out = competing_risks(ev, "event_type", "dur", "cause")
    return out.select("event_type", "dur", "n_at_risk", "d1", "d2",
                      "n_censored",
                      F.round("surv", 6).alias("surv"),
                      F.round("cif1", 6).alias("cif1"),
                      F.round("cif2", 6).alias("cif2"))


def q_rate_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kitagawa mix/rate decomposition of the cents>1000 rate change
    between month halves across user segments — exact int64 segment
    cells, the two symmetric-effect folds in segment order; mix +
    rate = delta exactly."""
    from hiselspark.operators.evaluate import rate_decomposition
    ev = _ev(spark, sf_dir).select(
        F.pmod(F.col("user_id"), 5).cast("long").alias("seg"),
        (F.round(F.col("value") * 100).cast("long") > 1000)
        .cast("long").alias("y"),
        (F.col("ts") < F.lit("2024-01-16 00:00:00")
         .cast("timestamp")).alias("r"))
    out = rate_decomposition(ev, "seg", "y", F.col("r"))
    return out.select("n_ref", "n_cur",
                      F.round("rate_ref", 6).alias("rate_ref"),
                      F.round("rate_cur", 6).alias("rate_cur"),
                      F.round("delta", 6).alias("delta"),
                      F.round("mix_effect", 6).alias("mix_effect"),
                      F.round("rate_effect", 6).alias("rate_effect"))


def q_by_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Yekutieli FDR over 100 synthetic hypotheses
    (p = (k*37 mod 1000)/1000 per distinct props-k) — the harmonic
    c(m) an i-ordered fold, thresholds and the step-up rejection
    mirrored."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.drift import by_adjust
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .filter(F.col("__p.k").isNotNull())
           .select(F.col("__p.k").cast("long").alias("k"))
           .distinct()
           .select(F.concat(F.lit("h"), F.col("k")).alias("key"),
                   (F.pmod(F.col("k") * 37, 1000).cast("double")
                    / F.lit(1000.0)).alias("p")))
    out = by_adjust(d, "key", "p", alpha=0.05)
    return out.select("key", F.round("p", 6).alias("p"), "rank", "m",
                      F.round("by_threshold", 9)
                      .alias("by_threshold"), "reject")


def q_lexicon_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon polarity score per document — exact int64 hit counts
    against the fixed positive/negative wordlists via array filters
    (pure JVM expressions), one mirrored division."""
    from hiselspark.functions.text import with_lexicon_sentiment
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = with_lexicon_sentiment(docs, "text")
    return out.select("doc_id", "n_tokens", "n_pos", "n_neg",
                      F.round("sentiment", 6).alias("sentiment"))


def q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword phrases (top 3 per document): stopword-split
    islands, per-doc deg/freq exact int64, phrase score a word-
    position-ordered fold, (score DESC, phrase ASC) ranking — the
    oracle replays tokenization, islands, degrees and the fold."""
    from hiselspark.functions.text import rake_keywords
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = rake_keywords(docs, "doc_id", "text", top_k=3)
    return out.select(F.col("id").alias("doc_id"), "phrase",
                      "n_words", F.round("score", 6).alias("score"),
                      "rank")


def q_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-study abnormal-cents curve around purchase events
    (+/-3 hourly buckets): stacked-anchor interval join, exact int64
    bucket sums, abnormal = bucket mean minus global mean
    mirrored."""
    from hiselspark.operators.windows import event_study
    ev = _ev(spark, sf_dir).select(
        "user_id", "ts", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    out = event_study(ev, "user_id", "ts", "cents",
                      F.col("event_type") == "purchase",
                      n_buckets=3, bucket_seconds=3600.0)
    return out.select("bucket", "n", "sum_v",
                      F.round("mean_v", 6).alias("mean_v"),
                      F.round("abnormal", 6).alias("abnormal"))


def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting of active users: new / retained /
    resurrected actives plus churn attributed to the period the user
    went missing — one lag over the per-(user, day) distinct table,
    all counts exact int64; the ledger identities hold row-for-row."""
    from hiselspark.operators.windows import growth_accounting
    ev = _ev(spark, sf_dir).select("user_id", "ts")
    out = growth_accounting(ev, "user_id", "ts",
                            period_seconds=86400.0)
    return out.select("period", "n_active", "n_new", "n_retained",
                      "n_resurrected", "n_churned")


def q_hbos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-width HBOS anomaly score over (cents, props-k) — per
    feature the exact-CDF decile bins with count/width densities,
    per-row score the fixed-order two-term ln fold; NULL features
    contribute 0."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.profile import hbos_score
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .select("event_id",
                   F.round(F.col("value") * 100).cast("long")
                   .alias("cents"),
                   F.col("__p.k").cast("long").alias("k")))
    out = hbos_score(d, "event_id", ["cents", "k"], n_bins=10)
    return out.select(F.col("id").alias("event_id"), "bin_0",
                      "bin_1", F.round("hbos", 6).alias("hbos"))


def q_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row squared Mahalanobis distance of (cents, props-k) from
    the corpus centroid — 2x2 covariance inverted by Cramer on exact
    int64 moments, the quadratic form mirrored."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.profile import mahalanobis2
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .select("event_id",
                   F.round(F.col("value") * 100).cast("long")
                   .alias("cents"),
                   F.col("__p.k").cast("long").alias("k")))
    out = mahalanobis2(d, "event_id", "cents", "k")
    return out.select(F.col("id").alias("event_id"), "x", "y",
                      F.round("d2", 6).alias("d2"))


def q_js_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """James-Stein shrinkage encoding of event_type against cents —
    pooled-within and between variances off exact int64 moments with
    category-ordered folds, shrinkage weight and encode mirrored."""
    from hiselspark.operators.encoding import js_encode
    ev = _ev(spark, sf_dir).select(
        "event_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    out = js_encode(ev, "event_id", "event_type", "cents")
    return out.select(F.col("id").alias("event_id"), "category",
                      "y", "n_c",
                      F.round("b_shrink", 9).alias("b_shrink"),
                      F.round("js", 6).alias("js"))


def q_two_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z with per-arm Wilson intervals for the k>=50
    vs k<50 conversion (cents>1000) — cells exact int64, z and all
    four CI bounds mirrored (1.96 exact decimal)."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.evaluate import two_prop_test
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .select((F.col("__p.k") >= 50).cast("long").alias("f"),
                   (F.round(F.col("value") * 100).cast("long")
                    > 1000).cast("long").alias("y")))
    out = two_prop_test(d, "f", "y")
    return out.select("n1", "x1", "n0", "x0",
                      F.round("p1", 6).alias("p1"),
                      F.round("p0", 6).alias("p0"),
                      F.round("z", 6).alias("z"),
                      F.round("p1_lo", 6).alias("p1_lo"),
                      F.round("p1_hi", 6).alias("p1_hi"),
                      F.round("p0_lo", 6).alias("p0_lo"),
                      F.round("p0_hi", 6).alias("p0_hi"))


def q_poisson_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Poisson purchase-rate ratio between even and odd
    users (per-user purchase counts over event exposure) — exact
    int64 totals, log-RR z mirrored."""
    from hiselspark.operators.evaluate import poisson_rate_test
    ev = _ev(spark, sf_dir)
    per_user = (ev.groupBy("user_id")
                .agg(F.sum((F.col("event_type") == "purchase")
                           .cast("long")).alias("x"),
                     F.count(F.lit(1)).alias("e"))
                .select(F.pmod(F.col("user_id"), 2).cast("long")
                        .alias("f"), "x", "e"))
    out = poisson_rate_test(per_user, "f", "x", "e")
    return out.select("x1", "e1", "x0", "e0",
                      F.round("rr", 6).alias("rr"),
                      F.round("z", 6).alias("z"))


def q_holm_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm step-down FWER control over the same synthetic
    hypothesis frame as q_by_adjust — stop-at-first-failure via a
    windowed min over failure flags, thresholds mirrored."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.drift import holm_adjust
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .filter(F.col("__p.k").isNotNull())
           .select(F.col("__p.k").cast("long").alias("k"))
           .distinct()
           .select(F.concat(F.lit("h"), F.col("k")).alias("key"),
                   (F.pmod(F.col("k") * 37, 1000).cast("double")
                    / F.lit(1000.0)).alias("p")))
    out = holm_adjust(d, "key", "p", alpha=0.05)
    return out.select("key", F.round("p", 6).alias("p"), "rank", "m",
                      F.round("holm_threshold", 9)
                      .alias("holm_threshold"), "reject")


def q_chao1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 total-vocabulary estimate of the documents corpus —
    S/f1/f2 exact int64 off the token count table, the bias-corrected
    estimator one mirrored expression."""
    from hiselspark.functions.text import chao1_richness
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = chao1_richness(docs, "text")
    return out.select("n_tokens", "s_observed", "f1", "f2",
                      F.round("chao1", 6).alias("chao1"))


def q_lincoln_petersen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman-corrected capture-recapture estimate of the active
    user population from the two month halves as independent
    "captures" — exact distinct counts + semi-join overlap, estimate
    and variance mirrored."""
    from hiselspark.operators.dedup import lincoln_petersen
    ev = _ev(spark, sf_dir)
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    a = ev.filter(F.col("ts") < cut).select("user_id")
    b = ev.filter(F.col("ts") >= cut).select("user_id")
    out = lincoln_petersen(a, b, "user_id")
    return out.select("n_a", "n_b", "n_overlap",
                      F.round("n_hat", 6).alias("n_hat"),
                      F.round("var_hat", 6).alias("var_hat"))


def q_crossmodal_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal dependence card for the image+caption corpus: MI,
    G = 2n*MI and Theil's U between the image-brightness decile
    (projection-profile total of the synthesized payload, exact
    int64) and the caption-length decile — the engine's count-table
    MI machinery run across modalities after a broadcast join of
    captions onto images (doc = okey mod 500, the corpus pairing)."""
    from hiselspark.functions.image import with_projection_stats
    from hiselspark.operators.feature_rank import (g_test,
                                                   mutual_info_table,
                                                   theils_u)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", F.length("text").alias("cap_len")))
    imgs = (orders.select(F.col("o_orderkey").alias("okey"))
            .withColumn("w", F.lit(8)).withColumn("h", F.lit(8))
            .withColumn("fmt", F.lit("raw")))
    imgs = _synth_raw_bytes(imgs, "okey", 7919, 31, 8 * 8 * 3)
    bright = with_projection_stats(imgs).select(
        "okey", F.col("proj_total").alias("bt"))
    pair = bright.join(
        F.broadcast(docs),
        F.pmod(F.col("okey"), 500) == F.col("doc_id"))
    d = pair.select(
        F.expr("(bt % 1000) DIV 100").alias("x"),
        F.expr("(cap_len % 200) DIV 20").alias("y"))
    mi = mutual_info_table(d, "x", "y")
    g = g_test(d, "x", "y")
    u = theils_u(d, "x", "y")
    j = (mi.select("n", F.round("mi", 6).alias("mi"))
         .crossJoin(F.broadcast(
             g.select(F.round("g_stat", 6).alias("g_stat"), "df")))
         .crossJoin(F.broadcast(
             u.select(F.round("u", 6).alias("theils_u")))))
    return j.select("n", "mi", "g_stat", "df", "theils_u")


def q_qini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini uplift curve of the props-k score against the cents>1000
    outcome with parity "treatment" — exact cumulative int64 cells
    from one ntile window, curve / random line / gap mirrored."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.evaluate import qini_curve
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .filter(F.col("__p.k").isNotNull())
           .select("event_id",
                   F.col("__p.k").cast("long").alias("s"),
                   F.pmod(F.col("event_id"), 2).alias("t"),
                   (F.round(F.col("value") * 100).cast("long")
                    > 1000).cast("long").alias("y")))
    out = qini_curve(d, "s", F.col("t") == 1, "y", "event_id",
                     n_buckets=10)
    return out.select("bucket", "cn_t", "cn_c", "cr_t", "cr_c",
                      F.round("qini", 6).alias("qini"),
                      F.round("random_line", 6).alias("random_line"),
                      F.round("gap", 6).alias("gap"))


def q_psi_by_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI drift per feature in ONE pass: four derived integer
    features unpivoted long (stack — a narrow map stage), psi_drift
    keyed by feature name; the sorted-bucket smoothed fold per
    feature mirrored by the oracle."""
    from hiselspark.operators.drift import psi_drift
    ev = (_ev(spark, sf_dir)
          .withColumn("cents",
                      F.round(F.col("value") * 100).cast("long")))
    long = ev.selectExpr(
        """stack(4,
           'cents_bucket', least(cents DIV 200, 24),
           'hour', CAST(hour(ts) AS LONG),
           'user_mod', CAST(user_id % 20 AS LONG),
           'event_mod', CAST(event_id % 16 AS LONG)
        ) AS (feature, bucket)""",
        "ts")
    out = psi_drift(long, ["feature"], "bucket",
                    F.col("ts") < F.lit("2024-01-16 00:00:00")
                                   .cast("timestamp"))
    return out.select("feature", "n_ref", "n_cur",
                      F.round("psi", 6).alias("psi"))


def q_partial_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial correlation of cents and a k-driven composite given k
    — three pairwise correlations off ONE aggregate of exact int64
    moments, the first-order combination mirrored."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.feature_rank import partial_corr
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .select(F.round(F.col("value") * 100).cast("long")
                   .alias("x"),
                   (F.col("__p.k").cast("long") * 5
                    + F.expr("CAST(round(value*100) AS LONG)"
                             " DIV 100")).alias("y"),
                   F.col("__p.k").cast("long").alias("z")))
    out = partial_corr(d, "x", "y", "z")
    return out.select("n", F.round("r_xy", 6).alias("r_xy"),
                      F.round("r_xz", 6).alias("r_xz"),
                      F.round("r_yz", 6).alias("r_yz"),
                      F.round("r_xy_z", 6).alias("r_xy_z"))


def q_covariate_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized-mean-difference balance card of three covariates
    between the k>=50 and k<50 arms — one aggregate of per-arm exact
    int64 moments, one SMD row per covariate in caller order."""
    from pyspark.sql.types import IntegerType, StructField, StructType
    from hiselspark.operators.causal import covariate_balance
    ev = _ev(spark, sf_dir)
    d = (ev.withColumn(
            "__p", F.from_json("props", StructType(
                [StructField("k", IntegerType())])))
           .filter(F.col("__p.k").isNotNull())
           .select((F.col("__p.k") >= 50).cast("long").alias("t"),
                   F.round(F.col("value") * 100).cast("long")
                   .alias("cents"),
                   F.hour("ts").cast("long").alias("hour"),
                   F.pmod(F.col("user_id"), 20).cast("long")
                   .alias("useg")))
    out = covariate_balance(d, "t", ["cents", "hour", "useg"])
    return out.select("covariate", "ord", "n1", "n0",
                      F.round("mean1", 6).alias("mean1"),
                      F.round("mean0", 6).alias("mean0"),
                      F.round("smd", 6).alias("smd"))


def q_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the pooled event-type Markov chain (per-user
    lag transitions in event_id order) — exact transition counts and
    from-marginals, the (from, to)-ordered float fold."""
    from hiselspark.operators.hmm import markov_entropy_rate
    ev = _ev(spark, sf_dir).select("user_id", "event_id",
                                   "event_type")
    out = markov_entropy_rate(ev, "user_id", "event_id",
                              "event_type")
    return out.select("n_transitions", "n_states",
                      F.round("entropy_rate", 6)
                      .alias("entropy_rate"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Every gate query, wrapped in the negative-zero normalizer
    (see ``_nz_df``) so Spark emits +0.0 wherever a rounded float
    lands on zero — mirroring the oracle-side ``_nz_sql`` shell."""
    return {k: _nz_query(v) for k, v in _queries_raw().items()}


def _queries_raw() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "lag_lead": q_lag_lead,
        "link_prediction": q_link_prediction,
        "image_lbp": q_image_lbp,
        "kendall_tau": q_kendall_tau,
        "haar_energy": q_haar_energy,
        "winnowing": q_winnowing,
        "trigram_backoff": q_trigram_backoff,
        "grid_cluster": q_grid_cluster,
        "stl_lite": q_stl_lite,
        "naive_bayes": q_naive_bayes,
        "prefix_join": q_prefix_join,
        "viterbi": q_viterbi,
        "sessionize_capped": q_sessionize_capped,
        "item_cf": q_item_cf,
        "rfm": q_rfm,
        "distinct_ngrams": q_distinct_ngrams,
        "readability": q_readability,
        "cuped": q_cuped,
        "pit_ols": q_pit_ols,
        "ndcg": q_ndcg,
        "pairwise_pref": q_pairwise_pref,
        "graph_layout": q_graph_layout,
        "dup_spans": q_dup_spans,
        "sprt": q_sprt,
        "mann_whitney": q_mann_whitney,
        "c4_rules": q_c4_rules,
        "image_blur": q_image_blur,
        "label_prop": q_label_prop,
        "ipw": q_ipw,
        "scene_cuts": q_scene_cuts,
        "bpe_train": q_bpe_train,
        "robust_scale": q_robust_scale,
        "mrr": q_mrr,
        "matched_pairs": q_matched_pairs,
        "log_odds": q_log_odds,
        "quantile_normalize": q_quantile_normalize,
        "uplift_deciles": q_uplift_deciles,
        "quantile_bin": q_quantile_bin,
        "modularity": q_modularity,
        "k_anonymity": q_k_anonymity,
        "stump_split": q_stump_split,
        "fdr_bh": q_fdr_bh,
        "quantile_contract": q_quantile_contract,
        "image_median3": q_image_median3,
        "tpch_q4": q_tpch_q4,
        "tpch_q12": q_tpch_q12,
        "lift_table": q_lift_table,
        "brier_decomp": q_brier_decomp,
        "gopher_rules": q_gopher_rules,
        "spearman_corr": q_spearman_corr,
        "kruskal_wallis": q_kruskal_wallis,
        "welch_ttest": q_welch_ttest,
        "acf": q_acf,
        "hampel": q_hampel,
        "holt_forecast": q_holt_forecast,
        "ffill": q_ffill,
        "sessionize": q_sessionize,
        "rolling_1h": q_rolling_1h,
        "asof_join": q_asof_join,
        "asof_multi": q_asof_multi,
        "asof_tolerance": q_asof_tolerance,
        "tumbling_daily": q_tumbling_daily,
        "topk_per_user": q_topk_per_user,
        "target_encode": q_target_encode,
        "pit_zscore": q_pit_zscore,
        "json_props": q_json_props,
        "target_encode_chunked": q_target_encode_chunked,
        "pit_zscore_chunked": q_pit_zscore_chunked,
        "tpch_q1": q_tpch_q1,
        "broadcast_join_agg": q_broadcast_join_agg,
        "caption_stats": q_caption_stats,
        "dedup_exact": q_dedup_exact,
        "embedding_topk": q_embedding_topk,
        "pca_project": q_pca_project,
        "mmr_topk": q_mmr_topk,
        "kcenter": q_kcenter,
        "pagerank": q_pagerank,
        "hits": q_hits,
        "geohash_encode": q_geohash_encode,
        "spatial_join": q_spatial_join,
        "bloom_semi_join": q_bloom_semi_join,
        "embedding_profile": q_embedding_profile,
        "weighted_sample": q_weighted_sample,
        "mutual_knn": q_mutual_knn,
        "platt": q_platt,
        "avg_precision": q_avg_precision,
        "ssim_neardup": q_ssim_neardup,
        "leakage_scan": q_leakage_scan,
        "decayed_count": q_decayed_count,
        "mase_backtest": q_mase_backtest,
        "vocab_drift": q_vocab_drift,
        "token_fertility": q_token_fertility,
        "fk_audit": q_fk_audit,
        "diff_in_diff": q_diff_in_diff,
        "ks_test": q_ks_test,
        "qte": q_qte,
        "srm_check": q_srm_check,
        "audio_segments": q_audio_segments,
        "bfs_hops": q_bfs_hops,
        "streaming_cusum": q_streaming_cusum,
        "streaming_holt": q_streaming_holt,
        "streaming_decay": q_streaming_decay,
        "feature_cross": q_feature_cross,
        "rank_normalize": q_rank_normalize,
        "keep_best": q_keep_best,
        "tpch_q5": q_tpch_q5,
        "tpch_q18": q_tpch_q18,
        "tpch_q13": q_tpch_q13,
        "tpch_q17": q_tpch_q17,
        "tpch_q19": q_tpch_q19,
        "tpch_q22": q_tpch_q22,
        "tpch_q2": q_tpch_q2,
        "tpch_q7": q_tpch_q7,
        "tpch_q8": q_tpch_q8,
        "tpch_q9": q_tpch_q9,
        "tpch_q11": q_tpch_q11,
        "tpch_q15": q_tpch_q15,
        "tpch_q16": q_tpch_q16,
        "tpch_q20": q_tpch_q20,
        "tpch_q21": q_tpch_q21,
        "nelson_aalen": q_nelson_aalen,
        "bleu_pairs": q_bleu_pairs,
        "good_turing": q_good_turing,
        "kneser_ney": q_kneser_ney,
        "weighted_hops": q_weighted_hops,
        "ips_offpolicy": q_ips_offpolicy,
        "linear_shap": q_linear_shap,
        "mcnemar": q_mcnemar,
        "mcc": q_mcc,
        "cochran_q": q_cochran_q,
        "brown_forsythe": q_brown_forsythe,
        "jarque_bera": q_jarque_bera,
        "iv_wald": q_iv_wald,
        "e_value": q_e_value,
        "loo_encode": q_loo_encode,
        "theils_u": q_theils_u,
        "friedman": q_friedman,
        "page_trend": q_page_trend,
        "cohens_d": q_cohens_d,
        "somers_d": q_somers_d,
        "hellinger_drift": q_hellinger_drift,
        "tv_drift": q_tv_drift,
        "g_test": q_g_test,
        "durbin_watson": q_durbin_watson,
        "runs_test": q_runs_test,
        "grubbs": q_grubbs,
        "concentration": q_concentration,
        "group_confusion": q_group_confusion,
        "fairness_gaps": q_fairness_gaps,
        "sign_test": q_sign_test,
        "wilcoxon": q_wilcoxon,
        "kalman1d": q_kalman1d,
        "croston": q_croston,
        "hosmer_lemeshow": q_hosmer_lemeshow,
        "inequality": q_inequality,
        "jonckheere": q_jonckheere,
        "mood_median": q_mood_median,
        "bartlett": q_bartlett,
        "cochran_armitage": q_cochran_armitage,
        "clustering_coeff": q_clustering_coeff,
        "cronbach": q_cronbach,
        "dickey_fuller": q_dickey_fuller,
        "periodogram": q_periodogram,
        "streaming_kalman": q_streaming_kalman,
        "image_glcm": q_image_glcm,
        "image_projection": q_image_projection,
        "rbf_hsic": q_rbf_hsic,
        "mmd_drift": q_mmd_drift,
        "rolling_vwap": q_rolling_vwap,
        "bollinger": q_bollinger,
        "rolling_rsi": q_rolling_rsi,
        "competing_risks": q_competing_risks,
        "rate_decomposition": q_rate_decomposition,
        "by_adjust": q_by_adjust,
        "lexicon_sentiment": q_lexicon_sentiment,
        "rake_keywords": q_rake_keywords,
        "event_study": q_event_study,
        "growth_accounting": q_growth_accounting,
        "hbos": q_hbos,
        "mahalanobis": q_mahalanobis,
        "js_encode": q_js_encode,
        "two_prop": q_two_prop,
        "poisson_rate": q_poisson_rate,
        "holm_adjust": q_holm_adjust,
        "chao1": q_chao1,
        "lincoln_petersen": q_lincoln_petersen,
        "crossmodal_mi": q_crossmodal_mi,
        "qini": q_qini,
        "psi_by_feature": q_psi_by_feature,
        "partial_corr": q_partial_corr,
        "covariate_balance": q_covariate_balance,
        "markov_entropy": q_markov_entropy,
        "ece": q_ece,
        "dp_counts": q_dp_counts,
        "ljung_box": q_ljung_box,
        "chrf_pairs": q_chrf_pairs,
        "logrank": q_logrank,
        "fleiss_kappa": q_fleiss_kappa,
        "t_closeness": q_t_closeness,
        "image_corners": q_image_corners,
        "anova_f": q_anova_f,
        "reg_discontinuity": q_reg_discontinuity,
        "energy_distance": q_energy_distance,
        "l_diversity": q_l_diversity,
        "corr_matrix": q_corr_matrix,
        "benford": q_benford,
        "chi2": q_chi2,
        "assoc_rules": q_assoc_rules,
        "triple_barrier": q_triple_barrier,
        "churn_label": q_churn_label,
        "horizon_label": q_horizon_label,
        "auc": q_auc,
        "auc_weekly": q_auc_weekly,
        "retrieval_eval": q_retrieval_eval,
        "bootstrap_ci": q_bootstrap_ci,
        "ks_drift": q_ks_drift,
        "wasserstein_drift": q_wasserstein_drift,
        "info_gain_rank": q_info_gain_rank,
        "mrmr_select": q_mrmr_select,
        "cmim_select": q_cmim_select,
        "hsic_rank": q_hsic_rank,
        "hsic_multi": q_hsic_multi,
        "hsic_perm": q_hsic_perm,
        "hsic_stability": q_hsic_stability,
        "attribution": q_attribution,
        "streaming_attribution": q_streaming_attribution,
        "streaming_alerts": q_streaming_alerts,
        "srp_sketch": q_srp_sketch,
        "triplet_mining": q_triplet_mining,
        "int8_quant": q_int8_quant,
        "zipf_fit": q_zipf_fit,
        "bigram_logprob": q_bigram_logprob,
        "bpe_tokens": q_bpe_tokens,
        "csv_roundtrip": q_csv_roundtrip,
        "jsonl_roundtrip": q_jsonl_roundtrip,
        "isotonic": q_isotonic,
        "mann_kendall": q_mann_kendall,
        "theil_sen": q_theil_sen,
        "cohen_kappa": q_cohen_kappa,
        "conformal": q_conformal,
        "best_threshold": q_best_threshold,
        "feature_hashing": q_feature_hashing,
        "hll_contract": q_hll_contract,
        "ks_by_feature": q_ks_by_feature,
        "negative_samples": q_negative_samples,
        "tpch_q10": q_tpch_q10,
        "tpch_q14": q_tpch_q14,
        "record_linkage": q_record_linkage,
        "changepoint": q_changepoint,
        "sax": q_sax,
        "seasonality": q_seasonality,
        "ts_profile": q_ts_profile,
        "pareto_front": q_pareto_front,
        "triangle_count": q_triangle_count,
        "assortativity": q_assortativity,
        "kcore": q_kcore,
        "containment_pairs": q_containment_pairs,
        "perm_test": q_perm_test,
        "trimmed_mean": q_trimmed_mean,
        "winsorized_mean": q_winsorized_mean,
        "calibration": q_calibration,
        "confusion": q_confusion,
        "km_survival": q_km_survival,
        "group_ols": q_group_ols,
        "rrf": q_rrf,
        "ols_detrend": q_ols_detrend,
        "markov": q_markov,
        "ppmi": q_ppmi,
        "rolling_entropy": q_rolling_entropy,
        "session_paths": q_session_paths,
        "ma_crossover": q_ma_crossover,
        "roc_curve": q_roc_curve,
        "gini": q_gini,
        "hsic_select_embeddings": q_hsic_select_embeddings,
        "feature_selection": q_feature_selection,
        "asof_cogrouped": q_asof_cogrouped,
        "bfill": q_bfill,
        "rolling_excl": q_rolling_excl,
        "running_stats": q_running_stats,
        "cube_agg": q_cube_agg,
        "rollup_agg": q_rollup_agg,
        "decimal_agg": q_decimal_agg,
        "pivot_types": q_pivot_types,
        "salted_agg": q_salted_agg,
        "ngram_jaccard": q_ngram_jaccard,
        "fingerprint_groups": q_fingerprint_groups,
        "language_guess": q_language_guess,
        "quality_score": q_quality_score,
        "embedding_neardup": q_embedding_neardup,
        "minhash_neardup": q_minhash_neardup,
        "simhash_neardup": q_simhash_neardup,
        "lsh_topk": q_lsh_topk,
        "greedy_hsic_search": q_greedy_hsic_search,
        "categorical_search": q_categorical_search,
        "asof_forward": q_asof_forward,
        "asof_ties": q_asof_ties,
        "interval_clicks": q_interval_clicks,
        "tpch_q6": q_tpch_q6,
        "anti_join": q_anti_join,
        "semi_join": q_semi_join,
        "exact_quantiles": q_exact_quantiles,
        "phash_bits": q_phash_bits,
        "hamming_pairs": q_hamming_pairs,
        "streaming_sessions": q_streaming_sessions,
        "ivf_topk": q_ivf_topk,
        "mi_preselect": q_mi_preselect,
        "streaming_running_totals": q_streaming_running_totals,
        "salted_join_agg": q_salted_join_agg,
        "grouping_sets": q_grouping_sets,
        "set_ops": q_set_ops,
        "asof_chunked": q_asof_chunked,
        "sessionize_chunked": q_sessionize_chunked,
        "distinct_users": q_distinct_users,
        "interval_left": q_interval_left,
        "audio_features": q_audio_features,
        "dup_components": q_dup_components,
        "image_pixel_stats": q_image_pixel_stats,
        "image_resize": q_image_resize,
        "image_spatial": q_image_spatial,
        "image_ssim": q_image_ssim,
        "image_color": q_image_color,
        "dhash": q_dhash,
        "image_conv": q_image_conv,
        "image_equalize": q_image_equalize,
        "image_otsu": q_image_otsu,
        "image_morph": q_image_morph,
        "image_blobs": q_image_blobs,
        "image_gradhist": q_image_gradhist,
        "image_moments": q_image_moments,
        "image_boxpeak": q_image_boxpeak,
        "dhash_neardup": q_dhash_neardup,
        "image_curation": q_image_curation,
        "video_frames": q_video_frames,
        "video_motion": q_video_motion,
        "dataset_split": q_dataset_split,
        "decontaminate": q_decontaminate,
        "streaming_late_data": q_streaming_late_data,
        "bucketed_join_agg": q_bucketed_join_agg,
        "training_shards": q_training_shards,
        "pack_sequences": q_pack_sequences,
        "repetition_stats": q_repetition_stats,
        "pii_scrub": q_pii_scrub,
        "hash_sample": q_hash_sample,
        "quota_sample": q_quota_sample,
        "token_budget": q_token_budget,
        "chunk_docs": q_chunk_docs,
        "curate_corpus": q_curate_corpus,
        "streaming_dedup": q_streaming_dedup,
        "sketch_invariants": q_sketch_invariants,
        "snapshot_prune": q_snapshot_prune,
        "lossy_codec_contract": q_lossy_codec_contract,
        "snapshot_incremental": q_snapshot_incremental,
        "snapshot_catchup": q_snapshot_catchup,
        "snapshot_upsert": q_snapshot_upsert,
        "snapshot_rollback": q_snapshot_rollback,
        "snapshot_delete": q_snapshot_delete,
        "snapshot_compact": q_snapshot_compact,
        "zorder_prune": q_zorder_prune,
        "snapshot_stream": q_snapshot_stream,
        "temperature_mix": q_temperature_mix,
        "resample_ffill": q_resample_ffill,
        "resample_interp": q_resample_interp,
        "psi_drift": q_psi_drift,
        "rolling_corr": q_rolling_corr,
        "rolling_corr_chunked": q_rolling_corr_chunked,
        "rolling_slope": q_rolling_slope,
        "rolling_moments": q_rolling_moments,
        "asof_nearest": q_asof_nearest,
        "cross_sectional": q_cross_sectional,
        "rolling_twap": q_rolling_twap,
        "rolling_autocorr": q_rolling_autocorr,
        "burstiness": q_burstiness,
        "funnel": q_funnel,
        "jsd_drift": q_jsd_drift,
        "cohort_retention": q_cohort_retention,
        "rolling_distinct": q_rolling_distinct,
        "rolling_distinct_chunked": q_rolling_distinct_chunked,
        "streaming_asof": q_streaming_asof,
        "time_since_error": q_time_since_error,
        "horizon_lag": q_horizon_lag,
        "ewma": q_ewma,
        "ewma_chunked": q_ewma_chunked,
        "inter_arrival": q_inter_arrival,
        "purged_split": q_purged_split,
        "rolling_median": q_rolling_median,
        "rolling_mad": q_rolling_mad,
        "rolling_rank": q_rolling_rank,
        "drawdown": q_drawdown,
        "cusum": q_cusum,
        "ohlc_bars": q_ohlc_bars,
        "woe_encode": q_woe_encode,
        "seasonal": q_seasonal,
        "rolling_median_chunked": q_rolling_median_chunked,
        "novelty": q_novelty,
        "image_augment": q_image_augment,
        "streaming_interval_join": q_streaming_interval_join,
        "heavy_hitters": q_heavy_hitters,
        "expectations": q_expectations,
        "profile_table": q_profile_table,
        "table_diff": q_table_diff,
        "fuzzy_pairs": q_fuzzy_pairs,
        "embedding_centroid": q_embedding_centroid,
        "pq_topk": q_pq_topk,
        "winsorize": q_winsorize,
        "merge_intervals": q_merge_intervals,
        "scd2_join": q_scd2_join,
        "calendar_features": q_calendar_features,
        "session_features": q_session_features,
        "tpch_q3": q_tpch_q3,
        "char_entropy": q_char_entropy,
        "heavy_hitters_grouped": q_heavy_hitters_grouped,
        "token_logprob": q_token_logprob,
        "tfidf_weights": q_tfidf_weights,
        "group_kfold": q_group_kfold,
        "bm25": q_bm25,
        "semantic_dedup": q_semantic_dedup,
        "segmented_select": q_segmented_select,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_MI_FEAT_SQL = """
        base AS (
          SELECT abs(CAST(round(value*100) AS BIGINT)) AS cents,
                 (epoch_us(ts) // 3600000000) % 24 AS f_hour,
                 CAST(length(event_type) AS BIGINT) AS f_typelen
          FROM events
        ), feat AS (
          SELECT cents % 2 AS f_parity, cents % 5 AS f_mod5,
                 (cents // 7) % 2 AS f_seven2,
                 (cents // 7) % 4 AS f_seven4,
                 f_hour, f_typelen, (cents // 7) % 3 AS y
          FROM base
        )"""


def _mi_sql_ctes(name: str, src: str, keys: list[str]) -> str:
    """CTE chain computing exact plug-in MI per ``keys`` group of a
    long table ``src`` with columns (keys…, x, y) — the same integer
    count table, marginal window sums and sorted float fold as
    ``operators/feature_rank.mutual_info_table``."""
    ks = ", ".join(keys)
    return f"""
        {name}_cells AS (
          SELECT {ks}, x, y, CAST(count(*) AS BIGINT) AS c
          FROM {src} GROUP BY {ks}, x, y
        ), {name}_m AS (
          SELECT {ks}, x, y, c,
            CAST(sum(c) OVER (PARTITION BY {ks}, x) AS BIGINT) AS cx,
            CAST(sum(c) OVER (PARTITION BY {ks}, y) AS BIGINT) AS cy
          FROM {name}_cells
        ), {name}_g AS (
          SELECT {ks}, CAST(sum(c) AS BIGINT) AS n,
            list_sort(list({{'x': x, 'y': y, 'c': c,
                             'cx': cx, 'cy': cy}})) AS cl
          FROM {name}_m GROUP BY {ks}
        ), {name} AS MATERIALIZED (
          SELECT {ks}, n,
            list_reduce(list_prepend(0.0, list_transform(cl, s ->
              (CAST(s.c AS DOUBLE) / CAST(n AS DOUBLE))
              * ln(CAST(s.c * n AS DOUBLE)
                   / CAST(s.cx * s.cy AS DOUBLE)))),
              (acc, t) -> acc + t) AS mi
          FROM {name}_g
        )"""


_MI_FEATURE_NAMES = ["f_parity", "f_mod5", "f_seven2", "f_seven4",
                     "f_hour", "f_typelen"]


def _info_gain_oracle_sql() -> str:
    """TRUE SQL oracle for info_gain_rank: DuckDB rebuilds every
    feature's contingency table and replays the sorted MI fold."""
    unions = "\n          UNION ALL ".join(
        f"SELECT '{f}' AS feature, {f} AS x, y FROM feat"
        for f in _MI_FEATURE_NAMES)
    return f"""
        WITH {_MI_FEAT_SQL}, rlong AS (
          {unions}
        ), {_mi_sql_ctes("rel", "rlong", ["feature"])}
        SELECT feature, n, round(mi, 6) AS mi,
               CAST(ROW_NUMBER() OVER (ORDER BY mi DESC, feature ASC)
                    AS INTEGER) AS rank
        FROM rel
    """


def _hsic_rank_oracle_sql() -> str:
    """TRUE SQL oracle for hsic_rank: DuckDB rebuilds every feature's
    contingency table and recomputes the exact delta-kernel HSIC
    ``A/n² − 2B/n³ + (Cx/n²)(Cy/n²)`` from integer sums — the first
    HSIC-family gate whose oracle recomputes the statistic rather
    than pinning parity."""
    unions = "\n          UNION ALL ".join(
        f"SELECT '{f}' AS feature, {f} AS x, y FROM feat"
        for f in _MI_FEATURE_NAMES)
    return f"""
        WITH {_MI_FEAT_SQL}, rlong AS (
          {unions}
        ), cells AS (
          SELECT feature, x, y, CAST(count(*) AS BIGINT) AS c
          FROM rlong GROUP BY feature, x, y
        ), m AS (
          SELECT feature, x, y, c,
                 sum(c) OVER (PARTITION BY feature, x) AS cx,
                 sum(c) OVER (PARTITION BY feature, y) AS cy
          FROM cells
        ), agg AS (
          SELECT feature,
                 CAST(sum(c) AS BIGINT) AS n,
                 CAST(sum(c*c) AS BIGINT) AS a_sum,
                 CAST(sum(c*cx*cy) AS BIGINT) AS b_sum,
                 CAST(sum(c*cx) AS BIGINT) AS cx_sum,
                 CAST(sum(c*cy) AS BIGINT) AS cy_sum
          FROM m GROUP BY feature
        ), h AS (
          SELECT feature, n,
                 CAST(a_sum AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                 - 2.0 * CAST(b_sum AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                      * CAST(n AS DOUBLE))
                 + (CAST(cx_sum AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                   * (CAST(cy_sum AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                   AS hsic
          FROM agg
        )
        SELECT feature, n, round(hsic, 9) AS hsic,
               CAST(ROW_NUMBER() OVER (ORDER BY hsic DESC,
                                       feature ASC)
                    AS INTEGER) AS rank
        FROM h
    """


def _hsic_sql_block(name: str, src: str) -> str:
    """CTE chain computing the exact delta-kernel HSIC of a two-column
    table ``src`` (x, y) — mirrors ``feature_rank.delta_hsic_table``."""
    return f"""
        {name}_cells AS (
          SELECT x, y, CAST(count(*) AS BIGINT) AS c
          FROM {src} GROUP BY x, y
        ), {name}_m AS (
          SELECT c, sum(c) OVER (PARTITION BY x) AS cx,
                 sum(c) OVER (PARTITION BY y) AS cy
          FROM {name}_cells
        ), {name} AS (
          SELECT CAST(sum(c) AS BIGINT) AS n,
                 CAST(sum(c*c) AS DOUBLE)
                   / (CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE))
                 - 2.0 * CAST(sum(c*cx*cy) AS DOUBLE)
                   / (CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE)
                      * CAST(sum(c) AS DOUBLE))
                 + (CAST(sum(c*cx) AS DOUBLE)
                    / (CAST(sum(c) AS DOUBLE)
                       * CAST(sum(c) AS DOUBLE)))
                   * (CAST(sum(c*cy) AS DOUBLE)
                      / (CAST(sum(c) AS DOUBLE)
                         * CAST(sum(c) AS DOUBLE))) AS hsic
          FROM {name}_m
        )"""


def _hsic_stability_oracle_sql(top_m: int = 3, n_reps: int = 8,
                               seed: int = 8011) -> str:
    """TRUE SQL oracle for hsic_stability: the identical CW constants
    and Poisson thresholds regrow every resample's weighted
    contingency table; all B weighted HSICs, rankings and stability
    fractions replay exactly."""
    from hiselspark.operators.bootstrap import (_CDF, _M31, _SCALE,
                                                cw_constants)
    cw = cw_constants(n_reps, seed)
    vals = ",\n              ".join(
        f"({b}, {a}, {c})" for b, (a, c) in enumerate(cw))
    wcase = " ".join(
        f"WHEN u < {t} THEN {k}" for k, t in enumerate(_CDF[:-1]))
    unions = "\n          UNION ALL ".join(
        f"SELECT '{f}' AS feature, {e} AS x, y, hv FROM feat"
        for f, e in [
            ("f_parity", "f_parity"), ("f_mod5", "f_mod5"),
            ("f_seven2", "f_seven2"), ("f_seven4", "f_seven4"),
            ("f_hour", "f_hour"), ("f_typelen", "f_typelen")])
    return f"""
        WITH cw(rep, a, c) AS (VALUES
              {vals}),
        base AS (
          SELECT abs(CAST(round(value*100) AS BIGINT)) AS cents,
                 (epoch_us(ts) // 3600000000) % 24 AS f_hour,
                 CAST(length(event_type) AS BIGINT) AS f_typelen,
                 list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(str_split(CAST(event_id AS VARCHAR),
                                            ''),
                     ch -> CAST(ascii(ch) AS BIGINT))),
                   (acc, y) -> (acc * 31 + y) % {_M31}) AS hv
          FROM events
        ), feat AS (
          SELECT cents % 2 AS f_parity, cents % 5 AS f_mod5,
                 (cents // 7) % 2 AS f_seven2,
                 (cents // 7) % 4 AS f_seven4,
                 f_hour, f_typelen, (cents // 7) % 3 AS y, hv
          FROM base
        ), rlong AS (
          {unions}
        ), drawn AS (
          SELECT feature, x, y, rep,
                 (CASE {wcase} ELSE 6 END) AS w
          FROM (SELECT feature, x, y, cw.rep,
                       ((hv * cw.a + cw.c) % {_M31}) % {_SCALE} AS u
                FROM rlong, cw) q1
        ), cells AS (
          SELECT feature, rep, x, y,
                 CAST(sum(w) AS BIGINT) AS c
          FROM drawn GROUP BY feature, rep, x, y
        ), m AS (
          SELECT feature, rep, c,
                 sum(c) OVER (PARTITION BY feature, rep, x) AS cx,
                 sum(c) OVER (PARTITION BY feature, rep, y) AS cy
          FROM cells
        ), agg AS (
          SELECT feature, rep,
                 CAST(sum(c) AS BIGINT) AS n,
                 CAST(sum(c*c) AS BIGINT) AS a_sum,
                 CAST(sum(c*cx*cy) AS BIGINT) AS b_sum,
                 CAST(sum(c*cx) AS BIGINT) AS cx_sum,
                 CAST(sum(c*cy) AS BIGINT) AS cy_sum
          FROM m GROUP BY feature, rep
        ), h AS (
          SELECT feature, rep,
                 CAST(a_sum AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                 - 2.0 * CAST(b_sum AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                      * CAST(n AS DOUBLE))
                 + (CAST(cx_sum AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                   * (CAST(cy_sum AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                   AS hsic
          FROM agg
        ), ranked AS (
          SELECT feature, rep,
                 row_number() OVER (PARTITION BY rep
                                    ORDER BY hsic DESC, feature ASC)
                   AS rk
          FROM h
        )
        SELECT feature,
               CAST(sum(CASE WHEN rk <= {top_m} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_selected,
               CAST(count(*) AS BIGINT) AS n_replicates,
               round(CAST(sum(CASE WHEN rk <= {top_m} THEN 1
                                   ELSE 0 END) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 6) AS stability
        FROM ranked GROUP BY feature
    """


def _hsic_perm_oracle_sql(n_perms: int = 20, seed: int = 6011) -> str:
    """TRUE SQL oracle for hsic_perm: the identical Carter-Wegman
    permutation constants, every rank-order permutation rebuilt, every
    permuted HSIC recomputed, and the exact tail count / p-value."""
    from hiselspark.operators.bootstrap import _M31, cw_constants
    cw = cw_constants(n_perms, seed)
    cases = [("dep", "(cents // 7) % 2", "(cents // 7) % 3",
              "dependent"),
             ("ind", "cents % 2", "cents % 5", "independent")]
    parts, selects = [], []
    parts.append("""base0 AS (
          SELECT event_id AS id,
                 abs(CAST(round(value*100) AS BIGINT)) AS cents
          FROM events WHERE event_id % 11 = 0
        )""")
    for tag, xe, ye, label in cases:
        parts.append(f"""{tag}_base AS (
          SELECT id, {xe} AS x, {ye} AS y FROM base0
        )""")
        parts.append(f"""{tag}_left AS (
          SELECT row_number() OVER (ORDER BY id) AS i, x
          FROM {tag}_base
        )""")
        parts.append(_hsic_sql_block(f"{tag}_obs",
                                     f"{tag}_base").strip())
        branch_names = []
        for b, (a, c) in enumerate(cw):
            parts.append(f"""{tag}_r{b} AS (
          SELECT row_number() OVER (
                   ORDER BY (((id * {a} + {c}) % {_M31})
                             * ((id * {a} + {c}) % {_M31}))
                            % {_M31}, id) AS i, y
          FROM {tag}_base
        )""")
            parts.append(f"""{tag}_p{b} AS (
          SELECT l.x, r.y FROM {tag}_left l
          JOIN {tag}_r{b} r USING (i)
        )""")
            parts.append(_hsic_sql_block(f"{tag}_h{b}",
                                         f"{tag}_p{b}").strip())
            branch_names.append(f"{tag}_h{b}")
        union = "\n          UNION ALL ".join(
            f"SELECT hsic FROM {bn}" for bn in branch_names)
        parts.append(f"""{tag}_perms AS (
          {union}
        )""")
        selects.append(f"""
        SELECT '{label}' AS pair, o.n, round(o.hsic, 9) AS hsic,
               CAST({n_perms} AS BIGINT) AS n_perms,
               CAST((SELECT count(*) FROM {tag}_perms p
                     WHERE p.hsic >= o.hsic) AS BIGINT) AS n_ge,
               round((1.0 + (SELECT count(*) FROM {tag}_perms p
                             WHERE p.hsic >= o.hsic))
                     / {float(n_perms + 1)!r}, 6) AS p_value
        FROM {tag}_obs o""")
    return ("WITH " + ",\n        ".join(parts)
            + "\n" + "\nUNION ALL\n".join(selects))


def _mrmr_oracle_sql(k: int = 4) -> str:
    """TRUE SQL oracle for mrmr_select: relevance + pairwise
    redundancy MI tables, then ``k`` unrolled greedy argmax steps
    (mean redundancy folded in sorted-selected-name order, ties to the
    feature name) — nothing is pinned."""
    feats = sorted(_MI_FEATURE_NAMES)
    rel_unions = "\n          UNION ALL ".join(
        f"SELECT '{f}' AS feature, {f} AS x, y FROM feat"
        for f in _MI_FEATURE_NAMES)
    pair_unions = "\n          UNION ALL ".join(
        f"SELECT '{a}' AS fa, '{b}' AS fb, {a} AS x, {b} AS y FROM feat"
        for i, a in enumerate(feats) for b in feats[i + 1:])
    ctes = [
        _MI_FEAT_SQL.strip(),
        f"rlong AS (\n          {rel_unions}\n        )",
        _mi_sql_ctes("rel", "rlong", ["feature"]).strip(),
        f"plong AS (\n          {pair_unions}\n        )",
        _mi_sql_ctes("red0", "plong", ["fa", "fb"]).strip(),
        "redb AS MATERIALIZED (SELECT fa, fb, mi FROM red0"
        " UNION ALL SELECT fb AS fa, fa AS fb, mi FROM red0)",
        "p1 AS MATERIALIZED (SELECT feature, mi AS relevance,"
        " 0.0 AS redundancy, mi AS score FROM rel"
        " ORDER BY mi DESC, feature ASC LIMIT 1)",
        "sel1 AS (SELECT feature FROM p1)",
    ]
    for t in range(2, k + 1):
        ctes.append(f"""rem{t - 1} AS (
          SELECT * FROM rel WHERE feature NOT IN
            (SELECT feature FROM sel{t - 1}))""")
        ctes.append(f"""cand{t} AS (
          SELECT r.feature, r.mi AS relevance,
            list_reduce(list_prepend(0.0, list_transform(
              list_sort(list({{'s': rd.fb, 'm': rd.mi}})),
              q -> q.m)), (a, b) -> a + b) / {t - 1} AS redundancy
          FROM rem{t - 1} r JOIN redb rd ON rd.fa = r.feature
            AND rd.fb IN (SELECT feature FROM sel{t - 1})
          GROUP BY r.feature, r.mi)""")
        ctes.append(f"""p{t} AS MATERIALIZED (
          SELECT feature, relevance, redundancy,
                 relevance - redundancy AS score
          FROM cand{t}
          ORDER BY relevance - redundancy DESC, feature ASC LIMIT 1)""")
        if t < k:
            ctes.append(f"sel{t} AS (SELECT feature FROM sel{t - 1}"
                        f" UNION ALL SELECT feature FROM p{t})")
    unions = "\n          UNION ALL ".join(
        f"SELECT {t} AS rk, feature, relevance, redundancy, score"
        f" FROM p{t}" for t in range(1, k + 1))
    return ("WITH " + ",\n        ".join(ctes) + f"""
        SELECT rk, feature, round(relevance, 6) AS relevance,
               round(redundancy, 6) AS redundancy,
               round(score, 6) AS score
        FROM ({unions})
    """)


def _viterbi_oracle_sql(k: int = 5, v: int = 4) -> str:
    """TRUE SQL oracle for the Viterbi gate: smoothed log
    probabilities recomputed from the parquet counts (scalar
    subqueries), then the K-state lattice unrolled as a recursive CTE
    carrying (lp_s, path_s) columns.  The per-step argmax is
    GREATEST + a first-match CASE — exactly the fold's ascending
    strict-max scan (ties to the smaller state index), comparing
    bit-identical doubles."""
    sts = ["click", "error", "purchase", "signup", "view"][:k]

    def init_lp(s):
        return (f"ln(CAST(COALESCE((SELECT c FROM initc WHERE"
                f" s='{sts[s]}'), 0) + 1 AS DOUBLE)"
                f" / CAST((SELECT sum(c) FROM initc) + {k}"
                f" AS DOUBLE))")

    def trans_lp(i, j):
        return (f"ln(CAST(COALESCE((SELECT c FROM transc WHERE"
                f" prev='{sts[i]}' AND s='{sts[j]}'), 0) + 1"
                f" AS DOUBLE) / CAST(COALESCE((SELECT sum(c) FROM"
                f" transc WHERE prev='{sts[i]}'), 0) + {k}"
                f" AS DOUBLE))")

    def emit_lp(s, o):
        return (f"ln(CAST(COALESCE((SELECT c FROM emitc WHERE"
                f" s='{sts[s]}' AND obs={o}), 0) + 1 AS DOUBLE)"
                f" / CAST(COALESCE((SELECT sum(c) FROM emitc WHERE"
                f" s='{sts[s]}'), 0) + {v} AS DOUBLE))")

    model_cols = []
    for s in range(k):
        model_cols.append(f"{init_lp(s)} AS pi{s}")
    for i in range(k):
        for j in range(k):
            model_cols.append(f"{trans_lp(i, j)} AS a_{i}_{j}")
    for s in range(k):
        for o in range(v):
            model_cols.append(f"{emit_lp(s, o)} AS b_{s}_{o}")

    def emit_case(s, obs_expr):
        whens = " ".join(f"WHEN {o} THEN m.b_{s}_{o}"
                         for o in range(v))
        return f"(CASE {obs_expr} {whens} END)"

    base_cols = []
    for s in range(k):
        base_cols.append(
            f"m.pi{s} + {emit_case(s, 's.obs')} AS lp{s}")
    for s in range(k):
        base_cols.append(f"'{s}' AS p{s}")

    # column ORDER must match the anchor (all lp then all p): the
    # recursive UNION ALL aligns by position, not name
    rec_lp, rec_p = [], []
    for s in range(k):
        cands = [f"r.lp{i} + m.a_{i}_{s}" for i in range(k)]
        mx = f"GREATEST({', '.join(cands)})"
        pick = " ".join(
            f"WHEN {cands[i]} = {mx} THEN r.p{i}" for i in range(k))
        rec_lp.append(f"{mx} + {emit_case(s, 's.obs')} AS lp{s}")
        rec_p.append(f"(CASE {pick} END) || '-{s}' AS p{s}")
    rec_cols = rec_lp + rec_p

    fin_cands = [f"lp{s}" for s in range(k)]
    fin_mx = f"GREATEST({', '.join(fin_cands)})"
    fin_pick = " ".join(
        f"WHEN lp{s} = {fin_mx} THEN p{s}" for s in range(k))

    return f"""
        WITH RECURSIVE q AS (
          SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
                 abs(CAST(round(value*100) AS BIGINT)) % 4 AS obs
          FROM events
        ), tr AS (
          SELECT user_id, event_type AS s, obs,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY us, event_id) AS prev
          FROM q WHERE user_id % 2 = 0
        ), initc AS (
          SELECT s, CAST(count(*) AS BIGINT) AS c
          FROM tr WHERE prev IS NULL GROUP BY s
        ), transc AS (
          SELECT prev, s, CAST(count(*) AS BIGINT) AS c
          FROM tr WHERE prev IS NOT NULL GROUP BY prev, s
        ), emitc AS (
          SELECT s, obs, CAST(count(*) AS BIGINT) AS c
          FROM tr GROUP BY s, obs
        ), model AS (
          SELECT {', '.join(model_cols)}
        ), sc AS (
          SELECT user_id, obs,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY us, event_id) AS i,
                 count(*) OVER (PARTITION BY user_id) AS n
          FROM q WHERE user_id % 2 = 1
        ), rec AS (
          SELECT s.user_id, s.i, s.n,
                 {', '.join(base_cols)}
          FROM sc s, model m WHERE s.i = 1
          UNION ALL
          SELECT s.user_id, s.i, s.n,
                 {', '.join(rec_cols)}
          FROM rec r
          JOIN sc s ON s.user_id = r.user_id AND s.i = r.i + 1,
               model m
        )
        SELECT user_id, CAST(n AS BIGINT) AS n,
               round({fin_mx}, 6) AS best_logprob,
               (CASE {fin_pick} END) AS path
        FROM rec WHERE i = n
    """


def _cmi_sql_ctes(name: str, src: str) -> str:
    """CTE chain computing exact plug-in CONDITIONAL MI per (fa, fb)
    of a long table ``src`` with columns (fa, fb, x, y, z) — the same
    3-way integer count table, marginal window sums and sorted float
    fold as ``operators/feature_rank.conditional_mi_table``."""
    return f"""
        {name}_cells AS (
          SELECT fa, fb, x, y, z, CAST(count(*) AS BIGINT) AS c
          FROM {src} GROUP BY fa, fb, x, y, z
        ), {name}_m AS (
          SELECT fa, fb, x, y, z, c,
            CAST(sum(c) OVER (PARTITION BY fa, fb, z) AS BIGINT)
              AS cz,
            CAST(sum(c) OVER (PARTITION BY fa, fb, x, z) AS BIGINT)
              AS cxz,
            CAST(sum(c) OVER (PARTITION BY fa, fb, y, z) AS BIGINT)
              AS cyz
          FROM {name}_cells
        ), {name}_g AS (
          SELECT fa, fb, CAST(sum(c) AS BIGINT) AS n,
            list_sort(list({{'x': x, 'y': y, 'z': z, 'c': c,
                             'cz': cz, 'cxz': cxz, 'cyz': cyz}}))
              AS cl
          FROM {name}_m GROUP BY fa, fb
        ), {name} AS MATERIALIZED (
          SELECT fa, fb, n,
            list_reduce(list_prepend(0.0, list_transform(cl, s ->
              (CAST(s.c AS DOUBLE) / CAST(n AS DOUBLE))
              * ln(CAST(s.c * s.cz AS DOUBLE)
                   / CAST(s.cxz * s.cyz AS DOUBLE)))),
              (acc, t) -> acc + t) AS cmi
          FROM {name}_g
        )"""


def _cmim_oracle_sql(k: int = 4) -> str:
    """TRUE SQL oracle for cmim_select: relevance MI table plus ALL
    ordered-pair conditional MIs, then ``k`` unrolled greedy steps
    (min over the selected set, argmax with ties to the feature
    name) — nothing is pinned."""
    feats = sorted(_MI_FEATURE_NAMES)
    rel_unions = "\n          UNION ALL ".join(
        f"SELECT '{f}' AS feature, {f} AS x, y FROM feat"
        for f in _MI_FEATURE_NAMES)
    tri_unions = "\n          UNION ALL ".join(
        f"SELECT '{a}' AS fa, '{b}' AS fb, {a} AS x, y AS y,"
        f" {b} AS z FROM feat"
        for a in feats for b in feats if a != b)
    ctes = [
        _MI_FEAT_SQL.strip(),
        f"rlong AS (\n          {rel_unions}\n        )",
        _mi_sql_ctes("rel", "rlong", ["feature"]).strip(),
        f"tlong AS (\n          {tri_unions}\n        )",
        _cmi_sql_ctes("cmib", "tlong").strip(),
        "p1 AS MATERIALIZED (SELECT feature, mi AS relevance,"
        " mi AS cmim_score FROM rel"
        " ORDER BY mi DESC, feature ASC LIMIT 1)",
        "sel1 AS (SELECT feature FROM p1)",
    ]
    for t in range(2, k + 1):
        ctes.append(f"""rem{t - 1} AS (
          SELECT * FROM rel WHERE feature NOT IN
            (SELECT feature FROM sel{t - 1}))""")
        ctes.append(f"""cand{t} AS (
          SELECT r.feature, r.mi AS relevance,
                 min(cm.cmi) AS cmim_score
          FROM rem{t - 1} r JOIN cmib cm ON cm.fa = r.feature
            AND cm.fb IN (SELECT feature FROM sel{t - 1})
          GROUP BY r.feature, r.mi)""")
        ctes.append(f"""p{t} AS MATERIALIZED (
          SELECT feature, relevance, cmim_score
          FROM cand{t}
          ORDER BY cmim_score DESC, feature ASC LIMIT 1)""")
        if t < k:
            ctes.append(f"sel{t} AS (SELECT feature FROM sel{t - 1}"
                        f" UNION ALL SELECT feature FROM p{t})")
    unions = "\n          UNION ALL ".join(
        f"SELECT {t} AS rk, feature, relevance, cmim_score"
        f" FROM p{t}" for t in range(1, k + 1))
    return ("WITH " + ",\n        ".join(ctes) + f"""
        SELECT rk, feature, round(relevance, 6) AS relevance,
               round(cmim_score, 6) AS cmim_score
        FROM ({unions})
    """)


def _sql_cos(a: str, b: str) -> str:
    """DuckDB cosine of two DOUBLE[] expressions (same shape as the
    gate-green ``embedding_topk`` oracle)."""
    return (f"list_dot_product({a}, {b})"
            f" / (sqrt(list_dot_product({a}, {a}))"
            f" * sqrt(list_dot_product({b}, {b})))")


def _sql_l2(a: str, b: str) -> str:
    """DuckDB L2 distance of two DOUBLE[] expressions — left-fold sum
    of squared coordinate differences (the engine's deterministic-
    float convention: explicit sequential fold, index lambda)."""
    return (f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform({a}, (x, i) -> (x - {b}[i]) * (x - {b}[i])))"
            f", (p, q) -> p + q))")


def _ann_pinned_oracle(key: str) -> str:
    """Hybrid oracle for lsh_topk / ivf_topk: the candidate
    (probe_id, rk, vec_id) triples are pinned constants (they encode
    the engine's bucketing — tools/pin_constants.py verifies layout
    determinism), but the reported cosine is recomputed by DuckDB from
    the parquet vectors, so the gate independently verifies every
    VALUE the query returns."""
    from hiselspark.pinned_constants import PINNED_CONSTANTS
    vals = ",\n              ".join(
        f"({p}, {r}, {v})" for p, r, v in PINNED_CONSTANTS[f"{key}_ids"])
    return f"""
        WITH picked(probe_id, rk, vec_id) AS (VALUES
              {vals}),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings)
        SELECT p.probe_id, p.rk, p.vec_id,
               round({_sql_cos('pe.v', 'ce.v')}, 6) AS cos_sim
        FROM picked p
        JOIN e pe ON pe.vec_id = p.probe_id
        JOIN e ce ON ce.vec_id = p.vec_id
    """


def _pq_pinned_oracle() -> str:
    """Hybrid oracle for pq_topk: picks + ADC scores are pinned
    constants (codebook-specific by construction); the exact cosine of
    each returned pair is recomputed from the parquet vectors."""
    from hiselspark.pinned_constants import PINNED_CONSTANTS
    vals = ",\n              ".join(
        f"({p}, {r}, {v}, CAST({a!r} AS DOUBLE))"
        for p, r, v, a in PINNED_CONSTANTS["pq_topk_ids"])
    return f"""
        WITH picked(probe_id, rk, vec_id, adc_sim) AS (VALUES
              {vals}),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings)
        SELECT p.probe_id, p.rk, p.vec_id, p.adc_sim,
               round({_sql_cos('pe.v', 'ce.v')}, 6) AS cos_sim
        FROM picked p
        JOIN e pe ON pe.vec_id = p.probe_id
        JOIN e ce ON ce.vec_id = p.vec_id
    """


def _layout_oracle_sql(iterations: int = 3, seed: int = 5,
                       scale: int = 1_000_000, k: int = 3) -> str:
    """TRUE SQL oracle for graph_layout: DuckDB rebuilds the exact
    top-k cosine k-NN graph, the Carter-Wegman-mixed polynomial hash
    anchors, and every smoothing round ``(pos + 2·nbmean + init) DIV
    4`` as materialized CTEs (twice-referenced CTEs inline
    exponentially otherwise — the kcore/hits lesson).  Positions are
    non-negative so ``//`` is plain truncation, matching Spark DIV."""
    from hiselspark.operators.bootstrap import cw_constants
    (a1, c1), (a2, c2) = cw_constants(2, int(seed))
    mod = 2147483647
    hash_sql = (
        "list_reduce(list_prepend(CAST({salt} AS BIGINT),"
        " list_transform(str_split(CAST(node AS VARCHAR), ''),"
        " x -> CAST(ascii(x) AS BIGINT))),"
        " (acc, x) -> (acc * 31 + x) % 2147483647)"
    ).format(salt=int(seed) % mod)
    steps = []
    for i in range(int(iterations)):
        steps.append(f"""
        p{i + 1} AS MATERIALIZED (
          SELECT p.node, p.x0, p.y0,
                 CASE WHEN d.deg IS NULL THEN p.x
                      ELSE (p.x + 2 * (d.sx // d.deg) + p.x0) // 4
                 END AS x,
                 CASE WHEN d.deg IS NULL THEN p.y
                      ELSE (p.y + 2 * (d.sy // d.deg) + p.y0) // 4
                 END AS y
          FROM p{i} p LEFT JOIN (
            SELECT e.u AS node, SUM(q.x) AS sx, SUM(q.y) AS sy,
                   COUNT(*) AS deg
            FROM edges e JOIN p{i} q ON q.node = e.v
            GROUP BY e.u) d USING (node)
        )""")
    return f"""
        WITH e0 AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings
        ), knn AS MATERIALIZED (
          SELECT u, v_id FROM (
            SELECT a.vec_id AS u, b.vec_id AS v_id,
                   row_number() OVER (
                     PARTITION BY a.vec_id
                     ORDER BY {_sql_cos('a.v', 'b.v')} DESC, b.vec_id)
                     AS rk
            FROM e0 a JOIN e0 b ON a.vec_id <> b.vec_id)
          WHERE rk <= {int(k)}
        ), edges AS MATERIALIZED (
          SELECT DISTINCT u, v FROM (
            SELECT u, v_id AS v FROM knn
            UNION ALL
            SELECT v_id AS u, u AS v FROM knn)
          WHERE u <> v
        ), init AS MATERIALIZED (
          SELECT node,
                 (({hash_sql} * {a1} + {c1}) % {mod}) % {int(scale)}
                   AS x0,
                 (({hash_sql} * {a2} + {c2}) % {mod}) % {int(scale)}
                   AS y0
          FROM (SELECT DISTINCT u AS node FROM edges)
        ), p0 AS MATERIALIZED (
          SELECT node, x0, y0, x0 AS x, y0 AS y FROM init
        ),{",".join(steps)}
        SELECT node, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
               CAST(x0 AS BIGINT) AS x0, CAST(y0 AS BIGINT) AS y0
        FROM p{int(iterations)}
    """


def _hsic_emb_pinned_oracle() -> str:
    """Hybrid oracle for hsic_select_embeddings: the EXACT per-feature
    HSIC score (repr round-trips the float64 bits) and the
    LARS-selected flag are pinned constants (layout-determinism
    checked by tools/pin_constants.py; the kernel/LARS math is
    pytest-parity-tested against the reference imported in place);
    DuckDB independently derives the 6-decimal display rounding and
    the score ranking from the pinned doubles — a regression in
    rounding/ranking now breaks the gate even with the scores
    pinned."""
    from hiselspark.pinned_constants import PINNED_CONSTANTS
    vals = ",\n              ".join(
        f"('{c}', CAST({s!r} AS DOUBLE), "
        + ("TRUE" if sel else "FALSE") + ")"
        for c, s, sel in PINNED_CONSTANTS["hsic_emb_scores"])
    return f"""
        WITH pinned(feature, score, selected) AS (VALUES
              {vals})
        SELECT feature, round(score, 6) AS hsic_score,
               CAST(row_number() OVER (ORDER BY score DESC, feature)
                    AS INT) AS rank_by_score,
               selected
        FROM pinned
    """


def _segmented_pinned_oracle() -> str:
    """Hybrid oracle for segmented_select: the per-(segment, rank)
    LARS picks with EXACT scores are pinned constants; the display
    rounding is derived by DuckDB from the pinned doubles."""
    from hiselspark.pinned_constants import PINNED_CONSTANTS
    vals = ",\n              ".join(
        f"({seg}, {rk}, '{feat}', CAST({s!r} AS DOUBLE))"
        for seg, rk, feat, s in PINNED_CONSTANTS["segmented_select"])
    return f"""
        WITH pinned(segment, rank, feature, score) AS (VALUES
              {vals})
        SELECT segment, CAST(rank AS INT) AS rank, feature,
               round(score, 6) AS hsic_score
        FROM pinned
    """


def _pca_pinned_oracle() -> str:
    """Hybrid oracle for pca_project: the fitted model (mean + top-4
    components, pytest-verified against numpy.linalg.eigh) is a pinned
    constant; the per-row projection (v − mean)·Wᵀ is replayed by
    DuckDB on every parquet vector as
    ``list_dot_product(v, W_j) − <mean, W_j>``."""
    import numpy as np
    from hiselspark.pinned_constants import PINNED_CONSTANTS
    m = PINNED_CONSTANTS["pca_model"]
    mean = np.array(m["mean"], dtype=np.float64)
    cols = []
    for j, comp in enumerate(m["components"]):
        w = "[" + ", ".join(repr(float(x)) for x in comp) + "]"
        mw = float(mean @ np.array(comp, dtype=np.float64))
        cols.append(f"round(list_dot_product(v, {w}) "
                    f"- CAST({mw!r} AS DOUBLE), 6) AS p{j}")
    sel = ",\n               ".join(cols)
    return f"""
        SELECT vec_id,
               {sel}
        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings)
    """


def _mmr_oracle_sql(k: int = 5, lam: float = 0.7, pool: int = 20) -> str:
    """TRUE SQL oracle for mmr_topk: DuckDB rebuilds the exact top-20
    cosine candidate pool per probe, then replays the greedy MMR
    selection (argmax λ·rel − (1−λ)·max-sim-to-selected, ties to the
    ascending id) as ``k`` unrolled CTE steps — no pinned values at
    all."""
    lam_l = f"CAST({lam!r} AS DOUBLE)"
    one_m = f"CAST({1.0 - lam!r} AS DOUBLE)"
    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)",
        "pr AS (SELECT vec_id AS probe_id, v AS p FROM e"
        " WHERE vec_id < 20)",
        f"pairs AS (SELECT probe_id, vec_id, {_sql_cos('p', 'v')} AS rel"
        " FROM pr, e WHERE probe_id <> vec_id)",
        f"""cand AS (SELECT probe_id, vec_id, rel FROM (
              SELECT probe_id, vec_id, rel,
                     ROW_NUMBER() OVER (PARTITION BY probe_id
                       ORDER BY rel DESC, vec_id ASC) AS rn
              FROM pairs) WHERE rn <= {pool})""",
        f"""cc AS (SELECT a.probe_id, a.vec_id AS ca, b.vec_id AS cb,
                    {_sql_cos('ea.v', 'eb.v')} AS cos
             FROM cand a
             JOIN cand b ON a.probe_id = b.probe_id
             JOIN e ea ON ea.vec_id = a.vec_id
             JOIN e eb ON eb.vec_id = b.vec_id)""",
    ]
    for i in range(1, k + 1):
        if i == 1:
            ctes.append(f"s1 AS (SELECT probe_id, vec_id, rel, "
                        f"{lam_l} * rel AS score FROM cand)")
        else:
            ctes.append(f"s{i} AS (SELECT probe_id, vec_id, rel, ms, "
                        f"{lam_l} * rel - {one_m} * ms AS score "
                        f"FROM a{i - 1})")
        ctes.append(f"""p{i} AS (SELECT probe_id, vec_id, score FROM (
              SELECT probe_id, vec_id, score,
                     ROW_NUMBER() OVER (PARTITION BY probe_id
                       ORDER BY score DESC, vec_id ASC) AS rn
              FROM s{i}) WHERE rn = 1)""")
        if i < k:
            src = "cand" if i == 1 else f"a{i - 1}"
            ms = "cc.cos" if i == 1 else "greatest(s.ms, cc.cos)"
            ctes.append(f"""a{i} AS (
              SELECT s.probe_id, s.vec_id, s.rel, {ms} AS ms
              FROM {src} s
              JOIN p{i} ON p{i}.probe_id = s.probe_id
                        AND s.vec_id <> p{i}.vec_id
              JOIN cc ON cc.probe_id = s.probe_id
                      AND cc.ca = s.vec_id AND cc.cb = p{i}.vec_id)""")
    unions = "\n          UNION ALL ".join(
        f"SELECT probe_id, {i} AS rk, vec_id, score FROM p{i}"
        for i in range(1, k + 1))
    return ("WITH " + ",\n        ".join(ctes) + f"""
        SELECT probe_id, rk, vec_id, round(score, 6) AS mmr
        FROM ({unions})
    """)


def _kcenter_oracle_sql(k: int = 16) -> str:
    """TRUE SQL oracle for kcenter: at the gate scale the pool is the
    whole table (500 < pool_size=4096, id-sorted), so DuckDB replays
    the full greedy farthest-point trace — anchor = lowest id, then
    ``k−1`` unrolled argmax-of-min-distance steps (ties to the lowest
    id) — plus the nearest-center assignment (ties to the lowest
    center order).  No pinned values at all."""
    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)",
        "c0 AS (SELECT vec_id AS cid, v FROM e ORDER BY vec_id LIMIT 1)",
        f"d0 AS MATERIALIZED (SELECT e.vec_id, e.v, {_sql_l2('e.v', 'c0.v')} AS dmin"
        " FROM e, c0)",
    ]
    for i in range(1, k):
        ctes.append(f"p{i} AS MATERIALIZED (SELECT vec_id AS cid, v, dmin FROM d{i - 1}"
                    f" ORDER BY dmin DESC, vec_id ASC LIMIT 1)")
        if i < k - 1:
            ctes.append(
                f"d{i} AS MATERIALIZED (SELECT d.vec_id, d.v, least(d.dmin, "
                f"{_sql_l2('d.v', f'p{i}.v')}) AS dmin"
                f" FROM d{i - 1} d, p{i})")
    centers = "\n          UNION ALL ".join(
        ["SELECT 0 AS ord, cid, CAST(0.0 AS DOUBLE) AS sel_dist FROM c0"]
        + [f"SELECT {i}, cid, dmin FROM p{i}" for i in range(1, k)])
    ctes.append(f"centers AS (\n          {centers})")
    ctes.append("cv AS (SELECT c.ord, c.cid, e.v AS cvec FROM centers c"
                " JOIN e ON e.vec_id = c.cid)")
    ctes.append(f"""asg AS (SELECT vec_id, ord, cid, dist FROM (
          SELECT e.vec_id, cv.ord, cv.cid,
                 {_sql_l2('e.v', 'cv.cvec')} AS dist,
                 ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY {_sql_l2('e.v', 'cv.cvec')} ASC, cv.ord ASC)
                   AS rn
          FROM e, cv) WHERE rn = 1)""")
    ctes.append("per AS (SELECT cid, COUNT(*) AS n_assigned,"
                " round(MAX(dist), 6) AS radius FROM asg GROUP BY cid)")
    return ("WITH " + ",\n        ".join(ctes) + """
        SELECT c.ord AS "order", c.cid AS center_id,
               round(c.sel_dist, 6) AS sel_dist,
               per.n_assigned, per.radius
        FROM centers c JOIN per ON per.cid = c.cid
    """)


def _sql_raw_hash(expr: str, salt: int = 0) -> str:
    """DuckDB twin of ``splits.raw_hash`` (the un-normalized
    polynomial id fold)."""
    return (f"list_reduce(list_prepend(CAST({salt} AS BIGINT), "
            f"list_transform(str_split(CAST({expr} AS VARCHAR), ''), "
            f"ch -> CAST(ascii(ch) AS BIGINT))), "
            f"(acc, y) -> (acc * 31 + y) % 2147483647)")


def _sql_poisson_weight(u: str) -> str:
    """DuckDB twin of ``bootstrap._poisson_weight`` — the Poisson(1)
    inverse CDF as integer thresholds on a uniform in [0, 2^20)."""
    from hiselspark.operators.bootstrap import _CDF
    cases = " ".join(f"WHEN {u} < {t} THEN {k}"
                     for k, t in enumerate(_CDF[:-1]))
    return f"(CASE {cases} ELSE 6 END)"


def _cw_values(n: int, seed: int) -> str:
    """VALUES rows (rep, a, c) of the Carter-Wegman constants shared
    with ``bootstrap.cw_constants`` — identical literals, so the
    DuckDB replay uses the exact same draws."""
    from hiselspark.operators.bootstrap import cw_constants
    return ",\n              ".join(
        f"({b}, {a}, {c})"
        for b, (a, c) in enumerate(cw_constants(n, seed)))


def _conv_oracle_sql() -> str:
    """TRUE SQL oracle for image_conv: the synthesized pixel
    ``p(i) = (okey·7919 + i·31) % 256`` is pure arithmetic, so the
    grayscale sums — including every STENCIL NEIGHBOR — expand inline
    (no joins) and DuckDB replays the whole 3x3 Laplacian and its
    integer reductions."""
    def g(dy: int, dx: int) -> str:
        terms = " + ".join(
            f"((okey*7919 + ((y+{dy})*24 + (x+{dx})*3 + {c})*31) % 256)"
            for c in range(3))
        return f"({terms})"
    resp = (f"4*{g(0, 0)} - {g(-1, 0)} - {g(1, 0)}"
            f" - {g(0, -1)} - {g(0, 1)}")
    return f"""
        WITH r AS (
          SELECT o_orderkey AS okey, {resp} AS resp
          FROM orders,
               unnest(generate_series(1, 6)) AS ty(y),
               unnest(generate_series(1, 6)) AS tx(x)
        )
        SELECT okey,
               round(CAST(sum(abs(resp)) AS DOUBLE) / 36, 6)
                 AS conv_abs_mean,
               CAST(max(resp) AS BIGINT) AS conv_max,
               CAST(sum(CASE WHEN resp > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS conv_n_pos
        FROM r GROUP BY okey
    """


def _dp_counts_oracle_sql(epsilon: float, seed: int) -> str:
    """TRUE SQL oracle for dp_counts: the raw polynomial hash fold,
    the seed-derived Carter-Wegman mix (identical literals via
    ``bootstrap.cw_constants`` — stable across Python versions), the
    inverse-CDF Laplace noise and the post-processed release are all
    replayed digit for digit."""
    from hiselspark.operators.bootstrap import cw_constants
    a, c = cw_constants(1, int(seed))[0]
    return f"""
        WITH per AS (
          SELECT CAST(user_id % 50 AS BIGINT) AS user_bucket,
                 CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1
        ), h AS (
          SELECT *,
                 (list_reduce(
                    list_prepend(CAST(0 AS BIGINT),
                      list_transform(
                        str_split(COALESCE(CAST(user_bucket
                                                AS VARCHAR), ''), ''),
                        x -> CAST(ascii(x) AS BIGINT))),
                    (acc, x) -> (acc * 31 + x) % 2147483647)
                  * {a} + {c}) % 2147483647 AS hh
          FROM per
        ), u AS (
          SELECT user_bucket, n,
                 (CAST(hh % 1048576 AS DOUBLE) + 0.5)
                   / 1048576.0 AS u
          FROM h
        ), z AS (
          SELECT *,
                 -(1.0 / {float(epsilon)}) * sign(u - 0.5)
                 * ln(1.0 - 2.0 * abs(u - 0.5)) AS noise
          FROM u
        )
        SELECT user_bucket, n,
               round(u, 6) AS u,
               round(noise, 6) AS noise,
               round(CAST(n AS DOUBLE) + noise, 6) AS noisy_count,
               greatest(CAST(round(CAST(n AS DOUBLE) + noise)
                             AS BIGINT), 0) AS released
        FROM z
    """


def _harris_oracle_sql() -> str:
    """TRUE SQL oracle for image_corners: synthesized pixels expand
    inline into both 3x3 Sobel gradients; the 3x3 structure-tensor
    box sums come from a bounded self-join on |Δy|,|Δx| ≤ 1 and the
    k=1/20 Harris response is the exact integer
    20·(Sxx·Syy − Sxy²) − (Sxx+Syy)²."""
    def g(dy: int, dx: int) -> str:
        terms = " + ".join(
            f"((okey*7919 + ((y+{dy})*24 + (x+{dx})*3 + {c})*31) % 256)"
            for c in range(3))
        return f"({terms})"
    ix = (f"({g(-1, 1)} + 2*{g(0, 1)} + {g(1, 1)})"
          f" - ({g(-1, -1)} + 2*{g(0, -1)} + {g(1, -1)})")
    iy = (f"({g(1, -1)} + 2*{g(1, 0)} + {g(1, 1)})"
          f" - ({g(-1, -1)} + 2*{g(-1, 0)} + {g(-1, 1)})")
    return f"""
        WITH s AS (
          SELECT o_orderkey AS okey, y, x,
                 CAST({ix} AS BIGINT) AS ix,
                 CAST({iy} AS BIGINT) AS iy
          FROM orders,
               unnest(generate_series(1, 6)) AS ty(y),
               unnest(generate_series(1, 6)) AS tx(x)
        ), t AS (
          SELECT a.okey, a.y, a.x,
                 CAST(sum(b.ix*b.ix) AS BIGINT) AS sxx,
                 CAST(sum(b.iy*b.iy) AS BIGINT) AS syy,
                 CAST(sum(b.ix*b.iy) AS BIGINT) AS sxy
          FROM s a JOIN s b ON a.okey = b.okey
                           AND abs(a.y - b.y) <= 1
                           AND abs(a.x - b.x) <= 1
          WHERE a.y BETWEEN 2 AND 5 AND a.x BETWEEN 2 AND 5
          GROUP BY 1, 2, 3
        ), r AS (
          SELECT okey, (y-2)*4 + (x-2) AS idx,
                 20*(sxx*syy - sxy*sxy) - (sxx+syy)*(sxx+syy) AS resp
          FROM t
        ), m AS (
          SELECT *, max(resp) OVER (PARTITION BY okey) AS mx FROM r
        )
        SELECT okey,
               CAST(sum(CASE WHEN resp > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS corner_count,
               CAST(max(resp) AS BIGINT) AS resp_max,
               CAST(min(CASE WHEN resp = mx THEN idx END) AS BIGINT)
                 AS resp_argmax
        FROM m GROUP BY okey
    """


def _lbp_oracle_sql() -> str:
    """TRUE SQL oracle for image_lbp: synthesized pixels expand
    inline, so each valid pixel's 8 neighbor comparisons, the code's
    circular-transition count (xor + bit_count against the 8-bit
    rotation) and the per-image rollups are replayed exactly."""
    def g(dy: int, dx: int) -> str:
        terms = " + ".join(
            f"((okey*7919 + ((y+{dy})*24 + (x+{dx})*3 + {c})*31) % 256)"
            for c in range(3))
        return f"({terms})"
    offs = ((-1, -1), (-1, 0), (-1, 1), (0, 1),
            (1, 1), (1, 0), (1, -1), (0, -1))
    code = " + ".join(
        f"CASE WHEN {g(dy, dx)} >= {g(0, 0)} THEN {1 << i} ELSE 0 END"
        for i, (dy, dx) in enumerate(offs))
    return f"""
        WITH px AS (
          SELECT o_orderkey AS okey,
                 CAST({code} AS BIGINT) AS code
          FROM orders,
               unnest(generate_series(1, 6)) AS ty(y),
               unnest(generate_series(1, 6)) AS tx(x)
        ), u AS (
          SELECT okey, code,
                 bit_count(xor(code,
                   ((code*2) % 256) + (code // 128))) AS trans
          FROM px
        )
        SELECT okey,
               CAST(sum(code) AS BIGINT) AS lbp_sum,
               CAST(sum(CASE WHEN trans <= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS lbp_n_uniform,
               CAST(count(DISTINCT code) AS BIGINT) AS lbp_distinct
        FROM u GROUP BY okey
    """


def _median3_oracle_sql() -> str:
    """TRUE SQL oracle for image_median3: the 9-pixel neighborhood of
    each valid pixel expands inline and the exact median is
    ``list_sort([...])[5]`` — the 5th-smallest integer, no
    interpolation rule to match."""
    def g(dy: int, dx: int) -> str:
        terms = " + ".join(
            f"((okey*7919 + ((y+{dy})*24 + (x+{dx})*3 + {c})*31) % 256)"
            for c in range(3))
        return f"({terms})"
    nine = ", ".join(g(dy, dx)
                     for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    return f"""
        WITH px AS (
          SELECT o_orderkey AS okey,
                 list_sort([{nine}])[5] AS med,
                 {g(0, 0)} AS center
          FROM orders,
               unnest(generate_series(1, 6)) AS ty(y),
               unnest(generate_series(1, 6)) AS tx(x)
        )
        SELECT okey,
               CAST(sum(med) AS BIGINT) AS med_sum,
               CAST(max(med) AS BIGINT) AS med_max,
               CAST(sum(CASE WHEN med <> center THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_changed
        FROM px GROUP BY okey
    """


def _equalize_oracle_sql() -> str:
    """TRUE SQL oracle for image_equalize: grayscale sums from the
    synthesized-pixel arithmetic, per-image histogram + CDF, and the
    exact-integer LUT ``((cdf − cdf_min)·510 + span) // (2·span)`` —
    integer ``//`` both engines, no float division anywhere."""
    g = " + ".join(
        f"((okey*7919 + (p*3 + {c})*31) % 256)" for c in range(3))
    return f"""
        WITH px AS (
          SELECT o_orderkey AS okey, CAST({g} AS BIGINT) AS g
          FROM orders, unnest(generate_series(0, 63)) AS tp(p)
        ),
        hist AS (
          SELECT okey, g, COUNT(*) AS c FROM px GROUP BY okey, g
        ),
        cdf AS (
          SELECT okey, g, c,
                 SUM(c) OVER (PARTITION BY okey ORDER BY g
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS cdf,
                 FIRST_VALUE(c) OVER (PARTITION BY okey ORDER BY g)
                   AS cdf_min
          FROM hist
        ),
        lut AS (
          SELECT okey, g, c,
                 CASE WHEN 64 - cdf_min = 0 THEN 0
                      ELSE ((cdf - cdf_min) * 510 + (64 - cdf_min))
                           // (2 * (64 - cdf_min)) END AS v
          FROM cdf
        )
        SELECT okey,
               CAST(SUM(c * v) AS BIGINT) AS eq_sum,
               round(CAST(SUM(c * v) AS DOUBLE) / 64, 6) AS eq_mean,
               CAST(COUNT(DISTINCT v) AS BIGINT) AS eq_distinct
        FROM lut GROUP BY okey
    """


def _otsu_oracle_sql() -> str:
    """TRUE SQL oracle for image_otsu: grayscale sums from the
    synthesized-pixel arithmetic, per-image histogram cumulatives,
    and the exact between-class-variance score
    ``(S·w0 − N·s0)² / (w0·(N − w0))`` per candidate threshold — the
    int64→double cast is exact below 2^53 so both engines rank the
    candidates bit-identically (ties → smallest t)."""
    g = " + ".join(
        f"((okey*7919 + (p*3 + {c})*31) % 256)" for c in range(3))
    return f"""
        WITH px AS (
          SELECT o_orderkey AS okey, CAST({g} AS BIGINT) AS g
          FROM orders, unnest(generate_series(0, 63)) AS tp(p)
        ),
        hist AS (
          SELECT okey, g, CAST(COUNT(*) AS BIGINT) AS c
          FROM px GROUP BY okey, g
        ),
        lvl AS (
          SELECT okey, g AS t,
                 SUM(c) OVER w AS w0,
                 SUM(g * c) OVER w AS s0,
                 SUM(c) OVER (PARTITION BY okey) AS n,
                 SUM(g * c) OVER (PARTITION BY okey) AS s
          FROM hist
          WINDOW w AS (PARTITION BY okey ORDER BY g
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)
        ),
        scored AS (
          SELECT okey, t, n - w0 AS fgc, s - s0 AS fgs,
                 CASE WHEN w0 > 0 AND w0 < n THEN
                   CAST(s * w0 - n * s0 AS DOUBLE)
                   * CAST(s * w0 - n * s0 AS DOUBLE)
                   / CAST(w0 * (n - w0) AS DOUBLE)
                 ELSE -1.0 END AS score
          FROM lvl
        ),
        best AS (
          SELECT okey, t, fgc, fgs, score,
                 ROW_NUMBER() OVER (PARTITION BY okey
                                    ORDER BY score DESC, t ASC) AS rn
          FROM scored
        )
        SELECT okey,
               CAST(CASE WHEN score >= 0 THEN t ELSE -1 END
                    AS BIGINT) AS otsu_t,
               CAST(CASE WHEN score >= 0 THEN fgc ELSE 0 END
                    AS BIGINT) AS fg_count,
               CAST(CASE WHEN score >= 0 THEN fgs ELSE 0 END
                    AS BIGINT) AS fg_sum
        FROM best WHERE rn = 1
    """


def _morph_oracle_sql(thresh: int = 380) -> str:
    """TRUE SQL oracle for image_morph: every 3×3 neighborhood min
    (erosion) / max (dilation) of the binary mask ``gray > thresh``
    expands inline from the synthesized-pixel arithmetic — LEAST /
    GREATEST over nine CASE terms, integer counts throughout."""
    def m(dy: int, dx: int) -> str:
        g = " + ".join(
            f"((o_orderkey*7919 + (((y+{dy})*8 + (x+{dx}))*3 + {c})*31)"
            f" % 256)" for c in range(3))
        return f"(CASE WHEN ({g}) > {thresh} THEN 1 ELSE 0 END)"
    nine = [m(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    least = ", ".join(nine)
    return f"""
        WITH interior AS (
          SELECT o_orderkey AS okey,
                 LEAST({least}) AS e,
                 GREATEST({least}) AS d
          FROM orders,
               unnest(generate_series(1, 6)) AS ty(y),
               unnest(generate_series(1, 6)) AS tx(x)
        ),
        agg AS (
          SELECT okey, CAST(SUM(e) AS BIGINT) AS n_eroded,
                 CAST(SUM(d) AS BIGINT) AS n_dilated
          FROM interior GROUP BY okey
        ),
        fg AS (
          SELECT o_orderkey AS okey,
                 CAST(SUM({m(0, 0)}) AS BIGINT) AS n_fg
          FROM orders,
               unnest(generate_series(0, 7)) AS ty(y),
               unnest(generate_series(0, 7)) AS tx(x)
          GROUP BY o_orderkey
        )
        SELECT fg.okey, n_fg, n_eroded, n_dilated
        FROM fg JOIN agg USING (okey)
    """


def _gradhist_oracle_sql() -> str:
    """TRUE SQL oracle for image_gradhist: central-difference
    gradients from the synthesized-pixel arithmetic, then the SAME
    pure-integer octant rule (reflect to upper half +4, to first
    quadrant +2, split at the diagonal +1) and L1-magnitude sector
    sums."""
    def g(dy: int, dx: int) -> str:
        terms = " + ".join(
            f"((o_orderkey*7919 + (((y+{dy})*8 + (x+{dx}))*3 + {c})"
            f"*31) % 256)" for c in range(3))
        return f"({terms})"
    gx = f"({g(0, 1)} - {g(0, -1)})"
    gy = f"({g(1, 0)} - {g(-1, 0)})"
    sector_sums = ",\n               ".join(
        f"CAST(sum(CASE WHEN mag > 0 AND bin = {b} THEN mag"
        f" ELSE 0 END) AS BIGINT) AS hog{b}" for b in range(8))
    return f"""
        WITH grad AS (
          SELECT o_orderkey AS okey, {gx} AS gx, {gy} AS gy
          FROM orders,
               unnest(generate_series(1, 6)) AS ty(y),
               unnest(generate_series(1, 6)) AS tx(x)
        ), oct1 AS (
          SELECT okey, gx, gy, abs(gx) + abs(gy) AS mag,
                 CASE WHEN gy < 0 OR (gy = 0 AND gx < 0)
                      THEN 1 ELSE 0 END AS half
          FROM grad
        ), oct2 AS (
          SELECT okey, mag, half,
                 CASE WHEN half = 1 THEN -gx ELSE gx END AS ax,
                 CASE WHEN half = 1 THEN -gy ELSE gy END AS ay
          FROM oct1
        ), oct3 AS (
          SELECT okey, mag, half,
                 CASE WHEN ax <= 0 THEN 1 ELSE 0 END AS quad,
                 CASE WHEN ax <= 0 THEN ay ELSE ax END AS bx,
                 CASE WHEN ax <= 0 THEN -ax ELSE ay END AS byy
          FROM oct2
        ), oct AS (
          SELECT okey, mag,
                 half * 4 + quad * 2
                 + CASE WHEN bx <= byy THEN 1 ELSE 0 END AS bin
          FROM oct3
        )
        SELECT okey,
               {sector_sums},
               CAST(sum(CASE WHEN mag = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_flat
        FROM oct GROUP BY okey
    """


def _moments_oracle_sql() -> str:
    """TRUE SQL oracle for image_moments: plain integer sums of
    x^p·y^q·gray over the synthesized-pixel arithmetic, then the
    central numerators m00·m20 − m10² etc."""
    g = " + ".join(
        f"((o_orderkey*7919 + (p*3 + {c})*31) % 256)" for c in range(3))
    return f"""
        WITH px AS (
          SELECT o_orderkey AS okey, p % 8 AS x, p // 8 AS y,
                 CAST({g} AS BIGINT) AS gr
          FROM orders, unnest(generate_series(0, 63)) AS tp(p)
        ), raw AS (
          SELECT okey,
                 CAST(sum(gr) AS BIGINT) AS m00,
                 CAST(sum(x * gr) AS BIGINT) AS m10,
                 CAST(sum(y * gr) AS BIGINT) AS m01,
                 CAST(sum(x * x * gr) AS BIGINT) AS m20,
                 CAST(sum(y * y * gr) AS BIGINT) AS m02,
                 CAST(sum(x * y * gr) AS BIGINT) AS m11
          FROM px GROUP BY okey
        )
        SELECT okey, m00, m10, m01,
               CAST(m00 * m20 - m10 * m10 AS BIGINT) AS cn20,
               CAST(m00 * m11 - m10 * m01 AS BIGINT) AS cn11,
               CAST(m00 * m02 - m01 * m01 AS BIGINT) AS cn02
        FROM raw
    """


def _boxpeak_oracle_sql() -> str:
    """TRUE SQL oracle for image_boxpeak: every 3×3 box recomputed by
    direct 9-term addition (no SAT), argmax replayed with the
    row-major first-occurrence tie rule."""
    def g(dy: int, dx: int) -> str:
        terms = " + ".join(
            f"((o_orderkey*7919 + (((y+{dy})*8 + (x+{dx}))*3 + {c})"
            f"*31) % 256)" for c in range(3))
        return f"({terms})"
    box = " + ".join(g(dy, dx) for dy in (-1, 0, 1)
                     for dx in (-1, 0, 1))
    return f"""
        WITH b AS (
          SELECT o_orderkey AS okey, y, x,
                 CAST({box} AS BIGINT) AS bs
          FROM orders,
               unnest(generate_series(1, 6)) AS ty(y),
               unnest(generate_series(1, 6)) AS tx(x)
        ), best AS (
          SELECT okey, bs, y, x,
                 row_number() OVER (PARTITION BY okey
                                    ORDER BY bs DESC, y ASC, x ASC)
                   AS rn
          FROM b
        )
        SELECT okey, bs AS box_max, CAST(y AS BIGINT) AS box_y,
               CAST(x AS BIGINT) AS box_x
        FROM best WHERE rn = 1
    """


def _srp_oracle_sql(n_planes: int = 16, dim: int = 64) -> str:
    """TRUE SQL oracle for srp_sketch: the identical ±1 sign literals
    (Carter-Wegman derived) and the identical index-order dot-product
    chains, recomputed by DuckDB from the parquet floats."""
    from hiselspark.operators.similarity import srp_signs
    signs = srp_signs(n_planes, dim)
    bits = []
    for p in range(n_planes):
        dot = " + ".join(f"e[{d + 1}] * {s}.0"
                         for d, s in enumerate(signs[p]))
        bits.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << p}"
                    f" ELSE 0 END)")
    sig = " + ".join(bits)
    return f"""
        WITH v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings
        ), s AS (
          SELECT vec_id, CAST({sig} AS BIGINT) AS srp_sig FROM v
        )
        SELECT vec_id, srp_sig,
               CAST(bit_count(srp_sig) AS BIGINT) AS srp_pop
        FROM s
    """


def _blob_oracle_sql(thresh: int = 380, max_key: int = 1200) -> str:
    """TRUE SQL oracle for image_blobs: masked pixels and their
    4-adjacency from the synthesized-pixel arithmetic, then min-label
    propagation as a recursive CTE — a label l spreads to a neighbor
    p only while l < p, which still delivers every component's
    minimum to every member (the minimum never needs to pass through
    a smaller intermediate, ids being unique)."""
    g = " + ".join(
        f"((o_orderkey*7919 + (p*3 + {c})*31) % 256)" for c in range(3))
    return f"""
        WITH RECURSIVE px AS (
          SELECT o_orderkey AS okey, p, CAST({g} AS BIGINT) AS gray
          FROM orders, unnest(generate_series(0, 63)) AS tp(p)
          WHERE o_orderkey <= {max_key}
        ), nodes AS (
          SELECT okey, p FROM px WHERE gray > {thresh}
        ), edges AS (
          SELECT a.okey, a.p AS pa, b.p AS pb
          FROM nodes a JOIN nodes b
            ON a.okey = b.okey
           AND ((b.p = a.p + 1 AND a.p % 8 <> 7)
             OR (b.p = a.p - 1 AND a.p % 8 <> 0)
             OR b.p = a.p + 8 OR b.p = a.p - 8)
        ), reach(okey, p, lbl) AS (
          SELECT okey, p, p FROM nodes
          UNION
          SELECT e.okey, e.pa, r.lbl
          FROM reach r JOIN edges e
            ON r.okey = e.okey AND r.p = e.pb
          WHERE r.lbl < e.pa
        ), minl AS (
          SELECT okey, p, min(lbl) AS m FROM reach GROUP BY okey, p
        ), comp AS (
          SELECT okey, m, CAST(count(*) AS BIGINT) AS sz
          FROM minl GROUP BY okey, m
        ), agg AS (
          SELECT okey, CAST(count(*) AS BIGINT) AS n_blobs,
                 CAST(max(sz) AS BIGINT) AS max_blob
          FROM comp GROUP BY okey
        )
        SELECT o.o_orderkey AS okey,
               COALESCE(agg.n_blobs, 0) AS n_blobs,
               COALESCE(agg.max_blob, 0) AS max_blob
        FROM orders o LEFT JOIN agg ON agg.okey = o.o_orderkey
        WHERE o.o_orderkey <= {max_key}
    """


def _simhash_oracle_sql(max_distance: int = 3) -> str:
    """TRUE SQL oracle for simhash_neardup ('poly' hash mode): DuckDB
    recomputes every token hash, the 64 Carter-Wegman bit votes, the
    packed signature and the brute-force Hamming pairs from the
    parquet text.  Brute force is exact here because the engine's
    4x16-bit pigeonhole banding is lossless at distance <= 3."""
    from hiselspark.operators.dedup import SIMHASH_POLY_SEED
    from hiselspark.operators.bootstrap import cw_constants
    cw = cw_constants(64, SIMHASH_POLY_SEED)
    votes = ",\n                 ".join(
        f"SUM(((hv * {a} + {c}) % 2147483647) % 2 * 2 - 1) AS v{i}"
        for i, (a, c) in enumerate(cw))
    sig_terms = " + ".join(
        [f"(CASE WHEN v{i} > 0 THEN CAST({1 << i} AS BIGINT)"
         f" ELSE 0 END)" for i in range(63)]
        + ["(CASE WHEN v63 > 0 THEN CAST(-9223372036854775808 AS BIGINT)"
           " ELSE 0 END)"])
    return f"""
        WITH toks AS (
          SELECT doc_id AS doc,
                 unnest(str_split(regexp_replace(
                   lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
          FROM documents
        ),
        h AS (
          SELECT doc, {_sql_raw_hash('tok')} AS hv FROM toks
        ),
        votes AS (
          SELECT doc,
                 {votes}
          FROM h GROUP BY doc
        ),
        sigs AS MATERIALIZED (
          SELECT doc, {sig_terms} AS sig FROM votes
        )
        SELECT l.doc AS a, r.doc AS b,
               bit_count(xor(l.sig, r.sig)) AS hamming
        FROM sigs l JOIN sigs r ON l.doc < r.doc
        WHERE bit_count(xor(l.sig, r.sig)) <= {max_distance}
    """


def _semantic_dedup_oracle_sql(eps: float = 0.65) -> str:
    """Hybrid oracle for semantic_dedup: the k-means cluster assignment
    is a pinned constant (seeded quantizer — engine-specific; layout
    determinism checked by tools/pin_constants.py), but the actual
    dedup DECISION — the greedy id-ordered eps-ball leader scan inside
    each cluster — is replayed by DuckDB as a recursive CTE that
    carries the kept vectors and recomputes every cosine from the
    parquet."""
    from hiselspark.pinned_constants import PINNED_CONSTANTS
    thr = 1.0 - float(eps)
    vals = ",\n              ".join(
        f"({v}, {c})"
        for v, c in PINNED_CONSTANTS["semantic_dedup_clusters"])
    mx = ("COALESCE(list_max(list_transform(s.kept, kv -> "
          + _sql_cos("kv", "r.v") + ")), -1e9)")
    return f"""
        WITH RECURSIVE clusters(vec_id, cluster) AS (VALUES
              {vals}),
        r AS (
          SELECT c.vec_id, c.cluster,
                 CAST(e.embedding AS DOUBLE[]) AS v,
                 ROW_NUMBER() OVER (PARTITION BY c.cluster
                                    ORDER BY c.vec_id) AS rn
          FROM clusters c JOIN embeddings e ON e.vec_id = c.vec_id
        ),
        scan AS (
          SELECT cluster, 0 AS rn, CAST(NULL AS BIGINT) AS vec_id,
                 CAST(NULL AS BOOLEAN) AS keep,
                 CAST([] AS DOUBLE[][]) AS kept
          FROM (SELECT DISTINCT cluster FROM r)
          UNION ALL
          SELECT s.cluster, s.rn + 1, r.vec_id,
                 {mx} < CAST({thr!r} AS DOUBLE) AS keep,
                 CASE WHEN {mx} < CAST({thr!r} AS DOUBLE)
                      THEN list_append(s.kept, r.v) ELSE s.kept END
          FROM scan s
          JOIN r ON r.cluster = s.cluster AND r.rn = s.rn + 1
        )
        SELECT vec_id, cluster, keep FROM scan WHERE rn >= 1
    """


def _bootstrap_oracle_sql(n_replicates: int = 100, seed: int = 7,
                          alpha: float = 0.05) -> str:
    """TRUE SQL oracle for bootstrap_ci ('poly' hash mode): DuckDB
    recomputes every per-row counter draw, Poisson weight, replicate
    mean and the percentile CI from the parquet — nothing pinned."""
    u = "((hv * cw.a + cw.c) % 2147483647) % 1048576"
    return f"""
        WITH cw(rep, a, c) AS (VALUES
              {_cw_values(n_replicates, seed)}),
        rows_h AS (
          SELECT CAST(round(value * 100) AS BIGINT) AS x,
                 {_sql_raw_hash('event_id')} AS hv
          FROM events
        ),
        draws AS (
          SELECT cw.rep, rows_h.x,
                 {_sql_poisson_weight(u)} AS w
          FROM rows_h, cw
        ),
        reps AS (
          SELECT rep,
                 CAST(SUM(w * x) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
                   AS m
          FROM draws GROUP BY rep
        ),
        pt AS (
          SELECT CAST(SUM(x) AS DOUBLE) / COUNT(x) AS point FROM rows_h
        ),
        ci AS (
          SELECT quantile_cont(m, {alpha / 2.0!r}) AS lo,
                 quantile_cont(m, {1.0 - alpha / 2.0!r}) AS hi,
                 COUNT(*) AS n_replicates
          FROM reps
        )
        SELECT round(point, 6) AS point, round(lo, 6) AS lo,
               round(hi, 6) AS hi, n_replicates
        FROM pt, ci
    """


def _perm_test_oracle_sql(n_permutations: int = 200,
                          seed: int = 11) -> str:
    """TRUE SQL oracle for perm_test ('poly' hash mode): DuckDB
    replays the observed difference, every pseudo-label draw, the
    per-replicate difference in means and the add-one two-sided
    p-value from the parquet — nothing pinned."""
    u = "((hv * cw.a + cw.c) % 2147483647) % 1048576"
    return f"""
        WITH cw(rep, a, c) AS (VALUES
              {_cw_values(n_permutations, seed)}),
        rows_h AS (
          SELECT CAST(round(value * 100) AS BIGINT) AS x,
                 CAST(event_type = 'purchase' AS BIGINT) AS g,
                 {_sql_raw_hash('event_id')} AS hv
          FROM events
        ),
        base AS (
          SELECT SUM(x * g) AS s1, SUM(g) AS n1,
                 SUM(x * (1 - g)) AS s0, SUM(1 - g) AS n0
          FROM rows_h
        ),
        obs AS (
          SELECT CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0
                   AS obs_diff,
                 CAST(floor(CAST(n1 AS DOUBLE) / (n1 + n0)
                            * 1048576 + 0.5) AS BIGINT) AS p_scaled
          FROM base
        ),
        draws AS (
          SELECT cw.rep, rows_h.x,
                 CAST({u} < obs.p_scaled AS BIGINT) AS pg
          FROM rows_h, cw, obs
        ),
        reps AS (
          SELECT rep,
                 CAST(SUM(x * pg) AS DOUBLE) / SUM(pg)
                   - CAST(SUM(x * (1 - pg)) AS DOUBLE) / SUM(1 - pg)
                   AS d
          FROM draws GROUP BY rep
          HAVING SUM(pg) > 0 AND SUM(1 - pg) > 0
        ),
        pv AS (
          SELECT SUM(CAST(abs(d) >= abs((SELECT abs(obs_diff) FROM obs))
                          AS BIGINT)) AS k,
                 COUNT(*) AS b
          FROM reps
        )
        SELECT round(obs.obs_diff, 6) AS obs_diff,
               round(CAST(1 + pv.k AS DOUBLE) / (pv.b + 1), 6)
                 AS p_value,
               pv.b AS n_permutations
        FROM obs, pv
    """


def oracle_sql() -> dict[str, str]:
    """Every oracle, wrapped in the negative-zero-normalizing shell
    (see ``_nz_sql``) so both engines emit +0.0 wherever a rounded
    float lands on zero."""
    return {k: _nz_sql(k, v) for k, v in _oracle_sql_raw().items()}


def _oracle_sql_raw() -> dict[str, str]:
    oracles = {
        "lag_lead": """
            SELECT event_id, user_id,
                   epoch_us(ts) AS ts_us,
                   LAG(value) OVER w AS lag1,
                   LEAD(value) OVER w AS lead1
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "ffill": """
            SELECT event_id, user_id,
                   LAST_VALUE(CASE WHEN event_type <> 'error' THEN value END
                              IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS v_filled
            FROM events
        """,
        "sessionize": """
            WITH gaps AS (
              SELECT user_id, ts,
                     CASE WHEN LAG(ts) OVER w IS NULL
                               OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
              SELECT user_id, ts,
                     CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
                       AS BIGINT) AS session_id
              FROM gaps
            )
            SELECT user_id, session_id,
                   COUNT(*) AS n_events,
                   MIN(epoch_us(ts)) AS session_start_us
            FROM sess GROUP BY user_id, session_id
        """,
        "rolling_1h": """
            SELECT event_id, user_id,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w
                        AS BIGINT) AS roll_sum_cents,
                   COUNT(CAST(round(value * 100) AS BIGINT)) OVER w AS roll_n
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        """,
        "asof_join": """
            WITH purchases AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase'
            ), clicks AS (
              SELECT user_id, ts, MAX(value) AS click_value
              FROM events WHERE event_type = 'click' GROUP BY user_id, ts
            )
            SELECT p.event_id, p.user_id,
                   epoch_us(p.ts) AS ts_us,
                   c.click_value,
                   epoch_us(c.ts) AS click_ts_us
            FROM purchases p
            ASOF LEFT JOIN clicks c
              ON p.user_id = c.user_id AND c.ts <= p.ts
        """,
        "asof_multi": """
            WITH purchases AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase'
            ), clicks AS (
              SELECT user_id, ts, MAX(value) AS cval
              FROM events WHERE event_type = 'click' GROUP BY user_id, ts
            ), views AS (
              SELECT user_id, ts, MAX(value) AS vval
              FROM events WHERE event_type = 'view' GROUP BY user_id, ts
            )
            SELECT p.event_id, p.user_id,
                   epoch_us(p.ts) AS ts_us,
                   c.cval AS click_value,
                   epoch_us(c.ts) AS click_ts_us,
                   v.vval AS view_value,
                   epoch_us(v.ts) AS view_ts_us
            FROM purchases p
            ASOF LEFT JOIN clicks c
              ON p.user_id = c.user_id AND c.ts <= p.ts
            ASOF LEFT JOIN views v
              ON p.user_id = v.user_id AND v.ts <= p.ts
        """,
        "asof_tolerance": """
            WITH purchases AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase'
            ), views AS (
              SELECT user_id, ts, MAX(value) AS view_value
              FROM events WHERE event_type = 'view' GROUP BY user_id, ts
            ), joined AS (
              SELECT p.event_id, p.user_id, v.view_value, v.ts AS vts, p.ts
              FROM purchases p
              ASOF LEFT JOIN views v
                ON p.user_id = v.user_id AND v.ts <= p.ts
            )
            SELECT event_id, user_id,
                   CASE WHEN epoch(ts) - epoch(vts) <= 7200
                        THEN view_value END AS view_value,
                   CASE WHEN epoch(ts) - epoch(vts) <= 7200
                        THEN epoch_us(vts) END AS view_ts_us
            FROM joined
        """,
        "tumbling_daily": """
            SELECT user_id,
                   epoch_us(date_trunc('day', ts)) AS day_us,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                     AS day_cents,
                   COUNT(*) AS day_n
            FROM events GROUP BY user_id, date_trunc('day', ts)
        """,
        "topk_per_user": """
            SELECT user_id, rk, event_id, value FROM (
              SELECT user_id, event_id, value,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY value DESC, event_id ASC) AS rk
              FROM events)
            WHERE rk <= 3
        """,
        "target_encode": """
            WITH q AS (
              SELECT event_id, user_id, event_type,
                     CAST(round(value * 100) AS BIGINT) AS cents,
                     epoch_us(ts) AS us
              FROM events
            ), w AS (
              SELECT event_id, user_id, event_type,
                     SUM(cents) OVER b AS s,
                     COUNT(*)  OVER b AS c
              FROM q
              WINDOW b AS (PARTITION BY event_type ORDER BY us
                           RANGE BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING)
            )
            SELECT event_id, user_id, event_type,
                   (CAST(COALESCE(s, 0) AS DOUBLE) + 2500.0)
                     / (CAST(COALESCE(c, 0) AS DOUBLE) + 10.0) AS te,
                   CAST(COALESCE(c, 0) AS BIGINT) AS ce
            FROM w
        """,
        "json_props": """
            SELECT event_id, event_type,
                   CAST(json_extract_string(props, '$.k') AS BIGINT)
                     AS k,
                   CAST(json_extract_string(props, '$.k') AS BIGINT)
                     // 10 AS k_bin
            FROM events
        """,
        "pit_zscore": """
            WITH q AS (
              SELECT event_id, event_type, props,
                     CAST(round(value * 100) AS BIGINT) AS cents,
                     epoch_us(ts) AS us
              FROM events
            ), w AS (
              SELECT event_id, event_type, props, cents,
                     CAST(SUM(cents) OVER b AS DOUBLE) AS s,
                     CAST(SUM(cents * cents) OVER b AS DOUBLE) AS ss,
                     CAST(COUNT(*) OVER b AS DOUBLE) AS c
              FROM q
              WINDOW b AS (PARTITION BY event_type ORDER BY us
                           RANGE BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING)
            ), z AS (
              SELECT event_id, event_type, props, cents, c,
                     s / c AS mean,
                     sqrt(greatest(ss / c - (s / c) * (s / c), 0.0))
                       AS std
              FROM w
            )
            SELECT event_id, event_type,
                   CASE WHEN c >= 2 AND std > 0
                        THEN (CAST(cents AS DOUBLE) - mean) / std
                   END AS z,
                   CAST(list_reduce(
                     list_prepend(CAST(7 AS BIGINT),
                       list_transform(
                         str_split(regexp_replace(
                           lower(trim(COALESCE(props, ''))),
                           '\\s+', ' ', 'g'), ''),
                         x -> CAST(ascii(x) AS BIGINT))),
                     (acc, x) -> (acc * 31 + x) % 2147483647) % 32
                   AS BIGINT) AS pbucket
            FROM z
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS sum_base_cents,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "broadcast_join_agg": """
            SELECT n_name,
                   CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS total_cents,
                   COUNT(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "caption_stats": """
            SELECT doc_id,
                   LENGTH(text) AS n_chars_calc,
                   CASE WHEN TRIM(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(TRIM(text), '\\s+'))
                   END AS n_tokens
            FROM documents
        """,
        "dedup_exact": """
            WITH groups AS (
              SELECT regexp_replace(LOWER(TRIM(text)), '\\s+', ' ', 'g')
                       AS n,
                     MIN(doc_id) AS canonical_id,
                     COUNT(*) AS group_size
              FROM documents GROUP BY 1
            )
            SELECT group_size, COUNT(*) AS n_groups
            FROM groups GROUP BY group_size ORDER BY group_size
        """,
        "embedding_topk": """
            WITH e AS (
              SELECT vec_id,
                     CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings
            ), probes AS (
              SELECT vec_id AS probe_id, v AS p FROM e WHERE vec_id < 20
            ), pairs AS (
              SELECT probe_id, vec_id,
                     list_dot_product(p, v)
                       / (sqrt(list_dot_product(p, p))
                          * sqrt(list_dot_product(v, v))) AS cos
              FROM probes, e
              WHERE probe_id <> vec_id
            )
            SELECT probe_id, rk, vec_id, round(cos, 6) AS cos_sim FROM (
              SELECT probe_id, vec_id, cos,
                     ROW_NUMBER() OVER (PARTITION BY probe_id
                       ORDER BY cos DESC, vec_id ASC) AS rk
              FROM pairs)
            WHERE rk <= 5
        """,
        "asof_cogrouped": """
            WITH purchases AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase'
            ), clicks AS (
              SELECT user_id, ts, MAX(value) AS click_value
              FROM events WHERE event_type = 'click' GROUP BY user_id, ts
            )
            SELECT p.event_id, p.user_id,
                   epoch_us(p.ts) AS ts_us,
                   c.click_value,
                   epoch_us(c.ts) AS click_ts_us
            FROM purchases p
            ASOF LEFT JOIN clicks c
              ON p.user_id = c.user_id AND c.ts <= p.ts
        """,
        "bfill": """
            SELECT event_id, user_id,
                   FIRST_VALUE(CASE WHEN event_type <> 'error' THEN value END
                               IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                     AS v_bfilled
            FROM events
        """,
        "rolling_excl": """
            SELECT event_id, user_id,
                   SUM(CAST(round(value * 100) AS BIGINT)) OVER w
                     AS prior_cents
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                         RANGE BETWEEN 3600000000 PRECEDING
                                   AND 1 PRECEDING)
        """,
        "running_stats": """
            SELECT event_id, user_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_cents,
                   RANK() OVER (PARTITION BY user_id
                                ORDER BY CAST(round(value * 100) AS BIGINT)
                                         DESC) AS value_rank
            FROM events
        """,
        "cube_agg": """
            SELECT event_type,
                   dayofweek(ts) + 1 AS dow,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                     AS cents,
                   COUNT(*) AS n
            FROM events
            GROUP BY CUBE (event_type, dayofweek(ts) + 1)
        """,
        "pivot_types": """
            SELECT user_id,
                   CAST(COALESCE(SUM(CASE WHEN event_type = 'click'
                       THEN CAST(round(value * 100) AS BIGINT) END), 0)
                       AS BIGINT) AS click,
                   CAST(COALESCE(SUM(CASE WHEN event_type = 'view'
                       THEN CAST(round(value * 100) AS BIGINT) END), 0)
                       AS BIGINT) AS view,
                   CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100) AS BIGINT) END), 0)
                       AS BIGINT) AS purchase,
                   CAST(COALESCE(SUM(CASE WHEN event_type = 'signup'
                       THEN CAST(round(value * 100) AS BIGINT) END), 0)
                       AS BIGINT) AS signup,
                   CAST(COALESCE(SUM(CASE WHEN event_type = 'error'
                       THEN CAST(round(value * 100) AS BIGINT) END), 0)
                       AS BIGINT) AS error
            FROM events GROUP BY user_id
        """,
        "salted_agg": """
            SELECT event_type,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                     AS cents_sum,
                   COUNT(*) AS n
            FROM events GROUP BY event_type
        """,
        "ngram_jaccard": """
            WITH norm AS (
              SELECT doc_id,
                     regexp_split_to_array(
                       regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                       ' ') AS words
              FROM documents
            ), sh AS (
              SELECT DISTINCT doc_id,
                     CASE WHEN len(words) >= 3
                          THEN words[i] || ' ' || words[i+1] || ' '
                               || words[i+2]
                          ELSE array_to_string(words, ' ') END AS shingle
              FROM norm,
                   unnest(generate_series(
                     1, greatest(len(words) - 2, 1))) AS t(i)
            ), sizes AS (
              SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS n_common
              FROM sh l JOIN sh r USING (shingle)
              WHERE l.doc_id < r.doc_id
              GROUP BY 1, 2
            )
            SELECT a, b, n_common,
                   round(CAST(n_common AS DOUBLE)
                         / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE CAST(n_common AS DOUBLE)
                  / (sa.n_sh + sb.n_sh - n_common) >= 0.5
        """,
        "containment_pairs": """
            WITH norm AS (
              SELECT doc_id,
                     regexp_split_to_array(
                       regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                       ' ') AS words
              FROM documents
            ), sh AS (
              SELECT DISTINCT doc_id,
                     CASE WHEN len(words) >= 3
                          THEN words[i] || ' ' || words[i+1] || ' '
                               || words[i+2]
                          ELSE array_to_string(words, ' ') END AS shingle
              FROM norm,
                   unnest(generate_series(
                     1, greatest(len(words) - 2, 1))) AS t(i)
            ), sizes AS (
              SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS n_common
              FROM sh l JOIN sh r USING (shingle)
              WHERE l.doc_id < r.doc_id
              GROUP BY 1, 2
            )
            SELECT a, b, CAST(n_common AS BIGINT) AS n_common,
                   CAST(sa.n_sh AS BIGINT) AS n_a,
                   CAST(sb.n_sh AS BIGINT) AS n_b,
                   round(CAST(n_common AS DOUBLE) / sa.n_sh, 6) AS c_ab,
                   round(CAST(n_common AS DOUBLE) / sb.n_sh, 6) AS c_ba
            FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE CAST(n_common AS DOUBLE)
                  / least(sa.n_sh, sb.n_sh) >= 0.6
        """,
        "fingerprint_groups": """
            WITH groups AS (
              SELECT regexp_replace(LOWER(TRIM(text)), '\\s+', ' ', 'g')
                       AS n,
                     COUNT(*) AS group_size
              FROM documents GROUP BY 1
            )
            SELECT group_size, COUNT(*) AS n_groups
            FROM groups GROUP BY group_size ORDER BY group_size
        """,
        "language_guess": """
            WITH h AS (
              SELECT doc_id, lower(text) AS t FROM documents
            ), scored AS (
              SELECT doc_id,
                (CASE WHEN t LIKE '%the%' THEN 1 ELSE 0 END
               + CASE WHEN t LIKE '%and%' THEN 1 ELSE 0 END
               + CASE WHEN t LIKE '%ing%' THEN 1 ELSE 0 END
               + CASE WHEN t LIKE '%ion%' THEN 1 ELSE 0 END
               + CASE WHEN t LIKE '%to %' THEN 1 ELSE 0 END) AS en,
                (CASE WHEN t LIKE '%de %' THEN 1 ELSE 0 END
               + CASE WHEN t LIKE '%que%' THEN 1 ELSE 0 END
               + CASE WHEN t LIKE '%ión%' THEN 1 ELSE 0 END
               + CASE WHEN t LIKE '%los%' THEN 1 ELSE 0 END
               + CASE WHEN t LIKE '%ado%' THEN 1 ELSE 0 END) AS es,
                (CASE WHEN t LIKE '%le %' THEN 1 ELSE 0 END
               + CASE WHEN t LIKE '%les%' THEN 1 ELSE 0 END
               + CASE WHEN t LIKE '%des%' THEN 1 ELSE 0 END
               + CASE WHEN t LIKE '%ent%' THEN 1 ELSE 0 END
               + CASE WHEN t LIKE '%tion%' THEN 1 ELSE 0 END) AS fr,
                (CASE WHEN t LIKE '%der%' THEN 1 ELSE 0 END
               + CASE WHEN t LIKE '%die%' THEN 1 ELSE 0 END
               + CASE WHEN t LIKE '%und%' THEN 1 ELSE 0 END
               + CASE WHEN t LIKE '%sch%' THEN 1 ELSE 0 END
               + CASE WHEN t LIKE '%ein%' THEN 1 ELSE 0 END) AS de
              FROM h
            )
            SELECT doc_id,
                   CASE WHEN greatest(en, es, fr, de) = 0 THEN 'und'
                        WHEN fr = greatest(en, es, fr, de) THEN 'fr'
                        WHEN es = greatest(en, es, fr, de) THEN 'es'
                        WHEN en = greatest(en, es, fr, de) THEN 'en'
                        ELSE 'de' END AS lang_guess
            FROM scored
        """,
        "quality_score": """
            WITH q AS (
              SELECT doc_id,
                     LENGTH(text) AS n,
                     LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                       AS alpha,
                     regexp_split_to_array(lower(trim(text)), '\\s+')
                       AS words
              FROM documents
            ), f AS (
              SELECT doc_id,
                     CASE WHEN n < 10 THEN 0.0
                          WHEN n > 20000 THEN 0.2 ELSE 1.0 END AS len_band,
                     alpha / greatest(n, 1) AS alpha_ratio,
                     len(list_intersect(list_distinct(words),
                         ['the','a','an','and','or','of','to','in','is',
                          'it','that','for','on','with','as','this','by',
                          'at','be','are']))
                       / greatest(len(words), 1) AS stop_ratio,
                     CASE WHEN n / greatest(len(words), 1) BETWEEN 3 AND 12
                          THEN 1.0 ELSE 0.3 END AS wordlen_band
              FROM q
            )
            SELECT doc_id,
                   round(0.3 * len_band + 0.3 * alpha_ratio
                         + 0.2 * least(stop_ratio * 5.0, 1.0)
                         + 0.2 * wordlen_band, 6) AS quality
            FROM f
        """,
        "embedding_neardup": """
            WITH e AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings
            )
            SELECT l.vec_id AS a, r.vec_id AS b,
                   round(list_dot_product(l.v, r.v)
                         / (sqrt(list_dot_product(l.v, l.v))
                            * sqrt(list_dot_product(r.v, r.v))), 6)
                     AS cos_sim
            FROM e l JOIN e r ON l.vec_id < r.vec_id
            WHERE list_dot_product(l.v, r.v)
                  / (sqrt(list_dot_product(l.v, l.v))
                     * sqrt(list_dot_product(r.v, r.v))) >= 0.5
        """,
        "asof_forward": """
            WITH purchases AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase'
            ), views AS (
              SELECT user_id, ts, MAX(value) AS view_value
              FROM events WHERE event_type = 'view' GROUP BY user_id, ts
            )
            SELECT p.event_id, p.user_id,
                   epoch_us(p.ts) AS ts_us,
                   v.view_value,
                   epoch_us(v.ts) AS view_ts_us
            FROM purchases p
            ASOF LEFT JOIN views v
              ON p.user_id = v.user_id AND v.ts >= p.ts
        """,
        "asof_ties": """
            WITH purchases AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase'
            ), clicks AS (
              SELECT user_id, ts, CAST(round(value * 100) AS BIGINT)
                       AS cents,
                     ROW_NUMBER() OVER (PARTITION BY user_id, ts
                       ORDER BY CAST(round(value * 100) AS BIGINT) DESC)
                       AS rk
              FROM events WHERE event_type = 'click'
            ), best AS (
              SELECT user_id, ts, cents FROM clicks WHERE rk = 1
            )
            SELECT p.event_id, p.user_id,
                   epoch_us(p.ts) AS ts_us,
                   c.cents AS click_cents,
                   epoch_us(c.ts) AS click_ts_us
            FROM purchases p
            ASOF LEFT JOIN best c
              ON p.user_id = c.user_id AND c.ts <= p.ts
        """,
        "interval_clicks": """
            WITH purchases AS (
              SELECT event_id, user_id, epoch_us(ts) AS pus FROM events
              WHERE event_type = 'purchase'
            ), clicks AS (
              SELECT user_id, epoch_us(ts) AS cus,
                     CAST(round(value * 100) AS BIGINT) AS cents
              FROM events WHERE event_type = 'click'
            )
            SELECT p.event_id, p.user_id,
                   COUNT(*) AS n_clicks,
                   CAST(SUM(c.cents) AS BIGINT) AS click_cents
            FROM purchases p
            JOIN clicks c
              ON p.user_id = c.user_id
             AND c.cus >= p.pus - 3600000000
             AND c.cus <= p.pus
            GROUP BY p.event_id, p.user_id
        """,
        "tpch_q6": """
            SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * CAST(round(l_discount * 100) AS BIGINT))
                        AS BIGINT) AS revenue_unit,
                   COUNT(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
              AND l_quantity < 24
        """,
        "anti_join": """
            SELECT c_custkey, c_name, c_nationkey
            FROM customer c
            WHERE NOT EXISTS (
              SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
        "semi_join": """
            SELECT s_suppkey, s_name, s_nationkey
            FROM supplier s
            WHERE EXISTS (
              SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
        """,
        "exact_quantiles": """
            SELECT event_type,
                   quantile_cont(value, 0.25) AS p25,
                   quantile_cont(value, 0.5) AS p50,
                   quantile_cont(value, 0.75) AS p75,
                   COUNT(*) AS n
            FROM events GROUP BY event_type
        """,
        "phash_bits": """
            SELECT o_orderkey AS okey,
                   CAST((o_orderkey >> 0) & 1 AS INT) AS bit0,
                   CAST((o_orderkey >> 1) & 1 AS INT) AS bit1,
                   CAST((o_orderkey >> 2) & 1 AS INT) AS bit2,
                   CAST((o_orderkey >> 3) & 1 AS INT) AS bit3,
                   CAST((o_orderkey >> 4) & 1 AS INT) AS bit4,
                   CAST((o_orderkey >> 5) & 1 AS INT) AS bit5,
                   CAST((o_orderkey >> 6) & 1 AS INT) AS bit6,
                   CAST((o_orderkey >> 7) & 1 AS INT) AS bit7,
                   CAST(bit_count(o_orderkey) AS INT) AS popcount
            FROM orders
        """,
        "hamming_pairs": """
            WITH k AS (
              SELECT o_orderkey AS k FROM orders WHERE o_orderkey <= 64
            )
            SELECT l.k AS a, r.k AS b,
                   CAST(bit_count(xor(l.k, r.k)) AS INT) AS hamming
            FROM k l JOIN k r ON l.k < r.k
            WHERE bit_count(xor(l.k, r.k)) <= 2
        """,
        "streaming_sessions": """
            WITH gaps AS (
              SELECT user_id, ts,
                     CASE WHEN LAG(ts) OVER w IS NULL
                               OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                                  >= 1800000000
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
              SELECT user_id, ts,
                     SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS sid
              FROM gaps
            ), per_session AS (
              SELECT user_id, sid, COUNT(*) AS n_events,
                     MIN(epoch_us(ts)) AS start_us
              FROM sess GROUP BY user_id, sid
            )
            SELECT user_id, COUNT(*) AS n_sessions,
                   CAST(SUM(n_events) AS BIGINT) AS n_events,
                   MIN(start_us) AS first_us
            FROM per_session GROUP BY user_id
        """,
        "streaming_running_totals": """
            SELECT user_id,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                     AS sum_cents,
                   MIN(epoch_us(ts)) AS first_ts_us,
                   MAX(epoch_us(ts)) AS last_ts_us
            FROM events GROUP BY user_id
        """,
        "salted_join_agg": """
            WITH dim AS (
              SELECT user_id, COUNT(*) AS user_n FROM events
              GROUP BY user_id
            )
            SELECT d.user_n,
                   COUNT(*) AS n_rows,
                   CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
                     AS cents
            FROM events e JOIN dim d USING (user_id)
            GROUP BY d.user_n
        """,
        "grouping_sets": """
            SELECT event_type,
                   hour(ts) AS hr,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                     AS cents,
                   COUNT(*) AS n
            FROM events
            GROUP BY ROLLUP (event_type, hour(ts))
        """,
        "set_ops": """
            WITH c AS (SELECT DISTINCT user_id FROM events
                       WHERE event_type = 'click'),
                 er AS (SELECT DISTINCT user_id FROM events
                        WHERE event_type = 'error'),
                 v AS (SELECT DISTINCT user_id FROM events
                       WHERE event_type = 'view'),
                 p AS (SELECT DISTINCT user_id FROM events
                       WHERE event_type = 'purchase')
            SELECT user_id, 'click_no_error' AS tag
            FROM (SELECT user_id FROM c EXCEPT SELECT user_id FROM er)
            UNION ALL
            SELECT user_id, 'view_and_buy' AS tag
            FROM (SELECT user_id FROM v INTERSECT SELECT user_id FROM p)
        """,
    }
    # minhash_neardup: LSH candidate recall is verified 1.0 on the gate
    # data (tests/test_dedup.py), so the verified output must equal the
    # exact all-pairs Jaccard — the same oracle as ngram_jaccard
    oracles["minhash_neardup"] = oracles["ngram_jaccard"]
    # pinned literal-table oracles for the deterministic non-SQL ops
    # (seeded searches, LSH/IVF ANN, MI preselection): generated from a
    # verified sf0.01 run by tools/pin_oracles.py — any regression in
    # the underlying math changes the output and breaks the gate
    try:
        from hiselspark.pinned_oracles import PINNED_ORACLES
        oracles.update(PINNED_ORACLES)
    except ImportError:
        pass
    # hybrid constant-pinned oracles: only the engine-specific
    # candidate ids / fitted model are pinned (tools/pin_constants.py,
    # layout-determinism checked); every reported VALUE is recomputed
    # by DuckDB from the parquet vectors
    oracles["lsh_topk"] = _ann_pinned_oracle("lsh_topk")
    oracles["ivf_topk"] = _ann_pinned_oracle("ivf_topk")
    oracles["pq_topk"] = _pq_pinned_oracle()
    oracles["pca_project"] = _pca_pinned_oracle()
    # selection-family queries demoted from full literal pins to
    # constant pins (round 4): exact scores + the LARS pick are the
    # pinned constants; rounding and score-ranking are SQL-derived
    oracles["hsic_select_embeddings"] = _hsic_emb_pinned_oracle()
    oracles["segmented_select"] = _segmented_pinned_oracle()
    # TRUE SQL replay of the UMAP-lite neighbor-graph layout
    oracles["graph_layout"] = _layout_oracle_sql(iterations=3, seed=5)
    # TRUE SQL replays of the greedy selections (no pinned values)
    oracles["mmr_topk"] = _mmr_oracle_sql(k=5, lam=0.7, pool=20)
    oracles["kcenter"] = _kcenter_oracle_sql(k=16)
    # TRUE SQL replays of the counter-hash randomization ops ('poly'
    # Carter-Wegman mode — every draw recomputed by DuckDB)
    oracles["bootstrap_ci"] = _bootstrap_oracle_sql(100, seed=7)
    oracles["perm_test"] = _perm_test_oracle_sql(200, seed=11)
    oracles["simhash_neardup"] = _simhash_oracle_sql(max_distance=3)
    # hybrid: pinned k-means assignment, SQL-replayed dedup decision
    oracles["semantic_dedup"] = _semantic_dedup_oracle_sql(eps=0.65)
    oracles["image_conv"] = _conv_oracle_sql()
    oracles["image_lbp"] = _lbp_oracle_sql()
    oracles["image_median3"] = _median3_oracle_sql()
    oracles["image_equalize"] = _equalize_oracle_sql()
    oracles["image_otsu"] = _otsu_oracle_sql()
    oracles["image_morph"] = _morph_oracle_sql()
    oracles["image_blobs"] = _blob_oracle_sql()
    oracles["image_gradhist"] = _gradhist_oracle_sql()
    oracles["image_moments"] = _moments_oracle_sql()
    oracles["image_boxpeak"] = _boxpeak_oracle_sql()
    oracles["srp_sketch"] = _srp_oracle_sql()
    oracles["triplet_mining"] = """
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
          FROM embeddings
        ), a AS (
          SELECT vec_id AS anchor_id, v AS p, label AS a_lbl
          FROM e WHERE vec_id < 60
        ), pairs AS (
          SELECT anchor_id, vec_id AS cand_id, a_lbl,
                 e.label AS c_lbl,
                 list_dot_product(p, v)
                   / (sqrt(list_dot_product(p, p))
                      * sqrt(list_dot_product(v, v))) AS cos
          FROM a, e WHERE anchor_id <> vec_id
        ), pos AS (
          SELECT anchor_id, cand_id AS pos_id, cos AS pos_cos,
                 row_number() OVER (PARTITION BY anchor_id
                                    ORDER BY cos DESC, cand_id ASC)
                   AS rn
          FROM pairs WHERE a_lbl = c_lbl
        ), neg AS (
          SELECT anchor_id, cand_id AS neg_id, cos AS neg_cos,
                 row_number() OVER (PARTITION BY anchor_id
                                    ORDER BY cos DESC, cand_id ASC)
                   AS rn
          FROM pairs WHERE a_lbl <> c_lbl
        )
        SELECT a.anchor_id,
               p.pos_id, round(p.pos_cos, 6) AS pos_cos,
               n.neg_id, round(n.neg_cos, 6) AS neg_cos,
               CASE WHEN p.pos_cos IS NOT NULL
                     AND n.neg_cos IS NOT NULL
                    THEN n.neg_cos > p.pos_cos END AS semi_hard
        FROM a
        LEFT JOIN pos p ON p.anchor_id = a.anchor_id AND p.rn = 1
        LEFT JOIN neg n ON n.anchor_id = a.anchor_id AND n.rn = 1
    """
    oracles["int8_quant"] = """
        WITH v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings
        ), ex AS (
          SELECT d, min(x) AS mn, max(x) AS mx FROM (
            SELECT unnest(v) AS x,
                   unnest(generate_series(1, len(v))) AS d
            FROM v)
          GROUP BY d
        ), px AS (
          SELECT vec_id,
                 unnest(generate_series(1, len(v))) AS d,
                 unnest(v) AS x
          FROM v
        ), coded AS (
          SELECT p.vec_id, p.d, p.x, e.mn, e.mx,
                 CASE WHEN e.mx = e.mn THEN 0
                      ELSE CAST(least(greatest(round(
                        (p.x - e.mn) * 255.0 / (e.mx - e.mn)),
                        0.0), 255.0) AS BIGINT) END AS code
          FROM px p JOIN ex e USING (d)
        )
        SELECT vec_id,
               CAST(sum(code) AS BIGINT) AS code_sum,
               CAST(min(code) AS BIGINT) AS code_min,
               CAST(max(code) AS BIGINT) AS code_max,
               round(max(abs(x - (mn + CAST(code AS DOUBLE)
                                       * (mx - mn) / 255.0))), 6)
                 AS max_err
        FROM coded GROUP BY vec_id
    """
    from hiselspark.functions.text import BPE_PRETOKEN_PATTERN
    _bpp = BPE_PRETOKEN_PATTERN.replace("'", "''")
    oracles["bpe_tokens"] = f"""
        WITH a AS (
          SELECT doc_id,
                 list_filter(regexp_extract_all(lower(text),
                             '{_bpp}'), t -> trim(t) <> '') AS p
          FROM documents
        )
        SELECT doc_id,
               CAST(len(p) AS BIGINT) AS n_bpe,
               CAST(len(list_distinct(p)) AS BIGINT) AS n_distinct,
               CAST(COALESCE(list_max(list_transform(p,
                             t -> length(t))), 0) AS BIGINT)
                 AS max_len
        FROM a
    """
    oracles["token_fertility"] = f"""
        WITH a AS (
          SELECT doc_id,
                 CAST(length(text) AS BIGINT) AS n_chars,
                 CASE WHEN trim(lower(text)) = ''
                      THEN CAST([] AS VARCHAR[])
                      ELSE regexp_split_to_array(trim(lower(text)),
                                                 '\\s+') END AS ws,
                 list_filter(regexp_extract_all(lower(text),
                             '{_bpp}'), t -> trim(t) <> '') AS p
          FROM documents
        )
        SELECT doc_id, n_chars,
               CAST(len(ws) AS BIGINT) AS n_words,
               CAST(len(p) AS BIGINT) AS n_pretokens,
               round(CAST(len(p) AS DOUBLE)
                     / CAST(len(ws) AS DOUBLE), 6) AS fertility,
               round(CAST(n_chars AS DOUBLE)
                     / CAST(len(p) AS DOUBLE), 6) AS chars_per_token
        FROM a WHERE len(ws) > 0 AND len(p) > 0
    """
    oracles["bigram_logprob"] = """
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = ''
                      THEN CAST([] AS VARCHAR[])
                      ELSE regexp_split_to_array(
                             lower(trim(text)), '\\s+')
                 END AS toks
          FROM documents
        ), tok AS (
          SELECT doc_id, unnest(toks) AS tok,
                 unnest(generate_series(1, len(toks))) AS ord
          FROM t
        ), big AS (
          SELECT doc_id, tok AS w1,
                 lead(tok) OVER (PARTITION BY doc_id
                                 ORDER BY ord) AS w2
          FROM tok
          QUALIFY w2 IS NOT NULL
        ), uni AS (
          SELECT tok AS w1, CAST(count(*) AS BIGINT) AS c1
          FROM tok GROUP BY tok
        ), bi AS (
          SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
          FROM big GROUP BY w1, w2
        ), v AS (
          SELECT CAST(count(*) AS BIGINT) AS vsz FROM uni
        ), terms AS (
          SELECT b.doc_id,
                 list_sort(list([bi.c2, uni.c1])) AS ts,
                 CAST(count(*) AS BIGINT) AS n_bigrams
          FROM big b
          JOIN bi ON bi.w1 = b.w1 AND bi.w2 = b.w2
          JOIN uni ON uni.w1 = b.w1
          GROUP BY b.doc_id
        )
        SELECT doc_id, n_bigrams,
               round(list_reduce(list_prepend(0.0, list_transform(ts,
                       p -> ln(CAST(p[1] + 1 AS DOUBLE))
                            - ln(CAST(p[2] + vsz AS DOUBLE)))),
                     (x, y) -> x + y)
                     / CAST(n_bigrams AS DOUBLE), 6)
                 AS bigram_logprob
        FROM terms, v
    """
    oracles["zipf_fit"] = """
        WITH t AS (
          SELECT CASE WHEN trim(text) = ''
                      THEN CAST([] AS VARCHAR[])
                      ELSE regexp_split_to_array(
                             lower(trim(text)), '\\s+')
                 END AS toks
          FROM documents
        ), tok AS (
          SELECT unnest(toks) AS tok FROM t
        ), vocab AS (
          SELECT tok, CAST(count(*) AS BIGINT) AS cnt
          FROM tok GROUP BY tok
        ), top AS (
          SELECT cnt,
                 row_number() OVER (ORDER BY cnt DESC, tok ASC)
                   AS rank
          FROM vocab
          QUALIFY rank <= 200
        ), folded AS (
          SELECT list_sort(list([rank, cnt])) AS a FROM top
        ), sums AS (
          SELECT CAST(len(a) AS BIGINT) AS v,
                 list_reduce(list_prepend(0.0, list_transform(a,
                   p -> ln(CAST(p[1] AS DOUBLE)))),
                   (x, y) -> x + y) AS sx,
                 list_reduce(list_prepend(0.0, list_transform(a,
                   p -> ln(CAST(p[2] AS DOUBLE)))),
                   (x, y) -> x + y) AS sy,
                 list_reduce(list_prepend(0.0, list_transform(a,
                   p -> ln(CAST(p[1] AS DOUBLE))
                        * ln(CAST(p[1] AS DOUBLE)))),
                   (x, y) -> x + y) AS sxx,
                 list_reduce(list_prepend(0.0, list_transform(a,
                   p -> ln(CAST(p[1] AS DOUBLE))
                        * ln(CAST(p[2] AS DOUBLE)))),
                   (x, y) -> x + y) AS sxy,
                 list_reduce(list_prepend(0.0, list_transform(a,
                   p -> ln(CAST(p[2] AS DOUBLE))
                        * ln(CAST(p[2] AS DOUBLE)))),
                   (x, y) -> x + y) AS syy
          FROM folded
        )
        SELECT v,
               round((CAST(v AS DOUBLE) * sxy - sx * sy)
                     / (CAST(v AS DOUBLE) * sxx - sx * sx), 6)
                 AS slope,
               round((sy - (CAST(v AS DOUBLE) * sxy - sx * sy)
                           / (CAST(v AS DOUBLE) * sxx - sx * sx)
                           * sx) / CAST(v AS DOUBLE), 6) AS intercept,
               round((CAST(v AS DOUBLE) * sxy - sx * sy)
                     * (CAST(v AS DOUBLE) * sxy - sx * sy)
                     / ((CAST(v AS DOUBLE) * sxx - sx * sx)
                        * (CAST(v AS DOUBLE) * syy - sy * sy)), 6)
                 AS r2
        FROM sums
    """
    _rt = """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(abs(CAST(round(value*100) AS BIGINT)))
                    AS BIGINT) AS sum_cents,
               CAST(sum(epoch_us(ts) // 86400000000) AS BIGINT)
                 AS sum_days,
               CAST(sum(epoch_us(ts) % 86400000000) AS BIGINT)
                 AS sum_us_in_day,
               CAST(sum(length(props)) AS BIGINT) AS sum_props_len
        FROM events GROUP BY event_type
    """
    oracles["csv_roundtrip"] = _rt
    oracles["jsonl_roundtrip"] = _rt
    oracles["distinct_users"] = """
        SELECT event_type,
               COUNT(DISTINCT user_id) AS n_users,
               COUNT(*) AS n_events
        FROM events GROUP BY event_type
    """
    oracles["interval_left"] = """
        WITH purchases AS (
          SELECT event_id, user_id, epoch_us(ts) AS pus FROM events
          WHERE event_type = 'purchase'
        ), clicks AS (
          SELECT user_id, epoch_us(ts) AS cus,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = 'click'
        )
        SELECT p.event_id, p.user_id,
               COUNT(c.cents) AS n_clicks,
               CAST(COALESCE(SUM(c.cents), 0) AS BIGINT) AS click_cents
        FROM purchases p
        LEFT JOIN clicks c
          ON p.user_id = c.user_id
         AND c.cus >= p.pus - 1800000000
         AND c.cus <= p.pus
        GROUP BY p.event_id, p.user_id
    """
    # the skew-proof chunked operators must match the SAME oracles as
    # their plain twins — that equality IS their contract
    oracles["asof_chunked"] = oracles["asof_join"]
    oracles["sessionize_chunked"] = oracles["sessionize"]
    # chunked encodings: bit-identical to the plain twins, same oracles
    oracles["target_encode_chunked"] = oracles["target_encode"]
    oracles["pit_zscore_chunked"] = oracles["pit_zscore"]
    # duplicate components: the same verified pairs (exact Jaccard —
    # LSH recall 1.0 on gate data) closed transitively by a recursive
    # CTE; component = min reachable id
    oracles["dup_components"] = """
        WITH RECURSIVE norm AS (
          SELECT doc_id,
                 regexp_split_to_array(
                   regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                   ' ') AS words
          FROM documents
        ), sh AS (
          SELECT DISTINCT doc_id,
                 CASE WHEN len(words) >= 3
                      THEN words[i] || ' ' || words[i+1] || ' '
                           || words[i+2]
                      ELSE array_to_string(words, ' ') END AS shingle
          FROM norm,
               unnest(generate_series(
                 1, greatest(len(words) - 2, 1))) AS t(i)
        ), sizes AS (
          SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
        ), inter AS (
          SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS n_common
          FROM sh l JOIN sh r USING (shingle)
          WHERE l.doc_id < r.doc_id
          GROUP BY 1, 2
        ), pairs AS (
          SELECT a, b FROM inter
          JOIN sizes sa ON sa.doc_id = a
          JOIN sizes sb ON sb.doc_id = b
          WHERE CAST(n_common AS DOUBLE)
                / (sa.n_sh + sb.n_sh - n_common) >= 0.5
        ), sym AS (
          SELECT a AS s, b AS d FROM pairs
          UNION SELECT b, a FROM pairs
        ), reach(s, d) AS (
          SELECT s, d FROM sym
          UNION
          SELECT r.s, e.d FROM reach r JOIN sym e ON r.d = e.s
        ), closed AS (
          SELECT s, d FROM reach
          UNION SELECT s, s FROM sym
        )
        SELECT s AS doc_id, CAST(MIN(d) AS BIGINT) AS component
        FROM closed GROUP BY s
    """
    # audio encode->decode->reduce vs direct arithmetic on the floats:
    # samples are round(clip(x)*32767)/32768 (int16 exact in double)
    oracles["audio_features"] = """
        WITH samples AS (
          SELECT vec_id, i,
                 round(greatest(least(CAST(embedding[i] AS DOUBLE), 1.0),
                                -1.0) * 32767) / 32768.0 AS s
          FROM embeddings,
               unnest(generate_series(1, len(embedding))) AS t(i)
        ), seq AS (
          SELECT vec_id, s,
                 LAG(s) OVER (PARTITION BY vec_id ORDER BY i) AS prev
          FROM samples
        )
        SELECT vec_id,
               round(COUNT(*) / 16000.0, 6) AS duration_s,
               round(sqrt(AVG(s * s)), 6) AS rms,
               round(MAX(abs(s)), 6) AS peak,
               round(CAST(COUNT(*) FILTER (
                         WHERE prev IS NOT NULL
                           AND (s < 0) <> (prev < 0)) AS DOUBLE)
                     / (COUNT(*) - 1), 6) AS zcr
        FROM seq GROUP BY vec_id
    """
    # multimodal payloads, synthesized so DuckDB reproduces every pixel
    # arithmetically: p[i] = (key*mult + i*step) % 256.  Raw layout is
    # channel-interleaved (h, w, 3), so channel = flat index mod 3.
    # Integer sums are exact in double and npix is a power of two, so
    # means/quantile interpolation are bit-identical across engines;
    # the std oracle spells out sqrt(sumsq/n - mean^2) with the same
    # IEEE operation order as the histogram kernel.
    oracles["image_pixel_stats"] = """
        WITH px AS (
          SELECT o_orderkey AS okey, i,
                 CAST((o_orderkey * 7919 + i * 31) % 256 AS DOUBLE) AS p
          FROM orders, unnest(generate_series(0, 191)) AS t(i)
        )
        SELECT okey,
               round(SUM(p) FILTER (WHERE i % 3 = 0) / 64.0, 6) AS mean_r,
               round(SUM(p) FILTER (WHERE i % 3 = 1) / 64.0, 6) AS mean_g,
               round(SUM(p) FILTER (WHERE i % 3 = 2) / 64.0, 6) AS mean_b,
               round(sqrt(greatest(
                 SUM(p * p) FILTER (WHERE i % 3 = 0) / 64.0
                 - (SUM(p) FILTER (WHERE i % 3 = 0) / 64.0)
                   * (SUM(p) FILTER (WHERE i % 3 = 0) / 64.0), 0.0)), 6)
                 AS std_r,
               round(quantile_cont(p, 0.25), 6) AS q25,
               round(quantile_cont(p, 0.5), 6) AS q50,
               round(quantile_cont(p, 0.75), 6) AS q75
        FROM px GROUP BY okey
    """
    oracles["dhash"] = """
        WITH gray AS (
          SELECT o_orderkey AS okey, y, x,
                 (SELECT sum((o_orderkey * 7919
                              + ((y*8 + least(CAST(floor((x + 0.5)
                                   * 8.0 / 9.0) AS BIGINT), 7))*3
                                 + c) * 31) % 256)
                  FROM unnest(generate_series(0, 2)) AS tc(c)) AS g
          FROM orders,
               unnest(generate_series(0, 7)) AS ty(y),
               unnest(generate_series(0, 8)) AS tx(x)
        ), bits AS (
          SELECT a.okey, a.y, a.x,
                 CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
          FROM gray a JOIN gray b
            ON a.okey = b.okey AND a.y = b.y AND b.x = a.x + 1
          WHERE a.x < 8
        )
        SELECT okey,
               CAST(sum(CASE WHEN y < 4
                             THEN bit * (1::BIGINT << (y*8 + x))
                             ELSE 0 END) AS BIGINT) AS dhash_lo,
               CAST(sum(CASE WHEN y >= 4
                             THEN bit * (1::BIGINT << ((y-4)*8 + x))
                             ELSE 0 END) AS BIGINT) AS dhash_hi
        FROM bits GROUP BY okey
    """
    oracles["dhash_neardup"] = """
        WITH keys AS (
          SELECT o_orderkey AS okey, o_orderkey % 500 AS seed
          FROM orders WHERE o_orderkey <= 3000
        ), gray AS (
          SELECT okey, seed, y, x,
                 (SELECT sum((seed * 7919
                              + ((y*8 + least(CAST(floor((x + 0.5)
                                   * 8.0 / 9.0) AS BIGINT), 7))*3
                                 + c) * 31) % 256)
                  FROM unnest(generate_series(0, 2)) AS tc(c)) AS g
          FROM keys,
               unnest(generate_series(0, 7)) AS ty(y),
               unnest(generate_series(0, 8)) AS tx(x)
        ), bits AS (
          SELECT a.okey, a.y, a.x,
                 CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
          FROM gray a JOIN gray b
            ON a.okey = b.okey AND a.y = b.y AND b.x = a.x + 1
          WHERE a.x < 8
        ), h AS (
          SELECT okey,
                 CAST(sum(CASE WHEN y < 4
                               THEN bit * (1::BIGINT << (y*8 + x))
                               ELSE 0 END) AS BIGINT) AS lo,
                 CAST(sum(CASE WHEN y >= 4
                               THEN bit * (1::BIGINT << ((y-4)*8 + x))
                               ELSE 0 END) AS BIGINT) AS hi
          FROM bits GROUP BY okey
        ), pairs AS (
          SELECT a.okey AS pa,
                 CAST(bit_count(xor(a.lo, b.lo))
                      + bit_count(xor(a.hi, b.hi)) AS INT) AS hamming
          FROM h a JOIN h b
            ON a.okey < b.okey
           AND (a.lo = b.lo OR a.hi = b.hi)
        )
        SELECT hamming,
               count(*) AS n_pairs,
               CAST(count(DISTINCT pa) AS BIGINT) AS n_left
        FROM pairs WHERE hamming <= 6 GROUP BY hamming
    """
    oracles["image_curation"] = """
        WITH keys AS (
          SELECT o_orderkey AS okey, o_orderkey % 400 AS seed
          FROM orders WHERE o_orderkey <= 2000
        ), px AS (
          SELECT okey, seed,
                 CAST((seed * 7919 + ((y*8 + x)*3 + c) * 31) % 256
                      AS BIGINT) AS p,
                 CAST((seed * 7919 + ((y*8 + x + 1)*3 + c) * 31) % 256
                      AS BIGINT) AS pr
          FROM keys,
               unnest(generate_series(0, 7)) AS ty(y),
               unnest(generate_series(0, 6)) AS tx(x),
               unnest(generate_series(0, 2)) AS tc(c)
        ), sharp AS (
          SELECT okey, CAST(sum(abs(pr - p)) AS BIGINT) AS sharp
          FROM px GROUP BY okey
        ), gray AS (
          SELECT okey, y, x,
                 (SELECT sum((seed * 7919
                              + ((y*8 + least(CAST(floor((x + 0.5)
                                   * 8.0 / 9.0) AS BIGINT), 7))*3
                                 + c) * 31) % 256)
                  FROM unnest(generate_series(0, 2)) AS tc(c)) AS g
          FROM keys,
               unnest(generate_series(0, 7)) AS ty(y),
               unnest(generate_series(0, 8)) AS tx(x)
        ), bits AS (
          SELECT a.okey, a.y, a.x,
                 CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
          FROM gray a JOIN gray b
            ON a.okey = b.okey AND a.y = b.y AND b.x = a.x + 1
          WHERE a.x < 8
        ), h AS (
          SELECT okey,
                 CAST(sum(CASE WHEN y < 4
                               THEN bit * (1::BIGINT << (y*8 + x))
                               ELSE 0 END) AS BIGINT) AS lo,
                 CAST(sum(CASE WHEN y >= 4
                               THEN bit * (1::BIGINT << ((y-4)*8 + x))
                               ELSE 0 END) AS BIGINT) AS hi
          FROM bits GROUP BY okey
        ), thresh AS (
          SELECT quantile_cont(CAST(sharp AS DOUBLE), 0.1) AS t
          FROM sharp
        ), kept AS (
          SELECT s.okey, s.sharp, h.lo, h.hi
          FROM sharp s JOIN h USING (okey) CROSS JOIN thresh
          WHERE CAST(s.sharp AS DOUBLE) > t
        ), r AS (
          SELECT *,
                 row_number() OVER (PARTITION BY lo, hi
                   ORDER BY sharp DESC, okey ASC) AS rk,
                 count(*) OVER (PARTITION BY lo, hi) AS gsz
          FROM kept
        )
        SELECT CAST(gsz AS BIGINT) AS group_size,
               count(*) AS n_groups,
               CAST(min(okey) AS BIGINT) AS min_survivor
        FROM r WHERE rk = 1 GROUP BY gsz
    """
    oracles["image_color"] = """
        WITH px AS (
          SELECT o_orderkey AS okey,
                 ((o_orderkey * 7919 + (3*j.range + 0) * 31) % 256)
                   // 64 * 16
                 + ((o_orderkey * 7919 + (3*j.range + 1) * 31) % 256)
                   // 64 * 4
                 + ((o_orderkey * 7919 + (3*j.range + 2) * 31) % 256)
                   // 64 AS bin
          FROM orders, range(64) j
        ), c AS (
          SELECT okey, bin, CAST(count(*) AS BIGINT) AS cnt
          FROM px GROUP BY okey, bin
        ), dom AS (
          SELECT okey, bin, cnt,
                 row_number() OVER (PARTITION BY okey
                                    ORDER BY cnt DESC, bin ASC) AS rk
          FROM c
        ), ent AS (
          SELECT okey,
                 CAST(count(*) AS BIGINT) AS n_bins,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(
                     list(cnt ORDER BY bin),
                     x -> -(CAST(x AS DOUBLE) / 64.0)
                          * ln(CAST(x AS DOUBLE) / 64.0))),
                   (acc, t) -> acc + t) AS e
          FROM c GROUP BY okey
        )
        SELECT ent.okey, ent.n_bins,
               CAST(dom.bin AS BIGINT) AS dom_bin,
               round(CAST(dom.cnt AS DOUBLE) / 64.0, 6) AS dom_share,
               round(ent.e, 6) AS color_entropy
        FROM ent JOIN dom ON dom.okey = ent.okey AND dom.rk = 1
    """
    oracles["image_ssim"] = """
        WITH px AS (
          SELECT o_orderkey AS okey, j.range AS j,
                 CAST(((j.range // 8) // 4) AS INTEGER) AS ti,
                 CAST(((j.range % 8) // 4) AS INTEGER) AS tj,
                 CAST((o_orderkey * 7919 + (3*j.range + 0) * 31) % 256
                   + (o_orderkey * 7919 + (3*j.range + 1) * 31) % 256
                   + (o_orderkey * 7919 + (3*j.range + 2) * 31) % 256
                   AS BIGINT) AS ga,
                 CAST((o_orderkey * 104729 + (3*j.range + 0) * 57) % 256
                   + (o_orderkey * 104729 + (3*j.range + 1) * 57) % 256
                   + (o_orderkey * 104729 + (3*j.range + 2) * 57) % 256
                   AS BIGINT) AS gb
          FROM orders, range(64) j
        ), s AS (
          SELECT okey, ti, tj,
                 CAST(sum(ga) AS BIGINT) AS sx,
                 CAST(sum(gb) AS BIGINT) AS sy,
                 CAST(sum(ga*ga) AS BIGINT) AS sxx,
                 CAST(sum(gb*gb) AS BIGINT) AS syy,
                 CAST(sum(ga*gb) AS BIGINT) AS sxy
          FROM px GROUP BY okey, ti, tj
        )
        SELECT okey, ti, tj, sx, sy, sxx, syy, sxy,
               round(
                 (2.0 * (CAST(sx AS DOUBLE)/16.0)
                      * (CAST(sy AS DOUBLE)/16.0) + 58.5225)
                 * (2.0 * (CAST(sxy AS DOUBLE)/16.0
                           - (CAST(sx AS DOUBLE)/16.0)
                             * (CAST(sy AS DOUBLE)/16.0)) + 526.7025)
                 / (((CAST(sx AS DOUBLE)/16.0)
                       * (CAST(sx AS DOUBLE)/16.0)
                     + (CAST(sy AS DOUBLE)/16.0)
                       * (CAST(sy AS DOUBLE)/16.0) + 58.5225)
                    * ((CAST(sxx AS DOUBLE)/16.0
                        - (CAST(sx AS DOUBLE)/16.0)
                          * (CAST(sx AS DOUBLE)/16.0))
                       + (CAST(syy AS DOUBLE)/16.0
                          - (CAST(sy AS DOUBLE)/16.0)
                            * (CAST(sy AS DOUBLE)/16.0)) + 526.7025)),
                 6) AS ssim
        FROM s
    """
    oracles["image_spatial"] = """
        WITH px AS (
          SELECT o_orderkey AS okey, y, x, c,
                 CAST((o_orderkey * 7919 + ((y*8 + x)*3 + c) * 31)
                      % 256 AS DOUBLE) AS p,
                 CAST((o_orderkey * 7919 + ((y*8 + x + 1)*3 + c) * 31)
                      % 256 AS DOUBLE) AS pr,
                 CAST((o_orderkey * 7919 + (((y+1)*8 + x)*3 + c) * 31)
                      % 256 AS DOUBLE) AS pd
          FROM orders,
               unnest(generate_series(0, 7)) AS ty(y),
               unnest(generate_series(0, 7)) AS tx(x),
               unnest(generate_series(0, 2)) AS tc(c)
        )
        SELECT okey,
               round(SUM(p) FILTER (WHERE y < 4 AND x < 4) / 48.0, 6)
                 AS tile0,
               round(SUM(p) FILTER (WHERE y < 4 AND x >= 4) / 48.0, 6)
                 AS tile1,
               round(SUM(p) FILTER (WHERE y >= 4 AND x < 4) / 48.0, 6)
                 AS tile2,
               round(SUM(p) FILTER (WHERE y >= 4 AND x >= 4) / 48.0, 6)
                 AS tile3,
               round(SUM(abs(pr - p)) FILTER (WHERE x < 7)
                     / (8*7*3.0), 6) AS edge_dx,
               round(SUM(abs(pd - p)) FILTER (WHERE y < 7)
                     / (7*8*3.0), 6) AS edge_dy,
               round((SUM(abs(pr - p)) FILTER (WHERE x < 7) / (8*7*3.0)
                      + SUM(abs(pd - p)) FILTER (WHERE y < 7)
                        / (7*8*3.0)) / 2.0, 6) AS edge_energy
        FROM px GROUP BY okey
    """
    oracles["image_resize"] = """
        WITH px AS (
          SELECT o_orderkey AS okey, c,
                 CAST((o_orderkey * 7919
                       + (((2 * y + 1) * 8 + 2 * x + 1) * 3 + c) * 31)
                      % 256 AS DOUBLE) AS p
          FROM orders,
               unnest(generate_series(0, 3)) AS ty(y),
               unnest(generate_series(0, 3)) AS tx(x),
               unnest(generate_series(0, 2)) AS tc(c)
        )
        SELECT okey,
               round(SUM(p) FILTER (WHERE c = 0) / 16.0, 6) AS mean_r,
               round(SUM(p) FILTER (WHERE c = 1) / 16.0, 6) AS mean_g,
               round(SUM(p) FILTER (WHERE c = 2) / 16.0, 6) AS mean_b,
               round(quantile_cont(p, 0.5), 6) AS q50
        FROM px GROUP BY okey
    """
    oracles["video_frames"] = """
        WITH px AS (
          SELECT o_orderkey AS okey, f, j,
                 CAST((o_orderkey * 131 + (f * 48 + j) * 7) % 256
                      AS DOUBLE) AS p
          FROM orders,
               unnest([0, 2, 4]) AS tf(f),
               unnest(generate_series(0, 47)) AS tj(j)
          WHERE o_orderkey % 4 = 0
        )
        SELECT okey, CAST(f AS INT) AS frame_idx,
               round(SUM(p) FILTER (WHERE j % 3 = 0) / 16.0, 6) AS mean_r,
               round(SUM(p) FILTER (WHERE j % 3 = 1) / 16.0, 6) AS mean_g,
               round(SUM(p) FILTER (WHERE j % 3 = 2) / 16.0, 6) AS mean_b
        FROM px GROUP BY okey, f
    """
    # training-shard sink round trip: shard = content_hash(text, salt=3)
    # % 8, recomputed arithmetically (same fold as dataset_split)
    oracles["training_shards"] = """
        WITH h AS (
          SELECT doc_id,
                 list_reduce(
                   list_prepend(CAST(3 AS BIGINT),
                     list_transform(
                       str_split(regexp_replace(
                         lower(trim(COALESCE(text, ''))),
                         '\\s+', ' ', 'g'), ''),
                       x -> CAST(ascii(x) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 2147483647) AS hv
          FROM documents
        )
        SELECT CAST(hv % 8 AS INT) AS shard,
               COUNT(*) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        FROM h GROUP BY 1
    """
    # sequence packing: same stream hash as training_shards (salt 0),
    # token tape = window cumsum per stream ordered by doc_id, cut
    # every 128 tokens; segment spans via generate_series
    oracles["pack_sequences"] = """
        WITH h AS (
          SELECT doc_id,
                 list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                     list_transform(
                       str_split(regexp_replace(
                         lower(trim(COALESCE(text, ''))),
                         '\\s+', ' ', 'g'), ''),
                       x -> CAST(ascii(x) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 2147483647) AS hv,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(trim(text),
                                                     '\\s+'))
                 END AS n
          FROM documents
        ),
        tape AS (
          SELECT doc_id, CAST(hv % 4 AS INT) AS stream, n,
                 SUM(n) OVER (PARTITION BY hv % 4 ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS e
          FROM h WHERE n > 0
        ),
        seg AS (
          SELECT stream, doc_id, n, e, e - n AS s,
                 unnest(generate_series(
                   CAST((e - n) // 128 AS BIGINT),
                   CAST((e - 1) // 128 AS BIGINT))) AS seq
          FROM tape
        )
        SELECT stream, seq,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(LEAST(e, (seq + 1) * 128)
                        - GREATEST(s, seq * 128)) AS BIGINT)
                 AS n_tokens,
               CAST(SUM(CASE WHEN LEAST(e, (seq + 1) * 128)
                                  - GREATEST(s, seq * 128) < n
                             THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_straddle
        FROM seg GROUP BY 1, 2
    """
    # n-gram repetition metrics: same tokenization as caption_stats,
    # n-gram slots via generate_series + list slicing; only counts and
    # exact integer ratios cross engines (no string tie-breaking)
    oracles["repetition_stats"] = """
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE regexp_split_to_array(trim(text), '\\s+')
                 END AS toks
          FROM documents
        ),
        g AS (
          SELECT doc_id, len(toks) AS n_tokens, nn.n AS n,
                 unnest(list_transform(
                   generate_series(1, len(toks) - nn.n + 1),
                   i -> array_to_string(toks[i:i + nn.n - 1], ' ')))
                   AS gram
          FROM t, (VALUES (1), (2), (3)) AS nn(n)
          WHERE len(toks) >= nn.n
        ),
        pg AS (
          SELECT doc_id, n_tokens, n, gram, COUNT(*) AS cnt
          FROM g GROUP BY 1, 2, 3, 4
        ),
        pn AS (
          SELECT doc_id, n_tokens, n, MAX(cnt) AS top_cnt,
                 COUNT(*) AS n_distinct
          FROM pg GROUP BY 1, 2, 3
        ),
        st AS (
          SELECT doc_id, n_tokens,
                 round(COALESCE(MAX(CASE WHEN n = 1 THEN n_distinct
                                    END) * 1.0 / n_tokens, 0), 6)
                   AS uniq_frac,
                 round(COALESCE(MAX(CASE WHEN n = 1 THEN top_cnt END)
                   * 1.0 / n_tokens, 0), 6) AS top1_frac,
                 round(COALESCE(MAX(CASE WHEN n = 2 THEN top_cnt END)
                   * 1.0 / (n_tokens - 1), 0), 6) AS top2_frac,
                 round(COALESCE(MAX(CASE WHEN n = 3 THEN top_cnt END)
                   * 1.0 / (n_tokens - 2), 0), 6) AS top3_frac
          FROM pn GROUP BY 1, 2
        )
        SELECT d.doc_id,
               CAST(COALESCE(st.n_tokens, 0) AS INT) AS n_tokens,
               COALESCE(uniq_frac, 0) AS uniq_frac,
               COALESCE(top1_frac, 0) AS top1_frac,
               COALESCE(top2_frac, 0) AS top2_frac,
               COALESCE(top3_frac, 0) AS top3_frac
        FROM documents d LEFT JOIN st USING (doc_id)
    """
    # PII scrub: identical injection + RE2-compatible patterns replayed
    # in DuckDB; masked text must match string-exactly
    oracles["pii_scrub"] = """
        WITH inj AS (
          SELECT doc_id,
                 text || ' contact user' || doc_id || '@example'
                   || (doc_id % 7) || '.com via https://s'
                   || (doc_id % 13) || '.example/p'
                   || CASE WHEN doc_id % 3 = 0
                           THEN ' at 10.0.' || (doc_id % 256) || '.'
                                || (doc_id % 100)
                           ELSE '' END AS t
          FROM documents
        ),
        pats AS (
          SELECT doc_id, t,
                 '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}'
                   AS p_email,
                 'https?://[^\\s]+' AS p_url,
                 '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'
                   AS p_ip
          FROM inj
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, p_email)) AS INT)
                 AS n_email,
               CAST(len(regexp_extract_all(t, p_url)) AS INT) AS n_url,
               CAST(len(regexp_extract_all(t, p_ip)) AS INT) AS n_ip,
               LENGTH(regexp_replace(regexp_replace(regexp_replace(
                 t, p_email, '<EMAIL>', 'g'), p_url, '<URL>', 'g'),
                 p_ip, '<IP>', 'g')) AS len_scrubbed,
               regexp_replace(regexp_replace(regexp_replace(
                 t, p_email, '<EMAIL>', 'g'), p_url, '<URL>', 'g'),
                 p_ip, '<IP>', 'g') AS text_scrubbed
        FROM pats
    """
    # deterministic sampling: membership is pure hash arithmetic
    oracles["hash_sample"] = """
        WITH h AS (
          SELECT doc_id, lang, source,
                 list_reduce(
                   list_prepend(CAST(7 AS BIGINT),
                     list_transform(
                       str_split(regexp_replace(
                         lower(trim(COALESCE(text, ''))),
                         '\\s+', ' ', 'g'), ''),
                       x -> CAST(ascii(x) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 2147483647) AS hv
          FROM documents
        )
        SELECT doc_id, lang, source FROM h
        WHERE hv % 1000000 < 300000
    """
    oracles["quota_sample"] = """
        WITH h AS (
          SELECT doc_id, source,
                 list_reduce(
                   list_prepend(CAST(11 AS BIGINT),
                     list_transform(
                       str_split(regexp_replace(
                         lower(trim(COALESCE(text, ''))),
                         '\\s+', ' ', 'g'), ''),
                       x -> CAST(ascii(x) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 2147483647) AS hv
          FROM documents
        ),
        r AS (
          SELECT doc_id, source,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY hv, doc_id) AS rk
          FROM h
        )
        SELECT doc_id, source FROM r WHERE rk <= 10
    """
    # sliding-window chunking: stride 32 = 40 - 8; last start is the
    # first window reaching the end (integer-exact ceil arithmetic)
    oracles["chunk_docs"] = """
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE regexp_split_to_array(trim(text), '\\s+')
                 END AS toks
          FROM documents
        ),
        b AS (
          SELECT doc_id, toks, len(toks) AS n
          FROM t WHERE len(toks) > 0
        ),
        k AS (
          SELECT doc_id, toks, n,
                 unnest(generate_series(0,
                   CASE WHEN n > 40 THEN (n - 40 + 31) // 32
                        ELSE 0 END)) AS chunk_id
          FROM b
        )
        SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
               CAST(chunk_id * 32 AS BIGINT) AS start_tok,
               CAST(LEAST(40, n - chunk_id * 32) AS BIGINT)
                 AS n_chunk_tokens,
               array_to_string(
                 toks[chunk_id * 32 + 1 : chunk_id * 32 + 40], ' ')
                 AS chunk
        FROM k
    """
    # end-to-end curation: the full scrub -> quality -> dedup ->
    # budget -> pack chain replayed stage by stage
    oracles["curate_corpus"] = """
        WITH inj AS (
          SELECT doc_id, source,
                 text || ' contact user' || doc_id || '@example'
                   || (doc_id % 7) || '.com via https://s'
                   || (doc_id % 13) || '.example/p' AS t0
          FROM documents
        ),
        scrub AS (
          SELECT doc_id, source,
                 regexp_replace(regexp_replace(regexp_replace(t0,
                   '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
                   'https?://[^\\s]+', '<URL>', 'g'),
                   '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                   '<IP>', 'g') AS t
          FROM inj
        ),
        tok AS (
          SELECT doc_id, source, t,
                 CASE WHEN trim(t) = '' THEN CAST([] AS VARCHAR[])
                      ELSE regexp_split_to_array(trim(t), '\\s+')
                 END AS toks
          FROM scrub
        ),
        uni AS (
          SELECT doc_id, unnest(toks) AS gram FROM tok
        ),
        cnt AS (
          SELECT doc_id, gram, COUNT(*) AS c FROM uni GROUP BY 1, 2
        ),
        top AS (
          SELECT doc_id, MAX(c) AS topc FROM cnt GROUP BY 1
        ),
        quality AS (
          SELECT k.doc_id, k.source, k.t, len(k.toks) AS n
          FROM tok k JOIN top USING (doc_id)
          WHERE len(k.toks) >= 20
            AND round(topc * 1.0 / len(k.toks), 6) <= 0.12
        ),
        canon AS (
          SELECT doc_id, source, t, n FROM (
            SELECT *, ROW_NUMBER() OVER (
              PARTITION BY regexp_replace(lower(trim(t)),
                                          '\\s+', ' ', 'g')
              ORDER BY doc_id) AS rk
            FROM quality) WHERE rk = 1
        ),
        hashed AS (
          SELECT doc_id, source, n,
                 list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                     list_transform(
                       str_split(regexp_replace(lower(trim(t)),
                                                '\\s+', ' ', 'g'), ''),
                       x -> CAST(ascii(x) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 2147483647) AS hv
          FROM canon
        ),
        mixed AS (
          SELECT doc_id, n, hv FROM (
            SELECT *, SUM(n) OVER (PARTITION BY source
                                   ORDER BY hv, doc_id
                                   ROWS UNBOUNDED PRECEDING) AS run
            FROM hashed) WHERE run <= 800
        ),
        tape AS (
          SELECT doc_id, CAST(hv % 4 AS INT) AS stream, n,
                 SUM(n) OVER (PARTITION BY hv % 4 ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS e
          FROM mixed WHERE n > 0
        ),
        seg AS (
          SELECT stream, doc_id, n, e, e - n AS s,
                 unnest(generate_series(
                   CAST((e - n) // 128 AS BIGINT),
                   CAST((e - 1) // 128 AS BIGINT))) AS seq
          FROM tape
        )
        SELECT stream, seq,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(LEAST(e, (seq + 1) * 128)
                        - GREATEST(s, seq * 128)) AS BIGINT)
                 AS n_tokens,
               CAST(SUM(CASE WHEN LEAST(e, (seq + 1) * 128)
                                  - GREATEST(s, seq * 128) < n
                             THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_straddle
        FROM seg GROUP BY 1, 2
    """
    # sketches: exact columns recomputed, guarantee booleans literal
    # TRUE (HLL/GK are deterministic and their bounds hold by math)
    oracles["sketch_invariants"] = """
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
               TRUE AS hll_ok,
               TRUE AS gk_rank_ok
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type
    """
    # snapshot stats-pruned read == plain filter (pruning is an
    # optimization, never a semantics change)
    oracles["snapshot_prune"] = """
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
               CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_len
        FROM documents
        WHERE doc_id BETWEEN 120 AND 260
        GROUP BY source
    """
    # incremental append scan (v1, v3] == rows of batches 2 and 3;
    # the oracle recomputes the same quartile split arithmetically
    oracles["snapshot_incremental"] = """
        WITH n AS (SELECT (COUNT(*) + 3) // 4 AS step FROM documents)
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
               CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_len
        FROM documents, n
        WHERE doc_id >= n.step AND doc_id < 3 * n.step
        GROUP BY source
    """
    # resumable catch-up featurization: two delta-transform-appends
    # must equal one featurization of the full table
    oracles["snapshot_catchup"] = """
        SELECT doc_id, source,
               CAST(CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+'))
               END AS BIGINT) AS n_tok,
               CAST(LENGTH(text) AS BIGINT) AS text_len
        FROM documents
    """
    # copy-on-write MERGE + compact: the oracle replays the whole
    # merge (delete-matched + insert-source) in SQL; compact must be
    # invisible to it
    oracles["snapshot_delete"] = """
        WITH target AS (
          SELECT doc_id, source FROM documents
          WHERE doc_id BETWEEN 0 AND 299
        ), now AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_now,
                 CAST(sum(doc_id) AS BIGINT) AS ids_now
          FROM target
          WHERE doc_id NOT BETWEEN 120 AND 179
          GROUP BY source
        ), before AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_before
          FROM target GROUP BY source
        )
        SELECT now.source, n_now, ids_now, n_before
        FROM now JOIN before USING (source)
    """
    oracles["snapshot_compact"] = """
        WITH target AS (
          SELECT doc_id, source FROM documents
          WHERE doc_id BETWEEN 0 AND 299
        ), now AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_now,
                 CAST(sum(doc_id) AS BIGINT) AS ids_now
          FROM target GROUP BY source
        ), before AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_before
          FROM target GROUP BY source
        )
        SELECT now.source, n_now, ids_now, n_before,
               CAST(6 AS BIGINT) AS files_before,
               CAST(2 AS BIGINT) AS files_after
        FROM now JOIN before USING (source)
    """
    oracles["snapshot_upsert"] = """
        WITH target AS (
            SELECT doc_id, text, source FROM documents
            WHERE doc_id BETWEEN 0 AND 299
        ), src AS (
            SELECT doc_id, text || '!' AS text, 'upd' AS source
            FROM documents WHERE doc_id BETWEEN 150 AND 249
            UNION ALL
            SELECT doc_id, text, source FROM documents
            WHERE doc_id BETWEEN 400 AND 449
        ), merged AS (
            SELECT * FROM target
            WHERE doc_id NOT IN (SELECT doc_id FROM src)
            UNION ALL
            SELECT * FROM src
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
               CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_len
        FROM merged GROUP BY source
    """
    # commit log as a stream, startVersion=1 -> rows of appends v2..v4
    oracles["snapshot_stream"] = """
        WITH n AS (SELECT (COUNT(*) + 3) // 4 AS step FROM documents)
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
               CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_len
        FROM documents, n
        WHERE doc_id >= n.step
        GROUP BY source
    """
    # z-order re-clustering changes layout, never answers
    oracles["zorder_prune"] = """
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE doc_id BETWEEN 100 AND 299
          AND n_chars BETWEEN 100 AND 300
        GROUP BY source
    """
    # lossy-codec contract: the oracle states the per-row invariant as
    # literals (PSNR>=40 / lossless-exact / caption equality); any
    # codec regression flips a boolean on the Spark side and the hash
    oracles["lossy_codec_contract"] = """
        SELECT CAST(doc_id AS BIGINT) AS image_id,
               CAST(24 + (doc_id % 8) * 2 AS INTEGER) AS w,
               CAST(16 + (doc_id % 5) * 4 AS INTEGER) AS h,
               CASE WHEN doc_id % 2 = 0 THEN 'jpeg' ELSE 'webp' END AS fmt,
               TRUE AS psnr_ok,
               TRUE AS exact_ok,
               text AS caption
        FROM documents WHERE doc_id < 64
    """
    # streaming dedup drained == batch DISTINCT on normalized text
    oracles["streaming_dedup"] = """
        SELECT DISTINCT regexp_replace(lower(trim(text)),
                                       '\\s+', ' ', 'g') AS norm
        FROM documents
    """
    # token-budget mixing: exact prefix-sum rule in priority order
    oracles["token_budget"] = """
        WITH h AS (
          SELECT doc_id, source,
                 list_reduce(
                   list_prepend(CAST(13 AS BIGINT),
                     list_transform(
                       str_split(regexp_replace(
                         lower(trim(COALESCE(text, ''))),
                         '\\s+', ' ', 'g'), ''),
                       x -> CAST(ascii(x) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 2147483647) AS hv,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(trim(text),
                                                     '\\s+'))
                 END AS n
          FROM documents
        ),
        c AS (
          SELECT doc_id, source,
                 SUM(n) OVER (PARTITION BY source ORDER BY hv, doc_id
                              ROWS UNBOUNDED PRECEDING) AS run
          FROM h
        )
        SELECT doc_id, source FROM c WHERE run <= 600
    """
    # temperature mixing: budgets in exact integer arithmetic
    # (isqrt + floor division), then the same prefix-sum cut
    oracles["temperature_mix"] = """
        WITH h AS (
          SELECT doc_id, source,
                 list_reduce(
                   list_prepend(CAST(13 AS BIGINT),
                     list_transform(
                       str_split(regexp_replace(
                         lower(trim(COALESCE(text, ''))),
                         '\\s+', ' ', 'g'), ''),
                       x -> CAST(ascii(x) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 2147483647) AS hv,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(trim(text),
                                                     '\\s+'))
                 END AS n
          FROM documents
        ),
        w AS (
          SELECT source,
                 CAST(FLOOR(SQRT(CAST(SUM(n) AS DOUBLE))) AS BIGINT)
                   AS wt
          FROM h GROUP BY source
        ),
        b AS (
          SELECT source,
                 CAST((4000 * wt) // (SELECT SUM(wt) FROM w)
                      AS BIGINT) AS bud
          FROM w
        ),
        c AS (
          SELECT doc_id, source,
                 SUM(n) OVER (PARTITION BY source ORDER BY hv, doc_id
                              ROWS UNBOUNDED PRECEDING) AS run
          FROM h
        )
        SELECT c.doc_id, c.source
        FROM c JOIN b USING (source) WHERE c.run <= b.bud
    """
    # bucketed layout is physically transparent: same answer as the
    # plain join (the zero-shuffle property is plan-asserted in pytest)
    oracles["bucketed_join_agg"] = """
        WITH dim AS (
          SELECT user_id, COUNT(*) AS user_n FROM events
          GROUP BY user_id
        )
        SELECT d.user_n,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM events e JOIN dim d USING (user_id)
        GROUP BY d.user_n
    """
    # late-data watermark rule (verified against Spark's streaming
    # state semantics): a held-back row is ACCEPTED iff its day-window
    # end is still above the watermark at its arrival batch, which is
    # max(on-time ts) - 2 days
    oracles["streaming_late_data"] = """
        WITH ontime AS (
          SELECT * FROM events WHERE event_id % 97 <> 0
        ), wm AS (
          SELECT MAX(ts) - INTERVAL 2 DAY AS w FROM ontime
        ), accepted AS (
          SELECT user_id, ts, value FROM ontime
          UNION ALL
          SELECT e.user_id, e.ts, e.value FROM events e, wm
          WHERE e.event_id % 97 = 0
            AND date_trunc('day', e.ts) + INTERVAL 1 DAY > wm.w
        )
        SELECT user_id,
               epoch_us(date_trunc('day', ts)) AS day_us,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM accepted GROUP BY user_id, date_trunc('day', ts)
    """
    # content-keyed dataset split: the polynomial rolling hash
    # h = fold(chars, salt, (acc, ch) -> (acc*31 + codepoint) % (2^31-1))
    # evaluated with the SAME integer arithmetic in both engines
    oracles["dataset_split"] = """
        WITH h AS (
          SELECT doc_id,
                 list_reduce(
                   list_prepend(CAST(7 AS BIGINT),
                     list_transform(
                       str_split(regexp_replace(
                         lower(trim(COALESCE(text, ''))),
                         '\\s+', ' ', 'g'), ''),
                       x -> CAST(ascii(x) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 2147483647) AS hv
          FROM documents
        )
        SELECT doc_id,
               CASE WHEN hv % 100 < 80 THEN 'train'
                    WHEN hv % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM h
    """
    # decontamination: exact all-pairs Jaccard (LSH recall is 1.0 on
    # the gate corpus), keep pairs crossing the eval boundary
    # (doc_id % 10 = 0), anti-join train against the contaminated side
    oracles["decontaminate"] = """
        WITH norm AS (
          SELECT doc_id,
                 regexp_split_to_array(
                   regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                   ' ') AS words
          FROM documents
        ), sh AS (
          SELECT DISTINCT doc_id,
                 CASE WHEN len(words) >= 3
                      THEN words[i] || ' ' || words[i+1] || ' '
                           || words[i+2]
                      ELSE array_to_string(words, ' ') END AS shingle
          FROM norm,
               unnest(generate_series(
                 1, greatest(len(words) - 2, 1))) AS t(i)
        ), sizes AS (
          SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
        ), inter AS (
          SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS n_common
          FROM sh l JOIN sh r USING (shingle)
          WHERE l.doc_id < r.doc_id
          GROUP BY 1, 2
        ), pairs AS (
          SELECT a, b FROM inter
          JOIN sizes sa ON sa.doc_id = a
          JOIN sizes sb ON sb.doc_id = b
          WHERE CAST(n_common AS DOUBLE)
                / (sa.n_sh + sb.n_sh - n_common) >= 0.5
        ), contam AS (
          SELECT CASE WHEN a % 10 <> 0 THEN a ELSE b END AS doc_id
          FROM pairs
          WHERE (a % 10 = 0) <> (b % 10 = 0)
        )
        SELECT doc_id FROM documents
        WHERE doc_id % 10 <> 0
          AND doc_id NOT IN (SELECT doc_id FROM contam)
    """
    oracles["video_motion"] = """
        WITH d AS (
          SELECT o_orderkey AS okey,
                 CAST(abs((o_orderkey * 131 + (f * 48 + j) * 7) % 256
                          - (o_orderkey * 131 + ((f - 1) * 48 + j) * 7)
                            % 256) AS DOUBLE) AS ad
          FROM orders,
               unnest(generate_series(1, 5)) AS tf(f),
               unnest(generate_series(0, 47)) AS tj(j)
          WHERE o_orderkey % 4 = 0
        )
        SELECT okey, round(AVG(ad) / 255.0, 6) AS motion
        FROM d GROUP BY okey
    """
    oracles["resample_ffill"] = """
        WITH q AS (
          SELECT user_id, ts, CAST(round(value*100) AS BIGINT) AS cents,
                 event_id
          FROM events
        ), per_ts AS (
          SELECT user_id, ts, arg_max(cents, event_id) AS cents
          FROM q GROUP BY user_id, ts
        ), b AS (
          SELECT user_id,
                 CAST(floor(epoch(min(ts)) / 21600) AS BIGINT) * 21600
                   AS t0,
                 CAST(floor(epoch(max(ts)) / 21600) AS BIGINT) * 21600
                   AS t1
          FROM per_ts GROUP BY user_id
        ), g AS (
          SELECT user_id,
                 unnest(generate_series(t0, t1, 21600)) AS grid_s
          FROM b
        )
        SELECT g.user_id, g.grid_s, p.cents
        FROM g ASOF LEFT JOIN per_ts p
          ON g.user_id = p.user_id
         AND make_timestamp(g.grid_s * 1000000) >= p.ts
    """
    oracles["resample_interp"] = """
        WITH q AS (
          SELECT user_id, ts, CAST(round(value*100) AS BIGINT) AS cents,
                 event_id
          FROM events
        ), per_ts AS (
          SELECT user_id, ts, arg_max(cents, event_id) AS cents
          FROM q GROUP BY user_id, ts
        ), b AS (
          SELECT user_id,
                 CAST(floor(epoch(min(ts)) / 21600) AS BIGINT) * 21600
                   AS t0,
                 CAST(floor(epoch(max(ts)) / 21600) AS BIGINT) * 21600
                   AS t1
          FROM per_ts GROUP BY user_id
        ), g AS (
          SELECT user_id,
                 unnest(generate_series(t0, t1, 21600)) AS grid_s
          FROM b
        ), bk AS (
          SELECT g.user_id, g.grid_s,
                 p.ts AS t_prev, p.cents AS v_prev
          FROM g ASOF LEFT JOIN per_ts p
            ON g.user_id = p.user_id
           AND make_timestamp(g.grid_s * 1000000) >= p.ts
        ), fw AS (
          SELECT bk.user_id, bk.grid_s, bk.t_prev, bk.v_prev,
                 p.ts AS t_next, p.cents AS v_next
          FROM bk ASOF LEFT JOIN per_ts p
            ON bk.user_id = p.user_id
           AND make_timestamp(bk.grid_s * 1000000) <= p.ts
        )
        SELECT user_id, grid_s,
               round(CASE
                 WHEN t_prev IS NULL THEN NULL
                 WHEN t_next IS NULL OR epoch_us(t_next) = epoch_us(t_prev)
                   THEN CAST(v_prev AS DOUBLE)
                 ELSE CAST(v_prev AS DOUBLE)
                      + (CAST(v_next AS DOUBLE) - CAST(v_prev AS DOUBLE))
                        * (CAST(grid_s * 1000000 - epoch_us(t_prev)
                                AS DOUBLE)
                           / CAST(epoch_us(t_next) - epoch_us(t_prev)
                                  AS DOUBLE))
               END, 6) AS v
        FROM fw
    """
    oracles["psi_drift"] = """
        WITH q AS (
          SELECT event_type,
                 least(CAST(round(value*100) AS BIGINT) // 200, 24)
                   AS bucket,
                 CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                      THEN 1 ELSE 0 END AS is_ref
          FROM events
        ), pb AS (
          SELECT event_type, bucket,
                 SUM(is_ref) AS cr, SUM(1 - is_ref) AS cc
          FROM q GROUP BY event_type, bucket
        ), pk AS (
          SELECT event_type,
                 CAST(SUM(cr) AS BIGINT) AS n_ref,
                 CAST(SUM(cc) AS BIGINT) AS n_cur,
                 COUNT(*) AS nb,
                 list_sort(list({'b': bucket, 'cr': cr, 'cc': cc}))
                   AS bl
          FROM pb GROUP BY event_type
        )
        SELECT event_type, n_ref, n_cur,
               round(list_reduce(
                 list_prepend(0.0, list_transform(bl, x ->
                   ((CAST(x.cc AS DOUBLE) + 1.0)
                      / (CAST(n_cur AS DOUBLE) + nb)
                    - (CAST(x.cr AS DOUBLE) + 1.0)
                      / (CAST(n_ref AS DOUBLE) + nb))
                   * ln(((CAST(x.cc AS DOUBLE) + 1.0)
                           / (CAST(n_cur AS DOUBLE) + nb))
                      / ((CAST(x.cr AS DOUBLE) + 1.0)
                           / (CAST(n_ref AS DOUBLE) + nb))))),
                 (acc, x) -> acc + x), 6) AS psi
        FROM pk
    """
    oracles["jsd_drift"] = """
        WITH q AS (
          SELECT event_type,
                 least(CAST(round(value*100) AS BIGINT) // 200, 24)
                   AS bucket,
                 CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                      THEN 1 ELSE 0 END AS is_ref
          FROM events
        ), pb AS (
          SELECT event_type, bucket,
                 SUM(is_ref) AS cr, SUM(1 - is_ref) AS cc
          FROM q GROUP BY event_type, bucket
        ), pk AS (
          SELECT event_type,
                 CAST(SUM(cr) AS BIGINT) AS n_ref,
                 CAST(SUM(cc) AS BIGINT) AS n_cur,
                 COUNT(*) AS nb,
                 list_sort(list({'b': bucket, 'cr': cr, 'cc': cc}))
                   AS bl
          FROM pb GROUP BY event_type
        )
        SELECT event_type, n_ref, n_cur,
               round(list_reduce(
                 list_prepend(0.0, list_transform(bl, x ->
                   0.5 * (((CAST(x.cr AS DOUBLE) + 1.0)
                             / (CAST(n_ref AS DOUBLE) + nb))
                          * ln(((CAST(x.cr AS DOUBLE) + 1.0)
                                  / (CAST(n_ref AS DOUBLE) + nb))
                             / ((((CAST(x.cr AS DOUBLE) + 1.0)
                                    / (CAST(n_ref AS DOUBLE) + nb))
                                 + ((CAST(x.cc AS DOUBLE) + 1.0)
                                    / (CAST(n_cur AS DOUBLE) + nb)))
                                / 2.0)))
                   + 0.5 * (((CAST(x.cc AS DOUBLE) + 1.0)
                               / (CAST(n_cur AS DOUBLE) + nb))
                            * ln(((CAST(x.cc AS DOUBLE) + 1.0)
                                    / (CAST(n_cur AS DOUBLE) + nb))
                               / ((((CAST(x.cr AS DOUBLE) + 1.0)
                                      / (CAST(n_ref AS DOUBLE) + nb))
                                   + ((CAST(x.cc AS DOUBLE) + 1.0)
                                      / (CAST(n_cur AS DOUBLE) + nb)))
                                  / 2.0))))),
                 (acc, x) -> acc + x), 6) AS jsd
        FROM pk
    """
    oracles["rolling_mad"] = """
        WITH q AS (
          SELECT event_id, user_id,
                 CAST(round(value*100) AS BIGINT) AS cents,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us
          FROM events
        ), m AS (
          SELECT event_id, cents,
                 quantile_cont(cents, 0.5) OVER b AS med,
                 mad(cents) OVER b AS madv
          FROM q
          WINDOW b AS (PARTITION BY user_id ORDER BY us
                       RANGE BETWEEN 86400000000 PRECEDING
                                 AND CURRENT ROW)
        )
        SELECT event_id,
               round(med, 6) AS med,
               round(madv, 6) AS mad,
               round(CASE WHEN madv > 0.0
                          THEN (CAST(cents AS DOUBLE) - med)
                               / (1.4826 * madv) END, 6) AS rz
        FROM m
    """
    # pagerank: replay the integer fixed-point iterations as unrolled
    # CTEs — same DIV/sum arithmetic, bit-identical BIGINT ranks
    _pr_iters = 5
    _pr = [
        "d0 AS (SELECT l_orderkey*2 AS src, l_partkey*2+1 AS dst"
        " FROM lineitem)",
        "e AS (SELECT src, dst FROM d0 UNION SELECT dst, src FROM d0)",
        "deg AS (SELECT src AS node, count(*) AS deg FROM e"
        " GROUP BY src)",
        "r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM deg)",
    ]
    for _i in range(1, _pr_iters + 1):
        _pr.append(
            f"r{_i} AS (SELECT e.dst AS node, "
            f"CAST(150000000 + (17 * sum(r{_i-1}.r // deg.deg)) // 20 "
            f"AS BIGINT) AS r "
            f"FROM e JOIN r{_i-1} ON e.src = r{_i-1}.node "
            f"JOIN deg ON e.src = deg.node GROUP BY e.dst)")
    oracles["pagerank"] = ("WITH " + ",\n".join(_pr)
                           + f"\nSELECT node, r FROM r{_pr_iters}")
    # hits: same unrolled-CTE discipline; totals via sum() OVER () so
    # every CTE is referenced exactly once (DuckDB inlines CTEs — a
    # twice-referenced iteration CTE expands exponentially)
    _hs = 1_000_000_000
    _hits_iters = 4
    _hp = [
        "e AS (SELECT DISTINCT l_orderkey*2 AS src,"
        " l_partkey*2+1 AS dst FROM lineitem)",
        f"h0 AS (SELECT DISTINCT src AS node,"
        f" CAST({_hs} AS BIGINT) AS s FROM e)",
    ]
    for _i in range(1, _hits_iters + 1):
        _hp.append(
            f"ra{_i} AS (SELECT e.dst AS node,"
            f" CAST(sum(h{_i-1}.s) AS BIGINT) AS raw"
            f" FROM e JOIN h{_i-1} ON e.src = h{_i-1}.node"
            f" GROUP BY e.dst)")
        _hp.append(
            f"a{_i} AS (SELECT node, CAST(raw // greatest("
            f"CAST(sum(raw) OVER () AS BIGINT) // {_hs}, 1)"
            f" AS BIGINT) AS s FROM ra{_i})")
        _hp.append(
            f"rh{_i} AS (SELECT e.src AS node,"
            f" CAST(sum(a{_i}.s) AS BIGINT) AS raw"
            f" FROM e JOIN a{_i} ON e.dst = a{_i}.node"
            f" GROUP BY e.src)")
        _hp.append(
            f"h{_i} AS (SELECT node, CAST(raw // greatest("
            f"CAST(sum(raw) OVER () AS BIGINT) // {_hs}, 1)"
            f" AS BIGINT) AS s FROM rh{_i})")
    oracles["hits"] = (
        "WITH " + ",\n".join(_hp)
        + f"\nSELECT node, 'hub' AS kind, s AS score"
          f" FROM h{_hits_iters}"
        + f"\nUNION ALL SELECT node, 'auth' AS kind, s AS score"
          f" FROM a{_hits_iters}")
    oracles["horizon_label"] = """
        WITH ex AS (
          SELECT event_id, user_id, epoch_us(ts) AS us,
                 event_type = 'purchase' AS pos
          FROM events
        ), w AS (
          SELECT event_id, us,
                 min(CASE WHEN pos THEN us END) OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN 1 FOLLOWING
                            AND UNBOUNDED FOLLOWING) AS next_q,
                 max(us) OVER (PARTITION BY user_id) AS last_us
          FROM ex
        )
        SELECT event_id,
               CAST(CASE
                 WHEN next_q IS NOT NULL
                      AND next_q - us <= 86400000000 THEN 1
                 WHEN last_us - us >= 86400000000 THEN 0
                 ELSE NULL END AS INTEGER) AS label,
               round(CASE WHEN next_q IS NOT NULL
                           AND next_q - us <= 86400000000
                     THEN CAST(next_q - us AS DOUBLE) / 1e6
                     END, 6) AS tte_seconds,
               CAST(CASE WHEN (next_q IS NOT NULL
                               AND next_q - us <= 86400000000)
                          OR last_us - us >= 86400000000
                     THEN 0 ELSE 1 END AS INTEGER) AS censored
        FROM w
    """
    oracles["snapshot_rollback"] = """
        SELECT doc_id, CAST(length(text) AS INTEGER) AS text_len
        FROM documents WHERE doc_id < 100
    """
    oracles["audio_segments"] = """
        WITH samples AS (
          SELECT vec_id, i,
                 CAST(round(greatest(least(CAST(embedding[i]
                      AS DOUBLE), 1.0), -1.0) * 32767) AS BIGINT) AS s
          FROM embeddings,
               unnest(generate_series(1, len(embedding))) AS t(i)
        ), fr AS (
          SELECT vec_id, CAST((i - 1) // 16 AS BIGINT) AS f,
                 CAST(sum(s * s) AS BIGINT) AS e
          FROM samples GROUP BY vec_id, (i - 1) // 16
        ), act AS (
          SELECT vec_id, f, e,
                 f - row_number() OVER (PARTITION BY vec_id
                                        ORDER BY f) AS grp
          FROM fr WHERE e > 260000000
        ), segs AS (
          SELECT vec_id, grp,
                 CAST(min(f) AS INTEGER) AS start_frame,
                 CAST(max(f) AS INTEGER) AS end_frame,
                 CAST(count(*) AS INTEGER) AS n_frames,
                 CAST(sum(e) AS BIGINT) AS energy_sum
          FROM act GROUP BY vec_id, grp
        )
        SELECT vec_id,
               CAST(row_number() OVER (PARTITION BY vec_id
                    ORDER BY start_frame) - 1 AS INTEGER) AS seg,
               start_frame, end_frame, n_frames, energy_sum
        FROM segs
    """
    oracles["srm_check"] = """
        WITH c AS (
          SELECT CAST(sum(CASE WHEN user_id % 5 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS nt,
                 CAST(sum(CASE WHEN user_id % 5 = 0 THEN 0 ELSE 1 END)
                      AS BIGINT) AS nc
          FROM events
        ), s AS (
          SELECT nt, nc,
                 (CAST(nt AS DOUBLE) - (CAST(nt AS DOUBLE)
                    + CAST(nc AS DOUBLE)) * 0.5)
                 * (CAST(nt AS DOUBLE) - (CAST(nt AS DOUBLE)
                    + CAST(nc AS DOUBLE)) * 0.5)
                 / ((CAST(nt AS DOUBLE) + CAST(nc AS DOUBLE)) * 0.5)
                 + (CAST(nc AS DOUBLE) - (CAST(nt AS DOUBLE)
                    + CAST(nc AS DOUBLE)) * 0.5)
                 * (CAST(nc AS DOUBLE) - (CAST(nt AS DOUBLE)
                    + CAST(nc AS DOUBLE)) * 0.5)
                 / ((CAST(nt AS DOUBLE) + CAST(nc AS DOUBLE)) * 0.5)
                   AS chi2
          FROM c
        ), e AS (
          SELECT nt, nc, chi2, sqrt(chi2 / 2.0) AS x,
                 1.0 / (1.0 + 0.3275911 * sqrt(chi2 / 2.0)) AS t
          FROM s
        )
        SELECT nt AS n_treat, nc AS n_ctrl, 0.5 AS expected_p,
               round(chi2, 6) AS chi2,
               round((t * (0.254829592
                     + t * (-0.284496736
                     + t * (1.421413741
                     + t * (-1.453152027 + t * 1.061405429)))))
                     * exp(-(x * x)), 9) AS p_value
        FROM e
    """
    # quantile_cont needs CONSTANT q in DuckDB -> one branch per decile
    _qte_parts = []
    for _q in [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]:
        _qte_parts.append(f"""
        SELECT round({_q}, 2) AS q,
               round((SELECT quantile_cont(value, {_q}) FROM events
                      WHERE user_id % 2 = 0), 6) AS y_ctrl,
               round((SELECT quantile_cont(value, {_q}) FROM events
                      WHERE user_id % 2 = 1), 6) AS y_treat,
               round((SELECT quantile_cont(value, {_q}) FROM events
                      WHERE user_id % 2 = 1)
                     - (SELECT quantile_cont(value, {_q}) FROM events
                        WHERE user_id % 2 = 0), 6) AS qte""")
    oracles["qte"] = "\n        UNION ALL".join(_qte_parts)
    _ks_series = " + ".join(
        f"({1.0 if _k % 2 == 1 else -1.0}) * exp(({-2.0 * _k * _k})"
        f" * lam * lam)" for _k in range(1, 21))
    oracles["ks_test"] = f"""
        WITH q AS (
          SELECT CAST(round(value*100) AS BIGINT) AS cents,
                 CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 1 ELSE 0
                 END AS r
          FROM events
        ), per AS (
          SELECT cents,
                 CAST(sum(r) AS BIGINT) AS a,
                 CAST(count(*) - sum(r) AS BIGINT) AS b
          FROM q GROUP BY cents
        ), t AS (
          SELECT cents,
                 abs(sum(a) OVER w / (sum(a) OVER () * 1.0)
                     - sum(b) OVER w / (sum(b) OVER () * 1.0)) AS gap,
                 sum(a) OVER () AS na,
                 sum(b) OVER () AS nb
          FROM per
          WINDOW w AS (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)
        ), m AS (
          SELECT *, max(gap) OVER () AS best FROM t
        ), s AS (
          SELECT max(best) AS ks,
                 CAST(min(cents) AS BIGINT) AS at_value,
                 CAST(max(na) AS BIGINT) AS n_ref,
                 CAST(max(nb) AS BIGINT) AS n_cur
          FROM m WHERE gap = best
        ), lamt AS (
          SELECT ks, at_value, n_ref, n_cur,
                 (sqrt(CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE)
                       / CAST(n_ref + n_cur AS DOUBLE))
                  + 0.12
                  + 0.11 / sqrt(CAST(n_ref AS DOUBLE)
                                * CAST(n_cur AS DOUBLE)
                                / CAST(n_ref + n_cur AS DOUBLE)))
                 * ks AS lam
          FROM s
        )
        SELECT round(ks, 6) AS ks, at_value, n_ref, n_cur,
               round(lam, 6) AS lam,
               round(CASE WHEN lam < 0.25 THEN 1.0
                     ELSE least(1.0, greatest(0.0,
                          2.0 * (0.0 + {_ks_series}))) END, 6)
                 AS p_value
        FROM lamt
    """
    oracles["diff_in_diff"] = """
        WITH base AS (
          SELECT user_id AS u, user_id % 2 AS t,
                 CASE WHEN ts >= TIMESTAMP '2024-01-16'
                      THEN 1 ELSE 0 END AS p,
                 CAST(round(value*100) AS BIGINT) AS cents
          FROM events
        ), pu AS (
          SELECT u, t, p,
                 CAST(sum(cents) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS m
          FROM base GROUP BY u, t, p
        ), cells AS (
          SELECT t, p,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list_transform(
                       list({'u': u, 'm': m} ORDER BY u, m),
                       x -> x.m)),
                   (acc, v) -> acc + v)
                 / CAST(count(*) AS DOUBLE) AS cm,
                 CAST(count(*) AS BIGINT) AS n_units
          FROM pu GROUP BY t, p
        ), w AS (
          SELECT
            max(CASE WHEN t=0 AND p=0 THEN cm END) AS ctrl_pre,
            max(CASE WHEN t=0 AND p=1 THEN cm END) AS ctrl_post,
            max(CASE WHEN t=1 AND p=0 THEN cm END) AS treat_pre,
            max(CASE WHEN t=1 AND p=1 THEN cm END) AS treat_post,
            max(CASE WHEN t=0 AND p=0 THEN n_units END) AS n_ctrl_pre,
            max(CASE WHEN t=0 AND p=1 THEN n_units END) AS n_ctrl_post,
            max(CASE WHEN t=1 AND p=0 THEN n_units END) AS n_treat_pre,
            max(CASE WHEN t=1 AND p=1 THEN n_units END) AS n_treat_post
          FROM cells
        )
        SELECT round(ctrl_pre, 6) AS ctrl_pre,
               round(ctrl_post, 6) AS ctrl_post,
               round(treat_pre, 6) AS treat_pre,
               round(treat_post, 6) AS treat_post,
               n_ctrl_pre, n_ctrl_post, n_treat_pre, n_treat_post,
               round((treat_post - treat_pre)
                     - (ctrl_post - ctrl_pre), 6) AS did
        FROM w
    """
    oracles["fk_audit"] = """
        WITH fact AS (
          SELECT CASE WHEN l_orderkey % 101 = 0 THEN NULL
                      WHEN l_orderkey % 97 = 0
                        THEN l_partkey + 1000000
                      ELSE l_partkey END AS fk
          FROM lineitem
        ), s AS (
          SELECT CAST(count(*) AS BIGINT) AS n_fact,
                 CAST(sum(CASE WHEN fk IS NULL THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_null_fk,
                 CAST(sum(CASE WHEN fk IS NOT NULL AND fk NOT IN
                        (SELECT p_partkey FROM part)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan,
                 CAST(count(DISTINCT CASE WHEN fk IS NOT NULL
                        AND fk NOT IN (SELECT p_partkey FROM part)
                      THEN fk END) AS BIGINT) AS n_orphan_keys
          FROM fact
        )
        SELECT n_fact, n_null_fk, n_orphan, n_orphan_keys,
               round(CAST(n_orphan AS DOUBLE)
                     / CAST(n_fact AS DOUBLE), 6) AS orphan_rate
        FROM s
    """
    oracles["vocab_drift"] = """
        WITH rt AS (
          SELECT DISTINCT unnest(regexp_split_to_array(
                   trim(lower(text)), '\\s+')) AS tok
          FROM documents WHERE doc_id % 2 = 0 AND trim(text) <> ''
        ), ct AS (
          SELECT tok, CAST(count(*) AS BIGINT) AS occ FROM (
            SELECT unnest(regexp_split_to_array(
                     trim(lower(text)), '\\s+')) AS tok
            FROM documents WHERE doc_id % 2 = 1 AND trim(text) <> '')
          GROUP BY tok
        ), s AS (
          SELECT (SELECT CAST(count(*) AS BIGINT) FROM rt) AS vr,
                 (SELECT CAST(count(*) AS BIGINT) FROM ct) AS vc,
                 (SELECT CAST(count(*) AS BIGINT) FROM ct
                  WHERE tok IN (SELECT tok FROM rt)) AS common,
                 (SELECT CAST(coalesce(sum(occ), 0) AS BIGINT)
                  FROM ct WHERE tok NOT IN (SELECT tok FROM rt))
                   AS oov,
                 (SELECT CAST(sum(occ) AS BIGINT) FROM ct) AS tot
        )
        SELECT vr AS vocab_ref, vc AS vocab_cand,
               common AS vocab_common, oov AS oov_tokens,
               tot AS cand_tokens,
               round(CAST(common AS DOUBLE)
                     / CAST(vr + vc - common AS DOUBLE), 6)
                 AS vocab_jaccard,
               round(CAST(oov AS DOUBLE) / CAST(tot AS DOUBLE), 6)
                 AS oov_rate
        FROM s
    """
    oracles["mase_backtest"] = """
        WITH daily AS (
          SELECT user_id AS e, date_trunc('day', ts) AS b,
                 CAST(sum(CAST(round(value*100) AS BIGINT))
                      AS BIGINT) AS v
          FROM events GROUP BY user_id, date_trunc('day', ts)
        ), lagged AS (
          SELECT e, v,
                 lag(v, 7) OVER (PARTITION BY e ORDER BY b) AS lag_s,
                 lag(v, 1) OVER (PARTITION BY e ORDER BY b) AS lag_1
          FROM daily
        ), per AS (
          SELECT e,
                 CAST(count(lag_s) AS BIGINT) AS n_scored,
                 CAST(sum(CASE WHEN lag_s IS NOT NULL
                               THEN abs(v - lag_s) END) AS BIGINT)
                   AS sum_abs_err,
                 CAST(count(lag_1) AS BIGINT) AS n_diff,
                 CAST(sum(CASE WHEN lag_1 IS NOT NULL
                               THEN abs(v - lag_1) END) AS BIGINT)
                   AS sum_abs_naive
          FROM lagged GROUP BY e
        )
        SELECT e AS user_id, n_scored, sum_abs_err, sum_abs_naive,
               round((CAST(sum_abs_err AS DOUBLE)
                      / CAST(n_scored AS DOUBLE))
                     / (CAST(sum_abs_naive AS DOUBLE)
                        / CAST(n_diff AS DOUBLE)), 6) AS mase
        FROM per
        WHERE n_scored > 0 AND sum_abs_naive > 0
    """
    oracles["decayed_count"] = """
        WITH ex AS (
          SELECT event_id, user_id, epoch_us(ts) AS us FROM events
        ), lw AS (
          SELECT event_id, user_id, us,
                 list_sort(list(us) OVER (
                   PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN 864000000000 PRECEDING
                             AND 1 PRECEDING)) AS lst
          FROM ex
        )
        SELECT event_id, user_id,
               round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                       list_transform(lst,
                         x -> pow(2.0, (CAST(x AS DOUBLE)
                                        - CAST(us AS DOUBLE))
                                       / 21600000000.0))),
                     (acc, t) -> acc + t), 6) AS score
        FROM lw
    """
    oracles["leakage_scan"] = """
        WITH base AS (
          SELECT CASE WHEN event_type IN ('purchase','signup')
                      THEN 1 ELSE 0 END AS y,
                 abs(CAST(round(value*100) AS BIGINT)) AS cents,
                 hour(ts) AS hr, user_id
          FROM events
        ), melted AS (
          SELECT y, 'f_cents' AS f,
                 CAST(cents % 1000 AS DOUBLE) AS v FROM base
          UNION ALL
          SELECT y, 'f_hour', CAST(hr AS DOUBLE) FROM base
          UNION ALL
          SELECT y, 'f_user', CAST(user_id % 10 AS DOUBLE) FROM base
          UNION ALL
          SELECT y, 'f_leak',
                 CAST((cents % 3) + y * 100 AS DOUBLE) FROM base
        ), per AS (
          SELECT f, v, CAST(sum(y) AS BIGINT) AS pos,
                 CAST(count(*) - sum(y) AS BIGINT) AS neg
          FROM melted WHERE v IS NOT NULL GROUP BY f, v
        ), c AS (
          SELECT f, v, pos, neg,
                 CAST(coalesce(sum(neg) OVER (PARTITION BY f
                   ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS neg_below
          FROM per
        )
        SELECT f AS feature,
               round((CAST(sum(neg_below * pos) AS DOUBLE)
                      + CAST(sum(pos * neg) AS DOUBLE) / 2.0)
                     / (CAST(sum(pos) AS DOUBLE)
                        * CAST(sum(neg) AS DOUBLE)), 6) AS auc,
               CAST(sum(pos) AS BIGINT) AS n_pos,
               CAST(sum(neg) AS BIGINT) AS n_neg,
               count(*) AS n_distinct
        FROM c GROUP BY f
    """
    oracles["ssim_neardup"] = """
        WITH keys AS (
          SELECT o_orderkey AS okey,
                 (o_orderkey % 500) + 15 * (o_orderkey // 500) AS k2,
                 13 + 2 * ((o_orderkey % 500) % 23) AS step
          FROM orders WHERE o_orderkey <= 3000
        ), gray AS (
          SELECT okey, y, x,
                 (SELECT sum((k2 * 7919
                              + ((y*8 + least(CAST(floor((x + 0.5)
                                   * 8.0 / 9.0) AS BIGINT), 7))*3
                                 + c) * step) % 256)
                  FROM unnest(generate_series(0, 2)) AS tc(c)) AS g
          FROM keys,
               unnest(generate_series(0, 7)) AS ty(y),
               unnest(generate_series(0, 8)) AS tx(x)
        ), bits AS (
          SELECT a.okey, a.y, a.x,
                 CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
          FROM gray a JOIN gray b
            ON a.okey = b.okey AND a.y = b.y AND b.x = a.x + 1
          WHERE a.x < 8
        ), h AS (
          SELECT okey,
                 CAST(sum(CASE WHEN y < 4
                               THEN bit * (1::BIGINT << (y*8 + x))
                               ELSE 0 END) AS BIGINT) AS lo,
                 CAST(sum(CASE WHEN y >= 4
                               THEN bit * (1::BIGINT << ((y-4)*8 + x))
                               ELSE 0 END) AS BIGINT) AS hi
          FROM bits GROUP BY okey
        ), cand AS (
          SELECT a.okey AS pa, b.okey AS pb
          FROM h a JOIN h b
            ON a.okey < b.okey
           AND (a.lo = b.lo OR a.hi = b.hi)
          WHERE bit_count(xor(a.lo, b.lo))
                + bit_count(xor(a.hi, b.hi)) <= 6
        ), px8 AS (
          SELECT okey, j.range AS j,
                 CAST(((j.range // 8) // 4) AS INTEGER) AS ti,
                 CAST(((j.range % 8) // 4) AS INTEGER) AS tj,
                 CAST((k2 * 7919 + (3*j.range + 0) * step) % 256
                   + (k2 * 7919 + (3*j.range + 1) * step) % 256
                   + (k2 * 7919 + (3*j.range + 2) * step) % 256
                   AS BIGINT) AS g
          FROM keys, range(64) j
        ), pairpx AS (
          SELECT c.pa, c.pb, a.ti, a.tj, a.g AS ga, b.g AS gb
          FROM cand c
          JOIN px8 a ON a.okey = c.pa
          JOIN px8 b ON b.okey = c.pb AND b.j = a.j
        ), tiles AS (
          SELECT pa, pb, ti, tj,
                 CAST(sum(ga) AS BIGINT) AS sx,
                 CAST(sum(gb) AS BIGINT) AS sy,
                 CAST(sum(ga*ga) AS BIGINT) AS sxx,
                 CAST(sum(gb*gb) AS BIGINT) AS syy,
                 CAST(sum(ga*gb) AS BIGINT) AS sxy
          FROM pairpx GROUP BY pa, pb, ti, tj
        ), tscore AS (
          SELECT pa, pb, ti, tj,
                 (2.0 * (CAST(sx AS DOUBLE)/16.0)
                      * (CAST(sy AS DOUBLE)/16.0) + 58.5225)
                 * (2.0 * (CAST(sxy AS DOUBLE)/16.0
                           - (CAST(sx AS DOUBLE)/16.0)
                             * (CAST(sy AS DOUBLE)/16.0)) + 526.7025)
                 / (((CAST(sx AS DOUBLE)/16.0)
                       * (CAST(sx AS DOUBLE)/16.0)
                     + (CAST(sy AS DOUBLE)/16.0)
                       * (CAST(sy AS DOUBLE)/16.0) + 58.5225)
                    * ((CAST(sxx AS DOUBLE)/16.0
                        - (CAST(sx AS DOUBLE)/16.0)
                          * (CAST(sx AS DOUBLE)/16.0))
                       + (CAST(syy AS DOUBLE)/16.0
                          - (CAST(sy AS DOUBLE)/16.0)
                            * (CAST(sy AS DOUBLE)/16.0)) + 526.7025))
                   AS ssim
          FROM tiles
        ), agg AS (
          SELECT pa, pb,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list(ssim ORDER BY ti, tj)),
                   (acc, v) -> acc + v) / 4.0 AS mean_ssim
          FROM tscore GROUP BY pa, pb
        )
        SELECT pa, pb, round(mean_ssim, 6) AS mean_ssim
        FROM agg WHERE mean_ssim >= 0.5
    """
    oracles["avg_precision"] = """
        WITH base AS (
          SELECT abs(CAST(round(value*100) AS BIGINT)) % 1000 AS s,
                 CASE WHEN event_type IN ('purchase','signup')
                      THEN 1 ELSE 0 END AS y
          FROM events
        ), per AS (
          SELECT s, CAST(sum(y) AS BIGINT) AS pos,
                 CAST(count(*) - sum(y) AS BIGINT) AS neg
          FROM base GROUP BY s
        ), cum AS (
          SELECT s, pos, neg,
                 CAST(sum(pos) OVER (ORDER BY s DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS tp,
                 CAST(sum(neg) OVER (ORDER BY s DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS fp
          FROM per
        ), t AS (
          SELECT s,
                 (CAST(pos AS DOUBLE) * CAST(tp AS DOUBLE))
                   / CAST(tp + fp AS DOUBLE) AS term
          FROM cum
        )
        SELECT round(
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     (SELECT list(term ORDER BY s) FROM t)),
                   (acc, x) -> acc + x)
                 / CAST((SELECT sum(pos) FROM per) AS DOUBLE), 6)
                 AS ap,
               CAST((SELECT sum(pos) FROM per) AS BIGINT) AS n_pos,
               CAST((SELECT sum(neg) FROM per) AS BIGINT) AS n_neg
    """
    # platt: unrolled Newton CTEs; every CTE referenced exactly once
    # (a, b, t+, t- carried through each sums CTE)
    _pl_parts = [
        """base AS (
          SELECT (abs(CAST(round(value*100) AS BIGINT)) % 1000)
                   / 1000.0 AS s,
                 CASE WHEN event_type IN ('purchase','signup')
                      THEN 1 ELSE 0 END AS y
          FROM events)""",
        """cnt AS (
          SELECT CAST(sum(y) AS BIGINT) AS np,
                 CAST(sum(1 - y) AS BIGINT) AS nn
          FROM base)""",
        """p0 AS (
          SELECT 0.0 AS a, ln((nn + 1.0) / (np + 1.0)) AS b,
                 (np + 1.0) / (np + 2.0) AS tp,
                 1.0 / (nn + 2.0) AS tn, np, nn
          FROM cnt)""",
    ]
    for _i in range(1, 4):
        _pl_parts.append(f"""s{_i} AS (
          SELECT min(a) AS a, min(b) AS b, min(tp) AS tp,
                 min(tn) AS tn, min(np) AS np, min(nn) AS nn,
          CAST(sum(CAST(floor(((1.0/(1.0+exp(-(a*s+b))))
            - CASE WHEN y=1 THEN tp ELSE tn END) * s
            * 1000000000000.0) AS BIGINT)) AS BIGINT) AS g1,
          CAST(sum(CAST(floor(((1.0/(1.0+exp(-(a*s+b))))
            - CASE WHEN y=1 THEN tp ELSE tn END)
            * 1000000000000.0) AS BIGINT)) AS BIGINT) AS g0,
          CAST(sum(CAST(floor((1.0/(1.0+exp(-(a*s+b))))
            * (1.0 - (1.0/(1.0+exp(-(a*s+b))))) * s * s
            * 1000000000000.0) AS BIGINT)) AS BIGINT) AS h2,
          CAST(sum(CAST(floor((1.0/(1.0+exp(-(a*s+b))))
            * (1.0 - (1.0/(1.0+exp(-(a*s+b))))) * s
            * 1000000000000.0) AS BIGINT)) AS BIGINT) AS h1,
          CAST(sum(CAST(floor((1.0/(1.0+exp(-(a*s+b))))
            * (1.0 - (1.0/(1.0+exp(-(a*s+b)))))
            * 1000000000000.0) AS BIGINT)) AS BIGINT) AS h0
          FROM base CROSS JOIN p{_i-1})""")
        _pl_parts.append(f"""p{_i} AS (
          SELECT a - ((CAST(h0 AS DOUBLE)/1000000000000.0)
                        * (CAST(g1 AS DOUBLE)/1000000000000.0)
                      - (CAST(h1 AS DOUBLE)/1000000000000.0)
                        * (CAST(g0 AS DOUBLE)/1000000000000.0))
                     / ((CAST(h2 AS DOUBLE)/1000000000000.0)
                          * (CAST(h0 AS DOUBLE)/1000000000000.0)
                        - (CAST(h1 AS DOUBLE)/1000000000000.0)
                          * (CAST(h1 AS DOUBLE)/1000000000000.0))
                   AS a,
                 b - ((CAST(h2 AS DOUBLE)/1000000000000.0)
                        * (CAST(g0 AS DOUBLE)/1000000000000.0)
                      - (CAST(h1 AS DOUBLE)/1000000000000.0)
                        * (CAST(g1 AS DOUBLE)/1000000000000.0))
                     / ((CAST(h2 AS DOUBLE)/1000000000000.0)
                          * (CAST(h0 AS DOUBLE)/1000000000000.0)
                        - (CAST(h1 AS DOUBLE)/1000000000000.0)
                          * (CAST(h1 AS DOUBLE)/1000000000000.0))
                   AS b,
                 tp, tn, np, nn
          FROM s{_i})""")
    oracles["platt"] = (
        "WITH " + ",\n".join(_pl_parts)
        + "\nSELECT round(a, 6) AS a, round(b, 6) AS b,"
          " np AS n_pos, nn AS n_neg FROM p3")
    oracles["mutual_knn"] = """
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings WHERE vec_id < 120
        ), pairs AS (
          SELECT p.vec_id AS probe_id, e.vec_id,
                 list_dot_product(p.v, e.v)
                   / (sqrt(list_dot_product(p.v, p.v))
                      * sqrt(list_dot_product(e.v, e.v))) AS cos
          FROM e p, e
          WHERE p.vec_id <> e.vec_id
        ), topk AS (
          SELECT probe_id, vec_id, cos FROM (
            SELECT probe_id, vec_id, cos,
                   row_number() OVER (PARTITION BY probe_id
                                      ORDER BY cos DESC,
                                               vec_id ASC) AS rk
            FROM pairs)
          WHERE rk <= 5
        )
        SELECT t.probe_id AS a, t.vec_id AS b,
               round(t.cos, 6) AS cos_sim
        FROM topk t
        JOIN topk r ON r.probe_id = t.vec_id
                   AND r.vec_id = t.probe_id
        WHERE t.probe_id < t.vec_id
    """
    oracles["weighted_sample"] = """
        WITH d AS (
          SELECT doc_id, doc_id % 7 AS grp,
                 CAST(length(text) + 1 AS BIGINT) AS wt
          FROM documents
        ), keyed AS (
          SELECT grp, doc_id, wt,
                 ln((list_reduce(
                       list_prepend(CAST(5 AS BIGINT),
                         list_transform(
                           str_split(CAST(doc_id AS VARCHAR), ''),
                           x -> CAST(ascii(x) AS BIGINT))),
                       (acc, x) -> (acc * 31 + x) % 2147483647)
                     + 1) / 2147483648.0)
                 / CAST(wt AS DOUBLE) AS es_key
          FROM d WHERE wt > 0
        ), r AS (
          SELECT grp, doc_id, wt, es_key,
                 row_number() OVER (PARTITION BY grp
                                    ORDER BY es_key DESC,
                                             doc_id ASC) AS rk
          FROM keyed
        )
        SELECT grp, CAST(rk AS INTEGER) AS rk, doc_id, wt,
               round(es_key, 6) AS es_key
        FROM r WHERE rk <= 10
    """
    oracles["embedding_profile"] = """
        WITH n AS (SELECT count(*) AS n FROM embeddings),
        j AS (
          SELECT e.event_id, e.user_id, epoch_us(e.ts) AS us,
                 em.embedding
          FROM events e CROSS JOIN n
          JOIN embeddings em ON em.vec_id = e.event_id % n.n
        ), ex AS (
          SELECT event_id, user_id, us,
                 generate_subscripts(embedding, 1) - 1 AS dim,
                 CAST(unnest(embedding) AS DOUBLE) AS v
          FROM j
        ), w AS (
          SELECT event_id, user_id, dim,
                 sum(v) OVER (PARTITION BY user_id, dim
                              ORDER BY us, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS s,
                 count(v) OVER (PARTITION BY user_id, dim
                                ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS c
          FROM ex
        )
        SELECT event_id, user_id, CAST(c AS BIGINT) AS n_prior,
               CAST(dim AS INTEGER) AS dim,
               round(s / c, 6) AS prior_mean
        FROM w WHERE event_id % 16 = 0 AND c > 0
    """
    oracles["bloom_semi_join"] = """
        SELECT l_orderkey, l_linenumber,
               CAST(l_quantity AS BIGINT) AS qty
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                             WHERE o_orderpriority = '1-URGENT')
    """
    # geohash: replay the exact floor + bit-interleave arithmetic
    from hiselspark.operators.spatial import geohash_sql as _gh_sql
    oracles["geohash_encode"] = f"""
        WITH p AS (
          SELECT event_id,
                 -80.0  + ((event_id * 7919)   % 160000000) / 1e6
                   AS lat,
                 -180.0 + ((event_id * 104729) % 360000000) / 1e6
                   AS lon
          FROM events
        )
        SELECT event_id,
               {_gh_sql('lat', 'lon', 6)} AS gh6,
               {_gh_sql('lat', 'lon', 2)} AS gh2
        FROM p
    """
    # spatial_join: BRUTE-FORCE cross join — independent of the grid
    # plan, so it proves the 3x3-cell candidate join drops no pair
    oracles["spatial_join"] = """
        WITH p AS (
          SELECT event_id,
                 40.0  + ((event_id * 7919)   % 2000000) / 1e6 AS lat,
                 -74.0 + ((event_id * 104729) % 3000000) / 1e6 AS lon
          FROM events
        ), h AS (
          SELECT event_id AS hub_id, lat AS hlat, lon AS hlon
          FROM p WHERE event_id % 199 = 0
        ), d AS (
          SELECT hub_id, event_id,
                 2.0 * 6371000.0 * asin(sqrt(
                   sin(radians(lat - hlat) / 2.0)
                     * sin(radians(lat - hlat) / 2.0)
                   + cos(radians(hlat)) * cos(radians(lat))
                     * sin(radians(lon - hlon) / 2.0)
                     * sin(radians(lon - hlon) / 2.0))) AS dist_m
          FROM h, p
        )
        SELECT hub_id, event_id, round(dist_m, 2) AS dist_m
        FROM d WHERE dist_m <= 10000.0
    """
    oracles["tpch_q5"] = """
        SELECT n_name,
               CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                        * (10000 - CAST(round(l_discount*10000)
                                        AS BIGINT))) AS BIGINT)
                 AS revenue_e6,
               count(*) AS n_items
        FROM region, nation, customer, orders, lineitem, supplier
        WHERE r_name = 'ASIA'
          AND n_regionkey = r_regionkey
          AND c_nationkey = n_nationkey
          AND o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
          AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey
          AND s_nationkey = c_nationkey
        GROUP BY n_name
    """
    oracles["tpch_q13"] = """
        WITH per AS (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey
                          AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey
        )
        SELECT CAST(c_count AS BIGINT) AS c_count,
               count(*) AS custdist
        FROM per GROUP BY c_count
    """
    oracles["tpch_q17"] = """
        WITH sel AS (
          SELECT p_partkey FROM part
          WHERE p_brand = 'Brand#12' AND p_size < 15
        ), qli AS (
          SELECT l_partkey,
                 CAST(round(l_quantity) AS BIGINT) AS qty,
                 CAST(round(l_extendedprice*100) AS BIGINT) AS cents
          FROM lineitem
        ), a AS (
          SELECT l_partkey,
                 CAST(sum(qty) AS BIGINT) AS sum_qty,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM qli JOIN sel ON l_partkey = p_partkey
          GROUP BY l_partkey
        )
        SELECT CAST(sum(q.cents) AS BIGINT) AS sum_cents,
               count(*) AS n_items
        FROM qli q JOIN a USING (l_partkey)
        WHERE 5 * q.qty * a.cnt < a.sum_qty
    """
    oracles["tpch_q19"] = """
        SELECT CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                        * (10000 - CAST(round(l_discount*10000)
                                        AS BIGINT))) AS BIGINT)
                 AS revenue_e6,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND CAST(round(l_quantity) AS BIGINT) BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND CAST(round(l_quantity) AS BIGINT) BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND CAST(round(l_quantity) AS BIGINT) BETWEEN 20 AND 30)
    """
    oracles["tpch_q22"] = """
        WITH c AS (
          SELECT c_custkey, c_custkey % 7 AS cntry,
                 CAST(round(c_acctbal*100) AS BIGINT) AS cents
          FROM customer WHERE c_custkey % 7 IN (1, 3, 5)
        ), pos AS (
          SELECT CAST(sum(cents) AS BIGINT) AS sum_pos,
                 CAST(count(*) AS BIGINT) AS n_pos
          FROM c WHERE cents > 0
        )
        SELECT cntry, count(*) AS numcust,
               CAST(sum(cents) AS BIGINT) AS totacctbal_cents
        FROM c CROSS JOIN pos
        WHERE cents * n_pos > sum_pos
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c.c_custkey
                            AND o_orderpriority = '2-HIGH')
        GROUP BY cntry
    """
    oracles["tpch_q18"] = """
        WITH big AS (
          SELECT l_orderkey,
                 CAST(sum(CAST(round(l_quantity) AS BIGINT))
                      AS BIGINT) AS tot_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 120
        )
        SELECT c_custkey,
               count(*) AS n_big_orders,
               CAST(sum(tot_qty) AS BIGINT) AS total_qty
        FROM big
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        GROUP BY c_custkey
        ORDER BY total_qty DESC, c_custkey ASC
        LIMIT 20
    """
    oracles["tpch_q2"] = """
        WITH eur AS (
          SELECT s_suppkey, s_name, n_name,
                 CAST(round(s_acctbal*100) AS BIGINT) AS acct_cents
          FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'
        ), pairs AS (
          SELECT DISTINCT l.l_partkey AS p_partkey, e.s_suppkey,
                 e.s_name, e.n_name, e.acct_cents
          FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey
          JOIN eur e ON l.l_suppkey = e.s_suppkey
          WHERE p.p_type = 'STANDARD'
            AND p.p_size BETWEEN 10 AND 20
        ), mins AS (
          SELECT p_partkey,
                 CAST(min(acct_cents) AS BIGINT) AS min_cents
          FROM pairs GROUP BY p_partkey
        )
        SELECT pr.p_partkey, pr.s_name, pr.n_name, pr.acct_cents
        FROM pairs pr JOIN mins m USING (p_partkey)
        WHERE pr.acct_cents = m.min_cents
    """
    oracles["tpch_q7"] = """
        SELECT sn.n_name AS supp_nation,
               cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                        * (10000 - CAST(round(l_discount*10000)
                                        AS BIGINT))) AS BIGINT)
                 AS revenue_e6,
               count(*) AS n_items
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
               OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
        GROUP BY 1, 2, 3
    """
    oracles["tpch_q8"] = """
        WITH vol AS (
          SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 sn.n_name AS supp_nation,
                 CAST(round(l_extendedprice*100) AS BIGINT)
                   * (10000 - CAST(round(l_discount*10000) AS BIGINT))
                   AS rev_e6
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation mn ON c_nationkey = mn.n_nationkey
          JOIN region ON mn.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation sn ON s_nationkey = sn.n_nationkey
          WHERE p_type = 'PROMO'
            AND r_name = 'ASIA'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate <  TIMESTAMP '1998-01-01'
        )
        SELECT o_year,
               CAST(sum(CASE WHEN supp_nation = 'NATION_7'
                             THEN rev_e6 ELSE 0 END) AS BIGINT)
                 AS nation_e6,
               CAST(sum(rev_e6) AS BIGINT) AS total_e6,
               CAST(sum(CASE WHEN supp_nation = 'NATION_7'
                             THEN rev_e6 ELSE 0 END) AS DOUBLE)
                 / CAST(sum(rev_e6) AS DOUBLE) AS mkt_share
        FROM vol GROUP BY o_year
    """
    oracles["tpch_q9"] = """
        SELECT n_name,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                        * (10000 - CAST(round(l_discount*10000)
                                        AS BIGINT))
                        - CAST(round(p_retailprice*100) AS BIGINT)
                          * CAST(round(l_quantity) AS BIGINT)
                          * 10000) AS BIGINT) AS profit_e6,
               count(*) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2
    """
    oracles["tpch_q11"] = """
        WITH val AS (
          SELECT l_partkey,
                 CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))
                      AS BIGINT) AS value_cents
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_4'
          GROUP BY l_partkey
        ), tot AS (
          SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents,
                 CAST(count(*) AS BIGINT) AS n_parts
          FROM val
        )
        SELECT l_partkey, value_cents
        FROM val CROSS JOIN tot
        WHERE value_cents * n_parts > 2 * total_cents
    """
    oracles["tpch_q15"] = """
        WITH per AS (
          SELECT l_suppkey,
                 CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                          * (10000 - CAST(round(l_discount*10000)
                                          AS BIGINT))) AS BIGINT)
                   AS total_rev_e6
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_rev_e6
        FROM per
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_rev_e6 = (SELECT max(total_rev_e6) FROM per)
    """
    oracles["tpch_q16"] = """
        SELECT p_brand, p_type,
               CAST(p_size AS BIGINT) AS p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT)
                 AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#45'
          AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
    """
    oracles["tpch_q20"] = """
        WITH sm AS (
          SELECT l_partkey AS p_partkey, l_suppkey,
                 CAST(round(l_quantity) AS BIGINT) AS qty
          FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'small%')
        ), per AS (
          SELECT p_partkey, l_suppkey,
                 CAST(sum(qty) AS BIGINT) AS supp_qty
          FROM sm GROUP BY 1, 2
        ), tot AS (
          SELECT p_partkey, CAST(sum(qty) AS BIGINT) AS tot_qty,
                 CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp
          FROM sm GROUP BY 1
        ), dom AS (
          SELECT DISTINCT l_suppkey
          FROM per JOIN tot USING (p_partkey)
          WHERE supp_qty * n_supp > 2 * tot_qty
        )
        SELECT s_suppkey, s_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
          AND s_suppkey IN (SELECT l_suppkey FROM dom)
    """
    oracles["tpch_q21"] = """
        WITH fl AS (
          SELECT l_orderkey, l_suppkey,
                 l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
        ), per AS (
          SELECT l_orderkey,
                 count(DISTINCT l_suppkey) AS n_supp,
                 count(DISTINCT CASE WHEN late THEN l_suppkey END)
                   AS n_late_supp
          FROM fl GROUP BY 1
        )
        SELECT s_name, count(*) AS numwait
        FROM (SELECT DISTINCT l_orderkey, l_suppkey
              FROM fl WHERE late) w
        JOIN per USING (l_orderkey)
        JOIN supplier ON w.l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE per.n_supp >= 2 AND per.n_late_supp = 1
          AND n_name = 'NATION_2'
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 20
    """
    oracles["nelson_aalen"] = """
        WITH g AS (
          SELECT event_type,
                 lead(CAST(epoch(ts) AS DOUBLE)) OVER
                   (PARTITION BY user_id ORDER BY epoch(ts), event_id)
                 - CAST(epoch(ts) AS DOUBLE) AS gap
          FROM events
        ), obs AS (
          SELECT event_type,
                 CASE WHEN gap IS NULL OR gap > 43200.0 THEN 12
                      ELSE CAST(floor(gap / 3600.0) AS BIGINT) END
                   AS duration,
                 CASE WHEN gap IS NULL OR gap > 43200.0 THEN 0
                      ELSE 1 END AS event
          FROM g
        ), per AS (
          SELECT event_type, duration,
                 CAST(sum(event) AS BIGINT) AS n_events,
                 CAST(count(*) - sum(event) AS BIGINT) AS n_censored
          FROM obs GROUP BY event_type, duration
        ), risk AS (
          SELECT *,
                 CAST(sum(n_events + n_censored) OVER
                        (PARTITION BY event_type)
                      - COALESCE(sum(n_events + n_censored) OVER
                          (PARTITION BY event_type ORDER BY duration
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS BIGINT)
                   AS n_at_risk
          FROM per
        )
        SELECT event_type, duration, n_at_risk, n_events, n_censored,
               round(list_reduce(
                 list_prepend(0.0,
                   list(CAST(n_events AS DOUBLE)
                        / CAST(n_at_risk AS DOUBLE)) OVER
                     (PARTITION BY event_type ORDER BY duration
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW)),
                 (acc, x) -> acc + x), 6) AS cumhaz
        FROM risk
    """
    oracles["mcnemar"] = """
        WITH d AS (
          SELECT CASE WHEN CAST(round(value*100) AS BIGINT) > 1000
                      THEN 1 ELSE 0 END AS y1,
                 CASE WHEN CAST(json_extract_string(props, '$.k')
                            AS BIGINT) >= 50
                      THEN 1 ELSE 0 END AS y2
          FROM events WHERE value IS NOT NULL AND props IS NOT NULL
        ), c AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum((1-y1)*(1-y2)) AS BIGINT) AS n00,
                 CAST(sum((1-y1)*y2) AS BIGINT) AS n01,
                 CAST(sum(y1*(1-y2)) AS BIGINT) AS n10,
                 CAST(sum(y1*y2) AS BIGINT) AS n11
          FROM d
        ), s AS (
          SELECT *,
                 CASE WHEN n10 + n01 > 0 THEN
                   (abs(CAST(n10 AS DOUBLE) - CAST(n01 AS DOUBLE))
                    - 1.0)
                   * (abs(CAST(n10 AS DOUBLE) - CAST(n01 AS DOUBLE))
                      - 1.0)
                   / (CAST(n10 AS DOUBLE) + CAST(n01 AS DOUBLE))
                 END AS chi2
          FROM c
        ), e AS (
          SELECT *, sqrt(chi2 / 2.0) AS x,
                 1.0 / (1.0 + 0.3275911 * sqrt(chi2 / 2.0)) AS t
          FROM s
        )
        SELECT n, n00, n01, n10, n11,
               round(chi2, 6) AS chi2,
               round((t * (0.254829592
                     + t * (-0.284496736
                     + t * (1.421413741
                     + t * (-1.453152027
                     + t * 1.061405429))))) * exp(-(x*x)), 6)
                 AS p_value
        FROM e
    """
    oracles["mcc"] = """
        WITH d AS (
          SELECT CASE WHEN CAST(round(value*100) AS BIGINT) > 1000
                      THEN 1 ELSE 0 END AS y_true,
                 CASE WHEN CAST(json_extract_string(props, '$.k')
                            AS BIGINT) >= 50
                      THEN 1 ELSE 0 END AS y_pred
          FROM events WHERE value IS NOT NULL AND props IS NOT NULL
        ), c AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y_true*y_pred) AS BIGINT) AS tp,
                 CAST(sum((1-y_true)*y_pred) AS BIGINT) AS fp,
                 CAST(sum(y_true*(1-y_pred)) AS BIGINT) AS fn,
                 CAST(sum((1-y_true)*(1-y_pred)) AS BIGINT) AS tn
          FROM d
        ), s AS (
          SELECT *,
                 (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))
                 * (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
                 * (CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE))
                 * (CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE)) AS den
          FROM c
        )
        SELECT n, tp, fp, fn, tn,
               CASE WHEN den > 0.0 THEN
                 round((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
                        - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
                       / sqrt(den), 6)
               END AS mcc
        FROM s
    """
    oracles["cochran_q"] = """
        WITH d AS (
          SELECT CAST(event_id // 5 AS BIGINT) AS subj,
                 CAST(event_id % 5 AS BIGINT) AS treat,
                 CASE WHEN CAST(round(value*100) AS BIGINT) > 500
                      THEN 1 ELSE 0 END AS y
          FROM events WHERE value IS NOT NULL
        ), kk AS (
          SELECT CAST(count(DISTINCT treat) AS BIGINT) AS k FROM d
        ), per_s AS (
          SELECT subj,
                 CAST(count(DISTINCT treat) AS BIGINT) AS n_t,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(y) AS BIGINT) AS t_i
          FROM d GROUP BY subj
        ), complete AS (
          SELECT per_s.* FROM per_s, kk
          WHERE n_t = kk.k AND n_rows = kk.k
        ), dropped AS (
          SELECT CAST(count(*) AS BIGINT) AS n_dropped
          FROM per_s, kk
          WHERE NOT (n_t = kk.k AND n_rows = kk.k)
        ), rws AS (
          SELECT CAST(count(*) AS BIGINT) AS n_subjects,
                 CAST(sum(t_i) AS BIGINT) AS t,
                 CAST(sum(t_i*t_i) AS BIGINT) AS sum_ti2
          FROM complete
        ), per_c AS (
          SELECT treat, CAST(sum(y) AS BIGINT) AS c_j
          FROM d JOIN complete USING (subj) GROUP BY treat
        ), cols AS (
          SELECT list_reduce(list_prepend(0.0,
                   list(CAST(c_j AS DOUBLE) * CAST(c_j AS DOUBLE)
                        ORDER BY treat)),
                 (acc, x) -> acc + x) AS sum_cj2
          FROM per_c
        )
        SELECT kk.k AS k, n_subjects, n_dropped, t, sum_ti2,
               round(sum_cj2, 6) AS sum_cj2,
               CASE WHEN CAST(kk.k AS DOUBLE) * CAST(t AS DOUBLE)
                         - CAST(sum_ti2 AS DOUBLE) > 0.0
                    THEN round(
                      (CAST(kk.k AS DOUBLE) - 1.0)
                      * (CAST(kk.k AS DOUBLE) * sum_cj2
                         - CAST(t AS DOUBLE) * CAST(t AS DOUBLE))
                      / (CAST(kk.k AS DOUBLE) * CAST(t AS DOUBLE)
                         - CAST(sum_ti2 AS DOUBLE)), 6)
               END AS q_stat,
               kk.k - 1 AS df
        FROM rws, kk, dropped, cols
    """
    oracles["brown_forsythe"] = """
        WITH nn AS (
          SELECT event_type AS g,
                 CAST(round(value*100) AS BIGINT) AS v
          FROM events WHERE value IS NOT NULL
        ), per_v AS (
          SELECT g, v, CAST(count(*) AS BIGINT) AS t
          FROM nn GROUP BY g, v
        ), c AS (
          SELECT g, v, t,
                 sum(t) OVER (PARTITION BY g ORDER BY v
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum,
                 sum(t) OVER (PARTITION BY g) AS n
          FROM per_v
        ), lo AS (
          SELECT g, min(v) AS lo FROM c
          WHERE cum >= n + 1 - (n // 2) - 1 GROUP BY g
        ), hi AS (
          SELECT g, min(v) AS hi FROM c
          WHERE cum >= (n // 2) + 1 GROUP BY g
        ), med AS (
          SELECT g, lo + hi AS m2 FROM lo JOIN hi USING (g)
        ), z AS (
          SELECT nn.g AS g, abs(2*v - m2) AS z2
          FROM nn JOIN med ON nn.g = med.g
        ), per AS (
          SELECT g, CAST(count(*) AS BIGINT) AS n_g,
                 CAST(sum(z2) AS BIGINT) AS s_g,
                 CAST(sum(z2*z2) AS BIGINT) AS q_g
          FROM z GROUP BY g
        ), t AS (
          SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(n_g) AS BIGINT) AS n,
                 CAST(sum(s_g) AS BIGINT) AS s,
                 CAST(sum(q_g) AS BIGINT) AS q,
                 list_reduce(list_prepend(0.0,
                   list(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
                        / CAST(n_g AS DOUBLE) ORDER BY g)),
                   (acc, x) -> acc + x) AS sum_s2n
          FROM per
        )
        SELECT k, n,
               round(sum_s2n - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                               / CAST(n AS DOUBLE), 6) AS ss_between,
               round(CAST(q AS DOUBLE) - sum_s2n, 6) AS ss_within,
               CASE WHEN k >= 2 AND CAST(q AS DOUBLE) - sum_s2n > 0.0
                    THEN round(
                      ((sum_s2n - (CAST(s AS DOUBLE)
                                   * CAST(s AS DOUBLE))
                                  / CAST(n AS DOUBLE))
                       / (CAST(k AS DOUBLE) - 1.0))
                      / ((CAST(q AS DOUBLE) - sum_s2n)
                         / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6)
               END AS f_stat
        FROM t
    """
    oracles["jarque_bera"] = """
        WITH nn AS (
          SELECT event_type,
                 CAST(round(value*100) AS BIGINT) AS v
          FROM events WHERE value IS NOT NULL
        ), per AS (
          SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(v) AS BIGINT) AS s1,
                 sum(CAST(v*v AS HUGEINT)) AS s2,
                 sum(CAST(v*v AS HUGEINT) * v) AS s3,
                 sum(CAST(v*v AS HUGEINT) * (v*v)) AS s4
          FROM nn GROUP BY event_type
        ), r AS (
          SELECT event_type, n,
                 CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
                 CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
                 CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
                 CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
          FROM per
        ), m AS (
          SELECT event_type, n, mean,
                 r2 - mean * mean AS m2,
                 r3 - 3.0 * mean * r2
                    + 2.0 * mean * mean * mean AS m3,
                 r4 - 4.0 * mean * r3 + 6.0 * mean * mean * r2
                    - 3.0 * mean * mean * mean * mean AS m4
          FROM r
        ), s AS (
          SELECT event_type, n, mean, m2,
                 CASE WHEN m2 > 0.0
                      THEN m3 / (m2 * sqrt(m2)) END AS skewness,
                 CASE WHEN m2 > 0.0
                      THEN m4 / (m2 * m2) END AS kurtosis
          FROM m
        )
        SELECT event_type, n,
               round(mean, 6) AS mean,
               round(m2, 6) AS m2,
               round(skewness, 6) AS skewness,
               round(kurtosis, 6) AS kurtosis,
               CASE WHEN m2 > 0.0 THEN
                 round(CAST(n AS DOUBLE) / 6.0
                       * (skewness * skewness
                          + (kurtosis - 3.0) * (kurtosis - 3.0)
                            / 4.0), 6)
               END AS jb
        FROM s
    """
    oracles["dp_counts"] = _dp_counts_oracle_sql(epsilon=1.0, seed=11)
    _lb_r = {}
    for _k in (1, 2, 3):
        _lb_r[_k] = f"""(CASE WHEN n > {_k}
                   AND (CAST(q AS DOUBLE)
                        - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)
                          /CAST(n AS DOUBLE)) > 0
             THEN (CAST(c{_k} AS DOUBLE)
                   - (CAST(s AS DOUBLE)/CAST(n AS DOUBLE))
                     *(CAST(head{_k} AS DOUBLE)
                       + CAST(tail{_k} AS DOUBLE))
                   + CAST(n - {_k} AS DOUBLE)
                     *(CAST(s AS DOUBLE)/CAST(n AS DOUBLE))
                     *(CAST(s AS DOUBLE)/CAST(n AS DOUBLE)))
                  /(CAST(q AS DOUBLE)
                    - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)
                      /CAST(n AS DOUBLE)) END)"""
    oracles["ljung_box"] = f"""
        WITH q0 AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 abs(CAST(round(value*100) AS BIGINT)) AS v
          FROM events
        ), l AS (
          SELECT user_id, v,
                 lag(v, 1) OVER w AS g1,
                 lag(v, 2) OVER w AS g2,
                 lag(v, 3) OVER w AS g3
          FROM q0
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        ), a AS (
          SELECT user_id,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(v) AS BIGINT) AS s,
                 CAST(sum(v*v) AS BIGINT) AS q,
                 CAST(sum(v*g1) AS BIGINT) AS c1,
                 CAST(sum(CASE WHEN g1 IS NOT NULL THEN v END)
                      AS BIGINT) AS tail1,
                 CAST(sum(g1) AS BIGINT) AS head1,
                 CAST(sum(v*g2) AS BIGINT) AS c2,
                 CAST(sum(CASE WHEN g2 IS NOT NULL THEN v END)
                      AS BIGINT) AS tail2,
                 CAST(sum(g2) AS BIGINT) AS head2,
                 CAST(sum(v*g3) AS BIGINT) AS c3,
                 CAST(sum(CASE WHEN g3 IS NOT NULL THEN v END)
                      AS BIGINT) AS tail3,
                 CAST(sum(g3) AS BIGINT) AS head3
          FROM l GROUP BY user_id
        )
        SELECT user_id, n,
               round(CASE WHEN n > 3 THEN
                 CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)
                 * (0.0
                    + {_lb_r[1]} * {_lb_r[1]}
                      / (CAST(n AS DOUBLE) - 1.0)
                    + {_lb_r[2]} * {_lb_r[2]}
                      / (CAST(n AS DOUBLE) - 2.0)
                    + {_lb_r[3]} * {_lb_r[3]}
                      / (CAST(n AS DOUBLE) - 3.0))
               END, 6) AS q_stat,
               CAST(3 AS BIGINT) AS df
        FROM a
    """
    oracles["logrank"] = """
        WITH g AS (
          SELECT event_type,
                 lead(CAST(epoch(ts) AS DOUBLE)) OVER
                   (PARTITION BY user_id ORDER BY epoch(ts), event_id)
                 - CAST(epoch(ts) AS DOUBLE) AS gap
          FROM events
        ), obs AS (
          SELECT event_type,
                 CASE WHEN gap IS NULL OR gap > 43200.0 THEN 12
                      ELSE CAST(floor(gap / 3600.0) AS BIGINT) END
                   AS t,
                 CASE WHEN gap IS NULL OR gap > 43200.0 THEN 0
                      ELSE 1 END AS event
          FROM g
          WHERE event_type IN ('click', 'purchase')
        ), per AS (
          SELECT t,
                 CAST(sum(CASE WHEN event_type = 'click'
                               THEN event ELSE 0 END) AS BIGINT)
                   AS d_a,
                 CAST(sum(CASE WHEN event_type = 'purchase'
                               THEN event ELSE 0 END) AS BIGINT)
                   AS d_b,
                 CAST(sum(CASE WHEN event_type = 'click'
                               THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
                 CAST(sum(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT) AS c_b
          FROM obs GROUP BY t
        ), risk AS (
          SELECT *,
                 CAST(sum(c_a) OVER () AS BIGINT) AS tot_a,
                 CAST(sum(c_b) OVER () AS BIGINT) AS tot_b,
                 CAST(coalesce(sum(c_a) OVER wb, 0) AS BIGINT)
                   AS gone_a,
                 CAST(coalesce(sum(c_b) OVER wb, 0) AS BIGINT)
                   AS gone_b
          FROM per
          WINDOW wb AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING)
        ), terms AS (
          SELECT t, d_a, tot_a, tot_b,
                 CAST(tot_a - gone_a AS DOUBLE) AS na,
                 CAST(tot_b - gone_b AS DOUBLE) AS nb,
                 CAST(d_a + d_b AS DOUBLE) AS dt
          FROM risk
        ), tv AS (
          SELECT t, d_a, tot_a, tot_b,
                 CASE WHEN dt > 0 AND na + nb > 1.0
                      THEN dt * na / (na + nb) ELSE 0.0 END AS e,
                 CASE WHEN dt > 0 AND na + nb > 1.0
                      THEN dt * (na / (na + nb)) * (nb / (na + nb))
                           * ((na + nb) - dt) / ((na + nb) - 1.0)
                      ELSE 0.0 END AS v
          FROM terms
        ), agg AS (
          SELECT max(tot_a) AS n_a, max(tot_b) AS n_b,
                 CAST(sum(d_a) AS BIGINT) AS o_a,
                 list_reduce(list_prepend(0.0, list(e ORDER BY t)),
                             (acc, x) -> acc + x) AS se,
                 list_reduce(list_prepend(0.0, list(v ORDER BY t)),
                             (acc, x) -> acc + x) AS sv
          FROM tv
        ), s AS (
          SELECT *,
                 CASE WHEN sv > 0.0
                      THEN (CAST(o_a AS DOUBLE) - se)
                           * (CAST(o_a AS DOUBLE) - se) / sv
                 END AS chi2
          FROM agg
        ), e2 AS (
          SELECT *, sqrt(chi2 / 2.0) AS x,
                 1.0 / (1.0 + 0.3275911 * sqrt(chi2 / 2.0)) AS tt
          FROM s
        )
        SELECT CAST(n_a AS BIGINT) AS n_a,
               CAST(n_b AS BIGINT) AS n_b, o_a,
               round(se, 6) AS e_a,
               round(sv, 6) AS var_sum,
               round(chi2, 6) AS chi2,
               round((tt * (0.254829592
                     + tt * (-0.284496736
                     + tt * (1.421413741
                     + tt * (-1.453152027
                     + tt * 1.061405429))))) * exp(-(x*x)), 6)
                 AS p_value
        FROM e2
    """
    oracles["chrf_pairs"] = """
        WITH a AS (
          SELECT CAST(doc_id/2 AS BIGINT) AS pair_id, text AS cand
          FROM documents WHERE doc_id % 2 = 0
        ), b AS (
          SELECT CAST((doc_id-1)/2 AS BIGINT) AS pair_id,
                 text AS ref
          FROM documents WHERE doc_id % 2 = 1
        ), p AS (
          SELECT pair_id,
                 regexp_replace(lower(cand), '\\s+', '', 'g') AS cs,
                 regexp_replace(lower(ref), '\\s+', '', 'g') AS rs
          FROM a JOIN b USING (pair_id)
        ), c1 AS (
          SELECT pair_id, substr(cs, i, 1) AS g, count(*) AS cc
          FROM p, unnest(generate_series(1, length(cs))) AS s(i)
          GROUP BY 1, 2
        ), r1 AS (
          SELECT pair_id, substr(rs, i, 1) AS g, count(*) AS cr
          FROM p, unnest(generate_series(1, length(rs))) AS s(i)
          GROUP BY 1, 2
        ), u1 AS (
          SELECT pair_id,
                 CAST(sum(least(coalesce(cc, 0), coalesce(cr, 0)))
                      AS BIGINT) AS m1,
                 CAST(sum(coalesce(cc, 0)) AS BIGINT) AS c1,
                 CAST(sum(coalesce(cr, 0)) AS BIGINT) AS r1
          FROM c1 FULL JOIN r1 USING (pair_id, g)
          GROUP BY 1
        ), c2 AS (
          SELECT pair_id, substr(cs, i, 2) AS g, count(*) AS cc
          FROM p, unnest(generate_series(1, length(cs)-1)) AS s(i)
          GROUP BY 1, 2
        ), r2 AS (
          SELECT pair_id, substr(rs, i, 2) AS g, count(*) AS cr
          FROM p, unnest(generate_series(1, length(rs)-1)) AS s(i)
          GROUP BY 1, 2
        ), u2 AS (
          SELECT pair_id,
                 CAST(sum(least(coalesce(cc, 0), coalesce(cr, 0)))
                      AS BIGINT) AS m2,
                 CAST(sum(coalesce(cc, 0)) AS BIGINT) AS c2,
                 CAST(sum(coalesce(cr, 0)) AS BIGINT) AS r2
          FROM c2 FULL JOIN r2 USING (pair_id, g)
          GROUP BY 1
        ), m AS (
          SELECT p.pair_id,
                 CAST(length(cs) AS BIGINT) AS cand_chars,
                 CAST(length(rs) AS BIGINT) AS ref_chars,
                 coalesce(m1, 0) AS m1, coalesce(u1.c1, 0) AS c1,
                 coalesce(u1.r1, 0) AS r1,
                 coalesce(m2, 0) AS m2, coalesce(u2.c2, 0) AS c2,
                 coalesce(u2.r2, 0) AS r2
          FROM p
          LEFT JOIN u1 USING (pair_id)
          LEFT JOIN u2 USING (pair_id)
        )
        SELECT pair_id, cand_chars, ref_chars,
               m1, c1, r1, m2, c2, r2,
               CASE WHEN c1 > 0 AND r1 > 0 AND c2 > 0 AND r2 > 0
                         AND (0.0
                              + (CAST(m1 AS DOUBLE)
                                 / CAST(c1 AS DOUBLE)) / 2.0
                              + (CAST(m2 AS DOUBLE)
                                 / CAST(c2 AS DOUBLE)) / 2.0)
                             + (0.0
                                + (CAST(m1 AS DOUBLE)
                                   / CAST(r1 AS DOUBLE)) / 2.0
                                + (CAST(m2 AS DOUBLE)
                                   / CAST(r2 AS DOUBLE)) / 2.0)
                             > 0.0
                    THEN round(
                      5.0
                      * (0.0
                         + (CAST(m1 AS DOUBLE)
                            / CAST(c1 AS DOUBLE)) / 2.0
                         + (CAST(m2 AS DOUBLE)
                            / CAST(c2 AS DOUBLE)) / 2.0)
                      * (0.0
                         + (CAST(m1 AS DOUBLE)
                            / CAST(r1 AS DOUBLE)) / 2.0
                         + (CAST(m2 AS DOUBLE)
                            / CAST(r2 AS DOUBLE)) / 2.0)
                      / (4.0
                         * (0.0
                            + (CAST(m1 AS DOUBLE)
                               / CAST(c1 AS DOUBLE)) / 2.0
                            + (CAST(m2 AS DOUBLE)
                               / CAST(c2 AS DOUBLE)) / 2.0)
                         + (0.0
                            + (CAST(m1 AS DOUBLE)
                               / CAST(r1 AS DOUBLE)) / 2.0
                            + (CAST(m2 AS DOUBLE)
                               / CAST(r2 AS DOUBLE)) / 2.0)), 6)
               END AS chrf
        FROM m
    """
    oracles["ece"] = """
        WITH q AS (
          SELECT least(CAST(round(value*100) AS BIGINT), 2000)
                   AS score,
                 CASE WHEN round(value*100) > 1000 THEN 1 ELSE 0 END
                   AS lbl
          FROM events
        ), b AS (
          SELECT least(CAST(floor(score * 10 / 2000) AS BIGINT), 9)
                   AS bin,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(score) AS DOUBLE)
                   / (count(*) * 2000.0) AS mean_pred,
                 CAST(sum(lbl) AS DOUBLE) / count(*) AS frac_pos
          FROM q GROUP BY 1
        ), agg AS (
          SELECT CAST(sum(n) AS BIGINT) AS n,
                 CAST(count(*) AS BIGINT) AS n_bins,
                 list_reduce(list_prepend(0.0,
                   list(CAST(n AS DOUBLE)
                        * abs(frac_pos - mean_pred) ORDER BY bin)),
                   (acc, x) -> acc + x) AS werr
          FROM b
        )
        SELECT n, n_bins,
               round(werr / CAST(n AS DOUBLE), 6) AS ece
        FROM agg
    """
    oracles["fleiss_kappa"] = """
        WITH nij AS (
          SELECT event_id // 4 AS item, event_type,
                 CAST(count(*) AS BIGINT) AS n_ij
          FROM events
          WHERE event_id IS NOT NULL AND event_type IS NOT NULL
          GROUP BY 1, 2
        ), per_item AS (
          SELECT item, CAST(sum(n_ij) AS BIGINT) AS n_i,
                 CAST(sum(n_ij*n_ij) AS BIGINT) AS sq_i
          FROM nij GROUP BY item
        ), items AS (
          SELECT CAST(count(*) AS BIGINT) AS n_items,
                 CAST(min(n_i) AS BIGINT) AS n_min,
                 CAST(max(n_i) AS BIGINT) AS n_max,
                 CAST(sum(sq_i) AS BIGINT) AS sum_sq
          FROM per_item
        ), cats AS (
          SELECT CAST(sum(c_j*c_j) AS BIGINT) AS sum_c2
          FROM (SELECT event_type, CAST(sum(n_ij) AS BIGINT) AS c_j
                FROM nij GROUP BY event_type)
        ), j AS (
          SELECT *,
                 CASE WHEN n_min = n_max AND n_min >= 2 THEN
                   (CAST(sum_sq AS DOUBLE)
                    - CAST(n_items AS DOUBLE) * CAST(n_min AS DOUBLE))
                   / (CAST(n_items AS DOUBLE) * CAST(n_min AS DOUBLE)
                      * (CAST(n_min AS DOUBLE) - 1.0))
                 END AS p_bar,
                 CAST(sum_c2 AS DOUBLE)
                 / ((CAST(n_items AS DOUBLE) * CAST(n_min AS DOUBLE))
                    * (CAST(n_items AS DOUBLE)
                       * CAST(n_min AS DOUBLE))) AS p_e
          FROM items CROSS JOIN cats
        )
        SELECT n_items,
               CASE WHEN n_min = n_max THEN n_min END AS n_raters,
               round(p_bar, 6) AS p_bar,
               round(p_e, 6) AS p_e,
               CASE WHEN p_e < 1.0
                    THEN round((p_bar - p_e) / (1.0 - p_e), 6)
               END AS kappa
        FROM j
    """
    oracles["t_closeness"] = """
        WITH d AS (
          SELECT CAST(user_id % 20 AS BIGINT) AS user_bucket,
                 event_type
          FROM events WHERE event_type IS NOT NULL
        ), per AS (
          SELECT user_bucket, event_type,
                 CAST(count(*) AS BIGINT) AS k_j
          FROM d GROUP BY 1, 2
        ), gcnt AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS c_j
          FROM d GROUP BY 1
        ), tot AS (
          SELECT CAST(sum(c_j) AS BIGINT) AS N FROM gcnt
        ), pg AS (
          SELECT per.*, CAST(sum(k_j) OVER
                   (PARTITION BY user_bucket) AS BIGINT) AS g
          FROM per
        ), agg AS (
          SELECT user_bucket,
                 CAST(max(g) AS BIGINT) AS group_size,
                 CAST(max(N) AS BIGINT) AS N,
                 CAST(sum(abs(k_j*N - c_j*g)) AS BIGINT)
                   AS present_num,
                 CAST(sum(c_j) AS BIGINT) AS present_c
          FROM pg
          JOIN gcnt USING (event_type)
          CROSS JOIN tot
          GROUP BY user_bucket
        )
        SELECT user_bucket, group_size,
               CAST(present_num
                    + group_size * (N - present_c) AS BIGINT)
                 AS tvd_num,
               round(CAST(present_num + group_size * (N - present_c)
                          AS DOUBLE)
                     / (2.0 * CAST(group_size AS DOUBLE)
                        * CAST(N AS DOUBLE)), 6) AS tvd,
               CAST(present_num + group_size * (N - present_c)
                    AS DOUBLE)
               / (2.0 * CAST(group_size AS DOUBLE)
                  * CAST(N AS DOUBLE)) <= 0.05 AS t_close
        FROM agg
    """
    oracles["image_corners"] = _harris_oracle_sql()
    oracles["weighted_hops"] = """
        WITH e0 AS (
          SELECT l_orderkey*2 AS src, l_partkey*2+1 AS dst,
                 CAST(round(l_quantity) AS BIGINT) AS w
          FROM lineitem
        ), eu AS (
          SELECT src, dst, CAST(min(w) AS BIGINT) AS w
          FROM (SELECT src, dst, w FROM e0
                UNION ALL SELECT dst, src, w FROM e0)
          GROUP BY 1, 2
        ), r0 AS (
          SELECT DISTINCT l_orderkey*2 AS node,
                 CAST(0 AS BIGINT) AS dist
          FROM lineitem WHERE l_orderkey <= 3
        ), r1 AS (
          SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
            SELECT node, dist FROM r0
            UNION ALL
            SELECT e.dst, r.dist + e.w FROM r0 r
            JOIN eu e ON r.node = e.src
          ) GROUP BY node
        ), r2 AS (
          SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
            SELECT node, dist FROM r1
            UNION ALL
            SELECT e.dst, r.dist + e.w FROM r1 r
            JOIN eu e ON r.node = e.src
          ) GROUP BY node
        ), r3 AS (
          SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
            SELECT node, dist FROM r2
            UNION ALL
            SELECT e.dst, r.dist + e.w FROM r2 r
            JOIN eu e ON r.node = e.src
          ) GROUP BY node
        )
        SELECT node, dist FROM r3
    """
    oracles["ips_offpolicy"] = """
        WITH d AS (
          SELECT event_type,
                 CAST(round(value*100) AS BIGINT) AS cents,
                 CASE WHEN CAST(json_extract_string(props, '$.k')
                            AS BIGINT) >= 50
                      THEN 'purchase' ELSE 'click' END AS target
          FROM events
          WHERE event_type IS NOT NULL AND value IS NOT NULL
        ), per AS (
          SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n_a,
                 CAST(sum(CASE WHEN event_type = target
                               THEN cents ELSE 0 END) AS BIGINT)
                   AS r_match,
                 CAST(sum(CASE WHEN event_type = target
                               THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_match
          FROM d GROUP BY event_type
        ), tot AS (
          SELECT *, CAST(sum(n_a) OVER () AS BIGINT) AS n FROM per
        ), agg AS (
          SELECT max(n) AS n,
                 CAST(sum(n_match) AS BIGINT) AS n_matched,
                 list_reduce(list_prepend(0.0,
                   list(CAST(r_match AS DOUBLE) * CAST(n AS DOUBLE)
                        / CAST(n_a AS DOUBLE)
                        ORDER BY event_type)),
                   (acc, x) -> acc + x) AS sv,
                 list_reduce(list_prepend(0.0,
                   list(CAST(n_match AS DOUBLE) * CAST(n AS DOUBLE)
                        / CAST(n_a AS DOUBLE)
                        ORDER BY event_type)),
                   (acc, x) -> acc + x) AS sw
          FROM tot
        )
        SELECT CAST(n AS BIGINT) AS n, n_matched,
               round(sv / CAST(n AS DOUBLE), 6) AS value_ips,
               CASE WHEN sw > 0.0 THEN round(sv / sw, 6) END
                 AS value_snips
        FROM agg
    """
    oracles["linear_shap"] = """
        WITH d AS (
          SELECT event_id,
                 CAST(json_extract_string(props, '$.k') AS BIGINT)
                   AS x1,
                 CAST(event_id % 7 AS BIGINT) AS x2,
                 CAST(round(value*100) AS BIGINT) AS y
          FROM events
          WHERE json_extract_string(props, '$.k') IS NOT NULL
            AND value IS NOT NULL AND event_id IS NOT NULL
        ), s AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x1) AS BIGINT) AS s1,
                 CAST(sum(x2) AS BIGINT) AS s2,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x1*x1) AS BIGINT) AS s11,
                 CAST(sum(x2*x2) AS BIGINT) AS s22,
                 CAST(sum(x1*x2) AS BIGINT) AS s12,
                 CAST(sum(x1*y) AS BIGINT) AS s1y,
                 CAST(sum(x2*y) AS BIGINT) AS s2y
          FROM d
        ), m AS (
          SELECT *,
                 CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE)
                   * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m11,
                 CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE)
                   * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS m22,
                 CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE)
                   * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS m12,
                 CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE)
                   * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS m1y,
                 CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE)
                   * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS m2y
          FROM s
        ), b AS (
          SELECT *,
                 CASE WHEN m11*m22 - m12*m12 <> 0.0
                      THEN (m1y*m22 - m2y*m12)
                           / (m11*m22 - m12*m12) END AS b1,
                 CASE WHEN m11*m22 - m12*m12 <> 0.0
                      THEN (m2y*m11 - m1y*m12)
                           / (m11*m22 - m12*m12) END AS b2,
                 CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS baseline,
                 CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_x1,
                 CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_x2
          FROM m
        )
        SELECT event_id,
               round(b1 * (CAST(x1 AS DOUBLE) - mean_x1), 6)
                 AS contrib_x1,
               round(b2 * (CAST(x2 AS DOUBLE) - mean_x2), 6)
                 AS contrib_x2,
               round(baseline, 6) AS baseline,
               round(baseline
                     + b1 * (CAST(x1 AS DOUBLE) - mean_x1)
                     + b2 * (CAST(x2 AS DOUBLE) - mean_x2), 6)
                 AS prediction
        FROM d CROSS JOIN b
    """
    oracles["bleu_pairs"] = """
        WITH a AS (
          SELECT CAST(doc_id/2 AS BIGINT) AS pair_id, text AS cand
          FROM documents WHERE doc_id % 2 = 0
        ), b AS (
          SELECT CAST((doc_id-1)/2 AS BIGINT) AS pair_id,
                 text AS ref
          FROM documents WHERE doc_id % 2 = 1
        ), p AS (
          SELECT pair_id,
                 CASE WHEN trim(lower(cand)) = '' THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(lower(cand)),
                                                 '\\s+') END AS ct,
                 CASE WHEN trim(lower(ref)) = '' THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(lower(ref)),
                                                 '\\s+') END AS rt
          FROM a JOIN b USING (pair_id)
        ), c1 AS (
          SELECT pair_id, t AS g, count(*) AS cc
          FROM p, unnest(ct) AS u(t) GROUP BY 1, 2
        ), r1 AS (
          SELECT pair_id, t AS g, count(*) AS cr
          FROM p, unnest(rt) AS u(t) GROUP BY 1, 2
        ), u1 AS (
          SELECT c1.pair_id,
                 CAST(sum(least(cc, coalesce(cr, 0))) AS BIGINT)
                   AS p1_num,
                 CAST(sum(cc) AS BIGINT) AS p1_den
          FROM c1 LEFT JOIN r1 USING (pair_id, g)
          GROUP BY 1
        ), c2 AS (
          SELECT pair_id, ct[i] || ' ' || ct[i+1] AS g,
                 count(*) AS cc
          FROM p, unnest(generate_series(1, len(ct)-1)) AS s(i)
          WHERE len(ct) >= 2 GROUP BY 1, 2
        ), r2 AS (
          SELECT pair_id, rt[i] || ' ' || rt[i+1] AS g,
                 count(*) AS cr
          FROM p, unnest(generate_series(1, len(rt)-1)) AS s(i)
          WHERE len(rt) >= 2 GROUP BY 1, 2
        ), u2 AS (
          SELECT c2.pair_id,
                 CAST(sum(least(cc, coalesce(cr, 0))) AS BIGINT)
                   AS p2_num,
                 CAST(sum(cc) AS BIGINT) AS p2_den
          FROM c2 LEFT JOIN r2 USING (pair_id, g)
          GROUP BY 1
        ), m AS (
          SELECT p.pair_id,
                 CAST(len(ct) AS BIGINT) AS cand_len,
                 CAST(len(rt) AS BIGINT) AS ref_len,
                 coalesce(p1_num, 0) AS p1_num,
                 coalesce(p1_den, 0) AS p1_den,
                 coalesce(p2_num, 0) AS p2_num,
                 coalesce(p2_den, 0) AS p2_den
          FROM p
          LEFT JOIN u1 USING (pair_id)
          LEFT JOIN u2 USING (pair_id)
        )
        SELECT pair_id, cand_len, ref_len,
               p1_num, p1_den, p2_num, p2_den,
               CASE WHEN cand_len > 0
                         AND p1_num > 0 AND p1_den > 0
                         AND p2_num > 0 AND p2_den > 0
                    THEN round(
                      least(1.0, exp(1.0 - CAST(ref_len AS DOUBLE)
                                     / CAST(cand_len AS DOUBLE)))
                      * exp(0.0
                            + (ln(CAST(p1_num AS DOUBLE))
                               - ln(CAST(p1_den AS DOUBLE))) / 2.0
                            + (ln(CAST(p2_num AS DOUBLE))
                               - ln(CAST(p2_den AS DOUBLE))) / 2.0),
                      6)
               END AS bleu
        FROM m
    """
    oracles["good_turing"] = """
        WITH toks AS (
          SELECT t FROM (
            SELECT CASE WHEN trim(lower(text)) = '' THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(lower(text)),
                                                   '\\s+') END AS w
            FROM documents
          ), unnest(w) AS u(t)
        ), types AS (
          SELECT t, count(*) AS r FROM toks GROUP BY t
        ), nr AS (
          SELECT r, CAST(count(*) AS BIGINT) AS n_r
          FROM types GROUP BY r
        )
        SELECT CAST(r AS BIGINT) AS r, n_r,
               CASE WHEN lead(r) OVER (ORDER BY r) = r + 1
                    THEN round(CAST(r + 1 AS DOUBLE)
                               * CAST(lead(n_r) OVER (ORDER BY r)
                                      AS DOUBLE)
                               / CAST(n_r AS DOUBLE), 6)
               END AS r_star,
               CAST(sum(r * n_r) OVER () AS BIGINT) AS total_tokens
        FROM nr
    """
    oracles["kneser_ney"] = """
        WITH t AS (
          SELECT CASE WHEN trim(lower(text)) = '' THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(trim(lower(text)),
                                                 '\\s+') END AS w
          FROM documents
        ), b AS (
          SELECT w[i] AS w1, w[i+1] AS w2
          FROM t, unnest(generate_series(1, len(w)-1)) AS s(i)
          WHERE len(w) >= 2
        ), bc AS (
          SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
          FROM b GROUP BY 1, 2
        ), c1 AS (
          SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
                 CAST(count(*) AS BIGINT) AS n1p_fwd
          FROM bc GROUP BY w1
        ), cont AS (
          SELECT w2, CAST(count(*) AS BIGINT) AS n1p_back
          FROM bc GROUP BY w2
        ), nt AS (
          SELECT CAST(count(*) AS BIGINT) AS n_types FROM bc
        )
        SELECT w1, w2, c12, c1, n1p_fwd, n1p_back, n_types,
               round(greatest(CAST(c12 AS DOUBLE) - 0.75, 0.0)
                     / CAST(c1 AS DOUBLE)
                     + (0.75 / CAST(c1 AS DOUBLE))
                       * CAST(n1p_fwd AS DOUBLE)
                       * CAST(n1p_back AS DOUBLE)
                       / CAST(n_types AS DOUBLE), 6) AS pkn
        FROM bc JOIN c1 USING (w1) JOIN cont USING (w2)
        CROSS JOIN nt
        WHERE c12 >= 3
    """
    oracles["anova_f"] = """
        WITH per AS (
          SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n_g,
                 CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                   AS s_g,
                 CAST(sum(CAST(round(value*100) AS BIGINT)
                          * CAST(round(value*100) AS BIGINT))
                      AS BIGINT) AS q_g
          FROM events WHERE value IS NOT NULL
          GROUP BY event_type
        ), t AS (
          SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(n_g) AS BIGINT) AS n,
                 CAST(sum(s_g) AS BIGINT) AS s,
                 CAST(sum(q_g) AS BIGINT) AS q,
                 list_reduce(list_prepend(0.0,
                   list(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
                        / CAST(n_g AS DOUBLE) ORDER BY event_type)),
                   (acc, x) -> acc + x) AS sum_s2n
          FROM per
        )
        SELECT k, n,
               round(sum_s2n - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                               / CAST(n AS DOUBLE), 6) AS ss_between,
               round(CAST(q AS DOUBLE) - sum_s2n, 6) AS ss_within,
               CASE WHEN k >= 2 AND CAST(q AS DOUBLE) - sum_s2n > 0.0
                    THEN round(
                      ((sum_s2n - (CAST(s AS DOUBLE)
                                   * CAST(s AS DOUBLE))
                                  / CAST(n AS DOUBLE))
                       / (CAST(k AS DOUBLE) - 1.0))
                      / ((CAST(q AS DOUBLE) - sum_s2n)
                         / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6)
               END AS f_stat
        FROM t
    """
    oracles["reg_discontinuity"] = """
        WITH d AS (
          SELECT CAST(json_extract_string(props, '$.k') AS BIGINT)
                   - 50 AS x,
                 CAST(round(value*100) AS BIGINT) AS y
          FROM events
          WHERE json_extract_string(props, '$.k') IS NOT NULL
            AND value IS NOT NULL
        ), f AS (
          SELECT * FROM d WHERE x >= -30 AND x <= 30
        ), per AS (
          SELECT CASE WHEN x < 0 THEN 'left' ELSE 'right' END AS side,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x*y) AS BIGINT) AS sxy,
                 CAST(sum(x*x) AS BIGINT) AS sxx
          FROM f GROUP BY 1
        ), s AS (
          SELECT side, n, sx, sy,
                 CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                           <> 0.0
                      THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE)
                                * CAST(sx AS DOUBLE))
                 END AS slope
          FROM per
        ), s2 AS (
          SELECT side, n, slope,
                 (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                   / CAST(n AS DOUBLE) AS icept
          FROM s
        )
        SELECT max(CASE WHEN side = 'left' THEN n END) AS n_left,
               max(CASE WHEN side = 'right' THEN n END) AS n_right,
               round(max(CASE WHEN side = 'left' THEN slope END), 6)
                 AS slope_left,
               round(max(CASE WHEN side = 'right' THEN slope END), 6)
                 AS slope_right,
               round(max(CASE WHEN side = 'left' THEN icept END), 6)
                 AS icept_left,
               round(max(CASE WHEN side = 'right' THEN icept END), 6)
                 AS icept_right,
               round(max(CASE WHEN side = 'right' THEN icept END)
                     - max(CASE WHEN side = 'left' THEN icept END), 6)
                 AS effect
        FROM s2
    """
    oracles["energy_distance"] = """
        WITH q AS (
          SELECT CAST(round(value*100) AS BIGINT) AS v,
                 CASE WHEN event_type = 'click' THEN 1 ELSE 0 END
                   AS ia,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                   AS ib
          FROM events
          WHERE value IS NOT NULL
            AND event_type IN ('click', 'purchase')
        ), per AS (
          SELECT v, CAST(sum(ia) AS BIGINT) AS ca,
                 CAST(sum(ib) AS BIGINT) AS cb
          FROM q GROUP BY v
        ), w AS (
          SELECT v, ca, cb,
                 CAST(sum(ca) OVER wle AS BIGINT) AS ca_le,
                 CAST(sum(cb) OVER wle AS BIGINT) AS cb_le,
                 CAST(sum(ca*v) OVER wle AS BIGINT) AS sa_le,
                 CAST(sum(cb*v) OVER wle AS BIGINT) AS sb_le,
                 CAST(sum(ca) OVER () AS BIGINT) AS ca_t,
                 CAST(sum(cb) OVER () AS BIGINT) AS cb_t,
                 CAST(sum(ca*v) OVER () AS BIGINT) AS sa_t,
                 CAST(sum(cb*v) OVER () AS BIGINT) AS sb_t
          FROM per
          WINDOW wle AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ), agg AS (
          SELECT CAST(max(ca_t) AS BIGINT) AS n_a,
                 CAST(max(cb_t) AS BIGINT) AS n_b,
                 CAST(sum(cb * (v*ca_le - sa_le + (sa_t - sa_le)
                                - v*(ca_t - ca_le))) AS BIGINT)
                   AS s_ab,
                 CAST(sum(ca * (v*ca_le - sa_le + (sa_t - sa_le)
                                - v*(ca_t - ca_le))) AS BIGINT)
                   AS s_aa,
                 CAST(sum(cb * (v*cb_le - sb_le + (sb_t - sb_le)
                                - v*(cb_t - cb_le))) AS BIGINT)
                   AS s_bb
          FROM w
        )
        SELECT n_a, n_b, s_ab, s_aa, s_bb,
               round(2.0 * CAST(s_ab AS DOUBLE)
                     / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                     - CAST(s_aa AS DOUBLE)
                       / (CAST(n_a AS DOUBLE) * CAST(n_a AS DOUBLE))
                     - CAST(s_bb AS DOUBLE)
                       / (CAST(n_b AS DOUBLE) * CAST(n_b AS DOUBLE)),
                     6) AS energy_d
        FROM agg
    """
    oracles["l_diversity"] = """
        SELECT CAST(user_id % 25 AS BIGINT) AS user_bucket,
               event_type,
               count(*) AS class_size,
               CAST(count(DISTINCT
                 CAST(json_extract_string(props, '$.k') AS BIGINT)
                 % 10) AS BIGINT) AS n_sensitive,
               count(DISTINCT
                 CAST(json_extract_string(props, '$.k') AS BIGINT)
                 % 10) < 5 AS violates_l
        FROM events
        GROUP BY 1, 2
    """
    oracles["keep_best"] = """
        WITH q AS (
          SELECT doc_id,
                 CAST(length(text) AS BIGINT) AS qual,
                 regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
                   AS norm
          FROM documents
        ), r AS (
          SELECT doc_id, qual,
                 row_number() OVER (PARTITION BY norm
                   ORDER BY qual DESC, doc_id ASC) AS rk
          FROM q
        )
        SELECT doc_id, qual FROM r WHERE rk = 1 ORDER BY doc_id
    """
    oracles["rank_normalize"] = """
        WITH q AS (
          SELECT event_id,
                 CAST(round(value*100) AS BIGINT) AS cents
          FROM events
        ), per AS (
          SELECT cents, count(*) AS cnt FROM q GROUP BY cents
        ), m AS (
          SELECT cents,
                 (COALESCE(sum(cnt) OVER (ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0)
                  + CAST(cnt AS DOUBLE) / 2.0)
                 / sum(cnt) OVER () AS u
          FROM per
        )
        SELECT event_id, round(u, 6) AS u
        FROM q JOIN m USING (cents)
    """
    oracles["feature_cross"] = """
        WITH k AS (
          SELECT concat_ws('|', event_type,
                 CAST(CAST(floor(CAST(epoch(ts) * 1000000 AS BIGINT)
                                 / 3600000000) % 24 AS BIGINT)
                      AS VARCHAR)) AS key
          FROM events
        ), h AS (
          SELECT key,
                 list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                     list_transform(
                       str_split(regexp_replace(
                         lower(trim(COALESCE(key, ''))),
                         '\\s+', ' ', 'g'), ''),
                       x -> CAST(ascii(x) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 2147483647) % 64
                 AS cross_bucket
          FROM k
        )
        SELECT cross_bucket,
               count(*) AS n_events,
               CAST(count(DISTINCT key) AS BIGINT) AS n_keys
        FROM h GROUP BY cross_bucket
    """
    # corr_matrix: same sufficient-statistic expression tree (exact
    # integer sums cast to double, IEEE combination) per column pair
    _cm_cols = {"qty": "CAST(round(l_quantity) AS BIGINT)",
                "price": "CAST(round(l_extendedprice) AS BIGINT)",
                "disc_bp": "CAST(round(l_discount*10000) AS BIGINT)",
                "tax_bp": "CAST(round(l_tax*10000) AS BIGINT)"}
    _cm_names = list(_cm_cols)
    _cm_aggs = ["count(*) AS n"]
    for _a in _cm_names:
        _cm_aggs.append(f"CAST(sum({_a}) AS DOUBLE) AS s_{_a}")
        _cm_aggs.append(f"CAST(sum({_a}*{_a}) AS DOUBLE) AS ss_{_a}")
    _cm_sel = []
    for _i, _a in enumerate(_cm_names):
        for _b in _cm_names[_i + 1:]:
            _cm_aggs.append(
                f"CAST(sum({_a}*{_b}) AS DOUBLE) AS sp_{_a}_{_b}")
            _cm_sel.append(
                f"SELECT '{_a}' AS col_x, '{_b}' AS col_y, "
                f"CAST(n AS BIGINT) AS n, "
                f"round(CASE WHEN (ss_{_a} - s_{_a}*s_{_a}/n) > 0 "
                f"AND (ss_{_b} - s_{_b}*s_{_b}/n) > 0 THEN "
                f"(sp_{_a}_{_b} - s_{_a}*s_{_b}/n) / "
                f"sqrt((ss_{_a} - s_{_a}*s_{_a}/n) "
                f"* (ss_{_b} - s_{_b}*s_{_b}/n)) END, 6) AS corr "
                f"FROM st")
    oracles["corr_matrix"] = (
        "WITH q AS (SELECT "
        + ", ".join(f"{expr} AS {name}"
                    for name, expr in _cm_cols.items())
        + " FROM lineitem), st AS (SELECT "
        + ", ".join(_cm_aggs) + " FROM q)\n"
        + "\nUNION ALL\n".join(_cm_sel))
    oracles["benford"] = """
        WITH q AS (
          SELECT CAST(round(l_extendedprice*100) AS BIGINT) AS cents
          FROM lineitem
        ), d AS (
          SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT)
                 AS digit
          FROM q WHERE cents > 0
        ), per AS (
          SELECT digit, count(*) AS obs FROM d GROUP BY digit
        ), t AS (
          SELECT digit, obs,
                 sum(obs) OVER () AS n,
                 log10(1.0 + 1.0 / digit) AS p
          FROM per
        )
        SELECT digit, obs,
               round(CAST(obs AS DOUBLE) / n, 6) AS share,
               round(p, 6) AS benford_p,
               round((obs - CAST(n AS DOUBLE) * p)
                     * (obs - CAST(n AS DOUBLE) * p)
                     / (CAST(n AS DOUBLE) * p), 6) AS chi2
        FROM t
    """
    _re_cats = ["click", "error", "purchase", "signup", "view"]
    _re_counts = ",\n".join(
        f"sum(CASE WHEN event_type = '{c}' THEN 1 ELSE 0 END) "
        f"OVER b AS c{i}" for i, c in enumerate(_re_cats))
    _re_terms = " + ".join(
        f"(CASE WHEN c{i} > 0 THEN -((CAST(c{i} AS DOUBLE) / n) "
        f"* ln(CAST(c{i} AS DOUBLE) / n)) ELSE 0.0 END)"
        for i in range(len(_re_cats)))
    oracles["bfs_hops"] = """
        WITH RECURSIVE d0 AS (
          SELECT l_orderkey*2 AS src, l_partkey*2+1 AS dst
          FROM lineitem
        ), e AS (
          SELECT src, dst FROM d0 UNION SELECT dst, src FROM d0
        ), walk(node, hop) AS (
          SELECT DISTINCT l_orderkey*2 AS node, 0 AS hop
          FROM lineitem WHERE l_orderkey <= 3
          UNION
          SELECT e.dst, walk.hop + 1
          FROM walk JOIN e ON e.src = walk.node
          WHERE walk.hop < 3
        )
        SELECT node, CAST(min(hop) AS INT) AS hops
        FROM walk GROUP BY node
    """
    oracles["rolling_entropy"] = f"""
        WITH q AS (
          SELECT event_id, user_id, event_type,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us
          FROM events
        ), c AS (
          SELECT event_id,
                 count(*) OVER b AS n,
                 {_re_counts}
          FROM q
          WINDOW b AS (PARTITION BY user_id ORDER BY us
                       RANGE BETWEEN 86400000000 PRECEDING
                                 AND CURRENT ROW)
        )
        SELECT event_id, round({_re_terms}, 6) AS h
        FROM c
    """
    oracles["ppmi"] = """
        WITH toks AS (
          SELECT DISTINCT doc_id AS doc, tok
          FROM (SELECT doc_id,
                       unnest(CASE WHEN trim(COALESCE(text,'')) = ''
                                   THEN []::VARCHAR[]
                                   ELSE regexp_split_to_array(
                                          trim(text), '\\s+') END)
                         AS tok
                FROM documents)
        ), vocab AS (
          SELECT tok, count(*) AS df_a
          FROM toks GROUP BY tok
          ORDER BY df_a DESC, tok ASC LIMIT 32
        ), tv AS (
          SELECT t.doc, t.tok, v.df_a FROM toks t JOIN vocab v USING (tok)
        ), nd AS (
          SELECT count(DISTINCT doc_id) AS n FROM documents
        ), pairs AS (
          SELECT a.tok AS tok_a, b.tok AS tok_b,
                 count(*) AS nab,
                 CAST(a.df_a AS BIGINT) AS na,
                 CAST(b.df_a AS BIGINT) AS nb
          FROM tv a JOIN tv b ON a.doc = b.doc AND a.tok < b.tok
          GROUP BY a.tok, b.tok, a.df_a, b.df_a
        )
        SELECT tok_a, tok_b, nab, na, nb,
               round(greatest(0.0,
                 ln(CAST(n AS DOUBLE) * nab
                    / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))), 6)
                 AS ppmi
        FROM pairs CROSS JOIN nd
    """
    oracles["ma_crossover"] = """
        WITH q AS (
          SELECT event_id, user_id,
                 CAST(round(value*100) AS BIGINT) AS cents,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us
          FROM events
        ), m AS (
          SELECT event_id, user_id, us,
                 avg(cents) OVER f AS fast,
                 avg(cents) OVER s AS slow
          FROM q
          WINDOW f AS (PARTITION BY user_id ORDER BY us
                       RANGE BETWEEN 21600000000 PRECEDING
                                 AND CURRENT ROW),
                 s AS (PARTITION BY user_id ORDER BY us
                       RANGE BETWEEN 172800000000 PRECEDING
                                 AND CURRENT ROW)
        ), a AS (
          SELECT event_id, user_id, us,
                 CASE WHEN fast > slow THEN 1 ELSE 0 END AS above
          FROM m
        )
        SELECT event_id,
               CAST(COALESCE(CASE WHEN above = 1
                     AND lag(above) OVER w = 0 THEN 1 ELSE 0 END, 0)
                    AS INT) AS cross_up,
               CAST(COALESCE(CASE WHEN above = 0
                     AND lag(above) OVER w = 1 THEN 1 ELSE 0 END, 0)
                    AS INT) AS cross_down
        FROM a
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    """
    oracles["session_paths"] = """
        WITH gaps AS (
          SELECT user_id, ts, event_id, event_type,
                 CASE WHEN LAG(ts) OVER w IS NULL
                           OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
          SELECT user_id, event_id, event_type,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
          FROM gaps
        ), per AS (
          SELECT user_id, session_id,
                 list(event_type ORDER BY us, event_id) AS seq
          FROM sess GROUP BY user_id, session_id
        )
        SELECT array_to_string(seq[1:4], '>') AS path,
               count(*) AS n_sessions,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_entities
        FROM per GROUP BY 1 HAVING count(*) >= 2
    """
    oracles["markov"] = """
        WITH q AS (
          SELECT user_id, event_type,
                 lead(event_type) OVER
                   (PARTITION BY user_id
                    ORDER BY CAST(epoch(ts)*1000000 AS BIGINT),
                             event_id) AS nxt
          FROM events
        ), per AS (
          SELECT event_type AS cur, nxt, count(*) AS n
          FROM q WHERE nxt IS NOT NULL GROUP BY 1, 2
        )
        SELECT cur, nxt, n,
               round(CAST(n AS DOUBLE)
                     / sum(n) OVER (PARTITION BY cur), 6) AS p
        FROM per
    """
    oracles["roc_curve"] = """
        WITH q AS (
          SELECT least(CAST(round(value*100) AS BIGINT), 2000) AS score,
                 CASE WHEN round(value*100) > 1000 THEN 1 ELSE 0 END
                   AS lbl
          FROM events
        ), per AS (
          SELECT score,
                 CAST(sum(lbl) AS BIGINT) AS pos,
                 CAST(count(*) - sum(lbl) AS BIGINT) AS neg
          FROM q GROUP BY score
        )
        SELECT score AS threshold,
               CAST(sum(pos) OVER w AS BIGINT) AS tp,
               CAST(sum(neg) OVER w AS BIGINT) AS fp,
               round(CAST(sum(pos) OVER w AS DOUBLE)
                     / sum(pos) OVER (), 6) AS tpr,
               round(CAST(sum(neg) OVER w AS DOUBLE)
                     / sum(neg) OVER (), 6) AS fpr
        FROM per
        WINDOW w AS (ORDER BY score DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """
    oracles["gini"] = """
        WITH per AS (
          SELECT user_id,
                 CAST(sum(CAST(round(value*100) AS BIGINT))
                      AS BIGINT) AS x
          FROM events GROUP BY user_id
        ), r AS (
          SELECT x, row_number() OVER (ORDER BY x ASC, user_id ASC)
                    AS i
          FROM per
        )
        SELECT round(2.0 * CAST(sum(i * x) AS DOUBLE)
                     / (CAST(count(*) AS DOUBLE)
                        * CAST(sum(x) AS DOUBLE))
                     - CAST(count(*) + 1 AS DOUBLE)
                       / CAST(count(*) AS DOUBLE), 6) AS gini,
               count(*) AS n_groups,
               CAST(sum(x) AS BIGINT) AS total
        FROM r
    """
    oracles["ols_detrend"] = """
        WITH q AS (
          SELECT event_id, user_id,
                 CAST(round(value*100) AS BIGINT) AS cents,
                 CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us
          FROM events
        ), x AS (
          SELECT event_id, user_id, cents, us,
                 CAST(floor((sec - min(sec) OVER
                   (PARTITION BY user_id ORDER BY us
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                   / 3600.0) AS BIGINT) AS xh
          FROM q
        ), s AS (
          SELECT event_id, cents, xh,
                 CAST(count(*) OVER b AS DOUBLE) AS n,
                 CAST(sum(xh) OVER b AS DOUBLE) AS sx,
                 CAST(sum(cents) OVER b AS DOUBLE) AS sy,
                 CAST(sum(xh*xh) OVER b AS DOUBLE) AS sxx,
                 CAST(sum(xh*cents) OVER b AS DOUBLE) AS sxy
          FROM x
          WINDOW b AS (PARTITION BY user_id ORDER BY us
                       RANGE BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING)
        )
        SELECT event_id,
               round(CASE WHEN n >= 2 AND sxx - sx*sx/n > 0 THEN
                 (sy - ((sxy - sx*sy/n) / (sxx - sx*sx/n)) * sx) / n
                 + ((sxy - sx*sy/n) / (sxx - sx*sx/n))
                   * CAST(xh AS DOUBLE) END, 6) AS pred,
               round(CAST(cents AS DOUBLE)
                     - (CASE WHEN n >= 2 AND sxx - sx*sx/n > 0 THEN
                        (sy - ((sxy - sx*sy/n) / (sxx - sx*sx/n)) * sx)
                        / n
                        + ((sxy - sx*sy/n) / (sxx - sx*sx/n))
                          * CAST(xh AS DOUBLE) END), 6) AS resid
        FROM s
    """
    oracles["rrf"] = """
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings
        ), probes AS (
          SELECT vec_id AS probe_id, v AS p FROM e WHERE vec_id < 20
        ), pairs AS (
          SELECT probe_id, vec_id,
                 list_dot_product(p, v) AS dot,
                 list_dot_product(p, v)
                   / (sqrt(list_dot_product(p, p))
                      * sqrt(list_dot_product(v, v))) AS cos
          FROM probes, e WHERE probe_id <> vec_id
        ), rc AS (
          SELECT probe_id, vec_id,
                 ROW_NUMBER() OVER (PARTITION BY probe_id
                   ORDER BY cos DESC, vec_id ASC) AS rk
          FROM pairs
        ), rd AS (
          SELECT probe_id, vec_id,
                 ROW_NUMBER() OVER (PARTITION BY probe_id
                   ORDER BY dot DESC, vec_id ASC) AS rk
          FROM pairs
        ), contrib AS (
          SELECT probe_id, vec_id, 1.0 / (60 + rk) AS c
          FROM rc WHERE rk <= 20
          UNION ALL
          SELECT probe_id, vec_id, 1.0 / (60 + rk) AS c
          FROM rd WHERE rk <= 20
        ), fused AS (
          SELECT probe_id, vec_id,
                 list_reduce(list_prepend(0.0, list_sort(list(c))),
                             (a, x) -> a + x) AS rrf,
                 count(*) AS n_systems
          FROM contrib GROUP BY probe_id, vec_id
        )
        SELECT probe_id, rk, vec_id AS doc_id,
               round(rrf, 6) AS rrf,
               CAST(n_systems AS BIGINT) AS n_systems
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                      ORDER BY rrf DESC, vec_id ASC) AS rk
          FROM fused)
        WHERE rk <= 5
    """
    oracles["group_ols"] = """
        WITH q AS (
          SELECT user_id,
                 CAST(round(value*100) AS BIGINT) AS cents,
                 CAST(floor(epoch(ts)) AS BIGINT) AS sec
          FROM events
        ), x AS (
          SELECT user_id, cents,
                 CAST(floor((sec - min(sec) OVER
                             (PARTITION BY user_id)) / 3600.0)
                      AS BIGINT) AS xh
          FROM q
        ), s AS (
          SELECT user_id, count(*) AS n,
                 CAST(sum(xh) AS DOUBLE) AS sx,
                 CAST(sum(cents) AS DOUBLE) AS sy,
                 CAST(sum(xh*xh) AS DOUBLE) AS sxx,
                 CAST(sum(xh*cents) AS DOUBLE) AS sxy,
                 CAST(sum(cents*cents) AS DOUBLE) AS syy
          FROM x GROUP BY user_id
        )
        SELECT user_id, CAST(n AS BIGINT) AS n,
               round(CASE WHEN sxx - sx*sx/n > 0
                     THEN (sxy - sx*sy/n) / (sxx - sx*sx/n) END, 6)
                 AS slope,
               round(CASE WHEN sxx - sx*sx/n > 0
                     THEN (sy - ((sxy - sx*sy/n) / (sxx - sx*sx/n))
                                * sx) / n END, 6) AS intercept,
               round(CASE WHEN sxx - sx*sx/n > 0
                           AND syy - sy*sy/n > 0
                     THEN ((sxy - sx*sy/n) / (sxx - sx*sx/n))
                          * ((sxy - sx*sy/n) / (syy - sy*sy/n)) END,
                     6) AS r2
        FROM s
    """
    oracles["km_survival"] = """
        WITH g AS (
          SELECT event_type,
                 lead(CAST(epoch(ts) AS DOUBLE)) OVER
                   (PARTITION BY user_id ORDER BY epoch(ts), event_id)
                 - CAST(epoch(ts) AS DOUBLE) AS gap
          FROM events
        ), obs AS (
          SELECT event_type,
                 CASE WHEN gap IS NULL OR gap > 86400.0 THEN 24
                      ELSE CAST(floor(gap / 3600.0) AS BIGINT) END
                   AS duration,
                 CASE WHEN gap IS NULL OR gap > 86400.0 THEN 0
                      ELSE 1 END AS event
          FROM g
        ), per AS (
          SELECT event_type, duration,
                 CAST(sum(event) AS BIGINT) AS n_events,
                 CAST(count(*) - sum(event) AS BIGINT) AS n_censored
          FROM obs GROUP BY event_type, duration
        ), risk AS (
          SELECT *,
                 CAST(sum(n_events + n_censored) OVER
                        (PARTITION BY event_type)
                      - COALESCE(sum(n_events + n_censored) OVER
                          (PARTITION BY event_type ORDER BY duration
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS BIGINT)
                   AS n_at_risk
          FROM per
        )
        SELECT event_type, duration, n_at_risk, n_events, n_censored,
               round(list_reduce(
                 list_prepend(1.0,
                   list(1.0 - CAST(n_events AS DOUBLE)
                              / CAST(n_at_risk AS DOUBLE)) OVER
                     (PARTITION BY event_type ORDER BY duration
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW)),
                 (acc, x) -> acc * x), 6) AS survival
        FROM risk
    """
    oracles["auc"] = """
        WITH q AS (
          SELECT least(CAST(round(value*100) AS BIGINT), 2000) AS score,
                 CASE WHEN round(value*100) > 1000 THEN 1 ELSE 0 END
                   AS lbl
          FROM events
        ), per AS (
          SELECT score,
                 CAST(sum(lbl) AS BIGINT) AS pos,
                 CAST(count(*) - sum(lbl) AS BIGINT) AS neg
          FROM q GROUP BY score
        ), r AS (
          SELECT *,
                 COALESCE(sum(neg) OVER (ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS neg_below
          FROM per
        )
        SELECT round((CAST(sum(neg_below * pos) AS DOUBLE)
                      + CAST(sum(pos * neg) AS DOUBLE) / 2.0)
                     / (CAST(sum(pos) AS DOUBLE)
                        * CAST(sum(neg) AS DOUBLE)), 6) AS auc,
               CAST(sum(pos) AS BIGINT) AS n_pos,
               CAST(sum(neg) AS BIGINT) AS n_neg
        FROM r
    """
    oracles["trimmed_mean"] = """
        WITH q AS (
          SELECT CAST(round(value*100) AS BIGINT) AS cents
          FROM events
        ), per AS (
          SELECT cents, count(*) AS cnt FROM q GROUP BY cents
        ), t AS (
          SELECT cents, cnt,
                 COALESCE(sum(cnt) OVER (ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS below,
                 sum(cnt) OVER () AS n
          FROM per
        ), k AS (
          SELECT *, CAST(floor(n * 0.05) AS BIGINT) AS kk,
                 greatest(0, least(below + cnt, n - CAST(floor(n*0.05)
                            AS BIGINT))
                             - greatest(below, CAST(floor(n*0.05)
                            AS BIGINT))) AS kept
          FROM t
        )
        SELECT round(CAST(sum(cents * kept) AS DOUBLE)
                     / CAST(sum(kept) AS DOUBLE), 6) AS tmean,
               CAST(sum(kept) AS BIGINT) AS n_used,
               CAST(max(kk) AS BIGINT) AS n_trimmed_each_side,
               round(CAST(sum(cents * cnt) AS DOUBLE)
                     / CAST(sum(cnt) AS DOUBLE), 6) AS raw_mean
        FROM k
    """
    oracles["winsorized_mean"] = """
        WITH q AS (
          SELECT CAST(round(value*100) AS BIGINT) AS cents
          FROM events
        ), per AS (
          SELECT cents, count(*) AS cnt FROM q GROUP BY cents
        ), t AS (
          SELECT cents, cnt,
                 COALESCE(sum(cnt) OVER (ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS below,
                 sum(cnt) OVER () AS n
          FROM per
        ), k AS (
          SELECT *, CAST(floor(n * 0.05) AS BIGINT) AS kk,
                 greatest(0, least(below + cnt,
                                   n - CAST(floor(n*0.05) AS BIGINT))
                             - greatest(below,
                                   CAST(floor(n*0.05) AS BIGINT)))
                   AS kept
          FROM t
        )
        SELECT round(CAST(sum(cents * kept)
                          + max(kk) * (min(CASE WHEN below + cnt > kk
                                           THEN cents END)
                                       + max(CASE WHEN below < n - kk
                                             THEN cents END))
                          AS DOUBLE) / CAST(max(n) AS DOUBLE), 6)
                 AS wmean,
               CAST(min(CASE WHEN below + cnt > kk THEN cents END)
                    AS BIGINT) AS lo_clamp,
               CAST(max(CASE WHEN below < n - kk THEN cents END)
                    AS BIGINT) AS hi_clamp,
               CAST(max(n) AS BIGINT) AS n
        FROM k
    """
    oracles["ks_drift"] = """
        WITH q AS (
          SELECT CAST(round(value*100) AS BIGINT) AS cents,
                 CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 1 ELSE 0
                 END AS r
          FROM events
        ), per AS (
          SELECT cents,
                 CAST(sum(r) AS BIGINT) AS a,
                 CAST(count(*) - sum(r) AS BIGINT) AS b
          FROM q GROUP BY cents
        ), t AS (
          SELECT cents,
                 abs(sum(a) OVER w / (sum(a) OVER () * 1.0)
                     - sum(b) OVER w / (sum(b) OVER () * 1.0)) AS gap,
                 sum(a) OVER () AS na,
                 sum(b) OVER () AS nb
          FROM per
          WINDOW w AS (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)
        ), m AS (
          SELECT *, max(gap) OVER () AS best FROM t
        )
        SELECT round(max(best), 6) AS ks,
               CAST(min(cents) AS BIGINT) AS at_value,
               CAST(max(na) AS BIGINT) AS n_ref,
               CAST(max(nb) AS BIGINT) AS n_cur
        FROM m WHERE gap = best
    """
    oracles["wasserstein_drift"] = """
        WITH q AS (
          SELECT CAST(round(value*100) AS BIGINT) AS cents,
                 CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 1 ELSE 0
                 END AS r
          FROM events
        ), per AS (
          SELECT cents,
                 CAST(sum(r) AS BIGINT) AS a,
                 CAST(count(*) - sum(r) AS BIGINT) AS b
          FROM q GROUP BY cents
        ), t AS (
          SELECT cents,
                 CAST(sum(a) OVER w AS BIGINT) AS acum,
                 CAST(sum(b) OVER w AS BIGINT) AS bcum,
                 CAST(sum(a) OVER () AS BIGINT) AS na,
                 CAST(sum(b) OVER () AS BIGINT) AS nb,
                 COALESCE(lead(cents) OVER (ORDER BY cents) - cents,
                          0) AS dv
          FROM per
          WINDOW w AS (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)
        )
        SELECT round(CAST(sum(abs(acum * nb - bcum * na) * dv)
                          AS DOUBLE)
                     / CAST(max(na) * max(nb) AS DOUBLE), 6) AS w1,
               CAST(max(na) AS BIGINT) AS n_ref,
               CAST(max(nb) AS BIGINT) AS n_cur
        FROM t
    """
    oracles["seasonality"] = """
        WITH c1 AS (
          SELECT user_id,
                 (epoch_us(ts) // 3600000000) % 24 AS phase,
                 abs(CAST(round(value*100) AS BIGINT)) AS v
          FROM events
        ), per AS (
          SELECT user_id, phase,
                 CAST(sum(v) AS BIGINT) AS sp,
                 CAST(count(*) AS BIGINT) AS np,
                 CAST(sum(v*v) AS BIGINT) AS qp
          FROM c1 GROUP BY user_id, phase
        ), agg AS (
          SELECT user_id,
                 CAST(sum(sp) AS BIGINT) AS s,
                 CAST(sum(np) AS BIGINT) AS n,
                 CAST(sum(qp) AS BIGINT) AS q,
                 list_sort(list([phase, sp, np])) AS ph
          FROM per GROUP BY user_id
        )
        SELECT user_id, n, CAST(len(ph) AS BIGINT) AS n_phases,
               round(CASE WHEN CAST(q AS DOUBLE)
                               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                 / CAST(n AS DOUBLE) = 0 THEN NULL
                     ELSE (list_reduce(list_prepend(0.0,
                             list_transform(ph, p ->
                               CAST(p[2] AS DOUBLE)
                               * CAST(p[2] AS DOUBLE)
                               / CAST(p[3] AS DOUBLE))),
                             (x, y) -> x + y)
                           - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                             / CAST(n AS DOUBLE))
                          / (CAST(q AS DOUBLE)
                             - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                               / CAST(n AS DOUBLE))
                     END, 6) AS eta2
        FROM agg
    """
    oracles["ts_profile"] = """
        WITH c1 AS (
          SELECT user_id, ts, event_id,
                 abs(CAST(round(value*100) AS BIGINT)) AS v
          FROM events
        ), c2 AS (
          SELECT user_id, v,
                 row_number() OVER w AS idx,
                 lag(v) OVER w AS prev,
                 lead(v) OVER w AS nxt,
                 sum(v) OVER (PARTITION BY user_id) AS s_tot,
                 count(*) OVER (PARTITION BY user_id) AS n_tot,
                 max(v) OVER (PARTITION BY user_id) AS v_max
          FROM c1
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), main AS (
          SELECT user_id,
                 CAST(max(n_tot) AS BIGINT) AS n,
                 CAST(sum(v*v) AS BIGINT) AS abs_energy,
                 round(CASE WHEN max(n_tot) > 1 THEN
                         CAST(sum(abs(v - prev)) AS DOUBLE)
                         / CAST(max(n_tot) - 1 AS DOUBLE)
                       ELSE NULL END, 6) AS mean_abs_change,
                 CAST(sum(CASE WHEN prev IS NOT NULL
                               AND nxt IS NOT NULL
                               AND v > prev AND v > nxt
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_peaks,
                 CAST(sum(CASE WHEN v * n_tot > s_tot
                          THEN 1 ELSE 0 END) AS BIGINT)
                   AS count_above_mean,
                 CAST(min(CASE WHEN v = v_max THEN idx END)
                      AS BIGINT) AS first_max_idx,
                 CAST(max(CASE WHEN v = v_max THEN idx END)
                      AS BIGINT) AS last_max_idx
          FROM c2 GROUP BY user_id
        ), isl AS (
          SELECT user_id,
                 idx - row_number() OVER (PARTITION BY user_id
                                          ORDER BY idx) AS grp
          FROM c2 WHERE v * n_tot > s_tot
        ), runs AS (
          SELECT user_id, CAST(max(cnt) AS BIGINT) AS longest_above
          FROM (SELECT user_id, grp, count(*) AS cnt
                FROM isl GROUP BY user_id, grp)
          GROUP BY user_id
        )
        SELECT main.user_id, n, abs_energy, mean_abs_change, n_peaks,
               count_above_mean,
               COALESCE(runs.longest_above, 0) AS longest_above,
               first_max_idx, last_max_idx
        FROM main LEFT JOIN runs USING (user_id)
    """
    oracles["sax"] = """
        WITH c1 AS (
          SELECT user_id, ts, event_id,
                 abs(CAST(round(value*100) AS BIGINT)) AS v
          FROM events
        ), c2 AS (
          SELECT user_id, v,
                 row_number() OVER w AS idx,
                 count(*) OVER (PARTITION BY user_id) AS n,
                 sum(v) OVER (PARTITION BY user_id) AS s,
                 sum(v*v) OVER (PARTITION BY user_id) AS ssq
          FROM c1
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), segd AS (
          SELECT user_id, ((idx - 1) * 8) // n AS seg, v, n, s, ssq
          FROM c2 WHERE n >= 8
        ), per_seg AS (
          SELECT user_id, seg,
                 sum(v) AS sm, count(*) AS sc,
                 max(n) AS n, max(s) AS s, max(ssq) AS ssq
          FROM segd GROUP BY user_id, seg
        ), sym AS (
          SELECT user_id, seg, n,
                 CASE
                   WHEN n*ssq - s*s = 0 THEN
                     CASE WHEN 0.0 < -0.6744897501960817 THEN 'a'
                          WHEN 0.0 < 0.0 THEN 'b'
                          WHEN 0.0 < 0.6744897501960817 THEN 'c'
                          ELSE 'd' END
                   ELSE
                     CASE
                       WHEN (CAST(sm AS DOUBLE) / CAST(sc AS DOUBLE)
                             - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                            / (sqrt(CAST(n*ssq - s*s AS DOUBLE))
                               / CAST(n AS DOUBLE))
                            < -0.6744897501960817 THEN 'a'
                       WHEN (CAST(sm AS DOUBLE) / CAST(sc AS DOUBLE)
                             - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                            / (sqrt(CAST(n*ssq - s*s AS DOUBLE))
                               / CAST(n AS DOUBLE))
                            < 0.0 THEN 'b'
                       WHEN (CAST(sm AS DOUBLE) / CAST(sc AS DOUBLE)
                             - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                            / (sqrt(CAST(n*ssq - s*s AS DOUBLE))
                               / CAST(n AS DOUBLE))
                            < 0.6744897501960817 THEN 'c'
                       ELSE 'd' END
                 END AS sym
          FROM per_seg
        )
        SELECT user_id, CAST(max(n) AS BIGINT) AS n,
               string_agg(sym, '' ORDER BY seg) AS sax
        FROM sym GROUP BY user_id
    """
    oracles["decimal_agg"] = """
        WITH d AS (
          SELECT event_type,
                 CAST(round(value, 2) AS DECIMAL(18,2)) AS d
          FROM events
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(CAST(sum(d) AS DECIMAL(38,2)) AS VARCHAR)
                 AS total,
               CAST(min(d) AS VARCHAR) AS vmin,
               CAST(max(d) AS VARCHAR) AS vmax
        FROM d GROUP BY event_type
    """
    oracles["rollup_agg"] = """
        SELECT event_type,
               dayofweek(ts) + 1 AS dow,
               CAST(SUM(CAST(round(value * 100) AS BIGINT))
                    AS BIGINT) AS cents,
               COUNT(*) AS n,
               CAST(GROUPING(event_type) * 2
                    + GROUPING(dayofweek(ts) + 1) AS BIGINT) AS gid
        FROM events
        GROUP BY ROLLUP (event_type, dayofweek(ts) + 1)
    """
    oracles["record_linkage"] = """
        WITH base AS (
          SELECT c_custkey, c_nationkey, c_name, c_mktsegment,
                 CAST(round(c_acctbal*100) AS BIGINT) AS cents
          FROM customer
        ), twin AS (
          SELECT c_custkey AS t_custkey,
                 c_nationkey AS t_nationkey,
                 CASE WHEN c_custkey % 3 = 0 THEN reverse(c_name)
                      ELSE c_name END AS t_name,
                 CASE WHEN c_custkey % 7 = 0 THEN 'OTHER'
                      ELSE c_mktsegment END AS t_seg,
                 cents + CASE WHEN c_custkey % 5 = 0 THEN 100
                              ELSE 0 END AS t_cents
          FROM base
        ), pairs AS (
          SELECT b.*, t.*,
                 b.c_custkey = t.t_custkey AS mt,
                 b.c_name = t.t_name AS ag_name,
                 b.c_mktsegment = t.t_seg AS ag_seg,
                 b.cents = t.t_cents AS ag_bal
          FROM base b JOIN twin t
            ON b.c_nationkey = t.t_nationkey
        ), one AS (
          SELECT CAST(sum(CASE WHEN mt THEN 1 ELSE 0 END) AS BIGINT)
                   AS m_den,
                 CAST(sum(CASE WHEN NOT mt THEN 1 ELSE 0 END)
                      AS BIGINT) AS u_den,
                 CAST(sum(CASE WHEN mt AND ag_name THEN 1 ELSE 0 END)
                      AS BIGINT) AS m_name,
                 CAST(sum(CASE WHEN NOT mt AND ag_name THEN 1
                          ELSE 0 END) AS BIGINT) AS u_name,
                 CAST(sum(CASE WHEN mt AND ag_seg THEN 1 ELSE 0 END)
                      AS BIGINT) AS m_seg,
                 CAST(sum(CASE WHEN NOT mt AND ag_seg THEN 1
                          ELSE 0 END) AS BIGINT) AS u_seg,
                 CAST(sum(CASE WHEN mt AND ag_bal THEN 1 ELSE 0 END)
                      AS BIGINT) AS m_bal,
                 CAST(sum(CASE WHEN NOT mt AND ag_bal THEN 1
                          ELSE 0 END) AS BIGINT) AS u_bal
          FROM pairs
        ), long AS (
          SELECT 'name' AS field, m_name AS m_num, m_den,
                 u_name AS u_num, u_den FROM one
          UNION ALL
          SELECT 'segment', m_seg, m_den, u_seg, u_den FROM one
          UNION ALL
          SELECT 'balance', m_bal, m_den, u_bal, u_den FROM one
        )
        SELECT field, m_num, m_den, u_num, u_den,
               round(ln((CAST(m_num + 1 AS DOUBLE)
                         / CAST(m_den + 2 AS DOUBLE))
                        / (CAST(u_num + 1 AS DOUBLE)
                           / CAST(u_den + 2 AS DOUBLE))), 6)
                 AS weight
        FROM long
    """
    oracles["tpch_q10"] = """
        SELECT c.c_custkey, c.c_name, n.n_name,
               CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(round(l.l_discount*100)
                                      AS BIGINT))) AS BIGINT)
                 AS revenue_e4,
               CAST(round(max(c.c_acctbal)*100) AS BIGINT)
                 AS acctbal_cents
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-04-01'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue_e4 DESC, c.c_custkey
        LIMIT 20
    """
    oracles["tpch_q14"] = """
        WITH j AS (
          SELECT CAST(round(l.l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount*100) AS BIGINT))
                   AS rev,
                 p.p_type
          FROM lineitem l
          JOIN part p ON p.p_partkey = l.l_partkey
          WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
            AND l.l_shipdate < TIMESTAMP '1996-04-01'
        ), agg AS (
          SELECT CAST(sum(CASE WHEN p_type = 'ECONOMY' THEN rev
                          ELSE 0 END) AS BIGINT) AS promo_e4,
                 CAST(sum(rev) AS BIGINT) AS total_e4
          FROM j
        )
        SELECT promo_e4, total_e4,
               round(100.0 * CAST(promo_e4 AS DOUBLE)
                     / CAST(total_e4 AS DOUBLE), 6) AS promo_pct
        FROM agg
    """
    oracles["changepoint"] = """
        WITH c1 AS (
          SELECT user_id, ts, event_id,
                 abs(CAST(round(value*100) AS BIGINT)) AS v
          FROM events
        ), c2 AS (
          SELECT user_id, v,
                 row_number() OVER w AS idx,
                 sum(v) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS sl,
                 sum(v) OVER (PARTITION BY user_id) AS s,
                 count(*) OVER (PARTITION BY user_id) AS n
          FROM c1
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), scored AS (
          SELECT user_id, n, idx, sl, s,
                 CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)
                   / CAST(idx AS DOUBLE)
                 + CAST(s - sl AS DOUBLE) * CAST(s - sl AS DOUBLE)
                   / CAST(n - idx AS DOUBLE)
                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                   / CAST(n AS DOUBLE) AS gain
          FROM c2 WHERE idx < n
        ), best AS (
          SELECT user_id, n, idx, sl, s, gain,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY gain DESC, idx ASC)
                   AS rn
          FROM scored
        )
        SELECT user_id, CAST(n AS BIGINT) AS n,
               CAST(idx AS BIGINT) AS split_idx,
               gain,
               round(CAST(sl AS DOUBLE) / CAST(idx AS DOUBLE), 6)
                 AS left_mean,
               round(CAST(s - sl AS DOUBLE)
                     / CAST(n - idx AS DOUBLE), 6) AS right_mean
        FROM best WHERE rn = 1
    """
    _ks_feats = [
        ("f_parity", "cents % 2"), ("f_mod5", "cents % 5"),
        ("f_seven2", "(cents // 7) % 2"),
        ("f_seven4", "(cents // 7) % 4"),
        ("f_hour", "(epoch_us(ts) // 3600000000) % 24"),
        ("f_typelen", "CAST(length(event_type) AS BIGINT)"),
    ]
    _ks_unions = "\n          UNION ALL ".join(
        f"SELECT '{n}' AS feature, {e} AS value, ref FROM q"
        for n, e in _ks_feats)
    oracles["ks_by_feature"] = f"""
        WITH q AS (
          SELECT abs(CAST(round(value*100) AS BIGINT)) AS cents,
                 ts, event_type,
                 ts < TIMESTAMP '2024-01-15' AS ref
          FROM events
        ), rlong AS (
          {_ks_unions}
        ), per AS (
          SELECT feature, value,
                 CAST(sum(CASE WHEN ref THEN 1 ELSE 0 END)
                      AS BIGINT) AS a,
                 CAST(sum(CASE WHEN ref THEN 0 ELSE 1 END)
                      AS BIGINT) AS b
          FROM rlong WHERE value IS NOT NULL
          GROUP BY feature, value
        ), t AS (
          SELECT feature, value,
                 abs(CAST(sum(a) OVER w AS DOUBLE)
                     / CAST(sum(a) OVER g AS DOUBLE)
                     - CAST(sum(b) OVER w AS DOUBLE)
                       / CAST(sum(b) OVER g AS DOUBLE)) AS gap,
                 CAST(sum(a) OVER g AS BIGINT) AS na,
                 CAST(sum(b) OVER g AS BIGINT) AS nb
          FROM per
          WINDOW w AS (PARTITION BY feature ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW),
                 g AS (PARTITION BY feature)
        ), m AS (
          SELECT *, max(gap) OVER (PARTITION BY feature) AS best
          FROM t
        )
        SELECT feature, round(max(best), 6) AS ks,
               CAST(min(value) AS BIGINT) AS at_value,
               CAST(max(na) AS BIGINT) AS n_ref,
               CAST(max(nb) AS BIGINT) AS n_cur
        FROM m WHERE gap = best GROUP BY feature
    """
    oracles["fdr_bh"] = f"""
        WITH q AS (
          SELECT abs(CAST(round(value*100) AS BIGINT)) AS cents,
                 ts, event_type,
                 ts < TIMESTAMP '2024-01-15' AS ref
          FROM events
        ), rlong AS (
          {_ks_unions}
        ), per AS (
          SELECT feature, value,
                 CAST(sum(CASE WHEN ref THEN 1 ELSE 0 END)
                      AS BIGINT) AS a,
                 CAST(sum(CASE WHEN ref THEN 0 ELSE 1 END)
                      AS BIGINT) AS b
          FROM rlong WHERE value IS NOT NULL
          GROUP BY feature, value
        ), t AS (
          SELECT feature, value,
                 abs(CAST(sum(a) OVER w AS DOUBLE)
                     / CAST(sum(a) OVER g AS DOUBLE)
                     - CAST(sum(b) OVER w AS DOUBLE)
                       / CAST(sum(b) OVER g AS DOUBLE)) AS gap,
                 CAST(sum(a) OVER g AS BIGINT) AS na,
                 CAST(sum(b) OVER g AS BIGINT) AS nb
          FROM per
          WINDOW w AS (PARTITION BY feature ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW),
                 g AS (PARTITION BY feature)
        ), ks AS (
          SELECT feature, max(gap) AS d,
                 CAST(max(na) AS BIGINT) AS na,
                 CAST(max(nb) AS BIGINT) AS nb
          FROM t GROUP BY feature
        ), pv AS (
          SELECT feature, d,
                 least(CAST(1.0 AS DOUBLE),
                       CAST(2.0 AS DOUBLE)
                       * exp(CAST(-2.0 AS DOUBLE)
                             * (CAST(na AS DOUBLE)
                                * CAST(nb AS DOUBLE)
                                / (CAST(na AS DOUBLE)
                                   + CAST(nb AS DOUBLE)))
                             * d * d)) AS p
          FROM ks
        ), rk AS (
          SELECT feature AS key, d, p,
                 row_number() OVER (ORDER BY p ASC, feature ASC)
                   AS rank,
                 CAST(count(*) OVER () AS BIGINT) AS m
          FROM pv
        ), fl AS (
          SELECT *,
                 CAST(rank AS DOUBLE) * CAST(0.05 AS DOUBLE)
                 / CAST(m AS DOUBLE) AS bh_threshold,
                 max(CASE WHEN p <= CAST(rank AS DOUBLE)
                              * CAST(0.05 AS DOUBLE)
                              / CAST(m AS DOUBLE)
                     THEN rank END) OVER () AS kstar
          FROM rk
        )
        SELECT key AS feature, round(d, 6) AS ks, round(p, 6) AS p,
               CAST(rank AS INTEGER) AS rank, m,
               round(bh_threshold, 6) AS bh_threshold,
               CASE WHEN kstar IS NULL THEN FALSE
                    ELSE rank <= kstar END AS reject
        FROM fl
    """
    from hiselspark.operators.bootstrap import _M31 as _m31
    from hiselspark.operators.bootstrap import cw_constants as _cwc
    from hiselspark.operators.sampling import NEG_SAMPLE_SEED
    (_na, _nc), = _cwc(1, NEG_SAMPLE_SEED)
    oracles["negative_samples"] = f"""
        WITH pos AS (
          SELECT DISTINCT l_orderkey AS u,
                 l_partkey % 2000 AS it
          FROM lineitem WHERE l_orderkey <= 3000
        ), x AS (
          SELECT u, it, CAST(s AS INTEGER) AS slot,
                 (((u * 1000003 + it) * 3 + s) % {_m31}) * {_na}
                 + {_nc} AS draw0
          FROM pos, unnest(generate_series(1, 3)) AS t(s)
        ), d AS (
          SELECT u, it, slot,
                 (draw0 % {_m31}) % 2000 AS neg0
          FROM x
        )
        SELECT u, CAST(it AS BIGINT) AS it, slot,
               CAST(CASE WHEN neg0 = it THEN (neg0 + 1) % 2000
                    ELSE neg0 END AS BIGINT) AS neg_item
        FROM d
    """
    oracles["hll_contract"] = """
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT)
                 AS exact_users,
               TRUE AS approx_within_5pct
        FROM events GROUP BY event_type
    """
    from hiselspark.operators.encoding import FEATURE_HASH_SEED
    (_fa1, _fc1), (_fa2, _fc2) = _cwc(2, FEATURE_HASH_SEED)
    oracles["feature_hashing"] = f"""
        WITH h AS (
          SELECT user_id,
                 list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(str_split(event_type, ''),
                     ch -> CAST(ascii(ch) AS BIGINT))),
                   (acc, y) -> (acc * 31 + y) % {_m31}) AS hv
          FROM events
        )
        SELECT user_id,
               CAST(((hv * {_fa1} + {_fc1}) % {_m31}) % 16
                    AS BIGINT) AS bucket,
               CAST(sum(CASE WHEN ((hv * {_fa2} + {_fc2}) % {_m31})
                                  % 2 = 0
                        THEN 1 ELSE -1 END) AS BIGINT)
                 AS signed_count
        FROM h
        GROUP BY user_id, ((hv * {_fa1} + {_fc1}) % {_m31}) % 16
    """
    oracles["best_threshold"] = """
        WITH q AS (
          SELECT abs(CAST(round(value*100) AS BIGINT)) AS cents
          FROM events
        ), scored AS (
          SELECT cents % 97 AS s,
                 CASE WHEN (cents // 7) % 3 = 0 THEN 1 ELSE 0 END
                   AS lbl
          FROM q
        ), per AS (
          SELECT s, CAST(sum(lbl) AS BIGINT) AS pos,
                 CAST(count(*) AS BIGINT) AS tot
          FROM scored GROUP BY s
        ), cur AS (
          SELECT s,
                 CAST(sum(pos) OVER w AS BIGINT) AS tp,
                 CAST(sum(tot) OVER w AS BIGINT) AS pp,
                 CAST(sum(pos) OVER () AS BIGINT) AS p
          FROM per
          WINDOW w AS (ORDER BY s DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)
        ), f AS (
          SELECT s, tp, pp, p,
                 2.0 * CAST(tp AS DOUBLE)
                 / CAST(pp + p AS DOUBLE) AS f1,
                 row_number() OVER (ORDER BY 2.0 * CAST(tp AS DOUBLE)
                                    / CAST(pp + p AS DOUBLE) DESC,
                                    s DESC) AS rn
          FROM cur
        )
        SELECT CAST(s AS BIGINT) AS threshold, tp,
               CAST(pp - tp AS BIGINT) AS fp,
               CAST(p - tp AS BIGINT) AS fn,
               round(CAST(tp AS DOUBLE) / CAST(pp AS DOUBLE), 6)
                 AS precision,
               round(CAST(tp AS DOUBLE) / CAST(p AS DOUBLE), 6)
                 AS recall,
               round(f1, 6) AS f1
        FROM f WHERE rn = 1
    """
    oracles["conformal"] = """
        WITH e AS (
          SELECT event_type AS grp, event_id % 2 = 0 AS cal,
                 abs(CAST(round(value*100) AS BIGINT)) AS v
          FROM events
        ), cs AS (
          SELECT grp,
                 CAST(sum(CASE WHEN cal THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_cal,
                 CAST(sum(CASE WHEN cal THEN v ELSE 0 END)
                      AS BIGINT) AS s_cal,
                 CAST(sum(CASE WHEN NOT cal THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_test
          FROM e GROUP BY grp
        ), r AS (
          SELECT e.grp, e.cal,
                 abs(e.v * cs.n_cal - cs.s_cal) AS r,
                 cs.n_cal, cs.s_cal, cs.n_test,
                 ((cs.n_cal + 1) * 9 + 9) // 10 AS k
          FROM e JOIN cs USING (grp)
        ), counts AS (
          SELECT grp, r, CAST(count(*) AS BIGINT) AS c,
                 max(k) AS k, max(n_cal) AS n_cal
          FROM r WHERE cal GROUP BY grp, r
        ), qrow AS (
          SELECT grp, CAST(min(r) AS BIGINT) AS q_scaled
          FROM (SELECT grp, r, k,
                       sum(c) OVER (PARTITION BY grp ORDER BY r
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) AS cum
                FROM counts)
          WHERE cum >= k GROUP BY grp
        ), cov AS (
          SELECT r.grp,
                 CAST(sum(CASE WHEN q.q_scaled IS NULL
                               OR r.r <= q.q_scaled
                          THEN 1 ELSE 0 END) AS BIGINT) AS covered
          FROM r LEFT JOIN qrow q USING (grp)
          WHERE NOT r.cal GROUP BY r.grp
        )
        SELECT cs.grp AS event_type, cs.n_cal, cs.n_test,
               CAST(((cs.n_cal + 1) * 9 + 9) // 10 AS BIGINT) AS k,
               q.q_scaled,
               round(CASE WHEN cs.n_cal > 0 THEN
                       CAST(q.q_scaled AS DOUBLE)
                       / CAST(cs.n_cal AS DOUBLE) END, 6) AS q,
               COALESCE(cov.covered, 0) AS covered,
               round(CASE WHEN cs.n_test > 0 THEN
                       CAST(COALESCE(cov.covered, 0) AS DOUBLE)
                       / CAST(cs.n_test AS DOUBLE) END, 6)
                 AS coverage
        FROM cs
        LEFT JOIN qrow q ON q.grp = cs.grp
        LEFT JOIN cov ON cov.grp = cs.grp
    """
    oracles["cohen_kappa"] = """
        WITH q AS (
          SELECT abs(CAST(round(value*100) AS BIGINT)) AS cents
          FROM events
        ), cells AS (
          SELECT cents % 4 AS r1, (cents // 3) % 4 AS r2,
                 CAST(count(*) AS BIGINT) AS c
          FROM q GROUP BY 1, 2
        ), marg AS (
          SELECT CAST(sum(rw.row_c * cl.col_c) AS BIGINT) AS cross_s
          FROM (SELECT r1, CAST(sum(c) AS BIGINT) AS row_c
                FROM cells GROUP BY r1) rw
          JOIN (SELECT r2, CAST(sum(c) AS BIGINT) AS col_c
                FROM cells GROUP BY r2) cl ON rw.r1 = cl.r2
        ), tot AS (
          SELECT CAST(sum(c) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN r1 = r2 THEN c ELSE 0 END)
                      AS BIGINT) AS n_agree
          FROM cells
        )
        SELECT n, n_agree, cross_s AS chance_cross,
               round(CAST(n * n_agree - cross_s AS DOUBLE)
                     / CAST(n * n - cross_s AS DOUBLE), 6) AS kappa
        FROM tot, marg
    """
    oracles["pareto_front"] = """
        WITH agg AS (
          SELECT user_id,
                 CAST(max(abs(CAST(round(value*100) AS BIGINT)))
                      AS BIGINT) AS max_cents,
                 CAST(count(*) AS BIGINT) AS n_events
          FROM events GROUP BY user_id
        )
        SELECT user_id, max_cents, n_events FROM agg p
        WHERE NOT EXISTS (
          SELECT 1 FROM agg q
          WHERE q.max_cents >= p.max_cents
            AND q.n_events >= p.n_events
            AND (q.max_cents > p.max_cents
                 OR q.n_events > p.n_events))
    """
    oracles["triangle_count"] = """
        WITH canon AS (
          SELECT DISTINCT
                 least(l_orderkey % 2000, l_partkey % 2000) AS a,
                 greatest(l_orderkey % 2000, l_partkey % 2000) AS b
          FROM lineitem
          WHERE l_orderkey % 2000 <> l_partkey % 2000
        ), nodes AS (
          SELECT count(DISTINCT node) AS n_nodes FROM (
            SELECT a AS node FROM canon
            UNION ALL SELECT b FROM canon)
        )
        SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
               CAST((SELECT count(*) FROM canon) AS BIGINT) AS n_edges,
               CAST((SELECT count(*)
                     FROM canon ab
                     JOIN canon bc ON ab.b = bc.a
                     JOIN canon ac ON ac.a = ab.a AND ac.b = bc.b)
                    AS BIGINT) AS n_triangles
        FROM nodes
    """
    oracles["isotonic"] = """
        WITH e AS (
          SELECT event_type AS grp,
                 abs(CAST(round(value*100) AS BIGINT)) AS cents,
                 event_id
          FROM events WHERE event_id % 37 = 0
        ), r AS (
          SELECT grp, cents % 97 AS x, event_id AS o, cents % 5 AS y,
                 row_number() OVER (PARTITION BY grp
                                    ORDER BY cents % 97, event_id)
                   AS i
          FROM e
        ), pref AS (
          SELECT grp, CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS s
          FROM (SELECT DISTINCT grp FROM r)
          UNION ALL
          SELECT grp, i,
                 CAST(sum(y) OVER (PARTITION BY grp ORDER BY i)
                      AS BIGINT) AS s
          FROM r
        ), vert AS (
          SELECT p.grp, p.i, p.s FROM pref p
          WHERE NOT EXISTS (
            SELECT 1 FROM pref k, pref j
            WHERE k.grp = p.grp AND j.grp = p.grp
              AND k.i < p.i AND j.i > p.i
              AND p.s * (j.i - k.i)
                  > k.s * (j.i - p.i) + j.s * (p.i - k.i))
        ), seg AS (
          SELECT r.grp, r.i, r.x, r.y,
                 (SELECT max(v.i) FROM vert v
                  WHERE v.grp = r.grp AND v.i <= r.i - 1) AS kk,
                 (SELECT min(v.i) FROM vert v
                  WHERE v.grp = r.grp AND v.i >= r.i) AS jj
          FROM r
        )
        SELECT seg.grp AS event_type,
               CAST(seg.i AS BIGINT) AS idx,
               CAST(seg.x AS BIGINT) AS x,
               CAST(seg.y AS BIGINT) AS y,
               round(CAST(pj.s - pk.s AS DOUBLE)
                     / CAST(seg.jj - seg.kk AS DOUBLE), 6) AS fitted
        FROM seg
        JOIN pref pk ON pk.grp = seg.grp AND pk.i = seg.kk
        JOIN pref pj ON pj.grp = seg.grp AND pj.i = seg.jj
    """
    oracles["attribution"] = """
        WITH e AS (
          SELECT user_id AS entity, event_id, event_type,
                 epoch_us(ts) AS t
          FROM events
        ), conv AS (
          SELECT entity, event_id AS conv_id, t AS conv_t_us
          FROM e WHERE event_type = 'purchase'
        ), touch AS (
          SELECT entity, event_id AS tid, t AS tt
          FROM e WHERE event_type IN ('view', 'click')
        ), pairs AS (
          SELECT c.entity, c.conv_id, c.conv_t_us, t.tid, t.tt,
                 row_number() OVER (PARTITION BY c.conv_id
                                    ORDER BY t.tt ASC, t.tid ASC)
                   AS rf,
                 row_number() OVER (PARTITION BY c.conv_id
                                    ORDER BY t.tt DESC, t.tid DESC)
                   AS rl
          FROM conv c JOIN touch t
            ON c.entity = t.entity
           AND t.tt BETWEEN c.conv_t_us
                            - CAST(7*86400 AS BIGINT)*1000000
                        AND c.conv_t_us
        ), ft AS (
          SELECT conv_id, tid AS first_touch_id FROM pairs
          WHERE rf = 1
        ), lt AS (
          SELECT conv_id, tid AS last_touch_id,
                 conv_t_us - tt AS last_latency_us
          FROM pairs WHERE rl = 1
        )
        SELECT c.entity, c.conv_id, c.conv_t_us,
               ft.first_touch_id, lt.last_touch_id,
               lt.last_latency_us
        FROM conv c
        LEFT JOIN ft USING (conv_id)
        LEFT JOIN lt USING (conv_id)
    """
    def _kcore_oracle_sql(k: int = 45, rounds: int = 6) -> str:
        parts = ["""e0 AS MATERIALIZED (
          SELECT DISTINCT
                 least(l_orderkey % 2000, l_partkey % 2000) AS a,
                 greatest(l_orderkey % 2000, l_partkey % 2000) AS b
          FROM lineitem
          WHERE l_orderkey % 2000 <> l_partkey % 2000
        )"""]
        for r in range(rounds):
            parts.append(f"""d{r} AS MATERIALIZED (
          SELECT node, count(*) AS deg FROM (
            SELECT a AS node FROM e{r}
            UNION ALL SELECT b FROM e{r})
          GROUP BY node
        )""")
            parts.append(f"""k{r} AS (
          SELECT node FROM d{r} WHERE deg >= {k}
        )""")
            parts.append(f"""e{r + 1} AS MATERIALIZED (
          SELECT a, b FROM e{r}
          WHERE a IN (SELECT node FROM k{r})
            AND b IN (SELECT node FROM k{r})
        )""")
        return ("WITH " + ",\n        ".join(parts) + f"""
        SELECT node, CAST(count(*) AS BIGINT) AS core_deg FROM (
          SELECT a AS node FROM e{rounds}
          UNION ALL SELECT b FROM e{rounds})
        GROUP BY node
    """)
    oracles["kcore"] = _kcore_oracle_sql()
    oracles["assortativity"] = """
        WITH canon AS (
          SELECT DISTINCT
                 least(l_orderkey % 2000, l_partkey % 2000) AS a,
                 greatest(l_orderkey % 2000, l_partkey % 2000) AS b
          FROM lineitem
          WHERE l_orderkey % 2000 <> l_partkey % 2000
        ), deg AS (
          SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
            SELECT a AS node FROM canon
            UNION ALL SELECT b FROM canon)
          GROUP BY node
        ), prs AS (
          SELECT da.deg AS x, db.deg AS y
          FROM canon
          JOIN deg da ON da.node = canon.a
          JOIN deg db ON db.node = canon.b
        ), sym AS (
          SELECT x, y FROM prs
          UNION ALL SELECT y AS x, x AS y FROM prs
        ), agg AS (
          SELECT CAST(count(*) AS BIGINT) AS m2,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(x*y) AS BIGINT) AS sxy,
                 CAST(sum(x*x) AS BIGINT) AS sxx
          FROM sym
        )
        SELECT CAST(m2 // 2 AS BIGINT) AS n_edges,
               round(CASE WHEN CAST(m2 AS DOUBLE)
                               * CAST(sxx AS DOUBLE)
                               - CAST(sx AS DOUBLE)
                                 * CAST(sx AS DOUBLE) = 0
                          THEN NULL
                     ELSE (CAST(m2 AS DOUBLE) * CAST(sxy AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          / (CAST(m2 AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE)
                               * CAST(sx AS DOUBLE))
                     END, 6) AS r
        FROM agg
    """
    oracles["mann_kendall"] = """
        WITH e AS (
          SELECT user_id, epoch_us(ts) AS t, event_id AS o,
                 abs(CAST(round(value*100) AS BIGINT)) AS v,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC)
                   AS rn
          FROM events
        ), k AS (
          SELECT * FROM e WHERE rn <= 24
        ), cnt AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS n
          FROM k GROUP BY user_id
        ), s AS (
          SELECT a.user_id,
                 CAST(sum(CASE WHEN b.v > a.v THEN 1
                               WHEN b.v < a.v THEN -1
                               ELSE 0 END) AS BIGINT) AS s_stat
          FROM k a JOIN k b
            ON a.user_id = b.user_id
           AND (a.t < b.t OR (a.t = b.t AND a.o < b.o))
          GROUP BY a.user_id
        ), tie AS (
          SELECT user_id,
                 CAST(sum(c*(c-1)*(2*c+5)) AS BIGINT) AS tie18
          FROM (SELECT user_id, v, CAST(count(*) AS BIGINT) AS c
                FROM k GROUP BY user_id, v)
          GROUP BY user_id
        ), fin AS (
          SELECT cnt.user_id, cnt.n,
                 COALESCE(s.s_stat, 0) AS s_stat,
                 cnt.n*(cnt.n-1)*(2*cnt.n+5) - tie.tie18 AS var18
          FROM cnt
          LEFT JOIN s USING (user_id) JOIN tie USING (user_id)
        )
        SELECT user_id, n, s_stat, CAST(var18 AS BIGINT) AS var18,
               round(CASE WHEN s_stat = 0 OR var18 <= 0 THEN 0.0
                     ELSE (CAST(s_stat AS DOUBLE)
                           - sign(CAST(s_stat AS DOUBLE)))
                          / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                     END, 6) AS z
        FROM fin
    """
    oracles["theil_sen"] = """
        WITH e AS (
          SELECT user_id, epoch_us(ts) AS t, event_id AS o,
                 abs(CAST(round(value*100) AS BIGINT)) AS v,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC)
                   AS rn
          FROM events
        ), k AS (
          SELECT * FROM e WHERE rn <= 24
        ), cnt AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS n
          FROM k GROUP BY user_id
        ), med AS (
          SELECT a.user_id,
                 list_sort(list(CAST(b.v - a.v AS DOUBLE) * 1000000.0
                                / CAST(b.t - a.t AS DOUBLE))) AS sl
          FROM k a JOIN k b
            ON a.user_id = b.user_id AND a.t < b.t
          GROUP BY a.user_id
        )
        SELECT cnt.user_id, cnt.n,
               CAST(COALESCE(len(sl), 0) AS BIGINT) AS n_pairs,
               round(CASE WHEN len(sl) % 2 = 1
                          THEN sl[(len(sl)+1)//2]
                          ELSE (sl[len(sl)//2] + sl[len(sl)//2+1])
                               / 2.0 END, 6) AS slope
        FROM cnt LEFT JOIN med USING (user_id)
    """
    oracles["retrieval_eval"] = """
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings
        ), probes AS (
          SELECT vec_id AS probe_id, v AS p FROM e WHERE vec_id < 20
        ), pairs AS (
          SELECT probe_id, vec_id,
                 list_dot_product(p, v) AS dot,
                 list_dot_product(p, v)
                   / (sqrt(list_dot_product(p, p))
                      * sqrt(list_dot_product(v, v))) AS cos
          FROM probes, e WHERE probe_id <> vec_id
        ), truth AS (
          SELECT probe_id, vec_id FROM (
            SELECT probe_id, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY probe_id
                     ORDER BY cos DESC, vec_id ASC) AS rk
            FROM pairs) WHERE rk <= 5
        ), pred AS (
          SELECT probe_id, vec_id, rk FROM (
            SELECT probe_id, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY probe_id
                     ORDER BY dot DESC, vec_id ASC) AS rk
            FROM pairs) WHERE rk <= 10
        ), n_rel AS (
          SELECT probe_id, count(*) AS n_rel FROM truth
          GROUP BY probe_id
        ), hits AS (
          SELECT p.probe_id,
                 count(*) AS n_hit,
                 min(p.rk) AS first_hit
          FROM pred p JOIN truth t
            ON p.probe_id = t.probe_id AND p.vec_id = t.vec_id
          GROUP BY p.probe_id
        )
        SELECT n_rel.probe_id,
               CAST(n_rel AS BIGINT) AS n_rel,
               CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
               round(CAST(COALESCE(n_hit, 0) AS DOUBLE) / n_rel, 6)
                 AS recall,
               round(CAST(COALESCE(n_hit, 0) AS DOUBLE) / 10.0, 6)
                 AS precision,
               round(COALESCE(1.0 / first_hit, 0.0), 6) AS mrr
        FROM n_rel LEFT JOIN hits ON n_rel.probe_id = hits.probe_id
    """
    oracles["auc_weekly"] = """
        WITH q AS (
          SELECT least(CAST(round(value*100) AS BIGINT), 2000) AS score,
                 CASE WHEN round(value*100) > 1000 THEN 1 ELSE 0 END
                   AS lbl,
                 CAST(floor(CAST(epoch(ts) AS DOUBLE) / 604800.0)
                      AS BIGINT) AS week
          FROM events
        ), per AS (
          SELECT week, score,
                 CAST(sum(lbl) AS BIGINT) AS pos,
                 CAST(count(*) - sum(lbl) AS BIGINT) AS neg
          FROM q GROUP BY week, score
        ), r AS (
          SELECT *,
                 COALESCE(sum(neg) OVER (PARTITION BY week
                   ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING), 0)
                   AS neg_below
          FROM per
        ), a AS (
          SELECT week,
                 CAST(sum(neg_below * pos) AS BIGINT) AS u,
                 CAST(sum(pos * neg) AS BIGINT) AS t,
                 CAST(sum(pos) AS BIGINT) AS n_pos,
                 CAST(sum(neg) AS BIGINT) AS n_neg
          FROM r GROUP BY week
        )
        SELECT week,
               round(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                 (CAST(u AS DOUBLE) + CAST(t AS DOUBLE) / 2.0)
                 / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
                 END, 6) AS auc,
               n_pos, n_neg
        FROM a
    """
    oracles["calibration"] = """
        WITH q AS (
          SELECT least(CAST(round(value*100) AS BIGINT), 2000) AS score,
                 CASE WHEN round(value*100) > 1000 THEN 1 ELSE 0 END
                   AS lbl
          FROM events
        )
        SELECT least(CAST(floor(score * 10 / 2000) AS BIGINT), 9)
                 AS bin,
               count(*) AS n,
               CAST(sum(lbl) AS BIGINT) AS n_pos,
               round(CAST(sum(score) AS DOUBLE)
                     / (count(*) * 2000.0), 6) AS mean_pred,
               round(CAST(sum(lbl) AS DOUBLE) / count(*), 6)
                 AS frac_pos
        FROM q GROUP BY 1
    """
    oracles["confusion"] = """
        WITH q AS (
          SELECT least(CAST(round(value*100) AS BIGINT), 2000) AS score,
                 CASE WHEN round(value*100) > 1000 THEN 1 ELSE 0 END
                   AS lbl
          FROM events
        ), c AS (
          SELECT
            CAST(sum(CASE WHEN score >= 1200 AND lbl = 1
                          THEN 1 ELSE 0 END) AS BIGINT) AS tp,
            CAST(sum(CASE WHEN score >= 1200 AND lbl = 0
                          THEN 1 ELSE 0 END) AS BIGINT) AS fp,
            CAST(sum(CASE WHEN score < 1200 AND lbl = 1
                          THEN 1 ELSE 0 END) AS BIGINT) AS fn,
            CAST(sum(CASE WHEN score < 1200 AND lbl = 0
                          THEN 1 ELSE 0 END) AS BIGINT) AS tn
          FROM q
        )
        SELECT tp, fp, fn, tn,
               round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision,
               round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall,
               round(2.0 * (CAST(tp AS DOUBLE) / (tp + fp))
                     * (CAST(tp AS DOUBLE) / (tp + fn))
                     / (CAST(tp AS DOUBLE) / (tp + fp)
                        + CAST(tp AS DOUBLE) / (tp + fn)), 6) AS f1,
               round(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6)
                 AS accuracy
        FROM c
    """
    oracles["triple_barrier"] = """
        WITH q AS (
          SELECT event_id, user_id,
                 CAST(round(value*100) AS BIGINT) AS cents,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us
          FROM events
        ), c AS (
          SELECT event_id, user_id, us,
                 100000 + sum(cents - 1000) OVER
                   (PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS level
          FROM q
        ), f AS (
          SELECT event_id, us,
                 CAST(level AS DOUBLE) AS x0,
                 list_sort(list([CAST(us AS DOUBLE),
                                 CAST(level AS DOUBLE)]) OVER
                   (PARTITION BY user_id ORDER BY us
                    RANGE BETWEEN 1 FOLLOWING
                              AND 172800000000 FOLLOWING)) AS fwd
          FROM c
        ), h AS (
          SELECT event_id, us, x0,
                 list_filter(fwd,
                   e -> e[2] >= x0 * 1.002
                        OR e[2] <= x0 * 0.998) AS hits
          FROM f
        )
        SELECT event_id,
               CASE WHEN hits IS NULL OR len(hits) = 0 THEN 0
                    WHEN hits[1][2] >= x0 * 1.002 THEN 1
                    ELSE -1 END AS label,
               round(CASE WHEN hits IS NULL OR len(hits) = 0
                          THEN 172800.0
                          ELSE (hits[1][1] - us) / 1000000.0 END, 6)
                 AS tsec
        FROM h
    """
    oracles["churn_label"] = """
        WITH q AS (
          SELECT event_id, user_id,
                 CAST(epoch(ts) AS DOUBLE) AS sec
          FROM events
        )
        SELECT event_id,
               CAST(CASE WHEN lead(sec) OVER w IS NULL THEN NULL
                         WHEN lead(sec) OVER w - sec > 86400.0 THEN 1
                         ELSE 0 END AS INT) AS churned
        FROM q
        WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    """
    oracles["chi2"] = """
        WITH q AS (
          SELECT event_type,
                 CAST(floor(CAST(epoch(ts) * 1000000 AS BIGINT)
                            / 3600000000) % 24 AS BIGINT) AS hour
          FROM events
        ), cells AS (
          SELECT event_type, hour, count(*) AS obs
          FROM q GROUP BY event_type, hour
        ), m AS (
          SELECT event_type, hour, obs,
                 sum(obs) OVER (PARTITION BY event_type) AS rt,
                 sum(obs) OVER (PARTITION BY hour) AS ct,
                 sum(obs) OVER () AS n,
                 (SELECT count(DISTINCT event_type) FROM cells) AS R,
                 (SELECT count(DISTINCT hour) FROM cells) AS C
          FROM cells
        ), x AS (
          SELECT *,
                 CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / n
                   AS expected,
                 (obs - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / n)
                 * (obs - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / n)
                 / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / n)
                   AS chi2
          FROM m
        )
        SELECT event_type, hour, obs,
               round(expected, 6) AS expected,
               round(chi2, 6) AS chi2,
               CAST((R - 1) * (C - 1) AS BIGINT) AS dof,
               round(sqrt(list_reduce(
                       list_prepend(0.0,
                         list_sort(list(chi2) OVER ())),
                       (a, x2) -> a + x2)
                     / (CAST(n AS DOUBLE)
                        * (least(R, C) - 1))), 6) AS cramers_v
        FROM x
    """
    oracles["assoc_rules"] = """
        WITH items AS (
          SELECT DISTINCT user_id AS bk, event_type AS it FROM events
        ), sized AS (
          SELECT * FROM (
            SELECT *, count(*) OVER (PARTITION BY bk) AS bs FROM items
          ) WHERE bs <= 100
        ), nb AS (
          SELECT count(DISTINCT bk) AS N FROM sized
        ), per AS (
          SELECT it, count(*) AS n_i FROM sized GROUP BY it
        ), pairs AS (
          SELECT a.it AS item_a, b.it AS item_b, count(*) AS n_ab
          FROM sized a JOIN sized b ON a.bk = b.bk AND a.it < b.it
          GROUP BY a.it, b.it
          HAVING count(*) >= 2
        )
        SELECT item_a, item_b, n_ab,
               CAST(pa.n_i AS BIGINT) AS n_a,
               CAST(pb.n_i AS BIGINT) AS n_b,
               round(CAST(n_ab AS DOUBLE) / CAST(N AS DOUBLE), 6)
                 AS support,
               round(CAST(n_ab AS DOUBLE) / pa.n_i, 6) AS conf_a_b,
               round(CAST(n_ab AS DOUBLE) / pb.n_i, 6) AS conf_b_a,
               round(CAST(N AS DOUBLE) * n_ab
                     / (CAST(pa.n_i AS DOUBLE)
                        * CAST(pb.n_i AS DOUBLE)), 6) AS lift
        FROM pairs
        JOIN per pa ON pairs.item_a = pa.it
        JOIN per pb ON pairs.item_b = pb.it
        CROSS JOIN nb
    """
    oracles["streaming_decay"] = """
        WITH ex AS (
          SELECT event_id, user_id, epoch_us(ts) AS us FROM events
        ), lastus AS (
          SELECT user_id, CAST(max(us) AS BIGINT) AS last_us,
                 CAST(count(*) AS BIGINT) AS n_events,
                 list_sort(list(us)) AS lst
          FROM ex GROUP BY user_id
        )
        SELECT user_id, n_events,
               round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                       list_transform(lst,
                         x -> pow(2.0, (CAST(x AS DOUBLE)
                                        - CAST(last_us AS DOUBLE))
                                       / 21600000000.0))),
                     (acc, t) -> acc + t), 6) AS score
        FROM lastus
    """
    oracles["streaming_cusum"] = """
        WITH q AS (
          SELECT event_id, user_id,
                 CAST(round(value*100) AS BIGINT) AS cents,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us
          FROM events
        ), p AS (
          SELECT event_id, user_id, us,
                 sum(cents - 1050) OVER b AS pp,
                 sum(cents -  950) OVER b AS pn,
                 count(*) OVER b AS n,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY us DESC, event_id DESC)
                 AS rk
          FROM q
          WINDOW b AS (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)
        )
        SELECT user_id,
               CAST(n AS BIGINT) AS n_events,
               CAST(pp - least(0, min(pp) OVER w) AS BIGINT)
                 AS cusum_pos,
               CAST(greatest(0, max(pn) OVER w) - pn AS BIGINT)
                 AS cusum_neg
        FROM p
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        QUALIFY rk = 1
    """
    oracles["rolling_rank"] = """
        WITH q AS (
          SELECT event_id, user_id,
                 CAST(round(value*100) AS BIGINT) AS cents,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us
          FROM events
        ), l AS (
          SELECT event_id, cents,
                 list(cents) OVER (PARTITION BY user_id ORDER BY us
                                   RANGE BETWEEN 86400000000 PRECEDING
                                             AND CURRENT ROW) AS lst
          FROM q
        )
        SELECT event_id,
               round(CAST(len(list_filter(lst, v -> v <= cents)) AS DOUBLE)
                     / CAST(len(lst) AS DOUBLE), 6) AS rr
        FROM l
    """
    oracles["drawdown"] = """
        WITH q AS (
          SELECT event_id, user_id,
                 CAST(round(value*100) AS BIGINT) AS cents,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us
          FROM events
        ), c AS (
          SELECT event_id, user_id, us,
                 sum(cents) OVER b AS cum
          FROM q
          WINDOW b AS (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)
        )
        SELECT event_id,
               CAST(max(cum) OVER b AS BIGINT) AS peak,
               round(CASE WHEN max(cum) OVER b > 0
                          THEN CAST(max(cum) OVER b - cum AS DOUBLE)
                               / CAST(max(cum) OVER b AS DOUBLE) END,
                     6) AS dd
        FROM c
        WINDOW b AS (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """
    oracles["cusum"] = """
        WITH q AS (
          SELECT event_id, user_id,
                 CAST(round(value*100) AS BIGINT) AS cents,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us
          FROM events
        ), p AS (
          SELECT event_id, user_id, us,
                 sum(cents - 1050.0) OVER b AS pp,
                 sum(cents -  950.0) OVER b AS pn
          FROM q
          WINDOW b AS (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)
        )
        SELECT event_id,
               round(pp - least(0.0, min(pp) OVER b), 6) AS cpos,
               round(greatest(0.0, max(pn) OVER b) - pn, 6) AS cneg
        FROM p
        WINDOW b AS (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """
    oracles["ohlc_bars"] = """
        WITH q AS (
          SELECT user_id, event_id,
                 CAST(round(value*100) AS BIGINT) AS cents,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us
          FROM events
        ), b AS (
          SELECT *, CAST(floor(us / 86400000000) AS BIGINT) AS bar
          FROM q
        ), r AS (
          SELECT *,
                 row_number() OVER (PARTITION BY user_id, bar
                                    ORDER BY us, event_id) AS rna,
                 row_number() OVER (PARTITION BY user_id, bar
                                    ORDER BY us DESC, event_id DESC)
                 AS rnd
          FROM b
        )
        SELECT user_id,
               bar * 86400 AS bar_start,
               max(CASE WHEN rna = 1 THEN cents END) AS open,
               max(cents) AS high,
               min(cents) AS low,
               max(CASE WHEN rnd = 1 THEN cents END) AS close,
               count(*) AS n,
               CAST(sum(cents) AS BIGINT) AS total
        FROM r
        GROUP BY user_id, bar
    """
    oracles["woe_encode"] = """
        WITH per AS (
          SELECT event_type,
                 CAST(sum(CASE WHEN round(value*100) > 1000
                               THEN 1 ELSE 0 END) AS BIGINT) AS pos,
                 CAST(sum(CASE WHEN round(value*100) > 1000
                               THEN 0 ELSE 1 END) AS BIGINT) AS neg
          FROM events GROUP BY event_type
        ), tot AS (
          SELECT CAST(sum(pos) AS BIGINT) AS tp,
                 CAST(sum(neg) AS BIGINT) AS tn
          FROM per
        )
        SELECT event_type, pos, neg,
               round(ln((pos + 0.5) / (tp + 1.0))
                     - ln((neg + 0.5) / (tn + 1.0)), 6) AS woe,
               round(((pos + 0.5) / (tp + 1.0)
                      - (neg + 0.5) / (tn + 1.0))
                     * (ln((pos + 0.5) / (tp + 1.0))
                        - ln((neg + 0.5) / (tn + 1.0))), 6) AS iv
        FROM per, tot
    """
    oracles["seasonal"] = """
        WITH q AS (
          SELECT event_id, user_id,
                 CAST(round(value*100) AS BIGINT) AS cents,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us
          FROM events
        ), p AS (
          SELECT *, CAST(floor(us / 3600000000) % 168 AS BIGINT)
                    AS phase
          FROM q
        )
        SELECT event_id,
               round(CAST(sum(cents) OVER b AS DOUBLE)
                     / count(cents) OVER b, 6) AS base,
               round(cents - CAST(sum(cents) OVER b AS DOUBLE)
                             / count(cents) OVER b, 6) AS resid
        FROM p
        WINDOW b AS (PARTITION BY user_id, phase ORDER BY us
                     RANGE BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING)
    """
    oracles["rolling_corr"] = """
        WITH q AS (
          SELECT event_id, user_id,
                 CAST(round(value*100) AS BIGINT) AS x,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS y,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us
          FROM events
        ), w AS (
          SELECT event_id,
                 COUNT(*) OVER b AS n,
                 SUM(x) OVER b AS sx, SUM(y) OVER b AS sy,
                 SUM(x*x) OVER b AS sxx, SUM(y*y) OVER b AS syy,
                 SUM(x*y) OVER b AS sxy
          FROM q
          WINDOW b AS (PARTITION BY user_id ORDER BY us
                       RANGE BETWEEN 604800000000 PRECEDING
                                 AND CURRENT ROW)
        )
        SELECT event_id,
               CASE WHEN n >= 2
                     AND CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx > 0
                     AND CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy > 0
                    THEN round(
                      (CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)
                      / (sqrt(CAST(n AS DOUBLE)*sxx
                              - CAST(sx AS DOUBLE)*sx)
                         * sqrt(CAST(n AS DOUBLE)*syy
                                - CAST(sy AS DOUBLE)*sy)), 6)
               END AS roll_corr
        FROM w
    """
    _ewma_num = " + ".join(
        "CASE WHEN lag(cents, {k}) OVER b IS NOT NULL THEN "
        "CAST(lag(cents, {k}) OVER b AS DOUBLE) * {w!r} ELSE 0.0 END"
        .format(k=k, w=0.5 ** k) for k in range(9))
    _ewma_den = " + ".join(
        "CASE WHEN lag(cents, {k}) OVER b IS NOT NULL THEN {w!r} "
        "ELSE 0.0 END".format(k=k, w=0.5 ** k) for k in range(9))
    oracles["ewma"] = f"""
        WITH q AS (
          SELECT event_id, user_id, ts,
                 CAST(round(value*100) AS BIGINT) AS cents
          FROM events
        ), w AS (
          SELECT event_id,
                 ({_ewma_num}) AS num, ({_ewma_den}) AS den
          FROM q
          WINDOW b AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT event_id, CASE WHEN den > 0 THEN num / den END AS ew
        FROM w
    """
    oracles["session_features"] = """
        WITH q AS (
          SELECT user_id, ts, epoch_us(ts) AS us,
                 CAST(round(value*100) AS BIGINT) AS cents
          FROM events
        ), f AS (
          SELECT user_id, ts, us, cents,
                 CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > 1800000000
                      THEN 1 ELSE 0 END AS new_s
          FROM q WINDOW w AS (PARTITION BY user_id ORDER BY us)
        ), g AS (
          SELECT user_id, us, cents, ts,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - 1 AS session_id
          FROM f
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events,
               MIN(us) AS start_us,
               round((MAX(us) - MIN(us)) / 1000000.0, 6)
                 AS duration_s,
               CAST(SUM(cents) AS BIGINT) AS cents_sum
        FROM g GROUP BY user_id, session_id
    """
    oracles["calendar_features"] = """
        SELECT event_id,
               CAST(hour(ts) AS INT) AS hour,
               CAST(isodow(ts) AS INT) AS isodow,
               CAST(day(ts) AS INT) AS dom,
               CAST(CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END
                    AS INT) AS is_weekend,
               round(sin(CAST(hour(ts) AS DOUBLE) * (2 * pi() / 24)),
                     6) AS hour_sin,
               round(cos(CAST(hour(ts) AS DOUBLE) * (2 * pi() / 24)),
                     6) AS hour_cos,
               round(sin(CAST(isodow(ts) - 1 AS DOUBLE) * (2 * pi() / 7)),
                     6) AS dow_sin,
               round(cos(CAST(isodow(ts) - 1 AS DOUBLE) * (2 * pi() / 7)),
                     6) AS dow_cos
        FROM events
    """
    oracles["scd2_join"] = """
        WITH p AS (
          SELECT user_id, ts,
                 arg_max(CAST(round(value*100) AS BIGINT), event_id)
                   AS p_cents
          FROM events WHERE event_type = 'purchase'
          GROUP BY user_id, ts
        ), dim AS (
          SELECT user_id, ts AS valid_from,
                 lead(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   AS valid_to,
                 p_cents
          FROM p
        )
        SELECT c.event_id, c.user_id, d.p_cents
        FROM events c
        LEFT JOIN dim d
          ON c.user_id = d.user_id
         AND c.ts >= d.valid_from
         AND (d.valid_to IS NULL OR c.ts < d.valid_to)
        WHERE c.event_type = 'click'
    """
    oracles["merge_intervals"] = """
        WITH q AS (
          SELECT user_id, event_id, epoch_us(ts) AS s_us,
                 epoch_us(ts) + 1800000000 AS e_us
          FROM events
        ), f AS (
          SELECT user_id, s_us, e_us,
                 CASE WHEN max(e_us) OVER (
                        PARTITION BY user_id
                        ORDER BY s_us, e_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) IS NULL
                       OR s_us > max(e_us) OVER (
                        PARTITION BY user_id
                        ORDER BY s_us, e_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING)
                      THEN 1 ELSE 0 END AS new_island,
                 event_id
          FROM q
        ), g AS (
          SELECT user_id, s_us, e_us,
                 SUM(new_island) OVER (
                   PARTITION BY user_id
                   ORDER BY s_us, e_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island_id
          FROM f
        )
        SELECT user_id, CAST(island_id AS BIGINT) AS island_id,
               MIN(s_us) AS island_start, MAX(e_us) AS island_end,
               COUNT(*) AS n_intervals
        FROM g GROUP BY user_id, island_id
    """
    oracles["winsorize"] = """
        WITH q AS (
          SELECT event_id, user_id,
                 CAST(round(value*100) AS BIGINT) AS cents,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us
          FROM events
        ), w AS (
          SELECT event_id, cents,
                 quantile_cont(cents, 0.05) OVER b AS lo,
                 quantile_cont(cents, 0.95) OVER b AS hi,
                 COUNT(cents) OVER b AS n
          FROM q
          WINDOW b AS (PARTITION BY user_id ORDER BY us
                       RANGE BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING)
        )
        SELECT event_id,
               round(CASE WHEN n >= 20
                     THEN least(greatest(CAST(cents AS DOUBLE), lo), hi)
                     ELSE CAST(cents AS DOUBLE) END, 6) AS wz
        FROM w
    """
    oracles["tpch_q3"] = """
        SELECT l_orderkey,
               CAST(epoch(o_orderdate) AS BIGINT) AS odate_s,
               o_orderpriority,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS revenue_e4
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue_e4 DESC, l_orderkey
        LIMIT 10
    """
    oracles["rolling_slope"] = """
        WITH q AS (
          SELECT event_id, user_id,
                 CAST(round(value*100) AS BIGINT) AS x,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us
          FROM events
        ), r AS (
          SELECT event_id, user_id, x, us,
                 (us - MIN(us) OVER (PARTITION BY user_id))
                   // 1000000 AS t
          FROM q
        ), w AS (
          SELECT event_id,
                 COUNT(*) OVER b AS n,
                 SUM(t) OVER b AS st, SUM(x) OVER b AS sx,
                 SUM(t*t) OVER b AS stt, SUM(t*x) OVER b AS stx
          FROM r
          WINDOW b AS (PARTITION BY user_id ORDER BY us
                       RANGE BETWEEN 604800000000 PRECEDING
                                 AND CURRENT ROW)
        )
        SELECT event_id,
               CASE WHEN n >= 2
                     AND CAST(n AS DOUBLE)*stt
                         - CAST(st AS DOUBLE)*st > 0
                    THEN round(
                      (CAST(n AS DOUBLE)*stx - CAST(st AS DOUBLE)*sx)
                      / (CAST(n AS DOUBLE)*stt
                         - CAST(st AS DOUBLE)*st), 6)
               END AS roll_slope
        FROM w
    """
    oracles["asof_nearest"] = """
        WITH p AS (
          SELECT event_id, user_id,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us
          FROM events WHERE event_type = 'purchase'
        ), c AS (
          SELECT user_id,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us,
                 MAX(value) AS click_value
          FROM events WHERE event_type = 'click'
          GROUP BY user_id, ts
        )
        SELECT p.event_id, p.user_id, m.click_value,
               m.us AS click_ts_us
        FROM p LEFT JOIN LATERAL (
          SELECT c.click_value, c.us
          FROM c WHERE c.user_id = p.user_id
          ORDER BY abs(c.us - p.us),
                   CASE WHEN c.us <= p.us THEN 0 ELSE 1 END
          LIMIT 1
        ) m ON true
    """
    oracles["streaming_asof"] = """
        WITH purchases AS (
          SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase'
        ), clicks AS (
          SELECT user_id, ts, MAX(value) AS v
          FROM events WHERE event_type = 'click' GROUP BY user_id, ts
        )
        SELECT p.user_id AS entity,
               p.event_id AS label_id,
               epoch_us(p.ts) AS label_us,
               c.v AS matched_value,
               epoch_us(c.ts) AS matched_us
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND c.ts <= p.ts
    """
    oracles["streaming_alerts"] = """
        WITH e AS (
          SELECT user_id AS entity, event_id, epoch_us(ts) AS us,
                 CASE WHEN abs(CAST(round(value*100) AS BIGINT))
                      > 6000 THEN 1 ELSE 0 END AS ex
          FROM events
        ), c AS (
          SELECT entity, event_id, us,
                 CAST(sum(ex) OVER w8 AS BIGINT) AS cnt
          FROM e
          WINDOW w8 AS (PARTITION BY entity ORDER BY us, event_id
                        ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
        ), t AS (
          SELECT entity, event_id, us, cnt,
                 COALESCE(lag(cnt) OVER (PARTITION BY entity
                                         ORDER BY us, event_id), 0)
                   AS prev_cnt
          FROM c
        )
        SELECT entity, event_id, us, cnt AS n_exceed
        FROM t WHERE cnt >= 3 AND prev_cnt < 3
    """
    oracles["streaming_attribution"] = """
        WITH e AS (
          SELECT user_id AS entity, event_id, event_type,
                 epoch_us(ts) AS t
          FROM events
        ), conv AS (
          SELECT entity, event_id AS conv_id, t AS conv_us
          FROM e WHERE event_type = 'purchase'
        ), touch AS (
          SELECT entity, event_id AS tid, t AS tt
          FROM e WHERE event_type IN ('view', 'click')
        ), ft AS (
          SELECT c.conv_id, t.tid AS first_touch_id,
                 row_number() OVER (PARTITION BY c.conv_id
                                    ORDER BY t.tt ASC, t.tid ASC)
                   AS rf
          FROM conv c JOIN touch t
            ON c.entity = t.entity AND t.tt <= c.conv_us
        ), lt AS (
          SELECT c.conv_id, t.tid AS last_touch_id,
                 c.conv_us - t.tt AS last_latency_us,
                 row_number() OVER (PARTITION BY c.conv_id
                                    ORDER BY t.tt DESC, t.tid DESC)
                   AS rl
          FROM conv c JOIN touch t
            ON c.entity = t.entity
           AND t.tt BETWEEN c.conv_us
                            - CAST(7*86400 AS BIGINT)*1000000
                        AND c.conv_us
        )
        SELECT c.entity, c.conv_id, c.conv_us,
               ft.first_touch_id, lt.last_touch_id,
               lt.last_latency_us
        FROM conv c
        LEFT JOIN ft ON ft.conv_id = c.conv_id AND ft.rf = 1
        LEFT JOIN lt ON lt.conv_id = c.conv_id AND lt.rl = 1
    """
    oracles["rolling_distinct"] = """
        WITH q AS (
          SELECT event_id, user_id, event_type,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us
          FROM events
        )
        SELECT e1.event_id,
               (SELECT CAST(COUNT(DISTINCT e2.event_type) AS BIGINT)
                FROM q e2
                WHERE e2.user_id = e1.user_id
                  AND e2.us BETWEEN e1.us - 604800000000 AND e1.us)
                 AS n_types_7d
        FROM q e1
    """
    oracles["funnel"] = """
        WITH q AS (
          SELECT user_id, event_type,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us
          FROM events
        ), u AS (
          SELECT DISTINCT user_id FROM q
        ), s1 AS (
          SELECT user_id, MIN(us) AS t1 FROM q
          WHERE event_type = 'view' GROUP BY user_id
        ), s2 AS (
          SELECT q.user_id, MIN(q.us) AS t2
          FROM q JOIN s1 ON q.user_id = s1.user_id
          WHERE q.event_type = 'click' AND q.us > s1.t1
          GROUP BY q.user_id
        ), s3 AS (
          SELECT q.user_id, MIN(q.us) AS t3
          FROM q JOIN s2 ON q.user_id = s2.user_id
          WHERE q.event_type = 'purchase' AND q.us > s2.t2
          GROUP BY q.user_id
        )
        SELECT u.user_id, s1.t1 AS step1_us, s2.t2 AS step2_us,
               s3.t3 AS step3_us,
               CAST(s1.t1 IS NOT NULL AS INT)
                 + CAST(s2.t2 IS NOT NULL AS INT)
                 + CAST(s3.t3 IS NOT NULL AS INT) AS funnel_depth
        FROM u
        LEFT JOIN s1 ON u.user_id = s1.user_id
        LEFT JOIN s2 ON u.user_id = s2.user_id
        LEFT JOIN s3 ON u.user_id = s3.user_id
    """
    oracles["cohort_retention"] = """
        WITH q AS (
          SELECT user_id, date_trunc('day', ts) AS day FROM events
        ), c AS (
          SELECT user_id, MIN(day) AS cohort FROM q GROUP BY user_id
        ), a AS (
          SELECT DISTINCT q.user_id, c.cohort,
                 date_diff('day', c.cohort, q.day) AS days_since
          FROM q JOIN c ON q.user_id = c.user_id
        )
        SELECT CAST(epoch(cohort) * 1000000 AS BIGINT) AS cohort_us,
               CAST(days_since AS INT) AS days_since,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM a GROUP BY cohort, days_since
    """
    oracles["rolling_autocorr"] = """
        WITH q AS (
          SELECT event_id, user_id,
                 CAST(round(value*100) AS BIGINT) AS x,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us
          FROM events
        ), l AS (
          SELECT event_id, user_id, x, us,
                 LAG(x) OVER (PARTITION BY user_id
                              ORDER BY us, x) AS xl
          FROM q
        ), f AS (
          SELECT * FROM l WHERE xl IS NOT NULL
        ), w AS (
          SELECT event_id,
                 COUNT(*) OVER b AS n,
                 SUM(x) OVER b AS sx, SUM(xl) OVER b AS sy,
                 SUM(x*x) OVER b AS sxx, SUM(xl*xl) OVER b AS syy,
                 SUM(x*xl) OVER b AS sxy
          FROM f
          WINDOW b AS (PARTITION BY user_id ORDER BY us
                       RANGE BETWEEN 604800000000 PRECEDING
                                 AND CURRENT ROW)
        )
        SELECT event_id,
               CASE WHEN n >= 2
                     AND CAST(n AS DOUBLE)*sxx
                         - CAST(sx AS DOUBLE)*sx > 0
                     AND CAST(n AS DOUBLE)*syy
                         - CAST(sy AS DOUBLE)*sy > 0
                    THEN round(
                      (CAST(n AS DOUBLE)*sxy
                       - CAST(sx AS DOUBLE)*sy)
                      / (sqrt(CAST(n AS DOUBLE)*sxx
                              - CAST(sx AS DOUBLE)*sx)
                         * sqrt(CAST(n AS DOUBLE)*syy
                                - CAST(sy AS DOUBLE)*sy)), 6)
               END AS autocorr
        FROM w
    """
    oracles["burstiness"] = """
        WITH q AS (
          SELECT event_id, user_id,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us
          FROM events
        ), w AS (
          SELECT event_id,
                 COUNT(*) OVER (PARTITION BY user_id ORDER BY us
                                RANGE BETWEEN 3600000000 PRECEDING
                                          AND CURRENT ROW) AS s,
                 COUNT(*) OVER (PARTITION BY user_id ORDER BY us
                                RANGE BETWEEN 604800000000 PRECEDING
                                          AND CURRENT ROW) AS l
          FROM q
        )
        SELECT event_id,
               CASE WHEN l > 0
                    THEN round(CAST(s AS DOUBLE)
                               / (CAST(l AS DOUBLE) / 168.0), 6)
               END AS burst
        FROM w
    """
    oracles["rolling_twap"] = """
        WITH q AS (
          SELECT event_id, user_id,
                 CAST(round(value*100) AS BIGINT) AS x,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us
          FROM events
        ), d AS (
          SELECT event_id, user_id, x, us,
                 LEAD(us) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) - us AS dur
          FROM q
        ), w AS (
          SELECT event_id,
                 SUM(dur) OVER b AS sw,
                 SUM(dur*x) OVER b AS swx
          FROM d
          WINDOW b AS (PARTITION BY user_id ORDER BY us
                       RANGE BETWEEN 86400000000 PRECEDING
                                 AND CURRENT ROW)
        )
        SELECT event_id,
               CASE WHEN sw > 0
                    THEN round(CAST(swx AS DOUBLE)
                               / CAST(sw AS DOUBLE), 6)
               END AS roll_twap
        FROM w
    """
    oracles["cross_sectional"] = """
        WITH q AS (
          SELECT event_id, date_trunc('day', ts) AS b,
                 CAST(round(value*100) AS BIGINT) AS x
          FROM events
        ), a AS (
          SELECT b, x, COUNT(*) AS c FROM q GROUP BY b, x
        ), s AS (
          SELECT b, x,
                 COALESCE(SUM(c) OVER (PARTITION BY b ORDER BY x
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS less,
                 SUM(c) OVER (PARTITION BY b) AS n,
                 SUM(x*c) OVER (PARTITION BY b) AS s1,
                 SUM(x*x*c) OVER (PARTITION BY b) AS s2
          FROM a
        ), e AS (
          SELECT b, x,
                 CAST(less + 1 AS BIGINT) AS cs_rank,
                 CASE WHEN n > 1
                      THEN CAST(less AS DOUBLE)
                           / CAST(n - 1 AS DOUBLE) END AS pct,
                 CAST(n AS DOUBLE) AS nd,
                 CAST(s1 AS DOUBLE) AS s1d,
                 CAST(s2 AS DOUBLE) AS s2d
          FROM s
        )
        SELECT q.event_id, e.cs_rank,
               round(e.pct, 6) AS cs_pct,
               CASE WHEN s2d/nd - (s1d/nd)*(s1d/nd) > 0
                    THEN round((CAST(q.x AS DOUBLE) - s1d/nd)
                               / sqrt(s2d/nd - (s1d/nd)*(s1d/nd)), 6)
               END AS cs_z
        FROM q JOIN e ON q.b = e.b AND q.x = e.x
    """
    oracles["time_since_error"] = """
        WITH q AS (
          SELECT event_id, user_id, event_type,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us
          FROM events
        )
        SELECT event_id,
               (us - MAX(CASE WHEN event_type = 'error' THEN us END)
                       OVER (PARTITION BY user_id
                             ORDER BY us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING))
                 / 1000000.0 AS since_s
        FROM q
    """
    oracles["horizon_lag"] = """
        WITH q AS (
          SELECT event_id, user_id, value,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us
          FROM events
        )
        SELECT event_id,
               (MAX({'us': us, 'id': event_id, 'v': value})
                  OVER (PARTITION BY user_id ORDER BY us
                        RANGE BETWEEN UNBOUNDED PRECEDING
                                  AND 3600000000 PRECEDING)).v
                 AS value_1h_ago
        FROM q
    """
    oracles["rolling_moments"] = """
        WITH q AS (
          SELECT event_id, user_id,
                 CAST(round(value*100) AS BIGINT) AS x,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us
          FROM events
        ), w AS (
          SELECT event_id,
                 COUNT(*) OVER b AS n,
                 SUM(x) OVER b AS s1,
                 SUM(x*x) OVER b AS s2,
                 CAST(SUM(CAST(x AS HUGEINT)*x*x) OVER b AS DOUBLE)
                   AS s3,
                 CAST(SUM(CAST(x AS HUGEINT)*x*x*x) OVER b AS DOUBLE)
                   AS s4
          FROM q
          WINDOW b AS (PARTITION BY user_id ORDER BY us
                       RANGE BETWEEN 604800000000 PRECEDING
                                 AND CURRENT ROW)
        ), m AS (
          SELECT event_id, CAST(n AS DOUBLE) AS nd,
                 CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
                 s3, s4, n
          FROM w
        ), mm AS (
          SELECT event_id, n, nd, s2d, s3, s4,
                 s1d / nd AS mu
          FROM m
        ), mv AS (
          SELECT event_id, n, nd, s3, s4, mu,
                 s2d / nd AS s2n,
                 s2d / nd - mu * mu AS m2
          FROM mm
        ), mk AS (
          SELECT event_id, n, m2,
                 s3 / nd - 3.0 * mu * s2n + 2.0 * mu * mu * mu AS m3,
                 s4 / nd - 4.0 * mu * (s3 / nd)
                   + 6.0 * mu * mu * s2n - 3.0 * mu * mu * mu * mu
                   AS m4
          FROM mv
        )
        SELECT event_id,
               CASE WHEN n >= 2 AND m2 > 0
                    THEN round(m3 / (m2 * sqrt(m2)), 6) END AS roll_skew,
               CASE WHEN n >= 2 AND m2 > 0
                    THEN round(m4 / (m2 * m2) - 3.0, 6) END AS roll_kurt
        FROM mk
    """
    oracles["rolling_median"] = """
        WITH q AS (
          SELECT event_id, user_id,
                 CAST(round(value*100) AS BIGINT) AS cents,
                 CAST(epoch(ts) * 1000000 AS BIGINT) AS us
          FROM events
        )
        SELECT event_id,
               round(quantile_cont(cents, 0.5) OVER b, 6) AS med,
               round(quantile_cont(cents, 0.9) OVER b, 6) AS p90
        FROM q
        WINDOW b AS (PARTITION BY user_id ORDER BY us
                     RANGE BETWEEN 86400000000 PRECEDING
                               AND CURRENT ROW)
    """
    oracles["novelty"] = """
        WITH f AS (
          SELECT event_id, user_id, ts,
                 CASE WHEN row_number() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) = 1
                      THEN 1 ELSE 0 END AS first_seen
          FROM events
        )
        SELECT event_id,
               CAST(SUM(first_seen) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n_types
        FROM f
    """
    oracles["image_augment"] = """
        WITH px AS (
          SELECT o_orderkey AS okey, j,
                 -- crop(2,1,4x4)+hflip: out(y,x,c) <- in(1+y, 5-x, c)
                 (((1 + j // 12) * 8 + (5 - (j % 12) // 3)) * 3
                  + j % 3) AS i_cf
          FROM orders, unnest(generate_series(0, 47)) AS tj(j)
        ), rx AS (
          SELECT o_orderkey AS okey, j,
                 -- rot90 CCW on 8x8: out(y,x,c) <- in(x, 7-y, c)
                 ((((j % 24) // 3) * 8 + (7 - j // 24)) * 3 + j % 3)
                   AS i_r
          FROM orders, unnest(generate_series(0, 191)) AS tj(j)
        ), a AS (
          SELECT okey,
                 SUM((j + 1) * ((okey * 7919 + i_cf * 31) % 256))
                   % 2147483647 AS ck_crop_flip
          FROM px GROUP BY okey
        ), b AS (
          SELECT okey,
                 SUM((j + 1) * ((okey * 7919 + i_r * 31) % 256))
                   % 2147483647 AS ck_rot90
          FROM rx GROUP BY okey
        )
        SELECT a.okey, 4 AS aw, 4 AS ah,
               CAST(a.ck_crop_flip AS BIGINT) AS ck_crop_flip,
               CAST(b.ck_rot90 AS BIGINT) AS ck_rot90
        FROM a JOIN b USING (okey)
    """
    oracles["embedding_centroid"] = """
        WITH e AS (
          SELECT vec_id % 8 AS grp,
                 unnest(embedding) AS x,
                 generate_subscripts(embedding, 1) - 1 AS pos
          FROM embeddings
        )
        SELECT grp, COUNT(*) AS n, pos,
               round(SUM(x) / COUNT(*), 6) AS m
        FROM e GROUP BY grp, pos
    """
    oracles["fuzzy_pairs"] = """
        WITH v AS (
          SELECT DISTINCT unnest(
            regexp_split_to_array(trim(text), '\\s+')) AS w
          FROM documents
          WHERE text IS NOT NULL AND trim(text) <> ''
        ), vt AS (
          SELECT w FROM v
          UNION
          SELECT w[2:] AS w FROM v WHERE length(w) >= 5
        )
        SELECT a.w AS a, b.w AS b,
               CAST(levenshtein(a.w, b.w) AS INT) AS dist
        FROM vt a, vt b
        WHERE a.w < b.w AND levenshtein(a.w, b.w) <= 1
    """
    oracles["profile_table"] = """
        WITH n AS (SELECT COUNT(*) AS n_rows FROM events)
        SELECT 'event_id' AS "column", n.n_rows,
               (SELECT COUNT(*) FILTER (WHERE event_id IS NULL)
                FROM events) AS n_null,
               (SELECT CAST(MIN(event_id) AS VARCHAR) FROM events)
                 AS min_repr,
               (SELECT CAST(MAX(event_id) AS VARCHAR) FROM events)
                 AS max_repr
        FROM n
        UNION ALL
        SELECT 'user_id', n.n_rows,
               (SELECT COUNT(*) FILTER (WHERE user_id IS NULL)
                FROM events),
               (SELECT CAST(MIN(user_id) AS VARCHAR) FROM events),
               (SELECT CAST(MAX(user_id) AS VARCHAR) FROM events)
        FROM n
        UNION ALL
        SELECT 'event_type', n.n_rows,
               (SELECT COUNT(*) FILTER (WHERE event_type IS NULL)
                FROM events),
               (SELECT MIN(event_type) FROM events),
               (SELECT MAX(event_type) FROM events)
        FROM n
    """
    oracles["table_diff"] = """
        WITH o AS (
          SELECT event_id, user_id,
                 CAST(round(value*100) AS BIGINT) AS cents
          FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
        ), nw AS (
          SELECT event_id, user_id,
                 CASE WHEN event_id % 7 = 0
                      THEN CAST(round(value*100) AS BIGINT) + 1
                      ELSE CAST(round(value*100) AS BIGINT) END
                   AS cents
          FROM events WHERE ts < TIMESTAMP '2024-01-25 00:00:00'
        ), j AS (
          SELECT COALESCE(o.event_id, nw.event_id) AS k,
                 o.event_id IS NOT NULL AS in_o,
                 nw.event_id IS NOT NULL AS in_n,
                 (o.user_id IS NOT DISTINCT FROM nw.user_id
                  AND o.cents IS NOT DISTINCT FROM nw.cents) AS same
          FROM o FULL OUTER JOIN nw ON o.event_id = nw.event_id
        )
        SELECT CAST(SUM(CASE WHEN NOT in_o AND in_n THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_added,
               CAST(SUM(CASE WHEN in_o AND NOT in_n THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_removed,
               CAST(SUM(CASE WHEN in_o AND in_n AND NOT same
                             THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_changed,
               CAST(SUM(CASE WHEN in_o AND in_n AND same
                             THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_unchanged
        FROM j
    """
    oracles["expectations"] = """
        WITH n AS (SELECT COUNT(*) AS n_rows FROM events),
        v AS (
          SELECT 'not_null(event_id)' AS rule,
                 COUNT(*) FILTER (WHERE event_id IS NULL) AS violations
          FROM events
          UNION ALL
          SELECT 'not_null(value)',
                 COUNT(*) FILTER (WHERE value IS NULL) FROM events
          UNION ALL
          SELECT 'in_range(value,0.0,50.0)',
                 COUNT(*) FILTER (WHERE value IS NOT NULL
                                  AND (value < 0.0 OR value > 50.0))
          FROM events
          UNION ALL
          SELECT 'in_set(event_type)',
                 COUNT(*) FILTER (WHERE event_type IS NOT NULL
                   AND event_type NOT IN
                     ('click','view','purchase','error','scroll'))
          FROM events
          UNION ALL
          SELECT 'matches(props)',
                 COUNT(*) FILTER (WHERE props IS NOT NULL
                   AND NOT regexp_matches(props, '^\\{.*\\}$'))
          FROM events
          UNION ALL
          SELECT 'unique(event_id)',
                 COALESCE((SELECT SUM(c) FROM (
                   SELECT COUNT(*) AS c FROM events
                   GROUP BY event_id HAVING COUNT(*) > 1)), 0)
        )
        SELECT v.rule, CAST(v.violations AS BIGINT) AS violations,
               n.n_rows,
               CAST(CASE WHEN v.violations = 0 THEN 1 ELSE 0 END
                    AS INT) AS ok
        FROM v, n
    """
    oracles["heavy_hitters"] = """
        WITH t AS (
          SELECT unnest(regexp_split_to_array(trim(text), '\\s+'))
            AS tok
          FROM documents
          WHERE text IS NOT NULL AND trim(text) <> ''
        ), n AS (SELECT COUNT(*) AS total FROM t)
        SELECT tok, COUNT(*) AS n
        FROM t, n
        GROUP BY tok, total
        HAVING COUNT(*) * 41 > total
    """
    oracles["heavy_hitters_grouped"] = """
        WITH t AS (
          SELECT lang,
                 unnest(regexp_split_to_array(trim(text), '\\s+'))
                   AS tok
          FROM documents
          WHERE text IS NOT NULL AND trim(text) <> ''
        ), ng AS (
          SELECT lang, COUNT(*) AS total FROM t GROUP BY lang
        )
        SELECT t.lang, tok, COUNT(*) AS n
        FROM t JOIN ng ON t.lang = ng.lang
        GROUP BY t.lang, tok, total
        HAVING COUNT(*) * 31 > total
    """
    oracles["char_entropy"] = """
        WITH ch AS (
          SELECT doc_id, unnest(str_split(COALESCE(text, ''), ''))
            AS c
          FROM documents
        ), pc AS (
          SELECT doc_id, c, COUNT(*) AS k
          FROM ch WHERE c <> '' GROUP BY doc_id, c
        ), pd AS (
          SELECT doc_id,
                 round(ln(CAST(SUM(k) AS DOUBLE))
                       - SUM(CAST(k AS DOUBLE) * ln(CAST(k AS DOUBLE)))
                         / CAST(SUM(k) AS DOUBLE), 6) AS h
          FROM pc GROUP BY doc_id
        )
        SELECT d.doc_id, pd.h
        FROM documents d LEFT JOIN pd USING (doc_id)
    """
    oracles["token_logprob"] = """
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE regexp_split_to_array(lower(trim(text)), '\\s+')
                 END AS toks
          FROM documents
        ), tok AS (
          SELECT doc_id, unnest(toks) AS tok FROM t
        ), vocab AS (
          SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok
        ), tot AS (
          SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM vocab
        ), pd AS (
          SELECT doc_id, list_sort(list(cnt)) AS cnts, COUNT(*) AS ntok
          FROM tok JOIN vocab USING (tok)
          GROUP BY doc_id
        )
        SELECT d.doc_id,
               round(list_reduce(list_transform(pd.cnts,
                                                c -> ln(CAST(c AS DOUBLE))),
                                 (a, b) -> a + b)
                     / CAST(pd.ntok AS DOUBLE)
                     - ln((SELECT n FROM tot)), 6) AS lp
        FROM documents d LEFT JOIN pd USING (doc_id)
    """
    oracles["tfidf_weights"] = """
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE regexp_split_to_array(lower(trim(text)), '\\s+')
                 END AS toks
          FROM documents
        ), tok AS (
          SELECT doc_id, unnest(toks) AS token FROM t
        ), tf AS (
          SELECT doc_id, token, COUNT(*) AS tf
          FROM tok GROUP BY doc_id, token
        ), dfreq AS (
          SELECT token, COUNT(*) AS df FROM tf GROUP BY token
        ), nn AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents
        )
        SELECT doc_id, token,
               CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
               round(CAST(tf AS DOUBLE)
                     * ln((SELECT n FROM nn) / CAST(df AS DOUBLE)), 6)
                 AS w
        FROM tf JOIN dfreq USING (token)
    """
    oracles["bm25"] = """
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE regexp_split_to_array(lower(trim(text)), '\\s+')
                 END AS toks
          FROM documents
        ), tok AS (
          SELECT doc_id, unnest(toks) AS tok FROM t
        ), dl AS (
          SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
        ), nn AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents
        ), ad AS (
          SELECT CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM nn) AS avgdl
          FROM tok
        ), tf AS (
          SELECT doc_id, tok, COUNT(*) AS tf FROM tok
          WHERE tok IN ('engine', 'fast', 'query', 'spark')
          GROUP BY doc_id, tok
        ), dfq AS (
          SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY tok
        ), term AS (
          SELECT tf.doc_id, tf.tok,
                 ln(1.0 + ((SELECT n FROM nn) - df + 0.5) / (df + 0.5))
                 * CAST(tf AS DOUBLE) * (1.2 + 1.0)
                 / (CAST(tf AS DOUBLE)
                    + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
                             / (SELECT avgdl FROM ad))) AS s
          FROM tf JOIN dfq USING (tok) JOIN dl USING (doc_id)
        )
        SELECT doc_id,
               round(list_reduce(list(s ORDER BY tok),
                                 (a, b) -> a + b), 6) AS s
        FROM term GROUP BY doc_id
    """
    oracles["group_kfold"] = """
        SELECT event_id, user_id,
               CAST(list_reduce(
                      list_prepend(CAST(3 AS BIGINT),
                        list_transform(
                          str_split(COALESCE(CAST(user_id AS VARCHAR),
                                             ''), ''),
                          x -> CAST(ascii(x) AS BIGINT))),
                      (acc, x) -> (acc * 31 + x) % 2147483647) % 5
                 AS INT) AS fold
        FROM events
    """
    oracles["streaming_interval_join"] = """
        SELECT p.event_id, p.user_id,
               COUNT(*) AS n_clicks,
               CAST(SUM(CAST(round(c.value * 100) AS BIGINT))
                    AS BIGINT) AS click_cents
        FROM events p
        JOIN events c
          ON p.user_id = c.user_id
         AND p.event_type = 'purchase' AND c.event_type = 'click'
         AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
        GROUP BY p.event_id, p.user_id
    """
    oracles["purged_split"] = """
        SELECT event_id,
               CASE
                 WHEN epoch_us(ts)
                      >= epoch_us(TIMESTAMP '2024-01-20 00:00:00')
                         + 43200000000 THEN 'eval'
                 WHEN epoch_us(ts)
                      >= epoch_us(TIMESTAMP '2024-01-20 00:00:00')
                   THEN 'embargo'
                 WHEN epoch_us(ts) + 86400000000
                      >= epoch_us(TIMESTAMP '2024-01-20 00:00:00')
                   THEN 'purged'
                 ELSE 'train'
               END AS split
        FROM events
    """
    oracles["rolling_corr_chunked"] = oracles["rolling_corr"]
    oracles["rolling_distinct_chunked"] = oracles["rolling_distinct"]
    oracles["ewma_chunked"] = oracles["ewma"]
    oracles["rolling_median_chunked"] = oracles["rolling_median"]
    oracles["inter_arrival"] = """
        WITH q AS (
          SELECT event_id, user_id, epoch_us(ts) AS us
          FROM events
        )
        SELECT event_id,
               CAST(us - lag(us) OVER (
                 PARTITION BY user_id ORDER BY us, event_id)
               AS DOUBLE) / 1000000.0 AS delta_s
        FROM q
    """
    oracles["info_gain_rank"] = _info_gain_oracle_sql()
    oracles["hsic_rank"] = _hsic_rank_oracle_sql()
    oracles["hsic_perm"] = _hsic_perm_oracle_sql()
    oracles["hsic_stability"] = _hsic_stability_oracle_sql()
    oracles["hsic_multi"] = f"""
        WITH {_MI_FEAT_SQL}, rlong AS (
          SELECT 'parity_mod5' AS subset,
                 f_parity * 5 + f_mod5 AS code, y FROM feat
          UNION ALL
          SELECT 'seven2_seven4', f_seven2 * 4 + f_seven4, y FROM feat
          UNION ALL
          SELECT 'parity_seven2', f_parity * 2 + f_seven2, y FROM feat
        ), cells AS (
          SELECT subset, code, y, CAST(count(*) AS BIGINT) AS c
          FROM rlong GROUP BY subset, code, y
        ), m AS (
          SELECT subset, c,
                 sum(c) OVER (PARTITION BY subset, code) AS cx,
                 sum(c) OVER (PARTITION BY subset, y) AS cy
          FROM cells
        ), agg AS (
          SELECT subset,
                 CAST(sum(c) AS BIGINT) AS n,
                 CAST(sum(c*c) AS BIGINT) AS a_sum,
                 CAST(sum(c*cx*cy) AS BIGINT) AS b_sum,
                 CAST(sum(c*cx) AS BIGINT) AS cx_sum,
                 CAST(sum(c*cy) AS BIGINT) AS cy_sum
          FROM m GROUP BY subset
        )
        SELECT subset, n,
               round(CAST(a_sum AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                     - 2.0 * CAST(b_sum AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                          * CAST(n AS DOUBLE))
                     + (CAST(cx_sum AS DOUBLE)
                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                       * (CAST(cy_sum AS DOUBLE)
                          / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))),
                     9) AS hsic
        FROM agg
    """
    oracles["mrmr_select"] = _mrmr_oracle_sql(k=4)
    oracles["cmim_select"] = _cmim_oracle_sql(k=4)
    oracles["viterbi"] = _viterbi_oracle_sql()
    oracles["streaming_holt"] = """
        WITH RECURSIVE q0 AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 CAST(abs(CAST(round(value*100) AS BIGINT)) AS DOUBLE)
                   AS v
          FROM events
        ), ser AS (
          SELECT user_id, v,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY us, event_id) AS i,
                 count(*) OVER (PARTITION BY user_id) AS n
          FROM q0
        ), rec AS (
          SELECT user_id, i, n, v AS l, CAST(0.0 AS DOUBLE) AS b
          FROM ser WHERE i = 1
          UNION ALL
          SELECT s.user_id, s.i, s.n,
                 CAST(0.5 AS DOUBLE)*s.v
                   + CAST(0.5 AS DOUBLE)*(r.l + r.b) AS l,
                 CAST(0.5 AS DOUBLE)
                   *((CAST(0.5 AS DOUBLE)*s.v
                      + CAST(0.5 AS DOUBLE)*(r.l + r.b)) - r.l)
                   + CAST(0.5 AS DOUBLE)*r.b AS b
          FROM rec r
          JOIN ser s ON s.user_id = r.user_id AND s.i = r.i + 1
        )
        SELECT user_id, CAST(n AS BIGINT) AS n_events,
               round(l, 6) AS level, round(b, 6) AS trend
        FROM rec WHERE i = n
    """
    oracles["item_cf"] = """
        WITH inter AS (
          SELECT DISTINCT user_id AS u,
                 abs(CAST(round(value*100) AS BIGINT)) % 200 AS it
          FROM events
        ), idf AS (
          SELECT it, CAST(count(*) AS BIGINT) AS c
          FROM inter GROUP BY it
        ), co AS (
          SELECT a.it AS i, b.it AS j,
                 CAST(count(*) AS BIGINT) AS c_ij
          FROM inter a JOIN inter b ON a.u = b.u AND a.it <> b.it
          GROUP BY a.it, b.it
          HAVING count(*) >= 2
        ), sim AS (
          SELECT co.i, co.j,
                 CAST(c_ij AS DOUBLE)
                 / sqrt(CAST(ci.c * cj.c AS DOUBLE)) AS s
          FROM co
          JOIN idf ci ON ci.it = co.i
          JOIN idf cj ON cj.it = co.j
        ), cand AS (
          SELECT h.u, s.j, s.i, s.s
          FROM inter h JOIN sim s ON s.i = h.it
          WHERE NOT EXISTS (
            SELECT 1 FROM inter x
            WHERE x.u = h.u AND x.it = s.j)
        ), per AS (
          SELECT u, j,
                 list({'i': i, 's': s} ORDER BY i, s) AS terms
          FROM cand GROUP BY u, j
        ), scored AS (
          SELECT u, j,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(terms, t -> t.s)),
                   (acc, y) -> acc + y) AS score
          FROM per
        ), r AS (
          SELECT u, j, score,
                 row_number() OVER (PARTITION BY u
                                    ORDER BY score DESC, j ASC)
                   AS rk
          FROM scored
        )
        SELECT u AS user_id, CAST(rk AS INTEGER) AS rk, j AS item,
               round(score, 6) AS score
        FROM r WHERE rk <= 5
    """
    oracles["sessionize_capped"] = """
        WITH RECURSIVE q AS (
          SELECT user_id, event_id, epoch_us(ts) AS us FROM events
        ), s AS (
          SELECT user_id, event_id, us,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY us, event_id) AS i
          FROM q
        ), rec AS (
          SELECT user_id, i, us, event_id,
                 CAST(0 AS BIGINT) AS sid, us AS start_us
          FROM s WHERE i = 1
          UNION ALL
          SELECT s.user_id, s.i, s.us, s.event_id,
                 CASE WHEN s.us - r.us > 86400000000
                       OR s.us - r.start_us > 172800000000
                 THEN r.sid + 1 ELSE r.sid END,
                 CASE WHEN s.us - r.us > 86400000000
                       OR s.us - r.start_us > 172800000000
                 THEN s.us ELSE r.start_us END
          FROM rec r
          JOIN s ON s.user_id = r.user_id AND s.i = r.i + 1
        )
        SELECT user_id, us AS ts_us, event_id, sid AS session_id,
               start_us AS session_start_us
        FROM rec
    """
    oracles["rfm"] = """
        WITH pre AS (
          SELECT user_id, epoch_us(ts) AS us,
                 abs(CAST(round(value*100) AS BIGINT)) AS cents
          FROM events
          WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
        ), agg AS (
          SELECT user_id AS entity,
                 (epoch_us(TIMESTAMP '2024-01-20 00:00:00')
                  - max(us)) // 86400000000 AS recency_days,
                 CAST(count(*) AS BIGINT) AS frequency,
                 CAST(sum(cents) AS BIGINT) AS monetary
          FROM pre GROUP BY user_id
        ), withneg AS (
          SELECT *, -recency_days AS neg_recency FROM agg
        ), rbin AS (
          SELECT v,
                 (5 * COALESCE(SUM(t) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0))
                 // (SUM(t) OVER ()) AS b
          FROM (SELECT neg_recency AS v, count(*) AS t
                FROM withneg GROUP BY neg_recency)
        ), fbin AS (
          SELECT v,
                 (5 * COALESCE(SUM(t) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0))
                 // (SUM(t) OVER ()) AS b
          FROM (SELECT frequency AS v, count(*) AS t
                FROM withneg GROUP BY frequency)
        ), mbin AS (
          SELECT v,
                 (5 * COALESCE(SUM(t) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0))
                 // (SUM(t) OVER ()) AS b
          FROM (SELECT monetary AS v, count(*) AS t
                FROM withneg GROUP BY monetary)
        )
        SELECT entity AS user_id, recency_days, frequency, monetary,
               CAST(r.b AS BIGINT) AS r_score,
               CAST(f.b AS BIGINT) AS f_score,
               CAST(m.b AS BIGINT) AS m_score
        FROM withneg w
        JOIN rbin r ON r.v = w.neg_recency
        JOIN fbin f ON f.v = w.frequency
        JOIN mbin m ON m.v = w.monetary
    """
    _dn_parts = []
    for _n in (1, 2, 3):
        _dn_parts.append(f"""
          SELECT {_n} AS n, CAST(count(*) AS BIGINT) AS total,
                 CAST(count(DISTINCT g) AS BIGINT) AS n_distinct,
                 round(CASE WHEN count(*) > 0 THEN
                   CAST(count(DISTINCT g) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) END, 6)
                   AS distinct_ratio
          FROM (
            SELECT unnest(list_transform(
              range(1, greatest(len(tk) - {_n - 1}, 0) + 1),
              i -> array_to_string(tk[i:i+{_n - 1}], ' '))) AS g
            FROM (SELECT regexp_split_to_array(trim(lower(text)),
                         '\\s+') AS tk
                  FROM documents WHERE trim(text) <> '')
            WHERE len(tk) >= {_n})""")
    oracles["distinct_ngrams"] = "\n          UNION ALL".join(_dn_parts)
    oracles["readability"] = """
        WITH toks AS (
          SELECT doc_id, text,
                 CASE WHEN trim(lower(text)) = '' THEN []
                      ELSE regexp_split_to_array(trim(lower(text)),
                                                 '\\s+') END AS ws
          FROM documents
        ), counted AS (
          SELECT doc_id,
                 CAST(len(ws) AS BIGINT) AS n_words,
                 CAST(greatest(1, len(regexp_extract_all(
                      text, '[.!?]+'))) AS BIGINT) AS n_sentences,
                 CAST(list_reduce(list_prepend(0, list_transform(ws,
                      w -> greatest(1,
                        len(regexp_extract_all(w, '[aeiouy]+'))
                        - CASE WHEN regexp_matches(w, '[a-df-z]e$')
                               AND len(regexp_extract_all(
                                     w, '[aeiouy]+')) > 1
                          THEN 1 ELSE 0 END))),
                      (a, s) -> a + s) AS BIGINT) AS n_syllables
          FROM toks
        )
        SELECT doc_id, n_words, n_sentences, n_syllables,
               round(206.835
                     - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                     - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words),
                     4) AS flesch,
               round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
                     + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words)
                     - 15.59, 4) AS fk_grade
        FROM counted WHERE n_words > 0
    """
    oracles["prefix_join"] = """
        WITH docs2 AS (
          SELECT doc_id, text FROM documents WHERE doc_id < 200
          UNION ALL
          SELECT doc_id + 100000, text || ' tail word'
          FROM documents WHERE doc_id < 200
        ), norm AS (
          SELECT doc_id,
                 regexp_split_to_array(
                   regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                   ' ') AS words
          FROM docs2
        ), sh AS (
          SELECT DISTINCT doc_id,
                 CASE WHEN len(words) >= 3
                      THEN words[i] || ' ' || words[i+1] || ' '
                           || words[i+2]
                      ELSE array_to_string(words, ' ') END AS shingle
          FROM norm,
               unnest(generate_series(
                 1, greatest(len(words) - 2, 1))) AS t(i)
        ), sizes AS (
          SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
        ), inter AS (
          SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS n_common
          FROM sh l JOIN sh r USING (shingle)
          WHERE l.doc_id < r.doc_id
          GROUP BY 1, 2
        )
        SELECT a, b, CAST(n_common AS BIGINT) AS n_common,
               round(CAST(n_common AS DOUBLE)
                     / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = a
        JOIN sizes sb ON sb.doc_id = b
        WHERE CAST(n_common AS DOUBLE)
              / (sa.n_sh + sb.n_sh - n_common) >= 0.5
    """
    oracles["naive_bayes"] = """
        WITH q AS (
          SELECT event_id,
                 abs(CAST(round(value*100) AS BIGINT)) AS cents
          FROM events
        ), f AS (
          SELECT event_id AS row_id, cents % 4 AS f1,
                 (cents // 7) % 3 AS f2, cents % 5 AS f3,
                 (cents + cents // 7) % 3 AS y
          FROM q
        ), tr AS (
          SELECT * FROM f WHERE row_id % 2 = 0
        ), sc AS (
          SELECT * FROM f WHERE row_id % 2 = 1
        ), cls AS (
          SELECT y AS cls, CAST(count(*) AS BIGINT) AS n_c
          FROM tr GROUP BY y
        ), tot AS (
          SELECT CAST(count(*) AS BIGINT) AS t FROM tr
        ), ltr AS (
          SELECT 'f1' AS feature, f1 AS value, y AS cls FROM tr
          UNION ALL SELECT 'f2', f2, y FROM tr
          UNION ALL SELECT 'f3', f3, y FROM tr
        ), cells AS (
          SELECT feature, value, cls,
                 CAST(count(*) AS BIGINT) AS c
          FROM ltr GROUP BY feature, value, cls
        ), vsz AS (
          SELECT feature,
                 CAST(count(DISTINCT value) AS BIGINT) AS v
          FROM ltr GROUP BY feature
        ), lsc AS (
          SELECT row_id, 'f1' AS feature, f1 AS value FROM sc
          UNION ALL SELECT row_id, 'f2', f2 FROM sc
          UNION ALL SELECT row_id, 'f3', f3 FROM sc
        ), jj AS (
          SELECT s.row_id, s.feature, c.cls, c.n_c, v.v,
                 COALESCE(ce.c, 0) AS cf
          FROM lsc s
          JOIN vsz v USING (feature)
          CROSS JOIN cls c
          LEFT JOIN cells ce ON ce.feature = s.feature
            AND ce.value = s.value AND ce.cls = c.cls
        ), per AS (
          SELECT row_id, cls, CAST(max(n_c) AS BIGINT) AS n_c,
                 list({'f': feature, 'c': cf, 'v': v}
                      ORDER BY feature, cf, v) AS terms
          FROM jj GROUP BY row_id, cls
        ), scored AS (
          SELECT row_id, cls,
                 ln(CAST(n_c AS DOUBLE)/CAST(t AS DOUBLE))
                 + list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list_transform(terms, s ->
                       ln(CAST(s.c + 1 AS DOUBLE)
                          /CAST(n_c + 1*s.v AS DOUBLE)))),
                     (a, b) -> a + b) AS lp
          FROM per, tot
        ), r AS (
          SELECT row_id, cls, lp,
                 row_number() OVER (PARTITION BY row_id
                                    ORDER BY lp DESC, cls ASC) AS rn
          FROM scored
        )
        SELECT row_id, CAST(cls AS BIGINT) AS pred_class,
               round(lp, 6) AS best_logpost
        FROM r WHERE rn = 1
    """
    oracles["cuped"] = """
        WITH q AS (
          SELECT event_type AS grp, event_id,
                 abs(CAST(round(value*100) AS BIGINT)) AS y
          FROM events
        ), b AS (
          SELECT grp, y, (y // 2) + event_id % 50 AS x FROM q
        ), g AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(x*y) AS BIGINT) AS sxy,
                 CAST(sum(x*x) AS BIGINT) AS sxx
          FROM b
        ), gpool AS (
          SELECT CASE WHEN CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) > 0
                 THEN (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                      /(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                 END AS theta,
                 CAST(sx AS DOUBLE)/CAST(n AS DOUBLE) AS xbar
          FROM g
        ), per AS (
          SELECT grp, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(x*y) AS BIGINT) AS sxy,
                 CAST(sum(x*x) AS BIGINT) AS sxx,
                 CAST(sum(y*y) AS BIGINT) AS syy
          FROM b GROUP BY grp
        ), j AS (
          SELECT grp, n,
                 CAST(sy AS DOUBLE)/CAST(n AS DOUBLE) AS my,
                 CAST(sx AS DOUBLE)/CAST(n AS DOUBLE) AS mx,
                 theta, xbar,
                 (CAST(syy AS DOUBLE)
                  - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)
                    /CAST(n AS DOUBLE))/(CAST(n AS DOUBLE)-1)
                   AS var_y,
                 (CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)
                    /CAST(n AS DOUBLE))/(CAST(n AS DOUBLE)-1)
                   AS cov_xy,
                 (CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)
                    /CAST(n AS DOUBLE))/(CAST(n AS DOUBLE)-1)
                   AS var_x
          FROM per, gpool
        )
        SELECT grp AS event_type, n,
               round(my, 6) AS mean_y,
               round(my - theta*(mx - xbar), 6) AS mean_y_adj,
               round(theta, 6) AS theta,
               round(CASE WHEN var_y > 0 THEN
                 CAST(1.0 AS DOUBLE)
                 - (var_y - CAST(2.0 AS DOUBLE)*theta*cov_xy
                    + theta*theta*var_x)/var_y END, 6)
                 AS var_reduction
        FROM j
    """
    oracles["stl_lite"] = """
        WITH q AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 abs(CAST(round(value*100) AS BIGINT)) AS v,
                 (epoch_us(ts) // 3600000000) % 24 AS phase
          FROM events
        ), c AS (
          SELECT user_id, event_id, us, v, phase,
                 CAST(sum(v) OVER wt AS BIGINT) AS ts_,
                 CAST(count(*) OVER wt AS BIGINT) AS tn,
                 CAST(sum(v) OVER wp AS BIGINT) AS ps,
                 CAST(count(*) OVER wp AS BIGINT) AS pn,
                 CAST(sum(v) OVER wa AS BIGINT) AS gs,
                 CAST(count(*) OVER wa AS BIGINT) AS gn
          FROM q
          WINDOW wt AS (PARTITION BY user_id ORDER BY us, event_id
                        ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING),
                 wp AS (PARTITION BY user_id, phase),
                 wa AS (PARTITION BY user_id)
        )
        SELECT user_id, us AS ts_us, event_id, v,
               CAST(phase AS BIGINT) AS phase,
               round(CAST(ps AS DOUBLE)/CAST(pn AS DOUBLE), 6)
                 AS seasonal,
               round(CAST(ts_ AS DOUBLE)/CAST(tn AS DOUBLE), 6)
                 AS trend,
               round(CAST(v AS DOUBLE)
                     - CAST(ps AS DOUBLE)/CAST(pn AS DOUBLE)
                     - CAST(ts_ AS DOUBLE)/CAST(tn AS DOUBLE)
                     + CAST(gs AS DOUBLE)/CAST(gn AS DOUBLE), 6)
                 AS resid
        FROM c
    """
    oracles["grid_cluster"] = """
        WITH RECURSIVE pts AS (
          SELECT vec_id AS id,
                 CAST(floor(CAST(embedding[1] AS DOUBLE) * 16)
                      AS BIGINT) AS cx,
                 CAST(floor(CAST(embedding[2] AS DOUBLE) * 16)
                      AS BIGINT) AS cy
          FROM embeddings
        ), pc AS (
          SELECT id, cx, cy,
                 (cx + 1048576) * 4398046511104 + (cy + 1048576)
                   AS cell
          FROM pts
        ), dense AS (
          SELECT cell, cx, cy FROM (
            SELECT cell, cx, cy, count(*) AS n
            FROM pc GROUP BY cell, cx, cy)
          WHERE n >= 3
        ), sym AS (
          SELECT d1.cell AS s, d2.cell AS d
          FROM dense d1 JOIN dense d2
            ON abs(d1.cx - d2.cx) <= 1 AND abs(d1.cy - d2.cy) <= 1
        ), reach(s, d) AS (
          SELECT s, d FROM sym
          UNION
          SELECT r.s, e.d FROM reach r JOIN sym e ON r.d = e.s
        ), comp AS (
          SELECT s AS cell, CAST(MIN(d) AS BIGINT) AS cluster
          FROM reach GROUP BY s
        )
        SELECT pc.id AS vec_id, pc.cx, pc.cy,
               comp.cluster IS NOT NULL AS is_core,
               comp.cluster
        FROM pc LEFT JOIN comp ON comp.cell = pc.cell
    """
    oracles["trigram_backoff"] = """
        WITH d0 AS (
          SELECT doc_id,
                 regexp_split_to_array(trim(lower(text)), '\\s+')
                   AS tk
          FROM documents WHERE source = 'src0' AND trim(text) <> ''
        ), r0 AS (
          SELECT doc_id,
                 regexp_split_to_array(trim(lower(text)), '\\s+')
                   AS tk
          FROM documents WHERE source <> 'src0' AND trim(text) <> ''
        ), dtri AS (
          SELECT doc_id, u.w1, u.w2, u.w3 FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(tk) - 1),
                     p -> {'w1': tk[p], 'w2': tk[p+1],
                           'w3': tk[p+2]})) AS u
            FROM d0 WHERE len(tk) >= 3)
        ), rtri AS (
          SELECT u.w1, u.w2, u.w3 FROM (
            SELECT unnest(list_transform(range(1, len(tk) - 1),
                     p -> {'w1': tk[p], 'w2': tk[p+1],
                           'w3': tk[p+2]})) AS u
            FROM r0 WHERE len(tk) >= 3)
        ), rpair AS (
          SELECT u.p1, u.p2 FROM (
            SELECT unnest(list_transform(range(1, len(tk)),
                     p -> {'p1': tk[p], 'p2': tk[p+1]})) AS u
            FROM r0 WHERE len(tk) >= 2)
        ), runi AS (
          SELECT unnest(tk) AS u FROM r0
        ), c_tri AS (
          SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS c123
          FROM rtri GROUP BY w1, w2, w3
        ), c_pair AS (
          SELECT p1, p2, CAST(count(*) AS BIGINT) AS cp
          FROM rpair GROUP BY p1, p2
        ), c_uni AS (
          SELECT u, CAST(count(*) AS BIGINT) AS cu
          FROM runi GROUP BY u
        ), tot AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(count(DISTINCT u) AS BIGINT) AS v
          FROM runi
        ), j AS (
          SELECT d.doc_id,
                 COALESCE(t.c123, 0) AS c123,
                 COALESCE(p12.cp, 0) AS c12,
                 COALESCE(p23.cp, 0) AS c23,
                 COALESCE(u2.cu, 0) AS c2,
                 COALESCE(u3.cu, 0) AS c3
          FROM dtri d
          LEFT JOIN c_tri t ON t.w1 = d.w1 AND t.w2 = d.w2
                           AND t.w3 = d.w3
          LEFT JOIN c_pair p12 ON p12.p1 = d.w1 AND p12.p2 = d.w2
          LEFT JOIN c_pair p23 ON p23.p1 = d.w2 AND p23.p2 = d.w3
          LEFT JOIN c_uni u2 ON u2.u = d.w2
          LEFT JOIN c_uni u3 ON u3.u = d.w3
        ), per AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
                 list({'c123': c123, 'c12': c12, 'c23': c23,
                       'c2': c2, 'c3': c3}
                      ORDER BY c123, c12, c23, c2, c3) AS terms
          FROM j GROUP BY doc_id
        )
        SELECT doc_id, n_trigrams,
               round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(terms, s ->
                   CASE WHEN s.c123 > 0 THEN
                     ln(CAST(s.c123 AS DOUBLE)/CAST(s.c12 AS DOUBLE))
                   WHEN s.c23 > 0 THEN
                     ln(CAST(0.4 AS DOUBLE)*CAST(s.c23 AS DOUBLE)
                        /CAST(s.c2 AS DOUBLE))
                   ELSE
                     ln(CAST(0.4 AS DOUBLE)*CAST(0.4 AS DOUBLE)
                        *CAST(s.c3 + 1 AS DOUBLE)
                        /CAST(n + v AS DOUBLE))
                   END)), (acc, y) -> acc + y)
                 / CAST(n_trigrams AS DOUBLE), 6) AS trigram_logprob
        FROM per, tot
    """
    oracles["pit_ols"] = """
        WITH q AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 abs(CAST(round(value*100) AS BIGINT)) AS v
          FROM events
        ), b AS (
          SELECT user_id, event_id, us, v,
                 (us - min(us) OVER wcur) // 1000000 AS x
          FROM q
          WINDOW wcur AS (PARTITION BY user_id ORDER BY us, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW)
        ), c AS (
          SELECT user_id, event_id, us, v, x,
                 CAST(count(*) OVER wp AS BIGINT) AS n,
                 CAST(sum(x) OVER wp AS BIGINT) AS sx,
                 CAST(sum(v) OVER wp AS BIGINT) AS sy,
                 CAST(sum(x*v) OVER wp AS BIGINT) AS sxy,
                 CAST(sum(x*x) OVER wp AS BIGINT) AS sxx
          FROM b
          WINDOW wp AS (PARTITION BY user_id ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING)
        )
        SELECT user_id, us AS ts_us, event_id, v AS y,
               COALESCE(n, 0) AS n_prior,
               round(CASE WHEN n >= 2
                           AND (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) > 0
                     THEN (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                           - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                          /(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                     END, 6) AS slope,
               round(CASE WHEN n >= 2
                           AND (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) > 0
                     THEN (CAST(sy AS DOUBLE)
                           - ((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                               - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                              /(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)))
                             *CAST(sx AS DOUBLE))/CAST(n AS DOUBLE)
                     END, 6) AS intercept,
               round(CASE WHEN n >= 2
                           AND (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) > 0
                     THEN (CAST(sy AS DOUBLE)
                           - ((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                               - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                              /(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)))
                             *CAST(sx AS DOUBLE))/CAST(n AS DOUBLE)
                          + ((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                              - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                             /(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                               - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)))
                            *CAST(x AS DOUBLE)
                     END, 6) AS prediction
        FROM c
    """
    oracles["uplift_deciles"] = """
        WITH q AS (
          SELECT event_id,
                 abs(CAST(round(value*100) AS BIGINT)) AS cents
          FROM events
        ), s AS (
          SELECT event_id, cents % 97 AS score,
                 event_id % 2 = 0 AS t,
                 CASE WHEN (cents // 7) % 3 = 0 THEN 1 ELSE 0 END AS y
          FROM q
        ), b AS (
          SELECT y, t,
                 ntile(10) OVER (ORDER BY score DESC, event_id)
                   AS bucket
          FROM s
        ), per AS (
          SELECT bucket,
                 CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_t,
                 CAST(sum(CASE WHEN t THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_c,
                 CAST(sum(CASE WHEN t THEN y ELSE 0 END) AS BIGINT)
                   AS resp_t,
                 CAST(sum(CASE WHEN t THEN 0 ELSE y END) AS BIGINT)
                   AS resp_c
          FROM b GROUP BY bucket
        ), c AS (
          SELECT bucket, n_t, n_c, resp_t, resp_c,
                 CAST(sum(n_t) OVER wc AS BIGINT) AS cnt,
                 CAST(sum(n_c) OVER wc AS BIGINT) AS cnc,
                 CAST(sum(resp_t) OVER wc AS BIGINT) AS crt,
                 CAST(sum(resp_c) OVER wc AS BIGINT) AS crc
          FROM per
          WINDOW wc AS (ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW)
        )
        SELECT CAST(bucket AS BIGINT) AS bucket, n_t, n_c, resp_t,
               resp_c,
               round(CASE WHEN n_t > 0 THEN
                     CAST(resp_t AS DOUBLE)/CAST(n_t AS DOUBLE)
                     END, 6) AS rate_t,
               round(CASE WHEN n_c > 0 THEN
                     CAST(resp_c AS DOUBLE)/CAST(n_c AS DOUBLE)
                     END, 6) AS rate_c,
               round(CASE WHEN n_t > 0 AND n_c > 0 THEN
                     CAST(resp_t AS DOUBLE)/CAST(n_t AS DOUBLE)
                     - CAST(resp_c AS DOUBLE)/CAST(n_c AS DOUBLE)
                     END, 6) AS uplift,
               round(CASE WHEN cnt > 0 AND cnc > 0 THEN
                     CAST(crt AS DOUBLE)/CAST(cnt AS DOUBLE)
                     - CAST(crc AS DOUBLE)/CAST(cnc AS DOUBLE)
                     END, 6) AS cum_uplift
        FROM c
    """
    oracles["winnowing"] = """
        WITH docs2 AS (
          SELECT doc_id AS id, text FROM documents
          WHERE doc_id < 120
          UNION ALL
          SELECT doc_id + 100000,
                 substring(text, 21) || ' extra trailing words here'
          FROM documents WHERE doc_id < 120
        ), hs AS (
          SELECT id,
                 list_transform(
                   range(1, greatest(length(text) - 7, 0) + 1),
                   p -> list_reduce(
                     list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(0, 8),
                         o -> CAST(ascii(substr(text,
                                CAST(p + o AS INT), 1)) AS BIGINT))),
                     (acc, y) -> (acc * 31 + y) % 2147483647)) AS h
          FROM docs2
        ), fp AS (
          SELECT DISTINCT id, fingerprint FROM (
            SELECT id,
                   unnest(list_transform(
                     range(1, greatest(len(h) - 3, 0) + 1),
                     p -> list_min(h[p:p+3]))) AS fingerprint
            FROM hs WHERE len(h) >= 4)
        )
        SELECT l.id AS a, r.id AS b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM fp l JOIN fp r
          ON l.fingerprint = r.fingerprint AND l.id < r.id
        GROUP BY l.id, r.id
        HAVING count(*) >= 3
    """
    oracles["quantile_bin"] = """
        WITH q AS (
          SELECT event_id,
                 abs(CAST(round(value*100) AS BIGINT)) AS cents
          FROM events
        ), pv AS (
          SELECT cents, CAST(count(*) AS BIGINT) AS t
          FROM q GROUP BY cents
        ), bm AS (
          SELECT cents,
                 (10 * COALESCE(SUM(t) OVER (ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0))
                 // (SUM(t) OVER ()) AS qbin
          FROM pv
        )
        SELECT q.event_id, q.cents, CAST(bm.qbin AS BIGINT) AS qbin
        FROM q JOIN bm USING (cents)
    """
    oracles["haar_energy"] = """
        WITH q0 AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 abs(CAST(round(value*100) AS BIGINT)) AS v
          FROM events
        ), r AS (
          SELECT user_id, v,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY us, event_id) - 1 AS idx,
                 count(*) OVER (PARTITION BY user_id) AS n_tot
          FROM q0
        ), t AS (
          SELECT user_id, idx, (n_tot // 8) * 8 AS n_used, v AS s
          FROM r WHERE idx < (n_tot // 8) * 8
        ), l1 AS (
          SELECT user_id, idx // 2 AS idx,
                 CAST(max(n_used) AS BIGINT) AS n_used,
                 CAST(sum(CASE WHEN idx % 2 = 0 THEN s END)
                      + sum(CASE WHEN idx % 2 = 1 THEN s END)
                      AS BIGINT) AS s,
                 CAST(sum(CASE WHEN idx % 2 = 0 THEN s END)
                      - sum(CASE WHEN idx % 2 = 1 THEN s END)
                      AS BIGINT) AS d
          FROM t GROUP BY user_id, idx // 2
        ), l2 AS (
          SELECT user_id, idx // 2 AS idx,
                 CAST(max(n_used) AS BIGINT) AS n_used,
                 CAST(sum(CASE WHEN idx % 2 = 0 THEN s END)
                      + sum(CASE WHEN idx % 2 = 1 THEN s END)
                      AS BIGINT) AS s,
                 CAST(sum(CASE WHEN idx % 2 = 0 THEN s END)
                      - sum(CASE WHEN idx % 2 = 1 THEN s END)
                      AS BIGINT) AS d
          FROM l1 GROUP BY user_id, idx // 2
        ), l3 AS (
          SELECT user_id, idx // 2 AS idx,
                 CAST(max(n_used) AS BIGINT) AS n_used,
                 CAST(sum(CASE WHEN idx % 2 = 0 THEN s END)
                      - sum(CASE WHEN idx % 2 = 1 THEN s END)
                      AS BIGINT) AS d
          FROM l2 GROUP BY user_id, idx // 2
        ), e1 AS (
          SELECT user_id, CAST(max(n_used) AS BIGINT) AS n_used,
                 CAST(sum(d*d) AS BIGINT) AS e1
          FROM l1 GROUP BY user_id
        ), e2 AS (
          SELECT user_id, CAST(sum(d*d) AS BIGINT) AS e2
          FROM l2 GROUP BY user_id
        ), e3 AS (
          SELECT user_id, CAST(sum(d*d) AS BIGINT) AS e3
          FROM l3 GROUP BY user_id
        )
        SELECT e1.user_id, n_used, e1.e1, e2.e2, e3.e3
        FROM e1 JOIN e2 USING (user_id) JOIN e3 USING (user_id)
    """
    oracles["modularity"] = """
        WITH e AS (
          SELECT l_suppkey AS u, l_partkey % 500 + 1000 AS v
          FROM lineitem
        ), canon AS (
          SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
          FROM e WHERE u <> v
        ), asg AS (
          SELECT node, node // 64 AS c FROM (
            SELECT a AS node FROM canon
            UNION SELECT b AS node FROM canon)
        ), tagged AS (
          SELECT canon.a, canon.b, ca.c AS c_a, cb.c AS c_b
          FROM canon
          JOIN asg ca ON ca.node = canon.a
          JOIN asg cb ON cb.node = canon.b
        ), intra AS (
          SELECT c_a AS c, CAST(count(*) AS BIGINT) AS e_c
          FROM tagged WHERE c_a = c_b GROUP BY c_a
        ), deg AS (
          SELECT c, CAST(count(*) AS BIGINT) AS deg_c FROM (
            SELECT c_a AS c FROM tagged
            UNION ALL SELECT c_b AS c FROM tagged)
          GROUP BY c
        ), per_c AS (
          SELECT deg.c, deg_c, COALESCE(e_c, 0) AS e_c
          FROM deg LEFT JOIN intra ON intra.c = deg.c
        ), m AS (
          SELECT CAST(count(*) AS BIGINT) AS m FROM canon
        ), agg AS (
          SELECT CAST(count(*) AS BIGINT) AS k,
                 list({'c': c, 'e_c': e_c, 'deg_c': deg_c}
                      ORDER BY c) AS cs
          FROM per_c
        )
        SELECT m, k AS n_communities,
               round(list_reduce(list_prepend(0.0,
                 list_transform(cs, x ->
                   CAST(x.e_c AS DOUBLE) / CAST(m AS DOUBLE)
                   - (CAST(x.deg_c AS DOUBLE)
                      / (CAST(2.0 AS DOUBLE) * CAST(m AS DOUBLE)))
                     * (CAST(x.deg_c AS DOUBLE)
                        / (CAST(2.0 AS DOUBLE) * CAST(m AS DOUBLE))))),
                 (acc, y) -> acc + y), 6) AS q
        FROM agg, m
    """
    oracles["k_anonymity"] = """
        WITH q AS (
          SELECT abs(CAST(round(value*100) AS BIGINT)) % 10 AS qa,
                 CAST(hour(ts) % 4 AS BIGINT) AS qb,
                 event_type AS sens
          FROM events
        )
        SELECT qa, qb, CAST(count(*) AS BIGINT) AS class_size,
               count(*) < 50 AS violates_k,
               CAST(count(DISTINCT sens) AS BIGINT) AS n_sensitive,
               count(DISTINCT sens) < 5 AS violates_l
        FROM q GROUP BY qa, qb
    """
    oracles["kendall_tau"] = """
        WITH q AS (
          SELECT abs(CAST(round(value*100) AS BIGINT)) AS cents
          FROM events
        ), s AS (
          SELECT cents % 25 AS x,
                 ((cents % 25)*3 + (cents // 7) % 10) % 30 AS y
          FROM q
        ), cells AS (
          SELECT x, y, CAST(count(*) AS BIGINT) AS c
          FROM s GROUP BY x, y
        ), cd AS (
          SELECT
            CAST(sum(CASE WHEN a.y < b.y THEN a.c*b.c ELSE 0 END)
                 AS BIGINT) AS conc,
            CAST(sum(CASE WHEN a.y > b.y THEN a.c*b.c ELSE 0 END)
                 AS BIGINT) AS disc
          FROM cells a JOIN cells b ON a.x < b.x
        ), tx AS (
          SELECT CAST(sum(t*(t-1)) AS BIGINT) AS tx2,
                 CAST(sum(t) AS BIGINT) AS n
          FROM (SELECT CAST(sum(c) AS BIGINT) AS t
                FROM cells GROUP BY x)
        ), ty AS (
          SELECT CAST(sum(t*(t-1)) AS BIGINT) AS ty2
          FROM (SELECT CAST(sum(c) AS BIGINT) AS t
                FROM cells GROUP BY y)
        )
        SELECT n, CAST(n*(n-1)/2 AS BIGINT) AS n_pairs,
               conc AS concordant, disc AS discordant,
               round(CASE WHEN n*(n-1) > tx2 AND n*(n-1) > ty2 THEN
                 (CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))
                 / (sqrt(CAST(n*(n-1) - tx2 AS DOUBLE)
                         * CAST(n*(n-1) - ty2 AS DOUBLE))
                    / CAST(2.0 AS DOUBLE)) END, 6) AS tau_b
        FROM cd, tx, ty
    """
    oracles["stump_split"] = """
        WITH q AS (
          SELECT abs(CAST(round(value*100) AS BIGINT)) AS cents
          FROM events
        ), s AS (
          SELECT cents % 50 AS x, (cents // 7) % 3 AS y FROM q
        ), cells AS (
          SELECT x, y, CAST(count(*) AS BIGINT) AS c
          FROM s GROUP BY x, y
        ), toty AS (
          SELECT y, CAST(sum(c) AS BIGINT) AS ty FROM cells GROUP BY y
        ), grid AS (
          SELECT DISTINCT xs.x, ys.y
          FROM (SELECT DISTINCT x FROM cells) xs,
               (SELECT DISTINCT y FROM cells) ys
        ), cand AS (
          SELECT g.x, g.y, t.ty,
                 CAST(COALESCE(sum(c2.c), 0) AS BIGINT) AS nly
          FROM grid g
          JOIN toty t ON t.y = g.y
          LEFT JOIN cells c2 ON c2.y = g.y AND c2.x <= g.x
          GROUP BY g.x, g.y, t.ty
        ), per_t AS (
          SELECT x, CAST(sum(nly) AS BIGINT) AS n_l,
                 CAST(sum(ty) AS BIGINT) AS n,
                 list_sort(list({'y': y, 'nly': nly, 'ty': ty}))
                   AS cls
          FROM cand GROUP BY x
        ), scored AS (
          SELECT x AS threshold, n_l AS n_left, n - n_l AS n_right,
            list_reduce(list_prepend(0.0, list_transform(cls, s ->
              CASE WHEN s.ty > 0 THEN
                -(CAST(s.ty AS DOUBLE) / CAST(n AS DOUBLE))
                * ln(CAST(s.ty AS DOUBLE) / CAST(n AS DOUBLE))
              ELSE 0.0 END)), (a, b) -> a + b) AS h_parent,
            list_reduce(list_prepend(0.0, list_transform(cls, s ->
              CASE WHEN s.nly > 0 THEN
                -(CAST(s.nly AS DOUBLE) / CAST(n_l AS DOUBLE))
                * ln(CAST(s.nly AS DOUBLE) / CAST(n_l AS DOUBLE))
              ELSE 0.0 END)), (a, b) -> a + b) AS h_l,
            list_reduce(list_prepend(0.0, list_transform(cls, s ->
              CASE WHEN s.ty - s.nly > 0 THEN
                -(CAST(s.ty - s.nly AS DOUBLE)
                  / (CAST(n AS DOUBLE) - CAST(n_l AS DOUBLE)))
                * ln(CAST(s.ty - s.nly AS DOUBLE)
                     / (CAST(n AS DOUBLE) - CAST(n_l AS DOUBLE)))
              ELSE 0.0 END)), (a, b) -> a + b) AS h_r,
            CAST(n_l AS DOUBLE) AS nld, CAST(n AS DOUBLE) AS nd
          FROM per_t WHERE n_l < n
        ), fin AS (
          SELECT threshold, n_left, n_right, h_parent,
                 h_parent - (nld / nd) * h_l
                 - ((nd - nld) / nd) * h_r AS gain
          FROM scored
        )
        SELECT CAST(threshold AS BIGINT) AS threshold, n_left,
               n_right, round(h_parent, 6) AS h_parent,
               round(gain, 6) AS gain
        FROM fin ORDER BY gain DESC, threshold ASC LIMIT 1
    """
    oracles["quantile_contract"] = """
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               round(quantile_cont(
                 abs(CAST(round(value*100) AS BIGINT)), 0.5), 6)
                 AS p50_exact,
               TRUE AS within_rank_bound
        FROM events GROUP BY event_type
    """
    oracles["tpch_q4"] = """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND epoch_us(l.l_shipdate)
                  > epoch_us(o.o_orderdate) + 2592000000000)
        GROUP BY o_orderpriority
    """
    oracles["tpch_q12"] = """
        SELECT l_returnflag AS mode,
               CAST(sum(CASE WHEN o_orderpriority
                             IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT)
                 AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority
                             IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT)
                 AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_returnflag
    """
    oracles["lift_table"] = """
        WITH q AS (
          SELECT event_id,
                 abs(CAST(round(value*100) AS BIGINT)) AS cents
          FROM events
        ), s AS (
          SELECT event_id, cents % 97 AS score,
                 CASE WHEN (cents // 7) % 3 = 0 THEN 1 ELSE 0 END AS y
          FROM q
        ), b AS (
          SELECT y, ntile(10) OVER (ORDER BY score DESC, event_id)
                 AS bucket
          FROM s
        ), per AS (
          SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS pos
          FROM b GROUP BY bucket
        ), c AS (
          SELECT bucket, n, pos,
                 CAST(sum(n) OVER wc AS BIGINT) AS cum_n,
                 CAST(sum(pos) OVER wc AS BIGINT) AS cum_pos,
                 CAST(sum(n) OVER () AS BIGINT) AS tot_n,
                 CAST(sum(pos) OVER () AS BIGINT) AS tot_pos
          FROM per
          WINDOW wc AS (ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW)
        )
        SELECT CAST(bucket AS BIGINT) AS bucket, n, pos, cum_n,
               cum_pos,
               round(CAST(pos AS DOUBLE)/CAST(n AS DOUBLE), 6)
                 AS response_rate,
               round(CASE WHEN tot_pos > 0 THEN
                     CAST(cum_pos AS DOUBLE)/CAST(tot_pos AS DOUBLE)
                     END, 6) AS cum_capture,
               round(CASE WHEN tot_pos > 0 THEN
                     (CAST(cum_pos AS DOUBLE)/CAST(cum_n AS DOUBLE))
                     /(CAST(tot_pos AS DOUBLE)/CAST(tot_n AS DOUBLE))
                     END, 6) AS cum_lift
        FROM c
    """
    oracles["brier_decomp"] = """
        WITH q AS (
          SELECT abs(CAST(round(value*100) AS BIGINT)) AS cents
          FROM events
        ), s AS (
          SELECT cents % 101 AS k,
                 CASE WHEN (cents*13) % 100 < cents % 101
                 THEN 1 ELSE 0 END AS y
          FROM q
        ), per AS (
          SELECT k, CAST(count(*) AS BIGINT) AS n_k,
                 CAST(sum(y) AS BIGINT) AS pos_k,
                 CAST(sum((k - 100*y)*(k - 100*y)) AS BIGINT) AS sq_k
          FROM s GROUP BY k
        ), agg AS (
          SELECT CAST(sum(n_k) AS BIGINT) AS n,
                 CAST(count(*) AS BIGINT) AS g,
                 CAST(sum(pos_k) AS BIGINT) AS pos,
                 CAST(sum(sq_k) AS BIGINT) AS sq,
                 list({'k': k, 'n_k': n_k, 'pos_k': pos_k}
                      ORDER BY k) AS cells
          FROM per
        ), c AS (
          SELECT n, g, sq,
                 CAST(pos AS DOUBLE)/CAST(n AS DOUBLE) AS obar,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(cells, e ->
                     CAST(e.n_k AS DOUBLE)
                     *(CAST(e.k AS DOUBLE)/CAST(100.0 AS DOUBLE)
                       - CAST(e.pos_k AS DOUBLE)
                         /CAST(e.n_k AS DOUBLE))
                     *(CAST(e.k AS DOUBLE)/CAST(100.0 AS DOUBLE)
                       - CAST(e.pos_k AS DOUBLE)
                         /CAST(e.n_k AS DOUBLE)))),
                   (acc, y) -> acc + y) AS rel_sum,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(cells, e ->
                     CAST(e.n_k AS DOUBLE)
                     *(CAST(e.pos_k AS DOUBLE)/CAST(e.n_k AS DOUBLE)
                       - CAST(pos AS DOUBLE)/CAST(n AS DOUBLE))
                     *(CAST(e.pos_k AS DOUBLE)/CAST(e.n_k AS DOUBLE)
                       - CAST(pos AS DOUBLE)/CAST(n AS DOUBLE)))),
                   (acc, y) -> acc + y) AS res_sum
          FROM agg
        )
        SELECT n, g AS n_groups,
               round(CAST(sq AS DOUBLE)
                     /(CAST(n AS DOUBLE)
                       *CAST(10000.0 AS DOUBLE)), 6) AS brier,
               round(rel_sum/CAST(n AS DOUBLE), 6) AS rel,
               round(res_sum/CAST(n AS DOUBLE), 6) AS res,
               round(obar*(CAST(1.0 AS DOUBLE) - obar), 6) AS unc
        FROM c
    """
    oracles["gopher_rules"] = """
        WITH d AS (
          SELECT doc_id, text,
                 list_filter(str_split_regex(trim(text), '\\s+'),
                             x -> length(x) > 0) AS w
          FROM documents
        ), c AS (
          SELECT doc_id, text,
                 CAST(len(w) AS BIGINT) AS n_words,
                 CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(w,
                          x -> CAST(length(x) AS BIGINT))),
                        (a, b) -> a + b) AS BIGINT) AS sum_word_len,
                 CAST(len(list_filter(w,
                        x -> regexp_matches(x, '[A-Za-z]')))
                      AS BIGINT) AS n_alpha_words,
                 CAST(len(list_filter(w,
                        x -> list_contains(['the','be','to','of',
                                            'and','that','have',
                                            'with'], lower(x))))
                      AS BIGINT) AS n_stopwords,
                 CAST(length(text)
                      - length(regexp_replace(text, '[#…]', '', 'g'))
                      AS BIGINT) AS n_symbols
          FROM d
        )
        SELECT doc_id, n_words, sum_word_len, n_alpha_words,
               n_stopwords, n_symbols,
               round(CASE WHEN n_words > 0 THEN
                     CAST(sum_word_len AS DOUBLE)
                     /CAST(n_words AS DOUBLE) END, 6)
                 AS mean_word_len,
               n_words >= 20 AND n_words <= 100000
                 AS flag_word_count,
               n_words > 0 AND sum_word_len >= 3*n_words
                 AND sum_word_len <= 10*n_words AS flag_mean_len,
               n_symbols*10 <= n_words AS flag_symbols,
               n_alpha_words*100 >= 80*n_words AS flag_alpha,
               n_stopwords >= 2 AS flag_stopwords,
               (n_words >= 20 AND n_words <= 100000)
                 AND (n_words > 0 AND sum_word_len >= 3*n_words
                      AND sum_word_len <= 10*n_words)
                 AND (n_symbols*10 <= n_words)
                 AND (n_alpha_words*100 >= 80*n_words)
                 AND (n_stopwords >= 2) AS gopher_pass
        FROM c
    """
    oracles["link_prediction"] = """
        WITH e AS (
          SELECT DISTINCT l_suppkey AS a, l_partkey AS w FROM lineitem
        ), degw AS (
          SELECT w, CAST(count(*) AS BIGINT) AS dw FROM e GROUP BY w
        ), dega AS (
          SELECT a, CAST(count(*) AS BIGINT) AS da FROM e GROUP BY a
        ), wed AS (
          SELECT e1.a AS a, e2.a AS b, e1.w
          FROM e e1 JOIN e e2 ON e1.w = e2.w
          WHERE e1.a < e2.a
        ), g AS (
          SELECT a, b, CAST(count(*) AS BIGINT) AS cn,
                 list_sort(list(dw)) AS degs
          FROM wed JOIN degw USING (w)
          GROUP BY a, b
        )
        SELECT g.a, g.b, cn, d1.da AS deg_a, d2.da AS deg_b,
               round(CAST(cn AS DOUBLE)
                     / CAST(d1.da + d2.da - cn AS DOUBLE), 6)
                 AS jaccard,
               round(list_reduce(
                       list_prepend(CAST(0 AS DOUBLE),
                         list_transform(degs,
                           d -> CAST(1.0 AS DOUBLE)
                                / ln(CAST(d AS DOUBLE)))),
                       (acc, y) -> acc + y), 6) AS adamic_adar
        FROM g JOIN dega d1 ON g.a = d1.a
               JOIN dega d2 ON g.b = d2.a
    """
    _sp_pairs = []
    for _a, _b in (("f1", "f2"), ("f1", "f3"), ("f2", "f3")):
        _sp_pairs.append(f"""
          SELECT '{_a}' AS col_x, '{_b}' AS col_y, n,
                 round(CASE WHEN (CAST(n AS DOUBLE)*CAST(ss_{_a} AS DOUBLE)
                                  - CAST(s_{_a} AS DOUBLE)*CAST(s_{_a} AS DOUBLE)) > 0
                             AND (CAST(n AS DOUBLE)*CAST(ss_{_b} AS DOUBLE)
                                  - CAST(s_{_b} AS DOUBLE)*CAST(s_{_b} AS DOUBLE)) > 0
                        THEN (CAST(n AS DOUBLE)*CAST(sp_{_a}_{_b} AS DOUBLE)
                              - CAST(s_{_a} AS DOUBLE)*CAST(s_{_b} AS DOUBLE))
                             / sqrt((CAST(n AS DOUBLE)*CAST(ss_{_a} AS DOUBLE)
                                     - CAST(s_{_a} AS DOUBLE)*CAST(s_{_a} AS DOUBLE))
                                    * (CAST(n AS DOUBLE)*CAST(ss_{_b} AS DOUBLE)
                                       - CAST(s_{_b} AS DOUBLE)*CAST(s_{_b} AS DOUBLE)))
                        END, 6) AS rho
          FROM s""")
    oracles["spearman_corr"] = f"""
        WITH q0 AS (
          SELECT event_id, abs(CAST(round(value*100) AS BIGINT)) AS cents
          FROM events
        ), f AS (
          SELECT event_id, cents % 500 AS f1, cents % 97 AS f2,
                 (cents * 7) % 211 AS f3
          FROM q0
        ), r AS (
          SELECT event_id,
                 2*RANK() OVER (ORDER BY f1)
                   + CAST(count(*) OVER (PARTITION BY f1) AS BIGINT) - 1 AS rf1,
                 2*RANK() OVER (ORDER BY f2)
                   + CAST(count(*) OVER (PARTITION BY f2) AS BIGINT) - 1 AS rf2,
                 2*RANK() OVER (ORDER BY f3)
                   + CAST(count(*) OVER (PARTITION BY f3) AS BIGINT) - 1 AS rf3
          FROM f
        ), s AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(rf1) AS BIGINT) AS s_f1,
                 CAST(sum(rf1*rf1) AS BIGINT) AS ss_f1,
                 CAST(sum(rf2) AS BIGINT) AS s_f2,
                 CAST(sum(rf2*rf2) AS BIGINT) AS ss_f2,
                 CAST(sum(rf3) AS BIGINT) AS s_f3,
                 CAST(sum(rf3*rf3) AS BIGINT) AS ss_f3,
                 CAST(sum(rf1*rf2) AS BIGINT) AS sp_f1_f2,
                 CAST(sum(rf1*rf3) AS BIGINT) AS sp_f1_f3,
                 CAST(sum(rf2*rf3) AS BIGINT) AS sp_f2_f3
          FROM r
        )
        {' UNION ALL '.join(_sp_pairs)}
    """
    oracles["kruskal_wallis"] = """
        WITH q0 AS (
          SELECT event_type AS g,
                 abs(CAST(round(value*100) AS BIGINT)) AS v
          FROM events
        ), pv AS (
          SELECT v, CAST(count(*) AS BIGINT) AS t FROM q0 GROUP BY v
        ), rv AS (
          SELECT v,
                 2*(COALESCE(SUM(t) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) + 1) + t - 1 AS r2
          FROM pv
        ), j AS (
          SELECT g, r2 FROM q0 JOIN rv USING (v)
        ), pg AS (
          SELECT g, CAST(count(*) AS BIGINT) AS n_g,
                 CAST(sum(r2) AS BIGINT) AS rr
          FROM j GROUP BY g
        ), gt AS (
          SELECT CAST(sum(n_g) AS BIGINT) AS n,
                 CAST(count(*) AS BIGINT) AS k,
                 list(CAST(rr AS DOUBLE)*CAST(rr AS DOUBLE)
                      /CAST(n_g AS DOUBLE) ORDER BY g) AS terms
          FROM pg
        ), tt AS (
          SELECT CAST(sum(t*t*t - t) AS BIGINT) AS t3t FROM pv
        ), c AS (
          SELECT n, k,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE), terms),
                             (acc, y) -> acc + y) AS fold,
                 t3t
          FROM gt, tt
        )
        SELECT n, k AS n_groups,
               round(CAST(3.0 AS DOUBLE)*fold
                       /(CAST(n AS DOUBLE)*(CAST(n AS DOUBLE)+1))
                     - CAST(3.0 AS DOUBLE)*(CAST(n AS DOUBLE)+1), 6)
                 AS h,
               round(CAST(1.0 AS DOUBLE)
                     - CAST(t3t AS DOUBLE)
                       /(CAST(n AS DOUBLE)*CAST(n AS DOUBLE)
                         *CAST(n AS DOUBLE) - CAST(n AS DOUBLE)), 6)
                 AS tie_c,
               round(CASE WHEN (CAST(1.0 AS DOUBLE)
                     - CAST(t3t AS DOUBLE)
                       /(CAST(n AS DOUBLE)*CAST(n AS DOUBLE)
                         *CAST(n AS DOUBLE) - CAST(n AS DOUBLE))) > 0
                     THEN (CAST(3.0 AS DOUBLE)*fold
                             /(CAST(n AS DOUBLE)*(CAST(n AS DOUBLE)+1))
                           - CAST(3.0 AS DOUBLE)*(CAST(n AS DOUBLE)+1))
                          / (CAST(1.0 AS DOUBLE)
                             - CAST(t3t AS DOUBLE)
                               /(CAST(n AS DOUBLE)*CAST(n AS DOUBLE)
                                 *CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
                     END, 6) AS h_c
        FROM c
    """
    oracles["welch_ttest"] = """
        WITH q0 AS (
          SELECT event_type AS grp, event_id % 2 = 0 AS flag,
                 abs(CAST(round(value*100) AS BIGINT)) AS v
          FROM events
        ), a AS (
          SELECT grp,
                 CAST(count(CASE WHEN flag THEN v END) AS BIGINT) AS na,
                 CAST(sum(CASE WHEN flag THEN v END) AS BIGINT) AS sa,
                 CAST(sum(CASE WHEN flag THEN v*v END) AS BIGINT) AS ssa,
                 CAST(count(CASE WHEN NOT flag THEN v END) AS BIGINT) AS nb,
                 CAST(sum(CASE WHEN NOT flag THEN v END) AS BIGINT) AS sb,
                 CAST(sum(CASE WHEN NOT flag THEN v*v END) AS BIGINT) AS ssb
          FROM q0 GROUP BY grp
        ), e AS (
          SELECT grp, na, nb,
                 CAST(sa AS DOUBLE)/CAST(na AS DOUBLE) AS ma,
                 CAST(sb AS DOUBLE)/CAST(nb AS DOUBLE) AS mb,
                 (CAST(na AS DOUBLE)*CAST(ssa AS DOUBLE)
                  - CAST(sa AS DOUBLE)*CAST(sa AS DOUBLE))
                 /(CAST(na AS DOUBLE)*(CAST(na AS DOUBLE)-1))
                 /CAST(na AS DOUBLE) AS sea,
                 (CAST(nb AS DOUBLE)*CAST(ssb AS DOUBLE)
                  - CAST(sb AS DOUBLE)*CAST(sb AS DOUBLE))
                 /(CAST(nb AS DOUBLE)*(CAST(nb AS DOUBLE)-1))
                 /CAST(nb AS DOUBLE) AS seb
          FROM a
        )
        SELECT grp AS event_type, na AS n_a, nb AS n_b,
               round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
               round(CASE WHEN na >= 2 AND nb >= 2 AND sea + seb > 0
                     THEN (ma - mb)/sqrt(sea + seb) END, 6) AS t,
               round(CASE WHEN na >= 2 AND nb >= 2 AND sea + seb > 0
                     THEN (sea + seb)*(sea + seb)
                          /(sea*sea/(CAST(na AS DOUBLE)-1)
                            + seb*seb/(CAST(nb AS DOUBLE)-1)) END, 6)
                 AS df
        FROM e
    """
    _acf_lags = []
    for _k in (1, 2, 3):
        _acf_lags.append(f"""
               round(CASE WHEN n > {_k}
                           AND (CAST(q AS DOUBLE)
                                - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)
                                  /CAST(n AS DOUBLE)) > 0
                     THEN (CAST(c{_k} AS DOUBLE)
                           - (CAST(s AS DOUBLE)/CAST(n AS DOUBLE))
                             *(CAST(head{_k} AS DOUBLE)
                               + CAST(tail{_k} AS DOUBLE))
                           + CAST(n - {_k} AS DOUBLE)
                             *(CAST(s AS DOUBLE)/CAST(n AS DOUBLE))
                             *(CAST(s AS DOUBLE)/CAST(n AS DOUBLE)))
                          /(CAST(q AS DOUBLE)
                            - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)
                              /CAST(n AS DOUBLE))
                     END, 6) AS r{_k}""")
    oracles["acf"] = f"""
        WITH q0 AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 abs(CAST(round(value*100) AS BIGINT)) AS v
          FROM events
        ), l AS (
          SELECT user_id, v,
                 lag(v, 1) OVER w AS g1,
                 lag(v, 2) OVER w AS g2,
                 lag(v, 3) OVER w AS g3
          FROM q0
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        ), a AS (
          SELECT user_id,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(v) AS BIGINT) AS s,
                 CAST(sum(v*v) AS BIGINT) AS q,
                 CAST(sum(v*g1) AS BIGINT) AS c1,
                 CAST(sum(CASE WHEN g1 IS NOT NULL THEN v END) AS BIGINT) AS tail1,
                 CAST(sum(g1) AS BIGINT) AS head1,
                 CAST(sum(v*g2) AS BIGINT) AS c2,
                 CAST(sum(CASE WHEN g2 IS NOT NULL THEN v END) AS BIGINT) AS tail2,
                 CAST(sum(g2) AS BIGINT) AS head2,
                 CAST(sum(v*g3) AS BIGINT) AS c3,
                 CAST(sum(CASE WHEN g3 IS NOT NULL THEN v END) AS BIGINT) AS tail3,
                 CAST(sum(g3) AS BIGINT) AS head3
          FROM l GROUP BY user_id
        )
        SELECT user_id, n,
               {','.join(_acf_lags)}
        FROM a
    """
    oracles["hampel"] = """
        WITH q0 AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 abs(CAST(round(value*100) AS BIGINT)) AS v
          FROM events
        ), w0 AS (
          SELECT user_id, us, event_id, v,
                 list_sort(list(v) OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS arr
          FROM q0
        ), m AS (
          SELECT user_id, us, event_id, v, arr,
                 arr[CAST((len(arr)-1)//2 + 1 AS INT)]
                 + arr[CAST(len(arr)//2 + 1 AS INT)] AS med2
          FROM w0
        ), d AS (
          SELECT user_id, us, event_id, v, med2,
                 list_sort(list_transform(arr,
                   x -> abs(2*x - med2))) AS devs
          FROM m
        )
        SELECT user_id, us AS ts_us, event_id, v, med2,
               devs[CAST((len(devs)-1)//2 + 1 AS INT)]
               + devs[CAST(len(devs)//2 + 1 AS INT)] AS mad2d,
               2*abs(2*v - med2)
                 > 3*(devs[CAST((len(devs)-1)//2 + 1 AS INT)]
                      + devs[CAST(len(devs)//2 + 1 AS INT)])
                 AS is_outlier
        FROM d
    """
    # NOTE: a struct-accumulator list_reduce would be the natural
    # replay of the Holt fold, but DuckDB 1.0 mis-evaluates lambdas
    # whose struct output references several accumulator fields in
    # one expression (verified with a minimal probe) — so the oracle
    # unrolls the recursion as a recursive CTE instead, stepping one
    # time-ordered row per iteration with the identical float ops.
    oracles["holt_forecast"] = """
        WITH RECURSIVE q0 AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 CAST(abs(CAST(round(value*100) AS BIGINT)) AS DOUBLE)
                   AS v
          FROM events
        ), ser AS (
          SELECT user_id, v,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY us, event_id) AS i,
                 count(*) OVER (PARTITION BY user_id) AS n
          FROM q0
        ), rec AS (
          SELECT user_id, i, n, v AS l, CAST(0.0 AS DOUBLE) AS b
          FROM ser WHERE i = 1
          UNION ALL
          SELECT s.user_id, s.i, s.n,
                 CAST(0.5 AS DOUBLE)*s.v
                   + CAST(0.5 AS DOUBLE)*(r.l + r.b) AS l,
                 CAST(0.5 AS DOUBLE)
                   *((CAST(0.5 AS DOUBLE)*s.v
                      + CAST(0.5 AS DOUBLE)*(r.l + r.b)) - r.l)
                   + CAST(0.5 AS DOUBLE)*r.b AS b
          FROM rec r
          JOIN ser s ON s.user_id = r.user_id AND s.i = r.i + 1
        )
        SELECT user_id, CAST(n AS BIGINT) AS n, round(l, 6) AS level,
               round(b, 6) AS trend,
               round(l + b, 6) AS forecast_1
        FROM rec WHERE i = n
    """
    oracles["ndcg"] = """
        WITH q0 AS (
          SELECT user_id, event_id,
                 abs(CAST(round(value*100) AS BIGINT)) AS cents
          FROM events
        ), b AS (
          SELECT user_id, event_id,
                 ((cents // 11) % 4) AS rel,
                 ((cents // 11) % 4) * 50 + (cents % 45) AS sa
          FROM q0
        ), r AS (
          SELECT user_id, event_id,
                 (CAST(1 AS BIGINT) << CAST(rel AS INT)) - 1 AS gain,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY sa DESC, event_id)
                   AS rk_sys,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY rel DESC, event_id)
                   AS rk_ideal
          FROM b
        ), g AS (
          SELECT user_id,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 list_sort(list({'rk': rk_sys, 'g': gain})
                           FILTER (WHERE rk_sys <= 10)) AS sys_t,
                 list_sort(list({'rk': rk_ideal, 'g': gain})
                           FILTER (WHERE rk_ideal <= 10)) AS ide_t
          FROM r GROUP BY user_id
        ), f AS (
          SELECT user_id, n_docs,
                 list_reduce(list_prepend(0.0, list_transform(sys_t,
                   s -> CAST(s.g AS DOUBLE)
                        / (ln(CAST(s.rk AS DOUBLE) + 1.0) / ln(2.0)))),
                   (acc, t) -> acc + t) AS dcg,
                 list_reduce(list_prepend(0.0, list_transform(ide_t,
                   s -> CAST(s.g AS DOUBLE)
                        / (ln(CAST(s.rk AS DOUBLE) + 1.0) / ln(2.0)))),
                   (acc, t) -> acc + t) AS idcg
          FROM g
        )
        SELECT user_id, n_docs, round(dcg, 6) AS dcg,
               round(idcg, 6) AS idcg,
               round(CASE WHEN idcg > 0 THEN dcg / idcg END, 6)
                 AS ndcg
        FROM f
    """
    oracles["pairwise_pref"] = """
        WITH q0 AS (
          SELECT user_id, event_id,
                 abs(CAST(round(value*100) AS BIGINT)) AS cents
          FROM events
        ), b AS (
          SELECT user_id, event_id,
                 ((cents // 11) % 4) AS rel,
                 ((cents // 11) % 4) * 50 + (cents % 45) AS sa,
                 (cents % 97) AS sb
          FROM q0
        )
        SELECT i.user_id,
               CAST(COUNT(*) AS BIGINT) AS n_pref_pairs,
               CAST(SUM(CASE WHEN i.sa > j.sa THEN 1 ELSE 0 END)
                    AS BIGINT) AS a_correct,
               CAST(SUM(CASE WHEN i.sa = j.sa THEN 1 ELSE 0 END)
                    AS BIGINT) AS a_tied,
               CAST(SUM(CASE WHEN i.sb > j.sb THEN 1 ELSE 0 END)
                    AS BIGINT) AS b_correct,
               CAST(SUM(CASE WHEN i.sb = j.sb THEN 1 ELSE 0 END)
                    AS BIGINT) AS b_tied,
               CAST(SUM(CASE WHEN i.sa > j.sa AND i.sb > j.sb
                             THEN 1 ELSE 0 END) AS BIGINT)
                 AS both_correct
        FROM b i JOIN b j
          ON i.user_id = j.user_id AND i.rel > j.rel
        GROUP BY i.user_id
    """
    oracles["dup_spans"] = """
        WITH pos AS (
          SELECT doc_id, text,
                 CAST(unnest(range(1, length(text) - 20 + 2)) AS BIGINT)
                   AS p
          FROM documents WHERE length(text) >= 20
        ), grams AS (
          SELECT doc_id, p, substr(text, CAST(p AS INT), 20) AS g
          FROM pos
        ), gdf AS (
          SELECT g, count(DISTINCT doc_id) AS df FROM grams GROUP BY g
        ), flg AS (
          SELECT doc_id, p, (df >= 2) AS dup
          FROM grams JOIN gdf USING (g)
        ), tot AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                 CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT)
                   AS dup_grams
          FROM flg GROUP BY doc_id
        ), runs AS (
          SELECT doc_id,
                 p - row_number() OVER (PARTITION BY doc_id ORDER BY p)
                   AS grp
          FROM flg WHERE dup
        ), runlen AS (
          SELECT doc_id, CAST(max(rl) AS BIGINT) AS longest_run
          FROM (SELECT doc_id, grp, count(*) AS rl
                FROM runs GROUP BY doc_id, grp)
          GROUP BY doc_id
        )
        SELECT t.doc_id, n_grams, dup_grams,
               round(CAST(dup_grams AS DOUBLE)
                     / CAST(n_grams AS DOUBLE), 6) AS dup_ratio,
               COALESCE(longest_run, 0) AS longest_run,
               CASE WHEN longest_run IS NULL THEN 0
                    ELSE longest_run + 20 - 1 END AS longest_span_chars
        FROM tot t LEFT JOIN runlen USING (doc_id)
    """
    from hiselspark.operators.seqtest import sprt_constants
    _l1, _l0, _a, _b = sprt_constants(0.15, 0.25, 0.05, 0.2)
    oracles["sprt"] = f"""
        WITH s AS (
          SELECT user_id,
                 CAST(row_number() OVER w AS BIGINT) AS n,
                 CAST(sum(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) OVER
                      (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS BIGINT) AS npos
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), c AS (
          SELECT user_id, n, npos,
                 CAST(npos AS DOUBLE) * CAST({_l1!r} AS DOUBLE)
                 + CAST(n - npos AS DOUBLE) * CAST({_l0!r} AS DOUBLE)
                   AS llr
          FROM s
        ), x AS (
          SELECT user_id, n, npos, llr,
                 CASE WHEN llr >= CAST({_a!r} AS DOUBLE) THEN 1
                      WHEN llr <= CAST({_b!r} AS DOUBLE) THEN 2
                      ELSE 0 END AS xing
          FROM c
        ), agg AS (
          SELECT user_id, CAST(max(n) AS BIGINT) AS n_total,
                 CAST(max(npos) AS BIGINT) AS n_pos,
                 min(CASE WHEN xing > 0 THEN n END) AS nd
          FROM x GROUP BY user_id
        )
        SELECT a.user_id, a.n_total, a.n_pos,
               CASE WHEN d.xing = 1 THEN 'h1'
                    WHEN d.xing = 2 THEN 'h0'
                    ELSE 'continue' END AS decision,
               CAST(d.n AS BIGINT) AS n_decide,
               round(d.llr, 6) AS llr_decide,
               round(f.llr, 6) AS llr_final
        FROM agg a
        LEFT JOIN x d ON d.user_id = a.user_id AND d.n = a.nd
        JOIN x f ON f.user_id = a.user_id AND f.n = a.n_total
    """
    oracles["mann_whitney"] = """
        WITH b AS (
          SELECT CAST(abs(round(value * 100)) AS BIGINT) AS v,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                   AS a
          FROM events WHERE event_type IN ('purchase', 'view')
        ), per_v AS (
          SELECT v, CAST(count(*) AS BIGINT) AS t,
                 CAST(sum(a) AS BIGINT) AS ta
          FROM b GROUP BY v
        ), ranked AS (
          SELECT v, t, ta,
                 2 * (COALESCE(sum(t) OVER
                        (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) + 1) + t - 1 AS r2
          FROM per_v
        ), s AS (
          SELECT CAST(sum(ta) AS BIGINT) AS n1,
                 CAST(sum(t - ta) AS BIGINT) AS n2,
                 CAST(sum(ta * r2) AS BIGINT) AS r1d,
                 CAST(sum(t * t * t - t) AS BIGINT) AS tc
          FROM ranked
        ), e AS (
          SELECT n1, n2, r1d - n1 * (n1 + 1) AS u2,
                 (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
                 * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                    - CAST(tc AS DOUBLE)
                      / (CAST(n1 + n2 AS DOUBLE)
                         * (CAST(n1 + n2 AS DOUBLE) - 1.0))) AS var
          FROM s
        ), zz AS (
          SELECT n1, n2, u2,
                 CASE WHEN var > 0 THEN
                   (CAST(u2 - n1 * n2 AS DOUBLE) / 2.0) / sqrt(var)
                 END AS z
          FROM e
        ), w AS (
          SELECT n1, n2, u2, z,
                 abs(z) / sqrt(2.0) AS x,
                 1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
          FROM zz
        )
        SELECT n1, n2, CAST(u2 AS DOUBLE) / 2.0 AS u,
               round(z, 6) AS z,
               round((t * (0.254829592
                     + t * (-0.284496736
                     + t * (1.421413741
                     + t * (-1.453152027 + t * 1.061405429)))))
                     * exp(-(x * x)), 9) AS p_value,
               round(CAST(u2 - n1 * n2 AS DOUBLE)
                     / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6)
                 AS cliffs_delta
        FROM w
    """
    oracles["c4_rules"] = """
        WITH d AS (
          SELECT doc_id,
                 replace(text, ' table ', '.' || chr(10))
                 || CASE WHEN doc_id % 7 = 0 THEN ' lorem ipsum.'
                         WHEN doc_id % 7 = 1 THEN ' { config }'
                         ELSE '' END
                 || CASE WHEN doc_id % 31 = 2
                         THEN chr(10) || 'javascript ad code here'
                         ELSE '' END AS t
          FROM documents
        ), l AS (
          SELECT doc_id, t,
                 list_filter(
                   list_transform(str_split(t, chr(10)),
                                  x -> trim(x)),
                   x -> length(x) > 0) AS lines
          FROM d
        ), k AS (
          SELECT doc_id, t, lines,
                 list_filter(lines,
                   x -> regexp_matches(x, '[.!?"]$')
                        AND len(list_filter(
                              str_split_regex(x, '\\s+'),
                              w -> length(w) > 0)) >= 5) AS kept
          FROM l
        ), c AS (
          SELECT doc_id,
                 CAST(len(lines) AS BIGINT) AS n_lines,
                 CAST(len(kept) AS BIGINT) AS n_kept_lines,
                 CAST(length(t) - length(regexp_replace(
                        t, '[.!?]', '', 'g')) AS BIGINT)
                   AS n_sentences,
                 CAST(len(list_filter(lines,
                        x -> contains(lower(x), 'javascript')))
                      AS BIGINT) AS n_js_lines,
                 CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(kept,
                          x -> CAST(length(x) AS BIGINT))),
                        (a, b) -> a + b) AS BIGINT) AS kept_chars,
                 CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(lines,
                          x -> CAST(length(x) AS BIGINT))),
                        (a, b) -> a + b) AS BIGINT)
                   AS total_line_chars,
                 contains(lower(t), 'lorem ipsum') AS has_lorem,
                 contains(t, '{') AS has_brace
          FROM k
        )
        SELECT doc_id, n_lines, n_kept_lines, n_sentences,
               n_js_lines, kept_chars, total_line_chars, has_lorem,
               has_brace,
               round(CASE WHEN total_line_chars > 0 THEN
                 CAST(kept_chars AS DOUBLE)
                 / CAST(total_line_chars AS DOUBLE) END, 6)
                 AS kept_ratio,
               (n_sentences >= 3 AND NOT has_lorem AND NOT has_brace
                AND n_kept_lines >= 1) AS c4_pass
        FROM c
    """

    def _blur_g(dy: int, dx: int) -> str:
        terms = " + ".join(
            f"((okey*7919 + ((y+{dy})*24 + (x+{dx})*3 + {c})"
            f" * ((okey % 16)*4)) % 256)"
            for c in range(3))
        return f"({terms})"

    _blur_resp = (f"4*{_blur_g(0, 0)} - {_blur_g(-1, 0)}"
                  f" - {_blur_g(1, 0)} - {_blur_g(0, -1)}"
                  f" - {_blur_g(0, 1)}")
    oracles["image_blur"] = f"""
        WITH r AS (
          SELECT o_orderkey AS okey, {_blur_resp} AS resp
          FROM orders,
               unnest(generate_series(1, 6)) AS ty(y),
               unnest(generate_series(1, 6)) AS tx(x)
        ), s AS (
          SELECT okey, CAST(count(*) AS BIGINT) AS lap_n,
                 CAST(sum(resp) AS BIGINT) AS lap_sum,
                 CAST(sum(resp * resp) AS BIGINT) AS lap_sumsq
          FROM r GROUP BY okey
        )
        SELECT okey, lap_n, lap_sum, lap_sumsq,
               round(CAST(lap_n * lap_sumsq - lap_sum * lap_sum
                          AS DOUBLE)
                     / CAST(lap_n * lap_n AS DOUBLE), 6) AS lap_var,
               (lap_n * lap_sumsq - lap_sum * lap_sum
                < 200000 * lap_n * lap_n) AS is_blurry
        FROM s
    """
    _lpa_round = """
        , v{r} AS (
          SELECT e.src AS node, l.label, count(*) AS c
          FROM sym e JOIN l{p} l ON l.node = e.dst
          GROUP BY e.src, l.label
        ), l{r} AS (
          SELECT node, label FROM (
            SELECT node, label,
                   row_number() OVER (PARTITION BY node
                     ORDER BY c DESC, label ASC) AS rn
            FROM v{r}) WHERE rn = 1
        )"""
    oracles["label_prop"] = ("""
        WITH e0 AS (
          SELECT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst
          FROM lineitem
        ), sym AS (
          SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM e0
            UNION ALL SELECT dst AS src, src AS dst FROM e0)
          WHERE src <> dst
        ), l0 AS (
          SELECT DISTINCT src AS node, src AS label FROM sym
        )"""
        + "".join(_lpa_round.format(r=r, p=r - 1) for r in (1, 2, 3))
        + """
        SELECT node, label,
               CAST(count(*) OVER (PARTITION BY label) AS BIGINT)
                 AS community_size
        FROM l3
    """)
    oracles["ipw"] = """
        WITH b AS (
          SELECT CAST(hour(ts) AS BIGINT) AS b,
                 CASE WHEN hour(ts) = 0 THEN 1
                      WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS t,
                 CAST(abs(round(value * 100)) AS BIGINT) AS y
          FROM events
        ), per_b AS (
          SELECT b, CAST(count(*) AS BIGINT) AS n_b,
                 CAST(sum(t) AS BIGINT) AS nt,
                 CAST(sum(t * y) AS BIGINT) AS syt,
                 CAST(sum((1 - t) * y) AS BIGINT) AS syc
          FROM b GROUP BY b
        ), f AS (
          SELECT *, (nt > 0 AND nt < n_b) AS ok FROM per_b
        ), agg AS (
          SELECT CAST(sum(n_b) AS BIGINT) AS n,
                 CAST(count(*) AS BIGINT) AS n_strata,
                 CAST(sum(CASE WHEN ok THEN n_b ELSE 0 END)
                      AS BIGINT) AS n_used,
                 CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_used_strata,
                 list({'b': b, 'n_b': n_b, 'nt': nt,
                       'syt': syt, 'syc': syc} ORDER BY b)
                   FILTER (WHERE ok) AS cells
          FROM f
        )
        SELECT n, n_used, n_strata, n_used_strata,
               n - n_used AS n_dropped_rows,
               CASE WHEN n_used > 0 THEN
                 round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(cells, s ->
                     CAST(s.n_b AS DOUBLE)
                     * (CAST(s.syt AS DOUBLE) / CAST(s.nt AS DOUBLE)
                        - CAST(s.syc AS DOUBLE)
                          / CAST(s.n_b - s.nt AS DOUBLE)))),
                   (a, x) -> a + x)
                   / CAST(n_used AS DOUBLE), 6)
               END AS ate_strat,
               CASE WHEN n_used > 0 THEN
                 round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(cells, s ->
                     CAST(s.syt AS DOUBLE) * CAST(s.n_b AS DOUBLE)
                     / CAST(s.nt AS DOUBLE)
                     - CAST(s.syc AS DOUBLE) * CAST(s.n_b AS DOUBLE)
                       / CAST(s.n_b - s.nt AS DOUBLE))),
                   (a, x) -> a + x)
                   / CAST(n_used AS DOUBLE), 6)
               END AS ate_ipw
        FROM agg
    """
    oracles["scene_cuts"] = """
        WITH tr AS (
          SELECT okey, f, CAST(sum(d) AS BIGINT) AS sad FROM (
            SELECT o_orderkey AS okey, f, j,
                   abs(((o_orderkey * 131
                        + (f // (2 + (o_orderkey // 4) % 2)) * 347
                        + j * 7) % 256)
                     - ((o_orderkey * 131
                        + ((f - 1) // (2 + (o_orderkey // 4) % 2))
                          * 347
                        + j * 7) % 256)) AS d
            FROM orders,
                 unnest(generate_series(1, 5)) AS tf(f),
                 unnest(generate_series(0, 47)) AS tj(j)
            WHERE o_orderkey % 4 = 0
          ) GROUP BY okey, f
        ), cut AS (
          SELECT okey, f, sad, (sad > 8 * 48) AS iscut FROM tr
        ), grid AS (
          SELECT okey, f
          FROM (SELECT DISTINCT okey FROM cut),
               unnest(generate_series(0, 5)) AS t(f)
        ), scn AS (
          SELECT g.okey, g.f,
                 sum(CASE WHEN COALESCE(c.iscut, FALSE)
                          THEN 1 ELSE 0 END)
                   OVER (PARTITION BY g.okey ORDER BY g.f
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS scene_idx
          FROM grid g LEFT JOIN cut c
            ON c.okey = g.okey AND c.f = g.f
        ), per_scene AS (
          SELECT okey, scene_idx, CAST(count(*) AS BIGINT) AS len
          FROM scn GROUP BY okey, scene_idx
        ), summ AS (
          SELECT okey, CAST(count(*) AS BIGINT) AS n_scenes,
                 CAST(max(len) AS BIGINT) AS longest_scene
          FROM per_scene GROUP BY okey
        ), cutagg AS (
          SELECT okey,
                 CAST(sum(CASE WHEN iscut THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_cuts,
                 CAST(min(CASE WHEN iscut THEN f END) AS BIGINT)
                   AS first_cut,
                 CAST(sum(sad) AS BIGINT) AS sad_total
          FROM cut GROUP BY okey
        )
        SELECT c.okey, CAST(6 AS BIGINT) AS n_frames, c.n_cuts,
               s.n_scenes, s.longest_scene, c.first_cut, c.sad_total
        FROM cutagg c JOIN summ s ON s.okey = c.okey
    """
    _bpe_round = """
        , p{r} AS MATERIALIZED (
          SELECT pr.lhs AS lhs, pr.rhs AS rhs,
                 CAST(sum(w) AS BIGINT) AS cnt
          FROM (
            SELECT w,
                   unnest(list_transform(
                     generate_series(1, len(t) - 1),
                     i -> {{'lhs': t[i], 'rhs': t[i + 1]}})) AS pr
            FROM (SELECT w, str_split(trim(seq), '  ') AS t
                  FROM c{p})
            WHERE len(t) >= 2
          ) GROUP BY pr.lhs, pr.rhs
        ), m{r} AS MATERIALIZED (
          SELECT lhs, rhs, cnt FROM p{r}
          ORDER BY cnt DESC, lhs ASC, rhs ASC LIMIT 1
        ), c{r} AS MATERIALIZED (
          SELECT c.w,
                 replace(c.seq, ' ' || m.lhs || '  ' || m.rhs || ' ',
                         ' ' || m.lhs || m.rhs || ' ') AS seq
          FROM c{p} c, m{r} m
        )"""
    oracles["bpe_train"] = ("""
        WITH v AS MATERIALIZED (
          SELECT word, CAST(count(*) AS BIGINT) AS w FROM (
            SELECT unnest(list_filter(
                     str_split_regex(trim(text), '\\s+'),
                     x -> length(x) > 0)) AS word
            FROM documents)
          GROUP BY word
        ), c0 AS MATERIALIZED (
          SELECT w, regexp_replace(word, '(.)', ' \\1 ', 'g') AS seq
          FROM v
        )"""
        + "".join(_bpe_round.format(r=r, p=r - 1)
                  for r in (1, 2, 3, 4, 5, 6))
        + """
        """
        + " UNION ALL ".join(
            f"SELECT CAST({r} AS BIGINT) AS step, lhs, rhs, "
            f"lhs || rhs AS token, cnt AS pair_count FROM m{r}"
            for r in (1, 2, 3, 4, 5, 6)))
    oracles["robust_scale"] = """
        WITH longt AS (
          SELECT event_id AS id, 'cents' AS feat,
                 CAST(abs(round(value * 100)) AS BIGINT) AS v
          FROM events
          UNION ALL
          SELECT event_id, 'h', CAST(hour(ts) AS BIGINT) FROM events
          UNION ALL
          SELECT event_id, 'em', CAST(event_id % 50 AS BIGINT)
          FROM events
        ), pv AS (
          SELECT feat, v, CAST(count(*) AS BIGINT) AS t
          FROM longt WHERE v IS NOT NULL GROUP BY feat, v
        ), c1 AS (
          SELECT feat, v, t,
                 sum(t) OVER (PARTITION BY feat ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
                 sum(t) OVER (PARTITION BY feat) AS n
          FROM pv
        ), lo1 AS (
          SELECT feat, min(v) AS lo FROM c1
          WHERE cum >= n - n // 2 GROUP BY feat
        ), hi1 AS (
          SELECT feat, min(v) AS hi FROM c1
          WHERE cum >= n // 2 + 1 GROUP BY feat
        ), med AS (
          SELECT feat, lo + hi AS m2 FROM lo1 JOIN hi1 USING (feat)
        ), dv AS (
          SELECT feat, d, CAST(sum(t) AS BIGINT) AS t FROM (
            SELECT p.feat, abs(2 * p.v - m.m2) AS d, p.t
            FROM pv p JOIN med m USING (feat))
          GROUP BY feat, d
        ), c2 AS (
          SELECT feat, d, t,
                 sum(t) OVER (PARTITION BY feat ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
                 sum(t) OVER (PARTITION BY feat) AS n
          FROM dv
        ), lo2 AS (
          SELECT feat, min(d) AS lo FROM c2
          WHERE cum >= n - n // 2 GROUP BY feat
        ), hi2 AS (
          SELECT feat, min(d) AS hi FROM c2
          WHERE cum >= n // 2 + 1 GROUP BY feat
        ), mad AS (
          SELECT feat, lo + hi AS mad2d
          FROM lo2 JOIN hi2 USING (feat)
        ), stats AS (
          SELECT feat, m2, mad2d FROM med JOIN mad USING (feat)
        )
        SELECT l.id AS event_id, l.feat AS feature, l.v,
               s.m2, s.mad2d,
               round(CASE WHEN l.v IS NOT NULL AND s.mad2d > 0 THEN
                 2.0 * CAST(2 * l.v - s.m2 AS DOUBLE)
                 / (1.4826 * CAST(s.mad2d AS DOUBLE)) END, 6) AS rz
        FROM longt l JOIN stats s USING (feat)
    """
    oracles["mrr"] = """
        WITH b AS (
          SELECT user_id AS q, event_id,
                 CASE WHEN (CAST(abs(round(value * 100)) AS BIGINT)
                            // 11) % 17 = 0
                      THEN 1 ELSE 0 END AS rel,
                 CAST(abs(round(value * 100)) AS BIGINT) % 97 AS s
          FROM events
        ), r AS (
          SELECT q, rel,
                 CAST(row_number() OVER (PARTITION BY q
                   ORDER BY s DESC, event_id ASC) AS BIGINT) AS rk
          FROM b
        ), a AS (
          SELECT q AS user_id, CAST(count(*) AS BIGINT) AS n_docs,
                 min(CASE WHEN rel > 0 AND rk <= 10 THEN rk END)
                   AS first_rel_rank
          FROM r GROUP BY q
        )
        SELECT user_id, n_docs, first_rel_rank,
               round(CASE WHEN first_rel_rank IS NOT NULL THEN
                 1.0 / CAST(first_rel_rank AS DOUBLE)
                 ELSE 0.0 END, 6) AS rr,
               (first_rel_rank IS NOT NULL) AS hit
        FROM a
    """
    oracles["matched_pairs"] = """
        WITH b AS (
          SELECT CAST(hour(ts) AS BIGINT) AS b,
                 CASE WHEN hour(ts) = 0 THEN 1
                      WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS t,
                 CAST(abs(round(value * 100)) AS BIGINT) AS y,
                 event_id AS o
          FROM events
        ), r AS (
          SELECT b, t, y,
                 row_number() OVER (PARTITION BY b, t ORDER BY o)
                   AS rk
          FROM b
        ), t1 AS (
          SELECT b, rk, y AS yt FROM r WHERE t = 1
        ), t0 AS (
          SELECT b, rk, y AS yc FROM r WHERE t = 0
        ), j AS (
          SELECT yt, yc FROM t1
          FULL JOIN t0 ON t1.b = t0.b AND t1.rk = t0.rk
        ), s AS (
          SELECT CAST(sum(CASE WHEN yt IS NOT NULL
                               AND yc IS NOT NULL
                               THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_pairs,
                 CAST(sum(CASE WHEN yt IS NOT NULL AND yc IS NULL
                               THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_unmatched_treated,
                 CAST(sum(CASE WHEN yc IS NOT NULL AND yt IS NULL
                               THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_unmatched_control,
                 CAST(sum(CASE WHEN yt IS NOT NULL
                               AND yc IS NOT NULL
                               THEN yt - yc ELSE 0 END) AS BIGINT)
                   AS sum_diff_cents
          FROM j
        )
        SELECT n_pairs, n_unmatched_treated, n_unmatched_control,
               sum_diff_cents,
               CASE WHEN n_pairs > 0 THEN
                 round(CAST(sum_diff_cents AS DOUBLE)
                       / CAST(n_pairs AS DOUBLE), 6) END AS att
        FROM s
    """
    oracles["log_odds"] = """
        WITH b AS (
          SELECT CASE WHEN length(source) = 4 THEN 1 ELSE 0 END
                   AS fa,
                 unnest(list_filter(
                   str_split_regex(trim(text), '\\s+'),
                   x -> length(x) > 0)) AS word
          FROM documents
        ), per_w AS (
          SELECT word, CAST(sum(fa) AS BIGINT) AS ca,
                 CAST(sum(1 - fa) AS BIGINT) AS cb
          FROM b GROUP BY word
        ), tot AS (
          SELECT CAST(sum(ca) AS BIGINT) AS na,
                 CAST(sum(cb) AS BIGINT) AS nb,
                 CAST(sum(ca + cb) AS BIGINT) AS nn
          FROM per_w
        ), e AS (
          SELECT word, ca, cb,
                 100.0 * CAST(ca + cb AS DOUBLE)
                   / CAST(nn AS DOUBLE) AS aw,
                 CAST(ca AS DOUBLE) AS cad, CAST(cb AS DOUBLE) AS cbd,
                 CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd
          FROM per_w, tot WHERE ca + cb >= 5
        )
        SELECT word, ca, cb,
               round(ln((cad + aw) / (nad + 100.0 - cad - aw))
                     - ln((cbd + aw) / (nbd + 100.0 - cbd - aw)), 6)
                 AS delta,
               round((ln((cad + aw) / (nad + 100.0 - cad - aw))
                      - ln((cbd + aw) / (nbd + 100.0 - cbd - aw)))
                     / sqrt(1.0 / (cad + aw) + 1.0 / (cbd + aw)), 6)
                 AS z
        FROM e
    """
    oracles["quantile_normalize"] = """
        WITH longt AS (
          SELECT event_id AS id, 'cents' AS feat,
                 CAST(abs(round(value * 100)) AS BIGINT) AS v
          FROM events
          UNION ALL
          SELECT event_id, 'h', CAST(hour(ts) AS BIGINT) FROM events
          UNION ALL
          SELECT event_id, 'em', CAST(event_id % 50 AS BIGINT)
          FROM events
        ), ranked AS (
          SELECT id, feat, v,
                 CAST(row_number() OVER (PARTITION BY feat
                   ORDER BY v, id) AS BIGINT) AS pos
          FROM longt
        ), per_pos AS (
          SELECT pos, CAST(sum(v) AS BIGINT) AS sv,
                 CAST(count(*) AS BIGINT) AS kk
          FROM ranked GROUP BY pos
        )
        SELECT r.id AS event_id, r.feat AS feature, r.v, r.pos,
               round(CAST(p.sv AS DOUBLE) / CAST(p.kk AS DOUBLE), 6)
                 AS qn
        FROM ranked r JOIN per_pos p USING (pos)
    """
    oracles["iv_wald"] = """
        WITH d AS (
          SELECT CAST(event_id % 2 AS BIGINT) AS z,
                 CAST(json_extract_string(props, '$.k') AS BIGINT)
                   + 10 * CAST(event_id % 2 AS BIGINT) AS x,
                 CAST(round(value*100) AS BIGINT) AS y
          FROM events
          WHERE event_id IS NOT NULL
            AND json_extract_string(props, '$.k') IS NOT NULL
            AND value IS NOT NULL
        ), s AS (
          SELECT CAST(sum(1-z) AS BIGINT) AS n0,
                 CAST(sum(z) AS BIGINT) AS n1,
                 CAST(sum((1-z)*x) AS BIGINT) AS sx0,
                 CAST(sum(z*x) AS BIGINT) AS sx1,
                 CAST(sum((1-z)*y) AS BIGINT) AS sy0,
                 CAST(sum(z*y) AS BIGINT) AS sy1
          FROM d
        ), m AS (
          SELECT *,
                 CASE WHEN n0 > 0 AND n1 > 0
                      THEN CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                           - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                 END AS itt,
                 CASE WHEN n0 > 0 AND n1 > 0
                      THEN CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                           - CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                 END AS fs
          FROM s
        )
        SELECT n0, n1, sx0, sx1, sy0, sy1,
               round(itt, 6) AS itt_y, round(fs, 6) AS first_stage,
               CASE WHEN fs <> 0.0 THEN round(itt / fs, 6) END AS late
        FROM m
    """
    oracles["e_value"] = """
        WITH d AS (
          SELECT CASE WHEN CAST(json_extract_string(props, '$.k')
                            AS BIGINT) >= 50
                      THEN 1 ELSE 0 END AS t,
                 CASE WHEN CAST(round(value*100) AS BIGINT) > 1000
                      THEN 1 ELSE 0 END AS y
          FROM events
          WHERE json_extract_string(props, '$.k') IS NOT NULL
            AND value IS NOT NULL
        ), s AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(t) AS BIGINT) AS n1,
                 CAST(sum(1-t) AS BIGINT) AS n0,
                 CAST(sum(t*y) AS BIGINT) AS n11,
                 CAST(sum((1-t)*y) AS BIGINT) AS n01
          FROM d
        ), m AS (
          SELECT *,
                 CAST(n11 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
                 CAST(n01 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0
          FROM s
        ), r AS (
          SELECT *,
                 CASE WHEN n1 > 0 AND n0 > 0 AND n01 > 0
                      THEN p1 / p0 END AS rr,
                 CASE WHEN n1 > 0 AND n0 > 0 AND n01 > 0 AND n11 > 0
                      THEN CASE WHEN p1 / p0 >= 1.0 THEN p1 / p0
                                ELSE p0 / p1 END
                 END AS rr_star
          FROM m
        )
        SELECT n, n1, n0, n11, n01, round(rr, 6) AS rr,
               round(rr_star + sqrt(rr_star * (rr_star - 1.0)), 6)
                 AS evalue
        FROM r
    """
    oracles["loo_encode"] = """
        WITH d AS (
          SELECT event_id, event_type AS category,
                 CAST(round(value*100) AS BIGINT) AS y
          FROM events
        ), g AS (
          SELECT category, CAST(count(*) AS BIGINT) AS n_g,
                 CAST(sum(y) AS BIGINT) AS s_g
          FROM d WHERE y IS NOT NULL GROUP BY category
        )
        SELECT d.event_id, d.category, d.y, g.n_g, g.s_g,
               CASE WHEN d.y IS NOT NULL AND g.n_g > 1
                    THEN round(CAST(g.s_g - d.y AS DOUBLE)
                               / CAST(g.n_g - 1 AS DOUBLE), 6)
               END AS loo
        FROM d LEFT JOIN g ON d.category = g.category
    """
    oracles["theils_u"] = f"""
        WITH d AS (
          SELECT 1 AS g,
                 CAST(CAST(json_extract_string(props, '$.k')
                           AS BIGINT) % 12 AS BIGINT) AS x,
                 CAST(CAST(json_extract_string(props, '$.k')
                           AS BIGINT) % 8 AS BIGINT) AS y
          FROM events
          WHERE json_extract_string(props, '$.k') IS NOT NULL
        ), {_mi_sql_ctes("mi_t", "d", ["g"])}, hx_cells AS (
          SELECT x, CAST(count(*) AS BIGINT) AS cx FROM d GROUP BY x
        ), hx_g AS (
          SELECT CAST(sum(cx) AS BIGINT) AS n2,
                 list_sort(list({{'x': x, 'cx': cx}})) AS cl
          FROM hx_cells
        ), hx AS (
          SELECT n2,
                 list_reduce(list_prepend(0.0, list_transform(cl, s ->
                   (CAST(s.cx AS DOUBLE) / CAST(n2 AS DOUBLE))
                   * ln(CAST(n2 AS DOUBLE) / CAST(s.cx AS DOUBLE)))),
                   (acc, t) -> acc + t) AS h_x
          FROM hx_g
        )
        SELECT mi_t.n, round(hx.h_x, 6) AS h_x,
               round(mi_t.mi, 6) AS mi,
               CASE WHEN hx.h_x > 0.0
                    THEN round(mi_t.mi / hx.h_x, 6) END AS u
        FROM mi_t, hx
    """
    oracles["friedman"] = """
        WITH d AS (
          SELECT CAST(event_id // 4 AS BIGINT) AS s,
                 CAST(event_id % 4 AS BIGINT) AS t,
                 CAST(round(value*100) AS BIGINT) AS v
          FROM events
          WHERE event_id IS NOT NULL AND value IS NOT NULL
        ), kk AS (
          SELECT CAST(count(DISTINCT t) AS BIGINT) AS k FROM d
        ), per_s AS (
          SELECT s, count(DISTINCT t) AS n_t, count(*) AS n_rows
          FROM d GROUP BY s
        ), keep AS (
          SELECT s FROM per_s, kk
          WHERE n_t = kk.k AND n_rows = kk.k
        ), dropped AS (
          SELECT CAST(count(*) AS BIGINT) AS n_dropped
          FROM per_s, kk
          WHERE NOT (n_t = kk.k AND n_rows = kk.k)
        ), ranked AS (
          SELECT d.s, d.t,
                 2 * count(*) OVER (PARTITION BY d.s ORDER BY v
                     RANGE BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING)
                 + count(*) OVER (PARTITION BY d.s ORDER BY v
                     RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
                 + 1 AS r2
          FROM d JOIN keep USING (s)
        ), tot AS (
          SELECT CAST(count(DISTINCT s) AS BIGINT) AS n_subjects,
                 CAST(sum(r2*r2) AS BIGINT) AS sum_r2sq
          FROM ranked
        ), per_t AS (
          SELECT t, CAST(sum(r2) AS BIGINT) AS rj2
          FROM ranked GROUP BY t
        ), num AS (
          SELECT list_reduce(list_prepend(0.0, list_transform(
                   list_sort(list({'g': t, 'v':
                     CAST(rj2 AS DOUBLE)
                     - CAST(n_subjects AS DOUBLE)
                       * CAST(k + 1 AS DOUBLE)})),
                   x -> x.v * x.v)),
                 (acc, u) -> acc + u) AS num4
          FROM per_t, tot, kk
        )
        SELECT kk.k, tot.n_subjects, dropped.n_dropped, tot.sum_r2sq,
               CASE WHEN CAST(tot.sum_r2sq AS DOUBLE)
                         - CAST(tot.n_subjects AS DOUBLE)
                           * CAST(kk.k AS DOUBLE)
                           * CAST(kk.k + 1 AS DOUBLE)
                           * CAST(kk.k + 1 AS DOUBLE) > 0.0
                    THEN round(CAST(kk.k - 1 AS DOUBLE) * num.num4
                         / (CAST(tot.sum_r2sq AS DOUBLE)
                            - CAST(tot.n_subjects AS DOUBLE)
                              * CAST(kk.k AS DOUBLE)
                              * CAST(kk.k + 1 AS DOUBLE)
                              * CAST(kk.k + 1 AS DOUBLE)), 6)
               END AS q_stat,
               CAST(kk.k - 1 AS BIGINT) AS df
        FROM kk, tot, dropped, num
    """
    oracles["page_trend"] = """
        WITH d AS (
          SELECT CAST(event_id // 4 AS BIGINT) AS s,
                 CAST(event_id % 4 AS BIGINT) AS t,
                 CAST(round(value*100) AS BIGINT) AS v
          FROM events
          WHERE event_id IS NOT NULL AND value IS NOT NULL
        ), kk AS (
          SELECT CAST(count(DISTINCT t) AS BIGINT) AS k FROM d
        ), per_s AS (
          SELECT s, count(DISTINCT t) AS n_t, count(*) AS n_rows
          FROM d GROUP BY s
        ), keep AS (
          SELECT s FROM per_s, kk
          WHERE n_t = kk.k AND n_rows = kk.k
        ), dropped AS (
          SELECT CAST(count(*) AS BIGINT) AS n_dropped
          FROM per_s, kk
          WHERE NOT (n_t = kk.k AND n_rows = kk.k)
        ), ranked AS (
          SELECT d.s, d.t,
                 2 * count(*) OVER (PARTITION BY d.s ORDER BY v
                     RANGE BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING)
                 + count(*) OVER (PARTITION BY d.s ORDER BY v
                     RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
                 + 1 AS r2
          FROM d JOIN keep USING (s)
        ), tot AS (
          SELECT CAST(count(DISTINCT s) AS BIGINT) AS n_subjects
          FROM ranked
        ), per_t AS (
          SELECT t, CAST(sum(r2) AS BIGINT) AS rj2,
                 CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS j
          FROM ranked GROUP BY t
        ), ll AS (
          SELECT CAST(sum(j * rj2) AS BIGINT) AS l2 FROM per_t
        ), m AS (
          SELECT kk.k, tot.n_subjects, dropped.n_dropped,
                 CAST(ll.l2 AS DOUBLE) / 2.0 AS l_stat,
                 CAST(tot.n_subjects AS DOUBLE) * CAST(kk.k AS DOUBLE)
                   * CAST(kk.k + 1 AS DOUBLE)
                   * CAST(kk.k + 1 AS DOUBLE) / 4.0 AS mu_l,
                 CAST(tot.n_subjects AS DOUBLE) * CAST(kk.k AS DOUBLE)
                   * CAST(kk.k AS DOUBLE) * CAST(kk.k + 1 AS DOUBLE)
                   * (CAST(kk.k AS DOUBLE) * CAST(kk.k AS DOUBLE)
                      - 1.0) / 144.0 AS var_l
          FROM kk, tot, dropped, ll
        )
        SELECT k, n_subjects, n_dropped, round(l_stat, 6) AS l_stat,
               round(mu_l, 6) AS mu_l,
               CASE WHEN var_l > 0.0
                    THEN round(sqrt(var_l), 6) END AS sigma_l,
               CASE WHEN var_l > 0.0
                    THEN round((l_stat - mu_l) / sqrt(var_l), 6)
               END AS z
        FROM m
    """
    oracles["cohens_d"] = """
        WITH d AS (
          SELECT CASE WHEN CAST(json_extract_string(props, '$.k')
                            AS BIGINT) >= 50
                      THEN 1 ELSE 0 END AS f,
                 CAST(round(value*100) AS BIGINT) AS v
          FROM events
          WHERE json_extract_string(props, '$.k') IS NOT NULL
            AND value IS NOT NULL
        ), s AS (
          SELECT CAST(sum(f) AS BIGINT) AS n1,
                 CAST(sum(1-f) AS BIGINT) AS n0,
                 CAST(sum(f*v) AS BIGINT) AS s1,
                 CAST(sum((1-f)*v) AS BIGINT) AS s0,
                 CAST(sum(f*v*v) AS BIGINT) AS ss1,
                 CAST(sum((1-f)*v*v) AS BIGINT) AS ss0
          FROM d
        ), m AS (
          SELECT *,
                 CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
                 CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS m0,
                 (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE)
                    * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                  + CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE)
                    * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                 / (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE) - 2.0)
                   AS vp
          FROM s
        ), r AS (
          SELECT *,
                 CASE WHEN n1 >= 2 AND n0 >= 2 AND vp > 0.0
                      THEN (m1 - m0) / sqrt(vp) END AS cd
          FROM m
        )
        SELECT n1, n0,
               CASE WHEN n1 > 0 THEN round(m1, 6) END AS mean1,
               CASE WHEN n0 > 0 THEN round(m0, 6) END AS mean0,
               CASE WHEN n1 >= 2 AND n0 >= 2
                    THEN round(vp, 6) END AS var_pooled,
               round(cd, 6) AS cohens_d,
               round(cd * (1.0 - 3.0
                     / (4.0 * (CAST(n1 AS DOUBLE)
                               + CAST(n0 AS DOUBLE)) - 9.0)), 6)
                 AS hedges_g
        FROM r
    """
    oracles["somers_d"] = """
        WITH base AS (
          SELECT x, CAST((x * 3 + (c // 7) % 10) % 30 AS BIGINT) AS y
          FROM (
            SELECT CAST(abs(CAST(round(value*100) AS BIGINT)) % 25
                        AS BIGINT) AS x,
                   abs(CAST(round(value*100) AS BIGINT)) AS c
            FROM events
          )
        ), cells AS (
          SELECT x, y, CAST(count(*) AS BIGINT) AS c
          FROM base GROUP BY x, y
        ), prods AS (
          SELECT a.c * b.c AS p,
                 CASE WHEN a.y < b.y THEN 1
                      WHEN a.y > b.y THEN -1 ELSE 0 END AS sgn
          FROM cells a JOIN cells b ON a.x < b.x
        ), cd AS (
          SELECT CAST(coalesce(sum(CASE WHEN sgn = 1 THEN p END), 0)
                      AS BIGINT) AS conc,
                 CAST(coalesce(sum(CASE WHEN sgn = -1 THEN p END), 0)
                      AS BIGINT) AS disc
          FROM prods
        ), tx AS (
          SELECT CAST(sum(t*(t-1)) AS BIGINT) AS tx2,
                 CAST(sum(t) AS BIGINT) AS n
          FROM (SELECT sum(c) AS t FROM cells GROUP BY x)
        ), ty AS (
          SELECT CAST(sum(t*(t-1)) AS BIGINT) AS ty2
          FROM (SELECT sum(c) AS t FROM cells GROUP BY y)
        )
        SELECT tx.n, cd.conc AS concordant, cd.disc AS discordant,
               CASE WHEN tx.n * (tx.n - 1) > tx.tx2
                    THEN round(2.0 * CAST(cd.conc - cd.disc AS DOUBLE)
                         / CAST(tx.n * (tx.n - 1) - tx.tx2 AS DOUBLE),
                         6) END AS d_yx,
               CASE WHEN tx.n * (tx.n - 1) > ty.ty2
                    THEN round(2.0 * CAST(cd.conc - cd.disc AS DOUBLE)
                         / CAST(tx.n * (tx.n - 1) - ty.ty2 AS DOUBLE),
                         6) END AS d_xy
        FROM cd, tx, ty
    """
    oracles["hellinger_drift"] = """
        WITH q AS (
          SELECT event_type,
                 least(CAST(round(value*100) AS BIGINT) // 200, 24)
                   AS bucket,
                 CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                      THEN 1 ELSE 0 END AS is_ref
          FROM events
        ), pb AS (
          SELECT event_type, bucket,
                 SUM(is_ref) AS cr, SUM(1 - is_ref) AS cc
          FROM q GROUP BY event_type, bucket
        ), pk AS (
          SELECT event_type,
                 CAST(SUM(cr) AS BIGINT) AS n_ref,
                 CAST(SUM(cc) AS BIGINT) AS n_cur,
                 list_sort(list({'b': bucket, 'cr': cr, 'cc': cc}))
                   AS bl
          FROM pb GROUP BY event_type
        ), h AS (
          SELECT event_type, n_ref, n_cur,
                 CASE WHEN n_ref > 0 AND n_cur > 0 THEN
                   list_reduce(list_prepend(0.0,
                     list_transform(bl, x ->
                       sqrt((CAST(x.cr AS DOUBLE)
                             / CAST(n_ref AS DOUBLE))
                            * (CAST(x.cc AS DOUBLE)
                               / CAST(n_cur AS DOUBLE))))),
                     (acc, x) -> acc + x)
                 END AS bc
          FROM pk
        )
        SELECT event_type, n_ref, n_cur, round(bc, 6) AS bc,
               round(sqrt(greatest(0.0, 1.0 - bc)), 6) AS hellinger
        FROM h
    """
    oracles["tv_drift"] = """
        WITH q AS (
          SELECT event_type,
                 least(CAST(round(value*100) AS BIGINT) // 200, 24)
                   AS bucket,
                 CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                      THEN 1 ELSE 0 END AS is_ref
          FROM events
        ), pb AS (
          SELECT event_type, bucket,
                 CAST(SUM(is_ref) AS BIGINT) AS cr,
                 CAST(SUM(1 - is_ref) AS BIGINT) AS cc
          FROM q GROUP BY event_type, bucket
        ), pk AS (
          SELECT event_type,
                 CAST(SUM(cr) AS BIGINT) AS n_ref,
                 CAST(SUM(cc) AS BIGINT) AS n_cur,
                 list({'cr': cr, 'cc': cc}) AS bl
          FROM pb GROUP BY event_type
        )
        SELECT event_type, n_ref, n_cur,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(bl, x ->
                   abs(x.cr * n_cur - x.cc * n_ref))),
                 (acc, x) -> acc + x) AS tv_num,
               CASE WHEN n_ref > 0 AND n_cur > 0 THEN
                 round(CAST(list_reduce(list_prepend(
                       CAST(0 AS BIGINT),
                       list_transform(bl, x ->
                         abs(x.cr * n_cur - x.cc * n_ref))),
                       (acc, x) -> acc + x) AS DOUBLE)
                   / (2.0 * CAST(n_ref AS DOUBLE)
                      * CAST(n_cur AS DOUBLE)), 6)
               END AS tv
        FROM pk
    """
    oracles["g_test"] = f"""
        WITH d AS (
          SELECT 1 AS g,
                 CAST(CAST(json_extract_string(props, '$.k')
                           AS BIGINT) % 12 AS BIGINT) AS x,
                 CAST(CAST(json_extract_string(props, '$.k')
                           AS BIGINT) % 8 AS BIGINT) AS y
          FROM events
          WHERE json_extract_string(props, '$.k') IS NOT NULL
        ), {_mi_sql_ctes("mi_t", "d", ["g"])}, dims AS (
          SELECT CAST(count(DISTINCT x) AS BIGINT) AS r,
                 CAST(count(DISTINCT y) AS BIGINT) AS c
          FROM d
        )
        SELECT mi_t.n, dims.r, dims.c,
               CASE WHEN (dims.r - 1) * (dims.c - 1) > 0
                    THEN round(2.0 * CAST(mi_t.n AS DOUBLE)
                               * mi_t.mi, 6) END AS g_stat,
               CAST((dims.r - 1) * (dims.c - 1) AS BIGINT) AS df
        FROM mi_t, dims
    """
    oracles["durbin_watson"] = """
        WITH d AS (
          SELECT user_id,
                 CAST(round(value*100) AS BIGINT) AS v,
                 CAST(round(value*100) AS BIGINT)
                   - lag(CAST(round(value*100) AS BIGINT))
                     OVER (PARTITION BY user_id ORDER BY event_id)
                   AS dv
          FROM events WHERE value IS NOT NULL
        ), agg AS (
          SELECT user_id,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(v) AS BIGINT) AS sv,
                 CAST(sum(v*v) AS BIGINT) AS ssv,
                 CAST(coalesce(sum(dv*dv), 0) AS BIGINT) AS num
          FROM d GROUP BY user_id
        )
        SELECT user_id, n, num AS diff_sq_sum,
               CASE WHEN n >= 2
                     AND CAST(ssv AS DOUBLE)
                         - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)
                           / CAST(n AS DOUBLE) > 0.0
                    THEN round(CAST(num AS DOUBLE)
                         / (CAST(ssv AS DOUBLE)
                            - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)
                              / CAST(n AS DOUBLE)), 6)
               END AS dw
        FROM agg
    """
    oracles["runs_test"] = """
        WITH nn AS (
          SELECT event_type AS g, event_id AS o,
                 CAST(round(value*100) AS BIGINT) AS v
          FROM events WHERE value IS NOT NULL
        ), per_v AS (
          SELECT g, v, CAST(count(*) AS BIGINT) AS t
          FROM nn GROUP BY g, v
        ), c AS (
          SELECT g, v, t,
                 sum(t) OVER (PARTITION BY g ORDER BY v
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum,
                 sum(t) OVER (PARTITION BY g) AS n
          FROM per_v
        ), lo AS (
          SELECT g, min(v) AS lo FROM c
          WHERE cum >= n + 1 - (n // 2) - 1 GROUP BY g
        ), hi AS (
          SELECT g, min(v) AS hi FROM c
          WHERE cum >= (n // 2) + 1 GROUP BY g
        ), med AS (
          SELECT g, lo + hi AS m2 FROM lo JOIN hi USING (g)
        ), signed AS (
          SELECT nn.g AS g, nn.o AS o,
                 CASE WHEN 2*v > m2 THEN 1 ELSE -1 END AS sgn
          FROM nn JOIN med ON nn.g = med.g
          WHERE 2*v <> m2
        ), flips AS (
          SELECT g, sgn,
                 CASE WHEN lag(sgn) OVER (PARTITION BY g ORDER BY o)
                           IS NOT NULL
                       AND sgn <> lag(sgn)
                           OVER (PARTITION BY g ORDER BY o)
                      THEN 1 ELSE 0 END AS flip
          FROM signed
        ), agg AS (
          SELECT g AS event_type,
                 CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n1,
                 CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n2,
                 CAST(sum(flip) + 1 AS BIGINT) AS runs
          FROM flips GROUP BY g
        ), m AS (
          SELECT *,
                 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                   / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                   + 1.0 AS mu,
                 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                   * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                      - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE))
                   / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                      * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                      * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)
                         - 1.0)) AS var
          FROM agg
        )
        SELECT event_type, n1, n2, runs,
               CASE WHEN n1 > 0 AND n2 > 0 AND var > 0.0
                    THEN round((CAST(runs AS DOUBLE) - mu)
                               / sqrt(var), 6) END AS z
        FROM m
    """
    oracles["grubbs"] = """
        WITH d AS (
          SELECT event_type,
                 CAST(round(value*100) AS BIGINT) AS v
          FROM events WHERE value IS NOT NULL
        ), agg AS (
          SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(v) AS BIGINT) AS sv,
                 CAST(sum(v*v) AS BIGINT) AS ssv,
                 CAST(min(v) AS BIGINT) AS v_min,
                 CAST(max(v) AS BIGINT) AS v_max
          FROM d GROUP BY event_type
        ), m AS (
          SELECT *,
                 CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
                 (CAST(ssv AS DOUBLE) - CAST(sv AS DOUBLE)
                    * CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1.0) AS var
          FROM agg
        )
        SELECT event_type, n, v_min, v_max,
               CASE WHEN CAST(v_max AS DOUBLE) - mean
                         >= mean - CAST(v_min AS DOUBLE)
                    THEN v_max ELSE v_min END AS outlier_value,
               CASE WHEN n >= 3 AND var > 0.0
                    THEN round(greatest(CAST(v_max AS DOUBLE) - mean,
                                        mean - CAST(v_min AS DOUBLE))
                               / sqrt(var), 6) END AS g_stat
        FROM m
    """
    oracles["concentration"] = """
        WITH d AS (
          SELECT event_type, user_id % 20 AS ub FROM events
        ), per_c AS (
          SELECT event_type, ub, CAST(count(*) AS BIGINT) AS c
          FROM d GROUP BY event_type, ub
        ), agg AS (
          SELECT event_type,
                 CAST(sum(c) AS BIGINT) AS n,
                 CAST(count(*) AS BIGINT) AS n_categories,
                 CAST(sum(c*c) AS BIGINT) AS sum_c2,
                 CAST(max(c) AS BIGINT) AS c_max,
                 list_sort(list({'k': ub, 'c': c})) AS cl
          FROM per_c GROUP BY event_type
        )
        SELECT event_type, n, n_categories, sum_c2,
               round(CAST(sum_c2 AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6)
                 AS hhi,
               round(CAST(c_max AS DOUBLE) / CAST(n AS DOUBLE), 6)
                 AS top_share,
               round(list_reduce(list_prepend(0.0,
                 list_transform(cl, s ->
                   (CAST(s.c AS DOUBLE) / CAST(n AS DOUBLE))
                   * ln(CAST(n AS DOUBLE) / CAST(s.c AS DOUBLE)))),
                 (acc, t) -> acc + t), 6) AS entropy
        FROM agg
    """
    oracles["group_confusion"] = """
        WITH d AS (
          SELECT user_id % 3 AS seg,
                 CASE WHEN CAST(round(value*100) AS BIGINT) > 1000
                      THEN 1 ELSE 0 END AS y,
                 CASE WHEN CAST(json_extract_string(props, '$.k')
                            AS BIGINT) >= 50
                      THEN 1 ELSE 0 END AS p
          FROM events
          WHERE value IS NOT NULL
            AND json_extract_string(props, '$.k') IS NOT NULL
            AND user_id IS NOT NULL
        ), agg AS (
          SELECT seg,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y*p) AS BIGINT) AS tp,
                 CAST(sum((1-y)*p) AS BIGINT) AS fp,
                 CAST(sum(y*(1-p)) AS BIGINT) AS fn,
                 CAST(sum((1-y)*(1-p)) AS BIGINT) AS tn
          FROM d GROUP BY seg
        )
        SELECT seg, n, tp, fp, fn, tn,
               round((CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))
                     / CAST(n AS DOUBLE), 6) AS pos_rate,
               CASE WHEN tp + fn > 0
                    THEN round(CAST(tp AS DOUBLE)
                         / (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE)),
                         6) END AS tpr,
               CASE WHEN fp + tn > 0
                    THEN round(CAST(fp AS DOUBLE)
                         / (CAST(fp AS DOUBLE) + CAST(tn AS DOUBLE)),
                         6) END AS fpr
        FROM agg
    """
    oracles["fairness_gaps"] = """
        WITH d AS (
          SELECT user_id % 3 AS seg,
                 CASE WHEN CAST(round(value*100) AS BIGINT) > 1000
                      THEN 1 ELSE 0 END AS y,
                 CASE WHEN CAST(json_extract_string(props, '$.k')
                            AS BIGINT) >= 50
                      THEN 1 ELSE 0 END AS p
          FROM events
          WHERE value IS NOT NULL
            AND json_extract_string(props, '$.k') IS NOT NULL
            AND user_id IS NOT NULL
        ), agg AS (
          SELECT seg,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y*p) AS BIGINT) AS tp,
                 CAST(sum((1-y)*p) AS BIGINT) AS fp,
                 CAST(sum(y*(1-p)) AS BIGINT) AS fn,
                 CAST(sum((1-y)*(1-p)) AS BIGINT) AS tn
          FROM d GROUP BY seg
        ), rates AS (
          SELECT seg,
                 (CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))
                   / CAST(n AS DOUBLE) AS pos_rate,
                 CASE WHEN tp + fn > 0
                      THEN CAST(tp AS DOUBLE)
                           / (CAST(tp AS DOUBLE)
                              + CAST(fn AS DOUBLE)) END AS tpr,
                 CASE WHEN fp + tn > 0
                      THEN CAST(fp AS DOUBLE)
                           / (CAST(fp AS DOUBLE)
                              + CAST(tn AS DOUBLE)) END AS fpr
          FROM agg
        ), g AS (
          SELECT CAST(count(*) AS BIGINT) AS n_groups,
                 max(pos_rate) AS pr_max, min(pos_rate) AS pr_min,
                 count(pos_rate) AS pr_n,
                 max(tpr) AS tpr_max, min(tpr) AS tpr_min,
                 count(tpr) AS tpr_n,
                 max(fpr) AS fpr_max, min(fpr) AS fpr_min,
                 count(fpr) AS fpr_n
          FROM rates
        )
        SELECT n_groups,
               CASE WHEN pr_n >= 2
                    THEN round(pr_max - pr_min, 6) END AS dp_gap,
               CASE WHEN pr_n >= 2 AND pr_max > 0.0
                    THEN round(pr_min / pr_max, 6) END AS di_ratio,
               CASE WHEN tpr_n >= 2
                    THEN round(tpr_max - tpr_min, 6) END AS tpr_gap,
               CASE WHEN fpr_n >= 2
                    THEN round(fpr_max - fpr_min, 6) END AS fpr_gap,
               CASE WHEN tpr_n >= 2 AND fpr_n >= 2
                    THEN round(greatest(tpr_max - tpr_min,
                                        fpr_max - fpr_min), 6)
                    WHEN tpr_n >= 2
                    THEN round(tpr_max - tpr_min, 6)
                    WHEN fpr_n >= 2
                    THEN round(fpr_max - fpr_min, 6)
               END AS eo_gap
        FROM g
    """
    oracles["sign_test"] = """
        WITH d AS (
          SELECT CAST(json_extract_string(props, '$.k') AS BIGINT)
                   AS x,
                 CAST(round(value*100) AS BIGINT) % 100 AS y
          FROM events
          WHERE json_extract_string(props, '$.k') IS NOT NULL
            AND value IS NOT NULL
        ), agg AS (
          SELECT CAST(sum(CASE WHEN x > y THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_pos,
                 CAST(sum(CASE WHEN x < y THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_neg,
                 CAST(sum(CASE WHEN x = y THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_tie
          FROM d
        )
        SELECT n_pos, n_neg, n_tie,
               CASE WHEN n_pos + n_neg > 0
                    THEN round((CAST(n_pos AS DOUBLE)
                          - CAST(n_pos + n_neg AS DOUBLE) / 2.0)
                         / sqrt(CAST(n_pos + n_neg AS DOUBLE) / 4.0),
                         6) END AS z
        FROM agg
    """
    oracles["wilcoxon"] = """
        WITH d0 AS (
          SELECT CAST(json_extract_string(props, '$.k') AS BIGINT)
                 - CAST(round(value*100) AS BIGINT) % 100 AS d
          FROM events
          WHERE json_extract_string(props, '$.k') IS NOT NULL
            AND value IS NOT NULL
        ), zeros AS (
          SELECT CAST(count(*) AS BIGINT) AS n_zero
          FROM d0 WHERE d = 0
        ), nz AS (
          SELECT abs(d) AS a,
                 CASE WHEN d > 0 THEN 1 ELSE 0 END AS pos
          FROM d0 WHERE d <> 0
        ), per_a AS (
          SELECT a, CAST(count(*) AS BIGINT) AS t,
                 CAST(sum(pos) AS BIGINT) AS tp
          FROM nz GROUP BY a
        ), ranked AS (
          SELECT a, t, tp,
                 2 * (coalesce(sum(t) OVER (ORDER BY a
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) + 1) + t - 1 AS r2
          FROM per_a
        ), s AS (
          SELECT CAST(coalesce(sum(t), 0) AS BIGINT) AS n,
                 CAST(coalesce(sum(tp * r2), 0) AS BIGINT) AS w2p,
                 CAST(coalesce(sum(t*t*t - t), 0) AS BIGINT) AS tc
          FROM ranked
        ), m AS (
          SELECT s.n, s.w2p, zeros.n_zero,
                 CAST(s.n AS DOUBLE) * (CAST(s.n AS DOUBLE) + 1.0)
                   * (2.0 * CAST(s.n AS DOUBLE) + 1.0) / 24.0
                 - CAST(s.tc AS DOUBLE) / 48.0 AS var
          FROM s, zeros
        )
        SELECT n AS n_nonzero, n_zero, w2p AS w2_plus,
               CASE WHEN n > 0 AND var > 0.0
                    THEN round((CAST(w2p AS DOUBLE)
                          - CAST(n AS DOUBLE)
                            * (CAST(n AS DOUBLE) + 1.0) / 2.0)
                         / (2.0 * sqrt(var)), 6) END AS z
        FROM m
    """
    oracles["kalman1d"] = """
        WITH d AS (
          SELECT user_id,
                 CAST(CAST(round(value*100) AS BIGINT) AS DOUBLE)
                   AS v,
                 event_id AS o
          FROM events WHERE user_id IS NOT NULL
        ), ser AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                 list(v ORDER BY o) AS l
          FROM d GROUP BY user_id
        ), folded AS (
          SELECT user_id, n,
                 -- field order is LOAD-BEARING (the
                 -- competing_risks lesson): DuckDB 1.0 list_reduce
                 -- updates accumulator fields sequentially, so 'p'
                 -- (read by 'm' and 'k') must update LAST
                 list_reduce(
                   list_prepend(
                     {'m': l[1], 'k': CAST(0.5 AS DOUBLE),
                      'p': CAST(4.0 AS DOUBLE)},
                     list_transform(l[2:], v ->
                       {'m': v, 'k': CAST(0.0 AS DOUBLE),
                        'p': CAST(0.0 AS DOUBLE)})),
                   (acc, x) -> {
                     'm': acc.m + ((acc.p + 1.0)
                            / ((acc.p + 1.0) + 4.0))
                            * (x.m - acc.m),
                     'k': (acc.p + 1.0) / ((acc.p + 1.0) + 4.0),
                     'p': (1.0 - (acc.p + 1.0)
                            / ((acc.p + 1.0) + 4.0))
                            * (acc.p + 1.0)})
                   AS st
          FROM ser
        )
        SELECT user_id, n, round(st.m, 6) AS level,
               round(st.p, 6) AS p_var, round(st.k, 6) AS gain
        FROM folded
    """
    oracles["croston"] = """
        WITH d AS (
          SELECT user_id,
                 CASE WHEN event_type = 'purchase'
                      THEN CAST(CAST(round(value*100) AS BIGINT)
                                AS DOUBLE)
                      ELSE CAST(0.0 AS DOUBLE) END AS v,
                 event_id AS o
          FROM events WHERE user_id IS NOT NULL
        ), ser AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN v > 0.0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_demand,
                 list(v ORDER BY o) AS l
          FROM d GROUP BY user_id
        ), folded AS (
          SELECT user_id, n, n_demand,
                 list_reduce(
                   list_prepend(
                     {'z': CAST(0.0 AS DOUBLE),
                      'p': CAST(0.0 AS DOUBLE),
                      'g': CAST(0.0 AS DOUBLE),
                      's': CAST(0.0 AS DOUBLE)},
                     list_transform(l, v ->
                       {'z': v, 'p': CAST(0.0 AS DOUBLE),
                        'g': CAST(0.0 AS DOUBLE),
                        's': CAST(0.0 AS DOUBLE)})),
                   (acc, x) -> {
                     'z': sign(x.z) * (1.0 - acc.s) * x.z
                          + sign(x.z) * acc.s
                            * (0.5 * x.z + 0.5 * acc.z)
                          + (1.0 - sign(x.z)) * acc.z,
                     'p': sign(x.z) * (1.0 - acc.s) * (acc.g + 1.0)
                          + sign(x.z) * acc.s
                            * (0.5 * (acc.g + 1.0) + 0.5 * acc.p)
                          + (1.0 - sign(x.z)) * acc.p,
                     'g': (1.0 - sign(x.z)) * (acc.g + 1.0),
                     's': acc.s + sign(x.z) * (1.0 - acc.s)})
                   AS st
          FROM ser
        )
        SELECT user_id, n, n_demand,
               CASE WHEN st.s = 1.0 THEN round(st.z, 6) END AS z,
               CASE WHEN st.s = 1.0 THEN round(st.p, 6) END AS p,
               CASE WHEN st.s = 1.0 AND st.p > 0.0
                    THEN round(st.z / st.p, 6) END AS forecast
        FROM folded
    """
    oracles["hosmer_lemeshow"] = """
        WITH d AS (
          SELECT CAST(json_extract_string(props, '$.k') AS BIGINT)
                   * 10 AS pm,
                 CASE WHEN CAST(round(value*100) AS BIGINT) > 1000
                      THEN 1 ELSE 0 END AS y
          FROM events
          WHERE json_extract_string(props, '$.k') IS NOT NULL
            AND value IS NOT NULL
        ), per_v AS (
          SELECT pm, CAST(count(*) AS BIGINT) AS t
          FROM d GROUP BY pm
        ), binmap AS (
          SELECT pm,
                 (10 * coalesce(sum(t) OVER (ORDER BY pm
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0))
                 // (sum(t) OVER ()) AS b
          FROM per_v
        ), per_b AS (
          SELECT b, CAST(count(*) AS BIGINT) AS n_b,
                 CAST(sum(y) AS BIGINT) AS o_b,
                 CAST(sum(d.pm) AS BIGINT) AS spm
          FROM d JOIN binmap USING (pm) GROUP BY b
        ), terms AS (
          SELECT b, n_b, o_b, spm,
                 CAST(spm AS DOUBLE) / 1000.0 AS e_b,
                 CASE WHEN CAST(spm AS DOUBLE) / 1000.0 <= 0.0
                        OR CAST(spm AS DOUBLE) / 1000.0
                           >= CAST(n_b AS DOUBLE)
                      THEN 1 ELSE 0 END AS degen
          FROM per_b
        )
        SELECT CAST(sum(n_b) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS n_bins,
               CAST(sum(degen) AS BIGINT) AS n_degenerate,
               round(list_reduce(list_prepend(0.0,
                 list(CASE WHEN degen = 1 THEN 0.0
                      ELSE (CAST(o_b AS DOUBLE) - e_b)
                           * (CAST(o_b AS DOUBLE) - e_b)
                           / (e_b * (1.0 - e_b
                                     / CAST(n_b AS DOUBLE)))
                      END ORDER BY b)),
                 (acc, x) -> acc + x), 6) AS hl_stat,
               CAST(8 AS BIGINT) AS df
        FROM terms
    """
    oracles["inequality"] = """
        WITH base AS (
          SELECT event_type AS grp,
                 CAST(round(value*100) AS BIGINT) AS v
          FROM events
        ), nonpos AS (
          SELECT grp,
                 CAST(sum(CASE WHEN v IS NULL OR v <= 0
                               THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nonpos
          FROM base GROUP BY grp
        ), per_v AS (
          SELECT grp, v, CAST(count(*) AS BIGINT) AS c
          FROM base WHERE v > 0 GROUP BY grp, v
        ), agg AS (
          SELECT grp, CAST(sum(c) AS BIGINT) AS n,
                 CAST(sum(c * v) AS BIGINT) AS sum_v,
                 list_sort(list({'v': v, 'c': c})) AS cl
          FROM per_v GROUP BY grp
        ), m AS (
          SELECT grp, n, sum_v,
                 CAST(sum_v AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                 list_reduce(list_prepend(0.0,
                   list_transform(cl, s ->
                     CAST(s.c * s.v AS DOUBLE)
                     * ln(CAST(s.v AS DOUBLE)))),
                   (acc, x) -> acc + x) AS sxlnx,
                 list_reduce(list_prepend(0.0,
                   list_transform(cl, s ->
                     CAST(s.c AS DOUBLE)
                     * ln(CAST(s.v AS DOUBLE)))),
                   (acc, x) -> acc + x) AS slnx
          FROM agg
        )
        SELECT np.grp AS event_type,
               CAST(coalesce(m.n, 0) AS BIGINT) AS n,
               np.n_nonpos,
               CAST(coalesce(m.sum_v, 0) AS BIGINT) AS sum_v,
               CASE WHEN m.n > 0
                    THEN round(m.sxlnx
                         / (CAST(m.n AS DOUBLE) * m.mu)
                         - ln(m.mu), 6) END AS theil_t,
               CASE WHEN m.n > 0
                    THEN round(1.0 - exp(m.slnx
                               / CAST(m.n AS DOUBLE)) / m.mu, 6)
               END AS atkinson
        FROM nonpos np LEFT JOIN m ON np.grp = m.grp
    """
    oracles["jonckheere"] = """
        WITH d AS (
          SELECT CAST(json_extract_string(props, '$.k') AS BIGINT)
                   // 20 AS g,
                 CAST(round(value*100) AS BIGINT) % 200 AS v
          FROM events
          WHERE json_extract_string(props, '$.k') IS NOT NULL
            AND value IS NOT NULL
        ), cells AS (
          SELECT g, v, CAST(count(*) AS BIGINT) AS c
          FROM d GROUP BY g, v
        ), j AS (
          SELECT CAST(coalesce(sum(
                   CASE WHEN a.v < b.v THEN 2 * a.c * b.c
                        WHEN a.v = b.v THEN a.c * b.c
                        ELSE 0 END), 0) AS BIGINT) AS j2
          FROM cells a JOIN cells b ON a.g < b.g
        ), per_g AS (
          SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(ni) AS BIGINT) AS n,
                 CAST(sum(ni*ni) AS BIGINT) AS sn2,
                 CAST(sum(ni*ni*(2*ni+3)) AS BIGINT) AS sn23
          FROM (SELECT g, CAST(sum(c) AS BIGINT) AS ni
                FROM cells GROUP BY g)
        ), m AS (
          SELECT j.j2, per_g.k, per_g.n,
                 (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                  - CAST(sn2 AS DOUBLE)) / 4.0 AS mu,
                 (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    * (2.0 * CAST(n AS DOUBLE) + 3.0)
                  - CAST(sn23 AS DOUBLE)) / 72.0 AS var
          FROM j, per_g
        )
        SELECT k, n, j2,
               CASE WHEN var > 0.0
                    THEN round((CAST(j2 AS DOUBLE) / 2.0 - mu)
                               / sqrt(var), 6) END AS z
        FROM m
    """
    oracles["mood_median"] = """
        WITH base AS (
          SELECT event_type AS g,
                 CAST(round(value*100) AS BIGINT) AS v
          FROM events WHERE value IS NOT NULL
        ), per_v AS (
          SELECT v, CAST(count(*) AS BIGINT) AS t
          FROM base GROUP BY v
        ), c AS (
          SELECT v, t,
                 sum(t) OVER (ORDER BY v
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum,
                 sum(t) OVER () AS nt
          FROM per_v
        ), med AS (
          SELECT (SELECT min(v) FROM c
                  WHERE cum >= nt + 1 - (nt // 2) - 1)
                 + (SELECT min(v) FROM c
                    WHERE cum >= (nt // 2) + 1) AS m2
          FROM c LIMIT 1
        ), per_g AS (
          SELECT g, CAST(count(*) AS BIGINT) AS ni,
                 CAST(sum(CASE WHEN 2*v > m2 THEN 1 ELSE 0 END)
                      AS BIGINT) AS ai
          FROM base, med GROUP BY g
        ), tot AS (
          SELECT CAST(sum(ni) AS BIGINT) AS n,
                 CAST(sum(ai) AS BIGINT) AS n_above,
                 CAST(count(*) AS BIGINT) AS k
          FROM per_g
        ), folded AS (
          SELECT tot.k, tot.n, tot.n_above,
                 list_reduce(list_prepend(0.0,
                   list((CAST(ai AS DOUBLE)
                         - CAST(ni AS DOUBLE)
                           * (CAST(n_above AS DOUBLE)
                              / CAST(n AS DOUBLE)))
                        * (CAST(ai AS DOUBLE)
                           - CAST(ni AS DOUBLE)
                             * (CAST(n_above AS DOUBLE)
                                / CAST(n AS DOUBLE)))
                        / (CAST(ni AS DOUBLE)
                           * (CAST(n_above AS DOUBLE)
                              / CAST(n AS DOUBLE)))
                      + (CAST(ni - ai AS DOUBLE)
                         - CAST(ni AS DOUBLE)
                           * (1.0 - CAST(n_above AS DOUBLE)
                                    / CAST(n AS DOUBLE)))
                        * (CAST(ni - ai AS DOUBLE)
                           - CAST(ni AS DOUBLE)
                             * (1.0 - CAST(n_above AS DOUBLE)
                                      / CAST(n AS DOUBLE)))
                        / (CAST(ni AS DOUBLE)
                           * (1.0 - CAST(n_above AS DOUBLE)
                                    / CAST(n AS DOUBLE)))
                      ORDER BY g)),
                   (acc, x) -> acc + x) AS chi2
          FROM per_g, tot
          GROUP BY tot.k, tot.n, tot.n_above
        )
        SELECT k, n, n_above,
               CASE WHEN n_above > 0 AND n_above < n
                    THEN round(chi2, 6) END AS chi2,
               CAST(k - 1 AS BIGINT) AS df
        FROM folded
    """
    oracles["bartlett"] = """
        WITH per AS (
          SELECT event_type AS g,
                 CAST(count(*) AS BIGINT) AS ni,
                 CAST(sum(CAST(round(value*100) AS BIGINT))
                      AS BIGINT) AS si,
                 CAST(sum(CAST(round(value*100) AS BIGINT)
                          * CAST(round(value*100) AS BIGINT))
                      AS BIGINT) AS qi
          FROM events WHERE value IS NOT NULL
          GROUP BY event_type
        ), dropped AS (
          SELECT CAST(count(*) AS BIGINT) AS n_dropped_groups
          FROM per WHERE ni < 2
        ), u AS (
          SELECT * FROM per WHERE ni >= 2
        ), agg AS (
          SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(ni) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN qi * ni = si * si
                               THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_zero_var,
                 CAST(sum(ni - 1) AS BIGINT) AS dof_w,
                 list_reduce(list_prepend(0.0,
                   list((CAST(ni AS DOUBLE) - 1.0)
                        * ln((CAST(qi AS DOUBLE)
                              - CAST(si AS DOUBLE)
                                * CAST(si AS DOUBLE)
                                / CAST(ni AS DOUBLE))
                             / (CAST(ni AS DOUBLE) - 1.0))
                        ORDER BY g)),
                   (acc, x) -> acc + x) AS sum_lns,
                 list_reduce(list_prepend(0.0,
                   list(1.0 / (CAST(ni AS DOUBLE) - 1.0)
                        ORDER BY g)),
                   (acc, x) -> acc + x) AS sum_rdf,
                 list_reduce(list_prepend(0.0,
                   list(CAST(qi AS DOUBLE)
                        - CAST(si AS DOUBLE) * CAST(si AS DOUBLE)
                          / CAST(ni AS DOUBLE) ORDER BY g)),
                   (acc, x) -> acc + x) AS ssw
          FROM u
        ), m AS (
          SELECT agg.*, dropped.n_dropped_groups,
                 CAST(dof_w AS DOUBLE) * ln(ssw
                   / CAST(dof_w AS DOUBLE)) - sum_lns AS t_stat,
                 1.0 + (sum_rdf - 1.0 / CAST(dof_w AS DOUBLE))
                   / (3.0 * (CAST(k AS DOUBLE) - 1.0)) AS c
          FROM agg, dropped
        )
        SELECT k, n, n_dropped_groups,
               CASE WHEN k >= 2 AND n_zero_var = 0
                    THEN round(t_stat / c, 6) END AS bartlett_stat,
               CAST(k - 1 AS BIGINT) AS df
        FROM m
    """
    oracles["cochran_armitage"] = """
        WITH d AS (
          SELECT CAST(json_extract_string(props, '$.k') AS BIGINT)
                   // 10 AS s,
                 CASE WHEN CAST(round(value*100) AS BIGINT) > 1000
                      THEN 1 ELSE 0 END AS y
          FROM events
          WHERE json_extract_string(props, '$.k') IS NOT NULL
            AND value IS NOT NULL
        ), per AS (
          SELECT s, CAST(count(*) AS BIGINT) AS ni,
                 CAST(sum(y) AS BIGINT) AS ri
          FROM d GROUP BY s
        ), agg AS (
          SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(ni) AS BIGINT) AS n,
                 CAST(sum(ri) AS BIGINT) AS r,
                 CAST(sum(ni*s) AS BIGINT) AS sns,
                 CAST(sum(ni*s*s) AS BIGINT) AS sns2,
                 CAST(sum(ri*s) AS BIGINT) AS ssr
          FROM per
        ), m AS (
          SELECT *,
                 CAST(r AS DOUBLE) / CAST(n AS DOUBLE) AS pbar,
                 CAST(sns2 AS DOUBLE) - CAST(sns AS DOUBLE)
                   * CAST(sns AS DOUBLE) / CAST(n AS DOUBLE) AS svar
          FROM agg
        )
        SELECT k, n, r AS n_pos,
               CASE WHEN pbar * (1.0 - pbar) * svar > 0.0
                    THEN round((CAST(ssr AS DOUBLE)
                                - pbar * CAST(sns AS DOUBLE))
                         / sqrt(pbar * (1.0 - pbar) * svar), 6)
               END AS z
        FROM m
    """
    oracles["clustering_coeff"] = """
        WITH canon AS (
          SELECT DISTINCT
                 least(l_orderkey % 400, l_partkey % 400) AS a,
                 greatest(l_orderkey % 400, l_partkey % 400) AS b
          FROM lineitem
          WHERE l_orderkey % 400 <> l_partkey % 400
        ), deg AS (
          SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
            SELECT a AS node FROM canon
            UNION ALL SELECT b FROM canon)
          GROUP BY node
        ), tris AS (
          SELECT ab.a AS x, ab.b AS y, bc.b AS z
          FROM canon ab
          JOIN canon bc ON ab.b = bc.a
          JOIN canon ac ON ac.a = ab.a AND ac.b = bc.b
        ), per_node AS (
          SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (
            SELECT x AS node FROM tris
            UNION ALL SELECT y FROM tris
            UNION ALL SELECT z FROM tris)
          GROUP BY node
        )
        SELECT d.node, d.degree,
               CAST(coalesce(p.triangles, 0) AS BIGINT) AS triangles,
               CASE WHEN d.degree >= 2
                    THEN round(2.0 * CAST(coalesce(p.triangles, 0)
                                          AS DOUBLE)
                         / (CAST(d.degree AS DOUBLE)
                            * CAST(d.degree - 1 AS DOUBLE)), 6)
               END AS lcc
        FROM deg d LEFT JOIN per_node p ON d.node = p.node
    """
    oracles["cronbach"] = """
        WITH d AS (
          SELECT CAST(json_extract_string(props, '$.k') AS BIGINT)
                   // 2 AS i1,
                 CAST(json_extract_string(props, '$.k') AS BIGINT)
                   // 3 AS i2,
                 CAST(json_extract_string(props, '$.k') AS BIGINT)
                   // 5 AS i3,
                 CAST(round(value*100) AS BIGINT) % 20 AS i4
          FROM events
        ), dropped AS (
          SELECT CAST(count(*) AS BIGINT) AS n_dropped FROM d
          WHERE i1 IS NULL OR i2 IS NULL OR i3 IS NULL OR i4 IS NULL
        ), u AS (
          SELECT *, i1 + i2 + i3 + i4 AS t FROM d
          WHERE i1 IS NOT NULL AND i2 IS NOT NULL
            AND i3 IS NOT NULL AND i4 IS NOT NULL
        ), agg AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(t) AS BIGINT) AS st,
                 CAST(sum(t*t) AS BIGINT) AS sst,
                 CAST(sum(i1) AS BIGINT) AS s0,
                 CAST(sum(i1*i1) AS BIGINT) AS q0,
                 CAST(sum(i2) AS BIGINT) AS s1,
                 CAST(sum(i2*i2) AS BIGINT) AS q1,
                 CAST(sum(i3) AS BIGINT) AS s2,
                 CAST(sum(i3*i3) AS BIGINT) AS q2,
                 CAST(sum(i4) AS BIGINT) AS s3,
                 CAST(sum(i4*i4) AS BIGINT) AS q3
          FROM u
        ), m AS (
          SELECT agg.*, dropped.n_dropped,
                 (((CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE)
                     * CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE))
                    / (CAST(n AS DOUBLE) - 1.0))
                  + ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)
                     * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    / (CAST(n AS DOUBLE) - 1.0))
                  + ((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)
                     * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                    / (CAST(n AS DOUBLE) - 1.0))
                  + ((CAST(q3 AS DOUBLE) - CAST(s3 AS DOUBLE)
                     * CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
                    / (CAST(n AS DOUBLE) - 1.0))) AS siv,
                 ((CAST(sst AS DOUBLE) - CAST(st AS DOUBLE)
                    * CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
                  / (CAST(n AS DOUBLE) - 1.0)) AS tv
          FROM agg, dropped
        )
        SELECT n, n_dropped, CAST(4 AS BIGINT) AS k,
               CASE WHEN n >= 2 THEN round(siv, 6) END
                 AS sum_item_var,
               CASE WHEN n >= 2 THEN round(tv, 6) END AS total_var,
               CASE WHEN n >= 2 AND tv > 0.0
                    THEN round((4.0 / 3.0) * (1.0 - siv / tv), 6)
               END AS alpha
        FROM m
    """
    oracles["dickey_fuller"] = """
        WITH s AS (
          SELECT user_id,
                 CAST(round(value*100) AS BIGINT) AS v,
                 lag(CAST(round(value*100) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY event_id)
                   AS x
          FROM events WHERE value IS NOT NULL
        ), d AS (
          SELECT user_id, x, v - x AS y FROM s WHERE x IS NOT NULL
        ), agg AS (
          SELECT user_id,
                 CAST(count(*) AS BIGINT) AS np,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x*y) AS BIGINT) AS sxy,
                 CAST(sum(x*x) AS BIGINT) AS sxx,
                 CAST(sum(y*y) AS BIGINT) AS syy
          FROM d GROUP BY user_id
        ), m AS (
          SELECT user_id, np,
                 CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                   * CAST(sx AS DOUBLE) / CAST(np AS DOUBLE) AS cxx,
                 CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                   * CAST(sy AS DOUBLE) / CAST(np AS DOUBLE) AS cxy,
                 CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                   * CAST(sy AS DOUBLE) / CAST(np AS DOUBLE) AS cyy
          FROM agg
        ), r AS (
          SELECT user_id, np, cxx, cxy, cyy,
                 cxy / cxx AS b,
                 cyy - (cxy / cxx) * cxy AS sse
          FROM m
        )
        SELECT user_id, np AS n_pairs,
               CASE WHEN np >= 3 AND cxx > 0.0
                    THEN round(b, 6) END AS b,
               CASE WHEN np >= 3 AND cxx > 0.0
                     AND sse / (CAST(np AS DOUBLE) - 2.0) / cxx > 0.0
                    THEN round(b / sqrt(sse
                         / (CAST(np AS DOUBLE) - 2.0) / cxx), 6)
               END AS df_stat
        FROM r
    """
    oracles["periodogram"] = """
        WITH s AS (
          SELECT event_type,
                 CAST(round(value*100) AS BIGINT) AS v,
                 (row_number() OVER (PARTITION BY event_type
                                     ORDER BY event_id) - 1) % 4
                   AS m
          FROM events WHERE value IS NOT NULL
        ), agg AS (
          SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(v) AS BIGINT) AS sv,
                 CAST(sum(v*v) AS BIGINT) AS ssv,
                 CAST(sum(CASE WHEN m % 2 = 0 THEN v ELSE -v END)
                      AS BIGINT) AS a2,
                 CAST(sum(CASE WHEN m = 0 THEN v
                               WHEN m = 2 THEN -v ELSE 0 END)
                      AS BIGINT) AS c4,
                 CAST(sum(CASE WHEN m = 1 THEN v
                               WHEN m = 3 THEN -v ELSE 0 END)
                      AS BIGINT) AS s4
          FROM s GROUP BY event_type
        )
        SELECT event_type, n,
               CAST(a2*a2 AS BIGINT) AS p2,
               CAST(c4*c4 + s4*s4 AS BIGINT) AS p4,
               CAST(n*ssv - sv*sv AS BIGINT) AS ss2_num,
               CASE WHEN n*ssv - sv*sv > 0
                    THEN round(CAST(a2*a2 AS DOUBLE)
                         / (CAST(n*ssv - sv*sv AS DOUBLE)
                            / CAST(n AS DOUBLE)), 6) END AS p2_share,
               CASE WHEN n*ssv - sv*sv > 0
                    THEN round(CAST(c4*c4 + s4*s4 AS DOUBLE)
                         / (CAST(n*ssv - sv*sv AS DOUBLE)
                            / CAST(n AS DOUBLE)), 6) END AS p4_share
        FROM agg
    """
    oracles["streaming_kalman"] = """
        WITH RECURSIVE q0 AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 CAST(abs(CAST(round(value*100) AS BIGINT)) AS DOUBLE)
                   AS v
          FROM events
        ), ser AS (
          SELECT user_id, v,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY us, event_id) AS i,
                 count(*) OVER (PARTITION BY user_id) AS n
          FROM q0
        ), rec AS (
          SELECT user_id, i, n, v AS m, CAST(4.0 AS DOUBLE) AS p,
                 CAST(0.5 AS DOUBLE) AS k
          FROM ser WHERE i = 1
          UNION ALL
          SELECT s.user_id, s.i, s.n,
                 r.m + ((r.p + 1.0) / ((r.p + 1.0) + 4.0))
                     * (s.v - r.m) AS m,
                 (1.0 - (r.p + 1.0) / ((r.p + 1.0) + 4.0))
                     * (r.p + 1.0) AS p,
                 (r.p + 1.0) / ((r.p + 1.0) + 4.0) AS k
          FROM rec r
          JOIN ser s ON s.user_id = r.user_id AND s.i = r.i + 1
        )
        SELECT user_id, CAST(n AS BIGINT) AS n_events,
               round(m, 6) AS level, round(p, 6) AS p_var,
               round(k, 6) AS gain
        FROM rec WHERE i = n
    """
    oracles["image_glcm"] = """
        WITH px AS (
          SELECT o_orderkey AS okey, y, x,
                 ((((okey*7919 + (y*24 + x*3 + 0)*31) % 256) + ((okey*7919 + (y*24 + x*3 + 1)*31) % 256) + ((okey*7919 + (y*24 + x*3 + 2)*31) % 256)) * 8) // 766 AS qa,
                 ((((okey*7919 + (y*24 + (x+1)*3 + 0)*31) % 256) + ((okey*7919 + (y*24 + (x+1)*3 + 1)*31) % 256) + ((okey*7919 + (y*24 + (x+1)*3 + 2)*31) % 256)) * 8) // 766 AS qb
          FROM orders,
               unnest(generate_series(0, 7)) AS ty(y),
               unnest(generate_series(0, 6)) AS tx(x)
        ), cells AS (
          SELECT okey, qa, qb, CAST(count(*) AS BIGINT) AS c
          FROM px GROUP BY okey, qa, qb
        ), en AS (
          SELECT okey, CAST(sum(c*c) AS BIGINT) AS energy_num
          FROM cells GROUP BY okey
        ), st AS (
          SELECT okey,
                 CAST(count(*) AS BIGINT) AS pairs,
                 CAST(sum((qa-qb)*(qa-qb)) AS BIGINT) AS contrast,
                 CAST(sum(840 // (1 + abs(qa-qb))) AS BIGINT)
                   AS hom840
          FROM px GROUP BY okey
        )
        SELECT st.okey, st.pairs AS glcm_pairs,
               st.contrast AS glcm_contrast,
               en.energy_num AS glcm_energy_num,
               st.hom840 AS glcm_hom840
        FROM st JOIN en ON st.okey = en.okey
    """
    oracles["image_projection"] = """
        WITH px AS (
          SELECT o_orderkey AS okey, y, x, (((okey*7919 + (y*24 + x*3 + 0)*31) % 256) + ((okey*7919 + (y*24 + x*3 + 1)*31) % 256) + ((okey*7919 + (y*24 + x*3 + 2)*31) % 256)) AS g
          FROM orders,
               unnest(generate_series(0, 7)) AS ty(y),
               unnest(generate_series(0, 7)) AS tx(x)
        ), rows_ AS (
          SELECT okey, y, CAST(sum(g) AS BIGINT) AS r
          FROM px GROUP BY okey, y
        ), cols_ AS (
          SELECT okey, x, CAST(sum(g) AS BIGINT) AS c
          FROM px GROUP BY okey, x
        ), ra AS (
          SELECT okey, CAST(sum(r) AS BIGINT) AS total,
                 CAST(sum(r*r) AS BIGINT) AS rssq,
                 CAST(sum(y*r) AS BIGINT) AS comy
          FROM rows_ GROUP BY okey
        ), ca AS (
          SELECT okey, CAST(sum(c*c) AS BIGINT) AS cssq,
                 CAST(sum(x*c) AS BIGINT) AS comx
          FROM cols_ GROUP BY okey
        )
        SELECT ra.okey, ra.total AS proj_total,
               ra.rssq AS proj_row_ssq, ca.cssq AS proj_col_ssq,
               ra.comy AS com_y_num, ca.comx AS com_x_num
        FROM ra JOIN ca ON ra.okey = ca.okey
    """
    oracles["rbf_hsic"] = """
        WITH d AS (
          SELECT CAST(CAST(json_extract_string(props, '$.k')
                           AS BIGINT) % 12 AS BIGINT) AS x,
                 CAST(CAST(json_extract_string(props, '$.k')
                           AS BIGINT) % 8 AS BIGINT) AS y
          FROM events
          WHERE json_extract_string(props, '$.k') IS NOT NULL
        ), cells AS (
          SELECT x, y, CAST(count(*) AS BIGINT) AS c
          FROM d GROUP BY x, y
        ), one AS (
          SELECT CAST(sum(c) AS BIGINT) AS n,
                 CAST(count(*) AS BIGINT) AS n_cells,
                 list_sort(list({'x': x, 'y': y, 'c': c})) AS cl
          FROM cells
        ), m AS (
          SELECT n, n_cells,
            list_reduce(list_prepend(0.0, list_transform(cl, o ->
              list_reduce(list_prepend(0.0, list_transform(cl, i ->
                CAST(o.c * i.c AS DOUBLE)
                * exp((-0.0078125)
                      * CAST((o.x-i.x)*(o.x-i.x) AS DOUBLE))
                * exp((-0.0078125)
                      * CAST((o.y-i.y)*(o.y-i.y) AS DOUBLE)))),
                (a, v) -> a + v))),
              (a, v) -> a + v) AS t1,
            list_reduce(list_prepend(0.0, list_transform(cl, o ->
              CAST(o.c AS DOUBLE)
              * list_reduce(list_prepend(0.0,
                  list_transform(cl, s -> CAST(s.c AS DOUBLE)
                    * exp((-0.0078125)
                          * CAST((o.x-s.x)*(o.x-s.x) AS DOUBLE)))),
                  (a, v) -> a + v)
              * list_reduce(list_prepend(0.0,
                  list_transform(cl, s -> CAST(s.c AS DOUBLE)
                    * exp((-0.0078125)
                          * CAST((o.y-s.y)*(o.y-s.y) AS DOUBLE)))),
                  (a, v) -> a + v))),
              (a, v) -> a + v) AS t2,
            list_reduce(list_prepend(0.0, list_transform(cl, o ->
              CAST(o.c AS DOUBLE)
              * list_reduce(list_prepend(0.0,
                  list_transform(cl, s -> CAST(s.c AS DOUBLE)
                    * exp((-0.0078125)
                          * CAST((o.x-s.x)*(o.x-s.x) AS DOUBLE)))),
                  (a, v) -> a + v))),
              (a, v) -> a + v) AS sk,
            list_reduce(list_prepend(0.0, list_transform(cl, o ->
              CAST(o.c AS DOUBLE)
              * list_reduce(list_prepend(0.0,
                  list_transform(cl, s -> CAST(s.c AS DOUBLE)
                    * exp((-0.0078125)
                          * CAST((o.y-s.y)*(o.y-s.y) AS DOUBLE)))),
                  (a, v) -> a + v))),
              (a, v) -> a + v) AS sl
          FROM one
        )
        SELECT n, n_cells,
               round(t1 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                 - 2.0 * t2 / ((CAST(n AS DOUBLE)
                                * CAST(n AS DOUBLE))
                               * CAST(n AS DOUBLE))
                 + (sk / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                   * (sl / (CAST(n AS DOUBLE)
                            * CAST(n AS DOUBLE))), 6) AS hsic
        FROM m
    """
    oracles["mmd_drift"] = """
        WITH q AS (
          SELECT least(CAST(round(value*100) AS BIGINT) // 200, 24)
                   AS v,
                 CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                      THEN 1 ELSE 0 END AS is_ref
          FROM events
        ), per_v AS (
          SELECT v, CAST(SUM(is_ref) AS BIGINT) AS cr,
                 CAST(SUM(1 - is_ref) AS BIGINT) AS cc
          FROM q GROUP BY v
        ), one AS (
          SELECT CAST(sum(cr) AS BIGINT) AS n_ref,
                 CAST(sum(cc) AS BIGINT) AS n_cur,
                 CAST(count(*) AS BIGINT) AS n_values,
                 list_sort(list({'v': v, 'cr': cr, 'cc': cc})) AS cl
          FROM per_v
        ), m AS (
          SELECT n_ref, n_cur, n_values,
            list_reduce(list_prepend(0.0, list_transform(cl, o ->
              list_reduce(list_prepend(0.0, list_transform(cl, i ->
                CAST(o.cr * i.cr AS DOUBLE)
                * exp((-0.0078125)
                      * CAST((o.v-i.v)*(o.v-i.v) AS DOUBLE)))),
                (a, x) -> a + x))),
              (a, x) -> a + x) AS srr,
            list_reduce(list_prepend(0.0, list_transform(cl, o ->
              list_reduce(list_prepend(0.0, list_transform(cl, i ->
                CAST(o.cc * i.cc AS DOUBLE)
                * exp((-0.0078125)
                      * CAST((o.v-i.v)*(o.v-i.v) AS DOUBLE)))),
                (a, x) -> a + x))),
              (a, x) -> a + x) AS scc,
            list_reduce(list_prepend(0.0, list_transform(cl, o ->
              list_reduce(list_prepend(0.0, list_transform(cl, i ->
                CAST(o.cr * i.cc AS DOUBLE)
                * exp((-0.0078125)
                      * CAST((o.v-i.v)*(o.v-i.v) AS DOUBLE)))),
                (a, x) -> a + x))),
              (a, x) -> a + x) AS src_
          FROM one
        )
        SELECT n_ref, n_cur, n_values,
               CASE WHEN n_ref > 0 AND n_cur > 0
                    THEN round(srr / (CAST(n_ref AS DOUBLE)
                                      * CAST(n_ref AS DOUBLE))
                         + scc / (CAST(n_cur AS DOUBLE)
                                  * CAST(n_cur AS DOUBLE))
                         - 2.0 * src_ / (CAST(n_ref AS DOUBLE)
                                         * CAST(n_cur AS DOUBLE)),
                         9) END AS mmd2
        FROM m
    """
    oracles["rolling_vwap"] = """
        WITH d AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 CAST(round(value*100) AS BIGINT) AS p,
                 CAST(1 + event_id % 9 AS BIGINT) AS v
          FROM events
        ), w AS (
          SELECT event_id,
                 CAST(sum(v) OVER (PARTITION BY user_id ORDER BY us
                      RANGE BETWEEN 3600000000 PRECEDING
                      AND CURRENT ROW) AS BIGINT) AS sv,
                 CAST(sum(p*v) OVER (PARTITION BY user_id
                      ORDER BY us
                      RANGE BETWEEN 3600000000 PRECEDING
                      AND CURRENT ROW) AS BIGINT) AS spv
          FROM d
        )
        SELECT event_id,
               CASE WHEN sv > 0
                    THEN round(CAST(spv AS DOUBLE)
                               / CAST(sv AS DOUBLE), 6)
               END AS roll_vwap
        FROM w
    """
    oracles["bollinger"] = """
        WITH d AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 CAST(round(value*100) AS BIGINT) AS x
          FROM events
        ), w AS (
          SELECT event_id, x,
                 CAST(count(*) OVER win AS BIGINT) AS n,
                 CAST(sum(x) OVER win AS BIGINT) AS sv,
                 CAST(sum(x*x) OVER win AS BIGINT) AS ssv
          FROM d
          WINDOW win AS (PARTITION BY user_id ORDER BY us
                         RANGE BETWEEN 3600000000 PRECEDING
                         AND CURRENT ROW)
        ), m AS (
          SELECT event_id,
                 n*x - sv AS dev,
                 n*ssv - sv*sv AS var_num, n
          FROM w
        )
        SELECT event_id,
               CASE WHEN n >= 2 AND var_num > 0
                    THEN round((CAST(dev AS DOUBLE)
                                / CAST(n AS DOUBLE))
                         / (2.0 * sqrt(CAST(var_num AS DOUBLE)
                            / (CAST(n AS DOUBLE)
                               * (CAST(n AS DOUBLE) - 1.0)))), 6)
               END AS pct_b,
               (dev > 0 AND dev*dev*(n-1) > 4*n*var_num AND n >= 2)
                 AS above_upper,
               (dev < 0 AND dev*dev*(n-1) > 4*n*var_num AND n >= 2)
                 AS below_lower
        FROM m
    """
    oracles["rolling_rsi"] = """
        WITH d AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 CAST(round(value*100) AS BIGINT) AS x
          FROM events
        ), l AS (
          SELECT user_id, event_id, us,
                 x - lag(x) OVER (PARTITION BY user_id
                                  ORDER BY us, event_id) AS diff
          FROM d
        ), g AS (
          SELECT user_id, event_id, us,
                 CAST(CASE WHEN diff > 0 THEN diff ELSE 0 END
                      AS BIGINT) AS gn,
                 CAST(CASE WHEN diff < 0 THEN -diff ELSE 0 END
                      AS BIGINT) AS ls
          FROM l
        ), w AS (
          SELECT event_id,
                 CAST(sum(gn) OVER win AS BIGINT) AS sg,
                 CAST(sum(ls) OVER win AS BIGINT) AS sl
          FROM g
          WINDOW win AS (PARTITION BY user_id ORDER BY us
                         RANGE BETWEEN 3600000000 PRECEDING
                         AND CURRENT ROW)
        )
        SELECT event_id, sg AS rsi_gain, sl AS rsi_loss,
               CASE WHEN sg + sl > 0
                    THEN round(100.0 * CAST(sg AS DOUBLE)
                               / CAST(sg + sl AS DOUBLE), 6)
               END AS rsi
        FROM w
    """
    oracles["competing_risks"] = """
        WITH d AS (
          SELECT event_type AS cohort,
                 CAST(round(value*100) AS BIGINT) // 500 AS dur,
                 event_id % 3 AS cause
          FROM events
        ), per AS (
          SELECT cohort, dur,
                 CAST(sum(CASE WHEN cause = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS d1,
                 CAST(sum(CASE WHEN cause = 2 THEN 1 ELSE 0 END)
                      AS BIGINT) AS d2,
                 CAST(sum(CASE WHEN cause = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_censored
          FROM d GROUP BY cohort, dur
        ), ar AS (
          SELECT *,
                 CAST(sum(d1 + d2 + n_censored)
                      OVER (PARTITION BY cohort) -
                      coalesce(sum(d1 + d2 + n_censored)
                      OVER (PARTITION BY cohort ORDER BY dur
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS BIGINT)
                   AS n_at_risk
          FROM per
        ), st AS (
          SELECT *,
                 list({'t': dur, 'd1': d1, 'd2': d2,
                       'n': n_at_risk})
                   OVER (PARTITION BY cohort ORDER BY dur
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS steps
          FROM ar
        ), folded AS (
          -- field order is LOAD-BEARING: DuckDB 1.0 list_reduce
          -- updates struct accumulator fields sequentially (later
          -- fields see earlier fields' NEW values), so the consumed
          -- state 's' must update LAST; element payload reuses the
          -- accumulator's field names (c1=d1, c2=d2, s=n) because
          -- list_prepend requires identical struct types
          SELECT cohort, dur, n_at_risk, d1, d2, n_censored,
                 list_reduce(
                   list_prepend(
                     {'c1': CAST(0.0 AS DOUBLE),
                      'c2': CAST(0.0 AS DOUBLE),
                      's': CAST(1.0 AS DOUBLE)},
                     list_transform(list_sort(steps), e ->
                       {'c1': CAST(e.d1 AS DOUBLE),
                        'c2': CAST(e.d2 AS DOUBLE),
                        's': CAST(e.n AS DOUBLE)})),
                   (acc, x) -> {
                     'c1': acc.c1 + acc.s * (x.c1 / x.s),
                     'c2': acc.c2 + acc.s * (x.c2 / x.s),
                     's': acc.s * (1.0 - (x.c1 + x.c2) / x.s)})
                   AS fin
          FROM st
        )
        SELECT cohort AS event_type, dur, n_at_risk, d1, d2,
               n_censored,
               round(fin.s, 6) AS surv,
               round(fin.c1, 6) AS cif1,
               round(fin.c2, 6) AS cif2
        FROM folded
    """
    oracles["rate_decomposition"] = """
        WITH d AS (
          SELECT user_id % 5 AS seg,
                 CASE WHEN CAST(round(value*100) AS BIGINT) > 1000
                      THEN 1 ELSE 0 END AS y,
                 CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                      THEN 1 ELSE 0 END AS r
          FROM events WHERE user_id IS NOT NULL
        ), per AS (
          SELECT seg,
                 CAST(sum(r) AS BIGINT) AS nr,
                 CAST(sum(r*y) AS BIGINT) AS yr,
                 CAST(sum(1-r) AS BIGINT) AS nc,
                 CAST(sum((1-r)*y) AS BIGINT) AS yc
          FROM d GROUP BY seg
        ), tot AS (
          SELECT CAST(sum(nr) AS BIGINT) AS n_ref,
                 CAST(sum(nc) AS BIGINT) AS n_cur,
                 CAST(sum(yr) AS BIGINT) AS y_ref,
                 CAST(sum(yc) AS BIGINT) AS y_cur
          FROM per
        ), terms AS (
          SELECT per.seg,
                 CAST(per.nr AS DOUBLE) / CAST(tot.n_ref AS DOUBLE)
                   AS wr,
                 CAST(per.nc AS DOUBLE) / CAST(tot.n_cur AS DOUBLE)
                   AS wc,
                 coalesce(CASE WHEN per.nr > 0
                               THEN CAST(per.yr AS DOUBLE)
                                    / CAST(per.nr AS DOUBLE) END,
                          CASE WHEN per.nc > 0
                               THEN CAST(per.yc AS DOUBLE)
                                    / CAST(per.nc AS DOUBLE) END)
                   AS rr,
                 coalesce(CASE WHEN per.nc > 0
                               THEN CAST(per.yc AS DOUBLE)
                                    / CAST(per.nc AS DOUBLE) END,
                          CASE WHEN per.nr > 0
                               THEN CAST(per.yr AS DOUBLE)
                                    / CAST(per.nr AS DOUBLE) END)
                   AS rc
          FROM per, tot
        ), folded AS (
          SELECT
            list_reduce(list_prepend(0.0,
              list((wc - wr) * (rc + rr) / 2.0 ORDER BY seg)),
              (acc, x) -> acc + x) AS mix_effect,
            list_reduce(list_prepend(0.0,
              list((rc - rr) * (wc + wr) / 2.0 ORDER BY seg)),
              (acc, x) -> acc + x) AS rate_effect
          FROM terms
        )
        SELECT tot.n_ref, tot.n_cur,
               CASE WHEN tot.n_ref > 0
                    THEN round(CAST(tot.y_ref AS DOUBLE)
                               / CAST(tot.n_ref AS DOUBLE), 6)
               END AS rate_ref,
               CASE WHEN tot.n_cur > 0
                    THEN round(CAST(tot.y_cur AS DOUBLE)
                               / CAST(tot.n_cur AS DOUBLE), 6)
               END AS rate_cur,
               CASE WHEN tot.n_ref > 0 AND tot.n_cur > 0
                    THEN round(CAST(tot.y_cur AS DOUBLE)
                               / CAST(tot.n_cur AS DOUBLE)
                             - CAST(tot.y_ref AS DOUBLE)
                               / CAST(tot.n_ref AS DOUBLE), 6)
               END AS delta,
               CASE WHEN tot.n_ref > 0 AND tot.n_cur > 0
                    THEN round(folded.mix_effect, 6)
               END AS mix_effect,
               CASE WHEN tot.n_ref > 0 AND tot.n_cur > 0
                    THEN round(folded.rate_effect, 6)
               END AS rate_effect
        FROM tot, folded
    """
    oracles["by_adjust"] = """
        WITH d AS (
          SELECT DISTINCT CAST(json_extract_string(props, '$.k')
                               AS BIGINT) AS k
          FROM events
          WHERE json_extract_string(props, '$.k') IS NOT NULL
        ), h AS (
          SELECT 'h' || CAST(k AS VARCHAR) AS key,
                 CAST((k * 37) % 1000 AS DOUBLE) / 1000.0 AS p
          FROM d
        ), ranked AS (
          SELECT key, p,
                 CAST(row_number() OVER (ORDER BY p, key)
                      AS BIGINT) AS rank,
                 CAST(count(*) OVER () AS BIGINT) AS m
          FROM h
        ), harm AS (
          SELECT list_reduce(list_prepend(0.0,
                   list(1.0 / CAST(rank AS DOUBLE) ORDER BY rank)),
                 (acc, x) -> acc + x) AS c
          FROM ranked
        ), thr AS (
          SELECT r.key, r.p, r.rank, r.m,
                 CAST(r.rank AS DOUBLE) * 0.05
                   / (CAST(r.m AS DOUBLE) * harm.c) AS by_threshold
          FROM ranked r, harm
        ), hit AS (
          SELECT max(CASE WHEN p <= by_threshold THEN rank END)
                   AS kstar
          FROM thr
        )
        SELECT t.key, round(t.p, 6) AS p, t.rank, t.m,
               round(t.by_threshold, 9) AS by_threshold,
               CASE WHEN hit.kstar IS NULL THEN FALSE
                    ELSE t.rank <= hit.kstar END AS reject
        FROM thr t, hit
    """
    oracles["lexicon_sentiment"] = """
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN trim(lower(text)) = ''
                      THEN CAST([] AS VARCHAR[])
                      ELSE regexp_split_to_array(trim(lower(text)),
                                                 '\\s+') END AS w
          FROM documents
        ), c AS (
          SELECT doc_id,
                 CAST(len(w) AS BIGINT) AS n_tokens,
                 CAST(len(list_filter(w, x ->
                   list_contains(['good', 'great', 'excellent', 'happy', 'love', 'best', 'nice', 'awesome', 'amazing', 'fantastic', 'wonderful', 'perfect', 'better', 'win', 'success', 'positive', 'enjoy', 'like', 'fast', 'easy'], x))) AS BIGINT) AS n_pos,
                 CAST(len(list_filter(w, x ->
                   list_contains(['bad', 'terrible', 'awful', 'sad', 'hate', 'worst', 'poor', 'horrible', 'broken', 'fail', 'failure', 'negative', 'slow', 'hard', 'wrong', 'problem', 'bug', 'error', 'worse', 'angry'], x))) AS BIGINT) AS n_neg
          FROM t
        )
        SELECT doc_id, n_tokens, n_pos, n_neg,
               CASE WHEN n_tokens > 0
                    THEN round(CAST(n_pos - n_neg AS DOUBLE)
                               / CAST(n_tokens AS DOUBLE), 6)
               END AS sentiment
        FROM c
    """
    oracles["rake_keywords"] = """
        WITH words AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text),
                                           '[a-z0-9]+')) AS w,
                 generate_subscripts(regexp_extract_all(lower(text),
                                     '[a-z0-9]+'), 1) AS pos
          FROM documents
        ), kept AS (
          SELECT doc_id, w, pos,
                 pos - row_number() OVER (PARTITION BY doc_id
                                          ORDER BY pos) AS grp
          FROM words
          WHERE NOT list_contains(['the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it', 'that', 'for', 'on', 'with', 'as', 'this', 'by', 'at', 'be', 'are'], w)
        ), ph AS (
          SELECT *,
                 CAST(count(*) OVER (PARTITION BY doc_id, grp)
                      AS BIGINT) AS ph_len
          FROM kept
        ), scored AS (
          SELECT *,
                 CAST(count(*) OVER (PARTITION BY doc_id, w)
                      AS BIGINT) AS freq,
                 CAST(sum(ph_len) OVER (PARTITION BY doc_id, w)
                      AS BIGINT) AS deg
          FROM ph
        ), per_phrase AS (
          SELECT doc_id, grp,
                 string_agg(w, ' ' ORDER BY pos) AS phrase,
                 CAST(count(*) AS BIGINT) AS n_words,
                 list_reduce(list_prepend(0.0,
                   list(CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE)
                        ORDER BY pos)),
                   (acc, x) -> acc + x) AS score
          FROM scored GROUP BY doc_id, grp
        ), ranked AS (
          SELECT doc_id, phrase, n_words, score,
                 CAST(row_number() OVER (PARTITION BY doc_id
                      ORDER BY score DESC, phrase ASC, grp ASC)
                      AS BIGINT) AS rank
          FROM per_phrase
        )
        SELECT doc_id, phrase, n_words, round(score, 6) AS score,
               rank
        FROM ranked WHERE rank <= 3
    """
    oracles["event_study"] = """
        WITH base AS (
          SELECT user_id AS e, epoch_us(ts) AS us,
                 CAST(round(value*100) AS BIGINT) AS v,
                 event_type = 'purchase' AS f
          FROM events
        ), anchors AS (
          SELECT e AS ae, us AS aus FROM base WHERE f
        ), joined AS (
          SELECT b.v,
                 CAST(floor(CAST(b.us - a.aus AS DOUBLE)
                            / 3600000000.0) AS BIGINT) AS bucket
          FROM base b JOIN anchors a
            ON b.e = a.ae
           AND b.us >= a.aus - 10800000000
           AND b.us < a.aus + 10800000000 + 3600000000
        ), per_b AS (
          SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(v) AS BIGINT) AS sum_v
          FROM joined GROUP BY bucket
        ), gl AS (
          SELECT CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   AS gmean
          FROM base
        )
        SELECT bucket, n, sum_v,
               round(CAST(sum_v AS DOUBLE) / CAST(n AS DOUBLE), 6)
                 AS mean_v,
               round(CAST(sum_v AS DOUBLE) / CAST(n AS DOUBLE)
                     - gl.gmean, 6) AS abnormal
        FROM per_b, gl
    """
    oracles["growth_accounting"] = """
        WITH per AS (
          SELECT DISTINCT user_id AS e,
                 epoch_us(ts) // 86400000000 AS p
          FROM events
        ), tagged AS (
          SELECT e, p,
                 lag(p) OVER (PARTITION BY e ORDER BY p) AS prev,
                 lead(p) OVER (PARTITION BY e ORDER BY p) AS nxt
          FROM per
        ), act AS (
          SELECT p AS period,
                 CAST(count(*) AS BIGINT) AS n_active,
                 CAST(sum(CASE WHEN prev IS NULL
                               THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_new,
                 CAST(sum(CASE WHEN prev = p - 1
                               THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_retained,
                 CAST(sum(CASE WHEN prev IS NOT NULL
                               AND prev <> p - 1
                               THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_resurrected
          FROM tagged GROUP BY p
        ), churn AS (
          SELECT p + 1 AS period,
                 CAST(count(*) AS BIGINT) AS n_churned
          FROM tagged
          WHERE nxt IS NULL OR nxt > p + 1
          GROUP BY p + 1
        )
        SELECT CAST(coalesce(a.period, c.period) AS BIGINT)
                 AS period,
               CAST(coalesce(a.n_active, 0) AS BIGINT) AS n_active,
               CAST(coalesce(a.n_new, 0) AS BIGINT) AS n_new,
               CAST(coalesce(a.n_retained, 0) AS BIGINT)
                 AS n_retained,
               CAST(coalesce(a.n_resurrected, 0) AS BIGINT)
                 AS n_resurrected,
               CAST(coalesce(c.n_churned, 0) AS BIGINT)
                 AS n_churned
        FROM act a FULL OUTER JOIN churn c ON a.period = c.period
    """
    oracles["hbos"] = """
        WITH d AS (
          SELECT event_id,
                 CAST(round(value*100) AS BIGINT) AS f0,
                 CAST(json_extract_string(props, '$.k') AS BIGINT)
                   AS f1
          FROM events
        ),
        a_pv AS (
          SELECT f0 AS v, CAST(count(*) AS BIGINT) AS t
          FROM d WHERE f0 IS NOT NULL GROUP BY v
        ), a_bm AS (
          SELECT v,
                 (10 * coalesce(sum(t) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0)) // (sum(t) OVER ()) AS b
          FROM a_pv
        ), a_dn AS (
          SELECT b, CAST(sum(t) AS BIGINT) AS c,
                 CAST(max(v) - min(v) + 1 AS BIGINT) AS w
          FROM a_pv JOIN a_bm USING (v) GROUP BY b
        ), a_dx AS (
          SELECT max(CAST(c AS DOUBLE) / CAST(w AS DOUBLE)) AS dm
          FROM a_dn
        ), a_lut AS (
          SELECT m.v, m.b,
                 ln(x.dm / (CAST(n.c AS DOUBLE)
                            / CAST(n.w AS DOUBLE))) AS s
          FROM a_bm m JOIN a_dn n USING (b), a_dx x
        ),
        b_pv AS (
          SELECT f1 AS v, CAST(count(*) AS BIGINT) AS t
          FROM d WHERE f1 IS NOT NULL GROUP BY v
        ), b_bm AS (
          SELECT v,
                 (10 * coalesce(sum(t) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0)) // (sum(t) OVER ()) AS b
          FROM b_pv
        ), b_dn AS (
          SELECT b, CAST(sum(t) AS BIGINT) AS c,
                 CAST(max(v) - min(v) + 1 AS BIGINT) AS w
          FROM b_pv JOIN b_bm USING (v) GROUP BY b
        ), b_dx AS (
          SELECT max(CAST(c AS DOUBLE) / CAST(w AS DOUBLE)) AS dm
          FROM b_dn
        ), b_lut AS (
          SELECT m.v, m.b,
                 ln(x.dm / (CAST(n.c AS DOUBLE)
                            / CAST(n.w AS DOUBLE))) AS s
          FROM b_bm m JOIN b_dn n USING (b), b_dx x
        )
        SELECT d.event_id,
               CAST(a_lut.b AS BIGINT) AS bin_0,
               CAST(b_lut.b AS BIGINT) AS bin_1,
               round((0.0 + coalesce(a_lut.s, 0.0))
                     + coalesce(b_lut.s, 0.0), 6) AS hbos
        FROM d
        LEFT JOIN a_lut ON d.f0 = a_lut.v
        LEFT JOIN b_lut ON d.f1 = b_lut.v
    """
    oracles["mahalanobis"] = """
        WITH d AS (
          SELECT event_id,
                 CAST(round(value*100) AS BIGINT) AS x,
                 CAST(json_extract_string(props, '$.k') AS BIGINT)
                   AS y
          FROM events
          WHERE value IS NOT NULL
            AND json_extract_string(props, '$.k') IS NOT NULL
        ), agg AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x*x) AS BIGINT) AS sxx,
                 CAST(sum(y*y) AS BIGINT) AS syy,
                 CAST(sum(x*y) AS BIGINT) AS sxy
          FROM d
        ), m AS (
          SELECT d.event_id, d.x, d.y, agg.n,
                 CAST(agg.sxx AS DOUBLE) - CAST(agg.sx AS DOUBLE)
                   * CAST(agg.sx AS DOUBLE)
                   / CAST(agg.n AS DOUBLE) AS cxx,
                 CAST(agg.syy AS DOUBLE) - CAST(agg.sy AS DOUBLE)
                   * CAST(agg.sy AS DOUBLE)
                   / CAST(agg.n AS DOUBLE) AS cyy,
                 CAST(agg.sxy AS DOUBLE) - CAST(agg.sx AS DOUBLE)
                   * CAST(agg.sy AS DOUBLE)
                   / CAST(agg.n AS DOUBLE) AS cxy,
                 CAST(d.x AS DOUBLE) - CAST(agg.sx AS DOUBLE)
                   / CAST(agg.n AS DOUBLE) AS dx,
                 CAST(d.y AS DOUBLE) - CAST(agg.sy AS DOUBLE)
                   / CAST(agg.n AS DOUBLE) AS dy
          FROM d, agg
        )
        SELECT event_id, x, y,
               CASE WHEN n >= 3 AND cxx * cyy - cxy * cxy > 0.0
                    THEN round((cyy * dx * dx
                                - 2.0 * cxy * dx * dy
                                + cxx * dy * dy)
                         * (CAST(n AS DOUBLE) - 1.0)
                         / (cxx * cyy - cxy * cxy), 6)
               END AS d2
        FROM m
    """
    oracles["js_encode"] = """
        WITH d AS (
          SELECT event_id AS id, event_type AS category,
                 CAST(round(value*100) AS BIGINT) AS y
          FROM events
        ), per AS (
          SELECT category, CAST(count(*) AS BIGINT) AS n_c,
                 CAST(sum(y) AS BIGINT) AS s_c,
                 CAST(sum(y*y) AS BIGINT) AS q_c
          FROM d WHERE y IS NOT NULL GROUP BY category
        ), gl AS (
          SELECT CAST(sum(n_c) AS BIGINT) AS n,
                 CAST(sum(s_c) AS BIGINT) AS s,
                 CAST(count(*) AS BIGINT) AS k,
                 list_reduce(list_prepend(0.0,
                   list(CAST(q_c AS DOUBLE) - CAST(s_c AS DOUBLE)
                        * CAST(s_c AS DOUBLE)
                        / CAST(n_c AS DOUBLE) ORDER BY category)),
                   (acc, x) -> acc + x) AS ssw
          FROM per
        ), g2 AS (
          SELECT *,
                 CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS gmean,
                 CASE WHEN n > k
                      THEN ssw / (CAST(n AS DOUBLE)
                                  - CAST(k AS DOUBLE))
                      ELSE 0.0 END AS s2
          FROM gl
        ), tau AS (
          SELECT g2.s2, g2.gmean, g2.n, g2.k,
                 CASE WHEN g2.k >= 2 THEN greatest(0.0,
                   list_reduce(list_prepend(0.0,
                     list((CAST(per.s_c AS DOUBLE)
                           / CAST(per.n_c AS DOUBLE) - g2.gmean)
                          * (CAST(per.s_c AS DOUBLE)
                             / CAST(per.n_c AS DOUBLE) - g2.gmean)
                          ORDER BY per.category)),
                     (acc, x) -> acc + x)
                   / (CAST(g2.k AS DOUBLE) - 1.0))
                 ELSE 0.0 END AS tau2
          FROM per, g2
          GROUP BY g2.s2, g2.gmean, g2.n, g2.k
        ), enc AS (
          SELECT per.category, per.n_c,
                 CASE WHEN tau.s2 / CAST(per.n_c AS DOUBLE)
                           + tau.tau2 > 0.0
                      THEN (tau.s2 / CAST(per.n_c AS DOUBLE))
                           / (tau.s2 / CAST(per.n_c AS DOUBLE)
                              + tau.tau2)
                      ELSE 1.0 END AS b,
                 tau.gmean,
                 CAST(per.s_c AS DOUBLE) / CAST(per.n_c AS DOUBLE)
                   AS mean_c
          FROM per, tau
        )
        SELECT d.id AS event_id, d.category, d.y, enc.n_c,
               round(enc.b, 9) AS b_shrink,
               round((1.0 - enc.b) * enc.mean_c
                     + enc.b * enc.gmean, 6) AS js
        FROM d LEFT JOIN enc ON d.category = enc.category
    """
    oracles["two_prop"] = """
        WITH d AS (
          SELECT CASE WHEN CAST(json_extract_string(props, '$.k')
                            AS BIGINT) >= 50 THEN 1 ELSE 0 END AS f,
                 CASE WHEN CAST(round(value*100) AS BIGINT) > 1000
                      THEN 1 ELSE 0 END AS y
          FROM events
          WHERE json_extract_string(props, '$.k') IS NOT NULL
            AND value IS NOT NULL
        ), s AS (
          SELECT CAST(sum(f) AS BIGINT) AS n1,
                 CAST(sum(f*y) AS BIGINT) AS x1,
                 CAST(sum(1-f) AS BIGINT) AS n0,
                 CAST(sum((1-f)*y) AS BIGINT) AS x0
          FROM d
        ), m AS (
          SELECT *,
                 CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
                 CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
                 (CAST(x1 AS DOUBLE) + CAST(x0 AS DOUBLE))
                   / (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE)) AS pp
          FROM s
        ), r AS (
          SELECT *,
                 pp * (1.0 - pp) * (1.0 / CAST(n1 AS DOUBLE)
                                    + 1.0 / CAST(n0 AS DOUBLE))
                   AS se2
          FROM m
        )
        SELECT n1, x1, n0, x0,
               CASE WHEN n1 > 0 THEN round(p1, 6) END AS p1,
               CASE WHEN n0 > 0 THEN round(p0, 6) END AS p0,
               CASE WHEN n1 > 0 AND n0 > 0 AND se2 > 0.0
                    THEN round((p1 - p0) / sqrt(se2), 6) END AS z,
               CASE WHEN n1 > 0 THEN round(
                 ((p1 + 1.96*1.96 / (2.0 * CAST(n1 AS DOUBLE)))
                  - 1.96 * sqrt(p1 * (1.0 - p1)
                                / CAST(n1 AS DOUBLE)
                      + 1.96*1.96 / (4.0 * CAST(n1 AS DOUBLE)
                                     * CAST(n1 AS DOUBLE))))
                 / (1.0 + 1.96*1.96 / CAST(n1 AS DOUBLE)), 6)
               END AS p1_lo,
               CASE WHEN n1 > 0 THEN round(
                 ((p1 + 1.96*1.96 / (2.0 * CAST(n1 AS DOUBLE)))
                  + 1.96 * sqrt(p1 * (1.0 - p1)
                                / CAST(n1 AS DOUBLE)
                      + 1.96*1.96 / (4.0 * CAST(n1 AS DOUBLE)
                                     * CAST(n1 AS DOUBLE))))
                 / (1.0 + 1.96*1.96 / CAST(n1 AS DOUBLE)), 6)
               END AS p1_hi,
               CASE WHEN n0 > 0 THEN round(
                 ((p0 + 1.96*1.96 / (2.0 * CAST(n0 AS DOUBLE)))
                  - 1.96 * sqrt(p0 * (1.0 - p0)
                                / CAST(n0 AS DOUBLE)
                      + 1.96*1.96 / (4.0 * CAST(n0 AS DOUBLE)
                                     * CAST(n0 AS DOUBLE))))
                 / (1.0 + 1.96*1.96 / CAST(n0 AS DOUBLE)), 6)
               END AS p0_lo,
               CASE WHEN n0 > 0 THEN round(
                 ((p0 + 1.96*1.96 / (2.0 * CAST(n0 AS DOUBLE)))
                  + 1.96 * sqrt(p0 * (1.0 - p0)
                                / CAST(n0 AS DOUBLE)
                      + 1.96*1.96 / (4.0 * CAST(n0 AS DOUBLE)
                                     * CAST(n0 AS DOUBLE))))
                 / (1.0 + 1.96*1.96 / CAST(n0 AS DOUBLE)), 6)
               END AS p0_hi
        FROM r
    """
    oracles["poisson_rate"] = """
        WITH per AS (
          SELECT user_id % 2 AS f,
                 CAST(sum(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT) AS x,
                 CAST(count(*) AS BIGINT) AS e
          FROM events WHERE user_id IS NOT NULL GROUP BY user_id
        ), s AS (
          SELECT CAST(sum(f*x) AS BIGINT) AS x1,
                 CAST(sum(f*e) AS BIGINT) AS e1,
                 CAST(sum((1-f)*x) AS BIGINT) AS x0,
                 CAST(sum((1-f)*e) AS BIGINT) AS e0
          FROM per
        )
        SELECT x1, e1, x0, e0,
               CASE WHEN e1 > 0 AND e0 > 0 AND x0 > 0
                    THEN round((CAST(x1 AS DOUBLE)
                                / CAST(e1 AS DOUBLE))
                         / (CAST(x0 AS DOUBLE)
                            / CAST(e0 AS DOUBLE)), 6) END AS rr,
               CASE WHEN e1 > 0 AND e0 > 0 AND x0 > 0 AND x1 > 0
                    THEN round(ln((CAST(x1 AS DOUBLE)
                                   / CAST(e1 AS DOUBLE))
                              / (CAST(x0 AS DOUBLE)
                                 / CAST(e0 AS DOUBLE)))
                         / sqrt(1.0 / CAST(x1 AS DOUBLE)
                                + 1.0 / CAST(x0 AS DOUBLE)), 6)
               END AS z
        FROM s
    """
    oracles["holm_adjust"] = """
        WITH d AS (
          SELECT DISTINCT CAST(json_extract_string(props, '$.k')
                               AS BIGINT) AS k
          FROM events
          WHERE json_extract_string(props, '$.k') IS NOT NULL
        ), h AS (
          SELECT 'h' || CAST(k AS VARCHAR) AS key,
                 CAST((k * 37) % 1000 AS DOUBLE) / 1000.0 AS p
          FROM d
        ), ranked AS (
          SELECT key, p,
                 CAST(row_number() OVER (ORDER BY p, key)
                      AS BIGINT) AS rank,
                 CAST(count(*) OVER () AS BIGINT) AS m
          FROM h
        ), thr AS (
          SELECT *, 0.05 / CAST(m - rank + 1 AS DOUBLE)
                   AS holm_threshold
          FROM ranked
        ), ff AS (
          SELECT min(CASE WHEN p > holm_threshold THEN rank END)
                   AS first_fail
          FROM thr
        )
        SELECT t.key, round(t.p, 6) AS p, t.rank, t.m,
               round(t.holm_threshold, 9) AS holm_threshold,
               CASE WHEN ff.first_fail IS NULL THEN TRUE
                    ELSE t.rank < ff.first_fail END AS reject
        FROM thr t, ff
    """
    oracles["chao1"] = """
        WITH toks AS (
          SELECT unnest(CASE WHEN trim(lower(text)) = ''
                             THEN CAST([] AS VARCHAR[])
                             ELSE regexp_split_to_array(
                                    trim(lower(text)), '\\s+')
                        END) AS t
          FROM documents
        ), vocab AS (
          SELECT t, CAST(count(*) AS BIGINT) AS c
          FROM toks GROUP BY t
        ), agg AS (
          SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
                 CAST(count(*) AS BIGINT) AS s,
                 CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS f1,
                 CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)
                      AS BIGINT) AS f2
          FROM vocab
        )
        SELECT n_tokens, s AS s_observed, f1, f2,
               round(CAST(s AS DOUBLE)
                     + CAST(f1 AS DOUBLE)
                       * (CAST(f1 AS DOUBLE) - 1.0)
                       / (2.0 * (CAST(f2 AS DOUBLE) + 1.0)), 6)
                 AS chao1
        FROM agg
    """
    oracles["lincoln_petersen"] = """
        WITH a AS (
          SELECT DISTINCT user_id AS k FROM events
          WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
        ), b AS (
          SELECT DISTINCT user_id AS k FROM events
          WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
        ), s AS (
          SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_a,
                 (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_b,
                 (SELECT CAST(count(*) AS BIGINT) FROM a
                  WHERE k IN (SELECT k FROM b)) AS n_overlap
        )
        SELECT n_a, n_b, n_overlap,
               round((CAST(n_a AS DOUBLE) + 1.0)
                     * (CAST(n_b AS DOUBLE) + 1.0)
                     / (CAST(n_overlap AS DOUBLE) + 1.0) - 1.0, 6)
                 AS n_hat,
               round((CAST(n_a AS DOUBLE) + 1.0)
                     * (CAST(n_b AS DOUBLE) + 1.0)
                     * (CAST(n_a AS DOUBLE)
                        - CAST(n_overlap AS DOUBLE))
                     * (CAST(n_b AS DOUBLE)
                        - CAST(n_overlap AS DOUBLE))
                     / ((CAST(n_overlap AS DOUBLE) + 1.0)
                        * (CAST(n_overlap AS DOUBLE) + 1.0)
                        * (CAST(n_overlap AS DOUBLE) + 2.0)), 6)
                 AS var_hat
        FROM s
    """
    oracles["crossmodal_mi"] = f"""
        WITH px AS (
          SELECT o_orderkey AS okey,
                 CAST(sum((((o_orderkey*7919 + (y*24 + x*3 + 0)*31) % 256) + ((o_orderkey*7919 + (y*24 + x*3 + 1)*31) % 256) + ((o_orderkey*7919 + (y*24 + x*3 + 2)*31) % 256))) AS BIGINT) AS bt
          FROM orders,
               unnest(generate_series(0, 7)) AS ty(y),
               unnest(generate_series(0, 7)) AS tx(x)
          GROUP BY o_orderkey
        ), pair AS (
          SELECT (px.bt % 1000) // 100 AS x,
                 (length(d.text) % 200) // 20 AS y
          FROM px JOIN documents d ON px.okey % 500 = d.doc_id
        ), d AS (
          SELECT 1 AS g, CAST(x AS BIGINT) AS x,
                 CAST(y AS BIGINT) AS y
          FROM pair
        ), {_mi_sql_ctes("mi_t", "d", ["g"])}, dims AS (
          SELECT CAST(count(DISTINCT x) AS BIGINT) AS r,
                 CAST(count(DISTINCT y) AS BIGINT) AS c
          FROM d
        ), hx_cells AS (
          SELECT x, CAST(count(*) AS BIGINT) AS cx FROM d GROUP BY x
        ), hx_g AS (
          SELECT CAST(sum(cx) AS BIGINT) AS n2,
                 list_sort(list({{'x': x, 'cx': cx}})) AS cl
          FROM hx_cells
        ), hx AS (
          SELECT n2,
                 list_reduce(list_prepend(0.0, list_transform(cl,
                   s -> (CAST(s.cx AS DOUBLE) / CAST(n2 AS DOUBLE))
                   * ln(CAST(n2 AS DOUBLE)
                        / CAST(s.cx AS DOUBLE)))),
                   (acc, t) -> acc + t) AS h_x
          FROM hx_g
        )
        SELECT mi_t.n, round(mi_t.mi, 6) AS mi,
               CASE WHEN (dims.r - 1) * (dims.c - 1) > 0
                    THEN round(2.0 * CAST(mi_t.n AS DOUBLE)
                               * mi_t.mi, 6) END AS g_stat,
               CAST((dims.r - 1) * (dims.c - 1) AS BIGINT) AS df,
               CASE WHEN hx.h_x > 0.0
                    THEN round(mi_t.mi / hx.h_x, 6) END AS theils_u
        FROM mi_t, dims, hx
    """
    oracles["qini"] = """
        WITH d AS (
          SELECT event_id,
                 CAST(json_extract_string(props, '$.k') AS BIGINT)
                   AS s,
                 event_id % 2 AS t,
                 CASE WHEN CAST(round(value*100) AS BIGINT) > 1000
                      THEN 1 ELSE 0 END AS y
          FROM events
          WHERE json_extract_string(props, '$.k') IS NOT NULL
            AND value IS NOT NULL
        ), b AS (
          SELECT t, y,
                 ntile(10) OVER (ORDER BY s DESC, event_id ASC)
                   AS bucket
          FROM d
        ), per AS (
          SELECT bucket,
                 CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_t,
                 CAST(sum(CASE WHEN t = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_c,
                 CAST(sum(CASE WHEN t = 1 THEN y ELSE 0 END)
                      AS BIGINT) AS r_t,
                 CAST(sum(CASE WHEN t = 0 THEN y ELSE 0 END)
                      AS BIGINT) AS r_c
          FROM b GROUP BY bucket
        ), cur AS (
          SELECT bucket,
                 CAST(sum(n_t) OVER wc AS BIGINT) AS cnt,
                 CAST(sum(n_c) OVER wc AS BIGINT) AS cnc,
                 CAST(sum(r_t) OVER wc AS BIGINT) AS crt,
                 CAST(sum(r_c) OVER wc AS BIGINT) AS crc,
                 CAST(sum(n_t) OVER () AS BIGINT) AS tnt,
                 CAST(sum(n_c) OVER () AS BIGINT) AS tnc,
                 CAST(sum(r_t) OVER () AS BIGINT) AS trt,
                 CAST(sum(r_c) OVER () AS BIGINT) AS trc
          FROM per
          WINDOW wc AS (ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW)
        ), m AS (
          SELECT bucket, cnt, cnc, crt, crc,
                 CASE WHEN cnc > 0
                      THEN CAST(crt AS DOUBLE)
                           - CAST(crc AS DOUBLE)
                             * (CAST(cnt AS DOUBLE)
                                / CAST(cnc AS DOUBLE)) END AS qini,
                 CASE WHEN tnc > 0
                      THEN (CAST(trt AS DOUBLE)
                            - CAST(trc AS DOUBLE)
                              * (CAST(tnt AS DOUBLE)
                                 / CAST(tnc AS DOUBLE)))
                           * ((CAST(cnt AS DOUBLE)
                               + CAST(cnc AS DOUBLE))
                              / (CAST(tnt AS DOUBLE)
                                 + CAST(tnc AS DOUBLE)))
                 END AS random_line
          FROM cur
        )
        SELECT bucket, cnt AS cn_t, cnc AS cn_c, crt AS cr_t,
               crc AS cr_c,
               round(qini, 6) AS qini,
               round(random_line, 6) AS random_line,
               round(qini - random_line, 6) AS gap
        FROM m
    """
    oracles["psi_by_feature"] = """
        WITH ev AS (
          SELECT *, CAST(round(value*100) AS BIGINT) AS cents
          FROM events
        ), long AS (
          SELECT 'cents_bucket' AS feature,
                 least(cents // 200, 24) AS bucket, ts FROM ev
          UNION ALL
          SELECT 'hour', CAST(hour(ts) AS BIGINT), ts FROM ev
          UNION ALL
          SELECT 'user_mod', CAST(user_id % 20 AS BIGINT), ts
          FROM ev
          UNION ALL
          SELECT 'event_mod', CAST(event_id % 16 AS BIGINT), ts
          FROM ev
        ), q AS (
          SELECT feature, bucket,
                 CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                      THEN 1 ELSE 0 END AS is_ref
          FROM long
        ), pb AS (
          SELECT feature, bucket,
                 SUM(is_ref) AS cr, SUM(1 - is_ref) AS cc
          FROM q GROUP BY feature, bucket
        ), pk AS (
          SELECT feature,
                 CAST(SUM(cr) AS BIGINT) AS n_ref,
                 CAST(SUM(cc) AS BIGINT) AS n_cur,
                 COUNT(*) AS nb,
                 list_sort(list({'b': bucket, 'cr': cr, 'cc': cc}))
                   AS bl
          FROM pb GROUP BY feature
        )
        SELECT feature, n_ref, n_cur,
               round(list_reduce(
                 list_prepend(0.0, list_transform(bl, x ->
                   ((CAST(x.cc AS DOUBLE) + 1.0)
                      / (CAST(n_cur AS DOUBLE) + nb)
                    - (CAST(x.cr AS DOUBLE) + 1.0)
                      / (CAST(n_ref AS DOUBLE) + nb))
                   * ln(((CAST(x.cc AS DOUBLE) + 1.0)
                           / (CAST(n_cur AS DOUBLE) + nb))
                      / ((CAST(x.cr AS DOUBLE) + 1.0)
                           / (CAST(n_ref AS DOUBLE) + nb))))),
                 (acc, x) -> acc + x), 6) AS psi
        FROM pk
    """
    oracles["partial_corr"] = """
        WITH d AS (
          SELECT CAST(round(value*100) AS BIGINT) AS x,
                 CAST(json_extract_string(props, '$.k') AS BIGINT)
                   * 5 + CAST(round(value*100) AS BIGINT) // 100
                   AS y,
                 CAST(json_extract_string(props, '$.k') AS BIGINT)
                   AS z
          FROM events
          WHERE value IS NOT NULL
            AND json_extract_string(props, '$.k') IS NOT NULL
        ), s AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(z) AS BIGINT) AS sz,
                 CAST(sum(x*x) AS BIGINT) AS sxx,
                 CAST(sum(y*y) AS BIGINT) AS syy,
                 CAST(sum(z*z) AS BIGINT) AS szz,
                 CAST(sum(x*y) AS BIGINT) AS sxy,
                 CAST(sum(x*z) AS BIGINT) AS sxz,
                 CAST(sum(y*z) AS BIGINT) AS syz
          FROM d
        ), m AS (
          SELECT n,
                 CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                   * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS cxx,
                 CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                   * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS cyy,
                 CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE)
                   * CAST(sz AS DOUBLE) / CAST(n AS DOUBLE) AS czz,
                 CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                   * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS cxy,
                 CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE)
                   * CAST(sz AS DOUBLE) / CAST(n AS DOUBLE) AS cxz,
                 CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE)
                   * CAST(sz AS DOUBLE) / CAST(n AS DOUBLE) AS cyz
          FROM s
        ), r AS (
          SELECT n,
                 CASE WHEN cxx > 0.0 AND cyy > 0.0 AND czz > 0.0
                      THEN cxy / sqrt(cxx * cyy) END AS rxy,
                 CASE WHEN cxx > 0.0 AND cyy > 0.0 AND czz > 0.0
                      THEN cxz / sqrt(cxx * czz) END AS rxz,
                 CASE WHEN cxx > 0.0 AND cyy > 0.0 AND czz > 0.0
                      THEN cyz / sqrt(cyy * czz) END AS ryz
          FROM m
        )
        SELECT n, round(rxy, 6) AS r_xy, round(rxz, 6) AS r_xz,
               round(ryz, 6) AS r_yz,
               CASE WHEN (1.0 - rxz * rxz) * (1.0 - ryz * ryz) > 0.0
                    THEN round((rxy - rxz * ryz)
                         / sqrt((1.0 - rxz * rxz)
                                * (1.0 - ryz * ryz)), 6)
               END AS r_xy_z
        FROM r
    """
    oracles["covariate_balance"] = """
        WITH d AS (
          SELECT CASE WHEN CAST(json_extract_string(props, '$.k')
                            AS BIGINT) >= 50
                      THEN 1 ELSE 0 END AS t,
                 CAST(round(value*100) AS BIGINT) AS c0,
                 CAST(hour(ts) AS BIGINT) AS c1,
                 CAST(user_id % 20 AS BIGINT) AS c2
          FROM events
          WHERE json_extract_string(props, '$.k') IS NOT NULL
        ), stats AS (
          SELECT CAST(sum(t) AS BIGINT) AS n1,
                 CAST(sum(1-t) AS BIGINT) AS n0,
                 CAST(sum(t*c0) AS BIGINT) AS s1_0,
                 CAST(sum(t*c0*c0) AS BIGINT) AS q1_0,
                 CAST(sum((1-t)*c0) AS BIGINT) AS s0_0,
                 CAST(sum((1-t)*c0*c0) AS BIGINT) AS q0_0,
                 CAST(sum(t*c1) AS BIGINT) AS s1_1,
                 CAST(sum(t*c1*c1) AS BIGINT) AS q1_1,
                 CAST(sum((1-t)*c1) AS BIGINT) AS s0_1,
                 CAST(sum((1-t)*c1*c1) AS BIGINT) AS q0_1,
                 CAST(sum(t*c2) AS BIGINT) AS s1_2,
                 CAST(sum(t*c2*c2) AS BIGINT) AS q1_2,
                 CAST(sum((1-t)*c2) AS BIGINT) AS s0_2,
                 CAST(sum((1-t)*c2*c2) AS BIGINT) AS q0_2
          FROM d
        )
          SELECT 'cents' AS covariate,
                 CAST(0 AS BIGINT) AS ord, n1, n0,
                 CASE WHEN n1 > 0 THEN round(CAST(s1_0 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) END AS mean1,
                 CASE WHEN n0 > 0 THEN round(CAST(s0_0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) END AS mean0,
                 CASE WHEN n1 >= 2 AND n0 >= 2 AND sqrt((((CAST(q1_0 AS DOUBLE) - CAST(s1_0 AS DOUBLE) * CAST(s1_0 AS DOUBLE) / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)) + ((CAST(q0_0 AS DOUBLE) - CAST(s0_0 AS DOUBLE) * CAST(s0_0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1.0))) / 2.0) > 0.0
                      THEN round((CAST(s1_0 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(s0_0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / sqrt((((CAST(q1_0 AS DOUBLE) - CAST(s1_0 AS DOUBLE) * CAST(s1_0 AS DOUBLE) / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)) + ((CAST(q0_0 AS DOUBLE) - CAST(s0_0 AS DOUBLE) * CAST(s0_0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1.0))) / 2.0), 6)
                 END AS smd
          FROM stats
          UNION ALL
          SELECT 'hour' AS covariate,
                 CAST(1 AS BIGINT) AS ord, n1, n0,
                 CASE WHEN n1 > 0 THEN round(CAST(s1_1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) END AS mean1,
                 CASE WHEN n0 > 0 THEN round(CAST(s0_1 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) END AS mean0,
                 CASE WHEN n1 >= 2 AND n0 >= 2 AND sqrt((((CAST(q1_1 AS DOUBLE) - CAST(s1_1 AS DOUBLE) * CAST(s1_1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)) + ((CAST(q0_1 AS DOUBLE) - CAST(s0_1 AS DOUBLE) * CAST(s0_1 AS DOUBLE) / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1.0))) / 2.0) > 0.0
                      THEN round((CAST(s1_1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(s0_1 AS DOUBLE) / CAST(n0 AS DOUBLE)) / sqrt((((CAST(q1_1 AS DOUBLE) - CAST(s1_1 AS DOUBLE) * CAST(s1_1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)) + ((CAST(q0_1 AS DOUBLE) - CAST(s0_1 AS DOUBLE) * CAST(s0_1 AS DOUBLE) / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1.0))) / 2.0), 6)
                 END AS smd
          FROM stats
          UNION ALL
          SELECT 'useg' AS covariate,
                 CAST(2 AS BIGINT) AS ord, n1, n0,
                 CASE WHEN n1 > 0 THEN round(CAST(s1_2 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) END AS mean1,
                 CASE WHEN n0 > 0 THEN round(CAST(s0_2 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) END AS mean0,
                 CASE WHEN n1 >= 2 AND n0 >= 2 AND sqrt((((CAST(q1_2 AS DOUBLE) - CAST(s1_2 AS DOUBLE) * CAST(s1_2 AS DOUBLE) / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)) + ((CAST(q0_2 AS DOUBLE) - CAST(s0_2 AS DOUBLE) * CAST(s0_2 AS DOUBLE) / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1.0))) / 2.0) > 0.0
                      THEN round((CAST(s1_2 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(s0_2 AS DOUBLE) / CAST(n0 AS DOUBLE)) / sqrt((((CAST(q1_2 AS DOUBLE) - CAST(s1_2 AS DOUBLE) * CAST(s1_2 AS DOUBLE) / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)) + ((CAST(q0_2 AS DOUBLE) - CAST(s0_2 AS DOUBLE) * CAST(s0_2 AS DOUBLE) / CAST(n0 AS DOUBLE)) / (CAST(n0 AS DOUBLE) - 1.0))) / 2.0), 6)
                 END AS smd
          FROM stats
    """
    oracles["markov_entropy"] = """
        WITH pairs AS (
          SELECT event_type AS t,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY event_id) AS f
          FROM events
        ), cells AS (
          SELECT f, t, CAST(count(*) AS BIGINT) AS c
          FROM pairs WHERE f IS NOT NULL GROUP BY f, t
        ), m AS (
          SELECT f, t, c,
                 CAST(sum(c) OVER (PARTITION BY f) AS BIGINT) AS cf
          FROM cells
        ), agg AS (
          SELECT CAST(sum(c) AS BIGINT) AS n,
                 CAST(count(DISTINCT f) AS BIGINT) AS n_states,
                 list_sort(list({'f': f, 't': t, 'c': c,
                                 'cf': cf})) AS cl
          FROM m
        )
        SELECT n AS n_transitions, n_states,
               round(list_reduce(list_prepend(0.0,
                 list_transform(cl, e ->
                   (CAST(e.c AS DOUBLE) / CAST(n AS DOUBLE))
                   * ln(CAST(e.cf AS DOUBLE)
                        / CAST(e.c AS DOUBLE)))),
                 (acc, x) -> acc + x), 6) AS entropy_rate
        FROM agg
    """
    return oracles

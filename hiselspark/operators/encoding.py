"""Leakage-free (point-in-time) categorical encodings.

Target encoding is the classic way a feature pipeline leaks its label:
encode a category by the mean of the target computed over the WHOLE
table and every training row has peeked at its own (and its future's)
label.  The point-in-time discipline of this engine (same rule the
as-of join enforces, ``operators/asof.py``) fixes the definition
instead of patching it with folds: the encoding of a row at time ``t``
uses only rows of the same category with timestamp STRICTLY BEFORE
``t`` — rows sharing the exact timestamp are mutually invisible, since
neither label is known at the other's decision time.

Both operators are single-window expressions over one
``(category, ts)`` clustering — at 10^12 rows that is ONE shuffle on
the category key, no self-join, no per-fold passes:

* :func:`target_encode_pit` — expanding strictly-before mean of the
  target per category, smoothed toward a caller-supplied prior with
  pseudo-count ``smoothing`` (the standard m-estimate): ``(sum_before
  + smoothing * prior) / (cnt_before + smoothing)``.  With
  ``smoothing=0`` a category's first-ever row has no defined encoding
  and gets NULL rather than a silently-invented value.
* :func:`count_encode_pit` — strictly-before occurrence count of the
  category (frequency encoding, as-of the row's own timestamp).

The strictly-before set is expressed as a RANGE frame ending one
microsecond before the current row (``unix_micros`` ordering), which
is exactly DuckDB's ``RANGE BETWEEN UNBOUNDED PRECEDING AND 1
PRECEDING`` over the same integer — the driver-gate oracle replays it
verbatim; sums stay exact by quantizing the target to integer units
upstream (the gate convention).
"""
from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window, functions as F


def hash_bucket(col, n_buckets: int, salt: int = 0) -> Column:
    """The hashing trick for unbounded-cardinality categoricals
    (domains, URLs, user agents): deterministic bucket id in
    ``[0, n_buckets)`` from the engine's cross-engine content hash —
    no vocabulary to fit, ship, or keep point-in-time-consistent, so
    it composes with the PIT encodings below (encode the BUCKET) when
    the raw category space is too large to shuffle on."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive: {n_buckets}")
    from .splits import content_hash
    return (content_hash(col, salt) % F.lit(int(n_buckets))).cast("long")


def _micros(ts_col: str) -> Column:
    # via TIMESTAMP to handle TIMESTAMP_NTZ parquet loads (UTC session)
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def _before_frame(category_col: str, ts_col: str):
    return (Window.partitionBy(category_col).orderBy(_micros(ts_col))
            .rangeBetween(Window.unboundedPreceding, -1))


def target_encode_pit(
    df: DataFrame,
    category_col: str,
    target_col: str,
    ts_col: str = "ts",
    prior: float = 0.0,
    smoothing: float = 0.0,
    out_col: str = "te",
) -> DataFrame:
    """Add ``out_col`` = m-estimate target encoding of ``category_col``
    using only same-category rows strictly before ``ts_col``."""
    if smoothing < 0:
        raise ValueError(f"smoothing must be >= 0: {smoothing}")
    w = _before_frame(category_col, ts_col)
    s = F.coalesce(F.sum(target_col).over(w), F.lit(0.0))
    c = F.coalesce(F.count(target_col).over(w), F.lit(0))
    num = s + F.lit(float(smoothing) * float(prior))
    den = c + F.lit(float(smoothing))
    return df.withColumn(
        out_col, F.when(den > 0, num / den).otherwise(F.lit(None)))


def count_encode_pit(
    df: DataFrame,
    category_col: str,
    ts_col: str = "ts",
    out_col: str = "ce",
) -> DataFrame:
    """Add ``out_col`` = number of same-category rows strictly before
    ``ts_col`` (as-of frequency encoding; 0 for a first occurrence)."""
    w = _before_frame(category_col, ts_col)
    return df.withColumn(
        out_col,
        F.coalesce(F.count(F.lit(1)).over(w), F.lit(0)).cast("long"))


def expanding_zscore_pit(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str = "ts",
    out_col: str = "z",
) -> DataFrame:
    """Add ``out_col`` = z-score of ``value_col`` against the mean/std
    of same-key rows STRICTLY before ``ts_col`` — the leakage-free twin
    of a fitted StandardScaler: a training row is normalized only by
    statistics that were observable at its own timestamp (a scaler fit
    on the full table leaks every row's value into its own feature).

    NULL when fewer than 2 earlier rows exist or the earlier values
    are constant (no scale to normalize by — inventing one would hide
    a degenerate feature).  Population (1/n) variance, computed as
    ``E[x^2] - mean^2`` clamped at 0 against float cancellation; with
    an integer-quantized value column the two expanding sums are exact,
    so every engine derives the identical double from identical
    operands (how the driver-gate oracle replays it).

    Same single-shuffle shape as the encodings above: one window over
    one ``(key, ts)`` clustering, stackable with them at no extra
    exchange.
    """
    w = _before_frame(key_col, ts_col)
    v = F.col(value_col).cast("double")
    s = F.sum(value_col).over(w).cast("double")
    ss = F.sum(F.col(value_col) * F.col(value_col)).over(w).cast("double")
    c = F.count(value_col).over(w).cast("double")
    mean = s / c
    var = F.greatest(ss / c - mean * mean, F.lit(0.0))
    std = F.sqrt(var)
    return df.withColumn(
        out_col,
        F.when((c >= 2) & (std > 0), (v - mean) / std)
         .otherwise(F.lit(None)))

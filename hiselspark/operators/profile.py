"""Table profiling and table diffing — the operational endpoints a
snapshot-based pipeline runs before/after every big write.

* :func:`profile_table` — one pass over the table producing one
  metrics row PER COLUMN (nulls, distincts, min/max where ordered) —
  the input to data-quality dashboards and to
  ``operators/expectations`` rule tuning.
* :func:`table_diff` — key-based reconciliation of two table versions
  (old snapshot vs new): counts of added / removed / changed /
  unchanged rows, with change detection over all non-key columns via
  a null-safe struct comparison.  This is how a copy-on-write upsert
  or a backfill is AUDITED: the expected delta, stated as four
  integers any engine can recompute.

Both are pure aggregates: profile is ONE map-side-combined pass
(approx distinct per column rides the same pass as HLL sketches);
diff is one full-outer join on the key — the unavoidable shuffle —
followed by conditional counts.
"""
from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

_ORDERED = ("byte", "short", "int", "bigint", "float", "double",
            "decimal", "date", "timestamp", "timestamp_ntz", "string")


def profile_table(df: DataFrame,
                  columns: Optional[Sequence[str]] = None) -> DataFrame:
    """One row per column: ``(column, n_rows, n_null, n_distinct_approx,
    min_repr, max_repr)`` — min/max as strings so every column type
    fits one schema; NULL for unordered types (arrays, maps,
    structs, binary)."""
    columns = list(columns) if columns is not None else df.columns
    types = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(columns):
        aggs.append(F.sum(F.col(c).isNull().cast("long"))
                    .alias(f"__null{i}"))
        aggs.append(F.approx_count_distinct(c).alias(f"__dist{i}"))
        ordered = any(types[c].startswith(t) for t in _ORDERED)
        if ordered:
            aggs.append(F.min(c).cast("string").alias(f"__min{i}"))
            aggs.append(F.max(c).cast("string").alias(f"__max{i}"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"__min{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"__max{i}"))
    row = df.agg(*aggs)
    parts = [
        row.select(F.lit(c).alias("column"),
                   F.col("__n").alias("n_rows"),
                   F.col(f"__null{i}").alias("n_null"),
                   F.col(f"__dist{i}").alias("n_distinct_approx"),
                   F.col(f"__min{i}").alias("min_repr"),
                   F.col(f"__max{i}").alias("max_repr"))
        for i, c in enumerate(columns)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def table_diff(old: DataFrame, new: DataFrame,
               key_cols: Sequence[str],
               compare_cols: Optional[Sequence[str]] = None) -> DataFrame:
    """Reconcile two versions of a keyed table: one summary row with
    ``n_added`` (key only in new), ``n_removed`` (key only in old),
    ``n_changed`` (key in both, any compared column differs —
    null-safe), ``n_unchanged``.  Keys must be unique per side (the
    caller's contract for a keyed table; duplicate keys make
    'changed' ill-posed)."""
    key_cols = list(key_cols)
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in key_cols]
    compare_cols = list(compare_cols)

    def packed(df, side):
        return df.select(
            *key_cols,
            F.struct(*[F.col(c) for c in compare_cols]).alias(side))

    j = packed(old, "__o").join(packed(new, "__n"), key_cols, "full_outer")
    in_old = F.col("__o").isNotNull()
    in_new = F.col("__n").isNotNull()
    same = F.col("__o").eqNullSafe(F.col("__n"))
    return j.agg(
        F.sum((~in_old & in_new).cast("long")).alias("n_added"),
        F.sum((in_old & ~in_new).cast("long")).alias("n_removed"),
        F.sum((in_old & in_new & ~same).cast("long")).alias("n_changed"),
        F.sum((in_old & in_new & same).cast("long")).alias("n_unchanged"),
    )

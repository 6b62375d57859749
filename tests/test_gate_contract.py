"""Gate-contract invariants: the negative-zero normalization layer
(round-4) and the generated float-column mapping that drives it.

The driver's value hash is representation-exact — DuckDB's round()
preserves -0.0 while Spark's normalizes it to +0.0 (round-3 finding:
pit_ols, rolling_slope), so every gate query and oracle is wrapped in
a `+ 0.0` shell at one chokepoint (``__spark_entry__._nz_df`` /
``_nz_sql``).  These tests pin the shell's semantics and keep the
generated ``hiselspark/gate_float_cols.py`` mapping from going stale.
"""
from __future__ import annotations

import math
import os

import pytest

SF_DIR = "/root/testdata/sf0.01"


def test_float_col_mapping_is_fresh():
    """The committed mapping must equal a fresh DuckDB DESCRIBE of
    every oracle — adding a gate query without re-running
    tools/gen_float_cols.py fails here instead of failing the
    driver's hash."""
    if not os.path.isdir(SF_DIR):
        pytest.skip("testdata not present")
    from hiselspark.gate_float_cols import ORACLE_FLOAT_COLS
    from tools.gen_float_cols import compute_mapping
    fresh = compute_mapping(SF_DIR)
    assert fresh == ORACLE_FLOAT_COLS


def test_nz_df_normalizes_negative_zero(spark):
    import __spark_entry__ as se
    from pyspark.sql import functions as F
    df = spark.range(1).select(
        F.lit(-0.0).alias("d"),
        F.lit(float("nan")).alias("nan_col"),
        F.lit(None).cast("double").alias("null_col"),
        F.array(F.lit(-0.0), F.lit(1.5)).alias("arr"),
        F.lit(7).alias("i"))
    row = se._nz_df(df).collect()[0]
    assert math.copysign(1.0, row["d"]) == 1.0  # -0.0 -> +0.0
    assert math.isnan(row["nan_col"])
    assert row["null_col"] is None
    assert math.copysign(1.0, row["arr"][0]) == 1.0
    assert row["arr"][1] == 1.5
    assert row["i"] == 7
    # schema unchanged
    assert se._nz_df(df).schema == df.schema


def test_nz_sql_normalizes_negative_zero_in_duckdb():
    import duckdb

    import __spark_entry__ as se
    from hiselspark import gate_float_cols
    # monkey-patch-free: exercise the real wrapper via a fake entry
    gate_float_cols.ORACLE_FLOAT_COLS["__probe__"] = [
        ("x", "double"), ("xs", "list")]
    try:
        sql = se._nz_sql(
            "__probe__",
            "SELECT round(-1e-12, 6) AS x, 3 AS n,"
            " [round(-1e-12, 6), 2.5] AS xs")
        x, n, xs = duckdb.sql(sql).fetchone()
        assert math.copysign(1.0, x) == 1.0
        assert n == 3
        assert math.copysign(1.0, xs[0]) == 1.0 and xs[1] == 2.5
        # unwrapped, DuckDB really does emit -0.0 (the class exists)
        raw = duckdb.sql("SELECT round(-1e-12, 6) AS x").fetchone()[0]
        assert math.copysign(1.0, raw) == -1.0
    finally:
        del gate_float_cols.ORACLE_FLOAT_COLS["__probe__"]


def test_every_query_has_oracle_and_wrapper_applies():
    import __spark_entry__ as se
    qs = se._queries_raw()
    oracles = se.oracle_sql()
    assert set(qs) == set(se.queries())
    missing = [k for k in qs if k not in oracles]
    assert not missing, f"queries without oracle: {missing}"
    from hiselspark.gate_float_cols import ORACLE_FLOAT_COLS
    for name in ORACLE_FLOAT_COLS:
        assert "REPLACE (" in oracles[name], name

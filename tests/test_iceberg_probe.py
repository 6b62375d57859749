"""Real-Apache-Iceberg smoke test behind a capability probe.

The engine's snapshot layer (``hiselspark/sources/snapshots.py``)
implements the Iceberg *contract* (atomic commits, time travel,
incremental scans, MERGE, Z-order) on parquet+JSON because this
sandbox has no Iceberg runtime jars and no network to fetch them.
This test keeps that production gap VISIBLE instead of silently
absent: when a Spark session can actually create an Iceberg table
(jars + catalog configured), the round-trip below runs for real;
otherwise it skips with the precise reason.  A deployment that adds
``--packages org.apache.iceberg:iceberg-spark-runtime-...`` gets the
real-format coverage with no test changes.
"""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _iceberg_available(spark) -> str | None:
    """Return None when a real Iceberg catalog works, else the reason
    it doesn't (jar missing / catalog unconfigured)."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
    except Exception:
        return "iceberg-spark-runtime jars not on the classpath"
    try:
        spark.sql("CREATE NAMESPACE IF NOT EXISTS iceberg_probe_ns")
    except Exception as e:
        return f"no Iceberg catalog configured: {type(e).__name__}"
    return None


def test_iceberg_round_trip_when_available(spark, tmp_path):
    reason = _iceberg_available(spark)
    if reason is not None:
        pytest.skip(f"real Iceberg unavailable in this environment "
                    f"({reason}); contract covered by "
                    f"tests/test_sinks.py on the parquet+JSON snapshot "
                    f"layer")
    tbl = "iceberg_probe_ns.t_smoke"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(f"CREATE TABLE {tbl} (id BIGINT, v DOUBLE) USING iceberg")
    spark.range(100).withColumn("v", F.col("id") * 0.5) \
        .writeTo(tbl).append()
    got = spark.table(tbl).agg(F.sum("id"), F.count("*")).collect()[0]
    assert got[0] == 4950 and got[1] == 100
    # time travel: a second append must be invisible at snapshot 1
    snaps = spark.sql(f"SELECT snapshot_id FROM {tbl}.snapshots "
                      f"ORDER BY committed_at").collect()
    first = snaps[0].snapshot_id
    spark.range(100, 200).withColumn("v", F.col("id") * 0.5) \
        .writeTo(tbl).append()
    n_at_first = (spark.read.option("snapshot-id", first)
                  .format("iceberg").load(tbl.replace(".", "/"))
                  .count())
    assert n_at_first == 100
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")

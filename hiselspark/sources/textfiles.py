"""CSV / JSONL source+sink round trips with enforced schemas.

Parquet is the engine's native format, but every real corpus has CSV
and JSONL at its edges (vendor drops, export interchange, label
files).  The contract these helpers pin down:

* **Explicit schema on read** — never ``inferSchema`` (a second pass
  over 100 TB, and type drift between files); the caller's schema is
  the source of truth and malformed rows fail loudly
  (``mode=FAILFAST``).
* **Lossless strings** — quoting/escaping must survive embedded
  commas and quotes in text columns (the gate feeds the JSON
  ``props`` column through CSV on purpose).  Embedded NEWLINES are
  the one exception: the line-splittable reader used here cannot
  carry them (set ``multiLine`` to trade splittability for them, or
  escape upstream — JSONL never has this problem, its writer escapes
  ``\\n``).
* **Timestamps as ISO-8601 UTC** with microseconds, so the round trip
  is exact at the engine's native resolution.
* **Splittable scale shape** — uncompressed (or bgzip'd) CSV/JSONL
  splits by line across tasks; a write is one pass, a read is a
  parallel scan with the same partition sizing as any text source.
  Column pruning/pushdown do NOT reach text formats (the reader
  parses whole lines) — the reason the engine converts to parquet at
  ingest and these helpers exist only for the edges.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def write_csv(df: DataFrame, path: str) -> None:
    """Write ``df`` as headered, quoted CSV (one pass, no shuffle)."""
    (df.write.mode("overwrite")
       .option("header", "true")
       .option("quoteAll", "true")
       .option("escape", '"')
       .option("timestampFormat", _TS_FMT)
       .csv(path))


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    """Schema-enforced FAILFAST CSV scan (no inference pass)."""
    return (spark.read.schema(schema)
            .option("header", "true")
            .option("escape", '"')
            .option("timestampFormat", _TS_FMT)
            .option("mode", "FAILFAST")
            .csv(path))


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write ``df`` as JSON-lines (one object per line, one pass)."""
    (df.write.mode("overwrite")
       .option("timestampFormat", _TS_FMT)
       .json(path))


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """Schema-enforced FAILFAST JSONL scan (no inference pass)."""
    return (spark.read.schema(schema)
            .option("timestampFormat", _TS_FMT)
            .option("mode", "FAILFAST")
            .json(path))

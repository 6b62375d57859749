"""Scan-fused image featurization: decode inside the scan task.

The DataFrame route (``pipeline.featurize_images``) reads the parquet
scan in the JVM, ships every image blob over the Arrow socket into a
Python worker, and ships the features back.  That JVM->Python byte-pump
is pure overhead: the Python worker is going to be the one looking at
the bytes anyway.  Measured on this box it is THE bottleneck of the
full pipeline at high core counts — payload movement over one memory
bus does not scale with cores.

This module removes the round trip: the work items are (parquet file,
row-group) pairs — a tiny DataFrame — and each Spark task opens its
row group DIRECTLY with pyarrow, decodes, reduces the pixels to
statistics, computes the caption features, and emits only the narrow
numeric frame.  Image bytes flow disk -> Python worker, touching
neither the JVM heap nor the worker socket.  On a real cluster this is
the standard payload-scan pattern (Petastorm-style data loading,
`binaryFile`-source feature extraction): Catalyst still owns everything
downstream of the narrow frame — the windows, joins and aggregation
plans are unchanged.

Trade-offs vs the DataFrame route (both kept on purpose):
* no Catalyst pushdown INTO this scan (row-group granularity only) —
  fine for full-corpus featurization, wrong for selective queries;
* the row-group listing happens on the driver (file footers only —
  the same metadata an Iceberg manifest read would touch).

Row-for-row equality with ``pipeline.featurize_images`` is asserted in
``tests/test_pipeline.py``.
"""
from __future__ import annotations

import os
import re
from typing import Iterator, List, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..functions.image import PIXEL_STAT_FIELDS, _pixel_stats_frame
from ..functions.text import TOKEN_PATTERN

_SOURCE_COLS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                "entity_id", "ts"]


def _caption_features_pandas(out: pd.DataFrame,
                             col: str = "caption") -> pd.DataFrame:
    """Vectorized pandas twins of functions.text.with_caption_features
    (caption_len / caption_tokens / caption_rtokens) — computed worker-
    side so the caption strings never cross into the JVM."""
    s = out[col].astype(str)
    out["caption_len"] = s.str.len().astype("int32")
    stripped = s.str.strip()
    out["caption_tokens"] = stripped.str.split(r"\s+", regex=True).map(
        len).where(stripped != "", 0).astype("int32")
    out["caption_rtokens"] = s.str.count(TOKEN_PATTERN).astype("int32")
    return out


def list_row_groups(path) -> pd.DataFrame:
    """(file, row_group) work items — footer metadata only, the moral
    equivalent of reading an Iceberg manifest.  ``path`` is a parquet
    directory or an explicit list of parquet files (e.g. a
    SnapshotTable snapshot's committed file list, so the fused scan
    reads exactly the time-travel state)."""
    import pyarrow.parquet as pq

    if isinstance(path, (list, tuple)):
        files = sorted(path)
    else:
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if re.match(r"part-.*\.parquet$", f))
    items = []
    for f in files:
        for rg in range(pq.ParquetFile(f).metadata.num_row_groups):
            items.append((f, rg))
    return pd.DataFrame(items, columns=["file", "rg"])


def image_feature_scan(spark: SparkSession, images_path,
                       batch_rows: int = 1024,
                       num_tasks: Optional[int] = None) -> DataFrame:
    """Narrow feature frame straight from the image parquet: pixel
    statistics + caption features + passthrough metadata, one Spark
    task per (file, row-group).  Returns columns
    ``(entity_id, ts, w, h, phash, caption_len, caption_tokens,
    caption_rtokens, px_*)`` — everything ``pipeline.featurize_images``
    yields except the phash bit unpack, which stays a JVM expression
    downstream (it is free there and would bloat this frame here)."""
    items = list_row_groups(images_path)
    n = num_tasks or min(len(items), 512)
    work = (spark.createDataFrame(items)
            .repartition(n, "file", "rg"))

    out_fields = [
        T.StructField("entity_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("phash", T.LongType()),
        T.StructField("caption_len", T.IntegerType()),
        T.StructField("caption_tokens", T.IntegerType()),
        T.StructField("caption_rtokens", T.IntegerType()),
        *PIXEL_STAT_FIELDS,
    ]
    out_schema = T.StructType(out_fields)
    out_cols = [f.name for f in out_fields]

    def scan(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in pdfs:
            for file, rg in zip(pdf["file"], pdf["rg"]):
                pf = pq.ParquetFile(file)
                # iterate in bounded batches: a whole row group of
                # blobs at once would spike worker memory
                for rb in pf.iter_batches(batch_size=batch_rows,
                                          row_groups=[int(rg)],
                                          columns=_SOURCE_COLS):
                    batch = rb.to_pandas()
                    batch["phash"] = batch["phash"].astype("int64")
                    out = _pixel_stats_frame(batch)
                    out = _caption_features_pandas(out)
                    yield out[out_cols]

    return work.mapInPandas(scan, out_schema)


def featurize_images_fused(spark: SparkSession, images_path,
                           n_phash_bits: int = 16) -> DataFrame:
    """Drop-in twin of ``pipeline.featurize_images`` reading the corpus
    via the fused scan: same columns, same values, no JVM->Python blob
    round trip."""
    from ..functions.image import phash_bit_columns, phash_hamming_weight

    df = image_feature_scan(spark, images_path)
    df = phash_hamming_weight(df)
    df = phash_bit_columns(df, n_bits=n_phash_bits)
    return df.drop("phash")

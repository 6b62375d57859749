"""Deterministic synthetic image+caption corpus (the north-rule input).

Schema per BASELINE.json's ``input_hint``:
``(image_id string, bytes binary, w int, h int, fmt string,
caption string, phash long)`` plus point-in-time columns
``(entity_id string, ts timestamp)`` and a ``labels`` table
``(entity_id, label_ts, y)`` for the as-of side (FIXTURES.md F1/F2).

Generation is **counter-based** (splitmix64-style integer mixing of the
row index), so any row can be produced independently on any executor —
the corpus is generated distributed via ``mapInPandas`` over
``spark.range`` with zero driver materialization and is bit-identical
regardless of partitioning.  ~20% of rows land on one hot entity to
exercise skew handling.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

_EPOCH = pd.Timestamp("2024-01-01")
_SPAN_SECONDS = 90 * 86400  # 90 days of events


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — public-domain integer hash.  uint64
    wraparound is the algorithm, not an accident; silence the warning."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64, copy=True)
        z += np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _hash_field(i: np.ndarray, salt: int, seed: int) -> np.ndarray:
    return _mix64(i.astype(np.uint64)
                  ^ _mix64(np.uint64(salt) + np.uint64(seed)))


IMAGE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("caption", T.StringType()),
    T.StructField("phash", T.LongType()),
    T.StructField("entity_id", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])

LABEL_SCHEMA = T.StructType([
    T.StructField("entity_id", T.StringType()),
    T.StructField("label_ts", T.TimestampType()),
    T.StructField("y", T.DoubleType()),
])

_VOCAB = [f"word{v:03d}" for v in range(1000)]
_SIZES = np.array([8, 16, 32], dtype=np.int32)


def _raw_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic per-pixel pattern (FIXTURES.md F1): value at
    (y, x, c) is ``(i + x + y*w + c) % 256``."""
    ys, xs, cs = np.meshgrid(np.arange(h), np.arange(w), np.arange(3),
                             indexing="ij")
    return ((i + xs + ys * w + cs) % 256).astype(np.uint8)


def _entity_of(i: np.ndarray, n_entities: int, seed: int) -> np.ndarray:
    hot = _hash_field(i, 101, seed) % np.uint64(5) == 0  # ~20% hot entity
    ent = _hash_field(i, 102, seed) % np.uint64(max(n_entities, 1))
    return np.where(hot, np.uint64(0), ent)


def _image_rows(idx: np.ndarray, n_entities: int, seed: int,
                sizes: np.ndarray = _SIZES) -> pd.DataFrame:
    n = len(idx)
    w = sizes[(_hash_field(idx, 1, seed) % np.uint64(len(sizes))).astype(int)]
    h = sizes[(_hash_field(idx, 2, seed) % np.uint64(len(sizes))).astype(int)]
    phash = _hash_field(idx, 3, seed).astype(np.int64)
    ent = _entity_of(idx, n_entities, seed)
    # long-tailed inter-event structure: timestamps uniform + occasional
    # large offsets so >30min sessionize gaps occur
    base = _hash_field(idx, 4, seed) % np.uint64(_SPAN_SECONDS)
    ts = _EPOCH + pd.to_timedelta(base.astype(np.int64), unit="s")

    ntok = 3 + (_hash_field(idx, 5, seed) % np.uint64(10)).astype(int)
    captions = []
    blobs = []
    for row in range(n):
        i = int(idx[row])
        toks = _hash_field(
            np.arange(int(ntok[row]), dtype=np.uint64) + np.uint64(i) * np.uint64(16),
            6, seed) % np.uint64(len(_VOCAB))
        captions.append(" ".join(_VOCAB[int(t)] for t in toks))
        blobs.append(_raw_pixels(i, int(w[row]), int(h[row])).tobytes())
    return pd.DataFrame({
        "image_id": [f"img{int(i):010d}" for i in idx],
        "bytes": blobs,
        "w": w,
        "h": h,
        "fmt": "raw",
        "caption": captions,
        "phash": phash,
        "entity_id": [f"e{int(e):06d}" for e in ent],
        "ts": ts,
    })


def images(spark: SparkSession, n_rows: int, n_entities: int = 0,
           seed: int = 42, partitions: int = 32,
           sizes: tuple = (8, 16, 32)) -> DataFrame:
    """Distributed deterministic corpus of ``n_rows`` image rows.
    ``sizes`` sets the pool of image edge lengths — tests use the small
    default; benchmarks use thumbnail-scale (e.g. (32, 64, 128)) so the
    per-row decode work is representative."""
    n_entities = n_entities or max(n_rows // 50, 1)
    size_arr = np.array(sizes, dtype=np.int32)

    # emit bounded frames: with multi-KB blobs, a 10k-row Arrow batch is
    # a ~100MB+ allocation per worker — dozens of workers doing those
    # concurrently thrash the allocator; 512-row frames keep worker
    # memory flat
    chunk = 512

    def gen(pdfs):
        for pdf in pdfs:
            ids = pdf["id"].to_numpy(np.uint64)
            for s in range(0, len(ids), chunk):
                yield _image_rows(ids[s:s + chunk], n_entities, seed,
                                  size_arr)

    return (spark.range(0, n_rows, numPartitions=partitions)
                 .mapInPandas(gen, IMAGE_SCHEMA))


def labels(spark: SparkSession, n_rows: int, n_labels: int = 0,
           n_entities: int = 0, seed: int = 42,
           partitions: int = 8) -> DataFrame:
    """Label rows: each samples an anchor image row ``a`` and is stamped
    shortly AFTER it, with ``y`` a deterministic function of that
    image's phash-bit features + caption length + noise — so a correct
    backward as-of join recovers exactly the features that predict y."""
    n_entities = n_entities or max(n_rows // 50, 1)
    n_labels = n_labels or max(n_rows // 4, 1)

    def gen(pdfs):
        for pdf in pdfs:
            j = pdf["id"].to_numpy(np.uint64)
            anchor = _hash_field(j, 201, seed) % np.uint64(n_rows)
            ent = _entity_of(anchor, n_entities, seed)
            base = _hash_field(anchor, 4, seed) % np.uint64(_SPAN_SECONDS)
            delta = np.uint64(1) + _hash_field(j, 202, seed) % np.uint64(60)
            phash = _hash_field(anchor, 3, seed)
            bit0 = ((phash >> np.uint64(0)) & np.uint64(1)).astype(np.float64)
            bit7 = ((phash >> np.uint64(7)) & np.uint64(1)).astype(np.float64)
            ntok = 3 + (_hash_field(anchor, 5, seed) % np.uint64(10)
                        ).astype(np.float64)
            noise = ((_hash_field(j, 203, seed) % np.uint64(1000)
                      ).astype(np.float64) / 1000.0 - 0.5) * 0.01
            y = 2.0 * bit0 - 1.5 * bit7 + 0.25 * ntok + noise
            yield pd.DataFrame({
                "entity_id": [f"e{int(e):06d}" for e in ent],
                "label_ts": _EPOCH + pd.to_timedelta(
                    (base + delta).astype(np.int64), unit="s"),
                "y": y,
            })

    return (spark.range(0, n_labels, numPartitions=partitions)
                 .mapInPandas(gen, LABEL_SCHEMA))

"""Per-partition runtime metrics via a mapInPandas side-channel.

``instrument(df)`` wraps a DataFrame so that executing it ALSO records
one row per task partition — rows seen, payload bytes, wall seconds —
into Spark accumulators, collected with :func:`collect_metrics` after
an action.  Accumulators are the idiomatic Spark side-channel: zero
extra shuffle, zero extra pass, survive task retries (Spark de-dupes
accumulator updates from successful tasks only for actions).
"""
from __future__ import annotations

import time
from typing import Iterator, Optional, Sequence

import pandas as pd

from pyspark.sql import DataFrame


class PartitionMetrics:
    """Holds the accumulators of one instrumented stage."""

    def __init__(self, sc, name: str):
        self.name = name
        self.rows = sc.accumulator(0)
        self.batches = sc.accumulator(0)
        self.bytes = sc.accumulator(0)
        self.wall_ms = sc.accumulator(0)
        self.partitions = sc.accumulator(0)

    def as_dict(self) -> dict:
        return {
            "stage": self.name,
            "rows": self.rows.value,
            "arrow_batches": self.batches.value,
            "approx_bytes": self.bytes.value,
            "task_wall_ms": self.wall_ms.value,
            "partitions_seen": self.partitions.value,
        }


def instrument(df: DataFrame, name: str = "stage",
               metrics: Optional[PartitionMetrics] = None,
               ) -> tuple[DataFrame, PartitionMetrics]:
    """Pass-through instrumentation: same rows out, metrics recorded as
    a side effect when the plan executes."""
    sc = df.sparkSession.sparkContext
    m = metrics or PartitionMetrics(sc, name)

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t0 = time.perf_counter()
        m.partitions.add(1)
        for pdf in pdfs:
            m.rows.add(len(pdf))
            m.batches.add(1)
            m.bytes.add(int(pdf.memory_usage(deep=False).sum()))
            yield pdf
        m.wall_ms.add(int(1000 * (time.perf_counter() - t0)))

    return df.mapInPandas(run, df.schema), m

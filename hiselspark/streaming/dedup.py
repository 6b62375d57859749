"""Streaming exact deduplication — the incremental twin of
``operators.dedup.exact_duplicates``'s keep-one semantics.

A corpus that arrives continuously (crawl batches landing in object
storage, a Kafka topic of documents) wants dedup state that persists
ACROSS micro-batches: the first arrival of a text is kept, every later
duplicate — same batch or a later one — is dropped.  That is exactly
Structured Streaming's ``dropDuplicates`` over a content key.

State discipline at 10^12 documents: the dedup key is the 64-bit
``xxhash64`` of the normalized text, NOT the text itself, so the state
store holds 8-byte keys instead of document bodies (the same
fingerprint the batch dedup operators use; a 64-bit collision silently
merges two distinct documents, the standard and accepted trade at this
scale — callers needing exactness key on the full normalized text).
Without a watermark the state grows with the number of DISTINCT
documents — that is inherent to exact full-history dedup; bound it by
keying on ``dropDuplicatesWithinWatermark`` when only a recency window
must be dup-free.

Which duplicate survives is arrival-order-dependent (first wins), so
deterministic downstream contracts should project CONTENT-derived
columns (any surviving copy agrees on them) — the driver-gate query
does exactly that, and the oracle is plain ``SELECT DISTINCT``.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.dedup import normalize_text


def stream_dedup(
    docs: DataFrame,
    text_col: str = "text",
    key_on_hash: bool = True,
) -> DataFrame:
    """Keep the first-arriving row per distinct normalized text.
    ``docs`` must be a streaming DataFrame; output is append-mode
    (each distinct text emits exactly one row, in the micro-batch of
    its first arrival)."""
    norm = normalize_text(text_col)
    key = F.xxhash64(norm) if key_on_hash else norm
    return (docs.withColumn("__dedup_key", key)
            .dropDuplicates(["__dedup_key"])
            .drop("__dedup_key"))

"""End-to-end training-corpus curation pipeline.

Composes the curation operators into the canonical order a web-scale
pretraining data pipeline runs them (each stage is the repo's
oracle-checked operator, so the COMPOSITION is DuckDB-replayable too):

1. **PII scrub** (:mod:`operators.pii`) — mask emails/URLs/IPs; all
   later stages see the scrubbed text (hashes included: a duplicate
   differing only in a masked email IS a duplicate).
2. **Quality filter** (:mod:`operators.repetition`) — drop documents
   with fewer than ``min_tokens`` tokens or a top-unigram fraction
   above ``max_top1_frac`` (the Gopher repetition rule).
3. **Exact dedup** — keep the minimal-id document per normalized
   scrubbed text (same normalization as :mod:`operators.dedup`).
4. **Token-budget mix** (:mod:`operators.sampling`, optional) — per
   ``group_col`` token quotas realize the mixture weights.
5. **Sequence packing** (:mod:`operators.packing`) — concat-and-chunk
   the surviving corpus into fixed-length training sequences.

Plan shape: stages 1–2 are map + doc-keyed aggregates, stage 3 is one
text-keyed shuffle, stage 4 two group-keyed window passes, stage 5 one
stream-keyed window — nothing keys on a value that can be hot (texts
and doc ids are near-unique; groups fan out via the two-level plans).
Every stage is deterministic and layout-independent, so the pipeline
output is bit-stable across cluster sizes — the property that makes
resume/caching sound.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, Window, functions as F

from .operators.dedup import normalize_text
from .operators.packing import pack_sequences, sequence_manifest
from .operators.pii import with_pii
from .operators.repetition import repetition_stats
from .operators.sampling import token_budget_sample


@dataclass
class CurationResult:
    """Outputs of :func:`curate_corpus` (all lazy DataFrames)."""
    docs: DataFrame        # surviving documents (id, text scrubbed)
    segments: DataFrame    # pack_sequences segment table
    manifest: DataFrame    # per-sequence roll-up (lineage record)


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    max_top1_frac: float = 0.5,
    group_col: Optional[str] = None,
    token_budget: Optional[int] = None,
    seq_len: int = 1024,
    n_streams: int = 16,
    salt: int = 0,
) -> CurationResult:
    """Run scrub → quality filter → exact dedup → (optional) budget
    mix → packing; see the module docstring for stage semantics."""
    scrubbed = (with_pii(docs, text_col=text_col,
                         scrubbed_col="__scrubbed")
                .drop(text_col, "n_email", "n_url", "n_ip")
                .withColumnRenamed("__scrubbed", text_col))
    rep = repetition_stats(scrubbed, text_col=text_col, id_col=id_col)
    good_ids = (rep.where((F.col("n_tokens") >= min_tokens)
                          & (F.col("top1_frac") <= max_top1_frac))
                .select(id_col))
    good = scrubbed.join(good_ids, id_col)
    canon = (good
             .withColumn("__norm", normalize_text(text_col))
             .withColumn("__rk", F.row_number().over(
                 Window.partitionBy("__norm").orderBy(id_col)))
             .where(F.col("__rk") == 1)
             .drop("__norm", "__rk"))
    if token_budget is not None:
        if group_col is None:
            raise ValueError("token_budget requires group_col")
        canon = token_budget_sample(
            canon, group_col, token_budget, text_col=text_col,
            id_col=id_col, salt=salt)
    segments = pack_sequences(canon, text_col=text_col, id_col=id_col,
                              seq_len=seq_len, n_streams=n_streams,
                              salt=salt)
    return CurationResult(docs=canon, segments=segments,
                          manifest=sequence_manifest(segments))

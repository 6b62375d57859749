"""Sequence packing: concatenate documents into fixed-token-length
training sequences (the standard LLM-pretraining "concat and chunk"
layout, e.g. GPT/T5 pretraining data pipelines).

Semantics: documents are laid head-to-tail on a token tape, one tape
per STREAM, and the tape is cut every ``seq_len`` tokens.  A document
whose tokens straddle a cut appears in both sequences (as two
segments) — nothing is padded, nothing is dropped, every token lands
in exactly one (sequence, offset) slot.  The output is the segment
table: which span of which document fills which slot of which
sequence — exactly the manifest a trainer's data loader needs.

Determinism & scale (the whole point at 10^12 documents):

* stream assignment is CONTENT-keyed (the same cross-engine polynomial
  hash as :mod:`hiselspark.operators.splits`), so the packing is
  bit-identical across cluster sizes and re-runs — no
  ``monotonically_increasing_id``, no partition-layout dependence;
* within a stream, documents are ordered by the unique ``id_col``;
  the token tape is a window prefix-sum over that order.  One shuffle
  (hash-partition by stream) + one per-stream sort; ``n_streams``
  bounds the sort width, so choose it ≳ the executor count.  Each
  sequence lives inside ONE stream — trainers can consume streams
  independently;
* the straddle explode emits ``1 + n_tokens // seq_len`` rows per
  document — linear, no skew amplification.

Every number here is integer arithmetic on token counts — the driver
gate reproduces the full segment table in DuckDB (window cumsum +
``generate_series``) and the per-sequence aggregates must hash-match.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import token_count, tokens
from .splits import content_hash


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 1024,
    n_streams: int = 16,
    salt: int = 0,
) -> DataFrame:
    """Segment table of the packed corpus.

    Returns one row per (document × sequence it occupies):
    ``stream, seq, id_col, offset, seg_tokens, doc_tokens`` where
    ``seq`` is the stream-local sequence number, ``offset`` the
    segment's first token slot within the sequence, ``seg_tokens`` its
    length, and ``doc_tokens`` the document's total whitespace-token
    count.  Zero-token documents occupy no tape and emit no segment.

    Invariants (asserted in tests): within every (stream, seq) the
    segments tile [0, seq_len) without gaps or overlap, except the
    tail sequence of each stream which tiles [0, tape_len % seq_len);
    segment order by offset equals document order by ``id_col``.
    """
    L = int(seq_len)
    if L <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if int(n_streams) < 1:
        raise ValueError(f"n_streams must be >= 1, got {n_streams}")
    n = token_count(text_col).cast("long")
    w = Window.partitionBy("stream").orderBy(id_col)
    tape = (
        df.select(
            F.col(id_col),
            (content_hash(text_col, salt) % n_streams)
            .cast("int").alias("stream"),
            n.alias("doc_tokens"))
        .where(F.col("doc_tokens") > 0)
        .withColumn("end", F.sum("doc_tokens").over(w))
        .withColumn("start", F.col("end") - F.col("doc_tokens")))
    seq = F.explode(F.sequence(
        F.floor(F.col("start") / L),
        F.floor((F.col("end") - 1) / L))).alias("seq")
    seg_a = F.greatest(F.col("start"), F.col("seq") * L)
    seg_b = F.least(F.col("end"), (F.col("seq") + 1) * L)
    return (tape.select("stream", id_col, "doc_tokens", "start", "end",
                        seq)
            .select("stream",
                    F.col("seq").cast("long").alias("seq"),
                    F.col(id_col),
                    (seg_a - F.col("seq") * L).cast("long")
                    .alias("offset"),
                    (seg_b - seg_a).cast("long").alias("seg_tokens"),
                    "doc_tokens"))


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Sliding-window chunking WITHIN each document (the RAG /
    long-doc-eval layout, vs. :func:`pack_sequences` which packs
    ACROSS documents): token windows of ``chunk_tokens`` starting
    every ``chunk_tokens - overlap`` tokens, last window truncated.

    Returns ``id_col, chunk_id, start_tok, n_chunk_tokens, chunk`` —
    one row per window, chunk text re-joined with single spaces.
    Chunk starts step by the stride until the first window that
    reaches the document's end (the standard splitter rule), so every
    chunk has ``chunk_tokens`` tokens except possibly the last, which
    keeps between ``overlap + 1`` and ``chunk_tokens``.  Map-only
    (explode of per-row windows, no shuffle, no Python); output size
    is input × ``chunk/(chunk-overlap)`` by construction.  Zero-token
    documents emit no chunks."""
    C, O = int(chunk_tokens), int(overlap)
    if C <= 0 or O < 0 or O >= C:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap=} "
            f"{chunk_tokens=}")
    stride = C - O
    toks = tokens(text_col)
    base = df.select(F.col(id_col), toks.alias("__toks"),
                     F.size(toks).alias("__n"))
    # last start = first k*stride with k*stride + C >= n, i.e.
    # k_max = ceil((n - C)/stride) for n > C else 0 — integer-exact
    # arithmetic shared verbatim with the DuckDB oracle
    k = F.explode(F.expr(
        f"if(__n > 0, sequence(0, cast(if(__n > {C},"
        f" (__n - {C} + {stride} - 1) div {stride}, 0)"
        f" as int)), cast(array() as array<int>))")).alias("chunk_id")
    out = (base.select(id_col, "__toks", "__n", k)
           .select(
               id_col,
               F.col("chunk_id").cast("int").alias("chunk_id"),
               (F.col("chunk_id") * stride).cast("long")
               .alias("start_tok"),
               F.least(F.lit(C),
                       F.col("__n") - F.col("chunk_id") * stride)
               .cast("long").alias("n_chunk_tokens"),
               F.array_join(
                   F.expr(f"slice(__toks, chunk_id * {stride} + 1,"
                          f" {C})"), " ").alias("chunk")))
    return out


def sequence_manifest(segments: DataFrame) -> DataFrame:
    """Per-sequence roll-up of a :func:`pack_sequences` segment table:
    document count, filled tokens, straddle count — the lineage record
    a resumable packing job checkpoints per sequence."""
    return (segments.groupBy("stream", "seq").agg(
        F.count("*").alias("n_docs"),
        F.sum("seg_tokens").alias("n_tokens"),
        F.sum(F.when(F.col("seg_tokens") < F.col("doc_tokens"), 1)
              .otherwise(0)).alias("n_straddle")))

"""Exact duplicated-substring span detection over a document corpus.

The substring-level twin of document-level dedup (Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better", arXiv
2107.06499): rather than dropping whole near-duplicate documents, find
the POSITIONS inside each document whose fixed-length character k-gram
also occurs in at least ``min_docs`` distinct documents — the spans a
training pipeline would mask or cut.  The paper's exact suffix-array
formulation is inherently sequential; the distributed form used here
is the standard fixed-k approximation: a position opens a duplicated
span of length >= k iff its k-gram is corpus-duplicated, and a
maximal duplicated substring of length L >= k appears as a run of
L - k + 1 consecutive duplicated positions, so ``longest_span_chars``
recovers the exact maximal duplicated-substring length.

Reference scope note: hisel (`/root/reference`) contains no text
processing; this belongs to the grafted training-data curation layer
(SURVEY §2), next to winnowing / containment_pairs (which fingerprint
SAMPLED k-grams — this operator is exhaustive over every position).

Determinism + scale posture:
* every count is an exact integer; the single float output
  (``dup_ratio``) is one mirrored division at the end;
* work is linear in corpus characters: the position explode emits one
  row per character position (the same cost class as tokenization),
  then ONE gram-keyed exchange for the document-frequency aggregate,
  one gram-keyed join back, and doc-keyed window/aggregates.  Hot
  grams (boilerplate, whitespace runs) are harmless: the DF table
  carries one row per distinct gram, so the join fans out 1:1;
* no driver state, no per-doc collects — the longest-run computation
  is the pos - row_number run-grouping trick inside a doc-keyed
  window, identical in the SQL oracle.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def dup_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 20,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplicated-span statistics at k-gram granularity.

    A position p (1-based) in document d is *duplicated* iff the
    k-character substring starting at p occurs in >= ``min_docs``
    distinct documents (d itself included — cross-document
    duplication; a string repeated only inside one document does not
    count).  Documents shorter than k characters have no k-gram
    positions and are absent from the output (they cannot contain a
    duplicated span).

    Returns one row per document with >= 1 k-gram position:
      (doc_id, n_grams, dup_grams, dup_ratio, longest_run,
       longest_span_chars)
    where ``longest_run`` is the longest run of consecutive duplicated
    positions (0 when none) and ``longest_span_chars`` = longest_run
    + k - 1 when positive — the length of the longest substring all of
    whose length-k windows are corpus-duplicated.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    kk = int(k)
    base = df.select(F.col(id_col).alias("doc_id"),
                     F.col(text_col).alias("text"))
    # one row per k-gram position; sequence() is empty (and explode
    # drops the doc) when length(text) < k
    grams = (base
             .filter(F.length("text") >= kk)
             .select("doc_id",
                     F.explode(
                         F.sequence(F.lit(1),
                                    F.length("text") - kk + 1))
                     .alias("p"),
                     "text")
             .select("doc_id", "p",
                     F.expr(f"substring(text, p, {kk})").alias("g")))
    gram_df = (grams.groupBy("g")
               .agg(F.count_distinct("doc_id").alias("df")))
    flagged = (grams.join(gram_df, "g")
               .select("doc_id", "p",
                       (F.col("df") >= int(min_docs)).alias("dup")))
    totals = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.col("dup").cast("long")).alias("dup_grams"))
    w = Window.partitionBy("doc_id").orderBy("p")
    runs = (flagged.filter("dup")
            .withColumn("grp", F.col("p") - F.row_number().over(w))
            .groupBy("doc_id", "grp").agg(F.count(F.lit(1)).alias("rl"))
            .groupBy("doc_id").agg(F.max("rl").alias("longest_run")))
    out = (totals.join(runs, "doc_id", "left")
           .select(
               "doc_id", "n_grams", "dup_grams",
               F.round(F.col("dup_grams").cast("double")
                       / F.col("n_grams").cast("double"), 6)
               .alias("dup_ratio"),
               F.coalesce("longest_run", F.lit(0)).alias("longest_run"),
               F.when(F.col("longest_run").isNotNull(),
                      F.col("longest_run") + kk - 1)
               .otherwise(F.lit(0)).alias("longest_span_chars")))
    return out

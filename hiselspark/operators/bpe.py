"""BPE merge training — learn byte-pair-encoding merge rules from a
weighted vocabulary (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units").

The engine already APPLIES fixed tokenizations (``functions/text.py``
bpe-ish pretokens, token fertility); this operator LEARNS the merge
table — the training half of the tokenizer stack: each round counts
adjacent symbol pairs over the current segmentation (weighted by word
frequency) and merges the most frequent pair everywhere.

Classic BPE trains on the DISTINCT-word frequency table, not the raw
corpus — pair counting is bounded by vocabulary size, so the per-round
aggregate is small even at 10^12-token corpus scale (the vocab build
itself is the one corpus-sized shuffle, upstream of this operator).

Determinism + replay conventions:
* a word's segmentation is a STRING of symbols with the DOUBLE-SPACE
  separator invariant: leading/trailing single space, two spaces
  between symbols (``'ab'`` → ``' a  b '``).  Merging pair (a, b) is
  then the literal replace of ``' a  b '`` with ``' ab '`` — each
  occurrence owns a private space on each side, so ADJACENT
  occurrences merge correctly in one left-to-right non-overlapping
  pass, and the pass is identical in every engine (Java
  ``String.replace`` ≡ DuckDB ``replace``);
* pair counts are exact integer sums; the winning pair per round is
  the (count DESC, left ASC, right ASC) argmax — fully ordered, no
  float anywhere;
* rounds are driver-bounded: each round pulls ONE row (the argmax) to
  the driver — the bounded-model-pull convention used by the
  selection stack.

Scale shape per round: one map-only literal replace over the vocab +
one pair-count aggregate (exploded adjacent pairs, partial-aggregated)
+ a 1-row driver pull.  Rounds are sequential by nature of the
algorithm.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _initial_seq(word_col: str):
    """`' a  b  c '` segmentation of a word — every codepoint a symbol,
    double-space separators (module docstring)."""
    return F.regexp_replace(F.col(word_col), "(.)", " $1 ")


def bpe_train(
    vocab: DataFrame,
    word_col: str,
    weight_col: str | None = None,
    rounds: int = 8,
) -> DataFrame:
    """Learn ``rounds`` BPE merges from a (word, weight) vocabulary.

    ``vocab`` must have one row per distinct word; ``weight_col``
    (default: weight 1 per word) is the word's corpus frequency.
    Stops early when no adjacent pair remains.  Returns one row per
    learned merge: (step, lhs, rhs, token, pair_count) with ``step``
    starting at 1 — exact integers, reproducible across any layout,
    and replayable round-for-round by a SQL engine (materialized-CTE
    unrolling; the corpus state is referenced twice per round).
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    cur = vocab.select(w.alias("w"), _initial_seq(word_col).alias("seq"))
    spark = vocab.sparkSession
    merges = []
    for r in range(1, int(rounds) + 1):
        toks = F.split(F.trim(F.col("seq")), "  ")
        pairs = (cur.withColumn("__t", toks)
                 .filter(F.size("__t") >= 2)
                 .select(
                     "w",
                     F.explode(F.zip_with(
                         F.expr("slice(__t, 1, size(__t) - 1)"),
                         F.expr("slice(__t, 2, size(__t) - 1)"),
                         lambda a, b: F.struct(a.alias("lhs"),
                                               b.alias("rhs"))
                     )).alias("p")))
        best = (pairs
                .groupBy(F.col("p.lhs").alias("lhs"),
                         F.col("p.rhs").alias("rhs"))
                .agg(F.sum("w").alias("cnt"))
                .orderBy(F.col("cnt").desc(), F.col("lhs").asc(),
                         F.col("rhs").asc())
                .limit(1)
                .collect())
        if not best:
            break
        lhs, rhs, cnt = best[0]["lhs"], best[0]["rhs"], int(best[0]["cnt"])
        merges.append((r, lhs, rhs, lhs + rhs, cnt))
        cur = cur.select(
            "w",
            F.replace(F.col("seq"), F.lit(f" {lhs}  {rhs} "),
                      F.lit(f" {lhs}{rhs} ")).alias("seq"))
    return spark.createDataFrame(
        merges,
        "step long, lhs string, rhs string, token string, "
        "pair_count long")


def bpe_segment(df: DataFrame, word_col: str,
                merges: list[tuple[str, str]],
                out_col: str = "bpe_seq") -> DataFrame:
    """Apply an ordered merge list to segment words: the inference
    half of :func:`bpe_train` (map-only; one literal replace per
    merge, same double-space invariant).  ``merges`` is the (lhs,
    rhs) list in training order.  Adds ``out_col`` with the symbols
    joined by single spaces."""
    seq = _initial_seq(word_col)
    for lhs, rhs in merges:
        seq = F.replace(seq, F.lit(f" {lhs}  {rhs} "),
                        F.lit(f" {lhs}{rhs} "))
    return df.withColumn(
        out_col, F.regexp_replace(F.trim(seq), "  ", " "))

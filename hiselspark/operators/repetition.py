"""Repetition / boilerplate quality metrics (Gopher-rule family).

Web-scale corpus curation filters documents whose text is dominated by
repeated fragments (Rae et al., "Scaling Language Models: ... Gopher",
2021, Appendix A1.1 — duplicate-line and top-n-gram fractions;
publicly reproduced in e.g. CCNet/RedPajama/Dolma pipelines).  This
module computes the n-gram half of those rules, re-expressed
relationally:

* ``n_tokens`` — whitespace token count;
* ``uniq_frac`` — distinct unigrams / tokens (low = repetitive);
* ``top{n}_frac`` — occurrences of the MOST frequent n-gram divided by
  the number of n-gram slots (``n_tokens - n + 1``), for n in 1..3.

Plan shape at 10^12 documents: ONE explode of all n-gram sizes tagged
``(n, gram)`` → ``groupBy(doc_id, n, gram)`` partial-aggregated count
→ ``groupBy(doc_id, n)`` max/distinct → conditional-aggregate pivot
back to one row per document.  Two shuffles, both keyed by doc_id(+…)
so they are skew-free by construction (a hot *gram* is never a key on
its own).  All expressions are JVM built-ins — no Python in the path —
and every output is a count or an exact integer ratio, so the driver
gate reproduces it in DuckDB verbatim (no string tie-breaking: only
counts leave the per-gram stage).
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_sizes: Sequence[int] = (1, 2, 3),
) -> DataFrame:
    """Per-document repetition metrics; one row per input row (docs
    with no tokens get ``n_tokens = 0`` and zero fractions)."""
    from ..functions.text import tokens
    sizes = sorted(set(int(n) for n in ngram_sizes))
    if not sizes or sizes[0] < 1:
        raise ValueError(f"ngram_sizes must be >= 1, got {ngram_sizes}")
    toks = tokens(text_col)
    gram_arrays = [
        F.expr(
            # sequence(1, 0) counts DOWN in Spark — guard short docs
            f"if(size(__toks) >= {n},"
            f" transform(sequence(1, size(__toks) - {n} + 1),"
            f" i -> struct({n} AS n,"
            f" array_join(slice(__toks, i, {n}), ' ') AS gram)),"
            f" cast(array() as array<struct<n:int,gram:string>>))")
        for n in sizes]
    grams = (df.select(F.col(id_col), toks.alias("__toks"))
             .select(id_col, F.size("__toks").alias("n_tokens"),
                     F.explode(F.flatten(F.array(*gram_arrays)))
                     .alias("g")))
    per_gram = (grams.groupBy(id_col, "n_tokens", F.col("g.n").alias(
        "n"), F.col("g.gram").alias("gram"))
        .agg(F.count("*").alias("cnt")))
    per_n = (per_gram.groupBy(id_col, "n_tokens", "n").agg(
        F.max("cnt").alias("top_cnt"),
        F.count("*").alias("n_distinct")))
    aggs = []
    for n in sizes:
        slots = F.greatest(F.col("n_tokens") - n + 1, F.lit(0))
        top = F.max(F.when(F.col("n") == n, F.col("top_cnt")))
        aggs.append(F.round(F.coalesce(top / slots, F.lit(0.0)), 6)
                    .alias(f"top{n}_frac"))
    uniq = F.max(F.when(F.col("n") == 1, F.col("n_distinct")))
    stats = (per_n.groupBy(id_col, "n_tokens").agg(
        F.round(F.coalesce(uniq / F.col("n_tokens"), F.lit(0.0)), 6)
        .alias("uniq_frac"), *aggs))
    # docs with zero tokens emit no grams — restore them with zeros
    return (df.select(id_col).join(stats, id_col, "left")
            .na.fill({"n_tokens": 0, "uniq_frac": 0.0,
                      **{f"top{n}_frac": 0.0 for n in sizes}}))

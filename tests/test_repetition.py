"""Repetition metrics vs a collections.Counter oracle."""
from collections import Counter

import pandas as pd

from hiselspark.operators.repetition import repetition_stats


def _oracle(text):
    toks = text.split()
    out = {"n_tokens": len(toks)}
    if not toks:
        return {**out, "uniq_frac": 0.0, "top1_frac": 0.0,
                "top2_frac": 0.0, "top3_frac": 0.0}
    out["uniq_frac"] = round(len(set(toks)) / len(toks), 6)
    for n in (1, 2, 3):
        grams = [" ".join(toks[i:i + n])
                 for i in range(len(toks) - n + 1)]
        out[f"top{n}_frac"] = (
            round(Counter(grams).most_common(1)[0][1] / len(grams), 6)
            if grams else 0.0)
    return out


def test_matches_counter_oracle(spark):
    texts = ["a b a b a", "x", "", "   ", "the cat sat on the mat",
             "w " * 50, "one two three two one two"]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = (repetition_stats(spark.createDataFrame(pdf).repartition(3))
           .toPandas().set_index("doc_id").sort_index())
    for i, t in enumerate(texts):
        exp = _oracle(t)
        for k, v in exp.items():
            assert abs(got.loc[i, k] - v) < 1e-9, (i, k, got.loc[i, k], v)


SF = "/root/testdata/sf0.001"


def test_real_corpus_bounds(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = repetition_stats(docs).toPandas()
    assert len(out) == docs.count()
    for c in ("uniq_frac", "top1_frac", "top2_frac", "top3_frac"):
        assert out[c].between(0, 1).all(), c
    # a maximally repetitive doc scores top1_frac 1.0; sanity: the
    # corpus itself is word soup, so top1_frac stays well below 1
    assert (out.loc[out.n_tokens > 10, "top1_frac"] < 0.5).all()

"""ndcg_at_k / pairwise_preferences vs brute-force NumPy/py oracles."""
from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest


def _frame(spark, n_queries=6, per_q=12, seed=31):
    rng = np.random.default_rng(seed)
    rows = []
    doc = 0
    for q in range(n_queries):
        for _ in range(per_q):
            rows.append((q, doc, int(rng.integers(0, 200)),
                         int(rng.integers(0, 150)),
                         int(rng.integers(0, 4))))
            doc += 1
    pdf = pd.DataFrame(rows, columns=["q", "doc", "sa", "sb", "rel"])
    return spark.createDataFrame(pdf), pdf


def test_ndcg_matches_brute(spark):
    from hiselspark.operators.rank_eval import ndcg_at_k
    df, pdf = _frame(spark)
    out = {r["query"]: r for r in
           ndcg_at_k(df, "q", "doc", "sa", "rel", k=5).collect()}
    for q, g in pdf.groupby("q"):
        def dcg(order):
            return sum((2 ** int(g.rel.iloc[i]) - 1)
                       / (math.log(r + 2) / math.log(2))
                       for r, i in enumerate(order[:5]))
        sys_o = sorted(range(len(g)),
                       key=lambda i: (-g.sa.iloc[i], g.doc.iloc[i]))
        ide_o = sorted(range(len(g)),
                       key=lambda i: (-g.rel.iloc[i], g.doc.iloc[i]))
        d, i_ = dcg(sys_o), dcg(ide_o)
        assert out[q]["dcg"] == pytest.approx(d, rel=1e-12)
        assert out[q]["idcg"] == pytest.approx(i_, rel=1e-12)
        assert out[q]["ndcg"] == pytest.approx(d / i_, rel=1e-12)
        assert out[q]["n_docs"] == len(g)


def test_ndcg_edge_cases(spark):
    from hiselspark.operators.rank_eval import ndcg_at_k
    # all-irrelevant query -> NULL ndcg (no 0/0); perfect ranking -> 1
    df = spark.createDataFrame(
        [(0, 1, 9, 0), (0, 2, 5, 0),
         (1, 3, 9, 2), (1, 4, 5, 1), (1, 5, 1, 0)],
        "q long, doc long, s long, rel long")
    out = {r["query"]: r for r in
           ndcg_at_k(df, "q", "doc", "s", "rel", k=10).collect()}
    assert out[0]["ndcg"] is None and out[0]["idcg"] == 0.0
    assert out[1]["ndcg"] == pytest.approx(1.0, abs=1e-15)


def test_pairwise_preferences_brute(spark):
    from hiselspark.operators.rank_eval import pairwise_preferences
    df, pdf = _frame(spark, seed=37)
    out = {r["query"]: r for r in
           pairwise_preferences(df, "q", "doc", "rel", "sa", "sb")
           .collect()}
    for q, g in pdf.groupby("q"):
        n = ac = at = bc = bt = both = 0
        for i in range(len(g)):
            for j in range(len(g)):
                if g.rel.iloc[i] > g.rel.iloc[j]:
                    n += 1
                    a = g.sa.iloc[i] > g.sa.iloc[j]
                    b = g.sb.iloc[i] > g.sb.iloc[j]
                    ac += a
                    bc += b
                    both += a and b
                    at += g.sa.iloc[i] == g.sa.iloc[j]
                    bt += g.sb.iloc[i] == g.sb.iloc[j]
        r = out[q]
        assert (r["n_pref_pairs"], r["a_correct"], r["a_tied"],
                r["b_correct"], r["b_tied"], r["both_correct"]) == \
            (n, ac, at, bc, bt, both)


def test_pairwise_perfect_ranker_wins_every_pair(spark):
    from hiselspark.operators.rank_eval import pairwise_preferences
    # ranker a == relevance (perfect), ranker b constant (all ties)
    df = spark.createDataFrame(
        [(0, d, r, r, 1) for d, r in enumerate([3, 1, 0, 2])],
        "q long, doc long, rel long, sa long, sb long")
    r = pairwise_preferences(df, "q", "doc", "rel", "sa", "sb") \
        .collect()[0]
    assert r["a_correct"] == r["n_pref_pairs"] == 6
    assert r["b_tied"] == 6 and r["b_correct"] == 0


def test_mrr_matches_brute(spark):
    from hiselspark.operators.rank_eval import mrr_at_k
    df, pdf = _frame(spark)
    # sparsify relevance so some queries miss the top k entirely
    pdf = pdf.assign(rel=(pdf.rel == 3).astype(int))
    df = spark.createDataFrame(pdf)
    out = {r["query"]: r for r in
           mrr_at_k(df, "q", "doc", "sa", "rel", k=3).collect()}
    for q, g in pdf.groupby("q"):
        order = sorted(range(len(g)),
                       key=lambda i: (-g.sa.iloc[i], g.doc.iloc[i]))
        fr = next((r + 1 for r, i in enumerate(order[:3])
                   if g.rel.iloc[i] > 0), None)
        got = out[q]
        assert got["first_rel_rank"] == fr
        assert got["hit"] == (fr is not None)
        import pytest as _pt
        assert got["rr"] == _pt.approx(
            0.0 if fr is None else 1.0 / fr, abs=1e-12)
        assert got["n_docs"] == len(g)

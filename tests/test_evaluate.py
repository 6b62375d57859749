"""Exact AUC / calibration / confusion vs NumPy reference."""
import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from hiselspark.operators.evaluate import (binary_auc, calibration_bins,
                                           confusion_at)


def _auc_ref(scores, labels):
    """Mann-Whitney with average ranks (ties exact) — the textbook
    definition, computed directly."""
    scores = np.asarray(scores, dtype=np.float64)
    labels = np.asarray(labels)
    order = np.argsort(scores, kind="mergesort")
    s, y = scores[order], labels[order]
    ranks = np.empty(len(s))
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[i:j] = (i + j + 1) / 2.0  # average 1-based rank
        i = j
    P = int(labels.sum())
    N = len(labels) - P
    return (ranks[y == 1].sum() - P * (P + 1) / 2) / (P * N)


def test_binary_auc_matches_rank_definition_with_ties(spark):
    rng = np.random.default_rng(3)
    n = 2000
    y = rng.integers(0, 2, n)
    # quantized score correlated with the label, MANY ties
    score = np.clip((y * 6 + rng.integers(0, 10, n)), 0, 15)
    pdf = pd.DataFrame({"score": score, "y": y})
    out = binary_auc(spark.createDataFrame(pdf), "score", "y").collect()[0]
    want = _auc_ref(score, y)
    assert out["auc"] == pytest.approx(want, abs=1e-12)
    assert out["n_pos"] == int(y.sum())
    assert out["n_neg"] == int((1 - y).sum())
    assert 0.75 < out["auc"] < 1.0  # informative score
    # perfect and inverted scores hit the boundaries
    perfect = binary_auc(
        spark.createDataFrame(pd.DataFrame({"score": y * 100, "y": y})),
        "score", "y").collect()[0]
    assert perfect["auc"] == 1.0
    anti = binary_auc(
        spark.createDataFrame(pd.DataFrame({"score": (1 - y) * 100,
                                            "y": y})),
        "score", "y").collect()[0]
    assert anti["auc"] == 0.0


def test_calibration_and_confusion(spark):
    rng = np.random.default_rng(13)
    n = 5000
    score = rng.integers(0, 1001, n)  # pseudo-probability * 1000
    y = (rng.uniform(size=n) < score / 1000.0).astype(int)  # calibrated
    pdf = pd.DataFrame({"score": score, "y": y})
    df = spark.createDataFrame(pdf)
    cal = (calibration_bins(df, "score", "y", n_bins=10,
                            score_scale=1000)
           .toPandas().sort_values("bin"))
    assert cal.n.sum() == n
    # a calibrated score: |mean_pred - frac_pos| small in every bin
    assert (np.abs(cal.mean_pred - cal.frac_pos) < 0.08).all()
    # monotone observed rate across bins (allow tiny noise)
    assert cal.frac_pos.iloc[-1] > cal.frac_pos.iloc[0] + 0.5
    conf = confusion_at(df, "score", "y", threshold=500).collect()[0]
    m = (score >= 500)
    assert conf["tp"] == int((m & (y == 1)).sum())
    assert conf["fp"] == int((m & (y == 0)).sum())
    assert conf["fn"] == int((~m & (y == 1)).sum())
    assert conf["tn"] == int((~m & (y == 0)).sum())
    prec = conf["tp"] / (conf["tp"] + conf["fp"])
    rec = conf["tp"] / (conf["tp"] + conf["fn"])
    assert conf["precision"] == pytest.approx(prec)
    assert conf["recall"] == pytest.approx(rec)
    assert conf["f1"] == pytest.approx(2 * prec * rec / (prec + rec))


def test_roc_curve_endpoints_and_auc_consistency(spark):
    from hiselspark.operators.evaluate import binary_auc, roc_curve
    rng = np.random.default_rng(7)
    n = 3000
    y = rng.integers(0, 2, n)
    score = np.clip(y * 5 + rng.integers(0, 8, n), 0, 12)
    df = spark.createDataFrame(pd.DataFrame({"score": score, "y": y}))
    roc = roc_curve(df, "score", "y").toPandas().sort_values(
        "threshold", ascending=False).reset_index(drop=True)
    # lowest threshold predicts everything positive
    assert roc.tpr.iloc[-1] == 1.0 and roc.fpr.iloc[-1] == 1.0
    # monotone non-decreasing along decreasing threshold
    assert (np.diff(roc.tpr) >= -1e-12).all()
    assert (np.diff(roc.fpr) >= -1e-12).all()
    # trapezoid area under the exact polyline == Mann-Whitney AUC
    fpr = np.concatenate([[0.0], roc.fpr.to_numpy()])
    tpr = np.concatenate([[0.0], roc.tpr.to_numpy()])
    area = np.trapz(tpr, fpr)
    auc = binary_auc(df, "score", "y").collect()[0]["auc"]
    assert area == pytest.approx(auc, abs=1e-12)


def test_gini_known_cases(spark):
    from hiselspark.operators.evaluate import gini_concentration
    # perfectly even totals: G is exactly 0
    even = pd.DataFrame({"g": list(range(10)) * 3, "v": 5})
    g1 = gini_concentration(spark.createDataFrame(even), "g",
                            "v").collect()[0]
    assert g1["gini"] == pytest.approx(0.0, abs=1e-12)
    assert g1["n_groups"] == 10 and g1["total"] == 150
    # one group holds everything: G = (n-1)/n
    skewed = pd.DataFrame({"g": range(10),
                           "v": [0] * 9 + [1000]})
    g2 = gini_concentration(spark.createDataFrame(skewed), "g",
                            "v").collect()[0]
    assert g2["gini"] == pytest.approx(0.9, abs=1e-12)


def test_markov_transitions_rowwise(spark):
    from hiselspark.operators.cooccur import markov_transitions
    t0 = pd.Timestamp("2024-01-01")
    seq = ["a", "b", "a", "b", "c", "a"]
    pdf = pd.DataFrame({
        "e": 1, "ts": [t0 + pd.Timedelta(minutes=i)
                       for i in range(len(seq))],
        "s": seq, "i": range(len(seq)),
    })
    out = (markov_transitions(spark.createDataFrame(pdf), "e", "ts",
                              "s", tiebreak=("i",))
           .toPandas().set_index(["cur", "nxt"]))
    # transitions: a->b (x2), b->a, b->c, c->a
    assert out.loc[("a", "b"), "n"] == 2
    assert out.loc[("a", "b"), "p"] == pytest.approx(1.0)
    assert out.loc[("b", "a"), "p"] == pytest.approx(0.5)
    assert out.loc[("b", "c"), "p"] == pytest.approx(0.5)
    assert out.loc[("c", "a"), "p"] == pytest.approx(1.0)
    assert len(out) == 4


def test_auc_by_period_matches_per_slice_auc(spark):
    from hiselspark.operators.evaluate import auc_by_period, binary_auc
    rng = np.random.default_rng(23)
    n = 4000
    period = rng.integers(0, 4, n)
    y = rng.integers(0, 2, n)
    # signal strength varies by period: AUC should differ per slice
    strength = np.array([8, 4, 2, 0])[period]
    score = np.clip(y * strength + rng.integers(0, 8, n), 0, 20)
    pdf = pd.DataFrame({"p": period, "score": score, "y": y})
    df = spark.createDataFrame(pdf)
    out = (auc_by_period(df, "score", "y", "p")
           .toPandas().set_index("p").sort_index())
    for p in range(4):
        want = binary_auc(df.filter(F.col("p") == p), "score",
                          "y").collect()[0]["auc"]
        assert out.loc[p, "auc"] == pytest.approx(want, abs=1e-12)
    # stronger signal -> higher AUC, zero signal -> ~0.5
    assert out.loc[0, "auc"] > out.loc[2, "auc"] > 0.5
    assert abs(out.loc[3, "auc"] - 0.5) < 0.05
    # single-class period -> NULL
    one = pd.DataFrame({"p": [9] * 5, "score": range(5), "y": 1})
    o2 = auc_by_period(spark.createDataFrame(one), "score", "y",
                       "p").collect()[0]
    assert o2["auc"] is None


def test_retrieval_metrics_hand_case(spark):
    from hiselspark.operators.evaluate import retrieval_metrics
    truth = pd.DataFrame({"probe_id": [1, 1, 1, 2, 2, 3],
                          "vec_id": [10, 11, 12, 20, 21, 30]})
    pred = pd.DataFrame({
        "probe_id": [1, 1, 1, 1, 2, 2, 3],
        "vec_id":   [99, 11, 98, 12, 20, 21, 97],
        "rk":       [1, 2, 3, 4, 1, 2, 1],
    })
    out = (retrieval_metrics(spark.createDataFrame(pred),
                             spark.createDataFrame(truth), k=3)
           .toPandas().set_index("probe_id").sort_index())
    # probe 1: top-3 = {99,11,98}; hits={11} of 3 relevant
    assert out.loc[1, "n_hit"] == 1 and out.loc[1, "n_rel"] == 3
    assert out.loc[1, "recall_at_3"] == pytest.approx(1 / 3)
    assert out.loc[1, "precision_at_3"] == pytest.approx(1 / 3)
    assert out.loc[1, "mrr"] == pytest.approx(1 / 2)  # first hit at rk2
    # probe 2: perfect 2/2 within top-3
    assert out.loc[2, "recall_at_3"] == pytest.approx(1.0)
    assert out.loc[2, "mrr"] == pytest.approx(1.0)
    # probe 3: retrieved nothing relevant -> zeros, still present
    assert out.loc[3, "n_hit"] == 0
    assert out.loc[3, "recall_at_3"] == 0.0
    assert out.loc[3, "mrr"] == 0.0


def test_best_f1_threshold_matches_brute(spark):
    from hiselspark.operators.evaluate import best_f1_threshold
    scores = [(i * 7 + 3) % 20 for i in range(200)]
    labels = [1 if s >= 12 or (s % 5 == 0) else 0 for s in scores]
    df = spark.createDataFrame(list(zip(scores, labels)),
                               "score long, lbl long")
    r = best_f1_threshold(df, "score", "lbl").collect()[0]
    p_tot = sum(labels)
    best = None
    for t in sorted(set(scores), reverse=True):
        tp = sum(1 for s, l in zip(scores, labels) if s >= t and l)
        pp = sum(1 for s in scores if s >= t)
        f1 = 2 * tp / (pp + p_tot)
        # ties to the HIGHEST threshold: strict > keeps the first
        # (descending) candidate
        if best is None or f1 > best[0]:
            best = (f1, t, tp, pp)
    f1, t, tp, pp = best
    assert r["threshold"] == t
    assert r["tp"] == tp and r["fp"] == pp - tp
    assert r["fn"] == p_tot - tp
    assert abs(r["f1"] - f1) < 1e-12
    assert abs(r["precision"] - tp / pp) < 1e-12
    assert abs(r["recall"] - tp / p_tot) < 1e-12

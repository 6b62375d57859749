"""Greedy HSIC search, categorical AMI search, permutohedron sampler,
and AMI statistic — modeled on the reference's own test corpus
(tests/hsic_test.py, tests/categorical_test.py) plus analytic AMI
oracles."""
import numpy as np
import pandas as pd
import pytest

from hiselspark import permutohedron, stats
from hiselspark.kernels import KernelKind, prefix_grams, rbf_gram_joint

from . import refshim

hisel = refshim.load_reference()


# ---------------------------------------------------------------------------
# permutohedron
# ---------------------------------------------------------------------------

def test_sample_permutations_valid():
    perms = permutohedron.sample_permutations(6, size=4, random_state=1)
    assert len(perms) >= 4
    for p in perms:
        assert sorted(p) == list(range(6))


def test_sample_permutations_degenerate():
    assert permutohedron.sample_permutations(1) == {(0,)}


# ---------------------------------------------------------------------------
# prefix grams vs reference
# ---------------------------------------------------------------------------

def test_prefix_grams_rbf_matches_reference():
    rng = np.random.default_rng(2)
    x = rng.uniform(size=(40, 5))
    ours = prefix_grams(x, KernelKind.RBF)
    ref = hisel.kernels.hsic_b(x.T.copy(), hisel.kernels.KernelType.RBF)
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-11)


def test_prefix_grams_delta_matches_reference():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 4, size=(30, 4))
    ours = prefix_grams(x, KernelKind.DELTA)
    ref = hisel.kernels.hsic_b(x.T.copy().astype(int),
                               hisel.kernels.KernelType.DELTA)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_prefix_gram_equals_joint_at_full_prefix():
    rng = np.random.default_rng(4)
    x = rng.uniform(size=(25, 3))
    ours = prefix_grams(x, KernelKind.RBF)
    np.testing.assert_allclose(
        ours[2], rbf_gram_joint(x, np.sqrt(3)), rtol=1e-9)


# ---------------------------------------------------------------------------
# AMI
# ---------------------------------------------------------------------------

def test_ami_identical_labelings():
    a = np.array([0, 0, 1, 1, 2, 2, 2])
    assert stats.adjusted_mutual_info(a, a) == pytest.approx(1.0)


def test_ami_label_renaming_invariant():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 4, size=300)
    b = rng.integers(0, 3, size=300)
    v1 = stats.adjusted_mutual_info(a, b)
    v2 = stats.adjusted_mutual_info(10 - a, b * 7 + 2)
    assert v1 == pytest.approx(v2, rel=1e-9)


def test_ami_independent_near_zero():
    rng = np.random.default_rng(6)
    a = rng.integers(0, 3, size=5000)
    b = rng.integers(0, 3, size=5000)
    assert abs(stats.adjusted_mutual_info(a, b)) < 0.01


def test_emi_matches_bruteforce_tiny():
    """Exact EMI vs brute-force enumeration over all permutations of a
    tiny labeling (the permutation model definition)."""
    from itertools import permutations as iperm
    a = np.array([0, 0, 1, 1])
    b = np.array([0, 1, 0, 1])
    table = stats.contingency(a, b)
    emi = stats.expected_mutual_info(table.sum(axis=1), table.sum(axis=0), 4)
    mis = [stats.mutual_info_from_table(
        stats.contingency(a, np.array(p))) for p in iperm(b)]
    assert emi == pytest.approx(np.mean(mis), rel=1e-9)


def test_quantile_discretise_matches_reference():
    rng = np.random.default_rng(7)
    y = rng.normal(size=500)
    ours = stats.quantile_discretise(y)
    ref = hisel.categorical._discretise(y.copy())
    np.testing.assert_array_equal(ours, ref.astype(np.int64))


def test_prefix_encode_matches_reference():
    rng = np.random.default_rng(8)
    x = rng.integers(0, 5, size=(100, 6))
    np.testing.assert_array_equal(stats.prefix_encode(x),
                                  hisel.categorical._encode(x))


# ---------------------------------------------------------------------------
# Spark-level searches
# ---------------------------------------------------------------------------

def test_hsic_search_recovers_pair(spark):
    """Reference fixture (tests/hsic_test.py:15-55): y = 1[x_a > x_b]
    must surface {a, b} among the selected features."""
    rng = np.random.default_rng(9)
    n, d = 1000, 8
    x = rng.uniform(size=(n, d))
    a, b = 2, 5
    y = (x[:, a] > x[:, b]).astype(np.int64)
    pdf = pd.DataFrame(x, columns=[f"f{i}" for i in range(d)])
    pdf["y"] = y
    sdf = spark.createDataFrame(pdf)

    from hiselspark.hsic_search import hsic_search
    sel = hsic_search(sdf, [f"f{i}" for i in range(d)], ["y"],
                      num_permutations=32, max_iter=3, random_state=0)
    assert {"f2", "f5"} <= set(sel)
    assert len(sel) <= 6


def test_hsic_statistic_dependence_ordering():
    rng = np.random.default_rng(10)
    x = rng.uniform(size=(400, 1))
    y_dep = x + 0.01 * rng.normal(size=(400, 1))
    y_ind = rng.uniform(size=(400, 1))
    from hiselspark.hsic_search import hsic_statistic
    assert hsic_statistic(x, y_dep) > 5 * hsic_statistic(x, y_ind)


def test_categorical_search_recovers_planted(spark):
    """Reference fixture (tests/categorical_test.py:17-51): integer
    linear combination of planted columns."""
    rng = np.random.default_rng(11)
    n, d = 3000, 8
    x = rng.integers(0, 5, size=(n, d))
    planted = [1, 4, 6]
    y = x[:, planted] @ np.array([1, 2, 3])
    pdf = pd.DataFrame(x, columns=[f"c{i}" for i in range(d)])
    pdf["y"] = y.astype(np.int64)
    sdf = spark.createDataFrame(pdf).repartition(4)

    from hiselspark.categorical import categorical_search
    sel = categorical_search(sdf, [f"c{i}" for i in range(d)], "y",
                             num_permutations=16, max_iter=2,
                             random_state=0)
    missed = {f"c{i}" for i in planted} - set(sel)
    spurious = set(sel) - {f"c{i}" for i in planted}
    assert len(missed) + len(spurious) <= 2  # reference grace bound


def test_categorical_select_discretises_float_target(spark):
    rng = np.random.default_rng(12)
    n, d = 2000, 5
    x = rng.integers(0, 4, size=(n, d))
    y = x[:, 2] * 2.5 + 0.01 * rng.normal(size=n)
    pdf = pd.DataFrame(x, columns=[f"c{i}" for i in range(d)])
    pdf["y"] = y
    sdf = spark.createDataFrame(pdf)
    from hiselspark.categorical import categorical_select
    sel = categorical_select(sdf, [f"c{i}" for i in range(d)], ["y"],
                             random_state=0)
    assert "c2" in sel


def test_api_select_features_mixed(spark):
    """End-to-end facade: continuous + discrete branches
    (reference tests/feature_selection_test.py:9-58 shape)."""
    rng = np.random.default_rng(13)
    n = 2000
    xc = rng.uniform(size=(n, 6))
    xd = rng.integers(0, 4, size=(n, 4))
    y = 2.0 * xc[:, 1] + xd[:, 3]
    pdf = pd.DataFrame(xc, columns=[f"g{i}" for i in range(6)])
    for i in range(4):
        pdf[f"c{i}"] = xd[:, i]
    pdf["y"] = y
    sdf = spark.createDataFrame(pdf).repartition(4)
    from hiselspark.api import select_features
    res = select_features(
        sdf, [f"g{i}" for i in range(6)] + [f"c{i}" for i in range(4)],
        ["y"])
    assert "g1" in res.selected_features
    assert "c3" in res.selected_features


# ---------------------------------------------------------------------------
# KSG mutual information (reference ksgmi estimator cross-check)
# ---------------------------------------------------------------------------

def test_ksg_mi_matches_gaussian_analytic():
    """KSG(1) on correlated Gaussians must approach the analytic
    MI = -0.5 ln(1 - rho^2) — validates the estimator itself (the
    reference delegates this math to sklearn; here it is exact NumPy
    with an integer-digamma table)."""
    from hiselspark.preselect import ksg_mi
    rng = np.random.default_rng(11)
    n, rho = 1500, 0.8
    x = rng.normal(size=n)
    y = rho * x + np.sqrt(1 - rho ** 2) * rng.normal(size=n)
    analytic = -0.5 * np.log(1 - rho ** 2)
    est = ksg_mi(x, y, k=3)
    assert abs(est - analytic) < 0.07, (est, analytic)
    # independence -> near zero
    assert ksg_mi(x, rng.normal(size=n), k=3) < 0.05


def test_ksg_discrete_target_detects_dependence():
    from hiselspark.preselect import ksg_mi
    rng = np.random.default_rng(12)
    n = 1200
    x = rng.normal(size=n)
    y = (x + 0.3 * rng.normal(size=n) > 0).astype(np.int64)
    dep = ksg_mi(x, y, k=3, discrete_target=True)
    ind = ksg_mi(rng.normal(size=n), y, k=3, discrete_target=True)
    assert dep > 0.25 and ind < 0.05, (dep, ind)


def test_histogram_and_ksg_agree_on_planted_ranking(spark):
    """The distributed histogram estimator and the reference-style KSG
    estimator must rank the same planted features on top, and
    mi_preselect(estimator='ksg') must keep exactly them — the
    estimator-gap reconciliation VERDICT asked for."""
    from hiselspark.preselect import mi_preselect
    rng = np.random.default_rng(13)
    n = 1500
    x0 = rng.normal(size=n)
    x1 = rng.normal(size=n)
    pdf = pd.DataFrame({
        "x0": x0, "x1": x1,
        "x2": rng.normal(size=n), "x3": rng.normal(size=n),
        "y": np.sin(2 * x0) + 0.5 * x1 + 0.2 * rng.normal(size=n),
    })
    df = spark.createDataFrame(pdf).repartition(5)
    cols = ["x0", "x1", "x2", "x3"]
    kept_h, mis_h = mi_preselect(df, cols, ["y"], threshold=0.3,
                                 exact_edges=True)
    kept_k, mis_k = mi_preselect(df, cols, ["y"], threshold=0.3,
                                 estimator="ksg")
    assert set(kept_h) == {"x0", "x1"}, (kept_h, mis_h.to_dict())
    assert set(kept_k) == {"x0", "x1"}, (kept_k, mis_k.to_dict())
    assert set(mis_h.sort_values().index[-2:]) == {"x0", "x1"}
    assert set(mis_k.sort_values().index[-2:]) == {"x0", "x1"}

"""corr_matrix / benford_digits / feature_cross vs NumPy oracles."""
import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from hiselspark.operators.encoding import feature_cross, hash_bucket
from hiselspark.operators.profile import benford_digits, corr_matrix


def test_corr_matrix_matches_numpy(spark):
    rng = np.random.default_rng(83)
    n = 1000
    a = rng.integers(0, 1000, n)
    b = 2 * a + rng.integers(0, 500, n)          # strongly correlated
    c = rng.integers(0, 1000, n)                  # independent
    const = np.full(n, 7)                         # zero variance
    pdf = pd.DataFrame({"a": a, "b": b, "c": c, "k": const})
    out = (corr_matrix(spark.createDataFrame(pdf),
                       ["a", "b", "c", "k"])
           .toPandas().set_index(["col_x", "col_y"]))
    assert (out["n"] == n).all()
    for x, y in [("a", "b"), ("a", "c"), ("b", "c")]:
        want = np.corrcoef(pdf[x], pdf[y])[0, 1]
        assert out.loc[(x, y), "corr"] == pytest.approx(want, abs=1e-9)
    assert out.loc[("a", "b"), "corr"] > 0.9
    assert abs(out.loc[("a", "c"), "corr"]) < 0.1
    # zero-variance column yields NULL, not a division blow-up
    assert pd.isna(out.loc[("a", "k"), "corr"])


def test_corr_matrix_layout_deterministic(spark):
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({"a": rng.integers(0, 100, 500),
                        "b": rng.integers(0, 100, 500)})
    df = spark.createDataFrame(pdf)
    r1 = corr_matrix(df, ["a", "b"]).collect()[0]["corr"]
    r2 = corr_matrix(df.repartition(11), ["a", "b"]).collect()[0]["corr"]
    assert r1 == r2  # bit-identical, not just close


def test_benford_digits_known_distribution(spark):
    # exact powers spread: values 1..999 uniformly — NOT Benford;
    # verify the counts and chi2 arithmetic, not conformance
    pdf = pd.DataFrame({"x": np.arange(-5, 1000)})  # negatives dropped
    out = (benford_digits(spark.createDataFrame(pdf), "x")
           .toPandas().set_index("digit").sort_index())
    vals = np.arange(1, 1000)
    first = np.array([int(str(v)[0]) for v in vals])
    n = len(vals)
    for d in range(1, 10):
        obs = int((first == d).sum())
        assert out.loc[d, "obs"] == obs == 111
        assert out.loc[d, "share"] == pytest.approx(obs / n)
        p = np.log10(1 + 1 / d)
        assert out.loc[d, "benford_p"] == pytest.approx(p)
        assert out.loc[d, "chi2"] == pytest.approx(
            (obs - n * p) ** 2 / (n * p), rel=1e-9)
    # uniform data must FAIL Benford loudly
    assert out["chi2"].sum() > 100


def test_feature_cross_buckets_and_determinism(spark):
    pdf = pd.DataFrame({
        "t": ["click", "view", "error", None] * 25,
        "h": list(range(10)) * 10,
    })
    df = spark.createDataFrame(pdf)
    out = feature_cross(df, ["t", "h"], n_buckets=16).toPandas()
    assert out.cross_bucket.between(0, 15).all()
    # same key -> same bucket; equals hash_bucket of the joined key
    ref = (df.withColumn("key", F.concat_ws(
               "|", F.coalesce(F.col("t").cast("string"), F.lit("")),
               F.col("h").cast("string")))
             .withColumn("hb", hash_bucket(F.col("key"), 16))
             .toPandas())
    assert (out.cross_bucket.to_numpy() == ref.hb.to_numpy()).all()
    # crossing is finer than either component alone
    keys = out.groupby("cross_bucket").size()
    assert len(keys) > 1


def test_chi2_independence_matches_manual(spark):
    rng = np.random.default_rng(97)
    n = 600
    a = rng.choice(["x", "y", "z"], n)
    # b depends on a for 'x' rows -> dependence must show
    b = np.where((a == "x") & (rng.uniform(size=n) < 0.7), "p",
                 rng.choice(["p", "q"], n))
    pdf = pd.DataFrame({"a": a, "b": b})
    from hiselspark.operators.profile import chi2_independence
    out = (chi2_independence(spark.createDataFrame(pdf), "a", "b")
           .toPandas())
    ct = pd.crosstab(pdf.a, pdf.b)
    chi2_total = 0.0
    for _, row in out.iterrows():
        obs = ct.loc[row.a, row.b]
        exp = ct.loc[row.a].sum() * ct[row.b].sum() / n
        assert row.obs == obs
        assert row.expected == pytest.approx(exp, rel=1e-12)
        assert row.chi2 == pytest.approx((obs - exp) ** 2 / exp,
                                         rel=1e-12)
        chi2_total += (obs - exp) ** 2 / exp
    assert (out.dof == (3 - 1) * (2 - 1)).all()
    v = np.sqrt(chi2_total / (n * (min(3, 2) - 1)))
    assert out.cramers_v.iloc[0] == pytest.approx(v, rel=1e-9)
    assert chi2_total > 9.21  # dependence detected at p<0.01, dof=2


def test_assoc_rules_counts_and_lift(spark):
    from hiselspark.operators.cooccur import assoc_rules
    baskets = {
        1: ["bread", "butter"],
        2: ["bread", "butter", "jam"],
        3: ["bread"],
        4: ["butter", "jam"],
        5: ["bread", "butter"],
        6: ["tea"],
    }
    rows = [(bk, it) for bk, its in baskets.items() for it in its]
    df = spark.createDataFrame(pd.DataFrame(rows,
                                            columns=["bk", "it"]))
    out = (assoc_rules(df, "bk", "it", min_pair_count=1)
           .toPandas().set_index(["item_a", "item_b"]))
    N = 6
    bb = out.loc[("bread", "butter")]
    assert bb.n_ab == 3 and bb.n_a == 4 and bb.n_b == 4
    assert bb.support == pytest.approx(3 / N)
    assert bb.conf_a_b == pytest.approx(3 / 4)
    assert bb.lift == pytest.approx(N * 3 / 16)
    assert bb.lift > 1  # bread and butter attract
    # max_basket_size drops the mega-basket entirely
    rows2 = rows + [(7, f"i{k}") for k in range(50)]
    df2 = spark.createDataFrame(pd.DataFrame(rows2,
                                             columns=["bk", "it"]))
    out2 = (assoc_rules(df2, "bk", "it", min_pair_count=1,
                        max_basket_size=10)
            .toPandas().set_index(["item_a", "item_b"]))
    assert out2.loc[("bread", "butter")].support == pytest.approx(3 / N)
    assert not any(i.startswith("i") for i, _ in out2.index)


def test_group_ols_matches_numpy_polyfit(spark):
    from hiselspark.operators.regress import group_ols
    rng = np.random.default_rng(41)
    frames = []
    truth = {}
    for g, (slope, icpt) in enumerate([(3, 100), (-2, 500), (0, 50)]):
        x = np.arange(40)
        y = slope * x + icpt + rng.integers(-5, 6, 40)
        truth[g] = (x, y)
        frames.append(pd.DataFrame({"g": g, "x": x, "y": y}))
    pdf = pd.concat(frames)
    out = (group_ols(spark.createDataFrame(pdf), "g", "x", "y")
           .toPandas().set_index("g"))
    for g, (x, y) in truth.items():
        sl, ic = np.polyfit(x, y, 1)
        r = np.corrcoef(x, y)[0, 1]
        assert out.loc[g, "n"] == 40
        assert out.loc[g, "slope"] == pytest.approx(sl, abs=1e-9)
        assert out.loc[g, "intercept"] == pytest.approx(ic, abs=1e-8)
        assert out.loc[g, "r2"] == pytest.approx(r * r, abs=1e-9)
    # strong trends fit tightly; the flat-noise group does not
    assert out.loc[0, "r2"] > 0.95 and out.loc[1, "r2"] > 0.95
    assert out.loc[2, "r2"] < 0.1
    # degenerate group: constant x -> NULL fit, no crash
    const = pd.DataFrame({"g": 9, "x": 5, "y": np.arange(10)})
    o2 = (group_ols(spark.createDataFrame(const), "g", "x", "y")
          .toPandas().iloc[0])
    assert pd.isna(o2.slope) and pd.isna(o2.r2)


def test_rank_normalize_matches_scipy_free_ecdf(spark):
    from hiselspark.operators.encoding import rank_normalize
    rng = np.random.default_rng(101)
    x = rng.integers(0, 50, 800)  # heavy ties
    pdf = pd.DataFrame({"i": range(len(x)), "v": x})
    out = (rank_normalize(spark.createDataFrame(pdf), "v",
                          out_col="u")
           .toPandas().sort_values("i").reset_index(drop=True))
    n = len(x)
    for val in np.unique(x):
        below = int((x < val).sum())
        tied = int((x == val).sum())
        want = (below + tied / 2.0) / n
        got = out.loc[out.v == val, "u"].unique()
        assert len(got) == 1  # ties share one normalized value
        assert got[0] == pytest.approx(want, abs=1e-12)
    assert (out.u > 0).all() and (out.u < 1).all()
    # rank-uniform: mean of u is exactly 0.5 (average-rank convention)
    assert out.u.mean() == pytest.approx(0.5, abs=1e-12)


def test_trimmed_mean_matches_scipy_free_reference(spark):
    from hiselspark.operators.profile import trimmed_mean
    rng = np.random.default_rng(107)
    x = rng.integers(0, 1000, 997)            # odd n, heavy ties
    x[:5] = 10**6                             # planted outliers
    pdf = pd.DataFrame({"v": x})
    row = trimmed_mean(spark.createDataFrame(pdf), "v",
                       0.05).collect()[0]
    k = int(np.floor(len(x) * 0.05))
    s = np.sort(x)
    want = s[k:len(x) - k].mean()
    assert row["trimmed_mean"] == pytest.approx(want, abs=1e-9)
    assert row["n_used"] == len(x) - 2 * k
    assert row["n_trimmed_each_side"] == k
    # robustness: outliers dominate the raw mean, not the trimmed one
    assert row["raw_mean"] > 5 * row["trimmed_mean"]
    # zero trim degenerates to the plain mean
    z = trimmed_mean(spark.createDataFrame(pdf), "v", 0.0).collect()[0]
    assert z["trimmed_mean"] == pytest.approx(x.mean(), abs=1e-9)


def test_winsorized_mean_matches_reference(spark):
    from hiselspark.operators.profile import winsorized_mean
    rng = np.random.default_rng(113)
    x = rng.integers(0, 1000, 900)
    x[:4] = 10**6  # outliers to clamp
    pdf = pd.DataFrame({"v": x})
    row = winsorized_mean(spark.createDataFrame(pdf), "v",
                          0.05).collect()[0]
    k = int(np.floor(len(x) * 0.05))
    s = np.sort(x)
    wref = s.copy()
    wref[:k] = s[k]
    wref[len(x) - k:] = s[len(x) - k - 1]
    assert row["winsorized_mean"] == pytest.approx(wref.mean(),
                                                   abs=1e-9)
    assert row["lo_clamp"] == s[k]
    assert row["hi_clamp"] == s[len(x) - k - 1]
    assert row["n"] == len(x)
    # outliers clamped, not dominating
    assert row["winsorized_mean"] < 2000


def test_trim_frac_validation(spark):
    from hiselspark.operators.profile import (trimmed_mean,
                                              winsorized_mean)
    df = spark.createDataFrame(pd.DataFrame({"v": [1, 2, 3, 4]}))
    for bad in (0.5, 0.7, -0.01, 1.0):
        with pytest.raises(ValueError):
            trimmed_mean(df, "v", bad)
        with pytest.raises(ValueError):
            winsorized_mean(df, "v", bad)
    # boundary just below 0.5 still works (keeps the middle slice)
    assert trimmed_mean(df, "v", 0.49).collect()[0]["n_used"] == 4 - 2


def test_ks_statistic_ignores_null_values(spark):
    from hiselspark.operators.drift import ks_statistic
    pdf = pd.DataFrame({
        "v": pd.array([1, 2, 3, 4, 5, 6, None, None], dtype="Int64"),
        "grp": [1, 1, 1, 1, 0, 0, 1, 0],
    })
    df = spark.createDataFrame(pdf)
    with_null = ks_statistic(df, "v", F.col("grp") == 1).collect()[0]
    clean = ks_statistic(df.filter(F.col("v").isNotNull()), "v",
                         F.col("grp") == 1).collect()[0]
    assert with_null["ks"] == clean["ks"]
    assert with_null["n_ref"] == 4 and with_null["n_cur"] == 2
    assert with_null["at_value"] == clean["at_value"]


def test_wasserstein_1_matches_sorted_sample_formula(spark):
    """For equal-size samples W1 = mean |sorted(x) - sorted(y)| — the
    classic one-dimensional optimal-transport closed form; the
    count-table integral must agree exactly."""
    import numpy as np
    from hiselspark.operators.drift import wasserstein_1
    rng = np.random.default_rng(5)
    x = rng.integers(0, 500, 400)
    y = rng.integers(100, 700, 400)
    rows = ([(int(v), 1) for v in x] + [(int(v), 0) for v in y])
    df = spark.createDataFrame(rows, "v long, grp int")
    got = wasserstein_1(df, "v", F.col("grp") == 1).collect()[0]
    expect = float(np.abs(np.sort(x) - np.sort(y)).mean())
    assert got.n_ref == 400 and got.n_cur == 400
    assert abs(got.w1 - expect) < 1e-9


def test_wasserstein_1_zero_on_identical_and_shift(spark):
    import numpy as np
    from hiselspark.operators.drift import wasserstein_1
    vals = list(range(100))
    rows = [(v, 1) for v in vals] + [(v, 0) for v in vals]
    df = spark.createDataFrame(rows, "v long, grp int")
    assert wasserstein_1(df, "v", F.col("grp") == 1).collect()[0].w1 == 0.0
    # a constant shift of c moves W1 to exactly c
    rows = [(v, 1) for v in vals] + [(v + 7, 0) for v in vals]
    df = spark.createDataFrame(rows, "v long, grp int")
    assert abs(wasserstein_1(df, "v", F.col("grp") == 1)
               .collect()[0].w1 - 7.0) < 1e-9


def test_ks_by_feature_matches_single_column_ks(spark):
    """ks_by_feature (all features, one unpivoted shuffle) must agree
    with running ks_statistic per column."""
    from pyspark.sql import functions as F
    from hiselspark.operators.drift import ks_by_feature, ks_statistic
    rows = [(i, (i * 7) % 5, (i * 3) % 4 + (2 if i < 40 else 0),
             i < 40) for i in range(100)]
    df = spark.createDataFrame(rows, "i long, fa long, fb long, ref boolean")
    multi = {r["feature"]: r for r in
             ks_by_feature(df, ["fa", "fb"], F.col("ref")).collect()}
    for c in ("fa", "fb"):
        single = ks_statistic(df, c, F.col("ref")).collect()[0]
        m = multi[c]
        assert m["ks"] == single["ks"], c
        assert m["at_value"] == single["at_value"]
        assert m["n_ref"] == single["n_ref"]
        assert m["n_cur"] == single["n_cur"]
    # fb has a planted shift, fa does not
    assert multi["fb"]["ks"] > multi["fa"]["ks"]

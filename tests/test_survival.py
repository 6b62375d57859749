"""Kaplan-Meier curve vs the textbook hand computation."""
import numpy as np
import pandas as pd
import pytest

from hiselspark.operators.survival import km_curve


def test_km_matches_textbook_example(spark):
    # classic small example: durations with events (1) and censors (0)
    data = [(6, 1), (6, 1), (6, 1), (6, 0), (7, 1), (9, 0), (10, 1),
            (10, 0), (11, 0), (13, 1), (16, 1), (17, 0), (19, 0),
            (20, 0), (22, 1), (23, 1), (25, 0), (32, 0), (32, 0),
            (34, 0), (35, 0)]  # Freireich 6-MP arm (n=21)
    pdf = pd.DataFrame(data, columns=["d", "e"])
    pdf["cohort"] = "mp"
    out = (km_curve(spark.createDataFrame(pdf), "cohort", "d", "e")
           .toPandas().sort_values("d").set_index("d"))
    # hand-computed KM values for the 6-MP arm (standard reference)
    assert out.loc[6, "n_at_risk"] == 21
    assert out.loc[6, "survival"] == pytest.approx(1 - 3 / 21)
    assert out.loc[7, "n_at_risk"] == 17
    assert out.loc[7, "survival"] == pytest.approx(
        (1 - 3 / 21) * (1 - 1 / 17))
    assert out.loc[10, "n_at_risk"] == 15
    assert out.loc[10, "survival"] == pytest.approx(
        (1 - 3 / 21) * (1 - 1 / 17) * (1 - 1 / 15))
    # censoring-only times leave survival unchanged
    assert out.loc[9, "survival"] == pytest.approx(
        out.loc[7, "survival"])
    # survival is non-increasing and within (0, 1]
    s = out.sort_index()["survival"].to_numpy()
    assert (np.diff(s) <= 1e-12).all()
    assert s[0] <= 1.0 and s[-1] > 0.0


def test_km_layout_deterministic_and_multi_cohort(spark):
    rng = np.random.default_rng(29)
    n = 500
    pdf = pd.DataFrame({
        "cohort": rng.choice(["a", "b"], n),
        "d": rng.integers(1, 30, n),
        "e": rng.integers(0, 2, n),
    })
    df = spark.createDataFrame(pdf)
    o1 = (km_curve(df, "cohort", "d", "e")
          .toPandas().sort_values(["cohort", "d"]).reset_index(drop=True))
    o2 = (km_curve(df.repartition(17), "cohort", "d", "e")
          .toPandas().sort_values(["cohort", "d"]).reset_index(drop=True))
    assert o1.equals(o2)  # bit-identical incl. the float product
    # cohorts independent: at-risk totals match each cohort's size
    for c in ("a", "b"):
        first = o1[o1.cohort == c].iloc[0]
        assert first.n_at_risk == (pdf.cohort == c).sum()

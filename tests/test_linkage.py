"""fs_weights vs a hand-counted Fellegi-Sunter table."""
import math

import pytest

from pyspark.sql import functions as F

from hiselspark.operators.linkage import fs_weights


def test_fs_weights_match_hand_counts(spark):
    # labeled pairs: (agree_a, agree_b, is_match)
    pairs = [
        (True, True, True), (True, False, True), (True, True, True),
        (False, True, False), (True, False, False),
        (False, False, False), (False, False, False),
        (True, True, False),
    ]
    df = spark.createDataFrame(pairs, "aga boolean, agb boolean, mt boolean")
    out = {r["field"]: r for r in fs_weights(
        df, [("a", F.col("aga")), ("b", F.col("agb"))],
        F.col("mt")).collect()}
    n_m = sum(1 for *_, m in pairs if m)
    n_u = len(pairs) - n_m
    for field, idx in (("a", 0), ("b", 1)):
        m_num = sum(1 for p in pairs if p[2] and p[idx])
        u_num = sum(1 for p in pairs if not p[2] and p[idx])
        r = out[field]
        assert r["m_num"] == m_num and r["m_den"] == n_m
        assert r["u_num"] == u_num and r["u_den"] == n_u
        want = math.log(((m_num + 1) / (n_m + 2))
                        / ((u_num + 1) / (n_u + 2)))
        assert r["weight"] == pytest.approx(want, abs=1e-12)
    # a discriminative field must weigh positive, and agreeing on it
    # among matches more often than b makes it the heavier field
    assert out["a"]["weight"] > 0


def test_fs_weights_requires_fields(spark):
    df = spark.createDataFrame([(True,)], "mt boolean")
    with pytest.raises(ValueError):
        fs_weights(df, [], F.col("mt"))

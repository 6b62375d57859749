"""Sketch aggregates: HLL error bound, GK rank guarantee, determinism."""
import numpy as np
import pytest
import pandas as pd

from hiselspark.operators.sketches import approx_distinct, approx_quantiles


def _data(spark):
    rng = np.random.default_rng(47)
    pdf = pd.DataFrame({
        "g": np.repeat(["a", "b"], 5000),
        "u": np.concatenate([rng.integers(0, 800, 5000),
                             rng.integers(0, 3000, 5000)]),
        "v": rng.normal(size=10000)})
    return spark.createDataFrame(pdf)


def test_hll_within_bound_and_deterministic(spark):
    df = _data(spark)
    out = (approx_distinct(df, "g", "u", rsd=0.05).toPandas()
           .set_index("g"))
    for g in ("a", "b"):
        exact, approx = out.loc[g, "n_exact"], out.loc[g, "n_approx"]
        assert abs(approx - exact) <= 0.15 * exact, (g, exact, approx)
    out2 = (approx_distinct(df.repartition(13), "g", "u", rsd=0.05)
            .toPandas().set_index("g"))
    assert (out["n_approx"].sort_index()
            == out2["n_approx"].sort_index()).all()


def test_gk_quantiles_within_rank_error(spark):
    df = _data(spark)
    out = (approx_quantiles(df, "g", "v", [0.25, 0.5, 0.75],
                            accuracy=1000).toPandas().set_index("g"))
    pdf = df.toPandas()
    for g, grp in pdf.groupby("g"):
        v = np.sort(grp["v"].values)
        n = len(v)
        for p, col in ((0.25, "q25"), (0.5, "q50"), (0.75, "q75")):
            est = out.loc[g, col]
            rank = np.searchsorted(v, est, side="right")
            assert (p - 2e-3) * n <= rank <= (p + 2e-3) * n + 1, \
                (g, col, rank / n)


def test_heavy_hitters_exact_on_skewed_stream(spark):
    from hiselspark.operators.sketches import heavy_hitters
    rng = np.random.default_rng(3)
    # zipf-ish: a few hot values + a long uniform tail, shuffled and
    # spread over many partitions so per-partition MG really prunes
    vals = (["hot_a"] * 4000 + ["hot_b"] * 2500 + ["warm"] * 900
            + [f"tail{i}" for i in rng.integers(0, 5000, 12600)])
    rng.shuffle(vals)
    df = spark.createDataFrame(pd.DataFrame({"v": vals})).repartition(16)
    k = 20
    out = (heavy_hitters(df, "v", k=k).toPandas()
           .set_index("v")["n"].to_dict())
    exact = pd.Series(vals).value_counts()
    expected = {v: int(c) for v, c in exact.items()
                if c * (k + 1) > len(vals)}
    assert out == expected
    assert "hot_a" in out and out["hot_a"] == 4000


def test_heavy_hitters_all_pass_tiny_input(spark):
    from hiselspark.operators.sketches import heavy_hitters
    df = spark.createDataFrame(pd.DataFrame({"v": ["x", "x", "y"]}))
    out = heavy_hitters(df, "v", k=5).toPandas().set_index("v")["n"]
    # threshold N/(k+1) = 0.5: both values qualify with exact counts
    assert out.to_dict() == {"x": 2, "y": 1}


def test_char_entropy_matches_numpy(spark):
    from hiselspark.functions.text import char_entropy
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["aaaa", "abab", "the quick brown fox", ""],
    })
    out = (char_entropy(spark.createDataFrame(pdf), "doc_id", "text")
           .toPandas().set_index("doc_id")["char_entropy"])
    for i, t in zip(pdf["doc_id"], pdf["text"]):
        if not t:
            assert pd.isna(out[i])
            continue
        c = pd.Series(list(t)).value_counts().to_numpy().astype(float)
        p = c / c.sum()
        assert out[i] == pytest.approx(float(-(p * np.log(p)).sum()),
                                       abs=1e-12)
    assert out[0] == 0.0            # single-char text: zero entropy
    assert out[1] == pytest.approx(np.log(2))


def test_heavy_hitters_per_group_exact(spark):
    from hiselspark.operators.sketches import heavy_hitters_per_group
    rng = np.random.default_rng(9)
    rows = []
    for g, hot, nhot in (("en", "the", 600), ("de", "der", 400),
                         ("fr", "le", 50)):
        rows += [(g, hot)] * nhot
        rows += [(g, f"w{i}") for i in rng.integers(0, 3000, 5000)]
    pdf = pd.DataFrame(rows, columns=["g", "v"])
    df = spark.createDataFrame(pdf).repartition(16)
    k = 25
    out = (heavy_hitters_per_group(df, "g", "v", k=k).toPandas())
    got = {(r.g, r.v): r.n for r in out.itertuples()}
    exact = pdf.groupby(["g", "v"]).size()
    ng = pdf.groupby("g").size()
    expected = {(g, v): int(c) for (g, v), c in exact.items()
                if c * (k + 1) > ng[g]}
    assert got == expected
    assert ("en", "the") in got and got[("en", "the")] == 600
    # 'le' in fr: 50 of 5050 -> below 5050/26, must NOT appear
    assert ("fr", "le") not in got


def test_token_logprob_matches_numpy(spark):
    from hiselspark.functions.text import token_logprob
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["the cat sat", "the the the", "zyzzyva", ""],
    })
    out = (token_logprob(spark.createDataFrame(pdf), "doc_id", "text")
           .toPandas().set_index("doc_id")["token_logprob"])
    toks = [t.lower().split() for t in pdf["text"]]
    vocab = pd.Series([w for ts in toks for w in ts]).value_counts()
    n = float(vocab.sum())
    for i, ts in zip(pdf["doc_id"], toks):
        if not ts:
            assert pd.isna(out[i])
            continue
        exp = float(np.mean([np.log(vocab[w] / n) for w in ts]))
        assert out[i] == pytest.approx(exp, abs=1e-12)
    # fluent doc (common tokens) outranks the rare-token doc
    assert out[1] > out[2]

"""Deterministic sampling: layout independence, quota correctness,
duplicate coherence, pandas oracle."""
import numpy as np
import pandas as pd
import pytest

from hiselspark.operators.sampling import (hash_sample, quota_sample,
                                           token_budget_sample)


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(41)
    srcs = ["web", "web", "web", "books", "code"]  # skewed groups
    rows = [(i, f"text body {rng.integers(0, 150)}",
             srcs[int(rng.integers(0, len(srcs)))])
            for i in range(400)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "source"]))


def test_hash_sample_layout_independent_and_content_keyed(spark, docs):
    a = hash_sample(docs.repartition(3), 0.3)
    b = hash_sample(docs.repartition(17), 0.3)
    ids_a = sorted(r.doc_id for r in a.select("doc_id").collect())
    ids_b = sorted(r.doc_id for r in b.select("doc_id").collect())
    assert ids_a == ids_b
    # content-keyed: duplicate texts are kept or dropped together
    kept = set(r.text for r in a.select("text").collect())
    pdf = docs.toPandas()
    for t, grp in pdf.groupby("text"):
        assert (t in kept) == (grp.doc_id.iloc[0] in ids_a) or \
            all((d in ids_a) == (t in kept) for d in grp.doc_id)
    # roughly the right fraction
    assert 0.15 <= len(ids_a) / len(pdf) <= 0.45
    # frac edges
    assert hash_sample(docs, 0.0).count() == 0
    assert hash_sample(docs, 1.0).count() == len(pdf)


def test_quota_cap_and_layout_independence(spark, docs):
    a = quota_sample(docs.repartition(2), "source", cap=30)
    b = quota_sample(docs.repartition(19), "source", cap=30)
    pa = a.toPandas().sort_values("doc_id").reset_index(drop=True)
    pb = b.toPandas().sort_values("doc_id").reset_index(drop=True)
    assert pa.equals(pb)
    counts = pa.groupby("source").size()
    assert (counts <= 30).all()
    # groups smaller than the cap are untouched
    full = docs.toPandas().groupby("source").size()
    for s, n in full.items():
        assert counts.get(s, 0) == min(n, 30), s
    assert list(pa.columns) == ["doc_id", "text", "source"]


def _budget_oracle(pri_pdf, budget, budgets=None):
    """Exact rule: keep iff own global prefix-sum <= group budget."""
    keep = set()
    for s, g in pri_pdf.groupby("source"):
        b = (budgets or {}).get(s, budget)
        run = 0
        for _, r in g.sort_values(["h", "doc_id"]).iterrows():
            run += r["n"]
            if run <= b:
                keep.add(r["doc_id"])
            else:
                break
    return keep


@pytest.mark.parametrize("budget", [0, 7, 40, 200, 10**6])
def test_token_budget_exact_across_layouts(spark, docs, budget):
    from pyspark.sql import functions as F
    from hiselspark.operators.splits import content_hash
    pri = (docs.select(
        "doc_id", "source", content_hash("text").alias("h"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("n")).toPandas())
    exp = _budget_oracle(pri, budget)
    for parts in (1, 3, 23):
        got = set(r.doc_id for r in token_budget_sample(
            docs.repartition(parts), "source", budget)
            .select("doc_id").collect())
        assert got == exp, (budget, parts, got ^ exp)


def test_token_budget_per_group_overrides(spark, docs):
    from pyspark.sql import functions as F
    from hiselspark.operators.splits import content_hash
    pri = (docs.select(
        "doc_id", "source", content_hash("text").alias("h"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("n")).toPandas())
    budgets = {"web": 30, "books": 10**6}
    exp = _budget_oracle(pri, 12, budgets)
    got = set(r.doc_id for r in token_budget_sample(
        docs.repartition(7), "source", 12, budgets=budgets)
        .select("doc_id").collect())
    assert got == exp
    # the unlimited group is fully kept
    pdf = docs.toPandas()
    assert set(pdf[pdf.source == "books"].doc_id) <= got


def test_quota_matches_pandas_priority_oracle(spark, docs):
    from hiselspark.operators.splits import content_hash
    from pyspark.sql import functions as F
    got = quota_sample(docs, "source", cap=25)
    pri = (docs.select("doc_id", "source",
                       content_hash("text").alias("h")).toPandas())
    exp = set()
    for s, g in pri.groupby("source"):
        exp |= set(g.sort_values(["h", "doc_id"]).head(25)["doc_id"])
    assert set(r.doc_id for r in got.select("doc_id").collect()) == exp


def test_temperature_budgets_and_mix(spark, docs):
    from hiselspark.functions.text import token_count
    from hiselspark.operators.sampling import (temperature_budgets,
                                               temperature_mix)
    from pyspark.sql import functions as F
    masses = {r["source"]: r["t"] for r in
              docs.groupBy("source")
              .agg(F.sum(token_count("text")).alias("t")).collect()}
    total = 600
    # alpha=1: budgets proportional to group token mass
    b1 = temperature_budgets(docs, "source", 1.0, total)
    assert sum(b1.values()) <= total
    denom = sum(masses.values())
    for g, b in b1.items():
        assert b == (total * masses[g]) // denom
    # alpha=0: budgets equal regardless of mass
    b0 = temperature_budgets(docs, "source", 0.0, total)
    assert len(set(b0.values())) == 1
    # alpha=0.5 boosts the smallest group relative to its natural share
    b5 = temperature_budgets(docs, "source", 0.5, total)
    smallest = min(masses, key=masses.get)
    assert b5[smallest] / total > masses[smallest] / denom
    # the mix respects every group's budget exactly
    mixed = temperature_mix(docs, "source", 0.5, total)
    kept = {r["source"]: r["t"] for r in
            mixed.groupBy("source")
            .agg(F.sum(token_count("text")).alias("t")).collect()}
    for g, tok in kept.items():
        assert tok <= b5[g]
    # layout-independent: same rows from a different partitioning
    alt = temperature_mix(docs.repartition(13), "source", 0.5, total)
    assert sorted(r["doc_id"] for r in alt.collect()) == \
        sorted(r["doc_id"] for r in mixed.collect())


def test_negative_samples_properties(spark):
    """Determinism, k slots per positive, negatives in range and never
    equal to their own positive, roughly uniform spread."""
    import pytest as _pytest
    from pyspark.sql import functions as F
    from hiselspark.operators.sampling import negative_samples
    pos = spark.createDataFrame(
        [(u, (u * 3) % 50) for u in range(200)], "u long, it long")
    a = negative_samples(pos, "u", "it", n_items=50, k=4).collect()
    b = negative_samples(pos, "u", "it", n_items=50, k=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 200 * 4
    for r in a:
        assert 0 <= r["neg_item"] < 50
        assert r["neg_item"] != r["item"]
        assert 1 <= r["slot"] <= 4
    # spread: every item id drawn at least once over 800 draws
    drawn = {r["neg_item"] for r in a}
    assert len(drawn) >= 45
    with _pytest.raises(ValueError):
        negative_samples(pos, "u", "it", n_items=1, k=4)

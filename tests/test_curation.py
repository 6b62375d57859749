"""End-to-end curation pipeline: stage effects, composition, and
layout independence."""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hiselspark.curation import curate_corpus


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(60):
        rows.append((i, f"src{i % 3}",
                     f"doc {i} body with words " + " ".join(
                         f"w{j}{i % 7}" for j in range(30))))
    rows.append((100, "src0", "tiny doc"))                # < min_tokens
    rows.append((101, "src0", "spam " * 40 + "end"))      # repetitive
    rows.append((102, "src1", rows[5][2]))                # exact dup
    rows.append((103, "src1",
                 "mail zoe@corp.io " + " ".join(
                     f"q{j}" for j in range(25))))        # has PII
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "text"]))


def test_stages_bite_and_compose(spark, corpus):
    res = curate_corpus(corpus, min_tokens=10, max_top1_frac=0.3,
                        seq_len=64, n_streams=2)
    kept = res.docs.toPandas()
    ids = set(kept.doc_id)
    assert 100 not in ids          # too short
    assert 101 not in ids          # top1_frac ('spam') too high
    assert 102 not in ids and 5 in ids   # dup collapsed to min id
    assert 103 in ids
    # PII was scrubbed before packing
    t103 = kept.loc[kept.doc_id == 103, "text"].iloc[0]
    assert "<EMAIL>" in t103 and "zoe@corp.io" not in t103
    # manifest accounts for every surviving token exactly once
    from hiselspark.functions.text import token_count
    total = (res.docs.select(
        F.sum(token_count("text")).alias("s")).collect()[0].s)
    man = res.manifest.toPandas()
    assert man["n_tokens"].sum() == total
    # non-tail sequences are full
    tail = man.groupby("stream")["seq"].transform("max") == man["seq"]
    assert (man.loc[~tail, "n_tokens"] == 64).all()


def test_budget_stage_and_layout_independence(spark, corpus):
    a = curate_corpus(corpus.repartition(2), min_tokens=5,
                      max_top1_frac=0.5, group_col="source",
                      token_budget=300, seq_len=64, n_streams=2)
    b = curate_corpus(corpus.repartition(13), min_tokens=5,
                      max_top1_frac=0.5, group_col="source",
                      token_budget=300, seq_len=64, n_streams=2)
    pa = (a.segments.toPandas()
          .sort_values(["stream", "seq", "offset"])
          .reset_index(drop=True))
    pb = (b.segments.toPandas()
          .sort_values(["stream", "seq", "offset"])
          .reset_index(drop=True))
    assert pa.equals(pb)
    # budget bites: per-source surviving tokens <= 300
    from hiselspark.functions.text import token_count
    per_src = (a.docs.groupBy("source")
               .agg(F.sum(token_count("text")).alias("s")).toPandas())
    assert (per_src["s"] <= 300).all()
    with pytest.raises(ValueError, match="group_col"):
        curate_corpus(corpus, token_budget=10)


def test_ppmi_cooccurrence_toy_corpus(spark):
    from hiselspark.operators.cooccur import ppmi_cooccurrence
    docs = pd.DataFrame({
        "doc_id": range(8),
        "text": ["cat dog", "cat dog", "cat dog", "cat dog",
                 "cat fish", "dog bird", "fish bird", "fish bird"],
    })
    out = (ppmi_cooccurrence(spark.createDataFrame(docs), "doc_id",
                             "text", vocab_size=4)
           .toPandas().set_index(["tok_a", "tok_b"]))
    # cat&dog co-occur 4x: PMI = ln(8*4/(5*5)) = ln(1.28) > 0
    r = out.loc[("cat", "dog")]
    assert r.nab == 4 and r.na == 5 and r.nb == 5
    assert r.ppmi == pytest.approx(np.log(8 * 4 / 25))
    # bird&fish: 2 of 3x3 -> ln(16/9) > 0; cat&bird never co-occur
    assert out.loc[("bird", "fish")].ppmi == pytest.approx(
        np.log(8 * 2 / 9))
    assert ("bird", "cat") not in out.index  # never co-occur: no row
    # under-indexing pair clamped at 0: cat&fish ln(8*1/(5*3)) < 0
    assert out.loc[("cat", "fish")].ppmi == 0.0


def test_ppmi_embeddings_reconstruct_and_cluster(spark):
    from hiselspark.operators.cooccur import ppmi_embeddings
    rng = np.random.default_rng(19)
    # two topical clusters of tokens; docs draw from one cluster
    A = ["alpha", "beta", "gamma", "delta"]
    B = ["red", "green", "blue", "white"]
    texts = []
    for i in range(200):
        pool = A if i % 2 == 0 else B
        texts.append(" ".join(rng.choice(pool, size=3)))
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(200), "text": texts}))
    emb, lam = ppmi_embeddings(docs, vocab_size=8, dim=4)
    pdf = emb.toPandas().set_index("token")
    V = {t: np.array(v) for t, v in pdf.vector.items()}
    def cos(a, b):
        return (V[a] @ V[b]) / (np.linalg.norm(V[a])
                                * np.linalg.norm(V[b]) + 1e-12)
    # same-cluster similarity beats cross-cluster
    within = np.mean([cos("alpha", "beta"), cos("red", "green")])
    across = np.mean([cos("alpha", "red"), cos("beta", "blue")])
    assert within > across + 0.3
    assert (np.asarray(lam) >= 0).all()
    # deterministic across layouts
    emb2, _ = ppmi_embeddings(docs.repartition(7), vocab_size=8, dim=4)
    p2 = emb2.toPandas().set_index("token")
    for t in V:
        assert np.array_equal(np.array(p2.vector[t]), V[t])

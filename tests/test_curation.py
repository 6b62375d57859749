"""End-to-end curation pipeline: stage effects, composition, and
layout independence."""
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

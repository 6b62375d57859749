"""Sequence packing: tiling/fullness invariants, straddle semantics,
layout independence, pandas oracle."""
import numpy as np
import pandas as pd
import pytest

from hiselspark.operators.packing import pack_sequences, sequence_manifest


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(31)
    rows = []
    for i in range(200):
        n = int(rng.integers(0, 60))      # includes zero-token docs
        rows.append((i, " ".join(f"w{j}" for j in range(n))))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_every_token_lands_exactly_once(spark, docs):
    seg = pack_sequences(docs, seq_len=64, n_streams=3).toPandas()
    # per-doc: segment tokens sum to the doc's token count
    per_doc = seg.groupby("doc_id")[["seg_tokens", "doc_tokens"]].agg(
        {"seg_tokens": "sum", "doc_tokens": "first"})
    assert (per_doc["seg_tokens"] == per_doc["doc_tokens"]).all()
    # zero-token docs emit nothing
    assert (seg["doc_tokens"] > 0).all()


def test_sequences_tile_and_fill(spark, docs):
    seg = pack_sequences(docs, seq_len=64, n_streams=3).toPandas()
    for (st, sq), g in seg.groupby(["stream", "seq"]):
        g = g.sort_values("offset")
        assert g["offset"].iloc[0] == 0
        ends = (g["offset"] + g["seg_tokens"]).values
        assert (g["offset"].values[1:] == ends[:-1]).all(), (st, sq)
        tail = sq == seg[seg["stream"] == st]["seq"].max()
        if not tail:
            assert ends[-1] == 64, (st, sq)
    man = sequence_manifest(
        pack_sequences(docs, seq_len=64, n_streams=3)).toPandas()
    tailseq = man.groupby("stream")["seq"].transform("max") == man["seq"]
    assert (man.loc[~tailseq, "n_tokens"] == 64).all()


def test_straddle_marks_partial_segments(spark, docs):
    seg = pack_sequences(docs, seq_len=64, n_streams=3)
    man = sequence_manifest(seg).toPandas()
    pdf = seg.toPandas()
    exp = (pdf.assign(p=(pdf["seg_tokens"] < pdf["doc_tokens"]))
           .groupby(["stream", "seq"])["p"].sum())
    got = man.set_index(["stream", "seq"])["n_straddle"].sort_index()
    assert got.astype(int).to_dict() == exp.sort_index().astype(
        int).to_dict()


def test_layout_independent_and_matches_pandas_oracle(spark, docs):
    a = (pack_sequences(docs.repartition(2), seq_len=50, n_streams=2)
         .toPandas().sort_values(["stream", "seq", "offset"])
         .reset_index(drop=True))
    b = (pack_sequences(docs.repartition(11), seq_len=50, n_streams=2)
         .toPandas().sort_values(["stream", "seq", "offset"])
         .reset_index(drop=True))
    assert a.equals(b)
    # independent pandas oracle: lay the tape per stream, cut at 50
    pdf = docs.toPandas()
    streams = a.drop_duplicates("doc_id").set_index("doc_id")["stream"]
    for st in sorted(a["stream"].unique()):
        ids = sorted(streams[streams == st].index)
        pos, rows = 0, []
        for d in ids:
            n = len(pdf.loc[pdf.doc_id == d, "text"].iloc[0].split())
            s, e = pos, pos + n
            k = s // 50
            while k * 50 < e:
                aa, bb = max(s, k * 50), min(e, (k + 1) * 50)
                rows.append((st, k, d, aa - k * 50, bb - aa, n))
                k += 1
            pos = e
        exp = pd.DataFrame(rows, columns=list(a.columns))
        got = (a[a["stream"] == st].reset_index(drop=True)
               .astype({"seq": int}))
        assert got.astype(str).equals(exp.astype(str)), st


def test_chunk_documents_windows(spark):
    from hiselspark.operators.packing import chunk_documents
    texts = [" ".join(f"t{i}" for i in range(23)), "a b c", "",
             "   ", " ".join(f"x{i}" for i in range(10)),
             " ".join(f"y{i}" for i in range(11))]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = (chunk_documents(spark.createDataFrame(pdf).repartition(3),
                           chunk_tokens=10, overlap=4)
           .toPandas().sort_values(["doc_id", "chunk_id"])
           .reset_index(drop=True))
    # python oracle: starts step by 6 until a window reaches the end
    rows = []
    for d, t in enumerate(texts):
        toks = t.split()
        n = len(toks)
        if n == 0:
            continue
        k, start = 0, 0
        while True:
            rows.append((d, k, start, min(10, n - start),
                         " ".join(toks[start:start + 10])))
            if start + 10 >= n:
                break
            k += 1
            start += 6
    exp = pd.DataFrame(rows, columns=list(out.columns))
    assert out.astype(str).equals(exp.astype(str))
    # every token covered; consecutive chunks overlap by exactly 4
    g = out[out.doc_id == 0]
    assert (g["start_tok"].diff().dropna() == 6).all()
    assert g["start_tok"].iloc[-1] + g["n_chunk_tokens"].iloc[-1] == 23


def test_chunk_documents_validation(spark):
    from hiselspark.operators.packing import chunk_documents
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0],
                                             "text": ["a"]}))
    for C, O in ((0, 0), (10, 10), (10, -1)):
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_tokens=C, overlap=O)

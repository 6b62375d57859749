"""Dedup (exact, MinHash+LSH, SimHash, n-gram Jaccard) and similarity
search (brute-force + LSH ANN) vs NumPy/pandas oracles."""
import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from hiselspark.operators import dedup, similarity


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    for i in range(60):
        n = rng.integers(8, 25)
        rows.append((i, " ".join(rng.choice(vocab, size=n))))
    # planted exact duplicates (with whitespace/case noise)
    rows.append((100, rows[3][1].upper() + "  "))
    rows.append((101, "  " + rows[3][1]))
    # planted near-duplicate: one word changed
    words = rows[7][1].split()
    words[2] = "CHANGED"
    rows.append((102, " ".join(words)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    return spark.createDataFrame(pdf).repartition(4), pdf


def _py_shingles(text, n=3):
    words = text.lower().split()
    if len(words) < n:
        return {" ".join(words)}
    return {" ".join(words[i:i + n]) for i in range(len(words) - n + 1)}


def test_exact_duplicates(docs):
    sdf, pdf = docs
    groups = dedup.exact_duplicates(sdf, "doc_id", "text").collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["canonical_id"] == 3
    assert g["group_size"] == 3
    assert g["member_ids"] == [3, 100, 101]
    kept = dedup.deduplicate_exact(sdf, "doc_id", "text")
    assert kept.count() == sdf.count() - 2


def test_jaccard_pairs_match_python_oracle(docs):
    sdf, pdf = docs
    got = (dedup.jaccard_pairs(sdf, "doc_id", "text", threshold=0.3)
           .toPandas().sort_values(["a", "b"]).reset_index(drop=True))
    # brute-force python oracle
    sh = {r.doc_id: _py_shingles(r.text) for r in pdf.itertuples()}
    exp = []
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            j = inter / len(sh[a] | sh[b])
            if j >= 0.3:
                exp.append((a, b, j))
    exp = pd.DataFrame(exp, columns=["a", "b", "jaccard"])
    assert len(got) == len(exp)
    merged = got.merge(exp, on=["a", "b"], suffixes=("_g", "_e"))
    np.testing.assert_allclose(merged["jaccard_g"], merged["jaccard_e"],
                               rtol=1e-9)
    # the planted near-dup pair survives at 0.3
    assert ((got.a == 7) & (got.b == 102)).any()


def test_minhash_near_duplicates_finds_planted(docs):
    sdf, _ = docs
    got = dedup.minhash_near_duplicates(
        sdf, "doc_id", "text", num_hashes=32, bands=8,
        threshold=0.4).toPandas()
    pairs = set(zip(got.a, got.b))
    assert (3, 100) in pairs and (3, 101) in pairs and (100, 101) in pairs
    assert (7, 102) in pairs
    # verification step: every reported jaccard above threshold
    assert (got.jaccard >= 0.4).all()


def test_hot_shingle_cap_bounds_blowup(spark):
    """Adversarial corpus: one stopword shingle shared by every doc.
    Uncapped, the shingle self-join creates a quadratic bucket (n^2/2
    pairs); with ``max_shingle_df`` the hot shingle is dropped from both
    the intersections and the set sizes, so unrelated docs produce NO
    pair at all and true duplicates still surface."""
    n = 40
    stop = "of the and"
    rows = [(i, f"{stop} unique{i} token{i} tail{i} x{i} y{i}")
            for i in range(n)]
    rows.append((900, rows[5][1]))  # exact duplicate of doc 5
    sdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])).repartition(4)

    uncapped = dedup.jaccard_pairs(sdf, "doc_id", "text",
                                   threshold=0.0).toPandas()
    # the hot shingle alone links every doc pair
    assert len(uncapped) == (n + 1) * n // 2

    capped = dedup.jaccard_pairs(sdf, "doc_id", "text", threshold=0.5,
                                 max_shingle_df=5).toPandas()
    assert set(zip(capped.a, capped.b)) == {(5, 900)}
    # and through the full minhash pipeline too
    mh = dedup.minhash_near_duplicates(sdf, "doc_id", "text",
                                       num_hashes=32, bands=8,
                                       threshold=0.5,
                                       max_shingle_df=5).toPandas()
    assert set(zip(mh.a, mh.b)) == {(5, 900)}


def test_minhash_signature_shape(docs):
    sdf, _ = docs
    sig = dedup.minhash_signatures(sdf, "doc_id", "text",
                                   num_hashes=8).toPandas()
    assert (sig.signature.map(len) == 8).all()


def test_simhash_near_duplicates(docs):
    sdf, _ = docs
    sigs = dedup.simhash_signatures(sdf, "doc_id", "text").toPandas()
    s = dict(zip(sigs.doc, sigs.simhash))
    # identical normalized docs -> identical simhash
    assert s[3] == s[100] == s[101]
    got = dedup.simhash_near_duplicates(sdf, "doc_id", "text",
                                        max_distance=16).toPandas()
    pairs = set(zip(got.a, got.b))
    assert (3, 100) in pairs
    # hamming values consistent with signatures
    for r in got.itertuples():
        assert r.hamming == bin((s[r.a] ^ s[r.b]) & ((1 << 64) - 1)).count("1")


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(23)
    n, d = 200, 16
    # clustered corpus (the honest ANN regime): 10 centers + noise, so
    # true neighbours have high cosine — LSH recall is meaningful
    centers = rng.normal(size=(10, d)) * 3.0
    base = (centers[rng.integers(0, 10, size=n)]
            + 0.6 * rng.normal(size=(n, d)))
    # planted near-duplicate of vector 0
    base[1] = base[0] + 0.01 * rng.normal(size=d)
    pdf = pd.DataFrame({
        "vec_id": range(n),
        "embedding": [row.astype(np.float64).tolist() for row in base],
    })
    return spark.createDataFrame(pdf), base


def test_cosine_topk_matches_numpy(spark, vectors):
    sdf, base = vectors
    probes = sdf.filter(F.col("vec_id") < 5)
    got = similarity.cosine_topk(probes, sdf, k=5).toPandas()
    unit = base / np.linalg.norm(base, axis=1, keepdims=True)
    sims = unit @ unit.T
    for pid in range(5):
        s = sims[pid].copy()
        s[pid] = -np.inf
        order = np.lexsort((np.arange(len(s)), -s))[:5]
        mine = got[got.probe_id == pid].sort_values("rk")
        assert mine.vec_id.tolist() == order.tolist()
        np.testing.assert_allclose(mine.cos_sim.to_numpy(),
                                   sims[pid][order], rtol=1e-9)


def test_lsh_topk_recall(spark, vectors):
    sdf, base = vectors
    probes = sdf.filter(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(probes, sdf, k=3).toPandas()
    approx = similarity.lsh_topk(probes, sdf, dim=16, k=3,
                                 n_planes=64).toPandas()
    hits = 0
    total = 0
    for pid in range(10):
        e = set(exact[exact.probe_id == pid].vec_id)
        a = set(approx[approx.probe_id == pid].vec_id)
        hits += len(e & a)
        total += len(e)
    assert hits / total >= 0.5  # 4 bands of 16 bits on random gaussians
    # the planted near-identical pair must be found
    assert 1 in set(approx[approx.probe_id == 0].vec_id)


def test_embedding_near_duplicates(spark, vectors):
    sdf, base = vectors
    got = similarity.embedding_near_duplicates(
        sdf, dim=16, threshold=0.98, use_lsh=True).toPandas()
    assert ((got.a == 0) & (got.b == 1)).any()
    brute = similarity.embedding_near_duplicates(
        sdf, dim=16, threshold=0.98, use_lsh=False).toPandas()
    assert set(zip(got.a, got.b)) <= set(zip(brute.a, brute.b))


def test_connected_components_matches_union_find(spark):
    """Min-label propagation must match a plain union-find oracle on a
    random edge set (chains, cliques, singleton pairs)."""
    rng = np.random.default_rng(9)
    edges = set()
    # a long chain (worst case for propagation depth), a clique, randoms
    edges |= {(i, i + 1) for i in range(0, 12)}
    edges |= {(a, b) for a in range(100, 105) for b in range(a + 1, 105)}
    for _ in range(30):
        a, b = sorted(rng.integers(200, 260, size=2).tolist())
        if a != b:
            edges.add((a, b))
    pdf = pd.DataFrame(sorted(edges), columns=["a", "b"])
    got = (dedup.connected_components(
        spark.createDataFrame(pdf).repartition(4))
        .toPandas().set_index("node")["comp"].to_dict())

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    exp = {n: find(n) for n in parent}
    assert got == exp


# ---------------------------------------------------------------------------
# dataset split + decontamination
# ---------------------------------------------------------------------------

def _py_content_hash(text, salt=0):
    import re
    norm = re.sub(r"\s+", " ", (text or "").strip().lower())
    h = salt % 2147483647
    if not norm:
        # Spark's split('', '') yields [''] with ascii('') = 0, so the
        # fold still runs one (acc*31 + 0) step (DuckDB agrees)
        return (h * 31) % 2147483647
    for ch in norm:
        h = (h * 31 + ord(ch)) % 2147483647
    return h


def test_content_split_matches_python_oracle(docs):
    from hiselspark.operators.splits import content_split
    sdf, pdf = docs
    out = {r["doc_id"]: r["split"]
           for r in content_split(sdf, "text", salt=7).collect()}
    for _, row in pdf.iterrows():
        b = _py_content_hash(row["text"], salt=7) % 100
        expect = "train" if b < 80 else ("val" if b < 90 else "test")
        assert out[row["doc_id"]] == expect


def test_content_split_duplicates_share_split(docs):
    from hiselspark.operators.splits import content_split
    sdf, _ = docs
    out = {r["doc_id"]: r["split"]
           for r in content_split(sdf, "text").collect()}
    # 100/101 are whitespace/case variants of 3 -> identical normalized
    # text -> identical split, on any layout
    assert out[100] == out[101] == out[3]


def test_content_split_deterministic_across_layouts(docs):
    from hiselspark.operators.splits import content_split
    sdf, _ = docs
    a = {r["doc_id"]: r["split"]
         for r in content_split(sdf.repartition(7), "text").collect()}
    b = {r["doc_id"]: r["split"]
         for r in content_split(sdf.coalesce(1), "text").collect()}
    assert a == b


def test_decontaminate_drops_near_dups_of_eval(spark):
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 10, 11],
        "text": [
            "alpha beta gamma delta epsilon zeta",      # = eval 10
            "alpha beta gamma delta epsilon CHANGED",   # near-dup of 10
            "totally different words nothing shared here",
            "alpha beta gamma delta epsilon zeta",      # eval
            "unrelated eval document with its own text",
        ]})
    sdf = spark.createDataFrame(pdf)
    train = sdf.filter(F.col("doc_id") < 10)
    eval_df = sdf.filter(F.col("doc_id") >= 10)
    kept = sorted(r["doc_id"] for r in dedup.decontaminate(
        train, eval_df, "doc_id", "text", threshold=0.5).collect())
    # doc 1 is an exact copy of eval 10 (J=1); doc 2 shares 2 of 6
    # shingles... compute: shingles of 6 words = 4 trigrams; doc2 shares
    # trigrams 1-3 of doc10's 1-4 => J = 3/5 = 0.6 >= 0.5 -> dropped
    assert kept == [3]


def test_decontaminate_keeps_all_when_disjoint(spark):
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 10],
        "text": ["one two three four five six",
                 "seven eight nine ten eleven twelve",
                 "completely separate eval corpus text here"]})
    sdf = spark.createDataFrame(pdf)
    kept = sorted(r["doc_id"] for r in dedup.decontaminate(
        sdf.filter(F.col("doc_id") < 10),
        sdf.filter(F.col("doc_id") >= 10),
        "doc_id", "text").collect())
    assert kept == [1, 2]


def test_content_split_null_and_empty_text(spark):
    from hiselspark.operators.splits import content_split
    pdf = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                        "text": [None, "", "   ", "real text here"]})
    out = {r["doc_id"]: r["split"] for r in
           content_split(spark.createDataFrame(pdf), "text").collect()}
    # null/empty/whitespace-only all hash like '' -> same, NON-NULL split
    assert out[1] is not None
    assert out[1] == out[2] == out[3]
    b = _py_content_hash("") % 100
    expect = "train" if b < 80 else ("val" if b < 90 else "test")
    assert out[1] == expect


def test_pq_encode_shapes_and_reconstruction(spark, vectors):
    sdf, base = vectors
    books = similarity.train_pq_codebooks(sdf, dim=16, m=4, n_codes=8)
    assert books.shape == (4, 8, 4)
    enc = similarity.pq_encode(sdf, books).toPandas()
    codes = np.array(enc["pq_code"].tolist())
    assert codes.shape == (len(base), 4)
    assert codes.min() >= 0 and codes.max() < 8
    # reconstruction from codes is closer to the vector than a random
    # codeword (sanity that argmin really ran)
    unit = base / np.linalg.norm(base, axis=1, keepdims=True)
    recon = np.concatenate(
        [books[j][codes[:, j]] for j in range(4)], axis=1)
    err = ((unit - recon) ** 2).sum(axis=1)
    rng = np.random.default_rng(0)
    rand = np.concatenate(
        [books[j][rng.integers(0, 8, len(base))] for j in range(4)],
        axis=1)
    err_rand = ((unit - rand) ** 2).sum(axis=1)
    assert err.mean() < err_rand.mean()


def test_pq_topk_recall(spark, vectors):
    sdf, base = vectors
    probes = sdf.filter(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(probes, sdf, k=3).toPandas()
    approx = similarity.pq_topk(probes, sdf, dim=16, k=3,
                                m=8, n_codes=256).toPandas()
    hits = total = 0
    for pid in range(10):
        e = set(exact[exact.probe_id == pid].vec_id)
        a = set(approx[approx.probe_id == pid].vec_id)
        hits += len(e & a)
        total += len(e)
    # PQ8x8bit on 16-dim random gaussians (the hardest case: no
    # cluster structure, all neighbours near-equidistant)
    assert hits / total >= 0.5
    # planted near-identical pair must rank first
    top = approx[(approx.probe_id == 0) & (approx.rk == 1)]
    assert top.vec_id.iloc[0] == 1


def test_pq_topk_probe_chunking_invariant(spark, vectors):
    """The bounded probe-chunk path (driver never holds more than
    probe_chunk_size probes) must return exactly the single-chunk
    result — every probe's top-k depends only on its own LUT."""
    sdf, base = vectors
    probes = sdf.filter(F.col("vec_id") < 10)
    one = (similarity.pq_topk(probes, sdf, dim=16, k=3, m=8,
                              n_codes=256)
           .toPandas().sort_values(["probe_id", "rk"])
           .reset_index(drop=True))
    many = (similarity.pq_topk(probes, sdf, dim=16, k=3, m=8,
                               n_codes=256, probe_chunk_size=3)
            .toPandas().sort_values(["probe_id", "rk"])
            .reset_index(drop=True))
    assert one.equals(many)


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (ca != cb))
    return dp[-1]


def test_edit_distance_pairs_complete_vs_bruteforce(spark):
    from hiselspark.operators.dedup import edit_distance_pairs
    rng = np.random.default_rng(31)
    alphabet = list("abcd")
    words = {""}
    while len(words) < 60:
        words.add("".join(rng.choice(alphabet,
                                     rng.integers(1, 6))))
    words = sorted(words - {""})
    got = (edit_distance_pairs(
        spark.createDataFrame(pd.DataFrame({"w": words})), "w")
        .toPandas())
    got_pairs = set(zip(got["a"], got["b"]))
    expected = {(a, b) for i, a in enumerate(words)
                for b in words[i + 1:] if _lev(a, b) <= 1}
    assert got_pairs == expected          # complete AND sound
    assert (got["dist"] == 1).all()       # distinct strings, dist==1


def test_embedding_centroid_matches_numpy(spark, vectors):
    sdf, base = vectors
    out = (similarity.embedding_centroid(
        sdf.withColumn("grp", F.col("vec_id") % 3), "grp")
        .toPandas().set_index("grp"))
    import numpy as _np
    ids = _np.arange(len(base))
    for g in range(3):
        member = base[ids % 3 == g]
        _np.testing.assert_allclose(
            _np.array(out.loc[g, "centroid"]), member.mean(axis=0),
            rtol=1e-9)
        assert out.loc[g, "n"] == len(member)


def test_group_kfold_groups_stay_together(spark):
    from hiselspark.operators.splits import group_kfold
    import pandas as _pd
    pdf = _pd.DataFrame({
        "row_id": range(300),
        "user_id": [i % 60 for i in range(300)],
    })
    out = (group_kfold(spark.createDataFrame(pdf).repartition(8),
                       "user_id", k=5, salt=3).toPandas())
    assert out["fold"].between(0, 4).all()
    # every group maps to exactly one fold, on any partition layout
    per_group = out.groupby("user_id")["fold"].nunique()
    assert (per_group == 1).all()
    # python twin of the raw (un-normalized) polynomial hash
    def fold(uid):
        h = 3
        for ch in str(uid):
            h = (h * 31 + ord(ch)) % 2147483647
        return h % 5
    got = out.drop_duplicates("user_id").set_index("user_id")["fold"]
    for uid in got.index:
        assert got[uid] == fold(uid)
    # hash-balanced: all 5 folds populated at 60 groups
    assert out["fold"].nunique() == 5


def test_group_kfold_rejects_k1(spark):
    from hiselspark.operators.splits import group_kfold
    import pandas as _pd
    df = spark.createDataFrame(_pd.DataFrame({"g": [1]}))
    with pytest.raises(ValueError):
        group_kfold(df, "g", k=1)


def test_tfidf_weights_match_numpy(spark):
    from hiselspark.functions.text import tfidf_weights
    import numpy as _np
    import pandas as _pd
    pdf = _pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["the cat sat", "the the dog", "cat cat cat", ""],
    })
    out = (tfidf_weights(spark.createDataFrame(pdf), "doc_id", "text")
           .toPandas())
    docs = {i: t.lower().split() for i, t in
            zip(pdf["doc_id"], pdf["text"])}
    n_docs = float(len(pdf))          # all docs, including the empty one
    dfreq = {}
    for ts in docs.values():
        for w in set(ts):
            dfreq[w] = dfreq.get(w, 0) + 1
    assert len(out) == sum(len(set(ts)) for ts in docs.values())
    for r in out.itertuples():
        assert r.tf == docs[r.doc_id].count(r.token)
        assert r.df == dfreq[r.token]
        assert r.tfidf == pytest.approx(
            r.tf * _np.log(n_docs / r.df), abs=1e-12)
    # empty doc contributes no rows but counts in N
    assert (out["doc_id"] == 3).sum() == 0


def test_bm25_matches_numpy(spark):
    from hiselspark.functions.text import bm25_score
    import numpy as _np
    import pandas as _pd
    pdf = _pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["fast spark engine", "spark spark spark",
                 "slow tortoise", ""],
    })
    out = (bm25_score(spark.createDataFrame(pdf), "doc_id",
                      "fast spark", "text")
           .toPandas().set_index("doc_id")["bm25"])
    docs = {i: t.lower().split() for i, t in
            zip(pdf["doc_id"], pdf["text"])}
    n = float(len(pdf))
    dls = {i: len(ts) for i, ts in docs.items()}
    avgdl = sum(dls.values()) / n
    dfreq = {w: sum(w in ts for ts in docs.values())
             for w in ("fast", "spark")}
    k1, b = 1.2, 0.75
    for i, ts in docs.items():
        exp = 0.0
        for w in sorted(set(ts) & {"fast", "spark"}):
            tf = ts.count(w)
            idf = _np.log(1.0 + (n - dfreq[w] + 0.5) / (dfreq[w] + 0.5))
            exp += (idf * tf * (k1 + 1.0)
                    / (tf + k1 * (1 - b + b * dls[i] / avgdl)))
        if exp == 0.0:
            assert i not in out.index
        else:
            assert out[i] == pytest.approx(exp, abs=1e-12)
    # the spam doc (pure repetition) must NOT dominate: tf saturates
    assert out[1] < out[0] * 2


def test_semantic_dedup_drops_planted_near_dupes(spark):
    from hiselspark.operators.similarity import semantic_dedup
    import numpy as _np
    import pandas as _pd
    rng = _np.random.default_rng(5)
    base = rng.normal(size=(40, 16))
    base /= _np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].tolist()) for i in range(40)]
    # 41..45: tiny perturbations of 0..4 -> cosine ~0.9999
    for j in range(5):
        v = base[j] + 0.001 * rng.normal(size=16)
        rows.append((40 + j, (v / _np.linalg.norm(v)).tolist()))
    pdf = _pd.DataFrame(rows, columns=["vec_id", "embedding"])
    out = (semantic_dedup(spark.createDataFrame(pdf).repartition(7),
                          dim=16, n_clusters=4, eps=0.05, seed=3)
           .toPandas().set_index("vec_id"))
    # the lower id of each planted pair is kept, the clone is dropped
    for j in range(5):
        assert bool(out.loc[j, "keep"])
        assert not bool(out.loc[40 + j, "keep"])
        assert out.loc[j, "cluster"] == out.loc[40 + j, "cluster"]
    # everything else survives (no random cosines near 0.95 at d=16/n=40)
    others = out.drop(index=[40 + j for j in range(5)])
    assert others["keep"].all()


def test_mmr_rerank_matches_bruteforce_greedy(spark):
    from hiselspark.operators.similarity import mmr_rerank
    rng = np.random.default_rng(61)
    rows = []
    vecs = {}
    for p in range(3):
        for c in range(12):
            cid = p * 100 + c
            v = rng.normal(size=8)
            vecs[cid] = v
            rows.append({"probe_id": p, "vec_id": cid,
                         "cos": float(rng.uniform(0, 1)),
                         "v": [float(x) for x in v]})
    pdf = pd.DataFrame(rows)
    lam = 0.7
    out = (mmr_rerank(spark.createDataFrame(pdf), k=4, lam=lam)
           .toPandas().sort_values(["probe_id", "rk"])
           .reset_index(drop=True))
    for p in range(3):
        g = pdf[pdf.probe_id == p].sort_values("vec_id")
        ids = g.vec_id.to_numpy()
        rel = g.cos.to_numpy()
        U = np.stack([np.asarray(vecs[i]) for i in ids])
        U = U / np.linalg.norm(U, axis=1)[:, None]
        S = U @ U.T
        sel = []
        for step in range(4):
            best, best_score = None, None
            for i in range(len(ids)):
                if i in sel:
                    continue
                if not sel:
                    sc = lam * rel[i]
                else:
                    sc = (lam * rel[i]
                          - (1 - lam) * max(S[i, j] for j in sel))
                if best is None or sc > best_score or (
                        sc == best_score and ids[i] < ids[best]):
                    best, best_score = i, sc
            sel.append(best)
            got = out[(out.probe_id == p) & (out.rk == step + 1)]
            assert int(got.vec_id.iloc[0]) == ids[best]
            assert float(got.mmr.iloc[0]) == pytest.approx(best_score)


def test_mmr_diversifies_duplicate_candidates(spark):
    from hiselspark.operators.similarity import mmr_rerank
    # two exact duplicate high-relevance vectors + orthogonal others:
    # plain top-k would take both copies; MMR must not.
    base = [1.0, 0.0, 0.0, 0.0]
    rows = [
        {"probe_id": 0, "vec_id": 1, "cos": 0.99, "v": base},
        {"probe_id": 0, "vec_id": 2, "cos": 0.98, "v": base},
        {"probe_id": 0, "vec_id": 3, "cos": 0.60,
         "v": [0.0, 1.0, 0.0, 0.0]},
        {"probe_id": 0, "vec_id": 4, "cos": 0.55,
         "v": [0.0, 0.0, 1.0, 0.0]},
    ]
    out = (mmr_rerank(spark.createDataFrame(pd.DataFrame(rows)),
                      k=3, lam=0.5)
           .toPandas().sort_values("rk"))
    assert list(out.vec_id) == [1, 3, 4]  # the duplicate (2) is skipped


def test_kcenter_sample_properties(spark):
    from hiselspark.operators.similarity import kcenter_sample
    rng = np.random.default_rng(71)
    # 4 well-separated blobs; k=4 must pick one center per blob
    blobs = [rng.normal(loc=c, scale=0.05, size=(50, 6))
             for c in (0.0, 5.0, 10.0, 15.0)]
    X = np.vstack(blobs)
    pdf = pd.DataFrame({
        "vec_id": range(len(X)),
        "embedding": [[float(v) for v in r] for r in X],
    })
    df = spark.createDataFrame(pdf)
    centers, assigned = kcenter_sample(df, k=4, pool_size=1000, seed=7)
    cpdf = centers.toPandas().sort_values("order")
    blob_of = cpdf.center_id.to_numpy() // 50
    assert sorted(blob_of) == [0, 1, 2, 3]  # one per blob
    apdf = assigned.toPandas()
    assert len(apdf) == len(X)
    # every point assigned to the center of its own blob
    assert ((apdf.vec_id // 50).to_numpy()
            == (apdf.center_id // 50).to_numpy()).all()
    # coverage radius well below blob separation
    assert apdf.dist.max() < 1.0
    # determinism across layouts
    c2, _ = kcenter_sample(df.repartition(5), k=4, pool_size=1000,
                           seed=7)
    assert c2.toPandas().sort_values("order").center_id.tolist() \
        == cpdf.center_id.tolist()


def test_rrf_fuse_matches_bruteforce(spark):
    from hiselspark.operators.similarity import rrf_fuse
    # two hand-made rankings over one probe
    r1 = pd.DataFrame({"probe_id": 0, "vec_id": [10, 11, 12],
                       "rk": [1, 2, 3]})
    r2 = pd.DataFrame({"probe_id": 0, "vec_id": [12, 10, 13],
                       "rk": [1, 2, 3]})
    out = (rrf_fuse([spark.createDataFrame(r1),
                     spark.createDataFrame(r2)], k=60)
           .toPandas().sort_values("rk").reset_index(drop=True))
    want = {
        10: 1 / 61 + 1 / 62,
        11: 1 / 62,
        12: 1 / 63 + 1 / 61,
        13: 1 / 63,
    }
    got = dict(zip(out.doc_id, out.rrf))
    for d, s in want.items():
        assert got[d] == pytest.approx(s, abs=1e-15)
    # doc 10 (rank 1+2) beats doc 12 (rank 3+1): 1/61+1/62 > 1/63+1/61
    assert list(out.doc_id) == [10, 12, 11, 13]
    assert list(out.n_systems) == [2, 2, 1, 1]
    # layout determinism (sorted fold)
    out2 = (rrf_fuse([spark.createDataFrame(r1).repartition(3),
                      spark.createDataFrame(r2).repartition(2)], k=60)
            .toPandas().sort_values("rk").reset_index(drop=True))
    assert (out2.rrf.to_numpy() == out.rrf.to_numpy()).all()


def test_keep_best_duplicate_prefers_quality(spark):
    from hiselspark.operators.dedup import keep_best_duplicate
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["Hello  World", "hello world", "unique doc",
                 "hello world", "UNIQUE   DOC"],
        "q": [10, 30, 5, 20, 50],
    })
    out = (keep_best_duplicate(spark.createDataFrame(pdf), "doc_id",
                               "text", "q")
           .toPandas().sort_values("doc_id"))
    # group {1,2,4} (same normalized text): best q=30 -> doc 2
    # group {3,5}: best q=50 -> doc 5
    assert list(out.doc_id) == [2, 5]
    # keep_higher=False flips the rule
    out2 = (keep_best_duplicate(spark.createDataFrame(pdf), "doc_id",
                                "text", "q", keep_higher=False)
            .toPandas().sort_values("doc_id"))
    assert list(out2.doc_id) == [1, 3]
    # tie on quality -> lowest id survives
    tie = pd.DataFrame({"doc_id": [7, 6], "text": ["x y", "x  y"],
                        "q": [9, 9]})
    out3 = keep_best_duplicate(spark.createDataFrame(tie), "doc_id",
                               "text", "q").toPandas()
    assert list(out3.doc_id) == [6]


def test_containment_pairs_planted_subset(spark):
    """A short doc embedded verbatim in a long one: Jaccard is small
    but containment of the short side is 1.0."""
    from hiselspark.operators import dedup
    short = "alpha beta gamma delta epsilon zeta"
    long_ = short + " " + " ".join(f"filler{i} word{i} tail{i}"
                                   for i in range(40))
    df = spark.createDataFrame(
        [(1, short), (2, long_), (3, "totally different text here")],
        "doc_id long, text string")
    out = dedup.containment_pairs(df, "doc_id", "text",
                                  threshold=0.9).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.a, row.b) == (1, 2)
    assert row.c_ab == 1.0          # the short side is fully contained
    assert row.c_ba < 0.2           # while Jaccard-style symmetry fails
    # jaccard on the same pair is well under the containment threshold
    j = dedup.jaccard_pairs(df, "doc_id", "text",
                            threshold=0.0).toPandas()
    jrow = j[(j.a == 1) & (j.b == 2)].iloc[0]
    assert jrow.jaccard < 0.2


def test_srp_signature_angular_properties(spark):
    """SRP: identical vectors share signatures, negated vectors flip
    every bit, and hamming/planes tracks angle/pi on a seeded cloud."""
    import numpy as np
    from hiselspark.operators.similarity import srp_signatures
    rng = np.random.default_rng(41)
    base = rng.normal(size=(20, 64)).astype(np.float32)
    rows = []
    for i, v in enumerate(base):
        rows.append((3 * i, v.tolist()))          # original
        rows.append((3 * i + 1, v.tolist()))      # exact copy
        rows.append((3 * i + 2, (-v).tolist()))   # antipode
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    sig = {r["vid"]: r["srp_sig"] for r in
           srp_signatures(df, n_planes=16).collect()}
    full = (1 << 16) - 1
    for i in range(20):
        assert sig[3 * i] == sig[3 * i + 1]
        assert sig[3 * i] ^ sig[3 * i + 2] == full
    # near-duplicates (small perturbation) stay within a few bits;
    # random pairs average ~half the bits apart
    near = base + rng.normal(scale=0.01, size=base.shape).astype(
        np.float32)
    rows2 = [(i, v.tolist()) for i, v in enumerate(base)]
    rows2 += [(100 + i, v.tolist()) for i, v in enumerate(near)]
    df2 = spark.createDataFrame(rows2,
                                "vec_id long, embedding array<float>")
    s2 = {r["vid"]: r["srp_sig"] for r in
          srp_signatures(df2, n_planes=16).collect()}
    near_d = [bin(s2[i] ^ s2[100 + i]).count("1") for i in range(20)]
    rand_d = [bin(s2[i] ^ s2[(i + 7) % 20]).count("1")
              for i in range(20)]
    assert sum(near_d) / 20 < 2.0
    assert sum(rand_d) / 20 > 5.0


def test_int8_quantize_error_bound_and_codes(spark):
    """Codes match a NumPy reimplementation; reconstruction error is
    bounded by half a quantization step per dimension; constant dims
    quantize to 0 with zero error contribution."""
    import numpy as np
    from hiselspark.operators.similarity import int8_quantize
    rng = np.random.default_rng(53)
    vecs = rng.normal(size=(30, 8)).astype(np.float32)
    vecs[:, 3] = 0.25                     # constant dimension
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vid"]: r for r in int8_quantize(df, dim=8).collect()}
    v64 = vecs.astype(np.float64)
    mn, mx = v64.min(axis=0), v64.max(axis=0)
    span = np.where(mx > mn, mx - mn, 1.0)
    codes = np.where(
        mx == mn, 0,
        np.clip(np.round((v64 - mn) * 255.0 / span), 0, 255)
    ).astype(np.int64)
    recon = mn + codes * (mx - mn) / 255.0
    for i in range(30):
        r = out[i]
        assert r["code_sum"] == codes[i].sum()
        assert r["code_min"] == codes[i].min()
        assert r["code_max"] == codes[i].max()
        want_err = np.abs(v64[i] - recon[i]).max()
        assert abs(r["max_err"] - want_err) < 1e-12
        # bound: half a step on every varying dim
        assert r["max_err"] <= (span.max() / 255.0) / 2 + 1e-12


def test_triplet_mining_matches_brute(spark):
    """triplet_mining vs a NumPy brute force with cosine ties broken
    by smaller id, incl. an anchor with no same-label peer."""
    import numpy as np
    from hiselspark.operators.similarity import triplet_mining
    rng = np.random.default_rng(61)
    vecs = rng.normal(size=(24, 16)).astype(np.float32)
    labels = [i % 3 for i in range(23)] + [99]   # 23 is label-unique
    rows = [(i, vecs[i].tolist(), labels[i]) for i in range(24)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long")
    got = {r["anchor_id"]: r for r in
           triplet_mining(df, df, id_col="vec_id",
                          vec_col="embedding",
                          label_col="label").collect()}
    v64 = vecs.astype(np.float64)
    norms = np.linalg.norm(v64, axis=1)
    cos = (v64 @ v64.T) / np.outer(norms, norms)
    for i in range(24):
        best = {"pos": None, "neg": None}
        for j in range(24):
            if j == i:
                continue
            kind = "pos" if labels[j] == labels[i] else "neg"
            key = (cos[i, j], -j)
            if best[kind] is None or key > best[kind][0]:
                best[kind] = (key, j)
        r = got[i]
        if best["pos"] is None:
            assert r["pos_id"] is None and r["semi_hard"] is None
        else:
            assert r["pos_id"] == best["pos"][1], i
            assert abs(r["pos_cos"]
                       - cos[i, best["pos"][1]]) < 1e-9
        assert r["neg_id"] == best["neg"][1], i
        if best["pos"] is not None:
            assert r["semi_hard"] == (
                cos[i, best["neg"][1]] > cos[i, best["pos"][1]])


def test_pq_topk_refine_reranks_to_exact(spark, vectors):
    """The IVFADC-R exact re-rank stage: with a shortlist as large as
    the corpus, PQ+refine must return EXACTLY the brute-force top-k
    (ids, ranks and cosines); with a modest shortlist recall must
    beat the raw ADC ranking."""
    sdf, base = vectors
    probes = sdf.filter(F.col("vec_id") < 10)
    exact = (similarity.cosine_topk(probes, sdf, k=3).toPandas()
             .sort_values(["probe_id", "rk"]).reset_index(drop=True))
    full = (similarity.pq_topk(probes, sdf, dim=16, k=3, m=8,
                               n_codes=256, refine=500)
            .toPandas().sort_values(["probe_id", "rk"])
            .reset_index(drop=True))
    assert full[["probe_id", "rk", "vec_id"]].equals(
        exact[["probe_id", "rk", "vec_id"]])
    np.testing.assert_allclose(full.cos_sim.to_numpy(),
                               exact.cos_sim.to_numpy(), atol=5e-7)

    def recall(pdf):
        hits = total = 0
        for pid in range(10):
            e = set(exact[exact.probe_id == pid].vec_id)
            a = set(pdf[pdf.probe_id == pid].vec_id)
            hits += len(e & a)
            total += len(e)
        return hits / total

    adc = similarity.pq_topk(probes, sdf, dim=16, k=3, m=8,
                             n_codes=256).toPandas()
    ref = similarity.pq_topk(probes, sdf, dim=16, k=3, m=8,
                             n_codes=256, refine=24).toPandas()
    assert recall(ref) >= recall(adc)
    assert recall(ref) >= 0.8
    # contract checks: refine must cover k; chunking-invariant
    with pytest.raises(ValueError, match="refine"):
        similarity.pq_topk(probes, sdf, dim=16, k=5, m=8, refine=3)
    chunked = (similarity.pq_topk(probes, sdf, dim=16, k=3, m=8,
                                  n_codes=256, refine=24,
                                  probe_chunk_size=3)
               .toPandas().sort_values(["probe_id", "rk"])
               .reset_index(drop=True))
    assert chunked.equals(ref.sort_values(["probe_id", "rk"])
                          .reset_index(drop=True))

"""Deduplication operators for large-scale corpus curation.

All of these are pure DataFrame compositions (JVM-side expressions,
shuffles only where semantically required), designed so the candidate
generation scales linearly and the quadratic part only ever runs inside
small buckets:

* exact — hash-groupBy on normalized content: one shuffle.
* MinHash + LSH — shingle -> k min-hashes -> band buckets -> in-bucket
  candidate pairs -> exact-Jaccard verification: the classic
  Broder/LSH pipeline; no O(n^2) stage, candidates only meet inside a
  band bucket.
* SimHash — 64-bit weighted token-hash signature; near-duplicates are
  pairs within a Hamming radius, found via band-equality buckets
  (pigeonhole: distance <= 3 over 4 bands guarantees one equal band).
* n-gram Jaccard — exact pairwise similarity (use on small candidate
  sets or as verification; it IS quadratic by definition).
* embedding cosine — see operators/similarity.py; near-dup = cosine
  above threshold.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def normalize_text(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per duplicate *group* (size >= 2): canonical (min) id,
    group size, member ids."""
    return (df.withColumn("__n", normalize_text(text_col))
              .groupBy("__n")
              .agg(F.min(id_col).alias("canonical_id"),
                   F.count("*").alias("group_size"),
                   F.sort_array(F.collect_list(id_col)).alias("member_ids"))
              .filter(F.col("group_size") >= 2)
              .drop("__n"))


def deduplicate_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one representative (min id) per normalized-content group."""
    from pyspark.sql import Window
    w = Window.partitionBy(normalize_text(text_col)).orderBy(id_col)
    return (df.withColumn("__rk", F.row_number().over(w))
              .filter(F.col("__rk") == 1)
              .drop("__rk"))


def keep_best_duplicate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    quality_col: str,
    keep_higher: bool = True,
) -> DataFrame:
    """Canonicalization: keep, per normalized-content duplicate group,
    the row with the BEST quality score (ties -> lowest id) instead of
    an arbitrary representative — the curation pass that keeps the
    cleanest copy of each duplicated document (highest quality score,
    longest form, best-decoded variant) rather than whichever id
    sorts first.  Composes with :func:`deduplicate_exact` (which is
    the quality-blind special case) and the near-dup cluster family
    (apply per ``dup_components`` cluster id for fuzzy groups).

    One window over the content-hash clustering — same single-shuffle
    shape as ``deduplicate_exact``; deterministic for any quality
    column (unique-id tiebreak)."""
    from pyspark.sql import Window
    order = (F.col(quality_col).desc() if keep_higher
             else F.col(quality_col).asc())
    w = (Window.partitionBy(normalize_text(text_col))
               .orderBy(order, F.col(id_col).asc()))
    return (df.withColumn("__rk", F.row_number().over(w))
              .filter(F.col("__rk") == 1)
              .drop("__rk"))


# ---------------------------------------------------------------------------
# shingles
# ---------------------------------------------------------------------------

def word_shingles(col, n: int = 3) -> Column:
    """Distinct word n-grams as an array column — built-in expressions
    only (split + transform + slice + concat)."""
    words = F.split(normalize_text(col), " ")
    count = F.size(words) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(count - 1, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    return F.when(count >= 1, F.array_distinct(grams)).otherwise(
        F.array(F.concat_ws(" ", words)))


def exploded_shingles(df: DataFrame, id_col: str, text_col: str,
                      n: int = 3) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(text_col, n)).alias("shingle"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       num_hashes: int = 16, shingle_n: int = 3) -> DataFrame:
    """(doc, signature array<long>): k independent min-hashes of the
    shingle set, via seeded xxhash64 — one explode + one groupBy."""
    sh = exploded_shingles(df, id_col, text_col, shingle_n)
    return (sh.groupBy("doc")
              .agg(F.array(*[
                  F.min(F.xxhash64("shingle", F.lit(i)))
                  for i in range(num_hashes)
              ]).alias("signature")))


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 4) -> DataFrame:
    """Distinct candidate pairs (a < b) whose signatures agree on at
    least one band.  Docs only meet inside a (band, band-hash) bucket —
    the quadratic blow-up is bounded by bucket size, the LSH guarantee."""
    sig_len = F.size("signature")
    rows_per_band = (sig_len / bands).cast("int")
    banded = signatures.select(
        "doc",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.xxhash64(
                    F.slice("signature", b * rows_per_band + 1,
                            rows_per_band).cast("string"),
                    b).alias("bucket")))).alias("bb"))
    left = banded.select("bb", F.col("doc").alias("a"))
    right = banded.select("bb", F.col("doc").alias("b"))
    return (left.join(right, "bb")
                .filter(F.col("a") < F.col("b"))
                .select("a", "b").distinct())


def jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                  candidates: Optional[DataFrame] = None,
                  threshold: float = 0.0, shingle_n: int = 3,
                  max_shingle_df: Optional[int] = None) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs (all pairs
    when ``candidates`` is None — quadratic, small inputs only).
    Computed relationally: explode shingles, self-join on shingle for
    intersections, join distinct counts for the union.

    ``max_shingle_df`` is standard LSH hygiene for the shingle
    self-join's worst case: a shingle appearing in f documents creates
    f^2 join rows, so one stopword shingle ('of the and', say) in every
    document makes the stage quadratic in the corpus.  With the cap set,
    shingles with document frequency above it are dropped from BOTH the
    intersection and the set sizes — Jaccard over the informative
    shingles, consistently on both sides of the ratio.  None (default)
    keeps exact semantics.  When ``candidates`` is given, both explode
    sides are also pre-restricted to candidate documents, so the
    self-join is quadratic only in the candidate population."""
    sh = exploded_shingles(df, id_col, text_col, shingle_n).distinct()
    if candidates is not None:
        cand_docs = (candidates.select(F.col("a").alias("doc"))
                     .union(candidates.select(F.col("b").alias("doc")))
                     .distinct())
        sh = sh.join(cand_docs, "doc", "left_semi")
    if max_shingle_df is not None:
        keep = (sh.groupBy("shingle")
                  .agg(F.count("*").alias("__df"))
                  .filter(F.col("__df") <= max_shingle_df)
                  .select("shingle"))
        sh = sh.join(keep, "shingle", "left_semi")
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    inter = (sh.alias("l")
             .join(sh.alias("r"), "shingle")
             .filter(F.col("l.doc") < F.col("r.doc"))
             .groupBy(F.col("l.doc").alias("a"), F.col("r.doc").alias("b"))
             .agg(F.count("*").alias("n_common")))
    if candidates is not None:
        inter = inter.join(candidates, ["a", "b"], "left_semi")
    out = (inter
           .join(sizes.withColumnRenamed("doc", "a")
                      .withColumnRenamed("n_sh", "n_a"), "a")
           .join(sizes.withColumnRenamed("doc", "b")
                      .withColumnRenamed("n_sh", "n_b"), "b")
           .withColumn("jaccard",
                       F.col("n_common")
                       / (F.col("n_a") + F.col("n_b") - F.col("n_common"))))
    return out.filter(F.col("jaccard") >= threshold).select(
        "a", "b", "n_common", "jaccard")


def containment_pairs(df: DataFrame, id_col: str, text_col: str,
                      threshold: float = 0.5, shingle_n: int = 3,
                      candidates: Optional[DataFrame] = None,
                      max_shingle_df: Optional[int] = None) -> DataFrame:
    """Asymmetric n-gram set CONTAINMENT per pair —
    ``c(A→B) = |A∩B| / |A|`` both ways plus the max — the quote /
    subset detector Jaccard cannot be: a 100-word document embedded
    verbatim in a 10,000-word one has Jaccard ≈ 0.01 but containment
    1.0 (Broder's resemblance-vs-containment distinction, *On the
    resemblance and containment of documents*, SEQUENCES 1997).

    Same relational plan and hygiene knobs as :func:`jaccard_pairs`
    (shared shingle self-join, optional candidate restriction and
    stopword-shingle DF cap); pairs kept when
    ``max(c_ab, c_ba) = n_common / min(|A|,|B|) >= threshold``.
    Returns ``(a, b, n_common, n_a, n_b, c_ab, c_ba)``."""
    sh = exploded_shingles(df, id_col, text_col, shingle_n).distinct()
    if candidates is not None:
        cand_docs = (candidates.select(F.col("a").alias("doc"))
                     .union(candidates.select(F.col("b").alias("doc")))
                     .distinct())
        sh = sh.join(cand_docs, "doc", "left_semi")
    if max_shingle_df is not None:
        keep = (sh.groupBy("shingle")
                  .agg(F.count("*").alias("__df"))
                  .filter(F.col("__df") <= max_shingle_df)
                  .select("shingle"))
        sh = sh.join(keep, "shingle", "left_semi")
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    inter = (sh.alias("l")
             .join(sh.alias("r"), "shingle")
             .filter(F.col("l.doc") < F.col("r.doc"))
             .groupBy(F.col("l.doc").alias("a"), F.col("r.doc").alias("b"))
             .agg(F.count("*").alias("n_common")))
    if candidates is not None:
        inter = inter.join(candidates, ["a", "b"], "left_semi")
    out = (inter
           .join(sizes.withColumnRenamed("doc", "a")
                      .withColumnRenamed("n_sh", "n_a"), "a")
           .join(sizes.withColumnRenamed("doc", "b")
                      .withColumnRenamed("n_sh", "n_b"), "b")
           .withColumn("c_ab", F.col("n_common") / F.col("n_a"))
           .withColumn("c_ba", F.col("n_common") / F.col("n_b")))
    return (out.filter(F.col("n_common")
                       / F.least("n_a", "n_b") >= threshold)
               .select("a", "b", "n_common", "n_a", "n_b",
                       "c_ab", "c_ba"))


def minhash_near_duplicates(df: DataFrame, id_col: str, text_col: str,
                            num_hashes: int = 16, bands: int = 4,
                            threshold: float = 0.5,
                            shingle_n: int = 3,
                            max_shingle_df: Optional[int] = None) -> DataFrame:
    """Full near-dup pipeline: MinHash -> LSH buckets -> exact-Jaccard
    verification of the candidates at ``threshold``.  The verification
    self-join is restricted to candidate documents; ``max_shingle_df``
    additionally drops stopword-grade shingles (see
    :func:`jaccard_pairs`) — at web scale set it to a small multiple of
    the expected duplicate-group size."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    cands = lsh_candidate_pairs(sigs, bands)
    return jaccard_pairs(df, id_col, text_col, candidates=cands,
                         threshold=threshold, shingle_n=shingle_n,
                         max_shingle_df=max_shingle_df)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_POLY_SEED = 97


def simhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       hash: str = "xxhash64") -> DataFrame:
    """64-bit SimHash over word tokens: per bit, sum +-1 votes of each
    token's hash bit; the sign of the vote is the signature bit.  Fully
    relational: explode tokens, unpack bits arithmetically, aggregate.

    ``hash``: 'xxhash64' (default — one JVM intrinsic per token, the
    production path) or 'poly' (cross-engine mode: one polynomial fold
    per token + 64 Carter-Wegman bit mixes ``((h·A_j + B_j) mod M31)
    mod 2`` with literal constants — every signature replayable in
    DuckDB, so the correctness gate verifies the banding math end to
    end instead of pinning it)."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(normalize_text(text_col), " ")).alias("tok"))
    if hash == "poly":
        from .bootstrap import cw_constants, _M31
        from .splits import raw_hash
        cw = cw_constants(64, SIMHASH_POLY_SEED)
        toks = toks.withColumn("h", raw_hash(F.col("tok")))
        bit = lambda i: F.pmod(  # noqa: E731
            F.col("h") * F.lit(cw[i][0]) + F.lit(cw[i][1]),
            F.lit(_M31)) % 2
    else:
        hx = F.xxhash64("tok")
        bit = lambda i: (F.shiftrightunsigned(hx, i)  # noqa: E731
                         .bitwiseAND(F.lit(1).cast("long")))
    votes = toks.groupBy("doc").agg(*[
        F.sum(bit(i) * 2 - 1).alias(f"v{i}")
        for i in range(64)
    ])
    sig = None
    for i in range(64):
        bit = (F.col(f"v{i}") > 0).cast("long") * F.lit(2 ** i if i < 63
                                                        else -(2 ** 63))
        sig = bit if sig is None else sig + bit
    return votes.select("doc", sig.alias("simhash"))


def simhash_near_duplicates(df: DataFrame, id_col: str, text_col: str,
                            max_distance: int = 3,
                            hash: str = "xxhash64") -> DataFrame:
    """Pairs within Hamming distance ``max_distance`` of their SimHash.
    Candidates via the pigeonhole bands: with 4 16-bit bands, any pair
    at distance <= 3 shares at least one exact band — the banding is
    LOSSLESS at this distance, so an oracle may recompute the pairs by
    brute force and must get the identical set."""
    sigs = simhash_signatures(df, id_col, text_col, hash=hash)
    bands = sigs.select(
        "doc", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned("simhash", 16 * b)
                 .bitwiseAND(F.lit(0xFFFF).cast("long")).alias("key"))
            for b in range(4)
        ])).alias("bb"))
    left = bands.select("bb", F.col("doc").alias("a"),
                        F.col("simhash").alias("sig_a"))
    right = bands.select("bb", F.col("doc").alias("b"),
                         F.col("simhash").alias("sig_b"))
    pairs = (left.join(right, "bb")
             .filter(F.col("a") < F.col("b"))
             .select("a", "b", "sig_a", "sig_b").distinct()
             .withColumn("hamming",
                         F.bit_count(F.col("sig_a")
                                     .bitwiseXOR(F.col("sig_b")))))
    return (pairs.filter(F.col("hamming") <= max_distance)
                 .select("a", "b", "hamming"))


# ---------------------------------------------------------------------------
# duplicate-group clustering
# ---------------------------------------------------------------------------

def connected_components(pairs: DataFrame, a_col: str = "a",
                         b_col: str = "b",
                         max_iter: int = 25) -> DataFrame:
    """Connected components over near-duplicate pair edges: every doc
    linked (transitively) through the pairs gets the component id
    ``min(member ids)`` — the canonical-representative step that turns
    pairwise near-dup output into duplicate GROUPS for keep-one-drop-
    rest curation.

    Iterative min-label propagation: each round every node takes the
    minimum label in its closed neighborhood (one symmetric-edge join +
    one groupBy per round), stopping when a round changes nothing.
    Rounds needed = graph diameter, which for near-dup clusters is tiny
    (duplicates of one source document form near-cliques); the classic
    large-star/small-star alternation would cut worst-case chains to
    O(log n) rounds at the cost of reshaping edges every round — for
    the dedup workload the simple propagation converges faster in
    practice and keeps every round a single narrow shuffle.  Input
    pairs are deduplicated and treated as undirected."""
    sym = (pairs.select(F.col(a_col).alias("s"), F.col(b_col).alias("d"))
           .union(pairs.select(F.col(b_col).alias("s"),
                               F.col(a_col).alias("d")))
           .distinct()
           # edges are reused every round: truncate upstream lineage
           # once and keep the (narrow) edge list on the executors
           .localCheckpoint(eager=True))
    labels = (sym.select(F.col("s").alias("node"))
              .distinct()
              .withColumn("comp", F.col("node"))
              .localCheckpoint(eager=True))
    for _ in range(max_iter):
        neigh = (sym.join(labels, sym["d"] == labels["node"])
                 .groupBy("s")
                 .agg(F.min("comp").alias("neigh_min")))
        new_labels = (labels.join(neigh, labels["node"] == neigh["s"],
                                  "left")
                      .select("node",
                              F.least("comp", F.coalesce(
                                  "neigh_min", "comp")).alias("comp"))
                      # an iterative frame derived from itself grows an
                      # EXPONENTIAL logical plan; localCheckpoint cuts
                      # the lineage each round (the standard iterative-
                      # algorithm pattern — GraphFrames does the same)
                      .localCheckpoint(eager=True))
        changed = (new_labels.join(labels.withColumnRenamed("comp", "old"),
                                   "node")
                   .filter(F.col("comp") != F.col("old")).count())
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", "comp")


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

def decontaminate(train: DataFrame, eval_df: DataFrame, id_col: str,
                  text_col: str, threshold: float = 0.5,
                  num_hashes: int = 16, bands: int = 4,
                  shingle_n: int = 3,
                  max_shingle_df: Optional[int] = None) -> DataFrame:
    """Drop train documents whose n-gram Jaccard with ANY eval document
    reaches ``threshold`` (exact duplicates included — J=1).  The
    standard step before training on web corpora: eval sets must not
    leak into train, and near-duplicates leak just as well as
    byte-identical copies.

    Completeness is bounded by LSH candidate recall: a pair at exactly
    ``threshold`` is surfaced with probability
    ``1 - (1 - t^(num_hashes/bands))^bands`` — e.g. ~0.99 at t=0.5
    with ``num_hashes=32, bands=16``, rising steeply above the
    threshold.  Size the banding for the leakage tolerance (the gate
    query's recall is verified 1.0 against the exact all-pairs oracle
    on its corpus); pairs that do surface are verified with EXACT
    Jaccard, so precision is always exact.

    Ids must be unique across the two frames.  Plan shape: tag and
    union both corpora, ONE MinHash+LSH candidate pass over the union,
    exact-Jaccard verification of candidates only, keep the pairs that
    cross the split boundary, anti-join train against the contaminated
    ids — no all-pairs stage; quadratic only inside LSH buckets, so the
    cost at 10^12 docs is the near-dup pass it already shares with
    deduplication."""
    t = (train.select(F.col(id_col), F.col(text_col))
         .withColumn("__split", F.lit(0)))
    e = (eval_df.select(F.col(id_col), F.col(text_col))
         .withColumn("__split", F.lit(1)))
    both = t.unionByName(e)
    pairs = minhash_near_duplicates(both, id_col, text_col,
                                    num_hashes=num_hashes, bands=bands,
                                    threshold=threshold,
                                    shingle_n=shingle_n,
                                    max_shingle_df=max_shingle_df)
    split_of = both.select(F.col(id_col).alias("__id"), "__split")
    crossed = (pairs
               .join(split_of.withColumnRenamed("__id", "a")
                             .withColumnRenamed("__split", "sa"), "a")
               .join(split_of.withColumnRenamed("__id", "b")
                             .withColumnRenamed("__split", "sb"), "b")
               .filter(F.col("sa") != F.col("sb")))
    contaminated = (crossed
                    .select(F.when(F.col("sa") == 0, F.col("a"))
                            .otherwise(F.col("b")).alias(id_col))
                    .distinct())
    return train.join(contaminated, id_col, "left_anti")


def edit_distance_pairs(df: DataFrame, col: str,
                        max_edits: int = 1) -> DataFrame:
    """All DISTINCT string pairs within Levenshtein distance
    ``max_edits`` (currently 1) — the SymSpell/spell-dedup primitive,
    computed relationally with a provably complete candidate set: two
    strings are within edit distance 1 iff their deletion
    neighborhoods ``{s} ∪ deletes₁(s)`` intersect (a substitution
    meets at the same-position delete; an insert/delete meets at the
    shorter string itself).  So the plan is: generate ≤ len+1 variants
    per string (pure JVM ``transform`` over positions), equi-join on
    the variant (bucketed shuffle — never a cross join of the
    vocabulary), and verify candidates with the built-in
    ``levenshtein`` — exactness comes from the verify, completeness
    from the neighborhood property.

    Returns ``(a, b, dist)`` with ``a < b``.
    """
    if max_edits != 1:
        raise NotImplementedError(
            "deletion neighborhoods are generated for edit distance 1; "
            "k>1 needs k-deletes (|variants| ~ len^k)")
    base = df.select(F.col(col).alias("__s")).distinct()
    # delete the char at each position i (1-based), plus the string
    # itself
    variants = F.array_union(
        F.array(F.col("__s")),
        F.expr("transform(sequence(1, length(__s)), i -> "
               "concat(substring(__s, 1, i - 1), "
               "substring(__s, i + 1)))"))
    ex = base.select("__s", F.explode(variants).alias("__v"))
    pairs = (ex.alias("l").join(ex.alias("r"), "__v")
             .filter(F.col("l.__s") < F.col("r.__s"))
             .select(F.col("l.__s").alias("a"),
                     F.col("r.__s").alias("b"))
             .distinct())
    return (pairs
            .withColumn("dist", F.levenshtein("a", "b"))
            .filter(F.col("dist") <= max_edits))


def winnowing_fingerprints(df: DataFrame, id_col: str,
                           text_col: str = "text", k: int = 8,
                           window: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    "Winnowing: local algorithms for document fingerprinting", SIGMOD
    2003 — the MOSS algorithm): hash every k-gram of characters with
    the engine's portable polynomial hash (left fold over char codes,
    mod 2³¹−1), then keep the MINIMUM hash of every ``window``
    consecutive positions.  The guarantee: any shared substring of
    length ≥ k + window − 1 yields at least one shared fingerprint,
    while only ~2/(window+1) of positions survive — local,
    deterministic, position-free.

    The per-document hashing is an Arrow-batched ``mapInPandas`` in
    vectorized NumPy (k shifted adds per doc, a sliding-window min,
    one unique) — the engine's declared pattern for payload-like
    per-row compute.  A pure higher-order-expression formulation
    exists but re-evaluates the position-hash array once PER WINDOW
    (Catalyst inlines the array expression into the outer lambda), an
    O(n²k) blowup measured at >100 s for five documents — the
    documented reason this one operator leaves whole-stage codegen.

    Contract: text is hashed per UTF-8 byte; for ASCII corpora this
    equals the SQL oracle's per-character ``ascii(substr(…))`` replay
    (declared — normalize non-ASCII upstream if byte/char parity
    matters).  Documents shorter than k + window − 1 chars produce no
    fingerprints.

    Returns (id, fingerprint) — the DISTINCT selected hashes per
    document, exploded for the shared-fingerprint equi-join.
    """
    run, out_schema = winnow_mapper(id_col, text_col, k, window)
    return (df.select(F.col(id_col).alias(id_col),
                      F.col(text_col).alias(text_col))
            .mapInPandas(run, out_schema)
            .distinct())


def winnow_mapper(id_col: str, text_col: str, k: int = 8,
                  window: int = 4):
    """(mapInPandas generator, schema) computing per-document
    winnowing fingerprints — the stateless per-row core shared by the
    batch operator above and the STREAMING incremental
    fingerprint-DF maintenance (``streaming.dedup.stream_winnow_df``):
    per-document selection is ``np.unique``'d, so each (id,
    fingerprint) row is emitted exactly once per document and a plain
    count over the stream IS the document frequency."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from .bootstrap import _M31
    if k < 2 or window < 1:
        raise ValueError("need k >= 2 and window >= 1")
    kk, ww, mod = int(k), int(window), int(_M31)

    out_schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("fingerprint", T.LongType()),
    ])

    def run(pdfs):
        for pdf in pdfs:
            ids, fps = [], []
            for rid, text in zip(pdf[id_col].to_numpy(),
                                 pdf[text_col].to_numpy()):
                b = np.frombuffer(str(text).encode("utf-8"),
                                  dtype=np.uint8).astype(np.int64)
                n_pos = len(b) - kk + 1
                n_win = n_pos - ww + 1
                if n_win < 1:
                    continue
                h = np.zeros(n_pos, dtype=np.int64)
                for j in range(kk):
                    h = (h * 31 + b[j:j + n_pos]) % mod
                wins = np.lib.stride_tricks.sliding_window_view(h, ww)
                sel = np.unique(wins.min(axis=1))
                ids.append(np.full(len(sel), rid, dtype=np.int64))
                fps.append(sel)
            if ids:
                yield pd.DataFrame({
                    "id": np.concatenate(ids),
                    "fingerprint": np.concatenate(fps)})
            else:
                yield pd.DataFrame({"id": pd.Series([], dtype="int64"),
                                    "fingerprint": pd.Series(
                                        [], dtype="int64")})

    return run, out_schema


def winnowing_pairs(df: DataFrame, id_col: str,
                    text_col: str = "text", k: int = 8,
                    window: int = 4, min_shared: int = 2,
                    max_fp_df: Optional[int] = None) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` winnowing fingerprints
    — the substring-level near-duplicate detector (verbatim reuse,
    boilerplate, plagiarism) that shingle-Jaccard misses when the
    shared span is a small fraction of both documents.

    Plan: fingerprints (map-only per doc) → equi-join on the
    fingerprint value → pair count.  ``max_fp_df`` drops fingerprints
    shared by more than that many documents before pairing (the same
    declared stopword-bucket cap as MinHash banding — a boilerplate
    fingerprint in 10⁶ docs would otherwise fan out 10¹² pairs).
    Returns (a, b, n_shared).
    """
    fps = winnowing_fingerprints(df, id_col, text_col, k, window)
    if max_fp_df is not None:
        keep = (fps.groupBy("fingerprint")
                .agg(F.count(F.lit(1)).alias("df"))
                .filter(F.col("df") <= max_fp_df)
                .select("fingerprint"))
        fps = fps.join(keep, "fingerprint", "left_semi")
    l = fps.select(F.col("fingerprint"), F.col("id").alias("a"))
    r = fps.select(F.col("fingerprint"), F.col("id").alias("b"))
    return (l.join(r, "fingerprint")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= int(min_shared)))


def prefix_similarity_join(df: DataFrame, id_col: str,
                           text_col: str = "text",
                           t_num: int = 1, t_den: int = 2,
                           shingle_n: int = 3) -> DataFrame:
    """EXACT set-similarity self-join with prefix filtering (Bayardo,
    Ma, Srikant, "Scaling up all pairs similarity search", WWW 2007 —
    AllPairs; Chaudhuri et al.'s prefix-filter lemma): all document
    pairs with shingle Jaccard ≥ t, with NO false negatives — the
    deterministic sibling of MinHash-LSH (which trades recall for
    speed; this trades a candidate bound that is data-dependent but
    exact).

    The lemma: order the shingle universe canonically (document
    frequency ascending — rarest first — then shingle text); if
    |A∩B| ≥ ⌈t·|A|⌉ then the first |A| − ⌈t·|A|⌉ + 1 shingles of A
    (its PREFIX) must contain an intersection element, so two
    qualifying documents always share a prefix shingle.  Candidates =
    pairs sharing ≥ 1 prefix shingle (equi-join on the prefix
    explode, quadratic only inside rare-shingle buckets by
    construction) + the size filter t·|B| ≤ |A| (J ≤ |A|/|B| for
    |A| ≤ |B|); verification = the exact Jaccard machinery
    (:func:`jaccard_pairs`) on the candidate set.

    The threshold is a RATIONAL t = t_num/t_den so the prefix length
    ⌈t·|A|⌉ = (t_num·|A| + t_den − 1) DIV t_den is exact integer
    arithmetic — no float boundary decides candidate membership.

    Scale shape: one shingle-frequency shuffle, one per-doc sort of
    its own shingles (bounded by doc length), prefix explode (a
    ~(1−t) fraction of each doc's shingles), equi-join, then exact
    verification inside candidates only.  Rarest-first ordering makes
    hot shingles land at the END of documents' orderings, so they
    rarely enter prefixes — the built-in stopword defense LSH needs a
    DF cap for.  Returns (a, b, n_common, n_a, n_b, jaccard) for
    pairs with jaccard ≥ t.
    """
    if not (0 < t_num <= t_den):
        raise ValueError("need 0 < t_num <= t_den (a threshold in (0,1])")
    sh = exploded_shingles(df, id_col, text_col, shingle_n).distinct()
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    per_doc = (sh.join(dfreq, "shingle")
               .groupBy("doc")
               .agg(F.sort_array(F.collect_list(F.struct(
                   F.col("__df").alias("df"),
                   F.col("shingle").alias("s")))).alias("ord"),
                    F.count(F.lit(1)).alias("size")))
    plen_sql = (f"CAST(size - (({int(t_num)} * size + {int(t_den)} - 1)"
                f" DIV {int(t_den)}) + 1 AS INT)")
    pref = (per_doc
            .select("doc", "size",
                    F.explode(F.expr(f"slice(ord, 1, {plen_sql})"))
                    .alias("p"))
            .select("doc", "size", F.col("p.s").alias("shingle")))
    l = pref.select(F.col("shingle"), F.col("doc").alias("a"),
                    F.col("size").alias("na"))
    r = pref.select(F.col("shingle"), F.col("doc").alias("b"),
                    F.col("size").alias("nb"))
    cands = (l.join(r, "shingle")
             .filter(F.col("a") < F.col("b"))
             # size filter: J >= t forces t*max(|A|,|B|) <= min
             .filter(F.lit(int(t_num))
                     * F.greatest("na", "nb")
                     <= F.lit(int(t_den)) * F.least("na", "nb"))
             .select("a", "b").distinct())
    return jaccard_pairs(df, id_col, text_col, candidates=cands,
                         threshold=float(t_num) / float(t_den),
                         shingle_n=shingle_n)


def lincoln_petersen(sample_a: DataFrame, sample_b: DataFrame,
                     key_col: str) -> DataFrame:
    """Chapman-corrected Lincoln–Petersen capture-recapture estimate
    of a POPULATION size from two overlapping samples — in a data
    pipeline: how many distinct entities (users, documents, dup
    clusters) exist in total, estimated from two independent partial
    scans and their overlap:

        N̂ = (n_a+1)(n_b+1)/(m+1) − 1,
        var(N̂) = (n_a+1)(n_b+1)(n_a−m)(n_b−m) / ((m+1)²(m+2))

    with m the exact distinct-key overlap (one semi-join on the
    distinct key sets).  All counts exact int64; the estimate and
    variance are mirrored float expressions.  Returns one row:
    (n_a, n_b, n_overlap, n_hat, var_hat)."""
    a = sample_a.select(F.col(key_col).alias("k")).distinct()
    b = sample_b.select(F.col(key_col).alias("k")).distinct()
    na = a.agg(F.count(F.lit(1)).alias("n_a"))
    nb = b.agg(F.count(F.lit(1)).alias("n_b"))
    m = (a.join(b, "k", "left_semi")
         .agg(F.count(F.lit(1)).alias("n_overlap")))
    j = na.crossJoin(nb).crossJoin(m)

    def d(c):
        return F.col(c).cast("double")

    nhat = ((d("n_a") + 1.0) * (d("n_b") + 1.0)
            / (d("n_overlap") + 1.0) - 1.0)
    var = ((d("n_a") + 1.0) * (d("n_b") + 1.0)
           * (d("n_a") - d("n_overlap"))
           * (d("n_b") - d("n_overlap"))
           / ((d("n_overlap") + 1.0) * (d("n_overlap") + 1.0)
              * (d("n_overlap") + 2.0)))
    return j.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("n_overlap").cast("long").alias("n_overlap"),
        nhat.alias("n_hat"), var.alias("var_hat"))

"""bpe_train / bpe_segment vs a brute-force reference implementation."""
from __future__ import annotations

from collections import Counter

import pytest


def _brute_bpe(vocab, rounds):
    """Reference BPE trainer on (word -> weight): list segmentations,
    (count DESC, lhs ASC, rhs ASC) argmax, merge everywhere."""
    segs = {wd: list(wd) for wd in vocab}
    merges = []
    for _ in range(rounds):
        c = Counter()
        for wd, seg in segs.items():
            for i in range(len(seg) - 1):
                c[(seg[i], seg[i + 1])] += vocab[wd]
        if not c:
            break
        (lhs, rhs), cnt = min(
            c.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((lhs, rhs, lhs + rhs, cnt))
        for wd, seg in segs.items():
            out, i = [], 0
            while i < len(seg):
                if (i + 1 < len(seg) and seg[i] == lhs
                        and seg[i + 1] == rhs):
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(seg[i])
                    i += 1
            segs[wd] = out
    return merges, segs


def test_bpe_train_matches_brute(spark):
    from hiselspark.operators.bpe import bpe_train
    vocab = {"lower": 5, "lowest": 2, "newer": 6, "wider": 3,
             "low": 7, "newest": 4, "widest": 1}
    df = spark.createDataFrame(list(vocab.items()),
                               "word string, w long")
    got = bpe_train(df, "word", "w", rounds=8).orderBy("step").collect()
    exp, _ = _brute_bpe(vocab, 8)
    assert len(got) == len(exp)
    for row, (lhs, rhs, tok, cnt) in zip(got, exp):
        assert (row["lhs"], row["rhs"]) == (lhs, rhs)
        assert row["token"] == tok
        assert row["pair_count"] == cnt


def test_bpe_segment_matches_brute_incl_adjacent_merges(spark):
    from hiselspark.operators.bpe import bpe_segment, bpe_train
    # 'aaaa' stresses adjacent-occurrence merging: ('a','a') -> 'aa aa'
    vocab = {"aaaa": 10, "aab": 4, "banana": 3}
    df = spark.createDataFrame(list(vocab.items()),
                               "word string, w long")
    m = bpe_train(df, "word", "w", rounds=4).orderBy("step").collect()
    exp_merges, exp_segs = _brute_bpe(vocab, 4)
    assert [(r["lhs"], r["rhs"]) for r in m] \
        == [(l, r) for l, r, _, _ in exp_merges]
    rules = [(r["lhs"], r["rhs"]) for r in m]
    got = {r["word"]: r["bpe_seq"] for r in
           bpe_segment(df, "word", rules).collect()}
    for wd, seg in exp_segs.items():
        assert got[wd] == " ".join(seg), wd


def test_bpe_train_early_stop_and_validation(spark):
    from hiselspark.operators.bpe import bpe_train
    # single-char words: no pairs at all -> zero merges
    df = spark.createDataFrame([("a", 5), ("b", 3)],
                               "word string, w long")
    assert bpe_train(df, "word", "w", rounds=3).count() == 0
    # 'ab' exhausts after one merge
    df2 = spark.createDataFrame([("ab", 5)], "word string, w long")
    got = bpe_train(df2, "word", "w", rounds=5).collect()
    assert len(got) == 1 and got[0]["token"] == "ab"
    with pytest.raises(ValueError):
        bpe_train(df2, "word", "w", rounds=0)

"""with_c4_flags / with_blur_score vs hand-computed oracles."""
from __future__ import annotations

import numpy as np
import pytest


def test_c4_flags_hand_cases(spark):
    from hiselspark.functions.text import with_c4_flags
    docs = [
        # 3 sentences, all lines kept -> pass
        (0, "one two three four five.\nsix seven eight nine ten!\n"
            "alpha beta gamma delta eps?"),
        # lorem ipsum -> fail
        (1, "one two three four five.\nsix seven eight nine ten.\n"
            "lorem ipsum dolor sit amet."),
        # curly brace -> fail
        (2, "one two three four five.\nsix seven eight nine ten.\n"
            "var x = { a: 1 }."),
        # too few sentences -> fail
        (3, "one two three four five.\njust words no punct here"),
        # short line dropped, long kept; javascript line counted
        (4, "tiny line.\nenable javascript to view this page\n"
            "a proper sentence with enough words here.\n"
            "another full sentence with plenty of words too!\n"
            "and a third complete sentence for the count."),
        # empty text
        (5, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in with_c4_flags(df).collect()}

    assert got[0]["c4_pass"] is True
    assert got[0]["n_lines"] == 3 and got[0]["n_kept_lines"] == 3
    assert got[0]["n_sentences"] == 3
    assert got[0]["kept_ratio"] == pytest.approx(1.0)

    assert got[1]["has_lorem"] is True and got[1]["c4_pass"] is False
    assert got[2]["has_brace"] is True and got[2]["c4_pass"] is False
    assert got[3]["n_sentences"] == 1 and got[3]["c4_pass"] is False

    r4 = got[4]
    assert r4["n_lines"] == 5
    # "tiny line." has <5 words; the javascript line has no terminal
    # punctuation; three full sentences remain
    assert r4["n_kept_lines"] == 3
    assert r4["n_js_lines"] == 1
    assert r4["n_sentences"] == 4 and r4["c4_pass"] is True
    assert 0.0 < r4["kept_ratio"] < 1.0

    r5 = got[5]
    assert r5["n_lines"] == 0 and r5["kept_ratio"] is None
    assert r5["c4_pass"] is False


def _brute_lap_stats(img):
    g = img.sum(axis=2).astype(np.int64)
    r = (4 * g[1:-1, 1:-1] - g[:-2, 1:-1] - g[2:, 1:-1]
         - g[1:-1, :-2] - g[1:-1, 2:])
    n = r.size
    s = int(r.sum())
    ss = int((r * r).sum())
    return n, s, ss, (n * ss - s * s) / (n * n)


def test_blur_score_matches_brute_and_flags_flat(spark):
    from hiselspark.functions.image import with_blur_score
    rng = np.random.default_rng(5)
    rows, imgs = [], {}
    for i in range(8):
        if i < 3:
            img = np.full((10, 12, 3), 40 + i, dtype=np.uint8)  # flat
        else:
            img = rng.integers(0, 256, (10, 12, 3)).astype(np.uint8)
        imgs[i] = img
        rows.append((i, 12, 10, "raw", img.tobytes()))
    df = spark.createDataFrame(
        rows, "img_id long, w int, h int, fmt string, bytes binary")
    got = {r["img_id"]: r for r in
           with_blur_score(df, var_threshold=900).collect()}
    for i, img in imgs.items():
        n, s, ss, var = _brute_lap_stats(img)
        assert got[i]["lap_n"] == n
        assert got[i]["lap_sum"] == s
        assert got[i]["lap_sumsq"] == ss
        assert got[i]["lap_var"] == pytest.approx(var, rel=1e-12)
        assert got[i]["is_blurry"] == (n * ss - s * s < 900 * n * n)
    # flat images are blurry, noise images are not
    assert all(got[i]["is_blurry"] for i in range(3))
    assert not any(got[i]["is_blurry"] for i in range(3, 8))
    with pytest.raises(ValueError):
        with_blur_score(df, var_threshold=-1)

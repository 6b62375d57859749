"""with_scene_cuts vs hand-built clips."""
from __future__ import annotations

import numpy as np
import pytest


def _clip(frames):
    return b"".join(f.tobytes() for f in frames)


def test_scene_cuts_hand_cases(spark):
    from hiselspark.functions.video import with_scene_cuts
    rng = np.random.default_rng(17)
    w = h = 4
    a = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    b = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    c = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    jitter = a.copy()
    jitter[0, 0, 0] ^= 1          # 1-byte wiggle: below any threshold
    rows = [
        # scenes [a,a,jitter][b,b][c] -> cuts at f=3 and f=5
        (0, w, h, "rawv", _clip([a, a, jitter, b, b, c])),
        # static clip -> one scene
        (1, w, h, "rawv", _clip([a, a, a, a])),
        # alternating every frame -> cut at every transition
        (2, w, h, "rawv", _clip([a, b, a, b])),
        # single frame
        (3, w, h, "rawv", _clip([a])),
    ]
    df = spark.createDataFrame(
        rows, "vid long, w int, h int, container string, video binary")
    got = {r["vid"]: r for r in
           with_scene_cuts(df, id_col="vid", bytes_col="video",
                           sad_threshold_per_byte=8).collect()}

    r0 = got[0]
    assert r0["n_frames"] == 6 and r0["n_cuts"] == 2
    assert r0["n_scenes"] == 3 and r0["longest_scene"] == 3
    assert r0["first_cut"] == 3

    r1 = got[1]
    assert r1["n_cuts"] == 0 and r1["n_scenes"] == 1
    assert r1["longest_scene"] == 4 and r1["first_cut"] is None
    assert r1["sad_total"] == 0

    r2 = got[2]
    assert r2["n_cuts"] == 3 and r2["n_scenes"] == 4
    assert r2["longest_scene"] == 1 and r2["first_cut"] == 1

    r3 = got[3]
    assert r3["n_frames"] == 1 and r3["n_scenes"] == 1
    assert r3["longest_scene"] == 1 and r3["sad_total"] == 0

    with pytest.raises(ValueError):
        with_scene_cuts(df, id_col="vid", bytes_col="video",
                        sad_threshold_per_byte=-1)


def test_scene_cuts_sad_exact(spark):
    from hiselspark.functions.video import with_scene_cuts
    w = h = 2
    f0 = np.zeros((h, w, 3), dtype=np.uint8)
    f1 = np.full((h, w, 3), 10, dtype=np.uint8)      # SAD = 12*10
    f2 = np.full((h, w, 3), 250, dtype=np.uint8)     # SAD = 12*240
    df = spark.createDataFrame(
        [(0, w, h, "rawv", _clip([f0, f1, f2]))],
        "vid long, w int, h int, container string, video binary")
    got = with_scene_cuts(df, id_col="vid", bytes_col="video",
                          sad_threshold_per_byte=50).collect()[0]
    assert got["sad_total"] == 12 * 10 + 12 * 240
    # only the second transition (mean 240 > 50) is a cut
    assert got["n_cuts"] == 1 and got["first_cut"] == 2
    assert got["longest_scene"] == 2

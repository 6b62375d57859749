"""Video-payload operators: frame sampling + per-frame statistics.

Video rides as an opaque ``binary`` column with typed metadata
``(w, h, n_frames, container)``.  The ``rawv`` container (concatenated
uncompressed RGB8 frames — the decoded form any real decoder hands
back) is implemented exactly; real containers (mp4/webm/mkv) need
ffmpeg-class libraries absent from this sandbox and raise
``NotImplementedError`` behind the registry.  The Spark-side plumbing
— schema, frame-sampling fan-out (one output row per sampled frame),
Arrow batch shapes — is the production-relevant part and is identical
for every container.

``sample_frames`` is the standard training-data pattern: a video row
fans out to every k-th frame as an image row ``(bytes, w, h,
fmt='raw', frame_idx)``, after which the IMAGE operators (pixel stats,
resize, phash features) apply unchanged — multimodal pipelines reuse
one image path.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, types as T


def _frames_rawv(buf: bytes, w: int, h: int) -> np.ndarray:
    frame_bytes = w * h * 3
    n = len(buf) // frame_bytes
    return np.frombuffer(buf[: n * frame_bytes],
                         dtype=np.uint8).reshape(n, h, w, 3)


def _unavailable(container: str) -> Callable[..., np.ndarray]:
    def _raise(buf, w, h):
        raise NotImplementedError(
            f"video container '{container}' needs a decoder "
            "(ffmpeg/pyav) not available in this environment; extend "
            "VIDEO_CONTAINERS to add it")
    return _raise


VIDEO_CONTAINERS: Dict[str, Callable[[bytes, int, int], np.ndarray]] = {
    "rawv": _frames_rawv,
    "mp4": _unavailable("mp4"),
    "webm": _unavailable("webm"),
    "mkv": _unavailable("mkv"),
}


def decode_frames(buf: bytes, w: int, h: int, container: str) -> np.ndarray:
    """All frames as (n, h, w, 3) uint8."""
    try:
        dec = VIDEO_CONTAINERS[container]
    except KeyError:
        raise NotImplementedError(f"unknown video container: {container}")
    return dec(buf, w, h)


def sample_frames(df: DataFrame, every_k: int = 10,
                  id_col: str = "video_id",
                  bytes_col: str = "video",
                  container_col: str = "container") -> DataFrame:
    """Fan each video row out to its sampled frames: one output row per
    frame index ``0, k, 2k, ...`` with columns ``(id, frame_idx,
    bytes, w, h, fmt='raw')`` — image rows the rest of the engine
    consumes directly.  Arrow-batched ``mapInPandas``: the fan-out
    happens inside the task, so the (large) video payload is read once
    and only the sampled frames are emitted."""
    out_schema = T.StructType([
        df.schema[id_col],
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
    ])

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for _, r in pdf.iterrows():
                frames = decode_frames(r[bytes_col], int(r["w"]),
                                       int(r["h"]), str(r[container_col]))
                for idx in range(0, len(frames), every_k):
                    rows.append((r[id_col], idx, frames[idx].tobytes(),
                                 int(r["w"]), int(r["h"]), "raw"))
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "bytes",
                               "w", "h", "fmt"])

    return df.mapInPandas(run, out_schema)


def with_motion_score(df: DataFrame, id_col: str = "video_id",
                      bytes_col: str = "video",
                      container_col: str = "container",
                      out_col: str = "motion_score") -> DataFrame:
    """Mean absolute inter-frame difference (normalized to [0, 1]) —
    the cheap static-vs-dynamic content signal a video curation
    pipeline filters on.  One vectorized diff over the decoded frame
    tensor per clip; payload dropped afterwards."""
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != bytes_col]
        + [T.StructField(out_col, T.DoubleType())])

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            scores = np.zeros(len(pdf), dtype=np.float64)
            for i, (_, r) in enumerate(pdf.iterrows()):
                frames = decode_frames(r[bytes_col], int(r["w"]),
                                       int(r["h"]), str(r[container_col]))
                if len(frames) > 1:
                    d = np.abs(frames[1:].astype(np.int16)
                               - frames[:-1].astype(np.int16))
                    scores[i] = float(d.mean()) / 255.0
            out = pdf.drop(columns=[bytes_col])
            out[out_col] = scores
            yield out

    return df.mapInPandas(run, out_schema)


def with_scene_cuts(df: DataFrame, id_col: str = "video_id",
                    bytes_col: str = "video",
                    container_col: str = "container",
                    sad_threshold_per_byte: int = 8) -> DataFrame:
    """Scene-cut detection by thresholded inter-frame SAD — the shot
    segmentation step of a video curation pipeline (sample one
    keyframe per scene instead of every k-th frame).

    A CUT at transition f (between frames f-1 and f) fires when the
    exact integer sum of absolute byte differences exceeds
    ``sad_threshold_per_byte · w·h·3`` — an integer comparison, so
    another engine replays every decision from the pixel bytes.
    Scenes are the runs between cuts.

    Adds per clip: n_frames, n_cuts, n_scenes (= n_cuts+1 for
    non-empty clips, 0 otherwise), longest_scene (frames),
    first_cut (frame index opening the second scene; NULL if none),
    sad_total (exact int64 over all transitions).  Map-only
    ``mapInPandas``; one vectorized diff per clip; payload dropped.
    """
    thr = int(sad_threshold_per_byte)
    if thr < 0:
        raise ValueError(
            f"sad_threshold_per_byte must be >= 0, got {thr}")
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != bytes_col]
        + [T.StructField("n_frames", T.LongType()),
           T.StructField("n_cuts", T.LongType()),
           T.StructField("n_scenes", T.LongType()),
           T.StructField("longest_scene", T.LongType()),
           T.StructField("first_cut", T.LongType()),
           T.StructField("sad_total", T.LongType())])

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            m = len(pdf)
            nf = np.zeros(m, dtype=np.int64)
            nc = np.zeros(m, dtype=np.int64)
            ns = np.zeros(m, dtype=np.int64)
            longest = np.zeros(m, dtype=np.int64)
            first = np.full(m, -1, dtype=np.int64)
            sadt = np.zeros(m, dtype=np.int64)
            for i, (_, r) in enumerate(pdf.iterrows()):
                frames = decode_frames(r[bytes_col], int(r["w"]),
                                       int(r["h"]),
                                       str(r[container_col]))
                n = len(frames)
                nf[i] = n
                if n == 0:
                    continue
                if n > 1:
                    d = np.abs(frames[1:].astype(np.int64)
                               - frames[:-1].astype(np.int64))
                    sad = d.sum(axis=(1, 2, 3), dtype=np.int64)
                    sadt[i] = int(sad.sum())
                    limit = thr * frames[0].size
                    cut = sad > limit
                    nc[i] = int(cut.sum())
                    cut_pos = np.nonzero(cut)[0] + 1
                    if len(cut_pos):
                        first[i] = int(cut_pos[0])
                    bounds = np.concatenate(
                        ([0], cut_pos, [n])).astype(np.int64)
                    longest[i] = int(np.diff(bounds).max())
                else:
                    longest[i] = 1
                ns[i] = nc[i] + 1
            out = pdf.drop(columns=[bytes_col]).copy()
            out["n_frames"] = nf
            out["n_cuts"] = nc
            out["n_scenes"] = ns
            out["longest_scene"] = longest
            out["first_cut"] = pd.array(
                [None if v < 0 else int(v) for v in first],
                dtype="Int64")
            out["sad_total"] = sadt
            yield out

    return df.mapInPandas(run, out_schema)

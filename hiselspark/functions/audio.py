"""Audio-payload feature extraction.

Audio rides as an opaque ``binary`` column with typed metadata
``(sample_rate:int, n_channels:int, codec:string)`` — the audio twin of
the image input hint.  The ``pcm16`` codec (uncompressed little-endian
16-bit PCM, interleaved channels) is implemented exactly in NumPy;
compressed codecs (mp3/ogg/flac) need audio libraries absent from this
sandbox and raise ``NotImplementedError`` behind the same registry
pattern as the image codecs — the Spark-side plumbing (schema,
Arrow batching, vectorized reduction) is identical for every codec and
is what the tests exercise.

All features are classic corpus-curation signals: duration, RMS level,
peak, zero-crossing rate (a cheap voicing/noise discriminator), and
clipping ratio.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, types as T


def _decode_pcm16(buf: bytes, n_channels: int) -> np.ndarray:
    """(n_samples, n_channels) float64 in [-1, 1]."""
    arr = np.frombuffer(buf, dtype="<i2")
    if n_channels > 1:
        arr = arr[: len(arr) - len(arr) % n_channels]
        arr = arr.reshape(-1, n_channels)
    else:
        arr = arr.reshape(-1, 1)
    return arr.astype(np.float64) / 32768.0


def _unavailable(codec: str) -> Callable[..., np.ndarray]:
    def _raise(buf, n_channels):
        raise NotImplementedError(
            f"audio codec '{codec}' needs a decoder library "
            "(ffmpeg/libsndfile) not available in this environment; "
            "extend AUDIO_CODECS to add it")
    return _raise


AUDIO_CODECS: Dict[str, Callable[[bytes, int], np.ndarray]] = {
    "pcm16": _decode_pcm16,
    "mp3": _unavailable("mp3"),
    "ogg": _unavailable("ogg"),
    "flac": _unavailable("flac"),
}


def decode_audio(buf: bytes, n_channels: int, codec: str) -> np.ndarray:
    try:
        dec = AUDIO_CODECS[codec]
    except KeyError:
        raise NotImplementedError(f"unknown audio codec: {codec}")
    return dec(buf, n_channels)


AUDIO_FEATURE_FIELDS = [
    T.StructField("au_duration_s", T.DoubleType()),
    T.StructField("au_rms", T.DoubleType()),
    T.StructField("au_peak", T.DoubleType()),
    T.StructField("au_zcr", T.DoubleType()),
    T.StructField("au_clip_ratio", T.DoubleType()),
]


def pack_pcm16(df: DataFrame, values_col: str,
               out_col: str = "audio") -> DataFrame:
    """Encode an ``array<float>`` column as little-endian 16-bit PCM
    bytes (values clipped to [-1, 1], scaled by 32767, round-half-even
    like NumPy) — the synthesis twin of the ``pcm16`` decoder, used to
    drive the audio operators from numeric columns in tests and gate
    queries.  Arrow-batched, one vectorized pass per batch."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql import functions as F

    @pandas_udf(T.BinaryType())
    def pack(vs: pd.Series) -> pd.Series:
        out = []
        for v in vs:
            x = np.clip(np.asarray(v, dtype=np.float64), -1.0, 1.0)
            out.append(np.rint(x * 32767).astype("<i2").tobytes())
        return pd.Series(out)

    return df.withColumn(out_col, pack(F.col(values_col)))


def with_audio_features(df: DataFrame, bytes_col: str = "audio",
                        rate_col: str = "sample_rate",
                        channels_col: str = "n_channels",
                        codec_col: str = "codec") -> DataFrame:
    """Append per-clip features, dropping the payload afterwards (blobs
    never cross a shuffle).  Arrow-batched ``mapInPandas``; pcm16 clips
    decode as one ``frombuffer`` view each — the reduction is a handful
    of vectorized passes per clip, no per-sample Python."""
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != bytes_col]
        + AUDIO_FEATURE_FIELDS)

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            n = len(pdf)
            stats = np.zeros((n, 5), dtype=np.float64)
            bufs = pdf[bytes_col].to_numpy()
            rates = pdf[rate_col].to_numpy()
            chans = pdf[channels_col].to_numpy()
            codecs = pdf[codec_col].to_numpy()
            for i in range(n):
                x = decode_audio(bufs[i], int(chans[i]), str(codecs[i]))
                mono = x.mean(axis=1)
                ns = len(mono)
                if ns == 0:
                    continue
                stats[i, 0] = ns / float(rates[i])
                stats[i, 1] = float(np.sqrt(np.mean(mono * mono)))
                stats[i, 2] = float(np.max(np.abs(x)))
                if ns > 1:
                    stats[i, 3] = float(
                        np.count_nonzero(np.signbit(mono[1:])
                                         != np.signbit(mono[:-1]))
                        / (ns - 1))
                stats[i, 4] = float(np.mean(np.abs(x) >= 32767 / 32768.0))
            out = pdf.drop(columns=[bytes_col])
            for j, f in enumerate(AUDIO_FEATURE_FIELDS):
                out[f.name] = stats[:, j]
            yield out

    return df.mapInPandas(run, out_schema)


def audio_segments(df: DataFrame, id_col: str = "vec_id",
                   bytes_col: str = "audio",
                   channels_col: str = "n_channels",
                   codec_col: str = "codec",
                   frame_samples: int = 16,
                   energy_threshold: int = 1 << 28) -> DataFrame:
    """Energy-threshold segmentation (VAD-style): split each clip into
    non-overlapping ``frame_samples`` frames, mark a frame ACTIVE when
    its exact integer energy Σ s_int² (s_int = the int16 sample value)
    exceeds ``energy_threshold``, and emit one row per maximal RUN of
    active frames — the speech-activity segmenter every audio
    curation pass runs before transcription (trailing partial frames
    are dropped: a threshold over a shorter window isn't comparable).

    Exactness: pcm16 decode is lossless (float = s_int/32768), so the
    energies are exact BIGINTs and activity/segment boundaries are
    integer decisions — the SQL oracle replays every sample, frame sum
    and run.  Map-only ``mapInPandas``: the run-grouping happens
    vectorized inside the Arrow batch; payloads never shuffle.

    Returns (``id_col``, seg, start_frame, end_frame, n_frames,
    energy_sum).
    """
    out_schema = (f"{id_col} long, seg int, start_frame int, "
                  f"end_frame int, n_frames int, energy_sum long")

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = {k: [] for k in ("id", "seg", "a", "b", "n", "e")}
            for _, r in pdf.iterrows():
                x = decode_audio(r[bytes_col], int(r[channels_col]),
                                 str(r[codec_col]))
                mono = x.mean(axis=1)
                s = np.round(mono * 32768.0).astype(np.int64)
                nf = len(s) // frame_samples
                if nf == 0:
                    continue
                e = (s[:nf * frame_samples].reshape(nf, frame_samples)
                     .astype(np.int64) ** 2).sum(axis=1)
                act = e > int(energy_threshold)
                if not act.any():
                    continue
                idx = np.flatnonzero(act)
                # gaps-and-islands: run id = frame - rank among active
                grp = idx - np.arange(len(idx))
                for seg, g in enumerate(np.unique(grp)):
                    m = idx[grp == g]
                    rows["id"].append(int(r[id_col]))
                    rows["seg"].append(seg)
                    rows["a"].append(int(m[0]))
                    rows["b"].append(int(m[-1]))
                    rows["n"].append(len(m))
                    rows["e"].append(int(e[m].sum()))
            yield pd.DataFrame({id_col: rows["id"], "seg": rows["seg"],
                                "start_frame": rows["a"],
                                "end_frame": rows["b"],
                                "n_frames": rows["n"],
                                "energy_sum": rows["e"]})

    return df.mapInPandas(run, out_schema)

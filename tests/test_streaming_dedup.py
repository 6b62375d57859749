"""Streaming dedup: state persists across micro-batches, drained
result equals batch DISTINCT, append-mode one-row-per-distinct."""
import pandas as pd

from hiselspark.streaming.dedup import stream_dedup
from hiselspark.streaming.sessions import (read_events_stream,
                                           run_stream_to_batch,
                                           stage_microbatch_files)


def test_dedup_state_spans_microbatches(spark, tmp_path):
    # three ordered arrival batches; duplicates within AND across
    b1 = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": ["alpha beta", "gamma", "alpha  beta"]})
    b2 = pd.DataFrame({"doc_id": [3, 4],
                       "text": ["GAMMA", "delta"]})   # dup via lower()
    b3 = pd.DataFrame({"doc_id": [5, 6],
                       "text": ["delta", "epsilon"]})
    frames = [spark.createDataFrame(b) for b in (b1, b2, b3)]
    src = str(tmp_path / "src")
    stage_microbatch_files(frames, src)
    stream = read_events_stream(spark, src, frames[0].schema,
                                max_files_per_trigger=1)
    out = run_stream_to_batch(stream_dedup(stream),
                              output_mode="append").toPandas()
    # one survivor per distinct normalized text
    norms = sorted(out["text"].str.lower().str.strip()
                   .str.replace(r"\s+", " ", regex=True))
    assert norms == ["alpha beta", "delta", "epsilon", "gamma"]
    # first arrival wins: the batch-1/2 copies survive, not later ones
    assert set(out["doc_id"]) == {0, 1, 4, 6}

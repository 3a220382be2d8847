"""Multimodal column handling (beyond-reference; BASELINE.json north star).

Design: image/audio/video payloads are opaque `binary` columns with typed
metadata columns alongside. All heavy per-item work (decode, resize,
feature-extract, frame-sample) runs as Arrow-batched `mapInPandas` — one
Python worker invocation per batch, never per row, and the surrounding
plan (partitioning, pruning, joins on metadata) stays in Catalyst.

The decode stage itself is STUBBED: the container has no image/audio
libraries, so `decode_image`/`decode_audio` raise NotImplementedError and
`fake_payload_features` provides a deterministic md5-based stand-in. The
Spark-side plumbing — schema, batch iteration, output contract — is real
and oracle-tested (the fake features are reproducible in SQL).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id long, n_bytes long, content_hash string, fake_width int, fake_height int"


def decode_image(payload: bytes):
    """Real image decode would go here (PIL/libvips not in this container)."""
    raise NotImplementedError("image decoding requires an imaging library not present in this environment")


def decode_audio(payload: bytes):
    """Real audio decode would go here (soundfile/ffmpeg not in this container)."""
    raise NotImplementedError("audio decoding requires an audio library not present in this environment")


def payload_features(binary_df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over a (doc_id, payload binary) frame.

    Arrow moves each partition to Python in columnar batches; per-batch
    (not per-row) Python cost — the pattern a real decoder would use.

    The batch function is a self-contained closure (local imports only):
    executor workers deserialize it by value without importing this
    package, so the driver's sys.path / cwd don't matter. The deterministic
    fake features (byte length, content md5, md5-derived pseudo-dims)
    mirror the SQL oracle in plans/pipeline_queries.py exactly.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            if not len(pdf):
                continue
            hashes = [_hashlib.md5(b).hexdigest() for b in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) for b in pdf["payload"]],
                    "content_hash": hashes,
                    "fake_width": [int(h[:4], 16) % 1024 for h in hashes],
                    "fake_height": [int(h[4:8], 16) % 1024 for h in hashes],
                }
            )

    return binary_df.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_hash string"


def frame_samples(binary_df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: one output row per
    sampled 'frame' (payload byte-range), schema (doc_id, frame_idx,
    frame_hash). Real frame extraction would decode containers (no
    ffmpeg here) — the deterministic stand-in hashes n_frames equal byte
    slices, preserving the real op's row-explosion shape and batch-level
    Python cost."""

    def run(batches):
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids, idxs, hashes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = max(len(payload), 1)
                step = max(n // n_frames, 1)
                for i in range(min(n_frames, n)):
                    chunk = bytes(payload[i * step : (i + 1) * step])
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(_hashlib.md5(chunk).hexdigest())
            yield _pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_hash": hashes})

    return binary_df.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_stub(payload: bytes, width: int, height: int):
    """Real resize needs an imaging library not present in this container."""
    raise NotImplementedError("image resize requires an imaging library not present in this environment")


def documents_as_binary(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text as an opaque utf-8 payload so the
    multimodal plumbing is exercised against the fixtures."""
    return docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

"""Multimodal column handling (beyond-reference; BASELINE.json north star).

Design: image/audio/video payloads are opaque `binary` columns with typed
metadata columns alongside. All heavy per-item work (decode, resize,
feature-extract, frame-sample) runs as Arrow-batched `mapInPandas` — one
Python worker invocation per batch, never per row, and the surrounding
plan (partitioning, pruning, joins on metadata) stays in Catalyst.

Gating is asymmetric by stdlib reach: `decode_audio` is REAL — PCM WAV
parses with stdlib `wave` + `array`, no external deps (duration,
channels, integer energy/peak). Image decode stays gated — Python ships
no stdlib image codec — so `decode_image`/`resize_stub` raise
NotImplementedError and `payload_features` provides a deterministic
md5-based stand-in. The Spark-side plumbing — schema, batch iteration,
output contract — is real and oracle-tested either way (the audio
features and the fake image features are both reproducible in SQL).
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


def decode_audio(payload: bytes) -> dict:
    """REAL PCM WAV decode via stdlib `wave` (un-gated in r8 — VERDICT r7
    item 4): parses the RIFF container, returns channel count, sample
    rate, frame count, and integer signal stats over the 16-bit samples
    (`sum_sq` = total energy, `peak` = max |sample|). Integer stats keep
    the features bit-exact across engines — an RMS float would drag
    summation-order noise into the oracle contract; callers derive
    rms = sqrt(sum_sq / n_frames) when they want it.

    Only 16-bit PCM is supported (the overwhelmingly common case and the
    only one the synthesizer below emits); other sample widths raise
    ValueError rather than mis-parse."""
    import array as _array
    import io as _io
    import sys as _sys
    import wave as _wave

    with _wave.open(_io.BytesIO(payload), "rb") as w:
        nch = w.getnchannels()
        sampwidth = w.getsampwidth()
        framerate = w.getframerate()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)
    if sampwidth != 2:
        raise ValueError(f"decode_audio: only 16-bit PCM supported, got sampwidth={sampwidth}")
    samples = _array.array("h")
    samples.frombytes(raw)
    if _sys.byteorder == "big":  # WAV is little-endian; array('h') is native
        samples.byteswap()
    return {
        "n_channels": nch,
        "sample_rate": framerate,
        "n_frames": n_frames,
        "sum_sq": sum(int(s) * int(s) for s in samples),
        "peak": max((abs(int(s)) for s in samples), default=0),
    }


AUDIO_FEATURE_SCHEMA = (
    "doc_id long, n_channels int, sample_rate int, n_frames long, sum_sq long, peak int"
)


def synth_wav_payloads(ids_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic mono 16-bit 8 kHz WAV payload per id — the binary
    test corpus for the REAL audio decode path. Sample i of doc d is
    ((d*31 + i*7) % 2001) - 1000 over 64 + d%64 frames: pure integer
    arithmetic, so an oracle can regenerate the decoded features exactly
    without ever seeing the bytes. Arrow-batched like every payload op."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import array as _array
        import io as _io
        import sys as _sys
        import wave as _wave

        import pandas as _pd

        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 64 + d % 64
                samples = _array.array(
                    "h", [((d * 31 + i * 7) % 2001) - 1000 for i in range(n)]
                )
                if _sys.byteorder == "big":
                    samples.byteswap()
                buf = _io.BytesIO()
                with _wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(samples.tobytes())
                payloads.append(buf.getvalue())
            yield _pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return ids_df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        run, schema="doc_id long, payload binary"
    )


def audio_features(binary_df: DataFrame) -> DataFrame:
    """mapInPandas REAL-decode feature extraction over (doc_id, payload
    binary) WAV rows: stdlib `wave` parses each container executor-side,
    one Python invocation per Arrow batch. Self-contained closure (local
    imports only), same worker-deployment contract as payload_features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import array as _array
        import io as _io
        import sys as _sys
        import wave as _wave

        import pandas as _pd

        for pdf in batches:
            if not len(pdf):
                continue
            rows = {k: [] for k in ("doc_id", "n_channels", "sample_rate", "n_frames", "sum_sq", "peak")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                with _wave.open(_io.BytesIO(bytes(payload)), "rb") as w:
                    nch, sw = w.getnchannels(), w.getsampwidth()
                    fr, nf = w.getframerate(), w.getnframes()
                    raw = w.readframes(nf)
                if sw != 2:
                    raise ValueError(f"audio_features: only 16-bit PCM supported, got {sw}")
                samples = _array.array("h")
                samples.frombytes(raw)
                if _sys.byteorder == "big":
                    samples.byteswap()
                rows["doc_id"].append(doc_id)
                rows["n_channels"].append(nch)
                rows["sample_rate"].append(fr)
                rows["n_frames"].append(nf)
                rows["sum_sq"].append(sum(int(s) * int(s) for s in samples))
                rows["peak"].append(max((abs(int(s)) for s in samples), default=0))
            yield _pd.DataFrame(rows)

    return binary_df.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


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

"""Multimodal column handling (beyond-reference; BASELINE.json north star).

Design: image/audio/video payloads are opaque `binary` columns with typed
metadata columns alongside. All heavy per-item work (decode, resize,
feature-extract, frame-sample) runs as Arrow-batched `mapInPandas` — one
Python worker invocation per batch, never per row, and the surrounding
plan (partitioning, pruning, joins on metadata) stays in Catalyst.

Both decode paths are REAL and stdlib-only (r9; audio un-gated in r8,
image in r9): PCM WAV parses with stdlib `wave` + `array`; images use
binary PPM (P6) — an uncompressed header+raster format a hand-rolled
parser covers completely, so decode, per-channel integer stats, and
nearest-neighbor resize all run without an imaging library. Compressed
codecs (JPEG/PNG) would slot into the same mapInPandas signatures via
PIL/libvips where available; the contract (schema, batch iteration,
partitioning) is what this module pins, and the PPM path proves it with
real bytes end-to-end. `payload_features` additionally keeps the
deterministic md5-based stand-in for arbitrary non-image payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id long, n_bytes long, content_hash string, fake_width int, fake_height int"


def _parse_ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse a binary PPM (P6) header: magic, width, height, maxval, then
    exactly ONE whitespace byte before the raster. `#` comments are legal
    anywhere whitespace is (the netpbm spec) and skipped. Returns
    (width, height, maxval, raster_offset)."""
    if payload[:2] != b"P6":
        raise ValueError(f"decode_image: not a binary PPM (P6) payload, got {payload[:2]!r}")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("decode_image: truncated PPM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace byte that terminates the header
    return fields[0], fields[1], fields[2], pos


def decode_image(payload: bytes) -> dict:
    """REAL image decode for binary PPM (P6) — uncompressed RGB, fully
    parseable with stdlib bytes ops (r9, closing the last gated decode;
    the WAV recipe from r8). Returns dimensions plus integer per-channel
    stats (`sum_r/g/b` and `peak` = max sample across channels): integer
    features keep the oracle contract bit-exact across engines, exactly
    like decode_audio's sum_sq/peak.

    Only maxval <= 255 (1 byte/sample) is supported; 2-byte-maxval PPMs
    raise ValueError rather than mis-parse. Compressed formats (PNG/JPEG)
    need an imaging library this container doesn't ship — they would plug
    into the same signature."""
    w, h, maxval, off = _parse_ppm_header(payload)
    if maxval > 255:
        raise ValueError(f"decode_image: only 1-byte samples supported, maxval={maxval}")
    n = w * h * 3
    raster = payload[off : off + n]
    if len(raster) != n:
        raise ValueError(f"decode_image: raster truncated ({len(raster)} of {n} bytes)")
    return {
        "width": w,
        "height": h,
        "n_pixels": w * h,
        "sum_r": sum(raster[0::3]),
        "sum_g": sum(raster[1::3]),
        "sum_b": sum(raster[2::3]),
        "peak": max(raster) if raster else 0,
    }


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


IMAGE_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, n_pixels long, "
    "sum_r long, sum_g long, sum_b long, peak int"
)


def synth_ppm_payloads(ids_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic binary-PPM (P6) payload per id — the image twin of
    :func:`synth_wav_payloads`. Doc d is a (4 + d%13) x (3 + d%11) RGB
    image whose channel-c sample at flat pixel index p is
    (d*31 + p*7 + c*5) % 256: pure integer arithmetic, so the SQL oracle
    regenerates every decoded feature without ever seeing the bytes. A
    `# synthetic` header comment exercises the parser's comment skip on
    every payload. Arrow-batched like every payload op."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 4 + d % 13, 3 + d % 11
                raster = bytes(
                    (d * 31 + p * 7 + c * 5) % 256
                    for p in range(w * h)
                    for c in range(3)
                )
                payloads.append(b"P6\n# synthetic\n%d %d\n255\n" % (w, h) + raster)
            yield _pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return ids_df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        run, schema="doc_id long, payload binary"
    )


def image_features(binary_df: DataFrame) -> DataFrame:
    """mapInPandas REAL-decode image feature extraction over (doc_id,
    payload binary) PPM rows — the image twin of :func:`audio_features`:
    the hand-rolled P6 parser runs executor-side, one Python invocation
    per Arrow batch, emitting dimensions + integer per-channel sums +
    peak. Self-contained closure (the parser is inlined below by value),
    same worker-deployment contract as payload_features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def parse(payload: bytes):
            if payload[:2] != b"P6":
                raise ValueError(f"image_features: not P6, got {payload[:2]!r}")
            pos, fields = 2, []
            while len(fields) < 3:
                while pos < len(payload) and payload[pos : pos + 1].isspace():
                    pos += 1
                if pos < len(payload) and payload[pos : pos + 1] == b"#":
                    while pos < len(payload) and payload[pos] != 0x0A:
                        pos += 1
                    continue
                start = pos
                while pos < len(payload) and not payload[pos : pos + 1].isspace():
                    pos += 1
                if start == pos:
                    raise ValueError("image_features: truncated PPM header")
                fields.append(int(payload[start:pos]))
            pos += 1
            w, h, maxval = fields
            if maxval > 255:
                raise ValueError(f"image_features: maxval {maxval} > 255")
            n = w * h * 3
            raster = payload[pos : pos + n]
            if len(raster) != n:
                raise ValueError(f"image_features: raster truncated ({len(raster)}/{n})")
            return w, h, raster

        for pdf in batches:
            if not len(pdf):
                continue
            rows = {
                k: []
                for k in (
                    "doc_id", "width", "height", "n_pixels",
                    "sum_r", "sum_g", "sum_b", "peak",
                )
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, raster = parse(bytes(payload))
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(w * h)
                rows["sum_r"].append(sum(raster[0::3]))
                rows["sum_g"].append(sum(raster[1::3]))
                rows["sum_b"].append(sum(raster[2::3]))
                rows["peak"].append(max(raster) if raster else 0)
            yield _pd.DataFrame(rows)

    return binary_df.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


def resize_ppm(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize for binary PPM (P6) payloads (r9,
    replacing the gated resize stub): source pixel for target (y, x) is
    (y * src_h // height, x * src_w // width) — the standard integer
    nearest-neighbor map, deterministic and stdlib-only. Returns a
    well-formed P6 payload that round-trips through decode_image."""
    if width <= 0 or height <= 0:
        raise ValueError(f"resize_ppm: target {width}x{height} must be positive")
    src_w, src_h, maxval, off = _parse_ppm_header(payload)
    if maxval > 255:
        raise ValueError(f"resize_ppm: only 1-byte samples supported, maxval={maxval}")
    raster = payload[off : off + src_w * src_h * 3]
    if len(raster) != src_w * src_h * 3:
        raise ValueError("resize_ppm: raster truncated")
    out = bytearray()
    for y in range(height):
        sy = y * src_h // height
        for x in range(width):
            sx = x * src_w // width
            p = (sy * src_w + sx) * 3
            out += raster[p : p + 3]
    return b"P6\n%d %d\n%d\n" % (width, height, maxval) + bytes(out)


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


def documents_as_binary(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text as an opaque utf-8 payload so the
    multimodal plumbing is exercised against the fixtures."""
    return docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

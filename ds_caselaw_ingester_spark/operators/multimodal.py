"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference fans binary assets (docx/pdf/images) from tar members to S3
(SURVEY.md §2.6 K6-K10) without decoding them; a training-data pipeline
additionally needs decode / feature-extract over those bytes. Codec
libraries are not available in this container, so the decode kernel is
STUBBED: `decode_image_stub` computes deterministic fake metadata from the
raw bytes, and `decode_image_real` raises NotImplementedError where a
PIL/ffmpeg call would go. Everything around the stub — schema, Arrow
batching via mapInPandas, partitioning — is real and is what matters at
scale: bytes stay in executor-local Arrow batches, never on the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

ASSET_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("first_byte", T.IntegerType(), True),
        T.StructField("fake_width", T.IntegerType(), True),
        T.StructField("fake_height", T.IntegerType(), True),
        T.StructField("fake_channels", T.IntegerType(), True),
    ]
)


def decode_image_real(data: bytes) -> dict:
    """Where PIL.Image.open(io.BytesIO(data)) would go. The container has
    no codec libs; see decode_image_stub for the deterministic fake."""
    raise NotImplementedError("image codecs not available in this environment")


def decode_image_stub(data: bytes) -> tuple[int, int | None, int, int, int]:
    """Deterministic fake 'decode': metadata derived purely from bytes, so
    tests (and the DuckDB oracle) can verify the distributed plumbing."""
    n = len(data)
    first = data[0] if n else None
    width = n % 997
    height = (n * 31 + (first or 0)) % 997
    channels = ((first or 0) % 4) + 1
    return n, first, width, height, channels


def resize_image_real(data: bytes, width: int, height: int) -> bytes:
    """Where PIL Image.resize would go (no codec libs in this container)."""
    raise NotImplementedError("image codecs not available in this environment")


def resize_image_stub(data: bytes, width: int, height: int) -> tuple[int, int, int]:
    """Deterministic fake 'resize': output byte length scales with the
    requested area, derived purely from input bytes."""
    n = len(data)
    out_len = (n * width * height) % 65536
    checksum = (sum(data[:64]) + width * 7 + height * 13) % 997 if n else 0
    return out_len, width * height, checksum


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_offset", T.IntegerType(), False),
        T.StructField("frame_byte", T.IntegerType(), True),
        T.StructField("fake_luma", T.IntegerType(), True),
    ]
)


def sample_frames(
    assets: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "content",
    stride: int = 256,
) -> DataFrame:
    """Frame sampling over an opaque video/binary column: one OUTPUT row
    per sampled frame (fan-out inside mapInPandas — the batch shape a real
    ffmpeg frame grab would have). The 'decoded frame' is stubbed as the
    first byte of each `stride`-byte chunk; a real decoder drops in at the
    marked line without touching the Spark plan."""
    # validate at DRIVER time: stride=0 would be a per-task
    # ZeroDivisionError surfacing as an opaque PythonException mid-job,
    # and a negative stride silently reads wrong bytes
    if stride <= 0:
        raise ValueError(f"stride must be positive, got {stride}")

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(data) if data is not None else b""
                n_frames = (len(b) - 1) // stride + 1 if b else 0
                for i in range(n_frames):
                    off = i * stride
                    fb = b[off]  # <- real decoder call goes here
                    rows.append((int(doc_id), i, off, fb, (fb * 7) % 256))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "frame_offset", "frame_byte", "fake_luma"],
            )

    return assets.select(id_col, bin_col).mapInPandas(_sample, FRAME_SCHEMA)


def extract_asset_metadata(assets: DataFrame, id_col: str = "doc_id", bin_col: str = "content") -> DataFrame:
    """mapInPandas over (id, binary) -> typed metadata rows. Arrow-batched:
    each batch is a pandas DataFrame of raw bytes processed executor-side."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(data) if data is not None else b""
                n, first, w, h, c = decode_image_stub(b)
                rows.append((int(doc_id), n, first, w, h, c))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "byte_len",
                    "first_byte",
                    "fake_width",
                    "fake_height",
                    "fake_channels",
                ],
            )

    return assets.select(id_col, bin_col).mapInPandas(_extract, ASSET_META_SCHEMA)


AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("window_idx", T.IntegerType(), False),
        T.StructField("start_sample", T.LongType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("start_ms", T.DoubleType(), False),
        T.StructField("fake_rms", T.IntegerType(), True),
    ]
)


def decode_audio_real(data: bytes) -> dict:
    """Where soundfile/ffmpeg PCM decode would go (no codec libs in
    this container); see audio_windows' stub for the deterministic
    fake."""
    raise NotImplementedError("audio codecs not available in this environment")


def audio_windows(
    assets: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "content",
    sample_rate: int = 16_000,
    bytes_per_sample: int = 2,
    window_ms: int = 1_000,
    hop_ms: int = 500,
) -> DataFrame:
    """Fixed-duration (optionally overlapping) windowing over an opaque
    audio column — the ASR/feature-extraction batch shape (whisper-style
    chunking, wav2vec framing): one OUTPUT row per window with exact
    sample/byte arithmetic, fanned out inside mapInPandas so the bytes
    stay in executor-local Arrow batches.

    The PCM 'decode' is stubbed (the window's 'RMS' is a deterministic
    byte checksum of its first 64 bytes); a real decoder drops in at
    the marked line without touching the Spark plan — the schema,
    window arithmetic, batch fan-out, and partitioning are the real
    thing, per the module's stub doctrine. Windows shorter than a full
    `window_ms` at the tail are emitted (a real featurizer pads);
    documents with no bytes yield no windows."""
    if sample_rate <= 0 or bytes_per_sample <= 0:
        raise ValueError("sample_rate and bytes_per_sample must be positive")
    if window_ms <= 0 or not 0 < hop_ms <= window_ms:
        raise ValueError(
            f"need window_ms > 0 and 0 < hop_ms <= window_ms, got "
            f"{window_ms}/{hop_ms}"
        )
    win = int(sample_rate * window_ms / 1000)
    hop = int(sample_rate * hop_ms / 1000)
    if hop < 1:
        raise ValueError("hop_ms too small for sample_rate (0 samples)")

    def _windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(data) if data is not None else b""
                total = len(b) // bytes_per_sample
                i = 0
                start = 0
                while start < total:
                    n = min(win, total - start)
                    off = start * bytes_per_sample
                    chunk = b[off : off + min(64, n * bytes_per_sample)]
                    rms = (sum(chunk) % 32768) if chunk else None
                    # ^ real PCM decode + feature call goes here
                    rows.append(
                        (
                            int(doc_id),
                            i,
                            start,
                            n,
                            start * 1000.0 / sample_rate,
                            rms,
                        )
                    )
                    i += 1
                    start += hop
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "window_idx",
                    "start_sample",
                    "n_samples",
                    "start_ms",
                    "fake_rms",
                ],
            )

    return assets.select(id_col, bin_col).mapInPandas(_windows, AUDIO_WINDOW_SCHEMA)

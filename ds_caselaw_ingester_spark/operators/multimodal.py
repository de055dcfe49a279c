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

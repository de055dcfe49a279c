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

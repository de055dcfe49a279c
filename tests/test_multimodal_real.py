"""Round 10: the multimodal decode stubs partially retired — REAL
header/PCM decode for the formats the standard library can parse
(PNG/BMP/GIF/PPM image metadata, PCM WAV audio), exercised through the
same Arrow-batched Spark plumbing as the stub tier. Test assets are
generated in-test with struct/zlib/wave, so the expected values are
known bit-for-bit without any codec library."""

from __future__ import annotations

import io
import math
import struct
import wave
import zlib

import pytest

from ds_caselaw_ingester_spark.operators.multimodal import (
    audio_windows,
    decode_audio_real,
    decode_image_real,
    extract_image_metadata,
)


def _png(width: int, height: int) -> bytes:
    """Minimal valid grayscale PNG built with struct+zlib only."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(width) for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _bmp(width: int, height: int) -> bytes:
    row = (width * 3 + 3) // 4 * 4
    pixels = bytes(row * height)
    header = b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(pixels), 2835, 2835, 0, 0)
    return header + info + pixels


def _ppm(width: int, height: int) -> bytes:
    return (
        f"P6\n# a comment\n{width} {height}\n255\n".encode()
        + bytes(width * height * 3)
    )


def _gif(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00;"


def _wav(sample_rate: int, samples: "list[int]", channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def test_decode_image_real_parses_true_headers():
    assert decode_image_real(_png(320, 200)) == {
        "format": "png", "width": 320, "height": 200, "channels": 1,
    }
    assert decode_image_real(_bmp(17, 9)) == {
        "format": "bmp", "width": 17, "height": 9, "channels": 3,
    }
    assert decode_image_real(_ppm(5, 7)) == {
        "format": "ppm", "width": 5, "height": 7, "channels": 3,
    }
    assert decode_image_real(_gif(64, 32)) == {
        "format": "gif", "width": 64, "height": 32, "channels": 3,
    }
    with pytest.raises((NotImplementedError, Exception)):
        decode_image_real(b"\xff\xd8\xff\xe0 not enough jpeg here")


def test_extract_image_metadata_spark_plumbing(spark):
    """The real decoder through mapInPandas: true dimensions come back
    per document, and a corrupt asset becomes an errors-as-data row
    (NULL dims + message), never a job failure."""
    rows = [
        (1, bytearray(_png(320, 200))),
        (2, bytearray(_bmp(17, 9))),
        (3, bytearray(_gif(64, 32))),
        (4, bytearray(b"not an image at all")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: r.asDict() for r in extract_image_metadata(df).collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("png", 320, 200)
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("bmp", 17, 9)
    assert (got[3]["format"], got[3]["width"], got[3]["height"]) == ("gif", 64, 32)
    assert got[4]["format"] is None and got[4]["width"] is None
    assert got[4]["decode_error"]
    assert got[4]["byte_len"] == len(b"not an image at all")


def test_decode_audio_real_wav_roundtrip():
    samples = [0, 1000, -1000, 2000, -2000, 32767, -32768, 5]
    m = decode_audio_real(_wav(8000, samples))
    assert m["sample_rate"] == 8000
    assert m["n_channels"] == 1
    assert m["bytes_per_sample"] == 2
    assert m["n_frames"] == len(samples)
    assert struct.unpack(f"<{len(samples)}h", m["pcm"]) == tuple(samples)
    with pytest.raises(NotImplementedError):
        decode_audio_real(b"ID3\x03 an mp3, not a wav")


def test_audio_windows_wav_container_real_rms(spark):
    """container='wav': per-document sample rates come from the file
    headers (two documents, two rates, one call), window frame counts
    follow each document's own rate, and rms equals the pure-Python
    root-mean-square of exactly the window's samples."""
    sr_a, sr_b = 8000, 4000
    samp_a = [(i % 200 - 100) * 50 for i in range(12000)]  # 1.5 s @ 8 kHz
    samp_b = [3000] * 3000  # 0.75 s @ 4 kHz, constant amplitude
    df = spark.createDataFrame(
        [(1, bytearray(_wav(sr_a, samp_a))), (2, bytearray(_wav(sr_b, samp_b)))],
        "doc_id long, content binary",
    )
    out = audio_windows(
        df, window_ms=500, hop_ms=250, container="wav"
    ).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["window_idx"])

    # doc 1: 12000 frames @ 8 kHz, window 4000, hop 2000 -> starts at
    # 0,2000,...,10000 (tail windows included)
    starts = [r["start_sample"] for r in by_doc[1]]
    assert starts == [0, 2000, 4000, 6000, 8000, 10000]
    assert by_doc[1][0]["n_samples"] == 4000
    assert by_doc[1][-1]["n_samples"] == 2000  # tail
    assert all(r["sample_rate"] == sr_a for r in by_doc[1])

    # doc 2: 3000 frames @ 4 kHz, window 2000, hop 1000
    assert [r["start_sample"] for r in by_doc[2]] == [0, 1000, 2000]
    assert all(r["sample_rate"] == sr_b for r in by_doc[2])
    # constant-amplitude signal: every full window's TRUE rms is 3000
    assert by_doc[2][0]["rms"] == 3000.0

    # python replay of doc 1's second window
    w = samp_a[2000:6000]
    want = round(math.sqrt(sum(v * v for v in w) / len(w)), 6)
    assert by_doc[1][1]["rms"] == want

    # ms offsets follow each doc's own rate
    assert by_doc[1][1]["start_ms"] == 2000 * 1000.0 / sr_a
    assert by_doc[2][1]["start_ms"] == 1000 * 1000.0 / sr_b

    # corrupt wav raises naming the document
    bad = spark.createDataFrame(
        [(9, bytearray(b"RIFFxxxxWAVEbroken"))], "doc_id long, content binary"
    )
    with pytest.raises(Exception, match="doc 9"):
        audio_windows(bad, container="wav").collect()


def test_audio_windows_wav_24bit_names_the_document(spark):
    """A perfectly VALID 24-bit PCM WAV is unsupported in this container
    — the refusal must surface through the per-document error wrapping
    (naming the doc id), not escape from the RMS helper and kill the
    scan anonymously (ADVICE r10). decode_audio_real validates the
    sample width itself."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)  # 24-bit: wave writes it happily
        w.setframerate(8000)
        w.writeframes(b"\x00\x01\x02" * 100)
    wav24 = buf.getvalue()

    with pytest.raises(NotImplementedError, match="24-bit"):
        decode_audio_real(wav24)

    df = spark.createDataFrame(
        [(7, bytearray(wav24))], "doc_id long, content binary"
    )
    with pytest.raises(Exception, match="doc 7"):
        audio_windows(df, window_ms=500, hop_ms=250, container="wav").collect()

"""Multimodal binary-column plumbing: feature extraction, frame
sampling, resize — exact byte behavior through the real mapInPandas
path, plus the decode stubs' gating."""

from __future__ import annotations

import hashlib

import pytest

from hstream_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def bin_df(spark):
    rows = [
        (1, b"A" * 64 + b"B" * 64 + b"C" * 64 + b"D" * 64 + b"E" * 10),
        (2, b"xy"),
        (3, b""),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_binary_features_exact(spark, bin_df):
    rows = {r.doc_id: r for r in MM.binary_features(bin_df).collect()}
    assert rows[1].n_bytes == 266
    assert rows[2].sha256 == hashlib.sha256(b"xy").hexdigest()
    assert rows[2].head_int == 0  # < 4 bytes
    assert rows[1].head_int == int.from_bytes(b"AAAA", "big")


def test_sample_frames_every_other(spark, bin_df):
    out = MM.sample_frames(bin_df, frame_bytes=64, every=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.frame_idx] = bytes(r.frame)
    # doc 1: frames 0..4 (last partial), sampled 0, 2, 4
    assert sorted(by_doc[1]) == [0, 2, 4]
    assert by_doc[1][0] == b"A" * 64
    assert by_doc[1][2] == b"C" * 64
    assert by_doc[1][4] == b"E" * 10  # partial tail frame kept
    # doc 2: single partial frame 0
    assert by_doc[2] == {0: b"xy"}
    # doc 3: empty payload -> no frames
    assert 3 not in by_doc


def test_resize_payload_nearest_neighbor(spark, bin_df):
    out = {r.doc_id: bytes(r.resized) for r in MM.resize_payload(bin_df, out_len=8).collect()}
    src = b"A" * 64 + b"B" * 64 + b"C" * 64 + b"D" * 64 + b"E" * 10
    assert out[1] == bytes(src[(i * len(src)) // 8] for i in range(8))
    # upsample: indices repeat
    assert out[2] == b"xxxxyyyy"
    # empty stays empty
    assert out[3] == b""


def _has(mod: str) -> bool:
    import importlib.util

    return importlib.util.find_spec(mod) is not None


@pytest.mark.skipif(_has("PIL"), reason="PIL present: real decode covered below")
def test_image_decode_gates_cleanly_without_pil():
    with pytest.raises(NotImplementedError, match="PIL"):
        MM.decode_image(b"\x89PNG")


@pytest.mark.skipif(
    _has("soundfile"), reason="soundfile present: real decode covered below"
)
def test_non_wav_audio_gates_cleanly_without_soundfile():
    with pytest.raises(NotImplementedError, match="soundfile"):
        MM.decode_audio(b"fLaC....")


def test_wav_decode_via_stdlib():
    """PCM WAV decodes everywhere (stdlib wave): author a 2-channel
    16-bit WAV and get back the exact sample matrix + rate."""
    import io
    import struct
    import wave

    samples = [(0, 1), (2, -3), (32767, -32768)]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        for left, right in samples:
            w.writeframes(struct.pack("<hh", left, right))
    arr, rate = MM.decode_audio(buf.getvalue())
    assert rate == 16000
    assert arr.shape == (3, 2)
    assert [tuple(int(v) for v in row) for row in arr] == samples


@pytest.mark.skipif(not _has("PIL"), reason="PIL not installed (optional extra)")
def test_image_decode_real_when_pil_present():
    import io

    from PIL import Image

    im = Image.new("RGB", (4, 2), (255, 0, 0))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    arr = MM.decode_image(buf.getvalue())
    assert arr.shape == (2, 4, 3)
    assert tuple(int(v) for v in arr[0, 0]) == (255, 0, 0)


@pytest.mark.skipif(
    not _has("soundfile"), reason="soundfile not installed (optional extra)"
)
def test_audio_decode_real_when_soundfile_present():
    import io

    import numpy as np
    import soundfile

    buf = io.BytesIO()
    data = np.zeros((8, 1), dtype="float32")
    soundfile.write(buf, data, 8000, format="FLAC")
    arr, rate = MM.decode_audio(buf.getvalue())
    assert rate == 8000 and len(arr) == 8

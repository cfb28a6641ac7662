"""avi_numpy codec: real AVI/MJPEG round-trips (lossless on uniform
even-level frames, quantization-bounded on structured frames), chunk
grammar edges (JUNK, 'rec ' groups, idx1 skipped), F3 malformation
behavior, and the Spark-side video operators over real AVI bytes."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from oracle_vector_search_spark.functions.avi_numpy import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)

RNG = np.random.RandomState(7)


def _uniform_clip(levels, h=16, w=24):
    return np.stack(
        [np.full((h, w), v, dtype=np.uint8) for v in levels]
    )


def test_uniform_even_frames_roundtrip_lossless():
    # even (v-128): the DC quantizer (Q00=16) divides 8*(v-128) exactly
    clip = _uniform_clip([0, 64, 128, 200, 254])
    fps, back = decode_avi_mjpeg(encode_avi_mjpeg(clip, fps=25))
    assert fps == 25
    assert back.shape == clip.shape
    assert np.array_equal(back, clip)


def test_structured_frames_within_quantization_tolerance():
    clip = RNG.randint(0, 256, (4, 32, 32), dtype=np.uint8)
    _, back = decode_avi_mjpeg(encode_avi_mjpeg(clip))
    assert back.shape == clip.shape
    # Annex-K luma quantization: worst-case per-pixel error is bounded;
    # random noise is the adversarial case, so the bound is loose
    assert np.abs(back.astype(int) - clip.astype(int)).mean() < 24


def test_junk_chunk_and_idx1_walked():
    clip = _uniform_clip([10, 20])
    b = encode_avi_mjpeg(clip, junk_chunk=b"\xde\xad\xbe")  # odd size
    dec = decode_avi_mjpeg(b)
    assert dec is not None and np.array_equal(dec[1], clip)


def test_rec_grouped_movi_frames():
    """Interleaved AVIs group movi chunks under 'rec ' LISTs — the
    collector must recurse into them."""
    clip = _uniform_clip([30, 40])
    b = bytearray(encode_avi_mjpeg(clip))
    # wrap the whole movi payload in one rec LIST: find 'movi', rebuild
    i = bytes(b).find(b"movi")
    (movi_sz,) = struct.unpack("<I", b[i - 4 : i])
    payload = bytes(b[i + 4 : i + 4 + movi_sz - 4])
    rec = b"LIST" + struct.pack("<I", 4 + len(payload)) + b"rec " + payload
    new_movi_payload = b"movi" + rec
    new = (
        bytes(b[: i - 4])
        + struct.pack("<I", len(new_movi_payload))
        + new_movi_payload
        + bytes(b[i + 4 + movi_sz - 4 :])
    )
    # outer RIFF size changed
    delta = len(rec) - len(payload)
    (riff_sz,) = struct.unpack("<I", new[4:8])
    new = new[:4] + struct.pack("<I", riff_sz + delta) + new[8:]
    dec = decode_avi_mjpeg(new)
    assert dec is not None and np.array_equal(dec[1], clip)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:10],  # truncated header
        lambda b: b"RIFF" + b[4:8] + b"WAVE" + b[12:],  # not AVI
        lambda b: b[: len(b) // 2],  # truncated movi
        lambda b: b.replace(b"\xff\xd8", b"\xff\x00", 1),  # bad frame
        lambda b: b"",
    ],
)
def test_malformed_returns_none_never_raises(mutate):
    b = encode_avi_mjpeg(_uniform_clip([50, 60]))
    assert decode_avi_mjpeg(mutate(b)) is None


def test_video_frame_sample_over_real_avi(spark):
    """The 1→N frame-sampling operator on genuine AVI bytes: every
    2nd frame becomes a row with the right geometry and EXACT pixels
    (uniform even levels are lossless through MJPEG)."""
    from oracle_vector_search_spark.sources.media import (
        video_frame_sample,
    )

    levels = [0, 10, 20, 30, 40, 50]
    clip = _uniform_clip(levels, h=16, w=24)
    rows = [
        (1, bytearray(encode_avi_mjpeg(clip))),
        (2, bytearray(b"RIFFjunk")),  # F3
    ]
    df = spark.createDataFrame(rows, "id long, content binary")
    got = video_frame_sample(df, every_k=2).collect()
    assert {r["id"] for r in got} == {1}
    assert sorted(r["frame_idx"] for r in got) == [0, 2, 4]
    for r in got:
        assert (r["width"], r["height"]) == (24, 16)
        arr = np.frombuffer(bytes(r["frame"]), np.uint8)
        assert (arr == levels[r["frame_idx"]]).all()

"""wav_numpy codec vs the stdlib ``wave`` module — an INDEPENDENT
reference implementation shipped with CPython, so the cross-check needs
no pip installs: our encoder's bytes must read back bit-exactly through
``wave``, and ``wave``-written files must decode bit-exactly through
our decoder. Plus scope/F3 edges: stereo floor-mean downmix, 8-bit
promotion, unknown-chunk walking with odd-size padding, truncation,
and the Spark-side `audio_features` operator over real WAV bytes."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from oracle_vector_search_spark.functions.wav_numpy import (
    decode_wav,
    encode_wav_pcm,
    encode_wav_pcm16,
)

RNG = np.random.RandomState(42)


def _stdlib_write(samples: np.ndarray, sr: int, channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def test_roundtrip_our_encoder_stdlib_reader():
    x = RNG.randint(-32768, 32768, 1000).astype(np.int16)
    b = encode_wav_pcm16(x, 16000)
    with wave.open(io.BytesIO(b), "rb") as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getframerate() == 16000
        assert w.getnframes() == 1000
        back = np.frombuffer(w.readframes(1000), dtype="<i2")
    assert np.array_equal(back, x)


def test_roundtrip_stdlib_writer_our_reader():
    x = RNG.randint(-32768, 32768, 777).astype(np.int16)
    b = _stdlib_write(x, 8000)
    dec = decode_wav(b)
    assert dec is not None
    sr, back = dec
    assert sr == 8000
    assert np.array_equal(back, x)


def test_stereo_floor_mean_downmix():
    # include a negative odd-sum pair: floor(-3/2) = -2, NOT trunc -1
    lr = np.array([[100, 101], [-1, -2], [32767, 32767]], dtype=np.int16)
    b = _stdlib_write(lr.ravel(), 44100, channels=2)
    dec = decode_wav(b)
    assert dec is not None
    sr, mono = dec
    assert sr == 44100
    assert mono.tolist() == [100, -2, 32767]


def test_8bit_unsigned_promotion():
    u8 = np.array([0, 128, 255], dtype=np.uint8)
    b = encode_wav_pcm(u8, 22050, bits=8)
    dec = decode_wav(b)
    assert dec is not None
    sr, x = dec
    assert sr == 22050
    assert x.tolist() == [(0 - 128) * 256, 0, (255 - 128) * 256]


def test_unknown_chunks_walked_with_odd_padding():
    x = np.arange(-5, 5, dtype=np.int16)
    # odd-size JUNK chunk before data — walker must apply the pad byte
    b = encode_wav_pcm(x, 16000, junk_chunk=b"\xde\xad\xbe")
    dec = decode_wav(b)
    assert dec is not None
    assert dec[1].tolist() == x.tolist()


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:10],  # truncated header
        lambda b: b[:-3],  # truncated data chunk
        lambda b: b"RIFX" + b[4:],  # wrong magic
        lambda b: b.replace(b"WAVE", b"AVI ", 1),  # not WAVE
        lambda b: b.replace(  # float PCM (format 3): out of scope
            struct.pack("<H", 1), struct.pack("<H", 3), 1
        ),
        lambda b: b"",  # empty
    ],
)
def test_malformed_returns_none_never_raises(mutate):
    x = np.arange(100, dtype=np.int16)
    assert decode_wav(mutate(encode_wav_pcm16(x, 16000))) is None


def test_data_before_fmt_still_decodes():
    """Chunk order is not guaranteed by the spec — the walker must not
    assume fmt precedes data."""
    x = np.array([1, -1, 2, -2], dtype=np.int16)
    canonical = encode_wav_pcm16(x, 16000)
    fmt_chunk = canonical[12:36]
    data_chunk = canonical[36:]
    swapped = canonical[:12] + data_chunk + fmt_chunk
    dec = decode_wav(swapped)
    assert dec is not None
    assert dec[1].tolist() == x.tolist()


def test_audio_features_over_real_wav_bytes(spark):
    """The Spark operator path (sources/media.audio_features) on real
    WAV blobs: features must equal the same math over the raw samples,
    and a malformed blob must drop (F3), not raise."""
    from oracle_vector_search_spark.sources.media import audio_features

    clips = {}
    rows = []
    for i in range(4):
        n = 400 + 100 * i
        x = (
            np.round(
                3000.0 * np.sin(2 * np.pi * np.arange(n) * (i + 1) / 50.0)
            )
        ).astype(np.int16)
        clips[i] = x
        rows.append((i, bytearray(encode_wav_pcm16(x, 16000))))
    rows.append((99, bytearray(b"RIFFjunkWAVEnope")))  # F3
    df = spark.createDataFrame(rows, "id long, content binary")
    got = {r["id"]: r for r in audio_features(df).collect()}
    assert set(got) == {0, 1, 2, 3}  # 99 dropped
    for i, x in clips.items():
        xf = x.astype(np.float64)
        r = got[i]
        assert r["n_samples"] == len(x)
        assert r["sample_rate"] == 16000
        assert r["rms"] == pytest.approx(
            float(np.sqrt(np.mean(xf * xf))), abs=1e-6
        )
        assert r["peak"] == int(np.max(np.abs(xf)))

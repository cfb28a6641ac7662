"""Pure-numpy RIFF/WAVE PCM codec — real audio decode with no
dependencies (public knowledge only: the RIFF container layout and the
Microsoft/IBM WAVE PCM format, both published specifications; see also
the stdlib ``wave`` module, which tests use as an INDEPENDENT reference
implementation).

Audio analogue of ``functions/jpeg_numpy.py``: the container ships no
soundfile/librosa/ffmpeg, so without this module real audio bytes were
F3-dropped and only the FAKEAUD1 test container exercised the
``sources/media.py`` operators (reference parity note: the reference
repo is image-only — audio is part of this engine's training-data
pipeline surface, not a reference operator). With it, genuine WAV
files — the dominant raw-audio interchange format in speech corpora —
decode end-to-end on any executor.

Scope (documented, enforced): canonical RIFF/WAVE with a ``fmt `` chunk
of audio_format=1 (integer PCM) or 0xFFFE (WAVE_FORMAT_EXTENSIBLE
wrapping PCM), 8-bit unsigned or 16-bit little-endian signed samples,
any channel count (downmixed to mono by floor-mean), any sample rate.
Unknown chunks (LIST/INFO/cue/fact/...) are walked and skipped,
including the spec's odd-size pad byte. Everything else — float PCM,
24-bit, ADPCM, truncated files — returns ``None`` (F3: undecodable
rows drop, never raise).

Determinism: decode is pure byte arithmetic; downmix is integer floor
division — bit-identical across executors and replicated exactly by
the DuckDB formula oracle in ``audio_wav_feature_parity``.
"""

from __future__ import annotations

import struct

import numpy as np

_PCM = 1
_EXTENSIBLE = 0xFFFE


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """Serialize mono int16 samples as a canonical 44-byte-header WAV
    (RIFF + fmt + data). The test suite verifies stdlib ``wave`` reads
    these bytes back bit-exactly."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(data),
        b"WAVE",
        b"fmt ",
        16,  # fmt chunk size for plain PCM
        _PCM,
        1,  # channels
        sample_rate,
        sample_rate * 2,  # byte rate
        2,  # block align
        16,  # bits per sample
        b"data",
        len(data),
    )
    return hdr + data


def encode_wav_pcm(
    samples: np.ndarray,
    sample_rate: int,
    bits: int = 16,
    channels: int = 1,
    junk_chunk: bytes | None = None,
) -> bytes:
    """General test encoder: 8-bit unsigned or 16-bit LE PCM, 1..n
    channels (``samples`` shaped (n,) mono or (n, channels)), with an
    optional unknown chunk inserted before ``data`` to exercise the
    chunk walker (odd sizes get the spec's pad byte)."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    if channels != ch:
        raise ValueError("channels mismatch with samples shape")
    if bits == 16:
        data = arr.astype("<i2").tobytes()
    elif bits == 8:
        data = arr.astype(np.uint8).tobytes()
    else:
        raise ValueError("test encoder supports 8/16-bit only")
    block = channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH",
        _PCM,
        channels,
        sample_rate,
        sample_rate * block,
        block,
        bits,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if junk_chunk is not None:
        pad = b"\x00" if len(junk_chunk) % 2 else b""
        chunks += (
            b"JUNK" + struct.pack("<I", len(junk_chunk)) + junk_chunk + pad
        )
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(b: bytes | None):
    """RIFF/WAVE PCM → ``(sample_rate, mono int16 numpy array)`` or
    ``None`` on anything outside the documented scope (F3 — one bad
    blob must never kill an Arrow batch)."""
    if b is None or len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, end = 12, len(b)
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body_start = pos + 8
        if body_start + size > end:
            return None  # truncated chunk
        if cid == b"fmt ":
            if size < 16:
                return None
            fmt = struct.unpack("<HHIIHH", b[body_start : body_start + 16])
        elif cid == b"data":
            data = b[body_start : body_start + size]
        pos = body_start + size + (size & 1)  # odd chunks are padded
    if fmt is None or data is None:
        return None
    audio_format, channels, sample_rate, _brate, _balign, bits = fmt
    if audio_format == _EXTENSIBLE:
        # extensible header carries the real format in the extension;
        # valid-bits/channel-mask variations beyond PCM are out of scope
        audio_format = _PCM if bits in (8, 16) else 0
    if audio_format != _PCM or channels < 1 or sample_rate == 0:
        return None
    if bits == 16:
        usable = len(data) - (len(data) % (2 * channels))
        if usable == 0:
            return None
        x = np.frombuffer(data[:usable], dtype="<i2").astype(np.int64)
    elif bits == 8:
        usable = len(data) - (len(data) % channels)
        if usable == 0:
            return None
        # 8-bit WAV is unsigned; promote to int16 range: (u - 128) * 256
        x = (
            np.frombuffer(data[:usable], dtype=np.uint8).astype(np.int64)
            - 128
        ) * 256
    else:
        return None  # 24-bit / float PCM out of documented scope
    if channels > 1:
        # floor-mean downmix (matches the formula oracle exactly; the
        # soundfile tier's float mean differs by <1 LSB on ties)
        x = x.reshape(-1, channels).sum(axis=1) // channels
    return int(sample_rate), x.astype(np.int16)

"""Pure-numpy AVI/MJPEG video codec — real video decode with no
dependencies (public knowledge only: the Microsoft "AVI RIFF File
Reference" container layout and Motion-JPEG, whose frames are ordinary
ITU-T T.81 baseline JPEGs).

Closes the last multimodal stub: images got ``jpeg_numpy`` (r6), audio
got ``wav_numpy`` (r7) — this module composes the two moves for video.
AVI is a RIFF container (the same chunk grammar ``wav_numpy`` walks)
and each MJPEG frame chunk is a standalone baseline JPEG, so the
existing ``decode_baseline_jpeg`` is the per-frame decoder. MJPEG-in-
AVI is a genuine interchange format (lab cameras, OpenCV's default
fallback writer), not a toy.

Scope (documented, enforced): RIFF/'AVI ' with a 'movi' LIST whose
video chunks are ``NNdc``/``NNdb`` MJPEG frames — including frames
grouped under nested 'rec ' LISTs; every other chunk (hdrl headers,
idx1 index, JUNK padding) is walked and skipped with the spec's
odd-size pad byte. All frames must decode and share one geometry.
Anything else — missing movi, an undecodable frame, mixed frame sizes
— returns ``None`` (F3: undecodable rows drop, never raise).

Frames are returned as (n, h, w) uint8 grayscale (the channel-0 plane;
our MJPEG test encoder writes single-component JPEGs where all three
replicated channels are equal), matching the FAKEVID shape the
``sources/media.py`` operators consume.
"""

from __future__ import annotations

import struct

import numpy as np

from oracle_vector_search_spark.functions.jpeg_numpy import (
    decode_baseline_jpeg,
    encode_gray_jpeg,
)


def _chunk(cid: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return cid + struct.pack("<I", len(payload)) + payload + pad


def _list(ltype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", ltype + payload)


def encode_avi_mjpeg(
    frames: np.ndarray, fps: int = 25, junk_chunk: bytes | None = None
) -> bytes:
    """(n, h, w) uint8 grayscale frames → a canonical AVI/MJPEG file:
    hdrl (avih + one 'vids'/'MJPG' strl), movi with one ``00dc`` JPEG
    per frame, and a well-formed idx1 index. ``junk_chunk`` inserts an
    unknown chunk before movi to exercise the walker."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    jpegs = [encode_gray_jpeg(f) for f in frames]
    max_sz = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_sz * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_sz,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4h",
            0,  # dwFlags
            0,  # wPriority
            0,  # wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate
            0,  # dwStart
            n,  # dwLength
            max_sz,  # dwSuggestedBufferSize
            0,  # dwQuality
            0,  # dwSampleSize
            0, 0, w, h,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        w,
        h,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        w * h * 3,  # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_payload)
    idx_entries = []
    off = 4  # idx1 offsets are relative to the 'movi' fourcc
    for j in jpegs:
        idx_entries.append(
            b"00dc" + struct.pack("<III", 0x10, off, len(j))
        )
        off += 8 + len(j) + (len(j) & 1)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = hdrl
    if junk_chunk is not None:
        body += _chunk(b"JUNK", junk_chunk)
    body += movi + idx1
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


def _walk(b: bytes, pos: int, end: int):
    """Yield (chunk_id, body_start, size) walking RIFF chunks with the
    odd-size pad rule; stops (rather than raises) at truncation."""
    while pos + 8 <= end:
        cid = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = pos + 8
        if body + size > end:
            return
        yield cid, body, size
        pos = body + size + (size & 1)


def decode_avi_mjpeg(b: bytes | None):
    """AVI/MJPEG → (fps, frames (n, h, w) uint8) or ``None`` (F3)."""
    if (
        b is None
        or len(b) < 12
        or b[:4] != b"RIFF"
        or b[8:12] != b"AVI "
    ):
        return None
    fps = None
    jpegs: list[bytes] = []

    def collect_movi(start: int, end: int) -> None:
        for cid, body, size in _walk(b, start, end):
            if cid == b"LIST" and b[body : body + 4] == b"rec ":
                collect_movi(body + 4, body + size)
            elif (
                len(cid) == 4
                and cid[:2].isdigit()
                and cid[2:4] in (b"dc", b"db")
            ):
                jpegs.append(b[body : body + size])

    for cid, body, size in _walk(b, 12, len(b)):
        if cid != b"LIST":
            continue  # idx1 / JUNK / ... skipped
        ltype = b[body : body + 4]
        if ltype == b"movi":
            collect_movi(body + 4, body + size)
        elif ltype == b"hdrl":
            for c2, b2, s2 in _walk(b, body + 4, body + size):
                if c2 == b"avih" and s2 >= 4:
                    (uspf,) = struct.unpack("<I", b[b2 : b2 + 4])
                    if uspf:
                        fps = round(1_000_000 / uspf)
    if not jpegs:
        return None
    frames = []
    shape = None
    for j in jpegs:
        rgb = decode_baseline_jpeg(j)
        if rgb is None:
            return None  # one bad frame poisons the clip — F3 whole-row
        gray = rgb[:, :, 0]
        if shape is None:
            shape = gray.shape
        elif gray.shape != shape:
            return None  # mixed geometry out of scope
        frames.append(gray)
    return (fps or 0), np.stack(frames)

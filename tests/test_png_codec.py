"""PNG codec tests (functions/png_numpy.py): lossless round-trips over
every color type × every filter type, an INDEPENDENTLY hand-built PNG
(struct+zlib assembled in this file, never touching the encoder), the
palette path, and the full F3 malformation matrix — one bad byte
anywhere must yield None, never an exception."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from oracle_vector_search_spark.functions.png_numpy import (
    decode_png,
    encode_png,
)

RNG = np.random.RandomState(20240815)


@pytest.mark.parametrize("c", [1, 2, 3, 4])
@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4, "cycle"])
def test_roundtrip_lossless(c, ft):
    a = RNG.randint(0, 256, (13, 17, c)).astype(np.uint8)
    d = decode_png(encode_png(a, ft))
    assert d is not None and np.array_equal(d, a)


def test_gray_2d_input():
    a = RNG.randint(0, 256, (5, 9)).astype(np.uint8)
    d = decode_png(encode_png(a, "cycle"))
    assert np.array_equal(d, a[:, :, None])


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _hand_png(w, h, ctype, raws, extra=b"", plte=None):
    """Independent PNG assembly: raw scanlines (filter byte + data)
    given explicitly, zlib'd here — no encoder involvement."""
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    out = sig + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    out += extra
    return out + _chunk(b"IDAT", zlib.compress(raws)) + _chunk(b"IEND", b"")


def test_hand_built_png_decodes_exactly():
    # 3×2 RGB, row filters: None, Sub, Up — filters hand-applied here
    row0 = [10, 20, 30, 40, 50, 60, 70, 80, 90]
    row1 = [15, 25, 35, 55, 65, 75, 95, 105, 115]
    row2 = [100, 110, 120, 10, 20, 30, 200, 210, 220]
    f0 = bytes([0] + row0)
    # Sub: filt[x] = raw[x] - raw[x-3]
    f1 = bytes(
        [1]
        + [
            (row1[i] - (row1[i - 3] if i >= 3 else 0)) % 256
            for i in range(9)
        ]
    )
    # Up: filt[x] = raw[x] - prev[x]
    f2 = bytes([2] + [(row2[i] - row1[i]) % 256 for i in range(9)])
    d = decode_png(_hand_png(3, 3, 2, f0 + f1 + f2))
    expect = np.array(
        [row0, row1, row2], dtype=np.uint8
    ).reshape(3, 3, 3)
    assert d is not None and np.array_equal(d, expect)


def test_palette_expansion():
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    raws = bytes([0, 0, 1, 2]) + bytes([0, 2, 1, 0])  # 3×2 indices
    d = decode_png(_hand_png(3, 2, 3, raws, plte=pal))
    assert d is not None and d.shape == (2, 3, 3)
    assert tuple(d[0, 0]) == (255, 0, 0)
    assert tuple(d[1, 0]) == (0, 0, 255)
    assert tuple(d[0, 2]) == (0, 0, 255)


def test_ancillary_chunk_skipped_critical_rejected():
    a = RNG.randint(0, 256, (4, 4, 3)).astype(np.uint8)
    raws = b"".join(
        bytes([0]) + a[y].tobytes() for y in range(4)
    )
    # ancillary (lowercase first letter) chunk between IHDR and IDAT: ok
    ok = _hand_png(4, 4, 2, raws, extra=_chunk(b"tEXt", b"k\x00v"))
    assert np.array_equal(decode_png(ok), a)
    # unknown CRITICAL chunk: reject
    bad = _hand_png(4, 4, 2, raws, extra=_chunk(b"QRIT", b"x"))
    assert decode_png(bad) is None


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:-7],  # truncated
        lambda b: b"\x89PNG\r\n\x1a\njunk",  # no chunks
        lambda b: _flip(b, 41),  # corrupt IDAT body → CRC fails
        lambda b: _flip(b, 18),  # corrupt IHDR (dims/CRC)
        lambda b: b.replace(b"IEND", b"XEND"),  # missing IEND
    ],
)
def test_malformed_returns_none(mutate):
    a = RNG.randint(0, 256, (6, 5, 3)).astype(np.uint8)
    assert decode_png(mutate(encode_png(a))) is None


def _flip(b: bytes, i: int) -> bytes:
    m = bytearray(b)
    m[i] ^= 0xFF
    return bytes(m)


def test_interlace_and_depth_rejected():
    a = RNG.randint(0, 256, (4, 4, 3)).astype(np.uint8)
    raws = b"".join(bytes([0]) + a[y].tobytes() for y in range(4))
    sig = b"\x89PNG\r\n\x1a\n"
    for depth, inter in ((8, 1), (16, 0)):
        ihdr = struct.pack(">IIBBBBB", 4, 4, depth, 2, 0, 0, inter)
        blob = (
            sig
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raws))
            + _chunk(b"IEND", b"")
        )
        assert decode_png(blob) is None


def test_bad_filter_type_rejected():
    raws = bytes([7]) + bytes(12)  # filter type 7 is illegal
    assert decode_png(_hand_png(4, 1, 2, raws)) is None


def test_s2_dispatch_decodes_png_as_bgr():
    from oracle_vector_search_spark.sources.images import _decode_one

    a = np.zeros((2, 2, 3), dtype=np.uint8)
    a[..., 0] = 200  # R plane
    a[..., 2] = 50  # B plane
    d = _decode_one(encode_png(a))
    assert d is not None and d.shape == (2, 2, 3)
    assert d[0, 0, 0] == 50 and d[0, 0, 2] == 200  # BGR order
    # gray and RGBA normalize to 3-channel BGR
    g = RNG.randint(0, 256, (3, 3, 1)).astype(np.uint8)
    dg = _decode_one(encode_png(g))
    assert dg.shape == (3, 3, 3) and np.array_equal(dg[..., 0], g[..., 0])
    r4 = RNG.randint(0, 256, (3, 3, 4)).astype(np.uint8)
    d4 = _decode_one(encode_png(r4))
    assert d4.shape == (3, 3, 3)
    assert np.array_equal(d4, r4[:, :, :3][:, :, ::-1])

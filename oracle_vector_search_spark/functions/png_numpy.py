"""Pure numpy + stdlib-zlib PNG codec — the second dependency-free
image tier (the JPEG codec covers the reference's own crops; PNG is
the other format the S2 scan's F1 filter admits, previously dropped
as undecodable).

Scope: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), non-interlaced. Adam7 interlacing, 1/2/4/16
bit depths and unknown critical chunks are REJECTED explicitly
(``_BadPng`` → ``None`` through the permissive wrapper) — never
mis-decoded. Every chunk CRC is verified with ``zlib.crc32``.

Decoder design (scale notes):

* IDAT concatenation inflates once through stdlib ``zlib`` (C speed).
* Per-row unfiltering: Sub collapses to a per-byte-lane ``cumsum``
  (mod 256), Up to one vector add; Average and Paeth have a true
  intra-row recurrence (recon[x] depends on recon[x−bpp]) and run as
  a per-pixel-position loop over numpy lane vectors — bounded by
  image width, and the whole decode stays scan-stage Arrow work
  (pixels never shuffle).
* Permissive (F3 rule): any malformation returns ``None``.

The encoder writes any of the five filter types per row (the ENCODE
side of every filter is a direct vectorized difference — only decode
has the recurrence), which is what lets the round-trip tests drive
each decoder filter path explicitly.

Public knowledge only: W3C PNG specification (second edition) /
RFC 2083; DEFLATE via the stdlib zlib binding.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class _BadPng(ValueError):
    pass


# ------------------------------------------------------------ decode
def decode_png(data: bytes) -> np.ndarray | None:
    """PNG bytes → (H, W, C) uint8 RGB-ordered array (C = 1, 2, 3 or
    4 as stored; palette expands to 3). ``None`` on any malformation
    (F3 rule)."""
    try:
        return _decode_strict(data)
    except Exception:
        return None


def _decode_strict(data: bytes) -> np.ndarray:
    if data[:8] != _SIG:
        raise _BadPng("signature")
    pos = 8
    ihdr = None
    plte = None
    idat = []
    seen_iend = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise _BadPng("truncated chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise _BadPng("crc")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            seen_iend = True
            break
        elif ctype[0] & 0x20 == 0:  # unknown CRITICAL chunk
            raise _BadPng(f"critical chunk {ctype!r}")
        pos += 12 + length
    if ihdr is None or not idat or not seen_iend:
        raise _BadPng("missing chunks")
    w, h, depth, ctype_n, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8:
        raise _BadPng(f"bit depth {depth} unsupported")
    if ctype_n not in _CHANNELS:
        raise _BadPng(f"color type {ctype_n}")
    if comp != 0 or filt != 0:
        raise _BadPng("compression/filter method")
    if interlace != 0:
        raise _BadPng("Adam7 interlace unsupported")
    if w == 0 or h == 0 or w > 1 << 16 or h > 1 << 16:
        raise _BadPng("dimensions")
    c = _CHANNELS[ctype_n]
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise _BadPng("decompressed size")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes = rows[:, 0]
    if (ftypes > 4).any():
        raise _BadPng("filter type")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        out[y] = _unfilter_row(rows[y, 1:], prev, int(ftypes[y]), c)
        prev = out[y]
    px = out.reshape(h, w, c)
    if ctype_n == 3:
        if plte is None or len(plte) % 3 or len(plte) == 0:
            raise _BadPng("palette")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = px[:, :, 0]
        if int(idx.max()) >= pal.shape[0]:
            raise _BadPng("palette index")
        return pal[idx]
    return px


def _unfilter_row(
    f: np.ndarray, prev: np.ndarray, ftype: int, bpp: int
) -> np.ndarray:
    """One row of filtered bytes → reconstructed bytes (uint8 mod-256
    arithmetic, as the spec defines)."""
    if ftype == 0:  # None
        return f.copy()
    if ftype == 2:  # Up
        return f + prev  # uint8 wraps mod 256
    n = f.shape[0] // bpp
    lanes = f.reshape(n, bpp).astype(np.int64)
    if ftype == 1:  # Sub: recon = cumsum along x per byte lane
        return (
            np.cumsum(lanes, axis=0) % 256
        ).astype(np.uint8).reshape(-1)
    pl = prev.reshape(n, bpp).astype(np.int64)
    out = np.zeros_like(lanes)
    if ftype == 3:  # Average
        left = np.zeros(bpp, dtype=np.int64)
        for x in range(n):
            out[x] = (lanes[x] + (left + pl[x]) // 2) % 256
            left = out[x]
    else:  # 4 = Paeth
        left = np.zeros(bpp, dtype=np.int64)
        ul = np.zeros(bpp, dtype=np.int64)
        for x in range(n):
            a, b, cc = left, pl[x], ul
            p = a + b - cc
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - cc)
            pred = np.where(
                (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, cc)
            )
            out[x] = (lanes[x] + pred) % 256
            left = out[x]
            ul = pl[x]
    return out.astype(np.uint8).reshape(-1)


# ------------------------------------------------------------ encode
def encode_png(
    arr: np.ndarray, filter_type: int | str = 0
) -> bytes:
    """(H, W) or (H, W, C) uint8 → PNG bytes. ``filter_type`` is a
    single type 0-4 for every row, or ``"cycle"`` to use row % 5 —
    the round-trip tests use cycle so every decoder filter path runs.
    Encoding any filter is a direct vectorized difference (the
    recurrence exists only on the decode side)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = c
    flat = a.reshape(h, w * c).astype(np.int64)
    prev = np.zeros((h, w * c), dtype=np.int64)
    prev[1:] = flat[:-1]
    left = np.zeros((h, w * c), dtype=np.int64)
    left[:, bpp:] = flat[:, :-bpp]
    ulft = np.zeros((h, w * c), dtype=np.int64)
    ulft[1:, bpp:] = flat[:-1, :-bpp]
    p = left + prev - ulft
    pa, pb, pc = (
        np.abs(p - left),
        np.abs(p - prev),
        np.abs(p - ulft),
    )
    paeth = np.where(
        (pa <= pb) & (pa <= pc),
        left,
        np.where(pb <= pc, prev, ulft),
    )
    per_type = {
        0: flat,
        1: (flat - left) % 256,
        2: (flat - prev) % 256,
        3: (flat - (left + prev) // 2) % 256,
        4: (flat - paeth) % 256,
    }
    lines = []
    for y in range(h):
        ft = (y % 5) if filter_type == "cycle" else int(filter_type)
        lines.append(bytes([ft]))
        lines.append(per_type[ft][y].astype(np.uint8).tobytes())
    raw = b"".join(lines)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )

"""Pure numpy baseline-JPEG codec — the dependency-free pixel tier.

The container has no cv2/PIL, so the reference's real cropped JPEGs
(``cropped_images/*.jpg``, written by build_faiss_db.py:195-196 via
``cv2.imwrite``) could previously be verified only down to their SOF
header bytes. This module decodes them fully — baseline DCT (SOF0),
any sampling factors up to 2×2, stream-defined quant + Huffman tables —
so T1/T2/T6/T8 run on REAL reference pixels with zero optional deps.

Scope restriction: only the common SINGLE INTERLEAVED SCAN layout is
supported (one SOS covering every SOF component — what cv2/libjpeg
write by default). Legal-but-rare non-interleaved or multi-scan
baseline files are rejected explicitly with ``_BadJpeg`` (→ ``None``
through the permissive wrappers), never mis-decoded.

Decoder design (scale notes):

* One pass parses markers; the entropy-coded segment is byte-unstuffed
  with numpy, expanded to a bit array, and a 16-bit sliding-window
  lookup table turns every Huffman decode into two array indexes — the
  only per-symbol Python is integer arithmetic.
* Coefficient blocks accumulate into one (n_blocks, 64) array per
  component; dequantization and the 2-D IDCT are then TWO batched
  numpy matmuls over all blocks at once (BLAS), not per-block loops.
* Permissive (F3 rule): any malformation returns ``None`` — callers
  filter; one bad blob never kills an Arrow batch.

The encoder is a minimal baseline writer (4:4:4, Annex K tables) used
by the round-trip property tests: ``decode(encode(x)) ≈ x`` within
quantization tolerance proves the two independent transform
implementations (forward here, inverse in the decoder, plus the
stream-parsed-vs-constructed table paths) agree.

Public knowledge only: ITU-T T.81 (JPEG) baseline process, JFIF 1.02
YCbCr conversion, Annex K example tables.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag: index k of the scan order -> (row, col) in the 8x8 block
_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# IDCT basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16); pixels = A.T@C@A
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

_PEEK_W = (1 << np.arange(15, -1, -1)).astype(np.uint32)


class _BadJpeg(Exception):
    pass


def _build_huff_lut(counts: bytes, symbols: bytes):
    """(sym_lut, len_lut): 16-bit peek -> (symbol, code length)."""
    sym_lut = np.zeros(1 << 16, dtype=np.uint8)
    len_lut = np.zeros(1 << 16, dtype=np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            sym = symbols[k]
            k += 1
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            sym_lut[lo:hi] = sym
            len_lut[lo:hi] = length
            code += 1
        code <<= 1
    return sym_lut, len_lut


def _extend(v: int, t: int) -> int:
    # T.81 F.2.2.1: map t "additional bits" to a signed magnitude
    if t == 0:
        return 0
    if v < (1 << (t - 1)):
        return v - (1 << t) + 1
    return v


def _parse_segments(data: bytes):
    """Marker scan -> (qt, huff, sof, scan_comps, entropy_bytes)."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise _BadJpeg("no SOI")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}
    sof = None
    i = 2
    n = len(data)
    while i < n - 1:
        if data[i] != 0xFF:
            raise _BadJpeg("marker sync lost")
        m = data[i + 1]
        if m == 0xD9:  # EOI before SOS
            raise _BadJpeg("EOI before scan")
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            raise _BadJpeg("truncated segment")
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        seg = data[i + 4 : i + 2 + seg_len]
        if m == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                if pq != 0:
                    raise _BadJpeg("16-bit quant table")
                qt[tq] = np.frombuffer(
                    seg[j + 1 : j + 65], dtype=np.uint8
                ).astype(np.int32)
                j += 65
        elif m == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                counts = seg[j + 1 : j + 17]
                nsym = sum(counts)
                syms = seg[j + 17 : j + 17 + nsym]
                huff[(tc, th)] = _build_huff_lut(counts, syms)
                j += 17 + nsym
        elif m in (0xC0, 0xC1):  # SOF0/1 (both baseline-decodable)
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise _BadJpeg("non-8-bit precision")
            comps = []
            for c in range(nc):
                cid = seg[6 + c * 3]
                hv = seg[7 + c * 3]
                comps.append((cid, hv >> 4, hv & 15, seg[8 + c * 3]))
            sof = (h, w, comps)
        elif m in (0xC2, 0xC3) or (0xC5 <= m <= 0xCF and m != 0xC8):
            raise _BadJpeg("non-baseline SOF")
        elif m == 0xDD:
            raise _BadJpeg("restart intervals unsupported")
        elif m == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for c in range(ns):
                scan.append((seg[1 + c * 2], seg[2 + c * 2]))
            return qt, huff, sof, scan, data[i + 2 + seg_len :]
        i += 2 + seg_len
    raise _BadJpeg("no SOS")


def _bit_windows(entropy: bytes):
    """Unstuff FF00, stop at a marker, expand to 16-bit peek windows."""
    buf = np.frombuffer(entropy, dtype=np.uint8)
    ff = np.flatnonzero(buf == 0xFF)
    end = len(buf)
    drop = []
    for p in ff:
        if p + 1 >= len(buf):
            end = min(end, p)
            break
        nxt = buf[p + 1]
        if nxt == 0x00:
            drop.append(p + 1)  # stuffed zero
        elif nxt == 0xD9 or nxt != 0x00:
            end = min(end, p)  # any real marker ends the scan
            break
    keep = np.ones(end, dtype=bool)
    for d in drop:
        if d < end:
            keep[d] = False
    clean = buf[:end][keep]
    bits = np.unpackbits(clean)
    if len(bits) < 16:
        bits = np.concatenate([bits, np.zeros(16, dtype=np.uint8)])
    # sliding 16-bit windows -> uint32 peek values (pad tail with 1s:
    # T.81 pads with 1-bits)
    padded = np.concatenate([bits, np.ones(16, dtype=np.uint8)])
    win = np.lib.stride_tricks.sliding_window_view(padded, 16)
    return win.astype(np.uint32) @ _PEEK_W, len(bits)


def _decode_coefficients(qt, huff, sof, scan, entropy):
    """Entropy-decode every MCU -> per-component (n_blocks, 64) int32
    dequantized coefficient arrays + block grid geometry."""
    h, w, comps = sof
    if len(scan) != len(comps):
        # only a single interleaved scan covering every SOF component
        # is implemented; per-component (non-interleaved) or multi-scan
        # baseline files would mis-decode — refuse them explicitly
        # instead of failing deep in the MCU loop (ADVICE r6 low).
        raise _BadJpeg(
            f"non-interleaved/multi-scan jpeg unsupported: scan has "
            f"{len(scan)} of {len(comps)} SOF components"
        )
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    peek, nbits = _bit_windows(entropy)
    tabs = {}
    for (cid, td_ta) in scan:
        td, ta = td_ta >> 4, td_ta & 15
        if (0, td) not in huff or (1, ta) not in huff:
            raise _BadJpeg("missing huffman table")
        tabs[cid] = (huff[(0, td)], huff[(1, ta)])
    geom = {}
    coefs = {}
    for (cid, hi, vi, tq) in comps:
        bw = mcux * hi
        bh = mcuy * vi
        geom[cid] = (hi, vi, bw, bh, qt[tq])
        coefs[cid] = np.zeros((bh * bw, 64), dtype=np.int32)
    pos = 0
    pred = {cid: 0 for (cid, _, _, _) in comps}
    order = [(cid, hi, vi) for (cid, hi, vi, _) in comps]
    for my in range(mcuy):
        for mx in range(mcux):
            for (cid, hi, vi) in order:
                (dc_sym, dc_len), (ac_sym, ac_len) = tabs[cid]
                bw = geom[cid][2]
                block_base_y = my * vi
                block_base_x = mx * hi
                for by in range(vi):
                    for bx in range(hi):
                        if pos >= nbits:
                            raise _BadJpeg("bitstream exhausted")
                        blk = coefs[cid][
                            (block_base_y + by) * bw + block_base_x + bx
                        ]
                        # --- DC ---
                        p16 = peek[pos]
                        t = int(dc_sym[p16])
                        L = int(dc_len[p16])
                        if L == 0:
                            raise _BadJpeg("invalid DC code")
                        pos += L
                        if t:
                            v = int(peek[pos]) >> (16 - t)
                            pos += t
                            diff = _extend(v, t)
                        else:
                            diff = 0
                        pred[cid] += diff
                        blk[0] = pred[cid]
                        # --- AC ---
                        k = 1
                        while k < 64:
                            p16 = peek[pos]
                            rs = int(ac_sym[p16])
                            L = int(ac_len[p16])
                            if L == 0:
                                raise _BadJpeg("invalid AC code")
                            pos += L
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise _BadJpeg("AC index overflow")
                            v = int(peek[pos]) >> (16 - s)
                            pos += s
                            blk[k] = _extend(v, s)
                            k += 1
    return geom, coefs, (h, w, hmax, vmax)


def _idct_planes(geom, coefs):
    """Batched dequantize + IDCT + de-zigzag per component -> planes."""
    planes = {}
    for cid, (hi, vi, bw, bh, q) in geom.items():
        zz = coefs[cid] * q[None, :]  # dequantize in zigzag order
        blocks = np.zeros((zz.shape[0], 64), dtype=np.float64)
        blocks[:, _ZZ] = zz  # de-zigzag
        blocks = blocks.reshape(-1, 8, 8)
        # pixels = A.T @ C @ A, batched over all blocks (BLAS)
        px = np.einsum("ux,nuv,vy->nxy", _A, blocks, _A, optimize=True)
        px = px + 128.0
        plane = (
            px.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        planes[cid] = plane
    return planes


def decode_baseline_jpeg(data: bytes) -> "np.ndarray | None":
    """Decode a baseline JFIF JPEG to an (H, W, 3) uint8 RGB array
    (grayscale streams replicate to 3 channels). Returns ``None`` on
    any malformation — the F3 permissive-decode rule."""
    try:
        qt, huff, sof, scan, entropy = _parse_segments(data)
        if sof is None:
            raise _BadJpeg("no SOF before SOS")
        geom, coefs, (h, w, hmax, vmax) = _decode_coefficients(
            qt, huff, sof, scan, entropy
        )
        planes = _idct_planes(geom, coefs)
        comps = sof[2]
        full = []
        for (cid, hi, vi, _) in comps:
            p = planes[cid]
            if hi != hmax or vi != vmax:
                p = np.repeat(
                    np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1
                )
            full.append(p[:h, :w])
        if len(full) == 1:
            # round like the 3-component path below — truncating the
            # float plane loses 1 gray level whenever IDCT float error
            # lands a hair below the integer
            y = np.clip(np.round(full[0]), 0, 255)
            return np.dstack([y, y, y]).astype(np.uint8)
        if len(full) != 3:
            raise _BadJpeg(f"{len(full)}-component stream")
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.dstack([r, g, b])
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    except Exception:
        return None


def jpeg_decode_stats(
    data: bytes,
) -> "tuple[int, int, float, float] | None":
    """(height, width, idct_luma_mean, dc_luma_mean) in ONE decode
    pass — the full entropy decode + batched IDCT of the luma plane,
    without materializing RGB (no chroma upsample). Height/width are
    reported only after the bitstream decoded consistently with the
    declared MCU grid, so they are decoder-verified geometry, not just
    the SOF header echo. ``None`` on any malformation (F3)."""
    try:
        qt, huff, sof, scan, entropy = _parse_segments(data)
        if sof is None:
            raise _BadJpeg("no SOF")
        geom, coefs, (h, w, _, _) = _decode_coefficients(
            qt, huff, sof, scan, entropy
        )
        planes = _idct_planes(geom, coefs)
        luma_cid = sof[2][0][0]
        idct_mean = float(np.mean(np.clip(planes[luma_cid], 0.0, 255.0)))
        q0 = geom[luma_cid][4][0]
        dc = coefs[luma_cid][:, 0].astype(np.float64) * q0
        dc_mean = float(np.mean(dc) / 8.0 + 128.0)
        return h, w, idct_mean, dc_mean
    except Exception:
        return None


def jpeg_luma_means(data: bytes) -> "tuple[float, float] | None":
    """(idct_mean, dc_mean): mean of the full-IDCT padded luma plane
    vs the mean implied by DC coefficients alone (block average =
    DC·q/8 + 128 — no IDCT, no AC terms). The two paths share the
    entropy parse but nothing downstream, so their agreement (within
    clipping error) is the decoder's internal-consistency invariant
    used by the ``reference_crops_decode_parity`` oracle flags."""
    stats = jpeg_decode_stats(data)
    return None if stats is None else (stats[2], stats[3])


# --------------------------------------------------------------- encoder
# Annex K example tables (public: ITU-T T.81 §K.1, K.3)
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
_DC_COUNTS = bytes(
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
)
_DC_SYMS = bytes(range(12))
_AC_COUNTS = bytes(
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
)
_AC_SYMS = bytes(
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
        0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
        0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
        0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
        0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
        0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
        0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
        0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
        0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
        0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ]
)


def _huff_codes(counts: bytes, symbols: bytes) -> dict[int, tuple[int, int]]:
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nacc += length
        while self.nacc >= 8:
            byte = (self.acc >> (self.nacc - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nacc -= 8
            self.acc &= (1 << self.nacc) - 1

    def flush(self):
        if self.nacc:
            pad = 8 - self.nacc
            self.put((1 << pad) - 1, pad)


def encode_gray_jpeg(img: "np.ndarray") -> bytes:
    """Minimal baseline encoder: single-component (grayscale), Annex K
    luma tables, no subsampling. Test-only counterpart of the decoder
    — the independent forward transform for the round-trip property."""
    img = np.asarray(img, dtype=np.float64)
    if img.ndim == 3:
        img = img.mean(axis=2)
    h, w = img.shape
    bh, bw = -(-h // 8), -(-w // 8)
    pad = np.pad(img, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = (
        pad.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        - 128.0
    )
    # forward DCT: C = A @ f @ A.T  (_Q_LUMA is the natural-order
    # matrix; DQT payload and the scan are zigzag-ordered)
    C = np.einsum("ux,nxy,vy->nuv", _A, blocks, _A, optimize=True)
    qmat = _Q_LUMA.astype(np.float64).reshape(8, 8)
    quant = np.round(C / qmat[None, :, :]).astype(np.int32)
    zz = quant.reshape(-1, 64)[:, _ZZ]  # scan[k] = block.flat[_ZZ[k]]

    dc_codes = _huff_codes(_DC_COUNTS, _DC_SYMS)
    ac_codes = _huff_codes(_AC_COUNTS, _AC_SYMS)
    bwr = _BitWriter()
    pred = 0
    for blk in zz:
        diff = int(blk[0]) - pred
        pred = int(blk[0])
        t = abs(diff).bit_length()
        c, L = dc_codes[t]
        bwr.put(c, L)
        if t:
            v = diff if diff > 0 else diff + (1 << t) - 1
            bwr.put(v, t)
        run = 0
        last_nz = 0
        nz = np.flatnonzero(blk[1:])
        last_nz = (nz[-1] + 1) if len(nz) else 0
        for k in range(1, last_nz + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, L = ac_codes[0xF0]
                bwr.put(c, L)
                run -= 16
            s = abs(v).bit_length()
            c, L = ac_codes[(run << 4) | s]
            bwr.put(c, L)
            vv = v if v > 0 else v + (1 << s) - 1
            bwr.put(vv, s)
            run = 0
        if last_nz < 63:
            c, L = ac_codes[0x00]
            bwr.put(c, L)
    bwr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    out = bytearray(b"\xff\xd8")
    q_zz = bytes(int(_Q_LUMA[_ZZ[k]]) for k in range(64))
    out += seg(0xDB, bytes([0]) + q_zz)
    out += seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]),
    )
    out += seg(0xC4, bytes([0x00]) + _DC_COUNTS + _DC_SYMS)
    out += seg(0xC4, bytes([0x10]) + _AC_COUNTS + _AC_SYMS)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bwr.out
    out += b"\xff\xd9"
    return bytes(out)

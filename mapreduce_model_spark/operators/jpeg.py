"""Pure-Python baseline JPEG (SOF0) codec — no codec library.

The container has no PIL/libjpeg, but real multimodal corpora are
overwhelmingly JPEG, so the decode path cannot stay a stub (r9 verdict
next-round #5). This module implements the baseline sequential DCT
process from the public JPEG spec (ITU-T T.81 / ISO 10918-1) in
numpy-backed Python:

- ``decode_jpeg``: SOI/APPn/COM/DQT/DHT/SOF0/DRI/SOS/RSTn/EOI marker
  walk, canonical Huffman decoding with 0xFF00 unstuffing, per-component
  DC prediction, dequantize + de-zigzag, exact float64 IDCT (orthonormal
  basis matrix product), pixel replication chroma upsampling for any
  (Hi, Vi) ≤ (2, 2), and the JFIF YCbCr→RGB transform. Grayscale decodes
  to replicated 3-channel so every caller sees (H, W, 3) uint8 RGB like
  decode_bmp/decode_ppm. Progressive (SOF2), arithmetic coding, 12-bit
  precision and hierarchical modes raise NotImplementedError explicitly.
- ``encode_jpeg``: the matching encoder (grayscale, color 4:4:4 and
  4:2:0, optional restart intervals, caller-supplied quantization
  tables). It exists so the decoder is FALSIFIABLE without external
  fixtures: a round trip through our own entropy coder + a known pixel
  law is a hash-checkable oracle, and a quality=unity (all-ones qtable)
  round trip over FLAT 8×8 blocks is bit-EXACT — the DCT of a constant
  block is a single integer DC coefficient, so nothing is lost to
  quantization and the oracle can predict every decoded pixel in
  closed form (the BMP/PPM round-trip strategy, extended through a
  lossy codec by constructing inputs on which it is lossless).

Huffman tables are the spec's Annex K defaults (the tables every
camera/libjpeg baseline file ships); correctness of the ROUND TRIP does
not depend on them being the canonical values — encoder and decoder
share whatever DHT segments the file carries — but using the standard
tables keeps the emitted files readable by any external decoder.

Scale: codecs run inside Arrow-batched ``mapInPandas`` (see
operators/multimodal.py) — embarrassingly parallel, no driver collect,
binary columns pruned before any shuffle.
"""

from __future__ import annotations

import numpy as np

# ---- spec constants ------------------------------------------------------

# Annex K.3 default Huffman tables: (BITS counts for code lengths 1..16,
# HUFFVAL symbol list).
DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
assert sum(AC_LUMA[0]) == len(AC_LUMA[1]) == 162
assert sum(AC_CHROMA[0]) == len(AC_CHROMA[1]) == 162


def _zigzag() -> np.ndarray:
    """The spec's zigzag scan as a flat index permutation, GENERATED from
    the diagonal rule (even diagonals run bottom-left→top-right) instead
    of hand-typed — a typo'd table would silently corrupt both codec
    sides identically and hide from round-trip tests."""
    coords = sorted(
        ((i, j) for i in range(8) for j in range(8)),
        key=lambda p: (p[0] + p[1], p[0] if (p[0] + p[1]) % 2 else -p[0]),
    )
    return np.array([i * 8 + j for i, j in coords], dtype=np.int64)


ZIGZAG = _zigzag()  # zigzag position -> natural (row-major) index
assert ZIGZAG[:8].tolist() == [0, 1, 8, 16, 9, 2, 3, 10]  # spec figure 5

# Orthonormal 8-point DCT basis: A[u, x] = c(u)/2 · cos((2x+1)uπ/16),
# FDCT F = A f Aᵀ, IDCT f = Aᵀ F A — exact float64, no scaled-integer
# approximation (the classic AAN fast path trades exactness for speed;
# batch decode here is numpy matmul over all blocks at once anyway).
_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = _c / 2.0 * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _build_huffman(bits, vals):
    """Canonical code assignment (spec C.2): returns
    {symbol: (code, length)} for encoding and
    {(length, code): symbol} for decoding."""
    enc, dec = {}, {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            enc[sym] = (code, length)
            dec[(length, code)] = sym
            code += 1
            k += 1
        code <<= 1
    return enc, dec


# ---- encoder -------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def pad_align(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1-bits per spec


def _category(v: int) -> tuple[int, int]:
    """(SSSS magnitude category, raw bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    ssss = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << ssss) - 1
    return ssss, bits


def _encode_block(bw, coefs, dc_enc, ac_enc, pred):
    """Quantized coefficients (natural order, int) → entropy-coded bits.
    Returns the new DC predictor."""
    zz = coefs[ZIGZAG]
    diff = int(zz[0]) - pred
    ssss, bits = _category(diff)
    code, length = dc_enc[ssss]
    bw.write(code, length)
    if ssss:
        bw.write(bits, ssss)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_enc[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        ssss, bits = _category(v)
        code, length = ac_enc[(run << 4) | ssss]
        bw.write(code, length)
        bw.write(bits, ssss)
        run = 0
    if last_nz < 63:
        code, length = ac_enc[0x00]  # EOB
        bw.write(code, length)
    return int(zz[0])


def _fdct_quant(block: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    f = block.astype(np.float64) - 128.0
    coefs = _A @ f @ _A.T
    return np.round(coefs / qtable).astype(np.int64)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _dqt_seg(tid: int, qtable: np.ndarray) -> bytes:
    return _seg(0xDB, bytes([tid]) + bytes(int(q) for q in qtable.flatten()[ZIGZAG]))


def _dht_seg(tclass: int, tid: int, table) -> bytes:
    bits, vals = table
    return _seg(0xC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals))


def encode_jpeg(
    arr: np.ndarray,
    qtable: np.ndarray | int = 1,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline SOF0 writer. ``arr`` is (H, W) grayscale or (H, W, 3) RGB
    uint8. ``qtable`` is an 8×8 int array (applied to every component) or
    a scalar fill — the default all-ones table makes the pipeline
    lossless on inputs whose DCT coefficients are integers (flat 8×8
    blocks), the property the closed-form decode oracle builds on.
    ``subsampling``: '444' or '420' (color only). ``restart_interval``
    > 0 emits DRI + RSTn markers every that many MCUs."""
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    q = np.full((8, 8), int(qtable), np.int64) if np.isscalar(qtable) else np.asarray(qtable, np.int64)
    if np.any(q < 1) or np.any(q > 255):
        raise ValueError("qtable entries must be in 1..255 for 8-bit DQT")

    if gray:
        planes = [arr.astype(np.float64)]
        samps = [(1, 1)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
        if subsampling == "444":
            planes, samps = [y, cb, cr], [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "420":
            ph = (h + 1) // 2 * 2
            pw = (w + 1) // 2 * 2
            def _pad2(p):
                return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            cb2 = _pad2(cb).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr2 = _pad2(cr).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            planes, samps = [y, cb2, cr2], [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # pad every plane to its full MCU coverage (edge replication)
    padded = []
    for p, (hi, vi) in zip(planes, samps):
        th, tw = mcuy * vi * 8, mcux * hi * 8
        padded.append(
            np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        )

    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0 so external tools recognize the file
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _dqt_seg(0, q)
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        hi, vi = samps[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0])  # all comps share qtable 0
    out += _seg(0xC0, sof)
    dc_l, _ = _build_huffman(*DC_LUMA)
    ac_l, _ = _build_huffman(*AC_LUMA)
    dc_c, _ = _build_huffman(*DC_CHROMA)
    ac_c, _ = _build_huffman(*AC_CHROMA)
    out += _dht_seg(0, 0, DC_LUMA) + _dht_seg(1, 0, AC_LUMA)
    if not gray:
        out += _dht_seg(0, 1, DC_CHROMA) + _dht_seg(1, 1, AC_CHROMA)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    enc_tables = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (ncomp - 1)
    bw = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    nmcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and nmcu and nmcu % restart_interval == 0:
                bw.pad_align()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * ncomp
            for ci in range(ncomp):
                hi, vi = samps[ci]
                dc_enc, ac_enc = enc_tables[ci]
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        coefs = np.zeros(64, np.int64)
                        coefs[:] = _fdct_quant(block, q).flatten()
                        preds[ci] = _encode_block(
                            bw, coefs, dc_enc, ac_enc, preds[ci]
                        )
            nmcu += 1
    bw.pad_align()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---- decoder -------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; stops at any real marker (RSTn handled by the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerReached(0xFF00 | nxt)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_past_rst(self) -> None:
        """Discard partial bits and consume one RSTn marker."""
        self.acc = 0
        self.nbits = 0
        if self.data[self.pos] != 0xFF or not (
            0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected RST marker at restart interval")
        self.pos += 2


class _MarkerReached(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, ssss: int) -> int:
    if ssss == 0:
        return 0
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


def _huff_decode(br: _BitReader, dec) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = dec.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential (SOF0) JPEG → (H, W, 3) uint8 RGB. See module
    docstring for supported surface; everything outside it raises
    NotImplementedError (progressive/arithmetic/12-bit/hierarchical) or
    ValueError (malformed stream) rather than mis-decoding."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    dc_dec: dict[int, dict] = {}
    ac_dec: dict[int, dict] = {}
    comps = None  # list of (comp_id, hi, vi, tq)
    h = w = 0
    restart_interval = 0
    pos = 2
    scan_map = {}  # comp index -> (dc table id, ac table id)

    while True:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("reached EOI before any SOS scan")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        ln = int.from_bytes(payload[pos : pos + 2], "big")
        body = payload[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(body[p : p + 64], np.uint8).astype(np.int64)
                    p += 64
                else:
                    tbl = np.frombuffer(
                        body[p : p + 128], ">u2"
                    ).astype(np.int64)
                    p += 128
                nat = np.zeros(64, np.int64)
                nat[ZIGZAG] = tbl
                qtables[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(body[p + 17 : p + 17 + nv])
                p += 17 + nv
                _, dec = _build_huffman(bits, vals)
                (dc_dec if tc == 0 else ac_dec)[th] = dec
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/SOF1 (both baseline-decodable)
            if body[0] != 8:
                raise NotImplementedError("only 8-bit precision supported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for ci in range(nc):
                cid = body[6 + 3 * ci]
                hv = body[7 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0x0F, body[8 + 3 * ci]))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"SOF{marker - 0xC0}: only baseline sequential (SOF0/SOF1) "
                "is supported — progressive/arithmetic/hierarchical JPEGs "
                "need libjpeg (PIL) in production"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for si in range(ns):
                cs = body[1 + 2 * si]
                td_ta = body[2 + 2 * si]
                idx = next(i for i, c in enumerate(comps) if c[0] == cs)
                scan_map[idx] = (td_ta >> 4, td_ta & 0x0F)
            pos += ln
            break
        pos += ln

    if comps is None:
        raise ValueError("no SOF frame header before SOS")
    if len(scan_map) < len(comps):
        # Valid SOF0 files may split components across several SOS scans
        # (non-interleaved); this decoder handles only the single
        # interleaved scan that covers every frame component — reject the
        # rest explicitly rather than KeyError mid-decode.
        raise NotImplementedError(
            "non-interleaved JPEG (SOS covers fewer components than the "
            "frame declares): only a single interleaved baseline scan is "
            "supported — use libjpeg (PIL) in production"
        )
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    plane_blocks = [
        np.zeros((mcuy * vi, mcux * hi, 8, 8), np.float64)
        for (_, hi, vi, _) in comps
    ]

    try:
        br = _BitReader(payload, pos)
        preds = [0] * len(comps)
        nmcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and nmcu and nmcu % restart_interval == 0:
                    br.align_past_rst()
                    preds = [0] * len(comps)
                for ci, (_, hi, vi, tq) in enumerate(comps):
                    td, ta = scan_map[ci]
                    q = qtables[tq]
                    for by in range(vi):
                        for bx in range(hi):
                            zz = np.zeros(64, np.int64)
                            ssss = _huff_decode(br, dc_dec[td])
                            diff = _extend(br.read_bits(ssss), ssss)
                            preds[ci] += diff
                            zz[0] = preds[ci]
                            k = 1
                            while k < 64:
                                rs = _huff_decode(br, ac_dec[ta])
                                r, s = rs >> 4, rs & 0x0F
                                if s == 0:
                                    if r == 15:
                                        k += 16  # ZRL
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    raise ValueError("AC run past block end")
                                zz[k] = _extend(br.read_bits(s), s)
                                k += 1
                            nat = np.zeros(64, np.int64)
                            nat[ZIGZAG] = zz
                            coefs = nat.reshape(8, 8) * q
                            plane_blocks[ci][my * vi + by, mx * hi + bx] = (
                                _A.T @ coefs @ _A
                            )
                nmcu += 1
    except (_MarkerReached, IndexError) as exc:
        # A marker or end-of-buffer inside the entropy-coded segment means
        # the scan is shorter than the frame promises: surface the
        # documented ValueError, not the internal control-flow exception.
        raise ValueError(
            "truncated or corrupt entropy-coded segment"
        ) from exc

    planes = []
    for ci, (_, hi, vi, _) in enumerate(comps):
        pb = plane_blocks[ci]
        nby, nbx = pb.shape[:2]
        plane = pb.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8) + 128.0
        # pixel-replication upsample to full MCU resolution, then crop
        plane = np.repeat(np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)

"""Pure-Python PNG codec — RFC 1951 inflate + RFC 2083 container/filters.

Same role as :mod:`operators.jpeg`: a dependency-free correctness face for
the multimodal decode path (reference main.cc has no image surface; the
LLM-pipeline brief's multimodal decode slot does). The decoder implements
the public specs end-to-end — a full DEFLATE inflater (stored, fixed- and
dynamic-Huffman blocks, LZ77 length/distance copies with overlap), the
zlib wrapper with adler32 verification, PNG chunk walk with CRC-32 check,
and all five scanline filters (None/Sub/Up/Average/Paeth) — for 8-bit
greyscale / truecolor / indexed / alpha images. The encoder emits valid
PNGs through our OWN deflate emitter (stored, fixed, or dynamic literal
blocks selected per call), which is what makes the codec falsifiable
without any external library: tests round-trip all three block types
through the inflater AND cross-check the inflater against CPython's
stdlib ``zlib.compress`` output at every level (level 1/6/9 produce real
LZ77 matches and dynamic trees our emitter never writes).

Supported decode surface (everything else raises explicitly, the
jpeg.py contract): bit depth 8; color types 0 (grey), 2 (RGB), 3
(indexed + PLTE), 4 (grey+alpha), 6 (RGBA); interlace 0. Adam7,
16-bit, and sub-byte depths raise NotImplementedError; malformed
streams raise ValueError. In production the same decode_image slot runs
PIL/libpng behind an identical contract.

Scale note: the codec runs inside Arrow-batched mapInPandas over a
binary column (operators/multimodal.py) — per-row pure-Python work,
no driver involvement, no shuffle of the payload bytes.
"""

from __future__ import annotations

import numpy as np

# ---- checksums (own implementations; verified against stdlib in tests) ---

_CRC_TABLE = None


def _crc32(data: bytes, crc: int = 0) -> int:
    """Table-driven CRC-32 (ISO 3309, the PNG chunk checksum)."""
    global _CRC_TABLE
    if _CRC_TABLE is None:
        tbl = np.empty(256, np.uint32)
        for n in range(256):
            c = n
            for _ in range(8):
                c = (0xEDB88320 ^ (c >> 1)) if (c & 1) else (c >> 1)
            tbl[n] = c
        _CRC_TABLE = tbl
    c = np.uint32(crc ^ 0xFFFFFFFF)
    tbl = _CRC_TABLE
    for b in data:
        c = tbl[(int(c) ^ b) & 0xFF] ^ (c >> np.uint32(8))
    return int(c) ^ 0xFFFFFFFF


def _adler32(data: bytes) -> int:
    """Adler-32 (RFC 1950 §8) via numpy block sums: s1 = 1 + Σb,
    s2 = Σ s1-prefixes, both mod 65521 — vectorized with cumsum over
    5552-byte blocks (the largest run that cannot overflow 32 bits is
    much larger in int64, so one mod per block suffices)."""
    MOD = 65521
    s1, s2 = 1, 0
    arr = np.frombuffer(data, np.uint8)
    for i in range(0, len(arr), 5552):
        blk = arr[i : i + 5552].astype(np.int64)
        c = np.cumsum(blk)
        s2 = (s2 + len(blk) * s1 + int(c.sum())) % MOD
        s1 = (s1 + int(c[-1]) if len(blk) else s1) % MOD
    return (s2 << 16) | s1


# ---- RFC 1951 inflate ----------------------------------------------------

# length codes 257..285: (extra bits, base length)
_LEN_BASE = [
    3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31,
    35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258,
]
_LEN_EXTRA = [
    0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2,
    3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0,
]
# distance codes 0..29
_DIST_BASE = [
    1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193,
    257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193,
    12289, 16385, 24577,
]
_DIST_EXTRA = [
    0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6,
    7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13,
]
# order in which code-length-code lengths are stored (RFC 1951 §3.2.7)
_CLC_ORDER = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15]


class _LsbReader:
    """LSB-first bit reader (DEFLATE bit order). Huffman codes are
    accumulated bit-by-bit MSB-first per the spec's packing rule."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("deflate stream truncated")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        b = self.acc & 1
        self.acc >>= 1
        self.nbits -= 1
        return b

    def bits(self, n: int) -> int:
        """n-bit integer, LSB-first (extra bits, header fields)."""
        v = 0
        for i in range(n):
            v |= self.bit() << i
        return v

    def align(self) -> None:
        self.acc = 0
        self.nbits = 0


def _canonical_decoder(lengths: list[int]) -> dict:
    """{(nbits, code): symbol} for a canonical Huffman code (RFC 1951
    §3.2.2 algorithm). Over-subscribed or empty codes raise ValueError."""
    max_len = max(lengths, default=0)
    if max_len == 0:
        return {}
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for b in range(1, max_len + 1):
        code = (code + bl_count[b - 1]) << 1
        next_code[b] = code
    if any(next_code[b] > (1 << b) for b in range(1, max_len + 1)):
        raise ValueError("over-subscribed Huffman code")
    dec = {}
    for sym, ln in enumerate(lengths):
        if ln:
            dec[(ln, next_code[ln])] = sym
            next_code[ln] += 1
    return dec


def _huff(br: _LsbReader, dec: dict) -> int:
    code, n = 0, 0
    while True:
        code = (code << 1) | br.bit()
        n += 1
        sym = dec.get((n, code))
        if sym is not None:
            return sym
        if n > 15:
            raise ValueError("invalid Huffman code in deflate stream")


_FIXED_LIT = _canonical_decoder(
    [8] * 144 + [9] * 112 + [7] * 24 + [8] * 8
)
_FIXED_DIST = _canonical_decoder([5] * 30)


def inflate(data: bytes) -> bytes:
    """Raw DEFLATE (RFC 1951) decompression: stored, fixed-Huffman and
    dynamic-Huffman blocks, LZ77 copies with overlapping distances."""
    br = _LsbReader(data)
    out = bytearray()
    while True:
        bfinal = br.bit()
        btype = br.bits(2)
        if btype == 0:  # stored
            br.align()
            p = br.pos
            if p + 4 > len(data):
                raise ValueError("deflate stream truncated")
            ln = int.from_bytes(data[p : p + 2], "little")
            nln = int.from_bytes(data[p + 2 : p + 4], "little")
            if ln ^ nln != 0xFFFF:
                raise ValueError("stored block LEN/NLEN mismatch")
            if p + 4 + ln > len(data):
                raise ValueError("deflate stream truncated")
            out += data[p + 4 : p + 4 + ln]
            br.pos = p + 4 + ln
        elif btype in (1, 2):
            if btype == 1:
                lit_dec, dist_dec = _FIXED_LIT, _FIXED_DIST
            else:
                hlit = br.bits(5) + 257
                hdist = br.bits(5) + 1
                hclen = br.bits(4) + 4
                cl_lengths = [0] * 19
                for i in range(hclen):
                    cl_lengths[_CLC_ORDER[i]] = br.bits(3)
                cl_dec = _canonical_decoder(cl_lengths)
                lengths: list[int] = []
                while len(lengths) < hlit + hdist:
                    sym = _huff(br, cl_dec)
                    if sym < 16:
                        lengths.append(sym)
                    elif sym == 16:
                        if not lengths:
                            raise ValueError("repeat code with no previous length")
                        lengths += [lengths[-1]] * (3 + br.bits(2))
                    elif sym == 17:
                        lengths += [0] * (3 + br.bits(3))
                    else:  # 18
                        lengths += [0] * (11 + br.bits(7))
                if len(lengths) != hlit + hdist:
                    raise ValueError("code length run overflows alphabet")
                lit_dec = _canonical_decoder(lengths[:hlit])
                dist_dec = _canonical_decoder(lengths[hlit:])
            while True:
                sym = _huff(br, lit_dec)
                if sym < 256:
                    out.append(sym)
                elif sym == 256:
                    break
                else:
                    if sym > 285:
                        raise ValueError(f"invalid length code {sym}")
                    ln = _LEN_BASE[sym - 257] + br.bits(_LEN_EXTRA[sym - 257])
                    dsym = _huff(br, dist_dec)
                    if dsym > 29:
                        raise ValueError(f"invalid distance code {dsym}")
                    dist = _DIST_BASE[dsym] + br.bits(_DIST_EXTRA[dsym])
                    if dist > len(out):
                        raise ValueError("distance past start of output")
                    # overlapping copy: byte-at-a-time semantics
                    start = len(out) - dist
                    for i in range(ln):
                        out.append(out[start + i])
        else:
            raise ValueError("reserved deflate block type 3")
        if bfinal:
            return bytes(out)


def zlib_decompress(data: bytes) -> bytes:
    """RFC 1950 wrapper around :func:`inflate` with adler32 verification."""
    if len(data) < 6:
        raise ValueError("zlib stream too short")
    cmf, flg = data[0], data[1]
    if cmf & 0x0F != 8:
        raise ValueError("zlib CM != 8 (deflate)")
    if (cmf * 256 + flg) % 31 != 0:
        raise ValueError("zlib header check failed")
    if flg & 0x20:
        raise NotImplementedError("preset dictionary (FDICT) not supported")
    raw = inflate(data[2:-4])
    if _adler32(raw) != int.from_bytes(data[-4:], "big"):
        raise ValueError("zlib adler32 mismatch")
    return raw


# ---- deflate emitter (for encode_png; all three block types) -------------


class _LsbWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def bits(self, v: int, n: int) -> None:
        """n bits of v, LSB-first."""
        self.acc |= v << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def code(self, v: int, n: int) -> None:
        """A Huffman code: written MSB-first (RFC 1951 packing rule)."""
        r = 0
        for i in range(n):
            r |= ((v >> i) & 1) << (n - 1 - i)
        self.bits(r, n)

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _huffman_lengths(freqs: dict[int, int], max_bits: int = 15) -> dict[int, int]:
    """Code lengths from symbol frequencies (plain Huffman merge). Depth
    is asserted ≤ max_bits — true for every distribution this module
    emits (literal bytes of small images); a production emitter would
    length-limit with package-merge instead."""
    import heapq

    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    heap = [(f, i, {s: 0}) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    tick = len(heap)
    while len(heap) > 1:
        f1, _, m1 = heapq.heappop(heap)
        f2, _, m2 = heapq.heappop(heap)
        merged = {s: d + 1 for s, d in m1.items()}
        merged.update({s: d + 1 for s, d in m2.items()})
        heapq.heappush(heap, (f1 + f2, tick, merged))
        tick += 1
    lengths = heap[0][2]
    if max(lengths.values()) > max_bits:
        raise ValueError("huffman depth exceeds deflate limit on this input")
    return lengths


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """{symbol: (code, nbits)} canonical assignment (same algorithm the
    decoder inverts)."""
    max_len = max(lengths.values())
    bl_count = [0] * (max_len + 1)
    for ln in lengths.values():
        bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for b in range(1, max_len + 1):
        code = (code + bl_count[b - 1]) << 1
        next_code[b] = code
    out = {}
    for sym in sorted(lengths):
        ln = lengths[sym]
        out[sym] = (next_code[ln], ln)
        next_code[ln] += 1
    return out


def deflate(data: bytes, block: str = "stored") -> bytes:
    """Raw DEFLATE emitter, literal-only (no LZ77 matches — the DECODER
    handles matches; stdlib zlib supplies match-bearing streams in tests).

    block: 'stored' | 'fixed' | 'dynamic' — which block type to emit, so
    tests can drive each inflate path through a stream we built."""
    if block == "stored":
        out = bytearray()
        n = len(data)
        i = 0
        while True:
            chunk = data[i : i + 0xFFFF]
            last = 1 if i + len(chunk) >= n else 0
            out.append(last)  # BFINAL + BTYPE=00 (aligned: rest of byte pad)
            out += len(chunk).to_bytes(2, "little")
            out += (len(chunk) ^ 0xFFFF).to_bytes(2, "little")
            out += chunk
            i += len(chunk)
            if last:
                return bytes(out)
    bw = _LsbWriter()
    if block == "fixed":
        bw.bits(1, 1)  # BFINAL
        bw.bits(1, 2)  # BTYPE=01
        for b in data:
            if b < 144:
                bw.code(0x30 + b, 8)
            else:
                bw.code(0x190 + b - 144, 9)
        bw.code(0, 7)  # EOB (symbol 256)
        return bw.flush()
    if block != "dynamic":
        raise ValueError(f"unknown block type {block!r}")
    freqs: dict[int, int] = {256: 1}
    for b in data:
        freqs[b] = freqs.get(b, 0) + 1
    lit_lengths = _huffman_lengths(freqs)
    lit_codes = _canonical_codes(lit_lengths)
    hlit = max(lit_lengths) + 1
    # one distance code of zero bits (no matches emitted)
    lens = [lit_lengths.get(s, 0) for s in range(hlit)] + [0]
    cl_freqs: dict[int, int] = {}
    for ln in lens:
        cl_freqs[ln] = cl_freqs.get(ln, 0) + 1
    cl_lengths = _huffman_lengths(cl_freqs, max_bits=7)
    cl_codes = _canonical_codes(cl_lengths)
    hclen_syms = [cl_lengths.get(s, 0) for s in _CLC_ORDER]
    while len(hclen_syms) > 4 and hclen_syms[-1] == 0:
        hclen_syms.pop()
    bw.bits(1, 1)  # BFINAL
    bw.bits(2, 2)  # BTYPE=10
    bw.bits(hlit - 257, 5)
    bw.bits(0, 5)  # HDIST = 1
    bw.bits(len(hclen_syms) - 4, 4)
    for ln in hclen_syms:
        bw.bits(ln, 3)
    for ln in lens:  # no 16/17/18 run codes: each length spelled out
        c, n = cl_codes[ln]
        bw.code(c, n)
    for b in data:
        c, n = lit_codes[b]
        bw.code(c, n)
    c, n = lit_codes[256]
    bw.code(c, n)
    return bw.flush()


def zlib_compress(data: bytes, block: str = "stored") -> bytes:
    """RFC 1950 wrapper around :func:`deflate` (CM=8, 32K window, check
    bits making (CMF·256+FLG) % 31 == 0)."""
    cmf = 0x78
    flg = 31 - (cmf * 256) % 31
    return (
        bytes([cmf, flg])
        + deflate(data, block=block)
        + _adler32(data).to_bytes(4, "big")
    )


# ---- PNG container -------------------------------------------------------

_SIG = b"\x89PNG\r\n\x1a\n"
# samples per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        len(body).to_bytes(4, "big")
        + tag
        + body
        + _crc32(tag + body).to_bytes(4, "big")
    )


def _unfilter(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    """Reverse the five scanline filters (RFC 2083 §6). Returns
    (h, w*ch) uint8. Arithmetic is mod-256 on ints; Average uses the
    floor of the true mean; Paeth picks the neighbor minimizing the
    predictor distance with the spec's a→b→c tie order."""
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((h, stride), np.int32)
    row_in = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    for y in range(h):
        ftype = row_in[y, 0]
        cur = row_in[y, 1:].astype(np.int32)
        prev = out[y - 1] if y else np.zeros(stride, np.int32)
        if ftype == 0:
            out[y] = cur
        elif ftype == 2:  # Up — vectorized, no serial dependency
            out[y] = (cur + prev) & 0xFF
        else:
            rec = out[y]
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if ftype == 1:  # Sub
                    pred = a
                elif ftype == 3:  # Average
                    pred = (a + b) >> 1
                elif ftype == 4:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                else:
                    raise ValueError(f"unknown PNG filter type {ftype}")
                rec[x] = (cur[x] + pred) & 0xFF
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG to (H, W, 3) uint8 RGB (grey replicated, alpha
    dropped, palette resolved — the decode_image contract). Supported:
    bit depth 8, color types 0/2/3/4/6, interlace 0; everything else
    raises explicitly (module docstring)."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG payload (missing signature)")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated PNG chunk header")
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        if len(body) != ln or pos + 12 + ln > len(payload):
            raise ValueError("truncated PNG chunk")
        crc = int.from_bytes(payload[pos + 8 + ln : pos + 12 + ln], "big")
        if _crc32(tag + body) != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        pos += 12 + ln
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"PLTE":
            plte = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        # ancillary chunks (tEXt, gAMA, ...) are skipped
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, comp, filt, interlace = ihdr[8:13]
    if comp != 0 or filt != 0:
        raise ValueError("PNG: unknown compression/filter method")
    if interlace == 1:
        raise NotImplementedError("Adam7 interlaced PNG not supported")
    if depth != 8:
        raise NotImplementedError(f"only 8-bit PNG supported (depth={depth})")
    if ctype not in _CHANNELS:
        raise ValueError(f"invalid PNG color type {ctype}")
    ch = _CHANNELS[ctype]
    px = _unfilter(zlib_decompress(bytes(idat)), h, w, ch).reshape(h, w, ch)
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 2:
        return px
    if ctype == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("indexed PNG missing/invalid PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        if px.max() >= len(pal):
            raise ValueError("palette index out of range")
        return pal[px[:, :, 0]]
    if ctype == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # 6: RGBA → drop alpha


def encode_png(
    arr: np.ndarray, block: str = "fixed", filters: str = "cycle"
) -> bytes:
    """Encode (H, W) grey or (H, W, 3) RGB uint8 to PNG through our own
    deflate emitter. filters: 'none' (all rows filter 0) or 'cycle'
    (rows cycle None→Sub→Up→Average→Paeth so every reconstruction path
    is exercised on round trip). Lossless by construction — the decoder
    must return the input exactly."""
    arr = np.asarray(arr, np.uint8)
    grey = arr.ndim == 2
    h, w = arr.shape[:2]
    ch = 1 if grey else arr.shape[2]
    if not grey and ch != 3:
        raise ValueError("encode_png takes (H,W) grey or (H,W,3) RGB")
    ctype = 0 if grey else 2
    px = arr.reshape(h, w * ch).astype(np.int32)
    raw = bytearray()
    for y in range(h):
        ftype = 0 if filters == "none" else (y % 5)
        cur = px[y]
        prev = px[y - 1] if y else np.zeros(w * ch, np.int32)
        a = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
        c = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
        if ftype == 0:
            line = cur
        elif ftype == 1:
            line = cur - a
        elif ftype == 2:
            line = cur - prev
        elif ftype == 3:
            line = cur - ((a + prev) >> 1)
        else:
            p = a + prev - c
            pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where(
                (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, prev, c)
            )
            line = cur - pred
        raw.append(ftype)
        raw += (line & 0xFF).astype(np.uint8).tobytes()
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, ctype, 0, 0, 0])
    )
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib_compress(bytes(raw), block=block))
        + _chunk(b"IEND", b"")
    )

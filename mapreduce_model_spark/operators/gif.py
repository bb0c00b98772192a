"""Pure-Python GIF codec — GIF87a/89a container + full LZW.

Completes the image-decode matrix begun by :mod:`operators.jpeg` (DCT
entropy coding) and :mod:`operators.png` (DEFLATE): GIF's variable-width
LZW is the third and last compression family in the classic formats, and
with it the decode_image dispatch has no stub left. Implemented from the
public GIF89a specification: logical screen descriptor, global/local
color tables, extension-block skipping, sub-block reassembly, and a
variable-width LZW decoder with dictionary growth to 4096, CLEAR/EOI
handling, deferred-clear tolerance and the KwKwK self-referential case.
Interlaced images are supported (the four-pass row order). Multi-frame
(animated) files decode their FIRST image descriptor — the decode_image
contract is one still frame.

The encoder writes GIF89a with a REAL LZW compressor (greedy longest-
match, dictionary reset at 4096), which makes the codec falsifiable with
no external library: round-tripping adversarial inputs (runs like
``aaaa…`` force the KwKwK case) proves both sides against each other,
and hand-computed spec vectors pin the bit packing in tests.

Scale note: like jpeg/png, this runs inside Arrow-batched mapInPandas
over a binary column; per-row pure-Python work, no shuffle of payloads.
"""

from __future__ import annotations

import numpy as np

# ---- LZW (GIF variant: variable width, LSB-first bit packing) ------------


def lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """Decode a GIF LZW stream (already reassembled from sub-blocks) into
    palette indices. Implements the spec state machine: initial width =
    min_code_size+1, CLEAR resets the dictionary, EOI terminates, width
    grows when the dictionary fills 2^width (capped at 12 bits), and a
    code equal to the next free slot is the KwKwK case (prev + prev[0])."""
    clear = 1 << min_code_size
    eoi = clear + 1
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    dict_: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: int | None = None
    out = bytearray()
    while True:
        while nbits < width:
            if pos >= len(data):
                # Some writers omit EOI; spec says the trailer ends the
                # stream — treat exhaustion after at least one code as end.
                return bytes(out)
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            dict_ = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(dict_):
                raise ValueError("LZW stream starts with an undefined code")
            out += dict_[code]
        else:
            if code < len(dict_):
                entry = dict_[code]
            elif code == len(dict_):
                entry = dict_[prev] + dict_[prev][:1]  # KwKwK
            else:
                raise ValueError("LZW code past end of dictionary")
            out += entry
            if len(dict_) < 4096:
                dict_.append(dict_[prev] + entry[:1])
        prev = code
        # grow width when the NEXT code could reference the full table
        if len(dict_) == (1 << width) and width < 12:
            width += 1


def lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """Greedy longest-match GIF LZW compressor (dictionary reset at 4096,
    width growth mirroring the decoder). Emits CLEAR first and EOI last,
    as the spec recommends."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    width = min_code_size + 1
    table = fresh()
    next_code = eoi + 1
    emit(clear, width)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                # the decoder widens for its NEXT read when its dict hits
                # 2^width, and its dict trails ours by exactly one add —
                # so widen when the code we just assigned equals 2^width
                width += 1
        else:
            emit(clear, width)
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        w = wc[-1:]
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---- container -----------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the first image of a GIF to (H, W, 3) uint8 RGB via the
    active (local-over-global) color table. Raises ValueError on
    malformed streams; a frame without any color table is rejected."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (missing GIF87a/GIF89a)")
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        if len(gct) != n:
            raise ValueError("truncated global color table")
        pos += 3 * n

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(payload):
                raise ValueError("truncated GIF sub-blocks")
            ln = payload[p]
            p += 1 + ln
            if ln == 0:
                return p

    while True:
        if pos >= len(payload):
            raise ValueError("GIF ended before an image descriptor")
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            raise ValueError("GIF ended before an image descriptor")
        if b == 0x21:  # extension: label + sub-blocks
            pos = skip_subblocks(pos + 1)
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        # image descriptor
        w = int.from_bytes(payload[pos + 4 : pos + 6], "little")
        h = int.from_bytes(payload[pos + 6 : pos + 8], "little")
        iflags = payload[pos + 8]
        pos += 9
        table = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(
                payload[pos : pos + 3 * n], np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image has no color table")
        if pos >= len(payload):
            raise ValueError("truncated GIF image data")
        min_code_size = payload[pos]
        pos += 1
        if not 2 <= min_code_size <= 8:
            # roots are palette indices (single bytes): spec max is 8
            raise ValueError(f"invalid LZW minimum code size {min_code_size}")
        chunks = bytearray()
        while True:
            ln = payload[pos]
            pos += 1
            if ln == 0:
                break
            chunks += payload[pos : pos + ln]
            if len(payload) < pos + ln:
                raise ValueError("truncated GIF image data")
            pos += ln
        idx = np.frombuffer(lzw_decode(bytes(chunks), min_code_size), np.uint8)
        if len(idx) < w * h:
            raise ValueError("LZW data shorter than the image raster")
        idx = idx[: w * h].reshape(h, w)
        if iflags & 0x40:  # interlaced: reorder the four passes
            de = np.empty_like(idx)
            src = 0
            for start, step in _INTERLACE_PASSES:
                rows = range(start, h, step)
                de[list(rows)] = idx[src : src + len(rows)]
                src += len(rows)
            idx = de
        if idx.max(initial=0) >= len(table):
            raise ValueError("palette index out of range")
        return table[idx]
    raise ValueError("no image descriptor found")  # pragma: no cover


def encode_gif(arr: np.ndarray, interlace: bool = False) -> bytes:
    """Encode (H, W) uint8 palette indices over an identity greyscale
    256-color table (r=g=b=index) to GIF89a through :func:`lzw_encode`.
    Index-in == grey-out makes the codec lossless by construction and
    lets a SQL oracle predict decoded pixels from the index law."""
    arr = np.asarray(arr, np.uint8)
    h, w = arr.shape
    gct = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | 0x07, 0, 0])  # GCT present, 256 entries
    out += gct.tobytes()
    out += b"\x2c" + bytes(4) + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0])
    if interlace:
        rows = [r for start, step in _INTERLACE_PASSES for r in range(start, h, step)]
        raster = arr[rows]
    else:
        raster = arr
    out += bytes([8])  # LZW minimum code size
    comp = lzw_encode(raster.tobytes(), 8)
    for i in range(0, len(comp), 255):
        blk = comp[i : i + 255]
        out += bytes([len(blk)]) + blk
    out += b"\x00\x3b"
    return bytes(out)

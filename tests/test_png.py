"""PNG codec battery (operators/png.py) — inflate correctness is pinned
two independent ways: (1) round trips through our own deflate emitter for
all three block types, (2) cross-checks against CPython's stdlib zlib,
whose compressor emits real LZ77 matches, overlapping copies and dynamic
Huffman trees our literal-only emitter never writes. The PNG layer pins
all five filter reconstructions, every supported color type on foreign
(stdlib-compressed) files, checksum verification, and the explicit
rejection surface (Adam7, 16-bit, corrupt CRC/adler, truncation)."""

import zlib as stdzlib

import numpy as np
import pytest

from mapreduce_model_spark.operators.multimodal import decode_image
from mapreduce_model_spark.operators.png import (
    _adler32,
    _chunk,
    _crc32,
    _SIG,
    decode_png,
    encode_png,
    inflate,
    zlib_compress,
    zlib_decompress,
)


def test_checksums_match_stdlib():
    rng = np.random.default_rng(0)
    for n in (0, 1, 999, 100_000):
        d = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert _adler32(d) == stdzlib.adler32(d)
        assert _crc32(d) == stdzlib.crc32(d)


def test_inflate_against_stdlib_compressor():
    # level 0 = stored blocks; 1/6/9 = fixed/dynamic trees with real
    # LZ77 matches (incl. 70 kB > one stored-block max)
    rng = np.random.default_rng(1)
    for lvl in (0, 1, 6, 9):
        for n in (0, 1, 13, 5000, 70_000):
            data = bytes(rng.integers(0, 256 if lvl else 4, n, dtype=np.uint8))
            assert zlib_decompress(stdzlib.compress(data, lvl)) == data


def test_inflate_overlapping_copies():
    # dist < len back-references (byte-at-a-time copy semantics)
    for pat in (b"abcabcabc" * 700, b"a" * 100_000, bytes(range(256)) * 300):
        for lvl in (1, 9):
            assert zlib_decompress(stdzlib.compress(pat, lvl)) == pat


def test_own_emitter_all_block_types_accepted_by_stdlib():
    rng = np.random.default_rng(2)
    for block in ("stored", "fixed", "dynamic"):
        for n in (0, 1, 700, 70_000):
            data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            z = zlib_compress(data, block=block)
            assert zlib_decompress(z) == data
            assert stdzlib.decompress(z) == data


def test_inflate_rejects_malformed():
    with pytest.raises(ValueError, match="truncated"):
        inflate(b"")
    with pytest.raises(ValueError, match="LEN/NLEN"):
        inflate(b"\x01\x05\x00\x05\x00abcde")  # NLEN not complement
    with pytest.raises(ValueError, match="reserved"):
        inflate(b"\x07")  # BTYPE=3
    good = zlib_compress(b"hello world", block="fixed")
    bad = bytearray(good)
    bad[-1] ^= 0xFF  # adler
    with pytest.raises(ValueError, match="adler32"):
        zlib_decompress(bytes(bad))


def _roundtrip(arr, **kw):
    return decode_png(encode_png(arr, **kw))


def test_png_roundtrip_grey_all_blocks_and_filters():
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (13, 17), dtype=np.uint8)
    for block in ("stored", "fixed", "dynamic"):
        for filters in ("none", "cycle"):
            out = _roundtrip(g, block=block, filters=filters)
            assert out.shape == (13, 17, 3)
            for c in range(3):
                assert np.array_equal(out[:, :, c], g)


def test_png_roundtrip_rgb():
    rng = np.random.default_rng(4)
    c = rng.integers(0, 256, (9, 5, 3), dtype=np.uint8)
    assert np.array_equal(_roundtrip(c, block="dynamic", filters="cycle"), c)


def _foreign(w, h, depth, ctype, raw, plte=None, interlace=0):
    """A PNG assembled around a STDLIB-zlib IDAT — a file our encoder
    never produces, so decode coverage is not self-referential."""
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([depth, ctype, 0, 0, interlace])
    )
    b = _SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        b += _chunk(b"PLTE", plte)
    return b + _chunk(b"IDAT", stdzlib.compress(raw)) + _chunk(b"IEND", b"")


def test_png_foreign_color_types():
    rng = np.random.default_rng(5)
    rgba = rng.integers(0, 256, (4, 3, 4), dtype=np.uint8)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(4))
    assert np.array_equal(decode_png(_foreign(3, 4, 8, 6, raw)), rgba[:, :, :3])
    ga = rng.integers(0, 256, (4, 3, 2), dtype=np.uint8)
    raw = b"".join(b"\x00" + ga[y].tobytes() for y in range(4))
    assert np.array_equal(
        decode_png(_foreign(3, 4, 8, 4, raw)), np.repeat(ga[:, :, :1], 3, axis=2)
    )
    pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
    idx = rng.integers(0, 7, (5, 6), dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(5))
    assert np.array_equal(
        decode_png(_foreign(6, 5, 8, 3, raw, plte=pal.tobytes())), pal[idx]
    )


def test_png_filter_reconstruction_hand_computed():
    # Sub then Up on a known 2x3 grey image; filtered bytes written by
    # hand, not by our encoder
    raw = bytes([1, 10, 245, 245]) + bytes([2, 100, 1, 2])  # Sub row, Up row
    out = decode_png(_foreign(3, 2, 8, 0, raw))
    assert out[:, :, 0].tolist() == [[10, 255, 244], [110, 0, 246]]


def test_png_rejections():
    with pytest.raises(NotImplementedError, match="Adam7"):
        decode_png(_foreign(3, 4, 8, 0, b"", interlace=1))
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_png(_foreign(3, 4, 16, 0, b""))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x89PNG\r\n\x1a junk....")
    good = encode_png(np.zeros((4, 4), np.uint8))
    bad = bytearray(good)
    bad[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(_foreign(3, 4, 8, 0, b"\x00" * 5))
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(_foreign(3, 2, 8, 3, bytes([0, 0, 0, 0]) + bytes([0, 0, 0, 0])))


def test_decode_image_dispatches_png():
    rng = np.random.default_rng(6)
    g = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    out = decode_image(encode_png(g, block="dynamic", filters="cycle"))
    assert np.array_equal(out[:, :, 0], g)


def test_gif_dispatches_to_real_decoder():
    # GIF decodes for real too (operators/gif.py, full battery in
    # tests/test_gif.py) — truncated body surfaces its ValueError
    with pytest.raises(ValueError):
        decode_image(b"GIF89a" + b"\x00" * 16)

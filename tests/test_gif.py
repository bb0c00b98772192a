"""GIF codec battery (operators/gif.py) — LZW is pinned by adversarial
round trips (runs forcing the KwKwK case, 100 kB streams forcing width
growth to 12 bits and 4096-dictionary resets, every min_code_size), by a
hand-packed spec vector (the KwKwK stream assembled bit-by-bit, not by
our encoder), and by container tests covering interlace, local color
tables, extension skipping, multi-frame first-image semantics and the
rejection surface."""

import numpy as np
import pytest

from mapreduce_model_spark.operators.gif import (
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)
from mapreduce_model_spark.operators.multimodal import decode_image


def _pack(codes, width):
    acc = n = 0
    out = bytearray()
    for c in codes:
        acc |= c << n
        n += width
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


def test_lzw_roundtrip_adversarial():
    rng = np.random.default_rng(0)
    cases = [
        b"",
        b"a",
        b"aaaaaaaaaa",  # KwKwK chain
        b"abcabcabcabc" * 10,
        bytes(rng.integers(0, 256, 100_000, dtype=np.uint8)),  # dict resets
        bytes(rng.integers(0, 4, 100_000, dtype=np.uint8)),  # deep dict
        b"a" * 100_000,
        bytes(range(256)) * 500,
    ]
    for d in cases:
        assert lzw_decode(lzw_encode(d, 8), 8) == d


def test_lzw_all_min_code_sizes():
    rng = np.random.default_rng(1)
    for m in (2, 3, 5, 7, 8):
        d = bytes(rng.integers(0, 1 << m, 50_000, dtype=np.uint8))
        assert lzw_decode(lzw_encode(d, m), m) == d


def test_lzw_hand_packed_kwkwk_vector():
    # min=2 → clear=4, eoi=5, width=3. Stream [CLEAR, 1, 6, EOI]: code 6
    # equals the next free slot → KwKwK: prev + prev[0] = b"\x01\x01"
    stream = _pack([4, 1, 6, 5], 3)
    assert lzw_decode(stream, 2) == b"\x01\x01\x01"


def test_lzw_rejects_undefined_codes():
    with pytest.raises(ValueError, match="undefined"):
        lzw_decode(_pack([4, 7], 3), 2)  # first code past dict
    with pytest.raises(ValueError, match="past end"):
        lzw_decode(_pack([4, 1, 7], 3), 2)  # gap past next free slot


def test_gif_roundtrip_plain_and_interlaced():
    rng = np.random.default_rng(2)
    for interlace in (False, True):
        for shape in ((1, 1), (7, 5), (13, 17), (64, 64)):
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            out = decode_gif(encode_gif(img, interlace=interlace))
            assert out.shape == (*shape, 3)
            for ch in range(3):
                assert np.array_equal(out[:, :, ch], img)


def test_gif_foreign_features():
    # a file assembled by hand, not by our encoder: local color table
    # overriding the global one, a skipped graphic-control extension,
    # and a second (ignored) frame after the first
    pal = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])  # 4 RGB
    idx = bytes([0, 1, 2, 3, 3, 2, 1, 0])  # 4x2 image
    comp = lzw_encode(idx, 2)
    gif = (
        b"GIF89a"
        + (4).to_bytes(2, "little")
        + (2).to_bytes(2, "little")
        + bytes([0x80, 0, 0])  # GCT present: 2 entries, all black
        + bytes(6)
        + b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control ext
        + b"\x2c"
        + bytes(4)
        + (4).to_bytes(2, "little")
        + (2).to_bytes(2, "little")
        + bytes([0x81])  # local color table, 4 entries
        + pal
        + bytes([2, len(comp)])
        + comp
        + b"\x00"
        # a second frame that must be ignored
        + b"\x2c"
        + bytes(4)
        + (1).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + bytes([0])
        + bytes([2, len(lzw_encode(b"\x00", 2))])
        + lzw_encode(b"\x00", 2)
        + b"\x00\x3b"
    )
    out = decode_gif(gif)
    want = np.frombuffer(pal, np.uint8).reshape(4, 3)[
        np.frombuffer(idx, np.uint8).reshape(2, 4)
    ]
    assert np.array_equal(out, want)


def test_gif_rejections():
    with pytest.raises(ValueError, match="GIF87a/GIF89a"):
        decode_gif(b"NOTGIF" + bytes(20))
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + bytes(16))  # truncated: no image descriptor
    # trailer before any image
    hdr = b"GIF89a" + (1).to_bytes(2, "little") + (1).to_bytes(2, "little") + bytes([0, 0, 0])
    with pytest.raises(ValueError, match="image descriptor"):
        decode_gif(hdr + b"\x3b")
    # image with neither global nor local color table
    with pytest.raises(ValueError, match="color table"):
        decode_gif(
            hdr
            + b"\x2c"
            + bytes(4)
            + (1).to_bytes(2, "little")
            + (1).to_bytes(2, "little")
            + bytes([0, 2, 1, 0x04, 0])
        )


def test_decode_image_dispatches_gif():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (6, 9), dtype=np.uint8)
    out = decode_image(encode_gif(img, interlace=True))
    assert np.array_equal(out[:, :, 0], img)

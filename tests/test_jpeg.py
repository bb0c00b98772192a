"""Baseline-JPEG codec battery (operators/jpeg.py) — byte goldens,
round-trip laws, and rejection paths.

The golden below is HAND-COMPUTED from the public spec (ITU-T T.81),
not captured from the implementation: for a single flat 8×8 block of
value 130 under the all-ones quantization table, the quantized
coefficients are DC = 8·(130−128) = 16, all AC zero. With the Annex K
luminance tables the canonical codes are: DC category 5 → '110' (third
3-bit code after length-2 '00'), magnitude bits '10000', EOB (AC symbol
0x00, the first of three 4-bit codes after '00','01','100') → '1010';
12 bits padded with 1s gives 0xD0 0xAF. A decoder/encoder that drifts
from the spec's canonical code construction or magnitude convention
cannot reproduce these two bytes.
"""

import numpy as np
import pytest

from mapreduce_model_spark.operators.jpeg import (
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)
from mapreduce_model_spark.operators.multimodal import decode_image


def _flat_gray(blocks: np.ndarray) -> np.ndarray:
    return np.repeat(np.repeat(blocks.astype(np.uint8), 8, 0), 8, 1)


def test_entropy_bytes_golden_flat_block():
    payload = encode_jpeg(np.full((8, 8), 130, np.uint8))
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    # entropy-coded segment sits between the SOS header and EOI; for one
    # flat block it is exactly the two hand-computed bytes
    sos = payload.index(b"\xff\xda")
    sos_len = int.from_bytes(payload[sos + 2 : sos + 4], "big")
    entropy = payload[sos + 2 + sos_len : -2]
    assert entropy == bytes([0xD0, 0xAF]), entropy.hex()


def test_header_fields_golden():
    img = _flat_gray(np.array([[1, 2, 3], [4, 5, 6]]))  # 16x24
    payload = encode_jpeg(img)
    # DQT: all-ones table id 0, 8-bit precision
    dqt = payload.index(b"\xff\xdb")
    assert payload[dqt + 4] == 0x00
    assert payload[dqt + 5 : dqt + 69] == b"\x01" * 64
    # SOF0: precision 8, H=16, W=24, 1 component, sampling 1x1, qtable 0
    sof = payload.index(b"\xff\xc0")
    body = payload[sof + 4 : sof + 4 + 9]
    assert body == bytes([8, 0, 16, 0, 24, 1, 1, 0x11, 0])


def test_zigzag_is_spec_table():
    # spec T.81 figure A.6 first and last rows, hand-typed independently
    # of the generator's diagonal rule
    assert ZIGZAG.tolist()[:16] == [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    ]
    assert ZIGZAG.tolist()[-8:] == [53, 60, 61, 54, 47, 55, 62, 63]
    assert sorted(ZIGZAG.tolist()) == list(range(64))


def test_flat_blocks_roundtrip_exact():
    rng = np.random.default_rng(1)
    for h_b, w_b in [(1, 1), (2, 3), (1, 4), (3, 2)]:
        blocks = rng.integers(0, 256, (h_b, w_b))
        img = _flat_gray(blocks)
        out = decode_jpeg(encode_jpeg(img))
        assert out.shape == (8 * h_b, 8 * w_b, 3)
        for c in range(3):  # grayscale replicates to all channels
            assert np.array_equal(out[:, :, c], img)


def test_random_gray_unity_quant_near_lossless():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (24, 40)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    err = np.abs(out[:, :, 0].astype(int) - img.astype(int)).max()
    # unit quantization: the only loss is FDCT coefficient rounding
    assert err <= 2, err


def test_odd_dimensions_edge_padding():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (13, 19)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == (13, 19, 3)
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 2


def test_color_444_flat_blocks_exact():
    # R=G=B ⇒ Cb=Cr=128 exactly, so the color transform is the identity
    # on flat blocks and the round trip stays bit-exact
    rng = np.random.default_rng(4)
    g = _flat_gray(rng.integers(0, 256, (2, 3)))
    img = np.stack([g, g, g], axis=2)
    out = decode_jpeg(encode_jpeg(img, subsampling="444"))
    assert np.array_equal(out, img)


def test_color_444_random_bounded_error():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, subsampling="444"))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_color_420_flat_16x16_exact():
    # 16×16-aligned flat gray content: chroma is constant so 2×2 mean
    # downsampling and pixel-replication upsampling are both exact
    rng = np.random.default_rng(6)
    g = np.repeat(np.repeat(rng.integers(0, 256, (2, 2)), 16, 0), 16, 1)
    img = np.stack([g, g, g], axis=2).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, subsampling="420"))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_restart_interval_roundtrip_identical():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    a = decode_jpeg(encode_jpeg(img, restart_interval=2))
    b = decode_jpeg(encode_jpeg(img))
    assert np.array_equal(a, b)
    # and the RST markers are really in the stream
    payload = encode_jpeg(img, restart_interval=2)
    assert b"\xff\xdd" in payload and b"\xff\xd0" in payload


def test_nonunit_qtable_decodes_and_is_lossy():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    q = np.full((8, 8), 16, int)
    out = decode_jpeg(encode_jpeg(img, qtable=q))
    assert out.shape == (16, 16, 3)
    err = np.abs(out[:, :, 0].astype(int) - img.astype(int)).max()
    assert 0 < err <= 8 * 16  # lossy but bounded by quant step


def test_idct_matches_naive_reference():
    """Decoder IDCT against an independent O(N⁴) textbook implementation:
    craft a file whose quantized coefficients are KNOWN (flat block ⇒ DC
    only, plus a second block whose diff exercises AC via the encoder),
    then compare decode output to the naive reconstruction."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (8, 8)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img))[:, :, 0].astype(np.float64)

    # naive pipeline: exact FDCT, round (the encoder's only loss at q=1),
    # naive IDCT with explicit quadruple loop
    f = img.astype(np.float64) - 128.0
    def c(u):
        return np.sqrt(0.5) if u == 0 else 1.0
    F = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        f[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            F[u, v] = c(u) * c(v) / 4.0 * s
    Fq = np.round(F)
    g = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (
                        c(u) * c(v) / 4.0
                        * Fq[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            g[x, y] = s
    ref = np.clip(np.round(g + 128.0), 0, 255)
    assert np.array_equal(out, ref)


def test_progressive_rejected():
    payload = bytearray(encode_jpeg(np.full((8, 8), 99, np.uint8)))
    sof = bytes(payload).index(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # relabel as progressive
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(payload))


def test_12bit_precision_rejected():
    payload = bytearray(encode_jpeg(np.full((8, 8), 99, np.uint8)))
    sof = bytes(payload).index(b"\xff\xc0")
    payload[sof + 4] = 12
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_jpeg(bytes(payload))


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\nrest")


def test_decode_image_dispatches_jpeg():
    img = _flat_gray(np.array([[7, 200]]))
    out = decode_image(encode_jpeg(img))
    assert np.array_equal(out[:, :, 0], img)


def test_png_dispatches_to_real_decoder():
    # PNG is a real decoder since r11 (operators/png.py; full battery in
    # tests/test_png.py) — garbage after a valid signature must surface
    # the decoder's ValueError, not a stub NotImplementedError
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)


def test_truncated_entropy_stream_raises_valueerror():
    # Chop the entropy-coded segment short (keep SOI..SOS header, drop the
    # tail): the decoder must surface the documented ValueError, not the
    # internal _MarkerReached/IndexError control-flow exceptions.
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    payload = encode_jpeg(img)
    sos = payload.index(b"\xff\xda")
    scan_start = sos + 2 + int.from_bytes(payload[sos + 2 : sos + 4], "big")
    for cut in (scan_start + 1, len(payload) - 8):
        with pytest.raises(ValueError, match="entropy"):
            decode_jpeg(payload[:cut])


def test_corrupt_entropy_stream_marker_raises_valueerror():
    # Inject a bare (non-stuffed) marker mid-scan: _MarkerReached must be
    # re-raised as ValueError.
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    payload = bytearray(encode_jpeg(img))
    sos = bytes(payload).index(b"\xff\xda")
    scan_start = sos + 2 + int.from_bytes(payload[sos + 2 : sos + 4], "big")
    payload[scan_start + 4 : scan_start + 6] = b"\xff\xc4"
    with pytest.raises(ValueError, match="entropy"):
        decode_jpeg(bytes(payload))


def test_non_interleaved_multi_scan_rejected():
    # A valid SOF0 file whose first SOS covers only one of three components
    # (non-interleaved) must be rejected explicitly, not KeyError.
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    payload = bytearray(encode_jpeg(img, subsampling="444"))
    sos = bytes(payload).index(b"\xff\xda")
    ln = int.from_bytes(payload[sos + 2 : sos + 4], "big")
    # Rewrite the SOS header in place: ns 3 -> 1, keep component 1's spec,
    # then splice out the two dropped (cs, td/ta) byte pairs.
    assert payload[sos + 4] == 3
    comp1 = payload[sos + 5 : sos + 7]
    trailer = payload[sos + 2 + ln - 3 : sos + 2 + ln]
    payload[sos + 2 : sos + 2 + ln] = (8).to_bytes(2, "big") + bytes([1]) + comp1 + trailer
    with pytest.raises(NotImplementedError, match="interleaved"):
        decode_jpeg(bytes(payload))

"""Round 9: real BMP/PPM codecs (no external library) + their queries.

The registered queries (multimodal_decode_real / multimodal_resize_real)
prove the encode→decode round trip against a pixel-law oracle; these tests
pin SPEC CONFORMANCE against hand-built byte goldens — the check a
symmetric encoder/decoder bug pair cannot cancel out of — plus decoder
robustness to layout variants our encoder never emits (top-down BMP,
comments in PPM headers).
"""

import numpy as np
import pytest

from mapreduce_model_spark.operators.multimodal import (
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_bmp,
    encode_ppm,
)


def _golden_bmp(height_field: int) -> bytes:
    """Hand-assembled 2×1 24bpp BMP straight from the BITMAPINFOHEADER
    spec: left pixel RED, right pixel BLUE, row stored as BGR and padded
    to 4 bytes (2·3 = 6 → 8). ``height_field`` +1 = bottom-up, −1 =
    top-down (one row, so both orders hold the same bytes)."""
    body = bytes([0, 0, 255, 255, 0, 0, 0, 0])
    hdr = (
        b"BM"
        + (54 + len(body)).to_bytes(4, "little")
        + b"\x00" * 4
        + (54).to_bytes(4, "little")
    )
    info = (
        (40).to_bytes(4, "little")
        + (2).to_bytes(4, "little", signed=True)
        + height_field.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + (2835).to_bytes(4, "little")
        + (2835).to_bytes(4, "little")
        + b"\x00" * 8
    )
    return hdr + info + body


def test_bmp_spec_golden_bottom_up():
    img = decode_bmp(_golden_bmp(1))
    assert img.shape == (1, 2, 3)
    assert (img[0, 0] == [255, 0, 0]).all()  # RED — i.e. BGR was undone
    assert (img[0, 1] == [0, 0, 255]).all()  # BLUE


def test_bmp_spec_golden_top_down():
    assert (decode_bmp(_golden_bmp(-1)) == decode_bmp(_golden_bmp(1))).all()


def test_bmp_row_order_multi_row():
    # 1×2 image: top RED, bottom BLUE — bottom-up storage writes BLUE
    # row first; a decoder that skips the flip returns them swapped
    arr = np.array([[[255, 0, 0]], [[0, 0, 255]]], dtype=np.uint8)
    out = decode_bmp(encode_bmp(arr))
    assert (out == arr).all()
    # and the on-disk order really is bottom-up: first pixel bytes after
    # the 54-byte header are the BOTTOM row in BGR = 255, 0, 0
    raw = encode_bmp(arr)
    assert raw[54:57] == bytes([255, 0, 0])


def test_bmp_row_padding():
    # width 3 → row 9 bytes → padded to 12; reshape breaks if unpadded
    arr = (np.arange(3 * 2 * 3, dtype=np.uint8)).reshape(2, 3, 3)
    raw = encode_bmp(arr)
    assert (len(raw) - 54) == 12 * 2
    assert (decode_bmp(raw) == arr).all()


def test_bmp_rejects_unsupported():
    raw = bytearray(_golden_bmp(1))
    raw[28:30] = (8).to_bytes(2, "little")  # 8bpp palette
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(raw))
    with pytest.raises(ValueError):
        decode_bmp(b"PNG!" + bytes(60))


def test_ppm_spec_golden_with_comment():
    ppm = b"P6\n# comment line\n2 1\n255\n" + bytes([255, 0, 0, 0, 0, 255])
    img = decode_ppm(ppm)
    assert img.shape == (1, 2, 3)
    assert (img[0, 0] == [255, 0, 0]).all()
    assert (img[0, 1] == [0, 0, 255]).all()


def test_ppm_single_whitespace_after_maxval():
    # pixel data may begin with a byte that LOOKS like whitespace — the
    # spec says exactly one separator after maxval, so value 0x0A must
    # survive as the first sample
    arr = np.full((1, 1, 3), 0x0A, dtype=np.uint8)
    assert (decode_ppm(encode_ppm(arr)) == arr).all()


def test_ppm_rejects_non_p6():
    with pytest.raises(ValueError):
        decode_ppm(b"P3\n1 1\n255\n0 0 0")


@pytest.mark.parametrize("w,h", [(1, 1), (2, 2), (5, 3), (14, 8), (13, 1)])
def test_roundtrip_random(w, h):
    rng = np.random.default_rng(w * 100 + h)
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert (decode_image(encode_bmp(arr)) == arr).all()
    assert (decode_image(encode_ppm(arr)) == arr).all()


def test_decode_image_rejects_unknown_magic():
    # every classic format (BMP/PPM/JPEG/PNG/GIF) decodes natively now;
    # unrecognized payloads get a ValueError, truncated PNG bodies the
    # PNG decoder's own ValueError
    with pytest.raises(ValueError):
        decode_image(b"RIFFxxxxWAVE" + bytes(16))  # wav is not an image
    with pytest.raises(ValueError):
        decode_image(bytes.fromhex("89504e470d0a1a0a") + bytes(32))


def test_decode_real_queries_match_oracle(spark, sf_dir):
    """Spark faces of both round-9 multimodal queries vs their DuckDB
    oracles at sf0.001 — the same compare the driver gate runs."""
    from tests.oracle_harness import compare_query

    for name in ("multimodal_decode_real", "multimodal_resize_real"):
        assert compare_query(spark, sf_dir, name) is None, name


def test_sampled_twins_match_oracle(spark, sf_dir):
    """Spark faces of the nine round-9 sampled-truth twins vs their
    DuckDB oracles at sf0.001 (where the sample is the full corpus, so
    this also pins twin == parent semantics)."""
    from tests.oracle_harness import compare_query

    for name in (
        "lsh_recall_sampled",
        "simhash_recall_sampled",
        "kmeans_sampled",
        "embedding_pq_sampled",
        "pq_adc_sampled",
        "ivfpq_sampled",
        "ivfpq_recall_sampled",
        "semantic_dedup_sampled",
        "ivf_sampled",
    ):
        assert compare_query(spark, sf_dir, name) is None, name


def test_sample_frame_matches_duckdb_contract(spark):
    """The Spark-side selection (locate/substr/md5) keeps EXACTLY the ids
    the DuckDB predicate keeps, forced into the thr<16 regime with a
    small cap."""
    import duckdb

    import mapreduce_model_spark.functions.sampling as samp

    df = spark.range(0, 4096).withColumnRenamed("id", "doc_id")
    orig_cap = samp.SAMPLE_CAP
    try:
        samp.SAMPLE_CAP = 256  # thr = 1 at N=4096
        kept_spark = sorted(
            r[0] for r in samp.sample_frame(df, "doc_id").collect()
        )
        con = duckdb.connect()
        con.execute("CREATE VIEW docs AS SELECT unnest(range(0, 4096)) AS doc_id")
        # duck_sample_pred reads the module global at call time, so the
        # patched cap lands in the generated SQL too
        kept_duck = sorted(
            r[0]
            for r in con.execute(
                "SELECT doc_id FROM docs t WHERE "
                + samp.duck_sample_pred("docs", "t.doc_id")
            ).fetchall()
        )
    finally:
        samp.SAMPLE_CAP = orig_cap
    assert kept_spark == kept_duck
    assert 0 < len(kept_spark) < 4096

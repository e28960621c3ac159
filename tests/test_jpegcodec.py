"""Baseline JPEG codec (functions/jpegcodec.py): round trips, the
entropy/AC path checked against an INDEPENDENT naive cosine-sum IDCT
(math.cos in a Python loop — shares nothing with the engine's matrix
kernel), subsampling, restart markers, byte stuffing, and the clear
errors for unsupported variants.

The encoder writes its Huffman tables into DHT segments and the
decoder builds tables only from DHT, so these round trips exercise
real canonical-code construction on both sides rather than shared
constants (not self-certifying in the table sense); pixel values are
additionally pinned to planted formulas recomputed here by hand.
"""

import math
import struct

import numpy as np
import pytest

from riko_spark.functions.imagecodec import decode_image, parse_jpeg_dims
from riko_spark.functions.jpegcodec import (ZIGZAG, _BitWriter,
                                            _decode_table, _encode_table,
                                            decode_jpeg, encode_jpeg)


def _naive_idct(coef):
    """Direct T.81 A.3.3 inverse DCT — independent reference."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (cu * cv * coef[u][v]
                          * math.cos((2 * x + 1) * u * math.pi / 16)
                          * math.cos((2 * y + 1) * v * math.pi / 16))
            out[x, y] = s / 4
    return out


def test_zigzag_is_the_standard_order():
    # spot-pin the spec order at the corners and mid-diagonals
    assert ZIGZAG[0] == (0, 0)
    assert ZIGZAG[1] == (0, 1) and ZIGZAG[2] == (1, 0)
    assert ZIGZAG[3] == (2, 0) and ZIGZAG[5] == (0, 2)
    assert ZIGZAG[35] == (7, 0) and ZIGZAG[39] == (4, 4)
    assert ZIGZAG[63] == (7, 7)
    assert len(set(ZIGZAG)) == 64


def test_gray_block_constant_exact():
    rng = np.random.RandomState(11)
    for h, w in [(8, 8), (16, 24), (13, 19), (40, 56)]:
        bv = rng.randint(0, 256, size=(-(-h // 8), -(-w // 8)))
        img = np.repeat(np.repeat(bv.astype(np.uint8), 8, 0), 8, 1)[:h, :w]
        gw, gh, gc, px = decode_jpeg(encode_jpeg(img))
        assert (gw, gh, gc) == (w, h, 1)
        assert np.array_equal(px[:, :, 0], img)


def test_gray_arbitrary_near_exact():
    """Ones-quant round trip of arbitrary pixels: only coefficient
    rounding (<=0.5 per coeff) separates decode from source."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(24, 40)).astype(np.uint8)
    _, _, _, px = decode_jpeg(encode_jpeg(img))
    assert np.abs(px[:, :, 0].astype(int) - img.astype(int)).max() <= 6


def test_ac_path_against_naive_idct():
    """Planted COEFFICIENTS through the full entropy round trip: build
    a gray image from a naive-IDCT of hand-picked integer coefficients,
    encode with ones-quant, decode, and compare against the same naive
    IDCT — long zero runs force ZRL, high-frequency terms force long
    Huffman codes, negatives exercise EXTEND."""
    coef = np.zeros((8, 8))
    coef[0, 0] = 37          # DC
    coef[0, 1] = -21         # first AC
    coef[3, 2] = 240         # mid-band, large amplitude
    coef[7, 7] = -5          # last zigzag index (no EOB)
    coef[0, 7] = 1           # forces a >15 zero run inside the scan
    ref = np.clip(np.floor(_naive_idct(coef) + 128.0 + 0.5), 0, 255)
    img = ref.astype(np.uint8)
    _, _, _, px = decode_jpeg(encode_jpeg(img))
    # encode(FDCT) of the naive-IDCT image re-quantizes to integers;
    # tolerance 1 covers the double rounding, not a structural error
    assert np.abs(px[:, :, 0].astype(int) - img.astype(int)).max() <= 1


def test_rgb_gray_content_420_exact():
    """R=G=B content: Y==v, Cb==Cr==128 exactly, so the 4:2:0
    interleaved-MCU path must reproduce planted values bit-exactly."""
    img = np.zeros((32, 48, 3), np.uint8)
    for by in range(2):
        for bx in range(3):
            v = (11 * 7 + 7 * bx + 13 * by) % 251
            img[by * 16:(by + 1) * 16, bx * 16:(bx + 1) * 16] = v
    w, h, c, px = decode_jpeg(encode_jpeg(img, "420"))
    assert (w, h, c) == (48, 32, 3)
    assert np.array_equal(px, img)


def test_rgb_422_and_444_roundtrip():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(17, 23, 3)).astype(np.uint8)
    for sub in ("444", "422", "420"):
        w, h, c, px = decode_jpeg(encode_jpeg(img, sub))
        assert (w, h, c) == (23, 17, 3)
        if sub == "444":  # no chroma loss beyond coefficient rounding
            assert np.abs(px.astype(int) - img.astype(int)).max() <= 8


def test_restart_markers_and_dc_reset():
    rng = np.random.RandomState(9)
    bv = rng.randint(0, 256, size=(4, 6)).astype(np.uint8)
    img = np.repeat(np.repeat(bv, 8, 0), 8, 1)
    blob = encode_jpeg(img, restart_interval=5)
    assert b"\xff\xd0" in blob or b"\xff\xd1" in blob
    _, _, _, px = decode_jpeg(blob)
    assert np.array_equal(px[:, :, 0], img)


def test_byte_stuffing_roundtrip():
    """An all-255 image maximizes 0xFF bytes in the entropy stream."""
    img = np.full((16, 16), 255, np.uint8)
    _, _, _, px = decode_jpeg(encode_jpeg(img))
    assert np.array_equal(px[:, :, 0], img)


def test_sixteen_bit_dqt():
    """Pq=1 (16-bit) quant values parse; a table of 256s forces it."""
    q = np.full((8, 8), 1.0)
    blob = encode_jpeg(np.full((8, 8), 200, np.uint8), quant_luma=q)
    # rewrite the DQT segment to 16-bit precision by hand
    i = blob.index(b"\xff\xdb")
    body16 = b"\x10" + b"".join(struct.pack(">H", 1) for _ in range(64))
    patched = (blob[:i] + struct.pack(">BBH", 0xFF, 0xDB, len(body16) + 2)
               + body16 + blob[i + 2 + 67:])
    _, _, _, px = decode_jpeg(patched)
    assert px[0, 0, 0] == 200


def test_lossless_and_arithmetic_rejected_clearly():
    blob = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    i = bytes(blob).index(b"\xff\xc0")
    blob[i + 1] = 0xC3  # flip SOF0 -> SOF3 (lossless)
    with pytest.raises(ValueError, match="lossless"):
        decode_jpeg(bytes(blob))
    # a sequential scan header mislabeled as progressive is corrupt:
    # its Se=63 is illegal for a DC scan
    blob[i + 1] = 0xC2
    with pytest.raises(ValueError, match="Se = 0"):
        decode_jpeg(bytes(blob))


def test_truncation_and_garbage_errors():
    blob = encode_jpeg(np.zeros((16, 16), np.uint8))
    with pytest.raises(ValueError):
        decode_jpeg(blob[:40])  # cut inside the header
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no scan
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")


def test_decode_image_dispatches_jpeg():
    img = np.repeat(np.repeat(
        np.arange(6, dtype=np.uint8).reshape(2, 3) * 40, 8, 0), 8, 1)
    blob = encode_jpeg(img)
    w, h, c, px = decode_image(blob)
    assert (w, h, c) == (24, 16, 1)
    assert np.array_equal(px[:, :, 0], img)
    assert parse_jpeg_dims(blob) == (24, 16, 1)


def test_huffman_tables_canonical_inverse():
    """encode_table and decode_table agree on every symbol of an
    irregular spec (not the Annex K one)."""
    bits = [0, 1, 2, 1, 3, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    vals = [7, 3, 9, 1, 5, 2, 8, 4]
    enc = _encode_table(bits, vals)
    dec = _decode_table(bits, vals)
    for sym, (code, ln) in enc.items():
        w = _BitWriter()
        w.put(code, ln)
        w.put(0x7F, 7)  # tail padding so flush() adds nothing odd
        seg = w.flush()
        from riko_spark.functions.jpegcodec import _BitReader
        rd = _BitReader(seg)
        assert rd.huff(dec) == sym


def test_image_features_op_jpeg_real(spark):
    """The operator surface: JPEG blobs flow through mapInPandas with
    channels != 0 and cell sums equal to the planted block formula."""
    import pandas as pd

    from riko_spark.operators.multimodal import image_features_op

    rows = []
    for i in range(4):
        w = h = 16
        v = (17 * i + 23) % 251
        img = np.full((h, w), v, np.uint8)
        blob = encode_jpeg(img if i % 2 == 0
                           else np.repeat(img[:, :, None], 3, 2), "420")
        rows.append((i, bytearray(blob), v))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "blob", "v"])[["id", "blob"]])
    out = {r["id"]: r for r in image_features_op(
        df, {"on_undecodable": "raise"}).collect()}
    for i, _, v in rows:
        r = out[i]
        assert r["channels"] == (1 if i % 2 == 0 else 3)
        assert r["width"] == 16 and r["height"] == 16
        for f in r["feature"]:
            assert round(f * 255 * 16) == v * 16


# ----------------------------------------------------- progressive JPEG

def test_progressive_matches_baseline_bit_exactly():
    """With identical quant tables both encoders quantize to the SAME
    coefficients, so the progressive decode (a completely different
    entropy procedure: DC/AC first scans, EOBn runs, correction bits)
    must reproduce the baseline decode bit-for-bit."""
    from riko_spark.functions.jpegcodec import encode_jpeg_progressive

    rng = np.random.RandomState(3)
    cases = [
        (rng.randint(0, 256, (24, 40)).astype(np.uint8), "444", 0),
        (rng.randint(0, 256, (37, 21, 3)).astype(np.uint8), "420", 0),
        (rng.randint(0, 256, (16, 16, 3)).astype(np.uint8), "422", 2),
        (rng.randint(0, 256, (50, 66, 3)).astype(np.uint8), "444", 3),
    ]
    for px, sub, ri in cases:
        base = decode_jpeg(encode_jpeg(px, sub))
        prog = decode_jpeg(encode_jpeg_progressive(px, sub,
                                                   restart_interval=ri))
        assert base[:3] == prog[:3]
        assert np.array_equal(base[3], prog[3]), (px.shape, sub, ri)


def test_progressive_lossy_and_custom_script():
    """Annex-K quant tables (large coefficients, real EOB statistics)
    plus a many-band script with staged successive approximation —
    still coefficient-identical to the baseline path."""
    from riko_spark.functions.jpegcodec import encode_jpeg_progressive

    ql = np.array(
        [[16, 11, 10, 16, 24, 40, 51, 61],
         [12, 12, 14, 19, 26, 58, 60, 55],
         [14, 13, 16, 24, 40, 57, 69, 56],
         [14, 17, 22, 29, 51, 87, 80, 62],
         [18, 22, 37, 56, 68, 109, 103, 77],
         [24, 35, 55, 64, 81, 104, 113, 92],
         [49, 64, 78, 87, 103, 121, 120, 101],
         [72, 92, 95, 98, 112, 100, 103, 99]])
    script = [([0], 0, 0, 0, 3),
              ([0], 1, 2, 0, 1), ([0], 3, 15, 0, 2), ([0], 16, 63, 0, 2),
              ([0], 3, 15, 2, 1), ([0], 16, 63, 2, 1),
              ([0], 1, 2, 1, 0), ([0], 3, 15, 1, 0), ([0], 16, 63, 1, 0),
              ([0], 0, 0, 3, 2), ([0], 0, 0, 2, 1), ([0], 0, 0, 1, 0)]
    rng = np.random.RandomState(9)
    px = rng.randint(0, 256, (45, 59)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(px, "444", ql))
    prog = decode_jpeg(encode_jpeg_progressive(px, "444", ql,
                                               scans=script,
                                               restart_interval=2))
    assert np.array_equal(base[3], prog[3])
    # long EOB runs: a smooth gradient is almost all EOBn symbols
    grad = (np.add.outer(np.arange(64), np.arange(96)) // 2 % 256
            ).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(grad, "444", ql))[3],
        decode_jpeg(encode_jpeg_progressive(grad, "444", ql))[3])


def test_progressive_hand_packed_stream():
    """A progressive stream assembled BYTE BY HAND from the T.81 scan
    procedures (no encoder involved): 8x8 gray, all-ones quant,
    target coefficients DC=-25, (0,1)=3, (1,1)=-5 delivered over four
    scans — DC first at Al=1, AC first at Al=1 (run/size + EOB), AC
    refinement at Al=0 (EOB-run correction bits), DC refinement
    (exercises the negative two's-complement OR).  Expected pixels
    come from the independent naive cosine IDCT."""
    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, b"\x00" + b"\x01" * 64)          # all-ones quant
    out += seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1)
               + struct.pack(">BBB", 1, 0x11, 0))      # SOF2 8x8 1-comp
    # DC table: symbols 0..5 at length 3 (codes 000..101)
    dc_bits = bytes([0, 0, 6] + [0] * 13)
    # AC table: 00/01/21/22/F0 at length 3 (codes 000..100)
    ac_bits = bytes([0, 0, 5] + [0] * 13)
    out += seg(0xC4, b"\x00" + dc_bits + bytes([0, 1, 2, 3, 4, 5])
               + b"\x10" + ac_bits + bytes([0x00, 0x01, 0x21, 0x22, 0xF0]))

    def sos(ss, se, ah, al, bits):
        body = bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
        padded = bits + "1" * (-len(bits) % 8)
        raw = bytes(int(padded[i:i + 8], 2) for i in range(0, len(padded), 8))
        return seg(0xDA, body) + raw.replace(b"\xff", b"\xff\x00")

    # scan 1 (DC first, Al=1): diff = -25 >> 1 = -13, category 4,
    # DC code '100', magnitude bits -13+15 = 2 -> '0010'
    out += sos(0, 0, 0, 1, "100" + "0010")
    # scan 2 (AC first, Ss=1 Se=63, Al=1): k1 -> +1 (sym 0x01 '001',
    # bit '1'); k4 -> -2 after run 2 (sym 0x22 '011', bits '01'); EOB
    out += sos(1, 63, 0, 1, "001" + "1" + "011" + "01" + "000")
    # scan 3 (AC refine, Al=0): no new coefficients -> EOB1 '000' then
    # positional correction bits |3|&1=1 and |-5|&1=1
    out += sos(1, 63, 1, 0, "000" + "1" + "1")
    # scan 4 (DC refine): bit (-25)&1 = 1 -> -26 | 1 = -25
    out += sos(0, 0, 1, 0, "1")
    out += b"\xff\xd9"

    w, h, c, px = decode_jpeg(bytes(out))
    assert (w, h, c) == (8, 8, 1)
    coef = np.zeros((8, 8))
    coef[0, 0] = -25
    coef[0, 1] = 3
    coef[1, 1] = -5
    expect = np.clip(np.floor(_naive_idct(coef) + 128.0 + 0.5),
                     0, 255).astype(np.uint8)
    assert np.array_equal(px[:, :, 0], expect)


def test_progressive_dc_only_block_constant_exact():
    """The driver-fixture exactness contract holds on the progressive
    path too: block-constant pixels + all-ones quant -> bit-exact."""
    from riko_spark.functions.jpegcodec import encode_jpeg_progressive

    rng = np.random.RandomState(21)
    bv = rng.randint(0, 256, size=(3, 5))
    img = np.repeat(np.repeat(bv.astype(np.uint8), 8, 0), 8, 1)[:22, :36]
    gw, gh, gc, px = decode_jpeg(encode_jpeg_progressive(img))
    assert (gw, gh, gc) == (36, 22, 1)
    assert np.array_equal(px[:, :, 0], img)
    # and through the dispatch (SOF2 sniffs as plain JPEG magic)
    gw2, gh2, gc2, px2 = decode_image(encode_jpeg_progressive(img))
    assert np.array_equal(px2, px)


def test_progressive_scan_script_validation():
    from riko_spark.functions.jpegcodec import encode_jpeg_progressive

    px = np.zeros((8, 8, 3), np.uint8)
    with pytest.raises(ValueError, match="one component"):
        encode_jpeg_progressive(px, scans=[([0, 1], 1, 5, 0, 0)])
    with pytest.raises(ValueError, match="missing component"):
        encode_jpeg_progressive(np.zeros((8, 8), np.uint8),
                                scans=[([1], 0, 0, 0, 0)])

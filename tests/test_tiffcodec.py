"""TIFF codec (functions/tiffcodec.py): round trips over every
compression, a HAND-PACKED LZW bitstream (built bit-by-bit from the
TIFF 6.0 §13 procedure, exercising the KwKwK case — the decoder is
never checked only against its mirror encoder), hand-built PackBits
runs, hand-assembled bilevel / palette / 16-bit IFDs the encoder
cannot produce, both byte orders, and the clear rejects."""

import struct

import numpy as np
import pytest

from riko_spark.functions.tiffcodec import (_lzw_decode, _packbits_decode,
                                            decode_tiff, encode_tiff,
                                            parse_tiff_dims)


def test_roundtrip_all_compressions_and_strips():
    rng = np.random.RandomState(17)
    for comp in ("none", "packbits", "lzw", "deflate"):
        for gray in (True, False):
            shape = (21, 33) if gray else (21, 33, 3)
            px = rng.randint(0, 256, shape).astype(np.uint8)
            blob = encode_tiff(px, comp, rows_per_strip=5)
            w, h, c, got = decode_tiff(blob)
            assert (w, h, c) == (33, 21, 1 if gray else 3)
            want = px[:, :, None] if gray else px
            assert np.array_equal(got, want), comp
            assert parse_tiff_dims(blob) == (33, 21, 1 if gray else 3)


def test_roundtrip_big_endian_and_predictor():
    rng = np.random.RandomState(23)
    px = rng.randint(0, 256, (16, 20, 3)).astype(np.uint8)
    for be in (False, True):
        for comp in ("lzw", "deflate"):
            blob = encode_tiff(px, comp, predictor=True, big_endian=be)
            _, _, _, got = decode_tiff(blob)
            assert np.array_equal(got, px), (be, comp)
    # gradient rows are the predictor's best case AND its hardest
    # correctness test (every diff nonzero)
    grad = np.tile(np.arange(200, dtype=np.uint8), (7, 1))
    _, _, _, got = decode_tiff(encode_tiff(grad, "lzw", predictor=True))
    assert np.array_equal(got[:, :, 0], grad)


def test_lzw_hand_packed_bitstream():
    """Codes for the input 'ABABABA' worked by hand from the spec:
    Clear(256), 'A'(65), 'B'(66), AB(258), ABA(260 — emitted as the
    just-assigned code, the KwKwK case the naive table lookup misses),
    EOI(257), all 9-bit MSB-first."""
    bits = "".join(format(c, "09b")
                   for c in (256, 65, 66, 258, 260, 257))
    bits += "0" * (-len(bits) % 8)
    buf = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
    assert _lzw_decode(buf, 100) == b"ABABABA"


def test_lzw_width_change_long_stream():
    """600 copies of the 0..255 ramp force 10/11/12-bit codes and a
    table reset; a one-code misalignment of the early-change point
    corrupts everything downstream."""
    from riko_spark.functions.tiffcodec import _lzw_encode

    data = np.tile(np.arange(256, dtype=np.uint8), 600).tobytes()
    assert _lzw_decode(_lzw_encode(data), len(data)) == data


def test_packbits_hand_built_runs():
    # literal(3 bytes) + repeat(0xAA x3) + noop + repeat('B' x2)
    buf = b"\x02ABC" + b"\xfe\xaa" + b"\x80" + b"\xff\x42"
    assert _packbits_decode(buf, 100) == b"ABC\xaa\xaa\xaaBB"
    assert _packbits_decode(buf, 4) == b"ABC\xaa"  # bounded output


def _hand_tiff(tags, payload, endian="<"):
    """Minimal single-IFD TIFF assembled by hand: ``tags`` is a list
    of (tag, type, count, 4-byte value field) already resolved; data
    payload is appended after the IFD and referenced by absolute
    offsets the caller computed."""
    out = bytearray(b"II*\x00" if endian == "<" else b"MM\x00*")
    out += struct.pack(endian + "I", 8)
    out += struct.pack(endian + "H", len(tags))
    for t, tt, cnt, val in sorted(tags):
        out += struct.pack(endian + "HHI", t, tt, cnt) + val
    out += struct.pack(endian + "I", 0)
    return bytes(out) + payload


def test_bilevel_both_polarities_hand_built():
    # 10x2 bilevel, rows 1010101010 / 0000011111, packed MSB-first
    rowbits = [0b10101010, 0b10000000, 0b00000111, 0b11000000]
    data = bytes(rowbits)
    base = 8 + 2 + 12 * 6 + 4  # header + IFD with 6 tags
    for photometric, on, off in ((0, 0, 255), (1, 255, 0)):
        tags = [
            (256, 3, 1, struct.pack("<HH", 10, 0)),
            (257, 3, 1, struct.pack("<HH", 2, 0)),
            (262, 3, 1, struct.pack("<HH", photometric, 0)),
            (273, 4, 1, struct.pack("<I", base)),
            (278, 3, 1, struct.pack("<HH", 2, 0)),
            (279, 4, 1, struct.pack("<I", len(data))),
        ]
        w, h, c, px = decode_tiff(_hand_tiff(tags, data))
        assert (w, h, c) == (10, 2, 1)
        row0 = [on, off] * 5
        row1 = [off] * 5 + [on] * 5
        assert px[0, :, 0].tolist() == row0
        assert px[1, :, 0].tolist() == row1


def test_palette_hand_built():
    # 4x1 palette image: indices 0,1,2,255; ColorMap[i] = (i*257,
    # (255-i)*257, (i*7 % 256)*257) -> top bytes i, 255-i, i*7%256
    idx = bytes([0, 1, 2, 255])
    cmap = np.zeros(768, dtype=np.uint16)
    i = np.arange(256)
    cmap[0:256] = i * 257
    cmap[256:512] = (255 - i) * 257
    cmap[512:768] = (i * 7 % 256) * 257
    ntags = 8
    base = 8 + 2 + 12 * ntags + 4
    cmap_off = base
    data_off = cmap_off + 1536
    payload = cmap.astype("<u2").tobytes() + idx
    tags = [
        (256, 3, 1, struct.pack("<HH", 4, 0)),
        (257, 3, 1, struct.pack("<HH", 1, 0)),
        (258, 3, 1, struct.pack("<HH", 8, 0)),
        (262, 3, 1, struct.pack("<HH", 3, 0)),
        (273, 4, 1, struct.pack("<I", data_off)),
        (279, 4, 1, struct.pack("<I", 4)),
        (320, 3, 768, struct.pack("<I", cmap_off)),
        (277, 3, 1, struct.pack("<HH", 1, 0)),
    ]
    w, h, c, px = decode_tiff(_hand_tiff(tags, payload))
    assert (w, h, c) == (4, 1, 3)
    for j, k in enumerate([0, 1, 2, 255]):
        assert px[0, j].tolist() == [k, 255 - k, (k * 7) % 256]


def test_sixteen_bit_grayscale_hand_built():
    vals = np.array([[0, 1, 255, 256, 65535, 43210]], dtype="<u2")
    base = 8 + 2 + 12 * 6 + 4
    tags = [
        (256, 3, 1, struct.pack("<HH", 6, 0)),
        (257, 3, 1, struct.pack("<HH", 1, 0)),
        (258, 3, 1, struct.pack("<HH", 16, 0)),
        (262, 3, 1, struct.pack("<HH", 1, 0)),
        (273, 4, 1, struct.pack("<I", base)),
        (279, 4, 1, struct.pack("<I", 12)),
    ]
    w, h, c, px = decode_tiff(_hand_tiff(tags, vals.tobytes()))
    assert (w, h, c) == (6, 1, 1)
    assert px[0, :, 0].tolist() == [0, 0, 0, 1, 255, 168]  # top bytes


def test_rejects_are_clear():
    px = np.zeros((8, 8), np.uint8)
    blob = bytearray(encode_tiff(px))
    # flip compression tag (259) to CCITT G4 (4)
    i = blob.index(struct.pack("<HH", 259, 3))
    struct.pack_into("<H", blob, i + 8, 4)
    with pytest.raises(ValueError, match="CCITT"):
        decode_tiff(bytes(blob))
    # planar configuration 2
    blob = bytearray(encode_tiff(px))
    i = blob.index(struct.pack("<H", 277))
    # append a planar tag is awkward; patch samples-per-pixel tag id
    # into planar config id with value 2 instead
    struct.pack_into("<H", blob, i, 284)
    struct.pack_into("<H", blob, i + 8, 2)
    with pytest.raises(ValueError, match="planar"):
        decode_tiff(bytes(blob))
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"ZZZZ not a tiff")
    with pytest.raises(ValueError):
        decode_tiff(encode_tiff(px)[:30])  # truncated


def test_dispatch_and_sniff():
    from riko_spark.functions.imagecodec import decode_image
    from riko_spark.operators.multimodal import sniff_media_type

    px = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 251
    for be in (False, True):
        blob = encode_tiff(px.astype(np.uint8), "lzw", big_endian=be)
        assert sniff_media_type(blob) == "image/tiff"
        w, h, c, got = decode_image(blob)
        assert (w, h, c) == (8, 8, 1)
        assert np.array_equal(got[:, :, 0], px)


def test_media_metadata_op_tiff(spark):
    from riko_spark.operators.multimodal import media_metadata_op

    blob_le = encode_tiff(np.zeros((4, 4), np.uint8))
    blob_be = encode_tiff(np.zeros((4, 4), np.uint8), big_endian=True)
    df = spark.createDataFrame(
        [(1, bytearray(blob_le)), (2, bytearray(blob_be))],
        "id long, blob binary")
    rows = {r["id"]: r["media_type"]
            for r in media_metadata_op(df).collect()}
    assert rows == {1: "image/tiff", 2: "image/tiff"}

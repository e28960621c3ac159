"""GIF decoder: hand-packed LZW code streams (independent bit packer
and hand-traced dictionary semantics — NOT encoder round-trips) plus
container/compositing behavior and the Spark image ops end-to-end."""

import struct

import numpy as np
import pytest

from riko_spark.functions.gifcodec import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
    lzw_decode,
)


def _pack_codes(codes):
    """LSB-first variable-width bit packing, written independently of
    the codec's packer: ``codes`` is (code, width) pairs."""
    bits = []
    for code, width in codes:
        bits.extend((code >> i) & 1 for i in range(width))
    out = bytearray()
    for off in range(0, len(bits), 8):
        byte = 0
        for i, b in enumerate(bits[off: off + 8]):
            byte |= b << i
        out.append(byte)
    return bytes(out)


def _gif_with_stream(w, h, palette, min_code, stream, interlace=False,
                     magic=b"GIF89a"):
    """Minimal single-frame GIF wrapping a raw LZW byte stream."""
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[:n] = palette
    out = bytearray(magic)
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += table.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                       0x40 if interlace else 0)
    out.append(min_code)
    for off in range(0, len(stream), 255):
        blk = stream[off: off + 255]
        out.append(len(blk))
        out += blk
    out += b"\x00\x3b"
    return bytes(out)


def test_lzw_hand_packed_width_growth():
    """Width must grow from 3 to 4 bits exactly when the decoder's
    table reaches 8 entries (after the third post-clear code) — the
    classic off-by-one in GIF LZW.  Codes hand-packed, output
    hand-traced."""
    codes = [(4, 3), (0, 3), (1, 3), (2, 3),  # clear, then 3 literals
             (3, 4), (0, 4), (5, 4)]          # growth point, literal, end
    got = lzw_decode(_pack_codes(codes), 2, 100)
    assert got.tolist() == [0, 1, 2, 3, 0]


def test_lzw_hand_packed_kwkwk():
    """The self-referencing code (== next unassigned entry): CLEAR, 1,
    then code 6 which doesn't exist yet -> prev + prev[0] = [1, 1]."""
    codes = [(4, 3), (1, 3), (6, 3), (5, 3)]
    got = lzw_decode(_pack_codes(codes), 2, 100)
    assert got.tolist() == [1, 1, 1]


def test_lzw_hand_packed_dictionary_reuse():
    """A later code referencing an earlier multi-byte entry: clear, 0,
    1, then 6 (the entry built from 0+1 -> [0, 1])."""
    codes = [(4, 3), (0, 3), (1, 3), (6, 3), (5, 4)]
    # after code '1', table[6] = [0, 1]; after code 6 table grows to 8
    # so END is read at 4 bits
    got = lzw_decode(_pack_codes(codes), 2, 100)
    assert got.tolist() == [0, 1, 0, 1]


def test_lzw_mid_stream_clear_resets_width():
    """CLEAR inside the stream drops the table back to literals and
    the width back to min+1."""
    codes = [(4, 3), (0, 3), (1, 3), (2, 3),
             (4, 4),            # clear read at the grown width
             (3, 3), (5, 3)]    # ... then back to 3 bits
    got = lzw_decode(_pack_codes(codes), 2, 100)
    assert got.tolist() == [0, 1, 2, 3]


def test_lzw_errors():
    with pytest.raises(ValueError, match="before any output"):
        lzw_decode(_pack_codes([(4, 3), (7, 3)]), 2, 10)
    with pytest.raises(ValueError, match="out of range"):
        lzw_decode(_pack_codes([(4, 3), (0, 3), (7, 3)]), 2, 10)
    with pytest.raises(ValueError, match="ended before end code"):
        lzw_decode(_pack_codes([(4, 3), (0, 3)]), 2, 10)
    with pytest.raises(ValueError, match="min code size"):
        lzw_decode(b"", 1, 10)


def test_gif_hand_built_decode():
    """Container walk + palette expansion on a hand-built GIF whose
    LZW stream is the hand-packed literal sequence."""
    palette = np.array([[10, 20, 30], [200, 0, 50], [0, 0, 0],
                        [255, 255, 255]], np.uint8)
    # 2x2 image, indices [0, 1, 3, 2] as pure literals
    codes = [(4, 3), (0, 3), (1, 3), (3, 3), (2, 4), (5, 4)]
    gif = _gif_with_stream(2, 2, palette, 2, _pack_codes(codes))
    w, h, c, px = decode_gif(gif)
    assert (w, h, c) == (2, 2, 3)
    expect = palette[np.array([[0, 1], [3, 2]])]
    np.testing.assert_array_equal(px, expect)
    # GIF87a magic decodes identically
    w, h, c, px87 = decode_gif(
        _gif_with_stream(2, 2, palette, 2, _pack_codes(codes),
                         magic=b"GIF87a"))
    np.testing.assert_array_equal(px87, expect)


def test_gif_interlace_hand_built():
    """Interlaced frame: the test feeds rows in SPEC pass order
    (0,8..; 4,8..; 2,4..; 1,2..) as literals and expects them back in
    screen order."""
    h, w = 9, 1
    palette = np.stack([np.arange(16)] * 3, axis=1).astype(np.uint8) * 16
    img = (np.arange(h * w) % 13).reshape(h, w).astype(np.uint8)
    pass_rows = ([img[r] for r in range(0, h, 8)]
                 + [img[r] for r in range(4, h, 8)]
                 + [img[r] for r in range(2, h, 4)]
                 + [img[r] for r in range(1, h, 2)])
    stream_vals = np.concatenate(pass_rows)
    codes = [(16, 5)] + [(int(v), 5) for v in stream_vals] + [(17, 5)]
    gif = _gif_with_stream(w, h, palette, 4, _pack_codes(codes),
                           interlace=True)
    gw, gh, _c, px = decode_gif(gif)
    assert (gw, gh) == (w, h)
    np.testing.assert_array_equal(px, palette[img])


def test_gif_subframe_background_and_transparency():
    """A 2x2 frame at (1, 1) on a 4x3 screen: background color fills
    the uncovered area; the GCE transparent index shows background
    through inside the frame too."""
    palette = np.array([[9, 9, 9], [100, 110, 120], [5, 6, 7]], np.uint8)
    table = np.zeros((4, 3), np.uint8)
    table[:3] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 3, 0x80 | 1, 2, 0)  # bg index 2
    out += table.tobytes()
    # GCE: transparency on, index 0
    out += b"\x21\xf9\x04" + struct.pack("<BHB", 0x01, 0, 0) + b"\x00"
    out += struct.pack("<BHHHHB", 0x2C, 1, 1, 2, 2, 0)
    # third literal fills the table to 8 -> the fourth reads at 4 bits
    codes = [(4, 3), (1, 3), (0, 3), (0, 3), (1, 4), (5, 4)]
    stream = _pack_codes(codes)
    out.append(2)
    out.append(len(stream))
    out += stream
    out += b"\x00\x3b"
    w, h, c, px = decode_gif(bytes(out))
    assert (w, h, c) == (4, 3, 3)
    bg, fg = palette[2], palette[1]
    expect = np.tile(bg, (3, 4, 1))
    expect[1, 1] = fg   # index 1
    expect[2, 2] = fg   # index 1 (transparent 0s stay background)
    np.testing.assert_array_equal(px, expect)


def test_gif_roundtrip_random_palettes():
    rng = np.random.RandomState(7)
    for (h, w, ncol) in [(1, 1, 1), (5, 7, 4), (16, 16, 250), (33, 9, 17)]:
        pal = rng.randint(0, 256, size=(ncol, 3)).astype(np.uint8)
        img = pal[rng.randint(0, ncol, size=(h, w))]
        for interlace in (False, True):
            gw, gh, c, px = decode_gif(encode_gif(img, interlace=interlace))
            assert (gw, gh, c) == (w, h, 3)
            np.testing.assert_array_equal(px, img)


def test_gif_large_forces_code_growth_roundtrip():
    """Enough distinct 2-pixel contexts to push the dictionary through
    several width increases (and past 4096 on the biggest)."""
    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, size=(80, 90)).astype(np.uint8)
    rgb = np.stack([img, img, img], axis=2)
    _w, _h, _c, px = decode_gif(encode_gif(rgb))
    np.testing.assert_array_equal(px, rgb)


def test_gif_errors_and_dispatch():
    from riko_spark.functions.imagecodec import decode_image

    with pytest.raises(ValueError, match="bad magic"):
        decode_gif(b"GIF90a" + b"\0" * 20)
    pal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    img = pal[np.array([[0, 1], [1, 0]])]
    good = encode_gif(img)
    with pytest.raises(ValueError):
        decode_gif(good[:20])  # truncated mid-stream
    # palette index beyond the declared table
    codes = [(4, 3), (3, 3), (0, 3), (0, 3), (0, 3), (5, 4)]
    bad = _gif_with_stream(2, 2, pal, 2, _pack_codes(codes))
    with pytest.raises(ValueError, match="palette index"):
        decode_gif(bad)
    # dispatch: decode_image recognizes GIF and normalizes errors
    w, h, c, px = decode_image(good)
    assert (w, h, c) == (2, 2, 3)
    np.testing.assert_array_equal(px, img)
    with pytest.raises(ValueError):
        decode_image(b"GIF89a" + b"\x01" * 6)


def test_gif_multi_frame_and_ops(spark):
    """decode_gif_frames exposes every frame; the Spark image ops see
    identical pixels through PNG and GIF containers (cross-format
    dhash equality), and media_metadata sniffs image/gif."""
    from riko_spark.functions.imagecodec import encode_png
    from riko_spark.operators.multimodal import (image_dhash_op,
                                                 media_metadata_op)

    rng = np.random.RandomState(9)
    pal = rng.randint(0, 256, size=(32, 3)).astype(np.uint8)
    img = pal[rng.randint(0, 32, size=(16, 16))]
    gif = encode_gif(img)
    # append a second frame (same size, all index 0) before the trailer
    from riko_spark.functions.gifcodec import lzw_encode
    second = bytearray()
    second += struct.pack("<BHHHHB", 0x2C, 0, 0, 16, 16, 0)
    stream = lzw_encode(np.zeros(256, np.uint8), 5)
    second.append(5)
    for off in range(0, len(stream), 255):
        blk = stream[off: off + 255]
        second.append(len(blk))
        second += blk
    second.append(0)
    two = gif[:-1] + bytes(second) + b"\x3b"
    sw, sh, _bg, frames = decode_gif_frames(two)
    assert (sw, sh, len(frames)) == (16, 16, 2)
    f_left, f_top, f_pal, _ft, f_idx, _disp = frames[0]
    assert (f_left, f_top) == (0, 0)
    np.testing.assert_array_equal(f_pal[f_idx], img)
    # first-frame semantics: the composite equals frame 0
    _w, _h, _c, px = decode_gif(two)
    np.testing.assert_array_equal(px, img)

    rows = [(1, bytearray(encode_png(img))), (2, bytearray(gif))]
    df = spark.createDataFrame(rows, "id long, blob binary")
    hashes = {r["id"]: r["dhash"] for r in image_dhash_op(df).collect()}
    assert hashes[1] == hashes[2]
    types = {r["id"]: r["media_type"]
             for r in media_metadata_op(df).collect()}
    assert types == {1: "image/png", 2: "image/gif"}


def test_gif_animation_disposal_semantics():
    """composite_gif_frames vs an INDEPENDENT numpy re-implementation
    of the spec's animation model: overlay + transparency show-through,
    disposal 1 (leave), 2 (restore background), 3 (restore previous) —
    all four in one stream, partial frames at offsets."""
    from riko_spark.functions.gifcodec import (composite_gif_frames,
                                               encode_gif_animated)

    rng = np.random.RandomState(3)
    sw, sh = 20, 14
    bg = (7, 7, 7)

    def rnd(h, w):
        return (rng.randint(0, 6, size=(h, w, 3)) * 40).astype(np.uint8)

    tc = (255, 0, 255)
    f0 = rnd(sh, sw)
    f1 = rnd(8, 10)
    f1[rng.rand(8, 10) < 0.3] = tc
    f2 = rnd(5, 6)
    f3 = rnd(4, 4)
    frames = [(0, 0, f0, 1), (3, 2, f1, 1), (6, 5, f2, 2), (1, 1, f3, 3)]
    blob = encode_gif_animated(frames, (sw, sh), background=bg,
                               transparent_color=tc)

    canvas = np.empty((sh, sw, 3), np.uint8)
    canvas[:, :] = bg
    expected = []
    for left, top, px, disp in frames:
        fh, fw = px.shape[:2]
        saved = canvas[top:top + fh, left:left + fw].copy() \
            if disp == 3 else None
        region = canvas[top:top + fh, left:left + fw]
        keep = ~np.all(px == np.array(tc, np.uint8), axis=2)
        region[keep] = px[keep]
        expected.append(canvas.copy())
        if disp == 2:
            canvas[top:top + fh, left:left + fw] = bg
        elif disp == 3:
            canvas[top:top + fh, left:left + fw] = saved

    w2, h2, got = composite_gif_frames(blob)
    assert (w2, h2, len(got)) == (sw, sh, 4)
    for g, e in zip(got, expected):
        np.testing.assert_array_equal(g, e)

    # first-frame still semantics match frame 0's composite
    _w, _h, _c, still = decode_gif(blob)
    np.testing.assert_array_equal(still, expected[0])
    # disposal methods and transparency survive the container round-trip
    _sw, _sh, _bg, raw = decode_gif_frames(blob)
    assert [f[5] for f in raw] == [1, 1, 2, 3]
    assert raw[1][3] is not None and raw[0][3] is None


def test_gif_video_ops(spark):
    """Animated GIFs through the Spark video ops: video_frames emits
    per-frame composited pixel sums matching the numpy composite, and
    frame_sample emits standalone PNGs that decode back to the exact
    composited frames (the video -> frames -> image pipeline shape)."""
    from riko_spark.functions.gifcodec import (composite_gif_frames,
                                               encode_gif_animated)
    from riko_spark.functions.imagecodec import decode_png
    from riko_spark.operators.multimodal import (frame_sample_op,
                                                 video_frames_op)

    rng = np.random.RandomState(11)
    tc = (255, 0, 255)
    frames = []
    for f in range(5):
        px = (rng.randint(0, 6, size=(6, 9, 3)) * 40).astype(np.uint8)
        if f % 2:
            px[rng.rand(6, 9) < 0.4] = tc
        frames.append((1 if f else 0, 1 if f else 0,
                       px if f else (rng.randint(0, 6, size=(8, 11, 3))
                                     * 40).astype(np.uint8), f % 4))
    blob = encode_gif_animated(frames, (11, 8), transparent_color=tc)
    _w, _h, comp = composite_gif_frames(blob)

    df = spark.createDataFrame([(1, bytearray(blob))],
                               "id long, blob binary")
    rows = video_frames_op(df, {"every": 2, "max_frames": 8}).collect()
    assert [(r["frame_idx"], r["width"], r["height"]) for r in rows] \
        == [(0, 11, 8), (2, 11, 8), (4, 11, 8)]
    for r in rows:
        assert r["px_sum"] == int(comp[r["frame_idx"]].sum(dtype=np.int64))

    samples = frame_sample_op(df, {"every": 2, "max_frames": 8}).collect()
    assert [r["frame_idx"] for r in samples] == [0, 2, 4]
    for r in samples:
        w, h, c, px = decode_png(bytes(r["frame"]))
        assert (w, h, c) == (11, 8, 3)
        np.testing.assert_array_equal(px, comp[r["frame_idx"]])

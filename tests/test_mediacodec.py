"""Real media kernels: PNG/BMP decode against hand-assembled files
(independent filter application, not the encoder), WAV decode against
hand-packed RIFF bytes, and the Spark ops end-to-end."""

import struct
import zlib

import numpy as np
import pytest

from riko_spark.functions.imagecodec import (
    PNG_MAGIC,
    decode_bmp,
    decode_image,
    decode_png,
    encode_bmp,
    encode_png,
)
from riko_spark.functions.wavcodec import decode_wav, encode_wav


def _chunk(tag, body):
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _hand_png(px, filters):
    """Build a PNG with per-row filter types applied by PLAIN PYTHON
    loops — an independent implementation of the spec's filter math, so
    decoder tests aren't encoder round-trips."""
    h, w, c = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = bytearray()
    flat = px.reshape(h, w * c).astype(int)
    for y, ft in zip(range(h), filters):
        raw.append(ft)
        for i in range(w * c):
            x = flat[y][i]
            a = flat[y][i - c] if i >= c else 0
            b = flat[y - 1][i] if y > 0 else 0
            cc = flat[y - 1][i - c] if (y > 0 and i >= c) else 0
            if ft == 0:
                v = x
            elif ft == 1:
                v = x - a
            elif ft == 2:
                v = x - b
            elif ft == 3:
                v = x - (a + b) // 2
            elif ft == 4:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                v = x - pred
            raw.append(v % 256)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (PNG_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def _px(h, w, c, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, c)).astype(np.uint8)


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_png_decode_all_filters_hand_built(c):
    px = _px(5, 7, c, seed=c)
    data = _hand_png(px, filters=[0, 1, 2, 3, 4])
    w, h, ch, got = decode_png(data)
    assert (w, h, ch) == (7, 5, c)
    np.testing.assert_array_equal(got, px)


def test_png_decode_split_idat_and_ancillary_chunks():
    px = _px(4, 4, 3, seed=9)
    base = _hand_png(px, filters=[4, 4, 4, 4])
    # re-split the IDAT into two chunks with a tEXt chunk between them
    body = zlib.compress(bytes(bytearray(_rows_filtered(px))))
    rebuilt = (PNG_MAGIC
               + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
               + _chunk(b"IDAT", body[:10])
               + _chunk(b"tEXt", b"Comment\0hand built")
               + _chunk(b"IDAT", body[10:])
               + _chunk(b"IEND", b""))
    assert decode_png(rebuilt)[3].shape == (4, 4, 3)
    np.testing.assert_array_equal(decode_png(rebuilt)[3], px)
    np.testing.assert_array_equal(decode_png(base)[3], px)


def _rows_filtered(px):
    h, w, c = px.shape
    out = bytearray()
    for y in range(h):
        out.append(0)
        out.extend(px[y].reshape(-1).tobytes())
    return out


def test_png_roundtrip_every_encoder_filter():
    px = _px(6, 8, 4, seed=3)
    for ft in range(5):
        w, h, c, got = decode_png(encode_png(px, filter_type=ft))
        assert (w, h, c) == (8, 6, 4)
        np.testing.assert_array_equal(got, px)


def test_png_rejects_what_it_cannot_decode():
    with pytest.raises(ValueError, match="magic"):
        decode_png(b"JFIF not a png")
    px = _px(2, 2, 3)
    data = bytearray(encode_png(px))
    # flip IHDR bit depth to 16 (offset: 8 magic + 8 len/tag + 8 w/h)
    data[24] = 16
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(bytes(data))
    data = bytearray(encode_png(px))
    data[25] = 5  # invalid color type
    with pytest.raises(ValueError, match="color type"):
        decode_png(bytes(data))


def test_bmp_decode_hand_built_24bit_padding():
    """3×2 24-bit BMP packed by hand: bottom-up rows, BGR order, rows
    padded to 4 bytes (3*3=9 -> 12)."""
    px = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   [[10, 20, 30], [40, 50, 60], [70, 80, 90]]], dtype=np.uint8)
    rows = b""
    for y in (1, 0):  # bottom-up
        r = b"".join(bytes([px[y, x, 2], px[y, x, 1], px[y, x, 0]])
                     for x in range(3))
        rows += r + b"\0" * 3
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0, len(rows),
                       0, 0, 0, 0)
    w, h, c, got = decode_bmp(hdr + info + rows)
    assert (w, h, c) == (3, 2, 3)
    np.testing.assert_array_equal(got, px)


def test_bmp_top_down_and_32bit():
    px = _px(2, 2, 4, seed=5)
    rows = b""
    for y in (0, 1):  # top-down: negative height, natural order
        rows += b"".join(bytes([px[y, x, 2], px[y, x, 1], px[y, x, 0],
                                px[y, x, 3]]) for x in range(2))
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 32, 0, len(rows),
                       0, 0, 0, 0)
    w, h, c, got = decode_bmp(hdr + info + rows)
    assert (w, h, c) == (2, 2, 4)
    np.testing.assert_array_equal(got, px)


def test_bmp_roundtrip_and_dispatch():
    px = _px(5, 3, 3, seed=7)
    data = encode_bmp(px)
    np.testing.assert_array_equal(decode_bmp(data)[3], px)
    assert decode_image(data)[:3] == (3, 5, 3)
    assert decode_image(encode_png(px))[:3] == (3, 5, 3)
    with pytest.raises(ValueError, match="unsupported image format"):
        decode_image(b"TIFFII* not a supported format")
    # JPEG SOI / GIF magics now dispatch into the real decoders, which
    # raise their own diagnostics for a truncated/garbage stream
    with pytest.raises(ValueError, match="JPEG"):
        decode_image(b"\xff\xd8\xffJPEG...")
    with pytest.raises(ValueError, match="GIF"):
        decode_image(b"GIF89a not a real gif")


def test_wav_decode_hand_built_with_list_chunk():
    """Hand-packed RIFF: fmt, a LIST chunk the walker must skip (odd
    size -> pad byte), then data.  16-bit stereo."""
    frames = np.array([[100, -100], [2000, -2000], [32767, -32768]],
                      dtype="<i2")
    data = frames.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    lst = b"INFOods"  # 7 bytes -> odd, needs pad
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"LIST" + struct.pack("<I", len(lst)) + lst + b"\0"
            + b"data" + struct.pack("<I", len(data)) + data)
    rate, ch, got = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert (rate, ch) == (8000, 2)
    np.testing.assert_array_equal(got, frames)


def test_wav_8bit_and_extensible():
    # 8-bit unsigned PCM recentres around 128
    raw = bytes([128, 129, 127, 255, 0])
    fmt = struct.pack("<HHIIHH", 1, 1, 4000, 4000, 1, 8)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    rate, ch, got = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert (rate, ch) == (4000, 1)
    np.testing.assert_array_equal(
        got[:, 0], (np.array([0, 1, -1, 127, -128], dtype=np.int16) << 8))

    # WAVE_FORMAT_EXTENSIBLE with PCM GUID decodes; non-PCM GUID raises
    frames = np.array([1, 2, 3], dtype="<i2")
    guid_pcm = b"\x01\x00\x00\x00" + b"\x00" * 12
    ext = struct.pack("<HHIIHHHHI", 0xFFFE, 1, 8000, 16000, 2, 16, 22,
                      16, 0x4) + guid_pcm
    body = (b"WAVEfmt " + struct.pack("<I", len(ext)) + ext
            + b"data" + struct.pack("<I", 6) + frames.tobytes())
    assert decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)[0] == 8000

    bad = bytearray(ext)
    bad[24] = 2  # ADPCM subformat
    body = (b"WAVEfmt " + struct.pack("<I", len(bad)) + bytes(bad)
            + b"data" + struct.pack("<I", 6) + frames.tobytes())
    with pytest.raises(ValueError, match="neither PCM nor IEEE float"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_wav_roundtrip_and_rejects():
    rng = np.random.RandomState(11)
    frames = rng.randint(-32768, 32767, size=(500, 2)).astype("<i2")
    rate, ch, got = decode_wav(encode_wav(frames, 16000))
    assert (rate, ch) == (16000, 2)
    np.testing.assert_array_equal(got, frames)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"ID3\x03mp3 junk padding padding")


# ------------------------------------------------------- Spark ops e2e

def test_image_features_op_real_decode(spark):
    from riko_spark.operators.multimodal import image_features_op

    px_a = np.full((8, 8, 1), 100, dtype=np.uint8)  # gray PNG
    px_b = _px(4, 4, 3, seed=2)  # RGB BMP
    rows = [(1, bytearray(encode_png(px_a))),
            (2, bytearray(encode_bmp(px_b))),
            (3, bytearray(b"\xff\xd8\xffJPEG"))]
    df = spark.createDataFrame(rows, "id long, blob binary")
    out = {r["id"]: r for r in image_features_op(df).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["channels"]) == (8, 8, 1)
    assert all(abs(f - 100 / 255) < 1e-6 for f in out[1]["feature"])
    assert (out[2]["width"], out[2]["height"], out[2]["channels"]) == (4, 4, 3)
    exp = px_b.mean(axis=2)  # 4x4 -> each grid cell is one pixel
    got = np.array(out[2]["feature"]).reshape(4, 4)
    np.testing.assert_allclose(got, exp / 255.0, atol=1e-6)
    assert out[3]["channels"] == 0  # stub fallback marks synthetic rows

    skipped = image_features_op(df, {"on_undecodable": "skip"}).collect()
    assert sorted(r["id"] for r in skipped) == [1, 2]


def test_audio_features_op_windows(spark):
    from riko_spark.operators.multimodal import audio_features_op

    frames = np.arange(-1200, 1200, dtype=np.int16).reshape(-1, 2)  # 1200 frames
    blob = bytearray(encode_wav(frames, 8000))
    df = spark.createDataFrame([(7, blob)], "id long, blob binary")
    rows = sorted(audio_features_op(df, {"window_frames": 500}).collect(),
                  key=lambda r: r["win_idx"])
    assert len(rows) == 3  # 500 + 500 + 200
    assert [r["win_frames"] for r in rows] == [500, 500, 200]
    r0 = rows[0]
    assert (r0["sample_rate"], r0["channels"], r0["n_frames"]) == (8000, 2, 1200)
    assert r0["duration_ms"] == 150
    sq = frames.astype(np.int64) ** 2
    for r, (lo, hi) in zip(rows, [(0, 500), (500, 1000), (1000, 1200)]):
        assert r["win_sumsq"] == int(sq[lo:hi].sum())
        assert abs(r["win_rms"] - float(np.sqrt(r["win_sumsq"] / ((hi - lo) * 2)))) < 1e-3


def test_png_palette_decode():
    """Color type 3 (indexed): PLTE lookup, hand-built file."""
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])  # 4 entries
    idx = np.array([[0, 1], [2, 3], [3, 0]], dtype=np.uint8)  # 2x3
    raw = bytearray()
    for row in idx:
        raw.append(0)
        raw.extend(row.tobytes())
    data = (PNG_MAGIC
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 3, 8, 3, 0, 0, 0))
            + _chunk(b"PLTE", plte)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))
    w, h, c, got = decode_png(data)
    assert (w, h, c) == (2, 3, 3)
    exp = np.array(np.frombuffer(plte, dtype=np.uint8).reshape(4, 3))[idx]
    np.testing.assert_array_equal(got, exp)

    # out-of-range index is a hard error, not silent black
    bad_raw = bytearray()
    for row in (idx + 10):
        bad_raw.append(0)
        bad_raw.extend(row.tobytes())
    bad = (PNG_MAGIC
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 3, 8, 3, 0, 0, 0))
           + _chunk(b"PLTE", plte)
           + _chunk(b"IDAT", zlib.compress(bytes(bad_raw)))
           + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="palette index"):
        decode_png(bad)
    # palette image without PLTE
    noplte = (PNG_MAGIC
              + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 3, 8, 3, 0, 0, 0))
              + _chunk(b"IDAT", zlib.compress(bytes(raw)))
              + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(noplte)


def test_image_features_corrupt_blob_falls_back_not_aborts(spark):
    """Review regression: a text blob that happens to start with 'BM'
    (or a PNG with corrupt IDAT) must hit the on_undecodable handler —
    struct/zlib errors normalize to ValueError inside decode_image
    instead of aborting the whole job."""
    from riko_spark.functions.imagecodec import decode_image
    from riko_spark.operators.multimodal import image_features_op

    ok_png = encode_png(_px(4, 4, 1, seed=1))
    corrupt_png = bytearray(ok_png)
    corrupt_png[40] ^= 0xFF  # stomp IDAT -> zlib error
    rows = [(1, bytearray(b"BM plain text that is not a bitmap")),
            (2, corrupt_png),
            (3, bytearray(ok_png))]
    for blob in (bytes(rows[0][1]), bytes(rows[1][1])):
        with pytest.raises(ValueError):
            decode_image(blob)
    df = spark.createDataFrame(rows, "id long, blob binary")
    out = {r["id"]: r for r in image_features_op(df).collect()}
    assert out[1]["channels"] == 0 and out[2]["channels"] == 0  # stubbed
    assert out[3]["channels"] == 1  # real decode still works
    skipped = image_features_op(df, {"on_undecodable": "skip"}).collect()
    assert [r["id"] for r in skipped] == [3]


def test_audio_features_zero_frame_wav_emits_no_rows(spark):
    """Review regression: an empty data chunk yields ceil(0/w)=0 rows,
    never a fabricated 0.0-loudness window."""
    from riko_spark.operators.multimodal import audio_features_op

    empty = encode_wav(np.zeros((0, 1), dtype=np.int16), 8000)
    real = encode_wav(np.ones((10, 1), dtype=np.int16) * 3, 8000)
    df = spark.createDataFrame(
        [(1, bytearray(empty)), (2, bytearray(real))], "id long, blob binary")
    rows = audio_features_op(df, {"window_frames": 4}).collect()
    assert sorted(r["id"] for r in rows) == [2, 2, 2]  # 4+4+2 frames
    assert all(r["win_sumsq"] in (36, 18) for r in rows)


def test_sniff_media_type_riff_forms():
    from riko_spark.operators.multimodal import sniff_media_type

    assert sniff_media_type(b"RIFF\x10\x00\x00\x00WAVEfmt ") == "audio/wav"
    assert sniff_media_type(b"RIFF\x10\x00\x00\x00AVI LIST") == "video/avi"
    assert sniff_media_type(b"RIFF\x10\x00\x00\x00WEBPVP8 ") == "image/webp"
    assert sniff_media_type(b"RIFF\x10\x00\x00\x00JUNK") == "application/riff"
    assert sniff_media_type(b"\x89PNGxxxx") == "image/png"


# ------------------------------------------------------------ AVI video

def _hand_avi(frames_px):
    """Hand-assemble a minimal AVI (independent of encode_avi): RIFF
    'AVI ' + LIST hdrl(avih + LIST strl(strh+strf)) + LIST movi with
    one raw-DIB '00db' chunk per frame."""
    import numpy as _np

    h, w, _c = frames_px[0].shape
    row_len = (w * 3 + 3) & ~3

    def ch(tag, body):
        pad = b"\0" if len(body) % 2 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def li(form, body):
        return ch(b"LIST", form + body)

    avih = struct.pack("<IIIIIIIIIIIIII", 40000, 0, 0, 0x10,
                       len(frames_px), 0, 1, row_len * h, w, h, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"vids", b"DIB ", 0, 0, 0,
                       0, 1, 25, 0, len(frames_px), row_len * h, 0, 0,
                       0, 0, w, h)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, row_len * h,
                       0, 0, 0, 0)
    movi_body = b""
    for px in frames_px:
        dib = b""
        for y in range(h - 1, -1, -1):
            dib += bytes(int(px[y, x, 2 - k]) for x in range(w)
                         for k in range(3))
            dib += b"\0" * (row_len - w * 3)
        movi_body += ch(b"00db", dib)
    return ch(b"RIFF", b"AVI "
              + li(b"hdrl", ch(b"avih", avih)
                   + li(b"strl", ch(b"strh", strh) + ch(b"strf", strf)))
              + li(b"movi", movi_body))


def test_avi_decode_hand_built():
    from riko_spark.functions.avicodec import decode_avi_frames

    f0, f1 = _px(3, 5, 3, seed=20), _px(3, 5, 3, seed=21)
    w, h, got = decode_avi_frames(_hand_avi([f0, f1]))
    assert (w, h, len(got)) == (5, 3, 2)
    np.testing.assert_array_equal(got[0], f0)
    np.testing.assert_array_equal(got[1], f1)


def test_avi_roundtrip_and_rejects():
    from riko_spark.functions.avicodec import (decode_avi_frames,
                                               encode_avi)

    frames = [_px(4, 6, 3, seed=s) for s in range(3)]
    w, h, got = decode_avi_frames(encode_avi(frames))
    assert (w, h, len(got)) == (6, 4, 3)
    for a, b in zip(got, frames):
        np.testing.assert_array_equal(a, b)

    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi_frames(b"RIFF\x04\x00\x00\x00WAVE")
    # compressed strf rejected with a clear message
    data = bytearray(encode_avi(frames))
    i = data.index(struct.pack("<IiiHH", 40, 6, 4, 1, 24))
    comp_off = i + 16  # biCompression field inside strf
    data[comp_off:comp_off + 4] = struct.pack("<I", 0x34363248)  # 'H264'
    with pytest.raises(ValueError, match="codec library"):
        decode_avi_frames(bytes(data))
    with pytest.raises(ValueError, match="corrupt|no decodable"):
        decode_avi_frames(b"RIFF\x20\x00\x00\x00AVI " + b"\x01" * 8)


def test_frame_sample_real_avi_and_stub_fallback(spark):
    from riko_spark.operators.multimodal import frame_sample_op

    from riko_spark.functions.avicodec import encode_avi

    frames = [np.full((2, 2, 3), 10 * i, dtype=np.uint8) for i in range(6)]
    avi = encode_avi(frames)
    rows = [(1, bytearray(avi)), (2, bytearray(b"just text bytes" * 10))]
    df = spark.createDataFrame(rows, "id long, blob binary")
    out = frame_sample_op(df, {"every": 2, "max_frames": 2}).collect()
    real = sorted((r["frame_idx"], bytes(r["frame"])) for r in out
                  if r["id"] == 1)
    # every 2nd frame, capped at 2: frames 0 and 2; DIB payload of a
    # 2x2 constant frame = 2 rows x (6 px bytes + 2 pad)
    assert [i for i, _ in real] == [0, 2]
    assert real[0][1] == bytes([0, 0, 0] * 2 + [0, 0]) * 2
    assert real[1][1] == bytes([20, 20, 20] * 2 + [0, 0]) * 2
    assert any(r["id"] == 2 for r in out)  # stub path still UDTF-shaped


def test_video_frames_op_pixel_sums(spark):
    from riko_spark.functions.avicodec import encode_avi
    from riko_spark.operators.multimodal import video_frames_op

    frames = [_px(3, 4, 3, seed=30 + i) for i in range(5)]
    df = spark.createDataFrame([(9, bytearray(encode_avi(frames)))],
                               "id long, blob binary")
    out = sorted(video_frames_op(df, {"every": 2, "max_frames": 8}).collect(),
                 key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in out] == [0, 2, 4]
    for r in out:
        assert (r["width"], r["height"]) == (4, 3)
        assert r["px_sum"] == int(frames[r["frame_idx"]].astype(np.int64).sum())


def test_png_adam7_interlaced_hand_built():
    """Interlace method 1: the test scatters pixels into the seven
    Adam7 passes itself (independent pass math) with filter 0 rows;
    the decoder must reassemble the original image.  Odd dims exercise
    empty/partial passes."""
    # spec table hard-coded here (PNG spec §8.2), NOT imported from the
    # decoder — a wrong table in the codec cannot self-certify
    adam7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
             (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    for (h, w, c) in [(5, 7, 3), (8, 8, 1), (1, 1, 1), (2, 3, 4), (9, 10, 2)]:
        px = _px(h, w, c, seed=h * 10 + w)
        raw = bytearray()
        for x0, y0, xs, ys in adam7:
            sub = px[y0::ys, x0::xs]
            if sub.size == 0:
                continue
            for row in sub:
                raw.append(0)
                raw.extend(row.reshape(-1).tobytes())
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
        data = (PNG_MAGIC
                + _chunk(b"IHDR",
                         struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1))
                + _chunk(b"IDAT", zlib.compress(bytes(raw)))
                + _chunk(b"IEND", b""))
        got_w, got_h, got_c, got = decode_png(data)
        assert (got_w, got_h, got_c) == (w, h, c)
        np.testing.assert_array_equal(got, px)


def test_image_dhash_properties(spark):
    """dHash: stable across formats for the same pixels, invariant to
    non-clipping brightness shift (gradient signs preserved), differs
    for a different image, and skips undecodable blobs by default."""
    from riko_spark.operators.multimodal import image_dhash_op

    base = _px(16, 16, 1, seed=40).astype(np.int16)
    base = (base // 2 + 30).astype(np.uint8)  # keep +20 shift clip-free
    shifted = (base + 20).astype(np.uint8)
    other = _px(16, 16, 1, seed=41)
    rows = [
        (1, bytearray(encode_png(base))),
        (2, bytearray(encode_bmp(np.repeat(base, 3, axis=2)))),
        (3, bytearray(encode_png(shifted))),
        (4, bytearray(encode_png(other))),
        (5, bytearray(b"\xff\xd8\xffJPEG junk")),
    ]
    df = spark.createDataFrame(rows, "id long, blob binary")
    got = {r["id"]: r["dhash"] for r in image_dhash_op(df).collect()}
    assert 5 not in got  # undecodable skipped
    assert got[1] == got[2]  # same pixels, different container
    assert got[1] == got[3]  # brightness shift invariant
    assert got[1] != got[4]  # different image

    with pytest.raises(Exception):
        image_dhash_op(df, {"on_undecodable": "raise"}).collect()


def test_avi_audio_stream_listed_before_video():
    """Review regression: a spec-valid AVI lists strl(audio) BEFORE
    strl(video); the walk must match strf chunks to their strh fccType
    instead of grabbing the first strf (a 16-byte WAVEFORMATEX) as the
    video format."""
    from riko_spark.functions.avicodec import decode_avi_frames, encode_avi

    frames = [_px(3, 4, 3, seed=50)]
    base = bytearray(encode_avi(frames))

    def ch(tag, body):
        pad = b"\0" if len(body) % 2 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def li(form, body):
        return ch(b"LIST", form + body)

    # audio strl: 'auds' strh + 16-byte WAVEFORMATEX strf (PCM mono)
    astrh = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"auds", b"\0\0\0\0",
                        0, 0, 0, 0, 1, 8000, 0, 100, 0, 0, 2, 0, 0, 0, 0)
    astrf = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    audio_strl = li(b"strl", ch(b"strh", astrh) + ch(b"strf", astrf))
    # splice the audio strl in FRONT of the video strl inside hdrl
    i = bytes(base).index(b"LIST")  # hdrl LIST
    hdrl_len = struct.unpack_from("<I", base, i + 4)[0]
    vid_start = bytes(base).index(b"LIST", i + 8)  # first strl
    patched = (bytes(base[:i + 8])  # up to 'hdrl' form tag end... keep avih
               + bytes(base[i + 8:vid_start])  # avih chunk
               + audio_strl
               + bytes(base[vid_start:]))
    # fix the hdrl LIST length
    patched = bytearray(patched)
    struct.pack_into("<I", patched, i + 4, hdrl_len + len(audio_strl))
    w, h, got = decode_avi_frames(bytes(patched))
    assert (w, h, len(got)) == (4, 3, 1)
    np.testing.assert_array_equal(got[0], frames[0])


def test_jpeg_dims_parse():
    """SOF marker walk on a hand-built JPEG header stream: APP0 +
    comment + DQT-ish filler before SOF0, dims read without any pixel
    decode; progressive SOF2 also parses; DHT (C4) is NOT a frame
    marker."""
    from riko_spark.functions.imagecodec import parse_jpeg_dims

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    app0 = seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    com = seg(0xFE, b"hand built")
    dht = seg(0xC4, b"\x00" + bytes(16) + b"\x01")  # must be skipped
    sof0 = seg(0xC0, struct.pack(">BHHB", 8, 480, 640, 3) + b"\x01\x11\x00" * 3)
    data = b"\xff\xd8" + app0 + com + dht + sof0 + b"\xff\xd9"
    assert parse_jpeg_dims(data) == (640, 480, 3)

    sof2 = seg(0xC2, struct.pack(">BHHB", 8, 33, 77, 1) + b"\x01\x11\x00")
    assert parse_jpeg_dims(b"\xff\xd8" + sof2) == (77, 33, 1)

    with pytest.raises(ValueError, match="SOI"):
        parse_jpeg_dims(b"\x89PNG")
    with pytest.raises(ValueError, match="no SOF"):
        parse_jpeg_dims(b"\xff\xd8" + app0 + b"\xff\xd9")


def test_image_features_jpeg_real_dims_stub_features(spark):
    from riko_spark.operators.multimodal import image_features_op

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    jpeg = (b"\xff\xd8"
            + seg(0xC0, struct.pack(">BHHB", 8, 120, 200, 3) + b"\x01\x11\x00" * 3)
            + b"\xff\xd9")
    df = spark.createDataFrame([(1, bytearray(jpeg))], "id long, blob binary")
    (r,) = image_features_op(df).collect()
    assert (r["width"], r["height"]) == (200, 120)  # REAL header dims
    assert r["channels"] == 0  # features remain marked synthetic
    assert len(r["feature"]) == 16


def test_image_neardup_planted_recall_and_parity(spark):
    """image_neardup (dHash -> banded self-join -> exact hamming) must
    find every planted one-pixel-edit copy pair, and its full output
    must equal a brute-force hamming join over image_dhash_op
    signatures (the banding may only lose pairs with hamming > bands-1,
    which the brute force filters identically)."""
    import numpy as np
    import pandas as pd

    from riko_spark.functions.imagecodec import encode_png
    from riko_spark.operators.multimodal import (image_dhash_op,
                                                 image_neardup_op)

    rows = []
    rng = np.random.RandomState(42)
    for i in range(12):
        w, h = 8 + 4 * (i % 4), 8 + 4 * ((i * 3 + 1) % 4)
        v = ((np.add.outer(5 * np.arange(h), 3 * np.arange(w)) + 17 * i)
             % 251).astype(np.uint8)
        rows.append((i, bytearray(encode_png(v))))
        vc = v.copy()
        vc[0, 0] = (int(vc[0, 0]) + 7) % 251  # one-pixel near dup
        rows.append((100 + i, bytearray(encode_png(vc))))
        noise = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        rows.append((200 + i, bytearray(encode_png(noise))))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "blob"]))

    out = {(r.left_id, r.right_id): r.hamming
           for r in image_neardup_op(df).collect()}
    sigs = {r.id: r.dhash for r in image_dhash_op(df).collect()}
    brute = {}
    ids = sorted(sigs)
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            ham = bin((sigs[ids[a]] ^ sigs[ids[b]]) & (2**64 - 1)).count("1")
            if ham <= 7:
                # banding recall is GUARANTEED for hamming <= bands-1
                brute[(ids[a], ids[b])] = ham
    assert out == brute
    for i in range(12):  # every planted copy pair is found
        assert (i, 100 + i) in out, f"missed planted pair {i}"


# ------------------------------------------------------------ MJPEG AVI

def _mjpeg_gray_frames(n, bh=2, bw=3, seed=60):
    """Block-constant 8x8-tiled gray frames — the ones-quant JPEG
    round trip is EXACT for these (only the integer DC survives), so
    MJPEG AVI assertions stay integer-exact like the DIB ones."""
    rng = np.random.RandomState(seed)
    return [np.repeat(np.repeat(
        rng.randint(0, 256, size=(bh, bw)).astype(np.uint8), 8, 0), 8, 1)
        for _ in range(n)]


def test_avi_mjpeg_roundtrip_gray_exact():
    from riko_spark.functions.avicodec import (avi_frame_payloads,
                                               decode_avi_frames,
                                               encode_avi)

    frames = _mjpeg_gray_frames(3)
    avi = encode_avi(frames, codec="mjpg")
    w, h, bpp, codec, payloads = avi_frame_payloads(avi)
    assert (w, h, codec, len(payloads)) == (24, 16, "mjpg", 3)
    for p in payloads:  # each chunk is a standalone SOI..EOI JPEG
        assert p[:2] == b"\xff\xd8" and p[-2:] == b"\xff\xd9"
    gw, gh, got = decode_avi_frames(avi)
    assert (gw, gh, len(got)) == (24, 16, 3)
    for a, b in zip(got, frames):
        assert a.shape == (16, 24, 1)
        np.testing.assert_array_equal(a[:, :, 0], b)


def test_avi_mjpeg_rgb_exact_and_dim_mismatch():
    from riko_spark.functions.avicodec import (decode_avi_frames,
                                               decode_frame_payload,
                                               encode_avi)
    from riko_spark.functions.jpegcodec import encode_jpeg

    # R=G=B block-constant: Y==v, Cb==Cr==128 -> bit-exact round trip
    rng = np.random.RandomState(61)
    bv = rng.randint(0, 251, size=(2, 2)).astype(np.uint8)
    g = np.repeat(np.repeat(bv, 8, 0), 8, 1)
    frames = [np.stack([g, g, g], axis=2), np.stack([g.T, g.T, g.T], axis=2).transpose(1, 0, 2)]
    w, h, got = decode_avi_frames(encode_avi(frames, codec="mjpg"))
    assert (w, h, len(got)) == (16, 16, 2)
    np.testing.assert_array_equal(got[0], frames[0])

    # a frame whose own SOF dims disagree with the container strf raises
    wrong = encode_jpeg(np.zeros((8, 8), np.uint8))
    with pytest.raises(ValueError, match="container strf"):
        decode_frame_payload(wrong, 16, 16, 24, "mjpg")


def test_avi_mjpeg_dib_backcompat_rejects():
    """avi_dib_payloads is the raw-DIB-only compatibility surface: an
    MJPEG stream must raise there, not hand back JPEG bytes as DIBs."""
    from riko_spark.functions.avicodec import avi_dib_payloads, encode_avi

    avi = encode_avi(_mjpeg_gray_frames(2), codec="mjpg")
    with pytest.raises(ValueError, match="raw DIB"):
        avi_dib_payloads(avi)


def test_video_frames_op_mjpeg_pixel_sums(spark):
    from riko_spark.functions.avicodec import encode_avi
    from riko_spark.operators.multimodal import video_frames_op

    frames = _mjpeg_gray_frames(5, seed=62)
    df = spark.createDataFrame([(7, bytearray(encode_avi(frames,
                                                         codec="mjpg")))],
                               "id long, blob binary")
    out = sorted(video_frames_op(df, {"every": 2, "max_frames": 8}).collect(),
                 key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in out] == [0, 2, 4]
    for r in out:
        assert (r["width"], r["height"]) == (24, 16)
        # gray MJPEG decodes to one channel: sum == planted pixel sum
        assert r["px_sum"] == int(frames[r["frame_idx"]].astype(np.int64).sum())


def test_video_frames_op_mjpeg_corrupt_frame_skips(spark):
    """One zeroed-out '00dc' chunk body drops that frame in skip mode
    (the rest of the blob still decodes) and aborts in raise mode."""
    from riko_spark.functions.avicodec import encode_avi
    from riko_spark.operators.multimodal import video_frames_op

    frames = _mjpeg_gray_frames(3, seed=63)
    avi = bytearray(encode_avi(frames, codec="mjpg"))
    # find the SECOND frame chunk and zero its body in place
    first = bytes(avi).index(b"00dc")
    second = bytes(avi).index(b"00dc", first + 4)
    (ln,) = struct.unpack_from("<I", avi, second + 4)
    avi[second + 8: second + 8 + ln] = b"\0" * ln
    df = spark.createDataFrame([(1, bytearray(avi))], "id long, blob binary")
    out = sorted(video_frames_op(df, {"every": 1, "max_frames": 8}).collect(),
                 key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in out] == [0, 2]
    for r in out:
        assert r["px_sum"] == int(frames[r["frame_idx"]].astype(np.int64).sum())
    with pytest.raises(Exception):
        video_frames_op(df, {"every": 1, "on_undecodable": "raise"}).collect()


def test_frame_sample_mjpeg_payloads(spark):
    """frame_sample forwards the sampled '00dc' payloads verbatim —
    each emitted frame is a standalone baseline JPEG."""
    from riko_spark.functions.avicodec import encode_avi
    from riko_spark.operators.multimodal import frame_sample_op

    frames = _mjpeg_gray_frames(6, seed=64)
    df = spark.createDataFrame(
        [(1, bytearray(encode_avi(frames, codec="mjpg")))],
        "id long, blob binary")
    out = sorted(frame_sample_op(df, {"every": 3, "max_frames": 2}).collect(),
                 key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in out] == [0, 3]
    from riko_spark.functions.jpegcodec import decode_jpeg
    for r in out:
        w, h, c, px = decode_jpeg(bytes(r["frame"]))
        assert (w, h, c) == (24, 16, 1)
        np.testing.assert_array_equal(px[:, :, 0], frames[r["frame_idx"]])


# ------------------------------------------------------------ G.711 WAV

def _g711_expand_scalar(code, law):
    """Independent per-sample G.711 expansion written from the ITU
    spec text (segmented companding), NOT the codec's vectorized
    table build — loop/branch structure, no numpy."""
    if law == "ulaw":
        u = (~code) & 0xFF
        seg = (u >> 4) & 0x07
        quant = u & 0x0F
        mag = (((quant << 3) + 0x84) << seg) - 0x84
        return -mag if u & 0x80 else mag
    a = code ^ 0x55
    seg = (a >> 4) & 0x07
    quant = a & 0x0F
    if seg == 0:
        mag = (quant << 4) + 8
    elif seg == 1:
        mag = (quant << 4) + 0x108
    else:
        mag = ((quant << 4) + 0x108) << (seg - 1)
    return mag if a & 0x80 else -mag


def test_g711_tables_spec_values_and_full_sweep():
    from riko_spark.functions.wavcodec import _ALAW_TABLE, _ULAW_TABLE

    # spec-pinned spot values (G.711 tables 1a/2a endpoints)
    assert _ULAW_TABLE[0x00] == -32124 and _ULAW_TABLE[0x80] == 32124
    assert _ULAW_TABLE[0xFF] == 0 and _ULAW_TABLE[0x7F] == 0
    assert _ALAW_TABLE[0x55] == -8 and _ALAW_TABLE[0xD5] == 8
    assert _ALAW_TABLE[0x2A] == -32256 and _ALAW_TABLE[0xAA] == 32256
    # full 256-code sweep against the independent scalar expansion
    for c in range(256):
        assert _ULAW_TABLE[c] == _g711_expand_scalar(c, "ulaw"), hex(c)
        assert _ALAW_TABLE[c] == _g711_expand_scalar(c, "alaw"), hex(c)
    # each positive half is monotone in code order (companding is
    # order-preserving) and mirrors the negative half exactly
    ut = _ULAW_TABLE.astype(int)
    assert all(ut[0x80 + i] >= ut[0x80 + i + 1] for i in range(127))
    assert all(ut[i] == -ut[0x80 + i] for i in range(128))


def test_g711_wav_decode_roundtrip_and_rejects():
    from riko_spark.functions.wavcodec import decode_wav, encode_wav_g711

    codes = np.array([[0x00, 0xFF], [0x80, 0x7F], [0x9A, 0x2A]], np.uint8)
    rate, ch, s = decode_wav(encode_wav_g711(codes, 8000, "ulaw"))
    assert (rate, ch, s.shape) == (8000, 2, (3, 2))
    expect = [[_g711_expand_scalar(int(c), "ulaw") for c in row]
              for row in codes]
    assert s.tolist() == expect

    rate, ch, s = decode_wav(encode_wav_g711(codes[:, 0], 16000, "alaw"))
    assert (rate, ch) == (16000, 1)
    assert s[:, 0].tolist() == [
        _g711_expand_scalar(int(c), "alaw") for c in codes[:, 0]]

    # G.711 fmt with a non-8 bit depth is corrupt -> clean error
    blob = bytearray(encode_wav_g711(codes[:, 0], 8000, "ulaw"))
    i = bytes(blob).index(b"fmt ")
    struct.pack_into("<H", blob, i + 8 + 14, 16)  # wBitsPerSample
    with pytest.raises(ValueError, match="8-bit"):
        decode_wav(bytes(blob))
    with pytest.raises(ValueError):
        encode_wav_g711(codes, 8000, "g722")


def test_audio_features_g711(spark):
    """audio_features over a µ-law WAV: windowed sum-of-squares of the
    EXPANDED samples, expectation built from the independent scalar
    expansion."""
    from riko_spark.functions.wavcodec import encode_wav_g711
    from riko_spark.operators.multimodal import audio_features_op

    codes = np.array([0x00, 0xFF, 0x80, 0x55, 0xD5, 0x2A], np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav_g711(codes, 8000, "ulaw")))],
        "id long, blob binary")
    rows = sorted(audio_features_op(df, {"window_frames": 4}).collect(),
                  key=lambda r: r["win_idx"])
    lin = [_g711_expand_scalar(int(c), "ulaw") for c in codes]
    assert [r["win_frames"] for r in rows] == [4, 2]
    assert rows[0]["win_sumsq"] == sum(v * v for v in lin[:4])
    assert rows[1]["win_sumsq"] == sum(v * v for v in lin[4:])
    assert rows[0]["sample_rate"] == 8000 and rows[0]["channels"] == 1


# -------------------------------------- float / wide-PCM / IMA ADPCM WAV

def test_wav_float_exact_and_clip():
    from riko_spark.functions.wavcodec import decode_wav, encode_wav_float

    # values k/32767 survive the float32 round-trip exactly: the
    # decoder's x*32767 half-up rounding must recover k
    k = np.array([[0, 32767], [-32767, 1], [-12345, 6789]], np.int64)
    f = (k / 32767.0).astype(np.float32)
    rate, ch, s = decode_wav(encode_wav_float(f, 44100))
    assert (rate, ch) == (44100, 2)
    assert s.tolist() == k.tolist()
    # float64 path
    rate, ch, s = decode_wav(encode_wav_float(k[:, 0] / 32767.0, 8000,
                                              double=True))
    assert ch == 1 and s[:, 0].tolist() == k[:, 0].tolist()
    # out-of-range samples clamp to full scale, NaN-free contract not
    # required by spec but +/-2.0 must pin to the rails
    rate, _, s = decode_wav(encode_wav_float(
        np.array([2.0, -2.0, 0.5], np.float32), 8000))
    assert s[:, 0].tolist() == [32767, -32767, 16384]


def test_wav_float_extensible_guid():
    from riko_spark.functions.wavcodec import decode_wav

    f = np.array([0.25, -0.5], "<f4")
    data = f.tobytes()
    fmt = struct.pack("<HHIIHHHHI", 0xFFFE, 1, 8000, 32000, 4, 32, 22,
                      32, 0x4) + b"\x03\x00\x00\x00" + b"\x00" * 12
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    rate, ch, s = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert s[:, 0].tolist() == [8192, -16383 - 1 + 1]  # floor(-.5*32767+.5)
    # an EXTENSIBLE GUID that is neither PCM nor float is rejected
    bad = bytearray(b"RIFF" + struct.pack("<I", len(body)) + body)
    i = bytes(bad).index(b"fmt ") + 8 + 24
    bad[i:i + 4] = b"\x07\x00\x00\x00"
    with pytest.raises(ValueError, match="neither PCM nor IEEE float"):
        decode_wav(bytes(bad))


def test_wav_24_and_32_bit_pcm():
    from riko_spark.functions.wavcodec import decode_wav, encode_wav_wide

    # 24-bit: planted k<<8 decodes to exactly k (top-16 contract)
    k = np.array([[1, -1], [32767, -32768], [4660, -292]], np.int64)
    rate, ch, s = decode_wav(encode_wav_wide((k << 8).astype(np.int32),
                                             48000, bits=24))
    assert (rate, ch) == (48000, 2)
    assert s.tolist() == k.tolist()
    # 32-bit: planted k<<16 decodes to exactly k
    rate, ch, s = decode_wav(encode_wav_wide((k << 16).astype(np.int32),
                                             48000, bits=32))
    assert s.tolist() == k.tolist()
    # 24-bit sign boundary: 0x800000 is the most negative value
    blob = bytearray(encode_wav_wide(np.array([-(1 << 23)], np.int32),
                                     8000, bits=24))
    _, _, s = decode_wav(bytes(blob))
    assert s[0, 0] == -32768
    with pytest.raises(ValueError):
        encode_wav_wide(k.astype(np.int32), 8000, bits=20)


def _ima_decode_scalar(nibbles, predictor, index):
    """Independent per-sample IMA ADPCM expansion written from the IMA
    recommended-practices text: branchy scalar loop, no numpy, no
    shared tables — the step table is rebuilt here from the published
    values list typed independently of the codec module."""
    steps = [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28,
             31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107,
             118, 130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
             337, 371, 408, 449, 494, 544, 598, 658, 724, 796, 876,
             963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
             2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
             5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635,
             13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
             29794, 32767]
    out = [predictor]
    for n in nibbles:
        step = steps[index]
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        predictor = predictor - diff if n & 8 else predictor + diff
        predictor = max(-32768, min(32767, predictor))
        index += [-1, -1, -1, -1, 2, 4, 6, 8][n & 7]
        index = max(0, min(88, index))
        out.append(predictor)
    return out


def test_ima_step_table_growth_property():
    from riko_spark.functions.wavcodec import _IMA_STEP_TABLE

    t = _IMA_STEP_TABLE.astype(float)
    assert t[0] == 7 and t[88] == 32767
    # each entry is ~1.1x the previous (the IMA design rule); a
    # transposed digit breaks the ratio band immediately
    ratios = t[1:] / t[:-1]
    assert ratios.min() > 1.03 and ratios.max() < 1.18


def test_ima_adpcm_mono_roundtrip_vs_scalar():
    from riko_spark.functions.wavcodec import decode_wav, encode_wav_ima

    rng = np.random.default_rng(7)
    nib = rng.integers(0, 16, size=(3, 24), dtype=np.uint8)
    preds = np.array([0, -30000, 25000], np.int16)
    idxs = np.array([0, 44, 88], np.uint8)
    rate, ch, s = decode_wav(encode_wav_ima(nib, preds, idxs, 8000))
    assert (rate, ch) == (8000, 1)
    assert s.shape == (3 * 25, 1)
    expect = []
    for b in range(3):
        expect += _ima_decode_scalar(nib[b].tolist(), int(preds[b]),
                                     int(idxs[b]))
    assert s[:, 0].tolist() == expect


def test_ima_adpcm_stereo_hand_built_and_fact_trim():
    from riko_spark.functions.wavcodec import decode_wav

    # one stereo block, hand-assembled: per-channel 4-byte headers then
    # alternating 4-byte words (8 nibbles each, low nibble first)
    nib_l = [4, 0, 12, 2, 9, 1, 15, 7]
    nib_r = [8, 8, 3, 3, 0, 5, 10, 6]
    hdr = struct.pack("<hBB", 100, 2, 0) + struct.pack("<hBB", -100, 10, 0)
    pack = lambda ns: bytes(
        ns[i] | (ns[i + 1] << 4) for i in range(0, len(ns), 2))
    data = hdr + pack(nib_l) + pack(nib_r)
    balign = len(data)
    fmt = struct.pack("<HHIIHHHH", 0x11, 2, 8000,
                      8000 * balign // 9, balign, 4, 2, 9)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<II", 4, 7)  # trim to 7 frames
            + b"data" + struct.pack("<I", len(data)) + data)
    rate, ch, s = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert (rate, ch) == (8000, 2)
    assert s.shape == (7, 2)  # fact chunk trims the 9 decoded frames
    assert s[:, 0].tolist() == _ima_decode_scalar(nib_l, 100, 2)[:7]
    assert s[:, 1].tolist() == _ima_decode_scalar(nib_r, -100, 10)[:7]


def test_ima_adpcm_rejects():
    from riko_spark.functions.wavcodec import decode_wav, encode_wav_ima

    nib = np.zeros((1, 8), np.uint8)
    blob = bytearray(encode_wav_ima(nib, np.array([0], np.int16),
                                    np.array([0], np.uint8), 8000))
    i = bytes(blob).index(b"fmt ")
    struct.pack_into("<H", blob, i + 8 + 14, 16)  # wBitsPerSample
    with pytest.raises(ValueError, match="4-bit"):
        decode_wav(bytes(blob))
    with pytest.raises(ValueError, match="8k"):
        encode_wav_ima(np.zeros((1, 7), np.uint8),
                       np.array([0], np.int16),
                       np.array([0], np.uint8), 8000)
    # MS ADPCM (format 2) still rejects with the clear library message
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 4000, 256, 4)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(ValueError, match="transform codecs"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)

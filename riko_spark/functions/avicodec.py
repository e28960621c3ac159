"""Dependency-free AVI frame extraction: RIFF/'AVI ' container walk +
uncompressed DIB ('00db') frame decode with stdlib ``struct``/numpy.

Completes the media-kernel trio (imagecodec.py images, wavcodec.py
audio): video frame sampling over AVIs whose streams are raw
BI_RGB DIBs — the interchange shape tools emit for lossless capture —
decodes from the public RIFF/AVI spec (msdn AVIMAINHEADER /
AVISTREAMHEADER layout) with no codec library.  Compressed streams
('00dc' chunks / non-zero biCompression) are rejected with a clear
error: H.264/MJPEG need entropy decoders this container doesn't ship,
and the caller falls back to the documented stub.

Frame payload layout matches the BMP pixel array (bottom-up rows, BGR
order, 4-byte row padding) without the BITMAPFILEHEADER — the decode
shares its conventions with functions/imagecodec.py's BMP path.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\0" if len(body) % 2 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(form: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", form + body)


def encode_avi(frames: list[np.ndarray], fps: int = 25) -> bytes:
    """Minimal spec-conformant AVI from ``(h, w, 3)`` RGB frames:
    hdrl (avih + one strl video stream, BI_RGB 24-bit) + movi with one
    '00db' raw-DIB chunk per frame."""
    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    h, w, c = np.asarray(frames[0]).shape
    if c != 3:
        raise ValueError("encode_avi writes 24-bit RGB frames")
    row_len = (w * 3 + 3) & ~3
    dibs = []
    for f in frames:
        px = np.asarray(f, dtype=np.uint8)
        if px.shape != (h, w, 3):
            raise ValueError("all frames must share one size")
        body = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up
            row = px[y, :, ::-1].tobytes()  # RGB -> BGR
            body.extend(row)
            body.extend(b"\0" * (row_len - len(row)))
        dibs.append(bytes(body))
    frame_bytes = row_len * h
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, frame_bytes * fps, 0, 0x10,  # us/frame, rate, pad, HASINDEX-ish flags
        len(frames), 0, 1, frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, len(frames),
        frame_bytes, 0, 0, 0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes,
                       0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    movi = _list(b"movi", b"".join(_chunk(b"00db", d) for d in dibs))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi)


def avi_dib_payloads(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """AVI bytes -> ``(width, height, bits_per_pixel, [raw DIB chunk
    payloads])`` — the chunk walk without pixel decode, for callers
    that forward frame bytes verbatim (frame_sample).

    Walks the RIFF tree for the video strf (dimensions + bit depth +
    compression check), then collects every '00db' raw-DIB chunk in
    movi.  '00dc' (compressed) or non-BI_RGB strf raises ``ValueError``
    — no silent garbage frames."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")

    w = h = bpp = None
    dib_payloads: list[bytes] = []
    compressed_seen = False
    cur_stream = [None]  # fccType of the most recent strh (per strl)

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal w, h, bpp, compressed_seen
        while pos + 8 <= end:
            tag = buf[pos: pos + 4]
            (ln,) = struct.unpack_from("<I", buf, pos + 4)
            body_off = pos + 8
            if tag == b"LIST":
                walk(buf, body_off + 4, body_off + ln)
            elif tag == b"strh" and ln >= 4:
                # remember which stream the NEXT strf describes — an
                # audio strl may legitimately precede the video one
                cur_stream[0] = buf[body_off: body_off + 4]
            elif tag == b"strf" and w is None:
                if cur_stream[0] != b"vids":
                    pass  # audio/text stream format: not ours
                elif ln < 20:
                    raise ValueError("AVI: video strf too short for "
                                     "BITMAPINFOHEADER")
                else:
                    _sz, bw, bh, _pl, bits, comp = struct.unpack_from(
                        "<IiiHHI", buf, body_off)
                    if comp != 0:
                        raise ValueError(
                            f"AVI: compressed video (biCompression="
                            f"{comp:#x}) needs a codec library; only raw "
                            "BI_RGB decodes")
                    w, h, bpp = bw, abs(bh), bits
            elif tag[2:4] == b"db":
                dib_payloads.append(buf[body_off: body_off + ln])
            elif tag[2:4] == b"dc":
                compressed_seen = True
            pos = body_off + ln + (ln & 1)  # odd chunks carry a pad byte

    try:
        walk(data, 12, len(data))
    except struct.error as e:
        raise ValueError(f"corrupt AVI data: {e}") from e
    if compressed_seen and not dib_payloads:
        raise ValueError("AVI: stream carries compressed ('dc') frames; "
                         "only raw DIB ('db') frames decode natively")
    if w is None or not dib_payloads:
        raise ValueError("AVI: no decodable raw-DIB video stream found")
    if bpp not in (24, 32):
        raise ValueError(f"AVI: only 24/32-bit DIB frames supported, got {bpp}")
    return w, h, bpp, dib_payloads


def decode_dib_payload(payload: bytes, w: int, h: int,
                       bpp: int) -> np.ndarray:
    """One raw DIB payload -> ``uint8 (h, w, 3)`` RGB, decoded
    bottom-up/BGR/padded (same pixel conventions as imagecodec's BMP
    path)."""
    c = bpp // 8
    row_len = (w * c + 3) & ~3
    if len(payload) < row_len * h:
        raise ValueError("AVI: truncated frame chunk")
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        row = np.frombuffer(payload, dtype=np.uint8, count=w * c,
                            offset=i * row_len).reshape(w, c)
        out[h - 1 - i] = row[:, [2, 1, 0]]
    return out


def decode_avi_frames(data: bytes) -> tuple[int, int, list[np.ndarray]]:
    """AVI bytes -> ``(width, height, [uint8 (h, w, 3) RGB frames])``
    — every frame decoded.  Samplers that need only every Nth frame
    should use :func:`avi_dib_payloads` + :func:`decode_dib_payload`
    on the sampled payloads instead of paying for the full decode."""
    w, h, bpp, payloads = avi_dib_payloads(data)
    return w, h, [decode_dib_payload(p, w, h, bpp) for p in payloads]

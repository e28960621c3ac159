"""Dependency-free GIF decoder: 87a/89a container walk + variable-width
LZW decompression + palette expansion with stdlib/numpy alone.

GIF is the third web-corpus image interchange format next to PNG and
JPEG (riko reference fetches pages whose <img> assets are routinely
GIFs — reference riko/modules/fetchpage.py is the fetch surface); the
decode follows the public GIF89a specification: logical screen
descriptor, global/local color tables, graphic control extensions
(transparency), image descriptors with optional interlacing, and the
spec's LSB-first variable-width LZW code stream (clear/end codes,
dictionary growth to 12 bits, the deferred-clear self-reference case).

``decode_gif`` composites the FIRST frame onto the logical screen —
the still-image semantics every image op here needs (image_features /
image_dhash / image_neardup); ``decode_gif_frames`` yields every
frame's raw indices for frame-level callers, and
``composite_gif_frames`` applies the full ANIMATION semantics
(per-frame overlay + disposal methods 0/1 leave, 2 restore-background,
3 restore-previous) so video-style ops can treat an animated GIF as a
frame sequence.  Divergence from browsers: "restore to background"
paints the logical-screen background color, not transparent black —
this codec has no alpha channel, matching decode_png/decode_bmp's
(h, w, 3) contract.

The encoder exists only to build fixtures; tests additionally
hand-pack LZW code sequences bit-by-bit (independent of the encoder)
so the decoder's dictionary semantics cannot self-certify.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


# --------------------------------------------------------------- LZW

def lzw_decode(stream: bytes, min_code_size: int,
               max_pixels: int) -> np.ndarray:
    """GIF LZW: LSB-first variable-width codes -> uint8 index array.

    Implements the spec state machine: width starts at
    ``min_code_size + 1``; CLEAR (2^min) resets the dictionary; END
    (CLEAR+1) terminates; a code equal to the next unassigned entry is
    the self-referencing KwKwK case; dictionary growth caps at 4095
    (width 12) until the next CLEAR.  Stops after ``max_pixels``
    outputs — trailing junk in the sub-blocks can't run away."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"GIF: bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1

    out = bytearray()
    table: list[bytes] = []

    def reset() -> int:
        table.clear()
        table.extend(bytes([i]) for i in range(clear))
        table.append(b"")  # clear
        table.append(b"")  # end
        return min_code_size + 1

    width = reset()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(stream)
    while len(out) < max_pixels:
        while nbits < width:
            if pos >= n:
                raise ValueError("GIF: LZW stream ended before end code")
            acc |= stream[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            width = reset()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"GIF: LZW code {code} before any output")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]  # KwKwK self-reference
            table.append(entry)
        else:
            raise ValueError(f"GIF: LZW code {code} out of range")
        out.extend(entry)
        prev = entry
        # width grows when the NEXT code could not be represented;
        # at 4096 the dictionary is frozen until a clear
        if len(table) >= (1 << width) and width < 12:
            width += 1
    return np.frombuffer(bytes(out[:max_pixels]), dtype=np.uint8)


def lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Fixture-side LZW: straightforward greedy dictionary build,
    LSB-first packing.  Not the test oracle — tests hand-pack code
    sequences independently."""
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1

    codes: list[tuple[int, int]] = [(clear, width)]
    run = b""
    for v in bytes(np.asarray(indices, dtype=np.uint8)):
        cand = run + bytes([v])
        if cand in table:
            run = cand
            continue
        codes.append((table[run], width))
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
        else:
            codes.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        run = bytes([v])
    if run:
        codes.append((table[run], width))
    codes.append((end, width))

    acc = 0
    nbits = 0
    out = bytearray()
    for code, w in codes:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --------------------------------------------------------- container

#: interlace pass layout per the spec: (row offset, row stride)
INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray, h: int) -> np.ndarray:
    rows = np.empty_like(idx)
    src = 0
    for off, step in INTERLACE_PASSES:
        n = len(range(off, h, step))
        rows[off:h:step] = idx[src: src + n]
        src += n
    return rows


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate length-prefixed sub-blocks starting at ``pos``;
    returns (payload, position after the 0 terminator)."""
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("GIF: truncated sub-block chain")
        ln = data[pos]
        pos += 1
        if ln == 0:
            return b"".join(chunks), pos
        chunks.append(data[pos: pos + ln])
        if len(data) < pos + ln:
            raise ValueError("GIF: truncated sub-block")
        pos += ln


def decode_gif_frames(data: bytes):
    """GIF bytes -> ``(screen_w, screen_h, background_rgb, frames)``
    where each frame is ``(left, top, palette (n,3) uint8,
    transparent_index | None, indices uint8 (fh, fw), disposal)`` —
    raw decoded state for every image block, no compositing.
    ``disposal`` is the GCE method (0 unspecified / 1 leave /
    2 restore-background / 3 restore-previous)."""
    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF (bad magic)")
    try:
        return _decode_gif_body(data)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt GIF data: {e}") from e


def _decode_gif_body(data: bytes):
    sw, sh, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n,
                            offset=pos).reshape(n, 3)
        pos += 3 * n
    bg_rgb = (tuple(int(v) for v in gct[bg_idx])
              if gct is not None and bg_idx < len(gct) else (0, 0, 0))

    frames = []
    transparent = None  # from the GCE preceding the next image
    disposal = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            label = data[pos]
            pos += 1
            payload, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(payload) >= 4:
                flags, _delay, tidx = struct.unpack_from("<BHB", payload, 0)
                transparent = tidx if flags & 0x01 else None
                disposal = (flags >> 2) & 0x07
            continue
        if b != 0x2C:
            raise ValueError(f"GIF: unknown block {b:#x}")
        left, top, fw, fh, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(data, dtype=np.uint8, count=3 * n,
                                offset=pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF: image without any color table")
        min_code = data[pos]
        pos += 1
        stream, pos = _sub_blocks(data, pos)
        idx = lzw_decode(stream, min_code, fw * fh)
        if len(idx) < fw * fh:
            raise ValueError("GIF: LZW stream shorter than the image")
        idx = idx.reshape(fh, fw)
        if ipacked & 0x40:
            idx = _deinterlace(idx, fh)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("GIF: palette index out of range")
        frames.append((left, top, pal, transparent, idx, disposal))
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF: no image data")
    return sw, sh, bg_rgb, frames


def decode_gif(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """GIF bytes -> ``(width, height, 3, uint8 array (h, w, 3))`` —
    the FIRST frame composited onto the logical screen (background
    color where the frame doesn't cover and under its transparent
    index), matching decode_png/decode_bmp conventions for the image
    ops."""
    sw, sh, bg_rgb, frames = decode_gif_frames(data)
    left, top, pal, transparent, idx, _disp = frames[0]
    if left + idx.shape[1] > sw or top + idx.shape[0] > sh:
        raise ValueError("GIF: frame exceeds the logical screen")
    out = np.empty((sh, sw, 3), dtype=np.uint8)
    out[:, :] = bg_rgb
    _draw(out, left, top, pal, transparent, idx)
    return sw, sh, 3, out


def _draw(canvas: np.ndarray, left: int, top: int, pal: np.ndarray,
          transparent: int | None, idx: np.ndarray) -> None:
    px = pal[idx]
    region = canvas[top: top + idx.shape[0], left: left + idx.shape[1]]
    if transparent is not None:
        keep = idx != transparent
        region[keep] = px[keep]
    else:
        region[:, :] = px


def composite_gif_frames(data: bytes) -> tuple[int, int, list[np.ndarray]]:
    """GIF bytes -> ``(screen_w, screen_h, [frame (sh, sw, 3), ...])``
    with the full animation semantics: each image block overlays the
    running canvas (transparent indices show what's underneath), then
    its disposal method runs BEFORE the next frame draws — 0/1 leave
    the canvas, 2 restores the frame's rectangle to the background
    color, 3 restores it to the canvas as it was before this frame.
    Every emitted frame is the complete logical screen, so a video-op
    caller gets browser-visible frames, not raw deltas."""
    sw, sh, bg_rgb, frames = decode_gif_frames(data)
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:, :] = bg_rgb
    out = []
    for left, top, pal, transparent, idx, disposal in frames:
        fh, fw = idx.shape
        if left + fw > sw or top + fh > sh:
            raise ValueError("GIF: frame exceeds the logical screen")
        saved = canvas[top: top + fh, left: left + fw].copy() \
            if disposal == 3 else None
        _draw(canvas, left, top, pal, transparent, idx)
        out.append(canvas.copy())
        if disposal == 2:
            canvas[top: top + fh, left: left + fw] = bg_rgb
        elif disposal == 3:
            canvas[top: top + fh, left: left + fw] = saved
    return sw, sh, out


def _palette_table(px: np.ndarray, transparent_color=None):
    """Exact-palette build for the fixture encoders: ``(h, w, 3)`` RGB
    -> (power-of-two table (n,3) uint8, table-size bits, index array
    (h, w) uint8, transparent index | None)."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_gif takes (h, w, 3) RGB")
    h, w = px.shape[:2]
    flat = px.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError("encode_gif needs <=256 distinct colors")
    tidx = None
    if transparent_color is not None:
        tc = np.asarray(transparent_color, dtype=np.uint8)
        hit = np.flatnonzero((pal == tc).all(axis=1))
        if len(hit):
            tidx = int(hit[0])
    # color table size must be a power of two >= 2
    bits = max(1, int(len(pal) - 1).bit_length())
    n = 1 << bits
    table = np.zeros((n, 3), dtype=np.uint8)
    table[: len(pal)] = pal
    return table, bits, inv.astype(np.uint8).reshape(h, w), tidx


def _image_block(out: bytearray, left: int, top: int, idx: np.ndarray,
                 table: np.ndarray, bits: int, *, local: bool,
                 interlace: bool) -> None:
    h, w = idx.shape
    packed = (0x40 if interlace else 0)
    if local:
        packed |= 0x80 | (bits - 1)
    out += struct.pack("<BHHHHB", 0x2C, left, top, w, h, packed)
    if local:
        out += table.tobytes()
    if interlace:
        parts = [idx[off::step] for off, step in INTERLACE_PASSES]
        stream_idx = np.concatenate(parts).reshape(-1)
    else:
        stream_idx = idx.reshape(-1)
    min_code = max(2, bits)
    lzw = lzw_encode(stream_idx, min_code)
    out.append(min_code)
    for off in range(0, len(lzw), 255):
        blk = lzw[off: off + 255]
        out.append(len(blk))
        out += blk
    out.append(0)


def encode_gif(px: np.ndarray, interlace: bool = False) -> bytes:
    """Fixture GIF from ``(h, w, 3)`` uint8 RGB with <=256 distinct
    colors: exact palette build + real LZW, GIF89a container (single
    frame, global color table)."""
    table, bits, idx, _t = _palette_table(px)
    h, w = idx.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += table.tobytes()
    _image_block(out, 0, 0, idx, table, bits, local=False,
                 interlace=interlace)
    out.append(0x3B)
    return bytes(out)


def encode_gif_animated(frames, screen: tuple[int, int],
                        background=(0, 0, 0), transparent_color=None,
                        delay_cs: int = 4) -> bytes:
    """Fixture ANIMATED GIF: ``frames`` is a list of ``(left, top,
    px (fh, fw, 3), disposal)``; each image block carries its own
    LOCAL color table (exercising the local-palette decode path) and a
    graphic control extension with the given disposal method.  Pixels
    equal to ``transparent_color`` map to that frame's transparent
    index (showing through to the canvas underneath).  The logical
    screen gets a 2-entry global table holding the background color."""
    sw, sh = screen
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | 0, 0, 0)  # 2-color GCT
    out += bytes(background) + bytes(background)
    for left, top, px, disposal in frames:
        table, bits, idx, tidx = _palette_table(px, transparent_color)
        flags = (disposal & 0x07) << 2
        if tidx is not None:
            flags |= 0x01
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, flags, delay_cs,
                           tidx or 0, 0)
        _image_block(out, left, top, idx, table, bits, local=True,
                     interlace=False)
    out.append(0x3B)
    return bytes(out)

"""Dependency-free baseline TIFF 6.0 codec: II/MM byte orders, IFD
tag walk, strip assembly, uncompressed / PackBits / LZW (the TIFF
MSB-first early-change variant) / Deflate compression, horizontal-
differencing predictor, bilevel (both photometric polarities),
grayscale, RGB(A) and palette-color images — stdlib ``struct``/
``zlib`` + numpy alone.

Reference parity: riko's media modules hand image bytes to a codec
library (see /root/reference/riko/modules/* fetch/typecast surface);
this engine decodes natively.  Everything is written from the public
TIFF 6.0 specification: the LZW here is NOT the GIF one (gifcodec.py
packs codes LSB-first and grows at table size 2^n; TIFF packs
MSB-first and grows one code EARLY, at 2^n - 1), and the encoder's
compressors are separate mirror implementations so hand-packed
bitstreams in tests keep the decoder honest.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8}

_COMPRESSION_NONE = 1
_COMPRESSION_LZW = 5
_COMPRESSION_DEFLATE_ADOBE = 8
_COMPRESSION_PACKBITS = 32773
_COMPRESSION_DEFLATE = 32946

_CLEAR, _EOI = 256, 257


def _lzw_decode(buf: bytes, max_out: int) -> bytes:
    """TIFF-variant LZW (spec §13): MSB-first code packing, 9->12 bit
    codes, EARLY CHANGE (width grows when the table reaches 2^n - 1
    entries, one code before the GIF variant), ClearCode 256, EOI 257.
    """
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
    n = len(bits)
    pos = 0
    nbits = 9
    out = bytearray()
    table: list[bytes] = []
    prev: bytes | None = None

    while len(out) < max_out:
        if pos + nbits > n:
            break  # ran off the end: strip byte counts bound output
        code = 0
        for b in bits[pos:pos + nbits]:
            code = (code << 1) | int(b)
        pos += nbits
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            nbits = 9
            prev = None
            continue
        if code == _EOI:
            break
        if prev is None:
            if not table or code >= 256:
                raise ValueError("TIFF: LZW stream must start with Clear")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                raise ValueError("TIFF: LZW code out of range")
            table.append(prev + entry[:1])
        out += entry
        prev = entry
        # early change: grow one code before the table is full
        if len(table) >= (1 << nbits) - 1 and nbits < 12:
            nbits += 1
    return bytes(out[:max_out])


def _lzw_encode(data: bytes) -> bytes:
    """Mirror TIFF-LZW compressor (fixture generation)."""
    out_bits: list[tuple[int, int]] = []
    nbits = 9
    table = {bytes([i]): i for i in range(256)}
    next_code = 258

    def put(code):
        out_bits.append((code, put_nbits[0]))

    put_nbits = [9]
    put(_CLEAR)
    w = b""
    for byte in data:
        c = w + bytes([byte])
        if c in table:
            w = c
            continue
        put(table[w])
        table[c] = next_code
        next_code += 1
        # the decoder's table is one entry behind ours and widens at
        # 2^n - 1 (the TIFF early change); next_code == 2^n here is
        # the same stream position
        if next_code >= (1 << put_nbits[0]) and put_nbits[0] < 12:
            put_nbits[0] += 1
        if next_code > 4093:  # table nearly full: reset
            put(_CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            put_nbits[0] = 9
        w = bytes([byte])
    if w:
        put(table[w])
    put(_EOI)
    # MSB-first bit packing
    acc = 0
    accn = 0
    out = bytearray()
    for code, width in out_bits:
        acc = (acc << width) | code
        accn += width
        while accn >= 8:
            out.append((acc >> (accn - 8)) & 0xFF)
            accn -= 8
    if accn:
        out.append((acc << (8 - accn)) & 0xFF)
    return bytes(out)


def _packbits_decode(buf: bytes, max_out: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(buf)
    while i < n and len(out) < max_out:
        h = buf[i]
        i += 1
        if h < 128:  # literal run of h+1 bytes
            out += buf[i:i + h + 1]
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            if i < n:
                out += bytes([buf[i]]) * (257 - h)
                i += 1
        # h == 128: no-op per spec
    return bytes(out[:max_out])


def _packbits_encode(data: bytes) -> bytes:
    """Mirror PackBits compressor: maximal repeat runs, literal
    chunks of up to 128."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run length at i
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        # literal: until the next >=3 repeat run or 128 bytes
        j = i + 1
        while j < n and j - i < 128:
            if (j + 2 < n and data[j] == data[j + 1] == data[j + 2]):
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def _read_tag_values(data, endian, ttype, count, raw):
    size = _TYPE_SIZE.get(ttype)
    if size is None:
        return []
    total = size * count
    if total <= 4:
        payload = raw[:total]
    else:
        (off,) = struct.unpack(endian + "I", raw)
        payload = data[off:off + total]
    if ttype == 3:
        return list(struct.unpack(endian + "H" * count, payload))
    if ttype == 4:
        return list(struct.unpack(endian + "I" * count, payload))
    if ttype in (1, 6, 7):
        return list(payload)
    if ttype == 5:
        vals = struct.unpack(endian + "II" * count, payload)
        return [vals[2 * i] / max(vals[2 * i + 1], 1) for i in range(count)]
    return []


def decode_tiff(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Baseline TIFF bytes -> ``(width, height, channels, uint8 array
    (h, w, c))``; first IFD only.  Unsupported variants (tiled, planar
    configuration 2, CCITT/JPEG-in-TIFF compression) raise
    ``ValueError`` with a clear reason."""
    if data[:4] not in (b"II*\x00", b"MM\x00*"):
        raise ValueError("not a TIFF (bad byte-order header)")
    try:
        return _decode_tiff(data)
    except (struct.error, IndexError, zlib.error) as e:
        raise ValueError(f"corrupt TIFF data: {e!r}") from e


def _decode_tiff(data: bytes) -> tuple[int, int, int, np.ndarray]:
    endian = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(endian + "I", data, 4)
    (ntags,) = struct.unpack_from(endian + "H", data, ifd_off)
    tags: dict[int, list] = {}
    for i in range(ntags):
        off = ifd_off + 2 + 12 * i
        tag, ttype, count = struct.unpack_from(endian + "HHI", data, off)
        tags[tag] = _read_tag_values(data, endian, ttype, count,
                                     data[off + 8:off + 12])

    def one(tag, default=None):
        v = tags.get(tag)
        if not v:
            if default is None:
                raise ValueError(f"TIFF: missing required tag {tag}")
            return default
        return v[0]

    width = one(256)
    height = one(257)
    bits_list = tags.get(258, [1])
    spp = one(277, 1)
    bits = bits_list[0]
    if any(b != bits for b in bits_list):
        raise ValueError("TIFF: mixed bits-per-sample unsupported")
    compression = one(259, _COMPRESSION_NONE)
    photometric = one(262, 1)
    predictor = one(317, 1)
    planar = one(284, 1)
    if planar != 1:
        raise ValueError("TIFF: planar configuration 2 unsupported")
    if 322 in tags or 323 in tags:
        raise ValueError("TIFF: tiled images unsupported")
    if bits not in (1, 8, 16):
        raise ValueError(f"TIFF: {bits}-bit samples unsupported")
    if bits == 1 and spp != 1:
        raise ValueError("TIFF: multi-sample bilevel unsupported")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF: missing strip offsets/byte counts")
    rows_per_strip = one(278, height)

    if bits == 1:
        row_bytes = -(-width // 8)
    else:
        row_bytes = width * spp * (bits // 8)

    chunks = []
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        rows = min(rows_per_strip, height - i * rows_per_strip)
        if rows <= 0:
            break
        raw = data[off:off + cnt]
        need = rows * row_bytes
        if compression == _COMPRESSION_NONE:
            chunk = raw[:need]
        elif compression == _COMPRESSION_PACKBITS:
            chunk = _packbits_decode(raw, need)
        elif compression == _COMPRESSION_LZW:
            chunk = _lzw_decode(raw, need)
        elif compression in (_COMPRESSION_DEFLATE,
                             _COMPRESSION_DEFLATE_ADOBE):
            chunk = zlib.decompress(raw)[:need]
        else:
            raise ValueError(f"TIFF: compression {compression} "
                             "unsupported (CCITT/JPEG-in-TIFF need a "
                             "codec library)")
        if len(chunk) < need:
            raise ValueError("TIFF: strip decodes short")
        chunks.append(chunk)
    buf = b"".join(chunks)
    if len(buf) < height * row_bytes:
        raise ValueError("TIFF: image data truncated")

    if bits == 1:
        rows = np.unpackbits(
            np.frombuffer(buf, dtype=np.uint8).reshape(height, row_bytes),
            axis=1)[:, :width]
        # photometric 0 = WhiteIsZero (0 -> white), 1 = BlackIsZero
        px = np.where(rows == (1 if photometric == 0 else 0), 0, 255)
        return width, height, 1, px.astype(np.uint8)[:, :, None]

    if bits == 16:
        arr = np.frombuffer(buf, dtype=endian + "u2").astype(np.uint32)
        arr = arr.reshape(height, width, spp)
        if predictor == 2:
            arr = np.cumsum(arr, axis=1, dtype=np.uint32) & 0xFFFF
        arr = (arr >> 8).astype(np.uint8)  # keep the top byte
    else:
        arr = np.frombuffer(buf, dtype=np.uint8).reshape(
            height, width, spp)
        if predictor == 2:
            arr = (np.cumsum(arr, axis=1, dtype=np.uint32) & 0xFF
                   ).astype(np.uint8)
        elif predictor != 1:
            raise ValueError(f"TIFF: predictor {predictor} unsupported")

    if photometric == 3:  # palette-color
        cmap = tags.get(320)
        if not cmap or len(cmap) != 3 * (1 << bits):
            raise ValueError("TIFF: palette image missing ColorMap")
        ncol = 1 << bits
        # ColorMap SHORTs are 16-bit; the spec maps 0..65535 -> 0..255
        pal = (np.array(cmap, dtype=np.uint32).reshape(3, ncol).T
               >> 8).astype(np.uint8)
        return width, height, 3, pal[arr[:, :, 0]]
    if photometric == 0:  # WhiteIsZero grayscale
        return width, height, 1, (255 - arr[:, :, :1])
    if photometric == 1:
        return width, height, 1, arr[:, :, :1]
    if photometric == 2:
        if spp == 3:
            return width, height, 3, arr
        if spp == 4:
            return width, height, 4, arr
        raise ValueError(f"TIFF: RGB with {spp} samples unsupported")
    raise ValueError(f"TIFF: photometric {photometric} unsupported")


def parse_tiff_dims(data: bytes) -> tuple[int, int, int]:
    """Cheap (width, height, channels) from the IFD without decoding
    strips."""
    endian = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(endian + "I", data, 4)
    (ntags,) = struct.unpack_from(endian + "H", data, ifd_off)
    vals = {}
    for i in range(ntags):
        off = ifd_off + 2 + 12 * i
        tag, ttype, count = struct.unpack_from(endian + "HHI", data, off)
        if tag in (256, 257, 262, 277):
            v = _read_tag_values(data, endian, ttype, count,
                                 data[off + 8:off + 12])
            vals[tag] = v[0] if v else 0
    w, h = vals.get(256, 0), vals.get(257, 0)
    spp = vals.get(277, 1)
    channels = 3 if vals.get(262, 1) == 3 else (spp if spp in (3, 4) else 1)
    return w, h, channels


def encode_tiff(pixels: np.ndarray, compression: str = "none",
                predictor: bool = False, rows_per_strip: int | None = None,
                big_endian: bool = False) -> bytes:
    """Baseline TIFF from ``(h, w)`` gray or ``(h, w, 3)`` RGB uint8 —
    fixture generation.  ``compression``: none | packbits | lzw |
    deflate; ``predictor`` applies horizontal differencing (LZW/deflate
    only, per spec intent)."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    if gray:
        px = px[:, :, None]
    h, w, spp = px.shape
    if spp not in (1, 3):
        raise ValueError("encode_tiff takes (h,w) gray or (h,w,3) RGB")
    endian = ">" if big_endian else "<"
    comp_id = {"none": _COMPRESSION_NONE, "packbits": _COMPRESSION_PACKBITS,
               "lzw": _COMPRESSION_LZW,
               "deflate": _COMPRESSION_DEFLATE_ADOBE}.get(compression)
    if comp_id is None:
        raise ValueError(f"unknown compression {compression!r}")
    if predictor and comp_id in (_COMPRESSION_NONE, _COMPRESSION_PACKBITS):
        raise ValueError("predictor is for lzw/deflate")
    rps = rows_per_strip or h

    strips = []
    for y0 in range(0, h, rps):
        rows = px[y0:y0 + rps]
        if predictor:
            d = rows.astype(np.int16)
            d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
            rows = (d & 0xFF).astype(np.uint8)
        raw = rows.tobytes()
        if comp_id == _COMPRESSION_NONE:
            strips.append(raw)
        elif comp_id == _COMPRESSION_PACKBITS:
            # PackBits is per-row per spec
            rb = rows.shape[1] * spp
            strips.append(b"".join(
                _packbits_encode(raw[i * rb:(i + 1) * rb])
                for i in range(rows.shape[0])))
        elif comp_id == _COMPRESSION_LZW:
            strips.append(_lzw_encode(raw))
        else:
            strips.append(zlib.compress(raw))

    nstrips = len(strips)

    def tag(tid, ttype, values):
        size = _TYPE_SIZE[ttype]
        count = len(values)
        fmt = {3: "H", 4: "I"}[ttype]
        payload = struct.pack(endian + fmt * count, *values)
        return tid, ttype, count, payload

    entries = [
        tag(256, 4, [w]), tag(257, 4, [h]),
        tag(258, 3, [8] * spp),
        tag(259, 3, [comp_id]),
        tag(262, 3, [1 if spp == 1 else 2]),
        tag(277, 3, [spp]),
        tag(278, 4, [rps]),
    ]
    if predictor:
        entries.append(tag(317, 3, [2]))

    # layout: header(8) + IFD + external tag payloads + strip data
    nall = len(entries) + 2  # + StripOffsets + StripByteCounts
    ifd_off = 8
    ifd_size = 2 + 12 * nall + 4
    ext_off = ifd_off + ifd_size
    ext = bytearray()

    def place(payload):
        nonlocal ext
        off = ext_off + len(ext)
        ext += payload + (b"\x00" if len(payload) % 2 else b"")
        return off

    strip_area = None  # filled after externals are sized

    # two passes: first compute external sizes for offsets/counts tags
    counts_payload = struct.pack(endian + "I" * nstrips,
                                 *[len(s) for s in strips])
    # build all entries except strip offsets to measure ext area
    fixed = []
    for tid, ttype, count, payload in entries:
        if len(payload) <= 4:
            fixed.append((tid, ttype, count, payload.ljust(4, b"\x00")))
        else:
            off = place(payload)
            fixed.append((tid, ttype, count, struct.pack(endian + "I", off)))
    if len(counts_payload) <= 4:
        counts_entry = (279, 4, nstrips, counts_payload.ljust(4, b"\x00"))
    else:
        counts_entry = (279, 4, nstrips,
                        struct.pack(endian + "I", place(counts_payload)))
    # strip offsets: external if >1 strip
    offsets_ext = nstrips > 1
    if offsets_ext:
        offsets_pos = place(b"\x00" * 4 * nstrips)
    strip_area = ext_off + len(ext)
    strip_offsets = []
    pos = strip_area
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s) + (len(s) % 2)
    if offsets_ext:
        ext[offsets_pos - ext_off:offsets_pos - ext_off + 4 * nstrips] = (
            struct.pack(endian + "I" * nstrips, *strip_offsets))
        offsets_entry = (273, 4, nstrips,
                         struct.pack(endian + "I", offsets_pos))
    else:
        offsets_entry = (273, 4, 1,
                         struct.pack(endian + "I", strip_offsets[0]))

    all_entries = sorted(fixed + [offsets_entry, counts_entry])
    out = bytearray()
    out += (b"II*\x00" if not big_endian else b"MM\x00*")
    out += struct.pack(endian + "I", ifd_off)
    out += struct.pack(endian + "H", nall)
    for tid, ttype, count, val4 in all_entries:
        out += struct.pack(endian + "HHI", tid, ttype, count) + val4
    out += struct.pack(endian + "I", 0)  # next IFD
    out += ext
    for s in strips:
        out += s + (b"\x00" if len(s) % 2 else b"")
    return bytes(out)

"""FLAC (Free Lossless Audio Codec) decode in pure stdlib/numpy.

Original implementation from the public specification (RFC 9639 /
xiph.org FLAC format): metadata-block walk (STREAMINFO), frame header
with UTF-8-style coded numbers and CRC-8, subframe types CONSTANT /
VERBATIM / FIXED(0-4) / LPC(1-32), wasted-bits-per-sample, Rice /
Rice2 residual partitions with escape codes, inter-channel
decorrelation (left/side, right/side, mid/side), and the CRC-16 frame
footer — both CRCs are verified, so bit corruption is a clean
``ValueError``, never silent garbage samples.

The encoder half exists for fixture generation only (tests + driver
oracle queries) and is deliberately NOT the decoder run backwards: it
packs bits MSB-first with its own writer, chooses Rice parameters from
a closed-form estimate, and never calls any decode path — spec tables
and hand-packed bitstreams in tests/test_flaccodec.py keep round-trips
from self-certifying.

Reference parity note: the reference engine (riko) has no media
decoding at all — this kernel extends the engine's multimodal surface
(operators/multimodal.py) the same way imagecodec/wavcodec/avicodec
do, keeping audio_features/audio_fingerprint real for lossless inputs
without shipping codec libraries.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_flac", "encode_flac"]

# ---------------------------------------------------------------- CRC tables

def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tbl = np.zeros(256, dtype=np.uint32)
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        tbl[b] = r & mask
    return tbl


_CRC8_TBL = _crc_table(0x07, 8)          # x^8 + x^2 + x + 1
_CRC16_TBL = _crc_table(0x8005, 16)      # x^16 + x^15 + x^2 + 1


def _crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = int(_CRC8_TBL[r ^ b])
    return r


def _crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = int(_CRC16_TBL[((r >> 8) ^ b) & 0xFF]) ^ ((r << 8) & 0xFFFF)
    return r


# ------------------------------------------------------------- frame tables

_BLOCKSIZE_TBL = {
    0b0001: 192, 0b0010: 576, 0b0011: 1152, 0b0100: 2304, 0b0101: 4608,
    0b1000: 256, 0b1001: 512, 0b1010: 1024, 0b1011: 2048, 0b1100: 4096,
    0b1101: 8192, 0b1110: 16384, 0b1111: 32768,
}
_SAMPLERATE_TBL = {
    0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
    0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
    0b1001: 44100, 0b1010: 48000, 0b1011: 96000,
}
_SAMPLESIZE_TBL = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20,
                   0b110: 24, 0b111: 32}

_LEFT_SIDE, _RIGHT_SIDE, _MID_SIDE = 0b1000, 0b1001, 0b1010


_POW2 = {k: (1 << np.arange(k - 1, -1, -1, dtype=np.int64)) for k in range(1, 33)}


class _Bits:
    """MSB-first bit cursor with O(log n) unary scans (precomputed
    one-bit positions + searchsorted) and vectorized multi-value
    reads (dot products against a powers-of-two vector)."""

    __slots__ = ("bits", "pos", "n", "_ones")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0
        self.n = len(self.bits)
        self._ones = np.flatnonzero(self.bits)

    def take(self, k: int) -> int:
        p = self.pos
        if p + k > self.n:
            raise ValueError("FLAC: bitstream truncated")
        v = 0
        b = self.bits
        for i in range(k):
            v = (v << 1) | int(b[p + i])
        self.pos = p + k
        return v

    def signed(self, k: int) -> int:
        if k == 0:
            return 0
        v = self.take(k)
        return v - (1 << k) if v >= 1 << (k - 1) else v

    def take_signed_block(self, k: int, count: int) -> np.ndarray:
        """``count`` consecutive k-bit two's-complement values in one
        reshape + matmul (VERBATIM subframes, warmups, escaped
        partitions)."""
        if k == 0:
            return np.zeros(count, dtype=np.int64)
        p = self.pos
        if p + k * count > self.n:
            raise ValueError("FLAC: bitstream truncated")
        v = self.bits[p: p + k * count].reshape(count, k).astype(
            np.int64) @ _POW2[k]
        self.pos = p + k * count
        return v - ((v >= (1 << (k - 1))).astype(np.int64) << k)

    def unary(self) -> int:
        idx = np.searchsorted(self._ones, self.pos)
        if idx >= len(self._ones):
            raise ValueError("FLAC: bitstream truncated in unary code")
        one = int(self._ones[idx])
        q = one - self.pos
        self.pos = one + 1
        return q

    def rice_block(self, param: int, count: int) -> np.ndarray:
        """``count`` Rice(param) codes, zigzag-decoded.  The unary
        terminator of code j is found in O(1) by index bookkeeping:
        after each remainder read the cursor's position in the
        one-bit-position array advances by popcount(remainder), so no
        per-sample rescans are needed."""
        ones = self._ones
        out = np.empty(count, dtype=np.int64)
        pos = self.pos
        idx = int(np.searchsorted(ones, pos))
        bits = self.bits
        nones = len(ones)
        pw = _POW2.get(param)
        for j in range(count):
            if idx >= nones:
                raise ValueError("FLAC: bitstream truncated in unary code")
            one = int(ones[idx])
            q = one - pos
            pos = one + 1
            idx += 1
            if param:
                if pos + param > self.n:
                    raise ValueError("FLAC: bitstream truncated")
                r = int(bits[pos: pos + param] @ pw)
                pos += param
                idx += r.bit_count()
                u = (q << param) | r
            else:
                u = q
            out[j] = (u >> 1) ^ -(u & 1)          # zigzag
        self.pos = pos
        return out

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    @property
    def byte_pos(self) -> int:
        return self.pos >> 3


def _read_coded_number(bits: _Bits) -> int:
    """UTF-8-style variable-length number (frame/sample number)."""
    first = bits.take(8)
    if first < 0x80:
        return first
    n_ones = 0
    while (first << n_ones) & 0x80:
        n_ones += 1
    if n_ones < 2 or n_ones > 7:
        raise ValueError("FLAC: invalid coded number")
    v = first & (0x7F >> n_ones)
    for _ in range(n_ones - 1):
        b = bits.take(8)
        if b & 0xC0 != 0x80:
            raise ValueError("FLAC: invalid coded number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _decode_residual(bits: _Bits, blocksize: int, order: int) -> np.ndarray:
    method = bits.take(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = bits.take(4)
    nparts = 1 << po
    if (blocksize >> po) << po != blocksize:
        raise ValueError("FLAC: partition order does not divide blocksize")
    out = np.empty(blocksize - order, dtype=np.int64)
    w = 0
    for p in range(nparts):
        n = (blocksize >> po) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC: invalid partition order")
        param = bits.take(pbits)
        if param == escape:
            raw = bits.take(5)
            out[w: w + n] = bits.take_signed_block(raw, n)
        else:
            out[w: w + n] = bits.rice_block(param, n)
        w += n
    return out


def _predict(warmup: np.ndarray, residual: np.ndarray, coefs: list[int],
             shift: int, n: int) -> np.ndarray:
    """General LPC reconstruction — inherently sequential (IIR with a
    per-step arithmetic shift), so this is the one scalar loop left in
    the decode path; FIXED subframes take :func:`_predict_fixed`."""
    order = len(coefs)
    s = np.empty(n, dtype=np.int64)
    s[:order] = warmup
    for i in range(order, n):
        acc = 0
        for j, c in enumerate(coefs):
            acc += c * int(s[i - 1 - j])
        s[i] = int(residual[i - order]) + (acc >> shift)
    return s


def _predict_fixed(warmup: np.ndarray, residual: np.ndarray) -> np.ndarray:
    """FIXED reconstruction without a Python loop: the order-o residual
    is the o-th forward difference of the signal, so the signal is
    rebuilt by o cumulative sums.  Level l's difference sequence D_l is
    the known l-th difference of the warmup followed by
    ``cumsum(D_{l+1})`` anchored at the warmup prefix's last value."""
    o = len(warmup)
    if o == 0:
        return residual.astype(np.int64)
    w = np.asarray(warmup, dtype=np.int64)
    cur = residual.astype(np.int64)              # D_o (warmup part empty)
    for level in range(o - 1, -1, -1):
        wl = np.diff(w, level) if level else w
        tail = wl[-1] + np.cumsum(cur[o - level - 1:])
        cur = np.concatenate([wl, tail])
    return cur


def _decode_subframe(bits: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if bits.take(1):
        raise ValueError("FLAC: subframe padding bit set")
    ftype = bits.take(6)
    wasted = 0
    if bits.take(1):
        wasted = bits.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC: wasted bits exceed sample size")
    if ftype == 0:                                    # CONSTANT
        s = np.full(blocksize, bits.signed(eff), dtype=np.int64)
    elif ftype == 1:                                  # VERBATIM
        s = bits.take_signed_block(eff, blocksize)
    elif 0b001000 <= ftype <= 0b001100:               # FIXED order 0-4
        order = ftype & 0x07
        warmup = bits.take_signed_block(eff, order)
        res = _decode_residual(bits, blocksize, order)
        s = _predict_fixed(warmup, res)
    elif ftype >= 0b100000:                           # LPC order 1-32
        order = (ftype & 0x1F) + 1
        warmup = bits.take_signed_block(eff, order)
        precision = bits.take(4)
        if precision == 0b1111:
            raise ValueError("FLAC: invalid LPC precision")
        precision += 1
        shift = bits.signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [bits.signed(precision) for _ in range(order)]
        res = _decode_residual(bits, blocksize, order)
        s = _predict(warmup, res, coefs, shift, blocksize)
    else:
        raise ValueError(f"FLAC: reserved subframe type {ftype:#08b}")
    if wasted:
        s <<= wasted
    return s


def decode_flac(data: bytes) -> tuple[int, int, np.ndarray]:
    """FLAC bytes -> ``(sample_rate, channels, int32 array (frames,
    channels))``.  Verifies frame-header CRC-8 and frame CRC-16."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("FLAC: truncated metadata")
        hdr = data[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + data[pos + 1: pos + 4])
        body = data[pos + 4: pos + 4 + ln]
        if btype == 0:
            if ln < 34:
                raise ValueError("FLAC: short STREAMINFO")
            v = int.from_bytes(body[10:18], "big")
            info = {
                "sample_rate": (v >> 44) & 0xFFFFF,
                "channels": ((v >> 41) & 0x7) + 1,
                "bps": ((v >> 36) & 0x1F) + 1,
                "total": v & 0xFFFFFFFFF,
            }
        pos += 4 + ln
        if last:
            break
    if info is None:
        raise ValueError("FLAC: missing STREAMINFO")
    if info["sample_rate"] == 0:
        raise ValueError("FLAC: zero sample rate")

    frames: list[np.ndarray] = []
    got = 0
    framedata = data[pos:]
    bits = _Bits(framedata)
    # RFC 9639 §8.2: total_samples == 0 means the total is UNKNOWN
    # (live/pipe encoders) — decode frames until the stream ends, it
    # is NOT an empty stream
    unknown_total = info["total"] == 0
    while (unknown_total or got < info["total"]) and bits.pos + 32 <= bits.n:
        start_byte = bits.byte_pos
        if bits.take(14) != 0x3FFE:
            raise ValueError("FLAC: lost frame sync")
        if bits.take(1):
            raise ValueError("FLAC: reserved frame-header bit set")
        bits.take(1)                      # blocking strategy
        bs_code = bits.take(4)
        sr_code = bits.take(4)
        ch_code = bits.take(4)
        ss_code = bits.take(3)
        if bits.take(1):
            raise ValueError("FLAC: reserved frame-header bit set")
        _read_coded_number(bits)
        if bs_code == 0:
            raise ValueError("FLAC: reserved blocksize code")
        elif bs_code == 0b0110:
            blocksize = bits.take(8) + 1
        elif bs_code == 0b0111:
            blocksize = bits.take(16) + 1
        else:
            blocksize = _BLOCKSIZE_TBL[bs_code]
        if sr_code == 0:
            rate = info["sample_rate"]
        elif sr_code == 0b1100:
            rate = bits.take(8) * 1000
        elif sr_code == 0b1101:
            rate = bits.take(16)
        elif sr_code == 0b1110:
            rate = bits.take(16) * 10
        elif sr_code == 0b1111:
            raise ValueError("FLAC: invalid sample rate code")
        else:
            rate = _SAMPLERATE_TBL[sr_code]
        if ss_code == 0:
            bps = info["bps"]
        elif ss_code == 0b011:
            raise ValueError("FLAC: reserved sample size code")
        else:
            bps = _SAMPLESIZE_TBL[ss_code]
        hdr_crc = _crc8(framedata[start_byte: bits.byte_pos])
        if bits.take(8) != hdr_crc:
            raise ValueError("FLAC: frame header CRC-8 mismatch")

        if ch_code <= 0b0111:
            nch = ch_code + 1
            chans = [_decode_subframe(bits, blocksize, bps)
                     for _ in range(nch)]
        elif ch_code in (_LEFT_SIDE, _RIGHT_SIDE, _MID_SIDE):
            nch = 2
            bump = (0, 1) if ch_code != _RIGHT_SIDE else (1, 0)
            a = _decode_subframe(bits, blocksize, bps + bump[0])
            b = _decode_subframe(bits, blocksize, bps + bump[1])
            if ch_code == _LEFT_SIDE:
                chans = [a, a - b]
            elif ch_code == _RIGHT_SIDE:
                chans = [b + a, b]
            else:                                     # mid/side
                mid = (a << 1) | (b & 1)
                chans = [(mid + b) >> 1, (mid - b) >> 1]
        else:
            raise ValueError("FLAC: reserved channel assignment")
        bits.align()
        frame_crc = _crc16(framedata[start_byte: bits.byte_pos])
        if bits.take(16) != frame_crc:
            raise ValueError("FLAC: frame CRC-16 mismatch")
        frames.append(np.stack(chans, axis=1))
        got += blocksize

    if not unknown_total and got < info["total"]:
        raise ValueError("FLAC: stream ends before total_samples")
    samples = np.concatenate(frames, axis=0) if frames else \
        np.empty((0, info["channels"]), dtype=np.int64)
    if not unknown_total:
        samples = samples[: info["total"]]
    lo, hi = -(1 << (info["bps"] - 1)), (1 << (info["bps"] - 1)) - 1
    if samples.size and (samples.min() < lo or samples.max() > hi):
        raise ValueError("FLAC: decoded sample exceeds bit depth")
    return rate if frames else info["sample_rate"], info["channels"], \
        samples.astype(np.int32)


# ------------------------------------------------------------------ encoder
# Fixture generation only — independent bit writer, never decode-reused.

class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, v: int, k: int) -> None:
        if k:
            self.acc = (self.acc << k) | (v & ((1 << k) - 1))
            self.nbits += k
            while self.nbits >= 8:
                self.nbits -= 8
                self.buf.append((self.acc >> self.nbits) & 0xFF)

    def put_unary(self, q: int) -> None:
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.put(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _write_coded_number(w: _BitWriter, v: int) -> None:
    if v < 0x80:
        w.put(v, 8)
        return
    chunks = []
    while True:
        chunks.append(v & 0x3F)
        v >>= 6
        nbytes = len(chunks) + 1
        if v < (1 << (7 - nbytes)) or nbytes == 7:
            break
    if nbytes == 7:
        w.put(0xFE, 8)
    else:
        w.put(((0xFF << (8 - nbytes)) & 0xFF) | v, 8)
    for c in reversed(chunks):
        w.put(0x80 | c, 8)


def _rice_param(res: np.ndarray) -> int:
    mean = float(np.abs(res).mean()) if res.size else 0.0
    p = 0
    while (1 << p) < mean + 1 and p < 14:
        p += 1
    return p


def _write_residual(w: _BitWriter, res: np.ndarray, po: int = 0,
                    order: int = 0, blocksize: int | None = None,
                    escape_raw: int | None = None) -> None:
    w.put(0, 2)                            # Rice, 4-bit params
    bs = blocksize if blocksize is not None else len(res) + order
    while (bs >> po) << po != bs or (bs >> po) <= order and po:
        po -= 1                            # spec: 2^po must divide blocksize
    w.put(po, 4)
    nparts = 1 << po
    pos = 0
    for p in range(nparts):
        n = (bs >> po) - (order if p == 0 else 0)
        part = res[pos: pos + n]
        pos += n
        if escape_raw is not None:
            w.put(0xF, 4)
            w.put(escape_raw, 5)
            for v in part:
                w.put(int(v), escape_raw)
            continue
        param = _rice_param(part)
        w.put(param, 4)
        for v in part:
            v = int(v)
            u = (abs(v) << 1) - (1 if v < 0 else 0)   # zigzag
            w.put_unary(u >> param)
            w.put(u, param)


def _fixed_residual(s: np.ndarray, order: int) -> np.ndarray:
    r = s.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _write_subframe(w: _BitWriter, s: np.ndarray, bps: int,
                    mode: str, lpc: tuple | None = None,
                    po: int = 0, escape_raw: int | None = None) -> None:
    w.put(0, 1)                            # pad
    s = s.astype(np.int64)
    n = len(s)
    if mode == "constant":
        w.put(0, 6)
        w.put(0, 1)
        w.put(int(s[0]), bps)
    elif mode == "verbatim":
        w.put(1, 6)
        w.put(0, 1)
        for v in s:
            w.put(int(v), bps)
    elif mode.startswith("fixed"):
        order = int(mode.split(":")[1])
        w.put(0b001000 | order, 6)
        w.put(0, 1)
        for v in s[:order]:
            w.put(int(v), bps)
        _write_residual(w, _fixed_residual(s, order), po=po, order=order,
                        blocksize=n, escape_raw=escape_raw)
    elif mode == "lpc":
        coefs, shift, precision = lpc
        order = len(coefs)
        w.put(0b100000 | (order - 1), 6)
        w.put(0, 1)
        for v in s[:order]:
            w.put(int(v), bps)
        w.put(precision - 1, 4)
        w.put(shift, 5)
        for c in coefs:
            w.put(int(c), precision)
        res = np.empty(n - order, dtype=np.int64)
        for i in range(order, n):
            acc = sum(int(c) * int(s[i - 1 - j])
                      for j, c in enumerate(coefs))
            res[i - order] = int(s[i]) - (acc >> shift)
        _write_residual(w, res, po=po, order=order, blocksize=n)
    else:
        raise ValueError(f"unknown subframe mode {mode!r}")


def encode_flac(samples: np.ndarray, sample_rate: int, bps: int = 16,
                blocksize: int = 4096, mode: str = "fixed:2",
                stereo: str = "independent", lpc: tuple | None = None,
                po: int = 0, escape_raw: int | None = None) -> bytes:
    """Test-fixture FLAC encoder.  ``mode``: constant | verbatim |
    fixed:K (K=0..4) | lpc (pass ``lpc=(coefs, shift, precision)``);
    ``stereo``: independent | left_side | right_side | mid_side;
    ``po``: Rice partition order; ``escape_raw``: force escaped
    (raw-bits) partitions of that width."""
    if samples.ndim == 1:
        samples = samples.reshape(-1, 1)
    total, nch = samples.shape
    if stereo != "independent" and nch != 2:
        raise ValueError("stereo decorrelation needs 2 channels")
    out = bytearray(b"fLaC")
    v = (min(sample_rate, 0xFFFFF) << 44) | ((nch - 1) << 41) \
        | ((bps - 1) << 36) | total
    streaminfo = (struct.pack(">HH", blocksize, blocksize)
                  + b"\x00\x00\x00" * 2
                  + v.to_bytes(8, "big") + b"\x00" * 16)
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    for fi, off in enumerate(range(0, total, blocksize)):
        chunk = samples[off: off + blocksize].astype(np.int64)
        n = len(chunk)
        w = _BitWriter()
        w.put(0x3FFE, 14)
        w.put(0, 1)
        w.put(0, 1)                        # fixed blocksize strategy
        w.put(0b0111, 4)                   # 16-bit blocksize-1 follows
        w.put(0, 4)                        # sample rate from STREAMINFO
        ch_codes = {"independent": nch - 1, "left_side": _LEFT_SIDE,
                    "right_side": _RIGHT_SIDE, "mid_side": _MID_SIDE}
        w.put(ch_codes[stereo], 4)
        w.put({8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101,
               24: 0b110, 32: 0b111}[bps], 3)
        w.put(0, 1)
        _write_coded_number(w, fi)
        w.put(n - 1, 16)
        w.align()
        w.buf.append(_crc8(bytes(w.buf)))

        if stereo == "independent":
            for c in range(nch):
                _write_subframe(w, chunk[:, c], bps, mode, lpc=lpc,
                                po=po, escape_raw=escape_raw)
        else:
            left = chunk[:, 0]
            right = chunk[:, 1]
            side = left - right
            if stereo == "left_side":
                subs = [(left, bps), (side, bps + 1)]
            elif stereo == "right_side":
                subs = [(side, bps + 1), (right, bps)]
            else:
                subs = [((left + right) >> 1, bps), (side, bps + 1)]
            for s, b in subs:
                _write_subframe(w, s, b, mode, lpc=lpc, po=po,
                                escape_raw=escape_raw)
        w.align()
        frame = bytes(w.buf)
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)

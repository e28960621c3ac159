"""FLAC codec (riko_spark/functions/flaccodec.py).

The decoder is checked against HAND-PACKED bitstreams assembled
bit-by-bit from RFC 9639 in this file (with an independent bit-loop
CRC implementation), so encode->decode round-trips cannot
self-certify; the encoder's output is additionally decoded against
the literal input arrays.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from riko_spark.functions.flaccodec import decode_flac, encode_flac


# --------------------------------------------------- independent test helpers

def crc8_ref(data: bytes) -> int:
    """Bit-at-a-time CRC-8, poly x^8+x^2+x+1 (0x07), init 0."""
    r = 0
    for b in data:
        r ^= b
        for _ in range(8):
            r = ((r << 1) ^ 0x07 if r & 0x80 else r << 1) & 0xFF
    return r


def crc16_ref(data: bytes) -> int:
    """Bit-at-a-time CRC-16, poly 0x8005, init 0."""
    r = 0
    for b in data:
        r ^= b << 8
        for _ in range(8):
            r = ((r << 1) ^ 0x8005 if r & 0x8000 else r << 1) & 0xFFFF
    return r


class BitStr:
    """Textual bit assembly — deliberately unlike the codec's writers."""

    def __init__(self):
        self.s = ""

    def put(self, v: int, k: int):
        self.s += format(v & ((1 << k) - 1), f"0{k}b") if k else ""
        return self

    def raw(self, bits: str):
        self.s += bits
        return self

    def tobytes(self) -> bytes:
        s = self.s + "0" * (-len(self.s) % 8)
        return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))


def streaminfo(sr, ch, bps, total, blocksize=4096) -> bytes:
    v = (sr << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | total
    body = (struct.pack(">HH", blocksize, blocksize) + b"\x00" * 6
            + v.to_bytes(8, "big") + b"\x00" * 16)
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


# ------------------------------------------------------- hand-packed decoding

def test_hand_packed_fixed_order1_frame():
    """Mono frame built bit-by-bit: FIXED order-1 subframe, Rice
    param 1, samples [5, 7, 6, 6] -> residuals [2, -1, 0] -> zigzag
    [4, 1, 0].  Exercises the 8-bit explicit-blocksize path the
    fixture encoder never emits."""
    hdr = BitStr()
    hdr.put(0x3FFE, 14).put(0, 1).put(0, 1)       # sync, reserved, fixed strat
    hdr.put(0b0110, 4)                            # blocksize: 8-bit follows
    hdr.put(0b0000, 4)                            # sample rate: STREAMINFO
    hdr.put(0b0000, 4)                            # 1 channel
    hdr.put(0b100, 3).put(0, 1)                   # 16-bit, reserved
    hdr.put(0x00, 8)                              # coded frame number 0
    hdr.put(3, 8)                                 # blocksize - 1
    hdr_bytes = hdr.tobytes()
    assert len(hdr.s) % 8 == 0

    body = BitStr().raw(format(int.from_bytes(hdr_bytes, "big"),
                               f"0{8 * len(hdr_bytes)}b"))
    body.put(crc8_ref(hdr_bytes), 8)
    body.put(0, 1).put(0b001001, 6).put(0, 1)     # pad, FIXED order 1, no waste
    body.put(5, 16)                               # warmup sample
    body.put(0b00, 2).put(0, 4)                   # Rice 4-bit, partition order 0
    body.put(1, 4)                                # rice param 1
    body.raw("0010")                              # 4 -> q=2 ("001"), r=0
    body.raw("11")                                # 1 -> q=0 ("1"), r=1
    body.raw("10")                                # 0 -> q=0 ("1"), r=0
    frame = body.tobytes()
    blob = (streaminfo(8000, 1, 16, 4) + frame
            + struct.pack(">H", crc16_ref(frame)))

    rate, ch, samples = decode_flac(blob)
    assert (rate, ch) == (8000, 1)
    assert samples[:, 0].tolist() == [5, 7, 6, 6]


def test_hand_packed_constant_with_wasted_bits():
    """CONSTANT subframe with 2 wasted bits: stored value 3 at
    16-2=14 bits must decode as 3 << 2 = 12."""
    hdr = BitStr()
    hdr.put(0x3FFE, 14).put(0, 1).put(0, 1)
    hdr.put(0b0110, 4).put(0, 4).put(0, 4).put(0b100, 3).put(0, 1)
    hdr.put(0x00, 8).put(2, 8)                    # blocksize 3
    hdr_bytes = hdr.tobytes()
    body = BitStr().raw(format(int.from_bytes(hdr_bytes, "big"),
                               f"0{8 * len(hdr_bytes)}b"))
    body.put(crc8_ref(hdr_bytes), 8)
    body.put(0, 1).put(0, 6)                      # pad, CONSTANT
    body.raw("1")                                 # wasted flag
    body.raw("01")                                # unary 1 -> k = 2 wasted bits
    body.put(3, 14)                               # value at bps - k bits
    frame = body.tobytes()
    blob = (streaminfo(8000, 1, 16, 3) + frame
            + struct.pack(">H", crc16_ref(frame)))
    _, _, samples = decode_flac(blob)
    assert samples[:, 0].tolist() == [12, 12, 12]


def test_hand_packed_escape_partition():
    """Escaped Rice partition (param 0b1111): raw 6-bit residuals."""
    hdr = BitStr()
    hdr.put(0x3FFE, 14).put(0, 1).put(0, 1)
    hdr.put(0b0110, 4).put(0, 4).put(0, 4).put(0b100, 3).put(0, 1)
    hdr.put(0x00, 8).put(2, 8)                    # blocksize 3
    hdr_bytes = hdr.tobytes()
    body = BitStr().raw(format(int.from_bytes(hdr_bytes, "big"),
                               f"0{8 * len(hdr_bytes)}b"))
    body.put(crc8_ref(hdr_bytes), 8)
    body.put(0, 1).put(0b001000, 6).put(0, 1)     # FIXED order 0
    body.put(0b00, 2).put(0, 4)                   # Rice, po 0
    body.put(0b1111, 4).put(6, 5)                 # escape, 6 raw bits
    body.put(-20, 6).put(31, 6).put(0, 6)         # two's complement raws
    frame = body.tobytes()
    blob = (streaminfo(8000, 1, 16, 3) + frame
            + struct.pack(">H", crc16_ref(frame)))
    _, _, samples = decode_flac(blob)
    assert samples[:, 0].tolist() == [-20, 31, 0]


def test_utf8_coded_number_multibyte():
    """Frame number 300 -> 2-byte UTF-8-style 110xxxxx 10xxxxxx."""
    hdr = BitStr()
    hdr.put(0x3FFE, 14).put(0, 1).put(0, 1)
    hdr.put(0b0110, 4).put(0, 4).put(0, 4).put(0b100, 3).put(0, 1)
    hdr.put(0b11000100, 8).put(0b10101100, 8)     # 300 = 0b100101100
    hdr.put(0, 8)                                 # blocksize 1
    hdr_bytes = hdr.tobytes()
    body = BitStr().raw(format(int.from_bytes(hdr_bytes, "big"),
                               f"0{8 * len(hdr_bytes)}b"))
    body.put(crc8_ref(hdr_bytes), 8)
    body.put(0, 1).put(0, 6).put(0, 1).put(-1, 16)   # CONSTANT -1
    frame = body.tobytes()
    blob = (streaminfo(8000, 1, 16, 1) + frame
            + struct.pack(">H", crc16_ref(frame)))
    _, _, samples = decode_flac(blob)
    assert samples[:, 0].tolist() == [-1]


# ---------------------------------------------------------------- round trips

@pytest.mark.parametrize("mode", ["verbatim", "fixed:0", "fixed:1",
                                  "fixed:2", "fixed:3", "fixed:4"])
def test_roundtrip_modes_against_literal_input(mode):
    rng = np.random.default_rng(11)
    s = rng.integers(-3000, 3000, size=(700, 1)).astype(np.int16)
    rate, ch, out = decode_flac(encode_flac(s, 44100, mode=mode,
                                            blocksize=256))
    assert (rate, ch) == (44100, 1)
    assert (out[:, 0] == s[:, 0].astype(np.int64)).all()


@pytest.mark.parametrize("stereo", ["independent", "left_side",
                                    "right_side", "mid_side"])
def test_roundtrip_stereo_modes(stereo):
    rng = np.random.default_rng(13)
    s = rng.integers(-20000, 20000, size=(555, 2)).astype(np.int16)
    _, ch, out = decode_flac(encode_flac(s, 8000, mode="fixed:2",
                                         blocksize=192, stereo=stereo))
    assert ch == 2 and (out == s.astype(np.int64)).all()


def test_roundtrip_lpc_and_partitions_and_24bit():
    rng = np.random.default_rng(17)
    s = rng.integers(-3000, 3000, size=(512, 1)).astype(np.int16)
    out = decode_flac(encode_flac(s, 8000, mode="lpc",
                                  lpc=([3, -2, 1], 2, 6)))[2]
    assert (out[:, 0] == s[:, 0].astype(np.int64)).all()
    out = decode_flac(encode_flac(s, 8000, mode="fixed:2", po=4,
                                  blocksize=512))[2]
    assert (out[:, 0] == s[:, 0].astype(np.int64)).all()
    s24 = rng.integers(-(1 << 22), 1 << 22, size=(300, 1))
    out = decode_flac(encode_flac(s24, 48000, bps=24, mode="fixed:1",
                                  blocksize=150))[2]
    assert (out[:, 0] == s24[:, 0]).all()


def test_constant_subframe_roundtrip():
    s = np.full((400, 1), -777, dtype=np.int16)
    _, _, out = decode_flac(encode_flac(s, 8000, mode="constant",
                                        blocksize=200))
    assert (out[:, 0] == -777).all()


# ---------------------------------------------------------------- error paths

def test_errors():
    s = np.arange(-100, 100, dtype=np.int16).reshape(-1, 1)
    blob = bytearray(encode_flac(s, 8000, mode="fixed:1"))
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"RIFFxxxx" + bytes(blob))
    corrupt = bytearray(blob)
    corrupt[-30] ^= 0x10
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(corrupt))
    with pytest.raises(ValueError, match="truncated|total_samples|sync"):
        decode_flac(bytes(blob[:-40]))
    # header CRC-8: flip a bit inside the frame header
    hpos = blob.index(0xFF, 4)
    corrupt = bytearray(blob)
    corrupt[hpos + 3] ^= 0x01
    with pytest.raises(ValueError, match="CRC-8|sync|reserved|blocksize"):
        decode_flac(bytes(corrupt))


def test_decoded_sample_exceeding_bit_depth_rejected():
    # A frame claiming 16-bit samples inside a stream whose STREAMINFO
    # says 8-bit: the decoded CONSTANT 2047 exceeds the stream's
    # declared range and must be rejected, not silently returned.
    hdr = BitStr()
    hdr.put(0x3FFE, 14).put(0, 1).put(0, 1)
    hdr.put(0b0110, 4).put(0, 4).put(0, 4).put(0b100, 3).put(0, 1)
    hdr.put(0x00, 8).put(0, 8)
    hdr_bytes = hdr.tobytes()
    body = BitStr().raw(format(int.from_bytes(hdr_bytes, "big"),
                               f"0{8 * len(hdr_bytes)}b"))
    body.put(crc8_ref(hdr_bytes), 8)
    body.put(0, 1).put(0, 6).put(0, 1)             # CONSTANT, no waste
    body.put(2047, 16)
    frame = body.tobytes()
    blob = (streaminfo(8000, 1, 8, 1) + frame
            + struct.pack(">H", crc16_ref(frame)))
    with pytest.raises(ValueError, match="bit depth"):
        decode_flac(blob)

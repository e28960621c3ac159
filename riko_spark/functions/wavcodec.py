"""Dependency-free WAV codec: RIFF chunk walk + 8/16/24/32-bit PCM and
IEEE float32/float64 decode, ITU-T G.711 µ-law/A-law (wFormatTag 7/6)
companded 8-bit decode, and IMA/DVI ADPCM (wFormatTag 0x11)
block-predictive decode, with stdlib ``struct``/``numpy`` alone.

This is the REAL audio kernel the round-4 review asked for — it
replaces the ``audio_decode_stub`` NotImplementedError.  Compressed
transform codecs (MP3/AAC) still need external libraries and stay out
of scope; PCM WAV is the training-pipeline interchange format, G.711
is the telephony-capture interchange format, and IMA ADPCM is the
legacy game/telephony 4-bit format — all decode from public specs
(RIFF/WAVE layout; G.711's segmented companding formulas; the IMA
Digital Audio Compression & Expansion Algorithms step/index recurrence)
with no dependencies.
"""

from __future__ import annotations

import struct

import numpy as np

#: wFormatTag values we decode: 1 = PCM, 2 is rejected with a clear
#: reason (MS ADPCM), 3 = IEEE float, 6 = A-law, 7 = µ-law,
#: 0x11 = IMA/DVI ADPCM, 0xFFFE = EXTENSIBLE (PCM or float subformat
#: is verified via the GUID prefix)
_WAVE_FORMAT_PCM = 1
_WAVE_FORMAT_IEEE_FLOAT = 3
_WAVE_FORMAT_ALAW = 6
_WAVE_FORMAT_MULAW = 7
_WAVE_FORMAT_IMA_ADPCM = 0x11
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE
_KSDATAFORMAT_PCM_PREFIX = b"\x01\x00\x00\x00"
_KSDATAFORMAT_FLOAT_PREFIX = b"\x03\x00\x00\x00"

#: IMA ADPCM quantizer step sizes (the 89-entry table from the public
#: IMA "Recommended Practices for Enhancing Digital Audio
#: Compatibility" document; ~7 * 1.1^n rounded — the growth-ratio
#: property is asserted by tests so a transcription typo cannot hide).
_IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767], dtype=np.int32)

#: IMA index adjustment per 4-bit code (sign bit ignored): codes 0-3
#: step the index down one, codes 4-7 step it up 2/4/6/8.
_IMA_INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8] * 2, dtype=np.int32)


def _build_ulaw_table() -> np.ndarray:
    """256-entry µ-law byte -> linear int16 expansion table from the
    G.711 formula: the transmitted byte is the 1's complement of
    sign(1) | segment(3) | quantization(4); magnitude rebuilds as
    ((quant << 3) + 33*4/... bias 0x84) shifted by the segment, bias
    removed.  Spot values pinned by the spec: 0x00 -> -32124,
    0x80 -> +32124, 0xFF/0x7F -> 0."""
    codes = np.arange(256, dtype=np.uint16)
    u = (~codes) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84).astype(np.int32)
    t <<= (u & 0x70) >> 4
    out = np.where(u & 0x80, 0x84 - t, t - 0x84)
    return out.astype(np.int16)


def _build_alaw_table() -> np.ndarray:
    """256-entry A-law byte -> linear int16 expansion table from the
    G.711 formula: the transmitted byte is XOR 0x55 (even-bit
    inversion) of sign(1) | segment(3) | quantization(4); segment 0 is
    linear (step 16, offset 8), higher segments double the step.  Spot
    values pinned by the spec: 0x55 -> -8, 0xD5 -> +8, 0x2A -> -32256,
    0xAA -> +32256."""
    codes = np.arange(256, dtype=np.uint16) ^ 0x55
    quant = ((codes & 0x0F) << 4).astype(np.int32)
    seg = (codes & 0x70) >> 4
    mag = np.where(
        seg == 0, quant + 8,
        np.where(seg == 1, quant + 0x108,
                 (quant + 0x108) << np.maximum(seg - 1, 0)))
    out = np.where(codes & 0x80, mag, -mag)
    return out.astype(np.int16)


_ULAW_TABLE = _build_ulaw_table()
_ALAW_TABLE = _build_alaw_table()


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """16-bit PCM WAV from ``(frames,)`` mono or ``(frames, channels)``
    int16 arrays — canonical 44-byte header, little-endian interleave."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    frames, channels = s.shape
    data = s.tobytes()  # row-major == interleaved
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", _WAVE_FORMAT_PCM, channels, sample_rate,
                      byte_rate, channels * 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_g711(codes: np.ndarray, sample_rate: int,
                    law: str = "ulaw") -> bytes:
    """G.711 WAV from RAW companded code bytes — ``(frames,)`` mono or
    ``(frames, channels)`` uint8 arrays written verbatim under
    wFormatTag 7 (µ-law) / 6 (A-law), bits=8.  Deliberately NOT a
    linear->G.711 compressor: fixtures plant code bytes directly and
    assert the decoder's expansion against spec-pinned values, so the
    decode table cannot certify itself through a matching encoder."""
    if law not in ("ulaw", "alaw"):
        raise ValueError("law must be 'ulaw' or 'alaw'")
    s = np.asarray(codes, dtype=np.uint8)
    if s.ndim == 1:
        s = s[:, None]
    _frames, channels = s.shape
    tag = _WAVE_FORMAT_MULAW if law == "ulaw" else _WAVE_FORMAT_ALAW
    fmt = struct.pack("<HHIIHH", tag, channels, sample_rate,
                      sample_rate * channels, channels, 8)
    data = s.tobytes()
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_float(samples: np.ndarray, sample_rate: int,
                     double: bool = False) -> bytes:
    """IEEE-float WAV (wFormatTag 3) from ``(frames,)`` mono or
    ``(frames, channels)`` float arrays in [-1, 1] — written verbatim
    as float32 (or float64 when ``double``), so fixtures plant exact
    bit patterns and the decoder's scaling is checked against an
    independent formula, not a matching compressor."""
    s = np.asarray(samples, dtype="<f8" if double else "<f4")
    if s.ndim == 1:
        s = s[:, None]
    _frames, channels = s.shape
    width = 8 if double else 4
    bits = width * 8
    fmt = struct.pack("<HHIIHHH", _WAVE_FORMAT_IEEE_FLOAT, channels,
                      sample_rate, sample_rate * channels * width,
                      channels * width, bits, 0)
    data = s.tobytes()
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<II", 4, s.shape[0])
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_wide(samples: np.ndarray, sample_rate: int,
                    bits: int = 24) -> bytes:
    """24- or 32-bit integer PCM WAV from int32 samples (full-width
    values; 24-bit writes the low three bytes of each little-endian
    int32 — the spec's packed layout)."""
    if bits not in (24, 32):
        raise ValueError("encode_wav_wide supports 24 or 32 bits")
    s = np.asarray(samples, dtype="<i4")
    if s.ndim == 1:
        s = s[:, None]
    _frames, channels = s.shape
    width = bits // 8
    if bits == 24:
        raw = s.astype("<i4").view(np.uint8).reshape(-1, 4)[:, :3]
        data = raw.tobytes()
    else:
        data = s.tobytes()
    fmt = struct.pack("<HHIIHH", _WAVE_FORMAT_PCM, channels, sample_rate,
                      sample_rate * channels * width, channels * width,
                      bits)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_ima(nibbles: np.ndarray, predictors: np.ndarray,
                   indices: np.ndarray, sample_rate: int) -> bytes:
    """IMA ADPCM WAV from RAW 4-bit codes — mono only.  ``nibbles`` is
    ``(blocks, codes_per_block)`` uint8 (codes_per_block a multiple of
    8), ``predictors``/``indices`` the per-block header state, all
    written VERBATIM: no linear->ADPCM compressor exists in the repo,
    so the decoder's step/index recurrence is checked against
    spec-recomputed expansions (and the driver oracle replays the same
    recurrence in recursive SQL), never against a matching encoder."""
    nib = np.asarray(nibbles, dtype=np.uint8)
    if nib.ndim != 2 or nib.shape[1] % 8:
        raise ValueError("nibbles must be (blocks, 8k) codes")
    nblocks, ncodes = nib.shape
    block_align = 4 + ncodes // 2
    samples_per_block = ncodes + 1
    pred = np.asarray(predictors, dtype="<i2").reshape(nblocks)
    idx = np.asarray(indices, dtype=np.uint8).reshape(nblocks)
    packed = (nib[:, 0::2] | (nib[:, 1::2] << 4)).astype(np.uint8)
    blocks = bytearray()
    for b in range(nblocks):
        blocks += struct.pack("<hBB", int(pred[b]), int(idx[b]), 0)
        blocks += packed[b].tobytes()
    fmt = struct.pack("<HHIIHHHH", _WAVE_FORMAT_IMA_ADPCM, 1,
                      sample_rate,
                      sample_rate * block_align // samples_per_block,
                      block_align, 4, 2, samples_per_block)
    data = bytes(blocks)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<II", 4, nblocks * samples_per_block)
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_ima_adpcm(raw: bytes, channels: int, block_align: int,
                      total_samples: int | None) -> np.ndarray:
    """IMA ADPCM data chunk -> int16 ``(frames, channels)``.

    Block layout (Microsoft WAVE mapping of the IMA algorithm): per
    channel a 4-byte header (int16 predictor = first sample, uint8
    step index, reserved), then 4-byte words of eight 4-bit codes
    (low nibble first) round-robin across channels.  The step/index
    recurrence is the IMA expansion: diff = step>>3 (+step>>2 if b2)
    (+step>>1 if b1) (+step if b0... bits 0/1/2 of the code weight
    step/2^2..2^0), sign bit subtracts; predictor clamps to int16,
    index moves by _IMA_INDEX_TABLE and clamps to [0, 88].

    Vectorized across blocks×channels: the only Python loop is the
    inherently-serial per-sample recurrence within a block."""
    if block_align <= 4 * channels:
        raise ValueError("WAV: IMA ADPCM block smaller than its headers")
    nblocks = len(raw) // block_align
    if nblocks == 0:
        return np.zeros((0, channels), dtype=np.int16)
    blocks = np.frombuffer(
        raw[: nblocks * block_align], dtype=np.uint8
    ).reshape(nblocks, block_align)
    heads = blocks[:, : 4 * channels].reshape(nblocks, channels, 4)
    pred = (heads[:, :, 0].astype(np.int32)
            | (heads[:, :, 1].astype(np.int32) << 8))
    pred = np.where(pred >= 0x8000, pred - 0x10000, pred)
    idx = np.minimum(heads[:, :, 2].astype(np.int32), 88)
    body = blocks[:, 4 * channels:]
    nwords = body.shape[1] // (4 * channels)
    body = body[:, : nwords * 4 * channels].reshape(
        nblocks, nwords, channels, 4)
    # byte j carries codes 2j (low nibble) then 2j+1 (high nibble)
    codes = np.empty((nblocks, channels, nwords * 8), dtype=np.uint8)
    lo = body & 0x0F
    hi = body >> 4
    codes[:, :, 0::2] = lo.transpose(0, 2, 1, 3).reshape(
        nblocks, channels, nwords * 4)
    codes[:, :, 1::2] = hi.transpose(0, 2, 1, 3).reshape(
        nblocks, channels, nwords * 4)
    spb = 1 + nwords * 8
    out = np.empty((nblocks, channels, spb), dtype=np.int16)
    out[:, :, 0] = pred.astype(np.int16)
    step_tab = _IMA_STEP_TABLE
    idx_tab = _IMA_INDEX_TABLE
    for j in range(nwords * 8):
        c = codes[:, :, j].astype(np.int32)
        step = step_tab[idx]
        diff = (step >> 3) + np.where(c & 4, step, 0) \
            + np.where(c & 2, step >> 1, 0) + np.where(c & 1, step >> 2, 0)
        pred = np.clip(pred + np.where(c & 8, -diff, diff),
                       -32768, 32767)
        idx = np.clip(idx + idx_tab[c], 0, 88)
        out[:, :, j + 1] = pred.astype(np.int16)
    frames = out.transpose(0, 2, 1).reshape(nblocks * spb, channels)
    if total_samples is not None:
        frames = frames[:total_samples]
    return frames


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes -> ``(sample_rate, channels, int16 array (frames,
    channels))``.

    Walks RIFF chunks (LIST/INFO/fact chunks between fmt and data are
    skipped per spec, odd-sized chunks consume their pad byte), decodes
    PCM 16-bit natively and PCM 8-bit (unsigned per spec) by recentring
    to int16 range.  WAVE_FORMAT_EXTENSIBLE is accepted when its
    subformat GUID is PCM."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    try:
        return _decode_wav_body(data)
    except struct.error as e:  # truncated header/chunk: one error type
        raise ValueError(f"corrupt WAV data: {e}") from e


def _decode_wav_body(data: bytes) -> tuple[int, int, np.ndarray]:
    pos = 12
    fmt = None
    raw = None
    fact_samples = None
    while pos + 8 <= len(data):
        tag = data[pos: pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body_off = pos + 8
        if tag == b"fmt ":
            fmt = data[body_off: body_off + ln]
        elif tag == b"fact" and ln >= 4:
            (fact_samples,) = struct.unpack_from("<I", data, body_off)
        elif tag == b"data":
            raw = data[body_off: body_off + ln]
        pos = body_off + ln + (ln & 1)  # odd chunks carry a pad byte
        if fmt is not None and raw is not None:
            break
    if fmt is None or raw is None:
        raise ValueError("WAV: missing fmt or data chunk")
    wformat, channels, sample_rate, _brate, balign, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if wformat == _WAVE_FORMAT_EXTENSIBLE:
        # cbSize(2) + validbits(2) + channelmask(4) + GUID(16) at off 16
        if len(fmt) < 40:
            raise ValueError("WAV: truncated EXTENSIBLE fmt chunk")
        guid = fmt[24:28]
        if guid == _KSDATAFORMAT_PCM_PREFIX:
            wformat = _WAVE_FORMAT_PCM
        elif guid == _KSDATAFORMAT_FLOAT_PREFIX:
            wformat = _WAVE_FORMAT_IEEE_FLOAT
        else:
            raise ValueError("WAV: EXTENSIBLE subformat is neither PCM "
                             "nor IEEE float")
    if wformat not in (_WAVE_FORMAT_PCM, _WAVE_FORMAT_IEEE_FLOAT,
                       _WAVE_FORMAT_ALAW, _WAVE_FORMAT_MULAW,
                       _WAVE_FORMAT_IMA_ADPCM):
        raise ValueError(f"WAV: only PCM, IEEE float, G.711 and IMA "
                         f"ADPCM supported, got format {wformat} "
                         "(transform codecs need an audio library)")
    if channels < 1:
        raise ValueError("WAV: zero channels")
    if sample_rate < 1:
        # a zero rate would surface later as an uncontrolled
        # ZeroDivisionError in duration math (frames * 1000 // rate)
        raise ValueError("WAV: zero sample rate")
    if wformat in (_WAVE_FORMAT_ALAW, _WAVE_FORMAT_MULAW):
        if bits != 8:
            raise ValueError(f"WAV: G.711 is 8-bit, got {bits}")
        table = (_ULAW_TABLE if wformat == _WAVE_FORMAT_MULAW
                 else _ALAW_TABLE)
        s = table[np.frombuffer(raw, dtype=np.uint8)]
    elif wformat == _WAVE_FORMAT_IMA_ADPCM:
        if bits != 4:
            raise ValueError(f"WAV: IMA ADPCM is 4-bit, got {bits}")
        frames_arr = _decode_ima_adpcm(raw, channels, balign, fact_samples)
        return sample_rate, channels, frames_arr
    elif wformat == _WAVE_FORMAT_IEEE_FLOAT:
        if bits == 32:
            f = np.frombuffer(raw, dtype="<f4").astype(np.float64)
        elif bits == 64:
            f = np.frombuffer(raw, dtype="<f8")
        else:
            raise ValueError(f"WAV: IEEE float is 32/64-bit, got {bits}")
        # normalized [-1, 1] -> full int16 range, half-up rounding —
        # the same width-independence contract as the 8-bit path
        s = np.floor(np.clip(f, -1.0, 1.0) * 32767.0 + 0.5).astype(
            np.int16)
    elif bits == 16:
        s = np.frombuffer(raw, dtype="<i2")
    elif bits == 24:
        # packed little-endian 3-byte signed: widen to int32, keep the
        # top 16 bits so downstream stats are width-independent
        b = np.frombuffer(raw, dtype=np.uint8)
        b = b[: (len(b) // 3) * 3].reshape(-1, 3).astype(np.int32)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v = np.where(v >= 0x800000, v - 0x1000000, v)
        s = (v >> 8).astype(np.int16)
    elif bits == 32:
        s = (np.frombuffer(raw, dtype="<i4") >> 16).astype(np.int16)
    elif bits == 8:
        # 8-bit PCM is UNSIGNED with midpoint 128: recentre and scale
        # to fill int16 range so downstream stats are width-independent
        s = ((np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128)
             << 8)
    else:
        raise ValueError(f"WAV: only 8/16/24/32-bit PCM supported, "
                         f"got {bits}")
    frames = len(s) // channels
    return sample_rate, channels, s[: frames * channels].reshape(
        frames, channels
    )

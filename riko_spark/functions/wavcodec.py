"""Dependency-free WAV/PCM codec: RIFF chunk walk + 8/16-bit PCM
decode with stdlib ``struct``/``numpy`` alone.

This is the REAL audio kernel the round-4 review asked for — it
replaces the ``audio_decode_stub`` NotImplementedError.  Compressed
codecs (MP3/AAC/FLAC) still need external libraries and stay out of
scope; PCM WAV is the training-pipeline interchange format and decodes from
the public RIFF/WAVE spec with no dependencies.
"""

from __future__ import annotations

import struct

import numpy as np

#: wFormatTag values we decode: 1 = PCM, 0xFFFE = EXTENSIBLE (PCM
#: subformat is verified via the GUID prefix)
_WAVE_FORMAT_PCM = 1
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE
_KSDATAFORMAT_PCM_PREFIX = b"\x01\x00\x00\x00"


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
    while pos + 8 <= len(data):
        tag = data[pos: pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body_off = pos + 8
        if tag == b"fmt ":
            fmt = data[body_off: body_off + ln]
        elif tag == b"data":
            raw = data[body_off: body_off + ln]
        pos = body_off + ln + (ln & 1)  # odd chunks carry a pad byte
        if fmt is not None and raw is not None:
            break
    if fmt is None or raw is None:
        raise ValueError("WAV: missing fmt or data chunk")
    wformat, channels, sample_rate, _brate, _balign, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if wformat == _WAVE_FORMAT_EXTENSIBLE:
        # cbSize(2) + validbits(2) + channelmask(4) + GUID(16) at off 16
        if len(fmt) < 40 or fmt[24:28] != _KSDATAFORMAT_PCM_PREFIX:
            raise ValueError("WAV: EXTENSIBLE subformat is not PCM")
    elif wformat != _WAVE_FORMAT_PCM:
        raise ValueError(f"WAV: only PCM supported, got format {wformat} "
                         "(compressed codecs need an audio library)")
    if channels < 1:
        raise ValueError("WAV: zero channels")
    if sample_rate < 1:
        # a zero rate would surface later as an uncontrolled
        # ZeroDivisionError in duration math (frames * 1000 // rate)
        raise ValueError("WAV: zero sample rate")
    if bits == 16:
        s = np.frombuffer(raw, dtype="<i2")
    elif bits == 8:
        # 8-bit PCM is UNSIGNED with midpoint 128: recentre and scale
        # to fill int16 range so downstream stats are width-independent
        s = ((np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128)
             << 8)
    else:
        raise ValueError(f"WAV: only 8/16-bit PCM supported, got {bits}")
    frames = len(s) // channels
    return sample_rate, channels, s[: frames * channels].reshape(
        frames, channels
    )

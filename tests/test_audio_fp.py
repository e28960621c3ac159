"""Acoustic fingerprint + audio near-dup
(riko_spark/operators/multimodal.py: audio_fingerprint_op /
audio_neardup_op).

Fixtures are synthesized sinusoid mixtures on exact rFFT bins; the
expected invariances (uniform gain, time shift) and discriminations
(band-energy re-ordering) are properties of the published
gradient-sign scheme, asserted directly — never round-tripped through
the operator under test.
"""

from __future__ import annotations

import numpy as np
import pytest

from riko_spark.functions.wavcodec import encode_wav
from riko_spark.operators.multimodal import (
    audio_fingerprint_op,
    audio_neardup_op,
)

from tests.conftest import rows

SR, N, FLEN = 4096, 4096, 512


def _mix(band_amps, gain=1.0, shift=0, channels=1):
    """9-band sinusoid mixture, one exact-bin component per band."""
    bins = [(257 * b) // 9 + 14 for b in range(9)]
    j = np.arange(N, dtype=np.float64) + shift
    s = np.zeros(N)
    for a, k in zip(band_amps, bins):
        s += a * np.sin(2 * np.pi * k * j / FLEN)
    s = np.round(s * gain).astype(np.int16)
    if channels == 2:
        s = np.stack([s, s], axis=1)
    else:
        s = s.reshape(-1, 1)
    return encode_wav(s, SR)


RISING = [100.0 * 1.3 ** b for b in range(9)]      # all gradient bits 1
FALLING = list(reversed(RISING))                     # all gradient bits 0


def _fp(spark, items):
    df = spark.createDataFrame(items, "id long, blob binary")
    return {r["id"]: r["afp"] for r in rows(audio_fingerprint_op(df))}


def test_gradient_sign_extremes(spark):
    got = _fp(spark, [(1, bytearray(_mix(RISING))),
                      (2, bytearray(_mix(FALLING)))])
    # 8 frames x 8 rising comparisons = every fingerprint bit set
    assert got[1] == -1          # 0xFFFF... as signed int64
    assert got[2] == 0


def test_invariant_to_gain_shift_and_channels(spark):
    # x1.5 up/down amplitude walk: unambiguous gradient signs
    amps, a = [], 400.0
    for b in range(9):
        amps.append(a)
        a = a * 1.5 if b % 3 else a / 1.5
    base = _mix(amps)
    got = _fp(spark, [
        (1, bytearray(base)),
        (2, bytearray(_mix(amps, gain=1.07))),
        (3, bytearray(_mix(amps, shift=21))),
        (4, bytearray(_mix(amps, channels=2))),
    ])
    assert got[1] == got[2] == got[3] == got[4]


def test_distinct_spectra_differ(spark):
    a1, a2 = list(RISING), list(RISING)
    a2[3], a2[4] = a2[4], a2[3]  # swap two bands -> gradient flips
    got = _fp(spark, [(1, bytearray(_mix(a1))), (2, bytearray(_mix(a2)))])
    assert got[1] != got[2]


def test_short_audio_skip_and_raise(spark):
    blob = bytearray(encode_wav(np.zeros((40, 1), dtype=np.int16), SR))
    df = spark.createDataFrame([(1, blob)], "id long, blob binary")
    assert rows(audio_fingerprint_op(df)) == []
    with pytest.raises(Exception, match="too short"):
        audio_fingerprint_op(df, {"on_undecodable": "raise"}).collect()


def test_neardup_pairs_planted(spark):
    items = []
    for g, amps in enumerate((RISING, FALLING)):
        for m in range(3):
            items.append((g * 10 + m,
                          bytearray(_mix(amps, gain=1 + m / 50,
                                         shift=5 * m))))
    out = rows(audio_neardup_op(
        spark.createDataFrame(items, "id long, blob binary")))
    pairs = {(r["left_id"], r["right_id"]) for r in out}
    assert pairs == {(0, 1), (0, 2), (1, 2), (10, 11), (10, 12), (11, 12)}
    assert all(r["hamming"] == 0 for r in out)


def test_wav_flac_transcode_pairs_as_neardup(spark):
    """The same PCM delivered as WAV and as FLAC (lossless) must
    fingerprint identically — audio_neardup finds transcode pairs."""
    from riko_spark.functions.flaccodec import encode_flac

    bins = [(257 * b) // 9 + 14 for b in range(9)]
    j = np.arange(N, dtype=np.float64)
    s = np.zeros(N)
    for b, k in enumerate(bins):
        s += (300 * 1.4 ** (b % 3)) * np.sin(2 * np.pi * k * j / FLEN)
    pcm = np.round(s).astype(np.int16).reshape(-1, 1)
    wav = bytearray(encode_wav(pcm, SR))
    flac = bytearray(encode_flac(pcm, SR, mode="fixed:2"))
    out = rows(audio_neardup_op(spark.createDataFrame(
        [(1, wav), (2, flac)], "id long, blob binary")))
    assert [(r["left_id"], r["right_id"], r["hamming"])
            for r in out] == [(1, 2, 0)]


def test_registry_names():
    from riko_spark.operators import get_operator

    assert get_operator("audio_fingerprint") is audio_fingerprint_op
    assert get_operator("audio_neardup") is audio_neardup_op

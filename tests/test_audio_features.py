"""Audio featurization (operators/multimodal.audio_feature_vector /
audio_features): integer features exact by construction, spectral
features parity-checked against direct numpy."""

from __future__ import annotations

import numpy as np
import pytest

from big_ann_spark.operators.multimodal import (
    audio_feature_vector,
    audio_features,
    encode_wav_pcm16,
)


def test_zcr_energy_peak_exact():
    alt = np.array([100, -100] * 50, dtype=np.int16)
    f = audio_feature_vector(alt, 8000)
    assert f["zcr"] == 99
    assert f["energy"] == 100 * 10000
    assert f["peak"] == 100

    const = np.full(64, 7, dtype=np.int16)
    assert audio_feature_vector(const, 8000)["zcr"] == 0

    # zeros break a sign-change run (strict product < 0 definition)
    z = np.array([5, 0, -5], dtype=np.int16)
    assert audio_feature_vector(z, 8000)["zcr"] == 0

    empty = audio_feature_vector(np.array([], dtype=np.int16), 8000)
    assert empty == {
        "zcr": 0, "energy": 0, "peak": 0,
        "spectral_centroid": 0.0, "spectral_rolloff": 0.0,
    }


def test_energy_no_int16_overflow():
    # int16 squares must accumulate in int64, not wrap
    s = np.full(1000, 32000, dtype=np.int16)
    assert audio_feature_vector(s, 8000)["energy"] == 1000 * 32000 * 32000


def test_pure_tone_centroid_near_tone_freq():
    rate, n, tone = 8000, 2048, 1000
    t = np.arange(n) / rate
    s = (10000 * np.sin(2 * np.pi * tone * t)).astype(np.int16)
    f = audio_feature_vector(s, rate)
    # spectral mass concentrates at the tone; DC/leakage pulls a bit
    assert abs(f["spectral_centroid"] - tone) < 100
    assert f["spectral_rolloff"] >= tone - 50
    # parity with the direct numpy formulation
    mag = np.abs(np.fft.rfft(s.astype(np.float64)))
    freqs = np.fft.rfftfreq(n, 1 / rate)
    assert f["spectral_centroid"] == pytest.approx(
        float((freqs * mag).sum() / mag.sum())
    )


def test_audio_features_dataframe(spark):
    clips = {
        1: np.array([100, -100] * 32, dtype=np.int16),
        2: np.full(64, 5, dtype=np.int16),
    }
    df = spark.createDataFrame(
        [(k, bytearray(encode_wav_pcm16(v, rate=8000))) for k, v in clips.items()],
        "doc_id long, media binary",
    )
    rows = {r.doc_id: r for r in audio_features(df).collect()}
    assert rows[1].zcr == 63 and rows[1].energy == 64 * 10000 and rows[1].peak == 100
    assert rows[2].zcr == 0 and rows[2].energy == 64 * 25
    assert all(r.sample_rate == 8000 and r.n_frames == 64 for r in rows.values())

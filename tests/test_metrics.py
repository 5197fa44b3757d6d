"""Metric tests: STOI properties + resampler parity with scipy + bss_eval."""

import numpy as np
import pytest

import jax.numpy as jnp

from speech_enhancement_clskd_tpu.metrics import bss_eval_single, eval_metrics
from speech_enhancement_clskd_tpu.metrics.stoi import resample, stoi, stoi_batch


def speechy(rng, T=32000, fs=16000):
    """Broadband speech-like signal: STOI's 15 third-octave bands (150 Hz -
    4.3 kHz) all need clean energy, else empty-band correlations ~0 drag the
    score for ANY implementation (pystoi included)."""
    t = np.arange(T) / fs
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.7 * t)
    phase = 2 * np.pi * np.cumsum(f0) / fs
    x = sum((1.0 / h) * np.sin(h * phase) for h in range(1, 30))
    # broadband fricative-ish component
    x = x + 1.0 * np.convolve(
        rng.standard_normal(T), np.hanning(8), mode="same"
    )
    env = 0.6 + 0.4 * np.sin(2 * np.pi * 3.1 * t)
    return (x * env / np.abs(x * env).max() * 0.5).astype(np.float32)


def test_resample_matches_scipy(rng):
    from scipy.signal import resample_poly

    x = rng.standard_normal(16000).astype(np.float32)
    ours = np.asarray(resample(jnp.asarray(x), 16000, 10000))
    ref = resample_poly(x, 5, 8, window=("kaiser", 5.0))
    n = min(len(ours), len(ref))
    # ignore filter edge effects
    np.testing.assert_allclose(ours[50 : n - 50], ref[50 : n - 50], atol=5e-4)


def test_stoi_identity(rng):
    x = speechy(rng)
    s = float(stoi(jnp.asarray(x), jnp.asarray(x)))
    assert s > 0.99


def test_stoi_monotone_in_noise(rng):
    x = speechy(rng)
    vals = []
    for sigma in (0.01, 0.05, 0.2, 0.8):
        y = x + sigma * rng.standard_normal(len(x)).astype(np.float32)
        vals.append(float(stoi(jnp.asarray(x), jnp.asarray(y))))
    assert vals[0] > 0.9
    assert all(a > b for a, b in zip(vals, vals[1:])), vals
    assert vals[-1] < 0.55


def test_stoi_scale_invariant_in_degraded(rng):
    x = speechy(rng)
    y = x + 0.1 * rng.standard_normal(len(x)).astype(np.float32)
    s1 = float(stoi(jnp.asarray(x), jnp.asarray(y)))
    s2 = float(stoi(jnp.asarray(x), jnp.asarray(3.0 * y)))
    np.testing.assert_allclose(s1, s2, atol=1e-3)


def test_stoi_batch_matches_single(rng):
    x = np.stack([speechy(rng), speechy(rng) * 0.7])
    y = x + 0.1 * rng.standard_normal(x.shape).astype(np.float32)
    b = np.asarray(stoi_batch(jnp.asarray(x), jnp.asarray(y)))
    for i in range(2):
        s = float(stoi(jnp.asarray(x[i]), jnp.asarray(y[i])))
        np.testing.assert_allclose(b[i], s, atol=1e-5)


def test_stoi_silence_handling(rng):
    # long silent stretch: silent frames must not dilute the score
    x = speechy(rng)
    x[:8000] = 0.0
    y = x + 0.05 * rng.standard_normal(len(x)).astype(np.float32)
    s = float(stoi(jnp.asarray(x), jnp.asarray(y)))
    assert 0.5 < s <= 1.0


def test_bss_eval_single(rng):
    ref = speechy(rng)
    # filtered reference (allowed distortion) should score very high
    filt = np.convolve(ref, [0.9, 0.1], mode="same").astype(np.float32)
    m = bss_eval_single(ref, filt)
    assert m["sdr"] > 30
    # estimate at exactly 10 dB SNR scores ~10 dB SDR
    noise = rng.standard_normal(len(ref)).astype(np.float32)
    noise *= np.sqrt(np.mean(ref**2) / np.mean(noise**2) / 10.0)  # 10 dB
    m2 = bss_eval_single(ref, ref + noise)
    assert 8 < m2["sdr"] < 14, m2
    assert m2["sdr"] == m2["sar"]


def test_eval_metrics_bundle(rng):
    clean = speechy(rng)
    mix = clean + 0.2 * rng.standard_normal(len(clean)).astype(np.float32)
    est = clean + 0.05 * rng.standard_normal(len(clean)).astype(np.float32)
    m = eval_metrics(mix, clean, est, compute_pesq=False)
    for k in ("si_sdr", "sdr", "sar", "stoi"):
        assert k in m and "input_" + k in m
        assert m[k] > m["input_" + k]  # the 'enhanced' version is better

"""Native C++ PESQ: build, monotonicity, invariances, eval integration."""

import numpy as np
import pytest

from speech_enhancement_clskd_tpu.metrics.pesq import pesq_wb


@pytest.fixture(scope="module")
def clean(rng=None):
    r = np.random.default_rng(0)
    fs, T = 16000, 48000
    t = np.arange(T) / fs
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.7 * t)
    ph = 2 * np.pi * np.cumsum(f0) / fs
    x = sum((1.0 / h) * np.sin(h * ph) for h in range(1, 30))
    x = x + np.convolve(r.standard_normal(T), np.hanning(8), mode="same")
    env = 0.6 + 0.4 * np.sin(2 * np.pi * 3.1 * t)
    return (x * env / np.abs(x * env).max() * 0.5).astype(np.float32)


def test_identity_is_max(clean):
    assert pesq_wb(clean, clean) > 4.5


def test_monotone_in_snr(clean):
    r = np.random.default_rng(1)
    scores = []
    for snr in (40, 30, 20, 10):
        n = r.standard_normal(len(clean)).astype(np.float32)
        n *= np.sqrt(np.mean(clean**2) / np.mean(n**2) / 10 ** (snr / 10))
        scores.append(pesq_wb(clean, clean + n))
    # monotone non-increasing, strictly decreasing until the 1.0 floor
    assert all(a >= b for a, b in zip(scores, scores[1:])), scores
    assert all(
        a > b for a, b in zip(scores, scores[1:]) if b > 1.0 + 1e-9
    ), scores
    assert scores[0] > 4.0  # 40 dB barely degraded
    assert scores[-1] < 1.5  # 10 dB white noise scores low at 79 dB SPL
    assert 1.0 <= min(scores) and max(scores) <= 4.64


def test_level_invariance(clean):
    r = np.random.default_rng(2)
    n = 0.1 * r.standard_normal(len(clean)).astype(np.float32)
    a = pesq_wb(clean, clean + n)
    b = pesq_wb(clean, 0.25 * (clean + n))
    assert abs(a - b) < 0.05


def test_delay_compensation(clean):
    delayed = np.concatenate(
        [np.zeros(800, np.float32), clean]
    )[: len(clean)]
    # a 50 ms shift is compensated: near-transparent score (the residual gap
    # to 4.64 is the truncated tail), far above what misalignment would give
    assert pesq_wb(clean, delayed) > 3.9


def test_too_short_input():
    x = np.zeros(1000, np.float32)
    assert pesq_wb(x, x) == 1.0


def test_eval_metrics_includes_pesq():
    from speech_enhancement_clskd_tpu.metrics import eval_metrics

    r = np.random.default_rng(3)
    c = r.standard_normal(16000).astype(np.float32) * 0.2
    mix = c + 0.1 * r.standard_normal(16000).astype(np.float32)
    est = c + 0.02 * r.standard_normal(16000).astype(np.float32)
    m = eval_metrics(mix, c, est, compute_pesq=True)
    assert "pesq" in m and "input_pesq" in m
    assert m["pesq"] > m["input_pesq"]

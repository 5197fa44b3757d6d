"""Multi-scale log-mel perceptual distance (reference tools_for_loss.py:124-252).

The triangular mel filterbank is built on the host in numpy (static), the
distance itself is a pair of MXU matmuls + elementwise log/rmse.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np

MEL_SCALES = (16, 32, 64)


def _freq_to_mel(freq: float) -> float:
    return 1127.01048 * math.log(1 + freq / 700.0)


def _mel_to_freq(mel: float) -> float:
    return 700 * (math.exp(mel / 1127.01048) - 1)


@functools.lru_cache(maxsize=16)
def mel_filterbank(num_coeffs: int, fft_size: int, sample_rate: int = 16000) -> np.ndarray:
    """Triangular mel filters, one per row: [num_coeffs, fft_size//2 + 1].

    Parity with reference ``melFilterBank`` (tools_for_loss.py:133-177),
    including its floor-to-bin center mapping.
    """
    max_hz = sample_rate / 2
    n_bins = fft_size // 2 + 1
    max_mel = _freq_to_mel(max_hz)
    centers = np.arange(num_coeffs + 2, dtype=np.float64) * max_mel / (num_coeffs + 1)
    bins = np.array(
        [math.floor(n_bins * _mel_to_freq(m) / max_hz) for m in centers], dtype=np.int64
    )
    fb = np.zeros((num_coeffs, n_bins), dtype=np.float32)
    for i in range(1, num_coeffs + 1):
        lo, mid, hi = bins[i - 1], bins[i], bins[i + 1]
        for j in range(lo, mid):
            fb[i - 1, j] = (j - lo) / (mid - lo)
        for j in range(mid, hi):
            fb[i - 1, j] = 1 - (j - mid) / (hi - mid)
    return fb


def perceptual_distance(
    y_true: jnp.ndarray,
    y_pred: jnp.ndarray,
    fft_size: int = 512,
    sample_rate: int = 16000,
    scales: Sequence[int] = MEL_SCALES,
) -> jnp.ndarray:
    """Multi-scale log-mel RMSE between magnitude spectra [..., F]
    (tools_for_loss.py:195-239)."""
    F = fft_size // 2 + 1
    pt = y_true.reshape(-1, F) / fft_size
    pp = y_pred.reshape(-1, F) / fft_size
    dists = []
    for scale in scales:
        fb = jnp.asarray(mel_filterbank(scale, fft_size, sample_rate).T)
        lt = jnp.log(pt @ fb + 1e-7)
        lp = jnp.log(pp @ fb + 1e-7)
        mse = jnp.mean((lp - lt) ** 2, axis=-1)
        dists.append(jnp.mean(jnp.sqrt(mse + 1e-7)))
    return jnp.mean(jnp.stack(dists))


def array_mel_loss(clean_mags: jnp.ndarray, est_mags: jnp.ndarray, **kw) -> jnp.ndarray:
    """Mean per-utterance perceptual distance (tools_for_loss.py:245-252)."""
    B = clean_mags.shape[0]
    losses = [perceptual_distance(clean_mags[i], est_mags[i], **kw) for i in range(B)]
    return jnp.mean(jnp.stack(losses))

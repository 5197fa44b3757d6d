"""Spectral losses: spectral convergence + log-STFT magnitude + MRSTFT.

Pure-function redesign of the reference module stack (framework.py:35-146).
All distill scripts use the single-resolution [512/100/400] configuration
(reference distill.py:59) and consume only the magnitude term.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from ..ops.stft import stft_magnitude


def spectral_convergence(x_mag: jnp.ndarray, y_mag: jnp.ndarray) -> jnp.ndarray:
    """||Y - X||_F / ||Y||_F (framework.py:35-50)."""
    return jnp.linalg.norm(y_mag - x_mag) / jnp.linalg.norm(y_mag)


def log_stft_magnitude(x_mag: jnp.ndarray, y_mag: jnp.ndarray) -> jnp.ndarray:
    """L1 between log magnitudes (framework.py:53-68)."""
    return jnp.mean(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)))


def stft_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    fft_size: int = 1024,
    hop_size: int = 120,
    win_length: int = 600,
    window: str = "hann",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-resolution (sc, mag) pair (framework.py:72-99)."""
    x_mag = stft_magnitude(x, fft_size, hop_size, win_length, window)
    y_mag = stft_magnitude(y, fft_size, hop_size, win_length, window)
    return spectral_convergence(x_mag, y_mag), log_stft_magnitude(x_mag, y_mag)


def multi_resolution_stft_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    fft_sizes: Sequence[int] = (1024, 2048, 512),
    hop_sizes: Sequence[int] = (120, 240, 50),
    win_lengths: Sequence[int] = (600, 1200, 240),
    window: str = "hann",
    factor_sc: float = 0.1,
    factor_mag: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Averaged multi-resolution (sc, mag) (framework.py:104-146)."""
    assert len(fft_sizes) == len(hop_sizes) == len(win_lengths)
    sc = 0.0
    mag = 0.0
    for fs, hs, wl in zip(fft_sizes, hop_sizes, win_lengths):
        s, m = stft_loss(x, y, fs, hs, wl, window)
        sc += s
        mag += m
    n = len(fft_sizes)
    return factor_sc * sc / n, factor_mag * mag / n

"""Synthetic speech-enhancement dataset.

Deterministic speech-like clean signals (harmonic stacks with pitch/energy
modulation and voiced/unvoiced alternation) mixed with shaped noise at random
SNR.  Fills the role of LibriMix when the corpus is not on disk (this
environment ships only the CSV manifests, reference data/wav16k/*) — the
training pipeline, benches and tests all run on it.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


class SyntheticEnhancementDataset:
    """Map-style dataset yielding (mixture [T], source [1, T]) float32 pairs."""

    def __init__(
        self,
        size: int = 2048,
        segment: float = 3.0,
        sample_rate: int = 16000,
        snr_range: Tuple[float, float] = (-2.0, 12.0),
        seed: int = 0,
    ):
        self.size = size
        self.sample_rate = sample_rate
        self.samples = int(segment * sample_rate)
        self.snr_range = snr_range
        self.seed = seed

    def __len__(self) -> int:
        return self.size

    def _clean(self, rng: np.random.Generator) -> np.ndarray:
        T = self.samples
        sr = self.sample_rate
        t = np.arange(T) / sr
        # pitch contour: slow random walk around 80-260 Hz
        f0 = 120.0 * np.exp(0.4 * np.cumsum(rng.standard_normal(8)) / 8)
        f0 = np.clip(np.interp(t, np.linspace(0, t[-1], 8), f0), 70, 280)
        phase = 2 * np.pi * np.cumsum(f0) / sr
        x = np.zeros(T)
        for h in range(1, 9):  # harmonic stack with decaying amplitude
            x += (1.0 / h) * np.sin(h * phase + rng.uniform(0, 2 * np.pi))
        # formant-ish coloration via short random FIR
        fir = rng.standard_normal(33) * np.hanning(33)
        x = np.convolve(x, fir / (np.abs(fir).sum() + 1e-8), mode="same")
        # syllabic energy modulation (~3-5 Hz) with pauses
        env = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(2.5, 5.0) * t
                                + rng.uniform(0, 2 * np.pi)))
        env = env ** 1.5
        gate = (np.interp(t, np.linspace(0, t[-1], 12),
                          rng.random(12)) > 0.25).astype(np.float64)
        x = x * env * gate
        # unvoiced bursts
        burst = rng.standard_normal(T) * (
            np.interp(t, np.linspace(0, t[-1], 24), rng.random(24)) > 0.8
        )
        x = x + 0.15 * burst
        x = x / (np.max(np.abs(x)) + 1e-8) * 0.5
        return x.astype(np.float32)

    def _noise(self, rng: np.random.Generator) -> np.ndarray:
        T = self.samples
        n = rng.standard_normal(T)
        # pink-ish shaping in the freq domain
        spec = np.fft.rfft(n)
        f = np.maximum(np.fft.rfftfreq(T, 1 / self.sample_rate), 20.0)
        spec = spec / f ** rng.uniform(0.2, 0.8)
        n = np.fft.irfft(spec, T)
        return (n / (np.std(n) + 1e-8)).astype(np.float32)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        rng = np.random.default_rng((self.seed, idx))
        clean = self._clean(rng)
        noise = self._noise(rng)
        snr_db = rng.uniform(*self.snr_range)
        p_c = np.mean(clean**2) + 1e-10
        p_n = np.mean(noise**2) + 1e-10
        scale = np.sqrt(p_c / p_n / (10 ** (snr_db / 10)))
        mix = clean + scale * noise
        peak = np.max(np.abs(mix))
        if peak > 1.0:
            mix = mix / peak
            clean = clean / peak
        return mix.astype(np.float32), clean[None].astype(np.float32)

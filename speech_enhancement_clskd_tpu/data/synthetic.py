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
        profile: str = "default",
    ):
        """``profile='hard'``: the tougher quality-proxy corpus (VERDICT r3
        missing #1) — wider SNR (-5..15 dB), a mixture of noise TYPES
        (pink / multi-talker babble / tonal hum / impulsive clicks / white)
        and 50% synthetic-room reverberation on the speech contribution
        (dry clean stays the target, so the task is joint denoise +
        dereverb).  'default' is byte-identical to previous rounds."""
        self.size = size
        self.sample_rate = sample_rate
        self.samples = int(segment * sample_rate)
        if profile not in ("default", "hard"):
            raise ValueError(f"unknown synthetic profile {profile!r}")
        self.profile = profile
        self.snr_range = (-5.0, 15.0) if profile == "hard" else snr_range
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

    def _noise_hard(self, rng: np.random.Generator) -> np.ndarray:
        """One of five noise types, weighted toward the structured ones."""
        T = self.samples
        kind = rng.choice(
            ["pink", "babble", "hum", "clicks", "white"],
            p=[0.3, 0.25, 0.15, 0.15, 0.15],
        )
        if kind == "pink":
            n = self._noise(rng)
        elif kind == "babble":
            # 3 competing speech-like talkers (the hardest case for a
            # denoiser: noise statistics match the target's)
            n = np.zeros(T, np.float32)
            for _ in range(3):
                n += self._clean(rng) * rng.uniform(0.5, 1.0)
        elif kind == "hum":
            t = np.arange(T) / self.sample_rate
            f = rng.uniform(50, 300)
            n = np.zeros(T)
            for h in range(1, 6):
                n += (1.0 / h) * np.sin(
                    2 * np.pi * h * f * t + rng.uniform(0, 2 * np.pi)
                )
            n *= 0.6 + 0.4 * np.sin(2 * np.pi * rng.uniform(0.5, 3.0) * t)
        elif kind == "clicks":
            n = np.zeros(T)
            for _ in range(rng.integers(5, 30)):
                pos = rng.integers(0, T - 400)
                dur = int(rng.integers(40, 400))
                n[pos : pos + dur] += (
                    rng.standard_normal(dur)
                    * np.exp(-np.arange(dur) / (dur / 4))
                    * rng.uniform(1.0, 4.0)
                )
        else:
            n = rng.standard_normal(T)
        n = np.asarray(n, np.float64)
        return (n / (np.std(n) + 1e-8)).astype(np.float32)

    def _reverb(self, x: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        """Synthetic exponentially-decaying room response (direct path kept
        at unit gain; RT-ish decay 80-400 ms)."""
        sr = self.sample_rate
        tau = rng.uniform(0.08, 0.4) / 6.9  # RT60 -> 1/e time
        L = int(0.5 * sr)
        t = np.arange(L) / sr
        rir = rng.standard_normal(L) * np.exp(-t / tau)
        rir[0] = 0.0
        rir *= rng.uniform(0.2, 0.5) / (np.max(np.abs(rir)) + 1e-8)
        rir[0] = 1.0  # direct path
        wet = np.convolve(x.astype(np.float64), rir)[: len(x)]
        return wet.astype(np.float32)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        rng = np.random.default_rng((self.seed, idx))
        clean = self._clean(rng)
        if self.profile == "hard":
            noise = self._noise_hard(rng)
            speech = self._reverb(clean, rng) if rng.random() < 0.5 else clean
        else:
            noise = self._noise(rng)
            speech = clean
        snr_db = rng.uniform(*self.snr_range)
        p_c = np.mean(speech**2) + 1e-10
        p_n = np.mean(noise**2) + 1e-10
        scale = np.sqrt(p_c / p_n / (10 ** (snr_db / 10)))
        mix = speech + scale * noise
        peak = np.max(np.abs(mix))
        if peak > 1.0:
            mix = mix / peak
            clean = clean / peak
        return mix.astype(np.float32), clean[None].astype(np.float32)

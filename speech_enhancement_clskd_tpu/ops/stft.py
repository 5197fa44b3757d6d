"""Framed STFT / iSTFT as MXU matmuls.

TPU-native re-design of the reference's conv-based STFT frontend
(reference ``tools_for_model.py:15-109``: DFT-basis conv1d with stride=hop and
an overlap-added squared-window normalizer for the inverse).  Behaviour parity:

- analysis pads ``win_len - hop`` on both sides, frames at ``hop``, windows, and
  projects onto the real-DFT basis, producing a packed ``[B, 2F, T]`` spectrum
  (first F channels real, last F imaginary, F = fft_len//2 + 1);
- synthesis projects back with the pseudo-inverse basis, overlap-adds, divides
  by the overlap-added squared window (+1e-8), and trims ``win_len - hop`` from
  both ends.

TPU-first design choices (not a port):

- framing and overlap-add are pure reshape/slice arithmetic when
  ``win_len % hop == 0`` (the DCCRN case: 400/100) — no gather/scatter, so XLA
  keeps everything in registers/VMEM;
- the DFT projection is a single ``[B*T, win] @ [win, 2F]`` matmul that maps
  straight onto the MXU (vs. the reference's 514-channel conv1d);
- the squared-window envelope depends only on the static frame count, so it is
  precomputed in numpy at trace time — zero on-device cost.

Also provides ``stft_magnitude`` with torch.stft-compatible centering for the
MRSTFT loss family (reference ``framework.py:16-32``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import get_window


class STFTKernels(NamedTuple):
    """Precomputed analysis/synthesis bases (host numpy; closed over by jit)."""

    win_len: int
    hop: int
    fft_len: int
    fwd: np.ndarray  # [win_len, 2F]  windowed real-DFT basis
    inv: np.ndarray  # [2F, win_len]  windowed pseudo-inverse basis
    window: np.ndarray  # [win_len]


def make_kernels(
    win_len: int = 400,
    hop: int = 100,
    fft_len: int = 512,
    window: Optional[str] = "hamming",
) -> STFTKernels:
    """Build DFT bases matching the reference frontend (tools_for_model.py:15-32)."""
    if window is None or window == "None":
        win = np.ones(win_len)
    else:
        win = get_window(window, win_len, fftbins=True)
    # Real-DFT basis restricted to the window support: row n holds
    # [cos(2*pi*n*k/N) for k<=N/2] ++ [-sin(2*pi*n*k/N) for k<=N/2].
    basis = np.fft.rfft(np.eye(fft_len))[:win_len]  # [win, F] complex
    fwd = np.concatenate([basis.real, basis.imag], axis=1)  # [win, 2F]
    # Synthesis uses the pseudo-inverse of the analysis map (torch-stft trick).
    inv = (np.linalg.pinv(fwd.T).T * win[None, :]).astype(np.float32)  # [2F, win]
    fwd = (fwd * win[:, None]).astype(np.float32)
    return STFTKernels(win_len, hop, fft_len, fwd, inv, win.astype(np.float32))


# ---------------------------------------------------------------------------
# framing / overlap-add (slice arithmetic, no gather/scatter)
# ---------------------------------------------------------------------------


def frame(x: jnp.ndarray, win_len: int, hop: int) -> jnp.ndarray:
    """[..., T] -> [..., n_frames, win_len] with stride ``hop`` (T assumed padded)."""
    T = x.shape[-1]
    n_frames = (T - win_len) // hop + 1
    if win_len % hop == 0:
        r = win_len // hop
        usable = (n_frames - 1) * hop + win_len
        x = x[..., :usable]
        pad_to = ((n_frames - 1 + r) * hop) - usable
        if pad_to:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad_to)])
        blocks = x.reshape(x.shape[:-1] + (n_frames - 1 + r, hop))
        parts = [blocks[..., j : j + n_frames, :] for j in range(r)]
        return jnp.concatenate(parts, axis=-1)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(win_len)[None, :]
    return x[..., idx]


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """[..., n_frames, win] -> [..., (n_frames-1)*hop + win] by OLA."""
    *lead, n_frames, win_len = frames.shape
    if win_len % hop == 0:
        r = win_len // hop
        chunks = frames.reshape(tuple(lead) + (n_frames, r, hop))
        total_blocks = n_frames + r - 1
        acc = None
        for j in range(r):
            part = jnp.pad(
                chunks[..., j, :],
                [(0, 0)] * len(lead) + [(j, r - 1 - j), (0, 0)],
            )
            acc = part if acc is None else acc + part
        return acc.reshape(tuple(lead) + (total_blocks * hop,))
    out_len = (n_frames - 1) * hop + win_len
    out = jnp.zeros(tuple(lead) + (out_len,), frames.dtype)
    for t in range(n_frames):  # static unroll fallback (rare path)
        out = out.at[..., t * hop : t * hop + win_len].add(frames[..., t, :])
    return out


@functools.lru_cache(maxsize=64)
def _ola_window_sq(win_key: Tuple, hop: int, n_frames: int) -> np.ndarray:
    """Overlap-added squared window envelope (static; computed on host)."""
    win = np.asarray(win_key, dtype=np.float64)
    win_len = win.shape[0]
    out = np.zeros((n_frames - 1) * hop + win_len)
    w2 = win * win
    for t in range(n_frames):
        out[t * hop : t * hop + win_len] += w2
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# forward / inverse
# ---------------------------------------------------------------------------


def stft(x: jnp.ndarray, k: STFTKernels) -> jnp.ndarray:
    """Packed STFT.  [B, T] (or [B, 1, T]) -> [B, 2F, n_frames].

    Matches reference ConvSTFT(feature_type='complex') (tools_for_model.py:53-58):
    both-sides padding of win_len - hop, then windowed DFT every ``hop`` samples.
    """
    if x.ndim == 3:
        x = x[:, 0]
    pad = k.win_len - k.hop
    xp = jnp.pad(x, [(0, 0), (pad, pad)])
    frames = frame(xp, k.win_len, k.hop)  # [B, T', win]
    fwd = jnp.asarray(k.fwd, dtype=frames.dtype)
    spec = jnp.einsum("btw,wf->bft", frames, fwd)  # MXU matmul
    return spec


def safe_magnitude(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    """sqrt(re^2 + im^2) with a finite gradient at exactly (0, 0).

    Plain sqrt's backward is re/mag = 0/0 = NaN there, and exact complex
    zeros DO occur: the DCCRN masking path zero-pads the DC/Nyquist bin
    back (models/dccrn.py), and bf16 decoder outputs round to 0.0 in near-
    silence — the round-3/4 bf16 CLSKD divergence was born exactly here
    (finite losses, NaN grad_norm; docs/PERF.md round 4).  Double-where
    keeps the forward bit-identical and makes the subgradient 0."""
    m2 = re * re + im * im
    nz = m2 > 0
    return jnp.where(nz, jnp.sqrt(jnp.where(nz, m2, 1.0)), 0.0)


def safe_arctan2(im: jnp.ndarray, re: jnp.ndarray) -> jnp.ndarray:
    """arctan2 with a finite gradient at exactly (0, 0).

    Forward is unchanged (atan2(0, 1) == atan2(0, 0) == 0); the gradient,
    -im/(re^2+im^2) etc., is NaN at the origin — substituting re=1 there
    gives the correct 0 subgradient instead."""
    zero = jnp.logical_and(im == 0, re == 0)
    return jnp.arctan2(
        jnp.where(zero, 0.0, im), jnp.where(zero, 1.0, re)
    )


def stft_mag_phase(x: jnp.ndarray, k: STFTKernels) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Magnitude/phase view (reference feature_type='real', tools_for_model.py:62-67)."""
    spec = stft(x, k)
    F = k.fft_len // 2 + 1
    re, im = spec[:, :F], spec[:, F:]
    return safe_magnitude(re, im), safe_arctan2(im, re)


def istft(spec: jnp.ndarray, k: STFTKernels) -> jnp.ndarray:
    """Packed iSTFT.  [B, 2F, n_frames] -> [B, T].

    Pseudo-inverse projection + OLA + squared-window normalization + edge trim
    (reference ConviSTFT, tools_for_model.py:90-108).
    """
    n_frames = spec.shape[-1]
    inv = jnp.asarray(k.inv, dtype=spec.dtype)
    frames = jnp.einsum("bft,fw->btw", spec, inv)  # MXU matmul
    y = overlap_add(frames, k.hop)
    coff = _ola_window_sq(tuple(k.window.tolist()), k.hop, n_frames)
    y = y / (jnp.asarray(coff, dtype=y.dtype) + 1e-8)
    trim = k.win_len - k.hop
    return y[..., trim:-trim] if trim else y


# ---------------------------------------------------------------------------
# torch.stft-compatible magnitude (for the MRSTFT loss family)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _centered_window(win_length: int, fft_size: int, kind: str) -> np.ndarray:
    if kind == "hann":
        w = get_window("hann", win_length, fftbins=True)
    elif kind == "hamming":
        w = get_window("hamming", win_length, fftbins=True)
    else:
        w = get_window(kind, win_length, fftbins=True)
    lpad = (fft_size - win_length) // 2
    return np.pad(w, (lpad, fft_size - win_length - lpad)).astype(np.float32)


def stft_magnitude(
    x: jnp.ndarray,
    fft_size: int,
    hop_size: int,
    win_length: int,
    window: str = "hann",
    eps: float = 1e-7,
) -> jnp.ndarray:
    """Magnitude spectrogram with torch.stft semantics (center=True, reflect pad).

    Returns [B, n_frames, F]; used by the spectral losses
    (reference framework.py:16-32 which feeds torch.stft output into
    sqrt(clamp(re^2+im^2, 1e-7))).
    """
    if x.ndim == 1:
        x = x[None]
    pad = fft_size // 2
    xp = jnp.pad(x, [(0, 0), (pad, pad)], mode="reflect")
    frames = frame(xp, fft_size, hop_size)  # [B, T', fft]
    win = _centered_window(win_length, fft_size, window)
    basis = np.fft.rfft(np.eye(fft_size)).astype(np.complex64)  # [fft, F]
    fwd = np.concatenate([basis.real, basis.imag], axis=1) * win[:, None]
    fwd = jnp.asarray(fwd.astype(np.float32), dtype=frames.dtype)
    spec = jnp.einsum("btw,wf->btf", frames, fwd)
    F = fft_size // 2 + 1
    re, im = spec[..., :F], spec[..., F:]
    return jnp.sqrt(jnp.clip(re**2 + im**2, min=eps))

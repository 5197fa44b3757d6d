"""BSS-Eval metrics (SDR/SIR/SAR) + the eval metric bundle.

Replaces the asteroid ``get_metrics`` surface used by the reference's
validation/eval loops (distill.py:170-174, eval.py:67-73: si_sdr, sdr, sir,
sar, stoi, pesq + their input_* counterparts).

``bss_eval_single`` implements bss_eval_sources for the single-source
enhancement case (mir_eval semantics): the target projection allows a 512-tap
distortion filter, estimated by solving the Toeplitz least-squares system on
the host (scipy); with one source there is no interference, so SIR=inf and
SDR=SAR.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
from scipy.linalg import solve_toeplitz
from scipy.signal import fftconvolve

from .stoi import stoi_batch

FILT_LEN = 512


def _project(ref: np.ndarray, est: np.ndarray, flen: int = FILT_LEN) -> np.ndarray:
    """Least-squares projection of est onto {ref * h : h has flen taps}."""
    n = len(est)
    # autocorrelation of ref (first flen lags) and cross-correlation
    acorr = fftconvolve(ref, ref[::-1], mode="full")
    mid = len(ref) - 1
    r = acorr[mid : mid + flen].copy()
    r[0] += 1e-10
    xcorr = fftconvolve(est, ref[::-1], mode="full")
    b = xcorr[mid : mid + flen]
    h = solve_toeplitz(r, b)
    proj = fftconvolve(ref, h, mode="full")[:n]
    return proj


def bss_eval_single(ref: np.ndarray, est: np.ndarray) -> Dict[str, float]:
    """SDR/SIR/SAR for one reference source (mir_eval bss_eval_sources)."""
    ref = np.asarray(ref, dtype=np.float64)
    est = np.asarray(est, dtype=np.float64)
    s_target = _project(ref, est)
    e_artif = est - s_target
    num = np.sum(s_target**2)
    den = np.sum(e_artif**2)
    sdr = 10 * np.log10(num / (den + 1e-12) + 1e-12)
    return {"sdr": float(sdr), "sir": float("inf"), "sar": float(sdr)}


def si_sdr_np(ref: np.ndarray, est: np.ndarray, eps: float = 1e-12) -> float:
    ref = np.asarray(ref, np.float64)
    est = np.asarray(est, np.float64)
    alpha = np.dot(ref, est) / (np.dot(ref, ref) + eps)
    proj = alpha * ref
    noise = est - proj
    return float(10 * np.log10(np.sum(proj**2) / (np.sum(noise**2) + eps) + eps))


def eval_metrics(
    mix: np.ndarray,
    clean: np.ndarray,
    est: np.ndarray,
    sample_rate: int = 16000,
    compute_pesq: bool = True,
) -> Dict[str, float]:
    """Per-utterance metric dict with input_* baselines (asteroid get_metrics
    behaviour).  All inputs [T] numpy."""
    import jax.numpy as jnp

    out: Dict[str, float] = {}
    for name, deg in (("input_", mix), ("", est)):
        out[name + "si_sdr"] = si_sdr_np(clean, deg)
        b = bss_eval_single(clean, deg)
        out[name + "sdr"] = b["sdr"]
        out[name + "sir"] = b["sir"]
        out[name + "sar"] = b["sar"]
        s = float(
            stoi_batch(jnp.asarray(clean[None]), jnp.asarray(deg[None]),
                       fs=sample_rate)[0]
        )
        out[name + "stoi"] = s
    if compute_pesq:
        try:
            from .pesq import pesq_wb

            out["input_pesq"] = pesq_wb(clean, mix, sample_rate)
            out["pesq"] = pesq_wb(clean, est, sample_rate)
        except (ImportError, NotImplementedError):
            pass
    return out

"""The 10-mode combined loss dispatcher for standalone DCCRN training.

Behavioural equivalent of ``DCCRN.loss`` (reference DCCRN.py:259-412): each
mode blends time-domain, spectral-perceptual and PMSQE terms with the
reference's fixed ratios.  Pure function: all spectra are taken as inputs, so
it stays jit-friendly.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .signal import sdr, si_snr, si_sdr
from .mel import array_mel_loss
from .pmsqe import pmsqe_from_wav
from ..ops import stft as stft_ops


def _mel_term(labels, est_real, est_imag, k):
    clean = stft_ops.stft(labels, k)
    F = k.fft_len // 2 + 1
    cr, ci = clean[:, :F], clean[:, F:]
    clean_mags = jnp.sqrt(cr**2 + ci**2 + 1e-7)
    est_mags = jnp.sqrt(est_real**2 + est_imag**2 + 1e-7)
    return array_mel_loss(clean_mags, est_mags, fft_size=k.fft_len)


def dccrn_loss(
    inputs: jnp.ndarray,
    labels: jnp.ndarray,
    est_real: Optional[jnp.ndarray] = None,
    est_imag: Optional[jnp.ndarray] = None,
    loss_mode: str = "SDR+PMSQE",
    stft_kernels: Optional[stft_ops.STFTKernels] = None,
    sample_rate: int = 16000,
) -> jnp.ndarray:
    """inputs = enhanced wav [B, T]; labels = clean wav [B, T].

    est_real/est_imag: the masked spectrum (needed by the *+LMS modes);
    stft_kernels: analysis kernels for the mel terms.

    All loss arithmetic runs in f32 regardless of the model's compute dtype:
    the zoo's log/division/Bark terms (PMSQE especially) overflow in bf16 —
    a bf16 teacher pretrain NaN'd within 50 steps before this upcast — and
    the loss tail is a negligible share of step time.
    """
    k = stft_kernels or stft_ops.make_kernels()
    inputs = inputs.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    if est_real is not None:
        est_real = est_real.astype(jnp.float32)
    if est_imag is not None:
        est_imag = est_imag.astype(jnp.float32)

    if loss_mode == "MSE":
        return jnp.mean((inputs - labels) ** 2)
    if loss_mode == "SDR":
        return -sdr(labels, inputs)
    if loss_mode == "SI-SNR":
        return -si_snr(inputs, labels)
    if loss_mode == "SI-SDR":
        return -si_sdr(labels, inputs)
    if loss_mode == "MSE+LMS":
        mse = jnp.mean((inputs - labels) ** 2)
        mel = _mel_term(labels, est_real, est_imag, k)
        return (1e3 * mse + mel) / (1e3 + 1)
    if loss_mode == "MSE+SI-SNR":
        return (-si_snr(inputs, labels) + 100 * jnp.mean((inputs - labels) ** 2)) / 101
    if loss_mode == "MSE+PMSQE":
        return pmsqe_from_wav(labels, inputs, sample_rate)
    if loss_mode == "SI-SNR+SI-SDR":
        return (-si_snr(inputs, labels) - si_sdr(inputs, labels)) / 2
    if loss_mode == "SDR+LMS":
        mel = _mel_term(labels, est_real, est_imag, k)
        return (-sdr(labels, inputs) + 2 * mel) / 3
    if loss_mode == "SDR+PMSQE":
        # reference weights 1:15 (DCCRN.py:365-369)
        p = pmsqe_from_wav(labels, inputs, sample_rate)
        return (-sdr(labels, inputs) + 15 * p) / 16
    if loss_mode == "SI-SNR+LMS":
        mel = _mel_term(labels, est_real, est_imag, k)
        return (-si_snr(inputs, labels) + 2 * mel) / 3
    if loss_mode == "SI-SNR+PMSQE":
        p = pmsqe_from_wav(labels, inputs, sample_rate)
        return (8 * p - si_snr(inputs, labels)) / 9
    raise ValueError(f"unknown loss_mode {loss_mode!r}")

"""The five distillation strategies as pure loss functions.

Behavioural map (SURVEY.md section 0 table; reference training_steps):

| strategy  | distill signal                                                  |
|-----------|-----------------------------------------------------------------|
| clskd     | ReviewKD-ABF fused enc/dec taps -> SPKD vs teacher taps, + SPKD |
|           | on complex-LSTM real/imag states       (distill.py:72-148)      |
| reviewkd  | same fusion, HCL loss                  (distill_ReviewKD.py)    |
| spkd      | SPKD between output waveforms          (distill_SPKD.py:80-83)  |
| mse       | MSE between output waveforms           (distill_MSE.py:85-86)   |
| stft      | MRSTFT-mag between outputs             (distill_STFT.py:77-79)  |

All strategies share the base loss: single-resolution log-STFT-magnitude L1 of
the student output against the clean target (distill.py:59,101).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp

from ..config import DistillConfig
from ..losses.kd import hcl, spkd_loss, spkd_loss_affine
from ..losses.spectral import multi_resolution_stft_loss
from ..models.dccrn import DCCRNOutput


def base_loss(student_wav: jnp.ndarray, clean: jnp.ndarray, dcfg: DistillConfig) -> jnp.ndarray:
    """MRSTFT magnitude term vs the clean target (reference distill.py:100-101).

    Runs in f32 regardless of the model compute dtype (same policy as
    ``dccrn_loss``): the log-magnitude term is the numerically fragile tail
    of the step and costs nothing next to the models."""
    _, mag = multi_resolution_stft_loss(
        student_wav.astype(jnp.float32),
        clean.astype(jnp.float32),
        fft_sizes=dcfg.mrstft_fft_sizes,
        hop_sizes=dcfg.mrstft_hop_sizes,
        win_lengths=dcfg.mrstft_win_lengths,
        factor_sc=dcfg.mrstft_factor_sc,
        factor_mag=dcfg.mrstft_factor_mag,
    )
    return mag


FusedFn = Callable[..., Any]  # (taps list, which) -> fused maps list


def distill_loss(
    strategy: str,
    s_out: DCCRNOutput,
    t_out: DCCRNOutput,
    clean: jnp.ndarray,
    dcfg: DistillConfig,
    fused_encoder: Optional[list] = None,
    fused_decoder: Optional[list] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total loss + per-term metrics for one strategy.

    ``fused_encoder/decoder`` are the ReviewKD outputs (required for
    clskd/reviewkd; produced by the trainer so ABF params live in the
    optimizer).
    """
    logs: Dict[str, jnp.ndarray] = {}
    base = base_loss(s_out.wav, clean, dcfg)
    logs["base_loss"] = base

    gg = dcfg.spkd_gram_groups

    def _sp(sf, tf):
        # bn2-folded ABF output: (raw conv2 map, a, b) — the affine is
        # folded into per-channel Grams (DistillConfig.spkd_bn2_fold)
        if isinstance(sf, tuple):
            return spkd_loss_affine(sf[0], sf[1], sf[2], tf, "batchmean",
                                    groups=gg)
        return spkd_loss(sf, tf, "batchmean", groups=gg)

    if strategy == "clskd":
        enc = sum(
            _sp(sf, tf)
            for sf, tf in zip(fused_encoder, t_out.taps.encoder)
        )
        dec = sum(
            _sp(sf, tf)
            for sf, tf in zip(fused_decoder, t_out.taps.decoder)
        )
        # LSTM taps are [T, B, F]; gram over batch axis 1 directly (no
        # materialized swapaxes — the contraction runs in native layout)
        lr = spkd_loss(
            s_out.taps.lstm_real, t_out.taps.lstm_real, "batchmean",
            batch_axis=1, groups=gg,
        )
        li = spkd_loss(
            s_out.taps.lstm_imag, t_out.taps.lstm_imag, "batchmean",
            batch_axis=1, groups=gg,
        )
        logs.update(enc_loss=enc, dec_loss=dec, clstm_real_loss=lr,
                    clstm_imag_loss=li)
        distill = enc + dec + lr + li
    elif strategy == "reviewkd":
        # HCL pools the trailing two axes; move to [B, C, D, T] so the pyramid
        # pools the (freq, time) plane like the reference (framework.py:287-306)
        def nchw(ts):
            return [jnp.transpose(t, (0, 3, 1, 2)) for t in ts]

        enc = hcl(nchw(fused_encoder), nchw(t_out.taps.encoder))
        dec = hcl(nchw(fused_decoder), nchw(t_out.taps.decoder))

        # The reference reviewkd script's LSTM term was a latent bug (2-arg hcl
        # call that can never run, SURVEY.md 3.5) and raw student/teacher LSTM
        # widths differ; use HCL when shapes match, shape-agnostic SPKD else.
        def lstm_term(s_tap, t_tap):
            s_b = jnp.swapaxes(s_tap, 0, 1)
            t_b = jnp.swapaxes(t_tap, 0, 1)
            if s_b.shape == t_b.shape:
                return hcl([s_b], [t_b])
            return spkd_loss(s_b, t_b, "batchmean")

        lr = lstm_term(s_out.taps.lstm_real, t_out.taps.lstm_real)
        li = lstm_term(s_out.taps.lstm_imag, t_out.taps.lstm_imag)
        logs.update(enc_loss=enc, dec_loss=dec, clstm_real_loss=lr,
                    clstm_imag_loss=li)
        distill = enc + dec + lr + li
    elif strategy == "spkd":
        distill = spkd_loss(s_out.wav, t_out.wav, "batchmean", groups=gg)
        logs["spkd_loss"] = distill
    elif strategy == "mse":
        distill = jnp.mean((s_out.wav - t_out.wav) ** 2)
        logs["mse_loss"] = distill
    elif strategy == "stft":
        distill = base_loss(s_out.wav, t_out.wav, dcfg)
        logs["stft_loss"] = distill
    else:
        raise ValueError(f"unknown distill strategy {strategy!r}")

    total = base + dcfg.distill_weight * distill
    logs["train_loss"] = total
    return total, logs


STRATEGIES = ("clskd", "reviewkd", "spkd", "mse", "stft")


def needs_fusion(strategy: str) -> bool:
    return strategy in ("clskd", "reviewkd")


def needs_teacher_taps(strategy: str) -> bool:
    return strategy in ("clskd", "reviewkd")

"""DCCRN model family — one parameterized flax module covering teacher & student.

Re-design of the reference's two model stacks (own ``DCCRN.py:14-240`` and the
forked-asteroid ``DCCRNet``/``DCCRNet_mini``) as a single TPU-native family:

- channels-last ``[B, D(freq), T, C]`` layout throughout (NHWC convs);
- feature taps are *explicit return values* — a ``FeatureTaps`` pytree — instead
  of torch forward hooks (reference ``feature_extraction.py``): JAX has no
  module hooks, and explicit taps are jit/pjit-transparent and shardable;
- complex ops are the fused single-conv/single-scan kernels from ``ops/``;
- the whole forward is one jittable function of (params, wav).

Geometry parity (verified against SURVEY.md section 2 "teacher/student
geometry"): teacher kernel_num (32..256), rnn 256; student (8..64), rnn 64;
encoder halves the freq axis per layer (256 -> 4 over 6 layers for fft 512),
decoder mirrors with skip ``complex_cat`` and per-layer time-step drop.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import DCCRNConfig
from ..ops import stft as stft_ops
from ..ops.complex_layers import (
    BatchNorm,
    ComplexConv2d,
    ComplexConvTranspose2d,
    PReLU,
    complex_cat,
)
from ..ops.complex_bn import ComplexBatchNorm
from ..ops.complex_lstm import NaiveComplexLSTM


class FeatureTaps(NamedTuple):
    """Cross-layer activations for distillation (reference hooks ->
    feature_extraction.py:3-120, here explicit outputs).

    encoder/decoder entries are packed-complex ``[B, D, T, 2C]``;
    lstm_real/lstm_imag are the last bottleneck layer's outputs ``[T, B, F]``.
    """

    encoder: List[jnp.ndarray]
    decoder: List[jnp.ndarray]
    lstm_real: jnp.ndarray
    lstm_imag: jnp.ndarray


class DCCRNOutput(NamedTuple):
    wav: jnp.ndarray  # [B, T] enhanced waveform, clamped to [-1, 1]
    mask_real: jnp.ndarray  # [B, F, T']
    mask_imag: jnp.ndarray
    est_real: jnp.ndarray  # masked spectrum
    est_imag: jnp.ndarray
    taps: FeatureTaps


class DCCRN(nn.Module):
    """Deep complex conv recurrent net (reference DCCRN.py:149-240 behaviour)."""

    cfg: DCCRNConfig

    @nn.compact
    def __call__(
        self,
        wav: jnp.ndarray,
        training: bool = True,
        bn_batch_stats: "Optional[bool]" = None,
    ) -> DCCRNOutput:
        """``bn_batch_stats`` overrides which statistics BatchNorm uses
        (None = follow ``training``); see ops.complex_layers.BatchNorm."""
        cfg = self.cfg
        k = stft_ops.make_kernels(
            cfg.stft.win_len, cfg.stft.hop, cfg.stft.fft_len, cfg.stft.window
        )
        F = cfg.stft.fft_len // 2 + 1
        cdtype = jnp.dtype(cfg.compute_dtype)

        spec = stft_ops.stft(wav, k)  # [B, 2F, T'] float32
        re, im = spec[:, :F], spec[:, F:]
        spec_mags = jnp.sqrt(re**2 + im**2 + 1e-8)
        # digital silence in a frame makes the spectrum exactly (0, 0);
        # plain atan2's gradient is NaN there (safe_arctan2 docstring)
        spec_phase = stft_ops.safe_arctan2(im, re)

        # drop the DC bin, go channels-last packed complex: [B, D, T, 2]
        x = jnp.stack([re[:, 1:], im[:, 1:]], axis=-1).astype(cdtype)

        channels = (2,) + tuple(cfg.kernel_num)
        enc_taps: List[jnp.ndarray] = []
        for i in range(len(cfg.kernel_num)):
            x = ComplexConv2d(
                features=channels[i + 1],
                kernel_size=(cfg.kernel_size, 2),
                strides=(2, 1),
                padding=(cfg.kernel_size // 2, 1),
                causal=True,
                name=f"enc{i}_conv",
            )(x)
            if cfg.use_cbn:
                x = ComplexBatchNorm(name=f"enc{i}_bn")(x, training=training)
            else:
                x = BatchNorm(name=f"enc{i}_bn")(x, training=training, use_batch_stats=bn_batch_stats)
            x = PReLU(name=f"enc{i}_prelu")(x)
            enc_taps.append(x)

        B, D, T, C = x.shape
        half = C // 2
        # [B, D, T, C] -> [T, B, C/2*D] per part, channel-major flattening
        # (parity with reference DCCRN.py:178-184).
        def to_seq(part):
            return jnp.transpose(part, (2, 0, 3, 1)).reshape(T, B, half * D)

        lstm_r_tap = lstm_i_tap = None
        if cfg.use_clstm:
            hr = to_seq(x[..., :half])
            hi = to_seq(x[..., half:])
            for li in range(cfg.rnn_layers):
                last = li == cfg.rnn_layers - 1
                hr, hi = NaiveComplexLSTM(
                    hidden_size=cfg.rnn_units,
                    projection_dim=half * D * 2 if last else None,
                    name=f"clstm{li}",
                )(hr, hi)
            lstm_r_tap, lstm_i_tap = hr, hi
            # back to [B, D, T, C]
            def from_seq(h):
                return jnp.transpose(h.reshape(T, B, half, D), (1, 3, 0, 2))

            x = jnp.concatenate([from_seq(hr), from_seq(hi)], axis=-1)
        else:
            h = jnp.transpose(x, (2, 0, 3, 1)).reshape(T, B, C * D)
            for li in range(cfg.rnn_layers):
                h = nn.RNN(nn.LSTMCell(features=cfg.rnn_units), time_major=True)(h)  # type: ignore
            h = nn.Dense(C * D, name="lstm_proj")(h)
            lstm_r_tap = lstm_i_tap = h
            x = jnp.transpose(h.reshape(T, B, C, D), (1, 3, 0, 2))

        dec_taps: List[jnp.ndarray] = []
        for i in range(len(cfg.kernel_num)):
            j = len(cfg.kernel_num) - 1 - i  # decoder mirrors encoder
            x = complex_cat([x, enc_taps[j]], axis=-1)
            x = ComplexConvTranspose2d(
                features=channels[j],
                kernel_size=(cfg.kernel_size, 2),
                strides=(2, 1),
                padding=(cfg.kernel_size // 2, 0),
                output_padding=(1, 0),
                # drop first time step (reference DCCRN.py:205), folded into
                # the conv's padding so no full-map slice copy materializes
                time_crop_left=1,
                name=f"dec{i}_conv",
            )(x)
            if j != 0:
                if cfg.use_cbn:
                    x = ComplexBatchNorm(name=f"dec{i}_bn")(x, training=training)
                else:
                    x = BatchNorm(name=f"dec{i}_bn")(x, training=training, use_batch_stats=bn_batch_stats)
                x = PReLU(name=f"dec{i}_prelu")(x)
            dec_taps.append(x)

        # x: [B, D=F-1, T, 2] -> masks [B, F, T] (pad the DC bin back)
        xf = x.astype(jnp.float32)
        mask_real = jnp.pad(jnp.transpose(xf[..., 0], (0, 1, 2)), ((0, 0), (1, 0), (0, 0)))
        mask_imag = jnp.pad(jnp.transpose(xf[..., 1], (0, 1, 2)), ((0, 0), (1, 0), (0, 0)))

        mode = cfg.masking_mode
        if mode == "E":
            # safe_* forms: the padded DC row is EXACTLY (0, 0) and bf16
            # decoder outputs round to 0.0 in near-silence; plain sqrt/atan2
            # backward is 0/0 = NaN there (the round-4 bf16 divergence)
            mask_mags = stft_ops.safe_magnitude(mask_real, mask_imag)
            real_phase = mask_real / (mask_mags + 1e-8)
            imag_phase = mask_imag / (mask_mags + 1e-8)
            mask_phase = stft_ops.safe_arctan2(imag_phase, real_phase)
            est_mags = jnp.tanh(mask_mags) * spec_mags
            est_phase = spec_phase + mask_phase
            est_real = est_mags * jnp.cos(est_phase)
            est_imag = est_mags * jnp.sin(est_phase)
        elif mode == "C":
            est_real = re * mask_real - im * mask_imag
            est_imag = re * mask_imag + im * mask_real
        elif mode == "R":
            est_real = re * mask_real
            est_imag = im * mask_imag
        else:
            raise ValueError(f"unknown masking_mode {mode!r}")

        out_spec = jnp.concatenate([est_real, est_imag], axis=1)
        out_wav = jnp.clip(stft_ops.istft(out_spec, k), -1.0, 1.0)

        taps = FeatureTaps(
            encoder=enc_taps,
            decoder=dec_taps,
            lstm_real=lstm_r_tap,
            lstm_imag=lstm_i_tap,
        )
        return DCCRNOutput(out_wav, mask_real, mask_imag, est_real, est_imag, taps)


def make_model(cfg: DCCRNConfig):
    if getattr(cfg, "family", "dccrn") == "dccrnet":
        from .dccrnet import DCCRNet

        return DCCRNet(cfg=cfg)
    return DCCRN(cfg=cfg)


def init_params(cfg: DCCRNConfig, rng: jax.Array, batch: int = 1, samples: int = 16000):
    model = make_model(cfg)
    wav = jnp.zeros((batch, samples), jnp.float32)
    return model.init(rng, wav, training=True)


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))

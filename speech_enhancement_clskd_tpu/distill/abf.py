"""Attention-based fusion (ABF) + ReviewKD cross-layer feature chain.

TPU-native redesign of reference ``framework.py:176-284``:

- flax modules created ONCE and **included in the optimizer** — the reference
  rebuilt randomly-initialized ABFs inside every training step and never
  trained them (distill.py:92, framework.py:266; its hard-coded ``.cuda()``
  calls are gone too).  Set ``DistillConfig.abf_reinit_each_step`` for a
  bit-faithful reproduction of that quirk (fresh params from a per-step rng).
- geometry (per-map in/out channels, freq shapes) is inferred from the actual
  student/teacher tap shapes instead of hard-coded tables
  (framework.py:266-284), so any DCCRNConfig pair works.

Processing order matches the reference semantics: deepest (smallest freq) map
first with no fusion, residual propagated towards shallower maps with
nearest-neighbour freq-axis resize, outputs returned in the original tap-list
order so they zip 1:1 with the teacher taps.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.complex_layers import BatchNorm
from ..ops.pallas.attfuse import (
    attention_fuse,
    attfuse_available,
    attfuse_dispatchable,
)
from ..ops.pallas.conv3x3 import _conv3x3_xla, conv3x3, conv3x3_available


def _nearest_axis(x: jnp.ndarray, axis: int, n_out: int) -> jnp.ndarray:
    """Torch-exact nearest resize along one axis: out[i] = in[floor(i*n_in/n_out)]
    (F.interpolate mode='nearest' semantics, framework.py:212-215).

    Fast paths keep XLA off gather/scatter — the generic gather lowered ~3x
    slower fwd and scatter-add bwd on TPU (round-2 profile):
    - integer upscale k: floor(i/k) == repeat, a broadcast+reshape whose
      backward is a reshape+sum;
    - n_in == n_out + 1: floor(i*(n_out+1)/n_out) == i for every i < n_out
      (i*(n_in-n_out) < n_out holds iff n_in-n_out == 1), i.e. a plain crop.
      Larger downscales fall through to the exact gather — a crop would pick
      the wrong indices (e.g. 6->4 is [0,1,3,4], not [0,1,2,3]).
    """
    n_in = x.shape[axis]
    if n_in == n_out:
        return x
    if n_out % n_in == 0:
        k = n_out // n_in
        shape = list(x.shape)
        bshape = shape[: axis + 1] + [k] + shape[axis + 1:]
        shape[axis] = n_out
        return jnp.broadcast_to(jnp.expand_dims(x, axis + 1), bshape).reshape(shape)
    if n_in - n_out == 1:
        return jax.lax.slice_in_dim(x, 0, n_out, axis=axis)
    idx = (jnp.arange(n_out) * n_in) // n_out
    return jnp.take(x, idx, axis=axis)


def _resize_freq(x: jnp.ndarray, d_out: int, t_out: Optional[int] = None) -> jnp.ndarray:
    """Nearest-neighbour resize of the freq (and, when the model family
    shrinks time per layer, time) axis of [B, D, T, C] — the reference does
    F.interpolate(y, (shape, w), mode='nearest') where w is the *current*
    map's time width (framework.py:212-215)."""
    t_out = x.shape[2] if t_out is None else t_out
    x = _nearest_axis(x, 1, d_out)
    return _nearest_axis(x, 2, t_out)


class PointwiseConv(nn.Module):
    """1x1 conv as an explicit matmul contraction.

    Param tree is identical to ``nn.Conv`` with kernel (1, 1, I, O) so
    checkpoints are interchangeable; the einsum form lowers to one MXU
    matmul over the collapsed (B, D, T) rows — XLA's small-channel conv
    emitters ran ~2.3x slower on these shapes (round-2 TPU profile)."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        """``x``: one array, or a sequence treated as channel-concatenated —
        the kernel is split and each piece contracted separately, so the
        concat map is never materialized in HBM."""
        xs = x if isinstance(x, (list, tuple)) else (x,)
        c_in = sum(int(p.shape[-1]) for p in xs)
        kernel = self.param(
            "kernel", self.kernel_init, (1, 1, c_in, self.features)
        )
        dt = self.dtype or xs[0].dtype
        y, off = None, 0
        for p in xs:
            c = int(p.shape[-1])
            w = kernel[0, 0, off:off + c].astype(dt)
            t = jnp.einsum("bdtc,co->bdto", p.astype(dt), w)
            y = t if y is None else y + t
            off += c
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(dt)
        return y


class AttentionFuse(nn.Module):
    """2-way sigmoid attention fusion of a map with the propagated residual
    (reference framework.py:207-219): resize residual to the map's geometry,
    ``z = sigmoid(att_conv(concat(x, y)))``, blend ``x*z0 + y*z1``.

    Param tree is identical to the 1x1 ``att_conv`` (kernel (1, 1, 2C, 2) +
    bias), so checkpoints are interchangeable with the split-einsum form.
    On TPU with ABF geometry (equal time widths, integer freq upscale) the
    whole step runs as one fused Pallas kernel that expands the residual in
    VMEM — the teacher-sized upscaled map never touches HBM (docs/PERF.md
    diagnosis 3).  Elsewhere: XLA split-kernel einsums over the materialized
    resize (the concat map is still never built).
    """

    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        res: jnp.ndarray,
        affine: Optional[tuple] = None,
    ) -> jnp.ndarray:
        """``affine``: optional per-channel f32 ``(a, b)`` BatchNorm
        coefficients with ``xhat = x * a + b`` (from
        ``BatchNorm(return_affine=True)``), folded into the attention
        contraction and the blend so the normalized map never materializes.

        Byte-structure of the XLA path (docs/PERF.md round 4): the residual's
        attention logit is contracted at the SMALL pre-upscale size and only
        the 2-channel logits are freq-expanded; the upscaled residual is then
        consumed exactly once, by the elementwise blend, where XLA fuses the
        nearest-upscale broadcast — so neither the teacher-sized upscaled
        residual nor the bn1-normalized map ever round-trips through HBM.
        """
        c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, 2 * c, 2)
        )
        bias = self.param("bias", nn.initializers.zeros, (2,))
        dt = self.dtype or x.dtype
        wx = kernel[0, 0, :c]
        wy = kernel[0, 0, c:]
        if (
            self.use_pallas
            and attfuse_available()
            and attfuse_dispatchable(x.shape, res.shape)
        ):
            # the opt-in fused kernel consumes the normalized map directly
            xh = x if affine is None else x * affine[0].astype(dt) + affine[1].astype(dt)
            return attention_fuse(
                xh.astype(dt), res.astype(dt), wx.astype(dt), wy.astype(dt),
                bias.astype(dt),
            )
        if affine is None:
            wx_eff = wx.astype(dt)
            z_off = bias.astype(dt)
            xhat = x.astype(dt)
        else:
            a, b0 = affine  # f32 [C]
            wx_eff = (a[:, None] * wx).astype(dt)  # xhat@wx == x@(a*wx) + b0@wx
            z_off = (b0 @ wx + bias.astype(jnp.float32)).astype(dt)
            xhat = x * a.astype(dt) + b0.astype(dt)  # fuses into the blend
        y_small = _nearest_axis(res, 2, x.shape[2]).astype(dt)  # time (no-op usually)
        zx = jnp.einsum("bdtc,co->bdto", x.astype(dt), wx_eff)
        zy = _nearest_axis(  # contract small, expand the 2-channel logits
            jnp.einsum("bdtc,co->bdto", y_small, wy.astype(dt)), 1, x.shape[1]
        )
        z = jax.nn.sigmoid(zx + zy + z_off)
        y = _nearest_axis(y_small, 1, x.shape[1])  # broadcast fuses into blend
        return xhat * z[..., 0:1] + y * z[..., 1:2]


class Conv3x3(nn.Module):
    """Bias-free 3x3 SAME conv via the fused Pallas kernel on TPU.

    Param tree is identical to ``nn.Conv(features, (3, 3), padding=1,
    use_bias=False)`` — kernel (3, 3, I, O), same initializer fan-in — so
    checkpoints are interchangeable.  The Pallas path reads/writes the map
    in the einsum-native [B, D, T, C] layout, killing the relayout copies
    XLA inserted around ``conv_general_dilated`` (docs/PERF.md diagnosis 1-2);
    off-TPU it lowers to the plain XLA conv.
    """

    features: int
    dtype: Optional[jnp.dtype] = None
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", self.kernel_init, (3, 3, x.shape[-1], self.features)
        )
        dt = self.dtype or x.dtype
        x, kernel = x.astype(dt), kernel.astype(dt)
        if self.use_pallas and conv3x3_available():
            return conv3x3(x, kernel)
        return _conv3x3_xla(x, kernel)


class ABF(nn.Module):
    """One fusion block: 1x1 conv->BN, optional 2-way sigmoid attention fusion
    with the propagated residual, 3x3 conv->BN out (framework.py:176-224)."""

    mid_channels: int
    out_channels: int
    fuse: bool
    conv_pallas: bool = False
    attfuse_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # student tap [B, D, T, C]
        residual: Optional[jnp.ndarray] = None,  # [B, D_prev, T, mid]
        training: bool = True,
    ):
        # Compute in the tap dtype: the fused maps are teacher-sized (~1 GB
        # each at reference geometry) and this chain is the HBM-bandwidth
        # hot spot of the CLSKD step — flax's default dtype=None would
        # silently promote bf16 taps back to f32 against the f32 params.
        # Params stay f32; BatchNorm accumulates its statistics in f32.
        dt = x.dtype
        kaiming = nn.initializers.kaiming_uniform()
        x = PointwiseConv(self.mid_channels, use_bias=False,
                          kernel_init=kaiming, dtype=dt, name="conv1")(x)
        if self.fuse and residual is not None:
            # fold bn1 into the fusion: stats are computed (and running
            # stats updated) but the normalized map is never materialized —
            # AttentionFuse folds the affine into its contraction and blend
            aff = BatchNorm(name="bn1")(x, training=training,
                                        return_affine=True)
            x = AttentionFuse(
                dtype=dt, use_pallas=self.attfuse_pallas, name="att_conv"
            )(x, residual, affine=aff)
        else:
            x = BatchNorm(name="bn1")(x, training=training)
        out = Conv3x3(self.out_channels, kernel_init=kaiming, dtype=dt,
                      use_pallas=self.conv_pallas, name="conv2")(x)
        out = BatchNorm(name="bn2")(out, training=training)
        return out, x


class ReviewKD(nn.Module):
    """Chain ABFs over a tap list.

    ``out_channels[i]`` is the teacher channel count of tap i (tap-list order).
    ``reverse=True`` for encoder taps (list is shallow->deep, so processing
    starts from the end); decoder tap lists already lead with the deepest map.
    """

    out_channels: Sequence[int]
    mid_channels: int
    reverse: bool = True
    remat: bool = False  # checkpoint each ABF block: fused maps (teacher-
    # sized, the memory hot spot) are recomputed in backward instead of stored
    conv_pallas: bool = False  # opt-in Pallas kernels (see DistillConfig)
    attfuse_pallas: bool = False

    @nn.compact
    def __call__(
        self, feats: Sequence[jnp.ndarray], training: bool = True
    ) -> List[jnp.ndarray]:
        xs = list(feats[::-1] if self.reverse else feats)
        outs_ch = list(
            self.out_channels[::-1] if self.reverse else self.out_channels
        )
        block = nn.remat(ABF, static_argnums=(3,)) if self.remat else ABF
        results: List[jnp.ndarray] = []
        res = None
        for i, f in enumerate(xs):
            out, res = block(
                self.mid_channels, outs_ch[i], fuse=i > 0,
                conv_pallas=self.conv_pallas,
                attfuse_pallas=self.attfuse_pallas, name=f"abf{i}"
            )(f, res, training)
            results.append(out)
        return results[::-1] if self.reverse else results


def review_kd_for_taps(
    student_taps: Sequence[jnp.ndarray],
    teacher_taps: Sequence[jnp.ndarray],
    mid_channels: Optional[int] = None,
    reverse: bool = True,
) -> ReviewKD:
    """Build a ReviewKD whose geometry follows the actual tap shapes."""
    out_channels = tuple(int(t.shape[-1]) for t in teacher_taps)
    if mid_channels is None:
        mid_channels = min(512, max(int(s.shape[-1]) for s in student_taps))
    return ReviewKD(
        out_channels=out_channels, mid_channels=mid_channels, reverse=reverse
    )

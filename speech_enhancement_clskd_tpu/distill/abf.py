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
from ..ops.pallas.abf_block import (
    abf_block,
    abf_block_available,
    abf_block_dispatchable,
)
from ..ops.pallas.attfuse import (
    attention_fuse,
    attfuse_available,
    attfuse_dispatchable,
)
from ..ops.pallas.conv3x3 import (
    _conv3x3_ninedot,
    _conv3x3_xla,
    conv3x3,
    conv3x3_available,
)


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


class _AttParams(nn.Module):
    """Bare att_conv parameters with ``AttentionFuse``'s exact tree (kernel
    (1, 1, 2C, 2) + bias (2,), same inits) for the whole-block kernel path."""

    channels: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, 2 * self.channels, 2),
        )
        bias = self.param("bias", nn.initializers.zeros, (2,))
        return kernel, bias


class _Conv2Kernel(nn.Module):
    """Bare 3x3 kernel with ``Conv3x3``'s exact tree/init."""

    features: int
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, c_in: int) -> jnp.ndarray:
        return self.param(
            "kernel", self.kernel_init, (3, 3, c_in, self.features)
        )


class _Conv1Kernel(nn.Module):
    """Bare parameter holder with ``PointwiseConv``'s exact tree (kernel
    (1, 1, I, O), same init) so checkpoints stay interchangeable; the ABF
    orchestrates the contraction itself to keep x1 out of HBM."""

    features: int
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, c_in: int) -> jnp.ndarray:
        return self.param(
            "kernel", self.kernel_init, (1, 1, c_in, self.features)
        )[0, 0]


def _channel_moments(x: jnp.ndarray):
    """f32 per-channel first moment [C] and second-moment matrix [C, C] of a
    [..., C] map, reducing over all leading axes in the input's native layout
    (one dot_general — no reshape relayout, accumulate in f32)."""
    axes = tuple(range(x.ndim - 1))
    n = x.size // x.shape[-1]
    m1 = jnp.mean(x.astype(jnp.float32), axis=axes)
    m2 = jax.lax.dot_general(
        x, x, dimension_numbers=((axes, axes), ((), ())),
        preferred_element_type=jnp.float32,
    ) / n
    return m1, m2, n


def _bn1_moments_from_tap(tap: jnp.ndarray, w1: jnp.ndarray):
    """Batch-norm moments of ``x1 = tap @ w1`` WITHOUT materializing x1:
    mean = m1 @ w1 and E[x1^2]_m = (w1^T E[tap tap^T] w1)_mm, so the biased
    variance follows from the tap's channel moments alone (docs/PERF.md
    round 4 — this is what lets conv1's output live only inside fusions)."""
    m1, m2, n = _channel_moments(tap)
    w1f = w1.astype(jnp.float32)
    mean = m1 @ w1f
    e2 = jnp.einsum("cm,cd,dm->m", w1f, m2, w1f)
    var = e2 - jnp.square(mean)
    return mean, var, n


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
    channels: Optional[int] = None  # att channel count when x is the raw tap

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        res: jnp.ndarray,
        affine: Optional[tuple] = None,
        w_in: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """``affine``: optional per-channel f32 ``(a, b)`` BatchNorm
        coefficients with ``xhat = x * a + b`` (from
        ``BatchNorm(return_affine=True)``), folded into the attention
        contraction and the blend so the normalized map never materializes.

        ``w_in``: optional [C_in, C] 1x1-conv weight folded IN FRONT of the
        fusion: ``x`` is then the RAW tap and the normalized map is
        ``(x @ w_in) * a + b``.  Folding the input conv means the conv
        output x1 is consumed only inside this module's elementwise blend,
        so XLA fuses the matmul into the blend and x1 (the mid-channel map
        the round-3 trace charged a write + two reads per block for) never
        exists in HBM at all; the attention logit collapses to a single
        tap-level contraction ``x @ (w_in @ (a * wx))`` (docs/PERF.md
        round 4).  Requires ``affine``.

        Byte-structure of the XLA path (docs/PERF.md round 4): the residual's
        attention logit is contracted at the SMALL pre-upscale size and only
        the 2-channel logits are freq-expanded; the upscaled residual is then
        consumed exactly once, by the elementwise blend, where XLA fuses the
        nearest-upscale broadcast — so neither the teacher-sized upscaled
        residual nor the bn1-normalized map ever round-trips through HBM.
        """
        c = self.channels or x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, 2 * c, 2)
        )
        bias = self.param("bias", nn.initializers.zeros, (2,))
        dt = self.dtype or x.dtype
        wx = kernel[0, 0, :c]
        wy = kernel[0, 0, c:]
        if w_in is not None and affine is None:
            raise ValueError("w_in folding requires the bn affine")
        xshape = x.shape[:-1] + (c,)
        if (
            self.use_pallas
            and attfuse_available()
            and attfuse_dispatchable(xshape, res.shape)
        ):
            # the opt-in fused kernel consumes the normalized map directly
            xh = x if affine is None else (
                (x if w_in is None else jnp.einsum(
                    "bdtc,cm->bdtm", x, w_in.astype(x.dtype)))
                * affine[0].astype(dt) + affine[1].astype(dt)
            )
            return attention_fuse(
                xh.astype(dt), res.astype(dt), wx.astype(dt), wy.astype(dt),
                bias.astype(dt),
            )
        if affine is None:
            wx_eff = wx.astype(dt)
            z_off = bias.astype(dt)
            xhat = x.astype(dt)
            zx_in = x.astype(dt)
        else:
            a, b0 = affine  # f32 [C]
            z_off = (b0 @ wx + bias.astype(jnp.float32)).astype(dt)
            if w_in is None:
                wx_eff = (a[:, None] * wx).astype(dt)  # xhat@wx == x@(a*wx)+b0@wx
                xhat = x * a.astype(dt) + b0.astype(dt)  # fuses into the blend
                zx_in = x.astype(dt)
            else:
                w1f = w_in.astype(jnp.float32)
                wx_eff = (w1f @ (a[:, None] * wx)).astype(dt)  # [C_in, 2]
                xhat = (
                    jnp.einsum("bdtc,cm->bdtm", x.astype(dt), w_in.astype(dt))
                    * a.astype(dt) + b0.astype(dt)
                )  # the matmul fuses into the blend: x1 never hits HBM
                zx_in = x.astype(dt)
        y_small = _nearest_axis(res, 2, x.shape[2]).astype(dt)  # time (no-op usually)
        zx = jnp.einsum("bdtc,co->bdto", zx_in, wx_eff)
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
    use_ninedot: bool = False  # 9 shifted dot_generals instead of the conv
    # op — kills the conv/einsum relayout flip-flop (round-5 experiment)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", self.kernel_init, (3, 3, x.shape[-1], self.features)
        )
        dt = self.dtype or x.dtype
        x, kernel = x.astype(dt), kernel.astype(dt)
        if self.use_pallas and conv3x3_available():
            return conv3x3(x, kernel)
        if self.use_ninedot:
            return _conv3x3_ninedot(x, kernel)
        return _conv3x3_xla(x, kernel)


class ABF(nn.Module):
    """One fusion block: 1x1 conv->BN, optional 2-way sigmoid attention fusion
    with the propagated residual, 3x3 conv->BN out (framework.py:176-224)."""

    mid_channels: int
    out_channels: int
    fuse: bool
    conv_pallas: bool = False
    conv_ninedot: bool = False
    attfuse_pallas: bool = False
    block_pallas: bool = False  # whole-block fused kernel (ops/pallas/abf_block)
    # return (raw conv2 output, bn2 a, bn2 b) instead of the normalized map,
    # so an SPKD consumer can fold the affine into per-channel Grams and the
    # normalized map never materializes (losses/kd.spkd_loss_affine;
    # DistillConfig.spkd_bn2_fold)
    bn2_affine_out: bool = False

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
        #
        # Byte structure (docs/PERF.md round 4): conv1 is held as a bare
        # kernel and folded into the downstream elementwise chains, and bn1's
        # batch moments are derived analytically from the TAP's channel
        # moments (mean/second-moment matrix), so the mid-channel map
        # x1 = tap @ W1 — which round 3 charged one write + two reads per
        # block for — never materializes in HBM in either branch.
        dt = x.dtype
        mid = self.mid_channels
        kaiming = nn.initializers.kaiming_uniform()
        w1 = _Conv1Kernel(mid, kernel_init=kaiming, name="conv1")(x.shape[-1])
        if training:
            moments = _bn1_moments_from_tap(x, w1)
        else:
            moments = None  # running stats; no batch moments needed
        aff = BatchNorm(name="bn1", features=mid)(
            None, training=training, return_affine=True, moments=moments
        )
        fuse = self.fuse and residual is not None
        if (
            self.block_pallas
            and abf_block_available()
            and abf_block_dispatchable(
                x.shape, residual.shape if fuse else None, mid,
                self.out_channels,
            )
        ):
            # whole-block Pallas kernel: fold-blend + 3x3 conv in one custom
            # call with a hand-derived block VJP (docs/PERF.md round 4);
            # bn2 (stats over the raw conv output) stays in XLA
            a, b0 = aff
            w1a_f = w1.astype(jnp.float32) * a[None, :]
            w2k = _Conv2Kernel(self.out_channels, kernel_init=kaiming,
                               name="conv2")(mid).astype(dt)
            if fuse:
                att_k, att_b = _AttParams(mid, name="att_conv")()
                wx = att_k[0, 0, :mid].astype(jnp.float32)
                wyk = att_k[0, 0, mid:]
                xf, out_raw = abf_block(
                    x, residual.astype(dt), w1a_f.astype(dt), b0,
                    (w1a_f @ wx).astype(dt), wyk.astype(dt),
                    b0 @ wx + att_b.astype(jnp.float32), w2k,
                )
            else:
                dummy = jnp.zeros((2,), dt)
                xf, out_raw = abf_block(
                    x, None, w1a_f.astype(dt), b0, dummy, dummy, dummy, w2k
                )
            if self.bn2_affine_out:
                a2, b2 = BatchNorm(name="bn2")(
                    out_raw, training=training, return_affine=True)
                return (out_raw, a2, b2), xf
            out = BatchNorm(name="bn2")(out_raw, training=training)
            return out, xf
        if fuse:
            x = AttentionFuse(
                dtype=dt, use_pallas=self.attfuse_pallas, channels=mid,
                name="att_conv",
            )(x, residual, affine=aff, w_in=w1)
        else:
            a, b0 = aff
            x = (
                jnp.einsum("bdtc,cm->bdtm", x.astype(dt), w1.astype(dt))
                * a.astype(dt) + b0.astype(dt)
            )
        out = Conv3x3(self.out_channels, kernel_init=kaiming, dtype=dt,
                      use_pallas=self.conv_pallas,
                      use_ninedot=self.conv_ninedot, name="conv2")(x)
        if self.bn2_affine_out:
            a2, b2 = BatchNorm(name="bn2")(
                out, training=training, return_affine=True)
            return (out, a2, b2), x
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
    conv_ninedot: bool = False
    attfuse_pallas: bool = False
    block_pallas: bool = False
    bn2_affine_out: bool = False  # see ABF.bn2_affine_out

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
                conv_ninedot=self.conv_ninedot,
                attfuse_pallas=self.attfuse_pallas,
                block_pallas=self.block_pallas,
                bn2_affine_out=self.bn2_affine_out, name=f"abf{i}"
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

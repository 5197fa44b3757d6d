"""Complex-valued conv layers as single fused real convolutions.

The reference implements complex conv2d as four separate real convolutions
(rr - ii, ri + ir; reference ``tools_for_model.py:193-330``).  On TPU that
wastes MXU occupancy, so here each complex conv is ONE real convolution over a
block weight matrix::

        [xr xi] * [[Wr  Wi]
                   [-Wi Wr]]  =  [xr*Wr - xi*Wi,  xr*Wi + xi*Wr]

Layout is channels-last ``[B, D(freq), T(time), 2C]`` with the first C feature
channels real and the last C imaginary — the same (re, im) packing convention
as the reference's channel-axis split, transposed to TPU-friendly NHWC.

Parity notes (for golden tests against torch):
- causal convs left-pad the time axis by ``kernel_t - 1``
  (reference tools_for_model.py:237-240);
- transpose conv reproduces torch ConvTranspose2d semantics exactly
  (lhs dilation + flipped kernels + padding ``k-1-p`` / ``k-1-p+output_padding``);
- weight init: normal(std=0.05), zero bias (tools_for_model.py:231-234, 298-301).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def split_complex(x: jnp.ndarray, axis: int = -1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    c = x.shape[axis] // 2
    re = jax.lax.slice_in_dim(x, 0, c, axis=axis)
    im = jax.lax.slice_in_dim(x, c, 2 * c, axis=axis)
    return re, im


def complex_cat(xs: Sequence[jnp.ndarray], axis: int = -1) -> jnp.ndarray:
    """Concatenate packed-complex tensors keeping all real parts first.

    Same contract as reference ``complex_cat`` (tools_for_model.py:181-190).
    """
    res, ims = [], []
    for x in xs:
        re, im = split_complex(x, axis)
        res.append(re)
        ims.append(im)
    return jnp.concatenate(res + ims, axis=axis)


def _block_weight(wr: jnp.ndarray, wi: jnp.ndarray) -> jnp.ndarray:
    """[kh,kw,I,O] pair -> [kh,kw,2I,2O] real block implementing complex mult."""
    top = jnp.concatenate([wr, wi], axis=-1)  # xr -> (out_r, out_i)
    bot = jnp.concatenate([-wi, wr], axis=-1)  # xi -> (out_r, out_i)
    return jnp.concatenate([top, bot], axis=-2)


class ComplexConv2d(nn.Module):
    """Complex conv over [B, D, T, 2C_in] -> [B, D', T', 2C_out].

    ``features``/input channels count the full packed width (real+imag), like
    the reference's ``in_channels``/``out_channels`` (tools_for_model.py:207-215).
    """

    features: int  # 2 * C_out
    kernel_size: Tuple[int, int] = (5, 2)  # (freq, time)
    strides: Tuple[int, int] = (2, 1)
    padding: Tuple[int, int] = (2, 1)  # (freq both sides, time)
    causal: bool = True
    use_bias: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1] // 2
        c_out = self.features // 2
        kh, kw = self.kernel_size
        init = nn.initializers.normal(stddev=0.05)
        wr = self.param("wr", init, (kh, kw, c_in, c_out), self.param_dtype)
        wi = self.param("wi", init, (kh, kw, c_in, c_out), self.param_dtype)

        pf, pt = self.padding
        if pt != 0 and self.causal:
            tpad = (pt, 0)
        else:
            tpad = (pt, pt)
        w = _block_weight(wr, wi).astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=self.strides,
            padding=(( pf, pf), tpad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if not self.use_bias:
            return y
        br = self.param("br", nn.initializers.zeros, (c_out,), self.param_dtype)
        bi = self.param("bi", nn.initializers.zeros, (c_out,), self.param_dtype)
        b = jnp.concatenate([br, bi]).astype(y.dtype)
        return y + b


class ComplexConvTranspose2d(nn.Module):
    """Complex transpose conv matching torch ConvTranspose2d geometry.

    (reference tools_for_model.py:265-330; decoder config DCCRN.py:111-141:
    kernel (5,2), stride (2,1), padding (2,0), output_padding (1,0).)
    """

    features: int  # 2 * C_out
    kernel_size: Tuple[int, int] = (5, 2)
    strides: Tuple[int, int] = (2, 1)
    padding: Tuple[int, int] = (2, 0)
    output_padding: Tuple[int, int] = (1, 0)
    use_bias: bool = True
    param_dtype: jnp.dtype = jnp.float32
    # drop the first N output time steps by shrinking the left pad instead of
    # slicing the materialized output (the reference's per-decoder-layer
    # x[..., 1:] copied the full map each layer, DCCRN.py:205); exact only
    # while the time stride is 1.
    time_crop_left: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1] // 2
        c_out = self.features // 2
        kh, kw = self.kernel_size
        init = nn.initializers.normal(stddev=0.05)
        wr = self.param("wr", init, (kh, kw, c_in, c_out), self.param_dtype)
        wi = self.param("wi", init, (kh, kw, c_in, c_out), self.param_dtype)

        w = _block_weight(wr, wi).astype(x.dtype)
        # transpose conv == conv with lhs dilation and flipped kernel
        w = jnp.flip(w, axis=(0, 1))
        (sf, st), (pf, pt) = self.strides, self.padding
        of, ot = self.output_padding
        if self.time_crop_left and st != 1:
            raise ValueError("time_crop_left requires time stride 1")
        pad = ((kh - 1 - pf, kh - 1 - pf + of),
               (kw - 1 - pt - self.time_crop_left, kw - 1 - pt + ot))
        y = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(1, 1),
            padding=pad,
            lhs_dilation=(sf, st),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if not self.use_bias:
            return y
        br = self.param("br", nn.initializers.zeros, (c_out,), self.param_dtype)
        bi = self.param("bi", nn.initializers.zeros, (c_out,), self.param_dtype)
        b = jnp.concatenate([br, bi]).astype(y.dtype)
        return y + b


class ComplexDense(nn.Module):
    """Complex linear on packed input [..., 2F] -> [..., 2*features]:
    (Wr + i Wi)(xr + i xi), torch Linear parity (asteroid's
    ComplexMultiplicationWrapper(nn.Linear) in the DCCRN RNN bottleneck)."""

    features: int  # per-part output width
    use_bias: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f_in = x.shape[-1] // 2
        bound = 1.0 / (f_in**0.5)
        init = nn.initializers.uniform(scale=2 * bound)

        def uinit(key, shape, dtype):
            return init(key, shape, dtype) - bound

        wr = self.param("wr", uinit, (f_in, self.features), self.param_dtype)
        wi = self.param("wi", uinit, (f_in, self.features), self.param_dtype)
        xr, xi = split_complex(x)
        dtype = x.dtype
        wr = wr.astype(dtype)
        wi = wi.astype(dtype)
        yr = xr @ wr - xi @ wi
        yi = xr @ wi + xi @ wr
        if self.use_bias:
            br = self.param("br", uinit, (self.features,), self.param_dtype)
            bi = self.param("bi", uinit, (self.features,), self.param_dtype)
            yr = yr + br.astype(dtype)
            yi = yi + bi.astype(dtype)
        return jnp.concatenate([yr, yi], axis=-1)


class PReLU(nn.Module):
    """Single-alpha PReLU (torch nn.PReLU() default: one shared 0.25 slope)."""

    init_alpha: float = 0.25
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        a = self.param(
            "alpha",
            nn.initializers.constant(self.init_alpha),
            (1,),
            self.param_dtype,
        ).astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


class CPReLU(nn.Module):
    """Per-part PReLU on packed complex input (reference cPReLU,
    tools_for_model.py:123-135)."""

    init_alpha: float = 0.25
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ar = self.param(
            "alpha_r", nn.initializers.constant(self.init_alpha), (1,), self.param_dtype
        ).astype(x.dtype)
        ai = self.param(
            "alpha_i", nn.initializers.constant(self.init_alpha), (1,), self.param_dtype
        ).astype(x.dtype)
        re, im = split_complex(x)
        re = jnp.where(re >= 0, re, ar * re)
        im = jnp.where(im >= 0, im, ai * im)
        return jnp.concatenate([re, im], axis=-1)


class BatchNorm(nn.Module):
    """Real batchnorm over the packed channel axis (torch BatchNorm2d parity:
    momentum 0.1, eps 1e-5, biased batch variance for normalization, running
    stats updated with unbiased variance)."""

    momentum: float = 0.1
    eps: float = 1e-5
    param_dtype: jnp.dtype = jnp.float32

    features: int = 0  # required when x is None (moments-only call)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        training: bool = True,
        use_batch_stats: bool = None,
        return_affine: bool = False,
        moments=None,
    ) -> jnp.ndarray:
        """``use_batch_stats`` decouples *which* statistics normalize from
        *whether* running stats update (which follows ``training`` alone).
        Default None = follow ``training``.  ``use_batch_stats=True`` with
        ``training=False`` reproduces the reference eval quirk: its
        ``eval.py`` never calls ``model.eval()``, so inference uses
        per-batch statistics (verified against the shipped example wavs).

        ``return_affine=True`` returns the per-channel f32 coefficients
        ``(a, b)`` with ``normalize(x) == x * a + b`` INSTEAD of the
        normalized map (running stats still update).  Callers fold the
        affine into downstream contractions/elementwise chains so the
        normalized map itself never materializes in HBM — the ABF chain
        uses this to kill its bn1-apply pass (docs/PERF.md round 4).

        ``moments=(mean, var, n)``: f32 batch statistics computed by the
        caller (e.g. analytically from pre-matmul channel moments, so the
        normalized operand never materializes — docs/PERF.md round 4);
        ``var`` is the biased variance, ``n`` the element count behind it
        (for the unbiased running-stat update).  With ``moments`` (or with
        ``use_batch_stats=False`` + ``return_affine``) ``x`` may be None."""
        c = x.shape[-1] if x is not None else (
            self.features or (moments[0].shape[-1] if moments else 0)
        )
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), self.param_dtype)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), self.param_dtype)
        )
        if use_batch_stats is None:
            use_batch_stats = training
        if use_batch_stats:
            if moments is not None:
                mean, var, n = moments
                mean = mean.astype(jnp.float32)
                var = var.astype(jnp.float32)
            else:
                axes = tuple(range(x.ndim - 1))
                # stats ALWAYS accumulate in f32 (the cast fuses into the
                # reduce, so it costs no extra HBM traffic): E[x^2]-E[x]^2
                # over ~1e8 elements is catastrophically imprecise in bf16
                xf = x.astype(jnp.float32)
                mean = jnp.mean(xf, axis=axes)
                var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
                n = x.size // c
            unbiased = var * (n / max(n - 1, 1))
            if training and not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean.astype(
                    self.param_dtype
                )
                ra_var.value = (1 - m) * ra_var.value + m * unbiased.astype(
                    self.param_dtype
                )
        else:
            mean, var = ra_mean.value, ra_var.value
        if return_affine:
            inv32 = jax.lax.rsqrt(var.astype(jnp.float32) + self.eps)
            a = inv32 * scale.astype(jnp.float32)
            return a, bias.astype(jnp.float32) - mean.astype(jnp.float32) * a
        inv = jax.lax.rsqrt(var.astype(x.dtype) + self.eps)
        return (x - mean.astype(x.dtype)) * inv * scale.astype(x.dtype) + bias.astype(
            x.dtype
        )

"""Complex batch normalization via 2x2 covariance whitening.

Re-implementation (in JAX, channels-last) of the Trabelsi deep-complex-networks
whitening batchnorm the reference carries (reference tools_for_model.py:335-512):
per complex channel, subtract the complex mean, compute the 2x2 covariance
[[Vrr, Vri], [Vri, Vii]], multiply by its inverse square root (closed form for
2x2 SPD matrices), then apply a learnable 2x2 affine (Wrr, Wri, Wii) + complex
bias.  Running stats use torch-style lerp with momentum 0.1.

Input layout: packed complex [B, ..., 2C] (first C real, last C imag).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from .complex_layers import split_complex


class ComplexBatchNorm(nn.Module):
    momentum: float = 0.1
    eps: float = 1e-5
    affine: bool = True
    track_running_stats: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = True) -> jnp.ndarray:
        c = x.shape[-1] // 2
        xr, xi = split_complex(x)
        axes = tuple(range(x.ndim - 1))  # reduce over all but channel

        if self.affine:
            wrr = self.param("Wrr", nn.initializers.ones, (c,), self.param_dtype)
            wri = self.param(
                "Wri",
                lambda k, s, d=self.param_dtype: jax.random.uniform(
                    k, s, d, -0.9, 0.9
                ),
                (c,),
            )
            wii = self.param("Wii", nn.initializers.ones, (c,), self.param_dtype)
            br = self.param("Br", nn.initializers.zeros, (c,), self.param_dtype)
            bi = self.param("Bi", nn.initializers.zeros, (c,), self.param_dtype)

        if self.track_running_stats:
            rmr = self.variable("batch_stats", "RMr",
                                lambda: jnp.zeros((c,), self.param_dtype))
            rmi = self.variable("batch_stats", "RMi",
                                lambda: jnp.zeros((c,), self.param_dtype))
            rvrr = self.variable("batch_stats", "RVrr",
                                 lambda: jnp.ones((c,), self.param_dtype))
            rvri = self.variable("batch_stats", "RVri",
                                 lambda: jnp.zeros((c,), self.param_dtype))
            rvii = self.variable("batch_stats", "RVii",
                                 lambda: jnp.ones((c,), self.param_dtype))

        use_batch = training or not self.track_running_stats
        if use_batch:
            mr = jnp.mean(xr, axis=axes)
            mi = jnp.mean(xi, axis=axes)
        else:
            mr, mi = rmr.value.astype(x.dtype), rmi.value.astype(x.dtype)
        xr = xr - mr.astype(x.dtype)
        xi = xi - mi.astype(x.dtype)

        if use_batch:
            vrr = jnp.mean(xr * xr, axis=axes)
            vri = jnp.mean(xr * xi, axis=axes)
            vii = jnp.mean(xi * xi, axis=axes)
        else:
            vrr = rvrr.value.astype(x.dtype)
            vri = rvri.value.astype(x.dtype)
            vii = rvii.value.astype(x.dtype)

        if (
            training
            and self.track_running_stats
            and not self.is_initializing()
        ):
            m = self.momentum
            rmr.value = rmr.value * (1 - m) + m * mr.astype(self.param_dtype)
            rmi.value = rmi.value * (1 - m) + m * mi.astype(self.param_dtype)
            rvrr.value = rvrr.value * (1 - m) + m * vrr.astype(self.param_dtype)
            rvri.value = rvri.value * (1 - m) + m * vri.astype(self.param_dtype)
            rvii.value = rvii.value * (1 - m) + m * vii.astype(self.param_dtype)

        vrr = vrr + self.eps
        vii = vii + self.eps

        # Inverse square root of [[vrr, vri], [vri, vii]] in closed form.
        tau = vrr + vii
        delta = vrr * vii - vri * vri
        s = jnp.sqrt(delta)
        t = jnp.sqrt(tau + 2 * s)
        rst = 1.0 / (s * t)
        urr = (s + vii) * rst
        uii = (s + vrr) * rst
        uri = -vri * rst

        if self.affine:
            wrr_, wri_, wii_ = (
                wrr.astype(x.dtype),
                wri.astype(x.dtype),
                wii.astype(x.dtype),
            )
            zrr = wrr_ * urr + wri_ * uri
            zri = wrr_ * uri + wri_ * uii
            zir = wri_ * urr + wii_ * uri
            zii = wri_ * uri + wii_ * uii
        else:
            zrr, zri, zir, zii = urr, uri, uri, uii

        yr = zrr * xr + zri * xi
        yi = zir * xr + zii * xi
        if self.affine:
            yr = yr + br.astype(x.dtype)
            yi = yi + bi.astype(x.dtype)
        return jnp.concatenate([yr, yi], axis=-1)

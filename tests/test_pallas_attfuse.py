"""Pallas fused resize+attention (ops/pallas/attfuse.py) vs the XLA math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_enhancement_clskd_tpu.distill.abf import _resize_freq
from speech_enhancement_clskd_tpu.ops.pallas.attfuse import (
    attention_fuse,
    attfuse_dispatchable,
)


def _xla_reference(x, res, wx, wy, bias):
    y = _resize_freq(res, x.shape[1], x.shape[2])
    z = jax.nn.sigmoid(
        jnp.einsum("bdtc,co->bdto", x, wx)
        + jnp.einsum("bdtc,co->bdto", y, wy)
        + bias
    )
    return x * z[..., 0:1] + y * z[..., 1:2]


SHAPES = [
    # (B, D, Dp, T, C): k = D/Dp freq upscale
    (2, 8, 4, 21, 8),
    (2, 4, 4, 13, 8),    # k=1 (no resize)
    (1, 16, 4, 7, 16),   # k=4
    (2, 2, 1, 11, 4),    # deepest minimal
]


@pytest.mark.parametrize("shape", SHAPES)
def test_forward_matches_xla(rng, shape):
    b, d, dp, t, c = shape
    x = jnp.asarray(rng.standard_normal((b, d, t, c)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((b, dp, t, c)), jnp.float32)
    wx = jnp.asarray(rng.standard_normal((c, 2)) * 0.3, jnp.float32)
    wy = jnp.asarray(rng.standard_normal((c, 2)) * 0.3, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((2,)) * 0.1, jnp.float32)
    assert attfuse_dispatchable(x.shape, res.shape)
    got = attention_fuse(x, res, wx, wy, bias, interpret=True)
    want = _xla_reference(x, res, wx, wy, bias)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", SHAPES[:3])
def test_vjp_matches_xla(rng, shape):
    b, d, dp, t, c = shape
    x = jnp.asarray(rng.standard_normal((b, d, t, c)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((b, dp, t, c)), jnp.float32)
    wx = jnp.asarray(rng.standard_normal((c, 2)) * 0.3, jnp.float32)
    wy = jnp.asarray(rng.standard_normal((c, 2)) * 0.3, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((2,)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, d, t, c)), jnp.float32)

    def lp(x, res, wx, wy, bias):
        return jnp.vdot(attention_fuse(x, res, wx, wy, bias, interpret=True), g)

    def lx(x, res, wx, wy, bias):
        return jnp.vdot(_xla_reference(x, res, wx, wy, bias), g)

    gp = jax.grad(lp, argnums=(0, 1, 2, 3, 4))(x, res, wx, wy, bias)
    gx = jax.grad(lx, argnums=(0, 1, 2, 3, 4))(x, res, wx, wy, bias)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(a, b_, rtol=2e-4, atol=2e-5)


def test_dispatch_gate():
    assert not attfuse_dispatchable((2, 8, 21, 8), (2, 3, 21, 8))  # 8 % 3
    assert not attfuse_dispatchable((2, 8, 21, 8), (2, 4, 20, 8))  # T differs
    assert not attfuse_dispatchable((2, 8, 21, 8), (2, 4, 21, 4))  # C differs
    # no candidate tile both divides D and covers the upscale factor
    # (k = 32 > max tile 16): must refuse rather than compile over-budget
    assert not attfuse_dispatchable((2, 32, 21, 8), (2, 1, 21, 8))
    # huge T*C row blowing the VMEM budget at every tile size
    assert not attfuse_dispatchable(
        (1, 4, 100_000, 512), (1, 2, 100_000, 512)
    )

"""Pallas fused 3x3 conv (ops/pallas/conv3x3.py) vs XLA conv, fwd + VJP.

Runs the kernel in interpret mode on the CPU test mesh; shapes cover the ABF
conv2 geometry classes (mid->teacher channels, freq rows down to D=4, the
odd T=483-style time axis) at tiny sizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_enhancement_clskd_tpu.ops.pallas.conv3x3 import (
    _conv3x3_fn,
    _conv3x3_xla,
    _pick_td,
)


SHAPES = [
    # (B, D, T, C, O) — miniatures of the ABF conv2 call sites
    (2, 8, 21, 8, 16),   # shallow encoder tap (td > 1)
    (2, 4, 21, 8, 32),   # deepest tap: D=4
    (1, 2, 7, 4, 4),     # minimal freq extent
    (2, 6, 11, 8, 8),    # D with non-power-of-two divisors
    (1, 16, 5, 16, 2),   # tiny O (decoder mask-channel tap)
]


@pytest.mark.parametrize("shape", SHAPES)
def test_forward_matches_xla(rng, shape):
    b, d, t, c, o = shape
    x = jnp.asarray(rng.standard_normal((b, d, t, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, c, o)) * 0.1, jnp.float32)
    got = _conv3x3_fn(True)(x, w)
    want = _conv3x3_xla(x, w)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", SHAPES[:3])
def test_vjp_matches_xla(rng, shape):
    b, d, t, c, o = shape
    x = jnp.asarray(rng.standard_normal((b, d, t, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, c, o)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, d, t, o)), jnp.float32)

    def loss_pallas(x, w):
        return jnp.vdot(_conv3x3_fn(True)(x, w), g)

    def loss_xla(x, w):
        return jnp.vdot(_conv3x3_xla(x, w), g)

    dx_p, dw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    dx_x, dw_x = jax.grad(loss_xla, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(dx_p, dx_x, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(dw_p, dw_x, rtol=1e-4, atol=1e-4)


def test_bf16_io_f32_accumulation(rng):
    b, d, t, c, o = 2, 8, 21, 8, 16
    x32 = jnp.asarray(rng.standard_normal((b, d, t, c)), jnp.float32)
    w32 = jnp.asarray(rng.standard_normal((3, 3, c, o)) * 0.1, jnp.float32)
    y = _conv3x3_fn(True)(x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16))
    assert y.dtype == jnp.bfloat16
    want = _conv3x3_xla(x32, w32)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), want, rtol=0.05, atol=0.05
    )


def test_pick_td_divides_and_fits():
    # assert against the kernel's OWN budget formula/constants, so a
    # regression in the real logic is caught (round-3 advisor finding)
    from speech_enhancement_clskd_tpu.ops.pallas.conv3x3 import (
        _TMP_BUDGET_BYTES,
        _pad_len,
    )

    for dcur in (4, 8, 16, 32, 64, 128, 256, 483):
        c, o = 64, 512
        td = _pick_td(dcur, 483, c, o)
        assert dcur % td == 0
        tp = _pad_len(483)
        tmp = td * tp * (3 * c * 2 + o * 4 + 3 * c * 2)
        assert td == 1 or tmp <= _TMP_BUDGET_BYTES

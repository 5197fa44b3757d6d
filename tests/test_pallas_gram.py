"""Pallas gram-pair kernel correctness (interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from speech_enhancement_clskd_tpu.losses.kd import spkd_loss
from speech_enhancement_clskd_tpu.ops.pallas.gram import (
    gram_pair,
    spkd_loss_pallas,
)


def test_gram_pair_matches_einsum(rng):
    s = rng.standard_normal((8, 5000)).astype(np.float32)
    t = rng.standard_normal((8, 3000)).astype(np.float32)
    gs, gt = gram_pair(jnp.asarray(s), jnp.asarray(t), interpret=True)
    np.testing.assert_allclose(np.asarray(gs), s @ s.T, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(gt), t @ t.T, rtol=1e-4, atol=1e-2)


def test_gram_pair_nd_inputs(rng):
    s = rng.standard_normal((4, 16, 10, 6)).astype(np.float32)
    t = rng.standard_normal((4, 32, 10, 6)).astype(np.float32)
    gs, gt = gram_pair(jnp.asarray(s), jnp.asarray(t), interpret=True)
    sf, tf = s.reshape(4, -1), t.reshape(4, -1)
    np.testing.assert_allclose(np.asarray(gs), sf @ sf.T, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(gt), tf @ tf.T, rtol=1e-4, atol=1e-2)


def test_spkd_pallas_matches_xla(rng):
    s = rng.standard_normal((8, 2500)).astype(np.float32)
    t = rng.standard_normal((8, 4100)).astype(np.float32)
    ours = float(spkd_loss_pallas(jnp.asarray(s), jnp.asarray(t),
                                  interpret=True))
    ref = float(spkd_loss(jnp.asarray(s), jnp.asarray(t)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_gram_pair_custom_vjp_matches_xla_grad(rng):
    """The SPKD gradient through the pallas kernel == the XLA-einsum gradient
    (custom VJP: dZ = (dG + dG^T) Z)."""
    import jax

    s = jnp.asarray(rng.standard_normal((8, 2500)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((8, 4100)).astype(np.float32))

    g_pallas = jax.grad(
        lambda a, b: spkd_loss_pallas(a, b, interpret=True), argnums=(0, 1)
    )(s, t)
    g_xla = jax.grad(
        lambda a, b: spkd_loss(a, b, use_pallas=False), argnums=(0, 1)
    )(s, t)
    for gp, gx in zip(g_pallas, g_xla):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), rtol=1e-4, atol=1e-6
        )


def test_gram_pair_vjp_nonsymmetric_cotangent(rng):
    """VJP parity for an arbitrary (non-symmetric) upstream cotangent."""
    import jax

    s = jnp.asarray(rng.standard_normal((4, 700)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((4, 300)).astype(np.float32))
    cs = jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))

    def scalar_pallas(a, b):
        gs, gt = gram_pair(a, b, interpret=True)
        return jnp.sum(gs * cs) + jnp.sum(gt * ct)

    def scalar_xla(a, b):
        gs = jnp.dot(a, a.T)
        gt = jnp.dot(b, b.T)
        return jnp.sum(gs * cs) + jnp.sum(gt * ct)

    gp = jax.grad(scalar_pallas, argnums=(0, 1))(s, t)
    gx = jax.grad(scalar_xla, argnums=(0, 1))(s, t)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )

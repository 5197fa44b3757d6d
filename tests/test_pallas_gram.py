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

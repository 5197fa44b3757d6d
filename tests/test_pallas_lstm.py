"""Pallas LSTM sequence kernel vs lax.scan LSTM: forward + gradients
(interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_enhancement_clskd_tpu.ops.pallas.lstm import lstm_seq


def scan_lstm(xw, w_hh):
    """Reference: same decomposition via lax.scan (mirrors ops/complex_lstm)."""
    T, B, G = xw.shape
    H = G // 4

    def step(carry, xw_t):
        h, c = carry
        gates = xw_t + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    (_, _), ys = jax.lax.scan(
        step, (jnp.zeros((B, H)), jnp.zeros((B, H))), xw
    )
    return ys


@pytest.fixture
def inputs(rng):
    T, B, H = 12, 4, 8
    xw = jnp.asarray(rng.standard_normal((T, B, 4 * H)).astype(np.float32))
    w_hh = jnp.asarray(
        (rng.standard_normal((H, 4 * H)) / np.sqrt(H)).astype(np.float32)
    )
    return xw, w_hh


def test_forward_matches_scan(inputs):
    xw, w_hh = inputs
    y_pallas = lstm_seq(xw, w_hh, True)
    y_scan = scan_lstm(xw, w_hh)
    np.testing.assert_allclose(
        np.asarray(y_pallas), np.asarray(y_scan), atol=1e-5, rtol=1e-4
    )


def test_gradients_match_scan(inputs):
    xw, w_hh = inputs

    def loss_pallas(xw, w):
        return jnp.sum(lstm_seq(xw, w, True) ** 2)

    def loss_scan(xw, w):
        return jnp.sum(scan_lstm(xw, w) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(xw, w_hh)
    gs = jax.grad(loss_scan, argnums=(0, 1))(xw, w_hh)
    np.testing.assert_allclose(
        np.asarray(gp[0]), np.asarray(gs[0]), atol=1e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(gp[1]), np.asarray(gs[1]), atol=1e-4, rtol=1e-3
    )

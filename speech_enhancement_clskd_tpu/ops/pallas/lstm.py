"""Pallas TPU LSTM sequence kernel with custom VJP.

The complex-LSTM bottleneck is the one truly sequential op in DCCRN (~483
frames; SURVEY.md 'hard parts').  ``lax.scan`` compiles to an XLA while-loop
whose carry bounces between loop iterations; this kernel instead runs the
WHOLE sequence in one ``pallas_call``: the recurrent weights live in VMEM for
all T steps, h/c live in VMEM scratch, and the per-step work is a single
[B,H] @ [H,4H] MXU matmul + elementwise gates.

API: ``lstm_seq(xw, w_hh) -> y`` where ``xw = x @ W_ih + b`` is precomputed
outside (one big MXU matmul over all timesteps), matching the decomposition in
``ops/complex_lstm.py``.  Differentiable via custom VJP: the backward kernel
replays the sequence in reverse, recomputing gates from the saved (h, c)
sequences and accumulating dW_hh on-chip.

Gradient identities (standard LSTM, gate order i,f,g,o):
    dh_t   = dy_t + dgates_{t+1} @ W_hh^T
    do     = dh_t * tanh(c_t)              do_lin = do * o (1-o)
    dc_t  += dh_t * o * (1-tanh^2(c_t))    (+ f_{t+1} carry)
    di     = dc_t * g                      di_lin = di * i (1-i)
    dg     = dc_t * i                      dg_lin = dg * (1-g^2)
    df     = dc_t * c_{t-1}                df_lin = df * f (1-f)
    dW_hh += h_{t-1}^T @ dgates_t
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _fwd_kernel(xw_ref, whh_ref, y_ref, c_ref, h_s, c_s):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_s[:] = jnp.zeros_like(h_s)
        c_s[:] = jnp.zeros_like(c_s)

    H = h_s.shape[-1]
    gates = xw_ref[0] + jnp.dot(
        h_s[:], whh_ref[:], preferred_element_type=jnp.float32
    )
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c = f * c_s[:] + i * g
    h = o * jnp.tanh(c)
    h_s[:] = h
    c_s[:] = c
    y_ref[0] = h
    c_ref[0] = c


def _bwd_kernel(
    xw_ref, whh_ref, hprev_ref, cprev_ref, c_ref, dy_ref,
    dxw_ref, dwhh_ref, dh_s, dc_s,
):
    t = pl.program_id(0)  # reversed by index maps

    @pl.when(t == 0)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s)
        dc_s[:] = jnp.zeros_like(dc_s)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)

    H = dh_s.shape[-1]
    h_prev = hprev_ref[0]
    c_prev = cprev_ref[0]
    gates = xw_ref[0] + jnp.dot(
        h_prev, whh_ref[:], preferred_element_type=jnp.float32
    )
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c = c_ref[0]
    tc = jnp.tanh(c)

    dh = dy_ref[0] + dh_s[:]
    do_lin = dh * tc * o * (1 - o)
    dc = dh * o * (1 - tc * tc) + dc_s[:]
    di_lin = dc * g * i * (1 - i)
    dg_lin = dc * i * (1 - g * g)
    df_lin = dc * c_prev * f * (1 - f)
    dgates = jnp.concatenate([di_lin, df_lin, dg_lin, do_lin], axis=-1)

    dxw_ref[0] = dgates
    dwhh_ref[:] += jnp.dot(
        h_prev.T, dgates, preferred_element_type=jnp.float32
    )
    dh_s[:] = jnp.dot(dgates, whh_ref[:].T, preferred_element_type=jnp.float32)
    dc_s[:] = dc * f


def _fwd_call(xw: jnp.ndarray, w_hh: jnp.ndarray, interpret: bool):
    T, B, G = xw.shape
    H = G // 4
    y, c = pl.pallas_call(
        _fwd_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, G), lambda t: (t, 0, 0)),
            pl.BlockSpec((H, G), lambda t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        ],
        scratch_shapes=[
            _vmem((B, H)),
            _vmem((B, H)),
        ],
        interpret=interpret,
    )(xw.astype(jnp.float32), w_hh.astype(jnp.float32))
    return y, c


def _vmem(shape):
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.VMEM(shape, jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def lstm_seq(xw: jnp.ndarray, w_hh: jnp.ndarray, interpret: bool = False):
    """[T, B, 4H] pre-projected inputs + [H, 4H] recurrent weights -> [T, B, H]."""
    y, _ = _fwd_call(xw, w_hh, interpret)
    return y


def _lstm_fwd(xw, w_hh, interpret):
    y, c = _fwd_call(xw, w_hh, interpret)
    return y, (xw, w_hh, y, c)


def _lstm_bwd(interpret, res, dy):
    xw, w_hh, y, c = res
    T, B, G = xw.shape
    H = G // 4
    zeros = jnp.zeros((1, B, H), jnp.float32)
    h_prev = jnp.concatenate([zeros, y[:-1]], axis=0)
    c_prev = jnp.concatenate([zeros, c[:-1]], axis=0)

    rev = lambda t: (T - 1 - t, 0, 0)  # noqa: E731
    dxw, dwhh = pl.pallas_call(
        _bwd_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, G), rev),
            pl.BlockSpec((H, G), lambda t: (0, 0)),
            pl.BlockSpec((1, B, H), rev),
            pl.BlockSpec((1, B, H), rev),
            pl.BlockSpec((1, B, H), rev),
            pl.BlockSpec((1, B, H), rev),
        ],
        out_specs=[
            pl.BlockSpec((1, B, G), rev),
            pl.BlockSpec((H, G), lambda t: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, G), jnp.float32),
            jax.ShapeDtypeStruct((H, G), jnp.float32),
        ],
        scratch_shapes=[
            _vmem((B, H)),
            _vmem((B, H)),
        ],
        interpret=interpret,
    )(
        xw.astype(jnp.float32),
        w_hh.astype(jnp.float32),
        h_prev,
        c_prev,
        c,
        dy.astype(jnp.float32),
    )
    return dxw.astype(xw.dtype), dwhh.astype(w_hh.dtype)


lstm_seq.defvjp(_lstm_fwd, _lstm_bwd)


def lstm_pallas_available() -> bool:
    try:
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    except Exception:  # pragma: no cover
        return False
    return jax.default_backend() == "tpu"

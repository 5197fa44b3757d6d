"""Complex LSTM bottleneck, scan-based and MXU-friendly.

The reference ``NavieComplexLSTM`` (tools_for_model.py:138-178) holds two real
LSTMs and cross-combines four invocations::

    out_r = real(xr) - imag(xi)        out_i = imag(xr) + real(xi)

TPU-first redesign (not a port):

- the four LSTM invocations collapse into TWO ``lax.scan``s by stacking
  (xr, xi) along the batch axis — real_lstm([xr;xi]) yields (r2r, i2r) and
  imag_lstm([xr;xi]) yields (r2i, i2i) in one pass each;
- the input projection ``x @ W_ih`` is hoisted out of the scan into a single
  ``[T*2B, F] @ [F, 4H]`` matmul (MXU), so each scan step only does the small
  ``h @ W_hh`` recurrence;
- gate order and default init (uniform +-1/sqrt(H), separate b_ih/b_hh) follow
  torch nn.LSTM so reference checkpoints can be imported for parity tests.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def _uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class LSTM(nn.Module):
    """Single-layer unidirectional LSTM over [T, B, F] -> [T, B, H].

    torch-compatible gate order (i, f, g, o) and parameter split (w_ih, w_hh,
    b_ih, b_hh) so torch state_dicts map 1:1 (transposed) onto these params.

    ``use_pallas``: None = auto (pallas sequence kernel on TPU, lax.scan
    elsewhere); True/False forces the path.  The pallas kernel keeps W_hh and
    the (h, c) carry in VMEM for the whole sequence (ops/pallas/lstm.py).
    """

    hidden: int
    unroll: int = 8
    use_pallas: Optional[bool] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        state: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        T, B, F = x.shape
        H = self.hidden
        bound = 1.0 / math.sqrt(H)
        w_ih = self.param("w_ih", _uniform_init(bound), (F, 4 * H), self.param_dtype)
        w_hh = self.param("w_hh", _uniform_init(bound), (H, 4 * H), self.param_dtype)
        b_ih = self.param("b_ih", _uniform_init(bound), (4 * H,), self.param_dtype)
        b_hh = self.param("b_hh", _uniform_init(bound), (4 * H,), self.param_dtype)

        dtype = x.dtype
        # One big MXU matmul for all timesteps; the scan only does h @ w_hh.
        xw = (
            jnp.einsum("tbf,fg->tbg", x, w_ih.astype(dtype))
            + (b_ih + b_hh).astype(dtype)
        )
        w_hh = w_hh.astype(dtype)

        use_pallas = self.use_pallas
        if use_pallas is None:
            from .pallas.lstm import lstm_pallas_available

            use_pallas = lstm_pallas_available() and state is None
        if use_pallas:
            from .pallas.lstm import lstm_seq

            return lstm_seq(xw, w_hh).astype(dtype)

        if state is None:
            h0 = jnp.zeros((B, H), dtype)
            c0 = jnp.zeros((B, H), dtype)
        else:
            h0, c0 = state

        def step(carry, xw_t):
            h, c = carry
            gates = xw_t + h @ w_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        (_, _), ys = jax.lax.scan(step, (h0, c0), xw, unroll=self.unroll)
        return ys


class NaiveComplexLSTM(nn.Module):
    """Packed-complex LSTM layer: ([T,B,Fr], [T,B,Fi]) -> ([T,B,*], [T,B,*]).

    ``hidden_size`` counts the full packed width (real+imag), like the
    reference's ``rnn_units`` (tools_for_model.py:139-157).  ``projection_dim``
    adds per-part Linear output projections (the last bottleneck layer projects
    back to C/2*D; reference DCCRN.py:96).
    """

    hidden_size: int
    projection_dim: Optional[int] = None
    unroll: int = 8
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, xr: jnp.ndarray, xi: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        T, B, F = xr.shape
        units = self.hidden_size // 2
        z = jnp.concatenate([xr, xi], axis=1)  # [T, 2B, F]
        real_out2 = LSTM(units, unroll=self.unroll, param_dtype=self.param_dtype,
                         name="real_lstm")(z)
        imag_out2 = LSTM(units, unroll=self.unroll, param_dtype=self.param_dtype,
                         name="imag_lstm")(z)
        r2r, i2r = real_out2[:, :B], real_out2[:, B:]
        r2i, i2i = imag_out2[:, :B], imag_out2[:, B:]
        out_r = r2r - i2i
        out_i = r2i + i2r
        if self.projection_dim is not None:
            proj = self.projection_dim // 2
            bound = 1.0 / math.sqrt(units)
            dtype = out_r.dtype
            wr = self.param("proj_wr", _uniform_init(bound), (units, proj),
                            self.param_dtype)
            br = self.param("proj_br", _uniform_init(bound), (proj,),
                            self.param_dtype)
            wi = self.param("proj_wi", _uniform_init(bound), (units, proj),
                            self.param_dtype)
            bi = self.param("proj_bi", _uniform_init(bound), (proj,),
                            self.param_dtype)
            out_r = out_r @ wr.astype(dtype) + br.astype(dtype)
            out_i = out_i @ wi.astype(dtype) + bi.astype(dtype)
        return out_r, out_i

"""Pallas TPU kernel: fused ABF resize + 2-way sigmoid attention fusion.

The ABF fuse step (reference framework.py:207-219 equivalent) is

    y   = nearest_resize(residual, (D, T))          # freq-axis upscale
    z   = sigmoid(x @ Wx + y @ Wy + b)              # [B, D, T, 2]
    out = x * z[..., 0:1] + y * z[..., 1:2]

As separate XLA ops the upscaled residual ``y`` (teacher-sized, ~0.5 GB bf16
at the shallowest tap) is materialized in HBM, then re-read by both the
attention matmul and the fusion arithmetic — ~76 ms/step of nearly pure
HBM traffic in the round-2 trace (docs/PERF.md diagnosis 3).

This kernel reads ``x`` once and the SMALL residual once, expands it
``k = D / Dp``-fold inside VMEM, and writes the fused map once — forward
traffic drops from ~5 passes over the teacher-sized map to ~2.5.  The
attention logits ``z`` are written out (2 channels, ~3% of the map) and
reused by the backward kernel, which likewise streams x/res/z/g exactly once
and accumulates the tiny Wx/Wy/bias gradients in VMEM across the grid.

Dispatch requires the ABF geometry (time widths equal, integer freq upscale);
anything else falls back to the XLA path in ``distill/abf.py``.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

_TMP_BUDGET_BYTES = 6 * 1024 * 1024
_VMEM_LIMIT_BYTES = 64 * 1024 * 1024  # v5e: 128 MiB physical VMEM


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES)


def attfuse_available() -> bool:
    return _HAS_PLTPU and jax.default_backend() == "tpu"


def attfuse_dispatchable(x_shape, res_shape) -> bool:
    """Geometry the kernel handles: same B/T/C, integer freq upscale, and a
    freq tile that divides D, covers the upscale factor, and fits the VMEM
    budget (``_pick_td`` returning 0 means no such tile — e.g. upscale
    factor > 16 or a huge T*C row; those fall back to the XLA path instead
    of risking an over-budget Mosaic compile)."""
    b, d, t, c = x_shape
    rb, dp, rt, rc = res_shape
    if not (rb == b and rt == t and rc == c and d % dp == 0):
        return False
    return _pick_td(d, d // dp, t, c) > 0


def _pad_len(t: int) -> int:
    """T padded to a sublane-aligned length (Mosaic can only collapse
    [td, T, C] -> [td*T, C] when T is tile-aligned)."""
    return ((t + 15) // 16) * 16


def _pick_td(d: int, k: int, t: int, c: int) -> int:
    """Freq-rows-per-program tile, or 0 if no candidate both divides D /
    covers the upscale factor k and fits the VMEM working-set budget
    (callers must gate dispatch on a nonzero return)."""
    tp = _pad_len(t)
    for td in (16, 8, 4, 2, 1):
        if d % td or td % k:
            continue
        if 8 * td * tp * c * 2 <= _TMP_BUDGET_BYTES:
            return td
    return 0


def _expand(r: jnp.ndarray, k: int) -> jnp.ndarray:
    """Nearest-neighbour k-fold row upscale of [rows, T, C] inside VMEM."""
    return r if k == 1 else jnp.repeat(r, k, axis=0)


def _rows(x: jnp.ndarray, tp: int) -> jnp.ndarray:
    """[td, T, C] -> [td*TP, C] with zero rows padding T up to aligned TP.
    Zero rows are inert: they are sliced off on write, and in the backward
    they zero every reduction they touch (dz and g are zero there)."""
    td, t, c = x.shape
    if tp != t:
        x = jnp.concatenate([x, jnp.zeros((td, tp - t, c), x.dtype)], axis=1)
    return x.reshape(td * tp, c)


def _fwd_kernel(x_ref, r_ref, wx_ref, wy_ref, b_ref, o_ref, z_ref, *, k, tp):
    x = x_ref[0]  # [td, T, C]
    td, t, c = x.shape
    x2 = _rows(x, tp)
    y2 = _rows(_expand(r_ref[0], k), tp)
    p = jnp.dot(x2, wx_ref[:], preferred_element_type=jnp.float32)
    p += jnp.dot(y2, wy_ref[:], preferred_element_type=jnp.float32)
    z = jax.nn.sigmoid(p + b_ref[:].astype(jnp.float32))
    z = z.astype(x.dtype)
    out = x2 * z[:, 0:1] + y2 * z[:, 1:2]
    o_ref[0] = out.reshape(td, tp, c)[:, :t]
    z_ref[0] = z.reshape(td, tp, 2)[:, :t]


def _bwd_kernel(
    x_ref, r_ref, z_ref, g_ref, wx_ref, wy_ref,
    dx_ref, dr_ref, dwx_ref, dwy_ref, db_ref, *, k, tp,
):
    bidx = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(jnp.logical_and(bidx == 0, i == 0))
    def _():
        dwx_ref[:] = jnp.zeros_like(dwx_ref)
        dwy_ref[:] = jnp.zeros_like(dwy_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    x = x_ref[0]
    td, t, c = x.shape
    x2 = _rows(x, tp).astype(jnp.float32)
    y2 = _rows(_expand(r_ref[0], k), tp).astype(jnp.float32)
    g2 = _rows(g_ref[0], tp).astype(jnp.float32)
    z2 = _rows(z_ref[0], tp).astype(jnp.float32)

    # dz_j = <g, x or y> per position; dp = sigmoid' * dz
    dz = jnp.concatenate(
        [
            jnp.sum(g2 * x2, axis=-1, keepdims=True),
            jnp.sum(g2 * y2, axis=-1, keepdims=True),
        ],
        axis=-1,
    )
    dp = z2 * (1.0 - z2) * dz  # [rows, 2]

    wx = wx_ref[:].astype(jnp.float32)  # [C, 2]
    wy = wy_ref[:].astype(jnp.float32)
    # dp @ W^T as two rank-1 broadcasts (K=2 matmuls waste the MXU)
    dx2 = z2[:, 0:1] * g2 + dp[:, 0:1] * wx[:, 0] + dp[:, 1:2] * wx[:, 1]
    dy2 = z2[:, 1:2] * g2 + dp[:, 0:1] * wy[:, 0] + dp[:, 1:2] * wy[:, 1]
    dx_ref[0] = dx2.reshape(td, tp, c)[:, :t].astype(dx_ref.dtype)
    # nearest-upscale adjoint: sum each group of k upscaled rows
    dr = dy2.reshape(td // k, k, tp, c).sum(axis=1)[:, :t]
    dr_ref[0] = dr.astype(dr_ref.dtype)

    dim = (((0,), (0,)), ((), ()))
    dwx_ref[:] += jax.lax.dot_general(
        x2, dp, dimension_numbers=dim, preferred_element_type=jnp.float32
    )
    dwy_ref[:] += jax.lax.dot_general(
        y2, dp, dimension_numbers=dim, preferred_element_type=jnp.float32
    )
    db_ref[:] += jnp.sum(dp, axis=0, keepdims=True)


def _fwd_raw(x, res, wx, wy, bias, interpret):
    bsz, d, t, c = x.shape
    dp_rows = res.shape[1]
    k = d // dp_rows
    td = _pick_td(d, k, t, c)
    if td == 0:
        raise ValueError(
            f"attfuse: no freq tile fits geometry d={d} k={k} t={t} c={c}; "
            "gate dispatch with attfuse_dispatchable()"
        )
    return pl.pallas_call(
        partial(_fwd_kernel, k=k, tp=_pad_len(t)),
        grid=(bsz, d // td),
        in_specs=[
            pl.BlockSpec((1, td, t, c), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, td // k, t, c), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((c, 2), lambda b, i: (0, 0)),
            pl.BlockSpec((c, 2), lambda b, i: (0, 0)),
            pl.BlockSpec((1, 2), lambda b, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, td, t, c), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, td, t, 2), lambda b, i: (b, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, d, t, c), x.dtype),
            jax.ShapeDtypeStruct((bsz, d, t, 2), x.dtype),
        ],
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(x, res, wx, wy, bias)


def _bwd_raw(x, res, z, g, wx, wy, interpret):
    bsz, d, t, c = x.shape
    dp_rows = res.shape[1]
    k = d // dp_rows
    td = _pick_td(d, k, t, c)
    if td == 0:
        raise ValueError(
            f"attfuse: no freq tile fits geometry d={d} k={k} t={t} c={c}; "
            "gate dispatch with attfuse_dispatchable()"
        )
    return pl.pallas_call(
        partial(_bwd_kernel, k=k, tp=_pad_len(t)),
        grid=(bsz, d // td),
        in_specs=[
            pl.BlockSpec((1, td, t, c), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, td // k, t, c), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, td, t, 2), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, td, t, c), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((c, 2), lambda b, i: (0, 0)),
            pl.BlockSpec((c, 2), lambda b, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, td, t, c), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, td // k, t, c), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((c, 2), lambda b, i: (0, 0)),
            pl.BlockSpec((c, 2), lambda b, i: (0, 0)),
            pl.BlockSpec((1, 2), lambda b, i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, d, t, c), x.dtype),
            jax.ShapeDtypeStruct(res.shape, res.dtype),
            jax.ShapeDtypeStruct((c, 2), jnp.float32),
            jax.ShapeDtypeStruct((c, 2), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
        ],
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(x, res, z, g, wx, wy)


@lru_cache(maxsize=2)
def _attfuse_fn(interpret: bool):
    @jax.custom_vjp
    def f(x, res, wx, wy, bias):
        out, _ = _fwd_raw(x, res, wx, wy, bias, interpret)
        return out

    def fwd(x, res, wx, wy, bias):
        out, z = _fwd_raw(x, res, wx, wy, bias, interpret)
        return out, (x, res, z, wx, wy)

    def bwd(saved, g):
        x, res, z, wx, wy = saved
        dx, dres, dwx, dwy, db = _bwd_raw(x, res, z, g, wx, wy, interpret)
        return (
            dx,
            dres,
            dwx.astype(wx.dtype),
            dwy.astype(wy.dtype),
            db[0].astype(wx.dtype),
        )

    f.defvjp(fwd, bwd)
    return f


def attention_fuse(
    x: jnp.ndarray,
    res: jnp.ndarray,
    wx: jnp.ndarray,
    wy: jnp.ndarray,
    bias: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """sigmoid-attention fusion of ``x`` [B, D, T, C] with the nearest-
    upscaled ``res`` [B, D/k, T, C]; ``wx``/``wy`` [C, 2], ``bias`` [2].

    Pallas fused kernel (resize never hits HBM) on TPU when the geometry
    allows; caller is expected to gate with ``attfuse_dispatchable``.
    """
    return _attfuse_fn(interpret)(x, res, wx, wy, bias.reshape(1, 2))

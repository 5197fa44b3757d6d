"""Pallas TPU kernel: fused 3x3 NHWC convolution (SAME padding) + custom VJP.

Why this exists (round-2 TPU profile, docs/PERF.md): the ABF blocks mix 1x1
convs lowered as ``dot_general`` einsums with a 3x3 ``conv_general_dilated``
(reference framework.py:199-224 equivalent).  On TPU those two op kinds pick
*different* internal layouts for the same [B, D, T, C] map, so XLA inserts
relayout copies around every 3x3 conv — ~44.5 ms/step of pure "data
formatting" — and its small-channel conv emitter reaches only ~23% of peak.

This kernel computes the 3x3 conv as three MXU matmuls over im2col patches
built *in VMEM* (never materialized in HBM), reading and writing the maps in
the same row-major [B, D, T, C] layout the surrounding einsums use:

  out[b, d, t, o] = sum_{dd, tt, c} x[b, d+dd-1, t+tt-1, c] * w[dd, tt, c, o]

For each freq-row shift dd the kernel assembles ``[rows, 3C]`` patches
(time-shift concat along the channel axis) and accumulates
``patches @ w[dd].reshape(3C, O)`` in f32 — contraction width 3C keeps the
MXU busy even at the ABF's mid_channels=64.

Mosaic tiling detail: the time axis (T=483 at reference geometry) is not
sublane-aligned, so ``[td, T, C] -> [td*T, C]`` is an unsupported shape cast.
The kernel therefore zero-pads T to the next multiple of 16 *in VMEM*; the
first pad column doubles as the right-edge conv zero and the garbage rows are
sliced off on write (and contribute exact zeros to the weight gradient, since
the cotangent is padded with zeros too).

Grid: ``(B, D // td)``; each program owns ``td`` freq rows x the full time
axis.  The freq halo is two extra single-row input views (clamped index maps,
masked to zero at the array edges) — 1 + 2/td passes over the input instead
of the 3x of a naive shifted-view scheme.

Differentiable via ``jax.custom_vjp``:
 - dx is the same kernel applied to the cotangent with the spatially-flipped,
   transposed kernel (standard conv transpose identity);
 - dw is a second Pallas kernel accumulating ``patches^T @ g`` into a single
   f32 ``[3, 3C, O]`` block kept in VMEM across the whole grid.

Falls back to ``lax.conv_general_dilated`` (NHWC/HWIO, f32 accumulation) off
TPU; ``interpret=True`` runs the Pallas path on CPU for unit tests.
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

# VMEM budget for per-program temporaries (patches + f32 accumulator).
# Mosaic lane-pads every minor dim to 128 and keeps the unrolled dd-shift
# temporaries live, so the real footprint is ~3x this estimate; the explicit
# vmem_limit_bytes below raises the compiler's 16 MiB scoped default
# (v5e has 128 MiB physical VMEM) to absorb that.
_TMP_BUDGET_BYTES = 6 * 1024 * 1024
_VMEM_LIMIT_BYTES = 64 * 1024 * 1024


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES)


def conv3x3_available() -> bool:
    return _HAS_PLTPU and jax.default_backend() == "tpu"


def _pad_len(t: int) -> int:
    """T padded to a sublane-aligned length with >= 1 zero column (the
    right-edge conv pad)."""
    return ((t + 1 + 15) // 16) * 16


def _pick_td(d: int, t: int, c: int, o: int) -> int:
    """Largest divisor of D whose per-program temporaries fit the budget."""
    tp = _pad_len(t)
    for td in (32, 16, 8, 4, 2, 1):
        if d % td:
            continue
        # patches [td*TP, 3C] in input dtype (<=2B) + acc [td*TP, O] f32
        # + the three shifted copies of the block.
        tmp = td * tp * (3 * c * 2 + o * 4 + 3 * c * 2)
        if tmp <= _TMP_BUDGET_BYTES:
            return td
    return 1


def _halo_patches(xp, xc, xn, i, nd, td, tp):
    """Build im2col time-patches over the halo-extended block.

    Returns ``[(td+2)*TP, 3C]``: row ``(j, t)`` holds the (t-1, t, t+1)
    channel neighbourhoods of halo row ``j`` (j=0 is freq row i*td-1).
    T is zero-padded to the aligned TP; the pad rows double as the conv's
    right-edge zero and keep every downstream row-slice tile-aligned.
    Building patches ONCE over the halo (instead of per freq-shift) lets
    the three dd-contractions reuse one buffer — the dd shift becomes an
    *aligned* row-slice of the product (measured 2x faster than the
    per-shift-copy form on v5e).
    """
    top = jnp.where(i == 0, jnp.zeros_like(xp[0]), xp[0])
    bot = jnp.where(i == nd - 1, jnp.zeros_like(xn[0]), xn[0])
    xh = jnp.concatenate([top, xc, bot], axis=0)  # [td+2, T, C]
    th, t, c = xh.shape
    xh = jnp.concatenate(
        [xh, jnp.zeros((th, tp - t, c), xh.dtype)], axis=1
    )
    zcol = jnp.zeros((th, 1, c), xh.dtype)
    tm1 = jnp.concatenate([zcol, xh[:, : tp - 1]], axis=1)
    tp1 = jnp.concatenate([xh[:, 1:], zcol], axis=1)
    return jnp.concatenate([tm1, xh, tp1], axis=-1).reshape(th * tp, 3 * c)


def _fwd_kernel(xp_ref, xc_ref, xn_ref, w_ref, o_ref, *, td, tp):
    i = pl.program_id(1)
    nd = pl.num_programs(1)
    xc = xc_ref[0]  # [td, T, C]
    _, t, c = xc.shape
    o = w_ref.shape[-1]
    p = _halo_patches(xp_ref[:], xc, xn_ref[:], i, nd, td, tp)
    acc = jnp.zeros((td * tp, o), jnp.float32)
    for dd in range(3):
        y = jnp.dot(p, w_ref[dd], preferred_element_type=jnp.float32)
        # freq-shift dd == aligned row-slice of the halo product
        acc += y[dd * tp : dd * tp + td * tp]
    o_ref[0] = acc.reshape(td, tp, o)[:, :t].astype(o_ref.dtype)


def _wgrad_kernel(xp_ref, xc_ref, xn_ref, g_ref, dw_ref, *, td, tp):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nd = pl.num_programs(1)

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    xc = xc_ref[0]
    _, t, c = xc.shape
    g = g_ref[0]
    o = g.shape[-1]
    g = jnp.concatenate(
        [g, jnp.zeros((td, tp - t, o), g.dtype)], axis=1
    ).reshape(td * tp, o)
    p = _halo_patches(xp_ref[:], xc, xn_ref[:], i, nd, td, tp)
    for dd in range(3):
        dw_ref[dd] += jax.lax.dot_general(
            p[dd * tp : dd * tp + td * tp],
            g,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _halo_specs(td: int, d: int, t: int, c: int):
    """(prev-row, block, next-row) input views for a [B, D, T, C] operand."""
    return [
        pl.BlockSpec(
            (1, 1, t, c), lambda b, i: (b, jnp.maximum(i * td - 1, 0), 0, 0)
        ),
        pl.BlockSpec((1, td, t, c), lambda b, i: (b, i, 0, 0)),
        pl.BlockSpec(
            (1, 1, t, c),
            lambda b, i: (b, jnp.minimum(i * td + td, d - 1), 0, 0),
        ),
    ]


def _conv3x3_raw(x: jnp.ndarray, w: jnp.ndarray, interpret: bool):
    bsz, d, t, c = x.shape
    o = w.shape[-1]
    td = _pick_td(d, t, c, o)
    w2 = w.reshape(3, 3 * c, o)  # [dd, (tt, c), o] — free XLA-side reshape
    return pl.pallas_call(
        partial(_fwd_kernel, td=td, tp=_pad_len(t)),
        grid=(bsz, d // td),
        in_specs=_halo_specs(td, d, t, c)
        + [pl.BlockSpec((3, 3 * c, o), lambda b, i: (0, 0, 0))],
        out_specs=pl.BlockSpec((1, td, t, o), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, d, t, o), x.dtype),
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(x, x, x, w2)


def _wgrad_raw(x: jnp.ndarray, g: jnp.ndarray, interpret: bool):
    bsz, d, t, c = x.shape
    o = g.shape[-1]
    td = _pick_td(d, t, c, o)
    dw = pl.pallas_call(
        partial(_wgrad_kernel, td=td, tp=_pad_len(t)),
        grid=(bsz, d // td),
        in_specs=_halo_specs(td, d, t, c)
        + [pl.BlockSpec((1, td, t, o), lambda b, i: (b, i, 0, 0))],
        out_specs=pl.BlockSpec((3, 3 * c, o), lambda b, i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((3, 3 * c, o), jnp.float32),
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(x, x, x, g)
    return dw.reshape(3, 3, c, o)


@lru_cache(maxsize=2)
def _conv3x3_fn(interpret: bool):
    @jax.custom_vjp
    def f(x, w):
        return _conv3x3_raw(x, w, interpret)

    def fwd(x, w):
        return _conv3x3_raw(x, w, interpret), (x, w)

    def bwd(res, g):
        x, w = res
        # dx = conv3x3(g, flip(w)^T): spatial 180-degree flip, I/O transposed.
        w_flip = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
        dx = _conv3x3_raw(g, w_flip.astype(g.dtype), interpret)
        dw = _wgrad_raw(x, g, interpret).astype(w.dtype)
        return dx, dw

    f.defvjp(fwd, bwd)
    return f


def _conv3x3_xla(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    # No preferred_element_type: the f32 upcast would feed an f32 cotangent
    # into lax's conv transpose rule against bf16 operands (TypeError); TPU
    # and CPU backends accumulate bf16 convs in f32 internally anyway —
    # exactly what flax nn.Conv(dtype=bf16) did here before.
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv3x3_ninedot(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """3x3 SAME conv as 9 shifted 1x1 contractions (round-5 layout
    experiment, docs/PERF.md): every op is a dot_general in the einsum-
    native [B, D, T, C] layout, so the relayout copies XLA inserts between
    ``conv_general_dilated``'s preferred layout and the surrounding einsum
    ops (the round-3 trace's 44.5 ms "data formatting" row) cannot occur.
    The trade: the padded input is read once per offset (9x) instead of
    once — wins only if the relayout copies cost more than 8 extra
    streams of x through the fusion."""
    b, d, t, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for di in range(3):
        for dj in range(3):
            sl = jax.lax.slice(
                xp, (0, di, dj, 0), (b, di + d, dj + t, c))
            y = jnp.einsum("bdtc,co->bdto", sl, w[di, dj].astype(x.dtype))
            out = y if out is None else out + y
    return out


def conv3x3(x: jnp.ndarray, w: jnp.ndarray, interpret: bool = False):
    """3x3 SAME conv of ``x`` [B, D, T, C] with ``w`` [3, 3, C, O].

    f32 accumulation, output in ``x.dtype``.  Pallas fused kernel on TPU
    (and under ``interpret=True`` for CPU tests), XLA conv elsewhere.
    """
    if interpret or conv3x3_available():
        return _conv3x3_fn(interpret)(x, w)
    return _conv3x3_xla(x, w)

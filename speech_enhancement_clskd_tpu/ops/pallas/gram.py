"""Pallas TPU kernel: fused SPKD Gram-matrix pair, with custom VJP.

SPKD needs G_s = S S^T and G_t = T T^T for activations flattened to [B, D]
with D up to several million (the taps are ~[32, 128*483*C]); the matmuls are
skinny (B ~ 32) so the op is HBM-bandwidth-bound.  This kernel streams both
activation matrices tile-by-tile through VMEM in ONE pallas_call, accumulating
both Grams in f32 — one HBM pass per input, no intermediate HBM round
trips, and the two streams share the grid (double-buffered by the pallas
pipeline).

Differentiable: ``gram_pair`` carries a custom VJP.  The backward of
G = Z Z^T is dZ = (dG + dG^T) Z — two skinny [B,B]x[B,D] matmuls, left to
XLA (one streaming pass over each input, nothing to fuse beyond that).

Falls back to plain XLA einsum off-TPU (and under ``interpret=True`` for CPU
tests).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

TILE_D = 2048


def spkd_pallas_available() -> bool:
    return _HAS_PLTPU and jax.default_backend() == "tpu"


def _gram_pair_kernel(s_ref, t_ref, gs_ref, gt_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        gs_ref[:] = jnp.zeros_like(gs_ref)
        gt_ref[:] = jnp.zeros_like(gt_ref)

    s = s_ref[:]
    t = t_ref[:]
    gs_ref[:] += jnp.dot(s, s.T, preferred_element_type=jnp.float32)
    gt_ref[:] += jnp.dot(t, t.T, preferred_element_type=jnp.float32)


def _gram_pair_raw(s2: jnp.ndarray, t2: jnp.ndarray, interpret: bool):
    """One pallas_call producing (S S^T, T T^T) for 2-D [B, D] inputs."""
    B, ds = s2.shape
    dt = t2.shape[1]
    n_tiles = max(pl.cdiv(ds, TILE_D), pl.cdiv(dt, TILE_D))
    pad_s = n_tiles * TILE_D - ds
    pad_t = n_tiles * TILE_D - dt
    if pad_s:
        s2 = jnp.pad(s2, ((0, 0), (0, pad_s)))
    if pad_t:
        t2 = jnp.pad(t2, ((0, 0), (0, pad_t)))

    return pl.pallas_call(
        _gram_pair_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((B, TILE_D), lambda i: (0, i)),
            pl.BlockSpec((B, TILE_D), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((B, B), lambda i: (0, 0)),
            pl.BlockSpec((B, B), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, B), jnp.float32),
            jax.ShapeDtypeStruct((B, B), jnp.float32),
        ],
        interpret=interpret,
    )(s2, t2)


@lru_cache(maxsize=2)
def _gram_pair_fn(interpret: bool):
    @jax.custom_vjp
    def f(s2, t2):
        return _gram_pair_raw(s2, t2, interpret)

    def fwd(s2, t2):
        return _gram_pair_raw(s2, t2, interpret), (s2, t2)

    def bwd(res, cot):
        s2, t2 = res
        dgs, dgt = cot
        # d/dZ ||...||: G = Z Z^T  =>  dZ = (dG + dG^T) Z
        ds = jnp.dot(
            dgs + dgs.T, s2, preferred_element_type=jnp.float32
        ).astype(s2.dtype)
        dt = jnp.dot(
            dgt + dgt.T, t2, preferred_element_type=jnp.float32
        ).astype(t2.dtype)
        return ds, dt

    f.defvjp(fwd, bwd)
    return f


def gram_pair(
    s: jnp.ndarray, t: jnp.ndarray, interpret: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(S S^T, T T^T) in f32 for [B, *] inputs (flattened to [B, D]).

    Differentiable (custom VJP).  The two inputs may have different D; each
    is tiled independently over a shared grid of max(cdiv(Ds), cdiv(Dt))
    steps with zero-padding.
    """
    B = s.shape[0]
    assert t.shape[0] == B
    s2 = s.reshape(B, -1)
    t2 = t.reshape(B, -1)
    return _gram_pair_fn(interpret)(s2, t2)


def spkd_loss_pallas(
    student: jnp.ndarray,
    teacher: jnp.ndarray,
    reduction: str = "batchmean",
    interpret: bool = False,
) -> jnp.ndarray:
    """SPKD loss on the fused gram-pair kernel (forward AND backward work;
    ``losses.kd.spkd_loss`` dispatches here on TPU for large D)."""
    gs, gt = gram_pair(student, teacher, interpret=interpret)

    def norm_l1(g):
        n = jnp.maximum(jnp.sum(jnp.abs(g), axis=1, keepdims=True), 1e-12)
        return g / n

    loss = jnp.sum((norm_l1(gt) - norm_l1(gs)) ** 2)
    if reduction == "batchmean":
        return loss / (teacher.shape[0] ** 2)
    return loss

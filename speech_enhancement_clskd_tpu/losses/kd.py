"""Knowledge-distillation losses: SPKD Gram similarity + HCL.

SPKD (similarity-preserving KD): per-batch Gram matrix of flattened
activations, row-L1-normalized, squared-Frobenius difference
(reference framework.py:150-172 — whose awkward tensors-in-constructor API is
replaced by a plain pure function).

The Gram matmul ``[B, D] @ [D, B]`` with huge D is HBM-bandwidth-bound; a
fused Pallas kernel lives in ``ops/pallas/gram.py`` and is used automatically
on TPU for large D.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp


def _gram_l1(z: jnp.ndarray) -> jnp.ndarray:
    """Row-L1-normalized Gram matrix of z flattened to [B, D].

    Parity note: torch F.normalize(G, 1) divides each row by max(||row||_1, eps)
    with eps=1e-12 (framework.py:157-159 passes p=1 positionally).
    """
    z = z.reshape(z.shape[0], -1)
    # accumulate in f32 even for bf16 taps (preferred_element_type -> MXU)
    g = jnp.dot(z, z.T, preferred_element_type=jnp.float32)
    norm = jnp.maximum(jnp.sum(jnp.abs(g), axis=1, keepdims=True), 1e-12)
    return g / norm


def spkd_loss(
    student: jnp.ndarray,
    teacher: jnp.ndarray,
    reduction: str = "batchmean",
) -> jnp.ndarray:
    """||G_t - G_s||_F^2, optionally / B^2 (framework.py:161-172)."""
    g_s = _gram_l1(student)
    g_t = _gram_l1(teacher)
    loss = jnp.sum((g_t - g_s) ** 2)
    if reduction == "batchmean":
        return loss / (teacher.shape[0] ** 2)
    return loss


def _adaptive_avg_pool2d(x: jnp.ndarray, out: int) -> jnp.ndarray:
    """torch adaptive_avg_pool2d for the pooled HCL levels (square out)."""
    *lead, h, w = x.shape
    def pool_axis(a, size, axis):
        n = a.shape[axis]
        # torch: bin i covers [floor(i*n/size), ceil((i+1)*n/size))
        pieces = []
        for i in range(size):
            lo = (i * n) // size
            hi = -(-((i + 1) * n) // size)
            sl = [slice(None)] * a.ndim
            sl[axis] = slice(lo, hi)
            pieces.append(jnp.mean(a[tuple(sl)], axis=axis, keepdims=True))
        return jnp.concatenate(pieces, axis=axis)

    x = pool_axis(x, out, x.ndim - 2)
    x = pool_axis(x, out, x.ndim - 1)
    return x


def hcl(
    fstudent: Sequence[jnp.ndarray],
    fteacher: Sequence[jnp.ndarray],
    t_type: str = "encoder",
) -> jnp.ndarray:
    """Hierarchical context loss: MSE + pooled-pyramid MSEs with decaying
    weights (reference framework.py:287-306, with its 3-arg signature)."""
    total = 0.0
    for fs, ft in zip(fstudent, fteacher):
        fs = fs.astype(jnp.float32)
        ft = ft.astype(jnp.float32)
        h = fs.shape[-2]
        loss = jnp.mean((fs - ft) ** 2)
        cnt, tot = 1.0, 1.0
        for l in (4, 2, 1):
            if l >= h:
                continue
            ps = _adaptive_avg_pool2d(fs, l)
            pt = _adaptive_avg_pool2d(ft, l)
            cnt /= 2.0
            loss = loss + jnp.mean((ps - pt) ** 2) * cnt
            tot += cnt
        total = total + loss / tot
    return total

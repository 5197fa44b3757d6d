"""Knowledge-distillation losses: SPKD Gram similarity + HCL.

SPKD (similarity-preserving KD): per-batch Gram matrix of flattened
activations, row-L1-normalized, squared-Frobenius difference
(reference framework.py:150-172 — whose awkward tensors-in-constructor API is
replaced by a plain pure function).

The Gram matmul ``[B, D] @ [D, B]`` with huge D is HBM-bandwidth-bound; a
fused Pallas kernel (``ops/pallas/gram.py``, custom VJP) computes BOTH Grams
in one HBM pass.  Measured crossover on v5e (scripts/bench_gram.py,
GRAM_BENCH_r03.json): below D ~ 0.5 M the two paths are equal
within the dispatch floor — at the spkd strategy's [32, 48000] waveforms XLA
is marginally FASTER forward (1.26 vs 1.53 ms) — and the fused kernel's
backward only wins from D ~ 1 M (2.74 vs 3.04 ms).  Dispatch therefore fires
only for 2-D inputs with D >= _PALLAS_MIN_D (1 << 19); every reference
configuration (spkd waveforms 48 k, 4-D CLSKD taps) deliberately takes the
native-layout XLA dot_general below.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

# Measured v5e crossover (see module docstring): XLA and the fused kernel are
# indistinguishable below ~0.5 M elements/row; the kernel's one-pass backward
# wins ~10% from ~1 M.  4-D taps never dispatch here regardless (the
# reshape(B, -1) relayout would cost more than the fusion saves — see _gram).
_PALLAS_MIN_D = 1 << 19


def _gram(z: jnp.ndarray, batch_axis: int = 0) -> jnp.ndarray:
    """[B, B] Gram matrix of z treated as [B, D] (D = all non-batch dims).

    Contracts over the other axes IN PLACE — no ``reshape(B, -1)``: on TPU a
    flatten of a tiled non-row-major layout materializes as a relayout copy
    (profiled as 32x dynamic-update-slice while loops, VERDICT round 2), while
    dot_general with multiple contracting dims streams the operand once in
    its native layout.  ``batch_axis`` likewise avoids a materialized
    swapaxes for [T, B, F] LSTM taps.  Accumulates in f32 even for bf16 taps.
    """
    axes = tuple(i for i in range(z.ndim) if i != batch_axis)
    return jax.lax.dot_general(
        z, z,
        dimension_numbers=((axes, axes), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _gram_l1(z: jnp.ndarray, batch_axis: int = 0) -> jnp.ndarray:
    """Row-L1-normalized Gram matrix of z flattened to [B, D].

    Parity note: torch F.normalize(G, 1) divides each row by max(||row||_1, eps)
    with eps=1e-12 (framework.py:157-159 passes p=1 positionally).
    """
    g = _gram(z, batch_axis)
    norm = jnp.maximum(jnp.sum(jnp.abs(g), axis=1, keepdims=True), 1e-12)
    return g / norm


def _norm_l1(g: jnp.ndarray) -> jnp.ndarray:
    n = jnp.maximum(jnp.sum(jnp.abs(g), axis=1, keepdims=True), 1e-12)
    return g / n


def _grouped_gram_l1(z: jnp.ndarray, batch_axis: int, groups: int):
    """[G, b, b] row-L1-normalized Grams of the batch axis split into
    ``groups`` contiguous groups of b = B/groups, contracting in native
    layout (no relayout: splitting an axis is a free reshape)."""
    b_total = z.shape[batch_axis]
    if b_total % groups:
        raise ValueError(f"batch {b_total} not divisible into {groups} groups")
    shape = (
        z.shape[:batch_axis] + (groups, b_total // groups)
        + z.shape[batch_axis + 1:]
    )
    zg = z.reshape(shape)
    contract = tuple(
        i for i in range(zg.ndim) if i not in (batch_axis, batch_axis + 1)
    )
    g = jax.lax.dot_general(
        zg, zg,
        dimension_numbers=((contract, contract),
                           ((batch_axis,), (batch_axis,))),
        preferred_element_type=jnp.float32,
    )  # [G, b, b]
    norm = jnp.maximum(jnp.sum(jnp.abs(g), axis=2, keepdims=True), 1e-12)
    return g / norm


def spkd_loss(
    student: jnp.ndarray,
    teacher: jnp.ndarray,
    reduction: str = "batchmean",
    use_pallas: Optional[bool] = None,
    batch_axis: int = 0,
    groups: int = 1,
) -> jnp.ndarray:
    """||G_t - G_s||_F^2, optionally / B^2 (framework.py:161-172).

    ``use_pallas``: None = auto (fused TPU kernel for large 2-D inputs),
    True/False forces the path.  ``batch_axis``: which axis is the Gram
    batch (e.g. 1 for [T, B, F] LSTM taps) — contraction happens in the
    input's native layout either way.

    ``groups``: split the batch into G contiguous groups and average the
    per-group Gram losses (G=1 is the reference's single global Gram).
    Distributed rationale (scripts/comm_model.py): a GLOBAL Gram couples
    every utterance with every other, so under data parallelism GSPMD must
    all-gather every tapped activation — the dominant per-step ICI traffic
    of the CLSKD step (the grad psum is ~5 MB; the gram all-gathers are
    ~100x that).  With ``groups`` = the data-axis size each Gram stays on
    its shard and the all-gathers vanish; per-shard scope at per-chip batch
    32 matches the single-GPU reference's batch-32 Gram semantics exactly.
    """
    if groups > 1:
        g_s = _grouped_gram_l1(student, batch_axis, groups)
        g_t = _grouped_gram_l1(teacher, batch_axis, groups)
        loss = jnp.sum((g_t - g_s) ** 2)
        if reduction == "batchmean":
            b_local = teacher.shape[batch_axis] // groups
            return loss / (groups * b_local ** 2)
        return loss
    if use_pallas is None:
        from ..ops.pallas.gram import spkd_pallas_available

        d_s = int(jnp.size(student)) // student.shape[batch_axis]
        d_t = int(jnp.size(teacher)) // teacher.shape[batch_axis]
        # only for inputs that are ALREADY [B, D]: the kernel would need a
        # reshape(B,-1) for higher-rank taps, and that relayout copy costs
        # more than the fused gram saves (see _gram); 4-D taps go through
        # the native-layout dot_general instead.
        use_pallas = (
            spkd_pallas_available()
            and batch_axis == 0
            and student.ndim == 2
            and teacher.ndim == 2
            and min(d_s, d_t) >= _PALLAS_MIN_D
            and student.shape[0] == teacher.shape[0]
        )
    if use_pallas:
        from ..ops.pallas.gram import gram_pair

        g_s, g_t = gram_pair(student, teacher)
        g_s, g_t = _norm_l1(g_s), _norm_l1(g_t)
    else:
        g_s = _gram_l1(student, batch_axis)
        g_t = _gram_l1(teacher, batch_axis)
    loss = jnp.sum((g_t - g_s) ** 2)
    if reduction == "batchmean":
        return loss / (teacher.shape[batch_axis] ** 2)
    return loss


def spkd_loss_affine(
    student_raw: jnp.ndarray,
    a: jnp.ndarray,
    b: jnp.ndarray,
    teacher: jnp.ndarray,
    reduction: str = "batchmean",
    groups: int = 1,
) -> jnp.ndarray:
    """SPKD loss with the student's bn2 per-channel affine UNAPPLIED.

    The Gram of ``xhat = y*a + b`` (per-channel affine over the last axis)
    decomposes over per-channel Grams of the raw map y (docs/PERF.md
    round-5 bn2 fold)::

        G = sum_c a_c^2 S_c  +  u 1^T + 1 u^T  +  m * sum_c b_c^2
        S_c[i,j] = sum_dt y[i,:,:,c] y[j,:,:,c],   u = r (a*b),
        r[i,c] = sum_dt y[i,:,:,c],                m = D*T

    so the normalized map never materializes in HBM (the round-3 trace
    charged the bn2-apply write + gram re-read ~4 ms/step).  Same FLOPs as
    the single big Gram — the contraction is just batched over C.

    ``groups > 1`` falls back to the materialized path (the fold's byte
    saving is a single-chip concern; local grams are the multi-chip path).
    """
    if groups > 1:
        xhat = (student_raw * a.astype(student_raw.dtype)
                + b.astype(student_raw.dtype))
        return spkd_loss(xhat, teacher, reduction, use_pallas=False,
                         groups=groups)
    af, bf = a.astype(jnp.float32), b.astype(jnp.float32)
    contract = tuple(range(1, student_raw.ndim - 1))
    ch_axis = student_raw.ndim - 1
    s_c = jax.lax.dot_general(
        student_raw, student_raw,
        dimension_numbers=((contract, contract), ((ch_axis,), (ch_axis,))),
        preferred_element_type=jnp.float32,
    )  # [C, B, B]
    r = jnp.sum(student_raw.astype(jnp.float32), axis=contract)  # [B, C]
    m = 1
    for ax in contract:
        m *= student_raw.shape[ax]
    u = r @ (af * bf)  # [B]
    g = (
        jnp.einsum("c,cij->ij", af * af, s_c)
        + u[:, None] + u[None, :] + m * jnp.sum(bf * bf)
    )
    g_s = _norm_l1(g)
    g_t = _gram_l1(teacher, 0)
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

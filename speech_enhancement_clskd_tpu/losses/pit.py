"""Permutation-invariant training (PIT) utilities.

Behavioural equivalent of asteroid ``PITLossWrapper(pairwise_neg_sisdr,
pit_from='pw_mtx')`` used by the reference's validation/eval loops
(reference distill.py:56-57,164-166 and eval.py:25-27,67) to reorder the
estimated sources before metrics.

TPU design: the permutation search is exhaustive over the (static, tiny)
``n_src!`` permutations, fully batched and jittable — no host round trips.
``n_src`` is 1 or 2 for every LibriMix task (enh_single / sep_clean /
sep_noisy); 3 (=6 perms) still costs nothing.
"""

from __future__ import annotations

from itertools import permutations
from typing import Callable, Tuple

import jax.numpy as jnp


def pairwise_neg_si_sdr(
    est: jnp.ndarray, ref: jnp.ndarray, eps: float = 1e-8
) -> jnp.ndarray:
    """[..., n_est, n_ref] matrix of -SI-SDR(ref_j, est_i).

    ``est``/``ref``: [..., n_src, T].  Matches asteroid's
    ``pairwise_neg_sisdr`` (zero-mean first, scale projection onto ref).
    """
    est = est - jnp.mean(est, axis=-1, keepdims=True)
    ref = ref - jnp.mean(ref, axis=-1, keepdims=True)
    # [..., n_est, n_ref]
    dots = jnp.einsum("...it,...jt->...ij", est, ref)
    ref_energy = jnp.sum(ref**2, axis=-1)[..., None, :] + eps
    scale = dots / ref_energy  # [..., n_est, n_ref]
    # projection of est_i onto ref_j: scale_ij * ref_j
    proj = scale[..., None] * ref[..., None, :, :]  # [..., n_est, n_ref, T]
    noise = est[..., :, None, :] - proj
    ratio = jnp.sum(proj**2, axis=-1) / (jnp.sum(noise**2, axis=-1) + eps)
    return -10.0 * jnp.log10(ratio + eps)


def pit_from_pw_mtx(
    pw: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(min mean loss, best permutation index array) from a pairwise loss
    matrix [..., n_src, n_src].

    Returns (loss [...], perm [..., n_src]) where ``est[perm[k]]`` matches
    ``ref[k]`` — asteroid ``find_best_perm`` semantics.
    """
    n_src = pw.shape[-1]
    perms = list(permutations(range(n_src)))
    perm_arr = jnp.asarray(perms)  # [P, n_src]: est index for each ref slot
    # loss of perm p = mean_k pw[perm[k], k]
    losses = jnp.stack(
        [
            jnp.mean(
                jnp.stack([pw[..., p[k], k] for k in range(n_src)], axis=-1),
                axis=-1,
            )
            for p in perms
        ],
        axis=-1,
    )  # [..., P]
    best = jnp.argmin(losses, axis=-1)  # [...]
    return jnp.take_along_axis(losses, best[..., None], -1)[..., 0], perm_arr[best]


def pit_reorder(
    est: jnp.ndarray,
    ref: jnp.ndarray,
    pairwise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
    = pairwise_neg_si_sdr,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reorder ``est`` sources to best match ``ref`` (PIT).

    est/ref: [..., n_src, T].  Returns (est_reordered, min_loss[...]) —
    the reference's ``loss_func(est_sources, sources, return_est=True)``
    (eval.py:67).
    """
    pw = pairwise_fn(est, ref)
    loss, perm = pit_from_pw_mtx(pw)  # perm: [..., n_src]
    reordered = jnp.take_along_axis(est, perm[..., None], axis=-2)
    return reordered, loss


def pit_si_sdr_loss(est: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Scalar PIT loss (mean over batch of min-perm -SI-SDR) — the
    reference's validation ``loss_func(est, sources)`` (distill.py:164)."""
    pw = pairwise_neg_si_sdr(est, ref)
    loss, _ = pit_from_pw_mtx(pw)
    return jnp.mean(loss)

"""Time-domain signal losses (parity with reference tools_for_loss.py:16-108).

Pure functions over [..., T] waveforms.  Reference quirks preserved knowingly
(documented per function) so loss values are comparable across frameworks.
"""

from __future__ import annotations

import jax.numpy as jnp


def _dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * b, axis=-1, keepdims=True)


def sdr(s1: jnp.ndarray, s2: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Reference ``sdr`` (tools_for_loss.py:30-34).

    Note the reference squares the energies once more inside the log (sn**2 /
    (e**2)), i.e. it returns 20*log10 of the energy ratio; kept for parity.
    """
    sn = _dot(s1, s1)
    err = _dot(s1 - s2, s1 - s2)
    return jnp.mean(10 * jnp.log10(sn**2 / (err**2 + eps)))


def si_snr(s1: jnp.ndarray, s2: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Scale-invariant SNR of estimate s1 against reference s2
    (tools_for_loss.py:37-47)."""
    s_target = _dot(s1, s2) / (_dot(s2, s2) + eps) * s2
    e_noise = s1 - s_target
    return jnp.mean(
        10 * jnp.log10(_dot(s_target, s_target) / (_dot(e_noise, e_noise) + eps) + eps)
    )


def si_sdr(reference: jnp.ndarray, estimation: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """SI-SDR per Le Roux et al. (tools_for_loss.py:50-97): mean over the batch
    of the power ratio, in dB."""
    ref_energy = jnp.sum(reference**2, axis=-1, keepdims=True)
    scale = jnp.sum(reference * estimation, axis=-1, keepdims=True) / ref_energy + eps
    projection = scale * reference
    noise = estimation - projection
    ratio = jnp.sum(projection**2, axis=-1) / jnp.sum(noise**2, axis=-1) + eps
    return 10 * jnp.log10(jnp.mean(ratio) + eps)


def rmse(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """Root-mean-square error (tools_for_loss.py:100-108)."""
    mse = jnp.mean((y_pred - y_true) ** 2, axis=-1)
    return jnp.mean(jnp.sqrt(mse + 1e-7))

"""PIT reorder + multi-source bss_eval (reference eval.py:25-27,67-73)."""

import numpy as np
import jax.numpy as jnp

from speech_enhancement_clskd_tpu.losses.pit import (
    pairwise_neg_si_sdr,
    pit_from_pw_mtx,
    pit_reorder,
    pit_si_sdr_loss,
)
from speech_enhancement_clskd_tpu.metrics.bss import (
    bss_eval_sources,
    eval_metrics_sources,
    si_sdr_np,
)


def _srcs(rng, n_src=2, T=4000):
    return rng.standard_normal((n_src, T)).astype(np.float32) * 0.1


def test_pairwise_matrix_diagonal_is_si_sdr(rng):
    src = _srcs(rng)
    est = src + 0.01 * rng.standard_normal(src.shape).astype(np.float32)
    pw = np.asarray(pairwise_neg_si_sdr(jnp.asarray(est), jnp.asarray(src)))
    # diagonal ~ matched pairs: strongly negative (= high SI-SDR)
    assert pw[0, 0] < -15 and pw[1, 1] < -15
    # off-diagonal ~ mismatched: much worse
    assert pw[0, 1] > pw[0, 0] + 10 and pw[1, 0] > pw[1, 1] + 10
    # spot-check value against the numpy SI-SDR (zero-mean inputs)
    sm = src - src.mean(-1, keepdims=True)
    em = est - est.mean(-1, keepdims=True)
    np.testing.assert_allclose(
        -pw[0, 0], si_sdr_np(sm[0], em[0]), rtol=1e-3, atol=1e-3
    )


def test_pit_reorder_fixes_swapped_sources(rng):
    src = _srcs(rng)
    est = src[::-1].copy()  # swapped
    reordered, loss = pit_reorder(jnp.asarray(est), jnp.asarray(src))
    np.testing.assert_allclose(np.asarray(reordered), src, atol=1e-6)
    assert float(loss) < -40  # perfect match after reorder


def test_pit_reorder_identity_for_matched(rng):
    src = _srcs(rng)
    est = src + 0.05 * rng.standard_normal(src.shape).astype(np.float32)
    reordered, _ = pit_reorder(jnp.asarray(est), jnp.asarray(src))
    np.testing.assert_allclose(np.asarray(reordered), est, atol=1e-6)


def test_pit_batched_and_3src(rng):
    src = rng.standard_normal((4, 3, 2000)).astype(np.float32)
    perm = [2, 0, 1]
    est = src[:, perm]
    reordered, _ = pit_reorder(jnp.asarray(est), jnp.asarray(src))
    np.testing.assert_allclose(np.asarray(reordered), src, atol=1e-6)


def test_pit_loss_scalar(rng):
    src = _srcs(rng)
    est = src[::-1].copy()
    loss_sw = float(pit_si_sdr_loss(jnp.asarray(est)[None], jnp.asarray(src)[None]))
    loss_id = float(pit_si_sdr_loss(jnp.asarray(src)[None], jnp.asarray(src)[None]))
    # permutation-invariant: swapped == identity
    np.testing.assert_allclose(loss_sw, loss_id, rtol=1e-5)


def test_bss_eval_sources_clean_estimates(rng):
    src = _srcs(rng, T=6000)
    m = bss_eval_sources(src, src.copy())
    assert np.all(m["sdr"] > 40)
    assert np.all(m["sar"] > 40)


def test_bss_eval_sources_interference_shows_in_sir(rng):
    src = _srcs(rng, T=6000)
    est = np.stack([src[0] + 0.3 * src[1], src[1] + 0.3 * src[0]])
    m = bss_eval_sources(src, est)
    clean = bss_eval_sources(src, src.copy())
    # leaking the other source must cost SIR
    assert np.all(m["sir"] < clean["sir"] - 5)
    # but the projection identifies the interference: SAR stays high
    assert np.all(m["sar"] > 20)


def test_eval_metrics_sources_reduces_to_single(rng):
    from speech_enhancement_clskd_tpu.metrics.bss import eval_metrics

    T = 4000
    clean = rng.standard_normal(T).astype(np.float32) * 0.1
    mix = clean + 0.05 * rng.standard_normal(T).astype(np.float32)
    est = clean + 0.01 * rng.standard_normal(T).astype(np.float32)
    a = eval_metrics_sources(mix, clean[None], est[None], compute_pesq=False)
    b = eval_metrics(mix, clean, est, compute_pesq=False)
    for k in b:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-6)


def test_eval_metrics_sources_multi(rng):
    src = _srcs(rng, T=16000)
    mix = src.sum(0)
    est = src + 0.02 * rng.standard_normal(src.shape).astype(np.float32)
    m = eval_metrics_sources(mix, src, est, compute_pesq=False)
    assert m["si_sdr"] > m["input_si_sdr"]
    # stoi on synthetic white noise is degenerate; just require presence
    assert np.isfinite(m["stoi"]) and np.isfinite(m["input_stoi"])
    assert np.isfinite(m["sir"])

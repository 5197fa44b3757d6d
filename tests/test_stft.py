"""Golden tests for the STFT frontend vs torch implementations of the
documented reference behaviour (conv-DFT analysis, pinv synthesis,
torch.stft-style magnitudes)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from speech_enhancement_clskd_tpu.ops import stft as jstft


def torch_conv_stft(x: np.ndarray, win_len=400, hop=100, fft_len=512,
                    window="hamming"):
    """Reference-equivalent conv STFT in torch (tools_for_model.py:15-67)."""
    from scipy.signal import get_window

    win = get_window(window, win_len, fftbins=True)
    basis = np.fft.rfft(np.eye(fft_len))[:win_len]
    kernel = np.concatenate([basis.real, basis.imag], 1).T * win
    k = torch.from_numpy(kernel.astype(np.float32))[:, None, :]
    xt = torch.from_numpy(x.astype(np.float32))[:, None, :]
    xt = F.pad(xt, [win_len - hop, win_len - hop])
    return F.conv1d(xt, k, stride=hop).numpy()


def torch_conv_istft(spec: np.ndarray, win_len=400, hop=100, fft_len=512,
                     window="hamming"):
    """Reference-equivalent conv iSTFT in torch (tools_for_model.py:70-108)."""
    from scipy.signal import get_window

    win = get_window(window, win_len, fftbins=True)
    basis = np.fft.rfft(np.eye(fft_len))[:win_len]
    kernel = np.concatenate([basis.real, basis.imag], 1).T
    kernel = np.linalg.pinv(kernel).T * win
    k = torch.from_numpy(kernel.astype(np.float32))[:, None, :]
    st = torch.from_numpy(spec.astype(np.float32))
    out = F.conv_transpose1d(st, k, stride=hop)
    w = torch.from_numpy(win.astype(np.float32))[None, :, None]
    t = w.repeat(1, 1, spec.shape[-1]) ** 2
    enframe = torch.eye(win_len)[:, None, :]
    coff = F.conv_transpose1d(t, enframe, stride=hop)
    out = out / (coff + 1e-8)
    return out[..., win_len - hop : -(win_len - hop)].numpy()


@pytest.fixture(scope="module")
def kernels():
    return jstft.make_kernels(400, 100, 512, "hamming")


def test_stft_matches_reference_conv(rng, kernels):
    x = rng.standard_normal((2, 16000)).astype(np.float32)
    ours = np.asarray(jstft.stft(jnp.asarray(x), kernels))
    ref = torch_conv_stft(x)
    assert ours.shape == ref.shape == (2, 514, 163)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)


def test_istft_matches_reference_conv(rng, kernels):
    spec = rng.standard_normal((2, 514, 61)).astype(np.float32)
    ours = np.asarray(jstft.istft(jnp.asarray(spec), kernels))
    ref = torch_conv_istft(spec)[:, 0]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_roundtrip(rng, kernels):
    x = rng.standard_normal((1, 8000)).astype(np.float32)
    y = np.asarray(jstft.istft(jstft.stft(jnp.asarray(x), kernels), kernels))
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=2e-3)


def test_mag_phase(rng, kernels):
    x = rng.standard_normal((1, 4000)).astype(np.float32)
    mags, phase = jstft.stft_mag_phase(jnp.asarray(x), kernels)
    spec = np.asarray(jstft.stft(jnp.asarray(x), kernels))
    re, im = spec[:, :257], spec[:, 257:]
    np.testing.assert_allclose(
        np.asarray(mags), np.sqrt(re**2 + im**2), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(phase), np.arctan2(im, re), atol=1e-4)


@pytest.mark.parametrize(
    "fft,hop,win", [(512, 100, 400), (1024, 120, 600), (2048, 240, 1200)]
)
def test_stft_magnitude_matches_torch(rng, fft, hop, win):
    x = rng.standard_normal((3, 8000)).astype(np.float32)
    xt = torch.from_numpy(x)
    w = torch.hann_window(win)
    ref = torch.stft(xt, fft, hop, win, w, return_complex=True)
    ref = torch.sqrt(
        torch.clamp(ref.real**2 + ref.imag**2, min=1e-7)
    ).transpose(2, 1).numpy()
    ours = np.asarray(jstft.stft_magnitude(jnp.asarray(x), fft, hop, win, "hann"))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


def test_frame_overlap_add_inverse(rng):
    x = rng.standard_normal((2, 1200)).astype(np.float32)
    frames = jstft.frame(jnp.asarray(x), 400, 100)
    y = np.asarray(jstft.overlap_add(frames, 100))
    # interior samples are covered by exactly win/hop = 4 frames
    np.testing.assert_allclose(y[:, 300:-300], 4 * x[:, 300:-300], atol=1e-5)


class TestSafeGradForms:
    """safe_magnitude / safe_arctan2: bit-identical forward, finite backward
    at exact complex zeros (the round-4 bf16 CLSKD divergence was NaN grads
    born at sqrt/atan2 of exactly-(0,0) mask values; docs/PERF.md)."""

    def test_forward_matches_plain_on_nonzero(self):
        import jax.numpy as jnp
        from speech_enhancement_clskd_tpu.ops.stft import (
            safe_arctan2,
            safe_magnitude,
        )

        rng = np.random.default_rng(0)
        re = jnp.asarray(rng.standard_normal((64,)), jnp.float32)
        im = jnp.asarray(rng.standard_normal((64,)), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(safe_magnitude(re, im)),
            np.asarray(jnp.sqrt(re**2 + im**2)),
        )
        np.testing.assert_array_equal(
            np.asarray(safe_arctan2(im, re)),
            np.asarray(jnp.arctan2(im, re)),
        )

    def test_gradients_finite_at_exact_zero(self):
        import jax
        import jax.numpy as jnp
        from speech_enhancement_clskd_tpu.ops.stft import (
            safe_arctan2,
            safe_magnitude,
        )

        re = jnp.asarray([0.0, 0.5, 0.0], jnp.float32)
        im = jnp.asarray([0.0, 0.0, 0.3], jnp.float32)

        def f(re, im):
            return jnp.sum(safe_magnitude(re, im))

        def g(re, im):
            return jnp.sum(safe_arctan2(im, re))

        for fn in (f, g):
            gr, gi = jax.grad(fn, argnums=(0, 1))(re, im)
            assert np.isfinite(np.asarray(gr)).all(), fn.__name__
            assert np.isfinite(np.asarray(gi)).all(), fn.__name__
        # the PLAIN forms do NaN there — pin that the guard is load-bearing
        gr = jax.grad(lambda r, i: jnp.sum(jnp.sqrt(r**2 + i**2)))(re, im)
        assert not np.isfinite(np.asarray(gr)).all()

    def test_dccrn_mask_grads_finite_on_silence(self):
        """End-to-end: gradient through the full model on an input with a
        digitally-silent region stays finite (plain atan2/sqrt NaN here)."""
        import jax
        import jax.numpy as jnp
        from speech_enhancement_clskd_tpu.config import DCCRNConfig
        from speech_enhancement_clskd_tpu.models.dccrn import make_model

        cfg = DCCRNConfig(name="t", kernel_num=(4, 8), rnn_units=8)
        model = make_model(cfg)
        rng = np.random.default_rng(1)
        wav = np.zeros((1, 8000), np.float32)
        wav[0, :2000] = rng.standard_normal(2000) * 0.1  # rest: exact silence
        wav = jnp.asarray(wav)
        v = model.init(jax.random.PRNGKey(0), wav, training=True)

        def loss(params):
            out = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                wav, training=True, mutable=["batch_stats"],
            )[0]
            return jnp.sum(out.wav**2)

        grads = jax.grad(loss)(v["params"])
        for leaf in jax.tree.leaves(grads):
            assert np.isfinite(np.asarray(leaf)).all()

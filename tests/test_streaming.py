"""Streaming engine vs offline inference: closeness, shapes, latency."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_enhancement_clskd_tpu.config import DCCRNConfig
from speech_enhancement_clskd_tpu.eval.streaming import StreamingEnhancer
from speech_enhancement_clskd_tpu.models import make_model

CFG = DCCRNConfig(name="stream-test", kernel_num=(4, 8, 8), rnn_units=16)


@pytest.fixture(scope="module")
def setup():
    model = make_model(CFG)
    wav = jnp.zeros((1, 8000), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), wav, training=True)
    # freeze stats: inference-mode variables
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    rng = np.random.default_rng(0)
    t = np.arange(32000) / 16000
    sig = (0.4 * np.sin(2 * np.pi * 220 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
           + 0.05 * rng.standard_normal(32000)).astype(np.float32)
    return model, variables, sig


def test_stream_close_to_offline(setup):
    model, variables, sig = setup
    offline = np.asarray(
        model.apply(variables, jnp.asarray(sig[None]), training=False).wav
    )[0]
    eng = StreamingEnhancer(CFG, variables, chunk_frames=40, context_frames=64)
    streamed = eng.stream(sig)
    assert streamed.shape == sig.shape
    # ignore the very beginning (offline edge padding differs from warmup)
    a, b = offline[4000:], streamed[4000:]
    err = np.sqrt(np.mean((a - b) ** 2)) / (np.sqrt(np.mean(a**2)) + 1e-9)
    assert err < 0.02, err  # < 2% relative RMS deviation


def test_stream_batch_and_odd_length(setup):
    model, variables, sig = setup
    eng = StreamingEnhancer(CFG, variables, chunk_frames=32, context_frames=32)
    batch = np.stack([sig[:17777], sig[100:17877]])
    out = eng.stream(batch)
    assert out.shape == batch.shape
    assert np.isfinite(out).all()


def test_latency_accounting():
    eng_cfg = CFG
    variables = make_model(eng_cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8000)), training=True
    )
    eng = StreamingEnhancer(eng_cfg, dict(variables), chunk_frames=48)
    # chunk (48 * 100) + lookahead guard (win - hop = 300)
    assert eng.latency_samples == 5100
    assert abs(eng.latency_ms - 318.75) < 1e-6


def test_streaming_dccrnet_family_matches_offline():
    """Chunked inference on the asteroid family tracks the offline output
    (needs right lookahead: its convs consume one future frame per layer)."""
    import jax

    from speech_enhancement_clskd_tpu.config import DCCRNConfig, STFTConfig
    from speech_enhancement_clskd_tpu.eval.streaming import StreamingEnhancer
    from speech_enhancement_clskd_tpu.models import make_model

    cfg = DCCRNConfig(name="s", family="dccrnet",
                      stft=STFTConfig(window="sqrthann"),
                      kernel_num=(4, 8, 8), rnn_units=16)
    model = make_model(cfg)
    rng = np.random.default_rng(5)
    wav = (rng.standard_normal(32000) * 0.1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8000)),
                           training=False)
    offline = np.asarray(
        model.apply(variables, jnp.asarray(wav[None]), training=False).wav
    )[0]
    eng = StreamingEnhancer(cfg, variables, chunk_frames=32, context_frames=96)
    streamed = eng.stream(wav)
    assert streamed.shape == wav.shape
    # interior agreement (skip LSTM warm-up at the start; the last chunk's
    # flush region differs inherently: the offline iSTFT tapers at the signal
    # edge while the streamed window sees zero-padded future)
    s0, s1 = 8000, len(wav) - eng.chunk_samples
    err = np.abs(streamed[s0:s1] - offline[s0:s1])
    denom = np.abs(offline[s0:s1]).max() + 1e-9
    assert err.max() / denom < 1e-3

"""DCCRN model family: geometry, masking modes, jit, param counts.

Geometry ground truth is the reference's hook-printed shape table
(SURVEY.md section 2.1 "teacher/student geometry", from test_shape.ipynb).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_enhancement_clskd_tpu.config import STUDENT, TEACHER, DCCRNConfig
from speech_enhancement_clskd_tpu.models import DCCRN, make_model
from speech_enhancement_clskd_tpu.models.dccrn import init_params, param_count


@pytest.fixture(scope="module")
def student_setup():
    cfg = STUDENT
    model = make_model(cfg)
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 48000)).astype(np.float32) * 0.1
    )
    variables = model.init(jax.random.PRNGKey(0), wav, training=True)
    return cfg, model, wav, variables


def test_student_geometry(student_setup):
    cfg, model, wav, variables = student_setup
    out, _ = model.apply(wav=wav, training=True, mutable=["batch_stats"],
                         variables=variables)
    assert out.wav.shape == (2, 48000)
    # encoder taps: freq halves each layer 128->4, channels 8..64 (packed)
    freqs = [t.shape[1] for t in out.taps.encoder]
    chans = [t.shape[-1] for t in out.taps.encoder]
    assert freqs == [128, 64, 32, 16, 8, 4]
    assert chans == list(cfg.kernel_num) == [8, 16, 32, 64, 64, 64]
    assert all(t.shape[2] == 483 for t in out.taps.encoder)  # 3 s -> 483 frames
    # decoder taps mirror back up
    dfreqs = [t.shape[1] for t in out.taps.decoder]
    assert dfreqs == [8, 16, 32, 64, 128, 256]
    # lstm taps: [T, B, C/2*D] = [483, 2, 32*4/2... ] -> 32/2? kernel_num[-1]=64
    # packed half = 32 channels, D = 4 -> 128
    assert out.taps.lstm_real.shape == (483, 2, 128)
    assert out.taps.lstm_imag.shape == (483, 2, 128)
    assert out.mask_real.shape == (2, 257, 483)
    assert out.est_real.shape == (2, 257, 483)
    assert np.all(np.abs(np.asarray(out.wav)) <= 1.0)


def test_param_counts():
    # teacher ~3.7M params and a ~16x smaller student (SURVEY.md section 0/6;
    # the own-DCCRN student at kernel_num [8..64]/rnn 64 is ~0.23M)
    sp = init_params(STUDENT, jax.random.PRNGKey(0), samples=2000)
    tp = init_params(TEACHER, jax.random.PRNGKey(0), samples=2000)
    ns, nt = param_count(sp["params"]), param_count(tp["params"])
    assert 0.15e6 < ns < 0.35e6, ns
    assert 2.5e6 < nt < 5.0e6, nt
    assert 10 < nt / ns < 22


@pytest.mark.parametrize("mode", ["E", "C", "R"])
def test_masking_modes(mode):
    import dataclasses

    cfg = dataclasses.replace(STUDENT, masking_mode=mode)
    model = make_model(cfg)
    wav = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 8000)).astype(np.float32) * 0.1
    )
    variables = model.init(jax.random.PRNGKey(0), wav, training=True)
    out, _ = model.apply(variables, wav, training=True, mutable=["batch_stats"])
    assert out.wav.shape == (1, 8000)
    assert np.isfinite(np.asarray(out.wav)).all()


def test_jit_and_eval_mode(student_setup):
    cfg, model, wav, variables = student_setup

    @jax.jit
    def fwd(v, w):
        return model.apply(v, w, training=False).wav

    y = np.asarray(fwd(variables, wav))
    assert y.shape == (2, 48000)
    assert np.isfinite(y).all()


def test_grads_flow(student_setup):
    cfg, model, wav, variables = student_setup

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            wav, training=True, mutable=["batch_stats"],
        )
        return jnp.mean((out.wav - wav) ** 2)

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    nonzero = sum(int(np.any(np.asarray(l) != 0)) for l in leaves)
    assert nonzero > len(leaves) * 0.9  # every layer gets gradient


def test_bfloat16_compute_path():
    """compute_dtype='bfloat16': MXU-friendly forward stays close to f32 and
    internal activations actually run in bf16 (params stay f32)."""
    import dataclasses

    cfg32 = DCCRNConfig(name="bf16-test", kernel_num=(4, 8, 8), rnn_units=16)
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    m32, m16 = make_model(cfg32), make_model(cfg16)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32) * 0.1)
    v = m32.init(jax.random.PRNGKey(0), wav, training=False)
    out32 = m32.apply(v, wav, training=False)
    out16 = m16.apply(v, wav, training=False)  # same f32 params
    # encoder taps really are bf16
    assert out16.taps.encoder[0].dtype == jnp.bfloat16
    assert out32.taps.encoder[0].dtype == jnp.float32
    # output wav back in f32 and close to the f32 path
    assert out16.wav.dtype == jnp.float32
    err = float(jnp.sqrt(jnp.mean((out16.wav - out32.wav) ** 2)))
    ref = float(jnp.sqrt(jnp.mean(out32.wav**2))) + 1e-12
    assert err / ref < 0.15, (err, ref)
    assert np.isfinite(np.asarray(out16.wav)).all()

"""Time-axis sequence parallelism vs offline single-device forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from speech_enhancement_clskd_tpu.config import DCCRNConfig, MeshConfig
from speech_enhancement_clskd_tpu.models import make_model
from speech_enhancement_clskd_tpu.parallel.mesh import make_mesh
from speech_enhancement_clskd_tpu.parallel.sequence import (
    sharded_utterance_forward,
)

CFG = DCCRNConfig(name="sp", kernel_num=(4, 8, 8), rnn_units=16)


@pytest.fixture(scope="module")
def setup():
    model = make_model(CFG)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8000)), training=True
    )
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    rng = np.random.default_rng(0)
    t = np.arange(64000) / 16000
    sig = (0.4 * np.sin(2 * np.pi * 220 * t)
           + 0.05 * rng.standard_normal(64000)).astype(np.float32)
    return model, variables, sig


def test_sequence_parallel_matches_offline(setup):
    model, variables, sig = setup
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    wav = jnp.asarray(np.stack([sig, 0.8 * sig]))
    out = np.asarray(
        sharded_utterance_forward(model, variables, wav, mesh, "data")
    )
    offline = np.asarray(
        model.apply(variables, wav, training=False).wav
    )
    assert out.shape == offline.shape
    # skip the global edges; interior must match the offline result closely
    a, b = offline[:, 8000:-8000], out[:, 8000:-8000]
    err = np.sqrt(np.mean((a - b) ** 2)) / np.sqrt(np.mean(a**2))
    assert err < 0.02, err


def test_sequence_parallel_rejects_bad_length(setup):
    model, variables, _ = setup
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    with pytest.raises(ValueError):
        sharded_utterance_forward(
            model, variables, jnp.zeros((1, 12345)), mesh, "data"
        )

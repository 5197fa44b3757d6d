"""Asteroid-compat DCCRNet family: import + numerical parity tests.

Evidence chain (see also tests/asteroid_ref.py):
1. pure-Python torch-zip reader == torch.load, bit for bit;
2. analytic filterbank == the checkpoint's stored ``_filters``;
3. flax DCCRNet forward == the torch replica (same imported weights);
4. flax DCCRNet reproduces the reference's SHIPPED enhanced wavs
   (example_CLSKD, written by reference eval.py:89-101 with
   checkpoint/the_best_model.pth) at the PCM16 quantization floor;
5. geometry matches the torchinfo summary embedded in reference
   test-asteroid.ipynb cell 39.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from speech_enhancement_clskd_tpu.models.dccrnet import (
    ARCHITECTURES,
    DCCRNet,
    asteroid_filterbank,
    config_from_model_args,
    load_reference_bundle,
    params_from_asteroid_state_dict,
)
from speech_enhancement_clskd_tpu.utils.torch_zip import load_torch_checkpoint

REF_CKPT = "/root/reference/checkpoint/the_best_model.pth"
REF_EXAMPLES = "/root/reference/example_CLSKD"


@pytest.fixture(scope="module")
def ref_ckpt():
    return load_torch_checkpoint(REF_CKPT)


@pytest.fixture(scope="module")
def bundle():
    return load_reference_bundle(REF_CKPT)


def test_torch_zip_reader_matches_torch(ref_ckpt):
    torch = pytest.importorskip("torch")
    from torch.serialization import safe_globals

    with safe_globals([torch.torch_version.TorchVersion]):
        tck = torch.load(REF_CKPT, map_location="cpu")
    assert ref_ckpt["model_name"] == tck["model_name"] == "DCCRNet_mini"
    assert ref_ckpt["model_args"] == tck["model_args"]
    sd, tsd = ref_ckpt["state_dict"], tck["state_dict"]
    assert list(sd) == list(tsd)
    for k in tsd:
        assert np.array_equal(np.asarray(sd[k]), tsd[k].numpy()), k


def test_analytic_filterbank_matches_checkpoint(ref_ckpt):
    stored = np.asarray(ref_ckpt["state_dict"]["encoder.filterbank._filters"])
    assert np.abs(stored.squeeze(1).T - asteroid_filterbank()).max() < 1e-6
    win = np.asarray(ref_ckpt["state_dict"]["encoder.filterbank.torch_window"])
    n = np.arange(400)
    assert np.abs(win - np.sin(np.pi * n / 400)).max() < 1e-6


def test_config_from_model_args(ref_ckpt):
    cfg = config_from_model_args(ref_ckpt["model_args"])
    assert cfg.family == "dccrnet"
    assert cfg.kernel_num == (8, 16, 32, 64, 64, 64)
    assert cfg.rnn_units == 64
    assert cfg.stft.fft_len == 512 and cfg.stft.win_len == 400


def test_import_consumes_all_tensors(ref_ckpt):
    cfg = config_from_model_args(ref_ckpt["model_args"])
    variables = params_from_asteroid_state_dict(ref_ckpt["state_dict"], cfg)
    n_imported = sum(int(np.asarray(x).size) for x in
                     __import__("jax").tree.leaves(variables))
    # every masker tensor except num_batches_tracked counters; filterbanks
    # are analytic. bias pairs combine but sizes are preserved 1:1.
    expected = sum(
        int(np.asarray(v).size)
        for k, v in ref_ckpt["state_dict"].items()
        if k.startswith("masker") and "num_batches_tracked" not in k
    )
    assert n_imported == expected


def test_init_tree_matches_imported(bundle):
    import jax

    model, variables = bundle
    init_vars = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8000), jnp.float32), training=False
    )
    init_shapes = jax.tree.map(lambda x: x.shape, init_vars)
    imp_shapes = jax.tree.map(lambda x: x.shape, variables)
    assert init_shapes == imp_shapes


def test_forward_matches_torch_replica(bundle):
    torch = pytest.importorskip("torch")
    from asteroid_ref import dccrnet_forward, load_reference_state_dict

    model, variables = bundle
    sd = load_reference_state_dict()["state_dict"]
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref_batch = dccrnet_forward(
            torch.from_numpy(wav), sd, drop="last", batch_stats=True
        ).numpy()
        ref_run = dccrnet_forward(
            torch.from_numpy(wav), sd, drop="last", batch_stats=False
        ).numpy()
    ours_batch = np.asarray(
        model.apply(variables, jnp.asarray(wav), training=False,
                    bn_batch_stats=True).wav
    )
    ours_run = np.asarray(
        model.apply(variables, jnp.asarray(wav), training=False).wav
    )
    assert np.abs(ours_batch - ref_batch).max() < 5e-6
    assert np.abs(ours_run - ref_run).max() < 5e-6


def test_reproduces_shipped_enhanced_wav(bundle):
    from asteroid_ref import read_wav

    model, variables = bundle
    mix = read_wav(f"{REF_EXAMPLES}/ex_606/mixture.wav")
    gold = read_wav(f"{REF_EXAMPLES}/ex_606/s0_estimate.wav")
    # reference eval.py runs the model without .eval() -> batch-stats BN
    est = np.asarray(
        model.apply(variables, jnp.asarray(mix[None]), training=False,
                    bn_batch_stats=True).wav
    )[0]
    a = est / np.max(np.abs(est))
    b = gold / np.max(np.abs(gold))
    assert np.corrcoef(a, b)[0, 1] > 0.999999
    assert np.max(np.abs(a - b)) < 2e-4  # PCM16 quantization floor


def test_geometry_matches_torchinfo(bundle):
    """Shapes from reference test-asteroid.ipynb cell 39 (teacher table scales
    to the student by the channel plan; time loses 1 frame per encoder)."""
    model, variables = bundle
    wav = jnp.zeros((2, 48000), jnp.float32)
    out = model.apply(variables, wav, training=False)
    taps = out.taps
    # torchinfo (B=8, 48000): frames 477; encoders [128,476] .. [4,471]
    freqs = [128, 64, 32, 16, 8, 4]
    times = [476, 475, 474, 473, 472, 471]
    chans = [8, 16, 32, 64, 64, 64]  # packed re+im
    assert len(taps.encoder) == 6
    for tap, f, t, c in zip(taps.encoder, freqs, times, chans):
        assert tap.shape == (2, f, t, c)
    # decoders: Identity tap (rnn out) + 5 blocks
    dfreqs = [4, 8, 16, 32, 64]
    dtimes = [471, 472, 473, 474, 475]
    dchans = [64, 64, 64, 32, 16]
    assert len(taps.decoder) == 6
    for tap, f, t, c in zip(taps.decoder, dfreqs, dtimes, dchans):
        assert tap.shape == (2, f, t, c)
    assert taps.decoder[5].shape == (2, 128, 476, 8)
    # lstm tap: layer-2 complex LSTM output, per part [T, B, H=32]
    assert taps.lstm_real.shape == (471, 2, 32)
    assert out.wav.shape == (2, 48000)
    assert out.mask_real.shape == (2, 257, 477)


def test_architecture_registry():
    assert ARCHITECTURES["DCCRN-CL"]["kernel_num"] == (32, 64, 128, 256, 256, 256)
    # teacher param count: torchinfo cell 39 reports 3,669,336 total params
    import jax

    from speech_enhancement_clskd_tpu.config import DCCRNET_TEACHER
    from speech_enhancement_clskd_tpu.models import make_model

    model = make_model(DCCRNET_TEACHER)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8000), jnp.float32), training=False
    )
    n = sum(int(x.size) for x in jax.tree.leaves(variables["params"]))
    # torchinfo counts conv/BN/PReLU/LSTM/linear params (running stats are
    # buffers); our bias-free convs and packed BN match 1:1
    assert n == 3_669_336


def test_clskd_distillation_with_dccrnet_family():
    """The full CLSKD strategy (ABF fusion + SPKD + MRSTFT) runs on the
    asteroid-geometry family, whose taps shrink the time axis per layer
    (reference ABF resizes the residual to each map's (freq, time) plan,
    framework.py:212-215)."""
    import numpy as np

    from speech_enhancement_clskd_tpu.config import (
        DataConfig,
        DCCRNConfig,
        DistillConfig,
        MeshConfig,
        STFTConfig,
        TrainConfig,
    )
    from speech_enhancement_clskd_tpu.train import Trainer

    stft = STFTConfig(window="sqrthann")
    cfg = TrainConfig(
        teacher=DCCRNConfig(name="t", family="dccrnet", stft=stft,
                            kernel_num=(8, 16, 16), rnn_units=32),
        student=DCCRNConfig(name="s", family="dccrnet", stft=stft,
                            kernel_num=(4, 8, 8), rnn_units=16),
        data=DataConfig(synthetic=True, synthetic_size=4, segment=0.5,
                        batch_size=4),
        distill=DistillConfig(strategy="clskd"),
        mesh=MeshConfig(data=-1, model=1),
    )
    trainer = Trainer(cfg)
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    mix = jnp.asarray((rng.standard_normal((4, 8000)) * 0.1).astype(np.float32))
    clean = mix * 0.9
    losses = []
    for _ in range(3):
        state, logs = trainer.train_step(state, mix, clean)
        losses.append(float(logs["train_loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    for key in ("enc_loss", "dec_loss", "clstm_real_loss", "base_loss"):
        assert key in logs


def test_evaluate_pth_bundle_dispatch(tmp_path):
    """evaluate_bundle accepts the asteroid .pth directly (torch-free)."""
    from speech_enhancement_clskd_tpu.data import SyntheticEnhancementDataset
    from speech_enhancement_clskd_tpu.eval import evaluate_bundle

    ds = SyntheticEnhancementDataset(size=2, segment=1.0, sample_rate=16000,
                                     seed=7)
    res = evaluate_bundle(
        REF_CKPT, ds, sample_rate=16000, compute_pesq=False,
        results_path=str(tmp_path / "m.json"), bn_batch_stats=True,
    )
    assert "stoi" in res and np.isfinite(res["stoi"])


def test_import_torch_cli_roundtrip(tmp_path):
    import jax

    from speech_enhancement_clskd_tpu.cli import main
    from speech_enhancement_clskd_tpu.models import make_model
    from speech_enhancement_clskd_tpu.utils.serialization import load_bundle

    out = str(tmp_path / "student.npz")
    assert main(["import-torch", "--pth", REF_CKPT, "--out", out]) == 0
    cfg, variables, meta = load_bundle(out)
    assert cfg.family == "dccrnet"
    assert meta["model_args"]["stft_n_filters"] == 512
    model = make_model(cfg)
    wav = jnp.zeros((1, 4000), jnp.float32)
    o = model.apply(variables, wav, training=False)
    assert o.wav.shape == (1, 4000)

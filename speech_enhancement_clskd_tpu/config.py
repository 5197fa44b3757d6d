"""Typed configuration system.

Replaces the reference's dual config (module constants in ``config.py`` +
YAML->argparse in ``conf.yml``; see reference ``config.py:1-48`` and
``conf.yml:1-26``) with one source of truth: frozen dataclasses with YAML
loading and dotted-path CLI overrides.  Precedence is explicit
(defaults < YAML < CLI), fixing the reference's confusing split where e.g.
``conf.yml`` batch_size=12 was parsed but silently ignored in favour of
``config.py`` batch=32.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import yaml


@dataclass(frozen=True)
class STFTConfig:
    """Analysis/synthesis frontend. Mirrors reference ``config.py:22-29``."""

    sample_rate: int = 16000
    win_len: int = 400
    hop: int = 100
    fft_len: int = 512
    window: str = "hamming"  # scipy get_window name, periodic (fftbins=True)


@dataclass(frozen=True)
class DCCRNConfig:
    """One parameterized family covering teacher and student.

    Teacher geometry: reference ``config.py:31-35`` (rnn_units=256,
    kernel_num=[32,64,128,256,256,256]).  Student: ``config.py:46-48``
    (rnn_units=64, kernel_num=[8,16,32,64,64,64]).
    """

    name: str = "dccrn"
    # 'dccrn' = the reference's own DCCRN.py model; 'dccrnet' = the
    # asteroid-compat serving family (models/dccrnet.py, checkpoint-importable)
    family: str = "dccrn"
    stft: STFTConfig = field(default_factory=STFTConfig)
    kernel_num: Tuple[int, ...] = (32, 64, 128, 256, 256, 256)
    kernel_size: int = 5
    rnn_layers: int = 2
    rnn_units: int = 256
    masking_mode: str = "E"  # 'E' | 'C' | 'R'
    use_clstm: bool = True
    use_cbn: bool = False  # complex batchnorm instead of real BN
    bidirectional: bool = False
    compute_dtype: str = "float32"  # bfloat16 for the matmul-heavy path

    @property
    def hidden_freq(self) -> int:
        # freq bins remaining after the encoder stack; reference DCCRN.py:85
        return self.stft.fft_len // (2 ** (len(self.kernel_num) + 1))

    def scaled(self, div: int, name: Optional[str] = None) -> "DCCRNConfig":
        """Student variant with channels and rnn units divided by ``div``."""
        return dataclasses.replace(
            self,
            name=name or f"{self.name}-div{div}",
            kernel_num=tuple(k // div for k in self.kernel_num),
            rnn_units=self.rnn_units // div,
        )


TEACHER = DCCRNConfig(name="dccrn-cl")
STUDENT = DCCRNConfig(
    name="dccrn-cl-test",
    kernel_num=(8, 16, 32, 64, 64, 64),
    rnn_units=64,
)

# asteroid-compat serving family (reference distill.py:245-247: teacher is the
# HF DCCRNet, student is DCCRNet_mini 'DCCRN-CL-test'); sqrt-Hann frontend.
DCCRNET_TEACHER = DCCRNConfig(
    name="dccrnet-cl",
    family="dccrnet",
    stft=STFTConfig(window="sqrthann"),
)
DCCRNET_STUDENT = DCCRNConfig(
    name="dccrnet-cl-test",
    family="dccrnet",
    stft=STFTConfig(window="sqrthann"),
    kernel_num=(8, 16, 32, 64, 64, 64),
    rnn_units=64,
)


@dataclass(frozen=True)
class DataConfig:
    """Reference ``conf.yml:7-14`` + ``distill.py:206-229``."""

    dataset: str = "librimix"  # 'librimix' | 'dns' (asteroid DNSDataset
    # equivalent, reference distill.py imports both)
    task: str = "enh_single"
    sample_rate: int = 16000
    n_src: int = 1
    segment: Optional[float] = 3.0  # seconds; None = full utterances
    train_dir: str = "data/wav16k/min/train-360"
    valid_dir: str = "data/wav16k/min/dev"
    test_dir: str = "data/wav16k/max/test"
    batch_size: int = 32  # reference config.py:42
    shuffle_buffer: int = 2048
    synthetic: bool = False  # use the synthetic generator (no corpus on disk)
    synthetic_size: int = 2048
    # 'default' | 'hard' — hard adds multi-type noise (babble/hum/clicks),
    # wider SNR and 50% reverb: the tougher quality proxy (VERDICT r3 #1)
    synthetic_profile: str = "default"


@dataclass(frozen=True)
class DistillConfig:
    """Which distillation strategy and loss weights.

    strategy: 'clskd' | 'reviewkd' | 'spkd' | 'mse' | 'stft'
    (the five training scripts of the reference, SURVEY.md section 0).

    Numerics note: the scalar loss (and ``base_loss``/``dccrn_loss``) is
    always computed and returned in float32 even under bfloat16 compute —
    the log-magnitude loss tail is the numerically fragile part of the step
    and costs nothing next to the models.  bf16 benchmark configs therefore
    measure an op mix whose loss tail is f32 by design.
    """

    strategy: str = "clskd"
    # MRSTFT base loss: reference distill.py:59 uses single-resolution 512/100/400
    mrstft_fft_sizes: Tuple[int, ...] = (512,)
    mrstft_hop_sizes: Tuple[int, ...] = (100,)
    mrstft_win_lengths: Tuple[int, ...] = (400,)
    mrstft_factor_mag: float = 0.1
    mrstft_factor_sc: float = 0.1
    # ABF fusion: trainable by default (the reference re-initialized them every
    # step and never optimized them — distill.py:92, framework.py:266; set
    # abf_trainable=False + abf_reinit_each_step=True to reproduce that quirk).
    abf_trainable: bool = True
    abf_reinit_each_step: bool = False
    abf_mid_channels: int = 64
    distill_weight: float = 1.0
    # dtype for feature taps entering fusion/SPKD; bfloat16 halves the HBM
    # footprint of the (large) cross-layer activations and their gradients,
    # roughly doubling the trainable batch per chip.
    taps_dtype: str = "float32"
    # rematerialize ABF blocks in backward (recompute the teacher-sized fused
    # maps instead of storing them) — enables larger per-chip batches.
    abf_remat: bool = False
    # Pallas kernels for the ABF chain (opt-in): measured at parity with
    # XLA standalone but SLOWER in-context on v5e (290 vs 233 ms/step,
    # docs/PERF.md round 3) because the custom-call boundary blocks XLA's
    # surrounding fusions.  Kept for geometries/backends where the layout
    # trade goes the other way; both paths are golden-tested identical.
    abf_conv_pallas: bool = False
    # 3x3 conv as 9 shifted dot_generals (all-dot layout, no conv op) —
    # round-5 layout experiment, measured in bench.py --ninedot
    abf_conv_ninedot: bool = False
    abf_attfuse_pallas: bool = False
    # Whole-ABF-block fused kernel (ops/pallas/abf_block.py): fold-blend +
    # 3x3 conv in one custom call with a hand-derived block VJP — the
    # round-4 byte-reduction plan (docs/PERF.md).  Auto-gated on TPU
    # availability and block geometry; falls back to the XLA path otherwise.
    abf_block_pallas: bool = False
    # SPKD Gram scope: 1 = one global Gram over the full batch (reference
    # framework.py:161-172 semantics).  >1 = split the batch into this many
    # groups and average per-group Gram losses.  Set to the mesh data-axis
    # size for multi-chip training: the global Gram couples all utterances,
    # forcing GSPMD to all-gather every tapped activation (the dominant ICI
    # traffic of the DP CLSKD step — scripts/comm_model.py); per-shard Grams
    # keep the step collective-free except the ~5 MB grad psum, and at
    # per-chip batch 32 reproduce the single-GPU reference's batch-32 Gram
    # exactly.
    spkd_gram_groups: int = 1
    # Fold the ABF bn2 affine into per-channel SPKD Grams instead of
    # materializing the normalized fused map (losses/kd.spkd_loss_affine;
    # clskd only).  Byte cut, same math — measured in bench.py --bn2-fold.
    spkd_bn2_fold: bool = False


@dataclass(frozen=True)
class OptimConfig:
    optimizer: str = "adam"
    lr: float = 6e-4  # reference config.py:41
    weight_decay: float = 0.0
    grad_clip: Optional[float] = None
    lr_schedule: str = "constant"  # 'constant' | 'cosine'
    warmup_steps: int = 0


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh for pjit. data x model axes (SURVEY.md section 2.4)."""

    data: int = -1  # -1 = all remaining devices
    model: int = 1


@dataclass(frozen=True)
class TrainConfig:
    teacher: DCCRNConfig = field(default_factory=lambda: TEACHER)
    student: DCCRNConfig = field(default_factory=lambda: STUDENT)
    data: DataConfig = field(default_factory=DataConfig)
    distill: DistillConfig = field(default_factory=DistillConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    max_epochs: int = 20  # reference config.py:40
    seed: int = 0
    log_every: int = 50
    # >1: fit() prefetches this many batches and runs them as ONE device
    # dispatch (lax.scan over the optimizer step) — hides host dispatch
    # latency; set 8-32 on real TPU, 1 reproduces step-at-a-time behavior.
    scan_steps: int = 1
    eval_every_epochs: int = 1
    ckpt_dir: str = "checkpoints"
    keep_top_k: int = 3  # checkpoint on max STOI, reference distill.py:252-258
    monitor: str = "stoi"
    loss_mode: str = "SDR+PMSQE"  # for standalone DCCRN training, config.py:37


# ---------------------------------------------------------------------------
# YAML + CLI override machinery
# ---------------------------------------------------------------------------


def _from_dict(cls, d: Dict[str, Any]):
    if not dataclasses.is_dataclass(cls):
        return d
    kwargs = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    for key, val in d.items():
        if key not in fields:
            raise KeyError(f"unknown config key {key!r} for {cls.__name__}")
        f = fields[key]
        sub = f.type if dataclasses.is_dataclass(f.type) else None
        if sub is None and f.default_factory is not dataclasses.MISSING:  # type: ignore
            probe = f.default_factory()  # type: ignore
            sub = type(probe) if dataclasses.is_dataclass(probe) else None
        if sub is not None and isinstance(val, dict):
            kwargs[key] = _from_dict(sub, val)
        elif isinstance(val, list):
            kwargs[key] = tuple(val)
        else:
            kwargs[key] = val
    return cls(**kwargs)


def _set_dotted(d: Dict[str, Any], dotted: str, value: Any) -> None:
    parts = dotted.split(".")
    for p in parts[:-1]:
        d = d.setdefault(p, {})
    d[parts[-1]] = value


def _parse_value(s: str) -> Any:
    try:
        v = yaml.safe_load(s)
    except yaml.YAMLError:
        return s
    # YAML 1.1 parses '1e-3' as a string (needs '1.0e-3'); recover numerics
    if isinstance(v, str):
        try:
            return int(v)
        except ValueError:
            try:
                return float(v)
            except ValueError:
                return v
    return v


def load_config(
    yaml_path: Optional[str] = None,
    overrides: Sequence[str] = (),
    base: Optional[TrainConfig] = None,
) -> TrainConfig:
    """Build a TrainConfig from defaults, then YAML, then ``key=value`` overrides.

    Overrides use dotted paths, e.g. ``optim.lr=1e-3 distill.strategy=spkd``.
    """
    d: Dict[str, Any] = dataclasses.asdict(base or TrainConfig())
    if yaml_path:
        with open(yaml_path) as f:
            loaded = yaml.safe_load(f) or {}
        _deep_update(d, loaded)
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} must look like key.path=value")
        key, val = ov.split("=", 1)
        _set_dotted(d, key, _parse_value(val))
    return _from_dict(TrainConfig, d)


def _deep_update(dst: Dict[str, Any], src: Dict[str, Any]) -> None:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_update(dst[k], v)
        else:
            dst[k] = v


def to_yaml(cfg) -> str:
    return yaml.safe_dump(dataclasses.asdict(cfg), sort_keys=False)

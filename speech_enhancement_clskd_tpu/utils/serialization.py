"""Checkpointing + publishable inference bundles.

Two artifact roles, mirroring the reference (SURVEY.md section 5):

1. **Training checkpoints** — full TrainState via orbax, with top-k retention
   on a monitored metric (reference ModelCheckpoint(save_top_k=3,
   monitor='stoi', mode='max'), distill.py:252-258) and resume.
2. **Publishable bundle** — a self-contained inference artifact with the
   asteroid-compatible schema fields (verified from the shipped
   ``checkpoint/the_best_model.pth``): ``model_name``, ``state_dict``,
   ``model_args { architecture, stft_n_filters, stft_kernel_size, stft_stride,
   sample_rate, n_freqs }``, ``infos { software_versions }`` — stored as a
   single ``.npz`` (flattened param paths + one JSON metadata entry), no
   pickle.  ``student_from_state`` is the equivalent of the reference's
   post-fit 'strip the student. prefix and serialize()' step
   (distill.py:280-294).
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..config import DCCRNConfig, STFTConfig

_SEP = "|"


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        key = prefix + _SEP.join(_path_str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    return str(p)


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split(_SEP)
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = val
    return tree


def save_bundle(
    path: str,
    params: Any,
    batch_stats: Any,
    cfg: DCCRNConfig,
    infos: Optional[Dict[str, Any]] = None,
) -> None:
    """Write a publishable inference bundle (.npz)."""
    arrays: Dict[str, np.ndarray] = {}
    arrays.update(_flatten(params, "params" + _SEP))
    if batch_stats:
        arrays.update(_flatten(batch_stats, "batch_stats" + _SEP))
    import jax as _jax

    meta = {
        "model_name": "DCCRNet" if getattr(cfg, "family", "dccrn") == "dccrnet"
        else "DCCRN",
        "model_args": {
            "architecture": cfg.name,
            "stft_n_filters": cfg.stft.fft_len,
            "stft_kernel_size": cfg.stft.win_len,
            "stft_stride": cfg.stft.hop,
            "sample_rate": cfg.stft.sample_rate,
            "n_freqs": cfg.stft.fft_len // 2 + 1,
        },
        "config": dataclasses.asdict(cfg),
        "infos": {
            "software_versions": {
                "jax_version": _jax.__version__,
                "framework": "speech_enhancement_clskd_tpu",
            },
            **(infos or {}),
        },
    }
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)


def load_bundle(path: str) -> Tuple[DCCRNConfig, Dict[str, Any], Dict[str, Any]]:
    """Returns (model config, variables {params, batch_stats}, meta)."""
    if not path.endswith(".npz") and os.path.exists(path + ".npz"):
        path = path + ".npz"
    z = np.load(path)
    meta = json.loads(bytes(z["__meta__"]).decode())
    params_flat = {}
    stats_flat = {}
    for key in z.files:
        if key.startswith("params" + _SEP):
            params_flat[key[len("params" + _SEP):]] = z[key]
        elif key.startswith("batch_stats" + _SEP):
            stats_flat[key[len("batch_stats" + _SEP):]] = z[key]
    variables = {"params": _unflatten(params_flat)}
    if stats_flat:
        variables["batch_stats"] = _unflatten(stats_flat)
    c = meta["config"]
    cfg = DCCRNConfig(
        name=c["name"],
        family=c.get("family", "dccrn"),
        stft=STFTConfig(**c["stft"]),
        kernel_num=tuple(c["kernel_num"]),
        kernel_size=c["kernel_size"],
        rnn_layers=c["rnn_layers"],
        rnn_units=c["rnn_units"],
        masking_mode=c["masking_mode"],
        use_clstm=c["use_clstm"],
        use_cbn=c["use_cbn"],
        bidirectional=c["bidirectional"],
        compute_dtype=c["compute_dtype"],
    )
    return cfg, variables, meta


def student_from_state(state, cfg: DCCRNConfig):
    """Extract the student's inference variables from a TrainState
    (the reference's 'strip student. prefix' step, distill.py:280-290)."""
    return {
        "params": jax.device_get(state.student_params),
        "batch_stats": jax.device_get(state.student_stats),
    }


class CheckpointManager:
    """Orbax-backed TrainState checkpointing with top-k metric retention."""

    def __init__(
        self,
        directory: str,
        monitor: str = "stoi",
        mode: str = "max",
        keep_top_k: int = 3,
    ):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.keep_top_k = keep_top_k
        self._ckptr = ocp.StandardCheckpointer()
        self._scores: Dict[int, float] = {}
        self._load_index()

    def _index_path(self) -> str:
        return os.path.join(self.directory, "index.json")

    def _load_index(self) -> None:
        if os.path.exists(self._index_path()):
            with open(self._index_path()) as f:
                data = json.load(f)
            self._scores = {int(k): v for k, v in data.get("scores", {}).items()}

    def _save_index(self) -> None:
        with open(self._index_path(), "w") as f:
            json.dump({"scores": self._scores, "monitor": self.monitor}, f)

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:08d}")

    def save(self, state, metrics: Dict[str, float]) -> bool:
        """Save if the metric makes top-k; prune the worst.  Returns kept.

        ``state`` is any pytree with a ``step`` leaf (TrainState attribute or
        dict key)."""
        step = int(state["step"] if isinstance(state, dict) else state.step)
        score = float(metrics.get(self.monitor, float("-inf")))
        key = score if self.mode == "max" else -score
        if len(self._scores) >= self.keep_top_k:
            worst = min(self._scores, key=self._scores.get)
            if key <= self._scores[worst]:
                return False
            shutil.rmtree(self._step_dir(worst), ignore_errors=True)
            del self._scores[worst]
        self._ckptr.save(
            self._step_dir(step), jax.device_get(state), force=True
        )
        self._ckptr.wait_until_finished()
        self._scores[step] = key
        self._save_index()
        return True

    def best_step(self) -> Optional[int]:
        if not self._scores:
            return None
        return max(self._scores, key=self._scores.get)

    def best_score(self) -> Optional[float]:
        b = self.best_step()
        return None if b is None else float(self._scores[b])

    def restore(self, abstract_state, step: Optional[int] = None):
        step = step if step is not None else self.best_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return self._ckptr.restore(self._step_dir(step), abstract_state)

"""Standalone DCCRN training (the reference's teacher-training workflow:
DCCRN.py + config.py loss zoo, loss_mode 'SDR+PMSQE' by default).

Small, mesh-sharded supervised trainer: model(mix) vs clean with any of the
10 combined loss modes (losses/modes.py).  Used to produce a teacher when no
pretrained weights are available (SURVEY.md section 7 'teacher acquisition').
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import DCCRNConfig, TrainConfig
from ..losses.modes import dccrn_loss
from ..losses.signal import si_sdr
from ..metrics.stoi import stoi_batch
from ..models.dccrn import make_model
from ..ops import stft as stft_ops
from ..parallel.mesh import batch_sharding, make_mesh, param_shardings, replicated
from ..data import SyntheticEnhancementDataset, LibriMixDataset, make_loader


class PretrainTrainer:
    """Supervised enhancement training of a single DCCRN."""

    def __init__(self, cfg: TrainConfig, model_cfg: Optional[DCCRNConfig] = None,
                 mesh=None):
        self.cfg = cfg
        self.model_cfg = model_cfg or cfg.teacher
        self.model = make_model(self.model_cfg)
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        self.tx = optax.adam(cfg.optim.lr)
        self.loss_mode = cfg.loss_mode
        self._step_fn = None
        self._k = stft_ops.make_kernels(
            self.model_cfg.stft.win_len,
            self.model_cfg.stft.hop,
            self.model_cfg.stft.fft_len,
            self.model_cfg.stft.window,
        )

    def init_state(self, rng: Optional[jax.Array] = None):
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        seg = self.cfg.data.segment or 3.0
        wav = jnp.zeros((2, int(seg * self.cfg.data.sample_rate)), jnp.float32)
        v = self.model.init(rng, wav, training=True)
        state = {
            "step": jnp.zeros((), jnp.int32),
            "params": v["params"],
            "batch_stats": v.get("batch_stats", {}),
            "opt_state": self.tx.init(v["params"]),
        }
        sh = jax.tree.map(lambda _: replicated(self.mesh), state)
        sh["params"] = param_shardings(state["params"], self.mesh)
        return jax.device_put(state, sh)

    def _build_step(self):
        model, tx = self.model, self.tx
        loss_mode, k = self.loss_mode, self._k
        sr = self.cfg.data.sample_rate

        def step(state, mix, clean):
            def loss_fn(params):
                out, mut = model.apply(
                    {"params": params, "batch_stats": state["batch_stats"]},
                    mix, training=True, mutable=["batch_stats"],
                )
                loss = dccrn_loss(
                    out.wav, clean, out.est_real, out.est_imag,
                    loss_mode=loss_mode, stft_kernels=k, sample_rate=sr,
                )
                return loss, mut["batch_stats"]

            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state["params"]
            )
            updates, opt2 = tx.update(grads, state["opt_state"], state["params"])
            return {
                "step": state["step"] + 1,
                "params": optax.apply_updates(state["params"], updates),
                "batch_stats": stats,
                "opt_state": opt2,
            }, {"train_loss": loss, "grad_norm": optax.global_norm(grads)}

        return jax.jit(step, donate_argnums=(0,))

    def train_step(self, state, mix, clean):
        if self._step_fn is None:
            self._step_fn = self._build_step()
        with self.mesh:
            return self._step_fn(state, mix, clean)

    def make_datasets(self):
        """(train, val) datasets from cfg.data — honors synthetic_profile
        (round-5 regression: the profile used to be silently dropped here)."""
        cfg = self.cfg
        d = cfg.data
        if d.synthetic:
            train_ds = SyntheticEnhancementDataset(
                size=d.synthetic_size, segment=d.segment or 3.0,
                sample_rate=d.sample_rate, seed=cfg.seed,
                profile=d.synthetic_profile)
            val_ds = SyntheticEnhancementDataset(
                size=max(8, d.synthetic_size // 16), segment=d.segment or 3.0,
                sample_rate=d.sample_rate, seed=cfg.seed + 10_000,
                profile=d.synthetic_profile)
        else:
            train_ds = LibriMixDataset(d.train_dir, d.task, d.sample_rate,
                                       d.n_src, d.segment)
            val_ds = LibriMixDataset(d.valid_dir, d.task, d.sample_rate,
                                     d.n_src, d.segment)
        return train_ds, val_ds

    def fit(self, state=None, epochs: Optional[int] = None, log_fn=print,
            checkpoint_manager=None) -> Tuple[dict, Dict[str, float]]:
        cfg = self.cfg
        if state is None:
            state = self.init_state()
        d = cfg.data
        train_ds, val_ds = self.make_datasets()
        loader = make_loader(train_ds, d.batch_size, shuffle=True, seed=cfg.seed)
        bs = batch_sharding(self.mesh)
        history: Dict[str, float] = {}
        for epoch in range(epochs or cfg.max_epochs):
            t0, n = time.time(), 0
            for mix, src in loader:
                state, logs = self.train_step(
                    state,
                    jax.device_put(jnp.asarray(mix), bs),
                    jax.device_put(jnp.asarray(src[:, 0]), bs),
                )
                n += 1
                if n % cfg.log_every == 0:
                    log_fn(f"epoch {epoch} step {n}: "
                           + " ".join(f"{k}={float(v):.4f}"
                                      for k, v in logs.items()))
            metrics = self.validate(state, val_ds)
            metrics["epoch_time_s"] = time.time() - t0
            log_fn(f"epoch {epoch} done: "
                   + " ".join(f"{k}={v:.4f}" for k, v in metrics.items()))
            if checkpoint_manager is not None:
                checkpoint_manager.save(state, metrics)
            history = metrics
        return state, history

    def validate(self, state, val_ds) -> Dict[str, float]:
        model, sr = self.model, self.cfg.data.sample_rate

        @jax.jit
        def eval_fn(params, stats, mix, clean):
            out = model.apply({"params": params, "batch_stats": stats},
                              mix, training=False)
            return {
                "si_sdr": si_sdr(clean, out.wav),
                "stoi": jnp.mean(stoi_batch(clean, out.wav, fs=sr)),
            }

        loader = make_loader(val_ds, min(self.cfg.data.batch_size, len(val_ds)),
                             shuffle=False)
        agg: Dict[str, list] = {}
        for mix, src in loader:
            m = eval_fn(state["params"], state["batch_stats"],
                        jnp.asarray(mix), jnp.asarray(src[:, 0]))
            for k, v in m.items():
                agg.setdefault(k, []).append(float(v))
        return {k: float(np.mean(v)) for k, v in agg.items()}



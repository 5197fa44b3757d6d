"""The distillation trainer: one jitted, mesh-sharded train step + fit loop.

Replaces the reference's five pytorch-lightning modules (distill*.py
``KnowledgeDistillation``) with a single strategy-parameterized trainer:

- teacher frozen (reference distill.py:49-50) — its params live in the state
  but get ``stop_gradient`` + no optimizer slot;
- Adam on the student (distill.py:202-204) AND on the ABF fusion params (the
  reference's fusion convs were rebuilt every step and never trained; set
  ``distill.abf_reinit_each_step=True`` to reproduce that);
- the whole step (teacher fwd + student fwd + fusion + losses + update) is one
  ``jax.jit`` with donated state, sharded over the ('data','model') mesh:
  batch split over 'data', large weights over 'model', XLA inserts the
  collectives.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh

from ..config import TrainConfig
from ..data import (
    DNSDataset,
    LibriMixDataset,
    SyntheticEnhancementDataset,
    make_loader,
)
from ..distill.abf import ReviewKD
from ..distill.strategies import distill_loss, needs_fusion
from ..losses.pit import pit_reorder
from ..losses.signal import si_sdr
from ..metrics.stoi import stoi_batch
from ..models.dccrn import DCCRN, make_model
from ..parallel.distributed import put_global_batch
from ..parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    stacked_batch_sharding,
)


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    student_params: Any
    student_stats: Any
    teacher_params: Any = struct.field(pytree_node=True, default=None)
    teacher_stats: Any = struct.field(pytree_node=True, default=None)
    abf_enc_params: Any = struct.field(pytree_node=True, default=None)
    abf_enc_stats: Any = struct.field(pytree_node=True, default=None)
    abf_dec_params: Any = struct.field(pytree_node=True, default=None)
    abf_dec_stats: Any = struct.field(pytree_node=True, default=None)
    opt_state: Any = struct.field(pytree_node=True, default=None)
    rng: Any = struct.field(pytree_node=True, default=None)


def _teacher_tap_channels(cfg) -> Tuple[tuple, tuple]:
    ch = (2,) + tuple(cfg.kernel_num)
    enc = tuple(cfg.kernel_num)
    dec = tuple(ch[j] for j in range(len(cfg.kernel_num) - 1, -1, -1))
    return enc, dec


class Trainer:
    def __init__(self, cfg: TrainConfig, mesh: Optional[Mesh] = None):
        from ..utils.jax_setup import enable_compilation_cache

        enable_compilation_cache()
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        self.student: DCCRN = make_model(cfg.student)
        self.teacher: DCCRN = make_model(cfg.teacher)
        self.strategy = cfg.distill.strategy
        self.use_fusion = needs_fusion(self.strategy)
        if self.use_fusion:
            enc_ch, dec_ch = _teacher_tap_channels(cfg.teacher)
            mid = cfg.distill.abf_mid_channels
            rm = cfg.distill.abf_remat
            kp = dict(conv_pallas=cfg.distill.abf_conv_pallas,
                      conv_ninedot=cfg.distill.abf_conv_ninedot,
                      attfuse_pallas=cfg.distill.abf_attfuse_pallas,
                      block_pallas=cfg.distill.abf_block_pallas,
                      bn2_affine_out=(cfg.distill.spkd_bn2_fold
                                      and self.strategy == "clskd"))
            self.abf_enc = ReviewKD(out_channels=enc_ch, mid_channels=mid,
                                    reverse=True, remat=rm, **kp)
            self.abf_dec = ReviewKD(out_channels=dec_ch, mid_channels=mid,
                                    reverse=False, remat=rm, **kp)
        else:
            self.abf_enc = self.abf_dec = None
        self.tx = self._make_optimizer()
        self._train_step = None
        self._train_scan = None
        self._raw_train_step = None
        self._eval_step = None

    # ------------------------------------------------------------------ setup

    def _make_optimizer(self) -> optax.GradientTransformation:
        o = self.cfg.optim
        if o.lr_schedule == "cosine":
            sched = optax.warmup_cosine_decay_schedule(
                0.0, o.lr, o.warmup_steps, max(1, self.total_steps()), o.lr * 0.01
            )
        else:
            sched = o.lr
        if o.optimizer == "adamw" or o.weight_decay:
            tx = optax.adamw(sched, weight_decay=o.weight_decay)
        else:
            tx = optax.adam(sched)
        if o.grad_clip:
            tx = optax.chain(optax.clip_by_global_norm(o.grad_clip), tx)
        return tx

    def total_steps(self) -> int:
        """Optimizer steps over the whole run, from the ACTUAL dataset length
        (drop-last semantics, matching the reference DataLoader
        dataloader.py:19) — feeds the cosine schedule."""
        if getattr(self, "_total_steps", None) is not None:
            return self._total_steps
        d = self.cfg.data
        if d.synthetic:
            n = d.synthetic_size
        else:
            try:
                train_ds, _ = self.make_datasets()
                n = len(train_ds)
            except Exception:
                n = 20000  # manifest unavailable (e.g. schedule preview)
        self._total_steps = max(1, n // d.batch_size) * self.cfg.max_epochs
        return self._total_steps

    def init_state(self, rng: Optional[jax.Array] = None,
                   teacher_variables: Optional[dict] = None) -> TrainState:
        """Build a sharded TrainState.  ``teacher_variables`` loads a
        pretrained teacher (reference pulls the HF teacher, distill.py:245)."""
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        r_s, r_t, r_e, r_d, r_state = jax.random.split(rng, 5)
        seg = self.cfg.data.segment or 3.0
        samples = int(seg * self.cfg.data.sample_rate)
        wav = jnp.zeros((2, samples), jnp.float32)

        sv = self.student.init(r_s, wav, training=True)
        if teacher_variables is None:
            tv = self.teacher.init(r_t, wav, training=True)
        else:
            tv = teacher_variables

        abf = {}
        if self.use_fusion:
            taps = jax.eval_shape(
                lambda v, w: self.student.apply(v, w, training=False).taps, sv, wav
            )
            enc_z = [jnp.zeros(t.shape, t.dtype) for t in taps.encoder]
            dec_z = [jnp.zeros(t.shape, t.dtype) for t in taps.decoder]
            ev = self.abf_enc.init(r_e, enc_z, training=True)
            dv = self.abf_dec.init(r_d, dec_z, training=True)
            abf = dict(
                abf_enc_params=ev["params"],
                abf_enc_stats=ev.get("batch_stats", {}),
                abf_dec_params=dv["params"],
                abf_dec_stats=dv.get("batch_stats", {}),
            )

        trainable = self._trainable_of(
            sv["params"], abf.get("abf_enc_params"), abf.get("abf_dec_params")
        )
        opt_state = self.tx.init(trainable)

        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            student_params=sv["params"],
            student_stats=sv.get("batch_stats", {}),
            teacher_params=tv["params"],
            teacher_stats=tv.get("batch_stats", {}),
            opt_state=opt_state,
            rng=r_state,
            **abf,
        )
        # shard: large params over 'model', everything else replicated
        shardings = jax.tree.map(
            lambda _: replicated(self.mesh), state,
            is_leaf=lambda x: x is None,
        )
        shardings = dataclasses.replace(
            shardings,
            student_params=param_shardings(state.student_params, self.mesh),
            teacher_params=param_shardings(state.teacher_params, self.mesh),
        )
        return jax.device_put(state, shardings)

    def _trainable_of(self, student_params, abf_enc, abf_dec):
        t = {"student": student_params}
        if self.use_fusion and not self.cfg.distill.abf_reinit_each_step:
            t["abf_enc"] = abf_enc
            t["abf_dec"] = abf_dec
        return t

    # ------------------------------------------------------------- train step

    def _build_train_step(self):
        student, teacher = self.student, self.teacher
        abf_enc, abf_dec = self.abf_enc, self.abf_dec
        strategy, dcfg = self.strategy, self.cfg.distill
        use_fusion = self.use_fusion
        reinit = dcfg.abf_reinit_each_step
        tx = self.tx

        def loss_fn(trainable, state: TrainState, mix, clean, step_rng):
            s_out, s_mut = student.apply(
                {"params": trainable["student"],
                 "batch_stats": state.student_stats},
                mix, training=True, mutable=["batch_stats"],
            )
            t_out = teacher.apply(
                {"params": state.teacher_params,
                 "batch_stats": state.teacher_stats},
                mix, training=True, mutable=["batch_stats"],
            )[0]
            t_out = jax.lax.stop_gradient(t_out)

            tdt = jnp.dtype(dcfg.taps_dtype)
            if tdt != jnp.float32:
                # cast the big cross-layer activations (and hence their grads)
                # to save HBM; losses accumulate in f32 internally
                s_out = s_out._replace(
                    taps=jax.tree.map(lambda x: x.astype(tdt), s_out.taps)
                )
                t_out = t_out._replace(
                    taps=jax.tree.map(lambda x: x.astype(tdt), t_out.taps)
                )

            fe = fd = None
            mut: Dict[str, Any] = {"student_stats": s_mut["batch_stats"]}
            if use_fusion:
                if reinit:
                    # reference quirk: fresh random ABF every step, untrained
                    # (distill.py:92, framework.py:266-284)
                    re_, rd_ = jax.random.split(step_rng)
                    ev = abf_enc.init(re_, list(s_out.taps.encoder), training=True)
                    dv = abf_dec.init(rd_, list(s_out.taps.decoder), training=True)
                    ep, es = ev["params"], ev.get("batch_stats", {})
                    dp, ds = dv["params"], dv.get("batch_stats", {})
                else:
                    ep, es = trainable["abf_enc"], state.abf_enc_stats
                    dp, ds = trainable["abf_dec"], state.abf_dec_stats
                fe, e_mut = abf_enc.apply(
                    {"params": ep, "batch_stats": es},
                    list(s_out.taps.encoder), training=True,
                    mutable=["batch_stats"],
                )
                fd, d_mut = abf_dec.apply(
                    {"params": dp, "batch_stats": ds},
                    list(s_out.taps.decoder), training=True,
                    mutable=["batch_stats"],
                )
                if not reinit:
                    mut["abf_enc_stats"] = e_mut["batch_stats"]
                    mut["abf_dec_stats"] = d_mut["batch_stats"]

            loss, logs = distill_loss(strategy, s_out, t_out, clean, dcfg, fe, fd)
            return loss, (logs, mut)

        def train_step(state: TrainState, mix, clean):
            step_rng = jax.random.fold_in(state.rng, state.step)
            trainable = self._trainable_of(
                state.student_params, state.abf_enc_params, state.abf_dec_params
            )
            (loss, (logs, mut)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(trainable, state, mix, clean, step_rng)
            updates, new_opt = tx.update(grads, state.opt_state, trainable)
            new_trainable = optax.apply_updates(trainable, updates)
            upd = dict(
                step=state.step + 1,
                student_params=new_trainable["student"],
                student_stats=mut["student_stats"],
                opt_state=new_opt,
            )
            if use_fusion and not reinit:
                upd.update(
                    abf_enc_params=new_trainable["abf_enc"],
                    abf_enc_stats=mut["abf_enc_stats"],
                    abf_dec_params=new_trainable["abf_dec"],
                    abf_dec_stats=mut["abf_dec_stats"],
                )
            logs["grad_norm"] = optax.global_norm(grads)
            # per-subtree grad norms: a few extra scalar reduces, and the
            # decisive diagnostic when a dtype experiment NaNs — the NaN's
            # backward birthplace is read off from which subtrees carry it
            # (e.g. finite dec_* but NaN enc/lstm => born in the CLSTM bwd)
            sp = grads["student"]
            for key, pred in (
                ("gn_enc", lambda n: n.startswith("enc")),
                ("gn_lstm", lambda n: n.startswith(("clstm", "rnn", "lstm"))),
                ("gn_dec", lambda n: n.startswith("dec")),
            ):
                sub = [v for n, v in sp.items() if pred(n)]
                if sub:
                    logs[key] = optax.global_norm(sub)
            if "abf_enc" in grads:
                logs["gn_abf"] = optax.global_norm(
                    (grads["abf_enc"], grads["abf_dec"])
                )
            return state.replace(**upd), logs

        self._raw_train_step = train_step
        return jax.jit(train_step, donate_argnums=(0,))

    def train_step(self, state: TrainState, mix, clean):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        with self.mesh:
            return self._train_step(state, mix, clean)

    def _build_train_scan(self):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        raw = self._raw_train_step

        def train_scan(state: TrainState, mix_stack, clean_stack):
            # One device dispatch for K optimizer steps: lax.scan over a
            # [K, B, T] stack of prefetched batches.  Removes the per-step
            # host->device dispatch latency that dominates single-step time
            # on tunneled/remote TPUs; on a pod it also lets XLA overlap the
            # tail of step k with the head of step k+1.
            #
            # The frozen teacher is deliberately NOT part of the scan carry:
            # invariant carry elements still get threaded (and copied) through
            # the while-loop state every iteration — the round-3 trace charged
            # 9.6 GB/step to scan state threading (docs/PERF.md by-source-line
            # table).  Closing over them keeps the teacher weights as loop
            # constants outside the carry.
            teacher_params = state.teacher_params
            teacher_stats = state.teacher_stats
            carry0 = state.replace(teacher_params=None, teacher_stats=None)

            def body(st, batch):
                st = st.replace(
                    teacher_params=teacher_params, teacher_stats=teacher_stats
                )
                st, logs = raw(st, batch[0], batch[1])
                return st.replace(teacher_params=None, teacher_stats=None), logs

            carry, logs = jax.lax.scan(body, carry0, (mix_stack, clean_stack))
            state = carry.replace(
                teacher_params=teacher_params, teacher_stats=teacher_stats
            )
            return state, logs  # logs: each leaf stacked [K]

        return jax.jit(train_scan, donate_argnums=(0,))

    def train_steps(self, state: TrainState, mix_stack, clean_stack):
        """Run K optimizer steps in ONE dispatch.

        ``mix_stack``/``clean_stack``: [K, B, T] stacks of K prefetched
        batches.  Returns (state, logs) with every log leaf stacked [K].
        """
        if self._train_scan is None:
            self._train_scan = self._build_train_scan()
        with self.mesh:
            return self._train_scan(state, mix_stack, clean_stack)

    # ------------------------------------------------------------- evaluation

    def _build_eval_step(self):
        student = self.student
        sr = self.cfg.data.sample_rate

        def eval_step(state: TrainState, mix, sources):
            """``sources``: [B, n_src, T].  Estimates are PIT-reordered
            against the sources before metrics, as the reference's
            validation_step does (distill.py:164-174) — jax.jit retraces per
            (batch, n_src) shape, so the n_src branches below are static."""
            out = student.apply(
                {"params": state.student_params,
                 "batch_stats": state.student_stats},
                mix, training=False,
            )
            est = out.wav
            est_s = est if est.ndim == 3 else est[:, None, :]  # [B, n_est, T]
            n_src = sources.shape[1]
            if n_src > 1 and est_s.shape[1] == n_src:
                est_s, _ = pit_reorder(est_s, sources)
            elif n_src > 1:
                # single-output model on a multi-source task: score vs s0
                # (matches the offline eval fallback, eval/evaluate.py)
                sources = sources[:, :1]
                n_src = 1
            # metrics over every matched (estimate, source) pair, batched
            # on device (the reference round-tripped every utterance to
            # host numpy, SURVEY.md section 3.1)
            T = sources.shape[-1]
            est_f = est_s[:, :n_src].reshape(-1, T)
            src_f = sources.reshape(-1, T)
            mix_f = jnp.repeat(mix, n_src, axis=0) if n_src > 1 else mix
            m = {
                "si_sdr": si_sdr(src_f, est_f),
                "input_si_sdr": si_sdr(src_f, mix_f),
                "stoi": jnp.mean(stoi_batch(src_f, est_f, fs=sr)),
                "input_stoi": jnp.mean(stoi_batch(src_f, mix_f, fs=sr)),
            }
            m["si_sdr_imp"] = m["si_sdr"] - m["input_si_sdr"]
            m["stoi_imp"] = m["stoi"] - m["input_stoi"]
            return m, est

        return jax.jit(eval_step)

    def eval_step(self, state: TrainState, mix, sources):
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        with self.mesh:
            return self._eval_step(state, mix, sources)

    # -------------------------------------------------------------- fit loop

    def make_datasets(self):
        d = self.cfg.data
        if d.synthetic:
            train = SyntheticEnhancementDataset(
                size=d.synthetic_size, segment=d.segment or 3.0,
                sample_rate=d.sample_rate, seed=self.cfg.seed,
                profile=d.synthetic_profile,
            )
            val = SyntheticEnhancementDataset(
                size=max(8, d.synthetic_size // 16), segment=d.segment or 3.0,
                sample_rate=d.sample_rate, seed=self.cfg.seed + 10_000,
                profile=d.synthetic_profile,
            )
        elif d.dataset == "dns":
            train = DNSDataset(d.train_dir, d.sample_rate, d.segment,
                               seed=self.cfg.seed)
            val = DNSDataset(d.valid_dir, d.sample_rate, d.segment,
                             seed=self.cfg.seed)
        else:
            train = LibriMixDataset(d.train_dir, d.task, d.sample_rate,
                                    d.n_src, d.segment)
            val = LibriMixDataset(d.valid_dir, d.task, d.sample_rate,
                                  d.n_src, d.segment)
        return train, val

    def fit(
        self,
        state: Optional[TrainState] = None,
        epochs: Optional[int] = None,
        log_fn=print,
        teacher_variables: Optional[dict] = None,
        checkpoint_manager=None,
        metric_writer=None,
    ) -> Tuple[TrainState, Dict[str, float]]:
        cfg = self.cfg
        resumed = state is not None
        if state is None:
            state = self.init_state(teacher_variables=teacher_variables)
        train_ds, val_ds = self.make_datasets()
        loader = make_loader(train_ds, cfg.data.batch_size, shuffle=True,
                             seed=cfg.seed)
        total_epochs = epochs or cfg.max_epochs
        start_epoch = 0
        if resumed:
            # resume-aware epoch accounting (the reference's Lightning
            # trainer restores the epoch counter from the ckpt): derive the
            # completed-epoch count from the optimizer step so
            # ``--resume max_epochs=N`` finishes the run instead of
            # training N extra epochs.
            steps_per_epoch = max(
                1, len(train_ds) // max(1, cfg.data.batch_size))
            start_epoch = min(
                int(jax.device_get(state.step)) // steps_per_epoch,
                total_epochs,
            )
        bs = batch_sharding(self.mesh)
        sbs = stacked_batch_sharding(self.mesh)
        K = max(1, cfg.scan_steps)
        history: Dict[str, float] = {}
        # scan-tail batches (< K at epoch end) carry into the next epoch's
        # buffer instead of compiling a second (single-step) program; the
        # final partial window at fit() end is dropped — the reference
        # DataLoader uses drop_last=True (dataloader.py:19) so this matches
        # its semantics while keeping exactly ONE compiled program in scan
        # mode.
        pending: list = []
        for epoch in range(start_epoch, total_epochs):
            t0 = time.time()
            n = 0

            def flush(state, pending, n):
                if K == 1:
                    for mix_b, clean_b in pending:
                        state, logs = self.train_step(
                            state,
                            put_global_batch(mix_b, bs),
                            put_global_batch(clean_b, bs),
                        )
                        n += 1
                    return state, logs, n
                mix_stack = put_global_batch(
                    np.stack([m for m, _ in pending]), sbs, batch_axis=1)
                clean_stack = put_global_batch(
                    np.stack([c for _, c in pending]), sbs, batch_axis=1)
                state, logs = self.train_steps(state, mix_stack, clean_stack)
                n += len(pending)
                logs = {k: v[-1] for k, v in logs.items()}
                return state, logs, n

            for mix, src in loader:
                pending.append((np.asarray(mix), np.asarray(src[:, 0])))
                if len(pending) < K:
                    continue
                n_before = n
                state, logs, n = flush(state, pending, n)
                pending = []
                if n_before // cfg.log_every != n // cfg.log_every:
                    vals = {k: float(v) for k, v in logs.items()}
                    log_fn(f"epoch {epoch} step {n}: "
                           + " ".join(f"{k}={v:.4f}" for k, v in vals.items()))
                    if metric_writer is not None:
                        metric_writer.write(int(state.step), vals,
                                            scope="train")
            dt = time.time() - t0
            metrics = self.validate(state, val_ds)
            metrics["epoch_time_s"] = dt
            seg = cfg.data.segment or 3.0
            metrics["audio_s_per_s"] = n * cfg.data.batch_size * seg / dt
            log_fn(f"epoch {epoch} done: "
                   + " ".join(f"{k}={v:.4f}" for k, v in metrics.items()))
            if metric_writer is not None:
                metric_writer.write(int(state.step), metrics, scope="val")
            if checkpoint_manager is not None:
                # top-k retention on the monitored metric (reference
                # ModelCheckpoint(monitor='stoi'), distill.py:252-258)
                checkpoint_manager.save(state, metrics)
            history = metrics
        return state, history

    def validate(self, state: TrainState, val_ds) -> Dict[str, float]:
        loader = make_loader(val_ds, min(self.cfg.data.batch_size, len(val_ds)),
                             shuffle=False)
        bs = batch_sharding(self.mesh)
        # keep per-batch metrics ON DEVICE and read back once at the end —
        # a float(v) per batch per metric would insert a host sync into
        # every val step (the same pattern the reference's eval loop pays
        # for, SURVEY.md section 3.1)
        agg: Dict[str, list] = {}
        for mix, src in loader:
            m, _ = self.eval_step(
                state,
                put_global_batch(mix, bs),
                put_global_batch(src, bs),
            )
            for k, v in m.items():
                agg.setdefault(k, []).append(v)
        agg_host = jax.device_get(agg)  # ONE device->host transfer
        return {k: float(np.mean(v)) for k, v in agg_host.items()}

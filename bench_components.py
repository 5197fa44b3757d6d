"""Component-level timing of the CLSKD step on real TPU (perf diagnosis).

Times each stage of the train step separately with an honest host-readback
fence, plus XLA flop counts, so the roofline is visible:

  teacher_fwd | student_fwd | student_fwd_bwd_base | full CLSKD step

Usage:  python bench_components.py [--dtype bfloat16] [--batch 32]
Prints one JSON object (pretty) — not the driver bench (see bench.py).
"""

import argparse
import dataclasses
import json
import time


def _fence(x) -> float:
    import numpy as np

    arr = np.asarray(x)
    return float(arr.reshape(-1)[0])


def _time(fn, *args, rounds=8):
    import numpy as np

    out = fn(*args)  # warmup/compile
    _fence(jax_tree_first(out))
    t0 = time.perf_counter()
    for _ in range(rounds):
        out = fn(*args)
    _fence(jax_tree_first(out))
    return (time.perf_counter() - t0) / rounds


def jax_tree_first(tree):
    import jax

    leaves = jax.tree.leaves(tree)
    return leaves[0]


def _flops(jitted, *args):
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from speech_enhancement_clskd_tpu.config import (
        DataConfig,
        DistillConfig,
        MeshConfig,
        STUDENT,
        TEACHER,
        TrainConfig,
    )
    from speech_enhancement_clskd_tpu.distill.strategies import base_loss
    from speech_enhancement_clskd_tpu.parallel.mesh import batch_sharding
    from speech_enhancement_clskd_tpu.train import Trainer
    from speech_enhancement_clskd_tpu.utils.jax_setup import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    batch, seg_s, sr = args.batch, 3.0, 16000
    cfg = TrainConfig(
        teacher=dataclasses.replace(TEACHER, compute_dtype=args.dtype),
        student=dataclasses.replace(STUDENT, compute_dtype=args.dtype),
        data=DataConfig(synthetic=True, batch_size=batch, segment=seg_s),
        distill=DistillConfig(strategy="clskd"),
        mesh=MeshConfig(data=-1, model=1),
    )
    trainer = Trainer(cfg)
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    bs = batch_sharding(trainer.mesh)
    mix = jax.device_put(
        jnp.asarray(rng.standard_normal((batch, int(seg_s * sr)))
                    .astype(np.float32) * 0.1), bs)
    clean = jax.device_put(
        jnp.asarray(rng.standard_normal((batch, int(seg_s * sr)))
                    .astype(np.float32) * 0.1), bs)

    student, teacher = trainer.student, trainer.teacher
    dcfg = cfg.distill

    @jax.jit
    def teacher_fwd(state, mix):
        return teacher.apply(
            {"params": state.teacher_params,
             "batch_stats": state.teacher_stats},
            mix, training=False).wav

    @jax.jit
    def student_fwd(state, mix):
        return student.apply(
            {"params": state.student_params,
             "batch_stats": state.student_stats},
            mix, training=False).wav

    @jax.jit
    def student_step_base(state, mix, clean):
        def loss_fn(p):
            out, _ = student.apply(
                {"params": p, "batch_stats": state.student_stats},
                mix, training=True, mutable=["batch_stats"])
            return base_loss(out.wav, clean, dcfg)

        loss, grads = jax.value_and_grad(loss_fn)(state.student_params)
        return loss, jax.tree.map(lambda g: jnp.sum(jnp.abs(g)), grads)

    results = {}
    with trainer.mesh:
        for name, fn, fargs in [
            ("teacher_fwd", teacher_fwd, (state, mix)),
            ("student_fwd", student_fwd, (state, mix)),
            ("student_fwd_bwd_base", student_step_base, (state, mix, clean)),
        ]:
            dt = _time(fn, *fargs, rounds=args.rounds)
            fl = _flops(fn, *fargs)
            results[name] = {
                "ms": round(dt * 1e3, 2),
                "tflops_per_s": round(fl / dt / 1e12, 2) if fl else None,
                "gflop": round(fl / 1e9, 1) if fl else None,
            }

        # full train step (single dispatch, honest fence via loss readback)
        if trainer._train_step is None:
            trainer._train_step = trainer._build_train_step()
        st2, logs = trainer._train_step(state, mix, clean)
        _fence(logs["train_loss"])
        t0 = time.perf_counter()
        cur = st2
        for _ in range(args.rounds):
            cur, logs = trainer._train_step(cur, mix, clean)
        _fence(logs["train_loss"])
        dt = (time.perf_counter() - t0) / args.rounds
        fl = _flops(trainer._train_step, st2, mix, clean)
        results["full_clskd_step"] = {
            "ms": round(dt * 1e3, 2),
            "tflops_per_s": round(fl / dt / 1e12, 2) if fl else None,
            "gflop": round(fl / 1e9, 1) if fl else None,
        }

    results["_meta"] = {"dtype": args.dtype, "batch": batch,
                        "device": jax.devices()[0].device_kind}
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

"""Benchmark: full CLSKD distillation train step throughput on real TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: audio-seconds processed per wall-second per chip for the complete
CLSKD training step (teacher fwd + student fwd + ABF fusion + SPKD/MRSTFT
losses + backward + Adam update) at the reference's production shape —
batch 32 x 3 s @ 16 kHz (reference config.py:40-42, distill.py:213).

vs_baseline: the reference publishes no wall-clock (SURVEY.md section 6), so
the baseline denominator is the reference's throughput PROXY of 96 audio-s/s
(batch 32 x 3 s at an assumed 1.0 s/optimizer-step on its single GPU).
"""

import argparse
import dataclasses
import json
import time

BASELINE_AUDIO_S_PER_S = 96.0  # 32 utt * 3 s / 1.0 s-per-step proxy


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="model compute dtype (params stay float32)")
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
    from speech_enhancement_clskd_tpu.parallel.mesh import batch_sharding
    from speech_enhancement_clskd_tpu.train import Trainer

    n_chips = len(jax.devices())
    batch, seg_s, sr = 32, 3.0, 16000
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
        jnp.asarray(
            rng.standard_normal((batch, int(seg_s * sr))).astype(np.float32) * 0.1
        ),
        bs,
    )
    clean = jax.device_put(
        jnp.asarray(
            rng.standard_normal((batch, int(seg_s * sr))).astype(np.float32) * 0.1
        ),
        bs,
    )

    # Multi-step on-device loop: K prefetched batches, ONE dispatch
    # (lax.scan over the optimizer step) — the realistic TPU input pipeline
    # (prefetch-to-device + scan), and it removes the per-step dispatch RTT
    # that dominates when the chip is reached through a tunnel.
    from speech_enhancement_clskd_tpu.parallel.mesh import stacked_batch_sharding

    K = 16
    sbs = stacked_batch_sharding(trainer.mesh)
    mix_stack = jax.device_put(jnp.broadcast_to(mix, (K,) + mix.shape), sbs)
    clean_stack = jax.device_put(
        jnp.broadcast_to(clean, (K,) + clean.shape), sbs
    )

    # warmup (compile)
    state, logs = trainer.train_steps(state, mix_stack, clean_stack)
    jax.block_until_ready(logs["train_loss"])

    n_rounds = 4
    t0 = time.perf_counter()
    for _ in range(n_rounds):
        state, logs = trainer.train_steps(state, mix_stack, clean_stack)
    jax.block_until_ready(logs["train_loss"])
    dt = time.perf_counter() - t0

    step_time = dt / (n_rounds * K)
    logs = {k: v[-1] for k, v in logs.items()}
    audio_s_per_s = batch * seg_s / step_time / max(n_chips, 1)
    result = {
        "metric": "clskd_train_audio_s_per_s_per_chip",
        "value": round(audio_s_per_s, 2),
        "unit": "audio-seconds/s/chip",
        "vs_baseline": round(audio_s_per_s / BASELINE_AUDIO_S_PER_S, 3),
        "step_time_s": round(step_time, 4),
        "train_loss": round(float(logs["train_loss"]), 5),
        "n_chips": n_chips,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Data-parallel scaling-efficiency harness.

Measures CLSKD train-step throughput (audio-seconds/s) across mesh sizes
1..N over the available devices and reports scaling efficiency vs 1 device
(BASELINE.md north star: >=85% multi-host efficiency).

On this environment only ONE physical TPU chip is reachable, so multi-chip
rows are produced on the virtual CPU mesh
(JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8) —
they validate the sharded program + collective structure end-to-end; absolute
numbers are only meaningful per backend.

Usage:  python bench_scaling.py [--steps 8] [--batch-per-device 4]
"""

import argparse
import dataclasses
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch-per-device", type=int, default=4)
    ap.add_argument("--segment", type=float, default=3.0)
    ap.add_argument("--sizes", type=str, default=None,
                    help="comma-separated mesh sizes (default: 1,2,4,.. <= n_dev)")
    args = ap.parse_args()

    import os

    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
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

    n_dev = len(jax.devices())
    if args.sizes:
        sizes = [int(x) for x in args.sizes.split(",") if int(x) <= n_dev]
    else:
        sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_dev]
    sr = 16000
    seg = int(args.segment * sr)
    rng = np.random.default_rng(0)
    rows = []
    base = None
    for n in sizes:
        B = args.batch_per_device * n
        cfg = TrainConfig(
            teacher=TEACHER,
            student=STUDENT,
            data=DataConfig(synthetic=True, batch_size=B, segment=args.segment),
            distill=DistillConfig(strategy="clskd"),
            mesh=MeshConfig(data=n, model=1),
        )
        tr = Trainer(cfg)
        st = tr.init_state()
        bs = batch_sharding(tr.mesh)
        mix = jax.device_put(
            jnp.asarray(rng.standard_normal((B, seg)).astype(np.float32) * 0.1),
            bs,
        )
        clean = mix * 0.9
        def host_fence(logs) -> float:
            # real device->host readback: jax.block_until_ready does NOT
            # synchronize through the axon TPU tunnel (VERDICT.md round 1)
            return float(np.asarray(logs["train_loss"]))

        st, logs = tr.train_step(st, mix, clean)
        host_fence(logs)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            st, logs = tr.train_step(st, mix, clean)
        host_fence(logs)
        dt = (time.perf_counter() - t0) / args.steps
        tput = B * args.segment / dt
        if base is None:
            base = tput
        row = {
            "devices": n,
            "batch": B,
            "step_time_s": round(dt, 4),
            "audio_s_per_s": round(tput, 1),
            "backend": jax.default_backend(),
        }
        if jax.default_backend() == "cpu":
            # Virtual devices share one host's cores, so "n x resources"
            # scaling efficiency is not measurable here.  What IS meaningful
            # is the sharding overhead: aggregate throughput retained vs the
            # unsharded program on the same fixed silicon (ideal = 1.0).
            row["parallel_overhead_retained"] = round(tput / base, 3)
            row["note"] = "virtual shared-host mesh: validates sharded program structure, not ICI scaling"
        else:
            row["scaling_efficiency"] = round(tput / (base * n), 3)
        rows.append(row)
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"scaling": rows}))


if __name__ == "__main__":
    main()

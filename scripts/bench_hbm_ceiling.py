"""Measure this chip's PRACTICAL HBM streaming ceiling.

The CLSKD-step roofline in docs/PERF.md divides the step's traced HBM bytes
by the v5e's 819 GB/s spec number.  Real fusions never reach spec: this
script measures what simple streaming kernels actually achieve on THIS chip
(through the axon tunnel, honest host-readback fence), giving the effective
denominator for the "within X of its bandwidth bound" claim:

 - copy   (read 1, write 1)
 - axpy   (read 2, write 1)
 - 4-operand elementwise chain (read 4, write 1) — the shape of the ABF
   fusion arithmetic

Run: PYTHONPATH=. python scripts/bench_hbm_ceiling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from speech_enhancement_clskd_tpu.utils.jax_setup import enable_compilation_cache


def timed(fn, *args, rounds=10):
    out = fn(*args)
    float(jnp.sum(out[-1, -8:]))  # host readback fence
    t0 = time.perf_counter()
    for _ in range(rounds):
        out = fn(*args)
    float(jnp.sum(out[-1, -8:]))
    return (time.perf_counter() - t0) / rounds


def _chained(k: int):
    """k dependent full-array passes (read 1 / write 1 each) in ONE dispatch;
    the k2-k1 slope cancels dispatch and readback overhead."""

    @jax.jit
    def f(x):
        def body(_, x):
            return x * 1.0000001 + 0.0000001

        return jax.lax.fori_loop(0, k, body, x, unroll=False)

    return f


def main():
    enable_compilation_cache()
    n = 256 * 1024 * 1024 // 2  # 256 MB bf16 operand
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((n // 512, 512)).astype(np.float32)
    ).astype(jnp.bfloat16)
    bytes_per = x.nbytes

    k1, k2 = 2, 12
    t1 = timed(_chained(k1), x)
    t2 = timed(_chained(k2), x)
    per_pass = (t2 - t1) / (k2 - k1)
    out = {
        "metric": "hbm_streaming_ceiling",
        "operand_mb": bytes_per // 2**20,
        "per_pass_ms": round(per_pass * 1e3, 4),
        # each pass reads + writes the full array once
        "effective_gbps": round(2 * bytes_per / per_pass / 1e9, 1),
        "dispatch_floor_ms": round((t1 - 2 * per_pass) * 1e3, 4),
        "device": str(jax.devices()[0].device_kind),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Multi-host feed-path tests (VERDICT r2 weak #4 / next #4).

The reference is single-process (SURVEY.md section 2.4); the multi-host feed
is net-new TPU capability, so it gets two layers of coverage:

1. a REAL 2-process integration test: two subprocesses form a Gloo-backed
   ``jax.distributed`` cluster on CPU, each feeds only its local slice
   through ``put_global_batch`` -> ``jax.make_array_from_process_local_data``,
   and both assert (a) the addressable shards hold exactly the host-local
   rows and (b) a jitted global reduction sees the full batch;
2. a unit test that drives the multi-process branch in-process against a
   recording fake, pinning the slice arithmetic and the contiguity/global
   shape contract of the ``make_array_from_process_local_data`` call.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

import speech_enhancement_clskd_tpu.parallel.distributed as dist


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    pid, port, repo = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    sys.path.insert(0, repo)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from speech_enhancement_clskd_tpu.parallel import distributed
    # exercise our initialize() wrapper (arg path), not raw jax.distributed
    distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
    sh = NamedSharding(mesh, P("data"))
    g = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    arr = distributed.put_global_batch(g, sh)
    assert arr.shape == (8, 3), arr.shape

    # (a) this host's addressable shards hold exactly its local rows
    lo, hi = distributed.host_local_batch_slice(8)
    assert (lo, hi) == ((0, 4) if pid == 0 else (4, 8)), (pid, lo, hi)
    got = np.concatenate(
        [np.asarray(s.data) for s in sorted(arr.addressable_shards,
                                            key=lambda s: s.index[0].start)]
    )
    np.testing.assert_array_equal(got, g[lo:hi])

    # (b) a jitted global reduction sees the full batch
    total = float(jax.jit(lambda a: a.sum())(arr))
    assert total == float(g.sum()), (total, g.sum())

    # stacked [K, B, T] scan-batch path: batch axis 1
    gk = np.arange(2 * 8 * 3, dtype=np.float32).reshape(2, 8, 3)
    shk = NamedSharding(mesh, P(None, "data"))
    arrk = distributed.put_global_batch(gk, shk, batch_axis=1)
    totk = float(jax.jit(lambda a: a.sum())(arrk))
    assert totk == float(gk.sum()), (totk, gk.sum())
    print(f"WORKER_{pid}_OK", flush=True)
    """
)


def test_put_global_batch_two_real_processes(tmp_path):
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port), repo],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert f"WORKER_{pid}_OK" in out, out[-4000:]


def test_put_global_batch_multiprocess_branch_unit(monkeypatch):
    """Drive the process_count()>1 branch in-process with a recording fake."""
    calls = {}

    def fake_make(sharding, local_data, global_shape):
        calls["local"] = np.asarray(local_data)
        calls["global_shape"] = tuple(global_shape)
        calls["contiguous"] = local_data.flags["C_CONTIGUOUS"]
        return "SENTINEL"

    import jax

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    monkeypatch.setattr(jax, "make_array_from_process_local_data", fake_make)

    g = np.arange(10 * 5, dtype=np.float32).reshape(10, 5)
    out = dist.put_global_batch(g, sharding=object())
    assert out == "SENTINEL"
    # 10 rows over 4 hosts: per=2, host 2 owns rows [4, 6)
    assert dist.host_local_batch_slice(10) == (4, 6)
    np.testing.assert_array_equal(calls["local"], g[4:6])
    assert calls["global_shape"] == (10, 5)
    assert calls["contiguous"]

    # last host absorbs the remainder rows
    monkeypatch.setattr(jax, "process_index", lambda: 3)
    assert dist.host_local_batch_slice(10) == (6, 10)
    dist.put_global_batch(g, sharding=object())
    np.testing.assert_array_equal(calls["local"], g[6:10])

    # stacked scan batch: slice along axis 1
    gk = np.arange(3 * 8 * 2, dtype=np.float32).reshape(3, 8, 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    dist.put_global_batch(gk, sharding=object(), batch_axis=1)
    np.testing.assert_array_equal(calls["local"], gk[:, 2:4])
    assert calls["global_shape"] == (3, 8, 2)

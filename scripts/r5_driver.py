"""Single-process driver for the remaining round-5 TPU jobs.

The axon far side GC's a client's session lane ~15-40 min after the client
exits, and a NEW client that connects in that window stalls in the claim
wait (observed: clskd->spkd switch cost 18 min of wall clock with zero CPU).
Running every remaining job inside ONE python process pays that tax at most
once.  Each stage redirects fd 1/2 to its own artifacts/r5_<name>.log (XLA
logs write straight to fd 2, so contextlib redirection is not enough) and
is exception-isolated; jax.clear_caches() between stages keeps compiled
executables from accumulating on the 16 GB chip.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STATUS = "artifacts/r5_driver_status.log"


def note(msg: str) -> None:
    with open(STATUS, "a") as f:
        f.write(f"{time.strftime('%H:%M:%S')} {msg}\n")


def stage(name: str, fn) -> None:
    log = f"artifacts/r5_{name}.log"
    note(f"--- {name} start")
    saved = (os.dup(1), os.dup(2))
    fd = os.open(log, os.O_WRONLY | os.O_CREAT | os.O_APPEND)
    os.dup2(fd, 1)
    os.dup2(fd, 2)
    t0 = time.time()
    try:
        fn()
        ok = "ok"
    except SystemExit as e:
        ok = f"exit={e.code}"
    except Exception:
        traceback.print_exc()
        ok = "EXC"
    finally:
        sys.stdout.flush()
        sys.stderr.flush()
        os.dup2(saved[0], 1)
        os.dup2(saved[1], 2)
        os.close(fd)
        os.close(saved[0])
        os.close(saved[1])
    try:
        import jax

        jax.clear_caches()
    except Exception:
        pass
    note(f"--- {name} {ok} ({time.time() - t0:.0f}s)")


def main() -> None:
    from speech_enhancement_clskd_tpu import cli
    import bench
    import bench_serving

    HARD = ["data.synthetic=true", "data.synthetic_profile=hard"]
    TB = "artifacts/r5_teacher_hard/teacher_model.npz"

    plan = json.loads(sys.argv[1]) if len(sys.argv) > 1 else None

    def want(name):
        return plan is None or name in plan

    # -- remaining strategy distills (same seed/teacher as clskd/spkd) ----
    for s in ("mse", "stft", "reviewkd"):
        if not want(f"distill_{s}"):
            continue
        extra = ["distill.abf_remat=true"] if s == "reviewkd" else []
        stage(f"distill_{s}", lambda s=s, extra=extra: cli.main(
            ["distill", "--strategy", s, "--teacher-bundle", TB,
             "--out", f"artifacts/r5_{s}"] + HARD
            + ["max_epochs=5", "seed=0"] + extra))

    # -- per-strategy eval on the hard test profile ----------------------
    for s in ("clskd", "spkd", "mse", "stft", "reviewkd"):
        if not want(f"eval_{s}"):
            continue
        stage(f"eval_{s}", lambda s=s: cli.main(
            ["evaluate", "--bundle", f"artifacts/r5_{s}/the_best_model.npz",
             "--results", f"artifacts/r5_{s}/All_metric.json",
             "--examples", f"artifacts/r5_{s}/examples"] + HARD
            + ["data.synthetic_size=512"]))

    # -- bench rows ------------------------------------------------------
    if want("bench_f32"):
        stage("bench_f32", lambda: bench.main(
            ["--dtype", "float32", "--abf-remat", "--batch", "32"]))
    if want("bench_b64"):
        stage("bench_b64", lambda: bench.main([]))
    if want("bench_b64_bn2fold"):
        stage("bench_b64_bn2fold", lambda: bench.main(["--bn2-fold"]))
    if want("bench_b64_gram8"):
        stage("bench_b64_gram8", lambda: bench.main(["--gram-groups", "8"]))
    if want("bench_b32"):
        stage("bench_b32", lambda: bench.main(["--batch", "32"]))
    if want("bench_b32_bn2fold"):
        stage("bench_b32_bn2fold",
              lambda: bench.main(["--batch", "32", "--bn2-fold"]))

    # -- batch-64 bf16 multi-epoch streamed confirm ----------------------
    if want("b64_confirm"):
        stage("b64_confirm", lambda: cli.main(
            ["distill", "--strategy", "clskd", "--teacher-bundle",
             "artifacts/r4_teacher/teacher_model.npz",
             "--out", "artifacts/r5_b64_confirm", "data.synthetic=true",
             "data.batch_size=64", "max_epochs=3",
             "teacher.compute_dtype=bfloat16",
             "student.compute_dtype=bfloat16",
             "distill.taps_dtype=bfloat16"]))

    # -- serving benchmark ----------------------------------------------
    if want("serving"):
        stage("serving", lambda: bench_serving.main(
            ["--bundle", "artifacts/r4_distill/the_best_model.npz",
             "--out", "SERVING_r05.json"]))

    note("=== driver done ===")


if __name__ == "__main__":
    main()

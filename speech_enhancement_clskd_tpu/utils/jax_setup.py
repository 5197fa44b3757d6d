"""Process-wide JAX configuration: persistent compilation cache.

The CLSKD train step is a large program (teacher + student + ABF fusion +
losses + backward in one jit); cold XLA compiles run minutes on TPU.  The
persistent cache makes every process after the first start instantly
(reference has no equivalent — torch eager never compiles; for the TPU build
this is required infrastructure, VERDICT.md round-1 weak #7).

Idempotent and safe to call from anywhere before or after the first trace;
must be called before the first *compile* to help that compile.
"""

from __future__ import annotations

import os

_done = False

DEFAULT_CACHE_DIR = os.environ.get(
    "SE_CLSKD_JAX_CACHE", os.path.expanduser("~/.cache/se_clskd_jax")
)


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    global _done
    if _done:
        return
    import jax

    path = cache_dir or DEFAULT_CACHE_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that takes >1s to compile (default 60s skips most steps)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except AttributeError:  # older jax
        pass
    _done = True

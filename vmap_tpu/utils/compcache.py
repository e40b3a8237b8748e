"""Persistent XLA compilation cache.

The monolithic fused train-frame kernel costs ~90 s to compile through the
tunneled TPU compile service (BENCH_r02.json detail.compile_s; the shared
frontend has been observed oscillating to 15+ min). For a real-time SLAM
system that cold-start is unacceptable on every process launch, so every
entry point (train.py, bench.py, scripts/*) enables JAX's persistent
compilation cache: compiled executables are keyed by HLO + compile options
+ jaxlib version and reused across processes, dropping warm-start compile
to cache-deserialisation time.

The reference has no equivalent (eager PyTorch compiles nothing); this is
TPU-native operational hygiene.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "vmap_tpu", "jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache. Idempotent.

    Honours ``VMAP_COMPILATION_CACHE`` (path, or "0" to disable) over the
    argument; defaults to ``~/.cache/vmap_tpu/jax_cache``. Returns the
    directory in use, or None when disabled/unavailable.
    """
    env = os.environ.get("VMAP_COMPILATION_CACHE")
    if env == "0":
        return None
    cache_dir = env or cache_dir or _DEFAULT_DIR
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every compile above a trivial floor: the kernels we care
        # about take >1 s; the default 1 GiB-ish heuristics can skip them.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # jaxlib too old / read-only fs: run uncached
        return None
    return cache_dir

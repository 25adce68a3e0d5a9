"""Persistent XLA compilation cache.

Under the axon tunnel a cold compile of the fused train/render programs
costs minutes of remote-compiler round-trips (BENCH_NOTES: ~4-5 min of
the north-star run's first epoch). JAX's persistent compilation cache
serializes compiled executables to disk keyed by (program, jaxlib,
backend, flags), so every process after the first pays ~0 for programs
it has already built — the standard production setting for TPU
frameworks. Measured on this backend: a 1.4 s toy compile drops to
0.08 s warm; the north-star programs drop minutes.

The reference has no analog (torch caches CUDA kernels process-locally
via cudnn benchmark, train.py:177); this is TPU-native operational
plumbing, not a port.
"""
from __future__ import annotations

import os
from typing import Optional

DEFAULT_DIR = "~/.cache/nerf_pl_tpu/xla"


def enable_compile_cache(path: Optional[str] = DEFAULT_DIR) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``path``.

    Call once per process before the first jit dispatch. If the user
    set JAX_COMPILATION_CACHE_DIR in the environment, that ALWAYS wins
    (including over ``path=""``) and this is a no-op. Otherwise ``path``
    of None/"" disables (each process recompiles from scratch) — to
    truly disable, the env var must also be unset. Returns the active
    cache dir (or None when caching is off), so callers can report
    which case they are in.

    JAX's own admission rules stay at their defaults (only programs
    whose compile took >= 1 s are persisted), which admits the fused
    train/render/eval programs while keeping tiny host utilities out of
    the cache.
    """
    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env:
        return env
    if not path:
        return None
    import jax

    p = os.path.abspath(os.path.expanduser(path))
    os.makedirs(p, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", p)
    return p

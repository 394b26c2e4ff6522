"""Persistent XLA compilation cache.

The whole-epoch training programs take minutes to compile on first use;
caching compiled executables on disk makes every later process start
warm. Opt-out with CBFSSM_XLA_CACHE=0; override the location with
CBFSSM_XLA_CACHE=<dir>.
"""

from __future__ import annotations

import os

import jax

_enabled = False


def enable_persistent_cache(path: str | None = None) -> bool:
    global _enabled
    if _enabled:
        return True
    env = os.environ.get("CBFSSM_XLA_CACHE")
    if env == "0":
        return False
    path = path or env or os.path.expanduser("~/.cache/cbfssm_tpu/xla")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        _enabled = True
    except Exception:
        return False
    return True

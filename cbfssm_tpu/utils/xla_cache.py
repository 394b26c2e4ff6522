"""Persistent XLA compilation cache.

The whole-epoch training programs take minutes to compile on first use;
caching compiled executables on disk makes every later process start
warm. Opt-out with CBFSSM_XLA_CACHE=0; override the location with
CBFSSM_XLA_CACHE=<dir>.
"""

from __future__ import annotations

import os

import jax

_enabled_path: str | None = None


def enable_persistent_cache(path: str | None = None) -> bool:
    """Point jax's persistent compilation cache at ``path`` (default:
    $CBFSSM_XLA_CACHE or ~/.cache/cbfssm_tpu/xla). Returns True when the
    cache is active AT THE REQUESTED LOCATION. The first successful call
    latches (every trainer calls this as a side effect); a later call
    asking for a DIFFERENT explicit path returns False rather than
    pretending the new location took effect."""
    global _enabled_path
    env = os.environ.get("CBFSSM_XLA_CACHE")
    if env == "0":
        return False
    want = os.path.abspath(path or env
                           or os.path.expanduser("~/.cache/cbfssm_tpu/xla"))
    if _enabled_path is not None:
        if path is not None and want != _enabled_path:
            import sys

            print(
                f"persistent XLA cache already at {_enabled_path}; "
                f"ignoring request for {want}", file=sys.stderr,
            )
            return False
        return True
    try:
        os.makedirs(want, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", want)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        _enabled_path = want
    except Exception:
        return False
    return True

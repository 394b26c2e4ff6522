"""Varying-manual-axes (vma) helpers for shard_map compatibility.

Under ``jax.shard_map`` with ``check_vma=True`` (the default), every
value carries the set of mesh axes over which it *varies*. A
``lax.scan`` carry must enter the loop with the same vma its body
produces — but model code initializes carries from replicated
constants (``jnp.zeros``) while the bodies mix in shard-unique RNG
draws, which are varying. These helpers promote a carry init to the
vma of a reference value (typically the pre-drawn noise array) so the
models stay mesh-agnostic while passing the safety check.

Outside shard_map every vma set is empty and these are no-ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def match_vma(x, *likes):
    """Return ``x`` promoted to vary over every manual mesh axis that
    any of ``likes`` varies over (no-op outside shard_map). Pass every
    array the scan body mixes into the carry — e.g. both the RNG draws
    (particle-varying) and the data (data-varying)."""
    try:
        have = jax.typeof(x).vma
    except AttributeError:  # older jax without vma tracking
        return x
    want = frozenset()
    for v in likes:
        try:
            want |= jax.typeof(v).vma
        except AttributeError:
            # a python scalar among the likes has no vma — skip it
            # rather than silently disabling promotion for the rest
            continue
    want = want - have
    if want:
        x = jax.lax.pcast(x, tuple(want), to="varying")
    return x


def zeros_matching(shape, dtype, *likes):
    """``jnp.zeros(shape, dtype)`` with the union vma of ``likes``."""
    return match_vma(jnp.zeros(shape, dtype=dtype), *likes)


def unvary_like(ct, primal):
    """psum a cotangent over every manual mesh axis it varies over but
    its primal does not — the transpose of the implicit broadcast a
    replicated value undergoes inside shard_map. Custom-VJP bwd rules
    must return cotangents with vma matching the primal inputs; for a
    replicated input whose cotangent was computed from shard-varying
    data, that reduction is exactly a psum. No-op outside shard_map."""
    try:
        extra = jax.typeof(ct).vma - jax.typeof(primal).vma
    except AttributeError:  # older jax without vma tracking
        return ct
    if extra:
        ct = jax.lax.psum(ct, tuple(extra))
    return ct

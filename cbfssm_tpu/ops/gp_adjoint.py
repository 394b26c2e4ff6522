"""Hand-derived adjoint of the solve-free GP predict link.

Motivation (BENCHMARKS.md "Utilization"): the training step is bound by
the sequential dependency chain of the time recursions, and reverse-mode
autodiff re-traverses that chain with ~2-3x the per-link work — most of
it cotangent accumulation for LOOP-INVARIANT quantities (the cached
inducing operators, variational variances, kernel hyperparameters,
noise vectors). Those accumulations do not feed the sequential chain;
they only need the per-step output cotangents.

This module implements the split schedule used by the models'
``adjoint='hand'`` mode (models/adjoint.py):

* :func:`link_bwd` — the minimal IN-CHAIN pullback of one predict link:
  cotangent w.r.t. the link's input rows only. Three matmuls
  ([N,D]x[D,M], [N,M+D]x[M+D,M], [N,M]x[M,din]) + elementwise — about
  half of what autodiff schedules inside the reverse scan (which adds
  the transposed accumulation matmuls for ``kinv_alpha``, ``var_q``,
  ``z`` at every step).
* :func:`predict_batch` — batched recompute of the predict
  intermediates for ALL timesteps at once (two big MXU matmuls),
  feeding the reverse scan and the deferred accumulation. The primal
  therefore stores nothing beyond the states it already outputs.
* :func:`deferred_cache_grads` — the loop-invariant cotangents
  (kinv_alpha, var_q, kern_var, kern_len, z) computed AFTER the reverse
  scan as batched [T*N, .] matmuls over the stacked per-step pieces.

The math (all w.r.t. the predict path in ops/gp.py:140-167, with
``C = concat(K^-1, alpha)``, ``xs = x / len``, ``zs = z / len``)::

  knm = kv * exp(-0.5 * max(|xs|^2 - 2 xs zs^T + |zs|^2, 0))
  wm  = knm @ C ; w = wm[:, :M] ; gm0 = wm[:, M:]
  qf  = sum_m knm * w
  gv0 = max(kv - qf, 0) + w^2 @ vq

  d_w   = 2 w * (d_gv0 @ vq^T) + d_qf * knm     with d_qf = -rpos * sum_d d_gv0
  d_wm  = [d_w | d_gm0]
  d_knm = d_wm @ C^T + d_qf * w
  d_d2  = -0.5 * knm * d_knm * d2pos
  d_xs  = (-2 d_d2) @ zs + 2 xs * rowsum(d_d2)
  d_gin = d_xs / len

  (deferred)  d_C  = knm^T @ d_wm          d_vq = (w^2)^T @ d_gv0
              d_kv = sum(rpos * sum_d d_gv0) + sum(d_knm * knm) / kv
              d_zs = (-2 d_d2)^T @ xs + 2 zs * colsum(d_d2) ; d_z = d_zs / len
              d_len = -(sum_N d_xs * x + sum_M d_zs * z) / len^2

Clamp subgradients use the strict masks ``d2pos = (raw > 0)`` /
``rpos = (kv - qf > 0)`` — identical to autodiff except on the
measure-zero tie sets where ``jnp.maximum`` uses 1/2.

Validated against reverse-mode autodiff in float64 (tests/test_adjoint.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cbfssm_tpu.ops import kernels


def predict_batch(cache, gp_in, precision=None):
    """Recompute the predict intermediates for stacked rows.

    gp_in: [P, din] -> dict of [P, ...] arrays (see module docstring).
    Bitwise-reproduces the primal ops of :func:`cbfssm_tpu.ops.gp.predict`
    (same operations on the same inputs), plus the clamp masks.
    """
    precision = kernels.HIGHEST if precision is None else precision
    m = cache.kinv.shape[0]
    ls = cache.kern_len
    xs = gp_in / ls
    # NOT cache.zs: that field is z * inv_ls (a reciprocal-multiply for
    # the Pallas kernel), which differs from the primal's z / ls in the
    # last ulp — this module's contract is BITWISE primal reproduction
    # (kernels.scaled_square_dist divides). The loop-invariant division
    # is hoisted by XLA.
    zs = cache.z / ls
    xn = jnp.sum(jnp.square(xs), axis=-1)  # [P]
    zn = jnp.sum(jnp.square(zs), axis=-1)  # [M]
    cross = jnp.matmul(xs, zs.T, precision=precision)  # [P, M]
    d2raw = xn[:, None] - 2.0 * cross + zn[None, :]
    knm = cache.kern_var * jnp.exp(-0.5 * jnp.maximum(d2raw, 0.0))
    wm = jnp.matmul(knm, cache.kinv_alpha, precision=precision)  # [P, M+D]
    w, gm0 = wm[:, :m], wm[:, m:]
    qf = jnp.sum(knm * w, axis=-1)  # [P]
    r = cache.kern_var - qf
    gv0 = jnp.maximum(r, 0.0)[:, None] + jnp.matmul(
        jnp.square(w), cache.var_q, precision=precision
    )
    return {
        "xs": xs,
        "knm": knm,
        "w": w,
        "gm0": gm0,
        "gv0": gv0,
        "qf": qf,
        "d2pos": d2raw > 0.0,
        "rpos": r > 0.0,
    }


def _d_knm_parts(cache, knm, w, rpos, d_gm0, d_gv0, precision):
    """Shared head of the pullback: (d_qf, d_wm, d_knm)."""
    d_qf = -jnp.where(rpos, jnp.sum(d_gv0, axis=-1), 0.0)  # [P]
    t1 = jnp.matmul(d_gv0, cache.var_q.T, precision=precision)  # [P, M]
    d_w = 2.0 * w * t1 + d_qf[:, None] * knm
    d_wm = jnp.concatenate((d_w, d_gm0), axis=-1)  # [P, M+D]
    d_knm = (
        jnp.matmul(d_wm, cache.kinv_alpha.T, precision=precision)
        + d_qf[:, None] * w
    )
    return d_qf, d_wm, d_knm


def link_bwd(cache, pre_t, d_gm0, d_gv0, precision=None):
    """In-chain pullback of one predict link w.r.t. its input rows.

    pre_t: per-step slice of :func:`predict_batch` (2-D [N, ...]).
    Returns d_gin [N, din]; loop-invariant cotangents are NOT computed
    here — :func:`deferred_cache_grads` recovers them after the scan
    from the stacked (d_gm0, d_gv0).
    """
    precision = kernels.HIGHEST if precision is None else precision
    knm, w, xs = pre_t["knm"], pre_t["w"], pre_t["xs"]
    _, _, d_knm = _d_knm_parts(
        cache, knm, w, pre_t["rpos"], d_gm0, d_gv0, precision
    )
    d_d2 = jnp.where(pre_t["d2pos"], -0.5 * knm * d_knm, 0.0)
    zs = cache.z / cache.kern_len  # [M, din]; loop-invariant, hoisted by XLA
    d_xs = jnp.matmul(-2.0 * d_d2, zs, precision=precision) + 2.0 * xs * jnp.sum(
        d_d2, axis=-1, keepdims=True
    )
    return d_xs / cache.kern_len


def deferred_cache_grads(cache, pre, gp_in, d_gm0, d_gv0, precision=None):
    """Loop-invariant cotangents, batched over all stacked rows [P, ...].

    Returns a GPCache-shaped cotangent: nonzero in the fields the
    predict path reads (kinv_alpha, var_q, kern_var, kern_len, z),
    zeros elsewhere — autodiff then pulls these back through
    ``gp.precompute`` to the parameters.
    """
    precision = kernels.HIGHEST if precision is None else precision
    knm, w, xs = pre["knm"], pre["w"], pre["xs"]
    ls = cache.kern_len
    _, d_wm, d_knm = _d_knm_parts(
        cache, knm, w, pre["rpos"], d_gm0, d_gv0, precision
    )
    d_c = jnp.matmul(knm.T, d_wm, precision=precision)  # [M, M+D]
    d_vq = jnp.matmul(jnp.square(w).T, d_gv0, precision=precision)  # [M, D]
    d_r = jnp.where(pre["rpos"], jnp.sum(d_gv0, axis=-1), 0.0)  # [P]
    d_kv = jnp.sum(d_r) + jnp.sum(d_knm * knm) / cache.kern_var
    d_kv = jnp.asarray(d_kv, dtype=jnp.asarray(cache.kern_var).dtype).reshape(
        jnp.shape(cache.kern_var)
    )
    d_d2 = jnp.where(pre["d2pos"], -0.5 * knm * d_knm, 0.0)
    zs = cache.z / ls
    neg2_d2 = -2.0 * d_d2
    d_xs = jnp.matmul(neg2_d2, zs, precision=precision) + 2.0 * xs * jnp.sum(
        d_d2, axis=-1, keepdims=True
    )
    d_zs = jnp.matmul(neg2_d2.T, xs, precision=precision) + 2.0 * zs * jnp.sum(
        d_d2, axis=0
    )[:, None]
    d_z = d_zs / ls
    d_len = -(
        jnp.sum(d_xs * gp_in, axis=0) + jnp.sum(d_zs * cache.z, axis=0)
    ) / jnp.square(ls)
    zero = jax.tree_util.tree_map(jnp.zeros_like, cache)
    return zero.replace(
        kinv_alpha=d_c,
        var_q=d_vq,
        kern_var=d_kv,
        kern_len=d_len,
        z=d_z,
    )

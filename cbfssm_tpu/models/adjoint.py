"""Hand-scheduled adjoints of the CBFSSM time recursions.

Reverse-mode autodiff of a ``lax.scan`` re-traverses the sequential
chain with every cotangent accumulation inlined into the reverse loop —
including the accumulations for LOOP-INVARIANT inputs (GP cache
operators, kernel hyperparameters, noise vectors), which roughly double
the matmul count on the latency-critical chain (BENCHMARKS.md
"Utilization": the step is dependency-chain-bound, and reverse mode is
75% of it). These ``jax.custom_vjp`` rollouts restructure the backward
pass into three phases:

1. batched recompute of all per-step primal intermediates from the
   stacked states the primal already outputs (two big MXU matmuls — no
   extra residuals are stored during the primal);
2. a reverse scan carrying ONLY the state cotangent: three matmuls per
   link (``ops.gp_adjoint.link_bwd``) plus elementwise algebra;
3. deferred, batched accumulation of every loop-invariant cotangent
   (``ops.gp_adjoint.deferred_cache_grads`` + plain reductions).

The primal values are bit-identical to the autodiff path (the scans
run the exact same step bodies, shared with models/cbfssm.py); the
gradients agree with autodiff to float tolerance (clamp ties excepted,
see ops/gp_adjoint.py) — pinned by tests/test_adjoint.py in float64.

Applies to ``gp_impl='solve_free'`` only (models/base.py rejects
``adjoint='hand'`` with the Pallas predict path at construction — it
has its own custom VJP).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from cbfssm_tpu.models.base import LOG_2PI_E
from cbfssm_tpu.ops import gp, gp_adjoint, vma
from cbfssm_tpu.ops.distributions import kl_diag_gaussians


def _match_vma(cts, primals):
    """Shard_map compatibility: psum each cotangent over the manual
    axes its (replicated) primal does not vary over."""
    return tuple(
        jax.tree_util.tree_map(vma.unvary_like, ct, prim)
        for ct, prim in zip(cts, primals)
    )


class ScanStatic(NamedTuple):
    """Hashable per-trace constants for the custom-vjp scans."""

    precision: Any  # jax.lax.Precision for all GP-path matmuls
    unroll: int  # lax.scan unroll factor


def _pre_t(knm, w, xs, d2pos, rpos):
    return {"knm": knm, "w": w, "xs": xs, "d2pos": d2pos, "rpos": rpos}


# --------------------------------------------------------------------------
# Forward (generative/conditioning) rollout
# --------------------------------------------------------------------------


def forward_step(cache_f, var_x, var_y, k_factor, dims, gp_predict):
    """The forward-rollout scan body (cbfssm.py:185-237 semantics),
    shared verbatim by the autodiff and hand-adjoint paths so their
    primal values are bit-identical."""
    b, s, dx, du = dims

    def step(x, inp):
        u_t, y_next, eps_t, cond_t = inp
        u_bs = jnp.broadcast_to(u_t[:, None, :], (b, s, du))
        gp_in = jnp.concatenate((x, u_bs), axis=-1).reshape(b * s, -1)
        fmean, fvar = gp_predict(cache_f, gp_in)
        fmean = fmean.reshape(b, s, dx) + x  # residual transition
        fvar = fvar.reshape(b, s, dx) + var_x

        # Kalman-style conditioning on the pseudo observation y_next
        # with k-factor-inflated observation variance (cbfssm.py:211-221).
        var_y_t = var_y + (k_factor - 1.0) * fvar
        gain = fvar / (var_y_t + fvar)
        mu = fmean + gain * (y_next - fmean)
        sig = jnp.square(1.0 - gain) * fvar + jnp.square(gain) * var_y_t

        mu_used = jnp.where(cond_t, mu, fmean)
        sig_used = jnp.where(cond_t, sig, fvar)
        x_next = mu_used + eps_t * jnp.sqrt(sig_used)

        kl_t = kl_diag_gaussians(mu, sig, fmean, fvar, axis=(1, 2))  # [B]
        kl_t = jnp.where(cond_t, kl_t, 0.0)
        return x_next, (x_next, kl_t)

    return step


def _forward_scan_primal(static, cache, var_x, var_y, k_factor, x0, u_in,
                         y_next_in, eps_in, cond_in):
    b, s, dx = x0.shape
    du = u_in.shape[-1]
    step = forward_step(
        cache, var_x, var_y, k_factor, (b, s, dx, du),
        lambda c, xn: gp.predict(c, xn, precision=static.precision),
    )
    _, (x_rest, kl_steps) = jax.lax.scan(
        step, x0, (u_in, y_next_in, eps_in, cond_in), unroll=static.unroll
    )
    return x_rest, kl_steps


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def forward_scan(static, cache, var_x, var_y, k_factor, x0, u_in, y_next_in,
                 eps_in, cond_in):
    """Conditioned particle rollout over ``T-1`` transitions.

    x0 [B,S,dx]; u_in [T-1,B,du]; y_next_in [T-1,B,S,dx];
    eps_in [T-1,B,S,1]; cond_in [T-1] bool ->
    (x_rest [T-1,B,S,dx], kl_steps [T-1,B])
    """
    return _forward_scan_primal(
        static, cache, var_x, var_y, k_factor, x0, u_in, y_next_in, eps_in,
        cond_in,
    )


def _forward_scan_fwd(static, cache, var_x, var_y, k_factor, x0, u_in,
                      y_next_in, eps_in, cond_in):
    out = _forward_scan_primal(
        static, cache, var_x, var_y, k_factor, x0, u_in, y_next_in, eps_in,
        cond_in,
    )
    res = (cache, var_x, var_y, k_factor, x0, u_in, y_next_in, eps_in,
           cond_in, out[0])
    return out, res


def _forward_scan_bwd(static, res, cots):
    (cache, var_x, var_y, k_factor, x0, u_in, y_next_in, eps_in, cond_in,
     x_rest) = res
    d_x_rest, d_kl_steps = cots
    t1 = u_in.shape[0]
    b, s, dx = x0.shape
    du = u_in.shape[-1]
    n = b * s
    prec = static.precision

    # ---- phase 1: batched recompute of per-step primal intermediates ----
    x_in = jnp.concatenate((x0[None], x_rest[:-1]), axis=0)  # [T1,b,s,dx]
    u_bs = jnp.broadcast_to(u_in[:, :, None, :], (t1, b, s, du))
    gp_in_all = jnp.concatenate((x_in, u_bs), axis=-1).reshape(t1 * n, dx + du)
    pre = gp_adjoint.predict_batch(cache, gp_in_all, prec)

    def bsd(a, tail):  # [P, ...] -> [T1, b, s, *tail]
        return a.reshape((t1, b, s) + tail)

    gm0 = bsd(pre["gm0"], (dx,))
    fmean = gm0 + x_in
    fvar = bsd(pre["gv0"], (dx,)) + var_x
    vyt = var_y + (k_factor - 1.0) * fvar
    s_den = vyt + fvar
    gain = fvar / s_den
    mu = fmean + gain * (y_next_in - fmean)
    sig = jnp.square(1.0 - gain) * fvar + jnp.square(gain) * vyt
    cond_b = cond_in[:, None, None, None]
    sqrt_su = jnp.sqrt(jnp.where(cond_b, sig, fvar))

    # ---- phase 2: reverse scan — state-cotangent chain only ----
    # per-step GP-link intermediates as flat rows [T1, N, ...]
    knm = pre["knm"].reshape(t1, n, -1)
    w = pre["w"].reshape(t1, n, -1)
    xs = pre["xs"].reshape(t1, n, -1)
    d2pos = pre["d2pos"].reshape(t1, n, -1)
    rpos = pre["rpos"].reshape(t1, n)

    def flip(a):
        return jnp.flip(a, axis=0)

    rev_inputs = jax.tree_util.tree_map(
        flip,
        (d_x_rest, d_kl_steps, fmean, fvar, vyt, s_den, gain, mu, sig,
         sqrt_su, y_next_in, eps_in, cond_in, knm, w, xs, d2pos, rpos),
    )

    def rstep(d_xn, inp):
        (d_out, d_klb, fmean_t, fvar_t, vyt_t, s_den_t, gain_t, mu_t, sig_t,
         sqrt_su_t, y_next_t, eps_t, cond_t, knm_t, w_t, xs_t, d2pos_t,
         rpos_t) = inp
        d_xn_tot = d_xn + d_out  # [b,s,dx]
        d_squ = d_xn_tot * eps_t * (0.5 / sqrt_su_t)
        d_mu = jnp.where(cond_t, d_xn_tot, 0.0)
        d_fmean = jnp.where(cond_t, 0.0, d_xn_tot)
        d_sig = jnp.where(cond_t, d_squ, 0.0)
        d_fvar = jnp.where(cond_t, 0.0, d_squ)
        # KL(N(mu,sig) || N(fmean,fvar)) summed over (s, dx), 0.5-scaled,
        # gated by cond (see forward_step)
        g = jnp.where(cond_t, 0.5, 0.0) * d_klb[:, None, None]  # [b,1,1]
        dm = mu_t - fmean_t
        inv_fvar = 1.0 / fvar_t
        d_fvar = d_fvar + g * (inv_fvar - (sig_t + dm * dm) * inv_fvar * inv_fvar)
        d_sig = d_sig + g * (inv_fvar - 1.0 / sig_t)
        d_mu = d_mu + g * (2.0 * dm * inv_fvar)
        d_fmean = d_fmean - g * (2.0 * dm * inv_fvar)
        # sig = (1-gain)^2 fvar + gain^2 vyt
        d_gain = d_sig * (2.0 * gain_t * vyt_t - 2.0 * (1.0 - gain_t) * fvar_t)
        d_fvar = d_fvar + d_sig * jnp.square(1.0 - gain_t)
        d_vyt = d_sig * jnp.square(gain_t)
        # mu = fmean + gain (y_next - fmean)
        d_fmean = d_fmean + d_mu * (1.0 - gain_t)
        d_gain = d_gain + d_mu * (y_next_t - fmean_t)
        d_ynext = d_mu * gain_t
        # gain = fvar / s_den
        inv_sden2 = 1.0 / jnp.square(s_den_t)
        d_fvar = d_fvar + d_gain * vyt_t * inv_sden2
        d_vyt = d_vyt - d_gain * fvar_t * inv_sden2
        # vyt = var_y + (k-1) fvar
        d_fvar = d_fvar + d_vyt * (k_factor - 1.0)
        # fvar = gv0 + var_x ; fmean = gm0 + x
        d_gin = gp_adjoint.link_bwd(
            cache, _pre_t(knm_t, w_t, xs_t, d2pos_t, rpos_t),
            d_fmean.reshape(n, dx), d_fvar.reshape(n, dx), prec,
        )
        d_x_prev = d_gin[:, :dx].reshape(b, s, dx) + d_fmean
        return d_x_prev, (d_fmean, d_fvar, d_ynext, d_vyt,
                          d_gin[:, dx:], d_xn_tot)

    d_x0, rev_out = jax.lax.scan(
        rstep, jnp.zeros_like(x0), rev_inputs, unroll=static.unroll
    )
    d_gm0_all, d_gv0_all, d_ynext_all, d_vyt_all, d_gin_u_all, d_xn_all = (
        jax.tree_util.tree_map(flip, rev_out)
    )

    # ---- phase 3: deferred loop-invariant cotangents (batched) ----
    d_cache = gp_adjoint.deferred_cache_grads(
        cache, pre, gp_in_all,
        d_gm0_all.reshape(t1 * n, dx), d_gv0_all.reshape(t1 * n, dx), prec,
    )
    d_var_x = jnp.sum(d_gv0_all, axis=(0, 1, 2))
    d_var_y = jnp.sum(d_vyt_all, axis=(0, 1, 2))
    d_k = jnp.sum(d_vyt_all * fvar).reshape(jnp.shape(k_factor)).astype(
        jnp.asarray(k_factor).dtype
    )
    d_u = jnp.sum(d_gin_u_all.reshape(t1, b, s, du), axis=2)
    d_eps = jnp.sum(d_xn_all * sqrt_su, axis=-1, keepdims=True)
    cts = _match_vma(
        (d_cache, d_var_x, d_var_y, d_k, d_x0, d_u, d_ynext_all, d_eps),
        (cache, var_x, var_y, k_factor, x0, u_in, y_next_in, eps_in),
    )
    return (*cts, None)


forward_scan.defvjp(_forward_scan_fwd, _forward_scan_bwd)


# --------------------------------------------------------------------------
# Backward (recognition) blocked rollout
# --------------------------------------------------------------------------


def backward_step(cache_b, var_x_h, dims, gp_predict):
    """The blocked recognition scan body (cbfssm.py:114-158 semantics in
    the block-parallel layout of models/cbfssm.py:_backward_blocked),
    shared by the autodiff and hand-adjoint paths."""
    n_runs, k_blk, b, s, dh, duy = dims

    def step(h, inp):
        u_t, y_t, z_t, noise_t, eps_t, res_t = inp
        h_carry = jnp.where(z_t[:, :, None, None, None], 0.0, h)
        h_in = jnp.where(res_t, noise_t, h_carry)  # broadcast to [2,K,B,S,dh]
        uy = jnp.broadcast_to(
            jnp.concatenate((u_t, y_t), axis=-1)[:, :, :, None, :],
            (n_runs, k_blk, b, s, duy),
        )
        gp_in = jnp.concatenate(
            (jnp.broadcast_to(h_in, (n_runs, k_blk, b, s, dh)), uy), axis=-1
        )  # [2, K, B, S, dh+duy]
        # batch-major flatten: keeps the GP matmul rows sharded on a
        # data mesh (see gp.predict_rows); bitwise = layout flatten
        fmean, fvar = gp.predict_rows(gp_predict, cache_b, gp_in, 2)
        fmean = fmean + h_in
        fvar = fvar + var_x_h
        out = fmean + eps_t * jnp.sqrt(fvar)
        ent_t = 0.5 * jnp.sum(LOG_2PI_E + jnp.log(fvar), axis=(3, 4))  # [2,K,B]
        return out, (out, ent_t)

    return step


def _backward_scan_primal(static, cache, var_x_h, h0, u_in, y_in, z_in,
                          noise_in, eps_in, res_in):
    n_runs, k_blk, b, s, dh = h0.shape
    duy = u_in.shape[-1] + y_in.shape[-1]
    step = backward_step(
        cache, var_x_h, (n_runs, k_blk, b, s, dh, duy),
        lambda c, xn: gp.predict(c, xn, precision=static.precision),
    )
    _, (outs, ents) = jax.lax.scan(
        step, h0, (u_in, y_in, z_in, noise_in, eps_in, res_in),
        unroll=static.unroll,
    )
    return outs, ents


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def backward_scan(static, cache, var_x_h, h0, u_in, y_in, z_in, noise_in,
                  eps_in, res_in):
    """Blocked recognition rollout over ``two_l`` steps (descending t').

    h0 [2,K,B,S,dh]; u_in [two_l,2,K,B,du]; y_in [two_l,2,K,B,dy];
    z_in [two_l,2,K] bool; noise_in/eps_in [two_l,2,K,B,S,1];
    res_in [two_l] bool -> (outs [two_l,2,K,B,S,dh], ents [two_l,2,K,B])
    """
    return _backward_scan_primal(
        static, cache, var_x_h, h0, u_in, y_in, z_in, noise_in, eps_in, res_in
    )


def _backward_scan_fwd(static, cache, var_x_h, h0, u_in, y_in, z_in, noise_in,
                       eps_in, res_in):
    out = _backward_scan_primal(
        static, cache, var_x_h, h0, u_in, y_in, z_in, noise_in, eps_in, res_in
    )
    res = (cache, var_x_h, h0, u_in, y_in, z_in, noise_in, eps_in, res_in,
           out[0])
    return out, res


def _backward_scan_bwd(static, res, cots):
    (cache, var_x_h, h0, u_in, y_in, z_in, noise_in, eps_in, res_in,
     outs) = res
    d_outs, d_ents = cots
    two_l, n_runs, k_blk, b, du = u_in.shape
    s, dh = h0.shape[3], h0.shape[4]
    dy = y_in.shape[-1]
    n = n_runs * k_blk * b * s
    prec = static.precision

    # ---- phase 1: batched recompute ----
    prev_out = jnp.concatenate((h0[None], outs[:-1]), axis=0)
    h_carry = jnp.where(z_in[:, :, :, None, None, None], 0.0, prev_out)
    h_in = jnp.where(
        res_in[:, None, None, None, None, None], noise_in, h_carry
    )  # [two_l,2,K,b,s,dh]
    uy = jnp.broadcast_to(
        jnp.concatenate((u_in, y_in), axis=-1)[:, :, :, :, None, :],
        (two_l, n_runs, k_blk, b, s, du + dy),
    )
    gp_in_all = jnp.concatenate(
        (jnp.broadcast_to(h_in, (two_l, n_runs, k_blk, b, s, dh)), uy),
        axis=-1,
    ).reshape(two_l * n, dh + du + dy)
    pre = gp_adjoint.predict_batch(cache, gp_in_all, prec)

    def tsd(a, tail):  # [P, ...] -> [two_l, 2, K, b, s, *tail]
        return a.reshape((two_l, n_runs, k_blk, b, s) + tail)

    fvar = tsd(pre["gv0"], (dh,)) + var_x_h
    sqrt_fvar = jnp.sqrt(fvar)

    # ---- phase 2: reverse scan — state-cotangent chain only ----
    # per-step GP-link intermediates as flat rows [two_l, N, ...]
    knm = pre["knm"].reshape(two_l, n, -1)
    w = pre["w"].reshape(two_l, n, -1)
    xs = pre["xs"].reshape(two_l, n, -1)
    d2pos = pre["d2pos"].reshape(two_l, n, -1)
    rpos = pre["rpos"].reshape(two_l, n)

    def flip(a):
        return jnp.flip(a, axis=0)

    rev_inputs = jax.tree_util.tree_map(
        flip,
        (d_outs, d_ents, fvar, sqrt_fvar, eps_in, z_in, res_in, knm, w, xs,
         d2pos, rpos),
    )

    def rstep(d_h, inp):
        (d_out_st, d_ent, fvar_t, sqrt_fvar_t, eps_t, z_t, res_t, knm_t, w_t,
         xs_t, d2pos_t, rpos_t) = inp
        d_out = d_h + d_out_st  # [2,K,b,s,dh]
        # out = fmean + eps sqrt(fvar); ent = 0.5 sum(log(2 pi e) + log fvar)
        d_fmean = d_out
        d_fvar = d_out * eps_t * (0.5 / sqrt_fvar_t) + (
            0.5 * d_ent[:, :, :, None, None] / fvar_t
        )
        d_gin = gp_adjoint.link_bwd(
            cache, _pre_t(knm_t, w_t, xs_t, d2pos_t, rpos_t),
            d_fmean.reshape(n, dh), d_fvar.reshape(n, dh), prec,
        )
        d_h_in = (
            d_gin[:, :dh].reshape(n_runs, k_blk, b, s, dh) + d_fmean
        )
        # h_in = where(res, noise, h_carry); h_carry = where(z, 0, h)
        d_h_carry = jnp.where(res_t, 0.0, d_h_in)
        d_h_prev = jnp.where(z_t[:, :, None, None, None], 0.0, d_h_carry)
        d_noise = jnp.where(
            res_t, jnp.sum(d_h_in, axis=-1, keepdims=True), 0.0
        )
        return d_h_prev, (d_fmean, d_fvar, d_noise, d_out,
                          d_gin[:, dh:])

    d_h0, rev_out = jax.lax.scan(
        rstep, jnp.zeros_like(h0), rev_inputs, unroll=static.unroll
    )
    d_gm0_all, d_gv0_all, d_noise_all, d_out_all, d_gin_uy_all = (
        jax.tree_util.tree_map(flip, rev_out)
    )

    # ---- phase 3: deferred loop-invariant cotangents (batched) ----
    d_cache = gp_adjoint.deferred_cache_grads(
        cache, pre, gp_in_all,
        d_gm0_all.reshape(two_l * n, dh), d_gv0_all.reshape(two_l * n, dh),
        prec,
    )
    d_var_x_h = jnp.sum(d_gv0_all, axis=(0, 1, 2, 3, 4))
    d_gin_uy = d_gin_uy_all.reshape(two_l, n_runs, k_blk, b, s, du + dy)
    d_u = jnp.sum(d_gin_uy[..., :du], axis=4)
    d_y = jnp.sum(d_gin_uy[..., du:], axis=4)
    d_eps = jnp.sum(d_out_all * sqrt_fvar, axis=-1, keepdims=True)
    cts = _match_vma(
        (d_cache, d_var_x_h, d_h0, d_u, d_y, d_noise_all, d_eps),
        (cache, var_x_h, h0, u_in, y_in, noise_in, eps_in),
    )
    return (*cts[:5], None, *cts[5:], None)


backward_scan.defvjp(_backward_scan_fwd, _backward_scan_bwd)

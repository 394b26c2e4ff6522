"""Fused sparse-GP predict as a single Pallas TPU kernel.

The SSM scan bodies are overhead-bound on TPU: each timestep's GP
prediction lowers to ~6 small XLA kernels (cross-Gram matmul, exp
epilogue, three mixing matmuls, elementwise assembly) whose per-kernel
launch overhead dominates at these sizes (N = B*S up to ~2k rows,
M <= 100 inducing points). This kernel computes the whole predictive —

  xs   = x * inv_ls
  d2   = |xs|^2 - 2 xs zs^T + |zs|^2          (zs = z * inv_ls, cached)
  kmn  = kvar * exp(-0.5 * d2)
  w    = kmn @ kinv
  mean = kmn @ alpha
  var  = (kvar - sum(kmn*w, -1))[:, None] + (w*w) @ var_q

— in ONE kernel: every operand fits in VMEM (padded to 128-lane tiles),
the three mixing matmuls ride the MXU back-to-back, and the exp/square
epilogues run on the VPU without HBM roundtrips.

Differentiability: a hand-derived analytic VJP (validated against jax
autodiff of the reference formulation in tests) makes the kernel usable
inside the differentiated training scans; the backward pass is plain
jnp (a handful of matmuls XLA fuses well).

Padding contract (why no masking is needed): zs/kinv/alpha/var_q are
zero-padded to [MP, *]. Padded z rows produce garbage kmn columns, but
every consumer multiplies them by zero-padded kinv/alpha rows; the qf
term sums kmn*w where w's padded columns are exactly zero. inv_ls is
zero-padded so padded input dims contribute nothing to d2.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _kernel_body(kvar_ref, x_ref, zs_ref, inv_ls_ref, kinv_ref, alpha_ref, varq_ref,
                 mean_ref, var_ref, kmn_ref=None, w_ref=None):
    # Full-f32 multiplication precision on the MXU: the predictive
    # variance is a small difference of large terms (kvar - qf); bf16
    # passes make qf overshoot kvar and the downstream sqrt/log NaN.
    hp = jax.lax.Precision.HIGHEST
    kvar = kvar_ref[0, 0]
    xs = x_ref[:] * inv_ls_ref[:]  # [TN, DI]
    xn = jnp.sum(jnp.square(xs), axis=-1, keepdims=True)  # [TN, 1]
    zn = jnp.sum(jnp.square(zs_ref[:]), axis=-1, keepdims=True).T  # [1, MP]
    cross = jax.lax.dot_general(
        xs, zs_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=hp,
    )  # [TN, MP]
    d2 = jnp.maximum(xn - 2.0 * cross + zn, 0.0)
    kmn = kvar * jnp.exp(-0.5 * d2)  # [TN, MP]
    w = jnp.dot(kmn, kinv_ref[:], preferred_element_type=jnp.float32, precision=hp)
    qf = jnp.sum(kmn * w, axis=-1, keepdims=True)  # [TN, 1]
    mean_ref[:] = jnp.dot(
        kmn, alpha_ref[:], preferred_element_type=jnp.float32, precision=hp
    )
    # kvar - qf >= 0 mathematically; clamp f32 cancellation noise.
    var_ref[:] = jnp.maximum(kvar - qf, 0.0) + jnp.dot(
        jnp.square(w), varq_ref[:], preferred_element_type=jnp.float32, precision=hp
    )
    if kmn_ref is not None:
        kmn_ref[:] = kmn
        w_ref[:] = w


def _kernel(kvar_ref, x_ref, zs_ref, inv_ls_ref, kinv_ref, alpha_ref, varq_ref,
            mean_ref, var_ref):
    _kernel_body(kvar_ref, x_ref, zs_ref, inv_ls_ref, kinv_ref, alpha_ref,
                 varq_ref, mean_ref, var_ref)


def _kernel_with_residuals(kvar_ref, x_ref, zs_ref, inv_ls_ref, kinv_ref,
                           alpha_ref, varq_ref, mean_ref, var_ref, kmn_ref, w_ref):
    _kernel_body(kvar_ref, x_ref, zs_ref, inv_ls_ref, kinv_ref, alpha_ref,
                 varq_ref, mean_ref, var_ref, kmn_ref, w_ref)


def _pallas_forward(x, zs, inv_ls, kvar, kinv, alpha, var_q, tile_n=512,
                    with_residuals=False):
    n, di = x.shape
    m = zs.shape[0]
    d = alpha.shape[1]
    np_ = _round_up(max(n, 8), 8)
    dip = _round_up(di, LANE)
    mp = _round_up(m, LANE)
    dp = _round_up(d, LANE)
    tile_n = min(tile_n, np_)
    np_ = _round_up(np_, tile_n)

    xp = jnp.zeros((np_, dip), x.dtype).at[:n, :di].set(x)
    zsp = jnp.zeros((mp, dip), x.dtype).at[:m, :di].set(zs)
    ilp = jnp.zeros((1, dip), x.dtype).at[0, :di].set(inv_ls)
    kip = jnp.zeros((mp, mp), x.dtype).at[:m, :m].set(kinv)
    alp = jnp.zeros((mp, dp), x.dtype).at[:m, :d].set(alpha)
    vqp = jnp.zeros((mp, dp), x.dtype).at[:m, :d].set(var_q)
    kv = jnp.reshape(kvar.astype(x.dtype), (1, 1))

    grid = (np_ // tile_n,)
    row_spec = pl.BlockSpec((tile_n, dip), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_d_spec = pl.BlockSpec((tile_n, dp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_m_spec = pl.BlockSpec((tile_n, mp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_specs = [out_d_spec, out_d_spec]
    out_shape = [
        jax.ShapeDtypeStruct((np_, dp), x.dtype),
        jax.ShapeDtypeStruct((np_, dp), x.dtype),
    ]
    kernel = _kernel
    if with_residuals:
        kernel = _kernel_with_residuals
        out_specs += [out_m_spec, out_m_spec]
        out_shape += [
            jax.ShapeDtypeStruct((np_, mp), x.dtype),
            jax.ShapeDtypeStruct((np_, mp), x.dtype),
        ]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            row_spec,
            full((mp, dip)),
            full((1, dip)),
            full((mp, mp)),
            full((mp, dp)),
            full((mp, dp)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
    )(kv, xp, zsp, ilp, kip, alp, vqp)
    if with_residuals:
        mean_p, var_p, kmn_p, w_p = outs
        return (
            mean_p[:n, :d],
            var_p[:n, :d],
            kmn_p[:n, :m],
            w_p[:n, :m],
        )
    mean_p, var_p = outs
    return mean_p[:n, :d], var_p[:n, :d]


def _reference_forward(x, zs, inv_ls, kvar, kinv, alpha, var_q):
    """Same math in plain jnp (used on non-TPU backends and as the
    residual-producing forward for the VJP)."""
    hp = jax.lax.Precision.HIGHEST
    xs = x * inv_ls
    xn = jnp.sum(jnp.square(xs), axis=-1, keepdims=True)
    zn = jnp.sum(jnp.square(zs), axis=-1)[None, :]
    cross = jnp.matmul(xs, zs.T, precision=hp)
    d2 = jnp.maximum(xn - 2.0 * cross + zn, 0.0)
    kmn = kvar * jnp.exp(-0.5 * d2)
    w = jnp.matmul(kmn, kinv, precision=hp)
    qf = jnp.sum(kmn * w, axis=-1, keepdims=True)
    mean = jnp.matmul(kmn, alpha, precision=hp)
    var = jnp.maximum(kvar - qf, 0.0) + jnp.matmul(jnp.square(w), var_q, precision=hp)
    return mean, var, (xs, kmn, w)


def _use_pallas(dtype=None) -> bool:
    """The fused kernel targets f32 on TPU; f64 (XLA-emulated on TPU)
    and all other backends use the identical jnp math."""
    if jax.default_backend() != "tpu":
        return False
    return dtype is None or jnp.dtype(dtype) == jnp.float32


@jax.custom_vjp
def fused_predict(x, zs, inv_ls, kvar, kinv, alpha, var_q):
    """Sparse-GP predictive (mean, var) at x; fused on TPU.

    x: [N, DI] query points
    zs: [M, DI] inducing inputs pre-scaled by 1/lengthscales
    inv_ls: [DI] inverse lengthscales
    kvar: [] kernel variance
    kinv: [M, M] inverse of the jittered Gram
    alpha: [M, D] kinv @ variational mean
    var_q: [M, D] variational variances
    """
    if _use_pallas(x.dtype):
        return _pallas_forward(x, zs, inv_ls, kvar, kinv, alpha, var_q)
    mean, var, _ = _reference_forward(x, zs, inv_ls, kvar, kinv, alpha, var_q)
    return mean, var


def _fwd(x, zs, inv_ls, kvar, kinv, alpha, var_q):
    if _use_pallas(x.dtype):
        mean, var, kmn, w = _pallas_forward(
            x, zs, inv_ls, kvar, kinv, alpha, var_q, with_residuals=True
        )
        xs = x * inv_ls  # cheap elementwise recompute for the bwd
    else:
        mean, var, (xs, kmn, w) = _reference_forward(
            x, zs, inv_ls, kvar, kinv, alpha, var_q
        )
    return (mean, var), (x, zs, inv_ls, kvar, kinv, alpha, var_q, xs, kmn, w)


def _bwd(res, cotangents):
    """Analytic VJP of the fused predictive (see module docstring for the
    forward equations); validated against jax autodiff in tests."""
    x, zs, inv_ls, kvar, kinv, alpha, var_q, xs, kmn, w = res
    gm, gv = cotangents
    hp = jax.lax.Precision.HIGHEST

    # The (kvar - qf) base term is clamped at 0 in the forward; its
    # cotangent only flows where the clamp is inactive.
    qf = jnp.sum(kmn * w, axis=-1, keepdims=True)
    active = (kvar - qf > 0.0).astype(gv.dtype)  # [N, 1]
    s = jnp.sum(gv, axis=-1, keepdims=True) * active  # [N, 1]
    d_var_q = jnp.matmul(jnp.square(w).T, gv, precision=hp)  # [M, D]
    d_alpha = jnp.matmul(kmn.T, gm, precision=hp)  # [M, D]
    # w enters var through -qf (w * kmn) and through (w*w) @ var_q.
    d_w = -s * kmn + 2.0 * w * jnp.matmul(gv, var_q.T, precision=hp)  # [N, M]
    d_kinv = jnp.matmul(kmn.T, d_w, precision=hp)  # [M, M]
    # kmn enters mean, w = kmn @ kinv (kinv symmetric), and -qf.
    d_kmn = (
        jnp.matmul(gm, alpha.T, precision=hp)
        + jnp.matmul(d_w, kinv, precision=hp)
        - s * w
    )  # [N, M]
    d_kvar = jnp.sum(gv * active) + jnp.sum(d_kmn * kmn) / kvar
    # The forward clamps d2 = max(d2raw, 0); where the clamp is active
    # (coincident query/inducing points once lengthscales sharpen) the
    # true gradient through d2 is zero — recompute the strict mask
    # (one [N, M] matmul) exactly as ops/gp_adjoint.py's d2pos does.
    xn = jnp.sum(jnp.square(xs), axis=-1, keepdims=True)  # [N, 1]
    zn = jnp.sum(jnp.square(zs), axis=-1)  # [M]
    d2raw = xn - 2.0 * jnp.matmul(xs, zs.T, precision=hp) + zn[None, :]
    d_d2 = jnp.where(d2raw > 0.0, -0.5 * kmn * d_kmn, 0.0)  # [N, M]
    d_xs = 2.0 * (
        jnp.sum(d_d2, axis=-1, keepdims=True) * xs
        - jnp.matmul(d_d2, zs, precision=hp)
    )  # [N, DI]
    d_zs = 2.0 * (
        jnp.sum(d_d2, axis=0)[:, None] * zs
        - jnp.matmul(d_d2.T, xs, precision=hp)
    )  # [M, DI]
    d_x = d_xs * inv_ls
    d_inv_ls = jnp.sum(d_xs * x, axis=0)
    return d_x, d_zs, d_inv_ls, d_kvar.astype(kvar.dtype), d_kinv, d_alpha, d_var_q


fused_predict.defvjp(_fwd, _bwd)

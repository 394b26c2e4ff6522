"""Variational sparse (inducing-point) GP.

Capability parity with reference cbfssm/model/gp_tf.py:103-172
(``GPModel``) and the free-function FITC-style ``conditional``
(gp_tf.py:68-100): q(f(x)) has mean ``K_nm K^-1 m`` and variance
``k(x,x) - diag(K_nm K^-1 K_mn) + sum_m var_q[m,:] * (K_nm K^-1)_m^2``
(unwhitened parameterization, diagonal variational covariance).

TPU-first design — the predict path is *solve-free*:

The reference runs two triangular backsubstitutions against the cached
M x M Cholesky for every timestep of the sequential SSM loop
(gp_tf.py:137,145). Triangular solves serialize on TPU. Here the
Cholesky is computed ONCE per optimization step (outside ``lax.scan``),
``K^-1`` and ``alpha = K^-1 m`` are formed explicitly (M <= ~100, so this
is microseconds), and each scan step then costs exactly:

  * one RBF cross-Gram   (1 MXU matmul + fused exp)
  * ``W = K_nm @ K^-1``  (1 MXU matmul)
  * ``mean = K_nm @ alpha``, ``varq = (W*W) @ var_q`` (2 thin matmuls)

which is the speed-of-light formulation for many-right-hand-sides,
small-M sparse-GP prediction on a systolic-array machine.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from cbfssm_tpu.ops import kernels, linalg, transforms
from cbfssm_tpu.ops.distributions import kl_diag_vs_tril


@struct.dataclass
class SparseGPParams:
    """Trainable state of one inducing-point GP (a JAX pytree)."""

    z: Any  # [M, in_dim] inducing-point positions
    mean: Any  # [M, out_dim] variational mean
    var_unc: Any  # [M, out_dim] unconstrained variational variance
    kern_var_unc: Any  # [] unconstrained kernel variance
    kern_len_unc: Any  # [in_dim] unconstrained ARD lengthscales

    @property
    def var(self):
        return transforms.positive(self.var_unc)

    @property
    def kern_var(self):
        return transforms.positive(self.kern_var_unc)

    @property
    def kern_len(self):
        return transforms.positive(self.kern_len_unc)


@struct.dataclass
class GPCache:
    """Per-optimization-step precomputation (loop-invariant under scan)."""

    chol: Any  # [M, M] lower Cholesky of K(Z, Z) + jitter I
    kinv: Any  # [M, M] explicit K^-1
    kinv_diag: Any  # [M]
    alpha: Any  # [M, out_dim] K^-1 @ mean
    var_q: Any  # [M, out_dim] constrained variational variance
    kern_var: Any  # [] constrained kernel variance
    kern_len: Any  # [in_dim] constrained lengthscales
    z: Any  # [M, in_dim]
    inv_ls: Any  # [in_dim] 1 / lengthscales
    zs: Any  # [M, in_dim] z * inv_ls (pre-scaled inducing inputs)
    kinv_alpha: Any  # [M, M + out_dim] concat(K^-1, alpha): one predict matmul


def init_sparse_gp(
    key,
    in_dim: int,
    out_dim: int,
    num_points: int,
    gp_var: float,
    gp_len: float,
    zeta_mean: float,
    zeta_pos: float,
    zeta_var: float,
    dtype=jnp.float32,
) -> SparseGPParams:
    """Initialize with the reference's distributions (gp_tf.py:104-127):
    z ~ U(-zeta_pos, zeta_pos), mean = zeta_mean * U(0, 1), constant
    variational variance and kernel hyperparameters."""
    kz, km = jax.random.split(key)
    z = jax.random.uniform(
        kz, (num_points, in_dim), dtype=dtype, minval=-zeta_pos, maxval=zeta_pos
    )
    mean = zeta_mean * jax.random.uniform(km, (num_points, out_dim), dtype=dtype)
    var_unc = jnp.full(
        (num_points, out_dim),
        transforms.positive_inverse(zeta_var).item(),
        dtype=dtype,
    )
    kern_var_unc = jnp.asarray(transforms.positive_inverse(gp_var).item(), dtype=dtype)
    kern_len_unc = jnp.full(
        (in_dim,), transforms.positive_inverse(gp_len).item(), dtype=dtype
    )
    return SparseGPParams(
        z=z,
        mean=mean,
        var_unc=var_unc,
        kern_var_unc=kern_var_unc,
        kern_len_unc=kern_len_unc,
    )


def _finish_cache(params: SparseGPParams, chol, kinv) -> GPCache:
    """Assemble a GPCache from a factorized Gram (shared by the single
    and pair-batched precompute paths)."""
    alpha = jnp.matmul(kinv, params.mean, precision=kernels.HIGHEST)
    kern_len = params.kern_len
    inv_ls = 1.0 / kern_len
    return GPCache(
        chol=chol,
        kinv=kinv,
        kinv_diag=jnp.diagonal(kinv),
        alpha=alpha,
        var_q=params.var,
        kern_var=params.kern_var,
        kern_len=kern_len,
        z=params.z,
        inv_ls=inv_ls,
        zs=params.z * inv_ls,
        kinv_alpha=jnp.concatenate((kinv, alpha), axis=1),
    )


def precompute(params: SparseGPParams, jitter: float | None = None) -> GPCache:
    """Factorize K(Z, Z) once and form the solve-free predict operators."""
    gram = kernels.rbf_gram(params.z, params.kern_var, params.kern_len)
    chol = linalg.jittered_cholesky(gram, jitter)
    kinv = linalg.cholesky_inverse(chol)
    return _finish_cache(params, chol, kinv)


def precompute_pair(
    params_a: SparseGPParams,
    params_b: SparseGPParams,
    jitter: float | None = None,
):
    """Precompute TWO same-M GP caches through ONE batched
    Cholesky/inverse chain.

    The M x M factorization chain is tiny in FLOPs but latency-bound on
    TPU (the small-matrix expander loops serialize); models with two
    GPs (CBFSSM forward+backward, Voliro force+recognition — both share
    ``ind_pnt_num``) pay it twice per optimizer step. Stacking the two
    Grams on a leading batch axis runs both factorizations through one
    expander pass. Numerically equivalent to two :func:`precompute`
    calls (same per-matrix operations, batched; pinned by test).
    """
    gram_a = kernels.rbf_gram(params_a.z, params_a.kern_var, params_a.kern_len)
    gram_b = kernels.rbf_gram(params_b.z, params_b.kern_var, params_b.kern_len)
    chol = linalg.jittered_cholesky(jnp.stack((gram_a, gram_b)), jitter)
    kinv = linalg.cholesky_inverse(chol)
    return (
        _finish_cache(params_a, chol[0], kinv[0]),
        _finish_cache(params_b, chol[1], kinv[1]),
    )


def predict(cache: GPCache, xnew, precision=None):
    """Predictive mean/variance at ``xnew`` [N, in_dim] -> ([N, D], [N, D]).

    Solve-free path (see module docstring); numerically equivalent to
    :func:`predict_reference` (tested to tight tolerance). The w and
    mean products are ONE matmul against the cached concat(K^-1, alpha)
    — bitwise identical to two separate matmuls (each output element is
    the same dot product) and measurably faster inside scan bodies.

    ``precision`` overrides the matmul precision (default HIGHEST; see
    ModelConfig.gp_matmul_precision for the measured accuracy/speed
    trade-off on compute-bound shapes).
    """
    precision = kernels.HIGHEST if precision is None else precision
    m = cache.kinv.shape[0]
    knm = kernels.rbf_cross(
        xnew, cache.z, cache.kern_var, cache.kern_len, precision=precision
    )  # [N, M]
    wm = jnp.matmul(knm, cache.kinv_alpha, precision=precision)  # [N, M + D]
    w, fmean = wm[:, :m], wm[:, m:]
    qf = jnp.sum(knm * w, axis=-1)  # [N] = diag(K_nm K^-1 K_mn)
    # kvar - qf >= 0 mathematically; clamp the f32 cancellation noise
    # that otherwise drives sqrt/log of a negative variance to NaN once
    # lengthscales sharpen during training.
    fvar = jnp.maximum(cache.kern_var - qf, 0.0)[:, None] + jnp.matmul(
        jnp.square(w), cache.var_q, precision=precision
    )  # [N, D]
    return fmean, fvar


def predict_rows(predict_fn, cache, gp_in, batch_axis: int):
    """Row-wise predict over an N-D input, flattened with the window
    -batch axis MAJOR-most: ``gp_in [..., B, ..., d] -> rows [B*rest, d]
    -> predict -> [..., B, ..., D]``.

    Why the axis shuffle exists: GP predict is row-independent, so the
    flatten order is semantically free — but it is NOT free to the SPMD
    partitioner. XLA can only keep a reshape-merged dimension sharded
    when the sharded axis is the major-most axis of the merged group.
    CBFSSM's recognition pass carries a leading run axis ([2, B, S, d];
    [2, K, B, S, d] blocked), so the layout-order flatten
    ``reshape(2*B*S, d)`` forced an all-gather of the batch shards and
    REPLICATED every GP matmul on every device of a data mesh (found by
    the round-5 collective-census audit; pinned in
    tests/test_collective_census.py). Flattening batch-major keeps the
    row dimension sharded end-to-end.

    Bitwise identical per element to the layout-order flatten on any
    single device: moveaxis/reshape are pure permutations and every
    predict row is the same dot products either way.
    """
    moved = jnp.moveaxis(gp_in, batch_axis, 0)
    shape = moved.shape
    fmean, fvar = predict_fn(cache, moved.reshape(-1, shape[-1]))

    def unflatten(a):
        return jnp.moveaxis(a.reshape(shape[:-1] + (a.shape[-1],)), 0, batch_axis)

    return unflatten(fmean), unflatten(fvar)


def predict_fast(cache: GPCache, xnew):
    """Like :func:`predict` but through the fused Pallas TPU kernel
    (single-kernel forward; analytic custom VJP). Falls back to the same
    math in plain jnp on non-TPU backends. Used inside the models' scan
    bodies where per-kernel launch overhead dominates."""
    from cbfssm_tpu.ops.pallas import fused_predict

    return fused_predict(
        xnew, cache.zs, cache.inv_ls, cache.kern_var, cache.kinv, cache.alpha, cache.var_q
    )


def predict_reference(params: SparseGPParams, xnew, jitter: float | None = None):
    """Triangular-solve formulation (mirrors reference gp_tf.py:132-161).

    Kept as the numerical ground truth for tests and as a fallback; not
    used inside scans.
    """
    kern_var = params.kern_var
    kern_len = params.kern_len
    gram = kernels.rbf_gram(params.z, kern_var, kern_len)
    chol = linalg.jittered_cholesky(gram, jitter)
    kmn = kernels.rbf_cross(params.z, xnew, kern_var, kern_len)  # [M, N]
    a = jax.scipy.linalg.solve_triangular(chol, kmn, lower=True)  # [M, N]
    fvar_base = jnp.maximum(kern_var - jnp.sum(jnp.square(a), axis=0), 0.0)  # [N]
    a = jax.scipy.linalg.solve_triangular(chol.T, a, lower=False)  # [M, N]
    fmean = a.T @ params.mean  # [N, D]
    fvar = fvar_base[:, None] + jnp.square(a.T) @ params.var  # [N, D]
    return fmean, fvar


def prior_kl(params: SparseGPParams, cache: GPCache):
    """KL( q(zeta) || N(0, K(Z,Z)) ) summed over output dims
    (reference gp_tf.py:163-172)."""
    return kl_diag_vs_tril(
        mean_q=params.mean,
        var_q=cache.var_q,
        chol_p=cache.chol,
        kinv_p_diag=cache.kinv_diag,
        kinv_mean=cache.alpha,
    )

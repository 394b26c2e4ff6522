"""PR-SSM baseline (Doerr et al. 2018) in the same harness.

Capability parity with reference cbfssm/model/prssm.py:14-172: a single
sparse GP transition, recognition choices 'output' / 'conv' / 'rnn', a
pure prior particle rollout (no conditioning on future observations),
and ELBO = lambda_1 * loglik - KL(zeta) (faithfully NOT divided by the
particle count).

Note: the reference parameterizes the PR-SSM kernel with one scalar
lengthscale (prssm.py:40); this implementation uses the strictly more
general per-dimension ARD vector initialized to the same value.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from cbfssm_tpu.models import recognition
from cbfssm_tpu.models.base import BaseSSM
from cbfssm_tpu.ops import gp, transforms, vma


@struct.dataclass
class PRSSMParams:
    gp_f: gp.SparseGPParams
    var_x_unc: Any  # [dim_x]
    var_y_unc: Any  # [dim_y]
    recog: Any


class PRSSM(BaseSSM):
    # The PR-SSM ELBO is faithfully NOT divided by the particle count
    # (prssm.py:96-97); particle-parallel recombination must not
    # normalize either.
    PARTICLE_NORMALIZED = False
    # loss-time fields this model reads (SweepTrainer whitelist): pure
    # prior rollout — no conditioning, so no k_factor
    SWEEPABLE_HYPERS = frozenset({"loss_factors"})
    # parameter-only aux entries (not psum-ed by ParticleParallel)
    REPLICATED_AUX = frozenset({"kl_z", "global_term", "particle_divisor"})

    def __init__(self, config):
        super().__init__(config)
        self.dim_x = int(self.config.dim_x)
        self._check_noise_lengths(var_x=self.dim_x, var_y=self.dim_y)
        if self.dim_x < self.dim_y:
            # fail early with context: the zero-pad of observations up
            # to dim_x (and the recognition nets) would otherwise crash
            # deep inside a trace with a negative pad width
            raise ValueError(
                f"{type(self).__name__} needs dim_x >= dim_y, got "
                f"dim_x={self.dim_x} < dim_y={self.dim_y}"
            )
        self.recog_kind = self.config.recog_model
        self.recog_module = recognition.make_recognition(
            self.recog_kind, self.dim_x, self.dtype
        )

    def init(self, key) -> PRSSMParams:
        cfg = self.config
        kf, kr = jax.random.split(key)
        gp_f = gp.init_sparse_gp(
            kf,
            self.dim_x + self.dim_u,
            self.dim_x,
            num_points=cfg.ind_pnt_num,
            gp_var=cfg.gp_var,
            gp_len=cfg.gp_len,
            zeta_mean=cfg.zeta_mean,
            zeta_pos=cfg.zeta_pos,
            zeta_var=cfg.zeta_var,
            dtype=self.dtype,
        )
        if self.recog_module is None:
            recog_params = {}
        else:
            dummy = jnp.zeros((1, cfg.recog_len, self.dim_u + self.dim_y), dtype=self.dtype)
            recog_params = self.recog_module.init(kr, dummy)
        return PRSSMParams(
            gp_f=gp_f,
            var_x_unc=self._noise_unc(cfg.var_x),
            var_y_unc=self._noise_unc(cfg.var_y),
            recog=recog_params,
        )

    def var_dict(self, params) -> dict:
        return {
            "process noise": transforms.positive(params.var_x_unc),
            "observation noise": transforms.positive(params.var_y_unc),
            "kernel lengthscales": params.gp_f.kern_len,
            "kernel variance": params.gp_f.kern_var,
            "IP pos": params.gp_f.z,
            "IP mean": params.gp_f.mean,
            "IP var": params.gp_f.var,
        }

    def _initial_state(self, params, u, y):
        if self.recog_module is None:
            x0 = recognition.output_recognition(jnp.asarray(y, dtype=self.dtype), self.dim_x)
        else:
            uy = jnp.concatenate(
                (jnp.asarray(u, dtype=self.dtype), jnp.asarray(y, dtype=self.dtype)),
                axis=-1,
            )[:, : self.config.recog_len, :]
            x0 = self.recog_module.apply(params.recog, uy)
        return jnp.broadcast_to(x0[:, None, :], (x0.shape[0], self.samples, self.dim_x))

    def _rollout(self, params, u, y, key):
        var_x = transforms.positive(params.var_x_unc)
        var_y = transforms.positive(params.var_y_unc)
        cache_f = gp.precompute(params.gp_f, self.jitter)
        u_tm, y_tm = self._time_major(u), self._time_major(y)
        t_len, b = u_tm.shape[0], u_tm.shape[1]
        s, dx = self.samples, self.dim_x

        eps = self._shared_eps(key, (t_len - 1, b, s), self.dtype)

        def step(x, inp):
            u_t, eps_t = inp
            u_bs = jnp.broadcast_to(u_t[:, None, :], (b, s, self.dim_u))
            gp_in = jnp.concatenate((x, u_bs), axis=-1).reshape(b * s, -1)
            fmean, fvar = self._gp_predict(cache_f, gp_in)
            fmean = fmean.reshape(b, s, dx) + x
            fvar = fvar.reshape(b, s, dx) + var_x
            x_next = fmean + eps_t * jnp.sqrt(fvar)
            return x_next, x_next

        x0 = vma.match_vma(self._initial_state(params, u, y), eps, u_tm)
        _, x_rest = jax.lax.scan(
            step, x0, (u_tm[:-1], eps), unroll=self.config.scan_unroll
        )
        x_final = jnp.concatenate((x0[None], x_rest), axis=0)
        return x_final, (var_y, cache_f, y_tm)

    def loss(self, params, u, y, key, condition: bool = True, weights=None):
        """ELBO = lambda_1 * loglik - KL(zeta) (prssm.py:96-97).
        ``condition`` is accepted for interface parity but has no effect
        — PR-SSM never conditions on future observations."""
        del condition
        x_final, (var_y, cache_f, y_tm) = self._rollout(params, u, y, key)
        y_final = x_final[..., : self.dim_y]
        loglik = self._loglik(y_final, y_tm, var_y[: self.dim_y])
        if weights is None:
            weights = jnp.ones(y_tm.shape[1], dtype=self.dtype)
        lam1 = jnp.asarray(self.config.loss_factors[0], dtype=self.dtype)
        kl_z = gp.prior_kl(params.gp_f, cache_f)
        particle_sum = lam1 * jnp.dot(loglik, weights, precision=jax.lax.Precision.HIGHEST)
        global_term = -kl_z
        # faithful to the reference: the particle sum is NOT divided by
        # the particle count (prssm.py:96-97)
        elbo = particle_sum + global_term
        aux = {
            "loglik": jnp.dot(loglik, weights, precision=jax.lax.Precision.HIGHEST),
            "kl_z": kl_z,
            "particle_sum": particle_sum,
            "particle_divisor": jnp.asarray(1.0, dtype=self.dtype),
            "global_term": global_term,
        }
        return -elbo, aux

    def predict(self, params, u, y, key, condition: bool = False):
        del condition
        x_final, (var_y, _, y_tm) = self._rollout(params, u, y, key)
        return self._prediction_stats(x_final, y_tm, var_y)

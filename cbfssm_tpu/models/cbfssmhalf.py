"""CBFSSM-half: forward-only variant for stable systems.

Capability parity with reference cbfssm/model/cbfssmhalf.py:7-211 — no
backward recognition GP; x_0 comes from a recognition network ('rnn'
GRU(16) by default, or 'output'); the Kalman-style conditioning update
acts only on the observed dims (zero-padded for hidden dims); the ELBO
has no entropy term.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from cbfssm_tpu.models import recognition, segmentation
from cbfssm_tpu.models.base import BaseSSM
from cbfssm_tpu.ops import gp, transforms, vma
from cbfssm_tpu.ops.distributions import kl_diag_gaussians


@struct.dataclass
class CBFSSMHALFParams:
    gp_f: gp.SparseGPParams
    var_x_unc: Any  # [dim_x]
    var_y_unc: Any  # [dim_y]
    recog: Any  # flax recognition params ({} for 'output')


class CBFSSMHALF(BaseSSM):
    # loss-time fields this model reads (SweepTrainer whitelist); only
    # loss_factors[0] enters the ELBO (no entropy term)
    SWEEPABLE_HYPERS = frozenset({"loss_factors", "k_factor"})
    # parameter-only aux entries (not psum-ed by ParticleParallel)
    REPLICATED_AUX = frozenset({"kl_z_f", "global_term", "particle_divisor"})

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
        kind = self.config.recog_model if self.config.recog_model else "rnn"
        if kind == "conv":
            raise ValueError("CBFSSMHALF supports 'output' and 'rnn' recognition")
        self.recog_kind = kind
        self.recog_module = recognition.make_recognition(kind, self.dim_x, self.dtype)

    def init(self, key) -> CBFSSMHALFParams:
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
            dummy = jnp.zeros(
                (1, cfg.recog_len, self.dim_u + self.dim_y), dtype=self.dtype
            )
            recog_params = self.recog_module.init(kr, dummy)
        return CBFSSMHALFParams(
            gp_f=gp_f,
            var_x_unc=self._noise_unc(cfg.var_x),
            var_y_unc=self._noise_unc(cfg.var_y),
            recog=recog_params,
        )

    def var_dict(self, params) -> dict:
        return {
            "process noise": transforms.positive(params.var_x_unc),
            "observation noise": transforms.positive(params.var_y_unc),
            "kernel lengthscales f": params.gp_f.kern_len,
            "kernel variance f": params.gp_f.kern_var,
            "IP pos f": params.gp_f.z,
            "IP mean f": params.gp_f.mean,
            "IP var f": params.gp_f.var,
        }

    def _initial_state(self, params, u, y):
        """x_0 [B, S, dim_x] from the recognition model over the first
        recog_len steps (cbfssmhalf.py:64-95)."""
        if self.recog_module is None:
            x0 = recognition.output_recognition(
                jnp.asarray(y, dtype=self.dtype), self.dim_x
            )
        else:
            uy = jnp.concatenate(
                (jnp.asarray(u, dtype=self.dtype), jnp.asarray(y, dtype=self.dtype)),
                axis=-1,
            )[:, : self.config.recog_len, :]
            x0 = self.recog_module.apply(params.recog, uy)
        return jnp.broadcast_to(x0[:, None, :], (x0.shape[0], self.samples, self.dim_x))

    def _transition(self, cache_f, var_x, var_y, b, s):
        """The conditioned-transition scan body, shared by the training
        rollout and the streaming-filter entry points (filter_step /
        forecast) so their per-step math is identical by construction."""
        dx, dy = self.dim_x, self.dim_y
        k_factor = jnp.asarray(self.config.k_factor, dtype=self.dtype)

        def pad_h(a):
            return jnp.pad(a, ((0, 0), (0, 0), (0, dx - dy)))

        def step(x, inp):
            u_t, y_next, eps_t, cond_t = inp
            u_bs = jnp.broadcast_to(u_t[:, None, :], (b, s, self.dim_u))
            gp_in = jnp.concatenate((x, u_bs), axis=-1).reshape(b * s, -1)
            fmean, fvar = self._gp_predict(cache_f, gp_in)
            fmean = fmean.reshape(b, s, dx) + x
            fvar = fvar.reshape(b, s, dx) + var_x

            fvar_o = fvar[..., :dy]
            var_y_t = var_y + (k_factor - 1.0) * fvar_o
            gain = fvar_o / (var_y_t + fvar_o)
            y_bs = jnp.broadcast_to(y_next[:, None, :], (b, s, dy))
            mu = fmean + pad_h(gain * (y_bs - fmean[..., :dy]))
            sig = jnp.square(1.0 - pad_h(gain)) * fvar + pad_h(
                jnp.square(gain) * var_y_t
            )

            mu_used = jnp.where(cond_t, mu, fmean)
            sig_used = jnp.where(cond_t, sig, fvar)
            x_next = mu_used + eps_t * jnp.sqrt(sig_used)

            kl_t = kl_diag_gaussians(mu, sig, fmean, fvar, axis=(1, 2))
            kl_t = jnp.where(cond_t, kl_t, 0.0)
            return x_next, (x_next, kl_t)

        return step

    def _rollout(self, params, u, y, key, condition: bool):
        var_x = transforms.positive(params.var_x_unc)
        var_y = transforms.positive(params.var_y_unc)
        cache_f = gp.precompute(params.gp_f, self.jitter)
        u_tm, y_tm = self._time_major(u), self._time_major(y)
        t_len, b = u_tm.shape[0], u_tm.shape[1]
        s = self.samples

        eps = self._shared_eps(key, (t_len - 1, b, s), self.dtype)
        cond_mask = jnp.asarray(
            segmentation.forward_condition_mask(t_len, self.config.recog_len)
        )
        if condition:
            cond_mask = jnp.ones_like(cond_mask)

        step = self._transition(cache_f, var_x, var_y, b, s)
        x0 = vma.match_vma(self._initial_state(params, u, y), eps, u_tm, y_tm)
        inputs = (u_tm[:-1], y_tm[1:], eps, cond_mask)
        _, (x_rest, kl_steps) = jax.lax.scan(
            step, x0, inputs, unroll=self.config.scan_unroll
        )
        x_final = jnp.concatenate((x0[None], x_rest), axis=0)
        return x_final, jnp.sum(kl_steps, axis=0), (var_y, cache_f, y_tm)

    def loss(self, params, u, y, key, condition: bool = True, weights=None):
        """ELBO = (loglik - kl_x) * lambda_1 / samples - KL(zeta_f)
        (cbfssmhalf.py:174-196; no entropy term)."""
        cfg = self.config
        x_final, kl_x, (var_y, cache_f, y_tm) = self._rollout(params, u, y, key, condition)
        y_final = x_final[..., : self.dim_y]
        loglik = self._loglik(y_final, y_tm, var_y[: self.dim_y])
        if weights is None:
            weights = jnp.ones(y_tm.shape[1], dtype=self.dtype)
        lam1 = jnp.asarray(cfg.loss_factors[0], dtype=self.dtype)
        kl_zf = gp.prior_kl(params.gp_f, cache_f)
        particle_sum = lam1 * jnp.dot(loglik - kl_x, weights, precision=jax.lax.Precision.HIGHEST)
        global_term = -kl_zf
        elbo = particle_sum / self.samples + global_term
        aux = {
            "loglik": jnp.dot(loglik, weights, precision=jax.lax.Precision.HIGHEST),
            "kl_x": jnp.dot(kl_x, weights, precision=jax.lax.Precision.HIGHEST),
            "kl_z_f": kl_zf,
            "particle_sum": particle_sum,
            "particle_divisor": jnp.asarray(float(self.samples), dtype=self.dtype),
            "global_term": global_term,
        }
        return -elbo, aux

    def predict(self, params, u, y, key, condition: bool = False):
        x_final, _, (var_y, _, y_tm) = self._rollout(params, u, y, key, condition)
        return self._prediction_stats(x_final, y_tm, var_y)

    # --- streaming/online filtering (serving.StreamingFilter) -----------

    def filter_ops(self, params):
        """(cache_f, var_x, var_y): the loop-invariant operators a
        streaming consumer precomputes once per parameter set."""
        return (
            gp.precompute(params.gp_f, self.jitter),
            transforms.positive(params.var_x_unc),
            transforms.positive(params.var_y_unc),
        )

    def filter_init(self, params, u_prefix, y_prefix):
        """Particle ensemble x_0 [B, S, dim_x] from a warmup window via
        the recognition model (the same initial state training uses)."""
        return self._initial_state(params, u_prefix, y_prefix)

    def filter_step(self, params, ops, x, u_prev, y_new, key, eps=None):
        """One ONLINE conditioned transition of the particle ensemble.

        The conditioning update touches only the observed dims (the
        zero-pad-for-hidden form, reference cbfssmhalf.py:147-155), so
        it is valid with exactly the information a deployed estimator
        has: the applied control ``u_prev`` [B, du] and the arriving
        observation ``y_new`` [B, dy]. Identical per-step math to the
        training rollout (shared ``_transition`` body; pinned by test).

        ``eps`` overrides the shared-across-dims particle noise draw
        ([B, S, 1]; tests use it to pin equality with the rollout).
        Returns (x_next [B, S, dx], (mean [B, dy], var [B, dy])) where
        mean/var are the filtered observation-space moments (particle
        moments + observation noise).
        """
        cache_f, var_x, var_y = ops
        b, s = x.shape[0], x.shape[1]
        if eps is None:
            eps = self._shared_eps(key, (b, s), self.dtype)
        step = self._transition(cache_f, var_x, var_y, b, s)
        x_next, _ = step(x, (u_prev, y_new, eps, jnp.asarray(True)))
        y_part = x_next[..., : self.dim_y]
        mean = jnp.mean(y_part, axis=1)
        var = jnp.mean(jnp.square(y_part - mean[:, None, :]), axis=1) + var_y
        return x_next, (mean, var)

    def forecast(self, params, ops, x, u_future, key):
        """Free-run rollout from the current ensemble (no conditioning —
        the deployed analogue of Outputs' condition=False prediction).

        u_future: [B, H, du] -> (mean [B, H, dy], var [B, H, dy]);
        the caller's ensemble is NOT advanced.
        """
        cache_f, var_x, var_y = ops
        b, s = x.shape[0], x.shape[1]
        u_tm = jnp.transpose(jnp.asarray(u_future, dtype=self.dtype), (1, 0, 2))
        h = u_tm.shape[0]
        eps = self._shared_eps(key, (h, b, s), self.dtype)
        step = self._transition(cache_f, var_x, var_y, b, s)
        y_dummy = jnp.zeros((h, b, self.dim_y), dtype=self.dtype)
        cond = jnp.zeros((h,), dtype=bool)
        _, (x_path, _) = jax.lax.scan(
            step, x, (u_tm, y_dummy, eps, cond), unroll=self.config.scan_unroll
        )
        y_part = x_path[..., : self.dim_y]  # [H, B, S, dy]
        mean = jnp.mean(y_part, axis=2)
        var = jnp.mean(jnp.square(y_part - mean[:, :, None, :]), axis=2) + var_y
        return jnp.transpose(mean, (1, 0, 2)), jnp.transpose(var, (1, 0, 2))

    # filter_replay — the fused K-step backlog catch-up — is inherited
    # from BaseSSM: its scan body is this class's filter_step, so the
    # per-step math is shared by construction.

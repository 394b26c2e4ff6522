"""CBF-SSM: conditional backward/forward state-space model (flagship).

Re-design of the reference graph (cbfssm/model/cbfssm.py:15-277) as two
``lax.scan`` programs:

* Backward (recognition) pass — the reference runs the full reverse-time
  loop TWICE, once per segment phase (cbfssm.py:92-93). Here the two
  runs are a leading axis of size 2 *inside one scan*: both phases step
  together, their GP queries merge into a single [2*B*S, M] MXU matmul
  batch, and per-step write/resample conditions become precomputed
  boolean masks (cbfssm_tpu.models.segmentation). This halves the
  sequential depth and doubles the matmul width vs. a literal
  translation.

* Forward (generative/conditioning) pass — one scan over transitions
  with the Kalman-style k-factor conditioning update, shared-across-dims
  particle noise, and the per-step conditioning KL, exactly as in
  cbfssm.py:185-237.

All per-step GP predictions are solve-free (cached K^-1 operators,
see cbfssm_tpu.ops.gp). ELBO assembly follows cbfssm.py:239-262.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from cbfssm_tpu.models import adjoint, segmentation
from cbfssm_tpu.models.base import LOG_2PI_E, BaseSSM
from cbfssm_tpu.ops import gp, transforms, vma


@struct.dataclass
class CBFSSMParams:
    gp_f: gp.SparseGPParams  # forward dynamics GP: dim_x + dim_u -> dim_x
    gp_b: gp.SparseGPParams  # backward recognition GP: dim_x + dim_u -> dim_x - dim_y
    var_x_unc: Any  # [dim_x] unconstrained process noise
    var_y_unc: Any  # [dim_x] unconstrained observation noise


class CBFSSM(BaseSSM):
    # loss-time continuous config fields this model actually reads
    # (sweepable via training.sweep.SweepTrainer)
    SWEEPABLE_HYPERS = frozenset({"loss_factors", "k_factor"})
    SUPPORTED_ADJOINTS = frozenset({"auto", "autodiff", "hand"})
    # aux entries that are functions of the (replicated) parameters only
    # — parallel.ParticleParallel must NOT psum these across shards
    REPLICATED_AUX = frozenset(
        {"kl_z_f", "kl_z_b", "global_term", "particle_divisor"}
    )

    def __init__(self, config):
        super().__init__(config)
        self.dim_x = int(self.config.dim_x)
        self.dim_h = self.dim_x - self.dim_y  # unobserved latent dims
        if self.dim_h < 0:
            raise ValueError("dim_x must be >= dim_y")
        self._check_noise_lengths(var_x=self.dim_x, var_y=self.dim_x)

    # --- parameters ----------------------------------------------------

    def init(self, key) -> CBFSSMParams:
        cfg = self.config
        kf, kb = jax.random.split(key)
        gp_kwargs = dict(
            num_points=cfg.ind_pnt_num,
            gp_var=cfg.gp_var,
            gp_len=cfg.gp_len,
            zeta_mean=cfg.zeta_mean,
            zeta_pos=cfg.zeta_pos,
            zeta_var=cfg.zeta_var,
            dtype=self.dtype,
        )
        return CBFSSMParams(
            gp_f=gp.init_sparse_gp(kf, self.dim_x + self.dim_u, self.dim_x, **gp_kwargs),
            gp_b=gp.init_sparse_gp(kb, self.dim_x + self.dim_u, self.dim_h, **gp_kwargs),
            var_x_unc=self._noise_unc(cfg.var_x),
            var_y_unc=self._noise_unc(cfg.var_y),
        )

    def var_dict(self, params: CBFSSMParams) -> dict:
        """Named hyper/variational parameters (parity with the reference
        var_dump, cbfssm.py:56-67)."""
        return {
            "process noise": transforms.positive(params.var_x_unc),
            "observation noise": transforms.positive(params.var_y_unc),
            "kernel lengthscales f": params.gp_f.kern_len,
            "kernel variance f": params.gp_f.kern_var,
            "IP pos f": params.gp_f.z,
            "IP mean f": params.gp_f.mean,
            "IP var f": params.gp_f.var,
            "kernel lengthscales b": params.gp_b.kern_len,
            "kernel variance b": params.gp_b.kern_var,
            "IP pos b": params.gp_b.z,
            "IP mean b": params.gp_b.mean,
            "IP var b": params.gp_b.var,
        }

    def _scan_static(self) -> adjoint.ScanStatic:
        return adjoint.ScanStatic(self._gp_precision, self.config.scan_unroll)

    # --- backward (recognition) pass ------------------------------------

    def _backward(self, cache_b, var_x, u_tm, y_tm, key):
        """Two-phase reverse-time recognition sampling.

        u_tm: [T, B, du], y_tm: [T, B, dy] ->
        (y_tilde [T, B, S, dx], entropy [B])

        Dispatches between the reference-shaped sequential scan and the
        block-parallel schedule (see segmentation.blocked_layout).
        Note: only the blocked schedule carries the opt-in hand adjoint
        (_backward_blocked checks self._hand_adjoint); the sequential
        scan differentiates via autodiff — a tested hybrid (gradient
        equality pinned in tests/test_adjoint.py for both modes), see
        the config.adjoint scope note.
        """
        mode = self.config.backward_mode
        t_len = u_tm.shape[0]
        if mode == "auto":
            mode = (
                "blocked"
                if t_len > 2 * self.config.recog_len and self.dim_h > 0
                else "sequential"
            )
        if mode == "blocked":
            return self._backward_blocked(cache_b, var_x, u_tm, y_tm, key)
        return self._backward_sequential(cache_b, var_x, u_tm, y_tm, key)

    def _backward_sequential(self, cache_b, var_x, u_tm, y_tm, key):
        t_len, b = u_tm.shape[0], u_tm.shape[1]
        s, dh = self.samples, self.dim_h
        dtype = self.dtype

        k_noise, k_eps = jax.random.split(key)
        noise = self._shared_eps(k_noise, (t_len, 2, b, s), dtype)
        eps = self._shared_eps(k_eps, (t_len, 2, b, s), dtype)

        resample_np, write0_np = segmentation.backward_masks(t_len, self.config.recog_len)
        resample = jnp.asarray(resample_np)  # [T, 2]
        write0 = jnp.asarray(write0_np)  # [T]

        def step(h, inp):
            u_t, y_t, res_t, w0_t, noise_t, eps_t = inp
            h_in = jnp.where(res_t[:, None, None, None], noise_t, h)  # [2, B, S, dh]
            uy = jnp.broadcast_to(
                jnp.concatenate((u_t, y_t), axis=-1)[None, :, None, :],
                (2, b, s, self.dim_u + self.dim_y),
            )
            gp_in = jnp.concatenate((h_in, uy), axis=-1)  # [2, B, S, dx+duy]
            # batch-major flatten: keeps the GP matmul rows sharded on a
            # data mesh (see gp.predict_rows); bitwise = layout flatten
            fmean, fvar = gp.predict_rows(self._gp_predict, cache_b, gp_in, 1)
            fmean = fmean + h_in  # residual transition
            fvar = fvar + var_x[:dh]
            out = fmean + eps_t * jnp.sqrt(fvar)
            y2_t = jnp.where(w0_t, out[0], out[1])  # writing run's sample
            ent_run = 0.5 * jnp.sum(LOG_2PI_E + jnp.log(fvar), axis=(2, 3))  # [2, B]
            ent_t = jnp.where(w0_t, ent_run[0], ent_run[1])  # [B]
            return out, (y2_t, ent_t)

        h0 = vma.zeros_matching((2, b, s, dh), dtype, noise, u_tm, y_tm)
        inputs = (
            jnp.flip(u_tm, 0),
            jnp.flip(y_tm, 0),
            jnp.flip(resample, 0),
            jnp.flip(write0, 0),
            jnp.flip(noise, 0),
            jnp.flip(eps, 0),
        )
        _, (y2_rev, ent_rev) = jax.lax.scan(
            step, h0, inputs, unroll=self.config.scan_unroll
        )
        y2 = jnp.flip(y2_rev, 0)  # [T, B, S, dh]
        entropy = jnp.sum(ent_rev, axis=0)  # [B]

        y_obs = jnp.broadcast_to(y_tm[:, :, None, :], (t_len, b, s, self.dim_y))
        y_tilde = jnp.concatenate((y_obs, y2), axis=-1)  # [T, B, S, dx]
        return y_tilde, entropy

    def _backward_blocked(self, cache_b, var_x, u_tm, y_tm, key):
        """Block-parallel backward: all 2L-length segments of both runs
        advance together (segments are independent — each begins with a
        fresh resample; the t = T-1 entry state is the zero init, forced
        by a reset mask). Sequential depth: 2L instead of T; the GP
        batch per step widens to [2 * n_blocks * B * S, M].

        Numerically identical to the sequential schedule (the noise
        arrays are indexed by each run's shifted time t'' = t + shift_r;
        validated against the literal per-timestep reimplementation)."""
        t_len, b = u_tm.shape[0], u_tm.shape[1]
        s, dh = self.samples, self.dim_h
        dtype = self.dtype
        recog_len = self.config.recog_len
        two_l = 2 * recog_len
        t_ext, n_blocks, shifts = segmentation.blocked_layout(t_len, recog_len)

        k_noise, k_eps = jax.random.split(key)
        noise = self._shared_eps(k_noise, (t_ext, 2, b, s), dtype)
        eps = self._shared_eps(k_eps, (t_ext, 2, b, s), dtype)

        def shift_stack(a):
            """[T, ...] -> [2, t_ext, ...]: run r's view padded by its
            shift at the bottom and to t_ext at the top (zeros)."""
            pads = []
            for s_r in shifts:
                widths = [(s_r, t_ext - t_len - s_r)] + [(0, 0)] * (a.ndim - 1)
                pads.append(jnp.pad(a, widths))
            return jnp.stack(pads, axis=0)

        u_sh = shift_stack(u_tm)  # [2, t_ext, B, du]
        y_sh = shift_stack(y_tm)  # [2, t_ext, B, dy]

        # reset-to-zero positions: run r enters absolute t = T-1 (shifted
        # t'' = T-1+s_r) with the zero initial hidden state.
        zero_idx = jnp.asarray([t_len - 1 + s_r for s_r in shifts])  # [2]
        t_dd = jnp.arange(t_ext)
        zmask = t_dd[None, :] == zero_idx[:, None]  # [2, t_ext]

        def to_steps(a, lead_run_axis):
            """[2, t_ext, ...] (or [t_ext, 2, ...]) -> [two_l, 2, K, ...]
            with the step axis DESCENDING in t' (scan order)."""
            if not lead_run_axis:
                a = jnp.moveaxis(a, 1, 0)  # [2, t_ext, ...]
            a = a.reshape((2, n_blocks, two_l) + a.shape[2:])
            a = jnp.moveaxis(a, 2, 0)  # [two_l, 2, K, ...]
            return jnp.flip(a, 0)

        inputs = (
            to_steps(u_sh, True),
            to_steps(y_sh, True),
            to_steps(zmask, True),
            to_steps(noise, False),
            to_steps(eps, False),
            jnp.flip(jnp.arange(two_l) == two_l - 1),  # resample at block top
        )

        h0 = vma.zeros_matching((2, n_blocks, b, s, dh), dtype, noise, u_tm, y_tm)
        if self._hand_adjoint:
            outs_rev, ent_rev = adjoint.backward_scan(
                self._scan_static(), cache_b, var_x[:dh], h0, *inputs
            )
        else:
            step = adjoint.backward_step(
                cache_b, var_x[:dh],
                (2, n_blocks, b, s, dh, self.dim_u + self.dim_y),
                self._gp_predict,
            )
            _, (outs_rev, ent_rev) = jax.lax.scan(
                step, h0, inputs, unroll=self.config.scan_unroll
            )
        # [two_l, 2, K, ...] (descending t') -> [2, t_ext, ...]
        outs = jnp.flip(outs_rev, 0)
        ents = jnp.flip(ent_rev, 0)
        outs = jnp.moveaxis(outs, 0, 2).reshape((2, t_ext, b, s, dh))
        ents = jnp.moveaxis(ents, 0, 2).reshape((2, t_ext, b))

        # un-shift each run and select the writing run per absolute t
        _, write0_np = segmentation.backward_masks(t_len, recog_len)
        write0 = jnp.asarray(write0_np)[:, None, None, None]  # [T,1,1,1]
        y2_runs = [outs[r, s_r : s_r + t_len] for r, s_r in enumerate(shifts)]
        ent_runs = [ents[r, s_r : s_r + t_len] for r, s_r in enumerate(shifts)]
        y2 = jnp.where(write0, y2_runs[0], y2_runs[1])  # [T, B, S, dh]
        entropy = jnp.sum(
            jnp.where(write0[:, :, 0, 0], ent_runs[0], ent_runs[1]), axis=0
        )  # [B]

        y_obs = jnp.broadcast_to(y_tm[:, :, None, :], (t_len, b, s, self.dim_y))
        return jnp.concatenate((y_obs, y2), axis=-1), entropy

    # --- forward (generative) pass --------------------------------------

    def _forward(self, cache_f, var_x, var_y, y_tilde, u_tm, key, condition: bool):
        """Conditioned particle rollout.

        y_tilde: [T, B, S, dx], u_tm: [T, B, du] ->
        (x_final [T, B, S, dx], kl_x [B])
        """
        t_len, b = u_tm.shape[0], u_tm.shape[1]
        s, dx = self.samples, self.dim_x
        k_factor = jnp.asarray(self.config.k_factor, dtype=self.dtype)

        eps = self._shared_eps(key, (t_len - 1, b, s), self.dtype)
        cond_mask = jnp.asarray(
            segmentation.forward_condition_mask(t_len, self.config.recog_len)
        )
        if condition:
            cond_mask = jnp.ones_like(cond_mask)

        x0 = y_tilde[0]
        inputs = (u_tm[:-1], y_tilde[1:], eps, cond_mask)
        if self._hand_adjoint:
            x_rest, kl_steps = adjoint.forward_scan(
                self._scan_static(), cache_f, var_x, var_y, k_factor, x0,
                *inputs,
            )
        else:
            step = adjoint.forward_step(
                cache_f, var_x, var_y, k_factor, (b, s, dx, self.dim_u),
                self._gp_predict,
            )
            _, (x_rest, kl_steps) = jax.lax.scan(
                step, x0, inputs, unroll=self.config.scan_unroll
            )
        x_final = jnp.concatenate((x0[None], x_rest), axis=0)  # [T, B, S, dx]
        return x_final, jnp.sum(kl_steps, axis=0)

    # --- ELBO ----------------------------------------------------------

    def _rollout(self, params: CBFSSMParams, u, y, key, condition: bool):
        var_x = transforms.positive(params.var_x_unc)
        var_y = transforms.positive(params.var_y_unc)
        # one batched factorization chain for both GPs (latency-bound
        # small-matrix linalg; see gp.precompute_pair)
        cache_f, cache_b = gp.precompute_pair(params.gp_f, params.gp_b, self.jitter)
        u_tm, y_tm = self._time_major(u), self._time_major(y)
        kb, kf = jax.random.split(key)
        y_tilde, entropy = self._backward(cache_b, var_x, u_tm, y_tm, kb)
        x_final, kl_x = self._forward(cache_f, var_x, var_y, y_tilde, u_tm, kf, condition)
        return x_final, kl_x, entropy, (var_x, var_y, cache_f, cache_b, y_tm)

    def loss(self, params: CBFSSMParams, u, y, key, condition: bool = True, weights=None):
        """Negative ELBO (cbfssm.py:239-262): per-sequence terms are
        weighted (pad masking) and summed; inducing-point KLs are global.
        Returns (loss, aux)."""
        cfg = self.config
        x_final, kl_x, entropy, (var_x, var_y, cache_f, cache_b, y_tm) = self._rollout(
            params, u, y, key, condition
        )
        y_final = x_final[..., : self.dim_y]
        loglik = self._loglik(y_final, y_tm, var_y[: self.dim_y])  # [B]

        if weights is None:
            weights = jnp.ones(y_tm.shape[1], dtype=self.dtype)
        lam1, lam2 = [jnp.asarray(f, dtype=self.dtype) for f in cfg.loss_factors[:2]]
        kl_zf = gp.prior_kl(params.gp_f, cache_f)
        kl_zb = gp.prior_kl(params.gp_b, cache_b)
        per_seq = lam1 * (loglik - kl_x) + lam2 * entropy
        particle_sum = jnp.dot(per_seq, weights, precision=jax.lax.Precision.HIGHEST)
        global_term = -kl_zf - kl_zb
        elbo = particle_sum / self.samples + global_term
        aux = {
            "loglik": jnp.dot(loglik, weights, precision=jax.lax.Precision.HIGHEST),
            "kl_x": jnp.dot(kl_x, weights, precision=jax.lax.Precision.HIGHEST),
            "entropy": jnp.dot(entropy, weights, precision=jax.lax.Precision.HIGHEST),
            "kl_z_f": kl_zf,
            "kl_z_b": kl_zb,
            # ELBO decomposition for particle-parallel recombination:
            # elbo = psum(particle_sum) / S_total + global_term
            "particle_sum": particle_sum,
            "particle_divisor": jnp.asarray(float(self.samples), dtype=self.dtype),
            "global_term": global_term,
        }
        return -elbo, aux

    def predict(self, params: CBFSSMParams, u, y, key, condition: bool = False):
        """Prediction statistics; with ``condition=False`` the rollout is
        free-running after the recognition prefix (reference
        outputs.py:61-141 evaluation semantics)."""
        x_final, _, _, (_, var_y, _, _, y_tm) = self._rollout(params, u, y, key, condition)
        return self._prediction_stats(x_final, y_tm, var_y)

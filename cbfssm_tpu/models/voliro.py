"""Voliro: physics + GP hybrid model of an overactuated drone.

Capability parity with reference cbfssm/model/voliro.py:10-343:

* control mapping: per-rotor (sin tilt, cos tilt) * pwm^2 -> 12 local
  coordinates (:88-95); a fixed 6x12 allocation matrix maps them to
  body-frame force/torque (:97-104, :295-312);
* a sparse GP corrects the *force* (first 3 dims) with learned GP noise
  var_z; the correction is sampled once per (batch, time, particle)
  shared across the 6 force/torque dims (:106-123) — computed for ALL
  timesteps in ONE batched GP predict (a [B*T, M] MXU matmul), exactly
  the layout a TPU wants;
* forward dynamics is a deterministic symplectic-Euler rigid-body
  integrator over [pos(3), quat(4), linvel(3), angvel(3)] (:314-338),
  not a GP; process noise var_x provides the transition variance;
* a single-run backward pass (no segmenting/resampling) conditions on
  [h(6), ft_gp(6), observed pos+quat(7)] (:139-186);
* the ELBO adds Beta priors on GP noise and lengthscales (:244-292).

dt is inferred from the time channel (u[..., 12]) of the first sequence
in the batch (:44-45).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from cbfssm_tpu.models.base import LOG_2PI_E, BaseSSM, moments_over_samples
from cbfssm_tpu.ops import gp, parallel_vjp, quaternion, transforms, vma
from cbfssm_tpu.ops.distributions import beta_logpdf, kl_diag_gaussians


def allocation_matrix() -> np.ndarray:
    """6x12 rotor-geometry allocation matrix (voliro.py:295-312): columns
    alternate (sin, cos) components per rotor; rows are [fx, fy, fz,
    tx, ty, tz]."""
    angles = np.asarray([0.5, -0.5, -1.0 / 6.0, 5.0 / 6.0, 1.0 / 6.0, 7.0 / 6.0]) * math.pi
    arm_length = 0.3
    a = np.zeros((6, 12))
    for i, ang in enumerate(angles):
        a[0, 2 * i] = -math.cos(ang)
        a[1, 2 * i] = -math.sin(ang)
        a[2, 2 * i + 1] = -1.0
        a[3, 2 * i + 1] = -arm_length * math.cos(ang)
        a[4, 2 * i + 1] = -arm_length * math.sin(ang)
        a[5, 2 * i] = -arm_length
    return a


@struct.dataclass
class VoliroParams:
    gp_f: gp.SparseGPParams  # force correction GP: 12 -> 3
    gp_b: gp.SparseGPParams  # backward GP: 19 -> 6
    var_x_unc: Any  # [13]
    var_y_unc: Any  # [13]
    var_z_unc: Any  # [6] GP force/torque noise


class Voliro(BaseSSM):
    # loss-time fields this model reads (SweepTrainer whitelist):
    # Voliro uses loglik_factor + Beta priors, not loss_factors/k_factor
    SWEEPABLE_HYPERS = frozenset({"loglik_factor", "n_beta", "l_beta"})
    SUPPORTED_ADJOINTS = frozenset({"auto", "autodiff", "parallel"})
    # parameter-only aux entries (not psum-ed by ParticleParallel)
    REPLICATED_AUX = frozenset(
        {"kl_z_f", "kl_z_b", "n_reg", "l_reg", "global_term",
         "particle_divisor"}
    )

    # Fixed physical dimensions (voliro.py:13-18).
    GP_DIM_IN_F = 12
    GP_DIM_OUT_F = 3
    GP_DIM_IN_B = 19
    GP_DIM_OUT_B = 6
    DIM_Y = 7  # pos(3) + quat(4)
    DIM_X = 13

    ROTOR_FORCE_CONSTANT = 0.000012
    ROTOR_SPEED_MAX = 1700.0
    MASS = 4.04
    INERTIA = (0.078359127, 0.081797886, 0.1533554115)
    GRAVITY = (0.0, 0.0, 9.81)

    def __init__(self, config):
        super().__init__(config)
        self.dim_x = self.DIM_X
        # The model's observation space is the 7-dim hidden projection of
        # the 22-dim dataset output (out_to_hidden, voliro.py:340-343).
        self.model_dim_y = self.DIM_Y
        self.alloc = jnp.asarray(allocation_matrix(), dtype=self.dtype)
        self.post_scale = self.ROTOR_FORCE_CONSTANT * self.ROTOR_SPEED_MAX**2
        self.mass_inv = 1.0 / self.MASS
        self.inertia_inv = jnp.asarray([1.0 / i for i in self.INERTIA], dtype=self.dtype)
        self.gravity = jnp.asarray(self.GRAVITY, dtype=self.dtype)
        self._check_noise_lengths(var_x=self.DIM_X, var_y=self.DIM_X, var_z=6)

    def init(self, key) -> VoliroParams:
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
        return VoliroParams(
            gp_f=gp.init_sparse_gp(kf, self.GP_DIM_IN_F, self.GP_DIM_OUT_F, **gp_kwargs),
            gp_b=gp.init_sparse_gp(kb, self.GP_DIM_IN_B, self.GP_DIM_OUT_B, **gp_kwargs),
            var_x_unc=self._noise_unc(cfg.var_x),
            var_y_unc=self._noise_unc(cfg.var_y),
            var_z_unc=self._noise_unc(cfg.var_z),
        )

    def var_dict(self, params) -> dict:
        return {
            "process noise": transforms.positive(params.var_x_unc),
            "observation noise": transforms.positive(params.var_y_unc),
            "gp noise": transforms.positive(params.var_z_unc),
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

    # --- physics --------------------------------------------------------

    @staticmethod
    def out_to_hidden(y):
        """Dataset observation [..., 22] -> model observation [..., 7]:
        position (0:3) and quaternion (12:16) (voliro.py:340-343)."""
        return jnp.concatenate((y[..., 0:3], y[..., 12:16]), axis=-1)

    def local_coordinates(self, u):
        """u [..., 13] -> 12 local rotor coordinates
        (sin tilt_k, cos tilt_k) * pwm_k^2 (voliro.py:88-95)."""
        pwm, tilt = u[..., :6], u[..., 6:12]
        fac = jnp.square(pwm)
        sin_part = jnp.sin(tilt) * fac
        cos_part = jnp.cos(tilt) * fac
        # interleave: [s0, c0, s1, c1, ...]
        stacked = jnp.stack((sin_part, cos_part), axis=-1)
        return stacked.reshape(u.shape[:-1] + (12,))

    def physical_model(self, local_coo):
        """Allocation-matrix force/torque [..., 6] (voliro.py:97-104)."""
        # HIGHEST explicitly: forces/torques feed the integrator and the
        # GP residual target; the default TPU matmul precision (bf16
        # passes) would swamp them (same rationale as ops/kernels.py)
        ft = jnp.einsum(
            "ij,...j->...i", self.alloc, local_coo,
            precision=jax.lax.Precision.HIGHEST,
        )
        return ft * self.post_scale

    def infer_dt(self, u):
        """dt from the time channel of the first batch sequence
        (voliro.py:44-45)."""
        ts = u[0, :, 12]
        return (ts[-1] - ts[0]) / ts.shape[0]

    def symplectic_euler(self, x, force_torque, dt):
        """One symplectic-Euler step of the rigid body (voliro.py:314-338).
        x: [..., 13], force_torque: [..., 6]."""
        pos, rot = x[..., 0:3], x[..., 3:7]
        linvel, angvel = x[..., 7:10], x[..., 10:13]

        f_glob = quaternion.rotate_vector(force_torque[..., :3], rot)
        t_glob = quaternion.rotate_vector(self.inertia_inv * force_torque[..., 3:], rot)

        linvel = linvel + (self.mass_inv * f_glob + self.gravity) * dt
        angvel = angvel + t_glob * dt

        rot_diff = 0.5 * quaternion.multiply(quaternion.from_vector(angvel), rot)
        pos = pos + linvel * dt
        rot = quaternion.normalize(rot + rot_diff * dt)
        return jnp.concatenate((pos, rot, linvel, angvel), axis=-1)

    # --- GP force correction -------------------------------------------

    def gp_forces(self, cache_f, var_z, u_bt, key):
        """Batched force/torque distribution + particle samples for all
        timesteps at once (voliro.py:106-123).

        u_bt: [B, T, 13] -> (ft_gp [B, T, S, 6], ft_mean [B, T, 6],
        ft_var [B, T, 6], force_torque [B, T, 6])
        """
        b, t = u_bt.shape[0], u_bt.shape[1]
        local_coo = self.local_coordinates(u_bt)
        force_torque = self.physical_model(local_coo)

        # routed through the config knobs (gp_impl / gp_matmul_precision)
        # like every other model-side predict; default config is the
        # solve-free HIGHEST path, unchanged
        fmean, fvar = self._gp_predict(
            cache_f, local_coo.reshape(b * t, self.GP_DIM_IN_F)
        )
        fmean = fmean.reshape(b, t, self.GP_DIM_OUT_F) + force_torque[..., :3]
        fvar = fvar.reshape(b, t, self.GP_DIM_OUT_F)
        ft_mean = jnp.concatenate((fmean, force_torque[..., 3:]), axis=-1)
        ft_var = jnp.concatenate((fvar, jnp.zeros_like(force_torque[..., 3:])), axis=-1)
        ft_var = ft_var + var_z

        eps = self._shared_eps(key, (b, t, self.samples), self.dtype)  # [B,T,S,1]
        ft_gp = ft_mean[:, :, None, :] + eps * jnp.sqrt(ft_var[:, :, None, :])
        return ft_gp, ft_mean, ft_var, force_torque

    # --- backward pass --------------------------------------------------

    def _backward(self, cache_b, ft_gp_tm, yh_tm, key):
        """Single-run reverse-time recognition (voliro.py:139-186): input
        [h(6), ft_gp(6), y_hidden(7)], residual on h, NO var_x added.

        ft_gp_tm: [T, B, S, 6], yh_tm: [T, B, 7] ->
        (y_tilde [T, B, S, 13], entropy [B])
        """
        t_len, b = yh_tm.shape[0], yh_tm.shape[1]
        s, dh = self.samples, self.GP_DIM_OUT_B
        eps = self._shared_eps(key, (t_len, b, s), self.dtype)

        def step(cache, h, inp):
            ft_t, y_t, eps_t = inp
            y_bs = jnp.broadcast_to(y_t[:, None, :], (b, s, self.DIM_Y))
            gp_in = jnp.concatenate((h, ft_t, y_bs), axis=-1).reshape(b * s, -1)
            fmean, fvar = self._gp_predict(cache, gp_in)
            fmean = fmean.reshape(b, s, dh) + h
            fvar = fvar.reshape(b, s, dh)
            out = fmean + eps_t * jnp.sqrt(fvar)
            ent_t = 0.5 * jnp.sum(LOG_2PI_E + jnp.log(fvar), axis=(1, 2))  # [B]
            return out, (out, ent_t)

        h0 = vma.zeros_matching((b, s, dh), self.dtype, eps, ft_gp_tm, yh_tm)
        inputs = (jnp.flip(ft_gp_tm, 0), jnp.flip(yh_tm, 0), jnp.flip(eps, 0))
        if self._parallel_adjoint:
            # per-particle state (dh=6): latency-bound recursion, so the
            # log-depth reverse pays (ops/parallel_vjp.py)
            y2_rev, ent_rev = parallel_vjp.scan_outputs_vjp(
                step, cache_b, h0, inputs, self.config.scan_unroll
            )
        else:
            _, (y2_rev, ent_rev) = jax.lax.scan(
                lambda h, i: step(cache_b, h, i), h0, inputs,
                unroll=self.config.scan_unroll,
            )
        y2 = jnp.flip(y2_rev, 0)
        y_obs = jnp.broadcast_to(yh_tm[:, :, None, :], (t_len, b, s, self.DIM_Y))
        return jnp.concatenate((y_obs, y2), axis=-1), jnp.sum(ent_rev, axis=0)

    # --- forward pass ---------------------------------------------------

    def _forward(self, var_x, var_y, y_tilde, ft_gp_tm, dt, key):
        """Physics rollout with always-on conditioning (voliro.py:211-242)."""
        t_len, b = y_tilde.shape[0], y_tilde.shape[1]
        s, dx = self.samples, self.DIM_X
        eps = self._shared_eps(key, (t_len - 1, b, s), self.dtype)

        def step(consts, x, inp):
            var_x_c, var_y_c, dt_c = consts
            ft_t, y_next, eps_t = inp
            fmean = self.symplectic_euler(x, ft_t, dt_c)
            fvar = jnp.broadcast_to(var_x_c, (b, s, dx))

            gain = fvar / (var_y_c + fvar)
            mu = fmean + gain * (y_next - fmean)
            sig = jnp.square(1.0 - gain) * fvar + jnp.square(gain) * var_y_c
            x_next = mu + eps_t * jnp.sqrt(sig)

            kl_t = kl_diag_gaussians(mu, sig, fmean, fvar, axis=(1, 2))
            return x_next, (x_next, kl_t)

        x0 = y_tilde[0]
        consts = (var_x, var_y, dt)
        inputs = (ft_gp_tm[:-1], y_tilde[1:], eps)
        if self._parallel_adjoint:
            # per-particle state (dx=13): the physics+conditioning link
            # is tiny — log-depth reverse (ops/parallel_vjp.py)
            x_rest, kl_steps = parallel_vjp.scan_outputs_vjp(
                step, consts, x0, inputs, self.config.scan_unroll
            )
        else:
            _, (x_rest, kl_steps) = jax.lax.scan(
                lambda x, i: step(consts, x, i), x0, inputs,
                unroll=self.config.scan_unroll,
            )
        x_final = jnp.concatenate((x0[None], x_rest), axis=0)
        return x_final, jnp.sum(kl_steps, axis=0)

    # --- ELBO -----------------------------------------------------------

    def _rollout(self, params, u, y, key, condition: bool = True):
        del condition  # Voliro always conditions (voliro.py:224-235)
        var_x = transforms.positive(params.var_x_unc)
        var_y = transforms.positive(params.var_y_unc)
        var_z = transforms.positive(params.var_z_unc)
        # one batched factorization chain for both GPs (latency-bound
        # small-matrix linalg; see gp.precompute_pair)
        cache_f, cache_b = gp.precompute_pair(params.gp_f, params.gp_b, self.jitter)

        u_bt = jnp.asarray(u, dtype=self.dtype)
        y_bt = jnp.asarray(y, dtype=self.dtype)
        dt = self.infer_dt(u_bt)
        kz, kb, kf = jax.random.split(key, 3)

        ft_gp, ft_mean, ft_var, force_torque = self.gp_forces(
            cache_f, var_z, u_bt, kz
        )
        ft_gp_tm = jnp.transpose(ft_gp, (1, 0, 2, 3))  # [T, B, S, 6]
        yh_tm = self._time_major(self.out_to_hidden(y_bt))  # [T, B, 7]

        y_tilde, entropy = self._backward(cache_b, ft_gp_tm, yh_tm, kb)
        x_final, kl_x = self._forward(var_x, var_y, y_tilde, ft_gp_tm, dt, kf)
        extras = {
            "force_torque": force_torque,
            "ft_mean": ft_mean,
            "ft_var": ft_var,
            "var_x": var_x,
            "var_y": var_y,
            "var_z": var_z,
            "cache_f": cache_f,
            "cache_b": cache_b,
            "yh_tm": yh_tm,
        }
        return x_final, kl_x, entropy, extras

    def loss(self, params, u, y, key, condition: bool = True, weights=None):
        """ELBO with Beta priors (voliro.py:244-292)."""
        cfg = self.config
        x_final, kl_x, entropy, ex = self._rollout(params, u, y, key, condition)
        y_final = x_final[..., : self.DIM_Y]
        loglik = self._loglik(y_final, ex["yh_tm"], ex["var_y"][: self.DIM_Y])

        if weights is None:
            weights = jnp.ones(x_final.shape[1], dtype=self.dtype)
        kl_zf = gp.prior_kl(params.gp_f, ex["cache_f"])
        kl_zb = gp.prior_kl(params.gp_b, ex["cache_b"])

        n_a, n_b, n_scale = cfg.n_beta
        l_a, l_b, l_scale = cfg.l_beta
        n_reg = jnp.sum(beta_logpdf(ex["var_z"] / n_scale, n_a, n_b))
        l_reg = jnp.sum(beta_logpdf(params.gp_f.kern_len / l_scale, l_a, l_b))

        lam = [jnp.asarray(f, dtype=self.dtype) for f in cfg.loglik_factor[:3]]
        per_seq = lam[0] * (loglik - kl_x) + lam[1] * entropy
        particle_sum = jnp.dot(per_seq, weights, precision=jax.lax.Precision.HIGHEST)
        global_term = lam[2] * (n_reg + l_reg) - kl_zf - kl_zb
        elbo = particle_sum / self.samples + global_term
        aux = {
            "loglik": jnp.dot(loglik, weights, precision=jax.lax.Precision.HIGHEST),
            "kl_x": jnp.dot(kl_x, weights, precision=jax.lax.Precision.HIGHEST),
            "entropy": jnp.dot(entropy, weights, precision=jax.lax.Precision.HIGHEST),
            "kl_z_f": kl_zf,
            "kl_z_b": kl_zb,
            "n_reg": n_reg,
            "l_reg": l_reg,
            "particle_sum": particle_sum,
            "particle_divisor": jnp.asarray(float(self.samples), dtype=self.dtype),
            "global_term": global_term,
        }
        return -elbo, aux

    def predict(self, params, u, y, key, condition: bool = True):
        """Full-state prediction moments + var_y over all 13 dims
        (voliro.py:273-275), plus the force-model outputs used by the
        Voliro evaluation plots (outputs_voliro.py:27-35)."""
        x_final, _, _, ex = self._rollout(params, u, y, key, condition)
        x_bt = jnp.transpose(x_final, (1, 0, 2, 3))
        mean, var0 = moments_over_samples(x_bt)
        var = var0 + ex["var_y"]
        return {
            "pred_mean": mean,
            "pred_var": var,
            "force_torque": ex["force_torque"],
            "ft_mean": ex["ft_mean"],
            "ft_var": ex["ft_var"],
        }

    # --- streaming/online filtering (serving.StreamingFilter) -----------
    #
    # The trained model's asset is the physics + force-GP dynamics; its
    # TRAINING-time conditioning target y_tilde comes from the backward
    # smoother (reverse-time recognition over FUTURE observations,
    # voliro.py:139-186) and is therefore not computable online. The
    # deployment estimator below is the CAUSAL counterpart: the exact
    # training transition (local_coordinates -> allocation matrix ->
    # force-GP sample -> symplectic Euler, shared code paths) with the
    # Kalman-style conditioning restricted to the information a flying
    # vehicle actually has — the arriving pos(3)+quat(4) observation —
    # zero-gain on the hidden velocity dims (the CBFSSMHALF observed-
    # dims pattern, reference cbfssmhalf.py:147-155). This is standard
    # particle FILTERING under the learned dynamics, clearly distinct
    # from the training-time SMOOTHING; forecast (no conditioning) is
    # semantically exact free-run prediction under the trained model.

    def _filter_dt(self):
        dt = self.config.filter_dt
        if dt is None:
            raise ValueError(
                "Voliro online filtering needs config['filter_dt'] (the "
                "stream's uniform sampling period; training infers it "
                "from each sequence's time channel — infer_dt)"
            )
        dt = float(dt)
        if dt <= 0:
            raise ValueError(f"filter_dt must be positive, got {dt}")
        return dt

    def filter_ops(self, params):
        """Loop-invariant operators: (force-GP cache, var_x, var_y,
        var_z, dt). The backward GP is deliberately absent — it is the
        training-time smoother, unusable online."""
        return (
            gp.precompute(params.gp_f, self.jitter),
            transforms.positive(params.var_x_unc),
            transforms.positive(params.var_y_unc),
            transforms.positive(params.var_z_unc),
            jnp.asarray(self._filter_dt(), dtype=self.dtype),
        )

    def filter_init(self, params, u_prefix, y_prefix):
        """Ensemble x_0 [B, S, 13] from the last two observations of a
        warmup window: pos/quat read off directly, velocities by finite
        differences (linvel from positions; angvel by inverting the
        integrator's small-angle quaternion update rot1 ~ normalize(
        rot0 + dt*0.5*quat(w) x rot0)  =>  w ~ (2/dt) vec((rot1-rot0)
        x conj(rot0))). Deterministic; the first conditioned update's
        shared-eps draw spreads the particles."""
        del params
        if y_prefix.shape[1] < 2:
            raise ValueError(
                "Voliro filter_init needs a warmup window of >= 2 "
                f"observations for velocity estimates, got {y_prefix.shape}"
            )
        dt = jnp.asarray(self._filter_dt(), dtype=self.dtype)
        yh = self.out_to_hidden(jnp.asarray(y_prefix, dtype=self.dtype))
        pos0, pos1 = yh[:, -2, :3], yh[:, -1, :3]
        q0 = quaternion.normalize(yh[:, -2, 3:7])
        q1 = quaternion.normalize(yh[:, -1, 3:7])
        linvel = (pos1 - pos0) / dt
        dq = quaternion.multiply(q1 - q0, quaternion.conjugate(q0))
        angvel = (2.0 / dt) * dq[..., 1:4]
        x0 = jnp.concatenate((pos1, q1, linvel, angvel), axis=-1)
        b = y_prefix.shape[0]
        return jnp.broadcast_to(
            x0[:, None, :], (b, self.samples, self.DIM_X)
        ).astype(self.dtype)

    def filter_step(self, params, ops, x, u_prev, y_new, key, eps=None):
        """One ONLINE conditioned transition of the particle ensemble.

        u_prev [B, 13] (the applied rotor PWM/tilt row; the time channel
        is ignored — dt comes from ops), y_new [B, 22] (the arriving
        dataset-layout observation; only pos+quat are used, exactly
        what telemetry provides). The propagation is the training
        transition verbatim (shared local_coordinates/physical_model/
        _gp_predict/symplectic_euler); conditioning touches only the 7
        observed dims. ``eps`` overrides the (force, state) noise pair
        ([B, S, 1] each; tests use it to pin the hand reference).
        Returns (x_next [B, S, 13], (mean [B, 7], var [B, 7])) —
        filtered pos+quat moments incl. observation noise.
        """
        del params
        cache_f, var_x, var_y, var_z, dt = ops
        b, s = x.shape[0], x.shape[1]
        if eps is None:
            kf, kx = jax.random.split(key)
            eps_ft = self._shared_eps(kf, (b, s), self.dtype)
            eps_x = self._shared_eps(kx, (b, s), self.dtype)
        else:
            eps_ft, eps_x = eps

        # force/torque distribution for this control row (the per-step
        # form of gp_forces, voliro.py:106-123)
        local_coo = self.local_coordinates(
            jnp.asarray(u_prev, dtype=self.dtype)
        )
        ft_phys = self.physical_model(local_coo)
        fmean_f, fvar_f = self._gp_predict(cache_f, local_coo)
        ft_mean = jnp.concatenate(
            (fmean_f + ft_phys[..., :3], ft_phys[..., 3:]), axis=-1
        )
        ft_var = jnp.concatenate(
            (fvar_f, jnp.zeros_like(ft_phys[..., 3:])), axis=-1
        ) + var_z
        ft_gp = ft_mean[:, None, :] + eps_ft * jnp.sqrt(ft_var[:, None, :])

        fmean = self.symplectic_euler(x, ft_gp, dt)
        fvar = jnp.broadcast_to(var_x, (b, s, self.DIM_X))

        # conditioning on the observed dims only (pos+quat = x[..., :7])
        dy = self.DIM_Y
        yh = self.out_to_hidden(jnp.asarray(y_new, dtype=self.dtype))
        y_bs = jnp.broadcast_to(yh[:, None, :], (b, s, dy))

        def pad_h(a):
            return jnp.pad(a, ((0, 0), (0, 0), (0, self.DIM_X - dy)))

        fvar_o = fvar[..., :dy]
        var_y_o = var_y[:dy]
        gain = fvar_o / (var_y_o + fvar_o)
        mu = fmean + pad_h(gain * (y_bs - fmean[..., :dy]))
        sig = jnp.square(1.0 - pad_h(gain)) * fvar + pad_h(
            jnp.square(gain) * var_y_o
        )
        x_next = mu + eps_x * jnp.sqrt(sig)

        y_part = x_next[..., :dy]
        mean = jnp.mean(y_part, axis=1)
        var = jnp.mean(jnp.square(y_part - mean[:, None, :]), axis=1) + var_y_o
        return x_next, (mean, var)

    def forecast(self, params, ops, x, u_future, key):
        """Free-run rollout from the current ensemble under planned
        controls — semantically exact prediction under the trained
        dynamics (physics + force-GP sampling, process noise, no
        conditioning). u_future [B, H, 13] -> (mean [B, H, 7],
        var [B, H, 7]); the caller's ensemble is NOT advanced."""
        del params
        cache_f, var_x, var_y, var_z, dt = ops
        b, s = x.shape[0], x.shape[1]
        u_tm = jnp.transpose(
            jnp.asarray(u_future, dtype=self.dtype), (1, 0, 2)
        )
        h = u_tm.shape[0]
        kf, kx = jax.random.split(key)
        eps_ft = self._shared_eps(kf, (h, b, s), self.dtype)
        eps_x = self._shared_eps(kx, (h, b, s), self.dtype)

        def step(x_c, inp):
            u_t, e_ft, e_x = inp
            local_coo = self.local_coordinates(u_t)
            ft_phys = self.physical_model(local_coo)
            fmean_f, fvar_f = self._gp_predict(cache_f, local_coo)
            ft_mean = jnp.concatenate(
                (fmean_f + ft_phys[..., :3], ft_phys[..., 3:]), axis=-1
            )
            ft_var = jnp.concatenate(
                (fvar_f, jnp.zeros_like(ft_phys[..., 3:])), axis=-1
            ) + var_z
            ft_gp = ft_mean[:, None, :] + e_ft * jnp.sqrt(ft_var[:, None, :])
            fmean = self.symplectic_euler(x_c, ft_gp, dt)
            x_next = fmean + e_x * jnp.sqrt(
                jnp.broadcast_to(var_x, (b, s, self.DIM_X))
            )
            return x_next, x_next

        _, x_path = jax.lax.scan(
            step, x, (u_tm, eps_ft, eps_x), unroll=self.config.scan_unroll
        )
        y_part = x_path[..., : self.DIM_Y]  # [H, B, S, 7]
        mean = jnp.mean(y_part, axis=2)
        var = jnp.mean(
            jnp.square(y_part - mean[:, :, None, :]), axis=2
        ) + var_y[: self.DIM_Y]
        return jnp.transpose(mean, (1, 0, 2)), jnp.transpose(var, (1, 0, 2))

"""Shared model scaffolding.

Replaces the reference's ``BaseModel`` TF-graph/placeholder machinery
(cbfssm/model/base_model.py): here a model is a pure-functional JAX
program and the data pipeline lives on the host (cbfssm_tpu.training).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from cbfssm_tpu.config import as_config
from cbfssm_tpu.ops import transforms
from cbfssm_tpu.ops.distributions import diag_gaussian_logpdf


@struct.dataclass
class PredictOutput:
    """Free-running / conditioned prediction statistics (parity with the
    reference's pred_mean/pred_var/mse/sde graph outputs,
    cbfssm.py:264-271)."""

    pred_mean: Any  # [B, T, dy] mean over particles
    pred_var: Any  # [B, T, dy] variance over particles + observation noise
    internal_mean: Any  # [B, T, dx]
    internal_var: Any  # [B, T, dx]
    mse: Any  # scalar
    sde: Any  # [B, T, dy] standardized error


def moments_over_samples(x):
    """Population mean/variance over the particle axis of [B, T, S, D]."""
    mean = jnp.mean(x, axis=2)
    var = jnp.mean(jnp.square(x - mean[:, :, None, :]), axis=2)
    return mean, var


class BaseSSM:
    """Common config handling + loss/prediction helpers."""

    # gradient schedules a concrete model actually implements; models
    # override to advertise 'hand' / 'parallel' (base validates the
    # request against this so an unimplemented schedule fails loudly
    # instead of silently running autodiff)
    SUPPORTED_ADJOINTS = frozenset({"auto", "autodiff"})

    def __init__(self, config):
        self.config = as_config(config)
        self.dtype = jnp.dtype(self.config.dtype)
        self.dim_u = int(self.config.dim_u)
        self.dim_y = int(self.config.dim_y)
        self.samples = int(self.config.samples)
        self.jitter = self.config.jitter
        if self.config.gp_impl not in ("solve_free", "pallas"):
            raise ValueError(f"unknown gp_impl: {self.config.gp_impl!r}")
        if self.config.adjoint not in ("auto", "autodiff", "hand", "parallel"):
            raise ValueError(
                "adjoint must be 'auto', 'autodiff', 'hand', or "
                f"'parallel', got {self.config.adjoint!r}"
            )
        supported = type(self).SUPPORTED_ADJOINTS
        if self.config.adjoint not in supported:
            # fail loudly: a model that never reads the flag would
            # otherwise silently train with autodiff while the user
            # benchmarks what they believe is the requested schedule
            raise ValueError(
                f"{type(self).__name__} does not implement "
                f"adjoint={self.config.adjoint!r} (supported: "
                f"{sorted(supported)})"
            )
        # The hand-derived adjoint pullbacks target the solve-free
        # predict math; the Pallas predict path has its own custom VJP.
        # For CBFSSM, 'auto' resolves to autodiff: the round-3
        # experiment matrix (BENCHMARKS.md "Hand-adjoint verdict")
        # measured the deferred hand schedule 2x SLOWER on both
        # rollouts — that reverse pass is matmul-throughput-bound, not
        # chain-latency-bound. 'hand' stays available (grad-equality
        # tested). 'parallel' (log-depth associative-scan reverse,
        # ops/parallel_vjp.py) targets LATENCY-bound recursions and is
        # consumed by the models that support it (Voliro).
        self._hand_adjoint = self.config.adjoint == "hand"
        self._parallel_adjoint = self.config.adjoint == "parallel"
        if self.config.adjoint in ("hand", "parallel") and (
            self.config.gp_impl != "solve_free"
        ):
            raise ValueError(
                f"adjoint={self.config.adjoint!r} requires gp_impl='solve_free'"
            )
        if self.config.backward_mode not in ("auto", "blocked", "sequential"):
            # fail loudly like the sibling schedule knobs: a typo
            # ('block', 'Blocked') would otherwise silently fall through
            # to the sequential schedule
            raise ValueError(
                "backward_mode must be 'auto', 'blocked', or "
                f"'sequential', got {self.config.backward_mode!r}"
            )
        if int(self.config.scan_unroll) < 1:
            raise ValueError(
                f"scan_unroll must be a positive int, got {self.config.scan_unroll!r}"
            )
        try:
            self._gp_precision = {
                "highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT,
            }[self.config.gp_matmul_precision]
        except KeyError:
            raise ValueError(
                "gp_matmul_precision must be 'highest', 'high', or "
                f"'default', got {self.config.gp_matmul_precision!r}"
            ) from None

    def _check_noise_lengths(self, **expected):
        """Validate config noise-vector lengths early with a clear error
        (shape mismatches otherwise surface as cryptic trace errors).
        Usage: self._check_noise_lengths(var_x=dim_x, var_y=dim_y)."""
        for name, want in expected.items():
            value = np.asarray(getattr(self.config, name))
            if value.ndim != 1 or value.shape[0] != want:
                raise ValueError(
                    f"config['{name}'] must be a length-{want} vector for "
                    f"{type(self).__name__}, got shape {value.shape}"
                )

    def _gp_predict(self, cache, xnew):
        """Scan-body GP predictive, implementation chosen by config
        (see ModelConfig.gp_impl)."""
        from cbfssm_tpu.ops import gp

        if self.config.gp_impl == "pallas":
            return gp.predict_fast(cache, xnew)
        return gp.predict(cache, xnew, precision=self._gp_precision)

    # --- parameter helpers --------------------------------------------

    def _noise_unc(self, value) -> jnp.ndarray:
        """Unconstrained (inverse-softplus) init for a noise variance."""
        return jnp.asarray(transforms.positive_inverse(np.asarray(value)), dtype=self.dtype)

    # --- loss helpers --------------------------------------------------

    def _loglik(self, y_final, y_obs, var_y_obs):
        """Observation log-likelihood summed over time/particles/dims,
        kept per-sequence: [T, B, S, dy] x [T, B, dy] -> [B]."""
        ll = diag_gaussian_logpdf(y_obs[:, :, None, :], y_final, var_y_obs)  # [T, B, S]
        return jnp.sum(ll, axis=(0, 2))

    def _prediction_stats(self, x_final, y_obs, var_y) -> PredictOutput:
        """x_final: [T, B, S, dx] (time-major), y_obs: [T, B, dy]."""
        dim_y = self.dim_y
        x_bt = jnp.transpose(x_final, (1, 0, 2, 3))  # [B, T, S, dx]
        internal_mean, internal_var = moments_over_samples(x_bt)
        pred_mean = internal_mean[..., :dim_y]
        pred_var = internal_var[..., :dim_y] + var_y[:dim_y]
        y_bt = jnp.transpose(y_obs, (1, 0, 2))
        mse = jnp.mean(jnp.square(pred_mean - y_bt))
        sde = jnp.abs(pred_mean - y_bt) / jnp.sqrt(pred_var)
        return PredictOutput(
            pred_mean=pred_mean,
            pred_var=pred_var,
            internal_mean=internal_mean,
            internal_var=internal_var,
            mse=mse,
            sde=sde,
        )

    # --- data staging --------------------------------------------------

    def _time_major(self, a):
        """[B, T, D] host/device array -> [T, B, D] in compute dtype."""
        return jnp.transpose(jnp.asarray(a, dtype=self.dtype), (1, 0, 2))

    @staticmethod
    def _shared_eps(key, shape, dtype):
        """Per-(time, batch, particle) standard-normal draws shared across
        state dimensions — the reference ties one scalar draw per particle
        and broadcasts it over dims (cbfssm.py:149,209)."""
        return jax.random.normal(key, shape + (1,), dtype=dtype)

    # --- fused backlog replay (streaming models) -------------------------

    def filter_replay(self, params, ops, x, u_block, y_block, base_key, t0,
                      active=None):
        """Fused K-step catch-up: one ``lax.scan`` program semantically
        identical to K sequential ``filter_step`` calls whose keys are
        ``fold_in(base_key, t0 + i)`` — the exact key schedule
        :class:`~cbfssm_tpu.serving.StreamingFilter` uses per update.
        Generic over the subclass's ``filter_step`` (CBFSSMHALF, Voliro):
        the scan body IS that method, so the per-step math is shared by
        construction.

        A deployed estimator restoring failover state must replay the
        observation backlog accumulated since the snapshot; serially
        that pays one device dispatch per step (~29 ms through this
        rig's tunnel — the serving latency floor, BENCHMARKS.md
        "Dispatch floor"), so a K-step backlog costs K dispatches of
        floor. This program replays the whole block in ONE dispatch,
        equal to the sequential schedule up to XLA's scan-vs-per-call
        fusion differences (last-ulp f64; the same noise documented in
        tests/test_streaming.py's header) — pinned at rtol 1e-12.

        Args:
          u_block / y_block: ``[B, K, du]`` / ``[B, K, dy]`` — the
            backlog, batch-major like the host API.
          base_key / t0: the stream's base PRNG key and the step
            counter at the start of the block. ``t0`` may be a traced
            scalar, so ONE compiled program serves any counter value.
          active: optional bool ``[K]`` (shared across the batch) or
            ``[K, B]``; inactive steps HOLD the ensemble (their
            mean/var outputs are placeholders computed from the held
            transition — callers slice them off). This is what lets a
            bucketed/padded replay and the pool's ragged per-session
            backlogs run as one static-shape program.

        Returns ``(x_final [B, S, dx], (mean [B, K, dy], var [B, K,
        dy]))``.
        """
        if not hasattr(self, "filter_step"):
            raise TypeError(
                f"{type(self).__name__} has no filter_step; filter_replay "
                "needs the streaming interface"
            )
        b = x.shape[0]
        u_tm = jnp.transpose(jnp.asarray(u_block, self.dtype), (1, 0, 2))
        y_tm = jnp.transpose(jnp.asarray(y_block, self.dtype), (1, 0, 2))
        k_len = u_tm.shape[0]
        if active is None:
            active = jnp.ones((k_len,), dtype=bool)
        active = jnp.asarray(active)
        if active.shape not in ((k_len,), (k_len, b)):
            raise ValueError(
                f"active must be [{k_len}] or [{k_len}, {b}], "
                f"got {active.shape}"
            )
        # absolute step indices: fold_in(key, t) is deterministic in the
        # VALUE of t (traced or concrete), so these match the host-side
        # fold_in(base_key, python_int) of sequential updates exactly
        idx = jnp.asarray(t0, jnp.uint32) + jnp.arange(k_len, dtype=jnp.uint32)

        def body(x_c, inp):
            u_t, y_t, t_t, a_t = inp
            key_t = jax.random.fold_in(base_key, t_t)
            x_next, (mean, var) = self.filter_step(
                params, ops, x_c, u_t, y_t, key_t
            )
            a_bc = a_t if a_t.ndim == 0 else a_t[:, None, None]
            return jnp.where(a_bc, x_next, x_c), (mean, var)

        x_fin, (means, vars_) = jax.lax.scan(
            body, x, (u_tm, y_tm, idx, active),
            unroll=self.config.scan_unroll,
        )
        return x_fin, (
            jnp.transpose(means, (1, 0, 2)), jnp.transpose(vars_, (1, 0, 2))
        )


LOG_2PI_E = math.log(2.0 * math.pi * math.e)

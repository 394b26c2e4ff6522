"""Typed model configuration.

The reference configures models with plain Python dicts (run/template.py:19-40
documents the key semantics). For drop-in familiarity the model
constructors here accept the same dicts (same keys, same defaults); this
module normalizes them into a typed dataclass used internally.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

import numpy as np


@dataclass
class ModelConfig:
    # dataset
    ds: Any = None  # dataset class or instance exposing dim_u / dim_y
    batch_size: int = 32
    shuffle: int = 10000  # kept for interface parity (full-permutation shuffle is used)
    # method
    dim_x: int = 4
    ind_pnt_num: int = 100
    samples: int = 50
    learning_rate: float = 0.01
    loss_factors: Sequence[float] = (10.0, 0.0)
    k_factor: float = 1.0
    recog_len: int = 50
    recog_model: str = "rnn"
    # variable init state
    zeta_pos: float = 2.0
    zeta_mean: float = 0.01
    zeta_var: float = 0.0001
    var_x: np.ndarray = None
    var_y: np.ndarray = None
    gp_var: float = 0.01
    gp_len: float = 1.0
    # voliro-specific
    loglik_factor: Sequence[float] = (20.0, 0.0, 200.0)
    n_beta: Sequence[float] = (10.0, 2.0, 10.0)
    l_beta: Sequence[float] = (1.0, 10.0, 10.0)
    var_z: np.ndarray = None
    # Sampling period for Voliro's ONLINE filter (serving only): the
    # training pass infers dt from each sequence's time channel
    # (models/voliro.py infer_dt — training assumes uniform sampling);
    # a deployed stream declares the same uniform rate here. Ignored by
    # training and by every other model.
    filter_dt: Optional[float] = None
    # numerics (new knobs, absent in the reference: TPU compute dtype and
    # Cholesky jitter)
    dtype: str = "float32"
    jitter: Optional[float] = None
    # GP predict implementation in scan bodies: 'solve_free' (cached-K^-1
    # jnp path, fastest in whole-epoch fused training) or 'pallas' (fused
    # single-kernel TPU forward with analytic VJP; useful for per-step
    # dispatch / inference workloads)
    gp_impl: str = "solve_free"
    # Matmul precision for the GP predict path inside scan bodies:
    # 'high' (3 bf16 MXU passes, default — rel err ~2e-7 per step,
    # ~ f32 arithmetic noise; +21% device-side on the compute-bound
    # RoboMove shape, floor-corrected), 'highest' (6-pass — exact),
    # 'default' (1 bf16 pass, rel err ~4e-6, ~+27%). The default was
    # decided by END-TO-END training evidence (BENCHMARKS.md
    # "gp_matmul_precision default decision" / artifacts/
    # precision_experiment.json): full-budget RoboMove-curriculum and
    # Sarcos-shaped training under 'high' vs 'highest' with shared RNG
    # streams are statistically equivalent in per-seed free-run RMSE
    # and loss envelopes. 'default' was REJECTED by the same
    # experiment (precision_experiment_default.json): at ~4e-6
    # per-step rounding the training trajectories measurably separate
    # on both configs for only ~+5% over 'high'. The Gram/Cholesky
    # precompute and the ELBO assembly dots always run at HIGHEST
    # regardless; golden tests pin f64 numerics and are unaffected.
    # Scope: governs the solve-free GP predict path; the opt-in
    # gp_impl='pallas' kernel pins HIGHEST internally (its MXU
    # accumulation is fixed) and does not read this knob.
    gp_matmul_precision: str = "high"
    # lax.scan unroll factor for the time recursions (pure perf knob:
    # >1 emits several steps per loop iteration, amortizing loop
    # overhead at the cost of code size/compile time; numerics
    # unchanged)
    scan_unroll: int = 1
    # Backward-pass schedule: 'blocked' processes the independent
    # 2*recog_len segments in parallel (sequential depth 2L instead of
    # T); 'sequential' is the reference-shaped reverse scan; 'auto'
    # picks blocked when it shortens the recursion.
    backward_mode: str = "auto"
    # Epochs fused into ONE device dispatch by the Trainer: K epochs run
    # as a single jitted scan (train pass + test eval + in-device
    # best-checkpoint tracking per epoch), amortizing the per-dispatch
    # host roundtrip (~29 ms on a tunneled chip — BENCHMARKS.md
    # "dispatch floor") over K*steps_per_epoch optimizer steps. Losses,
    # checkpoints, and RNG streams are IDENTICAL to per-epoch dispatch
    # (pinned by test); only stdout timing granularity and the
    # best-checkpoint *write* cadence (per block, same final content)
    # change. 'auto' targets ~300 steps/dispatch (1 for long epochs);
    # an int pins the block size; profiling (profile_dir) forces 1.
    epochs_per_dispatch: Any = "auto"
    # Gradient schedule for the CBFSSM time recursions: 'hand' uses the
    # hand-derived custom-VJP rollouts (models/adjoint.py — minimal
    # state-cotangent chain in the reverse scan, loop-invariant
    # cotangents batched after it), 'autodiff' is plain reverse-mode.
    # 'auto' resolves to autodiff: the hand schedule measured ~2x SLOWER
    # on TPU on both rollouts (BENCHMARKS.md "Hand-adjoint verdict" —
    # the reverse pass is matmul-throughput-bound, so deferring the
    # loop-invariant accumulations only adds materialization traffic).
    # Primal values are identical either way; gradients agree to float
    # tolerance (tests/test_adjoint.py). Scope: 'hand' covers the
    # forward rollout and the BLOCKED recognition schedule; a
    # sequential recognition pass (backward_mode='sequential', or
    # 'auto' on shapes where blocked doesn't shorten the recursion)
    # differentiates via autodiff — a tested hybrid (gradients equal),
    # not a silent fallback of the forward schedule.
    adjoint: str = "auto"
    # Production robustness: when True, every optimizer step checks the
    # batch loss and every gradient leaf for NaN/Inf ON DEVICE and, if
    # any is non-finite, leaves params AND opt_state (Adam moments +
    # step count) untouched for that batch instead of poisoning the
    # run — one bad batch costs one skipped step, not the training run.
    # Skipped-step counts surface per epoch (stdout + metrics.jsonl
    # ``skipped_steps``). On clean data the update VALUES are unchanged
    # — losses match the unguarded path to compiled-program
    # reassociation noise (rtol 1e-12 at f64, pinned by test; the
    # guard's isfinite reductions change the XLA program, so exact
    # bitwise equality across the two programs is not a meaningful
    # claim); the in-device best tracking
    # is NaN-safe either way (IEEE ``NaN < best`` is False). Off by
    # default: the guard adds a handful of reductions per step and the
    # reference semantics have no such rescue.
    skip_nonfinite_updates: bool = False
    # extra bag for forward-compat keys
    extra: dict = field(default_factory=dict)

    @property
    def dim_u(self) -> int:
        return self.ds.dim_u

    @property
    def dim_y(self) -> int:
        return self.ds.dim_y

    @classmethod
    def from_dict(cls, config: dict) -> "ModelConfig":
        known = {f for f in cls.__dataclass_fields__ if f != "extra"}
        kwargs = {k: v for k, v in config.items() if k in known}
        extra = {k: v for k, v in config.items() if k not in known}
        return cls(**kwargs, extra=extra)


def as_config(config) -> ModelConfig:
    if isinstance(config, ModelConfig):
        return config
    return ModelConfig.from_dict(dict(config))

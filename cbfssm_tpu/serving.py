"""Ahead-of-time-compiled predictors for deployment.

The training stack compiles lazily under jit; for serving, a fixed
sequence shape can be lowered and compiled ONCE up front so the first
request pays no compile latency, and the compiled executable can be
reused across requests (the persistent XLA cache additionally warms
process restarts).
"""

from __future__ import annotations

import queue as _queue
import threading
import time
from concurrent.futures import Future

import jax
import jax.numpy as jnp
import numpy as np


def normalize_replay_ladder(replay_buckets):
    """Validated sorted ladder tuple from a ``replay_buckets`` arg
    (``None`` -> ``()`` = compile exact-length programs on demand).
    Shared by both filter front-ends and the artifact exporter so the
    validation rules cannot drift."""
    if replay_buckets is None:
        return ()
    ladder = tuple(sorted(int(b) for b in replay_buckets))
    if not ladder or ladder[0] < 1:
        raise ValueError(
            f"replay_buckets must be a non-empty collection of "
            f"lengths >= 1, got {replay_buckets!r}"
        )
    return ladder


def iter_replay_chunks(u, y, buckets, active_full=None):
    """Drive a backlog through the bucket ladder: yields
    ``(u_c, y_c, active, k_act)`` per chunk — arrays sliced on their
    time axis (axis 1), padded to the program length, with the active
    mask marking real steps (``[k_prog]`` by default, or
    ``active_full`` [K, ...] sliced/padded the same way for the pool's
    per-(tick, slot) masks). The single implementation of the
    chunk/pad/mask logic used by StreamingFilter.replay,
    FilterPool.replay, and ExportedFilter.replay — counter semantics
    and padding cannot drift apart."""
    k_total = u.shape[1]
    off = 0
    for k_act, k_prog in plan_replay_chunks(k_total, buckets):
        u_c = u[:, off:off + k_act]
        y_c = y[:, off:off + k_act]
        if k_prog != k_act:
            pad3 = ((0, 0), (0, k_prog - k_act), (0, 0))
            u_c = np.pad(u_c, pad3)
            y_c = np.pad(y_c, pad3)
        if active_full is None:
            active = np.arange(k_prog, dtype=np.int64) < k_act
        else:
            active = active_full[off:off + k_act]
            if k_prog != k_act:
                active = np.pad(
                    active,
                    ((0, k_prog - k_act),) + ((0, 0),) * (active.ndim - 1),
                )
        yield u_c, y_c, active, k_act
        off += k_act


def plan_replay_chunks(k_total, buckets):
    """Split a K-step backlog into (k_active, k_program) chunks over a
    bucket ladder of compiled replay-program lengths.

    Full chunks of the largest bucket run exactly; the remainder pads
    up to the smallest bucket that fits (padded steps are masked
    inactive, so they hold the ensemble and their outputs are sliced
    off). ``buckets`` empty/None means one exact-length program.
    Shared by :meth:`StreamingFilter.replay` and the exported-filter
    replay (:class:`cbfssm_tpu.export.ExportedFilter`), so both sides
    of the failover pair chunk a backlog identically.
    """
    if k_total < 1:
        raise ValueError(f"backlog must have at least one step, got {k_total}")
    # one validator for the whole replay surface (empty == None == one
    # exact-length program) — a second copy of the rules would drift
    ladder = normalize_replay_ladder(buckets or None)
    if not ladder:
        return [(k_total, k_total)]
    plan = []
    remaining = k_total
    while remaining > ladder[-1]:
        plan.append((ladder[-1], ladder[-1]))
        remaining -= ladder[-1]
    k_prog = next(b for b in ladder if b >= remaining)
    plan.append((remaining, k_prog))
    return plan


def validate_params_like(old, new, context="reload_params"):
    """Validate a replacement parameter pytree against the one a
    compiled program was built with: same tree structure, same leaf
    shapes and dtypes (the AOT executables' calling convention).
    Returns the new tree with leaves as device-ready arrays.

    Shared by every ``reload_params`` (checkpoint hot-swap) surface so
    a wrong-config checkpoint fails here with a named leaf instead of
    dying inside an AOT executable with an opaque signature error.
    """
    old_leaves, old_def = jax.tree_util.tree_flatten(old)
    new_leaves, new_def = jax.tree_util.tree_flatten(new)
    if new_def != old_def:
        raise ValueError(
            f"{context}: parameter tree structure differs from the "
            f"served one (got {new_def}, serving {old_def}) — wrong "
            "model class or config?"
        )
    coerced = []
    for i, (o, n) in enumerate(zip(old_leaves, new_leaves)):
        n = jnp.asarray(n)
        o_shape, o_dtype = jnp.shape(o), jnp.asarray(o).dtype
        if n.shape != o_shape or n.dtype != o_dtype:
            raise ValueError(
                f"{context}: leaf {i} is {n.dtype}{list(n.shape)}, "
                f"serving expects {o_dtype}{list(o_shape)} — wrong "
                "checkpoint (different dims/inducing points/dtype)?"
            )
        coerced.append(n)
    return jax.tree_util.tree_unflatten(old_def, coerced)


class CompiledPredictor:
    """AOT-compiled free-running prediction for one (batch, seq_len)
    shape.

    >>> pred = CompiledPredictor(model, params, batch=1, seq_len=300)
    >>> out = pred(u, y)   # no compile on first call
    """

    def __init__(self, model, params, batch: int, seq_len: int,
                 condition: bool = False, seed: int = 0):
        self.model = model
        self.params = params
        self.batch = batch
        self.seq_len = seq_len
        self.key = jax.random.PRNGKey(seed)
        dtype = model.dtype
        u_spec = jax.ShapeDtypeStruct((batch, seq_len, model.dim_u), dtype)
        y_spec = jax.ShapeDtypeStruct((batch, seq_len, model.dim_y), dtype)
        key_spec = jax.ShapeDtypeStruct(self.key.shape, self.key.dtype)

        def fn(params, u, y, key):
            return model.predict(params, u, y, key, condition=condition)

        # fail BEFORE the (expensive) AOT compile if the model's predict
        # doesn't speak PredictOutput — e.g. VoliroSSM returns a plain
        # dict (models/voliro.py predict) and cannot feed the batch
        # predictors' .pred_mean/.replace contract. eval_shape only
        # traces, so this costs a fraction of the compile it guards.
        out_spec = jax.eval_shape(fn, params, u_spec, y_spec, key_spec)
        if not hasattr(out_spec, "pred_mean"):
            raise TypeError(
                f"{type(model).__name__}.predict returns "
                f"{type(out_spec).__name__}, not a PredictOutput; the "
                "batch predictors (CompiledPredictor/BucketedPredictor/"
                "MicroBatcher) support models with PredictOutput predict "
                "(CBFSSM/CBFSSMHALF/PRSSM)"
            )

        self._compiled = (
            jax.jit(fn)
            .lower(params, u_spec, y_spec, key_spec)
            .compile()
        )

    @property
    def cost_analysis(self):
        """Compiler cost analysis (FLOPs / bytes) of the executable."""
        return self._compiled.cost_analysis()

    def reload_params(self, params) -> None:
        """Hot-swap the served checkpoint with NO recompile (params are
        a call argument of the AOT executable, not baked in). The swap
        is one reference assignment, so a concurrent ``__call__`` sees
        either the old or the new checkpoint — never a torn mix."""
        self.params = validate_params_like(self.params, params)

    def __call__(self, u, y, key=None):
        dtype = self.model.dtype
        u = jnp.asarray(np.asarray(u), dtype=dtype)
        y = jnp.asarray(np.asarray(y), dtype=dtype)
        # validate FULL shapes of both inputs up front — a feature-dim
        # mismatch would otherwise die inside the AOT executable with a
        # misleading compiled-signature error
        want_u = (self.batch, self.seq_len, self.model.dim_u)
        want_y = (self.batch, self.seq_len, self.model.dim_y)
        if u.shape != want_u:
            raise ValueError(f"compiled for u {want_u}, got {u.shape}")
        if y.shape != want_y:
            raise ValueError(f"compiled for y {want_y}, got {y.shape}")
        if key is None:
            key = self.key
        else:
            # same policy for the key: a new-style typed key (or a
            # batched key array) would die inside the AOT executable
            # with an opaque signature mismatch
            key = jnp.asarray(key)
            if key.shape != self.key.shape or key.dtype != self.key.dtype:
                raise ValueError(
                    f"compiled for key {self.key.dtype}{list(self.key.shape)}"
                    f" (jax.random.PRNGKey), got {key.dtype}{list(key.shape)}"
                )
        return self._compiled(self.params, u, y, key)


class StreamingFilter:
    """Stateful ONLINE state estimation for deployment.

    The batch predictors above consume whole sequences; a deployed
    estimator receives (control, observation) pairs one step at a time.
    This wraps a trained :class:`~cbfssm_tpu.models.CBFSSMHALF` — whose
    conditioning update touches only the OBSERVED dims, i.e. exactly the
    information available online (reference cbfssmhalf.py:147-155) — as
    a particle filter with device-resident ensemble state. A trained
    :class:`~cbfssm_tpu.models.Voliro` serves the same interface (its
    causal deployment filter: the trained physics + force-GP transition
    with conditioning on the observed pos+quat dims; set
    ``config['filter_dt']`` — see models/voliro.py's streaming
    section):

    >>> f = StreamingFilter(model, params, batch=1)
    >>> f.start(u_prefix, y_prefix)          # recognition net -> x_0
    >>> mean, var = f.update(u_prev, y_new)  # one conditioned transition
    >>> mean, var = f.forecast(u_future)     # free-run ahead, state kept
    >>> mean, var = f.replay(u_blk, y_blk)   # K backlog steps, ONE dispatch

    The start/update programs are AOT-compiled at construction (no
    first-request compile latency); forecast compiles once per distinct
    horizon and caches the executable. ``state``/``load_state`` expose
    the (ensemble, step counter) for checkpointing/failover; ``replay``
    catches a restored replica up on the observation backlog in one
    fused dispatch (same trajectory as sequential updates to f64
    last-ulp scan-fusion noise; pinned at rtol 1e-12 by test). Pass
    ``replay_buckets`` (e.g. ``(16, 128)``) to AOT-lower
    a fixed ladder of replay lengths at construction — failover is
    exactly when a first-use compile is unaffordable; without it,
    replay compiles one exact-length program per distinct backlog size.
    """

    def __init__(self, model, params, batch: int = 1, seed: int = 0,
                 replay_buckets=None):
        # filter_replay is NOT in this list: a model satisfying the
        # four-method streaming contract keeps serving (and exporting)
        # without it — replay use checks for it when first needed
        for attr in ("filter_ops", "filter_init", "filter_step", "forecast"):
            if not hasattr(model, attr):
                raise TypeError(
                    f"{type(model).__name__} has no streaming interface "
                    f"({attr}); StreamingFilter supports CBFSSMHALF and Voliro"
                )
        self.model = model
        self.params = params
        self.batch = batch
        self._base_key = jax.random.PRNGKey(seed)
        self._x = None
        self._t = 0
        dtype = model.dtype
        self._ops = jax.jit(model.filter_ops)(params)

        recog_len = int(model.config.recog_len)
        u_spec = jax.ShapeDtypeStruct((batch, recog_len, model.dim_u), dtype)
        y_spec = jax.ShapeDtypeStruct((batch, recog_len, model.dim_y), dtype)
        self._start_c = (
            jax.jit(model.filter_init).lower(params, u_spec, y_spec).compile()
        )
        x_spec = jax.ShapeDtypeStruct(
            (batch, model.samples, model.dim_x), dtype
        )
        u1 = jax.ShapeDtypeStruct((batch, model.dim_u), dtype)
        y1 = jax.ShapeDtypeStruct((batch, model.dim_y), dtype)
        key_spec = jax.ShapeDtypeStruct(
            self._base_key.shape, self._base_key.dtype
        )
        self._step_c = (
            jax.jit(lambda p, ops, x, u, y, k: model.filter_step(p, ops, x, u, y, k))
            .lower(params, self._ops, x_spec, u1, y1, key_spec)
            .compile()
        )
        self._forecast_c = {}
        self._replay_c = {}
        self._replay_buckets = normalize_replay_ladder(replay_buckets)
        for k in self._replay_buckets:
            # AOT: failover-time compiles are unaffordable
            self._replay_compiled(k)

    # --- state management ----------------------------------------------

    def reload_params(self, params) -> None:
        """Hot-swap the trained checkpoint WITHOUT dropping the session:
        the particle ensemble, step counter, and PRNG stream carry over
        (that is what a model update means for an online estimator —
        same belief state, new dynamics from the next tick). No
        recompile: params/ops are call arguments of the AOT programs;
        only the GP factorization (``filter_ops``) is recomputed, which
        is microseconds of small-matrix linalg. Equivalent, pinned by
        test, to constructing a fresh filter with the new checkpoint
        and loading this one's ``state``."""
        self.params = validate_params_like(self.params, params)
        self._ops = jax.jit(self.model.filter_ops)(self.params)

    @property
    def state(self):
        """(ensemble [B, S, dx], step counter, base PRNG key) — all
        serializable. The key rides along so a standby constructed
        with a DIFFERENT seed still resumes the primary's exact draw
        stream (keys fold from base by step counter)."""
        return ((None if self._x is None else np.asarray(self._x)),
                self._t, np.asarray(self._base_key))

    def load_state(self, state) -> None:
        if len(state) == 2:  # pre-key snapshots: keep this seed's key
            (x, t), key = state, None
        else:
            x, t, key = state
        if x is not None:
            x = jnp.asarray(x, self.model.dtype)
            want = (self.batch, self.model.samples, self.model.dim_x)
            # same validation policy as FilterPool.load_state: a
            # mismatched ensemble would otherwise fail deep inside the
            # AOT step (or silently compile a wrong-shape forecast)
            if x.shape != want:
                raise ValueError(
                    f"ensemble must be {want} for this filter, got {x.shape}"
                )
        self._base_key = self._restore_key(key, self._base_key)
        self._x = x
        self._t = int(t)

    @staticmethod
    def _restore_key(key, current):
        """Validated key restore shared by the failover loaders: None
        (legacy snapshot) keeps the instance's own key; otherwise the
        snapshot's key must match the compiled key spec exactly."""
        if key is None:
            return current
        key = np.asarray(key)
        want = (np.asarray(current).shape, np.asarray(current).dtype)
        if (key.shape, key.dtype) != want:
            raise ValueError(
                f"snapshot key has shape/dtype {(key.shape, key.dtype)}, "
                f"expected {want}"
            )
        return key

    def _require_started(self):
        if self._x is None:
            raise RuntimeError("call start(u_prefix, y_prefix) first")

    # --- the three programs --------------------------------------------

    def start(self, u_prefix, y_prefix) -> None:
        """Initialize the ensemble from a recog_len warmup window."""
        dtype = self.model.dtype
        u = jnp.asarray(np.asarray(u_prefix), dtype=dtype)
        y = jnp.asarray(np.asarray(y_prefix), dtype=dtype)
        want = (self.batch, int(self.model.config.recog_len))
        # validate BOTH inputs up front — a mismatch would otherwise
        # fail deep inside the AOT executable with a misleading
        # compiled-signature error (same policy as BucketedPredictor)
        if u.shape != want + (self.model.dim_u,):
            raise ValueError(
                f"compiled for prefix shape {want + (self.model.dim_u,)}, "
                f"got u {u.shape}"
            )
        if y.shape != want + (self.model.dim_y,):
            raise ValueError(
                f"y_prefix must be {want + (self.model.dim_y,)} to match "
                f"u_prefix, got {y.shape}"
            )
        self._x = self._start_c(self.params, u, y)
        self._t = 0

    def update(self, u_prev, y_new):
        """Advance one transition conditioned on the arriving
        observation; returns filtered (mean [B, dy], var [B, dy])."""
        self._require_started()
        dtype = self.model.dtype
        u = jnp.asarray(np.asarray(u_prev), dtype=dtype)
        y = jnp.asarray(np.asarray(y_new), dtype=dtype)
        if u.shape != (self.batch, self.model.dim_u) or y.shape != (
            self.batch, self.model.dim_y,
        ):
            raise ValueError(
                f"update expects u [{self.batch}, {self.model.dim_u}] and "
                f"y [{self.batch}, {self.model.dim_y}], got {u.shape} / "
                f"{y.shape}"
            )
        key = jax.random.fold_in(self._base_key, self._t)
        self._x, (mean, var) = self._step_c(
            self.params, self._ops, self._x, u, y, key
        )
        self._t += 1
        return mean, var

    def _replay_compiled(self, k: int):
        """AOT replay program for a K-step block (cached per length).
        The start counter ``t0`` and the active mask are runtime
        ARGUMENTS, so one program serves every point in the stream and
        every padding amount."""
        if k not in self._replay_c:
            model = self.model
            if not hasattr(model, "filter_replay"):
                raise TypeError(
                    f"{type(model).__name__} has no filter_replay; "
                    "fused backlog replay supports CBFSSMHALF and Voliro"
                )
            dtype = model.dtype
            x_spec = jax.ShapeDtypeStruct(
                (self.batch, model.samples, model.dim_x), dtype
            )
            u_spec = jax.ShapeDtypeStruct((self.batch, k, model.dim_u), dtype)
            y_spec = jax.ShapeDtypeStruct((self.batch, k, model.dim_y), dtype)
            key_spec = jax.ShapeDtypeStruct(
                self._base_key.shape, self._base_key.dtype
            )
            t0_spec = jax.ShapeDtypeStruct((), np.uint32)
            a_spec = jax.ShapeDtypeStruct((k,), np.bool_)
            self._replay_c[k] = (
                jax.jit(
                    lambda p, ops, x, u, y, bk, t0, a:
                        model.filter_replay(p, ops, x, u, y, bk, t0, a)
                )
                .lower(self.params, self._ops, x_spec, u_spec, y_spec,
                       key_spec, t0_spec, a_spec)
                .compile()
            )
        return self._replay_c[k]

    def replay(self, u_block, y_block):
        """Catch up on a K-step backlog — ``u_block`` [B, K, du] /
        ``y_block`` [B, K, dy] — in one fused dispatch per bucket chunk
        instead of K single-step dispatches. The trajectory, final
        state, and per-step (mean, var) outputs match K sequential
        :meth:`update` calls — same key schedule, equal to f64
        last-ulp scan-vs-per-call fusion noise (pinned at rtol 1e-12
        by test). Returns (mean [B, K, dy], var [B, K, dy])."""
        self._require_started()
        model = self.model
        dtype = model.dtype
        u = np.asarray(u_block, dtype=dtype)
        y = np.asarray(y_block, dtype=dtype)
        if u.ndim != 3 or u.shape[0] != self.batch or \
                u.shape[2] != model.dim_u:
            raise ValueError(
                f"u_block must be [{self.batch}, K, {model.dim_u}], "
                f"got {u.shape}"
            )
        k_total = u.shape[1]
        if y.shape != (self.batch, k_total, model.dim_y):
            raise ValueError(
                f"y_block must be [{self.batch}, {k_total}, "
                f"{model.dim_y}] to match u_block, got {y.shape}"
            )
        means, vars_ = [], []
        for u_c, y_c, active, k_act in iter_replay_chunks(
                u, y, self._replay_buckets):
            self._x, (m, v) = self._replay_compiled(u_c.shape[1])(
                self.params, self._ops, self._x,
                jnp.asarray(u_c), jnp.asarray(y_c),
                self._base_key, np.uint32(self._t), active,
            )
            self._t += k_act
            # slice/concat on the HOST: one readback per chunk instead
            # of extra device slice + concat dispatches, each carrying
            # the ~29 ms tunnel floor this fused path exists to avoid
            # (FilterPool.replay does the same)
            means.append(np.asarray(m)[:, :k_act])
            vars_.append(np.asarray(v)[:, :k_act])
        if len(means) == 1:
            return means[0], vars_[0]
        return np.concatenate(means, axis=1), np.concatenate(vars_, axis=1)

    def forecast(self, u_future):
        """Free-run prediction from the current ensemble over
        ``u_future`` [B, H, du]; does NOT advance the filter state."""
        self._require_started()
        dtype = self.model.dtype
        u = jnp.asarray(np.asarray(u_future), dtype=dtype)
        if u.ndim != 3 or u.shape[0] != self.batch or \
                u.shape[2] != self.model.dim_u:
            raise ValueError(
                f"u_future must be [{self.batch}, H, {self.model.dim_u}], "
                f"got {u.shape}"
            )
        h = u.shape[1]
        if h not in self._forecast_c:
            model = self.model
            self._forecast_c[h] = (
                jax.jit(lambda p, ops, x, uu, k: model.forecast(p, ops, x, uu, k))
                .lower(
                    self.params, self._ops,
                    jax.ShapeDtypeStruct(self._x.shape, self._x.dtype),
                    jax.ShapeDtypeStruct(u.shape, u.dtype),
                    jax.ShapeDtypeStruct(
                        self._base_key.shape, self._base_key.dtype
                    ),
                )
                .compile()
            )
        # forecast keys live in a disjoint fold range from update keys
        key = jax.random.fold_in(self._base_key, 2**30 + self._t)
        return self._forecast_c[h](self.params, self._ops, self._x, u, key)


class FilterPool:
    """Many independent online-filtering sessions, ONE compiled step.

    :class:`StreamingFilter` advances one stream per device dispatch; a
    deployed fleet of N estimators would pay N dispatch floors per
    tick. The pool packs up to ``capacity`` sessions into the batch
    axis of a single AOT-compiled ``filter_step`` program: every
    :meth:`step` advances ALL participating sessions in one dispatch
    (measured: batching is nearly free on-chip, and on this rig one
    dispatch replaces N ~29 ms roundtrips — BENCHMARKS.md).

    Sessions attach/detach dynamically. Rows are independent by the
    same pinned property the bucket ladder relies on (noise draws are
    indexed by row position; the GP predict batches rows
    independently), so co-resident sessions never affect each other —
    a diverged or stale slot cannot leak into its neighbors.

    >>> pool = FilterPool(model, params, capacity=32)
    >>> a = pool.attach(u_prefix, y_prefix)      # [recog_len, du/dy]
    >>> b = pool.attach(u_prefix2, y_prefix2)
    >>> out = pool.step({a: (u_a, y_a), b: (u_b, y_b)})  # one dispatch
    >>> out[a]                                   # (mean [dy], var [dy])
    >>> fc = pool.forecast({a: u_future})        # (mean/var [H, dy])
    >>> pool.detach(b)

    Sessions omitted from a ``step`` hold their state (the compiled
    program advances every row; a mask restores held rows — exact,
    since ``where`` passes values through untouched). Not thread-safe:
    drive from one control loop, or front it with your transport's
    serialization. ``state``/``load_state`` serialize the whole pool
    (ensemble, tick, session table) for failover.

    **Fleet scale-out**: pass a 1-D ``jax.sharding.Mesh`` to shard the
    capacity axis across chips — ``capacity`` must be a multiple of the
    mesh axis size. Parameters/operators replicate; the ensemble and
    per-tick inputs shard by row, so the single compiled step runs
    SPMD with NO collectives in the hot path (rows are independent —
    the same pinned property slot isolation relies on), and per-session
    results are bitwise identical to an unsharded pool (pinned by
    test). The step stays ONE dispatch regardless of mesh size.
    """

    def __init__(self, model, params, capacity: int, seed: int = 0,
                 mesh=None, axis_name: str = "data", replay_buckets=None):
        # filter_replay deliberately not required here (see
        # StreamingFilter.__init__) — checked at replay use instead
        for attr in ("filter_ops", "filter_init", "filter_step", "forecast"):
            if not hasattr(model, attr):
                raise TypeError(
                    f"{type(model).__name__} has no streaming interface "
                    f"({attr}); FilterPool supports CBFSSMHALF and Voliro"
                )
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.model = model
        self.capacity = int(capacity)
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            if axis_name not in mesh.axis_names:
                raise ValueError(
                    f"mesh has no axis {axis_name!r} (axes: {mesh.axis_names})"
                )
            n_shards = mesh.shape[axis_name]
            if self.capacity % n_shards:
                raise ValueError(
                    f"capacity {self.capacity} must be a multiple of the "
                    f"mesh {axis_name!r} axis size {n_shards}"
                )
            self._row_shardings = tuple(
                NamedSharding(
                    mesh, PartitionSpec(axis_name, *([None] * (nd - 1)))
                )
                for nd in range(1, 4)
            )
            self._rep_sharding = NamedSharding(mesh, PartitionSpec())
            # the replay active mask is [K, capacity]: time replicated,
            # session rows sharded like every other per-slot array
            self._mask_t_sharding = NamedSharding(
                mesh, PartitionSpec(None, axis_name)
            )
            params = jax.device_put(params, self._rep_sharding)
        else:
            self._row_shardings = None
            self._rep_sharding = None
            self._mask_t_sharding = None
        self.params = params
        self._base_key = jax.random.PRNGKey(seed)
        self._ops = jax.jit(model.filter_ops)(params)
        if mesh is not None:
            self._ops = jax.device_put(self._ops, self._rep_sharding)
        dtype = model.dtype
        recog_len = int(model.config.recog_len)

        u1 = jax.ShapeDtypeStruct((1, recog_len, model.dim_u), dtype)
        y1 = jax.ShapeDtypeStruct((1, recog_len, model.dim_y), dtype)
        self._init_c = (
            jax.jit(model.filter_init).lower(params, u1, y1).compile()
        )

        x_spec = jax.ShapeDtypeStruct(
            (self.capacity, model.samples, model.dim_x), dtype
        )
        u_spec = jax.ShapeDtypeStruct((self.capacity, model.dim_u), dtype)
        y_spec = jax.ShapeDtypeStruct((self.capacity, model.dim_y), dtype)
        m_spec = jax.ShapeDtypeStruct((self.capacity,), np.bool_)
        key_spec = jax.ShapeDtypeStruct(
            self._base_key.shape, self._base_key.dtype
        )

        def pool_step(p, ops, x, u, y, mask, key):
            x_next, (mean, var) = model.filter_step(p, ops, x, u, y, key)
            x_keep = jnp.where(mask[:, None, None], x_next, x)
            return x_keep, (mean, var)

        if mesh is None:
            step_jit = jax.jit(pool_step)
        else:
            row1, row2, row3 = self._row_shardings
            rep = self._rep_sharding
            step_jit = jax.jit(
                pool_step,
                in_shardings=(rep, rep, row3, row2, row2, row1, rep),
                out_shardings=(row3, (row2, row2)),
            )
        self._step_c = (
            step_jit
            .lower(params, self._ops, x_spec, u_spec, y_spec, m_spec, key_spec)
            .compile()
        )
        self._forecast_c = {}
        self._replay_c = {}
        self._replay_buckets = normalize_replay_ladder(replay_buckets)
        for k in self._replay_buckets:
            # AOT: failover-time compiles are unaffordable
            self._replay_compiled(k)

        self._init_host_state()

    def _init_host_state(self) -> None:
        """Empty-fleet host state. ONE place on purpose: the artifact
        loader (export_pool.ExportedFilterPool) builds its instance
        without this constructor and calls this instead — a new host
        field added here reaches both pools automatically."""
        m = self.model
        self._x = self._commit_x(
            jnp.zeros((self.capacity, m.samples, m.dim_x), m.dtype)
        )
        self._slots: dict = {}  # sid -> slot
        self._free = list(range(self.capacity - 1, -1, -1))  # pop() -> slot 0 first
        self._next_sid = 0
        self._tick = 0

    def _commit_x(self, x):
        """Pin the ensemble to its row sharding (eager scatter updates
        on attach/detach would otherwise leave XLA-chosen placement)."""
        if self.mesh is None:
            return x
        return jax.device_put(x, self._row_shardings[2])

    def _put_rows(self, u, y, mask):
        """Place per-tick host inputs with the row sharding (AOT
        executables require committed inputs to match their compiled
        shardings; uncommitted arrays are fine unsharded)."""
        if self.mesh is None:
            return jnp.asarray(u), jnp.asarray(y), jnp.asarray(mask)
        row1, row2, _ = self._row_shardings
        return (
            jax.device_put(u, row2),
            jax.device_put(y, row2),
            jax.device_put(mask, row1),
        )

    # --- session management --------------------------------------------

    @property
    def active(self) -> int:
        return len(self._slots)

    def reload_params(self, params) -> None:
        """Hot-swap the fleet's trained checkpoint WITHOUT dropping any
        session: every session's ensemble, the tick counter, slot
        table, and PRNG stream carry over; the new dynamics apply from
        the next tick. No recompile (params/ops are call arguments);
        only ``filter_ops`` is recomputed, re-placed on the mesh when
        sharded. Through :class:`FilterBatcher` the swap serializes
        between dispatches; pinned by test equal to a fresh pool with
        the new checkpoint restored from this pool's ``state``.

        Exported pools do NOT support this (by design — an exported
        artifact freezes params+program as one validated deployment
        unit; see export_pool.ExportedFilterPool.reload_params)."""
        self.params = validate_params_like(self.params, params)
        self._ops = jax.jit(self.model.filter_ops)(self.params)
        if self.mesh is not None:
            self._ops = jax.device_put(self._ops, self._rep_sharding)

    def attach(self, u_prefix, y_prefix) -> int:
        """Start a session from a recog_len warmup window (the same
        recognition program training uses); returns its session id."""
        if not self._free:
            raise RuntimeError(f"pool full ({self.capacity} sessions)")
        dtype = self.model.dtype
        recog_len = int(self.model.config.recog_len)
        u = jnp.asarray(np.asarray(u_prefix), dtype=dtype)
        y = jnp.asarray(np.asarray(y_prefix), dtype=dtype)
        if u.shape != (recog_len, self.model.dim_u):
            raise ValueError(
                f"u_prefix must be [{recog_len}, {self.model.dim_u}] "
                f"(one session), got {u.shape}"
            )
        if y.shape != (recog_len, self.model.dim_y):
            raise ValueError(
                f"y_prefix must be [{recog_len}, {self.model.dim_y}] to "
                f"match u_prefix, got {y.shape}"
            )
        x0 = self._init_c(self.params, u[None], y[None])
        slot = self._free.pop()
        self._x = self._commit_x(self._x.at[slot].set(x0[0]))
        sid = self._next_sid
        self._next_sid += 1
        self._slots[sid] = slot
        return sid

    def detach(self, sid: int) -> None:
        """End a session; its slot is zeroed and becomes reusable."""
        slot = self._slots.pop(sid)  # KeyError on unknown sid
        self._x = self._commit_x(self._x.at[slot].set(0.0))
        self._free.append(slot)

    # --- the two programs ----------------------------------------------

    def step(self, inputs: dict) -> dict:
        """Advance the sessions in ``inputs`` — ``{sid: (u_prev [du],
        y_new [dy])}`` — by one conditioned transition in ONE device
        dispatch; sessions not listed hold their state. Returns
        ``{sid: (mean [dy], var [dy])}`` (numpy) of filtered
        observation-space moments."""
        if not inputs:
            raise ValueError("step() needs at least one session input")
        model = self.model
        dtype = model.dtype
        u_full = np.zeros((self.capacity, model.dim_u), dtype)
        y_full = np.zeros((self.capacity, model.dim_y), dtype)
        mask = np.zeros((self.capacity,), np.bool_)
        for sid, (u, y) in inputs.items():
            slot = self._slots[sid]  # KeyError on unknown sid
            u = np.asarray(u, dtype=dtype)
            y = np.asarray(y, dtype=dtype)
            if u.shape != (model.dim_u,) or y.shape != (model.dim_y,):
                raise ValueError(
                    f"session {sid}: expected u [{model.dim_u}] and "
                    f"y [{model.dim_y}], got {u.shape} / {y.shape}"
                )
            u_full[slot], y_full[slot], mask[slot] = u, y, True
        key = jax.random.fold_in(self._base_key, self._tick)
        u_dev, y_dev, m_dev = self._put_rows(u_full, y_full, mask)
        self._x, (mean, var) = self._step_c(
            self.params, self._ops, self._x, u_dev, y_dev, m_dev, key,
        )
        self._tick += 1
        mean, var = np.asarray(mean), np.asarray(var)  # host fan-out
        return {
            sid: (mean[self._slots[sid]], var[self._slots[sid]])
            for sid in inputs
        }

    def _forecast_compiled(self, h: int):
        """AOT pool-forecast program for horizon ``h`` (compiled
        lazily, cached). Overridden by the exported-artifact pool,
        whose horizons are fixed at export time."""
        if h not in self._forecast_c:
            model = self.model
            dtype = model.dtype
            fc_fn = lambda p, ops, x, uu, k: model.forecast(p, ops, x, uu, k)
            if self.mesh is None:
                fc_jit = jax.jit(fc_fn)
            else:
                _, row2, row3 = self._row_shardings
                rep = self._rep_sharding
                fc_jit = jax.jit(
                    fc_fn,
                    in_shardings=(rep, rep, row3, row3, rep),
                    out_shardings=(row3, row3),
                )
            self._forecast_c[h] = (
                fc_jit
                .lower(
                    self.params, self._ops,
                    jax.ShapeDtypeStruct(self._x.shape, self._x.dtype),
                    jax.ShapeDtypeStruct(
                        (self.capacity, h, model.dim_u), dtype),
                    jax.ShapeDtypeStruct(
                        self._base_key.shape, self._base_key.dtype
                    ),
                )
                .compile()
            )
        return self._forecast_c[h]

    def _replay_compiled(self, k: int):
        """AOT pool-replay program for a K-tick block (cached per
        length): the model's fused scan with a per-(tick, slot) active
        mask, so sessions with ragged backlog lengths catch up in the
        same dispatch. Start tick and mask are runtime arguments."""
        if k not in self._replay_c:
            model = self.model
            if not hasattr(model, "filter_replay"):
                raise TypeError(
                    f"{type(model).__name__} has no filter_replay; "
                    "fused backlog replay supports CBFSSMHALF and Voliro"
                )
            dtype = model.dtype
            x_spec = jax.ShapeDtypeStruct(
                (self.capacity, model.samples, model.dim_x), dtype
            )
            u_spec = jax.ShapeDtypeStruct((self.capacity, k, model.dim_u), dtype)
            y_spec = jax.ShapeDtypeStruct((self.capacity, k, model.dim_y), dtype)
            a_spec = jax.ShapeDtypeStruct((k, self.capacity), np.bool_)
            key_spec = jax.ShapeDtypeStruct(
                self._base_key.shape, self._base_key.dtype
            )
            t0_spec = jax.ShapeDtypeStruct((), np.uint32)

            def pool_replay(p, ops, x, u, y, a, bk, t0):
                return model.filter_replay(p, ops, x, u, y, bk, t0, active=a)

            if self.mesh is None:
                rp_jit = jax.jit(pool_replay)
            else:
                _, _, row3 = self._row_shardings
                rep = self._rep_sharding
                rp_jit = jax.jit(
                    pool_replay,
                    in_shardings=(rep, rep, row3, row3, row3,
                                  self._mask_t_sharding, rep, rep),
                    out_shardings=(row3, (row3, row3)),
                )
            self._replay_c[k] = (
                rp_jit
                .lower(self.params, self._ops, x_spec, u_spec, y_spec,
                       a_spec, key_spec, t0_spec)
                .compile()
            )
        return self._replay_c[k]

    def replay(self, inputs: dict) -> dict:
        """Catch the sessions in ``inputs`` — ``{sid: (u [K_i, du],
        y [K_i, dy])}``, per-session backlog lengths may differ — up on
        their backlogs in ONE fused dispatch per bucket chunk; sessions
        not listed hold their state throughout. Matches the sequential
        schedule where tick t carries exactly the sessions with
        K_i > t, to f64 last-ulp scan-fusion noise (pinned at rtol
        1e-12 by test). Returns ``{sid:
        (mean [K_i, dy], var [K_i, dy])}`` (numpy)."""
        if not inputs:
            raise ValueError("replay() needs at least one session input")
        model = self.model
        dtype = model.dtype
        staged = {}
        for sid, (u, y) in inputs.items():
            slot = self._slots[sid]  # KeyError on unknown sid
            u = np.asarray(u, dtype=dtype)
            y = np.asarray(y, dtype=dtype)
            if u.ndim != 2 or u.shape[1] != model.dim_u or u.shape[0] < 1:
                raise ValueError(
                    f"session {sid}: backlog u must be [K>=1, "
                    f"{model.dim_u}], got {u.shape}"
                )
            if y.shape != (u.shape[0], model.dim_y):
                raise ValueError(
                    f"session {sid}: backlog y must be [{u.shape[0]}, "
                    f"{model.dim_y}] to match u, got {y.shape}"
                )
            staged[slot] = (sid, u, y)
        k_total = max(u.shape[0] for _, u, _ in staged.values())
        u_full = np.zeros((self.capacity, k_total, model.dim_u), dtype)
        y_full = np.zeros((self.capacity, k_total, model.dim_y), dtype)
        act = np.zeros((k_total, self.capacity), np.bool_)
        for slot, (_, u, y) in staged.items():
            ki = u.shape[0]
            u_full[slot, :ki] = u
            y_full[slot, :ki] = y
            act[:ki, slot] = True
        means, vars_ = [], []
        for u_c, y_c, a_c, k_act in iter_replay_chunks(
                u_full, y_full, self._replay_buckets, active_full=act):
            if self.mesh is None:
                u_d, y_d = jnp.asarray(u_c), jnp.asarray(y_c)
                a_d = jnp.asarray(a_c)
            else:
                u_d = jax.device_put(u_c, self._row_shardings[2])
                y_d = jax.device_put(y_c, self._row_shardings[2])
                a_d = jax.device_put(a_c, self._mask_t_sharding)
            self._x, (m, v) = self._replay_compiled(u_c.shape[1])(
                self.params, self._ops, self._x, u_d, y_d, a_d,
                self._base_key, np.uint32(self._tick),
            )
            self._tick += k_act
            means.append(np.asarray(m)[:, :k_act])
            vars_.append(np.asarray(v)[:, :k_act])
        mean = means[0] if len(means) == 1 else np.concatenate(means, axis=1)
        var = vars_[0] if len(vars_) == 1 else np.concatenate(vars_, axis=1)
        out = {}
        for slot, (sid, u, _) in staged.items():
            ki = u.shape[0]
            out[sid] = (mean[slot, :ki], var[slot, :ki])
        return out

    def forecast(self, inputs: dict) -> dict:
        """Free-run the sessions in ``inputs`` — ``{sid: u_future
        [H, du]}``, one shared horizon H — in ONE dispatch without
        advancing any state. Returns ``{sid: (mean [H, dy],
        var [H, dy])}`` (numpy)."""
        if not inputs:
            raise ValueError("forecast() needs at least one session input")
        model = self.model
        dtype = model.dtype
        for sid, u in inputs.items():
            shape = np.asarray(u).shape
            # validate rank/length up front: a 1-D [du] input would
            # otherwise read du as the horizon (misleading error), a
            # 0-d one would die on the tuple unpack below, and an
            # empty [0, du] would AOT-compile a useless H=0 program
            if len(shape) != 2 or shape[0] < 1:
                raise ValueError(
                    f"session {sid}: u_future must be [H >= 1, "
                    f"{model.dim_u}], got {shape}"
                )
        horizons = {np.asarray(u).shape[:1] for u in inputs.values()}
        if len(horizons) != 1:
            raise ValueError(
                f"all sessions must share one horizon, got {sorted(horizons)}"
            )
        (h,) = horizons.pop()
        u_full = np.zeros((self.capacity, h, model.dim_u), dtype)
        for sid, u in inputs.items():
            slot = self._slots[sid]
            u = np.asarray(u, dtype=dtype)
            if u.shape != (h, model.dim_u):
                raise ValueError(
                    f"session {sid}: u_future must be [{h}, {model.dim_u}], "
                    f"got {u.shape}"
                )
            u_full[slot] = u
        # forecast keys live in a disjoint fold range from step keys
        key = jax.random.fold_in(self._base_key, 2**30 + self._tick)
        u_dev = (
            jnp.asarray(u_full)
            if self.mesh is None
            else jax.device_put(u_full, self._row_shardings[2])
        )
        mean, var = self._forecast_compiled(h)(
            self.params, self._ops, self._x, u_dev, key
        )
        mean, var = np.asarray(mean), np.asarray(var)
        return {
            sid: (mean[self._slots[sid]], var[self._slots[sid]])
            for sid in inputs
        }

    # --- failover -------------------------------------------------------

    @property
    def state(self):
        """(ensemble [C, S, dx], tick, {sid: slot}, next_sid, base PRNG
        key) — all host values, serializable. The key rides along so a
        standby constructed with a DIFFERENT seed still resumes the
        primary's exact draw stream (keys fold from base by tick)."""
        return (
            np.asarray(self._x), self._tick, dict(self._slots),
            self._next_sid, np.asarray(self._base_key),
        )

    def load_state(self, state) -> None:
        if len(state) == 4:  # pre-key snapshots: keep this seed's key
            (x, tick, slots, next_sid), key = state, None
        else:
            x, tick, slots, next_sid, key = state
        if np.asarray(x).shape != self._x.shape:
            raise ValueError(
                f"state ensemble shape {np.asarray(x).shape} != pool "
                f"shape {self._x.shape}"
            )
        # coerce BEFORE validating and storing: a string-typed slot
        # ("3") would pass the int()-based checks below but then miss
        # the used-set, leave its row on the free list, and be handed
        # to the next attach() — silent cross-wiring. Coercion can
        # also collapse aliased keys ("5"/"+5"); refuse that rather
        # than drop a session mapping.
        raw_len = len(dict(slots))
        slots = {int(s): int(v) for s, v in dict(slots).items()}
        if len(slots) != raw_len:
            raise ValueError("duplicate session ids in state table")
        # fail fast on a corrupt session table: a duplicate slot would
        # silently cross-wire two sessions onto one ensemble row, an
        # out-of-range slot would die later inside step() with a bare
        # IndexError far from the bad load
        bad = {s: v for s, v in slots.items()
               if not 0 <= int(v) < self.capacity}
        if bad:
            raise ValueError(
                f"state maps sessions to out-of-range slots {bad} "
                f"(capacity {self.capacity})"
            )
        if len(set(slots.values())) != len(slots):
            raise ValueError(
                f"state maps multiple sessions to one slot: {slots}"
            )
        # next_sid must clear every live sid: attach() hands out
        # self._next_sid unconditionally, so a snapshot with
        # next_sid <= max(sids) would later reissue a live sid —
        # attach would overwrite that session's slot mapping, its
        # estimator would silently step the NEW session's ensemble
        # row, and the old row would leak from the free list
        if slots and int(next_sid) <= max(int(s) for s in slots):
            raise ValueError(
                f"state next_sid {int(next_sid)} collides with live "
                f"session ids (max {max(int(s) for s in slots)})"
            )
        self._base_key = StreamingFilter._restore_key(key, self._base_key)
        self._x = self._commit_x(jnp.asarray(x, self.model.dtype))
        self._tick = int(tick)
        self._slots = slots
        used = set(self._slots.values())
        self._free = [s for s in range(self.capacity - 1, -1, -1) if s not in used]
        self._next_sid = int(next_sid)


class BucketedPredictor:
    """Serves ANY request size over a precompiled ladder of batch
    buckets.

    Real serving traffic has variable request sizes, but XLA wants one
    compiled shape per program. Measured on-chip (BENCHMARKS.md
    "Serving latency"): a 32-sequence batch costs only +12% latency
    over a single sequence — so padding a request up to the next bucket
    wastes almost nothing, and requests larger than the top bucket are
    chunked through it at its (near-flat) per-batch cost.

    Per-sequence results are independent of the padding content: the
    [T, B, S] noise draws are indexed by row position and the GP
    predict batches rows independently, so row i of a padded batch is
    bitwise identical whatever sits in the pad rows (pinned by test).
    The scalar ``mse`` aggregate is recomputed over the REAL rows only.

    >>> pred = BucketedPredictor(model, params, seq_len=300, buckets=(1, 8, 32))
    >>> out = pred(u, y)        # u: [n, 300, du] for any n >= 1
    """

    # Measured serving economics (BENCHMARKS.md "Serving latency"): a
    # dispatch costs ~1 unit of fixed overhead plus ~0.39% per padded
    # row (a 32-row batch measured +12% over a single row).
    MEASURED_COST = (1.0, 0.12 / 31)

    def __init__(self, model, params, seq_len: int, buckets=(1, 8, 32),
                 condition: bool = False, seed: int = 0):
        if not buckets:
            raise ValueError("need at least one bucket size")
        self.buckets = sorted(set(int(b) for b in buckets))
        if self.buckets[0] < 1:
            # a 0-row bucket would AOT-compile a useless program and
            # then die at serve time with an opaque range() error
            raise ValueError(f"bucket sizes must be >= 1, got {buckets}")
        self.seq_len = seq_len
        self.model = model
        self.params = params
        self._preds = {
            b: CompiledPredictor(model, params, b, seq_len, condition, seed)
            for b in self.buckets
        }

    def reload_params(self, params) -> None:
        """Hot-swap the served checkpoint across every bucket (no
        recompiles; see :meth:`CompiledPredictor.reload_params`).
        Validated once, then assigned to each bucket — an invalid
        checkpoint changes nothing."""
        new = validate_params_like(self.params, params)
        self.params = new
        for pred in self._preds.values():
            pred.params = new

    @staticmethod
    def plan_buckets(sizes, max_buckets: int, cost=None):
        """Optimal bucket ladder for a traffic histogram.

        ``sizes``: observed request sizes (one entry per request).
        ``max_buckets``: compile budget — each bucket is one AOT
        compile held in memory.
        ``cost``: (fixed, per_row) dispatch-cost model; default is the
        measured on-chip economics (:attr:`MEASURED_COST`).

        Exact O(S^2 k) partition DP over the S distinct sizes: each
        request is served by the smallest bucket >= its size, so a
        ladder partitions the sorted sizes into suffix-covered groups
        whose bucket value is the group maximum; the DP minimizes
        sum_requests (fixed + per_row * bucket(size)). Requests larger
        than every observed size chunk through the top bucket at serve
        time (near-flat cost), so the plan covers max(sizes) exactly.
        """
        sizes = np.asarray(sizes, dtype=np.int64).ravel()
        if sizes.size == 0:
            raise ValueError("need at least one observed request size")
        if (sizes < 1).any():
            raise ValueError("request sizes must be >= 1")
        if max_buckets < 1:
            raise ValueError("max_buckets must be >= 1")
        c0, c1 = cost if cost is not None else BucketedPredictor.MEASURED_COST
        uniq, counts = np.unique(sizes, return_counts=True)
        s = len(uniq)
        k = min(int(max_buckets), s)
        csum = np.concatenate(([0], np.cumsum(counts)))  # prefix counts
        inf = float("inf")
        dp = np.full((s + 1, k + 1), inf)
        dp[0, 0] = 0.0
        cut = np.zeros((s + 1, k + 1), dtype=np.int64)
        for j in range(1, s + 1):
            bucket_cost = c0 + c1 * float(uniq[j - 1])
            for m in range(1, k + 1):
                for i in range(j):
                    cand = dp[i, m - 1] + (csum[j] - csum[i]) * bucket_cost
                    if cand < dp[j, m]:
                        dp[j, m] = cand
                        cut[j, m] = i
        m = int(np.argmin(dp[s, 1:])) + 1  # more buckets never cost more
        buckets = []
        j = s
        while m > 0:
            buckets.append(int(uniq[j - 1]))
            j = int(cut[j, m])
            m -= 1
        return sorted(buckets)

    @staticmethod
    def expected_cost(buckets, sizes, cost=None):
        """Mean per-request dispatch cost of a ladder under the cost
        model (chunked through the top bucket above it) — the quantity
        :meth:`plan_buckets` minimizes, exposed for tests/tuning."""
        c0, c1 = cost if cost is not None else BucketedPredictor.MEASURED_COST
        buckets = sorted(set(int(b) for b in buckets))
        top = buckets[-1]
        total = 0.0
        for n in np.asarray(sizes, dtype=np.int64).ravel():
            n = int(n)
            full, rest = divmod(n, top)
            total += full * (c0 + c1 * top)
            if rest:
                b = next(b for b in buckets if b >= rest)
                total += c0 + c1 * b
        return total / max(1, np.asarray(sizes).size)

    @classmethod
    def from_histogram(cls, model, params, seq_len: int, sizes,
                       max_buckets: int = 3, cost=None,
                       condition: bool = False, seed: int = 0):
        """Build a predictor whose bucket ladder is optimized for an
        observed traffic histogram under a compile budget (the repo
        roadmap item: the ladder was previously hand-chosen)."""
        buckets = cls.plan_buckets(sizes, max_buckets, cost)
        return cls(model, params, seq_len, buckets=buckets,
                   condition=condition, seed=seed)

    def _one_batch(self, u, y, key):
        """Pad one <=max-bucket request up to its bucket, predict, and
        slice the real rows back out."""
        n = u.shape[0]
        bucket = next(b for b in self.buckets if b >= n)
        pad = bucket - n
        if pad:
            u = np.concatenate([u, np.zeros((pad,) + u.shape[1:], u.dtype)])
            y = np.concatenate([y, np.zeros((pad,) + y.shape[1:], y.dtype)])
        out = self._preds[bucket](u, y, key)
        if pad:
            out = jax.tree_util.tree_map(
                lambda a: a[:n] if getattr(a, "ndim", 0) else a, out
            )
        return out

    def __call__(self, u, y, key=None):
        u = np.asarray(u)
        y = np.asarray(y)
        if u.ndim != 3 or u.shape[1:] != (self.seq_len, self.model.dim_u):
            raise ValueError(
                f"expected [n, {self.seq_len}, {self.model.dim_u}] input, "
                f"got {u.shape}"
            )
        if y.ndim != 3 or y.shape != (u.shape[0], self.seq_len,
                                      self.model.dim_y):
            # a mismatched y would otherwise fail deep inside the AOT
            # executable with a misleading compiled-signature error
            raise ValueError(
                f"y must be [{u.shape[0]}, {self.seq_len}, "
                f"{self.model.dim_y}] to match u, got {y.shape}"
            )
        if u.shape[0] == 0:
            raise ValueError("need at least one sequence per request")
        top = self.buckets[-1]
        base_key = self._preds[top].key if key is None else key
        # distinct key per chunk: rows in different chunks must get
        # independent MC draws, not copies of the same sample paths
        outs = [
            self._one_batch(
                u[i : i + top], y[i : i + top],
                jax.random.fold_in(base_key, i // top),
            )
            for i in range(0, u.shape[0], top)
        ]
        out = (
            outs[0]
            if len(outs) == 1
            else jax.tree_util.tree_map(
                lambda *a: jnp.concatenate(a, axis=0) if a[0].ndim else a[0], *outs
            )
        )
        # the per-chunk scalar mse aggregated pad/chunk-wise is not the
        # request-level number; recompute over the real rows. Keep the
        # host copy in the returned tree: downstream host consumers
        # (MicroBatcher's fan-out) would otherwise transfer pred_mean a
        # second time.
        pred_mean = np.asarray(out.pred_mean)
        mse = float(np.mean((pred_mean - y[..., : pred_mean.shape[-1]]) ** 2))
        return out.replace(
            pred_mean=pred_mean, mse=jnp.asarray(mse, dtype=pred_mean.dtype)
        )


class _CoalescingBatcher:
    """Shared queue/shutdown/coalescing machinery for the serving
    front-ends (:class:`MicroBatcher`, :class:`FilterBatcher`).

    The enqueue-vs-shutdown sentinel protocol is the subtlest
    concurrency code in this module; it lives HERE, once, so a fix to
    one front-end can never silently miss the other:

    - ``_enqueue`` serializes against ``close()`` (the submit lock):
      a producer that passed the ``_closing`` check must never enqueue
      BEHIND the shutdown sentinel, or its future would never resolve;
    - ``close(drain=False)`` fails every pending future before
      planting the sentinel; with ``drain`` the dispatcher serves the
      backlog first;
    - the dispatcher runs a defensive post-sentinel sweep anyway;
    - ``_collect`` blocks for the first item then coalesces until the
      ``max_wait`` deadline or ``_collect_cap()`` items.

    Subclasses provide ``_collect_cap()`` and ``_serve(batch)`` and
    enqueue item tuples whose last two fields are ``(future,
    enqueue_timestamp)`` — all the base machinery touches.
    """

    def __init__(self, max_wait_ms: float, queue_size: int, stats: dict,
                 thread_name: str):
        if max_wait_ms < 0:
            raise ValueError("max_wait_ms must be >= 0")
        self.max_wait = float(max_wait_ms) / 1e3
        self._queue: _queue.Queue = _queue.Queue(maxsize=queue_size)
        self._closing = False
        self._lock = threading.Lock()
        # Serializes enqueue vs shutdown: without it a submit() that
        # passed the _closing check could enqueue BEHIND close()'s
        # sentinel after the dispatcher's final drain sweep, leaving a
        # future that never resolves. Separate from _lock so a producer
        # blocked on queue backpressure never delays stats() readers.
        self._submit_lock = threading.Lock()
        self._stats = dict(stats)
        # started LAST: subclasses set their fields before calling up,
        # so the dispatcher never observes a half-built self
        self._thread = threading.Thread(
            target=self._dispatch_loop, name=thread_name, daemon=True
        )
        self._thread.start()

    def _enqueue(self, item) -> None:
        with self._submit_lock:
            if self._closing:
                raise RuntimeError(f"{type(self).__name__} is closed")
            # blocking put under the lock is safe: the dispatcher
            # drains the queue without taking this lock
            self._queue.put(item)

    def close(self, drain: bool = True) -> None:
        """Stop accepting work and shut the dispatcher down. With
        ``drain`` (default) pending items are served first; otherwise
        their futures get a RuntimeError."""
        with self._submit_lock:
            already = self._closing
            self._closing = True
            if not already:
                if not drain:
                    try:
                        while True:
                            *_, fut, _t = self._queue.get_nowait()
                            if fut.set_running_or_notify_cancel():
                                fut.set_exception(RuntimeError(
                                    f"{type(self).__name__} closed "
                                    f"before dispatch"
                                ))
                    except _queue.Empty:
                        pass
                # sentinel: drain up to here, then exit. The lock
                # guarantees no item is ever enqueued behind it.
                self._queue.put(None)
        self._thread.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    # --- dispatcher thread ----------------------------------------------

    def _collect(self):
        """Block for the first item, then coalesce until
        ``_collect_cap()`` items or the max_wait deadline. Returns a
        list of queue items, or None at the shutdown sentinel."""
        first = self._queue.get()
        if first is None:
            return None
        batch = [first]
        deadline = time.perf_counter() + self.max_wait
        cap = self._collect_cap()
        while len(batch) < cap:
            remaining = deadline - time.perf_counter()
            try:
                item = (
                    self._queue.get_nowait()
                    if remaining <= 0
                    else self._queue.get(timeout=remaining)
                )
            except _queue.Empty:
                break
            if item is None:
                self._queue.put(None)  # keep the sentinel for loop exit
                break
            batch.append(item)
        return batch

    def _dispatch_loop(self):
        while True:
            batch = self._collect()
            if batch is None:
                # defensive sweep: the submit lock means nothing should
                # land behind the sentinel; fail any stragglers anyway
                try:
                    while True:
                        item = self._queue.get_nowait()
                        if item is None:
                            continue
                        *_, fut, _t = item
                        if fut.set_running_or_notify_cancel():
                            fut.set_exception(RuntimeError(
                                f"{type(self).__name__} closed before "
                                f"dispatch"
                            ))
                except _queue.Empty:
                    return
                continue
            self._serve(batch)

    def _collect_cap(self) -> int:  # pragma: no cover - abstract
        raise NotImplementedError

    def _serve(self, batch) -> None:  # pragma: no cover - abstract
        raise NotImplementedError


class MicroBatcher(_CoalescingBatcher):
    """Transport-agnostic request-coalescing front-end for a predictor.

    A deployed service receives single-sequence requests from many
    connections, but the chip is at its best on one batched dispatch
    (measured: a 32-row batch costs only +12% latency over one row —
    BENCHMARKS.md "Serving latency"). This sits between any transport
    (HTTP/gRPC handler threads, an asyncio bridge, a test loop) and a
    batch predictor: callers :meth:`submit` one ``[T, du]/[T, dy]``
    sequence each and receive a ``concurrent.futures.Future``; a single
    dispatcher thread coalesces queued requests into batches bounded by
    ``max_batch`` and ``max_wait_ms``, serves each batch in ONE
    predictor call, and fans the rows back out to the futures.

    The wrapped ``predictor`` must accept ``(u [n, T, du], y [n, T,
    dy], key)`` for any ``n >= 1`` AND expose ``.model`` (with
    ``dtype``/``dim_u``/``dim_y``) and ``.seq_len`` — submit() uses
    them to validate/cast requests up front. A
    :class:`BucketedPredictor` is the intended pairing: coalesced batch
    sizes vary with load, which is exactly what its bucket ladder
    absorbs.

    All device work happens on the dispatcher thread (one JAX client,
    no cross-thread dispatch races). Each batch uses an independent
    fold of the seed key; a request's draws depend on its row position
    within the coalesced batch (pad-row independence is pinned for the
    bucket path, so co-batched *content* never leaks across rows).

    >>> mb = MicroBatcher(BucketedPredictor(model, params, seq_len=300))
    >>> fut = mb.submit(u_seq, y_seq)   # from any thread
    >>> out = fut.result()              # PredictOutput, numpy [1, T, .]
    >>> mb.close()                      # or use as a context manager

    ``transport is deployment-specific`` stays true: this class owns
    queueing/batching only — bring your own socket layer.
    """

    def __init__(self, predictor, max_batch: int = 32,
                 max_wait_ms: float = 2.0, queue_size: int = 1024,
                 seed: int = 0):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self.predictor = predictor
        self.max_batch = int(max_batch)
        self._key = jax.random.PRNGKey(seed)
        self._batch_idx = 0
        super().__init__(max_wait_ms, queue_size, {
            "requests": 0, "batches": 0, "errors": 0,
            "batched_rows": 0, "max_batch_seen": 0, "wait_s": 0.0,
        }, "cbfssm-microbatcher")

    # --- client side ----------------------------------------------------

    def submit(self, u, y) -> Future:
        """Enqueue one sequence; returns a Future resolving to the
        request's :class:`PredictOutput` view (leaves ``[1, T, .]``,
        ``mse`` recomputed over this request alone). Thread-safe.
        Blocks (backpressure) when ``queue_size`` requests are pending.
        """
        model = self.predictor.model
        seq_len = self.predictor.seq_len
        u = np.asarray(u, dtype=model.dtype)
        y = np.asarray(y, dtype=model.dtype)
        if u.shape != (seq_len, model.dim_u):
            raise ValueError(
                f"u must be [{seq_len}, {model.dim_u}] (one sequence), "
                f"got {u.shape}"
            )
        if y.shape != (seq_len, model.dim_y):
            raise ValueError(
                f"y must be [{seq_len}, {model.dim_y}] to match u, got {y.shape}"
            )
        fut: Future = Future()
        self._enqueue((u, y, fut, time.perf_counter()))
        return fut

    def __call__(self, u, y, timeout=None):
        """Synchronous convenience: submit + wait."""
        return self.submit(u, y).result(timeout)

    def stats(self) -> dict:
        """Occupancy/latency counters: requests, batches, errors,
        mean_batch_size, max_batch_seen, mean_wait_ms."""
        with self._lock:
            s = dict(self._stats)
        n, b = s.pop("batched_rows"), s["batches"]
        wait = s.pop("wait_s")
        s["mean_batch_size"] = n / b if b else 0.0
        s["mean_wait_ms"] = 1e3 * wait / n if n else 0.0
        return s

    # --- dispatcher thread ----------------------------------------------

    def _collect_cap(self) -> int:
        return self.max_batch

    def _serve(self, batch) -> None:
        t_dispatch = time.perf_counter()
        live = [(u, y, f, t) for (u, y, f, t) in batch
                if f.set_running_or_notify_cancel()]
        with self._lock:
            self._stats["requests"] += len(batch)
            if live:
                self._stats["batches"] += 1
                self._stats["batched_rows"] += len(live)
                self._stats["max_batch_seen"] = max(
                    self._stats["max_batch_seen"], len(live)
                )
                self._stats["wait_s"] += sum(
                    t_dispatch - t for *_, t in live
                )
        if not live:
            return
        # consume the fold unconditionally: a failed dispatch must
        # not hand its key to the next batch (keys stay independent
        # even if a retry layer re-submits the failed rows)
        key_idx, self._batch_idx = self._batch_idx, self._batch_idx + 1
        try:
            u = np.stack([u for u, *_ in live])
            y = np.stack([y for _, y, *_ in live])
            out = self.predictor(
                u, y, jax.random.fold_in(self._key, key_idx)
            )
            # fan out on HOST: one device->host transfer per leaf,
            # then numpy row slices — per-row slicing of device
            # arrays would cost one tiny dispatch per (row, leaf),
            # which dominates on dispatch-latency-bound rigs
            # (measured: host fan-out took the 32-client coalescing
            # speedup from 3.1x to 5.6x on the tunnel;
            # BENCHMARKS.md "Microbatched serving")
            out = jax.tree_util.tree_map(np.asarray, out)
            pred_mean = out.pred_mean
            for i, (_, y_i, fut, _t) in enumerate(live):
                mse_i = np.mean(
                    (pred_mean[i] - y_i[:, : pred_mean.shape[-1]]) ** 2
                )
                row = jax.tree_util.tree_map(
                    lambda a: a[i : i + 1] if getattr(a, "ndim", 0) else a,
                    out,
                )
                fut.set_result(
                    row.replace(mse=mse_i.astype(pred_mean.dtype))
                )
        except Exception as exc:
            # a mid-fan-out failure leaves earlier rows already
            # resolved; those count as served, and set_exception on
            # a done future raises InvalidStateError (which would
            # kill the dispatcher) — fail only the pending ones
            failed = 0
            for *_, fut, _t in live:
                if not fut.done():
                    fut.set_exception(exc)
                    failed += 1
            with self._lock:
                self._stats["errors"] += failed


class FilterBatcher(_CoalescingBatcher):
    """Transport-agnostic coalescing front-end for a :class:`FilterPool`.

    A FilterPool must be driven from one control loop (its contract);
    a transport with one handler thread per connected estimator needs
    (a) every pool operation serialized onto a single thread and
    (b) concurrent per-session submissions coalesced into the pool's
    one-dispatch fleet programs — the same economics MicroBatcher
    gives stateless prediction (one dispatch replaces N ~29 ms
    roundtrips on this rig; BENCHMARKS.md "Online estimation fleets").
    This class owns both: callers submit per-session operations from
    any thread and receive Futures; a single dispatcher thread drains
    the queue in FIFO order, groups ADJACENT compatible operations
    (same kind, distinct sessions, and for forecast one shared
    horizon — the pool-program constraints), and serves each group in
    one pool call.

    >>> fb = FilterBatcher(FilterPool(model, params, capacity=32))
    >>> sid = fb.attach(u_prefix, y_prefix).result()
    >>> mean, var = fb.step(sid, u_prev, y_new).result()
    >>> fb.forecast(sid, u_future).result()    # (mean [H, dy], var)
    >>> fb.replay(sid, u_block, y_block).result()   # fused catch-up
    >>> fb.detach(sid).result(); fb.close()

    Grouping preserves per-session FIFO order: the queue is drained in
    submission order and a second operation for a session already in
    the open group closes the group first (a session's operations
    never ride one dispatch twice, and never reorder). A session's
    RESULT still depends on which pool tick its group lands on (the
    pool folds keys by tick), exactly as if the same groups were
    played into a bare pool — pinned by test against such a replay.

    ``attach``/``detach``/``state``/``load_state`` run as singleton
    items on the dispatcher thread, so session lifecycle and failover
    snapshots serialize cleanly with in-flight fleet dispatches. A
    failed item (unknown session, bad shapes surviving submit-side
    checks) fails ITS future; co-grouped sessions are unaffected —
    group-wide exceptions happen only when the pool program itself
    raises, which none of the per-item conditions can trigger.
    """

    _GROUPABLE = ("step", "forecast", "replay")

    def __init__(self, pool, max_wait_ms: float = 2.0,
                 queue_size: int = 1024):
        self.pool = pool
        super().__init__(max_wait_ms, queue_size, {
            "requests": 0, "dispatches": 0, "errors": 0,
            "grouped_ops": 0, "max_group_seen": 0, "wait_s": 0.0,
        }, "cbfssm-filterbatcher")

    # --- client side (any thread) ---------------------------------------

    def _submit(self, kind, sid, payload) -> Future:
        fut: Future = Future()
        self._enqueue((kind, sid, payload, fut, time.perf_counter()))
        return fut

    def attach(self, u_prefix, y_prefix) -> Future:
        """Future resolving to the new session id. Shape errors raise
        here (submit side), not in the future."""
        model = self.pool.model
        recog_len = int(model.config.recog_len)
        u = np.asarray(u_prefix, dtype=model.dtype)
        y = np.asarray(y_prefix, dtype=model.dtype)
        if u.shape != (recog_len, model.dim_u):
            raise ValueError(
                f"u_prefix must be [{recog_len}, {model.dim_u}] "
                f"(one session), got {u.shape}"
            )
        if y.shape != (recog_len, model.dim_y):
            raise ValueError(
                f"y_prefix must be [{recog_len}, {model.dim_y}] to match "
                f"u_prefix, got {y.shape}"
            )
        return self._submit("attach", None, (u, y))

    def detach(self, sid: int) -> Future:
        """Future resolving to None once the slot is released."""
        return self._submit("detach", int(sid), None)

    def step(self, sid: int, u_prev, y_new) -> Future:
        """Future resolving to this session's ``(mean [dy], var [dy])``
        filtered moments; concurrent steps of other sessions may ride
        the same device dispatch."""
        model = self.pool.model
        u = np.asarray(u_prev, dtype=model.dtype)
        y = np.asarray(y_new, dtype=model.dtype)
        if u.shape != (model.dim_u,) or y.shape != (model.dim_y,):
            raise ValueError(
                f"expected u [{model.dim_u}] and y [{model.dim_y}], "
                f"got {u.shape} / {y.shape}"
            )
        return self._submit("step", int(sid), (u, y))

    def forecast(self, sid: int, u_future) -> Future:
        """Future resolving to ``(mean [H, dy], var [H, dy])`` without
        advancing state; coalesces with same-horizon forecasts."""
        model = self.pool.model
        u = np.asarray(u_future, dtype=model.dtype)
        if u.ndim != 2 or u.shape[1] != model.dim_u or u.shape[0] < 1:
            raise ValueError(
                f"u_future must be [H>=1, {model.dim_u}], got {u.shape}"
            )
        return self._submit("forecast", int(sid), u)

    def replay(self, sid: int, u_block, y_block) -> Future:
        """Future resolving to ``(mean [K, dy], var [K, dy])`` after a
        fused backlog catch-up; ragged-length replays of other sessions
        may share the dispatch (the pool's per-(tick, slot) mask)."""
        model = self.pool.model
        u = np.asarray(u_block, dtype=model.dtype)
        y = np.asarray(y_block, dtype=model.dtype)
        if u.ndim != 2 or u.shape[1] != model.dim_u or u.shape[0] < 1:
            raise ValueError(
                f"backlog u must be [K>=1, {model.dim_u}], got {u.shape}"
            )
        if y.shape != (u.shape[0], model.dim_y):
            raise ValueError(
                f"backlog y must be [{u.shape[0]}, {model.dim_y}] to "
                f"match u, got {y.shape}"
            )
        return self._submit("replay", int(sid), (u, y))

    def state(self) -> Future:
        """Future resolving to the pool's failover snapshot, taken
        between dispatches (never mid-tick)."""
        return self._submit("state", None, None)

    def load_state(self, state) -> Future:
        """Future resolving to None once the snapshot is restored (same
        serialization guarantee as :meth:`state`)."""
        return self._submit("load_state", None, state)

    def reload_params(self, params) -> Future:
        """Future resolving to None once the fleet serves the new
        checkpoint (hot-swap; sessions keep their state). Runs as a
        singleton item on the dispatcher thread, so the swap lands
        BETWEEN fleet dispatches, never mid-tick."""
        return self._submit("reload_params", None, params)

    def stats(self) -> dict:
        """requests, dispatches (pool calls incl. lifecycle items),
        errors, mean_group_size, max_group_seen, mean_wait_ms."""
        with self._lock:
            s = dict(self._stats)
        n, d = s.pop("grouped_ops"), s["dispatches"]
        wait = s.pop("wait_s")
        s["mean_group_size"] = n / d if d else 0.0
        s["mean_wait_ms"] = 1e3 * wait / n if n else 0.0
        return s

    # --- dispatcher thread ----------------------------------------------

    def _collect_cap(self) -> int:
        # bound one sweep by pool capacity: a group can't exceed it,
        # and a longer sweep would only delay the first item further
        return self.pool.capacity

    def _flush(self, kind, group):
        """Serve one homogeneous group (distinct sids) in one pool
        call; per-item failures (unknown sid) fail only their future."""
        live, inputs = [], {}
        for sid, payload, fut, t in group:
            if not fut.set_running_or_notify_cancel():
                continue
            if sid not in self.pool._slots:
                fut.set_exception(KeyError(f"unknown session {sid}"))
                with self._lock:
                    self._stats["errors"] += 1
                continue
            live.append((sid, fut, t))
            inputs[sid] = payload
        if not live:
            return
        t_dispatch = time.perf_counter()
        with self._lock:
            self._stats["dispatches"] += 1
            self._stats["grouped_ops"] += len(live)
            self._stats["max_group_seen"] = max(
                self._stats["max_group_seen"], len(live)
            )
            self._stats["wait_s"] += sum(t_dispatch - t for *_, t in live)
        try:
            out = getattr(self.pool, kind)(inputs)
            for sid, fut, _t in live:
                fut.set_result(out[sid])
        except Exception as exc:
            failed = 0
            for _sid, fut, _t in live:
                if not fut.done():
                    fut.set_exception(exc)
                    failed += 1
            with self._lock:
                self._stats["errors"] += failed

    def _run_single(self, kind, sid, payload, fut, t):
        """Lifecycle/failover item on the dispatcher thread."""
        if not fut.set_running_or_notify_cancel():
            return
        with self._lock:
            self._stats["dispatches"] += 1
            self._stats["grouped_ops"] += 1
            # keep mean_wait_ms honest: lifecycle items count in the
            # grouped_ops denominator, so their wait belongs in wait_s
            self._stats["wait_s"] += time.perf_counter() - t
        try:
            if kind == "attach":
                fut.set_result(self.pool.attach(*payload))
            elif kind == "detach":
                fut.set_result(self.pool.detach(sid))
            elif kind == "state":
                fut.set_result(self.pool.state)
            elif kind == "reload_params":
                fut.set_result(self.pool.reload_params(payload))
            else:  # load_state
                fut.set_result(self.pool.load_state(payload))
        except Exception as exc:
            fut.set_exception(exc)
            with self._lock:
                self._stats["errors"] += 1

    def _serve(self, batch) -> None:
        with self._lock:
            self._stats["requests"] += len(batch)
        group_kind, group, horizon = None, [], None
        for kind, sid, payload, fut, t in batch:
            if kind not in self._GROUPABLE:
                if group:
                    self._flush(group_kind, group)
                    group_kind, group, horizon = None, [], None
                self._run_single(kind, sid, payload, fut, t)
                continue
            h = payload.shape[0] if kind == "forecast" else None
            boundary = (
                kind != group_kind
                or any(sid == g_sid for g_sid, *_ in group)
                or (kind == "forecast" and h != horizon)
            )
            if group and boundary:
                self._flush(group_kind, group)
                group = []
            group_kind, horizon = kind, h
            group.append((sid, payload, fut, t))
        if group:
            self._flush(group_kind, group)

"""Exported fleet-pool artifacts — framework-free online estimation
at fleet scale.

:mod:`cbfssm_tpu.export` ships the single-session filter and the batch
predictor as standalone programs; this module ships the whole
:class:`~cbfssm_tpu.serving.FilterPool` program surface, so a serving
host runs the COMPLETE fleet-estimation stack — pool semantics,
:class:`~cbfssm_tpu.serving.FilterBatcher` coalescing,
:class:`~cbfssm_tpu.serving_http.FilterServer` over HTTP — from an
artifact directory with no model classes, configs, or ops library.

It lives apart from :mod:`cbfssm_tpu.export` on purpose: the pool
loader SUBCLASSES the production FilterPool (inheriting every pinned
host behavior instead of mirroring it), which means importing the
serving module — while the predictor/filter loaders keep their pinned
claim of importing neither the model zoo nor the serving stack
(tests/test_export.py::test_load_does_not_import_model_zoo).
``cbfssm_tpu.export`` re-exports these names lazily (PEP 562), so
``from cbfssm_tpu.export import ExportedFilterPool`` also works.

On-disk layout (one directory per exported pool)::

    <path>/pool_init.jaxexp          recognition warmup (batch 1)
    <path>/pool_step.jaxexp          fleet tick with hold mask
    <path>/pool_forecast_{h}.jaxexp  one per exported horizon
    <path>/pool_replay_{k}.jaxexp    fused ragged backlog catch-up
    <path>/arrays.npz                params + cached GP factorization
    <path>/meta.json                 shapes/dtypes/contract

Reference counterpart: none — the reference has no serving story; this
extends the deployment layer of docs/SERVING.md to the fleet path.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from cbfssm_tpu.export import (
    _F_META,
    _F_STATE,
    _artifact_base_key,
    _manifest,
    _flatten_streaming_arrays,
    _load_artifact_meta,
    _streaming_meta,
    _validate_streaming_model,
    _write_streaming_arrays,
)
from cbfssm_tpu.serving import FilterPool

_FP_INIT = "pool_init.jaxexp"
_FP_STEP = "pool_step.jaxexp"
_FP_FORECAST = "pool_forecast_{h}.jaxexp"
_FP_REPLAY = "pool_replay_{k}.jaxexp"


def save_exported_pool(path, model, params, capacity, *, horizons=(),
                       replay_buckets=(), platforms=("cpu", "tpu"),
                       seed=0):
    """Export a :class:`~cbfssm_tpu.serving.FilterPool`'s compiled
    program surface as a self-contained artifact directory loadable by
    :class:`ExportedFilterPool` — the whole fleet-estimation stack
    (pool semantics, :class:`~cbfssm_tpu.serving.FilterBatcher`
    coalescing, :class:`~cbfssm_tpu.serving_http.FilterServer` over
    HTTP) then runs on a serving host with NO dependency on the model
    zoo, exactly like the predictor/filter artifacts.

    Programs exported (calling conventions match FilterPool's compiled
    slots, so the loader IS a FilterPool — it inherits every pinned
    host behavior instead of mirroring it):

    - ``pool_init``: one session's recognition warmup ``(params,
      u [1, R, du], y [1, R, dy]) -> x0 [1, S, dx]``
    - ``pool_step``: the fleet tick with the hold mask
      ``(params, ops, x, u [C, du], y [C, dy], mask [C], key)``
    - ``pool_forecast_{h}``: one per horizon in ``horizons``
    - ``pool_replay_{k}``: one per bucket in ``replay_buckets`` (the
      fused ragged backlog catch-up with the per-(tick, slot) mask)

    The pool's derived operators (cached GP factorization) are computed
    at export time and shipped as arrays. Capacity, like every exported
    shape, is static — pick the fleet size the host will serve.
    """
    import jax.numpy as jnp
    from jax import export as jax_export

    from cbfssm_tpu.serving import normalize_replay_ladder

    # validate EVERYTHING before the first file write (same rationale
    # as save_exported_filter: no half-written / stale-mixed artifacts)
    _validate_streaming_model(
        model, replay_buckets,
        "exported pools support CBFSSMHALF and Voliro")
    buckets = list(normalize_replay_ladder(replay_buckets or None))
    capacity = int(capacity)
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    dtype = model.dtype
    key = jax.random.PRNGKey(seed)
    p_flat, p_def, o_flat, o_def, p_specs, o_specs = (
        _flatten_streaming_arrays(model, params))

    recog_len = int(model.config.recog_len)
    u1 = jax.ShapeDtypeStruct((1, recog_len, model.dim_u), dtype)
    y1 = jax.ShapeDtypeStruct((1, recog_len, model.dim_y), dtype)
    x_spec = jax.ShapeDtypeStruct(
        (capacity, model.samples, model.dim_x), dtype)
    u_spec = jax.ShapeDtypeStruct((capacity, model.dim_u), dtype)
    y_spec = jax.ShapeDtypeStruct((capacity, model.dim_y), dtype)
    m_spec = jax.ShapeDtypeStruct((capacity,), np.bool_)
    key_spec = jax.ShapeDtypeStruct(key.shape, key.dtype)
    t0_spec = jax.ShapeDtypeStruct((), np.uint32)

    def init_fn(pf, u, y):
        return model.filter_init(
            jax.tree_util.tree_unflatten(p_def, pf), u, y)

    def step_fn(pf, of, x, u, y, mask, k):
        # FilterPool.pool_step verbatim: masked sessions hold state
        x_next, (mean, var) = model.filter_step(
            jax.tree_util.tree_unflatten(p_def, pf),
            jax.tree_util.tree_unflatten(o_def, of), x, u, y, k,
        )
        x_keep = jnp.where(mask[:, None, None], x_next, x)
        return x_keep, (mean, var)

    def forecast_fn(pf, of, x, u, k):
        return model.forecast(
            jax.tree_util.tree_unflatten(p_def, pf),
            jax.tree_util.tree_unflatten(o_def, of), x, u, k,
        )

    def replay_fn(pf, of, x, u, y, a, bk, t0):
        return model.filter_replay(
            jax.tree_util.tree_unflatten(p_def, pf),
            jax.tree_util.tree_unflatten(o_def, of), x, u, y, bk, t0,
            active=a,
        )

    exp = jax_export.export
    plats = list(platforms)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _FP_INIT), "wb") as f:
        f.write(exp(jax.jit(init_fn), platforms=plats)(
            p_specs, u1, y1).serialize())
    with open(os.path.join(path, _FP_STEP), "wb") as f:
        f.write(exp(jax.jit(step_fn), platforms=plats)(
            p_specs, o_specs, x_spec, u_spec, y_spec, m_spec,
            key_spec).serialize())
    for h in horizons:
        uh = jax.ShapeDtypeStruct((capacity, int(h), model.dim_u), dtype)
        with open(os.path.join(path, _FP_FORECAST.format(h=int(h))),
                  "wb") as f:
            f.write(exp(jax.jit(forecast_fn), platforms=plats)(
                p_specs, o_specs, x_spec, uh, key_spec).serialize())
    for k in buckets:
        uk = jax.ShapeDtypeStruct((capacity, k, model.dim_u), dtype)
        yk = jax.ShapeDtypeStruct((capacity, k, model.dim_y), dtype)
        ak = jax.ShapeDtypeStruct((k, capacity), np.bool_)
        with open(os.path.join(path, _FP_REPLAY.format(k=k)), "wb") as f:
            f.write(exp(jax.jit(replay_fn), platforms=plats)(
                p_specs, o_specs, x_spec, uk, yk, ak, key_spec, t0_spec
            ).serialize())
    _write_streaming_arrays(path, p_flat, o_flat)
    meta = _streaming_meta("filter_pool", model, key, p_flat, o_flat,
                           horizons, buckets, plats)
    meta["capacity"] = capacity
    meta["sha256"] = _manifest(
        path,
        [_FP_INIT, _FP_STEP, _F_STATE]
        + [_FP_FORECAST.format(h=int(h)) for h in horizons]
        + [_FP_REPLAY.format(k=int(k)) for k in buckets],
    )
    with open(os.path.join(path, _F_META), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class _PoolModelMeta:
    """Duck-typed stand-in for the model object the serving stack
    reads METADATA from (dtype / dims / config.recog_len) — carries no
    model code. ``model_class`` preserves the exporting class's name
    for /v1/meta."""

    def __init__(self, meta):
        import types

        self.model_class = meta["model_class"]
        self.dtype = np.dtype(meta["dtype"])
        self.dim_u = int(meta["dim_u"])
        self.dim_y = int(meta["dim_y"])
        self.dim_x = int(meta["dim_x"])
        self.samples = int(meta["samples"])
        self.config = types.SimpleNamespace(recog_len=meta["recog_len"])


class ExportedFilterPool(FilterPool):
    """Serve a :func:`save_exported_pool` artifact with the full
    :class:`~cbfssm_tpu.serving.FilterPool` API — attach/detach/step/
    forecast/replay/state/load_state — framework-free like the other
    exported kinds.

    Implemented by SUBCLASSING FilterPool with the deserialized
    programs installed in the compiled slots: every pinned host
    behavior — input packing, the hold mask,
    key-by-tick folds, ragged replay chunking, snapshot validation —
    is inherited from the production class rather than mirrored, so
    the two cannot drift. The only overrides are the program lookups
    (horizons/buckets are fixed at export time, so a missing shape is
    a clear error instead of a lazy compile). Works unchanged under
    :class:`~cbfssm_tpu.serving.FilterBatcher` and
    :class:`~cbfssm_tpu.serving_http.FilterServer` (pinned by test).
    """

    def __init__(self, path):
        from jax import export as jax_export

        self.meta = _load_artifact_meta(
            path, _F_META, "filter_pool",
            "use ExportedFilter / ExportedPredictor")
        m = self.meta

        def load(name):
            with open(os.path.join(path, name), "rb") as f:
                return jax.jit(jax_export.deserialize(f.read()).call)

        self.model = _PoolModelMeta(m)
        self.capacity = int(m["capacity"])
        self.mesh = None
        self._row_shardings = None
        self._rep_sharding = None
        self._mask_t_sharding = None
        arrays = np.load(os.path.join(path, _F_STATE))
        # one device_put at load: numpy leaves would re-upload params
        # AND the cached GP factorization on every fleet tick
        self.params = jax.device_put(
            tuple(arrays[f"p{i}"] for i in range(m["n_params"])))
        self._ops = jax.device_put(
            tuple(arrays[f"o{i}"] for i in range(m["n_ops"])))
        self._base_key = _artifact_base_key(m)
        self._init_c = load(_FP_INIT)
        self._step_c = load(_FP_STEP)
        self._forecast_c = {
            int(h): load(_FP_FORECAST.format(h=int(h)))
            for h in m["horizons"]
        }
        self._replay_c = {
            int(k): load(_FP_REPLAY.format(k=int(k)))
            for k in m.get("replay_buckets", ())
        }
        self._replay_buckets = tuple(sorted(self._replay_c))
        self._init_host_state()  # the base class's empty-fleet state

    def reload_params(self, params) -> None:
        """Deliberately unsupported: an exported artifact freezes
        params + program as ONE validated deployment unit (the whole
        point of the artifact — a checkpoint swap that skipped export
        would serve numbers nobody validated, and the baked
        ``filter_ops`` factorization would silently disagree with the
        new params). Re-export from the new checkpoint and restore
        this pool's ``state`` into the new artifact's pool instead
        (exact two-way failover is pinned by test)."""
        raise ValueError(
            "exported pool artifacts freeze params+program; re-export "
            "from the new checkpoint (`python -m cbfssm_tpu export "
            "--kind pool`) and load_state() into the new pool"
        )

    def _forecast_compiled(self, h: int):
        try:
            return self._forecast_c[h]
        except KeyError:
            raise ValueError(
                f"horizon {h} not exported (available: "
                f"{sorted(self._forecast_c)}); re-export with it in "
                "`horizons`"
            ) from None

    def _replay_compiled(self, k: int):
        try:
            return self._replay_c[k]
        except KeyError:
            raise ValueError(
                f"no replay program of length {k} in this artifact "
                f"(buckets: {sorted(self._replay_c)}); re-export with "
                "replay_buckets covering the backlog"
            ) from None

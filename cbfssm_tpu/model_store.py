"""Self-describing model directories: rebuild a trained model from disk.

The reference leaves "what model/config produced this checkpoint" implicit
in whichever run script was executed (reference run/template.py:19-64 —
the config dict lives only in the script). That makes the checkpoint
directory useless to anyone who doesn't hold the producing script: a
serving deploy, a later re-evaluation, or the `export` CLI cannot rebuild
the model.

Here :class:`~cbfssm_tpu.training.Trainer` snapshots the model class name
and the full normalized config (``model_meta.json``) next to the
checkpoints it writes, and this module rebuilds ``(model, params)`` from
the directory alone::

    model, params = load_trained_model(model_dir)            # best.ckpt
    model, params = load_trained_model(model_dir, "model.ckpt")  # last

That closes the loop for ``python -m cbfssm_tpu export``: train with any
run driver, then export the resulting directory as a framework-free
serving artifact (:mod:`cbfssm_tpu.export`) without re-stating the
config.

Design notes:

- The dataset class referenced by ``config.ds`` is NOT reconstructed —
  models only read ``dim_u`` / ``dim_y`` from it (config.py ``dim_u``
  property), so the snapshot stores those two ints plus the class name
  for provenance, and the loader substitutes a stub. Exports never need
  the data pipeline.
- numpy arrays round-trip through a tagged JSON encoding with their
  dtype; tuples arrive back as lists (accepted everywhere a Sequence
  is).
- Entries of ``config.extra`` that are not JSON-encodable are dropped
  with a recorded note instead of failing the save — the snapshot is
  written from inside ``Trainer.__init__`` and must never break
  training.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

MODEL_META = "model_meta.json"


# --- value encoding ----------------------------------------------------


def _encode(value):
    """JSON-encodable form of a config value (tagged ndarray support)."""
    if isinstance(value, np.ndarray):
        return {"__ndarray__": value.tolist(), "dtype": str(value.dtype)}
    if isinstance(value, (np.integer,)):
        return int(value)
    if isinstance(value, (np.floating,)):
        return float(value)
    if isinstance(value, (list, tuple)):
        return [_encode(v) for v in value]
    if isinstance(value, dict):
        return {str(k): _encode(v) for k, v in value.items()}
    return value


def _decode(value):
    if isinstance(value, dict):
        if "__ndarray__" in value:
            return np.asarray(value["__ndarray__"],
                              dtype=np.dtype(value["dtype"]))
        return {k: _decode(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_decode(v) for v in value]
    return value


def _json_safe(value):
    """True when ``value`` survives a json round trip."""
    try:
        json.dumps(value)
        return True
    except (TypeError, ValueError):
        return False


# --- save --------------------------------------------------------------


def _unwrap(model):
    """Adapter models (SweptModel's ``template``, ParticleParallel's
    full-config ``model``) snapshot their inner real-model instance —
    its class + config are what ``load_trained_model`` must rebuild."""
    for attr in ("template", "model"):
        inner = getattr(model, attr, None)
        if (inner is not None and hasattr(inner, "config")
                and hasattr(inner, "dim_u")):
            return inner
    return model


def save_model_meta(model_dir: str, model, seed: int = 0) -> dict:
    """Write ``model_meta.json`` describing ``model`` into ``model_dir``.

    Returns the metadata dict. Called by ``Trainer.__init__`` so every
    trained directory is self-describing; safe to call repeatedly
    (atomic overwrite). Adapter models are unwrapped (:func:`_unwrap`).
    """
    model = _unwrap(model)
    cfg = model.config
    config = {}
    dropped = []
    for f in dataclasses.fields(cfg):
        if f.name in ("ds", "extra"):
            continue
        value = getattr(cfg, f.name)
        if f.name == "dtype":
            # any dtype-like spelling the model accepts (str, np.float64,
            # np.dtype) canonicalizes to one name — meta_requires_x64 and
            # the export CLI key off this field
            value = np.dtype(value).name
        enc = _encode(value)
        if _json_safe(enc):
            config[f.name] = enc
        else:  # never break training over an exotic config value
            dropped.append(f.name)
    extra = {}
    for k, v in (cfg.extra or {}).items():
        enc = _encode(v)
        if _json_safe(enc):
            extra[k] = enc
        else:
            dropped.append(f"extra.{k}")
    ds = cfg.ds
    meta = {
        "format": 1,
        "model_class": type(model).__name__,
        "dim_u": int(model.dim_u),
        "dim_y": int(model.dim_y),
        "seed": int(seed),
        "config": config,
        "extra": extra,
        "dropped_keys": dropped,
        "ds_name": None if ds is None else getattr(
            ds, "__name__", type(ds).__name__),
    }
    os.makedirs(model_dir, exist_ok=True)
    # Re-instantiating a trainer on an existing directory (retrain /
    # eval-only) must not clobber a folded sweep-winner snapshot:
    # best.ckpt still holds the winning point's params, so carry the
    # folded values forward. A new fold_config_updates after the next
    # train() overwrites them again.
    try:
        prior = load_model_meta(model_dir)
    except Exception:
        prior = None
    # carry the dataset recipe (record_dataset stamp) forward too:
    # re-instantiating a trainer on a trained directory (retrain /
    # eval-only flows) must not erase what `eval <dir>` depends on;
    # the next train() re-stamps it with the dataset actually used
    if (prior is not None and prior.get("dataset")
            and prior.get("model_class") == meta["model_class"]):
        meta["dataset"] = prior["dataset"]
    if (prior is not None and prior.get("config_updates")
            and prior.get("model_class") == meta["model_class"]):
        updates = prior["config_updates"]
        pre_fold = updates.get("prior", {})
        kept = {}
        for k, v in updates.get("values", {}).items():
            target = "config" if k in meta["config"] else "extra"
            # carry the fold forward ONLY where the new trainer was
            # built with the same pre-fold base value — a trainer
            # explicitly constructed with a different value for this
            # key supersedes the stale winner (best.ckpt will be
            # overwritten by its training anyway)
            if meta[target].get(k) == pre_fold.get(k, meta[target].get(k)):
                meta[target][k] = v
                kept[k] = v
        if kept:
            meta["config_updates"] = {**updates, "values": kept}
    _write_meta(model_dir, meta)
    return meta


def _write_meta(model_dir: str, meta: dict) -> None:
    path = os.path.join(model_dir, MODEL_META)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, path)


def fold_config_updates(model_dir: str, updates: dict,
                        note: str | None = None) -> dict:
    """Fold concrete config values into an existing ``model_meta.json``.

    Used by :class:`~cbfssm_tpu.training.sweep.SweepTrainer` after
    training: the directory's ``best.ckpt`` holds the WINNING grid
    point's params, so the snapshot's config must carry that point's
    hyperparameter values (the base config was written at init time).
    The folded keys are also recorded under ``config_updates`` for
    provenance. Returns the updated metadata dict.
    """
    meta = load_model_meta(model_dir)
    applied = {}
    pre_fold = {}
    for k, v in updates.items():
        enc = _encode(v)
        if not _json_safe(enc):
            continue
        target = "config" if k in meta["config"] else "extra"
        pre_fold[k] = meta[target].get(k)
        meta[target][k] = enc
        applied[k] = enc
    # "prior" holds the pre-fold base values: a later trainer re-stamp
    # carries the fold forward only where its config still matches them
    meta["config_updates"] = {
        "values": applied, "prior": pre_fold, "note": note,
    }
    _write_meta(model_dir, meta)
    return meta


# --- load --------------------------------------------------------------


def record_dataset(model_dir: str, ds) -> None:
    """Stamp the trained directory's ``model_meta.json`` with the
    dataset's reconstruction recipe (class name + windowing): every
    dataset class shares the ``(seq_len, seq_stride, data_dir=None)``
    constructor, so ``python -m cbfssm_tpu eval <dir>`` can rebuild
    the exact evaluation dataset from disk alone. Called best-effort
    by the trainers' ``train()`` (never breaks training)."""
    meta = load_model_meta(model_dir)
    meta["dataset"] = {
        "name": type(ds).__name__,
        "seq_len": int(ds.seq_len),
        "seq_stride": int(ds.seq_stride),
    }
    _write_meta(model_dir, meta)


def load_model_meta(model_dir: str) -> dict:
    path = os.path.join(model_dir, MODEL_META)
    if not os.path.isfile(path):
        raise FileNotFoundError(
            f"{path} not found — the directory was not written by this "
            "framework's Trainer (or predates model snapshots); "
            "rebuild the model from its config instead"
        )
    with open(path) as f:
        return json.load(f)


def meta_requires_x64(meta: dict) -> bool:
    """True when the snapshot describes a 64-bit model (the export CLI
    enables jax_enable_x64 before touching any array when so)."""
    dt = meta.get("config", {}).get("dtype")
    if dt is None:
        return False
    try:
        return np.dtype(dt).itemsize == 8
    except TypeError:
        return False


def build_model(meta: dict):
    """Instantiate the model described by ``meta`` (no checkpoint I/O)."""
    from cbfssm_tpu import models

    cls = getattr(models, meta["model_class"], None)
    if cls is None:
        raise ValueError(
            f"unknown model class {meta['model_class']!r} "
            "(not in cbfssm_tpu.models)"
        )

    class _StubDS:  # models only read dim_u/dim_y (config.py properties)
        dim_u = int(meta["dim_u"])
        dim_y = int(meta["dim_y"])

    _StubDS.__name__ = str(meta.get("ds_name") or "StubDS")
    config = {k: _decode(v) for k, v in meta["config"].items()}
    config.update({k: _decode(v) for k, v in meta.get("extra", {}).items()})
    config["ds"] = _StubDS
    return cls(config)


def load_trained_model(model_dir: str, checkpoint_name: str | None = None):
    """Rebuild ``(model, params)`` from a Trainer-written directory.

    ``checkpoint_name`` defaults to the best checkpoint
    (``best.ckpt``); pass ``"model.ckpt"`` for the final state.
    """
    import jax
    import optax

    from cbfssm_tpu.training import checkpoint

    meta = load_model_meta(model_dir)
    model = build_model(meta)
    if np.dtype(model.dtype).itemsize == 8 and not jax.config.jax_enable_x64:
        raise RuntimeError(
            "model was trained with float64 parameters; enable "
            "jax_enable_x64 before loading (the export CLI does this "
            "automatically)"
        )
    name = checkpoint.BEST if checkpoint_name is None else checkpoint_name
    path = os.path.join(model_dir, name)
    if not checkpoint.exists(path):
        raise FileNotFoundError(f"no checkpoint at {path}")
    params_t = model.init(jax.random.PRNGKey(meta.get("seed", 0)))
    opt_t = optax.adam(model.config.learning_rate).init(params_t)
    tree = checkpoint.restore(path, {"params": params_t, "opt_state": opt_t})
    return model, tree["params"]

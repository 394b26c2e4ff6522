"""Hyperparameter sweeps as ONE vmapped device program.

The reference found its per-dataset loss shaping by manual search — e.g.
run/run_smallscale.py:12-16 hardcodes a different (lambda_1, k_factor)
pair per dataset, each the product of serial trial runs. The models here
are pure functions of (params, data, rng) whose loss-shaping
hyperparameters enter the traced computation as scalars
(models/cbfssm.py:275,341; voliro.py:311-316), so a grid of N settings
can train exactly like N seeds do in
:class:`~cbfssm_tpu.training.multiseed.MultiSeedTrainer`: stack the
hypers on a leading axis, ``jax.vmap`` the epoch program, and let the
MXU chew the N-fold-wider matmul batch with zero extra sequential depth
(the training step is dependency-chain-bound, see BENCHMARKS.md — width
is nearly free).

Mechanics: :class:`SweptModel` stores the swept fields as
**non-trainable leaves of the params pytree** ("hyper"), rebuilds the
underlying model inside the traced loss with
``dataclasses.replace(config, **hyper)`` (construction is trace-safe
and free at runtime), and blocks gradient flow with ``stop_gradient``
— Adam's moments for those leaves then stay zero and the values never
drift (pinned by tests/test_sweep.py). ``learning_rate`` is swept
through the optimizer instead (``optax.inject_hyperparams``).

Only loss-time fields are sweepable. Fields consumed at ``init`` time
(zeta_*, gp_var, var_x, ...) or structural fields (shapes, dtypes,
recog_len masks) select different *programs*, not different scalars —
sweep those the pedestrian way.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cbfssm_tpu import model_store
from cbfssm_tpu.config import as_config
from cbfssm_tpu.training.multiseed import MultiSeedTrainer

# Loss-time continuous fields (read inside model.loss via jnp.asarray,
# hence tracer-safe). learning_rate is handled via the optimizer.
SWEEPABLE = {
    "k_factor",
    "loss_factors",
    "loglik_factor",
    "n_beta",
    "l_beta",
    "learning_rate",
}


class SweptModel:
    """Model-like adapter reading swept config fields from the params
    pytree, so hyperparameter settings vmap like seeds.

    Params shape: ``{"model": <inner params>, "hyper": {field: value}}``.
    ``loss``/``predict`` rebuild the inner model with the hyper values
    substituted into the config; everything else delegates to a template
    instance built from the base config.
    """

    def __init__(self, model_cls, config, fields):
        self.model_cls = model_cls
        self.base_config = as_config(config)
        self.fields = tuple(fields)
        self.template = model_cls(self.base_config)
        self.config = self.template.config
        self.dtype = self.template.dtype
        self.samples = self.template.samples

    def _rebuild(self, hyper):
        hyper = {k: jax.lax.stop_gradient(v) for k, v in hyper.items()}
        return self.model_cls(dataclasses.replace(self.base_config, **hyper))

    def init(self, key):
        hyper = {
            f: jnp.asarray(getattr(self.base_config, f), dtype=self.dtype)
            for f in self.fields
        }
        return {"model": self.template.init(key), "hyper": hyper}

    def loss(self, params, u, y, key, condition: bool = True, weights=None):
        model = self._rebuild(params["hyper"])
        return model.loss(params["model"], u, y, key, condition, weights)

    def predict(self, params, u, y, key, condition: bool = False):
        model = self._rebuild(params["hyper"])
        return model.predict(params["model"], u, y, key, condition)

    def var_dict(self, params) -> dict:
        out = dict(self.template.var_dict(params["model"]))
        out.update({f"sweep {k}": v for k, v in params["hyper"].items()})
        return out


class SweepTrainer(MultiSeedTrainer):
    """Trains every point of a hyperparameter grid as one vmapped
    program.

    ``sweep`` maps field name -> [n]-array (or [n, k] for vector fields
    like ``loss_factors``); all entries must share the leading length n.
    Sweepable fields are validated against the model's
    ``SWEEPABLE_HYPERS`` declaration (the loss-time fields it actually
    reads), so a field the model ignores fails fast instead of training
    a grid whose "best" value is noise.

    By default (``vary_init=False``) every grid point shares ONE
    parameter init, ONE shuffle order, and ONE Monte-Carlo RNG stream,
    so loss differences are attributable to the grid alone (a constant
    grid produces identical lanes — pinned by test). Set
    ``vary_init=True`` for independent per-point seeds (MultiSeedTrainer
    semantics, e.g. to combine a grid axis with seed replication).

    After ``train``, ``best_seed()`` is the winning grid point,
    ``best_config()`` its concrete config values (also written to
    ``sweep_best.json`` next to the checkpoints).

    CAVEAT on selection: best_seed()/best_config() compare raw train
    losses, which is only meaningful when the grid does NOT change the
    loss's own scale. When sweeping ``loss_factors``/``loglik_factor``
    (lambda multiplies the loglik), select by an evaluation metric
    instead — run per-point Outputs via ``seed_view(i)`` and rank the
    free-running RMSEs (scripts/make_sweep_artifact.py does exactly
    this; see artifacts/sweep_actuator/grid_rmse.txt).
    """

    def __init__(self, model_cls, config, sweep: dict, model_dir,
                 seed: int = 0, vary_init: bool = False, mesh=None,
                 seed_axis: str = "data", metrics_path=None):
        if not sweep:
            raise ValueError("sweep must name at least one field")
        # a field the target model never reads would silently train a
        # full-budget grid whose 'best' value is pure noise
        allowed = (
            frozenset(getattr(model_cls, "SWEEPABLE_HYPERS", SWEEPABLE))
            | {"learning_rate"}
        )
        unknown = set(sweep) - allowed
        if unknown:
            raise ValueError(
                f"not sweepable for {model_cls.__name__} (its loss reads "
                f"{sorted(allowed)}): {sorted(unknown)}"
            )
        sweep = {k: np.asarray(v, dtype=np.float64) for k, v in sweep.items()}
        for k, v in sweep.items():
            if v.ndim < 1:
                raise ValueError(
                    f"sweep['{k}'] must be a length-n array of grid values, "
                    f"got a scalar ({v!r})"
                )
        lengths = {v.shape[0] for v in sweep.values()}
        if len(lengths) != 1:
            raise ValueError(f"sweep arrays must share length, got {lengths}")
        self.sweep = sweep
        self._lr = sweep.pop("learning_rate", None)
        self._vary_init = vary_init
        model = SweptModel(model_cls, config, tuple(sweep))
        super().__init__(model, model_dir, n_seeds=lengths.pop(), seed=seed,
                         mesh=mesh, seed_axis=seed_axis,
                         metrics_path=metrics_path)
        if self._lr is not None:
            self.tx = optax.inject_hyperparams(optax.adam)(
                learning_rate=float(model.config.learning_rate)
            )

    def _stacked_init(self):
        if self._vary_init:
            params = super()._stacked_init()
        else:
            # one shared init: loss differences are attributable to the
            # grid alone
            one = self.model.init(jax.random.PRNGKey(self.seed))
            params = jax.tree_util.tree_map(
                lambda a: jnp.stack([a] * self.n_seeds), one
            )
        # stamp the grid onto the stacked hyper leaves (idempotent on
        # retrain: checkpoints already hold these exact values)
        params = dict(params)
        params["hyper"] = {
            k: jnp.asarray(v, dtype=self.model.dtype)
            for k, v in self.sweep.items()
        }
        return params

    def _lane_keys(self, key):
        """With the default shared init, all lanes also share ONE RNG
        stream (same shuffles come from _epoch_indices below), so loss
        differences are attributable to the grid alone."""
        if self._vary_init:
            return super()._lane_keys(key)
        return jnp.broadcast_to(key, (self.n_seeds,) + key.shape)

    def _epoch_indices(self, n, batch_size, shuffle: bool):
        if self._vary_init:
            return super()._epoch_indices(n, batch_size, shuffle)
        idx, w = self._single_indices(n, batch_size, shuffle)
        tile = lambda a: np.broadcast_to(a, (self.n_seeds,) + a.shape)  # noqa: E731
        return tile(idx), tile(w)

    def init_state(self, retrain: bool = False):
        super().init_state(retrain)
        if retrain:
            # the checkpoint's hyper leaves override _stacked_init's
            # stamp — a changed constructor grid would silently train
            # the OLD values while best_config() reports the new ones.
            # Fail fast instead.
            dtype = self.model.dtype
            for k, v in self.sweep.items():
                stored = np.asarray(self.params["hyper"][k])
                want = np.asarray(jnp.asarray(v, dtype=dtype))
                if not np.array_equal(stored, want):
                    raise ValueError(
                        f"retrain grid mismatch for '{k}': the checkpoint "
                        f"holds {stored.tolist()} but this trainer was "
                        f"constructed with {want.tolist()} — resume with "
                        "the original grid or start a fresh model_dir"
                    )
        if self._lr is not None:
            dtype = jnp.asarray(self.opt_state.hyperparams["learning_rate"]).dtype
            if retrain:
                # learning_rate is popped from self.sweep in __init__, so
                # the hyper-leaf check above never sees it — compare the
                # constructor grid against the checkpointed optimizer
                # hyperparams with the same fail-fast semantics.
                stored = np.asarray(self.opt_state.hyperparams["learning_rate"])
                want = np.asarray(jnp.asarray(self._lr, dtype=dtype))
                # array_equal is False on shape mismatch too — a changed
                # grid LENGTH must fail fast exactly like changed values
                if not np.array_equal(stored, want):
                    raise ValueError(
                        "retrain grid mismatch for 'learning_rate': the "
                        f"checkpoint holds {stored.tolist()} but this trainer "
                        f"was constructed with {want.tolist()} — resume with "
                        "the original grid or start a fresh model_dir"
                    )
            for tree_name in ("opt_state", "best_opt"):
                # one array PER tree: the epoch update donates opt_state's
                # buffers, so best_opt must never alias them
                lr = jnp.array(np.asarray(self._lr), dtype=dtype)
                state = getattr(self, tree_name)
                setattr(self, tree_name, state._replace(
                    hyperparams={**state.hyperparams, "learning_rate": lr}
                ))

    def _single_tree(self, i: int, best: bool) -> dict:
        """best.ckpt / model.ckpt hold the winning point's UNWRAPPED
        model tree so any single-model consumer (Outputs' trainerless
        re-evaluation with the winning config from sweep_best.json) can
        load it. The optimizer moments are fresh — exact resume uses the
        stacked best_seeds.ckpt / model_seeds.ckpt. Host-side like the
        base hook (eval_shape zeros instead of a device ``tx.init``):
        this runs on the pipelined hot path."""
        stacked = self.best_params if best else self.params
        params = jax.tree_util.tree_map(
            lambda a: a[i], jax.device_get(stacked)
        )["model"]
        tx = optax.adam(float(self.model.config.learning_rate))
        shapes = jax.eval_shape(tx.init, params)
        opt = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), shapes
        )
        return {"params": params, "opt_state": opt}

    def train(self, ds, epochs: int, retrain: bool = False):
        super().train(ds, epochs, retrain)
        best = self.best_config()
        with open(os.path.join(self.model_dir, "sweep_best.json"), "w") as f:
            json.dump(best, f, indent=2)
        # best.ckpt holds the winning point's params; fold that point's
        # hyperparameter values into model_meta.json so
        # model_store.load_trained_model rebuilds the WINNING model, not
        # the base config the snapshot recorded at init time.
        model_store.fold_config_updates(
            self.model_dir, best, note="sweep best point (by train loss)")


    @staticmethod
    def product_grid(sweep: dict, seeds_per_point: int) -> dict:
        """Tile a grid so every point trains ``seeds_per_point``
        replicate lanes (use with ``vary_init=True`` for independent
        inits): point p's replicates occupy lanes
        [p * seeds_per_point, (p+1) * seeds_per_point). Group per-lane
        results back with :meth:`grouped`."""
        return {
            k: np.repeat(np.asarray(v), seeds_per_point, axis=0)
            for k, v in sweep.items()
        }

    @staticmethod
    def grouped(per_lane, seeds_per_point: int) -> np.ndarray:
        """[n_points * seeds_per_point] lane values -> [n_points,
        seeds_per_point] (e.g. ``grouped(sw.evaluate_rmse(ds), 5)`` for
        per-point mean/std RMSE)."""
        a = np.asarray(per_lane)
        return a.reshape(-1, seeds_per_point, *a.shape[1:])

    def best_config(self) -> dict:
        """Concrete config values of the best grid point (by train loss)."""
        i = self.best_seed()
        out = {k: np.asarray(v)[i].tolist() for k, v in self.sweep.items()}
        if self._lr is not None:
            out["learning_rate"] = float(np.asarray(self._lr)[i])
        return out

"""Multi-seed training: N independent replicates as ONE device program.

The reference reproduces results by looping ``for it in range(5)`` and
training serially (run/run_smallscale.py:27,67-92; run_sarcos.py:13).
The models here are pure functions, so the TPU-native formulation is a
``jax.vmap`` over a leading seed axis: parameters, optimizer states,
RNG streams, and shuffle orders all carry an ``[n_seeds]`` axis, and
one jitted whole-epoch program advances every replicate at once. The
per-step GP matmuls widen from [B*S, M] to effectively n_seeds times
the work with no extra sequential depth — exactly the trade a TPU
wants (see BENCHMARKS.md "Multi-seed vmapped training").

With a mesh, the seed axis is sharded: replicates are embarrassingly
parallel, so n_seeds devices train n_seeds replicates with zero
cross-device traffic inside the epoch.

Semantics parity with Trainer: per-seed shuffled batch order, weighted
sum losses, best-by-train-loss tracking per seed, final checkpoint of
the stacked pytrees.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cbfssm_tpu import model_store
from cbfssm_tpu.training import checkpoint
from cbfssm_tpu.training.trainer import apply_update_guarded
from cbfssm_tpu.utils.profiling import MetricsLogger
from cbfssm_tpu.utils.xla_cache import enable_persistent_cache


# Stacked [n_seeds, ...] checkpoints get their own filenames so that
# single-model consumers (Outputs' trainerless re-evaluation restores
# best.ckpt with a single-model template and orbax silently returns
# stored shapes) can never load a stacked tree by accident. best.ckpt /
# model.ckpt are ALSO written, holding the overall-best seed's
# unstacked tree.
BEST_SEEDS = "best_seeds.ckpt"
LAST_SEEDS = "model_seeds.ckpt"


class MultiSeedTrainer:
    """Trains ``n_seeds`` independent replicates of ``model`` in one
    vmapped program. Interface mirrors Trainer where it makes sense;
    per-seed results are exposed via ``train_all`` (list of [n_seeds]
    arrays), ``best_seed()``, and ``params_for(i)``.

    Checkpoints (Trainer-parity cadence: best on every improvement,
    last at end):

      best_seeds.ckpt / model_seeds.ckpt   stacked [n_seeds, ...] trees
                                           (resume via retrain=True)
      best.ckpt / model.ckpt               the overall-best seed's
                                           UNstacked tree, loadable by
                                           any single-model consumer
    """

    def __init__(self, model, model_dir, n_seeds: int, seed: int = 0,
                 mesh=None, seed_axis: str = "data", metrics_path=None,
                 epochs_per_dispatch=None):
        enable_persistent_cache()
        self.model = model
        self.model_dir = model_dir
        self.n_seeds = int(n_seeds)
        self.seed = seed
        self.mesh = mesh
        self.seed_axis = seed_axis
        self.epochs_per_dispatch = (
            model.config.epochs_per_dispatch
            if epochs_per_dispatch is None
            else epochs_per_dispatch
        )
        self.tx = optax.adam(model.config.learning_rate)
        self.params = None  # stacked [n_seeds, ...] pytree
        self.opt_state = None
        self.best_params = None
        self.best_loss = None  # [n_seeds]
        self.train_all = []  # list of [n_seeds] arrays
        self.test_all = []
        self._rng = np.random.default_rng(seed)
        self.metrics = MetricsLogger(metrics_path)
        # background checkpoint writes (the ~120 ms orbax disk write
        # comes off the hot loop; see checkpoint.AsyncSaver)
        self.saver = checkpoint.shared_saver()
        os.makedirs(model_dir, exist_ok=True)
        # best.ckpt holds the winning seed's UNstacked single-model tree,
        # so the directory is exportable like a Trainer's (model_store /
        # `python -m cbfssm_tpu export`). Adapter models are unwrapped
        # by save_model_meta; SweepTrainer folds the winning grid point
        # into the snapshot after training. Best-effort: never breaks
        # training.
        try:
            model_store.save_model_meta(model_dir, model, seed=seed)
        except Exception as exc:
            print(f"model_meta snapshot failed ({exc}); "
                  f"{model_dir} will not be exportable", file=sys.stderr)

        # skip_nonfinite_updates applies PER LANE here: a diverging
        # seed (or grid point — SweepTrainer inherits these bodies)
        # skips only its own non-finite batches; healthy lanes train
        # bit-identically. Structurally gated at trace time so the
        # default path compiles the exact programs it always did.
        guard = bool(model.config.skip_nonfinite_updates)
        self._guard = guard
        self.skipped_steps = 0  # cumulative skipped batches, all lanes

        def _epoch_update_body(params_s, opt_s, data_u, data_y, idx_s, w_s, keys):
            """idx_s/w_s: [n_seeds, n_batches, B] per-seed shuffled
            gather indices + pad weights; keys: [n_seeds]."""

            def one_seed(params, opt_state, idx, w, key):
                def step(carry, inp):
                    params, opt_state = carry
                    idx_b, w_b, i = inp
                    u = jnp.take(data_u, idx_b, axis=0)
                    y = jnp.take(data_y, idx_b, axis=0)
                    (loss, _), grads = jax.value_and_grad(
                        model.loss, has_aux=True
                    )(params, u, y, jax.random.fold_in(key, i), True, w_b)
                    if guard:
                        params, opt_state, ok = apply_update_guarded(
                            self.tx, params, opt_state, grads, loss
                        )
                        return (params, opt_state), (loss, ok)
                    updates, opt_state = self.tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return (params, opt_state), loss

                n_batches = idx.shape[0]
                (params, opt_state), out = jax.lax.scan(
                    step, (params, opt_state), (idx, w, jnp.arange(n_batches))
                )
                if guard:
                    losses, oks = out
                    skipped = n_batches - jnp.sum(oks.astype(jnp.int32))
                    return params, opt_state, jnp.mean(losses), skipped
                return params, opt_state, jnp.mean(out)

            return jax.vmap(one_seed)(params_s, opt_s, idx_s, w_s, keys)

        def _epoch_eval_body(params_s, data_u, data_y, idx, w, keys):
            def one_seed(params, key):
                def step(_, inp):
                    idx_b, w_b, i = inp
                    u = jnp.take(data_u, idx_b, axis=0)
                    y = jnp.take(data_y, idx_b, axis=0)
                    loss, _ = model.loss(
                        params, u, y, jax.random.fold_in(key, i), True, w_b
                    )
                    return None, loss

                n_batches = idx.shape[0]
                _, losses = jax.lax.scan(step, None, (idx, w, jnp.arange(n_batches)))
                return jnp.mean(losses)

            return jax.vmap(one_seed, in_axes=(0, 0))(params_s, keys)

        def _update_best_body(best_params, best_opt, best_loss, params, opt_state, loss):
            improved = loss < best_loss  # [n_seeds]

            def sel(b, p):
                return jnp.where(
                    improved.reshape((-1,) + (1,) * (p.ndim - 1)), p, b
                )

            new_params = jax.tree_util.tree_map(sel, best_params, params)
            new_opt = jax.tree_util.tree_map(sel, best_opt, opt_state)
            return new_params, new_opt, jnp.where(improved, loss, best_loss)

        # best trees are deliberately NOT donated: the train loop chains
        # them into the next block's dispatch while the PREVIOUS block's
        # copies are still pending host-side processing (logging + best
        # save) — see the one-deep pipeline in train()
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def _block_update(params_s, opt_s, best_params, best_opt, best_loss,
                          data_u, data_y, test_u, test_y,
                          idx_ks, w_ks, tidx, tw, keys_k, tkeys_k):
            """K fused epochs in ONE dispatch (see Trainer._block_update
            for the rationale): scan over epochs of the same vmapped
            per-epoch bodies, best state tracked in-carry. idx_ks/w_ks:
            [K, n_seeds, n_batches, B]; keys_k/tkeys_k: [K, n_seeds]
            per-epoch lane keys precomputed on host so the _lane_keys
            override hooks (SweepTrainer) keep exact semantics."""

            def one_epoch(carry, inp):
                params_s, opt_s, best_params, best_opt, best_loss = carry
                idx_s, w_s, keys, tkeys = inp
                upd = _epoch_update_body(
                    params_s, opt_s, data_u, data_y, idx_s, w_s, keys
                )
                if guard:
                    params_s, opt_s, train_losses, skipped_s = upd
                else:
                    params_s, opt_s, train_losses = upd
                test_losses = _epoch_eval_body(
                    params_s, test_u, test_y, tidx, tw, tkeys
                )
                best_params, best_opt, best_loss = _update_best_body(
                    best_params, best_opt, best_loss,
                    params_s, opt_s, train_losses,
                )
                ys = (
                    (train_losses, test_losses, skipped_s)
                    if guard
                    else (train_losses, test_losses)
                )
                return (
                    (params_s, opt_s, best_params, best_opt, best_loss),
                    ys,
                )

            carry, ys = jax.lax.scan(
                one_epoch,
                (params_s, opt_s, best_params, best_opt, best_loss),
                (idx_ks, w_ks, keys_k, tkeys_k),
            )
            if guard:
                trl, tel, skl = ys
                return carry, trl, tel, skl
            trl, tel = ys
            return carry, trl, tel

        self._epoch_update = jax.jit(_epoch_update_body, donate_argnums=(0, 1))
        self._epoch_eval_fn = jax.jit(_epoch_eval_body)
        self._update_best = jax.jit(_update_best_body)
        self._block_update = _block_update

    # --- state -----------------------------------------------------------

    def _stacked_init(self):
        """Stacked [n_seeds, ...] parameter pytree (override hook)."""
        keys = jax.random.split(jax.random.PRNGKey(self.seed), self.n_seeds)
        return jax.vmap(self.model.init)(keys)

    def _lane_keys(self, key):
        """Per-lane RNG keys for one epoch pass (override hook:
        independent streams here; SweepTrainer shares one stream across
        lanes so losses are attributable to the grid)."""
        return jax.random.split(key, self.n_seeds)

    def init_state(self, retrain: bool = False):
        params = self._stacked_init()
        opt_state = jax.vmap(self.tx.init)(params)
        if retrain:
            self.saver.flush(self.model_dir)  # pending writes must land first
            tree = checkpoint.restore(
                os.path.join(self.model_dir, LAST_SEEDS),
                {"params": params, "opt_state": opt_state},
            )
            params, opt_state = tree["params"], tree["opt_state"]
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            ax = self.seed_axis
            shard = lambda a: jax.device_put(  # noqa: E731
                a, NamedSharding(self.mesh, P(ax, *([None] * (a.ndim - 1))))
            )
            params = jax.tree_util.tree_map(shard, params)
            opt_state = jax.tree_util.tree_map(shard, opt_state)
        self.params, self.opt_state = params, opt_state
        # real copies: the epoch update DONATES self.params' buffers, so
        # the best trees must not alias them
        self.best_params = jax.tree_util.tree_map(jnp.copy, params)
        self.best_opt = jax.tree_util.tree_map(jnp.copy, opt_state)
        self.best_loss = jnp.full((self.n_seeds,), jnp.inf, dtype=self.model.dtype)

    def _resolve_epd(self, steps_per_epoch: int, epochs: int) -> int:
        from cbfssm_tpu.training.trainer import resolve_epochs_per_dispatch

        return resolve_epochs_per_dispatch(
            self.epochs_per_dispatch, steps_per_epoch, epochs
        )

    def _single_indices(self, n, batch_size, shuffle: bool):
        """One [n_batches, B] index/weight pair (Trainer semantics)."""
        from cbfssm_tpu.training.trainer import epoch_indices

        return epoch_indices(self._rng, n, batch_size, shuffle, self.model.dtype)

    def _epoch_indices(self, n, batch_size, shuffle: bool):
        """Per-seed [n_seeds, n_batches, B] gather indices + weights."""
        pairs = [self._single_indices(n, batch_size, shuffle) for _ in range(self.n_seeds)]
        return np.stack([p[0] for p in pairs]), np.stack([p[1] for p in pairs])

    # --- main loop ---------------------------------------------------------

    def train(self, ds, epochs: int, retrain: bool = False):
        print(f"\nTraining {self.n_seeds} seeds (vmapped)...\n")
        try:  # dataset recipe for `python -m cbfssm_tpu eval <dir>`
            model_store.record_dataset(self.model_dir, ds)
        except Exception:
            pass  # a snapshot-less dir / exotic ds must not break training
        self.init_state(retrain)
        dtype = self.model.dtype
        data_u = jax.device_put(np.asarray(ds.train_in_batch, dtype=dtype))
        data_y = jax.device_put(np.asarray(ds.train_out_batch, dtype=dtype))
        test_u = jax.device_put(np.asarray(ds.test_in_batch, dtype=dtype))
        test_y = jax.device_put(np.asarray(ds.test_out_batch, dtype=dtype))
        batch_size = self.model.config.batch_size
        base_key = jax.random.PRNGKey(self.seed + 1)

        # test indices are deterministic (unshuffled) — build once
        tidx, tw = self._single_indices(
            ds.test_in_batch.shape[0], batch_size, shuffle=False
        )
        steps_per_epoch = -(-ds.train_in_batch.shape[0] // batch_size)
        epd = self._resolve_epd(steps_per_epoch, epochs)

        # one-deep block pipeline (same scheme as Trainer.train): the
        # best state chains DEVICE-side into the next dispatch (the
        # block program no longer donates it), so block k+1 is
        # dispatched before block k's losses are read back, and block
        # k's host work (logging, best save) overlaps device compute.
        # self.best_* always points at the last PROCESSED block, so
        # params_for/best_seed/_save_best (and the SweepTrainer
        # overrides) see exactly the state their save reflects.
        self._chain_best_params = self.best_params
        self._chain_best_opt = self.best_opt
        self._chain_best_loss = self.best_loss
        pending = None
        epoch = 0
        while epoch < epochs:
            t0 = time.perf_counter()
            if epd > 1 and epochs - epoch >= epd:
                k = epd
                # host-side per-epoch streams (shuffles via self._rng,
                # lane keys via the override hooks) are precomputed in
                # exactly the per-epoch order, so losses are identical
                ekeys = [
                    jax.random.fold_in(base_key, e)
                    for e in range(epoch, epoch + k)
                ]
                # jnp.stack keeps key prep on-device (no per-epoch
                # host readback sync points inside the hot loop)
                keys_k = jnp.stack(
                    [self._lane_keys(jax.random.fold_in(ek, 0))
                     for ek in ekeys]
                )
                tkeys_k = jnp.stack(
                    [self._lane_keys(jax.random.fold_in(ek, 1))
                     for ek in ekeys]
                )
                pairs = [
                    self._epoch_indices(
                        ds.train_in_batch.shape[0], batch_size, shuffle=True
                    )
                    for _ in range(k)
                ]
                best_in = self._chain_best_loss
                out = self._block_update(
                    self.params, self.opt_state,
                    self._chain_best_params, self._chain_best_opt, best_in,
                    data_u, data_y, test_u, test_y,
                    np.stack([p[0] for p in pairs]),
                    np.stack([p[1] for p in pairs]),
                    tidx, tw, keys_k, tkeys_k,
                )
                if self._guard:
                    carry, trl, tel, skl = out
                else:
                    carry, trl, tel = out
                    skl = None
                (
                    self.params, self.opt_state,
                    self._chain_best_params, self._chain_best_opt,
                    self._chain_best_loss,
                ) = carry
                handles = (
                    epoch, k, t0, best_in, self._chain_best_params,
                    self._chain_best_opt, self._chain_best_loss, trl, tel,
                    skl,
                )
                if pending is not None:
                    self._process_block(pending)
                pending = handles
                epoch += k
                continue
            if pending is not None:
                # the per-epoch tail reads/updates self.best_* directly,
                # so drain the pipeline first — and restart the clock so
                # the drain (a full block's device wait) isn't billed to
                # this tail epoch's logged seconds
                self._process_block(pending)
                pending = None
                t0 = time.perf_counter()
            ekey = jax.random.fold_in(base_key, epoch)
            keys = self._lane_keys(jax.random.fold_in(ekey, 0))
            idx_s, w_s = self._epoch_indices(
                ds.train_in_batch.shape[0], batch_size, shuffle=True
            )
            upd = self._epoch_update(
                self.params, self.opt_state, data_u, data_y, idx_s, w_s, keys
            )
            if self._guard:
                self.params, self.opt_state, train_losses, skipped_s = upd
            else:
                self.params, self.opt_state, train_losses = upd
            tkeys = self._lane_keys(jax.random.fold_in(ekey, 1))
            test_losses = self._epoch_eval_fn(
                self.params, test_u, test_y, tidx, tw, tkeys
            )
            prev_best = np.asarray(self.best_loss)
            self.best_params, self.best_opt, self.best_loss = self._update_best(
                self.best_params, self.best_opt, self.best_loss,
                self.params, self.opt_state, train_losses,
            )
            # keep the dispatch chain in sync with the processed state
            self._chain_best_params = self.best_params
            self._chain_best_opt = self.best_opt
            self._chain_best_loss = self.best_loss
            train_np = np.asarray(train_losses)  # host readback = sync
            test_np = np.asarray(test_losses)
            if self._guard:
                # read back AFTER the eval dispatch so the guard never
                # serializes the train/eval program overlap
                skipped_k = np.asarray(skipped_s)[None]
                self._note_skipped(skipped_k)
            else:
                skipped_k = None
            improved = bool((train_np < prev_best).any())
            dt = time.perf_counter() - t0
            self._log_epochs(
                epoch, train_np[None], test_np[None], dt, skipped_k=skipped_k
            )
            epoch += 1
            if improved:
                # Trainer-parity cadence (per dispatch): best saved on
                # every improvement, so an interrupted run is resumable
                # and never loses the best state.
                self._save_best()

        if pending is not None:
            self._process_block(pending)
        self.saver.save(
            os.path.join(self.model_dir, LAST_SEEDS),
            {"params": self.params, "opt_state": self.opt_state},
        )
        self.saver.save(
            os.path.join(self.model_dir, checkpoint.LAST),
            self._single_tree(self.best_seed(), best=False),
        )
        self.saver.flush(self.model_dir)
        # terminal marker, Trainer parity (trainer.py event="done"):
        # metrics.jsonl consumers detect completion by this record
        self.metrics.log(
            event="done",
            epochs=epochs,
            best_train=np.asarray(self.best_loss).tolist(),
            **({"skipped_steps": self.skipped_steps} if self._guard else {}),
        )

    def _note_skipped(self, skipped_k):
        """Track batches skipped by the non-finite guard
        (``skipped_k``: [k, n_seeds]); warn when any lane skipped."""
        total = int(skipped_k.sum())
        if total:
            self.skipped_steps += total
            print(
                f"  [guard] skipped {total} non-finite batch update(s) "
                f"across lanes", file=sys.stderr,
            )

    def _log_epochs(self, start, train_k, test_k, dt_total, skipped_k=None):
        """Log ``train_k/test_k`` ([k, n_seeds]) as epochs
        [start, start+k); ``skipped_k`` ([k, n_seeds], guard only) adds
        per-lane skipped-batch counts to metrics.jsonl."""
        k = train_k.shape[0]
        dt = dt_total / k
        for j in range(k):
            train_np, test_np = train_k[j], test_k[j]
            print(
                f"[{start + j:04}]: Train {train_np.mean():.4f} "
                f"(per-seed {np.array2string(train_np, precision=2)}), "
                f"Test {test_np.mean():.4f}  ({dt:.2f}s)"
            )
            self.train_all.append(train_np)
            self.test_all.append(test_np)
            extra = (
                {"skipped_steps": skipped_k[j].tolist()}
                if skipped_k is not None
                else {}
            )
            self.metrics.log(
                event="epoch",
                epoch=start + j,
                train_loss=train_np.tolist(),
                test_loss=test_np.tolist(),
                seconds=dt,
                **extra,
            )

    def _process_block(self, handles):
        """Host-side half of a dispatched block (runs while the NEXT
        block computes): read back the losses, log each epoch, point
        ``self.best_*`` at this block's best state, and save it if the
        block improved any lane."""
        (start, k, t0, best_in, best_params, best_opt, best_loss,
         trl, tel, skl) = handles
        train_k, test_k = np.asarray(trl), np.asarray(tel)
        if skl is not None:
            skl = np.asarray(skl)
            self._note_skipped(skl)
        improved = bool(
            (np.asarray(best_loss) < np.asarray(best_in)).any()
        )
        self.best_params, self.best_opt, self.best_loss = (
            best_params, best_opt, best_loss,
        )
        self._log_epochs(
            start, train_k, test_k, time.perf_counter() - t0, skipped_k=skl
        )
        if improved:
            # Trainer-parity cadence (per dispatch): best saved on
            # every improvement, so an interrupted run is resumable
            # and never loses the best state.
            self._save_best()

    def _save_best(self):
        # The stacked save passes DEVICE trees: saver.save's device_get
        # yields fresh host buffers (no defensive copy), and this
        # block's outputs are already materialized so nothing here
        # waits on the in-flight next block.
        self.saver.save(
            os.path.join(self.model_dir, BEST_SEEDS),
            {"params": self.best_params, "opt_state": self.best_opt},
        )
        self.saver.save(
            os.path.join(self.model_dir, checkpoint.BEST),
            self._single_tree(self.best_seed(), best=True),
        )

    def _single_tree(self, i: int, best: bool) -> dict:
        """The tree written to best.ckpt / model.ckpt: the overall-best
        seed's UNstacked state, loadable by any single-model consumer
        (override hook — SweepTrainer unwraps its params wrapper here).
        Must stay HOST-side (device_get of materialized buffers + numpy
        indexing): it runs on the pipelined hot path, where device-side
        a[i] gathers would enqueue behind the in-flight next block and
        stall the one-deep pipeline on every improving block."""
        host = jax.device_get({
            "params": self.best_params if best else self.params,
            "opt_state": self.best_opt if best else self.opt_state,
        })
        take = lambda t: jax.tree_util.tree_map(lambda a: a[i], t)  # noqa: E731
        return {
            "params": take(host["params"]),
            "opt_state": take(host["opt_state"]),
        }

    # --- results -------------------------------------------------------

    def _lane_predict(self, condition: bool):
        """Jitted all-lanes model.predict, cached per condition flag (a
        fresh lambda per call would retrace the n_seeds-wide program
        every time). Shared by evaluate_rmse / evaluate_calibration."""
        cache = self.__dict__.setdefault("_eval_predict_cache", {})
        if condition not in cache:
            cache[condition] = jax.jit(
                jax.vmap(
                    lambda p, u, y, k: self.model.predict(p, u, y, k, condition),
                    in_axes=(0, None, None, None),
                )
            )
        return cache[condition]

    def evaluate_rmse(self, ds, key=None, best: bool = True,
                      condition: bool = False) -> np.ndarray:
        """Free-running test RMSE of every lane (seed or grid point),
        computed with all lanes in ONE vmapped program per test
        experiment. Semantics match ``Outputs.test_mse`` exactly
        (denormalized particle-mean prediction, per-experiment MSE
        averaged, then sqrt; parity pinned by tests/test_sweep.py).
        Returns an [n_seeds] array."""
        key = jax.random.PRNGKey(0) if key is None else key
        params = self.best_params if best else self.params
        predict = self._lane_predict(condition)
        mse = np.zeros(self.n_seeds)
        n_exp = ds.test_in.shape[0]
        for i in range(n_exp):
            u = jnp.asarray(np.asarray(ds.test_in[i : i + 1]), dtype=self.model.dtype)
            y = jnp.asarray(np.asarray(ds.test_out[i : i + 1]), dtype=self.model.dtype)
            out = predict(params, u, y, key)
            pred = ds.denormalize(np.asarray(out.pred_mean), "out")  # [n, 1, T, dy]
            gt = ds.denormalize(np.asarray(ds.test_out[i : i + 1]), "out")[0]
            mse += np.mean((pred[:, 0] - gt) ** 2, axis=(1, 2))
        return np.sqrt(mse / n_exp)

    def evaluate_calibration(self, ds, key=None, best: bool = True,
                             condition: bool = False, levels=None):
        """Probabilistic metrics of every lane in the same vmapped
        programs :meth:`evaluate_rmse` uses: per-lane predictive NLL,
        central-interval coverage, ECE, and standardized-error RMS of
        the free-run moment-matched Gaussian predictive (denormalized;
        semantics match ``Outputs.calibration`` — parity pinned by
        test). Returns a list of ``n_seeds`` stats dicts (see
        outputs/calibration.py) so a sweep can rank lanes by NLL
        instead of point RMSE."""
        from cbfssm_tpu.outputs import calibration as cal

        key = jax.random.PRNGKey(0) if key is None else key
        params = self.best_params if best else self.params
        predict = self._lane_predict(condition)
        levels = cal.LEVELS if levels is None else levels
        parts = [[] for _ in range(self.n_seeds)]
        for i in range(ds.test_in.shape[0]):
            u = jnp.asarray(np.asarray(ds.test_in[i : i + 1]), dtype=self.model.dtype)
            y = jnp.asarray(np.asarray(ds.test_out[i : i + 1]), dtype=self.model.dtype)
            out = predict(params, u, y, key)
            mean = ds.denormalize(np.asarray(out.pred_mean), "out")  # [n, 1, T, dy]
            std = ds.denormalize(
                np.sqrt(np.asarray(out.pred_var)), "out", shift=False
            )
            gt = ds.denormalize(np.asarray(ds.test_out[i : i + 1]), "out")[0]
            for s in range(self.n_seeds):
                parts[s].append(
                    cal.summarize(mean[s, 0], np.square(std[s, 0]), gt, levels)
                )
        return [cal.accumulate(p) for p in parts]

    def best_seed(self) -> int:
        return int(np.argmin(np.asarray(self.best_loss)))

    def params_for(self, i: int, best: bool = True):
        """Unstacked parameter pytree of seed ``i``."""
        tree = self.best_params if best else self.params
        return jax.tree_util.tree_map(lambda a: a[i], tree)

    def seed_view(self, i: int) -> "SeedView":
        """Trainer-shaped view of seed ``i`` for the Outputs layer."""
        return SeedView(self, i)


class SeedView:
    """Adapter exposing one seed of a MultiSeedTrainer through the
    Trainer interface the Outputs layer consumes (.train_all/.test_all
    loss histories, .params, .restore(name))."""

    def __init__(self, ms: MultiSeedTrainer, i: int):
        if not 0 <= i < ms.n_seeds:
            raise IndexError(f"seed {i} out of range (n_seeds={ms.n_seeds})")
        self._ms = ms
        self._i = i
        self.train_all = [float(losses[i]) for losses in ms.train_all]
        self.test_all = [float(losses[i]) for losses in ms.test_all]

    @property
    def params(self):
        return self._ms.params_for(self._i, best=False)

    def restore(self, name: str = checkpoint.BEST):
        return self._ms.params_for(self._i, best=(name == checkpoint.BEST))

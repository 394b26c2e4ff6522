"""Training loop.

Capability parity with reference cbfssm/training/trainer.py:10-63:
per-epoch shuffled pass over the window batches (one Adam step per
batch, loss summed within a batch), test-set loss evaluation with
``condition=True``, per-epoch stdout line, best-by-train-loss and final
checkpoints, and ``retrain=True`` resuming from the last checkpoint.

TPU-native design — the ENTIRE epoch is one device program:

* The windowed dataset is uploaded once; each epoch ships only a
  [n_batches, batch_size] permutation/index array and runs a jitted
  ``lax.scan`` over batches (gather -> value_and_grad of the negative
  ELBO -> optax.adam apply). One host dispatch per epoch instead of one
  per optimizer step — essential when the chip sits behind a
  high-latency tunnel, and it removes all host-side Python from the hot
  loop either way.
* The ragged last batch becomes index-0 padding with zero per-sequence
  weights (the loss is a weighted sum, matching the reference's
  sum-not-mean batch semantics).
* With a device mesh, a sharding constraint pins each gathered batch's
  leading axis to the ``data`` axis; parameters stay replicated and XLA
  inserts the gradient psum over ICI.
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
from cbfssm_tpu.parallel.sharding import DataParallel
from cbfssm_tpu.training import checkpoint
from cbfssm_tpu.utils.profiling import MetricsLogger, trace
from cbfssm_tpu.utils.xla_cache import enable_persistent_cache


def epoch_indices(rng, n, batch_size, shuffle: bool, dtype):
    """[n_batches, B] gather indices + pad weights for one epoch: a
    (shuffled) permutation of ``n`` window indices, zero-padded to full
    batches with zero weights (the loss is a weighted sum, so padding
    contributes nothing). Shared by Trainer and MultiSeedTrainer."""
    idx = rng.permutation(n) if shuffle else np.arange(n)
    n_batches = -(-n // batch_size)
    padded = np.zeros(n_batches * batch_size, dtype=np.int32)
    padded[:n] = idx
    weights = np.zeros(n_batches * batch_size, dtype=np.float32)
    weights[:n] = 1.0
    return (
        padded.reshape(n_batches, batch_size),
        weights.reshape(n_batches, batch_size).astype(dtype),
    )


def apply_update_guarded(tx, params, opt_state, grads, loss):
    """One optimizer step that self-protects against non-finite
    batches (``skip_nonfinite_updates``): if the batch loss or ANY
    gradient leaf is NaN/Inf, params and opt_state (Adam moments and
    step count included) pass through unchanged, so one divergent
    batch costs one skipped step instead of poisoning the run.
    Entirely device-side (a few ``isfinite`` reductions + selects —
    no host sync), vmap-safe (per-lane scalar ``ok`` broadcasts
    against each leaf). Returns ``(params, opt_state, ok)`` with
    ``ok`` a boolean scalar (per lane under vmap)."""
    ok = jnp.isfinite(loss)
    for g in jax.tree_util.tree_leaves(grads):
        ok = ok & jnp.all(jnp.isfinite(g))
    updates, new_opt = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    keep = lambda n, o: jnp.where(ok, n, o)  # noqa: E731
    return (
        jax.tree_util.tree_map(keep, new_params, params),
        jax.tree_util.tree_map(keep, new_opt, opt_state),
        ok,
    )


def resolve_epochs_per_dispatch(epd, steps_per_epoch: int, epochs: int) -> int:
    """'auto' -> ~300 optimizer steps per dispatch, clamped to [1, 64]
    and to the run's epoch count (shared by Trainer and
    MultiSeedTrainer)."""
    if epd == "auto":
        epd = max(1, min(64, round(300 / max(1, steps_per_epoch))))
    return max(1, min(int(epd), max(1, epochs)))


class Trainer:
    def __init__(self, model, model_dir, mesh=None, seed=0, metrics_path=None,
                 profile_dir=None, epochs_per_dispatch=None):
        enable_persistent_cache()
        self.model = model
        self.model_dir = model_dir
        self.train_all = []
        self.test_all = []
        self.seed = seed
        self.dp = DataParallel(mesh)
        self.tx = optax.adam(model.config.learning_rate)
        self.params = None
        self.opt_state = None
        self._rng = np.random.default_rng(seed)
        self.metrics = MetricsLogger(metrics_path)
        self.profile_dir = profile_dir
        self.epochs_per_dispatch = (
            model.config.epochs_per_dispatch
            if epochs_per_dispatch is None
            else epochs_per_dispatch
        )
        # Best-checkpoint saves land nearly every epoch/block while the
        # loss is improving; the ~120 ms orbax disk write is host-side
        # work that would otherwise serialize with the next dispatch
        # (the device->host snapshot stays on this thread — see
        # checkpoint.AsyncSaver). train() flushes before returning.
        self.saver = checkpoint.shared_saver()
        self._best_dev = None  # device-side running-best chain (train())
        # skip_nonfinite_updates: structurally gate the guard at trace
        # time so the default path compiles the exact same programs as
        # before (keeps the persistent XLA cache warm and the bitwise
        # pins trivially intact).
        self._guard = bool(model.config.skip_nonfinite_updates)
        guard = self._guard
        self.skipped_steps = 0  # cumulative non-finite batches skipped
        self._last_skipped = 0
        os.makedirs(model_dir, exist_ok=True)
        # Make the directory self-describing: the export CLI / a later
        # re-evaluation rebuilds (model, params) from disk alone
        # (model_store.load_trained_model) without the producing script.
        # Best-effort: an un-snapshottable adapter model must never
        # break training — the directory just won't be exportable.
        try:
            model_store.save_model_meta(model_dir, model, seed=seed)
        except Exception as exc:
            print(f"model_meta snapshot failed ({exc}); "
                  f"{model_dir} will not be exportable", file=sys.stderr)

        def constrain_batch(tree):
            # Pin each batch's leading axis to the mesh's data axis (a
            # multi-axis mesh shards batches over 'data' only; a mesh
            # without a data axis replicates them — see DataParallel).
            if self.dp.mesh is None:
                return tree
            return jax.tree_util.tree_map(
                lambda a: jax.lax.with_sharding_constraint(
                    a, self.dp.batch_sharding(a.ndim)
                ),
                tree,
            )

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def _epoch_update(params, opt_state, data_u, data_y, idx, w, key):
            """One full training epoch: scan over [n_batches] gathered
            batches, one Adam step each. idx: [n_batches, B] window
            indices, w: [n_batches, B] pad weights."""

            def step(carry, inp):
                params, opt_state = carry
                idx_b, w_b, i = inp
                u = constrain_batch(jnp.take(data_u, idx_b, axis=0))
                y = constrain_batch(jnp.take(data_y, idx_b, axis=0))
                (loss, _), grads = jax.value_and_grad(model.loss, has_aux=True)(
                    params, u, y, jax.random.fold_in(key, i), True, w_b
                )
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
                return params, opt_state, losses, skipped
            return params, opt_state, out

        @jax.jit
        def _epoch_eval(params, data_u, data_y, idx, w, key):
            def step(_, inp):
                idx_b, w_b, i = inp
                u = constrain_batch(jnp.take(data_u, idx_b, axis=0))
                y = constrain_batch(jnp.take(data_y, idx_b, axis=0))
                loss, _ = model.loss(params, u, y, jax.random.fold_in(key, i), True, w_b)
                return None, loss

            n_batches = idx.shape[0]
            _, losses = jax.lax.scan(step, None, (idx, w, jnp.arange(n_batches)))
            return losses

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def _block_update(params, opt_state, data_u, data_y, test_u, test_y,
                          idx, w, tidx, tw, epoch_ids, best_loss, base_key):
            """K fused epochs in ONE dispatch: scan over epochs, each an
            inner train scan + test-eval scan, with the running best
            (train loss, params, opt_state) tracked in-carry so the
            best checkpoint needs no per-epoch host roundtrip.
            idx/w: [K, n_batches, B]; epoch_ids: [K] global epoch
            numbers (the per-epoch RNG keys fold them exactly as the
            per-epoch path does, so losses are identical)."""

            def one_epoch(carry, inp):
                params, opt_state, best_loss, best_params, best_opt = carry
                idx_e, w_e, eid = inp
                ekey = jax.random.fold_in(base_key, eid)
                tkey = jax.random.fold_in(ekey, 0)
                vkey = jax.random.fold_in(ekey, 1)

                def train_step(c, inp2):
                    params, opt_state = c
                    idx_b, w_b, i = inp2
                    u = constrain_batch(jnp.take(data_u, idx_b, axis=0))
                    y = constrain_batch(jnp.take(data_y, idx_b, axis=0))
                    (loss, _), grads = jax.value_and_grad(
                        model.loss, has_aux=True
                    )(params, u, y, jax.random.fold_in(tkey, i), True, w_b)
                    if guard:
                        params, opt_state, ok = apply_update_guarded(
                            self.tx, params, opt_state, grads, loss
                        )
                        return (params, opt_state), (loss, ok)
                    updates, opt_state = self.tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return (params, opt_state), loss

                nb = idx_e.shape[0]
                (params, opt_state), tr_out = jax.lax.scan(
                    train_step, (params, opt_state),
                    (idx_e, w_e, jnp.arange(nb)),
                )
                if guard:
                    losses, oks = tr_out
                    skipped_e = nb - jnp.sum(oks.astype(jnp.int32))
                else:
                    losses = tr_out
                train_loss = jnp.mean(losses)

                def eval_step(_, inp2):
                    idx_b, w_b, i = inp2
                    u = constrain_batch(jnp.take(test_u, idx_b, axis=0))
                    y = constrain_batch(jnp.take(test_y, idx_b, axis=0))
                    loss, _ = model.loss(
                        params, u, y, jax.random.fold_in(vkey, i), True, w_b
                    )
                    return None, loss

                _, tlosses = jax.lax.scan(
                    eval_step, None, (tidx, tw, jnp.arange(tidx.shape[0]))
                )
                test_loss = jnp.mean(tlosses)

                improved = train_loss < best_loss
                best_loss = jnp.where(improved, train_loss, best_loss)
                sel = lambda a, b: jnp.where(improved, a, b)
                best_params = jax.tree_util.tree_map(sel, params, best_params)
                best_opt = jax.tree_util.tree_map(sel, opt_state, best_opt)
                ys = (
                    (train_loss, test_loss, skipped_e)
                    if guard
                    else (train_loss, test_loss)
                )
                return (
                    (params, opt_state, best_loss, best_params, best_opt),
                    ys,
                )

            carry0 = (params, opt_state, best_loss, params, opt_state)
            carry, ys = jax.lax.scan(one_epoch, carry0, (idx, w, epoch_ids))
            params, opt_state, best_loss, best_params, best_opt = carry
            if guard:
                trl, tel, skl = ys
                return (params, opt_state, best_loss, best_params, best_opt,
                        trl, tel, skl)
            trl, tel = ys
            return params, opt_state, best_loss, best_params, best_opt, trl, tel

        self._epoch_update = _epoch_update
        self._epoch_eval_fn = _epoch_eval
        self._block_update = _block_update
        self._device_data = {}

    # --- batching ------------------------------------------------------

    def _stage(self, tag, data_in, data_out):
        """Upload a windowed dataset to the device once per train() call."""
        if tag not in self._device_data:
            dtype = self.model.dtype
            self._device_data[tag] = (
                jax.device_put(np.asarray(data_in, dtype=dtype)),
                jax.device_put(np.asarray(data_out, dtype=dtype)),
            )
        return self._device_data[tag]

    def _epoch_indices(self, n, batch_size, shuffle: bool):
        """[n_batches, B] gather indices + [n_batches, B] pad weights."""
        return epoch_indices(self._rng, n, batch_size, shuffle, self.model.dtype)

    def _epoch_train(self, ds, batch_size, key):
        data_u, data_y = self._stage("train", ds.train_in_batch, ds.train_out_batch)
        idx, w = self._epoch_indices(ds.train_in_batch.shape[0], batch_size, shuffle=True)
        out = self._epoch_update(
            self.params, self.opt_state, data_u, data_y, idx, w, key
        )
        if self._guard:
            self.params, self.opt_state, losses, skipped = out
            self._note_skipped(int(skipped))
        else:
            self.params, self.opt_state, losses = out
        return float(jnp.mean(losses))

    def _note_skipped(self, skipped: int):
        """Record non-finite batches skipped by the guard (stdout +
        cumulative counter; per-epoch counts also land in
        metrics.jsonl via _log_epoch)."""
        self._last_skipped = skipped
        if skipped:
            self.skipped_steps += skipped
            print(
                f"  [guard] skipped {skipped} non-finite batch "
                f"update(s) this epoch", file=sys.stderr,
            )

    def _epoch_eval(self, ds, batch_size, key):
        data_u, data_y = self._stage("test", ds.test_in_batch, ds.test_out_batch)
        idx, w = self._epoch_indices(ds.test_in_batch.shape[0], batch_size, shuffle=False)
        losses = self._epoch_eval_fn(self.params, data_u, data_y, idx, w, key)
        return float(jnp.mean(losses))

    # --- main loop -----------------------------------------------------

    def init_state(self, retrain: bool = False):
        key = jax.random.PRNGKey(self.seed)
        params = self.model.init(key)
        opt_state = self.tx.init(params)
        if retrain:
            self.saver.flush(self.model_dir)  # pending writes must land first
            tree = checkpoint.restore(
                os.path.join(self.model_dir, checkpoint.LAST),
                {"params": params, "opt_state": opt_state},
            )
            params, opt_state = tree["params"], tree["opt_state"]
        self.params = self.dp.device_put_replicated(params)
        self.opt_state = self.dp.device_put_replicated(opt_state)

    def _resolve_epd(self, steps_per_epoch: int, epochs: int) -> int:
        """Epochs fused per dispatch. 'auto' targets ~300 optimizer
        steps/dispatch (the measured knee where this rig's ~29 ms
        dispatch floor stops mattering — BENCHMARKS.md); long epochs
        resolve to 1 (their compiled programs are unchanged).
        Profiling forces 1 so the traced epoch stays a clean
        past-compile single-epoch program."""
        if self.profile_dir:
            return 1
        return resolve_epochs_per_dispatch(
            self.epochs_per_dispatch, steps_per_epoch, epochs
        )

    def _log_epoch(self, epoch, train_loss, test_loss, dt, steps_per_epoch,
                   skipped=None):
        print(
            "[{epoch:04}]: Train {train}, Test {test}  ({dt:.2f}s)".format(
                epoch=epoch, train=train_loss, test=test_loss, dt=dt
            )
        )
        self.train_all.append(train_loss)
        self.test_all.append(test_loss)
        extra = {}
        if self._guard:
            extra["skipped_steps"] = (
                self._last_skipped if skipped is None else int(skipped)
            )
        self.metrics.log(
            event="epoch",
            epoch=epoch,
            train_loss=train_loss,
            test_loss=test_loss,
            seconds=dt,
            steps_per_sec=steps_per_epoch / dt,
            **extra,
        )

    def train(self, ds, epochs: int, retrain: bool = False):
        print("\nTraining...\n")
        try:  # dataset recipe for `python -m cbfssm_tpu eval <dir>`
            model_store.record_dataset(self.model_dir, ds)
        except Exception:
            pass  # a snapshot-less dir / exotic ds must not break training
        self.init_state(retrain)
        self._device_data = {}
        batch_size = self.dp.round_up_batch(self.model.config.batch_size)
        base_key = jax.random.PRNGKey(self.seed + 1)
        steps_per_epoch = -(-ds.train_in_batch.shape[0] // batch_size)
        epd = self._resolve_epd(steps_per_epoch, epochs)

        lowest_train = float("inf")
        # device-resident running-best threshold: chaining it lets
        # block k+1 dispatch BEFORE block k's results are read back
        self._best_dev = None
        pending = None  # in-flight block awaiting host-side processing
        epoch = 0
        while epoch < epochs:
            if epd > 1 and epochs - epoch >= epd:
                # one-deep pipeline: dispatch block k+1 first, then do
                # block k's host work (loss readback, logging, best
                # save) while the device computes — the threshold the
                # program needs is chained on-device, so nothing here
                # blocks on the previous block. Losses, RNG streams,
                # and checkpoints are bitwise identical to the
                # unpipelined schedule (pinned by test).
                handles = self._dispatch_block(
                    ds, batch_size, base_key, epoch, epd, lowest_train
                )
                if pending is not None:
                    lowest_train = self._process_block(
                        pending, lowest_train, steps_per_epoch
                    )
                pending = handles
                epoch += epd
                continue
            if pending is not None:
                # entering the per-epoch tail: its best logic needs the
                # host-side running best, so drain the pipeline first
                lowest_train = self._process_block(
                    pending, lowest_train, steps_per_epoch
                )
                pending = None
            # per-epoch dispatch: the tail of a blocked run, epd == 1,
            # or the profiled run
            t0 = time.perf_counter()
            ekey = jax.random.fold_in(base_key, epoch)
            if self.profile_dir and epoch == 1:
                # epoch 1: past compile, representative steady-state trace
                with trace(self.profile_dir):
                    train_loss = self._epoch_train(
                        ds, batch_size, jax.random.fold_in(ekey, 0)
                    )
            else:
                train_loss = self._epoch_train(ds, batch_size, jax.random.fold_in(ekey, 0))
            test_loss = self._epoch_eval(ds, batch_size, jax.random.fold_in(ekey, 1))
            dt = time.perf_counter() - t0
            self._log_epoch(epoch, train_loss, test_loss, dt, steps_per_epoch)

            if train_loss < lowest_train:
                self._save(checkpoint.BEST)
                lowest_train = train_loss
            epoch += 1

        if pending is not None:
            lowest_train = self._process_block(
                pending, lowest_train, steps_per_epoch
            )
        self._save(checkpoint.LAST)
        self.saver.flush(self.model_dir)
        done_extra = (
            {"skipped_steps": self.skipped_steps} if self._guard else {}
        )
        self.metrics.log(
            event="done", epochs=epochs, best_train=lowest_train, **done_extra
        )

    def _dispatch_block(self, ds, batch_size, base_key, start, k,
                        lowest_train):
        """Dispatch epochs [start, start+k) as ONE device program and
        return its output handles WITHOUT blocking on them. The
        running-best threshold the program compares against is the
        previous block's device-resident best (``self._best_dev``), so
        consecutive blocks chain entirely on-device. The per-epoch RNG
        streams (shuffle permutations from the host RNG, batch keys
        from ``base_key``) are consumed in exactly the per-epoch order,
        so losses match per-epoch dispatch bitwise."""
        t0 = time.perf_counter()
        data_u, data_y = self._stage("train", ds.train_in_batch, ds.train_out_batch)
        test_u, test_y = self._stage("test", ds.test_in_batch, ds.test_out_batch)
        n_train = ds.train_in_batch.shape[0]
        idxs, ws = zip(
            *(self._epoch_indices(n_train, batch_size, shuffle=True)
              for _ in range(k))
        )
        tidx, tw = self._epoch_indices(
            ds.test_in_batch.shape[0], batch_size, shuffle=False
        )
        if self._best_dev is None:
            self._best_dev = jnp.asarray(lowest_train, dtype=self.model.dtype)
        out = self._block_update(
            self.params, self.opt_state, data_u, data_y, test_u, test_y,
            np.stack(idxs), np.stack(ws), tidx, tw,
            np.arange(start, start + k, dtype=np.int32),
            self._best_dev, base_key,
        )
        if self._guard:
            (self.params, self.opt_state, best_loss, best_params, best_opt,
             trl, tel, skl) = out
        else:
            (self.params, self.opt_state, best_loss, best_params, best_opt,
             trl, tel) = out
            skl = None
        self._best_dev = best_loss
        return (start, k, t0, best_loss, best_params, best_opt, trl, tel, skl)

    def _process_block(self, handles, lowest_train, steps_per_epoch):
        """Host-side half of a block: read back the losses (blocks
        until that block's device work drains), log each epoch, save
        the best checkpoint if the block improved, return the updated
        best train loss. Runs while the NEXT block computes."""
        start, k, t0, best_loss, best_params, best_opt, trl, tel, skl = handles
        trl, tel = np.asarray(trl), np.asarray(tel)
        if skl is not None:
            skl = np.asarray(skl)
            self._note_skipped(int(skl.sum()))
        dt = (time.perf_counter() - t0) / k
        for j in range(k):
            self._log_epoch(
                start + j, float(trl[j]), float(tel[j]), dt, steps_per_epoch,
                skipped=None if skl is None else int(skl[j]),
            )
        new_best = float(best_loss)
        if new_best < lowest_train:
            self.saver.save(
                os.path.join(self.model_dir, checkpoint.BEST),
                {"params": best_params, "opt_state": best_opt},
            )
            lowest_train = new_best
        return lowest_train

    def _save(self, name: str):
        self.saver.save(
            os.path.join(self.model_dir, name),
            {"params": self.params, "opt_state": self.opt_state},
        )

    # --- evaluation-side restore --------------------------------------

    def restore(self, name: str = checkpoint.BEST):
        """Load a checkpoint into trainer state (used by the outputs
        layer); returns params."""
        self.saver.flush(self.model_dir)  # pending writes must land first
        key = jax.random.PRNGKey(self.seed)
        params = self.model.init(key)
        opt_state = self.tx.init(params)
        tree = checkpoint.restore(
            os.path.join(self.model_dir, name),
            {"params": params, "opt_state": opt_state},
        )
        # Same mesh placement as init_state: restored state must be
        # replicated over the mesh, or resuming training afterwards
        # would run with unconstrained placement.
        self.params = self.dp.device_put_replicated(tree["params"])
        self.opt_state = self.dp.device_put_replicated(tree["opt_state"])
        return self.params

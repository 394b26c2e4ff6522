"""Training loop.

Capability parity with reference cbfssm/training/trainer.py:10-63:
per-epoch shuffled pass over the window batches (one Adam step per
batch, loss summed within a batch), test-set loss evaluation with
``condition=True``, per-epoch stdout line, best-by-train-loss and final
checkpoints, and ``retrain=True`` resuming from the last checkpoint.

TPU-native design: ONE jitted update step (value_and_grad of the
negative ELBO + optax.adam apply) compiled once per batch shape; the
host pipeline pads the ragged last batch to a fixed shape and masks it
with per-sequence weights; with a device mesh the batch axis is sharded
(data parallel) and XLA inserts the gradient psum over ICI.
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cbfssm_tpu.parallel.sharding import DataParallel, pad_batch
from cbfssm_tpu.training import checkpoint
from cbfssm_tpu.utils.profiling import MetricsLogger, StepTimer, trace


class Trainer:
    def __init__(self, model, model_dir, mesh=None, seed=0, metrics_path=None,
                 profile_dir=None):
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
        self.step_timer = StepTimer(warmup=2)
        os.makedirs(model_dir, exist_ok=True)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def _update(params, opt_state, u, y, w, key):
            (loss, aux), grads = jax.value_and_grad(model.loss, has_aux=True)(
                params, u, y, key, True, w
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        @jax.jit
        def _eval_loss(params, u, y, w, key):
            loss, _ = model.loss(params, u, y, key, True, w)
            return loss

        self._update = _update
        self._eval_loss = _eval_loss

    # --- batching ------------------------------------------------------

    def _batches(self, data_in, data_out, batch_size, shuffle: bool):
        """Yield fixed-shape (u, y, weights) batches; the ragged tail is
        zero-padded and weight-masked."""
        n = data_in.shape[0]
        idx = self._rng.permutation(n) if shuffle else np.arange(n)
        for start in range(0, n, batch_size):
            sel = idx[start : start + batch_size]
            (u, y), w = pad_batch((data_in[sel], data_out[sel]), batch_size)
            yield self.dp.device_put_batch(u, y) + (jax.device_put(w),)

    def _epoch_train(self, ds, batch_size, key):
        losses = []
        for i, (u, y, w) in enumerate(
            self._batches(ds.train_in_batch, ds.train_out_batch, batch_size, shuffle=True)
        ):
            self.params, self.opt_state, loss = self._update(
                self.params, self.opt_state, u, y, w, jax.random.fold_in(key, i)
            )
            self.step_timer.tick()
            losses.append(loss)
        return float(np.mean([np.asarray(l) for l in losses]))

    def _epoch_eval(self, ds, batch_size, key):
        losses = []
        for i, (u, y, w) in enumerate(
            self._batches(ds.test_in_batch, ds.test_out_batch, batch_size, shuffle=False)
        ):
            losses.append(self._eval_loss(self.params, u, y, w, jax.random.fold_in(key, i)))
        return float(np.mean([np.asarray(l) for l in losses]))

    # --- main loop -----------------------------------------------------

    def init_state(self, retrain: bool = False):
        key = jax.random.PRNGKey(self.seed)
        params = self.model.init(key)
        opt_state = self.tx.init(params)
        if retrain:
            tree = checkpoint.restore(
                os.path.join(self.model_dir, checkpoint.LAST),
                {"params": params, "opt_state": opt_state},
            )
            params, opt_state = tree["params"], tree["opt_state"]
        self.params = self.dp.device_put_replicated(params)
        self.opt_state = self.dp.device_put_replicated(opt_state)

    def train(self, ds, epochs: int, retrain: bool = False):
        print("\nTraining...\n")
        self.init_state(retrain)
        batch_size = self.dp.round_up_batch(self.model.config.batch_size)
        base_key = jax.random.PRNGKey(self.seed + 1)

        lowest_train = float("inf")
        for epoch in range(epochs):
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

            print(
                "[{epoch:04}]: Train {train}, Test {test}  ({dt:.2f}s)".format(
                    epoch=epoch, train=train_loss, test=test_loss, dt=dt
                )
            )
            self.train_all.append(train_loss)
            self.test_all.append(test_loss)
            self.metrics.log(
                event="epoch",
                epoch=epoch,
                train_loss=train_loss,
                test_loss=test_loss,
                seconds=dt,
                steps_per_sec=self.step_timer.steps_per_sec,
            )

            if train_loss < lowest_train:
                self._save(checkpoint.BEST)
                lowest_train = train_loss

        self._save(checkpoint.LAST)
        self.metrics.log(event="done", epochs=epochs, best_train=lowest_train)

    def _save(self, name: str):
        checkpoint.save(
            os.path.join(self.model_dir, name),
            {"params": self.params, "opt_state": self.opt_state},
        )

    # --- evaluation-side restore --------------------------------------

    def restore(self, name: str = checkpoint.BEST):
        """Load a checkpoint into trainer state (used by the outputs
        layer); returns params."""
        key = jax.random.PRNGKey(self.seed)
        params = self.model.init(key)
        opt_state = self.tx.init(params)
        tree = checkpoint.restore(
            os.path.join(self.model_dir, name),
            {"params": params, "opt_state": opt_state},
        )
        self.params = tree["params"]
        self.opt_state = tree["opt_state"]
        return self.params

"""Evaluation artifacts.

Capability parity with reference cbfssm/outputs/outputs.py:11-164 — the
same user-facing API (``Outputs(out_dir)``, ``set_ds`` / ``set_model`` /
``set_trainer`` / ``create_all`` / ``get_last_rmse``) and the same
artifact files:

  training_loss.pdf    loss curves over epochs
  predict_{train,test}.pdf/.mat
                       free-running prediction (condition=False) on the
                       first 300 steps of train/test experiment 0, with
                       1.96-sigma band, denormalized
  mse.txt              free-running test MSE/RMSE over full experiments
  var_dump.txt         all hyper/variational parameters
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

import scipy.io  # noqa: E402

from cbfssm_tpu.training import checkpoint  # noqa: E402

_BAND_COLOR = (255.0 / 255.0, 178.0 / 255.0, 110.0 / 255.0)


def jnp_asarray(a, dtype):
    return jnp.asarray(np.asarray(a), dtype=dtype)


class Outputs:
    def __init__(self, out_dir: str, seed: int = 0):
        self.out_dir = out_dir
        self.ds = None
        self.model = None
        self.model_dir = None
        self.trainer = None
        self.params = None
        self.last_rmse = None
        self.last_calibration = None
        self._test_preds = None  # shared test_mse/calibration pass
        self.seed = seed
        os.makedirs(out_dir, exist_ok=True)

    # --- wiring (reference outputs.py:23-34) ---------------------------

    def set_ds(self, ds):
        self.ds = ds

    def set_model(self, model, model_dir):
        self.model = model
        self.model_dir = model_dir

    def set_trainer(self, trainer):
        self.trainer = trainer

    def get_last_rmse(self):
        return self.last_rmse

    # --- driver --------------------------------------------------------

    def _restore_params(self):
        """Best-checkpoint parameters; works with or without a trainer
        (the reference's train=False re-evaluation path restores straight
        from disk, template.py:42,59-64)."""
        best = os.path.join(self.model_dir, checkpoint.BEST)
        if self.trainer is not None:
            if checkpoint.exists(best):
                return self.trainer.restore(checkpoint.BEST)
            if self.trainer.params is not None:
                return self.trainer.params
        if checkpoint.exists(best):
            import optax

            params_t = self.model.init(jax.random.PRNGKey(self.seed))
            opt_t = optax.adam(self.model.config.learning_rate).init(params_t)
            tree = checkpoint.restore(best, {"params": params_t, "opt_state": opt_t})
            return tree["params"]
        raise RuntimeError(
            f"no trained parameters: neither a trainer nor {best} available"
        )

    def create_all(self, params=None):
        """Generate every artifact. ``params`` overrides the default
        best-checkpoint restore (the eval CLI passes the checkpoint the
        user picked; default semantics unchanged)."""
        assert self.model is not None
        assert self.ds is not None
        self.params = self._restore_params() if params is None else params
        self._test_preds = None  # params may have changed
        print("Generating outputs...")
        self._create_all()

    def _create_all(self):
        self.training_stats()
        self.prediction()
        self.test_mse()
        self.calibration()
        self.var_dump()

    @property
    def _predict_fn(self):
        """Jitted prediction (compiled once per sequence shape)."""
        if not hasattr(self, "_predict_fn_cache"):
            self._predict_fn_cache = jax.jit(
                self.model.predict, static_argnames="condition"
            )
        return self._predict_fn_cache

    def _predict(self, u, y, condition=False):
        out = self._predict_fn(
            self.params,
            jnp_asarray(u, self.model.dtype),
            jnp_asarray(y, self.model.dtype),
            jax.random.PRNGKey(self.seed),
            condition=condition,
        )
        return np.asarray(out.pred_mean), np.asarray(out.pred_var)

    # --- artifacts -----------------------------------------------------

    def training_stats(self):
        if self.trainer is None:
            return
        print("  training stats")
        plt.figure(1)
        plt.plot(self.trainer.train_all, label="train")
        plt.plot(self.trainer.test_all, label="test")
        plt.legend()
        plt.savefig(os.path.join(self.out_dir, "training_loss.pdf"))
        plt.close(1)

    def _plot_prediction(self, name: str, data_in, data_out, predict_size: int):
        predict_size = min(predict_size, data_out.shape[1])
        pred, var = self._predict(data_in, data_out, condition=False)
        pred = self.ds.denormalize(pred, "out")[0]
        gt = self.ds.denormalize(data_out, "out")[0]
        std = self.ds.denormalize(np.sqrt(var), "out", shift=False)[0]
        lower = pred[:, 0] - 1.96 * std[:, 0]
        upper = pred[:, 0] + 1.96 * std[:, 0]

        plt.figure(1, figsize=(6, 4))
        plt.plot(gt[:, 0], label="ground truth")
        plt.plot(pred[:, 0], label="prediction")
        plt.fill_between(range(predict_size), lower, upper, color=_BAND_COLOR)
        plt.legend(loc=2)
        plt.grid(True)
        plt.xlabel("time (steps)")
        plt.xlim([0, predict_size])
        plt.savefig(
            os.path.join(self.out_dir, f"predict_{name}.pdf"), bbox_inches="tight"
        )
        plt.close(1)

        scipy.io.savemat(
            os.path.join(self.out_dir, f"predict_{name}.mat"),
            {"mean": pred, "std": std, "gt": gt},
        )

    def prediction(self, predict_size: int = 300):
        print("  prediction")
        ds = self.ds
        # clamp each split independently: a short TRAIN experiment must
        # not truncate the test artifact's documented 300-step window
        train_size = min(ds.train_in.shape[1], predict_size)
        self._plot_prediction(
            "train",
            ds.train_in[0:1, :train_size, :],
            ds.train_out[0:1, :train_size, :],
            train_size,
        )
        test_size = min(ds.test_in.shape[1], predict_size)
        self._plot_prediction(
            "test",
            ds.test_in[0:1, :test_size, :],
            ds.test_out[0:1, :test_size, :],
            test_size,
        )

    def _test_predictions(self):
        """One free-run prediction pass over every test experiment,
        shared by test_mse and calibration (each full-T predict costs a
        whole-scan device program — running it twice doubled eval time).
        Returns [(mean, std, gt)] denormalized; cached until params
        change (create_all resets the cache)."""
        if self._test_preds is None:
            ds = self.ds
            preds = []
            for i in range(ds.test_in.shape[0]):
                pred, var = self._predict(
                    ds.test_in[i : i + 1], ds.test_out[i : i + 1],
                    condition=False,
                )
                mean = ds.denormalize(pred, "out")[0]
                std = ds.denormalize(np.sqrt(var), "out", shift=False)[0]
                gt = ds.denormalize(ds.test_out[i : i + 1], "out")[0]
                preds.append((mean, std, gt))
            self._test_preds = preds
        return self._test_preds

    def test_mse(self):
        print("  test mse")
        mse_all = [
            float(np.mean((gt - mean) ** 2))
            for mean, _, gt in self._test_predictions()
        ]
        mse = float(np.mean(mse_all))
        rmse = math.sqrt(mse)
        with open(os.path.join(self.out_dir, "mse.txt"), "w") as f:
            f.write("MSE:  %f\n" % mse)
            f.write("RMSE: %f\n" % rmse)
        self.last_rmse = rmse

    def calibration(self, levels=None):
        """calibration.txt — does the plotted band mean anything?
        Predictive NLL + central-interval coverage of the same free-run
        moment-matched Gaussian the prediction artifacts draw
        (denormalized, all test experiments; see outputs/calibration.py).
        Beyond-reference artifact: the reference plots 1.96-sigma bands
        but never scores them. Returns and stores the stats dict
        (``self.last_calibration``)."""
        from cbfssm_tpu.outputs import calibration as cal

        print("  calibration")
        levels = cal.LEVELS if levels is None else levels
        parts = [
            cal.summarize(mean, np.square(std), gt, levels)
            for mean, std, gt in self._test_predictions()
        ]
        stats = cal.accumulate(parts)
        with open(os.path.join(self.out_dir, "calibration.txt"), "w") as f:
            f.write(cal.format_report(stats))
        self.last_calibration = stats
        return stats

    def var_dump(self):
        print("  var dump")
        with open(os.path.join(self.out_dir, "var_dump.txt"), "w") as f:
            for name, value in self.model.var_dict(self.params).items():
                value = np.atleast_1d(np.asarray(value))
                f.write(name + ":\n")
                if value.ndim == 1:
                    for val in value:
                        f.write("  % .4e" % val)
                elif value.ndim == 2:
                    for row in value:
                        for val in row:
                            f.write("  % .4e" % val)
                        f.write("\n")
                f.write("\n\n")

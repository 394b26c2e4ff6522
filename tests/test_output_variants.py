"""OutputsRoboMove / OutputsVoliro artifact generation + config
validation errors."""

import os

import jax
import numpy as np
import pytest

from cbfssm_tpu.models import CBFSSM, CBFSSMHALF, PRSSM, Voliro
from cbfssm_tpu.outputs import OutputsRoboMove, OutputsVoliro
from cbfssm_tpu.training import Trainer
from tests.test_trainer import SmokeDS, smoke_config


class RoboSmokeDS(SmokeDS):
    """2-D observation variant so trajectory plots have x/y channels."""

    dim_u = 1
    dim_y = 2

    def __init__(self, **kw):
        from cbfssm_tpu.data.base import BaseDS

        super().__init__(**kw)
        # duplicate the single observation channel
        for attr in ["train_out", "test_out"]:
            a = getattr(self, attr)
            setattr(self, attr, np.concatenate((a, a * 0.5), axis=-1))
        self.mean["out"] = np.concatenate((self.mean["out"], self.mean["out"]))
        self.std["out"] = np.concatenate((self.std["out"], self.std["out"]))
        self.train_out_batch = BaseDS.rnn_batches(self.train_out, self.seq_len, self.seq_stride)
        self.test_out_batch = BaseDS.rnn_batches(self.test_out, self.seq_len, self.seq_stride)


def test_outputs_robomove_artifacts(tmp_path):
    ds = RoboSmokeDS()
    cfg = smoke_config(dim_x=3)
    cfg["ds"] = RoboSmokeDS
    cfg["var_x"] = np.asarray([0.002**2] * 3)
    cfg["var_y"] = np.asarray([1.0] * 3)
    model = CBFSSM(cfg)
    out_dir = str(tmp_path / "rm")
    trainer = Trainer(model, out_dir)
    trainer.train(ds, epochs=1)

    outputs = OutputsRoboMove(out_dir)
    outputs.set_ds(ds)
    outputs.set_model(model, out_dir)
    outputs.set_trainer(trainer)
    outputs.create_all()
    for f in ["robomove_train.pdf", "robomove_test.pdf", "mse.txt"]:
        assert os.path.isfile(os.path.join(out_dir, f)), f


def test_outputs_voliro_artifacts(tmp_path):
    from tests.test_other_models import VoliroTinyDS, voliro_batch, voliro_config

    rng = np.random.default_rng(0)
    u, y = voliro_batch(rng, b=1, t=40)

    class VDS:
        dim_u = 13
        dim_y = 22

        def __init__(self):
            self.train_in, self.train_out = u[:, :20], y[:, :20]
            self.test_in, self.test_out = u[:, 20:], y[:, 20:]
            self.test_in2, self.test_out2 = u, y
            self.train_in_batch = self.train_in
            self.train_out_batch = self.train_out
            self.test_in_batch = self.test_in
            self.test_out_batch = self.test_out

    cfg = voliro_config()
    cfg["dtype"] = "float32"
    cfg["jitter"] = None
    cfg["batch_size"] = 1
    model = Voliro(cfg)
    out_dir = str(tmp_path / "vl")
    trainer = Trainer(model, out_dir)
    ds = VDS()
    trainer.train(ds, epochs=1)

    outputs = OutputsVoliro(out_dir)
    outputs.set_ds(ds)
    outputs.set_model(model, out_dir)
    outputs.set_trainer(trainer)
    outputs.create_all()
    for f in ["voliro_forces.pdf", "var_dump.txt", "training_loss.pdf"]:
        assert os.path.isfile(os.path.join(out_dir, f)), f
    # voliro skips the generic prediction artifacts (reference
    # outputs_voliro.py:12-15)
    assert not os.path.isfile(os.path.join(out_dir, "mse.txt"))


def test_prediction_windows_clamp_independently():
    """A short TRAIN experiment must not truncate the test artifact's
    window — each split clamps to its own length (reference outputs.py
    predicts the first 300 steps of each split's experiment 0)."""
    from cbfssm_tpu.outputs.outputs import Outputs

    o = Outputs.__new__(Outputs)

    class DS:
        train_in = np.zeros((1, 5, 2))
        train_out = np.zeros((1, 5, 1))
        test_in = np.zeros((1, 40, 2))
        test_out = np.zeros((1, 40, 1))

    o.ds = DS()
    sizes = {}
    o._plot_prediction = lambda name, u, y, size: sizes.update({name: size})
    o.prediction(predict_size=300)
    assert sizes == {"train": 5, "test": 40}


def test_config_noise_length_validation():
    cfg = smoke_config(dim_x=3)
    cfg["var_y"] = np.asarray([1.0])  # wrong: CBFSSM needs dim_x entries
    with pytest.raises(ValueError, match="var_y"):
        CBFSSM(cfg)
    cfg2 = smoke_config(dim_x=3)
    cfg2["var_x"] = np.asarray([[1.0, 1.0, 1.0]])  # wrong ndim
    with pytest.raises(ValueError, match="var_x"):
        PRSSM({**cfg2, "recog_model": "output", "var_y": np.asarray([1.0])})

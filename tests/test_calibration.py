"""Probabilistic evaluation (outputs/calibration.py + the Outputs and
MultiSeedTrainer integration)."""

import os

import jax
import numpy as np

from cbfssm_tpu.models import CBFSSM
from cbfssm_tpu.outputs import Outputs
from cbfssm_tpu.outputs import calibration as cal
from cbfssm_tpu.training import MultiSeedTrainer, Trainer

from test_trainer import SmokeDS, smoke_config


def test_z_score_matches_the_plotted_band():
    # the 0.95 row must score exactly the 1.96-sigma band the
    # prediction artifacts draw
    assert abs(cal.z_score(0.95) - 1.959964) < 1e-5
    assert abs(cal.z_score(0.5) - 0.674490) < 1e-5


def test_summarize_recovers_a_known_gaussian():
    rng = np.random.default_rng(0)
    n = 400_000
    mean = rng.normal(size=n)
    std = np.exp(rng.normal(size=n) * 0.3)
    y = mean + std * rng.normal(size=n)
    stats = cal.summarize(mean, std**2, y)
    # empirical coverage matches nominal on truly-Gaussian errors
    for p, emp in stats["coverage"].items():
        assert abs(emp - p) < 0.01, (p, emp)
    assert stats["ece"] < 0.01
    # standardized errors are standard normal
    assert abs(stats["sde_rms"] - 1.0) < 0.01
    # NLL matches the analytic expectation E[NLL] = 0.5*log(2*pi*var)+0.5
    expected = float(np.mean(0.5 * np.log(2 * np.pi * std**2) + 0.5))
    assert abs(stats["nll"] - expected) < 0.01


def test_summarize_flags_overconfidence():
    rng = np.random.default_rng(1)
    n = 100_000
    mean = np.zeros(n)
    y = 3.0 * rng.normal(size=n)  # true std 3, claimed std 1
    stats = cal.summarize(mean, np.ones(n), y)
    assert stats["coverage"][0.95] < 0.6  # band far too narrow
    assert stats["sde_rms"] > 2.5


def test_accumulate_equals_pooled():
    rng = np.random.default_rng(2)
    chunks = [rng.normal(size=(n, 2)) for n in (100, 300)]
    mean = [c * 0.1 for c in chunks]
    var = [np.abs(c) + 0.5 for c in chunks]
    parts = [cal.summarize(m, v, c) for m, v, c in zip(mean, var, chunks)]
    pooled = cal.summarize(
        np.concatenate(mean), np.concatenate(var), np.concatenate(chunks)
    )
    acc = cal.accumulate(parts)
    assert acc["n_points"] == pooled["n_points"]
    np.testing.assert_allclose(acc["nll"], pooled["nll"], rtol=1e-12)
    np.testing.assert_allclose(acc["sde_rms"], pooled["sde_rms"], rtol=1e-12)
    for p in pooled["coverage"]:
        np.testing.assert_allclose(
            acc["coverage"][p], pooled["coverage"][p], rtol=1e-12
        )


def test_outputs_calibration_artifact(tmp_path):
    ds = SmokeDS()
    model = CBFSSM(smoke_config())
    d = str(tmp_path / "m")
    tr = Trainer(model, d)
    tr.train(ds, epochs=2)
    out = Outputs(d)
    out.set_ds(ds)
    out.set_model(model, d)
    out.set_trainer(tr)
    out.create_all()
    assert os.path.exists(os.path.join(d, "calibration.txt"))
    stats = out.last_calibration
    assert np.isfinite(stats["nll"])
    cov = [stats["coverage"][p] for p in sorted(stats["coverage"])]
    assert all(0.0 <= c <= 1.0 for c in cov)
    assert cov == sorted(cov)  # wider nominal band covers no less
    text = open(os.path.join(d, "calibration.txt")).read()
    assert "NLL/point" in text and "0.95" in text

    # the multi-run summary aggregates NLL + 95%-band coverage too
    from cbfssm_tpu.outputs import OutputSummary

    sdir = str(tmp_path / "summary")
    summary = OutputSummary(sdir)
    summary.add_outputs(out)
    summary.write_summary()
    stext = open(os.path.join(sdir, "summary.txt")).read()
    assert "RMSE" in stext and "NLL/point" in stext
    assert "95%-band coverage" in stext


def test_multiseed_calibration_matches_single_lane(tmp_path):
    """evaluate_calibration's lane s equals the same metrics computed
    from that lane's params through a single-model predict (the
    Outputs.calibration semantics)."""
    ds = SmokeDS()
    model = CBFSSM(smoke_config())
    ms = MultiSeedTrainer(model, str(tmp_path / "ms"), n_seeds=2, seed=1)
    ms.train(ds, epochs=1)
    key = jax.random.PRNGKey(0)
    stats = ms.evaluate_calibration(ds, key=key, best=False)
    assert len(stats) == 2

    predict = jax.jit(model.predict, static_argnames="condition")
    for s in range(2):
        params = ms.params_for(s, best=False)
        parts = []
        for i in range(ds.test_in.shape[0]):
            u = np.asarray(ds.test_in[i : i + 1])
            y = np.asarray(ds.test_out[i : i + 1])
            out = predict(
                params,
                np.asarray(u, model.dtype), np.asarray(y, model.dtype),
                key, condition=False,
            )
            mean = ds.denormalize(np.asarray(out.pred_mean), "out")[0]
            std = ds.denormalize(
                np.sqrt(np.asarray(out.pred_var)), "out", shift=False
            )[0]
            gt = ds.denormalize(y, "out")[0]
            parts.append(cal.summarize(mean, np.square(std), gt))
        want = cal.accumulate(parts)
        np.testing.assert_allclose(stats[s]["nll"], want["nll"], rtol=1e-9)
        np.testing.assert_allclose(
            stats[s]["sde_rms"], want["sde_rms"], rtol=1e-9
        )
        for p in want["coverage"]:
            np.testing.assert_allclose(
                stats[s]["coverage"][p], want["coverage"][p], atol=1e-12
            )

"""SweepTrainer: a hyperparameter grid as one vmapped program.

Contract: a constant grid reproduces MultiSeedTrainer exactly (the
sweep machinery adds nothing numerically); swept values are pinned
bitwise through training (non-trainable leaves); grid points genuinely
differ; learning_rate sweeps through the optimizer; structural fields
are rejected.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbfssm_tpu.models import CBFSSM
from cbfssm_tpu.training import MultiSeedTrainer, SweepTrainer
from tests.test_trainer import SmokeDS, smoke_config


@pytest.fixture(scope="module")
def ds():
    return SmokeDS()


def test_constant_grid_matches_multiseed(ds, tmp_path_factory):
    """Grid = the base config repeated -> losses identical to a plain
    MultiSeedTrainer run (same seed, per-lane inits)."""
    cfg = smoke_config()
    n = 2
    ms = MultiSeedTrainer(
        CBFSSM(cfg), str(tmp_path_factory.mktemp("ms")), n_seeds=n
    )
    ms.train(ds, epochs=2)
    sw = SweepTrainer(
        CBFSSM,
        cfg,
        {"k_factor": np.full(n, cfg["k_factor"]),
         "loss_factors": np.tile(np.asarray(cfg["loss_factors"]), (n, 1))},
        str(tmp_path_factory.mktemp("sw")),
        vary_init=True,
    )
    sw.train(ds, epochs=2)
    np.testing.assert_allclose(
        np.stack(sw.train_all), np.stack(ms.train_all), rtol=1e-6
    )


@pytest.fixture(scope="module")
def swept(ds, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("grid"))
    sweep = {
        "k_factor": np.asarray([1.0, 50.0, 200.0]),
        "loss_factors": np.asarray([[0.05, 0.0], [0.5, 0.0], [1.0, 0.1]]),
    }
    trainer = SweepTrainer(CBFSSM, smoke_config(), sweep, out)
    trainer.train(ds, epochs=3)
    return trainer, sweep, out


def test_grid_points_differ_and_train(swept):
    trainer, _, _ = swept
    losses = np.stack(trainer.train_all)  # [epochs, n]
    assert np.isfinite(losses).all()
    assert len(np.unique(losses[-1])) == trainer.n_seeds


def test_hypers_pinned_bitwise(swept):
    """stop_gradient + zero Adam moments: swept leaves never drift."""
    trainer, sweep, _ = swept
    hyper = trainer.params["hyper"]
    dt = np.dtype(trainer.model.dtype)
    np.testing.assert_array_equal(
        np.asarray(hyper["k_factor"]), sweep["k_factor"].astype(dt)
    )
    np.testing.assert_array_equal(
        np.asarray(hyper["loss_factors"]), sweep["loss_factors"].astype(dt)
    )


def test_shared_init_attributes_differences_to_grid(swept):
    """vary_init=False (default): all grid points started from the SAME
    model init."""
    trainer, _, _ = swept
    # reconstruct the shared init and compare lane 0 vs lane 2 inits
    fresh = SweepTrainer(
        CBFSSM, smoke_config(),
        {"k_factor": np.asarray([1.0, 50.0, 200.0])},
        trainer.model_dir + "_fresh",
    )
    fresh.init_state()
    z = np.asarray(fresh.params["model"].gp_f.z)
    np.testing.assert_array_equal(z[0], z[1])
    np.testing.assert_array_equal(z[0], z[2])


def test_best_config_and_json(swept):
    trainer, sweep, out = swept
    best = trainer.best_config()
    i = trainer.best_seed()
    assert best["k_factor"] == pytest.approx(sweep["k_factor"][i])
    assert np.asarray(best["loss_factors"]) == pytest.approx(sweep["loss_factors"][i])
    with open(os.path.join(out, "sweep_best.json")) as f:
        assert json.load(f) == best


def test_seed_view_and_var_dump(swept, ds):
    """Per-point evaluation plumbing: SeedView params drive the
    SweptModel's predict, and var_dict includes the swept values."""
    trainer, _, _ = swept
    view = trainer.seed_view(1)
    pred = trainer.model.predict(
        view.params, ds.test_in_batch[:4], ds.test_out_batch[:4],
        jax.random.PRNGKey(0),
    )
    assert np.isfinite(np.asarray(pred.pred_mean)).all()
    vd = trainer.model.var_dict(view.params)
    assert float(vd["sweep k_factor"]) == pytest.approx(50.0)


def test_learning_rate_sweep(ds, tmp_path):
    """lr enters via optax.inject_hyperparams: a 0-lr lane must not
    move, a positive-lr lane must."""
    sweep = {"learning_rate": np.asarray([0.0, 0.05])}
    trainer = SweepTrainer(CBFSSM, smoke_config(), sweep, str(tmp_path / "lr"))
    trainer.init_state()
    z0 = np.asarray(trainer.params["model"].gp_f.z)
    trainer.train(ds, epochs=2)
    z1 = np.asarray(trainer.params["model"].gp_f.z)
    np.testing.assert_array_equal(z1[0], z0[0])  # lr=0 lane frozen
    assert np.abs(z1[1] - z0[1]).max() > 0  # lr>0 lane trained
    assert trainer.best_config()["learning_rate"] in (0.0, 0.05)


def test_voliro_loss_time_fields_sweep(tmp_path):
    """The Voliro hypers (loglik_factor / Beta priors) unpack from
    tracers — one vmapped loss call over a 2-point grid."""
    from cbfssm_tpu.models import Voliro
    from cbfssm_tpu.training.sweep import SweptModel

    class _DS:
        dim_u = 13
        dim_y = 22

    cfg = {
        "ds": _DS,
        "batch_size": 2,
        "ind_pnt_num": 4,
        "samples": 2,
        "learning_rate": 0.01,
        "loglik_factor": np.asarray([20.0, 0.0, 200.0]),
        "n_beta": [10.0, 2.0, 10.0],
        "l_beta": [1.0, 10.0, 10.0],
        "zeta_pos": 2.0,
        "zeta_mean": 0.0025,
        "zeta_var": 0.0001,
        "gp_var": 0.25,
        "gp_len": 5.0,
        "var_x": np.asarray([0.02] * 7 + [0.2] * 6) ** 2,
        "var_y": np.asarray([0.02] * 7 + [0.2] * 6) ** 2,
        "var_z": np.asarray([0.02] * 6),
    }
    model = SweptModel(Voliro, cfg, ("loglik_factor", "n_beta"))
    params = jax.vmap(model.init)(jax.random.split(jax.random.PRNGKey(0), 2))
    params["hyper"] = {
        "loglik_factor": jnp.asarray([[20.0, 0.0, 200.0], [5.0, 0.0, 50.0]]),
        "n_beta": jnp.asarray([[10.0, 2.0, 10.0], [5.0, 1.0, 5.0]]),
    }
    rng = np.random.default_rng(0)
    pwm = rng.uniform(0.3, 0.9, size=(2, 8, 6))
    tilt = rng.uniform(-0.5, 0.5, size=(2, 8, 6))
    ts = np.broadcast_to(np.arange(8.0)[None, :, None] * 0.02, (2, 8, 1))
    u = np.concatenate((pwm, tilt, ts), axis=-1).astype(np.float32)
    y = (rng.normal(size=(2, 8, 22)) * 0.1).astype(np.float32)
    q = rng.normal(size=(2, 8, 4))
    y[..., 12:16] = (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)

    losses, _ = jax.vmap(
        lambda p, k: model.loss(p, u, y, k, True)
    )(params, jax.random.split(jax.random.PRNGKey(1), 2))
    assert np.isfinite(np.asarray(losses)).all()
    assert len(np.unique(np.asarray(losses))) == 2


def test_constant_grid_lanes_identical(ds, tmp_path):
    """Default (vary_init=False): shared init + shared shuffles + shared
    RNG stream -> a constant grid produces IDENTICAL lanes, so any loss
    difference in a real sweep is attributable to the grid alone."""
    n = 3
    trainer = SweepTrainer(
        CBFSSM, smoke_config(),
        {"k_factor": np.full(n, smoke_config()["k_factor"])},
        str(tmp_path / "const"),
    )
    trainer.train(ds, epochs=2)
    losses = np.stack(trainer.train_all)  # [epochs, n]
    for e in range(losses.shape[0]):
        assert len(np.unique(losses[e])) == 1, losses[e]


def test_best_ckpt_single_model_consumable(swept, ds):
    """best.ckpt holds the winning point's UNWRAPPED model tree — the
    documented single-model-consumer contract (multiseed.py)."""
    import optax

    from cbfssm_tpu.training import checkpoint

    trainer, _, out = swept
    model = CBFSSM(smoke_config())
    params_t = model.init(jax.random.PRNGKey(0))
    opt_t = optax.adam(model.config.learning_rate).init(params_t)
    tree = checkpoint.restore(
        os.path.join(out, checkpoint.BEST), {"params": params_t, "opt_state": opt_t}
    )
    want = trainer.params_for(trainer.best_seed())["model"]
    np.testing.assert_array_equal(
        np.asarray(tree["params"].gp_f.z), np.asarray(want.gp_f.z)
    )
    loss, _ = model.loss(
        tree["params"], ds.test_in_batch[:4], ds.test_out_batch[:4],
        jax.random.PRNGKey(0), True,
    )
    assert np.isfinite(float(loss))


def test_evaluate_rmse_matches_outputs(swept, ds, tmp_path):
    """The vmapped grid evaluation reproduces Outputs.test_mse exactly
    per lane."""
    from cbfssm_tpu.outputs import Outputs

    trainer, _, _ = swept
    rmse = trainer.evaluate_rmse(ds)
    assert rmse.shape == (trainer.n_seeds,)
    i = 1
    o = Outputs(str(tmp_path / "pt"))
    o.set_ds(ds)
    o.set_model(trainer.model, trainer.model_dir)
    o.set_trainer(trainer.seed_view(i))
    o.create_all()
    np.testing.assert_allclose(rmse[i], o.get_last_rmse(), rtol=1e-6)


def test_structural_fields_rejected():
    with pytest.raises(ValueError, match="not sweepable"):
        SweepTrainer(
            CBFSSM, smoke_config(), {"recog_len": np.asarray([4, 8])}, "/tmp/x"
        )


def test_field_unread_by_model_rejected():
    """A loss-time field the TARGET model never reads must fail fast
    (otherwise the grid's 'best' value would be pure noise)."""
    with pytest.raises(ValueError, match="not sweepable for CBFSSM"):
        SweepTrainer(
            CBFSSM, smoke_config(),
            {"loglik_factor": np.asarray([[20.0, 0.0, 200.0]] * 2)}, "/tmp/x",
        )


def test_scalar_and_empty_sweeps_rejected():
    with pytest.raises(ValueError, match="length-n array"):
        SweepTrainer(CBFSSM, smoke_config(), {"k_factor": 5.0}, "/tmp/x")
    with pytest.raises(ValueError, match="at least one field"):
        SweepTrainer(CBFSSM, smoke_config(), {}, "/tmp/x")


def test_mismatched_lengths_rejected():
    with pytest.raises(ValueError, match="share length"):
        SweepTrainer(
            CBFSSM,
            smoke_config(),
            {"k_factor": np.asarray([1.0]), "learning_rate": np.asarray([0.1, 0.2])},
            "/tmp/x",
        )


def test_retrain_with_changed_grid_fails_fast(ds, tmp_path):
    """A changed grid on retrain would silently train the checkpointed
    OLD hyper values while best_config() reports the new grid — must
    raise instead."""
    out = str(tmp_path / "regrid")
    t1 = SweepTrainer(CBFSSM, smoke_config(), {"k_factor": np.asarray([1.0, 50.0])}, out)
    t1.train(ds, epochs=1)
    t2 = SweepTrainer(CBFSSM, smoke_config(), {"k_factor": np.asarray([5.0, 500.0])}, out)
    with pytest.raises(ValueError, match="retrain grid mismatch"):
        t2.init_state(retrain=True)
    # the ORIGINAL grid resumes fine
    t3 = SweepTrainer(CBFSSM, smoke_config(), {"k_factor": np.asarray([1.0, 50.0])}, out)
    t3.train(ds, epochs=1, retrain=True)
    assert np.isfinite(np.stack(t3.train_all)).all()


def test_retrain_with_changed_lr_grid_fails_fast(ds, tmp_path):
    """learning_rate is popped from the sweep dict into the optimizer, so
    the hyper-leaf retrain check never sees it — the optimizer-hyperparam
    comparison must fail fast the same way."""
    out = str(tmp_path / "relr")
    grid = {"learning_rate": np.asarray([0.01, 0.05])}
    t1 = SweepTrainer(CBFSSM, smoke_config(), grid, out)
    t1.train(ds, epochs=1)
    t2 = SweepTrainer(
        CBFSSM, smoke_config(), {"learning_rate": np.asarray([0.02, 0.05])}, out
    )
    with pytest.raises(ValueError, match="retrain grid mismatch for 'learning_rate'"):
        t2.init_state(retrain=True)
    # the ORIGINAL lr grid resumes fine
    t3 = SweepTrainer(CBFSSM, smoke_config(), grid, out)
    t3.train(ds, epochs=1, retrain=True)
    assert np.isfinite(np.stack(t3.train_all)).all()


def test_product_grid_seed_replication(ds, tmp_path):
    """A seeded grid (points x seeds in one program): replicate lanes of
    one point share the hyper value but differ in init/stream
    (vary_init=True), so grouped() gives per-point mean/std."""
    base = {"k_factor": np.asarray([10.0, 200.0])}
    sweep = SweepTrainer.product_grid(base, seeds_per_point=2)
    np.testing.assert_array_equal(
        sweep["k_factor"], np.asarray([10.0, 10.0, 200.0, 200.0])
    )
    trainer = SweepTrainer(
        CBFSSM, smoke_config(), sweep, str(tmp_path / "pg"), vary_init=True
    )
    trainer.train(ds, epochs=2)
    losses = SweepTrainer.grouped(np.stack(trainer.train_all)[-1], 2)
    assert losses.shape == (2, 2)
    # replicates of one point differ (independent seeds)...
    assert losses[0, 0] != losses[0, 1]
    rmse = SweepTrainer.grouped(trainer.evaluate_rmse(ds), 2)
    assert rmse.shape == (2, 2) and np.isfinite(rmse).all()


def test_retrain_with_changed_lr_grid_length_fails_fast(ds, tmp_path):
    """A changed lr grid LENGTH (e.g. fewer points x more seeds at the
    same lane count) must fail fast like changed values — array_equal is
    False on shape mismatch, and nothing may silently stamp a
    wrong-length lr over the checkpointed optimizer hyperparams."""
    out = str(tmp_path / "relrlen")
    t1 = SweepTrainer(
        CBFSSM, smoke_config(), {"learning_rate": np.asarray([0.01, 0.02])}, out
    )
    t1.train(ds, epochs=1)
    t2 = SweepTrainer(
        CBFSSM, smoke_config(),
        {"learning_rate": np.asarray([0.01, 0.02, 0.03])}, out,
    )
    with pytest.raises(Exception):
        # either the stacked-restore shape check or the lr fail-fast
        # must stop this; it must never resume silently
        t2.train(ds, epochs=1, retrain=True)

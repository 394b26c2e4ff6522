"""MultiSeedTrainer: N replicates as one vmapped program.

Correctness contract: every seed trains (finite, decreasing losses),
seeds are genuinely independent (different inits/draws -> different
losses), best-by-train tracking matches a manual replay, per-seed
params round-trip through the stacked checkpoint, and the seed axis
shards over a mesh.
"""

import jax
import numpy as np
import pytest

from cbfssm_tpu.models import CBFSSM
from cbfssm_tpu.training import MultiSeedTrainer, checkpoint
from tests.test_trainer import SmokeDS, smoke_config


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    ds = SmokeDS()
    model = CBFSSM(smoke_config())
    out = str(tmp_path_factory.mktemp("ms"))
    trainer = MultiSeedTrainer(model, out, n_seeds=3)
    trainer.train(ds, epochs=3)
    return trainer, model, ds, out


def test_all_seeds_train(trained):
    trainer, _, _, _ = trained
    losses = np.stack(trainer.train_all)  # [epochs, n_seeds]
    assert losses.shape == (3, 3)
    assert np.isfinite(losses).all()
    # every seed improves over training
    assert (losses[-1] < losses[0]).all()


def test_seeds_are_independent(trained):
    trainer, _, _, _ = trained
    final = np.stack(trainer.train_all)[-1]
    assert len(np.unique(final)) == trainer.n_seeds


def test_best_tracking_matches_replay(trained):
    trainer, _, _, _ = trained
    losses = np.stack(trainer.train_all)  # [epochs, n_seeds]
    np.testing.assert_allclose(
        np.asarray(trainer.best_loss), losses.min(axis=0), rtol=1e-12
    )
    assert trainer.best_seed() == int(np.argmin(losses.min(axis=0)))


def test_params_for_slices_and_evaluates(trained):
    trainer, model, ds, _ = trained
    p0 = trainer.params_for(0)
    # an unstacked tree drives the plain single-model loss
    u = ds.test_in_batch[:4]
    y = ds.test_out_batch[:4]
    loss, _ = model.loss(p0, u, y, jax.random.PRNGKey(0), True)
    assert np.isfinite(float(loss))
    # slices of different seeds differ
    p1 = trainer.params_for(1)
    assert np.abs(np.asarray(p0.gp_f.z) - np.asarray(p1.gp_f.z)).max() > 0


def test_checkpoint_roundtrip(trained):
    trainer, model, ds, out = trained
    import os

    from cbfssm_tpu.training.multiseed import BEST_SEEDS

    tree = checkpoint.restore(
        os.path.join(out, BEST_SEEDS),
        {"params": trainer.best_params, "opt_state": trainer.best_opt},
    )
    a = np.asarray(tree["params"].gp_f.z)
    np.testing.assert_array_equal(a, np.asarray(trainer.best_params.gp_f.z))


def test_single_model_best_ckpt_is_best_seed(trained):
    """best.ckpt must hold the overall-best seed's UNstacked tree so any
    single-model consumer (e.g. Outputs' trainerless re-evaluation)
    loads valid parameters."""
    trainer, model, ds, out = trained
    import os

    import optax

    params_t = model.init(jax.random.PRNGKey(0))
    opt_t = optax.adam(model.config.learning_rate).init(params_t)
    tree = checkpoint.restore(
        os.path.join(out, checkpoint.BEST), {"params": params_t, "opt_state": opt_t}
    )
    want = trainer.params_for(trainer.best_seed())
    np.testing.assert_array_equal(
        np.asarray(tree["params"].gp_f.z), np.asarray(want.gp_f.z)
    )
    # and it is consumable without any trainer at all
    loss, _ = model.loss(
        tree["params"], ds.test_in_batch[:4], ds.test_out_batch[:4],
        jax.random.PRNGKey(0), True,
    )
    assert np.isfinite(float(loss))


def test_trainerless_outputs_after_vmapped_run(trained, tmp_path):
    """The reference's train=False re-evaluation path works on a
    vmapped run's directory (Outputs restores best.ckpt directly)."""
    trainer, model, ds, out = trained
    from cbfssm_tpu.outputs import Outputs

    o = Outputs(str(tmp_path / "reeval"))
    o.set_ds(ds)
    o.set_model(model, out)  # no set_trainer: restores from disk
    o.create_all()
    assert np.isfinite(o.get_last_rmse())


def test_multiseed_with_flax_recognition(tmp_path):
    """Param trees with flax module dicts (GRU recognition) vmap and
    slice correctly through the seed axis."""
    from cbfssm_tpu.models import CBFSSMHALF

    cfg = smoke_config()
    cfg["recog_model"] = "rnn"
    cfg["recog_len"] = 4
    cfg["var_y"] = np.asarray([1.0])  # CBFSSMHALF: var_y has dim_y entries
    model = CBFSSMHALF(cfg)
    trainer = MultiSeedTrainer(model, str(tmp_path / "half"), n_seeds=2)
    ds = SmokeDS()
    trainer.train(ds, epochs=2)
    losses = np.stack(trainer.train_all)
    assert np.isfinite(losses).all()
    p0 = trainer.params_for(0)
    loss, _ = model.loss(
        p0, ds.test_in_batch[:4], ds.test_out_batch[:4], jax.random.PRNGKey(0), True
    )
    assert np.isfinite(float(loss))


def test_multiseed_retrain_resumes(tmp_path):
    """retrain=True restores the stacked last checkpoint (curriculum
    semantics, per Trainer parity)."""
    ds = SmokeDS()
    model = CBFSSM(smoke_config())
    out = str(tmp_path / "msr")
    t1 = MultiSeedTrainer(model, out, n_seeds=2)
    t1.train(ds, epochs=2)
    final = np.asarray(t1.params.gp_f.z)
    t2 = MultiSeedTrainer(model, out, n_seeds=2)
    t2.init_state(retrain=True)
    np.testing.assert_array_equal(np.asarray(t2.params.gp_f.z), final)
    # and training continues from there
    t2.train(ds, epochs=1, retrain=True)
    assert np.isfinite(np.stack(t2.train_all)).all()


def test_blocked_epochs_match_sequential(tmp_path):
    """epochs_per_dispatch on the vmapped trainer: K fused epochs must
    equal per-epoch dispatch exactly — losses, best tracking, and both
    stacked checkpoints (5 epochs at K=2: two blocks + per-epoch
    tail)."""
    ds = SmokeDS()
    model = CBFSSM(smoke_config())
    trs = {}
    for name, epd in (("seq", 1), ("blk", 2)):
        tr = MultiSeedTrainer(
            model, str(tmp_path / name), n_seeds=2, epochs_per_dispatch=epd
        )
        tr.train(ds, epochs=5)
        trs[name] = tr
    np.testing.assert_array_equal(
        np.stack(trs["seq"].train_all), np.stack(trs["blk"].train_all)
    )
    np.testing.assert_array_equal(
        np.stack(trs["seq"].test_all), np.stack(trs["blk"].test_all)
    )
    np.testing.assert_array_equal(
        np.asarray(trs["seq"].best_loss), np.asarray(trs["blk"].best_loss)
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        (trs["seq"].best_params, trs["seq"].params),
        (trs["blk"].best_params, trs["blk"].params),
    )


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_seed_axis_sharded_over_mesh(tmp_path):
    from cbfssm_tpu.parallel import make_mesh

    ds = SmokeDS()
    model = CBFSSM(smoke_config())
    mesh = make_mesh(4, axis_name="data")
    trainer = MultiSeedTrainer(model, str(tmp_path / "ms4"), n_seeds=4, mesh=mesh)
    trainer.train(ds, epochs=2)
    losses = np.stack(trainer.train_all)
    assert np.isfinite(losses).all()
    assert (losses[-1] < losses[0]).all()
    # the stacked params really live sharded across the mesh
    assert len(trainer.params.gp_f.z.sharding.device_set) == 4

"""skip_nonfinite_updates: the per-step non-finite guard.

Contract (config.py ``skip_nonfinite_updates``):

* on clean data the guard is a no-op — the update VALUES are
  unchanged, so losses/checkpoints match the unguarded path to
  compiled-program reassociation noise (rtol 1e-12 at f64: the guard's
  isfinite reductions change the XLA program, which may reassociate a
  fused reduction's last ulp — equality across different programs
  cannot be bitwise);
* a batch whose loss/gradients are non-finite leaves params AND
  opt_state (Adam moments + step count) untouched, so one poisoned
  batch costs one skipped step instead of the whole run;
* skip counts surface (``trainer.skipped_steps``, metrics.jsonl);
* the fused-block schedule and the vmapped multi-seed trainer apply
  the guard identically (per lane for multiseed).
"""

import os

import jax
import numpy as np

from cbfssm_tpu.models import CBFSSM
from cbfssm_tpu.training import MultiSeedTrainer, Trainer, checkpoint

from test_trainer import SmokeDS, smoke_config


def _poisoned_ds():
    """SmokeDS with ONE training window's targets set to NaN (window 5:
    not window 0, which pad rows gather with weight 0 — 0*NaN is NaN,
    so a poisoned window 0 would also poison every padded batch)."""
    ds = SmokeDS()
    ds.train_out_batch = np.array(ds.train_out_batch)
    ds.train_out_batch[5] = np.nan
    return ds


def _tree_finite(tree) -> bool:
    return all(
        bool(np.isfinite(np.asarray(leaf)).all())
        for leaf in jax.tree_util.tree_leaves(tree)
    )


def _assert_ckpt_equal(dir_a, dir_b, model, tx, seed, rtol=0.0,
                       names=(checkpoint.BEST, checkpoint.LAST)):
    template = {
        "params": model.init(jax.random.PRNGKey(seed)),
        "opt_state": tx.init(model.init(jax.random.PRNGKey(seed))),
    }
    for name in names:
        t_a = checkpoint.restore(os.path.join(dir_a, name), template)
        t_b = checkpoint.restore(os.path.join(dir_b, name), template)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=rtol, atol=0.0
            ),
            t_a, t_b,
        )


def test_guard_is_identity_on_clean_data(tmp_path):
    ds = SmokeDS()
    runs = {}
    for name, flag in (("off", False), ("on", True)):
        model = CBFSSM({**smoke_config(), "skip_nonfinite_updates": flag})
        tr = Trainer(model, str(tmp_path / name), seed=3)
        tr.train(ds, epochs=4)
        runs[name] = tr
    np.testing.assert_allclose(
        runs["off"].train_all, runs["on"].train_all, rtol=1e-12
    )
    np.testing.assert_allclose(
        runs["off"].test_all, runs["on"].test_all, rtol=1e-12
    )
    assert runs["on"].skipped_steps == 0
    _assert_ckpt_equal(
        str(tmp_path / "off"), str(tmp_path / "on"),
        runs["on"].model, runs["on"].tx, seed=3, rtol=1e-12,
    )


def test_guard_skips_poisoned_batch(tmp_path):
    ds = _poisoned_ds()
    epochs = 3

    # unguarded: the NaN batch poisons params for the rest of the run
    model = CBFSSM(smoke_config())
    tr_off = Trainer(model, str(tmp_path / "off"), seed=0)
    tr_off.train(ds, epochs=epochs)
    assert not _tree_finite(tr_off.params)

    # guarded: exactly one skipped batch per epoch, finite params out
    model_g = CBFSSM({**smoke_config(), "skip_nonfinite_updates": True})
    tr_on = Trainer(model_g, str(tmp_path / "on"), seed=0)
    tr_on.train(ds, epochs=epochs)
    assert tr_on.skipped_steps == epochs  # the one poisoned window/epoch
    assert _tree_finite(tr_on.params)
    # logged losses stay honest: the poisoned batch makes the epoch
    # mean NaN — the guard protects the STATE, not the report
    assert not np.isfinite(tr_on.train_all).all()


def test_guard_blocked_matches_per_epoch(tmp_path):
    """The fused-block schedule applies the guard identically to
    per-epoch dispatch: same losses (NaN where poisoned), same skip
    counts, same finite checkpoints."""
    ds = _poisoned_ds()
    model = CBFSSM({**smoke_config(), "skip_nonfinite_updates": True})
    trs = {}
    for name, epd in (("seq", 1), ("blk", 2)):
        tr = Trainer(
            model, str(tmp_path / name), epochs_per_dispatch=epd, seed=3
        )
        tr.train(ds, epochs=5)
        trs[name] = tr
    np.testing.assert_array_equal(trs["seq"].train_all, trs["blk"].train_all)
    np.testing.assert_array_equal(trs["seq"].test_all, trs["blk"].test_all)
    assert trs["seq"].skipped_steps == trs["blk"].skipped_steps == 5
    assert _tree_finite(trs["blk"].params)
    # every epoch's TRAIN MEAN is NaN here (one poisoned batch per
    # epoch), so best-by-train-loss never fires (NaN < best is False)
    # and only LAST exists — compare that; on a run where only some
    # epochs are poisoned, best tracking works as usual
    _assert_ckpt_equal(
        str(tmp_path / "seq"), str(tmp_path / "blk"), model, trs["seq"].tx,
        seed=3, names=(checkpoint.LAST,),
    )


def test_guard_multiseed_per_lane(tmp_path):
    """MultiSeedTrainer (and, via inheritance, SweepTrainer) applies
    the guard per lane; clean lanes are untouched, every lane survives
    the poisoned batch, counts aggregate across lanes."""
    ds = SmokeDS()
    runs = {}
    for name, flag in (("off", False), ("on", True)):
        model = CBFSSM({**smoke_config(), "skip_nonfinite_updates": flag})
        tr = MultiSeedTrainer(model, str(tmp_path / name), n_seeds=2, seed=1)
        tr.train(ds, epochs=2)
        runs[name] = tr
    np.testing.assert_allclose(
        runs["off"].train_all, runs["on"].train_all, rtol=1e-12
    )
    assert runs["on"].skipped_steps == 0

    epochs = 3
    pds = _poisoned_ds()
    model = CBFSSM({**smoke_config(), "skip_nonfinite_updates": True})
    # epochs_per_dispatch=2 exercises the fused block + per-epoch tail
    tr = MultiSeedTrainer(
        model, str(tmp_path / "poisoned"), n_seeds=2, seed=1,
        epochs_per_dispatch=2,
    )
    tr.train(pds, epochs=epochs)
    assert tr.skipped_steps == epochs * 2  # one bad window/epoch/lane
    assert _tree_finite(tr.params)

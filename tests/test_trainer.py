"""Training loop, checkpointing, sharding, and end-to-end smoke tests."""

import os

import jax
import numpy as np
import pytest

from cbfssm_tpu.models import CBFSSM
from cbfssm_tpu.outputs import Outputs, OutputSummary
from cbfssm_tpu.parallel import make_mesh, pad_batch
from cbfssm_tpu.training import Trainer, checkpoint


class SmokeDS:
    """Synthetic first-order system, Actuator-shaped: one experiment,
    windowed into sequences (no files needed)."""

    dim_u = 1
    dim_y = 1

    def __init__(self, seq_len=12, seq_stride=4, n=160, seed=0):
        from cbfssm_tpu.data.base import BaseDS

        rng = np.random.default_rng(seed)
        u = rng.uniform(-1, 1, size=(n, 1))
        x = np.zeros(n)
        for i in range(1, n):
            x[i] = 0.8 * x[i - 1] + 0.3 * np.tanh(u[i - 1, 0])
        y = (x + rng.normal(0, 0.01, size=n))[:, None]

        base = BaseDS(seq_len, seq_stride)
        base.normalize_init(u, y)
        split = 120
        base.train_in = base.normalize(u, "in")[None, :split]
        base.train_out = base.normalize(y, "out")[None, :split]
        base.test_in = base.normalize(u, "in")[None, split:]
        base.test_out = base.normalize(y, "out")[None, split:]
        base.create_batches()
        self.__dict__.update(base.__dict__)
        self.normalize = base.normalize
        self.denormalize = base.denormalize


def smoke_config(dim_x=2):
    return {
        "ds": SmokeDS,
        "batch_size": 8,
        "shuffle": 100,
        "dim_x": dim_x,
        "ind_pnt_num": 5,
        "samples": 4,
        "learning_rate": 0.05,
        "loss_factors": np.asarray([0.5, 0.0]),
        "k_factor": 50.0,
        "recog_len": 4,
        "zeta_pos": 2.0,
        "zeta_mean": 0.0025,
        "zeta_var": 0.0001,
        "var_x": np.asarray([0.002**2] * dim_x),
        "var_y": np.asarray([1.0] * dim_x),
        "gp_var": 0.25,
        "gp_len": 2.0,
        "dtype": "float64",
        "jitter": 1e-8,
    }


def test_pad_batch():
    (u, y), w = pad_batch((np.ones((3, 4, 1)), np.ones((3, 4, 2))), 8)
    assert u.shape == (8, 4, 1)
    assert y.shape == (8, 4, 2)
    np.testing.assert_allclose(w, [1, 1, 1, 0, 0, 0, 0, 0])
    np.testing.assert_allclose(u[3:], 0.0)


def test_train_decreases_loss(tmp_path):
    ds = SmokeDS()
    model = CBFSSM(smoke_config())
    trainer = Trainer(model, str(tmp_path / "m"))
    trainer.train(ds, epochs=6)
    assert len(trainer.train_all) == 6
    assert all(np.isfinite(trainer.train_all))
    # optimization must actually reduce the loss on this easy system
    assert trainer.train_all[-1] < trainer.train_all[0]
    # checkpoints exist
    assert checkpoint.exists(os.path.join(str(tmp_path / "m"), checkpoint.BEST))
    assert checkpoint.exists(os.path.join(str(tmp_path / "m"), checkpoint.LAST))


def test_blocked_epochs_match_sequential(tmp_path):
    """epochs_per_dispatch fuses K epochs into one device program; the
    contract is EXACT equivalence with per-epoch dispatch: same losses
    (host RNG shuffles and fold_in key streams are consumed in the same
    order), same best.ckpt (tracked in-carry on device), same last.ckpt.
    5 epochs with K=2 exercises two full blocks plus the per-epoch
    tail."""
    ds = SmokeDS()
    model = CBFSSM(smoke_config())
    trs = {}
    for name, epd in (("seq", 1), ("blk", 2)):
        tr = Trainer(model, str(tmp_path / name), epochs_per_dispatch=epd, seed=3)
        tr.train(ds, epochs=5)
        trs[name] = tr
    np.testing.assert_array_equal(trs["seq"].train_all, trs["blk"].train_all)
    np.testing.assert_array_equal(trs["seq"].test_all, trs["blk"].test_all)

    template = {
        "params": model.init(jax.random.PRNGKey(3)),
        "opt_state": trs["seq"].tx.init(model.init(jax.random.PRNGKey(3))),
    }
    for name in (checkpoint.BEST, checkpoint.LAST):
        t_seq = checkpoint.restore(os.path.join(str(tmp_path / "seq"), name), template)
        t_blk = checkpoint.restore(os.path.join(str(tmp_path / "blk"), name), template)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            t_seq, t_blk,
        )


def test_blocked_auto_resolution(tmp_path):
    """'auto' targets ~300 steps/dispatch and degrades to 1 for long
    epochs or profiled runs."""
    model = CBFSSM(smoke_config())
    tr = Trainer(model, str(tmp_path / "epd"))
    assert tr._resolve_epd(steps_per_epoch=10, epochs=1000) == 30
    assert tr._resolve_epd(steps_per_epoch=400, epochs=1000) == 1
    assert tr._resolve_epd(steps_per_epoch=1, epochs=1000) == 64
    assert tr._resolve_epd(steps_per_epoch=10, epochs=4) == 4
    tr_prof = Trainer(model, str(tmp_path / "epd"),
                      profile_dir=str(tmp_path / "trace"))
    assert tr_prof._resolve_epd(steps_per_epoch=10, epochs=1000) == 1
    tr_pin = Trainer(model, str(tmp_path / "epd"), epochs_per_dispatch=7)
    assert tr_pin._resolve_epd(steps_per_epoch=10, epochs=1000) == 7


def test_checkpoint_roundtrip(tmp_path):
    ds = SmokeDS()
    model = CBFSSM(smoke_config())
    trainer = Trainer(model, str(tmp_path / "m"))
    trainer.train(ds, epochs=1)
    saved = jax.tree_util.tree_map(np.asarray, trainer.params)

    trainer2 = Trainer(model, str(tmp_path / "m"))
    restored = trainer2.restore(checkpoint.LAST)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        saved,
        restored,
    )


def test_restore_then_train_on_mesh_matches_unmeshed(tmp_path):
    """Resuming training from Trainer.restore() on an 8-device mesh must
    replicate the restored state over the mesh (same placement as
    init_state) and produce the same losses as the unmeshed resume."""
    ds = SmokeDS()
    model = CBFSSM(smoke_config())
    base_dir = str(tmp_path / "m")
    Trainer(model, base_dir).train(ds, epochs=1)

    losses = {}
    for name, mesh in (("flat", None), ("mesh", make_mesh(8))):
        tr = Trainer(model, base_dir, mesh=mesh)
        tr.restore(checkpoint.LAST)
        if mesh is not None:
            for leaf in jax.tree_util.tree_leaves((tr.params, tr.opt_state)):
                assert getattr(leaf.sharding, "mesh", None) == mesh, (
                    "restored state not placed on the trainer's mesh"
                )
        batch_size = tr.dp.round_up_batch(model.config.batch_size)
        losses[name] = tr._epoch_train(ds, batch_size, jax.random.PRNGKey(7))
    np.testing.assert_allclose(losses["mesh"], losses["flat"], rtol=1e-6)


def test_retrain_resumes(tmp_path):
    ds = SmokeDS()
    model = CBFSSM(smoke_config())
    trainer = Trainer(model, str(tmp_path / "m"))
    trainer.train(ds, epochs=1)
    first = jax.tree_util.tree_map(np.asarray, trainer.params)
    trainer.train(ds, epochs=1, retrain=True)
    # parameters moved on from the restored state
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()), first, trainer.params
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_outputs_artifacts(tmp_path):
    ds = SmokeDS()
    model = CBFSSM(smoke_config())
    out_dir = str(tmp_path / "out")
    trainer = Trainer(model, out_dir)
    trainer.train(ds, epochs=2)

    outputs = Outputs(out_dir)
    outputs.set_ds(ds)
    outputs.set_model(model, out_dir)
    outputs.set_trainer(trainer)
    outputs.create_all()

    for fname in [
        "training_loss.pdf",
        "predict_train.pdf",
        "predict_train.mat",
        "predict_test.pdf",
        "predict_test.mat",
        "mse.txt",
        "var_dump.txt",
    ]:
        assert os.path.isfile(os.path.join(out_dir, fname)), fname
    assert outputs.get_last_rmse() is not None and np.isfinite(outputs.get_last_rmse())

    with open(os.path.join(out_dir, "mse.txt")) as f:
        content = f.read()
    assert content.startswith("MSE:")
    assert "RMSE:" in content

    summary = OutputSummary(str(tmp_path / "summary"))
    summary.add_outputs(outputs)
    summary.write_summary()
    with open(os.path.join(str(tmp_path / "summary"), "summary.txt")) as f:
        assert "Mean:" in f.read()


def test_outputs_without_trainer(tmp_path):
    """train=False re-evaluation (reference template.py:42): a fresh
    Outputs with no trainer restores best.ckpt straight from disk."""
    ds = SmokeDS()
    model = CBFSSM(smoke_config())
    out_dir = str(tmp_path / "out")
    Trainer(model, out_dir).train(ds, epochs=1)

    outputs = Outputs(out_dir)   # NO set_trainer
    outputs.set_ds(ds)
    outputs.set_model(model, out_dir)
    outputs.create_all()
    assert outputs.get_last_rmse() is not None
    assert os.path.isfile(os.path.join(out_dir, "mse.txt"))
    # training_stats is skipped gracefully without a trainer
    assert not os.path.isfile(os.path.join(out_dir, "training_loss.pdf"))


def test_metrics_and_profile_trace(tmp_path):
    """JSONL metrics stream + jax.profiler trace artifacts."""
    import json

    ds = SmokeDS()
    model = CBFSSM(smoke_config())
    metrics_path = str(tmp_path / "metrics.jsonl")
    profile_dir = str(tmp_path / "trace")
    trainer = Trainer(
        model,
        str(tmp_path / "m"),
        metrics_path=metrics_path,
        profile_dir=profile_dir,
    )
    trainer.train(ds, epochs=2)

    lines = [json.loads(l) for l in open(metrics_path)]
    epochs = [l for l in lines if l["event"] == "epoch"]
    assert len(epochs) == 2
    assert all(np.isfinite(e["train_loss"]) for e in epochs)
    assert epochs[0]["steps_per_sec"] > 0
    assert lines[-1]["event"] == "done"
    # profiler trace written during epoch 1
    assert os.path.isdir(profile_dir)
    assert any(os.scandir(profile_dir)), "empty profiler trace dir"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_data_parallel_training(tmp_path):
    """Full train step over an 8-device CPU mesh: batch axis sharded,
    params replicated, psum'd grads — loss matches single-device to
    float64 tolerance."""
    ds = SmokeDS()
    model = CBFSSM(smoke_config())
    mesh = make_mesh(8)
    trainer = Trainer(model, str(tmp_path / "mesh"), mesh=mesh)
    trainer.train(ds, epochs=2)
    assert all(np.isfinite(trainer.train_all))

    trainer_single = Trainer(model, str(tmp_path / "single"))
    trainer_single.train(ds, epochs=2)
    # same seed, same batches -> identical losses up to reduction order
    np.testing.assert_allclose(
        trainer.train_all, trainer_single.train_all, rtol=1e-8
    )


def test_async_saver_last_writer_wins(tmp_path):
    """After flush() the directory holds the LAST tree submitted for a
    path, matching what synchronous saves would have left (same-path
    saves coalesce latest-wins; intermediate versions may never hit
    disk by design)."""
    saver = checkpoint.AsyncSaver()
    path = str(tmp_path / "ck")
    template = {"w": np.zeros(3)}
    for k in range(5):
        saver.save(path, {"w": np.full(3, float(k))})
    saver.flush()
    out = checkpoint.restore(path, template)
    np.testing.assert_array_equal(np.asarray(out["w"]), np.full(3, 4.0))


def test_async_saver_snapshots_on_caller_thread(tmp_path):
    """save() must materialize the tree before returning — later
    in-place mutation (the stand-in for a donated device buffer being
    overwritten by the next jitted update) must not leak into the
    checkpoint."""
    saver = checkpoint.AsyncSaver()
    path = str(tmp_path / "ck")
    arr = np.ones(4)
    saver.save(path, {"w": arr})
    arr[:] = -7.0  # mutate AFTER submission, possibly before the write
    saver.flush()
    out = checkpoint.restore(path, {"w": np.zeros(4)})
    np.testing.assert_array_equal(np.asarray(out["w"]), np.ones(4))


def test_async_saver_flush_reraises_worker_error(tmp_path, monkeypatch):
    """A failed background write surfaces on flush() (not silently),
    and the saver is usable again afterwards."""
    saver = checkpoint.AsyncSaver()
    calls = {"n": 0}
    real_write = checkpoint._write

    def flaky(path, tree):
        calls["n"] += 1
        if calls["n"] == 1:
            raise IOError("disk full (injected)")
        real_write(path, tree)

    monkeypatch.setattr(checkpoint, "_write", flaky)
    saver.save(str(tmp_path / "bad"), {"w": np.zeros(2)})
    with pytest.raises(IOError, match="injected"):
        saver.flush()
    # error is cleared; subsequent saves work
    saver.save(str(tmp_path / "good"), {"w": np.ones(2)})
    saver.flush()
    out = checkpoint.restore(str(tmp_path / "good"), {"w": np.zeros(2)})
    np.testing.assert_array_equal(np.asarray(out["w"]), np.ones(2))


def test_async_saver_flush_prefix_is_path_scoped(tmp_path, monkeypatch):
    """flush(prefix) owns errors by PATH COMPONENT: flushing 'm1' must
    not steal (and clear) an error belonging to the sibling dir 'm10'."""
    saver = checkpoint.AsyncSaver()
    m1, m10 = str(tmp_path / "m1"), str(tmp_path / "m10")

    def failing(path, tree):
        raise IOError(f"injected for {path}")

    monkeypatch.setattr(checkpoint, "_write", failing)
    saver.save(os.path.join(m10, "best.ckpt"), {"w": np.zeros(2)})
    saver.flush(m1)  # m10's error must NOT surface (or be cleared) here
    with pytest.raises(IOError, match="m10"):
        saver.flush(m10)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_blocked_pipeline_on_mesh_matches_unmeshed(tmp_path):
    """The fused-epoch + one-deep-pipeline path (dispatch/process split,
    device-side best chaining) over an 8-device mesh: losses must match
    the unmeshed run and the drained checkpoints must be complete
    (2 blocks of 3 epochs + a per-epoch tail epoch)."""
    ds = SmokeDS()
    model = CBFSSM(smoke_config())
    losses = {}
    for name, mesh in (("mesh", make_mesh(8)), ("flat", None)):
        tr = Trainer(
            model, str(tmp_path / name), mesh=mesh, epochs_per_dispatch=3
        )
        tr.train(ds, epochs=7)
        losses[name] = tr.train_all
        assert checkpoint.exists(os.path.join(str(tmp_path / name), checkpoint.BEST))
        assert checkpoint.exists(os.path.join(str(tmp_path / name), checkpoint.LAST))
    np.testing.assert_allclose(losses["mesh"], losses["flat"], rtol=1e-8)


def test_async_saver_coalesces_same_path(tmp_path, monkeypatch):
    """While the worker is busy, repeated saves of one path collapse to
    the newest tree (the backlog holds at most one pending copy per
    path); the final directory content equals the last save."""
    import threading

    gate = threading.Event()
    writes = []
    real_write = checkpoint._write

    def gated(path, tree):
        gate.wait()
        writes.append(float(np.asarray(tree["w"])[0]))
        real_write(path, tree)

    monkeypatch.setattr(checkpoint, "_write", gated)
    saver = checkpoint.AsyncSaver()
    path = str(tmp_path / "ck")
    for k in range(6):
        saver.save(path, {"w": np.full(2, float(k))})
    gate.set()
    saver.flush()
    # at most: the write already in flight + one coalesced newest
    assert len(writes) <= 2 and writes[-1] == 5.0
    out = checkpoint.restore(path, {"w": np.zeros(2)})
    np.testing.assert_array_equal(np.asarray(out["w"]), np.full(2, 5.0))


def test_shared_saver_is_process_wide(tmp_path):
    """Trainers share one background writer (no thread per instance)."""
    assert checkpoint.shared_saver() is checkpoint.shared_saver()
    model = CBFSSM(smoke_config())
    t1 = Trainer(model, str(tmp_path / "a"))
    t2 = Trainer(model, str(tmp_path / "b"))
    assert t1.saver is t2.saver is checkpoint.shared_saver()


def test_async_saver_flush_scopes_errors_by_prefix(tmp_path, monkeypatch):
    """With the process-wide shared writer, flush(model_dir) surfaces
    only that trainer's write failures; another trainer's error stays
    queued for ITS flush instead of being misattributed and cleared."""
    saver = checkpoint.AsyncSaver()
    real_write = checkpoint._write

    def flaky(path, tree):
        if "dir_a" in path:
            raise IOError("A's disk full (injected)")
        real_write(path, tree)

    monkeypatch.setattr(checkpoint, "_write", flaky)
    saver.save(str(tmp_path / "dir_a" / "ck"), {"w": np.zeros(2)})
    saver.save(str(tmp_path / "dir_b" / "ck"), {"w": np.ones(2)})
    saver.flush(str(tmp_path / "dir_b"))  # B's flush: no error
    with pytest.raises(IOError, match="A's disk full"):
        saver.flush(str(tmp_path / "dir_a"))
    saver.flush()  # nothing left

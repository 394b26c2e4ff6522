"""Self-describing model directories (cbfssm_tpu/model_store.py) and the
`python -m cbfssm_tpu export` CLI.

Contracts under test:

- Trainer writes ``model_meta.json`` next to its checkpoints, and
  ``load_trained_model(dir)`` rebuilds ``(model, params)`` from the
  directory alone — params EXACTLY equal to ``trainer.restore``, and the
  rebuilt model's predict numerically identical to the original's
  (config fidelity incl. numpy-array fields).
- The export CLI turns such a directory into a framework-free artifact
  whose served numbers match the in-framework model.
"""

import json
import os

import jax
import numpy as np
import pytest

from cbfssm_tpu import model_store
from cbfssm_tpu.__main__ import main as cli_main
from cbfssm_tpu.models import CBFSSM, CBFSSMHALF
from cbfssm_tpu.training import Trainer, checkpoint
from tests.test_other_models import half_config
from tests.test_trainer import SmokeDS, smoke_config


@pytest.fixture(scope="module")
def trained_dir(tmp_path_factory):
    """One short real training run shared by the read-side tests."""
    path = str(tmp_path_factory.mktemp("store") / "m")
    ds = SmokeDS()
    model = CBFSSM(smoke_config())
    trainer = Trainer(model, path, seed=4)
    trainer.train(ds, epochs=2)
    return path, model, trainer


def test_trainer_writes_meta(trained_dir):
    path, model, _ = trained_dir
    meta = json.load(open(os.path.join(path, model_store.MODEL_META)))
    assert meta["model_class"] == "CBFSSM"
    assert meta["dim_u"] == SmokeDS.dim_u and meta["dim_y"] == SmokeDS.dim_y
    assert meta["seed"] == 4
    assert meta["ds_name"] == "SmokeDS"
    cfg = smoke_config()
    # numpy-array fields round-trip through the tagged encoding
    decoded = model_store._decode(meta["config"]["var_x"])
    np.testing.assert_array_equal(decoded, cfg["var_x"])
    assert decoded.dtype == cfg["var_x"].dtype
    assert meta["config"]["dtype"] == "float64"
    assert meta["dropped_keys"] == []


def test_load_trained_model_matches_restore(trained_dir):
    path, _, trainer = trained_dir
    model, params = model_store.load_trained_model(path)
    expected = trainer.restore(checkpoint.BEST)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        params, expected,
    )
    # last checkpoint loads by explicit name
    _, last = model_store.load_trained_model(path, checkpoint.LAST)
    assert jax.tree_util.tree_structure(last) == \
        jax.tree_util.tree_structure(params)


def test_rebuilt_model_predicts_identically(trained_dir, rng):
    path, original, _ = trained_dir
    rebuilt, params = model_store.load_trained_model(path)
    assert type(rebuilt) is type(original)
    u = rng.normal(size=(2, 8, SmokeDS.dim_u))
    y = rng.normal(size=(2, 8, SmokeDS.dim_y))
    key = jax.random.PRNGKey(11)
    a = original.predict(params, u, y, key)
    b = rebuilt.predict(params, u, y, key)
    np.testing.assert_array_equal(np.asarray(a.pred_mean),
                                  np.asarray(b.pred_mean))
    np.testing.assert_array_equal(np.asarray(a.mse), np.asarray(b.mse))


def test_encode_decode_roundtrip():
    values = {
        "arr": np.asarray([1.5, 2.5], dtype=np.float32),
        "nested": [np.asarray([1, 2]), "s", 3, {"k": np.float64(2.0)}],
        "plain": (1.0, 2.0),
    }
    enc = model_store._encode(values)
    json.dumps(enc)  # must be JSON-clean
    dec = model_store._decode(enc)
    np.testing.assert_array_equal(dec["arr"], values["arr"])
    assert dec["arr"].dtype == np.float32
    np.testing.assert_array_equal(dec["nested"][0], values["nested"][0])
    assert dec["nested"][3]["k"] == 2.0
    assert dec["plain"] == [1.0, 2.0]


def test_unserializable_extra_dropped_not_fatal(tmp_path):
    cfg = smoke_config()
    cfg["weird"] = object()  # lands in config.extra
    model = CBFSSM(cfg)
    meta = model_store.save_model_meta(str(tmp_path), model)
    assert "extra.weird" in meta["dropped_keys"]
    assert "weird" not in meta["extra"]
    # and the snapshot still loads
    rebuilt = model_store.build_model(model_store.load_model_meta(str(tmp_path)))
    assert type(rebuilt) is CBFSSM


def test_missing_meta_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="model_meta.json"):
        model_store.load_model_meta(str(tmp_path))


def test_missing_checkpoint_raises(tmp_path):
    model = CBFSSM(smoke_config())
    model_store.save_model_meta(str(tmp_path), model)
    with pytest.raises(FileNotFoundError, match="no checkpoint"):
        model_store.load_trained_model(str(tmp_path))


def test_multiseed_dir_is_loadable(tmp_path):
    """MultiSeedTrainer dirs carry the snapshot too: best.ckpt is the
    winning seed's unstacked tree, so load_trained_model rebuilds it."""
    from cbfssm_tpu.training import MultiSeedTrainer

    out = str(tmp_path / "ms")
    trainer = MultiSeedTrainer(CBFSSM(smoke_config()), out, n_seeds=2, seed=7)
    trainer.train(SmokeDS(), epochs=2)
    model, params = model_store.load_trained_model(out)
    assert type(model) is CBFSSM
    expected = trainer._single_tree(trainer.best_seed(), best=True)["params"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        params, expected,
    )
    meta = model_store.load_model_meta(out)
    assert meta["model_class"] == "CBFSSM" and meta["seed"] == 7


def test_sweep_dir_folds_winning_point(tmp_path):
    """SweepTrainer snapshots the inner template (not the SweptModel
    adapter) and folds the winning grid point into the meta after
    training, so the rebuilt model IS the winning configuration."""
    from cbfssm_tpu.training import SweepTrainer

    out = str(tmp_path / "sw")
    sweep = {"k_factor": np.asarray([1.0, 50.0, 200.0])}
    trainer = SweepTrainer(CBFSSM, smoke_config(), sweep, out)
    trainer.train(SmokeDS(), epochs=2)
    best = trainer.best_config()
    meta = model_store.load_model_meta(out)
    assert meta["model_class"] == "CBFSSM"
    assert meta["config"]["k_factor"] == best["k_factor"]
    assert meta["config_updates"]["values"] == {"k_factor": best["k_factor"]}
    model, params = model_store.load_trained_model(out)
    assert float(model.config.k_factor) == best["k_factor"]
    # the rebuilt winning model evaluates its own checkpoint
    u = np.zeros((1, 8, SmokeDS.dim_u))
    y = np.zeros((1, 8, SmokeDS.dim_y))
    pred = model.predict(params, u, y, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(pred.pred_mean)).all()


def test_reinstantiation_preserves_folded_winner(tmp_path):
    """Reopening a directory whose snapshot holds a folded sweep winner
    (retrain / eval-only) must not clobber the winning values — best.ckpt
    still holds the winning point's params."""
    model = CBFSSM(smoke_config())
    out = str(tmp_path)
    model_store.save_model_meta(out, model)
    model_store.fold_config_updates(out, {"k_factor": 123.0}, note="win")
    # a fresh trainer-style snapshot of the SAME class keeps the fold
    model_store.save_model_meta(out, model, seed=9)
    meta = model_store.load_model_meta(out)
    assert meta["config"]["k_factor"] == 123.0
    assert meta["config_updates"]["values"] == {"k_factor": 123.0}
    assert meta["seed"] == 9  # the re-stamp itself still lands
    # a DIFFERENT model class genuinely repurposes the directory
    half = CBFSSMHALF(half_config("rnn"))
    model_store.save_model_meta(out, half)
    meta = model_store.load_model_meta(out)
    assert meta["model_class"] == "CBFSSMHALF"
    assert "k_factor" not in meta.get("config_updates", {}).get("values", {})


def test_explicit_new_config_supersedes_stale_fold(tmp_path):
    """A trainer explicitly constructed with a DIFFERENT value for a
    folded key supersedes the stale sweep winner (its training will
    overwrite best.ckpt); keys still at the pre-fold base carry the
    fold forward."""
    cfg = smoke_config()
    base_k = cfg["k_factor"]
    model = CBFSSM(cfg)
    out = str(tmp_path)
    model_store.save_model_meta(out, model)
    model_store.fold_config_updates(
        out, {"k_factor": 123.0, "zeta_pos": 9.0}, note="win")
    cfg2 = smoke_config()
    cfg2["k_factor"] = base_k + 1.0  # explicit override
    model_store.save_model_meta(out, CBFSSM(cfg2))
    meta = model_store.load_model_meta(out)
    assert meta["config"]["k_factor"] == base_k + 1.0  # new value wins
    assert meta["config"]["zeta_pos"] == 9.0  # unchanged base: fold kept
    assert meta["config_updates"]["values"] == {"zeta_pos": 9.0}


def test_adapter_models_snapshot_inner_model(tmp_path):
    """ParticleParallel (and SweptModel via 'template') snapshot their
    inner real-model instance — a Trainer on an adapter still produces
    an exportable, loadable directory."""
    from cbfssm_tpu.parallel import make_mesh
    from cbfssm_tpu.parallel.particle import ParticleParallel

    cfg = smoke_config()
    cfg["samples"] = 4
    pp = ParticleParallel(CBFSSM, cfg, make_mesh(4, axis_name="particle"))
    meta = model_store.save_model_meta(str(tmp_path), pp, seed=3)
    assert meta["model_class"] == "CBFSSM"
    assert meta["config"]["samples"] == 4  # the FULL particle count
    rebuilt = model_store.build_model(meta)
    assert type(rebuilt) is CBFSSM


def test_dtype_spelling_canonicalized(tmp_path):
    """Any dtype-like config spelling snapshots to the canonical name,
    so meta_requires_x64 / the export CLI never miss an f64 model."""
    cfg = smoke_config()
    cfg["dtype"] = np.float64  # a type object, not the string
    model = CBFSSM(cfg)
    meta = model_store.save_model_meta(str(tmp_path), model)
    assert meta["config"]["dtype"] == "float64"
    assert model_store.meta_requires_x64(meta)
    assert not model_store.meta_requires_x64(
        {"config": {"dtype": "float32"}})
    assert not model_store.meta_requires_x64({"config": {}})


# --- CLI ----------------------------------------------------------------


def test_cli_export_predictor_roundtrip(trained_dir, tmp_path, rng):
    path, _, trainer = trained_dir
    out = str(tmp_path / "artifact")
    rc = cli_main(["export", path, "--out", out, "--seq-len", "8",
                   "--batch", "2", "--platforms", "cpu"])
    assert rc == 0
    from cbfssm_tpu.export import ExportedPredictor

    pred = ExportedPredictor(out)
    model, params = model_store.load_trained_model(path)
    u = rng.normal(size=(2, 8, SmokeDS.dim_u))
    y = rng.normal(size=(2, 8, SmokeDS.dim_y))
    key = jax.random.PRNGKey(5)
    served = pred(u, y, key)
    direct = model.predict(params, u, y, key)
    np.testing.assert_allclose(
        np.asarray(served["pred_mean"]), np.asarray(direct.pred_mean),
        rtol=1e-12,
    )


def test_cli_export_filter(tmp_path, rng):
    model = CBFSSMHALF(half_config("rnn"))
    params = model.init(jax.random.PRNGKey(0))
    mdir = str(tmp_path / "m")
    model_store.save_model_meta(mdir, model)
    checkpoint.save(os.path.join(mdir, checkpoint.BEST),
                    {"params": params,
                     "opt_state": __import__("optax").adam(
                         model.config.learning_rate).init(params)})
    out = str(tmp_path / "artifact")
    rc = cli_main(["export", mdir, "--out", out, "--kind", "filter",
                   "--horizons", "3", "--replay-buckets", "4",
                   "--platforms", "cpu"])
    assert rc == 0
    from cbfssm_tpu.export import ExportedFilter
    from cbfssm_tpu.serving import StreamingFilter

    served = ExportedFilter(out)
    assert served.meta["replay_buckets"] == [4]
    ref = StreamingFilter(model, params)
    L = model.config.recog_len
    u_p = rng.normal(size=(1, L, model.dim_u))
    y_p = rng.normal(size=(1, L, model.dim_y))
    served.start(u_p, y_p)
    ref.start(u_p, y_p)
    u1 = rng.normal(size=(1, model.dim_u))
    y1 = rng.normal(size=(1, model.dim_y))
    m_s, v_s = served.update(u1, y1)
    m_r, v_r = ref.update(u1, y1)
    np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_r), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_r), rtol=1e-12)
    # the CLI-exported replay programs serve the backlog path too
    ub = rng.normal(size=(1, 3, model.dim_u))
    yb = rng.normal(size=(1, 3, model.dim_y))
    m_blk, _ = served.replay(ub, yb)
    for t in range(3):
        m_seq, _ = ref.update(ub[:, t], yb[:, t])
        np.testing.assert_allclose(m_blk[:, t], np.asarray(m_seq),
                                   rtol=1e-12, atol=1e-13)


def test_cli_info_describes_trained_dir(trained_dir, tmp_path, capsys):
    path, _, _ = trained_dir
    rc = cli_main(["info", path])
    out = capsys.readouterr().out
    assert rc == 0
    assert "CBFSSM" in out and "best.ckpt" in out and "model.ckpt" in out
    assert "dtype" in out  # config listing present
    rc = cli_main(["info", str(tmp_path / "nothing")])
    assert rc == 2
    assert "model_meta.json" in capsys.readouterr().err


def test_cli_export_errors(trained_dir, tmp_path, capsys):
    path, _, _ = trained_dir
    # missing meta
    rc = cli_main(["export", str(tmp_path / "nothing"),
                   "--out", str(tmp_path / "a")])
    assert rc == 2
    assert "model_meta.json" in capsys.readouterr().err
    # predictor without --seq-len
    rc = cli_main(["export", path, "--out", str(tmp_path / "b")])
    assert rc == 2
    assert "--seq-len" in capsys.readouterr().err
    # filter kind on a model without the streaming interface
    rc = cli_main(["export", path, "--out", str(tmp_path / "c"),
                   "--kind", "filter"])
    assert rc == 2
    assert "streaming" in capsys.readouterr().err


def test_cli_export_rejects_bad_replay_bucket(tmp_path, capsys):
    model = CBFSSMHALF(half_config("rnn"))
    params = model.init(jax.random.PRNGKey(0))
    mdir = str(tmp_path / "m")
    model_store.save_model_meta(mdir, model)
    checkpoint.save(os.path.join(mdir, checkpoint.BEST),
                    {"params": params,
                     "opt_state": __import__("optax").adam(
                         model.config.learning_rate).init(params)})
    rc = cli_main(["export", mdir, "--out", str(tmp_path / "a"),
                   "--kind", "filter", "--replay-buckets", "0",
                   "--platforms", "cpu"])
    assert rc == 2
    assert "replay_buckets" in capsys.readouterr().err


def test_dataset_recipe_survives_meta_restamp(tmp_path):
    """Re-instantiating a trainer on a trained directory (retrain /
    eval-only flows call save_model_meta from __init__) must not erase
    the dataset recipe `eval <dir>` depends on."""
    from cbfssm_tpu.training import Trainer

    ds = SmokeDS()
    model = CBFSSM(smoke_config())
    out = str(tmp_path / "m")
    Trainer(model, out).train(ds, epochs=1)  # stamps the recipe
    recipe = model_store.load_model_meta(out)["dataset"]
    assert recipe["name"] == "SmokeDS"
    assert recipe == {"name": "SmokeDS", "seq_len": 12, "seq_stride": 4}

    Trainer(model, out)  # __init__ re-stamps model_meta.json
    assert model_store.load_model_meta(out)["dataset"] == recipe

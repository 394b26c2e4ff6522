"""Exported-predictor artifact tests (cbfssm_tpu/export.py).

The contract under test: `save_exported_predictor` writes a
self-contained directory whose `ExportedPredictor` load serves the
exact numbers of the in-framework AOT predictor — without building a
model object or importing the model zoo.
"""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from cbfssm_tpu.export import (
    ExportedPredictor,
    load_exported_predictor,
    save_exported_predictor,
)
from cbfssm_tpu.serving import CompiledPredictor
from tests.test_cbfssm_model import make_model


def _export_cbfssm(tmp_path, batch=1, seq_len=8, condition=False, seed=0):
    model = make_model()
    params = model.init(jax.random.PRNGKey(0))
    path = os.path.join(str(tmp_path), "artifact")
    # f64 test model: lower for cpu only (TPU has no f64)
    meta = save_exported_predictor(
        path, model, params, batch, seq_len,
        condition=condition, platforms=("cpu",), seed=seed,
    )
    return model, params, path, meta


def test_loaded_arrays_live_on_device(tmp_path):
    """Params (and filter ops) are device_put once at load time — numpy
    leaves would re-upload the whole set on every call (per-step for the
    filter hot path)."""
    _, _, path, _ = _export_cbfssm(tmp_path)
    pred = ExportedPredictor(path)
    assert all(isinstance(p, jax.Array) for p in pred._params)
    from cbfssm_tpu.export import ExportedFilter

    _, _, fpath, _ = _export_filter(tmp_path)
    filt = ExportedFilter(fpath)
    assert all(isinstance(p, jax.Array) for p in filt._params)
    assert all(isinstance(o, jax.Array) for o in filt._ops)


def test_roundtrip_matches_compiled_predictor(tmp_path, rng):
    model, params, path, meta = _export_cbfssm(tmp_path)
    pred = ExportedPredictor(path)
    ref = CompiledPredictor(model, params, batch=1, seq_len=8)
    u = rng.normal(size=(1, 8, 2))
    y = rng.normal(size=(1, 8, 1))
    out = pred(u, y)
    ref_out = ref(u, y)
    assert set(out) == set(meta["output_fields"])
    for field in meta["output_fields"]:
        np.testing.assert_allclose(
            np.asarray(out[field]), np.asarray(getattr(ref_out, field)),
            rtol=1e-12, err_msg=field,
        )


def test_keyed_call_matches_model_predict(tmp_path, rng):
    model, params, path, _ = _export_cbfssm(tmp_path, seed=7)
    pred = ExportedPredictor(path)
    u = rng.normal(size=(1, 8, 2))
    y = rng.normal(size=(1, 8, 1))
    key = jax.random.PRNGKey(123)
    out = pred(u, y, key=np.asarray(key))
    ref = model.predict(params, u, y, key, condition=False)
    np.testing.assert_allclose(
        np.asarray(out["pred_mean"]), np.asarray(ref.pred_mean), rtol=1e-12
    )
    # the keyless default is the export-time seed, not key 0
    out_default = pred(u, y)
    ref_seeded = model.predict(
        params, u, y, jax.random.PRNGKey(7), condition=False
    )
    np.testing.assert_allclose(
        np.asarray(out_default["pred_mean"]),
        np.asarray(ref_seeded.pred_mean), rtol=1e-12,
    )


def test_conditioned_export(tmp_path, rng):
    model, params, path, meta = _export_cbfssm(tmp_path, condition=True)
    assert meta["condition"] is True
    pred = load_exported_predictor(path)
    u = rng.normal(size=(1, 8, 2))
    y = rng.normal(size=(1, 8, 1))
    out = pred(u, y)
    ref = model.predict(
        params, u, y, jax.random.PRNGKey(0), condition=True
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_mean"]), np.asarray(ref.pred_mean), rtol=1e-12
    )


def test_shape_and_dtype_guards(tmp_path, rng):
    _, _, path, _ = _export_cbfssm(tmp_path)
    pred = ExportedPredictor(path)
    with pytest.raises(ValueError, match="exported for u"):
        pred(rng.normal(size=(2, 8, 2)), rng.normal(size=(2, 8, 1)))
    with pytest.raises(ValueError, match="exported for y"):
        pred(rng.normal(size=(1, 8, 2)), rng.normal(size=(1, 8, 2)))


def test_voliro_dict_predict_exports(tmp_path, rng):
    """The ★★ Voliro model's dict predict (pred moments + force-model
    outputs) exports verbatim; served numbers equal the direct call."""
    from cbfssm_tpu.models import Voliro
    from tests.test_other_models import voliro_batch, voliro_config

    model = Voliro(voliro_config())
    params = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "v")
    meta = save_exported_predictor(
        path, model, params, 2, 6, condition=True, platforms=("cpu",)
    )
    assert set(meta["output_fields"]) == {
        "pred_mean", "pred_var", "force_torque", "ft_mean", "ft_var",
    }
    pred = ExportedPredictor(path)
    u, y = voliro_batch(np.random.default_rng(0), b=2, t=6)
    key = jax.random.PRNGKey(3)
    out = pred(u, y, key)
    direct = model.predict(params, u, y, key, condition=True)
    for k in direct:
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(direct[k]), rtol=1e-12
        )


def test_rejects_models_without_pred_mean(tmp_path):
    class NoContract:
        dim_u, dim_y = 2, 1
        dtype = np.float64

        def predict(self, params, u, y, key, condition=False):
            return (u, y)  # neither PredictOutput nor a pred_mean dict

    with pytest.raises(TypeError, match="PredictOutput"):
        save_exported_predictor(
            str(tmp_path / "n"), NoContract(), {"w": np.zeros(2)}, 1, 4,
            platforms=("cpu",)
        )


def test_meta_records_contract(tmp_path):
    _, _, path, meta = _export_cbfssm(tmp_path, batch=2, seq_len=6)
    on_disk = json.load(open(os.path.join(path, "meta.json")))
    assert on_disk == meta
    assert on_disk["batch"] == 2 and on_disk["seq_len"] == 6
    assert on_disk["dim_u"] == 2 and on_disk["dim_y"] == 1
    assert on_disk["model_class"] == "CBFSSM"
    assert on_disk["requires_x64"] is True  # test model is f64
    assert on_disk["platforms"] == ["cpu"]
    assert sorted(os.listdir(path)) == [
        "meta.json", "params.npz", "predictor.jaxexp",
    ]


def test_load_does_not_import_model_zoo(tmp_path, rng):
    """The deployment claim: serving an artifact must not build a model
    or import cbfssm_tpu.models / cbfssm_tpu.ops beyond what the
    package __init__ pulls in — verified in a fresh interpreter."""
    _, _, path, _ = _export_cbfssm(tmp_path)
    code = f"""
import json, sys
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
from cbfssm_tpu.export import ExportedPredictor
pred = ExportedPredictor({path!r})
rng = np.random.default_rng(0)
out = pred(rng.normal(size=(1, 8, 2)), rng.normal(size=(1, 8, 1)))
assert np.isfinite(np.asarray(out["pred_mean"])).all()
assert "cbfssm_tpu.models" not in sys.modules, "model zoo was imported"
assert "cbfssm_tpu.serving" not in sys.modules, "serving stack was imported"
print("STANDALONE-LOAD-OK", float(np.asarray(out["mse"])))
"""
    env = dict(
        os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr
    assert "STANDALONE-LOAD-OK" in proc.stdout


def test_x64_artifact_guard(tmp_path, monkeypatch):
    """Loading a 64-bit artifact with x64 disabled must fail with the
    actionable message, not produce silently-downcast numerics."""
    _, _, path, _ = _export_cbfssm(tmp_path)
    monkeypatch.setattr(
        "cbfssm_tpu.export.jax.config",
        type("C", (), {"jax_enable_x64": False})(),
    )
    with pytest.raises(RuntimeError, match="x64"):
        ExportedPredictor(path)


def test_platform_guard(tmp_path):
    _, _, path, _ = _export_cbfssm(tmp_path)
    meta_path = os.path.join(path, "meta.json")
    meta = json.load(open(meta_path))
    meta["platforms"] = ["tpu"]  # artifact claims TPU-only
    json.dump(meta, open(meta_path, "w"))
    with pytest.raises(RuntimeError, match="exported for"):
        ExportedPredictor(path)


def test_format_version_stamped_and_gated(tmp_path):
    """Every artifact meta carries format_version; a mismatching stamp
    fails with the clear re-export message, not a deserialization
    error deep in jax.export (r4 verdict weak #5)."""
    from cbfssm_tpu.export import FORMAT_VERSION

    _, _, path, meta = _export_cbfssm(tmp_path)
    assert meta["format_version"] == FORMAT_VERSION
    meta_path = os.path.join(path, "meta.json")
    on_disk = json.load(open(meta_path))
    assert on_disk["format_version"] == FORMAT_VERSION

    on_disk["format_version"] = FORMAT_VERSION + 1
    json.dump(on_disk, open(meta_path, "w"))
    with pytest.raises(RuntimeError, match="format v2.*expects v1"):
        ExportedPredictor(path)


def test_format_version_absent_reads_as_v0(tmp_path):
    """A pre-stamp (round <= 4) artifact must fail with the explicit
    predates-stamping message, not a KeyError or a silent load."""
    _, _, path, _ = _export_cbfssm(tmp_path)
    meta_path = os.path.join(path, "meta.json")
    on_disk = json.load(open(meta_path))
    del on_disk["format_version"]
    json.dump(on_disk, open(meta_path, "w"))
    with pytest.raises(RuntimeError, match="v0.*predates format stamping"):
        ExportedPredictor(path)


def test_checksum_manifest_detects_corruption(tmp_path):
    """meta.json carries a sha256 manifest of every artifact file; a
    flipped byte or a missing file (torn copy to a standby host) fails
    at load with a clear message, before deserialization."""
    from cbfssm_tpu.export import FORMAT_VERSION  # noqa: F401

    _, _, path, meta = _export_cbfssm(tmp_path)
    assert set(meta["sha256"]) == {"predictor.jaxexp", "params.npz"}

    blob = open(os.path.join(path, "params.npz"), "rb").read()
    with open(os.path.join(path, "params.npz"), "wb") as f:
        f.write(blob[:-4] + bytes([blob[-4] ^ 0xFF]) + blob[-3:])
    with pytest.raises(RuntimeError, match="checksum mismatch"):
        ExportedPredictor(path)

    os.remove(os.path.join(path, "params.npz"))
    with pytest.raises(RuntimeError, match="missing"):
        ExportedPredictor(path)


def test_checksum_manifest_ignores_stray_files(tmp_path):
    """Only the files the exporter wrote are manifested: a pre-existing
    unrelated file in the target dir must not become load-bearing."""
    model = make_model()
    params = model.init(jax.random.PRNGKey(0))
    path = os.path.join(str(tmp_path), "art")
    os.makedirs(path)
    stray = os.path.join(path, "notes.txt")
    open(stray, "w").write("not part of the artifact")
    meta = save_exported_predictor(path, model, params, 1, 8,
                                   platforms=("cpu",))
    assert "notes.txt" not in meta["sha256"]
    os.remove(stray)  # deleting the stray must not break loading
    ExportedPredictor(path)


# --- online-filter artifacts -------------------------------------------


def _export_filter(tmp_path, horizons=(5,), seed=0):
    from cbfssm_tpu.models import CBFSSMHALF
    from tests.test_other_models import half_config

    from cbfssm_tpu.export import save_exported_filter

    model = CBFSSMHALF(half_config("rnn"))
    params = model.init(jax.random.PRNGKey(0))
    path = os.path.join(str(tmp_path), "filter")
    meta = save_exported_filter(
        path, model, params, batch=2, horizons=horizons,
        platforms=("cpu",), seed=seed,
    )
    return model, params, path, meta


def test_filter_lockstep_with_streaming_filter(tmp_path, rng):
    """The exported filter must be lockstep-equal to the in-framework
    StreamingFilter: same start, same update stream, same forecast."""
    from cbfssm_tpu.export import ExportedFilter
    from cbfssm_tpu.serving import StreamingFilter

    model, params, path, meta = _export_filter(tmp_path, horizons=(5,))
    exported = ExportedFilter(path)
    ref = StreamingFilter(model, params, batch=2, seed=0)
    recog = meta["recog_len"]
    u_prefix = rng.normal(size=(2, recog, 2))
    y_prefix = rng.normal(size=(2, recog, 1))
    exported.start(u_prefix, y_prefix)
    ref.start(u_prefix, y_prefix)
    for _ in range(3):
        u1 = rng.normal(size=(2, 2))
        y1 = rng.normal(size=(2, 1))
        got = exported.update(u1, y1)
        want = ref.update(u1, y1)
        for g, w in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=1e-12, atol=1e-13
            )
    u_future = rng.normal(size=(2, 5, 2))
    got_m, got_v = exported.forecast(u_future)
    want_m, want_v = ref.forecast(u_future)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-12, atol=1e-13)
    # ensembles advanced identically too
    np.testing.assert_allclose(
        np.asarray(exported.state[0]), np.asarray(ref.state[0]),
        rtol=1e-12, atol=1e-13,
    )


def test_filter_state_failover(tmp_path, rng):
    """state/load_state resumes exactly (the StreamingFilter failover
    contract) — including into a FRESH loader instance."""
    from cbfssm_tpu.export import ExportedFilter

    _, _, path, meta = _export_filter(tmp_path)
    f1 = ExportedFilter(path)
    recog = meta["recog_len"]
    f1.start(rng.normal(size=(2, recog, 2)), rng.normal(size=(2, recog, 1)))
    u1, y1 = rng.normal(size=(2, 2)), rng.normal(size=(2, 1))
    f1.update(u1, y1)
    snap = f1.state
    m_cont, _ = f1.update(u1, y1)

    f2 = ExportedFilter(path)
    f2.load_state(snap)
    m_resumed, _ = f2.update(u1, y1)
    np.testing.assert_array_equal(np.asarray(m_cont), np.asarray(m_resumed))


def test_filter_guards(tmp_path, rng):
    from cbfssm_tpu.export import ExportedFilter

    _, _, path, meta = _export_filter(tmp_path, horizons=(5,))
    f = ExportedFilter(path)
    with pytest.raises(RuntimeError, match="start"):
        f.update(rng.normal(size=(2, 2)), rng.normal(size=(2, 1)))
    recog = meta["recog_len"]
    f.start(rng.normal(size=(2, recog, 2)), rng.normal(size=(2, recog, 1)))
    with pytest.raises(ValueError, match="update expects"):
        f.update(rng.normal(size=(2, 3)), rng.normal(size=(2, 1)))
    with pytest.raises(ValueError, match="horizon 7 not exported"):
        f.forecast(rng.normal(size=(2, 7, 2)))
    with pytest.raises(ValueError, match="ensemble must be"):
        f.load_state((np.zeros((1, 1, 1)), 0))


def test_filter_replay_matches_sequential(tmp_path, rng):
    """The exported fused-replay programs reproduce K sequential
    exported updates (same key schedule), chunked + padded over the
    exported bucket ladder; counters and ensembles agree."""
    from cbfssm_tpu.export import ExportedFilter

    model, params, path, meta = _export_filter(tmp_path)
    from cbfssm_tpu.export import save_exported_filter

    rpath = os.path.join(str(tmp_path), "filter_replay")
    meta = save_exported_filter(
        rpath, model, params, batch=2, replay_buckets=(2, 4),
        platforms=("cpu",), seed=0,
    )
    assert meta["replay_buckets"] == [2, 4]
    recog = meta["recog_len"]
    u = rng.normal(size=(2, 20, 2))
    y = rng.normal(size=(2, 20, 1))

    seq = ExportedFilter(rpath)
    seq.start(u[:, :recog], y[:, :recog])
    ms = []
    for t in range(recog, recog + 7):
        m, _ = seq.update(u[:, t - 1], y[:, t])
        ms.append(np.asarray(m))
    seq_m = np.stack(ms, axis=1)

    rep = ExportedFilter(rpath)
    rep.start(u[:, :recog], y[:, :recog])
    # K=7 over (2, 4): chunks 4 (exact) + 3 (padded to 4)
    m, v = rep.replay(u[:, recog - 1:recog + 6], y[:, recog:recog + 7])
    assert m.shape == (2, 7, 1) and v.shape == (2, 7, 1)
    np.testing.assert_allclose(m, seq_m, rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(rep.state[0]), np.asarray(seq.state[0]),
        rtol=1e-12, atol=1e-13,
    )
    assert rep.state[1] == seq.state[1] == 7
    # continuation from the same counter
    m_s, _ = seq.update(u[:, recog + 6], y[:, recog + 7])
    m_r, _ = rep.update(u[:, recog + 6], y[:, recog + 7])
    np.testing.assert_allclose(
        np.asarray(m_r), np.asarray(m_s), rtol=1e-11, atol=1e-12
    )


def test_filter_replay_guards(tmp_path, rng):
    """Artifacts without replay programs load fine but name the fix;
    replay validates backlog shapes like update does."""
    from cbfssm_tpu.export import ExportedFilter, save_exported_filter

    model, params, path, meta = _export_filter(tmp_path)  # no buckets
    f = ExportedFilter(path)
    recog = meta["recog_len"]
    f.start(rng.normal(size=(2, recog, 2)), rng.normal(size=(2, recog, 1)))
    with pytest.raises(ValueError, match="replay_buckets"):
        f.replay(rng.normal(size=(2, 3, 2)), rng.normal(size=(2, 3, 1)))

    rpath = os.path.join(str(tmp_path), "fr")
    save_exported_filter(rpath, model, params, batch=2,
                         replay_buckets=(4,), platforms=("cpu",))
    g = ExportedFilter(rpath)
    with pytest.raises(RuntimeError, match="start"):
        g.replay(rng.normal(size=(2, 3, 2)), rng.normal(size=(2, 3, 1)))
    g.start(rng.normal(size=(2, recog, 2)), rng.normal(size=(2, recog, 1)))
    with pytest.raises(ValueError, match="u_block"):
        g.replay(rng.normal(size=(3, 2)), rng.normal(size=(2, 3, 1)))
    with pytest.raises(ValueError, match="y_block"):
        g.replay(rng.normal(size=(2, 3, 2)), rng.normal(size=(2, 2, 1)))
    with pytest.raises(ValueError, match=">= 1"):
        save_exported_filter(os.path.join(str(tmp_path), "bad"), model,
                             params, replay_buckets=(0,), platforms=("cpu",))
    # invalid options must fail BEFORE any file write — re-exporting
    # over an existing artifact with a bad bucket must not corrupt it
    # (mtimes catch same-name overwrites, not just added files)
    def snapshot():
        return {
            n: os.stat(os.path.join(path, n)).st_mtime_ns
            for n in sorted(os.listdir(path))
        }

    before = snapshot()
    with pytest.raises(ValueError, match=">= 1"):
        save_exported_filter(path, model, params, batch=2,
                             replay_buckets=(0,), platforms=("cpu",))
    assert snapshot() == before
    still = ExportedFilter(path)  # loads and serves unchanged
    still.start(rng.normal(size=(2, recog, 2)),
                rng.normal(size=(2, recog, 1)))


def test_artifact_kind_guards(tmp_path):
    from cbfssm_tpu.export import ExportedFilter

    _, _, pred_path, _ = _export_cbfssm(tmp_path)
    _, _, filt_path, _ = _export_filter(tmp_path)
    with pytest.raises(ValueError, match="not an exported predictor"):
        ExportedPredictor(filt_path)
    with pytest.raises(ValueError, match="not an exported filter"):
        ExportedFilter(pred_path)


def test_filter_rejects_models_without_streaming(tmp_path):
    from cbfssm_tpu.export import save_exported_filter

    model = make_model()
    params = model.init(jax.random.PRNGKey(0))
    with pytest.raises(TypeError, match="streaming interface"):
        save_exported_filter(str(tmp_path / "f"), model, params)

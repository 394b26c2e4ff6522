"""Exported fleet-pool artifacts (cbfssm_tpu/export_pool.py).

The contract under test: `save_exported_pool` ships FilterPool's whole
compiled program surface; `ExportedFilterPool` serves the exact numbers
of the in-framework pool — attach/step(hold)/forecast/ragged-replay/
detach/failover — WITHOUT the model zoo, and slots unchanged under
FilterBatcher/FilterServer (the full HTTP fleet stack from an artifact
directory).
"""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from cbfssm_tpu.export import ExportedFilterPool, save_exported_pool
from cbfssm_tpu.models import CBFSSMHALF
from cbfssm_tpu.serving import FilterPool
from tests.test_other_models import half_config

RECOG, DU, DY = 4, 2, 1  # half_config dims


@pytest.fixture(scope="module")
def mp():
    model = CBFSSMHALF(half_config("rnn"))
    return model, model.init(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def artifact(mp, tmp_path_factory):
    model, params = mp
    path = str(tmp_path_factory.mktemp("pool_art") / "pool")
    meta = save_exported_pool(
        path, model, params, capacity=3, horizons=(3,),
        replay_buckets=(4,), platforms=("cpu",), seed=0,
    )
    return path, meta


def _prefix(rng):
    return rng.normal(size=(RECOG, DU)), rng.normal(size=(RECOG, DY))


def test_pool_meta_format_version_gate(mp, tmp_path):
    """Pool artifacts carry the same format_version stamp/gate as
    predictors (shared _load_artifact_meta; r4 verdict weak #5)."""
    from cbfssm_tpu.export import FORMAT_VERSION

    model, params = mp
    path = str(tmp_path / "pool_v")
    meta = save_exported_pool(path, model, params, capacity=2,
                              replay_buckets=(4,), platforms=("cpu",))
    assert meta["format_version"] == FORMAT_VERSION
    meta_path = os.path.join(path, "meta.json")
    on_disk = json.load(open(meta_path))
    on_disk["format_version"] = FORMAT_VERSION + 1
    json.dump(on_disk, open(meta_path, "w"))
    with pytest.raises(RuntimeError, match="re-export"):
        ExportedFilterPool(path)


def test_exported_pool_lockstep_with_filter_pool(mp, artifact, rng):
    """Every pool operation — attach, masked step (one session holds),
    forecast, ragged fused replay, detach + slot-reusing reattach —
    produces EXACTLY the in-framework FilterPool's numbers (same seed,
    same tick folds, same programs modulo export/deserialize)."""
    model, params = mp
    path, _meta = artifact
    pool = FilterPool(model, params, capacity=3, seed=0, replay_buckets=(4,))
    epool = ExportedFilterPool(path)
    assert epool.capacity == 3 and epool.active == 0

    pa, pb = _prefix(rng), _prefix(rng)
    a1, b1 = pool.attach(*pa), pool.attach(*pb)
    a2, b2 = epool.attach(*pa), epool.attach(*pb)
    assert (a1, b1) == (a2, b2)

    def assert_equal(o1, o2):
        assert o1.keys() == o2.keys()
        for sid in o1:
            np.testing.assert_array_equal(o1[sid][0], o2[sid][0])
            np.testing.assert_array_equal(o1[sid][1], o2[sid][1])

    for t in range(3):
        steps = {a1: (rng.normal(size=(DU,)), rng.normal(size=(DY,)))}
        if t != 1:  # tick 1: session b holds (exercises the mask)
            steps[b1] = (rng.normal(size=(DU,)), rng.normal(size=(DY,)))
        assert_equal(pool.step(steps), epool.step(steps))

    uf = rng.normal(size=(3, DU))
    assert_equal(pool.forecast({a1: uf, b1: uf}),
                 epool.forecast({a1: uf, b1: uf}))

    # ragged backlogs: 4 steps for a, 2 for b, one fused dispatch
    blk_a = (rng.normal(size=(4, DU)), rng.normal(size=(4, DY)))
    blk_b = (rng.normal(size=(2, DU)), rng.normal(size=(2, DY)))
    assert_equal(pool.replay({a1: blk_a, b1: blk_b}),
                 epool.replay({a1: blk_a, b1: blk_b}))

    # detach frees the slot for reuse, states keep matching
    pool.detach(b1)
    epool.detach(b1)
    assert epool.active == 1
    pc = _prefix(rng)
    c1, c2 = pool.attach(*pc), epool.attach(*pc)
    assert c1 == c2
    s = {c1: (rng.normal(size=(DU,)), rng.normal(size=(DY,))),
         a1: (rng.normal(size=(DU,)), rng.normal(size=(DY,)))}
    assert_equal(pool.step(s), epool.step(s))


def test_exported_pool_failover_both_directions(mp, artifact, rng):
    """state/load_state round-trips between the in-framework pool and
    the artifact pool in BOTH directions — a framework primary can
    fail over to an artifact standby and back, exactly."""
    model, params = mp
    path, _ = artifact
    pool = FilterPool(model, params, capacity=3, seed=0)
    sid = pool.attach(*_prefix(rng))
    pool.step({sid: (rng.normal(size=(DU,)), rng.normal(size=(DY,)))})

    standby = ExportedFilterPool(path)
    standby.load_state(pool.state)
    step = {sid: (rng.normal(size=(DU,)), rng.normal(size=(DY,)))}
    o1, o2 = pool.step(step), standby.step(step)
    np.testing.assert_array_equal(o1[sid][0], o2[sid][0])

    # and back: artifact -> framework
    back = FilterPool(model, params, capacity=3, seed=0)
    back.load_state(standby.state)
    step = {sid: (rng.normal(size=(DU,)), rng.normal(size=(DY,)))}
    o1, o2 = standby.step(step), back.step(step)
    np.testing.assert_array_equal(o1[sid][0], o2[sid][0])
    # inherited snapshot validation (the pinned FilterPool rules)
    x, tick, slots, _next, _key = standby.state
    with pytest.raises(ValueError, match="next_sid"):
        ExportedFilterPool(path).load_state((x, tick, slots, max(slots)))

    # cross-seed failover is exact: the snapshot carries the base key,
    # so a pool built with a DIFFERENT seed resumes the primary's draw
    # stream (this is the case that silently diverged pre-key)
    other = FilterPool(model, params, capacity=3, seed=99)
    other.load_state(standby.state)
    step = {sid: (rng.normal(size=(DU,)), rng.normal(size=(DY,)))}
    o1, o2 = standby.step(step), other.step(step)
    np.testing.assert_array_equal(o1[sid][0], o2[sid][0])


def test_exported_pool_guards(mp, artifact, tmp_path, rng):
    """Fixed-at-export shapes fail loudly: unexported horizons and
    replay lengths, wrong artifact kind, bad capacity."""
    model, params = mp
    path, meta = artifact
    assert meta["kind"] == "filter_pool" and meta["capacity"] == 3
    epool = ExportedFilterPool(path)
    sid = epool.attach(*_prefix(rng))
    with pytest.raises(ValueError, match="not exported"):
        epool.forecast({sid: rng.normal(size=(5, DU))})
    # replay on an artifact exported WITHOUT buckets: the ladder is
    # empty, so the exact-length program doesn't exist — clear error
    # (a non-empty ladder always covers any backlog by chunking)
    no_replay = str(tmp_path / "nr")
    save_exported_pool(no_replay, model, params, capacity=2,
                       platforms=("cpu",))
    p2 = ExportedFilterPool(no_replay)
    s2 = p2.attach(*_prefix(rng))
    with pytest.raises(ValueError, match="replay_buckets"):
        p2.replay({s2: (rng.normal(size=(2, DU)),
                        rng.normal(size=(2, DY)))})
    # kind guard: a pool loader refuses non-pool artifacts
    from cbfssm_tpu.export import save_exported_filter

    fpath = str(tmp_path / "filt")
    save_exported_filter(fpath, model, params, batch=1, platforms=("cpu",))
    with pytest.raises(ValueError, match="filter_pool"):
        ExportedFilterPool(fpath)
    with pytest.raises(ValueError, match="capacity"):
        save_exported_pool(str(tmp_path / "bad"), model, params,
                           capacity=0, platforms=("cpu",))


def test_exported_pool_under_filter_server(mp, artifact, rng):
    """The full HTTP fleet stack from an artifact: a FilterServer over
    an ExportedFilterPool answers byte-identical JSON to one over the
    in-framework pool, and the binary /v1/state snapshot fails over
    framework-primary -> artifact-standby exactly."""
    from cbfssm_tpu.serving_http import (
        FilterServer, get_state_npz, post_state_npz,
    )
    from tests.test_serving_http import _http

    model, params = mp
    path, _ = artifact
    srv_f = FilterServer(FilterPool(model, params, capacity=3, seed=0,
                                    replay_buckets=(4,)),
                         port=0, max_wait_ms=0.0)
    srv_a = FilterServer(ExportedFilterPool(path), port=0, max_wait_ms=0.0)
    srv_f.start()
    srv_a.start()
    try:
        bf = f"http://{srv_f.host}:{srv_f.port}"
        ba = f"http://{srv_a.host}:{srv_a.port}"
        code, m = _http("GET", ba + "/v1/meta")
        assert code == 200
        assert m["model"] == "CBFSSMHALF"  # the exporting class's name
        assert m["capacity"] == 3
        pa = _prefix(rng)
        ops = [("POST", "/v1/sessions",
                {"u_prefix": pa[0].tolist(), "y_prefix": pa[1].tolist()})]
        ops.append(("POST", "/v1/sessions/0/step",
                    {"u_prev": rng.normal(size=(DU,)).tolist(),
                     "y_new": rng.normal(size=(DY,)).tolist()}))
        ops.append(("POST", "/v1/sessions/0/forecast",
                    {"u_future": rng.normal(size=(3, DU)).tolist()}))
        ops.append(("POST", "/v1/sessions/0/replay",
                    {"u": rng.normal(size=(4, DU)).tolist(),
                     "y": rng.normal(size=(4, DY)).tolist()}))
        for method, p, body in ops:
            code_f, resp_f = _http(method, bf + p, body)
            code_a, resp_a = _http(method, ba + p, body)
            assert code_f == code_a == 200
            assert resp_f == resp_a  # identical JSON numbers
        # binary failover: framework primary -> artifact standby
        blob = get_state_npz(bf)
        standby = FilterServer(ExportedFilterPool(path), port=0,
                               max_wait_ms=0.0)
        standby.start()
        try:
            sb = f"http://{standby.host}:{standby.port}"
            post_state_npz(sb, blob)
            step = {"u_prev": rng.normal(size=(DU,)).tolist(),
                    "y_new": rng.normal(size=(DY,)).tolist()}
            _, want = _http("POST", bf + "/v1/sessions/0/step", step)
            _, got = _http("POST", sb + "/v1/sessions/0/step", step)
            assert got == want  # exact resume over the wire
        finally:
            standby.close()
    finally:
        srv_f.close()
        srv_a.close()


def test_pool_standalone_load_no_model_zoo(artifact):
    """The deployment claim for the fleet path: serving a pool artifact
    must not build a model or import cbfssm_tpu.models/ops — the
    serving stack (FilterPool host logic) IS imported by design."""
    path, _ = artifact
    code = f"""
import sys
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
from cbfssm_tpu.export_pool import ExportedFilterPool
pool = ExportedFilterPool({path!r})
rng = np.random.default_rng(0)
sid = pool.attach(rng.normal(size=({RECOG}, {DU})),
                  rng.normal(size=({RECOG}, {DY})))
out = pool.step({{sid: (rng.normal(size=({DU},)),
                        rng.normal(size=({DY},)))}})
assert np.isfinite(out[sid][0]).all()
assert "cbfssm_tpu.models" not in sys.modules, "model zoo was imported"
print("POOL-STANDALONE-OK")
"""
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr
    assert "POOL-STANDALONE-OK" in proc.stdout


def test_cli_export_pool_and_serve_roundtrip(mp, tmp_path, rng):
    """`export --kind pool` then `serve <artifact> --filter` end to
    end: the fleet server comes up from the artifact alone and serves
    session lifecycle + fused replay over real HTTP."""
    from cbfssm_tpu.__main__ import main
    from tests.test_serving_http import _fabricate_half_dir, _http

    model, params = mp
    d = _fabricate_half_dir(tmp_path, (model, params))
    art = os.path.join(str(tmp_path), "pool_art")
    assert main(["export", d, "--out", art, "--kind", "pool",
                 "--capacity", "3", "--horizons", "2",
                 "--replay-buckets", "4", "--platforms", "cpu"]) == 0
    meta = json.load(open(os.path.join(art, "meta.json")))
    assert meta["kind"] == "filter_pool" and meta["capacity"] == 3

    proc = subprocess.Popen(
        [sys.executable, "-m", "cbfssm_tpu", "serve", art, "--filter",
         "--port", "0"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env={**os.environ, "PALLAS_AXON_POOL_IPS": "",
             "JAX_PLATFORMS": "cpu"},
    )
    try:
        line = proc.stdout.readline()
        assert "filter sessions" in line and "http://" in line, (
            line, proc.stderr.read())
        base = "http://" + line.split("http://")[1].strip()
        pa = _prefix(rng)
        code, resp = _http("POST", base + "/v1/sessions",
                           {"u_prefix": pa[0].tolist(),
                            "y_prefix": pa[1].tolist()})
        assert code == 200
        sid = resp["sid"]
        code, r = _http("POST", f"{base}/v1/sessions/{sid}/replay",
                        {"u": rng.normal(size=(4, DU)).tolist(),
                         "y": rng.normal(size=(4, DY)).tolist()})
        assert code == 200
        assert np.all(np.isfinite(r["mean"]))
        code, r = _http("POST", f"{base}/v1/sessions/{sid}/forecast",
                        {"u_future": rng.normal(size=(2, DU)).tolist()})
        assert code == 200
        # horizon 5 was not exported: clear 400, not a crash
        code, r = _http("POST", f"{base}/v1/sessions/{sid}/forecast",
                        {"u_future": rng.normal(size=(5, DU)).tolist()})
        assert code == 400 and "not exported" in r["error"]
    finally:
        proc.terminate()
        proc.wait(timeout=30)

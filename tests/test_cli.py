"""python -m cbfssm_tpu command-line entry point."""

import numpy as np
import pytest

from cbfssm_tpu.__main__ import build_parser, main


def test_info_runs(capsys):
    assert main(["info"]) == 0
    out = capsys.readouterr().out
    assert "CBFSSM" in out
    assert "datasets:" in out
    assert "reproduction drivers:" in out


@pytest.mark.slow
def test_reproduce_routes_kwargs(tmp_path, sysid_dir):
    """The CLI dispatches to the verbatim driver with only the kwargs
    that driver accepts (1-epoch spring run on fixtures)."""
    rc = main([
        "reproduce", "spring",
        "--root", str(tmp_path / "out"),
        "--data-dir", sysid_dir,
        "--iterations", "1",
        "--train-iterations", "1",
        "--seq-len", "20",
        "--seq-stride", "100",
    ])
    assert rc == 0
    assert (tmp_path / "out" / "summary.txt").exists()


def test_reproduce_rejects_unsupported_kwarg(tmp_path, capsys):
    """voliro's main() has no --iterations; the CLI reports it instead
    of crashing inside the driver."""
    rc = main(["reproduce", "voliro", "--iterations", "3"])
    assert rc == 2
    assert "does not accept" in capsys.readouterr().err


def test_parser_rejects_unknown_experiment():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["reproduce", "nonsense"])


@pytest.fixture
def sysid_dir(tmp_path_factory, rng):
    from cbfssm_tpu.data import DSManager

    d = str(tmp_path_factory.mktemp("data")) + "/"
    DSManager.save_ds(
        d + "spring_nonlinear.mat",
        rng.normal(size=(10000, 1)),
        rng.normal(size=(10000, 3)),
        rng.normal(size=(10000, 3)),
        "spring",
    )
    return d


def test_info_registry_lists_only_loadable_datasets(capsys):
    main(["info"])
    out = capsys.readouterr().out
    ds_line = [line for line in out.splitlines() if line.startswith("datasets:")][0]
    assert "BaseDS" not in ds_line and "DSManager" not in ds_line
    assert "Actuator" in ds_line


def test_eval_reevaluates_from_disk(tmp_path, sysid_dir, capsys):
    """`eval <dir>` rebuilds model + dataset from model_meta.json alone
    (the trainer-stamped dataset recipe) and regenerates the full
    artifact set — incl. calibration.txt — into --out."""
    import os

    root = str(tmp_path / "out")
    assert main([
        "reproduce", "spring",
        "--root", root, "--data-dir", sysid_dir,
        "--iterations", "1", "--train-iterations", "1",
        "--seq-len", "20", "--seq-stride", "100",
    ]) == 0
    evaldir = str(tmp_path / "reeval")
    rc = main(["eval", root, "--out", evaldir, "--data-dir", sysid_dir])
    out = capsys.readouterr().out
    assert rc == 0, out
    for f in ("mse.txt", "calibration.txt", "predict_test.pdf"):
        assert os.path.exists(os.path.join(evaldir, f)), f
    assert "RMSE:" in out and "NLL/point:" in out
    # the recipe round-trips: eval used the stamped class + windowing
    from cbfssm_tpu import model_store

    recipe = model_store.load_model_meta(root)["dataset"]
    assert recipe == {
        "name": "SpringNonlinear", "seq_len": 20, "seq_stride": 100,
    }


def test_eval_requires_meta(tmp_path, capsys):
    rc = main(["eval", str(tmp_path / "nothing_here")])
    assert rc == 2
    assert "error" in capsys.readouterr().err


def test_eval_outputs_class_mapping():
    """eval picks the producing driver's Outputs variant."""
    from cbfssm_tpu.__main__ import _eval_outputs_class
    from cbfssm_tpu.outputs import Outputs, OutputsRoboMove, OutputsVoliro

    assert _eval_outputs_class("Voliro", "VoliroTiltDS") is OutputsVoliro
    assert _eval_outputs_class("CBFSSM", "RoboMove") is OutputsRoboMove
    assert _eval_outputs_class("CBFSSM", "RoboMoveSimple") is OutputsRoboMove
    assert _eval_outputs_class("CBFSSM", "SpringNonlinear") is Outputs
    assert _eval_outputs_class("PRSSM", "Actuator") is Outputs


def test_serve_auth_token_resolution(monkeypatch, capsys):
    """--auth-token beats the env var; empty means open; a tokenless
    non-loopback bind warns (docs/SERVING.md deployment posture)."""
    import argparse

    from cbfssm_tpu.__main__ import _resolve_auth_token

    ns = lambda **kw: argparse.Namespace(  # noqa: E731
        auth_token=kw.get("auth_token"), host=kw.get("host", "127.0.0.1"))

    monkeypatch.delenv("CBFSSM_AUTH_TOKEN", raising=False)
    assert _resolve_auth_token(ns()) is None
    assert _resolve_auth_token(ns(auth_token="flag")) == "flag"

    monkeypatch.setenv("CBFSSM_AUTH_TOKEN", "envtok")
    assert _resolve_auth_token(ns()) == "envtok"
    assert _resolve_auth_token(ns(auth_token="flag")) == "flag"
    monkeypatch.setenv("CBFSSM_AUTH_TOKEN", "")
    assert _resolve_auth_token(ns()) is None

    capsys.readouterr()
    monkeypatch.delenv("CBFSSM_AUTH_TOKEN", raising=False)
    assert _resolve_auth_token(ns(host="0.0.0.0")) is None
    assert "non-loopback" in capsys.readouterr().err
    assert _resolve_auth_token(ns(host="0.0.0.0", auth_token="t")) == "t"
    assert "non-loopback" not in capsys.readouterr().err

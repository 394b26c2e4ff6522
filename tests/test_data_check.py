"""Raw-data validation (`reproduce --check-data`, data/check.py)."""

import pytest
import scipy.io

from cbfssm_tpu.data import DSManager
from cbfssm_tpu.data.check import check_experiment, report
from cbfssm_tpu.__main__ import main as cli_main


def test_packaged_generated_datasets_pass():
    for exp in ("spring", "robomove"):
        results = check_experiment(exp)
        assert all(r.ok for r in results), results


def test_smallscale_reports_per_file_status(tmp_path, rng, capsys):
    d = str(tmp_path) + "/"
    scipy.io.savemat(
        d + "actuator.mat",
        {"u": rng.normal(size=(1024, 1)), "p": rng.normal(size=(1024, 1))},
    )
    results = check_experiment("smallscale", d)
    by_file = {r.file: r for r in results}
    assert by_file["actuator.mat"].ok
    assert "experiments" in by_file["actuator.mat"].detail
    for missing in ("ballbeam.dat", "drive.mat", "gas_furnace.csv", "dryer.dat"):
        assert not by_file[missing].ok
        assert by_file[missing].detail == "missing"
    assert report(results) is False
    out = capsys.readouterr().out
    assert "OK " in out and "FAIL" in out


def test_sarcos_fixture_passes(tmp_path, rng):
    d = str(tmp_path) + "/"
    scipy.io.savemat(
        d + "sarcos_inv.mat", {"sarcos_inv": rng.normal(size=(674 * 66, 28))}
    )
    (result,) = check_experiment("sarcos", d)
    assert result.ok, result


def test_corrupt_file_fails_with_reason(tmp_path, rng):
    d = str(tmp_path) + "/"
    # wrong dims: spring expects u/y one-dimensional
    DSManager.save_ds(
        d + "spring_nonlinear.mat",
        rng.normal(size=(6000, 2)),
        rng.normal(size=(6000, 3)),
        rng.normal(size=(6000, 1)),
        "bad",
    )
    (result,) = check_experiment("spring", d)
    assert not result.ok and "dims" in result.detail
    # too short
    DSManager.save_ds(
        d + "spring_nonlinear.mat",
        rng.normal(size=(100, 1)),
        rng.normal(size=(100, 3)),
        rng.normal(size=(100, 1)),
        "short",
    )
    (result,) = check_experiment("spring", d)
    assert not result.ok and "samples" in result.detail


def test_voliro_log_checks(tmp_path):
    from tests.test_voliro_dataset import make_log

    d = str(tmp_path) + "/"
    make_log(d + "voliro_tilt.mat", n=4000, seed=1)
    results = check_experiment("voliro", d)
    by_file = {r.file: r for r in results}
    assert by_file["voliro_tilt.mat"].ok
    assert by_file["voliro_flip.mat"].detail == "missing"
    # a log shorter than the reference crop range must fail loudly
    make_log(d + "voliro_flip.mat", n=5000, seed=2)
    results = check_experiment("voliro", d)
    by_file = {r.file: r for r in results}
    assert not by_file["voliro_flip.mat"].ok
    assert "crop range" in by_file["voliro_flip.mat"].detail


def test_unknown_experiment_rejected():
    with pytest.raises(ValueError, match="unknown experiment"):
        check_experiment("nope")


def test_cli_check_data_exit_codes(tmp_path, rng, capsys):
    # packaged spring data is present -> exit 0
    assert cli_main(["reproduce", "spring", "--check-data"]) == 0
    assert "ready to train" in capsys.readouterr().out
    # empty data dir -> exit 1, nothing trained
    assert cli_main([
        "reproduce", "sarcos", "--check-data", "--data-dir", str(tmp_path)
    ]) == 1
    out = capsys.readouterr().out
    assert "FAIL" in out and "missing" in out

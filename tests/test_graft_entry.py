"""The driver entry points (__graft_entry__) must work in ANY ambient
environment — in particular `dryrun_multichip` must bootstrap its own
virtual CPU mesh when the process is pinned to a single-chip accelerator
platform (the round-1 failure mode)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge  # noqa: E402


class TestCpuMeshAvailable:
    def test_inline_when_jax_has_enough_cpu_devices(self):
        # The test process runs with JAX_PLATFORMS=cpu and 8 virtual
        # devices (conftest.py), so the inline path must be chosen.
        assert ge._cpu_mesh_available(8)

    def test_reexec_when_too_few_devices(self):
        assert not ge._cpu_mesh_available(9)

    def test_env_only_detection(self, monkeypatch):
        # Simulate a fresh process (no live backend) with various envs.
        monkeypatch.setattr(ge, "_backend_initialized", lambda: False)
        monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
        monkeypatch.setenv("JAX_PLATFORMS", "axon")
        monkeypatch.setenv("XLA_FLAGS", "")
        assert not ge._cpu_mesh_available(8)
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        assert not ge._cpu_mesh_available(8)  # no device-count flag
        monkeypatch.setenv(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
        assert ge._cpu_mesh_available(8)
        assert not ge._cpu_mesh_available(16)

    def test_half_recipe_env_rejected(self, monkeypatch):
        # The round-1/round-2 driver failure: JAX_PLATFORMS=cpu + the
        # device-count flag exported, but the accelerator-hook env var
        # (PALLAS_AXON_POOL_IPS) still set — the inline path must NOT be
        # taken (the hook would intercept forced-cpu work).
        monkeypatch.setattr(ge, "_backend_initialized", lambda: False)
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        monkeypatch.setenv(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
        assert not ge._cpu_mesh_available(8)
        # Empty string counts as unset (the canonical disable value).
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "")
        assert ge._cpu_mesh_available(8)

    def test_single_device_needs_no_flag(self, monkeypatch):
        monkeypatch.setattr(ge, "_backend_initialized", lambda: False)
        monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        monkeypatch.setenv("XLA_FLAGS", "")
        assert ge._cpu_mesh_available(1)


class TestVerifiedBackendFallback:
    def test_verify_cpu_backend_green_in_test_env(self):
        ok, why = ge._verify_cpu_backend(8)
        assert ok, why
        ok, why = ge._verify_cpu_backend(9)
        assert not ok and "devices" in why

    def test_probe_failure_falls_back_to_reexec(self, monkeypatch, capsys):
        calls = []
        monkeypatch.setattr(ge, "_cpu_mesh_available", lambda n: True)
        monkeypatch.setattr(
            ge, "_verify_cpu_backend", lambda n: (False, "probe computed nan")
        )
        monkeypatch.setattr(ge, "_reexec_dryrun", lambda n: calls.append(n))
        monkeypatch.delenv("_CBFSSM_DRYRUN_REEXEC", raising=False)
        ge.dryrun_multichip(4)
        assert calls == [4]
        out = capsys.readouterr().out
        assert "bootstrap=inline" in out
        assert "falling back to reexec" in out

    def test_reexec_loop_guard(self, monkeypatch):
        # Inside the canonical subprocess (_CBFSSM_DRYRUN_REEXEC set) a
        # bad backend must raise, never re-exec again.
        monkeypatch.setattr(ge, "_cpu_mesh_available", lambda n: True)
        monkeypatch.setattr(
            ge, "_verify_cpu_backend", lambda n: (False, "still tunneled")
        )
        monkeypatch.setenv("_CBFSSM_DRYRUN_REEXEC", "1")
        with pytest.raises(RuntimeError, match="not re-execing again"):
            ge.dryrun_multichip(4)


def test_dryrun_inline(capsys):
    # In the test env the inline path runs the real sharded step.
    ge.dryrun_multichip(2)
    out = capsys.readouterr().out
    assert "bootstrap=inline" in out
    assert "mesh up: 2 cpu devices verified" in out
    assert "one sharded train step OK" in out
    assert "2-D (data x particle) mesh" in out
    assert "mesh FilterPool serving OK" in out


@pytest.mark.slow
def test_dryrun_reexec_subprocess():
    # Exercise the subprocess bootstrap itself (the driver-gate path):
    # even from a process whose backend is already initialized, the
    # re-exec must produce a green run.
    ge._reexec_dryrun(2)

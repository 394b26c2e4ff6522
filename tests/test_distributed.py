"""Multi-host wiring (parallel.distributed) + multi-axis mesh training.

True multi-process execution needs multiple hosts; what CI can and does
prove: the coordination bring-up works (real jax.distributed service in
a subprocess), the global-array assembly path produces correctly
sharded arrays, and the Trainer trains end-to-end on a 2-D
(data x particle) mesh of 8 virtual devices.
"""

import subprocess
import sys

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from cbfssm_tpu.models import CBFSSM
from cbfssm_tpu.parallel import DataParallel, ParticleParallel, distributed

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def mesh_2d(data=2, particle=4):
    devices = np.asarray(jax.devices()[: data * particle]).reshape(data, particle)
    return Mesh(devices, ("data", "particle"))


# --- DataParallel on multi-axis meshes -------------------------------------


def test_data_parallel_multi_axis_mesh():
    dp = DataParallel(mesh_2d())
    assert dp.n == 2  # size of the data axis, not devices.size == 8
    assert dp.round_up_batch(5) == 6
    sh = dp.batch_sharding(3)
    assert sh.spec[0] == "data"


def test_data_parallel_particle_only_mesh():
    from cbfssm_tpu.parallel import make_mesh

    dp = DataParallel(make_mesh(4, axis_name="particle"))
    assert dp.n == 1  # no data axis: batches replicated
    assert dp.round_up_batch(5) == 5
    assert dp.batch_sharding(3).spec == ()


# --- process_mesh / host_local_batch ----------------------------------------


def test_process_mesh_shapes():
    mesh = distributed.process_mesh((2, 4), ("data", "particle"))
    assert mesh.shape == {"data": 2, "particle": 4}
    with pytest.raises(ValueError, match="devices"):
        distributed.process_mesh((3, 4), ("data", "particle"))
    with pytest.raises(ValueError, match="equal length"):
        distributed.process_mesh((2, 4), ("data",))


def test_host_local_batch_single_process(rng):
    mesh = distributed.process_mesh((8,), ("data",))
    x = rng.normal(size=(16, 5, 3))
    rows = distributed.process_rows(mesh, 16)
    # single process owns everything, ordered by global offset
    np.testing.assert_array_equal(np.sort(rows), np.arange(16))
    arr = distributed.host_local_batch(mesh, x[rows], global_batch=16)
    assert arr.shape == (16, 5, 3)
    # the global array must equal the ORIGINAL global-order data —
    # this is the row-placement contract (each global index i holds
    # dataset row i, whatever the device order)
    np.testing.assert_allclose(np.asarray(arr), x)
    assert len(arr.sharding.device_set) == 8
    shard = next(iter(arr.addressable_shards))
    assert shard.data.shape == (2, 5, 3)


def test_host_local_batch_2d_mesh_placement(rng):
    """Row placement stays exact on a 2-D mesh where the batch axis is
    one of two axes (devices reshaped, so axis order is non-trivial)."""
    mesh = mesh_2d(data=4, particle=2)
    x = rng.normal(size=(8, 3))
    rows = distributed.process_rows(mesh, 8, axis_name="data")
    arr = distributed.host_local_batch(mesh, x[rows], axis_name="data", global_batch=8)
    np.testing.assert_allclose(np.asarray(arr), x)


def test_host_local_batch_row_count_mismatch(rng):
    mesh = distributed.process_mesh((8,), ("data",))
    with pytest.raises(ValueError, match="process_rows"):
        distributed.host_local_batch(mesh, rng.normal(size=(12, 3)), global_batch=16)


def test_initialize_single_process_noop():
    distributed.initialize(num_processes=1)  # must not touch the backend
    assert jax.device_count() >= 8


def test_initialize_argless_after_noop_warns():
    """An argument-less call after a latched single-process no-op is
    suppressed, but loudly: a library that defensively called the
    1-process form must not silently block a TPU auto-detect bring-up."""
    distributed.initialize(num_processes=1)
    with pytest.warns(RuntimeWarning, match="argument-less call suppressed"):
        distributed.initialize()


@pytest.mark.slow
def test_initialize_real_coordination_service():
    """Bring up an actual jax.distributed coordination service
    (1-process cluster) in a subprocess — the code path a pod launch
    exercises on every host."""
    code = (
        "import os; os.environ['JAX_PLATFORMS']='cpu'; "
        "os.environ['PALLAS_AXON_POOL_IPS']=''; "
        "from cbfssm_tpu.parallel import distributed; "
        "distributed.initialize(coordinator_address='localhost:12355', "
        "num_processes=1, process_id=0); "
        "import jax; "
        "assert jax.process_count() == 1, jax.process_count(); "
        "distributed.initialize(); "  # idempotent second call
        "print('coordination OK')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=120
    )
    assert out.returncode == 0, out.stderr
    assert "coordination OK" in out.stdout


# --- end-to-end: Trainer on the 2-D (data x particle) mesh ------------------


def test_trainer_on_2d_mesh(tmp_path):
    """Full Trainer.train on a ('data', 'particle') 2x4 mesh: batch axis
    sharded over 'data' by the Trainer's sharding constraint, particles
    sharded over 'particle' by ParticleParallel's shard_map."""
    from cbfssm_tpu.training import Trainer
    from tests.test_trainer import SmokeDS, smoke_config

    cfg = smoke_config()
    cfg["samples"] = 4
    mesh = mesh_2d(data=2, particle=4)
    pp = ParticleParallel(CBFSSM, cfg, mesh, data_axis="data")
    ds = SmokeDS()
    trainer = Trainer(pp, str(tmp_path / "m2d"), mesh=mesh)
    trainer.train(ds, epochs=2)
    assert all(np.isfinite(trainer.train_all))
    assert trainer.train_all[-1] < trainer.train_all[0]

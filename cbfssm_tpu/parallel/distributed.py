"""Multi-host (multi-process) wiring.

The reference is strictly single-process (SURVEY §5): this module is the
TPU-native scale-out path it never had. On a TPU pod slice every host
runs the same program; ``initialize()`` brings up JAX's coordination
service (on TPU all arguments auto-detect from the metadata server),
``process_mesh()`` builds one global mesh over every chip of every
host, and ``host_local_batch()`` assembles a globally-sharded batch
from each host's local slice of the data pipeline.

Launch recipe: docs/SCALING.md §"Multi-host launch".
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> None:
    """Idempotent ``jax.distributed.initialize``.

    On Cloud TPU every argument is auto-detected (pass nothing). For
    CPU/GPU test rigs pass all three explicitly. Must be called before
    any other JAX API touches the backend; calling it again (or in a
    single-process run that never needs it) is a no-op.
    """
    global _initialized
    if _initialized:
        return
    if num_processes == 1 and coordinator_address is None:
        # Nothing to coordinate; keep single-process runs dependency-free.
        _initialized = True
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True


def process_mesh(axis_sizes: tuple[int, ...], axis_names: tuple[str, ...]) -> Mesh:
    """Global mesh over ALL devices of ALL processes.

    ``axis_sizes`` must multiply to ``jax.device_count()`` (the global
    count). Device order comes from ``mesh_utils.create_device_mesh``,
    which places mesh neighbors on ICI neighbors on TPU.
    """
    if len(axis_sizes) != len(axis_names):
        raise ValueError("axis_sizes and axis_names must have equal length")
    total = int(np.prod(axis_sizes))
    if total != jax.device_count():
        raise ValueError(
            f"mesh of {axis_sizes} needs {total} devices, have "
            f"{jax.device_count()} (global)"
        )
    from jax.experimental import mesh_utils

    devices = mesh_utils.create_device_mesh(axis_sizes)
    return Mesh(devices, axis_names)


def host_local_batch(mesh: Mesh, array: np.ndarray, axis_name: str = "data"):
    """Assemble a global, batch-sharded ``jax.Array`` from this
    process's local slice of the batch.

    Every process passes its own ``[local_B, ...]`` rows (the host data
    pipeline shards the window batch across processes); the result
    behaves as one ``[global_B, ...]`` array sharded along ``axis_name``
    — exactly what the jitted training step consumes. Single-process
    meshes reduce to a plain ``device_put`` with the same sharding.
    """
    spec = P(axis_name, *([None] * (np.ndim(array) - 1)))
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(np.asarray(array), sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(array))


def process_batch_slice(global_batch: int, axis_size: int | None = None) -> slice:
    """The rows of a ``[global_batch, ...]`` dataset this process should
    load. Processes own contiguous equal slices; ``global_batch`` must
    divide evenly (pad upstream with zero-weight rows otherwise)."""
    n_proc = jax.process_count()
    if global_batch % n_proc != 0:
        raise ValueError(
            f"global batch {global_batch} must divide across {n_proc} processes"
        )
    per = global_batch // n_proc
    start = jax.process_index() * per
    return slice(start, start + per)

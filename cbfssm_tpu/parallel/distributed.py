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
_noop_latched = False  # a single-process call already no-op'd


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

    Caveat: after a defensive ``initialize(num_processes=1)`` call, a
    later argument-less call is treated as the same single-process
    request and suppressed (with a warning) — a genuine TPU auto-detect
    bring-up in that situation must pass its arguments explicitly (or
    simply not make the single-process call first).
    """
    global _initialized, _noop_latched
    if _initialized:
        return
    if num_processes == 1 and coordinator_address is None:
        # Nothing to coordinate; keep single-process runs dependency-free.
        # Does NOT latch _initialized — a later EXPLICIT multi-process
        # bring-up in the same process must still run — but a later
        # argument-less re-call stays a no-op (documented idempotency).
        _noop_latched = True
        return
    explicit = any(
        a is not None
        for a in (coordinator_address, num_processes, process_id, local_device_ids)
    )
    if _noop_latched and not explicit:
        import warnings

        warnings.warn(
            "distributed.initialize(): argument-less call suppressed because "
            "an earlier initialize(num_processes=1) already no-op'd in this "
            "process; for a multi-host TPU auto-detect bring-up, pass "
            "arguments explicitly or drop the single-process call",
            RuntimeWarning,
            stacklevel=2,
        )
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


def _addressable_batch_shards(mesh: Mesh, global_shape, axis_name: str):
    """This process's (device, global-first-dim-slice) pairs under the
    batch sharding, ordered by global offset. Derived from the actual
    sharding index map, so it is correct for ANY device order
    ``mesh_utils.create_device_mesh`` picks (hosts may be interleaved
    along the axis on ICI-optimized meshes)."""
    spec = P(axis_name, *([None] * (len(global_shape) - 1)))
    sharding = NamedSharding(mesh, spec)
    imap = sharding.addressable_devices_indices_map(tuple(global_shape))
    pairs = [(dev, idx[0]) for dev, idx in imap.items()]
    pairs.sort(key=lambda kv: kv[1].start or 0)
    return sharding, pairs


def process_rows(mesh: Mesh, global_batch: int, axis_name: str = "data") -> np.ndarray:
    """The global row indices of a ``[global_batch, ...]`` dataset this
    process must load, in the exact order :func:`host_local_batch`
    consumes them. NOT necessarily one contiguous slice — ownership
    follows the mesh's device placement."""
    _, pairs = _addressable_batch_shards(mesh, (global_batch,), axis_name)
    rows = [
        np.arange(
            s.start or 0, global_batch if s.stop is None else s.stop, dtype=np.int64
        )
        for _, s in pairs
    ]
    return np.concatenate(rows)


def host_local_batch(
    mesh: Mesh, array: np.ndarray, axis_name: str = "data",
    global_batch: int | None = None,
):
    """Assemble a global, batch-sharded ``jax.Array`` from this
    process's local rows.

    ``array`` holds the rows returned by
    ``process_rows(mesh, global_batch)`` IN THAT ORDER; the pairing is
    exact by construction because both functions walk the same sharding
    index map. The result behaves as one ``[global_batch, ...]`` array
    sharded along ``axis_name`` — exactly what the jitted training step
    consumes. Works unchanged on single-process meshes.
    """
    array = np.asarray(array)
    if global_batch is None:  # even split across processes
        global_batch = array.shape[0] * jax.process_count()
    shape = (global_batch,) + array.shape[1:]
    sharding, pairs = _addressable_batch_shards(mesh, shape, axis_name)
    lengths = [
        (global_batch if s.stop is None else s.stop) - (s.start or 0)
        for _, s in pairs
    ]
    if sum(lengths) != array.shape[0]:
        raise ValueError(
            f"local array has {array.shape[0]} rows but this process owns "
            f"{sum(lengths)} of the global batch {global_batch} — load "
            "exactly process_rows(mesh, global_batch)"
        )
    shards = []
    offset = 0
    for (dev, _), n in zip(pairs, lengths):
        shards.append(jax.device_put(array[offset : offset + n], dev))
        offset += n
    return jax.make_array_from_single_device_arrays(shape, sharding, shards)

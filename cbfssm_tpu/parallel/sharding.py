"""Device-mesh data parallelism.

The reference is a single-process CPU program whose only performance
knobs are TF thread-pool sizes (cbfssm/training/trainer.py:24-26). The
TPU-native equivalent is SPMD over a 1-D ``jax.sharding.Mesh``: the
window-batch axis of every sequence batch is sharded across the ``data``
axis, parameters are replicated, and XLA inserts the gradient ``psum``
over ICI automatically when the jitted train step consumes sharded
batches and produces replicated parameter updates.

The models' particle/time math is untouched: batch-axis sharding
composes with the [B*S, M] GP matmuls because reshapes that keep the
leading (sharded) axis intact preserve the sharding.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` available devices."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            # slicing would silently build a SMALLER mesh — a quiet
            # configuration change (different shard counts) instead of
            # the loud failure a mis-sized request deserves
            raise ValueError(
                f"make_mesh({n_devices}) but only {len(devices)} "
                "device(s) available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def pad_batch(arrays, batch_size: int):
    """Pad leading axes to ``batch_size`` with zeros; returns
    (padded_arrays, weights) where weights masks real rows. Fixed output
    shapes keep a single compiled step (TF's dynamic last batch becomes
    pad + mask; the loss weighting matches the reference because batch
    losses are sums, never means, cbfssm.py:251)."""
    n = arrays[0].shape[0]
    pad = batch_size - n
    if pad < 0:
        raise ValueError("batch larger than batch_size")
    padded = []
    for a in arrays:
        if pad:
            widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            a = np.pad(np.asarray(a), widths)
        padded.append(a)
    weights = np.concatenate([np.ones(n), np.zeros(pad)]).astype(padded[0].dtype)
    return padded, weights


class DataParallel:
    """Sharding helper bound to a mesh: batch arrays are sharded along
    ``data``; parameters / optimizer state are replicated."""

    def __init__(self, mesh: Mesh | None, axis_name: str = "data"):
        self.mesh = mesh
        self.axis_name = axis_name

    @property
    def n(self) -> int:
        """Size of the data axis (1 when the mesh lacks one — e.g. a
        pure-particle mesh where batches stay replicated)."""
        if self.mesh is None or self.axis_name not in self.mesh.axis_names:
            return 1
        return self.mesh.shape[self.axis_name]

    def batch_sharding(self, ndim: int):
        if self.mesh is None:
            return None
        if self.axis_name not in self.mesh.axis_names:
            return NamedSharding(self.mesh, P())
        return NamedSharding(self.mesh, P(self.axis_name, *([None] * (ndim - 1))))

    def replicated(self):
        if self.mesh is None:
            return None
        return NamedSharding(self.mesh, P())

    def device_put_batch(self, *arrays):
        """Place [B, ...] arrays with the batch axis sharded over the mesh."""
        if self.mesh is None:
            return tuple(jax.device_put(a) for a in arrays)
        return tuple(
            jax.device_put(a, self.batch_sharding(np.ndim(a))) for a in arrays
        )

    def device_put_replicated(self, tree):
        if self.mesh is None:
            return tree
        sharding = self.replicated()
        return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)

    def round_up_batch(self, batch_size: int) -> int:
        """Batch size padded up to a multiple of the mesh size so every
        device gets equal shards."""
        n = self.n
        return ((batch_size + n - 1) // n) * n

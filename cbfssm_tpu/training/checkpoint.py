"""Checkpoint save/restore (orbax).

Capability parity with the reference's tf.train.Saver usage: best-by-
train-loss -> ``best.ckpt``, final -> ``model.ckpt``
(cbfssm/training/trainer.py:58-63); evaluation restores best
(outputs.py:40-41); curriculum retraining restores last
(trainer.py:30-31). Orbax additionally gives atomic writes and
resume-on-preemption for free.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp

BEST = "best.ckpt"
LAST = "model.ckpt"


def _to_numpy(tree):
    # jax.device_get starts every leaf's device->host copy before
    # blocking on any of them; a per-leaf np.asarray tree_map would pay
    # one synchronous roundtrip per leaf (~35 ms each on a tunneled
    # chip — ~2 s per save for an Adam-state tree of ~60 leaves).
    return jax.tree_util.tree_map(np.asarray, jax.device_get(tree))


def save(path: str, tree) -> None:
    """Save a pytree (params / optimizer state / metadata) to ``path``."""
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, _to_numpy(tree), force=True)


def restore(path: str, template):
    """Restore a pytree saved by :func:`save`; ``template`` provides the
    structure (a freshly initialized tree of the same shape)."""
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, ocp.args.PyTreeRestore(item=_to_numpy(template)))
    return jax.tree_util.tree_map(
        lambda t, r: jax.numpy.asarray(r, dtype=t.dtype), template, restored
    )


def exists(path: str) -> bool:
    return os.path.isdir(os.path.abspath(path))

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
import queue
import threading

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


def _write(path: str, host_tree) -> None:
    """Serialize an already-host-resident tree to disk (atomic)."""
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, host_tree, force=True)


def save(path: str, tree) -> None:
    """Save a pytree (params / optimizer state / metadata) to ``path``."""
    _write(os.path.abspath(path), _to_numpy(tree))


class AsyncSaver:
    """Background checkpoint writer for training loops.

    The orbax serialization + atomic disk write dominates a save
    (~120 ms on this rig vs <1 ms for the pipelined device->host
    transfer) and is pure host-side work — with best-checkpoint saves
    landing nearly every epoch/block while training improves, it sits
    squarely on the training loop's critical path. ``save()`` therefore
    materializes the tree on the host on the CALLER thread (so buffers
    that the next jitted update donates are never read after donation)
    and hands only the disk write to a single worker thread.

    Same-path saves COALESCE latest-wins: the worker writes the newest
    tree submitted for a path, so when disk writes are slower than the
    save cadence (improving-every-block runs) the backlog holds at most
    ONE pending host copy per path instead of growing without bound —
    and the directory contents after ``flush()`` are still identical to
    synchronous saves (intermediate writes were overwritten anyway).
    ``flush()`` blocks until everything submitted is on disk and
    re-raises the first worker error; the trainers flush before
    ``train()`` returns. A crash between submission and write costs at
    most the newest checkpoint — the previous one stays intact (orbax
    writes are atomic), the same exposure a crash just before a
    synchronous save has.
    """

    def __init__(self):
        self._queue: queue.Queue = queue.Queue()
        self._latest: dict = {}  # path -> newest pending host tree
        self._errors: list = []  # (path, exc) — scoped by flush(prefix)
        self._lock = threading.Lock()
        self._thread = None

    def _ensure_worker(self):
        # under the lock: concurrent save() calls (the shared saver
        # serves every trainer in the process) must never start TWO
        # workers — the latest-wins coalescing relies on one writer
        with self._lock:
            if self._thread is None or not self._thread.is_alive():
                self._thread = threading.Thread(
                    target=self._work, name="cbfssm-ckpt-writer", daemon=True
                )
                self._thread.start()

    def _work(self):
        while True:
            path = self._queue.get()
            try:
                with self._lock:
                    # None when a newer save for this path was already
                    # written by the ticket that superseded this one
                    host_tree = self._latest.pop(path, None)
                if host_tree is not None:
                    _write(path, host_tree)
            except BaseException as exc:  # surfaced by flush()
                with self._lock:
                    self._errors.append((path, exc))
            finally:
                self._queue.task_done()

    def save(self, path: str, tree) -> None:
        """Snapshot ``tree`` to host now; write it to ``path`` in the
        background. Call :meth:`flush` before reading the checkpoint
        back or ending the run."""
        # device_get gives device leaves a fresh host buffer but passes
        # host-numpy leaves through BY REFERENCE — those must be copied
        # here or a later in-place mutation races the background write.
        host = jax.device_get(tree)
        host = jax.tree_util.tree_map(
            lambda orig, h: np.array(h) if h is orig else np.asarray(h),
            tree, host,
        )
        path = os.path.abspath(path)
        with self._lock:
            self._latest[path] = host
        self._ensure_worker()
        self._queue.put(path)

    def flush(self, prefix: str | None = None) -> None:
        """Block until every submitted save is durable; re-raise the
        first background write error whose path starts with ``prefix``
        (all errors when ``prefix`` is None). With the process-wide
        shared saver, scoping by the caller's model_dir keeps one
        trainer's write failure from surfacing in — and being cleared
        by — an unrelated trainer's flush."""
        self._queue.join()
        with self._lock:
            if prefix is None:
                mine, self._errors = self._errors, []
            else:
                # path-component scoping: 'out/m1' must not steal (and
                # clear) errors belonging to a sibling 'out/m10'
                root = os.path.abspath(prefix)

                def owns(path):
                    return path == root or path.startswith(root + os.sep)

                mine = [e for e in self._errors if owns(e[0])]
                self._errors = [e for e in self._errors if not owns(e[0])]
        if mine:
            raise mine[0][1]


_shared = None
_shared_lock = threading.Lock()


def shared_saver() -> AsyncSaver:
    """The process-wide saver the trainers use. One background writer
    thread serves every Trainer/MultiSeedTrainer in the process (a
    per-instance saver would leak one idle daemon thread per trainer —
    sweep scripts and the test suite construct dozens). flush() on the
    shared instance simply waits for all pending writes, whichever
    trainer submitted them."""
    global _shared
    with _shared_lock:
        if _shared is None:
            _shared = AsyncSaver()
        return _shared


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

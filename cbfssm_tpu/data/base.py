"""Dataset base class: normalization + sliding-window batching.

Capability parity with reference cbfssm/datasets/base_ds.py:5-86,
including the tail-window rule of ``rnn_batches`` (base_ds.py:69-73): if
``(num_points - length) % stride != 0`` the final ``length`` points are
appended as an extra window so the sequence tail is always covered.

The windowing here is vectorized (stride-tricks view + one gather)
instead of the reference's per-window Python list — the host pipeline
must keep a TPU fed.
"""

from __future__ import annotations

import os

import numpy as np


class BaseDS:
    """Holds raw [experiments, time, dim] arrays, z-score normalization
    stats, and windowed [windows, seq_len, dim] batch arrays."""

    dim_u: int | None = None
    dim_y: int | None = None

    def __init__(self, seq_len: int, seq_stride: int):
        self.seq_len = seq_len
        self.seq_stride = seq_stride
        self.train_in = np.empty(0)
        self.train_out = np.empty(0)
        self.test_in = np.empty(0)
        self.test_out = np.empty(0)
        self.train_in_batch = np.empty(0)
        self.train_out_batch = np.empty(0)
        self.test_in_batch = np.empty(0)
        self.test_out_batch = np.empty(0)
        self.mean = {"in": np.empty(()), "out": np.empty(())}
        self.std = {"in": np.empty(()), "out": np.empty(())}
        self.data_path = os.path.join(os.path.dirname(__file__), "data") + os.sep

    # --- normalization -------------------------------------------------

    def normalize_init(self, data_in: np.ndarray, data_out: np.ndarray) -> None:
        """Compute z-score stats from 2-D [samples, dim] arrays."""
        assert data_in.ndim == 2 and data_out.ndim == 2
        self.mean["in"] = np.mean(data_in, axis=0)
        self.std["in"] = np.std(data_in - self.mean["in"], axis=0)
        self.mean["out"] = np.mean(data_out, axis=0)
        self.std["out"] = np.std(data_out - self.mean["out"], axis=0)

    def normalize(self, data, key: str):
        return (data - self.mean[key]) / self.std[key]

    def denormalize(self, data, key: str, shift: bool = True):
        res = data * self.std[key]
        return res + self.mean[key] if shift else res

    # --- windowing -----------------------------------------------------

    @staticmethod
    def rnn_batches(x: np.ndarray, length: int, stride: int) -> np.ndarray:
        """Slide a window of ``length`` every ``stride`` steps over each
        experiment of ``x`` [experiments, time, dim]; append the tail
        window when the remainder is nonzero; concatenate experiments."""
        assert x.ndim == 3, "data must be shaped as [experiments x time x dimension]"
        num_points = x.shape[1]
        assert num_points >= length, "Sequence length must be shorter than data."

        starts = np.arange(0, num_points - length + 1, stride)
        if (num_points - length) % stride > 0:
            starts = np.append(starts, num_points - length)
        if x.dtype == np.float64:
            # native multi-threaded gather (numpy-fallback inside)
            from cbfssm_tpu import native

            return native.window_gather(np.ascontiguousarray(x), starts, length)
        # [experiments, windows, length, dim] via one fancy-index gather.
        idx = starts[:, None] + np.arange(length)[None, :]
        windows = x[:, idx, :]
        return windows.reshape(-1, length, x.shape[2])

    def get_batches(self, seq_len: int, seq_stride: int):
        return (
            self.rnn_batches(self.train_in, seq_len, seq_stride),
            self.rnn_batches(self.train_out, seq_len, seq_stride),
            self.rnn_batches(self.test_in, seq_len, seq_stride),
            self.rnn_batches(self.test_out, seq_len, seq_stride),
        )

    def create_batches(self) -> None:
        (
            self.train_in_batch,
            self.train_out_batch,
            self.test_in_batch,
            self.test_out_batch,
        ) = self.get_batches(self.seq_len, self.seq_stride)
        self.print_stats()

    def print_stats(self) -> None:
        print("Dataset Stats:")
        print("  sequence length: %d" % self.seq_len)
        print("  train samples: %d" % (self.train_in.shape[0] * self.train_in.shape[1]))
        print("  train sequences: %d" % self.train_in_batch.shape[0])
        print("  test samples: %d" % (self.test_in.shape[0] * self.test_in.shape[1]))
        print("  test sequences: %d" % self.test_in_batch.shape[0])

"""Initial-state recognition networks.

Capability parity with the reference's three recognition choices
('output' / 'conv' / 'rnn', cbfssm/model/prssm.py:132-172 and
cbfssmhalf.py:64-95): map the first ``recog_len`` steps of the
(control, observation) sequence to an initial latent state x_0.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class GRURecognition(nn.Module):
    """GRU(16) consumed over the *reversed* recognition prefix, followed
    by a linear readout to dim_x (reference prssm.py:159-169)."""

    dim_x: int
    hidden: int = 16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, uy):  # [B, T_recog, d]
        rev = jnp.flip(uy, axis=1)
        cell = nn.GRUCell(features=self.hidden, param_dtype=self.param_dtype)
        outputs = nn.RNN(cell)(rev)  # [B, T_recog, hidden]
        final = outputs[:, -1, :]
        return nn.Dense(self.dim_x, param_dtype=self.param_dtype)(final)


class ConvRecognition(nn.Module):
    """Conv1D(5 filters, width 3, VALID) + ReLU + max-pool(2,2) + flatten
    + Dense. Faithful to the reference's hardcoded 35-unit flatten
    (prssm.py:151-153), which requires recog_len == 16."""

    dim_x: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, uy):  # [B, T_recog, d]
        if uy.shape[1] != 16:
            raise ValueError(
                "ConvRecognition requires recog_len == 16 (flatten is sized "
                "for 7 pooled steps x 5 filters = 35 units)"
            )
        h = nn.Conv(
            features=5, kernel_size=(3,), padding="VALID", param_dtype=self.param_dtype
        )(uy)
        h = nn.relu(h)
        h = nn.max_pool(h, window_shape=(2,), strides=(2,))
        h = h.reshape((h.shape[0], 35))
        return nn.Dense(self.dim_x, param_dtype=self.param_dtype)(h)


def output_recognition(y, dim_x):
    """x_0 = first observation zero-padded to dim_x (reference
    prssm.py:140-144). y: [B, T, dy] -> [B, dim_x]."""
    b, _, dy = y.shape
    pad = jnp.zeros((b, dim_x - dy), dtype=y.dtype)
    return jnp.concatenate((y[:, 0, :], pad), axis=1)


def make_recognition(kind: str, dim_x: int, param_dtype):
    """Returns the recognition flax module, or None for the
    parameter-free 'output' kind (callers use :func:`output_recognition`
    directly in that case)."""
    if kind == "output":
        return None
    if kind == "rnn":
        return GRURecognition(dim_x=dim_x, param_dtype=param_dtype)
    if kind == "conv":
        return ConvRecognition(dim_x=dim_x, param_dtype=param_dtype)
    raise ValueError(f"invalid recognition model: {kind!r}")

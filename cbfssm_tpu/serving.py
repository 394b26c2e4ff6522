"""Ahead-of-time-compiled predictors for deployment.

The training stack compiles lazily under jit; for serving, a fixed
sequence shape can be lowered and compiled ONCE up front so the first
request pays no compile latency, and the compiled executable can be
reused across requests (the persistent XLA cache additionally warms
process restarts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class CompiledPredictor:
    """AOT-compiled free-running prediction for one (batch, seq_len)
    shape.

    >>> pred = CompiledPredictor(model, params, batch=1, seq_len=300)
    >>> out = pred(u, y)   # no compile on first call
    """

    def __init__(self, model, params, batch: int, seq_len: int,
                 condition: bool = False, seed: int = 0):
        self.model = model
        self.params = params
        self.batch = batch
        self.seq_len = seq_len
        self.key = jax.random.PRNGKey(seed)
        dtype = model.dtype
        u_spec = jax.ShapeDtypeStruct((batch, seq_len, model.dim_u), dtype)
        y_spec = jax.ShapeDtypeStruct((batch, seq_len, model.dim_y), dtype)
        key_spec = jax.ShapeDtypeStruct(self.key.shape, self.key.dtype)

        def fn(params, u, y, key):
            return model.predict(params, u, y, key, condition=condition)

        self._compiled = (
            jax.jit(fn)
            .lower(params, u_spec, y_spec, key_spec)
            .compile()
        )

    @property
    def cost_analysis(self):
        """Compiler cost analysis (FLOPs / bytes) of the executable."""
        return self._compiled.cost_analysis()

    def __call__(self, u, y, key=None):
        dtype = self.model.dtype
        u = jnp.asarray(np.asarray(u), dtype=dtype)
        y = jnp.asarray(np.asarray(y), dtype=dtype)
        if u.shape[:2] != (self.batch, self.seq_len):
            raise ValueError(
                f"compiled for shape {(self.batch, self.seq_len)}, got {u.shape[:2]}"
            )
        return self._compiled(self.params, u, y, key if key is not None else self.key)

"""Particle (sample-axis) parallelism.

Particles are conditionally iid given a sequence, and every model's ELBO
decomposes as

    elbo = sum_over_particles(per-sequence terms) / divisor + global

(the models expose ``particle_sum`` / ``particle_divisor`` /
``global_term`` in their aux dict; for PR-SSM the divisor is faithfully
1). That makes the particle axis a second data-parallel axis: each mesh
shard runs the SAME model with ``samples / n`` particles and a
shard-unique RNG fold, the particle sums are ``psum``-ed over ICI, and
the parameter-only global terms are computed redundantly (they are
identical on every shard).

Use when the window batch alone is too small to fill a mesh (e.g. the
Sarcos config: batch 5, 20 particles -> a ('data', 'particle') mesh of
5 x 4 keeps 20 devices busy).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


class ParticleParallel:
    """Wraps a model class so ``loss`` shards the particle axis over
    ``axis_name`` of ``mesh`` (and optionally the batch axis over
    ``data_axis``)."""

    def __init__(self, model_cls, config, mesh: Mesh, axis_name: str = "particle",
                 data_axis: str | None = None):
        from cbfssm_tpu.config import as_config

        cfg = as_config(config)
        self.n = mesh.shape[axis_name]
        if cfg.samples % self.n != 0:
            raise ValueError(
                f"samples ({cfg.samples}) must divide by the particle axis "
                f"size ({self.n})"
            )
        self.total_samples = cfg.samples
        # Each shard runs an identical model with samples/n particles.
        self.local_model = model_cls(
            dataclasses.replace(cfg, samples=cfg.samples // self.n)
        )
        # Reference model (full particle count) for init/predict/var_dict.
        self.model = model_cls(cfg)
        self.mesh = mesh
        self.axis_name = axis_name
        self.data_axis = data_axis
        self.dtype = self.model.dtype
        self.config = self.model.config

    def init(self, key):
        return self.model.init(key)

    def var_dict(self, params):
        return self.model.var_dict(params)

    def predict(self, params, u, y, key, condition: bool = False):
        return self.model.predict(params, u, y, key, condition)

    # Fallback for model classes that do not declare REPLICATED_AUX:
    # aux entries that are functions of the (replicated) parameters only
    # — identical on every shard, so they must NOT be psum-ed. Models in
    # this repo own the property next to their aux dicts (REPLICATED_AUX
    # classattr, like SWEEPABLE_HYPERS / PARTICLE_NORMALIZED) so a new
    # aux key cannot silently drift out of sync with this list.
    _REPLICATED_AUX = frozenset(
        {"kl_z", "kl_z_f", "kl_z_b", "n_reg", "l_reg", "global_term",
         "particle_divisor"}
    )

    def _shard_key(self, key):
        """Per-shard RNG fold, unique over the (particle, data) shard
        GRID — folding only the particle index would hand every data
        shard at the same particle position bitwise-identical noise, so
        batch rows on different data shards would be noise-correlated
        (the unsharded model draws independently per row)."""
        idx = jax.lax.axis_index(self.axis_name)
        if self.data_axis:
            idx = idx + self.mesh.shape[self.axis_name] * jax.lax.axis_index(
                self.data_axis
            )
        return jax.random.fold_in(key, idx)

    def loss(self, params, u, y, key, condition: bool = True, weights=None):
        """Sharded negative ELBO + full aux parity. Statistically
        equivalent to the unsharded model (same particle count in total;
        shard-unique RNG folds make the draws a different sample path).
        Per-particle aux terms (loglik, kl_x, entropy, particle_sum) are
        psum-ed alongside the loss so the ELBO decomposition and metric
        logging survive sharding."""
        local = self.local_model
        axis = self.axis_name
        data_spec = P(self.data_axis) if self.data_axis else P()

        # Whether the model normalizes by the particle count is a static
        # property of the model class (PR-SSM faithfully does not) — it
        # must NOT be inferred from the local divisor's value, which is
        # coincidentally 1 whenever S/n == 1.
        normalized = getattr(type(self.model), "PARTICLE_NORMALIZED", True)
        divisor_total = float(self.total_samples) if normalized else 1.0

        def shard_fn(params, u, y, key, weights):
            skey = self._shard_key(key)
            _, aux = local.loss(params, u, y, skey, condition, weights)

            def total(v):
                v = jax.lax.psum(v, axis)
                return jax.lax.psum(v, self.data_axis) if self.data_axis else v

            replicated = frozenset(
                getattr(type(self.model), "REPLICATED_AUX", self._REPLICATED_AUX)
            )
            out_aux = {
                k: (v if k in replicated else total(v))
                for k, v in aux.items()
            }
            out_aux["particle_divisor"] = jnp.asarray(
                divisor_total, dtype=self.dtype
            )
            elbo = out_aux["particle_sum"] / divisor_total + aux["global_term"]
            return -elbo, out_aux

        in_specs = (P(), data_spec, data_spec, P(), data_spec)
        if weights is None:
            weights = jnp.ones(jnp.shape(u)[0], dtype=self.dtype)
        fn = jax.shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=in_specs,
            out_specs=(P(), P()),
        )
        u = jnp.asarray(u, dtype=self.dtype)
        y = jnp.asarray(y, dtype=self.dtype)
        return fn(params, u, y, key, weights)

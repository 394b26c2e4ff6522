"""Particle-axis parallelism: shard_map'd loss matches an exact serial
emulation of the shard math, and trains."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbfssm_tpu.models import CBFSSM, PRSSM
from cbfssm_tpu.parallel import make_mesh
from cbfssm_tpu.parallel.particle import ParticleParallel
from tests.test_cbfssm_model import TinyDS, make_model
from tests.test_other_models import prssm_config

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def cbfssm_cfg(samples=8):
    m = make_model(samples=samples)
    return m.config


def serial_emulation(model_cls, cfg, n, params, u, y, key, condition=True):
    """Exact reference for the sharded computation: run the S/n-particle
    model once per shard index with the same RNG folds and recombine."""
    import dataclasses

    local = model_cls(dataclasses.replace(cfg, samples=cfg.samples // n))
    psum = 0.0
    for idx in range(n):
        skey = jax.random.fold_in(key, idx)
        _, aux = local.loss(params, u, y, skey, condition)
        psum += float(aux["particle_sum"])
        global_term = float(aux["global_term"])
    normalized = getattr(model_cls, "PARTICLE_NORMALIZED", True)
    divisor_total = float(cfg.samples) if normalized else 1.0
    return -(psum / divisor_total + global_term)


@pytest.mark.parametrize("model_cls,cfg_fn", [
    (CBFSSM, cbfssm_cfg),
    (PRSSM, lambda: PRSSM({**prssm_config("output"), "samples": 8}).config),
])
def test_sharded_loss_matches_serial_emulation(rng, model_cls, cfg_fn):
    cfg = cfg_fn()
    mesh = make_mesh(4, axis_name="particle")
    pp = ParticleParallel(model_cls, cfg, mesh)
    params = pp.init(jax.random.PRNGKey(0))
    u = rng.normal(size=(2, 8, 2))
    y = rng.normal(size=(2, 8, 1))
    key = jax.random.PRNGKey(7)
    got, _ = pp.loss(params, u, y, key)
    want = serial_emulation(model_cls, cfg, 4, params, u, y, key)
    np.testing.assert_allclose(float(got), want, rtol=1e-8)


def test_one_particle_per_shard_normalization(rng):
    """Regression: with S == n the local divisor is coincidentally 1;
    the recombination must still normalize by S for particle-normalized
    models."""
    cfg = cbfssm_cfg(samples=8)
    mesh = make_mesh(8, axis_name="particle")
    pp = ParticleParallel(CBFSSM, cfg, mesh)
    params = pp.init(jax.random.PRNGKey(0))
    u = rng.normal(size=(2, 8, 2))
    y = rng.normal(size=(2, 8, 1))
    key = jax.random.PRNGKey(7)
    got, _ = pp.loss(params, u, y, key)
    want = serial_emulation(CBFSSM, cfg, 8, params, u, y, key)
    np.testing.assert_allclose(float(got), want, rtol=1e-8)


def test_sharded_aux_parity(rng):
    """The ELBO decomposition must survive sharding: every aux entry of
    the sharded loss equals the serially-emulated total (per-particle
    terms psum-ed over the mesh, parameter-only terms replicated)."""
    import dataclasses

    cfg = cbfssm_cfg()
    n = 4
    mesh = make_mesh(n, axis_name="particle")
    pp = ParticleParallel(CBFSSM, cfg, mesh)
    params = pp.init(jax.random.PRNGKey(0))
    u = rng.normal(size=(2, 8, 2))
    y = rng.normal(size=(2, 8, 1))
    key = jax.random.PRNGKey(7)
    _, aux = pp.loss(params, u, y, key)

    local = CBFSSM(dataclasses.replace(cfg, samples=cfg.samples // n))
    want = {}
    for idx in range(n):
        _, la = local.loss(params, u, y, jax.random.fold_in(key, idx))
        for k, v in la.items():
            if k in ParticleParallel._REPLICATED_AUX:
                want[k] = float(v)
            else:
                want[k] = want.get(k, 0.0) + float(v)
    want["particle_divisor"] = float(cfg.samples)

    assert set(aux) == set(want)
    for k in want:
        np.testing.assert_allclose(float(aux[k]), want[k], rtol=1e-8, err_msg=k)


def test_sharded_loss_grads(rng):
    cfg = cbfssm_cfg()
    mesh = make_mesh(4, axis_name="particle")
    pp = ParticleParallel(CBFSSM, cfg, mesh)
    params = pp.init(jax.random.PRNGKey(0))
    u = rng.normal(size=(2, 8, 2))
    y = rng.normal(size=(2, 8, 1))
    grads = jax.grad(lambda p: pp.loss(p, u, y, jax.random.PRNGKey(1))[0])(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert np.abs(np.asarray(grads.gp_f.mean)).max() > 0


def test_two_axis_mesh(rng):
    """('data', 'particle') 2x4 mesh: batch sharded AND particles
    sharded."""
    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    from jax.sharding import Mesh

    mesh = Mesh(devices, ("data", "particle"))
    cfg = cbfssm_cfg()
    pp = ParticleParallel(CBFSSM, cfg, mesh, data_axis="data")
    params = pp.init(jax.random.PRNGKey(0))
    u = rng.normal(size=(2, 8, 2))
    y = rng.normal(size=(2, 8, 1))
    loss, _ = pp.loss(params, u, y, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))


def test_trainer_accepts_particle_parallel(tmp_path):
    """ParticleParallel satisfies the Trainer's model interface: a full
    train() pass (whole-epoch scan with shard_map inside) works."""
    from cbfssm_tpu.training import Trainer
    from tests.test_trainer import SmokeDS, smoke_config

    cfg = smoke_config()
    cfg["samples"] = 4
    mesh = make_mesh(4, axis_name="particle")
    pp = ParticleParallel(CBFSSM, cfg, mesh)
    ds = SmokeDS()
    trainer = Trainer(pp, str(tmp_path / "pp"))
    trainer.train(ds, epochs=2)
    assert all(np.isfinite(trainer.train_all))
    assert trainer.train_all[-1] < trainer.train_all[0]


def test_invalid_particle_count():
    cfg = cbfssm_cfg(samples=6)  # not divisible by 4
    mesh = make_mesh(4, axis_name="particle")
    with pytest.raises(ValueError, match="divide"):
        ParticleParallel(CBFSSM, cfg, mesh)


def test_hand_adjoint_composes_with_particle_shard_map(rng):
    """The opt-in hand adjoint (custom-VJP rollouts) must differentiate
    correctly inside the particle shard_map (vma checks on)."""
    import dataclasses

    cfg = dataclasses.replace(cbfssm_cfg(), adjoint="hand")
    cfg_auto = dataclasses.replace(cfg, adjoint="autodiff")
    mesh = make_mesh(4, axis_name="particle")
    u = rng.normal(size=(2, 8, 2))
    y = rng.normal(size=(2, 8, 1))
    key = jax.random.PRNGKey(7)
    grads = {}
    for name, c in (("hand", cfg), ("autodiff", cfg_auto)):
        pp = ParticleParallel(CBFSSM, c, mesh)
        params = pp.init(jax.random.PRNGKey(0))
        loss_fn = lambda p: pp.loss(p, u, y, key)[0]  # noqa: E731
        grads[name] = jax.grad(loss_fn)(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-12
        ),
        grads["hand"],
        grads["autodiff"],
    )


def test_shard_keys_unique_over_both_axes(rng):
    """On a ('data', 'particle') mesh, every shard of the GRID must fold
    a DISTINCT RNG key — regression: folding only the particle index
    handed every data shard at the same particle position identical
    noise, correlating batch rows across data shards."""
    from jax.sharding import Mesh, PartitionSpec as P

    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "particle"))
    pp = ParticleParallel(CBFSSM, cbfssm_cfg(), mesh, data_axis="data")
    keys = jax.shard_map(
        lambda k: jax.random.key_data(pp._shard_key(k))[None],
        mesh=mesh,
        in_specs=(P(),),
        out_specs=P(("data", "particle")),
    )(jax.random.PRNGKey(0))
    keys = np.asarray(keys)  # [8, key_words]
    assert len({tuple(k) for k in keys}) == 8

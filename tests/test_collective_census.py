"""Collective census of every sharded production program (r4 verdict #1).

docs/SCALING.md claims the data mesh's only cross-device traffic is the
gradient psum (parameters replicated, batch rows sharded). Loss-equality
tests cannot verify that — a program that all-gathers the batch and
computes everything replicated passes them bit-for-bit while scaling
terribly over real ICI. These tests compile the actual production
programs on virtual CPU meshes and pin the communication contract at
the HLO level:

* Trainer ``_epoch_update`` / ``_block_update`` (data mesh): all-reduce
  ONLY, every payload parameter-sized — no batch all-gathers. This is
  the census that caught the run-major flatten bug (``gp.predict_rows``
  docstring): before the fix, the recognition pass all-gathered its
  batch shards per scan step and REPLICATED every GP matmul.
* MultiSeedTrainer epoch update (seed-lane mesh): ZERO collectives —
  lanes are embarrassingly parallel.
* FilterPool tick + fused replay (serving row mesh): ZERO collectives.
* ParticleParallel loss: the hand-placed particle psums only.

Census at both 2 and 8 devices (partitioners sometimes special-case
powers and small meshes differently).
"""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbfssm_tpu.models import CBFSSM, CBFSSMHALF
from cbfssm_tpu.parallel import make_mesh
from cbfssm_tpu.parallel.census import (
    assert_data_parallel_contract,
    census,
    collectives,
)
from cbfssm_tpu.training import Trainer
from cbfssm_tpu.training.multiseed import MultiSeedTrainer

from test_trainer import SmokeDS, smoke_config


def _param_bytes(params) -> int:
    return sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(params)
    )


def _trainer(n_devices):
    model = CBFSSM(smoke_config())
    mesh = make_mesh(n_devices)
    tr = Trainer(model, tempfile.mkdtemp(), mesh=mesh)
    tr.init_state()
    ds = SmokeDS()
    data_u, data_y = tr._stage("train", ds.train_in_batch, ds.train_out_batch)
    batch = tr.dp.round_up_batch(model.config.batch_size)
    idx, w = tr._epoch_indices(ds.train_in_batch.shape[0], batch, shuffle=False)
    return tr, ds, data_u, data_y, idx, w, batch


@pytest.mark.parametrize("n_devices", [2, 8])
def test_epoch_update_census(n_devices):
    tr, ds, data_u, data_y, idx, w, batch = _trainer(n_devices)
    lowered = tr._epoch_update.lower(
        tr.params, tr.opt_state, data_u, data_y, idx, w, jax.random.PRNGKey(0)
    )
    bound = _param_bytes(tr.params) + 1024  # grads tuple + loss scalars
    items = assert_data_parallel_contract(
        lowered.compile(), bound, context=f"_epoch_update@{n_devices}dev"
    )
    # the gradient psum must exist (a censusless program would mean the
    # whole step silently runs replicated) and stay a handful of fused
    # tuples, not one all-reduce per parameter leaf
    assert 1 <= len(items) <= 8, [c.shapes for c in items]


@pytest.mark.parametrize("n_devices", [2, 8])
def test_block_update_census(n_devices):
    tr, ds, data_u, data_y, idx, w, batch = _trainer(n_devices)
    test_u, test_y = tr._stage("test", ds.test_in_batch, ds.test_out_batch)
    tidx, tw = tr._epoch_indices(ds.test_in_batch.shape[0], batch, shuffle=False)
    k = 3
    idxs = np.stack([idx] * k)
    ws = np.stack([w] * k)
    best = jnp.asarray(np.inf, dtype=tr.model.dtype)
    lowered = tr._block_update.lower(
        tr.params, tr.opt_state, data_u, data_y, test_u, test_y,
        idxs, ws, tidx, tw, np.arange(k, dtype=np.int32), best,
        jax.random.PRNGKey(1),
    )
    bound = _param_bytes(tr.params) + 1024
    items = assert_data_parallel_contract(
        lowered.compile(), bound, context=f"_block_update@{n_devices}dev"
    )
    assert 1 <= len(items) <= 8, [c.shapes for c in items]


@pytest.mark.parametrize("n_devices", [2, 8])
def test_multiseed_epoch_is_collective_free(n_devices):
    model = CBFSSM(smoke_config())
    ms = MultiSeedTrainer(
        model, tempfile.mkdtemp(), n_seeds=n_devices,
        mesh=make_mesh(n_devices),
    )
    ms.init_state()
    ds = SmokeDS()
    dtype = model.dtype
    data_u = jax.device_put(np.asarray(ds.train_in_batch, dtype=dtype))
    data_y = jax.device_put(np.asarray(ds.train_out_batch, dtype=dtype))
    idx_s, w_s = ms._epoch_indices(
        ds.train_in_batch.shape[0], model.config.batch_size, shuffle=False
    )
    keys = ms._lane_keys(jax.random.PRNGKey(0))
    lowered = ms._epoch_update.lower(
        ms.params, ms.opt_state, data_u, data_y, idx_s, w_s, keys
    )
    assert census(lowered.compile()) == {}, (
        "seed lanes are independent; any collective is accidental "
        "cross-lane traffic"
    )


def test_sweep_lanes_are_collective_free():
    """SweepTrainer grid lanes (hyper values stacked on the lane axis,
    possibly with injected learning rates) shard like seed lanes:
    zero cross-device traffic."""
    from cbfssm_tpu.training.sweep import SweepTrainer

    n = 8
    st = SweepTrainer(
        CBFSSM, smoke_config(),
        {"k_factor": np.linspace(10.0, 80.0, n),
         "learning_rate": np.linspace(0.01, 0.08, n)},
        tempfile.mkdtemp(), mesh=make_mesh(n),
    )
    st.init_state()
    ds = SmokeDS()
    dtype = st.model.dtype
    data_u = jax.device_put(np.asarray(ds.train_in_batch, dtype=dtype))
    data_y = jax.device_put(np.asarray(ds.train_out_batch, dtype=dtype))
    idx_s, w_s = st._epoch_indices(
        ds.train_in_batch.shape[0], st.model.config.batch_size,
        shuffle=False,
    )
    keys = st._lane_keys(jax.random.PRNGKey(0))
    lowered = st._epoch_update.lower(
        st.params, st.opt_state, data_u, data_y, idx_s, w_s, keys
    )
    assert census(lowered.compile()) == {}


def _half_model():
    cfg = smoke_config()
    cfg.update(recog_model="rnn", dim_x=2,
               var_y=np.asarray([1.0]), loss_factors=np.asarray([1.0, 0.0]))
    return CBFSSMHALF(cfg)


@pytest.mark.parametrize("n_devices", [2, 8])
def test_filter_pool_tick_and_replay_are_collective_free(n_devices):
    from cbfssm_tpu.serving import FilterPool

    model = _half_model()
    params = model.init(jax.random.PRNGKey(0))
    pool = FilterPool(
        model, params, capacity=n_devices, seed=0,
        mesh=make_mesh(n_devices), replay_buckets=(4,),
    )
    assert census(pool._step_c) == {}, (
        "pool sessions are independent rows; tick must be collective-free"
    )
    for k, compiled in pool._replay_c.items():
        assert census(compiled) == {}, f"replay bucket {k} has collectives"


def test_particle_parallel_census():
    from cbfssm_tpu.parallel.particle import ParticleParallel

    cfg = smoke_config()
    cfg["samples"] = 8
    mesh = make_mesh(8, axis_name="particle")
    pp = ParticleParallel(CBFSSM, cfg, mesh)
    params = pp.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    u = rng.normal(size=(4, 8, 1))
    y = rng.normal(size=(4, 8, 1))
    lowered = jax.jit(
        lambda p: pp.loss(p, u, y, jax.random.PRNGKey(1))
    ).lower(params)
    counts = census(lowered.compile())
    # the hand-placed particle psums are the only collectives; nothing
    # may gather the per-shard particle blocks
    assert set(counts) == {"all-reduce"}, counts
    items = collectives(lowered.compile())
    # psum payloads are per-sequence reductions ([B]-sized), never the
    # particle ensemble itself ([B, S/n, dx]-sized or larger)
    max_payload = 4 * 8 * np.dtype(np.float64).itemsize  # B * a few scalars
    for c in items:
        assert c.result_bytes <= max_payload, (c.shapes, c.result_bytes)


def test_other_model_families_census():
    """CBFSSMHALF (rnn recognition incl. the flax GRU), PRSSM, and
    Voliro mesh trainers: gradient psums only — no family regresses to
    gathered/replicated compute."""
    from test_other_models import (
        half_config,
        prssm_config,
        voliro_batch,
        voliro_config,
    )

    from cbfssm_tpu.models import PRSSM, Voliro

    rng = np.random.default_rng(0)
    n_dev = 8
    mesh = make_mesh(n_dev)

    def windows(n, t, du, dy):
        return (rng.normal(size=(n, t, du)), rng.normal(size=(n, t, dy)))

    cases = []
    cases.append((CBFSSMHALF(half_config("rnn")), windows(16, 10, 2, 1)))
    cases.append((PRSSM(prssm_config("rnn")), windows(16, 10, 2, 1)))
    vu, vy = voliro_batch(rng, b=16, t=6)
    cases.append((Voliro(voliro_config()), (vu, vy)))

    for model, (u, y) in cases:
        tr = Trainer(model, tempfile.mkdtemp(), mesh=mesh)
        tr.init_state()
        data_u, data_y = tr._stage("train", u, y)
        batch = tr.dp.round_up_batch(model.config.batch_size)
        idx, w = tr._epoch_indices(u.shape[0], batch, shuffle=False)
        lowered = tr._epoch_update.lower(
            tr.params, tr.opt_state, data_u, data_y, idx, w,
            jax.random.PRNGKey(0),
        )
        bound = _param_bytes(tr.params) + 1024
        items = assert_data_parallel_contract(
            lowered.compile(), bound, context=type(model).__name__
        )
        assert items, f"{type(model).__name__}: gradient psum missing"


def test_two_axis_trainer_census():
    """(data x particle) 2-D mesh through the production Trainer: the
    only collectives are all-reduces — the XLA gradient psums plus the
    hand-placed particle psums (whose payloads are [B]-sized
    per-sequence reductions) — never a gather of batch rows or of the
    particle ensemble."""
    from jax.sharding import Mesh

    from cbfssm_tpu.parallel.particle import ParticleParallel

    cfg = smoke_config()
    cfg["samples"] = 8
    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "particle"))
    pp = ParticleParallel(CBFSSM, cfg, mesh, data_axis="data")
    tr = Trainer(pp, tempfile.mkdtemp(), mesh=mesh)
    tr.init_state()
    ds = SmokeDS()
    data_u, data_y = tr._stage("train", ds.train_in_batch, ds.train_out_batch)
    batch = tr.dp.round_up_batch(pp.config.batch_size)
    idx, w = tr._epoch_indices(ds.train_in_batch.shape[0], batch, shuffle=False)
    lowered = tr._epoch_update.lower(
        tr.params, tr.opt_state, data_u, data_y, idx, w, jax.random.PRNGKey(0)
    )
    items = collectives(lowered.compile())
    assert items and all(c.kind == "all-reduce" for c in items), [
        (c.kind, c.shapes) for c in items
    ]
    # bound: the largest legitimate payload is the fused gradient tuple
    # (parameter-sized); particle psums are [B]-sized. The ensemble
    # block ([B, S/n, dx] and larger) must never cross ICI.
    bound = _param_bytes(tr.params) + 1024
    for c in items:
        assert c.result_bytes <= bound, (c.shapes, c.result_bytes)


def test_census_parser_units():
    """Parser handles scalar, tensor, variadic-tuple, and -start forms."""
    from cbfssm_tpu.parallel.census import Collective

    text = """
  %all-gather.12 = f32[2,8,4,5]{3,2,0,1} all-gather(%x), channel_id=1, metadata={op_name="jit(f)/gather"}
  %all-reduce.68 = (f32[5]{0}, f32[20,5]{1,0}, f32[]) all-reduce(%a, %b, %c), channel_id=2, metadata={op_name="jit(f)/psum"}
  %ar = f32[3]{0} all-reduce-start(%d), channel_id=3
  %ar2 = f32[3]{0} all-reduce-done(%ar), channel_id=3
  %cp = u32[16]{0} collective-permute(%e), channel_id=4
  %plain = f32[8,8]{1,0} dot(%f, %g)
"""
    items = collectives(text)
    kinds = [c.kind for c in items]
    assert kinds == ["all-gather", "all-reduce", "all-reduce",
                     "collective-permute"]
    ag, ar, ars, cp = items
    assert ag.result_bytes == 2 * 8 * 4 * 5 * 4
    assert ar.shapes == ("f32[5]", "f32[20,5]", "f32[]")
    assert ar.result_bytes == (5 + 100 + 1) * 4
    assert ars.result_bytes == 12  # the -done twin is not double-counted
    assert cp.result_bytes == 64
    assert isinstance(items[0], Collective)
    assert census(text) == {
        "all-gather": 1, "all-reduce": 2, "collective-permute": 1
    }


def test_lowered_input_is_compiled_not_censused_as_mlir():
    """A jax.stages.Lowered also has as_text() — but it returns
    StableHLO MLIR whose collectives the HLO regexes would silently
    miss (empty census = vacuous contract pass). The parser must
    compile Lowered first, and reject raw MLIR text loudly."""
    mesh = make_mesh(2)
    from jax.sharding import NamedSharding, PartitionSpec as P

    def psum_prog(x):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P())
        ).sum()

    x = jax.device_put(
        np.ones(8), NamedSharding(mesh, P("data"))
    )
    lowered = jax.jit(psum_prog).lower(x)
    # the Lowered path must see the post-partitioning collectives
    assert census(lowered), "Lowered input produced an empty census"
    with pytest.raises(ValueError, match="StableHLO MLIR"):
        census(lowered.as_text())  # raw MLIR text is rejected, not empty


def test_contract_rejects_gathers_and_oversized_psums():
    gather = '%g = f32[64,5]{1,0} all-gather(%x), metadata={op_name="bad"}'
    with pytest.raises(AssertionError, match="non-psum"):
        assert_data_parallel_contract(gather, 10**6)
    big = "%r = f32[4096,4096]{1,0} all-reduce(%x), channel_id=1"
    with pytest.raises(AssertionError, match="exceed"):
        assert_data_parallel_contract(big, 1024)

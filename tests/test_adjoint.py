"""Hand-derived adjoint vs reverse-mode autodiff.

The ``adjoint='hand'`` rollouts (models/adjoint.py, ops/gp_adjoint.py)
must produce bit-identical primal values (they run the same scan
bodies) and gradients equal to autodiff's to float64 tolerance, across
backward schedules, conditioning modes, data cotangents, and vmap.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbfssm_tpu.models.cbfssm import CBFSSM
from tests.test_cbfssm_model import make_model as make_base_model


def make_model(adjoint_mode, backward_mode="blocked", dim_x=3,
               recog_len=2, samples=3, dtype="float64"):
    """The canonical CBFSSM test config (tests/test_cbfssm_model.py)
    with the adjoint knobs applied — reused, not duplicated, so the two
    suites can't drift apart."""
    base = make_base_model(recog_len=recog_len, samples=samples,
                           dim_x=dim_x, backward_mode=backward_mode)
    return CBFSSM(dataclasses.replace(
        base.config, dtype=dtype, adjoint=adjoint_mode))


@pytest.fixture
def batch(rng):
    u = rng.normal(size=(2, 12, 2))
    y = rng.normal(size=(2, 12, 1))
    return u, y


def tree_allclose(a, b, rtol, atol=1e-12):
    flat_a, _ = jax.tree_util.tree_flatten(a)
    flat_b, _ = jax.tree_util.tree_flatten(b)
    assert len(flat_a) == len(flat_b)
    for x, z in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(z), rtol=rtol, atol=atol
        )


@pytest.mark.parametrize("backward_mode", ["sequential", "blocked"])
@pytest.mark.parametrize("condition", [True, False])
def test_grads_match_autodiff(batch, backward_mode, condition):
    u, y = batch
    hand = make_model("hand", backward_mode=backward_mode)
    auto = make_model("autodiff", backward_mode=backward_mode)
    params = hand.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    weights = jnp.asarray([1.0, 0.5])

    def loss_of(model):
        return lambda p, uu, yy: model.loss(p, uu, yy, key, condition, weights)[0]

    l_hand, g_hand = jax.value_and_grad(loss_of(hand), argnums=(0, 1, 2))(
        params, jnp.asarray(u), jnp.asarray(y)
    )
    l_auto, g_auto = jax.value_and_grad(loss_of(auto), argnums=(0, 1, 2))(
        params, jnp.asarray(u), jnp.asarray(y)
    )
    # primal: same scan bodies -> bitwise identical
    assert float(l_hand) == float(l_auto)
    # gradients (params AND data cotangents): float64 tolerance
    tree_allclose(g_hand, g_auto, rtol=1e-7)


def test_grads_match_no_hidden_dims(batch, rng):
    """dim_h == 0: no backward GP output dims; forward hand-adjoint
    still active (backward auto-resolves to sequential=autodiff)."""
    u, _ = batch
    y = rng.normal(size=(2, 12, 1))
    hand = make_model("hand", dim_x=1)
    auto = make_model("autodiff", dim_x=1)
    params = hand.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    def loss_of(model):
        return lambda p: model.loss(p, jnp.asarray(u), jnp.asarray(y), key, True)[0]

    l_hand, g_hand = jax.value_and_grad(loss_of(hand))(params)
    l_auto, g_auto = jax.value_and_grad(loss_of(auto))(params)
    assert float(l_hand) == float(l_auto)
    tree_allclose(g_hand, g_auto, rtol=1e-7)


def test_grads_match_under_vmap(batch):
    """MultiSeedTrainer-style stacked-lane training: vmapped grads of the
    hand adjoint equal vmapped autodiff grads."""
    u, y = batch
    hand = make_model("hand")
    auto = make_model("autodiff")
    ps = [hand.init(jax.random.PRNGKey(i)) for i in range(2)]
    stacked = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *ps)
    keys = jax.random.split(jax.random.PRNGKey(9), 2)

    def lane_grads(model):
        f = lambda p, k: model.loss(p, jnp.asarray(u), jnp.asarray(y), k, True)[0]  # noqa: E731
        return jax.vmap(jax.grad(f))(stacked, keys)

    tree_allclose(lane_grads(hand), lane_grads(auto), rtol=1e-7)


def test_float32_primal_bitwise_and_grads_close(batch):
    """f32: primal bitwise equal; grads agree to f32-appropriate
    tolerance (the hand pullback reassociates some elementwise algebra)."""
    u, y = batch
    hand = make_model("hand", dtype="float32")
    auto = make_model("autodiff", dtype="float32")
    params = hand.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    def loss_of(model):
        return lambda p: model.loss(
            p, jnp.asarray(u, jnp.float32), jnp.asarray(y, jnp.float32), key, True
        )[0]

    l_hand, g_hand = jax.value_and_grad(loss_of(hand))(params)
    l_auto, g_auto = jax.value_and_grad(loss_of(auto))(params)
    assert float(l_hand) == float(l_auto)
    tree_allclose(g_hand, g_auto, rtol=2e-3, atol=1e-5)


def test_auto_resolution():
    # 'auto' resolves to autodiff — the hand schedule measured slower on
    # TPU (BENCHMARKS.md "Hand-adjoint verdict"); 'hand' stays opt-in.
    assert not make_model("auto")._hand_adjoint
    assert make_model("hand")._hand_adjoint
    assert not make_model("autodiff")._hand_adjoint
    with pytest.raises(ValueError, match="adjoint"):
        make_model("bogus")


def test_training_improves_with_hand_adjoint(batch):
    """Three Adam steps with hand-adjoint grads reduce the loss like
    autodiff does (end-to-end sanity, not just grad equality)."""
    import optax

    u, y = batch
    losses = {}
    for mode in ("hand", "autodiff"):
        model = make_model(mode)
        params = model.init(jax.random.PRNGKey(0))
        tx = optax.adam(0.05)
        opt = tx.init(params)
        key = jax.random.PRNGKey(3)

        @jax.jit
        def step(p, o, k):
            (l, _), g = jax.value_and_grad(model.loss, has_aux=True)(
                p, jnp.asarray(u), jnp.asarray(y), k, True
            )
            upd, o = tx.update(g, o, p)
            return optax.apply_updates(p, upd), o, l

        ls = []
        for i in range(4):
            params, opt, l = step(params, opt, jax.random.fold_in(key, i))
            ls.append(float(l))
        losses[mode] = ls
    assert losses["hand"][-1] < losses["hand"][0]
    # identical seeds + near-identical grads -> near-identical trajectory
    np.testing.assert_allclose(losses["hand"], losses["autodiff"], rtol=1e-6)

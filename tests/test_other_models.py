"""CBFSSMHALF / PRSSM / Voliro model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbfssm_tpu.models import CBFSSMHALF, PRSSM, Voliro
from cbfssm_tpu.models.voliro import allocation_matrix
from cbfssm_tpu.ops import quaternion


class TinyDS:
    dim_u = 2
    dim_y = 1


def half_config(recog_model="rnn", dim_x=3):
    return {
        "ds": TinyDS,
        "batch_size": 2,
        "shuffle": 100,
        "dim_x": dim_x,
        "ind_pnt_num": 5,
        "samples": 3,
        "learning_rate": 0.01,
        "loss_factors": np.asarray([0.7, 0.0]),
        "k_factor": 10.0,
        "recog_len": 4,
        "recog_model": recog_model,
        "zeta_pos": 2.0,
        "zeta_mean": 0.01,
        "zeta_var": 0.0001,
        "var_x": np.asarray([0.01] * dim_x),
        "var_y": np.asarray([0.5] * TinyDS.dim_y),
        "gp_var": 0.25,
        "gp_len": 1.5,
        "dtype": "float64",
        "jitter": 1e-8,
    }


@pytest.fixture
def batch(rng):
    return rng.normal(size=(2, 8, 2)), rng.normal(size=(2, 8, 1))


@pytest.mark.parametrize("recog", ["rnn", "output"])
def test_half_loss_and_grads(batch, recog):
    model = CBFSSMHALF(half_config(recog))
    params = model.init(jax.random.PRNGKey(0))
    u, y = batch
    loss, aux = model.loss(params, u, y, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda p: model.loss(p, u, y, jax.random.PRNGKey(1))[0])(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert np.abs(np.asarray(grads.gp_f.mean)).max() > 0
    if recog == "rnn":
        # recognition net must receive gradient
        rec_flat, _ = jax.tree_util.tree_flatten(grads.recog)
        assert any(np.abs(np.asarray(g)).max() > 0 for g in rec_flat)


def test_half_hidden_dims_not_conditioned(batch):
    """With dim_x > dim_y, hidden dims get mu=fmean / sig=fvar, so the
    conditioning KL only reflects observed dims; sanity: loss finite and
    kl_x positive when conditioning is active."""
    model = CBFSSMHALF(half_config("output"))
    params = model.init(jax.random.PRNGKey(0))
    u, y = batch
    _, aux = model.loss(params, u, y, jax.random.PRNGKey(1), condition=True)
    assert float(aux["kl_x"]) > 0


def test_half_predict(batch):
    model = CBFSSMHALF(half_config())
    params = model.init(jax.random.PRNGKey(0))
    u, y = batch
    out = model.predict(params, u, y, jax.random.PRNGKey(0))
    assert out.pred_mean.shape == (2, 8, 1)
    assert np.isfinite(np.asarray(out.pred_mean)).all()


def prssm_config(recog_model="rnn", recog_len=4):
    cfg = half_config(recog_model)
    cfg["recog_len"] = recog_len
    return cfg


@pytest.mark.parametrize("recog", ["rnn", "output"])
def test_prssm_loss_and_predict(batch, recog):
    model = PRSSM(prssm_config(recog))
    params = model.init(jax.random.PRNGKey(0))
    u, y = batch
    loss, aux = model.loss(params, u, y, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    out = model.predict(params, u, y, jax.random.PRNGKey(0))
    assert out.pred_mean.shape == (2, 8, 1)
    grads = jax.grad(lambda p: model.loss(p, u, y, jax.random.PRNGKey(1))[0])(params)
    assert np.abs(np.asarray(grads.gp_f.mean)).max() > 0


def test_prssm_conv_recognition(rng):
    """'conv' hardcodes a 35-unit flatten -> requires recog_len == 16
    (reference prssm.py:151-153)."""
    model = PRSSM(prssm_config("conv", recog_len=16))
    params = model.init(jax.random.PRNGKey(0))
    u = rng.normal(size=(2, 20, 2))
    y = rng.normal(size=(2, 20, 1))
    loss, _ = model.loss(params, u, y, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    with pytest.raises(ValueError):
        PRSSM(prssm_config("conv", recog_len=8)).init(jax.random.PRNGKey(0))


def test_prssm_ignores_conditioning(batch):
    model = PRSSM(prssm_config())
    params = model.init(jax.random.PRNGKey(0))
    u, y = batch
    l1, _ = model.loss(params, u, y, jax.random.PRNGKey(1), condition=True)
    l2, _ = model.loss(params, u, y, jax.random.PRNGKey(1), condition=False)
    assert float(l1) == float(l2)


# --- Voliro ---------------------------------------------------------------


class VoliroTinyDS:
    dim_u = 13
    dim_y = 22


def voliro_config():
    return {
        "ds": VoliroTinyDS,
        "batch_size": 2,
        "shuffle": 100,
        "ind_pnt_num": 4,
        "samples": 3,
        "learning_rate": 0.01,
        "loglik_factor": np.asarray([20.0, 0.0, 200.0]),
        "n_beta": [10.0, 2.0, 10.0],
        "l_beta": [1.0, 10.0, 10.0],
        "zeta_pos": 2.0,
        "zeta_mean": 0.0025,
        "zeta_var": 0.0001,
        "gp_var": 0.25,
        "gp_len": 5.0,
        "var_x": np.asarray([0.02] * 7 + [0.2] * 6) ** 2,
        "var_y": np.asarray([0.02] * 7 + [0.2] * 6) ** 2,
        "var_z": np.asarray([0.02] * 6),
        "dtype": "float64",
        "jitter": 1e-8,
    }


def voliro_batch(rng, b=2, t=6):
    pwm = rng.uniform(0.3, 0.9, size=(b, t, 6))
    tilt = rng.uniform(-0.5, 0.5, size=(b, t, 6))
    tgrid = np.broadcast_to(np.arange(t, dtype=np.float64)[None, :, None] * 0.01, (b, t, 1))
    u = np.concatenate((pwm, tilt, tgrid), axis=-1)
    y = rng.normal(size=(b, t, 22)) * 0.1
    # make the quaternion channels (12:16) valid unit quaternions
    q = rng.normal(size=(b, t, 4))
    y[..., 12:16] = q / np.linalg.norm(q, axis=-1, keepdims=True)
    return u, y


def test_allocation_matrix_structure():
    a = allocation_matrix()
    assert a.shape == (6, 12)
    # z-force row: all cos-columns are -1, sin-columns 0
    np.testing.assert_allclose(a[2, 1::2], -1.0)
    np.testing.assert_allclose(a[2, 0::2], 0.0)
    # z-torque row: sin-columns are -arm_length
    np.testing.assert_allclose(a[5, 0::2], -0.3)


def test_voliro_loss_grads(rng):
    model = Voliro(voliro_config())
    params = model.init(jax.random.PRNGKey(0))
    u, y = voliro_batch(rng)
    loss, aux = model.loss(params, u, y, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    for k in ["loglik", "kl_x", "entropy", "kl_z_f", "kl_z_b", "n_reg", "l_reg"]:
        assert np.isfinite(float(aux[k])), k
    grads = jax.grad(lambda p: model.loss(p, u, y, jax.random.PRNGKey(1))[0])(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert np.abs(np.asarray(grads.gp_f.mean)).max() > 0
    assert np.abs(np.asarray(grads.var_z_unc)).max() > 0


def test_voliro_predict_output(rng):
    model = Voliro(voliro_config())
    params = model.init(jax.random.PRNGKey(0))
    u, y = voliro_batch(rng)
    out = model.predict(params, u, y, jax.random.PRNGKey(0))
    assert out["pred_mean"].shape == (2, 6, 13)
    assert out["pred_var"].shape == (2, 6, 13)
    assert out["force_torque"].shape == (2, 6, 6)
    assert out["ft_mean"].shape == (2, 6, 6)
    assert (np.asarray(out["ft_var"]) > 0).all()


def test_symplectic_euler_conserves_quaternion_norm(rng):
    model = Voliro(voliro_config())
    x = rng.normal(size=(2, 3, 13))
    x[..., 3:7] /= np.linalg.norm(x[..., 3:7], axis=-1, keepdims=True)
    ft = rng.normal(size=(2, 3, 6))
    x_next = np.asarray(model.symplectic_euler(jnp.asarray(x), jnp.asarray(ft), 0.01))
    np.testing.assert_allclose(
        np.linalg.norm(x_next[..., 3:7], axis=-1), 1.0, rtol=1e-12
    )


def test_symplectic_euler_freefall():
    """With zero force/torque and identity attitude, the body accelerates
    at g and integrates position with the post-update velocity."""
    model = Voliro(voliro_config())
    x = np.zeros((1, 1, 13))
    x[..., 3] = 1.0  # identity quaternion
    dt = 0.1
    x1 = np.asarray(model.symplectic_euler(jnp.asarray(x), jnp.zeros((1, 1, 6)), dt))
    np.testing.assert_allclose(x1[0, 0, 7:10], [0, 0, 9.81 * dt], atol=1e-12)
    np.testing.assert_allclose(x1[0, 0, 0:3], [0, 0, 9.81 * dt * dt], atol=1e-12)
    np.testing.assert_allclose(x1[0, 0, 3:7], [1, 0, 0, 0], atol=1e-12)


def test_voliro_dt_inference(rng):
    model = Voliro(voliro_config())
    u, _ = voliro_batch(rng, t=10)
    dt = float(model.infer_dt(jnp.asarray(u)))
    np.testing.assert_allclose(dt, 0.01 * 9 / 10, rtol=1e-10)


def test_out_to_hidden(rng):
    y = rng.normal(size=(2, 5, 22))
    h = np.asarray(Voliro.out_to_hidden(jnp.asarray(y)))
    np.testing.assert_allclose(h[..., :3], y[..., 0:3])
    np.testing.assert_allclose(h[..., 3:], y[..., 12:16])


def test_local_coordinates(rng):
    model = Voliro(voliro_config())
    u, _ = voliro_batch(rng, b=1, t=2)
    lc = np.asarray(model.local_coordinates(jnp.asarray(u)))
    pwm, tilt = u[..., :6], u[..., 6:12]
    np.testing.assert_allclose(lc[..., 0::2], np.sin(tilt) * pwm**2, rtol=1e-12)
    np.testing.assert_allclose(lc[..., 1::2], np.cos(tilt) * pwm**2, rtol=1e-12)


def test_voliro_parallel_adjoint_matches_autodiff(rng):
    """adjoint='parallel' (log-depth associative-scan reverse for both
    Voliro recursions): identical primal, gradients equal autodiff to
    float64 reassociation tolerance — incl. data cotangents (u carries
    the dt channel, y the observations)."""
    u, y = voliro_batch(rng, t=9)
    par = Voliro({**voliro_config(), "adjoint": "parallel"})
    auto = Voliro({**voliro_config(), "adjoint": "autodiff"})
    params = par.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    def loss_of(model):
        return lambda p, uu, yy: model.loss(p, uu, yy, key, True)[0]

    l_par, g_par = jax.value_and_grad(loss_of(par), argnums=(0, 1, 2))(
        params, jnp.asarray(u), jnp.asarray(y)
    )
    l_auto, g_auto = jax.value_and_grad(loss_of(auto), argnums=(0, 1, 2))(
        params, jnp.asarray(u), jnp.asarray(y)
    )
    assert float(l_par) == float(l_auto)  # same primal scan bodies
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-11
        ),
        g_par,
        g_auto,
    )


def test_voliro_parallel_adjoint_trains(rng):
    """A few Adam steps under the parallel adjoint reduce the loss and
    track the autodiff trajectory."""
    import optax

    u, y = voliro_batch(rng, t=8)
    losses = {}
    for mode in ("parallel", "autodiff"):
        model = Voliro({**voliro_config(), "adjoint": mode})
        params = model.init(jax.random.PRNGKey(0))
        tx = optax.adam(0.02)
        opt = tx.init(params)

        @jax.jit
        def step(p, o, k):
            (l, _), g = jax.value_and_grad(model.loss, has_aux=True)(
                p, jnp.asarray(u), jnp.asarray(y), k, True
            )
            upd, o = tx.update(g, o, p)
            return optax.apply_updates(p, upd), o, l

        ls = []
        for i in range(4):
            params, opt, l = step(params, opt, jax.random.fold_in(jax.random.PRNGKey(3), i))
            ls.append(float(l))
        losses[mode] = ls
    assert losses["parallel"][-1] < losses["parallel"][0]
    np.testing.assert_allclose(losses["parallel"], losses["autodiff"], rtol=1e-7)


def test_unsupported_adjoint_rejected_at_construction():
    """A model that doesn't implement the requested gradient schedule
    must fail loudly at construction, not silently run autodiff."""
    with pytest.raises(ValueError, match="does not implement"):
        CBFSSMHALF(dict(half_config("rnn"), adjoint="hand"))
    with pytest.raises(ValueError, match="does not implement"):
        PRSSM(dict(prssm_config(), adjoint="parallel"))
    with pytest.raises(ValueError, match="does not implement"):
        Voliro(dict(voliro_config(), adjoint="hand"))
    # supported combinations still construct
    Voliro(dict(voliro_config(), adjoint="parallel"))


def test_dim_x_smaller_than_dim_y_rejected():
    """CBFSSMHALF/PRSSM zero-pad observations up to dim_x; dim_x < dim_y
    must raise a clear config error, not a negative-pad trace crash."""
    with pytest.raises(ValueError, match="dim_x >= dim_y"):
        CBFSSMHALF(half_config("rnn", dim_x=0))
    with pytest.raises(ValueError, match="dim_x >= dim_y"):
        PRSSM(dict(prssm_config(), dim_x=0, var_x=np.zeros(0)))

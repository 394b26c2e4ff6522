"""CBFSSM model tests.

The central test re-implements the full ELBO as a slow, literal Python
loop (mirroring the reference's per-timestep semantics, using the
triangular-solve GP path) with the *same* RNG draws, and checks the
production lax.scan / merged-two-run / solve-free implementation against
it to tight float64 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbfssm_tpu.models import segmentation
from cbfssm_tpu.models.base import LOG_2PI_E
from cbfssm_tpu.models.cbfssm import CBFSSM
from cbfssm_tpu.ops import gp, transforms


class TinyDS:
    dim_u = 2
    dim_y = 1


def make_model(seq_len=8, recog_len=2, samples=3, dim_x=3, k_factor=10.0,
               backward_mode="sequential"):
    config = {
        "ds": TinyDS,
        "batch_size": 2,
        "shuffle": 100,
        "dim_x": dim_x,
        "ind_pnt_num": 5,
        "samples": samples,
        "learning_rate": 0.01,
        "loss_factors": np.asarray([0.7, 0.3]),
        "k_factor": k_factor,
        "recog_len": recog_len,
        "zeta_pos": 2.0,
        "zeta_mean": 0.01,
        "zeta_var": 0.0001,
        "var_x": np.asarray([0.01] * dim_x),
        "var_y": np.asarray([0.5] * dim_x),
        "gp_var": 0.25,
        "gp_len": 1.5,
        "dtype": "float64",
        "jitter": 1e-8,
        "backward_mode": backward_mode,
    }
    return CBFSSM(config)


@pytest.fixture
def batch(rng):
    u = rng.normal(size=(2, 8, 2))
    y = rng.normal(size=(2, 8, 1))
    return u, y


def reference_loss(model, params, u, y, key, condition):
    """Literal per-timestep reimplementation (reference semantics,
    cbfssm.py:84-262) sharing the model's RNG derivation."""
    cfg = model.config
    t_len, b = u.shape[1], u.shape[0]
    s, dx, dy, dh = model.samples, model.dim_x, model.dim_y, model.dim_h
    recog_len = cfg.recog_len
    jitter = model.jitter

    var_x = np.asarray(transforms.positive(params.var_x_unc))
    var_y = np.asarray(transforms.positive(params.var_y_unc))
    u_tm = np.transpose(u, (1, 0, 2))
    y_tm = np.transpose(y, (1, 0, 2))

    kb, kf = jax.random.split(key)
    kn, ke = jax.random.split(kb)
    # Noise indexing depends on the backward schedule: the blocked
    # implementation draws arrays over each run's SHIFTED time axis.
    if cfg.backward_mode == "blocked":
        t_ext, _, shifts = segmentation.blocked_layout(t_len, recog_len)
    else:
        t_ext, shifts = t_len, (0, 0)
    noise = np.asarray(jax.random.normal(kn, (t_ext, 2, b, s, 1), dtype=jnp.float64))
    eps_b = np.asarray(jax.random.normal(ke, (t_ext, 2, b, s, 1), dtype=jnp.float64))
    eps_f = np.asarray(jax.random.normal(kf, (t_len - 1, b, s, 1), dtype=jnp.float64))

    def predict_b(xin):
        m, v = gp.predict_reference(params.gp_b, jnp.asarray(xin), jitter)
        return np.asarray(m), np.asarray(v)

    def predict_f(xin):
        m, v = gp.predict_reference(params.gp_f, jnp.asarray(xin), jitter)
        return np.asarray(m), np.asarray(v)

    # --- backward: two independent reverse-time runs ---
    y2 = np.zeros((t_len, b, s, dh))
    ent = np.zeros((t_len, b))
    for run in range(2):
        h = np.zeros((b, s, dh))
        for t in range(t_len - 1, -1, -1):
            resample, write = (
                ((t + 1) % (2 * recog_len) == 0, t % (2 * recog_len) < recog_len)
                if run == 0
                else (
                    (t + recog_len + 1) % (2 * recog_len) == 0,
                    t % (2 * recog_len) >= recog_len,
                )
            )
            h_in = (
                np.broadcast_to(noise[t + shifts[run], run], (b, s, dh))
                if resample
                else h
            )
            uy = np.broadcast_to(
                np.concatenate((u_tm[t], y_tm[t]), axis=-1)[:, None, :], (b, s, 3)
            )
            gp_in = np.concatenate((h_in, uy), axis=-1).reshape(b * s, dx + 2)
            fmean, fvar = predict_b(gp_in)
            fmean = fmean.reshape(b, s, dh) + h_in
            fvar = fvar.reshape(b, s, dh) + var_x[:dh]
            out = fmean + eps_b[t + shifts[run], run] * np.sqrt(fvar)
            if write:
                y2[t] = out
                ent[t] = 0.5 * np.sum(LOG_2PI_E + np.log(fvar), axis=(1, 2))
            h = out
    entropy = ent.sum(axis=0)
    y_obs = np.broadcast_to(y_tm[:, :, None, :], (t_len, b, s, dy))
    y_tilde = np.concatenate((y_obs, y2), axis=-1)

    # --- forward ---
    x = y_tilde[0]
    xs = [x]
    kl_x = np.zeros(b)
    for t in range(t_len - 1):
        gp_in = np.concatenate(
            (x, np.broadcast_to(u_tm[t][:, None, :], (b, s, 2))), axis=-1
        ).reshape(b * s, dx + 2)
        fmean, fvar = predict_f(gp_in)
        fmean = fmean.reshape(b, s, dx) + x
        fvar = fvar.reshape(b, s, dx) + var_x
        var_y_t = var_y + (cfg.k_factor - 1.0) * fvar
        gain = fvar / (var_y_t + fvar)
        mu = fmean + gain * (y_tilde[t + 1] - fmean)
        sig = (1.0 - gain) ** 2 * fvar + gain**2 * var_y_t
        do_cond = condition or (t < recog_len - 1)
        if do_cond:
            x = mu + eps_f[t] * np.sqrt(sig)
            kl_x += 0.5 * np.sum(
                np.log(fvar) - np.log(sig) + (sig + (mu - fmean) ** 2) / fvar - 1.0,
                axis=(1, 2),
            )
        else:
            x = fmean + eps_f[t] * np.sqrt(fvar)
        xs.append(x)
    x_final = np.stack(xs, axis=0)

    # --- ELBO ---
    y_final = x_final[..., :dy]
    resid = y_obs - y_final
    loglik = np.sum(
        -0.5 * (np.log(2 * np.pi) + np.log(var_y[:dy]) + resid**2 / var_y[:dy]),
        axis=(0, 2, 3),
    )
    cache_f = gp.precompute(params.gp_f, jitter)
    cache_b = gp.precompute(params.gp_b, jitter)
    kl_zf = float(gp.prior_kl(params.gp_f, cache_f))
    kl_zb = float(gp.prior_kl(params.gp_b, cache_b))
    lam1, lam2 = cfg.loss_factors[:2]
    elbo = (
        np.sum(lam1 * (loglik - kl_x) + lam2 * entropy) / s - kl_zf - kl_zb
    )
    return -elbo


@pytest.mark.parametrize("mode", ["sequential", "blocked"])
@pytest.mark.parametrize("condition", [True, False])
def test_loss_matches_literal_reimplementation(batch, condition, mode):
    model = make_model(backward_mode=mode)
    params = model.init(jax.random.PRNGKey(0))
    u, y = batch
    key = jax.random.PRNGKey(42)
    got, _ = model.loss(params, u, y, key, condition=condition)
    want = reference_loss(model, params, u, y, key, condition=condition)
    np.testing.assert_allclose(float(got), want, rtol=1e-7)


@pytest.mark.parametrize(
    "seq_len,recog_len",
    [(8, 2), (7, 2), (16, 4), (10, 4), (9, 3), (12, 16), (34, 16)],
)
def test_blocked_matches_literal_across_shapes(rng, seq_len, recog_len):
    """Odd lengths, partial top blocks, and T < 2L (single-block) cases."""
    model = make_model(seq_len=seq_len, recog_len=recog_len, backward_mode="blocked")
    params = model.init(jax.random.PRNGKey(1))
    u = rng.normal(size=(2, seq_len, 2))
    y = rng.normal(size=(2, seq_len, 1))
    key = jax.random.PRNGKey(5)
    got, _ = model.loss(params, u, y, key)
    want = reference_loss(model, params, u, y, key, condition=True)
    np.testing.assert_allclose(float(got), want, rtol=1e-7)


def test_loss_finite_and_deterministic(batch):
    model = make_model()
    params = model.init(jax.random.PRNGKey(1))
    u, y = batch
    key = jax.random.PRNGKey(3)
    l1, _ = model.loss(params, u, y, key)
    l2, _ = model.loss(params, u, y, key)
    assert np.isfinite(float(l1))
    assert float(l1) == float(l2)
    l3, _ = model.loss(params, u, y, jax.random.PRNGKey(4))
    assert float(l3) != float(l1)


def test_gradients_flow_to_all_params(batch):
    model = make_model()
    params = model.init(jax.random.PRNGKey(2))
    u, y = batch
    grads = jax.grad(lambda p: model.loss(p, u, y, jax.random.PRNGKey(0))[0])(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    for leaf in flat:
        assert np.isfinite(np.asarray(leaf)).all()
    # Every major component receives gradient signal.
    assert np.abs(np.asarray(grads.var_x_unc)).max() > 0
    assert np.abs(np.asarray(grads.var_y_unc)).max() > 0
    assert np.abs(np.asarray(grads.gp_f.mean)).max() > 0
    assert np.abs(np.asarray(grads.gp_b.mean)).max() > 0
    assert np.abs(np.asarray(grads.gp_f.z)).max() > 0


def test_padded_sequences_do_not_affect_loss(batch, rng):
    """Zero-weighted (padding) sequences must contribute nothing: the
    loss is invariant to their content."""
    model = make_model()
    params = model.init(jax.random.PRNGKey(0))
    u, y = batch
    w = jnp.asarray([1.0, 0.0])
    key = jax.random.PRNGKey(5)
    u2 = np.array(u)
    y2 = np.array(y)
    u2[1] = rng.normal(size=u2[1].shape) * 100
    y2[1] = rng.normal(size=y2[1].shape) * 100
    l1, _ = model.loss(params, u, y, key, weights=w)
    l2, _ = model.loss(params, u2, y2, key, weights=w)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-10)


def test_predict_shapes(batch):
    model = make_model()
    params = model.init(jax.random.PRNGKey(0))
    u, y = batch
    out = model.predict(params, u, y, jax.random.PRNGKey(0), condition=False)
    assert out.pred_mean.shape == (2, 8, 1)
    assert out.pred_var.shape == (2, 8, 1)
    assert out.internal_mean.shape == (2, 8, 3)
    assert np.isfinite(np.asarray(out.pred_mean)).all()
    assert (np.asarray(out.pred_var) > 0).all()
    assert np.isfinite(float(out.mse))


def test_gp_impl_pallas_config_matches(batch):
    """gp_impl='pallas' must produce the same loss (on CPU the fused
    path falls back to identical jnp math through the custom VJP)."""
    u, y = batch
    key = jax.random.PRNGKey(11)
    m1 = make_model()
    p1 = m1.init(jax.random.PRNGKey(0))
    l1, _ = m1.loss(p1, u, y, key)
    import dataclasses

    m2 = make_model()
    m2.config = dataclasses.replace(m2.config, gp_impl="pallas")
    l2, _ = m2.loss(p1, u, y, key)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-10)


def test_var_dict_keys(batch):
    model = make_model()
    params = model.init(jax.random.PRNGKey(0))
    vd = model.var_dict(params)
    expected = {
        "process noise",
        "observation noise",
        "kernel lengthscales f",
        "kernel variance f",
        "IP pos f",
        "IP mean f",
        "IP var f",
        "kernel lengthscales b",
        "kernel variance b",
        "IP pos b",
        "IP mean b",
        "IP var b",
    }
    assert set(vd) == expected

"""CBFSSMHALF and PRSSM ELBOs validated against independent
per-timestep Python reimplementations (reference cbfssmhalf.py /
prssm.py semantics) sharing each model's RNG derivation. Uses the
parameter-free 'output' recognition so the initial state is exactly
reproducible."""

import jax
import jax.numpy as jnp
import numpy as np

from cbfssm_tpu.models import CBFSSMHALF, PRSSM
from cbfssm_tpu.ops import gp, transforms
from tests.test_other_models import half_config, prssm_config


def _rollout_common(model, params, u, y, eps_f):
    """Shared pieces: constrained noises + x0 from 'output' recognition."""
    b, t_len = u.shape[0], u.shape[1]
    s, dx, dy = model.samples, model.dim_x, model.dim_y
    var_x = np.asarray(transforms.positive(params.var_x_unc))
    var_y = np.asarray(transforms.positive(params.var_y_unc))
    x0 = np.concatenate((y[:, 0, :], np.zeros((b, dx - dy))), axis=1)
    x0 = np.broadcast_to(x0[:, None, :], (b, s, dx))
    return var_x, var_y, x0


def reference_half_loss(model, params, u, y, key, condition):
    cfg = model.config
    b, t_len = u.shape[0], u.shape[1]
    s, dx, dy = model.samples, model.dim_x, model.dim_y
    jitter = model.jitter
    eps_f = np.asarray(
        jax.random.normal(key, (t_len - 1, b, s, 1), dtype=jnp.float64)
    )
    var_x, var_y, x = _rollout_common(model, params, u, y, eps_f)
    u_tm = np.transpose(u, (1, 0, 2))
    y_tm = np.transpose(y, (1, 0, 2))

    xs = [x]
    kl_x = np.zeros(b)
    for t in range(t_len - 1):
        gp_in = np.concatenate(
            (x, np.broadcast_to(u_tm[t][:, None, :], (b, s, model.dim_u))), axis=-1
        ).reshape(b * s, -1)
        fmean, fvar = gp.predict_reference(params.gp_f, jnp.asarray(gp_in), jitter)
        fmean = np.asarray(fmean).reshape(b, s, dx) + x
        fvar = np.asarray(fvar).reshape(b, s, dx) + var_x

        fvar_o = fvar[..., :dy]
        var_y_t = var_y + (cfg.k_factor - 1.0) * fvar_o
        gain = fvar_o / (var_y_t + fvar_o)
        y_next = np.broadcast_to(y_tm[t + 1][:, None, :], (b, s, dy))

        def pad(a):
            return np.concatenate((a, np.zeros((b, s, dx - dy))), axis=-1)

        mu = fmean + pad(gain * (y_next - fmean[..., :dy]))
        sig = (1.0 - pad(gain)) ** 2 * fvar + pad(gain**2 * var_y_t)
        do_cond = condition or (t < cfg.recog_len - 1)
        if do_cond:
            x = mu + eps_f[t] * np.sqrt(sig)
            kl_x += 0.5 * np.sum(
                np.log(fvar) - np.log(sig) + (sig + (mu - fmean) ** 2) / fvar - 1.0,
                axis=(1, 2),
            )
        else:
            x = fmean + eps_f[t] * np.sqrt(fvar)
        xs.append(x)
    x_final = np.stack(xs)

    y_final = x_final[..., :dy]
    obs = np.broadcast_to(y_tm[:, :, None, :], y_final.shape)
    vy = var_y[:dy]
    loglik = np.sum(
        -0.5 * (np.log(2 * np.pi) + np.log(vy) + (obs - y_final) ** 2 / vy),
        axis=(0, 2, 3),
    )
    cache = gp.precompute(params.gp_f, jitter)
    kl_zf = float(gp.prior_kl(params.gp_f, cache))
    lam1 = cfg.loss_factors[0]
    elbo = lam1 * np.sum(loglik - kl_x) / s - kl_zf
    return -elbo


def reference_prssm_loss(model, params, u, y, key):
    cfg = model.config
    b, t_len = u.shape[0], u.shape[1]
    s, dx, dy = model.samples, model.dim_x, model.dim_y
    jitter = model.jitter
    eps_f = np.asarray(
        jax.random.normal(key, (t_len - 1, b, s, 1), dtype=jnp.float64)
    )
    var_x, var_y, x = _rollout_common(model, params, u, y, eps_f)
    u_tm = np.transpose(u, (1, 0, 2))
    y_tm = np.transpose(y, (1, 0, 2))

    xs = [x]
    for t in range(t_len - 1):
        gp_in = np.concatenate(
            (x, np.broadcast_to(u_tm[t][:, None, :], (b, s, model.dim_u))), axis=-1
        ).reshape(b * s, -1)
        fmean, fvar = gp.predict_reference(params.gp_f, jnp.asarray(gp_in), jitter)
        fmean = np.asarray(fmean).reshape(b, s, dx) + x
        fvar = np.asarray(fvar).reshape(b, s, dx) + var_x
        x = fmean + eps_f[t] * np.sqrt(fvar)
        xs.append(x)
    x_final = np.stack(xs)

    y_final = x_final[..., :dy]
    obs = np.broadcast_to(y_tm[:, :, None, :], y_final.shape)
    vy = var_y[:dy]
    loglik = np.sum(
        -0.5 * (np.log(2 * np.pi) + np.log(vy) + (obs - y_final) ** 2 / vy),
        axis=(0, 2, 3),
    )
    cache = gp.precompute(params.gp_f, jitter)
    kl_z = float(gp.prior_kl(params.gp_f, cache))
    # faithful: NOT divided by the particle count (prssm.py:96-97)
    elbo = cfg.loss_factors[0] * np.sum(loglik) - kl_z
    return -elbo


def test_half_matches_literal(rng):
    model = CBFSSMHALF(half_config("output"))
    params = model.init(jax.random.PRNGKey(0))
    u = rng.normal(size=(2, 9, 2))
    y = rng.normal(size=(2, 9, 1))
    key = jax.random.PRNGKey(3)
    for condition in (True, False):
        got, _ = model.loss(params, u, y, key, condition=condition)
        want = reference_half_loss(model, params, u, y, key, condition)
        np.testing.assert_allclose(float(got), want, rtol=1e-7)


def test_prssm_matches_literal(rng):
    model = PRSSM(prssm_config("output"))
    params = model.init(jax.random.PRNGKey(0))
    u = rng.normal(size=(2, 9, 2))
    y = rng.normal(size=(2, 9, 1))
    key = jax.random.PRNGKey(4)
    got, _ = model.loss(params, u, y, key)
    want = reference_prssm_loss(model, params, u, y, key)
    np.testing.assert_allclose(float(got), want, rtol=1e-7)

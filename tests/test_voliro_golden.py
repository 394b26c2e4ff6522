"""Voliro ELBO validated against an independent per-timestep Python
reimplementation (reference semantics, voliro.py:21-292) sharing the
model's RNG derivation."""

import jax
import jax.numpy as jnp
import numpy as np

from cbfssm_tpu.models import Voliro
from cbfssm_tpu.models.base import LOG_2PI_E
from cbfssm_tpu.ops import gp, transforms
from cbfssm_tpu.ops.distributions import beta_logpdf
from tests.test_other_models import voliro_batch, voliro_config

from scipy.spatial.transform import Rotation


def quat_rotate_np(v, q):
    """Rotate vectors by wxyz quaternions via scipy (independent of the
    model's quaternion algebra). Handles non-unit quaternions the same
    way as the Hamilton-product formula: q v q* scales by |q|^2."""
    flat_q = q.reshape(-1, 4)
    flat_v = v.reshape(-1, 3)
    norm2 = np.sum(flat_q**2, axis=-1, keepdims=True)
    unit = flat_q / np.sqrt(norm2)
    rot = Rotation.from_quat(np.concatenate((unit[:, 1:], unit[:, :1]), axis=1))
    return (rot.apply(flat_v) * norm2).reshape(v.shape)


def reference_voliro_loss(model, params, u, y, key):
    cfg = model.config
    b, t_len = u.shape[0], u.shape[1]
    s = model.samples
    var_x = np.asarray(transforms.positive(params.var_x_unc))
    var_y = np.asarray(transforms.positive(params.var_y_unc))
    var_z = np.asarray(transforms.positive(params.var_z_unc))
    jitter = model.jitter

    # RNG derivation mirrors Voliro._rollout
    kz, kb, kf = jax.random.split(key, 3)
    eps_z = np.asarray(jax.random.normal(kz, (b, t_len, s, 1), dtype=jnp.float64))
    eps_b = np.asarray(jax.random.normal(kb, (t_len, b, s, 1), dtype=jnp.float64))
    eps_f = np.asarray(jax.random.normal(kf, (t_len - 1, b, s, 1), dtype=jnp.float64))

    # dt
    ts = u[0, :, 12]
    dt = (ts[-1] - ts[0]) / t_len

    # local coordinates + physical model
    pwm, tilt = u[..., :6], u[..., 6:12]
    local = np.empty(u.shape[:-1] + (12,))
    local[..., 0::2] = np.sin(tilt) * pwm**2
    local[..., 1::2] = np.cos(tilt) * pwm**2
    alloc = np.zeros((6, 12))
    import math

    angles = np.asarray([0.5, -0.5, -1 / 6, 5 / 6, 1 / 6, 7 / 6]) * math.pi
    for i, ang in enumerate(angles):
        alloc[0, 2 * i] = -math.cos(ang)
        alloc[1, 2 * i] = -math.sin(ang)
        alloc[2, 2 * i + 1] = -1.0
        alloc[3, 2 * i + 1] = -0.3 * math.cos(ang)
        alloc[4, 2 * i + 1] = -0.3 * math.sin(ang)
        alloc[5, 2 * i] = -0.3
    ft_phys = np.einsum("ij,btj->bti", alloc, local) * (0.000012 * 1700.0**2)

    # force GP over all timesteps
    fm, fv = gp.predict_reference(params.gp_f, jnp.asarray(local.reshape(-1, 12)), jitter)
    fm = np.asarray(fm).reshape(b, t_len, 3) + ft_phys[..., :3]
    fv = np.asarray(fv).reshape(b, t_len, 3)
    ft_mean = np.concatenate((fm, ft_phys[..., 3:]), axis=-1)
    ft_var = np.concatenate((fv, np.zeros_like(ft_phys[..., 3:])), axis=-1) + var_z
    ft_gp = ft_mean[:, :, None, :] + eps_z * np.sqrt(ft_var[:, :, None, :])  # [B,T,S,6]

    # observed hidden projection
    yh = np.concatenate((y[..., 0:3], y[..., 12:16]), axis=-1)  # [B,T,7]

    # backward pass (single run, reverse time, residual on h, no var_x)
    h = np.zeros((b, s, 6))
    y2 = np.zeros((t_len, b, s, 6))
    ent = np.zeros(b)
    for t in range(t_len - 1, -1, -1):
        inp = np.concatenate(
            (h, ft_gp[:, t], np.broadcast_to(yh[:, t][:, None, :], (b, s, 7))), axis=-1
        )
        m, v = gp.predict_reference(params.gp_b, jnp.asarray(inp.reshape(-1, 19)), jitter)
        m = np.asarray(m).reshape(b, s, 6) + h
        v = np.asarray(v).reshape(b, s, 6)
        out = m + eps_b[t] * np.sqrt(v)
        y2[t] = out
        ent += 0.5 * np.sum(LOG_2PI_E + np.log(v), axis=(1, 2))
        h = out
    y_tilde = np.concatenate(
        (np.broadcast_to(yh.transpose(1, 0, 2)[:, :, None, :], (t_len, b, s, 7)), y2),
        axis=-1,
    )

    # forward pass: symplectic euler + always-on conditioning
    mass_inv = 1.0 / 4.04
    inertia_inv = 1.0 / np.asarray([0.078359127, 0.081797886, 0.1533554115])
    grav = np.asarray([0.0, 0.0, 9.81])
    x = y_tilde[0]
    xs = [x]
    kl_x = np.zeros(b)
    for t in range(t_len - 1):
        ft = ft_gp[:, t]
        pos, rot = x[..., 0:3], x[..., 3:7]
        linvel, angvel = x[..., 7:10], x[..., 10:13]
        f_glob = quat_rotate_np(ft[..., :3], rot)
        t_glob = quat_rotate_np(inertia_inv * ft[..., 3:], rot)
        linvel = linvel + (mass_inv * f_glob + grav) * dt
        angvel = angvel + t_glob * dt
        # quaternion derivative 0.5 * (0, angvel) x rot
        aw = np.zeros_like(angvel[..., :1])
        av = np.concatenate((aw, angvel), axis=-1)
        qw = av[..., 0] * rot[..., 0] - np.sum(av[..., 1:] * rot[..., 1:], axis=-1)
        qv = (
            av[..., :1] * rot[..., 1:]
            + rot[..., :1] * av[..., 1:]
            + np.cross(av[..., 1:], rot[..., 1:])
        )
        rot_diff = 0.5 * np.concatenate((qw[..., None], qv), axis=-1)
        pos = pos + linvel * dt
        rot = rot + rot_diff * dt
        rot = rot / np.linalg.norm(rot, axis=-1, keepdims=True)
        fmean = np.concatenate((pos, rot, linvel, angvel), axis=-1)
        fvar = np.broadcast_to(var_x, fmean.shape)

        gain = fvar / (var_y + fvar)
        mu = fmean + gain * (y_tilde[t + 1] - fmean)
        sig = (1 - gain) ** 2 * fvar + gain**2 * var_y
        x = mu + eps_f[t] * np.sqrt(sig)
        xs.append(x)
        kl_x += 0.5 * np.sum(
            np.log(fvar) - np.log(sig) + (sig + (mu - fmean) ** 2) / fvar - 1.0,
            axis=(1, 2),
        )
    x_final = np.stack(xs)

    # ELBO
    y_final = x_final[..., :7]
    obs = np.broadcast_to(yh.transpose(1, 0, 2)[:, :, None, :], y_final.shape)
    vy7 = var_y[:7]
    loglik = np.sum(
        -0.5 * (np.log(2 * np.pi) + np.log(vy7) + (obs - y_final) ** 2 / vy7),
        axis=(0, 2, 3),
    )
    cache_f = gp.precompute(params.gp_f, jitter)
    cache_b = gp.precompute(params.gp_b, jitter)
    kl_zf = float(gp.prior_kl(params.gp_f, cache_f))
    kl_zb = float(gp.prior_kl(params.gp_b, cache_b))
    n_a, n_b, n_scale = cfg.n_beta
    l_a, l_b, l_scale = cfg.l_beta
    n_reg = float(np.sum(np.asarray(beta_logpdf(jnp.asarray(var_z / n_scale), n_a, n_b))))
    l_reg = float(
        np.sum(np.asarray(beta_logpdf(params.gp_f.kern_len / l_scale, l_a, l_b)))
    )
    lam = cfg.loglik_factor
    elbo = (
        np.sum(lam[0] * (loglik - kl_x) + lam[1] * ent) / s
        + lam[2] * (n_reg + l_reg)
        - kl_zf
        - kl_zb
    )
    return -elbo


def test_voliro_loss_matches_literal_reimplementation(rng):
    model = Voliro(voliro_config())
    params = model.init(jax.random.PRNGKey(0))
    u, y = voliro_batch(rng, b=2, t=6)
    key = jax.random.PRNGKey(9)
    got, _ = model.loss(params, u, y, key)
    want = reference_voliro_loss(model, params, u, y, key)
    np.testing.assert_allclose(float(got), want, rtol=1e-7)

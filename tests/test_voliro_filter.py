"""Voliro ONLINE state estimation (the causal deployment filter).

The training-time conditioning target is the backward smoother's
y_tilde (future observations — not computable online), so the serving
filter is the CAUSAL counterpart: the exact training transition
(allocation matrix -> force GP -> symplectic Euler) with Kalman-style
conditioning restricted to the observed pos+quat dims. Pinned here
against an independent numpy reference (triangular-solve GP, scipy
quaternion rotation, hand-written Euler + conditioning), plus the full
serving stack: StreamingFilter / replay / FilterPool / export.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbfssm_tpu.models.voliro import Voliro
from cbfssm_tpu.ops import gp, transforms
from cbfssm_tpu.serving import FilterPool, StreamingFilter
from tests.test_other_models import voliro_batch, voliro_config
from tests.test_voliro_golden import quat_rotate_np

DT = 0.01
RECOG = 3


@pytest.fixture(scope="module")
def setup():
    cfg = voliro_config()
    cfg["filter_dt"] = DT
    cfg["recog_len"] = RECOG
    model = Voliro(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    u, y = voliro_batch(rng, b=2, t=20)
    return model, params, u, y


def _numpy_filter_step(model, params, x, u_prev, y_new, eps_ft, eps_x):
    """Independent per-step reference: triangular-solve GP, scipy
    quaternion rotation, hand-written Euler + observed-dims
    conditioning."""
    var_x = np.asarray(transforms.positive(params.var_x_unc))
    var_y = np.asarray(transforms.positive(params.var_y_unc))
    var_z = np.asarray(transforms.positive(params.var_z_unc))
    b, s = x.shape[0], x.shape[1]

    # local rotor coordinates + allocation force (independent layout)
    pwm, tilt = u_prev[..., :6], u_prev[..., 6:12]
    local = np.empty(u_prev.shape[:-1] + (12,))
    local[..., 0::2] = np.sin(tilt) * pwm**2
    local[..., 1::2] = np.cos(tilt) * pwm**2
    ft_phys = (
        np.einsum("ij,bj->bi", np.asarray(model.alloc), local)
        * (0.000012 * 1700.0**2)
    )
    fm, fv = gp.predict_reference(
        params.gp_f, jnp.asarray(local), model.jitter
    )
    ft_mean = np.concatenate((np.asarray(fm) + ft_phys[:, :3], ft_phys[:, 3:]),
                             axis=-1)
    ft_var = np.concatenate(
        (np.asarray(fv), np.zeros((b, 3))), axis=-1
    ) + var_z
    ft = ft_mean[:, None, :] + eps_ft * np.sqrt(ft_var[:, None, :])

    # symplectic euler (hand-written, scipy rotation)
    mass_inv = 1.0 / 4.04
    inertia_inv = 1.0 / np.asarray([0.078359127, 0.081797886, 0.1533554115])
    grav = np.asarray([0.0, 0.0, 9.81])
    pos, rot = x[..., 0:3], x[..., 3:7]
    linvel, angvel = x[..., 7:10], x[..., 10:13]
    f_glob = quat_rotate_np(ft[..., :3], rot)
    t_glob = quat_rotate_np(inertia_inv * ft[..., 3:], rot)
    linvel = linvel + (mass_inv * f_glob + grav) * DT
    angvel = angvel + t_glob * DT
    aw = np.zeros_like(angvel[..., :1])
    av = np.concatenate((aw, angvel), axis=-1)
    qw = av[..., 0] * rot[..., 0] - np.sum(av[..., 1:] * rot[..., 1:], axis=-1)
    qv = (
        av[..., :1] * rot[..., 1:]
        + rot[..., :1] * av[..., 1:]
        + np.cross(av[..., 1:], rot[..., 1:])
    )
    rot_diff = 0.5 * np.concatenate((qw[..., None], qv), axis=-1)
    pos = pos + linvel * DT
    rot = rot + rot_diff * DT
    rot = rot / np.linalg.norm(rot, axis=-1, keepdims=True)
    fmean = np.concatenate((pos, rot, linvel, angvel), axis=-1)
    fvar = np.broadcast_to(var_x, fmean.shape)

    # conditioning on pos+quat only, zero gain on velocities
    yh = np.concatenate((y_new[..., 0:3], y_new[..., 12:16]), axis=-1)
    y_bs = np.broadcast_to(yh[:, None, :], (b, s, 7))
    gain = np.zeros_like(fvar)
    gain[..., :7] = fvar[..., :7] / (var_y[:7] + fvar[..., :7])
    innov = np.zeros_like(fmean)
    innov[..., :7] = y_bs - fmean[..., :7]
    var_y_pad = np.zeros(13)
    var_y_pad[:7] = var_y[:7]
    mu = fmean + gain * innov
    sig = (1.0 - gain) ** 2 * fvar + gain**2 * var_y_pad
    x_next = mu + eps_x * np.sqrt(sig)

    y_part = x_next[..., :7]
    mean = y_part.mean(axis=1)
    var = ((y_part - mean[:, None, :]) ** 2).mean(axis=1) + var_y[:7]
    return x_next, mean, var


def test_filter_step_matches_numpy_reference(setup):
    model, params, u, y = setup
    ops = jax.jit(model.filter_ops)(params)
    x = np.asarray(model.filter_init(params, u[:, :RECOG], y[:, :RECOG]))
    rng = np.random.default_rng(3)
    for t in range(RECOG, RECOG + 3):
        eps_ft = rng.normal(size=(2, model.samples, 1))
        eps_x = rng.normal(size=(2, model.samples, 1))
        x_got, (m_got, v_got) = model.filter_step(
            params, ops, jnp.asarray(x), u[:, t - 1], y[:, t],
            key=None, eps=(jnp.asarray(eps_ft), jnp.asarray(eps_x)),
        )
        x_want, m_want, v_want = _numpy_filter_step(
            model, params, x, u[:, t - 1], y[:, t], eps_ft, eps_x
        )
        np.testing.assert_allclose(np.asarray(x_got), x_want, rtol=1e-7,
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(m_got), m_want, rtol=1e-7,
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(v_got), v_want, rtol=1e-7,
                                   atol=1e-9)
        x = x_want  # resync so GP-path tolerance cannot compound


def test_filter_init_recovers_velocities(setup):
    """Constant linear velocity and a small constant rotation rate are
    recovered by the finite-difference init (small-angle inversion of
    the integrator's quaternion update)."""
    model, params, _, _ = setup
    v_true = np.asarray([0.4, -0.2, 0.1])
    w_true = np.asarray([0.3, -0.5, 0.2])
    t = np.arange(RECOG) * DT
    pos = t[:, None] * v_true
    # integrate the quaternion exactly as symplectic_euler does
    q = np.zeros((RECOG, 4))
    q[0] = [1.0, 0, 0, 0]
    for i in range(1, RECOG):
        av = np.concatenate(([0.0], w_true))
        rot = q[i - 1]
        qw = av[0] * rot[0] - np.dot(av[1:], rot[1:])
        qv = av[0] * rot[1:] + rot[0] * av[1:] + np.cross(av[1:], rot[1:])
        dq = 0.5 * np.concatenate(([qw], qv))
        qn = rot + dq * DT
        q[i] = qn / np.linalg.norm(qn)
    y_prefix = np.zeros((1, RECOG, 22))
    y_prefix[0, :, 0:3] = pos
    y_prefix[0, :, 12:16] = q
    x0 = np.asarray(model.filter_init(params, None, y_prefix))
    assert x0.shape == (1, model.samples, 13)
    np.testing.assert_allclose(x0[0, 0, 0:3], pos[-1], atol=1e-12)
    np.testing.assert_allclose(x0[0, 0, 3:7], q[-1], atol=1e-12)
    np.testing.assert_allclose(x0[0, 0, 7:10], v_true, atol=1e-9)
    # small-angle inversion: O((w dt)^2) error
    np.testing.assert_allclose(x0[0, 0, 10:13], w_true, atol=1e-4)


def test_forecast_matches_manual_chain(setup):
    """forecast == the same per-step physics chain driven by hand with
    the identical key derivation (split -> shared eps), no
    conditioning, ensemble not advanced."""
    model, params, u, y = setup
    ops = jax.jit(model.filter_ops)(params)
    x = model.filter_init(params, u[:, :RECOG], y[:, :RECOG])
    key = jax.random.PRNGKey(11)
    h = 4
    u_future = u[:, RECOG:RECOG + h]
    mean, var = model.forecast(params, ops, x, jnp.asarray(u_future), key)
    assert mean.shape == (2, h, 7) and float(jnp.min(var)) > 0

    kf, kx = jax.random.split(key)
    b, s = 2, model.samples
    eps_ft = np.asarray(jax.random.normal(kf, (h, b, s, 1), dtype=jnp.float64))
    eps_x = np.asarray(jax.random.normal(kx, (h, b, s, 1), dtype=jnp.float64))
    var_x = np.asarray(transforms.positive(params.var_x_unc))
    xc = np.asarray(x)
    means = []
    for t in range(h):
        up = np.asarray(u_future[:, t])
        pwm, tilt = up[..., :6], up[..., 6:12]
        local = np.empty(up.shape[:-1] + (12,))
        local[..., 0::2] = np.sin(tilt) * pwm**2
        local[..., 1::2] = np.cos(tilt) * pwm**2
        ft_phys = (
            np.einsum("ij,bj->bi", np.asarray(model.alloc), local)
            * (0.000012 * 1700.0**2)
        )
        fm, fv = gp.predict_reference(params.gp_f, jnp.asarray(local),
                                      model.jitter)
        ft_mean = np.concatenate(
            (np.asarray(fm) + ft_phys[:, :3], ft_phys[:, 3:]), axis=-1)
        ft_var = np.concatenate(
            (np.asarray(fv), np.zeros((b, 3))), axis=-1
        ) + np.asarray(transforms.positive(params.var_z_unc))
        ft = ft_mean[:, None, :] + eps_ft[t] * np.sqrt(ft_var[:, None, :])
        mass_inv = 1.0 / 4.04
        inertia_inv = 1.0 / np.asarray(
            [0.078359127, 0.081797886, 0.1533554115])
        grav = np.asarray([0.0, 0.0, 9.81])
        pos, rot = xc[..., 0:3], xc[..., 3:7]
        linvel, angvel = xc[..., 7:10], xc[..., 10:13]
        f_glob = quat_rotate_np(ft[..., :3], rot)
        t_glob = quat_rotate_np(inertia_inv * ft[..., 3:], rot)
        linvel = linvel + (mass_inv * f_glob + grav) * DT
        angvel = angvel + t_glob * DT
        av = np.concatenate((np.zeros_like(angvel[..., :1]), angvel), axis=-1)
        qw = av[..., 0] * rot[..., 0] - np.sum(av[..., 1:] * rot[..., 1:],
                                               axis=-1)
        qv = (av[..., :1] * rot[..., 1:] + rot[..., :1] * av[..., 1:]
              + np.cross(av[..., 1:], rot[..., 1:]))
        rot_diff = 0.5 * np.concatenate((qw[..., None], qv), axis=-1)
        pos = pos + linvel * DT
        rot = rot + rot_diff * DT
        rot = rot / np.linalg.norm(rot, axis=-1, keepdims=True)
        fmean = np.concatenate((pos, rot, linvel, angvel), axis=-1)
        xc = fmean + eps_x[t] * np.sqrt(np.broadcast_to(var_x, fmean.shape))
        means.append(xc[..., :7].mean(axis=1))
    np.testing.assert_allclose(
        np.asarray(mean), np.stack(means, axis=1), rtol=1e-7, atol=1e-9
    )
    # purity: ensemble not advanced, same inputs -> same outputs
    mean2, _ = model.forecast(params, ops, x, jnp.asarray(u_future), key)
    np.testing.assert_array_equal(np.asarray(mean), np.asarray(mean2))


def test_voliro_streaming_stack(setup):
    """End-to-end through the generic serving stack: StreamingFilter
    start/update/forecast, fused replay pinned to sequential, pool."""
    model, params, u, y = setup
    f = StreamingFilter(model, params, batch=2)
    f.start(u[:, :RECOG], y[:, :RECOG])
    ms = []
    for t in range(RECOG, 10):
        m, v = f.update(u[:, t - 1], y[:, t])
        assert m.shape == (2, 7) and float(np.min(np.asarray(v))) > 0
        ms.append(np.asarray(m))
    fm, _ = f.forecast(u[:, 10:14])
    assert fm.shape == (2, 4, 7) and np.isfinite(np.asarray(fm)).all()

    g = StreamingFilter(model, params, batch=2, replay_buckets=(4,))
    g.start(u[:, :RECOG], y[:, :RECOG])
    gm, _ = g.replay(u[:, RECOG - 1:9], y[:, RECOG:10])
    np.testing.assert_allclose(
        np.asarray(gm), np.stack(ms, axis=1), rtol=1e-12, atol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(g.state[0]), np.asarray(f.state[0]),
        rtol=1e-12, atol=1e-14,
    )

    pool = FilterPool(model, params, capacity=2)
    a = pool.attach(u[0, :RECOG], y[0, :RECOG])
    out = pool.step({a: (u[0, RECOG - 1], y[0, RECOG])})
    assert out[a][0].shape == (7,)


def test_voliro_filter_guards(setup):
    model, params, u, y = setup
    cfg = voliro_config()  # no filter_dt
    m2 = Voliro(cfg)
    with pytest.raises(ValueError, match="filter_dt"):
        StreamingFilter(m2, params)
    cfg = voliro_config()
    cfg["filter_dt"] = -1.0
    with pytest.raises(ValueError, match="positive"):
        StreamingFilter(Voliro(cfg), params)
    with pytest.raises(ValueError, match=">= 2"):
        model.filter_init(params, u[:, :1], y[:, :1])


def test_voliro_filter_exports(setup, tmp_path):
    """The Voliro online estimator ships as a framework-free artifact
    with fused replay, lockstep with the in-framework filter."""
    from cbfssm_tpu.export import ExportedFilter, save_exported_filter

    model, params, u, y = setup
    path = str(tmp_path / "voliro_filter")
    meta = save_exported_filter(
        path, model, params, batch=2, horizons=(4,),
        replay_buckets=(4,), platforms=("cpu",),
    )
    assert meta["model_class"] == "Voliro"
    served = ExportedFilter(path)
    ref = StreamingFilter(model, params, batch=2, seed=0)
    served.start(u[:, :RECOG], y[:, :RECOG])
    ref.start(u[:, :RECOG], y[:, :RECOG])
    for t in range(RECOG, RECOG + 3):
        m_s, v_s = served.update(u[:, t - 1], y[:, t])
        m_r, v_r = ref.update(u[:, t - 1], y[:, t])
        np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_r),
                                   rtol=1e-12, atol=1e-13)
        np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_r),
                                   rtol=1e-12, atol=1e-13)
    m_f, _ = served.forecast(u[:, 8:12])
    m_rf, _ = ref.forecast(u[:, 8:12])
    np.testing.assert_allclose(np.asarray(m_f), np.asarray(m_rf),
                               rtol=1e-12, atol=1e-13)
    # fused replay through the artifact
    m_blk, _ = served.replay(u[:, RECOG + 2:RECOG + 5],
                             y[:, RECOG + 3:RECOG + 6])
    for i, t in enumerate(range(RECOG + 3, RECOG + 6)):
        m_seq, _ = ref.update(u[:, t - 1], y[:, t])
        np.testing.assert_allclose(m_blk[:, i], np.asarray(m_seq),
                                   rtol=1e-11, atol=1e-12)

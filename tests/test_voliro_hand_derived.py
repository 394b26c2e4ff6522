"""An independent Voliro ELBO cross-check worked out from the paper
(arXiv:1907.07035 sec. 5.3), the rigid-body equations, and the reference
formulas (cbfssm/model/voliro.py:244-338) — NOT derived from the
library's ops or from the golden test's literal reimplementation
(tests/test_voliro_golden.py), which shares a reading of the code with
the library. Everything below is explicit scalar / 2x2 numpy written
from the math (the CBFSSM counterpart is tests/test_elbo_hand_derived.py):

  * sparse-GP predictive + prior KL: same closed forms as the CBFSSM
    hand derivation (GPflow conditional / paper eq. 5), re-stated here
    in explicit-solve numpy;
  * control mapping (voliro.py:88-95): 12 local rotor coordinates
    (sin tilt_k, cos tilt_k) * pwm_k^2, interleaved per rotor;
  * allocation matrix: constructed per-rotor from the hexacopter
    geometry (6 arms, azimuth list psi = [90, -90, -30, 150, 30, 210]
    deg, arm length 0.3 m, z-down body frame). Independent geometric
    check performed here: with arm azimuths theta = psi + 90 deg, the
    cos-tilt column is pure vertical thrust F = (0,0,-1) with lever-arm
    torque r x F = (-L cos psi, -L sin psi, 0), and the sin-tilt column
    is the tangential lateral thrust F = (-cos psi, -sin psi, 0) — both
    EXACTLY the reference's entries (voliro.py:295-312). The one entry
    not derivable from thrust lever arms alone is the sin-column yaw
    torque's sign (pure r x F gives +L; the platform convention is -L,
    i.e. the tilt-angle sign is defined against the tangent direction);
    the reference matrix is normative for that sign and the test
    asserts the geometric invariants around it (unit horizontal force,
    zero net force/torque over the symmetric rotor set);
  * rigid-body symplectic-Euler step (voliro.py:314-338): velocity
    updates from body-frame force/torque rotated to world frame —
    quaternion rotation written here as the HOMOGENEOUS rotation matrix
    R(q) (valid for non-unit q, equal to q (0,v) q*), a genuinely
    independent formulation of the library's Hamilton-product chain;
    position from the UPDATED velocity (symplectic), quaternion update
    q <- normalize(q + 0.5 (0, omega) x q dt);
  * single-run backward conditioning GP on [h(6), ft_gp(6), y(7)] with
    residual connection on h and NO process noise added
    (voliro.py:139-186), entropy of the written samples;
  * always-on Kalman-style conditioning update with per-step KL
    (voliro.py:211-242) — no k-factor in the Voliro model;
  * Beta priors on GP noise and force-GP lengthscales
    (voliro.py:262-271), KL( N(m, diag v) || N(0, K) ) in closed form,
  * ELBO assembly (voliro.py:244-292):
      elbo = (lam0 (loglik - kl_x) + lam1 entropy) / S
             + lam2 (n_reg + l_reg) - KL(zeta_f) - KL(zeta_b)

The ONLY thing taken from the implementation is the RNG protocol (which
jax.random keys produce which eps arrays) — the draws are extracted by
replaying the documented key splits with jax.random directly, never by
calling model internals.

The final loss is also pinned as a hard constant so that a future change
to both the library and this derivation cannot drift together silently
(jax's threefry PRNG is stable by design).
"""

import math

import numpy as np

import jax
import jax.numpy as jnp

from cbfssm_tpu.models import Voliro
from cbfssm_tpu.models.voliro import VoliroParams
from cbfssm_tpu.ops.gp import SparseGPParams

JITTER = 1e-8  # f64 jitter, reference gp_tf.py:53
LOG_2PI = np.log(2.0 * np.pi)
M = 2  # inducing points
T = 3
ARM = 0.3  # m
MASS = 4.04  # kg
INERTIA = np.asarray([0.078359127, 0.081797886, 0.1533554115])
GRAVITY = np.asarray([0.0, 0.0, 9.81])
POST_SCALE = 0.000012 * 1700.0**2  # rotor force constant * max speed^2
PSI = np.asarray([0.5, -0.5, -1.0 / 6.0, 5.0 / 6.0, 1.0 / 6.0, 7.0 / 6.0]) * math.pi


def softplus(x):
    """Constrained = softplus(unconstrained) + 1e-10 (tf_transform.py:19)."""
    return np.logaddexp(np.asarray(x, dtype=np.float64), 0.0) + 1e-10


def rbf(a, b, kvar, ls):
    """ARD RBF Gram: kvar * exp(-0.5 ||(a - b)/ls||^2) (gp_tf.py:33-49)."""
    d = (a[:, None, :] - b[None, :, :]) / ls
    return kvar * np.exp(-0.5 * np.sum(d * d, axis=-1))


class HandGP:
    """Explicit-solve sparse-GP predictive + prior KL (2x2 linear algebra
    via np.linalg only)."""

    def __init__(self, z, mean, v, kvar, ls):
        self.z, self.mean, self.v, self.kvar, self.ls = z, mean, v, kvar, ls
        self.K = rbf(z, z, kvar, ls) + JITTER * np.eye(M)

    def predict(self, x):
        kx = rbf(x[None, :], self.z, self.kvar, self.ls)[0]  # [M]
        w = np.linalg.solve(self.K, kx)  # K^-1 k_x
        mean = w @ self.mean  # [D]
        var = np.maximum(self.kvar - kx @ w, 0.0) + (w * w) @ self.v  # [D]
        return mean, var

    def prior_kl(self):
        """KL( N(m_d, diag v_d) || N(0, K) ) summed over output dims."""
        kinv = np.linalg.inv(self.K)
        sign, logdet = np.linalg.slogdet(self.K)
        assert sign > 0
        total = 0.0
        for d in range(self.mean.shape[1]):
            m_d, v_d = self.mean[:, d], self.v[:, d]
            total += 0.5 * (
                np.trace(kinv @ np.diag(v_d))
                + m_d @ kinv @ m_d
                - M
                + logdet
                - np.sum(np.log(v_d))
            )
        return total


# --- geometry / physics, written from the equations ---------------------


def hand_allocation():
    """Per-rotor column construction from the hexacopter geometry (see
    module docstring). Rows [fx, fy, fz, tx, ty, tz]; columns alternate
    (sin-tilt, cos-tilt) per rotor."""
    cols = []
    for psi in PSI:
        # tangential lateral thrust of a rotor tilted about its arm
        # (arm azimuth theta = psi + 90 deg): unit force along the
        # negative tangent; yaw torque -L by the platform's tilt-sign
        # convention (normative: reference voliro.py:295-312)
        sin_col = np.asarray(
            [-math.cos(psi), -math.sin(psi), 0.0, 0.0, 0.0, -ARM]
        )
        # vertical thrust: unit force -z; lever-arm torque
        # r x F = L (cos theta, sin theta, 0) x (0, 0, -1)
        #       = (-L sin theta, L cos theta, 0)
        #       = (-L cos psi, -L sin psi, 0)  [theta = psi + 90 deg]
        cos_col = np.asarray(
            [0.0, 0.0, -1.0, -ARM * math.cos(psi), -ARM * math.sin(psi), 0.0]
        )
        cols.extend([sin_col, cos_col])
    return np.stack(cols, axis=1)  # [6, 12]


def quat_mul(a, b):
    """Hamilton product, scalar-first [w, x, y, z]."""
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.asarray(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ]
    )


def quat_rotate(v, q):
    """q (0, v) q* via the HOMOGENEOUS rotation matrix (exact for
    non-unit q — scales by |q|^2; independent of the library's
    Hamilton-product chain)."""
    w, x, y, z = q
    r = np.asarray(
        [
            [w * w + x * x - y * y - z * z, 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), w * w - x * x + y * y - z * z, 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), w * w - x * x - y * y + z * z],
        ]
    )
    return r @ v


def symplectic_euler(x, ft, dt):
    """One rigid-body step (voliro.py:314-338): x = [pos(3), quat(4),
    linvel(3), angvel(3)], ft = [force(3), torque(3)] body-frame."""
    pos, rot, linvel, angvel = x[0:3], x[3:7], x[7:10], x[10:13]
    f_glob = quat_rotate(ft[:3], rot)
    t_glob = quat_rotate(ft[3:] / INERTIA, rot)
    linvel = linvel + (f_glob / MASS + GRAVITY) * dt  # velocity first
    angvel = angvel + t_glob * dt
    pos = pos + linvel * dt  # position from UPDATED velocity (symplectic)
    rot_diff = 0.5 * quat_mul(np.concatenate(([0.0], angvel)), rot)
    rot = rot + rot_diff * dt
    rot = rot / np.linalg.norm(rot)
    return np.concatenate((pos, rot, linvel, angvel))


def local_coordinates(u_t):
    """[pwm(6), tilt(6)] -> interleaved (sin tilt_k, cos tilt_k) * pwm_k^2
    (voliro.py:88-95)."""
    pwm, tilt = u_t[:6], u_t[6:12]
    out = np.empty(12)
    out[0::2] = np.sin(tilt) * pwm**2
    out[1::2] = np.cos(tilt) * pwm**2
    return out


def beta_logpdf(x, a, b):
    """log Beta(x | a, b) = (a-1) log x + (b-1) log(1-x) - log B(a, b)."""
    from scipy.special import betaln

    return (a - 1.0) * np.log(x) + (b - 1.0) * np.log1p(-x) - betaln(a, b)


# --- the case -----------------------------------------------------------


def build_case():
    """T=3, B=1, S=1, M=2. Fixed physical dims: x(13), y_hidden(7),
    force GP 12 -> 3, backward GP 19 -> 6."""

    class _DS:
        dim_u = 13
        dim_y = 22

    config = {
        "ds": _DS,
        "batch_size": 1,
        "shuffle": 1,
        "ind_pnt_num": M,
        "samples": 1,
        "learning_rate": 0.01,
        "loglik_factor": np.asarray([1.3, 0.7, 0.9]),
        "n_beta": [10.0, 2.0, 1.0],
        "l_beta": [1.5, 10.0, 10.0],
        "zeta_pos": 2.0,
        "zeta_mean": 0.05**2,
        "zeta_var": 0.01**2,
        "gp_var": 0.5**2,
        "gp_len": 5.0,
        "var_x": np.asarray([0.02] * 7 + [0.2] * 6) ** 2,
        "var_y": np.asarray([0.02] * 7 + [0.2] * 6) ** 2,
        "var_z": np.asarray([0.02] * 6),
        "dtype": "float64",
    }
    # Plain unconstrained numbers (seeded numpy, never jax): pinned by
    # the hard loss constant below.
    r = np.random.default_rng(12345)
    raw = dict(
        z_f=r.normal(size=(M, 12)) * 0.5,
        mean_f=r.normal(size=(M, 3)) * 0.2,
        var_unc_f=r.normal(size=(M, 3)) - 3.0,
        kern_var_unc_f=-0.5,
        kern_len_unc_f=r.normal(size=(12,)) * 0.2 + 0.3,
        z_b=r.normal(size=(M, 19)) * 0.5,
        mean_b=r.normal(size=(M, 6)) * 0.2,
        var_unc_b=r.normal(size=(M, 6)) - 3.0,
        kern_var_unc_b=-1.0,
        kern_len_unc_b=r.normal(size=(19,)) * 0.2 + 0.2,
        var_x_unc=r.normal(size=(13,)) - 3.5,
        var_y_unc=r.normal(size=(13,)) - 2.0,
        var_z_unc=r.normal(size=(6,)) - 3.0,
    )
    f64 = lambda a: jnp.asarray(a, dtype=jnp.float64)  # noqa: E731
    params = VoliroParams(
        gp_f=SparseGPParams(
            z=f64(raw["z_f"]),
            mean=f64(raw["mean_f"]),
            var_unc=f64(raw["var_unc_f"]),
            kern_var_unc=f64(raw["kern_var_unc_f"]),
            kern_len_unc=f64(raw["kern_len_unc_f"]),
        ),
        gp_b=SparseGPParams(
            z=f64(raw["z_b"]),
            mean=f64(raw["mean_b"]),
            var_unc=f64(raw["var_unc_b"]),
            kern_var_unc=f64(raw["kern_var_unc_b"]),
            kern_len_unc=f64(raw["kern_len_unc_b"]),
        ),
        var_x_unc=f64(raw["var_x_unc"]),
        var_y_unc=f64(raw["var_y_unc"]),
        var_z_unc=f64(raw["var_z_unc"]),
    )
    # u: [1, T, 13] = pwm(6) in (0.3, 0.9), tilt(6) in (-0.5, 0.5),
    # time channel at 50 Hz
    pwm = r.uniform(0.3, 0.9, size=(T, 6))
    tilt = r.uniform(-0.5, 0.5, size=(T, 6))
    ts = (np.arange(T) * 0.02)[:, None]
    u = np.concatenate((pwm, tilt, ts), axis=-1)[None]
    # y: [1, T, 22]; the model reads pos = y[..., 0:3] and quat =
    # y[..., 12:16] (kept non-unit on purpose: exercises the
    # homogeneous-rotation formula for raw observed quaternions)
    y = r.normal(size=(1, T, 22)) * 0.1
    y[0, :, 12:16] += np.asarray([1.0, 0.0, 0.0, 0.0])  # near-identity
    return config, params, raw, u, y


def hand_elbo(raw, config, u, y, eps_z, eps_b, eps_f):
    """The full derivation, scalars/1-D only. eps_z, eps_b: [T] (one
    shared draw per timestep broadcast over dims), eps_f: [T-1]."""
    lam0, lam1, lam2 = config["loglik_factor"]
    n_a, n_b, n_scale = config["n_beta"]
    l_a, l_b, l_scale = config["l_beta"]
    var_x = softplus(raw["var_x_unc"])  # [13]
    var_y = softplus(raw["var_y_unc"])  # [13]
    var_z = softplus(raw["var_z_unc"])  # [6]
    gp_f = HandGP(
        raw["z_f"], raw["mean_f"], softplus(raw["var_unc_f"]),
        softplus(raw["kern_var_unc_f"]), softplus(raw["kern_len_unc_f"]),
    )
    gp_b = HandGP(
        raw["z_b"], raw["mean_b"], softplus(raw["var_unc_b"]),
        softplus(raw["kern_var_unc_b"]), softplus(raw["kern_len_unc_b"]),
    )
    u, y = u[0], y[0]  # [T, 13], [T, 22]
    yh = np.concatenate((y[:, 0:3], y[:, 12:16]), axis=-1)  # [T, 7]
    dt = (u[-1, 12] - u[0, 12]) / T  # voliro.py:44-45
    alloc = hand_allocation()

    # ---- force GP over all timesteps (voliro.py:106-123) ----
    ft_gp = np.empty((T, 6))
    for t in range(T):
        coo = local_coordinates(u[t])
        force_torque = alloc @ coo * POST_SCALE  # [6]
        fmean, fvar = gp_f.predict(coo)  # [3], [3]
        ft_mean = np.concatenate((fmean + force_torque[:3], force_torque[3:]))
        ft_var = np.concatenate((fvar, np.zeros(3))) + var_z
        ft_gp[t] = ft_mean + eps_z[t] * np.sqrt(ft_var)

    # ---- backward: single reverse-time run, residual on h, no var_x
    # added (voliro.py:139-186) ----
    h = np.zeros(6)
    y2 = {}
    entropy = 0.0
    for t in (2, 1, 0):
        gp_in = np.concatenate((h, ft_gp[t], yh[t]))  # [19]
        fmean, fvar = gp_b.predict(gp_in)  # [6], [6]
        fmean = fmean + h
        out = fmean + eps_b[t] * np.sqrt(fvar)
        entropy += 0.5 * np.sum(LOG_2PI + 1.0 + np.log(fvar))
        y2[t] = out
        h = out
    y_tilde = {t: np.concatenate((yh[t], y2[t])) for t in range(T)}  # [13]

    # ---- forward: physics + always-on conditioning (voliro.py:211-242) ----
    x = y_tilde[0]
    x_path = [x.copy()]
    kl_x = 0.0
    for t in range(T - 1):
        fmean = symplectic_euler(x, ft_gp[t], dt)  # [13]
        fvar = var_x
        gain = fvar / (var_y + fvar)
        mu = fmean + gain * (y_tilde[t + 1] - fmean)
        sig = (1.0 - gain) ** 2 * fvar + gain**2 * var_y
        x = mu + eps_f[t] * np.sqrt(sig)
        x_path.append(x.copy())
        kl_x += 0.5 * np.sum(
            np.log(fvar) - np.log(sig) + (sig + (mu - fmean) ** 2) / fvar - 1.0
        )

    # ---- observation log-likelihood on the 7 hidden dims ----
    loglik = sum(
        np.sum(
            -0.5 * (LOG_2PI + np.log(var_y[:7])
                    + (yh[t] - x_path[t][:7]) ** 2 / var_y[:7])
        )
        for t in range(T)
    )

    # ---- Beta priors (voliro.py:262-271) ----
    n_reg = np.sum(beta_logpdf(var_z / n_scale, n_a, n_b))
    l_reg = np.sum(beta_logpdf(gp_f.ls / l_scale, l_a, l_b))

    # ---- assembly (S = 1; voliro.py:244-292) ----
    elbo = (
        (lam0 * (loglik - kl_x) + lam1 * entropy) / 1.0
        + lam2 * (n_reg + l_reg)
        - gp_f.prior_kl()
        - gp_b.prior_kl()
    )
    return -elbo


def test_allocation_matrix_geometry():
    """Independent construction + geometric invariants of the 6x12
    allocation matrix."""
    hand = hand_allocation()
    from cbfssm_tpu.models.voliro import allocation_matrix

    np.testing.assert_allclose(hand, allocation_matrix(), atol=1e-15)
    # invariants of the symmetric hexacopter: hovering on the 6 vertical
    # thrusts produces pure lift (no net in-plane torque) ...
    cos_cols = hand[:, 1::2]
    np.testing.assert_allclose(cos_cols.sum(axis=1), [0, 0, -6, 0, 0, 0],
                               atol=1e-14)
    # ... equal lateral tilt on all rotors produces pure yaw torque
    sin_cols = hand[:, 0::2]
    np.testing.assert_allclose(sin_cols.sum(axis=1), [0, 0, 0, 0, 0, -6 * ARM],
                               atol=1e-14)
    # each lateral force is a unit horizontal vector; each vertical
    # thrust's lever-arm torque has magnitude ARM
    np.testing.assert_allclose(
        np.linalg.norm(sin_cols[:3], axis=0), np.ones(6), atol=1e-15)
    np.testing.assert_allclose(
        np.linalg.norm(cos_cols[3:5], axis=0), np.full(6, ARM), atol=1e-15)


def test_hand_derived_voliro_elbo_matches_model():
    config, params, raw, u, y = build_case()
    key = jax.random.PRNGKey(7)

    # RNG protocol (the only implementation-coupled step): _rollout
    # splits key -> (kz, kb, kf); the force GP draws [B, T, S, 1] from
    # kz; the backward draws [T, B, S, 1] from kb; the forward draws
    # [T-1, B, S, 1] from kf — each shared across state dims.
    kz, kb, kf = jax.random.split(key, 3)
    eps_z = np.asarray(jax.random.normal(kz, (1, T, 1, 1), dtype=jnp.float64))[
        0, :, 0, 0
    ]
    eps_b = np.asarray(jax.random.normal(kb, (T, 1, 1, 1), dtype=jnp.float64))[
        :, 0, 0, 0
    ]
    eps_f = np.asarray(
        jax.random.normal(kf, (T - 1, 1, 1, 1), dtype=jnp.float64)
    )[:, 0, 0, 0]

    want = hand_elbo(raw, config, u, y, eps_z, eps_b, eps_f)

    model = Voliro(config)
    got, _ = model.loss(params, u, y, key, condition=True)
    np.testing.assert_allclose(float(got), want, rtol=1e-9)

    # Pinned constant: guards against the library and this derivation
    # drifting together. Derived from the run above (f64, threefry).
    EXPECTED_LOSS = 127.53336044203411
    np.testing.assert_allclose(want, EXPECTED_LOSS, rtol=1e-12)

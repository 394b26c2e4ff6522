"""An independent CBFSSM ELBO cross-check worked out from the paper's
equations (arXiv:1907.07035) and the reference formulas — NOT derived
from the library's ops or from the golden tests' literal
reimplementation (tests/test_cbfssm_model.py), which share a reading of
the code with the library. Everything below is explicit scalar / 2x2
numpy written from the math:

  * sparse-GP predictive (unwhitened, diagonal q; GPflow conditional /
    paper eq. 5):  q(f(x)) = N( k_x^T K^-1 m,
                     k(x,x) - k_x^T K^-1 k_x + sum_j v_j (K^-1 k_x)_j^2 )
  * two-run backward segmenting masks hand-enumerated for T=3, L=2 from
    the reference conditions (cbfssm.py:122-128):
      run 0: resample iff (t+1) % 2L == 0, write iff t % 2L <  L
      run 1: resample iff (t+L+1) % 2L == 0, write iff t % 2L >= L
    T=3, L=2 (2L=4), t = 2,1,0:
      resample:  run 0 never (t=3 is out of range); run 1 at t=1
      writes:    t=2 -> run 1;  t=1, t=0 -> run 0
  * Kalman-style k-factor conditioning update (paper sec. 3.2 /
    cbfssm.py:211-221), per-step conditioning KL (cbfssm.py:232-235),
    entropy of the written backward samples (cbfssm.py:153-156),
  * KL( N(m, diag v) || N(0, K) ) in closed form,
  * ELBO assembly (cbfssm.py:257-262):
      elbo = (loglik*l1 - kl_x*l1 + entropy*l2)/S - KL(zeta_f) - KL(zeta_b)

The ONLY thing taken from the implementation is the RNG protocol (which
jax.random keys produce which eps arrays) — the draws are extracted by
replaying the documented key splits with jax.random directly, never by
calling model internals.

The final loss is also pinned as a hard constant so that a future
change to both the library and this derivation cannot drift together
silently (jax's threefry PRNG is stable by design).
"""

import numpy as np

import jax
import jax.numpy as jnp

from cbfssm_tpu.models import CBFSSM
from cbfssm_tpu.models.cbfssm import CBFSSMParams
from cbfssm_tpu.ops.gp import SparseGPParams

JITTER = 1e-8  # f64 jitter, reference gp_tf.py:53
LOG_2PI = np.log(2.0 * np.pi)
M = 2  # inducing points


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
        """KL( N(m_d, diag v_d) || N(0, K) ) summed over output dims:
        0.5 [ tr(K^-1 diag v_d) + m_d^T K^-1 m_d - M + log|K| - sum log v_d ]
        """
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


def build_case():
    """T=3, B=1, S=1, dim_x=2, dim_y=1 (dim_h=1), dim_u=1, M=2, L=2."""

    class _DS:
        dim_u = 1
        dim_y = 1

    config = {
        "ds": _DS,
        "batch_size": 1,
        "shuffle": 1,
        "dim_x": 2,
        "ind_pnt_num": M,
        "samples": 1,
        "learning_rate": 0.1,
        "loss_factors": np.asarray([1.3, 0.7]),
        "k_factor": 3.0,
        "recog_len": 2,
        "zeta_pos": 2.0,
        "zeta_mean": 0.05**2,
        "zeta_var": 0.01**2,
        "var_x": np.asarray([0.01, 0.02]),
        "var_y": np.asarray([0.5, 0.7]),
        "gp_var": 0.25,
        "gp_len": 2.0,
        "dtype": "float64",
    }
    # Plain unconstrained numbers; constrained values derived by hand.
    raw = dict(
        z_f=np.asarray([[0.5, -0.3, 0.2], [-0.4, 0.6, -0.1]]),
        mean_f=np.asarray([[0.3, -0.1], [-0.2, 0.25]]),
        var_unc_f=np.asarray([[-3.0, -2.5], [-2.8, -3.2]]),
        kern_var_unc_f=-0.5,
        kern_len_unc_f=np.asarray([0.3, 0.1, -0.2]),
        z_b=np.asarray([[-0.2, 0.4, 0.1], [0.3, -0.5, 0.6]]),
        mean_b=np.asarray([[0.15], [-0.3]]),
        var_unc_b=np.asarray([[-2.9], [-3.1]]),
        kern_var_unc_b=-1.0,
        kern_len_unc_b=np.asarray([0.2, -0.3, 0.4]),
        var_x_unc=np.asarray([-4.0, -3.5]),
        var_y_unc=np.asarray([-2.0, -1.5]),
    )
    f64 = lambda a: jnp.asarray(a, dtype=jnp.float64)  # noqa: E731
    params = CBFSSMParams(
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
    )
    u = np.asarray([[[0.3], [-0.6], [0.9]]])  # [B=1, T=3, du=1]
    y = np.asarray([[[0.8], [-0.4], [0.1]]])  # [B=1, T=3, dy=1]
    return config, params, raw, u, y


def hand_elbo(raw, u, y, noise, eps_b, eps_f):
    """The full derivation, scalars only. noise/eps_b: [T=3, runs=2],
    eps_f: [T-1=2]."""
    lam1, lam2 = 1.3, 0.7
    k_factor = 3.0
    var_x = softplus(raw["var_x_unc"])  # [2]
    var_y = softplus(raw["var_y_unc"])  # [2]
    gp_b = HandGP(
        raw["z_b"],
        raw["mean_b"],
        softplus(raw["var_unc_b"]),
        softplus(raw["kern_var_unc_b"]),
        softplus(raw["kern_len_unc_b"]),
    )
    gp_f = HandGP(
        raw["z_f"],
        raw["mean_f"],
        softplus(raw["var_unc_f"]),
        softplus(raw["kern_var_unc_f"]),
        softplus(raw["kern_len_unc_f"]),
    )
    u, y = u[0, :, 0], y[0, :, 0]  # T=3 scalars each

    # ---- backward: two reverse-time runs over t = 2, 1, 0 ----
    # masks hand-enumerated in the module docstring
    resample = {0: set(), 1: {1}}
    writer = {2: 1, 1: 0, 0: 0}
    y2 = {}
    entropy = 0.0
    h = [0.0, 0.0]  # per-run hidden state (dim_h = 1), zeros init
    for t in (2, 1, 0):
        for r in (0, 1):
            h_in = noise[t, r] if t in resample[r] else h[r]
            x_in = np.asarray([h_in, u[t], y[t]])  # concat(h, u, y)
            fmean, fvar = gp_b.predict(x_in)  # [1], [1]
            fmean = fmean[0] + h_in  # residual on h
            fvar = fvar[0] + var_x[0]  # + var_x[:dim_h]
            out = fmean + eps_b[t, r] * np.sqrt(fvar)
            if writer[t] == r:
                y2[t] = out
                entropy += 0.5 * (LOG_2PI + 1.0 + np.log(fvar))
            h[r] = out
    y_tilde = {t: np.asarray([y[t], y2[t]]) for t in range(3)}

    # ---- forward: conditioned rollout, t = 0 -> 1 ----
    x = y_tilde[0]
    kl_x = 0.0
    x_path = [x.copy()]
    for t in (0, 1):
        x_in = np.asarray([x[0], x[1], u[t]])  # concat(x, u)
        fmean, fvar = gp_f.predict(x_in)  # [2], [2]
        fmean = fmean + x
        fvar = fvar + var_x
        var_y_t = var_y + (k_factor - 1.0) * fvar
        gain = fvar / (var_y_t + fvar)
        mu = fmean + gain * (y_tilde[t + 1] - fmean)
        sig = (1.0 - gain) ** 2 * fvar + gain**2 * var_y_t
        x = mu + eps_f[t] * np.sqrt(sig)
        x_path.append(x.copy())
        kl_x += 0.5 * np.sum(
            np.log(fvar) - np.log(sig) + (sig + (mu - fmean) ** 2) / fvar - 1.0
        )

    # ---- observation log-likelihood over all T steps ----
    loglik = sum(
        -0.5 * (LOG_2PI + np.log(var_y[0]) + (y[t] - x_path[t][0]) ** 2 / var_y[0])
        for t in range(3)
    )

    # ---- assembly (S = 1) ----
    elbo = (
        lam1 * (loglik - kl_x) + lam2 * entropy
    ) / 1.0 - gp_f.prior_kl() - gp_b.prior_kl()
    return -elbo


def test_hand_derived_elbo_matches_model():
    config, params, raw, u, y = build_case()
    key = jax.random.PRNGKey(42)

    # RNG protocol (the only implementation-coupled step): loss splits
    # key -> (kb, kf); backward splits kb -> (k_noise, k_eps) and draws
    # [T, 2 runs, B, S, 1]; forward draws [T-1, B, S, 1] from kf.
    kb, kf = jax.random.split(key)
    k_noise, k_eps = jax.random.split(kb)
    noise = np.asarray(
        jax.random.normal(k_noise, (3, 2, 1, 1, 1), dtype=jnp.float64)
    )[:, :, 0, 0, 0]
    eps_b = np.asarray(
        jax.random.normal(k_eps, (3, 2, 1, 1, 1), dtype=jnp.float64)
    )[:, :, 0, 0, 0]
    eps_f = np.asarray(jax.random.normal(kf, (2, 1, 1, 1), dtype=jnp.float64))[
        :, 0, 0, 0
    ]

    want = hand_elbo(raw, u, y, noise, eps_b, eps_f)

    model = CBFSSM(config)
    got, _ = model.loss(params, u, y, key, condition=True)
    np.testing.assert_allclose(float(got), want, rtol=1e-9)

    # Pinned constant: guards against the library and this derivation
    # drifting together. Derived from the run above (f64, threefry).
    EXPECTED_LOSS = 11.195586391261397
    np.testing.assert_allclose(want, EXPECTED_LOSS, rtol=1e-12)

"""An independent CBFSSM-half ELBO cross-check worked out from the
paper's equations (arXiv:1907.07035, forward-only variant for stable
systems) and the reference formulas — NOT derived from the library's
ops or from the golden tests' literal reimplementation
(tests/test_half_prssm_golden.py), which share a reading of the code
with the library. With tests/test_elbo_hand_derived.py (CBFSSM),
tests/test_voliro_hand_derived.py, and tests/test_prssm_hand_derived.py
this completes derivation-vs-implementation insurance for ALL FOUR
model families. Everything below is explicit scalar / 2x2 numpy written
from the math:

  * sparse-GP predictive (unwhitened, diagonal q; paper eq. 5):
      q(f(x)) = N( k_x^T K^-1 m,
                   k(x,x) - k_x^T K^-1 k_x + sum_j v_j (K^-1 k_x)_j^2 )
  * the Kalman-style k-factor conditioning update acting ONLY on the
    observed dims (paper sec. 3.2; reference cbfssmhalf.py:147-155 —
    the hidden dims keep the prior transition, i.e. the gain is
    zero-padded up to dim_x):
      var_y_t = R + (k-1) * fvar_obs,  gain = fvar_obs/(var_y_t+fvar_obs)
      mu_obs  = fmean_obs + gain (y_{t+1} - fmean_obs);   mu_hid = fmean_hid
      sig_obs = (1-gain)^2 fvar_obs + gain^2 var_y_t;     sig_hid = fvar_hid
  * per-step conditioning KL( N(mu, sig) || N(fmean, fvar) ) in closed
    form (only the observed dims contribute — the hidden factors are
    identical),
  * observation model y_t = x_t[:dy] + N(0, R), likelihood summed over
    time and particles,
  * KL( N(m, diag v) || N(0, K) ) in closed form,
  * ELBO assembly (reference cbfssmhalf.py:174-196; NO entropy term —
    there is no backward recognition GP):
      elbo = lambda_1 * (loglik - kl_x) / S - KL(zeta_f)

The ONLY thing taken from the implementation is the RNG protocol (the
loss key is consumed directly by one [T-1, B, S, 1] normal draw) — the
draws are extracted by replaying that with jax.random directly, never
by calling model internals.

The final loss is also pinned as a hard constant so that a future
change to both the library and this derivation cannot drift together
silently (jax's threefry PRNG is stable by design).
"""

import numpy as np

import jax
import jax.numpy as jnp

from cbfssm_tpu.models import CBFSSMHALF
from cbfssm_tpu.models.cbfssmhalf import CBFSSMHALFParams
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


def build_case():
    """T=3, B=1, S=1, dim_x=2, dim_y=1, dim_u=1, M=2, recog='output'."""

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
        "loss_factors": np.asarray([1.3, 0.0]),
        "k_factor": 3.0,
        "recog_model": "output",
        "recog_len": 2,
        "zeta_pos": 2.0,
        "zeta_mean": 0.05**2,
        "zeta_var": 0.01**2,
        "var_x": np.asarray([0.01, 0.02]),
        "var_y": np.asarray([0.5]),
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
        var_x_unc=np.asarray([-4.0, -3.5]),
        var_y_unc=np.asarray([-2.0]),
    )
    f64 = lambda a: jnp.asarray(a, dtype=jnp.float64)  # noqa: E731
    params = CBFSSMHALFParams(
        gp_f=SparseGPParams(
            z=f64(raw["z_f"]),
            mean=f64(raw["mean_f"]),
            var_unc=f64(raw["var_unc_f"]),
            kern_var_unc=f64(raw["kern_var_unc_f"]),
            kern_len_unc=f64(raw["kern_len_unc_f"]),
        ),
        var_x_unc=f64(raw["var_x_unc"]),
        var_y_unc=f64(raw["var_y_unc"]),
        recog={},
    )
    u = np.asarray([[[0.3], [-0.6], [0.9]]])  # [B=1, T=3, du=1]
    y = np.asarray([[[0.8], [-0.4], [0.1]]])  # [B=1, T=3, dy=1]
    return config, params, raw, u, y


def hand_elbo(raw, u, y, eps):
    """The full derivation, scalars only. eps: [T-1=2] (one draw per
    step, broadcast across the 2 state dims)."""
    lam1 = 1.3
    k_factor = 3.0
    var_x = softplus(raw["var_x_unc"])  # [2]
    var_y = softplus(raw["var_y_unc"])[0]  # scalar (dy = 1)
    gp_f = HandGP(
        raw["z_f"],
        raw["mean_f"],
        softplus(raw["var_unc_f"]),
        softplus(raw["kern_var_unc_f"]),
        softplus(raw["kern_len_unc_f"]),
    )
    u, y = u[0, :, 0], y[0, :, 0]  # T=3 scalars each

    # ---- 'output' recognition: x_0 = [y_0, 0] ----
    x = np.asarray([y[0], 0.0])

    # ---- conditioned rollout, t = 0 -> 1 ----
    kl_x = 0.0
    x_path = [x.copy()]
    for t in (0, 1):
        x_in = np.asarray([x[0], x[1], u[t]])  # concat(x, u)
        fmean, fvar = gp_f.predict(x_in)  # [2], [2]
        fmean = fmean + x  # residual transition
        fvar = fvar + var_x  # + process noise Q
        # conditioning update on the OBSERVED dim only (dim 0)
        var_y_t = var_y + (k_factor - 1.0) * fvar[0]
        gain = fvar[0] / (var_y_t + fvar[0])
        mu = np.asarray([fmean[0] + gain * (y[t + 1] - fmean[0]), fmean[1]])
        sig = np.asarray(
            [(1.0 - gain) ** 2 * fvar[0] + gain**2 * var_y_t, fvar[1]]
        )
        x = mu + eps[t] * np.sqrt(sig)
        x_path.append(x.copy())
        # hidden dim contributes 0 (mu_1 = fmean_1, sig_1 = fvar_1);
        # keep the full-dim sum anyway — it must cancel exactly
        kl_x += 0.5 * np.sum(
            np.log(fvar) - np.log(sig) + (sig + (mu - fmean) ** 2) / fvar - 1.0
        )

    # ---- observation log-likelihood over all T steps ----
    loglik = sum(
        -0.5 * (LOG_2PI + np.log(var_y) + (y[t] - x_path[t][0]) ** 2 / var_y)
        for t in range(3)
    )

    # ---- assembly (S = 1; no entropy term) ----
    elbo = lam1 * (loglik - kl_x) / 1.0 - gp_f.prior_kl()
    return -elbo


def test_hand_derived_cbfssmhalf_elbo_matches_model():
    config, params, raw, u, y = build_case()
    key = jax.random.PRNGKey(42)

    # RNG protocol (the only implementation-coupled step): the rollout
    # consumes the loss key directly with one [T-1, B, S, 1] draw.
    eps = np.asarray(jax.random.normal(key, (2, 1, 1, 1), dtype=jnp.float64))[
        :, 0, 0, 0
    ]

    want = hand_elbo(raw, u, y, eps)

    model = CBFSSMHALF(config)
    got, aux = model.loss(params, u, y, key, condition=True)
    np.testing.assert_allclose(float(got), want, rtol=1e-9)

    # The aux decomposition must match the same hand-derived pieces.
    np.testing.assert_allclose(
        float(aux["kl_z_f"]),
        HandGP(
            raw["z_f"],
            raw["mean_f"],
            softplus(raw["var_unc_f"]),
            softplus(raw["kern_var_unc_f"]),
            softplus(raw["kern_len_unc_f"]),
        ).prior_kl(),
        rtol=1e-9,
    )

    # Pinned constant: guards against the library and this derivation
    # drifting together. Derived from the run above (f64, threefry).
    EXPECTED_LOSS = 11.068887119474072
    np.testing.assert_allclose(want, EXPECTED_LOSS, rtol=1e-12)

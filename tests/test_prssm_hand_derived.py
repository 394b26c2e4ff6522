"""An independent PR-SSM ELBO cross-check worked out from the paper's
equations (Doerr et al. 2018, arXiv:1801.10395 eq. 11) and the reference
formulas — NOT derived from the library's ops or from the golden tests'
literal reimplementation (tests/test_half_prssm_golden.py), which share a
reading of the code with the library. This completes the
derivation-vs-implementation insurance across model families: CBFSSM
(tests/test_elbo_hand_derived.py), Voliro
(tests/test_voliro_hand_derived.py), and now PR-SSM. Everything below is
explicit scalar / 2x2 numpy written from the math:

  * sparse-GP predictive (unwhitened, diagonal q; paper eq. 6 /
    GPflow conditional):  q(f(x)) = N( k_x^T K^-1 m,
                     k(x,x) - k_x^T K^-1 k_x + sum_j v_j (K^-1 k_x)_j^2 )
  * the PR-SSM generative rollout (paper eq. 3-5 / reference
    prssm.py:60-92): x_0 from the 'output' recognition (first
    observation zero-padded, prssm.py:140-144), then
    x_{t+1} ~ N( x_t + mu_f(x_t, u_t), Sigma_f(x_t, u_t) + Q ) with ONE
    standard-normal draw per (t, particle) broadcast across state dims
    (the reference ties the scalar draw, prssm.py:84-86),
  * observation model y_t = x_t[:dy] + N(0, R) (paper eq. 2; the
    likelihood sums over time and particles),
  * KL( N(m, diag v) || N(0, K) ) in closed form,
  * ELBO assembly (reference prssm.py:96-97):
      elbo = lambda_1 * loglik - KL(zeta), faithfully NOT divided by
      the particle count.

The ONLY thing taken from the implementation is the RNG protocol (the
loss key is consumed directly by one [T-1, B, S, 1] normal draw) — the
draws are extracted by replaying that with jax.random directly, never by
calling model internals.

The final loss is also pinned as a hard constant so that a future change
to both the library and this derivation cannot drift together silently
(jax's threefry PRNG is stable by design).
"""

import numpy as np

import jax
import jax.numpy as jnp

from cbfssm_tpu.models import PRSSM
from cbfssm_tpu.models.prssm import PRSSMParams
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
    params = PRSSMParams(
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

    # ---- 'output' recognition: x_0 = [y_0, 0] (prssm.py:140-144) ----
    x = np.asarray([y[0], 0.0])

    # ---- prior rollout, t = 0 -> 1 (paper eq. 3-5) ----
    x_path = [x.copy()]
    for t in (0, 1):
        x_in = np.asarray([x[0], x[1], u[t]])  # concat(x, u)
        fmean, fvar = gp_f.predict(x_in)  # [2], [2]
        fmean = fmean + x  # residual transition
        fvar = fvar + var_x  # + process noise Q
        x = fmean + eps[t] * np.sqrt(fvar)  # one tied draw per step
        x_path.append(x.copy())

    # ---- observation log-likelihood over all T steps (paper eq. 2) ----
    loglik = sum(
        -0.5 * (LOG_2PI + np.log(var_y) + (y[t] - x_path[t][0]) ** 2 / var_y)
        for t in range(3)
    )

    # ---- assembly (prssm.py:96-97; NOT divided by particle count) ----
    elbo = lam1 * loglik - gp_f.prior_kl()
    return -elbo


def test_hand_derived_prssm_elbo_matches_model():
    config, params, raw, u, y = build_case()
    key = jax.random.PRNGKey(42)

    # RNG protocol (the only implementation-coupled step): the rollout
    # consumes the loss key directly with one [T-1, B, S, 1] draw.
    eps = np.asarray(jax.random.normal(key, (2, 1, 1, 1), dtype=jnp.float64))[
        :, 0, 0, 0
    ]

    want = hand_elbo(raw, u, y, eps)

    model = PRSSM(config)
    got, aux = model.loss(params, u, y, key, condition=True)
    np.testing.assert_allclose(float(got), want, rtol=1e-9)

    # The aux decomposition must match the same hand-derived pieces.
    np.testing.assert_allclose(
        float(aux["kl_z"]),
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
    EXPECTED_LOSS = 13.164426847283284
    np.testing.assert_allclose(want, EXPECTED_LOSS, rtol=1e-12)

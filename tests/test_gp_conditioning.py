"""Solve-free cache robustness across Gram-conditioning decades.

The solve-free predict forms an explicit ``K^-1`` (ops/gp.py) instead of
the reference's per-step triangular solves (gp_tf.py:132-161). The
explicit inverse loses ~eps * cond(K) relative accuracy, so this suite
bounds the drift against the triangular-solve formulation
(``predict_reference``) as K's conditioning degrades — the regime sharp
end-of-training hyperparameters push toward. Jitter policy + measured
bounds are documented in docs/MATH.md ("Solve-free conditioning").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbfssm_tpu.ops import gp, kernels, linalg


def make_params(key, m=100, in_dim=6, out_dim=4, gp_len=1.0, gp_var=0.25,
                dtype=jnp.float64):
    return gp.init_sparse_gp(
        jax.random.PRNGKey(key), in_dim, out_dim, m,
        gp_var=gp_var, gp_len=gp_len, zeta_mean=0.05, zeta_pos=2.0,
        zeta_var=0.0001, dtype=dtype,
    )


def gram_cond(params, jitter):
    gram = np.asarray(
        kernels.rbf_gram(
            jnp.asarray(params.z, jnp.float64),
            jnp.asarray(params.kern_var, jnp.float64),
            jnp.asarray(params.kern_len, jnp.float64),
        )
    )
    gram = gram + jitter * np.eye(gram.shape[0])
    return float(np.linalg.cond(gram))


def rel_err(got, ref, floor=1e-12):
    got, ref = np.asarray(got), np.asarray(ref)
    return float(np.max(np.abs(got - ref) / (np.abs(ref) + floor)))


# Long lengthscales correlate the inducing points and drive cond(K)
# through the decades (the jitter floors it at ~kern_var/jitter).
LENGTHSCALE_DECADES = [
    # (gp_len, max cond allowed in the fixture, f64 rel-err bound)
    (0.5, 1e4, 1e-10),
    (1.5, 1e7, 1e-8),
    (3.0, 1e10, 1e-6),
    (6.0, 1e13, 1e-3),
]


@pytest.mark.parametrize("gp_len,cond_cap,tol", LENGTHSCALE_DECADES)
def test_f64_drift_bounded_across_decades(rng, gp_len, cond_cap, tol):
    params = make_params(3, gp_len=gp_len)
    jitter = 1e-8
    cond = gram_cond(params, jitter)
    assert cond < cond_cap, f"fixture drifted: cond={cond:.2e}"
    xnew = jnp.asarray(rng.normal(size=(400, 6)))
    cache = gp.precompute(params, jitter)
    mean, var = gp.predict(cache, xnew)
    mean_ref, var_ref = gp.predict_reference(params, xnew, jitter)
    assert rel_err(mean, mean_ref) < tol, f"mean drift at cond={cond:.2e}"
    # variances sit near the kern_var scale; bound absolute-relative to it
    var_scale = float(params.kern_var)
    assert float(np.max(np.abs(np.asarray(var - var_ref)))) < tol * var_scale
    assert float(jnp.min(var)) >= 0.0  # clamp keeps variances PSD-safe


@pytest.mark.parametrize("gp_len", [0.5, 3.0, 6.0])
def test_f32_drift_bounded_by_jitter_floor(rng, gp_len):
    """float32 (TPU compute dtype): the 1e-6 jitter floors the effective
    conditioning at ~kern_var/jitter ~ 1e5·, bounding the solve-free
    error at ~1e-2 relative even when the unjittered Gram is singular to
    f32 precision."""
    params32 = make_params(3, gp_len=gp_len, dtype=jnp.float32)
    jitter = 1e-6
    xnew32 = jnp.asarray(rng.normal(size=(400, 6)), jnp.float32)
    cache = gp.precompute(params32, jitter)
    mean, var = gp.predict(cache, xnew32)
    # ground truth: same hyperparameters in f64 through triangular solves
    params64 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float64), params32
    )
    mean_ref, var_ref = gp.predict_reference(
        params64, jnp.asarray(xnew32, jnp.float64), jitter
    )
    var_scale = float(params64.kern_var)
    # Pointwise-relative error is unbounded where the mean crosses zero;
    # the meaningful f32 bound is relative to the prediction scale:
    # eps_f32 * cond_floored ~ 1e-7 * kern_var/jitter ~ a few percent.
    scale_err = float(
        np.max(np.abs(np.asarray(mean, np.float64) - np.asarray(mean_ref)))
    ) / float(np.max(np.abs(np.asarray(mean_ref))))
    assert scale_err < 5e-2, f"gp_len={gp_len}: scale err {scale_err:.2e}"
    assert float(np.max(np.abs(np.asarray(var, np.float64) - var_ref))) < 5e-2 * var_scale
    assert float(jnp.min(var)) >= 0.0


def test_drift_at_trained_hyperparameters(tmp_path):
    """End-of-training stress: train a CBFSSM long enough for the
    hyperparameters to move off their init, then compare the solve-free
    cache against the triangular-solve ground truth at the TRAINED
    parameters (the golden tests only pin init-time hyperparameters)."""
    from tests.test_trainer import SmokeDS, smoke_config
    from cbfssm_tpu.models import CBFSSM
    from cbfssm_tpu.training import Trainer

    ds = SmokeDS()
    model = CBFSSM(smoke_config())
    trainer = Trainer(model, str(tmp_path / "m"))
    trainer.train(ds, epochs=25)
    assert trainer.train_all[-1] < trainer.train_all[0]

    rng = np.random.default_rng(7)
    for name in ("gp_f", "gp_b"):
        params = getattr(trainer.params, name)
        if params.mean.shape[1] == 0:
            continue
        # hyperparameters actually moved (this is a trained cache)
        init = getattr(model.init(jax.random.PRNGKey(trainer.seed)), name)
        assert float(jnp.max(jnp.abs(params.kern_len_unc - init.kern_len_unc))) > 0
        cond = gram_cond(params, model.jitter or 1e-8)
        xnew = jnp.asarray(rng.normal(size=(256, params.z.shape[1])))
        cache = gp.precompute(params, model.jitter)
        mean, var = gp.predict(cache, xnew)
        mean_ref, var_ref = gp.predict_reference(params, xnew, model.jitter)
        # f64 smoke training: drift must stay near solver noise
        tol = max(1e-9, 1e-13 * cond)
        assert rel_err(mean, mean_ref) < tol, f"{name}: cond={cond:.2e}"
        assert float(np.max(np.abs(np.asarray(var - var_ref)))) < tol
        assert float(jnp.min(var)) >= 0.0


def test_explicit_inverse_error_tracks_cond(rng):
    """The mechanism itself: K^-1 K departs from identity by
    ~eps * cond(K) — the quantity the decade bounds above are built on."""
    for gp_len, floor in ((0.5, 1e-12), (6.0, 1e-8)):
        params = make_params(3, gp_len=gp_len)
        jitter = 1e-8
        cond = gram_cond(params, jitter)
        cache = gp.precompute(params, jitter)
        gram = kernels.rbf_gram(params.z, params.kern_var, params.kern_len)
        gram = gram + jitter * jnp.eye(gram.shape[0], dtype=gram.dtype)
        resid = float(
            jnp.max(jnp.abs(cache.kinv @ gram - jnp.eye(gram.shape[0])))
        )
        assert floor / 100 < resid + 1e-13 < 1e4 * 2.2e-16 * cond + 1e-11

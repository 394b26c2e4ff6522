"""The performance knobs must not change semantics:

  * scan_unroll: pure scheduling — loss identical to unroll=1;
  * gp_matmul_precision: 'highest' exactly matches the pre-knob
    behavior; 'high' (the shipped default since the round-4 end-to-end
    decision, BENCHMARKS.md "gp_matmul_precision default decision")
    and 'default' stay within their documented error bands;
  * the merged concat(K^-1, alpha) predict matmul is element-identical
    to the two separate products.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbfssm_tpu.models import CBFSSM
from cbfssm_tpu.ops import gp, kernels
from tests.test_cbfssm_model import make_model


@pytest.fixture
def batch(rng):
    return rng.normal(size=(2, 12, 2)), rng.normal(size=(2, 12, 1))


def test_scan_unroll_identical_loss(batch):
    u, y = batch
    model = make_model(seq_len=12)
    params = model.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(3)
    base, _ = model.loss(params, u, y, key, True)
    for unroll in (2, 3):
        m2 = CBFSSM(dataclasses.replace(model.config, scan_unroll=unroll))
        got, _ = m2.loss(params, u, y, key, True)
        np.testing.assert_allclose(float(got), float(base), rtol=1e-12)


def test_precision_knob_bands(batch):
    """Knob plumbing: every precision tier produces a loss inside the
    documented band. HONESTY NOTE: on the CPU test backend the three
    tiers compute identically (HIGH/DEFAULT only diverge on TPU where
    bf16 passes exist), so the bands here are not tight evidence — the
    real error bands are TPU-measured (BENCHMARKS.md "Matmul
    precision"); this test pins that the knob reaches the predict path
    and that no tier produces a wild value."""
    u, y = batch
    model = make_model()  # f64: precision knob is a no-op in f64
    cfg32 = dataclasses.replace(model.config, dtype="float32")
    m_highest = CBFSSM(cfg32)
    params = m_highest.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(3)
    u32, y32 = u.astype(np.float32), y.astype(np.float32)
    base, _ = m_highest.loss(params, u32, y32, key, True)
    for prec, rtol in [("high", 1e-4), ("default", 1e-3)]:
        m = CBFSSM(dataclasses.replace(cfg32, gp_matmul_precision=prec))
        got, _ = m.loss(params, u32, y32, key, True)
        np.testing.assert_allclose(float(got), float(base), rtol=rtol)


def test_default_precision_is_high():
    """The shipped default is 'high' — decided by the round-4
    end-to-end training-equivalence experiment
    (artifacts/precision_experiment.json); the benchmark-shape builder
    follows the library default unless overridden."""
    from cbfssm_tpu.config import ModelConfig

    assert ModelConfig.gp_matmul_precision == "high"
    from scripts.profile_mfu import SHAPES, build_cbfssm_parts

    model = build_cbfssm_parts(SHAPES["smallscale"])[0]
    assert model.config.gp_matmul_precision == "high"
    assert model._gp_precision == jax.lax.Precision.HIGH


def test_invalid_precision_rejected():
    model = make_model()
    with pytest.raises(ValueError, match="gp_matmul_precision"):
        CBFSSM(dataclasses.replace(model.config, gp_matmul_precision="fast"))


def test_invalid_backward_mode_rejected():
    """A typo ('Blocked', 'block') must fail loudly, not silently fall
    through to the sequential schedule."""
    model = make_model()
    for bad in ("Blocked", "block", ""):
        with pytest.raises(ValueError, match="backward_mode"):
            CBFSSM(dataclasses.replace(model.config, backward_mode=bad))


def test_merged_predict_matmul_identical(rng):
    params = gp.init_sparse_gp(
        jax.random.PRNGKey(1), 3, 2, num_points=7, gp_var=0.3, gp_len=1.2,
        zeta_mean=0.01, zeta_pos=2.0, zeta_var=1e-4, dtype=jnp.float64,
    )
    cache = gp.precompute(params, 1e-8)
    x = jnp.asarray(rng.normal(size=(11, 3)))
    fmean, fvar = gp.predict(cache, x)
    # two separate products (the pre-merge formulation)
    knm = kernels.rbf_cross(x, cache.z, cache.kern_var, cache.kern_len)
    w = jnp.matmul(knm, cache.kinv, precision=kernels.HIGHEST)
    fmean2 = jnp.matmul(knm, cache.alpha, precision=kernels.HIGHEST)
    qf = jnp.sum(knm * w, axis=-1)
    fvar2 = jnp.maximum(cache.kern_var - qf, 0.0)[:, None] + jnp.matmul(
        jnp.square(w), cache.var_q, precision=kernels.HIGHEST
    )
    np.testing.assert_array_equal(np.asarray(fmean), np.asarray(fmean2))
    np.testing.assert_array_equal(np.asarray(fvar), np.asarray(fvar2))

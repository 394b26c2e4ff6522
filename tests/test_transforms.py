import jax.numpy as jnp
import numpy as np
import pytest

from cbfssm_tpu.ops import transforms


def test_roundtrip_small_and_large():
    y = np.array([1e-8, 1e-4, 0.01, 1.0, 10.0, 34.0, 40.0, 1e3])
    unc = transforms.positive_inverse(y)
    back = np.asarray(transforms.positive(jnp.asarray(unc)))
    np.testing.assert_allclose(back, y, rtol=1e-6)


def test_positive_matches_softplus():
    x = np.linspace(-20, 20, 101)
    got = np.asarray(transforms.positive(jnp.asarray(x)))
    want = np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0) + 1e-10
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_inverse_rejects_nonpositive():
    with pytest.raises(ValueError):
        transforms.positive_inverse(np.array([0.0]))


def test_linearization_above_threshold():
    # softplus(x) ~ x for large x; the inverse must not overflow.
    unc = transforms.positive_inverse(np.array([500.0]))
    assert np.isfinite(unc).all()
    np.testing.assert_allclose(unc, [500.0], rtol=1e-9)

"""Native host-pipeline library: builds, and matches numpy/python
fallbacks exactly."""

import numpy as np
import pytest

from cbfssm_tpu import native
from cbfssm_tpu.data import voliro_loader
from cbfssm_tpu.data.base import BaseDS


def test_library_builds():
    assert native.available(), "g++ build of hostloader.cpp failed"


def test_window_gather_matches_numpy(rng):
    x = rng.normal(size=(3, 40, 5))
    starts = np.asarray([0, 7, 14, 28], dtype=np.int64)
    got = native.window_gather(x, starts, 12)
    idx = starts[:, None] + np.arange(12)[None, :]
    want = x[:, idx, :].reshape(-1, 12, 5)
    np.testing.assert_array_equal(got, want)


def test_rnn_batches_uses_native_and_matches(rng):
    x = rng.normal(size=(2, 33, 3))
    got = BaseDS.rnn_batches(x, length=8, stride=5)
    # pure-numpy computation of the same thing
    starts = np.arange(0, 33 - 8 + 1, 5)
    if (33 - 8) % 5 > 0:
        starts = np.append(starts, 33 - 8)
    idx = starts[:, None] + np.arange(8)[None, :]
    want = x[:, idx, :].reshape(-1, 8, 3)
    np.testing.assert_array_equal(got, want)


def python_unwrap(vec, threshold=2.0 / 3.0 * np.pi):
    """Literal python transcription of the reference filter
    (voliro_loader.py:141-158)."""
    vec = np.atleast_2d(vec)
    out = np.zeros_like(vec)
    out[0] = vec[0]
    for k in range(vec.shape[1]):
        for i in range(1, vec.shape[0]):
            v = vec[i, k]
            prev = out[i - 1, k]
            if v - prev > threshold:
                cand = v - 2 * np.pi
            elif v - prev < -threshold:
                cand = v + np.pi
                if cand - prev < -threshold:
                    cand = v + 2 * np.pi
            else:
                cand = v
            out[i, k] = cand
    return out


def test_unwrap_matches_python_reference(rng):
    # wrapped random walks PLUS isolated injected +-2pi offsets at
    # ~5% of samples — above-threshold single-sample jumps exercise
    # every branch of the asymmetric correction
    base = np.cumsum(rng.normal(0, 0.3, size=(200, 3)), axis=0)
    vec = ((base + np.pi) % (2 * np.pi)) - np.pi  # wrapped angles
    jumps = (rng.random(size=(200, 3)) < 0.05) * 2 * np.pi * rng.choice(
        [-1, 1], size=(200, 3))
    vec = vec + jumps
    got = voliro_loader.unwrap_euler_angles(vec)
    want = python_unwrap(vec)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_unwrap_python_fallback_matches_cpp(monkeypatch, rng):
    """The Python fallback and the C++ path implement ONE spec: force
    the fallback (lib unavailable) and compare element-for-element
    against the native result on the same inputs, including sequences
    with consecutive wrap crossings in both directions."""
    if not native.available():
        pytest.skip("native library unavailable; nothing to compare")
    base = np.cumsum(rng.normal(0, 0.8, size=(300, 4)), axis=0)
    vec = ((base + np.pi) % (2 * np.pi)) - np.pi
    want = voliro_loader.unwrap_euler_angles(vec)  # native path
    monkeypatch.setattr(native, "unwrap_angles", lambda v, t: None)
    got = voliro_loader.unwrap_euler_angles(vec)  # python fallback
    np.testing.assert_array_equal(got, want)


def test_unwrap_continuity(rng):
    # The reference filter corrects individual +-2*pi jumps (it is not a
    # cumulative unwrapper), so test a ramp crossing ONE wrap boundary.
    t = np.linspace(0, 2.5 * np.pi, 400)
    wrapped = ((t + np.pi) % (2 * np.pi)) - np.pi
    out = voliro_loader.unwrap_euler_angles(wrapped[:, None])
    # after the filter there are no jumps larger than the threshold
    assert np.abs(np.diff(out[:, 0])).max() < 2.0 / 3.0 * np.pi
    np.testing.assert_allclose(out[:, 0], t, atol=1e-10)


def test_unwrap_1d_series_is_time_major(rng):
    """A 1-D input is one CHANNEL over time (np.atleast_2d would have
    made it a single time step and silently no-op'd); the result matches
    the [T, 1] call and comes back 1-D."""
    t = np.linspace(0, 2.5 * np.pi, 400)
    wrapped = ((t + np.pi) % (2 * np.pi)) - np.pi
    out = voliro_loader.unwrap_euler_angles(wrapped)
    assert out.shape == wrapped.shape
    np.testing.assert_array_equal(
        out, voliro_loader.unwrap_euler_angles(wrapped[:, None])[:, 0])
    np.testing.assert_allclose(out, t, atol=1e-10)
    with pytest.raises(ValueError, match="angle series"):
        voliro_loader.unwrap_euler_angles(np.zeros((4, 3, 2)))


def test_normalize_cast(rng):
    x = rng.normal(3.0, 2.0, size=(50, 4))
    mean = x.mean(axis=0)
    std = x.std(axis=0)
    got = native.normalize_cast(x, mean, std)
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, ((x - mean) / std).astype(np.float32), rtol=1e-6)


def test_fallback_paths(monkeypatch, rng):
    """With the native library unavailable every wrapper still works."""
    monkeypatch.setattr(native, "load", lambda: None)
    x = rng.normal(size=(2, 20, 3))
    starts = np.asarray([0, 4], dtype=np.int64)
    idx = starts[:, None] + np.arange(6)[None, :]
    np.testing.assert_array_equal(
        native.window_gather(x, starts, 6), x[:, idx, :].reshape(-1, 6, 3)
    )
    assert native.unwrap_angles(np.zeros((4, 2)), 1.0) is None  # python fallback signal
    out = native.normalize_cast(x, np.zeros(3), np.ones(3))
    assert out.dtype == np.float32

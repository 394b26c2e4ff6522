"""ctypes bindings for the native host-pipeline library.

Compiled lazily with g++ on first use (no pybind11 / build-system
dependency); every entry point has a numpy fallback so the framework
works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "hostloader.cpp")
_lock = threading.Lock()
_lib = None
_tried = False


def _host_tag() -> str:
    """Short stable tag for this host's CPU (arch + feature flags). The
    library is built with -march=native, so a .so from a different host
    (shared/NFS checkout, copied tree) can SIGILL — key the binary per
    host like the dry-run keys its XLA cache (__graft_entry__)."""
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{platform.machine()}|{feats}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


_LIB_PATH = os.path.join(
    os.path.dirname(__file__), f"_hostloader_{_host_tag()}.so"
)


def _build() -> bool:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-pthread",
        _SRC,
        "-o",
        _LIB_PATH,
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        return res.returncode == 0
    except Exception:
        return False


def load() -> ctypes.CDLL | None:
    """Compile (once) and load the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        i64 = ctypes.c_int64
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.window_gather_f64.argtypes = [f64p, i64, i64, i64, i64p, i64, i64, f64p]
        lib.unwrap_angles_f64.argtypes = [f64p, i64, i64, ctypes.c_double]
        lib.normalize_cast_f32.argtypes = [f64p, i64, i64, f64p, f64p, f32p]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def window_gather(x: np.ndarray, starts: np.ndarray, win_len: int) -> np.ndarray:
    """[E, T, D] x [W'] -> [E*W', win_len, D]; native path with numpy
    fallback (identical results)."""
    x = np.ascontiguousarray(x, dtype=np.float64)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    e, t, d = x.shape
    # bounds-check HERE so both paths fail loudly and identically: the
    # C gather does no validation (an out-of-range start would memcpy
    # past the input buffer), while the numpy fallback raises
    if len(starts) and (starts.min() < 0 or int(starts.max()) + win_len > t):
        raise IndexError(
            f"window [{int(starts.min())}, {int(starts.max())}+{win_len}) "
            f"out of bounds for time axis of length {t}"
        )
    lib = load()
    if lib is None:
        idx = starts[:, None] + np.arange(win_len)[None, :]
        return x[:, idx, :].reshape(-1, win_len, d)
    out = np.empty((e * len(starts), win_len, d), dtype=np.float64)
    lib.window_gather_f64(x, e, t, d, starts, len(starts), win_len, out)
    return out


def unwrap_angles(vec: np.ndarray, threshold: float) -> np.ndarray:
    """Sequential euler jump filter; in-place on a copy."""
    vec = np.array(vec, dtype=np.float64, order="C", copy=True)
    lib = load()
    if lib is None:
        return None  # caller falls back to the python loop
    t, k = vec.shape
    lib.unwrap_angles_f64(vec, t, k, threshold)
    return vec


def normalize_cast(x: np.ndarray, mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    """(x - mean) / std downcast to float32 in one pass.

    Serving-ingest utility (raw f64 telemetry -> normalized f32 request
    batch) for custom pipelines; the training pipeline itself
    normalizes at dataset build time and casts at device staging, so
    this has no in-repo call site by design (see hostloader.cpp)."""
    x = np.ascontiguousarray(x, dtype=np.float64)
    mean = np.ascontiguousarray(np.broadcast_to(mean, (x.shape[-1],)), dtype=np.float64)
    std = np.ascontiguousarray(np.broadcast_to(std, (x.shape[-1],)), dtype=np.float64)
    lib = load()
    flat = x.reshape(-1, x.shape[-1])
    if lib is None:
        return ((flat - mean) / std).astype(np.float32).reshape(x.shape)
    out = np.empty(flat.shape, dtype=np.float32)
    lib.normalize_cast_f32(flat, flat.shape[0], flat.shape[1], mean, std, out)
    return out.reshape(x.shape)

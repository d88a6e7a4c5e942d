"""ctypes bindings for the native C++ host solver (csolver.cpp) — the
framework's analogue of the reference's optional Myokit/CVODE backend
(train-d0.py:128-297): a CPU oracle/fallback with wall-clock watchdog and
inf-trace failure sentinels.

The shared library is built on first use with the system compiler and cached
next to this file.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "csolver.cpp")
_LIB = os.path.join(_DIR, "libionflux_native.so")

_lib = None


def _build() -> None:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_LIB)
    dp = ctypes.POINTER(ctypes.c_double)
    sig = [dp, ctypes.c_double, ctypes.c_double, dp, ctypes.c_int64, dp, dp,
           ctypes.c_int64, dp, ctypes.c_double, ctypes.c_double,
           ctypes.c_int64, ctypes.c_double]
    for name in ("ionflux_solve_hh", "ionflux_solve_markov"):
        fn = getattr(lib, name)
        fn.argtypes = sig
        fn.restype = ctypes.c_int
    _lib = lib
    return lib


def _as_c(a):
    a = np.ascontiguousarray(a, dtype=np.float64)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def csolve(kind: str, params, proto_t0: float, proto_dt: float,
           knots: np.ndarray, ts: np.ndarray, y0: np.ndarray | None = None,
           rtol: float = 1e-7, atol: float = 1e-9, max_steps: int = 10_000_000,
           timeout_s: float = 600.0):
    """Adaptive dopri5 solve on the host. kind: 'hh' (8 params, 2 states) or
    'markov' (12 params, 6 states). Returns ys [T, S] (inf rows on
    timeout/divergence — train-d0.py sentinel semantics)."""
    lib = _load()
    params = np.asarray(params, np.float64).reshape(-1)
    if kind == "hh":
        fn, s, n_p = lib.ionflux_solve_hh, 2, 8
        y0 = np.array([0.0, 1.0]) if y0 is None else y0
    elif kind == "markov":
        fn, s, n_p = lib.ionflux_solve_markov, 6, 12
        y0 = (np.array([0.0, 1.0, 0.0, 0.0, 0.0, 0.0]) if y0 is None else y0)
    else:
        raise ValueError(kind)
    if params.size != n_p:
        raise ValueError(f"{kind} expects {n_p} params, got {params.size}")
    knots_a, knots_p = _as_c(knots)
    ts_a, ts_p = _as_c(ts)
    y0_a, y0_p = _as_c(y0)
    params_a, params_p = _as_c(params)
    out = np.empty((len(ts_a), s), np.float64)
    _, out_p = _as_c(out)  # already f64 contiguous; view is fine
    out_p = out.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    fn(params_p, float(proto_t0), float(proto_dt), knots_p, len(knots_a),
       y0_p, ts_p, len(ts_a), out_p, float(rtol), float(atol),
       int(max_steps), float(timeout_s))
    return out

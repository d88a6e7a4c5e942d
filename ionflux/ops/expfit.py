"""Tri-/bi-exponential segment fits — the --smoothi derivative-estimation
variant (reference train-r1.py:422-673).

Per constant-voltage segment the gate trajectory a(t) is fitted with
  tri_exp: a e^{-bt} + c e^{-dt} + e e^{-ft} + g   (7 params)
  bi_exp:  a e^{-bt} + c e^{-dt} + g               (5 params)
whose analytic 1st/2nd derivatives give da/dt and d2a/dt2 exactly — the
reference's route to smooth second derivatives on noisy real data.

Fitting: Nelder-Mead (scipy fmin, as train-r1.py:490) with a CMA-ES fallback
for the hard segments (the reference calls pints.fmin at -90 mV,
train-r1.py:555; here fit.cmaes.fmin).
"""

from __future__ import annotations

import numpy as np
from scipy import optimize

from ionflux.fit.cmaes import fmin as cma_fmin

# reference initial guesses (train-r1.py:426-427, 440)
X0_TRI = np.array([1.0, 1.0 / 100, 0.5, 1.0 / 200, 0.25, 1.0 / 400, 0.1])
X02_TRI = np.array([0.7, 1.0 / 50, 0.2, 1.0 / 100, 0.1, 1.0 / 200, 0.01])
X0_BI = np.array([0.7, 1.0 / 50, 0.2, 1.0 / 100, 0.01])


def tri_exp(t, x):
    a, b, c, d, e, f, g = x
    return a * np.exp(-b * t) + c * np.exp(-d * t) + e * np.exp(-f * t) + g


def dtri_exp(t, x):
    a, b, c, d, e, f, g = x
    return (-a * b * np.exp(-b * t) - c * d * np.exp(-d * t)
            - e * f * np.exp(-f * t))


def d2tri_exp(t, x):
    a, b, c, d, e, f, g = x
    return (a * b * b * np.exp(-b * t) + c * d * d * np.exp(-d * t)
            + e * f * f * np.exp(-f * t))


def bi_exp(t, x):
    a, b, c, d, g = x
    return a * np.exp(-b * t) + c * np.exp(-d * t) + g


def dbi_exp(t, x):
    a, b, c, d, g = x
    return -a * b * np.exp(-b * t) - c * d * np.exp(-d * t)


def d2bi_exp(t, x):
    a, b, c, d, g = x
    return a * b * b * np.exp(-b * t) + c * d * d * np.exp(-d * t)


def is_within(r, x) -> bool:
    """train-r1.py:453-454."""
    return bool(np.min(r) < x < np.max(r))


def fit_exp(t: np.ndarray, a: np.ndarray, kind: str = "tri",
            x0: np.ndarray | None = None, use_cma: bool = False,
            max_iter: int = 1000):
    """Fit a segment; returns (value, d1, d2) callables' params.

    t is segment-local time (the reference shifts tfit - tfit[0],
    train-r1.py:487)."""
    f = tri_exp if kind == "tri" else bi_exp
    x0 = x0 if x0 is not None else (X0_TRI if kind == "tri" else X0_BI)

    def rms(x):
        return float(np.sqrt(np.mean((f(t, x) - a) ** 2)))

    if use_cma:
        xopt, _ = cma_fmin(rms, x0, max_iter=max_iter)
    else:
        xopt = optimize.fmin(rms, x0, disp=False)
    return np.asarray(xopt)


def eval_exp(kind: str, t: np.ndarray, x: np.ndarray):
    """(a, da/dt, d2a/dt2) for a fitted segment."""
    if kind == "tri":
        return tri_exp(t, x), dtri_exp(t, x), d2tri_exp(t, x)
    return bi_exp(t, x), dbi_exp(t, x), d2bi_exp(t, x)

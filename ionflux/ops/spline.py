"""Jittable cubic-spline interpolation/differentiation on uniform grids.

The reference's derivative-surface stage leans on FITPACK
(``UnivariateSpline(..., s=0)`` + ``.derivative()``, train-s1.py:682-685).
That stays available for offline parity (surface.py), but this module gives
the same interpolating-spline derivative as pure XLA — a tridiagonal (Thomas)
solve via ``lax.scan`` — so the whole estimation pipeline can run on device,
vmapped over segments.

Boundary condition: not-a-knot (FITPACK's s=0 behaviour); natural is also
provided.  Interior derivatives agree with scipy to ~1e-6 of the signal
scale (tests/test_spline.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def tridiag_solve(dl: jnp.ndarray, d: jnp.ndarray, du: jnp.ndarray,
                  b: jnp.ndarray) -> jnp.ndarray:
    """Thomas algorithm for a tridiagonal system (jittable, O(n) scan).

    dl: [n] sub-diagonal (dl[0] unused), d: [n] diagonal, du: [n]
    super-diagonal (du[-1] unused), b: [n] rhs (or [n, k])."""
    dtype = jnp.result_type(dl, d, du, b)
    dl, d, du, b = (jnp.asarray(x, dtype) for x in (dl, d, du, b))
    def fwd(carry, xs):
        cp_prev, dp_prev = carry
        dl_i, d_i, du_i, b_i = xs
        denom = d_i - dl_i * cp_prev
        cp = du_i / denom
        dp = (b_i - dl_i * dp_prev) / denom
        return (cp, dp), (cp, dp)

    b0 = b[0] / d[0]
    init = (du[0] / d[0], b0)
    xs = (dl[1:], d[1:], du[1:], b[1:])
    _, (cps, dps) = jax.lax.scan(fwd, init, xs)
    cps = jnp.concatenate([jnp.asarray([du[0] / d[0]]), cps])
    dps = jnp.concatenate([b0[None], dps])

    def bwd(x_next, xs):
        cp_i, dp_i = xs
        x_i = dp_i - cp_i * x_next
        return x_i, x_i

    _, xs_rev = jax.lax.scan(bwd, dps[-1], (cps[:-1][::-1], dps[:-1][::-1]))
    return jnp.concatenate([xs_rev[::-1], dps[-1][None]])


@partial(jax.jit, static_argnames=("bc",))
def cubic_spline_m(y: jnp.ndarray, h: float | jnp.ndarray,
                   bc: str = "not-a-knot") -> jnp.ndarray:
    """Second derivatives M[i] of the interpolating cubic spline through
    (i*h, y[i]).  bc: 'not-a-knot' | 'natural'."""
    n = y.shape[0]
    h = jnp.asarray(h, y.dtype)
    rhs_in = 6.0 / (h * h) * (y[:-2] - 2.0 * y[1:-1] + y[2:])  # [n-2]
    if bc == "natural":
        dl = jnp.ones(n - 2, y.dtype)
        d = jnp.full(n - 2, 4.0, y.dtype)
        du = jnp.ones(n - 2, y.dtype)
        m_in = tridiag_solve(dl, d, du, rhs_in)
        return jnp.concatenate([jnp.zeros(1, y.dtype), m_in,
                                jnp.zeros(1, y.dtype)])
    # not-a-knot: M0 = 2 M1 - M2 and Mn-1 = 2 Mn-2 - Mn-3; substituting into
    # the first/last interior rows gives 6 M1 = rhs[0], 6 Mn-2 = rhs[-1],
    # leaving a clean tridiagonal for the remaining interior unknowns.
    m1 = rhs_in[0] / 6.0
    mm2 = rhs_in[-1] / 6.0
    k = n - 4  # unknowns M2..Mn-3
    def with_mid():
        rhs_mid = rhs_in[1:-1]
        rhs_mid = rhs_mid.at[0].add(-m1)
        rhs_mid = rhs_mid.at[-1].add(-mm2)
        dl = jnp.ones(k, y.dtype)
        d = jnp.full(k, 4.0, y.dtype)
        du = jnp.ones(k, y.dtype)
        return tridiag_solve(dl, d, du, rhs_mid)

    if k > 0:
        m_mid = with_mid()
        m = jnp.concatenate([m1[None], m_mid, mm2[None]])
    else:
        m = jnp.stack([m1, mm2])
    m0 = 2.0 * m[0] - m[1]
    mn = 2.0 * m[-1] - m[-2]
    return jnp.concatenate([m0[None], m, mn[None]])


@partial(jax.jit, static_argnames=("bc",))
def spline_derivative(y: jnp.ndarray, h: float | jnp.ndarray,
                      bc: str = "not-a-knot") -> jnp.ndarray:
    """dy/dx of the interpolating cubic spline AT the knots (the quantity the
    reference extracts with spl.derivative()(tfit))."""
    m = cubic_spline_m(y, h, bc=bc)
    h = jnp.asarray(h, y.dtype)
    # right-derivative on each interval start; left-derivative at the end
    d_fwd = (y[1:] - y[:-1]) / h - h / 6.0 * (2.0 * m[:-1] + m[1:])
    d_last = (y[-1] - y[-2]) / h + h / 6.0 * (2.0 * m[-1] + m[-2])
    return jnp.concatenate([d_fwd, d_last[None]])

"""Adaptive Adams-Bashforth-Moulton (PECE) integrator — the reference's
``--method adams`` option (train-s1.py:21, torchdiffeq's second method).

Fixed order 4, adaptive step.  The 4-deep uniform derivative history is
(re)built by error-controlled RK4 starter steps (step-doubling estimate)
whenever the step size changes or near t_end; warm steps use the Milne
device |corrector - predictor| * 19/270.  Dense output is per-step cubic
Hermite, evaluated vectorised over the full output grid in a second phase
(same two-phase TPU design as dopri5.py).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

_AB_NP = np.array([55.0, -59.0, 37.0, -9.0]) / 24.0
_AM_NP = np.array([9.0, 19.0, -5.0, 1.0]) / 24.0
_MILNE = 19.0 / 270.0


def _rk4(rhs, t, y, h):
    k1 = rhs(t, y)
    k2 = rhs(t + 0.5 * h, y + 0.5 * h * k1)
    k3 = rhs(t + 0.5 * h, y + 0.5 * h * k2)
    k4 = rhs(t + h, y + h * k3)
    return y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


@partial(jax.jit, static_argnums=(0,),
         static_argnames=("max_steps", "buffer_size", "return_stats"))
def odeint_adams(
    fn: Callable,
    y0: jnp.ndarray,
    ts: jnp.ndarray,
    args=None,
    *,
    rtol: float = 1e-6,
    atol: float = 1e-8,
    max_steps: int = 100_000,
    buffer_size: int = 8192,
    return_stats: bool = False,
):
    """Integrate dy/dt = fn(t, y, args); returns y at ``ts`` like odeint."""
    rhs = lambda t, y: fn(t, y, args)  # noqa: E731
    dtype = y0.dtype
    ts = ts.astype(dtype)
    t0, t_end = ts[0], ts[-1]
    s = y0.shape[0]
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    nbuf = buffer_size
    h_min = jnp.asarray(1e-10, dtype)

    buf_t = jnp.full((nbuf + 1,), big, dtype)
    buf_h = jnp.ones((nbuf + 1,), dtype)
    buf_y = jnp.zeros((nbuf + 1, s), dtype)
    buf_c = jnp.zeros((nbuf + 1, 3, s), dtype)  # theta..theta^3 coefficients

    _ab = jnp.asarray(_AB_NP, dtype)
    _am = jnp.asarray(_AM_NP, dtype)
    f00 = rhs(t0, y0)
    scale0 = atol + rtol * jnp.abs(y0)
    d1 = jnp.sqrt(jnp.mean((f00 / scale0) ** 2))
    h0 = jnp.clip(0.01 / jnp.maximum(d1, 1e-10), 1e-6, (t_end - t0) / 16.0)

    def write(bufs, idx, t, h, ystart, yend, fstart, fend):
        bt, bh, by, bc = bufs
        delta = (yend - ystart) / h
        coef = jnp.stack([
            fstart,
            3 * delta - 2 * fstart - fend,
            fstart + fend - 2 * delta,
        ])
        return (bt.at[idx].set(t), bh.at[idx].set(h),
                by.at[idx].set(ystart), bc.at[idx].set(coef))

    def body(state):
        (t, y, h, hist, n_hist, n_acc, n_step, alive, bufs) = state
        remaining = t_end - t
        warm = (n_hist >= 4) & (remaining > 4.0 * h)

        def warm_step(_):
            y_p = y + h * jnp.tensordot(_ab, hist, axes=(0, 0))
            f_p = rhs(t + h, y_p)
            fc = jnp.concatenate([f_p[None], hist[:3]])
            y_c = y + h * jnp.tensordot(_am, fc, axes=(0, 0))
            err = _MILNE * jnp.abs(y_c - y_p)
            scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_c))
            ratio = jnp.sqrt(jnp.mean((err / scale) ** 2))
            finite = jnp.all(jnp.isfinite(y_c)) & jnp.isfinite(ratio)
            accept = (ratio <= 1.0) & finite
            f_c = rhs(t + h, y_c)
            grow = accept & (ratio < 0.05)
            h_new = jnp.where(~accept, h * 0.5, jnp.where(grow, h * 2.0, h))
            n_hist_new = jnp.where(accept & ~grow, 4, 0).astype(jnp.int32)
            hist_new = jnp.where(accept,
                                 jnp.concatenate([f_c[None], hist[:3]]), hist)
            return (accept, y_c, f_c, hist[0], h, h_new, hist_new,
                    n_hist_new)

        def cold_step(_):
            # error-controlled RK4 starter (step-doubling estimate)
            h_eff = jnp.minimum(h, remaining)
            clamped = h_eff < h * 0.999
            f_t = rhs(t, y)
            y_full = _rk4(rhs, t, y, h_eff)
            y_half = _rk4(rhs, t + 0.5 * h_eff,
                          _rk4(rhs, t, y, 0.5 * h_eff), 0.5 * h_eff)
            err = jnp.abs(y_full - y_half) * (16.0 / 15.0)
            scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_half))
            ratio = jnp.sqrt(jnp.mean((err / scale) ** 2))
            finite = jnp.all(jnp.isfinite(y_half)) & jnp.isfinite(ratio)
            accept = (ratio <= 1.0) & finite
            f_new = rhs(t + h_eff, y_half)
            h_new = jnp.where(~accept, h * 0.5, h)
            # a clamped (shortened) step breaks uniform spacing
            n_hist_new = jnp.where(accept & ~clamped,
                                   jnp.minimum(n_hist + 1, 4), 0
                                   ).astype(jnp.int32)
            hist_new = jnp.where(accept,
                                 jnp.concatenate([f_new[None], hist[:3]]),
                                 hist)
            return (accept, y_half, f_new, f_t, h_eff, h_new, hist_new,
                    n_hist_new)

        (accept, y_new_c, f_end, f_start, h_used, h_new, hist_new,
         n_hist_new) = jax.lax.cond(warm, warm_step, cold_step, None)

        idx = jnp.where(accept, n_acc, nbuf)
        bufs = write(bufs, idx, t, h_used, y, y_new_c, f_start, f_end)
        t_new = jnp.where(accept, t + h_used, t)
        y_new = jnp.where(accept, y_new_c, y)
        hist = jnp.where(accept, hist_new, hist)
        n_hist = jnp.where(accept, n_hist_new, jnp.int32(0))
        n_acc2 = n_acc + accept.astype(jnp.int32)
        n_step2 = n_step + 1
        h_new = jnp.maximum(h_new, h_min)

        dead = ((n_step2 >= max_steps) | (n_acc2 >= nbuf - 1)
                | (h_new <= h_min * 2))
        alive2 = alive & ~dead & (t_new < t_end - 1e-9 * jnp.abs(t_end))
        return (t_new, y_new, h_new, hist, n_hist, n_acc2, n_step2, alive2,
                bufs)

    def cond(state):
        return state[7]

    init = (t0, y0, h0, jnp.zeros((4, s), dtype), jnp.int32(0),
            jnp.int32(0), jnp.int32(0), jnp.bool_(True),
            (buf_t, buf_h, buf_y, buf_c))
    (t, y, h, hist, n_hist, n_acc, n_step, _alive,
     (bt, bh, by, bc)) = jax.lax.while_loop(cond, body, init)

    ok = (t >= t_end - 1e-6) & jnp.all(jnp.isfinite(y)) & (n_acc > 0)

    idx = jnp.clip(jnp.searchsorted(bt, ts, side="right") - 1, 0,
                   jnp.maximum(n_acc - 1, 0))
    th = jnp.clip((ts - bt[idx]) / bh[idx], 0.0, 1.0)
    tp = jnp.stack([th, th ** 2, th ** 3], axis=-1)
    ys = by[idx] + bh[idx][:, None] * jnp.einsum("tj,tjs->ts", tp, bc[idx])
    ys = ys.at[0].set(y0)
    ys = jnp.where(ok, ys, jnp.full_like(ys, jnp.inf))
    if return_stats:
        from ionflux.solver.dopri5 import SolveStats

        return ys, SolveStats(ok=ok, n_accepted=n_acc, n_steps=n_step)
    return ys

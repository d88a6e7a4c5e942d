"""Adaptive Dormand-Prince RK45 (dopri5) under jit — the TPU-native
replacement for the reference's solver layer (torchdiffeq ``odeint``,
SURVEY.md §1 L3, §3.1).

Design (TPU-first, not a translation):

Phase 1 — adaptive stepping inside a single ``lax.while_loop`` with a PI-style
step controller.  Each *accepted* step appends (t0, h, y0, K[7,S]) into
fixed-size device buffers via predicated dynamic updates; rejected steps write
into a trash slot.  No host round trips: the voltage lookup is a gather inside
the jitted RHS (protocols.voltage), removing the reference's per-RHS-eval
device->host->scipy->device round trip (train-s1.py:224-225).

Phase 2 — dense output evaluated *vectorised over the whole output grid*:
searchsorted the output times into the accepted-step starts, gather the step
coefficients, and evaluate the quartic interpolant for all T points in one
batched einsum.  For the reference's up-to-100k-point grids this turns the
output interpolation into pure VPU work instead of a sequential loop.

Failure detection: non-finite states or step-budget/buffer exhaustion flip an
``ok`` flag instead of raising — callers (e.g. the CMA-ES objective) map
!ok -> inf loss, replacing the reference's SIGALRM timeout sentinel
(train-d0.py:304-318, 427-438).

Discontinuous forcing: optional sorted ``breakpoints`` clamp steps so no step
straddles a protocol discontinuity — the jit-friendly replacement for
torchdiffeq's ``options={"grid_points": ...}`` hints (train-d0.py:436).

Batch: use ``jax.vmap(lambda p, y0: odeint(...))`` — the while_loop runs in
lockstep across lanes until all lanes finish; throughput on TPU comes from
this batching (protocol sweeps, CMA-ES populations; SURVEY.md §5.8).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# --- Dormand-Prince 5(4) tableau (Dormand & Prince 1980; Hairer I, Table 5.2)
_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = np.zeros((7, 7))
_A[1, :1] = [1 / 5]
_A[2, :2] = [3 / 40, 9 / 40]
_A[3, :3] = [44 / 45, -56 / 15, 32 / 9]
_A[4, :4] = [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729]
_A[5, :5] = [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656]
_A[6, :6] = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]
_B_SOL = _A[6]  # 5th-order weights (FSAL: k7 = f(t+h, y1))
_B4 = np.array([5179 / 57600, 0.0, 7571 / 16695, 393 / 640,
                -92097 / 339200, 187 / 2100, 1 / 40])
_B_ERR = _B_SOL - _B4

# 4th-order dense-output polynomial in theta=(t-t0)/h (Shampine 1986; the
# standard DOPRI5 continuous extension, same family scipy's RK45 uses):
# y(t0+theta*h) = y0 + h * sum_i (P @ [th, th^2, th^3, th^4])_i * k_i
_P_DENSE = np.array([
    [1.0, -8048581381 / 2820520608, 8663915743 / 2820520608,
     -12715105075 / 11282082432],
    [0.0, 0.0, 0.0, 0.0],
    [0.0, 131558114200 / 32700410799, -68118460800 / 10900136933,
     87487479700 / 32700410799],
    [0.0, -1754552775 / 470086768, 14199869525 / 1410260304,
     -10690763975 / 1880347072],
    [0.0, 127303824393 / 49829197408, -318862633887 / 49829197408,
     701980252875 / 199316789632],
    [0.0, -282668133 / 205662961, 2019193451 / 616988883,
     -1453857185 / 822651844],
    [0.0, 40617522 / 29380423, -110615467 / 29380423, 69997945 / 29380423],
])

SAFETY = 0.9
MIN_FACTOR = 0.2
MAX_FACTOR = 10.0


class SolveStats(NamedTuple):
    ok: jnp.ndarray        # bool — solve reached t_end with finite state
    n_accepted: jnp.ndarray
    n_steps: jnp.ndarray


def _rms(x):
    return jnp.sqrt(jnp.mean(jnp.square(x)))


def _initial_step(rhs, t0, y0, f0, rtol, atol):
    """Hairer/Norsett/Wanner starting-step heuristic (Hairer I, p. 169)."""
    dtype = y0.dtype
    scale = atol + jnp.abs(y0) * rtol
    d0 = _rms(y0 / scale)
    d1 = _rms(f0 / scale)
    small = (d0 < 1e-5) | (d1 < 1e-5)
    h0 = jnp.where(small, jnp.asarray(1e-6, dtype), 0.01 * d0 / jnp.maximum(d1, 1e-30))
    y1 = y0 + h0 * f0
    f1 = rhs(t0 + h0, y1)
    d2 = _rms((f1 - f0) / scale) / h0
    dmax = jnp.maximum(d1, d2)
    h1 = jnp.where(
        dmax <= 1e-15,
        jnp.maximum(jnp.asarray(1e-6, dtype), h0 * 1e-3),
        (0.01 / dmax) ** 0.2,
    )
    h = jnp.minimum(100.0 * h0, h1)
    return jnp.where(jnp.isfinite(h) & (h > 0), h, jnp.asarray(1e-6, dtype))


def _rk_step(rhs, t, y, f0, h, tab):
    """One dopri5 step. Returns y1, f1 (FSAL), K [7,S], err [S]."""
    c, a, b_sol, b_err = tab

    def stage(i, k):
        ti = t + c[i] * h
        yi = y + h * jnp.tensordot(a[i], k, axes=(0, 0))
        fi = rhs(ti, yi)
        return k.at[i].set(fi)

    k = jnp.zeros((7,) + y.shape, dtype=y.dtype).at[0].set(f0)
    k = jax.lax.fori_loop(1, 7, stage, k, unroll=True)
    y1 = y + h * jnp.tensordot(b_sol, k, axes=(0, 0))
    err = h * jnp.tensordot(b_err, k, axes=(0, 0))
    return y1, k[6], k, err


@partial(jax.jit, static_argnums=(0,), static_argnames=("max_steps", "buffer_size", "return_stats"))
def odeint(
    fn: Callable,
    y0: jnp.ndarray,
    ts: jnp.ndarray,
    args=None,
    *,
    rtol: float = 1e-6,
    atol: float = 1e-8,
    max_steps: int = 100_000,
    buffer_size: int = 4096,
    breakpoints: jnp.ndarray | None = None,
    dt_max: float | None = None,
    return_stats: bool = False,
    error_weight: jnp.ndarray | None = None,
):
    """Integrate dy/dt = fn(t, y, args) from ts[0], returning y at all ``ts``.

    fn: (t, y[S], args) -> dy[S] — keep ``fn`` a module-level function and
    pass parameters/protocols through the traced ``args`` pytree so repeated
    calls hit the jit cache. ts: ascending [T]. Returns ys [T, S]
    (and SolveStats if return_stats).

    error_weight [S] (optional) defines a SEMINORM for step control:
    ratio = sqrt(sum(w*(err/scale)^2)/sum(w)).  Zero-weight components are
    integrated but not error-controlled — e.g. quadrature outputs whose
    derivative does not depend on themselves, like the parameter-cotangent
    block of the adjoint's augmented state (Kidger et al. 2021,
    'Hey, that's not an ODE', PAPERS.md)."""
    rhs = lambda t, y: fn(t, y, args)  # noqa: E731
    dtype = y0.dtype
    ts = ts.astype(dtype)
    t0 = ts[0]
    t_end = ts[-1]
    tab = tuple(jnp.asarray(x, dtype=dtype) for x in (_C, _A, _B_SOL, _B_ERR))
    p_dense = jnp.asarray(_P_DENSE, dtype=dtype)
    rtol = jnp.asarray(rtol, dtype)
    atol = jnp.asarray(atol, dtype)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    h_min = jnp.maximum((t_end - t0), 1.0) * jnp.asarray(1e-12, dtype)

    if breakpoints is not None:
        bp = jnp.concatenate([
            breakpoints.astype(dtype).reshape(-1), jnp.full((1,), big, dtype)
        ])
    else:
        bp = None

    f0 = rhs(t0, y0)
    h_init = _initial_step(rhs, t0, y0, f0, rtol, atol)
    if dt_max is not None:
        h_init = jnp.minimum(h_init, jnp.asarray(dt_max, dtype))

    s = y0.shape[0]
    nbuf = buffer_size
    buf_t = jnp.full((nbuf + 1,), big, dtype)
    buf_h = jnp.ones((nbuf + 1,), dtype)
    buf_y = jnp.zeros((nbuf + 1, s), dtype)
    buf_k = jnp.zeros((nbuf + 1, 7, s), dtype)

    def cond(state):
        t, y, f, h, n_acc, n_step, alive = state[:7]
        return alive

    def body(state):
        t, y, f, h, n_acc, n_step, alive, bt, bh, by, bk = state
        # clamp the step: never overshoot t_end, never straddle a breakpoint
        h_eff = jnp.minimum(h, t_end - t)
        if bp is not None:
            nxt = bp[jnp.searchsorted(bp, t, side="right")]
            h_eff = jnp.minimum(h_eff, nxt - t)
        h_eff = jnp.maximum(h_eff, h_min)

        y1, f1, k, err = _rk_step(rhs, t, y, f, h_eff, tab)
        scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y1))
        if error_weight is None:
            ratio = _rms(err / scale)
        else:
            # guard the all-zero weight vector: 0/0 would yield a NaN
            # ratio that reads as non-finite and permanently rejects
            # every step until max_steps exhausts
            wsum = jnp.maximum(jnp.sum(error_weight),
                               jnp.asarray(jnp.finfo(dtype).tiny, dtype))
            ratio = jnp.sqrt(
                jnp.sum(error_weight * jnp.square(err / scale)) / wsum)
        finite = jnp.all(jnp.isfinite(y1)) & jnp.isfinite(ratio)
        accept = (ratio <= 1.0) & finite

        idx = jnp.where(accept, n_acc, nbuf)  # trash slot on reject
        bt = bt.at[idx].set(t)
        bh = bh.at[idx].set(h_eff)
        by = by.at[idx].set(y)
        bk = bk.at[idx].set(k)

        t_new = jnp.where(accept, t + h_eff, t)
        y_new = jnp.where(accept, y1, y)
        f_new = jnp.where(accept, f1, f)
        n_acc_new = n_acc + accept.astype(jnp.int32)

        factor = SAFETY * jnp.power(jnp.maximum(ratio, 1e-10), -0.2)
        factor = jnp.where(jnp.isfinite(factor), factor, MIN_FACTOR)
        max_up = jnp.where(accept, MAX_FACTOR, 1.0)
        h_new = h_eff * jnp.clip(factor, MIN_FACTOR, max_up)
        if dt_max is not None:
            h_new = jnp.minimum(h_new, jnp.asarray(dt_max, dtype))

        n_step_new = n_step + 1
        done = t_new >= t_end
        dead = (~jnp.isfinite(ratio) & (h_eff <= h_min * 2)) | (n_step_new >= max_steps) | (n_acc_new >= nbuf)
        alive_new = alive & ~done & ~dead
        return (t_new, y_new, f_new, h_new, n_acc_new, n_step_new, alive_new,
                bt, bh, by, bk)

    init = (t0, y0, f0, h_init, jnp.int32(0), jnp.int32(0), jnp.bool_(True),
            buf_t, buf_h, buf_y, buf_k)
    t, y, f, h, n_acc, n_step, _alive, bt, bh, by, bk = jax.lax.while_loop(cond, body, init)
    ok = (t >= t_end) & jnp.all(jnp.isfinite(y)) & (n_acc > 0)

    # ---- phase 2: vectorised dense output over the full grid --------------
    idx = jnp.clip(jnp.searchsorted(bt, ts, side="right") - 1, 0,
                   jnp.maximum(n_acc - 1, 0))
    th = jnp.clip((ts - bt[idx]) / bh[idx], 0.0, 1.0)
    tp = jnp.stack([th, th ** 2, th ** 3, th ** 4], axis=-1)       # [T,4]
    bpoly = tp @ p_dense.T                                          # [T,7]
    kk = bk[idx]                                                    # [T,7,S]
    ys = by[idx] + bh[idx][:, None] * jnp.einsum("tj,tjs->ts", bpoly, kk)
    ys = ys.at[0].set(y0)
    ys = jnp.where(ok, ys, jnp.full_like(ys, jnp.inf))

    if return_stats:
        return ys, SolveStats(ok=ok, n_accepted=n_acc, n_steps=n_step)
    return ys

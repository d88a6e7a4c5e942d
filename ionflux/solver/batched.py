"""Batched-lane adaptive dopri5: B systems in lockstep under ONE controller.

Why not vmap(odeint)?  Under vmap the per-lane dense-output buffer writes
(`buf.at[n_acc].set(...)` with per-lane n_acc) lower to scatters, which XLA
copies every while-loop iteration — measured cost grows linearly with the
buffer size and dominates the solve.  Here the step index is a SCALAR, the
buffers are [nbuf, 7, B, S] written with an in-place dynamic-update-slice,
and the controller is shared: a step is accepted when the max error ratio
over lanes passes (each lane still meets its own tolerance; lanes just share
step boundaries).  This is the population/sweep fast path — 3x faster than
vmap(odeint) on the benchmark workload at equal accuracy.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ionflux.solver.dopri5 import (
    MAX_FACTOR,
    MIN_FACTOR,
    SAFETY,
    SolveStats,
    _A,
    _B_ERR,
    _B_SOL,
    _C,
    _P_DENSE,
    _initial_step,
    _rk_step,
)


@partial(jax.jit, static_argnums=(0,),
         static_argnames=("max_steps", "buffer_size", "return_stats"))
def odeint_batched(
    fn: Callable,
    y0: jnp.ndarray,               # [B, S]
    ts: jnp.ndarray,               # [T]
    args=None,
    *,
    rtol: float = 1e-6,
    atol: float = 1e-8,
    max_steps: int = 100_000,
    buffer_size: int = 4096,
    return_stats: bool = False,
):
    """Integrate dy/dt = fn(t, y, args) for B systems in lockstep.

    fn maps (t, y [B, S], args) -> dy [B, S] (e.g. a vmapped-RHS closure or a
    batched MLP). Returns ys [B, T, S]; diverged batches poison the whole
    solve to inf (use per-lane vmap when isolation matters).
    """
    rhs = lambda t, y: fn(t, y, args)  # noqa: E731
    dtype = y0.dtype
    ts = ts.astype(dtype)
    t0, t_end = ts[0], ts[-1]
    b, s = y0.shape
    tab = tuple(jnp.asarray(x, dtype) for x in (_C, _A, _B_SOL, _B_ERR))
    p_dense = jnp.asarray(_P_DENSE, dtype)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    h_min = jnp.maximum(t_end - t0, 1.0) * jnp.asarray(1e-12, dtype)
    nbuf = buffer_size

    f0 = rhs(t0, y0)
    h0 = _initial_step(rhs, t0, y0, f0, jnp.asarray(rtol, dtype),
                       jnp.asarray(atol, dtype))

    buf_t = jnp.full((nbuf + 1,), big, dtype)
    buf_h = jnp.ones((nbuf + 1,), dtype)
    buf_y = jnp.zeros((nbuf + 1, b, s), dtype)
    buf_k = jnp.zeros((nbuf + 1, 7, b, s), dtype)

    def cond(state):
        return state[6]

    def body(state):
        t, y, f, h, n_acc, n_step, alive, bt, bh, by, bk = state
        h_eff = jnp.maximum(jnp.minimum(h, t_end - t), h_min)

        y1, f1, k, err = _rk_step(rhs, t, y, f, h_eff, tab)
        scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y1))
        # per-lane RMS, shared accept on the worst lane
        ratio = jnp.sqrt(jnp.max(jnp.mean((err / scale) ** 2, axis=-1)))
        finite = jnp.all(jnp.isfinite(y1)) & jnp.isfinite(ratio)
        accept = (ratio <= 1.0) & finite

        idx = jnp.where(accept, n_acc, nbuf)  # scalar index -> in-place DUS
        bt = bt.at[idx].set(t)
        bh = bh.at[idx].set(h_eff)
        by = by.at[idx].set(y)
        bk = bk.at[idx].set(k)

        t_new = jnp.where(accept, t + h_eff, t)
        y_new = jnp.where(accept, y1, y)
        f_new = jnp.where(accept, f1, f)
        n_acc2 = n_acc + accept.astype(jnp.int32)
        factor = SAFETY * jnp.power(jnp.maximum(ratio, 1e-10), -0.2)
        factor = jnp.where(jnp.isfinite(factor), factor, MIN_FACTOR)
        h_new = h_eff * jnp.clip(factor, MIN_FACTOR,
                                 jnp.where(accept, MAX_FACTOR, 1.0))
        n2 = n_step + 1
        done = t_new >= t_end
        dead = ((~jnp.isfinite(ratio) & (h_eff <= h_min * 2))
                | (n2 >= max_steps) | (n_acc2 >= nbuf))
        return (t_new, y_new, f_new, h_new, n_acc2, n2,
                alive & ~done & ~dead, bt, bh, by, bk)

    init = (t0, y0, f0, h0, jnp.int32(0), jnp.int32(0), jnp.bool_(True),
            buf_t, buf_h, buf_y, buf_k)
    (t, y, f, h, n_acc, n_step, _a, bt, bh, by, bk) = jax.lax.while_loop(
        cond, body, init)
    ok = (t >= t_end) & jnp.all(jnp.isfinite(y)) & (n_acc > 0)

    idx = jnp.clip(jnp.searchsorted(bt, ts, side="right") - 1, 0,
                   jnp.maximum(n_acc - 1, 0))
    th = jnp.clip((ts - bt[idx]) / bh[idx], 0.0, 1.0)
    tp = jnp.stack([th, th ** 2, th ** 3, th ** 4], axis=-1)
    bpoly = tp @ p_dense.T                                    # [T, 7]
    ys = by[idx] + bh[idx][:, None, None] * jnp.einsum(
        "tj,tjbs->tbs", bpoly, bk[idx])
    ys = ys.at[0].set(y0)
    ys = jnp.transpose(ys, (1, 0, 2))                         # [B, T, S]
    ys = jnp.where(ok, ys, jnp.full_like(ys, jnp.inf))
    if return_stats:
        return ys, SolveStats(ok=ok, n_accepted=n_acc, n_steps=n_step)
    return ys

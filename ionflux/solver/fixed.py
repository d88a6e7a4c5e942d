"""Fixed-step integrators under ``lax.scan`` — fully differentiable.

The reference never backpropagates through a solve (SURVEY.md §3.2 note), but
wires ``odeint_adjoint`` up as a capability (train-s1.py:29-32).  Here the
differentiable path is first-class: RK4 over the output grid with optional
substeps, rematerialised with ``jax.checkpoint`` so 100k-point grids fit HBM
during reverse-mode AD.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def _rk4_step(rhs, t, y, h):
    k1 = rhs(t, y)
    k2 = rhs(t + 0.5 * h, y + 0.5 * h * k1)
    k3 = rhs(t + 0.5 * h, y + 0.5 * h * k2)
    k4 = rhs(t + h, y + h * k3)
    return y + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


@partial(jax.jit, static_argnums=(0,), static_argnames=("n_sub", "checkpoint"))
def odeint_rk4(
    fn: Callable,
    y0: jnp.ndarray,
    ts: jnp.ndarray,
    args=None,
    *,
    n_sub: int = 1,
    checkpoint: bool = True,
):
    """Classic RK4 with ``n_sub`` substeps per output interval.

    fn: (t, y, args) -> dy. Returns ys [T, S]; differentiable w.r.t.
    (y0, args) via scan; each output interval is rematerialised when
    ``checkpoint`` (sqrt-memory backprop over long grids).
    """
    rhs = lambda t, y: fn(t, y, args)  # noqa: E731
    ts = ts.astype(y0.dtype)

    def interval(y, t0t1):
        t0, t1 = t0t1
        h = (t1 - t0) / n_sub

        def sub(i, yy):
            return _rk4_step(rhs, t0 + i * h, yy, h)

        y1 = jax.lax.fori_loop(0, n_sub, sub, y)
        return y1, y1

    if checkpoint:
        interval = jax.checkpoint(interval)

    _, ys = jax.lax.scan(interval, y0, (ts[:-1], ts[1:]))
    return jnp.concatenate([y0[None], ys], axis=0)

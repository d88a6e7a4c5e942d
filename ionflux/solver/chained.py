"""Segment-chained integration: solve a long concatenated recording as a
`lax.scan` of per-sweep solves on LOCAL time axes, carrying state across
sweeps.

Why: the reference fits one trace spanning 146 s of concatenated Pr3+Pr5
sweeps (train-d0.py:489-505).  A single f32 time axis that long loses
resolution (ulp(146000 ms) ~ 0.016 ms) — steps near protocol ramps stall.
Restarting the clock per sweep keeps f32 exact where it matters and lets the
adaptive controller restart cleanly at each discontinuity block (the jit-era
replacement for torchdiffeq's grid_points hints; SURVEY.md §5.7).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ionflux.solver.dopri5 import odeint


@partial(jax.jit, static_argnums=(0,),
         static_argnames=("rtol", "atol", "max_steps", "buffer_size"))
def odeint_chained(
    fn: Callable,
    y0: jnp.ndarray,
    ts: jnp.ndarray,
    segments,
    args=None,
    *,
    rtol: float = 1e-6,
    atol: float = 1e-8,
    max_steps: int = 100_000,
    buffer_size: int = 4096,
):
    """Integrate across stacked same-shape segments, chaining final states.

    fn: (t, y, (args, segment)) -> dy, with t LOCAL to the segment.
    ts: [T] local output grid shared by all segments.
    segments: pytree whose leaves have a leading segment axis [B, ...]
      (e.g. protocols.stack(...) of equal-length sweeps).
    Returns ys [B, T, S].  A diverged segment poisons its successors with
    inf (the whole-trace objective then rejects the parameters).
    """

    def seg(y, segment):
        ys = odeint(fn, y, ts, (args, segment), rtol=rtol, atol=atol,
                    max_steps=max_steps, buffer_size=buffer_size)
        return ys[-1], ys

    _, ys = jax.lax.scan(seg, y0, segments)
    return ys

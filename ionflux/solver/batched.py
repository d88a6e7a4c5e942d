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
         static_argnames=("max_steps", "buffer_size", "return_stats",
                          "sleep_tol"))
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
    sleep_tol: float | None = None,
    sleep_h_max: float | None = None,
):
    """Integrate dy/dt = fn(t, y, args) for B systems in lockstep.

    fn maps (t, y [B, S], args) -> dy [B, S] (e.g. a vmapped-RHS closure or a
    batched MLP). Returns ys [B, T, S].  Divergence is isolated PER LANE: a
    lane that stays non-finite at the minimum step size is marked dead,
    excluded from the shared controller, frozen, and returned as inf — the
    remaining lanes keep their accuracy (reference per-member sentinel:
    train-d0.py:427-438; one bad CMA-ES member must not erase the
    generation's ranking information).

    sleep_tol (opt-in) enables PER-COMPONENT EARLY-EXIT, the lockstep
    answer to the reference's per-solve independence (each odeint its own
    loop, train-d0.py:427-439): a state component that has SETTLED — its
    worst-case remaining drift |f|*(t_end - t), or for a contracting
    (stiff) component its implied distance to equilibrium |f|/|df/dy|,
    inside sleep_tol * (atol + rtol|y|) — FREEZES: it is treated as a
    constant in the vector field (its stage derivatives masked to zero)
    and so leaves the shared error controller.  A settled stiff gate stops pinning
    everyone's step size: an RK45 component at a stiff equilibrium still
    step-limits through its stability bound; freezing it lets h grow to
    the remaining dynamics' accuracy limit.  Every accepted step re-probes
    the full RHS at the new states, so a frozen component WAKES the moment
    the forcing moves its equilibrium (voltage step/sweep) and resumes
    from its frozen value; the probe costs one extra batched RHS eval per
    step (the FSAL reuse is given up), so sleeping pays off when settled
    phases dominate — heterogeneous populations on long step protocols.
    sleep_h_max bounds h while anything sleeps (with everything asleep
    nothing constrains h, and a step across an upcoming protocol edge
    would wake the components one step late).  sleep_tol ~ 0.1 keeps the
    frozen drift well inside tolerance.
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
    h_cap = jnp.asarray(sleep_h_max if sleep_h_max is not None
                        else jnp.finfo(dtype).max, dtype)
    nbuf = buffer_size

    f0 = rhs(t0, y0)
    h0 = _initial_step(rhs, t0, y0, f0, jnp.asarray(rtol, dtype),
                       jnp.asarray(atol, dtype))

    buf_t = jnp.full((nbuf + 1,), big, dtype)
    buf_h = jnp.ones((nbuf + 1,), dtype)
    buf_y = jnp.zeros((nbuf + 1, b, s), dtype)
    buf_k = jnp.zeros((nbuf + 1, 7, b, s), dtype)

    # lanes that start non-finite are dead from step 0
    lane_ok0 = jnp.all(jnp.isfinite(y0), axis=-1) & jnp.all(
        jnp.isfinite(f0), axis=-1)

    def _settled(t, y, f, lam):
        """Component safe to freeze: EITHER its worst-case linear drift
        over the whole remaining span |f|*(t_end - t) is inside
        sleep_tol * tol (slow/neutral components), OR it is CONTRACTING
        with rate lam ~ |df/dy| and its implied distance to the moving
        equilibrium |f|/lam is inside sleep_tol * tol (stiff components —
        the ones whose stability bound pins the shared step; a settled
        stiff gate hovers at |f| ~ lam * local-error, far above any
        span-based bound, which is why a drift-only criterion never fires
        for exactly the lanes worth freezing).  [B, S]."""
        span = jnp.maximum(t_end - t, h_min)
        scale = atol + rtol * jnp.abs(y)
        return jnp.abs(f) <= sleep_tol * scale * jnp.maximum(lam, 1.0 / span)

    def cond(state):
        return state[6]

    def body(state):
        (t, y, f, h, n_acc, n_step, alive, lane_ok, frozen, lam,
         bt, bh, by, bk) = state
        h_lim = jnp.where(jnp.any(frozen), h_cap, big)
        h_eff = jnp.maximum(
            jnp.minimum(jnp.minimum(h, h_lim), t_end - t), h_min)

        if sleep_tol is not None:
            # frozen components are constants in the vector field: masking
            # their stage derivatives to zero keeps them at y through every
            # stage (so coupled RHS terms see the frozen VALUE, never a
            # garbage extrapolation), zeroes their error contribution, and
            # makes the stored dense-output k rows interpolate them flat
            rhs_step = lambda tt, yy: jnp.where(  # noqa: E731
                frozen, 0.0, rhs(tt, yy))
        else:
            rhs_step = rhs
        y1, f1, k, err = _rk_step(rhs_step, t, y, f, h_eff, tab)
        scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y1))
        if sleep_tol is not None:
            # wake probe at the CANDIDATE end state, BEFORE acceptance:
            # frozen components are charged a first-order drift error
            # |f_probe|*h, so a step that crosses a forcing change (the
            # probe sees the frozen component's equilibrium move) is
            # REJECTED and retried smaller rather than slept through —
            # frozen components keep first-order error control while the
            # active ones keep fifth-order
            f_probe = rhs(t + h_eff, y1)
            err = err + jnp.where(frozen, f_probe * h_eff, 0.0)
        ratio_l = jnp.sqrt(jnp.mean((err / scale) ** 2, axis=-1))   # [B]
        lane_fin = jnp.all(jnp.isfinite(y1), axis=-1) & jnp.isfinite(ratio_l)
        # shared accept on the worst LIVE lane; dead lanes never block
        any_bad = jnp.any(lane_ok & ~lane_fin)
        ratio = jnp.max(jnp.where(lane_ok & lane_fin, ratio_l, 0.0))
        accept = (ratio <= 1.0) & ~any_bad
        # a live lane that cannot pass even at the minimum step size —
        # non-finite, or error ratio still > 1 (finite-time blow-up pins h
        # at h_min without ever overflowing) — is dead: exclude it from the
        # controller and freeze its state from now on
        lane_pass = lane_fin & (ratio_l <= 1.0)
        lane_ok2 = lane_ok & (lane_pass | (h_eff > h_min * 2))

        idx = jnp.where(accept, n_acc, nbuf)  # scalar index -> in-place DUS
        bt = bt.at[idx].set(t)
        bh = bh.at[idx].set(h_eff)
        by = by.at[idx].set(y)
        bk = bk.at[idx].set(k)

        adv = accept & lane_ok2                              # [B]
        t_new = jnp.where(accept, t + h_eff, t)
        y_new = jnp.where(adv[:, None], y1, y)
        if sleep_tol is not None:
            # on accept the probe IS the new state's full RHS (y_new == y1
            # for advanced lanes, frozen components held at y); settle /
            # wake both flow from it.  Per-component contraction-rate
            # estimate lam ~ |df/dy| from the step just taken (active
            # components only; a tiny dy means no information — keep the
            # old estimate, which errs toward NOT freezing)
            dy = jnp.abs(y1 - y)
            df = jnp.abs(f_probe - jnp.where(frozen, f_probe, f))
            upd = adv[:, None] & ~frozen & (dy > 1e-3 * scale)
            lam2 = jnp.where(upd, df / jnp.maximum(dy, 1e-30), lam)
            frozen2 = jnp.where(accept,
                                _settled(t_new, y_new, f_probe, lam2)
                                & jnp.isfinite(f_probe), frozen)
            f_new = jnp.where(accept, jnp.where(frozen2, 0.0, f_probe), f)
        else:
            f_new = jnp.where(adv[:, None], f1, f)
            frozen2 = frozen
            lam2 = lam
        n_acc2 = n_acc + accept.astype(jnp.int32)
        factor = SAFETY * jnp.power(jnp.maximum(ratio, 1e-10), -0.2)
        # non-finite live lane: shrink hard (rescues transient overflow;
        # if it persists to h_min the lane is declared dead above)
        factor = jnp.where(any_bad | ~jnp.isfinite(factor), MIN_FACTOR,
                           factor)
        h_new = h_eff * jnp.clip(factor, MIN_FACTOR,
                                 jnp.where(accept, MAX_FACTOR, 1.0))
        n2 = n_step + 1
        done = t_new >= t_end
        dead = (~jnp.any(lane_ok2)
                | (n2 >= max_steps) | (n_acc2 >= nbuf))
        return (t_new, y_new, f_new, h_new, n_acc2, n2,
                alive & ~done & ~dead, lane_ok2, frozen2, lam2,
                bt, bh, by, bk)

    lam0 = jnp.zeros((b, s), dtype)
    if sleep_tol is not None:
        frozen0 = _settled(t0, y0, f0, lam0) & lane_ok0[:, None]
        f0 = jnp.where(frozen0, 0.0, f0)
    else:
        frozen0 = jnp.zeros((b, s), bool)
    init = (t0, y0, f0, h0, jnp.int32(0), jnp.int32(0), jnp.bool_(True),
            lane_ok0, frozen0, lam0, buf_t, buf_h, buf_y, buf_k)
    (t, y, f, h, n_acc, n_step, _a, lane_ok, _frozen, _lam,
     bt, bh, by, bk) = jax.lax.while_loop(cond, body, init)
    ok = (lane_ok & (t >= t_end) & jnp.all(jnp.isfinite(y), axis=-1)
          & (n_acc > 0))                                     # [B]

    idx = jnp.clip(jnp.searchsorted(bt, ts, side="right") - 1, 0,
                   jnp.maximum(n_acc - 1, 0))
    th = jnp.clip((ts - bt[idx]) / bh[idx], 0.0, 1.0)
    tp = jnp.stack([th, th ** 2, th ** 3, th ** 4], axis=-1)
    bpoly = tp @ p_dense.T                                    # [T, 7]
    ys = by[idx] + bh[idx][:, None, None] * jnp.einsum(
        "tj,tjbs->tbs", bpoly, bk[idx])
    ys = ys.at[0].set(y0)
    ys = jnp.transpose(ys, (1, 0, 2))                         # [B, T, S]
    ys = jnp.where(ok[:, None, None], ys, jnp.inf)            # per-lane fill
    if return_stats:
        return ys, SolveStats(ok=ok, n_accepted=n_acc, n_steps=n_step)
    return ys


def odeint_batched_chunked(
    fn: Callable,
    y0: jnp.ndarray,               # [B, S]
    ts: jnp.ndarray,               # [T]
    args=None,
    *,
    max_lanes: int = 64,
    lane_leaf=None,
    sort_lanes: bool = False,
    **kw,
):
    """odeint_batched for large populations: split the B lanes into
    sequential chunks of <= max_lanes (one lax.map, one compile).

    Why: per-lane parameters (e.g. a 0.97 MB MLP per CMA-ES member) stay
    VMEM-resident only up to ~64 lanes on a v5e chip; beyond that
    throughput collapses (measured: 604 solves/s at b=64 vs 129 at b=512
    unchunked — bench.py scaling probe).  Root cause, confirmed by HLO +
    device-profile diff (round 4): XLA computes these dots at bf16 (the
    chip's DEFAULT matmul precision) and memory-space assignment pins the
    bf16 weight images in VMEM — 5 x 5.12 MB at b=64 fits, so the while
    body is pure fusions; 5 x 10.24 MB at b=128 exceeds the budget, the
    weights demote to HBM, and XLA inserts per-WHILE-ITERATION prefetch
    copies (copy.16x, 51.2 MB/iter ~ 132 us at ~390 GB/s effective) that
    double the per-step wall.  bf16-STORED weights do not help — the
    resident/streamed image is already bf16 either way (measured: 266
    solves/s at b=128 with either storage).  Chunking keeps each solve at
    the VMEM sweet spot.

    sort_lanes=True additionally orders lanes by a per-lane stiffness proxy
    (the error-weighted |f(t0, y0)| that drives the initial step size)
    before chunking, so a heterogeneous population — e.g. a CMA-ES
    generation spanning decades of rate constants — groups similarly-stiff
    members per chunk: each lockstep controller only slows for its own
    chunk's stiffest lane instead of every chunk dragging at the global
    minimum step.  Results are returned in the caller's lane order.

    Lane-carrying leaves of ``args`` are auto-detected as arrays whose
    leading dimension equals B (override with ``lane_leaf``, a predicate
    leaf -> bool).  ``Protocol`` subtrees are ALWAYS treated as shared —
    a protocol is never per-lane in this codebase, and a knot array whose
    length coincidentally equals the population size must not be silently
    split into per-chunk slices.  For any other shared leaf whose leading
    dim happens to equal B, pass an explicit ``lane_leaf``.
    Shared leaves are passed to every chunk unchanged.
    fn sees chunk-shaped inputs: (t, y [max_lanes, S], chunk_args).
    """
    from ionflux.protocols import Protocol

    b = y0.shape[0]
    if b <= max_lanes:
        return odeint_batched(fn, y0, ts, args, **kw)
    if lane_leaf is None:
        def lane_leaf(x):
            return (hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1
                    and x.shape[0] == b)

    def _is_proto(x):
        return isinstance(x, Protocol)

    def tmap(f, tree, *rest):
        # Protocol subtrees ride as opaque shared leaves
        return jax.tree.map(
            lambda x, *r: x if _is_proto(x) else f(x, *r), tree, *rest,
            is_leaf=_is_proto)

    n_chunks = -(-b // max_lanes)
    pad = n_chunks * max_lanes - b

    inv = None
    if sort_lanes:
        rtol = kw.get("rtol", 1e-6)
        atol = kw.get("atol", 1e-8)
        f0 = fn(ts[0], y0, args)
        scale = atol + rtol * jnp.abs(y0)
        stiff = jnp.sqrt(jnp.mean(jnp.square(f0 / scale), axis=-1))  # [B]
        order = jnp.argsort(stiff)
        inv = jnp.argsort(order)
        y0 = y0[order]
        args = tmap(
            lambda x: jnp.asarray(x)[order] if lane_leaf(x) else x, args)

    def split(x):
        if not lane_leaf(x):
            return x
        x = jnp.asarray(x)
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
        return x.reshape((n_chunks, max_lanes) + x.shape[1:])

    is_lane = tmap(lambda x: bool(lane_leaf(x)), args)
    chunked_args = tmap(split, args)
    y0c = split(y0)

    def one(chunk):
        y0_k, args_k = chunk
        return odeint_batched(fn, y0_k, ts, args_k, **kw)

    # rebuild per-chunk args by selecting the chunk slice of lane leaves
    def gather_args(k):
        return tmap(
            lambda x, lane: x[k] if lane else x, chunked_args, is_lane)

    return_stats = kw.get("return_stats", False)
    outs = jax.lax.map(lambda k: one((y0c[k], gather_args(k))),
                       jnp.arange(n_chunks))
    if return_stats:
        ys, st = outs
        ys = ys.reshape((n_chunks * max_lanes,) + ys.shape[2:])[:b]
        ok = st.ok.reshape(-1)[:b]
        if inv is not None:
            ys, ok = ys[inv], ok[inv]
        st = SolveStats(ok=ok, n_accepted=jnp.max(st.n_accepted),
                        n_steps=jnp.sum(st.n_steps))
        return ys, st
    ys = outs.reshape((n_chunks * max_lanes,) + outs.shape[2:])[:b]
    return ys if inv is None else ys[inv]

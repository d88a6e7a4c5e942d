"""Exact analytic propagation on piecewise-constant voltage protocols.

The reference integrates every model numerically (torchdiffeq ``odeint``,
train-s1.py:556-595, train-d0.py:427-439) even though its two ground-truth
families are LINEAR time-invariant systems within each constant-voltage
segment of a step protocol:

- the candidate HH gates decouple into two scalar linear ODEs
  ``dx/dt = k_on (1 - x) - k_off x`` with the closed form
  ``x(t) = x_inf + (x0 - x_inf) exp(-t / tau)`` (train-s1.py:169-175), and
- the 3-state Markov ground truth is ``dy/dt = A(V) y`` with a constant
  6x6 generator per segment (train-d0.py:72-125), solved exactly by
  ``y(t) = expm(A t) y0``.

This module propagates both models EXACTLY on the protocol's knot lattice
instead of integrating them.  TPU-first design: one affine map (HH) or one
6x6 matrix (Markov) per knot interval, composed into prefix solutions with
``lax.associative_scan`` — a log-depth data-parallel scan with no
sequential while-loop, no step-size control, no trip budget, and no
possibility of solver failure.  Interval voltages use the midpoint rule
``(v_i + v_{i+1}) / 2``: exact inside constant segments (the overwhelming
majority of intervals), 2nd-order accurate across the single one-knot
linear ramp the reference's ``interp1d`` lookup places at each step edge.

Intended uses: the whole-trace CMA-ES objectives (train-d0/r0-bad fit the
HH candidate on step protocols Pr3/Pr5/Pr4 — ``--analytic``), exact
synthetic ground-truth generation, and machine-precision solver oracles.
Not applicable to the sinewave/APs protocols (voltage varies every knot;
midpoint compounding is still 2nd-order but the numerical solvers are the
honest tool there).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ionflux.models.registry import HHParams, MarkovParams

__all__ = [
    "hh_solve_analytic",
    "hh_segments",
    "hh_solve_analytic_seg",
    "markov_solve_analytic",
    "markov_interval_propagators",
]


def _hh_p8(p) -> jnp.ndarray:
    """HHParams | array [..., 8] -> array [..., 8]."""
    if isinstance(p, HHParams):
        return jnp.stack([jnp.asarray(x, jnp.float32) for x in p], axis=-1)
    return jnp.asarray(p)


def _affine_combine(a, b):
    """Compose affine maps x -> alpha x + beta; ``a`` acts first."""
    aa, ba = a
    ab, bb = b
    return aa * ab, ba * ab + bb


def _expm1_accurate(x: jnp.ndarray) -> jnp.ndarray:
    """expm1 to ~1 ulp on every backend.

    The TPU VPU's f32 transcendentals are approximate: ``jnp.exp`` carries
    up to ~3.4e-6 relative error and ``jnp.expm1`` up to ~1.1e-4 in the
    mid-range (chip-measured, round 4).  That is fatal here twice over:
    ``1 - exp(-s dt)`` amplifies the error by 1/(s dt) through
    cancellation (7.8% on beta at s dt = 2.3e-5), and alpha's CORRELATED
    per-interval error compounds linearly over the ~1e5 equal intervals of
    a constant segment (exp(1e5 * 2e-6) ≈ 20% trajectory drift — the bug
    this function fixes).  For |x| < 0.5 an 8-term Horner series is exact
    to ~1e-8 relative in exact arithmetic (f32 rounding dominates); beyond
    that exp(x)-1 has no cancellation and the hardware exp's 3e-6 is fine
    (and such fast segments forget their transient in a handful of
    intervals anyway)."""
    xs = jnp.where(jnp.abs(x) < 0.5, x, 0.0)
    series = xs
    for k in range(8, 1, -1):
        series = xs * (1.0 + series / k)
    return jnp.where(jnp.abs(x) < 0.5, series, jnp.exp(x) - 1.0)


def _hh_interval_maps(p8: jnp.ndarray, vmid: jnp.ndarray, dt):
    """Affine maps (alpha, beta) ``[..., N-1, 2]`` of one constant-voltage
    sub-interval of length ``dt`` at voltages ``vmid [N-1]``.

    alpha/beta go through :func:`_expm1_accurate` — NOT the hardware
    ``exp`` — so that alpha = 1 + em1 is biased by at most one f32
    rounding and beta = -xinf * em1 never suffers the 1-alpha
    cancellation."""
    shp = p8.shape[:-1]
    pe = p8.reshape(shp + (1, 8))  # broadcast params over intervals
    k1 = pe[..., 0] * jnp.exp(pe[..., 1] * vmid)
    k2 = pe[..., 2] * jnp.exp(-pe[..., 3] * vmid)
    k3 = pe[..., 4] * jnp.exp(pe[..., 5] * vmid)
    k4 = pe[..., 6] * jnp.exp(-pe[..., 7] * vmid)
    s = jnp.stack([k1 + k2, k3 + k4], axis=-1)          # [..., N-1, 2]
    xinf = jnp.stack([k1, k4], axis=-1) / s
    em1 = _expm1_accurate(-s * jnp.asarray(dt, s.dtype))
    alpha = 1.0 + em1
    beta = -xinf * em1
    return alpha, beta


def _sub_voltages(v: jnp.ndarray, subdiv: int):
    """Midpoint voltages of ``subdiv`` uniform slices of each knot interval:
    ``[subdiv, N-1]``.  Inside constant segments every slice voltage equals
    the segment voltage, so subdivision changes nothing there (the exact
    exponentials compose exactly); across the reference's one-knot linear
    ramp at a step edge it shrinks the midpoint-rule error ~subdiv^2."""
    w = (jnp.arange(subdiv, dtype=v.dtype) + 0.5) / subdiv  # [k]
    return v[None, :-1] + w[:, None] * (v[1:] - v[:-1])[None]


def hh_solve_analytic(p, v: jnp.ndarray, dt, y0: jnp.ndarray | None = None,
                      ramp_subdiv: int = 4):
    """Exact HH [a, r] trajectory at the protocol knots.

    Args:
      p: ``HHParams`` or array ``[..., 8]`` of rate parameters (k1..k4 as
        ``p1 e^{p2 V}``, ``p3 e^{-p4 V}``, ``p5 e^{p6 V}``, ``p7 e^{-p8 V}``,
        train-s1.py:169-172); leading dims are population lanes.
      v: ``[N]`` knot voltages (mV) on a uniform ``dt`` (ms) lattice.
      y0: ``[..., 2]`` initial ``[a, r]`` (default ``[0, 1]``), broadcast
        against ``p``'s leading dims; carry ``ys[..., -1, :]`` to chain
        sweeps exactly (no f32 global-clock hazard — each sweep restarts
        its local clock, solver/chained.py's fix for free).
      ramp_subdiv: constant-voltage slices per knot interval (see
        ``_sub_voltages`` — only the step-edge ramp intervals care).

    Returns ``ys [..., N, 2]``: the EXACT solution of the per-interval
    constant-voltage ODE at every knot (up to f32 rounding; no
    discretisation error inside constant segments).
    """
    p8 = _hh_p8(p)
    v = jnp.asarray(v)
    dt = jnp.asarray(dt, v.dtype)
    shp = p8.shape[:-1]
    vsub = _sub_voltages(v, ramp_subdiv)
    alpha, beta = _hh_interval_maps(p8, vsub[0], dt / ramp_subdiv)
    for j in range(1, ramp_subdiv):
        alpha, beta = _affine_combine(
            (alpha, beta), _hh_interval_maps(p8, vsub[j], dt / ramp_subdiv))
    # prefix-compose the per-interval affine maps (log-depth, TPU-parallel)
    ca, cb = lax.associative_scan(_affine_combine, (alpha, beta), axis=-2)
    if y0 is None:
        y0 = jnp.broadcast_to(
            jnp.array([0.0, 1.0], dtype=ca.dtype), shp + (2,))
    y0 = jnp.broadcast_to(jnp.asarray(y0, ca.dtype), shp + (2,))
    ys = ca * y0[..., None, :] + cb
    return jnp.concatenate([y0[..., None, :], ys], axis=-2)


class HHSegments:
    """Static index structure of a piecewise-constant protocol's segments.

    Host-side numpy, embedded as constants at trace time — the shape of
    the protocol, not its data, so one instance serves every sweep of a
    family whose LEVEL values differ but whose step TIMING agrees (e.g.
    the Pr3/Pr5 activation sweeps; intervals where any sweep ramps are
    conservatively singleton ramp segments for all of them).
    """

    __slots__ = ("first", "length", "is_ramp", "g", "r", "n_segments")

    def __init__(self, first, length, is_ramp, g, r):
        self.first = first        # [S] first interval index of segment
        self.length = length      # [S] interval count of segment
        self.is_ramp = is_ramp    # [S] bool: one-knot linear ramp
        self.g = g                # [N-1] segment id of interval i
        self.r = r                # [N-1] 1-based interval offset in segment
        self.n_segments = int(first.size)


def hh_segments(v) -> HHSegments:
    """Segment structure of concrete knot voltages ``v`` ([N] one sweep, or
    [n_sweeps, N] a family — boundaries are the union over sweeps).

    An interval is a ramp iff ANY sweep's voltage changes across it (the
    reference's ``interp1d`` places exactly one such knot interval at each
    step edge, train-s1.py:224-225); maximal runs of non-ramp intervals
    form constant segments, every ramp interval its own singleton segment.
    Treating a sweep-constant interval as a ramp (because a sibling sweep
    ramps there) stays exact — its subdivided slice voltages all equal the
    segment voltage.
    """
    v = np.asarray(v)
    v2 = v[None] if v.ndim == 1 else v
    ramp_iv = (v2[:, 1:] != v2[:, :-1]).any(axis=0)        # [N-1]
    n_iv = ramp_iv.size
    # a new segment starts at interval 0, at every ramp interval, and at
    # the interval after a ramp
    starts = np.zeros(n_iv, bool)
    starts[0] = True
    starts |= ramp_iv
    starts[1:] |= ramp_iv[:-1]
    g = np.cumsum(starts).astype(np.int32) - 1              # [N-1]
    first = np.flatnonzero(starts).astype(np.int32)         # [S]
    length = np.diff(np.append(first, n_iv)).astype(np.int32)
    r = (np.arange(n_iv, dtype=np.int32) - first[g]) + 1    # [N-1], 1-based
    return HHSegments(first, length, ramp_iv[first], g, r)


def hh_solve_analytic_seg(p, v: jnp.ndarray, dt,
                          y0: jnp.ndarray | None = None,
                          seg: HHSegments | None = None,
                          ramp_subdiv: int = 4):
    """Exact HH [a, r] trajectory via SEGMENT-level closed forms.

    Same mathematics as :func:`hh_solve_analytic` — the gates relax
    exponentially within each constant-voltage segment — but exploits the
    protocol's structure instead of scanning the lattice: a step protocol
    has only ~13 segments (recorded Pr3/Pr5), so the sequential part of
    the solve is an associative scan over S per-segment affine maps, and
    every knot is then evaluated DIRECTLY from its segment-start state
    with one ``expm1`` — ``y(t) = y_start + (y_start - x_inf) em1(-s t)``
    — instead of composing ~1e5 per-interval maps (log-depth over the
    whole lattice, 17 full-array passes at Pr3 size).  O(N) elementwise
    work, no scan over the lattice, and FEWER roundings than the
    interval-composed form (each knot's exponential is evaluated once).

    ``seg`` is the static index structure from :func:`hh_segments`; it
    must be precomputed when ``v`` is traced (inside jit/scan).  With
    ``seg=None`` it is derived from ``v``, which must then be concrete.
    ``v``'s values may differ from the array ``seg`` was computed from as
    long as the segment TIMING matches (the Pr3/Pr5 sweep families).
    Args otherwise as :func:`hh_solve_analytic`.
    """
    p8 = _hh_p8(p)
    v = jnp.asarray(v)
    dtj = jnp.asarray(dt, v.dtype)
    shp = p8.shape[:-1]
    if seg is None:
        seg = hh_segments(np.asarray(v))

    def interval_maps(vmid, dt_iv):
        """Affine maps + (s, xinf) at voltages vmid [S] over dt_iv [S]."""
        pe = p8.reshape(shp + (1, 8))
        k1 = pe[..., 0] * jnp.exp(pe[..., 1] * vmid)
        k2 = pe[..., 2] * jnp.exp(-pe[..., 3] * vmid)
        k3 = pe[..., 4] * jnp.exp(pe[..., 5] * vmid)
        k4 = pe[..., 6] * jnp.exp(-pe[..., 7] * vmid)
        s = jnp.stack([k1 + k2, k3 + k4], axis=-1)          # [.., S, 2]
        xinf = jnp.stack([k1, k4], axis=-1) / s
        em1 = _expm1_accurate(-s * dt_iv[..., None])
        return (1.0 + em1, -xinf * em1), s, xinf

    first = jnp.asarray(seg.first, jnp.int32)
    length_dt = jnp.asarray(seg.length, v.dtype) * dtj      # [S]
    v_seg = v[first]                                        # [S]

    # full-segment maps: constant segments in one closed form ...
    (alpha_c, beta_c), s_seg, xinf_seg = interval_maps(v_seg, length_dt)
    # ... ramp segments (singleton intervals) via subdivided midpoints
    w = (jnp.arange(ramp_subdiv, dtype=v.dtype) + 0.5) / ramp_subdiv
    v_next = v[first + 1]
    dt_slice = jnp.full(v_seg.shape, dtj / ramp_subdiv, v.dtype)
    ab_r, _, _ = interval_maps(v_seg + w[0] * (v_next - v_seg), dt_slice)
    for j in range(1, ramp_subdiv):
        ab_j, _, _ = interval_maps(v_seg + w[j] * (v_next - v_seg),
                                   dt_slice)
        ab_r = _affine_combine(ab_r, ab_j)
    ramp = jnp.asarray(seg.is_ramp)
    alpha_full = jnp.where(ramp[:, None], ab_r[0], alpha_c)
    beta_full = jnp.where(ramp[:, None], ab_r[1], beta_c)

    # segment-start states from the prefix composition over S segments
    ca, cb = lax.associative_scan(_affine_combine,
                                  (alpha_full, beta_full), axis=-2)
    if y0 is None:
        y0 = jnp.array([0.0, 1.0], dtype=ca.dtype)
    y0 = jnp.broadcast_to(jnp.asarray(y0, ca.dtype), shp + (2,))
    y_end = ca * y0[..., None, :] + cb                      # [.., S, 2]
    y_start = jnp.concatenate(
        [y0[..., None, :], y_end[..., :-1, :]], axis=-2)

    # direct per-knot evaluation from the segment-start state
    g = jnp.asarray(seg.g, jnp.int32)
    t_rel = jnp.asarray(seg.r, v.dtype) * dtj               # [N-1]
    s_g = jnp.take(s_seg, g, axis=-2)
    em1_k = _expm1_accurate(-s_g * t_rel[:, None])
    ramp_g = ramp[g][:, None]
    a_k = jnp.where(ramp_g, jnp.take(alpha_full, g, axis=-2), 1.0 + em1_k)
    b_k = jnp.where(ramp_g, jnp.take(beta_full, g, axis=-2),
                    -jnp.take(xinf_seg, g, axis=-2) * em1_k)
    ys = a_k * jnp.take(y_start, g, axis=-2) + b_k
    return jnp.concatenate([y0[..., None, :], ys], axis=-2)


def _markov_p12(p) -> jnp.ndarray:
    if isinstance(p, MarkovParams):
        return jnp.stack([jnp.asarray(x, jnp.float32) for x in p], axis=-1)
    return jnp.asarray(p)


def markov_generator(p, v: jnp.ndarray) -> jnp.ndarray:
    """6x6 generator A(V) of the 3-state Markov model, ``[..., 6, 6]``
    over broadcast(params[..., 12], v[...]) — columns sum to zero
    (probability conservation).  State order [c1, c2, i, ic1, ic2, o]
    (train-d1.py:180-187)."""
    p12 = _markov_p12(p)
    a1 = p12[..., 0] * jnp.exp(p12[..., 1] * v)
    b1 = p12[..., 2] * jnp.exp(-p12[..., 3] * v)
    bh = p12[..., 4] * jnp.exp(p12[..., 5] * v)
    ah = p12[..., 6] * jnp.exp(-p12[..., 7] * v)
    a2 = p12[..., 8] * jnp.exp(p12[..., 9] * v)
    b2 = p12[..., 10] * jnp.exp(-p12[..., 11] * v)
    z = jnp.zeros_like(a1)
    rows = [
        [-(b1 + bh + a2), a1, z, ah, z, b2],
        [b1, -(a1 + bh), z, z, ah, z],
        [z, z, -(b2 + ah), a2, z, bh],
        [bh, z, b2, -(b1 + ah + a2), a1, z],
        [z, bh, z, b1, -(ah + a1), z],
        [a2, z, ah, z, z, -(b2 + bh)],
    ]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def markov_interval_propagators(p, v: jnp.ndarray, dt,
                                ramp_subdiv: int = 4) -> jnp.ndarray:
    """``[N-1, 6, 6]`` exact interval propagators — the product of
    ``ramp_subdiv`` constant-voltage slice exponentials
    ``expm(A(v_slice) dt/k)`` (see ``_sub_voltages``; inside constant
    segments the slices compose back to the exact ``expm(A dt)``).

    expm internals run at 'highest' matmul precision: the chip computes
    default-precision f32 dots as one bf16 pass (CLAUDE.md), and prefix
    products of ~1e5 propagators would compound that mantissa loss."""
    v = jnp.asarray(v)
    vsub = _sub_voltages(v, ramp_subdiv)
    with jax.default_matmul_precision("highest"):
        dt_k = jnp.asarray(dt, v.dtype) / ramp_subdiv
        props = jax.vmap(jax.scipy.linalg.expm)(
            markov_generator(p, vsub[0]) * dt_k)
        for j in range(1, ramp_subdiv):
            props = _matmul_combine(props, jax.vmap(jax.scipy.linalg.expm)(
                markov_generator(p, vsub[j]) * dt_k))
        return props


def _matmul_combine(a, b):
    """Compose propagators; ``a`` acts first: combined = b @ a."""
    return jnp.einsum("...ij,...jk->...ik", b, a,
                      precision=lax.Precision.HIGHEST)


def markov_solve_analytic(p, v: jnp.ndarray, dt,
                          y0: jnp.ndarray | None = None,
                          ramp_subdiv: int = 4) -> jnp.ndarray:
    """Exact 6-state Markov trajectory at the protocol knots.

    Args:
      p: ``MarkovParams`` or ``[12]`` rate parameters.
      v: ``[N]`` knot voltages on a uniform ``dt`` lattice.
      y0: ``[6]`` initial occupancies (default MARKOV_Y0_REST, i.e. c2=1);
        chain sweeps by passing ``ys[-1]``.

    Returns ``ys [N, 6]``.  The prefix products run at HIGHEST matmul
    precision (see markov_interval_propagators).
    """
    props = markov_interval_propagators(p, v, dt, ramp_subdiv)  # [N-1,6,6]
    cum = lax.associative_scan(_matmul_combine, props, axis=0)
    if y0 is None:
        from ionflux.models.markov import MARKOV_Y0_REST
        y0 = jnp.asarray(MARKOV_Y0_REST)
    y0 = jnp.asarray(y0, props.dtype)
    with jax.default_matmul_precision("highest"):
        ys = jnp.einsum("tij,j->ti", cum, y0)
    return jnp.concatenate([y0[None], ys], axis=0)

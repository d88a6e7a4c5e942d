"""Derivative-surface estimation (layer L4): observed current -> (V, a, da/dt)
training points.

The reference repeats this pipeline inline ~6x (train-s1.py:602-808,
train-r1.py:680-811):

  1. simulate the known r-gate r(t) (only r is assumed known; the a-gate is
     what's being learned)
  2. per constant-voltage segment: Hanning-smooth the current (window 61),
     fit a cubic smoothing spline with s=0, take its analytic derivative
     -> smoothed I(t) and dI/dt
  3. algebraically invert the observation I = g a r (V-E):
        a     = I / (g r (V-E))
        da/dt = r^-1 [ (dI/dt / g - a r dV/dt) / (V-E) - a dr/dt ]
     with dV/dt = 0 (the reference hardcodes it, train-s1.py:738)
  4. mask samples near voltage steps, then subsample [skip::sparse]

This stage is OFFLINE data preparation (runs once, cached); the spline fits
use scipy (FITPACK) for exact reference parity while the r-gate solve and
rate evaluations run through the jitted TPU solver.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from scipy.interpolate import UnivariateSpline

from ionflux import protocols as P
from ionflux.models.hh import r_gate_rhs
from ionflux.models.registry import Constants, HHParams
from ionflux.ops.smoothing import smooth_same_np
from ionflux.solver import odeint


@dataclass(frozen=True)
class SurfaceConfig:
    """Pipeline constants with the reference values as defaults
    (s-study: train-s1.py:606-607; d2 widens to window 151/s=1/sparse 21;
    r-study uses skip=10, sparse=7 — train-r1.py:391-392)."""

    skip: int = 5
    sparse: int = 11
    smooth_window: int = 61
    spline_k: int = 3
    spline_s: float = 0.0


def solve_r_gate(proto: P.Protocol, ts: jnp.ndarray, rgate: HHParams,
                 r0: float = 1.0, **kw) -> jnp.ndarray:
    """Simulate the known r-gate alone (it is autonomous given V(t)).

    The reference solves the full 2-state NN-f model with a random net just
    to read off r (train-s1.py:615-632); r does not depend on a, so the
    scalar solve is equivalent and cheaper.
    """
    def rhs(t, y, args):
        rg, pr = args
        return r_gate_rhs(rg, y, P.voltage(pr, t))

    y0 = jnp.array([r0], ts.dtype)
    return odeint(rhs, y0, ts, (rgate, proto), rtol=1e-6, atol=1e-8, **kw)[:, 0]


def spline_didt(t: np.ndarray, i: np.ndarray, edges: np.ndarray,
                cfg: SurfaceConfig = SurfaceConfig()):
    """Per-segment smooth + spline + derivative (train-s1.py:669-731).

    t, i: full uniform grid and observed current; edges: segment end times
    (protocols.segment_edges). Returns (i_smooth, didt) on the full grid.
    """
    t = np.asarray(t, np.float64)
    i = np.asarray(i, np.float64).reshape(-1)
    io = np.zeros_like(t)
    didto = np.zeros_like(t)
    t_i = 0.0
    for t_f in edges:
        idx = np.where((t >= t_i) & (t < t_f))[0]
        if len(idx) <= cfg.smooth_window:
            # degenerate segment (shorter than the smoothing window, e.g. a
            # single-sample ramp knot) — left zero; these samples sit inside
            # the step-edge masks and never reach training
            t_i = t_f
            continue
        tfit = t[idx]
        ifit = smooth_same_np(i[idx], cfg.smooth_window)
        spl = UnivariateSpline(tfit, ifit, k=cfg.spline_k)
        spl.set_smoothing_factor(cfg.spline_s)
        io[idx] = spl(tfit)
        didto[idx] = spl.derivative()(tfit)
        t_i = t_f
    return io, didto


def invert_observation(i: np.ndarray, r: np.ndarray, v: np.ndarray,
                       didt: np.ndarray, drdt: np.ndarray,
                       c: Constants, dvdt: np.ndarray | float = 0.0):
    """Algebraic inversion to (a, da/dt) (train-s1.py:732-781)."""
    g, e = np.float64(c.g), np.float64(c.e)
    a = i / (g * r * (v - e))
    dadt = (1.0 / r) * ((didt / g - a * r * dvdt) / (v - e) - a * drdt)
    return a, dadt


def estimate_gate_surface(proto: P.Protocol, ts: jnp.ndarray,
                          current: np.ndarray, rgate: HHParams,
                          c: Constants, mask: np.ndarray,
                          cfg: SurfaceConfig = SurfaceConfig()):
    """Full per-protocol pipeline -> subsampled (v, a, dadt) numpy arrays."""
    t_np = np.asarray(ts, np.float64)
    v_np = np.asarray(P.voltage(proto, ts), np.float64)
    r_np = np.asarray(solve_r_gate(proto, ts, rgate), np.float64)

    k3 = np.float64(rgate.p5) * np.exp(np.float64(rgate.p6) * v_np)
    k4 = np.float64(rgate.p7) * np.exp(-np.float64(rgate.p8) * v_np)
    drdt = -k3 * r_np + k4 * (1.0 - r_np)

    edges = P.segment_edges(np.asarray(proto.times(), np.float64),
                            np.asarray(proto.v, np.float64))
    i_smooth, didt = spline_didt(t_np, current, edges, cfg)
    a, dadt = invert_observation(i_smooth, r_np, v_np, didt, drdt, c)

    sl = slice(cfg.skip, None, cfg.sparse)
    return v_np[mask][sl], a[mask][sl], dadt[mask][sl]


def spline_didt_segment_jax(i_seg: jnp.ndarray, dt: float,
                            smooth_window: int = 61):
    """Jittable per-segment smooth + interpolating-spline derivative — the
    on-device counterpart of one spline_didt loop iteration (Hanning conv +
    not-a-knot cubic spline, ops/spline.py). Returns (i_smooth, didt)."""
    from ionflux.ops.smoothing import smooth_same
    from ionflux.ops.spline import spline_derivative

    i_sm = smooth_same(i_seg, smooth_window)
    didt = spline_derivative(i_sm, dt)
    return i_sm, didt


def estimate_gate_surface_ondevice(proto: P.Protocol, ts: jnp.ndarray,
                                   current: jnp.ndarray, rgate: HHParams,
                                   c: Constants, mask: np.ndarray,
                                   cfg: SurfaceConfig = SurfaceConfig()):
    """Fully on-device variant of estimate_gate_surface (s=0 path): Hanning
    convolution + jittable not-a-knot spline derivative per segment + the
    algebraic inversion as XLA ops.  One jit per distinct segment length
    (cached); use the scipy path when exact FITPACK parity is required or
    spline_s != 0."""
    if cfg.spline_s != 0.0:
        raise ValueError("on-device path implements the s=0 spline only")
    t_np = np.asarray(ts, np.float64)
    v = P.voltage(proto, ts)
    r = solve_r_gate(proto, ts, rgate)
    k3 = rgate.p5 * jnp.exp(rgate.p6 * v)
    k4 = rgate.p7 * jnp.exp(-rgate.p8 * v)
    drdt = -k3 * r + k4 * (1.0 - r)

    dt = float(t_np[1] - t_np[0])
    edges = P.segment_edges(np.asarray(proto.times(), np.float64),
                            np.asarray(proto.v, np.float64))
    current = jnp.asarray(current, jnp.float32)
    i_sm = jnp.zeros_like(current)
    didt = jnp.zeros_like(current)
    lo = 0
    for t_f in edges:  # static segmentation (host); each body jitted
        hi = int(np.searchsorted(t_np, t_f, side="left"))
        if hi - lo > cfg.smooth_window:
            seg_sm, seg_d = jax.jit(
                spline_didt_segment_jax, static_argnames=("smooth_window",)
            )(current[lo:hi], dt, smooth_window=cfg.smooth_window)
            i_sm = i_sm.at[lo:hi].set(seg_sm)
            didt = didt.at[lo:hi].set(seg_d)
        lo = hi
    a = i_sm / (c.g * r * (v - c.e))
    dadt = (1.0 / r) * ((didt / c.g) / (v - c.e) - a * drdt)
    sl = slice(cfg.skip, None, cfg.sparse)
    mask = jnp.asarray(mask)
    return (np.asarray(v)[np.asarray(mask)][sl],
            np.asarray(a)[np.asarray(mask)][sl],
            np.asarray(dadt)[np.asarray(mask)][sl])


def concat_surfaces(parts):
    """Concatenate per-protocol (v, a, dadt) parts into flat training arrays
    (train-s1.py:783-803)."""
    vs = np.concatenate([p[0] for p in parts])
    as_ = np.concatenate([p[1] for p in parts])
    dadts = np.concatenate([p[2] for p in parts])
    return vs, as_, dadts

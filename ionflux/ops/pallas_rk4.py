"""Fused fixed-step RK4 solve kernels (Pallas TPU).

Profiling on v5e shows Mosaic pipelines straight-line ``fori_loop`` bodies at
~3 us/step for a 6-layer-MLP RK4 step, while adaptive while_loop bodies with
data-dependent control stall ~400x (see ops/pallas_solve.py).  These kernels
therefore fix the step size — n_sub RK4 substeps per output interval — and
keep everything (weights / per-lane params, protocol, output trace)
VMEM-resident with zero per-step HBM traffic and zero host control flow.

Kernel: fused_hh_rk4 — candidate HH with a PER-LANE parameter population
[B, 8] on ONE shared protocol; the population rides the 128 VPU lanes and the
voltage lookup reduces to a scalar broadcast.  This makes the CMA-ES
whole-trace objective (train-d0.py's PINTS parallel evaluation, SURVEY.md
§3.3) a single kernel launch per protocol block.

(A per-protocol batched NN-f variant was evaluated and dropped: with
protocols on lanes the knot storage scales x128 and blows the VMEM budget;
with protocols on sublanes Mosaic cannot reduce the 4-D lookup window to a
sublane vector.  The XLA vmapped adaptive solve stays the fastest NN-f
path.)

Accuracy: RK4 at the protocols' native 0.1 ms resolution has local error
~(dt/tau)^5; for these rate constants that is far below the 1e-3 RMSE
acceptance (verified in tests against the adaptive solver).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


LANES = 128


GROUP = 1024  # knots per (8, 128) tile group


def _pack_protocol_groups(protos_v: jnp.ndarray):
    """[B, N] -> [B, n_groups, 8, 128] (edge-padded).

    Grouped layout so the per-eval window load is ds() on a MAJOR dim (pure
    addressing).  A dynamic slice on the lane dim of a [B, N] array lowers to
    a full-width lane roll (~10 us for an 80k-knot row) — the original
    bottleneck of these kernels."""
    b, n = protos_v.shape
    n_groups = (n + GROUP - 1) // GROUP + 1   # +1: lookahead window
    n_pad = n_groups * GROUP
    v = jnp.asarray(protos_v, jnp.float32)
    v = jnp.concatenate(
        [v, jnp.broadcast_to(v[:, -1:], (b, n_pad - n))], axis=1)
    return v.reshape(b, n_groups, 8, 128), n


def _grouped_voltage(v_ref, proto_t0: float, inv_dt: float, n_knots: int,
                     scalar: bool):
    """V(t) lookup from a [B, n_groups, 8, 128] grouped protocol ref.

    Loads a 2-group (2048-knot) window via major-dim addressing and selects
    the bracketing knots with masked sums. ``scalar``: B==1 shared protocol
    -> returns a scalar; else returns a [B] sublane vector."""

    def voltage(t):
        x = (t - proto_t0) * inv_dt
        ii = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, n_knots - 2)
        w = x - ii.astype(jnp.float32)
        g = ii // GROUP
        off = ii - g * GROUP
        win = v_ref[:, pl.ds(g, 2), :, :]          # [B, 2, 8, 128]
        gi = jax.lax.broadcasted_iota(jnp.int32, (1, 2, 8, 128), 1)
        si = jax.lax.broadcasted_iota(jnp.int32, (1, 2, 8, 128), 2)
        li = jax.lax.broadcasted_iota(jnp.int32, (1, 2, 8, 128), 3)
        idx = gi * GROUP + si * 128 + li
        assert scalar, "only the shared-protocol scalar lookup is supported"
        # full reductions to scalar are the only reliably lowered form
        v0 = jnp.sum(jnp.where(idx == off, win, 0.0))
        v1 = jnp.sum(jnp.where(idx == off + 1, win, 0.0))
        return v0 + w * (v1 - v0)

    return voltage


def fused_hh_rk4(
    params: jnp.ndarray,            # [B, 8] per-lane HH parameter population
    proto_v: jnp.ndarray,           # [N] shared protocol knots
    *,
    proto_t0: float = 0.0,
    proto_dt: float = 0.1,
    dt_out: float,
    n_out: int,
    n_sub: int = 10,
    y0: tuple = (0.0, 1.0),
    interpret: bool = False,
) -> jnp.ndarray:
    """HH candidate population solve on one protocol -> ys [B, n_out, 2]."""
    b = params.shape[0]
    assert b <= LANES, "population must fit the 128 lanes"
    vpack, n_knots = _pack_protocol_groups(jnp.asarray(proto_v)[None])
    # params -> [8, LANES] (param index on sublanes, population on lanes)
    p_lanes = jnp.zeros((8, LANES), jnp.float32)
    p_lanes = p_lanes.at[:, :b].set(jnp.asarray(params, jnp.float32).T)
    inv_dt = 1.0 / proto_dt
    a0, r0 = float(y0[0]), float(y0[1])

    def kernel(p_ref, v_ref, out_ref):
        p = p_ref[...]                                   # [8, LANES]
        voltage = _grouped_voltage(v_ref, proto_t0, inv_dt, n_knots,
                                   scalar=True)

        def rhs(t, y):                                    # y [2, LANES]
            v = voltage(t)
            k1 = p[0] * jnp.exp(p[1] * v)
            k2 = p[2] * jnp.exp(-p[3] * v)
            k3 = p[4] * jnp.exp(p[5] * v)
            k4 = p[6] * jnp.exp(-p[7] * v)
            dadt = k1 * (1.0 - y[0]) - k2 * y[0]
            drdt = -k3 * y[1] + k4 * (1.0 - y[1])
            return jnp.stack([dadt, drdt])

        h = dt_out / n_sub
        yy0 = jnp.stack([jnp.full((LANES,), a0, jnp.float32),
                         jnp.full((LANES,), r0, jnp.float32)])
        out_ref[pl.ds(0, 1)] = yy0[None]

        def interval(oi, y):
            tbase = proto_t0 + (oi - 1).astype(jnp.float32) * dt_out

            def sub(i, yy):
                t = tbase + i.astype(jnp.float32) * h
                k1 = rhs(t, yy)
                k2 = rhs(t + 0.5 * h, yy + 0.5 * h * k1)
                k3 = rhs(t + 0.5 * h, yy + 0.5 * h * k2)
                k4 = rhs(t + h, yy + h * k3)
                return yy + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

            y = jax.lax.fori_loop(0, n_sub, sub, y)
            out_ref[pl.ds(oi, 1)] = y[None]
            return y

        jax.lax.fori_loop(1, n_out, interval, yy0)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_out, 2, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(p_lanes, vpack)
    return jnp.moveaxis(out[:, :, :b], -1, 0)            # [B, n_out, 2]

"""Fused batched NN-f neural-ODE solve as a single Pallas TPU kernel.

Motivation (the hot path, SURVEY.md §3.1): the XLA dopri5 solve evaluates the
MLP 6-7x per step for thousands of steps; besides weight re-streaming, each
while-loop iteration pays XLA op-dispatch overhead.  This kernel runs the
ENTIRE adaptive solve on-core: MLP weights and the protocol batch stay
resident in VMEM, the 6 RHS evaluations per step are [B, hidden] MXU matmuls,
and each accepted step's (t, h, y, K) record is streamed to HBM with a small
async DMA (dynamic indexing on the major dim — lane-dim dynamic slices are
not Mosaic-lowerable).

Dense output stays in XLA (phase 2 of the dopri5 design): gather the step
records for all requested times and evaluate the quartic interpolant in one
einsum.

Batch semantics: B same-length protocols in lockstep with ONE shared
controller (accept when the max error ratio over lanes passes) — slightly
conservative per lane, but it turns the per-stage MLP into MXU work.

Voltage lookup: arbitrary-position gathers are not lane-aligned, so V(t) is
extracted from a 128-aligned 256-wide window via a one-hot reduction (pure
VPU).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ionflux.models.registry import HHParams, NETSCALE, VRANGE
from ionflux.solver.dopri5 import _A, _B_ERR, _B_SOL, _C, _P_DENSE

_SAFETY, _MINF, _MAXF = 0.9, 0.2, 10.0

# Popsweep protocol-row limits: the kernel refuses > MAX_ROWS per launch
# (unprobed layouts past 2Q=64 record sublanes); callers that auto-split
# big families (eval.simulate_population) chunk at SPLIT_ROWS, the
# measured per-launch throughput sweet spot on v5e.
POPSWEEP_MAX_ROWS = 32
POPSWEEP_SPLIT_ROWS = 16


def _make_kernel(n_layers: int, n_knots_padded: int, t0: float,
                 dt_knot: float, t_end: float, rgate: tuple, rtol: float,
                 atol: float, max_steps: int, max_rec: int, b: int):
    p5, p6, p7, p8 = rgate
    inv_dt = 1.0 / dt_knot
    A = [[float(x) for x in row] for row in _A]
    C = [float(x) for x in _C]
    BS = [float(x) for x in _B_SOL]
    BE = [float(x) for x in _B_ERR]

    def kernel(v_ref, *refs):
        w_refs = refs[:n_layers]
        b_refs = refs[n_layers:2 * n_layers]
        rec_sc, rec_y, rec_k, n_out_ref = refs[2 * n_layers:2 * n_layers + 4]
        vm_sc, vm_y, vm_k, sems = refs[2 * n_layers + 4:]

        def voltage(t):
            x = (t - t0) * inv_dt
            ii = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, n_knots_padded - 130)
            w = x - ii.astype(jnp.float32)
            base = pl.multiple_of((ii // 128) * 128, 128)
            off = ii - base
            chunk = v_ref[:, pl.ds(base, 256)]                  # [B, 256]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
            v0 = jnp.sum(jnp.where(lane == off, chunk, 0.0), axis=1)
            v1 = jnp.sum(jnp.where(lane == off + 1, chunk, 0.0), axis=1)
            return v0 + w * (v1 - v0)                           # [B]

        def mlp(x):
            h = x
            for wr, br in zip(w_refs[:-1], b_refs[:-1]):
                h = jnp.dot(h, wr[...],
                            preferred_element_type=jnp.float32) + br[...]
                h = jnp.where(h >= 0, h, 0.01 * h)
            return (jnp.dot(h, w_refs[-1][...],
                            preferred_element_type=jnp.float32)
                    + b_refs[-1][...])

        def rhs(t, y):
            v = voltage(t)
            x = jnp.stack([v / VRANGE, y[:, 0]], axis=-1)
            dadt = mlp(x)[:, 0] / NETSCALE
            k3 = p5 * jnp.exp(p6 * v)
            k4 = p7 * jnp.exp(-p8 * v)
            drdt = -k3 * y[:, 1] + k4 * (1.0 - y[:, 1])
            return jnp.stack([dadt, drdt], axis=-1)

        y0 = jnp.concatenate(
            [jnp.zeros((b, 1), jnp.float32), jnp.ones((b, 1), jnp.float32)],
            axis=1)
        f0 = rhs(jnp.float32(t0), y0)

        def _pad_bt(arr):
            # [b, 2] -> [2, 128] (transpose + lane pad)
            at = arr.T  # [2, b]
            pad = jnp.zeros((2, 128 - b), jnp.float32)
            return jnp.concatenate([at, pad], axis=1)

        def step_cond(state):
            return state[6]

        def step_body(state):
            t, y, f, h, n_acc, n_step, alive = state
            h_eff = jnp.maximum(jnp.minimum(h, t_end - t), 1e-8)

            ks = [f]
            for i in range(1, 7):
                yi = y
                for j in range(i):
                    if A[i][j] != 0.0:
                        yi = yi + (h_eff * A[i][j]) * ks[j]
                ks.append(rhs(t + C[i] * h_eff, yi))
            y1 = y
            err = jnp.zeros_like(y)
            for j in range(7):
                if BS[j] != 0.0:
                    y1 = y1 + (h_eff * BS[j]) * ks[j]
                if BE[j] != 0.0:
                    err = err + (h_eff * BE[j]) * ks[j]
            scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y1))
            ratio = jnp.sqrt(jnp.max(jnp.mean((err / scale) ** 2, axis=-1)))
            finite = jnp.all(jnp.isfinite(y1)) & jnp.isfinite(ratio)
            accept = (ratio <= 1.0) & finite

            @pl.when(accept)
            def _():
                sc = jnp.zeros((128,), jnp.float32)
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)[0]
                sc = jnp.where(lane == 0, t, jnp.where(lane == 1, h_eff, 0.0))
                vm_sc[0, :] = sc
                # records are lane-padded to 128 (DMA slices must keep the
                # trailing tile); state lanes live in [:b]
                vm_y[0, :, :] = _pad_bt(y)
                for i in range(7):
                    vm_k[0, i, :, :] = _pad_bt(ks[i])
                c0 = pltpu.make_async_copy(
                    vm_sc, rec_sc.at[pl.ds(n_acc, 1)], sems.at[0])
                c1 = pltpu.make_async_copy(
                    vm_y, rec_y.at[pl.ds(n_acc, 1)], sems.at[1])
                c2 = pltpu.make_async_copy(
                    vm_k, rec_k.at[pl.ds(n_acc, 1)], sems.at[2])
                c0.start()
                c1.start()
                c2.start()
                c0.wait()
                c1.wait()
                c2.wait()

            t_new = jnp.where(accept, t + h_eff, t)
            y_new = jnp.where(accept, y1, y)
            f_new = jnp.where(accept, ks[6], f)
            n_acc2 = n_acc + accept.astype(jnp.int32)
            # x**-0.2 as exp(-0.2 log x): math.powf is not Mosaic-lowerable
            factor = _SAFETY * jnp.exp(-0.2 * jnp.log(jnp.maximum(ratio, 1e-10)))
            factor = jnp.where(jnp.isfinite(factor), factor, _MINF)
            h_new = h_eff * jnp.clip(factor, _MINF,
                                     jnp.where(accept, _MAXF, 1.0))
            n2 = n_step + 1
            alive2 = ((t_new < t_end) & (n2 < max_steps)
                      & (n_acc2 < max_rec)
                      & jnp.all(jnp.isfinite(y_new)))
            return (t_new, y_new, f_new, h_new, n_acc2, n2, alive2)

        init = (jnp.float32(t0), y0, f0, jnp.float32(dt_knot * 10.0),
                jnp.int32(0), jnp.int32(0), jnp.bool_(True))
        (t, y, f, h, n_acc, n_step, _al) = jax.lax.while_loop(
            step_cond, step_body, init)
        ok = (t >= t_end) & jnp.all(jnp.isfinite(y))
        n_out_ref[0, 0] = jnp.where(ok, n_acc, -n_acc)

    return kernel


def fused_nnf_solve(
    net: Sequence,
    rgate: HHParams,
    protos_v: jnp.ndarray,          # [B, N] knot voltages (uniform grid)
    ts: jnp.ndarray,                # [T] output times (ascending)
    *,
    proto_t0: float = 0.0,
    proto_dt: float = 0.1,
    t_end: float | None = None,
    rtol: float = 1e-5,
    atol: float = 1e-7,
    max_steps: int = 100_000,
    max_rec: int = 16384,
    interpret: bool = False,
):
    """Solve the NN-f ODE for B protocols in one fused kernel; dense output
    at ``ts`` evaluated in XLA. Returns ys [B, T, 2] (inf if diverged)."""
    b, n = protos_v.shape
    t_end = float(t_end) if t_end is not None else float(ts[-1])
    # pad the knot axis to a multiple of 128 plus one extra window
    n_pad = ((n + 127) // 128) * 128 + 256
    vpad = jnp.concatenate(
        [protos_v.astype(jnp.float32),
         jnp.broadcast_to(protos_v[:, -1:].astype(jnp.float32),
                          (b, n_pad - n))], axis=1)
    ws = [w.astype(jnp.float32) for w, _ in net]
    bs = [bb.astype(jnp.float32) for _, bb in net]

    kernel = _make_kernel(
        len(ws), n_pad, float(proto_t0), float(proto_dt), t_end,
        tuple(float(x) for x in (rgate.p5, rgate.p6, rgate.p7, rgate.p8)),
        float(rtol), float(atol), int(max_steps), int(max_rec), b)

    rec_sc, rec_y, rec_k, n_acc = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((max_rec, 128), jnp.float32),
            jax.ShapeDtypeStruct((max_rec, 2, 128), jnp.float32),
            jax.ShapeDtypeStruct((max_rec, 7, 2, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + 2 * len(ws)),
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.VMEM((1, 2, 128), jnp.float32),
            pltpu.VMEM((1, 7, 2, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(vpad, *ws, *bs)

    return _dense_eval(rec_sc, rec_y, rec_k, n_acc[0, 0],
                       ts.astype(jnp.float32), b)


from functools import partial


@partial(jax.jit, static_argnames=("b",))
def _dense_eval(rec_sc, rec_y, rec_k, n_acc, ts, b):
    """Phase 2: vectorised quartic dense output over the full grid."""
    ok = n_acc > 0
    n = jnp.abs(n_acc)
    big = jnp.float32(3.4e38)
    t_rec = jnp.where(jnp.arange(rec_sc.shape[0]) < n, rec_sc[:, 0], big)
    idx = jnp.clip(jnp.searchsorted(t_rec, ts, side="right") - 1, 0,
                   jnp.maximum(n - 1, 0))
    t0s = rec_sc[idx, 0]
    hs = rec_sc[idx, 1]
    th = jnp.clip((ts - t0s) / hs, 0.0, 1.0)
    tp = jnp.stack([th, th ** 2, th ** 3, th ** 4], axis=-1)
    bpoly = tp @ jnp.asarray(_P_DENSE, jnp.float32).T              # [T, 7]
    kk = rec_k[idx][..., :b]                                       # [T,7,2,B]
    y0s = rec_y[idx][..., :b]                                      # [T,2,B]
    ys = y0s + hs[:, None, None] * jnp.einsum("tj,tjsb->tsb", bpoly, kk)
    ys = jnp.transpose(ys, (2, 0, 1))                              # [B,T,2]
    return jnp.where(ok, ys, jnp.full_like(ys, jnp.inf))


# ---------------------------------------------------------------------------
# Fixed-trip (branchless) variant: Mosaic pipelines straight-line fori_loop
# bodies at ~3 us/step where data-dependent while/cond stalls ~400x
# (ROADMAP "Performance"; measured round 2).  The adaptive controller stays,
# but as MASKED updates inside a fixed trip count: every iteration attempts
# a step, acceptance only gates which registers advance, and every iteration
# unconditionally writes the LAST-ACCEPTED interpolant record at its trip
# index — so the record-time sequence is non-decreasing and phase 2 can
# binary-search it exactly like the while-loop variant's accepted stream.
# After t reaches t_end the controller creeps at the 1e-8 floor and the
# remaining trips write idempotent end-state records.
# ---------------------------------------------------------------------------


def _make_kernel_ft(n_layers: int, n_knots_padded: int, t0: float,
                    dt_knot: float, t_end: float, rgate: tuple, rtol: float,
                    atol: float, trips: int, b: int, base_a: tuple = ()):
    # base_a = (p1..p4): NN-d mode — the MLP is an additive correction to
    # the analytic a-gate rate (models/nn.py nnd_rhs)
    p5, p6, p7, p8 = rgate
    inv_dt = 1.0 / dt_knot
    A = [[float(x) for x in row] for row in _A]
    C = [float(x) for x in _C]
    BS = [float(x) for x in _B_SOL]
    BE = [float(x) for x in _B_ERR]

    def kernel(v_ref, *refs):
        w_refs = refs[:n_layers]
        b_refs = refs[n_layers:2 * n_layers]
        (rec_sc, rec_y, rec_k, n_out_ref,
         m_out_ref) = refs[2 * n_layers:2 * n_layers + 5]
        vm_sc, vm_y, vm_k, sems = refs[2 * n_layers + 5:]

        def voltage(t):
            x = (t - t0) * inv_dt
            ii = jnp.clip(jnp.floor(x).astype(jnp.int32), 0,
                          n_knots_padded - 130)
            w = x - ii.astype(jnp.float32)
            base = pl.multiple_of((ii // 128) * 128, 128)
            off = ii - base
            chunk = v_ref[:, pl.ds(base, 256)]                  # [B, 256]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
            v0 = jnp.sum(jnp.where(lane == off, chunk, 0.0), axis=1)
            v1 = jnp.sum(jnp.where(lane == off + 1, chunk, 0.0), axis=1)
            return v0 + w * (v1 - v0)                           # [B]

        def mlp(x):
            h = x
            for wr, br in zip(w_refs[:-1], b_refs[:-1]):
                h = jnp.dot(h, wr[...],
                            preferred_element_type=jnp.float32) + br[...]
                h = jnp.where(h >= 0, h, 0.01 * h)
            return (jnp.dot(h, w_refs[-1][...],
                            preferred_element_type=jnp.float32)
                    + b_refs[-1][...])

        def rhs(t, y):
            v = voltage(t)
            x = jnp.stack([v / VRANGE, y[:, 0]], axis=-1)
            dadt = mlp(x)[:, 0] / NETSCALE
            if base_a:
                p1, p2, p3, p4 = base_a
                k1 = p1 * jnp.exp(p2 * v)
                k2 = p3 * jnp.exp(-p4 * v)
                dadt = dadt + k1 * (1.0 - y[:, 0]) - k2 * y[:, 0]
            k3 = p5 * jnp.exp(p6 * v)
            k4 = p7 * jnp.exp(-p8 * v)
            drdt = -k3 * y[:, 1] + k4 * (1.0 - y[:, 1])
            return jnp.stack([dadt, drdt], axis=-1)

        y0 = jnp.concatenate(
            [jnp.zeros((b, 1), jnp.float32), jnp.ones((b, 1), jnp.float32)],
            axis=1)
        f0 = rhs(jnp.float32(t0), y0)

        def _pad_bt(arr):
            at = arr.T  # [2, b]
            if b == 128:
                return at
            pad = jnp.zeros((2, 128 - b), jnp.float32)
            return jnp.concatenate([at, pad], axis=1)

        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)[0]

        def body(i, state):
            (t, y, f, h, n_acc, alive) = state
            # alive carried as f32 (Mosaic cannot yield i1 vectors from
            # the loop); per-lane death mirrors the popsweep kernel: one
            # divergent protocol lane must not inf the whole family
            alive_b = alive > 0.5
            h_eff = jnp.maximum(jnp.minimum(h, t_end - t), 1e-8)

            ks = [f]
            for si in range(1, 7):
                yi = y
                for sj in range(si):
                    if A[si][sj] != 0.0:
                        yi = yi + (h_eff * A[si][sj]) * ks[sj]
                ks.append(rhs(t + C[si] * h_eff, yi))
            y1 = y
            err = jnp.zeros_like(y)
            for sj in range(7):
                if BS[sj] != 0.0:
                    y1 = y1 + (h_eff * BS[sj]) * ks[sj]
                if BE[sj] != 0.0:
                    err = err + (h_eff * BE[sj]) * ks[sj]
            scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y1))
            # per-lane error; shared accept on the worst LIVE lane.  Lane
            # badness folds into the ONE max reduction via a finite
            # sentinel (see the popsweep kernel's controller comment):
            # non-finite err or scale NaN-poisons r_l, which reads as the
            # 3.4e38 sentinel and rejects the trip through the ordinary
            # controller algebra
            r_l = jnp.sqrt(jnp.mean((err / scale) ** 2, axis=-1))    # [B]
            r_l = r_l + (scale[:, 0] + scale[:, 1]) * 0.0
            lane_bad = ~(r_l < jnp.float32(jnp.inf))
            r_c = jnp.where(lane_bad, jnp.float32(3.4e38), r_l)
            ratio = jnp.max(jnp.where(alive_b, r_c, 0.0))
            accept = ratio <= 1.0
            # a live lane that cannot pass even near the minimum step dies:
            # frozen finite state, excluded from the controller, masked to
            # inf in phase 2
            lane_pass = ~lane_bad & (r_l <= 1.0)
            alive_b = alive_b & (lane_pass | (h_eff > 2e-7))
            alive = alive_b.astype(jnp.float32)
            adv = (accept & alive_b)[:, None]                      # [B, 1]

            # record THIS trip's attempt unconditionally at the block-local
            # trip index (VMEM ring; DMA'd to HBM once per block): dense
            # eval's searchsorted(side='right') always lands on an ACCEPTED
            # slot — see the popsweep kernel's record comment.  No
            # last-accepted carry, no per-trip whole-buffer selects.
            sc = jnp.where(lane128 == 0, t,
                           jnp.where(lane128 == 1, h_eff, 0.0))
            vm_sc[pl.ds(i, 1), :] = sc[None]
            vm_y[pl.ds(i, 1), :, :] = _pad_bt(y)[None]
            vm_k[pl.ds(i, 1), :, :, :] = jnp.stack(
                [_pad_bt(k) for k in ks])[None]                # [7, 2, 128]

            t = jnp.where(accept, t + h_eff, t)
            y = jnp.where(adv, y1, y)
            f = jnp.where(adv, ks[6], f)
            n_acc = n_acc + accept.astype(jnp.int32)
            factor = _SAFETY * jnp.exp(
                -0.2 * jnp.log(jnp.maximum(ratio, 1e-10)))
            # ratio == sentinel -> factor ~9e-9 -> clipped to _MINF
            h = h_eff * jnp.clip(factor, _MINF,
                                 jnp.where(accept, _MAXF, 1.0))
            return (t, y, f, h, n_acc, alive)

        # lanes whose RHS is non-finite at rest are dead from the start
        alive0 = jnp.all(jnp.isfinite(f0), axis=-1)
        f0 = jnp.where(alive0[:, None], f0, 0.0)
        init = (jnp.float32(t0), y0, f0, jnp.float32(dt_knot * 10.0),
                jnp.int32(0), alive0.astype(jnp.float32))

        # two-level loop: the inner fori block is straight-line (Mosaic
        # pipelines it); the outer while adds ONE data-dependent check and
        # ONE block-sized DMA per `block` trips
        block = 256
        assert trips % block == 0, "trips must be a multiple of 256"
        n_blocks = trips // block

        def blk_cond(state):
            blk, st = state
            return ((blk < n_blocks) & (st[0] < t_end)
                    & jnp.any(st[5] > 0.5))

        def blk_body(state):
            blk, st = state

            def inner(j, s):
                return body(j, s)

            st = jax.lax.fori_loop(0, block, inner, st)
            # one DMA per block: VMEM record ring -> HBM record stream
            base = blk * block
            c0 = pltpu.make_async_copy(
                vm_sc, rec_sc.at[pl.ds(base, block)], sems.at[0])
            c1 = pltpu.make_async_copy(
                vm_y, rec_y.at[pl.ds(base, block)], sems.at[1])
            c2 = pltpu.make_async_copy(
                vm_k, rec_k.at[pl.ds(base, block)], sems.at[2])
            c0.start()
            c1.start()
            c2.start()
            c0.wait()
            c1.wait()
            c2.wait()
            return blk + 1, st

        _blk, (t, y, f, h, n_acc, alive) = (
            jax.lax.while_loop(blk_cond, blk_body, (jnp.int32(0), init)))
        # records past the early-exit point hold stale garbage; phase 2
        # masks them out via the valid-trip count
        ok = t >= t_end
        n_out_ref[0, 0] = jnp.where(ok, n_acc, -jnp.maximum(n_acc, 1))
        n_out_ref[0, 1] = _blk * block
        m_out_ref[...] = _pad_bt(jnp.broadcast_to(
            alive[:, None], (b, 2)))

    return kernel


def fused_nnf_solve_ft(
    net: Sequence,
    rgate: HHParams,
    protos_v: jnp.ndarray,          # [B, N] knot voltages (uniform grid)
    ts: jnp.ndarray,                # [T] output times (ascending)
    *,
    proto_t0: float = 0.0,
    proto_dt: float = 0.1,
    t_end: float | None = None,
    rtol: float = 1e-5,
    atol: float = 1e-7,
    trips: int = 3072,
    base_hh: HHParams | None = None,
    interpret: bool = False,
):
    """Fixed-trip fused NN-f solve (see module tail comment).  ``trips``
    must exceed the adaptive attempt count (ok=False and inf output
    otherwise, like every other solver sentinel).  base_hh switches the
    kernel to the NN-d family (MLP as additive correction to the analytic
    p1-p4 a-gate, with r-gate from base_hh).  Divergence is isolated PER
    LANE (round 4, matching the popsweep kernel): a protocol row that goes
    non-finite or grinds at the minimum step freezes, leaves the shared
    controller, and returns inf for its row only.  Returns ys [B, T, 2]."""
    b, n = protos_v.shape
    if b > 128:
        raise ValueError(
            f"the sweep kernel targets one 128-lane tile (got B={b}); "
            f"split the family — eval.simulate_family does this "
            f"automatically")
    t_end = float(t_end) if t_end is not None else float(ts[-1])
    n_pad = ((n + 127) // 128) * 128 + 256
    vpad = jnp.concatenate(
        [protos_v.astype(jnp.float32),
         jnp.broadcast_to(protos_v[:, -1:].astype(jnp.float32),
                          (b, n_pad - n))], axis=1)
    ws = [w.astype(jnp.float32) for w, _ in net]
    bs = [bb.astype(jnp.float32) for _, bb in net]

    gate = base_hh if base_hh is not None else rgate
    kernel = _make_kernel_ft(
        len(ws), n_pad, float(proto_t0), float(proto_dt), t_end,
        tuple(float(x) for x in (gate.p5, gate.p6, gate.p7, gate.p8)),
        float(rtol), float(atol), int(trips), b,
        base_a=(tuple(float(x) for x in
                      (base_hh.p1, base_hh.p2, base_hh.p3, base_hh.p4))
                if base_hh is not None else ()))

    rec_sc, rec_y, rec_k, n_acc, m_pack = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((trips, 128), jnp.float32),
            jax.ShapeDtypeStruct((trips, 2, 128), jnp.float32),
            jax.ShapeDtypeStruct((trips, 7, 2, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
            jax.ShapeDtypeStruct((2, 128), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + 2 * len(ws)),
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((256, 128), jnp.float32),
            pltpu.VMEM((256, 2, 128), jnp.float32),
            pltpu.VMEM((256, 7, 2, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # match the popsweep kernel's scoped-VMEM cap: under the
            # default 16 MB, XLA memory assignment pins the ~30 MB record
            # stream to VMEM when this kernel sits inside a scan body
            # (chained dispatch) and the program fails to compile
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(vpad, *ws, *bs)

    return _dense_eval_ft(rec_sc, rec_y, rec_k, n_acc[0, 0], n_acc[0, 1],
                          ts.astype(jnp.float32), b,
                          lane_ok=m_pack[0, :b] > 0.5)


@partial(jax.jit, static_argnames=("b",))
def _dense_eval_ft(rec_sc, rec_y, rec_k, n_acc, n_valid, ts, b,
                   lane_ok=None):
    """Phase 2 for the fixed-trip record stream: trip-indexed records hold
    the last-accepted interpolant, so record times are non-decreasing and
    the binary search lands on the interval containing each output time
    (records past the early-exit block are masked to +inf).  lane_ok [B]
    (optional) additionally infs out individual dead lanes — the
    per-lane-death kernels pass it so one divergent lane no longer
    poisons the family/population."""
    ok = n_acc > 0
    big = jnp.float32(3.4e38)
    t_rec = jnp.where(jnp.arange(rec_sc.shape[0]) < n_valid,
                      rec_sc[:, 0], big)
    idx = jnp.clip(jnp.searchsorted(t_rec, ts, side="right") - 1, 0,
                   rec_sc.shape[0] - 1)
    t0s = rec_sc[idx, 0]
    hs = jnp.maximum(rec_sc[idx, 1], 1e-20)
    th = jnp.clip((ts - t0s) / hs, 0.0, 1.0)
    tp = jnp.stack([th, th ** 2, th ** 3, th ** 4], axis=-1)
    bpoly = tp @ jnp.asarray(_P_DENSE, jnp.float32).T              # [T, 7]
    kk = rec_k[idx][..., :b]                                       # [T,7,2,B]
    y0s = rec_y[idx][..., :b]                                      # [T,2,B]
    ys = y0s + hs[:, None, None] * jnp.einsum("tj,tjsb->tsb", bpoly, kk)
    ys = jnp.transpose(ys, (2, 0, 1))                              # [B,T,2]
    if lane_ok is not None:
        ys = jnp.where(lane_ok[:, None, None], ys,
                       jnp.full_like(ys, jnp.inf))
    return jnp.where(ok, ys, jnp.full_like(ys, jnp.inf))


# ---------------------------------------------------------------------------
# Per-lane-weights variant: the CMA-ES/population workload (B member nets,
# ONE shared protocol).  Same fixed-trip blocked design; the MLP becomes a
# batched dot_general ([B,1,n] x [B,n,m], Mosaic-lowerable) and the whole
# 64-member weight population stays VMEM-resident (62 MB; needs the raised
# vmem_limit_bytes) — the XLA lockstep restreams/reloads per step and pays
# ~57 us/step on this shape.
# ---------------------------------------------------------------------------


def _make_kernel_pop_ft(n_layers: int, n_knots_padded: int, t0: float,
                        dt_knot: float, t_end: float, rgate: tuple,
                        rtol: float, atol: float, trips: int, b: int):
    p5, p6, p7, p8 = rgate
    inv_dt = 1.0 / dt_knot
    A = [[float(x) for x in row] for row in _A]
    C = [float(x) for x in _C]
    BS = [float(x) for x in _B_SOL]
    BE = [float(x) for x in _B_ERR]

    def kernel(v_ref, *refs):
        w_refs = refs[:n_layers]
        b_refs = refs[n_layers:2 * n_layers]
        (rec_sc, rec_y, rec_k, n_out_ref,
         m_out_ref) = refs[2 * n_layers:2 * n_layers + 5]
        vm_sc, vm_y, vm_k, sems = refs[2 * n_layers + 5:]

        def voltage(t):
            # shared protocol: scalar V(t), broadcast across lanes
            x = (t - t0) * inv_dt
            ii = jnp.clip(jnp.floor(x).astype(jnp.int32), 0,
                          n_knots_padded - 130)
            w = x - ii.astype(jnp.float32)
            base = pl.multiple_of((ii // 128) * 128, 128)
            off = ii - base
            chunk = v_ref[:, pl.ds(base, 256)]                  # [1, 256]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
            v0 = jnp.sum(jnp.where(lane == off, chunk, 0.0))
            v1 = jnp.sum(jnp.where(lane == off + 1, chunk, 0.0))
            return v0 + w * (v1 - v0)                           # scalar

        def mlp(x):                                             # x [B, 2]
            h = x[:, None, :]                                   # [B, 1, n]
            for li, (wr, br) in enumerate(zip(w_refs, b_refs)):
                h = jax.lax.dot_general(
                    h, wr[...], (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                h = h + br[...][:, None, :]
                if li < n_layers - 1:
                    h = jnp.where(h >= 0, h, 0.01 * h)
            return h[:, 0, :]                                   # [B, 1]

        def rhs(t, y):
            v = voltage(t)
            x = jnp.stack([jnp.full((b,), v / VRANGE), y[:, 0]], axis=-1)
            dadt = mlp(x)[:, 0] / NETSCALE
            k3 = p5 * jnp.exp(p6 * v)
            k4 = p7 * jnp.exp(-p8 * v)
            drdt = -k3 * y[:, 1] + k4 * (1.0 - y[:, 1])
            return jnp.stack([dadt, drdt], axis=-1)

        y0 = jnp.concatenate(
            [jnp.zeros((b, 1), jnp.float32), jnp.ones((b, 1), jnp.float32)],
            axis=1)
        f0 = rhs(jnp.float32(t0), y0)

        def _pad_bt(arr):
            at = arr.T
            if b == 128:
                return at
            pad = jnp.zeros((2, 128 - b), jnp.float32)
            return jnp.concatenate([at, pad], axis=1)

        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)[0]

        def body(i, state):
            (t, y, f, h, n_acc, alive) = state
            # alive carried as f32 (Mosaic cannot yield i1 vectors from
            # the loop); per-lane death mirrors the popsweep kernel: one
            # divergent CMA-ES member must not erase the generation's
            # ranking information (batched.py per-lane-death semantics)
            alive_b = alive > 0.5
            h_eff = jnp.maximum(jnp.minimum(h, t_end - t), 1e-8)
            ks = [f]
            for si in range(1, 7):
                yi = y
                for sj in range(si):
                    if A[si][sj] != 0.0:
                        yi = yi + (h_eff * A[si][sj]) * ks[sj]
                ks.append(rhs(t + C[si] * h_eff, yi))
            y1 = y
            err = jnp.zeros_like(y)
            for sj in range(7):
                if BS[sj] != 0.0:
                    y1 = y1 + (h_eff * BS[sj]) * ks[sj]
                if BE[sj] != 0.0:
                    err = err + (h_eff * BE[sj]) * ks[sj]
            scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y1))
            # per-lane error, sentinel-folded lane badness (popsweep
            # controller comment explains the NaN-poison algebra)
            r_l = jnp.sqrt(jnp.mean((err / scale) ** 2, axis=-1))    # [B]
            r_l = r_l + (scale[:, 0] + scale[:, 1]) * 0.0
            lane_bad = ~(r_l < jnp.float32(jnp.inf))
            r_c = jnp.where(lane_bad, jnp.float32(3.4e38), r_l)
            ratio = jnp.max(jnp.where(alive_b, r_c, 0.0))
            accept = ratio <= 1.0
            lane_pass = ~lane_bad & (r_l <= 1.0)
            alive_b = alive_b & (lane_pass | (h_eff > 2e-7))
            alive = alive_b.astype(jnp.float32)
            adv = (accept & alive_b)[:, None]                      # [B, 1]
            # record THIS trip's attempt (popsweep kernel record comment:
            # searchsorted(side='right') always lands on an accepted slot)
            sc = jnp.where(lane128 == 0, t,
                           jnp.where(lane128 == 1, h_eff, 0.0))
            vm_sc[pl.ds(i, 1), :] = sc[None]
            vm_y[pl.ds(i, 1), :, :] = _pad_bt(y)[None]
            vm_k[pl.ds(i, 1), :, :, :] = jnp.stack(
                [_pad_bt(k) for k in ks])[None]
            t = jnp.where(accept, t + h_eff, t)
            y = jnp.where(adv, y1, y)
            f = jnp.where(adv, ks[6], f)
            n_acc = n_acc + accept.astype(jnp.int32)
            factor = _SAFETY * jnp.exp(
                -0.2 * jnp.log(jnp.maximum(ratio, 1e-10)))
            # ratio == sentinel -> factor ~9e-9 -> clipped to _MINF
            h = h_eff * jnp.clip(factor, _MINF,
                                 jnp.where(accept, _MAXF, 1.0))
            return (t, y, f, h, n_acc, alive)

        # members whose RHS is non-finite at rest are dead from the start
        alive0 = jnp.all(jnp.isfinite(f0), axis=-1)
        f0 = jnp.where(alive0[:, None], f0, 0.0)
        init = (jnp.float32(t0), y0, f0, jnp.float32(dt_knot * 10.0),
                jnp.int32(0), alive0.astype(jnp.float32))
        block = 256
        assert trips % block == 0
        n_blocks = trips // block

        def blk_cond(state):
            blk, st = state
            return ((blk < n_blocks) & (st[0] < t_end)
                    & jnp.any(st[5] > 0.5))

        def blk_body(state):
            blk, st = state
            st = jax.lax.fori_loop(0, block, lambda j, s: body(j, s), st)
            base = blk * block
            c0 = pltpu.make_async_copy(
                vm_sc, rec_sc.at[pl.ds(base, block)], sems.at[0])
            c1 = pltpu.make_async_copy(
                vm_y, rec_y.at[pl.ds(base, block)], sems.at[1])
            c2 = pltpu.make_async_copy(
                vm_k, rec_k.at[pl.ds(base, block)], sems.at[2])
            c0.start()
            c1.start()
            c2.start()
            c0.wait()
            c1.wait()
            c2.wait()
            return blk + 1, st

        _blk, (t, y, f, h, n_acc, alive, *_r) = jax.lax.while_loop(
            blk_cond, blk_body, (jnp.int32(0), init))
        ok = t >= t_end
        n_out_ref[0, 0] = jnp.where(ok, n_acc, -jnp.maximum(n_acc, 1))
        n_out_ref[0, 1] = _blk * block
        m_out_ref[...] = _pad_bt(jnp.broadcast_to(
            alive[:, None], (b, 2)))

    return kernel


def fused_nnf_pop_solve_ft(
    nets,                           # pytree: [(W [B,i,o], b [B,o]), ...]
    rgate: HHParams,
    proto_v: jnp.ndarray,           # [N] shared knot voltages
    ts: jnp.ndarray,
    *,
    proto_t0: float = 0.0,
    proto_dt: float = 0.1,
    t_end: float | None = None,
    rtol: float = 1e-5,
    atol: float = 1e-7,
    trips: int = 2048,
    interpret: bool = False,
):
    """Fixed-trip fused solve for a per-lane-weights NN-f population on ONE
    shared protocol (the CMA-ES workload).  Divergence is isolated PER
    MEMBER (round 4): a divergent candidate net freezes, leaves the shared
    controller, and scores inf alone — one bad CMA-ES member no longer
    erases the generation's ranking information (batched.py semantics).
    Returns ys [B, T, 2]."""
    b = nets[0][0].shape[0]
    assert b <= 128, "lane padding targets one 128-lane tile"
    n = proto_v.shape[0]
    t_end = float(t_end) if t_end is not None else float(ts[-1])
    n_pad = ((n + 127) // 128) * 128 + 256
    vpad = jnp.concatenate(
        [proto_v.astype(jnp.float32)[None],
         jnp.broadcast_to(proto_v[-1:].astype(jnp.float32),
                          (1, n_pad - n))], axis=1)
    ws = [w.astype(jnp.float32) for w, _ in nets]
    bs = [bb.astype(jnp.float32) for _, bb in nets]

    kernel = _make_kernel_pop_ft(
        len(ws), n_pad, float(proto_t0), float(proto_dt), t_end,
        tuple(float(x) for x in (rgate.p5, rgate.p6, rgate.p7, rgate.p8)),
        float(rtol), float(atol), int(trips), b)

    rec_sc, rec_y, rec_k, n_acc, m_pack = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((trips, 128), jnp.float32),
            jax.ShapeDtypeStruct((trips, 2, 128), jnp.float32),
            jax.ShapeDtypeStruct((trips, 7, 2, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
            jax.ShapeDtypeStruct((2, 128), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + 2 * len(ws)),
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((256, 128), jnp.float32),
            pltpu.VMEM((256, 2, 128), jnp.float32),
            pltpu.VMEM((256, 7, 2, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(vpad, *ws, *bs)

    return _dense_eval_ft(rec_sc, rec_y, rec_k, n_acc[0, 0], n_acc[0, 1],
                          ts.astype(jnp.float32), b,
                          lane_ok=m_pack[0, :b] > 0.5)


def _make_kernel_hh_ft(n_knots_padded: int, t0: float, dt_knot: float,
                       t_end: float, rtol: float, atol: float, trips: int,
                       b: int):
    # the per-lane-PARAMS sibling of _make_kernel_pop_ft: the candidate-HH
    # CMA-ES population (train-d0.py's PINTS parallel evaluation) with the
    # 8 rate parameters per lane instead of MLP weights — all-VPU RHS, no
    # matmul, same fixed-trip blocked controller with per-lane death
    inv_dt = 1.0 / dt_knot
    A = [[float(x) for x in row] for row in _A]
    C = [float(x) for x in _C]
    BS = [float(x) for x in _B_SOL]
    BE = [float(x) for x in _B_ERR]

    def kernel(v_ref, p_ref, y0_ref, *refs):
        rec_sc, rec_y, rec_k, n_out_ref, m_out_ref = refs[:5]
        vm_sc, vm_y, vm_k, sems = refs[5:]

        def voltage(t):
            # shared protocol: scalar V(t), broadcast across lanes
            x = (t - t0) * inv_dt
            ii = jnp.clip(jnp.floor(x).astype(jnp.int32), 0,
                          n_knots_padded - 130)
            w = x - ii.astype(jnp.float32)
            base = pl.multiple_of((ii // 128) * 128, 128)
            off = ii - base
            chunk = v_ref[:, pl.ds(base, 256)]                  # [1, 256]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
            v0 = jnp.sum(jnp.where(lane == off, chunk, 0.0))
            v1 = jnp.sum(jnp.where(lane == off + 1, chunk, 0.0))
            return v0 + w * (v1 - v0)                           # scalar

        def rhs(t, y):                                          # y [B, 2]
            v = voltage(t)
            p = p_ref[...]                                      # [B, 8]
            k1 = p[:, 0] * jnp.exp(p[:, 1] * v)
            k2 = p[:, 2] * jnp.exp(-p[:, 3] * v)
            k3 = p[:, 4] * jnp.exp(p[:, 5] * v)
            k4 = p[:, 6] * jnp.exp(-p[:, 7] * v)
            dadt = k1 * (1.0 - y[:, 0]) - k2 * y[:, 0]
            drdt = -k3 * y[:, 1] + k4 * (1.0 - y[:, 1])
            return jnp.stack([dadt, drdt], axis=-1)

        # initial state arrives packed [2, 128] (state sublanes, member
        # lanes — _pad_bt layout) so chained sweep launches can carry the
        # previous sweep's final state in (train-d0.py integrates the
        # sweep concatenation as one trace)
        y0 = jnp.transpose(y0_ref[...])[:b]                     # [B, 2]
        f0 = rhs(jnp.float32(t0), y0)

        def _pad_bt(arr):
            at = arr.T
            if b == 128:
                return at
            pad = jnp.zeros((2, 128 - b), jnp.float32)
            return jnp.concatenate([at, pad], axis=1)

        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)[0]

        def body(i, state):
            (t, y, f, h, n_acc, alive, _r_prev) = state
            # per-lane death mirrors _make_kernel_pop_ft: one divergent
            # CMA-ES candidate must not erase the generation's ranking
            alive_b = alive > 0.5
            h_eff = jnp.maximum(jnp.minimum(h, t_end - t), 1e-8)
            ks = [f]
            for si in range(1, 7):
                yi = y
                for sj in range(si):
                    if A[si][sj] != 0.0:
                        yi = yi + (h_eff * A[si][sj]) * ks[sj]
                ks.append(rhs(t + C[si] * h_eff, yi))
            y1 = y
            err = jnp.zeros_like(y)
            for sj in range(7):
                if BS[sj] != 0.0:
                    y1 = y1 + (h_eff * BS[sj]) * ks[sj]
                if BE[sj] != 0.0:
                    err = err + (h_eff * BE[sj]) * ks[sj]
            scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y1))
            # sentinel-folded lane badness (popsweep controller comment)
            r_l = jnp.sqrt(jnp.mean((err / scale) ** 2, axis=-1))    # [B]
            r_l = r_l + (scale[:, 0] + scale[:, 1]) * 0.0
            lane_bad = ~(r_l < jnp.float32(jnp.inf))
            r_c = jnp.where(lane_bad, jnp.float32(3.4e38), r_l)
            ratio = jnp.max(jnp.where(alive_b, r_c, 0.0))
            accept = ratio <= 1.0
            lane_pass = ~lane_bad & (r_l <= 1.0)
            alive_b = alive_b & (lane_pass | (h_eff > 2e-7))
            alive = alive_b.astype(jnp.float32)
            adv = (accept & alive_b)[:, None]                      # [B, 1]
            # record THIS trip's attempt (popsweep kernel record comment:
            # searchsorted(side='right') always lands on an accepted slot)
            sc = jnp.where(lane128 == 0, t,
                           jnp.where(lane128 == 1, h_eff, 0.0))
            vm_sc[pl.ds(i, 1), :] = sc[None]
            vm_y[pl.ds(i, 1), :, :] = _pad_bt(y)[None]
            vm_k[pl.ds(i, 1), :, :, :] = jnp.stack(
                [_pad_bt(k) for k in ks])[None]
            t = jnp.where(accept, t + h_eff, t)
            y = jnp.where(adv, y1, y)
            f = jnp.where(adv, ks[6], f)
            n_acc = n_acc + accept.astype(jnp.int32)
            factor = _SAFETY * jnp.exp(
                -0.2 * jnp.log(jnp.maximum(ratio, 1e-10)))
            h = h_eff * jnp.clip(factor, _MINF,
                                 jnp.where(accept, _MAXF, 1.0))
            return (t, y, f, h, n_acc, alive, r_c)

        # lanes arriving non-finite (chained carry marks dead lanes NaN)
        # or with a non-finite rest RHS are dead from the start
        alive0 = (jnp.all(jnp.isfinite(y0), axis=-1)
                  & jnp.all(jnp.isfinite(f0), axis=-1))
        y0 = jnp.where(alive0[:, None], y0, jnp.concatenate(
            [jnp.zeros((b, 1), jnp.float32),
             jnp.ones((b, 1), jnp.float32)], axis=1))
        f0 = jnp.where(alive0[:, None], f0, 0.0)
        init = (jnp.float32(t0), y0, f0, jnp.float32(dt_knot * 10.0),
                jnp.int32(0), alive0.astype(jnp.float32),
                jnp.zeros((b,), jnp.float32))
        block = 256
        assert trips % block == 0
        n_blocks = trips // block

        def blk_cond(state):
            blk, st, _pend = state
            return ((blk < n_blocks) & (st[0] < t_end)
                    & jnp.any(st[5] > 0.5))

        def blk_body(state):
            blk, st, pend = state
            st = jax.lax.fori_loop(0, block, lambda j, s: body(j, s), st)
            # pace-based cull (popsweep blk_body intent, r-threshold
            # form): the HH gates are bounded in [0, 1], so a wild CMA-ES
            # candidate cannot blow up its STATE — it manifests as
            # extreme stiffness that pins the SHARED controller's step
            # and exhausts the trip budget for the whole generation.
            # When the launch projects a shortfall, kill the lanes that
            # are BINDING the controller — the accepted-trip ratio of the
            # step-limiting lane equilibrates around 0.4-0.6 (safety^5)
            # while non-binding lanes at a grinder-pinned h read f32
            # rounding noise (~1e-9, measured in the round-4 probe), so
            # the 0.01 threshold splits them by 7 orders; the
            # popsweep's error-implied-step form misfires here because at
            # a grinder-pinned h the healthy lanes' f32 error is ROUNDING
            # NOISE (err ~ h*eps*|k|, not h^5), which under-predicts
            # their feasible step and culled everyone (round-4 probe).
            # The shortfall must persist across two consecutive blocks
            # (pend) so a transiently-stiff lane at a protocol
            # discontinuity is not falsely culled.
            spent = ((blk + 1) * block).astype(jnp.float32)
            frac_spent = spent / float(trips)
            t_frac = (st[0] - t0) / (t_end - t0)
            behind = (frac_spent >= 0.5) & (t_frac < frac_spent - 0.3)
            cand = (behind & (st[6] > 0.01)).astype(jnp.float32)
            alive_new = jnp.where((cand > 0.5) & (pend > 0.5), 0.0, st[5])
            st = st[:5] + (alive_new,) + st[6:]
            pend = cand
            base = blk * block
            c0 = pltpu.make_async_copy(
                vm_sc, rec_sc.at[pl.ds(base, block)], sems.at[0])
            c1 = pltpu.make_async_copy(
                vm_y, rec_y.at[pl.ds(base, block)], sems.at[1])
            c2 = pltpu.make_async_copy(
                vm_k, rec_k.at[pl.ds(base, block)], sems.at[2])
            c0.start()
            c1.start()
            c2.start()
            c0.wait()
            c1.wait()
            c2.wait()
            return blk + 1, st, pend

        _blk, (t, y, f, h, n_acc, alive, *_r), _pend = jax.lax.while_loop(
            blk_cond, blk_body,
            (jnp.int32(0), init, jnp.zeros((b,), jnp.float32)))
        ok = t >= t_end
        n_out_ref[0, 0] = jnp.where(ok, n_acc, -jnp.maximum(n_acc, 1))
        n_out_ref[0, 1] = _blk * block
        m_out_ref[...] = _pad_bt(jnp.broadcast_to(
            alive[:, None], (b, 2)))

    return kernel


def fused_hh_pop_solve_ft(
    params: jnp.ndarray,            # [B, 8] per-lane HH rate parameters
    proto_v: jnp.ndarray,           # [N] shared knot voltages
    ts: jnp.ndarray,
    *,
    proto_t0: float = 0.0,
    proto_dt: float = 0.1,
    t_end: float | None = None,
    rtol: float = 1e-5,
    atol: float = 1e-7,
    trips: int = 2048,
    y0: jnp.ndarray | None = None,
    interpret: bool = False,
):
    """Fixed-trip ADAPTIVE fused solve for a candidate-HH parameter
    population on ONE shared protocol — the d0/r0 CMA-ES whole-trace
    objective shape (reference: train-d0.py:427-505 evaluates each PINTS
    member with its own scipy solve).  The adaptive controller strides
    holds in large steps, which the fixed-step fused_hh_rk4 cannot
    (measured round 4: the RK4 kernel pays 82,580 substeps on a Pr3 sweep
    the adaptive lockstep crosses in ~600 accepted steps).  Divergence is
    isolated PER MEMBER; a bad candidate scores inf alone, and a
    controller-pinning STIFF candidate (bounded gates cannot blow up) is
    pace-culled by the binding-ratio rule in blk_body.  y0 [B, 2] seeds
    per-lane state so chained sweep launches carry the previous sweep's
    final state (NaN carries propagate deadness).  Chip-measured
    (round 4, Pr3 82,580-sample sweep, B=128): 2,732 sweep-solves/s
    synced (46.9 ms median incl. the ~25 ms tunnel dispatch RTT; ~22 ms
    pure kernel) vs 1,829 for the 64-lane XLA lockstep — 1.5x synced,
    ~3x per-solve pipelined.  Returns ys [B, T, 2]."""
    b = params.shape[0]
    assert b <= 128, "lane padding targets one 128-lane tile"
    n = proto_v.shape[0]
    t_end = float(t_end) if t_end is not None else float(ts[-1])
    n_pad = ((n + 127) // 128) * 128 + 256
    vpad = jnp.concatenate(
        [proto_v.astype(jnp.float32)[None],
         jnp.broadcast_to(proto_v[-1:].astype(jnp.float32),
                          (1, n_pad - n))], axis=1)
    if y0 is None:
        y0 = jnp.concatenate(
            [jnp.zeros((b, 1), jnp.float32),
             jnp.ones((b, 1), jnp.float32)], axis=1)
    y0_pack = y0.astype(jnp.float32).T
    if b < 128:
        y0_pack = jnp.concatenate(
            [y0_pack, jnp.zeros((2, 128 - b), jnp.float32)], axis=1)
    trips = -(-int(trips) // 256) * 256

    kernel = _make_kernel_hh_ft(
        n_pad, float(proto_t0), float(proto_dt), t_end,
        float(rtol), float(atol), trips, b)

    rec_sc, rec_y, rec_k, n_acc, m_pack = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((trips, 128), jnp.float32),
            jax.ShapeDtypeStruct((trips, 2, 128), jnp.float32),
            jax.ShapeDtypeStruct((trips, 7, 2, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
            jax.ShapeDtypeStruct((2, 128), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((256, 128), jnp.float32),
            pltpu.VMEM((256, 2, 128), jnp.float32),
            pltpu.VMEM((256, 7, 2, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(vpad, jnp.asarray(params, jnp.float32), y0_pack)

    return _dense_eval_ft(rec_sc, rec_y, rec_k, n_acc[0, 0], n_acc[0, 1],
                          ts.astype(jnp.float32), b,
                          lane_ok=m_pack[0, :b] > 0.5)


# ---------------------------------------------------------------------------
# Population x protocol-sweep variant: P member nets, EACH solved on Q
# protocols simultaneously.  This is the checkpoint-validation / ensemble
# workload the default training recipe ships (studies.run_study_validated
# scores every candidate checkpoint on a protocol replay set; reference
# analogue: train-r1.py:928-959 validation rollouts) and the multi-protocol
# CMA-ES objective shape (train-d0.py:465-492 evaluates each member on
# Pr3+Pr5 from rest).
#
# Why it beats the per-lane pop kernel: with ONE protocol per member the MLP
# is a batched dot_general of shape [P, 1, n] x [P, n, m] — the M=1 row pads
# to the full 8-sublane MXU tile, so 7/8 of the systolic array idles (the
# measured residual wall, ROADMAP "Performance").  Putting the Q protocol
# rows in M fills the tile: [P, Q, n] x [P, n, m] does Q solves' worth of
# RHS work in the SAME padded matmul for Q <= 8, and amortises the
# per-trip controller/record floor further at Q = 16/32 (multi-tile M,
# unlocked by fold_bias — see the round-4 bisect note inside mlp()).
# ---------------------------------------------------------------------------


def _make_kernel_popsweep_ft(n_layers: int, n_knots_padded: int, t0: float,
                             dt_knot: float, t_end: float, rgate: tuple,
                             rtol: float, atol: float, trips: int, p: int,
                             q: int, block: int, base_a: tuple = (),
                             cull: bool = True, mxu_bf16: bool = False,
                             fold_bias: bool = False, q_split: int = 1):
    p5, p6, p7, p8 = rgate
    inv_dt = 1.0 / dt_knot
    A = [[float(x) for x in row] for row in _A]
    C = [float(x) for x in _C]
    BS = [float(x) for x in _B_SOL]
    BE = [float(x) for x in _B_ERR]

    def kernel(v_ref, y0_ref, *refs):
        w_refs = refs[:n_layers]
        nb = 0 if fold_bias else n_layers
        b_refs = refs[n_layers:n_layers + nb]
        (rec_sc, rec_y, rec_k, n_out_ref,
         m_out_ref) = refs[n_layers + nb:n_layers + nb + 5]
        vm_sc, vm_y, vm_k, sems = refs[n_layers + nb + 5:]

        def voltage(t, r0=0, nq=q):
            # nq per-protocol knot rows starting at static row r0, one
            # shared clock: [nq] voltages
            x = (t - t0) * inv_dt
            ii = jnp.clip(jnp.floor(x).astype(jnp.int32), 0,
                          n_knots_padded - 130)
            w = x - ii.astype(jnp.float32)
            base = pl.multiple_of((ii // 128) * 128, 128)
            off = ii - base
            chunk = v_ref[pl.ds(r0, nq), pl.ds(base, 256)]      # [nq, 256]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
            v0 = jnp.sum(jnp.where(lane == off, chunk, 0.0), axis=1)
            v1 = jnp.sum(jnp.where(lane == off + 1, chunk, 0.0), axis=1)
            return v0 + w * (v1 - v0)                           # [nq]

        def mlp(x):                                             # x [P, Q, n]
            h = x
            for li, wr in enumerate(w_refs):
                if fold_bias:
                    # q > 8: the bias add's [P, 1, m] sublane broadcast
                    # onto a >=2-tile dot result hard-faults Mosaic
                    # ('limits[i] <= dim(i) (2 vs. 1)', round-4 bisect);
                    # the bias rides the matmul instead as an augmented
                    # ones-column row (host concats it into the weights)
                    h = jnp.concatenate(
                        [h, jnp.ones(h.shape[:2] + (1,), h.dtype)],
                        axis=-1)
                # mxu_bf16: weights arrive bf16 (cast once on the host,
                # halving their VMEM residency); activations cast per
                # layer, accumulation stays f32 — the MXU's native mode
                lhs = h.astype(jnp.bfloat16) if mxu_bf16 else h
                h = jax.lax.dot_general(
                    lhs, wr[...], (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)         # [P, Q, m]
                if not fold_bias:
                    h = h + b_refs[li][...][:, None, :]
                if li < n_layers - 1:
                    h = jnp.where(h >= 0, h, 0.01 * h)
            return h                                            # [P, Q, 1]

        def rhs(t, y, r0=0):                                # y [P, nq, 2]
            nq = y.shape[1]
            v = voltage(t, r0, nq)                              # [nq]
            vn = jnp.broadcast_to(v[None, :] / VRANGE, (p, nq))
            x = jnp.stack([vn, y[:, :, 0]], axis=-1)
            dadt = mlp(x)[:, :, 0] / NETSCALE                   # [P, nq]
            if base_a:
                p1, p2, p3, p4 = base_a
                k1 = p1 * jnp.exp(p2 * v)
                k2 = p3 * jnp.exp(-p4 * v)
                dadt = (dadt + k1[None] * (1.0 - y[:, :, 0])
                        - k2[None] * y[:, :, 0])
            k3 = p5 * jnp.exp(p6 * v)
            k4 = p7 * jnp.exp(-p8 * v)
            drdt = -k3[None] * y[:, :, 1] + k4[None] * (1.0 - y[:, :, 1])
            return jnp.stack([dadt, drdt], axis=-1)

        assert q % q_split == 0
        qc = q // q_split

        def rhs_all(t, y):
            # full-width RHS, chunked over Q when q_split > 1 so no more
            # than [P, qc, hidden] of MLP intermediates is live at once
            if q_split == 1:
                return rhs(t, y)
            return jnp.concatenate(
                [rhs(t, y[:, ci * qc:(ci + 1) * qc], ci * qc)
                 for ci in range(q_split)], axis=1)

        # initial state arrives packed like the records: [2Q, 128] ->
        # [P, Q, 2] (the inverse of _pad_rec) so chained launches can carry
        # the previous segment's final state in
        y0 = jnp.transpose(y0_ref[...][:, :p].reshape(q, 2, p), (2, 0, 1))
        f0 = rhs_all(jnp.float32(t0), y0)

        def _pad_rec(arr):
            # [P, nq, 2] -> [nq*2, 128]: (protocol, state) in sublanes,
            # members in lanes (padded)
            nq = arr.shape[1]
            at = jnp.transpose(arr, (1, 2, 0)).reshape(nq * 2, p)
            if p == 128:
                return at
            return jnp.concatenate(
                [at, jnp.zeros((nq * 2, 128 - p), jnp.float32)], axis=1)

        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)[0]

        def body(i, state):
            (t, y, f, h, n_acc, alive, _r_prev) = state
            # alive carried as f32 (Mosaic cannot yield i1 vectors from
            # the loop: scf.yield legalization failure on chip)
            alive_b = alive > 0.5
            h_eff = jnp.maximum(jnp.minimum(h, t_end - t), 1e-8)
            ks = [f]
            for si in range(1, 7):
                yi = y
                for sj in range(si):
                    if A[si][sj] != 0.0:
                        yi = yi + (h_eff * A[si][sj]) * ks[sj]
                ks.append(rhs(t + C[si] * h_eff, yi))
            y1 = y
            err = jnp.zeros_like(y)
            for sj in range(7):
                if BS[sj] != 0.0:
                    y1 = y1 + (h_eff * BS[sj]) * ks[sj]
                if BE[sj] != 0.0:
                    err = err + (h_eff * BE[sj]) * ks[sj]
            scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y1))
            # per-(member, protocol) error; shared accept on the worst LIVE
            # lane — a divergent candidate net must not poison the launch
            # (batched.py:94-106 per-lane-death semantics).  Lane badness
            # folds into the ONE max reduction via a finite sentinel: any
            # non-finite stage k makes err (every BE entry is nonzero) and
            # hence r_pq non-finite, and a non-finite y1 with finite err
            # makes scale non-finite — NaN-poison r_pq with scale*0 so both
            # cases read as bad without per-trip isfinite/any reductions
            # (genuine ratios stay < ~2e19, far under the 3.4e38 sentinel,
            # which rejects the trip and drives factor to _MINF through the
            # ordinary controller algebra).
            r_pq = jnp.sqrt(jnp.mean((err / scale) ** 2, axis=-1))  # [P, Q]
            r_pq = r_pq + (scale[:, :, 0] + scale[:, :, 1]) * 0.0
            lane_bad = ~(r_pq < jnp.float32(jnp.inf))       # nan or inf
            r_c = jnp.where(lane_bad, jnp.float32(3.4e38), r_pq)
            ratio = jnp.max(jnp.where(alive_b, r_c, 0.0))
            accept = ratio <= 1.0
            # a live lane that cannot pass even near the minimum step —
            # non-finite or ratio > 1 with h pinned — dies: frozen finite
            # state, excluded from the controller, masked to inf in phase 2
            lane_pass = ~lane_bad & (r_pq <= 1.0)
            alive_b = alive_b & (lane_pass | (h_eff > 2e-7))
            alive = alive_b.astype(jnp.float32)
            adv = (accept & alive_b)[..., None]                     # [P,Q,1]
            # record THIS trip's attempt (start t, step, start y, stages)
            # rather than carrying a last-accepted snapshot: dense eval's
            # searchsorted(side="right") always lands on an ACCEPTED slot
            # — rejected trips re-record the same start t, and the accept
            # that ends the streak is the LAST slot at that t before t
            # advances (tail micro-trips past t_end accept by
            # construction).  Dropping the [7, 2Q, 128] last-accept carry
            # (and its per-trip whole-buffer selects) is what breaks the
            # register-allocator spill wall at 2Q sublanes (VERDICT r4
            # next #3: 73 MB of spill slots at Q=64 were exactly this
            # carried RK state).
            sc = jnp.where(lane128 == 0, t,
                           jnp.where(lane128 == 1, h_eff, 0.0))
            vm_sc[pl.ds(i, 1), :] = sc[None]
            vm_y[pl.ds(i, 1), :, :] = _pad_rec(y)[None]
            vm_k[pl.ds(i, 1), :, :, :] = jnp.stack(
                [_pad_rec(k) for k in ks])[None]            # [7, Q*2, 128]
            t = jnp.where(accept, t + h_eff, t)
            y = jnp.where(adv, y1, y)
            f = jnp.where(adv, ks[6], f)
            n_acc = n_acc + accept.astype(jnp.int32)
            factor = _SAFETY * jnp.exp(
                -0.2 * jnp.log(jnp.maximum(ratio, 1e-10)))
            # ratio == sentinel -> factor ~9e-9 -> clipped to _MINF; the
            # bad-lane case needs no special path
            h = h_eff * jnp.clip(factor, _MINF,
                                 jnp.where(accept, _MAXF, 1.0))
            return (t, y, f, h, n_acc, alive, r_c)

        def body_split(i, state):
            # q_split > 1 trip body: the stage math is independent per
            # (member, protocol) lane — only the accept max couples rows —
            # so the RK stage chain runs per Q-chunk, and each chunk's
            # records land in the VMEM ring BEFORE the next chunk starts,
            # bounding the live MLP intermediates to [P, qc, hidden] plus
            # one chunk's 7-stage ks.  This is the two-pass working-set
            # split the 64x64 scoped-VMEM OOM frontier calls for (ROADMAP
            # round-5 probe).  Controller semantics are bit-identical to
            # `body` per element; the max reduces the concatenated chunks
            # exactly as before.
            (t, y, f, h, n_acc, alive, _r_prev) = state
            alive_b = alive > 0.5
            h_eff = jnp.maximum(jnp.minimum(h, t_end - t), 1e-8)
            y1_cs, err_cs, f7_cs = [], [], []
            for ci in range(q_split):
                sl = slice(ci * qc, (ci + 1) * qc)
                y_c = y[:, sl]
                ks = [f[:, sl]]
                for si in range(1, 7):
                    yi = y_c
                    for sj in range(si):
                        if A[si][sj] != 0.0:
                            yi = yi + (h_eff * A[si][sj]) * ks[sj]
                    ks.append(rhs(t + C[si] * h_eff, yi, ci * qc))
                y1_c = y_c
                err_c = jnp.zeros_like(y_c)
                for sj in range(7):
                    if BS[sj] != 0.0:
                        y1_c = y1_c + (h_eff * BS[sj]) * ks[sj]
                    if BE[sj] != 0.0:
                        err_c = err_c + (h_eff * BE[sj]) * ks[sj]
                # this chunk's record rows (trip attempt: start y + stages)
                # go to the ring now so the chunk's intermediates die here
                vm_y[pl.ds(i, 1), pl.ds(ci * qc * 2, qc * 2), :] = (
                    _pad_rec(y_c)[None])
                vm_k[pl.ds(i, 1), :, pl.ds(ci * qc * 2, qc * 2), :] = (
                    jnp.stack([_pad_rec(k) for k in ks])[None])
                y1_cs.append(y1_c)
                err_cs.append(err_c)
                f7_cs.append(ks[6])
            y1 = jnp.concatenate(y1_cs, axis=1)
            err = jnp.concatenate(err_cs, axis=1)
            f7 = jnp.concatenate(f7_cs, axis=1)
            scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y1))
            # identical shared-accept / per-lane-death / sentinel algebra
            # as `body` (see the comments there)
            r_pq = jnp.sqrt(jnp.mean((err / scale) ** 2, axis=-1))  # [P, Q]
            r_pq = r_pq + (scale[:, :, 0] + scale[:, :, 1]) * 0.0
            lane_bad = ~(r_pq < jnp.float32(jnp.inf))       # nan or inf
            r_c = jnp.where(lane_bad, jnp.float32(3.4e38), r_pq)
            ratio = jnp.max(jnp.where(alive_b, r_c, 0.0))
            accept = ratio <= 1.0
            lane_pass = ~lane_bad & (r_pq <= 1.0)
            alive_b = alive_b & (lane_pass | (h_eff > 2e-7))
            alive = alive_b.astype(jnp.float32)
            adv = (accept & alive_b)[..., None]                     # [P,Q,1]
            sc = jnp.where(lane128 == 0, t,
                           jnp.where(lane128 == 1, h_eff, 0.0))
            vm_sc[pl.ds(i, 1), :] = sc[None]
            t = jnp.where(accept, t + h_eff, t)
            y = jnp.where(adv, y1, y)
            f = jnp.where(adv, f7, f)
            n_acc = n_acc + accept.astype(jnp.int32)
            factor = _SAFETY * jnp.exp(
                -0.2 * jnp.log(jnp.maximum(ratio, 1e-10)))
            h = h_eff * jnp.clip(factor, _MINF,
                                 jnp.where(accept, _MAXF, 1.0))
            return (t, y, f, h, n_acc, alive, r_c)

        if q_split > 1:
            body = body_split  # the chunked trip body replaces `body`

        # lanes arriving non-finite (chained carry marks dead lanes NaN)
        # are dead from the start; their state resets to rest so the RHS
        # stays finite for everyone else
        alive0 = (jnp.all(jnp.isfinite(y0), axis=-1)
                  & jnp.all(jnp.isfinite(f0), axis=-1))
        y0 = jnp.where(alive0[..., None], y0, jnp.stack(
            [jnp.zeros((p, q), jnp.float32),
             jnp.ones((p, q), jnp.float32)], axis=-1))
        f0 = jnp.where(alive0[..., None], f0, 0.0)
        init = (jnp.float32(t0), y0, f0, jnp.float32(dt_knot * 10.0),
                jnp.int32(0), alive0.astype(jnp.float32),
                jnp.zeros((p, q), jnp.float32))
        assert trips % block == 0
        n_blocks = trips // block

        def blk_cond(state):
            blk, st, _pend = state
            return ((blk < n_blocks) & (st[0] < t_end)
                    & jnp.any(st[5] > 0.5))

        def blk_body(state):
            blk, st, pend = state
            st = jax.lax.fori_loop(0, block, lambda j, s: body(j, s), st)
            # pace-based cull: lanes too stiff to finish inside the trip
            # budget would exhaust it for EVERYONE (the shared controller
            # runs at the worst live lane's step).  When the launch
            # projects a shortfall (trips spent well ahead of time
            # integrated), kill the lanes whose error-implied step
            # h*(1/r)^0.2 cannot make the remaining pace — the batch
            # analogue of the single-path solver's max_steps/buffer inf
            # (solver/batched.py gives up globally; solver/dopri5.py:220
            # sentinels singly).  Homogeneously stiff launches cull
            # everyone, which the single path would also fail on budget.
            # The shortfall must PERSIST across two consecutive blocks
            # (pend) so a lane that is only transiently stiff at a protocol
            # discontinuity — its instantaneous error-implied step
            # undershooting its average pace for one block — is not
            # falsely killed.
            if cull:
                spent = ((blk + 1) * block).astype(jnp.float32)
                frac_spent = spent / float(trips)
                t_frac = (st[0] - t0) / (t_end - t0)
                pace = (t_end - st[0]) / jnp.maximum(
                    float(trips) - spent, 1.0)
                # r floor 1e-30 (not the controller's 1e-10): a healthy
                # lane riding far below a grinder-pinned h has
                # r ~ (h/h_need)^5 as small as 1e-15; a higher floor would
                # cap its implied step at 100x h and cull it alongside the
                # grinder
                h_lane = st[3] * jnp.exp(
                    -0.2 * jnp.log(jnp.maximum(st[6], 1e-30)))
                behind = (frac_spent >= 0.5) & (t_frac < frac_spent - 0.3)
                cand = (behind & (h_lane < 0.3 * pace)).astype(jnp.float32)
                alive_new = jnp.where((cand > 0.5) & (pend > 0.5), 0.0,
                                      st[5])
                st = st[:5] + (alive_new,) + st[6:]
                pend = cand
            base = blk * block
            c0 = pltpu.make_async_copy(
                vm_sc, rec_sc.at[pl.ds(base, block)], sems.at[0])
            c1 = pltpu.make_async_copy(
                vm_y, rec_y.at[pl.ds(base, block)], sems.at[1])
            c2 = pltpu.make_async_copy(
                vm_k, rec_k.at[pl.ds(base, block)], sems.at[2])
            c0.start()
            c1.start()
            c2.start()
            c0.wait()
            c1.wait()
            c2.wait()
            return blk + 1, st, pend

        _blk, (t, y, f, h, n_acc, alive, *_r), _pend = jax.lax.while_loop(
            blk_cond, blk_body,
            (jnp.int32(0), init, jnp.zeros((p, q), jnp.float32)))
        ok = t >= t_end
        n_out_ref[0, 0] = jnp.where(ok, n_acc, -jnp.maximum(n_acc, 1))
        n_out_ref[0, 1] = _blk * block
        m_out_ref[...] = _pad_rec(jnp.broadcast_to(
            alive[..., None], (p, q, 2)).astype(jnp.float32))

    return kernel


def fused_nnf_popsweep_solve_ft(
    nets,                           # pytree: [(W [P,i,o], b [P,o]), ...]
    rgate: HHParams,
    protos_v: jnp.ndarray,          # [Q, N] per-protocol knot voltages
    ts: jnp.ndarray,                # [T] output times (ascending)
    *,
    proto_t0: float = 0.0,
    proto_dt: float = 0.1,
    t_end: float | None = None,
    rtol: float = 1e-5,
    atol: float = 1e-7,
    trips: int = 2048,
    base_hh: HHParams | None = None,
    y0: jnp.ndarray | None = None,
    return_records: bool = False,
    cull: bool = True,
    mxu_bf16: bool = False,
    vmem_limit_mb: int = 100,
    q_split: int = 1,
    interpret: bool = False,
):
    """Fixed-trip fused solve for P member nets x Q protocols concurrently
    (P*Q solves per launch).  Protocols share the clock: pad shorter ones to
    a common t_end with their holding potential and query only each
    protocol's own times.  base_hh switches to the NN-d family (MLP as an
    additive correction to the analytic p1-p4 a-gate, r-gate from base_hh).
    y0 [P, Q, 2] seeds the state per (member, protocol) — chained launches
    over the segments of a long recording carry it (eval.solve_states_long
    semantics).  return_records skips phase 2 and returns the raw record
    stream (rec_sc, rec_y, rec_k, n_acc, n_valid, q_pad) so callers with
    long output grids can dense-eval in T-chunks (PopsweepRecords.evaluate).
    mxu_bf16 stores the MLP weights in bf16 and feeds the matmuls bf16
    operands with f32 accumulation.  On the TPU backend this is
    BIT-IDENTICAL to the f32 path — XLA's DEFAULT matmul precision
    already truncates f32 dot operands to one bf16 pass at the MXU
    (verified on chip: f32 vs bf16-stored dots match exactly, in XLA and
    in Mosaic) — while halving the resident weight bytes (the relevant
    budget for growing P past 64 members).  Measured round 4: no
    throughput change at P=64 (the resident population fits VMEM either
    way).  On CPU/interpret backends, where f32 dots are genuine f32,
    the truncation changes results by ~2^-8 relative.
    q_split > 1 chunks the trip body's RK stage chain over Q (the stage
    math is lane-independent; only the accept max couples rows), bounding
    the live MLP intermediates to [P, Q/q_split, hidden] per chunk — the
    two-pass working-set split for frontier configs past the single-pass
    scoped-VMEM wall (ROADMAP round-5 probe).  Numerically the same
    trajectory (bit-exact at q_split=2 in interpret mode; a backend may
    reorder a dot's K reduction for very small M, so qc=1 chunks can
    differ at f32 rounding level).
    Returns ys [P, Q, T, 2]."""
    p = nets[0][0].shape[0]
    q_req, n = protos_v.shape
    assert p <= 128, "member padding targets one 128-lane tile"
    # Mosaic requires the 2Q sublane dim to be a power of two (Q in
    # {3,5,6} hard-fault the chip backend): pad Q by duplicating the last
    # protocol row and slice the members' rows back at the end
    q = max(2, 1 << (q_req - 1).bit_length())
    if q > POPSWEEP_MAX_ROWS * max(1, int(q_split)) and not interpret:
        # past 2Q=64 record sublanes the VMEM record ring shrinks below
        # a useful block and the layout is unprobed on the chip backend
        # (the q<=8 ceiling was a Mosaic bias-broadcast fault, bisected
        # and fixed in round 4 via fold_bias; 16/32 are chip-verified)
        raise ValueError(
            f"popsweep supports at most {POPSWEEP_MAX_ROWS} protocol rows "
            f"per launch on the chip backend (got Q={q_req}, pads to {q}); "
            f"split into <={POPSWEEP_MAX_ROWS}-row launches — "
            f"eval.simulate_population does this automatically")
    # q > 8: per-layer bias adds ([P, 1, m] sublane broadcast onto a
    # 2Q-sublane dot result) hard-fault the Mosaic compiler ('limits[i]
    # <= dim(i) (2 vs. 1)', scripts/probe_mosaic_bias_fault.py); fold
    # the biases into the matmuls as augmented ones-column rows.  Kept off
    # for q <= 8 so the validated captures stay bit-identical (on chip
    # the fold quantises the bias through the MXU's bf16 operand pass,
    # a ~2^-8 relative shift on the bias contribution).
    fold_bias = q > 8
    if q != q_req:
        protos_v = jnp.concatenate(
            [protos_v,
             jnp.broadcast_to(protos_v[-1:], (q - q_req, n))], axis=0)
    if y0 is None:
        y0 = jnp.concatenate(
            [jnp.zeros((p, q, 1), jnp.float32),
             jnp.ones((p, q, 1), jnp.float32)], axis=-1)
    else:
        y0 = y0.astype(jnp.float32)
        if q != q_req:
            y0 = jnp.concatenate(
                [y0, jnp.broadcast_to(y0[:, -1:], (p, q - q_req, 2))],
                axis=1)
    # pack like the record stream: [P, Q, 2] -> [2Q, 128]
    y0_pack = jnp.transpose(y0, (1, 2, 0)).reshape(2 * q, p)
    if p < 128:
        y0_pack = jnp.concatenate(
            [y0_pack, jnp.zeros((2 * q, 128 - p), jnp.float32)], axis=1)
    t_end = float(t_end) if t_end is not None else float(ts[-1])
    n_pad = ((n + 127) // 128) * 128 + 256
    vpad = jnp.concatenate(
        [protos_v.astype(jnp.float32),
         jnp.broadcast_to(protos_v[:, -1:].astype(jnp.float32),
                          (q, n_pad - n))], axis=1)
    w_dtype = jnp.bfloat16 if mxu_bf16 else jnp.float32
    if fold_bias:
        ws = [jnp.concatenate(
            [w.astype(jnp.float32), bb.astype(jnp.float32)[:, None, :]],
            axis=1).astype(w_dtype) for w, bb in nets]
        bs = []
    else:
        ws = [w.astype(w_dtype) for w, _ in nets]
        bs = [bb.astype(jnp.float32) for _, bb in nets]

    # VMEM record ring: block sized so the K ring (block * 7 * 2Q * 128 f32)
    # stays well under the scoped-stack limit alongside the resident weights
    block = 256
    while block > 32 and block * 7 * 2 * q * 128 * 4 > 6 * 1024 * 1024:
        block //= 2
    trips = -(-int(trips) // block) * block

    gate = base_hh if base_hh is not None else rgate
    kernel = _make_kernel_popsweep_ft(
        len(ws), n_pad, float(proto_t0), float(proto_dt), t_end,
        tuple(float(x) for x in (gate.p5, gate.p6, gate.p7, gate.p8)),
        float(rtol), float(atol), int(trips), p, q, block,
        base_a=(tuple(float(x) for x in
                      (base_hh.p1, base_hh.p2, base_hh.p3, base_hh.p4))
                if base_hh is not None else ()),
        cull=cull, mxu_bf16=mxu_bf16, fold_bias=fold_bias,
        q_split=int(q_split))

    rec_sc, rec_y, rec_k, n_acc, m_pack = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((trips, 128), jnp.float32),
            jax.ShapeDtypeStruct((trips, 2 * q, 128), jnp.float32),
            jax.ShapeDtypeStruct((trips, 7, 2 * q, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
            jax.ShapeDtypeStruct((2 * q, 128), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (
            2 + len(ws) + len(bs)),
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((block, 128), jnp.float32),
            pltpu.VMEM((block, 2 * q, 128), jnp.float32),
            pltpu.VMEM((block, 7, 2 * q, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # v5e VMEM is 128 MB; the default 100 MB cap leaves scheduler
            # headroom.  Frontier configs (2Q=128 sublanes of RK state)
            # need ~105 MB scoped stack — callers may raise the cap to
            # trade DMA-overlap headroom for a compile (round-5 probe).
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024),
        interpret=interpret,
    )(vpad, y0_pack, *ws, *bs)

    mask = m_pack[:, :p].reshape(q, 2, p)[:, 0, :].T > 0.5      # [P, Q]
    if return_records:
        return PopsweepRecords(rec_sc, rec_y, rec_k, n_acc[0, 0],
                               n_acc[0, 1], p, q, q_req, mask)
    ys = _dense_eval_popsweep_ft(rec_sc, rec_y, rec_k, n_acc[0, 0],
                                 n_acc[0, 1], ts.astype(jnp.float32), p, q)
    return jnp.where(mask[:, :q_req, None, None], ys[:, :q_req], jnp.inf)


@dataclass(frozen=True)
class PopsweepRecords:
    """Raw popsweep record stream (phase 1 output): dense-evaluate in
    T-chunks so 100k-sample output grids never materialise the [T, 7, 2Q,
    128] gather at once.  mask [P, Q_pad] is the per-(member, protocol)
    survival flag — dead lanes (per-lane death, batched.py semantics)
    evaluate to inf."""
    rec_sc: jnp.ndarray
    rec_y: jnp.ndarray
    rec_k: jnp.ndarray
    n_acc: jnp.ndarray
    n_valid: jnp.ndarray
    p: int
    q: int
    q_req: int
    mask: jnp.ndarray

    def evaluate(self, ts: jnp.ndarray, chunk: int = 4096) -> jnp.ndarray:
        """ys [P, Q_req, T, 2] at ts, dense-evaluated <=chunk times at a
        go (the [C, 7, 2Q, 128] record gather is the memory scaler)."""
        t_n = int(ts.shape[0])
        if t_n <= chunk:
            ys = _dense_eval_popsweep_ft(
                self.rec_sc, self.rec_y, self.rec_k, self.n_acc,
                self.n_valid, ts.astype(jnp.float32), self.p, self.q)
            return jnp.where(self.mask[:, :self.q_req, None, None],
                             ys[:, :self.q_req], jnp.inf)
        parts = [self.evaluate(ts[i:i + chunk])
                 for i in range(0, t_n, chunk)]
        return jnp.concatenate(parts, axis=2)

    def final_state(self, t_end: float) -> jnp.ndarray:
        """y(t_end) [P, Q_req, 2] for chaining into the next segment (the
        next launch re-pads the protocol rows).  Dead lanes carry NaN so
        the next launch marks them dead at init — deadness propagates
        through the chain without extra bookkeeping."""
        ys = _dense_eval_popsweep_ft(
            self.rec_sc, self.rec_y, self.rec_k, self.n_acc, self.n_valid,
            jnp.asarray([t_end], jnp.float32), self.p, self.q)
        return jnp.where(self.mask[:, :self.q_req, None],
                         ys[:, :self.q_req, 0, :], jnp.nan)


def fused_nnf_popsweep_chained(
    nets,                           # pytree: [(W [P,i,o], b [P,o]), ...]
    rgate: HHParams,
    seg_v: jnp.ndarray,             # [B, Q, L] per-segment knot voltages
    *,
    proto_dt: float = 0.1,
    t_end: float | None = None,     # integration span per segment
    rtol: float = 1e-5,
    atol: float = 1e-7,
    trips: int = 6144,
    base_hh: HHParams | None = None,
    y0: jnp.ndarray | None = None,
    cull: bool = True,
    mxu_bf16: bool = False,
    q_split: int = 1,
    interpret: bool = False,
    consume=None,
    ts: jnp.ndarray | None = None,
):
    """Chained popsweep over the segments of LONG recordings: one launch
    per segment with a LOCAL f32 clock, final state carried into the next
    launch (the Pallas counterpart of solver/chained.odeint_chained — a
    single global f32 clock loses step resolution past ~30 s;
    eval.solve_states_long docstring).  Segment boundaries need not align
    with sweep boundaries: the controller resolves interior discontinuities
    exactly as in the single-launch case.

    consume(b, recs): called per segment with the PopsweepRecords —
    dense-evaluate/reduce in chunks without materialising every segment
    (the validation-MAE path).  Without consume, returns ys stacked on the
    local grid ts ([B, P, Q, T, 2]) — small-T use only.
    Returns (result_or_None, y_final [P, Q, 2])."""
    if consume is None and ts is None:
        raise ValueError("fused_nnf_popsweep_chained needs either a "
                         "consume callback or local output times ts")
    n_seg = seg_v.shape[0]
    if t_end is None:
        t_end = float(ts[-1]) if ts is not None else \
            float((seg_v.shape[2] - 1) * proto_dt)
    outs = []
    for b in range(n_seg):
        recs = fused_nnf_popsweep_solve_ft(
            nets, rgate, seg_v[b], jnp.asarray([t_end], jnp.float32),
            proto_dt=proto_dt, t_end=t_end, rtol=rtol, atol=atol,
            trips=trips, base_hh=base_hh, y0=y0, return_records=True,
            cull=cull, mxu_bf16=mxu_bf16, q_split=q_split,
            interpret=interpret)
        y0 = recs.final_state(t_end)
        if consume is not None:
            consume(b, recs)
        else:
            outs.append(recs.evaluate(ts))
    return (None if consume is not None else jnp.stack(outs)), y0


@partial(jax.jit, static_argnames=("p", "q"))
def _dense_eval_popsweep_ft(rec_sc, rec_y, rec_k, n_acc, n_valid, ts, p, q):
    """Phase 2 for the popsweep record stream ([trips, ..., Q*2, 128]
    layout: (protocol, state) sublanes x member lanes)."""
    ok = n_acc > 0
    big = jnp.float32(3.4e38)
    t_rec = jnp.where(jnp.arange(rec_sc.shape[0]) < n_valid,
                      rec_sc[:, 0], big)
    idx = jnp.clip(jnp.searchsorted(t_rec, ts, side="right") - 1, 0,
                   rec_sc.shape[0] - 1)
    t0s = rec_sc[idx, 0]
    hs = jnp.maximum(rec_sc[idx, 1], 1e-20)
    th = jnp.clip((ts - t0s) / hs, 0.0, 1.0)
    tp = jnp.stack([th, th ** 2, th ** 3, th ** 4], axis=-1)
    bpoly = tp @ jnp.asarray(_P_DENSE, jnp.float32).T              # [T, 7]
    t_n = ts.shape[0]
    kk = rec_k[idx].reshape(t_n, 7, q, 2, 128)[..., :p]   # [T,7,Q,2,P]
    y0s = rec_y[idx].reshape(t_n, q, 2, 128)[..., :p]     # [T,Q,2,P]
    ys = y0s + hs[:, None, None, None] * jnp.einsum(
        "tj,tjqsp->tqsp", bpoly, kk)
    ys = jnp.transpose(ys, (3, 1, 0, 2))                  # [P, Q, T, 2]
    return jnp.where(ok, ys, jnp.full_like(ys, jnp.inf))

#!/usr/bin/env python
"""Study d0: fit the candidate HH a-gate (p1-p4) to synthetic 3-state-Markov
data by CMA-ES on the whole concatenated Pr3+Pr5 current trace.

TPU-native rebuild of reference train-d0.py: the PINTS controller +
multiprocessing population becomes a host-side CMA-ES with a lockstep
batched-lane solve per sweep on device, and the SIGALRM/Myokit timeout
guards become inf sentinels from the solver (train-d0.py:304-318 ->
per-lane SolveStats.ok).

Reference semantics reproduced exactly (train-d0.py:460-505):
- the RECORDED Beattie cell-5 Pr3/Pr5 voltage files drive everything — here
  the sample-exact protorec reconstructions (pinned from the reference's
  own surface caches);
- ground-truth data: Markov GT solved per protocol from the rest state
  (state resets between Pr3 and Pr5, each protocol one continuous solve
  across its sweeps), plus the seed-0 numpy noise stream drawn at FULL
  0.1 ms resolution;
- the fit scores the [::10] subsample of the concatenated trace, with the
  candidate's state carried continuously across the Pr3->Pr5 boundary
  (timet = append(time1, ...), one odeint — train-d0.py:487-505).

The recorded-protocol lengths equal the reference CSVs' sample-for-sample,
so the noise stream aligns exactly; the only delta from the reference's
actual data is the ~1e-4 protocol-reconstruction residual.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

parser = study_parser("IKr syn. discrepancy fit with HH candidate (d0).")
parser.add_argument("--myokit", action="store_true",
                    help="route the CMA-ES objective through the native C++ "
                         "host solver (ionflux.native.csolve) — the rebuild "
                         "of the reference's Myokit/CVODE fast path "
                         "(train-d0.py:128-297); per-member serial like the "
                         "reference, so slower than the batched TPU path")
parser.add_argument("--fused", action="store_true",
                    help="route the CMA-ES objective through the adaptive "
                         "HH-population Pallas kernel (one launch per sweep "
                         "in a lax.scan, per-lane y0 carry) — generation "
                         "cost independent of population size up to 128 "
                         "lanes; TPU only")
parser.add_argument("--analytic", action="store_true",
                    help="route the CMA-ES objective through the EXACT "
                         "piecewise-constant propagator (solver/analytic.py)"
                         " — the HH candidate is linear within each "
                         "constant-voltage segment of the recorded step "
                         "protocols, so no ODE solve happens at all; "
                         "fastest and most accurate path, any backend")
parser.add_argument("--onchip", action="store_true",
                    help="run the ENTIRE CMA-ES fit device-resident "
                         "(fit.cmaes.cmaes_onchip: jitted lax.scan chunks, "
                         "lookahead dispatch)"
                         " over the --analytic (default) or --fused objective — zero host round "
                         "trips between generations (the remote tunnel's "
                         "~25 ms dispatch RTT otherwise dominates a "
                         "converged fit)")
args = parser.parse_args()
OUT = setup(args, "d0")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ionflux import protocols as P  # noqa: E402
from ionflux import protorec  # noqa: E402
from ionflux.fit.cmaes import cmaes, cmaes_onchip  # noqa: E402
from ionflux.models import markov_rhs, MARKOV_Y0_REST  # noqa: E402
from ionflux.models.registry import (  # noqa: E402
    HH_B06,
    MARKOV_B06,
    SYNTHETIC,
)
from ionflux.observe import NOISE_SIGMA  # noqa: E402
from ionflux.solver import odeint_batched, odeint_chained  # noqa: E402

# CMA-ES initial guess = B06 HH a-gate (train-d0.py:32-38)
P0 = np.array([float(HH_B06.p1), float(HH_B06.p2),
               float(HH_B06.p3), float(HH_B06.p4)])
RGATE = (MARKOV_B06.p5, MARKOV_B06.p6, MARKOV_B06.p7, MARKOV_B06.p8)
SUB = 10  # data subsample [::10] (train-d0.py:504-505)


def _sweep_protos(name: str):
    """Per-sweep recorded protocols with a 1-sample overlap into the next
    sweep (as eval.solve_states_long), plus the full 0.1 ms output grid.
    The [::10] score lattice is applied on the FLAT per-protocol axis
    (Pr5's sweep period is not a multiple of 10, so the lattice phase
    shifts across sweeps — exactly as the reference's global subsample)."""
    n_sweeps, period = protorec.SWEEPS[name]
    v, dt = protorec.load_voltage(name)
    vs = np.empty((n_sweeps, period + 1), v.dtype)
    vs[:, :period] = v.reshape(n_sweeps, period)
    vs[:-1, period] = vs[1:, 0]
    vs[-1, period] = vs[-1, period - 1]
    protos = P.stack([
        P.Protocol(jnp.asarray(0.0, jnp.float32),
                   jnp.asarray(dt, jnp.float32),
                   jnp.asarray(row, jnp.float32)) for row in vs])
    ts = jnp.arange(period + 1, dtype=jnp.float32) * jnp.float32(dt)
    return protos, ts, n_sweeps, period


def _rhs_markov(t, y, a):
    params, proto = a
    return markov_rhs(params, t, y, P.voltage(proto, t))


def generate_data():
    """Markov ground truth on the recorded protocols (per-protocol solve
    from rest, continuous across sweeps) + the full-resolution seed-0 noise
    stream, subsampled [::10].  Returns (d3 [7, T3], d5 [9, T5])."""
    cache = os.path.join(OUT, "data.npz")
    if args.cached and os.path.exists(cache):
        d = np.load(cache)
        return d["d3"], d["d5"]
    parts = []
    for name in ("pr3-cell5", "pr5-cell5"):
        protos, ts, n_sweeps, period = _sweep_protos(name)
        y0 = jnp.asarray(MARKOV_Y0_REST, jnp.float32)
        ys = odeint_chained(_rhs_markov, y0, ts, protos, MARKOV_B06,
                            buffer_size=16384, max_steps=200_000)
        v = jax.vmap(lambda pr: P.voltage(pr, ts))(protos)
        i = np.asarray(ys[:, :-1, -1] * (v[:, :-1] - SYNTHETIC.e),
                       np.float64).reshape(-1)           # flat [N]
        parts.append(i)
    # the reference draws noise over the FULL-resolution concatenated trace
    # then subsamples [::10] (train-d0.py:487-505); the global lattice
    # splits per protocol because len(pr3) is a multiple of 10
    rs = np.random.RandomState(0)
    noise = rs.normal(0.0, NOISE_SIGMA, sum(p.size for p in parts))
    n3 = parts[0].size
    assert n3 % SUB == 0
    d3 = (parts[0] + noise[:n3])[::SUB]
    d5 = (parts[1] + noise[n3:])[::SUB]
    np.savez(cache, d3=d3, d5=d5)
    return d3, d5


def _rhs_hh_pop(t, y, args):
    """Population-batched candidate HH: per-lane p1-p4 (y [POP, 2])."""
    ps, proto = args
    v = P.voltage(proto, t)
    k1 = ps[:, 0] * jnp.exp(ps[:, 1] * v)
    k2 = ps[:, 2] * jnp.exp(-ps[:, 3] * v)
    k3 = RGATE[0] * jnp.exp(RGATE[1] * v)
    k4 = RGATE[2] * jnp.exp(-RGATE[3] * v)
    dadt = k1 * (1.0 - y[:, 0]) - k2 * y[:, 0]
    drdt = -k3 * y[:, 1] + k4 * (1.0 - y[:, 1])
    return jnp.stack([dadt, drdt], axis=-1)


def make_objective(d3: np.ndarray, d5: np.ndarray, pop: int):
    """Whole-population whole-trace SSE on the [::10] lattice: per sweep ONE
    adaptive batched-lane solve (solver/batched.py), state chained across
    sweeps AND across the Pr3->Pr5 boundary (the reference integrates the
    concatenation as a single trace, train-d0.py:487-505)."""
    blocks = []
    for name, d in (("pr3-cell5", d3), ("pr5-cell5", d5)):
        protos, ts, n_sweeps, period = _sweep_protos(name)
        v = jax.vmap(lambda pr: P.voltage(pr, ts))(protos)
        blocks.append((protos, ts, n_sweeps, period,
                       jnp.asarray(v[:, :-1], jnp.float32),
                       jnp.asarray(d, jnp.float32)))

    def sse_pop(xs):
        y = jnp.tile(jnp.array([0.0, 1.0], jnp.float32), (pop, 1))
        acc = jnp.zeros((pop,), jnp.float32)
        for protos, ts, n_sweeps, period, v, d in blocks:
            def sweep(carry, inp, ts=ts):
                y, _ = carry
                proto_k, v_row = inp
                ys = odeint_batched(_rhs_hh_pop, y, ts, (xs, proto_k),
                                    rtol=1e-5, atol=1e-7, buffer_size=8192,
                                    max_steps=200_000)
                i_sim = (ys[:, :-1, 0] * ys[:, :-1, 1]
                         * (v_row[None] - SYNTHETIC.e))
                return (ys[:, -1, :], 0.0), i_sim

            (y, _), i_all = jax.lax.scan(sweep, (y, 0.0), (protos, v))
            # [n_sweeps, pop, period] -> flat [pop, N] -> global [::10]
            i_flat = jnp.moveaxis(i_all, 1, 0).reshape(
                pop, n_sweeps * period)[:, ::SUB]
            acc = acc + jnp.sum((i_flat - d[None]) ** 2, axis=1)
        return jnp.where(jnp.isfinite(acc), acc, jnp.inf)

    batched = jax.jit(sse_pop)

    def objective(xs: np.ndarray) -> np.ndarray:
        n = xs.shape[0]
        if n < pop:  # pad to the compiled population width
            xs = np.concatenate([xs, np.repeat(xs[-1:], pop - n, axis=0)])
        return np.asarray(batched(jnp.asarray(xs, jnp.float32)),
                          np.float64)[:n]

    return objective


def _lattice_decomposition(n_sweeps: int, period: int):
    """Per-sweep view of the global [::SUB] lattice on the flat
    per-protocol axis (the reference subsamples the CONCATENATED trace,
    train-d0.py:504-505, so when period % SUB != 0 the lattice phase
    shifts across sweeps — Pr5).  Returns (idx [n_sweeps, n_lat] local
    sample indices padded with repeats, mask [n_sweeps, n_lat] validity,
    counts [n_sweeps])."""
    n_lat = -(-period // SUB)
    idx = np.zeros((n_sweeps, n_lat), np.int64)
    msk = np.zeros((n_sweeps, n_lat), bool)
    counts = []
    for k in range(n_sweeps):
        j0 = (-k * period) % SUB
        jj = np.arange(j0, period, SUB)
        idx[k, :jj.size] = jj
        idx[k, jj.size:] = jj[-1] if jj.size else 0
        msk[k, :jj.size] = True
        counts.append(jj.size)
    assert sum(counts) == len(range(0, n_sweeps * period, SUB))
    return idx, msk, np.asarray(counts)


def make_objective_fused(d3: np.ndarray, d5: np.ndarray, pop: int,
                         trips: int = 2048):
    """--fused path: the same whole-trace SSE objective through the
    adaptive HH-population Pallas kernel (ops/pallas_solve.
    fused_hh_pop_solve_ft) — one launch per sweep inside a lax.scan,
    per-lane y0 carry across sweeps and across the Pr3->Pr5 boundary.
    Chip-measured: ~2,700 sweep-solves/s at 128 lanes vs ~1,800 for the
    lockstep (and generation cost is independent of the CMA-ES
    population size up to 128).  A stiff candidate is pace-culled and
    scores inf alone (the lockstep path infs it via max_steps)."""
    from ionflux.ops.pallas_solve import fused_hh_pop_solve_ft

    blocks = []
    for name, d in (("pr3-cell5", d3), ("pr5-cell5", d5)):
        protos, ts, n_sweeps, period = _sweep_protos(name)
        dt = float(protos.dt[0])
        idx, msk, counts = _lattice_decomposition(n_sweeps, period)
        splits = np.cumsum(counts)[:-1]
        d_rows = np.zeros(idx.shape, np.float32)
        for k, chunk in enumerate(np.split(np.asarray(d), splits)):
            d_rows[k, :chunk.size] = chunk
        v_rows = np.take_along_axis(np.asarray(protos.v), idx, axis=1)
        ts_lat = idx.astype(np.float32) * dt
        ts_aug = np.concatenate(
            [ts_lat, np.full((n_sweeps, 1), period * dt, np.float32)],
            axis=1)
        blocks.append((jnp.asarray(np.asarray(protos.v), jnp.float32),
                       jnp.asarray(ts_aug),
                       jnp.asarray(v_rows, jnp.float32),
                       jnp.asarray(d_rows),
                       jnp.asarray(msk),
                       dt, float(period * dt)))

    rg = jnp.asarray([float(x) for x in RGATE], jnp.float32)

    def sse_pop(xs):
        p8 = jnp.concatenate(
            [xs, jnp.broadcast_to(rg[None], (pop, 4))], axis=1)
        y = jnp.tile(jnp.array([0.0, 1.0], jnp.float32), (pop, 1))
        acc = jnp.zeros((pop,), jnp.float32)
        for seg_v, ts_aug, v_rows, d_rows, msk, dt, t_endf in blocks:
            def sweep(carry, inp, dt=dt, t_endf=t_endf):
                y, acc = carry
                v_k, ts_k, vl_k, d_k, m_k = inp
                ys = fused_hh_pop_solve_ft(
                    p8, v_k, ts_k, proto_dt=dt, t_end=t_endf,
                    trips=trips, y0=y)
                i_sim = (ys[:, :-1, 0] * ys[:, :-1, 1]
                         * (vl_k[None] - SYNTHETIC.e))
                acc = acc + jnp.sum(
                    jnp.where(m_k[None], (i_sim - d_k[None]) ** 2, 0.0),
                    axis=1)
                return (ys[:, -1, :], acc), 0.0
            (y, acc), _ = jax.lax.scan(
                sweep, (y, acc), (seg_v, ts_aug, v_rows, d_rows, msk))
        return jnp.where(jnp.isfinite(acc), acc, jnp.inf)

    batched = jax.jit(sse_pop)

    def objective(xs: np.ndarray) -> np.ndarray:
        n = xs.shape[0]
        if n < pop:
            xs = np.concatenate([xs, np.repeat(xs[-1:], pop - n, axis=0)])
        return np.asarray(batched(jnp.asarray(xs, jnp.float32)),
                          np.float64)[:n]

    objective.device_fn = sse_pop  # jittable [pop, 4] -> [pop] (--onchip)
    return objective


def make_objective_analytic(d3: np.ndarray, d5: np.ndarray, pop: int,
                            ramp_subdiv: int = 4):
    """--analytic path: the same whole-trace SSE objective through the
    EXACT piecewise-constant propagator (ionflux.solver.analytic) — the HH
    candidate is linear within each constant-voltage segment of the
    recorded Pr3/Pr5 step protocols (~13 segments per sweep), so each
    sweep is a tiny associative scan over per-SEGMENT closed-form affine
    gate maps plus one direct ``expm1`` per knot
    (``hh_solve_analytic_seg``) instead of an adaptive ODE solve — no
    lattice-wide scan at all.  No tolerance, no trip budget, no solver
    failure mode: gates stay in [0, 1] by construction, and the only
    non-finite escape is a wild candidate overflowing the f32 rate
    ``p1 e^{p2 V}`` itself (caught by the isfinite -> inf sentinel, the
    same semantics as the solver paths).  State is carried across sweeps
    and across the Pr3->Pr5 boundary exactly like the reference's single
    concatenated odeint (train-d0.py:487-505)."""
    from ionflux.solver.analytic import hh_segments, hh_solve_analytic_seg

    blocks = []
    for name, d in (("pr3-cell5", d3), ("pr5-cell5", d5)):
        protos, _ts, n_sweeps, period = _sweep_protos(name)
        v_np = np.asarray(protos.v)
        blocks.append((jnp.asarray(v_np, jnp.float32),
                       float(protos.dt[0]),
                       jnp.asarray(d, jnp.float32), n_sweeps, period,
                       hh_segments(v_np)))

    rg = jnp.asarray([float(x) for x in RGATE], jnp.float32)

    def sse_pop(xs):
        p8 = jnp.concatenate(
            [xs, jnp.broadcast_to(rg[None], (pop, 4))], axis=1)
        y = jnp.tile(jnp.array([0.0, 1.0], jnp.float32), (pop, 1))
        acc = jnp.zeros((pop,), jnp.float32)
        for vs, dt, d, n_sweeps, period, seg in blocks:
            def sweep(y, v_row, dt=dt, seg=seg):
                ys = hh_solve_analytic_seg(p8, v_row, dt, y0=y, seg=seg,
                                           ramp_subdiv=ramp_subdiv)
                i_sim = (ys[:, :-1, 0] * ys[:, :-1, 1]
                         * (v_row[None, :-1] - SYNTHETIC.e))
                return ys[:, -1, :], i_sim

            y, i_all = jax.lax.scan(sweep, y, vs)
            i_flat = jnp.moveaxis(i_all, 1, 0).reshape(
                pop, n_sweeps * period)[:, ::SUB]
            acc = acc + jnp.sum((i_flat - d[None]) ** 2, axis=1)
        return jnp.where(jnp.isfinite(acc), acc, jnp.inf)

    batched = jax.jit(sse_pop)

    def objective(xs: np.ndarray) -> np.ndarray:
        n = xs.shape[0]
        if n < pop:
            xs = np.concatenate([xs, np.repeat(xs[-1:], pop - n, axis=0)])
        return np.asarray(batched(jnp.asarray(xs, jnp.float32)),
                          np.float64)[:n]

    objective.device_fn = sse_pop  # jittable [pop, 4] -> [pop] (--onchip)
    return objective


def make_objective_native(d3: np.ndarray, d5: np.ndarray):
    """--myokit path: the same whole-trace SSE objective evaluated through
    the native C++ host solver (ionflux.native.csolve — the rebuild of the
    reference's Myokit/CVODE backend, train-d0.py:128-297, incl. its
    watchdog -> inf-sentinel semantics).  Per-member serial, exactly like
    the reference's per-call CVODE simulate (train-d0.py:266-297)."""
    from ionflux.native import csolve

    blocks = []
    for name, d in (("pr3-cell5", d3), ("pr5-cell5", d5)):
        _protos, _ts, n_sweeps, period = _sweep_protos(name)
        v, dt = protorec.load_voltage(name)
        vs = np.empty((n_sweeps, period + 1), np.float64)
        vs[:, :period] = v.reshape(n_sweeps, period)
        vs[:-1, period] = vs[1:, 0]
        vs[-1, period] = vs[-1, period - 1]
        ts = np.arange(period + 1, dtype=np.float64) * float(dt)
        blocks.append((vs, ts, float(dt), np.asarray(d, np.float64)))

    e_rev = float(SYNTHETIC.e)

    def one(x: np.ndarray) -> float:
        params = np.concatenate([x, np.asarray(RGATE, np.float64)])
        acc = 0.0
        for vs, ts, dt, d in blocks:
            y0 = np.array([0.0, 1.0])
            rows = []
            for k in range(vs.shape[0]):
                ys = csolve("hh", params, 0.0, dt, vs[k], ts, y0=y0,
                            rtol=1e-5, atol=1e-7, timeout_s=60.0)
                if not np.all(np.isfinite(ys)):
                    return float("inf")
                rows.append(ys[:-1, 0] * ys[:-1, 1] * (vs[k][:-1] - e_rev))
                y0 = ys[-1]
            i_flat = np.concatenate(rows)[::SUB]
            acc += float(np.sum((i_flat - d) ** 2))
        return acc

    def objective(xs: np.ndarray) -> np.ndarray:
        return np.array([one(x) for x in np.asarray(xs, np.float64)])

    return objective


def main():
    d3, d5 = generate_data()

    pop = 4 + int(3 * np.log(len(P0)))  # CMA-ES default population
    if args.myokit:
        print("--myokit: objective through the native C++ host solver")
        objective = make_objective_native(d3, d5)
    elif args.fused:
        print("--fused: objective through the adaptive HH-population "
              "Pallas kernel")
        objective = make_objective_fused(d3, d5, pop)
    elif args.analytic or args.onchip:
        print("--analytic: objective through the exact piecewise-constant "
              "propagator (no ODE solve)")
        objective = make_objective_analytic(d3, d5, pop)
    else:
        objective = make_objective(d3, d5, pop)
    f0 = objective(P0[None])[0]
    print("Initial guess error:", f0)

    if args.debug:
        return

    if args.onchip:
        print("--onchip: device-resident CMA-ES (jitted scan chunks, "
              "lookahead dispatch — no per-generation host sync)")
        import time as _time
        t0 = _time.perf_counter()
        res = cmaes_onchip(
            objective.device_fn, P0, sigma0=P0 * 0.1,
            bounds=(P0 * 0.1, P0 * 10.0),
            max_unchanged_iterations=100, unchanged_threshold=1e-3,
        )
        print(f"on-chip fit wall time {_time.perf_counter() - t0:.2f} s "
              "(incl. compile)")
    else:
        res = cmaes(
            objective, P0, sigma0=P0 * 0.1, bounds=(P0 * 0.1, P0 * 10.0),
            max_unchanged_iterations=100, unchanged_threshold=1e-3,
            verbose=True,
        )
    print(f"CMA-ES done: {res.iterations} iters, {res.evaluations} evals, "
          f"best SSE {res.fx:.6f}")
    print("found parameters:", res.x)
    with open(os.path.join(OUT, "model-parameters.txt"), "w") as fh:
        for v in res.x:
            fh.write(f"{v:.18e}\n")
    ref = np.array([5.694588454735844622e-05, 1.172955815858964107e-01,
                    3.522672347205991382e-05, 4.972513487995382231e-02])
    print("reference d0 fit:   ", ref)
    print("ratio found/ref:    ", res.x / ref)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Study d0: fit the candidate HH a-gate (p1-p4) to synthetic 3-state-Markov
data by CMA-ES on the whole concatenated Pr3+Pr5 current trace.

TPU-native rebuild of reference train-d0.py: the PINTS controller +
multiprocessing population becomes a host-side CMA-ES with a vmapped jitted
batch of whole-trace solves on device; the 146 s concatenated recording is
integrated as a lax.scan chain of per-sweep solves on local time axes
(solver/chained.py), and the SIGALRM/Myokit timeout guards become inf
sentinels from the solver (train-d0.py:304-318 -> SolveStats.ok).

Data caveat (SURVEY.md §1.1): the reference drives this with the *recorded*
Beattie cell-5 Pr3/Pr5 voltage files (data/pr3-...csv), absent from the
mount; we degrade to the programmatic Pr3/Pr5 step templates, so the fitted
parameters approximate (not bit-match) d0/model-parameters.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

parser = study_parser("IKr syn. discrepancy fit with HH candidate (d0).")
parser.add_argument("--myokit", action="store_true",
                    help="accepted for reference-CLI parity; the jitted TPU "
                         "solver IS the fast path here")
args = parser.parse_args()
OUT = setup(args, "d0")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ionflux import protocols as P  # noqa: E402
from ionflux.fit.cmaes import cmaes  # noqa: E402
from ionflux.models import hh_rhs, markov_rhs, MARKOV_Y0_REST  # noqa: E402
from ionflux.models.registry import (  # noqa: E402
    HH_B06,
    MARKOV_B06,
    SYNTHETIC,
)
from ionflux.observe import NOISE_SIGMA  # noqa: E402
from ionflux.solver import odeint_chained  # noqa: E402

# CMA-ES initial guess = B06 HH a-gate (train-d0.py:32-38)
P0 = np.array([float(HH_B06.p1), float(HH_B06.p2),
               float(HH_B06.p3), float(HH_B06.p4)])
RGATE = (MARKOV_B06.p5, MARKOV_B06.p6, MARKOV_B06.p7, MARKOV_B06.p8)

ACT = P.stack(P.activation_family())       # [7, 80001] sweeps, 8 s each
DEACT = P.stack(P.deactivation_family())   # [9, 100001] sweeps, 10 s each
SUB = 10                                   # data subsample (train-d0.py:504-505)
# per-sweep local output grids = every 10th 0.1 ms sample -> 1 ms
TS3 = jnp.linspace(0.0, 8000.0, 8001, dtype=jnp.float32)[:-1]
TS5 = jnp.linspace(0.0, 10000.0, 10001, dtype=jnp.float32)[:-1]


def _rhs_markov(t, y, a):
    params, proto = a
    return markov_rhs(params, t, y, P.voltage(proto, t))


def _rhs_hh(t, y, a):
    params, proto = a
    return hh_rhs(params, t, y, P.voltage(proto, t))


def _observe(ys, protos, ts):
    v = jax.vmap(lambda pr: P.voltage(pr, ts))(protos)
    return ys[..., -1] * (v - SYNTHETIC.e)


def generate_data():
    """Markov ground truth chained across sweeps within each protocol block
    (state reset between Pr3 and Pr5 blocks, as the reference) + seed-0
    noise. Returns (i3 [7,T3], i5 [9,T5]) noisy currents."""
    cache = os.path.join(OUT, "data.npz")
    if args.cached and os.path.exists(cache):
        d = np.load(cache)
        return d["i3"], d["i5"]
    y0 = jnp.asarray(MARKOV_Y0_REST, jnp.float32)
    ys3 = odeint_chained(_rhs_markov, y0, TS3, ACT, MARKOV_B06)
    ys5 = odeint_chained(_rhs_markov, y0, TS5, DEACT, MARKOV_B06)
    v3 = jax.vmap(lambda pr: P.voltage(pr, TS3))(ACT)
    v5 = jax.vmap(lambda pr: P.voltage(pr, TS5))(DEACT)
    i3 = np.asarray(ys3[..., -1] * (v3 - SYNTHETIC.e), np.float64)
    i5 = np.asarray(ys5[..., -1] * (v5 - SYNTHETIC.e), np.float64)
    rs = np.random.RandomState(0)
    flat = np.concatenate([i3.reshape(-1), i5.reshape(-1)])
    flat += rs.normal(0.0, NOISE_SIGMA, flat.shape)
    i3 = flat[: i3.size].reshape(i3.shape)
    i5 = flat[i3.size:].reshape(i5.shape)
    np.savez(cache, i3=i3, i5=i5)
    return i3, i5


def _rhs_hh_pop(t, y, args):
    """Population-batched HH RHS: per-lane p1-p4 (y [POP, 2])."""
    ps, proto = args
    v = P.voltage(proto, t)
    k1 = ps[:, 0] * jnp.exp(ps[:, 1] * v)
    k2 = ps[:, 2] * jnp.exp(-ps[:, 3] * v)
    k3 = RGATE[0] * jnp.exp(RGATE[1] * v)
    k4 = RGATE[2] * jnp.exp(-RGATE[3] * v)
    dadt = k1 * (1.0 - y[:, 0]) - k2 * y[:, 0]
    drdt = -k3 * y[:, 1] + k4 * (1.0 - y[:, 1])
    return jnp.stack([dadt, drdt], axis=-1)


def make_objective(d3: jnp.ndarray, d5: jnp.ndarray, pop: int):
    """Whole-population whole-trace SSE: per sweep ONE batched-lane solve
    (solver/batched.py — in-place dense buffers, no per-lane scatters),
    chained across the 16 sweeps like the reference's continuous trace
    (train-d0.py:489-502)."""
    from ionflux.solver import odeint_batched

    v3 = jax.vmap(lambda pr: P.voltage(pr, TS3))(ACT)
    v5 = jax.vmap(lambda pr: P.voltage(pr, TS5))(DEACT)

    def sse_pop(xs):
        y = jnp.tile(jnp.array([0.0, 1.0], jnp.float32), (pop, 1))

        def sweep(carry, inp):
            y, acc = carry
            proto, v_row, d_row, ts = inp
            ys = odeint_batched(_rhs_hh_pop, y, ts, (xs, proto),
                                rtol=1e-5, atol=1e-7, buffer_size=4096)
            i_sim = ys[:, :, 0] * ys[:, :, 1] * (v_row[None] - SYNTHETIC.e)
            acc = acc + jnp.sum((i_sim - d_row[None]) ** 2, axis=1)
            return (ys[:, -1, :], acc), None

        acc = jnp.zeros((pop,), jnp.float32)
        for k in range(ACT.v.shape[0]):
            (y, acc), _ = sweep((y, acc),
                                (jax.tree.map(lambda a: a[k], ACT), v3[k],
                                 d3[k], TS3))
        for k in range(DEACT.v.shape[0]):
            (y, acc), _ = sweep((y, acc),
                                (jax.tree.map(lambda a: a[k], DEACT), v5[k],
                                 d5[k], TS5))
        return jnp.where(jnp.isfinite(acc), acc, jnp.inf)

    batched = jax.jit(sse_pop)

    def objective(xs: np.ndarray) -> np.ndarray:
        n = xs.shape[0]
        if n < pop:  # pad to the compiled population width
            xs = np.concatenate([xs, np.repeat(xs[-1:], pop - n, axis=0)])
        return np.asarray(batched(jnp.asarray(xs, jnp.float32)),
                          np.float64)[:n]

    return objective


def main():
    i3, i5 = generate_data()
    d3 = jnp.asarray(i3, jnp.float32)
    d5 = jnp.asarray(i5, jnp.float32)

    pop = 4 + int(3 * np.log(len(P0)))  # CMA-ES default population
    objective = make_objective(d3, d5, pop)
    f0 = objective(P0[None])[0]
    print("Initial guess error:", f0)

    if args.debug:
        return

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
    ref = [5.694588454735844622e-05, 1.172955815858964107e-01,
           3.522672347205991382e-05, 4.972513487995382231e-02]
    print("reference d0 fit:   ", np.array(ref))


if __name__ == "__main__":
    main()

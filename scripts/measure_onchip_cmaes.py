#!/usr/bin/env python
"""Chip-measure the host-loop vs device-resident CMA-ES fit wall time.

The --onchip rationale (fit.cmaes.cmaes_onchip docstring) is that the
remote tunnel's ~25 ms dispatch RTT per generation dominates a converged
analytic-objective fit.  This probe runs BOTH complete fits on the real
device — the host ask/tell loop over the jitted analytic objective, and
the device-resident scan-chunk loop — and prints one JSON line each with
wall time, iterations, final SSE, and parameter distance to the
reference optimum, warm (compile excluded via a throwaway short run).

Covers both whole-trace CMA-ES studies: --study d0 (synthetic
staircase+activation sweeps, train-d0.py) and --study r0bad (recovered
real Pr3+Pr4 masked-lattice measurements, train-r0-bad.py; the reference
parameter distance is informational only — our recoverable objective's
optimum beats the archived fit, ROADMAP round 3).

--objective fused measures the same pair over the adaptive HH-population
Pallas kernel objective (make_objective_fused / fused_hh_pop_solve_ft) —
the path that generalizes beyond piecewise-constant protocols (VERDICT r4
next #8).

Usage: python scripts/measure_onchip_cmaes.py [--study d0|r0bad]
       [--objective analytic|fused] [--platform cpu]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

ap = argparse.ArgumentParser()
ap.add_argument("--platform", default=None)
ap.add_argument("--study", default="d0", choices=("d0", "r0bad"))
ap.add_argument("--objective", default="analytic",
                choices=("analytic", "fused"))
opts = ap.parse_args()

TRAINER = {"d0": "train_d0.py", "r0bad": "train_r0_bad.py"}[opts.study]
sys.argv = [TRAINER, "--cached"] + (
    ["--platform", opts.platform] if opts.platform else [])
spec = importlib.util.spec_from_file_location(
    "trainer_mod", os.path.join(HERE, TRAINER))
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

import numpy as np  # noqa: E402

from ionflux.fit.cmaes import cmaes, cmaes_onchip  # noqa: E402

REF = np.loadtxt({
    "d0": "/root/reference/d0/model-parameters.txt",
    "r0bad": "/root/reference/r0-bad/model-parameters.txt",
}[opts.study])


def report(name, res, wall, extra=None):
    rec = {
        "study": opts.study,
        "objective": opts.objective,
        "path": name,
        "wall_seconds": round(wall, 2),
        "iterations": res.iterations,
        "evaluations": res.evaluations,
        "best_sse": round(float(res.fx), 2),
        "max_pct_per_param_vs_reference":
            round(float(np.abs(res.x / REF - 1).max() * 100), 3),
    }
    rec.update(extra or {})
    print(json.dumps(rec), flush=True)


def make_objective():
    """Build the --analytic or --fused objective exactly as the trainer's
    main() does (train_d0.py / train_r0_bad.py objective branches)."""
    maker = {"analytic": mod.make_objective_analytic,
             "fused": mod.make_objective_fused}[opts.objective]
    if opts.study == "d0":
        d3, d5 = mod.generate_data()
        return maker(d3, d5, 8)
    meas = mod.recover_measurements(
        f"{mod.REFDIR}/r1-bad", mod.CELL5_R1BAD, mod.HH_R1BAD_INIT,
        protocols=("pr3", "pr4"), n_points=30)
    pop = 4 + int(3 * np.log(len(mod.P0)))
    return maker(meas, pop)


def main():
    import jax
    obj = make_objective()
    backend = jax.devices()[0].platform
    kw = dict(sigma0=mod.P0 * 0.1, bounds=(mod.P0 * 0.1, mod.P0 * 10.0),
              max_unchanged_iterations=100, unchanged_threshold=1e-3)

    # warm both compile paths with tiny runs so the timed fits are warm
    cmaes_onchip(obj.device_fn, mod.P0, max_iterations=2, **kw)
    cmaes(obj, mod.P0, max_iterations=2, **kw)

    t0 = time.perf_counter()
    res = cmaes(obj, mod.P0, **kw)
    wall_host = time.perf_counter() - t0
    report("host-loop", res, wall_host, {"backend": backend})

    t0 = time.perf_counter()
    res = cmaes_onchip(obj.device_fn, mod.P0, **kw)
    wall_chip = time.perf_counter() - t0
    report("onchip", res, wall_chip, {
        "backend": backend,
        "ms_per_generation": round(1e3 * wall_chip / max(res.iterations, 1),
                                   2),
        "host_over_onchip": round(wall_host / wall_chip, 2),
    })


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Chip-measure the host-loop vs device-resident CMA-ES fit wall time.

The --onchip rationale (fit.cmaes.cmaes_onchip docstring) is that the
remote tunnel's ~25 ms dispatch RTT per generation dominates a converged
analytic-objective d0 fit.  This probe runs BOTH complete fits on the
real device — the host ask/tell loop over the jitted analytic objective,
and the single-launch lax.while_loop — and prints one JSON line each
with wall time, iterations, final SSE, and parameter distance to the
reference optimum, warm (compile excluded via a throwaway short run).

Usage: python scripts/measure_onchip_cmaes.py [--platform cpu]
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
opts = ap.parse_args()

sys.argv = ["train_d0.py", "--cached"] + (
    ["--platform", opts.platform] if opts.platform else [])
spec = importlib.util.spec_from_file_location(
    "train_d0_mod", os.path.join(HERE, "train_d0.py"))
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

import numpy as np  # noqa: E402

from ionflux.fit.cmaes import cmaes, cmaes_onchip  # noqa: E402

REF = np.loadtxt("/root/reference/d0/model-parameters.txt")


def report(name, res, wall, extra=None):
    rec = {
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


def main():
    import jax
    d3, d5 = mod.generate_data()
    obj = mod.make_objective_analytic(d3, d5, pop=8)
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

#!/usr/bin/env python
"""Chip-measure the three batched d0 CMA-ES objective paths head-to-head.

Round-4 follow-up: ROADMAP records the --fused kernel at ~0.07 s/generation
and notes the --analytic propagator's win "is the TPU shape" — but the
analytic path was only ever timed on the 1-core CPU host (where the
adaptive lockstep's ~1,800-step striding beats touching all 82k lattice
points).  This probe times all three on the real device, at the CMA-ES
population (8) and at larger populations, with value-fetch syncing (the
axon backend's block_until_ready is unreliable on multi-output jits —
CLAUDE.md), and prints one JSON line per (path, pop).

Usage:  python scripts/measure_d0_objectives.py [--reps 5] [--pops 8,64,128]
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
ap.add_argument("--reps", type=int, default=5)
ap.add_argument("--pops", default="8,64,128")
ap.add_argument("--paths", default="default,fused,analytic")
ap.add_argument("--platform", default=None)
opts = ap.parse_args()

# import train_d0 as a module with benign CLI args (it parses at import)
sys.argv = ["train_d0.py", "--cached"] + (
    ["--platform", opts.platform] if opts.platform else [])
spec = importlib.util.spec_from_file_location(
    "train_d0_mod", os.path.join(HERE, "train_d0.py"))
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

import numpy as np  # noqa: E402

rng = np.random.default_rng(0)


def population(pop: int) -> np.ndarray:
    """A realistic CMA-ES generation: P0 log-jittered ~sigma0."""
    return mod.P0[None] * np.exp(
        rng.normal(0.0, 0.1, size=(pop, mod.P0.size)))


def time_objective(make, d3, d5, pop: int, reps: int):
    obj = make(d3, d5, pop)
    xs = population(pop)
    f = obj(xs)  # compile + warm; the np.asarray return IS the sync
    assert np.all(np.isfinite(f)), f
    times = []
    for _ in range(reps):
        xs = population(pop)
        t0 = time.perf_counter()
        obj(xs)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), sorted(times)


def main():
    d3, d5 = mod.generate_data()
    pops = [int(x) for x in opts.pops.split(",")]
    makers = {
        "default": mod.make_objective,
        "fused": mod.make_objective_fused,
        "analytic": mod.make_objective_analytic,
    }
    import jax
    backend = jax.devices()[0].platform
    for name in opts.paths.split(","):
        for pop in pops:
            med, raw = time_objective(makers[name], d3, d5, pop, opts.reps)
            print(json.dumps({
                "path": name, "pop": pop, "backend": backend,
                "gen_seconds_median": round(med, 5),
                "solves_per_sec": round(pop * 16 / med, 1),  # 7+9 sweeps
                "rep_seconds": [round(t, 5) for t in raw],
            }), flush=True)


if __name__ == "__main__":
    main()

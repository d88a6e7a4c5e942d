#!/usr/bin/env python
"""Chip-measure the 64-member checkpoint-validation chain, old vs new.

VERDICT r4 next #2: the chained validation replay (5 real cell-5
protocols x 64 candidate nets, the train-r1.py:928-959 selection
workload) took ~9.8 s wall for ~0.45 s of kernel compute — the wall was
the per-segment full-current download (~130 MB/segment over the remote
tunnel) plus its blocking sync.  eval.population_rollout_maes moves the
|pred - truth| reduction on device: one dispatch per segment, launches
pipelined by async dispatch, a [P, Q] fetch at the end.

This probe times both paths warm at the table_rollout_maes_pop
configuration (trips=8192, rtol=1e-6/atol=1e-8) and appends one JSON
line per path to out/d0-onchip/validation-chain.jsonl.

Usage:  python scripts/measure_validation_chain.py [--reps 3] [--members 64]
        [--skip-old] [--platform cpu --tiny]  (tiny = stand-in waveforms)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from datetime import datetime, timezone

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

sys.path.insert(0, HERE)
import common  # noqa: E402

ap = argparse.ArgumentParser()
ap.add_argument("--reps", type=int, default=3)
ap.add_argument("--members", type=int, default=64)
ap.add_argument("--trips", type=int, default=8192)
ap.add_argument("--skip-old", action="store_true",
                help="only measure the device-reduce path")
ap.add_argument("--tiny", action="store_true",
                help="stand-in waveforms + interpret mode (CPU smoke)")
ap.add_argument("--platform", default=None)
ap.add_argument("--outdir", default=None)
ap.add_argument("--x64", action="store_true")
opts = ap.parse_args()
outdir = common.setup(opts, "d0-onchip")

import jax  # noqa: E402
import numpy as np  # noqa: E402

from ionflux import protocols as P  # noqa: E402
from ionflux.eval import (population_rollout_maes,  # noqa: E402
                          simulate_population_real)
from ionflux.models import nnf_init  # noqa: E402
from ionflux.models.registry import HH_B06, TABLE1  # noqa: E402

NAMES = ["pr3-cell5", "pr5-cell5", "pr4-cell5", "sinewave-cell5",
         "aps-cell5"]

base = nnf_init(jax.random.PRNGKey(0), HH_B06)
keys = jax.random.split(jax.random.PRNGKey(1), opts.members)
pop = jax.vmap(
    lambda k: base._replace(net=jax.tree.map(
        lambda x: x * (1.0 + 0.01 * jax.random.normal(k, x.shape)),
        base.net)))(keys)

kw = dict(trips=opts.trips, rtol=1e-6, atol=1e-8)
if opts.tiny:
    pa = P.activation_protocol(20.0, dt_ms=1.0)
    NAMES = ["a", "b"]
    kw.update(seg_samples=2048, chunk=512, interpret=True,
              voltages={"a": (np.asarray(pa.v)[:6001], 1.0),
                        "b": (np.asarray(pa.v)[:3501], 1.0)})

from ionflux import protorec  # noqa: E402

lens = {n: (len(kw["voltages"][n][0]) if opts.tiny
            else len(protorec.load_voltage(n)[0])) for n in NAMES}
# timing-only truth: selection parity is covered by
# tests/test_pallas.py::test_population_rollout_maes_matches_host_reduction
truth = {n: np.zeros(ln, np.float64) for n, ln in lens.items()}


def run_new():
    return population_rollout_maes("nnf", pop, NAMES, TABLE1, truth, **kw)


def run_old():
    cur = simulate_population_real("nnf", pop, NAMES, TABLE1, **kw)
    return np.stack([np.mean(np.abs(cur[n] - truth[n][None]), axis=1)
                     for n in NAMES], axis=1)


def measure(label, fn, reps):
    t0 = time.perf_counter()
    first = fn()                       # np return IS the sync
    warm = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        times.append(time.perf_counter() - t0)
    rec = {
        "case": f"validation-chain-{label}",
        "members": opts.members, "protocols": len(NAMES),
        "trips": opts.trips, "tiny": bool(opts.tiny),
        "warm_first_s": round(warm, 3),
        "median_s": round(float(np.median(times)), 3),
        "rep_seconds": [round(t, 3) for t in times],
        "finite_frac": float(np.mean(np.isfinite(out))),
        "backend": jax.devices()[0].platform,
        "measured_at": datetime.now(timezone.utc).isoformat(
            timespec="seconds"),
    }
    print(json.dumps(rec))
    return rec, first


recs = []
rec_new, maes_new = measure("device-reduce", run_new, opts.reps)
recs.append(rec_new)
if not opts.skip_old:
    rec_old, maes_old = measure("full-download", run_old, opts.reps)
    recs.append(rec_old)
    ok = np.isfinite(maes_new) & np.isfinite(maes_old)
    rel = float(np.max(np.abs(maes_new[ok] - maes_old[ok])
                       / np.maximum(np.abs(maes_old[ok]), 1e-12)))
    rec_new["vs_old_max_rel"] = rel
    rec_new["speedup_vs_old"] = round(
        rec_old["median_s"] / rec_new["median_s"], 2)
    print(f"device-reduce vs full-download: {rec_new['speedup_vs_old']}x, "
          f"max rel MAE diff {rel:.2e}")

with open(os.path.join(outdir, "validation-chain.jsonl"), "a") as fh:
    for r in recs:
        fh.write(json.dumps(r) + "\n")

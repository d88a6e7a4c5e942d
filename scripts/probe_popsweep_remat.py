#!/usr/bin/env python
"""Chip-probe the record-remat popsweep kernel across the VMEM frontier.

VERDICT r4 next #3: the Q=64 blocker was ~73 MB of register-allocator
spill slots — the carried last-accepted RK state ([7, 2Q, 128] ks_la +
y_la and their per-trip whole-buffer selects) at 2Q=128 sublanes.  The
round-5 kernel records each trip's OWN attempt instead (dense eval's
searchsorted(side='right') always lands on an accepted slot), deleting
that carry entirely.  This probe measures the new kernel at the round-4
headline config and walks the frontier configs the old kernel could not
compile (Q=64, P=96/128), appending one JSON line per config to
out/d0-onchip/popsweep-remat.jsonl.

Each config is its own bounded subprocess: a config that still OOMs the
chip compiler must not kill the sweep.

Usage: python scripts/probe_popsweep_remat.py [--configs 64x32,64x64,...]
       [--trips 4096] [--reps 5] [--timeout 900]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from datetime import datetime, timezone

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OUT = os.path.join(REPO, "out", "d0-onchip", "popsweep-remat.jsonl")

ap = argparse.ArgumentParser()
ap.add_argument("--configs",
                default="64x32,64x32:bf16,64x64:bf16,64x64,96x32,128x32")
ap.add_argument("--trips", type=int, default=4096)
ap.add_argument("--reps", type=int, default=5)
ap.add_argument("--timeout", type=float, default=900.0)
ap.add_argument("--one", default=None,
                help="(internal) run ONE config in-process and print JSON")
opts = ap.parse_args()


def run_one(cfg: str, trips: int, reps: int) -> dict:
    parts = cfg.split(":")
    p_mem, q = (int(x) for x in parts[0].split("x"))
    mxu_bf16 = "bf16" in parts[1:]
    # :vNNN raises the kernel's scoped-VMEM cap (MB) — v5e has 128 MB;
    # the 64x64 f32 frontier config needs 105.05M vs the 100M default
    vmem_mb = 100
    q_split = 1
    for f in parts[1:]:
        if f.startswith("v") and f[1:].isdigit():
            vmem_mb = int(f[1:])
        # :sN chunks the trip body's stage chain over Q (two-pass
        # working-set split, pallas_solve q_split) — the round-5 answer
        # to the 64x64 scoped-VMEM OOM
        if f.startswith("s") and f[1:].isdigit():
            q_split = int(f[1:])

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    sys.path.insert(0, REPO)
    import bench
    from ionflux.models import nnf_init
    from ionflux.models.registry import HH_B06
    from ionflux.ops import pallas_solve

    pallas_solve.POPSWEEP_MAX_ROWS = max(
        pallas_solve.POPSWEEP_MAX_ROWS, q)

    protos_v = bench._popsweep_protocols(q)
    ts = jnp.linspace(0.0, 8000.0, bench.N_OUT, dtype=jnp.float32)
    base = nnf_init(jax.random.PRNGKey(0), HH_B06)
    keys = jax.random.split(jax.random.PRNGKey(1), p_mem)
    pop_net = jax.vmap(
        lambda k: jax.tree.map(
            lambda x: x * (1.0 + 0.01 * jax.random.normal(k, x.shape)),
            base.net)
    )(keys)

    fused = jax.jit(lambda ns: pallas_solve.fused_nnf_popsweep_solve_ft(
        [(w, bb) for w, bb in ns], HH_B06, protos_v, ts, proto_dt=0.1,
        trips=trips, t_end=8000.0, mxu_bf16=mxu_bf16,
        vmem_limit_mb=vmem_mb, q_split=q_split))
    t_w = time.perf_counter()
    ys = fused(pop_net)
    # value fetch IS the sync (axon block_until_ready is unreliable)
    corner = float(ys[0, 0, -1, 0])
    warm_s = time.perf_counter() - t_w
    finite = bool(jnp.all(jnp.isfinite(ys)))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        ys = fused(pop_net)
        corner = float(ys[0, 0, -1, 0])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    burst_k = 4
    t0 = time.perf_counter()
    for _ in range(burst_k):
        ys = fused(pop_net)
    corner = float(ys[0, 0, -1, 0])
    dt_burst = (time.perf_counter() - t0) / burst_k
    stats = jax.jit(lambda ns: pallas_solve.fused_nnf_popsweep_solve_ft(
        [(w, bb) for w, bb in ns], HH_B06, protos_v, ts, proto_dt=0.1,
        trips=trips, t_end=8000.0, mxu_bf16=mxu_bf16,
        vmem_limit_mb=vmem_mb, q_split=q_split,
        return_records=True).n_valid)
    n_trips = int(stats(pop_net))
    flops = (n_trips * bench.EVALS_PER_STEP * p_mem * q
             * bench.FLOPS_PER_EVAL_PER_LANE)
    return {
        "case": "popsweep-remat", "config": cfg,
        "members": p_mem, "protocols": q, "mxu_bf16": mxu_bf16,
        "vmem_limit_mb": vmem_mb, "q_split": q_split,
        "trips_budget": trips, "trips_executed": n_trips,
        "finite": finite, "warm_first_s": round(warm_s, 2),
        "median_s": round(dt, 4),
        "rep_seconds": [round(t, 4) for t in times],
        "solves_per_sec": round(p_mem * q / dt, 1),
        "pipelined_solves_per_sec": round(p_mem * q / dt_burst, 1),
        "us_per_trip": round(dt / max(n_trips, 1) * 1e6, 2),
        "mfu_bf16_peak": round(flops / dt / bench.PEAK_BF16_FLOPS, 5),
        "mfu_bf16_peak_pipelined": round(
            flops / dt_burst / bench.PEAK_BF16_FLOPS, 5),
        "corner_value": corner,
        "backend": jax.devices()[0].platform,
        "measured_at": datetime.now(timezone.utc).isoformat(
            timespec="seconds"),
    }


if opts.one:
    print(json.dumps(run_one(opts.one, opts.trips, opts.reps)), flush=True)
    sys.exit(0)

for cfg in opts.configs.split(","):
    print(f"=== {cfg} (timeout {opts.timeout:.0f}s) ===", flush=True)
    cmd = [sys.executable, os.path.abspath(__file__), "--one", cfg,
           "--trips", str(opts.trips), "--reps", str(opts.reps)]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=opts.timeout)
    except subprocess.TimeoutExpired:
        rec = {"case": "popsweep-remat", "config": cfg,
               "error": f"timed out after {opts.timeout:.0f}s",
               "measured_at": datetime.now(timezone.utc).isoformat(
                   timespec="seconds")}
        print(json.dumps(rec), flush=True)
        with open(OUT, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        continue
    if res.returncode != 0:
        tail = (res.stderr or "").strip().splitlines()[-8:]
        rec = {"case": "popsweep-remat", "config": cfg,
               "error": f"rc={res.returncode}",
               "stderr_tail": tail,
               "measured_at": datetime.now(timezone.utc).isoformat(
                   timespec="seconds")}
        print(json.dumps(rec), flush=True)
    else:
        line = res.stdout.strip().splitlines()[-1]
        rec = json.loads(line)
        print(line, flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(rec) + "\n")

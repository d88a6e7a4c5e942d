#!/usr/bin/env python
"""d2 init-seed robustness sweep (VERDICT round-1 item 5).

Trains the d2 NN-d study across init seeds with and without the
boundary-anchor regulariser and scores whole-trace rollout stability
(AP2Hz + activation/deactivation families vs the Markov ground truth).
The reference's single torch-seeded run happened to land on a stable draw;
the anchored variant must make >=8/10 seeds stable to replace the
hand-picked init_seed=20 (studies.py).

Writes out/d2-seeds/report.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

parser = study_parser("d2 seed-robustness sweep")  # provides --iters
parser.add_argument("--seeds", type=int, default=10)
parser.add_argument("--anchor", type=float, default=10.0)
parser.add_argument("--skip-control", action="store_true")
args = parser.parse_args()
OUT = setup(args, "d2-seeds")

from dataclasses import replace  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ionflux import protocols as P  # noqa: E402
from ionflux.eval import simulate  # noqa: E402
from ionflux.models.registry import MARKOV_B06, SYNTHETIC  # noqa: E402
from ionflux.studies import D2, run_study, study_surface  # noqa: E402

# build the (seed-independent) d2 surface once and share it across runs
SHARED = os.path.join(OUT, "shared")
os.makedirs(SHARED, exist_ok=True)
study_surface(D2, SHARED, cached=True)


def seed_dir(name, seed):
    d = os.path.join(OUT, f"{name}-{seed}")
    os.makedirs(d, exist_ok=True)
    src = os.path.join(SHARED, "surface.npz")
    dst = os.path.join(d, "surface.npz")
    if not os.path.exists(dst):
        with open(src, "rb") as fs, open(dst, "wb") as fd:
            fd.write(fs.read())
    return d

PROTOS = ([P.load_csv("/root/reference/test-protocols/ap2hz.csv")]
          + P.activation_family() + P.deactivation_family())
TS = [jnp.linspace(0.0, 3000.0, 1501, jnp.float32)] + \
     [jnp.linspace(0.0, 8000.0, 2001, jnp.float32)] * 7 + \
     [jnp.linspace(0.0, 10000.0, 2001, jnp.float32)] * 9


def score(params):
    """(stable?, mean MAE vs GT over the 17 rollouts)."""
    maes = []
    for proto, ts in zip(PROTOS, TS):
        truth = simulate("markov", MARKOV_B06, proto, ts, SYNTHETIC)
        pred = simulate("nnd", params, proto, ts, SYNTHETIC)
        if not bool(jnp.all(jnp.isfinite(pred))):
            return False, float("inf")
        maes.append(float(jnp.mean(jnp.abs(pred - truth))))
    mean_mae = float(np.mean(maes))
    return mean_mae < 1.0, mean_mae


report = {}
variants = [("anchored", args.anchor)]
if not args.skip_control:
    variants.append(("control", 0.0))
for name, w in variants:
    rows = []
    for seed in range(args.seeds):
        spec = replace(D2, init_seed=seed, anchor_weight=w)
        outdir = seed_dir(name, seed)
        params = run_study(spec, outdir, iters=args.iters, cached=True)
        stable, mae = score(params)
        rows.append({"seed": seed, "stable": stable, "mean_mae": mae})
        print(f"{name} seed {seed}: stable={stable} mean MAE {mae:.4f}",
              flush=True)
    n_stable = sum(r["stable"] for r in rows)
    report[name] = {"rows": rows, "n_stable": n_stable,
                    "n_seeds": args.seeds}
    print(f"{name}: {n_stable}/{args.seeds} seeds rollout-stable")

with open(os.path.join(OUT, "report.json"), "w") as f:
    json.dump(report, f, indent=1)
print("report written:", os.path.join(OUT, "report.json"))

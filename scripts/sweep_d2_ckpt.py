#!/usr/bin/env python
"""d2 checkpoint-trajectory sweep: does validation-best checkpoint selection
(the round-2 r-study insight — the reference's r1 best is epoch 401/16000)
also close the d2 Pr4 prediction gap (VERDICT r3 item 1)?

Trains d2 across seeds x anchor weights in 400-iter chunks; after each chunk
rolls out the net on the PREDICTION protocols (Pr4 sweeps 1-3, sinewave,
AP2Hz) against the clean Markov ground truth and records the trajectory.
Writes out/d2-ckpt/report.json with per-(w, seed) best-checkpoint MAEs.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

parser = study_parser("d2 checkpoint-selection sweep")
parser.add_argument("--seeds", type=int, default=6)
parser.add_argument("--train-iters", type=int, default=8000)
parser.add_argument("--weights", type=str, default="0.3,0.0")
args = parser.parse_args()
OUT = setup(args, "d2-ckpt")

from dataclasses import replace  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ionflux import protocols as P  # noqa: E402
from ionflux import protorec  # noqa: E402
from ionflux.eval import simulate, simulate_long, solve_states_real  # noqa: E402
from ionflux.observe import gate_current, markov_current  # noqa: E402
from ionflux.fit.train import (boundary_anchors, fit_chunk,  # noqa: E402
                               init_opt_state)
from ionflux.models.hh import a_gate_rhs  # noqa: E402
from ionflux.models.registry import MARKOV_B06, SYNTHETIC, TABLE1  # noqa: E402
from ionflux.studies import (D2, init_params, study_surface,  # noqa: E402
                             wrap_net)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# shared surface
SHARED = os.path.join(OUT, "shared")
os.makedirs(SHARED, exist_ok=True)
v, a, dadt = study_surface(D2, SHARED, cached=True)
keep = (a > 0) & (a < 1)
X = jnp.asarray(np.stack([v[keep] / 100.0, a[keep]], axis=-1), jnp.float32)
Y = jnp.asarray(dadt[keep], jnp.float32)
RES = a_gate_rhs(D2.base_hh, X[:, 1], X[:, 0] * 100.0)

# clean GT traces for the validation rollouts
N4 = protorec.PR4_N // 16
SL4 = slice(N4, 4 * N4)
def sim_real(kind, params, name):
    """Current on any reconstructed real protocol (multi-sweep or single)."""
    ys = solve_states_real(kind, params, name)
    v, _dt = protorec.load_voltage(name)
    vq = jnp.asarray(v, jnp.float32)
    cur = markov_current if kind == "markov" else gate_current
    return np.asarray(cur(ys, vq, TABLE1), np.float64)


gt_pr4 = sim_real("markov", MARKOV_B06, "pr4-cell5")
gt_sin = sim_real("markov", MARKOV_B06, "sinewave-cell5")
gt_pr3 = sim_real("markov", MARKOV_B06, "pr3-cell5")
gt_pr5 = sim_real("markov", MARKOV_B06, "pr5-cell5")
AP2HZ = P.load_csv("/root/reference/test-protocols/ap2hz.csv")
TS_AP = jnp.linspace(0.0, 3000.0, 1501, jnp.float32)
gt_ap = np.asarray(simulate("markov", MARKOV_B06, AP2HZ, TS_AP, SYNTHETIC),
                   np.float64)
print("GT rollouts ready")


def validate(params):
    """All five table-1 protocols vs clean GT + AP2Hz; selection score =
    the five table columns (training Pr3/Pr5 + prediction Pr4/sin/APs
    stand-in ap2hz... APs via aps-cell5)."""
    m = {}
    m["pr3"] = float(np.mean(np.abs(
        sim_real("nnd", params, "pr3-cell5") - gt_pr3)))
    m["pr5"] = float(np.mean(np.abs(
        sim_real("nnd", params, "pr5-cell5") - gt_pr5)))
    i4 = sim_real("nnd", params, "pr4-cell5")
    m["pr4"] = float(np.mean(np.abs(i4[SL4] - gt_pr4[SL4])))
    m["sin"] = float(np.mean(np.abs(
        sim_real("nnd", params, "sinewave-cell5") - gt_sin)))
    iap = np.asarray(simulate("nnd", params, AP2HZ, TS_AP, SYNTHETIC),
                     np.float64)
    m["ap"] = float(np.mean(np.abs(iap - gt_ap)))
    score = m["pr3"] + m["pr5"] + m["pr4"] + m["sin"] + m["ap"]
    m["score"] = score if np.isfinite(score) else float("inf")
    if not np.isfinite(score):
        m = {k: float("inf") for k in m}
    return m


report = []
for w in [float(x) for x in args.weights.split(",")]:
    anchors = boundary_anchors(None, weight=w) if w > 0 else None
    for seed in range(args.seeds):
        spec = replace(D2, init_seed=seed, anchor_weight=w)
        net = init_params(spec).net
        opt_state = init_opt_state(net, 1e-3, spec.step_size, 0.9)
        traj = []
        best = (float("inf"), None, -1)
        done = 0
        while done < args.train_iters:
            net, opt_state, losses = fit_chunk(
                net, opt_state, X, Y, RES, anchors, iters=400, lr=1e-3,
                step_size=spec.step_size, gamma=0.9)
            done += 400
            m = validate(wrap_net(spec, net))
            traj.append({"iter": done, **m,
                         "train": float(losses[-1])})
            if m["score"] < best[0]:
                best = (m["score"], net, done)
            print(f"w={w} seed={seed} iter {done:5d} train "
                  f"{float(losses[-1]):.5f} pr3 {m['pr3']:.3f} "
                  f"pr5 {m['pr5']:.3f} pr4 {m['pr4']:.3f} "
                  f"sin {m['sin']:.3f} ap {m['ap']:.3f}", flush=True)
        _, bnet, bit = best
        bm = validate(wrap_net(spec, bnet)) if bnet is not None else {}
        d = os.path.join(OUT, f"w{w}-s{seed}")
        os.makedirs(d, exist_ok=True)
        if bnet is not None:
            from ionflux.utils.ckpt import save_pytree

            save_pytree(os.path.join(d, "best-model.npz"),
                        wrap_net(spec, bnet))
        report.append({"w": w, "seed": seed, "best_iter": bit, **bm,
                       "traj": traj})
        with open(os.path.join(OUT, "report.json"), "w") as fh:
            json.dump(report, fh, indent=1)
print("done")

#!/usr/bin/env python
"""Figure 2: d-study training fits (paper Fig. 3) — Markov ground-truth data
vs the fitted candidate (Mo), NN-f (M1) and NN-d (M2) on the REAL cell-5
Pr3/Pr5 recordings (reconstructed protocols), in the reference's composition:
sweep-overlaid voltage/current panels + shaded zoom panels with arrow scale
bars (reference figure-2.py:556-821)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

parser = study_parser("Figure 2: d-study fits.")
parser.add_argument("--oracle", action="store_true",
                    help="use the reference's archived checkpoints")
parser.add_argument("--s", action="store_true",
                    help="s-study supplement variant (HH ground truth, "
                         "s1/s2 models; figure-2-s.py/figure-3-s.py)")
args = parser.parse_args()
OUT = setup(args, "figure-2-s" if args.s else "figure-2")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ionflux import protorec  # noqa: E402
from ionflux.eval import simulate_long  # noqa: E402
from ionflux.figures import (SET2, fit_composition_cols, load_d_models,  # noqa: E402
                             load_d_models_reference, mae_row)
from ionflux.models.registry import HH_B06, MARKOV_B06, TABLE1  # noqa: E402
from ionflux.observe import add_noise  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
from ionflux.figures import load_s_models  # noqa: E402

if args.s:
    models = load_s_models(None if args.oracle
                           else os.path.join(REPO, "out"))
    GT_KIND, GT_PARAMS = "hh", HH_B06
else:
    models = (load_d_models_reference() if args.oracle
              else load_d_models(os.path.join(REPO, "out")))
    GT_KIND, GT_PARAMS = "markov", MARKOV_B06


def sim(cache_name, kind, params, proto_name):
    path = os.path.join(OUT, f"{cache_name}.npz")
    if args.cached and os.path.exists(path):
        return np.load(path)["y"]
    y = np.asarray(simulate_long(kind, params, proto_name, TABLE1),
                   np.float64)
    np.savez(path, y=y)
    return y


# zoom windows/limits/facecolors exactly as figure-2.py:538-549
ZOOMS = {
    "pr3-cell5": [(1000, 5000, -1, 4, SET2[0]), (6600, 7100, -19, 1, SET2[1])],
    "pr5-cell5": [(2600, 3000, -24, 18, SET2[2]), (8650, 9100, -6, 1, SET2[3])],
}

columns = []
for seed, name in enumerate(["pr3-cell5", "pr5-cell5"]):
    n_sweeps, period = protorec.SWEEPS[name]
    v, dt = protorec.load_voltage(name)
    t = np.arange(period) * dt
    truth = sim(f"{name}-gt{'-s' if args.s else ''}", GT_KIND, GT_PARAMS, name)
    data = np.asarray(add_noise(jax.random.PRNGKey(seed), jnp.asarray(truth)),
                      np.float64)
    preds = {label: sim(f"{name}-{label}{'-oracle' if args.oracle else ''}",
                        kind, params, name)
             for label, (kind, params, _s) in models.items()}
    for label, val in mae_row(data, preds).items():
        print(f"{name} ({label}) | Total Loss {val:.6f}")
    columns.append({
        "t": t,
        "v": v.reshape(n_sweeps, period),
        "data": data.reshape(n_sweeps, period),
        "preds": {k: y.reshape(n_sweeps, period) for k, y in preds.items()},
        "zooms": ZOOMS[name],
    })

suffix = ("-s" if args.s else "") + ("-oracle" if args.oracle else "")
fit_composition_cols(os.path.join(OUT, f"fig2{suffix}.png"), columns)

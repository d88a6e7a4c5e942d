#!/usr/bin/env python
"""Figure 3: d-study predictions (paper Fig. 4) — Pr4 sweeps on top,
sinewave and APs full-width rows with zoom panels, on the reconstructed
real cell-5 protocols (reference figure-3.py:560-900)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

parser = study_parser("Figure 3: d-study predictions.")
parser.add_argument("--oracle", action="store_true",
                    help="use the reference's archived checkpoints")
parser.add_argument("--s", action="store_true",
                    help="s-study supplement variant (HH ground truth, "
                         "s1/s2 models; figure-2-s.py/figure-3-s.py)")
args = parser.parse_args()
OUT = setup(args, "figure-3-s" if args.s else "figure-3")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ionflux import protorec  # noqa: E402
from ionflux.eval import simulate, simulate_long  # noqa: E402
from ionflux.figures import (SET2, fit_composition_rows, load_d_models,  # noqa: E402
                             load_d_models_reference, mae_row)
from ionflux.models.registry import HH_B06, MARKOV_B06, TABLE1  # noqa: E402
from ionflux.observe import add_noise  # noqa: E402
from ionflux.utils.ptload import pt_load  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFDIR = "/root/reference"
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
    if proto_name in protorec.SWEEPS:
        y = np.asarray(simulate_long(kind, params, proto_name, TABLE1),
                       np.float64)
    else:
        proto = protorec.protocol(proto_name)
        v, dt = protorec.load_voltage(proto_name)
        ts = jnp.asarray(np.arange(len(v)) * dt, jnp.float32)
        y = np.asarray(simulate(kind, params, proto, ts, TABLE1,
                                max_steps=1_000_000, buffer_size=65536),
                       np.float64)
    np.savez(path, y=y)
    return y


def data_trace(proto_name, yc_name, seed):
    """Noisy Markov-GT data; the stored yc caches carry the reference's own
    noise realisation bit-for-bit where present."""
    if yc_name and not args.s and os.path.isdir(REFDIR):
        return np.asarray(pt_load(f"{REFDIR}/table-1/{yc_name}"),
                          np.float64).reshape(-1)
    truth = sim(f"{proto_name}-gt{'-s' if args.s else ''}", GT_KIND,
                GT_PARAMS, proto_name)
    return np.asarray(add_noise(jax.random.PRNGKey(seed), jnp.asarray(truth)),
                      np.float64)


# (protocol, stored yc, zooms: (t0, t1, y0, y1, color); figure-3.py:560-578)
CASES = [
    ("pr4-cell5", None, []),
    ("sinewave-cell5", "yc-sinewave.pt",
     [(3700, 4500, -1, 14, SET2[0]), (5500, 6250, -7, 18, SET2[1]),
      (6400, 7000, -20, 2, SET2[2])]),
    ("aps-cell5", "yc-aps.pt",
     [(2400, 2800, -2, 33, SET2[0]), (4300, 4900, -1, 19, SET2[1]),
      (6100, 6500, -1, 19, SET2[2])]),
]

panels = []
for seed, (name, yc, zooms) in enumerate(CASES):
    v, dt = protorec.load_voltage(name)
    data = data_trace(name, yc, 10 + seed)
    preds = {label: sim(f"{name}-{label}{'-oracle' if args.oracle else ''}",
                        kind, params, name)
             for label, (kind, params, _s) in models.items()}
    for label, val in mae_row(data, preds).items():
        print(f"{name} ({label}) | Total Loss {val:.6f}")
    if name in protorec.SWEEPS:
        n_sweeps, period = protorec.SWEEPS[name]
        shape = (n_sweeps, period)
    else:
        shape = (1, len(v))
    panels.append({
        "t": np.arange(shape[1]) * dt,
        "v": v.reshape(shape),
        "data": data.reshape(shape),
        "preds": {k: y.reshape(shape) for k, y in preds.items()},
        "zooms": zooms,
    })

suffix = ("-s" if args.s else "") + ("-oracle" if args.oracle else "")
fit_composition_rows(os.path.join(OUT, f"fig3{suffix}.png"),
                     [panels[0]], panels[1:])

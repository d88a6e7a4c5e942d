#!/usr/bin/env python
"""Figure 4: r-study training fits (paper Fig. 6) — measured cell-5 data vs
the cell-5 HH fit (Mo), r1 NN-f and r2 NN-d on the real Pr3/Pr5 recordings
(reference figure-4.py).  The grey data trace is the smoothed measurement
recovered from the reference's surface caches (capacitance-masked samples;
gaps at step edges are genuine mask gaps)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

parser = study_parser("Figure 4: r-study fits.")
parser.add_argument("--oracle", action="store_true",
                    help="use the reference's archived checkpoints")
args = parser.parse_args()
OUT = setup(args, "figure-4")

import numpy as np  # noqa: E402

from ionflux import protorec  # noqa: E402
from ionflux.eval import simulate_long  # noqa: E402
from ionflux.figures import (SET2, dense_measurement,  # noqa: E402
                             fit_composition_cols)
from ionflux.models.registry import CELL5_R1, HH_CELL5_INIT  # noqa: E402
from ionflux.realdata import recover_measurements  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFDIR = "/root/reference"


from ionflux.figures import load_r_models  # noqa: E402

ROWS = load_r_models(os.path.join(REPO, "out"), oracle=args.oracle)

meas = recover_measurements(f"{REFDIR}/r1", CELL5_R1, HH_CELL5_INIT)

ZOOMS = {  # figure-4.py:455-462
    "pr3": [(1000, 5000, -0.1, 0.7, SET2[0]), (6600, 7100, -4.0, 0.5, SET2[1])],
    "pr5": [(2600, 3000, -4.0, 2.0, SET2[2]), (8650, 9100, -3.0, 0.5, SET2[3])],
}

columns = []
for name in ("pr3", "pr5"):
    n_sweeps, period = protorec.SWEEPS[f"{name}-cell5"]
    v, dt = protorec.load_voltage(f"{name}-cell5")
    tl, i_meas = meas[name]
    data = dense_measurement(np.round(tl / dt).astype(np.int64), i_meas,
                             n_sweeps * period)
    preds = {}
    for label, kind, params, c in ROWS:
        cache = os.path.join(
            OUT, f"{name}-{label}{'-oracle' if args.oracle else ''}.npz")
        if args.cached and os.path.exists(cache):
            y = np.load(cache)["y"]
        else:
            y = np.asarray(simulate_long(kind, params, f"{name}-cell5", c),
                           np.float64)
            np.savez(cache, y=y)
        preds[label] = y.reshape(n_sweeps, period)
        err = y[np.round(tl / dt).astype(np.int64)] - np.asarray(i_meas)
        print(f"{name} ({label}) | Total Loss {np.mean(np.abs(err)):.6f}")
    columns.append({
        "t": np.arange(period) * dt,
        "v": v.reshape(n_sweeps, period),
        "data": data.reshape(n_sweeps, period),
        "preds": preds,
        "zooms": ZOOMS[name],
    })

suffix = "-oracle" if args.oracle else ""
fit_composition_cols(os.path.join(OUT, f"fig4{suffix}.png"), columns)

#!/usr/bin/env python
"""Figure 5: r-study predictions (paper Fig. 7) — Pr4 sweeps on top,
sinewave and APs full-width rows with zooms, on the real cell-5 protocols
(reference figure-5.py).  Grey traces: the recovered smoothed Pr4
measurement (masked samples); for sinewave/APs, where no measurement is
recoverable, the reference's stored model traces (figure-5/y1-*.pt) stand in
as the archived-run overlay."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

parser = study_parser("Figure 5: r-study predictions.")
parser.add_argument("--oracle", action="store_true")
args = parser.parse_args()
OUT = setup(args, "figure-5")

import numpy as np  # noqa: E402

from ionflux import protorec  # noqa: E402
from ionflux.eval import simulate_long, solve_states_real  # noqa: E402
from ionflux.figures import (SET2, dense_measurement,  # noqa: E402
                             fit_composition_rows)
from ionflux.models.registry import CELL5_R1BAD, HH_R1BAD_INIT  # noqa: E402
from ionflux.observe import gate_current  # noqa: E402
from ionflux.realdata import recover_measurements  # noqa: E402
from ionflux.utils.ptload import pt_load  # noqa: E402

from ionflux.figures import load_r_models  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFDIR = "/root/reference"

ROWS = load_r_models(os.path.join(REPO, "out"), oracle=args.oracle)

ZOOMS = {  # figure-5.py:476-485
    "sinewave": [(3700, 4500, 0.0, 1.0, SET2[0]),
                 (5500, 6250, -0.6, 1.4, SET2[1]),
                 (6400, 7000, -1.8, 0.2, SET2[2])],
    "aps": [(2400, 2800, -0.2, 3.3, SET2[0]),
            (4300, 4900, 0.0, 2.0, SET2[1]),
            (6100, 6500, -0.1, 2.4, SET2[2])],
}

meas4 = recover_measurements(f"{REFDIR}/r1-bad", CELL5_R1BAD, HH_R1BAD_INIT,
                             protocols=("pr3", "pr4"), n_points=30)


def sim(name, label, kind, params, c):
    import jax.numpy as jnp

    cache = os.path.join(
        OUT, f"{name}-{label}{'-oracle' if args.oracle else ''}.npz")
    if args.cached and os.path.exists(cache):
        return np.load(cache)["y"]
    if f"{name}-cell5" in protorec.SWEEPS:
        y = np.asarray(simulate_long(kind, params, f"{name}-cell5", c),
                       np.float64)
    else:
        v, _ = protorec.load_voltage(f"{name}-cell5")
        y = np.asarray(gate_current(
            solve_states_real(kind, params, f"{name}-cell5"),
            jnp.asarray(v, jnp.float32), c), np.float64)
    np.savez(cache, y=y)
    return y


panels = []
for name in ("pr4", "sinewave", "aps"):
    v, dt = protorec.load_voltage(f"{name}-cell5")
    if name == "pr4":
        n_sweeps, period = protorec.SWEEPS["pr4-cell5"]
        tl, i_meas = meas4["pr4"]
        data = dense_measurement(np.round(tl / dt).astype(np.int64), i_meas,
                                 n_sweeps * period)
        shape = (n_sweeps, period)
    else:
        data = np.asarray(pt_load(f"{REFDIR}/figure-5/y1-{name}.pt"),
                          np.float64).reshape(-1)
        shape = (1, len(v))
    preds = {label: sim(name, label, kind, params, c).reshape(shape)
             for label, kind, params, c in ROWS}
    panels.append({
        "t": np.arange(shape[1]) * dt,
        "v": v.reshape(shape),
        "data": data.reshape(shape),
        "preds": preds,
        "zooms": ZOOMS.get(name, []),
    })

suffix = "-oracle" if args.oracle else ""
fit_composition_rows(os.path.join(OUT, f"fig5{suffix}.png"),
                     [panels[0]], panels[1:])

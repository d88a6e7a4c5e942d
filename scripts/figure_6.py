#!/usr/bin/env python
"""Figure 6: r1-bad negative control (paper Fig. 8) — a model trained on
insufficient protocols (Pr3+Pr4 only) fits its training data but fails on
unseen deactivation.  Real protocols: Pr4 column (r1-bad training data, with
the recovered measurement and the reference's stored r1-bad trace) and Pr5
column (unseen; no r1-bad training signal).  Reference figure-6.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

args = study_parser("Figure 6: r1-bad negative control.").parse_args()
OUT = setup(args, "figure-6")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ionflux import protorec  # noqa: E402
from ionflux.eval import simulate_long  # noqa: E402
from ionflux.figures import (SET2, dense_measurement,  # noqa: E402
                             fit_composition_cols)
from ionflux.models.nn import NNfParams  # noqa: E402
from ionflux.models.registry import (CELL5_R1, CELL5_R1BAD,  # noqa: E402
                                     CELL5_RAW, HH_CELL5_FIT,
                                     HH_CELL5_INIT, HH_R1BAD_INIT)
from ionflux.realdata import recover_measurements  # noqa: E402
from ionflux.rstudies import R1BAD, init_params  # noqa: E402
from ionflux.utils.ckpt import load_pytree  # noqa: E402
from ionflux.utils.ptload import load_mlp_state_dict  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFDIR = "/root/reference"

ref_bad = NNfParams(
    net=[(jnp.asarray(w), jnp.asarray(b)) for w, b in
         load_mlp_state_dict(f"{REFDIR}/r1-bad/model-state-dict.pt")],
    rgate=HH_R1BAD_INIT)
models = {
    "Original": ("hh", HH_CELL5_FIT, CELL5_RAW),
    "NN-f (r1-bad ref)": ("nnf", ref_bad, CELL5_R1BAD),
}
# the reference's r1-bad analysis uses the FINAL model, not the validation
# best (figure-6.py loads model-state-dict.pt) — keep that convention
ours = os.path.join(REPO, "out", "r1-bad", "model.npz")
if os.path.exists(ours):
    models["NN-f (r1-bad ours)"] = ("nnf", load_pytree(ours,
                                                       init_params(R1BAD)),
                                    CELL5_R1BAD)

meas = recover_measurements(f"{REFDIR}/r1-bad", CELL5_R1BAD, HH_R1BAD_INIT,
                            protocols=("pr3", "pr4"), n_points=30)
meas35 = recover_measurements(f"{REFDIR}/r1", CELL5_R1, HH_CELL5_INIT)

ZOOMS = {
    "pr4": [(850, 1100, -3.0, 8.0, SET2[0]), (1060, 1260, -3.0, 2.0, SET2[1])],
    "pr5": [(2600, 3000, -4.0, 2.0, SET2[2]), (8650, 9100, -3.0, 0.5, SET2[3])],
}

columns = []
for name, m in (("pr4", meas), ("pr5", meas35)):
    n_sweeps, period = protorec.SWEEPS[f"{name}-cell5"]
    v, dt = protorec.load_voltage(f"{name}-cell5")
    tl, i_meas = m[name]
    data = dense_measurement(np.round(tl / dt).astype(np.int64), i_meas,
                             n_sweeps * period)
    preds = {}
    for label, (kind, params, c) in models.items():
        cache = os.path.join(OUT, f"{name}-{label}.npz")
        if args.cached and os.path.exists(cache):
            y = np.load(cache)["y"]
        else:
            y = np.asarray(simulate_long(kind, params, f"{name}-cell5", c),
                           np.float64)
            np.savez(cache, y=y)
        preds[label] = y.reshape(n_sweeps, period)
        idx = np.round(tl / dt).astype(np.int64)
        print(f"{name} ({label}) | Total Loss "
              f"{np.mean(np.abs(y[idx] - np.asarray(i_meas))):.6f}")
    columns.append({
        "t": np.arange(period) * dt,
        "v": v.reshape(n_sweeps, period),
        "data": data.reshape(n_sweeps, period),
        "preds": preds,
        "zooms": ZOOMS[name],
    })

fit_composition_cols(os.path.join(OUT, "fig6.png"), columns)

#!/usr/bin/env python
"""Table 2: real cell-5 study MAEs (reference table-2.py).

The raw measured currents are not redistributed with the reference, but the
smoothed measurements at the capacitance-masked samples are recoverable from
its cached training surfaces (realdata.recover_measurements): Pr3/Pr5 from
the r1 surface, Pr4 from the r1-bad surface.  Those columns therefore score
against the reference's own smoothed recordings at ~90% of samples (the cap-
transient spikes the reference's full-resolution MAEs include are absent, so
values sit slightly below table-2/table-2.txt).  Sinusoidal/APs measured
currents are unrecoverable; those columns (marked +) score each model's
simulation against the reference's archived simulated trace for the same
model family (table-2/y{o,1,2}-{sinewave,aps}.pt, cached by
table-2.py:398-419) — direct solver/protocol parity in --oracle mode,
retrained-vs-archived-model agreement otherwise.

Default rows: our retrained best checkpoints (out/r1, out/r2).
--oracle: the reference's archived checkpoints (r1/best-model-checkpoint-2,
r2/model-state-dict-2; table-2.py:313-319) for direct parity.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

parser = study_parser("Table 2: real-data MAE table.")
parser.add_argument("--oracle", action="store_true")
args = parser.parse_args()
OUT = setup(args, "table-2")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ionflux import protorec  # noqa: E402
from ionflux.eval import simulate_long, solve_states_real  # noqa: E402
from ionflux.figures import latex_table  # noqa: E402
from ionflux.models.nn import NNdParams, NNfParams  # noqa: E402
from ionflux.models.registry import (  # noqa: E402
    CELL5_R1,
    CELL5_R1BAD,
    CELL5_R2,
    CELL5_RAW,
    HH_CELL5_FIT,
    HH_CELL5_INIT,
    HH_R1BAD_INIT,
)
from ionflux.observe import gate_current  # noqa: E402
from ionflux.realdata import recover_measurements  # noqa: E402
from ionflux.rstudies import R1, R2, init_params  # noqa: E402
from ionflux.utils.ckpt import load_pytree  # noqa: E402
from ionflux.utils.ptload import load_mlp_state_dict, pt_load  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFDIR = "/root/reference"


def reference_models():
    ck = pt_load(f"{REFDIR}/r1/best-model-checkpoint-2.pt")
    sd = ck["state_dict"]
    idxs = sorted({int(k.split(".")[1]) for k in sd if k.startswith("net.")})
    r1 = NNfParams(
        net=[(jnp.asarray(np.ascontiguousarray(sd[f"net.{i}.weight"].T)),
              jnp.asarray(sd[f"net.{i}.bias"])) for i in idxs],
        rgate=HH_CELL5_INIT)
    r2 = NNdParams(
        net=[(jnp.asarray(w), jnp.asarray(b)) for w, b in
             load_mlp_state_dict(f"{REFDIR}/r2/model-state-dict-2.pt")],
        hh=HH_CELL5_FIT)
    return r1, r2


def our_models():
    out = []
    for spec in (R1, R2):
        path = os.path.join(REPO, "out", spec.name, "best-model.npz")
        if not os.path.exists(path):
            path = os.path.join(REPO, "out", spec.name, "model.npz")
        out.append(load_pytree(path, init_params(spec)))
    return tuple(out)


# measured currents (smoothed, masked samples)
meas35 = recover_measurements(f"{REFDIR}/r1", CELL5_R1, HH_CELL5_INIT)
meas4 = recover_measurements(f"{REFDIR}/r1-bad", CELL5_R1BAD, HH_R1BAD_INIT,
                             protocols=("pr3", "pr4"), n_points=30)
MEAS = {"pr3": meas35["pr3"], "pr5": meas35["pr5"], "pr4": meas4["pr4"]}

r1_params, r2_params = reference_models() if args.oracle else our_models()

# rows: (label, kind, params, constants, stored-trace tag); table-2.py:32-37:
# Mo uses (g, E), NN-f (1.2g, E-5), NN-d (1.2g, E); table-2.py:398-419 caches
# each model's simulated sinewave/APs currents as y{o,1,2}-{sinewave,aps}.pt
ROWS = [
    ("Original", "hh", HH_CELL5_FIT, CELL5_RAW, "yo"),
    ("NN-f", "nnf", r1_params, CELL5_R1, "y1"),
    ("NN-d", "nnd", r2_params, CELL5_R2, "y2"),
]

COLS = ["Pr3", "Pr5", "Pr4", "Sinusoidal (+)", "APs (+)"]
rows_out = {}
for label, kind, params, c, tag in ROWS:
    vals = []
    # measured columns
    for name in ("pr3", "pr5", "pr4"):
        tl, i_meas = MEAS[name]
        idx = np.round(tl / protorec.DT_MS).astype(np.int64)
        i = np.asarray(simulate_long(kind, params, f"{name}-cell5", c),
                       np.float64)
        if name == "pr4":  # sweeps 1-3 only (table-2.py:466-468)
            n = protorec.PR4_N // 16
            keep = (idx >= n) & (idx < 4 * n)
            idx, i_meas = idx[keep], i_meas[keep]
        mae = float(np.mean(np.abs(i[idx] - np.asarray(i_meas))))
        vals.append(mae)
        print(f"{name} ({label}) | Total Loss {mae:.6f}")
    # prediction columns vs the reference's archived simulated traces
    # (table-2/y{o,1,2}-{sinewave,aps}.pt; the measured currents themselves
    # are not recoverable, SURVEY.md §1.1) — in --oracle mode this is direct
    # solver+protocol parity, default mode scores the retrained model's
    # agreement with the archived reference predictions
    for name in ("sinewave", "aps"):
        ref_i = np.asarray(
            pt_load(f"{REFDIR}/table-2/{tag}-{name}.pt")).reshape(-1)
        v, dt = protorec.load_voltage(f"{name}-cell5")
        ours_i = gate_current(
            solve_states_real(kind, params, f"{name}-cell5"),
            jnp.asarray(v, jnp.float32), c)
        mae = float(np.mean(np.abs(np.asarray(ours_i, np.float64) - ref_i)))
        vals.append(mae)
        print(f"{name} ({label}) vs stored {tag}-{name}.pt | {mae:.6f}")
    rows_out[label] = vals

suffix = "-oracle" if args.oracle else ""
latex_table(
    os.path.join(OUT, f"table-2{suffix}.txt"), COLS, rows_out,
    caption="real cell-5 MAE (nA) at capacitance-masked samples vs the "
            "recovered smoothed measurements; (+) columns: MAE vs the "
            "reference's archived simulated trace for the same model "
            "family (table-2/y*-{sinewave,aps}.pt; measured currents not "
            "recoverable)")

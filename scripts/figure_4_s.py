#!/usr/bin/env python
"""Figure 4-s: r-study supplement (reference figure-4-s.py) — the cell-5 HH
fit (Mo), r1 NN-f and r2 NN-d on the real Pr3/Pr5 recordings, as per-step
panels (pr3/s0..s6, pr5/s0..s8), all-steps overlays (pr3, pr3-z, pr5) and
the fig4-s composition (Pr3 voltage/current + per-model zoom panels,
figure-4-s.py:472-615).

The grey data trace is the smoothed measurement recovered from the
reference's surface caches (capacitance-masked samples; the stored
figure-4-s/y*.pt traces are not in this mount — .MISSING_LARGE_BLOBS)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

parser = study_parser("Figure 4-s: r-study supplement.")
parser.add_argument("--oracle", action="store_true",
                    help="use the reference's archived checkpoints")
args = parser.parse_args()
OUT = setup(args, "figure-4-s")

import matplotlib  # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from ionflux import protorec  # noqa: E402
from ionflux.eval import simulate_long  # noqa: E402
from ionflux.figures import (MODEL_STYLES, SET2,  # noqa: E402
                             dense_measurement, fit_composition_permodel_zoom,
                             load_r_models, _sns_theme)
from ionflux.models.registry import CELL5_R1, HH_CELL5_INIT  # noqa: E402
from ionflux.realdata import recover_measurements  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFDIR = "/root/reference"

_sns_theme(plt)
plt.rcParams["axes.facecolor"] = "#E4EDE4"  # figure-4-s.py:14

ROWS = load_r_models(os.path.join(REPO, "out"), oracle=args.oracle)
MO_LABEL = {"Original": "Mo", "NN-f": "M1", "NN-d": "M2"}
LEGEND = {"Original": "Original", "NN-f": "Full NN",
          "NN-d": "NN discrepancy"}

meas = recover_measurements(f"{REFDIR}/r1", CELL5_R1, HH_CELL5_INIT)

suffix = "-oracle" if args.oracle else ""
cols = {}
for name, refname in (("pr3", "Pr3"), ("pr5", "Pr5")):
    n_sweeps, period = protorec.SWEEPS[f"{name}-cell5"]
    v, dt = protorec.load_voltage(f"{name}-cell5")
    tl, i_meas = meas[name]
    idx = np.round(tl / dt).astype(np.int64)
    data = dense_measurement(idx, i_meas, n_sweeps * period)
    preds = {}
    for label, kind, params, c in ROWS:
        cache = os.path.join(OUT, f"{name}-{label}{suffix}.npz")
        if args.cached and os.path.exists(cache):
            y = np.load(cache)["y"]
        else:
            y = np.asarray(simulate_long(kind, params, f"{name}-cell5", c),
                           np.float64)
            np.savez(cache, y=y)
        mae = np.mean(np.abs(y[idx] - np.asarray(i_meas)))
        print(f"{refname} ({MO_LABEL[label]}) prediction | "
              f"Total Loss {mae:.6f}")
        preds[label] = y.reshape(n_sweeps, period)
    t = np.arange(period) * dt
    v = v.reshape(n_sweeps, period)
    data = data.reshape(n_sweeps, period)
    cols[name] = (t, v, data, preds, n_sweeps)

    # per-step panels (figure-4-s.py:361-373, 416-428) + all-steps overlay
    os.makedirs(os.path.join(OUT, name), exist_ok=True)
    fig1, ax1 = plt.subplots(1, 1, figsize=(6, 4))
    ax1.set_xlabel("Time (ms)")
    ax1.set_ylabel("Current (nA)")
    for i in range(n_sweeps):
        ax1.plot(t, data[i], c="#7f7f7f",
                 label="__nolegend__" if i else "Data")
        for label, y in preds.items():
            fmt, color = MODEL_STYLES[label]
            ax1.plot(t, y[i], fmt, c=color,
                     label="__nolegend__" if i else LEGEND[label])

        fig2, ax2 = plt.subplots(1, 1, figsize=(6, 4))
        ax2.set_xlabel("Time (ms)")
        ax2.set_ylabel("Current (nA)")
        ax2.plot(t, data[i], c="#7f7f7f", label="Data")
        for label, y in preds.items():
            fmt, color = MODEL_STYLES[label]
            ax2.plot(t, y[i], fmt, c=color, label=LEGEND[label])
        ax2.set_xlim(t.min(), t.max())
        ax2.legend()
        fig2.tight_layout()
        fig2.savefig(os.path.join(OUT, name, f"s{i}"), dpi=200)
        plt.close(fig2)
    ax1.set_xlim(t.min(), t.max())
    ax1.legend()
    fig1.tight_layout()
    fig1.savefig(os.path.join(OUT, name), dpi=200 if name == "pr3" else 300)
    if name == "pr3":  # zoomed variant (figure-4-s.py:379-383)
        ax1.set_xlim(5000, 7000)
        fig1.tight_layout()
        fig1.savefig(os.path.join(OUT, f"{name}-z"), dpi=200)
    plt.close(fig1)

# final composition: Pr3 with per-model zooms of (1000, 5000)
# (figure-4-s.py:455-462: zoom_in_win[0][0], zoom_in_y[0][0], Set2[0])
t, v, data, preds, _ = cols["pr3"]
fit_composition_permodel_zoom(
    os.path.join(OUT, f"fig4-s{suffix}.png"), t, v, data, preds,
    zoom=(1000, 5000), zoom_ylim=(-0.1, 0.7), facecolor=SET2[0],
    ylim=(-0.5, 2))

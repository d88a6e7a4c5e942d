#!/usr/bin/env python
"""Figure 4: r1 real-data study — NN-f (reference best checkpoint + our
retrained weights) vs the cell-5 candidate model on Pr3/Pr5.

Reference figure-4.py uses the recorded cell-5 protocol and current files
(absent from the mount); this replay runs on nominal templates and compares
MODELS to each other (no measured trace available), labelled accordingly.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

args = study_parser("Figure 4: r1 study.").parse_args()
OUT = setup(args, "figure-4")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import matplotlib  # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ionflux import protocols as P  # noqa: E402
from ionflux.figures import cached_sim, mae_row  # noqa: E402
from ionflux.models.nn import NNfParams  # noqa: E402
from ionflux.models.registry import (  # noqa: E402
    CELL5_R1,
    CELL5_RAW,
    HH_CELL5_FIT,
    HH_CELL5_INIT,
)
from ionflux.rstudies import R1, init_params  # noqa: E402
from ionflux.utils.ckpt import load_pytree  # noqa: E402
from ionflux.utils.ptload import pt_load  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFDIR = "/root/reference"


def load_ref_r1():
    """The reference's best r1 checkpoint (figure-4.py:301-307) via the
    torch-free reader."""
    ckpt = pt_load(f"{REFDIR}/r1/best-model-checkpoint-2.pt")
    sd = ckpt["state_dict"]
    idxs = sorted({int(k.split(".")[1]) for k in sd if k.startswith("net.")})
    net = [(jnp.asarray(np.ascontiguousarray(sd[f"net.{i}.weight"].T)),
            jnp.asarray(sd[f"net.{i}.bias"])) for i in idxs]
    return NNfParams(net=net, rgate=HH_CELL5_INIT)


models = {"Candidate (cell-5 fit)": ("hh", HH_CELL5_FIT, CELL5_RAW, "C2--")}
models["NN-f (reference ckpt)"] = ("nnf", load_ref_r1(), CELL5_R1, "C0-")
our_path = os.path.join(REPO, "out", "r1", "model.npz")
if os.path.exists(our_path):
    models["NN-f (ours)"] = ("nnf", load_pytree(our_path, init_params(R1)),
                             CELL5_R1, "C1--")

for name, fam, ts_end, n in [
    ("pr3", P.activation_family(dt_ms=1.0), 8000.0, 8001),
    ("pr5", P.deactivation_family(dt_ms=1.0), 10000.0, 10001),
]:
    ts = np.linspace(0.0, ts_end, n)
    ncols = 4
    nrows = -(-len(fam) // ncols)
    fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 2.6 * nrows),
                             squeeze=False)
    sums = {label: [] for label in models}
    for k, proto in enumerate(fam):
        ax = axes[k // ncols][k % ncols]
        preds = {}
        for label, (kind, params, c, style) in models.items():
            y = cached_sim(OUT, f"{name}-{label.replace(' ', '_')}-{k}",
                           args.cached, kind, params, proto, ts, c)
            preds[label] = y
            ax.plot(ts, y, style, lw=0.9, label=label)
        for label, v in mae_row(preds["NN-f (reference ckpt)"],
                                preds).items():
            sums[label].append(v)
        if k == 0:
            ax.legend(fontsize=6)
        ax.set_xlabel("t (ms)")
        ax.set_ylabel("I (nA)")
    print(name, "mean MAE vs reference NN-f:",
          {k: round(float(np.mean(v)), 4) for k, v in sums.items()})
    fig.suptitle(f"r1 {name} (nominal protocols, no measured trace in mount)",
                 fontsize=10)
    fig.tight_layout()
    fig.savefig(os.path.join(OUT, f"{name}.png"), dpi=160)
    print(f"wrote {OUT}/{name}.png")

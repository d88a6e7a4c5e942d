#!/usr/bin/env python
"""Figure 5: r2 real-data study — NN-d (reference checkpoint + ours) vs the
cell-5 candidate on Pr3/Pr5.  Reference figure-5.py; nominal protocols, no
measured trace in the mount."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

args = study_parser("Figure 5: r2 study.").parse_args()
OUT = setup(args, "figure-5")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import matplotlib  # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ionflux import protocols as P  # noqa: E402
from ionflux.figures import cached_sim, mae_row  # noqa: E402
from ionflux.models.nn import NNdParams  # noqa: E402
from ionflux.models.registry import CELL5_R2, CELL5_RAW, HH_CELL5_FIT  # noqa: E402
from ionflux.rstudies import R2, init_params  # noqa: E402
from ionflux.utils.ckpt import load_pytree  # noqa: E402
from ionflux.utils.ptload import load_mlp_state_dict  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFDIR = "/root/reference"

# reference r2 weights (figure-5 loads r2/model-state-dict-2.pt)
ref_net = [(jnp.asarray(w), jnp.asarray(b)) for w, b in
           load_mlp_state_dict(f"{REFDIR}/r2/model-state-dict-2.pt")]
models = {
    "Candidate (cell-5 fit)": ("hh", HH_CELL5_FIT, CELL5_RAW, "C2--"),
    "NN-d (reference)": ("nnd", NNdParams(net=ref_net, hh=HH_CELL5_FIT),
                         CELL5_R2, "C0-"),
}
our_path = os.path.join(REPO, "out", "r2", "model.npz")
if os.path.exists(our_path):
    models["NN-d (ours)"] = ("nnd", load_pytree(our_path, init_params(R2)),
                             CELL5_R2, "C1--")

for name, fam, ts_end, n in [
    ("pr3", P.activation_family(dt_ms=1.0), 8000.0, 8001),
    ("pr5", P.deactivation_family(dt_ms=1.0), 10000.0, 10001),
]:
    ts = np.linspace(0.0, ts_end, n)
    fig, axes = plt.subplots(-(-len(fam) // 4), 4,
                             figsize=(16, 2.6 * -(-len(fam) // 4)),
                             squeeze=False)
    preds_last = {}
    for k, proto in enumerate(fam):
        ax = axes[k // 4][k % 4]
        for label, (kind, params, c, style) in models.items():
            y = cached_sim(OUT, f"{name}-{label.replace(chr(32), chr(95))}-{k}", args.cached,
                           kind, params, proto, ts, c)
            preds_last[label] = y
            ax.plot(ts, y, style, lw=0.9, label=label)
        if k == 0:
            ax.legend(fontsize=6)
    print(name, "MAE vs reference NN-d:",
          {k: round(v, 4)
           for k, v in mae_row(preds_last["NN-d (reference)"],
                               preds_last).items()})
    fig.suptitle(f"r2 {name} (nominal protocols)", fontsize=10)
    fig.tight_layout()
    fig.savefig(os.path.join(OUT, f"{name}.png"), dpi=160)
    print(f"wrote {OUT}/{name}.png")

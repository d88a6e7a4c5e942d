#!/usr/bin/env python
"""Figure 6: r1-bad (insufficient training protocols) vs the candidate and
the properly-trained r1 model — the negative-control comparison.
Reference figure-6.py; nominal protocols."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

args = study_parser("Figure 6: r1-bad negative control.").parse_args()
OUT = setup(args, "figure-6")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import matplotlib  # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ionflux import protocols as P  # noqa: E402
from ionflux.figures import cached_sim  # noqa: E402
from ionflux.models.nn import NNfParams  # noqa: E402
from ionflux.models.registry import (  # noqa: E402
    CELL5_R1,
    CELL5_R1BAD,
    CELL5_RAW,
    HH_CELL5_FIT,
    HH_R1BAD_INIT,
)
from ionflux.rstudies import R1, R1BAD, init_params  # noqa: E402
from ionflux.utils.ckpt import load_pytree  # noqa: E402
from ionflux.utils.ptload import load_mlp_state_dict  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFDIR = "/root/reference"

ref_bad = [(jnp.asarray(w), jnp.asarray(b)) for w, b in
           load_mlp_state_dict(f"{REFDIR}/r1-bad/model-state-dict.pt")]
models = {
    "Candidate": ("hh", HH_CELL5_FIT, CELL5_RAW, "C2-"),
    "NN-f r1-bad (reference)": ("nnf",
                                NNfParams(net=ref_bad, rgate=HH_R1BAD_INIT),
                                CELL5_R1BAD, "C3--"),
}
for spec, c, label, style in [(R1, CELL5_R1, "NN-f r1 (ours)", "C0--"),
                              (R1BAD, CELL5_R1BAD, "NN-f r1-bad (ours)",
                               "C1--")]:
    path = os.path.join(REPO, "out", spec.name, "model.npz")
    if os.path.exists(path):
        models[label] = ("nnf", load_pytree(path, init_params(spec)), c, style)

proto = P.deactivation_protocol(-50.0, dt_ms=1.0)  # unseen by r1-bad
ts = np.linspace(0.0, 10000.0, 10001)
fig, ax = plt.subplots(figsize=(8, 4))
for label, (kind, params, c, style) in models.items():
    y = cached_sim(OUT, label.replace(" ", "_"), args.cached, kind, params,
                   proto, ts, c)
    ax.plot(ts, y, style, lw=1.0, label=label)
ax.legend(fontsize=8)
ax.set_xlabel("t (ms)")
ax.set_ylabel("I (nA)")
ax.set_title("Pr5 -50 mV sweep: r1-bad extrapolates poorly on unseen "
             "deactivation (nominal protocols)", fontsize=9)
fig.tight_layout()
fig.savefig(os.path.join(OUT, "fig6.png"), dpi=170)
print(f"wrote {OUT}/fig6.png")

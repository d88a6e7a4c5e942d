#!/usr/bin/env python
"""Figure 3: d-study predictions on unseen protocols — AP2Hz + the
activation-time-constant family (the reference's figure-3 uses Pr4/sinewave/
APs recorded files, absent from the mount).  Reference figure-3.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

args = study_parser("Figure 3: d-study predictions.").parse_args()
OUT = setup(args, "figure-3")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import matplotlib  # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ionflux import protocols as P  # noqa: E402
from ionflux.figures import cached_sim, mae_row  # noqa: E402
from ionflux.models.registry import MARKOV_B06, SYNTHETIC  # noqa: E402
from ionflux.observe import add_noise  # noqa: E402

from ionflux.figures import load_d_models  # noqa: E402

REFDIR = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

cases = [("ap2hz", P.load_csv(f"{REFDIR}/test-protocols/ap2hz.csv"),
          np.linspace(0.0, 3000.0, 1501))]
for k, proto in enumerate(P.atau_family(dt_ms=1.0)):
    cases.append((f"atau-{k}", proto, np.linspace(0.0, 5000.0, 5001)))

models = load_d_models(os.path.join(REPO, "out"))
fig, axes = plt.subplots(2, 4, figsize=(16, 5.5), squeeze=False)
for idx, (name, proto, ts) in enumerate(cases[:8]):
    truth = cached_sim(OUT, f"{name}-gt", args.cached, "markov", MARKOV_B06,
                       proto, ts, SYNTHETIC)
    data = np.asarray(add_noise(jax.random.PRNGKey(idx), jnp.asarray(truth)))
    ax = axes[idx // 4][idx % 4]
    ax.plot(ts, data, c="#7f7f7f", lw=0.5)
    preds = {}
    for label, (kind, params, style) in models.items():
        preds[label] = cached_sim(OUT, f"{name}-{label}", args.cached, kind,
                                  params, proto, ts, SYNTHETIC)
        ax.plot(ts, preds[label], style, lw=0.9, label=label)
    if idx == 0:
        ax.legend(fontsize=7)
    ax.set_title(name, fontsize=9)
    row = mae_row(truth, preds)
    print(name, {k: round(v, 4) for k, v in row.items()})
for idx in range(len(cases), 8):
    axes[idx // 4][idx % 4].axis("off")
fig.suptitle("d-study predictions (nominal protocols)", fontsize=10)
fig.tight_layout()
fig.savefig(os.path.join(OUT, "fig3.png"), dpi=160)
print(f"wrote {OUT}/fig3.png")

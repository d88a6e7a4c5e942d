#!/usr/bin/env python
"""Figure 2: d-study training fits — Markov ground-truth data vs the fitted
candidate (Mo), NN-f (M1) and NN-d (M2) on the Pr3/Pr5 sweeps, with zoom
insets.  Reference figure-2.py; nominal protocols replace the recorded
voltage files."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

args = study_parser("Figure 2: d-study fits.").parse_args()
OUT = setup(args, "figure-2")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import matplotlib  # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ionflux import protocols as P  # noqa: E402
from ionflux.figures import cached_sim, load_d_models, mae_row, zoom_inset  # noqa: E402
from ionflux.models.registry import MARKOV_B06, SYNTHETIC  # noqa: E402
from ionflux.observe import add_noise  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_models():
    return load_d_models(os.path.join(REPO, "out"))


def panel_figure(name, fam, ts_end, n_out, zoom_t):
    ts = np.linspace(0.0, ts_end, n_out)
    models = load_models()
    ncols = min(len(fam), 4)
    nrows = -(-len(fam) // ncols)
    fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 2.6 * nrows),
                             squeeze=False)
    maes = {k: [] for k in models}
    for k, proto in enumerate(fam):
        truth = cached_sim(OUT, f"{name}-gt-{k}", args.cached, "markov",
                           MARKOV_B06, proto, ts, SYNTHETIC)
        data = np.asarray(add_noise(jax.random.PRNGKey(k),
                                    jnp.asarray(truth)), np.float64)
        preds = {}
        for label, (kind, params, style) in models.items():
            preds[label] = cached_sim(OUT, f"{name}-{label}-{k}", args.cached,
                                      kind, params, proto, ts, SYNTHETIC)
        for label, val in mae_row(truth, preds).items():
            maes[label].append(val)
        ax = axes[k // ncols][k % ncols]
        ax.plot(ts, data, c="#7f7f7f", lw=0.5)
        traces = {}
        for label, (kind, params, style) in models.items():
            ax.plot(ts, preds[label], style, lw=0.9, label=label)
            traces[label] = (preds[label], style)
        if k == 0:
            ax.legend(fontsize=7)
        lo, hi = zoom_t
        m = (ts >= lo) & (ts <= hi)
        ymin = min(p[m].min() for p in preds.values())
        ymax = max(p[m].max() for p in preds.values())
        pad = 0.1 * (ymax - ymin + 1e-6)
        zoom_inset(ax, ts, {**{"data": (data, None)},
                            **{l: (p, s) for l, (kk, pp, s) in models.items()
                               for p in [preds[l]]}},
                   (lo, hi), (ymin - pad, ymax + pad))
        ax.set_xlabel("t (ms)")
        ax.set_ylabel("I (nA)")
    for k in range(len(fam), nrows * ncols):
        axes[k // ncols][k % ncols].axis("off")
    fig.suptitle(f"{name} (nominal protocols)", fontsize=10)
    fig.tight_layout()
    fig.savefig(os.path.join(OUT, f"{name}.png"), dpi=160)
    print(f"wrote {OUT}/{name}.png")
    for label, vals in maes.items():
        print(f"  {name} {label} mean MAE {np.mean(vals):.4f}")


if __name__ == "__main__":
    panel_figure("pr3", P.activation_family(dt_ms=1.0), 8000.0, 8001,
                 (6000.0, 7600.0))
    panel_figure("pr5", P.deactivation_family(dt_ms=1.0), 10000.0, 10001,
                 (9000.0, 9600.0))

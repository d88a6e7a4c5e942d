#!/usr/bin/env python
"""Supplementary figures: the s-study (no-discrepancy) versions of the fit/
prediction comparisons, and the Pr4/sinewave-style phase portraits.

Reference figure-2-s.py / figure-3-s.py (s1/s2 versions of figs 2/3) and
figure-1-s1.py / figure-1-s2.py (extra phase portraits)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

args = study_parser("Supplementary figures (s-study).").parse_args()
OUT = setup(args, "figure-s")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import matplotlib  # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ionflux import protocols as P  # noqa: E402
from ionflux.eval import solve_states  # noqa: E402
from ionflux.figures import cached_sim, mae_row  # noqa: E402
from ionflux.models.hh import a_gate_rhs  # noqa: E402
from ionflux.models.registry import HH_B06, MARKOV_B06, SYNTHETIC  # noqa: E402
from ionflux.observe import add_noise  # noqa: E402
from ionflux.studies import S1, S2, load_study_params  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# --- figure-2-s/3-s analogue: s-study fits + predictions -------------------
models = {"True model": ("hh", HH_B06, "C2-")}
for spec, label, style in [(S1, "NN-f (s1)", "C0--"), (S2, "NN-d (s2)", "C1--")]:
    d = os.path.join(REPO, "out", spec.name)
    if os.path.exists(os.path.join(d, "model.npz")):
        models[label] = (spec.model_kind, load_study_params(spec, d), style)
    else:
        print(f"{label}: run scripts/train_{spec.name}.py first")

cases = [
    ("pr3-20mV", P.activation_protocol(20.0, dt_ms=1.0),
     np.linspace(0.0, 8000.0, 8001)),
    ("pr5--100mV", P.deactivation_protocol(-100.0, dt_ms=1.0),
     np.linspace(0.0, 10000.0, 10001)),
    ("ap2hz", P.load_csv("/root/reference/test-protocols/ap2hz.csv"),
     np.linspace(0.0, 3000.0, 1501)),
    ("atau-300ms", P.atau_protocol(300.0, dt_ms=1.0),
     np.linspace(0.0, 5000.0, 5001)),
]
fig, axes = plt.subplots(2, 2, figsize=(11, 6))
for idx, (name, proto, ts) in enumerate(cases):
    ax = axes[idx // 2][idx % 2]
    truth = cached_sim(OUT, f"{name}-gt", args.cached, "hh", HH_B06, proto,
                       ts, SYNTHETIC)
    data = np.asarray(add_noise(jax.random.PRNGKey(idx), jnp.asarray(truth)))
    ax.plot(ts, data, c="#bbbbbb", lw=0.4)
    preds = {}
    for label, (kind, params, style) in models.items():
        y = cached_sim(OUT, f"{name}-{label.replace(' ', '_')}", args.cached,
                       kind, params, proto, ts, SYNTHETIC)
        preds[label] = y
        ax.plot(ts, y, style, lw=0.9, label=label)
    if idx == 0:
        ax.legend(fontsize=7)
    ax.set_title(name, fontsize=9)
    print(name, {k: round(v, 4) for k, v in mae_row(truth, preds).items()})
fig.suptitle("s-study fits & predictions (figure-2-s/3-s analogue)",
             fontsize=10)
fig.tight_layout()
fig.savefig(os.path.join(OUT, "fig-s23.png"), dpi=160)
print(f"wrote {OUT}/fig-s23.png")

# --- figure-1-s analogue: phase portrait on the atau family ---------------
fig2 = plt.figure(figsize=(5.5, 4.5))
ax = fig2.add_subplot(111, projection="3d")
ts = jnp.linspace(0.0, 5000.0, 1001, dtype=jnp.float32)
for proto in P.atau_family(dt_ms=1.0):
    ys = solve_states("gta", MARKOV_B06, proto, ts,
                      y0=jnp.array([0.0, 0.0], jnp.float32))
    v = np.asarray(P.voltage(proto, ts))
    ax.plot(v, np.asarray(ys[:, 0]), np.asarray(ys[:, 1]), lw=0.8)
vv, aa = np.meshgrid(np.linspace(-130, 70, 40), np.linspace(0, 1, 40))
zz = np.asarray(a_gate_rhs(HH_B06, jnp.asarray(aa, jnp.float32),
                           jnp.asarray(vv, jnp.float32)))
ax.plot_surface(vv, aa, zz, color="C1", alpha=0.3)
ax.set_xlabel("V (mV)")
ax.set_ylabel("a")
ax.set_zlabel("da/dt")
fig2.tight_layout()
fig2.savefig(os.path.join(OUT, "fig-s1.png"), dpi=170)
print(f"wrote {OUT}/fig-s1.png")

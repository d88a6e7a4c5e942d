#!/usr/bin/env python
"""Figure 1: phase portrait — GroundTruth_a trajectories (a, da/dt) under
Pr3/Pr5 sweeps over the candidate HH da/dt(V, a) surface.

Reference figure-1.py (GroundTruth_a at :72-118); nominal protocols replace
the recorded cell-5 voltage files.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

args = study_parser("Figure 1: phase portraits.").parse_args()
OUT = setup(args, "figure-1")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import matplotlib  # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ionflux import protocols as P  # noqa: E402
from ionflux.eval import solve_states  # noqa: E402
from ionflux.models.hh import a_gate_rhs  # noqa: E402
from ionflux.models.registry import HH_D0_FIT, MARKOV_B06  # noqa: E402

fig = plt.figure(figsize=(10, 5))
for col, (fam, ts_end, n) in enumerate([
    (P.activation_family(dt_ms=1.0), 8000.0, 1601),
    (P.deactivation_family(dt_ms=1.0), 10000.0, 2001),
]):
    ax = fig.add_subplot(1, 2, col + 1, projection="3d")
    ts = jnp.linspace(0.0, ts_end, n, dtype=jnp.float32)
    for proto in fam:
        ys = solve_states("gta", MARKOV_B06, proto, ts,
                          y0=jnp.array([0.0, 0.0], jnp.float32))
        v = np.asarray(P.voltage(proto, ts))
        a = np.asarray(ys[:, 0])
        u = np.asarray(ys[:, 1])
        ax.plot(v, a, u, lw=0.8)
    # candidate HH surface (figure-1 overlays the fitted Mo rate law)
    vv, aa = np.meshgrid(np.linspace(-130, 70, 40), np.linspace(0, 1, 40))
    zz = np.asarray(a_gate_rhs(HH_D0_FIT, jnp.asarray(aa, jnp.float32),
                               jnp.asarray(vv, jnp.float32)))
    ax.plot_surface(vv, aa, zz, color="C1", alpha=0.3)
    ax.set_xlabel("V (mV)")
    ax.set_ylabel("a")
    ax.set_zlabel("da/dt")
    ax.set_title(["Pr3 activation", "Pr5 deactivation"][col]
                 + " (nominal protocols)", fontsize=9)
fig.tight_layout()
fig.savefig(os.path.join(OUT, "fig1.png"), dpi=200)
print(f"wrote {OUT}/fig1.png")

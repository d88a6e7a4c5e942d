#!/usr/bin/env python
"""Supplementary figure 0-s: the spline-smoothing demonstration — noisy
simulated current -> Hanning smooth -> cubic spline -> analytic dI/dt, with
zoom panels around a voltage step.  Reference figure-0-s.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

args = study_parser("Figure 0-s: spline smoothing demo.").parse_args()
OUT = setup(args, "figure-0-s")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import matplotlib  # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ionflux import protocols as P  # noqa: E402
from ionflux.data import simulate_current  # noqa: E402
from ionflux.models.registry import HH_B06, SYNTHETIC  # noqa: E402
from ionflux.observe import add_noise  # noqa: E402
from ionflux.surface import SurfaceConfig, spline_didt  # noqa: E402

proto = P.activation_protocol(20.0)
ts = jnp.linspace(0.0, 8000.0, 80001, dtype=jnp.float32)
clean = simulate_current(HH_B06, proto, ts, SYNTHETIC)
noisy = np.asarray(add_noise(jax.random.PRNGKey(0), clean), np.float64)
edges = P.segment_edges(np.asarray(proto.times()), np.asarray(proto.v))
i_smooth, didt = spline_didt(np.asarray(ts, np.float64), noisy, edges,
                             SurfaceConfig())

t = np.asarray(ts)
fig, axes = plt.subplots(2, 2, figsize=(10, 6))
axes[0, 0].plot(t, noisy, c="#bbbbbb", lw=0.5, label="noisy I")
axes[0, 0].plot(t, i_smooth, "C0", lw=1.0, label="smooth+spline")
axes[0, 0].legend(fontsize=8)
axes[0, 0].set_title("current")
axes[1, 0].plot(t, didt, "C1", lw=0.8)
axes[1, 0].set_title("spline dI/dt")
m = (t > 900) & (t < 1400)
axes[0, 1].plot(t[m], noisy[m], c="#bbbbbb", lw=0.5)
axes[0, 1].plot(t[m], i_smooth[m], "C0", lw=1.0)
axes[0, 1].set_title("zoom: step at 1000 ms")
axes[1, 1].plot(t[m], didt[m], "C1", lw=0.8)
for ax in axes.flat:
    ax.set_xlabel("t (ms)")
fig.tight_layout()
fig.savefig(os.path.join(OUT, "fig0s.png"), dpi=200)
print(f"wrote {OUT}/fig0s.png")

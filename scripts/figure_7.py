#!/usr/bin/env python
"""Figure 7: a-gate trajectories and steady-state I-V overlay — r1 vs r1-bad
vs the candidate (the unidentifiability analysis).  Reference figure-7.py
(:380-464 steady-state overlay); nominal protocols.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

args = study_parser("Figure 7: steady-state analysis.").parse_args()
OUT = setup(args, "figure-7")

import jax.numpy as jnp  # noqa: E402
import matplotlib  # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ionflux import protocols as P  # noqa: E402
from ionflux.eval import solve_states  # noqa: E402
from ionflux.models.hh import hh_steady_state  # noqa: E402
from ionflux.models.nn import nn_surface  # noqa: E402
from ionflux.models.registry import (  # noqa: E402
    CELL5_R1,
    CELL5_R1BAD,
    HH_CELL5_FIT,
)
from ionflux.rstudies import R1, R1BAD, init_params  # noqa: E402
from ionflux.utils.ckpt import load_pytree  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def nn_a_inf(net, v_grid):
    """Steady state of the learned a-gate: bisection on nn_surface(V, a)=0
    over a in [0, 1.5] (the NN replacement for the analytic a_inf)."""
    lo = jnp.zeros_like(v_grid)
    hi = jnp.full_like(v_grid, 1.5)
    f_lo = nn_surface(net, v_grid, lo)
    for _ in range(40):
        mid = 0.5 * (lo + hi)
        f_mid = nn_surface(net, v_grid, mid)
        same = jnp.sign(f_mid) == jnp.sign(f_lo)
        lo = jnp.where(same, mid, lo)
        f_lo = jnp.where(same, f_mid, f_lo)
        hi = jnp.where(same, hi, mid)
    return 0.5 * (lo + hi)


models = {}
for spec, c, label in [(R1, CELL5_R1, "NN-f (r1)"),
                       (R1BAD, CELL5_R1BAD, "NN-f (r1-bad)")]:
    path = os.path.join(REPO, "out", spec.name, "model.npz")
    if os.path.exists(path):
        models[label] = (load_pytree(path, init_params(spec)), c)
    else:
        print(f"{label}: {path} missing — run the study script first")

v_grid = jnp.linspace(-120.0, 60.0, 91, dtype=jnp.float32)
fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))

# steady-state a_inf + I-V overlay
a_inf_c = hh_steady_state(HH_CELL5_FIT, v_grid)[:, 0]
r_inf_c = hh_steady_state(HH_CELL5_FIT, v_grid)[:, 1]
ax1.plot(v_grid, a_inf_c, "C2-", label="candidate a_inf")
ax2.plot(v_grid, CELL5_R1.g * a_inf_c * r_inf_c * (v_grid - CELL5_R1.e),
         "C2-", label="candidate steady I-V")
for li, (label, (params, c)) in enumerate(models.items()):
    a_inf = nn_a_inf(params.net, v_grid)
    ax1.plot(v_grid, a_inf, f"C{li}--", label=label)
    r_inf = hh_steady_state(params.rgate, v_grid)[:, 1]
    ax2.plot(v_grid, c.g * a_inf * r_inf * (v_grid - c.e), f"C{li}--",
             label=label)
ax1.set_xlabel("V (mV)")
ax1.set_ylabel("a_inf")
ax1.legend(fontsize=8)
ax2.set_xlabel("V (mV)")
ax2.set_ylabel("steady I (nA)")
ax2.legend(fontsize=8)
fig.suptitle("steady-state gate and I-V: sufficient (r1) vs insufficient "
             "(r1-bad) training protocols", fontsize=10)
fig.tight_layout()
fig.savefig(os.path.join(OUT, "fig7.png"), dpi=170)
print(f"wrote {OUT}/fig7.png")

# a(t) trajectories under a Pr3 sweep (figure-7's left panels)
proto = P.activation_protocol(20.0, dt_ms=1.0)
ts = jnp.linspace(0.0, 8000.0, 1601, dtype=jnp.float32)
fig2, ax = plt.subplots(figsize=(6, 3.5))
for li, (label, (params, c)) in enumerate(models.items()):
    ys = solve_states("nnf", params, proto, ts)
    ax.plot(ts, ys[:, 0], f"C{li}--", label=label)
ax.set_xlabel("t (ms)")
ax.set_ylabel("a(t)")
ax.legend(fontsize=8)
fig2.tight_layout()
fig2.savefig(os.path.join(OUT, "fig7-traj.png"), dpi=170)
print(f"wrote {OUT}/fig7-traj.png")
